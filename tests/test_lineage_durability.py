"""Durability of the exactly-once lineage record and hash fingerprinting.

Covers: cumulative applied-input lineage surviving vacuum (no re-apply /
tombstone resurrection after compaction dropped the tombstones), fail-fast
on a partition-hash implementation mismatch, and vacuum not GC-ing the
staging files of a concurrently in-flight (uncommitted) epoch."""

import json
import os

from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake, manifest as mf, oracle
from vlm_eden_dataset_etl_ray.functions.hashing import HASH_FN
from vlm_eden_dataset_etl_ray.pipelines.cdc import run_incremental


def _mk_changelog(tmp_path, **kw):
    p = cl.ChangelogParams(n_docs=100, n_events=1200, n_shards=4, **kw)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    return p, str(tmp_path / "chg"), files


def test_lineage_survives_vacuum_no_reapply(tmp_path):
    p, chg_dir, files = _mk_changelog(tmp_path)
    lake_dir = str(tmp_path / "lake")
    m1 = run_incremental(lake_dir, chg_dir)
    assert sorted(m1.applied_inputs) == sorted(files)
    m2 = lake.compact(lake_dir)
    # compaction (which DROPPED tombstones) must carry the lineage forward
    assert m2.applied_epoch_ids == m1.applied_epoch_ids
    assert m2.applied_inputs == m1.applied_inputs
    lake.vacuum(lake_dir, keep_epochs=1, min_age_seconds=0)  # only the compaction manifest remains
    assert mf.list_epochs(lake_dir) == [m2.epoch]
    # polling again re-applies NOTHING: same epoch, same state, no
    # resurrection of deleted docs from the still-present changelog shards
    m3 = run_incremental(lake_dir, chg_dir)
    assert m3.epoch == m2.epoch
    snap = lake.snapshot(lake_dir)
    exp = oracle.final_state(p)
    assert snap.num_rows == exp.num_rows
    assert snap.sort_by("doc_id").select(["doc_id", "tokens"]).equals(
        exp.sort_by("doc_id").select(["doc_id", "tokens"])
    )


def test_manifests_record_hash_fn_and_mismatch_fails_fast(tmp_path):
    _, chg_dir, files = _mk_changelog(tmp_path)
    lake_dir = str(tmp_path / "lake")
    m = apply.apply_epoch(lake_dir, files[:2])
    assert m.hash_fn == HASH_FN
    # forge a manifest written under a different hash implementation
    path = os.path.join(lake_dir, mf.MANIFEST_DIR, f"epoch={m.epoch:010d}.json")
    with open(path) as fh:
        d = json.load(fh)
    d["hash_fn"] = "otherhash/deadbeef0000"
    with open(path, "w") as fh:
        json.dump(d, fh)
    try:
        apply.apply_epoch(lake_dir, files[2:])
        raise AssertionError("expected RuntimeError on hash_fn mismatch")
    except RuntimeError as e:
        assert "hash" in str(e)


def test_vacuum_spares_inflight_staging(tmp_path):
    _, chg_dir, files = _mk_changelog(tmp_path)
    lake_dir = str(tmp_path / "lake")
    m = apply.apply_epoch(lake_dir, files[:2])
    # simulate an in-flight epoch: staging files exist, manifest not committed
    inflight = os.path.join(lake_dir, "staging", f"epoch={m.epoch + 1}")
    os.makedirs(inflight, exist_ok=True)
    probe = os.path.join(inflight, "part-00000.parquet")
    with open(probe, "wb") as fh:
        fh.write(b"inflight")
    stats = lake.vacuum(lake_dir, keep_epochs=1, min_age_seconds=0)
    assert os.path.exists(probe), "vacuum deleted an in-flight epoch's staging file"
    # but committed-epoch orphans are still collected as before
    assert stats["files_removed"] >= 0
