"""Exactly-once + resume semantics of the two-phase-commit manifest.

The reference achieves at-least-once with idempotent upserts plus a fuzzy
5 s watermark overlap (/root/reference/sync/sync_base.py:55-56) and a daily
repair job; here the same inputs are provably applied once: committed input
sets are skipped, crashes before the manifest publish are redone safely.
"""

import glob
import json
import os
import shutil

import numpy as np

from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake, manifest as mf, oracle
from vlm_eden_dataset_etl_ray.state.registry import make_registry_actor

P = cl.ChangelogParams(n_docs=120, n_events=1200, schema_change_at=700, n_shards=4)


def _manifest_bytes(lake_dir):
    out = {}
    for f in sorted(glob.glob(os.path.join(lake_dir, "_manifests", "*.json"))):
        with open(f, "rb") as fh:
            out[os.path.basename(f)] = fh.read()
    return out


def test_reapply_same_epoch_is_noop(tmp_path):
    files = cl.write_changelog(str(tmp_path / "chg"), P)
    lake_dir = str(tmp_path / "lake")
    reg = make_registry_actor(lake_dir)
    m1 = apply.apply_epoch(lake_dir, files, registry=reg)
    state1 = lake.snapshot(lake_dir)
    manifests1 = _manifest_bytes(lake_dir)

    m2 = apply.apply_epoch(lake_dir, files, registry=reg)  # same input set again
    assert m2.epoch == m1.epoch  # skipped, no new epoch
    assert _manifest_bytes(lake_dir) == manifests1  # ledger byte-identical
    state2 = lake.snapshot(lake_dir)
    assert state2.equals(state1)


def test_crash_before_commit_then_resume(tmp_path):
    """Simulate a driver crash after staging files exist but before the
    manifest publish: rerunning the epoch overwrites staging and commits —
    no gaps, no duplicates vs the oracle."""
    files = cl.write_changelog(str(tmp_path / "chg"), P)
    lake_dir = str(tmp_path / "lake")
    reg = make_registry_actor(lake_dir)

    half = files[: len(files) // 2]
    apply.apply_epoch(lake_dir, half, registry=reg)

    # stage epoch 2's files, then "crash": delete its manifest only
    m2 = apply.apply_epoch(lake_dir, files[len(files) // 2:], registry=reg)
    path = os.path.join(lake_dir, "_manifests", f"epoch={m2.epoch:010d}.json")
    os.remove(path)
    assert mf.latest(lake_dir).epoch == m2.epoch - 1
    staged = glob.glob(os.path.join(lake_dir, "staging", f"epoch={m2.epoch}", "*.parquet"))
    assert staged  # orphan staging files survived the crash

    # resume: rerun the epoch → converges
    apply.apply_epoch(lake_dir, files[len(files) // 2:], registry=reg)
    snap = lake.snapshot(lake_dir)
    exp = oracle.final_state(P)
    assert snap.num_rows == exp.num_rows
    assert snap.sort_by("doc_id").select(["doc_id", "tokens"]).equals(
        exp.sort_by("doc_id").select(["doc_id", "tokens"])
    )


def test_lineage_recorded_per_partition(tmp_path):
    files = cl.write_changelog(str(tmp_path / "chg"), P)
    lake_dir = str(tmp_path / "lake")
    m = apply.apply_epoch(lake_dir, files)
    total_rows = 0
    for st in m.partitions.values():
        assert st.watermark_lsn >= 0
        assert st.applied_lsn_ranges and st.applied_lsn_ranges[0][0] >= 0
        assert st.rows > 0 and st.bytes > 0
        total_rows += st.rows
    # rows = one surviving version per (partition, key) incl. tombstones
    assert total_rows <= P.n_events
    assert m.num_partitions == 32


def test_concurrent_commit_race_rebases(tmp_path, monkeypatch):
    """Two drivers race: while driver A runs its pipeline, driver B commits
    a DIFFERENT input set under the epoch number A was about to use. A's
    publish hits FileExistsError, rebases its delta files onto B's manifest,
    and commits the next epoch — neither driver's updates are lost."""
    p1 = cl.ChangelogParams(seed=1, n_docs=80, n_events=600, n_shards=2)
    p2 = cl.ChangelogParams(seed=2, n_docs=80, n_events=600, n_shards=2)
    files1 = cl.write_changelog(str(tmp_path / "c1"), p1)
    files2 = cl.write_changelog(str(tmp_path / "c2"), p2)
    lake_dir = str(tmp_path / "lake")

    from vlm_eden_dataset_etl_ray import apply as apply_mod

    orig_commit = mf.commit
    state = {"armed": True}

    def racing_commit(lk, m):
        if state["armed"]:
            # disarm BEFORE B runs so B's own commit goes straight through
            state["armed"] = False
            apply_mod.apply_epoch(lk, files2)  # driver B steals epoch 1
        return orig_commit(lk, m)

    monkeypatch.setattr(apply_mod.mf, "commit", racing_commit)
    m_a = apply_mod.apply_epoch(lake_dir, files1)  # driver A
    assert m_a.epoch == 2  # A rebased past B's epoch 1

    all_inputs = []
    for e in mf.list_epochs(lake_dir):
        all_inputs += mf.load(lake_dir, e).applied_inputs
    assert set(all_inputs) == set(files1) | set(files2)  # nothing lost

    # B's deltas survive in A's manifest (rebase kept them)
    b_files = {f for st in mf.load(lake_dir, 1).partitions.values() for f in st.deltas}
    a_files = {f for st in m_a.partitions.values() for f in st.deltas}
    assert b_files <= a_files

    snap = lake.snapshot(lake_dir)
    exp1 = oracle.final_state(p1)
    assert snap.num_rows >= exp1.num_rows  # both drivers' docs coexist
