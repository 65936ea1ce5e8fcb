"""Regression tests for the round-3 ADVICE fixes.

1. Legacy (per-epoch lineage) lake upgrade: the first cumulative manifest
   written on top of legacy manifests must union the applied ids/inputs over
   ALL retained manifests, not just the latest one — otherwise re-applying an
   early shard after a tombstone-dropping compaction resurrects deleted rows.
2. explode_hopping_windows must normalize the timestamp's physical unit
   (s/ms/ns inputs previously mis-bucketed by the unit ratio).
3. skew_hash_join with every key hot (cold branch empty) must not crash on
   schema derivation.
4. content_hash must hash -0.0 equal to 0.0 (SQL/Arrow equality) so exact
   dedup agrees with a DISTINCT oracle.
"""

import json
import os

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake, manifest as mf
from vlm_eden_dataset_etl_ray.functions.hashing import content_hash
from vlm_eden_dataset_etl_ray.functions.relational import skew_hash_join
from vlm_eden_dataset_etl_ray.functions.temporal import explode_hopping_windows
from vlm_eden_dataset_etl_ray.pipelines.cdc import run_incremental


def _legacy_rewrite(lake_dir: str) -> None:
    """Rewrite every committed manifest into the legacy (pre-marker) format:
    no ``lineage`` key, applied ids/inputs truncated to the epoch's OWN
    additions only — the on-disk shape of a lake written before the
    cumulative-lineage marker existed."""
    epochs = mf.list_epochs(lake_dir)
    seen_ids: set[str] = set()
    seen_inputs: set[str] = set()
    for e in epochs:
        path = os.path.join(lake_dir, mf.MANIFEST_DIR, f"epoch={e:010d}.json")
        with open(path) as fh:
            d = json.load(fh)
        d.pop("lineage", None)
        d["applied_epoch_ids"] = [i for i in d["applied_epoch_ids"] if i not in seen_ids]
        d["applied_inputs"] = [i for i in d["applied_inputs"] if i not in seen_inputs]
        seen_ids.update(d["applied_epoch_ids"])
        seen_inputs.update(d["applied_inputs"])
        with open(path, "w") as fh:
            json.dump(d, fh)


def test_legacy_lineage_upgrade_unions_all_manifests(tmp_path):
    p = cl.ChangelogParams(n_docs=60, n_events=600, n_shards=6)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")
    m1 = apply.apply_epoch(lake_dir, files[:2])
    m2 = apply.apply_epoch(lake_dir, files[2:4])
    all_ids = set(m2.applied_epoch_ids)
    assert len(all_ids) == 2
    _legacy_rewrite(lake_dir)
    latest = mf.latest(lake_dir)
    assert latest.lineage == "epoch" and len(latest.applied_epoch_ids) == 1

    # the next epoch's manifest upgrades to cumulative WITHOUT losing the
    # earlier legacy epochs' applied record
    m3 = apply.apply_epoch(lake_dir, files[4:])
    assert m3.lineage == "cumulative"
    assert all_ids <= set(m3.applied_epoch_ids) and len(m3.applied_epoch_ids) == 3
    assert set(m3.applied_inputs) == set(files)

    # re-applying the FIRST legacy epoch's shards is a no-op (exactly-once)
    m4 = apply.apply_epoch(lake_dir, files[:2])
    assert m4.epoch == m3.epoch


def test_legacy_lineage_compact_and_run_incremental(tmp_path):
    p = cl.ChangelogParams(n_docs=60, n_events=600, n_shards=4)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, files[:2])
    apply.apply_epoch(lake_dir, files[2:])
    expect = lake.snapshot(lake_dir)
    _legacy_rewrite(lake_dir)

    # compaction on a legacy lake: its cumulative manifest carries the union
    mc = lake.compact(lake_dir)
    assert mc.lineage == "cumulative"
    assert len(mc.applied_epoch_ids) == 2
    assert set(mc.applied_inputs) == set(files)

    # vacuum away the legacy manifests, then poll: nothing pending, and no
    # tombstone resurrection (state identical to the pre-rewrite snapshot)
    lake.vacuum(lake_dir, keep_epochs=1, min_age_seconds=0)
    m = run_incremental(lake_dir, str(tmp_path / "chg"))
    assert m.epoch == mc.epoch
    snap = lake.snapshot(lake_dir)
    assert snap.sort_by("doc_id").equals(expect.sort_by("doc_id"))


def test_run_incremental_on_pure_legacy_lake_skips_applied(tmp_path):
    p = cl.ChangelogParams(n_docs=40, n_events=300, n_shards=4)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, files[:2])
    apply.apply_epoch(lake_dir, files[2:3])
    _legacy_rewrite(lake_dir)
    # only files[3] is pending; the two legacy epochs' inputs must be skipped
    m = run_incremental(lake_dir, str(tmp_path / "chg"))
    assert set(m.applied_inputs) == set(files)
    assert len(m.applied_epoch_ids) == 3


def test_hopping_windows_unit_normalization():
    base = 1_700_000_000  # seconds
    secs = [base + 5, base + 95, base + 125]
    out = {}
    for unit in ("s", "ms", "us", "ns"):
        mult = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        t = pa.table({"ts": pa.array([s * mult for s in secs], pa.timestamp(unit)),
                      "i": [0, 1, 2]})
        ds = explode_hopping_windows(rd.from_arrow(t), "ts", size_s=120, hop_s=60)
        rows = sorted(
            (r["i"], r["window_start"]) for r in ds.take_all()
        )
        out[unit] = rows
        assert len(rows) == 6  # 2 windows per row
    assert out["s"] == out["ms"] == out["us"] == out["ns"]
    # non-timestamp input fails loudly instead of mis-bucketing
    bad = rd.from_arrow(pa.table({"ts": pa.array([1, 2], pa.int64())}))
    try:
        explode_hopping_windows(bad, "ts", size_s=120, hop_s=60).take_all()
        raise AssertionError("expected TypeError for non-timestamp column")
    except Exception as e:  # Ray wraps the worker TypeError
        assert "timestamp" in str(e)


def test_skew_join_all_keys_hot():
    left = rd.from_arrow(pa.table({
        "k": pa.array(["hot"] * 50), "lv": pa.array(range(50), pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array(["hot"]), "rv": pa.array([7], pa.int64())}))
    out = skew_hash_join(left, right, "k", "k", how="inner", hot_keys=["hot"])
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow", batch_size=None))
    assert t.num_rows == 50
    assert set(t.column_names) == {"k", "lv", "rv"}
    assert t.column("rv").unique().to_pylist() == [7]


def test_negative_zero_hashes_like_zero():
    t = pa.table({"doc": ["a", "a", "a"],
                  "v": pa.array([0.0, -0.0, None], pa.float64())})
    h = content_hash(t, ["doc", "v"])
    assert h[0] == h[1], "-0.0 must hash equal to 0.0 (SQL equality)"
    assert h[2] != h[0], "null must stay distinct from 0.0"
