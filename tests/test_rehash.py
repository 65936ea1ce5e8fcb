"""Partition-count evolution (lake.rehash): re-bucket the live snapshot
into a new hash-partition layout with state, lineage, time travel and the
change feed preserved — and every later write/read following the NEW
layout even when callers still pass the stale spec constant."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply, lake, manifest as mf
from vlm_eden_dataset_etl_ray.spec import TableSpec

SPEC = TableSpec(name="rh", key="doc_id", order="lsn", num_partitions=4,
                 envelope=())


def _rows(lo, hi, lsn_base=0, deletes=()):
    n = hi - lo
    ids = [f"d{i}" for i in range(lo, hi)]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "lsn": pa.array(np.arange(lsn_base, lsn_base + n, dtype=np.int64)),
        "op": pa.array(["delete" if i in deletes else "upsert" for i in ids]),
        "n_tok": pa.array(np.arange(lo, hi, dtype=np.int64) * 7),
    }))


def _snap(d):
    t = lake.snapshot(d, spec=SPEC, columns=["doc_id", "lsn", "n_tok"])
    return t.sort_by("doc_id")


@pytest.fixture()
def lk(tmp_path):
    d = str(tmp_path / "lake")
    apply.apply_epoch_dataset(d, _rows(0, 60), epoch_id="e1", spec=SPEC)
    apply.apply_epoch_dataset(
        d, _rows(30, 90, lsn_base=100, deletes={"d31", "d40"}),
        epoch_id="e2", spec=SPEC)
    return d


def _stored_ops(d):
    import pyarrow.parquet as pq

    m = mf.latest(d)
    ops = []
    for pid in m.partitions:
        for f in m.files(pid):
            ops.extend(pq.read_table(f, columns=["op"]).column("op")
                       .to_pylist())
    return ops


def test_rehash_preserves_state(lk):
    before = _snap(lk)
    m = lake.rehash(lk, 8, spec=SPEC)
    assert m.kind == "rehash" and m.num_partitions == 8
    assert len(m.partitions) > 4
    assert _snap(lk).equals(before)
    # key-pruned point reads follow the new layout
    t = lake.lookup(lk, ["d5", "d77"], spec=SPEC,
                    columns=["doc_id", "n_tok"])
    assert dict(zip(t.column("doc_id").to_pylist(),
                    t.column("n_tok").to_pylist())) == {"d5": 35, "d77": 539}
    # default (end-of-stream) rehash physically folds tombstones away
    assert "delete" not in set(_stored_ops(lk))


def test_mid_stream_rehash_keeps_tombstones_against_stragglers(lk):
    # watermark 0: every tombstone survives the move, in the files
    lake.rehash(lk, 8, spec=SPEC, tombstone_watermark=0)
    assert "delete" in set(_stored_ops(lk))
    # an out-of-order straggler BELOW the delete's LSN must still lose
    apply.apply_epoch_dataset(
        lk, rd.from_arrow(pa.table({
            "doc_id": pa.array(["d31"]),
            "lsn": pa.array([5], pa.int64()),
            "op": pa.array(["upsert"]),
            "n_tok": pa.array([1], pa.int64()),
        })), epoch_id="straggler", spec=SPEC)
    assert "d31" not in set(_snap(lk).column("doc_id").to_pylist())


def test_writes_after_rehash_follow_new_layout(lk):
    lake.rehash(lk, 8, spec=SPEC)
    # caller still passes the stale 4-partition spec: the committed layout
    # must win
    apply.apply_epoch_dataset(
        lk, _rows(85, 95, lsn_base=500), epoch_id="e3", spec=SPEC)
    m = mf.latest(lk)
    assert m.num_partitions == 8
    t = _snap(lk)
    got = dict(zip(t.column("doc_id").to_pylist(),
                   t.column("lsn").to_pylist()))
    assert got["d94"] == 509 and got["d85"] == 500  # new rows won by LWW
    assert got["d5"] == 5                            # untouched survive
    # exactly-once carries across the rehash: re-applying e2 is a skip
    n_before = t.num_rows
    apply.apply_epoch_dataset(
        lk, _rows(30, 90, lsn_base=100, deletes={"d31", "d40"}),
        epoch_id="e2", spec=SPEC)
    assert _snap(lk).num_rows == n_before
    # and compaction under the new layout preserves state
    lake.compact(lk, spec=SPEC)
    assert _snap(lk).num_rows == n_before


def test_change_feed_and_time_travel_around_rehash(lk):
    pre = _snap(lk)
    m_pre = mf.latest(lk)
    m_re = lake.rehash(lk, 2, spec=SPEC)
    apply.apply_epoch_dataset(
        lk, _rows(0, 3, lsn_base=900), epoch_id="e3", spec=SPEC)
    # NO feed may span the boundary (keys moved partitions: the per-pid
    # independent merge would emit duplicate/stale rows per key)
    with pytest.raises(ValueError, match="rehash"):
        lake.change_feed(lk, m_pre.epoch, spec=SPEC)
    with pytest.raises(ValueError, match="rehash"):
        lake.change_feed(lk, m_pre.epoch, spec=SPEC, before_image=True)
    # from the rehash epoch onward both shapes work and see only e3
    feed = pa.concat_tables(lake.change_feed(
        lk, m_re.epoch, spec=SPEC).iter_batches(
        batch_format="pyarrow", batch_size=None))
    assert sorted(set(feed.column("doc_id").to_pylist())) == ["d0", "d1", "d2"]
    bi = pa.concat_tables(lake.change_feed(
        lk, m_re.epoch, spec=SPEC, before_image=True).iter_batches(
        batch_format="pyarrow", batch_size=None))
    assert bi.num_rows == 3
    # time travel to the pre-rehash snapshot still works
    old = lake.snapshot(lk, spec=SPEC, asof_epoch=m_pre.epoch,
                        columns=["doc_id", "lsn", "n_tok"]).sort_by("doc_id")
    assert old.equals(pre)


def test_rehash_validation_and_idempotence(lk, tmp_path):
    m1 = lake.rehash(lk, 8, spec=SPEC)
    assert lake.rehash(lk, 8, spec=SPEC).epoch == m1.epoch  # no-op
    with pytest.raises(ValueError, match="new_partitions"):
        lake.rehash(lk, 0, spec=SPEC)
    with pytest.raises(FileNotFoundError):
        lake.rehash(str(tmp_path / "missing"), 4, spec=SPEC)
    # scale-in works too
    before = _snap(lk)
    m2 = lake.rehash(lk, 2, spec=SPEC)
    assert m2.num_partitions == 2 and _snap(lk).equals(before)


def test_vacuum_reclaims_rehash_scratch(lk):
    """After a compaction re-homes the data, the rehash scratch files must
    be reclaimable (not a permanent O(lake) leak)."""
    import os
    import time as _t

    lake.rehash(lk, 8, spec=SPEC)
    scratch = [os.path.join(dp, f) for dp, _, fs in os.walk(lk)
               for f in fs if "_rehash_" in dp and f.endswith(".parquet")]
    assert scratch
    lake.compact(lk, spec=SPEC)  # re-homes every row under base/
    # age everything and keep only the newest manifest
    for dp, _, fs in os.walk(lk):
        for f in fs:
            p = os.path.join(dp, f)
            os.utime(p, (_t.time() - 7200, _t.time() - 7200))
    before = _snap(lk)
    res = lake.vacuum(lk, keep_epochs=1, min_age_seconds=0.0)
    assert res["files_removed"] > 0
    assert not any(os.path.exists(p) for p in scratch)
    assert _snap(lk).equals(before)


def test_rehash_respects_dml_and_lineage_ranges(lk):
    from vlm_eden_dataset_etl_ray import dml

    lake.rehash(lk, 8, spec=SPEC)
    dml.delete_where(lk, [("n_tok", ">", 500)], spec=SPEC)
    t = _snap(lk)
    assert pc.max(t.column("n_tok")).as_py() <= 500
    m = mf.latest(lk)
    # the applied-LSN record survived the rehash (union of old ranges)
    ranges = [r for st in m.partitions.values()
              for r in st.applied_lsn_ranges]
    assert any(lo <= 0 <= hi for lo, hi in ranges)
