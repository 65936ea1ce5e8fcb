"""K6 append-only sink semantics (reference dim_technicians: bare INSERT,
dup-tolerant — queries/dim_technicians.py:14-29): no key reduce, every
delivered row retained, exactly-once still file-set based, compaction
preserves duplicates."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray.spec import TableSpec

SPEC = TableSpec(name="t_append", key="k", order="lsn", mode="append",
                 num_partitions=4, envelope=())


def _shard(path, keys, lsns):
    pq.write_table(pa.table({
        "k": pa.array(keys), "lsn": pa.array(lsns, pa.int64()),
        "v": pa.array([f"v{i}" for i in lsns]),
    }), path)
    return str(path)


def test_append_keeps_every_row_and_is_exactly_once(tmp_path):
    lake_dir = str(tmp_path / "lake")
    f1 = _shard(tmp_path / "s1.parquet", ["a", "a", "b"], [1, 2, 3])
    f2 = _shard(tmp_path / "s2.parquet", ["a", "c", "c"], [4, 5, 6])
    apply.apply_epoch(lake_dir, [f1], spec=SPEC)
    apply.apply_epoch(lake_dir, [f2], spec=SPEC)
    snap = lake.snapshot(lake_dir, spec=SPEC)
    # all 6 rows retained — dup keys within and across epochs included
    assert snap.num_rows == 6
    assert sorted(snap.column("k").to_pylist()) == ["a", "a", "a", "b", "c", "c"]
    # re-applying an already-applied set is a no-op
    m = apply.apply_epoch(lake_dir, [f1], spec=SPEC)
    assert lake.snapshot(lake_dir, spec=SPEC).num_rows == 6
    assert len(m.applied_epoch_ids) == 2
    # compaction folds files but keeps every row
    lake.compact(lake_dir, spec=SPEC)
    snap2 = lake.snapshot(lake_dir, spec=SPEC)
    assert sorted(zip(snap2.column("k").to_pylist(), snap2.column("lsn").to_pylist())) == \
        sorted(zip(snap.column("k").to_pylist(), snap.column("lsn").to_pylist()))


def test_append_mode_no_tombstone_masking(tmp_path):
    lake_dir = str(tmp_path / "lake")
    t = pa.table({
        "k": ["x", "x"], "lsn": pa.array([1, 2], pa.int64()),
        "op": ["upsert", "delete"],
    })
    f = str(tmp_path / "s.parquet")
    pq.write_table(t, f)
    spec = TableSpec(name="t_append2", key="k", order="lsn", mode="append",
                     num_partitions=2, envelope=())
    apply.apply_epoch(lake_dir, [f], spec=spec)
    snap = lake.snapshot(lake_dir, spec=spec)
    # op column is payload, not a tombstone: both rows survive a live read
    assert snap.num_rows == 2
