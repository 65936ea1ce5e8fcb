"""Malformed-event policy (TableSpec.on_bad_rows): rows with a NULL key or
NULL order/LSN cannot be partitioned or merged. The reference inherits this
check from Postgres NOT NULL constraints (the sync crashes); a streaming
lake engine needs an explicit policy: fail fast, drop, or divert to a
dead-letter queue under the lake and keep the epoch flowing."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray.spec import TableSpec


def _shard(path, keys, lsns, vals):
    pq.write_table(pa.table({
        "k": pa.array(keys, pa.string()), "lsn": pa.array(lsns, pa.int64()),
        "v": pa.array(vals, pa.int64()),
    }), str(path))
    return str(path)


def _spec(policy):
    return TableSpec(name="t_dlq", key="k", order="lsn", num_partitions=4,
                     envelope=(), on_bad_rows=policy)


def test_dead_letter_diverts_and_applies_rest(tmp_path):
    lake_dir = str(tmp_path / "lake")
    f = _shard(tmp_path / "s1.parquet",
               ["a", None, "c", "d"], [1, 2, None, 4], [10, 20, 30, 40])
    spec = _spec("dead_letter")
    m = apply.apply_epoch(lake_dir, [f], spec=spec)
    snap = lake.snapshot(lake_dir, spec=spec)
    assert dict(zip(snap.column("k").to_pylist(),
                    snap.column("v").to_pylist())) == {"a": 10, "d": 40}

    dl = lake.read_dead_letters(lake_dir).take_all()
    assert len(dl) == 2
    by_v = {r["v"]: r for r in dl}
    assert by_v[20]["__dlq_reason"] == "null_key"
    assert by_v[30]["__dlq_reason"] == "null_order"
    assert all(r["__dlq_epoch_id"] == m.applied_epoch_ids[-1] for r in dl)

    # exactly-once: re-applying the recorded input set never re-screens,
    # so the DLQ does not grow
    apply.apply_epoch(lake_dir, [f], spec=spec)
    assert len(lake.read_dead_letters(lake_dir).take_all()) == 2


def test_both_null_reason_and_epoch_filter(tmp_path):
    lake_dir = str(tmp_path / "lake")
    f1 = _shard(tmp_path / "s1.parquet", [None], [None], [1])
    f2 = _shard(tmp_path / "s2.parquet", ["x", None], [5, 6], [2, 3])
    spec = _spec("dead_letter")
    m1 = apply.apply_epoch(lake_dir, [f1], spec=spec)
    m2 = apply.apply_epoch(lake_dir, [f2], spec=spec)
    assert m2.epoch == m1.epoch + 1
    e1, e2 = m2.applied_epoch_ids
    only1 = lake.read_dead_letters(lake_dir, epoch_id=e1).take_all()
    assert len(only1) == 1 and only1[0]["__dlq_reason"] == "null_key,null_order"
    assert len(lake.read_dead_letters(lake_dir, epoch_id=e2).take_all()) == 1
    # an all-bad epoch still committed (consumed) with an empty contribution
    assert lake.snapshot(lake_dir, spec=spec).column("v").to_pylist() == [2]


def test_fail_policy_refuses_the_epoch(tmp_path):
    lake_dir = str(tmp_path / "lake")
    f = _shard(tmp_path / "s1.parquet", ["a", None], [1, 2], [1, 2])
    with pytest.raises(Exception, match="malformed row"):
        apply.apply_epoch(lake_dir, [f], spec=_spec("fail"))
    import vlm_eden_dataset_etl_ray.manifest as mf
    assert mf.latest(lake_dir) is None


def test_drop_policy_discards_silently(tmp_path):
    lake_dir = str(tmp_path / "lake")
    f = _shard(tmp_path / "s1.parquet", ["a", None], [1, 2], [1, 2])
    apply.apply_epoch(lake_dir, [f], spec=_spec("drop"))
    assert lake.snapshot(lake_dir, spec=_spec("drop")).num_rows == 1
    assert lake.read_dead_letters(lake_dir).count() == 0


def test_dead_letter_on_dataset_apply(tmp_path):
    import ray.data as rd

    lake_dir = str(tmp_path / "lake")
    t = pa.table({"k": pa.array(["a", None], pa.string()),
                  "lsn": pa.array([1, 2], pa.int64()),
                  "v": pa.array([7, 8], pa.int64())})
    spec = _spec("dead_letter")
    apply.apply_epoch_dataset(lake_dir, rd.from_arrow(t), epoch_id="eD",
                              spec=spec)
    assert lake.snapshot(lake_dir, spec=spec).column("v").to_pylist() == [7]
    dl = lake.read_dead_letters(lake_dir).take_all()
    assert len(dl) == 1 and dl[0]["__dlq_epoch_id"] == "eD"


def test_dead_letter_on_partial_update_engine(tmp_path):
    # the screen runs before engine normalization, so merge engines see
    # only well-formed rows
    lake_dir = str(tmp_path / "lake")
    spec = TableSpec(name="t_dlq_pu", key="k", order="lsn", num_partitions=2,
                     envelope=(), merge_engine="partial_update",
                     on_bad_rows="dead_letter")
    f = _shard(tmp_path / "s.parquet", ["a", None, "a"], [1, 2, None],
               [10, 20, 30])
    apply.apply_epoch(lake_dir, [f], spec=spec)
    snap = lake.snapshot(lake_dir, spec=spec)
    assert snap.column("k").to_pylist() == ["a"]
    assert snap.column("v").to_pylist() == [10]
    assert lake.read_dead_letters(lake_dir).count() == 2
