"""DLQ drain: replay_dead_letters repairs quarantined rows through a
fix function, applies them as one exactly-once epoch, and deletes the
drained files only after the commit; rows still malformed re-quarantine
under the NEW epoch id so repeated drains converge."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray.spec import TableSpec

SPEC = TableSpec(name="t_drain", key="k", order="lsn", num_partitions=4,
                 envelope=(), on_bad_rows="dead_letter")


def test_drain_repairs_and_is_exactly_once(tmp_path):
    lake_dir = str(tmp_path / "lake")
    f = str(tmp_path / "s.parquet")
    pq.write_table(pa.table({
        "k": pa.array(["a", None, None], pa.string()),
        "lsn": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64()),
        "hint": pa.array(["", "b", ""], pa.string()),  # recoverable key
    }), f)
    apply.apply_epoch(lake_dir, [f], spec=SPEC)
    assert lake.read_dead_letters(lake_dir).count() == 2

    def fix(t: pa.Table) -> pa.Table:
        # recover the key from the hint where present; hopeless rows stay
        # null-keyed and re-quarantine
        k = pc.if_else(pc.equal(t.column("hint"), ""), t.column("k"),
                       t.column("hint"))
        return t.set_column(t.schema.get_field_index("k"), "k", k)

    m = lake.replay_dead_letters(lake_dir, fix, spec=SPEC)
    assert m is not None
    snap = lake.snapshot(lake_dir, spec=SPEC)
    assert dict(zip(snap.column("k").to_pylist(),
                    snap.column("v").to_pylist())) == {"a": 10, "b": 20}
    # lsn=3's row had no recoverable key: re-quarantined under the drain id
    left = lake.read_dead_letters(lake_dir).take_all()
    assert len(left) == 1 and left[0]["v"] == 30
    assert left[0]["__dlq_epoch_id"].startswith("dlq-")

    # draining again with the same (non-)fix converges: the hopeless row
    # cycles to a new drain id but the lake state is unchanged
    lake.replay_dead_letters(lake_dir, fix, spec=SPEC)
    snap2 = lake.snapshot(lake_dir, spec=SPEC)
    assert snap2.column("v").to_pylist() == snap.column("v").to_pylist()

    # empty DLQ → no-op
    def drop_all(t):
        return t.filter(pc.is_valid(t.column("k")))

    lake.replay_dead_letters(lake_dir, drop_all, spec=SPEC)
    assert lake.replay_dead_letters(lake_dir, drop_all, spec=SPEC) is None


def test_dlq_reads_across_schema_evolution(tmp_path):
    """DLQ files quarantined before and after a widening migration carry
    different physical schemas; reads unify to the union (missing columns
    as nulls) and the drain still applies."""
    lake_dir = str(tmp_path / "lake")
    f1 = str(tmp_path / "s1.parquet")
    pq.write_table(pa.table({
        "k": pa.array([None], pa.string()), "lsn": pa.array([1], pa.int64()),
        "v": pa.array([10], pa.int64())}), f1)
    f2 = str(tmp_path / "s2.parquet")
    pq.write_table(pa.table({
        "k": pa.array([None], pa.string()), "lsn": pa.array([2], pa.int64()),
        "v": pa.array([20], pa.int64()),
        "extra": pa.array(["x"], pa.string())}), f2)
    apply.apply_epoch(lake_dir, [f1], spec=SPEC)
    apply.apply_epoch(lake_dir, [f2], spec=SPEC)
    rows = lake.read_dead_letters(lake_dir).take_all()
    assert len(rows) == 2
    by_lsn = {r["lsn"]: r for r in rows}
    assert by_lsn[1].get("extra") is None and by_lsn[2]["extra"] == "x"

    def fix(t: pa.Table) -> pa.Table:
        k = pa.array([f"fixed{v}" for v in t.column("lsn").to_pylist()])
        return t.set_column(t.schema.get_field_index("k"), "k", k)

    lake.replay_dead_letters(lake_dir, fix, spec=SPEC)
    snap = lake.snapshot(lake_dir, spec=SPEC)
    assert sorted(snap.column("k").to_pylist()) == ["fixed1", "fixed2"]
    assert lake.read_dead_letters(lake_dir).count() == 0
