"""Write-audit-publish gate (apply_epoch(audit=...)): expectations are
evaluated against the pinned, UNPUBLISHED candidate snapshot after the
shuffle stages delta files and before the atomic manifest publish. A
violation raises quality.AuditError, publishes nothing, and leaves the
exactly-once ledger clean so a corrected re-run applies normally.

The reference's Postgres constraints refuse bad rows at the INSERT
(sync_base.py upserts hit table constraints); a file lake has no database
to refuse a write, so the gate is the 2PC analog: audit between stage and
publish (Iceberg WAP shape)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray.functions.quality import AuditError
from vlm_eden_dataset_etl_ray.spec import TableSpec

SPEC = TableSpec(name="t_wap", key="k", order="lsn", num_partitions=4,
                 envelope=())


def _shard(path, keys, lsns, vals):
    pq.write_table(pa.table({
        "k": pa.array(keys), "lsn": pa.array(lsns, pa.int64()),
        "v": pa.array(vals, pa.int64()),
    }), str(path))
    return str(path)


def test_passing_audit_publishes(tmp_path):
    lake_dir = str(tmp_path / "lake")
    f = _shard(tmp_path / "s1.parquet", ["a", "b"], [1, 2], [10, 20])
    m = apply.apply_epoch(lake_dir, [f], spec=SPEC,
                          audit=[("not_null", "v"), ("in_range", "v", 0, 100)])
    assert m.epoch == 1
    snap = lake.snapshot(lake_dir, spec=SPEC)
    assert snap.num_rows == 2


def test_failing_audit_publishes_nothing_and_rerun_recovers(tmp_path):
    lake_dir = str(tmp_path / "lake")
    good = _shard(tmp_path / "s1.parquet", ["a", "b"], [1, 2], [10, 20])
    rules = [("in_range", "v", 0, 100)]
    apply.apply_epoch(lake_dir, [good], spec=SPEC, audit=rules)

    bad = _shard(tmp_path / "s2.parquet", ["b", "c"], [3, 4], [30, -5])
    with pytest.raises(AuditError) as ei:
        apply.apply_epoch(lake_dir, [bad], spec=SPEC, audit=rules)
    rep = ei.value.report
    assert rep.num_rows == 1 and rep.column("violations")[0].as_py() == 1

    # nothing published: latest manifest is still epoch 1, state unchanged,
    # and the bad input set was never recorded in the ledger
    m = mf.latest(lake_dir)
    assert m.epoch == 1
    snap = lake.snapshot(lake_dir, spec=SPEC)
    assert snap.column("v").to_pylist() == [10, 20]
    assert len(m.applied_epoch_ids) == 1

    # the corrected feed (same keys, valid values) applies as epoch 2
    fixed = _shard(tmp_path / "s3.parquet", ["b", "c"], [3, 4], [30, 5])
    m2 = apply.apply_epoch(lake_dir, [fixed], spec=SPEC, audit=rules)
    assert m2.epoch == 2
    snap2 = lake.snapshot(lake_dir, spec=SPEC)
    assert dict(zip(snap2.column("k").to_pylist(),
                    snap2.column("v").to_pylist())) == {"a": 10, "b": 30,
                                                        "c": 5}


def test_audit_checks_table_invariant_of_touched_partitions(tmp_path):
    # scope is the post-merge state of the touched partitions: an epoch
    # whose OWN rows are clean still fails if it leaves a previously-bad
    # row violating the invariant in a partition it touched
    lake_dir = str(tmp_path / "lake")
    seed = _shard(tmp_path / "s1.parquet", ["a"], [1], [-1])  # no audit yet
    apply.apply_epoch(lake_dir, [seed], spec=SPEC)
    touch_a = _shard(tmp_path / "s2.parquet", ["a"], [0], [50])  # stale LSN
    with pytest.raises(AuditError):
        # LWW keeps the v=-1 row (lsn 1 > 0); the invariant is violated
        apply.apply_epoch(lake_dir, [touch_a], spec=SPEC,
                          audit=[("in_range", "v", 0, 100)])
    # repairing the row with a newer LSN passes the same gate
    repair = _shard(tmp_path / "s3.parquet", ["a"], [2], [50])
    apply.apply_epoch(lake_dir, [repair], spec=SPEC,
                      audit=[("in_range", "v", 0, 100)])
    assert lake.snapshot(lake_dir, spec=SPEC).column("v").to_pylist() == [50]


def test_unique_audit_on_append_table(tmp_path):
    # hash partitioning makes per-partition unique(key) a GLOBAL check
    spec = TableSpec(name="t_wap_app", key="k", order="lsn", mode="append",
                     num_partitions=4, envelope=())
    lake_dir = str(tmp_path / "lake")
    f1 = _shard(tmp_path / "s1.parquet", ["a", "b"], [1, 2], [1, 2])
    apply.apply_epoch(lake_dir, [f1], spec=spec, audit=[("unique", "k")])
    dup = _shard(tmp_path / "s2.parquet", ["b", "c"], [3, 4], [3, 4])
    with pytest.raises(AuditError):
        apply.apply_epoch(lake_dir, [dup], spec=spec, audit=[("unique", "k")])
    assert mf.latest(lake_dir).epoch == 1
    fresh = _shard(tmp_path / "s3.parquet", ["c", "d"], [3, 4], [3, 4])
    m = apply.apply_epoch(lake_dir, [fresh], spec=spec,
                          audit=[("unique", "k")])
    assert m.epoch == 2
    assert lake.snapshot(lake_dir, spec=spec).num_rows == 4


def test_audited_dataset_apply(tmp_path):
    import ray.data as rd

    lake_dir = str(tmp_path / "lake")
    t = pa.table({"k": ["a", "b"], "lsn": pa.array([1, 2], pa.int64()),
                  "v": pa.array([5, -7], pa.int64())})
    with pytest.raises(AuditError):
        apply.apply_epoch_dataset(lake_dir, rd.from_arrow(t), epoch_id="e1",
                                  spec=SPEC, audit=[("in_range", "v", 0, 9)])
    assert mf.latest(lake_dir) is None
    ok = pa.table({"k": ["a", "b"], "lsn": pa.array([1, 2], pa.int64()),
                   "v": pa.array([5, 7], pa.int64())})
    m = apply.apply_epoch_dataset(lake_dir, rd.from_arrow(ok), epoch_id="e1",
                                  spec=SPEC, audit=[("in_range", "v", 0, 9)])
    assert m.epoch == 1


def test_warehouse_stays_consistent_when_one_table_fails_audit(tmp_path):
    """Warehouse-level WAP by construction: the fact's failed audit aborts
    its lake epoch, so the atomic warehouse marker never publishes and
    readers through the warehouse keep the previous CONSISTENT (dim+fact)
    pair — including the dim's already-committed new epoch staying
    invisible; the corrected re-run skips the dim (exactly-once) and
    publishes both."""
    from vlm_eden_dataset_etl_ray import warehouse as wh

    wdir = str(tmp_path / "wh")
    dim_dir, fact_dir = str(tmp_path / "dim"), str(tmp_path / "fact")
    rules = [("in_range", "v", 0, 100)]

    def sync(tag, dim_rows, fact_rows, fact_audit=rules):
        f1 = _shard(tmp_path / f"d_{tag}.parquet", *dim_rows)
        f2 = _shard(tmp_path / f"f_{tag}.parquet", *fact_rows)
        md = apply.apply_epoch(dim_dir, [f1], spec=SPEC, audit=rules)
        mf_ = apply.apply_epoch(fact_dir, [f2], spec=SPEC, audit=fact_audit)
        return wh.commit_epoch(
            wdir, {"dim": (dim_dir, md.epoch), "fact": (fact_dir, mf_.epoch)},
            epoch_id=f"sync-{tag}")

    m1 = sync("a", (["d1"], [1], [10]), (["f1"], [1], [20]))
    assert m1.epoch == 1

    # second sync: dim applies, fact FAILS its audit → no warehouse epoch
    f1 = _shard(tmp_path / "d_b.parquet", ["d2"], [2], [30])
    apply.apply_epoch(dim_dir, [f1], spec=SPEC, audit=rules)
    f2 = _shard(tmp_path / "f_b.parquet", ["f2"], [2], [-40])
    with pytest.raises(AuditError):
        apply.apply_epoch(fact_dir, [f2], spec=SPEC, audit=rules)
    assert wh.latest(wdir).epoch == 1
    # warehouse readers still see sync-a's pair: the dim's epoch-2 row is
    # invisible through the warehouse even though its lake committed
    dim_t = wh.scan(wdir, "dim", spec=SPEC).take_all()
    assert sorted(r["k"] for r in dim_t) == ["d1"]

    # corrected fact: dim epoch is skipped (exactly-once), both publish
    f2ok = _shard(tmp_path / "f_b2.parquet", ["f2"], [2], [40])
    mfac = apply.apply_epoch(fact_dir, [f2ok], spec=SPEC, audit=rules)
    mdim = mf.latest(dim_dir)
    m2 = wh.commit_epoch(wdir, {"dim": (dim_dir, mdim.epoch),
                                "fact": (fact_dir, mfac.epoch)},
                         epoch_id="sync-b")
    assert m2.epoch == 2
    dim_t = wh.scan(wdir, "dim", spec=SPEC).take_all()
    fact_t = wh.scan(wdir, "fact", spec=SPEC).take_all()
    assert sorted(r["k"] for r in dim_t) == ["d1", "d2"]
    assert sorted(r["v"] for r in fact_t) == [20, 40]


def test_audit_sees_finalized_values_on_aggregate_engine(tmp_path):
    """Non-LWW lakes audit the FINALIZED user-facing view (the candidate
    scan runs live_only, so engine-internal state columns are folded):
    an in_range rule on a running total gates the accumulated value, not
    the per-epoch contribution."""
    lake_dir = str(tmp_path / "lake")
    spec = TableSpec(name="t_wap_agg", key="k", order="lsn",
                     num_partitions=2, envelope=(), merge_engine="aggregate",
                     aggregations=(("v", "sum"),), on_delete="error")
    rules = [("in_range", "v", 0, 100)]
    f1 = _shard(tmp_path / "s1.parquet", ["a", "a"], [1, 2], [40, 30])
    m1 = apply.apply_epoch(lake_dir, [f1], spec=spec, audit=rules)  # 70 ok
    assert m1.epoch == 1
    # +40 pushes the accumulated total to 110 > 100 — refused even though
    # the epoch's own contribution (40) passes the rule
    f2 = _shard(tmp_path / "s2.parquet", ["a"], [3], [40])
    with pytest.raises(AuditError):
        apply.apply_epoch(lake_dir, [f2], spec=spec, audit=rules)
    assert mf.latest(lake_dir).epoch == 1
    snap = lake.snapshot(lake_dir, spec=spec)
    assert snap.column("v").to_pylist() == [70]


def test_incremental_tail_parks_on_audited_bad_chunk(tmp_path):
    """run_incremental(audit=...) with a byte-capped backlog: chunks before
    the violating shard commit, the bad chunk is refused with nothing
    recorded, and the re-tick after fixing the shard resumes exactly there
    (file-set lineage: fixed shard = new file = pending)."""
    import os

    from vlm_eden_dataset_etl_ray.pipelines.cdc import run_incremental

    chg = tmp_path / "chg"
    chg.mkdir()
    lake_dir = str(tmp_path / "lake")
    rules = [("in_range", "v", 0, 100)]
    _shard(chg / "a.parquet", ["a"], [1], [10])
    _shard(chg / "b.parquet", ["b"], [2], [-20])  # violates
    _shard(chg / "c.parquet", ["c"], [3], [30])
    with pytest.raises(AuditError):
        run_incremental(lake_dir, str(chg), spec=SPEC, audit=rules,
                        max_epoch_bytes=1)  # one shard per epoch
    m = mf.latest(lake_dir)
    assert m.epoch == 1  # chunk "a" committed, tail parked on "b"
    assert lake.snapshot(lake_dir, spec=SPEC).column("v").to_pylist() == [10]

    os.remove(chg / "b.parquet")
    _shard(chg / "b2.parquet", ["b"], [2], [20])
    m = run_incremental(lake_dir, str(chg), spec=SPEC, audit=rules,
                        max_epoch_bytes=1)
    assert m.epoch == 3  # b2 and c applied in order
    snap = lake.snapshot(lake_dir, spec=SPEC)
    assert dict(zip(snap.column("k").to_pylist(),
                    snap.column("v").to_pylist())) == {"a": 10, "b": 20,
                                                       "c": 30}
