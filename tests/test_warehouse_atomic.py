"""Warehouse-level atomic multi-table epochs (warehouse.py): a crash
between per-lake commits must leave the previous CONSISTENT (dim + fact)
pair in effect for warehouse readers, and the re-run must converge.

The reference's star sync has the hole this closes: its watermark
advances mid-sync (/root/reference/sync/modalities.py:118), so a crash
publishes half the tables."""

import os

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray import warehouse as wh
from vlm_eden_dataset_etl_ray.apply import apply_epoch_dataset
from vlm_eden_dataset_etl_ray.spec import TableSpec

DIM = TableSpec(name="dim", key="k", order="lsn", num_partitions=2,
                envelope=())
FACT = TableSpec(name="fact", key="k", order="lsn", num_partitions=2,
                 envelope=())


def _chg(keys, vals, lsn0=0):
    n = len(keys)
    return rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "v": pa.array(vals, pa.string()),
        "lsn": pa.array(np.arange(lsn0, lsn0 + n, dtype=np.int64)),
        "op": pa.array(["upsert"] * n),
    }))


def _rows(ds):
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
    return sorted(zip(t.column("k").to_pylist(), t.column("v").to_pylist()))


def test_kill_between_commits_keeps_consistent_pair(tmp_path):
    w = str(tmp_path / "wh")
    dim_lake, fact_lake = os.path.join(w, "dim"), os.path.join(w, "fact")

    # sync v1: both tables commit, then the atomic switch
    dm1 = apply_epoch_dataset(dim_lake, _chg([1, 2], ["d1", "d2"]),
                              epoch_id="dim-v1", spec=DIM)
    fm1 = apply_epoch_dataset(fact_lake, _chg([10, 11], ["f1", "f2"]),
                              epoch_id="fact-v1", spec=FACT)
    m1 = wh.commit_epoch(w, {"dim": (dim_lake, dm1.epoch),
                             "fact": (fact_lake, fm1.epoch)},
                         epoch_id="sync-v1")
    assert m1.epoch == 1

    # sync v2 CRASHES between the dim commit and the fact commit
    apply_epoch_dataset(dim_lake, _chg([1, 3], ["d1b", "d3"], lsn0=100),
                        epoch_id="dim-v2", spec=DIM)
    # ... no fact apply, no warehouse commit (the crash)

    # warehouse readers still see the v1 PAIR: old dim, old fact
    assert _rows(wh.scan(w, "dim", spec=DIM, columns=["k", "v"])) == \
        [(1, "d1"), (2, "d2")]
    assert _rows(wh.scan(w, "fact", spec=FACT, columns=["k", "v"])) == \
        [(10, "f1"), (11, "f2")]

    # resume: re-run the WHOLE sync — the dim apply is skipped via its
    # epoch_id, the fact applies, the switch publishes
    dm2 = apply_epoch_dataset(dim_lake, _chg([1, 3], ["d1b", "d3"], lsn0=100),
                              epoch_id="dim-v2", spec=DIM)
    assert dm2.epoch == 2  # idempotent: no third epoch appeared
    fm2 = apply_epoch_dataset(fact_lake, _chg([10, 12], ["f1b", "f3"],
                                              lsn0=100),
                              epoch_id="fact-v2", spec=FACT)
    m2 = wh.commit_epoch(w, {"dim": (dim_lake, dm2.epoch),
                             "fact": (fact_lake, fm2.epoch)},
                         epoch_id="sync-v2")
    assert m2.epoch == 2

    assert _rows(wh.scan(w, "dim", spec=DIM, columns=["k", "v"])) == \
        [(1, "d1b"), (2, "d2"), (3, "d3")]
    assert _rows(wh.scan(w, "fact", spec=FACT, columns=["k", "v"])) == \
        [(10, "f1b"), (11, "f2"), (12, "f3")]

    # time travel: warehouse epoch 1 still reads the v1 pair even though
    # both lakes have moved on
    assert _rows(wh.scan(w, "dim", spec=DIM, columns=["k", "v"],
                         warehouse_epoch=1)) == [(1, "d1"), (2, "d2")]
    assert _rows(wh.scan(w, "fact", spec=FACT, columns=["k", "v"],
                         warehouse_epoch=1)) == [(10, "f1"), (11, "f2")]


def test_commit_epoch_idempotent_and_race(tmp_path):
    w = str(tmp_path / "wh")
    lake = os.path.join(w, "t")
    m = apply_epoch_dataset(lake, _chg([1], ["a"]), epoch_id="e1", spec=DIM)

    first = wh.commit_epoch(w, {"t": (lake, m.epoch)}, epoch_id="s1")
    again = wh.commit_epoch(w, {"t": (lake, m.epoch)}, epoch_id="s1")
    assert (first.epoch, first.tables) == (again.epoch, again.tables)

    # a racing committer with a DIFFERENT id takes the next slot
    other = wh.commit_epoch(w, {"t": (lake, m.epoch)}, epoch_id="s2")
    assert other.epoch == first.epoch + 1
    assert wh.latest(w).epoch_id == "s2"


def test_run_etl_resume_path(tmp_path):
    from vlm_eden_dataset_etl_ray.pipelines.etl import (
        FACT_SPEC, fact_snapshot, run_etl)

    sf_dir = "/root/testdata/sf0.001"
    w = str(tmp_path / "star")
    lakes = run_etl(sf_dir, warehouse=w)
    m1 = wh.latest(w)
    assert m1 is not None and set(m1.tables) == {"dim_customer",
                                                 "fact_events"}
    n1 = fact_snapshot(lakes).count()
    assert n1 > 0

    # idempotent resume: nothing re-applies, no new warehouse epoch
    lakes2 = run_etl(sf_dir, warehouse=w, fresh=False)
    m2 = wh.latest(w)
    assert m2.epoch == m1.epoch and m2.tables == m1.tables
    assert fact_snapshot(lakes2).count() == n1

    # the warehouse view matches the direct lake view after a full sync
    n_wh = wh.scan(w, "fact_events", spec=FACT_SPEC,
                   columns=["doc_id"]).count()
    assert n_wh == n1


def test_warehouse_change_feed_is_snapshot_consistent(ray_session, tmp_path):
    """Per-table feeds between two ATOMIC warehouse epochs: each table
    feeds exactly the rows between its pinned lake epochs — a lake commit
    that never made it into a warehouse manifest is invisible."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vlm_eden_dataset_etl_ray import apply, warehouse as wh
    from vlm_eden_dataset_etl_ray.spec import TableSpec

    spec_d = TableSpec(name="dim", key="doc_id", order="lsn",
                       num_partitions=2, envelope=())
    spec_f = TableSpec(name="fact", key="doc_id", order="lsn",
                       num_partitions=2, envelope=())
    dims, facts = str(tmp_path / "dim"), str(tmp_path / "fact")

    def shard(path, rows):
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows]),
            "lsn": pa.array([r[1] for r in rows], pa.int64()),
            "op": pa.array(["upsert"] * len(rows)),
            "v": pa.array([r[2] for r in rows], pa.int64())}), path)
        return str(path)

    m_d1 = apply.apply_epoch(dims, [shard(tmp_path / "d1.parquet",
                                          [("a", 1, 10)])], spec=spec_d)
    m_f1 = apply.apply_epoch(facts, [shard(tmp_path / "f1.parquet",
                                           [("x", 1, 100)])], spec=spec_f)
    wh.commit_epoch(str(tmp_path), {"dim": (dims, m_d1.epoch),
                                    "fact": (facts, m_f1.epoch)},
                    epoch_id="sync-1")
    m_d2 = apply.apply_epoch(dims, [shard(tmp_path / "d2.parquet",
                                          [("b", 2, 20)])], spec=spec_d)
    m_f2 = apply.apply_epoch(facts, [shard(tmp_path / "f2.parquet",
                                           [("y", 2, 200)])], spec=spec_f)
    wh.commit_epoch(str(tmp_path), {"dim": (dims, m_d2.epoch),
                                    "fact": (facts, m_f2.epoch)},
                    epoch_id="sync-2")
    # a THIRD lake commit with NO warehouse manifest: must be invisible
    apply.apply_epoch(facts, [shard(tmp_path / "f3.parquet",
                                    [("z", 3, 300)])], spec=spec_f)

    feeds = wh.change_feed(str(tmp_path), 1, 2,
                           specs={"dim": spec_d, "fact": spec_f})
    dim_rows = feeds["dim"].take_all()
    fact_rows = feeds["fact"].take_all()
    assert [r["doc_id"] for r in dim_rows] == ["b"]
    assert [r["doc_id"] for r in fact_rows] == ["y"]  # z NOT visible
    # since-creation feed (from_epoch=0) carries the full pinned state
    feeds0 = wh.change_feed(str(tmp_path), 0, 2,
                            specs={"dim": spec_d, "fact": spec_f})
    assert sorted(r["doc_id"] for r in feeds0["fact"].take_all()) == ["x", "y"]
