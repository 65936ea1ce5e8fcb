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
