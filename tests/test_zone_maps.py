"""Zone-map file statistics: recorded at write time, pruned at scan time.

Skip granularity follows merge correctness: append tables prune files,
upsert tables prune only whole key-disjoint work items. Results must
always equal a plain post-merge filter.
"""

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply, lake, manifest as mf
from vlm_eden_dataset_etl_ray.spec import TableSpec

UPSERT = TableSpec(name="zm_u", key="doc_id", order="lsn", num_partitions=4,
                   envelope=())
APPEND = TableSpec(name="zm_a", key="doc_id", order="lsn", mode="append",
                   num_partitions=4, envelope=())


def _epoch_table(lo: int, hi: int) -> pa.Table:
    lsn = np.arange(lo, hi, dtype=np.int64)
    return pa.table({
        "lsn": pa.array(lsn),
        "op": pa.array(np.where(lsn % 17 == 3, "delete", "upsert")),
        "doc_id": pa.array(np.char.add("d", (lsn % 40).astype("U4"))),
        "n_tok": pa.array(lsn * 3),
    })


def _build(tmp_path, spec):
    lake_dir = str(tmp_path / spec.name)
    for lo, hi in [(0, 100), (100, 200), (200, 300)]:
        ds = rd.from_arrow(_epoch_table(lo, hi))
        apply.apply_epoch_dataset(lake_dir, ds, epoch_id=f"zm:{lo}:{hi}", spec=spec)
    return lake_dir


def _rows(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return pa.table({"lsn": pa.array([], pa.int64())})
    return pa.concat_tables(batches).sort_by("lsn")


def test_stats_recorded_in_manifest_and_after_compaction(tmp_path):
    lake_dir = _build(tmp_path, UPSERT)
    m = mf.latest(lake_dir)
    stats = [st.file_stats for st in m.partitions.values() if st.file_stats]
    assert stats, "no zone maps recorded"
    some = next(iter(stats[0].values()))
    assert "lsn" in some and "n_tok" in some
    assert some["lsn"][0] <= some["lsn"][1]
    lake.compact(lake_dir, spec=UPSERT)
    m2 = mf.latest(lake_dir)
    assert any(st.file_stats for st in m2.partitions.values()), "compaction lost stats"


def test_append_scan_prunes_files_and_matches_plain_filter(tmp_path):
    lake_dir = _build(tmp_path, APPEND)
    got = _rows(lake.scan(lake_dir, spec=APPEND, stats_filter=("lsn", 120, 180)))
    full = _rows(lake.scan(lake_dir, spec=APPEND))
    exp = full.filter(pc.and_(pc.greater_equal(full.column("lsn"), pa.scalar(120)),
                              pc.less_equal(full.column("lsn"), pa.scalar(180))))
    assert got.column("lsn").to_pylist() == exp.column("lsn").to_pylist()
    # pruning really happened: only the middle epoch's files survive
    m = mf.latest(lake_dir)
    items = lake._scan_items(m)
    pruned, _ = lake._apply_stats_filter(m, APPEND, items, ("lsn", 120, 180), None)
    n_all = sum(len(i["files"]) for i in items)
    n_kept = sum(len(i["files"]) for i in pruned)
    assert n_kept * 3 <= n_all, (n_kept, n_all)


def test_upsert_scan_correct_and_item_prunes_out_of_range(tmp_path):
    lake_dir = _build(tmp_path, UPSERT)
    got = _rows(lake.scan(lake_dir, spec=UPSERT, stats_filter=("lsn", 150, 260)))
    full = _rows(lake.scan(lake_dir, spec=UPSERT))
    exp = full.filter(pc.and_(pc.greater_equal(full.column("lsn"), pa.scalar(150)),
                              pc.less_equal(full.column("lsn"), pa.scalar(260))))
    assert got.column("lsn").to_pylist() == exp.column("lsn").to_pylist()
    # upsert NEVER drops individual files of a surviving item
    m = mf.latest(lake_dir)
    items = lake._scan_items(m)
    pruned, _ = lake._apply_stats_filter(m, UPSERT, items, ("lsn", 150, 260), None)
    by_pid = {i["pid"]: i for i in items}
    for it in pruned:
        assert it["files"] == by_pid[it["pid"]]["files"]
    # a range beyond every file's zone map prunes ALL items → empty scan
    empty, _ = lake._apply_stats_filter(m, UPSERT, items, ("lsn", 10_000, 20_000), None)
    assert empty == []
    assert _rows(lake.scan(lake_dir, spec=UPSERT,
                           stats_filter=("lsn", 10_000, 20_000))).num_rows == 0


def test_timestamp_bounds_normalize(tmp_path):
    spec = TableSpec(name="zm_t", key="doc_id", order="lsn", num_partitions=2,
                     envelope=())
    base = datetime.datetime(2024, 1, 1)
    ts = [base + datetime.timedelta(hours=i) for i in range(48)]
    t = pa.table({
        "lsn": pa.array(np.arange(48, dtype=np.int64)),
        "op": pa.array(["upsert"] * 48),
        "doc_id": pa.array([f"k{i}" for i in range(48)]),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    lake_dir = str(tmp_path / "zm_t")
    apply.apply_epoch_dataset(lake_dir, rd.from_arrow(t), epoch_id="zm_t", spec=spec)
    m = mf.latest(lake_dir)
    some = next(st.file_stats for st in m.partitions.values() if st.file_stats)
    assert isinstance(next(iter(some.values()))["ts"][0], int)  # micros
    lo, hi = base + datetime.timedelta(hours=10), base + datetime.timedelta(hours=20)
    got = _rows(lake.scan(lake_dir, spec=spec, stats_filter=("ts", lo, hi)))
    assert got.num_rows == 11  # hours 10..20 inclusive


def test_stats_filter_requires_projected_column(tmp_path):
    lake_dir = _build(tmp_path, UPSERT)
    try:
        lake.scan(lake_dir, spec=UPSERT, columns=["doc_id"],
                  stats_filter=("lsn", 0, 10))
    except ValueError as e:
        assert "projection" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_date32_bounds_compare_in_days(tmp_path):
    """date32 zone maps record DAYS; a datetime.date probe must normalize
    to days too (a micros probe would never prune and, worse, could
    mis-prune)."""
    spec = TableSpec(name="zm_d", key="doc_id", order="lsn", num_partitions=2,
                     envelope=())
    base = datetime.date(2024, 1, 1)
    days = [base + datetime.timedelta(days=i) for i in range(30)]
    t = pa.table({
        "lsn": pa.array(np.arange(30, dtype=np.int64)),
        "op": pa.array(["upsert"] * 30),
        "doc_id": pa.array([f"k{i}" for i in range(30)]),
        "d": pa.array(days, pa.date32()),
    })
    lake_dir = str(tmp_path / "zm_d")
    apply.apply_epoch_dataset(lake_dir, rd.from_arrow(t), epoch_id="zm_d", spec=spec)
    lo, hi = base + datetime.timedelta(days=5), base + datetime.timedelta(days=9)
    got = _rows(lake.scan(lake_dir, spec=spec, stats_filter=("d", lo, hi)))
    assert got.num_rows == 5
    # out-of-range prunes everything
    far = base + datetime.timedelta(days=1000)
    assert _rows(lake.scan(lake_dir, spec=spec,
                           stats_filter=("d", far, far))).num_rows == 0
