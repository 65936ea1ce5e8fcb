"""Clustered compaction (`compact(cluster_by=...)`): stripe sort-split into
narrow zone-map files, per-file pruning in the delta-free window, fallback
to whole-item pruning once deltas accumulate."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply, lake, manifest as mf
from vlm_eden_dataset_etl_ray.spec import TableSpec

SPEC = TableSpec(name="clu", key="doc_id", order="lsn", num_partitions=2,
                 envelope=())


def _epoch_table(lo: int, hi: int, seed: int) -> pa.Table:
    lsn = np.arange(lo, hi, dtype=np.int64)
    rng = np.random.default_rng(seed)
    return pa.table({
        "lsn": pa.array(lsn),
        "op": pa.array(["upsert"] * len(lsn)),
        "doc_id": pa.array(np.char.add("d", np.arange(lo, hi).astype("U6"))),
        # n_tok shuffled so UNclustered files all span the full range
        "n_tok": pa.array(rng.permutation(len(lsn)).astype(np.int64)),
    })


def _build(tmp_path):
    lake_dir = str(tmp_path / "clu")
    for i, (lo, hi) in enumerate([(0, 400), (400, 800)]):
        apply.apply_epoch_dataset(
            lake_dir, rd.from_arrow(_epoch_table(lo, hi, seed=i)),
            epoch_id=f"c:{lo}", spec=SPEC)
    return lake_dir


def _rows(ds) -> list[int]:
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return []
    return sorted(pa.concat_tables(batches).column("lsn").to_pylist())


def _files_scanned(lake_dir, stats_filter) -> tuple[int, int]:
    m = mf.latest(lake_dir)
    items = lake._scan_items(m)
    pruned, _ = lake._apply_stats_filter(m, SPEC, items, stats_filter, None)
    return (sum(len(i["files"]) for i in pruned),
            sum(len(i["files"]) for i in items))


def test_cluster_by_splits_narrow_files_and_prunes(tmp_path):
    lake_dir = _build(tmp_path)
    # tiny target forces many cluster files per stripe
    lake.compact(lake_dir, spec=SPEC, cluster_by=["n_tok"],
                 cluster_file_bytes=4096)
    m = mf.latest(lake_dir)
    n_base = sum(len(st.base) for st in m.partitions.values())
    assert n_base > len(m.partitions), "clustering produced one file/stripe"
    # every file's n_tok zone map is narrow: total coverage ≈ disjoint
    for st in m.partitions.values():
        spans = sorted(tuple(s["n_tok"]) for s in st.file_stats.values())
        for (alo, ahi), (blo, bhi) in zip(spans, spans[1:]):
            assert ahi <= blo, "cluster ranges overlap"
    # correctness: clustered scan == plain filter, with/without stats path
    probe = ("n_tok", 10, 60)
    got = _rows(lake.scan(lake_dir, spec=SPEC, columns=["lsn", "n_tok"],
                          stats_filter=probe))
    plain = lake.scan(lake_dir, spec=SPEC, columns=["lsn", "n_tok"])
    t = pa.concat_tables(plain.iter_batches(batch_format="pyarrow",
                                            batch_size=None))
    mask = pc.and_(pc.greater_equal(t.column("n_tok"), pa.scalar(10)),
                   pc.less_equal(t.column("n_tok"), pa.scalar(60)))
    assert got == sorted(t.filter(mask).column("lsn").to_pylist())
    # pruning really bites in the delta-free window
    kept, total = _files_scanned(lake_dir, probe)
    assert kept * 2 <= total, (kept, total)



def test_upsert_file_pruning_falls_back_once_deltas_arrive(tmp_path):
    lake_dir = _build(tmp_path)
    lake.compact(lake_dir, spec=SPEC, cluster_by=["n_tok"],
                 cluster_file_bytes=4096)
    kept0, total0 = _files_scanned(lake_dir, ("n_tok", 10, 60))
    assert kept0 < total0
    # new delta epoch: out-of-order stragglers become possible again
    apply.apply_epoch_dataset(
        lake_dir, rd.from_arrow(_epoch_table(800, 900, seed=9)),
        epoch_id="c:800", spec=SPEC)
    m = mf.latest(lake_dir)
    items = lake._scan_items(m)
    pruned, _ = lake._apply_stats_filter(
        m, SPEC, items, ("n_tok", 10, 60), None)
    for it in pruned:
        pid = int(it["pid"])
        want = next(i for i in items
                    if int(i["pid"]) == pid and i["stripe"] == it["stripe"])
        assert it["files"] == want["files"], "file-pruned despite deltas"
    # and the scan stays correct
    got = _rows(lake.scan(lake_dir, spec=SPEC, columns=["lsn", "n_tok"],
                          stats_filter=("n_tok", 10, 60)))
    plain = lake.scan(lake_dir, spec=SPEC, columns=["lsn", "n_tok"])
    t = pa.concat_tables(plain.iter_batches(batch_format="pyarrow",
                                            batch_size=None))
    mask = pc.and_(pc.greater_equal(t.column("n_tok"), pa.scalar(10)),
                   pc.less_equal(t.column("n_tok"), pa.scalar(60)))
    assert got == sorted(t.filter(mask).column("lsn").to_pylist())


def test_unclustered_compaction_unchanged(tmp_path):
    lake_dir = _build(tmp_path)
    before = _rows(lake.scan(lake_dir, spec=SPEC))
    lake.compact(lake_dir, spec=SPEC)
    m = mf.latest(lake_dir)
    assert all(len(st.base) == max(1, st.stripe_count)
               for st in m.partitions.values())
    assert _rows(lake.scan(lake_dir, spec=SPEC)) == before


def test_morton_cluster_fn_prunes_both_dimensions(tmp_path):
    import numpy as np

    from vlm_eden_dataset_etl_ray.functions.hashing import morton_interleave

    lake_dir = str(tmp_path / "zord")
    rng = np.random.default_rng(3)
    n = 4000
    t = pa.table({
        "lsn": pa.array(np.arange(n, dtype=np.int64)),
        "op": pa.array(["upsert"] * n),
        "doc_id": pa.array(np.char.add("d", np.arange(n).astype("U6"))),
        "a": pa.array(rng.integers(0, 1024, n).astype(np.int64)),
        "b": pa.array(rng.integers(0, 1024, n).astype(np.int64)),
    })
    apply.apply_epoch_dataset(lake_dir, rd.from_arrow(t), epoch_id="z:0",
                              spec=SPEC)

    def _zkey(tab: pa.Table):
        return morton_interleave(
            [tab.column("a").to_numpy(zero_copy_only=False),
             tab.column("b").to_numpy(zero_copy_only=False)], bits=10)

    lake.compact(lake_dir, spec=SPEC, cluster_fn=_zkey,
                 cluster_file_bytes=8192)
    m = mf.latest(lake_dir)
    assert sum(len(st.base) for st in m.partitions.values()) >= 8

    # a 2-D probe prunes on BOTH dimensions (each file covers a z-square)
    probe = [("a", 0, 255), ("b", 0, 255)]
    items = lake._scan_items(m)
    step1, _ = lake._apply_stats_filter(m, SPEC, items, probe[0], None)
    both, _ = lake._apply_stats_filter(m, SPEC, step1, probe[1], None)
    n_total = sum(len(i["files"]) for i in items)
    n_a = sum(len(i["files"]) for i in step1)
    n_both = sum(len(i["files"]) for i in both)
    assert n_a < n_total, "a-range pruned nothing"
    assert n_both < n_a, "b-range pruned nothing beyond a"

    # correctness: multi-range scan equals the plain double filter
    got = lake.scan(lake_dir, spec=SPEC, columns=["lsn", "a", "b"],
                    stats_filter=probe)
    gt = pa.concat_tables(got.iter_batches(batch_format="pyarrow",
                                           batch_size=None))
    plain = lake.scan(lake_dir, spec=SPEC, columns=["lsn", "a", "b"])
    pt = pa.concat_tables(plain.iter_batches(batch_format="pyarrow",
                                             batch_size=None))
    mask = pc.and_(
        pc.and_(pc.greater_equal(pt.column("a"), pa.scalar(0)),
                pc.less_equal(pt.column("a"), pa.scalar(255))),
        pc.and_(pc.greater_equal(pt.column("b"), pa.scalar(0)),
                pc.less_equal(pt.column("b"), pa.scalar(255))))
    assert (sorted(gt.column("lsn").to_pylist())
            == sorted(pt.filter(mask).column("lsn").to_pylist()))
