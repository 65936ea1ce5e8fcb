"""Per-file key blooms (Hudi-style point-lookup index): every delta /
compacted file up to a size budget carries a bloom over its key column in
the parquet FOOTER (never the manifest — manifests stay slim at any file
count). ``lake.lookup`` / ``scan(key_filter=...)`` skip files the bloom
proves hold none of the asked keys, and restrict surviving files to the
asked keys BEFORE the merge — both safe at any delta depth because merge
resolution is per-key."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray.functions import hashing as H
from vlm_eden_dataset_etl_ray.spec import TableSpec

SPEC = TableSpec(name="t_bloom", key="k", order="lsn", num_partitions=1,
                 envelope=())


def _epoch(tmp_path, i, keys, lsns, vals, deletes=()):
    ops = ["delete" if k in deletes else "upsert" for k in keys]
    f = str(tmp_path / f"s{i}.parquet")
    pq.write_table(pa.table({
        "k": pa.array(keys, pa.string()), "lsn": pa.array(lsns, pa.int64()),
        "v": pa.array(vals, pa.int64()), "op": pa.array(ops),
    }), f)
    return f


def test_bloom_no_false_negatives_and_fp_rate():
    keys = pa.array([f"doc{i}" for i in range(20000)])
    p = H.key_bloom_build(keys)
    h1, h2 = H.key_bloom_probe_hashes(keys)
    assert H.key_bloom_may_contain_any(p, h1, h2)  # every present key hits
    fp = sum(
        H.key_bloom_may_contain_any(
            p, *H.key_bloom_probe_hashes(pa.array([f"nope{i}"])))
        for i in range(1000))
    assert fp < 30  # ~0.5% expected at 10 bits/key; generous bound


def test_bloom_footer_written_and_lookup_exact(tmp_path):
    lake_dir = str(tmp_path / "lake")
    for i in range(6):
        ks = [f"k{i}_{j}" for j in range(50)]
        f = _epoch(tmp_path, i, ks, list(range(i * 50, i * 50 + 50)),
                   [i] * 50)
        apply.apply_epoch(lake_dir, [f], spec=SPEC)
    m = mf.latest(lake_dir)
    files = m.files(0)
    assert len(files) == 6
    from vlm_eden_dataset_etl_ray import fsio
    for f in files:
        md = fsio.read_parquet_schema(f).metadata or {}
        assert apply.BLOOM_META_KEY in md
    # point lookups resolve exactly: live, updated, deleted, missing
    t = lake.lookup(lake_dir, ["k3_7"], spec=SPEC)
    assert t.num_rows == 1 and t.column("v")[0].as_py() == 3
    assert lake.lookup(lake_dir, ["zzz"], spec=SPEC).num_rows == 0
    t = lake.lookup(lake_dir, ["k0_0", "k5_49"], spec=SPEC)
    assert t.column("v").to_pylist() == [0, 5]


def test_bloom_skips_files_without_changing_results(tmp_path):
    lake_dir = str(tmp_path / "lake")
    for i in range(8):
        ks = [f"e{i}_{j}" for j in range(40)]
        f = _epoch(tmp_path, i, ks, list(range(i * 40, i * 40 + 40)),
                   [i] * 40)
        apply.apply_epoch(lake_dir, [f], spec=SPEC)
    m = mf.latest(lake_dir)
    items = lake._scan_items(m)
    batch = pa.Table.from_pylist(items)
    import vlm_eden_dataset_etl_ray.fsio as fsio
    reads = []
    orig = fsio.read_parquet

    def spy(path, *a, **kw):
        reads.append(path)
        return orig(path, *a, **kw)

    fsio.read_parquet = spy
    try:
        out = pa.concat_tables(list(lake._merge_read(
            batch, SPEC, None, True, schema=pa.schema(
                [("k", pa.string()), ("lsn", pa.int64()),
                 ("v", pa.int64()), ("op", pa.string())]),
            key_filter=pa.array(["e4_11"]))))
    finally:
        fsio.read_parquet = orig
    assert out.filter(pa.compute.equal(out.column("k"), "e4_11")).num_rows == 1
    # 8 delta files in the partition; the bloom admits the holder plus at
    # most a false positive or two
    assert len(reads) <= 3, reads


def test_deleted_key_stays_deleted_through_bloom_path(tmp_path):
    lake_dir = str(tmp_path / "lake")
    f1 = _epoch(tmp_path, 1, ["a", "b"], [1, 2], [10, 20])
    f2 = _epoch(tmp_path, 2, ["a"], [3], [0], deletes=("a",))
    apply.apply_epoch(lake_dir, [f1], spec=SPEC)
    apply.apply_epoch(lake_dir, [f2], spec=SPEC)
    assert lake.lookup(lake_dir, ["a"], spec=SPEC).num_rows == 0
    assert lake.lookup(lake_dir, ["b"], spec=SPEC).num_rows == 1


def test_oversize_files_skip_bloom_but_lookup_still_exact(tmp_path):
    # a file above the bloom budget carries no footer bloom and is always
    # read — correctness unchanged
    lake_dir = str(tmp_path / "lake")
    n = 120_000
    ks = [f"big{j}" for j in range(n)]
    f = _epoch(tmp_path, 1, ks, list(range(n)), [7] * n)
    apply.apply_epoch(lake_dir, [f], spec=SPEC)
    m = mf.latest(lake_dir)
    from vlm_eden_dataset_etl_ray import fsio
    md = fsio.read_parquet_schema(m.files(0)[0]).metadata or {}
    assert apply.BLOOM_META_KEY not in md
    t = lake.lookup(lake_dir, ["big54321"], spec=SPEC)
    assert t.num_rows == 1 and t.column("v")[0].as_py() == 7


def test_lookup_after_clustered_compaction(tmp_path):
    # compaction rewrites files (with blooms when under budget); point
    # lookups stay exact across the rewrite
    lake_dir = str(tmp_path / "lake")
    for i in range(4):
        ks = [f"c{i}_{j}" for j in range(30)]
        f = _epoch(tmp_path, i, ks, list(range(i * 30, i * 30 + 30)),
                   [i] * 30)
        apply.apply_epoch(lake_dir, [f], spec=SPEC)
    lake.compact(lake_dir, spec=SPEC)
    t = lake.lookup(lake_dir, ["c2_5", "c0_29"], spec=SPEC)
    assert sorted(t.column("v").to_pylist()) == [0, 2]
    from vlm_eden_dataset_etl_ray import fsio
    m = mf.latest(lake_dir)
    assert any(apply.BLOOM_META_KEY in (fsio.read_parquet_schema(f).metadata
                                        or {}) for f in m.files(0))


def test_scan_key_filter_derives_partition_pruning(tmp_path):
    # scan(key_filter=...) without pids auto-prunes to the asked keys'
    # hash partitions and equals a post-scan is_in filter
    spec = TableSpec(name="t_bloom_kf", key="k", order="lsn",
                     num_partitions=8, envelope=())
    lake_dir = str(tmp_path / "lake")
    ks = [f"p{j}" for j in range(64)]
    f = _epoch(tmp_path, 0, ks, list(range(64)), list(range(64)))
    apply.apply_epoch(lake_dir, [f], spec=spec)
    got = lake.scan(lake_dir, spec=spec,
                    key_filter=["p3", "p17", "zzz"]).take_all()
    assert sorted(r["k"] for r in got) == ["p17", "p3"]


def test_lookup_on_partial_update_lake_through_bloom_path(tmp_path):
    # state rows are keyed like LWW rows: the pre-merge key restriction
    # and bloom skipping compose with the partial-update fold, and lookup
    # returns the finalized (user-facing) merged row
    spec = TableSpec(name="t_bloom_pu", key="k", order="lsn",
                     num_partitions=2, envelope=(),
                     merge_engine="partial_update")
    lake_dir = str(tmp_path / "lake")
    f1 = str(tmp_path / "s1.parquet")
    pq.write_table(pa.table({
        "k": ["a", "b"], "lsn": pa.array([1, 2], pa.int64()),
        "x": pa.array([10, 20], pa.int64()),
        "y": pa.array([None, None], pa.int64())}), f1)
    f2 = str(tmp_path / "s2.parquet")
    pq.write_table(pa.table({
        "k": ["a"], "lsn": pa.array([3], pa.int64()),
        "x": pa.array([None], pa.int64()),
        "y": pa.array([99], pa.int64())}), f2)
    apply.apply_epoch(lake_dir, [f1], spec=spec)
    apply.apply_epoch(lake_dir, [f2], spec=spec)
    t = lake.lookup(lake_dir, ["a"], spec=spec)
    row = t.to_pylist()[0]
    assert row["x"] == 10 and row["y"] == 99  # column-level merge survived
    assert not any(c.startswith("__") for c in t.column_names)
