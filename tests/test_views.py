"""Incremental view maintenance: per-epoch delta folding must converge to
the full re-aggregation of the serial oracle under out-of-order epochs,
duplicates, tombstones, idempotent re-runs, and lagging views."""

import collections

import pyarrow as pa

from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake, oracle, views
from vlm_eden_dataset_etl_ray.views import ViewSpec, apply_epoch_with_views, read_view


def _view_table(view_root, name):
    ds = read_view(view_root, name)
    tbs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tbs:
        return pa.table({})
    return pa.concat_tables(tbs).sort_by("source")


def _expected(p):
    ora = oracle.final_state(p)
    agg = collections.defaultdict(lambda: [0, 0])
    for row in ora.select(["source", "n_tok"]).to_pylist():
        agg[row["source"]][0] += 1
        agg[row["source"]][1] += row["n_tok"]
    rows = sorted(agg.items())
    return pa.table({
        "source": pa.array([s for s, _ in rows]),
        "n": pa.array([v[0] for _, v in rows], pa.int64()),
        "total_tok": pa.array([v[1] for _, v in rows], pa.int64()),
    })


SPEC_V = [ViewSpec(name="by_source", group_cols=["source"],
                   count_alias="n", sum_cols={"n_tok": "total_tok"})]


def test_ivm_converges_out_of_order_epochs(tmp_path):
    p = cl.ChangelogParams(n_docs=300, n_events=4000, n_shards=9)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir, vroot = str(tmp_path / "lake"), str(tmp_path / "views")
    # out-of-order interleave across 3 epochs
    for i in (1, 0, 2):
        apply_epoch_with_views(lake_dir, files[i::3], SPEC_V, vroot)
    got = _view_table(vroot, "by_source")
    exp = _expected(p)
    assert got.equals(exp), f"\n{got.to_pydict()}\nvs\n{exp.to_pydict()}"


def test_ivm_idempotent_rerun_and_lagging_view_catchup(tmp_path):
    p = cl.ChangelogParams(n_docs=200, n_events=2500, n_shards=6)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir, vroot = str(tmp_path / "lake"), str(tmp_path / "views")

    apply_epoch_with_views(lake_dir, files[0::3], SPEC_V, vroot)
    # epoch 2 lands WITHOUT view maintenance (crash between commits)
    apply.apply_epoch(lake_dir, files[1::3])
    # epoch 3 with views: the lagging view must catch up (full rebuild
    # from the pinned post-apply snapshot)
    apply_epoch_with_views(lake_dir, files[2::3], SPEC_V, vroot)
    got = _view_table(vroot, "by_source")
    assert got.equals(_expected(p))

    # idempotent re-run of an already-applied epoch: view unchanged
    before = got
    apply_epoch_with_views(lake_dir, files[1::3], SPEC_V, vroot)
    assert _view_table(vroot, "by_source").equals(before)


def test_ivm_group_disappears_on_delete(tmp_path):
    # one key, insert then tombstone in a later epoch: the group must
    # appear after epoch 1 and vanish after epoch 2
    chg = str(tmp_path / "chg")
    import pyarrow.parquet as pq

    def _shard(path, rows):
        pq.write_table(pa.table({
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows]),
            "doc_id": pa.array([r[2] for r in rows]),
            "tokens": pa.array([[1, 2]] * len(rows), pa.list_(pa.int32())),
            "n_tok": pa.array([r[3] for r in rows], pa.int64()),
            "source": pa.array([r[4] for r in rows]),
        }), path)

    import os
    os.makedirs(chg)
    f1, f2 = os.path.join(chg, "a.parquet"), os.path.join(chg, "b.parquet")
    _shard(f1, [(1, "upsert", "d1", 10, "web"), (2, "upsert", "d2", 5, "api")])
    _shard(f2, [(3, "delete", "d1", 0, "web")])

    lake_dir, vroot = str(tmp_path / "lake"), str(tmp_path / "views")
    apply_epoch_with_views(lake_dir, [f1], SPEC_V, vroot)
    t1 = _view_table(vroot, "by_source")
    assert t1.column("source").to_pylist() == ["api", "web"]
    apply_epoch_with_views(lake_dir, [f2], SPEC_V, vroot)
    t2 = _view_table(vroot, "by_source")
    assert t2.column("source").to_pylist() == ["api"]
    assert t2.column("n").to_pylist() == [1]


def test_scan_pids_pruning(tmp_path):
    p = cl.ChangelogParams(n_docs=100, n_events=800, n_shards=4)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, files)
    full = lake.snapshot(lake_dir)
    from vlm_eden_dataset_etl_ray.functions.hashing import partition_ids
    pids = sorted(set(partition_ids(
        full.column("doc_id").combine_chunks(), 32).tolist()))
    some = pids[: len(pids) // 2]
    part = lake.scan(lake_dir, pids=some)
    rows = sum(b.num_rows for b in part.iter_batches(batch_format="pyarrow"))
    exp = int(sum(1 for v in partition_ids(
        full.column("doc_id").combine_chunks(), 32) if int(v) in set(some)))
    assert rows == exp
    assert 0 < rows < full.num_rows


def test_lake_lookup_point_reads(tmp_path):
    p = cl.ChangelogParams(n_docs=120, n_events=900, n_shards=4)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, files)
    full = lake.snapshot(lake_dir)
    want = full.column("doc_id").to_pylist()[:5] + ["no-such-doc"]
    got = lake.lookup(lake_dir, want, columns=["doc_id", "lsn", "n_tok"])
    assert got.num_rows == 5
    assert got.column_names == ["doc_id", "lsn", "n_tok"]
    by_id = {r["doc_id"]: r for r in full.to_pylist()}
    for r in got.to_pylist():
        assert r["lsn"] == by_id[r["doc_id"]]["lsn"]
    assert lake.lookup(lake_dir, []).num_rows == 0
    # a tombstoned key is absent from a live lookup
    import pyarrow.parquet as pq
    dead = got.column("doc_id")[0].as_py()
    f = str(tmp_path / "del.parquet")
    pq.write_table(pa.table({
        "lsn": pa.array([10**9], pa.int64()), "op": pa.array(["delete"]),
        "schema_ver": pa.array([1], pa.int32()),
        "doc_id": pa.array([dead]),
        "tokens": pa.array([[0]], pa.list_(pa.int32())),
        "n_tok": pa.array([0], pa.int32()), "source": pa.array(["x"]),
    }), f)
    apply.apply_epoch(lake_dir, [f])
    assert lake.lookup(lake_dir, [dead]).num_rows == 0
