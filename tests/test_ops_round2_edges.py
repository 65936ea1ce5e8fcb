"""Edge cases for the round-2 operators: one-sided as-of buckets, absent
pivot categories, empty-input sketches, sampling rate bounds."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.relational import (
    asof_join_bucketed, pivot_count, rollup_counts, with_previous)
from vlm_eden_dataset_etl_ray.functions.sampling import hash_sample
from vlm_eden_dataset_etl_ray.functions.sketches import (
    CentroidSketch, approx_heavy_hitters)


def _to_pandas(ds):
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(batches).to_pandas() if batches else pd.DataFrame()


def test_asof_bucketed_one_sided_buckets():
    # left keys 0..9; right covers only evens → odd-key buckets may hold
    # ONLY left rows (the null-int→float64 merge_asof dtype trap)
    left = pd.DataFrame({
        "k": np.arange(10).repeat(3),
        "t": pd.to_datetime("2024-01-01") + pd.to_timedelta(np.tile([1, 5, 9], 10), "D"),
        "x": np.arange(30),
    })
    right = pd.DataFrame({
        "k2": np.arange(0, 10, 2),
        "t2": pd.to_datetime("2024-01-03"),
        "payload": np.arange(0, 10, 2) * 100,
    })
    out = _to_pandas(asof_join_bucketed(
        rd.from_pandas(left), rd.from_pandas(right),
        "k", "k2", "t", "t2", ["payload", "t2"], num_buckets=8))
    assert len(out) == 30
    exp = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t2"),
        left_on="t", right_on="t2", left_by="k", right_by="k2")
    exp_matched = exp["payload"].notna().sum()
    assert out["payload"].notna().sum() == exp_matched
    # odd keys never match; even keys match only from t >= t2
    odd = out[out.k % 2 == 1]
    assert odd["payload"].isna().all()


def test_pivot_count_absent_category_is_zero():
    df = pd.DataFrame({"g": ["a", "a", "b"], "c": ["x", "y", "x"]})
    out = _to_pandas(pivot_count(rd.from_pandas(df), "g", "c",
                                 ["x", "y", "never-seen"]))
    out = out.sort_values("g").reset_index(drop=True)
    assert out["n_x"].tolist() == [1, 1]
    assert out["n_y"].tolist() == [1, 0]
    assert out["n_never_seen"].tolist() == [0, 0]


def test_centroid_sketch_empty_and_single():
    assert np.isnan(CentroidSketch.from_values(np.empty(0)).quantile(0.5))
    sk = CentroidSketch.from_values(np.array([42.0]))
    assert sk.quantile(0.0) == sk.quantile(1.0) == 42.0


def test_heavy_hitters_fewer_keys_than_k():
    ds = rd.from_items([{"v": "only"}, {"v": "two"}, {"v": "two"}])
    out = approx_heavy_hitters(ds, "v", k=10)
    assert out.num_rows == 2
    assert out.column("v").to_pylist() == ["two", "only"]
    assert out.column("approx_count").to_pylist() == [2, 1]


def test_with_previous_multiple_columns():
    df = pd.DataFrame({"k": [1, 1, 1, 2], "o": [3, 1, 2, 5],
                       "v": ["c", "a", "b", "z"]})
    out = _to_pandas(with_previous(rd.from_pandas(df), "k", ["o"], ["o", "v"]))
    out = out.sort_values(["k", "o"]).reset_index(drop=True)
    assert out["prev_v"].tolist() == [None, "a", "b", None]
    assert out["prev_o"].fillna(-1).tolist() == [-1, 1, 2, -1]


def test_rollup_single_key():
    df = pd.DataFrame({"g": ["a", "a", "b"]})
    out = _to_pandas(rollup_counts(rd.from_pandas(df), ["g"]))
    got = {(r.g if pd.notna(r.g) else None): r.n for r in out.itertuples()}
    assert got == {"a": 2, "b": 1, None: 3}


def test_multimodal_resize_and_frame_sample_edges():
    from vlm_eden_dataset_etl_ray.functions.multimodal import ResizeStub, frame_sample

    ds = rd.from_items([
        {"doc": 1, "payload": b"x" * 300},
        {"doc": 2, "payload": b""},          # empty payload → zero frames
        {"doc": 3, "payload": b"y" * 1000},  # capped at max_frames
    ])
    out = _to_pandas(frame_sample(ds, stride_bytes=64, max_frames=4))
    per_doc = out.groupby("doc").size().to_dict()
    assert per_doc == {1: 4, 3: 4}  # 300//64+1=5→cap 4; empty absent
    assert out[out.doc == 1]["frame_offset"].tolist() == [0, 64, 128, 192]

    resized = _to_pandas(ds.map_batches(
        ResizeStub, fn_constructor_args=("payload", 224, 224),
        batch_format="pyarrow", concurrency=1))
    r1 = resized[resized.doc == 1].iloc[0]
    assert (r1.out_w, r1.out_h) == (224, 224)  # 300%640=300→clamp 224
    r2 = resized[resized.doc == 2].iloc[0]
    assert (r2.out_w, r2.out_h, r2.resized_bytes) == (0, 0, 0)


def test_hash_sample_rate_bounds():
    ds = rd.range(1000).map_batches(
        lambda t: t.rename_columns(["k"]), batch_format="pyarrow")
    assert hash_sample(ds, "k", 1.0).count() == 1000
    assert hash_sample(ds, "k", 0.0).count() == 0


def test_pca_fit_project_variance_ordering():
    from vlm_eden_dataset_etl_ray.functions.knn import pca_fit, pca_project

    ds = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    mean, comp = pca_fit(ds, n_components=4, sample_frac=1.0)
    assert comp.shape[0] == 4
    # orthonormal basis
    assert np.allclose(comp @ comp.T, np.eye(4), atol=1e-8)
    out = _to_pandas(pca_project(ds, mean, comp))
    proj = np.vstack(out["pca"].to_numpy())
    var = proj.var(axis=0)
    assert (np.diff(var) <= 1e-9).all()  # descending variance per component
    # deterministic: same fit twice
    mean2, comp2 = pca_fit(ds, n_components=4, sample_frac=1.0)
    assert np.allclose(comp, comp2)


def test_hash_join_null_keys_match_sql_semantics():
    """SQL inner joins never match NULL = NULL; polars' default join
    semantics inside the bucketed join must agree."""
    import duckdb
    from vlm_eden_dataset_etl_ray.functions.relational import hash_join

    lt = pa.table({"k": pa.array([1, 2, None, None], pa.int64()),
                   "x": pa.array([10, 20, 30, 40], pa.int64())})
    rt = pa.table({"k2": pa.array([1, None], pa.int64()),
                   "y": pa.array(["a", "b"])})
    out = _to_pandas(hash_join(rd.from_arrow(lt), rd.from_arrow(rt),
                               "k", "k2", how="inner", num_buckets=4))
    exp = duckdb.sql(
        "select l.k, l.x, r.k2, r.y from lt l join rt r on l.k = r.k2"
    ).df()
    assert len(out) == len(exp) == 1
    assert out.iloc[0]["x"] == 10 and out.iloc[0]["y"] == "a"
    # left join keeps null-key left rows with null right side
    out_l = _to_pandas(hash_join(rd.from_arrow(lt), rd.from_arrow(rt),
                                 "k", "k2", how="left", num_buckets=4))
    assert len(out_l) == 4 and out_l["y"].notna().sum() == 1


def test_skew_join_hot_key_absent_from_right():
    """A hot left key with NO right rows must not crash the broadcast
    side-path (left join pads nulls, inner join drops)."""
    from vlm_eden_dataset_etl_ray.functions.relational import skew_hash_join

    left = pd.DataFrame({"k": [999] * 50 + [1, 2], "x": range(52)})
    right = pd.DataFrame({"k2": [1, 2], "y": ["a", "b"]})
    inner = _to_pandas(skew_hash_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "k2",
        how="inner", hot_keys=[999], num_buckets=4))
    assert sorted(inner["k"].tolist()) == [1, 2]
    left_j = _to_pandas(skew_hash_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "k2",
        how="left", hot_keys=[999], num_buckets=4))
    assert len(left_j) == 52 and left_j["y"].notna().sum() == 2


def test_sketches_null_group_keys():
    from vlm_eden_dataset_etl_ray.functions.sketches import (
        approx_distinct, approx_heavy_hitters, approx_quantiles)

    ds = rd.from_items(
        [{"g": None, "v": float(i)} for i in range(50)]
        + [{"g": "a", "v": float(i)} for i in range(100)])
    q = approx_quantiles(ds, "v", qs=(0.5,), group_by="g")
    got = dict(zip(q.column("g").to_pylist(), q.column("q50").to_pylist()))
    assert set(got) == {None, "a"}
    assert abs(got[None] - 24.5) < 2 and abs(got["a"] - 49.5) < 3
    d = approx_distinct(ds, "v", group_by="g")
    gd = dict(zip(d.column("g").to_pylist(),
                  d.column("approx_distinct").to_pylist()))
    assert set(gd) == {None, "a"} and gd["a"] >= 95
    hh = approx_heavy_hitters(
        rd.from_items([{"v": None}] * 5 + [{"v": "x"}] * 3), "v", k=2)
    got_hh = dict(zip(hh.column("v").to_pylist(),
                      hh.column("approx_count").to_pylist()))
    assert got_hh == {None: 5, "x": 3}


def test_null_hashes_distinct_from_empty():
    from vlm_eden_dataset_etl_ray.functions.dedup import exact_dedup

    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["", None, ""], pa.string())})
    out = _to_pandas(exact_dedup(rd.from_arrow(t), on=["text"], keep_by="id"))
    # "" dedups to one row; null survives separately (not merged with "")
    assert sorted(out["id"].tolist()) == [1, 2]
