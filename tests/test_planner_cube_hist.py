"""auto_join planner, CUBE/grouping-sets counts, histogram — vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions import relational as rel


def _df(ds) -> pd.DataFrame:
    tbs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(tbs).to_pandas()


def _sorted(df, cols):
    return df[cols].sort_values(cols, na_position="last").reset_index(drop=True)


LT = pa.table({"k": pa.array([1, 2, 2, None, 5], pa.int64()),
               "x": pa.array([10, 20, 21, 30, 50], pa.int64())})
RT = pa.table({"k2": pa.array([2, 2, 3, None], pa.int64()),  # 1:N + null key
               "y": pa.array(["b1", "b2", "c", "n"])})


@pytest.mark.parametrize("how", ["inner", "left"])
def test_auto_join_broadcast_path_matches_duckdb(how):
    out = _df(rel.auto_join(rd.from_arrow(LT), rd.from_arrow(RT),
                            "k", "k2", how=how))
    jk = "join" if how == "inner" else "left join"
    exp = duckdb.sql(
        f"select l.k, l.x, r.k2, r.y from LT l {jk} RT r on l.k = r.k2").df()
    cols = ["k", "x", "k2", "y"]
    pd.testing.assert_frame_equal(_sorted(out, cols), _sorted(exp, cols),
                                  check_dtype=False)


def test_auto_join_falls_back_to_shuffle_over_threshold(monkeypatch):
    calls = []
    real = rel.hash_join

    def spy(*a, **kw):
        calls.append(kw.get("bytes_hint"))
        return real(*a, **kw)

    monkeypatch.setattr(rel, "hash_join", spy)
    # threshold of 1 byte forces the shuffle path
    out = _df(rel.auto_join(rd.from_arrow(LT), rd.from_arrow(RT),
                            "k", "k2", how="inner",
                            broadcast_threshold_bytes=1))
    assert calls and calls[0] and calls[0] > 0
    exp = duckdb.sql(
        "select l.k, l.x, r.k2, r.y from LT l join RT r on l.k = r.k2").df()
    assert len(out) == len(exp)
    # broadcast path must NOT call hash_join
    calls.clear()
    _df(rel.auto_join(rd.from_arrow(LT), rd.from_arrow(RT), "k", "k2"))
    assert not calls
    # a right_bytes_hint above the threshold routes straight to shuffle
    # (no right-side materialization needed for the decision)
    calls.clear()
    _df(rel.auto_join(rd.from_arrow(LT), rd.from_arrow(RT), "k", "k2",
                      right_bytes_hint=1 << 40))
    assert calls and calls[0] == 2 << 40


def test_cube_counts_matches_duckdb():
    rng = np.random.default_rng(3)
    t = pa.table({"a": pa.array(rng.choice(["x", "y", "z"], 4000)),
                  "b": pa.array(rng.integers(0, 5, 4000))})
    out = _df(rel.cube_counts(rd.from_arrow(t), ["a", "b"], "n"))
    exp = duckdb.sql(
        "select a, b, count(*) as n from t group by cube(a, b)").df()
    cols = ["a", "b", "n"]
    pd.testing.assert_frame_equal(_sorted(out, cols), _sorted(exp, cols),
                                  check_dtype=False)


def test_grouping_sets_subset_validation():
    t = pa.table({"a": pa.array(["x"]), "b": pa.array([1])})
    with pytest.raises(ValueError, match="not a subset"):
        rel.grouping_sets_counts(rd.from_arrow(t), ["a"], [["a", "b"]])


def test_histogram_matches_duckdb():
    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.uniform(-5, 105, 3000), [np.nan] * 10])
    t = pa.table({"v": pa.array(vals, pa.float64())})
    out = _df(rel.histogram_counts(rd.from_arrow(t), "v", 0.0, 100.0, 10))
    exp = duckdb.sql("""
        select cast(floor((v - 0.0) / 10.0) as bigint) as bin, count(*) as n
        from t where v >= 0.0 and v < 100.0 group by 1
    """).df()
    cols = ["bin", "n"]
    pd.testing.assert_frame_equal(_sorted(out, cols), _sorted(exp, cols),
                                  check_dtype=False)
