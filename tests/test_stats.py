"""Statistical aggregate operators (functions/stats.py) vs DuckDB oracles."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions import stats as S


def _tbl(n=4000, seed=11):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.choice(["a", "b", "c"], n)),
        "x": pa.array(np.round(rng.uniform(0, 50, n), 2)),
        "y": pa.array(np.round(rng.normal(100, 30, n), 2)),
        "v": pa.array(rng.integers(0, 7, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 1_000_000, n) * 1_000_000,
                       pa.timestamp("us")),
        "uid": pa.array(rng.integers(0, 37, n), pa.int64()),
    })


def _con(t):
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.register("t", t)
    return con


def _collect_sorted(ds, keys):
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
    return t.sort_by([(k, "ascending") for k in keys])


def test_grouped_moments_matches_duckdb():
    t = _tbl()
    out = _collect_sorted(
        S.grouped_moments(rd.from_arrow(t).repartition(8), ["k"], "x", y="y"),
        ["k"])
    ora = _con(t).execute("""
        select k, cast(count(*) as bigint) n, avg(x) mean_x,
               var_samp(x) var_x, stddev_samp(x) std_x,
               covar_samp(x, y) covar_xy, corr(x, y) corr_xy
        from t group by k order by k
    """).arrow()
    assert out.column("k").to_pylist() == ora.column("k").to_pylist()
    assert out.column("n").to_pylist() == ora.column("n").to_pylist()
    for c in ["mean_x", "var_x", "std_x", "covar_xy", "corr_xy"]:
        np.testing.assert_allclose(
            out.column(c).to_numpy(), ora.column(c).to_numpy(),
            rtol=1e-9, err_msg=c)


def test_grouped_moments_high_cardinality_path():
    t = _tbl()
    lo = _collect_sorted(
        S.grouped_moments(rd.from_arrow(t).repartition(8), ["k"], "x"),
        ["k"])
    hi = _collect_sorted(
        S.grouped_moments(rd.from_arrow(t).repartition(8), ["k"], "x",
                          cardinality="high"), ["k"])
    for c in ["n", "mean_x", "var_x", "std_x"]:
        np.testing.assert_allclose(lo.column(c).to_numpy(),
                                   hi.column(c).to_numpy(), rtol=1e-12)


def test_mode_per_key_tiebreak_deterministic():
    # two values tie → the smaller one must win
    t = pa.table({"k": ["g"] * 4, "v": ["zeta", "zeta", "alpha", "alpha"]})
    out = _collect_sorted(
        S.mode_per_key(rd.from_arrow(t).repartition(2), "k", "v",
                       alias="mode_v", count_alias="n"), ["k"])
    assert out.column("mode_v").to_pylist() == ["alpha"]
    assert out.column("n").to_pylist() == [2]


def test_mode_per_key_matches_duckdb_counts():
    t = _tbl()
    out = _collect_sorted(
        S.mode_per_key(rd.from_arrow(t).repartition(8), "uid", "v",
                       alias="mode_v", count_alias="n"), ["uid"])
    ora = _con(t).execute("""
        select uid, v as mode_v, cast(n as bigint) n
        from (select uid, v, count(*) n from t group by uid, v)
        qualify row_number() over (partition by uid order by n desc, v asc) = 1
        order by uid
    """).arrow()
    assert out.column("uid").to_pylist() == ora.column("uid").to_pylist()
    assert out.column("mode_v").to_pylist() == ora.column("mode_v").to_pylist()
    assert out.column("n").to_pylist() == ora.column("n").to_pylist()


def test_grouped_entropy_matches_duckdb():
    t = _tbl()
    out = _collect_sorted(
        S.grouped_entropy(rd.from_arrow(t).repartition(8), ["k"], "v",
                          alias="h"), ["k"])
    ora = _con(t).execute(
        "select k, entropy(v) h from t group by k order by k").arrow()
    np.testing.assert_allclose(out.column("h").to_numpy(),
                               ora.column("h").to_numpy(), rtol=1e-9)


def test_share_of_total():
    t = pa.table({"g": ["a", "b", "c"], "v": [1.0, 3.0, 4.0]})
    out = _collect_sorted(
        S.with_share_of_total(rd.from_arrow(t).repartition(3), "v",
                              alias="s"), ["g"])
    np.testing.assert_allclose(out.column("s").to_numpy(),
                               [0.125, 0.375, 0.5])


def test_moving_avg_range_matches_duckdb_incl_peers():
    t = _tbl(n=2500, seed=3)
    out = _collect_sorted(
        S.moving_avg_range(rd.from_arrow(t).repartition(8), "uid", "ts", "x",
                           window=100_000 * 1_000_000, alias="mavg",
                           count_alias="mcnt"),
        ["uid", "ts"])
    ora = _con(t).execute("""
        select uid, ts,
               avg(x) over w as mavg, cast(count(*) over w as bigint) as mcnt
        from t
        window w as (partition by uid order by ts
                     range between interval 100000 seconds preceding
                           and current row)
        order by uid, ts
    """).arrow()
    np.testing.assert_allclose(out.column("mavg").to_numpy(),
                               ora.column("mavg").to_numpy(), rtol=1e-9)
    assert out.column("mcnt").to_pylist() == ora.column("mcnt").to_pylist()


def test_moving_sum_integer_exact():
    t = pa.table({
        "k": ["u"] * 5,
        "o": pa.array([0, 10, 10, 25, 40], pa.int64()),
        "c": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = _collect_sorted(
        S.moving_avg_range(rd.from_arrow(t), "k", "o", "c", window=15,
                           alias=None, sum_alias="ws", count_alias="wc"),
        ["o", "c"])
    # at o=10 peers (2,3) are both in frame for both rows; at o=25 frame is
    # [10,25] → 2+3+4; at o=40 frame is [25,40] → 4+5
    assert out.column("ws").to_pylist() == [1, 6, 6, 9, 9]
    assert out.column("wc").to_pylist() == [1, 3, 3, 3, 2]
    assert out.schema.field("ws").type == pa.int64()


def test_profile_columns():
    t = pa.table({
        "a": pa.array([3, 1, None, 7, 1], pa.int64()),
        "b": pa.array(["x", None, None, "m", "x"]),
    })
    out = S.profile_columns(rd.from_arrow(t).repartition(3), ["a", "b"])
    rows = {r["column"]: r for r in out.to_pylist()}
    assert rows["a"] == {"column": "a", "n_nulls": 1, "n_distinct": 3,
                         "min_str": "1", "max_str": "7"}
    assert rows["b"] == {"column": "b", "n_nulls": 2, "n_distinct": 2,
                         "min_str": "m", "max_str": "x"}


def test_grouped_trend_slope_and_degenerate_group():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vlm_eden_dataset_etl_ray.functions.stats import grouped_trend

    t = pa.table({
        "k": pa.array(["a"] * 4 + ["b"]),
        "seq": pa.array([1, 2, 3, 4, 1], pa.int64()),
        "v": pa.array([2.0, 4.0, 6.0, 8.0, 5.0]),
    })
    out = pa.concat_tables(grouped_trend(
        rd.from_arrow(t).repartition(3), "k", ["seq"], "v")
        .iter_batches(batch_format="pyarrow", batch_size=None)).sort_by("k")
    rows = {k: (n, s, i) for k, n, s, i in zip(
        out.column("k").to_pylist(), out.column("n").to_pylist(),
        out.column("slope").to_pylist(), out.column("intercept").to_pylist())}
    assert rows["a"] == (4, 2.0, 0.0)      # perfect line y = 2x
    assert rows["b"] == (1, None, None)    # single point: undefined, not inf


def test_approx_quantiles_high_cardinality_matches_low():
    import numpy as np

    import ray.data as rd
    from vlm_eden_dataset_etl_ray.functions.sketches import approx_quantiles

    rng = np.random.default_rng(5)
    t = pa.table({
        "g": pa.array((rng.integers(0, 40, 20000)).astype("U4")),
        "v": pa.array(rng.lognormal(0, 1, 20000)),
    })
    ds = rd.from_arrow(t).repartition(8)
    low = approx_quantiles(ds, "v", (0.5, 0.9), group_by="g")
    high_ds = approx_quantiles(ds, "v", (0.5, 0.9), group_by="g",
                               cardinality="high")
    high = pa.concat_tables(high_ds.iter_batches(batch_format="pyarrow",
                                                 batch_size=None))
    lo = {r["g"]: (r["q50"], r["q90"]) for r in low.to_pylist()}
    hi = {r["g"]: (r["q50"], r["q90"]) for r in high.to_pylist()}
    assert set(lo) == set(hi) and len(lo) == 40
    for g in lo:
        # same sketches, same merge math — groups merge independently so
        # results agree closely (merge order may differ per group)
        for a, b in zip(lo[g], hi[g]):
            assert abs(a - b) / max(abs(a), 1e-9) < 0.05, (g, lo[g], hi[g])
