"""Global-ordering + frame-bounded window operators vs DuckDB oracles."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions import windows as W


def _orders(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "cust": pa.array(rng.integers(0, 97, n)),
        "price": pa.array(np.round(rng.uniform(1, 1000, n), 2)),
        "d": pa.array(rng.integers(0, 10_000, n) * 86_400_000_000,
                      pa.timestamp("us")),
        "status": pa.array(rng.choice(["O", "F", "P"], n)),
    })


def _con(t):
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.register("t", t)
    return con


def _sorted_tbl(ds, keys):
    tbs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(tbs).sort_by([(k, "ascending") for k in keys])


def test_global_row_number_matches_duckdb():
    t = _orders()
    ds = rd.from_arrow(t).repartition(16)  # force many blocks
    out = _sorted_tbl(W.global_row_number(ds, ["price", "k"]), ["k"])
    exp = _con(t).execute(
        "select *, row_number() over (order by price, k) as row_number "
        "from t order by k").fetch_arrow_table()
    assert out.column("row_number").type == pa.int64()
    assert out.select(["k", "row_number"]).to_pylist() == \
        exp.select(["k", "row_number"]).to_pylist()


def test_global_row_number_descending():
    t = _orders(300)
    ds = rd.from_arrow(t).repartition(7)
    out = _sorted_tbl(
        W.global_row_number(ds, ["price", "k"], descending=[True, False]),
        ["k"])
    exp = _con(t).execute(
        "select k, row_number() over (order by price desc, k asc) as rn "
        "from t order by k").fetch_arrow_table()
    assert out.column("row_number").to_pylist() == exp.column("rn").to_pylist()


def test_ntile_matches_duckdb():
    t = _orders(1003)  # deliberately not divisible by 5
    ds = rd.from_arrow(t).repartition(9)
    out = _sorted_tbl(W.ntile(ds, 5, ["price", "k"]), ["k"])
    exp = _con(t).execute(
        "select k, ntile(5) over (order by price, k) as tile "
        "from t order by k").fetch_arrow_table()
    assert out.column("tile").to_pylist() == exp.column("tile").to_pylist()


def test_exact_quantiles_match_duckdb():
    t = _orders(2777)
    ds = rd.from_arrow(t).repartition(8)
    got = W.exact_quantiles(ds, "price", [0.01, 0.25, 0.5, 0.75, 0.99], "k")
    con = _con(t)
    for q, v in zip(got.column("q").to_pylist(), got.column("value").to_pylist()):
        exp = con.execute(f"select quantile_disc(price, {q}) from t").fetchone()[0]
        assert v == exp, (q, v, exp)


def test_duplicate_first_key_rejected():
    """Two blocks starting with the same key tuple = non-unique order_by;
    the prefix-sum builder must refuse rather than misnumber."""
    with pytest.raises(ValueError, match="uniquely"):
        W._prefix_offsets([((1, "a"), 10), ((1, "a"), 5)], [False, False])
    offs, total = W._prefix_offsets(
        [((2,), 5), ((1,), 10)], [False])
    assert offs == {(1,): 0, (2,): 10} and total == 15
    # descending: offsets follow the inverted order
    offs, total = W._prefix_offsets([((1,), 10), ((2,), 5)], [True])
    assert offs == {(2,): 0, (1,): 5} and total == 15


def test_scd2_compress_matches_duckdb():
    t = _orders(4000)
    ds = rd.from_arrow(t)
    got = _sorted_tbl(
        W.scd2_compress(ds, "cust", ["d", "k"], "status"),
        ["cust", "valid_from", "status"])
    exp = _con(t).execute("""
        with e as (select cust, k, d, status,
                          lag(status) over (partition by cust order by d, k) pv
                   from t),
        m as (select *, case when pv is null or pv <> status then 1 else 0 end chg
              from e),
        v as (select *, cast(sum(chg) over (partition by cust order by d, k
                   rows unbounded preceding) as bigint) ver from m),
        runs as (select cust, ver, min(status) as status, min(d) as valid_from
                 from v group by cust, ver)
        select cust, status, valid_from,
               lead(valid_from) over (partition by cust order by ver) as valid_to
        from runs order by cust, valid_from, status
    """).fetch_arrow_table()
    assert got.num_rows == exp.num_rows
    for c in ["cust", "status", "valid_from", "valid_to"]:
        assert got.column(c).to_pylist() == exp.column(c).to_pylist(), c


def test_scd2_single_run_and_current_null():
    t = pa.table({
        "cust": pa.array([1, 1, 1], pa.int64()),
        "k": pa.array([1, 2, 3], pa.int64()),
        "d": pa.array([10, 20, 30], pa.timestamp("us")),
        "status": pa.array(["A", "A", "A"]),
    })
    got = W.scd2_compress(rd.from_arrow(t), "cust", ["d", "k"], "status") \
        .take_all()
    assert len(got) == 1
    assert got[0]["valid_to"] is None


def test_rolling_min_matches_duckdb():
    t = _orders(3000)
    ds = rd.from_arrow(t)
    got = _sorted_tbl(
        W.rolling_min(ds, "cust", ["d", "k"], "price", 3, alias="rmin"), ["k"])
    exp = _con(t).execute("""
        select k, min(price) over (partition by cust order by d, k
            rows between 2 preceding and current row) as rmin
        from t order by k
    """).fetch_arrow_table()
    assert got.column("rmin").to_pylist() == exp.column("rmin").to_pylist()


def test_session_ids_matches_duckdb_and_counts():
    from vlm_eden_dataset_etl_ray.functions.relational import (
        session_counts, session_ids)

    rng = np.random.default_rng(13)
    n = 3000
    t = pa.table({
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        "u": pa.array(rng.integers(0, 40, n)),
        "ts": pa.array(np.sort(rng.integers(0, 10**7, n)) * 1_000_000,
                       pa.timestamp("us")),
    })
    gap = 3600.0
    got = _sorted_tbl(session_ids(rd.from_arrow(t), "u", "ts", gap,
                                  order_cols=["ts", "eid"]), ["eid"])
    exp = _con(t).execute(f"""
        select eid, cast(sum(case when gap_us is null or gap_us > {int(gap*1e6)}
                        then 1 else 0 end) over (
            partition by u order by ts, eid rows unbounded preceding)
            as bigint) as session_id
        from (select eid, u, ts,
                     epoch_us(ts) - epoch_us(lag(ts) over (
                         partition by u order by ts, eid)) as gap_us from t)
        order by eid
    """).fetch_arrow_table()
    assert got.column("session_id").to_pylist() == \
        exp.column("session_id").to_pylist()
    # per-key max session_id == session_counts' n_sessions
    counts = {r["u"]: r["n_sessions"] for r in
              session_counts(rd.from_arrow(t), "u", "ts", gap).take_all()}
    import collections
    mx = collections.defaultdict(int)
    for row in got.select(["u", "session_id"]).to_pylist():
        mx[row["u"]] = max(mx[row["u"]], row["session_id"])
    assert dict(mx) == counts


def test_out_of_order_stats_counts_and_skew():
    import pyarrow as pa
    import ray.data as rd

    from vlm_eden_dataset_etl_ray.functions.windows import out_of_order_stats

    ts = pa.array([100, 50, 100, 200, 10, 20, 30], pa.timestamp("s"))
    t = pa.table({
        "k": pa.array(["a"] * 5 + ["b"] * 2),
        "seq": pa.array([1, 2, 3, 4, 5, 1, 2], pa.int64()),
        "ts": ts,
    })
    out = pa.concat_tables(
        out_of_order_stats(rd.from_arrow(t).repartition(3), "k", "seq", "ts")
        .iter_batches(batch_format="pyarrow", batch_size=None)).sort_by("k")
    rows = {k: (n, nl, s) for k, n, nl, s in zip(
        out.column("k").to_pylist(), out.column("n").to_pylist(),
        out.column("n_late").to_pylist(), out.column("max_skew_s").to_pylist())}
    # a: 50 is 50s behind wm=100; 100 EQUALS wm (not late); 10 is 190s behind
    assert rows["a"] == (5, 2, 190.0)
    # b: monotone -> nothing late
    assert rows["b"] == (2, 0, 0.0)


def test_ewm_mean_matches_pandas():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from vlm_eden_dataset_etl_ray.functions.windows import ewm_mean

    rng = np.random.default_rng(3)
    n = 1000  # spans several closed-form segments
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b"], n)),
        "seq": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(np.round(rng.uniform(-100, 100, n), 3)),
    })
    df = t.to_pandas()  # already in seq order
    for alpha in (0.03, 0.3, 0.97, 1.0):
        out = pa.concat_tables(
            ewm_mean(rd.from_arrow(t).repartition(4), "k", ["seq"], "v",
                     alpha).iter_batches(batch_format="pyarrow",
                                         batch_size=None)).sort_by("seq")
        got = out.column("ema").to_numpy(zero_copy_only=False)
        exp = df.groupby("k")["v"].transform(
            lambda s: s.ewm(alpha=alpha, adjust=False).mean()).to_numpy()
        assert np.allclose(got, exp, atol=5e-6), alpha

    with pytest.raises(ValueError):
        ewm_mean(rd.from_arrow(t), "k", ["seq"], "v", 0.0)


def test_grouped_first_last_nth_cross_batch():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vlm_eden_dataset_etl_ray.functions.windows import grouped_first_last

    rng = np.random.default_rng(9)
    n = 500
    t = pa.table({
        "k": pa.array((rng.integers(0, 17, n)).astype("int64")),
        "o": pa.array(rng.permutation(n).astype("int64")),
        "v": pa.array(rng.normal(size=n)),
        "s": pa.array([f"s{i%7}" for i in range(n)]),
    })
    out = pa.concat_tables(grouped_first_last(
        rd.from_arrow(t).repartition(8), "k", ["o"], ["v", "s"], nth=3,
    ).iter_batches(batch_format="pyarrow", batch_size=None)).sort_by("k")

    import pandas as pd
    df = t.to_pandas().sort_values(["k", "o"])
    ref = df.groupby("k").agg(
        first_v=("v", "first"), last_v=("v", "last"),
        first_s=("s", "first"), last_s=("s", "last"),
        nth_v=("v", lambda s: s.iloc[2] if len(s) >= 3 else None),
        nth_s=("s", lambda s: s.iloc[2] if len(s) >= 3 else None),
    ).reset_index()
    got = out.to_pandas()
    for c in ["first_v", "last_v", "nth_v"]:
        assert np.allclose(got[c].to_numpy(dtype=float),
                           ref[c].to_numpy(dtype=float), equal_nan=True)
    for c in ["first_s", "last_s", "nth_s"]:
        assert got[c].where(got[c].notna(), None).tolist() == \
            ref[c].where(ref[c].notna(), None).tolist()


def test_grouped_first_last_single_row_groups_and_nth_overflow():
    import pyarrow as pa
    import ray.data as rd

    from vlm_eden_dataset_etl_ray.functions.windows import grouped_first_last

    t = pa.table({"k": ["a", "b"], "o": [1, 2], "v": [10, 20]})
    out = pa.concat_tables(grouped_first_last(
        rd.from_arrow(t), "k", ["o"], ["v"], nth=5,
    ).iter_batches(batch_format="pyarrow", batch_size=None)).sort_by("k")
    assert out.column("first_v").to_pylist() == [10, 20]
    assert out.column("last_v").to_pylist() == [10, 20]
    assert out.column("nth_v").to_pylist() == [None, None]


def test_quantile_bucket_matches_ntile_on_distinct_values():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vlm_eden_dataset_etl_ray.functions.windows import quantile_bucket

    rng = np.random.default_rng(4)
    v = rng.permutation(1000).astype("int64")  # distinct values
    t = pa.table({"id": pa.array(np.arange(1000, dtype=np.int64)),
                  "v": pa.array(v)})
    out = pa.concat_tables(quantile_bucket(
        rd.from_arrow(t).repartition(5), "v", 4, tiebreak="id",
    ).iter_batches(batch_format="pyarrow", batch_size=None)).sort_by("id")
    b = np.asarray(out.column("bucket").to_pylist())
    # distinct values → exact ntile sizes, and bucket order tracks value
    assert sorted(np.bincount(b)[1:].tolist()) == [250, 250, 250, 250]
    order = np.argsort(v)
    assert (np.diff(b[order]) >= 0).all()

    # ties share a bucket (label is a function of the value)
    t2 = pa.table({"id": pa.array(np.arange(8, dtype=np.int64)),
                   "v": pa.array([1, 1, 1, 1, 1, 1, 9, 9])})
    out2 = pa.concat_tables(quantile_bucket(
        rd.from_arrow(t2), "v", 2, tiebreak="id",
    ).iter_batches(batch_format="pyarrow", batch_size=None)).sort_by("id")
    assert out2.column("bucket").to_pylist() == [1, 1, 1, 1, 1, 1, 2, 2]


# ---------------------------------------------------------------------------
# keyed_rank_ids: partitioned row_number / rank / dense_rank vs DuckDB
# ---------------------------------------------------------------------------


def _keyed_out(ds, keys, order_by, kind, **kw):
    out = W.keyed_rank_ids(ds, keys, order_by, kind=kind, out_col="r", **kw)
    return _sorted_tbl(out, ["k"])


@pytest.mark.parametrize("kind", ["row_number", "rank", "dense_rank"])
def test_keyed_rank_matches_duckdb(kind):
    t = _orders(4000)
    ds = rd.from_arrow(t).repartition(13)
    out = _keyed_out(ds, ["cust"], ["price", "k"], kind)
    exp = _con(t).execute(
        f"select k, {kind}() over (partition by cust order by price, k) r "
        "from t order by k").fetch_arrow_table()
    assert out.column("r").to_pylist() == exp.column("r").to_pylist()


@pytest.mark.parametrize("kind", ["rank", "dense_rank"])
def test_keyed_rank_heavy_ties_across_blocks(kind):
    # few keys, few distinct order values → ties straddle every block edge
    rng = np.random.default_rng(11)
    n = 3000
    t = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "g": pa.array(rng.integers(0, 3, n)),
        "v": pa.array(rng.integers(0, 4, n)),
    })
    ds = rd.from_arrow(t).repartition(17)
    out = W.keyed_rank_ids(ds, ["g"], ["v"], kind=kind, out_col="r")
    got = _sorted_tbl(out, ["k"])
    exp = _con(t).execute(
        f"select k, {kind}() over (partition by g order by v) r "
        "from t order by k").fetch_arrow_table()
    assert got.column("r").to_pylist() == exp.column("r").to_pylist()


def test_keyed_rank_descending_and_string_keys():
    t = _orders(1500)
    ds = rd.from_arrow(t).repartition(9)
    out = W.keyed_rank_ids(ds, ["status"], ["price", "k"],
                           kind="row_number", out_col="r",
                           descending=[True, False])
    got = _sorted_tbl(out, ["k"])
    exp = _con(t).execute(
        "select k, row_number() over "
        "(partition by status order by price desc, k asc) r "
        "from t order by k").fetch_arrow_table()
    assert got.column("r").to_pylist() == exp.column("r").to_pylist()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_keyed_rank_fuzz_block_splits(seed):
    # random key cardinality / tie density / block count; all three kinds
    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 1200))
    nk = int(rng.integers(1, 8))
    nv = int(rng.integers(1, 6))
    t = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "g": pa.array(rng.integers(0, nk, n)),
        "v": pa.array(rng.integers(0, nv, n)),
    })
    blocks = int(rng.integers(1, 20))
    ds = rd.from_arrow(t).repartition(blocks)
    con = _con(t)
    for kind in ("row_number", "rank", "dense_rank"):
        # row_number tie order is arbitrary → add unique tiebreak for it
        ob = ["v", "k"] if kind == "row_number" else ["v"]
        got = _sorted_tbl(
            W.keyed_rank_ids(ds, ["g"], ob, kind=kind, out_col="r"), ["k"])
        exp = con.execute(
            f"select k, {kind}() over (partition by g order by "
            f"{', '.join(ob)}) r from t order by k").fetch_arrow_table()
        assert got.column("r").to_pylist() == exp.column("r").to_pylist(), \
            (kind, seed, n, nk, nv, blocks)


# ---------------------------------------------------------------------------
# running_agg / with_next / keyed_first_value vs DuckDB (ROWS-frame family)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("agg", ["sum", "min", "max", "count", "avg"])
def test_running_agg_matches_duckdb(agg):
    from vlm_eden_dataset_etl_ray.functions.relational import running_agg

    t = _orders(2000)
    ds = rd.from_arrow(t).repartition(8)
    out = _sorted_tbl(
        running_agg(ds, "cust", ["d", "k"], "price", agg=agg, alias="r"),
        ["k"])
    exp = _con(t).execute(
        f"select k, {agg}(price) over (partition by cust "
        "order by d, k rows unbounded preceding) r "
        "from t order by k").fetch_arrow_table()
    got = out.column("r").to_pylist()
    want = exp.column("r").to_pylist()
    if agg in ("sum", "avg"):
        assert got == pytest.approx(want, rel=1e-9)
    else:
        assert got == want


def test_running_agg_null_semantics():
    from vlm_eden_dataset_etl_ray.functions.relational import running_agg

    t = pa.table({
        "k": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "g": pa.array(["a"] * 6),
        "v": pa.array([None, 3, None, 1, None, 7], pa.int64()),
    })
    con = _con(t)
    for agg in ("sum", "min", "max", "count", "avg"):
        out = _sorted_tbl(running_agg(
            rd.from_arrow(t).repartition(3), "g", ["k"], "v",
            agg=agg, alias="r"), ["k"])
        exp = con.execute(
            f"select k, {agg}(v) over (partition by g order by k "
            "rows unbounded preceding) r from t order by k"
        ).fetch_arrow_table()
        assert out.column("r").to_pylist() == \
            pytest.approx(exp.column("r").to_pylist()), agg


def test_with_next_and_first_value_match_duckdb():
    from vlm_eden_dataset_etl_ray.functions.relational import (
        keyed_first_value, with_next)

    t = _orders(1200)
    ds = rd.from_arrow(t).repartition(6)
    out = _sorted_tbl(with_next(ds, "cust", ["d", "k"], ["price"]), ["k"])
    exp = _con(t).execute(
        "select k, lead(price) over (partition by cust order by d, k) nx "
        "from t order by k").fetch_arrow_table()
    assert out.column("next_price").to_pylist() == exp.column("nx").to_pylist()

    out2 = _sorted_tbl(
        keyed_first_value(ds, "cust", ["d", "k"], "price", alias="fv"),
        ["k"])
    exp2 = _con(t).execute(
        "select k, first_value(price) over (partition by cust "
        "order by d, k) fv from t order by k").fetch_arrow_table()
    assert out2.column("fv").to_pylist() == exp2.column("fv").to_pylist()


def test_running_agg_stable_schema_across_groups():
    # output type must not depend on which groups contain nulls: int input
    # → int64 sum in EVERY group (one nullable group used to flip to float)
    from vlm_eden_dataset_etl_ray.functions.relational import running_agg

    t = pa.table({"g": ["a", "a", "b"], "o": [1, 2, 1],
                  "v": pa.array([5, None, 2], pa.int64())})
    out = pa.concat_tables(running_agg(
        rd.from_arrow(t), "g", ["o"], "v", agg="sum", alias="r"
    ).iter_batches(batch_format="pyarrow", batch_size=None))
    assert out.schema.field("r").type == pa.int64()
    got = dict(zip(zip(out.column("g").to_pylist(),
                       out.column("o").to_pylist()),
                   out.column("r").to_pylist()))
    assert got == {("a", 1): 5, ("a", 2): 5, ("b", 1): 2}

    out2 = pa.concat_tables(running_agg(
        rd.from_arrow(t), "g", ["o"], "v", agg="min", alias="r"
    ).iter_batches(batch_format="pyarrow", batch_size=None))
    assert out2.schema.field("r").type == pa.int64()
