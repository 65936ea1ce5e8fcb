"""Run-boundary-fold grouped operators (functions/runfold.py consumers)
stressed across MANY small sorted blocks — the regime where keys span
block boundaries and every edge-merge path fires — plus the 10⁶-distinct-
key bound that per-group ``map_groups`` UDFs cannot meet.

Reference parity: the reference's grouped rollups are SQL GROUP BY pushed
to Postgres (/root/reference/queries/dim_technicians.py:3-12); these
operators are the engine-side equivalents that must survive web-scale key
cardinality."""

import time

import duckdb
import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions import stats as S
from vlm_eden_dataset_etl_ray.functions.relational import (
    session_counts, session_ids)

GAP = 3600.0


def _events(n=20_000, n_keys=50, seed=7):
    """Hot-key event table: ~n/n_keys rows per key, so after repartition
    into many blocks every key spans several sorted blocks."""
    rng = np.random.default_rng(seed)
    return pa.table({
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        "u": pa.array(rng.integers(0, n_keys, n).astype(str)),
        "v": pa.array(np.round(rng.normal(100, 30, n), 2)),
        "ts": pa.array(np.sort(rng.integers(0, 5 * 10**6, n)) * 1_000_000,
                       pa.timestamp("us")),
    })


def _con(t):
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.register("t", t)
    return con


def _sorted_tbl(ds, keys):
    t = pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return t.sort_by([(k, "ascending") for k in keys])


def _ds(t, blocks=40):
    return rd.from_arrow(t).repartition(blocks)


def test_grouped_quantiles_many_blocks():
    t = _events()
    out = _sorted_tbl(
        S.grouped_quantiles(_ds(t), ["u"], "v", [0.25, 0.5, 0.75],
                            aliases=["q25", "q50", "q75"]), ["u"])
    ora = _con(t).execute("""
        select u, quantile_cont(v, 0.25) q25, quantile_cont(v, 0.5) q50,
               quantile_cont(v, 0.75) q75
        from t group by u order by u
    """).arrow()
    assert out.column("u").to_pylist() == ora.column("u").to_pylist()
    for c in ["q25", "q50", "q75"]:
        np.testing.assert_allclose(out.column(c).to_numpy(),
                                   ora.column(c).to_numpy(),
                                   rtol=1e-12, err_msg=c)


def test_grouped_mad_many_blocks():
    t = _events()
    out = _sorted_tbl(S.grouped_mad(_ds(t), ["u"], "v", z=3.0), ["u"])
    ora = _con(t).execute("""
        with m as (select u, median(v) med from t group by u),
        d as (select t.u, abs(v - med) dev, med from t join m using (u)),
        md as (select u, any_value(med) med, median(dev) mad from d group by u)
        select md.u, round(md.med, 4) med, round(md.mad, 4) mad,
               cast(sum(case when d.dev > 3.0 * 1.4826 * md.mad
                        then 1 else 0 end) as bigint) n_outliers
        from d join md on d.u = md.u group by md.u, md.med, md.mad
        order by md.u
    """).arrow()
    assert out.column("u").to_pylist() == ora.column("u").to_pylist()
    np.testing.assert_allclose(out.column("med").to_numpy(),
                               ora.column("med").to_numpy(), atol=1e-9)
    np.testing.assert_allclose(out.column("mad").to_numpy(),
                               ora.column("mad").to_numpy(), atol=1e-9)
    assert out.column("n_outliers").to_pylist() == \
        ora.column("n_outliers").to_pylist()


def test_branch_edge_merge_distributed_fallback_matches_driver(monkeypatch):
    """Past driver_cap_bytes the merge falls back to the distributed
    two-branch plan (filter branches + edge groupby + union); force it
    with cap=0 and pin it row-for-row to the driver-side fast path."""
    import vlm_eden_dataset_etl_ray.functions.runfold as rf

    t = _events()
    fast = _sorted_tbl(S.grouped_mad(_ds(t), ["u"], "v", z=3.0), ["u"])

    orig = rf.branch_edge_merge
    monkeypatch.setattr(
        rf, "branch_edge_merge",
        lambda *a, **k: orig(*a, **{**k, "driver_cap_bytes": 0}))
    slow = _sorted_tbl(S.grouped_mad(_ds(t), ["u"], "v", z=3.0), ["u"])

    assert fast.column("u").to_pylist() == slow.column("u").to_pylist()
    for c in ("med", "mad"):
        np.testing.assert_allclose(fast.column(c).to_numpy(),
                                   slow.column(c).to_numpy(), atol=0)
    assert fast.column("n_outliers").to_pylist() == \
        slow.column("n_outliers").to_pylist()


def test_grouped_trend_many_blocks():
    t = _events()
    out = _sorted_tbl(
        S.grouped_trend(_ds(t), "u", ["ts", "eid"], "v"), ["u"])
    ora = _con(t).execute("""
        with r as (select u, v,
                   row_number() over (partition by u order by ts, eid) x
                   from t)
        select u, cast(count(*) as bigint) n,
               round(regr_slope(v, x), 6) slope,
               round(regr_intercept(v, x), 6) intercept
        from r group by u order by u
    """).arrow()
    assert out.column("u").to_pylist() == ora.column("u").to_pylist()
    assert out.column("n").to_pylist() == ora.column("n").to_pylist()
    np.testing.assert_allclose(out.column("slope").to_numpy(),
                               ora.column("slope").to_numpy(), atol=1e-5)
    np.testing.assert_allclose(out.column("intercept").to_numpy(),
                               ora.column("intercept").to_numpy(), atol=1e-4)


def test_grouped_trend_single_row_groups_null():
    t = pa.table({"u": ["a", "b", "b"], "ts": pa.array([1, 2, 3], pa.int64()),
                  "v": [1.0, 2.0, 4.0]})
    out = _sorted_tbl(S.grouped_trend(rd.from_arrow(t).repartition(3),
                                      "u", ["ts"], "v"), ["u"])
    assert out.column("u").to_pylist() == ["a", "b"]
    assert out.column("slope").to_pylist() == [None, 2.0]
    assert out.column("n").to_pylist() == [1, 2]


def test_grouped_entropy_many_blocks():
    t = _events()
    days = pa.table({"u": t.column("u"),
                     "b": (t.column("v").to_numpy() > 100).astype(str)})
    out = _sorted_tbl(
        S.grouped_entropy(_ds(days), ["u"], "b", alias="h"), ["u"])
    ora = _con(days).execute(
        "select u, entropy(b) h from t group by u order by u").arrow()
    assert out.column("u").to_pylist() == ora.column("u").to_pylist()
    np.testing.assert_allclose(out.column("h").to_numpy(),
                               ora.column("h").to_numpy(), rtol=1e-9)


def test_sessions_many_blocks_match_duckdb():
    t = _events()
    got = _sorted_tbl(session_counts(_ds(t), "u", "ts", GAP), ["u"])
    ora = _con(t).execute(f"""
        with g as (select u, epoch_us(ts) - epoch_us(
                       lag(ts) over (partition by u order by ts)) gap_us
                   from t)
        select u, cast(sum(case when gap_us is null
                         or gap_us > {int(GAP * 1e6)}
                         then 1 else 0 end) as bigint) n_sessions
        from g group by u order by u
    """).arrow()
    assert got.column("u").to_pylist() == ora.column("u").to_pylist()
    assert got.column("n_sessions").to_pylist() == \
        ora.column("n_sessions").to_pylist()

    ids = _sorted_tbl(session_ids(_ds(t), "u", "ts", GAP,
                                  order_cols=["ts", "eid"]), ["eid"])
    ora2 = _con(t).execute(f"""
        select eid, cast(sum(case when gap_us is null
                          or gap_us > {int(GAP * 1e6)}
                          then 1 else 0 end) over (
            partition by u order by ts, eid rows unbounded preceding)
            as bigint) sid
        from (select eid, u, ts, epoch_us(ts) - epoch_us(lag(ts) over (
                  partition by u order by ts, eid)) gap_us from t)
        order by eid
    """).arrow()
    assert ids.column("session_id").to_pylist() == \
        ora2.column("sid").to_pylist()


def test_session_ids_duplicate_order_tuples_across_blocks():
    """Whole blocks of one repeated (key, ts, tiebreak) tuple: the block
    summary dict collides by design; colliding blocks must still label
    every row with the same (correct) session ordinal."""
    t = pa.table({
        "u": pa.array(["a"] * 64 + ["b"] * 8),
        "ts": pa.array([5_000_000] * 64
                       + [10 ** 10 * (i // 2) for i in range(8)],
                       pa.timestamp("us")),
        "eid": pa.array([0] * 64 + list(range(8)), pa.int64()),
    })
    got = _sorted_tbl(session_ids(rd.from_arrow(t).repartition(16),
                                  "u", "ts", GAP, order_cols=["ts", "eid"]),
                      ["u", "eid", "ts"])
    sids = got.column("session_id").to_pylist()
    assert sids[:64] == [1] * 64  # one zero-gap session for the hot tuple
    assert sids[64:] == [1, 1, 2, 2, 3, 3, 4, 4]


def test_runfold_million_keys_bounded():
    """The scale criterion: ≥10⁶ distinct keys in bounded wall-time. A
    per-group UDF pays ~10⁶ Python invocations per operator (minutes);
    the run-boundary folds pay one Python call per BLOCK."""
    n = 1_200_000
    rng = np.random.default_rng(3)
    u = np.concatenate([np.arange(1_000_000, dtype=np.int64),
                        rng.integers(0, 1_000_000, n - 1_000_000)])
    rng.shuffle(u)
    t = pa.table({
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        "u": pa.array(u),
        "v": pa.array(rng.normal(0, 1, n)),
        "ts": pa.array(np.sort(rng.integers(0, 10**7, n)) * 1_000_000,
                       pa.timestamp("us")),
    })
    n_keys = len(np.unique(u))
    assert n_keys >= 990_000
    t0 = time.monotonic()
    ds = rd.from_arrow(t)
    assert S.grouped_quantiles(ds, ["u"], "v", [0.5], aliases=["q50"]) \
        .count() == n_keys
    assert S.grouped_mad(ds, ["u"], "v").count() == n_keys
    assert S.grouped_trend(ds, "u", ["ts", "eid"], "v").count() == n_keys
    assert session_counts(ds, "u", "ts", GAP).count() == n_keys
    assert session_ids(ds, "u", "ts", GAP,
                       order_cols=["ts", "eid"]).count() == n
    elapsed = time.monotonic() - t0
    # five operators over 1.2M rows / 1M keys; map_groups took minutes PER
    # operator at this cardinality. Generous bound — this is a regression
    # tripwire for reintroducing per-key Python work, not a benchmark.
    assert elapsed < 180, f"runfold family took {elapsed:.0f}s at 10^6 keys"
