"""Round-3 continuation operators: grouped quantiles, JSON extraction,
ordered string agg, broadcast cross join."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.relational import (
    broadcast_cross_join, string_agg_ordered)
from vlm_eden_dataset_etl_ray.functions.stats import grouped_quantiles
from vlm_eden_dataset_etl_ray.functions.text import json_extract


def _collect(ds):
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None))


def test_grouped_quantiles_matches_duckdb():
    rng = np.random.default_rng(5)
    t = pa.table({
        "g": pa.array(rng.choice(["p", "q"], 3000)),
        "v": pa.array(np.round(rng.uniform(0, 1000, 3000), 2)),
    })
    out = _collect(grouped_quantiles(
        rd.from_arrow(t).repartition(6), ["g"], "v", [0.25, 0.5, 0.9],
        aliases=["q25", "q50", "q90"])).sort_by("g")
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.register("t", t)
    ora = con.execute("""
        select g, quantile_cont(v, 0.25) q25, quantile_cont(v, 0.5) q50,
               quantile_cont(v, 0.9) q90
        from t group by g order by g
    """).arrow()
    for c in ["q25", "q50", "q90"]:
        np.testing.assert_allclose(out.column(c).to_numpy(),
                                   ora.column(c).to_numpy(), rtol=1e-12)


def test_json_extract_typed_and_nulls():
    t = pa.table({"p": ['{"k": 7, "s": "x"}', '{"k": -3}', None, '{}',
                        'not json']})
    out = _collect(json_extract(rd.from_arrow(t).repartition(2),
                                "p", "$.k", "k", out_type=pa.int64()))
    assert sorted(out.column("k").to_pylist(), key=lambda v: (v is None, v)) \
        == [-3, 7, None, None, None]
    assert out.schema.field("k").type == pa.int64()


def test_string_agg_ordered_with_limit():
    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "o": pa.array([3, 1, 2, 10, 9], pa.int64()),
        "v": ["c", "a", "b", "z", "y"],
    })
    out = _collect(string_agg_ordered(
        rd.from_arrow(t).repartition(3), "k", "v",
        order_by=[("o", "ascending")], alias="s", sep="-", limit=2))
    rows = dict(zip(out.column("k").to_pylist(), out.column("s").to_pylist()))
    assert rows == {1: "a-b", 2: "y-z"}


def test_string_agg_ordered_full_matches_duckdb():
    rng = np.random.default_rng(9)
    t = pa.table({
        "k": pa.array(rng.integers(0, 11, 500), pa.int64()),
        "o": pa.array(rng.permutation(500), pa.int64()),
        "v": pa.array([f"w{i}" for i in rng.integers(0, 30, 500)]),
    })
    out = _collect(string_agg_ordered(
        rd.from_arrow(t).repartition(4), "k", "v",
        order_by=[("o", "ascending")], alias="s", sep=","))
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.register("t", t)
    ora = con.execute(
        "select k, string_agg(v, ',' order by o) s from t group by k"
    ).arrow()
    assert dict(zip(out.column("k").to_pylist(),
                    out.column("s").to_pylist())) == \
        dict(zip(ora.column("k").to_pylist(), ora.column("s").to_pylist()))


def test_broadcast_cross_join_counts_and_schema():
    left = rd.from_arrow(pa.table({"a": pa.array([1, 2, 3], pa.int64())}))
    small = pa.table({"b": ["x", "y"]})
    out = _collect(broadcast_cross_join(left.repartition(2), small))
    assert out.num_rows == 6
    pairs = sorted(zip(out.column("a").to_pylist(),
                       out.column("b").to_pylist()))
    assert pairs == [(1, "x"), (1, "y"), (2, "x"), (2, "y"),
                     (3, "x"), (3, "y")]
