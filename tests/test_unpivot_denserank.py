"""unpivot (wide→long) and global dense_rank vs DuckDB oracles."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.relational import (
    grouped_min_max_count, unpivot)
from vlm_eden_dataset_etl_ray.functions.windows import global_dense_rank


def _collect(ds, sort_cols):
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return t.sort_by([(c, "ascending") for c in sort_cols])


def test_unpivot_matches_union_all_oracle():
    rng = np.random.default_rng(7)
    t = pa.table({
        "id": pa.array(np.arange(1000, dtype=np.int64)),
        "qty": pa.array(rng.integers(0, 50, 1000)),
        "price": pa.array(np.round(rng.uniform(1, 9, 1000), 2)),
    })
    got = _collect(unpivot(rd.from_arrow(t).repartition(5), ["id"],
                           ["qty", "price"]), ["id", "variable"])
    con = duckdb.connect(); con.register("t", t)
    exp = con.execute("""
        select id, 'price' as variable, price as value from t
        union all select id, 'qty', cast(qty as double) from t
        order by id, variable""").fetch_arrow_table()
    assert got.column("variable").to_pylist() == exp.column("variable").to_pylist()
    assert got.column("value").to_pylist() == exp.column("value").to_pylist()
    # grouped stats over the long form
    agg = _collect(grouped_min_max_count(
        unpivot(rd.from_arrow(t), ["id"], ["qty", "price"]),
        ["variable"], "value"), ["variable"])
    exp2 = con.execute("""
        select variable, min(value) as vmin, max(value) as vmax,
               count(*) as n
        from (select 'qty' as variable, cast(qty as double) as value from t
              union all select 'price', price from t)
        group by variable order by variable""").fetch_arrow_table()
    for c in ("variable", "vmin", "vmax", "n"):
        assert agg.column(c).to_pylist() == exp2.column(c).to_pylist(), c


def _dense_oracle(t, cols, desc=False):
    con = duckdb.connect(); con.register("t", t)
    order = ", ".join(f"{c} {'desc' if desc else ''}" for c in cols)
    return con.execute(
        f"""select rid, dense_rank() over (order by {order}) as dr
            from t order by rid""").fetch_arrow_table()


def test_dense_rank_heavy_duplicates_span_blocks():
    rng = np.random.default_rng(5)
    # few distinct keys over many rows → every block boundary lands inside
    # a key run
    t = pa.table({
        "rid": pa.array(np.arange(6000, dtype=np.int64)),
        "k": pa.array(rng.integers(0, 7, 6000)),
    })
    ds = global_dense_rank(rd.from_arrow(t).repartition(11), ["k"], "dr")
    got = _collect(ds, ["rid"])
    exp = _dense_oracle(t, ["k"])
    assert got.column("dr").to_pylist() == exp.column("dr").to_pylist()


def test_dense_rank_multi_column_descending():
    rng = np.random.default_rng(9)
    t = pa.table({
        "rid": pa.array(np.arange(2000, dtype=np.int64)),
        "a": pa.array(rng.integers(0, 4, 2000)),
        "b": pa.array(rng.choice(["x", "y", "z"], 2000)),
    })
    ds = global_dense_rank(rd.from_arrow(t).repartition(7), ["a", "b"], "dr",
                           descending=True)
    got = _collect(ds, ["rid"])
    exp = _dense_oracle(t, ["a", "b"], desc=True)
    assert got.column("dr").to_pylist() == exp.column("dr").to_pylist()


def test_dense_rank_all_one_key():
    t = pa.table({"rid": pa.array(np.arange(500, dtype=np.int64)),
                  "k": pa.array(np.zeros(500, dtype=np.int64))})
    got = _collect(global_dense_rank(rd.from_arrow(t).repartition(6), ["k"]),
                   ["rid"])
    assert set(got.column("dense_rank").to_pylist()) == {1}


def _rank_oracle(t, cols, percent=False, desc=False):
    con = duckdb.connect(); con.register("t", t)
    fn = "percent_rank()" if percent else "rank()"
    order = ", ".join(f"{c} {'desc' if desc else ''}" for c in cols)
    return con.execute(
        f"""select rid, {fn} over (order by {order}) as r
            from t order by rid""").fetch_arrow_table()


def test_rank_heavy_duplicates_span_blocks():
    from vlm_eden_dataset_etl_ray.functions.windows import global_rank

    rng = np.random.default_rng(13)
    t = pa.table({
        "rid": pa.array(np.arange(6000, dtype=np.int64)),
        "k": pa.array(rng.integers(0, 7, 6000)),
    })
    got = _collect(global_rank(rd.from_arrow(t).repartition(11), ["k"], "r"),
                   ["rid"])
    exp = _rank_oracle(t, ["k"])
    assert got.column("r").to_pylist() == exp.column("r").to_pylist()


def test_percent_rank_multi_column_descending():
    from vlm_eden_dataset_etl_ray.functions.windows import global_rank

    rng = np.random.default_rng(17)
    t = pa.table({
        "rid": pa.array(np.arange(3000, dtype=np.int64)),
        "a": pa.array(rng.integers(0, 5, 3000)),
        "b": pa.array(rng.choice(["x", "y"], 3000)),
    })
    got = _collect(global_rank(rd.from_arrow(t).repartition(9), ["a", "b"],
                               "r", descending=True, percent=True), ["rid"])
    exp = _rank_oracle(t, ["a", "b"], percent=True, desc=True)
    assert np.allclose(got.column("r").to_numpy(), exp.column("r").to_numpy())


def test_rank_single_key_and_unique_keys():
    from vlm_eden_dataset_etl_ray.functions.windows import global_rank

    one = pa.table({"rid": pa.array(np.arange(400, dtype=np.int64)),
                    "k": pa.array(np.zeros(400, dtype=np.int64))})
    got = _collect(global_rank(rd.from_arrow(one).repartition(5), ["k"], "r"),
                   ["rid"])
    assert set(got.column("r").to_pylist()) == {1}
    uniq = pa.table({"rid": pa.array(np.arange(300, dtype=np.int64)),
                     "k": pa.array(np.random.default_rng(1).permutation(300))})
    got2 = _collect(global_rank(rd.from_arrow(uniq).repartition(4), ["k"], "r"),
                    ["rid"])
    exp2 = _rank_oracle(uniq, ["k"])
    assert got2.column("r").to_pylist() == exp2.column("r").to_pylist()


def test_cume_dist_heavy_duplicates_span_blocks():
    from vlm_eden_dataset_etl_ray.functions.windows import global_cume_dist

    rng = np.random.default_rng(23)
    t = pa.table({
        "rid": pa.array(np.arange(6000, dtype=np.int64)),
        "k": pa.array(rng.integers(0, 6, 6000)),
    })
    got = _collect(global_cume_dist(rd.from_arrow(t).repartition(13), ["k"],
                                    "cd"), ["rid"])
    con = duckdb.connect(); con.register("t", t)
    exp = con.execute("""select rid, cume_dist() over (order by k) as cd
                         from t order by rid""").fetch_arrow_table()
    assert np.allclose(got.column("cd").to_numpy(), exp.column("cd").to_numpy())


def test_cume_dist_multi_column_descending_and_single_key():
    from vlm_eden_dataset_etl_ray.functions.windows import global_cume_dist

    rng = np.random.default_rng(29)
    t = pa.table({
        "rid": pa.array(np.arange(2500, dtype=np.int64)),
        "a": pa.array(rng.integers(0, 4, 2500)),
        "b": pa.array(rng.choice(["p", "q", "r"], 2500)),
    })
    got = _collect(global_cume_dist(rd.from_arrow(t).repartition(9),
                                    ["a", "b"], "cd", descending=True), ["rid"])
    con = duckdb.connect(); con.register("t", t)
    exp = con.execute("""select rid, cume_dist() over (order by a desc, b desc)
                         as cd from t order by rid""").fetch_arrow_table()
    assert np.allclose(got.column("cd").to_numpy(), exp.column("cd").to_numpy())

    one = pa.table({"rid": pa.array(np.arange(300, dtype=np.int64)),
                    "k": pa.array(np.zeros(300, dtype=np.int64))})
    got1 = _collect(global_cume_dist(rd.from_arrow(one).repartition(5), ["k"],
                                     "cd"), ["rid"])
    assert set(got1.column("cd").to_pylist()) == {1.0}
