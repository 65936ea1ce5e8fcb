"""Large×large hash semi/anti join vs DuckDB EXISTS / NOT EXISTS."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.relational import hash_semi_join


def _data(seed=21, n=4000, m=900):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, 600, n).astype(np.int64)
    left = pa.table({
        "k": pa.array(np.where(lk % 31 == 0, None, lk)),  # some null keys
        "v": pa.array(rng.uniform(0, 1, n)),
    })
    right = pa.table({"rk": pa.array(rng.integers(300, 900, m).astype(np.int64)),
                      "w": pa.array(rng.uniform(0, 1, m))})
    return left, right


def _run(left, right, anti):
    out = hash_semi_join(rd.from_arrow(left).repartition(6),
                         rd.from_arrow(right).repartition(4),
                         "k", "rk", anti=anti, num_buckets=5)
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow", batch_size=None))
    return t.sort_by([("k", "ascending"), ("v", "ascending")])


def _oracle(left, right, anti):
    con = duckdb.connect()
    con.register("l", left); con.register("r", right)
    neg = "not " if anti else ""
    return con.execute(f"""
        select k, v from l
        where {neg}exists (select 1 from r where r.rk = l.k)
        order by k nulls last, v""").fetch_arrow_table()


def test_semi_matches_exists():
    left, right = _data()
    got, exp = _run(left, right, False), _oracle(left, right, False)
    assert got.num_rows == exp.num_rows
    assert got.column("v").to_pylist() == exp.column("v").to_pylist()


def test_anti_matches_not_exists_and_keeps_null_keys():
    left, right = _data()
    got, exp = _run(left, right, True), _oracle(left, right, True)
    assert got.num_rows == exp.num_rows
    assert got.column("v").to_pylist() == exp.column("v").to_pylist()
    assert got.column("k").null_count > 0  # null keys survive NOT EXISTS


def test_semi_plus_anti_partition_left():
    left, right = _data(seed=3)
    semi, anti = _run(left, right, False), _run(left, right, True)
    assert semi.num_rows + anti.num_rows == left.num_rows
