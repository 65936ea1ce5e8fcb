"""Keyless broadcast interval join vs a DuckDB BETWEEN-join oracle."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.relational import broadcast_interval_join


def _left(n=5000, seed=11):
    rng = np.random.default_rng(seed)
    return pa.table({
        "rid": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(np.round(rng.uniform(-5, 120, n), 3)),
    })


def _oracle(left: pa.Table, iv: pa.Table, right_inc: bool) -> pa.Table:
    con = duckdb.connect()
    con.register("l", left)
    con.register("t", iv)
    hi = "<=" if right_inc else "<"
    return con.execute(
        f"""select l.rid, l.v, t.tier, t.lo, t.hi from l join t
            on l.v >= t.lo and l.v {hi} t.hi
            order by l.rid, t.tier"""
    ).fetch_arrow_table()


def _run(left, iv, closed="left"):
    out = broadcast_interval_join(
        rd.from_arrow(left).repartition(6), iv, "v", closed=closed)
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow", batch_size=None))
    return t.sort_by([("rid", "ascending"), ("tier", "ascending")])


DISJOINT = pa.table({
    "tier": pa.array(["a", "b", "c", "d"]),
    "lo": pa.array([0.0, 10.0, 50.0, 100.0]),
    "hi": pa.array([10.0, 50.0, 100.0, 115.0]),
})

OVERLAP = pa.table({
    "tier": pa.array(["x", "y", "z"]),
    "lo": pa.array([0.0, 5.0, 40.0]),
    "hi": pa.array([50.0, 60.0, 45.0]),
})


def test_disjoint_searchsorted_path():
    left = _left()
    got, exp = _run(left, DISJOINT), _oracle(left, DISJOINT, False)
    assert got.num_rows == exp.num_rows
    for c in ("rid", "tier"):
        assert got.column(c).to_pylist() == exp.column(c).to_pylist(), c


def test_overlapping_dense_path_multi_match():
    left = _left(n=800, seed=4)
    got, exp = _run(left, OVERLAP), _oracle(left, OVERLAP, False)
    assert got.num_rows == exp.num_rows
    for c in ("rid", "tier", "lo"):
        assert got.column(c).to_pylist() == exp.column(c).to_pylist(), c


def test_inclusive_end_and_boundary_values():
    left = pa.table({"rid": pa.array([0, 1, 2, 3], pa.int64()),
                     "v": pa.array([0.0, 10.0, 115.0, -1.0])})
    got, exp = _run(left, DISJOINT, closed="both"), _oracle(left, DISJOINT, True)
    assert got.column("rid").to_pylist() == exp.column("rid").to_pylist()
    assert got.column("tier").to_pylist() == exp.column("tier").to_pylist()


def test_null_values_never_match():
    left = pa.table({"rid": pa.array([0, 1], pa.int64()),
                     "v": pa.array([None, 20.0], pa.float64())})
    got = _run(left, DISJOINT)
    assert got.column("rid").to_pylist() == [1]
    assert got.column("tier").to_pylist() == ["b"]
