"""FULL OUTER hash_join vs DuckDB: ON semantics (distinct key names,
null keys never match, both unmatched sides survive) and USING-style
coalescing for a shared key name."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.relational import hash_join


def _df(ds) -> pd.DataFrame:
    tbs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(tbs).to_pandas()


LT = pa.table({"k": pa.array([1, 2, 2, None], pa.int64()),
               "x": pa.array([10, 20, 21, 30], pa.int64())})
RT = pa.table({"k2": pa.array([2, 3, None], pa.int64()),
               "y": pa.array(["b", "c", "n"])})


def test_full_join_on_semantics_matches_duckdb():
    out = _df(hash_join(rd.from_arrow(LT), rd.from_arrow(RT),
                        "k", "k2", how="full", num_buckets=4))
    exp = duckdb.sql("""
        select l.k, l.x, r.k2, r.y
        from LT l full join RT r on l.k = r.k2
    """).df()
    key = ["k", "x", "k2", "y"]
    o = out[key].sort_values(key, na_position="last").reset_index(drop=True)
    e = exp[key].sort_values(key, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(o, e, check_dtype=False)
    # both unmatched sides present: k=1 (left-only), k2=3 (right-only),
    # and BOTH null-key rows unmatched
    assert len(out) == 6


def test_full_join_shared_key_coalesces():
    lt = pa.table({"k": pa.array([1, 2], pa.int64()),
                   "x": pa.array([10, 20], pa.int64())})
    rt = pa.table({"k": pa.array([2, 3], pa.int64()),
                   "y": pa.array(["b", "c"])})
    out = _df(hash_join(rd.from_arrow(lt), rd.from_arrow(rt),
                        "k", "k", how="full", num_buckets=4))
    exp = duckdb.sql("""
        select coalesce(l.k, r.k) as k, l.x, r.y
        from lt l full join rt r on l.k = r.k
    """).df()
    cols = ["k", "x", "y"]
    o = out[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    e = exp[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(o, e, check_dtype=False)


def test_unsupported_how_raises():
    with pytest.raises(ValueError, match="unsupported how"):
        hash_join(rd.from_arrow(LT), rd.from_arrow(RT), "k", "k2",
                  how="right", num_buckets=4)
