"""Bloom semi-join pre-filter: no false negatives, real volume reduction,
join results identical with and without the pre-filter."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.relational import (
    bloom_semi_filter, hash_join)


def _df(ds) -> pd.DataFrame:
    tbs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(tbs).to_pandas()


def test_bloom_prefilter_no_false_negatives_and_reduces_volume():
    rng = np.random.default_rng(5)
    lt = pa.table({
        "k": pa.array(rng.integers(0, 1_000_000, 50_000)),
        "x": pa.array(np.arange(50_000, dtype=np.int64)),
    })
    rt = pa.table({
        "k2": pa.array(rng.integers(0, 2_000, 400)),  # selective right side
        "y": pa.array(np.arange(400, dtype=np.int64)),
    })
    lds, rds = rd.from_arrow(lt).repartition(8), rd.from_arrow(rt)

    filt = _df(bloom_semi_filter(lds, rds, "k", "k2"))
    rkeys = set(rt.column("k2").to_pylist())
    survivors = set(filt["x"])
    # no false negatives: every truly-matching left row survives
    for k, x in zip(lt.column("k").to_pylist(), lt.column("x").to_pylist()):
        if k in rkeys:
            assert x in survivors
    # real reduction: the selective right side kills most of the left
    assert len(filt) < 0.05 * lt.num_rows

    # end-to-end: prefiltered join == plain join == DuckDB
    j_plain = _df(hash_join(lds, rds, "k", "k2", how="inner", num_buckets=8))
    j_pref = _df(hash_join(
        bloom_semi_filter(lds, rds, "k", "k2"), rds, "k", "k2",
        how="inner", num_buckets=8))
    exp = duckdb.sql(
        "select l.k, l.x, r.k2, r.y from lt l join rt r on l.k = r.k2"
    ).df()
    cols = ["k", "x", "k2", "y"]

    def _s(d):
        return d[cols].sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(_s(j_plain), _s(exp), check_dtype=False)
    pd.testing.assert_frame_equal(_s(j_pref), _s(exp), check_dtype=False)


def test_bloom_null_keys_filtered_consistently():
    left = pa.table({"k": pa.array([1, None, 3], pa.int64()),
                     "x": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({"k2": pa.array([1], pa.int64()),
                      "y": pa.array(["a"])})
    out = _df(bloom_semi_filter(rd.from_arrow(left), rd.from_arrow(right),
                                "k", "k2"))
    # a null key can never match in SQL, so dropping it is safe for the
    # inner-join use case; the matching key must always survive (fp are
    # allowed, fn never)
    assert 1 in set(out["x"])
