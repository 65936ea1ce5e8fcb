"""Weighted sampling without replacement (A-Res): proportionality,
reshard determinism, weight validation."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.sampling import weighted_sample


def _collect_ids(ds):
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
    return t.column("doc_id").to_pylist()


def test_heavier_rows_win_proportionally_and_reshard_stable():
    n = 10000
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        # first half weight 1, second half weight 10
        "w": pa.array(np.where(np.arange(n) < n // 2, 1.0, 10.0)),
    })
    ids1 = _collect_ids(weighted_sample(
        rd.from_arrow(t), "doc_id", "w", k=1000, seed=3))
    heavy = sum(1 for i in ids1 if i >= n // 2)
    assert len(ids1) == 1000 and len(set(ids1)) == 1000
    assert heavy > 3 * (1000 - heavy), heavy
    # resharding must not change the selection
    ids2 = _collect_ids(weighted_sample(
        rd.from_arrow(t).repartition(13), "doc_id", "w", k=1000, seed=3))
    assert sorted(ids1) == sorted(ids2)


def test_nonpositive_weight_rejected():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "w": pa.array([1.0, 0.0])})
    with pytest.raises(Exception):
        _collect_ids(weighted_sample(rd.from_arrow(t), "doc_id", "w", k=1))


def test_k_anonymize_suppresses_small_combos():
    from vlm_eden_dataset_etl_ray.functions.sampling import k_anonymize

    t = pa.table({
        "id": pa.array(range(10), pa.int64()),
        "city": pa.array(["a"] * 5 + ["b"] * 3 + ["c"] * 2),
        "age": pa.array([30] * 5 + [40] * 3 + [50, 51]),
    })
    out = pa.concat_tables(k_anonymize(
        rd.from_arrow(t), ["city", "age"], k=3, num_buckets=2
    ).iter_batches(batch_format="pyarrow", batch_size=None))
    kept = sorted(out.column("id").to_pylist())
    # (a,30)x5 and (b,40)x3 survive; (c,50) and (c,51) are singletons
    assert kept == [0, 1, 2, 3, 4, 5, 6, 7]
    assert "__qh" not in out.column_names


def test_k_anonymize_handles_nullable_date_quasi_identifier():
    import datetime as dt

    from vlm_eden_dataset_etl_ray.functions.sampling import k_anonymize

    d = dt.date(2024, 1, 1)
    t = pa.table({
        "id": pa.array(range(6), pa.int64()),
        "day": pa.array([d, d, d, None, None, None], pa.date32()),
    })
    out = pa.concat_tables(k_anonymize(
        rd.from_arrow(t), ["day"], k=3, num_buckets=2
    ).iter_batches(batch_format="pyarrow", batch_size=None))
    # both the non-null and the null combos have 3 members -> all kept,
    # and nullable date32 hashing no longer crashes
    assert sorted(out.column("id").to_pylist()) == list(range(6))
