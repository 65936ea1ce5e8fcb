"""Int8 scalar quantization of embeddings: roundtrip error, size, and
search recall vs the float brute-force baseline."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.knn import (
    knn_brute_force, knn_sq, sq_decode_matrix, sq_encode, sq_fit)


def _embeddings(n=2000, d=16, seed=31):
    rng = np.random.default_rng(seed)
    m = rng.normal(0, 1, (n, d)) * rng.uniform(0.5, 3.0, d)  # per-dim scales
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(m.tolist(), pa.list_(pa.float64())),
    }), m


def test_roundtrip_error_bounded_and_codes_uint8():
    t, m = _embeddings()
    ds = rd.from_arrow(t).repartition(6)
    params = sq_fit(ds, "embedding")
    assert np.allclose(params["lo"], m.min(axis=0))
    assert np.allclose(params["hi"], m.max(axis=0))
    enc = sq_encode(ds, params)
    out = pa.concat_tables(enc.iter_batches(batch_format="pyarrow",
                                            batch_size=None)).sort_by("vec_id")
    assert "embedding" not in out.column_names  # float column dropped
    code_t = out.schema.field("sq_code").type
    assert pa.types.is_fixed_size_list(code_t) and code_t.value_type == pa.uint8()
    rec = sq_decode_matrix(out.column("sq_code"), params)
    span = m.max(axis=0) - m.min(axis=0)
    assert np.all(np.abs(rec - m) <= span / 255.0 / 2 + 1e-12)


def test_sq_search_recall_vs_float_baseline():
    t, m = _embeddings()
    ds = rd.from_arrow(t).repartition(6)
    params = sq_fit(ds, "embedding")
    enc = sq_encode(ds, params).materialize()
    queries = t.slice(0, 8)

    def _collect(out):
        r = pa.concat_tables(out.iter_batches(batch_format="pyarrow",
                                              batch_size=None))
        got = {}
        for row in r.to_pylist():
            got.setdefault(row["query_id"], set()).add(row["neighbor_id"])
        return got

    exact = _collect(knn_brute_force(ds, queries, k=10))
    approx = _collect(knn_sq(enc, queries, params, k=10))
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
    assert np.mean(recalls) >= 0.9, recalls


def test_constant_dimension_encodes_zero():
    m = np.ones((50, 4)); m[:, 1] = np.arange(50)
    t = pa.table({"vec_id": pa.array(np.arange(50, dtype=np.int64)),
                  "embedding": pa.array(m.tolist(), pa.list_(pa.float64()))})
    ds = rd.from_arrow(t)
    params = sq_fit(ds, "embedding")
    out = pa.concat_tables(sq_encode(ds, params).iter_batches(
        batch_format="pyarrow", batch_size=None)).sort_by("vec_id")
    rec = sq_decode_matrix(out.column("sq_code"), params)
    assert np.allclose(rec[:, 0], 1.0)  # constant dim reconstructs exactly
