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


def test_pq_adc_matches_numpy_reference_and_is_deterministic():
    from vlm_eden_dataset_etl_ray.functions.knn import (
        knn_pq, pq_encode, pq_fit)

    rng = np.random.default_rng(41)
    m_data = rng.normal(0, 1, (1500, 16)) * rng.uniform(0.5, 2.0, 16)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(m_data), dtype=np.int64)),
        "embedding": pa.array(m_data.tolist(), pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t).repartition(6)
    params = pq_fit(ds, "embedding", m=4, k=32, sample_frac=0.5)
    assert params["codebooks"].shape == (4, 32, 4)
    p2 = pq_fit(ds, "embedding", m=4, k=32, sample_frac=0.5)
    assert np.allclose(params["codebooks"], p2["codebooks"])  # deterministic

    enc = pq_encode(ds, params).materialize()
    et = pa.concat_tables(enc.iter_batches(batch_format="pyarrow",
                                           batch_size=None)).sort_by("vec_id")
    code_t = et.schema.field("pq_code").type
    assert pa.types.is_fixed_size_list(code_t) and code_t.list_size == 4
    assert "embedding" not in et.column_names

    # numpy reference: ADC inner product from the SAME codes and true norms
    books = params["codebooks"]
    codes = np.asarray(et.column("pq_code").to_pylist())
    norms = et.column("vec_norm").to_numpy(zero_copy_only=False)
    recon = np.concatenate([books[s][codes[:, s]] for s in range(4)], axis=1)
    nq = 6
    q = m_data[:nq] / np.linalg.norm(m_data[:nq], axis=1, keepdims=True)
    expect = (q @ recon.T) / np.maximum(norms, 1e-12)

    out = pa.concat_tables(
        knn_pq(enc, t.slice(0, nq), params, k=10)
        .iter_batches(batch_format="pyarrow", batch_size=None))
    for row in out.to_pylist():
        qi, ni = row["query_id"], row["neighbor_id"]
        assert abs(row["cosine"] - expect[qi, ni]) < 1e-9
    # top-k sets match the reference argsort (self excluded)
    got = {}
    for row in out.to_pylist():
        got.setdefault(row["query_id"], set()).add(row["neighbor_id"])
    for qi in range(nq):
        sc = expect[qi].copy(); sc[qi] = -np.inf
        ref = set(np.argsort(-sc)[:10].tolist())
        # ADC scores can tie; require ≥9/10 agreement to stay robust
        assert len(got[qi] & ref) >= 9, (qi, got[qi], ref)
