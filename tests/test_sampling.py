"""Deterministic hash sampling: rerun-stable, reshard-stable, per-stratum
rates honored within tolerance, subset relation between rates."""

import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.sampling import hash_sample, stratified_sample


def _docs():
    return rd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["doc_id", "lang", "text"])


def _ids(ds):
    out = []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        out += b.column("doc_id").to_pylist()
    return sorted(out)


def test_hash_sample_deterministic_and_reshard_stable():
    a = _ids(hash_sample(_docs(), "doc_id", 0.3))
    b = _ids(hash_sample(_docs().repartition(13), "doc_id", 0.3))
    assert a == b  # partitioning must not affect membership
    n_total = _docs().count()
    assert 0.2 * n_total <= len(a) <= 0.4 * n_total
    # monotone: a smaller rate selects a subset of a larger rate
    small = _ids(hash_sample(_docs(), "doc_id", 0.1))
    assert set(small) <= set(a)


def test_stratified_sample_rates():
    docs = _docs()
    langs = {}
    for b in docs.iter_batches(batch_format="pyarrow", batch_size=None):
        for l in b.column("lang").to_pylist():
            langs[l] = langs.get(l, 0) + 1
    major = max(langs, key=langs.get)
    fracs = {major: 0.2}
    out = stratified_sample(docs, "lang", fracs, "doc_id", default_frac=1.0)
    got = {}
    for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
        for l in b.column("lang").to_pylist():
            got[l] = got.get(l, 0) + 1
    # non-major strata kept fully, major downsampled
    for l, n in langs.items():
        if l == major:
            assert got.get(l, 0) < n
        else:
            assert got.get(l, 0) == n
