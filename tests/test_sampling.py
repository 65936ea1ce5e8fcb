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


def test_budget_sample_exact_boundary_and_reshard_stable():
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from vlm_eden_dataset_etl_ray.functions.sampling import (_int_priority,
                                                             budget_sample)

    n = 300
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "cost": pa.array((np.arange(n) % 50 + 1).astype(np.int64)),
    })

    def run(parts, budget):
        out = pa.concat_tables(budget_sample(
            rd.from_arrow(t).repartition(parts), "doc_id", "cost",
            budget, seed=3,
        ).iter_batches(batch_format="pyarrow", batch_size=None))
        return sorted(out.column("doc_id").to_pylist()), out

    ids4, out = run(4, 2000)
    ids9, _ = run(9, 2000)
    assert ids4 == ids9  # reshard-stable

    # serial reference: priority order, greedy prefix
    pri = _int_priority(t, "doc_id", 3)
    order = np.lexsort((t.column("doc_id").to_numpy(), pri.astype(np.int64)))
    cum, ref = 0, []
    for i in order:
        c = int(t.column("cost")[int(i)].as_py())
        if cum + c > 2000:
            break  # window-sum semantics: first overflow stops the prefix
        cum += c
        ref.append(int(t.column("doc_id")[int(i)].as_py()))
    assert ids4 == sorted(ref)
    total = sum(int(t.column("cost")[int(t.column("doc_id").to_pylist().index(d))].as_py()) for d in ids4)
    assert total <= 2000

    with pytest.raises(Exception, match="integer"):
        bad = pa.table({"doc_id": pa.array([1], pa.int64()),
                        "cost": pa.array([1.0])})
        pa.concat_tables(budget_sample(
            rd.from_arrow(bad), "doc_id", "cost", 10,
        ).iter_batches(batch_format="pyarrow", batch_size=None))
