"""SemDeDup (cluster-partitioned semantic dedup) vs a brute-force
single-machine reference on deterministic blob embeddings."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.dedup import semdedup


def _blobs(n_per=30, n_blobs=4, d=8, dup_frac=0.5, seed=7):
    """Well-separated blobs; within each blob, `dup_frac` of the points are
    near-copies of blob point 0 (cosine ≈ 1), the rest far apart."""
    rng = np.random.default_rng(seed)
    vecs, ids, blob_of = [], [], []
    for b in range(n_blobs):
        center = np.zeros(d)
        center[b % d] = 10.0 + b
        base = center + rng.normal(0, 0.01, d)
        for i in range(n_per):
            if i and i < int(n_per * dup_frac):
                v = base + rng.normal(0, 1e-4, d)  # near-dup of point 0
            elif i == 0:
                v = base
            else:
                v = center + rng.normal(0, 2.0, d)  # same blob, not a dup
            vecs.append(v)
            ids.append(f"b{b}i{i:03d}")
            blob_of.append(b)
    m = np.array(vecs)
    return ids, m, np.array(blob_of)


def _table(ids, m):
    flat = pa.array(m.astype(np.float32).ravel(), pa.float32())
    offs = pa.array(np.arange(0, (len(ids) + 1) * m.shape[1], m.shape[1],
                              dtype=np.int32))
    return pa.table({
        "doc_id": pa.array(ids),
        "embedding": pa.ListArray.from_arrays(offs, flat),
    })


def _reference_keep(ids, m, labels, thr):
    """Brute-force triangular rule per label partition, id order."""
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    keep = {}
    for b in np.unique(labels):
        idx = np.where(labels == b)[0]
        idx = idx[np.argsort(np.array(ids, dtype=object)[idx])]
        sub = mn[idx]
        sim = sub @ sub.T
        for r, i in enumerate(idx):
            keep[ids[i]] = not (sim[r, :r] >= thr).any()
    return keep


def _run(ids, m, **kw):
    ds = rd.from_arrow(_table(ids, m)).repartition(4)
    out = pa.concat_tables(
        semdedup(ds, "doc_id", "embedding", **kw).iter_batches(
            batch_format="pyarrow", batch_size=None))
    return out


def test_semdedup_matches_bruteforce_on_separated_blobs():
    ids, m, blobs = _blobs()
    out = _run(ids, m, threshold=0.999, n_clusters=4, sample_frac=1.0)
    assert out.num_rows == len(ids)
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("keep").to_pylist()))
    # with well-separated blobs k-means must recover the blob partition,
    # so the distributed result equals the per-blob brute force
    ref = _reference_keep(ids, m, blobs, 0.999)
    assert got == ref
    # the near-dup half of each blob collapsed to one survivor each
    kept = [i for i, k in got.items() if k]
    assert len(kept) < len(ids)
    for b in range(4):
        dup_ids = [f"b{b}i{i:03d}" for i in range(15)]
        assert sum(got[i] for i in dup_ids) == 1
        assert got[f"b{b}i000"]  # min-id survivor


def test_semdedup_far_from_centroid_keeps_one_per_group():
    ids, m, _ = _blobs()
    out = _run(ids, m, threshold=0.999, n_clusters=4, sample_frac=1.0,
               keep="far_from_centroid")
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("keep").to_pylist()))
    for b in range(4):
        dup_ids = [f"b{b}i{i:03d}" for i in range(15)]
        assert sum(got[i] for i in dup_ids) == 1


def test_semdedup_threshold_one_keeps_everything_and_guards():
    ids, m, _ = _blobs(n_per=10, dup_frac=0.0)
    out = _run(ids, m, threshold=1.0001, n_clusters=2, sample_frac=1.0)
    assert all(out.column("keep").to_pylist())
    with pytest.raises(ValueError, match="keep policy"):
        _run(ids, m, keep="nope")
    with pytest.raises(Exception, match="max_cluster"):
        _run(ids, m, threshold=0.9, n_clusters=1, sample_frac=1.0,
             max_cluster=5)


def test_semdedup_block_boundary_consistency():
    """Rows straddling the 512-row block edge must see earlier blocks:
    plant a duplicate pair far apart in id order within one cluster."""
    rng = np.random.default_rng(3)
    n, d = 700, 6
    m = rng.normal(0, 1.0, (n, d)) + 20.0  # one tight region → one cluster
    ids = [f"x{i:04d}" for i in range(n)]
    m[650] = m[10] * 1.000001  # near-exact dup across the block boundary
    out = _run(ids, m, threshold=0.9999999, n_clusters=1, sample_frac=1.0)
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("keep").to_pylist()))
    assert got["x0010"] and not got["x0650"]
