"""Distributed Lloyd's k-means: blob recovery, determinism, convergence."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.knn import kmeans_assign, kmeans_fit


def _blobs(n_per=300, d=8, k=4, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-50, 50, (k, d))
    pts = np.concatenate(
        [c + rng.normal(0, 0.5, (n_per, d)) for c in centers])
    labels = np.repeat(np.arange(k), n_per)
    perm = rng.permutation(len(pts))
    return pts[perm], labels[perm], centers


def _ds(pts):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(pts), dtype=np.int64)),
        "embedding": pa.array(pts.tolist(), pa.list_(pa.float64())),
    })).repartition(8)


def test_kmeans_recovers_separated_blobs():
    pts, labels, _ = _blobs()
    ds = _ds(pts)
    cent = kmeans_fit(ds, "embedding", n_clusters=4, iters=6, sample_frac=0.5)
    assert cent.shape == (4, 8)
    out = kmeans_assign(ds, cent, "embedding")
    tbs = pa.concat_tables(out.iter_batches(batch_format="pyarrow",
                                            batch_size=None)).sort_by("vec_id")
    got = np.array(tbs.column("cluster").to_pylist())
    # each true blob maps to exactly one fitted cluster and vice versa
    mapping = {}
    for true, fit in zip(labels, got):
        mapping.setdefault(true, fit)
        assert mapping[true] == fit, "blob split across clusters"
    assert len(set(mapping.values())) == 4, "clusters merged"


def test_kmeans_deterministic_and_converging():
    pts, _, _ = _blobs(n_per=150, k=3, seed=9)
    ds = _ds(pts)
    c1 = kmeans_fit(ds, "embedding", n_clusters=3, iters=4)
    c2 = kmeans_fit(ds, "embedding", n_clusters=3, iters=4)
    assert np.allclose(c1, c2)

    def inertia(cent):
        d2 = ((pts[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        return d2.min(axis=1).sum()

    c_early = kmeans_fit(ds, "embedding", n_clusters=3, iters=1)
    c_late = kmeans_fit(ds, "embedding", n_clusters=3, iters=5)
    assert inertia(c_late) <= inertia(c_early) + 1e-9
