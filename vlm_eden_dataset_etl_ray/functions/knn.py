"""Similarity search over embedding columns (``list<float>``).

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast, normalized query matrix, per-batch partial top-k, one tiny final
reduce per query. Scale path: IVF (coarse k-means on a sample; probe the
nearest clusters only), cutting the scanned fraction by ~n_clusters/n_probe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _as_matrix(col) -> np.ndarray:
    """``list<float>`` column → (n, d) float64 matrix via the Arrow list
    buffers (flatten + reshape) — no Python-object round trip. Ragged
    lengths or null rows raise (an embedding column is rectangular by
    contract); at 10⁹ vectors the ``to_pylist`` alternative IS the stage
    bottleneck, so this path must stay buffer-level."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if col.null_count:
        raise ValueError("_as_matrix: embedding column contains null rows")
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        flat = col.flatten()
    else:
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        if widths.size == 0:
            return np.empty((0, 0), dtype=np.float64)
        d = int(widths[0])
        if not np.all(widths == d):
            raise ValueError("_as_matrix: ragged embedding lengths")
        flat = col.flatten()
    m = flat.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    return m.reshape(n, d)


class _BatchTopK:
    """Actor-pool stage: cosine of each batch vector against the broadcast
    query matrix, emitting the per-batch top-k rows per query (partial)."""

    def __init__(self, queries_ref, id_col: str, vec_col: str, k: int,
                 exclude_self: bool):
        self.qids, self.qmat = ray.get(queries_ref)  # fetched once per actor
        self.id_col, self.vec_col, self.k = id_col, vec_col, k
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        m = _normalize(_as_matrix(batch.column(self.vec_col)))
        sims = self.qmat @ m.T  # (n_queries, batch)
        q_out, n_out, c_out = [], [], []
        for qi, qid in enumerate(self.qids):
            row = sims[qi]
            mask = ids != qid if self.exclude_self else slice(None)
            cand_ids = ids[mask]
            cand = row[mask]
            if cand.size == 0:
                continue
            k = min(self.k, cand.size)
            top = np.argpartition(-cand, k - 1)[:k]
            q_out.extend([int(qid)] * k)
            n_out.extend(cand_ids[top].astype(np.int64))
            c_out.extend(cand[top])
        return pa.table(
            {
                "query_id": pa.array(q_out, pa.int64()),
                "neighbor_id": pa.array(n_out, pa.int64()),
                "cosine": pa.array(c_out, pa.float64()),
            }
        )


def _final_topk(g: pa.Table, k: int) -> pa.Table:
    g = g.sort_by([("cosine", "descending"), ("neighbor_id", "ascending")])
    return g.slice(0, k)


def knn_brute_force(
    ds: rd.Dataset,
    queries: pa.Table,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
    concurrency=(1, 4),
) -> rd.Dataset:
    """Top-k cosine neighbors for each query row. Result columns:
    query_id, neighbor_id, cosine (float64, UNrounded — round at the edge)."""
    qids = queries.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    qmat = _normalize(_as_matrix(queries.column(vec_col)))
    qref = ray.put((qids, qmat))

    def _partial(batch: pa.Table) -> pa.Table:
        return _BatchTopK(qref, id_col, vec_col, k, exclude_self)(batch)

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    # few queries → tree-reduce the per-batch top-k partials in one task
    def _combine(t: pa.Table) -> pa.Table:
        pieces = []
        for qid in np.unique(t.column("query_id").to_numpy(zero_copy_only=False)):
            g = t.filter(pc.equal(t.column("query_id"), int(qid)))
            pieces.append(_final_topk(g, k))
        return pa.concat_tables(pieces) if pieces else t

    return partial.repartition(1).map_batches(
        _combine, batch_format="pyarrow", batch_size=None
    )


def sq_fit(ds: rd.Dataset, vec_col: str = "embedding") -> dict:
    """Fit int8 scalar quantization: per-dimension [lo, hi] over the full
    dataset via mergeable per-batch min/max partials — the driver combines
    one (2, d) row per block. Returns {"lo", "hi"} float64 arrays."""
    def _part(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column(vec_col))
        if m.size == 0:
            return pa.table({"lo": pa.array([], pa.list_(pa.float64())),
                             "hi": pa.array([], pa.list_(pa.float64()))})
        return pa.table({"lo": pa.array([m.min(axis=0).tolist()]),
                         "hi": pa.array([m.max(axis=0).tolist()])})

    rows = ds.select_columns([vec_col]).map_batches(
        _part, batch_format="pyarrow", zero_copy_batch=True).take_all()
    if not rows:
        raise ValueError("sq_fit: empty dataset")
    lo = np.min([r["lo"] for r in rows], axis=0).astype(np.float64)
    hi = np.max([r["hi"] for r in rows], axis=0).astype(np.float64)
    return {"lo": lo, "hi": hi}


def sq_encode(
    ds: rd.Dataset,
    params: dict,
    vec_col: str = "embedding",
    out_col: str = "sq_code",
    keep_float: bool = False,
) -> rd.Dataset:
    """Encode ``list<float>`` embeddings to uint8 codes (4× smaller at
    rest and in the object store — the storage/shuffle win that makes
    billion-vector corpora workable). Per-dim affine:
    ``code = round((v − lo) · 255 / (hi − lo))``; constant dims encode 0."""
    lo, hi = np.asarray(params["lo"]), np.asarray(params["hi"])
    span = np.where(hi > lo, hi - lo, 1.0)
    scale = 255.0 / span
    d = len(lo)

    def _enc(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column(vec_col))
        c = np.clip(np.rint((m - lo) * scale), 0, 255).astype(np.uint8)
        codes = pa.FixedSizeListArray.from_arrays(
            pa.array(c.reshape(-1), pa.uint8()), d)
        t = t.append_column(out_col, codes)
        return t if keep_float else t.drop_columns([vec_col])

    return ds.map_batches(_enc, batch_format="pyarrow", zero_copy_batch=True)


def sq_decode_matrix(col, params: dict) -> np.ndarray:
    """uint8 code column → reconstructed float matrix (worker-side)."""
    lo, hi = np.asarray(params["lo"]), np.asarray(params["hi"])
    span = np.where(hi > lo, hi - lo, 1.0)
    c = _as_matrix(col)
    return c * (span / 255.0) + lo


def knn_sq(
    ds: rd.Dataset,
    queries: pa.Table,
    params: dict,
    id_col: str = "vec_id",
    code_col: str = "sq_code",
    qvec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
) -> rd.Dataset:
    """Brute-force cosine top-k over SQ8-encoded vectors: queries stay
    float (broadcast once), each batch's codes decode vectorized and score
    through the same matmul/partial-top-k/tree-reduce shape as
    :func:`knn_brute_force`. Quantization error only perturbs NEAR-TIED
    neighbors — recall vs the float baseline is asserted in tests."""
    qids = queries.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    qmat = _normalize(_as_matrix(queries.column(qvec_col)))
    qref = ray.put((qids, qmat))

    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        m = _normalize(sq_decode_matrix(batch.column(code_col), params))
        qids_, qmat_ = ray.get(qref)
        sims = qmat_ @ m.T
        q_out, n_out, c_out = [], [], []
        for qi, qid in enumerate(qids_):
            row = sims[qi]
            mask = ids != qid if exclude_self else slice(None)
            cand_ids, cand = ids[mask], row[mask]
            if cand.size == 0:
                continue
            kk = min(k, cand.size)
            top = np.argpartition(-cand, kk - 1)[:kk]
            q_out.extend([int(qid)] * kk)
            n_out.extend(cand_ids[top].astype(np.int64))
            c_out.extend(cand[top])
        return pa.table({"query_id": pa.array(q_out, pa.int64()),
                         "neighbor_id": pa.array(n_out, pa.int64()),
                         "cosine": pa.array(c_out, pa.float64())})

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    def _combine(t: pa.Table) -> pa.Table:
        pieces = []
        for qid in np.unique(t.column("query_id").to_numpy(zero_copy_only=False)):
            g = t.filter(pc.equal(t.column("query_id"), int(qid)))
            pieces.append(_final_topk(g, k))
        return pa.concat_tables(pieces) if pieces else t

    return partial.repartition(1).map_batches(
        _combine, batch_format="pyarrow", batch_size=None)


def _lloyd_euclidean(sample: np.ndarray, k: int, iters: int = 10,
                     seed: int = 7) -> np.ndarray:
    """Driver-side Euclidean Lloyd's on a bounded sample — the PQ subspace
    codebook trainer (kmeans_lite is cosine-normalized; PQ reconstructs
    raw coordinates, so its codebooks must stay unnormalized)."""
    rng = np.random.default_rng(seed)
    k = min(k, len(sample))
    cent = sample[rng.choice(len(sample), k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(axis=1)
        for c in range(k):
            pts = sample[assign == c]
            if len(pts):
                cent[c] = pts.mean(axis=0)
    return cent


def pq_fit(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 256,
    sample_frac: float = 0.25,
    seed: int = 7,
) -> dict:
    """Fit product quantization: split the d dims into ``m`` contiguous
    subspaces and train a ``k``-entry Euclidean codebook per subspace on a
    driver-side sample (order-canonicalized, so the fit is deterministic
    under block-arrival reordering). Storage per vector drops from
    d×8 bytes to m bytes + one float32 norm — 8–32× depending on (d, m)."""
    sample = _as_matrix(
        pa.concat_tables(
            ds.random_sample(sample_frac, seed=seed)
            .select_columns([vec_col])
            .iter_batches(batch_format="pyarrow", batch_size=None)
        ).column(vec_col))
    if len(sample) < k:
        raise ValueError(f"sample of {len(sample)} rows < k={k}")
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dims {d} not divisible by m={m}")
    sample = sample[np.lexsort(sample.T[::-1])]
    sub = d // m
    books = np.stack([
        _lloyd_euclidean(sample[:, s * sub:(s + 1) * sub], k, seed=seed + s)
        for s in range(m)])
    return {"codebooks": books, "m": m, "d": d}


def pq_encode(
    ds: rd.Dataset,
    params: dict,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
    norm_col: str = "vec_norm",
    keep_float: bool = False,
) -> rd.Dataset:
    """Encode vectors to per-subspace nearest-codeword ids (uint8) plus a
    float32 norm (cosine needs the true magnitude — ADC reconstructs only
    the inner product). Vectorized per batch: one ‖x‖²−2xCᵀ+‖C‖² argmin
    per subspace."""
    books = np.asarray(params["codebooks"])
    m, sub = books.shape[0], books.shape[2]
    bref = ray.put(books)

    def _enc(t: pa.Table) -> pa.Table:
        x = _as_matrix(t.column(vec_col))
        bks = ray.get(bref)
        codes = np.empty((len(x), m), dtype=np.uint8)
        for s in range(m):
            xs = x[:, s * sub:(s + 1) * sub]
            cs = bks[s]
            d2 = (xs * xs).sum(1, keepdims=True) - 2.0 * (xs @ cs.T) \
                + (cs * cs).sum(1)
            codes[:, s] = d2.argmin(axis=1).astype(np.uint8)
        t = t.append_column(out_col, pa.FixedSizeListArray.from_arrays(
            pa.array(codes.reshape(-1), pa.uint8()), m))
        t = t.append_column(norm_col, pa.array(
            np.linalg.norm(x, axis=1).astype(np.float32)))
        return t if keep_float else t.drop_columns([vec_col])

    return ds.map_batches(_enc, batch_format="pyarrow", zero_copy_batch=True)


def knn_pq(
    ds: rd.Dataset,
    queries: pa.Table,
    params: dict,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    norm_col: str = "vec_norm",
    qvec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
) -> rd.Dataset:
    """Asymmetric-distance (ADC) cosine top-k over PQ codes: each query
    precomputes an (m, k) lookup table of subvector·codeword dot products
    ONCE, then every candidate scores as m table lookups — no
    reconstruction, no matmul over raw vectors. Same partial-top-k /
    tree-reduce shape as the float baseline."""
    books = np.asarray(params["codebooks"])
    m = books.shape[0]
    sub = books.shape[2]
    qids = queries.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    qmat = _normalize(_as_matrix(queries.column(qvec_col)))
    luts = np.stack([
        np.stack([qmat[qi, s * sub:(s + 1) * sub] @ books[s].T
                  for s in range(m)])
        for qi in range(len(qids))])  # (nq, m, k)
    qref = ray.put((qids, luts))

    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        codes = _as_matrix(batch.column(code_col)).astype(np.int64)
        norms = np.maximum(
            batch.column(norm_col).to_numpy(zero_copy_only=False), 1e-12)
        qids_, luts_ = ray.get(qref)
        ip = np.zeros((len(qids_), len(ids)))
        for s in range(m):
            ip += luts_[:, s, :][:, codes[:, s]]
        sims = ip / norms
        q_out, n_out, c_out = [], [], []
        for qi, qid in enumerate(qids_):
            row = sims[qi]
            mask = ids != qid if exclude_self else slice(None)
            cand_ids, cand = ids[mask], row[mask]
            if cand.size == 0:
                continue
            kk = min(k, cand.size)
            top = np.argpartition(-cand, kk - 1)[:kk]
            q_out.extend([int(qid)] * kk)
            n_out.extend(cand_ids[top].astype(np.int64))
            c_out.extend(cand[top])
        return pa.table({"query_id": pa.array(q_out, pa.int64()),
                         "neighbor_id": pa.array(n_out, pa.int64()),
                         "cosine": pa.array(c_out, pa.float64())})

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    def _combine(t: pa.Table) -> pa.Table:
        pieces = []
        for qid in np.unique(t.column("query_id").to_numpy(zero_copy_only=False)):
            g = t.filter(pc.equal(t.column("query_id"), int(qid)))
            pieces.append(_final_topk(g, k))
        return pa.concat_tables(pieces) if pieces else t

    return partial.repartition(1).map_batches(
        _combine, batch_format="pyarrow", batch_size=None)


def label_centroids(
    ds: rd.Dataset, label_col: str = "label", vec_col: str = "embedding"
) -> rd.Dataset:
    """Mean embedding per label — the canonical mergeable-partial pattern:
    each batch emits one (label, sum-vector, count) row, the tiny final
    groupby merges partials. Rounded to 6 decimals to reconcile summation
    order with the SQL oracle."""

    def _partial(t: pa.Table) -> pa.Table:
        labels = np.asarray(t.column(label_col).to_pylist())
        m = _as_matrix(t.column(vec_col))
        uniq = np.unique(labels)
        sums, counts = [], []
        for u in uniq:
            mask = labels == u
            sums.append(m[mask].sum(axis=0))
            counts.append(int(mask.sum()))
        return pa.table(
            {
                label_col: pa.array(uniq).cast(t.column(label_col).type),
                "__sum": pa.array([s.tolist() for s in sums], pa.list_(pa.float64())),
                "__n": pa.array(counts, pa.int64()),
            }
        )

    def _final(g: pa.Table) -> pa.Table:
        sums = _as_matrix(g.column("__sum"))
        n = int(np.sum(g.column("__n").to_numpy(zero_copy_only=False)))
        centroid = np.round(sums.sum(axis=0) / n, 6)
        return pa.table(
            {
                label_col: pa.array([g.column(label_col)[0].as_py()],
                                    g.column(label_col).type),
                "centroid": pa.array([centroid.tolist()], pa.list_(pa.float64())),
                "n_vectors": pa.array([n], pa.int64()),
            }
        )

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    return partial.groupby(label_col).map_groups(_final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF: coarse quantization → probe a few clusters
# ---------------------------------------------------------------------------


def kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8, seed: int = 5) -> np.ndarray:
    """Tiny deterministic k-means (driver-side, on a sample) for the coarse
    IVF codebook."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), n_clusters, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(_normalize(sample) @ _normalize(cent).T, axis=1)
        for c in range(n_clusters):
            pts = sample[assign == c]
            if len(pts):
                cent[c] = pts.mean(axis=0)
    return _normalize(cent)


class IvfIndex:
    """A PHYSICAL inverted-file index: at build time every vector is
    assigned to a coarse cell and the corpus is shuffled ONCE into one
    parquet directory per cell (``{path}/__ivf_cell={c}/``). A search
    enumerates only the files under the cells its queries probe — the scan
    never opens the other ``(n_clusters − n_probe)/n_clusters`` of the
    corpus — and scores each cell's rows against only the queries probing
    that cell, so the FLOPs are also ~``n_probe/n_clusters`` of brute
    force. Same shuffle-by-cell shape as
    ``dedup.embedding_near_dup_bucketed`` (functions/dedup.py), applied to
    top-k search instead of pair generation."""

    META = "_ivf_meta.json"
    CENTROIDS = "_ivf_centroids.npy"

    def __init__(self, path: str, centroids: np.ndarray, id_col: str,
                 vec_col: str):
        self.path = path
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.id_col, self.vec_col = id_col, vec_col

    @property
    def n_clusters(self) -> int:
        return len(self.centroids)

    def cell_dir(self, cell: int) -> str:
        import os
        return os.path.join(self.path, f"__ivf_cell={int(cell)}")

    def cell_files(self, cells) -> list[str]:
        """Parquet files under the given cells' directories (missing dirs —
        empty cells — are skipped). This list IS the search's I/O scope."""
        import glob
        import os
        out: list[str] = []
        for c in sorted(int(c) for c in set(cells)):
            d = self.cell_dir(c)
            if os.path.isdir(d):
                out.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
        return out

    def cell_rows(self, cells=None) -> int:
        """Row count from parquet footers only (no data read) — used by the
        pruning spy tests and capacity planning."""
        import pyarrow.parquet as pq
        if cells is None:
            cells = range(self.n_clusters)
        return sum(pq.ParquetFile(f).metadata.num_rows
                   for f in self.cell_files(cells))

    def save(self) -> None:
        import json
        import os
        np.save(os.path.join(self.path, self.CENTROIDS), self.centroids)
        with open(os.path.join(self.path, self.META), "w") as fh:
            json.dump({"id_col": self.id_col, "vec_col": self.vec_col,
                       "n_clusters": self.n_clusters,
                       "dim": int(self.centroids.shape[1])}, fh)

    @classmethod
    def load(cls, path: str) -> "IvfIndex":
        import json
        import os
        with open(os.path.join(path, cls.META)) as fh:
            meta = json.load(fh)
        cent = np.load(os.path.join(path, cls.CENTROIDS))
        return cls(path, cent, meta["id_col"], meta["vec_col"])


def ivf_build(
    ds: rd.Dataset,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    sample_frac: float = 0.25,
    seed: int = 5,
) -> IvfIndex:
    """Build an :class:`IvfIndex`: coarse k-means on a driver-side sample
    (order-canonicalized so the fit ignores block-arrival order), then ONE
    partitioned write that co-locates each cell's vectors. The cell id is
    kept both as the hive partition key (directory pruning) and as a data
    column ``ivf_cell`` (per-batch query routing at search time)."""
    sample = _as_matrix(
        pa.concat_tables(
            ds.random_sample(sample_frac, seed=seed)
            .select_columns([vec_col])
            .iter_batches(batch_format="pyarrow", batch_size=None)
        ).column(vec_col)
    )
    if len(sample) == 0:
        raise ValueError("ivf_build: empty sample — raise sample_frac")
    sample = sample[np.lexsort(sample.T[::-1])]
    cent = kmeans_lite(sample, min(n_clusters, len(sample)), seed=seed)
    cref = ray.put(cent)

    # A rebuild into an existing index path must not APPEND onto the old
    # cells (Ray's write mode is append) — clear any stale cell dirs first.
    import glob
    import os
    import shutil
    for stale in glob.glob(os.path.join(path, "__ivf_cell=*")):
        shutil.rmtree(stale, ignore_errors=True)

    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _normalize(_as_matrix(t.column(vec_col)))
        cells = (np.argmax(m @ c.T, axis=1).astype(np.int64)
                 if len(m) else np.empty(0, np.int64))
        t = t.append_column("ivf_cell", pa.array(cells, pa.int64()))
        return t.append_column("__ivf_cell", pa.array(cells, pa.int64()))

    (ds.select_columns([id_col, vec_col])
       .map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)
       .write_parquet(path, partition_cols=["__ivf_cell"]))
    idx = IvfIndex(path, cent, id_col, vec_col)
    idx.save()
    return idx


def ivf_search(
    index: IvfIndex,
    queries: pa.Table,
    k: int = 5,
    n_probe: int = 4,
    exclude_self: bool = True,
    concurrency=(1, 4),
    spy=None,
) -> rd.Dataset:
    """ANN top-k over an :class:`IvfIndex`. Reads ONLY the union of the
    queries' probed cell directories; within a batch, each cell's rows are
    scored against only the queries that probe that cell. ``spy`` (a Ray
    actor with ``add(rows, pairs)``) receives per-batch scan/FLOP counts —
    the pruning proof used in tests. Approximate: recall < 1.0 when a true
    neighbor lives in an unprobed cell."""
    id_col, vec_col = index.id_col, index.vec_col
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if queries.num_rows == 0:
        return rd.from_arrow(empty)
    qids = queries.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    qmat = _normalize(_as_matrix(queries.column(vec_col)))
    n_probe = min(n_probe, index.n_clusters)
    probes = np.argsort(-(qmat @ index.centroids.T), axis=1)[:, :n_probe]
    # cell → indices of the queries probing it (driver-side; O(q·n_probe))
    cell_queries: dict[int, np.ndarray] = {}
    for qi in range(len(qids)):
        for c in probes[qi]:
            cell_queries.setdefault(int(c), []).append(qi)
    cell_queries = {c: np.asarray(v, np.int64) for c, v in cell_queries.items()}
    files = index.cell_files(cell_queries.keys())
    if not files:
        return rd.from_arrow(empty)
    qref = ray.put((qids, qmat, cell_queries))

    def _probe_topk(batch: pa.Table) -> pa.Table:
        # task pool, not actors: per-task setup is one plasma-local ray.get
        # of the broadcast query pack — no model/index to warm, so actor
        # start latency buys nothing here
        all_qids, all_qmat, cellq = ray.get(qref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cells = batch.column("ivf_cell").to_numpy(zero_copy_only=False)
        m = _normalize(_as_matrix(batch.column(vec_col)))
        q_out, n_out, c_out = [], [], []
        pairs = 0
        for c in np.unique(cells):
            qsel = cellq.get(int(c))
            if qsel is None:
                continue
            mask = cells == c
            sub_ids, sub = ids[mask], m[mask]
            sims = all_qmat[qsel] @ sub.T  # (probing queries, cell rows)
            pairs += sims.size
            for row, qi in zip(sims, qsel):
                qid = int(all_qids[qi])
                keep = sub_ids != qid if exclude_self else slice(None)
                cand, cand_ids = row[keep], sub_ids[keep]
                if cand.size == 0:
                    continue
                kk = min(k, cand.size)
                top = np.argpartition(-cand, kk - 1)[:kk]
                q_out.extend([qid] * kk)
                n_out.extend(cand_ids[top].astype(np.int64))
                c_out.extend(cand[top])
        if spy is not None:
            spy.add.remote(len(ids), pairs)
        return pa.table({
            "query_id": pa.array(q_out, pa.int64()),
            "neighbor_id": pa.array(n_out, pa.int64()),
            "cosine": pa.array(c_out, pa.float64()),
        })

    partial = rd.read_parquet(
        files, columns=[id_col, vec_col, "ivf_cell"]
    ).map_batches(_probe_topk, batch_format="pyarrow", zero_copy_batch=True)

    # partials are O(probing-queries · k) per block — tree-reduce in one
    # task (same shape as knn_brute_force) instead of an all-to-all groupby
    def _combine(t: pa.Table) -> pa.Table:
        pieces = []
        for qid in np.unique(t.column("query_id").to_numpy(zero_copy_only=False)):
            g = t.filter(pc.equal(t.column("query_id"), int(qid)))
            pieces.append(_final_topk(g, k))
        return pa.concat_tables(pieces) if pieces else t

    return partial.repartition(1).map_batches(
        _combine, batch_format="pyarrow", batch_size=None)


def knn_ivf(
    ds: rd.Dataset,
    queries: pa.Table,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_frac: float = 0.25,
    concurrency=(1, 4),
    index_path: str | None = None,
) -> rd.Dataset:
    """One-call IVF ANN: :func:`ivf_build` into ``index_path`` (a scratch
    dir under /tmp when unset) + :func:`ivf_search`, result materialized
    (O(queries·k) rows) so the scratch index can be reclaimed. Reuse an
    explicit ``index_path`` + :func:`ivf_search` directly when many query
    sets hit one corpus — the build's shuffle amortizes."""
    import shutil
    import tempfile
    scratch = index_path is None
    path = tempfile.mkdtemp(prefix="ivf_", dir="/tmp") if scratch else index_path
    try:
        idx = ivf_build(ds, path, id_col=id_col, vec_col=vec_col,
                        n_clusters=n_clusters, sample_frac=sample_frac)
        return ivf_search(idx, queries, k=k, n_probe=n_probe,
                          concurrency=concurrency).materialize()
    finally:
        if scratch:
            shutil.rmtree(path, ignore_errors=True)


def knn_lsh(
    ds: rd.Dataset,
    queries: pa.Table,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_bits: int = 8,
    n_probe_bits: int = 3,
    seed: int = 17,
    concurrency=(1, 4),
) -> rd.Dataset:
    """ANN top-k via random-hyperplane LSH — the bucketed alternative to
    :func:`knn_ivf`: sign(v @ H) gives each vector an ``n_bits`` bucket
    code; a query scans only vectors whose code is within ``n_probe_bits``
    Hamming distance of its own (multi-probe). No training pass (vs IVF's
    k-means sample): the hyperplanes are a seeded Gaussian draw, identical
    on every node. Approximate — recall < 1.0 by construction."""
    rng = np.random.default_rng(seed)
    # deterministic hyperplanes; dim taken from the first query vector
    dim = len(queries.column(vec_col)[0].as_py())
    planes = rng.standard_normal((dim, n_bits))
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    def _codes(m: np.ndarray) -> np.ndarray:
        return ((m @ planes) > 0) @ weights

    qids = queries.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    qmat = _normalize(_as_matrix(queries.column(vec_col)))
    qcodes = _codes(qmat)
    # popcount via bit table (codes are < 2^n_bits)
    pop = np.array([bin(i).count("1") for i in range(1 << n_bits)], dtype=np.int8)
    ref = ray.put((qids, qmat, qcodes))

    class _LSHTopK:
        def __init__(self):
            self.qids, self.qmat, self.qcodes = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            m = _normalize(_as_matrix(batch.column(vec_col)))
            codes = _codes(m)
            sims = self.qmat @ m.T
            q_out, n_out, c_out = [], [], []
            for qi, qid in enumerate(self.qids):
                near = (pop[codes ^ self.qcodes[qi]] <= n_probe_bits) & (ids != qid)
                cand, cand_ids = sims[qi][near], ids[near]
                if cand.size == 0:
                    continue
                kk = min(k, cand.size)
                top = np.argpartition(-cand, kk - 1)[:kk]
                q_out.extend([int(qid)] * kk)
                n_out.extend(cand_ids[top].astype(np.int64))
                c_out.extend(cand[top])
            return pa.table({
                "query_id": pa.array(q_out, pa.int64()),
                "neighbor_id": pa.array(n_out, pa.int64()),
                "cosine": pa.array(c_out, pa.float64()),
            })

    partial = ds.map_batches(
        _LSHTopK, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency
    )
    return partial.groupby("query_id").map_groups(
        _final_topk, fn_kwargs={"k": k}, batch_format="pyarrow"
    )


def pca_fit(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    n_components: int = 8,
    sample_frac: float = 0.25,
    seed: int = 5,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit a PCA basis on a SAMPLE of the embedding column (same pattern as
    IVF's k-means: the fit sees sample_frac of rows; embedding dim is
    small, so the driver eigendecomposition of the dim×dim covariance is
    trivial regardless of corpus size). Returns (mean[dim],
    components[n_components, dim]) ordered by descending variance."""
    batches = list(
        ds.random_sample(sample_frac, seed=seed)
        .select_columns([vec_col])
        .iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        # per-row sampling can legitimately return 0 rows on small inputs;
        # fall back to a bounded prefix rather than crashing in concat
        batches = list(ds.limit(4096).select_columns([vec_col])
                       .iter_batches(batch_format="pyarrow", batch_size=None))
        if not batches:
            raise ValueError("pca_fit: dataset is empty")
    sample = _as_matrix(pa.concat_tables(batches).column(vec_col))
    mean = sample.mean(axis=0)
    centered = sample - mean
    cov = (centered.T @ centered) / max(1, len(sample) - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-eigvals)[:n_components]
    return mean, eigvecs[:, order].T.copy()


def pca_project(
    ds: rd.Dataset,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> rd.Dataset:
    """Project embeddings onto a fitted PCA basis — one broadcast of the
    (tiny) basis, one matmul per batch."""
    ref = ray.put((np.asarray(mean), np.asarray(components)))

    def _proj(t: pa.Table) -> pa.Table:
        mu, comp = ray.get(ref)
        m = _as_matrix(t.column(vec_col))
        proj = (m - mu) @ comp.T
        return t.append_column(
            out_col, pa.array(list(proj), pa.list_(pa.float64())))

    return ds.map_batches(_proj, batch_format="pyarrow", zero_copy_batch=True)


def kmeans_fit(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    n_clusters: int = 8,
    iters: int = 5,
    sample_frac: float = 0.25,
    seed: int = 5,
) -> np.ndarray:
    """Distributed Lloyd's k-means over the FULL dataset (where
    :func:`kmeans_lite` refines only a driver-side sample): deterministic
    sampled init, then each iteration broadcasts the (k, d) centroids and
    streams one pass of per-batch partials — (cluster, per-dim sum, count)
    — so driver state is O(blocks · k · d) scalars per pass and the data
    never aggregates anywhere. Empty clusters keep their previous
    centroid. Returns raw (un-normalized) centroids, Euclidean
    assignment — the corpus-clustering convention (topic balance,
    curriculum bucketing), vs the cosine/IVF codebook of kmeans_lite."""
    sample = _as_matrix(
        pa.concat_tables(
            ds.random_sample(sample_frac, seed=seed)
            .select_columns([vec_col])
            .iter_batches(batch_format="pyarrow", batch_size=None)
        ).column(vec_col)
    )
    if len(sample) < n_clusters:
        raise ValueError(f"sample of {len(sample)} rows < k={n_clusters}")
    # Canonicalize the sample's ROW ORDER before seeding: iter_batches
    # delivers blocks in completion order (preserve_order is off for
    # throughput), so index-based seeding off the arrival order would make
    # the fit depend on task scheduling. Lexicographic row order is a pure
    # function of the sampled SET.
    sample = sample[np.lexsort(sample.T[::-1])]
    rng = np.random.default_rng(seed)
    # k-means++ seeding (Arthur & Vassilvitskii 2007) on the driver-side
    # sample: D²-weighted picks spread the k seeds across the data's modes,
    # where a uniform pick can seed one cluster twice and permanently merge
    # two true clusters (Lloyd's cannot split a merged pair).
    cent = sample[[int(rng.integers(len(sample)))]].copy()
    d2 = ((sample - cent[0]) ** 2).sum(axis=1)
    for _ in range(1, n_clusters):
        tot = float(d2.sum())
        idx = (int(rng.integers(len(sample))) if tot <= 0.0
               else int(rng.choice(len(sample), p=d2 / tot)))
        cent = np.vstack([cent, sample[idx]])
        d2 = np.minimum(d2, ((sample - sample[idx]) ** 2).sum(axis=1))

    vecs = ds.select_columns([vec_col]).materialize()  # k passes, read once

    for _ in range(iters):
        ref = ray.put(cent)

        def _partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _as_matrix(t.column(vec_col))
            if m.size == 0:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "vsum": pa.array([], pa.list_(pa.float64())),
                                 "n": pa.array([], pa.int64())})
            # Euclidean assignment via the expanded form: argmin ||x-c||² =
            # argmax (x·c − ||c||²/2) — one matmul per batch
            scores = m @ c.T - 0.5 * np.einsum("ij,ij->i", c, c)
            assign = np.argmax(scores, axis=1)
            ks, sums, ns = [], [], []
            for ci in np.unique(assign):
                pts = m[assign == ci]
                ks.append(int(ci)); sums.append(pts.sum(axis=0).tolist())
                ns.append(len(pts))
            return pa.table({"cluster": pa.array(ks, pa.int64()),
                             "vsum": pa.array(sums, pa.list_(pa.float64())),
                             "n": pa.array(ns, pa.int64())})

        parts = pa.concat_tables(
            vecs.map_batches(_partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=None))
        nxt = cent.copy()
        ks = parts.column("cluster").to_numpy(zero_copy_only=False)
        ns = parts.column("n").to_numpy(zero_copy_only=False)
        sums = _as_matrix(parts.column("vsum"))
        for ci in range(n_clusters):
            sel = ks == ci
            tot = ns[sel].sum()
            if tot:
                # deterministic reduction: blocks summed in sorted-cluster
                # order via the stable boolean mask
                nxt[ci] = sums[sel].sum(axis=0) / tot
        cent = nxt
    return cent


def kmeans_assign(
    ds: rd.Dataset,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> rd.Dataset:
    """Label every row with its nearest (Euclidean) centroid — broadcast
    once, one matmul per batch."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _as_matrix(t.column(vec_col))
        if m.size == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        scores = m @ c.T - 0.5 * np.einsum("ij,ij->i", c, c)
        return t.append_column(
            out_col, pa.array(np.argmax(scores, axis=1).astype(np.int64)))

    return ds.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)
