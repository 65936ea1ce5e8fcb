"""Mergeable sketches — approximate aggregates for 100 TB group-bys.

The pattern (guide: "sketches are designed to be mergeable"): each batch
emits one serialized sketch per group, a tiny second stage merges them.
Exact distinct-counts over billions of keys would shuffle every key; an HLL
register array is 2^p bytes regardless of cardinality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.hashing import hash_strings

# null group keys ride through the partial/merge machinery as a sentinel
# string (np.unique / sorted() cannot order None against str) and map back
# to null at the output edge — matching SQL GROUP BY's one-null-group rule
_NULL_KEY = "\x00\x00__null__"


def _group_strings(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    s = pc.fill_null(col.cast(pa.string()), _NULL_KEY)
    return np.asarray(s.to_pylist())


def _unmask_keys(keys: list[str]) -> list:
    return [None if k == _NULL_KEY else k for k in keys]


class HyperLogLog:
    """Plain HLL (Flajolet et al.): p-bit register index, rank of remaining
    bits, harmonic-mean estimator with small-range correction."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = position of first set bit from the top, 1-based
        rank = np.zeros(len(h), dtype=np.uint8)
        remaining = rest.copy()
        mask = np.uint64(1) << np.uint64(63)
        found = np.zeros(len(h), dtype=bool)
        for r in range(1, 64 - self.p + 2):
            hit = (~found) & ((remaining & mask) != 0)
            rank[hit] = r
            found |= hit
            if found.all():
                break
            remaining = remaining << np.uint64(1)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting for small ranges
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


def approx_distinct(
    ds: rd.Dataset, column: str, group_by: str | None = None, p: int = 12
) -> pa.Table:
    """Approximate COUNT(DISTINCT column) [per ``group_by``] via mergeable
    HLL sketches: one sketch per (batch, group) → tree merge. Standard
    error ≈ 1.04/sqrt(2^p) (~1.6% at p=12)."""

    def _partial(t: pa.Table) -> pa.Table:
        col = t.column(column)
        h = hash_strings(col.cast(pa.string()))
        if group_by is None:
            sk = HyperLogLog(p).add_hashes(h)
            return pa.table({"__g": pa.array([None], pa.string()),
                             "__sk": pa.array([sk.to_bytes()], pa.binary())})
        groups = _group_strings(t.column(group_by))
        out_g, out_s = [], []
        for g in np.unique(groups):
            sk = HyperLogLog(p).add_hashes(h[groups == g])
            out_g.append(str(g))
            out_s.append(sk.to_bytes())
        return pa.table({"__g": pa.array(out_g, pa.string()),
                         "__sk": pa.array(out_s, pa.binary())})

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    def _merge(t: pa.Table) -> pa.Table:
        acc: dict = {}
        for g, b in zip(t.column("__g").to_pylist(), t.column("__sk").to_pylist()):
            sk = HyperLogLog.from_bytes(b, p)
            if g in acc:
                acc[g].merge(sk)
            else:
                acc[g] = sk
        ks = sorted(acc, key=lambda x: (x is None, x))
        cols = {"approx_distinct": pa.array(
            [int(round(acc[k].estimate())) for k in ks], pa.int64())}
        if group_by is not None:
            cols = {group_by: pa.array(_unmask_keys(ks), pa.string()), **cols}
        return pa.table(cols)

    merged = partial.repartition(1).map_batches(
        _merge, batch_format="pyarrow", batch_size=None
    )
    return pa.concat_tables(merged.iter_batches(batch_format="pyarrow", batch_size=None))


class CentroidSketch:
    """Mergeable quantile sketch (t-digest-lite): a sorted batch compresses
    to ≤ ``k`` (mean, count) centroids by equal-count chunking; merging
    concatenates and re-compresses. Deterministic (no RNG), error
    ~ O(1/k) in rank. For 100-TB group-bys: one sketch per (batch, group),
    tiny final merge — the quantile analog of HLL registers."""

    def __init__(self, k: int = 256, means: np.ndarray | None = None,
                 counts: np.ndarray | None = None):
        self.k = k
        self.means = means if means is not None else np.empty(0, np.float64)
        self.counts = counts if counts is not None else np.empty(0, np.int64)

    @classmethod
    def from_values(cls, v: np.ndarray, k: int = 256) -> "CentroidSketch":
        v = np.sort(v[~np.isnan(v)].astype(np.float64))
        if len(v) <= k:
            return cls(k, v, np.ones(len(v), np.int64))
        edges = np.linspace(0, len(v), k + 1).astype(np.int64)
        counts = np.diff(edges)
        sums = np.add.reduceat(v, edges[:-1])
        return cls(k, sums / counts, counts)

    def merge(self, other: "CentroidSketch") -> "CentroidSketch":
        means = np.concatenate([self.means, other.means])
        counts = np.concatenate([self.counts, other.counts])
        order = np.argsort(means, kind="stable")
        means, counts = means[order], counts[order]
        if len(means) > self.k:
            # weighted equal-count re-compression to k centroids
            cum = np.cumsum(counts)
            total = cum[-1]
            targets = np.linspace(0, total, self.k + 1)[1:-1]
            idx = np.searchsorted(cum, targets, side="left")
            bounds = np.concatenate([[0], np.unique(idx) + 1, [len(means)]])
            bounds = np.unique(bounds)
            sums = np.add.reduceat(means * counts, bounds[:-1])
            cnts = np.add.reduceat(counts, bounds[:-1])
            means, counts = sums / cnts, cnts
        self.means, self.counts = means, counts
        return self

    def quantile(self, q: float) -> float:
        if not len(self.means):
            return float("nan")
        cum = np.cumsum(self.counts) - self.counts / 2.0
        rank = q * float(np.sum(self.counts))
        return float(np.interp(rank, cum, self.means))

    def to_bytes(self) -> bytes:
        return np.concatenate([self.means,
                               self.counts.astype(np.float64)]).tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, k: int = 256) -> "CentroidSketch":
        a = np.frombuffer(b, dtype=np.float64)
        h = len(a) // 2
        return cls(k, a[:h].copy(), a[h:].astype(np.int64))


def approx_quantiles(
    ds: rd.Dataset, column: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    group_by: str | None = None, k: int = 256,
    cardinality: str = "low",
) -> pa.Table | rd.Dataset:
    """Approximate quantiles [per group] via mergeable centroid sketches:
    one sketch per (batch, group) → tiny final merge. Columns:
    ``q50``-style names per requested quantile.

    ``cardinality="low"`` (default) tree-reduces every (group, sketch)
    partial in ONE task and returns a driver-side table — right for
    reporting-grade group spaces (sources, languages, days). For
    key-per-user group spaces pass ``"high"``: partials shuffle via
    ``groupby(group)`` and merge per group in parallel, returning a
    DATASET — no single task ever sees all groups."""

    def _partial(t: pa.Table) -> pa.Table:
        vals = t.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
        if group_by is None:
            sk = CentroidSketch.from_values(vals, k)
            return pa.table({"__g": pa.array([None], pa.string()),
                             "__sk": pa.array([sk.to_bytes()], pa.binary())})
        groups = _group_strings(t.column(group_by))
        out_g, out_s = [], []
        for g in np.unique(groups):
            out_g.append(str(g))
            out_s.append(CentroidSketch.from_values(vals[groups == g], k).to_bytes())
        return pa.table({"__g": pa.array(out_g, pa.string()),
                         "__sk": pa.array(out_s, pa.binary())})

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    def _merge(t: pa.Table) -> pa.Table:
        acc: dict = {}
        for g, b in zip(t.column("__g").to_pylist(), t.column("__sk").to_pylist()):
            sk = CentroidSketch.from_bytes(b, k)
            acc[g] = acc[g].merge(sk) if g in acc else sk
        ks = sorted(acc, key=lambda x: (x is None, x))
        cols: dict = {}
        if group_by is not None:
            cols[group_by] = pa.array(_unmask_keys(ks), pa.string())
        for q in qs:
            cols[f"q{int(round(q * 100))}"] = pa.array(
                [acc[g].quantile(q) for g in ks], pa.float64())
        return pa.table(cols)

    if cardinality == "high":
        if group_by is None:
            raise ValueError("cardinality='high' requires group_by")
        # shuffle the (group, sketch) partials; each group merges in
        # parallel — no task ever holds every group's sketches
        return partial.groupby("__g").map_groups(
            _merge, batch_format="pyarrow")
    merged = partial.repartition(1).map_batches(
        _merge, batch_format="pyarrow", batch_size=None)
    return pa.concat_tables(
        merged.iter_batches(batch_format="pyarrow", batch_size=None))


class CountMin:
    """Count-min sketch (Cormode & Muthukrishnan): ``d`` rows × ``w``
    counters, estimate = min over rows. Mergeable by element-wise add —
    the frequency analog of HLL's registers."""

    def __init__(self, w: int = 2048, d: int = 4):
        self.w, self.d = w, d
        self.table = np.zeros((d, w), dtype=np.int64)

    def _row_slots(self, h: np.ndarray, r: int) -> np.ndarray:
        # row-seeded second hash: cheap independent-enough row functions
        with np.errstate(over="ignore"):  # uint64 wraparound intended
            hr = (h * np.uint64(2 * r + 1) + np.uint64(r * 0x9E3779B9)) >> np.uint64(16)
        return (hr % np.uint64(self.w)).astype(np.int64)

    def add_hashes(self, h: np.ndarray) -> "CountMin":
        for r in range(self.d):
            np.add.at(self.table[r], self._row_slots(h, r), 1)
        return self

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(self.d):
            est = np.minimum(est, self.table[r][self._row_slots(h, r)])
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        self.table += other.table
        return self

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, w: int = 2048, d: int = 4) -> "CountMin":
        s = cls(w, d)
        s.table = np.frombuffer(b, dtype=np.int64).reshape(d, w).copy()
        return s


def approx_heavy_hitters(
    ds: rd.Dataset, column: str, k: int = 10, w: int = 2048, d: int = 4,
    candidates_per_batch: int = 64,
) -> pa.Table:
    """Approximate top-k most frequent values. Each batch emits (a) one
    CountMin sketch and (b) its local top-``candidates_per_batch`` values;
    the tiny final stage merges sketches, unions candidates, and ranks the
    candidates by their CM estimate. A true heavy hitter is a local heavy
    hitter in enough batches to surface as a candidate, and CM never
    under-counts — so at k ≪ candidates the result matches exact top-k with
    high probability, at sketch-sized memory (d·w counters per batch)."""

    def _partial(t: pa.Table) -> pa.Table:
        col = pc.fill_null(t.column(column).cast(pa.string()), _NULL_KEY)
        h = hash_strings(col)
        sk = CountMin(w, d).add_hashes(h)
        counts = pa.table({"v": col}).group_by("v").aggregate([([], "count_all")])
        order = np.argsort(-counts.column("count_all").to_numpy())[:candidates_per_batch]
        cand = counts.column("v").take(pa.array(order)).to_pylist()
        return pa.table({
            "__sk": pa.array([sk.to_bytes()], pa.binary()),
            "__cand": pa.array([cand], pa.list_(pa.string())),
        })

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    def _merge(t: pa.Table) -> pa.Table:
        sk = CountMin(w, d)
        cands: set = set()
        for b, c in zip(t.column("__sk").to_pylist(), t.column("__cand").to_pylist()):
            sk.merge(CountMin.from_bytes(b, w, d))
            cands.update(c)
        vals = sorted(cands)
        est = sk.estimate_hashes(hash_strings(pa.array(vals, pa.string())))
        order = np.lexsort((np.array(vals, dtype=object), -est))[:k]
        return pa.table({
            column: pa.array(_unmask_keys([vals[i] for i in order]), pa.string()),
            "approx_count": pa.array(est[order], pa.int64()),
        })

    merged = partial.repartition(1).map_batches(
        _merge, batch_format="pyarrow", batch_size=None)
    return pa.concat_tables(
        merged.iter_batches(batch_format="pyarrow", batch_size=None))


def _hll_of(ds: rd.Dataset, column: str, p: int) -> HyperLogLog:
    """One merged HLL over a dataset's column — per-batch register
    partials, tree-merged driver-side (registers are 2^p bytes)."""
    def _partial(t: pa.Table) -> pa.Table:
        sk = HyperLogLog(p).add_hashes(
            hash_strings(t.column(column).cast(pa.string())))
        return pa.table({"__sk": pa.array([sk.to_bytes()], pa.binary())})

    acc = HyperLogLog(p)
    for b in ds.map_batches(_partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
            batch_format="pyarrow", batch_size=None):
        for raw in b.column("__sk").to_pylist():
            acc.merge(HyperLogLog.from_bytes(raw, p))
    return acc


def approx_overlap(
    ds_a: rd.Dataset,
    ds_b: rd.Dataset,
    col_a: str,
    col_b: str | None = None,
    p: int = 12,
) -> pa.Table:
    """Approximate set-overlap profile of two key columns — |A|, |B|,
    |A∪B| (register max), |A∩B| (inclusion–exclusion) and the derived
    Jaccard — the corpus-overlap question ("how much of the new crawl is
    already in the training set?") answered without ever joining the two
    sides: each dataset streams once into 2^p-byte mergeable registers.

    Inclusion–exclusion inherits HLL's ~1.04/√2^p relative error on the
    UNION size, so the intersection estimate degrades as the true overlap
    shrinks relative to the union — right tool for "roughly how much",
    wrong tool for "exactly which" (that's the anti-join / exact dedup)."""
    a = _hll_of(ds_a, col_a, p)
    b = _hll_of(ds_b, col_b or col_a, p)
    na, nb = a.estimate(), b.estimate()
    u = HyperLogLog(p)
    np.maximum(a.registers, b.registers, out=u.registers)
    nu = u.estimate()
    ni = max(0.0, na + nb - nu)
    return pa.table({
        "approx_a": pa.array([int(round(na))], pa.int64()),
        "approx_b": pa.array([int(round(nb))], pa.int64()),
        "approx_union": pa.array([int(round(nu))], pa.int64()),
        "approx_intersection": pa.array([int(round(ni))], pa.int64()),
        "approx_jaccard": pa.array(
            [round(ni / nu, 4) if nu > 0 else 0.0], pa.float64()),
    })
