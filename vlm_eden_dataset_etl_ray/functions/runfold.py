"""Vectorized run-boundary folds: the scale path for per-fine-key grouped
operators.

``groupby(key).map_groups(fn)`` invokes ``fn`` once per GROUP — invisible
at 10^4 keys, dominant at 10^6-10^8 (the UDF call, the per-group table
slice and the per-group output table each cost more than the vectorized
math inside). The operators built on this module use the same single
shuffle but fold at BLOCK granularity instead:

1. one distributed ``sort`` by (keys..., order) co-locates and orders
   every group (the exact shuffle ``groupby`` would have done);
2. each sorted block computes run boundaries with one vectorized
   key-change scan (the ``_key_changes`` cumsum technique from
   :mod:`.windows`) and finalizes every INTERIOR run — a run that is
   neither the block's first nor last run cannot continue in a
   neighboring block, so its group is complete — in pure NumPy,
   one Python call per block regardless of key cardinality;
3. only the ≤2 EDGE runs per block (the ones that may span a block
   boundary) are emitted as partials and merged through the classic
   per-group fold — O(blocks) groups total, so the per-group UDF cost
   is bounded by the block count, never the key count.

The design degrades gracefully: with few huge keys most rows sit in edge
runs, but then the per-group overhead is amortized over huge groups —
exactly the regime where ``map_groups`` was already fine.

Reference parity note: the reference's grouped rollups are SQL ``GROUP
BY`` pushed to Postgres (e.g. /root/reference/queries/dim_technicians.py:3-12);
this module is the engine-side equivalent that survives 10^6+ key
cardinality on a cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def key_change_array(col) -> np.ndarray:
    """Adjacent-inequality scan of one key column, null- and precision-
    safe: dictionary codes (null → -1) compare exactly, so nulls form ONE
    run (groupby semantics) and int64 keys never round-trip through
    float64 (raw ``to_numpy`` of a nullable int column yields NaN per null
    AND demotes ≥2^53 ids lossily — both corrupt run detection)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    codes = pc.fill_null(
        pc.cast(pc.dictionary_encode(col).indices, pa.int64()), -1
    ).to_numpy(zero_copy_only=False)
    return codes[1:] != codes[:-1]


def run_bounds(t: pa.Table, keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(starts, lengths) int64 arrays of equal-key runs in a block already
    sorted by ``keys`` (nulls compare equal, matching groupby)."""
    n = t.num_rows
    neq = np.zeros(max(0, n - 1), dtype=bool)
    for c in keys:
        neq |= key_change_array(t.column(c))
    starts = np.concatenate([np.zeros(1, np.int64), np.flatnonzero(neq) + 1])
    lengths = np.diff(np.concatenate([starts, np.array([n], np.int64)]))
    return starts.astype(np.int64), lengths


def run_quantile(v_sorted: np.ndarray, starts: np.ndarray,
                 lengths: np.ndarray, q: float) -> np.ndarray:
    """Linear-interpolated quantile per run, vectorized across ALL runs at
    once, over values already sorted ascending within each run.

    Bit-exact with ``np.quantile(..., method='linear')``: the virtual index
    is ``q * (n - 1)`` and the lerp uses numpy's two-branch formula
    (``b - (b-a)*(1-t)`` when ``t >= 0.5``) so interior-run results are
    indistinguishable from the edge fold's ``np.quantile``."""
    rel = q * (lengths - 1)
    lo_rel = np.floor(rel).astype(np.int64)
    frac = rel - lo_rel
    lo = starts + lo_rel
    hi = starts + np.ceil(rel).astype(np.int64)
    a, b = v_sorted[lo], v_sorted[hi]
    d = b - a
    return np.where(frac >= 0.5, b - d * (1.0 - frac), a + d * frac)


def run_ids(lengths: np.ndarray) -> np.ndarray:
    """int64[n_rows]: each row's 0-based run ordinal within the block."""
    return np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)


def run_sums(x: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-run sum of ``x`` (one float64/int64 per run) — ``np.add.reduceat``
    with the empty-block guard."""
    if len(starts) == 0:
        return np.zeros(0, dtype=x.dtype)
    return np.add.reduceat(x, starts)


def edge_mask(n_runs: int) -> np.ndarray:
    """Boolean[n_runs]: the block's first and last runs (the only runs
    that can continue in a neighboring sorted block)."""
    m = np.zeros(n_runs, dtype=bool)
    if n_runs:
        m[0] = m[-1] = True
    return m


def branch_edge_merge(parts: rd.Dataset, keys: list[str],
                      out_cols: list[str], edge_fold, *,
                      driver_cap_bytes: int = 64 << 20) -> rd.Dataset:
    """Split a unified per-run partial stream into finalized interior rows
    plus groupby-merged edge rows.

    ``parts`` carries one row per run: key columns + finalized ``out_cols``
    (null on edge rows) + op-specific partial columns (unused on interior
    rows) + a ``__edge`` bool. It is materialized ONCE — it is one row per
    run (~one per key), slim relative to the input — so the two branches
    below don't re-execute the upstream sort+fold. ``edge_fold`` receives
    one edge-run group (≤ 2 rows per block that touched the key, so O(blocks)
    groups total) and must return exactly ``keys + out_cols``.

    When the materialized ``parts`` fits under ``driver_cap_bytes`` the
    whole merge happens driver-side in one Arrow pass (the result is
    O(runs) — already the driver-sized answer), skipping a second
    distributed pipeline whose fixed cost (branch filters + an all-to-all
    groupby of the edge rows + union) dominates at small inputs. Past the
    cap — 10⁶⁺ runs or skewed edge payloads — the distributed two-branch
    plan below runs unchanged."""
    import ray

    parts = parts.materialize()
    sel = keys + out_cols

    if parts.size_bytes() <= driver_cap_bytes:
        blocks = [b for b in ray.get(parts.to_arrow_refs()) if b.num_rows]
        if not blocks:
            # empty input: the fold's empty-block schema already carries sel
            return parts.map_batches(
                lambda t: t.select(sel), batch_format="pyarrow",
                zero_copy_batch=True)
        t = pa.concat_tables(blocks).combine_chunks()
        is_edge = t.column("__edge")
        out = [t.filter(pc.invert(is_edge)).select(sel)]
        et = t.filter(is_edge)
        if et.num_rows:
            et = et.take(pc.sort_indices(
                et, sort_keys=[(k, "ascending") for k in keys]))
            starts, lengths = run_bounds(et, keys)
            out.extend(
                edge_fold(et.slice(s, ln)).select(sel)
                for s, ln in zip(starts, lengths))
        return rd.from_arrow(pa.concat_tables(out))

    def _interior(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("__edge"))).select(sel)

    def _edges(t: pa.Table) -> pa.Table:
        return t.filter(t.column("__edge"))

    interior = parts.map_batches(_interior, batch_format="pyarrow",
                                 zero_copy_batch=True)
    edge = parts.map_batches(_edges, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(keys[0] if len(keys) == 1 else keys) \
        .map_groups(edge_fold, batch_format="pyarrow")
    return interior.union(edge)


def edge_values_list(v: np.ndarray, starts: np.ndarray, lengths: np.ndarray,
                     edges: np.ndarray,
                     typ: pa.DataType = None) -> pa.Array:
    """list<value> column with one entry per run: the run's value slice for
    edge runs, null for interior runs (whose partials are never read).
    Built from offsets + a compact edge-only value buffer — no per-interior
    Python work."""
    typ = typ or pa.float64()
    incr = np.where(edges, lengths, 0)
    offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(incr)])
    row_is_edge = np.repeat(edges, lengths)
    vals = pa.array(v[row_is_edge], type=typ)
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), vals,
        mask=pa.array(~edges))


def flat_list_values(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Concatenate a list column's entries (in row order) into one numpy
    array — the edge-fold's input assembly."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.flatten().to_numpy(zero_copy_only=False)
