"""Fuzzy (edit-distance) matching over string domains.

Reference parity: the reference cleans near-identical catalog strings by
hand-maintained mapping tables (e.g. transforms/normalize_names.py applies a
literal alias dict); this module generalizes that to *discovered* aliases —
pairs of values within a small Levenshtein distance — the fuzzy-dedup
primitive a training-data pipeline needs for entity/catalog columns.

Scale shape: fuzzy matching is quadratic in the CANDIDATE set, so the
operator (a) collapses to the DISTINCT (block, value) domain first —
vocabulary size, not row count, drives cost, and catalog vocabularies are
tiny relative to fact tables — and (b) blocks by caller-chosen keys so the
all-pairs step runs only within a block, one `groupby().map_groups` group
at a time. The in-group kernel is an exact Levenshtein DP vectorized ACROSS
pairs with numpy (the sequential DP recurrence runs over character
positions; every pair advances in lock-step), after a cheap
length-difference pre-filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def levenshtein_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Exact Levenshtein distance for parallel string lists, vectorized
    across pairs: O(maxlen²) python iterations of numpy ops on pair-length
    vectors instead of O(pairs · len²) python steps."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.array([len(s) for s in a], dtype=np.int64)
    lb = np.array([len(s) for s in b], dtype=np.int64)
    ma, mb = int(la.max(initial=0)), int(lb.max(initial=0))
    # byte matrices padded with 0 (strings are utf-8; compare codepoints)
    A = np.zeros((n, ma), dtype=np.int32)
    B = np.zeros((n, mb), dtype=np.int32)
    for i, s in enumerate(a):
        A[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    for i, s in enumerate(b):
        B[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)

    out = np.where(la == 0, lb, 0).astype(np.int64)
    prev = np.broadcast_to(np.arange(mb + 1, dtype=np.int64), (n, mb + 1)).copy()
    cur = np.empty_like(prev)
    for i in range(1, ma + 1):
        cur[:, 0] = i
        ai = A[:, i - 1][:, None]  # (n, 1)
        # cost matrix for this row, all j at once is impossible (j is
        # sequential via the insertion term), so walk j with vector ops
        sub_base = prev[:, :-1] + (B != ai)  # substitution candidates
        dele = prev[:, 1:] + 1  # deletion candidates
        best_ins_free = np.minimum(sub_base, dele)
        for j in range(1, mb + 1):
            cur[:, j] = np.minimum(best_ins_free[:, j - 1], cur[:, j - 1] + 1)
        done = la == i
        if done.any():
            out[done] = cur[done, lb[done]]
        prev, cur = cur, prev
    return out


def fuzzy_value_pairs(
    ds: rd.Dataset,
    block_cols: list[str],
    value_col: str,
    max_dist: int,
    left_alias: str = "value_a",
    right_alias: str = "value_b",
) -> rd.Dataset:
    """All pairs of DISTINCT ``value_col`` values within the same block
    whose Levenshtein distance is ≤ ``max_dist`` (plus the exact distance),
    emitted once per block with ``value_a < value_b``. Blocks are the
    operator's scale contract: pick keys that bound block vocabulary.
    """

    def _distinct(t: pa.Table) -> pa.Table:
        return t.select(block_cols + [value_col]).group_by(
            block_cols + [value_col]
        ).aggregate([])

    domain = ds.map_batches(_distinct, batch_format="pyarrow",
                            zero_copy_batch=True)
    # global distinct of the (block, value) domain — mergeable, tiny output
    from .relational import grouped_count

    domain = grouped_count(domain, block_cols + [value_col], alias="__n",
                           cardinality="high").drop_columns(["__n"])

    def _pairs(g: pa.Table) -> pa.Table:
        # nulls can't fuzzy-match anything; drop before pairing
        vals = sorted({v for v in g.column(value_col).to_pylist()
                       if v is not None})
        m = len(vals)
        lens = np.array([len(v) for v in vals], dtype=np.int64)
        ia, ib = np.triu_indices(m, k=1)
        keep = np.abs(lens[ia] - lens[ib]) <= max_dist
        ia, ib = ia[keep], ib[keep]
        a = [vals[i] for i in ia]
        b = [vals[i] for i in ib]
        d = levenshtein_batch(a, b)
        hit = d <= max_dist
        out = {k: pa.array([g.column(k)[0].as_py()] * int(hit.sum()),
                           g.schema.field(k).type) for k in block_cols}
        out[left_alias] = pa.array([x for x, h in zip(a, hit) if h], pa.string())
        out[right_alias] = pa.array([x for x, h in zip(b, hit) if h], pa.string())
        out["dist"] = pa.array(d[hit], pa.int64())
        return pa.table(out)

    return domain.groupby(
        block_cols[0] if len(block_cols) == 1 else block_cols
    ).map_groups(_pairs, batch_format="pyarrow")
