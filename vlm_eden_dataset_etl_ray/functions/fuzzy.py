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


def _segments(s: str, k: int) -> list[tuple[int, str]]:
    """PassJoin partition: split ``s`` into k+1 contiguous segments whose
    lengths differ by ≤ 1 (short segments first)."""
    L = len(s)
    base, extra = divmod(L, k + 1)
    out, pos = [], 0
    for i in range(k + 1):
        ln = base + (1 if i >= (k + 1 - extra) else 0)
        out.append((i, s[pos:pos + ln]))
        pos += ln
    return out


def _seg_start(L: int, k: int, i: int) -> int:
    base, extra = divmod(L, k + 1)
    short = k + 1 - extra
    return i * base + max(0, i - short)


def fuzzy_all_pairs(
    ds: rd.Dataset,
    value_col: str,
    max_dist: int,
    left_alias: str = "value_a",
    right_alias: str = "value_b",
    max_bucket: int = 10_000,
) -> rd.Dataset:
    """All DISTINCT value pairs within Levenshtein distance ``max_dist`` —
    no caller blocking keys: candidates come from the PassJoin segment
    pigeonhole (Li, Deng, Feng; VLDB 2012): if dist(a, b) ≤ k then at
    least one of the k+1 contiguous segments of the SHORTER string occurs
    verbatim in the longer one within ±k of its home position. Exact —
    every emitted pair is Levenshtein-verified, and the scheme plus a
    short-string block (len ≤ 2k, where segmentation degenerates) misses
    nothing.

    Scale shape: the quadratic candidate step runs per SEGMENT BUCKET
    (join key = (segment index, text, shorter length)), never across the
    vocabulary; each distinct value emits k+1 probe keys and
    O(k² · (2k+1)) index substrings, so the exchange is vocabulary-sized
    × a k-bounded constant. A pathological bucket (a segment text shared
    by > ``max_bucket`` values — pick a larger ``max_dist``-appropriate
    vocabulary or pre-normalize) raises instead of going quadratic.
    Python loops run only over the DISTINCT value domain (same contract
    as :func:`fuzzy_value_pairs`: vocabulary, not rows, drives cost).
    """
    k = int(max_dist)
    if k < 1:
        raise ValueError("max_dist must be ≥ 1 (use exact dedup for 0)")
    from .relational import grouped_count

    def _distinct_nonnull(t: pa.Table) -> pa.Table:
        sub = t.select([value_col])
        return sub.drop_null().group_by([value_col]).aggregate([])

    domain = ds.map_batches(_distinct_nonnull, batch_format="pyarrow",
                            zero_copy_batch=True)
    domain = grouped_count(domain, [value_col], alias="__n",
                           cardinality="high").drop_columns(["__n"])

    def emit_keys(t: pa.Table) -> pa.Table:
        key_i, key_txt, key_len, val, side = [], [], [], [], []
        for v in t.column(value_col).to_pylist():
            if v is None:
                continue
            L = len(v)
            if L >= k + 1:
                # probe side: this value as the SHORTER of a pair
                for i, seg in _segments(v, k):
                    key_i.append(i); key_txt.append(seg)
                    key_len.append(L); val.append(v); side.append(0)
            if L <= 2 * k:
                # short block: one shared bucket (i=-1) brute-forces all
                # pairs whose SHORTER side is too short to segment
                key_i.append(-1); key_txt.append(""); key_len.append(-1)
                val.append(v); side.append(2)
            # index side: substrings matching any partner length Lp ≤ L
            # with L − Lp ≤ k and Lp ≥ k+1
            for Lp in range(max(k + 1, L - k), L + 1):
                base, extra = divmod(Lp, k + 1)
                for i in range(k + 1):
                    ln = base + (1 if i >= (k + 1 - extra) else 0)
                    if ln == 0 or ln > L:
                        continue
                    p = _seg_start(Lp, k, i)
                    for st in range(max(0, p - k), min(L - ln, p + k) + 1):
                        key_i.append(i); key_txt.append(v[st:st + ln])
                        key_len.append(Lp); val.append(v); side.append(1)
        return pa.table({
            "ki": pa.array(key_i, pa.int32()),
            "kt": pa.array(key_txt, pa.string()),
            "kl": pa.array(key_len, pa.int32()),
            "v": pa.array(val, pa.string()),
            "side": pa.array(side, pa.int8()),
        })

    keyed = domain.map_batches(emit_keys, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows > max_bucket:
            raise ValueError(
                f"fuzzy_all_pairs bucket of {g.num_rows} exceeds "
                f"max_bucket={max_bucket} (segment "
                f"{g.column('kt')[0].as_py()!r}); normalize the column or "
                "raise max_bucket")
        side = g.column("side").to_numpy(zero_copy_only=False)
        vals = g.column("v").to_pylist()
        a_out, b_out = [], []
        if int(g.column("ki")[0].as_py()) == -1:
            short = sorted(set(vals))
            for x in range(len(short)):
                for y in range(x + 1, len(short)):
                    if abs(len(short[x]) - len(short[y])) <= k:
                        a_out.append(short[x]); b_out.append(short[y])
        else:
            probes = sorted({v for v, s in zip(vals, side) if s == 0})
            index = sorted({v for v, s in zip(vals, side) if s == 1})
            for pv in probes:
                for iv in index:
                    if pv == iv:
                        continue
                    dl = len(iv) - len(pv)
                    if dl < 0 or dl > k or (dl == 0 and not pv < iv):
                        continue
                    a, b = (pv, iv) if pv < iv else (iv, pv)
                    a_out.append(a); b_out.append(b)
        return pa.table({left_alias: pa.array(a_out, pa.string()),
                         right_alias: pa.array(b_out, pa.string())})

    cands = keyed.groupby(["ki", "kt", "kl"]).map_groups(
        bucket_pairs, batch_format="pyarrow")
    # a pair can surface from several buckets/paths: verify once
    cands = grouped_count(cands, [left_alias, right_alias], alias="__n",
                          cardinality="high").drop_columns(["__n"])

    def verify(t: pa.Table) -> pa.Table:
        a = t.column(left_alias).to_pylist()
        b = t.column(right_alias).to_pylist()
        d = levenshtein_batch(a, b)
        hit = d <= k
        return pa.table({
            left_alias: pa.array([x for x, h in zip(a, hit) if h], pa.string()),
            right_alias: pa.array([x for x, h in zip(b, hit) if h], pa.string()),
            "dist": pa.array(d[hit], pa.int64()),
        })

    return cands.map_batches(verify, batch_format="pyarrow")
