"""Global-ordering and frame-bounded window operators.

The per-key window family (``with_previous``, ``running_sum``,
``session_counts`` in :mod:`.relational`) co-locates each key with one
groupby shuffle. The operators here cover the OTHER two window shapes:

- **Global ordering** (``row_number() over (order by ...)``, ``ntile``,
  exact ``percentile_disc``): one distributed sort, then per-block offsets
  are assigned from a prefix sum over per-block row COUNTS — the driver
  sees one summary row per block (O(blocks), never O(rows)), and each
  block finds its own offset by its first row's key. This is the textbook
  cluster implementation; it requires ``order_by`` to order rows uniquely
  (include a tiebreak id), which is also what makes the result
  deterministic. Streaming execution does not guarantee block arrival
  order, so the prefix sum orders block summaries by their first-row KEY
  VALUE (the blocks are globally sorted, so first keys are totally
  ordered) — never by arrival.
- **Frame-bounded per-key windows** (``rows between N preceding and
  current row``): the usual groupby co-location, frame math vectorized
  inside the group.
- **SCD Type-2 interval compression**: the CDC-warehouse "history table"
  shape — consecutive equal values of a tracked column collapse into
  [valid_from, valid_to) validity intervals per key. The reference keeps
  only latest state (LWW upsert, /root/reference/tasks.py); warehouses fed
  by the same changelogs almost always ALSO want the history — this
  operator derives it from the ordered event stream.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _first_tuple(t: pa.Table, order_by: list[str]) -> tuple:
    vals = tuple(t.column(c)[0].as_py() for c in order_by)
    if any(v is None or (isinstance(v, float) and v != v) for v in vals):
        raise ValueError(
            "order_by columns must be non-null and non-NaN for global "
            f"window assignment (got first-row key {vals})")
    return vals


class _Rev:
    """Inverts comparison for descending sort-key columns."""
    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, o):
        return o.v < self.v


def _sorted_with_block_offsets(
    ds: rd.Dataset, order_by: list[str], descending: bool | list[bool] = False,
):
    """Sort ``ds`` by ``order_by`` and return (sorted_ds, offsets_ref,
    total): ``offsets_ref`` is a broadcast dict mapping each block's
    first-row key tuple → that block's global row offset. Driver state is
    one tiny summary row per block. Raises if two blocks share a first-row
    key (i.e. ``order_by`` is not a unique ordering)."""
    desc = [descending] * len(order_by) if isinstance(descending, bool) \
        else list(descending)
    sorted_ds = ds.sort(order_by, descending=descending).materialize()

    def _summ(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__first": pa.array([], pa.binary()),
                             "__n": pa.array([], pa.int64())})
        return pa.table({
            "__first": pa.array([pickle.dumps(_first_tuple(t, order_by))],
                                pa.binary()),
            "__n": pa.array([t.num_rows], pa.int64())})

    rows = sorted_ds.map_batches(
        _summ, batch_format="pyarrow", batch_size=None).take_all()
    summ = [(pickle.loads(r["__first"]), r["__n"]) for r in rows]
    offsets, acc = _prefix_offsets(summ, desc)
    return sorted_ds, ray.put(offsets), acc


def _prefix_offsets(summ: list[tuple[tuple, int]], desc: list[bool]):
    """Prefix-sum block offsets from (first_key_tuple, n_rows) summaries,
    ordered by key value. Raises when two blocks share a first key — the
    signal that ``order_by`` does not uniquely order rows."""
    summ = sorted(summ, key=lambda fn: tuple(
        _Rev(v) if d else v for v, d in zip(fn[0], desc)))
    offsets: dict[tuple, int] = {}
    acc = 0
    for first, n in summ:
        if first in offsets:
            raise ValueError(
                "order_by does not uniquely order rows (duplicate key tuple "
                f"{first} starts two blocks); add a tiebreak column")
        offsets[first] = acc
        acc += n
    return offsets, acc


def global_row_number(
    ds: rd.Dataset,
    order_by: list[str],
    out_col: str = "row_number",
    descending: bool | list[bool] = False,
) -> rd.Dataset:
    """``row_number() over (order by ...)`` (1-based), distributed: one
    sort, O(blocks) driver metadata, offset assignment inside each block.
    ``order_by`` must order rows uniquely (non-null, non-NaN)."""
    sorted_ds, offsets_ref, _ = _sorted_with_block_offsets(
        ds, order_by, descending)

    def _assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        base = ray.get(offsets_ref)[_first_tuple(t, order_by)]
        return t.append_column(
            out_col, pa.array(np.arange(base + 1, base + 1 + t.num_rows)))

    return sorted_ds.map_batches(_assign, batch_format="pyarrow",
                                 batch_size=None)


def ntile(
    ds: rd.Dataset,
    n: int,
    order_by: list[str],
    out_col: str = "tile",
) -> rd.Dataset:
    """``ntile(n) over (order by ...)`` with SQL semantics: the first
    ``total % n`` tiles get ``total // n + 1`` rows, the rest
    ``total // n``. Same distributed shape as :func:`global_row_number`."""
    sorted_ds, offsets_ref, total = _sorted_with_block_offsets(ds, order_by)
    q, r = divmod(total, n)
    boundary = r * (q + 1)

    def _assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        rn0 = np.arange(t.num_rows, dtype=np.int64) \
            + ray.get(offsets_ref)[_first_tuple(t, order_by)]
        if q == 0:  # fewer rows than tiles: one row per tile
            tile = rn0 + 1
        else:
            tile = np.where(rn0 < boundary, rn0 // (q + 1),
                            r + (rn0 - boundary) // q) + 1
        return t.append_column(out_col, pa.array(tile))

    return sorted_ds.map_batches(_assign, batch_format="pyarrow",
                                 batch_size=None)


def _last_tuple(t: pa.Table, order_by: list[str]) -> tuple:
    return tuple(t.column(c)[-1].as_py() for c in order_by)


def _key_changes(t: pa.Table, order_by: list[str]) -> np.ndarray:
    """Boolean[n-1]: row i+1 starts a new key run (any order column
    differs from row i). Rows are already sorted."""
    from vlm_eden_dataset_etl_ray.functions import runfold as rf

    neq = np.zeros(max(0, t.num_rows - 1), dtype=bool)
    for c in order_by:
        neq |= rf.key_change_array(t.column(c))
    return neq


def global_dense_rank(
    ds: rd.Dataset,
    order_by: list[str],
    out_col: str = "dense_rank",
    descending: bool | list[bool] = False,
) -> rd.Dataset:
    """``dense_rank() over (order by ...)`` — the DUPLICATE-tolerant member
    of the global-ordering family (row_number demands a unique ordering;
    dense_rank exists precisely because keys repeat). Same distributed
    shape: one sort, O(blocks) driver metadata, in-block assignment.

    Per sorted block the driver sees (first_key, last_key, n_distinct);
    blocks order by (first, last) — globally sorted blocks have
    non-overlapping key ranges except at the endpoints, so that tuple
    recovers the true block sequence even when several blocks share a
    first key. The rank of block i's first key is then
    ``r_i = r_{i-1} + D_{i-1} − (first_i == last_{i-1})`` (a key spanning
    a block boundary must not count twice), and the driver broadcasts
    first_key → rank — well-defined under collisions because dense rank
    is a function of the key VALUE. In-block ranks are a vectorized
    run-boundary cumsum. Keys must be non-null/non-NaN (same contract as
    the rest of the family)."""
    desc = [descending] * len(order_by) if isinstance(descending, bool) \
        else list(descending)
    sorted_ds = ds.sort(order_by, descending=descending).materialize()

    def _summ(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__first": pa.array([], pa.binary()),
                             "__last": pa.array([], pa.binary()),
                             "__d": pa.array([], pa.int64())})
        d = 1 + int(_key_changes(t, order_by).sum())
        return pa.table({
            "__first": pa.array([pickle.dumps(_first_tuple(t, order_by))]),
            "__last": pa.array([pickle.dumps(_last_tuple(t, order_by))]),
            "__d": pa.array([d], pa.int64())})

    rows = sorted_ds.map_batches(
        _summ, batch_format="pyarrow", batch_size=None).take_all()
    summ = [(pickle.loads(r["__first"]), pickle.loads(r["__last"]), int(r["__d"]))
            for r in rows]

    def _order_key(entry):
        first, last, _ = entry
        return tuple(_Rev(v) if d else v for v, d in zip(first, desc)) + \
            tuple(_Rev(v) if d else v for v, d in zip(last, desc))

    summ.sort(key=_order_key)
    ranks: dict[tuple, int] = {}
    r = 1
    prev_last = None
    for first, last, d in summ:
        if prev_last is not None and first == prev_last:
            r -= 1  # key spans the block boundary: don't count it twice
        ranks.setdefault(first, r)
        r += d
        prev_last = last
    ranks_ref = ray.put(ranks)

    def _assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        base = ray.get(ranks_ref)[_first_tuple(t, order_by)]
        local = np.concatenate([[0], np.cumsum(_key_changes(t, order_by))])
        return t.append_column(out_col, pa.array(base + local, pa.int64()))

    return sorted_ds.map_batches(_assign, batch_format="pyarrow",
                                 batch_size=None)


def global_rank(
    ds: rd.Dataset,
    order_by: list[str],
    out_col: str = "rank",
    descending: bool | list[bool] = False,
    percent: bool = False,
) -> rd.Dataset:
    """``rank() over (order by ...)`` (gaps after ties); ``percent=True``
    yields ``percent_rank()`` = (rank−1)/(N−1) instead. Same one-sort
    O(blocks)-driver shape as :func:`global_dense_rank`.

    rank(key) = 1 + global row index where the key's RUN starts, so per
    block the driver additionally tracks the trailing-run length: a block
    whose first key continues the previous block's last run inherits that
    run's start instead of its own row offset. Within a block, each row's
    rank is the block row offset + its run-start index (vectorized
    max-accumulate), except the first run, which uses the driver-computed
    carry-over. Two blocks can share a first key only when every earlier
    one is single-key (globally sorted ranges overlap at endpoints only),
    so the per-first-key maps stay well-defined: the rank of a first key
    is a function of the key, and the row-offset map's last writer is the
    only block with more than one run."""
    desc = [descending] * len(order_by) if isinstance(descending, bool) \
        else list(descending)
    sorted_ds = ds.sort(order_by, descending=descending).materialize()

    def _summ(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__first": pa.array([], pa.binary()),
                             "__last": pa.array([], pa.binary()),
                             "__n": pa.array([], pa.int64()),
                             "__tail": pa.array([], pa.int64())})
        changes = _key_changes(t, order_by)
        starts = np.nonzero(changes)[0]
        tail = t.num_rows - (int(starts[-1]) + 1) if len(starts) else t.num_rows
        return pa.table({
            "__first": pa.array([pickle.dumps(_first_tuple(t, order_by))]),
            "__last": pa.array([pickle.dumps(_last_tuple(t, order_by))]),
            "__n": pa.array([t.num_rows], pa.int64()),
            "__tail": pa.array([tail], pa.int64())})

    rows = sorted_ds.map_batches(
        _summ, batch_format="pyarrow", batch_size=None).take_all()
    summ = [(pickle.loads(r["__first"]), pickle.loads(r["__last"]),
             int(r["__n"]), int(r["__tail"])) for r in rows]

    def _order_key(entry):
        first, last = entry[0], entry[1]
        return tuple(_Rev(v) if d else v for v, d in zip(first, desc)) + \
            tuple(_Rev(v) if d else v for v, d in zip(last, desc))

    summ.sort(key=_order_key)
    first_rank: dict[tuple, int] = {}
    block_offset: dict[tuple, int] = {}
    rows_before = 0
    prev_last = None
    run_start = 0  # global row index where prev_last's run began
    total = sum(n for _, _, n, _ in summ)
    for first, last, n, tail in summ:
        merges = prev_last is not None and first == prev_last
        first_rank.setdefault(first, (run_start if merges else rows_before) + 1)
        block_offset[first] = rows_before  # last writer = the multi-run block
        if not (merges and first == last):
            run_start = rows_before + n - tail
        rows_before += n
        prev_last = last
    maps_ref = ray.put((first_rank, block_offset))

    def _assign(t: pa.Table) -> pa.Table:
        typ = pa.float64() if percent else pa.int64()
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], typ))
        franks, offsets = ray.get(maps_ref)
        first = _first_tuple(t, order_by)
        n = t.num_rows
        is_start = np.concatenate([[True], _key_changes(t, order_by)])
        local_start = np.maximum.accumulate(
            np.where(is_start, np.arange(n, dtype=np.int64), 0))
        rank = offsets[first] + local_start + 1
        rank[local_start == 0] = franks[first]  # first run may carry over
        if percent:
            out = (rank - 1) / max(total - 1, 1)
            return t.append_column(out_col, pa.array(out.astype(np.float64)))
        return t.append_column(out_col, pa.array(rank, pa.int64()))

    return sorted_ds.map_batches(_assign, batch_format="pyarrow",
                                 batch_size=None)


def global_cume_dist(
    ds: rd.Dataset,
    order_by: list[str],
    out_col: str = "cume_dist",
    descending: bool | list[bool] = False,
    presorted: bool = False,
) -> rd.Dataset:
    """``cume_dist() over (order by ...)`` = (# rows ≤ current key) / N —
    the run-END counterpart of :func:`global_rank` (which uses run
    starts). Summaries additionally carry the HEAD-run length; a reverse
    pass over the ordered block summaries resolves the end of any run
    that spans forward across block boundaries (a run chains while a
    block is single-key and the next block starts with the same key).
    Both broadcast maps are keyed by first-row key and stay well-defined
    under collisions: the first-run end is a function of the key value,
    and the row-offset map's last writer is the only multi-run block.
    ``presorted=True`` skips the sort when the input already carries this
    exact ordering (e.g. the output of :func:`global_rank` on the same
    keys) — the summary pass orders blocks by key VALUE, so correctness
    never depends on block arrival order."""
    desc = [descending] * len(order_by) if isinstance(descending, bool) \
        else list(descending)
    sorted_ds = (ds if presorted
                 else ds.sort(order_by, descending=descending)).materialize()

    def _summ(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__first": pa.array([], pa.binary()),
                             "__last": pa.array([], pa.binary()),
                             "__n": pa.array([], pa.int64()),
                             "__head": pa.array([], pa.int64())})
        changes = _key_changes(t, order_by)
        starts = np.nonzero(changes)[0]
        head = int(starts[0]) + 1 if len(starts) else t.num_rows
        return pa.table({
            "__first": pa.array([pickle.dumps(_first_tuple(t, order_by))]),
            "__last": pa.array([pickle.dumps(_last_tuple(t, order_by))]),
            "__n": pa.array([t.num_rows], pa.int64()),
            "__head": pa.array([head], pa.int64())})

    rows = sorted_ds.map_batches(
        _summ, batch_format="pyarrow", batch_size=None).take_all()
    summ = [(pickle.loads(r["__first"]), pickle.loads(r["__last"]),
             int(r["__n"]), int(r["__head"])) for r in rows]

    def _order_key(entry):
        first, last = entry[0], entry[1]
        return tuple(_Rev(v) if d else v for v, d in zip(first, desc)) + \
            tuple(_Rev(v) if d else v for v, d in zip(last, desc))

    summ.sort(key=_order_key)
    total = sum(n for _, _, n, _ in summ)
    k = len(summ)
    rows_before = [0] * k
    for i in range(1, k):
        rows_before[i] = rows_before[i - 1] + summ[i - 1][2]
    # reverse pass: e[i] = global END (exclusive) of the run containing
    # block i's FIRST row; chains forward while block i is single-key and
    # block i+1 starts with the same key
    e = [0] * k
    for i in range(k - 1, -1, -1):
        first, last, n, head = summ[i]
        if head == n and i + 1 < k and summ[i + 1][0] == first:
            e[i] = e[i + 1]
        else:
            e[i] = rows_before[i] + head
    first_end: dict[tuple, int] = {}
    last_end: dict[tuple, int] = {}
    block_offset: dict[tuple, int] = {}
    for i, (first, last, n, head) in enumerate(summ):
        first_end.setdefault(first, e[i])
        block_offset[first] = rows_before[i]  # last writer = multi-run block
        merges_next = i + 1 < k and summ[i + 1][0] == last
        last_end[first] = e[i + 1] if merges_next else rows_before[i] + n
    maps_ref = ray.put((first_end, last_end, block_offset, total))

    def _assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.float64()))
        fe, le, offs, tot = ray.get(maps_ref)
        first = _first_tuple(t, order_by)
        n = t.num_rows
        changes = _key_changes(t, order_by)
        # local run END (exclusive) per row: rows at a boundary know their
        # end; a reversed min-accumulate propagates it back through the run
        is_end = np.concatenate([changes, [True]])
        nxt = np.where(is_end, np.arange(1, n + 1, dtype=np.int64), n + 1)
        rev = nxt[::-1].copy()
        np.minimum.accumulate(rev, out=rev)
        local_end = rev[::-1]
        end = offs[first] + local_end
        end[local_end == local_end[0]] = fe[first]  # first run may chain on
        last_run = (local_end == n) & (local_end != local_end[0])
        end[last_run] = le[first]                   # last run may chain on
        out = end.astype(np.float64) / tot
        return t.append_column(out_col, pa.array(out, pa.float64()))

    return sorted_ds.map_batches(_assign, batch_format="pyarrow",
                                 batch_size=None)


def exact_quantiles(
    ds: rd.Dataset,
    col: str,
    qs: list[float],
    tiebreak: str,
) -> pa.Table:
    """Exact discrete quantiles (``quantile_disc`` / ``percentile_disc``
    semantics: the smallest value whose cumulative share reaches ``q``,
    i.e. 0-based index ``ceil(q * total) - 1`` — verified bit-identical to
    DuckDB). One distributed sort; only ``len(qs)`` rows ever reach the
    driver. ``tiebreak`` makes the sort deterministic (the selected VALUE
    is tie-insensitive, but unique ordering is required by the offset
    assignment). Returns a tiny in-memory table (q, value)."""
    keys = [col, tiebreak]
    sorted_ds, offsets_ref, total = _sorted_with_block_offsets(
        ds.select_columns(keys), keys)
    targets = {max(1, int(np.ceil(q * total))): q for q in qs}
    tset = pa.array(sorted(targets), pa.int64())

    def _pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__rn", pa.array([], pa.int64()))
        base = ray.get(offsets_ref)[_first_tuple(t, keys)]
        t = t.append_column(
            "__rn", pa.array(np.arange(base + 1, base + 1 + t.num_rows)))
        return t.filter(pc.is_in(t.column("__rn"), value_set=tset))

    picked = sorted_ds.map_batches(_pick, batch_format="pyarrow",
                                   batch_size=None).take_all()
    by_rn = {r["__rn"]: r[col] for r in picked}
    out_q, out_v = [], []
    for idx, q in sorted(targets.items()):
        out_q.append(q)
        out_v.append(by_rn[idx])
    return pa.table({"q": pa.array(out_q, pa.float64()), "value": out_v})


def scd2_compress(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    valid_from_col: str | None = None,
    out_from: str = "valid_from",
    out_to: str = "valid_to",
) -> rd.Dataset:
    """Slowly-Changing-Dimension Type-2 history: per ``key``, collapse
    consecutive runs of equal ``value_col`` (in ``order_cols`` order) into
    one row per run with ``[valid_from, valid_to)`` validity — ``valid_to``
    null for the current run. ``valid_from_col`` (default: first of
    ``order_cols``) supplies the interval endpoints. One groupby shuffle
    co-locates each key; run detection is vectorized inside the group.
    ``order_cols`` must order rows uniquely within a key."""
    ts_col = valid_from_col or order_cols[0]

    def _per_group(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[(c, "ascending") for c in order_cols])
        g = g.take(idx)
        v = g.column(value_col).combine_chunks()
        neq = pc.fill_null(
            pc.not_equal(v.slice(1), v.slice(0, max(0, len(v) - 1))), True)
        starts = np.concatenate(
            [[0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1]
        ).astype(np.int64)
        ts = g.column(ts_col)
        starts_arr = pa.array(starts)
        vto = ts.take(pa.array(
            np.append(starts[1:], -1),
            mask=np.append(np.zeros(len(starts) - 1, bool), True)))
        return pa.table({
            key: g.column(key).take(starts_arr),
            value_col: v.take(starts_arr),
            out_from: ts.take(starts_arr),
            out_to: vto,
        })

    return ds.groupby(key).map_groups(_per_group, batch_format="pyarrow")


def rolling_min(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    alias: str = "rolling_min",
) -> rd.Dataset:
    """Frame-bounded window: ``min(value) over (partition by key order by
    ... rows between window-1 preceding and current row)``. min is
    insensitive to float addition order, so the result is bit-exact
    against any SQL engine. One groupby shuffle; the sliding min is
    vectorized inside the group."""

    def _per_group(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[(c, "ascending") for c in order_cols])
        g = g.take(idx)
        vals = g.column(value_col).to_numpy(zero_copy_only=False)
        rmin = pd.Series(vals).rolling(window, min_periods=1).min().to_numpy()
        return g.append_column(alias, pa.array(rmin, pa.float64()))

    return ds.groupby(key).map_groups(_per_group, batch_format="pyarrow")


def trailing_time_count(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    window_s: int,
    alias: str = "n_trailing",
) -> rd.Dataset:
    """Time-RANGE window frame: ``count(*) over (partition by key order by
    ts RANGE BETWEEN interval window_s seconds PRECEDING AND CURRENT ROW)``
    — the trailing-rate metric (events per key in the last hour) that a
    rows-based frame cannot express. SQL RANGE frames include all PEERS of
    the current row (equal timestamps), which the two binary searches below
    reproduce exactly.

    One groupby shuffle co-locates each key; inside the group the frame
    math is two vectorized ``searchsorted`` passes over the sorted
    timestamps — O(n log n) per group, no per-row loop."""

    def _per_group(g: pa.Table) -> pa.Table:
        # normalize the physical unit before integer window arithmetic
        ts = g.column(ts_col).cast(pa.timestamp("us"))
        order = pc.sort_indices(ts)
        g = g.take(order)
        us = g.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        lo = np.searchsorted(us, us - window_s * 1_000_000, side="left")
        hi = np.searchsorted(us, us, side="right")
        return g.append_column(alias, pa.array(hi - lo, pa.int64()))

    return ds.groupby(key).map_groups(_per_group, batch_format="pyarrow")


def ewm_mean(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    alpha: float,
    alias: str = "ema",
) -> rd.Dataset:
    """Per-key exponential moving average (``pandas ewm(alpha,
    adjust=False)`` semantics: ``ema_t = α·v_t + (1−α)·ema_{t−1}``,
    seeded with the first value) — the streaming-feature smoother that a
    rows/range frame cannot express in SQL.

    One groupby shuffle co-locates each key; in-group the sequential
    recurrence is evaluated SEGMENT-WISE with the closed form
    ``ema_t = (1−α)^t·ema_0 + α·Σ v_j·(1−α)^{t−j}`` — a vectorized
    cumulative sum per 256-row segment (the bounded exponent keeps
    ``(1−α)^{-j}`` inside double range for any α ≥ 1e-3), carrying one
    scalar across segments. O(n) work, O(n/256) python iterations.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    beta = 1.0 - alpha
    # segment length bounded so β^{-(seg−1)} stays inside double range
    seg_len = 256 if beta == 0.0 else max(
        1, min(256, int(300.0 / -np.log10(beta)) if beta < 1.0 else 256))

    def _per_group(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(c, "ascending") for c in order_cols])
        g = g.take(idx)
        v = g.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = len(v)
        out = np.empty(n, dtype=np.float64)
        if n:
            out[0] = carry = v[0]
        start = 1
        while start < n:
            seg = v[start:start + seg_len]
            m = len(seg)
            if beta == 0.0:  # α = 1: EMA is the value itself
                out[start:start + m] = seg
            else:
                # e_j = β^{j+1}·carry + α·Σ_{i≤j} β^{j−i}·seg_i, j=0..m−1
                w = beta ** np.arange(1, m + 1, dtype=np.float64)
                binv = beta ** -np.arange(m, dtype=np.float64)
                cs = np.cumsum(seg * binv)
                out[start:start + m] = w * carry + (alpha / beta) * w * cs
            carry = out[start + m - 1]
            start += m
        return g.append_column(alias, pa.array(np.round(out, 6)))

    return ds.groupby(key).map_groups(_per_group, batch_format="pyarrow")


def out_of_order_stats(
    ds: rd.Dataset,
    key: str,
    seq_col: str,
    ts_col: str,
) -> rd.Dataset:
    """Late-arrival audit for an out-of-order stream: per key, the total
    row count, how many rows arrived LATE (event time below the running
    max of everything already delivered — ``ts < max(ts) over (partition
    by key order by seq rows unbounded preceding .. 1 preceding)``), and
    the worst skew in seconds (how far behind the high-watermark a late
    row was). This is the metric that sizes a watermark/allowed-lateness
    policy for windowed aggregation over a CDC feed.

    One groupby shuffle co-locates each key; in-group the running max is
    one vectorized ``np.maximum.accumulate`` over delivery order.
    """

    def _per_group(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[(seq_col, "ascending")])
        g = g.take(idx)
        # normalize the physical unit before integer arithmetic
        us = g.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        runmax = np.maximum.accumulate(us)
        prev = np.empty_like(runmax)
        prev[0] = np.iinfo(np.int64).min
        prev[1:] = runmax[:-1]
        late = us < prev
        skew = float((prev[late] - us[late]).max() / 1e6) if late.any() else 0.0
        return pa.table({
            key: g.column(key).slice(0, 1),
            "n": pa.array([g.num_rows], pa.int64()),
            "n_late": pa.array([int(late.sum())], pa.int64()),
            "max_skew_s": pa.array([round(skew, 3)], pa.float64()),
        })

    return ds.select_columns([key, seq_col, ts_col]).groupby(key).map_groups(
        _per_group, batch_format="pyarrow")


def winsorize(
    ds: rd.Dataset,
    col: str,
    lo_q: float,
    hi_q: float,
    tiebreak: str,
    alias: str | None = None,
) -> rd.Dataset:
    """Clip a column to its [lo_q, hi_q] exact discrete quantiles — the
    outlier-taming step before numeric features feed a model. One
    distributed sort computes both cut points (:func:`exact_quantiles`,
    ``quantile_disc`` semantics); the clip itself is a streamed
    element-wise min/max, no second shuffle and no float arithmetic, so
    results hash-match a SQL twin exactly."""
    q = exact_quantiles(ds, col, [lo_q, hi_q], tiebreak)
    by_q = dict(zip(q.column("q").to_pylist(), q.column("value").to_pylist()))
    lo, hi = by_q[lo_q], by_q[hi_q]
    out = alias or col

    def _clip(t: pa.Table) -> pa.Table:
        c = t.column(col)
        clipped = pc.min_element_wise(
            pc.max_element_wise(c, pa.scalar(lo, c.type)),
            pa.scalar(hi, c.type))
        if out in t.column_names:
            return t.set_column(t.column_names.index(out), out, clipped)
        return t.append_column(out, clipped)

    return ds.map_batches(_clip, batch_format="pyarrow", zero_copy_batch=True)


def debounce(
    ds: rd.Dataset,
    keys: list[str],
    ts_col: str,
    gap_seconds: float,
    order_cols: list[str] | None = None,
) -> rd.Dataset:
    """Time-windowed dedup (debounce): within each ``keys`` partition, drop
    a row when it falls within ``gap_seconds`` of the ROW BEFORE it in
    ``order_cols`` order — the ``lag(ts)``-predicate shape (each row is
    judged against its immediate predecessor, kept or not), NOT the greedy
    keep-anchored chain. The CDC duplicate-suppression step for at-least-
    once feeds that re-deliver the same logical event in a burst
    (reference re-delivers via Celery retries, /root/reference/tasks.py).

    One groupby shuffle co-locates each key partition; the in-group sort +
    diff + filter is vectorized. Timestamps normalize to microseconds
    before the gap arithmetic (s/ms/ns inputs behave identically). Include
    a tiebreak id in ``order_cols`` for determinism; ties (diff 0) are
    dropped.
    """
    order_cols = order_cols or [ts_col]

    def _per_group(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(c, "ascending") for c in order_cols])
        g = g.take(idx)
        us = (g.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        keep = np.concatenate(
            [[True], np.diff(us) > gap_seconds * 1_000_000])
        return g.filter(pa.array(keep))

    return ds.groupby(keys).map_groups(_per_group, batch_format="pyarrow")


def rolling_median(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    alias: str = "rolling_median",
) -> rd.Dataset:
    """Frame-bounded robust window: ``median(value) over (partition by key
    order by ... rows between window-1 preceding and current row)`` — the
    outlier-resistant smoother monitoring pipelines run over noisy
    per-key series (a rolling MEAN chases spikes; the median ignores
    them). Median of an odd/even frame is order-statistics, not a float
    sum, so interpolated results match a SQL twin to double rounding.
    Same shape as :func:`rolling_min`: one groupby shuffle, vectorized
    pandas rolling inside the group."""

    def _per_group(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[(c, "ascending") for c in order_cols])
        g = g.take(idx)
        vals = g.column(value_col).to_numpy(zero_copy_only=False)
        rmed = pd.Series(vals).rolling(window, min_periods=1).median().to_numpy()
        return g.append_column(alias, pa.array(np.round(rmed, 4), pa.float64()))

    return ds.groupby(key).map_groups(_per_group, batch_format="pyarrow")


def grouped_first_last(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    cols: list[str],
    nth: int | None = None,
) -> rd.Dataset:
    """Per key, the ``first_<c>`` / ``last_<c>`` (and optionally
    ``nth_<c>``) values of ``cols`` in ``order_cols`` order — the SQL
    ``first_value / last_value / nth_value`` window family collapsed to
    one row per key.

    Scale shape: mergeable per-batch pre-reduce — each batch keeps only
    its per-key ``max(nth, 1)`` smallest rows plus the single largest, so
    at most nth+1 rows per key per batch cross the exchange (payload
    never shuffles in full); the final per-group pick is a vectorized
    take. ``order_cols`` should order rows uniquely for determinism;
    nulls order last ascending (Arrow convention).
    """
    k = max(int(nth or 1), 1)
    need = list(dict.fromkeys([key] + order_cols + cols))
    asc = [(c, "ascending") for c in order_cols]

    def partial(t: pa.Table) -> pa.Table:
        t = t.select(need)
        n = t.num_rows
        if n <= 1:
            return t
        idx = pc.sort_indices(t, sort_keys=[(key, "ascending")] + asc)
        t = t.take(idx)
        codes = pc.dictionary_encode(
            t.column(key).combine_chunks()).indices.to_numpy(
            zero_copy_only=False)
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        np.not_equal(codes[1:], codes[:-1], out=new_run[1:])
        run_start = np.maximum.accumulate(
            np.where(new_run, np.arange(n), 0))
        pos = np.arange(n) - run_start
        last = np.empty(n, dtype=bool)
        last[-1] = True
        np.not_equal(codes[1:], codes[:-1], out=last[:-1])
        return t.filter(pa.array((pos < k) | last))

    pre = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)

    def final(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=asc)
        g = g.take(idx)
        n = g.num_rows
        out = {key: g.column(key).slice(0, 1)}
        for c in cols:
            col = g.column(c)
            out[f"first_{c}"] = col.slice(0, 1)
            out[f"last_{c}"] = col.slice(n - 1, 1)
            if nth is not None:
                out[f"nth_{c}"] = (col.slice(nth - 1, 1) if n >= nth
                                   else pa.nulls(1, col.type))
        return pa.table(out)

    return pre.groupby(key).map_groups(final, batch_format="pyarrow")


def interpolated_quantiles(
    ds: rd.Dataset,
    col: str,
    qs: list[float],
    tiebreak: str,
) -> pa.Table:
    """Exact INTERPOLATED quantiles (``quantile_cont`` /
    ``percentile_cont`` semantics: position h = q·(N−1) 0-based, linear
    interpolation between the bracketing order statistics — the numpy
    default and DuckDB's convention). Same machinery as
    :func:`exact_quantiles`: one distributed sort, only the ≤ 2·len(qs)
    bracketing rows reach the driver. Returns (q, value: float64)."""
    keys = [col, tiebreak]
    sorted_ds, offsets_ref, total = _sorted_with_block_offsets(
        ds.select_columns(keys), keys)
    if total == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    brackets: dict[float, tuple[int, int, float]] = {}
    need: set[int] = set()
    for q in qs:
        h = q * (total - 1)
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        brackets[q] = (lo + 1, hi + 1, h - lo)  # 1-based rns + fraction
        need.update((lo + 1, hi + 1))
    tset = pa.array(sorted(need), pa.int64())

    def _pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__rn", pa.array([], pa.int64()))
        base = ray.get(offsets_ref)[_first_tuple(t, keys)]
        t = t.append_column(
            "__rn", pa.array(np.arange(base + 1, base + 1 + t.num_rows)))
        return t.filter(pc.is_in(t.column("__rn"), value_set=tset))

    picked = sorted_ds.map_batches(_pick, batch_format="pyarrow",
                                   batch_size=None).take_all()
    by_rn = {r["__rn"]: float(r[col]) for r in picked}
    out_q = [float(q) for q in qs]
    out_v = []
    for q in qs:
        lo_rn, hi_rn, frac = brackets[q]
        vlo, vhi = by_rn[lo_rn], by_rn[hi_rn]
        out_v.append(vlo + frac * (vhi - vlo))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})


def quantile_bucket(
    ds: rd.Dataset,
    col: str,
    n_buckets: int,
    tiebreak: str,
    out_col: str = "bucket",
) -> rd.Dataset:
    """Equi-depth bucketing: label every row with its quantile bucket
    (1-based, ``n_buckets`` of them) — the scale alternative to
    :func:`ntile` when only the BUCKET LABEL is needed: ntile globally
    sorts the payload; this computes the ``n_buckets − 1`` exact cut
    points (percentile_disc at i/n) with the one-column sort machinery,
    broadcasts them, and labels each batch with one ``searchsorted`` —
    the payload never shuffles.

    Bucket of v = 1 + #{cuts < v} (cut c_i = quantile_disc(i/n)), which
    reproduces ntile's sizes exactly when values are distinct; ties share
    a bucket (they must — the label is a pure function of the value), so
    with heavy ties bucket populations differ from ntile's balanced
    split. ``tiebreak`` only makes the internal sort deterministic.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = (exact_quantiles(ds, col, qs, tiebreak).column("value")
            .to_numpy(zero_copy_only=False) if qs else np.array([]))
    cuts_ref = ray.put(np.asarray(cuts, dtype=np.float64))

    def label(t: pa.Table) -> pa.Table:
        c = ray.get(cuts_ref)
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(c, v, side="left") + 1
        return t.append_column(out_col, pa.array(b.astype(np.int64)))

    return ds.map_batches(label, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Partitioned ranking windows: row_number() / rank() / dense_rank()
# OVER (PARTITION BY keys ORDER BY order_by) — the per-partition members of
# the global-ordering family above, with the same distributed shape as
# relational.session_ids: ONE sort by (keys..., order...), O(blocks) driver
# metadata chained into per-block carries, vectorized in-block assignment.
# No per-key Python work anywhere — 10^6+ partitions cost the same per row
# as 10^2. (The reference's analogs are Postgres window calls, e.g. the
# top-1-per-key DISTINCT ON of queries/fact_studies.py:36-60.)
# ---------------------------------------------------------------------------


def keyed_rank_ids(
    ds: rd.Dataset,
    keys: list[str],
    order_by: list[str],
    kind: str = "row_number",
    out_col: str | None = None,
    descending: bool | list[bool] = False,
) -> rd.Dataset:
    """``kind`` ∈ {"row_number", "rank", "dense_rank"} within each ``keys``
    partition, ordered by ``order_by`` (``descending`` applies to the order
    columns only; partitions are unordered sets). 1-based, SQL semantics:
    rank repeats with gaps on ties, dense_rank repeats without gaps,
    row_number is unique (arbitrary among exact ties — same as any SQL
    engine without a full tiebreak).

    Carry chain (same technique as session_ids): per sorted block the
    driver sees (first sort tuple, first/last key tuple, first/last order
    tuple, rows / distinct order values / trailing-run geometry of the
    trailing key run) and chains them into, per block, the rows already
    emitted for the continuing key, the dense count so far, and the rank
    of the order-run in progress at the boundary. If duplicate FULL sort
    tuples span 3+ blocks the carry map collapses them (first writer
    wins) — include a tiebreak id in ``order_by`` when exact boundary
    behavior under full duplicates matters."""
    if kind not in ("row_number", "rank", "dense_rank"):
        raise ValueError(f"unknown kind {kind!r}")
    out_col = out_col or kind
    from vlm_eden_dataset_etl_ray.functions import runfold as rf

    order_by = [c for c in order_by if c not in keys]
    sort_cols = list(keys) + list(order_by)
    desc = [descending] * len(order_by) if isinstance(descending, bool) \
        else list(descending)
    sort_desc = [False] * len(keys) + desc
    sorted_ds = ds.sort(sort_cols, descending=sort_desc).materialize()

    def _tup(t: pa.Table, cols: list[str], i: int) -> bytes:
        return pickle.dumps(tuple(t.column(c)[i].as_py() for c in cols))

    def _flags(t: pa.Table):
        """(key-change flags, order-change flags) length n; index j says
        row j differs from row j-1 (index 0 always True)."""
        n = t.num_rows
        kchg = np.zeros(n, dtype=bool)
        ochg = np.zeros(n, dtype=bool)
        kchg[0] = ochg[0] = True
        for c in keys:
            kchg[1:] |= rf.key_change_array(t.column(c))
        ochg |= kchg
        for c in order_by:
            ochg[1:] |= rf.key_change_array(t.column(c))
        return kchg, ochg

    def _summ(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__first": pa.array([], pa.binary())})
        kchg, ochg = _flags(t)
        n = t.num_rows
        krs = np.flatnonzero(kchg)          # key-run starts
        ors = np.flatnonzero(ochg)          # order-run starts
        tail_key_start = int(krs[-1])
        tail_order_start = int(ors[-1])
        tail_dense = int(ochg[tail_key_start:].sum())
        return pa.table({
            "__first": pa.array([_tup(t, sort_cols, 0)], pa.binary()),
            "__fk": pa.array([_tup(t, keys, 0)], pa.binary()),
            "__lk": pa.array([_tup(t, keys, -1)], pa.binary()),
            "__fo": pa.array([_tup(t, order_by, 0)], pa.binary()),
            "__lo": pa.array([_tup(t, order_by, -1)], pa.binary()),
            "__n": pa.array([n], pa.int64()),
            "__single_key": pa.array([len(krs) == 1], pa.bool_()),
            "__single_order": pa.array([len(ors) == 1], pa.bool_()),
            "__tail_n": pa.array([n - tail_key_start], pa.int64()),
            "__tail_dense": pa.array([tail_dense], pa.int64()),
            "__tail_rank_start": pa.array(
                [tail_order_start - tail_key_start], pa.int64()),
        })

    rows = [r for r in sorted_ds.map_batches(
        _summ, batch_format="pyarrow", batch_size=None).take_all()
        if "__fk" in r]

    def _chain_key(r):
        # match the distributed sort: nulls last, descending order columns
        # inverted (_Rev) so the driver chains blocks in true output order
        tup = pickle.loads(r["__first"])
        out = []
        for v, d in zip(tup, sort_desc):
            val = 0 if v is None else v
            out.append((v is None, _Rev(val) if d else val))
        return tuple(out)

    summ = sorted(rows, key=_chain_key)

    # chain: R rows emitted for the continuing key, D distinct order
    # values so far, RS rank of the order-run in progress, LO its tuple
    carries: dict[bytes, tuple[int, int, int, bool]] = {}
    pend_key, R, D, RS, LO = object(), 0, 0, 0, object()
    for s in summ:
        if s["__fk"] == pend_key:
            same = s["__fo"] == LO
            carries.setdefault(s["__first"], (R, D - int(same), RS, same))
            cr, cd = R, D - int(same)
        else:
            same = False
            carries.setdefault(s["__first"], (0, 0, 0, False))
            cr, cd = 0, 0
        single = s["__single_key"]
        base_r = cr if single else 0
        base_d = cd if single else 0
        if single and s["__single_order"] and same:
            RS_new = RS                      # order run continues across
        else:
            RS_new = base_r + s["__tail_rank_start"] + 1
        R = base_r + s["__tail_n"]
        D = base_d + s["__tail_dense"]
        RS = RS_new
        pend_key, LO = s["__lk"], s["__lo"]
    carries_ref = ray.put(carries)

    def _assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        cr, cd, rs, same = ray.get(carries_ref)[_tup(t, sort_cols, 0)]
        kchg, ochg = _flags(t)
        n = t.num_rows
        idx = np.arange(n, dtype=np.int64)
        key_start = np.maximum.accumulate(np.where(kchg, idx, 0))
        first_run = key_start == 0
        if kind == "row_number":
            v = idx - key_start + 1
            v[first_run] += cr
        elif kind == "dense_rank":
            d = np.cumsum(ochg.astype(np.int64))
            v = d - (d[key_start] - ochg[key_start].astype(np.int64))
            v[first_run] += cd
        else:  # rank
            order_start = np.maximum.accumulate(np.where(ochg, idx, 0))
            v = order_start - key_start + 1
            v[first_run] += cr
            if same:
                v[first_run & (order_start == 0)] = rs
        return t.append_column(out_col, pa.array(v, pa.int64()))

    return sorted_ds.map_batches(_assign, batch_format="pyarrow",
                                 batch_size=None)
