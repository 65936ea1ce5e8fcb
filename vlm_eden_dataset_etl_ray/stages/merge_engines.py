"""Pluggable CDC merge engines: row-LWW, column-level partial-update, and
per-column aggregation — all expressed as associative, commutative folds
over Arrow tables so one algorithm serves every reduce site (per-batch
pre-reduce, per-partition stage-2 reduce, merge-on-read, compaction).

The reference implements exactly one merge discipline — row-level
last-writer-wins via ``INSERT … ON CONFLICT (key) DO UPDATE SET
col = excluded.col`` (``/root/reference/queries/fact_studies.py:37-84``),
with a handful of insert-only columns carved out of the UPDATE clause.
Real changelogs need more: CDC feeds that carry only the columns that
changed (column-level LWW — the ``partial-update`` merge engine of
lakehouse formats), and pre-aggregated sinks where each key's row is a
running aggregate over its change stream (the ``aggregation`` engine).
This module adds both, from scratch, on the engine's existing two-stage
salted-reduce/merge-on-read substrate.

Representation
--------------

Each engine defines a *state row* per key that is (a) closed under its own
merge (folding state rows yields a state row) and (b) derivable from raw
change events (``to_partial_state`` / ``to_agg_state`` — both pass
already-state tables through unchanged). State rows keep the table's
``op`` and ``order`` columns populated (so watermark accounting, tombstone
counting and change feeds keep working unchanged) plus engine-internal
columns, all ``__``-prefixed so readers can strip them:

- ``partial_update``: one ``__seq__<col>`` int64 per value column — the
  half-LSN *tick* of that column's last writer (upsert at LSN L writes at
  2L, a delete at 2L+1, so same-LSN ties resolve to the delete
  deterministically; null = never written) — plus ``__del_lsn`` (max
  delete tick) and ``__live_lsn`` (max upsert tick). A delete *resets*
  the row: it stamps every column's seq with its tick (value null), so
  only later writes survive. The row is live iff ``__live_lsn >
  __del_lsn``. Per-column seqs are what keep the fold associative under
  out-of-order delivery ACROSS epochs: a late-arriving old event can
  never clobber a newer column, no matter how the events were batched.
- ``aggregate``: the value columns hold partial accumulators (``count``
  normalizes to 0/1 so re-folding is a plain sum; ``mean``/``var_*`` hold
  the running sum with ``__cnt__<col>``/``__sq__<col>`` twins),
  ``last_non_null`` / ``first_non_null`` columns carry a
  ``__seq__<col>``; ``__agg_state`` marks the row as folded.

Null semantics (documented, matches lakehouse partial-update engines): a
null column in an upsert means "not touched", so explicit set-to-NULL is
not expressible; every upsert asserts row EXISTENCE, so an all-null upsert
after a delete recreates the row with null columns; a delete and an upsert
at the same LSN resolve to the delete.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vlm_eden_dataset_etl_ray.spec import TableSpec
from vlm_eden_dataset_etl_ray.stages import lww

ENGINE_LWW = "lww"
ENGINE_PARTIAL = "partial_update"
ENGINE_AGGREGATE = "aggregate"

DEL_COL = "__del_lsn"
#: max LSN of any upsert that wrote ≥1 column — row liveness is
#: ``__live_lsn > __del_lsn``. Stored explicitly (not derived from the seq
#: columns) so a PROJECTED merge — reading a subset of value columns —
#: still resolves tombstones exactly.
LIVE_COL = "__live_lsn"
AGG_STATE_COL = "__agg_state"
SEQ_PREFIX = "__seq__"
#: composite-accumulator twins for the aggregate engine's mean/variance
#: (the value column holds the running SUM; finalize derives the stat)
CNT_PREFIX = "__cnt__"
SQ_PREFIX = "__sq__"

_I64MIN = np.iinfo(np.int64).min

#: aggregation functions accepted by the aggregate engine.
#: mean/var_pop/var_samp keep (sum, count[, sum-of-squares]) twins and
#: derive the statistic at read time — plain-sum accumulators merge
#: associatively at any epoch split; the sumsq formulation trades the
#: numerical robustness of Welford/Chan for mergeability (use
#: functions/stats.py's exact distributed moments for analytical sweeps
#: over adversarially-scaled data).
AGG_FNS = (
    "sum", "count", "product", "min", "max",
    "bool_or", "bool_and", "last_non_null", "first_non_null",
    "mean", "var_pop", "var_samp",
)

#: aggs that keep a __cnt__ twin (and, for variance, a __sq__ twin)
COMPOSITE_FNS = ("mean", "var_pop", "var_samp")


def is_internal(name: str) -> bool:
    return name.startswith("__")


def twin_prefixes(spec: TableSpec, col: str) -> tuple[str, ...]:
    """Prefixes of the engine-internal twin columns that travel with
    ``col`` through projected reads and evolution maps — exactly the
    twins the engine stores: per-column seqs for partial_update; seq for
    order-based aggs; cnt(+sq) for composite aggs. Empty otherwise."""
    if spec.merge_engine == ENGINE_PARTIAL:
        return (SEQ_PREFIX,)
    if spec.merge_engine == ENGINE_AGGREGATE:
        fn = dict(spec.aggregations).get(col)
        if fn in ("last_non_null", "first_non_null"):
            return (SEQ_PREFIX,)
        if fn == "mean":
            return (CNT_PREFIX,)
        if fn in ("var_pop", "var_samp"):
            return (CNT_PREFIX, SQ_PREFIX)
    return ()


def internal_twins(spec: TableSpec, col: str) -> tuple[str, ...]:
    return tuple(p + col for p in twin_prefixes(spec, col))


def strip_internal(t: pa.Table) -> pa.Table:
    keep = [c for c in t.column_names if not is_internal(c)]
    return t.select(keep) if len(keep) != t.num_columns else t


def value_columns(t: pa.Table, spec: TableSpec) -> list[str]:
    """Payload columns the engine merges (everything but key/order/op/pid/
    envelope/internal)."""
    skip = {spec.key, spec.order, spec.op_col, "pid", *spec.envelope}
    return [c for c in t.column_names if c not in skip and not is_internal(c)]


def _i64(col: pa.ChunkedArray | pa.Array, fill: int = _I64MIN) -> np.ndarray:
    """Column → int64 numpy with nulls replaced by ``fill``."""
    a = pc.fill_null(pc.cast(col, pa.int64()), fill)
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    return a.to_numpy(zero_copy_only=False)


def _run_starts(codes: np.ndarray) -> np.ndarray:
    """Start offsets of each equal-key run (input sorted by key)."""
    n = len(codes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    first = np.empty(n, dtype=bool)
    first[0] = True
    np.not_equal(codes[1:], codes[:-1], out=first[1:])
    return np.flatnonzero(first)


def _key_codes(t: pa.Table, key: str) -> np.ndarray:
    keys = t.column(key)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    # fill null codes before to_numpy: a nullable index column would
    # round-trip through float64 (NaN per null, lossy over 2^53)
    return pc.fill_null(
        pc.cast(pc.dictionary_encode(keys).indices, pa.int64()), -1
    ).to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# partial-update engine
# ---------------------------------------------------------------------------


def _handle_deletes(t: pa.Table, spec: TableSpec) -> tuple[pa.Table, pa.Array]:
    """Apply spec.on_delete to a RAW event table; returns (table, is_delete
    mask aligned with it). 'reset' keeps deletes (the engine's tombstone
    reset), 'ignore' drops them, 'error' raises."""
    if spec.op_col not in t.column_names:
        return t, pa.array(np.zeros(t.num_rows, dtype=bool))
    is_del = pc.equal(t.column(spec.op_col), pa.scalar(spec.delete_op))
    is_del = pc.fill_null(is_del, False)
    if spec.on_delete == "error":
        if pc.any(is_del).as_py():
            raise ValueError(
                f"table {spec.name!r} (merge_engine={spec.merge_engine}) "
                f"received delete events but on_delete='error'"
            )
        return t, is_del
    if spec.on_delete == "ignore":
        if pc.any(is_del).as_py():
            t = t.filter(pc.invert(is_del))
            is_del = pa.array(np.zeros(t.num_rows, dtype=bool))
        return t, is_del
    return t, is_del  # "reset"


def to_partial_state(t: pa.Table, spec: TableSpec) -> pa.Table:
    """Normalize raw change events to partial-update state rows (1:1, not
    yet folded). Already-state tables pass through."""
    if DEL_COL in t.column_names:
        return t
    t, is_del = _handle_deletes(t, spec)
    if isinstance(is_del, pa.ChunkedArray):
        is_del = is_del.combine_chunks()
    lsn = pc.cast(t.column(spec.order), pa.int64())
    # seqs live in HALF-LSN ticks: an upsert at LSN L writes at 2L, a
    # delete at 2L+1 — so a delete and an upsert at the SAME LSN resolve
    # to the delete deterministically in every comparison (column winner,
    # liveness), whatever the physical row order. Keeps the fold
    # associative under ties. The user-visible `order` column stays raw.
    tick = pc.multiply(lsn, pa.scalar(2, pa.int64()))
    del_tick = pc.add(tick, pa.scalar(1, pa.int64()))
    vcols = value_columns(t, spec)
    cols: dict[str, pa.ChunkedArray | pa.Array] = {spec.key: t.column(spec.key)}
    nulls64 = pa.nulls(t.num_rows, pa.int64())
    for c in vcols:
        val = t.column(c)
        # delete → value null, seq = delete tick (kills the column);
        # upsert → seq = tick where value present, else null (not touched)
        cols[c] = pc.if_else(is_del, pa.nulls(t.num_rows, val.type), val)
        cols[SEQ_PREFIX + c] = pc.if_else(
            is_del, del_tick,
            pc.if_else(pc.is_valid(val), tick, nulls64))
    cols[DEL_COL] = pc.if_else(is_del, del_tick, nulls64)
    # every upsert asserts row existence (even all-null payloads: an
    # INSERT of (key, nulls) after a delete recreates the row)
    cols[LIVE_COL] = pc.if_else(pc.invert(is_del), tick, nulls64)
    cols[spec.order] = lsn
    cols[spec.op_col] = pc.if_else(
        is_del, pa.scalar(spec.delete_op), pa.scalar("upsert"))
    return pa.table(cols)


def _winner_last(s: np.ndarray, codes: np.ndarray, starts: np.ndarray,
                 n: int) -> np.ndarray:
    """Per-run index of the max-``s`` row (ties: later row wins; absent
    rows carry _I64MIN). Input arrays are in key-sorted row order."""
    order = np.lexsort((s, codes))
    ends = np.append(starts[1:], n) - 1
    return order[ends]


def fold_partial(t: pa.Table, spec: TableSpec) -> pa.Table:
    """Associative fold: one partial-update state row per key. Input may be
    raw events, state rows, or a mix of folds — output is a state table
    sorted by key."""
    t = to_partial_state(t, spec)
    if t.num_rows == 0:
        return t
    t = t.sort_by([(spec.key, "ascending"), (spec.order, "ascending")])
    n = t.num_rows
    codes = _key_codes(t, spec.key)
    starts = _run_starts(codes)
    n_runs = len(starts)
    take_first = pa.array(starts)
    out: dict[str, pa.ChunkedArray | pa.Array] = {
        spec.key: t.column(spec.key).take(take_first)
    }
    vcols = value_columns(t, spec)
    for c in vcols:
        s = _i64(t.column(SEQ_PREFIX + c))
        win = _winner_last(s, codes, starts, n)
        sw = s[win]
        vals = t.column(c).take(pa.array(win))
        seq_arr = pa.array(
            np.where(sw == _I64MIN, 0, sw), pa.int64(),
            mask=(sw == _I64MIN))
        out[c] = vals
        out[SEQ_PREFIX + c] = seq_arr
    dels = _i64(t.column(DEL_COL))
    del_out = np.maximum.reduceat(dels, starts)
    out[DEL_COL] = pa.array(
        np.where(del_out == _I64MIN, 0, del_out), pa.int64(),
        mask=(del_out == _I64MIN))
    lives = _i64(t.column(LIVE_COL))
    live_out = np.maximum.reduceat(lives, starts)
    out[LIVE_COL] = pa.array(
        np.where(live_out == _I64MIN, 0, live_out), pa.int64(),
        mask=(live_out == _I64MIN))
    lsns = _i64(t.column(spec.order))
    order_out = np.maximum.reduceat(lsns, starts)
    out[spec.order] = pa.array(order_out, pa.int64())
    # live iff some column was written strictly after the last delete
    # (same-LSN ties resolve to the delete); computed from the explicit
    # liveness watermark so PROJECTED merges stay exact
    dead = (del_out != _I64MIN) & (live_out <= del_out)
    op = np.where(dead, spec.delete_op, "upsert")
    out[spec.op_col] = pa.array(op)
    return pa.table(out)


# ---------------------------------------------------------------------------
# aggregate engine
# ---------------------------------------------------------------------------


def _agg_map(spec: TableSpec) -> dict[str, str]:
    m = dict(spec.aggregations)
    for c, fn in m.items():
        if fn not in AGG_FNS:
            raise ValueError(f"unknown aggregation {fn!r} for column {c!r}")
    return m


def to_agg_state(t: pa.Table, spec: TableSpec) -> pa.Table:
    """Normalize raw change events to aggregate state rows (1:1)."""
    if AGG_STATE_COL in t.column_names:
        return t
    # aggregates are not invertible: only "ignore" is meaningful; any other
    # policy (incl. the partial-update default "reset") refuses deletes
    if spec.on_delete != "ignore" and spec.op_col in t.column_names:
        is_del = pc.fill_null(
            pc.equal(t.column(spec.op_col), pa.scalar(spec.delete_op)), False)
        if pc.any(is_del).as_py():
            raise ValueError(
                f"aggregate table {spec.name!r} received delete events; "
                "set on_delete='ignore' to drop them (aggregates cannot be "
                "retracted)")
    t, _ = _handle_deletes(t, spec)
    aggs = _agg_map(spec)
    lsn = pc.cast(t.column(spec.order), pa.int64())
    cols: dict[str, pa.ChunkedArray | pa.Array] = {spec.key: t.column(spec.key)}
    for c in value_columns(t, spec):
        fn = aggs.get(c)
        if fn is None:
            raise ValueError(
                f"aggregate table {spec.name!r}: no aggregation declared for "
                f"value column {c!r} (spec.aggregations)")
        val = t.column(c)
        if fn == "count":
            cols[c] = pc.cast(pc.is_valid(val), pa.int64())
        elif fn in COMPOSITE_FNS:
            v = pc.cast(val, pa.float64())
            cols[c] = v  # running SUM lives in the value column
            cols[CNT_PREFIX + c] = pc.cast(pc.is_valid(val), pa.int64())
            if fn != "mean":
                cols[SQ_PREFIX + c] = pc.multiply(v, v)
        else:
            cols[c] = val
        if fn in ("last_non_null", "first_non_null"):
            cols[SEQ_PREFIX + c] = pc.if_else(
                pc.is_valid(val), lsn, pa.nulls(t.num_rows, pa.int64()))
    cols[spec.order] = lsn
    cols[spec.op_col] = pa.array(np.repeat("upsert", t.num_rows))
    cols[AGG_STATE_COL] = pa.array(np.ones(t.num_rows, dtype=np.int8))
    return pa.table(cols)


_FILL = {"sum": 0, "count": 0, "product": 1,
         "min": np.iinfo(np.int64).max, "max": _I64MIN}
_FILL_F = {"sum": 0.0, "count": 0.0, "product": 1.0,
           "min": np.inf, "max": -np.inf}


def _reduceat_agg(vals: pa.ChunkedArray, fn: str, starts: np.ndarray,
                  codes: np.ndarray) -> pa.Array:
    """Grouped reduce of one accumulator column via numpy reduceat (input in
    key-sorted row order). SQL null semantics: nulls ignored; all-null
    group → null (count: 0)."""
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    typ = vals.type
    valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
    nvalid = np.add.reduceat(valid.astype(np.int64), starts)
    mask = nvalid == 0
    if fn in ("bool_or", "bool_and"):
        x = pc.fill_null(pc.cast(vals, pa.int8()),
                         0 if fn == "bool_or" else 1)
        x = x.to_numpy(zero_copy_only=False)
        red = (np.maximum if fn == "bool_or" else np.minimum).reduceat(x, starts)
        return pa.array(red.astype(bool), pa.bool_(), mask=mask)
    numeric = (pa.types.is_floating(typ) or pa.types.is_integer(typ)
               or pa.types.is_temporal(typ))
    if not numeric:
        if fn not in ("min", "max"):
            raise ValueError(f"aggregation {fn!r} needs a numeric column, "
                             f"got {typ}")
        # string (or other orderable non-numeric) min/max: rank values once
        # (nulls placed so they always lose), then take the per-run winner
        n = len(valid)
        rank = pc.rank(vals, sort_keys="ascending",
                       null_placement="at_end" if fn == "min" else "at_start")
        r = rank.to_numpy(zero_copy_only=False)
        order = np.lexsort((r, codes))
        win = order[starts] if fn == "min" else order[
            np.append(starts[1:], n) - 1]
        out = vals.take(pa.array(win))
        if mask.any():
            out = pc.if_else(pa.array(mask), pa.nulls(len(win), typ), out)
        return out
    if pa.types.is_floating(typ):
        x = vals.to_numpy(zero_copy_only=False)  # nulls → nan
        x = np.where(valid, x, _FILL_F[fn])
    else:
        x = _i64(vals, fill=int(_FILL[fn]))
    op = {"sum": np.add, "count": np.add, "product": np.multiply,
          "min": np.minimum, "max": np.maximum}[fn]
    red = op.reduceat(x, starts)
    if fn == "count":
        return pa.array(red, pa.int64())
    if pa.types.is_floating(typ):
        return pa.array(red, typ, mask=mask)
    if pa.types.is_temporal(typ):
        if fn not in ("min", "max"):
            raise ValueError(f"aggregation {fn!r} is not defined for "
                             f"temporal column type {typ}")
        return pc.cast(pa.array(red, pa.int64(), mask=mask), typ)
    # integers: min/max keep the input type, sum/product widen to int64
    out_t = typ if fn in ("min", "max") else pa.int64()
    return pc.cast(pa.array(red, pa.int64(), mask=mask), out_t)


def _lexsort_winner(t: pa.Table, c: str, fn: str, codes: np.ndarray,
                    starts: np.ndarray, n: int) -> tuple[pa.Array, pa.Array]:
    """Per-run last/first non-null value by seq; returns (values, seqs)."""
    s = _i64(t.column(SEQ_PREFIX + c))
    if fn == "first_non_null":
        # absent rows must lose: send them to +inf, take run FIRST
        s_key = np.where(s == _I64MIN, np.iinfo(np.int64).max, s)
        order = np.lexsort((s_key, codes))
        win = order[starts]
    else:
        win = _winner_last(s, codes, starts, n)
    sw = s[win]
    vals = t.column(c).take(pa.array(win))
    absent = sw == _I64MIN
    if absent.any():
        vals = pc.if_else(pa.array(absent), pa.nulls(len(win), vals.type), vals)
    seq = pa.array(np.where(absent, 0, sw), pa.int64(), mask=absent)
    return vals, seq


def fold_aggregate(t: pa.Table, spec: TableSpec) -> pa.Table:
    """Associative fold: one aggregate state row per key (mergeable
    partial accumulators), sorted by key."""
    t = to_agg_state(t, spec)
    if t.num_rows == 0:
        return t
    t = t.sort_by([(spec.key, "ascending")])
    n = t.num_rows
    codes = _key_codes(t, spec.key)
    starts = _run_starts(codes)
    aggs = _agg_map(spec)
    out: dict[str, pa.ChunkedArray | pa.Array] = {
        spec.key: t.column(spec.key).take(pa.array(starts))
    }
    for c in value_columns(t, spec):
        fn = aggs[c]
        if fn in ("last_non_null", "first_non_null"):
            vals, seq = _lexsort_winner(t, c, fn, codes, starts, n)
            out[c] = vals
            out[SEQ_PREFIX + c] = seq
        elif fn in COMPOSITE_FNS:
            out[c] = _reduceat_agg(t.column(c), "sum", starts, codes)
            out[CNT_PREFIX + c] = _reduceat_agg(
                t.column(CNT_PREFIX + c), "sum", starts, codes)
            if fn != "mean":
                out[SQ_PREFIX + c] = _reduceat_agg(
                    t.column(SQ_PREFIX + c), "sum", starts, codes)
        else:
            out[c] = _reduceat_agg(t.column(c), fn, starts, codes)
    lsns = _i64(t.column(spec.order))
    out[spec.order] = pa.array(np.maximum.reduceat(lsns, starts), pa.int64())
    n_runs = len(starts)
    out[spec.op_col] = pa.array(np.repeat("upsert", n_runs))
    out[AGG_STATE_COL] = pa.array(np.ones(n_runs, dtype=np.int8))
    return pa.table(out)


# ---------------------------------------------------------------------------
# dispatch — the four reduce sites call these
# ---------------------------------------------------------------------------


def pre_reduce(t: pa.Table, spec: TableSpec) -> pa.Table:
    """Stage-1 (per-batch, salted) reduce inside PrepareBatch."""
    eng = spec.merge_engine
    if eng == ENGINE_LWW:
        if spec.mode == "append":
            return t
        return lww.keep_last_writer(t, spec.key, spec.order)
    if eng == ENGINE_PARTIAL:
        return fold_partial(t, spec)
    if eng == ENGINE_AGGREGATE:
        return fold_aggregate(t, spec)
    raise ValueError(f"unknown merge_engine {eng!r}")


def merge_table(t: pa.Table, spec: TableSpec) -> pa.Table:
    """Full reduce (stage-2 / merge-on-read / compaction): one row per key."""
    eng = spec.merge_engine
    if eng == ENGINE_LWW:
        return lww.lww_merge(t, spec)
    if eng == ENGINE_PARTIAL:
        return fold_partial(t, spec)
    if eng == ENGINE_AGGREGATE:
        return fold_aggregate(t, spec)
    raise ValueError(f"unknown merge_engine {eng!r}")


def state_schema(target: pa.Schema, spec: TableSpec) -> pa.Schema:
    """Schema of the STATE rows the lake stores for ``target`` event rows —
    what apply records as the manifest write schema (the raw event schema
    would mistype fold outputs, e.g. a count accumulator is int64 whatever
    the counted column's type)."""
    eng = spec.merge_engine
    if eng == ENGINE_LWW:
        return target
    fields: list[pa.Field] = []
    aggs = _agg_map(spec) if eng == ENGINE_AGGREGATE else {}
    skip = {spec.key, spec.order, spec.op_col, "pid", *spec.envelope}
    have = set(target.names)  # input may ALREADY be state rows (rehash)
    for f in target:
        if f.name in spec.envelope:
            # the folds consume envelope columns at normalize (PrepareBatch
            # reads schema_ver BEFORE the pre-reduce) — recording them
            # would advertise an all-null column
            continue
        if f.name in skip or is_internal(f.name):
            fields.append(f)
            continue
        if eng == ENGINE_AGGREGATE:
            fn = aggs.get(f.name)
            if fn == "count":
                fields.append(pa.field(f.name, pa.int64()))
            elif fn in COMPOSITE_FNS:
                fields.append(pa.field(f.name, pa.float64()))
                if CNT_PREFIX + f.name not in have:
                    fields.append(pa.field(CNT_PREFIX + f.name, pa.int64()))
                if fn != "mean" and SQ_PREFIX + f.name not in have:
                    fields.append(pa.field(SQ_PREFIX + f.name, pa.float64()))
            elif fn in ("sum", "product") and pa.types.is_integer(f.type):
                fields.append(pa.field(f.name, pa.int64()))
            else:
                fields.append(f)
            if (fn in ("last_non_null", "first_non_null")
                    and SEQ_PREFIX + f.name not in have):
                fields.append(pa.field(SEQ_PREFIX + f.name, pa.int64()))
        else:
            fields.append(f)
            if SEQ_PREFIX + f.name not in have:
                fields.append(pa.field(SEQ_PREFIX + f.name, pa.int64()))
    names = {f.name for f in fields}
    if spec.order not in names:
        fields.append(pa.field(spec.order, pa.int64()))
    if spec.op_col not in names:
        fields.append(pa.field(spec.op_col, pa.string()))
    if eng == ENGINE_PARTIAL:
        fields.extend(pa.field(c, pa.int64())
                      for c in (DEL_COL, LIVE_COL) if c not in names)
    elif AGG_STATE_COL not in names:
        fields.append(pa.field(AGG_STATE_COL, pa.int8()))
    # order column is normalized to int64 by the folds
    fields = [pa.field(f.name, pa.int64()) if f.name == spec.order else f
              for f in fields]
    return pa.schema(fields)


def finalize_read(t: pa.Table, spec: TableSpec) -> pa.Table:
    """User-facing read: derive composite statistics (mean/variance from
    their sum/count/sumsq twins), then drop engine-internal columns (state
    stays intact in the lake files — compaction keeps it so future merges
    stay exact)."""
    if spec.merge_engine == ENGINE_LWW:
        return t
    if spec.merge_engine == ENGINE_AGGREGATE:
        for c, fn in spec.aggregations:
            if fn not in COMPOSITE_FNS or c not in t.column_names:
                continue
            if CNT_PREFIX + c not in t.column_names:
                # fail loudly: silently returning the raw running SUM
                # under the user-facing mean/variance name would be a
                # wrong answer, not a degraded one
                raise KeyError(
                    f"composite aggregate {c!r} ({fn}) projected without "
                    f"its {CNT_PREFIX + c!r} twin — include the twin in "
                    "the read (scan() does this automatically)")
            s = pc.cast(t.column(c), pa.float64())
            cnt = pc.cast(t.column(CNT_PREFIX + c), pa.float64())
            if fn == "mean":
                ok = pc.greater(cnt, pa.scalar(0.0))
                stat = pc.if_else(ok, pc.divide(
                    pc.fill_null(s, 0.0), pc.if_else(ok, cnt, pa.scalar(1.0))),
                    pa.nulls(t.num_rows, pa.float64()))
            else:
                sq = pc.cast(t.column(SQ_PREFIX + c), pa.float64())
                need = 0.0 if fn == "var_pop" else 1.0
                ok = pc.greater(cnt, pa.scalar(need))
                denom = pc.if_else(
                    ok, cnt if fn == "var_pop"
                    else pc.subtract(cnt, pa.scalar(1.0)), pa.scalar(1.0))
                safe_cnt = pc.if_else(ok, cnt, pa.scalar(1.0))
                num = pc.subtract(
                    pc.fill_null(sq, 0.0),
                    pc.divide(pc.multiply(pc.fill_null(s, 0.0),
                                          pc.fill_null(s, 0.0)), safe_cnt))
                # clamp tiny negative cancellation residue to 0
                num = pc.max_element_wise(num, pa.scalar(0.0))
                stat = pc.if_else(ok, pc.divide(num, denom),
                                  pa.nulls(t.num_rows, pa.float64()))
            t = t.set_column(t.column_names.index(c),
                             pa.field(c, pa.float64()), stat)
    return strip_internal(t)
