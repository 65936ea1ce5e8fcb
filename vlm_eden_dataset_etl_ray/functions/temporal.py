"""Temporal operators: row-dependent timezone-local date bucketing (T7).

The reference buckets every fact timestamp by the FACILITY's timezone —
``(ts AT TIME ZONE facility_timezone)::date`` ×4 derived columns
(``/root/reference/queries/fact_studies.py:101-106``): the timezone is a
row-dependent VALUE from a joined dimension, not a constant. Ray-Data
shape: the tz column is already on the row (broadcast dim lookup upstream);
per batch, group rows by the (few) distinct tz values, convert each group
with vectorized Arrow kernels (`assume_timezone` → instant-preserving cast
→ `local_timestamp` → `date32`), and scatter results back into row order.
Cost: O(n_distinct_tz) vectorized passes per batch, no shuffle, no Python
per row."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def local_date_array(ts: pa.ChunkedArray | pa.Array, tz: pa.ChunkedArray | pa.Array,
                     assume: str = "UTC") -> pa.Array:
    """date32 array: calendar date of each (naive-``assume``) timestamp in
    its row's timezone. Null tz or null ts → null date."""
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    if isinstance(tz, pa.ChunkedArray):
        tz = tz.combine_chunks()
    aware = pc.assume_timezone(ts, assume)
    unit = ts.type.unit
    days = np.zeros(len(ts), dtype=np.int32)  # days since epoch
    valid = np.zeros(len(ts), dtype=bool)
    enc = pc.dictionary_encode(tz)
    codes = enc.indices.to_numpy(zero_copy_only=False)
    for code, zone in enumerate(enc.dictionary.to_pylist()):
        if zone is None:
            continue
        idx = np.flatnonzero(codes == code)
        if idx.size == 0:
            continue
        sub = pc.take(aware, pa.array(idx))
        local = pc.local_timestamp(sub.cast(pa.timestamp(unit, tz=zone)))
        d = local.cast(pa.date32()).cast(pa.int32())
        sub_valid = pc.is_valid(d).to_numpy(zero_copy_only=False)
        dnp = pc.fill_null(d, 0).to_numpy(zero_copy_only=False).astype(np.int32)
        days[idx] = dnp
        valid[idx] = sub_valid
    return pa.array(days, type=pa.int32(), mask=~valid).cast(pa.date32())


def explode_hopping_windows(
    ds: rd.Dataset, ts_col: str, *, size_s: int, hop_s: int,
    alias: str = "window_start",
) -> rd.Dataset:
    """Assign each row to EVERY hopping (sliding) window containing it:
    windows of ``size_s`` seconds starting every ``hop_s`` seconds
    (``size_s`` must be a multiple of ``hop_s``; tumbling = size == hop).
    Each row is replicated size/hop times with its window-start timestamp —
    the streaming-window shape Ray Data lacks natively, expressed as a
    batch-expanding vectorized transform + whatever aggregate follows."""
    if size_s % hop_s:
        raise ValueError("size_s must be a multiple of hop_s")
    k = size_s // hop_s

    def _explode(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        if not pa.types.is_timestamp(ts.type):
            raise TypeError(f"{ts_col!r} must be a timestamp column, got {ts.type}")
        # normalize the PHYSICAL unit to microseconds before the integer hop
        # arithmetic — a timestamp[s]/[ms]/[ns] input would otherwise be
        # silently misbucketed by a factor of the unit ratio
        out_type = pa.timestamp("us", tz=ts.type.tz)
        us = ts.cast(out_type).cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = us // (hop_s * 1_000_000)  # hop index of each row
        idx = np.repeat(np.arange(len(us)), k)
        offs = np.tile(np.arange(k, dtype=np.int64), len(us))
        starts = (np.repeat(base, k) - offs) * (hop_s * 1_000_000)
        out = t.take(pa.array(idx))
        return out.append_column(alias, pa.array(starts).cast(out_type))

    return ds.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True)


def gap_fill_daily(
    ds: rd.Dataset,
    keys: list[str],
    ts_col: str,
    day_alias: str = "day",
    count_alias: str = "n_events",
    cardinality: str = "high",
) -> rd.Dataset:
    """Per-key daily date-spine densification: one output row for EVERY
    calendar day between each key's first and last event, with days that
    have no events filled with a zero count (the `generate_series` +
    LEFT JOIN gap-fill shape reporting layers need on top of the
    reference's A2-style daily count views).

    Scale shape: the data pass is :func:`grouped_count` over
    ``keys + [day]`` (mergeable per-batch partials — raw rows never
    shuffle), then one groupby on the collapsed counts co-locates each
    key and a vectorized fold scatters the observed counts into an
    ``np.arange`` spine. Output size is bounded by keys x date-range,
    never by event count; a key's spine must fit a worker (it is
    date-range-bounded, not data-bounded).
    """
    from .relational import grouped_count

    def _to_day(t: pa.Table) -> pa.Table:
        cols = {k: t.column(k) for k in keys}
        cols[day_alias] = t.column(ts_col).cast(pa.date32())
        return pa.table(cols)

    days = ds.select_columns(keys + [ts_col]).map_batches(
        _to_day, batch_format="pyarrow", zero_copy_batch=True)
    counts = grouped_count(days, keys + [day_alias], alias="__n",
                           cardinality=cardinality)

    def _fill(g: pa.Table) -> pa.Table:
        d = g.column(day_alias).cast(pa.int32()).to_numpy(zero_copy_only=False)
        n = g.column("__n").to_numpy(zero_copy_only=False)
        spine = np.arange(d.min(), d.max() + 1, dtype=np.int32)
        filled = np.zeros(len(spine), dtype=np.int64)
        filled[d - d.min()] = n
        out = {k: pa.repeat(g.column(k)[0], len(spine)) for k in keys}
        out[day_alias] = pa.array(spine, pa.int32()).cast(pa.date32())
        out[count_alias] = pa.array(filled, pa.int64())
        return pa.table(out)

    return counts.groupby(keys[0] if len(keys) == 1 else keys).map_groups(
        _fill, batch_format="pyarrow")


def with_local_date(
    ds: rd.Dataset, ts_col: str, tz_col: str, alias: str = "local_date",
    assume: str = "UTC",
) -> rd.Dataset:
    """Append ``alias`` = date32 of ``ts_col`` in the row's ``tz_col``
    timezone (reference T7, fact_studies.py:101-106)."""

    def _f(t: pa.Table) -> pa.Table:
        return t.append_column(alias, local_date_array(t.column(ts_col),
                                                       t.column(tz_col), assume))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)
