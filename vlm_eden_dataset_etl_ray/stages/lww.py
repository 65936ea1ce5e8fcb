"""Vectorized last-writer-wins reduction over Arrow tables.

This is the engine's re-expression of the reference's
``INSERT … ON CONFLICT (key) DO UPDATE SET col = excluded.col`` upserts
(``/root/reference/queries/fact_studies.py:37-84`` and siblings): instead of
row-at-a-time conflict resolution inside Postgres, the winner per key is the
max-LSN event, computed with one Arrow sort + one adjacency mask — an
associative/commutative reduce, so it can run per batch (pre-reduce), per
partition (final reduce) and at read time (merge-on-read) and compose.

First-writer-wins columns (the reference's insert-only conflict columns,
``queries/fact_studies.py:63-83`` — ``created_at`` / ``patient_full_name``
are NOT in the UPDATE clause) are patched from the min-LSN row per key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vlm_eden_dataset_etl_ray.spec import TableSpec


def _first_per_key_mask(keys: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Boolean mask selecting the first row of each run of equal keys
    (input must already be sorted by key)."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    # null codes filled before to_numpy (nullable index → float64 NaN)
    codes = pc.fill_null(
        pc.cast(pc.dictionary_encode(keys).indices, pa.int64()), -1
    ).to_numpy(zero_copy_only=False)
    first = np.empty(len(codes), dtype=bool)
    if len(codes):
        first[0] = True
        np.not_equal(codes[1:], codes[:-1], out=first[1:])
    return pa.array(first)


def keep_last_writer(t: pa.Table, key: str, order: str) -> pa.Table:
    """Max-``order`` row per ``key``; output sorted by key. Duplicate
    deliveries (same key+order, verbatim payload) collapse to one row."""
    if t.num_rows <= 1:
        return t
    t = t.sort_by([(key, "ascending"), (order, "descending")])
    return t.filter(_first_per_key_mask(t.column(key)))


def keep_first_writer(t: pa.Table, key: str, order: str) -> pa.Table:
    """Min-``order`` row per ``key``; output sorted by key."""
    if t.num_rows <= 1:
        return t
    t = t.sort_by([(key, "ascending"), (order, "ascending")])
    return t.filter(_first_per_key_mask(t.column(key)))


def lww_merge(t: pa.Table, spec: TableSpec) -> pa.Table:
    """Full LWW reduce of an event/row table: one row per key (its max-LSN
    version, tombstones included as rows), with ``spec.insert_only`` columns
    taken from the min-LSN version instead. Append-mode tables (K6) keep
    every row — the reduce is the identity."""
    if spec.mode == "append":
        return t
    winners = keep_last_writer(t, spec.key, spec.order)
    if spec.insert_only and t.num_rows > 1:
        firsts = keep_first_writer(t, spec.key, spec.order)
        # both are sorted by key with identical key sets → positional align
        for col in spec.insert_only:
            if col in winners.column_names:
                winners = winners.set_column(
                    winners.column_names.index(col), col, firsts.column(col)
                )
    return winners


def drop_tombstones(t: pa.Table, spec: TableSpec) -> pa.Table:
    """Remove delete markers — merge-on-read's final step (the reference's
    views filter ``not fs.deleted``, migrations/20230426_01_BozYM.sql:5-11).
    Append-mode tables have no tombstone semantics: every row is kept."""
    if spec.mode == "append" or spec.op_col not in t.column_names:
        return t
    return t.filter(pc.not_equal(t.column(spec.op_col), pa.scalar(spec.delete_op)))
