"""Arrow schema versions + unification (the engine's schema-evolution core).

The reference evolves its per-tenant DDL through yoyo migrations applied
under a lock before every ETL run (``/root/reference/cron_tasks.py:54-56``;
add-column ``migrations/20230510_01_V14Kk.sql``, ``20241204_01_xSnrF.sql``;
drop+re-add ``20241029_01_JnkId.sql``). Here schema versions are
``pyarrow.Schema`` values; evolution ops are *add-column* (null-filled for
old rows) and *widen* (safe integer up-cast, e.g. int32→int64), and readers
unify any old-version batch up to the latest schema at read/apply time.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Versioned schemas for the primary table (BASELINE.json input_hint) and its
# changelog envelope.
# ---------------------------------------------------------------------------

#: base payload, schema version 1
PAYLOAD_V1 = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

#: version 2 = add-column `quality: float64` + widen `n_tok` int32→int64
#: (the two evolution shapes the reference applies via migrations).
PAYLOAD_V2 = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int64()),
        pa.field("source", pa.string()),
        pa.field("quality", pa.float64()),
    ]
)

ENVELOPE = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("schema_ver", pa.int32()),
    ]
)

SCHEMA_VERSIONS: dict[int, pa.Schema] = {1: PAYLOAD_V1, 2: PAYLOAD_V2}


def changelog_schema(version: int) -> pa.Schema:
    """Envelope + payload schema for changelog events of ``version``."""
    payload = SCHEMA_VERSIONS[version]
    fields = list(ENVELOPE) + [f for f in payload]
    return pa.schema(fields)


# ---------------------------------------------------------------------------
# Unification: bring a table of an older schema version up to a target schema.
# ---------------------------------------------------------------------------

_SAFE_WIDEN: dict[tuple[str, str], bool] = {}


def _is_safe_widen(src: pa.DataType, dst: pa.DataType) -> bool:
    """True when ``src`` can be up-cast to ``dst`` losslessly (int widen,
    float32→float64, int→float64)."""
    if src.equals(dst):
        return True
    if pa.types.is_null(src):
        return True  # an all-null column casts to anything losslessly
    numeric_rank = {
        pa.int8(): 1,
        pa.int16(): 2,
        pa.int32(): 3,
        pa.int64(): 4,
    }
    if src in numeric_rank and dst in numeric_rank:
        return numeric_rank[src] <= numeric_rank[dst]
    if dst.equals(pa.float64()) and (src in numeric_rank or src.equals(pa.float32())):
        return True
    if pa.types.is_list(src) and pa.types.is_list(dst):
        return _is_safe_widen(src.value_type, dst.value_type)
    return False


def unify_table(table: pa.Table, target: pa.Schema, keep_extra: tuple[str, ...] = ()) -> pa.Table:
    """Up-cast ``table`` to ``target``: null-fill missing columns, widen
    narrower numeric columns. Columns in ``keep_extra`` (e.g. engine-internal
    ``pid``) are passed through untouched; other extras are dropped.

    Raises if a column would require a lossy cast — mirroring the reference's
    migration discipline where only additive / widening changes occur.
    """
    n = table.num_rows
    cols: list[pa.ChunkedArray] = []
    names: list[str] = []
    for f in target:
        if f.name in table.column_names:
            col = table.column(f.name)
            if not col.type.equals(f.type):
                if not _is_safe_widen(col.type, f.type):
                    raise ValueError(
                        f"lossy schema change for column {f.name!r}: {col.type} -> {f.type}"
                    )
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.chunked_array([pa.nulls(n, f.type)]))
        names.append(f.name)
    for extra in keep_extra:
        if extra in table.column_names and extra not in names:
            cols.append(table.column(extra))
            names.append(extra)
    return pa.table(cols, names=names)


def unify_schemas(versions: list[int]) -> pa.Schema:
    """Latest (max) registered schema covering all listed versions."""
    return SCHEMA_VERSIONS[max(versions)]
