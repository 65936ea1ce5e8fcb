"""Debezium-envelope changelog source: CDC JSON events → the engine's flat
changelog schema.

The reference implements poll-based CDC (re-query rows with
``updated_at > watermark``, ``/root/reference/sync/sync_base.py:32-59``); the
industry-standard push-based alternative is a Debezium connector tailing the
source WAL and emitting one JSON envelope per change::

    {"payload": {"before": {...}|null, "after": {...}|null,
                 "op": "c"|"u"|"d"|"r", "ts_ms": 1712...,
                 "source": {"lsn": 123456, "table": "..."}}}

This adapter maps that envelope (the public Debezium ``v2`` event shape) to
the engine's flat changelog rows — key/payload columns + ``op``
(upsert/delete) + ``lsn`` — fully vectorized: Arrow's JSON reader parses the
nested structs, ``pc.struct_field`` projects them, and delete rows take
their key (and any present payload) from ``before``. Downstream it is a
normal changelog: ``apply_epoch_dataset`` → LWW/partial/aggregate merge.

Envelope variants handled:
- ``payload``-wrapped (connector default) or bare (``unwrap`` SMT upstream);
- ``op``: c(reate)/r(ead snapshot)/u(pdate) → upsert, d(elete) → delete;
- LSN: ``source.lsn`` when present, else ``source.sequence``/``ts_ms``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def _field_or_null(struct_col, name: str, n: int):
    typ = struct_col.type
    if pa.types.is_struct(typ) and typ.get_field_index(name) >= 0:
        return pc.struct_field(struct_col, name)
    return pa.nulls(n, pa.null())


def _flatten_envelope(t: pa.Table, *, order: str, op_col: str,
                      columns: list[str] | None) -> pa.Table:
    n = t.num_rows
    payload = t.column("payload") if "payload" in t.column_names else None
    if payload is not None and pa.types.is_struct(payload.type):
        get = lambda name: _field_or_null(payload, name, n)  # noqa: E731
    else:
        get = lambda name: (t.column(name) if name in t.column_names  # noqa: E731
                            else pa.nulls(n, pa.null()))
    op_raw = get("op")
    if n and op_raw.null_count == n:
        raise ValueError("debezium source: no 'op' field in envelope")
    is_del = pc.equal(op_raw, pa.scalar("d"))
    is_del = pc.fill_null(is_del, False)
    before, after = get("before"), get("after")
    src = get("source")
    # LSN: source.lsn > source.sequence > ts_ms (in that order of fidelity)
    lsn = _field_or_null(src, "lsn", n) if not pa.types.is_null(src.type) \
        else pa.nulls(n, pa.null())
    if lsn.null_count == n:
        seq = (_field_or_null(src, "sequence", n)
               if not pa.types.is_null(src.type) else pa.nulls(n, pa.null()))
        lsn = seq if seq.null_count < n else get("ts_ms")
    if n and lsn.null_count == n:
        raise ValueError(
            "debezium source: no LSN (source.lsn / source.sequence / ts_ms)")
    lsn = pc.cast(lsn, pa.int64())

    # row image: after for upserts, before for deletes
    names: list[str] = []
    for img in (after, before):
        if pa.types.is_struct(img.type):
            names.extend(f.name for f in img.type if f.name not in names)
    if columns is not None:
        names = [c for c in names if c in columns]
    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    for name in names:
        a = _field_or_null(after, name, n)
        b = _field_or_null(before, name, n)
        if pa.types.is_null(a.type) and pa.types.is_null(b.type):
            cols[name] = pa.nulls(n, pa.null())
            continue
        if pa.types.is_null(a.type):
            a = pa.nulls(n, b.type)
        if pa.types.is_null(b.type):
            b = pa.nulls(n, a.type)
        cols[name] = pc.if_else(is_del, b, a)
    cols[op_col] = pc.if_else(is_del, pa.scalar("delete"), pa.scalar("upsert"))
    cols[order] = lsn
    return pa.table(cols)


def read_debezium_jsonl(
    path,
    *,
    order: str = "lsn",
    op_col: str = "op",
    columns: list[str] | None = None,
    **read_kwargs,
) -> rd.Dataset:
    """Read Debezium-envelope JSONL shards into a flat changelog Dataset
    ready for ``apply_epoch_dataset``. ``columns`` prunes the payload
    columns kept (the key and LSN/op always survive — include the key in
    ``columns`` when pruning)."""
    ds = rd.read_json(path, **read_kwargs)
    return ds.map_batches(
        _flatten_envelope,
        fn_kwargs={"order": order, "op_col": op_col, "columns": columns},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
