"""Predicate DML on the lake: ``DELETE FROM … WHERE`` / ``UPDATE … SET … WHERE``.

Row-level DML is the lakehouse operation the reference performs ad hoc in
Postgres (hand-run ``DELETE``/``UPDATE`` statements alongside its synced
tables); a file-based lake needs it as a first-class engine operation —
GDPR erasure, backfill corrections, bulk re-labeling. Instead of rewriting
data files in place (Delta/Iceberg copy-on-write), the engine expresses DML
through its OWN CDC machinery:

    matched live rows  →  derived changelog  →  ``apply_epoch_dataset``
      DELETE: (key, order=watermark+1, op=delete) tombstones
      UPDATE: the full row re-emitted with the SET applied, order=watermark+1

which buys, by construction and with zero new merge logic:

- **O(matched) data movement** — a DELETE ships only keys (payload never
  moves); an UPDATE ships only the matched rows. Nothing is rewritten.
- **Exactly-once**: the op's epoch id is a content hash of (table, lake
  epoch, where, set) — re-running the same DML against the same snapshot
  is a no-op skip, and a crash mid-apply resumes like any epoch. The auto
  id is SNAPSHOT-scoped (SQL statement semantics: the same UPDATE run
  again after it committed is a new statement and applies again); pass a
  stable ``op_id`` when a retrying scheduler needs at-most-once across
  commits — a matching ledger entry then skips regardless of epoch.
- **Composition**: change_feed shows DML as ordinary upsert/delete events,
  time travel / clone / restore see pre-DML snapshots, compaction folds
  the tombstones away, IVM maintains views over it.

Predicates are either a list of ``(column, op, value)`` conjuncts
(op ∈ <, <=, >, >=, ==, !=) — deterministic (hashable into the epoch id)
and pushed into the scan's zone maps when the column has recorded file
stats — or an arbitrary ``pa.Table -> BooleanArray`` callable with a
caller-supplied ``op_id``. SQL null semantics: a NULL predicate does not
match (the row is kept by DELETE, skipped by UPDATE).

SET values are scalars, ``("add"|"mul", operand)`` tuples applied to the
column itself (hashable), or ``pa.Table -> Array`` callables (op_id
required). Columns declared ``insert_only`` in the spec keep first-writer
semantics at merge time, so SET on them is rejected loudly rather than
silently ignored.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vlm_eden_dataset_etl_ray import apply as apply_mod
from vlm_eden_dataset_etl_ray import lake as lake_mod
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray.spec import TOKENS_SPEC, TableSpec

_OPS = {
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
    "==": pc.equal,
    "!=": pc.not_equal,
}


def _compile_where(where):
    """Conjunct list → ``pa.Table -> BooleanArray`` (Kleene AND; nulls do
    not match, exactly like a SQL WHERE)."""

    def mask(t: pa.Table):
        m = None
        for col, op, val in where:
            cur = _OPS[op](t.column(col), pa.scalar(val))
            m = cur if m is None else pc.and_kleene(m, cur)
        return pc.fill_null(m, False)

    return mask


def _stats_ranges(where, schema: pa.Schema):
    """Zone-map pushdown: each numeric/temporal conjunct becomes an
    inclusive [lo, hi] file-stats range (strict ops keep their bound —
    file-level pruning with an inclusive edge is conservative-correct;
    the exact predicate still runs post-merge)."""
    ranges = []
    for col, op, val in where:
        idx = schema.get_field_index(col)
        if idx < 0:
            continue
        typ = schema.field(idx).type
        if not (pa.types.is_integer(typ) or pa.types.is_floating(typ)
                or pa.types.is_temporal(typ)):
            continue
        if pa.types.is_integer(typ):
            lo_s, hi_s = -(2 ** 63), 2 ** 63 - 1
        elif pa.types.is_floating(typ):
            lo_s, hi_s = float("-inf"), float("inf")
        else:  # temporal: bounds compare via the column's own type in scan
            continue
        if op == "==":
            ranges.append((col, val, val))
        elif op in ("<", "<="):
            ranges.append((col, lo_s, val))
        elif op in (">", ">="):
            ranges.append((col, val, hi_s))
    return ranges or None


def _global_watermark(m: mf.Manifest) -> int:
    return max((st.watermark_lsn for st in m.partitions.values()), default=-1)


def _op_id(kind: str, spec: TableSpec, epoch: int, where_desc, set_desc) -> str:
    payload = json.dumps(
        {"kind": kind, "table": spec.name, "epoch": epoch,
         "where": where_desc, "set": set_desc},
        sort_keys=True, default=str,
    )
    return "dml-" + hashlib.sha256(payload.encode()).hexdigest()[:16]


def _resolve_where(where, op_id, kind, spec, epoch, set_desc=""):
    """(mask_fn, epoch_id, pushdown_ranges_builder)."""
    if callable(where):
        if op_id is None:
            raise ValueError(
                f"{kind} with a callable predicate needs an explicit op_id "
                "(the epoch id must be deterministic for exactly-once)")
        return where, op_id, lambda schema: None
    where = [tuple(c) for c in where]
    for col, op, _ in where:
        if op not in _OPS:
            raise ValueError(f"unknown predicate op {op!r} on column {col!r}")
    eid = op_id or _op_id(kind, spec, epoch, where, set_desc)
    return _compile_where(where), eid, lambda schema: _stats_ranges(where, schema)


def delete_where(
    lake_dir: str,
    where,
    *,
    spec: TableSpec = TOKENS_SPEC,
    op_id: str | None = None,
) -> mf.Manifest:
    """DELETE FROM <lake> WHERE <where>.

    Scans only (key, order, predicate columns) of the live snapshot —
    zone-map-pruned when the predicate is a conjunct list over columns
    with recorded file stats — and applies one epoch of tombstones at
    ``lsn = global watermark + 1``. Payload columns never leave storage.
    A re-run against the unchanged snapshot is an exactly-once skip.
    """
    if spec.mode == "append":
        raise ValueError("delete_where needs keyed upsert semantics; "
                         "append-mode tables have no tombstones")
    if spec.merge_engine == "aggregate":
        # the aggregate engine refuses/ignores delete events (accumulators
        # are not invertible) — a tombstone epoch would silently no-op
        raise ValueError("delete_where is undefined for aggregate-merge "
                         "tables (aggregates cannot be retracted)")
    m = mf.latest(lake_dir)
    if m is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    mask, epoch_id, ranges_of = _resolve_where(where, op_id, "delete",
                                               spec, m.epoch)
    done = apply_mod._already_applied(lake_dir, epoch_id)
    if done is not None:
        return done

    where_cols = ([] if callable(where) else [c for c, _, _ in where])
    columns = list(dict.fromkeys([spec.key, spec.order] + where_cols))
    full = lake_mod._output_schema(m, spec, None, True)
    matched = lake_mod.scan(
        lake_dir, spec=spec, manifest=m, columns=columns, predicate=mask,
        stats_filter=ranges_of(full),
    )
    wm1 = _global_watermark(m) + 1
    order_type = full.field(spec.order).type

    def to_tombstones(t: pa.Table, *, key=spec.key, order=spec.order,
                      op_col=spec.op_col, dead=spec.delete_op,
                      lsn=wm1, otype=order_type) -> pa.Table:
        n = t.num_rows
        return pa.table({
            key: t.column(key),
            order: pa.array(np.full(n, lsn, dtype=np.int64)).cast(otype),
            op_col: pa.array([dead] * n, pa.string()),
        })

    ds = matched.map_batches(to_tombstones, batch_format="pyarrow",
                             zero_copy_batch=True)
    out_schema = pa.schema([
        (spec.key, full.field(spec.key).type),
        (spec.order, order_type),
        (spec.op_col, pa.string()),
    ])
    return apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                         spec=spec, target_schema=out_schema)


def update_where(
    lake_dir: str,
    where,
    set_exprs: dict,
    *,
    spec: TableSpec = TOKENS_SPEC,
    op_id: str | None = None,
) -> mf.Manifest:
    """UPDATE <lake> SET <set_exprs> WHERE <where>.

    Matched live rows are re-emitted in full with the SET applied and
    ``lsn = global watermark + 1`` — LWW makes them the winners; the old
    versions age out at the next compaction. Only matched rows move.
    """
    if spec.mode == "append":
        raise ValueError("update_where needs keyed upsert semantics")
    if spec.merge_engine == "aggregate":
        # re-emitting current accumulator rows would fold them in AGAIN
        raise ValueError("update_where is undefined for aggregate-merge "
                         "tables (a rewrite would double-count)")
    if not set_exprs:
        raise ValueError("update_where needs at least one SET column")
    bad = [c for c in set_exprs if c in spec.insert_only]
    if bad:
        raise ValueError(
            f"SET on insert_only (first-writer-wins) columns {bad} would be "
            "silently undone at merge time; remove them from the spec first")
    if any(c in (spec.key, spec.order, spec.op_col) for c in set_exprs):
        raise ValueError("SET may not target the key/order/op envelope")
    m = mf.latest(lake_dir)
    if m is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")

    set_desc: dict[str, object] = {}
    for col, v in set_exprs.items():
        if callable(v):
            if op_id is None:
                raise ValueError(
                    "update_where with callable SET values needs an "
                    "explicit op_id")
            set_desc[col] = "<callable>"
        elif isinstance(v, tuple):
            if len(v) != 2 or v[0] not in ("add", "mul"):
                raise ValueError(f"SET tuple for {col!r} must be "
                                 "('add'|'mul', operand)")
            set_desc[col] = list(v)
        else:
            set_desc[col] = v
    mask, epoch_id, ranges_of = _resolve_where(where, op_id, "update",
                                               spec, m.epoch, set_desc)
    done = apply_mod._already_applied(lake_dir, epoch_id)
    if done is not None:
        return done

    full = lake_mod._output_schema(m, spec, None, True)
    # the rewrite re-emits USER rows (the live scan is finalized): engine-
    # internal state columns must not leak into the apply target, or the
    # unify would null-fill per-column seqs and the fold would read the
    # rewrite as "nothing written"
    full = pa.schema([f for f in full if not f.name.startswith("__")])
    for col in set_exprs:
        if full.get_field_index(col) < 0:
            raise KeyError(f"SET column {col!r} not in table schema")
    matched = lake_mod.scan(
        lake_dir, spec=spec, manifest=m, predicate=mask,
        stats_filter=ranges_of(full),
    )
    wm1 = _global_watermark(m) + 1
    order_type = full.field(spec.order).type

    def rewrite(t: pa.Table, *, sets=set_exprs, order=spec.order,
                op_col=spec.op_col, lsn=wm1, otype=order_type) -> pa.Table:
        n = t.num_rows
        for col, v in sets.items():
            i = t.column_names.index(col)
            cur = t.column(col)
            if callable(v):
                arr = v(t)
            elif isinstance(v, tuple):
                kern = pc.add if v[0] == "add" else pc.multiply
                arr = kern(cur, pa.scalar(v[1], cur.type))
            else:
                arr = pa.array([v] * n).cast(cur.type)
            t = t.set_column(i, t.schema.field(i).with_type(arr.type)
                             if hasattr(arr, "type") else col, arr)
        t = t.set_column(t.column_names.index(order), order,
                         pa.array(np.full(n, lsn, dtype=np.int64)).cast(otype))
        if op_col in t.column_names:
            t = t.set_column(t.column_names.index(op_col), op_col,
                             pa.array(["update"] * n, pa.string()))
        return t

    ds = matched.map_batches(rewrite, batch_format="pyarrow",
                             zero_copy_batch=True)
    # the output schema equals the scan's unless a callable SET changed a
    # column's type — in that case fall back to sample-based inference
    out_schema = None if any(callable(v) for v in set_exprs.values()) else full
    return apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                         spec=spec, target_schema=out_schema)


def merge_into(
    lake_dir: str,
    source,
    *,
    spec: TableSpec = TOKENS_SPEC,
    op_id: str,
    when_matched: str = "update",
    when_not_matched: str = "insert",
    matched_delete_where=None,
    delete_insert: str = "skip",
    dedup_order_col: str | None = None,
    narrow_source: str = "error",
) -> mf.Manifest:
    """MERGE INTO <lake> USING <source Dataset> ON <spec.key> — the SQL
    MERGE / Delta ``whenMatchedUpdateAll`` / ``whenNotMatchedInsertAll``
    statement the reference hand-writes as ``INSERT … ON CONFLICT (key)
    DO UPDATE SET col = excluded.col`` for every synced table
    (queries/fact_studies.py:63-83, queries/dim_facitities.py:34).

    Clause evaluation per source row (SQL MERGE clause order):

    - matched  AND ``matched_delete_where``  → DELETE (tombstone)
    - matched                               → ``when_matched``: "update"
      (re-emit the source row — update-all) | "skip"
    - not matched                           → ``when_not_matched``:
      "insert" | "skip"

    **Scale shape.** The canonical CDC merge (update + insert, no delete
    condition) needs NO match join at all: in an LWW lake an upsert epoch
    at ``lsn = watermark+1`` IS merge-all semantics, so the source streams
    straight into the epoch apply and the (possibly 100 TB) target is
    never probed. A match flag is computed only for the asymmetric
    clauses — update-only, insert-only, or strict delete fall-through —
    via one :func:`hash_semi_join` exchange against the PRUNED live key
    column (key values travel, target payload never moves).

    ``matched_delete_where`` is a ``[(col, op, value), …]`` conjunct list
    or a ``pa.Table -> BooleanArray`` callable over SOURCE columns.
    ``delete_insert`` says what an UNMATCHED source row satisfying the
    delete predicate does: "skip" (default — the CDC-feed shape ``WHEN NOT
    MATCHED AND s.op <> 'delete' THEN INSERT``; deletes of absent keys are
    emitted as no-op tombstones, preserving the no-join fast path) or
    "insert" (strict SQL fall-through to the not-matched clause — forces
    the match join).

    Duplicate source keys are a caller error in SQL MERGE; pass
    ``dedup_order_col`` to keep only the highest-ordered row per key
    (skew-proof two-stage :func:`top1_per_key`) before merging.

    ``narrow_source`` governs a source whose columns do not cover the
    target's payload (``ON CONFLICT DO UPDATE`` and Delta update-all both
    PRESERVE unlisted target columns; a whole-row LWW upsert would null
    them):

    - ``"error"`` (default): refuse loudly — silent data destruction is
      never a default.
    - ``"fill"``: matched rows keep their current values in the missing
      columns — one column-pruned scan of the target's (key + missing
      columns) joined to the source by key (an O(target) read of ONLY the
      missing columns plus one exchange; the zero-probe fast path
      applies only to full-width sources). Unmatched inserts get null
      there, like a SQL INSERT with unlisted columns. The filled values
      are visible to ``matched_delete_where``.
    - ``"null"``: explicit opt-in to whole-row replacement (missing
      columns become null).

    A source column named ``spec.op_col`` is rejected unless
    ``matched_delete_where`` is given (express CDC-feed deletes as e.g.
    ``matched_delete_where=[("op", "==", "delete")]`` — the predicate
    sees every source column; the envelope name itself is never payload).

    ``op_id`` is required (the source is an arbitrary Dataset — the engine
    cannot derive a content id): same id ⇒ exactly-once skip, crash
    mid-apply resumes like any epoch.
    """
    if spec.mode == "append":
        raise ValueError("merge_into needs keyed upsert semantics; "
                         "append-mode tables have no match key")
    if spec.merge_engine == "aggregate":
        raise ValueError("merge_into is undefined for aggregate-merge "
                         "tables (source rows would fold into the "
                         "accumulators, not replace them)")
    if when_matched not in ("update", "skip"):
        raise ValueError(f"when_matched={when_matched!r} not in update|skip")
    if when_not_matched not in ("insert", "skip"):
        raise ValueError(
            f"when_not_matched={when_not_matched!r} not in insert|skip")
    if delete_insert not in ("skip", "insert"):
        raise ValueError(f"delete_insert={delete_insert!r} not in skip|insert")
    if (when_matched == "skip" and when_not_matched == "skip"
            and matched_delete_where is None):
        raise ValueError("merge with every clause skipped does nothing")
    if narrow_source not in ("error", "fill", "null"):
        raise ValueError(
            f"narrow_source={narrow_source!r} not in error|fill|null")
    m = mf.latest(lake_dir)
    if m is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    done = apply_mod._already_applied(lake_dir, op_id)
    if done is not None:
        return done

    from vlm_eden_dataset_etl_ray.functions.relational import (
        hash_join, hash_semi_join, top1_per_key)

    # capture the source schema BEFORE the (schema-preserving) dedup and
    # match-flag stages: Dataset.schema() on a raw read is metadata-only,
    # after a shuffle it would execute a sample block.
    src_schema = pa.schema(
        list(zip(source.schema().names, source.schema().types)))
    if src_schema.get_field_index(spec.key) < 0:
        raise KeyError(f"merge source has no key column {spec.key!r}")
    if src_schema.get_field_index(spec.op_col) >= 0:
        # a conjunct-list delete predicate must actually reference the op
        # column; a callable predicate (explicit op_id) is trusted
        consumed = (matched_delete_where is not None
                    and (callable(matched_delete_where)
                         or any(c[0] == spec.op_col
                                for c in matched_delete_where)))
        if not consumed:
            raise ValueError(
                f"source carries the op envelope column {spec.op_col!r} "
                "but matched_delete_where does not consume it — its "
                "delete rows would merge as live upserts; declare them, "
                f"e.g. matched_delete_where=[({spec.op_col!r}, '==', "
                f"{spec.delete_op!r})]")

    # registry-aware target schema: dropped columns must not count as
    # "missing" payload, renamed columns count under their CURRENT name
    from vlm_eden_dataset_etl_ray.state.registry import SchemaRegistryState

    _reg = SchemaRegistryState.load_readonly(lake_dir)
    _exc, _acts_unused, _rens = lake_mod._evolution_maps(_reg, spec)
    full = lake_mod._output_schema(m, spec, None, True,
                                   exclude=_exc, renames=_rens)
    target_payload = [n for n in full.names
                     if n not in (spec.key, spec.order, spec.op_col)
                     and not n.startswith("__")]
    missing = [n for n in target_payload
               if src_schema.get_field_index(n) < 0]
    if spec.merge_engine == "partial_update":
        # column-level LWW preserves untouched columns natively: a narrow
        # source is the engine's normal input, no fill read needed
        missing = []
    if missing and narrow_source == "error":
        raise ValueError(
            f"merge source lacks target payload columns {missing}; a "
            "whole-row LWW upsert would null them (ON CONFLICT DO UPDATE "
            "preserves unlisted columns). Pass narrow_source='fill' to "
            "keep current target values (one column-pruned target read + "
            "join), or 'null' to accept whole-row replacement")

    if dedup_order_col is not None:
        source = top1_per_key(source, spec.key,
                              [(dedup_order_col, "descending")])
    if missing and narrow_source == "fill":
        tgt = lake_mod.scan(lake_dir, spec=spec, manifest=m,
                            columns=[spec.key] + missing)
        source = hash_join(source, tgt, spec.key, spec.key, how="left")

    if matched_delete_where is None:
        dmask_fn = None
    elif callable(matched_delete_where):
        dmask_fn = matched_delete_where
    else:
        dmask_fn = _compile_where([tuple(c) for c in matched_delete_where])

    # the match flag is needed only when matched and unmatched rows are
    # routed differently; plain update+insert(+delete-as-feed) streams
    # source → epoch with zero target probes.
    need_match = (when_matched == "skip" or when_not_matched == "skip"
                  or (dmask_fn is not None and delete_insert == "insert"))
    flag = "__merge_matched"
    if need_match:
        live_keys = lake_mod.scan(lake_dir, spec=spec, manifest=m,
                                  columns=[spec.key])
        source = hash_semi_join(source, live_keys, spec.key, spec.key,
                                flag_col=flag)

    wm1 = _global_watermark(m) + 1
    order_type = full.field(spec.order).type

    payload = [f for f in src_schema
               if f.name not in (spec.key, spec.order, spec.op_col, flag)]
    if missing and narrow_source == "fill":
        payload += [full.field(n) for n in missing]
    out_schema = pa.schema(
        [(spec.key, src_schema.field(spec.key).type),
         (spec.order, order_type), (spec.op_col, pa.string())]
        + [(f.name, f.type) for f in payload])

    def to_epoch(t: pa.Table, *, key=spec.key, order=spec.order,
                 op_col=spec.op_col, dead=spec.delete_op, lsn=wm1,
                 otype=order_type, schema=out_schema) -> pa.Table:
        n = t.num_rows
        matched = (t.column(flag).combine_chunks()
                   if flag in t.column_names
                   else pa.array(np.ones(n, dtype=bool)))
        if dmask_fn is not None:
            dm = pc.fill_null(dmask_fn(t), False)
            if delete_insert == "skip":
                # delete regardless of match: absent-key tombstones are
                # LWW no-ops, so this equals WHEN NOT MATCHED AND NOT
                # <pred> THEN INSERT without probing the target
                delete = dm
            else:
                delete = pc.and_(dm, matched)
        else:
            delete = pa.array(np.zeros(n, dtype=bool))
        keep = delete
        if when_matched == "update":
            keep = pc.or_(keep, pc.and_not(matched, delete))
        if when_not_matched == "insert":
            keep = pc.or_(keep, pc.and_not(pc.invert(matched), delete))
        t = t.append_column("__del", delete)
        t = t.filter(keep)
        op = pc.if_else(t.column("__del"), pa.scalar(dead),
                        pa.scalar("upsert"))
        n = t.num_rows
        cols = {key: t.column(key),
                order: pa.array(np.full(n, lsn, dtype=np.int64)).cast(otype),
                op_col: op.cast(pa.string())}
        for f in schema:
            if f.name not in cols:
                cols[f.name] = t.column(f.name)
        return pa.table(cols, schema=schema)

    ds = source.map_batches(to_epoch, batch_format="pyarrow",
                            zero_copy_batch=True)
    return apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=op_id,
                                         spec=spec, target_schema=out_schema)
