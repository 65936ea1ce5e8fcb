"""Incrementally-maintained JOIN views (materialized fact⋈dim, kept
fresh from CDC deltas).

:mod:`.views` maintains *aggregate* views; this module maintains the
other reporting staple the reference recomputes wholesale on every sync
(its fact queries re-join every dimension per run —
/root/reference/queries/fact_studies.py:20-40 joins facilities,
modalities, practitioners on each sync): a materialized equi-join

    V = L  ⋈_{L.join_col = R.key}  R

maintained from the two lakes' change feeds instead of re-joined from
scratch. The design reuses the engine's own primitives end to end:

- **The view IS a lake**, keyed by the LEFT key with its own LWW order
  column — refreshing a changed left row is a plain upsert (no
  retraction bookkeeping: LWW replaces), a deleted left row is a plain
  tombstone, and the view composes with scan/compaction/time travel/
  change_feed like any other table (a downstream consumer can tail the
  VIEW's change feed).
- **Storage is the LEFT-join result** plus a ``__jv_matched`` marker;
  ``inner`` vs ``left`` is a SCAN-side choice (:func:`scan_join_view`).
  Storing unmatched left rows is what makes incremental maintenance
  COMPLETE: a dim key inserted later must find the left rows it now
  matches, and those are exactly the stored unmatched rows — an
  inner-only store would have forgotten them.
- **Deltas come from** :func:`.lake.change_feed` on both inputs —
  O(changes) per refresh, never O(lake).
- **The view is its own reverse index** for right-side changes: the
  left rows affected by a changed dim key are the view rows whose
  ``join_col`` equals it, found by one slim two-column view scan with a
  vectorized ``is_in`` (cluster the view by ``join_col`` at compaction
  to make this zone-map-prunable). No secondary index to build or keep
  consistent.
- **Per refresh**: affected left keys (changed lefts ∪ reverse-index
  hits) → one key-restricted, partition-pruned scan of L → one
  key-restricted, partition-pruned scan of R on the join values → one
  small×small :func:`hash_join <.functions.relational.hash_join>` →
  one exactly-once view epoch (``jv-l{L}-r{R}`` id; crash re-runs and
  no-new-epoch calls are ledger/metadata skips).

Driver-side state per refresh is the changed/affected KEY arrays (the
same epoch-bounded trade :mod:`.views` documents); payloads stream.
Initial build = one full ``hash_join`` of both snapshots — the honest
one-time cost; every later refresh is O(changes).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from vlm_eden_dataset_etl_ray import apply as apply_mod
from vlm_eden_dataset_etl_ray import lake as lake_mod
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray.functions.hashing import partition_ids
from vlm_eden_dataset_etl_ray.schema import unify_table
from vlm_eden_dataset_etl_ray.spec import TableSpec

_JV_ID = re.compile(r"^jv-l(\d+)-r(\d+)$")
_MARK = "__jv_matched"


def join_view_spec(left_spec: TableSpec) -> TableSpec:
    """The view lake's TableSpec: keyed by the LEFT key (and hash-
    partitioned like the left lake), with engine-private order/op envelope
    names so left payload columns named ``lsn``/``op`` pass through as
    data. Derived-only on purpose: every maintain/scan call derives the
    same spec from ``left_spec``, so there is no way to write and read a
    view under mismatched layouts."""
    return TableSpec(
        name="join_view", key=left_spec.key, order="__jv_lsn",
        op_col="__jv_op", num_partitions=left_spec.num_partitions,
        envelope=())


def scan_join_view(
    view_dir: str,
    left_spec: TableSpec,
    how: str = "inner",
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Read the maintained view: ``how="inner"`` filters to matched rows,
    ``"left"`` returns everything (unmatched rows carry null right
    columns). One stored view serves both read shapes."""
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r} not in inner|left")
    vspec = join_view_spec(left_spec)
    need = None if columns is None else list(
        dict.fromkeys(columns + [_MARK]))
    pred = (lambda t: t.column(_MARK)) if how == "inner" else None
    ds = lake_mod.scan(view_dir, spec=vspec, columns=need, predicate=pred)
    return ds.map_batches(
        lambda t: t.drop_columns([c for c in (_MARK, "__jv_lsn", "__jv_op")
                                  if c in t.column_names and
                                  (columns is None or c not in columns)]),
        batch_format="pyarrow", zero_copy_batch=True)


def _collect_keys(ds: rd.Dataset, col: str) -> pa.Array:
    """Distinct non-null values of one slim column, driver-side
    (epoch-bounded — the same contract as views.py's epoch key set)."""
    batches = list(ds.select_columns([col]).iter_batches(
        batch_format="pyarrow", batch_size=None))
    if not batches:
        return pa.array([], pa.string())
    return pc.unique(
        pa.concat_tables(batches).column(col).combine_chunks()).drop_null()


def _last_maintained(view_dir: str, m: mf.Manifest) -> tuple[int, int]:
    pairs = []
    for eid in mf.cumulative_lineage(view_dir, m)[0]:
        hit = _JV_ID.match(eid)
        if hit:
            pairs.append((int(hit.group(1)), int(hit.group(2))))
    if not pairs:
        raise ValueError(
            f"{view_dir} exists but carries no jv-l*-r* lineage — it is not "
            "a join view maintained by maintain_join_view")
    return max(pairs)


def _restricted_scan(lake_dir, spec, columns, keys: pa.Array,
                     key_col: str, manifest: mf.Manifest) -> rd.Dataset:
    """Key-restricted merge-on-read scan PINNED to ``manifest``: pids are
    derived from that manifest's partition count and the scan reads that
    manifest's files, so a commit (or rehash) racing the refresh cannot
    desync pruning from layout."""
    if len(keys) == 0:
        return rd.from_items([])
    pids = sorted(set(
        partition_ids(keys, manifest.num_partitions).tolist()))
    keys_ref = ray.put(keys)

    def _pred(t: pa.Table):
        return pc.is_in(t.column(key_col), value_set=ray.get(keys_ref))

    return lake_mod.scan(lake_dir, spec=spec, columns=columns,
                         predicate=_pred, pids=pids, manifest=manifest)


def _default_cols(lake_dir, spec, drop: tuple[str, ...]) -> list[str]:
    m = mf.latest(lake_dir)
    full = lake_mod._output_schema(m, spec, None, True)
    return [n for n in full.names if n not in drop]


def _stored_schema(view_dir: str, vm: mf.Manifest,
                   vspec: TableSpec) -> pa.Schema:
    full = lake_mod._output_schema(vm, vspec, None, True)
    head = [vspec.key, "__jv_lsn", "__jv_op"]
    return pa.schema([(n, full.field(n).type)
                      for n in head + [c for c in full.names
                                       if c not in head]])


def maintain_join_view(
    view_dir: str,
    left_dir: str,
    right_dir: str,
    *,
    left_spec: TableSpec,
    right_spec: TableSpec,
    join_col: str,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    num_buckets: int | None = None,
) -> mf.Manifest:
    """Create or refresh the materialized join view under ``view_dir``.

    ``join_col`` is the LEFT column equated to ``right_spec.key``.
    ``left_cols`` / ``right_cols`` are the payload columns the view
    carries (defaults: every stored column except the CDC envelope; the
    left key and ``join_col`` are always included). Column names must be
    disjoint across sides. A left row whose ``join_col`` is null never
    matches (SQL ON semantics) and is stored unmatched.

    Idempotent per (left epoch, right epoch) pair: the refresh commits
    under epoch id ``jv-l{L}-r{R}``; re-running after a crash (or calling
    with no new input epochs) is a ledger skip / metadata no-op."""
    if left_spec.mode != "upsert" or right_spec.mode != "upsert":
        raise ValueError("join views need keyed upsert inputs on both sides")
    ml, mr = mf.latest(left_dir), mf.latest(right_dir)
    if ml is None or mr is None:
        raise FileNotFoundError("both input lakes must have a committed "
                                f"manifest ({left_dir}, {right_dir})")
    lkey, rkey = left_spec.key, right_spec.key
    # _MARK is dropped from the defaults so a maintained view can itself
    # be the LEFT (or right) side of another view — multi-way joins
    # compose by chaining, each level refreshed from the level below's
    # change feed
    if left_cols is None:
        left_cols = _default_cols(
            left_dir, left_spec, (left_spec.order, left_spec.op_col, _MARK))
    if right_cols is None:
        right_cols = _default_cols(
            right_dir, right_spec, (rkey, right_spec.order,
                                    right_spec.op_col, _MARK))
    lcols = list(dict.fromkeys([lkey, join_col] + left_cols))
    rcols = list(dict.fromkeys([rkey] + right_cols))
    clash = (set(lcols) & set(rcols)) - ({join_col} if join_col == rkey
                                         else set())
    if clash:
        raise ValueError(f"view column collision across sides: "
                         f"{sorted(clash)}")

    from vlm_eden_dataset_etl_ray.functions.relational import hash_join

    vspec = join_view_spec(left_spec)
    l1, r1 = ml.epoch, mr.epoch
    epoch_id = f"jv-l{l1}-r{r1}"
    vm = mf.latest(view_dir)

    def _mark_right(ds: rd.Dataset) -> rd.Dataset:
        # constant True column: after the left join, fill_null(False)
        # yields the matched marker even when join_col == rkey (the
        # coalesced USING key can't distinguish match from miss)
        return ds.map_batches(
            lambda t: t.append_column(
                _MARK, pa.array(np.ones(t.num_rows, bool))),
            batch_format="pyarrow", zero_copy_batch=True)

    def _out_schema(joined_schema: pa.Schema) -> pa.Schema:
        fields = [(lkey, joined_schema.field(lkey).type),
                  ("__jv_lsn", pa.int64()), ("__jv_op", pa.string())]
        # the left key leads, the right key is dropped (redundant with
        # join_col when matched) — UNLESS it coalesced into join_col
        # (USING shape), and never duplicate lkey when join_col == lkey
        fields += [(n, joined_schema.field(n).type)
                   for n in joined_schema.names
                   if n not in (lkey, _MARK) and (n != rkey or n == join_col)]
        fields.append((_MARK, pa.bool_()))
        return pa.schema(fields)

    def _stamp(ds: rd.Dataset, lsn: int, schema: pa.Schema) -> rd.Dataset:
        def _f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            mark = pc.fill_null(t.column(_MARK), False)
            t = t.drop_columns([_MARK])
            if rkey in t.column_names and rkey != join_col:
                t = t.drop_columns([rkey])
            t = t.append_column(_MARK, mark)
            t = t.append_column("__jv_lsn",
                                pa.array(np.full(n, lsn, np.int64)))
            t = t.append_column("__jv_op",
                                pa.array(["upsert"] * n, pa.string()))
            return unify_table(t, schema)

        return ds.map_batches(_f, batch_format="pyarrow",
                              zero_copy_batch=True)

    if vm is None:
        left = lake_mod.scan(left_dir, spec=left_spec, manifest=ml,
                             columns=lcols)
        right = _mark_right(lake_mod.scan(right_dir, spec=right_spec,
                                          manifest=mr, columns=rcols))
        joined = hash_join(left, right, join_col, rkey, how="left",
                           num_buckets=num_buckets)
        schema = _out_schema(pa.schema(list(zip(joined.schema().names,
                                                joined.schema().types))))
        return apply_mod.apply_epoch_dataset(
            view_dir, _stamp(joined, 0, schema), epoch_id=epoch_id,
            spec=vspec, target_schema=schema)

    done = apply_mod._already_applied(view_dir, epoch_id)
    if done is not None:
        return done
    l0, r0 = _last_maintained(view_dir, vm)
    if (l0, r0) == (l1, r1):
        return vm

    # change_feed needs the (l0..l1] / (r0..r1] manifests retained; a view
    # left behind past the inputs' vacuum horizon catches up with a FULL
    # rebuild instead of failing forever: full join upserts + a streamed
    # anti-join tombstoning view keys whose left row no longer exists
    retained_ok = (
        set(range(l0, l1 + 1)) <= set(mf.list_epochs(left_dir))
        and set(range(r0, r1 + 1)) <= set(mf.list_epochs(right_dir)))
    if not retained_ok:
        from vlm_eden_dataset_etl_ray.functions.relational import (
            hash_semi_join)

        wm1 = max((st.watermark_lsn for st in vm.partitions.values()),
                  default=-1) + 1
        left = lake_mod.scan(left_dir, spec=left_spec, manifest=ml,
                             columns=lcols)
        right = _mark_right(lake_mod.scan(right_dir, spec=right_spec,
                                          manifest=mr, columns=rcols))
        joined = hash_join(left, right, join_col, rkey, how="left",
                           num_buckets=num_buckets)
        schema = _out_schema(pa.schema(list(zip(joined.schema().names,
                                                joined.schema().types))))
        view_keys = lake_mod.scan(view_dir, spec=vspec, manifest=vm,
                                  columns=[lkey])
        left_keys = lake_mod.scan(left_dir, spec=left_spec, manifest=ml,
                                  columns=[lkey])
        stale = hash_semi_join(view_keys, left_keys, lkey, lkey, anti=True)

        def _tomb(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return unify_table(pa.table({
                lkey: t.column(lkey),
                "__jv_lsn": pa.array(np.full(n, wm1, np.int64)),
                "__jv_op": pa.array(["delete"] * n, pa.string()),
            }), schema)

        epoch = _stamp(joined, wm1, schema).union(
            stale.map_batches(_tomb, batch_format="pyarrow"))
        return apply_mod.apply_epoch_dataset(
            view_dir, epoch, epoch_id=epoch_id, spec=vspec,
            target_schema=schema)

    # ---- affected LEFT keys: changed lefts ∪ reverse-index hits --------
    affected = pa.array([], pa.string())
    if l1 > l0:
        feed_l = lake_mod.change_feed(left_dir, l0, l1, spec=left_spec,
                                      columns=[lkey])
        affected = _collect_keys(feed_l, lkey)
    if r1 > r0:
        feed_r = lake_mod.change_feed(right_dir, r0, r1, spec=right_spec,
                                      columns=[rkey])
        bkeys = _collect_keys(feed_r, rkey)
        if len(bkeys):
            bref = ray.put(bkeys)

            def _hit(t: pa.Table):
                return pc.fill_null(
                    pc.is_in(t.column(join_col), value_set=ray.get(bref)),
                    False)

            # the view as its own reverse index: slim two-column scan —
            # COMPLETE because unmatched left rows are stored too
            # (one column when join_col IS the left key)
            hits = lake_mod.scan(view_dir, spec=vspec, manifest=vm,
                                 columns=list(dict.fromkeys(
                                     [lkey, join_col])), predicate=_hit)
            hk = _collect_keys(hits, lkey)
            if len(affected) == 0:
                affected = hk
            elif len(hk):
                affected = pc.unique(pa.chunked_array(
                    [affected, hk.cast(affected.type)]).combine_chunks())

    schema = _stored_schema(view_dir, vm, vspec)
    if len(affected) == 0:
        # input epochs advanced but no key changed (e.g. empty epochs):
        # still record the (l1, r1) coverage for the lineage parser
        return apply_mod.apply_epoch_dataset(
            view_dir, rd.from_items([]), epoch_id=epoch_id, spec=vspec,
            target_schema=schema)

    # ---- rebuild the affected slice: L ⋈ R restricted to O(changed) ----
    left_rows = _restricted_scan(left_dir, left_spec, lcols, affected,
                                 lkey, ml).materialize()
    wm1 = max((st.watermark_lsn for st in vm.partitions.values()),
              default=-1) + 1
    parts: list[rd.Dataset] = []
    kept = pa.array([], affected.type)
    if left_rows.count():
        jvals = _collect_keys(left_rows, join_col)
        if len(jvals):
            right_rows = _mark_right(_restricted_scan(
                right_dir, right_spec, rcols, jvals, rkey, mr))
            joined = hash_join(left_rows, right_rows, join_col, rkey,
                               how="left",
                               bytes_hint=2 * left_rows.size_bytes(),
                               num_buckets=num_buckets).materialize()
        else:
            # every affected left row has a null join key: all unmatched
            joined = left_rows.map_batches(
                lambda t: t.append_column(
                    _MARK, pa.array(np.zeros(t.num_rows, bool))),
                batch_format="pyarrow").materialize()
        # columns ADDED to an input since the view was built must not be
        # silently unified away: widen the stored schema with whatever the
        # live join now carries (schema() is metadata-only — materialized)
        live = _out_schema(pa.schema(list(zip(joined.schema().names,
                                              joined.schema().types))))
        extra = [f for f in live if schema.get_field_index(f.name) < 0]
        if extra:
            schema = pa.schema(list(schema) + extra)
        parts.append(_stamp(joined, wm1, schema))
        kept = _collect_keys(joined, lkey)
    dead = affected.filter(pc.invert(pc.is_in(
        affected, value_set=kept.cast(affected.type)))) \
        if len(kept) else affected
    if len(dead):
        tomb = pa.table({lkey: dead.cast(schema.field(lkey).type),
                         "__jv_lsn": pa.array(
                             np.full(len(dead), wm1, np.int64)),
                         "__jv_op": pa.array(["delete"] * len(dead),
                                             pa.string())})
        parts.append(rd.from_arrow(unify_table(tomb, schema)))
    epoch = parts[0] if len(parts) == 1 else parts[0].union(parts[1])
    return apply_mod.apply_epoch_dataset(view_dir, epoch, epoch_id=epoch_id,
                                         spec=vspec, target_schema=schema)
