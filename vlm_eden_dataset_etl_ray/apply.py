"""Epoch apply: changelog files → partitioned LWW delta + manifest commit.

The engine's flagship pipeline (the reference's 10-minute incremental sync,
``/root/reference/tasks.py:16-47`` + ``sync/studies.py:18-45``), re-expressed
Ray-Data-first:

    read_parquet(changelog shards, pruned)
      → map_batches(PrepareBatch, pyarrow, actor pool)    # unify schema,
            per-batch LWW pre-reduce, assign pid = hash(doc_id) % P
      → groupby("pid")                                    # the ONE hash
            .map_groups(write partition delta)            # shuffle per epoch
      → tiny metadata rows → driver commits the manifest (2PC).

Scale notes (100 TB / 256 nodes):
- exactly one all-to-all exchange per epoch, keyed on a fixed partition id,
  so partition files are stable across epochs and resumable;
- hot keys (Zipf doc_ids) are absorbed by the per-batch pre-reduce: a key
  occurring k times in a batch leaves the batch once, so the shuffle carries
  ≤ (#batches) rows per key regardless of skew — a salted two-stage reduce
  with the batch as the implicit salt (valid because max-LSN LWW is
  associative + commutative);
- tasks write staging files with stable names, so Ray's lineage retries are
  idempotent; the manifest publish is the only commit point.
"""

from __future__ import annotations

import hashlib
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from vlm_eden_dataset_etl_ray import fsio
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray import schema as sch
from vlm_eden_dataset_etl_ray.functions.hashing import HASH_FN, partition_ids
from vlm_eden_dataset_etl_ray.spec import TableSpec, TOKENS_SPEC
from vlm_eden_dataset_etl_ray.stages import lww, merge_engines


def union_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Widest schema covering all inputs: union of fields, widest type per
    name. Raises on incompatible (non-widenable) type conflicts."""
    fields: dict[str, pa.Field] = {}
    order: list[str] = []
    for s in schemas:
        for f in s:
            if f.name not in fields:
                fields[f.name] = f
                order.append(f.name)
            else:
                cur = fields[f.name]
                if cur.type.equals(f.type):
                    continue
                if sch._is_safe_widen(cur.type, f.type):
                    fields[f.name] = pa.field(f.name, f.type)
                elif sch._is_safe_widen(f.type, cur.type):
                    continue
                else:
                    raise ValueError(
                        f"incompatible schemas for column {f.name!r}: {cur.type} vs {f.type}"
                    )
    return pa.schema([fields[n] for n in order])


def screen_bad_rows(t: pa.Table, spec: TableSpec,
                    dlq_dir: str | None) -> pa.Table:
    """Apply ``spec.on_bad_rows`` to a unified batch: rows whose key or
    order (LSN) is NULL cannot be partitioned or merged. Vectorized mask;
    the clean fast path (no bad rows) costs two null-count reads."""
    policy = spec.on_bad_rows
    key_null = t.column(spec.key).null_count > 0
    ord_null = t.column(spec.order).null_count > 0
    if not (key_null or ord_null):
        return t
    bad = pc.or_kleene(pc.is_null(t.column(spec.key)),
                       pc.is_null(t.column(spec.order)))
    bad = pc.fill_null(bad, False)
    n = pc.sum(bad.cast(pa.int8()).cast(pa.int64())).as_py() or 0
    if n == 0:
        return t
    if policy == "fail":
        ex = t.filter(bad).slice(0, 3)
        pairs = list(zip(ex.column(spec.key).to_pylist(),
                         ex.column(spec.order).to_pylist()))
        raise ValueError(
            f"{n} malformed row(s) in a batch of {t.num_rows} (null "
            f"{spec.key}/{spec.order}); examples (key, order): {pairs}. "
            "Set TableSpec.on_bad_rows='dead_letter' or 'drop' to divert.")
    if policy == "dead_letter":
        if not dlq_dir:
            raise ValueError("on_bad_rows='dead_letter' needs a lake-backed "
                             "apply (no DLQ dir on this path)")
        rows = t.filter(bad)
        reason = np.where(
            pc.is_null(rows.column(spec.key)).to_numpy(zero_copy_only=False),
            np.where(pc.is_null(rows.column(spec.order)).to_numpy(
                zero_copy_only=False), "null_key,null_order", "null_key"),
            "null_order")
        epoch_id = dlq_dir.rstrip("/").rsplit("/", 1)[-1]
        rows = rows.append_column("__dlq_reason", pa.array(reason, pa.string()))
        rows = rows.append_column(
            "__dlq_epoch_id", pa.array([epoch_id] * rows.num_rows, pa.string()))
        fsio.write_parquet(
            fsio.join(dlq_dir, f"bad-{uuid.uuid4().hex}.parquet"), rows)
    elif policy != "drop":
        raise ValueError(f"unknown on_bad_rows policy {policy!r}")
    return t.filter(pc.invert(bad))


class PrepareBatch:
    """Stateful actor-pool stage (reference analog: ``DatabaseBridge`` opened
    once per worker, ``sync/database_breach.py:8-30``): holds the target
    schema, consults the schema-registry actor when a batch carries a newer
    ``schema_ver``, unifies each Arrow batch up to the target, pre-reduces it
    (per-batch LWW) and assigns the hash partition id."""

    def __init__(self, target_schema: pa.Schema, spec: TableSpec, registry=None,
                 dlq_dir: str | None = None):
        self.target = target_schema
        self.spec = spec
        self.registry = registry
        self.dlq_dir = dlq_dir
        self._known_ver = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.spec
        if self.registry is not None and "schema_ver" in batch.column_names:
            maxv = pc.max(batch.column("schema_ver")).as_py()
            if maxv is not None and (self._known_ver is None or maxv > self._known_ver):
                payload = ray.get(self.registry.ensure_known.remote(int(maxv)))
                self.target = union_schemas([self.target, payload])
                drops = ray.get(self.registry.current_drops.remote())
                if drops:  # a DROP migration: stop carrying the column
                    self.target = pa.schema(
                        [fl for fl in self.target if fl.name not in drops])
                self._known_ver = int(maxv)
        t = sch.unify_table(batch, self.target)
        if spec.on_bad_rows is not None:
            t = screen_bad_rows(t, spec, self.dlq_dir)
        # stage-1 (salted) reduce, engine-dispatched; append mode (K6) is
        # the identity (no key reduce, keep dups)
        t = merge_engines.pre_reduce(t, spec)
        pid = partition_ids(t.column(spec.key), spec.num_partitions)
        return t.append_column("pid", pa.array(pid))


class PrepareAndSpill(PrepareBatch):
    """PrepareBatch + file-shuffle phase A: after the per-batch pre-reduce,
    split the batch by pid and spill one parquet slice per (batch, pid) under
    ``shuffle_dir/pid=P/``. Returns tiny metadata rows instead of data — the
    shuffle travels through the (shared) filesystem, not the object store.

    Idempotence: slices are written tmp→rename; a retried task writes new
    uuid-named slices and any orphans from the failed attempt contain
    VERBATIM duplicate rows, which the phase-B LWW reduce collapses (same
    argument as duplicate delivery). At multi-node scale ``shuffle_dir``
    lives on the shared lake store, exactly like the delta files.
    """

    def __init__(self, target_schema, spec, registry, shuffle_dir: str,
                 dlq_dir: str | None = None):
        # explicit base calls (not zero-arg super()): lets tests/users ship
        # subclasses by value through cloudpickle without __class__-cell issues
        PrepareBatch.__init__(self, target_schema, spec, registry,
                              dlq_dir=dlq_dir)
        self.shuffle_dir = shuffle_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = PrepareBatch.__call__(self, batch)  # unified, pre-reduced, pid-tagged
        if t.num_rows == 0:  # e.g. an all-malformed batch after screening
            return pa.Table.from_pylist([], schema=pa.schema(
                [("pid", pa.int64()), ("path", pa.string()),
                 ("rows", pa.int64()), ("bytes", pa.int64()),
                 ("min_lsn", pa.int64()), ("max_lsn", pa.int64())]))
        t = t.sort_by("pid")
        pids = t.column("pid").to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.diff(pids)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(pids)]])
        metas = []
        for s, e in zip(starts, ends):
            pid = int(pids[s])
            part = t.slice(s, e - s).drop_columns(["pid"])
            # unique name + direct write (rename-free): a retried task's
            # orphan slices carry verbatim-duplicate rows, which the phase-B
            # LWW reduce collapses; only metadata-listed slices are read
            path = fsio.join(self.shuffle_dir, f"pid={pid:05d}",
                             f"slice-{uuid.uuid4().hex}.parquet")
            # tokenized payloads are high-entropy; lz4 is cheap insurance for
            # disk-backed shuffle dirs, NONE wins on tmpfs — env-selectable
            nbytes = fsio.write_parquet(
                path, part,
                compression=os.environ.get("VLM_EDEN_SLICE_COMPRESSION", "lz4"),
            )
            lsns = part.column(self.spec.order)
            metas.append(
                {
                    "pid": pid,
                    "path": path,
                    "rows": part.num_rows,
                    "bytes": nbytes,
                    "min_lsn": pc.min(lsns).as_py(),
                    "max_lsn": pc.max(lsns).as_py(),
                }
            )
        return pa.Table.from_pylist(
            metas,
            schema=pa.schema(
                [("pid", pa.int64()), ("path", pa.string()), ("rows", pa.int64()),
                 ("bytes", pa.int64()),
                 ("min_lsn", pa.int64()), ("max_lsn", pa.int64())]
            ),
        )


_META_SCHEMA = pa.schema(
    [
        ("pid", pa.int64()),
        ("path", pa.string()),
        ("rows", pa.int64()),
        ("bytes", pa.int64()),
        ("min_lsn", pa.int64()),
        ("max_lsn", pa.int64()),
        ("tombstones", pa.int64()),
        ("stats", pa.string()),  # JSON zone map: {column: [min, max]}
    ]
)

def file_stats_json(t: pa.Table) -> str:
    """Zone-map entry for one written file: min/max per numeric / temporal
    column (temporal normalized to int64 — epoch micros for timestamps —
    so the JSON manifest stays type-free; readers normalize their probe
    bounds the same way). Columns that are all-null, non-primitive, or
    string are skipped — an absent entry means "must read"."""
    import json as _json

    out: dict[str, list] = {}
    for name in t.column_names:
        typ = t.schema.field(name).type
        col = t.column(name)
        if pa.types.is_temporal(typ):
            try:
                col = col.cast(pa.int64())
            except pa.ArrowNotImplementedError:
                # 32-bit-backed temporal (date32/time32) casts via int32
                col = col.cast(pa.int32()).cast(pa.int64())
        elif not (pa.types.is_integer(typ) or pa.types.is_floating(typ)):
            continue
        mm = pc.min_max(col)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is None or hi is None:
            continue
        out[name] = [lo, hi]
    return _json.dumps(out)




#: Fixed Arrow schema for per-partition work-item datasets. from_items with
#: dict/list fields leaves Ray unable to hash block schemas ("Failed to hash
#: the schemas" spam on every task at bench scale); a typed Arrow table
#: keeps the logs clean and the blocks zero-copy.
WORK_ITEM_SCHEMA = pa.schema([
    ("pid", pa.int64()),
    ("stripe", pa.int64()),
    ("n_stripes", pa.int64()),
    ("files", pa.list_(pa.string())),
    ("vers", pa.list_(pa.int64())),  # per-file schema versions (scan/compact)
])


def work_items_dataset(items: list[dict], schema: pa.Schema = WORK_ITEM_SCHEMA) -> rd.Dataset:
    """One-row-per-task dataset with a FIXED Arrow schema, pre-split so each
    work item is its own block."""
    ds = rd.from_arrow(pa.Table.from_pylist(items, schema=schema))
    return ds.repartition(len(items)) if len(items) > 1 else ds


def _tombstone_count(t: pa.Table, spec: TableSpec) -> int:
    if spec.mode == "append" or spec.op_col not in t.column_names:
        return 0
    return pc.sum(
        pc.cast(pc.equal(t.column(spec.op_col), pa.scalar(spec.delete_op)), pa.int64())
    ).as_py() or 0


#: parquet footer key carrying the file's key bloom (Hudi-style file-level
#: point-lookup index; never in the manifest, so manifests stay slim)
BLOOM_META_KEY = b"vlm_eden.key_bloom"


def with_key_bloom(t: pa.Table, spec: TableSpec) -> pa.Table:
    """Attach a key bloom to the table's schema metadata (lands in the
    parquet footer). No-op for files too large for a useful filter at the
    byte budget — those are the clustered-compaction / zone-map regime."""
    from vlm_eden_dataset_etl_ray.functions.hashing import key_bloom_build

    payload = key_bloom_build(t.column(spec.key))
    if payload is None:
        return t
    md = dict(t.schema.metadata or {})
    md[BLOOM_META_KEY] = payload
    return t.replace_schema_metadata(md)


def _write_partition_delta(group: pa.Table, spec: TableSpec, staging_dir: str) -> pa.Table:
    """Final (stage-2) LWW reduce for one partition + idempotent delta write.
    Tombstones are KEPT in the delta so merge-on-read can mask older base
    rows (dropped only at compaction). Returns one metadata row."""
    pid = group.column("pid")[0].as_py()
    t = merge_engines.merge_table(group.drop_columns(["pid"]), spec)
    path = fsio.join(staging_dir, f"part-{int(pid):05d}.parquet")
    # stable name, direct write → a retried task overwrites itself; nothing
    # reads the file until the manifest referencing it commits
    nbytes = fsio.write_parquet(path, with_key_bloom(t, spec))
    lsns = t.column(spec.order)
    tomb = _tombstone_count(t, spec)
    return pa.table(
        {
            "pid": [int(pid)],
            "path": [path],
            "rows": [t.num_rows],
            "bytes": [nbytes],
            "min_lsn": [pc.min(lsns).as_py()],
            "max_lsn": [pc.max(lsns).as_py()],
            "tombstones": [int(tomb)],
            "stats": [file_stats_json(t)],
        },
        schema=_META_SCHEMA,
    )


def _epoch_id_of(files: list[str]) -> str:
    h = hashlib.sha256()
    for f in sorted(files):
        h.update(f.encode())
    return h.hexdigest()[:16]


def _already_applied(lake_dir: str, epoch_id: str) -> mf.Manifest | None:
    # Lineage is cumulative: the latest manifest carries every applied epoch
    # id since lake creation (and survives vacuum of older manifests), so one
    # membership check suffices — no O(epochs) manifest scan per apply.
    m = mf.latest(lake_dir)
    if m is None:
        return None
    if epoch_id in m.applied_epoch_ids:
        return m
    if m.lineage != "cumulative":
        # legacy lake (pre-marker manifests carry per-epoch lineage only):
        # union over every retained manifest before declaring "pending" —
        # re-applying an already-applied shard after a tombstone-dropping
        # compaction would resurrect deleted rows
        for e in mf.list_epochs(lake_dir):
            if epoch_id in mf.load(lake_dir, e).applied_epoch_ids:
                return m
    return None


def check_hash_fn(m: mf.Manifest | None) -> None:
    """Fail fast when the lake was written with a different key→partition
    hash implementation than the one active in this process (library swap or
    algorithm revision): continuing would split keys across partitions and
    surface duplicate rows per key at merge-on-read."""
    if m is not None and m.hash_fn and m.hash_fn != HASH_FN:
        raise RuntimeError(
            f"lake partition-hash mismatch: manifest epoch {m.epoch} was written "
            f"with hash_fn={m.hash_fn!r} but this process computes {HASH_FN!r}. "
            "Pin the original environment or rewrite the lake (full compaction "
            "under the old hash, then re-partition)."
        )


def _layout_spec(spec: TableSpec, m: mf.Manifest | None) -> TableSpec:
    """The lake's COMMITTED layout wins over the caller's spec: after
    :func:`..lake.rehash` the manifest's partition count differs from the
    spec constant, and writing with the stale count would split keys
    across layouts. ``spec.num_partitions`` is the initial default for a
    brand-new lake only."""
    if m is not None and m.num_partitions != spec.num_partitions:
        from dataclasses import replace

        return replace(spec, num_partitions=m.num_partitions)
    return spec


def _stateless_stage(batch: pa.Table, *, stage_cls, target, spec, extra) -> pa.Table:
    return stage_cls(target, spec, None, *extra)(batch)


def changelog_dataset(
    files: list[str],
    spec: TableSpec,
    registry=None,
    *,
    target_schema: pa.Schema | None = None,
    batch_size: int = 65536,
    prepare_concurrency=None,
    watermark_lsn: int | None = None,
    stage_cls=PrepareBatch,
    stage_extra_args: tuple = (),
) -> tuple[rd.Dataset, pa.Schema]:
    """Build the prepared (unified, pre-reduced, pid-tagged) Dataset from a
    set of changelog parquet files that may carry DIFFERENT physical schemas
    (older files predate add-column/widen migrations). Files are grouped by
    physical schema and each group is read + unified, then unioned."""
    if prepare_concurrency is None and registry is not None:
        # autoscaling actor pool sized to the session: leave CPUs for the
        # read tasks and the shuffle so no stage starves the others.
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        prepare_concurrency = (1, max(2, ncpu - 2))
    groups: dict[tuple, tuple[pa.Schema, list[str]]] = {}
    for f in files:
        s = fsio.read_parquet_schema(f)
        key = tuple(sorted((fl.name, str(fl.type)) for fl in s))
        groups.setdefault(key, (s, []))[1].append(f)
    target = target_schema
    if target is None:
        target = union_schemas([g[0] for g in groups.values()])
        if registry is not None:
            # migrations-first (reference cron_tasks.py:54-59): the registry
            # latest is authoritative — union it in (late old-schema shards
            # still widen up to it) and remove currently-dropped columns so
            # a DROP COLUMN migration erases their values from this epoch's
            # deltas even when pre-drop shards deliver late.
            latest_payload = ray.get(registry.schema.remote())
            drops = ray.get(registry.current_drops.remote())
            target = union_schemas([target, latest_payload])
            if drops:
                target = pa.schema([fl for fl in target if fl.name not in drops])
    pieces = []
    for s, fs in groups.values():
        ds = rd.read_parquet(fs)
        if watermark_lsn is not None and watermark_lsn >= 0:
            wm = watermark_lsn
            order = spec.order
            ds = ds.map_batches(
                lambda t, wm=wm, order=order: t.filter(pc.greater(t.column(order), wm)),
                batch_format="pyarrow",
            )
        if registry is None and prepare_concurrency is None:
            # no actor state needed (construction is trivial without the
            # registry handle) → stateless tasks, which scale elastically
            # with CPUs instead of ramping an autoscaling actor pool.
            ds = ds.map_batches(
                _stateless_stage,
                fn_kwargs={"stage_cls": stage_cls, "target": target, "spec": spec,
                           "extra": stage_extra_args},
                batch_format="pyarrow",
                batch_size=batch_size,
                zero_copy_batch=True,
                max_retries=3,
                retry_exceptions=True,
            )
        else:
            ds = ds.map_batches(
                stage_cls,
                fn_constructor_args=(target, spec, registry, *stage_extra_args),
                batch_format="pyarrow",
                batch_size=batch_size,
                zero_copy_batch=True,
                concurrency=prepare_concurrency,
                max_task_retries=3,  # actor tasks: system-failure retries
            )
        pieces.append(ds)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out, target


def _merge_slices_and_write(batch: pa.Table, spec: TableSpec, staging_dir: str) -> pa.Table:
    """File-shuffle phase B: one task per partition reads its spilled slices,
    LWW-reduces and writes the delta (stable name — retry-idempotent)."""
    out = []
    for row in batch.to_pylist():
        pid, files = int(row["pid"]), list(row["files"])
        stripe = int(row.get("stripe", 0))
        n_stripes = int(row.get("n_stripes", 1))
        tables = [fsio.read_parquet(f) for f in files]
        target = union_schemas([t.schema for t in tables])
        t = pa.concat_tables(sch.unify_table(t_, target) for t_ in tables)
        t = merge_engines.merge_table(t, spec)
        suffix = f"-s{stripe:02d}" if n_stripes > 1 else ""
        path = fsio.join(staging_dir, f"part-{pid:05d}{suffix}.parquet")
        # stable name, direct write
        nbytes = fsio.write_parquet(path, with_key_bloom(t, spec))
        lsns = t.column(spec.order)
        tomb = _tombstone_count(t, spec)
        out.append(
            {
                "pid": pid, "path": path, "rows": t.num_rows,
                "bytes": nbytes,
                "min_lsn": pc.min(lsns).as_py(), "max_lsn": pc.max(lsns).as_py(),
                "tombstones": int(tomb),
                "stats": file_stats_json(t),
            }
        )
    return pa.Table.from_pylist(out, schema=_META_SCHEMA)


def _resolve_schema_version(target: pa.Schema, spec: TableSpec, registry,
                            prev: mf.Manifest | None) -> int:
    """Register/validate the target schema BEFORE running the pipeline so a
    lossy/incompatible input fails fast with nothing staged (the registry
    actor serializes this, mirroring the reference's locked migrations,
    cron_tasks.py:54-59)."""
    payload_names = [
        n for n in target.names
        if n not in (spec.order, spec.op_col) and n not in spec.envelope
    ]
    payload = pa.schema([target.field(n) for n in payload_names])
    if registry is not None:
        return ray.get(registry.find_or_register.remote(payload))
    schema_version = prev.schema_version if prev else 1
    for v, known in sch.SCHEMA_VERSIONS.items():
        if known.equals(payload):
            schema_version = max(schema_version, v)
            break
    return schema_version


def apply_epoch(
    lake_dir: str,
    changelog_files: list[str],
    *,
    spec: TableSpec = TOKENS_SPEC,
    registry=None,
    epoch: int | None = None,
    batch_size: int = 65536,
    prepare_concurrency=None,
    shuffle: str = "file",
    stripe_bytes: int = 512 * 1024 * 1024,
    audit: list[tuple] | None = None,
) -> mf.Manifest:
    """Apply one epoch of changelog files to the lake. Exactly-once: an
    input set already recorded in a committed manifest is skipped; a crashed
    run (staging files but no manifest) is safely redone.

    ``audit``: write-audit-publish gate (Iceberg WAP shape) — a
    ``functions.quality`` rule list evaluated against the CANDIDATE
    snapshot (the post-merge live view of every partition this epoch
    touched, pinned to the unpublished manifest) AFTER the shuffle stages
    the delta files but BEFORE the atomic manifest publish. Any violation
    raises :class:`functions.quality.AuditError` (carrying the full
    report) and nothing is published: the epoch id is never recorded, so
    a corrected re-run re-applies, and the staged orphans are reclaimed
    by ``lake.vacuum`` once a later epoch commits their number. Because
    keys hash to partitions, a ``("unique", key)`` rule over the touched
    partitions IS a global uniqueness check. Scope is deliberately the
    table invariant (pre-existing rows of touched partitions are
    re-checked), not just the new rows — use ``quality.enforce`` on the
    changelog for rows-only gating without staging cost.

    ``shuffle``:
    - ``"file"`` (default): two-phase file shuffle — prepare tasks spill
      per-pid parquet slices to the (shared) lake store, then one task per
      partition merges its slices. Measured ~2× faster than the sort
      shuffle at 32 CPUs and scales with better constants (no global sort
      barrier, no sample stage).
    - ``"sort"``: idiomatic Ray Data ``groupby(pid).map_groups`` through the
      object store.
    """
    fsio.makedirs(lake_dir)
    if not changelog_files:
        # empty epoch: nothing to apply, state unchanged
        prev = mf.latest(lake_dir)
        if prev is not None:
            return prev
        m = mf.Manifest(epoch=epoch or 1, num_partitions=spec.num_partitions,
                        schema_version=1, kind="delta", partitions={},
                        hash_fn=HASH_FN)
        mf.commit(lake_dir, m)
        return m
    epoch_id = _epoch_id_of(changelog_files)
    done = _already_applied(lake_dir, epoch_id)
    if done is not None:
        return done

    prev = mf.latest(lake_dir)
    check_hash_fn(prev)
    spec = _layout_spec(spec, prev)
    audit = _with_registry_constraints(audit, registry)
    if epoch is None:
        epoch = (prev.epoch + 1) if prev else 1
    if mf.is_committed(lake_dir, epoch):
        raise FileExistsError(f"epoch {epoch} committed with different inputs")

    staging_dir = fsio.join(lake_dir, "staging", f"epoch={epoch}")
    shuffle_dir = fsio.join(staging_dir, "shuffle")
    fsio.makedirs(staging_dir)

    dlq_dir = (fsio.join(lake_dir, "_dead_letter", epoch_id)
               if spec.on_bad_rows == "dead_letter" else None)
    if shuffle == "file":
        ds, target = changelog_dataset(
            changelog_files, spec, registry,
            batch_size=batch_size, prepare_concurrency=prepare_concurrency,
            stage_cls=PrepareAndSpill, stage_extra_args=(shuffle_dir, dlq_dir),
        )
    else:
        ds, target = changelog_dataset(
            changelog_files, spec, registry,
            batch_size=batch_size, prepare_concurrency=prepare_concurrency,
            stage_extra_args=(dlq_dir,),
        )

    schema_version = _resolve_schema_version(target, spec, registry, prev)
    return _stage_and_commit(
        lake_dir, ds, spec=spec, schema_version=schema_version, prev=prev,
        epoch=epoch, epoch_id=epoch_id, input_files=changelog_files,
        staging_dir=staging_dir, shuffle_dir=shuffle_dir, shuffle=shuffle,
        stripe_bytes=stripe_bytes,
        write_schema=merge_engines.state_schema(target, spec),
        audit=audit,
    )


def _with_registry_constraints(audit: list[tuple] | None,
                               registry) -> list[tuple] | None:
    """Merge the registry's persistent table constraints (Delta CHECK
    shape, ``SchemaRegistryState.set_constraints``) into the caller's
    audit list — registered once, enforced by every registry-backed
    writer thereafter."""
    if registry is None:
        return audit
    rules = ray.get(registry.constraints.remote())
    if not rules:
        return audit
    merged = [tuple(r) for r in rules]
    for r in audit or []:
        if tuple(r) not in merged:
            merged.append(tuple(r))
    return merged


def _audit_candidate(lake_dir: str, m: mf.Manifest, spec: TableSpec,
                     rules: list[tuple], pids: list[int]) -> None:
    """Write-audit-publish: evaluate ``rules`` over the merge-on-read live
    view of the touched partitions, pinned to the UNPUBLISHED candidate
    manifest, and raise :class:`quality.AuditError` on any violation. The
    scan streams (distributed merge tasks, one per partition/stripe); only
    the tiny per-rule report reaches the driver."""
    from vlm_eden_dataset_etl_ray import lake as lk
    from vlm_eden_dataset_etl_ray.functions import quality

    if not pids:  # nothing staged: empty candidate cannot add violations
        return
    ds = lk.scan(lake_dir, spec=spec, manifest=m, pids=pids)
    rep = quality.expectation_report(ds, rules)
    bad = rep.filter(pc.greater(rep.column("violations"), pa.scalar(0)))
    if bad.num_rows:
        parts = [f"{r['rule']}: {r['violations']}/{r['checked']}"
                 for r in bad.to_pylist()]
        raise quality.AuditError(
            f"audit failed for epoch {m.epoch} of {lake_dir} — manifest NOT "
            f"published; violations: " + "; ".join(parts), report=rep)


def _stage_and_commit(
    lake_dir: str,
    ds: rd.Dataset,
    *,
    spec: TableSpec,
    schema_version: int,
    prev: mf.Manifest | None,
    epoch: int,
    epoch_id: str,
    input_files: list[str],
    staging_dir: str,
    shuffle_dir: str,
    shuffle: str,
    stripe_bytes: int,
    write_schema: pa.Schema | None = None,
    audit: list[tuple] | None = None,
) -> mf.Manifest:
    """Shared epoch tail: run the prepared dataset's shuffle (file or sort),
    build the manifest and publish it race-safely. ``ds`` must already be
    the PREPARED dataset (unified schema, pre-reduced, pid-tagged — or, for
    the file path, PrepareAndSpill metadata rows)."""
    if shuffle == "file":
        # phase A: spill per-pid slices (tiny metadata rows come back)
        slice_meta = ds.take_all()
        by_pid: dict[int, list[tuple[str, int]]] = {}
        for r in slice_meta:
            by_pid.setdefault(int(r["pid"]), []).append((r["path"], int(r["bytes"])))
        # Hot-partition striping (the north-star's salted sub-partitions):
        # a partition whose slice volume exceeds stripe_bytes is merged by
        # several stripe tasks (each over a subset of slices) that write
        # part-P-sK deltas; merge-on-read LWW resolves keys spanning
        # stripes, so no final combine is needed — the merge-task input is
        # bounded regardless of how skewed the partition is.
        items = []
        for pid, fs in sorted(by_pid.items()):
            total = sum(b for _, b in fs)
            if total <= stripe_bytes or len(fs) < 2:
                items.append({"pid": pid, "stripe": 0, "n_stripes": 1,
                              "files": [f for f, _ in fs]})
                continue
            stripes: list[list[str]] = [[]]
            acc = 0
            for f, b in fs:
                if acc + b > stripe_bytes and stripes[-1]:
                    stripes.append([])
                    acc = 0
                stripes[-1].append(f)
                acc += b
            for k, sub in enumerate(stripes):
                items.append({"pid": pid, "stripe": k, "n_stripes": len(stripes),
                              "files": sub})
        # phase B: one merge task per partition
        if items:
            merged = work_items_dataset(items)
            meta_rows = merged.map_batches(
                _merge_slices_and_write,
                fn_kwargs={"spec": spec, "staging_dir": staging_dir},
                batch_size=1,
                batch_format="pyarrow",
                max_retries=3,
                retry_exceptions=True,
            ).take_all()
        else:
            meta_rows = []
    else:
        meta_rows = (
            ds.groupby("pid")
            .map_groups(
                _write_partition_delta,
                fn_kwargs={"spec": spec, "staging_dir": staging_dir},
                batch_format="pyarrow",
            )
            .take_all()  # ≤ num_partitions tiny rows
        )

    def _build_manifest(base: mf.Manifest | None, at_epoch: int) -> mf.Manifest:
        parts: dict[int, mf.PartitionState] = {}
        if base:
            for pid, st in base.partitions.items():
                parts[pid] = mf.PartitionState.from_json(st.to_json())
        for r in meta_rows:
            pid = int(r["pid"])
            st = parts.setdefault(pid, mf.PartitionState(pid=pid))
            if len(st.delta_vers) != len(st.deltas):
                # legacy (pre-version-tracking) manifest: backfill with the
                # base manifest's version before appending precise entries
                st.delta_vers = [base.schema_version if base else schema_version
                                 ] * len(st.deltas)
            if len(st.base_vers) != len(st.base):
                st.base_vers = [base.schema_version if base else schema_version
                                ] * len(st.base)
            st.deltas.append(r["path"])
            st.delta_vers.append(schema_version)
            if r.get("stats"):
                import json as _json

                st.file_stats[r["path"]] = _json.loads(r["stats"])
            st.rows += int(r["rows"])
            st.bytes += int(r["bytes"])
            st.watermark_lsn = max(st.watermark_lsn, int(r["max_lsn"]))
            st.applied_lsn_ranges = mf.merge_ranges(
                st.applied_lsn_ranges, int(r["min_lsn"]), int(r["max_lsn"])
            )
        # cumulative lineage: base's full history + this epoch's inputs, so
        # the newest manifest alone survives vacuum as the exactly-once
        # record. A LEGACY (per-epoch) base carries only its own epoch's
        # lists — cumulative_lineage unions over all retained manifests so
        # the upgrade to a cumulative manifest loses no applied ids.
        prior_ids, prior_inputs = mf.cumulative_lineage(lake_dir, base)
        # cumulative write schema: prior manifests' union + this epoch's —
        # makes sparse widening epochs visible to every scan immediately
        prior_schema = mf.decode_schema(base.schema_b64) if base else None
        rec = [s for s in (prior_schema, write_schema) if s is not None]
        return mf.Manifest(
            epoch=at_epoch,
            num_partitions=spec.num_partitions,
            schema_version=schema_version,
            kind="delta",
            partitions=parts,
            applied_epoch_ids=prior_ids + [epoch_id],
            applied_inputs=sorted(set(prior_inputs) | set(input_files)),
            hash_fn=HASH_FN,
            schema_b64=mf.encode_schema(union_schemas(rec) if rec else None),
        )

    # Race-safe publish: if another driver commits our epoch number first,
    # either it applied the SAME inputs (we're done — exactly-once) or it
    # applied different ones, in which case we rebase our delta files onto
    # the new latest manifest and retry with the next epoch number. Delta
    # file paths are absolute, so the staging dir's epoch label not matching
    # the final epoch number is harmless.
    m = _build_manifest(prev, epoch)
    changed_pids = sorted({int(r["pid"]) for r in meta_rows})
    while True:
        if audit:
            # WAP gate: check the exact candidate about to publish — on a
            # publish-race rebase the post-merge state differs, so the
            # audit re-runs against the rebased manifest.
            try:
                _audit_candidate(lake_dir, m, spec, audit, changed_pids)
            except Exception:
                # shuffle slices are worthless after staging (a re-run
                # re-prepares from the inputs); the staged deltas stay as
                # vacuum-reclaimable orphans since no manifest names them
                fsio.delete_dir(shuffle_dir)
                raise
        try:
            mf.commit(lake_dir, m)
            break
        except FileExistsError:
            other = mf.load(lake_dir, m.epoch)
            if epoch_id in other.applied_epoch_ids:
                return other
            latest2 = mf.latest(lake_dir)
            if latest2.num_partitions != spec.num_partitions:
                # a concurrent rehash changed the layout: our delta files
                # are bucketed under the OLD partition count and cannot be
                # grafted onto the new manifest — rebasing would split keys
                # across layouts. Nothing committed; a re-run re-shuffles
                # under the new layout (the epoch_id was never recorded).
                raise RuntimeError(
                    f"apply lost the publish race to a rehash "
                    f"({spec.num_partitions} → {latest2.num_partitions} "
                    "partitions); re-run this epoch — it will follow the "
                    "new committed layout")
            m = _build_manifest(latest2, latest2.epoch + 1)
    # shuffle slices are transient: safe to drop once the epoch is committed
    fsio.delete_dir(shuffle_dir)
    return m


def apply_epoch_dataset(
    lake_dir: str,
    ds: rd.Dataset,
    *,
    epoch_id: str,
    spec: TableSpec = TOKENS_SPEC,
    registry=None,
    epoch: int | None = None,
    batch_size: int = 65536,
    stripe_bytes: int = 512 * 1024 * 1024,
    target_schema: pa.Schema | None = None,
    input_files: list[str] | None = None,
    audit: list[tuple] | None = None,
) -> mf.Manifest:
    """Apply a PREPARED-INPUT epoch directly from a Dataset — no scratch
    write→read round trip for derived changelogs (``replay_events`` /
    ``run_etl`` previously wrote the enriched changelog to parquet only to
    re-read it; this path streams it straight into the partition shuffle).

    Exactly-once lineage is keyed on the caller-provided ``epoch_id`` — a
    content hash of whatever defines the derived input (source file set +
    transform parameters). Same id ⇒ skipped; the retry/crash story is
    identical to :func:`apply_epoch` (stable staging names, 2PC manifest).

    ``target_schema``: pass when the input's schema is statically known —
    it skips the ``ds.schema()`` sample execution AND keeps an all-empty
    input applyable (Ray Data reports ``None`` for the schema of a dataset
    whose every block is empty, e.g. a DML statement that matched nothing;
    such an epoch still commits, recording its id in the ledger).

    ``input_files``: record these paths in the manifest's cumulative input
    lineage instead of the synthetic ``dataset:<epoch_id>`` marker — for
    tails whose shards are not parquet (e.g. Debezium JSONL envelopes) so
    pending-file discovery works across formats.
    """
    fsio.makedirs(lake_dir)
    done = _already_applied(lake_dir, epoch_id)
    if done is not None:
        return done
    prev = mf.latest(lake_dir)
    check_hash_fn(prev)
    spec = _layout_spec(spec, prev)
    audit = _with_registry_constraints(audit, registry)
    if epoch is None:
        epoch = (prev.epoch + 1) if prev else 1
    if mf.is_committed(lake_dir, epoch):
        raise FileExistsError(f"epoch {epoch} committed with different inputs")

    staging_dir = fsio.join(lake_dir, "staging", f"epoch={epoch}")
    shuffle_dir = fsio.join(staging_dir, "shuffle")
    fsio.makedirs(staging_dir)

    if target_schema is not None:
        target = target_schema
    else:
        s = ds.schema()
        if s is None:
            raise ValueError(
                "input dataset has no inferable schema (every block is "
                "empty); pass target_schema= explicitly")
        target = pa.schema(list(zip(s.names, s.types)))
    dlq_dir = (fsio.join(lake_dir, "_dead_letter", epoch_id)
               if spec.on_bad_rows == "dead_letter" else None)
    prepared = ds.map_batches(
        _stateless_stage,
        fn_kwargs={"stage_cls": PrepareAndSpill, "target": target, "spec": spec,
                   "extra": (shuffle_dir, dlq_dir)},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        max_retries=3,
        retry_exceptions=True,
    )
    schema_version = _resolve_schema_version(target, spec, registry, prev)
    return _stage_and_commit(
        lake_dir, prepared, spec=spec, schema_version=schema_version, prev=prev,
        epoch=epoch, epoch_id=epoch_id,
        input_files=input_files if input_files is not None
        else [f"dataset:{epoch_id}"],
        staging_dir=staging_dir, shuffle_dir=shuffle_dir, shuffle="file",
        stripe_bytes=stripe_bytes,
        write_schema=merge_engines.state_schema(target, spec),
        audit=audit,
    )
