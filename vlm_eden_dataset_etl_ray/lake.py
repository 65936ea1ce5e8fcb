"""Merge-on-read scans and compaction for the partitioned Parquet lake.

The lake is the engine's replacement for the reference's per-tenant
Postgres star schema: state = base files ∪ epoch delta files per hash
partition, and a read reconstructs current rows by the same LWW reduce used
at write time (tombstones mask older versions, then drop — the reference's
``not fs.deleted`` view filter, ``migrations/20230426_01_BozYM.sql:5-11``).

Because files are already partitioned by ``pid``, merge-on-read needs NO
shuffle: one task per partition reads exactly its own base+delta files
(driven off the committed manifest) — the layout that keeps a 100 TB lake
readable without an all-to-all exchange.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from vlm_eden_dataset_etl_ray import fsio
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray import schema as sch
from vlm_eden_dataset_etl_ray.apply import union_schemas, work_items_dataset
from vlm_eden_dataset_etl_ray.spec import TableSpec, TOKENS_SPEC
from vlm_eden_dataset_etl_ray.stages import lww
from vlm_eden_dataset_etl_ray.stages import merge_engines as me


#: Seed of the SECOND (stripe) key hash — must differ from the partition
#: hash seed (0) so stripes subdivide a partition rather than mirror it.
STRIPE_SEED = 7


def stripe_filter(t: pa.Table, spec: TableSpec, stripe: int, n_stripes: int) -> pa.Table:
    """Rows of ``t`` whose key belongs to ``stripe`` (of ``n_stripes``).
    Commutes with the LWW reduce (it partitions by key), so it can be
    applied before merging."""
    from vlm_eden_dataset_etl_ray.functions.hashing import partition_ids

    if n_stripes <= 1:
        return t
    sid = partition_ids(t.column(spec.key), n_stripes, seed=STRIPE_SEED)
    return t.filter(pa.array(sid == stripe))


def _evolution_maps(reg, spec: TableSpec):
    """(exclude, activations, renames) from the registry — augmented, for
    non-LWW merge engines, with the ``__seq__<col>`` twins: a registry
    rename/drop/re-add of a value column governs its per-column seq state
    the same way (the seq column is named after the user column in every
    file, so it renames/drops/re-activates in lockstep)."""
    exclude = set(reg.current_drops()) if reg else None
    activations = reg.column_activations() if reg else None
    renames = (reg.column_renames() or None) if reg else None
    if spec.merge_engine != "lww":
        if exclude:
            exclude |= {p + c for c in list(exclude)
                        for p in me.twin_prefixes(spec, c)}
        if activations:
            activations = {**activations,
                           **{p + c: v for c, v in activations.items()
                              for p in me.twin_prefixes(spec, c)}}
        if renames:
            renames = {**renames,
                       **{p + cur: [(p + old, v) for old, v in chain]
                          for cur, chain in renames.items()
                          for p in me.twin_prefixes(spec, cur)}}
    return exclude, activations, renames


def merge_partition_files(
    files: list[str],
    spec: TableSpec,
    *,
    columns: list[str] | None = None,
    live_only: bool = True,
    stripe: int = 0,
    n_stripes: int = 1,
    file_versions: dict[str, int] | None = None,
    activations: dict[str, int] | None = None,
    exclude: frozenset[str] | set[str] | None = None,
    renames: dict[str, list] | None = None,
    finalize: bool = False,
    key_filter=None,
) -> pa.Table:
    """Read one partition's (or stripe's) files — any mix of schema
    versions — unify to the widest schema, LWW-reduce, and (optionally)
    drop tombstones. With ``n_stripes > 1`` only the ``stripe``'s keys are
    kept (applied per file, before the merge: stripe membership partitions
    by key, so it commutes with LWW).

    ``renames`` (current name → rename chain, from
    ``SchemaRegistryState.column_renames``) maps each file's STORED column
    name to the current one by the file's version — a registry-recorded
    rename preserves history, so pre-rename files keep contributing their
    values under the new name.

    Drop-column evolution (reference migrations/20241029_01_JnkId.sql):
    ``exclude`` = currently-tombstoned columns, removed from every file
    before the merge; ``activations`` = re-added column → version its
    current generation started at — a file whose ``file_versions`` entry
    predates the activation reads that column as NULL (a re-add is a fresh
    column; pre-drop values must not resurrect). Masking per file BEFORE
    the whole-row LWW merge keeps rows internally consistent.

    Column pruning is pushed into the parquet read: only ``columns`` plus the
    merge-required envelope (key, order, op) leave storage."""
    from vlm_eden_dataset_etl_ray.state.registry import historical_name

    read_cols = None
    if columns:
        need = {spec.key, spec.order, spec.op_col}
        if spec.merge_engine != "lww":
            # engine-internal state columns are merge-required: per-column
            # seqs for every projected value column + the delete barrier
            for c in columns:
                if not me.is_internal(c):
                    need.update(me.internal_twins(spec, c))
            need.update((me.DEL_COL, me.LIVE_COL, me.AGG_STATE_COL))
        read_cols = list(dict.fromkeys(list(columns) + [c for c in need if c not in columns]))
    tables = []
    for f in files:
        fv = (file_versions or {}).get(f, 0)
        # stored-name → current-name map for THIS file's version
        ren: dict[str, str] = {}
        if renames:
            for cur, chain in renames.items():
                hist = historical_name(cur, chain, fv)
                if hist != cur:
                    ren[hist] = cur
        if read_cols is None:
            t = fsio.read_parquet(f)
        else:
            wanted = [next((o for o, c in ren.items() if c == rc), rc)
                      for rc in read_cols]
            avail = set(fsio.read_parquet_schema(f).names)
            t = fsio.read_parquet(f, columns=[c for c in wanted if c in avail])
        if ren:
            # apply stored→current only where the current name isn't
            # already present (a file never legitimately carries both)
            eff = {o: c for o, c in ren.items() if c not in t.column_names}
            new_names = [eff.get(c, c) for c in t.column_names]
            if new_names != t.column_names:
                t = t.rename_columns(new_names)
        if exclude and any(c in exclude for c in t.column_names):
            t = t.select([c for c in t.column_names if c not in exclude])
        if activations and file_versions:
            fv = file_versions.get(f, 0)
            for c, av in activations.items():
                if fv < av and c in t.column_names:
                    i = t.column_names.index(c)
                    t = t.set_column(
                        i, t.schema.field(i),
                        pa.nulls(t.num_rows, t.schema.field(i).type))
        if key_filter is not None and spec.key in t.column_names:
            # point-read restriction BEFORE the merge: merge semantics are
            # per-key (LWW / partial / aggregate folds never mix keys), so
            # dropping other keys' rows cannot change the asked keys'
            # resolution — and the sort/fold then costs O(asked), not
            # O(file). Tombstones for asked keys pass the filter and mask
            # as usual.
            t = t.filter(pc.is_in(t.column(spec.key), value_set=key_filter))
        tables.append(stripe_filter(t, spec, stripe, n_stripes))
    target = union_schemas([t.schema for t in tables])
    tables = [sch.unify_table(t, target) for t in tables]
    t = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    t = me.merge_table(t, spec)
    if live_only:
        t = lww.drop_tombstones(t, spec)
    if finalize:
        t = me.finalize_read(t, spec)
    if columns:
        # a column added by a later epoch may be absent from EVERY file of
        # this partition — it still projects, as nulls (null-typed here;
        # the caller's output-schema unify casts them to the real type)
        for c in columns:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows, pa.null()))
        t = t.select(columns)
    return t


def _merge_read(batch: pa.Table, spec: TableSpec, columns, live_only: bool,
                schema: pa.Schema, predicate=None, activations=None,
                exclude=None, renames=None, finalize: bool = False,
                key_filter=None):
    """One stateless task per partition STRIPE: manifest-driven read of the
    stripe's base file(s) plus the partition's deltas (filtered to the
    stripe's keys). ``key_filter`` (point reads): files whose footer key
    bloom PROVES no asked key is present are skipped without reading a row
    group — safe at any delta depth because merge resolution is per-key, so
    a file holding none of the asked keys contributes nothing to them."""
    if key_filter is not None:
        from vlm_eden_dataset_etl_ray.apply import BLOOM_META_KEY
        from vlm_eden_dataset_etl_ray.functions.hashing import (
            key_bloom_may_contain_any, key_bloom_probe_hashes)

        h1, h2 = key_bloom_probe_hashes(key_filter)

        def _may_hold(f: str) -> bool:
            md = fsio.read_parquet_schema(f).metadata or {}
            payload = md.get(BLOOM_META_KEY)
            return payload is None or key_bloom_may_contain_any(payload, h1, h2)

    for row in batch.to_pylist():
        files = list(row["files"])
        vers = row.get("vers") or []
        if key_filter is not None and files:
            pairs = [(f, v) for f, v in
                     (zip(files, vers) if vers else ((f, 0) for f in files))
                     if _may_hold(f)]
            files = [f for f, _ in pairs]
            vers = [v for _, v in pairs] if vers else []
        if not files:
            continue
        t = merge_partition_files(
            files, spec, columns=columns, live_only=live_only,
            stripe=int(row.get("stripe", 0)), n_stripes=int(row.get("n_stripes", 1)),
            file_versions=dict(zip(files, vers)) if vers else None,
            activations=activations, exclude=exclude, renames=renames,
            finalize=finalize, key_filter=key_filter,
        )
        t = sch.unify_table(t, schema)
        if predicate is not None:
            t = t.filter(predicate(t))
        yield t


def _output_schema(m: mf.Manifest, spec: TableSpec, columns, live_only,
                   exclude: set[str] | None = None,
                   renames: dict | None = None,
                   registry_schema: pa.Schema | None = None) -> pa.Schema:
    """Unified schema of a scan — derived from one non-empty partition's
    file footers (cheap driver-side metadata read), minus currently-dropped
    columns. ``registry_schema`` (the registry's CURRENT schema) types
    requested columns that no file carries yet — a column added by a
    migration with no epoch after it projects as nulls, per ALTER TABLE
    ADD COLUMN semantics."""
    schemas = []
    for pid in sorted(m.partitions):
        for f in m.files(pid):
            schemas.append(fsio.read_parquet_schema(f))
        if schemas:
            break
    if not schemas:
        return pa.schema([])
    # the manifest's cumulative write schema covers columns added by SPARSE
    # epochs (DML / MERGE / view refresh) whose files live in partitions the
    # footer sample above didn't touch
    rec = mf.decode_schema(m.schema_b64)
    if rec is not None:
        if renames:
            # the cumulative union may carry BOTH sides of a rename; keep
            # only the current name (values recover via the footer mapping).
            # A column added by a sparse epoch and renamed later may exist in
            # rec ONLY under its old name — strip it only when the current
            # name is ALSO present, else let the fwd mapping below rename it
            # (the 'not in s_.names' guard prevents duplicate-name output).
            old2cur = {o: cur for cur, chain in renames.items()
                       for o, _ in chain if o != cur}
            have = set(rec.names)
            rec = pa.schema([f for f in rec
                             if f.name not in old2cur
                             or old2cur[f.name] not in have])
        schemas.append(rec)
    if renames:
        # footer fields (and the recorded pre-rename union) may carry old
        # names; map them forward
        fwd = {o: cur for cur, chain in renames.items() for o, _ in chain}
        mapped = []
        for s_ in schemas:
            names = [fwd.get(n, n) if fwd.get(n, n) not in s_.names else n
                     for n in s_.names]
            mapped.append(pa.schema(
                [pa.field(nn, f.type) for nn, f in zip(names, s_)]))
        schemas = mapped
    target = union_schemas(schemas)
    if exclude:
        target = pa.schema([f for f in target if f.name not in exclude])
    if registry_schema is not None:
        for f in registry_schema:
            if target.get_field_index(f.name) < 0 and \
                    (not exclude or f.name not in exclude):
                target = target.append(f)
    if columns:
        target = pa.schema([target.field(c) for c in columns])
    return target


def _scan_items(m: mf.Manifest, pids=None) -> list[dict]:
    """Work items: one per partition, or one per STRIPE for partitions whose
    manifest records a split layout. A stripe's task reads its own base
    file(s) plus the partition's deltas (delta files span stripes and are
    filtered by the stripe hash at read time — deltas are the small
    between-compactions fraction, the LSM read-amplification tradeoff).
    ``vers`` parallels ``files`` with each file's written-at schema version
    (drop/re-add masking input). ``pids`` restricts to those partitions
    (key-restricted reads prune partitions they cannot touch)."""
    items: list[dict] = []
    want = None if pids is None else set(int(p) for p in pids)
    for pid in sorted(m.partitions):
        st = m.partitions[pid]
        if not m.files(pid):
            continue
        if want is not None and pid not in want:
            continue
        fver = st.file_versions(m.schema_version)
        k = max(1, st.stripe_count)
        if k == 1:
            fs = m.files(pid)
            items.append({"pid": pid, "stripe": 0, "n_stripes": 1,
                          "files": fs, "vers": [fver[f] for f in fs]})
            continue
        stripes_of = (st.base_stripes if len(st.base_stripes) == len(st.base)
                      else [-1] * len(st.base))
        for s in range(k):
            fs = [f for f, fstripe in zip(st.base, stripes_of)
                  if fstripe in (s, -1)] + list(st.deltas)
            if fs:
                items.append({"pid": pid, "stripe": s, "n_stripes": k,
                              "files": fs, "vers": [fver[f] for f in fs]})
    return items


def _stats_bound(v, typ: pa.DataType | None):
    """Normalize a probe bound the way ``apply.file_stats_json`` normalizes
    recorded values: the value is first brought to the COLUMN's own type,
    then temporal types cast to their int64 representation — so a date32
    bound compares in DAYS and a timestamp bound in its own unit, exactly
    matching what the write path recorded."""
    if typ is not None and pa.types.is_temporal(typ):
        arr = pa.array([v], typ)
        try:
            return arr.cast(pa.int64())[0].as_py()
        except pa.ArrowNotImplementedError:
            return arr.cast(pa.int32()).cast(pa.int64())[0].as_py()
    return v


def _apply_stats_filter(m: mf.Manifest, spec: TableSpec, items: list[dict],
                        stats_filter: tuple, predicate,
                        col_type: pa.DataType | None = None):
    """Zone-map pruning of scan work items + the exact residual predicate.
    Returns (pruned items, composed predicate)."""
    col, lo, hi = stats_filter
    lo_n, hi_n = _stats_bound(lo, col_type), _stats_bound(hi, col_type)

    def _intersects(pid: int, f: str) -> bool:
        st = m.partitions[pid].file_stats.get(f, {}).get(col)
        return st is None or not (st[1] < lo_n or st[0] > hi_n)

    pruned: list[dict] = []
    for it in items:
        keep = [(f, v) for f, v in zip(it["files"], it["vers"])
                if _intersects(int(it["pid"]), f)]
        if not keep:
            continue  # no file of this key-disjoint unit can hold a match
        # Per-FILE skipping is safe for append tables always, and for
        # upsert tables exactly while the partition holds NO delta files:
        # post-compaction every key lives in exactly one (cluster-sorted)
        # base file, so skipping an out-of-range file cannot expose an
        # older version elsewhere. Once deltas accumulate, an out-of-order
        # straggler (older LSN in a newer delta) could win a merge whose
        # newer base row was pruned — so fall back to all-or-nothing.
        file_prunable = (spec.mode == "append"
                         or not m.partitions[int(it["pid"])].deltas)
        if file_prunable and len(keep) < len(it["files"]):
            it = {**it, "files": [f for f, _ in keep], "vers": [v for _, v in keep]}
        pruned.append(it)

    def _exact(t: pa.Table, _prev=predicate) -> pa.ChunkedArray:
        c = t.column(col)
        ok = pc.and_kleene(pc.greater_equal(c, pa.scalar(lo)),
                           pc.less_equal(c, pa.scalar(hi)))
        ok = pc.fill_null(ok, False)
        if _prev is not None:
            ok = pc.and_(ok, _prev(t))
        return ok

    return pruned, _exact


def scan(
    lake_dir: str,
    *,
    spec: TableSpec = TOKENS_SPEC,
    columns: list[str] | None = None,
    live_only: bool = True,
    manifest: mf.Manifest | None = None,
    predicate=None,
    asof_epoch: int | None = None,
    pids=None,
    stats_filter: tuple | None = None,
    key_filter=None,
) -> rd.Dataset:
    """Streaming merge-on-read scan of the latest committed snapshot.

    Returns a Dataset with one block per partition; downstream transforms
    stream with backpressure as usual. ``predicate`` is a function
    ``pa.Table -> pa.BooleanArray`` applied AFTER the LWW merge (filtering
    before the merge would resurrect older row versions). ``asof_epoch``
    time-travels to that committed epoch's snapshot (must not be vacuumed).
    ``pids`` restricts to those hash partitions — the pruning a
    key-restricted read uses (keys hash to partitions, so partitions
    outside the key set cannot hold a matching row).

    ``stats_filter=(col, lo, hi)`` — inclusive range — is the ZONE-MAP
    path: files whose recorded min/max (``PartitionState.file_stats``,
    written with every delta/compaction) cannot intersect the range are
    skipped before any data is read, then the exact range predicate is
    still applied post-merge, so the result equals a plain filter. Skip
    granularity follows merge correctness: an APPEND table drops
    individual files; an UPSERT table drops individual files only while
    the partition has NO deltas (post-compaction, keys unique per file —
    the window ``compact(cluster_by=...)`` is built for) and otherwise
    only a whole work item (a key-disjoint partition/stripe — skipping
    one of a partition's files could let an out-of-order straggler in a
    delta resurrect an older version of a key whose newest record was
    pruned). Files with no recorded stats are always read. The realistic
    win is time-ordered columns (watermark / recent-window reads touch
    only recent epochs' files).

    ``key_filter`` (an Arrow array / list of key values) is the POINT-READ
    path: files whose footer key bloom (written with every delta and
    compacted file up to a size budget; see ``apply.with_key_bloom``)
    proves no asked key is present are skipped without reading a row
    group, and surviving files are restricted to the asked keys BEFORE
    the merge — both safe at any delta depth because merge resolution is
    per-key. With ``pids`` unset, the asked keys' hash partitions are
    derived automatically (partitions outside the key set cannot hold a
    matching row). Result equals a post-scan ``is_in`` filter."""
    if key_filter is not None and not isinstance(key_filter, pa.Array):
        key_filter = (key_filter.combine_chunks()
                      if isinstance(key_filter, pa.ChunkedArray)
                      else pa.array(list(key_filter)))
    if manifest is None and asof_epoch is not None:
        manifest = mf.load(lake_dir, asof_epoch)
    m = manifest or mf.latest(lake_dir)
    if m is None:
        return rd.from_items([])
    if key_filter is not None and pids is None:
        from vlm_eden_dataset_etl_ray.functions.hashing import partition_ids

        pids = sorted(set(
            partition_ids(key_filter, m.num_partitions).tolist()))
    if any(st.stripe_count > 1 for st in m.partitions.values()):
        # striped reads re-derive stripe membership by hashing keys — refuse
        # to read under a different hash implementation than wrote the layout
        from vlm_eden_dataset_etl_ray.apply import check_hash_fn

        check_hash_fn(m)
    # drop/re-add evolution state (registry-backed lakes only): tombstoned
    # columns leave the projection; re-added columns mask pre-activation files
    from vlm_eden_dataset_etl_ray.state.registry import SchemaRegistryState

    reg = SchemaRegistryState.load_readonly(lake_dir)
    exclude, activations, renames = _evolution_maps(reg, spec)
    try:
        reg_schema = reg.schema() if reg else None
    except (ValueError, KeyError):  # registry present but empty
        reg_schema = None
    out_schema = _output_schema(m, spec, columns, live_only, exclude=exclude,
                                renames=renames, registry_schema=reg_schema)
    # user-facing live scans of non-LWW merge-engine tables hide the
    # engine-internal state columns (__seq__*/__del_lsn/…); time-travel /
    # feed scans (live_only=False) expose the raw state view
    finalize = spec.merge_engine != "lww" and live_only
    if finalize and columns is None:
        out_schema = pa.schema(
            [f for f in out_schema if not me.is_internal(f.name)])
    items = _scan_items(m, pids=pids)
    if stats_filter is not None:
        # one (col, lo, hi) range or a LIST of ranges ANDed together —
        # the multi-dimensional probe shape z-order clustering serves
        filters = ([stats_filter] if isinstance(stats_filter, tuple)
                   else list(stats_filter))
        for sf in filters:
            if columns and sf[0] not in columns:
                raise ValueError(
                    f"stats_filter column {sf[0]!r} must be in the "
                    f"projection {columns} (the exact residual filter runs "
                    "on the projected batch)")
            ctyp = (out_schema.field(sf[0]).type
                    if out_schema.get_field_index(sf[0]) >= 0 else None)
            items, predicate = _apply_stats_filter(
                m, spec, items, sf, predicate, col_type=ctyp)
    if not items:
        return rd.from_items([])
    ds = work_items_dataset(items)
    return ds.map_batches(
        _merge_read,
        fn_kwargs={
            "spec": spec,
            "columns": columns,
            "live_only": live_only,
            "schema": out_schema,
            "predicate": predicate,
            "activations": activations or None,
            "exclude": exclude or None,
            "renames": renames,
            "finalize": finalize,
            "key_filter": key_filter,
        },
        batch_size=1,
        batch_format="pyarrow",
    )


def lookup(
    lake_dir: str,
    keys,
    *,
    spec: TableSpec = TOKENS_SPEC,
    columns: list[str] | None = None,
    live_only: bool = True,
    manifest: mf.Manifest | None = None,
) -> pa.Table:
    """Point reads: the current row(s) for ``keys`` (list / Arrow array).

    The reference serves "give me doc X" from Postgres by primary key;
    here keys hash to their partitions, ONLY those partitions merge-on-
    read (``scan(pids=…)``), and a vectorized ``is_in`` keeps the asked
    rows — work scales with the touched partitions, result with
    ``len(keys)``. Returns a driver-side table sorted by key (bounded by
    the ask, so driver-safe by construction)."""
    from vlm_eden_dataset_etl_ray.functions.hashing import partition_ids

    karr = keys if isinstance(keys, (pa.Array, pa.ChunkedArray)) else pa.array(keys)
    if isinstance(karr, pa.ChunkedArray):
        karr = karr.combine_chunks()
    if len(karr) == 0:
        return pa.table({})
    m = manifest or mf.latest(lake_dir)
    num_p = m.num_partitions if m is not None else spec.num_partitions
    pids = sorted(set(partition_ids(karr, num_p).tolist()))
    ds = scan(lake_dir, spec=spec, columns=columns, live_only=live_only,
              manifest=m, pids=pids, key_filter=karr)

    def _keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(spec.key), value_set=karr))

    ds = ds.map_batches(_keep, batch_format="pyarrow", zero_copy_batch=True)
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return pa.table({})
    target = union_schemas([b.schema for b in batches])
    t = pa.concat_tables(sch.unify_table(b, target) for b in batches)
    return t.sort_by(spec.key) if spec.key in t.column_names else t


def read_dead_letters(lake_dir: str, *, epoch_id: str | None = None):
    """Dataset of rows diverted by ``TableSpec(on_bad_rows="dead_letter")``
    — the original row plus ``__dlq_reason`` and ``__dlq_epoch_id`` (the
    input-set content id that produced it, so a fixed feed can be replayed
    against exactly its quarantined rows). At-least-once: a retried
    prepare task may have written a row twice; dedup on content if it
    matters. Vacuum never touches the DLQ — draining it is an explicit
    consumer decision (delete the epoch_id dir after reprocessing)."""
    root = fsio.join(lake_dir, "_dead_letter")
    if epoch_id is not None:
        root = fsio.join(root, epoch_id)
    files = [p for p, _, _ in fsio.walk_files(root) if p.endswith(".parquet")]
    return _read_mixed_schema_files(files)


def _read_mixed_schema_files(files: list[str]):
    """Dataset over parquet files that may carry DIFFERENT physical schemas
    (DLQ rows quarantined across schema-evolution epochs): group by footer
    schema, read each group, unify every batch to the union schema, union
    the groups — the changelog_dataset recipe for heterogeneous shards."""
    import ray.data as rd

    if not files:
        return rd.from_items([])
    groups: dict[tuple, list[str]] = {}
    schemas: dict[tuple, pa.Schema] = {}
    for f in files:
        s = fsio.read_parquet_schema(f)
        key = tuple(sorted((fl.name, str(fl.type)) for fl in s))
        groups.setdefault(key, []).append(f)
        schemas[key] = s
    target = union_schemas(list(schemas.values()))

    def _unify(t: pa.Table) -> pa.Table:
        return sch.unify_table(t, target)

    pieces = [rd.read_parquet(fs).map_batches(_unify, batch_format="pyarrow",
                                              zero_copy_batch=True)
              for fs in groups.values()]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out


def replay_dead_letters(lake_dir: str, fix_fn, *,
                        spec: TableSpec = TOKENS_SPEC,
                        epoch_id: str | None = None) -> "mf.Manifest | None":
    """Drain the DLQ back into the lake: read the quarantined rows (one
    epoch_id's, or all), run ``fix_fn(pa.Table) -> pa.Table`` per batch to
    repair them (fill the key, recover the LSN, drop the hopeless — the
    DLQ columns are stripped first), apply the result as ONE new epoch
    whose id derives from the drained file set (exactly-once: a crashed
    drain re-runs safely, a completed one is skipped), and delete the
    drained files only after the epoch commits. Rows still malformed
    after ``fix_fn`` follow ``spec.on_bad_rows`` — with "dead_letter"
    they land back in the DLQ under the NEW epoch's id, so repeated
    drains converge on the truly hopeless rows instead of looping."""
    import hashlib

    from vlm_eden_dataset_etl_ray import apply as apply_mod

    root = fsio.join(lake_dir, "_dead_letter")
    if epoch_id is not None:
        root = fsio.join(root, epoch_id)
    files = sorted(p for p, _, _ in fsio.walk_files(root)
                   if p.endswith(".parquet"))
    if not files:
        return None
    drain_id = "dlq-" + hashlib.sha256(
        "\n".join(files).encode()).hexdigest()[:16]

    def _fix(t: pa.Table) -> pa.Table:
        t = t.drop_columns([c for c in ("__dlq_reason", "__dlq_epoch_id")
                            if c in t.column_names])
        return fix_fn(t)

    ds = _read_mixed_schema_files(files).map_batches(
        _fix, batch_format="pyarrow", zero_copy_batch=True)
    m = apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=drain_id,
                                      spec=spec, input_files=files)
    for f in files:
        try:
            fsio.delete_file(f)
        except (FileNotFoundError, OSError):
            pass
    return m


def snapshot(lake_dir: str, **kwargs) -> pa.Table:
    """Driver-side materialized snapshot (tests / small lakes only)."""
    ds = scan(lake_dir, **kwargs)
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return pa.table({})
    target = union_schemas([b.schema for b in batches])
    batches = [sch.unify_table(b, target) for b in batches]
    spec = kwargs.get("spec", TOKENS_SPEC)
    t = pa.concat_tables(batches)
    return t.sort_by(spec.key) if spec.key in t.column_names else t


def _feed_read_engine(row: dict, spec: TableSpec, columns,
                      schema: pa.Schema, activations, exclude, renames,
                      before_image: bool) -> pa.Table:
    """Feed task for a non-LWW merge-engine partition — the 'lookup
    changelog producer': a range fold of a partial-update/aggregate lake
    yields only the columns/contributions WRITTEN in range, so with
    ``before_image`` the pre-range state is folded in to complete each
    changed key's full after-image (and supply the before struct); without
    it the finalized range fold is emitted as-is (partial images,
    documented). All engine-internal state columns are stripped from the
    output — feeds are consumer-facing."""
    files = list(row["files"])
    vers = row.get("vers") or []
    t = merge_partition_files(
        files, spec, columns=None, live_only=False,
        file_versions=dict(zip(files, vers)) if vers else None,
        activations=activations, exclude=exclude, renames=renames,
    )
    bt = None
    if before_image:
        bfiles = list(row.get("bfiles") or [])
        bvers = row.get("bvers") or []
        if bfiles:
            bt = merge_partition_files(
                bfiles, spec, columns=None, live_only=False,
                file_versions=(dict(zip(bfiles, bvers)) if bvers else None),
                activations=activations, exclude=exclude, renames=renames,
            )
    if bt is not None and bt.num_rows:
        target = union_schemas([t.schema, bt.schema])
        comb = pa.concat_tables([sch.unify_table(t, target),
                                 sch.unify_table(bt, target)])
        full = me.merge_table(comb, spec)
        # restrict to keys that changed in range; both folds are
        # key-sorted and t's key set ⊆ full's, so filtering full down to
        # t's keys aligns positionally with t
        pos = pc.index_in(full.column(spec.key),
                          value_set=t.column(spec.key).combine_chunks())
        full = full.filter(pc.is_valid(pos))
        pre_live = lww.drop_tombstones(bt, spec)
        pre_pos = pc.index_in(t.column(spec.key),
                              value_set=pre_live.column(spec.key)
                              .combine_chunks())
        existed = pc.is_valid(pre_pos)
    else:
        full = t
        pre_live = None
        existed = pa.array([False] * t.num_rows)
    is_del = pc.fill_null(pc.equal(full.column(spec.op_col),
                                   pa.scalar(spec.delete_op)), False)
    ct = pc.if_else(
        is_del, pa.scalar("delete"),
        pc.if_else(existed, pa.scalar("update"), pa.scalar("insert"))
        if before_image else pa.scalar("upsert"))
    out = me.finalize_read(full, spec)
    # the range's max LSN is the feed's change ordinal (full's order col
    # would reach back into pre-range history)
    i = out.column_names.index(spec.order)
    out = out.set_column(i, spec.order, t.column(spec.order))
    out = out.append_column("_change_type", ct)
    if before_image:
        bf = schema.field("_before").type
        val_cols = [f.name for f in bf]
        if pre_live is not None and pre_live.num_rows:
            fin_pre = me.finalize_read(pre_live, spec)

            def _arr(a, typ):
                a = a.cast(typ)
                return (a.combine_chunks()
                        if isinstance(a, pa.ChunkedArray) else a)

            arrs = [
                _arr(fin_pre.column(c).combine_chunks().take(pre_pos),
                     bf.field(i_).type)
                if c in fin_pre.column_names
                else pa.nulls(out.num_rows, bf.field(i_).type)
                for i_, c in enumerate(val_cols)]
            nulls = pc.invert(existed)
            if isinstance(nulls, pa.ChunkedArray):
                nulls = nulls.combine_chunks()
            before = pa.StructArray.from_arrays(arrs, fields=list(bf),
                                                mask=nulls)
        else:
            before = pa.nulls(out.num_rows, bf)
        out = out.append_column("_before", before)
        if columns:
            out = out.select(list(columns) + ["_change_type", "_before"])
    elif columns:
        out = out.select(list(columns) + ["_change_type"])
    return sch.unify_table(out, schema)


def _feed_read(batch: pa.Table, spec: TableSpec, columns, schema: pa.Schema,
               activations=None, exclude=None, renames=None,
               before_image: bool = False):
    """One task per partition: LWW-merge the partition's IN-RANGE delta
    files (tombstones kept) and label each surviving row with its CDC
    change type. With ``before_image`` the partition's PRE-RANGE snapshot
    files (``bfiles``) are merged too — restricted to the changed keys —
    refining the label to insert/update/delete and attaching the prior
    row values as a ``_before`` struct (null for inserts)."""
    read_cols = columns
    if columns and spec.op_col not in columns:
        read_cols = list(columns) + [spec.op_col]
    for row in batch.to_pylist():
        files = list(row["files"])
        if not files:
            continue
        vers = row.get("vers") or []
        if spec.merge_engine != "lww":
            yield _feed_read_engine(row, spec, columns, schema,
                                    activations, exclude, renames,
                                    before_image)
            continue
        t = merge_partition_files(
            files, spec, columns=read_cols, live_only=False,
            file_versions=dict(zip(files, vers)) if vers else None,
            activations=activations, exclude=exclude, renames=renames,
        )
        if spec.op_col in t.column_names:
            is_del = pc.equal(t.column(spec.op_col), pa.scalar(spec.delete_op))
            is_del = pc.fill_null(is_del, False)
            ct = pc.if_else(is_del, pa.scalar("delete"), pa.scalar("upsert"))
        else:
            is_del = pa.array([False] * t.num_rows)
            ct = pa.nulls(t.num_rows, pa.string())
            ct = pc.fill_null(ct, "upsert")
        if before_image:
            bfiles = list(row.get("bfiles") or [])
            bvers = row.get("bvers") or []
            bf = schema.field("_before").type
            val_cols = [f.name for f in bf]
            if bfiles:
                bt = merge_partition_files(
                    bfiles, spec, live_only=True,
                    columns=list(dict.fromkeys([spec.key] + val_cols)),
                    file_versions=(dict(zip(bfiles, bvers))
                                   if bvers else None),
                    activations=activations, exclude=exclude,
                    renames=renames)
                pos = pc.index_in(t.column(spec.key),
                                  value_set=bt.column(spec.key).combine_chunks())
                existed = pc.is_valid(pos)
                def _one(a, typ):
                    a = a.cast(typ)
                    return (a.combine_chunks()
                            if isinstance(a, pa.ChunkedArray) else a)

                arrs = [bt.column(c).combine_chunks().take(pos)
                        if c in bt.column_names
                        else pa.nulls(t.num_rows, bf.field(c).type)
                        for c in val_cols]
                nulls = pc.invert(existed)
                if isinstance(nulls, pa.ChunkedArray):
                    nulls = nulls.combine_chunks()
                before = pa.StructArray.from_arrays(
                    [_one(a, bf.field(i).type) for i, a in enumerate(arrs)],
                    fields=list(bf), mask=nulls)
            else:
                existed = pa.array([False] * t.num_rows)
                before = pa.array([None] * t.num_rows, bf)
            ct = pc.if_else(
                is_del, pa.scalar("delete"),
                pc.if_else(pc.fill_null(existed, False),
                           pa.scalar("update"), pa.scalar("insert")))
            t = t.append_column("_change_type", ct)
            t = t.append_column("_before", before)
            if columns:
                t = t.select(list(columns) + ["_change_type", "_before"])
            yield sch.unify_table(t, schema)
            continue
        t = t.append_column("_change_type", ct)
        if columns:
            t = t.select(list(columns) + ["_change_type"])
        yield sch.unify_table(t, schema)


def change_feed(
    lake_dir: str,
    from_epoch: int = 0,
    to_epoch: int | None = None,
    *,
    spec: TableSpec = TOKENS_SPEC,
    columns: list[str] | None = None,
    before_image: bool = False,
) -> rd.Dataset:
    """Net row-level changes between two committed snapshots — the lake's
    CDC *output* side (Delta Lake's change-data-feed shape; the reference
    only ever re-reads full tables downstream).

    ``before_image=True`` additionally merges each changed partition's
    PRE-RANGE snapshot (restricted to the changed keys) and emits the
    Debezium-style envelope: ``_change_type`` refines to
    insert/update/delete and ``_before`` carries the prior row's value
    columns as a struct (null for inserts). Extra cost: the from-epoch
    files of CHANGED partitions are read once — still O(changes)
    partition-parallel, never O(lake); the from-epoch manifest and its
    files must be retained.

    Returns a Dataset of one row per key that received at least one record
    in epochs ``(from_epoch, to_epoch]``, carrying that key's LWW-merged
    state over the range plus ``_change_type``: ``'delete'`` when the
    winning record is a tombstone, else ``'upsert'``. Cost is O(range
    deltas), never O(lake): files added per epoch are attributed by
    DIFFING consecutive retained manifests' delta lists (file paths encode
    a staging epoch, but a rebased commit may relabel them —
    apply.py's publish-race note — so the manifest diff is authoritative),
    and only those files are read, partition-parallel with no shuffle
    (files are already key-partitioned, and max-LSN LWW over just the
    range records is exact — it commutes with the full-history merge).

    Retention contract (same as Delta CDF): the manifests for
    ``from_epoch`` (when > 0) and the range epochs must not be vacuumed,
    and range delta files must not have been vacuumed after a compaction
    folded them into base. ``from_epoch=0`` means "since lake creation":
    the earliest retained manifest's base files count as added too.
    Compaction manifests inside the range add no rows (they rewrite);
    they only advance the diff baseline.
    """
    epochs = mf.list_epochs(lake_dir)
    if not epochs:
        return rd.from_items([])
    if to_epoch is None:
        to_epoch = epochs[-1]
    if from_epoch > to_epoch:
        raise ValueError(f"from_epoch {from_epoch} > to_epoch {to_epoch}")
    if from_epoch > 0 and from_epoch not in epochs:
        raise ValueError(
            f"change_feed needs the manifest for from_epoch={from_epoch}; "
            f"retained epochs are {epochs} (vacuumed past the feed start)")
    if to_epoch not in epochs:
        raise ValueError(f"to_epoch {to_epoch} is not a committed epoch of {lake_dir}")
    m0 = mf.load(lake_dir, from_epoch) if from_epoch > 0 else None
    prev = m0
    per_pid: dict[int, list[str]] = {}
    vers: dict[str, int] = {}
    ref_p = m0.num_partitions if m0 is not None else None
    for e in [e for e in epochs if from_epoch < e <= to_epoch]:
        m = mf.load(lake_dir, e)
        if ref_p is None:
            ref_p = m.num_partitions
        elif m.num_partitions != ref_p:
            # the per-pid work items below LWW-merge each partition
            # independently, which is exact ONLY while a key lives in one
            # pid for the whole range — a rehash moves keys, so a feed
            # spanning it would emit duplicate/stale rows per key
            raise ValueError(
                "change_feed cannot span a rehash boundary: the range "
                f"mixes {ref_p}- and {m.num_partitions}-partition layouts "
                "(epoch "
                f"{e}); start the feed at or after the rehash epoch")
        # compaction rewrites, restore re-publishes OLD files, and rehash
        # re-buckets them — none represents new row changes; all three
        # only advance the diff baseline
        if m.kind not in ("compaction", "restore", "rehash"):
            for pid, st in m.partitions.items():
                pst = prev.partitions.get(pid) if prev is not None else None
                seen = set(pst.deltas) if pst is not None else set()
                new = [f for f in st.deltas if f not in seen]
                if prev is None:
                    new = list(st.base) + new
                if new:
                    fv = st.file_versions(m.schema_version)
                    per_pid.setdefault(pid, []).extend(new)
                    vers.update({f: fv[f] for f in new})
        prev = m
    if not per_pid:
        return rd.from_items([])
    from vlm_eden_dataset_etl_ray.state.registry import SchemaRegistryState

    reg = SchemaRegistryState.load_readonly(lake_dir)
    exclude, activations, renames = _evolution_maps(reg, spec)
    schemas = [fsio.read_parquet_schema(f) for fs in per_pid.values() for f in fs]
    if renames:
        fwd = {o: cur for cur, chain in renames.items() for o, _ in chain}
        schemas = [pa.schema(
            [pa.field(fwd.get(f.name, f.name)
                      if fwd.get(f.name, f.name) not in s_.names else f.name,
                      f.type) for f in s_]) for s_ in schemas]
    base_schema = union_schemas(schemas)
    if exclude:
        base_schema = pa.schema([f for f in base_schema if f.name not in exclude])
    if spec.merge_engine != "lww":
        # feeds are consumer-facing: engine-internal state columns are
        # stripped (the 'lookup producer' in _feed_read_engine completes
        # partial after-images from the pre-range state when
        # before_image=True); order is normalized to int64 by the folds
        base_schema = pa.schema(
            [pa.field(f.name, pa.int64()) if f.name == spec.order else f
             for f in base_schema if not me.is_internal(f.name)])
    if columns:
        base_schema = pa.schema([base_schema.field(c) for c in columns])
    out_schema = base_schema.append(pa.field("_change_type", pa.string()))
    if before_image:
        val_fields = [f for f in base_schema
                      if f.name not in (spec.key, spec.op_col)]
        out_schema = out_schema.append(
            pa.field("_before", pa.struct(val_fields)))
    items = []
    for pid, fs in sorted(per_pid.items()):
        it = {"pid": pid, "stripe": 0, "n_stripes": 1, "files": fs,
              "vers": [vers[f] for f in fs]}
        if before_image:
            bfs = m0.files(pid) if m0 is not None and pid in m0.partitions else []
            bfv = (m0.partitions[pid].file_versions(m0.schema_version)
                   if bfs else {})
            it["bfiles"] = bfs
            it["bvers"] = [bfv[f] for f in bfs]
        items.append(it)
    from vlm_eden_dataset_etl_ray.apply import WORK_ITEM_SCHEMA

    item_schema = WORK_ITEM_SCHEMA
    if before_image:
        item_schema = WORK_ITEM_SCHEMA.append(
            pa.field("bfiles", pa.list_(pa.string()))).append(
            pa.field("bvers", pa.list_(pa.int64())))
    ds = work_items_dataset(items, schema=item_schema)
    return ds.map_batches(
        _feed_read,
        fn_kwargs={"spec": spec, "columns": columns, "schema": out_schema,
                   "activations": activations or None, "exclude": exclude or None,
                   "renames": renames, "before_image": before_image},
        batch_size=1,
        batch_format="pyarrow",
    )


def training_stream(
    lake_dir: str,
    *,
    spec: TableSpec = TOKENS_SPEC,
    columns: list[str] | None = None,
    batch_size: int = 1024,
    shuffle_seed: int | None = 0,
    local_shuffle_buffer: int = 16384,
    pack_block_size: int | None = None,
    pack_mode: str = "concat",
    sep_id: int | None = None,
):
    """Consume the converged lake as a stream of training batches: merge-on-
    read scan → randomized block order → windowed local shuffle →
    ``iter_batches``. This is the end-consumer path for the tokenized
    sequences (epoch-level global `random_shuffle` would be an extra
    all-to-all; block-order + buffer shuffling is the streaming-friendly
    approximation training loaders use).

    ``pack_block_size`` inserts :func:`functions.packing.pack_sequences`
    after the scan, so the stream yields fixed-width training BLOCKS
    (``block``/``n_real``/``doc_starts``) instead of per-document rows —
    the full lake-to-loader path."""
    ds = scan(lake_dir, spec=spec, columns=columns or [spec.key, "tokens", "n_tok"])
    ds = ds.randomize_block_order(seed=shuffle_seed)
    if pack_block_size:
        from vlm_eden_dataset_etl_ray.functions.packing import pack_sequences

        ds = pack_sequences(ds, "tokens", block_size=pack_block_size,
                            mode=pack_mode, sep_id=sep_id)
    return ds.iter_batches(
        batch_size=batch_size,
        batch_format="pyarrow",
        local_shuffle_buffer_size=local_shuffle_buffer,
        local_shuffle_seed=shuffle_seed,
    )


def vacuum(lake_dir: str, keep_epochs: int = 2,
           min_age_seconds: float = 3600.0) -> dict:
    """Garbage-collect data files referenced by NO manifest among the last
    ``keep_epochs`` manifests (older manifests are dropped too). Readers of
    retained epochs keep snapshot isolation — their manifests' files are
    never touched. Unreferenced files younger than ``min_age_seconds`` are
    ALSO spared: a concurrent apply that lost a publish race can hold
    staged files under an epoch number ≤ the latest commit (it will rebase
    and commit them under a later epoch) — age, not epoch number, is the
    only safe signal for those. Returns {files_removed, bytes_removed,
    manifests_removed}."""
    import time as _time

    epochs = mf.list_epochs(lake_dir)
    if not epochs:
        return {"files_removed": 0, "bytes_removed": 0, "manifests_removed": 0}
    keep = set(epochs[-max(1, keep_epochs):])
    live: set[str] = set()
    for e in keep:
        m = mf.load(lake_dir, e)
        for pid in m.partitions:
            live.update(fsio.canon(f) for f in m.files(pid))
    removed_files = 0
    removed_bytes = 0
    max_committed = max(keep)
    now = _time.time()
    # rehash scratch sub-lakes (_rehash_N/) hold the re-bucketed snapshot
    # that the rehash manifest references as its base — once later
    # compactions re-home the data and the rehash-era manifests age out,
    # their files are reclaimable like any other epoch's
    rehash_roots = []
    for name in fsio.list_names(lake_dir):
        if not name.startswith("_rehash_"):
            continue
        # A rehash targeting epoch N publishes ONLY after its scratch
        # sub-lake is fully written; until then its files are referenced by
        # no manifest and the scratch lake's own epoch numbering restarts at
        # 1 (≤ max_committed), so neither the live set nor the epoch=K skip
        # below protects them. N > max_committed ⇒ rehash in flight (or
        # abandoned — reclaimed once a later commit passes it): skip the
        # whole root regardless of file age.
        try:
            if int(name[len("_rehash_"):]) > max_committed:
                continue
        except ValueError:
            pass
        root = fsio.join(lake_dir, name)
        # Crash between the rehash commit and its scratch-manifest cleanup
        # leaves _rehash_N/_manifests behind forever (re-runs early-return
        # on num_partitions match); reclaim it here.
        fsio.delete_dir(fsio.join(root, "_manifests"))
        rehash_roots.append(root)
    rehash_set = set(rehash_roots)
    for root in ([fsio.join(lake_dir, sub) for sub in ("staging", "base")]
                 + rehash_roots):
        touched_dirs: set[str] = set()
        for p, size, mtime in fsio.walk_files(root):
            # An apply_epoch may be in flight concurrently: its staging /
            # shuffle files live under staging/epoch=K with K greater than
            # any committed epoch and are referenced by NO manifest yet —
            # deleting them would let that epoch publish a manifest pointing
            # at vanished files. Skip epoch dirs newer than the last commit.
            # (Committed-rehash scratch roots renumber epochs from 1, so the
            # comparison is meaningless there — the live set + the age guard
            # below protect their files; in-flight roots were skipped above.)
            rel = p[len(root):].lstrip("/")
            top = rel.split("/", 1)[0]
            if top.startswith("epoch=") and root not in rehash_set:
                try:
                    if int(top[len("epoch="):]) > max_committed:
                        continue
                except ValueError:
                    pass
            if p.endswith(".parquet") and fsio.canon(p) not in live:
                if now - mtime < min_age_seconds:
                    continue  # possibly an in-flight rebase's staging
                try:
                    fsio.delete_file(p)
                except (FileNotFoundError, OSError):
                    continue  # concurrent vacuum / already gone
                removed_bytes += size
                removed_files += 1
                touched_dirs.add(fsio.parent(p))
        # drop now-empty directories bottom-up (no-op on object stores)
        for d in sorted(touched_dirs, key=len, reverse=True):
            while len(d) > len(root):
                fsio.delete_dir_if_empty(d)
                d = fsio.parent(d)
    removed_manifests = 0
    for e in epochs:
        if e not in keep:
            fsio.delete_file(fsio.join(lake_dir, mf.MANIFEST_DIR,
                                       f"epoch={e:010d}.json"))
            removed_manifests += 1
    return {"files_removed": removed_files, "bytes_removed": removed_bytes,
            "manifests_removed": removed_manifests}


def fsck(lake_dir: str, *, spec: TableSpec = TOKENS_SPEC,
         deep: bool = False) -> dict:
    """Lake consistency check (the lakehouse ``fsck``): validates metadata
    invariants WITHOUT reading data by default, returns
    ``{"ok": bool, "findings": [str, ...], "checked": {...}}`` — never
    raises on a finding, so an ops loop can alert on ``ok=False``.

    Metadata checks: every retained manifest parses; every referenced data
    file exists and is non-empty; per-file schema-version lists parallel
    their file lists; stripe metadata is internally consistent; exactly-once
    lineage is MONOTONE across retained epochs (an older manifest's applied
    ids/inputs ⊆ the newer's — cumulative-lineage contract); the recorded
    cumulative write schema decodes; the registry (when present) loads and
    its constraints parse; the latest manifest's hash fingerprint matches
    this process's :data:`~..functions.hashing.HASH_FN`; DLQ files parse.

    ``deep=True`` additionally scans the latest snapshot and verifies the
    UPSERT invariant (no duplicate live keys) plus footer key blooms
    containing their own file's keys — O(lake), for scheduled audits."""
    findings: list[str] = []
    checked = {"manifests": 0, "files": 0, "dlq_files": 0}
    epochs = mf.list_epochs(lake_dir)
    if not epochs:
        return {"ok": True, "findings": ["no manifests (empty lake)"],
                "checked": checked}
    manifests: dict[int, mf.Manifest] = {}
    for e in epochs:
        try:
            manifests[e] = mf.load(lake_dir, e)
            checked["manifests"] += 1
        except Exception as ex:  # torn/corrupt manifest is THE finding
            findings.append(f"manifest epoch={e} unreadable: {ex}")
    latest = manifests.get(max(manifests)) if manifests else None
    for e, m in manifests.items():
        for pid, st in m.partitions.items():
            for f in m.files(pid):
                checked["files"] += 1
                if fsio.file_size(f) <= 0:
                    kind = ("empty" if fsio.exists(f) else "missing")
                    findings.append(f"epoch={e} pid={pid}: {kind} file {f}")
            if st.base_vers and len(st.base_vers) != len(st.base):
                findings.append(f"epoch={e} pid={pid}: base_vers length "
                                f"{len(st.base_vers)} != base {len(st.base)}")
            if st.delta_vers and len(st.delta_vers) != len(st.deltas):
                findings.append(f"epoch={e} pid={pid}: delta_vers length "
                                f"{len(st.delta_vers)} != deltas "
                                f"{len(st.deltas)}")
            if st.stripe_count > 1 and st.base_stripes and \
                    len(st.base_stripes) != len(st.base):
                findings.append(f"epoch={e} pid={pid}: base_stripes length "
                                "does not match base files")
        if m.schema_b64:
            try:
                mf.decode_schema(m.schema_b64)
            except Exception as ex:
                findings.append(f"epoch={e}: schema_b64 undecodable: {ex}")
    ordered = sorted(manifests)
    for a, b in zip(ordered, ordered[1:]):
        ma, mb = manifests[a], manifests[b]
        if not set(ma.applied_epoch_ids) <= set(mb.applied_epoch_ids):
            findings.append(
                f"lineage not cumulative: epoch {a} applied ids ⊄ epoch {b}")
        if not set(ma.applied_inputs) <= set(mb.applied_inputs):
            findings.append(
                f"lineage not cumulative: epoch {a} inputs ⊄ epoch {b}")
    if latest is not None:
        from vlm_eden_dataset_etl_ray.apply import check_hash_fn

        try:
            check_hash_fn(latest)
        except Exception as ex:
            findings.append(f"hash fingerprint mismatch: {ex}")
    from vlm_eden_dataset_etl_ray.state.registry import SchemaRegistryState

    try:
        reg = SchemaRegistryState.load_readonly(lake_dir)
        if reg is not None:
            reg.schema()
            reg.constraints()
    except Exception as ex:
        findings.append(f"registry unreadable: {ex}")
    for p, size, _ in fsio.walk_files(fsio.join(lake_dir, "_dead_letter")):
        if p.endswith(".parquet"):
            checked["dlq_files"] += 1
            try:
                fsio.read_parquet_schema(p)
            except Exception as ex:
                findings.append(f"DLQ file unreadable: {p}: {ex}")
    if deep and latest is not None and spec.mode == "upsert":
        try:
            _fsck_deep(lake_dir, spec, latest, findings)
        except Exception as ex:  # fsck reports, never raises — a wrong
            findings.append(f"deep check failed: {ex}")  # spec lands here
    return {"ok": not findings, "findings": findings, "checked": checked}


def _fsck_deep(lake_dir: str, spec: TableSpec, latest: mf.Manifest,
               findings: list[str]) -> None:
    from vlm_eden_dataset_etl_ray.apply import BLOOM_META_KEY
    from vlm_eden_dataset_etl_ray.functions.hashing import (
        key_bloom_may_contain_any, key_bloom_probe_hashes)

    def _check_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        k = t.column(spec.key)
        n_dup = t.num_rows - len(_pc.unique(k))
        return pa.table({"dups": pa.array([n_dup], pa.int64())})

    dups = sum(r["dups"] for r in scan(
        lake_dir, spec=spec, columns=[spec.key]
    ).map_batches(_check_part, batch_format="pyarrow").take_all())
    if dups:
        findings.append(f"deep: {dups} duplicate live key(s) in the "
                        "latest snapshot (upsert invariant broken)")
    for pid in latest.partitions:
        for f in latest.files(pid):
            md = fsio.read_parquet_schema(f).metadata or {}
            payload = md.get(BLOOM_META_KEY)
            if payload is None:
                continue
            keys = fsio.read_parquet(f, columns=[spec.key]).column(spec.key)
            if len(keys) and not key_bloom_may_contain_any(
                    payload, *key_bloom_probe_hashes(keys)):
                findings.append(f"deep: bloom of {f} refutes its own keys")


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def total_bytes(lake_dir: str) -> int:
    """Manifest-accounted byte size of the lake's live files — the
    ``bytes_hint`` a lake-sourced join should pass to
    :func:`~vlm_eden_dataset_etl_ray.functions.relational.hash_join` so
    bucket counts track data volume (metadata-only; no file stats)."""
    m = mf.latest(lake_dir)
    if m is None:
        return 0
    return sum(st.bytes for st in m.partitions.values())


def compaction_due(
    m: mf.Manifest | None,
    *,
    delta_ratio: float = 0.25,
    min_delta_files: int = 8,
) -> bool:
    """Cadence policy: is read amplification worth a compaction yet?

    True when accumulated delta bytes exceed ``delta_ratio`` × base bytes
    (the LSM write/read-amplification trade), or when any partition holds
    ≥ ``min_delta_files`` delta files (per-file open cost dominates before
    byte ratio does on small partitions). Metadata-only: per-partition
    ``bytes`` is read from the manifest; base bytes are a bounded number of
    size stats (base files are immutable between compactions)."""
    if m is None:
        return False
    total_delta = total_base = 0
    max_delta_files = 0
    for st in m.partitions.values():
        base_b = sum(fsio.file_size(f) for f in st.base)
        total_base += base_b
        total_delta += max(0, st.bytes - base_b)
        max_delta_files = max(max_delta_files, len(st.deltas))
    if total_delta <= 0 or max_delta_files == 0:
        return False
    if max_delta_files >= min_delta_files:
        return True
    if total_base == 0:
        # never-compacted lake: a first compaction buys nothing until the
        # per-partition file count itself hurts (handled above)
        return False
    return total_delta >= delta_ratio * total_base


def maybe_compact(
    lake_dir: str,
    *,
    spec: TableSpec = TOKENS_SPEC,
    delta_ratio: float = 0.25,
    min_delta_files: int = 8,
    stripe_target_bytes: int = 1 << 30,
    tombstone_watermark: int | None = 0,
    cluster_by: list[str] | None = None,
    cluster_fn=None,
    cluster_file_bytes: int = 128 << 20,
) -> mf.Manifest | None:
    """Compact only when :func:`compaction_due` says the delta:base ratio
    (or delta file count) crossed the threshold — the cadence an ingest
    loop should call after every epoch instead of a fixed schedule. Returns
    the compaction manifest, or None when compaction was skipped.

    Because a cadence compaction runs MID-STREAM, tombstones are retained
    by default (``tombstone_watermark=0``): an out-of-order straggler with
    a smaller LSN than a dropped tombstone would otherwise resurrect the
    deleted row. Pass ``tombstone_watermark=None`` only when the source is
    LSN-ordered or the stream is known complete."""
    m = mf.latest(lake_dir)
    if not compaction_due(m, delta_ratio=delta_ratio,
                          min_delta_files=min_delta_files):
        return None
    try:
        return compact(lake_dir, spec=spec,
                       stripe_target_bytes=stripe_target_bytes,
                       tombstone_watermark=tombstone_watermark,
                       cluster_by=cluster_by, cluster_fn=cluster_fn,
                       cluster_file_bytes=cluster_file_bytes)
    except FileExistsError:
        # lost the epoch-slot publish race to a concurrent apply — a
        # rebase would drop the racer's deltas, so compact fails loudly
        # (tests/test_compact_race.py); for the CADENCE caller the right
        # move is simply to skip: the next tick re-evaluates the fresher
        # snapshot and compacts it whole. The failed attempt's rewritten
        # files are unreferenced orphans vacuum reclaims.
        return None


def compact(
    lake_dir: str,
    *,
    spec: TableSpec = TOKENS_SPEC,
    stripe_target_bytes: int = 1 << 30,
    tombstone_watermark: int | None = None,
    cluster_by: list[str] | None = None,
    cluster_fn=None,
    cluster_file_bytes: int = 128 << 20,
) -> mf.Manifest:
    """Fold each partition's base+deltas into fresh base files and commit a
    ``compaction`` manifest. Shuffle-free: one task per partition STRIPE.

    Tombstone retention: with ``tombstone_watermark=None`` (default) delete
    tombstones are DROPPED — only valid when no out-of-order delivery below
    the current watermark can still arrive (stream fully applied, or the
    source is LSN-ordered like the reference's polling loop). A MID-STREAM
    compaction must pass a watermark: tombstones with lsn > watermark are
    kept in the base (winner rows with op=delete; merge-on-read masks them
    exactly like delta tombstones), so a straggler upsert with a smaller
    LSN still loses the LWW merge instead of resurrecting the deleted row.
    ``tombstone_watermark=0`` keeps all tombstones. The ingest cadence
    (:func:`maybe_compact`) defaults to 0 for this reason; a final
    end-of-stream compaction can drop them.

    Partition-split story: a partition whose byte size exceeds
    ``stripe_target_bytes`` is split into the next power-of-two number of
    key-hash stripes (recorded in the manifest), so both this compaction's
    task unit AND every later merge-on-read task is bounded by the stripe
    target, not the partition's lifetime growth. When the stripe count is
    unchanged from the previous layout, each task reads only its own stripe
    file + deltas; a re-stripe (count changed — rare, geometric growth)
    reads the whole partition per stripe with a stripe filter.

    Clustering (the Delta/Iceberg ``OPTIMIZE ... ZORDER``-lite): with
    ``cluster_by`` each compacted stripe is SORTED by those columns and
    split into ~``cluster_file_bytes`` files of contiguous key ranges, so
    each file's zone map (min/max) covers a narrow slice and a later
    ``scan(stats_filter=...)`` skips most files. File-level skipping on an
    upsert table is only correct while the partition has NO delta files —
    a straggler delta row with an older LSN could otherwise win a merge
    whose newer base row was pruned — so the scan path prunes per-file
    exactly in the post-compaction window and falls back to whole-item
    pruning once deltas accumulate (see :func:`_apply_stats_filter`)."""
    m = mf.latest(lake_dir)
    if m is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    from vlm_eden_dataset_etl_ray.apply import check_hash_fn
    from vlm_eden_dataset_etl_ray.state.registry import SchemaRegistryState

    check_hash_fn(m)
    # drop/re-add evolution: compaction physically removes tombstoned
    # columns and masks pre-activation generations, so compacted bases are
    # clean — exactly what the reference's DROP COLUMN does to the table
    reg = SchemaRegistryState.load_readonly(lake_dir)
    exclude, activations, renames = _evolution_maps(reg, spec)
    # rewritten files carry the registry's CURRENT column names/generations
    # (renames applied, drops erased) — they must be stamped with the
    # CURRENT registry version, not the last delta epoch's: a migration
    # with no epoch after it would otherwise make the next scan map a
    # renamed column back to its historical name and read nulls
    cur_ver = reg.latest_version() if reg else m.schema_version
    epoch = m.epoch + 1
    base_dir = fsio.join(lake_dir, "base", f"epoch={epoch}")
    fsio.makedirs(base_dir)

    def _compact_one(batch: pa.Table, spec=spec, base_dir=base_dir,
                     cluster_by=cluster_by, cluster_fn=cluster_fn,
                     cluster_file_bytes=cluster_file_bytes) -> pa.Table:
        rows = []
        for row in batch.to_pylist():
            pid, files = int(row["pid"]), list(row["files"])
            s, k = int(row["stripe"]), int(row["n_stripes"])
            vers = row.get("vers") or []
            t = merge_partition_files(
                files, spec, live_only=tombstone_watermark is None,
                stripe=s, n_stripes=k,
                file_versions=dict(zip(files, vers)) if vers else None,
                activations=activations, exclude=exclude, renames=renames)
            if tombstone_watermark is not None:
                # keep young tombstones (they must outlive any possible
                # out-of-order straggler), drop ones at/below the watermark
                is_del = pc.equal(t.column(spec.op_col), spec.delete_op)
                old = pc.less_equal(t.column(spec.order),
                                    pa.scalar(tombstone_watermark))
                t = t.filter(pc.invert(pc.and_kleene(is_del, old)))
            suffix = f"-s{s:03d}" if k > 1 else ""
            from vlm_eden_dataset_etl_ray.apply import file_stats_json

            slices = [t]
            if (cluster_by or cluster_fn is not None) and t.num_rows:
                # cluster: sort the (key-unique) stripe by the zone-map
                # columns — or by a computed key (``cluster_fn(t)`` → array,
                # e.g. a Morton interleave for multi-dimensional probes) —
                # then cut into contiguous ranges so each file's min/max is
                # narrow. In-memory nbytes approximates the parquet size
                # well enough to pick the file count.
                if cluster_fn is not None:
                    import numpy as _np

                    key = pa.array(_np.asarray(cluster_fn(t)))
                    t = t.take(pc.sort_indices(key))
                else:
                    t = t.take(pc.sort_indices(
                        t, sort_keys=[(c, "ascending") for c in cluster_by]))
                n_files = max(1, -(-t.nbytes // cluster_file_bytes))
                if n_files > 1:
                    step = -(-t.num_rows // n_files)
                    slices = [t.slice(i, step)
                              for i in range(0, t.num_rows, step)]
                else:
                    slices = [t]
            for j, sl in enumerate(slices):
                cpart = f"-c{j:03d}" if len(slices) > 1 else ""
                path = fsio.join(
                    base_dir, f"part-{pid:05d}{suffix}{cpart}.parquet")
                from vlm_eden_dataset_etl_ray.apply import with_key_bloom

                # stable name
                nbytes = fsio.write_parquet(path, with_key_bloom(sl, spec))
                wm = (pc.max(sl.column(spec.order)).as_py()
                      if sl.num_rows else -1)
                rows.append(
                    {
                        "pid": pid,
                        "stripe": s,
                        "n_stripes": k,
                        "path": path,
                        "rows": sl.num_rows,
                        "bytes": nbytes,
                        "watermark_lsn": -1 if wm is None else int(wm),
                        "stats": file_stats_json(sl),
                    }
                )
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("pid", pa.int64()), ("stripe", pa.int64()), ("n_stripes", pa.int64()),
             ("path", pa.string()), ("rows", pa.int64()), ("bytes", pa.int64()),
             ("watermark_lsn", pa.int64()), ("stats", pa.string())]))

    items: list[dict] = []
    for pid in sorted(m.partitions):
        st = m.partitions[pid]
        files_all = m.files(pid)
        if not files_all:
            continue
        fver = st.file_versions(m.schema_version)
        k_new = _next_pow2(-(-max(1, st.bytes) // stripe_target_bytes))
        if k_new == st.stripe_count and k_new > 1:
            # stable layout: each stripe reads its own base file + deltas
            stripes_of = (st.base_stripes if len(st.base_stripes) == len(st.base)
                          else [-1] * len(st.base))
            for s in range(k_new):
                fs = [f for f, fstripe in zip(st.base, stripes_of)
                      if fstripe in (s, -1)] + list(st.deltas)
                items.append({"pid": pid, "stripe": s, "n_stripes": k_new,
                              "files": fs, "vers": [fver[f] for f in fs]})
        else:
            for s in range(k_new):
                items.append({"pid": pid, "stripe": s, "n_stripes": k_new,
                              "files": files_all,
                              "vers": [fver[f] for f in files_all]})
    ds = work_items_dataset(items)
    meta = ds.map_batches(_compact_one, batch_size=1, batch_format="pyarrow").take_all()

    import json as _json

    by_pid: dict[int, list[dict]] = {}
    for r in meta:
        by_pid.setdefault(int(r["pid"]), []).append(r)
    parts: dict[int, mf.PartitionState] = {}
    for pid, rows_ in by_pid.items():
        old = m.partitions[pid]
        rows_.sort(key=lambda r: (int(r["stripe"]), str(r["path"])))
        k = int(rows_[0]["n_stripes"])
        parts[pid] = mf.PartitionState(
            pid=pid,
            base=[r["path"] for r in rows_],
            deltas=[],
            rows=sum(int(r["rows"]) for r in rows_),
            bytes=sum(int(r["bytes"]) for r in rows_),
            watermark_lsn=max([old.watermark_lsn]
                              + [int(r["watermark_lsn"]) for r in rows_]),
            applied_lsn_ranges=[list(x) for x in old.applied_lsn_ranges],
            stripe_count=k,
            base_stripes=[int(r["stripe"]) for r in rows_] if k > 1 else [0] * len(rows_),
            base_vers=[cur_ver] * len(rows_),
            file_stats={r["path"]: _json.loads(r["stats"])
                        for r in rows_ if r.get("stats")},
        )
    lineage_ids, lineage_inputs = mf.cumulative_lineage(lake_dir, m)
    out = mf.Manifest(
        epoch=epoch,
        num_partitions=m.num_partitions,
        schema_version=cur_ver,
        kind="compaction",
        partitions=parts,
        # lineage is cumulative: compaction rewrites files but the applied
        # input record must survive (vacuum drops old manifests; without
        # this, every applied shard would be re-applied on the next poll and
        # compaction's tombstone-drop would resurrect deleted rows). A
        # legacy per-epoch latest manifest is upgraded via the full union.
        applied_epoch_ids=lineage_ids,
        applied_inputs=lineage_inputs,
        hash_fn=m.hash_fn,
        schema_b64=m.schema_b64,
    )
    mf.commit(lake_dir, out)
    return out


def rehash(
    lake_dir: str,
    new_partitions: int,
    *,
    spec: TableSpec = TOKENS_SPEC,
    batch_size: int = 65536,
    stripe_bytes: int = 512 * 1024 * 1024,
    tombstone_watermark: int | None = None,
) -> mf.Manifest:
    """Partition-count evolution: re-bucket the lake's live snapshot into
    ``new_partitions`` hash partitions and commit it as one ``rehash``
    manifest (Iceberg's partition-spec evolution for the hash layout).

    A lake's partition count is otherwise frozen at creation — the wrong
    number for a table that grew 100×. Rehash is the scale-out/scale-in
    lever: O(lake) data movement ONCE (a full shuffle, like a global
    compaction), after which every epoch apply, key-pruned read and
    compaction follows the NEW layout automatically (writers take the
    count from the committed manifest, not the spec constant —
    ``apply._layout_spec``). Semantics preserved:

    - tombstone retention follows :func:`compact`'s contract exactly:
      ``tombstone_watermark=None`` (default) folds tombstones away — valid
      ONLY when no out-of-order delivery can still arrive; a MID-STREAM
      rehash must pass a watermark (``0`` keeps all) so a straggler upsert
      below a deleted key's LSN still loses the merge instead of
      resurrecting the row;
    - exactly-once lineage carries over verbatim: already-applied epoch
      ids keep skipping after the rehash;
    - the applied-LSN record is the union of every old partition's ranges
      (exact — a rehash moves rows, it doesn't apply or unapply any LSN);
    - time travel to pre-rehash epochs still works (old manifests + files
      remain until vacuum);
    - ``change_feed`` treats the rehash like a compaction (baseline
      advance, no row changes); NO feed may SPAN the
      boundary (partition ids are not comparable across it).

    Implementation: the merged snapshot streams through the ordinary
    epoch shuffle into a scratch sub-lake under the lake root (so its
    files live on the lake store and vacuum governs them), whose delta
    files are grafted into the rehash manifest as the new base."""
    from dataclasses import replace as _replace

    from vlm_eden_dataset_etl_ray import apply as apply_mod

    m = mf.latest(lake_dir)
    if m is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    if new_partitions < 1:
        raise ValueError(f"new_partitions must be >= 1, got {new_partitions}")
    if m.num_partitions == new_partitions:
        return m
    apply_mod.check_hash_fn(m)

    spec2 = _replace(spec, num_partitions=new_partitions)
    if m.total_rows() == 0:
        ids0, inputs0 = mf.cumulative_lineage(lake_dir, m)
        out = mf.Manifest(
            epoch=m.epoch + 1, num_partitions=new_partitions,
            schema_version=m.schema_version, kind="rehash", partitions={},
            applied_epoch_ids=ids0, applied_inputs=inputs0,
            hash_fn=m.hash_fn or apply_mod.HASH_FN, schema_b64=m.schema_b64)
        mf.commit(lake_dir, out)
        return out

    from vlm_eden_dataset_etl_ray.state.registry import SchemaRegistryState

    reg = SchemaRegistryState.load_readonly(lake_dir)
    exclude, _acts_unused, renames = _evolution_maps(reg, spec)
    # same rule as compact(): rewritten files carry CURRENT names, so they
    # are stamped with the registry's current version (see compact())
    cur_ver = reg.latest_version() if reg else m.schema_version
    # non-LWW engines: a live (finalized) scan would strip the per-column
    # seq state and the re-apply would null-fill it — re-bucket the RAW
    # state view instead (live_only=False keeps state columns; tombstones
    # ride along, carrying their delete barriers, and age out at the next
    # compaction exactly like a normal base rewrite)
    raw_state = spec.merge_engine != "lww"
    snap = scan(lake_dir, spec=spec, manifest=m,
                live_only=(tombstone_watermark is None) and not raw_state)
    if raw_state and tombstone_watermark is None:
        snap = snap.map_batches(
            lambda t, _s=spec: lww.drop_tombstones(t, _s),
            batch_format="pyarrow", zero_copy_batch=True)
    if tombstone_watermark is not None:
        def _drop_old_tombstones(t: pa.Table, *, op_col=spec.op_col,
                                 dead=spec.delete_op, order=spec.order,
                                 wm=tombstone_watermark) -> pa.Table:
            is_del = pc.equal(t.column(op_col), dead)
            old = pc.less_equal(t.column(order), pa.scalar(wm))
            return t.filter(pc.invert(pc.and_kleene(is_del, old)))

        snap = snap.map_batches(_drop_old_tombstones, batch_format="pyarrow",
                                zero_copy_batch=True)
    tmp = fsio.join(lake_dir, f"_rehash_{m.epoch + 1}")
    m2 = apply_mod.apply_epoch_dataset(
        tmp, snap, epoch_id=f"rehash-of-epoch-{m.epoch}", spec=spec2,
        batch_size=batch_size, stripe_bytes=stripe_bytes,
        target_schema=_output_schema(m, spec, None, True, exclude=exclude,
                                     renames=renames))

    global_wm = max((st.watermark_lsn for st in m.partitions.values()),
                    default=-1)
    ranges: list[list[int]] = []
    for st in m.partitions.values():
        for lo, hi in st.applied_lsn_ranges:
            ranges = mf.merge_ranges(ranges, int(lo), int(hi))
    parts: dict[int, mf.PartitionState] = {}
    for pid, st in m2.partitions.items():
        parts[pid] = mf.PartitionState(
            pid=pid,
            base=list(st.deltas),
            base_vers=[cur_ver] * len(st.deltas),
            rows=st.rows,
            bytes=st.bytes,
            watermark_lsn=global_wm,
            applied_lsn_ranges=[list(r) for r in ranges],
            file_stats={f: {c: list(v) for c, v in fs.items()}
                        for f, fs in st.file_stats.items()},
        )
    ids, inputs = mf.cumulative_lineage(lake_dir, m)
    out = mf.Manifest(
        epoch=m.epoch + 1,
        num_partitions=new_partitions,
        schema_version=cur_ver,
        kind="rehash",
        partitions=parts,
        applied_epoch_ids=ids,
        applied_inputs=inputs,
        hash_fn=m.hash_fn or apply_mod.HASH_FN,
        schema_b64=m.schema_b64,
    )
    mf.commit(lake_dir, out)
    # the scratch sub-lake's manifests must not shadow the real ones; its
    # DATA files stay (they are the new base, referenced by `out`)
    fsio.delete_dir(fsio.join(tmp, "_manifests"))
    return out


def count_rows(lake_dir: str, *, spec: TableSpec = TOKENS_SPEC) -> int:
    """Row count of the current snapshot. APPEND tables answer from the
    manifest alone (per-partition counts are recorded at write time —
    zero data I/O); UPSERT tables need the merge (duplicate versions and
    tombstones collapse at read), so they count a key-only scan — the
    cheapest correct plan (only the merge envelope leaves storage)."""
    m = mf.latest(lake_dir)
    if m is None:
        return 0
    if spec.mode == "append":
        return sum(st.rows for st in m.partitions.values())
    ds = scan(lake_dir, spec=spec, columns=[spec.key])
    return sum(b.num_rows
               for b in ds.iter_batches(batch_format="pyarrow",
                                        batch_size=None))


def clone(src_dir: str, dst_dir: str) -> mf.Manifest:
    """Zero-copy shallow branch (Delta's SHALLOW CLONE): commit the
    source's latest manifest into ``dst_dir`` unchanged — file references
    still point at the source's immutable data files, so a 100 TB lake
    branches in one metadata write. The branch then lives its own life:
    new epochs stage and commit under ``dst_dir``; a branch compaction
    rewrites data into branch-owned base files; branch ``vacuum`` walks
    only the branch's directories and can never touch source files.

    Caveat (same as every shallow clone): the SOURCE's vacuum does not
    know about branches — vacuuming the source past the clone point can
    delete files the branch still references. Keep the source's retention
    ≥ the branch's lifetime, or compact the branch (which re-homes all
    live data) before shrinking source retention.

    The schema-registry snapshot (``_schema``) is copied so evolution
    history (drops / re-adds / widenings) carries over."""
    m = mf.latest(src_dir)
    if m is None:
        raise FileNotFoundError(f"no committed manifest under {src_dir}")
    if mf.latest(dst_dir) is not None:
        raise FileExistsError(f"{dst_dir} already holds a committed lake")
    fsio.makedirs(dst_dir)
    reg_src = fsio.join(src_dir, "_schema")
    for name in fsio.list_names(reg_src):
        data = fsio.read_bytes(fsio.join(reg_src, name))
        fsio.makedirs(fsio.join(dst_dir, "_schema"))
        fsio.write_bytes(fsio.join(dst_dir, "_schema", name), data)
    mf.commit(dst_dir, m)
    return m


def restore(lake_dir: str, epoch: int) -> mf.Manifest:
    """Roll the lake back to committed ``epoch`` (Delta's RESTORE): a new
    manifest re-publishes that epoch's partition state — one metadata
    write, no data movement — and the exactly-once ledger rewinds with
    it: input batches applied AFTER the restore point leave the applied
    record, so the CDC poll loop re-applies them on its next pass (a
    restore UNDOES them; keeping their ids would silently drop that data
    forever). Time travel to pre-restore epochs keeps working while their
    manifests are retained; the undone epochs' data files are reclaimed
    by the next ``vacuum`` once their manifests age out.

    Requires the target epoch's manifest (and files) to be retained —
    don't vacuum past your rollback horizon."""
    epochs = mf.list_epochs(lake_dir)
    if epoch not in epochs:
        raise ValueError(
            f"epoch {epoch} is not a retained committed epoch of "
            f"{lake_dir} (retained: {epochs})")
    cur = mf.latest(lake_dir)
    target = mf.load(lake_dir, epoch)
    ids, inputs = mf.cumulative_lineage(lake_dir, target)
    out = mf.Manifest(
        epoch=cur.epoch + 1,
        num_partitions=target.num_partitions,
        schema_version=target.schema_version,
        kind="restore",
        partitions=target.partitions,
        applied_epoch_ids=ids,
        applied_inputs=inputs,
        hash_fn=target.hash_fn,
        schema_b64=target.schema_b64,
    )
    mf.commit(lake_dir, out)
    return out
