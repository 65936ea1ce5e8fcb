"""Incremental view maintenance (IVM) for lake aggregates.

The reference maintains reporting views by re-running their aggregate
queries over the whole destination on every sync (the A2–A5 grouped-count
views, e.g. /root/reference/migrations/20230207_01_53Bud.sql). At 100 TB
that recompute IS the job; the CDC-native answer is to maintain each view
from the epoch's *delta*:

    view += contrib(new live rows of the epoch's keys)
          - contrib(old live rows of the epoch's keys)

Both sides come from key-restricted merge-on-read scans pinned to the
manifests before and after the apply — no hook into the merge internals,
so IVM composes with every engine feature (tombstones, insert-only
columns, drop/re-add evolution, compaction) by construction. The
telescoping sum makes multi-epoch maintenance exact under out-of-order
delivery: Σ deltas = contrib(final) − contrib(initial), whatever the
epoch split.

Scale shape:

- The epoch's keys prune the scans to their hash PARTITIONS
  (``lake.scan(pids=…)``); within a partition the key filter is a
  vectorized ``is_in`` against a broadcast key array (epoch-bounded).
  Cost per epoch ≈ 2 key-restricted reads of the touched partitions,
  amortized over EVERY registered view — against a full-lake
  re-aggregation per view per epoch.
- View state lives as parquet + a tiny JSON manifest per lake epoch under
  ``view_root/<name>/``; commits are rename-free (unique data file +
  ``put_if_absent`` manifest — the loser of a race leaves an orphaned
  data file, reclaimed by vacuum). Re-running maintenance for an
  already-recorded lake epoch is a no-op, so crash-rerun is safe.
- Groups whose live count reaches zero are dropped from the stored view
  (a view row exists iff at least one live lake row contributes).
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from vlm_eden_dataset_etl_ray import apply as apply_mod
from vlm_eden_dataset_etl_ray import fsio
from vlm_eden_dataset_etl_ray import lake as lake_mod
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray.functions.hashing import partition_ids
from vlm_eden_dataset_etl_ray.spec import TOKENS_SPEC, TableSpec

VIEW_MANIFEST_DIR = "_view_manifests"


@dataclass
class ViewSpec:
    """One maintained aggregate: COUNT(*) plus optional SUMs, grouped by
    ``group_cols``, over the lake's LIVE rows. Sum columns must be
    integer-typed — integer deltas telescope exactly; float sums would
    accumulate rounding drift across epochs (the cast to int64 fails loud
    on a float measure)."""

    name: str
    group_cols: list[str]
    count_alias: str = "n"
    sum_cols: dict[str, str] = field(default_factory=dict)  # src → alias
    #: "low" (default): single-block tree-reduce combine — reporting-grade
    #: group spaces. "high": groupby shuffle — per-key-sized views.
    cardinality: str = "low"

    @property
    def out_cols(self) -> list[str]:
        return list(self.group_cols) + [self.count_alias] + list(self.sum_cols.values())


def _contrib(ds: rd.Dataset, vspec: ViewSpec, sign: int) -> rd.Dataset:
    """Per-batch signed partial aggregate: (group_cols, ±count, ±sums)."""

    def _partial(t: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in vspec.sum_cols] + [([], "count_all")]
        g = t.select(vspec.group_cols + list(vspec.sum_cols)) \
            .group_by(vspec.group_cols).aggregate(aggs)
        names = vspec.group_cols + [f"__s_{c}" for c in vspec.sum_cols] + ["__n"]
        g = g.rename_columns(names)
        arrs, out_names = [], []
        for c in vspec.group_cols:
            arrs.append(g.column(c)); out_names.append(c)
        arrs.append(pc.multiply(g.column("__n").cast(pa.int64()), sign))
        out_names.append(vspec.count_alias)
        for c, alias in vspec.sum_cols.items():
            arrs.append(pc.multiply(
                pc.coalesce(g.column(f"__s_{c}").cast(pa.int64()),
                            pa.scalar(0, pa.int64())), sign))
            out_names.append(alias)
        return pa.Table.from_arrays(arrs, names=out_names)

    return ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)


def _combine(ds: rd.Dataset, vspec: ViewSpec,
             cardinality: str = "low") -> rd.Dataset:
    """Sum the signed partials per group; drop groups whose count is 0.
    Views are reporting-grade (bounded group spaces), so the default
    combine is the single-block tree reduce; ``cardinality="high"``
    switches to the groupby shuffle for per-key-sized views."""
    aliases = [vspec.count_alias] + list(vspec.sum_cols.values())

    def _finish(t: pa.Table) -> pa.Table:
        g = t.group_by(vspec.group_cols).aggregate(
            [(a, "sum") for a in aliases])
        g = g.rename_columns(vspec.group_cols + aliases)
        for a in aliases:
            i = g.column_names.index(a)
            g = g.set_column(i, a, pc.coalesce(
                g.column(a).cast(pa.int64()), pa.scalar(0, pa.int64())))
        keep = pc.not_equal(g.column(vspec.count_alias), 0)
        return g.filter(keep).select(vspec.out_cols)

    if cardinality == "low":
        from vlm_eden_dataset_etl_ray.functions.relational import _single_block

        return _single_block(ds).map_batches(
            _finish, batch_format="pyarrow", batch_size=None)

    from ray.data.aggregate import Sum

    out = ds.groupby(vspec.group_cols).aggregate(
        *[Sum(a, alias_name=a) for a in aliases])

    def _cast(t: pa.Table) -> pa.Table:
        for a in aliases:
            i = t.column_names.index(a)
            t = t.set_column(i, a, pc.coalesce(
                t.column(a).cast(pa.int64()), pa.scalar(0, pa.int64())))
        keep = pc.not_equal(t.column(vspec.count_alias), 0)
        return t.filter(keep).select(vspec.out_cols)

    return out.map_batches(_cast, batch_format="pyarrow", zero_copy_batch=True)


def _view_dir(view_root: str, name: str) -> str:
    return fsio.join(fsio.canon(view_root), name)


def _latest_view_manifest(vdir: str) -> dict | None:
    mdir = fsio.join(vdir, VIEW_MANIFEST_DIR)
    if not fsio.is_dir(mdir):
        return None
    best = None
    for n in fsio.list_names(mdir):
        if n.startswith("v") and n.endswith(".json"):
            e = int(n[1:-5])
            if best is None or e > best[0]:
                best = (e, n)
    if best is None:
        return None
    return fsio.read_json(fsio.join(mdir, best[1]))


def read_view(view_root: str, name: str) -> rd.Dataset:
    """Latest committed state of a view (empty dataset if never built)."""
    vm = _latest_view_manifest(_view_dir(view_root, name))
    if vm is None or not vm["files"]:
        return rd.from_items([])
    return rd.read_parquet(vm["files"])


def _commit_view(vdir: str, lake_epoch: int, table_ds: rd.Dataset,
                 vspec: ViewSpec) -> dict:
    """Write the new view state and commit it for ``lake_epoch``
    rename-free: data under a unique name, manifest via put_if_absent."""
    data_dir = fsio.join(vdir, "data")
    fsio.makedirs(data_dir)
    path = fsio.join(data_dir, f"e{lake_epoch}-{uuid.uuid4().hex[:12]}.parquet")
    batches = list(table_ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if batches:
        t = pa.concat_tables(batches)
    else:
        t = pa.table({c: [] for c in vspec.out_cols})
    t = t.sort_by([(c, "ascending") for c in vspec.group_cols]) \
        if t.num_rows else t
    fsio.write_parquet(path, t)
    vm = {"lake_epoch": lake_epoch, "files": [path] if t.num_rows else [],
          "rows": t.num_rows, "view": vspec.name}
    mpath = fsio.join(vdir, VIEW_MANIFEST_DIR, f"v{lake_epoch}.json")
    fsio.makedirs(fsio.join(vdir, VIEW_MANIFEST_DIR))
    if not fsio.put_if_absent(mpath, json.dumps(vm, sort_keys=True).encode()):
        # lost a concurrent race for the same lake epoch: the winner's
        # state is equivalent (same lake manifests in, same math)
        fsio.delete_file(path)
        return fsio.read_json(mpath)
    return vm


def apply_epoch_with_views(
    lake_dir: str,
    changelog_files: list[str],
    views: list[ViewSpec],
    view_root: str,
    *,
    spec: TableSpec = TOKENS_SPEC,
    registry=None,
    **apply_kwargs,
) -> mf.Manifest:
    """Apply one changelog epoch and incrementally maintain ``views``.

    Exactly-once at both layers: the lake apply keeps its manifest
    lineage; each view records the lake epoch it reflects and skips
    epochs it has already incorporated (crash between lake commit and
    view commit self-heals on the next call — the view catches up from
    the same pinned manifests). Only ``mode="upsert"`` specs are
    supported (append-mode IVM is a plain delta aggregate; use the
    ordinary grouped counts for that)."""
    if spec.mode != "upsert":
        raise ValueError("apply_epoch_with_views requires an upsert-mode spec")

    m_before = mf.latest(lake_dir)
    m_after = apply_mod.apply_epoch(lake_dir, changelog_files, spec=spec,
                                    registry=registry, **apply_kwargs)
    maintain_views(lake_dir, views, view_root, m_before=m_before,
                   m_after=m_after, changelog_files=changelog_files, spec=spec)
    return m_after


def maintain_views(
    lake_dir: str,
    views: list[ViewSpec],
    view_root: str,
    *,
    m_before: mf.Manifest | None,
    m_after: mf.Manifest,
    changelog_files: list[str],
    spec: TableSpec = TOKENS_SPEC,
) -> None:
    """Fold one applied epoch (``m_before`` → ``m_after``) into every view.

    A view whose recorded epoch already covers ``m_after`` skips; a view
    recorded at ``m_before`` advances by the delta; anything older
    rebuilds from the pinned ``m_after`` snapshot (the safe fallback for
    views registered late or left behind by a crash-vacuum interleaving)."""
    before_epoch = m_before.epoch if m_before is not None else 0
    keys_ref = None
    pids = None

    for vspec in views:
        vdir = _view_dir(view_root, vspec.name)
        vm = _latest_view_manifest(vdir)
        have = vm["lake_epoch"] if vm else 0
        if have >= m_after.epoch:
            continue  # already incorporated (idempotent re-run)
        need_cols = sorted({spec.key, *vspec.group_cols, *vspec.sum_cols})

        if (vm is None or have != before_epoch
                or (m_before is not None
                    and m_before.num_partitions != m_after.num_partitions)):
            # initial build / catch-up: aggregate the pinned full snapshot.
            # The layout guard also covers a rehash racing between the
            # caller's m_before read and the apply — partition ids are not
            # comparable across the boundary, so the minus-side pruned scan
            # would read the wrong partitions; rebuild instead.
            full = lake_mod.scan(lake_dir, spec=spec, columns=need_cols,
                                 manifest=m_after)
            state = _combine(_contrib(full, vspec, +1), vspec,
                             cardinality=vspec.cardinality)
            _commit_view(vdir, m_after.epoch, state, vspec)
            continue

        if keys_ref is None:
            # epoch key set + its hash partitions, computed once per call
            kt = rd.read_parquet(changelog_files, columns=[spec.key]) \
                if changelog_files else rd.from_items([])
            batches = list(kt.iter_batches(batch_format="pyarrow",
                                           batch_size=None)) if changelog_files else []
            keys = (pc.unique(pa.concat_tables(batches).column(spec.key))
                    if batches else pa.array([], pa.string()))
            keys_ref = ray.put(keys)
            # partition count from the manifests being scanned (a rehash
            # may have changed it from the spec constant)
            pids = sorted(set(
                partition_ids(keys, m_after.num_partitions).tolist())) if len(keys) else []

        if not pids:
            _commit_view(vdir, m_after.epoch, read_view(view_root, vspec.name),
                         vspec)
            continue

        def _key_filter(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            return t.filter(pc.is_in(t.column(spec.key), value_set=ks))

        parts: list[rd.Dataset] = []
        # sides whose pruned partitions hold no files contribute nothing —
        # checked on manifest METADATA so no empty untyped datasets enter
        # the union (brand-new keys: the old side may have no files at all)
        if any(m_after.files(p) for p in pids):
            new = lake_mod.scan(lake_dir, spec=spec, columns=need_cols,
                                manifest=m_after, pids=pids).map_batches(
                _key_filter, batch_format="pyarrow", zero_copy_batch=True)
            parts.append(_contrib(new, vspec, +1))
        if any(m_before.files(p) for p in pids):
            old = lake_mod.scan(lake_dir, spec=spec, columns=need_cols,
                                manifest=m_before, pids=pids).map_batches(
                _key_filter, batch_format="pyarrow", zero_copy_batch=True)
            parts.append(_contrib(old, vspec, -1))
        if vm["files"]:
            parts.append(_contrib_passthrough(
                read_view(view_root, vspec.name), vspec))
        if not parts:
            _commit_view(vdir, m_after.epoch,
                         read_view(view_root, vspec.name), vspec)
            continue
        merged = parts[0]
        for p_ds in parts[1:]:
            merged = merged.union(p_ds)
        _commit_view(vdir, m_after.epoch,
                     _combine(merged, vspec, cardinality=vspec.cardinality),
                     vspec)


def _contrib_passthrough(ds: rd.Dataset, vspec: ViewSpec) -> rd.Dataset:
    """Normalize partial/delta rows to the view's column set (they already
    are — this exists to keep the union schema-aligned for empty sides)."""

    def _f(t: pa.Table) -> pa.Table:
        return t.select(vspec.out_cols)

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)
