"""Self-healing validator: the reference's laggard-repair job, composed.

The reference runs a daily SyncValidator that (S10) reads the DESTINATION's
study ids for a recent window, (S11) asks the SOURCE for same-window rows
NOT in that id set, and (S12) re-extracts + re-applies exactly those
(/root/reference/sync/sync_validator.py:24-62 with the window at :26-29 and
the ``id not in %(ids)s`` anti-join at :44-49). Exactly-once lineage makes
routine laggards impossible here, but a lake whose delta files were
corrupted or lost still needs this convergence path.

Ray-Data shape: the anti-join is a distributed left hash join (dest keys →
null ⇒ missing) rather than a driver-collected ``NOT IN`` list, so the
window can be arbitrarily large; the repair rows stream straight into
``apply_epoch_dataset``. Re-applying old versions of a key is safe — the
LWW merge is idempotent and order-insensitive (tombstones included)."""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply as apply_mod
from vlm_eden_dataset_etl_ray import lake as lake_mod
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray.spec import TableSpec, TOKENS_SPEC


def repair(
    lake_dir: str,
    source_files: list[str],
    *,
    spec: TableSpec = TOKENS_SPEC,
    window: tuple[int, int] | None = None,
    registry=None,
) -> mf.Manifest:
    """Reconverge the lake against the source changelog.

    S10: scan the lake's keys (tombstones INCLUDED — a properly-deleted key
    is present, so its history is not pointlessly re-extracted) within the
    LSN ``window`` (default: everything up to the committed watermark).
    S11: anti-join the same-window source rows against those keys.
    S12: apply the missing rows as a repair epoch (Dataset-direct).
    Returns the resulting latest manifest (unchanged when nothing is
    missing)."""
    latest = mf.latest(lake_dir)
    if latest is None:
        raise FileNotFoundError(f"no committed manifest under {lake_dir}")
    if window is None:
        hi = max((p.watermark_lsn for p in latest.partitions.values()), default=-1)
        window = (0, hi)
    lo, hi = window

    order = spec.order

    def _in_window(t: pa.Table) -> pa.Table:
        col = t.column(order)
        return t.filter(pc.and_(pc.greater_equal(col, lo), pc.less_equal(col, hi)))

    # S10 — destination keys in window (distinct via the groupby shuffle)
    dest = lake_mod.scan(lake_dir, spec=spec, columns=[spec.key, order],
                         live_only=False, manifest=latest)
    dest_keys = (
        dest.map_batches(_in_window, batch_format="pyarrow")
        .groupby(spec.key).count()
        .map_batches(lambda t: pa.table({"__dest_key": t.column(spec.key)}),
                     batch_format="pyarrow")
    )

    # S11 — source rows in window whose key is absent from the destination
    from vlm_eden_dataset_etl_ray.functions.relational import hash_join

    src = rd.read_parquet(source_files).map_batches(
        _in_window, batch_format="pyarrow").materialize()
    if src.count() == 0:
        return latest
    dest_keys = dest_keys.materialize()
    if dest_keys.count() == 0:
        missing = src  # destination window empty → everything is missing
    else:
        # both sides are materialized → size_bytes() is free metadata, and
        # the bucket count then tracks the repair window's data volume
        joined = hash_join(src, dest_keys, spec.key, "__dest_key", how="left",
                           bytes_hint=(src.size_bytes() or 0)
                           + (dest_keys.size_bytes() or 0))

        def _missing_only(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_null(t.column("__dest_key"))).drop_columns(["__dest_key"])

        missing = joined.map_batches(_missing_only, batch_format="pyarrow").materialize()
    if missing.count() == 0:
        return latest

    # S12 — repair epoch; lineage id derived from (lake state, inputs, window)
    epoch_id = hashlib.sha256(
        ("repair:%d:%d:%d:%s" % (latest.epoch, lo, hi,
                                 ",".join(sorted(os.path.abspath(f) for f in source_files)))
         ).encode()
    ).hexdigest()[:16]
    return apply_mod.apply_epoch_dataset(
        lake_dir, missing, epoch_id=epoch_id, spec=spec, registry=registry
    )
