"""Cross-epoch (incremental) exact dedup backed by the engine's own lake.

Batch :func:`..functions.dedup.exact_dedup` answers "dedup this corpus";
a CDC ingest needs the INCREMENTAL question: "which of this epoch's
documents are new, given everything any earlier epoch already kept?" —
without ever re-reading the old corpus payload. The seen-content state is
a first-class lake table (key = the 64-bit content hash), so it inherits
the whole CDC machinery for free: exactly-once epoch commit, crash
resume, compaction, time travel. The reference's analogue is the
per-batch natural-key skip in sync/modalities.py:94-97 — per batch only;
this persists the decision across runs.

Scale shape (per epoch):
- payload hashes per batch (vectorized) → slim ``(content_hash, keep_by)``
  stream, 16 B/row;
- within-epoch keep-first: two-stage top-1 on the hash;
- anti-join against the state lake's hash column — only hashes shuffle;
- fresh hashes committed via :func:`..apply.apply_epoch_dataset` (2PC,
  idempotent on ``epoch_id``);
- survivors: one semi-join of the original payload against the fresh id
  set — the document payload crosses the exchange exactly once.

Replay determinism: re-running an already-committed ``epoch_id`` returns
the SAME survivor set by anti-joining against the state **as of the epoch
before it was first applied** (time-travel scan); this requires that
predecessor manifest to still be retained (don't vacuum past your replay
horizon).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray import lake
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray.spec import TableSpec

#: the seen-hash state table: one row per distinct content hash ever kept.
#: Each hash commits at most once (the anti-join guarantees it), so the
#: LWW machinery never actually has to resolve a conflict.
HASH_STATE_SPEC = TableSpec(
    name="seen_hashes", key="content_hash", order="lsn", num_partitions=32)

_EMPTY_HASHES = pa.table({"content_hash": pa.array([], pa.int64())})


def _epoch_first_applied(state_dir: str, epoch_id: str) -> int:
    for e in sorted(mf.list_epochs(state_dir)):
        if epoch_id in mf.load(state_dir, e).applied_epoch_ids:
            return e
    raise ValueError(f"epoch_id {epoch_id!r} not found in any retained manifest")


def incremental_exact_dedup(
    state_dir: str,
    docs: rd.Dataset,
    *,
    on: list[str],
    keep_by: str,
    epoch_id: str,
    spec: TableSpec = HASH_STATE_SPEC,
    join_buckets: int | None = None,
) -> rd.Dataset:
    """Return ``docs`` minus every row whose ``on``-content was already
    kept by an earlier epoch (or by a lower-``keep_by`` row of this one),
    and commit the survivors' hashes to the ``state_dir`` lake under
    ``epoch_id`` (exactly-once; a re-run with the same id commits nothing
    and reproduces the same survivors via a time-travel scan)."""
    from vlm_eden_dataset_etl_ray.apply import _already_applied, apply_epoch_dataset
    from vlm_eden_dataset_etl_ray.functions.hashing import content_hash
    from vlm_eden_dataset_etl_ray.functions.relational import (
        hash_semi_join,
        top1_per_key,
    )

    def _hash(t: pa.Table) -> pa.Table:
        h = content_hash(t, on)
        return pa.table({
            "content_hash": pa.array(h.astype(np.int64)),
            keep_by: t.column(keep_by),
        })

    slim = docs.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)
    winners = top1_per_key(slim, "content_hash", [(keep_by, "ascending")])

    done = _already_applied(state_dir, epoch_id)
    if done is not None:
        first = _epoch_first_applied(state_dir, epoch_id)
        seen = (lake.scan(state_dir, spec=spec,
                          columns=["content_hash"], asof_epoch=first - 1)
                if first > 1 else rd.from_arrow(_EMPTY_HASHES))
    elif mf.latest(state_dir) is None:
        seen = rd.from_arrow(_EMPTY_HASHES)
    else:
        seen = lake.scan(state_dir, spec=spec,
                         columns=["content_hash"])

    # fresh = this epoch's winners whose content no earlier epoch kept.
    # Materialized once (slim rows) so the commit and the survivor
    # semi-join below don't re-execute the hash + anti-join pipeline.
    fresh = hash_semi_join(
        winners, seen, "content_hash", "content_hash", anti=True,
        num_buckets=join_buckets,
    ).materialize()

    if done is None:
        def _rows(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "content_hash": t.column("content_hash"),
                keep_by: t.column(keep_by),
                "lsn": pa.array(np.zeros(n, np.int64)),
                "op": pa.array(["insert"] * n, pa.string()),
            })

        s = docs.schema()
        key_type = dict(zip(s.names, s.types))[keep_by]
        rows = (fresh.map_batches(_rows, batch_format="pyarrow")
                if fresh.count() > 0 else
                # all-duplicate epoch: still commit a (rows-free) manifest
                # so the epoch_id enters the exactly-once record
                rd.from_arrow(pa.table({
                    "content_hash": pa.array([], pa.int64()),
                    keep_by: pa.array([], key_type),
                    "lsn": pa.array([], pa.int64()),
                    "op": pa.array([], pa.string()),
                })))
        apply_epoch_dataset(
            state_dir, rows, epoch_id=epoch_id, spec=spec)

    return hash_semi_join(
        docs, fresh.select_columns([keep_by]), keep_by, keep_by,
        num_buckets=join_buckets)
