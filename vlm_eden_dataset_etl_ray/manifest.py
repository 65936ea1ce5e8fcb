"""Two-phase-commit manifests: the engine's exactly-once ledger.

Replaces the reference's ``sync_records`` watermark table
(``/root/reference/migrations/20230104_01_r9HiK.sql:4-11``, written at
``sync/sync_base.py:32-45``) and its fuzzy 5-second overlap re-read
(``sync/sync_base.py:55-56``) with exact lineage: each committed epoch's
manifest records, per partition, the delta/base files, applied-LSN ranges,
row/byte counts and the high-watermark LSN. Commit protocol with only
RENAME-FREE filesystem primitives (runs on local POSIX and object stores
alike — all I/O through :mod:`vlm_eden_dataset_etl_ray.fsio`):

1. tasks write staging files with STABLE names ``staging/epoch=K/part-P.parquet``
   via a direct output stream (a retried task overwrites its own file —
   idempotent; readers only ever open manifest-committed files);
2. the driver publishes ``_manifests/epoch=K.json`` with
   :func:`fsio.put_if_absent` — atomic create-if-absent (``O_EXCL``
   locally, the store's conditional PUT on S3/GCS/Azure);
3. re-running a committed epoch is a no-op (`is_committed`); a crash before
   (2) leaves orphan staging files that the rerun simply overwrites; a LOST
   publish race raises ``FileExistsError`` and the caller rebases.

Layout of a lake directory::

    lake/
      _manifests/epoch=0000000001.json
      staging/epoch=1/part-00007.parquet     (promoted into the manifest)
      base/epoch=3/part-00007.parquet        (compaction output)
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from vlm_eden_dataset_etl_ray import fsio

MANIFEST_DIR = "_manifests"


@dataclass
class PartitionState:
    pid: int
    base: list[str] = field(default_factory=list)      # compacted base files
    deltas: list[str] = field(default_factory=list)    # epoch delta files, commit order
    rows: int = 0                                       # rows in files (incl. tombstones)
    bytes: int = 0
    watermark_lsn: int = -1                             # max applied lsn
    applied_lsn_ranges: list[list[int]] = field(default_factory=list)
    # Partition-split (stripe) layout: a partition whose compacted size
    # exceeds the stripe target is split by a SECOND key hash into
    # ``stripe_count`` sub-files, so the merge-on-read / compaction task
    # unit is the stripe, not the whole partition — partitions no longer
    # grow without bound as the lake does. ``base_stripes[i]`` is the
    # stripe id of ``base[i]``; delta files always span every stripe (a
    # per-stripe read filters them by the stripe hash).
    stripe_count: int = 1
    base_stripes: list[int] = field(default_factory=list)
    # Zone maps: per-file column min/max for data skipping, keyed by file
    # path → {column: [min, max]} (numeric / temporal-as-int64 columns only,
    # recorded at write time). Partition-granularity pruning for upsert
    # tables (a whole key-disjoint unit may be skipped without breaking the
    # LWW merge), file-granularity for append tables. Optional: absent
    # entries mean "must read".
    file_stats: dict[str, dict[str, list]] = field(default_factory=dict)
    # Schema version each file was WRITTEN at (parallel to base / deltas).
    # Drop+re-add evolution needs this at merge-on-read: a column re-added
    # at version v is a fresh generation, so files written before v must
    # read it as null instead of resurrecting pre-drop values. Legacy
    # manifests (lists absent) backfill with the manifest's own version.
    base_vers: list[int] = field(default_factory=list)
    delta_vers: list[int] = field(default_factory=list)

    def to_json(self) -> dict[str, Any]:
        return {
            "pid": self.pid,
            "base": self.base,
            "deltas": self.deltas,
            "rows": self.rows,
            "bytes": self.bytes,
            "watermark_lsn": self.watermark_lsn,
            "applied_lsn_ranges": self.applied_lsn_ranges,
            "file_stats": self.file_stats,
            "stripe_count": self.stripe_count,
            "base_stripes": self.base_stripes,
            "base_vers": self.base_vers,
            "delta_vers": self.delta_vers,
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "PartitionState":
        return PartitionState(
            pid=d["pid"], base=list(d["base"]), deltas=list(d["deltas"]),
            rows=d["rows"], bytes=d["bytes"], watermark_lsn=d["watermark_lsn"],
            applied_lsn_ranges=[list(r) for r in d["applied_lsn_ranges"]],
            file_stats={k: {c: list(v) for c, v in st.items()}
                        for k, st in d.get("file_stats", {}).items()},
            stripe_count=int(d.get("stripe_count", 1)),
            base_stripes=[int(x) for x in d.get("base_stripes", [])],
            base_vers=[int(x) for x in d.get("base_vers", [])],
            delta_vers=[int(x) for x in d.get("delta_vers", [])],
        )

    def file_versions(self, fallback: int) -> dict[str, int]:
        """path → schema version written at, ``fallback`` for files whose
        manifest predates per-file version tracking."""
        out: dict[str, int] = {}
        bv = self.base_vers if len(self.base_vers) == len(self.base) else []
        dv = self.delta_vers if len(self.delta_vers) == len(self.deltas) else []
        for i, f in enumerate(self.base):
            out[f] = bv[i] if bv else fallback
        for i, f in enumerate(self.deltas):
            out[f] = dv[i] if dv else fallback
        return out


@dataclass
class Manifest:
    epoch: int
    num_partitions: int
    schema_version: int
    kind: str  # "delta" | "compaction"
    partitions: dict[int, PartitionState]
    # CUMULATIVE lineage: every applied input-batch id / input file since lake
    # creation, carried forward into each new manifest (delta AND compaction)
    # so the latest manifest alone is a complete exactly-once record that
    # survives vacuum() of older manifests.
    applied_epoch_ids: list[str] = field(default_factory=list)
    applied_inputs: list[str] = field(default_factory=list)
    # Fingerprint of the key→partition hash implementation (see
    # functions.hashing.HASH_FN). Validated on resume: a different active
    # hash would silently split keys across partitions.
    hash_fn: str = ""
    # Lineage format marker. "cumulative" = applied_epoch_ids/applied_inputs
    # carry the FULL history (latest manifest alone suffices); "epoch"
    # (the pre-marker legacy default) = per-epoch lists only, so exactly-once
    # checks must union over ALL retained manifests.
    lineage: str = "cumulative"
    # base64(pa.Schema.serialize()) of the cumulative WRITE schema (union of
    # every epoch's stored schema). Scans union this with sampled file
    # footers so a SPARSE epoch that widened the schema (DML, MERGE, view
    # refresh — epochs that touch few partitions) is visible everywhere
    # immediately; "" on legacy manifests (footer sampling alone, the old
    # behavior).
    schema_b64: str = ""

    def files(self, pid: int) -> list[str]:
        st = self.partitions.get(pid)
        if st is None:
            return []
        return list(st.base) + list(st.deltas)

    def total_rows(self) -> int:
        return sum(s.rows for s in self.partitions.values())

    def to_json(self) -> dict[str, Any]:
        return {
            "epoch": self.epoch,
            "num_partitions": self.num_partitions,
            "schema_version": self.schema_version,
            "kind": self.kind,
            "applied_epoch_ids": self.applied_epoch_ids,
            "applied_inputs": self.applied_inputs,
            "hash_fn": self.hash_fn,
            "lineage": self.lineage,
            "schema_b64": self.schema_b64,
            "partitions": [self.partitions[k].to_json() for k in sorted(self.partitions)],
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "Manifest":
        return Manifest(
            epoch=d["epoch"], num_partitions=d["num_partitions"],
            schema_version=d["schema_version"], kind=d["kind"],
            applied_epoch_ids=list(d.get("applied_epoch_ids", [])),
            applied_inputs=list(d.get("applied_inputs", [])),
            hash_fn=d.get("hash_fn", ""),
            lineage=d.get("lineage", "epoch"),  # absent marker = legacy
            schema_b64=d.get("schema_b64", ""),
            partitions={p["pid"]: PartitionState.from_json(p) for p in d["partitions"]},
        )


def encode_schema(s) -> str:
    """``pa.Schema`` → base64 IPC bytes for ``Manifest.schema_b64``."""
    if s is None:
        return ""
    import base64

    return base64.b64encode(s.serialize().to_pybytes()).decode("ascii")


def decode_schema(b64: str):
    """Inverse of :func:`encode_schema`; None for ""/legacy manifests."""
    if not b64:
        return None
    import base64

    import pyarrow as pa

    return pa.ipc.read_schema(pa.py_buffer(base64.b64decode(b64)))


def _manifest_path(lake_dir: str, epoch: int) -> str:
    return fsio.join(lake_dir, MANIFEST_DIR, f"epoch={epoch:010d}.json")


def list_epochs(lake_dir: str) -> list[int]:
    out = []
    for f in fsio.list_names(fsio.join(lake_dir, MANIFEST_DIR)):
        if f.startswith("epoch=") and f.endswith(".json"):
            out.append(int(f[len("epoch="):-len(".json")]))
    return sorted(out)


def latest(lake_dir: str) -> Manifest | None:
    epochs = list_epochs(lake_dir)
    if not epochs:
        return None
    return load(lake_dir, epochs[-1])


def load(lake_dir: str, epoch: int) -> Manifest:
    return Manifest.from_json(fsio.read_json(_manifest_path(lake_dir, epoch)))


def is_committed(lake_dir: str, epoch: int) -> bool:
    return fsio.exists(_manifest_path(lake_dir, epoch))


def commit(lake_dir: str, m: Manifest) -> str:
    """Atomically publish ``m`` rename-free: one ``put_if_absent`` of the
    final name (O_EXCL locally / conditional PUT on object stores) — exactly
    one of any number of racing committers wins; losers raise
    ``FileExistsError`` and rebase. Deterministic bytes (sorted keys, no
    timestamps) so exactly-once tests can compare manifests bytewise."""
    fsio.makedirs(fsio.join(lake_dir, MANIFEST_DIR))
    path = _manifest_path(lake_dir, m.epoch)
    data = json.dumps(m.to_json(), sort_keys=True, indent=1).encode()
    if not fsio.put_if_absent(path, data):
        raise FileExistsError(f"epoch {m.epoch} already committed: {path}")
    return path


def cumulative_lineage(lake_dir: str, m: Manifest | None) -> tuple[list[str], list[str]]:
    """Full ``(applied_epoch_ids, applied_inputs)`` history as of manifest
    ``m``. A ``lineage="cumulative"`` manifest carries it alone; a LEGACY
    per-epoch manifest does not — its lists cover only its own epoch, so the
    true history is the union over ALL retained manifests. Every writer that
    seeds a new cumulative manifest from a prior one (epoch apply, compaction)
    and every exactly-once membership check MUST go through this helper:
    seeding from a legacy manifest's own lists would silently drop earlier
    epochs from the record, and re-applying one of those shards after a
    tombstone-dropping compaction resurrects deleted rows."""
    if m is None:
        return [], []
    if m.lineage == "cumulative":
        return list(m.applied_epoch_ids), list(m.applied_inputs)
    ids: set[str] = set()
    inputs: set[str] = set()
    for e in list_epochs(lake_dir):
        em = load(lake_dir, e)
        ids.update(em.applied_epoch_ids)
        inputs.update(em.applied_inputs)
    return sorted(ids), sorted(inputs)


def merge_ranges(ranges: list[list[int]], lo: int, hi: int) -> list[list[int]]:
    """Insert [lo, hi] into a sorted list of closed LSN ranges, coalescing
    adjacent/overlapping ranges — the per-partition lineage record."""
    if lo > hi:
        return ranges
    out: list[list[int]] = []
    placed = False
    for a, b in sorted(ranges + [[lo, hi]]):
        if out and a <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], b)
        else:
            out.append([a, b])
    return out
