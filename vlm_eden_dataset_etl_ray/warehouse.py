"""Warehouse-level atomic multi-table epochs.

A star-schema sync commits several lakes (dims, then the fact). Per-lake
2PC makes each table exactly-once, but a crash BETWEEN table commits
leaves the warehouse readable in a mixed state — new dim rows joined to
an old fact (the reference has the same hole: its watermark advances
mid-sync, /root/reference/sync/modalities.py:118). This module closes it
with a catalog-level commit point, the same shape an Iceberg/lakehouse
catalog uses for multi-table transactions:

1. every table's epoch is applied through its own lake's exactly-once
   machinery (idempotent on ``epoch_id`` — a crash + re-run never
   double-applies);
2. ONE warehouse manifest recording the exact ``(lake_dir, epoch)`` pair
   per table is then published via a single rename-free
   ``put_if_absent`` — the atomic visibility switch.

Readers that want cross-table consistency read THROUGH the warehouse
(:func:`snapshot` / :func:`scan` pin each table to the epoch its
manifest recorded — time-travel scans, so late per-lake commits are
invisible). A crash after some lake commits but before the warehouse
publish leaves the previous warehouse manifest — and therefore the
previous, fully consistent (dims + fact) view — in effect; the re-run
skips the already-applied lake epochs and publishes the switch.

Direct per-lake readers still see single-table exactly-once semantics;
cross-table atomicity is a property of the warehouse view, which is the
standard contract (a database's snapshot isolation also only holds
inside the database).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import ray.data as rd

from vlm_eden_dataset_etl_ray import fsio
from vlm_eden_dataset_etl_ray import lake as lake_mod
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray.spec import TableSpec

WAREHOUSE_MANIFEST_DIR = "_warehouse_manifests"


@dataclass
class WarehouseManifest:
    epoch: int
    epoch_id: str
    #: table name → {"dir": lake_dir, "epoch": committed lake epoch}
    tables: dict[str, dict] = field(default_factory=dict)

    def to_json(self) -> dict:
        return {"epoch": self.epoch, "epoch_id": self.epoch_id,
                "tables": self.tables}

    @staticmethod
    def from_json(d: dict) -> "WarehouseManifest":
        return WarehouseManifest(epoch=int(d["epoch"]),
                                 epoch_id=d["epoch_id"],
                                 tables=dict(d["tables"]))


def _path(warehouse_dir: str, epoch: int) -> str:
    return fsio.join(warehouse_dir, WAREHOUSE_MANIFEST_DIR,
                     f"epoch={epoch:010d}.json")


def list_epochs(warehouse_dir: str) -> list[int]:
    out = []
    for f in fsio.list_names(fsio.join(warehouse_dir, WAREHOUSE_MANIFEST_DIR)):
        if f.startswith("epoch=") and f.endswith(".json"):
            out.append(int(f[len("epoch="):-len(".json")]))
    return sorted(out)


def latest(warehouse_dir: str) -> WarehouseManifest | None:
    epochs = list_epochs(warehouse_dir)
    if not epochs:
        return None
    return load(warehouse_dir, epochs[-1])


def load(warehouse_dir: str, epoch: int) -> WarehouseManifest:
    return WarehouseManifest.from_json(
        fsio.read_json(_path(warehouse_dir, epoch)))


def _id_marker(warehouse_dir: str, epoch_id: str) -> str:
    return fsio.join(warehouse_dir, WAREHOUSE_MANIFEST_DIR, "_ids",
                     f"{epoch_id}.json")


def _already_committed(warehouse_dir: str, epoch_id: str) -> WarehouseManifest | None:
    """Idempotency check in O(1): every commit leaves an epoch_id →
    epoch marker alongside the manifest. A marker can be missing only for
    a commit that crashed between the manifest publish and the marker
    write, so on a marker miss the (newest-first) scan runs once and
    self-heals the marker."""
    marker = _id_marker(warehouse_dir, epoch_id)
    if fsio.exists(marker):
        return load(warehouse_dir, int(fsio.read_bytes(marker)))
    for e in reversed(list_epochs(warehouse_dir)):
        m = load(warehouse_dir, e)
        if m.epoch_id == epoch_id:
            fsio.makedirs(fsio.parent(marker))
            fsio.put_if_absent(marker, str(e).encode())
            return m
    return None


def commit_epoch(
    warehouse_dir: str,
    tables: dict[str, tuple[str, int]],
    *,
    epoch_id: str,
) -> WarehouseManifest:
    """Publish the atomic visibility switch: one manifest pinning every
    table to its just-committed lake epoch, written with a single
    ``put_if_absent``. Idempotent on ``epoch_id`` (a replayed sync returns
    the original manifest); a raced slot is retried at the next epoch
    number, matching :func:`..manifest.commit` semantics."""
    done = _already_committed(warehouse_dir, epoch_id)
    if done is not None:
        return done
    fsio.makedirs(fsio.join(warehouse_dir, WAREHOUSE_MANIFEST_DIR))
    while True:
        prev = latest(warehouse_dir)
        m = WarehouseManifest(
            epoch=(prev.epoch + 1) if prev else 1,
            epoch_id=epoch_id,
            tables={name: {"dir": d, "epoch": int(e)}
                    for name, (d, e) in sorted(tables.items())},
        )
        data = json.dumps(m.to_json(), sort_keys=True, indent=1).encode()
        if fsio.put_if_absent(_path(warehouse_dir, m.epoch), data):
            marker = _id_marker(warehouse_dir, epoch_id)
            fsio.makedirs(fsio.parent(marker))
            fsio.put_if_absent(marker, str(m.epoch).encode())
            return m
        racer = _already_committed(warehouse_dir, epoch_id)
        if racer is not None:  # the racer WAS this epoch_id's retry
            return racer


def scan(
    warehouse_dir: str,
    table: str,
    *,
    spec: TableSpec,
    columns: list[str] | None = None,
    warehouse_epoch: int | None = None,
) -> rd.Dataset:
    """Merge-on-read scan of ``table`` AS OF the warehouse manifest — a
    time-travel scan pinned to the lake epoch the atomic commit recorded,
    so every table read through the same warehouse epoch is mutually
    consistent even while a newer sync is mid-flight."""
    m = (load(warehouse_dir, warehouse_epoch)
         if warehouse_epoch is not None else latest(warehouse_dir))
    if m is None:
        raise FileNotFoundError(
            f"no warehouse manifest in {warehouse_dir!r}")
    if table not in m.tables:
        raise KeyError(f"table {table!r} not in warehouse epoch {m.epoch} "
                       f"(has {sorted(m.tables)})")
    ent = m.tables[table]
    return lake_mod.scan(ent["dir"], spec=spec, columns=columns,
                         asof_epoch=int(ent["epoch"]))


def change_feed(
    warehouse_dir: str,
    from_epoch: int = 0,
    to_epoch: int | None = None,
    *,
    specs: dict[str, TableSpec],
    before_image: bool = False,
) -> dict[str, rd.Dataset]:
    """Snapshot-consistent multi-table CDC output: per-table change feeds
    between two WAREHOUSE epochs. Each table's feed runs from the lake
    epoch the ``from`` warehouse manifest pinned to the one the ``to``
    manifest pinned — so a consumer tailing the warehouse sees exactly
    the row changes between two ATOMIC (dims + fact) snapshots, never a
    mixed-sync frontier (the per-lake feeds alone cannot promise that: a
    crash between table commits leaves their heads unaligned).

    Returns ``{table: Dataset}`` with the standard feed envelope
    (``_change_type`` and, with ``before_image``, ``_before``); a table
    whose pinned epoch did not move maps to an empty Dataset. Tables
    present only in the ``to`` manifest feed from lake epoch 0 (their
    full state counts as inserts). Retention contract: the pinned lake
    manifests of BOTH warehouse epochs must not be vacuumed."""
    m1 = (load(warehouse_dir, to_epoch) if to_epoch is not None
          else latest(warehouse_dir))
    if m1 is None:
        raise FileNotFoundError(f"no warehouse manifest in {warehouse_dir!r}")
    if from_epoch > m1.epoch:
        raise ValueError(
            f"from_epoch {from_epoch} > to_epoch {m1.epoch} (swapped "
            "arguments would silently return all-empty feeds)")
    m0 = load(warehouse_dir, from_epoch) if from_epoch > 0 else None
    if m0 is not None:
        removed = sorted(set(m0.tables) - set(m1.tables))
        if removed:
            # a table removal is a catalog-level event a row feed cannot
            # express — a mirror built from these feeds would silently
            # keep the table forever
            raise ValueError(
                f"tables {removed} were removed between warehouse epochs "
                f"{from_epoch} and {m1.epoch}; a change feed cannot "
                "express table removal — handle it at the catalog level")
    out: dict[str, rd.Dataset] = {}
    for name, ent in sorted(m1.tables.items()):
        spec = specs.get(name)
        if spec is None:
            raise KeyError(f"no TableSpec provided for table {name!r}")
        e1 = int(ent["epoch"])
        e0 = 0
        if m0 is not None and name in m0.tables:
            ent0 = m0.tables[name]
            if ent0["dir"] != ent["dir"]:
                raise ValueError(
                    f"table {name!r} moved lakes between warehouse epochs "
                    f"({ent0['dir']} -> {ent['dir']}); feeds cannot span it")
            e0 = int(ent0["epoch"])
        if e1 <= e0:
            out[name] = rd.from_items([])
            continue
        out[name] = lake_mod.change_feed(
            ent["dir"], e0, e1, spec=spec, before_image=before_image)
    return out
