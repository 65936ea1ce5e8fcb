"""Multi-table star-schema ETL: the reference's per-tenant sync flow,
Ray-Data-first.

The reference's ``run_etl`` applies dims BEFORE facts so the fact loader's
per-row dim-key subqueries resolve (/root/reference/tasks.py:31-45 stage
ordering; K2 lookups queries/fact_studies.py:86-112). Here:

1. each dimension is snapshot-upserted into its own lake (full-refresh
   changelog, op=insert — the reference's daily organizations refresh K7);
2. the fact changelog is enriched with dim attributes via a broadcast
   lookup BUILT FROM THE COMMITTED DIM LAKE (stage ordering enforced by
   pipeline topology, not cron sequencing);
3. the enriched fact changelog is applied through the same exactly-once
   epoch machinery as everything else.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply as apply_mod
from vlm_eden_dataset_etl_ray import lake as lake_mod
from vlm_eden_dataset_etl_ray.functions.relational import broadcast_left_join
from vlm_eden_dataset_etl_ray.pipelines.cdc import _derive_batch
from vlm_eden_dataset_etl_ray.sources.parquet import read_table
from vlm_eden_dataset_etl_ray.spec import TableSpec

FACT_SPEC = TableSpec(name="fact_events", key="doc_id", order="lsn",
                      num_partitions=16, envelope=())


def snapshot_upsert(
    sf_dir: str,
    table: str,
    key: str,
    lake_dir: str,
    columns: list[str] | None = None,
):
    """Full-refresh snapshot → changelog (op=insert, lsn=snapshot ordinal)
    → epoch apply. Re-running against the same snapshot is a no-op
    (exactly-once via the manifest's applied-input ids). Returns the
    committed manifest."""
    spec = TableSpec(name=f"dim_{table}", key=key, order="lsn", num_partitions=8,
                     envelope=())
    ds = read_table(sf_dir, table, columns=columns)

    def _to_changelog(t: pa.Table) -> pa.Table:
        # lsn = stable function of the key so re-derivation is deterministic
        keys = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.append_column("lsn", pa.array(keys))
        t = t.append_column("op", pa.array(np.full(len(keys), "insert")))
        return t

    import hashlib

    epoch_id = hashlib.sha256(
        f"snapshot:{table}:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:16]
    return apply_mod.apply_epoch_dataset(
        lake_dir, ds.map_batches(_to_changelog, batch_format="pyarrow"),
        epoch_id=epoch_id, spec=spec,
    )


def run_etl(sf_dir: str, warehouse: str | None = None,
            fresh: bool = True) -> dict[str, str]:
    """Dims first, then the enriched fact, then ONE warehouse manifest
    making the (dims + fact) pair visible atomically (see
    :mod:`..warehouse` — a crash between the table commits leaves the
    previous consistent pair in effect; the re-run skips already-applied
    epochs and publishes the switch). Returns {table: lake_dir}.

    ``fresh=False`` resumes instead of rebuilding — the idempotent path a
    crash-recovery re-run takes."""
    from vlm_eden_dataset_etl_ray import warehouse as wh_mod
    from vlm_eden_dataset_etl_ray.pipelines.cdc import scratch_dir

    warehouse = warehouse or scratch_dir("etl_star_")
    lakes = {}

    # 1. dimensions (the reference syncs facilities/modalities/practitioners
    #    before studies; customer plays the dim role over the testdata)
    dim_lake = os.path.join(warehouse, "dim_customer")
    if fresh:
        shutil.rmtree(dim_lake, ignore_errors=True)
    dim_m = snapshot_upsert(sf_dir, "customer", "c_custkey", dim_lake,
                            columns=["c_custkey", "c_name", "c_mktsegment"])
    lakes["dim_customer"] = dim_lake

    # 2. fact changelog enriched against the COMMITTED dim lake (K2 analog:
    #    broadcast hash lookup instead of 8 correlated subqueries per row)
    dim_spec = TableSpec(name="dim_customer", key="c_custkey", order="lsn",
                         num_partitions=8, envelope=())
    dim_snap = lake_mod.snapshot(dim_lake, spec=dim_spec,
                                 columns=["c_custkey", "c_name"])

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "event_type", "value"])

    def _derive_keep_uid(t: pa.Table) -> pa.Table:
        out = _derive_batch(t, with_tokens=False)
        return out.append_column("user_id", t.column("user_id"))

    chg = ev.map_batches(_derive_keep_uid, batch_format="pyarrow")
    chg = broadcast_left_join(chg, dim_snap, "user_id", "c_custkey", ["c_name"])

    import hashlib

    fact_lake = os.path.join(warehouse, "fact_events")
    if fresh:
        shutil.rmtree(fact_lake, ignore_errors=True)
    # the enriched changelog streams directly into the epoch apply — no
    # scratch parquet round trip (the write→read was one extra full-dataset
    # materialization per epoch)
    epoch_id = hashlib.sha256(
        f"etl_fact:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:16]
    fact_m = apply_mod.apply_epoch_dataset(fact_lake, chg, epoch_id=epoch_id,
                                           spec=FACT_SPEC)
    lakes["fact_events"] = fact_lake

    # 3. the atomic visibility switch: both tables' epochs become the
    #    warehouse's current view in one put_if_absent
    wh_mod.commit_epoch(
        warehouse,
        {"dim_customer": (dim_lake, dim_m.epoch),
         "fact_events": (fact_lake, fact_m.epoch)},
        epoch_id=hashlib.sha256(
            f"etl_star:{os.path.abspath(sf_dir)}:{dim_m.epoch}:"
            f"{fact_m.epoch}".encode()).hexdigest()[:16],
    )
    return lakes


def fact_snapshot(lakes: dict[str, str], columns: list[str] | None = None) -> rd.Dataset:
    return lake_mod.scan(
        lakes["fact_events"], spec=FACT_SPEC,
        columns=columns or ["doc_id", "lsn", "user_id", "n_tok", "source", "c_name"],
    )
