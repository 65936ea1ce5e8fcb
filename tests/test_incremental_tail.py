"""Incremental WAL-tail loop: shards land in waves, run_incremental applies
only the pending ones (exact file-set lineage — the reference's 10-minute
polling watermark, sync/sync_base.py:47-59, made exact), converging to the
oracle without reprocessing anything."""

import os
import shutil

import numpy as np
import ray

from vlm_eden_dataset_etl_ray import changelog as cl, lake, manifest as mf, oracle
from vlm_eden_dataset_etl_ray.pipelines.cdc import run_incremental
from vlm_eden_dataset_etl_ray.state.registry import SchemaRegistryState, make_registry_actor


def test_tail_applies_only_new_shards(tmp_path):
    p = cl.ChangelogParams(n_docs=150, n_events=1500, schema_change_at=900, n_shards=6)
    src = str(tmp_path / "full")
    files = cl.write_changelog(src, p)
    tail_dir = str(tmp_path / "tail")
    os.makedirs(tail_dir)
    lake_dir = str(tmp_path / "lake")

    # wave 1: first third of the shards arrive
    for f in files[:2]:
        shutil.copy(f, tail_dir)
    m1 = run_incremental(lake_dir, tail_dir)
    assert m1.epoch == 1 and len(m1.applied_inputs) == 2

    # tick with nothing new → no new epoch
    m_idle = run_incremental(lake_dir, tail_dir)
    assert m_idle.epoch == m1.epoch

    # wave 2 + 3
    for f in files[2:5]:
        shutil.copy(f, tail_dir)
    m2 = run_incremental(lake_dir, tail_dir)
    # lineage is cumulative: 2 shards from wave 1 + 3 new ones
    assert m2.epoch == 2 and len(m2.applied_inputs) == 5

    for f in files[5:]:
        shutil.copy(f, tail_dir)
    m3 = run_incremental(lake_dir, tail_dir)
    assert m3.epoch == 3

    snap = lake.snapshot(lake_dir)
    exp = oracle.final_state(p)
    assert snap.num_rows == exp.num_rows
    assert snap.sort_by("doc_id").select(["doc_id", "tokens", "lsn"]).equals(
        exp.sort_by("doc_id").select(["doc_id", "tokens", "lsn"])
    )
    # every source shard applied exactly once: the latest manifest's
    # CUMULATIVE lineage lists each shard once, across exactly three epochs
    assert len(m3.applied_epoch_ids) == 3
    assert sorted(os.path.basename(f) for f in m3.applied_inputs) == sorted(
        os.listdir(tail_dir)
    )


def test_backlog_cap_bounds_epoch_size(tmp_path):
    """A week-long outage must not become one giant epoch: with
    max_epoch_bytes, the pending backlog chunks into ⌈backlog/cap⌉
    bounded epochs, lineage stays exact, and a crash mid-backlog resumes
    at the first un-applied chunk."""
    p = cl.ChangelogParams(n_docs=150, n_events=1500, schema_change_at=900,
                           n_shards=8)
    src = str(tmp_path / "full")
    files = cl.write_changelog(src, p)
    lake_dir = str(tmp_path / "lake")

    sizes = [os.path.getsize(f) for f in files]
    cap = max(sizes) * 2  # ~2 shards per epoch regardless of shard size
    # expected greedy chunk count over the full backlog
    n_chunks, acc = 1, 0
    for b in sizes:
        if acc and acc + b > cap:
            n_chunks += 1
            acc = 0
        acc += b

    m = run_incremental(lake_dir, src, max_epoch_bytes=cap)
    assert m.epoch == n_chunks > 2
    assert len(m.applied_inputs) == len(files)
    assert len(m.applied_epoch_ids) == n_chunks

    snap = lake.snapshot(lake_dir)
    exp = oracle.final_state(p)
    assert snap.num_rows == exp.num_rows
    assert snap.sort_by("doc_id").select(["doc_id", "tokens", "lsn"]).equals(
        exp.sort_by("doc_id").select(["doc_id", "tokens", "lsn"]))

    # crash mid-backlog: the first chunk committed, the process died; the
    # next capped tail run resumes at the first un-applied chunk
    from vlm_eden_dataset_etl_ray import apply as apply_mod

    lake2 = str(tmp_path / "lake2")
    m1 = apply_mod.apply_epoch(lake2, files[:2])
    assert m1.epoch == 1
    m2 = run_incremental(lake2, src, max_epoch_bytes=cap)
    assert len(m2.applied_inputs) == len(files)
    snap2 = lake.snapshot(lake2)
    assert snap2.sort_by("doc_id").select(["doc_id", "tokens", "lsn"]).equals(
        exp.sort_by("doc_id").select(["doc_id", "tokens", "lsn"]))


def test_registry_concurrent_registration_serializes(tmp_path):
    """Two concurrent registrations of the same evolved schema must agree on
    one version number (the reference's migration lock, cron_tasks.py:54-56,
    as actor serialization)."""
    from vlm_eden_dataset_etl_ray import schema as sch

    reg = make_registry_actor(str(tmp_path / "lake_reg"))

    @ray.remote
    def register():
        return ray.get(reg.find_or_register.remote(sch.PAYLOAD_V2))

    versions = ray.get([register.remote() for _ in range(8)])
    assert set(versions) == {2}
    # persisted: a fresh (non-actor) instance sees the same state
    state = SchemaRegistryState(str(tmp_path / "lake_reg"))
    assert state.latest_version() == 2
    assert state.schema(2).equals(sch.PAYLOAD_V2)
