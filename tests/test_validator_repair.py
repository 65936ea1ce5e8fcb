"""Validator repair pipeline (reference sync/sync_validator.py:24-62):
delete a committed delta file from the lake, run repair against the source
changelog, and the lake reconverges to the oracle — S10 (windowed dest key
scan) → S11 (distributed anti-join) → S12 (Dataset-direct re-apply)."""

import json
import os

from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake, manifest as mf, oracle
from vlm_eden_dataset_etl_ray.pipelines.validator import repair


def _build(tmp_path):
    # ONE epoch: each partition has a single delta, so losing it loses every
    # key hashed there (the reference's id-based validator heals missing
    # KEYS — stale versions never arise under exactly-once lineage)
    p = cl.ChangelogParams(n_docs=120, n_events=1500, n_shards=6)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, files)
    return p, lake_dir, files


def _lose_a_delta(lake_dir):
    """Simulate data loss: remove one delta file from disk AND from the
    latest manifest (as a storage scrubber would after detecting rot)."""
    m = mf.latest(lake_dir)
    victim_pid = next(pid for pid in sorted(m.partitions)
                      if m.partitions[pid].deltas)
    lost = m.partitions[victim_pid].deltas.pop(0)
    os.remove(lost)
    path = os.path.join(lake_dir, mf.MANIFEST_DIR, f"epoch={m.epoch:010d}.json")
    with open(path, "w") as fh:
        json.dump(m.to_json(), fh, sort_keys=True, indent=1)
    return victim_pid


def test_repair_reconverges_after_file_loss(tmp_path):
    p, lake_dir, files = _build(tmp_path)
    exp = oracle.final_state(p)
    before = lake.snapshot(lake_dir)
    assert before.num_rows == exp.num_rows  # healthy first

    _lose_a_delta(lake_dir)
    damaged = lake.snapshot(lake_dir)
    assert damaged.num_rows < exp.num_rows  # loss is visible

    m = repair(lake_dir, files)
    assert m.epoch > 1  # a repair epoch was committed
    healed = lake.snapshot(lake_dir)
    assert healed.sort_by("doc_id").select(["doc_id", "tokens", "lsn"]).equals(
        exp.sort_by("doc_id").select(["doc_id", "tokens", "lsn"])
    )

    # an intact lake repairs to a no-op (no new epoch)
    m2 = repair(lake_dir, files)
    assert m2.epoch == m.epoch


def test_repair_windowed_scope(tmp_path):
    """A window that excludes the lost rows' LSNs must NOT repair them —
    the reference's validator only heals its 2-day window."""
    p, lake_dir, files = _build(tmp_path)
    _lose_a_delta(lake_dir)
    damaged_rows = lake.snapshot(lake_dir).num_rows
    m_before = mf.latest(lake_dir).epoch
    repair(lake_dir, files, window=(-10, -1))  # empty window
    assert mf.latest(lake_dir).epoch == m_before
    assert lake.snapshot(lake_dir).num_rows == damaged_rows
