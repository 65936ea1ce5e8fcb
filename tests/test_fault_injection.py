"""Fault injection: a transient task failure mid-epoch must not break
exactly-once or convergence — Ray retries the task, the stable staging
name means the retry overwrites its own partial output, and the manifest
only commits once every partition reported in."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake, oracle
from vlm_eden_dataset_etl_ray.spec import TableSpec


def test_transient_merge_failure_retries_and_converges(tmp_path, monkeypatch):
    p = cl.ChangelogParams(n_docs=150, n_events=1500, n_shards=4)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")

    marker = str(tmp_path / "fail_once_marker")
    orig = apply._merge_slices_and_write

    def flaky(batch: pa.Table, spec, staging_dir, _marker=marker):
        # first task to observe the marker absent crashes (simulated worker
        # death); Ray's lineage retry re-runs it — and only it
        pids = batch.column("pid").to_pylist()
        if 0 in [int(x) for x in pids] and not os.path.exists(_marker):
            with open(_marker, "w") as fh:
                fh.write("crashed once")
            raise RuntimeError("injected transient failure in partition merge")
        return orig(batch, spec, staging_dir)

    monkeypatch.setattr(apply, "_merge_slices_and_write", flaky)
    m = apply.apply_epoch(lake_dir, files)
    assert os.path.exists(marker), "failure was never injected"

    snap = lake.snapshot(lake_dir)
    exp = oracle.final_state(p)
    assert snap.num_rows == exp.num_rows
    assert snap.sort_by("doc_id").select(["doc_id", "tokens"]).equals(
        exp.sort_by("doc_id").select(["doc_id", "tokens"])
    )
    # the staged delta for the crashed partition exists exactly once
    staged = [f for f in os.listdir(os.path.join(lake_dir, "staging", f"epoch={m.epoch}"))
              if f.startswith("part-00000")]
    assert len(staged) == 1


def test_transient_prepare_failure_retries_and_converges(tmp_path, monkeypatch):
    """Same, but the failure hits phase A (spill) — orphan slices from the
    failed attempt are verbatim duplicates and collapse in the LWW merge."""
    p = cl.ChangelogParams(n_docs=100, n_events=1000, n_shards=3)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")

    # defined in function scope → cloudpickle ships it BY VALUE to workers
    class FlakySpill(apply.PrepareAndSpill):
        """Spills its slices, THEN crashes once (worst case: orphan slices
        from the failed attempt remain on disk). Marker lives inside the
        lake dir so it is visible across worker processes."""

        def __call__(self, batch):
            out = apply.PrepareAndSpill.__call__(self, batch)
            marker = os.path.join(os.path.dirname(self.shuffle_dir), "prep_marker")
            if not os.path.exists(marker):
                with open(marker, "w") as fh:
                    fh.write("crashed after spill")
                raise RuntimeError("injected failure AFTER spilling slices")
            return out

    monkeypatch.setattr(apply, "PrepareAndSpill", FlakySpill)
    m = apply.apply_epoch(lake_dir, files)
    marker = os.path.join(lake_dir, "staging", f"epoch={m.epoch}", "prep_marker")
    assert os.path.exists(marker)

    snap = lake.snapshot(lake_dir)
    exp = oracle.final_state(p)
    assert snap.num_rows == exp.num_rows
    assert snap.sort_by("doc_id").select(["doc_id", "tokens", "lsn"]).equals(
        exp.sort_by("doc_id").select(["doc_id", "tokens", "lsn"])
    )
