"""Time travel (scan any committed manifest) and vacuum (GC of files no
retained manifest references, with snapshot isolation for kept epochs)."""

import glob
import os

import numpy as np

from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake, manifest as mf, oracle


def _setup(tmp_path, n_epochs=3):
    p = cl.ChangelogParams(n_docs=120, n_events=1500, schema_change_at=900, n_shards=6)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")
    chunks = np.array_split(np.array(files, dtype=object), n_epochs)
    for ch in chunks:
        apply.apply_epoch(lake_dir, [str(f) for f in ch])
    return p, lake_dir


def test_time_travel_reads_old_epoch(tmp_path):
    p, lake_dir = _setup(tmp_path)
    snap_at_1 = lake.snapshot(lake_dir, manifest=mf.load(lake_dir, 1))
    snap_latest = lake.snapshot(lake_dir)
    # epoch 1 saw only a third of the stream: different (smaller or equal) state
    assert snap_at_1.num_rows <= snap_latest.num_rows
    # re-reading epoch 1 later still returns the identical table
    again = lake.snapshot(lake_dir, manifest=mf.load(lake_dir, 1))
    assert again.equals(snap_at_1)
    # latest equals the oracle
    exp = oracle.final_state(p)
    assert snap_latest.sort_by("doc_id").select(["doc_id", "tokens"]).equals(
        exp.sort_by("doc_id").select(["doc_id", "tokens"])
    )


def test_vacuum_after_compaction_drops_old_files(tmp_path):
    p, lake_dir = _setup(tmp_path)
    lake.compact(lake_dir)
    before = len(glob.glob(os.path.join(lake_dir, "**", "*.parquet"), recursive=True))
    stats = lake.vacuum(lake_dir, keep_epochs=1, min_age_seconds=0)
    after = len(glob.glob(os.path.join(lake_dir, "**", "*.parquet"), recursive=True))
    assert stats["files_removed"] > 0 and stats["bytes_removed"] > 0
    assert stats["manifests_removed"] == 3  # epochs 1-3 dropped, compaction kept
    assert after < before
    # the retained snapshot is untouched and still equals the oracle
    snap = lake.snapshot(lake_dir)
    exp = oracle.final_state(p)
    assert snap.sort_by("doc_id").select(["doc_id", "tokens"]).equals(
        exp.sort_by("doc_id").select(["doc_id", "tokens"])
    )
    # exactly the files of the retained manifest remain
    m = mf.latest(lake_dir)
    live = {os.path.abspath(f) for pid in m.partitions for f in m.files(pid)}
    on_disk = {os.path.abspath(f) for f in glob.glob(
        os.path.join(lake_dir, "**", "*.parquet"), recursive=True)}
    assert on_disk == live


def test_vacuum_keeps_recent_epochs_readable(tmp_path):
    p, lake_dir = _setup(tmp_path)
    snap2 = lake.snapshot(lake_dir, manifest=mf.load(lake_dir, 2))
    lake.vacuum(lake_dir, keep_epochs=2, min_age_seconds=0)  # keeps epochs 2 and 3
    assert mf.list_epochs(lake_dir) == [2, 3]
    again = lake.snapshot(lake_dir, manifest=mf.load(lake_dir, 2))
    assert again.equals(snap2)  # snapshot isolation for retained epochs


def test_training_stream_covers_lake_and_shuffles(tmp_path):
    p, lake_dir = _setup(tmp_path)
    exp = oracle.final_state(p)
    seen = []
    total = 0
    for b in lake.training_stream(lake_dir, batch_size=64, shuffle_seed=7):
        assert set(b.column_names) == {"doc_id", "tokens", "n_tok"}
        assert b.num_rows <= 64
        seen += b.column("doc_id").to_pylist()
        total += b.num_rows
    assert total == exp.num_rows
    assert sorted(seen) == sorted(exp.column("doc_id").to_pylist())  # full coverage, no dups
    # a different seed yields a different order (overwhelmingly likely)
    order2 = []
    for b in lake.training_stream(lake_dir, batch_size=64, shuffle_seed=99):
        order2 += b.column("doc_id").to_pylist()
    assert order2 != seen
