"""Compaction vs concurrent apply publish race: a compaction that loses
the epoch slot must fail LOUDLY (rebasing would publish base files that
lack the racing epoch's deltas — silent data loss), leave the lake
unharmed (its rewritten files are unreferenced orphans), and a re-run
must compact the post-race snapshot correctly."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray.spec import TableSpec

SPEC = TableSpec(name="t_race", key="k", order="lsn", num_partitions=2,
                 envelope=())


def _shard(path, keys, lsns, vals):
    pq.write_table(pa.table({
        "k": pa.array(keys, pa.string()), "lsn": pa.array(lsns, pa.int64()),
        "v": pa.array(vals, pa.int64()),
        "op": pa.array(["upsert"] * len(keys)),
    }), str(path))
    return str(path)


def test_compaction_loses_publish_race_loudly_and_rerun_recovers(
        tmp_path, monkeypatch):
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, [_shard(tmp_path / "s1.parquet",
                                        ["a", "b"], [1, 2], [10, 20])],
                      spec=SPEC)
    apply.apply_epoch(lake_dir, [_shard(tmp_path / "s2.parquet",
                                        ["b"], [3], [30])], spec=SPEC)
    racer = _shard(tmp_path / "s3.parquet", ["c"], [4], [40])

    orig_commit = mf.commit
    state = {"raced": False}

    def racing_commit(d, m):
        # first compaction publish attempt: a concurrent apply wins the
        # epoch slot just before it
        if m.kind == "compaction" and not state["raced"]:
            state["raced"] = True
            apply.apply_epoch(d, [racer], spec=SPEC)
        return orig_commit(d, m)

    monkeypatch.setattr(mf, "commit", racing_commit)
    with pytest.raises(FileExistsError):
        lake.compact(lake_dir, spec=SPEC)

    # lake unharmed: racer's epoch is the latest, full state correct
    snap = lake.snapshot(lake_dir, spec=SPEC)
    assert dict(zip(snap.column("k").to_pylist(),
                    snap.column("v").to_pylist())) == {"a": 10, "b": 30,
                                                       "c": 40}
    # re-run compacts the post-race snapshot (racer's row included)
    m = lake.compact(lake_dir, spec=SPEC)
    assert m.kind == "compaction"
    snap2 = lake.snapshot(lake_dir, spec=SPEC)
    assert dict(zip(snap2.column("k").to_pylist(),
                    snap2.column("v").to_pylist())) == {"a": 10, "b": 30,
                                                        "c": 40}


def test_maybe_compact_skips_on_lost_race(tmp_path, monkeypatch):
    """The cadence caller treats a lost publish race as 'skip this tick':
    the next tick compacts the fresher snapshot whole."""
    lake_dir = str(tmp_path / "lake")
    for i in range(9):  # cross the min_delta_files=8 cadence trigger
        apply.apply_epoch(lake_dir, [_shard(tmp_path / f"e{i}.parquet",
                                            ["a"], [i + 1], [i])], spec=SPEC)
    racer = _shard(tmp_path / "r.parquet", ["z"], [99], [99])
    orig_commit = mf.commit
    state = {"raced": False}

    def racing_commit(d, m):
        if m.kind == "compaction" and not state["raced"]:
            state["raced"] = True
            apply.apply_epoch(d, [racer], spec=SPEC)
        return orig_commit(d, m)

    monkeypatch.setattr(mf, "commit", racing_commit)
    assert lake.maybe_compact(lake_dir, spec=SPEC) is None  # lost → skip
    m2 = lake.maybe_compact(lake_dir, spec=SPEC)  # next tick succeeds
    assert m2 is not None and m2.kind == "compaction"
    snap = lake.snapshot(lake_dir, spec=SPEC)
    assert dict(zip(snap.column("k").to_pylist(),
                    snap.column("v").to_pylist())) == {"a": 8, "z": 99}
