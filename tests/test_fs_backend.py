"""Pluggable-filesystem lake backend (fsio) tests.

The lake's entire read/write/commit protocol must hold on a filesystem with
NO rename primitive (object stores). The ``norename://`` scheme routes all
I/O through the generic pyarrow.fs path with scheme-ful paths end-to-end —
any residual raw ``os`` call or rename dependency on a lake path fails
loudly. The racing-commit test proves two concurrent committers of the same
epoch serialize through the put_if_absent commit primitive.
"""

import threading

import pytest

from vlm_eden_dataset_etl_ray import apply, changelog as cl, fsio, lake, \
    manifest as mf, oracle
from vlm_eden_dataset_etl_ray.state.registry import SchemaRegistryState

PREFIXES = ["", fsio.SCHEME_NORENAME]


def _mk(tmp_path, **kw):
    p = cl.ChangelogParams(n_docs=120, n_events=1500, n_shards=6, **kw)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    return p, files


@pytest.mark.parametrize("prefix", PREFIXES)
def test_lake_lifecycle_on_backend(tmp_path, prefix):
    p, files = _mk(tmp_path, schema_change_at=900)
    lake_dir = prefix + str(tmp_path / "lake")
    m1 = apply.apply_epoch(lake_dir, files[:3])
    m2 = apply.apply_epoch(lake_dir, files[3:])
    assert m2.epoch == m1.epoch + 1
    # every recorded file path carries the scheme and resolves
    for pid in m2.partitions:
        for f in m2.files(pid):
            assert f.startswith(prefix)
            assert fsio.exists(f)
    exp = oracle.final_state(p)
    snap = lake.snapshot(lake_dir)
    assert snap.num_rows == exp.num_rows
    cols = [c for c in exp.column_names if c in snap.column_names]
    assert snap.sort_by("doc_id").select(cols).equals(exp.sort_by("doc_id").select(cols))

    # time-travel to epoch 1, compact, vacuum — all on the same backend
    assert lake.scan(lake_dir, asof_epoch=m1.epoch).count() > 0
    mc = lake.compact(lake_dir)
    assert lake.snapshot(lake_dir).num_rows == exp.num_rows
    stats = lake.vacuum(lake_dir, keep_epochs=1, min_age_seconds=0)
    assert stats["files_removed"] > 0 and stats["manifests_removed"] > 0
    assert mf.list_epochs(lake_dir) == [mc.epoch]
    assert lake.snapshot(lake_dir).num_rows == exp.num_rows
    # column pruning still pushes into the read
    pruned = lake.scan(lake_dir, columns=["doc_id", "n_tok"])
    t = pruned.take_batch(5, batch_format="pyarrow")
    assert t.column_names == ["doc_id", "n_tok"]


@pytest.mark.parametrize("prefix", PREFIXES)
def test_crash_resume_on_backend(tmp_path, prefix):
    p, files = _mk(tmp_path)
    lake_dir = prefix + str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, files[:3])
    m2 = apply.apply_epoch(lake_dir, files[3:])
    # simulate a crash AFTER staging, BEFORE commit: delete the manifest
    fsio.delete_file(fsio.join(lake_dir, mf.MANIFEST_DIR,
                               f"epoch={m2.epoch:010d}.json"))
    m2b = apply.apply_epoch(lake_dir, files[3:])
    assert m2b.epoch == m2.epoch
    exp = oracle.final_state(p)
    snap = lake.snapshot(lake_dir)
    assert snap.num_rows == exp.num_rows


@pytest.mark.parametrize("prefix", PREFIXES)
def test_racing_commits_serialize(tmp_path, prefix):
    """Two committers race the SAME epoch number with different manifests:
    exactly one wins; the loser gets FileExistsError (and would rebase)."""
    lake_dir = prefix + str(tmp_path / "lake")
    fsio.makedirs(lake_dir)
    results = {}
    barrier = threading.Barrier(2)

    def _commit(tag):
        m = mf.Manifest(epoch=7, num_partitions=4, schema_version=1,
                        kind="delta", partitions={},
                        applied_epoch_ids=[tag], applied_inputs=[tag])
        barrier.wait()
        try:
            mf.commit(lake_dir, m)
            results[tag] = "won"
        except FileExistsError:
            results[tag] = "lost"

    ts = [threading.Thread(target=_commit, args=(f"w{i}",)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(results.values()) == ["lost", "won"]
    winner = [k for k, v in results.items() if v == "won"][0]
    assert mf.load(lake_dir, 7).applied_epoch_ids == [winner]


def test_put_if_absent_many_contenders(tmp_path):
    path = fsio.SCHEME_NORENAME + str(tmp_path / "one.json")
    wins = []
    barrier = threading.Barrier(8)

    def _try(i):
        barrier.wait()
        if fsio.put_if_absent(path, f"writer-{i}".encode()):
            wins.append(i)

    ts = [threading.Thread(target=_try, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len(wins) == 1
    assert fsio.read_bytes(path) == f"writer-{wins[0]}".encode()


@pytest.mark.parametrize("prefix", PREFIXES)
def test_registry_persistence_on_backend(tmp_path, prefix):
    import pyarrow as pa

    lake_dir = prefix + str(tmp_path / "lake")
    r1 = SchemaRegistryState(lake_dir)
    base = r1.schema()
    wider = pa.schema(list(base) + [pa.field("extra_col", pa.int64())])
    v = r1.find_or_register(wider)
    assert v == r1.latest_version()
    # a fresh process resumes with the same versions
    r2 = SchemaRegistryState(lake_dir)
    assert r2.latest_version() == v
    assert r2.schema(v).equals(wider)


@pytest.mark.parametrize("prefix", PREFIXES)
def test_partitioned_sink_on_backend(tmp_path, prefix):
    import pyarrow as pa
    import ray.data as rd

    from vlm_eden_dataset_etl_ray.sinks.partitioned import (
        read_partitioned, write_partitioned)

    out_dir = prefix + str(tmp_path / "out")
    t = pa.table({"k": [f"k{i}" for i in range(200)],
                  "v": pa.array(range(200), pa.int64())})
    stats = write_partitioned(rd.from_arrow(t), out_dir, "k", num_partitions=8)
    assert int(sum(stats.column("rows").to_pylist())) == 200
    back = read_partitioned(out_dir)
    assert back.count() == 200
    # resume: a second run moves nothing (all partitions sealed)
    stats2 = write_partitioned(rd.from_arrow(t), out_dir, "k", num_partitions=8)
    assert stats2.num_rows == 0
    assert read_partitioned(out_dir).count() == 200


@pytest.mark.parametrize("prefix", PREFIXES)
def test_clone_restore_clustered_compact_on_backend(tmp_path, prefix):
    """The round-3 metadata ops (clone, restore, clustered compaction)
    must hold on the rename-free backend too."""
    p, files = _mk(tmp_path)
    src = prefix + str(tmp_path / "src")
    apply.apply_epoch(src, files[:3])
    s1 = lake.snapshot(src)
    apply.apply_epoch(src, files[3:])
    s2 = lake.snapshot(src)

    # clustered compaction on the backend
    lake.compact(src, cluster_by=["n_tok"], cluster_file_bytes=4096)
    assert lake.snapshot(src).num_rows == s2.num_rows

    # zero-copy clone, then divergence isolation
    dst = prefix + str(tmp_path / "dst")
    lake.clone(src, dst)
    assert lake.snapshot(dst).num_rows == s2.num_rows

    # restore src to epoch 1; ledger rewinds; re-apply converges
    lake.restore(src, 1)
    got = lake.snapshot(src)
    assert got.num_rows == s1.num_rows
    apply.apply_epoch(src, files[3:])
    assert lake.snapshot(src).num_rows == s2.num_rows
    # the clone never moved
    assert lake.snapshot(dst).num_rows == s2.num_rows
