"""Shallow lake clone: zero-copy branch, divergence, vacuum isolation."""

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply, lake, manifest as mf
from vlm_eden_dataset_etl_ray.spec import TableSpec

SPEC = TableSpec(name="cl", key="doc_id", order="lsn", num_partitions=4,
                 envelope=())


def _t(lo, hi):
    lsn = np.arange(lo, hi, dtype=np.int64)
    return pa.table({
        "lsn": pa.array(lsn),
        "op": pa.array(["upsert"] * len(lsn)),
        "doc_id": pa.array(np.char.add("d", (lsn % 30).astype("U4"))),
        "n_tok": pa.array(lsn),
    })


def test_clone_is_zero_copy_and_equal(tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    apply.apply_epoch_dataset(src, rd.from_arrow(_t(0, 100)),
                              epoch_id="s1", spec=SPEC)
    lake.clone(src, dst)
    assert lake.snapshot(dst, spec=SPEC).equals(lake.snapshot(src, spec=SPEC))
    # zero-copy: no parquet under the branch
    n_parquet = sum(f.endswith(".parquet")
                    for _, _, fs in os.walk(dst) for f in fs)
    assert n_parquet == 0
    with pytest.raises(FileExistsError):
        lake.clone(src, dst)


def test_branch_diverges_without_touching_source(tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    apply.apply_epoch_dataset(src, rd.from_arrow(_t(0, 100)),
                              epoch_id="s1", spec=SPEC)
    before = lake.snapshot(src, spec=SPEC)
    lake.clone(src, dst)
    apply.apply_epoch_dataset(dst, rd.from_arrow(_t(100, 160)),
                              epoch_id="b1", spec=SPEC)
    assert lake.snapshot(src, spec=SPEC).equals(before)
    b = lake.snapshot(dst, spec=SPEC)
    # branch sees the update stream: keys updated by lsn 100-159
    by = dict(zip(b.column("doc_id").to_pylist(),
                  b.column("lsn").to_pylist()))
    assert by["d0"] == 150 and by["d29"] == 149


def test_branch_vacuum_never_deletes_source_files(tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    apply.apply_epoch_dataset(src, rd.from_arrow(_t(0, 100)),
                              epoch_id="s1", spec=SPEC)
    lake.clone(src, dst)
    for i in range(3):
        apply.apply_epoch_dataset(dst, rd.from_arrow(_t(100 + i, 101 + i)),
                                  epoch_id=f"b{i}", spec=SPEC)
    lake.compact(dst, spec=SPEC)  # re-homes live data into the branch
    stats = lake.vacuum(dst, keep_epochs=1, min_age_seconds=0.0)
    assert stats["manifests_removed"] >= 1
    # every source file is still present and the source still reads
    m = mf.latest(src)
    for pid in m.partitions:
        for f in m.files(pid):
            assert os.path.exists(f), f
    assert lake.snapshot(src, spec=SPEC).num_rows == 30


def test_clone_carries_rename_evolution_state(tmp_path):
    """The registry snapshot (_schema) copies with the clone: pre-rename
    files in the BRANCH must still read their values under the new name."""

    from vlm_eden_dataset_etl_ray.state.registry import make_registry_actor

    spec = TableSpec(name="clr", key="doc_id", order="lsn",
                     num_partitions=2)
    v1 = pa.table({
        "lsn": pa.array([1, 2], pa.int64()),
        "op": pa.array(["upsert", "upsert"]),
        "doc_id": pa.array(["a", "b"]),
        "n_tok": pa.array([10, 20], pa.int64()),
        "source": pa.array(["s1", "s2"]),
    })
    src = str(tmp_path / "src")
    v1_schema = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                           ("source", pa.string())])
    v2_schema = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                           ("origin", pa.string())])
    reg = make_registry_actor(src, seed_versions={1: v1_schema})
    apply.apply_epoch_dataset(src, rd.from_arrow(v1), epoch_id="e1",
                              spec=spec, registry=reg)
    import ray
    ray.get(reg.migrate.remote(v2_schema, renames={"source": "origin"}))

    dst = str(tmp_path / "dst")
    lake.clone(src, dst)
    t = lake.snapshot(dst, spec=spec, columns=["doc_id", "origin"])
    assert dict(zip(t.column("doc_id").to_pylist(),
                    t.column("origin").to_pylist())) == {"a": "s1", "b": "s2"}
