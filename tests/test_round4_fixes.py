"""Round-4 regression tests for the ADVICE.md findings: vacuum vs
in-flight rehash scratch, leftover rehash-manifest reclamation, sparse-add
+ rename schema visibility, and the maintain_views rehash-race guard."""

import collections
import os
import time as _time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray import views
from vlm_eden_dataset_etl_ray.functions.hashing import partition_ids
from vlm_eden_dataset_etl_ray.spec import TableSpec
from vlm_eden_dataset_etl_ray.state.registry import make_registry_actor
from vlm_eden_dataset_etl_ray.views import ViewSpec, apply_epoch_with_views

SPEC = TableSpec(name="r4", key="doc_id", order="lsn", num_partitions=4,
                 envelope=())


def _rows(lo, hi, lsn_base=0):
    n = hi - lo
    ids = [f"d{i}" for i in range(lo, hi)]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "lsn": pa.array(np.arange(lsn_base, lsn_base + n, dtype=np.int64)),
        "op": pa.array(["upsert"] * n),
        "n_tok": pa.array(np.arange(lo, hi, dtype=np.int64) * 7),
    }))


def _age_tree(root, seconds=7200):
    past = _time.time() - seconds
    for dp, _, fs in os.walk(root):
        for f in fs:
            os.utime(os.path.join(dp, f), (past, past))


def test_vacuum_spares_in_flight_rehash_scratch(tmp_path):
    """A rehash whose shuffle outlives min_age_seconds must not lose its
    scratch files to a concurrent vacuum: the scratch lake's own epochs
    restart at 1 and its files are referenced by no manifest yet — the
    only safe signal is the in-flight root name (_rehash_N, N > committed)."""
    lk = str(tmp_path / "lake")
    apply.apply_epoch_dataset(lk, _rows(0, 40), epoch_id="e1", spec=SPEC)
    m = mf.latest(lk)
    # simulate a rehash mid-shuffle: scratch files staged, nothing committed
    scratch = os.path.join(lk, f"_rehash_{m.epoch + 1}", "staging", "epoch=1")
    os.makedirs(scratch)
    f = os.path.join(scratch, "part-0.parquet")
    pq.write_table(pa.table({"doc_id": ["x"]}), f)
    _age_tree(lk)
    res = lake.vacuum(lk, keep_epochs=1, min_age_seconds=0.0)
    assert os.path.exists(f), "in-flight rehash scratch was vacuumed"
    assert res["files_removed"] == 0


def test_vacuum_reclaims_orphaned_rehash_manifests(tmp_path):
    """Crash between the rehash commit and its scratch-manifest cleanup
    leaves _rehash_N/_manifests behind forever (re-runs early-return on a
    num_partitions match); vacuum must reclaim it for committed N."""
    lk = str(tmp_path / "lake")
    apply.apply_epoch_dataset(lk, _rows(0, 40), epoch_id="e1", spec=SPEC)
    m2 = lake.rehash(lk, 8, spec=SPEC)
    # recreate the crash leftover
    orphan = os.path.join(lk, f"_rehash_{m2.epoch}", "_manifests")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "epoch=0000000001.json"), "w") as fh:
        fh.write("{}")
    before = lake.snapshot(lk, spec=SPEC,
                           columns=["doc_id", "n_tok"]).sort_by("doc_id")
    lake.vacuum(lk, keep_epochs=2, min_age_seconds=3600.0)
    assert not os.path.exists(orphan)
    after = lake.snapshot(lk, spec=SPEC,
                          columns=["doc_id", "n_tok"]).sort_by("doc_id")
    assert after.equals(before)


def test_sparse_added_then_renamed_column_stays_visible(tmp_path):
    """A column added by a sparse epoch (present only in schema_b64 when
    footer sampling misses its partitions) and later RENAMED must still
    appear in the scan schema under the new name."""
    lk = str(tmp_path / "lake")
    v1 = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64())])
    v1e = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                     ("extra", pa.string())])
    v2 = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                    ("bonus", pa.string())])  # extra RENAMED to bonus
    reg = make_registry_actor(lk, seed_versions={1: v1})
    # epoch 1: keys covering every partition, no 'extra'
    f1 = str(tmp_path / "p1.parquet")
    ids = [f"d{i}" for i in range(40)]
    pq.write_table(pa.table({
        "lsn": pa.array(range(40), pa.int64()),
        "op": pa.array(["upsert"] * 40),
        "doc_id": pa.array(ids),
        "n_tok": pa.array(range(40), pa.int64()),
    }), f1)
    apply.apply_epoch(lk, [f1], spec=SPEC, registry=reg)
    m1 = mf.latest(lk)
    first_pid = min(p for p in sorted(m1.partitions) if m1.files(p))
    # a key whose partition is NOT the footer-sampled (first) one
    key = next(k for k in (f"z{i}" for i in range(1000))
               if int(partition_ids([k], SPEC.num_partitions)[0]) != first_pid)
    assert ray.get(reg.migrate.remote(v1e)) == 2
    f2 = str(tmp_path / "p2.parquet")
    pq.write_table(pa.table({
        "lsn": pa.array([100], pa.int64()),
        "op": pa.array(["upsert"]),
        "doc_id": pa.array([key]),
        "n_tok": pa.array([999], pa.int64()),
        "extra": pa.array(["hello"]),
    }), f2)
    apply.apply_epoch(lk, [f2], spec=SPEC, registry=reg)
    assert ray.get(reg.migrate.remote(v2, renames={"extra": "bonus"})) == 3
    ds = lake.scan(lk, spec=SPEC)
    assert "bonus" in ds.schema().names, \
        "sparse-added renamed column vanished from the scan schema"
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
    got = {r["doc_id"]: r["bonus"] for r in t.select(["doc_id", "bonus"])
           .to_pylist()}
    assert got[key] == "hello"
    assert got["d0"] is None


def test_maintain_views_rebuilds_across_rehash_layout_change(tmp_path):
    """If a rehash commits between the caller's m_before read and the
    apply, partition ids are not comparable across the boundary — the
    incremental branch must fall back to the pinned full rebuild."""
    p = cl.ChangelogParams(n_docs=120, n_events=1500, n_shards=6)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lk, vroot = str(tmp_path / "lake"), str(tmp_path / "views")
    vspecs = [ViewSpec(name="by_source", group_cols=["source"],
                       count_alias="n", sum_cols={"n_tok": "total_tok"})]
    apply_epoch_with_views(lk, files[0::2], vspecs, vroot)
    m_before = mf.latest(lk)
    lake.rehash(lk, 8)           # layout changes under the caller's feet
    apply.apply_epoch(lk, files[1::2])
    m_after = mf.latest(lk)
    assert m_before.num_partitions != m_after.num_partitions
    views.maintain_views(lk, vspecs, vroot, m_before=m_before,
                         m_after=m_after, changelog_files=files[1::2])
    got = pa.concat_tables(views.read_view(vroot, "by_source").iter_batches(
        batch_format="pyarrow", batch_size=None)).sort_by("source")
    # expected = full aggregation of the final lake snapshot
    snap = lake.snapshot(lk, columns=["doc_id", "source", "n_tok"])
    agg = collections.defaultdict(lambda: [0, 0])
    for row in snap.select(["source", "n_tok"]).to_pylist():
        agg[row["source"]][0] += 1
        agg[row["source"]][1] += row["n_tok"]
    rows = sorted(agg.items())
    exp = pa.table({
        "source": pa.array([s for s, _ in rows]),
        "n": pa.array([v[0] for _, v in rows], pa.int64()),
        "total_tok": pa.array([v[1] for _, v in rows], pa.int64()),
    })
    assert got.equals(exp), f"\n{got.to_pydict()}\nvs\n{exp.to_pydict()}"
