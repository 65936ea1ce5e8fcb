"""Replay-convergence tests: the engine's final lake state must equal the
serial oracle per-row (token-array equality keyed by doc_id) under
out-of-order delivery, duplicates, deletes, hot-key skew and mid-stream
schema changes — the pytest formalization of the reference's production
``SyncValidator`` convergence audit (/root/reference/sync/sync_validator.py:24-62).
"""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake, manifest as mf, oracle
from vlm_eden_dataset_etl_ray.spec import TableSpec
from vlm_eden_dataset_etl_ray.state.registry import make_registry_actor


def _assert_matches_oracle(lake_dir, p, spec=None):
    snap = lake.snapshot(lake_dir, **({"spec": spec} if spec else {}))
    exp = oracle.final_state(p)
    assert snap.num_rows == exp.num_rows
    cols = [c for c in ["doc_id", "lsn", "n_tok", "source", "tokens"] if c in exp.column_names]
    s = snap.select(cols).sort_by("doc_id")
    e = exp.select(cols).sort_by("doc_id")
    for c in cols:
        assert s.select([c]).equals(e.select([c])), f"column {c} diverges"
    if "quality" in exp.column_names:
        a = snap.sort_by("doc_id").column("quality").to_numpy(zero_copy_only=False).astype(float)
        b = e2 = exp.column("quality").to_numpy(zero_copy_only=False).astype(float)
        assert np.array_equal(np.isnan(a), np.isnan(b))
        assert np.allclose(np.nan_to_num(a), np.nan_to_num(b))


def _replay(tmp_path, p, spec=None, n_epochs=1):
    cdir = str(tmp_path / "chg")
    files = cl.write_changelog(cdir, p)
    lake_dir = str(tmp_path / "lake")
    reg = make_registry_actor(lake_dir)
    kw = {"registry": reg}
    if spec:
        kw["spec"] = spec
    if n_epochs == 1:
        apply.apply_epoch(lake_dir, files, **kw)
    else:
        chunks = np.array_split(np.array(files, dtype=object), n_epochs)
        for ch in chunks:
            if len(ch):
                apply.apply_epoch(lake_dir, [str(f) for f in ch], **kw)
    return lake_dir


@pytest.mark.parametrize("shuffle", ["file", "sort"])
def test_converges_single_epoch(tmp_path, shuffle):
    p = cl.ChangelogParams(n_docs=250, n_events=2500, n_shards=5)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, files, shuffle=shuffle)
    _assert_matches_oracle(lake_dir, p)


def test_converges_multi_epoch_and_schema_change(tmp_path):
    """Epochs split the shuffled delivery stream; a later epoch may carry
    smaller LSNs than an earlier one (out-of-order across epochs) and the
    schema flips v1→v2 mid-stream."""
    p = cl.ChangelogParams(n_docs=200, n_events=2000, schema_change_at=1200, n_shards=8)
    lake_dir = _replay(tmp_path, p, n_epochs=4)
    m = mf.latest(lake_dir)
    assert m.schema_version == 2
    _assert_matches_oracle(lake_dir, p)


def test_converges_heavy_skew_and_dups(tmp_path):
    """90th-percentile-hot keys (low zipf s → heavier head) + 10% duplicate
    delivery still converge, exercising the two-stage (batch-salted) reduce."""
    p = cl.ChangelogParams(
        n_docs=50, n_events=4000, zipf_s=1.05, dup_frac=0.10, delete_frac=0.1, n_shards=6
    )
    lake_dir = _replay(tmp_path, p, n_epochs=2)
    _assert_matches_oracle(lake_dir, p)


def test_compaction_preserves_state(tmp_path):
    p = cl.ChangelogParams(n_docs=150, n_events=1500, schema_change_at=900, n_shards=4)
    lake_dir = _replay(tmp_path, p, n_epochs=3)
    before = lake.snapshot(lake_dir)
    m = lake.compact(lake_dir)
    assert m.kind == "compaction"
    after = lake.snapshot(lake_dir)
    assert after.sort_by("doc_id").select(["doc_id", "lsn", "tokens"]).equals(
        before.sort_by("doc_id").select(["doc_id", "lsn", "tokens"])
    )
    _assert_matches_oracle(lake_dir, p)
    # deltas folded away
    assert all(not st.deltas and len(st.base) == 1 for st in m.partitions.values())


def test_delete_then_reinsert_resurrects(tmp_path):
    """Explicit micro-stream: insert → delete → insert again."""
    import pyarrow.parquet as pq

    spec = TableSpec(name="mini", key="doc_id", order="lsn", num_partitions=4)
    t = pa.table(
        {
            "lsn": [3, 1, 2],  # delivered out of order
            "op": ["insert", "insert", "delete"],
            "doc_id": ["d", "d", "d"],
            "v": [30, 10, None],
        }
    )
    f = str(tmp_path / "s.parquet")
    pq.write_table(t, f)
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, [f], spec=spec)
    snap = lake.snapshot(lake_dir, spec=spec)
    assert snap.num_rows == 1
    assert snap.to_pylist()[0]["v"] == 30  # resurrected with the latest payload


def test_final_delete_removes_row(tmp_path):
    import pyarrow.parquet as pq

    spec = TableSpec(name="mini", key="doc_id", order="lsn", num_partitions=4)
    t = pa.table(
        {
            "lsn": [1, 2],
            "op": ["insert", "delete"],
            "doc_id": ["gone", "gone"],
            "v": [10, None],
        }
    )
    f = str(tmp_path / "s.parquet")
    pq.write_table(t, f)
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, [f], spec=spec)
    snap = lake.snapshot(lake_dir, spec=spec)
    assert snap.num_rows == 0


def test_scan_with_predicate(tmp_path):
    import pyarrow.compute as pc

    p = cl.ChangelogParams(n_docs=100, n_events=1000, n_shards=3)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, files)
    exp = oracle.final_state(p)
    want = exp.filter(pc.equal(exp.column("source"), "web")).num_rows
    ds = lake.scan(lake_dir, columns=["doc_id", "source"],
                   predicate=lambda t: pc.equal(t.column("source"), "web"))
    got = sum(b.num_rows for b in ds.iter_batches(batch_format="pyarrow", batch_size=None))
    assert got == want


def test_striped_merge_hot_partition(tmp_path):
    """With a tiny stripe threshold every partition splits into multiple
    stripe deltas; merge-on-read LWW across stripes still converges."""
    p = cl.ChangelogParams(n_docs=80, n_events=2000, zipf_s=1.05, n_shards=6)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")
    # small batches → many slices per pid; stripe_bytes=1 → force striping
    m = apply.apply_epoch(lake_dir, files, stripe_bytes=1, batch_size=128)
    striped = [pid for pid, st in m.partitions.items() if len(st.deltas) > 1]
    assert striped, "expected at least one partition with multiple stripe deltas"
    _assert_matches_oracle(lake_dir, p)
    # compaction folds the stripes back to one base file per partition
    m2 = lake.compact(lake_dir)
    assert all(len(st.base) == 1 and not st.deltas for st in m2.partitions.values())
    _assert_matches_oracle(lake_dir, p)
