"""Join bucket counts must track DATA VOLUME (bytes hints), falling back to
cluster shape only when no estimate exists — a 100 TB join must not run in
2×CPU buckets."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake
from vlm_eden_dataset_etl_ray.functions import relational as rel


def test_auto_buckets_tracks_bytes_not_cpus():
    gib = 1 << 30
    assert rel._auto_buckets(10 * gib, 256 * 1024 * 1024) == 40
    assert rel._auto_buckets(100 * gib, 256 * 1024 * 1024) == 400
    # floor for tiny inputs (skew insurance)
    assert rel._auto_buckets(1, 256 * 1024 * 1024) == 16
    # no hint: cluster-shaped fallback only
    nb = rel._auto_buckets(None, 256 * 1024 * 1024)
    assert nb >= 16


def test_skew_join_passes_materialized_bytes(monkeypatch):
    """skew_hash_join materializes both sides, so its inner hash_join calls
    must receive the measured byte total as bytes_hint."""
    seen = []
    real = rel.hash_join

    def spy(*args, **kwargs):
        seen.append(kwargs.get("bytes_hint"))
        return real(*args, **kwargs)

    monkeypatch.setattr(rel, "hash_join", spy)
    n = 4000
    left = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(n) % 40), "v": pa.array(np.arange(n))}))
    right = rd.from_arrow(pa.table({
        "k2": pa.array(np.arange(40)), "w": pa.array(np.arange(40) * 10)}))
    out = rel.skew_hash_join(left, right, "k", "k2", how="inner")
    total = sum(b.num_rows for b in out.iter_batches(batch_format="pyarrow"))
    assert total == n
    assert seen and all(h is not None and h > 0 for h in seen)


def test_lake_total_bytes(tmp_path):
    p = cl.ChangelogParams(n_docs=50, n_events=400, n_shards=4)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, files)
    tb = lake.total_bytes(lake_dir)
    assert tb > 0
    assert lake.total_bytes(str(tmp_path / "missing")) == 0
