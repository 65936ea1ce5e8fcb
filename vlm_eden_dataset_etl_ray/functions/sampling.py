"""Deterministic sampling operators for training-data pipelines.

Sampling decisions are pure functions of the row KEY (not of partitioning,
batch boundaries, or execution order), so a sample is reproducible across
re-runs, reshards and cluster sizes — the property a data pipeline needs to
make "the same 1% sample" land in every downstream experiment. Same design
as ``text.deterministic_split`` (key-hash thresholding), generalized to
per-stratum rates."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.hashing import hash_strings


def _key_hashes(t: pa.Table, key_col: str, seed: int) -> np.ndarray:
    col = t.column(key_col)
    if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
        col = col.cast(pa.string())
    return hash_strings(col, seed=seed)


def _threshold(frac: float) -> int:
    """uint64 keep-threshold for a fraction (frac=1.0 keeps everything —
    clamped below 2^64 so it fits the dtype)."""
    return min(int(min(max(frac, 0.0), 1.0) * float(2**64)), 2**64 - 1)


def hash_sample(ds: rd.Dataset, key_col: str, frac: float, seed: int = 0) -> rd.Dataset:
    """Keep ~``frac`` of rows, chosen by key hash — deterministic,
    reshard-stable, no shuffle. ``frac >= 1`` keeps every row exactly."""
    if frac >= 1.0:
        return ds
    thr = np.uint64(_threshold(frac))

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(_key_hashes(t, key_col, seed) < thr))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds: rd.Dataset,
    strata_col: str,
    fracs: dict[str, float],
    key_col: str,
    default_frac: float = 0.0,
    seed: int = 0,
) -> rd.Dataset:
    """Per-stratum sampling rates (e.g. downsample dominant languages,
    keep 100% of rare ones — the classic corpus-balancing move). The
    stratum→rate table rides into each task as a tiny broadcast; the
    keep decision is one vectorized hash + threshold lookup per batch."""
    strata = pa.array(list(fracs.keys()))
    thr_np = np.array(
        [_threshold(f) for f in fracs.values()] + [_threshold(default_frac)],
        dtype=np.uint64,
    )

    full_np = np.array(
        [f >= 1.0 for f in fracs.values()] + [default_frac >= 1.0])

    def _f(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column(strata_col), value_set=strata)
        idx_np = pc.fill_null(idx, len(thr_np) - 1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = (_key_hashes(t, key_col, seed) < thr_np[idx_np]) | full_np[idx_np]
        return t.filter(pa.array(keep))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)
