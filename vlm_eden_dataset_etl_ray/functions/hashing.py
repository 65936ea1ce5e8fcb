"""Deterministic vectorized hashing for partition assignment and dedup.

The partition function replaces the reference's per-tenant fan-out
(``/root/reference/cron_tasks.py:84-86``): parallelism unit = hash partition
of the key, not tenant. The hash must be deterministic across processes and
sessions (manifests record partition ids; a resume in a new process must map
keys to the same partitions), so we use polars' seeded ahash (stable for a
fixed polars version / seed) with a pandas fallback.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

try:
    import polars as pl

    _HAVE_POLARS = True
except ImportError:  # pragma: no cover
    _HAVE_POLARS = False


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Vectorized uint64 hash of a string array.

    ``values`` may be a pyarrow Array/ChunkedArray, numpy object array, or
    list of str. Returns uint64 ndarray of the same length.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if _HAVE_POLARS:
        if isinstance(values, pa.Array):
            s = pl.from_arrow(values)
        else:
            s = pl.Series(values)
        return s.hash(seed=seed).to_numpy()
    import pandas as pd  # pragma: no cover - fallback path

    if isinstance(values, pa.Array):
        values = values.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(np.asarray(values, dtype=object))


def partition_ids(keys, num_partitions: int, seed: int = 0) -> np.ndarray:
    """pid = hash(key) % P as int32 (P is fixed per lake, manifest-recorded)."""
    return (hash_strings(keys, seed=seed) % np.uint64(num_partitions)).astype(np.int32)


def content_hash(table: pa.Table, columns: list[str], seed: int = 0) -> np.ndarray:
    """Row-wise combined uint64 hash over ``columns`` (for exact dedup)."""
    acc = np.zeros(table.num_rows, dtype=np.uint64)
    for i, c in enumerate(columns):
        col = table.column(c)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            h = hash_strings(col, seed=seed + i)
        else:
            if _HAVE_POLARS:
                h = pl.from_arrow(col.combine_chunks()).hash(seed=seed + i).to_numpy()
            else:  # pragma: no cover
                import pandas as pd

                h = pd.util.hash_array(col.to_numpy(zero_copy_only=False))
        acc = acc * np.uint64(1099511628211) + h.astype(np.uint64)
    return acc
