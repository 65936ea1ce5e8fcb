"""Resumable partitioned parquet output for arbitrary query results.

The lake's delta/manifest machinery already gives the CDC path resumable,
partitioned output; this sink gives the SAME property to any Dataset a
pipeline produces: rows hash-partition by a key column into `pid=K/`
directories, each finished partition is sealed with a `_SUCCESS` marker,
and a re-run of the same deterministic pipeline skips sealed partitions —
both the WRITE (partition dirs that are done produce no work) and, with
key-hash determinism, the rows that would land in them are filtered out
before any shuffle. A 100-TB job that dies at partition 731/1024 redoes
only the missing 293.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.hashing import partition_ids

_PID = "__out_pid"


def _finished_pids(out_dir: str, num_partitions: int) -> np.ndarray:
    done = []
    for pid in range(num_partitions):
        if os.path.exists(os.path.join(out_dir, f"pid={pid}", "_SUCCESS")):
            done.append(pid)
    return np.asarray(done, dtype=np.int32)


def write_partitioned(
    ds: rd.Dataset,
    out_dir: str,
    by_col: str,
    num_partitions: int = 64,
    skip_existing: bool = True,
) -> pa.Table:
    """Write ``ds`` as ``out_dir/pid=K/part.parquet`` (K = hash(by_col) % P)
    with a `_SUCCESS` marker per finished partition. Returns a tiny stats
    table (pid, rows, bytes) of the partitions written THIS run.

    Resume contract: the source pipeline must be deterministic (same rows →
    same pids). ``skip_existing`` filters sealed partitions' rows out
    before the exchange, so a resume moves only the missing data."""
    os.makedirs(out_dir, exist_ok=True)
    done = _finished_pids(out_dir, num_partitions) if skip_existing else np.empty(0, np.int32)

    def _tag(t: pa.Table) -> pa.Table:
        col = t.column(by_col)
        if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            col = col.cast(pa.string())
        pids = partition_ids(col, num_partitions)
        t = t.append_column(_PID, pa.array(pids))
        if len(done):
            keep = ~np.isin(pids, done)
            t = t.filter(pa.array(keep))
        return t

    tagged = ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)

    def _write(g: pa.Table) -> pa.Table:
        pid = int(g.column(_PID)[0].as_py())
        body = g.drop_columns([_PID])
        pdir = os.path.join(out_dir, f"pid={pid}")
        os.makedirs(pdir, exist_ok=True)
        path = os.path.join(pdir, "part.parquet")
        # uuid tmp: a zombie attempt and its retry must not interleave on
        # one tmp file (same contract as apply.py's staging writes); the
        # atomic os.replace publishes whichever attempt finishes
        import uuid
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        pq.write_table(body, tmp)
        os.replace(tmp, path)
        with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
            f.write(str(body.num_rows))
        return pa.table({
            "pid": pa.array([pid], pa.int32()),
            "rows": pa.array([body.num_rows], pa.int64()),
            "bytes": pa.array([os.path.getsize(path)], pa.int64()),
        })

    stats = tagged.groupby(_PID).map_groups(_write, batch_format="pyarrow")
    batches = list(stats.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return pa.table({"pid": pa.array([], pa.int32()),
                         "rows": pa.array([], pa.int64()),
                         "bytes": pa.array([], pa.int64())})
    return pa.concat_tables(batches).sort_by("pid")


def read_partitioned(out_dir: str, columns=None) -> rd.Dataset:
    """Read back a :func:`write_partitioned` directory (sealed partitions
    only)."""
    paths = []
    for entry in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, entry)
        if entry.startswith("pid=") and os.path.exists(os.path.join(pdir, "_SUCCESS")):
            paths.append(os.path.join(pdir, "part.parquet"))
    if not paths:
        return rd.from_arrow(pa.table({}))
    return rd.read_parquet(paths, columns=columns)
