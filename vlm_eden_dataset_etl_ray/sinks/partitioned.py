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

Rename-free publish (object-store-safe, all I/O through :mod:`fsio`): each
attempt streams its data to a UNIQUE file name, then writes the tiny
``_SUCCESS`` seal naming that file. Concurrent zombie/retry attempts never
touch each other's data files; whichever seal lands last wins and names a
fully-written file. Readers open only the sealed file; orphans are inert.
"""

from __future__ import annotations

import json
import uuid

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray import fsio
from vlm_eden_dataset_etl_ray.functions.hashing import partition_ids

_PID = "__out_pid"


def _seal_path(out_dir: str, pid: int) -> str:
    return fsio.join(out_dir, f"pid={pid}", "_SUCCESS")


def _sealed_file(out_dir: str, pid: int) -> str | None:
    """Data-file path named by a partition's seal; None when unsealed.
    Legacy seals (bare row count) point at the old fixed name."""
    sp = _seal_path(out_dir, pid)
    if not fsio.exists(sp):
        return None
    raw = fsio.read_bytes(sp).decode()
    try:
        name = json.loads(raw)["file"]
    except (json.JSONDecodeError, TypeError, KeyError):
        name = "part.parquet"  # legacy seal format
    return fsio.join(out_dir, f"pid={pid}", name)


def _finished_pids(out_dir: str, num_partitions: int) -> np.ndarray:
    done = [pid for pid in range(num_partitions)
            if fsio.exists(_seal_path(out_dir, pid))]
    return np.asarray(done, dtype=np.int32)


def write_partitioned(
    ds: rd.Dataset,
    out_dir: str,
    by_col: str,
    num_partitions: int = 64,
    skip_existing: bool = True,
) -> pa.Table:
    """Write ``ds`` as ``out_dir/pid=K/part-<uuid>.parquet`` (K =
    hash(by_col) % P) with a `_SUCCESS` seal per finished partition.
    Returns a tiny stats table (pid, rows, bytes) of the partitions written
    THIS run.

    Resume contract: the source pipeline must be deterministic (same rows →
    same pids). ``skip_existing`` filters sealed partitions' rows out
    before the exchange, so a resume moves only the missing data."""
    fsio.makedirs(out_dir)
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
        name = f"part-{uuid.uuid4().hex}.parquet"
        path = fsio.join(out_dir, f"pid={pid}", name)
        nbytes = fsio.write_parquet(path, body)
        # seal AFTER the data stream closed; the seal names this attempt's
        # unique file, so racing attempts can't publish a partial write
        fsio.write_bytes(_seal_path(out_dir, pid),
                         json.dumps({"file": name, "rows": body.num_rows}).encode())
        return pa.table({
            "pid": pa.array([pid], pa.int32()),
            "rows": pa.array([body.num_rows], pa.int64()),
            "bytes": pa.array([nbytes], pa.int64()),
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
    only — each seal names its partition's canonical data file)."""
    paths = []
    for entry in fsio.list_names(out_dir):
        if not entry.startswith("pid="):
            continue
        f = _sealed_file(out_dir, int(entry[len("pid="):]))
        if f is not None:
            paths.append(f)
    if not paths:
        return rd.from_arrow(pa.table({}))
    if paths and "://" not in paths[0]:
        return rd.read_parquet(paths, columns=columns)
    # scheme-ful paths (e.g. the norename:// test scheme) resolve via fsio
    def _read(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("path").to_pylist():
            out.append(fsio.read_parquet(p, columns=columns))
        return pa.concat_tables(out) if out else pa.table({})

    items = rd.from_arrow(pa.table({"path": pa.array(paths)}))
    if len(paths) > 1:
        items = items.repartition(len(paths))
    return items.map_batches(_read, batch_format="pyarrow", batch_size=1)
