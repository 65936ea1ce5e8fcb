"""WebDataset-style tar-shard sink + source for training-loader handoff.

Large-scale training loaders (WebDataset and its descendants) consume
size-bounded ``.tar`` shards whose members are ``<key>.<ext>`` files —
sequential reads, no per-sample open cost, trivially resharded across
data-loader workers. This sink turns any Dataset with a key column and one
or more payload columns into such shards; the source reads them back as a
Dataset for round-trip validation and downstream reuse.

Scale shape: rows are packed into shards BY THE WRITING TASK — each
``map_batches`` call (bounded by ``rows_per_shard``) serializes one tar in
memory and publishes it under a content-derived name, so the stage is
embarrassingly parallel, nothing is materialized beyond one shard per
worker, and a re-run of the same deterministic upstream produces the same
shard set (names are content hashes — duplicate publishes are idempotent
overwrites of identical bytes). Only tiny per-shard metadata rows flow back.
All I/O goes through :mod:`fsio`, so shards land on any ``pyarrow.fs``
backend. Uses only the stdlib ``tarfile`` — no optional deps.
"""

from __future__ import annotations

import hashlib
import io
import tarfile

import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray import fsio

_EPOCH = 0  # fixed mtime: shard bytes are a pure function of content


def _member(tar: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(data)
    info.mtime = _EPOCH
    tar.addfile(info, io.BytesIO(data))


def write_tar_shards(
    ds: rd.Dataset,
    out_dir: str,
    key_col: str,
    payload_cols: dict[str, str],
    rows_per_shard: int = 1024,
) -> pa.Table:
    """Write ``ds`` as WebDataset-style tar shards and return the shard
    metadata table (path, n_members, bytes, min/max key).

    ``payload_cols`` maps column → member extension, e.g.
    ``{"text": "txt", "meta_json": "json"}``; string columns are UTF-8
    encoded, binary columns written verbatim. Member names are
    ``<key>.<ext>``; every payload of one row shares the key prefix (the
    WebDataset sample-grouping convention)."""
    fsio.makedirs(out_dir)
    cols = [key_col, *payload_cols]

    def _write(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).cast(pa.string()).to_pylist()
        payloads = {}
        for c in payload_cols:
            col = t.column(c)
            if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
                payloads[c] = [v if v is not None else b"" for v in col.to_pylist()]
            else:
                payloads[c] = [
                    (v if v is not None else "").encode("utf-8")
                    for v in col.cast(pa.string()).to_pylist()
                ]
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for i, k in enumerate(keys):
                for c, ext in payload_cols.items():
                    _member(tar, f"{k}.{ext}", payloads[c][i])
        data = buf.getvalue()
        digest = hashlib.sha256(data).hexdigest()[:16]
        path = fsio.join(out_dir, f"shard-{digest}.tar")
        fsio.write_bytes(path, data)
        return pa.table({
            "path": pa.array([path]),
            "n_members": pa.array([len(keys)], pa.int64()),
            "bytes": pa.array([len(data)], pa.int64()),
            "min_key": pa.array([min(keys)] if keys else [None], pa.string()),
            "max_key": pa.array([max(keys)] if keys else [None], pa.string()),
        })

    meta = ds.select_columns(cols).map_batches(
        _write, batch_format="pyarrow", batch_size=rows_per_shard,
    )
    batches = list(meta.iter_batches(batch_format="pyarrow", batch_size=None))
    return (pa.concat_tables(batches) if batches
            else pa.table({"path": pa.array([], pa.string()),
                           "n_members": pa.array([], pa.int64()),
                           "bytes": pa.array([], pa.int64()),
                           "min_key": pa.array([], pa.string()),
                           "max_key": pa.array([], pa.string())}))


def read_tar_shards(
    out_dir: str,
    payload_exts: dict[str, str],
    key_col: str = "key",
) -> rd.Dataset:
    """Read a tar-shard directory back into a Dataset — one row per sample
    key, one column per extension in ``payload_exts`` (ext → column name;
    values come back as strings). Shards are distributed one-per-task
    (``flat_map`` over the shard list), so the read parallelizes across the
    shard set exactly like the loaders it imitates."""
    shard_paths = sorted(
        fsio.join(out_dir, n) for n in fsio.list_names(out_dir)
        if n.endswith(".tar"))

    def _extract(row: dict) -> list[dict]:
        data = fsio.read_bytes(row["path"])
        samples: dict[str, dict] = {}
        with tarfile.open(fileobj=io.BytesIO(data)) as tar:
            for m in tar.getmembers():
                stem, _, ext = m.name.rpartition(".")
                if ext not in payload_exts:
                    continue
                body = tar.extractfile(m).read().decode("utf-8")
                samples.setdefault(stem, {key_col: stem})[payload_exts[ext]] = body
        return list(samples.values())

    return rd.from_items([{"path": p} for p in shard_paths]).flat_map(_extract)
