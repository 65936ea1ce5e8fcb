"""Filesystem seam for the lake: pluggable ``pyarrow.fs`` backends with a
RENAME-FREE write/commit protocol.

Every byte the lake persists — manifests, delta/base parquet, shuffle
slices, registry state, sink seals — goes through this module, so the lake
runs unchanged on any filesystem ``pyarrow.fs`` can reach (local POSIX,
S3/GCS/Azure via ``s3://...`` URIs, HDFS). The protocol never renames:

- **Data files** are written with a single direct output stream to their
  final name. Atomicity is not needed: readers only open files listed in a
  COMMITTED manifest, and a manifest commits only after every referenced
  write has completed — a crashed task's partial file is simply overwritten
  by its retry (stable names) or never referenced (unique names). On object
  stores a PUT is atomic per object anyway.
- **Manifests** (the single commit point) are published with
  :func:`put_if_absent` — atomic create-if-absent of the FINAL name. On a
  local filesystem that is ``O_CREAT|O_EXCL``; on object stores the same
  primitive is the store's conditional PUT (S3 ``If-None-Match: *`` —
  generally available since 2024 —, GCS ``ifGenerationMatch=0``, Azure
  ``If-None-Match: *``). ``pyarrow.fs`` does not surface conditional puts,
  so non-local backends here fall back to a documented check-then-write
  emulation; wiring a store's native conditional PUT in requires replacing
  ONLY this one function. Two racing committers of the same epoch get
  exactly one ``True`` — the loser raises ``FileExistsError`` upstream and
  rebases onto the winner (``apply._stage_and_commit``).

Paths keep their scheme everywhere (manifests record fully-qualified
paths), so any worker can resolve them with no shared driver state. The
``norename://`` scheme maps to the local filesystem but exercises the full
URI plumbing — tests parameterize the lake over it to prove no code path
falls back to raw ``os`` calls or rename semantics.
"""

from __future__ import annotations

import json
import os
import posixpath
from functools import lru_cache
from typing import Iterator

import pyarrow as pa
import pyarrow.fs as pafs
import pyarrow.parquet as pq

#: Test/CI scheme: local filesystem reached through the generic URI path.
SCHEME_NORENAME = "norename://"


def join(base: str, *parts: str) -> str:
    """Scheme-preserving path join (posix separators; object-store keys and
    local linux paths share them)."""
    return posixpath.join(base, *parts)


def basename(path: str) -> str:
    return posixpath.basename(path)


def parent(path: str) -> str:
    return posixpath.dirname(path)


@lru_cache(maxsize=32)
def _fs_for_uri(uri_prefix: str) -> pafs.FileSystem:
    fs, _ = pafs.FileSystem.from_uri(uri_prefix)
    return fs


def resolve(path: str) -> tuple[pafs.FileSystem, str]:
    """(filesystem, in-filesystem path) for a possibly scheme-prefixed path.
    Plain paths → local filesystem unchanged; ``norename://`` → local
    filesystem with the scheme stripped; other URIs → whatever
    ``pyarrow.fs.FileSystem.from_uri`` resolves (S3, GCS, HDFS...)."""
    if path.startswith(SCHEME_NORENAME):
        return pafs.LocalFileSystem(), path[len(SCHEME_NORENAME):]
    if "://" in path:
        fs, p = pafs.FileSystem.from_uri(path)
        return fs, p
    return pafs.LocalFileSystem(), path


def canon(path: str) -> str:
    """Canonical form for path-identity comparisons (vacuum's live set):
    absolute for plain local paths, unchanged for scheme-ful ones."""
    if "://" in path:
        return path
    return os.path.abspath(path)


def is_local(path: str) -> bool:
    fs, _ = resolve(path)
    return isinstance(fs, pafs.LocalFileSystem)


def makedirs(path: str) -> None:
    fs, p = resolve(path)
    fs.create_dir(p, recursive=True)


def _ensure_parent(fs: pafs.FileSystem, p: str) -> None:
    # object stores have no directories; local streams need the parent
    if isinstance(fs, pafs.LocalFileSystem):
        d = posixpath.dirname(p)
        if d:
            os.makedirs(d, exist_ok=True)


def exists(path: str) -> bool:
    fs, p = resolve(path)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def is_dir(path: str) -> bool:
    fs, p = resolve(path)
    return fs.get_file_info(p).type == pafs.FileType.Directory


def list_names(path: str) -> list[str]:
    """Base names of direct children; [] when the directory doesn't exist."""
    fs, p = resolve(path)
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=False,
                                                   allow_not_found=True))
    except FileNotFoundError:
        return []
    return sorted(posixpath.basename(i.path) for i in infos)


def walk_files(path: str) -> Iterator[tuple[str, int, float]]:
    """Yield (scheme-ful path, size, mtime_epoch_s) for every file under
    ``path`` recursively; nothing when the tree doesn't exist."""
    scheme = path[: len(SCHEME_NORENAME)] if path.startswith(SCHEME_NORENAME) else ""
    fs, p = resolve(path)
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=True,
                                                   allow_not_found=True))
    except FileNotFoundError:
        return
    for i in infos:
        if i.type == pafs.FileType.File:
            mtime = i.mtime.timestamp() if i.mtime is not None else 0.0
            yield scheme + i.path, int(i.size or 0), mtime


def read_bytes(path: str) -> bytes:
    fs, p = resolve(path)
    with fs.open_input_stream(p) as fh:
        return fh.read()


def write_bytes(path: str, data: bytes) -> None:
    """Direct (rename-free) write to the final name — see module docstring
    for why this is safe for manifest-gated data files."""
    fs, p = resolve(path)
    _ensure_parent(fs, p)
    with fs.open_output_stream(p) as fh:
        fh.write(data)


def put_if_absent(path: str, data: bytes) -> bool:
    """Atomically create ``path`` with ``data`` iff it does not exist; False
    when it already does. THE commit primitive (manifest publish): local =
    ``O_CREAT|O_EXCL`` + fsync; object stores should map this to their
    native conditional PUT (see module docstring) — the generic fallback is
    check-then-write, which narrows but does not close the race (losers are
    still healed by lineage: an unrecorded input set stays pending and is
    re-applied idempotently)."""
    fs, p = resolve(path)
    if isinstance(fs, pafs.LocalFileSystem):
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        return True
    if fs.get_file_info(p).type != pafs.FileType.NotFound:
        return False
    with fs.open_output_stream(p) as fh:
        fh.write(data)
    return True


def delete_file(path: str) -> None:
    fs, p = resolve(path)
    fs.delete_file(p)


def delete_dir(path: str) -> None:
    fs, p = resolve(path)
    try:
        fs.delete_dir(p)
    except (FileNotFoundError, OSError):
        pass


def delete_dir_if_empty(path: str) -> None:
    fs, p = resolve(path)
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
        if not infos:
            fs.delete_dir(p)
    except (FileNotFoundError, OSError):
        pass


def file_size(path: str) -> int:
    fs, p = resolve(path)
    info = fs.get_file_info(p)
    return int(info.size or 0)


def read_json(path: str) -> dict:
    return json.loads(read_bytes(path).decode())


def write_parquet(path: str, table: pa.Table, compression: str | None = None) -> int:
    """Direct single-stream parquet write to the final name; returns the
    written byte size (saving the extra stat round trip remote stores
    charge for)."""
    fs, p = resolve(path)
    _ensure_parent(fs, p)
    kw = {"compression": compression} if compression else {}
    with fs.open_output_stream(p) as fh:
        pq.write_table(table, fh, **kw)
        fh.flush()
        return int(fh.tell())


def read_parquet(path: str, columns: list[str] | None = None) -> pa.Table:
    fs, p = resolve(path)
    return pq.read_table(p, filesystem=fs, columns=columns)


def read_parquet_schema(path: str) -> pa.Schema:
    fs, p = resolve(path)
    return pq.read_schema(p, filesystem=fs)
