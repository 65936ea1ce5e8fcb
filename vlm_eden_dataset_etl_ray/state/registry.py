"""Schema-registry actor — the one stateful singleton in the engine.

Mirrors the reference's per-tenant migration discipline: migrations are
applied serially under a lock before data flows
(``/root/reference/cron_tasks.py:54-56``: ``backend.lock();
backend.apply_migrations(...)``). Here the lock is actor serialization: all
schema-version registrations go through one Ray actor, which validates that
each new version is an additive/widening evolution of the previous one
(add-column with null backfill, int widen) and persists the registry to the
lake directory so a new driver process resumes with the same versions.
"""

from __future__ import annotations

import base64
import json
import uuid

import pyarrow as pa

from vlm_eden_dataset_etl_ray import fsio
from vlm_eden_dataset_etl_ray import schema as sch

_REGISTRY_DIR = "_schema"
_LEGACY_FILE = "versions.json"


def _encode(s: pa.Schema) -> str:
    return base64.b64encode(s.serialize().to_pybytes()).decode()


def _decode(b: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(b)))


def validate_evolution(old: pa.Schema, new: pa.Schema) -> None:
    """Raise unless old→new is purely add-column / widen (the only
    evolutions the engine supports, per SURVEY.md §1.3)."""
    for f in old:
        nf_idx = new.get_field_index(f.name)
        if nf_idx < 0:
            raise ValueError(f"schema evolution dropped column {f.name!r}")
        nf = new.field(nf_idx)
        if not f.type.equals(nf.type) and not sch._is_safe_widen(f.type, nf.type):
            raise ValueError(
                f"schema evolution narrows column {f.name!r}: {f.type} -> {nf.type}"
            )


class SchemaRegistryState:
    """Plain (non-actor) registry core, usable directly in tests."""

    def __init__(self, lake_dir: str | None = None,
                 seed_versions: dict[int, pa.Schema] | None = None):
        self._lake_dir = lake_dir
        self._versions: dict[int, pa.Schema] = {}
        if lake_dir:
            self._load_persisted(lake_dir)
        if not self._versions:
            for v, s in (seed_versions or {1: sch.PAYLOAD_V1}).items():
                self._versions[v] = s
            self._persist()

    def _load_persisted(self, lake_dir: str) -> None:
        """Newest parseable versioned snapshot wins (rename-free persistence
        writes a fresh ``versions-<maxver>-<uuid>.json`` per migration — a
        crash mid-write corrupts at most the newest file, and the reader
        falls back to the previous snapshot). Legacy ``versions.json`` from
        the tmp+rename era is still read when no snapshot exists."""
        d = fsio.join(lake_dir, _REGISTRY_DIR)
        snaps = sorted((n for n in fsio.list_names(d)
                        if n.startswith("versions-") and n.endswith(".json")),
                       reverse=True)
        for name in snaps:
            try:
                payload = json.loads(fsio.read_bytes(fsio.join(d, name)).decode())
            except (json.JSONDecodeError, OSError):
                continue  # torn write of the newest snapshot — fall back
            for k, v in payload.items():
                self._versions[int(k)] = _decode(v)
            return
        legacy = fsio.join(d, _LEGACY_FILE)
        if fsio.exists(legacy):
            for k, v in json.loads(fsio.read_bytes(legacy).decode()).items():
                self._versions[int(k)] = _decode(v)

    def _persist(self) -> None:
        if not self._lake_dir:
            return
        d = fsio.join(self._lake_dir, _REGISTRY_DIR)
        fsio.makedirs(d)
        name = f"versions-{max(self._versions):06d}-{uuid.uuid4().hex[:8]}.json"
        data = json.dumps({str(k): _encode(s) for k, s in self._versions.items()})
        fsio.write_bytes(fsio.join(d, name), data.encode())

    def latest_version(self) -> int:
        return max(self._versions)

    def schema(self, version: int | None = None) -> pa.Schema:
        return self._versions[self.latest_version() if version is None else version]

    def register(self, version: int, schema: pa.Schema) -> int:
        """Register a new version (idempotent if identical). Serialized by
        the actor; validated as an additive evolution of the latest."""
        if version in self._versions:
            if not self._versions[version].equals(schema):
                raise ValueError(f"conflicting re-registration of version {version}")
            return version
        validate_evolution(self.schema(), schema)
        self._versions[version] = schema
        self._persist()
        return version

    def find_or_register(self, schema: pa.Schema) -> int:
        """Version number whose schema equals ``schema``, registering it as
        ``latest+1`` when novel (an online add-column/widen migration)."""
        for v in sorted(self._versions):
            if self._versions[v].equals(schema):
                return v
        v = self.latest_version() + 1
        return self.register(v, schema)

    def ensure_known(self, version: int) -> pa.Schema:
        """Fetch a version, falling back to the engine's built-in version
        table (the code-shipped migrations) for not-yet-registered ones."""
        if version not in self._versions:
            if version in sch.SCHEMA_VERSIONS:
                self.register(version, sch.SCHEMA_VERSIONS[version])
            else:
                raise KeyError(f"unknown schema version {version}")
        return self._versions[version]


def make_registry_actor(lake_dir: str | None = None):
    """Create the named singleton registry actor for a lake.

    The name must be a deterministic function of ``lake_dir`` (builtin
    ``hash`` is randomized per process via PYTHONHASHSEED — two drivers on
    the same cluster would get two independent "singletons" and the
    serialized-migration guarantee would be void), so use a sha256 digest."""
    import hashlib

    import ray

    digest = hashlib.sha256((lake_dir or "").encode()).hexdigest()[:16]
    Actor = ray.remote(num_cpus=0)(SchemaRegistryState)
    return Actor.options(name=f"schema-registry-{digest}",
                         get_if_exists=True).remote(lake_dir)
