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


def validate_evolution(old: pa.Schema, new: pa.Schema,
                       allow_drop: bool = False) -> list[str]:
    """Validate old→new as add-column / widen, plus (when ``allow_drop``)
    drop-column — the three migration shapes the reference actually applies
    (add/widen ``migrations/20230510_01_V14Kk.sql``; drop+re-add
    ``migrations/20241029_01_JnkId.sql:4-16``). Returns the dropped column
    names. Drops are EXPLICIT migrations only (:meth:`.migrate`): the
    inference path (:meth:`.find_or_register`) keeps rejecting them, because
    a shard merely missing a column is indistinguishable from a late
    old-schema shard and must not silently drop data."""
    dropped: list[str] = []
    for f in old:
        nf_idx = new.get_field_index(f.name)
        if nf_idx < 0:
            if not allow_drop:
                raise ValueError(f"schema evolution dropped column {f.name!r} "
                                 "(drops require an explicit migrate() call)")
            dropped.append(f.name)
            continue
        nf = new.field(nf_idx)
        if not f.type.equals(nf.type) and not sch._is_safe_widen(f.type, nf.type):
            raise ValueError(
                f"schema evolution narrows column {f.name!r}: {f.type} -> {nf.type}"
            )
    return dropped


class SchemaRegistryState:
    """Plain (non-actor) registry core, usable directly in tests."""

    def __init__(self, lake_dir: str | None = None,
                 seed_versions: dict[int, pa.Schema] | None = None):
        self._lake_dir = lake_dir
        self._versions: dict[int, pa.Schema] = {}
        #: currently-dropped column → version at which it was dropped
        self._dropped: dict[str, int] = {}
        #: re-added column → version at which its CURRENT generation started
        #: (files written before that version must read the column as null —
        #: a re-add is a FRESH column, the pre-drop values are gone)
        self._activations: dict[str, int] = {}
        #: current column name → rename chain [(older_name, version), ...]
        #: ascending by version: at ``version`` the column stopped being
        #: called ``older_name``. Readers map a file's stored name to the
        #: current one by walking the chain against the file's version —
        #: rename PRESERVES data (unlike drop+re-add).
        self._renames: dict[str, list[tuple[str, int]]] = {}
        #: persistent table constraints (Delta CHECK-constraint shape):
        #: quality rule tuples every registry-backed epoch apply audits
        #: write-audit-publish style — registered once (like a locked
        #: migration), enforced by EVERY writer thereafter. Persisted in
        #: their own monotonic ``constraints-N-*.json`` snapshots (the
        #: versions-snapshot name orders by schema version only, so a
        #: constraints-only change cannot ride it).
        self._constraints: list[tuple] = []
        self._constraints_gen = 0
        if lake_dir:
            self._load_constraints(lake_dir)
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
            versions = payload.get("versions", payload)  # wrapped or legacy flat
            for k, v in versions.items():
                self._versions[int(k)] = _decode(v)
            self._dropped = {k: int(v) for k, v in payload.get("dropped", {}).items()}
            self._activations = {k: int(v)
                                 for k, v in payload.get("activations", {}).items()}
            self._renames = {k: [(str(o), int(v)) for o, v in chain]
                             for k, chain in payload.get("renames", {}).items()}
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
        data = json.dumps({
            "versions": {str(k): _encode(s) for k, s in self._versions.items()},
            "dropped": self._dropped,
            "activations": self._activations,
            "renames": {k: [[o, v] for o, v in chain]
                        for k, chain in self._renames.items()},
        })
        fsio.write_bytes(fsio.join(d, name), data.encode())

    def _load_constraints(self, lake_dir: str) -> None:
        d = fsio.join(lake_dir, _REGISTRY_DIR)
        snaps = sorted((n for n in fsio.list_names(d)
                        if n.startswith("constraints-") and n.endswith(".json")),
                       reverse=True)
        for name in snaps:
            try:
                payload = json.loads(fsio.read_bytes(fsio.join(d, name)).decode())
            except (json.JSONDecodeError, OSError):
                continue  # torn write of the newest snapshot — fall back
            self._constraints = [
                tuple(tuple(x) if isinstance(x, list) else x for x in r)
                for r in payload.get("rules", [])]
            self._constraints_gen = int(payload.get("gen", 0))
            return

    def set_constraints(self, rules: list[tuple]) -> int:
        """Replace the table's persistent constraints (empty list clears).
        Serialized through the registry actor like a migration; every
        subsequent registry-backed ``apply_epoch`` audits them
        write-audit-publish style. Returns the constraints generation."""
        from vlm_eden_dataset_etl_ray.functions.quality import rule_name

        for r in rules:
            rule_name(tuple(r))  # fail fast on malformed rules
        self._constraints = [
            tuple(tuple(x) if isinstance(x, list) else x for x in r)
            for r in rules]
        self._constraints_gen += 1
        if self._lake_dir:
            d = fsio.join(self._lake_dir, _REGISTRY_DIR)
            fsio.makedirs(d)
            name = (f"constraints-{self._constraints_gen:06d}-"
                    f"{uuid.uuid4().hex[:8]}.json")
            data = json.dumps({
                "gen": self._constraints_gen,
                "rules": [[list(x) if isinstance(x, tuple) else x
                           for x in r] for r in self._constraints]})
            fsio.write_bytes(fsio.join(d, name), data.encode())
        return self._constraints_gen

    def constraints(self) -> list[tuple]:
        return list(self._constraints)

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
        ``latest+1`` when novel (an online add-column/widen migration).
        The LARGEST equal version wins: after a drop+re-add cycle several
        versions can share one schema value, and the manifest's recorded
        version must never regress."""
        for v in sorted(self._versions, reverse=True):
            if self._versions[v].equals(schema):
                return v
        v = self.latest_version() + 1
        return self.register(v, schema)

    def migrate(self, schema: pa.Schema,
                renames: dict[str, str] | None = None) -> int:
        """EXPLICIT migration to ``schema`` as ``latest+1`` — the only path
        that may DROP columns (and re-add previously dropped ones), mirroring
        the reference's run-migrations-then-sync discipline
        (cron_tasks.py:54-59; drop+re-add migrations/20241029_01_JnkId.sql).
        A dropped column is tombstoned: readers stop projecting it. A re-add
        starts a FRESH null-filled column — its activation version is
        recorded so merge-on-read masks pre-drop file values instead of
        resurrecting them. Idempotent when ``schema`` equals the latest.

        ``renames={"old": "new"}`` declares data-PRESERVING renames (the
        alternative reading of the reference's drop+add migration): the old
        name must exist in the latest schema, the new one in ``schema``
        with the same or a widened type; readers map old-named columns in
        pre-migration files to the new name, so history survives."""
        old = self.schema()
        renames = dict(renames or {})
        if old.equals(schema):
            # idempotent retry: an unchanged schema means any requested
            # rename either was already applied by the successful first
            # call or is a no-op — never an error on the resume path
            return self.latest_version()
        v = self.latest_version() + 1
        for o, n in renames.items():
            oi, ni = old.get_field_index(o), schema.get_field_index(n)
            if oi < 0 or o == n:
                raise ValueError(f"rename source {o!r} not in latest schema")
            if ni < 0:
                raise ValueError(f"rename target {n!r} not in new schema")
            if old.get_field_index(n) >= 0:
                # the target name is LIVE in the old schema: a "rename"
                # would silently relabel the source's historical values as
                # the existing column's — that is a drop+rename pair the
                # caller must express explicitly in two migrations
                raise ValueError(
                    f"rename target {n!r} already exists in the latest "
                    "schema; drop it first (separate migrate) before "
                    "renaming onto the name")
            if n in self._dropped:
                # renaming ONTO a tombstoned name would fuse two opposite
                # contracts on one column: the re-add mask must hide the
                # name's old generation while the rename must preserve the
                # source's history — per-file masking cannot tell the two
                # apart once both are stored under the same name
                raise ValueError(
                    f"rename target {n!r} is a tombstoned (dropped) "
                    "column; pick a fresh name (re-adding the name and "
                    "renaming onto it cannot both hold)")
            ot, nt = old.field(oi).type, schema.field(ni).type
            if not ot.equals(nt) and not sch._is_safe_widen(ot, nt):
                raise ValueError(
                    f"rename {o!r}->{n!r} narrows type: {ot} -> {nt}")
        # validate with renamed columns treated as surviving, not dropped
        old_for_check = pa.schema(
            [pa.field(renames.get(f.name, f.name), f.type) for f in old])
        drops = validate_evolution(old_for_check, schema, allow_drop=True)
        for o, n in renames.items():
            chain = self._renames.pop(o, [])
            chain.append((o, v))
            self._renames[n] = chain
            # a re-added column's activation follows its new name — the
            # mask is keyed by CURRENT name at read time (a rename after a
            # re-add otherwise resurrects the pre-drop generation)
            if o in self._activations:
                self._activations[n] = self._activations.pop(o)
        for name in drops:
            self._dropped[name] = v
        for f in schema:
            if f.name in self._dropped and f.name not in old.names:
                # re-add of a tombstoned column: new generation starts at v
                del self._dropped[f.name]
                self._activations[f.name] = v
        self._versions[v] = schema
        self._persist()
        return v

    def current_drops(self) -> dict[str, int]:
        """Currently-dropped column → version dropped (re-added ones left)."""
        return dict(self._dropped)

    def column_activations(self) -> dict[str, int]:
        """Re-added column → version its current generation started at."""
        return dict(self._activations)

    def column_renames(self) -> dict[str, list[tuple[str, int]]]:
        """Current column → rename chain [(older_name, version), ...]
        ascending; see :func:`historical_name` for reader-side resolution."""
        return {k: list(v) for k, v in self._renames.items()}

    @staticmethod
    def load_readonly(lake_dir: str) -> "SchemaRegistryState | None":
        """Persisted registry state for a lake, or None when the lake has
        none — WITHOUT the constructor's seed-and-persist side effect (a
        plain scan of a registry-less lake must not create ``_schema/``)."""
        from vlm_eden_dataset_etl_ray import fsio as _fsio

        if not _fsio.list_names(_fsio.join(lake_dir, _REGISTRY_DIR)):
            return None
        return SchemaRegistryState(lake_dir)

    def ensure_known(self, version: int) -> pa.Schema:
        """Fetch a version, falling back to the engine's built-in version
        table (the code-shipped migrations) for not-yet-registered ones."""
        if version not in self._versions:
            if version in sch.SCHEMA_VERSIONS:
                self.register(version, sch.SCHEMA_VERSIONS[version])
            else:
                raise KeyError(f"unknown schema version {version}")
        return self._versions[version]


def make_registry_actor(lake_dir: str | None = None,
                        seed_versions: dict[int, pa.Schema] | None = None):
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
                         get_if_exists=True).remote(lake_dir, seed_versions)


def schema_history(lake_dir: str) -> pa.Table:
    """Audit table of the lake's schema evolution: one row per registered
    version with its column list and the delta (added / dropped names) vs
    the previous version — the surface an operator checks before and after
    a migration. Reads the persisted snapshots directly (no actor needed:
    history is immutable once written)."""
    state = SchemaRegistryState(lake_dir)
    versions = sorted(state._versions)
    rows = {"version": [], "n_fields": [], "columns": [], "added": [],
            "dropped": []}
    prev: pa.Schema | None = None
    for v in versions:
        s = state._versions[v]
        names = list(s.names)
        pnames = list(prev.names) if prev is not None else []
        rows["version"].append(v)
        rows["n_fields"].append(len(names))
        rows["columns"].append(",".join(names))
        rows["added"].append(",".join(n for n in names if n not in pnames))
        rows["dropped"].append(",".join(n for n in pnames if n not in names))
        prev = s
    return pa.table({
        "version": pa.array(rows["version"], pa.int64()),
        "n_fields": pa.array(rows["n_fields"], pa.int64()),
        "columns": pa.array(rows["columns"], pa.string()),
        "added": pa.array(rows["added"], pa.string()),
        "dropped": pa.array(rows["dropped"], pa.string()),
    })


def historical_name(current: str,
                    chain: list[tuple[str, int]],
                    file_version: int) -> str:
    """Name a currently-``current`` column had in a file written at
    ``file_version``: walk the rename chain newest-first while the rename
    happened AFTER the file was written."""
    name = current
    for older, v in reversed(chain):
        if file_version < v:
            name = older
        else:
            break
    return name
