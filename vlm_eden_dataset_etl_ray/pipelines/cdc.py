"""End-to-end CDC pipelines over the driver's testdata tables.

``replay_events`` is the testdata-shaped twin of the flagship tokenized
changelog replay: the ``events`` table is deterministically mapped to a
changelog (lsn=event_id, delete on 'error' events — the reference's
``deleted`` tombstone flag), applied through the real engine
(apply_epoch → manifest → merge-on-read scan), and the converged state is
returned. Its DuckDB oracle is the LWW window query in
``__ray_entry__.oracle_sql`` (reference semantics:
DISTINCT ON + ON CONFLICT DO UPDATE, /root/reference/queries/fact_studies.py).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply as apply_mod
from vlm_eden_dataset_etl_ray import lake as lake_mod
from vlm_eden_dataset_etl_ray.sources.parquet import read_table
from vlm_eden_dataset_etl_ray.spec import TableSpec


def scratch_dir(prefix: str) -> str:
    """Scratch space for derived/intermediate parquet: tmpfs when present
    (the sandbox's virtio disk writes at ~139 MB/s; intermediates are
    transient and re-derivable), else /tmp. Override with $VLM_EDEN_SCRATCH."""
    root = os.environ.get("VLM_EDEN_SCRATCH") or (
        "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    )
    return tempfile.mkdtemp(prefix=prefix, dir=root)

EVENTS_REPLAY_SPEC = TableSpec(
    name="events_replay", key="doc_id", order="lsn", num_partitions=16, envelope=()
)

#: K6 append-only sink spec (the reference's dim_technicians: bare INSERT,
#: duplicate rows per key retained across syncs — queries/dim_technicians.py:14-29)
EVENTS_APPEND_SPEC = TableSpec(
    name="events_append", key="doc_id", order="lsn", mode="append",
    num_partitions=16, envelope=(),
)


def _derive_batch(t: pa.Table, with_tokens: bool) -> pa.Table:
    ev = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    # dtype=str keeps the array string-typed even when the batch is EMPTY
    # (np.asarray of an empty pylist defaults to float64, which would leak
    # a double-typed op/source column into schema inference)
    et = np.asarray(t.column("event_type").to_pylist(), dtype=str)
    val = t.column("value").to_numpy(zero_copy_only=False)
    cols: dict[str, pa.Array] = {
        "lsn": pa.array(ev),
        "op": pa.array(np.where(et == "error", "delete", "upsert")),
        # U20 fits any int64 (19 digits + sign): matches the oracle's
        # unbounded cast(user_id as varchar) with no silent truncation
        "doc_id": pa.array(np.char.add("doc", uid.astype("U20"))),
        "n_tok": pa.array(np.floor(val * 100).astype(np.int64)),
        "source": t.column("event_type"),
    }
    if with_tokens:
        # deterministic token payload from the lsn (list<int32> plumbing)
        lengths = (ev % 32 + 1).astype(np.int64)
        offsets = np.zeros(len(ev) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        j = np.arange(offsets[-1], dtype=np.int64) - np.repeat(offsets[:-1], lengths)
        flat = (np.repeat(ev * 2654435761 % 50257, lengths) + j * 40503) % 50257
        cols["tokens"] = pa.ListArray.from_arrays(
            pa.array(offsets).cast(pa.int32()), pa.array(flat.astype(np.int32))
        )
    return pa.table(cols)


def derive_changelog(sf_dir: str, out_dir: str, with_tokens: bool = False) -> list[str]:
    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"]
    )
    ds = ds.map_batches(
        _derive_batch,
        fn_kwargs={"with_tokens": with_tokens},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir)
    return sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
    )


def run_incremental(
    lake_dir: str,
    changelog_dir: str,
    *,
    spec=None,
    registry=None,
    batch_size: int = 65536,
    max_epoch_bytes: int | None = None,
    audit: list[tuple] | None = None,
):
    """Tail the changelog directory: apply every shard file not yet recorded
    in a committed manifest.

    ``audit`` gates every tick's epoch(s) write-audit-publish style (see
    :func:`..apply.apply_epoch`): a violating epoch raises
    ``quality.AuditError`` with nothing published and nothing recorded, so
    the tail stays parked on the bad shard until the feed (or the rules)
    are fixed — with ``max_epoch_bytes`` chunking, chunks before the bad
    one stay committed and the re-run resumes at the refused chunk.

    This is the reference's 10-minute polling loop
    (/root/reference/celery_config.py:24 + sync/sync_base.py:47-59) with the
    fuzzy timestamp watermark replaced by exact file-set lineage: a shard is
    either in a committed manifest's ``applied_epoch_ids`` input set or it
    is pending. Returns the latest manifest (unchanged when nothing is
    pending).

    ``max_epoch_bytes`` bounds the BACKLOG an epoch swallows: after an
    outage the pending set can be arbitrarily large, and one epoch over a
    week of shards means one shuffle sized to the whole backlog (cluster
    disk, retry blast radius, time-travel granularity all suffer). With a
    cap, pending files chunk greedily by on-disk size (file order
    preserved; a single oversized shard still forms its own epoch) and
    each chunk commits as its OWN epoch in sequence — a crash mid-backlog
    resumes at the first un-applied chunk, and every epoch's shuffle stays
    bounded no matter how long the outage was.
    """
    from vlm_eden_dataset_etl_ray import manifest as mf
    from vlm_eden_dataset_etl_ray.spec import TOKENS_SPEC

    spec = spec or TOKENS_SPEC
    all_files = sorted(
        os.path.join(changelog_dir, f)
        for f in os.listdir(changelog_dir)
        if f.endswith(".parquet")
    )
    # lineage is cumulative (and vacuum-proof): the latest manifest alone
    # records every input file ever applied. For a LEGACY per-epoch lake,
    # cumulative_lineage unions over all retained manifests instead — a
    # legacy latest manifest's own list covers only its final epoch.
    latest = mf.latest(lake_dir)
    applied: set[str] = set(mf.cumulative_lineage(lake_dir, latest)[1])
    pending = [f for f in all_files if f not in applied]
    if not pending:
        m = mf.latest(lake_dir)
        if m is not None:
            return m
    if max_epoch_bytes is None:
        return apply_mod.apply_epoch(
            lake_dir, pending, spec=spec, registry=registry,
            batch_size=batch_size, audit=audit)
    m = None
    for chunk in _chunk_by_bytes(pending, max_epoch_bytes):
        m = apply_mod.apply_epoch(
            lake_dir, chunk, spec=spec, registry=registry,
            batch_size=batch_size, audit=audit)
    return m


def _chunk_by_bytes(pending: list[str], cap: int) -> list[list[str]]:
    """Greedy size-bounded chunks, file order preserved; one oversized
    file still forms its own chunk."""
    chunks: list[list[str]] = [[]]
    acc = 0
    for f in pending:
        b = os.path.getsize(f)
        if chunks[-1] and acc + b > cap:
            chunks.append([])
            acc = 0
        chunks[-1].append(f)
        acc += b
    return chunks


def run_incremental_debezium(
    lake_dir: str,
    envelope_dir: str,
    *,
    spec=None,
    registry=None,
    batch_size: int = 65536,
    max_epoch_bytes: int | None = None,
    columns: list[str] | None = None,
    audit: list[tuple] | None = None,
):
    """Tail a directory of Debezium-envelope JSONL shards (the push-based
    WAL-tail twin of :func:`run_incremental`'s parquet poll): every shard
    not yet in the manifest's cumulative input lineage is flattened
    vectorized (``sources/debezium.read_debezium_jsonl``) and applied as
    CDC epochs — same exactly-once file-set lineage, same backlog cap,
    any merge engine. Returns the latest manifest."""
    import hashlib

    from vlm_eden_dataset_etl_ray import manifest as mf
    from vlm_eden_dataset_etl_ray.sources.debezium import read_debezium_jsonl
    from vlm_eden_dataset_etl_ray.spec import TOKENS_SPEC

    spec = spec or TOKENS_SPEC
    all_files = sorted(
        os.path.join(envelope_dir, f)
        for f in os.listdir(envelope_dir)
        if f.endswith((".jsonl", ".json"))
    )
    latest = mf.latest(lake_dir)
    applied: set[str] = set(mf.cumulative_lineage(lake_dir, latest)[1])
    pending = [f for f in all_files if f not in applied]
    if not pending:
        return latest
    chunks = (_chunk_by_bytes(pending, max_epoch_bytes)
              if max_epoch_bytes is not None else [pending])
    m = latest
    for chunk in chunks:
        ds = read_debezium_jsonl(
            chunk, order=spec.order, op_col=spec.op_col, columns=columns)
        epoch_id = hashlib.sha256(
            ("dbz:" + "|".join(chunk)).encode()).hexdigest()[:16]
        m = apply_mod.apply_epoch_dataset(
            lake_dir, ds, epoch_id=epoch_id, spec=spec, registry=registry,
            batch_size=batch_size, input_files=list(chunk), audit=audit)
    return m


def replay_events_append(
    sf_dir: str,
    workdir: str | None = None,
    columns: list[str] | None = None,
    n_epochs: int = 2,
) -> rd.Dataset:
    """K6: replay the events-derived changelog into an APPEND-mode lake over
    several epochs (no LWW reduce, no tombstone masking — every delivered
    row is retained, duplicates per key included) and return the scan."""
    workdir = workdir or scratch_dir("events_append_")
    chg_dir = os.path.join(workdir, "chg")
    lake_dir = os.path.join(workdir, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    files = derive_changelog(sf_dir, chg_dir)
    for i in range(n_epochs):
        apply_mod.apply_epoch(lake_dir, files[i::n_epochs], spec=EVENTS_APPEND_SPEC)
    return lake_mod.scan(
        lake_dir,
        spec=EVENTS_APPEND_SPEC,
        columns=columns or ["doc_id", "lsn", "source"],
    )


#: drop+re-add evolution replay spec (schema_ver rides the envelope so the
#: registry payload is exactly the user-visible columns)
EVENTS_EVOLVE_SPEC = TableSpec(
    name="events_evolve", key="doc_id", order="lsn", num_partitions=16,
    envelope=("schema_ver",),
)


def _events_max_lsn(sf_dir: str) -> int:
    """max(event_id) from parquet row-group statistics (driver-side metadata
    read — no data scan); falls back to a single-column read."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "events.parquet")
    f = pq.ParquetFile(path)
    idx = f.schema_arrow.get_field_index("event_id")
    mx = None
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            mx = None
            break
        mx = st.max if mx is None else max(mx, st.max)
    if mx is None:
        import pyarrow.compute as pc

        mx = pc.max(pq.read_table(path, columns=["event_id"])
                    .column("event_id")).as_py()
    return int(mx)


def replay_events_drop_readd(
    sf_dir: str,
    workdir: str | None = None,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Drop + re-add schema evolution replay — the reference's
    ``migrations/20241029_01_JnkId.sql:4-16`` shape (DROP COLUMN then ADD a
    fresh one) over the events-derived changelog, in three epochs:

    1. epoch 1: payload carries ``source``;
    2. explicit ``registry.migrate`` DROPS ``source`` (tombstoned — its
       values are erased, exactly like Postgres DROP COLUMN), then epoch 2
       applies without the column;
    3. a second migrate RE-ADDS ``source`` as a FRESH generation, then
       epoch 3 applies with values again.

    The re-add boundary sits in the stream's TAIL (last min(400, 10%)
    events), so many docs keep a pre-re-add winner — those rows MUST read
    NULL even though epoch-1 files physically hold their old values; this
    is the resurrection case the per-file version masking exists for.

    Final state: ``source`` is the event_type only for docs whose winning
    row landed in epoch 3; every earlier winner reads NULL — pre-drop values
    must NOT resurrect (per-file version masking at merge-on-read)."""
    workdir = workdir or scratch_dir("events_dropreadd_")
    lake_dir = os.path.join(workdir, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    mx = _events_max_lsn(sf_dir)
    t2 = mx - min(400, mx // 10)
    t1 = t2 // 2

    def _phase_batch(t: pa.Table, *, lo: int, hi: int, ver: int,
                     with_source: bool) -> pa.Table:
        ev = t.column("event_id")
        m = pc.and_(pc.greater_equal(ev, lo), pc.less(ev, hi))
        d = _derive_batch(t.filter(m), with_tokens=False)
        cols = {
            "lsn": d.column("lsn"),
            "op": d.column("op"),
            "schema_ver": pa.array(np.full(d.num_rows, ver, dtype=np.int32)),
            "doc_id": d.column("doc_id"),
            "n_tok": d.column("n_tok"),
        }
        if with_source:
            cols["source"] = d.column("source")
        return pa.table(cols)

    phases = [
        (1, 0, t1 + 1, True),          # lsn in [0, t1]
        (2, t1 + 1, t2, False),        # drop window
        (3, t2, mx + 1, True),         # re-added generation
    ]

    import hashlib

    import ray

    from vlm_eden_dataset_etl_ray.state.registry import make_registry_actor

    payload_v1 = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                            ("source", pa.string())])
    payload_dropped = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64())])
    reg = make_registry_actor(lake_dir, seed_versions={1: payload_v1})

    def _apply_phase(ver: int, lo: int, hi: int, with_source: bool) -> None:
        # derived phases stream STRAIGHT into the epoch apply (no scratch
        # write→read round trip — same shape as replay_events)
        ds = read_table(sf_dir, "events",
                        columns=["event_id", "user_id", "event_type", "value"])
        ds = ds.map_batches(
            _phase_batch,
            fn_kwargs={"lo": lo, "hi": hi, "ver": ver, "with_source": with_source},
            batch_format="pyarrow", zero_copy_batch=True,
        )
        epoch_id = hashlib.sha256(
            f"drop_readd:{os.path.abspath(sf_dir)}:{ver}:{lo}:{hi}".encode()
        ).hexdigest()[:16]
        apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                      spec=EVENTS_EVOLVE_SPEC, registry=reg)

    _apply_phase(*phases[0])
    ray.get(reg.migrate.remote(payload_dropped))   # DROP source
    _apply_phase(*phases[1])
    ray.get(reg.migrate.remote(payload_v1))        # RE-ADD source (fresh)
    _apply_phase(*phases[2])
    return lake_mod.scan(
        lake_dir, spec=EVENTS_EVOLVE_SPEC,
        columns=columns or ["doc_id", "lsn", "n_tok", "source"],
    )


def replay_events_rename(
    sf_dir: str,
    workdir: str | None = None,
) -> rd.Dataset:
    """Column-RENAME schema evolution replay: two epochs of the
    events-derived changelog with ``source`` renamed to ``origin`` between
    them (``registry.migrate(..., renames=...)``). Epoch-1 files
    physically store ``source``; the merge-on-read rename mapping makes
    every pre-rename winner read its ORIGINAL value under ``origin`` —
    the data-preserving contrast to :func:`replay_events_drop_readd`
    (whose pre-boundary winners must read NULL). DuckDB twin: plain LWW
    with the winner's event_type as ``origin``."""
    import hashlib

    import ray

    from vlm_eden_dataset_etl_ray.state.registry import make_registry_actor

    workdir = workdir or scratch_dir("events_rename_")
    lake_dir = os.path.join(workdir, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    mx = _events_max_lsn(sf_dir)
    t1 = mx // 2

    payload_v1 = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                            ("source", pa.string())])
    payload_v2 = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                            ("origin", pa.string())])
    reg = make_registry_actor(lake_dir, seed_versions={1: payload_v1})

    def _phase(t: pa.Table, *, lo: int, hi: int, ver: int,
               col: str) -> pa.Table:
        ev = t.column("event_id")
        m = pc.and_(pc.greater_equal(ev, lo), pc.less(ev, hi))
        d = _derive_batch(t.filter(m), with_tokens=False)
        return pa.table({
            "lsn": d.column("lsn"),
            "op": d.column("op"),
            "schema_ver": pa.array(np.full(d.num_rows, ver, dtype=np.int32)),
            "doc_id": d.column("doc_id"),
            "n_tok": d.column("n_tok"),
            col: d.column("source"),
        })

    def _apply(ver: int, lo: int, hi: int, col: str) -> None:
        ds = read_table(sf_dir, "events",
                        columns=["event_id", "user_id", "event_type", "value"])
        ds = ds.map_batches(
            _phase, fn_kwargs={"lo": lo, "hi": hi, "ver": ver, "col": col},
            batch_format="pyarrow", zero_copy_batch=True)
        epoch_id = hashlib.sha256(
            f"rename:{os.path.abspath(sf_dir)}:{ver}:{lo}:{hi}".encode()
        ).hexdigest()[:16]
        apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                      spec=EVENTS_EVOLVE_SPEC, registry=reg)

    _apply(1, 0, t1 + 1, "source")
    ray.get(reg.migrate.remote(payload_v2, renames={"source": "origin"}))
    _apply(2, t1 + 1, mx + 1, "origin")
    return lake_mod.scan(
        lake_dir, spec=EVENTS_EVOLVE_SPEC,
        columns=["doc_id", "lsn", "n_tok", "origin"],
    )


def replay_events_clone_restore(
    sf_dir: str,
    workdir: str | None = None,
) -> rd.Dataset:
    """Branch + rollback end-to-end: two-epoch replay of the events
    changelog, zero-copy ``lake.clone`` of the full lake, then
    ``lake.restore`` of the SOURCE to epoch 1. Returns both snapshots
    labeled by a ``view`` column — the branch must still show the full
    two-epoch LWW state, the restored source only epoch 1's. DuckDB twin:
    two LWW windows (all lsn / lsn ≤ mid) union-labeled."""
    import hashlib

    workdir = workdir or scratch_dir("events_clonerestore_")
    lake_dir = os.path.join(workdir, "lake")
    branch_dir = os.path.join(workdir, "branch")
    shutil.rmtree(lake_dir, ignore_errors=True)
    shutil.rmtree(branch_dir, ignore_errors=True)
    mx = _events_max_lsn(sf_dir)
    mid = mx // 2

    def _phase(t: pa.Table, *, lo: int, hi: int) -> pa.Table:
        ev = t.column("event_id")
        m = pc.and_(pc.greater_equal(ev, lo), pc.less(ev, hi))
        return _derive_batch(t.filter(m), with_tokens=False)

    for lo, hi in [(0, mid + 1), (mid + 1, mx + 1)]:
        ds = read_table(sf_dir, "events",
                        columns=["event_id", "user_id", "event_type", "value"])
        ds = ds.map_batches(_phase, fn_kwargs={"lo": lo, "hi": hi},
                            batch_format="pyarrow", zero_copy_batch=True)
        epoch_id = hashlib.sha256(
            f"clonerestore:{os.path.abspath(sf_dir)}:{lo}:{hi}".encode()
        ).hexdigest()[:16]
        apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                      spec=EVENTS_REPLAY_SPEC)

    lake_mod.clone(lake_dir, branch_dir)
    lake_mod.restore(lake_dir, 1)

    cols = ["doc_id", "lsn", "n_tok", "source"]

    def _label(name):
        def _f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "view", pa.array([name] * t.num_rows, pa.string()))
        return _f

    branch = lake_mod.scan(branch_dir, spec=EVENTS_REPLAY_SPEC,
                           columns=cols).map_batches(
        _label("branch"), batch_format="pyarrow")
    restored = lake_mod.scan(lake_dir, spec=EVENTS_REPLAY_SPEC,
                             columns=cols).map_batches(
        _label("restored"), batch_format="pyarrow")
    return branch.union(restored)


def replay_events_zone_map_scan(
    sf_dir: str,
    workdir: str | None = None,
) -> rd.Dataset:
    """Zone-map data skipping end-to-end: replay the events changelog into
    an APPEND lake in THREE lsn-tercile epochs (each epoch's delta files
    carry a tight per-file lsn min/max in the manifest), then
    ``scan(stats_filter=(lsn, mid-tercile))`` — two thirds of the lake's
    files are skipped before any data is read, and the exact residual
    filter makes the result equal a plain WHERE. DuckDB twin: a BETWEEN
    over the derived rows."""
    import hashlib

    workdir = workdir or scratch_dir("events_zonemap_")
    lake_dir = os.path.join(workdir, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    mx = _events_max_lsn(sf_dir)
    cuts = [(0, mx // 3 + 1), (mx // 3 + 1, 2 * mx // 3 + 1), (2 * mx // 3 + 1, mx + 1)]

    def _phase(t: pa.Table, *, lo: int, hi: int) -> pa.Table:
        ev = t.column("event_id")
        m = pc.and_(pc.greater_equal(ev, lo), pc.less(ev, hi))
        return _derive_batch(t.filter(m), with_tokens=False)

    for lo, hi in cuts:
        ds = read_table(sf_dir, "events",
                        columns=["event_id", "user_id", "event_type", "value"])
        ds = ds.map_batches(_phase, fn_kwargs={"lo": lo, "hi": hi},
                            batch_format="pyarrow", zero_copy_batch=True)
        epoch_id = hashlib.sha256(
            f"events_zonemap:{os.path.abspath(sf_dir)}:{lo}:{hi}".encode()
        ).hexdigest()[:16]
        apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                      spec=EVENTS_APPEND_SPEC)
    return lake_mod.scan(
        lake_dir, spec=EVENTS_APPEND_SPEC,
        columns=["doc_id", "lsn", "n_tok", "source"],
        stats_filter=("lsn", mx // 3 + 1, 2 * mx // 3),
    )


def replay_events_wap(
    sf_dir: str,
    workdir: str | None = None,
) -> rd.Dataset:
    """Write-audit-publish end-to-end: the events changelog arrives in two
    lsn-half epochs, both applied through ``apply_epoch_dataset(audit=...)``
    with the gate ``lsn <= mid``. Epoch 1 (lsn ≤ mid) passes and publishes;
    epoch 2 (lsn > mid) stages its shuffle, FAILS the audit against the
    pinned candidate manifest and publishes nothing — the lake must equal
    an LWW replay of the first half alone (the staged orphans invisible).
    DuckDB twin: the replay SQL restricted to event_id ≤ mid."""
    import hashlib

    from vlm_eden_dataset_etl_ray.functions.quality import AuditError

    workdir = workdir or scratch_dir("events_wap_")
    lake_dir = os.path.join(workdir, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    mx = _events_max_lsn(sf_dir)
    mid = mx // 2
    rules = [("not_null", "doc_id"), ("in_range", "lsn", 0, mid)]

    def _phase(t: pa.Table, *, first: bool) -> pa.Table:
        ev = t.column("event_id")
        m = pc.less_equal(ev, mid) if first else pc.greater(ev, mid)
        return _derive_batch(t.filter(m), with_tokens=False)

    for first in (True, False):
        ds = read_table(sf_dir, "events",
                        columns=["event_id", "user_id", "event_type", "value"])
        ds = ds.map_batches(_phase, fn_kwargs={"first": first},
                            batch_format="pyarrow", zero_copy_batch=True)
        epoch_id = hashlib.sha256(
            f"events_wap:{os.path.abspath(sf_dir)}:{first}".encode()
        ).hexdigest()[:16]
        try:
            apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                          spec=EVENTS_REPLAY_SPEC, audit=rules)
            if not first:
                raise RuntimeError("WAP gate failed to reject the bad epoch")
        except AuditError:
            if first:  # the passing half must never trip the gate
                raise
    return lake_mod.scan(
        lake_dir, spec=EVENTS_REPLAY_SPEC,
        columns=["doc_id", "lsn", "n_tok", "source"],
    )


def replay_events_point_lookup(
    sf_dir: str,
    workdir: str | None = None,
    doc_ids: tuple[str, ...] = tuple(f"doc{i}" for i in range(1, 11)),
) -> pa.Table:
    """Point reads through the bloom path: replay the events changelog,
    then ``lake.lookup`` a fixed id list — partition pruning (keys hash to
    pids), footer-bloom file skipping, and the pre-merge key restriction
    all engage. Returns the live rows for the asked ids (deleted/missing
    ids absent). DuckDB twin: the replay SQL with ``doc_id IN (...)``."""
    import hashlib

    workdir = workdir or scratch_dir("events_lookup_")
    lake_dir = os.path.join(workdir, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"]
    ).map_batches(
        _derive_batch, fn_kwargs={"with_tokens": False},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    epoch_id = hashlib.sha256(
        f"events_lookup:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:16]
    apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                  spec=EVENTS_REPLAY_SPEC)
    return lake_mod.lookup(
        lake_dir, list(doc_ids), spec=EVENTS_REPLAY_SPEC,
        columns=["doc_id", "lsn", "n_tok", "source"])


def replay_events_dead_letter(
    sf_dir: str,
    workdir: str | None = None,
) -> rd.Dataset:
    """Dead-letter routing end-to-end: the derived changelog is corrupted
    deterministically (doc_id nulled where event_id % 97 == 0 — a feed
    whose extractor lost the key on some rows) and applied with
    ``TableSpec(on_bad_rows="dead_letter")``. Malformed rows divert to
    ``<lake>/_dead_letter/`` and the rest converge; the pipeline verifies
    the DLQ holds exactly the corrupted rows before returning the live
    snapshot. DuckDB twin: the replay SQL over event_id % 97 <> 0."""
    import hashlib

    workdir = workdir or scratch_dir("events_dlq_")
    lake_dir = os.path.join(workdir, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    spec = TableSpec(name="events_replay_dlq", key="doc_id", order="lsn",
                     num_partitions=16, envelope=(),
                     on_bad_rows="dead_letter")

    def _derive_corrupt(t: pa.Table) -> pa.Table:
        d = _derive_batch(t, with_tokens=False)
        ev = d.column("lsn").to_numpy(zero_copy_only=False)
        bad = pa.array(ev % 97 == 0)
        doc = pc.if_else(bad, pa.scalar(None, pa.string()),
                         d.column("doc_id"))
        return d.set_column(d.schema.get_field_index("doc_id"),
                            "doc_id", doc)

    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"]
    ).map_batches(_derive_corrupt, batch_format="pyarrow",
                  zero_copy_batch=True)
    epoch_id = hashlib.sha256(
        f"events_dlq:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:16]
    apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id, spec=spec)

    def _bad_count(t: pa.Table) -> pa.Table:
        ev = t.column("event_id").to_numpy(zero_copy_only=False)
        n = int(np.count_nonzero(ev % 97 == 0))
        return pa.table({"n": pa.array([n], pa.int64())})

    expected_bad = int(read_table(sf_dir, "events", columns=["event_id"])
                       .map_batches(_bad_count, batch_format="pyarrow",
                                    zero_copy_batch=True).sum("n"))
    dlq = lake_mod.read_dead_letters(lake_dir)
    n_bad = dlq.count()
    if n_bad != expected_bad:
        raise RuntimeError(
            f"DLQ holds {n_bad} rows, expected {expected_bad}")
    return lake_mod.scan(
        lake_dir, spec=spec, columns=["doc_id", "lsn", "n_tok", "source"])


def replay_events_change_feed(
    sf_dir: str,
    workdir: str | None = None,
) -> rd.Dataset:
    """The CDC *output* side: replay the events-derived changelog in THREE
    epochs (lsn terciles), then emit :func:`lake.change_feed` over epochs
    2–3 — one row per key changed after the first snapshot, carrying its
    range-LWW state plus ``_change_type`` ∈ {upsert, delete}.

    The reference's downstream consumers re-read whole Postgres tables;
    the feed reads ONLY the range's delta files (O(changes), no shuffle).
    DuckDB twin: LWW window over ``event_id > max/3`` in
    ``__ray_entry__.oracle_sql``."""
    import hashlib

    workdir = workdir or scratch_dir("events_feed_")
    lake_dir = os.path.join(workdir, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    mx = _events_max_lsn(sf_dir)
    cuts = [(0, mx // 3 + 1), (mx // 3 + 1, 2 * mx // 3 + 1), (2 * mx // 3 + 1, mx + 1)]

    def _phase(t: pa.Table, *, lo: int, hi: int) -> pa.Table:
        ev = t.column("event_id")
        m = pc.and_(pc.greater_equal(ev, lo), pc.less(ev, hi))
        return _derive_batch(t.filter(m), with_tokens=False)

    for lo, hi in cuts:
        ds = read_table(sf_dir, "events",
                        columns=["event_id", "user_id", "event_type", "value"])
        ds = ds.map_batches(_phase, fn_kwargs={"lo": lo, "hi": hi},
                            batch_format="pyarrow", zero_copy_batch=True)
        epoch_id = hashlib.sha256(
            f"events_feed:{os.path.abspath(sf_dir)}:{lo}:{hi}".encode()
        ).hexdigest()[:16]
        apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                      spec=EVENTS_REPLAY_SPEC)
    return lake_mod.change_feed(
        lake_dir, from_epoch=1, to_epoch=3, spec=EVENTS_REPLAY_SPEC,
        columns=["doc_id", "lsn", "n_tok", "source"],
    )


def replay_events_change_feed_before(
    sf_dir: str,
    workdir: str | None = None,
) -> rd.Dataset:
    """:func:`replay_events_change_feed` with the Debezium-style envelope:
    ``before_image=True`` refines ``_change_type`` to insert/update/delete
    and attaches the epoch-1 (pre-range) LIVE row values. The ``_before``
    struct is flattened to ``before_*`` columns so the result stays
    hashable for the driver's value compare."""
    workdir = workdir or scratch_dir("events_feed_b_")
    replay_events_change_feed(sf_dir, workdir)  # builds the 3-epoch lake
    lake_dir = os.path.join(workdir, "lake")
    out = lake_mod.change_feed(
        lake_dir, from_epoch=1, to_epoch=3, spec=EVENTS_REPLAY_SPEC,
        columns=["doc_id", "lsn", "n_tok", "source"], before_image=True)

    def _flatten(t: pa.Table) -> pa.Table:
        b = t.column("_before").combine_chunks()
        t = t.drop_columns(["_before"])
        for f in b.type:
            t = t.append_column(f"before_{f.name}", b.field(f.name))
        return t

    return out.map_batches(_flatten, batch_format="pyarrow",
                           zero_copy_batch=True)


def replay_events(
    sf_dir: str,
    workdir: str | None = None,
    with_tokens: bool = False,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Derive the changelog from ``events`` and replay it through the engine
    into a fresh lake under /tmp, returning the merge-on-read scan of the
    converged state. The derived changelog streams STRAIGHT into the epoch
    apply (``apply_epoch_dataset`` — no scratch parquet write→read round
    trip); exactly-once lineage is the content id of (source dir, derivation
    parameters)."""
    import hashlib

    workdir = workdir or scratch_dir("events_replay_")
    lake_dir = os.path.join(workdir, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"]
    ).map_batches(
        _derive_batch,
        fn_kwargs={"with_tokens": with_tokens},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    epoch_id = hashlib.sha256(
        f"events_replay:{os.path.abspath(sf_dir)}:{with_tokens}".encode()
    ).hexdigest()[:16]
    apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                  spec=EVENTS_REPLAY_SPEC)
    return lake_mod.scan(
        lake_dir,
        spec=EVENTS_REPLAY_SPEC,
        columns=columns or ["doc_id", "lsn", "n_tok", "source"],
    )


def replay_events_dml(
    sf_dir: str,
    workdir: str | None = None,
) -> rd.Dataset:
    """Predicate DML over a replayed lake: epoch 1 replays the events
    changelog, epoch 2 is ``DELETE WHERE n_tok < 2000`` (tombstones only —
    payload never moves; zone maps prune the matched-row scan), epoch 3 is
    ``UPDATE SET n_tok = n_tok + 1000 WHERE source = 'purchase'`` over the
    survivors. Both ops ride the engine's own CDC apply, so they are
    exactly-once and visible to change_feed / time travel. Returns the
    final live snapshot (lsn excluded: DML stamps watermark+1 LSNs, which
    the SQL twin models as the delete/update outcome, not a column)."""
    import hashlib

    from vlm_eden_dataset_etl_ray import dml

    workdir = workdir or scratch_dir("events_dml_")
    lake_dir = os.path.join(workdir, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"]
    ).map_batches(
        _derive_batch,
        fn_kwargs={"with_tokens": False},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    epoch_id = hashlib.sha256(
        f"events_dml:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:16]
    apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                  spec=EVENTS_REPLAY_SPEC)
    dml.delete_where(lake_dir, [("n_tok", "<", 2000)],
                     spec=EVENTS_REPLAY_SPEC)
    dml.update_where(lake_dir, [("source", "==", "purchase")],
                     {"n_tok": ("add", 1000)}, spec=EVENTS_REPLAY_SPEC)
    return lake_mod.scan(lake_dir, spec=EVENTS_REPLAY_SPEC,
                         columns=["doc_id", "n_tok", "source"])


def replay_events_rehash(
    sf_dir: str,
    workdir: str | None = None,
) -> rd.Dataset:
    """Partition-count evolution mid-stream: epoch 1 replays the events
    changelog into a 16-partition lake, ``lake.rehash`` re-buckets it to
    5 partitions, then epoch 2 (latest event per ``user_id % 4 == 0``
    user, re-priced ``+9999`` at an LSN above the stream, source
    ``'rebuy'``) is applied with the ORIGINAL 16-partition spec — the
    committed layout must win and the state converge as if the rehash
    never happened."""
    import hashlib

    from vlm_eden_dataset_etl_ray.functions.relational import top1_per_key

    workdir = workdir or scratch_dir("events_rehash_")
    lake_dir = os.path.join(workdir, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"]
    ).map_batches(
        _derive_batch,
        fn_kwargs={"with_tokens": False},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    epoch_id = hashlib.sha256(
        f"events_rehash:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:16]
    apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                  spec=EVENTS_REPLAY_SPEC)
    # mid-stream rehash: keep tombstones (watermark 0) so a straggler
    # below a deleted key's LSN could never resurrect it — the correct
    # production shape even though epoch 2 here only writes above-stream
    # LSNs
    lake_mod.rehash(lake_dir, 5, spec=EVENTS_REPLAY_SPEC,
                    tombstone_watermark=0)

    def _src(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = uid % 4 == 0
        t = t.filter(pa.array(keep))
        uid = uid[keep]
        val = t.column("value").to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table({
            "doc_id": pa.array(np.char.add("doc", uid.astype("U20"))),
            "lsn": t.column("event_id").cast(pa.int64()),
            "op": pa.array(np.full(n, "upsert")),
            "n_tok": pa.array(np.floor(val * 100).astype(np.int64) + 9999),
            "source": pa.array(np.full(n, "rebuy"), pa.string()),
        })

    src = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "value"]
    ).map_batches(_src, batch_format="pyarrow", zero_copy_batch=True)
    src = top1_per_key(src, "doc_id", [("lsn", "descending")])

    def _stamp(t: pa.Table) -> pa.Table:
        lsn = pa.array(np.full(t.num_rows, 10 ** 12, np.int64))
        return t.set_column(t.column_names.index("lsn"), "lsn", lsn)

    src = src.map_batches(_stamp, batch_format="pyarrow", zero_copy_batch=True)
    apply_mod.apply_epoch_dataset(lake_dir, src,
                                  epoch_id="rebuy-" + epoch_id,
                                  spec=EVENTS_REPLAY_SPEC)
    return lake_mod.scan(lake_dir, spec=EVENTS_REPLAY_SPEC,
                         columns=["doc_id", "n_tok", "source"])


def replay_events_merge(
    sf_dir: str,
    workdir: str | None = None,
) -> rd.Dataset:
    """MERGE INTO over a replayed lake — the asymmetric (update-only +
    conditional-delete) statement the reference cannot express with its
    ``ON CONFLICT DO UPDATE`` upserts (those always insert on miss;
    queries/fact_studies.py:63). Epoch 1 replays the events changelog;
    the merge source is the latest event per user for ``user_id % 3 == 0``
    re-priced to ``n_tok = floor(value·100) + 5000`` with source
    ``'merged'``. Clauses: matched AND n_tok > 25000 → DELETE; matched →
    UPDATE-all; NOT matched → skip (no insert — exercises the
    hash-semi-join match flag over the pruned live key column). Returns
    the final live snapshot."""
    import hashlib

    from vlm_eden_dataset_etl_ray import dml

    workdir = workdir or scratch_dir("events_merge_")
    lake_dir = os.path.join(workdir, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"]
    ).map_batches(
        _derive_batch,
        fn_kwargs={"with_tokens": False},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    epoch_id = hashlib.sha256(
        f"events_merge:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:16]
    apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                  spec=EVENTS_REPLAY_SPEC)

    def _src(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = uid % 3 == 0
        t = t.filter(pa.array(keep))
        uid = uid[keep]
        val = t.column("value").to_numpy(zero_copy_only=False)
        n = t.num_rows
        # the CDC sequence number is named spec.order ("lsn"): merge_into
        # uses it for source dedup then stamps its own epoch LSN, so it
        # never reaches the target schema as payload
        return pa.table({
            "doc_id": pa.array(np.char.add("doc", uid.astype("U20"))),
            "lsn": t.column("event_id").cast(pa.int64()),
            "n_tok": pa.array(np.floor(val * 100).astype(np.int64) + 5000),
            "source": pa.array(np.full(n, "merged"), pa.string()),
        })

    src = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "value"]
    ).map_batches(_src, batch_format="pyarrow", zero_copy_batch=True)
    dml.merge_into(
        lake_dir, src, spec=EVENTS_REPLAY_SPEC,
        op_id="merge-" + epoch_id,
        when_matched="update", when_not_matched="skip",
        matched_delete_where=[("n_tok", ">", 25000)],
        dedup_order_col="lsn",
    )
    return lake_mod.scan(lake_dir, spec=EVENTS_REPLAY_SPEC,
                         columns=["doc_id", "n_tok", "source"])


# ---------------------------------------------------------------------------
# merge-engine replays (partial-update / aggregate) + Debezium source
# ---------------------------------------------------------------------------

PARTIAL_PROFILES_SPEC = TableSpec(
    name="profiles", key="doc_id", order="lsn", num_partitions=16,
    envelope=(), merge_engine="partial_update",
)

AGG_TOTALS_SPEC = TableSpec(
    name="totals", key="doc_id", order="lsn", num_partitions=16,
    envelope=(), merge_engine="aggregate", on_delete="ignore",
    aggregations=(("purchase_total", "sum"), ("n_events", "count"),
                  ("max_value", "max"), ("min_value", "min"),
                  ("last_type", "last_non_null"),
                  ("first_type", "first_non_null")),
)


def _derive_partial_batch(t: pa.Table) -> pa.Table:
    """events → a changed-columns-only changelog: each event writes only the
    column(s) its type carries (the rest null = untouched); 'error' events
    are deletes. Mirrored EXACTLY by the SQL oracle in __ray_entry__."""
    ev = t.column("event_id").cast(pa.int64())
    uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    et = t.column("event_type")
    val = t.column("value")
    is_purchase = pc.equal(et, pa.scalar("purchase"))
    is_click = pc.equal(et, pa.scalar("click"))
    is_vl = pc.is_in(et, value_set=pa.array(["view", "login"]))
    n = t.num_rows
    return pa.table({
        "lsn": ev,
        "op": pc.if_else(pc.equal(et, pa.scalar("error")),
                         pa.scalar("delete"), pa.scalar("upsert")),
        "doc_id": pa.array(np.char.add("u", uid.astype("U20"))),
        "val": pc.if_else(is_purchase, val, pa.nulls(n, pa.float64())),
        "vtier": pc.if_else(
            is_click,
            pc.cast(pc.floor(pc.multiply(val, pa.scalar(10.0))), pa.int64()),
            pa.nulls(n, pa.int64())),
        "src": pc.if_else(is_vl, et, pa.nulls(n, pa.string())),
    })


def replay_partial_profiles(sf_dir: str, workdir: str | None = None) -> rd.Dataset:
    """Column-level partial-update CDC replay (the 'partial_update' merge
    engine): the events table becomes a changed-columns-only changelog,
    applied in TWO epochs split by a hash of the lsn — so columns of the
    same key arrive across epochs and out of order — and the converged
    profile rows are scanned back live (tombstones resolved, internal
    state columns hidden)."""
    import hashlib

    workdir = workdir or scratch_dir("partial_profiles_")
    lake_dir = os.path.join(workdir, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    base = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"]
    ).map_batches(_derive_partial_batch, batch_format="pyarrow",
                  zero_copy_batch=True)
    for part in (0, 1):  # deterministic split: odd/even lsn → 2 epochs
        ds = base.map_batches(
            lambda t, p=part: t.filter(pc.equal(
                pc.bit_wise_and(t.column("lsn"), pa.scalar(1, pa.int64())),
                pa.scalar(p, pa.int64()))),
            batch_format="pyarrow", zero_copy_batch=True)
        epoch_id = hashlib.sha256(
            f"partial_profiles:{os.path.abspath(sf_dir)}:{part}".encode()
        ).hexdigest()[:16]
        apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                      spec=PARTIAL_PROFILES_SPEC)
    return lake_mod.scan(lake_dir, spec=PARTIAL_PROFILES_SPEC,
                         columns=["doc_id", "val", "vtier", "src"])


def _derive_agg_batch(t: pa.Table) -> pa.Table:
    ev = t.column("event_id").cast(pa.int64())
    uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    et = t.column("event_type")
    val = t.column("value")
    n = t.num_rows
    return pa.table({
        "lsn": ev,
        "op": pc.if_else(pc.equal(et, pa.scalar("error")),
                         pa.scalar("delete"), pa.scalar("upsert")),
        "doc_id": pa.array(np.char.add("u", uid.astype("U20"))),
        "purchase_total": pc.if_else(
            pc.equal(et, pa.scalar("purchase")), val,
            pa.nulls(n, pa.float64())),
        "n_events": val,
        "max_value": val,
        "min_value": val,
        "last_type": et,
        "first_type": et,
    })


def replay_aggregate_totals(sf_dir: str, workdir: str | None = None) -> rd.Dataset:
    """Per-key aggregation merge engine: each key's lake row is a running
    aggregate (sum/count/min/max/first/last) over its change stream,
    folded associatively at every reduce site — applied in two epochs to
    prove partial-accumulator merging across epochs."""
    import hashlib

    workdir = workdir or scratch_dir("agg_totals_")
    lake_dir = os.path.join(workdir, "lake")
    shutil.rmtree(lake_dir, ignore_errors=True)
    base = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"]
    ).map_batches(_derive_agg_batch, batch_format="pyarrow",
                  zero_copy_batch=True)
    for part in (0, 1):
        ds = base.map_batches(
            lambda t, p=part: t.filter(pc.equal(
                pc.bit_wise_and(t.column("lsn"), pa.scalar(1, pa.int64())),
                pa.scalar(p, pa.int64()))),
            batch_format="pyarrow", zero_copy_batch=True)
        epoch_id = hashlib.sha256(
            f"agg_totals:{os.path.abspath(sf_dir)}:{part}".encode()
        ).hexdigest()[:16]
        apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id,
                                      spec=AGG_TOTALS_SPEC)
    return lake_mod.scan(
        lake_dir, spec=AGG_TOTALS_SPEC,
        columns=["doc_id", "purchase_total", "n_events", "max_value",
                 "min_value", "last_type", "first_type"])


def _derive_debezium_batch(t: pa.Table) -> pa.Table:
    """events → Debezium v2 JSON envelopes (struct columns; written as
    JSONL by the replay): op c/u/d from the event type, LSN in source.lsn,
    after-image for upserts, before-image for deletes."""
    ev = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
    uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    et = np.asarray(t.column("event_type").to_pylist(), dtype=str)
    val = t.column("value").to_numpy(zero_copy_only=False)
    n = t.num_rows
    doc = np.char.add("u", uid.astype("U20"))
    ntok = np.floor(val * 100).astype(np.int64)
    is_del = et == "error"
    op = np.where(is_del, "d", np.where(ev % 3 == 0, "c", "u"))
    row = pa.StructArray.from_arrays(
        [pa.array(doc), pa.array(ntok), pa.array(et)],
        names=["doc_id", "n_tok", "src"])
    nulls = pa.nulls(n, row.type)
    mask = pa.array(is_del)
    payload = pa.StructArray.from_arrays(
        [
            pc.if_else(mask, row, nulls),            # before (deletes only)
            pc.if_else(mask, nulls, row),            # after (upserts only)
            pa.array(op),
            pa.array(ev * 1000),                     # ts_ms
            pa.StructArray.from_arrays(
                [pa.array(ev), pa.array(np.repeat("events", n))],
                names=["lsn", "table"]),
        ],
        names=["before", "after", "op", "ts_ms", "source"])
    return pa.table({"payload": payload})


def replay_debezium(sf_dir: str, workdir: str | None = None) -> rd.Dataset:
    """End-to-end Debezium-envelope ingest: events → JSONL envelopes on
    disk (the connector's wire format) → ``read_debezium_jsonl`` flattens
    them vectorized → LWW CDC apply → merge-on-read scan of the converged
    state. The SQL oracle replays the same envelope construction as a
    window query over ``events``."""
    import hashlib

    from vlm_eden_dataset_etl_ray.sources.debezium import read_debezium_jsonl

    workdir = workdir or scratch_dir("dbz_replay_")
    lake_dir = os.path.join(workdir, "lake")
    jsonl_dir = os.path.join(workdir, "envelopes")
    shutil.rmtree(lake_dir, ignore_errors=True)
    shutil.rmtree(jsonl_dir, ignore_errors=True)
    os.makedirs(jsonl_dir, exist_ok=True)
    read_table(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"]
    ).map_batches(_derive_debezium_batch, batch_format="pyarrow",
                  zero_copy_batch=True).write_json(jsonl_dir)
    ds = read_debezium_jsonl(jsonl_dir)
    # the JSON round trip types integer payload fields by inference (a
    # null-image line can demote int64 → double): pin the payload types
    def _typed(t: pa.Table) -> pa.Table:
        i = t.column_names.index("n_tok")
        return t.set_column(i, "n_tok", pc.cast(
            pc.floor(pc.cast(t.column("n_tok"), pa.float64())), pa.int64()))

    ds = ds.map_batches(_typed, batch_format="pyarrow", zero_copy_batch=True)
    spec = TableSpec(name="dbz_events", key="doc_id", order="lsn",
                     num_partitions=16, envelope=())
    epoch_id = hashlib.sha256(
        f"dbz_replay:{os.path.abspath(sf_dir)}".encode()).hexdigest()[:16]
    apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=epoch_id, spec=spec)
    return lake_mod.scan(lake_dir, spec=spec,
                         columns=["doc_id", "lsn", "n_tok", "src"])
