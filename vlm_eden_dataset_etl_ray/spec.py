"""Table specifications: the engine's generalization of the reference's
per-table sync classes.

The reference hard-codes one Python class + one SQL module per destination
table (``/root/reference/sync/sync_base.py:20-59`` subclassed by
``sync/facilities.py``, ``sync/studies.py``, …; each with a matching
``queries/<table>.py`` holding the ``ON CONFLICT (key) DO UPDATE`` upsert).
Here a table is described declaratively: key column, total-order column
(the LSN that replaces the reference's ``created_at``/``updated_at``
watermark pair), op column with a tombstone value (the reference's
``deleted boolean``, ``queries/fact_studies.py:23,73``), and the set of
insert-only columns (the reference's conflict clause deliberately does NOT
update ``created_at`` / ``patient_full_name`` — ``queries/fact_studies.py:63-83``
— i.e. first-writer-wins for those columns while the rest are
last-writer-wins).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TableSpec:
    """Declarative description of one lake table's CDC semantics."""

    name: str = "sequences"
    key: str = "doc_id"
    order: str = "lsn"  # total-order column; max wins (LWW)
    op_col: str = "op"  # insert / update / delete
    delete_op: str = "delete"
    #: columns resolved first-writer-wins (kept from the OLDEST version of the
    #: row) instead of last-writer-wins; reference: insert-only columns in the
    #: fact_studies conflict clause (queries/fact_studies.py:63-83).
    insert_only: tuple[str, ...] = ()
    #: number of hash partitions of the lake; fixed per lake and recorded in
    #: every manifest so partition files stay stable across epochs.
    num_partitions: int = 32
    #: extra envelope columns excluded from the registered payload schema
    #: and from merge semantics (read before the reduce, e.g. schema_ver
    #: drives registry lookups in PrepareBatch). The LWW engine stores
    #: them verbatim on the winner row; the partial_update/aggregate folds
    #: consume them at normalize (their state rows don't carry them).
    envelope: tuple[str, ...] = ("schema_ver",)
    #: "upsert" (default): keyed LWW with tombstones — the reference's
    #: ON CONFLICT DO UPDATE tables. "append": plain INSERT semantics, no
    #: key reduce, no tombstone masking, duplicate rows per key retained —
    #: the reference's dim_technicians sink (queries/dim_technicians.py:14-29
    #: is a bare INSERT; dups across syncs are tolerated by design). The key
    #: still drives hash partitioning and the order column still drives
    #: watermark accounting.
    mode: str = "upsert"
    #: merge engine applied at every reduce site (per-batch pre-reduce,
    #: per-partition stage-2 reduce, merge-on-read, compaction):
    #: - "lww": row-level last-writer-wins (the reference's
    #:   ON CONFLICT DO UPDATE, queries/fact_studies.py:63-83) — default;
    #: - "partial_update": column-level LWW — change events carry only the
    #:   columns that changed (nulls = not touched); per-column last
    #:   non-null writer by LSN wins (lakehouse partial-update engines);
    #: - "aggregate": each key's row is a running aggregate of its change
    #:   stream, per-column function declared in ``aggregations``.
    #: See stages/merge_engines.py for state representation + semantics.
    merge_engine: str = "lww"
    #: aggregate engine only: ((column, fn), ...) with fn one of
    #: sum/count/product/min/max/bool_or/bool_and/last_non_null/
    #: first_non_null. Every value column must be declared.
    aggregations: tuple[tuple[str, str], ...] = ()
    #: delete handling for the non-LWW engines: partial_update accepts
    #: "reset" (delete tombstones the row; later writes recreate it —
    #: default), "ignore" (drop delete events) or "error"; aggregate
    #: accepts "ignore"/"error" (aggregates are not invertible, so "reset"
    #: is refused at normalize time by way of on-delete checks).
    on_delete: str = "reset"
    #: malformed-event policy, screened at the prepare stage AFTER schema
    #: unification (so a shard missing the key/order column entirely is
    #: caught as all-null, not as a crash deep in the shuffle). A row is
    #: malformed when its key or its order (LSN) is NULL — no partition,
    #: no total order, no merge semantics. Policies:
    #: - None (default): no screening, zero per-batch cost;
    #: - "fail": raise ValueError with examples (constraint-style refusal);
    #: - "drop": silently discard malformed rows;
    #: - "dead_letter": divert them to ``<lake>/_dead_letter/<epoch_id>/``
    #:   parquet (with ``__dlq_reason``/``__dlq_epoch_id`` columns; read
    #:   back via ``lake.read_dead_letters``) and apply the rest. Delivery
    #:   to the DLQ is at-least-once: a retried prepare task re-writes its
    #:   bad rows under a new file name (same contract as the engine's
    #:   duplicate-tolerant shuffle slices — consumers dedup if they care).
    on_bad_rows: str | None = None
    #: RESERVED. Hot-key skew is already absorbed by the per-batch LWW
    #: pre-reduce (each batch is an implicit salt bucket: a key occurring k
    #: times in a batch leaves it exactly once, so the exchange carries
    #: ≤ #batches rows per key regardless of skew — valid because max-LSN
    #: LWW is associative+commutative). A hot PARTITION (many distinct keys
    #: hashing together) is addressed by raising ``num_partitions``, which
    #: subdivides keys exactly like an explicit salt would.
    salt_modulus: int = 0

    def partition_of(self, _key: str) -> int:  # pragma: no cover - debug aid
        from vlm_eden_dataset_etl_ray.functions.hashing import hash_strings
        import numpy as np

        return int(hash_strings(np.array([_key], dtype=object))[0] % self.num_partitions)


#: The engine's primary table (per BASELINE.json input_hint): pre-tokenized
#: training sequences.
TOKENS_SPEC = TableSpec(name="sequences", key="doc_id", order="lsn", num_partitions=32)
