"""Cross-epoch (incremental) exact dedup backed by the engine's own lake.

Batch :func:`..functions.dedup.exact_dedup` answers "dedup this corpus";
a CDC ingest needs the INCREMENTAL question: "which of this epoch's
documents are new, given everything any earlier epoch already kept?" —
without ever re-reading the old corpus payload. The seen-content state is
a first-class lake table (key = the 64-bit content hash), so it inherits
the whole CDC machinery for free: exactly-once epoch commit, crash
resume, compaction, time travel. The reference's analogue is the
per-batch natural-key skip in sync/modalities.py:94-97 — per batch only;
this persists the decision across runs.

Scale shape (per epoch):
- payload hashes per batch (vectorized) → slim ``(content_hash, keep_by)``
  stream, 16 B/row;
- within-epoch keep-first top-1 AND the anti-join against the state
  lake's hash column share ONE exchange (``hash_semi_join`` with
  ``left_top1`` reduces per batch before the move and per bucket after
  it) — only hashes shuffle, exactly once;
- fresh hashes committed via :func:`..apply.apply_epoch_dataset` (2PC,
  idempotent on ``epoch_id``);
- survivors: one semi-join of the original payload against the fresh id
  set — the document payload crosses the exchange exactly once.

Replay determinism: re-running an already-committed ``epoch_id`` returns
the SAME survivor set by anti-joining against the state **as of the epoch
before it was first applied** (time-travel scan); this requires that
predecessor manifest to still be retained (don't vacuum past your replay
horizon).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from vlm_eden_dataset_etl_ray import lake
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray.spec import TableSpec

#: the seen-hash state table: one row per distinct content hash ever kept.
#: Each hash commits at most once (the anti-join guarantees it), so the
#: LWW machinery never actually has to resolve a conflict.
HASH_STATE_SPEC = TableSpec(
    name="seen_hashes", key="content_hash", order="lsn", num_partitions=32)

_EMPTY_HASHES = pa.table({"content_hash": pa.array([], pa.int64())})


def _epoch_first_applied(state_dir: str, epoch_id: str) -> int:
    for e in sorted(mf.list_epochs(state_dir)):
        if epoch_id in mf.load(state_dir, e).applied_epoch_ids:
            return e
    raise ValueError(f"epoch_id {epoch_id!r} not found in any retained manifest")


def incremental_exact_dedup(
    state_dir: str,
    docs: rd.Dataset,
    *,
    on: list[str],
    keep_by: str,
    epoch_id: str,
    spec: TableSpec = HASH_STATE_SPEC,
    join_buckets: int | None = None,
) -> rd.Dataset:
    """Return ``docs`` minus every row whose ``on``-content was already
    kept by an earlier epoch (or by a lower-``keep_by`` row of this one),
    and commit the survivors' hashes to the ``state_dir`` lake under
    ``epoch_id`` (exactly-once; a re-run with the same id commits nothing
    and reproduces the same survivors via a time-travel scan)."""
    from vlm_eden_dataset_etl_ray.apply import _already_applied, apply_epoch_dataset
    from vlm_eden_dataset_etl_ray.functions.hashing import content_hash
    from vlm_eden_dataset_etl_ray.functions.relational import hash_semi_join

    def _hash(t: pa.Table) -> pa.Table:
        h = content_hash(t, on)
        return pa.table({
            "content_hash": pa.array(h.astype(np.int64)),
            keep_by: t.column(keep_by),
        })

    slim = docs.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)

    done = _already_applied(state_dir, epoch_id)
    if done is not None:
        first = _epoch_first_applied(state_dir, epoch_id)
        seen = (lake.scan(state_dir, spec=spec,
                          columns=["content_hash"], asof_epoch=first - 1)
                if first > 1 else rd.from_arrow(_EMPTY_HASHES))
    elif mf.latest(state_dir) is None:
        seen = rd.from_arrow(_EMPTY_HASHES)
    else:
        seen = lake.scan(state_dir, spec=spec,
                         columns=["content_hash"])

    # fresh = this epoch's keep-first winners whose content no earlier
    # epoch kept. The within-epoch top-1 and the anti-join share ONE
    # exchange (left_top1 fuses them inside the bucket fold). Materialized
    # once (slim rows) so the commit and the survivor semi-join below
    # don't re-execute the hash + anti-join pipeline.
    fresh = hash_semi_join(
        slim, seen, "content_hash", "content_hash", anti=True,
        num_buckets=join_buckets, left_top1=[(keep_by, "ascending")],
    ).materialize()

    if done is None:
        def _rows(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "content_hash": t.column("content_hash"),
                keep_by: t.column(keep_by),
                "lsn": pa.array(np.zeros(n, np.int64)),
                "op": pa.array(["insert"] * n, pa.string()),
            })

        s = docs.schema()
        key_type = dict(zip(s.names, s.types))[keep_by]
        state_schema = pa.schema([
            ("content_hash", pa.int64()), (keep_by, key_type),
            ("lsn", pa.int64()), ("op", pa.string())])
        # an all-duplicate epoch commits a rows-free manifest (the explicit
        # target_schema keeps the empty dataset typed) so the epoch_id
        # still enters the exactly-once record — no count() gate needed
        apply_epoch_dataset(
            state_dir, fresh.map_batches(_rows, batch_format="pyarrow"),
            epoch_id=epoch_id, spec=spec, target_schema=state_schema)

    # survivors = docs ⋉ fresh ids. `fresh` is materialized, so its size
    # is metadata: a small winner set broadcasts (ray.put once, is_in per
    # batch — no payload shuffle at all); only a winner set too big for
    # the object store's comfort pays the bucketed exchange.
    if fresh.size_bytes() <= 64 * 1024 * 1024:
        from vlm_eden_dataset_etl_ray.functions.relational import (
            broadcast_membership_filter,
        )
        fs = fresh.schema() or docs.schema()  # materialized → metadata-only
        kt = dict(zip(fs.names, fs.types))[keep_by]
        batches = list(fresh.select_columns([keep_by]).iter_batches(
            batch_format="pyarrow", batch_size=None))
        ids = (pa.concat_tables(batches).column(keep_by).combine_chunks()
               if batches else pa.array([], kt))
        return broadcast_membership_filter(docs, keep_by, ids)
    return hash_semi_join(
        docs, fresh.select_columns([keep_by]), keep_by, keep_by,
        num_buckets=join_buckets)


#: LSH-key state for cross-epoch NEAR-dup dedup: append-mode lake holding
#: one row per (band, bucket) key of every kept document. Append mode —
#: keys repeat across docs by design; the lake's partition hash spreads
#: bucket keys uniformly.
MINHASH_STATE_SPEC = TableSpec(
    name="minhash_state", key="bucket_key", order="lsn", mode="append",
    num_partitions=32)

_EMPTY_BUCKETS = pa.table({"bucket_key": pa.array([], pa.int64())})


def _bucket_key_rows(docs, id_col, text_col, num_perm, bands):
    """(bucket_key, id) rows: the doc's LSH band keys, band mixed into the
    bucket hash so one int64 column keys the state lake."""
    from vlm_eden_dataset_etl_ray.functions.dedup import _signature_ds

    sig = _signature_ds(docs.select_columns([id_col, text_col]),
                        id_col, text_col, num_perm, bands)

    def _mix(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = t.column("bucket").to_numpy(zero_copy_only=False).view(np.uint64)
        with np.errstate(over="ignore"):
            key = ((band + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)) ^ bucket
        return pa.table({"bucket_key": pa.array(key.astype(np.int64)),
                         id_col: t.column(id_col)})

    return sig.map_batches(_mix, batch_format="pyarrow", zero_copy_batch=True)


def _verified_cross_epoch_dups(
    sig_dir: str,
    epoch_sigs: rd.Dataset,
    keys: rd.Dataset,
    seen: rd.Dataset,
    *,
    id_col: str,
    epoch_id: str,
    threshold: float,
    num_perm: int,
    min_bands: int,
    join_buckets: int | None,
    done,
) -> rd.Dataset:
    """Candidate ids whose cross-epoch LSH collision SURVIVES signature
    verification: join each (candidate, keeper) pair with >= ``min_bands``
    shared band buckets to the keeper's stored full signature and keep the
    pair only when the component-equality Jaccard estimate clears
    ``threshold``. A keeper with no stored signature (state predates the
    flag) cannot be verified — its collisions keep the unverified-drop
    behavior (left join; null signature ⇒ dup)."""
    from vlm_eden_dataset_etl_ray.functions.dedup import (
        signature_jaccard_estimate)
    from vlm_eden_dataset_etl_ray.functions.relational import hash_join

    ks = keys.schema()  # materialized → metadata-only
    kid_type = dict(zip(ks.names, ks.types))[id_col]
    no_dups = rd.from_arrow(pa.table({id_col: pa.array([], kid_type)}))
    if id_col not in seen.schema().names:  # empty state sentinel
        return no_dups

    keeper = seen.map_batches(
        lambda t: t.rename_columns(
            ["__keeper" if c == id_col else c for c in t.column_names]),
        batch_format="pyarrow")
    pairs = hash_join(keys, keeper, "bucket_key", "bucket_key",
                      how="inner", num_buckets=join_buckets)
    pair_cand = (pairs.groupby([id_col, "__keeper"]).count()
                 .map_batches(
                     lambda t: t.filter(
                         pc.greater_equal(t.column("count()"),
                                          pa.scalar(min_bands))
                     ).select([id_col, "__keeper"]),
                     batch_format="pyarrow"))

    if mf.latest(sig_dir) is None:
        # no signature lake at all (state built without the flag): every
        # pair candidate falls back to the unverified drop
        return pair_cand.map_batches(lambda t: t.select([id_col]),
                                     batch_format="pyarrow")

    sig_spec = TableSpec(name="minhash_sigs", key=id_col, order="lsn")
    asof = None
    if done is not None:
        try:
            asof = _epoch_first_applied(sig_dir, epoch_id) - 1
        except ValueError:
            asof = None  # epoch predates the flag — best-effort replay
    if asof == 0:
        # replaying the sig lake's FIRST epoch: no keeper had a stored
        # signature then, so every pair falls back to the unverified drop
        keeper_sigs = rd.from_arrow(pa.table({
            id_col: pa.array([], kid_type),
            "minhash_sig": pa.array([], pa.list_(pa.int64(), num_perm))}))
    else:
        keeper_sigs = lake.scan(
            sig_dir, spec=sig_spec, columns=[id_col, "minhash_sig"],
            asof_epoch=asof)
    keeper_sigs = keeper_sigs.map_batches(
        lambda t: t.rename_columns(
            ["__keeper" if c == id_col else "__sig_b" if c == "minhash_sig"
             else c for c in t.column_names]),
        batch_format="pyarrow")

    cand_sigs = epoch_sigs.map_batches(
        lambda t: t.rename_columns(
            ["__sig_a" if c == "minhash_sig" else c for c in t.column_names]),
        batch_format="pyarrow")
    j = hash_join(pair_cand, cand_sigs, id_col, id_col,
                  how="inner", num_buckets=join_buckets)
    j = hash_join(j, keeper_sigs, "__keeper", "__keeper",
                  how="left", num_buckets=join_buckets)

    def _verdict(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], kid_type)})
        sig_b = t.column("__sig_b")
        has_b = pc.is_valid(sig_b).combine_chunks()
        verified = t.filter(has_b)
        dup = [t.filter(pc.invert(has_b)).column(id_col)]  # unverifiable
        if verified.num_rows:
            est = signature_jaccard_estimate(
                verified.column("__sig_a"), verified.column("__sig_b"),
                num_perm)
            dup.append(verified.filter(
                pa.array(est >= threshold)).column(id_col))
        out = pa.concat_arrays([c.combine_chunks().cast(kid_type)
                                for c in dup])
        return pa.table({id_col: out})

    return j.map_batches(_verdict, batch_format="pyarrow")


def incremental_minhash_dedup(
    state_dir: str,
    docs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    epoch_id: str,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    min_bands: int = 1,
    spec: TableSpec = MINHASH_STATE_SPEC,
    join_buckets: int | None = None,
    verify_cross_epoch: bool = False,
    sig_dir: str | None = None,
) -> rd.Dataset:
    """Cross-epoch NEAR-dup dedup: drop a document when its MinHash
    signature collides with an EARLIER epoch's kept document on at least
    ``min_bands`` LSH bands, then near-dup-cluster the remainder within
    the epoch (:func:`..functions.dedup.minhash_dedup`, exact-Jaccard
    verified) and commit the survivors' band keys to the ``state_dir``
    lake under ``epoch_id`` (exactly-once; replays time-travel like
    :func:`incremental_exact_dedup`).

    Precision: by default the cross-epoch test is the bare LSH candidate
    test — the standard incremental trade (the old docs' term sets are
    gone); a false band collision silently drops a novel doc. With
    ``verify_cross_epoch=True`` every colliding (candidate, keeper) pair
    is re-checked against the keeper's FULL stored MinHash signature
    (component-equality fraction ≈ Jaccard) and the candidate is dropped
    only when the estimate clears ``threshold``. Cost: keepers' signatures
    persist in a sibling signature lake (``sig_dir``, default
    ``{state_dir}_sigs`` — ``num_perm``·8 B per kept doc) and the epoch
    pays one extra signature pass; turn it on from the lake's FIRST epoch
    so every keeper has a stored signature (a keeper without one cannot be
    verified and its collisions fall back to the unverified drop).
    State size: bands rows of 16 bytes per kept doc — O(kept), never
    O(corpus payload).
    """
    from vlm_eden_dataset_etl_ray.apply import _already_applied, apply_epoch_dataset
    from vlm_eden_dataset_etl_ray.functions.dedup import (
        full_signatures, minhash_dedup, signature_jaccard_estimate)
    from vlm_eden_dataset_etl_ray.functions.relational import (
        hash_join, hash_semi_join)

    sig_dir = sig_dir or state_dir.rstrip("/") + "_sigs"

    # the epoch's band keys are computed ONCE (signatures are the epoch's
    # most expensive stage) and materialized — probed against the state
    # below AND reused for the survivors' state commit (slim 16 B rows)
    keys = _bucket_key_rows(docs, id_col, text_col, num_perm,
                            bands).materialize()

    done = _already_applied(state_dir, epoch_id)
    state_cols = (["bucket_key", id_col] if verify_cross_epoch
                  else ["bucket_key"])
    if done is not None:
        first = _epoch_first_applied(state_dir, epoch_id)
        seen = (lake.scan(state_dir, spec=spec, columns=state_cols,
                          asof_epoch=first - 1)
                if first > 1 else rd.from_arrow(_EMPTY_BUCKETS))
    elif mf.latest(state_dir) is None:
        seen = rd.from_arrow(_EMPTY_BUCKETS)
    else:
        seen = lake.scan(state_dir, spec=spec, columns=state_cols)

    if not verify_cross_epoch:
        # docs colliding with the state on >= min_bands bands are old dups
        hits = hash_semi_join(keys, seen, "bucket_key", "bucket_key",
                              num_buckets=join_buckets)
        dup_ids = (hits.groupby(id_col).count()
                   .map_batches(
                       lambda t: t.filter(
                           pc.greater_equal(t.column("count()"),
                                            pa.scalar(min_bands))
                       ).select([id_col]),
                       batch_format="pyarrow"))
    else:
        # epoch signatures: computed once, reused for the verify joins AND
        # the survivors' signature commit below
        epoch_sigs = full_signatures(docs, id_col, text_col,
                                     num_perm).materialize()
        dup_ids = _verified_cross_epoch_dups(
            sig_dir, epoch_sigs, keys, seen, id_col=id_col,
            epoch_id=epoch_id, threshold=threshold, num_perm=num_perm,
            min_bands=min_bands, join_buckets=join_buckets, done=done)
    fresh = hash_semi_join(docs, dup_ids, id_col, id_col, anti=True,
                           num_buckets=join_buckets)

    # within-epoch near-dup clustering (exact-Jaccard verified)
    labels = minhash_dedup(fresh, id_col, text_col, threshold=threshold,
                           num_perm=num_perm, bands=bands)
    kept_ids = labels.map_batches(
        lambda t: t.filter(t.column("is_kept").combine_chunks())
                   .select([id_col]),
        batch_format="pyarrow")
    survivors = hash_semi_join(fresh, kept_ids, id_col, id_col,
                               num_buckets=join_buckets).materialize()

    if done is None:
        if verify_cross_epoch and _already_applied(sig_dir, epoch_id) is None:
            # keepers' signatures commit FIRST: a crash between the two
            # commits leaves sigs-without-keys, which is harmless (keys
            # drive collisions) and converges on re-run (both commits are
            # idempotent on epoch_id)
            sig_spec = TableSpec(name="minhash_sigs", key=id_col,
                                 order="lsn", num_partitions=spec.num_partitions)
            surv_sigs = hash_semi_join(epoch_sigs, kept_ids, id_col, id_col,
                                       num_buckets=join_buckets)

            def _sig_rows(t: pa.Table) -> pa.Table:
                n = t.num_rows
                return pa.table({
                    id_col: t.column(id_col),
                    "minhash_sig": t.column("minhash_sig"),
                    "lsn": pa.array(np.zeros(n, np.int64)),
                    "op": pa.array(["insert"] * n, pa.string()),
                })

            es = epoch_sigs.schema()  # materialized → metadata-only
            sid_type = dict(zip(es.names, es.types))[id_col]
            sig_schema = pa.schema([
                (id_col, sid_type),
                ("minhash_sig", pa.list_(pa.int64(), num_perm)),
                ("lsn", pa.int64()), ("op", pa.string())])
            apply_epoch_dataset(
                sig_dir, surv_sigs.map_batches(_sig_rows,
                                               batch_format="pyarrow"),
                epoch_id=epoch_id, spec=sig_spec, target_schema=sig_schema)

        # survivors' band keys = the already-materialized epoch keys
        # filtered to surviving ids — no third signature pass
        surv_keys = hash_semi_join(keys, kept_ids, id_col, id_col,
                                   num_buckets=join_buckets)

        def _rows(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "bucket_key": t.column("bucket_key"),
                id_col: t.column(id_col),
                "lsn": pa.array(np.zeros(n, np.int64)),
                "op": pa.array(["insert"] * n, pa.string()),
            })

        s = keys.schema()  # materialized → metadata-only
        key_type = dict(zip(s.names, s.types))[id_col]
        state_schema = pa.schema([
            ("bucket_key", pa.int64()), (id_col, key_type),
            ("lsn", pa.int64()), ("op", pa.string())])
        rows = surv_keys.map_batches(_rows, batch_format="pyarrow")
        if survivors.count() == 0:
            rows = rd.from_arrow(pa.table({
                "bucket_key": pa.array([], pa.int64()),
                id_col: pa.array([], key_type),
                "lsn": pa.array([], pa.int64()),
                "op": pa.array([], pa.string()),
            }))
        apply_epoch_dataset(state_dir, rows, epoch_id=epoch_id, spec=spec,
                            target_schema=state_schema)
    return survivors
