"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

The reference's dedup is tiny (DISTINCT scans, per-batch natural-key skip —
/root/reference/queries/dim_facitities.py:4, sync/modalities.py:94-97); a
100 TB training-corpus pipeline needs the full family. Scale design:

- exact: content-hash per batch (vectorized) → two-stage keep-first reduce —
  one shuffle on the 8-byte hash, never on the payload;
- MinHash+LSH: signatures per batch (vectorized affine perms) → explode to
  (band, band_hash, doc) rows → groupby band buckets → candidate pairs →
  exact-Jaccard verify via shuffle-joined term sets (no driver/broadcast
  copy of the corpus) → distributed connected components for clustering;
- all-pairs n-gram Jaccard / cosine are the *oracle baselines* for tests —
  quadratic, driver-broadcast — not the scale path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

try:
    import polars as pl
except ImportError:  # pragma: no cover
    pl = None

from vlm_eden_dataset_etl_ray.functions.relational import top1_per_key

_MERSENNE = (1 << 61) - 1
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def exact_dedup(ds: rd.Dataset, on: list[str], keep_by: str) -> rd.Dataset:
    """Exact dedup: keep the min-``keep_by`` row per distinct ``on`` content.
    Hash the content columns per batch, then a two-stage keep-first reduce
    keyed on the hash (skew-safe, payload never shuffled twice)."""

    def _hash(t: pa.Table) -> pa.Table:
        from vlm_eden_dataset_etl_ray.functions.hashing import content_hash

        h = content_hash(t, on)
        return t.append_column("__h", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)
    out = top1_per_key(hashed, "__h", [(keep_by, "ascending")])
    return out.map_batches(
        lambda t: t.drop_columns(["__h"]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Shingling + exact Jaccard (oracle baseline, quadratic)
# ---------------------------------------------------------------------------


def _term_hash_sets(ds: rd.Dataset, id_col: str, text_col: str, ngram: int = 1):
    """Per-doc sorted unique term-hash arrays (ngram=1 → word shingles)."""

    def _prep(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t.column(text_col).combine_chunks())
        words = s.str.split(" ")
        if ngram > 1:
            # word n-grams via windowed concat; incomplete tail windows
            # concat to null (concat_str propagates nulls) and are dropped
            words = (
                s.str.split(" ")
                .list.eval(
                    pl.concat_str(
                        [pl.element().shift(-i) for i in range(ngram)], separator=" "
                    )
                )
                .list.drop_nulls()
            )
        hashes = words.list.eval(pl.element().hash(seed=3)).list.unique().list.sort()
        return pa.table(
            {id_col: t.column(id_col), "__terms": hashes.to_arrow()}
        )

    return ds.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)


def _jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


#: hard row cap for the O(n²) oracle baselines below: they broadcast the
#: whole (prepped) corpus and compute all pairs — a test/audit tool, never
#: a scale path. Above the cap they raise instead of silently melting a
#: cluster; the scale twins are minhash_lsh_pairs / knn_* (IVF/LSH).
QUADRATIC_BASELINE_MAX_ROWS = 20_000


def _guard_quadratic(n: int, fn: str, twin: str) -> None:
    if n > QUADRATIC_BASELINE_MAX_ROWS:
        raise ValueError(
            f"{fn} is the O(n^2) oracle baseline and is capped at "
            f"{QUADRATIC_BASELINE_MAX_ROWS} rows (got {n}); use {twin} at scale"
        )


def ngram_jaccard_pairs(
    ds: rd.Dataset, id_col: str, text_col: str, threshold: float, ngram: int = 1
) -> pa.Table:
    """ALL-PAIRS exact Jaccard ≥ threshold (the quadratic oracle baseline —
    use :func:`minhash_lsh_pairs` at scale; rows capped by
    :data:`QUADRATIC_BASELINE_MAX_ROWS`). Pairs are computed in distributed
    row-blocks against a broadcast copy of the term sets."""
    prepped = _term_hash_sets(ds, id_col, text_col, ngram)
    rows = pa.concat_tables(
        prepped.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by(id_col)
    _guard_quadratic(rows.num_rows, "ngram_jaccard_pairs", "minhash_lsh_pairs")
    ids = rows.column(id_col).to_pylist()
    terms = [np.asarray(x, dtype=np.uint64) for x in rows.column("__terms").to_pylist()]
    terms_ref = ray.put((ids, terms))

    n = len(ids)
    block = max(32, n // 64)
    items = [{"lo": lo, "hi": min(lo + block, n)} for lo in range(0, n, block)]

    def _pairs(batch: pa.Table) -> pa.Table:
        ids_, terms_ = ray.get(terms_ref)
        out_a, out_b, out_j = [], [], []
        for row in batch.to_pylist():
            for i in range(row["lo"], row["hi"]):
                ti = terms_[i]
                for j in range(i + 1, len(ids_)):
                    jac = _jaccard_sorted(ti, terms_[j])
                    if jac >= threshold:
                        out_a.append(ids_[i])
                        out_b.append(ids_[j])
                        out_j.append(jac)  # exact int/int division: bit-equal to SQL
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    res = rd.from_items(items).repartition(len(items)).map_batches(
        _pairs, batch_size=1, batch_format="pyarrow"
    )
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow", batch_size=None))


# ---------------------------------------------------------------------------
# Prefix-filtering set-similarity join (EXACT Jaccard at scale)
# ---------------------------------------------------------------------------


def _prefix_len(sizes, threshold: float):
    """AllPairs/PPJoin prefix bound: two sets with Jaccard ≥ τ must share a
    token within the first ``s − ⌈τ·s⌉ + 1`` of each, under ANY one global
    token order (Bayardo/Ma/Srikant WWW'07; Xiao et al. WWW'08)."""
    import polars as pl

    return (sizes - (sizes.cast(pl.Float64) * threshold).ceil()
            .cast(pl.Int64) + 1).clip(0)


def _bucket_pairs(g: pa.Table, *, threshold: float) -> pa.Table:
    """All size-compatible id pairs within one prefix-token bucket,
    vectorized: sort by (size, id), and for each row the partners are the
    contiguous run of later rows with size ≤ size/τ (searchsorted — no
    Python pair loop)."""
    k = g.num_rows
    empty = pa.table({"doc_a": pa.array([], g.column("__id").type),
                      "doc_b": pa.array([], g.column("__id").type)})
    if k < 2:
        return empty
    order = pc.sort_indices(g, sort_keys=[("__size", "ascending"),
                                          ("__id", "ascending")])
    g = g.take(order)
    ids = g.column("__id").combine_chunks()
    sizes = g.column("__size").to_numpy(zero_copy_only=False).astype(np.float64)
    hi = np.searchsorted(sizes, sizes / threshold, side="right")
    start = np.arange(1, k + 1, dtype=np.int64)
    counts = np.maximum(hi - start, 0)
    tot = int(counts.sum())
    if tot == 0:
        return empty
    ia = np.repeat(np.arange(k, dtype=np.int64), counts)
    jb = (np.arange(tot, dtype=np.int64)
          - np.repeat(np.cumsum(counts) - counts, counts)
          + np.repeat(start, counts))
    a, b = ids.take(pa.array(ia)), ids.take(pa.array(jb))
    lo = pc.min_element_wise(a, b)
    return pa.table({"doc_a": lo, "doc_b": pc.max_element_wise(a, b)})


def prefix_jaccard_pairs(
    ds: rd.Dataset,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    ngram: int = 1,
    order: str = "hash",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """EXACT all-pairs Jaccard ≥ τ at scale via prefix filtering — the
    AllPairs/PPJoin blocking that :func:`ngram_jaccard_pairs` (the O(n²)
    oracle baseline) and :func:`minhash_lsh_pairs` (approximate: banding
    can MISS true pairs) both lack. Guaranteed-complete candidate set:
    every true pair shares a token in the emitted prefixes, so the output
    equals the quadratic baseline's exactly.

    Stages (all streaming, nothing driver-side): term-hash sets →
    per-doc prefix rows ``(token, id, size)`` → groupby(token) pair
    generation with the in-bucket size filter ``|B| ≤ |A|/τ`` (a pair of
    sets with incompatible sizes can't reach τ) → pair distinct →
    exact-Jaccard verify by shuffle-joining the pair list back to the
    term sets (:func:`_verify_pairs` — no corpus broadcast).

    ``order`` picks the global token order the prefixes are taken under:

    - ``"hash"`` (default): the term-hash order the sets already carry —
      zero extra exchanges. Bucket sizes follow token document-frequency,
      so a Zipf-heavy vocabulary puts frequent tokens in prefixes and
      inflates candidates (still exact, just more verify work).
    - ``"frequency"``: the classic rarest-first order — one distributed
      doc-frequency count plus one hash join re-ranks every doc's terms so
      prefixes hold its RAREST tokens (near-minimal candidates). Costs two
      extra exchanges over the exploded token stream; worth it exactly
      when the vocabulary is skewed.

    Applicability boundary (measured, not hypothetical): prefix filtering
    needs the prefix-token universe to be LARGE relative to the corpus.
    With small sets (p = s − ⌈τs⌉ + 1 hits 1 token at high τ) drawn from
    a tiny vocabulary, many docs share the same prefix token under ANY
    order and the hot bucket degenerates toward all-pairs (the sf0.1
    synthetic documents table — ~10 effective prefix tokens — produces
    ~7.7M candidates for 35.6k true pairs). For such corpora use
    :func:`exact_dedup` on the term-set hash plus :func:`minhash_dedup`;
    prefix filtering earns its keep on natural text, where shingle
    vocabularies are Zipf-heavy but HUGE.
    """
    import polars as pl

    from vlm_eden_dataset_etl_ray.functions.relational import hash_join

    if order not in ("hash", "frequency"):
        raise ValueError(f"order={order!r} not in hash|frequency")
    prepped = _term_hash_sets(ds, id_col, text_col, ngram)
    prepped = _coalesce(prepped.materialize())

    if order == "hash":

        def _prefix(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            sizes = df["__terms"].list.len().cast(pl.Int64)
            out = (df.lazy()
                   .with_columns(__size=sizes,
                                 __p=_prefix_len(sizes, threshold))
                   .select([pl.col(id_col).alias("__id"), pl.col("__size"),
                            pl.col("__terms").list.head(pl.col("__p"))
                            .alias("__tok")])
                   .explode("__tok").drop_nulls("__tok")
                   # u64 hashes → i64 reinterpret: Ray's groupby/exchange
                   # paths are int64; the bit pattern stays a valid key
                   .with_columns(pl.col("__tok").reinterpret(signed=True))
                   .collect())
            return out.to_arrow()

        pref = prepped.map_batches(_prefix, batch_format="pyarrow",
                                   zero_copy_batch=True)
    else:
        def _occ(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            out = (df.lazy()
                   .with_columns(
                       __size=df["__terms"].list.len().cast(pl.Int64))
                   .select([pl.col(id_col).alias("__id"), pl.col("__size"),
                            pl.col("__terms").alias("__tok")])
                   .explode("__tok").drop_nulls("__tok")
                   .with_columns(pl.col("__tok").reinterpret(signed=True))
                   .collect())
            return out.to_arrow()

        occ = prepped.map_batches(_occ, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
        vocab = (occ.groupby("__tok").count()
                 .map_batches(lambda t: t.rename_columns(["__tok", "__df"]),
                              batch_format="pyarrow"))
        ranked = hash_join(occ, vocab, "__tok", "__tok",
                           num_buckets=num_buckets,
                           bytes_hint=2 * occ.size_bytes())

        def _take_prefix(g: pa.Table) -> pa.Table:
            order_ix = pc.sort_indices(
                g, sort_keys=[("__df", "ascending"), ("__tok", "ascending")])
            g = g.take(order_ix)
            s = g.column("__size")[0].as_py()
            p = max(0, s - int(np.ceil(s * threshold)) + 1)
            return g.slice(0, p).select(["__id", "__size", "__tok"])

        pref = ranked.groupby("__id").map_groups(
            _take_prefix, batch_format="pyarrow")

    cand = pref.groupby("__tok").map_groups(
        _bucket_pairs, fn_kwargs={"threshold": threshold},
        batch_format="pyarrow")
    cand = _coalesce(_dedup_pairs(cand).materialize())
    return _verify_pairs(cand, prepped, id_col, threshold,
                         num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (merge/purge)
# ---------------------------------------------------------------------------


def sorted_neighborhood_pairs(
    ds: rd.Dataset,
    id_col: str,
    sort_by: list[str],
    window: int,
    text_col: str,
    threshold: float,
    ngram: int = 1,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Sorted-neighborhood method (Hernández & Stolfo's merge/purge): sort
    the corpus by a blocking key and compare only rows within ``window``
    rank distance — the classic entity-resolution blocking when near-dups
    share a key PREFIX (names, addresses, normalized titles) rather than
    rare tokens. Complements :func:`prefix_jaccard_pairs` (token-overlap
    blocking) and :func:`minhash_lsh_pairs` (probabilistic): candidate
    count is O(n·window) by construction, independent of token skew.

    Output: ``(doc_a, doc_b, jaccard)`` — ``doc_a`` is the LOWER-ranked id
    under ``(sort_by, id_col)`` order; pairs are exact word-``ngram``
    Jaccard ≥ τ over ``text_col`` (same verify as the other dedup ops).

    Scale shape: one distributed sort (:func:`..windows.global_row_number`
    — O(blocks) driver metadata), then RANGE PARTITIONING WITH OVERLAP:
    each row lands in its home block ``rn // window`` plus, as a ghost, in
    the next one, so every ≤ ``window`` pair co-locates in exactly ONE
    block (the later row's home) — no pair-dedup exchange. Per block a
    searchsorted emits each home row's partners; the pair list then
    shuffle-joins the term sets for exact verification. The sort is the
    only all-to-all; ghosting doubles the slim (id, rank) stream, never
    the payload."""
    from vlm_eden_dataset_etl_ray.functions.windows import global_row_number

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    ranked = global_row_number(
        ds.select_columns([id_col] + [c for c in sort_by if c != id_col]),
        sort_by + ([id_col] if id_col not in sort_by else []),
        out_col="__rn")

    def _ghost(t: pa.Table, *, w=window) -> pa.Table:
        rn = t.column("__rn").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).combine_chunks()
        take = pa.array(np.tile(np.arange(t.num_rows, dtype=np.int64), 2))
        blk = np.concatenate([rn // w, rn // w + 1])
        return pa.table({
            "__id": ids.take(take),
            "__rn": pa.array(np.tile(rn, 2)),
            "__blk": pa.array(blk.astype(np.int64)),
        })

    blocks = ranked.map_batches(_ghost, batch_format="pyarrow",
                                zero_copy_batch=True)

    def _pairs(g: pa.Table, *, w=window) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("__rn", "ascending")])
        g = g.take(order)
        rn = g.column("__rn").to_numpy(zero_copy_only=False)
        ids = g.column("__id").combine_chunks()
        blk = int(g.column("__blk")[0].as_py())
        home = np.flatnonzero(rn // w == blk)  # ghosts pair, never anchor
        if home.size == 0:
            t = ids.slice(0, 0)
            return pa.table({"doc_a": t, "doc_b": t})
        lo = np.searchsorted(rn, rn[home] - w, side="left")
        counts = home - lo
        tot = int(counts.sum())
        if tot == 0:
            t = ids.slice(0, 0)
            return pa.table({"doc_a": t, "doc_b": t})
        ib = np.repeat(home, counts)
        ia = (np.arange(tot, dtype=np.int64)
              - np.repeat(np.cumsum(counts) - counts, counts)
              + np.repeat(lo, counts))
        return pa.table({"doc_a": ids.take(pa.array(ia)),
                         "doc_b": ids.take(pa.array(ib))})

    cand = blocks.groupby("__blk").map_groups(_pairs, batch_format="pyarrow")
    prepped = _term_hash_sets(ds.select_columns([id_col, text_col]),
                              id_col, text_col, ngram)
    return _verify_pairs(_coalesce(cand.materialize()), prepped, id_col,
                         threshold, num_buckets=num_buckets)


def _perm_coeffs(num_perm: int, seed: int = 11) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


class MinHashSignatures:
    """Actor-pool stage: per-doc MinHash signatures (affine permutations of
    term hashes, vectorized). Coefficients built once per actor."""

    def __init__(self, id_col: str, text_col: str, num_perm: int, bands: int):
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.a, self.b = _perm_coeffs(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch.column(self.text_col).combine_chunks())
        hashed = s.str.split(" ").list.eval(pl.element().hash(seed=3)).list.unique()
        offsets = np.asarray(hashed.list.len().cum_sum().to_numpy(), dtype=np.int64)
        flat = hashed.explode().to_numpy().astype(np.uint64)
        starts = np.concatenate([[0], offsets[:-1]])
        ids = batch.column(self.id_col).to_pylist()
        band_ids, band_hashes, doc_ids = [], [], []
        for i, (lo, hi) in enumerate(zip(starts, offsets)):
            terms = flat[lo:hi]
            if terms.size == 0:
                continue
            # sig[p] = min over terms of (a[p]*x + b[p]) mod M  (vectorized outer)
            sig = ((terms[None, :] * self.a[:, None] + self.b[:, None])
                   % np.uint64(_MERSENNE)).min(axis=1)
            bh = sig.reshape(self.bands, self.rows_per_band)
            # combine rows of each band into one bucket hash
            bucket = (bh * np.uint64(1099511628211)).sum(axis=1, dtype=np.uint64)
            band_ids.extend(range(self.bands))
            band_hashes.extend(bucket.astype(np.int64))
            doc_ids.extend([ids[i]] * self.bands)
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "bucket": pa.array(band_hashes, pa.int64()),
                self.id_col: pa.array(doc_ids),
            }
        )


def _signatures_stateless(batch, *, id_col, text_col, num_perm, bands):
    return MinHashSignatures(id_col, text_col, num_perm, bands)(batch)


def full_signatures(
    ds: rd.Dataset, id_col: str, text_col: str, num_perm: int = 128,
    sig_col: str = "minhash_sig",
) -> rd.Dataset:
    """Per-doc FULL MinHash signature as ``fixed_size_list<int64, num_perm>``
    — same hashing path and (seeded, deterministic) permutation
    coefficients as :class:`MinHashSignatures`, so signatures computed in
    different epochs/processes are comparable component-wise. The
    component-equality fraction is an unbiased Jaccard estimate — the
    verification currency when the original term sets are gone (e.g.
    cross-epoch state that never retains payload). Empty-term docs emit no
    row (they also emit no LSH band, so they are never candidates)."""
    a_, b_ = _perm_coeffs(num_perm)

    def _f(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch.column(text_col).combine_chunks())
        hashed = s.str.split(" ").list.eval(pl.element().hash(seed=3)).list.unique()
        offsets = np.asarray(hashed.list.len().cum_sum().to_numpy(), dtype=np.int64)
        flat = hashed.explode().to_numpy().astype(np.uint64)
        starts = np.concatenate([[0], offsets[:-1]])
        ids = batch.column(id_col)
        keep_idx, sigs = [], []
        for i, (lo, hi) in enumerate(zip(starts, offsets)):
            terms = flat[lo:hi]
            if terms.size == 0:
                continue
            sig = ((terms[None, :] * a_[:, None] + b_[:, None])
                   % np.uint64(_MERSENNE)).min(axis=1)
            keep_idx.append(i)
            sigs.append(sig.astype(np.int64))
        flat_sig = (np.concatenate(sigs) if sigs
                    else np.empty(0, np.int64))
        return pa.table({
            id_col: ids.take(pa.array(keep_idx, pa.int64())),
            sig_col: pa.FixedSizeListArray.from_arrays(
                pa.array(flat_sig, pa.int64()), num_perm),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        _f, batch_format="pyarrow", zero_copy_batch=True)


def signature_jaccard_estimate(col_a, col_b, num_perm: int) -> np.ndarray:
    """Row-wise MinHash Jaccard estimate: fraction of equal signature
    components. Accepts list / fixed-size-list columns (polars join
    round-trips may relax the fixed-size type)."""
    def _mat(col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return (col.flatten().to_numpy(zero_copy_only=False)
                .reshape(-1, num_perm))
    if len(col_a) == 0:
        return np.empty(0, np.float64)
    return (_mat(col_a) == _mat(col_b)).mean(axis=1)


def _signature_ds(ds, id_col, text_col, num_perm, bands):
    # coefficient construction is trivial → stateless tasks (elastic
    # parallelism, no actor-pool ramp)
    return ds.map_batches(
        _signatures_stateless,
        fn_kwargs={"id_col": id_col, "text_col": text_col,
                   "num_perm": num_perm, "bands": bands},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _dedup_pairs(cand: rd.Dataset) -> rd.Dataset:
    """Distinct (doc_a, doc_b) rows via the groupby shuffle (sort-based
    aggregate — no per-group Python, no driver materialization). A local
    per-batch pre-distinct was measured useless here: a pair's duplicates
    come from DIFFERENT bands, which the (band, bucket) groupby scatters
    across blocks."""
    return (cand.groupby(["doc_a", "doc_b"]).count()
            .select_columns(["doc_a", "doc_b"]))


def _coalesce(ds: rd.Dataset, target_block_bytes: int = 64 * 1024 * 1024,
              lo: int = 8, hi: int = 512) -> rd.Dataset:
    """Re-block a MATERIALIZED dataset to ~target_block_bytes per block.
    Upstream groupbys fragment small datasets into hundreds of tiny blocks
    and per-block task overhead then dominates every downstream shuffle
    (measured 5× on the verify joins); data-proportional block counts keep
    the same code efficient from sf0.001 to 100 TB."""
    nb = max(lo, min(hi, -(-ds.size_bytes() // target_block_bytes)))
    if nb < ds.num_blocks():
        return ds.repartition(nb).materialize()
    return ds


def _verify_pairs(
    cand: rd.Dataset, prepped: rd.Dataset, id_col: str, threshold: float,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Exact-Jaccard verification of candidate pairs WITHOUT any driver /
    broadcast copy of the corpus term sets (the round-1 scale-killer):
    shuffle-join the pair list to the (doc_id, term-set) table — once on
    doc_a, once on doc_b — then verify per batch with vectorized polars
    set-intersection. Each term set crosses the wire O(pairs containing it)
    times and never aggregates in one object."""
    from vlm_eden_dataset_etl_ray.functions.relational import hash_join

    ta = prepped.map_batches(
        lambda t: t.rename_columns(["doc_a", "__ta"]), batch_format="pyarrow")
    tb = prepped.map_batches(
        lambda t: t.rename_columns(["doc_b", "__tb"]), batch_format="pyarrow")
    j = hash_join(cand, ta, "doc_a", "doc_a", how="inner", num_buckets=num_buckets)
    j = hash_join(j, tb, "doc_b", "doc_b", how="inner", num_buckets=num_buckets)

    def _jac(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["__ta", "__tb"]))
        la = df["__ta"].list.len().cast(pl.Int64)
        lb = df["__tb"].list.len().cast(pl.Int64)
        inter = df["__ta"].list.set_intersection(df["__tb"]).list.len().cast(pl.Int64)
        union = la + lb - inter
        jac = (inter / union).to_numpy()  # int64/int64 → IEEE double, == a/b in SQL
        keep = pa.array(jac >= threshold)
        out = pa.table({
            "doc_a": t.column("doc_a"), "doc_b": t.column("doc_b"),
            "jaccard": pa.array(jac, pa.float64()),
        })
        return out.filter(keep)

    return j.map_batches(_jac, batch_format="pyarrow", zero_copy_batch=True)


def minhash_lsh_pairs(
    ds: rd.Dataset,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    concurrency=None,
    max_bucket: int | None = None,
) -> rd.Dataset:
    """Near-dup pairs via MinHash banding, verified by exact Jaccard ≥
    threshold. Shuffles: bucket groupby over tiny (band, bucket, doc) rows,
    pair-dedup groupby, and the two verify joins — all hash-partitioned,
    nothing corpus-sized on the driver or in a single broadcast object.
    Returns a Dataset sorted by (doc_a, doc_b).

    Scale contract: the OUTPUT is all qualifying pairs, which is quadratic
    in clique size — a corpus that is one big near-dup family (e.g. heavy
    boilerplate) produces O(n²) pairs no matter the algorithm. For dedup at
    scale use :func:`minhash_dedup` (star edges, ≤ bands × docs rows); use
    this operator when the pair list itself is the product. ``max_bucket``
    (optional) skips pair enumeration for buckets larger than the cap and
    logs how many buckets were truncated — an explicit recall/cost lever,
    never a silent one."""
    sigs = _signature_ds(ds, id_col, text_col, num_perm, bands)

    def _bucket_pairs(g: pa.Table) -> pa.Table:
        ids = np.sort(np.asarray(g.column(id_col).to_pylist(), dtype=np.int64))
        if max_bucket is not None and len(ids) > max_bucket:
            import logging
            logging.getLogger(__name__).warning(
                "minhash_lsh_pairs: bucket of %d docs exceeds max_bucket=%d; "
                "pairs from this bucket are DROPPED (use minhash_dedup for "
                "clique-safe clustering)", len(ids), max_bucket)
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        i, j = np.triu_indices(len(ids), k=1)  # vectorized pair enumeration
        return pa.table({"doc_a": pa.array(ids[i]), "doc_b": pa.array(ids[j])})

    cand = _coalesce(_dedup_pairs(
        sigs.groupby(["band", "bucket"]).map_groups(_bucket_pairs, batch_format="pyarrow")
    ).materialize())  # distributed blocks; bounded by candidate count
    if cand.count() == 0:
        return rd.from_arrow(pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        ))
    # term sets are reused by both verify joins → materialize once (object-
    # store resident, spillable; non-candidate docs drop out inside the
    # inner join, so only candidate term sets survive past the first stage)
    prepped = _coalesce(_term_hash_sets(ds, id_col, text_col).materialize())
    nb = max(cand.num_blocks(), prepped.num_blocks())
    verified = _verify_pairs(cand, prepped, id_col, threshold, num_buckets=nb)
    return verified.sort(["doc_a", "doc_b"])


# ---------------------------------------------------------------------------
# MinHash near-dup CLUSTERING (the true scale path for dedup)
# ---------------------------------------------------------------------------


def minhash_dedup(
    ds: rd.Dataset,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    concurrency=None,
) -> rd.Dataset:
    """Near-dup clustering: Dataset of (doc_id, cluster_rep, is_kept).

    Where :func:`minhash_lsh_pairs` emits ALL qualifying pairs (quadratic in
    clique size — a boilerplate-heavy corpus produces 10^7+ pairs from 10^3
    docs), this emits per-bucket STAR edges (doc → min-doc of bucket),
    ≤ bands × docs edges total. Every stage is distributed end-to-end:
    edges are verified by exact Jaccard via shuffle-joined term sets
    (:func:`_verify_pairs` — no corpus broadcast), clustered with
    :func:`~vlm_eden_dataset_etl_ray.functions.graph.connected_components`
    (per-batch union-find collapse + single-worker-task or log-round label
    propagation — no driver dict of all doc ids), and isolated docs rejoin
    as self-clusters through a hash join, never a driver loop. Keep policy:
    the minimum doc id of each cluster survives.
    """
    from vlm_eden_dataset_etl_ray.functions.graph import connected_components
    from vlm_eden_dataset_etl_ray.functions.relational import hash_join

    sigs = _signature_ds(ds, id_col, text_col, num_perm, bands)

    def _star_edges(g: pa.Table) -> pa.Table:
        ids = np.sort(np.asarray(g.column(id_col).to_pylist(), dtype=np.int64))
        if len(ids) < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        rep = np.full(len(ids) - 1, ids[0], dtype=np.int64)
        return pa.table({"doc_a": pa.array(rep), "doc_b": pa.array(ids[1:])})

    # NOTE: no pre-verify pair dedup here — a star edge recurs in at most
    # ``bands`` buckets (measured ~2× at sf0.1), the verify join is dup-
    # tolerant, and connected_components is idempotent under repeated edges,
    # so skipping the extra groupby shuffle is a net win.
    edges = _coalesce(
        sigs.groupby(["band", "bucket"]).map_groups(_star_edges, batch_format="pyarrow")
        .materialize())

    ids_ds = ds.select_columns([id_col])
    if edges.count():
        prepped = _coalesce(_term_hash_sets(ds, id_col, text_col).materialize())
        nb = max(edges.num_blocks(), prepped.num_blocks())
        verified = _verify_pairs(edges, prepped, id_col, threshold, num_buckets=nb)
        labels = connected_components(
            verified.select_columns(["doc_a", "doc_b"]),
            src="doc_a", dst="doc_b",
            node_col=id_col, component_col="cluster_rep",
        )
        joined = hash_join(ids_ds.repartition(nb), labels, id_col, id_col,
                           how="left", num_buckets=nb)
    else:
        joined = ids_ds.map_batches(
            lambda t: t.append_column("cluster_rep", pa.nulls(t.num_rows, pa.int64())),
            batch_format="pyarrow",
        )

    def _finalize(t: pa.Table) -> pa.Table:
        rep = pc.coalesce(t.column("cluster_rep"), t.column(id_col))
        return pa.table({
            id_col: t.column(id_col),
            "cluster_rep": rep,
            "is_kept": pc.equal(rep, t.column(id_col)),
        })

    return joined.map_batches(_finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_fingerprints(ds: rd.Dataset, id_col: str, text_col: str) -> rd.Dataset:
    """64-bit SimHash per document (sign-sum of word-hash bit vectors)."""

    def _sim(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t.column(text_col).combine_chunks())
        hashed = s.str.split(" ").list.eval(pl.element().hash(seed=3))
        offs = np.asarray(hashed.list.len().cum_sum().to_numpy(), dtype=np.int64)
        flat = hashed.explode().to_numpy().astype(np.uint64)
        starts = np.concatenate([[0], offs[:-1]])
        bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int32)
        bits = bits * 2 - 1  # ±1
        sums = np.add.reduceat(bits, starts, axis=0) if len(flat) else np.zeros((len(starts), 64), np.int32)
        fp = (sums > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64))
        return pa.table({id_col: t.column(id_col), "simhash": pa.array(fp)})

    return ds.map_batches(_sim, batch_format="pyarrow", zero_copy_batch=True)


def hamming_pairs(
    codes: rd.Dataset,
    id_col: str,
    code_col: str,
    max_hamming: int = 3,
) -> rd.Dataset:
    """All id pairs whose 64-bit ``code_col`` values differ in at most
    ``max_hamming`` bits — the generic tail shared by SimHash text dedup
    and perceptual-hash image dedup. Pigeonhole banding: split 64 bits
    into (max_hamming+1) bands; a qualifying pair must match exactly on
    ≥1 band → groupby band value, all-pairs popcount only within a
    bucket. Returns a streaming Dataset (doc_a, doc_b, hamming); the
    cross-band dedup is a distributed min-hamming groupby, never a
    driver-side concat."""
    nbands = max_hamming + 1
    width = 64 // nbands

    def _explode(t: pa.Table) -> pa.Table:
        fp = t.column(code_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t.column(id_col)
        bands, vals, out_ids, fps = [], [], [], []
        for b in range(nbands):
            shift = np.uint64(b * width)
            mask = np.uint64((1 << width) - 1)
            v = ((fp >> shift) & mask).astype(np.int64)
            bands.extend([b] * len(v))
            vals.extend(v)
            out_ids.extend(ids.to_pylist())
            fps.extend(fp.astype(np.int64))
        return pa.table(
            {"band": pa.array(bands, pa.int32()), "val": pa.array(vals, pa.int64()),
             id_col: pa.array(out_ids), "fp": pa.array(fps, pa.int64())}
        )

    exploded = codes.map_batches(_explode, batch_format="pyarrow")

    def _bucket(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column(id_col).to_pylist(), dtype=np.int64)
        fps = np.asarray(g.column("fp").to_pylist(), dtype=np.int64).astype(np.uint64)
        order = np.argsort(ids)
        ids, fps = ids[order], fps[order]
        i, j = np.triu_indices(len(ids), k=1)
        x = fps[i] ^ fps[j]
        ham = np.zeros(len(x), dtype=np.int64)  # vectorized popcount, 8 bits at a time
        for s in range(8):
            ham += _POPCNT8[((x >> np.uint64(8 * s)) & np.uint64(0xFF)).astype(np.int64)]
        keep = ham <= max_hamming
        return pa.table({"doc_a": pa.array(ids[i][keep]), "doc_b": pa.array(ids[j][keep]),
                         "hamming": pa.array(ham[keep])})

    pairs = exploded.groupby(["band", "val"]).map_groups(_bucket, batch_format="pyarrow")
    # a pair can qualify in several bands: keep its true (minimum) hamming
    # once, via the distributed groupby — same shape as _dedup_pairs
    deduped = pairs.groupby(["doc_a", "doc_b"]).min("hamming")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_a", "doc_b", "hamming"])

    return deduped.map_batches(_rename, batch_format="pyarrow", zero_copy_batch=True)


def simhash_pairs(ds: rd.Dataset, id_col: str, text_col: str, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming — SimHash
    fingerprints fed through the generic :func:`hamming_pairs` banding."""
    sigs = simhash_fingerprints(ds, id_col, text_col)
    return hamming_pairs(sigs, id_col, "simhash", max_hamming)


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup(
    ds: rd.Dataset, id_col: str, vec_col: str, threshold: float = 0.95
) -> pa.Table:
    """Pairs with cosine ≥ threshold. Distributed row-blocks × broadcast
    normalized matrix (brute force — at 10^9 vectors swap in the IVF path
    from functions.knn; rows capped by
    :data:`QUADRATIC_BASELINE_MAX_ROWS`)."""
    rows = pa.concat_tables(
        ds.select_columns([id_col, vec_col]).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by(id_col)
    _guard_quadratic(rows.num_rows, "embedding_near_dup", "knn_ivf / knn_lsh")
    from vlm_eden_dataset_etl_ray.functions.knn import _as_matrix

    ids = rows.column(id_col).to_numpy(zero_copy_only=False)
    mat = _as_matrix(rows.column(vec_col))
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    n = len(ids)
    block = max(64, n // 64)
    items = [{"lo": lo, "hi": min(lo + block, n)} for lo in range(0, n, block)]

    def _block(batch: pa.Table) -> pa.Table:
        ids_, m = ray.get(ref)
        a_, b_, c_ = [], [], []
        for row in batch.to_pylist():
            lo, hi = row["lo"], row["hi"]
            sims = m[lo:hi] @ m.T  # (block, n)
            for k in range(hi - lo):
                i = lo + k
                js = np.nonzero(sims[k, i + 1:] >= threshold)[0] + i + 1
                for j in js:
                    a_.append(int(ids_[i])); b_.append(int(ids_[j]))
                    c_.append(round(float(sims[k, j]), 4))
        return pa.table({"vec_a": pa.array(a_, pa.int64()), "vec_b": pa.array(b_, pa.int64()),
                         "cosine": pa.array(c_, pa.float64())})

    res = rd.from_items(items).repartition(len(items)).map_batches(
        _block, batch_size=1, batch_format="pyarrow"
    )
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow", batch_size=None))


def embedding_near_dup_bucketed(
    ds: rd.Dataset,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_clusters: int = 16,
    n_probe: int = 2,
    sample_frac: float = 0.25,
    max_cell: int = 200_000,
    seed: int = 5,
) -> rd.Dataset:
    """Embedding near-duplicate pairs at scale: the IVF-bucketed path that
    replaces :func:`embedding_near_dup`'s O(n²) broadcast baseline.

    Each vector is assigned to its ``n_probe`` nearest coarse cells
    (multi-assignment: a pair is found when the two vectors share ANY
    cell — near-dups are nearly identical vectors, so their top cells
    almost always coincide; recall is asserted against brute force in
    pytest). Within-cell comparison is one vectorized matmul per cell
    group; duplicate pairs discovered via different probes collapse in a
    distinct-pair groupby. Approximate by construction (recall < 1.0);
    cost drops from O(n²) to O(Σ cell²) with cells ~n·probe/k.

    A cell larger than ``max_cell`` raises: at that point raise
    ``n_clusters`` (cells shrink ~linearly) rather than letting one task
    go quadratic — the same documented lever as minhash's ``max_bucket``."""
    from vlm_eden_dataset_etl_ray.functions.knn import (
        _as_matrix, _normalize, kmeans_lite)

    sample = _as_matrix(
        pa.concat_tables(
            ds.random_sample(sample_frac, seed=seed)
            .select_columns([vec_col])
            .iter_batches(batch_format="pyarrow", batch_size=None)
        ).column(vec_col))
    cents = kmeans_lite(sample, n_clusters, seed=seed)
    cents_ref = ray.put(cents)

    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = _normalize(_as_matrix(t.column(vec_col)))
        sims = m @ c.T  # (n, k)
        probes = np.argsort(-sims, axis=1)[:, :n_probe]  # top cells per row
        n = len(m)
        idx = np.repeat(np.arange(n), n_probe)
        return pa.table({
            "cell": pa.array(probes.ravel().astype(np.int64)),
            id_col: t.column(id_col).take(pa.array(idx)),
            vec_col: t.column(vec_col).take(pa.array(idx)),
        })

    assigned = ds.select_columns([id_col, vec_col]).map_batches(
        _assign, batch_format="pyarrow", zero_copy_batch=True)

    def _cell_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows > max_cell:
            raise ValueError(
                f"embedding_near_dup_bucketed: cell of {g.num_rows} rows "
                f"exceeds max_cell={max_cell}; raise n_clusters")
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        m = _normalize(_as_matrix(g.column(vec_col)))
        sims = m @ m.T
        iu, ju = np.nonzero(np.triu(sims >= threshold, k=1))
        a, b = ids[iu], ids[ju]
        swap = a > b  # canonical (min, max) ordering regardless of cell order
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table({
            "vec_a": pa.array(a2, pa.int64()),
            "vec_b": pa.array(b2, pa.int64()),
            "cosine": pa.array(np.round(sims[iu, ju], 4), pa.float64()),
        })

    cand = assigned.groupby("cell").map_groups(
        _cell_pairs, batch_format="pyarrow")
    # a pair found via two different shared cells appears twice — collapse
    return (cand.groupby(["vec_a", "vec_b"])
            .min("cosine")
            .map_batches(
                lambda t: t.rename_columns(["vec_a", "vec_b", "cosine"]),
                batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Span-level (line-level) exact dedup, C4/CCNet style.
# ---------------------------------------------------------------------------


def span_dedup(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 16,
    sep: str = " ",
) -> rd.Dataset:
    """Sub-document exact dedup, the C4 recipe (Raffel et al. 2020,
    arXiv:1910.10683 — "discard all but one of any three-sentence span
    occurring more than once"; CCNet does the same per paragraph hash):
    split every document into fixed non-overlapping ``span_words``-word
    spans, keep only each distinct span's GLOBALLY FIRST occurrence
    (ordered by ``(id_col, span position)``), and reassemble the surviving
    spans into the cleaned document. Documents whose every span was seen
    earlier vanish from the output.

    Shape — three streaming stages, no driver state:

    1. explode to ``(id, span_no, span_text)`` — per-batch vectorized
       flat-map (:func:`..text.chunk_documents` with ``overlap=0``);
    2. global keep-first per span — two-stage top-1 keyed on the span
       STRING itself (exact; no hash-collision risk), one shuffle whose
       payload is the spans, never the original documents;
    3. reassemble — ordered string-agg per document, second shuffle on
       the document id.

    At 100 TB the shuffle key (short span text) is fine-grained and
    uniform, so no salting is needed; stage 2's per-batch pre-reduce bounds
    what a hot span (boilerplate) ships to one row per batch.
    """
    from vlm_eden_dataset_etl_ray.functions.relational import (
        string_agg_ordered,
        top1_per_key,
    )
    from vlm_eden_dataset_etl_ray.functions.text import chunk_documents

    spans = chunk_documents(
        ds, id_col=id_col, text_col=text_col,
        chunk_tokens=span_words, overlap=0, sep=sep)
    kept = top1_per_key(
        spans, "chunk_text",
        [(id_col, "ascending"), ("chunk_id", "ascending")])
    return string_agg_ordered(
        kept, id_col, "chunk_text",
        [("chunk_id", "ascending")], alias=text_col, sep=sep)


def semdedup(
    ds: rd.Dataset,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_clusters: int = 16,
    sample_frac: float = 0.25,
    max_cluster: int = 100_000,
    keep: str = "min_id",
    seed: int = 5,
) -> rd.Dataset:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): k-means-partition the embedding space, then within
    each cluster drop every row whose cosine similarity to any EARLIER row
    (in the keep-policy's rank order) reaches ``threshold`` — the paper's
    triangular rule, which collapses whole chains (a~b, b~c drops both b
    and c) and vectorizes completely. Returns (id, cluster, keep) — filter
    on ``keep`` to materialize the survivor set.

    Scale shape: the k-means fit is the existing streamed-partials
    :func:`..knn.kmeans_fit` (driver holds O(k·d)); assignment is one
    broadcast matmul per batch; the dedup itself is ONE groupby(cluster)
    exchange carrying (id, vector) — within a cluster the O(c²) similarity
    matrix is bounded by ``max_cluster`` (raise ``n_clusters`` for bigger
    corpora; an oversized cluster raises rather than OOMing a worker).
    Unlike :func:`embedding_near_dup_bucketed` (multi-probe PAIR discovery,
    recall across cell boundaries), SemDeDup is single-assignment by
    design — the paper's trade: cross-cluster near-dups survive, in
    exchange for a strictly partitioned, embarrassingly parallel prune.

    ``keep``: "min_id" keeps the lexicographically-smallest id of every
    duplicate group (deterministic, oracle-friendly); "far_from_centroid"
    keeps the group's lowest-similarity-to-centroid row (the paper's
    choice — retains the least prototypical exemplar).
    """
    if keep not in ("min_id", "far_from_centroid"):
        raise ValueError(f"unknown keep policy {keep!r}")
    from vlm_eden_dataset_etl_ray.functions.knn import (_as_matrix,
                                                        kmeans_assign,
                                                        kmeans_fit)

    cents = kmeans_fit(ds.select_columns([id_col, vec_col]), vec_col,
                       n_clusters=n_clusters, sample_frac=sample_frac,
                       seed=seed)
    cents_n = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    assigned = kmeans_assign(ds.select_columns([id_col, vec_col]), cents,
                             vec_col=vec_col, out_col="cluster")

    def prune(group: pa.Table, *, thr=threshold, cap=max_cluster,
              pol=keep, cn=cents_n) -> pa.Table:
        c = group.num_rows
        if c > cap:
            raise ValueError(
                f"semdedup cluster of {c} rows exceeds max_cluster={cap}; "
                "raise n_clusters (finer partition) or max_cluster")
        ids = group.column(id_col)
        order = pc.sort_indices(ids)
        m = _as_matrix(group.column(vec_col).take(order)).astype(np.float32)
        ids = ids.take(order)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        if pol == "far_from_centroid":
            # rank ascending by centroid similarity: each duplicate group's
            # least-prototypical row comes first and is the one kept; row
            # position (= id order) breaks ties deterministically
            cid = int(group.column("cluster")[0].as_py())
            cs = m @ cn[cid].astype(np.float32)
            rank = np.lexsort((np.arange(c), cs))
        else:
            rank = np.arange(c)  # already id-sorted
        mr = m[rank]
        # the paper's triangular rule, vectorized: drop row i (in rank
        # order) iff ANY earlier row has cosine ≥ threshold. Row blocks of
        # the (c, c) similarity never materialize more than (B, c).
        best = np.full(c, -np.inf, dtype=np.float32)
        B = 512
        for s in range(0, c, B):
            e = min(s + B, c)
            block = mr[s:e] @ mr.T  # (e-s, c)
            if e < c:  # columns i ≥ e: every row j in [s, e) has j < i
                np.maximum(best[e:], block[:, e:].max(axis=0), out=best[e:])
            tri = block[:, s:e]  # columns s ≤ i < e: rows j < i only
            np.maximum(
                best[s:e],
                np.where(np.tri(e - s, e - s, -1, dtype=bool).T,
                         tri, -np.inf).max(axis=0),
                out=best[s:e])
        kept_rank = best < thr
        kept_mask = np.empty(c, dtype=bool)
        kept_mask[rank] = kept_rank
        return pa.table({
            id_col: ids,
            "cluster": group.column("cluster").take(order),
            "keep": pa.array(kept_mask),
        })

    return assigned.groupby("cluster").map_groups(
        prune, batch_format="pyarrow")
