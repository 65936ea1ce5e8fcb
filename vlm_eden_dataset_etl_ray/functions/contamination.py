"""Benchmark decontamination: flag documents sharing any word n-gram with a
benchmark/eval set (the standard training-data hygiene step — e.g. 8-gram
overlap against held-out test sets).

Scale shape: the benchmark side is SMALL by nature (eval sets are thousands
of documents), so its n-gram hash set is built once, sorted, and broadcast
via ``ray.put`` — every task binary-searches against the shared object, no
shuffle. The corpus side streams: one vectorized pass per batch (polars word
explode → uint64 word hashes → rolling n-gram combine → ``np.isin``).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

import ray
import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.hashing import hash_strings

# odd multiplier for the rolling positional combine (splitmix64 constant)
_P = np.uint64(0x9E3779B97F4A7C15)


def _word_table(texts: pa.Array | pa.ChunkedArray, sep: str) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, word_hash) arrays for all words of all rows, row-major."""
    s = pl.from_arrow(texts if isinstance(texts, pa.Array) else texts.combine_chunks())
    df = pl.DataFrame({"row": np.arange(len(s), dtype=np.int64), "w": s.str.split(sep)})
    ex = df.explode("w")
    rows = ex.get_column("row").to_numpy()
    hashes = hash_strings(ex.get_column("w").to_arrow())
    return rows, hashes


def _ngram_hashes(rows: np.ndarray, hashes: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling n-gram hashes over the exploded word table. A window is valid
    only if its n words belong to one row. Returns (window_row, window_hash)."""
    if len(hashes) < n:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    m = len(hashes) - n + 1
    combined = np.zeros(m, dtype=np.uint64)
    mult = np.uint64(1)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash design
        for j in range(n):  # n vectorized passes, not a per-row loop
            combined += hashes[j:j + m] * mult
            mult = mult * _P
    valid = rows[:m] == rows[n - 1:]
    return rows[:m][valid], combined[valid]


def benchmark_ngram_set(
    texts: pa.Array | pa.ChunkedArray | list[str], n: int = 8, sep: str = " ",
) -> np.ndarray:
    """Sorted unique uint64 n-gram hashes of the (small) benchmark corpus."""
    if isinstance(texts, list):
        texts = pa.array(texts, type=pa.string())
    rows, hashes = _word_table(texts, sep)
    _, grams = _ngram_hashes(rows, hashes, n)
    return np.unique(grams)


def flag_contaminated(
    ds: rd.Dataset,
    benchmark: np.ndarray,
    text_col: str = "text",
    n: int = 8,
    sep: str = " ",
    alias: str = "contaminated",
) -> rd.Dataset:
    """Add a bool column: does the document share ≥1 word n-gram with the
    benchmark set? ``benchmark`` is the sorted hash array from
    :func:`benchmark_ngram_set` (broadcast once via ``ray.put``)."""
    ref = ray.put(np.asarray(benchmark, dtype=np.uint64))

    def _flag(t: pa.Table, *, bench_ref) -> pa.Table:
        bench = ray.get(bench_ref)  # zero-copy shared-memory read per task
        rows, hashes = _word_table(t.column(text_col), sep)
        wrow, whash = _ngram_hashes(rows, hashes, n)
        flags = np.zeros(t.num_rows, dtype=bool)
        if len(whash):
            hit_rows = wrow[np.isin(whash, bench)]
            flags[np.unique(hit_rows)] = True
        return t.append_column(alias, pa.array(flags))

    # stateless tasks: no actor-pool ramp; the broadcast array is a plasma
    # object read zero-copy by every task
    return ds.map_batches(_flag, batch_format="pyarrow", zero_copy_batch=True,
                          fn_kwargs={"bench_ref": ref})


def decontaminate(
    ds: rd.Dataset,
    benchmark: np.ndarray,
    text_col: str = "text",
    n: int = 8,
    sep: str = " ",
) -> rd.Dataset:
    """Drop contaminated documents (filter form of :func:`flag_contaminated`)."""
    flagged = flag_contaminated(ds, benchmark, text_col, n, sep, alias="__contam")

    def _drop(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.invert(t.column("__contam"))).drop_columns(["__contam"])

    return flagged.map_batches(_drop, batch_format="pyarrow", zero_copy_batch=True)


def frequent_ngrams(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 3,
    sep: str = " ",
) -> rd.Dataset:
    """Corpus-wide repeated-passage detection: every word ``n``-gram (as
    TEXT, not a hash) that occurs in at least ``min_docs`` distinct
    documents, with its document frequency — the discovery side of
    boilerplate removal (find the hot passages first, then strip or
    down-weight the documents carrying them).

    Scale shape: each batch emits its DISTINCT (doc, gram) pairs — a
    document lives entirely inside one row, so per-batch distinct IS global
    distinct — then one high-cardinality mergeable grouped count on the
    gram string and a streamed threshold filter. Only distinct grams cross
    the exchange; the quadratic all-pairs shape never appears."""
    import polars as pl

    from vlm_eden_dataset_etl_ray.functions.relational import grouped_count

    def _grams(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        s = pl.from_arrow(
            texts if isinstance(texts, pa.Array) else texts.combine_chunks())
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        ex = (
            pl.DataFrame({"doc": np.repeat(ids, 1), "w": s.str.split(sep)})
            .explode("w")
        )
        # rolling n-gram strings: concat of the next n words, valid only
        # where all n words belong to one document (rows are doc-major)
        doc = ex.get_column("doc")
        parts = [ex.get_column("w").shift(-j) for j in range(n)]
        gram = parts[0]
        for p in parts[1:]:
            gram = gram + sep + p
        valid = (doc.shift(-(n - 1)) == doc).fill_null(False)
        out = (
            pl.DataFrame({"doc": doc, "gram": gram})
            .filter(valid)
            .unique(subset=["doc", "gram"])
        )
        return pa.table({"doc": out.get_column("doc").to_arrow(),
                         "gram": out.get_column("gram").to_arrow()
                         .cast(pa.string())})

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        _grams, batch_format="pyarrow", zero_copy_batch=True)
    counts = grouped_count(pairs.select_columns(["gram"]), ["gram"],
                           alias="n_docs", cardinality="high")

    def _thresh(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.greater_equal(t.column("n_docs"),
                                         pa.scalar(min_docs, pa.int64())))

    return counts.map_batches(_thresh, batch_format="pyarrow",
                              zero_copy_batch=True)
