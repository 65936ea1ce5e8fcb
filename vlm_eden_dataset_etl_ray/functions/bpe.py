"""Byte-pair-encoding tokenizer training and application.

Reference parity: the reference consumes PRE-tokenized sequences (its
`documents.tokens` arrays arrive already encoded); this module carries the
step that produces such arrays — training a subword vocabulary over the raw
corpus and encoding documents with it (Sennrich et al. 2016,
arXiv:1508.07909).

Scale shape (the part that matters at 100 TB): BPE training does NOT need
the corpus — it needs the WORD-FREQUENCY table, which is vocabulary-sized.
So the distributed work is exactly one mergeable grouped count over
exploded words; the merge-selection loop then runs driver-side over that
tiny table (the same split every production tokenizer trainer uses).
Encoding streams: a stateful actor pool holds the merge ranks and a
word→pieces cache, and each batch encodes only its DISTINCT words.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

#: end-of-word sentinel (word-internal BPE, merges never cross words)
_EOW = "</w>"


def _word_counts(ds: rd.Dataset, text_col: str, sep: str) -> list[tuple[str, int]]:
    import polars as pl

    from .relational import grouped_count

    def _explode(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t.column(text_col).combine_chunks())
        w = s.str.split(sep).explode().drop_nulls()
        return pa.table({"word": w.to_arrow().cast(pa.string())})

    counts = pa.concat_tables(
        grouped_count(
            ds.select_columns([text_col]).map_batches(
                _explode, batch_format="pyarrow", zero_copy_batch=True),
            ["word"], alias="c", cardinality="high",
        ).iter_batches(batch_format="pyarrow", batch_size=None))
    return list(zip(counts.column("word").to_pylist(),
                    counts.column("c").to_pylist()))


def bpe_train(
    ds: rd.Dataset,
    text_col: str = "text",
    n_merges: int = 100,
    sep: str = " ",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges over the corpus. Returns the ordered
    merge list (rank = position). Deterministic: ties on pair frequency
    break lexicographically, so any block/batch layout learns the same
    vocabulary."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, c in _word_counts(ds, text_col, sep):
        if word:
            vocab[tuple(word) + (_EOW,)] = \
                vocab.get(tuple(word) + (_EOW,), 0) + c

    # driver-side Sennrich loop over the vocabulary-sized table
    pair_counts: dict[tuple[str, str], int] = {}
    for sym, c in vocab.items():
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        top = max(pair_counts.values())
        # smallest-lexicographic pair among the most frequent: the
        # conventional deterministic tie-break
        best = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best)
        new_vocab: dict[tuple[str, ...], int] = {}
        a, b = best
        ab = a + b
        for sym, c in vocab.items():
            out = []
            i = 0
            changed = False
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                    changed = True
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
            if changed:
                # update pair counts incrementally: remove old, add new
                for i in range(len(sym) - 1):
                    p = (sym[i], sym[i + 1])
                    pair_counts[p] -= c
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                for i in range(len(t) - 1):
                    p = (t[i], t[i + 1])
                    pair_counts[p] = pair_counts.get(p, 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class BpeEncoder:
    """Actor-pool encoding stage: merge ranks built once per actor in
    ``__init__``; each batch encodes only its DISTINCT words (cached
    across batches — natural-language word frequency makes the cache hit
    rate extreme). The cache is BOUNDED: web-scale text has an unbounded
    long tail of distinct "words" (typos, unicode junk, hashes), so an
    uncapped dict grows without limit per actor. At ``max_cache_words``
    the whole cache is dropped — hot words repopulate within one batch,
    and the flush is O(1) amortized vs LRU's per-hit bookkeeping."""

    def __init__(self, merges: list[tuple[str, str]], text_col: str = "text",
                 sep: str = " ", alias: str = "bpe_tokens",
                 max_cache_words: int = 1_000_000):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.text_col = text_col
        self.sep = sep
        self.alias = alias
        self.max_cache_words = max(1, int(max_cache_words))
        self.cache: dict[str, list[str]] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        out = []
        for txt in texts:
            if txt is None:
                out.append(None)
                continue
            pieces: list[str] = []
            for w in txt.split(self.sep):
                if not w:
                    continue
                enc = self.cache.get(w)
                if enc is None:
                    enc = _encode_word(w, self.ranks)
                    if len(self.cache) >= self.max_cache_words:
                        self.cache.clear()
                    self.cache[w] = enc
                pieces.extend(enc)
            out.append(pieces)
        return t.append_column(
            self.alias, pa.array(out, pa.list_(pa.string())))


def bpe_encode(
    ds: rd.Dataset,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    sep: str = " ",
    alias: str = "bpe_tokens",
    concurrency=(1, 8),
    max_cache_words: int = 1_000_000,
) -> rd.Dataset:
    return ds.map_batches(
        BpeEncoder, fn_constructor_kwargs={
            "merges": merges, "text_col": text_col, "sep": sep,
            "alias": alias, "max_cache_words": max_cache_words},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)
