"""prefix_jaccard_pairs: EXACT set-similarity self-join via AllPairs/
PPJoin prefix filtering — must equal the quadratic oracle baseline
pair-for-pair (it is exact, unlike MinHash banding)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.dedup import (
    ngram_jaccard_pairs, prefix_jaccard_pairs)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
         "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi", "rho",
         "sigma", "tau", "ups"]


def _corpus(n=60, seed=7):
    """Docs in near-dup families: family base text + 0-2 word swaps, plus
    singletons, an empty doc, and an exact duplicate pair."""
    rng = np.random.default_rng(seed)
    texts, ids = [], []
    for i in range(n):
        fam = i // 4
        base = [WORDS[(fam * 3 + j) % len(WORDS)] for j in range(12)]
        for _ in range(i % 3):  # 0..2 swaps within the family
            base[rng.integers(0, 12)] = WORDS[rng.integers(0, len(WORDS))]
        texts.append(" ".join(base))
        ids.append(i)
    texts[n - 1] = texts[n - 2]          # exact duplicate
    texts[n - 3] = ""                    # empty doc
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts)})


def _collect(ds) -> pa.Table:
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
    return t.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


@pytest.mark.parametrize("order", ["hash", "frequency"])
@pytest.mark.parametrize("threshold", [0.5, 0.8, 1.0])
def test_matches_quadratic_baseline(order, threshold):
    corpus = _corpus()
    base = ngram_jaccard_pairs(
        rd.from_arrow(corpus), "doc_id", "text", threshold).sort_by(
        [("doc_a", "ascending"), ("doc_b", "ascending")])
    got = _collect(prefix_jaccard_pairs(
        rd.from_arrow(corpus), "doc_id", "text", threshold, order=order))
    assert got.equals(base), (threshold, order, got.num_rows, base.num_rows)
    assert base.num_rows > 0  # families actually produce pairs


def test_ngram_shingles_and_exact_dup():
    corpus = _corpus()
    base = ngram_jaccard_pairs(
        rd.from_arrow(corpus), "doc_id", "text", 0.7, ngram=2).sort_by(
        [("doc_a", "ascending"), ("doc_b", "ascending")])
    got = _collect(prefix_jaccard_pairs(
        rd.from_arrow(corpus), "doc_id", "text", 0.7, ngram=2))
    assert got.equals(base)
    # the planted exact duplicate survives at tau=1.0
    exact = _collect(prefix_jaccard_pairs(
        rd.from_arrow(corpus), "doc_id", "text", 1.0))
    pairs = set(zip(exact.column("doc_a").to_pylist(),
                    exact.column("doc_b").to_pylist()))
    assert (58, 59) in pairs


def test_bad_order_raises():
    with pytest.raises(ValueError, match="order"):
        prefix_jaccard_pairs(rd.from_arrow(_corpus()), "doc_id", "text",
                             0.8, order="zipf")
