"""fuzzy_all_pairs (PassJoin segment-pigeonhole self-join) vs brute force."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.fuzzy import (fuzzy_all_pairs,
                                                      levenshtein_batch)


def _brute(values, k):
    vals = sorted({v for v in values if v is not None})
    pairs = []
    a_l, b_l = [], []
    for x in range(len(vals)):
        for y in range(x + 1, len(vals)):
            a_l.append(vals[x]); b_l.append(vals[y])
    d = levenshtein_batch(a_l, b_l)
    for a, b, dd in zip(a_l, b_l, d):
        if dd <= k:
            pairs.append((a, b, int(dd)))
    return sorted(pairs)


def _run(values, k, **kw):
    ds = rd.from_arrow(pa.table({"v": pa.array(values, pa.string())}))
    out = pa.concat_tables(
        fuzzy_all_pairs(ds.repartition(3), "v", k, **kw).iter_batches(
            batch_format="pyarrow", batch_size=None))
    return sorted(zip(out.column("value_a").to_pylist(),
                      out.column("value_b").to_pylist(),
                      out.column("dist").to_pylist()))


def _random_vocab(rng, n=60, alpha="abcd", max_len=9):
    base = ["".join(rng.choice(list(alpha), size=rng.integers(0, max_len + 1)))
            for _ in range(n)]
    return base


@pytest.mark.parametrize("k", [1, 2, 3])
def test_matches_bruteforce_randomized(k):
    rng = np.random.default_rng(11 + k)
    vals = _random_vocab(rng)
    # duplicates in the input must not duplicate output pairs
    vals = vals + vals[:10]
    assert _run(vals, k) == _brute(vals, k)


def test_short_and_empty_strings():
    vals = ["", "a", "ab", "b", "abc", "abcd", "xyz"]
    for k in (1, 2):
        assert _run(vals, k) == _brute(vals, k)


def test_unicode_and_typos():
    vals = ["café", "cafe", "caffé", "naïve", "naive", "internationalization",
            "internationalisation", "internationalizatio"]
    assert _run(vals, 1) == _brute(vals, 1)
    assert _run(vals, 2) == _brute(vals, 2)


def test_each_pair_emitted_once_and_nulls_ignored():
    vals = ["hello", "hallo", "hella", None, "hello"]
    got = _run(vals, 1)
    assert len(got) == len(set(got)) == len(_brute(vals, 1))


def test_max_bucket_guard():
    vals = [f"aaaa{i:02d}" for i in range(40)]  # shared segment 'aaaa'-ish
    with pytest.raises(Exception, match="max_bucket"):
        _run(vals, 2, max_bucket=10)
    with pytest.raises(ValueError, match="max_dist"):
        _run(vals, 0)
