"""Round-3 additions: quota / temperature sampling, repetition metrics,
frequent n-grams, and the tar-shard training sink."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.contamination import frequent_ngrams
from vlm_eden_dataset_etl_ray.functions.sampling import (
    quota_sample, temperature_rates, temperature_resample)
from vlm_eden_dataset_etl_ray.functions.text import repetition_stats
from vlm_eden_dataset_etl_ray.sinks.tar_shards import (
    read_tar_shards, write_tar_shards)


def _docs(n=200, langs=("en",) * 6 + ("de", "fr")):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array([langs[i % len(langs)] for i in range(n)]),
        "text": pa.array([f"w{i % 7} w{(i + 1) % 5} w{i % 7} end" for i in range(n)]),
    })


def _collect(ds):
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(batches) if batches else pa.table({})


def test_quota_cap_and_determinism():
    t = _docs()
    ds = rd.from_arrow(t).repartition(7)
    out = _collect(quota_sample(ds, "lang", "doc_id", cap=10, seed=1))
    import collections
    by_lang = collections.Counter(out.column("lang").to_pylist())
    assert all(v <= 10 for v in by_lang.values())
    assert by_lang["de"] == 10 and by_lang["fr"] == 10  # 25 available each
    # reshard-stable: different partitioning, identical selection
    out2 = _collect(quota_sample(rd.from_arrow(t).repartition(2),
                                 "lang", "doc_id", cap=10, seed=1))
    assert sorted(out.column("doc_id").to_pylist()) == \
        sorted(out2.column("doc_id").to_pylist())
    # different seed → different selection (overwhelmingly likely)
    out3 = _collect(quota_sample(ds, "lang", "doc_id", cap=10, seed=2))
    assert sorted(out.column("doc_id").to_pylist()) != \
        sorted(out3.column("doc_id").to_pylist())


def test_temperature_rates_shape():
    rates = temperature_rates({"en": 900, "de": 100, "fr": 25}, alpha=0.5)
    assert rates["fr"] == 1.0  # rarest group is never downsampled
    assert rates["fr"] > rates["de"] > rates["en"]
    # alpha=1 → no resampling at all
    flat = temperature_rates({"en": 900, "de": 100}, alpha=1.0)
    assert flat == {"en": 1.0, "de": 1.0}


def test_temperature_resample_flattens():
    t = _docs(800)
    out = _collect(temperature_resample(
        rd.from_arrow(t), "lang", "doc_id", alpha=0.5, seed=0))
    import collections
    before = collections.Counter(t.column("lang").to_pylist())
    after = collections.Counter(out.column("lang").to_pylist())
    # dominant group's share must shrink toward the flat distribution
    assert after["en"] / len(out) < before["en"] / len(t)
    # rarest groups kept in full (rate 1.0)
    assert after["de"] == before["de"] and after["fr"] == before["fr"]


def test_repetition_stats_values():
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b a b a b",   # "a b" 3x of 5 bigrams
                          "x y z w",        # all bigrams unique
                          "q"]),            # shorter than any n-gram
    })
    out = _collect(repetition_stats(rd.from_arrow(t))).sort_by("doc_id")
    top2 = out.column("top2gram_frac").to_pylist()
    dup2 = out.column("dup2gram_frac").to_pylist()
    assert abs(top2[0] - 3 / 5) < 1e-12 and abs(dup2[0] - 3 / 5) < 1e-12
    assert top2[1] == 1 / 3 and dup2[1] == 0.0
    assert top2[2] == 0.0 and dup2[2] == 0.0


def test_frequent_ngrams_threshold():
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["the quick brown fox jumps",
                          "the quick brown fox sleeps",
                          "the quick brown fox swims",
                          "a different sentence entirely here"]),
    })
    out = _collect(frequent_ngrams(rd.from_arrow(t), n=4, min_docs=3))
    got = dict(zip(out.column("gram").to_pylist(),
                   out.column("n_docs").to_pylist()))
    assert got == {"the quick brown fox": 3}
    # within-doc repeats count once per doc
    t2 = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                   "text": pa.array(["p q p q p q", "p q p q"])})
    out2 = _collect(frequent_ngrams(rd.from_arrow(t2), n=2, min_docs=2))
    got2 = dict(zip(out2.column("gram").to_pylist(),
                    out2.column("n_docs").to_pylist()))
    assert got2["p q"] == 2


def test_tar_shard_roundtrip_with_binary(tmp_path):
    out_dir = str(tmp_path / "shards")
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["hello", "wörld", ""]),
        "blob": pa.array([b"\x00\x01", b"", None], pa.binary()),
    })
    meta = write_tar_shards(rd.from_arrow(t), out_dir, "doc_id",
                            {"text": "txt", "blob": "bin"}, rows_per_shard=2)
    assert meta.num_rows >= 1
    assert int(pa.compute.sum(meta.column("n_members")).as_py()) == 3
    back = _collect(read_tar_shards(out_dir, {"txt": "text"}))
    back = back.sort_by("key")
    assert back.column("key").to_pylist() == ["0", "1", "2"]
    assert back.column("text").to_pylist() == ["hello", "wörld", ""]


def test_tar_shard_names_are_content_derived(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    t = pa.table({"doc_id": pa.array([5, 6], pa.int64()),
                  "text": pa.array(["x", "y"])})
    m1 = write_tar_shards(rd.from_arrow(t), a, "doc_id", {"text": "txt"})
    m2 = write_tar_shards(rd.from_arrow(t), b, "doc_id", {"text": "txt"})
    import os
    assert [os.path.basename(p) for p in m1.column("path").to_pylist()] == \
        [os.path.basename(p) for p in m2.column("path").to_pylist()]


def test_trailing_time_count_peers_and_units():
    from vlm_eden_dataset_etl_ray.functions.windows import trailing_time_count
    # second-precision input (unit normalization) with duplicate timestamps
    ts = pa.array([0, 10, 10, 3600, 3620, 7300], pa.timestamp("s"))
    t = pa.table({"k": pa.array([1] * 6, pa.int64()), "ts": ts,
                  "eid": pa.array(range(6), pa.int64())})
    out = _collect(trailing_time_count(rd.from_arrow(t), "k", "ts", 3600))
    got = dict(zip(out.column("eid").to_pylist(),
                   out.column("n_trailing").to_pylist()))
    # peers at t=10 see each other (SQL RANGE frame semantics)
    assert got[1] == 3 and got[2] == 3
    assert got[0] == 1
    assert got[3] == 4          # 0,10,10,3600 within [0, 3600]
    assert got[4] == 2          # only 3600,3620 within [20, 3620]
    assert got[5] == 1          # only 7300 within [3700, 7300]


def test_regex_extract_non_matching_is_null():
    from vlm_eden_dataset_etl_ray.functions.text import regex_extract
    t = pa.table({"text": pa.array(["one two three", "single", None])})
    out = _collect(regex_extract(rd.from_arrow(t), "text",
                                 r"^(\S+) (\S+)", 2, "w2"))
    assert out.column("w2").to_pylist() == ["two", None, None]


def test_embedding_near_dup_bucketed_recall():
    from vlm_eden_dataset_etl_ray.functions.dedup import (
        embedding_near_dup, embedding_near_dup_bucketed)
    rng = np.random.default_rng(0)
    base = rng.normal(size=(120, 16))
    # 30 near-dup twins: tiny perturbations of the first 30 vectors
    twins = base[:30] + rng.normal(scale=0.01, size=(30, 16))
    mat = np.vstack([base, twins])
    t = pa.table({"vec_id": pa.array(range(len(mat)), pa.int64()),
                  "embedding": pa.array(list(mat), pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(4)
    exact = embedding_near_dup(ds, "vec_id", "embedding", 0.95)
    approx = _collect(embedding_near_dup_bucketed(
        rd.from_arrow(t).repartition(4), "vec_id", "embedding", 0.95,
        n_clusters=6, n_probe=3, sample_frac=1.0))
    exact_pairs = set(zip(exact.column("vec_a").to_pylist(),
                          exact.column("vec_b").to_pylist()))
    approx_pairs = set(zip(approx.column("vec_a").to_pylist(),
                           approx.column("vec_b").to_pylist()))
    assert len(exact_pairs) >= 25  # the construction produced real pairs
    assert approx_pairs <= exact_pairs  # no false positives (exact cosine)
    recall = len(approx_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, recall


def test_winsorize_clips_both_tails():
    from vlm_eden_dataset_etl_ray.functions.windows import winsorize
    vals = list(range(1, 101))  # 1..100
    t = pa.table({"id": pa.array(range(100), pa.int64()),
                  "v": pa.array([float(x) for x in vals])})
    out = _collect(winsorize(rd.from_arrow(t).repartition(5), "v",
                             0.05, 0.95, tiebreak="id", alias="w"))
    w = out.column("w").to_pylist()
    assert min(w) == 5.0 and max(w) == 95.0  # quantile_disc cut points
    assert sorted(w)[50] == sorted(vals)[50]  # interior untouched


def test_unigram_fit_apply_and_oov():
    import pytest as _pytest
    from vlm_eden_dataset_etl_ray.functions.text import (
        unigram_fit, unigram_logprob_score, unigram_score)
    train = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(["a a a b", "a b b c"])})
    scored = _collect(unigram_logprob_score(rd.from_arrow(train)))
    s = dict(zip(scored.column("doc_id").to_pylist(),
                 scored.column("logprob_score").to_pylist()))
    # doc 1 carries the rarer tokens -> higher surprise
    assert s[1] > s[0] > 0
    # cross-corpus: OOV raises without a policy, scores with one
    vocab = unigram_fit(rd.from_arrow(train))
    other = rd.from_arrow(pa.table({"doc_id": pa.array([9], pa.int64()),
                                    "text": pa.array(["zzz qqq"])}))
    with _pytest.raises(Exception):
        _collect(unigram_score(other, vocab))
    got = _collect(unigram_score(
        rd.from_arrow(pa.table({"doc_id": pa.array([9], pa.int64()),
                                "text": pa.array(["zzz qqq"])})),
        vocab, oov_logp=10.0))
    assert got.column("logprob_score").to_pylist() == [10.0]


def test_zscore_constant_group_is_null():
    from vlm_eden_dataset_etl_ray.functions.relational import zscore_normalize
    t = pa.table({"k": pa.array([1, 1, 1, 2, 2], pa.int64()),
                  "v": pa.array([2.0, 4.0, 6.0, 5.0, 5.0])})
    out = _collect(zscore_normalize(rd.from_arrow(t), "k", "v")).sort_by(
        [("k", "ascending"), ("v", "ascending")])
    z = out.column("zscore").to_pylist()
    # group 1: mean 4, stddev_pop sqrt(8/3)
    import math
    sd = math.sqrt(8 / 3)
    assert abs(z[0] - round(-2 / sd, 4)) < 1e-9
    assert abs(z[2] - round(2 / sd, 4)) < 1e-9
    # constant group → null, not inf
    assert z[3] is None and z[4] is None


def test_dsir_score_prefers_target_like_docs():
    from vlm_eden_dataset_etl_ray.functions.text import dsir_score
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "lang": pa.array(["en", "en", "zh"]),
        "text": pa.array(["alpha beta alpha", "alpha beta beta",
                          "zeta eta zeta eta"]),
    })
    ds = rd.from_arrow(docs)
    target = ds.filter(expr="lang == 'en'")
    out = _collect(dsir_score(ds, target)).sort_by("doc_id")
    s = out.column("dsir_score").to_pylist()
    # en docs: every token more frequent in target than corpus -> positive
    assert s[0] > 0 and s[1] > 0
    # zh doc: tokens absent from target -> OOV penalty -> strongly negative
    assert s[2] < 0
    # score = mean(ln p_t - ln p_c); check doc 0 by hand:
    import math
    # target tokens: alpha x3, beta x3 (n=6); corpus adds zeta/eta (n=10)
    exp0 = (2 * (math.log(3 / 6) - math.log(3 / 10))
            + (math.log(3 / 6) - math.log(3 / 10))) / 3
    assert abs(s[0] - round(exp0, 4)) < 1e-9
