"""BPE tokenizer training/encoding: determinism, serial-oracle equivalence,
encode/train consistency."""

import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.bpe import (
    _EOW, BpeEncoder, bpe_encode, bpe_train)


def _collect(ds):
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None))


def _serial_train(word_counts, n_merges):
    """Textbook Sennrich reference: full pair recount every round."""
    vocab = {}
    for w, c in word_counts.items():
        vocab[tuple(w) + (_EOW,)] = c
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] = \
                    pairs.get((sym[i], sym[i + 1]), 0) + c
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        a, b = best
        nv = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
    return merges


def _serial_encode(word, merges):
    """Original BPE apply: merges applied sequentially in rank order."""
    sym = list(word) + [_EOW]
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


CORPUS = ["low low low low low lower lower newest newest",
          "newest newest newest newest widest widest widest new"]


def test_bpe_train_matches_serial_reference():
    ds = rd.from_arrow(pa.table({"text": pa.array(CORPUS)})).repartition(2)
    got = bpe_train(ds, n_merges=12)
    wc = {}
    for line in CORPUS:
        for w in line.split(" "):
            wc[w] = wc.get(w, 0) + 1
    exp = _serial_train(wc, 12)
    assert got == exp
    # determinism across block layouts
    assert bpe_train(rd.from_arrow(pa.table({"text": pa.array(CORPUS)})),
                     n_merges=12) == got


def test_bpe_encode_matches_sequential_apply_and_reconstructs():
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                                 "text": pa.array(CORPUS)}))
    merges = bpe_train(ds, n_merges=8)
    out = _collect(bpe_encode(ds, merges)).sort_by("doc_id")
    for text, toks in zip(CORPUS, out.column("bpe_tokens").to_pylist()):
        exp = []
        for w in text.split(" "):
            exp.extend(_serial_encode(w, merges))
        assert toks == exp
        # lossless: stripping markers reconstructs the text
        joined = "".join(toks).replace(_EOW, " ").rstrip()
        assert joined == text


def test_bpe_encoder_handles_null_and_empty():
    enc = BpeEncoder(merges=[("l", "o")])
    t = pa.table({"text": pa.array([None, "", "lo"])})
    out = enc(t)
    assert out.column("bpe_tokens").to_pylist() == [
        None, [], ["lo", _EOW]]


def test_bpe_encoder_cache_bounded_output_unchanged():
    """A high-entropy vocabulary (every word distinct — the web-text worst
    case) must not grow the per-actor cache past max_cache_words, and
    eviction must not change the encoding."""
    corpus = ["low lower lowest newer newest wide widely"] * 4
    merges = bpe_train(
        rd.from_arrow(pa.table({"text": corpus})), n_merges=20)
    # 500 distinct pseudo-random words: no two alike, so an unbounded
    # cache would hold all 500
    words = [f"w{i:03d}x{i * 7 % 97}" for i in range(500)]
    t = pa.table({"text": [" ".join(words[i:i + 10])
                           for i in range(0, 500, 10)]})
    unbounded = BpeEncoder(merges)
    bounded = BpeEncoder(merges, max_cache_words=32)
    out_u = unbounded(t).column("bpe_tokens").to_pylist()
    out_b = bounded(t).column("bpe_tokens").to_pylist()
    assert out_u == out_b
    assert len(unbounded.cache) == 500
    assert len(bounded.cache) <= 32
