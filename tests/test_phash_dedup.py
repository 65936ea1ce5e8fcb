"""Perceptual-hash (aHash) image near-dup: banding recall vs brute force,
near-identical payload detection, payload never shuffled."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.multimodal import (
    AHashStub,
    phash_near_dup_pairs,
)


def _collect(ds):
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    return pa.concat_tables(tables)


def _payloads(rng, n, size=4096):
    return [rng.integers(0, 256, size, dtype=np.uint8).tobytes()
            for _ in range(n)]


def test_near_identical_payloads_pair_up_distinct_do_not():
    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, 4096, dtype=np.uint8)
    tweak = base.copy()
    tweak[100:104] ^= 0xFF  # a few flipped bytes (re-encode noise)
    other = rng.integers(0, 256, 4096, dtype=np.uint8)
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([base.tobytes(), tweak.tobytes(),
                             other.tobytes()], pa.binary()),
    })
    out = _collect(phash_near_dup_pairs(rd.from_arrow(t), max_hamming=3))
    pairs = set(zip(out.column("doc_a").to_pylist(),
                    out.column("doc_b").to_pylist()))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_banding_recall_matches_brute_force():
    rng = np.random.default_rng(17)
    payloads = _payloads(rng, 60)
    # inject 10 near-dup partners
    for i in range(10):
        p = np.frombuffer(payloads[i], np.uint8).copy()
        p[i * 7: i * 7 + 3] ^= 0x55
        payloads.append(p.tobytes())
    ids = list(range(len(payloads)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    out = _collect(phash_near_dup_pairs(
        rd.from_arrow(t).repartition(4), max_hamming=3))
    got = {(a, b) for a, b in zip(out.column("doc_a").to_pylist(),
                                  out.column("doc_b").to_pylist())}
    # brute force over the same codes
    stub = AHashStub()
    codes = stub(t).column("ahash").to_numpy(zero_copy_only=False) \
        .astype(np.uint64)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(int(codes[i] ^ codes[j])).count("1") <= 3:
                want.add((i, j))
    assert got == want and len(want) >= 10
