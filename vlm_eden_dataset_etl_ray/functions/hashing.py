"""Deterministic vectorized hashing for partition assignment and dedup.

The partition function replaces the reference's per-tenant fan-out
(``/root/reference/cron_tasks.py:84-86``): parallelism unit = hash partition
of the key, not tenant. Manifests record partition ids, so a resume in a new
process — possibly under different library versions — MUST map keys to the
same partitions or keys silently split across partitions (duplicate rows per
key at merge-on-read).

Strategy: polars' ahash is the fast path (single Rust pass; ~1000× faster
than any numpy per-byte kernel on this host), but it is only stable per
polars build — so the ACTIVE hash implementation is fingerprinted by a
canary (hash a fixed probe set, digest the result). :data:`HASH_FN` is
recorded in every lake manifest and ``apply_epoch`` / ``lake.scan`` fail
fast on a mismatch instead of corrupting the lake. A silent change of
polars' algorithm — even under an unchanged version string — changes the
canary digest and is caught. Without polars, a self-contained numpy
polynomial hash (``poly64/v1``, version-independent by construction) is
used; its fingerprint never matches an ahash lake, so mixing the two also
fails fast. The old pandas ``hash_array`` fallback (different hashes,
silently) is gone.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

try:
    import polars as pl

    _HAVE_POLARS = True
except ImportError:  # pragma: no cover
    _HAVE_POLARS = False

_FNV_PRIME = np.uint64(0x100000001B3)


# ---------------------------------------------------------------------------
# Fallback: self-contained vectorized polynomial hash (version-independent)
# ---------------------------------------------------------------------------


def _mix64(x):
    """splitmix64 finalizer — full-avalanche bijection on uint64.
    Wraparound is the algorithm; silence numpy's scalar-overflow warning."""
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x = x ^ (x >> np.uint64(30))
        x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x = x ^ (x >> np.uint64(27))
        x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return x ^ (x >> np.uint64(31))


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(byte data, absolute offsets[n+1]) views of a string/binary array."""
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset: arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return data, offsets.astype(np.int64)


def _poly_hash_strings(arr: pa.Array, seed: int) -> np.ndarray:
    """h_i = sum_j (byte_j + 1) * P^(end_i-1-j) mod 2^64, splitmix-finalized
    with length and seed. All O(total_bytes) work is numpy kernels."""
    data, offsets = _string_buffers(arr)
    n = len(offsets) - 1
    lengths = np.diff(offsets)
    lo, hi = int(offsets[0]), int(offsets[-1])
    total = hi - lo
    if total == 0:
        h = np.zeros(n, dtype=np.uint64)
    else:
        maxlen = int(lengths.max())
        pw = np.empty(maxlen, dtype=np.uint64)
        pw[0] = 1
        if maxlen > 1:
            np.cumprod(np.full(maxlen - 1, _FNV_PRIME, dtype=np.uint64), out=pw[1:])
        ends_per_byte = np.repeat(offsets[1:], lengths)
        exp = ends_per_byte - 1 - np.arange(lo, hi, dtype=np.int64)
        contrib = (data[lo:hi].astype(np.uint64) + np.uint64(1)) * pw[exp]
        starts = np.minimum(offsets[:-1] - lo, total - 1)  # reduceat-safe
        h = np.add.reduceat(contrib, starts)
        h[lengths == 0] = np.uint64(0)
    seed_mix = _mix64(np.uint64(seed & 0xFFFFFFFFFFFFFFFF) + np.uint64(0xA5A5A5A5A5A5A5A5))
    return _mix64(h ^ (lengths.astype(np.uint64) * _FNV_PRIME) ^ seed_mix)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


#: XOR-salt applied to null positions so null hashes DISTINCT from ""/0
#: (a null text field and an empty one are different documents)
_NULL_SALT = np.uint64(0xD6E8FEB86659FD93)


def _as_hashable_array(values) -> tuple[pa.Array, np.ndarray | None]:
    """Normalize to a (large_)string/binary Arrow array + null mask.
    Null slots are filled with ""/b"" for the kernel; the mask lets the
    caller re-salt them so nulls stay distinguishable."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        values = pa.array(list(values), type=pa.string())
    if not (pa.types.is_string(values.type) or pa.types.is_large_string(values.type)
            or pa.types.is_binary(values.type) or pa.types.is_large_binary(values.type)):
        values = values.cast(pa.string())
    mask = None
    if values.null_count:
        mask = pc.is_null(values).to_numpy(zero_copy_only=False)
        fill = b"" if (pa.types.is_binary(values.type)
                       or pa.types.is_large_binary(values.type)) else ""
        values = pc.fill_null(values, fill)
    return values, mask


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Vectorized uint64 hash of a string array (implementation =
    :data:`HASH_FN`; see module docstring for the stability contract).

    ``values`` may be a pyarrow Array/ChunkedArray, numpy object array, or
    list of str. Nulls hash DISTINCTLY from empty strings (XOR salt).
    Returns uint64 ndarray.
    """
    arr, mask = _as_hashable_array(values)
    if _HAVE_POLARS:
        h = pl.from_arrow(arr).hash(seed=seed & 0xFFFFFFFFFFFFFFFF).to_numpy()
    else:
        h = _poly_hash_strings(arr, seed)
    if mask is not None:
        h = h.copy()
        h[mask] ^= _NULL_SALT
    return h


def _hash_fixed_width(arr: pa.Array, seed: int) -> np.ndarray:
    """Hash a numeric/temporal/bool column by mixing its 64-bit bit pattern
    (cast through int64/float64 first so equal values of different physical
    widths hash equal)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    mask = None
    if arr.null_count:
        mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
        # fill AFTER bringing the value to a castable family: an int64
        # zero scalar does not cast to date32/time32, so fill the int
        # view instead of the original type (nulls survive the cast)
        if pa.types.is_floating(arr.type):
            arr = pc.fill_null(arr, pa.scalar(0.0, arr.type))
    if pa.types.is_floating(arr.type):
        vals = arr.cast(pa.float64()).to_numpy(zero_copy_only=False)
        # -0.0 == 0.0 in SQL/Arrow comparisons but differs in its bit
        # pattern — normalize before the bit view so content_hash/exact
        # dedup agree with a DISTINCT oracle. NaN payload bits are kept
        # as-is: NaN != NaN in SQL, so hashing NaNs apart never merges
        # rows an oracle would keep distinct (it may keep extra rows,
        # which DISTINCT keeps too).
        bits = np.where(vals == 0.0, 0.0, vals).view(np.uint64)
    else:
        try:
            ints = arr.cast(pa.int64())
        except pa.ArrowNotImplementedError:
            # 32-bit-backed temporal (date32/time32) casts via int32
            ints = arr.cast(pa.int32()).cast(pa.int64())
        if ints.null_count:
            ints = pc.fill_null(ints, pa.scalar(0, pa.int64()))
        bits = ints.to_numpy(zero_copy_only=False).view(np.uint64)
    seed_mix = _mix64(np.uint64(seed & 0xFFFFFFFFFFFFFFFF) + np.uint64(0xA5A5A5A5A5A5A5A5))
    h = _mix64(bits ^ seed_mix)
    if mask is not None:
        h = h.copy()
        h[mask] ^= _NULL_SALT  # null != 0
    return h


def partition_ids(keys, num_partitions: int, seed: int = 0) -> np.ndarray:
    """pid = hash(key) % P as int32 (P is fixed per lake; the hash
    implementation is fingerprinted as :data:`HASH_FN` in the manifest and
    validated on every resume)."""
    return (hash_strings(keys, seed=seed) % np.uint64(num_partitions)).astype(np.int32)


def content_hash(table: pa.Table, columns: list[str], seed: int = 0) -> np.ndarray:
    """Row-wise combined uint64 hash over ``columns`` (for exact dedup)."""
    acc = np.zeros(table.num_rows, dtype=np.uint64)
    for i, c in enumerate(columns):
        col = table.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
                or pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type)
                or pa.types.is_null(col.type)):  # all-null block column
            h = hash_strings(col if not pa.types.is_null(col.type)
                             else col.cast(pa.string()), seed=seed + i)
        else:
            h = _hash_fixed_width(col, seed=seed + i)
        acc = acc * _FNV_PRIME + h
    return acc


def _fingerprint() -> str:
    """Canary fingerprint of the ACTIVE hash implementation: hash a fixed
    probe set (several seeds, incl. empty + multibyte strings) and digest the
    resulting bytes. Any change to the underlying algorithm — polars swap,
    ahash revision, fallback engagement — yields a different fingerprint."""
    # the null probe pins the null-vs-"" distinction into the fingerprint:
    # a lake written before (or after) a null-hash change fails fast
    probe = pa.array(["", "a", "doc1", "doc12345678901234567890",
                      "naïve-ключ-鍵", None])
    parts = [hash_strings(probe, seed=s).tobytes() for s in (0, 1, 31337)]
    digest = hashlib.sha256(b"".join(parts)).hexdigest()[:12]
    family = "ahash" if _HAVE_POLARS else "poly64"
    return f"{family}/{digest}"


#: Fingerprint of the partition-hash implementation, recorded in manifests
#: and validated on resume (see :func:`vlm_eden_dataset_etl_ray.apply.apply_epoch`).
HASH_FN = _fingerprint()


def _bloom_k(m_bits: int, n: int) -> int:
    return max(1, min(8, int(round(0.693 * m_bits / max(1, n)))))


def key_bloom_build(keys, *, bits_per_key: int = 10,
                    max_keys: int = 100_000) -> bytes | None:
    """Compact bloom filter over a file's key column, for point-lookup
    file skipping (Hudi-style: stored in the parquet FOOTER, never the
    manifest, so manifests stay slim at any file count). Returns a JSON
    payload (bits are base64) or None when the file is too large for a
    useful filter at this byte budget — base files that big are served by
    zone maps / clustered compaction instead. The payload records
    :data:`HASH_FN`; a probe under a different hash implementation
    ignores the bloom (graceful, never wrong)."""
    import base64
    import json

    n = len(keys)
    if n == 0 or n > max_keys:
        return None
    m_bits = _next_pow2_int(max(256, n * bits_per_key))
    k = _bloom_k(m_bits, n)
    h1 = hash_strings(keys, seed=0xB100)
    h2 = hash_strings(keys, seed=0xB101) | np.uint64(1)
    bits = np.zeros(m_bits, dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(k):
            bits[((h1 + np.uint64(i) * h2) % np.uint64(m_bits))
                 .astype(np.int64)] = True
    packed = np.packbits(bits)
    return json.dumps({
        "m": m_bits, "k": k, "hash_fn": HASH_FN,
        "b64": base64.b64encode(packed.tobytes()).decode(),
    }).encode()


def key_bloom_probe_hashes(keys) -> tuple[np.ndarray, np.ndarray]:
    """The (h1, h2) probe pair for :func:`key_bloom_may_contain_any` —
    computed once per ask, reused across every file's bloom."""
    return (hash_strings(keys, seed=0xB100),
            hash_strings(keys, seed=0xB101) | np.uint64(1))


def key_bloom_may_contain_any(payload: bytes, h1: np.ndarray,
                              h2: np.ndarray) -> bool:
    """True unless the bloom PROVES none of the asked keys is in the file
    (false positives possible, false negatives never). Returns True — keep
    the file — on any payload problem or hash-implementation mismatch."""
    import base64
    import json

    try:
        meta = json.loads(payload)
        if meta.get("hash_fn") != HASH_FN:
            return True
        m = np.uint64(int(meta["m"]))
        k = int(meta["k"])
        packed = np.frombuffer(base64.b64decode(meta["b64"]), dtype=np.uint8)
    except (ValueError, KeyError, TypeError):
        return True
    alive = np.ones(len(h1), dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(k):
            idx = (h1[alive] + np.uint64(i) * h2[alive]) % m
            hit = (packed[(idx >> np.uint64(3)).astype(np.int64)]
                   >> (np.uint64(7) - (idx & np.uint64(7))).astype(np.uint8)) & 1
            nxt = np.zeros_like(alive)
            nxt[np.flatnonzero(alive)[hit.astype(bool)]] = True
            alive = nxt
            if not alive.any():
                return False
    return True


def _next_pow2_int(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def morton_interleave(cols: list[np.ndarray], bits: int = 21) -> np.ndarray:
    """Z-order (Morton) key: interleave the low ``bits`` bits of 2-4
    non-negative integer arrays so that sorting by the result clusters
    rows that are close in EVERY dimension — the multi-column analog of
    a lexicographic sort, used with ``lake.compact(cluster_fn=...)`` so a
    range probe on ANY of the interleaved columns prunes well (a
    lexicographic cluster only serves its leading column). Values are
    clamped into [0, 2^bits); pre-bucket wide domains (e.g. ``v >> 10``
    or days-since-epoch) to spend the bits where the probes are.
    ``len(cols) * bits`` must fit 64."""
    n = len(cols)
    if not 2 <= n <= 4:
        raise ValueError("morton_interleave takes 2-4 columns")
    if n * bits > 64:
        raise ValueError(f"{n} cols x {bits} bits exceeds 64")
    lim = np.uint64((1 << bits) - 1)
    out = np.zeros(len(cols[0]), np.uint64)
    for i, c in enumerate(cols):
        v = np.minimum(np.maximum(c.astype(np.int64), 0).astype(np.uint64), lim)
        for j in range(bits):
            out |= ((v >> np.uint64(j)) & np.uint64(1)) << np.uint64(j * n + i)
    return out
