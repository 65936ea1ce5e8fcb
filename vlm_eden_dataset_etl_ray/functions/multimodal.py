"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as opaque ``binary`` columns with metadata
columns beside them; decode / feature-extract stages are actor-pool
``map_batches`` stages sized for large rows (small batch_size).

Codec story, three tiers:

1. **PIL/Pillow when importable** — :func:`decode_image` decodes any
   format Pillow knows (gated on import; Pillow is not in this container,
   so this tier is exercised by the skip-marked pytest only where it IS
   installed).
2. **Built-in pure-numpy PPM/PGM codec** — a REAL image format
   (netpbm P6/P5), decoded and encoded with no external dependency, so
   the real-bytes pipeline (decode → area resize → grayscale → aHash →
   banded near-dup) runs end-to-end even in codec-less sandboxes.
3. **Deterministic stubs** (``DecodeStub``/``AHashStub``) for plumbing
   tests against arbitrary (non-image) payloads; ``decode_image`` raises
   ``NotImplementedError`` for undecodable payloads rather than guessing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

try:  # optional dependency: any-format decode when present
    from PIL import Image as _PIL_Image
except ImportError:  # pragma: no cover - absent in this container
    _PIL_Image = None


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as binary PPM (P6) — the real-bytes
    generator for tests and fixtures."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _decode_netpbm(buf: bytes) -> np.ndarray:
    """Pure-numpy decode of binary PPM (P6, RGB) / PGM (P5, grayscale →
    replicated to 3 channels). Handles whitespace + ``#`` comments per the
    netpbm spec; raises ValueError on malformed input."""
    magic = buf[:2]
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":
            while pos < len(buf) and buf[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    raw = np.frombuffer(buf, dtype=np.uint8, count=need, offset=pos)
    img = raw.reshape(h, w, ch)
    return np.repeat(img, 3, axis=2) if ch == 1 else img


def decode_image(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 decode: Pillow when importable (any format), else
    the built-in netpbm codec (P6/P5). Undecodable payloads raise
    ``NotImplementedError`` — use :class:`DecodeStub` for plumbing tests
    over arbitrary bytes."""
    if payload[:2] in (b"P6", b"P5"):
        return _decode_netpbm(payload)
    if _PIL_Image is not None:
        import io

        img = _PIL_Image.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    raise NotImplementedError(
        "payload is not netpbm and Pillow is not installed; install PIL "
        "for general formats or use DecodeStub (deterministic fake) for "
        "plumbing tests")


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area (mean-pool) resize — the standard downsample kernel, pure
    numpy: a ``reduceat`` fold per axis. An axis that UPSAMPLES (out dim
    ≥ input dim) replicates nearest pixels instead — duplicate bin starts
    would otherwise make zero-width bins and divide by zero (an 8×8 aHash
    of a 4×7 thumbnail must not be garbage)."""

    def _axis_pool(a: np.ndarray, out_n: int, n: int, axis: int):
        idx = (np.arange(out_n) * n) // out_n
        if out_n >= n:  # upsample: nearest replication, unit counts
            return np.take(a, idx, axis=axis), np.ones(out_n, np.int64)
        summed = np.add.reduceat(a, idx, axis=axis)
        return summed, np.diff(np.concatenate([idx, [n]]))

    h, w = img.shape[:2]
    acc = img.astype(np.float64)
    rows, rcnt = _axis_pool(acc, out_h, h, 0)
    out, ccnt = _axis_pool(rows, out_w, w, 1)
    area = rcnt[:, None] * ccnt[None, :]
    return (out / area[..., None] if out.ndim == 3 else out / area) \
        .round().clip(0, 255).astype(np.uint8)


class DecodeImage:
    """Actor-pool REAL decode stage: width/height/channels/mean_luma per
    payload via :func:`decode_image` (Pillow or built-in netpbm). Same
    pool shape and batch sizing story as :class:`DecodeStub`."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        meta = []
        for b in batch.column(self.payload_col).to_pylist():
            img = decode_image(b)
            luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                    + 0.114 * img[..., 2]).mean()
            meta.append((img.shape[1], img.shape[0], img.shape[2],
                         float(round(luma, 4))))
        cols = list(zip(*meta)) if meta else ([], [], [], [])
        batch = batch.append_column("width", pa.array(cols[0], pa.int32()))
        batch = batch.append_column("height", pa.array(cols[1], pa.int32()))
        batch = batch.append_column("channels", pa.array(cols[2], pa.int32()))
        return batch.append_column("mean_luma", pa.array(cols[3], pa.float64()))


class AHashImage:
    """Actor-pool REAL perceptual hash: decode → area-resize to 8×8 →
    grayscale → aHash (bit i = pixel > mean). Swap-in replacement for
    :class:`AHashStub` wherever payloads are actual images."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        codes = []
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for b in batch.column(self.payload_col).to_pylist():
            img = decode_image(b)
            small = resize_area(img, 8, 8).astype(np.float64)
            gray = (0.299 * small[..., 0] + 0.587 * small[..., 1]
                    + 0.114 * small[..., 2]).ravel()
            bits = gray > gray.mean()
            codes.append(int((bits.astype(np.uint64) * weights).sum()
                             .astype(np.int64)))
        return batch.append_column("ahash", pa.array(codes, pa.int64()))


class DecodeStub:
    """Actor-pool decode stage with a deterministic fake kernel.

    Fake semantics (stable, oracle-expressible): for a payload of N bytes,
    ``payload_bytes = N``, ``fake_width = N % 640``, ``fake_height =
    N % 480``, ``checksum = (N * 2654435761) % (2^31 - 1)``. A real
    deployment replaces ``_decode_one`` with the codec call; everything else
    (actor pool, small batches for big rows, metadata layout) stays.
    """

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    @staticmethod
    def _decode_one(buf: bytes) -> tuple[int, int, int, int]:
        n = len(buf)
        return n, n % 640, n % 480, (n * 2654435761) % (2**31 - 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        meta = [self._decode_one(b) for b in batch.column(self.payload_col).to_pylist()]
        cols = list(zip(*meta)) if meta else ([], [], [], [])
        batch = batch.append_column("payload_bytes", pa.array(cols[0], pa.int64()))
        batch = batch.append_column("fake_width", pa.array(cols[1], pa.int32()))
        batch = batch.append_column("fake_height", pa.array(cols[2], pa.int32()))
        batch = batch.append_column("checksum", pa.array(cols[3], pa.int64()))
        return batch


def decode_stage(
    ds: rd.Dataset,
    payload_col: str = "payload",
    batch_size: int = 64,  # small: binary rows are big
    concurrency=(1, 4),
) -> rd.Dataset:
    """Attach decode metadata via an actor pool. ``batch_size`` is
    deliberately small so batch × concurrency of multi-MB payloads fits the
    worker heap; the object store handles spill."""
    return ds.map_batches(
        DecodeStub,
        fn_constructor_args=(payload_col,),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


class ResizeStub:
    """Actor-pool resize stage, stub kernel. Fake semantics (stable,
    oracle-expressible): output dims are the target box clamped to the
    fake source dims (aspect ignored by the stub), ``resized_bytes =
    out_w * out_h * 3``. A real deployment swaps the kernel for
    PIL/libvips; pool shape, small batches, typed outputs stay."""

    def __init__(self, payload_col: str = "payload", target_w: int = 224,
                 target_h: int = 224):
        self.payload_col = payload_col
        self.tw, self.th = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        n = pc.binary_length(batch.column(self.payload_col)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        src_w, src_h = n % 640, n % 480
        out_w = np.minimum(src_w, self.tw).astype(np.int32)
        out_h = np.minimum(src_h, self.th).astype(np.int32)
        batch = batch.append_column("out_w", pa.array(out_w))
        batch = batch.append_column("out_h", pa.array(out_h))
        return batch.append_column(
            "resized_bytes", pa.array((out_w.astype(np.int64) *
                                       out_h.astype(np.int64) * 3)))


def frame_sample(
    ds: rd.Dataset,
    payload_col: str = "payload",
    stride_bytes: int = 64,
    max_frames: int = 8,
    batch_size: int = 64,
) -> rd.Dataset:
    """Video frame sampling plumbing: one output ROW per sampled frame
    (batch-expanding, the explode shape a real frame sampler has), with
    typed metadata (frame_idx, frame_offset, frame_checksum). The frame
    decode itself is the documented stub (checksum of (payload length,
    index)); stride/max_frames bound the expansion factor so batch ×
    expansion stays heap-safe."""
    import numpy as np

    def _sample(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.binary_length(t.column(payload_col)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_frames = np.minimum(max_frames, np.maximum(0, 1 + (n - 1) // stride_bytes))
        row_idx = np.repeat(np.arange(len(n)), n_frames)
        frame_idx = np.concatenate([np.arange(k) for k in n_frames]) \
            if len(n) else np.empty(0, np.int64)
        out = t.drop_columns([payload_col]).take(pa.array(row_idx))
        out = out.append_column("frame_idx", pa.array(frame_idx.astype(np.int32)))
        out = out.append_column("frame_offset",
                                pa.array(frame_idx * stride_bytes))
        checksum = (n[row_idx] * 2654435761 + frame_idx * 97) % (2**31 - 1)
        return out.append_column("frame_checksum", pa.array(checksum))

    return ds.map_batches(_sample, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


def text_as_payload(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Adapter used by tests/benchmarks: treat a utf-8 text column as the
    opaque binary payload column."""

    def _conv(t: pa.Table) -> pa.Table:
        return t.append_column(
            "payload", t.column(text_col).cast(pa.binary())
        )

    return ds.map_batches(_conv, batch_format="pyarrow", zero_copy_batch=True)


class AHashStub:
    """Actor-pool perceptual-hash stage: 64-bit average-hash (aHash) per
    image payload — the image analog of SimHash text dedup.

    The aHash ALGORITHM is real and unchanged in production: downsample to
    an 8×8 grayscale grid, bit i = grid[i] > grid.mean(). Only the
    DECODE+downsample step is stubbed (codecs absent): the fake grid is a
    strided 64-byte sample of the raw payload — deterministic, and near-
    identical payloads (a re-encode that flips a few bytes) still land
    within a small Hamming distance, which is exactly the property the
    dedup downstream exploits. A real deployment swaps ``_grid`` for
    decode→resize(8,8)→grayscale and keeps everything else."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    @staticmethod
    def _grid(buf: bytes):
        import numpy as np

        raw = np.frombuffer(buf, dtype=np.uint8)
        if raw.size == 0:
            return np.zeros(64, dtype=np.uint8)
        idx = np.linspace(0, raw.size - 1, 64).astype(np.int64)
        return raw[idx]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        grids = np.stack([self._grid(b)
                          for b in batch.column(self.payload_col).to_pylist()]) \
            if batch.num_rows else np.zeros((0, 64), np.uint8)
        # aHash proper (vectorized across the batch): bit = pixel > mean
        bits = grids > grids.mean(axis=1, keepdims=True)
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        codes = (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
        return batch.append_column("ahash", pa.array(codes, pa.int64()))


def phash_near_dup_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    batch_size: int = 64,
    concurrency=(1, 4),
    hasher=None,
) -> rd.Dataset:
    """Image near-duplicate pairs: perceptual hash per payload (actor
    pool, small batches for big binary rows) → the generic pigeonhole
    Hamming banding from :func:`..dedup.hamming_pairs`. The payload never
    shuffles — only 16-byte (id, code) rows cross the exchange.

    ``hasher``: the actor class computing the ``ahash`` column —
    :class:`AHashImage` (real decode; Pillow or built-in netpbm) for
    actual image payloads, :class:`AHashStub` (default) for arbitrary
    bytes in codec-less plumbing tests."""
    from vlm_eden_dataset_etl_ray.functions.dedup import hamming_pairs

    codes = ds.map_batches(
        hasher or AHashStub,
        fn_constructor_args=(payload_col,),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    ).select_columns([id_col, "ahash"])
    return hamming_pairs(codes, id_col, "ahash", max_hamming)
