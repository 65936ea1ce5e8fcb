"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as opaque ``binary`` columns with metadata
columns beside them; decode / feature-extract stages are actor-pool
``map_batches`` stages sized for large rows (small batch_size). The actual
codec libraries are NOT in this container, so the decode kernel is STUBBED:
``DecodeStub`` produces a deterministic fake (documented below) and
``decode_image`` raises ``NotImplementedError`` unless the stub is allowed —
the Ray-side plumbing (schema, batch sizing, actor signature, output layout)
is real and tested.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def decode_image(_payload: bytes):  # pragma: no cover - documented stub
    """Real image decode would go here (PIL/ffmpeg not available in this
    environment)."""
    raise NotImplementedError(
        "image/audio codecs are not available in this container; "
        "use DecodeStub (deterministic fake) for plumbing tests"
    )


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
) -> rd.Dataset:
    """Image near-duplicate pairs: perceptual hash per payload (actor
    pool, small batches for big binary rows) → the generic pigeonhole
    Hamming banding from :func:`..dedup.hamming_pairs`. The payload never
    shuffles — only 16-byte (id, code) rows cross the exchange."""
    from vlm_eden_dataset_etl_ray.functions.dedup import hamming_pairs

    codes = ds.map_batches(
        AHashStub,
        fn_constructor_args=(payload_col,),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    ).select_columns([id_col, "ahash"])
    return hamming_pairs(codes, id_col, "ahash", max_hamming)
