"""REAL-bytes multimodal pipeline: actual images (binary PPM — netpbm P6,
decoded by the built-in pure-numpy codec, or by Pillow where installed)
through decode → area-resize → aHash → banded near-dup. The stub path
(arbitrary bytes) keeps its own tests in test_round2 suites."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.multimodal import (
    AHashImage, DecodeImage, decode_image, encode_ppm,
    phash_near_dup_pairs, resize_area)


def _img(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_and_decode_stage():
    rng = np.random.default_rng(5)
    imgs = [_img(rng, 48, 64), _img(rng, 17, 31), _img(rng, 8, 8)]
    payloads = [encode_ppm(i) for i in imgs]
    for img, buf in zip(imgs, payloads):
        np.testing.assert_array_equal(decode_image(buf), img)

    ds = rd.from_arrow(pa.table({
        "doc_id": ["a", "b", "c"],
        "payload": pa.array(payloads, pa.binary()),
    }))
    out = pa.concat_tables(
        ds.map_batches(DecodeImage, fn_constructor_args=("payload",),
                       batch_format="pyarrow", concurrency=(1, 2))
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("doc_id")
    assert out.column("width").to_pylist() == [64, 31, 8]
    assert out.column("height").to_pylist() == [48, 17, 8]
    assert out.column("channels").to_pylist() == [3, 3, 3]
    for row, img in zip(out.to_pylist(), imgs):
        luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2]).mean()
        assert abs(row["mean_luma"] - luma) < 1e-3


def test_pgm_decodes_with_comments():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    buf = b"P5\n# a comment\n4 3\n255\n" + gray.tobytes()
    img = decode_image(buf)
    assert img.shape == (3, 4, 3)
    np.testing.assert_array_equal(img[..., 0], gray)
    np.testing.assert_array_equal(img[..., 1], gray)


def test_resize_area_mean_pools():
    img = np.zeros((4, 4, 3), np.uint8)
    img[:2, :2] = 100
    img[2:, 2:] = 200
    out = resize_area(img, 2, 2)
    assert out[0, 0].tolist() == [100] * 3
    assert out[1, 1].tolist() == [200] * 3
    assert out[0, 1].tolist() == [0] * 3
    # non-divisible target
    assert resize_area(img, 3, 3).shape == (3, 3, 3)


def test_phash_near_dup_pairs_on_real_images():
    """Re-encodes with a few flipped pixels are near-dups (small Hamming
    distance on the real aHash); unrelated images are not."""
    rng = np.random.default_rng(11)
    base = [_img(rng, 32, 32) for _ in range(6)]
    rows = []
    for i, img in enumerate(base):
        rows.append((2 * i, encode_ppm(img)))  # even id = original
        noisy = img.copy()
        # perturb a handful of pixels — the 8x8 mean grid barely moves
        xs = rng.integers(0, 32, 5)
        ys = rng.integers(0, 32, 5)
        noisy[xs, ys] = rng.integers(0, 256, (5, 3))
        rows.append((2 * i + 1, encode_ppm(noisy)))  # odd id = its dup
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "payload": pa.array([r[1] for r in rows], pa.binary()),
    })).repartition(3)
    pairs = pa.concat_tables(
        phash_near_dup_pairs(ds, "doc_id", "payload", max_hamming=6,
                             hasher=AHashImage)
        .iter_batches(batch_format="pyarrow", batch_size=None))
    got = {tuple(sorted((a, b))) for a, b in
           zip(pairs.column("doc_a").to_pylist(),
               pairs.column("doc_b").to_pylist())}
    for i in range(6):
        assert (2 * i, 2 * i + 1) in got, f"missing dup pair {i}"
    # unrelated random images must not all collide
    cross = [p for p in got if p[0] // 2 != p[1] // 2]
    assert len(cross) <= 2


def test_undecodable_payload_raises():
    from vlm_eden_dataset_etl_ray.functions import multimodal as mm

    # without Pillow: a loud NotImplementedError naming the options;
    # with Pillow: its own decode error for genuinely broken bytes
    expect = (Exception if mm._PIL_Image is not None
              else NotImplementedError)
    with pytest.raises(expect):
        decode_image(b"\x89PNG\r\n\x1a\nnot-actually-png")


def test_pillow_path_decodes_png():
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = np.full((5, 7, 3), 42, np.uint8)
    b = io.BytesIO()
    PIL.fromarray(img).save(b, format="PNG")
    np.testing.assert_array_equal(decode_image(b.getvalue()), img)


def test_resize_area_upsamples_without_div_zero():
    """out dim > input dim replicates nearest pixels (duplicate bin starts
    used to produce zero-width bins and NaN→garbage uint8)."""
    import numpy as np

    from vlm_eden_dataset_etl_ray.functions.multimodal import resize_area

    img = (np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
           * np.ones((1, 1, 3), np.uint8))
    with np.errstate(divide="raise", invalid="raise"):
        out = resize_area(img, 8, 8)
    assert out.shape == (8, 8, 3)
    # each source pixel appears as a 2x2 replicated block
    assert (out[0:2, 0:2, 0] == img[0, 0, 0]).all()
    assert (out[6:8, 6:8, 0] == img[3, 3, 0]).all()
    # mixed: upsample rows, downsample cols
    out2 = resize_area(img, 8, 2)
    assert out2.shape == (8, 2, 3)
