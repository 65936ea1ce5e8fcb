"""Length-bucketed padding: bucket widths, truncation, pad-waste win."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.packing import length_bucketed_pad


def _collect(ds):
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None))


def _ds(lens):
    toks = [list(range(int(l))) for l in lens]
    return rd.from_arrow(pa.table({
        "tokens": pa.array(toks, pa.list_(pa.int32()))}))


def test_rows_pad_to_bucket_width_and_content_survives():
    out = _collect(length_bucketed_pad(_ds([3, 70, 130, 600]),
                                       edges=(64, 128, 256, 512)))
    rows = {r["n_real"]: r for r in out.to_pylist()}
    assert rows[3]["width"] == 64 and rows[3]["input_ids"][:3] == [0, 1, 2]
    assert all(v == 0 for v in rows[3]["input_ids"][3:])
    assert rows[70]["width"] == 128
    assert rows[130]["width"] == 256
    # longer than the last edge: truncated to it
    assert rows[512]["width"] == 512
    assert rows[512]["input_ids"] == list(range(512))


def test_bucketing_cuts_padding_vs_global_max():
    rng = np.random.default_rng(7)
    lens = rng.integers(1, 512, 2000)
    out = _collect(length_bucketed_pad(_ds(lens)))
    w = out.column("width").to_numpy(zero_copy_only=False)
    nr = out.column("n_real").to_numpy(zero_copy_only=False)
    assert out.num_rows == 2000
    assert nr.sum() == lens.sum()  # nothing truncated below 512
    pad_bucketed = 1 - nr.sum() / w.sum()
    pad_global = 1 - nr.sum() / (512 * len(nr))
    assert pad_bucketed < pad_global / 1.8


def test_rows_grouped_by_bucket_within_batch():
    out = _collect(length_bucketed_pad(_ds([500, 3, 500, 3, 70])))
    b = out.column("bucket").to_pylist()
    assert b == sorted(b)
