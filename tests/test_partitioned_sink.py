"""Resumable partitioned sink: sealed partitions skip on re-run, lost
partitions rebuild, read-back round-trips."""

import os
import shutil

import pandas as pd
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.sinks.partitioned import (
    read_partitioned, write_partitioned)

OUT = "/tmp/test_part_sink"


def _src():
    return rd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])


def _read_df():
    t = pa.concat_tables(read_partitioned(OUT).iter_batches(
        batch_format="pyarrow", batch_size=None))
    return t.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_partitioned_sink_write_resume_and_readback():
    shutil.rmtree(OUT, ignore_errors=True)
    stats = write_partitioned(_src(), OUT, "doc_id", num_partitions=8)
    assert stats.num_rows == 8 and sum(stats.column("rows").to_pylist()) == 500
    full = _read_df()
    assert len(full) == 500

    # all partitions sealed → a re-run writes NOTHING
    from vlm_eden_dataset_etl_ray.sinks.partitioned import _sealed_file

    mtimes = {p: os.path.getmtime(_sealed_file(OUT, int(p[len("pid="):])))
              for p in os.listdir(OUT)}
    stats2 = write_partitioned(_src(), OUT, "doc_id", num_partitions=8)
    assert stats2.num_rows == 0
    for p, m in mtimes.items():
        assert os.path.getmtime(_sealed_file(OUT, int(p[len("pid="):]))) == m

    # lose one partition → only it rebuilds; content reconverges exactly
    lost = sorted(os.listdir(OUT))[3]
    shutil.rmtree(os.path.join(OUT, lost))
    stats3 = write_partitioned(_src(), OUT, "doc_id", num_partitions=8)
    assert stats3.num_rows == 1
    assert f"pid={stats3.column('pid')[0].as_py()}" == lost
    pd.testing.assert_frame_equal(_read_df(), full)
    shutil.rmtree(OUT, ignore_errors=True)
