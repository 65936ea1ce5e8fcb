"""CSV / JSONL sources parse, prune, and round-trip against the parquet
ground truth."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from vlm_eden_dataset_etl_ray.sources.text_formats import (
    read_csv_table, read_jsonl_table)

TMP = "/tmp/test_text_sources"


def _ground_truth():
    return pq.read_table("/root/testdata/sf0.01/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"])


def _collect(ds):
    return pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=None))


def test_csv_and_jsonl_roundtrip():
    os.makedirs(TMP, exist_ok=True)
    t = _ground_truth()
    # emit the same rows as csv and jsonl
    csv_path = os.path.join(TMP, "docs.csv")
    import pyarrow.csv as pacsv
    pacsv.write_csv(t, csv_path)
    jl_path = os.path.join(TMP, "docs.jsonl")
    with open(jl_path, "w") as f:
        for row in t.to_pylist():
            f.write(json.dumps(row) + "\n")

    got_csv = _collect(read_csv_table(csv_path, columns=["doc_id", "n_chars"]))
    got_jl = _collect(read_jsonl_table(jl_path, columns=["doc_id", "n_chars"]))
    want = t.select(["doc_id", "n_chars"]).sort_by("doc_id")
    assert got_csv.sort_by("doc_id").equals(want)
    assert got_jl.sort_by("doc_id").equals(want)
    shutil.rmtree(TMP, ignore_errors=True)
