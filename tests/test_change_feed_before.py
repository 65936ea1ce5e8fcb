"""Change feed with before-images: insert/update/delete refinement and
Debezium-style `_before` struct."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray.spec import TableSpec

SPEC = TableSpec(name="cfb", key="doc_id", order="lsn", num_partitions=4,
                 envelope=())


def _t(rows):
    return pa.table({
        "lsn": pa.array([r[0] for r in rows], pa.int64()),
        "op": pa.array([r[1] for r in rows]),
        "doc_id": pa.array([r[2] for r in rows]),
        "n_tok": pa.array([r[3] for r in rows], pa.int64()),
    })


def _collect(ds):
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(batches) if batches else pa.table({})


def test_before_image_envelope(tmp_path):
    lake_dir = str(tmp_path / "cfb")
    # epoch 1: d1=10, d2=20, d3=30
    apply.apply_epoch_dataset(lake_dir, rd.from_arrow(_t([
        (1, "upsert", "d1", 10), (2, "upsert", "d2", 20),
        (3, "upsert", "d3", 30)])), epoch_id="e1", spec=SPEC)
    # epoch 2: update d1 -> 11, delete d2, insert d4=40
    apply.apply_epoch_dataset(lake_dir, rd.from_arrow(_t([
        (4, "upsert", "d1", 11), (5, "delete", "d2", 0),
        (6, "upsert", "d4", 40)])), epoch_id="e2", spec=SPEC)

    out = _collect(lake.change_feed(lake_dir, from_epoch=1, spec=SPEC,
                                    before_image=True))
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert set(rows) == {"d1", "d2", "d4"}
    assert rows["d1"]["_change_type"] == "update"
    assert rows["d1"]["n_tok"] == 11
    assert rows["d1"]["_before"]["n_tok"] == 10
    assert rows["d2"]["_change_type"] == "delete"
    assert rows["d2"]["_before"]["n_tok"] == 20
    assert rows["d4"]["_change_type"] == "insert"
    assert rows["d4"]["_before"] is None


def test_before_image_from_lake_creation_all_inserts(tmp_path):
    lake_dir = str(tmp_path / "cfb0")
    apply.apply_epoch_dataset(lake_dir, rd.from_arrow(_t([
        (1, "upsert", "d1", 10), (2, "delete", "d9", 0)])),
        epoch_id="e1", spec=SPEC)
    out = _collect(lake.change_feed(lake_dir, from_epoch=0, spec=SPEC,
                                    before_image=True))
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows["d1"]["_change_type"] == "insert"
    assert rows["d1"]["_before"] is None
    # a delete of a never-seen key stays a delete (empty before)
    assert rows["d9"]["_change_type"] == "delete"
    assert rows["d9"]["_before"] is None


def test_plain_feed_unchanged(tmp_path):
    lake_dir = str(tmp_path / "cfp")
    apply.apply_epoch_dataset(lake_dir, rd.from_arrow(_t([
        (1, "upsert", "d1", 10)])), epoch_id="e1", spec=SPEC)
    apply.apply_epoch_dataset(lake_dir, rd.from_arrow(_t([
        (2, "upsert", "d1", 11)])), epoch_id="e2", spec=SPEC)
    out = _collect(lake.change_feed(lake_dir, from_epoch=1, spec=SPEC))
    assert out.column_names[-1] == "_change_type"
    assert "_before" not in out.column_names
    assert out.to_pylist()[0]["_change_type"] == "upsert"
