"""Edge-case hardening: unicode keys, empty/huge token payloads, extreme
partition counts — shapes a 100 TB corpus will certainly contain."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray.spec import TableSpec


def _apply_table(tmp_path, t: pa.Table, spec: TableSpec):
    tmp_path.mkdir(parents=True, exist_ok=True)
    f = str(tmp_path / "chg.parquet")
    pq.write_table(t, f)
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, [f], spec=spec)
    return lake.snapshot(lake_dir, spec=spec)


def test_unicode_and_odd_keys(tmp_path):
    keys = ["héllo-wörld", "文档一", "doc\twith\ttabs", "🚀", "", "doc'quote"]
    t = pa.table(
        {
            "lsn": pa.array(range(len(keys)), pa.int64()),
            "op": pa.array(["insert"] * len(keys)),
            "doc_id": pa.array(keys),
            "n_tok": pa.array([1] * len(keys), pa.int64()),
        }
    )
    spec = TableSpec(name="uni", key="doc_id", order="lsn", num_partitions=8, envelope=())
    snap = _apply_table(tmp_path, t, spec)
    assert sorted(snap.column("doc_id").to_pylist()) == sorted(keys)


def test_empty_and_max_token_payloads(tmp_path):
    tokens = pa.array(
        [[], list(range(2048)), None, [7]],
        pa.list_(pa.int32()),
    )
    t = pa.table(
        {
            "lsn": pa.array([0, 1, 2, 3], pa.int64()),
            "op": pa.array(["insert", "insert", "delete", "insert"]),
            "doc_id": pa.array(["empty", "max", "max", "one"]),
            "tokens": tokens,
        }
    )
    spec = TableSpec(name="tok", key="doc_id", order="lsn", num_partitions=4, envelope=())
    snap = _apply_table(tmp_path, t, spec)
    rows = {r["doc_id"]: r["tokens"] for r in snap.to_pylist()}
    assert rows["empty"] == []          # empty list survives (distinct from null)
    assert "max" not in rows            # delete wins over the 2048-token row
    assert rows["one"] == [7]


def test_single_partition_and_many_partition_specs(tmp_path):
    n = 500
    t = pa.table(
        {
            "lsn": pa.array(range(n), pa.int64()),
            "op": pa.array(["insert"] * n),
            "doc_id": pa.array([f"d{i % 100}" for i in range(n)]),
            "v": pa.array(range(n), pa.int64()),
        }
    )
    for P in (1, 256):
        spec = TableSpec(name=f"p{P}", key="doc_id", order="lsn",
                         num_partitions=P, envelope=())
        snap = _apply_table(tmp_path / f"p{P}", t, spec)
        assert snap.num_rows == 100
        got = {r["doc_id"]: r["v"] for r in snap.to_pylist()}
        assert all(got[f"d{i}"] == 400 + i for i in range(100))  # max lsn wins
