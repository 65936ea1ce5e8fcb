"""Debezium-envelope source adapter (sources/debezium.py): envelope
variants → flat changelog rows, end-to-end into a lake replay."""

import json
import os

import pyarrow as pa
import pytest


def _write(tmp_path, rows, name="part0.jsonl"):
    d = tmp_path / "dbz"
    d.mkdir(exist_ok=True)
    p = d / name
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(d)


def _collect(ds):
    rows = ds.take_all()
    return sorted(rows, key=lambda r: r["lsn"])


ENVELOPES = [
    {"payload": {"before": None,
                 "after": {"doc_id": "a", "n_tok": 5, "src": "x"},
                 "op": "c", "ts_ms": 1, "source": {"lsn": 10, "table": "t"}}},
    {"payload": {"before": {"doc_id": "a", "n_tok": 5, "src": "x"},
                 "after": {"doc_id": "a", "n_tok": 7, "src": "y"},
                 "op": "u", "ts_ms": 2, "source": {"lsn": 11, "table": "t"}}},
    {"payload": {"before": {"doc_id": "b", "n_tok": 1, "src": "z"},
                 "after": None,
                 "op": "d", "ts_ms": 3, "source": {"lsn": 12, "table": "t"}}},
    {"payload": {"before": None,
                 "after": {"doc_id": "c", "n_tok": 9, "src": "w"},
                 "op": "r", "ts_ms": 4, "source": {"lsn": 13, "table": "t"}}},
]


def test_payload_wrapped_envelope(ray_session, tmp_path):
    from vlm_eden_dataset_etl_ray.sources.debezium import read_debezium_jsonl

    rows = _collect(read_debezium_jsonl(_write(tmp_path, ENVELOPES)))
    assert [r["op"] for r in rows] == ["upsert", "upsert", "delete", "upsert"]
    assert [r["lsn"] for r in rows] == [10, 11, 12, 13]
    # delete takes its image from `before`
    assert rows[2]["doc_id"] == "b" and rows[2]["n_tok"] == 1
    # snapshot-read (op=r) is an upsert
    assert rows[3]["doc_id"] == "c"


def test_unwrapped_envelope_ts_ms_fallback(ray_session, tmp_path):
    from vlm_eden_dataset_etl_ray.sources.debezium import read_debezium_jsonl

    bare = [
        {"before": None, "after": {"doc_id": "a", "v": 1}, "op": "c",
         "ts_ms": 100},
        {"before": {"doc_id": "a", "v": 1}, "after": None, "op": "d",
         "ts_ms": 200},
    ]
    rows = _collect(read_debezium_jsonl(_write(tmp_path, bare)))
    assert [r["lsn"] for r in rows] == [100, 200]  # ts_ms fallback
    assert rows[1]["op"] == "delete"


def test_missing_op_raises(ray_session, tmp_path):
    from vlm_eden_dataset_etl_ray.sources.debezium import read_debezium_jsonl

    bad = [{"after": {"doc_id": "a"}, "ts_ms": 1}]
    with pytest.raises(Exception, match="op"):
        read_debezium_jsonl(_write(tmp_path, bad)).materialize()


def test_column_pruning(ray_session, tmp_path):
    from vlm_eden_dataset_etl_ray.sources.debezium import read_debezium_jsonl

    ds = read_debezium_jsonl(_write(tmp_path, ENVELOPES),
                             columns=["doc_id", "n_tok"])
    rows = _collect(ds)
    assert set(rows[0]) == {"doc_id", "n_tok", "op", "lsn"}


def test_debezium_to_lake_replay(ray_session, tmp_path):
    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import lake as lake_mod
    from vlm_eden_dataset_etl_ray.sources.debezium import read_debezium_jsonl
    from vlm_eden_dataset_etl_ray.spec import TableSpec

    spec = TableSpec(name="dbz", key="doc_id", order="lsn",
                     num_partitions=4, envelope=())
    ds = read_debezium_jsonl(_write(tmp_path, ENVELOPES))
    lake_dir = str(tmp_path / "lake")
    apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id="e1", spec=spec)
    got = {r["doc_id"]: r for b in lake_mod.scan(lake_dir, spec=spec)
           .iter_batches(batch_format="pyarrow", batch_size=None)
           for r in b.to_pylist()}
    assert set(got) == {"a", "c"}  # b deleted
    assert got["a"]["n_tok"] == 7 and got["a"]["src"] == "y"
