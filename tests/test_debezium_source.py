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


def test_debezium_incremental_tail(ray_session, tmp_path):
    """WAL-tail loop over envelope shards: pending-file discovery via the
    manifest's cumulative input lineage, exactly-once re-runs, backlog
    chunking, new shards applied incrementally."""
    import json as _json

    from vlm_eden_dataset_etl_ray import lake as lake_mod
    from vlm_eden_dataset_etl_ray import manifest as mf
    from vlm_eden_dataset_etl_ray.pipelines.cdc import run_incremental_debezium
    from vlm_eden_dataset_etl_ray.spec import TableSpec

    spec = TableSpec(name="dbz", key="doc_id", order="lsn",
                     num_partitions=4, envelope=())
    env_dir = tmp_path / "env"
    env_dir.mkdir()
    lake_dir = str(tmp_path / "lake")

    def shard(name, rows):
        with open(env_dir / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    def env(doc, lsn, op, n):
        img = {"doc_id": doc, "n": n}
        return {"payload": {
            "before": img if op == "d" else None,
            "after": None if op == "d" else img,
            "op": op, "ts_ms": lsn, "source": {"lsn": lsn, "table": "t"}}}

    shard("s0.jsonl", [env("a", 1, "c", 1), env("b", 2, "c", 2)])
    shard("s1.jsonl", [env("a", 3, "u", 30), env("c", 4, "c", 4)])
    m1 = run_incremental_debezium(lake_dir, str(env_dir), spec=spec,
                                  max_epoch_bytes=1)  # 1 byte → 1 epoch/shard
    assert m1.epoch == 2  # backlog chunked into two epochs
    got = {r["doc_id"]: r["n"] for r in lake_mod.scan(
        lake_dir, spec=spec).take_all()}
    assert got == {"a": 30, "b": 2, "c": 4}

    # re-run: nothing pending, manifest unchanged
    m2 = run_incremental_debezium(lake_dir, str(env_dir), spec=spec)
    assert m2.epoch == m1.epoch

    # a new shard (including a delete) applies incrementally
    shard("s2.jsonl", [env("b", 5, "d", 2), env("d", 6, "c", 6)])
    m3 = run_incremental_debezium(lake_dir, str(env_dir), spec=spec)
    assert m3.epoch == m1.epoch + 1
    got = {r["doc_id"]: r["n"] for r in lake_mod.scan(
        lake_dir, spec=spec).take_all()}
    assert got == {"a": 30, "c": 4, "d": 6}
    # lineage records the actual shard paths
    ids, inputs = mf.cumulative_lineage(lake_dir, m3)
    assert {str(env_dir / s) for s in ("s0.jsonl", "s1.jsonl", "s2.jsonl")} \
        <= set(inputs)


def test_empty_batch_passes_through(ray_session, tmp_path):
    """A zero-row envelope batch must contribute zero rows, not abort the
    ingest (the null_count==n checks were 0==0 at n=0)."""
    import pyarrow as pa

    from vlm_eden_dataset_etl_ray.sources.debezium import _flatten_envelope

    typed = pa.table({"payload": pa.array([], pa.struct([
        ("before", pa.struct([("doc_id", pa.string())])),
        ("after", pa.struct([("doc_id", pa.string())])),
        ("op", pa.string()), ("ts_ms", pa.int64()),
        ("source", pa.struct([("lsn", pa.int64())]))]))})
    out = _flatten_envelope(typed, order="lsn", op_col="op", columns=None)
    assert out.num_rows == 0 and "op" in out.column_names
