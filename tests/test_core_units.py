"""Unit tests for the engine's non-Ray core: generator, oracle, LWW reduce,
manifests, schema unification. (Ray session exists via conftest but these
tests don't submit work.)"""

import numpy as np
import pyarrow as pa
import pytest

from vlm_eden_dataset_etl_ray import changelog as cl
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray import oracle
from vlm_eden_dataset_etl_ray import schema as sch
from vlm_eden_dataset_etl_ray.spec import TableSpec
from vlm_eden_dataset_etl_ray.stages import lww


P_SMALL = cl.ChangelogParams(n_docs=100, n_events=1000, schema_change_at=600, n_shards=3)


def test_generator_deterministic(tmp_path):
    a = cl.write_changelog(str(tmp_path / "a"), P_SMALL)
    b = cl.write_changelog(str(tmp_path / "b"), P_SMALL)
    import pyarrow.parquet as pq

    for fa, fb in zip(a, b):
        assert pq.read_table(fa).equals(pq.read_table(fb))


def test_generator_delivery_has_duplicates_and_out_of_order():
    order = cl.delivery_order(P_SMALL)
    assert len(order) > P_SMALL.n_events  # duplicates present
    assert not np.all(np.diff(order[: P_SMALL.n_events]) > 0)  # shuffled


def test_oracle_impls_agree():
    fs = oracle.final_state(P_SMALL)
    rd_ = oracle.replay_dict(P_SMALL)
    assert fs.num_rows == len(rd_)
    ids = fs.column("doc_id").to_pylist()
    toks = fs.column("tokens").to_pylist()
    for i in range(0, len(ids), 17):
        assert list(rd_[ids[i]]["tokens"]) == toks[i]


def test_lww_keep_last_writer_and_duplicates():
    t = pa.table(
        {
            "doc_id": ["a", "b", "a", "a", "b"],
            "lsn": [1, 2, 5, 5, 1],  # lsn 5 duplicated verbatim
            "op": ["insert", "insert", "update", "update", "update"],
            "v": [10, 20, 30, 30, 40],
        }
    )
    spec = TableSpec(key="doc_id", order="lsn")
    out = lww.lww_merge(t, spec)
    assert out.num_rows == 2
    d = {r["doc_id"]: r for r in out.to_pylist()}
    assert d["a"]["lsn"] == 5 and d["a"]["v"] == 30
    assert d["b"]["lsn"] == 2 and d["b"]["v"] == 20


def test_lww_insert_only_columns_first_writer_wins():
    t = pa.table(
        {
            "doc_id": ["a", "a"],
            "lsn": [1, 9],
            "op": ["insert", "update"],
            "created_at": [100, 999],
            "v": [1, 2],
        }
    )
    spec = TableSpec(key="doc_id", order="lsn", insert_only=("created_at",))
    out = lww.lww_merge(t, spec)
    row = out.to_pylist()[0]
    assert row["v"] == 2  # LWW column from the newest version
    assert row["created_at"] == 100  # FWW column kept from the oldest version


def test_drop_tombstones():
    t = pa.table({"doc_id": ["a", "b"], "lsn": [1, 2], "op": ["delete", "update"]})
    out = lww.drop_tombstones(t, TableSpec())
    assert out.column("doc_id").to_pylist() == ["b"]


def test_unify_table_add_column_and_widen():
    t = pa.table({"doc_id": ["x"], "n_tok": pa.array([3], pa.int32())})
    target = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()), ("quality", pa.float64())])
    out = sch.unify_table(t, target)
    assert out.schema.equals(target)
    assert out.column("quality").null_count == 1

    with pytest.raises(ValueError):
        sch.unify_table(
            pa.table({"n_tok": pa.array([3], pa.int64())}),
            pa.schema([("n_tok", pa.int32())]),
        )


def test_manifest_commit_atomic_and_immutable(tmp_path):
    lake = str(tmp_path)
    m = mf.Manifest(
        epoch=1, num_partitions=4, schema_version=1, kind="delta",
        partitions={0: mf.PartitionState(pid=0, deltas=["f0"], rows=5, bytes=10,
                                         watermark_lsn=7, applied_lsn_ranges=[[0, 7]])},
        applied_epoch_ids=["abc"],
    )
    mf.commit(lake, m)
    assert mf.is_committed(lake, 1)
    got = mf.latest(lake)
    assert got.partitions[0].rows == 5 and got.applied_epoch_ids == ["abc"]
    with pytest.raises(FileExistsError):
        mf.commit(lake, m)  # committed epochs are immutable


def test_merge_ranges_coalesce():
    r = mf.merge_ranges([], 0, 10)
    r = mf.merge_ranges(r, 11, 20)  # adjacent → coalesce
    r = mf.merge_ranges(r, 40, 50)
    assert r == [[0, 20], [40, 50]]


def test_registry_validates_evolution(tmp_path):
    from vlm_eden_dataset_etl_ray.state.registry import SchemaRegistryState

    reg = SchemaRegistryState(str(tmp_path))
    assert reg.latest_version() == 1
    v2 = reg.find_or_register(sch.PAYLOAD_V2)
    assert v2 == 2
    # idempotent
    assert reg.find_or_register(sch.PAYLOAD_V2) == 2
    # dropping a column is rejected
    bad = pa.schema([("doc_id", pa.string())])
    with pytest.raises(ValueError):
        reg.register(3, bad)
    # persisted across instances
    reg2 = SchemaRegistryState(str(tmp_path))
    assert reg2.latest_version() == 2
    assert reg2.schema(2).equals(sch.PAYLOAD_V2)
