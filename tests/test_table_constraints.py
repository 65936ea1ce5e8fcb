"""Persistent table constraints (Delta CHECK-constraint shape): quality
rules registered through the schema registry — once, like a locked
migration — are audited write-audit-publish style by EVERY subsequent
registry-backed epoch apply, survive registry reloads, merge with
per-call audit rules, and clear explicitly."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray.functions.quality import AuditError
from vlm_eden_dataset_etl_ray.spec import TableSpec
from vlm_eden_dataset_etl_ray.state.registry import (SchemaRegistryState,
                                                     make_registry_actor)

SPEC = TableSpec(name="t_constr", key="k", order="lsn", num_partitions=4,
                 envelope=())


def _schema():
    return pa.schema([("k", pa.string()), ("v", pa.int64())])


def _shard(path, keys, lsns, vals):
    pq.write_table(pa.table({
        "k": pa.array(keys, pa.string()), "lsn": pa.array(lsns, pa.int64()),
        "v": pa.array(vals, pa.int64()),
    }), str(path))
    return str(path)


def test_constraints_enforced_persisted_and_cleared(tmp_path):
    lake_dir = str(tmp_path / "lake")
    reg = make_registry_actor(lake_dir, seed_versions={1: _schema()})
    ray.get(reg.set_constraints.remote([("in_range", "v", 0, 100),
                                        ("not_null", "v")]))

    ok = _shard(tmp_path / "s1.parquet", ["a"], [1], [10])
    m = apply.apply_epoch(lake_dir, [ok], spec=SPEC, registry=reg)
    assert m.epoch == 1

    bad = _shard(tmp_path / "s2.parquet", ["b"], [2], [-1])
    with pytest.raises(AuditError):  # no per-call audit needed
        apply.apply_epoch(lake_dir, [bad], spec=SPEC, registry=reg)
    assert mf.latest(lake_dir).epoch == 1

    # a FRESH registry loaded from the lake still enforces them
    reg2 = make_registry_actor(lake_dir)
    with pytest.raises(AuditError):
        apply.apply_epoch(lake_dir, [bad], spec=SPEC, registry=reg2)

    # per-call audit rules merge with (not replace) the table constraints
    dup = _shard(tmp_path / "s3.parquet", ["c"], [3], [50])
    with pytest.raises(AuditError):
        apply.apply_epoch(lake_dir, [dup], spec=SPEC, registry=reg2,
                          audit=[("in_range", "lsn", 0, 2)])

    # clearing re-admits previously-refused data
    ray.get(reg2.set_constraints.remote([]))
    m = apply.apply_epoch(lake_dir, [bad], spec=SPEC, registry=reg2)
    assert m.epoch == 2
    snap = lake.snapshot(lake_dir, spec=SPEC)
    assert dict(zip(snap.column("k").to_pylist(),
                    snap.column("v").to_pylist())) == {"a": 10, "b": -1}


def test_constraint_generations_latest_wins(tmp_path):
    lake_dir = str(tmp_path / "lake")
    st = SchemaRegistryState(lake_dir, seed_versions={1: _schema()})
    st.set_constraints([("not_null", "v")])
    st.set_constraints([("in_range", "v", 0, 9)])
    st2 = SchemaRegistryState(lake_dir)
    assert st2.constraints() == [("in_range", "v", 0, 9)]
    # malformed rules fail fast at registration
    with pytest.raises(Exception):
        st2.set_constraints([()])
