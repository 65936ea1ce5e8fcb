"""Drop-column + re-add schema evolution — the reference's
``migrations/20241029_01_JnkId.sql:4-16`` migration shape (DROP COLUMN
``technicians_id`` then ADD ``radiologist_technician_id``), generalized to
drop + re-add of the SAME column name: a re-added column is a fresh
generation, so rows whose LWW winner predates the re-add must read NULL —
pre-drop values must never resurrect, not even from still-live epoch-1
parquet files (per-file schema-version masking at merge-on-read), and a
compaction must physically erase them.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from vlm_eden_dataset_etl_ray import apply, lake, manifest as mf
from vlm_eden_dataset_etl_ray.spec import TableSpec
from vlm_eden_dataset_etl_ray.state.registry import (
    SchemaRegistryState,
    make_registry_actor,
    validate_evolution,
)

SPEC = TableSpec(name="evolve", key="doc_id", order="lsn", num_partitions=4)

V1 = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                ("source", pa.string())])
DROPPED = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64())])


def _shard(path, rows, with_source=True):
    cols = {
        "lsn": pa.array([r[1] for r in rows], pa.int64()),
        "op": pa.array([r[2] for r in rows]),
        "doc_id": pa.array([r[0] for r in rows]),
        "n_tok": pa.array([r[3] for r in rows], pa.int64()),
    }
    if with_source:
        cols["source"] = pa.array([r[4] for r in rows])
    pq.write_table(pa.table(cols), path)
    return str(path)


def _final(lake_dir):
    t = lake.scan(lake_dir, spec=SPEC,
                  columns=["doc_id", "lsn", "n_tok", "source"]).take_all()
    return {r["doc_id"]: (r["lsn"], r["n_tok"], r["source"]) for r in t}


def _build(tmp_path):
    """Three epochs: v1 (with source) -> DROP -> v2 -> RE-ADD -> v3.

    Expected final state:
      A: winner lsn=10 from the v1 file   -> source reads NULL (masked);
         a stale v3 row (lsn=5, source='stale') must LOSE the LWW merge.
      B: winner lsn=40 from the v2 epoch  -> source NULL (column absent)
      C: deleted in epoch 2
      D: winner lsn=60 from the v3 epoch  -> source='d3' (fresh generation)
    """
    lake_dir = str(tmp_path / "lake")
    reg = make_registry_actor(lake_dir, seed_versions={1: V1})
    f1 = _shard(tmp_path / "p1.parquet",
                [("A", 10, "upsert", 100, "a1"), ("B", 20, "upsert", 200, "b1"),
                 ("C", 30, "upsert", 300, "c1")])
    apply.apply_epoch(lake_dir, [f1], spec=SPEC, registry=reg)
    assert ray.get(reg.migrate.remote(DROPPED)) == 2
    f2 = _shard(tmp_path / "p2.parquet",
                [("B", 40, "upsert", 201), ("C", 50, "delete", 0)],
                with_source=False)
    apply.apply_epoch(lake_dir, [f2], spec=SPEC, registry=reg)
    assert ray.get(reg.migrate.remote(V1)) == 3
    f3 = _shard(tmp_path / "p3.parquet",
                [("D", 60, "upsert", 400, "d3"), ("A", 5, "upsert", 99, "stale")])
    apply.apply_epoch(lake_dir, [f3], spec=SPEC, registry=reg)
    return lake_dir


EXPECTED = {"A": (10, 100, None), "B": (40, 201, None), "D": (60, 400, "d3")}


def test_drop_readd_masks_pre_drop_values(tmp_path):
    lake_dir = _build(tmp_path)
    assert _final(lake_dir) == EXPECTED


def test_compaction_physically_erases_dropped_values(tmp_path):
    lake_dir = _build(tmp_path)
    lake.compact(lake_dir, spec=SPEC)
    assert _final(lake_dir) == EXPECTED
    # the compacted base files must not physically retain pre-drop values
    m = mf.latest(lake_dir)
    vals = {}
    for pid in m.partitions:
        for f in m.partitions[pid].base:
            t = pq.read_table(f)
            for r in t.to_pylist():
                vals[r["doc_id"]] = r.get("source")
    assert vals.get("A") is None and vals.get("B") is None
    assert vals.get("D") == "d3"


def test_drop_window_scan_excludes_column(tmp_path):
    """While a column is dropped (before any re-add) it leaves the scan
    projection entirely — like a Postgres DROP COLUMN."""
    lake_dir = str(tmp_path / "lake")
    reg = make_registry_actor(lake_dir, seed_versions={1: V1})
    f1 = _shard(tmp_path / "p1.parquet", [("A", 10, "upsert", 100, "a1")])
    apply.apply_epoch(lake_dir, [f1], spec=SPEC, registry=reg)
    ray.get(reg.migrate.remote(DROPPED))
    t = lake.scan(lake_dir, spec=SPEC).take_all()
    assert t and all("source" not in r for r in t)


def test_registry_state_persists_across_reload(tmp_path):
    lake_dir = _build(tmp_path)
    st = SchemaRegistryState(lake_dir)
    assert st.current_drops() == {}          # re-added -> no longer dropped
    assert st.column_activations() == {"source": 3}
    assert st.latest_version() == 3
    # largest-equal-version wins so manifests never regress
    assert st.find_or_register(V1) == 3


def test_inference_path_still_rejects_drops():
    st = SchemaRegistryState(None, seed_versions={1: V1})
    with pytest.raises(ValueError, match="dropped column"):
        st.register(2, DROPPED)


def test_validate_evolution_contract():
    assert validate_evolution(V1, DROPPED, allow_drop=True) == ["source"]
    with pytest.raises(ValueError, match="narrows"):
        validate_evolution(V1, pa.schema([("doc_id", pa.string()),
                                          ("n_tok", pa.int32()),
                                          ("source", pa.string())]),
                           allow_drop=True)


def test_migrate_idempotent(tmp_path):
    lake_dir = str(tmp_path / "lk")
    st = SchemaRegistryState(lake_dir, seed_versions={1: V1})
    assert st.migrate(V1) == 1
    assert st.migrate(DROPPED) == 2
    assert st.migrate(DROPPED) == 2
    assert st.current_drops() == {"source": 2}


def test_schema_history_reports_deltas(tmp_path):
    import pyarrow as pa

    from vlm_eden_dataset_etl_ray.state.registry import (
        SchemaRegistryState, schema_history)

    lake = str(tmp_path / "lake")
    st = SchemaRegistryState(lake)
    base = st.schema()
    st.register(2, pa.schema(list(base) + [pa.field("extra", pa.float64())]))
    st.migrate(pa.schema([f for f in st.schema() if f.name != "extra"]))
    h = schema_history(lake)
    assert h.column("version").to_pylist() == [1, 2, 3]
    assert h.column("added").to_pylist()[1] == "extra"
    assert h.column("dropped").to_pylist()[2] == "extra"
    # a fresh driver sees the same history (persisted, actor-free read)
    assert schema_history(lake).equals(h)
