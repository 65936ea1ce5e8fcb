"""Column-RENAME schema evolution: registry-recorded renames preserve
history — pre-rename files contribute their values under the new name
(unlike drop+re-add, which starts a fresh null generation)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray.spec import TableSpec
from vlm_eden_dataset_etl_ray.state.registry import (
    SchemaRegistryState,
    historical_name,
    make_registry_actor,
)

SPEC = TableSpec(name="ren", key="doc_id", order="lsn", num_partitions=4)

V1 = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                ("source", pa.string())])
V2 = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                ("origin", pa.string())])  # source RENAMED to origin


def _shard(path, rows, col="source"):
    pq.write_table(pa.table({
        "lsn": pa.array([r[1] for r in rows], pa.int64()),
        "op": pa.array([r[2] for r in rows]),
        "doc_id": pa.array([r[0] for r in rows]),
        "n_tok": pa.array([r[3] for r in rows], pa.int64()),
        col: pa.array([r[4] for r in rows]),
    }), path)
    return str(path)


def _build(tmp_path):
    lake_dir = str(tmp_path / "lake")
    reg = make_registry_actor(lake_dir, seed_versions={1: V1})
    f1 = _shard(tmp_path / "p1.parquet",
                [("A", 10, "upsert", 100, "a1"),
                 ("B", 20, "upsert", 200, "b1")])
    apply.apply_epoch(lake_dir, [f1], spec=SPEC, registry=reg)
    assert ray.get(reg.migrate.remote(V2, renames={"source": "origin"})) == 2
    f2 = _shard(tmp_path / "p2.parquet",
                [("B", 40, "upsert", 201, "b2"),
                 ("C", 50, "upsert", 300, "c2")], col="origin")
    apply.apply_epoch(lake_dir, [f2], spec=SPEC, registry=reg)
    return lake_dir


def _state(lake_dir, columns=("doc_id", "lsn", "origin")):
    t = lake.scan(lake_dir, spec=SPEC, columns=list(columns)).take_all()
    return {r["doc_id"]: tuple(r[c] for c in columns[1:]) for r in t}


def test_rename_preserves_pre_rename_values(tmp_path):
    lake_dir = _build(tmp_path)
    got = _state(lake_dir)
    # A's winner is the PRE-rename file: its 'source' value survives as
    # 'origin' (the whole point vs drop+re-add's null generation)
    assert got == {"A": (10, "a1"), "B": (40, "b2"), "C": (50, "c2")}


def test_rename_survives_compaction_and_projection(tmp_path):
    lake_dir = _build(tmp_path)
    lake.compact(lake_dir, spec=SPEC)
    assert _state(lake_dir) == {"A": (10, "a1"), "B": (40, "b2"),
                                "C": (50, "c2")}
    # projected read of only the renamed column
    t = lake.scan(lake_dir, spec=SPEC, columns=["doc_id", "origin"]).take_all()
    assert {r["doc_id"]: r["origin"] for r in t} == {
        "A": "a1", "B": "b2", "C": "c2"}


def test_rename_validation_and_chain_resolution(tmp_path):
    st = SchemaRegistryState(str(tmp_path / "r"), seed_versions={1: V1})
    with pytest.raises(ValueError):
        st.migrate(V2, renames={"nope": "origin"})
    # unchanged schema: idempotent no-op even with renames (retry path)
    assert st.migrate(V1, renames={"source": "source"}) == 1
    # rename onto a LIVE column is rejected (would relabel old data)
    v_both = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                        ("source", pa.string()), ("extra", pa.int64())])
    st_b = SchemaRegistryState(None, seed_versions={1: v_both})
    v_clash = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                         ("source", pa.string())])
    with pytest.raises(ValueError):
        st_b.migrate(v_clash, renames={"extra": "source"})
    assert st.migrate(V2, renames={"source": "origin"}) == 2
    # retrying the SAME rename migration is a no-op, not an error
    assert st.migrate(V2, renames={"source": "origin"}) == 2
    v3 = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                    ("provenance", pa.string())])
    assert st.migrate(v3, renames={"origin": "provenance"}) == 3
    chain = st.column_renames()["provenance"]
    assert chain == [("source", 2), ("origin", 3)]
    assert historical_name("provenance", chain, 1) == "source"
    assert historical_name("provenance", chain, 2) == "origin"
    assert historical_name("provenance", chain, 3) == "provenance"
    # persistence round-trip
    st2 = SchemaRegistryState(str(tmp_path / "r"))
    assert st2.column_renames()["provenance"] == chain


def test_rename_after_readd_keeps_mask(tmp_path):
    """Composition found by fuzz seed 1111: re-add a dropped column, then
    RENAME the re-added column — the activation mask must follow the new
    name, or the pre-drop generation resurrects under it."""
    spec = TableSpec(name="rr", key="doc_id", order="lsn", num_partitions=2)
    v1 = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                    ("src", pa.string())])
    v_drop = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64())])
    lake_dir = str(tmp_path / "lake")
    reg = make_registry_actor(lake_dir, seed_versions={1: v1})
    f1 = _shard(tmp_path / "p1.parquet",
                [("A", 10, "upsert", 100, "old-gen-a")], col="src")
    apply.apply_epoch(lake_dir, [f1], spec=spec, registry=reg)
    ray.get(reg.migrate.remote(v_drop))           # drop src
    ray.get(reg.migrate.remote(v1))               # re-add src (fresh gen)
    v_ren = pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64()),
                       ("origin", pa.string())])
    ray.get(reg.migrate.remote(v_ren, renames={"src": "origin"}))
    got = lake.scan(lake_dir, spec=spec,
                    columns=["doc_id", "origin"]).take_all()
    assert got == [{"doc_id": "A", "origin": None}]  # NOT "old-gen-a"
    # writes after the re-add+rename are visible
    f2 = _shard(tmp_path / "p2.parquet",
                [("A", 20, "upsert", 101, "new-gen-a")], col="origin")
    apply.apply_epoch(lake_dir, [f2], spec=spec, registry=reg)
    got = lake.scan(lake_dir, spec=spec,
                    columns=["doc_id", "origin"]).take_all()
    assert got == [{"doc_id": "A", "origin": "new-gen-a"}]


def test_rename_onto_tombstoned_name_refused(tmp_path):
    st = SchemaRegistryState(str(tmp_path / "r2"), seed_versions={1: pa.schema(
        [("doc_id", pa.string()), ("a", pa.string()), ("b", pa.string())])})
    st.migrate(pa.schema([("doc_id", pa.string()), ("a", pa.string())]))  # drop b
    with pytest.raises(ValueError, match="tombstoned"):
        st.migrate(pa.schema([("doc_id", pa.string()), ("b", pa.string())]),
                   renames={"a": "b"})
