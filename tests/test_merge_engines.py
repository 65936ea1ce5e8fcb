"""Merge-engine semantics: column-level partial-update and per-column
aggregation folds (stages/merge_engines.py) — unit-level associativity /
out-of-order / delete laws, plus end-to-end lake replay through
apply_epoch → merge-on-read under multi-epoch out-of-order delivery.

Reference contrast: the reference's only merge discipline is row-level
ON CONFLICT DO UPDATE (queries/fact_studies.py:63-83); these engines extend
it to changed-columns-only CDC feeds and pre-aggregated sinks.
"""

import itertools
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from vlm_eden_dataset_etl_ray.spec import TableSpec
from vlm_eden_dataset_etl_ray.stages import merge_engines as me

PARTIAL_SPEC = TableSpec(
    name="profiles", key="doc_id", order="lsn", num_partitions=4,
    envelope=(), merge_engine="partial_update",
)

AGG_SPEC = TableSpec(
    name="totals", key="doc_id", order="lsn", num_partitions=4,
    envelope=(), merge_engine="aggregate", on_delete="ignore",
    aggregations=(("amount", "sum"), ("n", "count"), ("hi", "max"),
                  ("lo", "min"), ("flag", "bool_or"),
                  ("last_note", "last_non_null"),
                  ("first_note", "first_non_null")),
)


def _ev(key, lsn, op="upsert", **cols):
    return {"doc_id": key, "lsn": lsn, "op": op, **cols}


def _events_table(rows, fields):
    """rows: list of dicts; fields: (name, type) for value columns."""
    out = {
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
        "lsn": pa.array([r["lsn"] for r in rows], pa.int64()),
        "op": pa.array([r["op"] for r in rows], pa.string()),
    }
    for name, typ in fields:
        out[name] = pa.array([r.get(name) for r in rows], typ)
    return pa.table(out)


PFIELDS = [("bio", pa.string()), ("score", pa.float64())]


def _final(t: pa.Table, spec: TableSpec, live=True) -> dict:
    """state table → {key: {col: value}} for live rows."""
    t = me.strip_internal(t)
    res = {}
    for row in t.to_pylist():
        if live and row[spec.op_col] == spec.delete_op:
            continue
        res[row[spec.key]] = {k: v for k, v in row.items()
                              if k not in (spec.key, spec.op_col, spec.order)}
    return res


def _serial_partial_oracle(rows):
    """Row-at-a-time reference: apply events in LSN order; delete resets."""
    state: dict = {}
    for r in sorted(rows, key=lambda r: r["lsn"]):
        if r["op"] == "delete":
            state[r["doc_id"]] = None  # tombstone (resets all columns)
            continue
        # every upsert asserts row existence (all-null payload → null row)
        cur = state.get(r["doc_id"]) or {name: None for name, _ in PFIELDS}
        for name, _ in PFIELDS:
            if r.get(name) is not None:
                cur[name] = r[name]
        state[r["doc_id"]] = cur
    return {k: v for k, v in state.items() if v is not None}


PROWS = [
    _ev("a", 1, bio="hello", score=1.0),
    _ev("a", 3, score=2.5),             # partial: bio untouched
    _ev("a", 2, bio="stale"),           # out of order: loses to nothing newer on bio? (3 didn't write bio → 2 wins bio)
    _ev("b", 1, bio="b-bio"),
    _ev("b", 2, op="delete"),
    _ev("b", 4, score=9.0),             # recreate after delete: bio must be NULL
    _ev("c", 5, bio="c1", score=0.5),
    _ev("c", 6, op="delete"),           # c ends dead
    _ev("d", 7, bio=None, score=None),  # all-null upsert: d exists, all null
]


def test_partial_fold_matches_serial_oracle():
    t = _events_table(PROWS, PFIELDS)
    folded = me.fold_partial(t, PARTIAL_SPEC)
    got = _final(folded, PARTIAL_SPEC)
    assert got == {
        "a": {"bio": "stale", "score": 2.5},
        "b": {"bio": None, "score": 9.0},
        "d": {"bio": None, "score": None},
    }
    assert got == _serial_partial_oracle(PROWS)


def test_partial_fold_associative_any_split():
    """Folding any batch split, in any order, equals the one-shot fold —
    the law that makes the same code valid as pre-reduce, stage-2 reduce,
    merge-on-read and compaction."""
    t_full = me.fold_partial(_events_table(PROWS, PFIELDS), PARTIAL_SPEC)
    want = _final(t_full, PARTIAL_SPEC, live=False)
    rng = np.random.default_rng(7)
    for trial in range(12):
        rows = list(PROWS)
        rng.shuffle(rows)
        cut1, cut2 = sorted(rng.integers(0, len(rows) + 1, size=2))
        parts = [rows[:cut1], rows[cut1:cut2], rows[cut2:]]
        states = [me.fold_partial(_events_table(p, PFIELDS), PARTIAL_SPEC)
                  for p in parts if p]
        merged = me.fold_partial(pa.concat_tables(states), PARTIAL_SPEC)
        assert _final(merged, PARTIAL_SPEC, live=False) == want, f"trial {trial}"


def test_partial_fold_idempotent_duplicate_delivery():
    t = _events_table(PROWS + PROWS, PFIELDS)  # verbatim duplicates
    folded = me.fold_partial(t, PARTIAL_SPEC)
    assert _final(folded, PARTIAL_SPEC) == _serial_partial_oracle(PROWS)
    refolded = me.fold_partial(folded, PARTIAL_SPEC)  # fold of a fold
    assert _final(refolded, PARTIAL_SPEC) == _serial_partial_oracle(PROWS)


def test_partial_projection_preserves_tombstones():
    """Merging a PROJECTED subset of value columns must still resolve row
    liveness exactly (the __live_lsn invariant)."""
    folded = me.fold_partial(_events_table(PROWS, PFIELDS), PARTIAL_SPEC)
    proj = folded.select(["doc_id", "lsn", "op", "bio", "__seq__bio",
                          "__del_lsn", "__live_lsn"])
    refolded = me.fold_partial(proj, PARTIAL_SPEC)
    got = _final(refolded, PARTIAL_SPEC)
    assert set(got) == {"a", "b", "d"}  # c stays dead — and b stays LIVE
    # even though b's liveness comes from `score`, which the projection
    # dropped (__live_lsn carries it)
    assert got["b"] == {"bio": None}


def test_partial_on_delete_policies():
    rows = [_ev("a", 1, bio="x"), _ev("a", 2, op="delete")]
    t = _events_table(rows, PFIELDS)
    ignore = me.fold_partial(
        t, TableSpec(name="p", key="doc_id", order="lsn", envelope=(),
                     merge_engine="partial_update", on_delete="ignore"))
    assert _final(ignore, PARTIAL_SPEC) == {"a": {"bio": "x", "score": None}}
    with pytest.raises(ValueError, match="on_delete"):
        me.fold_partial(
            t, TableSpec(name="p", key="doc_id", order="lsn", envelope=(),
                         merge_engine="partial_update", on_delete="error"))


AROWS = [
    _ev("a", 1, amount=10.0, n=1, hi=5, lo=5, flag=False,
        last_note="first", first_note="first"),
    _ev("a", 3, amount=2.5, n=1, hi=9, lo=3, flag=True,
        last_note="third", first_note=None),
    _ev("a", 2, amount=None, n=None, hi=7, lo=None, flag=None,
        last_note=None, first_note="second"),
    _ev("b", 4, amount=-1.0, n=1, hi=None, lo=None, flag=False,
        last_note=None, first_note=None),
]

AFIELDS = [("amount", pa.float64()), ("n", pa.int64()), ("hi", pa.int64()),
           ("lo", pa.int64()), ("flag", pa.bool_()),
           ("last_note", pa.string()), ("first_note", pa.string())]

AWANT = {
    "a": {"amount": 12.5, "n": 2, "hi": 9, "lo": 3, "flag": True,
          "last_note": "third", "first_note": "first"},
    "b": {"amount": -1.0, "n": 1, "hi": None, "lo": None, "flag": False,
          "last_note": None, "first_note": None},
}


def test_aggregate_fold_semantics():
    folded = me.fold_aggregate(_events_table(AROWS, AFIELDS), AGG_SPEC)
    assert _final(folded, AGG_SPEC) == AWANT


def test_aggregate_fold_associative_any_split():
    rng = np.random.default_rng(11)
    for trial in range(12):
        rows = list(AROWS)
        rng.shuffle(rows)
        cut = int(rng.integers(0, len(rows) + 1))
        parts = [p for p in (rows[:cut], rows[cut:]) if p]
        states = [me.fold_aggregate(_events_table(p, AFIELDS), AGG_SPEC)
                  for p in parts]
        merged = me.fold_aggregate(pa.concat_tables(states), AGG_SPEC)
        assert _final(merged, AGG_SPEC) == AWANT, f"trial {trial}"


def test_aggregate_rejects_deletes_unless_ignored():
    rows = AROWS + [_ev("a", 9, op="delete")]
    t = _events_table(rows, AFIELDS)
    with pytest.raises(ValueError, match="delete"):
        me.fold_aggregate(
            t, TableSpec(name="totals", key="doc_id", order="lsn",
                         envelope=(), merge_engine="aggregate",
                         aggregations=AGG_SPEC.aggregations))
    ok = me.fold_aggregate(t, AGG_SPEC)  # on_delete="ignore"
    assert _final(ok, AGG_SPEC) == AWANT


def test_aggregate_string_minmax():
    spec = TableSpec(name="s", key="doc_id", order="lsn", envelope=(),
                     merge_engine="aggregate",
                     aggregations=(("w_min", "min"), ("w_max", "max")))
    rows = [_ev("a", 1, w_min="pear", w_max="pear"),
            _ev("a", 2, w_min=None, w_max=None),
            _ev("a", 3, w_min="apple", w_max="apple"),
            _ev("b", 4, w_min=None, w_max=None)]
    folded = me.fold_aggregate(
        _events_table(rows, [("w_min", pa.string()), ("w_max", pa.string())]),
        spec)
    got = _final(folded, spec)
    assert got == {"a": {"w_min": "apple", "w_max": "pear"},
                   "b": {"w_min": None, "w_max": None}}


def test_aggregate_undeclared_column_rejected():
    spec = TableSpec(name="t", key="doc_id", order="lsn", envelope=(),
                     merge_engine="aggregate", aggregations=(("x", "sum"),))
    t = pa.table({"doc_id": ["a"], "lsn": pa.array([1], pa.int64()),
                  "op": ["upsert"], "x": [1.0], "y": [2.0]})
    with pytest.raises(ValueError, match="no aggregation declared"):
        me.fold_aggregate(t, spec)


# ---------------------------------------------------------------------------
# end-to-end: through apply_epoch → manifest → merge-on-read, multi-epoch,
# out-of-order across epochs
# ---------------------------------------------------------------------------


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(batches) if batches else pa.table({})


def _write_changelog(rows, fields, path):
    import pyarrow.parquet as pq

    pq.write_table(_events_table(rows, fields), path)
    return path


def test_partial_update_lake_replay(ray_session, tmp_path):
    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import lake as lake_mod

    lake_dir = str(tmp_path / "plake")
    # epoch 1: the "early" events; epoch 2 carries BOTH later and OLDER
    # LSNs (cross-epoch out-of-order) — per-column seqs must keep newer
    # columns from being clobbered by the late old event
    e1 = [_ev("a", 5, bio="new-bio"), _ev("b", 1, bio="b0", score=1.0),
          _ev("c", 2, bio="c0", score=2.0)]
    e2 = [_ev("a", 3, bio="OLD", score=7.0),  # late: bio loses, score wins
          _ev("b", 6, op="delete"),
          _ev("c", 8, score=3.5)]
    f1 = _write_changelog(e1, PFIELDS, str(tmp_path / "c1.parquet"))
    f2 = _write_changelog(e2, PFIELDS, str(tmp_path / "c2.parquet"))
    apply_mod.apply_epoch(lake_dir, [f1], spec=PARTIAL_SPEC)
    apply_mod.apply_epoch(lake_dir, [f2], spec=PARTIAL_SPEC)

    got = _collect(lake_mod.scan(lake_dir, spec=PARTIAL_SPEC))
    res = {r["doc_id"]: r for r in got.to_pylist()}
    assert set(res) == {"a", "c"}
    assert res["a"]["bio"] == "new-bio" and res["a"]["score"] == 7.0
    assert res["c"]["bio"] == "c0" and res["c"]["score"] == 3.5
    # live scans hide the engine-internal state columns
    assert not any(c.startswith("__") for c in got.column_names)
    # projected scan still resolves tombstones (b must not reappear)
    proj = _collect(lake_mod.scan(lake_dir, spec=PARTIAL_SPEC,
                                  columns=["doc_id", "bio"]))
    assert sorted(proj.column("doc_id").to_pylist()) == ["a", "c"]


def test_partial_update_lake_compaction_preserves_state(ray_session, tmp_path):
    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import lake as lake_mod

    lake_dir = str(tmp_path / "plake2")
    e1 = [_ev("a", 5, bio="keep-bio"), _ev("b", 2, bio="b0")]
    e2 = [_ev("a", 6, score=1.5)]
    e3 = [_ev("a", 4, bio="stale", score=0.25)]  # late, loses both columns
    files = [_write_changelog(e, PFIELDS, str(tmp_path / f"cc{i}.parquet"))
             for i, e in enumerate((e1, e2, e3))]
    apply_mod.apply_epoch(lake_dir, [files[0]], spec=PARTIAL_SPEC)
    apply_mod.apply_epoch(lake_dir, [files[1]], spec=PARTIAL_SPEC)
    lake_mod.compact(lake_dir, spec=PARTIAL_SPEC)
    apply_mod.apply_epoch(lake_dir, [files[2]], spec=PARTIAL_SPEC)
    got = {r["doc_id"]: r for r in _collect(
        lake_mod.scan(lake_dir, spec=PARTIAL_SPEC)).to_pylist()}
    assert got["a"]["bio"] == "keep-bio" and got["a"]["score"] == 1.5
    assert got["b"]["bio"] == "b0"


def test_aggregate_lake_replay(ray_session, tmp_path):
    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import lake as lake_mod

    lake_dir = str(tmp_path / "alake")
    half = len(AROWS) // 2
    f1 = _write_changelog(AROWS[:half], AFIELDS, str(tmp_path / "a1.parquet"))
    f2 = _write_changelog(AROWS[half:], AFIELDS, str(tmp_path / "a2.parquet"))
    apply_mod.apply_epoch(lake_dir, [f1], spec=AGG_SPEC)
    apply_mod.apply_epoch(lake_dir, [f2], spec=AGG_SPEC)
    got = _collect(lake_mod.scan(lake_dir, spec=AGG_SPEC))
    res = {r["doc_id"]: {k: v for k, v in r.items()
                         if k in dict(AGG_SPEC.aggregations)}
           for r in got.to_pylist()}
    assert res == AWANT
    assert not any(c.startswith("__") for c in got.column_names)


def test_partial_update_dml_and_merge_into(ray_session, tmp_path):
    """Predicate DML + MERGE INTO compose with the partial-update engine:
    a narrow MERGE source is the engine's native input (no fill read),
    DELETE WHERE tombstones fold as delete-resets."""
    import ray.data as rd

    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import dml
    from vlm_eden_dataset_etl_ray import lake as lake_mod

    lake_dir = str(tmp_path / "pdml")
    rows = [_ev("a", 1, bio="a-bio", score=1.0),
            _ev("b", 2, bio="b-bio", score=2.0),
            _ev("c", 3, bio="c-bio", score=3.0)]
    f = _write_changelog(rows, PFIELDS, str(tmp_path / "pd.parquet"))
    apply_mod.apply_epoch(lake_dir, [f], spec=PARTIAL_SPEC)

    # narrow MERGE: only score arrives; bio must survive per-column
    src = rd.from_arrow(pa.table({
        "doc_id": pa.array(["a", "z"]), "score": pa.array([10.0, 0.5])}))
    dml.merge_into(lake_dir, src, spec=PARTIAL_SPEC, op_id="m1")
    got = {r["doc_id"]: r for r in _collect(
        lake_mod.scan(lake_dir, spec=PARTIAL_SPEC)).to_pylist()}
    assert got["a"] == {"doc_id": "a", "lsn": got["a"]["lsn"], "op": "upsert",
                        "bio": "a-bio", "score": 10.0}
    assert got["z"]["bio"] is None and got["z"]["score"] == 0.5

    dml.delete_where(lake_dir, [("score", ">", 5.0)], spec=PARTIAL_SPEC)
    got = {r["doc_id"]: r for r in _collect(
        lake_mod.scan(lake_dir, spec=PARTIAL_SPEC)).to_pylist()}
    assert set(got) == {"b", "c", "z"}  # a (10.0) deleted

    dml.update_where(lake_dir, [("doc_id", "==", "b")],
                     {"score": ("add", 100.0)}, spec=PARTIAL_SPEC)
    got = {r["doc_id"]: r for r in _collect(
        lake_mod.scan(lake_dir, spec=PARTIAL_SPEC)).to_pylist()}
    assert got["b"]["score"] == 102.0 and got["b"]["bio"] == "b-bio"


def test_aggregate_dml_guards(ray_session, tmp_path):
    import ray.data as rd

    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import dml

    lake_dir = str(tmp_path / "adml")
    f = _write_changelog(AROWS, AFIELDS, str(tmp_path / "ad.parquet"))
    apply_mod.apply_epoch(lake_dir, [f], spec=AGG_SPEC)
    with pytest.raises(ValueError, match="aggregate"):
        dml.delete_where(lake_dir, [("amount", ">", 0.0)], spec=AGG_SPEC)
    with pytest.raises(ValueError, match="aggregate"):
        dml.update_where(lake_dir, [("amount", ">", 0.0)],
                         {"amount": ("add", 1.0)}, spec=AGG_SPEC)
    with pytest.raises(ValueError, match="aggregate"):
        dml.merge_into(
            lake_dir,
            rd.from_arrow(pa.table({"doc_id": ["a"],
                                    "amount": [1.0]})),
            spec=AGG_SPEC, op_id="m1")


def test_partial_update_rename_evolution(ray_session, tmp_path):
    """A registry RENAME on a partial-update lake renames the per-column
    seq state in lockstep: pre-rename files keep contributing their values
    (and their per-column LSN priority) under the new name."""
    import pyarrow.parquet as pq
    import ray

    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import lake as lake_mod
    from vlm_eden_dataset_etl_ray.state.registry import make_registry_actor

    spec = TableSpec(name="pren", key="doc_id", order="lsn",
                     num_partitions=4, merge_engine="partial_update")
    v1 = pa.schema([("doc_id", pa.string()), ("bio", pa.string()),
                    ("score", pa.float64())])
    v2 = pa.schema([("doc_id", pa.string()), ("profile", pa.string()),
                    ("score", pa.float64())])  # bio RENAMED to profile
    lake_dir = str(tmp_path / "lake")
    reg = make_registry_actor(lake_dir, seed_versions={1: v1})

    def shard(path, rows, col="bio"):
        pq.write_table(pa.table({
            "lsn": pa.array([r[1] for r in rows], pa.int64()),
            "op": pa.array([r[2] for r in rows]),
            "schema_ver": pa.array([r[5] for r in rows], pa.int64()),
            "doc_id": pa.array([r[0] for r in rows]),
            col: pa.array([r[3] for r in rows]),
            "score": pa.array([r[4] for r in rows], pa.float64()),
        }), path)
        return str(path)

    f1 = shard(tmp_path / "p1.parquet",
               [("A", 10, "upsert", "a-bio", 1.0, 1),
                ("B", 20, "upsert", "b-bio", 2.0, 1)])
    apply_mod.apply_epoch(lake_dir, [f1], spec=spec, registry=reg)
    assert ray.get(reg.migrate.remote(v2, renames={"bio": "profile"})) == 2
    # epoch 2: only SCORE updates (partial), older lsn for A's profile —
    # the pre-rename seq must keep A's bio value winning under 'profile'
    f2 = shard(tmp_path / "p2.parquet",
               [("A", 5, "upsert", "stale", 9.0, 2),
                ("C", 40, "upsert", "c-prof", 3.0, 2)], col="profile")
    apply_mod.apply_epoch(lake_dir, [f2], spec=spec, registry=reg)

    got = {r["doc_id"]: r for r in _collect(lake_mod.scan(
        lake_dir, spec=spec, columns=["doc_id", "profile", "score"])
    ).to_pylist()}
    # A: profile = pre-rename 'a-bio' (lsn 10 beats the late lsn-5 write),
    #    score = 9.0 (lsn 5 is A's only score? no — epoch1 wrote 1.0@10)
    assert got["A"]["profile"] == "a-bio" and got["A"]["score"] == 1.0
    assert got["B"]["profile"] == "b-bio"
    assert got["C"]["profile"] == "c-prof" and got["C"]["score"] == 3.0
    # compaction (rewrites base files with CURRENT names) preserves all
    lake_mod.compact(lake_dir, spec=spec)
    got2 = {r["doc_id"]: r for r in _collect(lake_mod.scan(
        lake_dir, spec=spec, columns=["doc_id", "profile", "score"])
    ).to_pylist()}
    assert {k: (v["profile"], v["score"]) for k, v in got2.items()} == \
        {k: (v["profile"], v["score"]) for k, v in got.items()}


def test_partial_update_change_feed_lookup_producer(ray_session, tmp_path):
    """change_feed on a partial-update lake: with before_image=True the
    'lookup producer' completes each changed key's FULL after-image by
    folding the pre-range state into the range fold (a bare range fold
    only carries the columns written in range)."""
    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import lake as lake_mod

    lake_dir = str(tmp_path / "pfeed")
    e1 = [_ev("a", 1, bio="a-bio", score=1.0),
          _ev("b", 2, bio="b-bio", score=2.0),
          _ev("c", 3, bio="c-bio", score=3.0)]
    # range epoch: partial column writes, an insert, and a delete
    e2 = [_ev("a", 10, score=5.0),           # update: bio untouched
          _ev("d", 11, bio="d-bio"),         # insert
          _ev("c", 12, op="delete")]         # delete
    f1 = _write_changelog(e1, PFIELDS, str(tmp_path / "f1.parquet"))
    f2 = _write_changelog(e2, PFIELDS, str(tmp_path / "f2.parquet"))
    m1 = apply_mod.apply_epoch(lake_dir, [f1], spec=PARTIAL_SPEC)
    apply_mod.apply_epoch(lake_dir, [f2], spec=PARTIAL_SPEC)

    feed = _collect(lake_mod.change_feed(
        lake_dir, from_epoch=m1.epoch, spec=PARTIAL_SPEC, before_image=True))
    assert not any(c.startswith("__") for c in feed.column_names)
    rows = {r["doc_id"]: r for r in feed.to_pylist()}
    assert set(rows) == {"a", "c", "d"}  # b unchanged → not in feed
    a = rows["a"]
    assert a["_change_type"] == "update"
    assert a["bio"] == "a-bio" and a["score"] == 5.0  # COMPLETED after-image
    assert a["_before"]["bio"] == "a-bio" and a["_before"]["score"] == 1.0
    d = rows["d"]
    assert d["_change_type"] == "insert" and d["_before"] is None
    assert d["bio"] == "d-bio" and d["score"] is None
    c = rows["c"]
    assert c["_change_type"] == "delete"
    assert c["_before"]["bio"] == "c-bio"

    # without before images: finalized range fold (partial after-images)
    feed2 = _collect(lake_mod.change_feed(
        lake_dir, from_epoch=m1.epoch, spec=PARTIAL_SPEC))
    r2 = {r["doc_id"]: r for r in feed2.to_pylist()}
    assert r2["a"]["score"] == 5.0 and r2["a"]["bio"] is None  # range-only
    assert r2["a"]["_change_type"] == "upsert"
    assert r2["c"]["_change_type"] == "delete"


def test_aggregate_change_feed_completes_accumulators(ray_session, tmp_path):
    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import lake as lake_mod

    spec = TableSpec(name="afeed", key="doc_id", order="lsn", envelope=(),
                     num_partitions=4, merge_engine="aggregate",
                     on_delete="ignore",
                     aggregations=(("amount", "sum"), ("n", "count")))
    fields = [("amount", pa.float64()), ("n", pa.int64())]
    lake_dir = str(tmp_path / "afeed")
    f1 = _write_changelog([_ev("a", 1, amount=10.0, n=1),
                           _ev("a", 2, amount=5.0, n=1)], fields,
                          str(tmp_path / "a1.parquet"))
    f2 = _write_changelog([_ev("a", 3, amount=2.0, n=1),
                           _ev("b", 4, amount=1.0, n=1)], fields,
                          str(tmp_path / "a2.parquet"))
    m1 = apply_mod.apply_epoch(lake_dir, [f1], spec=spec)
    apply_mod.apply_epoch(lake_dir, [f2], spec=spec)
    feed = {r["doc_id"]: r for r in _collect(lake_mod.change_feed(
        lake_dir, from_epoch=m1.epoch, spec=spec, before_image=True)
    ).to_pylist()}
    assert feed["a"]["amount"] == 17.0 and feed["a"]["n"] == 3  # completed
    assert feed["a"]["_change_type"] == "update"
    assert feed["a"]["_before"]["amount"] == 15.0
    assert feed["b"]["_change_type"] == "insert" and feed["b"]["amount"] == 1.0


def test_aggregate_view_over_partial_lake(ray_session, tmp_path):
    """Incremental view maintenance composes with the partial-update
    engine by construction (IVM folds contribs from finalized
    merge-on-read scans pinned to the before/after manifests): a grouped
    sum/count view over a partial lake converges across partial column
    writes and delete-resets."""
    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray.views import (ViewSpec,
                                                apply_epoch_with_views,
                                                read_view)

    spec = TableSpec(name="pview", key="doc_id", order="lsn", envelope=(),
                     num_partitions=4, merge_engine="partial_update")
    vroot = str(tmp_path / "views")
    lake_dir = str(tmp_path / "lake")
    vs = [ViewSpec(name="by_bio", group_cols=["bio"], count_alias="n",
                   sum_cols={"score": "total"})]
    e1 = [_ev("a", 1, bio="x", score=1.0), _ev("b", 2, bio="x", score=2.0),
          _ev("c", 3, bio="y", score=4.0)]
    e2 = [_ev("a", 10, score=7.0),        # partial: a stays in group x
          _ev("b", 11, op="delete"),      # delete-reset: leaves group x
          _ev("d", 12, bio="y", score=1.0)]
    f1 = _write_changelog(e1, PFIELDS, str(tmp_path / "v1.parquet"))
    f2 = _write_changelog(e2, PFIELDS, str(tmp_path / "v2.parquet"))
    apply_epoch_with_views(lake_dir, [f1], vs, vroot, spec=spec)
    apply_epoch_with_views(lake_dir, [f2], vs, vroot, spec=spec)
    got = {r["bio"]: (r["n"], r["total"]) for r in _collect(
        read_view(vroot, "by_bio")).to_pylist()}
    # x: only a (score 7.0) — b deleted; y: c (4.0) + d (1.0)
    assert got == {"x": (1, 7.0), "y": (2, 5.0)}


def test_partial_update_tokens_payload(ray_session, tmp_path):
    """The flagship token-sequence payload (list<int32>) through the
    partial-update engine: a re-tokenization event carries ONLY the tokens
    column; metadata columns keep their own last writers; per-row
    token-array equality against the per-column serial rule."""
    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import lake as lake_mod

    spec = TableSpec(name="ptok", key="doc_id", order="lsn", envelope=(),
                     num_partitions=4, merge_engine="partial_update")
    fields = [("tokens", pa.list_(pa.int32())), ("source", pa.string())]
    rows = [
        _ev("a", 1, tokens=[1, 2, 3], source="crawl"),
        _ev("a", 5, tokens=[9, 9]),          # re-tokenized; source untouched
        _ev("a", 3, source="books"),         # metadata-only update
        _ev("b", 2, tokens=[7], source="web"),
        _ev("b", 4, op="delete"),
        _ev("b", 6, tokens=[8, 8, 8]),       # recreated: source resets
    ]
    f = _write_changelog(rows, fields, str(tmp_path / "tok.parquet"))
    lake_dir = str(tmp_path / "lake")
    apply_mod.apply_epoch(lake_dir, [f], spec=spec)
    got = {r["doc_id"]: r for r in _collect(
        lake_mod.scan(lake_dir, spec=spec)).to_pylist()}
    assert got["a"]["tokens"] == [9, 9] and got["a"]["source"] == "books"
    assert got["b"]["tokens"] == [8, 8, 8] and got["b"]["source"] is None


def test_aggregate_lake_compaction_preserves_accumulators(ray_session,
                                                          tmp_path):
    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import lake as lake_mod

    lake_dir = str(tmp_path / "alake2")
    half = len(AROWS) // 2
    f1 = _write_changelog(AROWS[:half], AFIELDS, str(tmp_path / "c1.parquet"))
    f2 = _write_changelog(AROWS[half:], AFIELDS, str(tmp_path / "c2.parquet"))
    apply_mod.apply_epoch(lake_dir, [f1], spec=AGG_SPEC)
    lake_mod.compact(lake_dir, spec=AGG_SPEC)
    apply_mod.apply_epoch(lake_dir, [f2], spec=AGG_SPEC)
    got = _collect(lake_mod.scan(lake_dir, spec=AGG_SPEC))
    res = {r["doc_id"]: {k: v for k, v in r.items()
                         if k in dict(AGG_SPEC.aggregations)}
           for r in got.to_pylist()}
    assert res == AWANT
    lake_mod.compact(lake_dir, spec=AGG_SPEC)
    got2 = _collect(lake_mod.scan(lake_dir, spec=AGG_SPEC))
    res2 = {r["doc_id"]: {k: v for k, v in r.items()
                          if k in dict(AGG_SPEC.aggregations)}
            for r in got2.to_pylist()}
    assert res2 == AWANT


def test_partial_update_rehash_preserves_state(ray_session, tmp_path):
    """lake.rehash on a partial-update lake re-buckets the RAW state view:
    per-column seqs survive, so a later partial upsert cannot clobber
    columns it does not touch (the finalized-scan corruption found in
    review)."""
    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import lake as lake_mod

    spec = TableSpec(name="prh", key="doc_id", order="lsn", envelope=(),
                     num_partitions=8, merge_engine="partial_update")
    lake_dir = str(tmp_path / "lake")
    e1 = [_ev("a", 10, bio="keep-bio"), _ev("a", 20, score=2.0),
          _ev("b", 5, bio="b-bio", score=1.0), _ev("c", 7, op="delete"),
          _ev("c", 2, bio="dead")]
    f1 = _write_changelog(e1, PFIELDS, str(tmp_path / "r1.parquet"))
    apply_mod.apply_epoch(lake_dir, [f1], spec=spec)
    m2 = lake_mod.rehash(lake_dir, 3, spec=spec)
    assert m2.num_partitions == 3
    # a LATE partial upsert touching only score: bio must keep its winner
    e2 = [_ev("a", 200, score=9.0)]
    f2 = _write_changelog(e2, PFIELDS, str(tmp_path / "r2.parquet"))
    apply_mod.apply_epoch(lake_dir, [f2], spec=spec)
    got = {r["doc_id"]: r for r in _collect(
        lake_mod.scan(lake_dir, spec=spec)).to_pylist()}
    assert got["a"]["bio"] == "keep-bio" and got["a"]["score"] == 9.0
    assert got["b"]["bio"] == "b-bio" and got["b"]["score"] == 1.0
    assert "c" not in got  # tombstone honored through the rehash
    # and an out-of-order OLD event after the rehash still loses
    # (bio's winner is lsn 10, score's is lsn 200 — lsn 5 loses both)
    e3 = [_ev("a", 5, bio="stale", score=0.5)]
    f3 = _write_changelog(e3, PFIELDS, str(tmp_path / "r3.parquet"))
    apply_mod.apply_epoch(lake_dir, [f3], spec=spec)
    got = {r["doc_id"]: r for r in _collect(
        lake_mod.scan(lake_dir, spec=spec)).to_pylist()}
    assert got["a"]["bio"] == "keep-bio" and got["a"]["score"] == 9.0


def test_aggregate_rehash_preserves_accumulators(ray_session, tmp_path):
    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import lake as lake_mod

    lake_dir = str(tmp_path / "arh")
    spec = TableSpec(name="arh", key="doc_id", order="lsn", envelope=(),
                     num_partitions=8, merge_engine="aggregate",
                     on_delete="ignore",
                     aggregations=AGG_SPEC.aggregations)
    half = len(AROWS) // 2
    f1 = _write_changelog(AROWS[:half], AFIELDS, str(tmp_path / "a1.parquet"))
    f2 = _write_changelog(AROWS[half:], AFIELDS, str(tmp_path / "a2.parquet"))
    apply_mod.apply_epoch(lake_dir, [f1], spec=spec)
    lake_mod.rehash(lake_dir, 2, spec=spec)
    apply_mod.apply_epoch(lake_dir, [f2], spec=spec)
    got = _collect(lake_mod.scan(lake_dir, spec=spec))
    res = {r["doc_id"]: {k: v for k, v in r.items()
                         if k in dict(spec.aggregations)}
           for r in got.to_pylist()}
    assert res == AWANT


def test_partial_same_lsn_delete_wins_deterministically():
    """A delete and an upsert at the SAME LSN resolve to the delete for
    liveness AND for column values, whatever the physical row order —
    required for fold associativity."""
    rows_a = [_ev("k", 5, op="delete"), _ev("k", 5, bio="x"),
              _ev("k", 9, score=1.0)]
    rows_b = list(reversed(rows_a))
    for rows in (rows_a, rows_b):
        folded = me.fold_partial(_events_table(rows, PFIELDS), PARTIAL_SPEC)
        got = _final(folded, PARTIAL_SPEC)
        # row resurrected by lsn 9, but bio@5 lost to the delete@5
        assert got == {"k": {"bio": None, "score": 1.0}}, rows
    # split folds agree with the one-shot fold
    s1 = me.fold_partial(_events_table(rows_a[:1], PFIELDS), PARTIAL_SPEC)
    s2 = me.fold_partial(_events_table(rows_a[1:], PFIELDS), PARTIAL_SPEC)
    merged = me.fold_partial(pa.concat_tables([s1, s2]), PARTIAL_SPEC)
    assert _final(merged, PARTIAL_SPEC) == {"k": {"bio": None, "score": 1.0}}


def test_partial_engine_exactly_once_and_crash_resume(ray_session, tmp_path):
    """The merge engines ride the same 2PC manifest machinery: re-applying
    an applied input set is a byte-identical no-op, and a crash after
    staging but before the manifest publish resumes to the same state."""
    import glob

    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import lake as lake_mod
    from vlm_eden_dataset_etl_ray import manifest as mf

    def manifests(lake_dir):
        return {os.path.basename(f): open(f, "rb").read()
                for f in sorted(glob.glob(os.path.join(
                    lake_dir, "_manifests", "*.json")))}

    lake_dir = str(tmp_path / "lake")
    f1 = _write_changelog(PROWS, PFIELDS, str(tmp_path / "x1.parquet"))
    m1 = apply_mod.apply_epoch(lake_dir, [f1], spec=PARTIAL_SPEC)
    s1 = _final(_collect(lake_mod.scan(lake_dir, spec=PARTIAL_SPEC,
                                       live_only=False)), PARTIAL_SPEC)
    b1 = manifests(lake_dir)
    # exactly-once: same input set → skipped, ledger byte-identical
    m2 = apply_mod.apply_epoch(lake_dir, [f1], spec=PARTIAL_SPEC)
    assert m2.epoch == m1.epoch and manifests(lake_dir) == b1

    # crash: delete the manifest (staging/delta files remain), re-run
    os.remove(os.path.join(lake_dir, "_manifests",
                           f"epoch={m1.epoch:010d}.json"))
    m3 = apply_mod.apply_epoch(lake_dir, [f1], spec=PARTIAL_SPEC)
    assert m3.epoch == m1.epoch
    s3 = _final(_collect(lake_mod.scan(lake_dir, spec=PARTIAL_SPEC,
                                       live_only=False)), PARTIAL_SPEC)
    assert s3 == s1
    assert {k: v for k, v in s3.items()
            if k in _serial_partial_oracle(PROWS)} == \
        _serial_partial_oracle(PROWS)


def test_aggregate_composite_mean_variance(ray_session, tmp_path):
    """mean/var_pop/var_samp via sum/count/sumsq twin accumulators —
    merged across epochs + compaction, derived at read time, matching a
    serial reference to float tolerance."""
    import math

    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import lake as lake_mod

    spec = TableSpec(name="stats", key="doc_id", order="lsn", envelope=(),
                     num_partitions=4, merge_engine="aggregate",
                     on_delete="ignore",
                     aggregations=(("m", "mean"), ("vp", "var_pop"),
                                   ("vs", "var_samp")))
    fields = [("m", pa.float64()), ("vp", pa.float64()),
              ("vs", pa.float64())]
    vals = {"a": [1.0, 2.0, 3.0, None, 10.0], "b": [5.0], "c": [None]}
    rows, lsn = [], 0
    for k, vs in vals.items():
        for v in vs:
            lsn += 1
            rows.append(_ev(k, lsn, m=v, vp=v, vs=v))
    lake_dir = str(tmp_path / "lake")
    f1 = _write_changelog(rows[::2], fields, str(tmp_path / "m1.parquet"))
    f2 = _write_changelog(rows[1::2], fields, str(tmp_path / "m2.parquet"))
    apply_mod.apply_epoch(lake_dir, [f1], spec=spec)
    lake_mod.compact(lake_dir, spec=spec, tombstone_watermark=0)
    apply_mod.apply_epoch(lake_dir, [f2], spec=spec)
    got = {r["doc_id"]: r for r in _collect(
        lake_mod.scan(lake_dir, spec=spec)).to_pylist()}
    assert not any(c.startswith("__") for c in next(iter(got.values())))

    def ref(vs):
        xs = [v for v in vs if v is not None]
        n = len(xs)
        mean = sum(xs) / n if n else None
        vpop = (sum((x - mean) ** 2 for x in xs) / n) if n else None
        vsamp = (sum((x - mean) ** 2 for x in xs) / (n - 1)) if n > 1 else None
        return mean, vpop, vsamp

    for k, vs in vals.items():
        mean, vpop, vsamp = ref(vs)
        g = got[k]
        for got_v, exp_v in ((g["m"], mean), (g["vp"], vpop),
                             (g["vs"], vsamp)):
            if exp_v is None:
                assert got_v is None, (k, got_v, exp_v)
            else:
                assert math.isclose(got_v, exp_v, rel_tol=1e-9), \
                    (k, got_v, exp_v)
