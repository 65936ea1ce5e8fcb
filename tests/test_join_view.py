"""Incrementally-maintained join views (views_join): after every refresh
the view must equal the full join of the two input snapshots — across
left-only, right-only, and mixed epochs, including the case an inner-only
store would get wrong (a dim key inserted AFTER facts referencing it)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray.spec import TableSpec
from vlm_eden_dataset_etl_ray.views_join import (
    join_view_spec, maintain_join_view, scan_join_view)

L_SPEC = TableSpec(name="facts", key="fid", order="lsn", num_partitions=4,
                   envelope=())
R_SPEC = TableSpec(name="dims", key="uid", order="lsn", num_partitions=4,
                   envelope=())


def _rows(spec, keys, lsn, deletes=(), **payload):
    n = len(keys)
    t = {spec.key: pa.array(keys),
         "lsn": pa.array(np.full(n, lsn, np.int64)),
         "op": pa.array(["delete" if k in deletes else "upsert"
                         for k in keys])}
    for c, v in payload.items():
        t[c] = pa.array(v)
    return rd.from_arrow(pa.table(t))


def _epoch(d, spec, eid, ds):
    apply.apply_epoch_dataset(d, ds, epoch_id=eid, spec=spec)


def _snap_map(d, spec, cols):
    t = lake.snapshot(d, spec=spec)
    return {r[spec.key]: tuple(r[c] for c in cols) for r in t.to_pylist()}


def _oracle(facts, dims, how):
    """facts: fid -> (uid, val); dims: uid -> (tag,)."""
    out = {}
    for fid, (uid, val) in facts.items():
        if uid in dims:
            out[fid] = (uid, val, dims[uid][0])
        elif how == "left":
            out[fid] = (uid, val, None)
    return out


def _view_map(view_dir, how):
    got = pa.concat_tables(scan_join_view(
        view_dir, L_SPEC, how=how).iter_batches(
        batch_format="pyarrow", batch_size=None))
    return {r["fid"]: (r["uid"], r["val"], r["tag"])
            for r in got.to_pylist()}


def _check(tmp, view_dir):
    facts = _snap_map(str(tmp / "L"), L_SPEC, ["uid", "val"])
    dims = _snap_map(str(tmp / "R"), R_SPEC, ["tag"])
    for how in ("inner", "left"):
        assert _view_map(view_dir, how) == _oracle(facts, dims, how), how


@pytest.fixture()
def lakes(tmp_path):
    L, R = str(tmp_path / "L"), str(tmp_path / "R")
    _epoch(L, L_SPEC, "l1", _rows(
        L_SPEC, [f"f{i}" for i in range(10)], 1,
        uid=[f"u{i % 4}" for i in range(10)],
        val=list(range(10))))
    _epoch(R, R_SPEC, "r1", _rows(
        R_SPEC, ["u0", "u1", "u2"], 1, tag=["a", "b", "c"]))
    return tmp_path


def _maintain(tmp):
    return maintain_join_view(
        str(tmp / "V"), str(tmp / "L"), str(tmp / "R"),
        left_spec=L_SPEC, right_spec=R_SPEC, join_col="uid")


def test_initial_build_and_scan_modes(lakes):
    _maintain(lakes)
    _check(lakes, str(lakes / "V"))
    # u3 facts are stored unmatched: visible in left, absent from inner
    assert "f3" in _view_map(str(lakes / "V"), "left")
    assert "f3" not in _view_map(str(lakes / "V"), "inner")


def test_left_epochs_refresh_incrementally(lakes):
    _maintain(lakes)
    # update f0's uid, add f10, delete f1
    _epoch(str(lakes / "L"), L_SPEC, "l2", _rows(
        L_SPEC, ["f0", "f10", "f1"], 2, deletes={"f1"},
        uid=["u2", "u1", "u0"], val=[100, 110, 0]))
    _maintain(lakes)
    _check(lakes, str(lakes / "V"))
    v = _view_map(str(lakes / "V"), "inner")
    assert v["f0"] == ("u2", 100, "c") and v["f10"] == ("u1", 110, "b")
    assert "f1" not in v


def test_right_epochs_including_late_dim_insert(lakes):
    _maintain(lakes)
    # insert u3 (facts f3/f7 were stored UNMATCHED — must join now),
    # retag u1, delete u0
    _epoch(str(lakes / "R"), R_SPEC, "r2", _rows(
        R_SPEC, ["u3", "u1", "u0"], 2, deletes={"u0"},
        tag=["d", "B", "a"]))
    _maintain(lakes)
    _check(lakes, str(lakes / "V"))
    v = _view_map(str(lakes / "V"), "inner")
    assert v["f3"] == ("u3", 3, "d")          # late dim insert joins
    assert v["f5"] == ("u1", 5, "B")          # retag propagated
    assert "f0" not in v and "f4" in _view_map(str(lakes / "V"), "left")


def test_mixed_epoch_and_idempotence(lakes):
    m1 = _maintain(lakes)
    _epoch(str(lakes / "L"), L_SPEC, "l2", _rows(
        L_SPEC, ["f2"], 2, uid=["u9"], val=[42]))
    _epoch(str(lakes / "R"), R_SPEC, "r2", _rows(
        R_SPEC, ["u9"], 2, tag=["z"]))
    m2 = _maintain(lakes)
    _check(lakes, str(lakes / "V"))
    assert _view_map(str(lakes / "V"), "inner")["f2"] == ("u9", 42, "z")
    # no new input epochs -> metadata no-op
    m3 = _maintain(lakes)
    assert m3.epoch == m2.epoch > m1.epoch


def test_empty_epoch_advances_coverage(lakes):
    _maintain(lakes)
    apply.apply_epoch(str(lakes / "L"), [], spec=L_SPEC)
    before = _view_map(str(lakes / "V"), "left")
    _maintain(lakes)
    assert _view_map(str(lakes / "V"), "left") == before
    _check(lakes, str(lakes / "V"))


def test_views_chain_into_multiway_joins(lakes):
    """V2 = (L ⟕ R1) ⟕ R2: the level-1 view is itself the LEFT lake of a
    second view, refreshed from V1's OWN change feed — multi-way joins by
    composition, no new machinery."""
    tmp = lakes
    T_SPEC = TableSpec(name="tags", key="tag", order="lsn",
                       num_partitions=4, envelope=())
    _epoch(str(tmp / "T"), T_SPEC, "t1", _rows(
        T_SPEC, ["a", "b", "c"], 1, desc=["A!", "B!", "C!"]))
    _maintain(tmp)
    v1spec = join_view_spec(L_SPEC)
    kw2 = dict(left_spec=v1spec, right_spec=T_SPEC, join_col="tag")
    maintain_join_view(str(tmp / "V2"), str(tmp / "V"), str(tmp / "T"),
                       **kw2)

    def _v2():
        got = pa.concat_tables(scan_join_view(
            str(tmp / "V2"), v1spec, how="left").iter_batches(
            batch_format="pyarrow", batch_size=None))
        return {r["fid"]: (r["uid"], r["val"], r["tag"], r["desc"])
                for r in got.to_pylist()}

    def _expect():
        facts = _snap_map(str(tmp / "L"), L_SPEC, ["uid", "val"])
        dims = _snap_map(str(tmp / "R"), R_SPEC, ["tag"])
        tags = _snap_map(str(tmp / "T"), T_SPEC, ["desc"])
        out = {}
        for fid, (uid, val) in facts.items():
            tag = dims[uid][0] if uid in dims else None
            out[fid] = (uid, val, tag,
                        tags[tag][0] if tag in tags else None)
        return out

    assert _v2() == _expect()
    # change a LEAF dim: retag u0 a->c; the refresh must ripple V -> V2
    # purely through V's change feed
    _epoch(str(tmp / "R"), R_SPEC, "r2", _rows(
        R_SPEC, ["u0"], 2, tag=["c"]))
    _maintain(tmp)
    maintain_join_view(str(tmp / "V2"), str(tmp / "V"), str(tmp / "T"),
                       **kw2)
    assert _v2() == _expect()
    assert _v2()["f0"] == ("u0", 0, "c", "C!")
    # and a level-2 dim change: re-describe tag b
    _epoch(str(tmp / "T"), T_SPEC, "t2", _rows(
        T_SPEC, ["b"], 2, desc=["B2"]))
    maintain_join_view(str(tmp / "V2"), str(tmp / "V"), str(tmp / "T"),
                       **kw2)
    assert _v2() == _expect()
    assert _v2()["f1"] == ("u1", 1, "b", "B2")


def test_join_on_left_key_itself(lakes):
    """1:1 enrichment joining on the LEFT KEY (join_col == lkey) must not
    duplicate the key field in the view schema."""
    tmp = lakes
    K_SPEC = TableSpec(name="fdim", key="fid", order="lsn",
                       num_partitions=4, envelope=())
    _epoch(str(tmp / "K"), K_SPEC, "k1", _rows(
        K_SPEC, ["f0", "f1", "f2"], 1, note=["x", "y", "z"]))
    maintain_join_view(str(tmp / "VK"), str(tmp / "L"), str(tmp / "K"),
                       left_spec=L_SPEC, right_spec=K_SPEC, join_col="fid")
    got = pa.concat_tables(scan_join_view(
        str(tmp / "VK"), L_SPEC, how="inner").iter_batches(
        batch_format="pyarrow", batch_size=None))
    assert got.column_names.count("fid") == 1
    m = {r["fid"]: r["note"] for r in got.to_pylist()}
    assert m == {"f0": "x", "f1": "y", "f2": "z"}
    # refresh path too
    _epoch(str(tmp / "K"), K_SPEC, "k2", _rows(
        K_SPEC, ["f0"], 2, note=["X2"]))
    maintain_join_view(str(tmp / "VK"), str(tmp / "L"), str(tmp / "K"),
                       left_spec=L_SPEC, right_spec=K_SPEC, join_col="fid")
    got = pa.concat_tables(scan_join_view(
        str(tmp / "VK"), L_SPEC, how="inner").iter_batches(
        batch_format="pyarrow", batch_size=None))
    assert {r["fid"]: r["note"] for r in got.to_pylist()}["f0"] == "X2"


def test_incremental_refresh_carries_evolved_columns(lakes):
    """A column added to the LEFT lake after the view was built must reach
    the view through the INCREMENTAL path, not only via full rebuild."""
    tmp = lakes
    _maintain(tmp)
    n = 3
    ds = rd.from_arrow(pa.table({
        "fid": pa.array(["f0", "f1", "f20"]),
        "lsn": pa.array(np.full(n, 2, np.int64)),
        "op": pa.array(["upsert"] * n),
        "uid": pa.array(["u0", "u1", "u2"]),
        "val": pa.array([1000, 1001, 1002], pa.int64()),
        "score": pa.array([0.5, 0.6, 0.7], pa.float64()),
    }))
    apply.apply_epoch_dataset(str(tmp / "L"), ds, epoch_id="l2",
                              spec=L_SPEC)
    _maintain(tmp)
    got = pa.concat_tables(scan_join_view(
        str(tmp / "V"), L_SPEC, how="left").iter_batches(
        batch_format="pyarrow", batch_size=None))
    assert "score" in got.column_names
    m = {r["fid"]: r["score"] for r in got.to_pylist()}
    assert m["f0"] == 0.5 and m["f20"] == 0.7
    assert m["f5"] is None  # untouched rows: null in the new column
    _check(lakes, str(tmp / "V"))


def test_catch_up_rebuild_after_vacuum(lakes):
    """A view left behind past the inputs' vacuum horizon must catch up
    with the full-rebuild path (incl. tombstoning vanished left rows)
    instead of failing on missing change-feed manifests."""
    import time as _t

    _maintain(lakes)
    _epoch(str(lakes / "L"), L_SPEC, "l2", _rows(
        L_SPEC, ["f0", "f1"], 2, deletes={"f1"}, uid=["u2", "u0"],
        val=[100, 0]))
    _epoch(str(lakes / "L"), L_SPEC, "l3", _rows(
        L_SPEC, ["f10"], 3, uid=["u1"], val=[110]))
    # drop every left manifest but the newest; backdate so vacuum's
    # age guard doesn't spare them
    for f in (lakes / "L" / "_manifests").iterdir():
        os_utime = __import__("os").utime
        os_utime(f, (_t.time() - 7200, _t.time() - 7200))
    from vlm_eden_dataset_etl_ray import lake as lake_mod
    res = lake_mod.vacuum(str(lakes / "L"), keep_epochs=1,
                          min_age_seconds=0.0)
    assert res["manifests_removed"] > 0
    m = _maintain(lakes)
    _check(lakes, str(lakes / "V"))
    v = _view_map(str(lakes / "V"), "inner")
    assert "f1" not in v and v["f0"] == ("u2", 100, "c")
    assert v["f10"] == ("u1", 110, "b")
    # and the view keeps refreshing incrementally afterwards
    _epoch(str(lakes / "L"), L_SPEC, "l4", _rows(
        L_SPEC, ["f10"], 4, uid=["u2"], val=[111]))
    m2 = _maintain(lakes)
    assert m2.epoch > m.epoch
    _check(lakes, str(lakes / "V"))


def test_validation(lakes, tmp_path):
    app = TableSpec(name="x", key="fid", order="lsn", mode="append",
                    num_partitions=4, envelope=())
    with pytest.raises(ValueError, match="upsert"):
        maintain_join_view(str(tmp_path / "V2"), str(lakes / "L"),
                           str(lakes / "R"), left_spec=app,
                           right_spec=R_SPEC, join_col="uid")
    with pytest.raises(FileNotFoundError):
        maintain_join_view(str(tmp_path / "V2"), str(tmp_path / "noL"),
                           str(lakes / "R"), left_spec=L_SPEC,
                           right_spec=R_SPEC, join_col="uid")
    with pytest.raises(ValueError, match="collision"):
        maintain_join_view(str(tmp_path / "V2"), str(lakes / "L"),
                           str(lakes / "R"), left_spec=L_SPEC,
                           right_spec=R_SPEC, join_col="uid",
                           left_cols=["val", "tag"], right_cols=["tag"])
