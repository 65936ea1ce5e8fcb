"""MERGE INTO (dml.merge_into): SQL-MERGE clause semantics expressed as
one CDC epoch — update-all / insert / conditional-delete routing, the
no-join fast path for the symmetric CDC merge, and the hash-semi-join
match flag for the asymmetric clauses."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply, dml, lake
from vlm_eden_dataset_etl_ray.functions import relational
from vlm_eden_dataset_etl_ray.spec import TableSpec

SPEC = TableSpec(name="mrg", key="doc_id", order="lsn", num_partitions=4,
                 envelope=())


def _base() -> pa.Table:
    i = np.arange(40, dtype=np.int64)
    return pa.table({
        "lsn": pa.array(i),
        "op": pa.array(["upsert"] * 40),
        "doc_id": pa.array(np.char.add("d", i.astype("U4"))),
        "n_tok": pa.array(i * 7),
        "source": pa.array(["base"] * 40),
    })


def _src() -> pa.Table:
    # keys d20..d59: d20..d39 matched, d40..d59 unmatched
    i = np.arange(20, 60, dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(np.char.add("d", i.astype("U4"))),
        "n_tok": pa.array(1000 + i),
        "source": pa.array(["merged"] * 40),
    })


def _fresh(d):
    apply.apply_epoch_dataset(d, rd.from_arrow(_base()), epoch_id="e1",
                              spec=SPEC)


def _snap(d) -> dict:
    t = lake.snapshot(d, spec=SPEC, columns=["doc_id", "n_tok", "source"])
    return {k: (n, s) for k, n, s in zip(t.column("doc_id").to_pylist(),
                                         t.column("n_tok").to_pylist(),
                                         t.column("source").to_pylist())}


def _oracle(base: pa.Table, src: pa.Table, *, when_matched="update",
            when_not_matched="insert", delete_over=None,
            delete_insert="skip") -> dict:
    """Serial reference: dict replay of the MERGE clause routing."""
    state = {k: (n, s) for k, n, s in zip(
        base.column("doc_id").to_pylist(), base.column("n_tok").to_pylist(),
        base.column("source").to_pylist())}
    for k, n, s in zip(src.column("doc_id").to_pylist(),
                       src.column("n_tok").to_pylist(),
                       src.column("source").to_pylist()):
        matched = k in state
        dele = delete_over is not None and delete_over(n)
        if dele and (matched or delete_insert == "skip"):
            state.pop(k, None)
        elif matched and when_matched == "update":
            state[k] = (n, s)
        elif not matched and when_not_matched == "insert":
            state[k] = (n, s)
    return state


def test_symmetric_merge_skips_the_match_join(tmp_path, monkeypatch):
    d = str(tmp_path / "l")
    _fresh(d)

    def boom(*a, **k):  # the fast path must never probe the target
        raise AssertionError("symmetric merge must not join")

    monkeypatch.setattr(relational, "hash_semi_join", boom)
    dml.merge_into(d, rd.from_arrow(_src()), spec=SPEC, op_id="m1")
    assert _snap(d) == _oracle(_base(), _src())
    # and the unmatched half actually inserted
    assert _snap(d)["d59"] == (1059, "merged")


def test_update_only_does_not_insert(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d)
    dml.merge_into(d, rd.from_arrow(_src()), spec=SPEC, op_id="m1",
                   when_not_matched="skip")
    got = _snap(d)
    assert got == _oracle(_base(), _src(), when_not_matched="skip")
    assert "d40" not in got and got["d20"] == (1020, "merged")
    assert got["d0"] == (0, "base")


def test_insert_only_does_not_clobber(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d)
    dml.merge_into(d, rd.from_arrow(_src()), spec=SPEC, op_id="m1",
                   when_matched="skip")
    got = _snap(d)
    assert got == _oracle(_base(), _src(), when_matched="skip")
    assert got["d20"] == (140, "base") and got["d40"] == (1040, "merged")


def test_matched_delete_feed_vs_strict_fallthrough(tmp_path):
    # delete predicate n_tok >= 1030 spans a matched slice (d30..d39) and
    # the whole unmatched half (d40..d59)
    for mode, name in (("skip", "a"), ("insert", "b")):
        d = str(tmp_path / name)
        _fresh(d)
        dml.merge_into(d, rd.from_arrow(_src()), spec=SPEC, op_id="m1",
                       matched_delete_where=[("n_tok", ">=", 1030)],
                       delete_insert=mode)
        assert _snap(d) == _oracle(
            _base(), _src(), delete_over=lambda n: n >= 1030,
            delete_insert=mode)
    # feed mode: unmatched delete-pred rows vanish; strict mode: inserted
    assert "d40" not in _snap(str(tmp_path / "a"))
    assert _snap(str(tmp_path / "b"))["d40"] == (1040, "merged")
    # matched delete-pred rows are gone in both
    for name in ("a", "b"):
        assert "d30" not in _snap(str(tmp_path / name))


def test_dedup_order_col_keeps_highest(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d)
    src = pa.table({
        "doc_id": pa.array(["d1", "d1", "d2", "d2", "d2"]),
        "lsn": pa.array([5, 9, 1, 3, 2], pa.int64()),
        "n_tok": pa.array([100, 200, 300, 400, 500], pa.int64()),
        "source": pa.array(["merged"] * 5),
    })
    dml.merge_into(d, rd.from_arrow(src), spec=SPEC, op_id="m1",
                   dedup_order_col="lsn")
    got = _snap(d)
    assert got["d1"] == (200, "merged") and got["d2"] == (400, "merged")
    # the source's lsn column is the dedup sequence, not payload: the lake
    # schema is unchanged and rows carry the stamped epoch LSN
    t = lake.snapshot(d, spec=SPEC)
    assert set(t.column_names) == {"doc_id", "lsn", "op", "n_tok", "source"}
    upd = t.filter(pa.compute.equal(t.column("source"), "merged"))
    assert set(upd.column("lsn").to_pylist()) == {40}


def test_merge_exactly_once(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d)
    m1 = dml.merge_into(d, rd.from_arrow(_src()), spec=SPEC, op_id="m1",
                        when_not_matched="skip")
    after = _snap(d)
    m2 = dml.merge_into(d, rd.from_arrow(_src()), spec=SPEC, op_id="m1")
    assert m2.epoch == m1.epoch  # ledger skip, clauses not even evaluated
    assert _snap(d) == after


def test_narrow_source_error_fill_null(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d)
    src = pa.table({"doc_id": pa.array(["d1", "d99"]),
                    "n_tok": pa.array([500, 900], pa.int64())})
    # default: loud refusal — a whole-row upsert would null 'source'
    with pytest.raises(ValueError, match="narrow_source"):
        dml.merge_into(d, rd.from_arrow(src), spec=SPEC, op_id="m0")
    # fill: matched rows keep their target value, inserts get null
    dml.merge_into(d, rd.from_arrow(src), spec=SPEC, op_id="m1",
                   narrow_source="fill")
    got = _snap(d)
    assert got["d1"] == (500, "base") and got["d99"] == (900, None)
    # null: explicit whole-row replacement
    d2 = str(tmp_path / "l2")
    _fresh(d2)
    dml.merge_into(d2, rd.from_arrow(src), spec=SPEC, op_id="m1",
                   narrow_source="null")
    assert _snap(d2)["d1"] == (500, None)


def test_cdc_feed_op_column_is_declared_not_dropped(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d)
    feed = pa.table({"doc_id": pa.array(["d1", "d2", "d50"]),
                     "op": pa.array(["delete", "upsert", "upsert"]),
                     "n_tok": pa.array([0, 777, 888], pa.int64()),
                     "source": pa.array(["x", "merged", "merged"])})
    # an op column with no delete clause would resurrect deletes: refuse
    with pytest.raises(ValueError, match="op"):
        dml.merge_into(d, rd.from_arrow(feed), spec=SPEC, op_id="m0")
    # ... and a delete clause that does NOT reference op is no excuse
    with pytest.raises(ValueError, match="op"):
        dml.merge_into(d, rd.from_arrow(feed), spec=SPEC, op_id="m0b",
                       matched_delete_where=[("n_tok", ">", 100)])
    dml.merge_into(d, rd.from_arrow(feed), spec=SPEC, op_id="m1",
                   matched_delete_where=[("op", "==", "delete")])
    got = _snap(d)
    assert "d1" not in got
    assert got["d2"] == (777, "merged") and got["d50"] == (888, "merged")


def test_validation(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d)
    src = rd.from_arrow(_src())
    app = TableSpec(name="a", key="doc_id", order="lsn", mode="append",
                    num_partitions=4, envelope=())
    with pytest.raises(ValueError, match="append"):
        dml.merge_into(d, src, spec=app, op_id="x")
    with pytest.raises(ValueError, match="does nothing"):
        dml.merge_into(d, src, spec=SPEC, op_id="x", when_matched="skip",
                       when_not_matched="skip")
    with pytest.raises(ValueError, match="when_matched"):
        dml.merge_into(d, src, spec=SPEC, op_id="x", when_matched="replace")
    with pytest.raises(KeyError, match="key column"):
        dml.merge_into(
            d, rd.from_arrow(pa.table({"x": pa.array([1])})),
            spec=SPEC, op_id="x")
