"""Predicate DML (dml.delete_where / update_where): row-level DELETE and
UPDATE expressed through the engine's own CDC apply — exactly-once,
change-feed-visible, time-travelable, compaction-stable."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply, dml, lake, manifest as mf
from vlm_eden_dataset_etl_ray.spec import TableSpec

SPEC = TableSpec(name="dml", key="doc_id", order="lsn", num_partitions=4,
                 envelope=())


def _t(lo, hi, null_every=0):
    lsn = np.arange(lo, hi, dtype=np.int64)
    src = [None if null_every and i % null_every == 0 else
           ("purchase" if i % 3 == 0 else "view") for i in range(len(lsn))]
    return pa.table({
        "lsn": pa.array(lsn),
        "op": pa.array(["upsert"] * len(lsn)),
        "doc_id": pa.array(np.char.add("d", (lsn % 40).astype("U4"))),
        "n_tok": pa.array(lsn * 7 % 100),
        "source": pa.array(src, pa.string()),
    })


def _snap(d, columns=None):
    t = lake.snapshot(d, spec=SPEC, columns=columns)
    return t.sort_by("doc_id")


def _fresh(d, null_every=0):
    apply.apply_epoch_dataset(d, rd.from_arrow(_t(0, 120, null_every)),
                              epoch_id="e1", spec=SPEC)


def test_delete_where_removes_matches_and_is_exactly_once(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d)
    before = _snap(d)
    m = dml.delete_where(d, [("n_tok", "<", 50)], spec=SPEC)
    after = _snap(d)
    expect = before.filter(
        pc.fill_null(pc.greater_equal(before.column("n_tok"), 50), True))
    assert after.select(["doc_id", "n_tok"]).equals(
        expect.select(["doc_id", "n_tok"]))
    assert after.num_rows < before.num_rows
    # tombstones carry watermark+1
    wm = max(st.watermark_lsn for st in m.partitions.values())
    assert wm == 120  # 0..119 data, +1
    # auto op ids are snapshot-scoped (SQL statement semantics): the same
    # statement run again matches nothing and the state is unchanged —
    # the zero-match epoch still commits into the ledger
    m2 = dml.delete_where(d, [("n_tok", "<", 50)], spec=SPEC)
    assert m2.epoch == m.epoch + 1
    assert _snap(d).equals(after)
    # a stable op_id gives retry exactly-once ACROSS commits: the retry is
    # a pure ledger skip (same manifest back, no new epoch)
    m3 = dml.delete_where(d, [("n_tok", "<", 60)], spec=SPEC, op_id="del-60")
    m4 = dml.delete_where(d, [("n_tok", "<", 60)], spec=SPEC, op_id="del-60")
    assert m4.epoch == m3.epoch


def test_update_where_rewrites_only_matches(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d)
    before = _snap(d)
    dml.update_where(d, [("source", "==", "purchase")],
                     {"n_tok": ("add", 1000)}, spec=SPEC)
    after = _snap(d)
    is_p = pc.fill_null(pc.equal(before.column("source"), "purchase"), False)
    expect = pc.if_else(is_p, pc.add(before.column("n_tok"), 1000),
                        before.column("n_tok"))
    assert after.column("n_tok").combine_chunks().equals(
        expect.combine_chunks())
    # updated rows moved to watermark+1; untouched rows keep their lsn
    upd = after.filter(is_p)
    assert pc.min(upd.column("lsn")).as_py() == 120
    keep = after.filter(pc.invert(is_p))
    assert pc.max(keep.column("lsn")).as_py() < 120


def test_null_predicate_matches_sql_semantics(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d, null_every=5)  # some null sources
    before = _snap(d)
    n_null = before.column("source").null_count
    assert n_null > 0
    # DELETE WHERE source == 'view': null rows are NOT deleted
    dml.delete_where(d, [("source", "==", "view")], spec=SPEC)
    after = _snap(d)
    assert after.column("source").null_count == n_null
    assert pc.sum(pc.equal(after.column("source"),
                           "view").cast(pa.int64())).as_py() in (0, None)


def test_dml_composes_with_change_feed_time_travel_compaction(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d)
    before = _snap(d)
    dml.delete_where(d, [("n_tok", ">=", 90)], spec=SPEC)  # epoch 2
    after = _snap(d)

    # change feed over the DML epoch shows plain delete events
    feed = pa.concat_tables(lake.change_feed(d, 1, 2, spec=SPEC).iter_batches(
        batch_format="pyarrow", batch_size=None))
    assert set(feed.column("_change_type").to_pylist()) == {"delete"}
    n_deleted = before.num_rows - after.num_rows
    assert feed.num_rows == n_deleted > 0

    # time travel to the pre-DML snapshot
    assert lake.snapshot(d, spec=SPEC, asof_epoch=1).sort_by(
        "doc_id").equals(before)

    # compaction folds the tombstones away without changing the state
    lake.compact(d, spec=SPEC)
    assert _snap(d).equals(after)


def test_update_then_delete_orders_and_scalar_set(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d)
    dml.update_where(d, [("n_tok", "<", 30)], {"source": "small"}, spec=SPEC)
    dml.delete_where(d, [("source", "==", "small")], spec=SPEC)
    after = _snap(d)
    assert pc.min(after.column("n_tok")).as_py() >= 30


def test_callable_predicate_needs_op_id_and_works_with_one(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d)
    fn = lambda t: pc.equal(pc.binary_length(t.column("doc_id")), 2)  # noqa: E731
    with pytest.raises(ValueError, match="op_id"):
        dml.delete_where(d, fn, spec=SPEC)
    dml.delete_where(d, fn, spec=SPEC, op_id="del-short-ids")
    after = _snap(d)
    assert pc.min(pc.binary_length(after.column("doc_id"))).as_py() >= 3


def test_validation_errors(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d)
    app = TableSpec(name="a", key="doc_id", order="lsn", mode="append",
                    num_partitions=4, envelope=())
    with pytest.raises(ValueError, match="append"):
        dml.delete_where(d, [("n_tok", "<", 5)], spec=app)
    with pytest.raises(ValueError, match="envelope"):
        dml.update_where(d, [("n_tok", "<", 5)], {"lsn": 0}, spec=SPEC)
    with pytest.raises(KeyError):
        dml.update_where(d, [("n_tok", "<", 5)], {"nope": 1}, spec=SPEC)
    ins = TableSpec(name="dml", key="doc_id", order="lsn", num_partitions=4,
                    envelope=(), insert_only=("source",))
    with pytest.raises(ValueError, match="insert_only"):
        dml.update_where(d, [("n_tok", "<", 5)], {"source": "x"}, spec=ins)
    with pytest.raises(FileNotFoundError):
        dml.delete_where(str(tmp_path / "missing"), [("n_tok", "<", 5)],
                         spec=SPEC)


def test_no_match_delete_is_safe(tmp_path):
    d = str(tmp_path / "l")
    _fresh(d)
    before = _snap(d)
    dml.delete_where(d, [("n_tok", ">", 10_000)], spec=SPEC)
    assert _snap(d).equals(before)


def test_zone_map_pushdown_prunes_matched_scan(tmp_path, monkeypatch):
    """The delete's matched-row scan must prune via file stats when the
    predicate column has them: compact first (delta-free partitions are
    file-prunable), then verify _stats_ranges produced a range."""
    d = str(tmp_path / "l")
    _fresh(d)
    lake.compact(d, spec=SPEC)
    ranges = dml._stats_ranges([("n_tok", "<", 10)],
                               pa.schema([("n_tok", pa.int64())]))
    assert ranges == [("n_tok", -(2 ** 63), 10)]
    seen = {}
    orig = lake.scan

    def spy(*a, **k):
        seen["stats_filter"] = k.get("stats_filter")
        return orig(*a, **k)

    monkeypatch.setattr(dml.lake_mod, "scan", spy)
    dml.delete_where(d, [("n_tok", "<", 10)], spec=SPEC)
    assert seen["stats_filter"] == [("n_tok", -(2 ** 63), 10)]
