"""Data-quality expectations: report counts and fail-fast enforcement."""

import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions import quality


def _ds():
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 5], pa.int64()),
        "name": pa.array(["a", None, "c", "d", "e", "f"]),
        "v": pa.array([0.5, 1.5, -2.0, 3.0, 9.9, 0.0]),
        "kind": pa.array(["x", "y", "x", "z", "x", "y"]),
        "code": pa.array(["A-1", "B-2", "bad", None, "C-3", "D-4"]),
    })
    return rd.from_arrow(t).repartition(3)


RULES = [
    ("not_null", "name"),
    ("in_range", "v", 0.0, 5.0),
    ("accepted_values", "kind", ("x", "y")),
    ("matches_regex", "code", r"^[A-Z]-\d$"),
    ("unique", "id"),
]


def test_report_counts_every_rule():
    rep = quality.expectation_report(_ds(), RULES)
    got = dict(zip(rep.column("rule").to_pylist(),
                   rep.column("violations").to_pylist()))
    assert got["not_null(name)"] == 1
    assert got["in_range(v,0.0,5.0)"] == 2  # -2.0 and 9.9
    assert got["accepted_values(kind)"] == 1  # one z
    assert got["matches_regex(code)"] == 1  # "bad"; NULL passes
    assert got["unique(id)"] == 1  # 6 rows, 5 distinct
    assert set(rep.column("checked").to_pylist()) == {6}
    # rows come back in rule order
    assert rep.column("rule").to_pylist()[0] == "not_null(name)"


def test_report_multi_column_unique_and_clean_data():
    t = pa.table({"a": [1, 1, 2], "b": ["x", "x", "y"]})
    rep = quality.expectation_report(
        rd.from_arrow(t), [("unique", ("a", "b")), ("not_null", "a")])
    got = dict(zip(rep.column("rule").to_pylist(),
                   rep.column("violations").to_pylist()))
    assert got["unique(a,b)"] == 1
    assert got["not_null(a)"] == 0


def test_enforce_passes_clean_and_raises_on_violation():
    clean = rd.from_arrow(pa.table({"v": [1.0, 2.0]}))
    out = quality.enforce(clean, [("in_range", "v", 0.0, 5.0)])
    assert out.count() == 2

    dirty = rd.from_arrow(pa.table({"v": [1.0, 99.0]}))
    gated = quality.enforce(dirty, [("in_range", "v", 0.0, 5.0)])
    with pytest.raises(Exception) as ei:
        gated.materialize()
    assert "in_range(v,0.0,5.0)" in str(ei.value)


def test_enforce_rejects_unique_and_unknown_kind():
    ds = rd.from_arrow(pa.table({"v": [1]}))
    with pytest.raises(ValueError, match="row-local"):
        quality.enforce(ds, [("unique", "v")])
    with pytest.raises(ValueError, match="unknown expectation"):
        quality.expectation_report(ds, [("nope", "v")])


def test_enforce_gates_a_lake_write_before_commit(tmp_path):
    """The Delta-constraints contract: a violating epoch aborts BEFORE the
    manifest commit, leaving the lake unchanged."""
    import numpy as np

    from vlm_eden_dataset_etl_ray import apply, manifest as mf
    from vlm_eden_dataset_etl_ray.spec import TableSpec

    spec = TableSpec(name="gated", key="doc_id", order="lsn",
                     num_partitions=2, envelope=())
    d = str(tmp_path / "lake")
    good = pa.table({
        "lsn": pa.array(np.arange(4, dtype=np.int64)),
        "op": pa.array(["upsert"] * 4),
        "doc_id": pa.array(["a", "b", "c", "d"]),
        "n_tok": pa.array([1, 2, 3, 4], pa.int64()),
    })
    gated = quality.enforce(rd.from_arrow(good), [("not_null", "n_tok")])
    apply.apply_epoch_dataset(d, gated, epoch_id="e1", spec=spec)
    assert mf.latest(d).epoch == 1

    bad = good.set_column(3, "n_tok", pa.array([1, None, 3, 4], pa.int64()))
    gated = quality.enforce(rd.from_arrow(bad), [("not_null", "n_tok")])
    with pytest.raises(Exception) as ei:
        apply.apply_epoch_dataset(d, gated, epoch_id="e2", spec=spec)
    assert "not_null(n_tok)" in str(ei.value)
    assert mf.latest(d).epoch == 1  # nothing committed
