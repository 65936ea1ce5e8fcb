"""Operational metrics: per-stage accounting, error capture, run reports —
the engine's analog of the reference's Flower/Sentry monitoring surface
(/root/reference/run_worker.py:17-31)."""

import json

import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray import metrics as mx
from vlm_eden_dataset_etl_ray.__main__ import main as cli_main


def _docs(n=500):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "v": pa.array([i % 7 for i in range(n)], pa.int64()),
    }))


def test_tap_counts_rows_batches_bytes():
    m = mx.RunMetrics(run_id="t-tap")
    ds = m.tap(_docs(500), "input")
    ds = ds.filter(lambda r: r["v"] != 0)
    ds = m.tap(ds, "filtered")
    ds.materialize()
    rep = m.report()
    assert rep["run_id"] == "t-tap"
    assert rep["stages"]["input"]["rows"] == 500
    assert rep["stages"]["filtered"]["rows"] == 500 - 72  # 72 rows have v==0
    assert rep["stages"]["input"]["batches"] >= 1
    assert rep["stages"]["input"]["bytes"] > 0
    assert m.counts() == {"input": 500, "filtered": 428}


def test_instrument_records_time_and_reraises():
    m = mx.RunMetrics()

    def ok(t: pa.Table) -> pa.Table:
        return t

    wrapped = m.instrument(ok, "stage_ok")
    out = wrapped(pa.table({"x": [1, 2, 3]}))
    assert out.num_rows == 3

    def boom(t: pa.Table) -> pa.Table:
        raise ValueError("poisoned batch")

    with pytest.raises(ValueError):
        m.instrument(boom, "stage_bad")(pa.table({"x": [1]}))

    rep = m.report()
    assert rep["stages"]["stage_ok"]["rows"] == 3
    assert rep["stages"]["stage_ok"]["seconds"] >= 0
    errs = rep["errors"]
    assert len(errs) == 1
    assert errs[0]["stage"] == "stage_bad"
    assert errs[0]["type"] == "ValueError"
    assert "poisoned" in errs[0]["message"]
    assert "boom" in errs[0]["traceback"]


def test_timed_block_and_report_roundtrip(tmp_path):
    m = mx.RunMetrics(run_id="t-report")
    with m.timed("commit"):
        pass
    with pytest.raises(RuntimeError):
        with m.timed("doomed"):
            raise RuntimeError("mid-commit crash")
    path = m.write_report(str(tmp_path))
    rep = json.loads(open(path).read())
    assert rep["stages"]["commit"]["seconds"] >= 0
    assert rep["errors"][0]["stage"] == "doomed"

    reps = mx.list_reports(str(tmp_path))
    assert [r["run_id"] for r in reps] == ["t-report"]
    assert mx.list_reports(str(tmp_path / "nope")) == []


def test_metrics_cli(tmp_path, capsys):
    m = mx.RunMetrics(run_id="t-cli")
    m.tap(_docs(10), "input").materialize()
    m.write_report(str(tmp_path))
    assert cli_main(["metrics", "--lake", str(tmp_path), "--last", "1"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["runs"][0]["run_id"] == "t-cli"
    assert out["runs"][0]["stages"] == {"input": 10}
    assert out["runs"][0]["errors"] == 0


def test_corpus_exposes_run_metrics():
    from vlm_eden_dataset_etl_ray.pipelines.corpus import CorpusParams, prepare_corpus

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(
            [f"the quick brown fox number {i} jumps over the lazy dog again"
             for i in range(40)]),
    }))
    p = CorpusParams(jaccard_threshold=0.99)
    prepare_corpus(docs, ["held out benchmark text"], params=p)
    assert p.counts["input"] == 40
    assert p.metrics is not None
    rep = p.metrics.report()
    assert rep["stages"]["input"]["rows"] == 40
    assert set(p.counts) >= {"input", "quality", "language", "exact_dedup",
                             "near_dedup", "decontaminated"}
