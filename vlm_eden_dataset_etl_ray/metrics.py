"""Operational metrics for pipeline runs.

The reference ships a Flower dashboard for Celery task monitoring and
Sentry for error capture (/root/reference/run_worker.py:17-31,
/root/reference/flower_config.py): operators see per-task throughput and
every worker exception with context. This module is the Ray-native
equivalent, scoped to what a data engine actually owns — per-run,
per-stage row/batch/byte accounting, stage wall-times, and structured
error capture — collected by one zero-CPU actor per run and persisted as
a JSON run report under the lake (``_metrics/``), readable by the
``metrics`` CLI subcommand and by tests.

Design constraints at 100 TB:

- **O(stages) driver state.** The actor holds one small dict per stage,
  never per-row or per-block state.
- **One tiny actor call per batch.** ``tap`` adds a blocking ``add`` per
  batch (the add must commit before the task completes, else the
  end-of-run read races in-flight calls — same reasoning as the corpus
  counter it generalizes). At 256 nodes this is a few thousand sub-ms
  calls/s against a dedicated actor: negligible next to the work the
  batch itself does, but taps should still sit on stage BOUNDARIES, not
  on every micro-map.
- **Errors propagate.** ``instrument`` records the exception and
  re-raises — metrics are an observer, never a swallower; Ray's retry
  machinery stays in charge.
"""

from __future__ import annotations

import json
import time
import traceback
import uuid

import pyarrow as pa

import ray
import ray.data as rd

from vlm_eden_dataset_etl_ray import fsio

METRICS_DIR = "_metrics"


@ray.remote(num_cpus=0)
class _MetricsActor:
    def __init__(self):
        self.stages: dict[str, dict] = {}
        self.errors: list[dict] = []

    def _stage(self, stage: str) -> dict:
        return self.stages.setdefault(
            stage, {"rows": 0, "batches": 0, "bytes": 0, "seconds": 0.0})

    def add(self, stage: str, rows: int, nbytes: int, seconds: float = 0.0) -> None:
        s = self._stage(stage)
        s["rows"] += int(rows)
        s["batches"] += 1
        s["bytes"] += int(nbytes)
        s["seconds"] += float(seconds)

    def add_time(self, stage: str, seconds: float) -> None:
        self._stage(stage)["seconds"] += float(seconds)

    def error(self, stage: str, exc_type: str, message: str, tb: str) -> None:
        # bounded: keep the first 100 errors; at scale a poisoned stage
        # fails fast long before this fills
        if len(self.errors) < 100:
            self.errors.append({"stage": stage, "type": exc_type,
                                "message": message[:2000], "traceback": tb[-4000:]})

    def snapshot(self) -> dict:
        return {"stages": {k: dict(v) for k, v in self.stages.items()},
                "errors": list(self.errors)}


class RunMetrics:
    """Handle for one pipeline run's metrics actor.

    ``run_id`` defaults to a fresh UUID; pass one explicitly for
    deterministic tests or externally-keyed runs."""

    def __init__(self, run_id: str | None = None):
        self.run_id = run_id or uuid.uuid4().hex[:16]
        self.started = time.time()
        self._actor = _MetricsActor.remote()

    # -- collection -------------------------------------------------------

    def tap(self, ds: rd.Dataset, stage: str) -> rd.Dataset:
        """Row/batch/byte accounting tap on a stage boundary. Streaming —
        the tap is a zero-copy identity map that commits one counter call
        per batch."""
        actor = self._actor

        def _tap(t: pa.Table) -> pa.Table:
            ray.get(actor.add.remote(stage, t.num_rows, t.nbytes))
            return t

        return ds.map_batches(_tap, batch_format="pyarrow", zero_copy_batch=True)

    def instrument(self, fn, stage: str):
        """Wrap a batch function: time every call into ``stage`` and
        record (then RE-RAISE) any exception with its traceback — the
        Sentry-shaped capture point, minus the network."""
        actor = self._actor

        def _wrapped(batch):
            t0 = time.perf_counter()
            try:
                out = fn(batch)
            except Exception as e:  # noqa: BLE001 — recorded then re-raised
                ray.get(actor.error.remote(
                    stage, type(e).__name__, str(e), traceback.format_exc()))
                raise
            rows = out.num_rows if hasattr(out, "num_rows") else len(out)
            nbytes = out.nbytes if hasattr(out, "nbytes") else 0
            ray.get(actor.add.remote(
                stage, rows, nbytes, time.perf_counter() - t0))
            return out

        return _wrapped

    class _Timer:
        def __init__(self, metrics: "RunMetrics", stage: str):
            self._m, self._stage = metrics, stage

        def __enter__(self):
            self._t0 = time.perf_counter()
            return self

        def __exit__(self, exc_type, exc, tb):
            self._m._actor.add_time.remote(
                self._stage, time.perf_counter() - self._t0)
            if exc is not None:
                ray.get(self._m._actor.error.remote(
                    self._stage, exc_type.__name__, str(exc),
                    "".join(traceback.format_exception(exc_type, exc, tb))[-4000:]))
            return False  # never swallow

    def timed(self, stage: str) -> "RunMetrics._Timer":
        """Context manager: driver-side wall-time for a whole stage (e.g.
        around a ``write_parquet`` or a commit)."""
        return RunMetrics._Timer(self, stage)

    # -- reporting --------------------------------------------------------

    def report(self) -> dict:
        snap = ray.get(self._actor.snapshot.remote())
        return {
            "run_id": self.run_id,
            "started_unix": round(self.started, 3),
            "wall_seconds": round(time.time() - self.started, 3),
            "stages": snap["stages"],
            "errors": snap["errors"],
        }

    def counts(self) -> dict[str, int]:
        """stage → rows, in insertion (pipeline) order."""
        return {k: v["rows"] for k, v in self.report()["stages"].items()}

    def write_report(self, lake_dir: str) -> str:
        """Persist the report as ``<lake>/_metrics/run-<id>.json`` through
        the pluggable filesystem (works on object stores — unique names,
        no rename)."""
        rep = self.report()
        path = fsio.join(fsio.canon(lake_dir), METRICS_DIR,
                         f"run-{self.run_id}.json")
        fsio.write_bytes(path, json.dumps(rep, sort_keys=True,
                                          indent=1).encode())
        return path


def list_reports(lake_dir: str) -> list[dict]:
    """All persisted run reports for a lake, oldest first."""
    d = fsio.join(fsio.canon(lake_dir), METRICS_DIR)
    if not fsio.is_dir(d):
        return []
    names = sorted(n for n in fsio.list_names(d)
                   if n.startswith("run-") and n.endswith(".json"))
    reps = [fsio.read_json(fsio.join(d, n)) for n in names]
    reps.sort(key=lambda r: r.get("started_unix", 0))
    return reps
