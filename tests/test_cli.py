"""CLI smoke: gen → tail → status → compact → scan as real subprocesses
(the engine's operational entry points, reference analog run_worker.py)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args) -> dict:
    env = dict(os.environ, RAY_DATA_DISABLE_PROGRESS_BARS="1",
               PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "vlm_eden_dataset_etl_ray", *args],
        capture_output=True, text=True, check=True, cwd=REPO, env=env,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def test_cli_roundtrip(tmp_path):
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    out = str(tmp_path / "export")

    g = _run("gen", "--out", chg, "--events", "2000", "--schema-change-at", "1200")
    assert g["files"] > 0

    t1 = _run("tail", "--lake", lake, "--changelog", chg)
    assert t1["epoch"] == 1 and t1["rows"] > 0

    # second tick with nothing new: no new epoch
    t2 = _run("tail", "--lake", lake, "--changelog", chg)
    assert t2["epoch"] == 1

    st = _run("status", "--lake", lake)
    assert st["latest_epoch"] == 1 and st["schema_version"] == 2
    assert st["watermark_lsn"] == 1999

    c = _run("compact", "--lake", lake)
    assert c["kind"] == "compaction"

    sc = _run("scan", "--lake", lake, "--out", out, "--columns", "doc_id,n_tok")
    assert sc["files"] > 0

    fd = _run("feed", "--lake", lake, "--out", str(tmp_path / "feed"),
              "--from", "0")
    assert fd["files"] > 0
    import pyarrow.parquet as pq
    ft = pq.read_table(str(tmp_path / "feed"))
    assert "_change_type" in ft.column_names and ft.num_rows > 0

    some_key = ft.column("doc_id")[0].as_py()
    lk = _run("lookup", "--lake", lake, "--keys", some_key,
              "--columns", "doc_id,n_tok")
    assert lk["rows"] and lk["rows"][0]["doc_id"] == some_key


def test_cli_dml(tmp_path):
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    _run("gen", "--out", chg, "--events", "1500", "--schema-change-at", "900")
    _run("tail", "--lake", lake, "--changelog", chg)

    d = _run("delete", "--lake", lake, "--where", "n_tok<5")
    assert d["epoch"] == 2 and d["applied"]

    u = _run("update", "--lake", lake, "--where", "n_tok>=20",
             "--set", "n_tok*=2", "--op-id", "double-big")
    assert u["epoch"] == 3

    # op_id retry is a ledger skip (same epoch back)
    u2 = _run("update", "--lake", lake, "--where", "n_tok>=20",
              "--set", "n_tok*=2", "--op-id", "double-big")
    assert u2["epoch"] == 3

    out = str(tmp_path / "export")
    _run("scan", "--lake", lake, "--out", out, "--columns", "doc_id,n_tok")
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    toks = t.column("n_tok").to_pylist()
    assert all(v is None or v >= 5 for v in toks)


def test_cli_dlq(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vlm_eden_dataset_etl_ray import apply
    from vlm_eden_dataset_etl_ray.spec import TableSpec

    lake = str(tmp_path / "lake")
    f = str(tmp_path / "s.parquet")
    pq.write_table(pa.table({
        "k": pa.array(["a", None], pa.string()),
        "lsn": pa.array([1, 2], pa.int64()),
        "v": pa.array([1, 2], pa.int64()),
    }), f)
    spec = TableSpec(name="cli_dlq", key="k", order="lsn", num_partitions=2,
                     envelope=(), on_bad_rows="dead_letter")
    apply.apply_epoch(lake, [f], spec=spec)

    rep = _run("dlq", "--lake", lake)
    assert rep["rows"] == 1 and rep["by_reason"] == {"null_key": 1}
    purged = _run("dlq", "--lake", lake, "--purge")
    assert purged["purged_files"] == 1
    assert _run("dlq", "--lake", lake)["rows"] == 0


def test_cli_fsck(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vlm_eden_dataset_etl_ray import apply
    from vlm_eden_dataset_etl_ray.spec import TableSpec

    lake = str(tmp_path / "lake")
    f = str(tmp_path / "s.parquet")
    pq.write_table(pa.table({
        "k": ["a"], "lsn": pa.array([1], pa.int64()),
        "v": pa.array([1], pa.int64()),
    }), f)
    spec = TableSpec(name="cli_fsck", key="k", order="lsn",
                     num_partitions=2, envelope=())
    apply.apply_epoch(lake, [f], spec=spec)
    rep = _run("fsck", "--lake", lake)
    assert rep["ok"] and rep["checked"]["manifests"] == 1
    deep = _run("fsck", "--lake", lake, "--deep", "--key", "k")
    assert deep["ok"], deep
