"""lake.fsck: the lakehouse consistency checker — clean on a healthy
lake (incl. deep mode), and a finding (never an exception) for each
broken invariant: missing referenced file, empty file, torn manifest,
non-cumulative lineage."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray.spec import TableSpec

SPEC = TableSpec(name="t_fsck", key="k", order="lsn", num_partitions=2,
                 envelope=())


def _build(tmp_path, n_epochs=3):
    lake_dir = str(tmp_path / "lake")
    for i in range(n_epochs):
        f = str(tmp_path / f"s{i}.parquet")
        pq.write_table(pa.table({
            "k": [f"k{i}a", f"k{i}b"],
            "lsn": pa.array([2 * i + 1, 2 * i + 2], pa.int64()),
            "v": pa.array([i, i], pa.int64()),
            "op": ["upsert", "delete" if i == 1 else "upsert"],
        }), f)
        apply.apply_epoch(lake_dir, [f], spec=SPEC)
    return lake_dir


def test_fsck_clean_lake_incl_deep(tmp_path):
    lake_dir = _build(tmp_path)
    rep = lake.fsck(lake_dir, spec=SPEC)
    assert rep["ok"], rep
    assert rep["checked"]["manifests"] == 3 and rep["checked"]["files"] >= 3
    deep = lake.fsck(lake_dir, spec=SPEC, deep=True)
    assert deep["ok"], deep


def test_fsck_reports_missing_and_empty_files(tmp_path):
    lake_dir = _build(tmp_path)
    m = mf.latest(lake_dir)
    files = [f for pid in m.partitions for f in m.files(pid)]
    os.remove(files[0])
    with open(files[1], "w"):
        pass  # truncate to zero bytes
    rep = lake.fsck(lake_dir, spec=SPEC)
    assert not rep["ok"]
    assert any("missing file" in f for f in rep["findings"]), rep
    assert any("empty file" in f for f in rep["findings"]), rep


def test_fsck_reports_torn_manifest_and_bad_lineage(tmp_path):
    lake_dir = _build(tmp_path)
    mdir = os.path.join(lake_dir, "_manifests")
    names = sorted(n for n in os.listdir(mdir) if n.endswith(".json"))
    # tear the OLDEST manifest (latest stays readable)
    with open(os.path.join(mdir, names[0]), "w") as fh:
        fh.write("{not json")
    rep = lake.fsck(lake_dir, spec=SPEC)
    assert not rep["ok"]
    assert any("unreadable" in f for f in rep["findings"]), rep

    # break lineage cumulativity on a middle manifest
    p = os.path.join(mdir, names[1])
    d = json.loads(open(p).read())
    d["applied_epoch_ids"] = d.get("applied_epoch_ids", []) + ["phantom"]
    open(p, "w").write(json.dumps(d))
    rep2 = lake.fsck(lake_dir, spec=SPEC)
    assert any("not cumulative" in f for f in rep2["findings"]), rep2
