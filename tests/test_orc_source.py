"""ORC source/sink: roundtrip fidelity, projection pushdown, layout."""

import os
import shutil

import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.sources.orc import read_orc_table, write_orc_table


def _collect(ds):
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None))


def test_orc_roundtrip_and_projection(tmp_path):
    out = str(tmp_path / "orc")
    t = pa.table({
        "k": pa.array(range(100), pa.int64()),
        "v": pa.array([f"s{i}" for i in range(100)]),
        "x": pa.array([i * 0.5 for i in range(100)]),
    })
    n_files = write_orc_table(rd.from_arrow(t).repartition(4), out)
    assert n_files == 4
    assert sorted(os.listdir(out)) == sorted(
        n for n in os.listdir(out) if n.endswith(".orc"))

    back = _collect(read_orc_table(out)).sort_by("k")
    assert back.select(["k", "v", "x"]).equals(t)

    proj = _collect(read_orc_table(out, columns=["k"]))
    assert proj.column_names == ["k"]
    assert proj.num_rows == 100


def test_orc_write_is_rerun_stable(tmp_path):
    out = str(tmp_path / "orc")
    t = pa.table({"k": pa.array(range(10), pa.int64())})
    write_orc_table(rd.from_arrow(t), out)
    first = sorted(os.listdir(out))
    write_orc_table(rd.from_arrow(t), out)  # content-hash names → overwrite
    assert sorted(os.listdir(out)) == first


def test_orc_single_file_path(tmp_path):
    out = str(tmp_path / "orc")
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    write_orc_table(rd.from_arrow(t), out)
    name = next(n for n in os.listdir(out) if n.endswith(".orc"))
    got = _collect(read_orc_table(os.path.join(out, name)))
    assert got.sort_by("k").equals(t)
