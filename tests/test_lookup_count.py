"""Point lookup (partition-pruned) and snapshot counts."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply, lake, manifest as mf
from vlm_eden_dataset_etl_ray.spec import TableSpec

UPSERT = TableSpec(name="lk_u", key="doc_id", order="lsn",
                   num_partitions=8, envelope=())
APPEND = TableSpec(name="lk_a", key="doc_id", order="lsn", mode="append",
                   num_partitions=8, envelope=())


def _epoch(lo, hi, op="upsert"):
    lsn = np.arange(lo, hi, dtype=np.int64)
    return pa.table({
        "lsn": pa.array(lsn),
        "op": pa.array([op] * len(lsn)),
        "doc_id": pa.array(np.char.add("d", (lsn % 50).astype("U4"))),
        "n_tok": pa.array(lsn),
    })


def test_lookup_returns_current_versions_and_prunes_partitions(tmp_path):
    lake_dir = str(tmp_path / "lk")
    apply.apply_epoch_dataset(lake_dir, rd.from_arrow(_epoch(0, 100)),
                              epoch_id="l1", spec=UPSERT)
    apply.apply_epoch_dataset(lake_dir, rd.from_arrow(_epoch(100, 150)),
                              epoch_id="l2", spec=UPSERT)
    got = lake.lookup(lake_dir, ["d3", "d7", "dmissing"], spec=UPSERT)
    by_key = dict(zip(got.column("doc_id").to_pylist(),
                      got.column("lsn").to_pylist()))
    # keys 0..49 each updated; latest lsn for d3 = 103, d7 = 107
    assert by_key == {"d3": 103, "d7": 107}
    # pruning: the two keys hash to at most 2 of 8 partitions
    from vlm_eden_dataset_etl_ray.functions.hashing import partition_ids
    m = mf.latest(lake_dir)
    pids = set(partition_ids(pa.array(["d3", "d7", "dmissing"]),
                             m.num_partitions).tolist())
    assert len(pids) <= 3 < m.num_partitions


def test_lookup_respects_tombstones(tmp_path):
    lake_dir = str(tmp_path / "lkt")
    apply.apply_epoch_dataset(lake_dir, rd.from_arrow(_epoch(0, 50)),
                              epoch_id="l1", spec=UPSERT)
    dele = pa.table({
        "lsn": pa.array([1000], pa.int64()),
        "op": pa.array(["delete"]),
        "doc_id": pa.array(["d9"]),
        "n_tok": pa.array([0], pa.int64()),
    })
    apply.apply_epoch_dataset(lake_dir, rd.from_arrow(dele),
                              epoch_id="l2", spec=UPSERT)
    got = lake.lookup(lake_dir, ["d9", "d8"], spec=UPSERT)
    assert got.column("doc_id").to_pylist() == ["d8"]


def test_count_rows_append_is_metadata_only_and_upsert_merges(tmp_path):
    a_dir = str(tmp_path / "a")
    apply.apply_epoch_dataset(a_dir, rd.from_arrow(_epoch(0, 100)),
                              epoch_id="a1", spec=APPEND)
    apply.apply_epoch_dataset(a_dir, rd.from_arrow(_epoch(100, 130)),
                              epoch_id="a2", spec=APPEND)
    assert lake.count_rows(a_dir, spec=APPEND) == 130

    u_dir = str(tmp_path / "u")
    apply.apply_epoch_dataset(u_dir, rd.from_arrow(_epoch(0, 130)),
                              epoch_id="u1", spec=UPSERT)
    # 130 versions collapse to 50 distinct keys
    assert lake.count_rows(u_dir, spec=UPSERT) == 50
    assert lake.count_rows(str(tmp_path / "nope"), spec=UPSERT) == 0
