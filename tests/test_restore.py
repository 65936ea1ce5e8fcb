"""lake.restore: metadata-only rollback that rewinds the exactly-once
ledger so undone epochs re-apply."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray import apply, lake, manifest as mf
from vlm_eden_dataset_etl_ray.spec import TableSpec

SPEC = TableSpec(name="rst", key="doc_id", order="lsn", num_partitions=4,
                 envelope=())


def _t(lo, hi):
    lsn = np.arange(lo, hi, dtype=np.int64)
    return pa.table({
        "lsn": pa.array(lsn),
        "op": pa.array(["upsert"] * len(lsn)),
        "doc_id": pa.array(np.char.add("d", (lsn % 20).astype("U4"))),
        "n_tok": pa.array(lsn),
    })


def test_restore_rolls_back_and_reopens_ledger(tmp_path):
    d = str(tmp_path / "rst")
    apply.apply_epoch_dataset(d, rd.from_arrow(_t(0, 50)),
                              epoch_id="e1", spec=SPEC)
    s1 = lake.snapshot(d, spec=SPEC)
    apply.apply_epoch_dataset(d, rd.from_arrow(_t(50, 90)),
                              epoch_id="e2", spec=SPEC)
    s2 = lake.snapshot(d, spec=SPEC)
    assert not s1.equals(s2)

    m = lake.restore(d, 1)
    assert m.kind == "restore" and m.epoch == 3
    assert lake.snapshot(d, spec=SPEC).equals(s1)
    # ledger rewound: e2 is no longer recorded as applied
    assert "e2" not in mf.latest(d).applied_epoch_ids
    # re-applying e2 converges back to the post-e2 state
    apply.apply_epoch_dataset(d, rd.from_arrow(_t(50, 90)),
                              epoch_id="e2", spec=SPEC)
    assert lake.snapshot(d, spec=SPEC).equals(s2)


def test_restore_keeps_time_travel_and_validates_epoch(tmp_path):
    d = str(tmp_path / "rst2")
    apply.apply_epoch_dataset(d, rd.from_arrow(_t(0, 30)),
                              epoch_id="e1", spec=SPEC)
    apply.apply_epoch_dataset(d, rd.from_arrow(_t(30, 60)),
                              epoch_id="e2", spec=SPEC)
    s2 = lake.snapshot(d, spec=SPEC)
    lake.restore(d, 1)
    # the pre-restore epoch still time-travels while retained
    assert lake.snapshot(d, spec=SPEC, asof_epoch=2).equals(s2)
    with pytest.raises(ValueError):
        lake.restore(d, 99)


def test_change_feed_across_restore_emits_nothing_new(tmp_path):
    d = str(tmp_path / "rstf")
    apply.apply_epoch_dataset(d, rd.from_arrow(_t(0, 40)),
                              epoch_id="e1", spec=SPEC)
    lake.compact(d, spec=SPEC)                      # epoch 2
    lake.restore(d, 1)                              # epoch 3
    feed = lake.change_feed(d, from_epoch=2, to_epoch=3, spec=SPEC)
    rows = list(feed.iter_batches(batch_format="pyarrow", batch_size=None))
    # snapshots 2 and 3 are identical: a restore must not re-emit epoch-1
    # deltas as fresh changes (CDC consumers would double-apply)
    assert sum(t.num_rows for t in rows) == 0
