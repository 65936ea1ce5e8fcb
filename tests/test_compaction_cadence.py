"""Compaction-cadence policy: compact when the delta:base byte ratio or
per-partition delta file count crosses a threshold, never on a fixed
schedule — the ingest-loop shape the reference's periodic sync lacks
(its Postgres autovacuum plays this role)."""

import numpy as np

from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake, manifest as mf, oracle


def test_compaction_cadence_policy(tmp_path):
    p = cl.ChangelogParams(n_docs=100, n_events=1000, n_shards=10)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")

    # fresh lake, one epoch: nothing to fold yet (no base, few files)
    apply.apply_epoch(lake_dir, files[0::5])
    assert not lake.compaction_due(mf.latest(lake_dir), min_delta_files=4)
    assert lake.maybe_compact(lake_dir, min_delta_files=4) is None

    # three more epochs: per-partition delta file count crosses the bar
    for i in (1, 2, 3):
        apply.apply_epoch(lake_dir, files[i::5])
    assert lake.compaction_due(mf.latest(lake_dir), min_delta_files=4)
    out = lake.maybe_compact(lake_dir, min_delta_files=4)
    assert out is not None and out.kind == "compaction"

    # immediately after compaction: quiescent again
    assert not lake.compaction_due(mf.latest(lake_dir), min_delta_files=4)
    assert lake.maybe_compact(lake_dir, min_delta_files=4) is None

    # one more epoch: file count is small but the BYTE ratio branch fires
    # under a tight threshold (one epoch ≈ 1/4 of the base)
    apply.apply_epoch(lake_dir, files[4::5])
    m = mf.latest(lake_dir)
    assert not lake.compaction_due(m, delta_ratio=5.0, min_delta_files=99)
    assert lake.compaction_due(m, delta_ratio=0.05, min_delta_files=99)
    lake.maybe_compact(lake_dir, delta_ratio=0.05, min_delta_files=99)

    # the policy is an optimization only: final state still equals the
    # oracle — mid-stream compactions retained tombstones (watermark=0),
    # so the out-of-order epochs could not resurrect deleted rows
    _assert_oracle(lake_dir, p)

    # end of stream: a final full compaction may now drop tombstones
    lake.compact(lake_dir, tombstone_watermark=None)
    _assert_oracle(lake_dir, p)


def _assert_oracle(lake_dir, p):
    snap = lake.snapshot(lake_dir)
    exp = oracle.final_state(p)
    assert snap.num_rows == exp.num_rows
    s = snap.select(exp.column_names).sort_by("doc_id")
    e = exp.sort_by("doc_id")
    for c in exp.column_names:
        assert s.select([c]).equals(e.select([c])), c


def test_mid_stream_tombstone_drop_resurrects_without_watermark(tmp_path):
    """Documents the hazard the retention watermark exists for: compacting
    with tombstone_watermark=None BETWEEN out-of-order epochs loses delete
    tombstones, and a straggler upsert with a smaller LSN resurrects the
    deleted row. The default cadence path (watermark=0) must converge."""
    p = cl.ChangelogParams(n_docs=60, n_events=1200, delete_frac=0.25,
                           n_shards=12)
    files = cl.write_changelog(str(tmp_path / "chg"), p)

    for unsafe in (False, True):
        lake_dir = str(tmp_path / ("unsafe" if unsafe else "safe"))
        apply.apply_epoch(lake_dir, files[0::2])
        lake.compact(lake_dir,
                     tombstone_watermark=None if unsafe else 0)
        apply.apply_epoch(lake_dir, files[1::2])
        snap = lake.snapshot(lake_dir)
        exp = oracle.final_state(p)
        if unsafe:
            assert snap.num_rows > exp.num_rows  # resurrection happened
        else:
            _assert_oracle(lake_dir, p)


def test_compaction_due_empty_and_missing(tmp_path):
    assert not lake.compaction_due(None)
    assert lake.maybe_compact(str(tmp_path / "nope")) is None
