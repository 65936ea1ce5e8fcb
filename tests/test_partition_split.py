"""Partition-split (stripe) story: compaction splits partitions over the
stripe byte target into key-hash stripes recorded in the manifest; scans
and later compactions work per stripe; state stays byte-identical to the
oracle through split, subsequent deltas, re-compaction and re-stripe."""

import numpy as np

from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake, manifest as mf, oracle


def _sorted_state(t):
    return t.sort_by("doc_id").select(["doc_id", "tokens", "lsn"])


def test_compaction_splits_and_scans_stay_identical(tmp_path):
    p = cl.ChangelogParams(n_docs=200, n_events=2500, schema_change_at=1500,
                           n_shards=8)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, files[:4])
    exp_mid = lake.snapshot(lake_dir)

    # force striping: a few KB per stripe
    m = lake.compact(lake_dir, stripe_target_bytes=4096)
    striped = [st for st in m.partitions.values() if st.stripe_count > 1]
    assert striped, "no partition got split at a 4 KB stripe target"
    for st in striped:
        assert len(st.base) == st.stripe_count
        assert sorted(st.base_stripes) == list(range(st.stripe_count))
    # scan over the striped layout is byte-identical
    assert _sorted_state(lake.snapshot(lake_dir)).equals(_sorted_state(exp_mid))

    # deltas on top of a striped layout: stripes filter them at read time
    apply.apply_epoch(lake_dir, files[4:])
    exp = oracle.final_state(p)
    assert _sorted_state(lake.snapshot(lake_dir)).equals(_sorted_state(exp))

    # stable re-compaction (stripe count unchanged → per-stripe tasks)
    m2 = lake.compact(lake_dir, stripe_target_bytes=4096)
    assert any(st.stripe_count > 1 for st in m2.partitions.values())
    for st in m2.partitions.values():
        assert not st.deltas  # folded
    assert _sorted_state(lake.snapshot(lake_dir)).equals(_sorted_state(exp))

    # re-stripe DOWN (bigger target → stripe_count back to 1)
    m3 = lake.compact(lake_dir, stripe_target_bytes=1 << 30)
    assert all(st.stripe_count == 1 for st in m3.partitions.values())
    assert _sorted_state(lake.snapshot(lake_dir)).equals(_sorted_state(exp))


def test_striped_scan_prunes_columns(tmp_path):
    p = cl.ChangelogParams(n_docs=80, n_events=800, n_shards=4)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, files)
    lake.compact(lake_dir, stripe_target_bytes=2048)
    snap = lake.snapshot(lake_dir, columns=["doc_id", "n_tok"])
    assert snap.column_names == ["doc_id", "n_tok"]
    exp = oracle.final_state(p)
    assert snap.num_rows == exp.num_rows
    assert sorted(snap.column("doc_id").to_pylist()) == \
        sorted(exp.column("doc_id").to_pylist())
