"""Change-data-feed over the lake: net per-key changes between two
committed epochs, O(range deltas) not O(lake).

The reference has no CDC *output* side (downstream consumers re-read whole
Postgres tables); the feed gives them the Delta-Lake-CDF shape instead:
``_change_type`` ∈ {upsert, delete} per key changed in the epoch range.
"""

import duckdb
import pyarrow as pa
import pyarrow.compute as pc

from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake, manifest as mf

P = cl.ChangelogParams(n_docs=90, n_events=900, schema_change_at=10**9, n_shards=4)


def _feed_table(lake_dir, **kw) -> pa.Table:
    ds = lake.change_feed(lake_dir, **kw)
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches).sort_by("doc_id")


def _expected_feed(shard_files) -> pa.Table:
    """Serial oracle: LWW over exactly the range records, via DuckDB."""
    con = duckdb.connect()
    q = f"""
        select doc_id, lsn,
               case when op = 'delete' then 'delete' else 'upsert' end as _change_type
        from read_parquet({[str(f) for f in shard_files]})
        qualify row_number() over (partition by doc_id order by lsn desc) = 1
        order by doc_id
    """
    return con.execute(q).fetch_arrow_table()


def _build(tmp_path):
    files = cl.write_changelog(str(tmp_path / "chg"), P)
    lake_dir = str(tmp_path / "lake")
    for f in files:  # one epoch per shard → epochs 1..4
        apply.apply_epoch(lake_dir, [f])
    return lake_dir, files


def test_feed_matches_serial_range_lww(tmp_path):
    lake_dir, files = _build(tmp_path)
    got = _feed_table(lake_dir, from_epoch=2, to_epoch=4)
    exp = _expected_feed(files[2:4])  # epochs 3 and 4
    assert got.num_rows == exp.num_rows
    for c in ("doc_id", "lsn", "_change_type"):
        assert got.column(c).to_pylist() == exp.column(c).to_pylist(), c


def test_feed_from_zero_covers_whole_lake(tmp_path):
    lake_dir, files = _build(tmp_path)
    got = _feed_table(lake_dir)  # from_epoch=0 → since creation
    exp = _expected_feed(files)
    assert got.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert got.column("_change_type").to_pylist() == exp.column("_change_type").to_pylist()
    # upsert rows of the full-history feed ARE the live snapshot
    live = lake.snapshot(lake_dir)
    ups = got.filter(pc.equal(got.column("_change_type"), pa.scalar("upsert")))
    assert sorted(ups.column("doc_id").to_pylist()) == sorted(live.column("doc_id").to_pylist())


def test_feed_column_projection_keeps_change_type(tmp_path):
    lake_dir, files = _build(tmp_path)
    got = _feed_table(lake_dir, from_epoch=3, columns=["doc_id", "n_tok"])
    assert got.column_names == ["doc_id", "n_tok", "_change_type"]
    exp = _expected_feed(files[3:])
    assert got.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert got.column("_change_type").to_pylist() == exp.column("_change_type").to_pylist()


def test_feed_survives_compaction_in_range(tmp_path):
    """Compaction manifests add no rows; pre-compaction delta files stay on
    disk (until vacuum), so a retained-range feed is unchanged."""
    lake_dir, files = _build(tmp_path)
    exp = _feed_table(lake_dir, from_epoch=1)
    lake.compact(lake_dir)  # epoch 5, kind=compaction
    got = _feed_table(lake_dir, from_epoch=1, to_epoch=mf.latest(lake_dir).epoch)
    assert got.column("doc_id").to_pylist() == exp.column("doc_id").to_pylist()
    assert got.column("lsn").to_pylist() == exp.column("lsn").to_pylist()
    assert got.column("_change_type").to_pylist() == exp.column("_change_type").to_pylist()


def test_feed_raises_past_retention(tmp_path):
    lake_dir, _files = _build(tmp_path)
    lake.compact(lake_dir)
    lake.vacuum(lake_dir, keep_epochs=1, min_age_seconds=0.0)
    try:
        lake.change_feed(lake_dir, from_epoch=1)
    except ValueError as e:
        assert "vacuumed" in str(e)
    else:
        raise AssertionError("expected ValueError for vacuumed from_epoch")
