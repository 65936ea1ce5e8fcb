"""Driver contract for the graft builder (Ray Data target).

One entry per implemented operator family from SURVEY.md §2 (plus the
training-data operators: dedup, similarity search, text analysis,
multimodal plumbing). Each ``queries()`` callable takes an ``sf_dir`` and
returns a Dataset / pyarrow Table; ``oracle_sql()`` holds the equivalent
DuckDB SQL where the op is SQL-expressible (non-SQL ops — LSH/SimHash/IVF
approximations, language-ID, synthetic-token replay — are rows-only).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

Float-matching policy (the driver hashes values): per-row derived floats
are computed with the IDENTICAL double expression on both sides and left
unrounded (bit-equal); order-dependent aggregate sums are rounded on both
sides (2 decimals where the true sum is 2-decimal-grid-aligned, 4 where
4-aligned); cosine similarities are rounded to 4 (different but
numerically-equal formulas on each side).
"""

from __future__ import annotations

import os
import datetime as dt
import sys
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Make the package importable when this module is loaded by file path.
# NOTE: Ray WORKERS resolve `vlm_eden_dataset_etl_ray` via the driver's cwd
# (or PYTHONPATH) captured at ray.init — the driver must init from the repo
# root (it does) or export PYTHONPATH=/root/repo.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Engine-recommended execution config: push-based sort shuffle measured
# consistently faster than pull-based for this workload's groupbys
# (BASELINE.md). DataContext is process-wide and safe to set pre-init.
try:
    from ray.data.context import DataContext, ShuffleStrategy

    DataContext.get_current().shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
except Exception:  # pragma: no cover - older/newer ray without this knob
    pass

WM_TS = "2024-01-25 00:00:00"
STOPWORDS = ("a", "the", "and", "of", "to")
JACCARD_T = 0.97
COSINE_T = 0.4
SESSION_GAP_H = 6


def _events(sf_dir, columns=None, filter=None):
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    return read_table(sf_dir, "events", columns=columns, filter=filter)


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(batches) if batches else pa.table({})


def _round_col(t: pa.Table, col: str, ndigits: int) -> pa.Table:
    # np.round bit-matches DuckDB's round(double, n) (verified empirically);
    # Arrow's pc.round does not (different scaling), so don't use it here.
    v = np.round(t.column(col).to_numpy(zero_copy_only=False), ndigits)
    return t.set_column(t.column_names.index(col), col, pa.array(v, pa.float64()))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: CDC replay of a changelog derived from sf0.001 ``events``
    (with list<int32> token payloads) through apply_epoch → 2PC manifest →
    merge-on-read scan."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_events

    return replay_events(
        "/root/testdata/sf0.001",
        with_tokens=True,
        columns=["doc_id", "lsn", "n_tok", "source", "tokens"],
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_cdc_replay_events(sf_dir):
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_events

    return replay_events(sf_dir)


def q_cdc_drop_readd_evolution(sf_dir):
    """Drop + re-add schema evolution replay (reference
    migrations/20241029_01_JnkId.sql shape): ``source`` is dropped
    mid-stream then re-added as a fresh generation; winners that predate
    the re-add boundary must read NULL (no pre-drop resurrection)."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_events_drop_readd

    return replay_events_drop_readd(sf_dir)


def q_cdc_clone_restore(sf_dir):
    """Branch + rollback: two-epoch replay → zero-copy clone → restore
    the source to epoch 1. The branch still shows the full LWW state,
    the restored source only epoch 1's — both labeled in one result."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import (
        replay_events_clone_restore)

    return replay_events_clone_restore(sf_dir)


def q_cdc_rename_evolution(sf_dir):
    """Column-RENAME evolution replay: source→origin between two epochs;
    pre-rename winners keep their ORIGINAL values under the new name
    (data-preserving, vs drop+re-add's null generation)."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_events_rename

    return replay_events_rename(sf_dir)


def q_cdc_wap_audit(sf_dir):
    """Write-audit-publish gate: two lsn-half epochs applied with an
    ``audit=[lsn <= mid]`` expectation list — epoch 1 passes and
    publishes, epoch 2 stages its shuffle but FAILS the audit against the
    pinned candidate manifest and publishes nothing (no manifest, no
    ledger entry, orphans invisible to scans). Result = LWW replay of the
    first half alone."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_events_wap

    return replay_events_wap(sf_dir)


def q_cdc_point_lookup(sf_dir):
    """Point reads through the bloom path: replay, then lake.lookup of
    doc1..doc10 — partition pruning + footer-bloom file skipping +
    pre-merge key restriction; result = the asked ids' live rows."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import (
        replay_events_point_lookup)

    return replay_events_point_lookup(sf_dir)


def q_cdc_dead_letter(sf_dir):
    """Dead-letter routing: the changelog's doc_id is nulled where
    event_id % 97 == 0; ``TableSpec(on_bad_rows="dead_letter")`` diverts
    exactly those rows to <lake>/_dead_letter/ (verified in-pipeline) and
    the clean rows converge. Result = LWW replay of the well-formed rows."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_events_dead_letter

    return replay_events_dead_letter(sf_dir)


def q_dml_delete_update(sf_dir):
    """Predicate DML (Delta-style DELETE/UPDATE without file rewrites):
    replay → DELETE WHERE n_tok < 2000 (tombstone epoch, payload never
    moves, zone-map-pruned matched scan) → UPDATE SET n_tok += 1000 WHERE
    source = 'purchase' — both exactly-once epochs through the engine's
    own CDC apply; returns the final live snapshot."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_events_dml

    return replay_events_dml(sf_dir)


def q_cdc_rehash_replay(sf_dir):
    """Partition-count evolution (Iceberg partition-spec evolution for
    the hash layout): replay → lake.rehash 16→5 partitions → a second
    epoch applied with the STALE 16-partition spec (the committed layout
    must win). State, exactly-once lineage and key pruning all follow
    the new layout; the result equals an un-rehashed replay."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_events_rehash

    return replay_events_rehash(sf_dir)


def q_join_view_orders(sf_dir):
    """Incrementally-maintained JOIN view (materialized orders⋈customer):
    both inputs arrive as two CDC epochs each, the view is refreshed
    after every input epoch from the lakes' change feeds — O(changes)
    per refresh; the final refresh includes the inner-join completeness
    case (customers inserted AFTER the orders referencing them) and
    dim deletes (tombstoning their fact rows). Final inner view must
    equal the plain SQL join of the final snapshots."""
    import tempfile

    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table
    from vlm_eden_dataset_etl_ray.spec import TableSpec
    from vlm_eden_dataset_etl_ray.views_join import (
        maintain_join_view, scan_join_view)

    root = tempfile.mkdtemp(prefix="jv_", dir="/tmp")
    L, R, V = f"{root}/L", f"{root}/R", f"{root}/V"
    lspec = TableSpec(name="orders_l", key="o_orderkey", order="lsn",
                      num_partitions=8, envelope=())
    rspec = TableSpec(name="cust_r", key="c_custkey", order="lsn",
                      num_partitions=8, envelope=())

    def _env(lsn, key, mod, rem, delete=False):
        # modulo epoch split computed in the map (testdata keys are dense
        # 0..N-1, so modulo splits are non-degenerate at every sf)
        def _f(t: pa.Table) -> pa.Table:
            k = t.column(key).to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(k % mod == rem))
            n = t.num_rows
            t = t.append_column("lsn", pa.array(np.full(n, lsn, np.int64)))
            return t.append_column(
                "op", pa.array(np.full(n, "delete" if delete else "upsert")))
        return _f

    orders = lambda: read_table(  # noqa: E731
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = lambda: read_table(  # noqa: E731
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    apply_mod.apply_epoch_dataset(
        L, orders().map_batches(_env(1, "o_orderkey", 2, 0),
                                batch_format="pyarrow"),
        epoch_id="l1", spec=lspec)
    apply_mod.apply_epoch_dataset(
        R, cust().map_batches(_env(1, "c_custkey", 3, 1),
                              batch_format="pyarrow").union(
            cust().map_batches(_env(1, "c_custkey", 3, 2),
                               batch_format="pyarrow")),
        epoch_id="r1", spec=rspec)
    kw = dict(left_spec=lspec, right_spec=rspec, join_col="o_custkey")
    maintain_join_view(V, L, R, **kw)          # initial build
    apply_mod.apply_epoch_dataset(
        L, orders().map_batches(_env(2, "o_orderkey", 2, 1),
                                batch_format="pyarrow"),
        epoch_id="l2", spec=lspec)
    maintain_join_view(V, L, R, **kw)          # left-only refresh
    # r2: custkey%3==0 customers arrive LATE (their orders were stored
    # unmatched) and custkey%97==0 customers are deleted — at lsn 3 so
    # a delete always outranks this epoch's inserts on the %291 overlap
    apply_mod.apply_epoch_dataset(
        R, cust().map_batches(_env(2, "c_custkey", 3, 0),
                              batch_format="pyarrow").union(
            cust().map_batches(_env(3, "c_custkey", 97, 0, delete=True),
                               batch_format="pyarrow")),
        epoch_id="r2", spec=rspec)
    maintain_join_view(V, L, R, **kw)          # right-only refresh
    return scan_join_view(V, lspec, how="inner")


def q_cdc_merge_into(sf_dir):
    """MERGE INTO (SQL MERGE / Delta merge) over a replayed lake:
    update-only + conditional-delete clauses — the asymmetric statement
    plain ON-CONFLICT upserts can't express. Matched keys update-all from
    the source, matched keys with re-priced n_tok > 25000 are deleted,
    unmatched source keys do NOT insert (one hash-semi-join exchange
    against the pruned live key column computes the match flag; target
    payload never moves)."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_events_merge

    return replay_events_merge(sf_dir)


def q_expectation_report_events(sf_dir):
    """Data-quality expectations (dbt-tests shape) over events: one
    streaming pass of vectorized per-batch violation partials for the
    row-local rules + a distinct-count exchange for `unique` — output is
    a tiny (rule, violations, checked) table."""
    from vlm_eden_dataset_etl_ray.functions import quality

    return quality.expectation_report(_events(sf_dir), [
        ("not_null", "user_id"),
        ("in_range", "value", 0.0, 300.0),
        ("accepted_values", "event_type",
         ("click", "purchase", "signup", "view")),
        ("matches_regex", "props", r"^\{"),
        ("unique", "event_id"),
        ("unique", ("user_id", "ts")),
    ])


def q_cdc_change_feed_events(sf_dir):
    """CDC output side: 3-epoch replay then lake.change_feed over epochs
    2-3 — per changed key, range-LWW state + _change_type (upsert/delete).
    Reads ONLY the range's delta files (O(changes), partition-parallel,
    no shuffle)."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_events_change_feed

    return replay_events_change_feed(sf_dir)


def q_cdc_change_feed_before(sf_dir):
    """Change feed with before-images: the same 3-epoch replay, but the
    feed over epochs 2-3 carries insert/update/delete classification and
    the pre-range (epoch-1 live) row values, flattened to before_*
    columns. Pre-range state is merged only for CHANGED partitions."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import (
        replay_events_change_feed_before)

    return replay_events_change_feed_before(sf_dir)


def q_event_value_tier_counts(sf_dir):
    """Keyless broadcast interval join: bucket events into fixed value
    tiers (the curriculum-bucketing shape), then count + exact integer-
    cent sums per tier. Tier table rides the object store once; no
    shuffle."""
    from vlm_eden_dataset_etl_ray.functions.relational import (
        broadcast_interval_join, grouped_agg)

    tiers = pa.table({
        "tier": pa.array(["t1", "t2", "t3", "t4", "t5"]),
        "lo": pa.array([0.0, 15.0, 35.0, 70.0, 150.0]),
        "hi": pa.array([15.0, 35.0, 70.0, 150.0, 1000.0]),
    })
    ds = _events(sf_dir, columns=["event_id", "value"])
    ds = broadcast_interval_join(ds, tiers, "value")

    def _cents(t: pa.Table) -> pa.Table:
        c = np.floor(t.column("value").to_numpy(zero_copy_only=False) * 100)
        return t.append_column("cents", pa.array(c.astype(np.int64)))

    ds = ds.map_batches(_cents, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_agg(ds, ["tier"], sums={"cents": "cents"}, counts="n_events")


def q_zone_map_window_scan(sf_dir):
    """Zone-map data skipping: append lake in 3 lsn-tercile epochs, scan
    the middle tercile via stats_filter — 2/3 of the files are pruned
    from the manifest's per-file min/max before any data is read."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_events_zone_map_scan

    return replay_events_zone_map_scan(sf_dir)


def q_lineitem_measures_unpivot(sf_dir):
    """Wide -> long (UNPIVOT/melt) over the lineitem measures, then
    min/max/count per measure via mergeable per-batch partials. No
    shuffle anywhere: melt is a per-batch projection, the combine is one
    reporting-grade task."""
    from vlm_eden_dataset_etl_ray.functions.relational import (
        grouped_min_max_count, unpivot)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_quantity",
                             "l_extendedprice", "l_discount"])
    long = unpivot(ds, ["l_orderkey", "l_linenumber"],
                   ["l_quantity", "l_extendedprice", "l_discount"])
    return grouped_min_max_count(long, ["variable"], "value")


def q_order_date_dense_rank(sf_dir):
    """dense_rank() over (order by o_orderdate) — the duplicate-tolerant
    global-ordering window (row_number requires unique keys): one
    distributed sort, O(blocks) driver metadata with boundary-merge
    accounting, vectorized in-block run cumsum."""
    from vlm_eden_dataset_etl_ray.functions.windows import global_dense_rank
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    return global_dense_rank(ds, ["o_orderdate"], out_col="drank")


def q_order_priority_rank(sf_dir):
    """rank() + cume_dist() + percent_rank() over a 5-distinct-value ordering — every
    block boundary lands inside a tie run (the carry-over case). One sort;
    percent derives from rank and the metadata row count (no second
    pass)."""
    import os as _os

    import pyarrow.parquet as _pq

    from vlm_eden_dataset_etl_ray.functions.windows import global_rank
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    from vlm_eden_dataset_etl_ray.functions.windows import global_cume_dist

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    ds = global_rank(ds, ["o_orderpriority"], out_col="r")
    ds = global_cume_dist(ds, ["o_orderpriority"], out_col="cd", presorted=True)
    total = _pq.ParquetFile(_os.path.join(sf_dir, "orders.parquet")).metadata.num_rows

    def _pct(t: pa.Table) -> pa.Table:
        r = t.column("r").to_numpy(zero_copy_only=False)
        return t.append_column(
            "pr", pa.array((r - 1) / max(total - 1, 1), pa.float64()))

    return ds.map_batches(_pct, batch_format="pyarrow", zero_copy_batch=True)


def q_lineitem_urgent_semijoin(sf_dir):
    """Large x large SEMI join without a broadcast: lineitem ⋉ urgent
    orders — only left rows and the right side's distinct keys shuffle —
    then a grouped count."""
    from vlm_eden_dataset_etl_ray.functions.relational import (
        grouped_count, hash_semi_join)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    import os as _os

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])
    urgent = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"],
                        filter=(pc.field("o_orderpriority") == "1-URGENT"))
    hint = _os.path.getsize(_os.path.join(sf_dir, "lineitem.parquet"))
    kept = hash_semi_join(li, urgent, "l_orderkey", "o_orderkey", bytes_hint=hint)
    return grouped_count(kept, ["l_returnflag"], alias="n")


def q_customers_no_orders_antijoin(sf_dir):
    """Large x large ANTI join (NOT EXISTS): customers with no URGENT
    order, counted per market segment."""
    from vlm_eden_dataset_etl_ray.functions.relational import (
        grouped_count, hash_semi_join)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"],
                        filter=(pc.field("o_orderpriority") == "1-URGENT"))
    import os as _os

    hint = _os.path.getsize(_os.path.join(sf_dir, "customer.parquet"))
    kept = hash_semi_join(cust, orders, "c_custkey", "o_custkey", anti=True,
                          bytes_hint=hint)
    return grouped_count(kept, ["c_mktsegment"], alias="n")


def q_pricing_summary(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.relational import grouped_agg
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _extend(t: pa.Table) -> pa.Table:
        dp = pc.multiply(t.column("l_extendedprice"),
                         pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return t.append_column("disc_price", dp)

    ds = ds.map_batches(_extend, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_agg(
        ds, ["l_returnflag", "l_linestatus"],
        sums={"l_quantity": "sum_qty", "l_extendedprice": "sum_base_price",
              "disc_price": "sum_disc_price"},
        counts="count_order",
    )

    def _final(t: pa.Table) -> pa.Table:
        t = _round_col(t, "sum_base_price", 2)
        t = _round_col(t, "sum_disc_price", 4)
        n = t.column("count_order").to_numpy(zero_copy_only=False).astype(np.float64)
        sq = t.column("sum_qty").to_numpy(zero_copy_only=False)
        sbp = t.column("sum_base_price").to_numpy(zero_copy_only=False)
        t = t.append_column("avg_qty", pa.array(np.round(sq / n, 4), pa.float64()))
        t = t.append_column("avg_price", pa.array(np.round(sbp / n, 4), pa.float64()))
        return t

    return out.map_batches(_final, batch_format="pyarrow")


def q_latest_event_per_user(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.relational import top1_per_key

    ds = _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type", "value"])
    out = top1_per_key(ds, "user_id", [("ts", "descending"), ("event_id", "descending")],
                       cardinality="low")
    return out.select_columns(["user_id", "event_id", "ts", "event_type", "value"])


def q_watermark_filter_events(sf_dir):
    import datetime

    wm = datetime.datetime(2024, 1, 25)
    return _events(
        sf_dir,
        columns=["event_id", "ts", "user_id", "event_type", "value"],
        filter=(pc.field("ts") > wm),
    )


def q_watermark_max(sf_dir):
    ds = _events(sf_dir, columns=["ts"])
    parts = ds.map_batches(
        lambda t: pa.table({"ts": [pc.max(t.column("ts")).as_py()]}),
        batch_format="pyarrow",
    )
    t = _collect(parts)
    return pa.table({"last_sync": [pc.max(t.column("ts")).as_py()]})


def q_latest_event_with_customer(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.relational import (
        broadcast_left_join, top1_per_key)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_small, read_table

    ds = _events(sf_dir, columns=["event_id", "ts", "user_id"])
    latest = top1_per_key(ds, "user_id", [("ts", "descending"), ("event_id", "descending")],
                          cardinality="low")
    cust = read_small(sf_dir, "customer", columns=["c_custkey", "c_name"])
    out = broadcast_left_join(latest, cust, "user_id", "c_custkey", ["c_name"])
    return out.select_columns(["user_id", "event_id", "ts", "c_name"])


def q_event_types_per_user(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.relational import string_agg_distinct

    ds = _events(sf_dir, columns=["user_id", "event_type"])
    return string_agg_distinct(ds, "user_id", "event_type", "event_types")


def q_append_event_types(sf_dir):
    """K6 APPEND-only sink (the reference's dim_technicians: bare INSERT,
    dup rows tolerated across syncs — /root/reference/queries/
    dim_technicians.py:14-29): the events changelog is appended to a lake
    over 2 epochs with NO key reduce, then read back with the reference's
    string_agg(DISTINCT … ORDER BY …) aggregate (dim_technicians.py:3-9)
    plus a per-key row count proving every delivered row was retained."""
    from vlm_eden_dataset_etl_ray.functions.relational import (
        grouped_count, hash_join, string_agg_distinct)
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_events_append

    ds = replay_events_append(sf_dir)
    agg = string_agg_distinct(ds, "doc_id", "source", "event_types")
    cnt = grouped_count(ds, ["doc_id"], "n_rows")
    return hash_join(agg, cnt, "doc_id", "doc_id", how="inner")


def q_customers_without_recent_orders(sf_dir):
    """The validator's windowed anti-join (S11/D4): keys present on one side
    of a recent window but absent on the other
    (/root/reference/queries/fact_studies.py:120-126)."""
    import datetime

    from vlm_eden_dataset_etl_ray.functions.relational import (
        broadcast_membership_filter, distinct_values)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    okeys = distinct_values(
        read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"],
                   filter=(pc.field("o_orderdate") >= datetime.datetime(2001, 6, 1))),
        "o_custkey",
    )
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    return broadcast_membership_filter(cust, "c_custkey", okeys, negate=True)


def q_orders_building_segment(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.relational import (
        broadcast_membership_filter, distinct_values)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    keys = distinct_values(
        read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"],
                   filter=(pc.field("c_mktsegment") == "BUILDING")),
        "c_custkey",
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    return broadcast_membership_filter(orders, "o_custkey", keys)


def q_brand_revenue(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.relational import (
        broadcast_left_join, grouped_agg)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_small, read_table

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])
    part = read_small(sf_dir, "part", columns=["p_partkey", "p_brand"])
    ds = broadcast_left_join(li, part, "l_partkey", "p_partkey", ["p_brand"])

    def _extend(t: pa.Table) -> pa.Table:
        dp = pc.multiply(t.column("l_extendedprice"),
                         pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return t.append_column("disc_price", dp)

    ds = ds.map_batches(_extend, batch_format="pyarrow")
    out = grouped_agg(ds, ["p_brand"], sums={"disc_price": "revenue"}, counts="n_items")
    return out.map_batches(lambda t: _round_col(t, "revenue", 4), batch_format="pyarrow")


def q_daily_event_counts(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.relational import grouped_count

    ds = _events(sf_dir, columns=["ts", "event_type"],
                 filter=(pc.field("event_type") != "error"))

    def _date(t: pa.Table) -> pa.Table:
        return t.append_column("event_date", t.column("ts").cast(pa.date32())).drop_columns(["ts"])

    ds = ds.map_batches(_date, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_count(ds, ["event_date", "event_type"], "n_events")


def q_daily_unique_users(sf_dir):
    """Windowed distinct aggregation: exact unique users per day. Two-level
    mergeable plan: per-batch distinct (day, user) partials collapse
    duplicates before the exchange, the second level counts pairs per day
    — only distinct pairs ever shuffle."""
    from vlm_eden_dataset_etl_ray.functions.relational import grouped_count

    ds = _events(sf_dir, columns=["ts", "user_id"])

    def _date(t: pa.Table) -> pa.Table:
        return t.append_column(
            "event_date", t.column("ts").cast(pa.date32())).drop_columns(["ts"])

    ds = ds.map_batches(_date, batch_format="pyarrow", zero_copy_batch=True)
    pairs = grouped_count(ds, ["event_date", "user_id"], "__n",
                          cardinality="high").drop_columns(["__n"])
    return grouped_count(pairs, ["event_date"], "n_users")


def q_daily_approx_unique_users(sf_dir):
    """Sketch counterpart of daily_unique_users: per-day HLL distinct-user
    estimates — one sketch per (batch, day), tree-merged; constant bytes
    per day cross the exchange instead of distinct pairs (rows-only:
    approximate by design; <5% accuracy pytest in test_sketches)."""
    from vlm_eden_dataset_etl_ray.functions.sketches import approx_distinct

    ds = _events(sf_dir, columns=["ts", "user_id"])

    def _date(t: pa.Table) -> pa.Table:
        return t.append_column(
            "event_date", t.column("ts").cast(pa.date32()).cast(pa.string())
        ).drop_columns(["ts"])

    ds = ds.map_batches(_date, batch_format="pyarrow", zero_copy_batch=True)
    return approx_distinct(ds, "user_id", group_by="event_date")


def q_daily_event_growth(sf_dir):
    """Day-over-day growth report: daily event counts + percent change vs
    the previous day (lag over a global ordering). The lag runs as a
    single-block fold over the POST-AGGREGATE day table — group count
    rows, not event rows — the honest plan for a reporting tail."""
    from vlm_eden_dataset_etl_ray.functions.relational import (
        _single_block, grouped_count)

    ds = _events(sf_dir, columns=["ts"])

    def _date(t: pa.Table) -> pa.Table:
        return t.append_column(
            "event_date", t.column("ts").cast(pa.date32())).drop_columns(["ts"])

    daily = grouped_count(
        ds.map_batches(_date, batch_format="pyarrow", zero_copy_batch=True),
        ["event_date"], "n")

    def _growth(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("growth", pa.array([], pa.float64()))
        t = t.take(pc.sort_indices(t, sort_keys=[("event_date", "ascending")]))
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        prev = np.empty_like(n)
        prev[0] = np.nan
        prev[1:] = n[:-1]
        with np.errstate(invalid="ignore", divide="ignore"):
            growth = np.round((n - prev) / prev, 4)
        return t.append_column(
            "growth", pa.array(growth, pa.float64(),
                               mask=np.isnan(growth)))

    return _single_block(daily).map_batches(
        _growth, batch_format="pyarrow", batch_size=None)


def q_daily_event_counts_with_deleted(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.relational import grouped_count

    ds = _events(sf_dir, columns=["ts", "event_type"])

    def _date(t: pa.Table) -> pa.Table:
        return t.append_column("event_date", t.column("ts").cast(pa.date32())).drop_columns(["ts"])

    ds = ds.map_batches(_date, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_count(ds, ["event_date", "event_type"], "n_events")


def q_user_daily_gapfill(sf_dir):
    """Date-spine densification: every calendar day between each user's
    first and last event, zero-filled where no events occurred."""
    from vlm_eden_dataset_etl_ray.functions.temporal import gap_fill_daily

    ds = _events(sf_dir, columns=["ts", "user_id"])
    return gap_fill_daily(ds, keys=["user_id"], ts_col="ts",
                          day_alias="day", count_alias="n_events")


_TZS = ("America/New_York", "Europe/Paris", "Asia/Tokyo", "Australia/Sydney",
        "America/Los_Angeles", "Asia/Kolkata", "UTC")


def q_tz_local_daily_counts(sf_dir):
    """T7 ROW-DEPENDENT timezone bucketing (the reference computes
    ``(ts AT TIME ZONE facility_timezone)::date`` with the tz coming from a
    joined dim, /root/reference/queries/fact_studies.py:101-106): broadcast
    tz-dim lookup → per-tz-group vectorized local-date conversion →
    grouped count by (tz, local date)."""
    from vlm_eden_dataset_etl_ray.functions.relational import (
        broadcast_left_join, grouped_count)
    from vlm_eden_dataset_etl_ray.functions.temporal import with_local_date
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    nation = _collect(read_table(sf_dir, "nation", columns=["n_nationkey"]))
    nk = nation.column("n_nationkey").to_numpy(zero_copy_only=False)
    dim = pa.table({
        "n_nationkey": nation.column("n_nationkey"),
        "tz": pa.array([_TZS[int(k) % len(_TZS)] for k in nk]),
    })
    ev = _events(sf_dir, columns=["ts", "user_id"])

    def _nk(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("nk", pa.array(uid % 25))

    ds = ev.map_batches(_nk, batch_format="pyarrow", zero_copy_batch=True)
    ds = broadcast_left_join(ds, dim, "nk", "n_nationkey", ["tz"])
    ds = with_local_date(ds, "ts", "tz", alias="event_date")
    return grouped_count(ds, ["tz", "event_date"], "n_events")


def q_monthly_order_priority_counts(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.relational import grouped_count
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_orderpriority"])

    def _month(t: pa.Table) -> pa.Table:
        m = pc.floor_temporal(t.column("o_orderdate"), unit="month").cast(pa.date32())
        return t.append_column("order_month", m).drop_columns(["o_orderdate"])

    ds = ds.map_batches(_month, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_count(ds, ["order_month", "o_orderpriority"], "n_orders")


def q_normalized_documents(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.text import normalize_terms
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return normalize_terms(ds).select_columns(["doc_id", "norm_text"])


def q_tenant_slug_schemas(sf_dir):
    """T6 tenant-slug regex normalization (the reference derives each
    tenant's schema name as re.sub("[^A-Za-z0-9]+", "", slug) —
    /root/reference/utils.py:6-12): customer names as the slug corpus."""
    from vlm_eden_dataset_etl_ray.functions.text import regex_normalize
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    ds = regex_normalize(ds, "c_name", "schema_name")
    return ds.select_columns(["c_custkey", "schema_name"])


def q_cleaned_documents(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.text import coalesce_clean
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    ds = coalesce_clean(ds, "lang", "und", "lang_clean")

    def _upper(t: pa.Table) -> pa.Table:
        return t.append_column("source_norm", pc.utf8_upper(t.column("source")))

    ds = ds.map_batches(_upper, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "lang_clean", "source_norm"])


def q_calendar_dim(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.relational import calendar_dim

    return calendar_dim()


def q_dedup_exact_documents(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.dedup import exact_dedup
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    docs = read_table(sf_dir, "documents", columns=cols)

    def _shift(t: pa.Table) -> pa.Table:
        return t.set_column(0, "doc_id", pc.add(t.column("doc_id"), pa.scalar(100000)))

    dup = read_table(sf_dir, "documents", columns=cols).map_batches(
        _shift, batch_format="pyarrow"
    )
    return exact_dedup(docs.union(dup), on=["text"], keep_by="doc_id").select_columns(cols)


def q_span_dedup_documents(sf_dir):
    """C4-style sub-document dedup: 3-word spans, global keep-first,
    reassembled documents (docs made entirely of already-seen spans
    vanish). Explode → keep-first top-1 on the span string → ordered
    re-agg; three streaming stages, no driver state."""
    from vlm_eden_dataset_etl_ray.functions.dedup import span_dedup
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return span_dedup(docs, span_words=3)


def q_debounced_events(sf_dir):
    """Time-windowed dedup (debounce): drop an event arriving within 24 h
    of its (user, type) predecessor — lag-predicate semantics, one
    co-locating shuffle, vectorized in-group diff."""
    from vlm_eden_dataset_etl_ray.functions.windows import debounce

    ds = _events(sf_dir, columns=["event_id", "ts", "user_id",
                                  "event_type", "value"])
    return debounce(ds, ["user_id", "event_type"], "ts", 86400.0,
                    order_cols=["ts", "event_id"])


def q_incremental_dedup_documents(sf_dir):
    """Cross-epoch incremental exact dedup: the corpus arrives as two
    CDC epochs (split by doc_id); each epoch dedups against the
    lake-backed seen-hash state committed by its predecessors. Epochs
    ordered by doc_id make the incremental result equal the batch
    keep-min-doc_id dedup, so the SQL twin is exact."""
    import tempfile
    from dataclasses import replace

    from vlm_eden_dataset_etl_ray.pipelines.incremental_dedup import (
        HASH_STATE_SPEC,
        incremental_exact_dedup,
    )
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    state = tempfile.mkdtemp(prefix="incdedup_", dir="/tmp")
    spec = replace(HASH_STATE_SPEC, num_partitions=4)  # tiny test state
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    mid = 250  # documents doc_ids are 0-based sequential at every SF
    e1 = docs.filter(expr=f"doc_id <= {mid}")
    e2 = docs.filter(expr=f"doc_id > {mid}")
    s1 = incremental_exact_dedup(state, e1, on=["text"],
                                 keep_by="doc_id", epoch_id="e1",
                                 spec=spec, join_buckets=4)
    s2 = incremental_exact_dedup(state, e2, on=["text"],
                                 keep_by="doc_id", epoch_id="e2",
                                 spec=spec, join_buckets=4)
    return s1.union(s2)


def q_k_anonymous_events(sf_dir):
    """k-anonymity suppression: drop events whose (user_id, event_type)
    quasi-identifier combo occurs fewer than 13 times (312 of 750 combos
    at sf0.01). Hash-keyed two-stage count + one semi-join; the payload
    never shuffles twice."""
    from vlm_eden_dataset_etl_ray.functions.sampling import k_anonymize

    ds = _events(sf_dir, columns=["event_id", "ts", "user_id",
                                  "event_type", "value"])
    return k_anonymize(ds, ["user_id", "event_type"], k=13, num_buckets=8)


def q_forecast_revenue(sf_dir):
    """TPC-H Q6 shape: revenue delta from a what-if discount window —
    filter pushdown at the read (shipdate range to row groups), exact
    integer-cent partial sums per batch, one scalar out. No shuffle."""
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"],
        filter=(pc.field("l_shipdate") >= dt.datetime(1999, 6, 1))
        & (pc.field("l_shipdate") < dt.datetime(2000, 6, 1)))

    def _partial(t: pa.Table) -> pa.Table:
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        keep = (disc >= 0.05) & (disc <= 0.07) & (qty < 24)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        cents4 = (np.round(ep * 100).astype(np.int64)
                  * np.round(disc[keep] * 100).astype(np.int64))
        return pa.table({"__s": pa.array([int(cents4.sum())], pa.int64())})

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    total = sum(r["__s"] for r in parts.take_all())
    return pa.table({"revenue": pa.array([round(total / 1e4, 2)],
                                         pa.float64())})


def q_weighted_sample_docs(sf_dir):
    """Weighted sampling without replacement (A-Res): 60 documents drawn
    with inclusion probability ∝ n_chars, deterministic hash-derived
    uniforms. Per-batch local top-k, tiny final reduce; payload never
    shuffles."""
    from vlm_eden_dataset_etl_ray.functions.sampling import weighted_sample
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return weighted_sample(ds, "doc_id", "n_chars", k=60, seed=7)


def q_incremental_minhash_dedup(sf_dir):
    """Cross-epoch NEAR-dup dedup: the corpus arrives as two epochs
    (split by doc_id); epoch 2 drops documents whose MinHash signature
    collides with epoch-1 keepers via the lake-backed LSH-key state,
    then near-dup-clusters the rest in-epoch. Rows-only (LSH has no
    sane SQL twin); determinism + cross-epoch drops guarded by pytest."""
    import tempfile
    from dataclasses import replace

    from vlm_eden_dataset_etl_ray.pipelines.incremental_dedup import (
        MINHASH_STATE_SPEC,
        incremental_minhash_dedup,
    )
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    state = tempfile.mkdtemp(prefix="incmh_", dir="/tmp")
    spec = replace(MINHASH_STATE_SPEC, num_partitions=4)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    e1 = docs.filter(expr="doc_id <= 250")
    e2 = docs.filter(expr="doc_id > 250")
    s1 = incremental_minhash_dedup(
        state, e1, epoch_id="e1", threshold=0.9, num_perm=128, bands=8,
        spec=spec, join_buckets=4)
    s2 = incremental_minhash_dedup(
        state, e2, epoch_id="e2", threshold=0.9, num_perm=128, bands=8,
        spec=spec, join_buckets=4)
    return s1.union(s2)


def q_funnel_conversion(sf_dir):
    """Ordered funnel signup → view → purchase over the first 3 days:
    users reaching each step with strict greedy-first-occurrence
    semantics. Pre-shuffle type prune, one user co-location, masked-min
    per step, tiny tree-reduced tail."""
    from vlm_eden_dataset_etl_ray.functions.behavior import funnel_conversion

    ds = _events(sf_dir, columns=["user_id", "event_type", "ts"])

    def _window(t: pa.Table) -> pa.Table:
        import datetime as _dt
        return t.filter(pc.less(t.column("ts"),
                                pa.scalar(_dt.datetime(2024, 1, 4))))

    ds = ds.map_batches(_window, batch_format="pyarrow")
    return funnel_conversion(ds, "user_id", "event_type", "ts",
                             ["signup", "view", "purchase"])


def q_cohort_retention(sf_dir):
    """Weekly cohort retention grid: distinct users per (first-active
    day, week offset). Per-batch distinct (user, day), one user
    co-location, bounded grouped count."""
    from vlm_eden_dataset_etl_ray.functions.behavior import cohort_retention

    ds = _events(sf_dir, columns=["user_id", "ts"])
    return cohort_retention(ds, "user_id", "ts", period_days=7)


def q_ngram_jaccard_dupes(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.dedup import ngram_jaccard_pairs
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(docs, "doc_id", "text", JACCARD_T)


def q_prefix_jaccard_dupes(sf_dir):
    """EXACT Jaccard ≥ τ pairs at scale via prefix filtering (AllPairs/
    PPJoin blocking): per-doc prefixes of the globally-ordered term sets →
    token-bucket candidate pairs with the in-bucket size filter →
    shuffle-join exact verify. Same result as the quadratic baseline
    (`ngram_jaccard_dupes`) with no O(n²) stage and no corpus broadcast —
    the exact complement of the approximate `minhash_near_dupes`."""
    from vlm_eden_dataset_etl_ray.functions.dedup import prefix_jaccard_pairs
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return prefix_jaccard_pairs(docs, "doc_id", "text", JACCARD_T)


def q_knn_cosine_topk(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.knn import knn_brute_force
    from vlm_eden_dataset_etl_ray.sources.parquet import read_small, read_table

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    queries = read_small(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                         filter=(pc.field("vec_id") < 8))
    out = knn_brute_force(emb, queries, k=5)
    return out.map_batches(lambda t: _round_col(t, "cosine", 4), batch_format="pyarrow")


def q_embedding_near_dup_pairs(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.dedup import embedding_near_dup
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dup(emb, "vec_id", "embedding", COSINE_T)


def q_embedding_near_dup_bucketed(sf_dir):
    """IVF-bucketed near-dup pairs — the scale path for the all-pairs
    baseline above. Rows-only by design (recall < 1.0 by construction);
    recall vs brute force is asserted in pytest."""
    from vlm_eden_dataset_etl_ray.functions.dedup import (
        embedding_near_dup_bucketed)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dup_bucketed(emb, "vec_id", "embedding", COSINE_T,
                                       n_clusters=8, n_probe=3)


def q_embedding_centroids(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.knn import label_centroids
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    emb = read_table(sf_dir, "embeddings", columns=["label", "embedding"])
    return label_centroids(emb)


def q_token_stats_docs(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.text import token_stats
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return token_stats(ds).select_columns(["doc_id", "n_words", "n_distinct"])


def q_quality_scores_docs(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.text import quality_scores
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return quality_scores(ds).select_columns(["doc_id", "avg_word_len", "stopword_ratio"])


def q_multimodal_decode_meta(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.multimodal import decode_stage, text_as_payload
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ds = decode_stage(text_as_payload(ds), batch_size=256)
    return ds.select_columns(["doc_id", "payload_bytes", "fake_width", "fake_height", "checksum"])


def q_image_phash_dupes(sf_dir):
    """Image near-dup pairs via perceptual hash: every document's payload
    plus a tail-tweaked copy (re-encode noise stand-in) → aHash actor
    pool → pigeonhole Hamming banding. Only 16-byte (id, code) rows
    cross the exchange; rows-only check (the byte-grid hash has no sane
    SQL twin), determinism + recall guarded by pytest."""
    from vlm_eden_dataset_etl_ray.functions.multimodal import (
        phash_near_dup_pairs, text_as_payload)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _tweak(t: pa.Table) -> pa.Table:
        # LENGTH-PRESERVING corruption (first 3 chars -> 'zzz'): the fake
        # grid samples byte positions, so only aligned edits model
        # re-encode noise; a length change would shift every sample
        return pa.table({
            "doc_id": pc.add(t.column("doc_id"), pa.scalar(100000)),
            "text": pc.utf8_replace_slice(
                t.column("text").cast(pa.string()), start=0, stop=3,
                replacement="zzz"),
        })

    dup = read_table(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(_tweak, batch_format="pyarrow")
    ds = text_as_payload(docs.union(dup))
    return phash_near_dup_pairs(ds, max_hamming=3)


def q_image_phash_dupes_real(sf_dir):
    """REAL-codec image near-dup pairs: deterministic 32×32 RGB images are
    synthesized per doc_id, encoded as actual binary PPM (netpbm P6), and
    a pixel-perturbed re-encode of each rides along — then the REAL
    pipeline runs: decode (built-in pure-numpy netpbm codec; Pillow when
    installed) → 8×8 area resize → grayscale aHash → pigeonhole Hamming
    banding. Rows-only check (no SQL twin for a codec); recall/precision
    guarded by tests/test_multimodal_real.py."""
    from vlm_eden_dataset_etl_ray.functions.multimodal import (
        AHashImage, encode_ppm, phash_near_dup_pairs)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def _render(t: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for d in t.column("doc_id").to_pylist():
            rng = np.random.default_rng(int(d))
            img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            ids.append(2 * int(d))
            payloads.append(encode_ppm(img))
            noisy = img.copy()
            noisy[rng.integers(0, 32, 4), rng.integers(0, 32, 4)] = \
                rng.integers(0, 256, (4, 3))
            ids.append(2 * int(d) + 1)
            payloads.append(encode_ppm(noisy))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "payload": pa.array(payloads, pa.binary())})

    imgs = docs.map_batches(_render, batch_format="pyarrow", batch_size=256)
    return phash_near_dup_pairs(imgs, max_hamming=6, hasher=AHashImage)


def q_top3_events_per_user(sf_dir):
    """Top-k per key (D1 generalized): 3 highest-value events per user."""
    from vlm_eden_dataset_etl_ray.functions.relational import topk_per_key

    ds = _events(sf_dir, columns=["event_id", "user_id", "value"])
    out = topk_per_key(
        ds, "user_id", [("value", "descending"), ("event_id", "descending")], 3,
        cardinality="low",
    )
    return out.select_columns(["user_id", "event_id", "value"])


def q_tumbling_event_counts(sf_dir):
    """Tumbling 6-hour windows per event type (epoch-bucketed — Ray Data has
    no event-time windows, so windows are derived grouping keys)."""
    from vlm_eden_dataset_etl_ray.functions.relational import grouped_count

    ds = _events(sf_dir, columns=["ts", "event_type"])

    def _win(t: pa.Table) -> pa.Table:
        sec = t.column("ts").cast(pa.int64())  # microseconds since epoch
        w = pc.multiply(pc.floor(pc.divide(pc.divide(sec, 1_000_000), 21600)), 21600)
        return t.append_column("window_start", w.cast(pa.int64())).drop_columns(["ts"])

    ds = ds.map_batches(_win, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_count(ds, ["window_start", "event_type"], "n_events")


def q_term_frequencies(sf_dir):
    """Explode/flat_map coverage: word → document frequency over the corpus
    (map_batches emitting more rows than it receives)."""
    from vlm_eden_dataset_etl_ray.functions.relational import grouped_count
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["text"])

    def _explode(t: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(t.column("text").combine_chunks())
        terms = s.str.split(" ").explode()
        return pa.table({"term": terms.to_arrow().cast(pa.string())})

    ds = ds.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_count(ds, ["term"], "n")


def q_orders_with_customer_join(sf_dir):
    """Large×large partitioned hash join (tagged union → one bucket shuffle
    → per-bucket merge) — the non-broadcast join path."""
    from vlm_eden_dataset_etl_ray.functions.relational import hash_join
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"])
    return hash_join(orders, cust, "o_custkey", "c_custkey", how="inner")


def q_order_window_event_counts(sf_dir):
    """Range (interval) join with an equality key: for each order, count
    the customer's OTHER orders placed within 90 days after it (one
    hash-bucket shuffle + vectorized interval filter + grouped count)."""
    from vlm_eden_dataset_etl_ray.functions.relational import grouped_count, range_join
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    follow = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    follow = follow.map_batches(
        lambda t: t.rename_columns(["f_orderkey", "f_custkey", "f_orderdate"]),
        batch_format="pyarrow", zero_copy_batch=True)
    anchor = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def _window(t: pa.Table) -> pa.Table:
        end = pc.add(t.column("o_orderdate"),
                     pa.scalar(90 * 86400 * 1_000_000, type=pa.duration("us")))
        return t.append_column("o_end", end)

    anchor = anchor.map_batches(_window, batch_format="pyarrow", zero_copy_batch=True)
    matched = range_join(follow, anchor, "f_custkey", "o_custkey",
                         "f_orderdate", "o_orderdate", "o_end", closed="left")
    matched = matched.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t.column("f_orderkey"),
                                              t.column("o_orderkey")))),
        batch_format="pyarrow", zero_copy_batch=True)
    return grouped_count(matched, ["o_orderkey"], "n_follow")


def q_active_buyers_intersect(sf_dir):
    """Distinct set op: user ids present in BOTH events and orders
    (INTERSECT DISTINCT) — tagged union + one all-columns groupby."""
    from vlm_eden_dataset_etl_ray.functions.relational import distinct_set_op
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ev = _events(sf_dir, columns=["user_id"])
    buyers = read_table(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        lambda t: t.rename_columns(["user_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return distinct_set_op(ev, buyers, "intersect")


def q_rollup_event_counts(sf_dir):
    """ROLLUP multi-level counts: (event_type, day), (event_type), grand
    total in one result — only the finest level touches the data, coarser
    levels re-aggregate the counts."""
    from vlm_eden_dataset_etl_ray.functions.relational import rollup_counts

    ds = _events(sf_dir, columns=["event_type", "ts"])

    def _day(t: pa.Table) -> pa.Table:
        return t.drop_columns(["ts"]).append_column(
            "day", t.column("ts").cast(pa.date32()))

    ds = ds.map_batches(_day, batch_format="pyarrow", zero_copy_batch=True)
    return rollup_counts(ds, ["event_type", "day"], "n")


def q_rolling_median_value(sf_dir):
    """Frame-bounded rolling median (7-row trailing) of event values per
    user — the robust smoother; one co-locating shuffle, vectorized
    in-group rolling."""
    from vlm_eden_dataset_etl_ray.functions.windows import rolling_median

    ds = _events(sf_dir, columns=["event_id", "user_id", "ts", "value"])
    out = rolling_median(ds, "user_id", ["ts", "event_id"], "value", 7)
    return out.select_columns(["event_id", "user_id", "rolling_median"])


def q_event_type_transitions(sf_dir):
    """Markov transition counts over each user's event sequence: lag()
    per user, then a bounded grouped count of (prev_type, type) pairs —
    the session-flow / funnel-discovery input."""
    from vlm_eden_dataset_etl_ray.functions.relational import (
        grouped_count, with_previous)

    ds = _events(sf_dir, columns=["event_id", "user_id", "event_type", "ts"])
    prev = with_previous(ds, "user_id", ["ts", "event_id"], ["event_type"])

    def _drop_first(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("prev_event_type")))

    pairs = prev.map_batches(_drop_first, batch_format="pyarrow")
    return grouped_count(pairs, ["prev_event_type", "event_type"],
                         alias="n")


def q_event_gaps(sf_dir):
    """lag() windowed operator: per event, microseconds since the user's
    previous event (null for each user's first) — groupby shuffle +
    in-group vectorized shift."""
    from vlm_eden_dataset_etl_ray.functions.relational import with_previous

    ds = _events(sf_dir, columns=["event_id", "user_id", "ts"])
    out = with_previous(ds, "user_id", ["ts", "event_id"], ["ts"])

    def _gap(t: pa.Table) -> pa.Table:
        gap = pc.subtract(t.column("ts").cast(pa.int64()),
                          t.column("prev_ts").cast(pa.int64()))
        t = t.append_column("gap_us", gap)
        return t.select(["event_id", "user_id", "ts", "gap_us"])

    return out.map_batches(_gap, batch_format="pyarrow", zero_copy_batch=True)


def q_monthly_priority_pivot(sf_dir):
    """Pivot-style conditional aggregation: one row per order month with a
    count column per priority (`sum(case when …)` shape; mergeable wide
    partials, one tiny per-key combine)."""
    from vlm_eden_dataset_etl_ray.functions.relational import pivot_count
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(sf_dir, "orders", columns=["o_orderdate", "o_orderpriority"])

    def _month(t: pa.Table) -> pa.Table:
        m = pc.floor_temporal(t.column("o_orderdate"), unit="month")
        return t.drop_columns(["o_orderdate"]).append_column("month", m)

    orders = orders.map_batches(_month, batch_format="pyarrow", zero_copy_batch=True)
    return pivot_count(
        orders, "month", "o_orderpriority",
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        alias_fmt="n_{}")


def q_running_total_per_customer(sf_dir):
    """Cumulative windowed aggregate: per-customer running order total in
    (o_orderdate, o_orderkey) order — the `sum() over (partition by ...
    order by ...)` shape, as a groupby shuffle + in-group vectorized
    cumsum. Cents (int64) so the running sum is bit-exact vs the oracle."""
    from vlm_eden_dataset_etl_ray.functions.relational import running_sum
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        c = np.round(t.column("o_totalprice").to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        return t.drop_columns(["o_totalprice"]).append_column("cents", pa.array(c))

    orders = orders.map_batches(_cents, batch_format="pyarrow", zero_copy_batch=True)
    out = running_sum(orders, "o_custkey", ["o_orderdate", "o_orderkey"],
                      "cents", alias="running_cents")
    return out.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate", "cents", "running_cents"])


def q_events_with_customer_skewjoin(sf_dir):
    """Skew-safe large×large join: hot user keys detected by sampling take
    a broadcast side-path (no shuffle), cold keys take the bucketed path —
    identical semantics to a plain hash join, verified by the same oracle."""
    from vlm_eden_dataset_etl_ray.functions.relational import skew_hash_join
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ev = _events(sf_dir, columns=["event_id", "user_id"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    # hot_frac below any real key share → exercises BOTH paths at sf0.01
    return skew_hash_join(ev, cust, "user_id", "c_custkey", how="inner",
                          hot_frac=0.01, num_buckets=16)


def q_user_value_stats(sf_dir):
    """Grouped min/max/count/count-distinct per user (reference A-family
    breadth). The group key is user-cardinality (unbounded at scale), so
    every stage is a shuffle path: mergeable min/max/count partials →
    groupby combine, and count-distinct as a two-level groupby (distinct
    (user, type) pairs, then count per user) — no driver-side set merge."""
    from ray.data.aggregate import Max, Min, Sum

    from vlm_eden_dataset_etl_ray.functions.relational import hash_join

    ds = _events(sf_dir, columns=["user_id", "value", "event_type"])

    def _partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id"]).aggregate(
            [("value", "min"), ("value", "max"), ([], "count_all")]
        )
        return g.rename_columns(["user_id", "__min", "__max", "__n"])

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    stats = (
        partial.groupby("user_id")
        .aggregate(Min("__min", alias_name="min_value"),
                   Max("__max", alias_name="max_value"),
                   Sum("__n", alias_name="n_events"))
        .map_batches(lambda t: t.set_column(
            t.column_names.index("n_events"), "n_events",
            t.column("n_events").cast(pa.int64())), batch_format="pyarrow")
    )

    def _local_distinct(t: pa.Table) -> pa.Table:
        return t.select(["user_id", "event_type"]).group_by(
            ["user_id", "event_type"]).aggregate([])

    ntypes = (
        ds.map_batches(_local_distinct, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "event_type"]).count()
        .groupby("user_id").count()
        .map_batches(lambda t: pa.table({
            "__uid": t.column("user_id"),
            "n_event_types": t.column("count()").cast(pa.int64())}),
            batch_format="pyarrow")
    )
    return hash_join(stats, ntypes, "user_id", "__uid", how="inner").map_batches(
        lambda t: t.drop_columns(["__uid"]), batch_format="pyarrow")


def q_median_value_per_user(sf_dir):
    """Exact grouped median (interpolated) — per-key map_groups over the
    full group; medians are not mergeable so this is the honest shuffle."""
    import pandas as pd

    ds = _events(sf_dir, columns=["user_id", "value"])

    def _med(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "median_value": [g["value"].median()]})

    return ds.groupby("user_id").map_groups(_med, batch_format="pandas")


def q_approx_distinct_users(sf_dir):
    """HLL sketch: approximate distinct users per event_type (rows-only —
    approximate by design; accuracy asserted vs exact in pytest)."""
    from vlm_eden_dataset_etl_ray.functions.sketches import approx_distinct

    ds = _events(sf_dir, columns=["user_id", "event_type"])
    return approx_distinct(ds, "user_id", group_by="event_type")


def q_user_sessions(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.relational import session_counts

    ds = _events(sf_dir, columns=["user_id", "ts"])
    return session_counts(ds, "user_id", "ts", SESSION_GAP_H * 3600)


def q_distinct_lang_source(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.relational import grouped_count
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["lang", "source"])
    return grouped_count(ds, ["lang", "source"], "n").select_columns(["lang", "source"])


def q_top10_orders(sf_dir):
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort("o_totalprice", descending=True).limit(10)


# ---- non-SQL-expressible (rows-only driver check) -------------------------


def q_bpe_merge_table(sf_dir):
    """BPE tokenizer training (Sennrich 2016): 30 merges learned over the
    corpus. Distributed work = ONE mergeable word count (vocabulary-sized
    output); the merge loop runs driver-side over that tiny table, like
    every production tokenizer trainer. Deterministic tie-breaks make the
    result layout-independent (rows-only; serial-oracle equivalence in
    pytest)."""
    from vlm_eden_dataset_etl_ray.functions.bpe import bpe_train
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["text"])
    merges = bpe_train(ds, n_merges=30)
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([a for a, _ in merges], pa.string()),
        "right": pa.array([b for _, b in merges], pa.string()),
    })


def q_bpe_token_counts_docs(sf_dir):
    """Apply a trained BPE vocabulary: per document, its subword count —
    actor-pool encoding stage with per-actor merge ranks and a distinct-word
    cache (rows-only; encode/train consistency in pytest)."""
    from vlm_eden_dataset_etl_ray.functions.bpe import bpe_encode, bpe_train
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    merges = bpe_train(ds, n_merges=30)
    enc = bpe_encode(ds, merges)

    def _n(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_bpe": pc.list_value_length(t.column("bpe_tokens"))
            .cast(pa.int64()),
        })

    return enc.map_batches(_n, batch_format="pyarrow", zero_copy_batch=True)


def q_user_value_trend(sf_dir):
    """Per-user metric drift: least-squares slope/intercept of value
    against within-user chronological rank (regr_slope/regr_intercept
    twin; rank-x keeps the moments numerically exact)."""
    from vlm_eden_dataset_etl_ray.functions.stats import grouped_trend

    ds = _events(sf_dir, columns=["user_id", "ts", "event_id", "value"])
    return grouped_trend(ds, "user_id", ["ts", "event_id"], "value")


def q_user_value_ema(sf_dir):
    """Per-user exponential moving average of event values (pandas
    ewm(adjust=False) semantics) — sequential recurrence evaluated as a
    vectorized segment-wise closed form; not SQL-expressible (rows-only
    check; exactness vs pandas covered in pytest)."""
    from vlm_eden_dataset_etl_ray.functions.windows import ewm_mean

    ds = _events(sf_dir, columns=["event_id", "user_id", "ts", "value"])
    out = ewm_mean(ds, "user_id", ["ts", "event_id"], "value", alpha=0.2)
    return out.select_columns(["event_id", "user_id", "ema"])


def q_asof_latest_order(sf_dir):
    """As-of join: each event matched to the user's latest order at or
    before the event time (right side deduped to max o_orderkey per
    (custkey, date) so the as-of pick is deterministic)."""
    from vlm_eden_dataset_etl_ray.functions.relational import asof_join_broadcast
    from vlm_eden_dataset_etl_ray.sources.parquet import read_small

    ev = _events(sf_dir, columns=["event_id", "user_id", "ts"])
    orders = read_small(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderkey"])
    orders = (
        orders.group_by(["o_custkey", "o_orderdate"]).aggregate([("o_orderkey", "max")])
        .rename_columns(["o_custkey", "o_orderdate", "o_orderkey"])
    )
    out = asof_join_broadcast(
        ev, orders, "user_id", "o_custkey", "ts", "o_orderdate",
        ["o_orderkey", "o_orderdate"],
    )
    return out.select_columns(["event_id", "user_id", "ts", "o_orderkey", "o_orderdate"])


def q_asof_latest_order_bucketed(sf_dir):
    """Both-sides-large as-of join: hash-bucket BOTH sides on the by-key and
    merge_asof per bucket — the no-broadcast scale path (same semantics and
    oracle as `asof_latest_order`)."""
    from vlm_eden_dataset_etl_ray.functions.relational import asof_join_bucketed
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ev = _events(sf_dir, columns=["event_id", "user_id", "ts"])
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate", "o_orderkey"])

    def _dedup_day(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey", "o_orderdate"]).aggregate([("o_orderkey", "max")])
        return g.rename_columns(["o_custkey", "o_orderdate", "o_orderkey"])

    # per-batch partial + final combine on the (custkey, date) key: right
    # side must be tie-free per (key, ts) for a deterministic as-of pick
    orders = orders.map_batches(_dedup_day, batch_format="pyarrow",
                                zero_copy_batch=True)
    orders = orders.groupby(["o_custkey", "o_orderdate"]).max("o_orderkey")

    def _restore(t: pa.Table) -> pa.Table:
        # Ray's sort-shuffle groupby normalizes the timestamp KEY to [s];
        # restore [us] so the output dtype matches the oracle
        t = t.rename_columns(["o_custkey", "o_orderdate", "o_orderkey"])
        return t.set_column(1, "o_orderdate",
                            t.column("o_orderdate").cast(pa.timestamp("us")))

    orders = orders.map_batches(_restore, batch_format="pyarrow")
    out = asof_join_bucketed(
        ev, orders, "user_id", "o_custkey", "ts", "o_orderdate",
        ["o_orderkey", "o_orderdate"], num_buckets=16,
    )
    return out.select_columns(["event_id", "user_id", "ts", "o_orderkey", "o_orderdate"])


def q_hopping_event_counts(sf_dir):
    """Hopping (sliding) 6h windows every 3h: each event lands in 2 windows
    (batch-expanding vectorized explode), then a grouped count."""
    from vlm_eden_dataset_etl_ray.functions.relational import grouped_count
    from vlm_eden_dataset_etl_ray.functions.temporal import explode_hopping_windows

    ds = _events(sf_dir, columns=["ts", "event_type"])
    ds = explode_hopping_windows(ds, "ts", size_s=21600, hop_s=10800)
    ds = ds.map_batches(lambda t: t.drop_columns(["ts"]), batch_format="pyarrow")
    return grouped_count(ds, ["window_start", "event_type"], "n_events")


def q_etl_star_fact(sf_dir):
    """Full multi-table ETL: dim snapshot-upsert → broadcast-enriched fact
    changelog → exactly-once epoch apply → merge-on-read (reference
    run_etl, tasks.py:31-45)."""
    from vlm_eden_dataset_etl_ray.pipelines.etl import fact_snapshot, run_etl

    lakes = run_etl(sf_dir)
    return fact_snapshot(lakes)


def q_minhash_near_dupes(sf_dir):
    """MinHash+LSH near-dup pairs, exact-Jaccard verified. Oracle: the
    brute-force all-pairs word-set Jaccard in SQL — sound because LSH
    recall at J ≥ 0.97 with 128 perms / 16 bands of 8 rows is
    1-(1-.97^8)^16 ≈ 1-2e-11, and the verify stage makes precision exact;
    verified pair-for-pair identical at sf0.01 (444 = 444). 16×8 banding
    (vs 32×4) cuts candidate-bucket collisions ~2.5× on this small-vocab
    corpus at no recall cost at this threshold."""
    from vlm_eden_dataset_etl_ray.functions.dedup import minhash_lsh_pairs
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_lsh_pairs(docs, "doc_id", "text", threshold=JACCARD_T,
                             num_perm=128, bands=16)


def q_minhash_dedup_docs(sf_dir):
    """Near-dup CLUSTERING — the scale path: star edges bounded by
    bands×docs regardless of clique sizes, shuffle-join Jaccard verify,
    distributed connected components (no driver-side corpus state)."""
    from vlm_eden_dataset_etl_ray.functions.dedup import minhash_dedup
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_dedup(docs, "doc_id", "text", threshold=JACCARD_T)


def q_simhash_near_dupes(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.dedup import simhash_pairs
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_pairs(docs, "doc_id", "text", max_hamming=3)


def _lang_id_oracle_sql() -> str:
    """SQL twin of the LangId heuristic, generated from the SAME profile
    table: exploded-word profile join → per-(doc, lang) counts → argmax
    with (count desc, lang asc) tie-break; zero matches → first language
    alphabetically (the engine's langs[0])."""
    from vlm_eden_dataset_etl_ray.functions.text import LANG_PROFILES

    vals = ",".join(f"('{w}','{l}')"
                    for l, ws in sorted(LANG_PROFILES.items()) for w in ws)
    first = sorted(LANG_PROFILES)[0]
    return f"""
        with profile(w, plang) as (values {vals}),
        words as (select doc_id, unnest(string_split(text, ' ')) as w
                  from documents),
        hits as (select doc_id, plang, count(*) n
                 from words join profile using (w) group by 1, 2),
        best as (select doc_id, plang from hits
                 qualify row_number() over (partition by doc_id
                                            order by n desc, plang) = 1)
        select d.doc_id, d.lang, coalesce(b.plang, '{first}') as lang_pred
        from documents d left join best b using (doc_id)
    """


def q_lang_id_docs(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.text import lang_id
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return lang_id(ds).select_columns(["doc_id", "lang", "lang_pred"])


def q_knn_sq_topk(sf_dir):
    """ANN over int8-scalar-quantized embeddings (4x smaller vectors;
    rows-only: approximate by design, recall vs the float baseline
    asserted in pytest). fit -> encode -> search, all streaming."""
    from vlm_eden_dataset_etl_ray.functions.knn import knn_sq, sq_encode, sq_fit
    from vlm_eden_dataset_etl_ray.sources.parquet import read_small, read_table

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    queries = read_small(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                         filter=(pc.field("vec_id") < 8))
    params = sq_fit(emb, "embedding")
    enc = sq_encode(emb, params)
    out = knn_sq(enc, queries, params, k=5)
    return out.map_batches(lambda t: _round_col(t, "cosine", 4), batch_format="pyarrow")


def q_knn_pq_topk(sf_dir):
    """ANN over product-quantized embeddings via asymmetric-distance
    lookup tables (rows-only: approximate by design; ADC machinery
    verified bit-exact against a numpy reference in pytest)."""
    from vlm_eden_dataset_etl_ray.functions.knn import knn_pq, pq_encode, pq_fit
    from vlm_eden_dataset_etl_ray.sources.parquet import read_small, read_table

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    queries = read_small(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                         filter=(pc.field("vec_id") < 8))
    params = pq_fit(emb, "embedding", m=4, k=64, sample_frac=0.5)
    enc = pq_encode(emb, params)
    out = knn_pq(enc, queries, params, k=5)
    return out.map_batches(lambda t: _round_col(t, "cosine", 4), batch_format="pyarrow")


def q_pack_token_blocks(sf_dir):
    """Sequence packing (GPT-style concat) of the documents' hashed-word
    token ids into 512-token training blocks (rows-only: block layout is
    engine-defined; conservation/boundary invariants asserted in pytest).
    The query pins the corpus into one batch so its output is
    deterministic — the operator itself is a per-batch streaming
    transform."""
    from vlm_eden_dataset_etl_ray.functions.hashing import hash_strings
    from vlm_eden_dataset_etl_ray.functions.packing import pack_sequences
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _tokenize(t: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(pc.utf8_lower(t.column("text")), r"\s+")
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        flat = words.flatten()
        ids = (hash_strings(np.asarray(flat.to_pylist(), dtype=object))
               % np.uint64(50257)).astype(np.int32)
        toks = pa.ListArray.from_arrays(words.offsets, pa.array(ids, pa.int32()))
        return pa.table({"doc_id": t.column("doc_id").combine_chunks(),
                         "tokens": toks})

    ds = ds.repartition(1).map_batches(_tokenize, batch_format="pyarrow",
                                       zero_copy_batch=True)
    packed = pack_sequences(ds, block_size=512)

    def _stats(t: pa.Table) -> pa.Table:
        starts = t.column("doc_starts")
        n_docs = pa.array(
            np.diff(starts.combine_chunks().offsets.to_numpy(
                zero_copy_only=False)).astype(np.int64))
        heads = pc.list_element(t.column("block"), 0)
        return pa.table({"n_real": t.column("n_real"),
                         "n_docs": n_docs, "head": heads})

    return packed.map_batches(_stats, batch_format="pyarrow")


def q_knn_ivf_topk(sf_dir):
    from vlm_eden_dataset_etl_ray.functions.knn import knn_ivf
    from vlm_eden_dataset_etl_ray.sources.parquet import read_small, read_table

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    queries = read_small(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                         filter=(pc.field("vec_id") < 8))
    out = knn_ivf(emb, queries, k=5)
    return out.map_batches(lambda t: _round_col(t, "cosine", 4), batch_format="pyarrow")


def q_knn_lsh_topk(sf_dir):
    """ANN via random-hyperplane LSH buckets + multi-probe (rows-only:
    approximate by design; recall vs brute force asserted in pytest)."""
    from vlm_eden_dataset_etl_ray.functions.knn import knn_lsh
    from vlm_eden_dataset_etl_ray.sources.parquet import read_small, read_table

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    queries = read_small(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                         filter=(pc.field("vec_id") < 8))
    out = knn_lsh(emb, queries, k=5)
    return out.map_batches(lambda t: _round_col(t, "cosine", 4), batch_format="pyarrow")


def q_approx_value_quantiles(sf_dir):
    """Approximate per-group quantiles via mergeable centroid sketches
    (rows-only: approximate by design; <5% accuracy vs exact asserted in
    pytest)."""
    from vlm_eden_dataset_etl_ray.functions.sketches import approx_quantiles

    ds = _events(sf_dir, columns=["event_type", "value"])
    return approx_quantiles(ds, "value", qs=(0.5, 0.9, 0.99), group_by="event_type")


def q_bpe_token_counts(sf_dir):
    """BPE-ish regex token counting per document (vectorized RE2
    match-count; the LLM token-budget proxy)."""
    from vlm_eden_dataset_etl_ray.functions.text import bpe_token_counts
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return bpe_token_counts(docs, "text").select_columns(["doc_id", "n_bpe_tokens"])


def q_heavy_hitter_event_types(sf_dir):
    """Approximate top-k frequent values via mergeable CountMin sketches +
    per-batch candidate union. At this key cardinality the sketch is
    collision-free, so the estimates equal exact counts — the oracle checks
    them exactly (accuracy bounds are pytest-checked at higher cardinality)."""
    from vlm_eden_dataset_etl_ray.functions.sketches import approx_heavy_hitters

    ds = _events(sf_dir, columns=["event_type"])
    return approx_heavy_hitters(ds, "event_type", k=5)


def q_redacted_documents(sf_dir):
    """PII scrubbing: chained vectorized RE2 replacements (email/phone/SSN →
    placeholders). PII is planted deterministically from doc_id so the
    redaction does real work; both sides run the identical regexes."""
    from vlm_eden_dataset_etl_ray.functions.text import redact_patterns
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _plant(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.string())
        planted = pc.binary_join_element_wise(
            pa.array(["contact user"] * t.num_rows), ids,
            pa.array(["@example.com call 555-123-4567 "] * t.num_rows),
            t.column("text"), "")
        return t.drop_columns(["text"]).append_column("text", planted)

    docs = docs.map_batches(_plant, batch_format="pyarrow", zero_copy_batch=True)
    out = redact_patterns(docs, "text", "clean")
    return out.select_columns(["doc_id", "clean"])


def q_contamination_flags(sf_dir):
    """Benchmark decontamination: flag documents sharing any 8-gram with a
    small benchmark set (docs with doc_id < 25). Benchmark n-gram hashes
    are built once and broadcast; the corpus side streams vectorized."""
    from vlm_eden_dataset_etl_ray.functions.contamination import (
        benchmark_ngram_set, flag_contaminated)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    from vlm_eden_dataset_etl_ray.sources.parquet import read_small

    bench_t = read_small(sf_dir, "documents", columns=["text"],
                         filter=pc.field("doc_id") < 25)
    bench = benchmark_ngram_set(bench_t.column("text"), n=8)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = flag_contaminated(docs, bench, "text", n=8)
    return out.select_columns(["doc_id", "contaminated"])


def q_stratified_sample_docs(sf_dir):
    """Per-stratum deterministic sampling (corpus balancing: downsample the
    dominant language, keep the rest). Rows-only: the hash is
    engine-internal; rates/determinism asserted in pytest."""
    from vlm_eden_dataset_etl_ray.functions.sampling import stratified_sample
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    return stratified_sample(ds, "lang", {"en": 0.25}, "doc_id", default_frac=1.0)


def q_trailing_event_counts(sf_dir):
    """Time-RANGE window frame: events per user in the trailing hour
    (RANGE BETWEEN interval PRECEDING AND CURRENT ROW, peers included) —
    the rate-limiting / burst-detection window a rows-frame can't express."""
    from vlm_eden_dataset_etl_ray.functions.windows import trailing_time_count

    ds = _events(sf_dir, columns=["event_id", "user_id", "ts"])
    return trailing_time_count(ds, "user_id", "ts", window_s=3600)


def q_regex_extract_docs(sf_dir):
    """Regex capture-group extraction (regexp_extract twin): second
    whitespace-delimited token of each document."""
    from vlm_eden_dataset_etl_ray.functions.text import regex_extract
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return regex_extract(ds, "text", r"^(\S+) (\S+)", 2, "second_word")


def q_unigram_doc_scores(sf_dir):
    """Unigram-LM perplexity proxy: per-document mean -ln p(token) under
    the corpus unigram model — the cheap quality-filter score."""
    from vlm_eden_dataset_etl_ray.functions.text import unigram_logprob_score
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return unigram_logprob_score(ds).select_columns(
        ["doc_id", "logprob_score"])


def q_dsir_selected_docs(sf_dir):
    """DSIR importance selection (Xie et al. 2023): score every document by
    its mean per-token log ratio ln p_en-target / ln p_corpus and keep the
    docs that look more English-target-like than the corpus average. Both
    LMs are vocabulary-sized broadcasts; scoring streams."""
    from vlm_eden_dataset_etl_ray.functions.text import dsir_score
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    target = read_table(sf_dir, "documents", columns=["lang", "text"],
                        filter=(pc.field("lang") == "en"))
    out = dsir_score(ds, target)
    out = out.filter(expr="dsir_score > 0")
    return out.select_columns(["doc_id", "lang", "dsir_score"])


def q_blocklist_flags(sf_dir):
    """Safety filtering: flag documents containing ANY blocklisted token
    (exact word match, broadcast list, vectorized per-batch check)."""
    from vlm_eden_dataset_etl_ray.functions.text import blocklist_flag
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = blocklist_flag(ds, ["scan", "spill"])
    return out.select_columns(["doc_id", "blocked"])


def q_chunked_documents(sf_dir):
    """Context-window chunking: every document split into 32-token windows
    overlapping by 8 — vectorized per-batch flat-map, no shuffle."""
    from vlm_eden_dataset_etl_ray.functions.text import chunk_documents
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(ds, chunk_tokens=32, overlap=8)


def q_late_events_per_user(sf_dir):
    """Late-arrival audit over the event stream (event_id = delivery
    order): per user, rows arriving behind the event-time high-watermark
    and the worst skew — the metric that sizes a windowing lateness
    policy over a CDC feed."""
    from vlm_eden_dataset_etl_ray.functions.windows import out_of_order_stats

    ds = _events(sf_dir, columns=["user_id", "event_id", "ts"])
    return out_of_order_stats(ds, "user_id", "event_id", "ts")


def q_shipping_priority(sf_dir):
    """TPC-H Q3 shape: revenue of the top 10 still-shipping orders for
    BUILDING-segment customers — semi-join (customer keys never carry
    payload), planner-bucketed fact join, mergeable revenue partials,
    global top-k."""
    import datetime

    from vlm_eden_dataset_etl_ray.functions.relational import (
        auto_join, grouped_agg, hash_semi_join)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    cutoff = datetime.datetime(2001, 6, 1)
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"],
                      filter=(pc.field("c_mktsegment") == "BUILDING"))
    cust = cust.select_columns(["c_custkey"])
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"],
                        filter=(pc.field("o_orderdate") < cutoff))
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount",
                             "l_shipdate"],
                    filter=(pc.field("l_shipdate") > cutoff))
    orders = hash_semi_join(orders, cust, "o_custkey", "c_custkey")

    def _rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "__rev": rev})

    li = li.map_batches(_rev, batch_format="pyarrow", zero_copy_batch=True)
    joined = auto_join(li, orders, "l_orderkey", "o_orderkey")
    agg = grouped_agg(joined, ["l_orderkey", "o_orderdate"],
                      sums={"__rev": "revenue"}, cardinality="high")

    def _round(t: pa.Table) -> pa.Table:
        t = t.set_column(
            t.column_names.index("revenue"), "revenue",
            pc.round(t.column("revenue"), ndigits=2))
        return t.set_column(  # file stores [s]; SQL engines read timestamps as [us]
            t.column_names.index("o_orderdate"), "o_orderdate",
            t.column("o_orderdate").cast(pa.timestamp("us")))

    agg = agg.map_batches(_round, batch_format="pyarrow",
                          zero_copy_batch=True)
    return agg.sort(["revenue", "l_orderkey"],
                    descending=[True, False]).limit(10)


def q_winsorized_order_prices(sf_dir):
    """Quantile winsorization: order prices clipped to their exact
    [p01, p99] discrete quantiles (one distributed sort, streamed clip)."""
    from vlm_eden_dataset_etl_ray.functions.windows import winsorize
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = winsorize(ds, "o_totalprice", 0.01, 0.99, tiebreak="o_orderkey",
                    alias="price_w")
    return out.select_columns(["o_orderkey", "price_w"])


def q_event_value_zscores(sf_dir):
    """Per-user z-score standardization of event values (mergeable
    sum/sumsq/count partials -> planner join-back -> streamed normalize)."""
    from vlm_eden_dataset_etl_ray.functions.relational import zscore_normalize

    ds = _events(sf_dir, columns=["event_id", "user_id", "value"])
    out = zscore_normalize(ds, "user_id", "value")
    return out.select_columns(["event_id", "user_id", "zscore"])


def q_quota_sample_docs(sf_dir):
    """Per-group document quota: at most 20 docs per language, selected by
    a SQL-reproducible deterministic hash priority — bounds any one group's
    contribution to a training mix."""
    from vlm_eden_dataset_etl_ray.functions.sampling import quota_sample
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    out = quota_sample(ds, "lang", "doc_id", cap=20, seed=7)
    return out.select_columns(["doc_id", "lang", "source"])


def q_temperature_resample_docs(sf_dir):
    """Temperature-based mixture resampling (alpha=0.5): group shares
    follow n^alpha, flattening the language distribution — the standard
    multilingual-corpus balancing move. Deterministic hash threshold, so
    oracle-exact."""
    from vlm_eden_dataset_etl_ray.functions.sampling import temperature_resample
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    return temperature_resample(ds, "lang", "doc_id", alpha=0.5, seed=3)


def q_repetition_stats_docs(sf_dir):
    """Gopher-style within-document repetition quality metrics: top-n-gram
    and duplicate-n-gram fractions for n=2,3."""
    from vlm_eden_dataset_etl_ray.functions.text import repetition_stats
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return repetition_stats(ds).select_columns(
        ["doc_id", "top2gram_frac", "dup2gram_frac",
         "top3gram_frac", "dup3gram_frac"])


def q_frequent_ngrams_docs(sf_dir):
    """Corpus-wide repeated-passage discovery: every word 5-gram occurring
    in >= 3 distinct documents, with its document frequency."""
    from vlm_eden_dataset_etl_ray.functions.contamination import frequent_ngrams
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return frequent_ngrams(ds, n=5, min_docs=3)


def q_user_value_mad(sf_dir):
    """Robust per-user dispersion QC: exact median, MAD, and the count of
    robust outliers (|v - med| > 3·1.4826·MAD) — one groupby shuffle,
    two vectorized median passes in the in-group fold."""
    from vlm_eden_dataset_etl_ray.functions.stats import grouped_mad

    ds = _events(sf_dir, columns=["user_id", "value"])
    return grouped_mad(ds, ["user_id"], "value", z=3.0)


def q_fuzzy_part_names(sf_dir):
    """Fuzzy catalog dedup: pairs of DISTINCT part names within the same
    brand at Levenshtein distance <= 2. Quadratic only in the per-block
    distinct-name vocabulary (collapsed first); the DP kernel is
    vectorized across pairs."""
    from vlm_eden_dataset_etl_ray.functions.fuzzy import fuzzy_value_pairs
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "part", columns=["p_brand", "p_name"])
    return fuzzy_value_pairs(ds, ["p_brand"], "p_name", max_dist=2,
                             left_alias="name_a", right_alias="name_b")


def q_snm_part_names(sf_dir):
    """Sorted-neighborhood blocking (merge/purge): parts sorted by name,
    candidate pairs within rank window 10, exact word-Jaccard >= 0.5
    verify. One distributed sort + range partitioning with overlap (home
    block + one ghost block per row), each pair generated in exactly one
    block — no pair-dedup exchange, candidates O(n*window) regardless of
    token skew."""
    from vlm_eden_dataset_etl_ray.functions.dedup import (
        sorted_neighborhood_pairs)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    return sorted_neighborhood_pairs(
        ds, "p_partkey", ["p_name"], window=10, text_col="p_name",
        threshold=0.5)


def q_user_first_last_events(sf_dir):
    """first_value / last_value / nth_value(2) per user over the event
    stream, ordered by (ts, event_id) — mergeable per-batch pre-reduce
    ships at most nth+1 rows per key per batch; payload never shuffles in
    full."""
    from vlm_eden_dataset_etl_ray.functions.windows import grouped_first_last

    return grouped_first_last(
        _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type",
                                 "value"]),
        "user_id", ["ts", "event_id"], ["event_type", "value"], nth=2)


def q_fuzzy_part_names_global(sf_dir):
    """Self-blocking fuzzy matching (PassJoin segment pigeonhole, VLDB'12):
    all distinct part-name pairs within Levenshtein distance 3, NO caller
    blocking keys — candidates from per-segment buckets, each pair
    verified exactly once."""
    from vlm_eden_dataset_etl_ray.functions.fuzzy import fuzzy_all_pairs
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "part", columns=["p_name"])
    return fuzzy_all_pairs(ds, "p_name", max_dist=3,
                           left_alias="name_a", right_alias="name_b")


def q_term_postings(sf_dir):
    """Inverted index over the corpus: per term with df >= 5, the document
    frequency and the first 20 sorted doc ids (capped posting list)."""
    from vlm_eden_dataset_etl_ray.functions.text import inverted_postings
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return inverted_postings(ds, min_df=5, cap=20)


def q_tar_shard_roundtrip(sf_dir):
    """Training-loader handoff: write documents as WebDataset-style tar
    shards, read them back, and return the reconstructed samples — the
    oracle proves the sink+source preserve every (key, text) pair."""
    import shutil
    import tempfile

    from vlm_eden_dataset_etl_ray.sinks.tar_shards import (
        read_tar_shards, write_tar_shards)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    out_dir = tempfile.mkdtemp(prefix="tar_shards_", dir="/tmp")
    try:
        ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
        write_tar_shards(ds, out_dir, "doc_id", {"text": "txt"},
                         rows_per_shard=128)
        back = read_tar_shards(out_dir, {"txt": "text"}, key_col="key")
        import pyarrow as _pa
        batches = list(back.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
        return _pa.concat_tables(batches).select(["key", "text"])
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def q_orc_roundtrip(sf_dir):
    """Warehouse-interchange handoff: write documents as ORC files (one
    per block), read them back with column projection pushed into the
    stripe reader, and return the reconstructed rows — the oracle proves
    sink+source preserve every row and the projection prunes correctly."""
    import shutil
    import tempfile

    from vlm_eden_dataset_etl_ray.sources.orc import (
        read_orc_table, write_orc_table)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    out_dir = tempfile.mkdtemp(prefix="orc_rt_", dir="/tmp")
    try:
        ds = read_table(sf_dir, "documents",
                        columns=["doc_id", "lang", "source", "n_chars"])
        write_orc_table(ds, out_dir)
        back = read_orc_table(out_dir, columns=["doc_id", "lang", "n_chars"])
        batches = list(back.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
        return pa.concat_tables(batches)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def q_frame_sample_meta(sf_dir):
    """Multimodal frame-sampling plumbing: payload → one row per sampled
    frame with typed metadata (stub kernel, oracle-expressible; the
    batch-expanding shape and batch sizing are the real plumbing)."""
    from vlm_eden_dataset_etl_ray.functions.multimodal import frame_sample, text_as_payload
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ds = text_as_payload(docs).map_batches(
        lambda t: t.drop_columns(["text"]), batch_format="pyarrow")
    out = frame_sample(ds, stride_bytes=64, max_frames=8)
    return out.select_columns(
        ["doc_id", "frame_idx", "frame_offset", "frame_checksum"])


def q_corpus_prep(sf_dir):
    """Flagship corpus-preparation pipeline: quality gate → language gate
    → exact dedup → MinHash cluster keep → decontamination → split, all
    streaming (rows-only: composition of oracle-checked stages; stage
    accounting + determinism asserted in pytest)."""
    from vlm_eden_dataset_etl_ray.pipelines.corpus import CorpusParams, prepare_corpus
    from vlm_eden_dataset_etl_ray.sources.parquet import read_small, read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    bench_t = read_small(sf_dir, "documents", columns=["text"],
                         filter=(pc.field("doc_id") < 10))
    out = prepare_corpus(
        docs, bench_t.column("text"),
        CorpusParams(keep_langs=("en", "de", "es", "fr", "zh")))
    return out.select_columns(["doc_id", "lang_pred", "split"])


def q_train_test_split(sf_dir):
    """Deterministic hash-based split assignment over documents (rows-only:
    the hash is engine-internal; determinism/disjointness asserted in
    pytest)."""
    from vlm_eden_dataset_etl_ray.functions.text import deterministic_split
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    return deterministic_split(ds, "doc_id", test_frac=0.1)


def q_tokens_replay_synthetic(sf_dir):
    """Synthetic tokenized changelog (FIXTURES F2) through the full engine:
    out-of-order + duplicates + tombstones + mid-stream schema change."""
    import shutil

    from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake

    p = cl.ChangelogParams(n_docs=500, n_events=5000, schema_change_at=3000, n_shards=8)
    from vlm_eden_dataset_etl_ray.pipelines.cdc import scratch_dir

    work = scratch_dir("tokens_replay_")
    files = cl.write_changelog(os.path.join(work, "chg"), p)
    lake_dir = os.path.join(work, "lake")
    apply.apply_epoch(lake_dir, files)
    return lake.snapshot(lake_dir).select(["doc_id", "lsn", "n_tok", "source"])


def q_events_building_bloom_join(sf_dir):
    """Bloom-prefiltered selective join: the BUILDING-segment customer
    keys fold into a broadcast bitset; non-matching events drop BEFORE
    the join's shuffle moves them (false positives survive the filter and
    die in the join, so results are exactly the plain join's)."""
    from vlm_eden_dataset_etl_ray.functions.relational import (
        auto_join, bloom_semi_filter)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ev = _events(sf_dir, columns=["event_id", "user_id"])
    bcust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"],
        filter=(pc.field("c_mktsegment") == "BUILDING"))
    bcust = bcust.materialize()
    lean = bloom_semi_filter(ev, bcust, "user_id", "c_custkey")
    return auto_join(lean, bcust, "user_id", "c_custkey", how="inner")


def q_kmeans_embedding_clusters(sf_dir):
    """Distributed Lloyd's k-means over the embedding table (broadcast
    centroids, streamed per-batch partial sums, O(k·d) driver state per
    pass) + nearest-centroid labeling. Deterministic (fixed seed/iters);
    rows-only check — iterative fitting has no SQL twin."""
    from vlm_eden_dataset_etl_ray.functions.knn import kmeans_assign, kmeans_fit
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    emb = emb.materialize()  # fit streams k passes; assign reads once more
    cent = kmeans_fit(emb, "embedding", n_clusters=8, iters=4)
    return kmeans_assign(emb, cent, "embedding").select_columns(
        ["vec_id", "cluster"])


def q_semdedup_embeddings(sf_dir):
    """SemDeDup (arXiv:2303.09540): k-means partition + within-cluster
    triangular cosine prune, one groupby exchange, blockwise similarity.
    Deterministic (fixed seed); rows-only — the k-means fit is iterative,
    no SQL twin."""
    from vlm_eden_dataset_etl_ray.functions.dedup import semdedup
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semdedup(emb, "vec_id", "embedding", threshold=0.9,
                    n_clusters=8, sample_frac=1.0)


def q_ivm_event_type_stats(sf_dir):
    """Incremental view maintenance: the derived events changelog replays
    in THREE out-of-order epochs; a (source → count, Σn_tok) view is
    folded forward per epoch from key-restricted old/new snapshot diffs —
    never re-aggregated from the full lake. The returned view must equal
    the oracle's aggregate over the final LWW state."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import (
        EVENTS_REPLAY_SPEC, derive_changelog, scratch_dir)
    from vlm_eden_dataset_etl_ray.views import (
        ViewSpec, apply_epoch_with_views, read_view)

    work = scratch_dir("ivm_replay_")
    files = derive_changelog(sf_dir, os.path.join(work, "chg"))
    lake_dir, vroot = os.path.join(work, "lake"), os.path.join(work, "views")
    vs = [ViewSpec(name="by_source", group_cols=["source"],
                   count_alias="n", sum_cols={"n_tok": "total_tok"})]
    for i in (1, 0, 2):  # deliberately out of order
        apply_epoch_with_views(lake_dir, files[i::3], vs, vroot,
                               spec=EVENTS_REPLAY_SPEC)
    return read_view(vroot, "by_source")


def q_tfidf_docs(sf_dir):
    """TF-IDF relevance weights per (doc, term): explode → tf → df →
    planner join → vectorized score (round(4) both sides; np.round
    bit-matches SQL round)."""
    from vlm_eden_dataset_etl_ray.functions.text import tfidf
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf(ds, "doc_id", "text")


def q_event_session_ids(sf_dir):
    """Gaps-and-islands sessionization: per-event 1-based session ordinal
    within each user (new session after >SESSION_GAP_H h of inactivity) —
    the per-row refinement of user_sessions' per-key counts."""
    from vlm_eden_dataset_etl_ray.functions.relational import session_ids

    ev = _events(sf_dir, columns=["event_id", "user_id", "ts"])
    return session_ids(ev, "user_id", "ts", SESSION_GAP_H * 3600,
                       order_cols=["ts", "event_id"])


def q_cube_order_counts(sf_dir):
    """CUBE counts over (status, priority): the power-set of grouping
    sets — one data pass for the finest level, coarser levels re-aggregate
    the already-tiny counts."""
    from vlm_eden_dataset_etl_ray.functions.relational import cube_counts
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderstatus", "o_orderpriority"])
    return cube_counts(orders, ["o_orderstatus", "o_orderpriority"], "n")


def q_value_histogram(sf_dir):
    """Fixed-width histogram (20 bins over [0, 1000)): vectorized binning
    + mergeable grouped count."""
    from vlm_eden_dataset_etl_ray.functions.relational import histogram_counts

    ev = _events(sf_dir, columns=["value"])
    return histogram_counts(ev, "value", 0.0, 1000.0, 20)


def q_orders_customer_auto_join(sf_dir):
    """auto_join planner: the customer side measures under the broadcast
    threshold at test scale, so this exercises the shuffle-free broadcast
    merge; semantics are identical to the partitioned hash join."""
    from vlm_eden_dataset_etl_ray.functions.relational import auto_join
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_name", "c_mktsegment"])
    return auto_join(orders, cust, "o_custkey", "c_custkey", how="left")


def q_user_order_full_join(sf_dir):
    """FULL OUTER join (partitioned, SQL ON semantics): per-user event
    counts against per-customer order counts — ids unique to either side
    survive with the other side null."""
    from vlm_eden_dataset_etl_ray.functions.relational import grouped_count, hash_join
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    # materialize the (tiny, key-sized) aggregate sides once: hash_join
    # resolves each side's schema, which would otherwise re-execute the
    # full upstream groupby a second time when the join itself runs.
    # cardinality stays "low" (per-batch partial + tree combine): the key
    # spaces are user/customer-sized, so the full groupby shuffle of
    # "high" costs 4× more than the partial path on the 8M-row side
    ev = grouped_count(_events(sf_dir, columns=["user_id"]), ["user_id"],
                       "n_events").materialize()
    buyers = read_table(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        lambda t: t.rename_columns(["buyer_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
    bo = grouped_count(buyers, ["buyer_id"], "n_orders").materialize()
    return hash_join(ev, bo, "user_id", "buyer_id", how="full",
                     bytes_hint=(ev.size_bytes() or 0) + (bo.size_bytes() or 0))


def q_order_price_ntile(sf_dir):
    """Global-ordering window (ntile over a distributed sort): quartile
    buckets of all orders by price, then per-tile count/min/max. Driver
    state is one summary row per block (windows._sorted_with_block_offsets);
    the tile assignment happens inside each block."""
    from vlm_eden_dataset_etl_ray.functions.windows import ntile
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    tiled = ntile(orders, 4, ["o_totalprice", "o_orderkey"], out_col="tile")

    def _partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["tile"]).aggregate(
            [("o_totalprice", "min"), ("o_totalprice", "max"), ([], "count_all")])
        return g.rename_columns(["tile", "__mn", "__mx", "__n"])

    def _combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["tile"]).aggregate(
            [("__mn", "min"), ("__mx", "max"), ("__n", "sum")])
        g = g.rename_columns(["tile", "min_price", "max_price", "n"])
        return g.set_column(g.column_names.index("n"), "n",
                            g.column("n").cast(pa.int64()))

    partial = tiled.map_batches(_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    return partial.repartition(1).map_batches(_combine, batch_format="pyarrow",
                                              batch_size=None)


def q_exact_price_quantiles(sf_dir):
    """Exact percentile_disc via distributed sort + block-offset row
    numbers — the exact twin of approx_value_quantiles' centroid sketch.
    Only len(qs) rows reach the driver."""
    from vlm_eden_dataset_etl_ray.functions.windows import exact_quantiles
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return exact_quantiles(orders, "o_totalprice", [0.25, 0.5, 0.75, 0.99],
                           tiebreak="o_orderkey")


def q_cont_price_quantiles(sf_dir):
    """Exact percentile_cont (interpolated) — same one-sort machinery as
    the discrete variant; only the bracketing order statistics reach the
    driver. Values rounded to 4 on both sides (different-but-equal
    interpolation formulas)."""
    from vlm_eden_dataset_etl_ray.functions.windows import (
        interpolated_quantiles)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    t = interpolated_quantiles(orders, "o_totalprice",
                               [0.1, 0.25, 0.5, 0.75, 0.9], tiebreak="o_orderkey")
    return _round_col(t, "value", 4)


def q_nation_region_grid(sf_dir):
    """CROSS JOIN scaffold: every (nation, region) combination with a
    match flag — the broadcast side ships once, each left batch expands
    vectorized."""
    import pyarrow.compute as _pc

    from vlm_eden_dataset_etl_ray.functions.relational import (
        broadcast_cross_join)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    nations = read_table(sf_dir, "nation",
                         columns=["n_name", "n_regionkey"])
    regions = _collect(read_table(
        sf_dir, "region", columns=["r_regionkey", "r_name"]))

    def flag(t):
        return t.append_column(
            "is_home", _pc.equal(t.column("n_regionkey"),
                                 t.column("r_regionkey")))

    return broadcast_cross_join(nations, regions).map_batches(
        flag, batch_format="pyarrow").select_columns(
        ["n_name", "r_name", "is_home"])


def q_order_price_buckets(sf_dir):
    """Equi-depth quantile bucketing (4 buckets over order price): exact
    cut points from the one-column sort machinery, broadcast once, each
    batch labeled by searchsorted — the payload never shuffles (the scale
    alternative to a full-sort ntile)."""
    from vlm_eden_dataset_etl_ray.functions.windows import quantile_bucket
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])
    return quantile_bucket(orders, "o_totalprice", 4,
                           tiebreak="o_orderkey").select_columns(
        ["o_orderkey", "bucket"])


def q_cheapest_item_per_order(sf_dir):
    """Correlated-subquery rewrite (TPC-H Q2 shape, the reference's
    'latest row per entity then enrich' pattern): argmin lineitem per
    order via the skew-proof two-stage top-1, then the join planner
    attaches the order's date and priority."""
    from vlm_eden_dataset_etl_ray.functions.relational import (auto_join,
                                                               top1_per_key)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_partkey",
                             "l_extendedprice"])
    cheapest = top1_per_key(li, "l_orderkey",
                            [("l_extendedprice", "ascending"),
                             ("l_linenumber", "ascending")])
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate",
                                 "o_orderpriority"])
    return auto_join(cheapest, orders, left_on="l_orderkey",
                     right_on="o_orderkey").drop_columns(["o_orderkey"])


def q_customer_order_overlap(sf_dir):
    """Corpus-overlap estimation without a join: HLL register algebra
    over the customer key sets of `customer` and `orders` — |A|, |B|,
    union (register max), intersection (inclusion-exclusion), Jaccard.
    Approximate by design (rows-only; accuracy pytest vs exact)."""
    from vlm_eden_dataset_etl_ray.functions.sketches import approx_overlap
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey"])
    return approx_overlap(cust, orders, "c_custkey", "o_custkey")


def q_budget_sample_docs(sf_dir):
    """Token-budget subsampling: keep documents in SQL-replicable
    hash-priority order until cumulative n_chars reaches the budget —
    slim rows sort, one O(blocks) prefix-sum pass, payload semi-joins
    once."""
    from vlm_eden_dataset_etl_ray.functions.sampling import budget_sample
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "n_chars", "lang"])
    return budget_sample(docs, "doc_id", "n_chars", budget=120_000, seed=7)


def q_scd2_order_status_history(sf_dir):
    """SCD Type-2 interval compression: per customer, runs of equal order
    status (in order-date order) collapse into [valid_from, valid_to)
    validity rows — the CDC-warehouse history-table shape."""
    from vlm_eden_dataset_etl_ray.functions.windows import scd2_compress
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderkey", "o_orderdate",
                                 "o_orderstatus"])
    return scd2_compress(orders, "o_custkey", ["o_orderdate", "o_orderkey"],
                         "o_orderstatus")


def q_rolling_min_order_price(sf_dir):
    """Frame-bounded window (rows between 2 preceding and current row):
    per customer, the rolling minimum of the last 3 order prices. min is
    float-order-insensitive, so the doubles match the oracle bit-exactly."""
    from vlm_eden_dataset_etl_ray.functions.windows import rolling_min
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderkey", "o_orderdate",
                                 "o_totalprice"])
    out = rolling_min(orders, "o_custkey", ["o_orderdate", "o_orderkey"],
                      "o_totalprice", window=3, alias="rmin")
    return out.select_columns(["o_custkey", "o_orderkey", "o_totalprice", "rmin"])


def q_lineitem_moment_stats(sf_dir):
    """Grouped second moments in one pass: per return flag, the sample
    stddev/variance of quantity and the sample covariance/correlation of
    (quantity, extendedprice) — mergeable raw-moment partials (six doubles
    per batch-group) combined once; rounded to stay inside double error vs
    the SQL engine's streaming formulas."""
    from vlm_eden_dataset_etl_ray.functions.stats import grouped_moments
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    out = grouped_moments(li, ["l_returnflag"], "l_quantity",
                          y="l_extendedprice")
    out = out.map_batches(
        lambda t: t.drop_columns(["mean_x"]), batch_format="pyarrow")
    for c, nd in [("var_x", 4), ("std_x", 4), ("covar_xy", 4), ("corr_xy", 6)]:
        out = out.map_batches(_round_col, fn_kwargs={"col": c, "ndigits": nd},
                              batch_format="pyarrow")
    return out


def q_mode_event_type_per_user(sf_dir):
    """Grouped mode with a deterministic tie-break: each user's most
    frequent event type (ties → lexicographically smallest), as two
    composed shuffles over collapsed counts."""
    from vlm_eden_dataset_etl_ray.functions.stats import mode_per_key

    ds = _events(sf_dir, columns=["user_id", "event_type"])
    return mode_per_key(ds, "user_id", "event_type",
                        alias="mode_type", count_alias="mode_n",
                        cardinality="high")


def q_daily_event_type_entropy(sf_dir):
    """Shannon entropy (bits) of the event-type mix per day — the data
    collapses to distinct (day, type) counts before anything shuffles."""
    from vlm_eden_dataset_etl_ray.functions.stats import grouped_entropy

    ds = _events(sf_dir, columns=["ts", "event_type"])

    def _day(t: pa.Table) -> pa.Table:
        return pa.table({
            "d": t.column("ts").cast(pa.date32()),
            "event_type": t.column("event_type"),
        })

    days = ds.map_batches(_day, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_entropy(days, ["d"], "event_type", alias="entropy_bits")
    return out.map_batches(_round_col,
                           fn_kwargs={"col": "entropy_bits", "ndigits": 4},
                           batch_format="pyarrow")


def q_priority_revenue_share(sf_dir):
    """Ratio-to-report window (x / sum(x) over ()): each order priority's
    share of total order value. The share fold runs on the post-aggregate
    reporting rows, not the data."""
    from vlm_eden_dataset_etl_ray.functions.relational import grouped_agg
    from vlm_eden_dataset_etl_ray.functions.stats import with_share_of_total
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderpriority", "o_totalprice"])
    rev = grouped_agg(orders, ["o_orderpriority"],
                      sums={"o_totalprice": "revenue"})
    out = with_share_of_total(rev, "revenue", alias="share_frac")
    out = out.map_batches(_round_col, fn_kwargs={"col": "revenue", "ndigits": 2},
                          batch_format="pyarrow")
    return out.map_batches(_round_col,
                           fn_kwargs={"col": "share_frac", "ndigits": 6},
                           batch_format="pyarrow")


def q_user_value_moving_avg(sf_dir):
    """RANGE-frame moving aggregate: per user, the mean event value over a
    trailing 24-hour window (peers of the current timestamp included, per
    SQL RANGE semantics). Prefix sums + binary search inside each group —
    no per-row loop."""
    from vlm_eden_dataset_etl_ray.functions.stats import moving_avg_range

    ds = _events(sf_dir, columns=["event_id", "user_id", "ts", "value"])

    def _cents(t: pa.Table) -> pa.Table:
        v = np.round(t.column("value").to_numpy(zero_copy_only=False) * 100)
        return t.drop_columns(["value"]).append_column(
            "cents", pa.array(v.astype(np.int64), pa.int64()))

    cents = ds.map_batches(_cents, batch_format="pyarrow", zero_copy_batch=True)
    out = moving_avg_range(cents, "user_id", "ts", "cents",
                           window=24 * 3600 * 1_000_000, alias=None,
                           sum_alias="msum_cents", count_alias="mcnt")
    return out.select_columns(["event_id", "user_id", "msum_cents", "mcnt"])


def q_orders_profile(sf_dir):
    """ANALYZE-style table profile: per column, null count, exact distinct
    count, and min/max (string-rendered). Null/min/max fold via scalar
    partials; each exact distinct is one single-column shuffle."""
    from vlm_eden_dataset_etl_ray.functions.stats import profile_columns
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                                 "o_orderpriority", "o_orderdate"])
    return profile_columns(orders, ["o_orderkey", "o_custkey",
                                    "o_orderstatus", "o_orderpriority",
                                    "o_orderdate"])


def q_customers_only_recent_orders(sf_dir):
    """Whole-row EXCEPT DISTINCT: customer keys that ordered, minus those
    that ordered before 1997 — rows collapse to per-batch distincts before
    the one groupby decides membership."""
    import datetime

    from vlm_eden_dataset_etl_ray.functions.relational import distinct_set_op
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    all_c = read_table(sf_dir, "orders", columns=["o_custkey"])
    early = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") < datetime.datetime(1997, 1, 1)),
    ).select_columns(["o_custkey"])
    return distinct_set_op(all_c, early, "except")


def q_order_price_quantiles_by_priority(sf_dir):
    """Grouped interpolated quantiles (percentile_cont): p25/p50/p75 of
    order value per priority — one co-locating shuffle, vectorized
    in-group quantile fold."""
    from vlm_eden_dataset_etl_ray.functions.stats import grouped_quantiles
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderpriority", "o_totalprice"])
    out = grouped_quantiles(orders, ["o_orderpriority"], "o_totalprice",
                            [0.25, 0.5, 0.75], aliases=["q25", "q50", "q75"])
    for c in ["q25", "q50", "q75"]:
        out = out.map_batches(_round_col, fn_kwargs={"col": c, "ndigits": 4},
                              batch_format="pyarrow")
    return out


def q_props_key_stats(sf_dir):
    """Semi-structured extraction: pull the integer ``k`` out of the JSON
    props string (compiled JSONPath kernel, no per-row json.loads), then
    aggregate it per event type — exact int64 both sides."""
    from vlm_eden_dataset_etl_ray.functions.relational import grouped_agg
    from vlm_eden_dataset_etl_ray.functions.text import json_extract

    ds = _events(sf_dir, columns=["event_type", "props"])
    ext = json_extract(ds, "props", "$.k", "k", out_type=pa.int64())
    return grouped_agg(ext, ["event_type"], sums={"k": "sum_k"},
                       counts="n_events")


def q_user_first_events_path(sf_dir):
    """Ordered string aggregation with a shuffle-bounding partial top-k:
    each user's first 8 event types in time order, joined with '>'."""
    from vlm_eden_dataset_etl_ray.functions.relational import string_agg_ordered

    ds = _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type"])
    return string_agg_ordered(
        ds, "user_id", "event_type",
        order_by=[("ts", "ascending"), ("event_id", "ascending")],
        alias="path", sep=">", limit=8)


def q_priority_status_grid(sf_dir):
    """Dense reporting grid: cross join of the distinct priority and status
    dimensions (broadcast cartesian), left-joined with the grouped counts
    and zero-filled — combos that never occur still appear."""
    import ray.data as rd

    from vlm_eden_dataset_etl_ray.functions.relational import (
        broadcast_cross_join, broadcast_left_join, distinct_values,
        grouped_count)
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderpriority", "o_orderstatus"])
    prios = sorted(distinct_values(orders, "o_orderpriority").to_pylist())
    stats_ = sorted(distinct_values(orders, "o_orderstatus").to_pylist())
    grid = broadcast_cross_join(
        rd.from_arrow(pa.table({"o_orderpriority": prios})),
        pa.table({"o_orderstatus": stats_}))

    counts = _collect(grouped_count(orders,
                                    ["o_orderpriority", "o_orderstatus"],
                                    alias="n"))
    ckey = pc.binary_join_element_wise(
        counts.column("o_orderpriority").cast(pa.string()),
        counts.column("o_orderstatus").cast(pa.string()), "|")
    counts = counts.append_column("__k", ckey)

    def _with_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("o_orderpriority").cast(pa.string()),
            t.column("o_orderstatus").cast(pa.string()), "|")
        return t.append_column("__k", k)

    keyed = grid.map_batches(_with_key, batch_format="pyarrow",
                             zero_copy_batch=True)
    joined = broadcast_left_join(keyed, counts, "__k", "__k",
                                 take_columns=["n"])

    def _fill(t: pa.Table) -> pa.Table:
        n = pc.coalesce(t.column("n"), pa.scalar(0, pa.int64()))
        return pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "o_orderstatus": t.column("o_orderstatus"),
            "n": n.cast(pa.int64()),
        })

    return joined.map_batches(_fill, batch_format="pyarrow",
                              zero_copy_batch=True)


def q_partial_update_profiles(sf_dir):
    """Column-level partial-update merge engine (lakehouse partial-update
    semantics the reference's row-LWW ON CONFLICT upsert cannot express):
    each change event carries only the columns it writes; per column the
    last non-null writer by LSN wins; deletes reset the row. Applied in
    two lsn-parity epochs so columns of one key arrive out of order
    ACROSS epochs — the per-column seq state must keep late old events
    from clobbering newer columns."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_partial_profiles

    return replay_partial_profiles(sf_dir)


def q_aggregate_merge_totals(sf_dir):
    """Per-key aggregation merge engine: the lake row for each key is a
    running aggregate (sum/count/min/max/first/last by LSN) over its
    change stream, folded as mergeable partials at every reduce site and
    across two epochs."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_aggregate_totals

    ds = replay_aggregate_totals(sf_dir)
    return ds.map_batches(
        lambda t: _round_col(t, "purchase_total", 6),
        batch_format="pyarrow", zero_copy_batch=True)


def q_aggregate_merge_stats(sf_dir):
    """Composite accumulators in the aggregation merge engine: per-key
    running mean and sample variance held as mergeable (sum, count,
    sum-of-squares) twins across two epochs, derived at read time."""
    import hashlib
    import os as _os
    import shutil as _shutil

    import pyarrow.compute as _pc

    from vlm_eden_dataset_etl_ray import apply as apply_mod
    from vlm_eden_dataset_etl_ray import lake as lake_mod
    from vlm_eden_dataset_etl_ray.pipelines.cdc import scratch_dir
    from vlm_eden_dataset_etl_ray.sources.parquet import read_table
    from vlm_eden_dataset_etl_ray.spec import TableSpec

    spec = TableSpec(
        name="stats", key="doc_id", order="lsn", envelope=(),
        num_partitions=16, merge_engine="aggregate", on_delete="ignore",
        aggregations=(("v_mean", "mean"), ("v_var", "var_samp")))
    workdir = scratch_dir("agg_stats_")
    lake_dir = _os.path.join(workdir, "lake")
    _shutil.rmtree(lake_dir, ignore_errors=True)

    def _derive(t):
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "lsn": t.column("event_id").cast(pa.int64()),
            "op": _pc.if_else(
                _pc.equal(t.column("event_type"), pa.scalar("error")),
                pa.scalar("delete"), pa.scalar("upsert")),
            "doc_id": pa.array(np.char.add("u", uid.astype("U20"))),
            "v_mean": t.column("value"),
            "v_var": t.column("value"),
        })

    base = read_table(
        sf_dir, "events",
        columns=["event_id", "user_id", "event_type", "value"]
    ).map_batches(_derive, batch_format="pyarrow", zero_copy_batch=True)
    for part in (0, 1):
        ds = base.map_batches(
            lambda t, p=part: t.filter(_pc.equal(
                _pc.bit_wise_and(t.column("lsn"), pa.scalar(1, pa.int64())),
                pa.scalar(p, pa.int64()))),
            batch_format="pyarrow", zero_copy_batch=True)
        eid = hashlib.sha256(
            f"agg_stats:{_os.path.abspath(sf_dir)}:{part}".encode()
        ).hexdigest()[:16]
        apply_mod.apply_epoch_dataset(lake_dir, ds, epoch_id=eid, spec=spec)
    out = lake_mod.scan(lake_dir, spec=spec,
                        columns=["doc_id", "v_mean", "v_var"])
    return out.map_batches(
        lambda t: _round_col(_round_col(t, "v_mean", 6), "v_var", 6),
        batch_format="pyarrow", zero_copy_batch=True)


def q_debezium_envelope_replay(sf_dir):
    """Debezium-envelope ingest: events → Debezium v2 JSONL envelopes
    (before/after images, op c/u/d, source.lsn) → vectorized envelope
    flattening (sources/debezium.py) → LWW CDC apply → merge-on-read
    scan of the converged state."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import replay_debezium

    return replay_debezium(sf_dir)


# ---------------------------------------------------------------------------
# Declarative SQL front-end (vlm_eden_dataset_etl_ray/sql.py): the engine
# parses and executes the SAME SQL string DuckDB runs as the oracle — the
# strongest parity check the harness allows (identical text, two engines).
# Each exercises a different compiler path: pushdown scans, broadcast joins,
# partial aggregation, count(DISTINCT), derived tables, UNION ALL, CASE /
# LIKE / IN expression kernels, HAVING, ORDER BY expressions.
# ---------------------------------------------------------------------------

SQL_FRONTEND_QUERIES = {
    "sqlfe_pricing_rollup": (
        "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base, "
        "round(avg(l_discount), 6) AS avg_disc, count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "sqlfe_nation_balances": (
        "SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name ORDER BY n_cust DESC, n_name LIMIT 5"),
    "sqlfe_part_buckets": (
        "SELECT p_partkey, CASE WHEN p_size < 10 THEN 'small' "
        "WHEN p_size < 30 THEN 'mid' ELSE 'big' END AS bucket "
        "FROM part WHERE p_name LIKE '%a%' "
        "AND p_brand IN ('Brand#11', 'Brand#12', 'Brand#13')"),
    "sqlfe_doc_source_card": (
        "SELECT lang, count(DISTINCT source) AS n_src, count(*) AS n "
        "FROM documents GROUP BY lang ORDER BY lang"),
    "sqlfe_order_tiers": (
        "SELECT bucket, count(*) AS n, round(avg(o_totalprice), 6) AS avg_price "
        "FROM (SELECT o_orderkey, o_totalprice, "
        "CASE WHEN o_totalprice > 5000 THEN 'hi' ELSE 'lo' END AS bucket "
        "FROM orders) x GROUP BY bucket ORDER BY bucket"),
    "sqlfe_top_balances_union": (
        "SELECT c_name AS name, c_acctbal AS bal FROM customer "
        "WHERE c_acctbal > 9000 UNION ALL "
        "SELECT s_name AS name, s_acctbal AS bal FROM supplier "
        "WHERE s_acctbal > 5500 ORDER BY bal DESC, name"),
    "sqlfe_busy_users": (
        "SELECT user_id, count(*) AS n, round(sum(value), 6) AS total_value "
        "FROM events WHERE event_type != 'error' GROUP BY user_id "
        "HAVING count(*) > 5 ORDER BY n DESC, user_id LIMIT 20"),
    "sqlfe_regional_suppliers": (
        "SELECT r_name, n_name, count(*) AS n_supp, "
        "round(max(s_acctbal), 2) AS top_bal FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name, n_name ORDER BY r_name, n_name"),
    "sqlfe_yearly_priorities": (
        "SELECT year(o_orderdate) AS y, o_orderpriority, count(*) AS n, "
        "max(o_totalprice) AS mx FROM orders "
        "GROUP BY year(o_orderdate), o_orderpriority ORDER BY y, o_orderpriority"),
    "sqlfe_orders_semi_subquery": (
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 9000) "
        "ORDER BY o_orderkey"),
    "sqlfe_above_avg_orders": (
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "sqlfe_rank_per_customer": (
        "SELECT o_orderkey, row_number() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) AS rn, "
        "rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS r, "
        "dense_rank() OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderstatus) AS dr "
        "FROM orders ORDER BY o_orderkey"),
    "sqlfe_global_quartiles": (
        "SELECT c_custkey, ntile(4) OVER (ORDER BY c_acctbal, c_custkey) "
        "AS quartile, row_number() OVER (ORDER BY c_acctbal DESC, "
        "c_custkey) AS rn FROM customer ORDER BY c_custkey"),
    "sqlfe_value_distribution": (
        "SELECT event_id, round(cume_dist() OVER (ORDER BY value), 6) AS cd, "
        "round(percent_rank() OVER (ORDER BY value), 6) AS pr "
        "FROM events WHERE event_type = 'purchase' ORDER BY event_id"),
    "sqlfe_running_customer_spend": (
        "SELECT o_orderkey, round(sum(o_totalprice) OVER (PARTITION BY "
        "o_custkey ORDER BY o_orderdate, o_orderkey), 6) AS run_spend, "
        "lag(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey) AS prev_price "
        "FROM orders ORDER BY o_orderkey"),
    "sqlfe_order_price_trajectory": (
        "SELECT o_orderkey, min(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey) AS lo, "
        "max(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey) AS hi, "
        "count(*) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey) AS nth, "
        "round(avg(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey), 4) AS run_avg, "
        "lead(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey) AS nxt, "
        "first_value(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey) AS fst "
        "FROM orders ORDER BY o_orderkey"),
    "sqlfe_top3_orders_per_customer": (
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "QUALIFY row_number() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) <= 3 ORDER BY o_orderkey"),
    "sqlfe_event_exprs": (
        "SELECT event_id, upper(event_type) AS et, "
        "coalesce(nullif(event_type, 'click'), 'CLICKED') AS nn, "
        "year(ts) AS y, cast(value AS BIGINT) AS vi, event_id % 7 AS m7, "
        "substr(event_type, 2, 3) AS s3, event_type || '!' AS bang, "
        "abs(value - 50) AS dist FROM events "
        "WHERE value BETWEEN 10 AND 90 AND NOT event_type = 'view' "
        "ORDER BY event_id LIMIT 200"),
}


def _sqlfe(qtext: str) -> Callable[[str], Any]:
    def _run(sf_dir: str):
        from vlm_eden_dataset_etl_ray.sql import sql_table

        return sql_table(qtext, sf_dir)

    return _run


def queries() -> dict[str, Callable[[str], Any]]:
    out = {name: _sqlfe(q) for name, q in SQL_FRONTEND_QUERIES.items()}
    out.update(_BASE_QUERIES())
    return out


def _BASE_QUERIES() -> dict[str, Callable[[str], Any]]:
    return {
        "cdc_replay_events": q_cdc_replay_events,
        "cdc_wap_audit": q_cdc_wap_audit,
        "cdc_dead_letter": q_cdc_dead_letter,
        "cdc_point_lookup": q_cdc_point_lookup,
        "partial_update_profiles": q_partial_update_profiles,
        "aggregate_merge_totals": q_aggregate_merge_totals,
        "aggregate_merge_stats": q_aggregate_merge_stats,
        "debezium_envelope_replay": q_debezium_envelope_replay,
        "cdc_drop_readd_evolution": q_cdc_drop_readd_evolution,
        "cdc_change_feed_events": q_cdc_change_feed_events,
        "cdc_change_feed_before": q_cdc_change_feed_before,
        "cdc_rename_evolution": q_cdc_rename_evolution,
        "dml_delete_update": q_dml_delete_update,
        "cdc_merge_into": q_cdc_merge_into,
        "join_view_orders": q_join_view_orders,
        "cdc_rehash_replay": q_cdc_rehash_replay,
        "expectation_report_events": q_expectation_report_events,
        "cdc_clone_restore": q_cdc_clone_restore,
        "event_value_tier_counts": q_event_value_tier_counts,
        "zone_map_window_scan": q_zone_map_window_scan,
        "lineitem_moment_stats": q_lineitem_moment_stats,
        "mode_event_type_per_user": q_mode_event_type_per_user,
        "daily_event_type_entropy": q_daily_event_type_entropy,
        "priority_revenue_share": q_priority_revenue_share,
        "user_value_moving_avg": q_user_value_moving_avg,
        "orders_profile": q_orders_profile,
        "customers_only_recent_orders": q_customers_only_recent_orders,
        "order_price_quantiles_by_priority": q_order_price_quantiles_by_priority,
        "props_key_stats": q_props_key_stats,
        "user_first_events_path": q_user_first_events_path,
        "priority_status_grid": q_priority_status_grid,
        "lineitem_measures_unpivot": q_lineitem_measures_unpivot,
        "order_date_dense_rank": q_order_date_dense_rank,
        "order_priority_rank": q_order_priority_rank,
        "lineitem_urgent_semijoin": q_lineitem_urgent_semijoin,
        "customers_no_orders_antijoin": q_customers_no_orders_antijoin,
        "pricing_summary": q_pricing_summary,
        "latest_event_per_user": q_latest_event_per_user,
        "watermark_filter_events": q_watermark_filter_events,
        "watermark_max": q_watermark_max,
        "latest_event_with_customer": q_latest_event_with_customer,
        "event_types_per_user": q_event_types_per_user,
        "append_event_types": q_append_event_types,
        "customers_without_recent_orders": q_customers_without_recent_orders,
        "orders_building_segment": q_orders_building_segment,
        "brand_revenue": q_brand_revenue,
        "daily_event_counts": q_daily_event_counts,
        "daily_event_counts_with_deleted": q_daily_event_counts_with_deleted,
        "user_daily_gapfill": q_user_daily_gapfill,
        "monthly_order_priority_counts": q_monthly_order_priority_counts,
        "tz_local_daily_counts": q_tz_local_daily_counts,
        "normalized_documents": q_normalized_documents,
        "cleaned_documents": q_cleaned_documents,
        "tenant_slug_schemas": q_tenant_slug_schemas,
        "calendar_dim": q_calendar_dim,
        "dedup_exact_documents": q_dedup_exact_documents,
        "span_dedup_documents": q_span_dedup_documents,
        "debounced_events": q_debounced_events,
        "forecast_revenue": q_forecast_revenue,
        "k_anonymous_events": q_k_anonymous_events,
        "weighted_sample_docs": q_weighted_sample_docs,
        "funnel_conversion": q_funnel_conversion,
        "cohort_retention": q_cohort_retention,
        "incremental_dedup_documents": q_incremental_dedup_documents,
        "image_phash_dupes": q_image_phash_dupes,
        "image_phash_dupes_real": q_image_phash_dupes_real,
        "incremental_minhash_dedup": q_incremental_minhash_dedup,
        "ngram_jaccard_dupes": q_ngram_jaccard_dupes,
        "prefix_jaccard_dupes": q_prefix_jaccard_dupes,
        "knn_cosine_topk": q_knn_cosine_topk,
        "embedding_near_dup_pairs": q_embedding_near_dup_pairs,
        "embedding_centroids": q_embedding_centroids,
        "token_stats_docs": q_token_stats_docs,
        "quality_scores_docs": q_quality_scores_docs,
        "multimodal_decode_meta": q_multimodal_decode_meta,
        "user_sessions": q_user_sessions,
        "orders_with_customer_join": q_orders_with_customer_join,
        "top3_events_per_user": q_top3_events_per_user,
        "tumbling_event_counts": q_tumbling_event_counts,
        "term_frequencies": q_term_frequencies,
        "user_value_stats": q_user_value_stats,
        "median_value_per_user": q_median_value_per_user,
        "approx_distinct_users": q_approx_distinct_users,
        "distinct_lang_source": q_distinct_lang_source,
        "top10_orders": q_top10_orders,
        "etl_star_fact": q_etl_star_fact,
        "asof_latest_order": q_asof_latest_order,
        "asof_latest_order_bucketed": q_asof_latest_order_bucketed,
        "hopping_event_counts": q_hopping_event_counts,
        "order_window_event_counts": q_order_window_event_counts,
        "running_total_per_customer": q_running_total_per_customer,
        "monthly_priority_pivot": q_monthly_priority_pivot,
        "event_gaps": q_event_gaps,
        "rolling_median_value": q_rolling_median_value,
        "event_type_transitions": q_event_type_transitions,
        "rollup_event_counts": q_rollup_event_counts,
        "user_order_full_join": q_user_order_full_join,
        "events_building_bloom_join": q_events_building_bloom_join,
        "kmeans_embedding_clusters": q_kmeans_embedding_clusters,
        "semdedup_embeddings": q_semdedup_embeddings,
        "ivm_event_type_stats": q_ivm_event_type_stats,
        "tfidf_docs": q_tfidf_docs,
        "event_session_ids": q_event_session_ids,
        "cube_order_counts": q_cube_order_counts,
        "value_histogram": q_value_histogram,
        "orders_customer_auto_join": q_orders_customer_auto_join,
        "order_price_ntile": q_order_price_ntile,
        "exact_price_quantiles": q_exact_price_quantiles,
        "cont_price_quantiles": q_cont_price_quantiles,
        "nation_region_grid": q_nation_region_grid,
        "order_price_buckets": q_order_price_buckets,
        "cheapest_item_per_order": q_cheapest_item_per_order,
        "customer_order_overlap": q_customer_order_overlap,
        "budget_sample_docs": q_budget_sample_docs,
        "scd2_order_status_history": q_scd2_order_status_history,
        "rolling_min_order_price": q_rolling_min_order_price,
        "active_buyers_intersect": q_active_buyers_intersect,
        "events_with_customer_skewjoin": q_events_with_customer_skewjoin,
        "minhash_near_dupes": q_minhash_near_dupes,
        "minhash_dedup_docs": q_minhash_dedup_docs,
        "simhash_near_dupes": q_simhash_near_dupes,
        "lang_id_docs": q_lang_id_docs,
        "knn_ivf_topk": q_knn_ivf_topk,
        "tokens_replay_synthetic": q_tokens_replay_synthetic,
        "train_test_split": q_train_test_split,
        "stratified_sample_docs": q_stratified_sample_docs,
        "quota_sample_docs": q_quota_sample_docs,
        "event_value_zscores": q_event_value_zscores,
        "user_value_mad": q_user_value_mad,
        "dsir_selected_docs": q_dsir_selected_docs,
        "late_events_per_user": q_late_events_per_user,
        "chunked_documents": q_chunked_documents,
        "blocklist_flags": q_blocklist_flags,
        "daily_unique_users": q_daily_unique_users,
        "daily_approx_unique_users": q_daily_approx_unique_users,
        "user_value_ema": q_user_value_ema,
        "user_value_trend": q_user_value_trend,
        "bpe_merge_table": q_bpe_merge_table,
        "bpe_token_counts_docs": q_bpe_token_counts_docs,
        "daily_event_growth": q_daily_event_growth,
        "shipping_priority": q_shipping_priority,
        "fuzzy_part_names": q_fuzzy_part_names,
        "snm_part_names": q_snm_part_names,
        "fuzzy_part_names_global": q_fuzzy_part_names_global,
        "user_first_last_events": q_user_first_last_events,
        "term_postings": q_term_postings,
        "orc_roundtrip": q_orc_roundtrip,
        "unigram_doc_scores": q_unigram_doc_scores,
        "winsorized_order_prices": q_winsorized_order_prices,
        "trailing_event_counts": q_trailing_event_counts,
        "regex_extract_docs": q_regex_extract_docs,
        "embedding_near_dup_bucketed": q_embedding_near_dup_bucketed,
        "temperature_resample_docs": q_temperature_resample_docs,
        "repetition_stats_docs": q_repetition_stats_docs,
        "frequent_ngrams_docs": q_frequent_ngrams_docs,
        "tar_shard_roundtrip": q_tar_shard_roundtrip,
        "contamination_flags": q_contamination_flags,
        "frame_sample_meta": q_frame_sample_meta,
        "corpus_prep": q_corpus_prep,
        "heavy_hitter_event_types": q_heavy_hitter_event_types,
        "redacted_documents": q_redacted_documents,
        "bpe_token_counts": q_bpe_token_counts,
        "approx_value_quantiles": q_approx_value_quantiles,
        "knn_lsh_topk": q_knn_lsh_topk,
        "knn_sq_topk": q_knn_sq_topk,
        "knn_pq_topk": q_knn_pq_topk,
        "pack_token_blocks": q_pack_token_blocks,
    }


def oracle_sql() -> dict[str, str]:
    out = dict(SQL_FRONTEND_QUERIES)  # oracle = the very string the engine runs
    out.update(_BASE_ORACLES())
    return out


def _BASE_ORACLES() -> dict[str, str]:
    return {
        # partial-update merge engine: per column, last NON-NULL writer by
        # lsn wins among events after the key's last delete; a row is live
        # iff any upsert follows the last delete
        "partial_update_profiles": """
            with ev as (
                select event_id as lsn,
                       'u' || cast(user_id as varchar) as doc_id,
                       case when event_type = 'error' then 'delete'
                            else 'upsert' end as op,
                       case when event_type = 'purchase' then value end as val,
                       case when event_type = 'click'
                            then cast(floor(value*10) as bigint) end as vtier,
                       case when event_type in ('view','login')
                            then event_type end as src
                from events),
            d as (select doc_id, max(lsn) as dl from ev
                  where op = 'delete' group by doc_id)
            select e.doc_id,
                   arg_max(val, lsn) filter (where val is not null
                       and lsn > coalesce(dl, -1)) as val,
                   arg_max(vtier, lsn) filter (where vtier is not null
                       and lsn > coalesce(dl, -1)) as vtier,
                   arg_max(src, lsn) filter (where src is not null
                       and lsn > coalesce(dl, -1)) as src
            from ev e left join d using (doc_id)
            where e.op <> 'delete'
            group by e.doc_id
            having max(e.lsn) > coalesce(max(dl), -1)
        """,
        # aggregation merge engine (deletes ignored per on_delete='ignore'
        # → the oracle excludes 'error' events)
        "aggregate_merge_totals": """
            select 'u' || cast(user_id as varchar) as doc_id,
                   round(sum(case when event_type = 'purchase'
                                  then value end), 6) as purchase_total,
                   count(value) as n_events,
                   max(value) as max_value,
                   min(value) as min_value,
                   arg_max(event_type, event_id) as last_type,
                   arg_min(event_type, event_id) as first_type
            from events where event_type <> 'error'
            group by doc_id
        """,
        "aggregate_merge_stats": """
            select 'u' || cast(user_id as varchar) as doc_id,
                   round(avg(value), 6) as v_mean,
                   round(var_samp(value), 6) as v_var
            from events where event_type <> 'error'
            group by doc_id
        """,
        # Debezium envelope replay reduces to plain LWW over the same
        # derivation (op d = delete, c/u = upsert, lsn = source.lsn)
        "debezium_envelope_replay": """
            with ev as (
                select event_id as lsn,
                       'u' || cast(user_id as varchar) as doc_id,
                       cast(floor(value*100) as bigint) as n_tok,
                       event_type as src,
                       case when event_type = 'error' then 'delete'
                            else 'upsert' end as op
                from events),
            latest as (
                select * from ev
                qualify row_number() over (partition by doc_id
                                           order by lsn desc) = 1)
            select doc_id, lsn, n_tok, src from latest where op <> 'delete'
        """,
        "cdc_replay_events": f"""
            with chg as (
                select event_id as lsn,
                       case when event_type = 'error' then 'delete' else 'upsert' end as op,
                       'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) as n_tok,
                       event_type as source
                from events),
            latest as (
                select * from chg
                qualify row_number() over (partition by doc_id order by lsn desc) = 1)
            select doc_id, lsn, n_tok, source from latest where op <> 'delete'
        """,
        # write-audit-publish: epoch 2 (event_id > mid) fails its audit and
        # never publishes, so the lake equals the first half's LWW replay
        "cdc_wap_audit": """
            with mx as (select max(event_id) as m from events),
            chg as (
                select event_id as lsn,
                       case when event_type = 'error' then 'delete' else 'upsert' end as op,
                       'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) as n_tok,
                       event_type as source
                from events where event_id <= (select m // 2 from mx)),
            latest as (
                select * from chg
                qualify row_number() over (partition by doc_id order by lsn desc) = 1)
            select doc_id, lsn, n_tok, source from latest where op <> 'delete'
        """,
        # point lookup: the replay LWW state restricted to ten asked ids
        "cdc_point_lookup": """
            with chg as (
                select event_id as lsn,
                       case when event_type = 'error' then 'delete' else 'upsert' end as op,
                       'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) as n_tok,
                       event_type as source
                from events),
            latest as (
                select * from chg
                qualify row_number() over (partition by doc_id order by lsn desc) = 1)
            select doc_id, lsn, n_tok, source from latest
            where op <> 'delete'
              and doc_id in ('doc1','doc2','doc3','doc4','doc5',
                             'doc6','doc7','doc8','doc9','doc10')
        """,
        # dead-letter routing: rows whose key was corrupted (event_id % 97
        # == 0) divert to the DLQ; the lake equals the clean rows' replay
        "cdc_dead_letter": """
            with chg as (
                select event_id as lsn,
                       case when event_type = 'error' then 'delete' else 'upsert' end as op,
                       'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) as n_tok,
                       event_type as source
                from events where event_id % 97 <> 0),
            latest as (
                select * from chg
                qualify row_number() over (partition by doc_id order by lsn desc) = 1)
            select doc_id, lsn, n_tok, source from latest where op <> 'delete'
        """,
        # drop+re-add evolution: `source` was dropped at t1 and re-added as a
        # FRESH generation at t2 = mx - least(400, mx//10); only winners in
        # the re-added generation (lsn >= t2) carry a value — every earlier
        # winner reads NULL (DROP COLUMN erased the old generation's values).
        "cdc_drop_readd_evolution": """
            with mx as (select max(event_id) as m from events),
            chg as (
                select event_id as lsn,
                       case when event_type = 'error' then 'delete' else 'upsert' end as op,
                       'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) as n_tok,
                       event_type as source
                from events),
            latest as (
                select * from chg
                qualify row_number() over (partition by doc_id order by lsn desc) = 1)
            select doc_id, lsn, n_tok,
                   case when lsn >= (select m - least(400, m // 10) from mx)
                        then source else null end as source
            from latest where op <> 'delete'
        """,
        "cdc_change_feed_events": """
            with mx as (select max(event_id) as m from events),
            chg as (
                select event_id as lsn,
                       case when event_type = 'error' then 'delete' else 'upsert' end as op,
                       'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) as n_tok,
                       event_type as source
                from events where event_id > (select m // 3 from mx)),
            latest as (
                select * from chg
                qualify row_number() over (partition by doc_id order by lsn desc) = 1)
            select doc_id, lsn, n_tok, source, op as "_change_type"
            from latest
        """,
        "cdc_clone_restore": """
            with mx as (select max(event_id) as m from events),
            chg as (
                select event_id as lsn,
                       case when event_type = 'error' then 'delete'
                            else 'upsert' end as op,
                       'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) as n_tok,
                       event_type as source
                from events),
            branch as (
                select doc_id, lsn, n_tok, source, 'branch' as view
                from (select * from chg
                      qualify row_number() over (partition by doc_id
                                                 order by lsn desc) = 1)
                where op <> 'delete'),
            restored as (
                select doc_id, lsn, n_tok, source, 'restored' as view
                from (select * from chg
                      where lsn <= (select m // 2 from mx)
                      qualify row_number() over (partition by doc_id
                                                 order by lsn desc) = 1)
                where op <> 'delete')
            select * from branch union all select * from restored
        """,
        "dml_delete_update": """
            with chg as (
                select event_id as lsn,
                       case when event_type = 'error' then 'delete'
                            else 'upsert' end as op,
                       'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) as n_tok,
                       event_type as source
                from events),
            latest as (
                select * from chg
                qualify row_number() over (partition by doc_id
                                           order by lsn desc) = 1),
            live as (
                select doc_id, n_tok, source from latest where op <> 'delete')
            select doc_id,
                   case when source = 'purchase' then n_tok + 1000
                        else n_tok end as n_tok,
                   source
            from live
            where not coalesce(n_tok < 2000, false)
        """,
        "join_view_orders": """
            select o.o_orderkey, o.o_custkey, o.o_totalprice,
                   c.c_mktsegment
            from orders o join customer c on o.o_custkey = c.c_custkey
            where c.c_custkey % 97 <> 0
        """,
        "cdc_rehash_replay": """
            with chg as (
                select event_id as lsn,
                       case when event_type = 'error' then 'delete'
                            else 'upsert' end as op,
                       'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) as n_tok,
                       event_type as source,
                       user_id
                from events),
            latest as (
                select * from chg
                qualify row_number() over (partition by doc_id
                                           order by lsn desc) = 1),
            live as (
                select doc_id, n_tok, source, user_id from latest
                where op <> 'delete'),
            src as (
                select 'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) + 9999 as n_tok,
                       'rebuy' as source
                from events
                where user_id % 4 = 0
                qualify row_number() over (partition by user_id
                                           order by event_id desc) = 1)
            select doc_id, n_tok, source from live where user_id % 4 <> 0
            union all
            select doc_id, n_tok, source from src
        """,
        "cdc_merge_into": """
            with chg as (
                select event_id as lsn,
                       case when event_type = 'error' then 'delete'
                            else 'upsert' end as op,
                       'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) as n_tok,
                       event_type as source
                from events),
            latest as (
                select * from chg
                qualify row_number() over (partition by doc_id
                                           order by lsn desc) = 1),
            live as (
                select doc_id, n_tok, source from latest
                where op <> 'delete'),
            src as (
                select 'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) + 5000 as n_tok,
                       'merged' as source
                from events
                where user_id % 3 = 0
                qualify row_number() over (partition by user_id
                                           order by event_id desc) = 1)
            select l.doc_id,
                   case when s.doc_id is not null
                        then s.n_tok else l.n_tok end as n_tok,
                   case when s.doc_id is not null
                        then s.source else l.source end as source
            from live l left join src s on l.doc_id = s.doc_id
            where not coalesce(s.n_tok > 25000, false)
        """,
        "expectation_report_events": r"""
            with n as (select count(*) as c from events)
            select 'not_null(user_id)' as rule,
                   count(*) filter (where user_id is null) as violations,
                   (select c from n) as checked from events
            union all
            select 'in_range(value,0.0,300.0)',
                   count(*) filter (where not coalesce(
                       value between 0.0 and 300.0, true)),
                   (select c from n) from events
            union all
            select 'accepted_values(event_type)',
                   count(*) filter (where not coalesce(event_type in
                       ('click','purchase','signup','view'), true)),
                   (select c from n) from events
            union all
            select 'matches_regex(props)',
                   count(*) filter (where not coalesce(
                       regexp_matches(props, '^\{'), true)),
                   (select c from n) from events
            union all
            select 'unique(event_id)',
                   (select c from n) - count(distinct event_id),
                   (select c from n) from events
            union all
            select 'unique(user_id,ts)',
                   c - (select count(*) from
                       (select distinct user_id, ts from events)),
                   c from n
        """,
        "cdc_rename_evolution": """
            with chg as (
                select event_id as lsn,
                       case when event_type = 'error' then 'delete'
                            else 'upsert' end as op,
                       'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) as n_tok,
                       event_type as origin
                from events),
            latest as (
                select * from chg
                qualify row_number() over (partition by doc_id
                                           order by lsn desc) = 1)
            select doc_id, lsn, n_tok, origin
            from latest where op <> 'delete'
        """,
        "cdc_change_feed_before": """
            with mx as (select max(event_id) as m from events),
            chg as (
                select event_id as lsn,
                       case when event_type = 'error' then 'delete'
                            else 'upsert' end as op,
                       'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) as n_tok,
                       event_type as source
                from events),
            latest as (
                select * from chg where lsn > (select m // 3 from mx)
                qualify row_number() over (partition by doc_id
                                           order by lsn desc) = 1),
            before_live as (
                select * from (
                    select * from chg where lsn <= (select m // 3 from mx)
                    qualify row_number() over (partition by doc_id
                                               order by lsn desc) = 1)
                where op <> 'delete')
            select l.doc_id, l.lsn, l.n_tok, l.source,
                   case when l.op = 'delete' then 'delete'
                        when b.doc_id is not null then 'update'
                        else 'insert' end as "_change_type",
                   b.lsn as before_lsn, b.n_tok as before_n_tok,
                   b.source as before_source
            from latest l left join before_live b using (doc_id)
        """,
        "event_value_tier_counts": """
            select t.tier,
                   cast(sum(cast(floor(e.value * 100) as bigint)) as bigint) as cents,
                   count(*) as n_events
            from events e
            join (values ('t1', 0.0, 15.0), ('t2', 15.0, 35.0), ('t3', 35.0, 70.0),
                         ('t4', 70.0, 150.0), ('t5', 150.0, 1000.0)) as t(tier, lo, hi)
              on e.value >= t.lo and e.value < t.hi
            group by t.tier
        """,
        "zone_map_window_scan": """
            with mx as (select max(event_id) as m from events)
            select 'doc' || cast(user_id as varchar) as doc_id,
                   event_id as lsn,
                   cast(floor(value * 100) as bigint) as n_tok,
                   event_type as source
            from events
            where event_id between (select m // 3 + 1 from mx)
                               and (select 2 * m // 3 from mx)
        """,
        "lineitem_measures_unpivot": """
            select variable, min(value) as vmin, max(value) as vmax,
                   count(*) as n
            from (
                select l_orderkey, l_linenumber, 'l_quantity' as variable,
                       l_quantity as value from lineitem
                union all
                select l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
                from lineitem
                union all
                select l_orderkey, l_linenumber, 'l_discount', l_discount
                from lineitem)
            group by variable
        """,
        "order_date_dense_rank": """
            select o_orderkey, o_orderdate,
                   cast(dense_rank() over (order by o_orderdate) as bigint) as drank
            from orders
        """,
        "order_priority_rank": """
            select o_orderkey, o_orderpriority,
                   cast(rank() over (order by o_orderpriority) as bigint) as r,
                   cume_dist() over (order by o_orderpriority) as cd,
                   percent_rank() over (order by o_orderpriority) as pr
            from orders
        """,
        "lineitem_urgent_semijoin": """
            select l_returnflag, count(*) as n
            from lineitem l
            where exists (select 1 from orders o
                          where o.o_orderkey = l.l_orderkey
                            and o.o_orderpriority = '1-URGENT')
            group by l_returnflag
        """,
        "customers_no_orders_antijoin": """
            select c_mktsegment, count(*) as n
            from customer c
            where not exists (select 1 from orders o
                              where o.o_custkey = c.c_custkey
                                and o.o_orderpriority = '1-URGENT')
            group by c_mktsegment
        """,
        "pricing_summary": """
            select l_returnflag, l_linestatus,
                   sum(l_quantity) as sum_qty,
                   round(sum(l_extendedprice), 2) as sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) as sum_disc_price,
                   count(*) as count_order,
                   round(sum(l_quantity) / count(*), 4) as avg_qty,
                   round(round(sum(l_extendedprice), 2) / count(*), 4) as avg_price
            from lineitem group by l_returnflag, l_linestatus
        """,
        "latest_event_per_user": """
            select user_id, event_id, ts, event_type, value from events
            qualify row_number() over (partition by user_id order by ts desc, event_id desc) = 1
        """,
        "watermark_filter_events": f"""
            select event_id, ts, user_id, event_type, value from events
            where ts > TIMESTAMP '{WM_TS}'
        """,
        "watermark_max": "select max(ts) as last_sync from events",
        "latest_event_with_customer": """
            with latest as (
                select user_id, event_id, ts from events
                qualify row_number() over (partition by user_id order by ts desc, event_id desc) = 1)
            select l.user_id, l.event_id, l.ts, c.c_name
            from latest l left join customer c on l.user_id = c.c_custkey
        """,
        "event_types_per_user": """
            select user_id,
                   array_to_string(list_sort(list(distinct event_type)), ',') as event_types
            from events group by user_id
        """,
        "append_event_types": """
            select doc_id,
                   array_to_string(list_sort(list(distinct source)), ',') as event_types,
                   count(*) as n_rows
            from (select 'doc' || cast(user_id as varchar) as doc_id,
                         event_type as source
                  from events)
            group by doc_id
        """,
        "customers_without_recent_orders": """
            select c_custkey, c_name, c_acctbal from customer
            where c_custkey not in (
                select o_custkey from orders where o_orderdate >= TIMESTAMP '2001-06-01 00:00:00')
        """,
        "orders_building_segment": """
            select o_orderkey, o_custkey, o_totalprice, o_orderdate from orders
            where o_custkey in (select c_custkey from customer where c_mktsegment = 'BUILDING')
        """,
        "brand_revenue": """
            select p_brand,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) as revenue,
                   count(*) as n_items
            from lineitem join part on l_partkey = p_partkey
            group by p_brand
        """,
        "daily_event_counts": """
            select cast(ts as date) as event_date, event_type, count(*) as n_events
            from events where event_type <> 'error' group by 1, 2
        """,
        "daily_event_counts_with_deleted": """
            select cast(ts as date) as event_date, event_type, count(*) as n_events
            from events group by 1, 2
        """,
        "user_daily_gapfill": """
            with c as (
                select user_id, cast(ts as date) as day, count(*) as n_events
                from events group by 1, 2
            ), span as (
                select user_id, min(day) as mn, max(day) as mx from c group by 1
            ), spine as (
                select user_id,
                       cast(unnest(generate_series(mn, mx, interval 1 day)) as date) as day
                from span
            )
            select s.user_id, s.day, coalesce(c.n_events, 0) as n_events
            from spine s left join c using (user_id, day)
        """,
        "monthly_order_priority_counts": """
            select date_trunc('month', o_orderdate) as order_month, o_orderpriority,
                   count(*) as n_orders
            from orders group by 1, 2
        """,
        "tz_local_daily_counts": """
            with tzmap as (
                select n_nationkey,
                       (['America/New_York','Europe/Paris','Asia/Tokyo',
                         'Australia/Sydney','America/Los_Angeles','Asia/Kolkata',
                         'UTC'])[(n_nationkey % 7) + 1] as tz
                from nation)
            select tz,
                   cast(timezone(tz, timezone('UTC', ts)) as date) as event_date,
                   count(*) as n_events
            from events join tzmap on n_nationkey = user_id % 25
            group by tz, event_date
        """,
        "normalized_documents": """
            select doc_id,
                   array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') as norm_text
            from documents
        """,
        "cleaned_documents": """
            select doc_id,
                   coalesce(nullif(trim(lang), ''), 'und') as lang_clean,
                   upper(source) as source_norm
            from documents
        """,
        "tenant_slug_schemas": """
            select c_custkey,
                   regexp_replace(c_name, '[^A-Za-z0-9]+', '', 'g') as schema_name
            from customer
        """,
        "calendar_dim": """
            select cast(d as date) as date_actual,
                   cast(epoch(cast(d as date)) as bigint) as epoch,
                   cast(isodow(d) as bigint) as day_of_week,
                   cast(dayofmonth(d) as bigint) as day_of_month,
                   cast(dayofyear(d) as bigint) as day_of_year,
                   cast(week(d) as bigint) as week_of_year,
                   cast(month(d) as bigint) as month_actual,
                   cast(quarter(d) as bigint) as quarter_actual,
                   cast(year(d) as bigint) as year_actual,
                   cast(date_trunc('month', d) as date) as first_day_of_month,
                   last_day(d) as last_day_of_month,
                   isodow(d) >= 6 as weekend_indr
            from (select unnest(generate_series(DATE '1999-01-01',
                                               DATE '1999-01-01' + INTERVAL 29219 DAY,
                                               INTERVAL 1 DAY)) as d)
        """,
        "dedup_exact_documents": """
            with all_docs as (
                select doc_id, text, lang, source, n_chars from documents
                union all
                select doc_id + 100000 as doc_id, text, lang, source, n_chars from documents)
            select doc_id, text, lang, source, n_chars from all_docs
            qualify row_number() over (partition by text order by doc_id) = 1
        """,
        "span_dedup_documents": """
            with w as (select doc_id, string_split(text, ' ') as wl
                       from documents),
            s as (select doc_id, wl,
                         unnest(range(0, greatest(len(wl), 1), 3)) as start
                  from w),
            sp as (select doc_id, cast(start // 3 as bigint) as span_no,
                          array_to_string(wl[start + 1 : start + 3], ' ')
                              as span_text
                   from s),
            keep as (select doc_id, span_no, span_text from (
                select *, row_number() over (partition by span_text
                                             order by doc_id, span_no) as rn
                from sp) where rn = 1)
            select doc_id, string_agg(span_text, ' ' order by span_no) as text
            from keep group by doc_id
        """,
        "debounced_events": """
            with w as (
                select event_id, ts, user_id, event_type, value,
                       lag(ts) over (partition by user_id, event_type
                                     order by ts, event_id) as prev
                from events)
            select event_id, ts, user_id, event_type, value
            from w where prev is null or epoch(ts - prev) > 86400
        """,
        "incremental_dedup_documents": """
            select doc_id, text from documents
            qualify row_number() over (partition by text
                                       order by doc_id) = 1
        """,
        "k_anonymous_events": """
            select event_id, ts, user_id, event_type, value from (
                select *, count(*) over (partition by user_id,
                                         event_type) as n
                from events) where n >= 13
        """,
        "forecast_revenue": """
            select round(cast(sum(cast(round(l_extendedprice * 100) as bigint)
                                 * cast(round(l_discount * 100) as bigint))
                              as double) / 10000.0, 2) as revenue
            from lineitem
            where l_shipdate >= date '1999-06-01'
              and l_shipdate < date '2000-06-01'
              and l_discount between 0.05 and 0.07
              and l_quantity < 24
        """,
        "weighted_sample_docs": """
            with w as (
                select doc_id, n_chars,
                       floor(ln((((doc_id + 7) * 2654435761)
                                  % 4294967296 + 0.5) / 4294967296.0)
                             / n_chars * 1e12) / 1e12 as k
                from documents)
            select doc_id, n_chars from w
            order by k desc, doc_id limit 60
        """,
        "funnel_conversion": """
            with ev as (select user_id, event_type, ts from events
                        where ts < timestamp '2024-01-04'),
            s1 as (select user_id, min(ts) as t1 from ev
                   where event_type = 'signup' group by user_id),
            s2 as (select e.user_id, min(e.ts) as t2 from ev e
                   join s1 using (user_id)
                   where e.event_type = 'view' and e.ts > s1.t1
                   group by e.user_id),
            s3 as (select e.user_id, min(e.ts) as t3 from ev e
                   join s2 using (user_id)
                   where e.event_type = 'purchase' and e.ts > s2.t2
                   group by e.user_id)
            select cast(1 as bigint) as step, 'signup' as step_name,
                   count(*) as n_users from s1
            union all select 2, 'view', count(*) from s2
            union all select 3, 'purchase', count(*) from s3
        """,
        "cohort_retention": """
            with ud as (select distinct user_id, cast(ts as date) as d
                        from events),
            c as (select user_id, min(d) as cohort from ud
                  group by user_id),
            o as (select distinct ud.user_id, c.cohort,
                         date_diff('day', c.cohort, ud.d) // 7
                             as period_offset
                  from ud join c using (user_id))
            select cohort as cohort_day, period_offset,
                   count(*) as n_users
            from o group by 1, 2
        """,
        "ngram_jaccard_dupes": f"""
            with t as (select doc_id, list_distinct(string_split(text, ' ')) w from documents)
            select * from (
                select a.doc_id as doc_a, b.doc_id as doc_b,
                       cast(len(list_intersect(a.w, b.w)) as double)
                           / len(list_distinct(list_concat(a.w, b.w))) as jaccard
                from t a join t b on a.doc_id < b.doc_id)
            where jaccard >= {JACCARD_T}
        """,
        "prefix_jaccard_dupes": f"""
            with t as (select doc_id, list_distinct(string_split(text, ' ')) w from documents)
            select * from (
                select a.doc_id as doc_a, b.doc_id as doc_b,
                       cast(len(list_intersect(a.w, b.w)) as double)
                           / len(list_distinct(list_concat(a.w, b.w))) as jaccard
                from t a join t b on a.doc_id < b.doc_id)
            where jaccard >= {JACCARD_T}
        """,
        "knn_cosine_topk": """
            with q as (select vec_id as qid, cast(embedding as double[]) as qv
                       from embeddings where vec_id < 8),
            s as (select q.qid as query_id, e.vec_id as neighbor_id,
                         list_cosine_similarity(q.qv, cast(e.embedding as double[])) as c
                  from q cross join embeddings e where e.vec_id <> q.qid)
            select query_id, neighbor_id, round(c, 4) as cosine from s
            qualify row_number() over (partition by query_id order by c desc, neighbor_id) <= 5
        """,
        "embedding_near_dup_pairs": f"""
            with s as (select a.vec_id as vec_a, b.vec_id as vec_b,
                              list_cosine_similarity(cast(a.embedding as double[]),
                                                     cast(b.embedding as double[])) as c
                       from embeddings a join embeddings b on a.vec_id < b.vec_id)
            select vec_a, vec_b, round(c, 4) as cosine from s where c >= {COSINE_T}
        """,
        "embedding_centroids": """
            with flat as (
                select label,
                       unnest(range(len(embedding))) as pos,
                       unnest(cast(embedding as double[])) as e
                from embeddings),
            agg as (select label, pos, avg(e) as m from flat group by label, pos),
            cent as (select label, list(round(m, 6) order by pos) as centroid
                     from agg group by label),
            cnt as (select label, count(*) as n_vectors from embeddings group by label)
            select cent.label, cent.centroid, cnt.n_vectors
            from cent join cnt on cent.label = cnt.label
        """,
        "token_stats_docs": """
            select doc_id,
                   cast(len(string_split(text, ' ')) as bigint) as n_words,
                   cast(len(list_distinct(string_split(text, ' '))) as bigint) as n_distinct
            from documents
        """,
        "quality_scores_docs": f"""
            select doc_id,
                   cast(len(replace(text, ' ', '')) as double)
                       / len(string_split(text, ' ')) as avg_word_len,
                   cast(len(list_filter(string_split(text, ' '),
                                        x -> x in {STOPWORDS!r})) as double)
                       / len(string_split(text, ' ')) as stopword_ratio
            from documents
        """,
        "multimodal_decode_meta": """
            with t as (select doc_id, octet_length(encode(text)) as n from documents)
            select doc_id,
                   cast(n as bigint) as payload_bytes,
                   cast(n % 640 as int) as fake_width,
                   cast(n % 480 as int) as fake_height,
                   cast((n * 2654435761) % 2147483647 as bigint) as checksum
            from t
        """,
        "orders_with_customer_join": """
            select o_orderkey, o_custkey, o_totalprice, c_custkey, c_name, c_mktsegment
            from orders join customer on o_custkey = c_custkey
        """,
        "top3_events_per_user": """
            select user_id, event_id, value from events
            qualify row_number() over (partition by user_id
                                       order by value desc, event_id desc) <= 3
        """,
        "tumbling_event_counts": """
            select cast(floor(epoch(ts) / 21600) * 21600 as bigint) as window_start,
                   event_type, count(*) as n_events
            from events group by 1, 2
        """,
        "term_frequencies": """
            select term, count(*) as n
            from (select unnest(string_split(text, ' ')) as term from documents)
            group by term
        """,
        "user_value_stats": """
            select user_id, min(value) as min_value, max(value) as max_value,
                   count(*) as n_events,
                   cast(count(distinct event_type) as bigint) as n_event_types
            from events group by user_id
        """,
        "median_value_per_user": """
            select user_id, median(value) as median_value from events group by user_id
        """,
        "user_sessions": f"""
            with e as (select user_id, ts,
                              lag(ts) over (partition by user_id order by ts, event_id) as prev
                       from events)
            select user_id,
                   cast(count(case when prev is not null
                                   and ts - prev > interval {SESSION_GAP_H} hour
                              then 1 end) + 1 as bigint) as n_sessions
            from e group by user_id
        """,
        "distinct_lang_source": "select distinct lang, source from documents",
        "asof_latest_order": """
            with o as (
                select o_custkey, o_orderdate, max(o_orderkey) as o_orderkey
                from orders group by o_custkey, o_orderdate)
            select e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
            from events e asof left join o
              on e.user_id = o.o_custkey and e.ts >= o.o_orderdate
        """,
        "asof_latest_order_bucketed": """
            with o as (
                select o_custkey, o_orderdate, max(o_orderkey) as o_orderkey
                from orders group by o_custkey, o_orderdate)
            select e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
            from events e asof left join o
              on e.user_id = o.o_custkey and e.ts >= o.o_orderdate
        """,
        "hopping_event_counts": """
            select make_timestamp(cast((floor(epoch(ts) / 10800) - i) * 10800
                                       as bigint) * 1000000) as window_start,
                   event_type, count(*) as n_events
            from events cross join unnest([0, 1]) as t(i)
            group by 1, 2
        """,
        "events_with_customer_skewjoin": """
            select e.event_id, e.user_id, c.c_custkey, c.c_mktsegment
            from events e join customer c on e.user_id = c.c_custkey
        """,
        "order_window_event_counts": """
            select a.o_orderkey, count(*) as n_follow
            from orders a join orders b
              on b.o_custkey = a.o_custkey
             and b.o_orderdate >= a.o_orderdate
             and b.o_orderdate < a.o_orderdate + interval 90 day
             and b.o_orderkey <> a.o_orderkey
            group by 1
        """,
        "bpe_token_counts": """
            select doc_id,
                   len(regexp_extract_all(text,
                       ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+'))::bigint
                       as n_bpe_tokens
            from documents
        """,
        "heavy_hitter_event_types": """
            select event_type, count(*) as approx_count
            from events group by 1
            order by approx_count desc, event_type limit 5
        """,
        "redacted_documents": """
            select doc_id,
                   regexp_replace(regexp_replace(regexp_replace(
                       'contact user' || cast(doc_id as varchar)
                           || '@example.com call 555-123-4567 ' || text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                       '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'),
                       '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g') as clean
            from documents
        """,
        "trailing_event_counts": """
            select event_id, user_id, ts,
                   count(*) over (partition by user_id order by ts
                       range between interval 3600 seconds preceding
                       and current row) as n_trailing
            from events
        """,
        "regex_extract_docs": """
            select doc_id, text,
                   nullif(regexp_extract(text, '^(\S+) (\S+)', 2), '')
                       as second_word
            from documents
        """,
        "unigram_doc_scores": """
            with tok as (select doc_id, unnest(string_split(text, ' ')) as term
                         from documents),
            tf as (select term, count(*) as c from tok group by 1),
            n as (select cast(count(*) as double) as n from tok)
            select t.doc_id,
                   round(-avg(ln(cast(tf.c as double) / n.n)), 4)
                       as logprob_score
            from tok t join tf using(term) cross join n
            group by t.doc_id
        """,
        "user_value_trend": """
            with r as (
                select user_id, value,
                       row_number() over (partition by user_id
                                          order by ts, event_id) as x
                from events)
            select user_id, count(*) as n,
                   round(regr_slope(value, x), 6) as slope,
                   round(regr_intercept(value, x), 6) as intercept
            from r group by user_id
        """,
        "blocklist_flags": """
            select doc_id,
                   exists (select 1
                           from unnest(string_split(text, ' ')) as u(t)
                           where u.t in ('scan', 'spill')) as blocked
            from documents
        """,
        "daily_unique_users": """
            select cast(ts as date) as event_date,
                   count(distinct user_id) as n_users
            from events group by 1
        """,
        "daily_event_growth": """
            with d as (select cast(ts as date) as event_date,
                              count(*) as n
                       from events group by 1)
            select event_date, n,
                   round((cast(n as double) - lag(n) over (order by event_date))
                         / lag(n) over (order by event_date), 4) as growth
            from d
        """,
        "chunked_documents": """
            with w as (
                select doc_id, string_split(text, ' ') as wl
                from documents
            ), s as (
                select doc_id, wl,
                       unnest(range(0, greatest(len(wl) - 8, 1), 24))
                           as start
                from w
            )
            select doc_id, cast(start // 24 as bigint) as chunk_id,
                   array_to_string(wl[start + 1 : start + 32], ' ')
                       as chunk_text
            from s
        """,
        "late_events_per_user": """
            with w as (
                select user_id, ts,
                       max(ts) over (partition by user_id order by event_id
                                     rows between unbounded preceding
                                     and 1 preceding) as prev_max
                from events)
            select user_id, count(*) as n,
                   count(*) filter (ts < prev_max) as n_late,
                   round(coalesce(
                       max(epoch(prev_max - ts)) filter (ts < prev_max),
                       0.0), 3) as max_skew_s
            from w group by user_id
        """,
        "shipping_priority": """
            select l_orderkey, o_orderdate,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       as revenue
            from lineitem
            join orders on l_orderkey = o_orderkey
            where o_custkey in (select c_custkey from customer
                                where c_mktsegment = 'BUILDING')
              and o_orderdate < timestamp '2001-06-01'
              and l_shipdate > timestamp '2001-06-01'
            group by l_orderkey, o_orderdate
            order by revenue desc, l_orderkey
            limit 10
        """,
        "dsir_selected_docs": """
            with tok as (select doc_id,
                                unnest(string_split(text, ' ')) as term
                         from documents),
            tgt_tok as (select t.term from tok t
                        join documents d using (doc_id)
                        where d.lang = 'en'),
            ctf as (select term, count(*) as c from tok group by 1),
            cn as (select cast(count(*) as double) as n from tok),
            ttf as (select term, count(*) as c from tgt_tok group by 1),
            tn as (select cast(count(*) as double) as n from tgt_tok),
            ratio as (
                select ctf.term,
                       -ln(cast(ctf.c as double) / cn.n)
                       - coalesce(-ln(cast(ttf.c as double) / tn.n), 15.0)
                           as ratio
                from ctf cross join cn
                left join ttf on ctf.term = ttf.term
                cross join tn
            )
            select t.doc_id, any_value(d.lang) as lang,
                   round(avg(r.ratio), 4) as dsir_score
            from tok t join ratio r using (term)
            join documents d using (doc_id)
            group by t.doc_id
            having round(avg(r.ratio), 4) > 0
        """,
        "winsorized_order_prices": """
            with q as (select quantile_disc(o_totalprice, 0.01) as lo,
                              quantile_disc(o_totalprice, 0.99) as hi
                       from orders)
            select o_orderkey,
                   least(greatest(o_totalprice, lo), hi) as price_w
            from orders, q
        """,
        "event_value_zscores": """
            select event_id, user_id,
                   round((value - avg(value) over (partition by user_id))
                         / nullif(stddev_pop(value) over (partition by user_id),
                                  0), 4) as zscore
            from events
        """,
        "user_value_mad": """
            with m as (
                select user_id, median(value) as med
                from events group by user_id
            ), d as (
                select e.user_id, m.med, abs(e.value - m.med) as dev
                from events e join m using (user_id)
            ), s as (
                select user_id, any_value(med) as med, median(dev) as mad
                from d group by user_id
            )
            select s.user_id, round(s.med, 4) as med, round(s.mad, 4) as mad,
                   count(*) filter (d.dev > 3 * 1.4826 * s.mad) as n_outliers
            from d join s using (user_id)
            group by s.user_id, s.med, s.mad
        """,
        "user_first_last_events": """
            with ordered as (
                select user_id, event_type, value,
                       row_number() over (partition by user_id
                                          order by ts, event_id) as rn,
                       count(*) over (partition by user_id) as cnt
                from events)
            select user_id,
                   max(case when rn = 1 then event_type end) as first_event_type,
                   max(case when rn = cnt then event_type end) as last_event_type,
                   max(case when rn = 2 then event_type end) as nth_event_type,
                   max(case when rn = 1 then value end) as first_value,
                   max(case when rn = cnt then value end) as last_value,
                   max(case when rn = 2 then value end) as nth_value
            from ordered group by user_id
        """,
        "fuzzy_part_names_global": """
            with d as (select distinct p_name from part)
            select a.p_name as name_a, b.p_name as name_b,
                   levenshtein(a.p_name, b.p_name) as dist
            from d a join d b on a.p_name < b.p_name
            where levenshtein(a.p_name, b.p_name) <= 3
        """,
        "fuzzy_part_names": """
            with d as (select distinct p_brand, p_name from part)
            select a.p_brand, a.p_name as name_a, b.p_name as name_b,
                   levenshtein(a.p_name, b.p_name) as dist
            from d a join d b
              on a.p_brand = b.p_brand and a.p_name < b.p_name
            where abs(length(a.p_name) - length(b.p_name)) <= 2
              and levenshtein(a.p_name, b.p_name) <= 2
        """,
        "snm_part_names": """
            with r as (
                select p_partkey, p_name,
                       row_number() over (order by p_name, p_partkey) as rn
                from part),
            t as (select p_partkey, rn,
                         list_distinct(string_split(p_name, ' ')) as w
                  from r)
            select * from (
                select a.p_partkey as doc_a, b.p_partkey as doc_b,
                       cast(len(list_intersect(a.w, b.w)) as double)
                           / len(list_distinct(list_concat(a.w, b.w)))
                           as jaccard
                from t a join t b
                  on b.rn > a.rn and b.rn - a.rn <= 10)
            where jaccard >= 0.5
        """,
        "orc_roundtrip": """
            select doc_id, lang, n_chars from documents
        """,
        "term_postings": """
            with td as (
                select distinct doc_id,
                       unnest(string_split(text, ' ')) as term
                from documents
            )
            select term, count(*) as df,
                   array_to_string(
                       (array_agg(doc_id order by doc_id))[1:20], ',') as postings
            from td group by term having count(*) >= 5
        """,
        "quota_sample_docs": """
            select doc_id, lang, source from (
                select *, ((doc_id + 7) * 2654435761) % 4294967296 as prio
                from documents)
            qualify row_number() over (partition by lang
                                       order by prio, doc_id) <= 20
        """,
        "temperature_resample_docs": """
            with c as (select lang, count(*) as n from documents group by 1),
            m as (select max(pow(n, -0.5)) as mx from c),
            rate as (select lang, floor(pow(n, -0.5)/mx*1e9)/1e9 as rr
                     from c, m)
            select d.doc_id, d.lang from documents d join rate using(lang)
            where ((d.doc_id+3)*2654435761)%4294967296 < floor(rr*4294967296)
        """,
        "repetition_stats_docs": """
            with words as (select doc_id, string_split(text,' ') as w
                           from documents),
            g2 as (select doc_id, array_to_string(w[i:i+1],' ') as g
                   from words cross join unnest(generate_series(1,
                        greatest(len(w)-1,0))) as t(i)),
            c2 as (select doc_id, g, count(*) cnt from g2 group by 1,2),
            p2 as (select doc_id,
                          max(cnt)/cast(sum(cnt) as double) as top2gram_frac,
                          sum(cnt-1)/cast(sum(cnt) as double) as dup2gram_frac
                   from c2 group by 1),
            g3 as (select doc_id, array_to_string(w[i:i+2],' ') as g
                   from words cross join unnest(generate_series(1,
                        greatest(len(w)-2,0))) as t(i)),
            c3 as (select doc_id, g, count(*) cnt from g3 group by 1,2),
            p3 as (select doc_id,
                          max(cnt)/cast(sum(cnt) as double) as top3gram_frac,
                          sum(cnt-1)/cast(sum(cnt) as double) as dup3gram_frac
                   from c3 group by 1)
            select d.doc_id,
                   coalesce(p2.top2gram_frac, 0.0) as top2gram_frac,
                   coalesce(p2.dup2gram_frac, 0.0) as dup2gram_frac,
                   coalesce(p3.top3gram_frac, 0.0) as top3gram_frac,
                   coalesce(p3.dup3gram_frac, 0.0) as dup3gram_frac
            from documents d left join p2 using(doc_id)
                             left join p3 using(doc_id)
        """,
        "frequent_ngrams_docs": """
            with words as (select doc_id, string_split(text,' ') as w
                           from documents),
            grams as (select doc_id, array_to_string(w[i:i+4],' ') as g
                      from words cross join unnest(generate_series(1,
                           greatest(len(w)-4,0))) as t(i)),
            dg as (select distinct doc_id, g from grams)
            select g as gram, count(*) as n_docs from dg
            group by 1 having count(*) >= 3
        """,
        "tar_shard_roundtrip": """
            select cast(doc_id as varchar) as key, text from documents
        """,
        "contamination_flags": """
            with words as (select doc_id, string_split(text, ' ') as w
                           from documents),
            grams as (
                select doc_id, array_to_string(w[i:i+7], ' ') as g
                from words cross join
                     unnest(generate_series(1, greatest(len(w) - 7, 0))) as t(i)
            ),
            bench as (select distinct g from grams where doc_id < 25),
            hits as (select distinct gr.doc_id from grams gr join bench using (g))
            select d.doc_id, (h.doc_id is not null) as contaminated
            from documents d left join hits h using (doc_id)
        """,
        "frame_sample_meta": """
            select doc_id, cast(i as int) as frame_idx,
                   i * 64 as frame_offset,
                   (strlen(text) * 2654435761 + i * 97) % 2147483647
                       as frame_checksum
            from documents cross join unnest(generate_series(0,
                 least(7, cast(floor((strlen(text) - 1) / 64.0)
                               as bigint)))) as t(i)
            where strlen(text) > 0
        """,
        "lang_id_docs": _lang_id_oracle_sql(),
        "minhash_near_dupes": """
            with words as (select doc_id,
                                  list_distinct(string_split(text, ' ')) w
                           from documents),
            pairs as (
                select a.doc_id as doc_a, b.doc_id as doc_b,
                       cast(len(list_intersect(a.w, b.w)) as double) /
                       (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w)))
                           as jaccard
                from words a join words b on a.doc_id < b.doc_id)
            select doc_a, doc_b, jaccard from pairs where jaccard >= 0.97
        """,
        "active_buyers_intersect": """
            select user_id from events
            intersect
            select o_custkey as user_id from orders
        """,
        "rollup_event_counts": """
            select event_type, day, count(*) as n
            from (select event_type, cast(ts as date) as day from events)
            group by rollup(event_type, day)
        """,
        "rolling_median_value": """
            select event_id, user_id,
                   round(median(value) over (
                       partition by user_id order by ts, event_id
                       rows between 6 preceding and current row), 4)
                       as rolling_median
            from events
        """,
        "event_type_transitions": """
            with w as (
                select user_id, event_type,
                       lag(event_type) over (partition by user_id
                                             order by ts, event_id)
                           as prev_event_type
                from events)
            select prev_event_type, event_type, count(*) as n
            from w where prev_event_type is not null
            group by 1, 2
        """,
        "event_gaps": """
            select event_id, user_id, ts,
                   cast(epoch_us(ts) - epoch_us(lag(ts) over (
                       partition by user_id order by ts, event_id)) as bigint)
                       as gap_us
            from events
        """,
        "events_building_bloom_join": """
            select e.event_id, e.user_id,
                   c.c_custkey, c.c_name, c.c_mktsegment
            from events e join customer c on e.user_id = c.c_custkey
            where c.c_mktsegment = 'BUILDING'
        """,
        "ivm_event_type_stats": """
            with chg as (
                select event_id as lsn,
                       case when event_type = 'error' then 'delete' else 'upsert' end as op,
                       'doc' || cast(user_id as varchar) as doc_id,
                       cast(floor(value * 100) as bigint) as n_tok,
                       event_type as source
                from events),
            latest as (
                select * from chg
                qualify row_number() over (partition by doc_id order by lsn desc) = 1),
            live as (select * from latest where op <> 'delete')
            select source, count(*) as n, cast(sum(n_tok) as bigint) as total_tok
            from live group by source
        """,
        "tfidf_docs": """
            with tok as (select doc_id,
                                unnest(string_split(text, ' ')) as term
                         from documents),
            tf as (select doc_id, term, count(*) as tf
                   from tok group by doc_id, term),
            df as (select term, count(*) as df from tf group by term),
            n as (select count(*) as n from documents)
            select tf.doc_id, tf.term, tf.tf,
                   round(tf.tf * ln(cast(n.n as double) / df.df), 4) as tfidf
            from tf join df using(term) cross join n
        """,
        "event_session_ids": """
            select event_id, user_id, ts,
                   cast(sum(case when gap_us is null
                                 or gap_us > {G} then 1 else 0 end) over (
                       partition by user_id order by ts, event_id
                       rows unbounded preceding) as bigint) as session_id
            from (select event_id, user_id, ts,
                         epoch_us(ts) - epoch_us(lag(ts) over (
                             partition by user_id order by ts, event_id))
                             as gap_us
                  from events)
        """.replace("{G}", str(SESSION_GAP_H * 3600 * 1_000_000)),
        "cube_order_counts": """
            select o_orderstatus, o_orderpriority, count(*) as n
            from orders group by cube(o_orderstatus, o_orderpriority)
        """,
        "value_histogram": """
            select cast(floor((value - 0.0) / 50.0) as bigint) as bin,
                   count(*) as n
            from events where value >= 0.0 and value < 1000.0
            group by 1
        """,
        "orders_customer_auto_join": """
            select o.o_orderkey, o.o_custkey, o.o_totalprice,
                   c.c_custkey, c.c_name, c.c_mktsegment
            from orders o left join customer c on o.o_custkey = c.c_custkey
        """,
        "user_order_full_join": """
            select e.user_id, e.n_events, b.buyer_id, b.n_orders
            from (select user_id, count(*) as n_events
                  from events group by 1) e
            full join (select o_custkey as buyer_id, count(*) as n_orders
                       from orders group by 1) b
            on e.user_id = b.buyer_id
        """,
        "order_price_ntile": """
            select tile, min(o_totalprice) as min_price,
                   max(o_totalprice) as max_price, count(*) as n
            from (select o_totalprice,
                         ntile(4) over (order by o_totalprice, o_orderkey) as tile
                  from orders)
            group by tile
        """,
        "cheapest_item_per_order": """
            with best as (
                select * from lineitem
                qualify row_number() over (
                    partition by l_orderkey
                    order by l_extendedprice, l_linenumber) = 1)
            select b.l_orderkey, b.l_linenumber, b.l_partkey,
                   b.l_extendedprice, o.o_orderdate, o.o_orderpriority
            from best b join orders o on b.l_orderkey = o.o_orderkey
        """,
        "budget_sample_docs": """
            with w as (
                select doc_id, n_chars, lang,
                       ((doc_id + 7) * 2654435761) % 4294967296 as pri
                from documents)
            select doc_id, n_chars, lang from w
            qualify sum(n_chars) over (order by pri, doc_id
                                       rows unbounded preceding) <= 120000
        """,
        "order_price_buckets": """
            with c as (
                select quantile_disc(o_totalprice, 0.25) as c1,
                       quantile_disc(o_totalprice, 0.50) as c2,
                       quantile_disc(o_totalprice, 0.75) as c3
                from orders)
            select o_orderkey,
                   1 + cast(o_totalprice > c1 as bigint)
                     + cast(o_totalprice > c2 as bigint)
                     + cast(o_totalprice > c3 as bigint) as bucket
            from orders, c
        """,
        "nation_region_grid": """
            select n_name, r_name,
                   n_regionkey = r_regionkey as is_home
            from nation cross join region
        """,
        "cont_price_quantiles": """
            select cast(0.10 as double) as q, round(quantile_cont(o_totalprice, 0.10), 4) as value from orders
            union all
            select cast(0.25 as double), round(quantile_cont(o_totalprice, 0.25), 4) from orders
            union all
            select cast(0.50 as double), round(quantile_cont(o_totalprice, 0.50), 4) from orders
            union all
            select cast(0.75 as double), round(quantile_cont(o_totalprice, 0.75), 4) from orders
            union all
            select cast(0.90 as double), round(quantile_cont(o_totalprice, 0.90), 4) from orders
        """,
        "exact_price_quantiles": """
            select cast(0.25 as double) as q, quantile_disc(o_totalprice, 0.25) as value from orders
            union all
            select cast(0.50 as double), quantile_disc(o_totalprice, 0.50) from orders
            union all
            select cast(0.75 as double), quantile_disc(o_totalprice, 0.75) from orders
            union all
            select cast(0.99 as double), quantile_disc(o_totalprice, 0.99) from orders
        """,
        "scd2_order_status_history": """
            with e as (
                select o_custkey, o_orderkey, o_orderdate, o_orderstatus,
                       lag(o_orderstatus) over (
                           partition by o_custkey
                           order by o_orderdate, o_orderkey) as pv
                from orders),
            m as (select *, case when pv is null or pv <> o_orderstatus
                                 then 1 else 0 end as chg from e),
            v as (select *, cast(sum(chg) over (
                        partition by o_custkey order by o_orderdate, o_orderkey
                        rows unbounded preceding) as bigint) as ver from m),
            runs as (select o_custkey, ver, min(o_orderstatus) as o_orderstatus,
                            min(o_orderdate) as valid_from
                     from v group by o_custkey, ver)
            select o_custkey, o_orderstatus, valid_from,
                   lead(valid_from) over (
                       partition by o_custkey order by ver) as valid_to
            from runs
        """,
        "rolling_min_order_price": """
            select o_custkey, o_orderkey, o_totalprice,
                   min(o_totalprice) over (
                       partition by o_custkey
                       order by o_orderdate, o_orderkey
                       rows between 2 preceding and current row) as rmin
            from orders
        """,
        "monthly_priority_pivot": """
            select cast(date_trunc('month', o_orderdate) as timestamp) as month,
                   cast(sum(case when o_orderpriority = '1-URGENT' then 1 else 0 end) as bigint) as n_1_urgent,
                   cast(sum(case when o_orderpriority = '2-HIGH' then 1 else 0 end) as bigint) as n_2_high,
                   cast(sum(case when o_orderpriority = '3-MEDIUM' then 1 else 0 end) as bigint) as n_3_medium,
                   cast(sum(case when o_orderpriority = '4-NOT SPECIFIED' then 1 else 0 end) as bigint) as n_4_not_specified,
                   cast(sum(case when o_orderpriority = '5-LOW' then 1 else 0 end) as bigint) as n_5_low
            from orders group by 1
        """,
        "running_total_per_customer": """
            select o_orderkey, o_custkey, o_orderdate,
                   cast(round(o_totalprice * 100) as bigint) as cents,
                   cast(sum(cast(round(o_totalprice * 100) as bigint)) over (
                       partition by o_custkey
                       order by o_orderdate, o_orderkey
                       rows between unbounded preceding and current row
                   ) as bigint) as running_cents
            from orders
        """,
        "etl_star_fact": """
            with chg as (
                select event_id as lsn,
                       case when event_type = 'error' then 'delete' else 'upsert' end as op,
                       'doc' || cast(user_id as varchar) as doc_id,
                       user_id,
                       cast(floor(value * 100) as bigint) as n_tok,
                       event_type as source
                from events),
            latest as (
                select * from chg
                qualify row_number() over (partition by doc_id order by lsn desc) = 1)
            select l.doc_id, l.lsn, l.user_id, l.n_tok, l.source, c.c_name
            from latest l left join customer c on l.user_id = c.c_custkey
            where l.op <> 'delete'
        """,
        "top10_orders": """
            select o_orderkey, o_totalprice from orders
            order by o_totalprice desc limit 10
        """,
        "lineitem_moment_stats": """
            select l_returnflag,
                   cast(count(*) as bigint) as n,
                   round(var_samp(l_quantity), 4) as var_x,
                   round(stddev_samp(l_quantity), 4) as std_x,
                   round(covar_samp(l_quantity, l_extendedprice), 4) as covar_xy,
                   round(corr(l_quantity, l_extendedprice), 6) as corr_xy
            from lineitem group by l_returnflag
        """,
        "mode_event_type_per_user": """
            select user_id, event_type as mode_type,
                   cast(n as bigint) as mode_n
            from (select user_id, event_type, count(*) as n from events
                  group by user_id, event_type)
            qualify row_number() over (
                partition by user_id order by n desc, event_type asc) = 1
        """,
        "daily_event_type_entropy": """
            select cast(ts as date) as d,
                   round(entropy(event_type), 4) as entropy_bits
            from events group by cast(ts as date)
        """,
        "priority_revenue_share": """
            select o_orderpriority,
                   round(sum(o_totalprice), 2) as revenue,
                   round(sum(o_totalprice) / sum(sum(o_totalprice)) over (), 6)
                       as share_frac
            from orders group by o_orderpriority
        """,
        "user_value_moving_avg": """
            select event_id, user_id,
                   cast(sum(cast(round(value * 100) as bigint)) over (
                       partition by user_id order by ts
                       range between interval 24 hours preceding
                             and current row) as bigint) as msum_cents,
                   cast(count(*) over (
                       partition by user_id order by ts
                       range between interval 24 hours preceding
                             and current row) as bigint) as mcnt
            from events
        """,
        "orders_profile": """
            select 'o_orderkey' as column, cast(count(*) filter (o_orderkey is null) as bigint) as n_nulls,
                   cast(count(distinct o_orderkey) as bigint) as n_distinct,
                   cast(min(o_orderkey) as varchar) as min_str, cast(max(o_orderkey) as varchar) as max_str from orders
            union all
            select 'o_custkey', cast(count(*) filter (o_custkey is null) as bigint),
                   cast(count(distinct o_custkey) as bigint),
                   cast(min(o_custkey) as varchar), cast(max(o_custkey) as varchar) from orders
            union all
            select 'o_orderstatus', cast(count(*) filter (o_orderstatus is null) as bigint),
                   cast(count(distinct o_orderstatus) as bigint),
                   cast(min(o_orderstatus) as varchar), cast(max(o_orderstatus) as varchar) from orders
            union all
            select 'o_orderpriority', cast(count(*) filter (o_orderpriority is null) as bigint),
                   cast(count(distinct o_orderpriority) as bigint),
                   cast(min(o_orderpriority) as varchar), cast(max(o_orderpriority) as varchar) from orders
            union all
            select 'o_orderdate', cast(count(*) filter (o_orderdate is null) as bigint),
                   cast(count(distinct o_orderdate) as bigint),
                   cast(min(o_orderdate) as varchar), cast(max(o_orderdate) as varchar) from orders
        """,
        "customers_only_recent_orders": """
            select distinct o_custkey from orders
            except
            select distinct o_custkey from orders
            where o_orderdate < timestamp '1997-01-01'
        """,
        "order_price_quantiles_by_priority": """
            select o_orderpriority,
                   round(quantile_cont(o_totalprice, 0.25), 4) as q25,
                   round(quantile_cont(o_totalprice, 0.50), 4) as q50,
                   round(quantile_cont(o_totalprice, 0.75), 4) as q75
            from orders group by o_orderpriority
        """,
        "props_key_stats": """
            select event_type,
                   cast(sum(cast(json_extract_string(props, '$.k') as bigint))
                        as bigint) as sum_k,
                   cast(count(*) as bigint) as n_events
            from events group by event_type
        """,
        "user_first_events_path": """
            select user_id, string_agg(event_type, '>' order by ts, event_id)
                       as path
            from (select * from events
                  qualify row_number() over (
                      partition by user_id order by ts, event_id) <= 8)
            group by user_id
        """,
        "priority_status_grid": """
            select p.o_orderpriority, s.o_orderstatus,
                   cast(coalesce(c.n, 0) as bigint) as n
            from (select distinct o_orderpriority from orders) p
            cross join (select distinct o_orderstatus from orders) s
            left join (select o_orderpriority, o_orderstatus, count(*) n
                       from orders group by 1, 2) c
              on p.o_orderpriority = c.o_orderpriority
             and s.o_orderstatus = c.o_orderstatus
        """,
    }
