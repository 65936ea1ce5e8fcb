"""Relational operators, Ray-Data-first.

Each function re-expresses one operator family the reference pushes into
Postgres SQL (file:line citations below are into /root/reference). They are
written for the 100 TB case: vectorized Arrow kernels per batch, partial
aggregation before any shuffle, broadcast (object-store) sides for
small-table joins instead of all-to-all exchanges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum

# ---------------------------------------------------------------------------
# D1: top-1 per key ("DISTINCT ON (k) ... ORDER BY k, ts DESC",
# queries/fact_studies.py:4,34) — the core LWW shape.
# ---------------------------------------------------------------------------


def _first_per_key_sorted(t: pa.Table, key: str) -> pa.Table:
    from vlm_eden_dataset_etl_ray.stages.lww import _first_per_key_mask

    return t.filter(_first_per_key_mask(t.column(key)))


def _top1_reduce(t: pa.Table, key: str, order_by: list[tuple[str, str]]) -> pa.Table:
    if t.num_rows <= 1:
        return t
    t = t.sort_by([(key, "ascending")] + order_by)
    return _first_per_key_sorted(t, key)


def _none_safe(tup):
    """Driver-side sort key for block-summary tuples that may contain None
    (nullable key columns): None sorts LAST (matching the distributed
    sort's null placement) and never compares against a non-None value."""
    return tuple((v is None, 0 if v is None else v) for v in tup)


def _single_block(ds: rd.Dataset) -> rd.Dataset:
    """Collapse per-batch partials into ONE block for a single final-combine
    task — a tree reduce. Correct (and far cheaper than a sort shuffle) when
    the group-key cardinality is reporting-grade; for key-per-document
    cardinality use the shuffle path instead."""
    return ds.repartition(1)


def _topk_reduce(t: pa.Table, key: str, order_by: list[tuple[str, str]], k: int) -> pa.Table:
    if t.num_rows <= 1:
        return t
    t = t.sort_by([(key, "ascending")] + order_by)
    # fill null codes (null keys = one group) BEFORE to_numpy: a nullable
    # index column would round-trip through float64 (NaN per null, lossy
    # ≥2^53) and corrupt run detection
    codes = pc.fill_null(
        pc.cast(pc.dictionary_encode(t.column(key).combine_chunks()).indices,
                pa.int64()), -1).to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.concatenate([[True], codes[1:] != codes[:-1]]))
    run_id = np.cumsum(np.concatenate([[0], (codes[1:] != codes[:-1]).astype(np.int64)]))
    pos_in_run = np.arange(len(codes)) - starts[run_id]
    return t.filter(pa.array(pos_in_run < k))


def _runfold_topk(
    pre: rd.Dataset, key: str, order_by: list[tuple[str, str]], k: int,
) -> rd.Dataset:
    """Final top-k reduce over per-batch partials WITHOUT a per-key UDF:
    one distributed sort by (key, order_by) co-locates and orders every
    key, each sorted block keeps its runs' first k rows vectorized, and
    only rows in the ≤2 EDGE runs per block (the runs that may continue in
    a neighboring block) re-reduce — O(k·blocks) rows total, pulled to the
    driver for ONE vectorized :func:`_topk_reduce` call (the same
    O(blocks)-driver-state bound as the :mod:`.windows` family; for top-1
    on slim pre-reduced rows this is ~32 B/block). Python-call count and
    merge state depend on the BLOCK count, never the key count.
    """
    from . import runfold as rf

    cols = [key] + [c for c, _ in order_by]
    desc = [False] + [d == "descending" for _, d in order_by]

    def _fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__edge", pa.array([], pa.bool_()))
        starts, lengths = rf.run_bounds(t, [key])
        edges = rf.edge_mask(len(starts))
        rid = rf.run_ids(lengths)
        keep = (np.arange(t.num_rows, dtype=np.int64) - starts[rid]) < k
        return t.filter(pa.array(keep)).append_column(
            "__edge", pa.array(np.repeat(edges, lengths)[keep]))

    parts = pre.sort(cols, descending=desc).map_batches(
        _fold, batch_format="pyarrow", batch_size=None).materialize()
    # column list from the MATERIALIZED frontier — pre.schema() on the lazy
    # dataset would execute the upstream a second time just for inference
    out_cols = [c for c in parts.schema().names if c != "__edge"]
    edge_batches = list(parts.map_batches(
        lambda t: t.filter(t.column("__edge")).select(out_cols),
        batch_format="pyarrow", zero_copy_batch=True,
    ).iter_batches(batch_format="pyarrow", batch_size=None))
    interior = parts.map_batches(
        lambda t: t.filter(pc.invert(t.column("__edge"))).select(out_cols),
        batch_format="pyarrow", zero_copy_batch=True)
    if not edge_batches:
        return interior
    edge = _topk_reduce(pa.concat_tables(edge_batches).combine_chunks(),
                        key, order_by, k)
    return interior.union(rd.from_arrow(edge))


def topk_per_key(
    ds: rd.Dataset, key: str, order_by: list[tuple[str, str]], k: int,
    cardinality: str = "high",
) -> rd.Dataset:
    """Top-k rows per key (D1 generalized): per-batch partial top-k (≤k rows
    per key leave each batch — skew-proof), then the final reduce: a tree
    reduce for ``cardinality="low"``, else the sort + run-boundary fold of
    :func:`_runfold_topk` (O(blocks) Python calls at any key count)."""
    pre = ds.map_batches(
        _topk_reduce,
        fn_kwargs={"key": key, "order_by": order_by, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if cardinality == "low":
        return _single_block(pre).map_batches(
            _topk_reduce,
            fn_kwargs={"key": key, "order_by": order_by, "k": k},
            batch_format="pyarrow",
            batch_size=None,
        )
    return _runfold_topk(pre, key, order_by, k)


def top1_per_key(
    ds: rd.Dataset, key: str, order_by: list[tuple[str, str]],
    cardinality: str = "high",
) -> rd.Dataset:
    """Highest-ranked row per key. ``order_by`` = [(col, "descending"|...)].

    Two-stage reduce: a vectorized per-batch pre-reduce (so a hot key leaves
    each batch once — skew-proof), then a final reduce. ``cardinality="high"``
    (default, key-per-document scale) reduces via the sort + run-boundary
    fold of :func:`_runfold_topk` — O(blocks) Python calls at any key
    count; ``"low"`` (bounded key space, e.g. per-user/per-dimension)
    tree-reduces the partials in one task.
    """
    pre = ds.map_batches(
        _top1_reduce,
        fn_kwargs={"key": key, "order_by": order_by},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if cardinality == "low":
        return _single_block(pre).map_batches(
            _top1_reduce,
            fn_kwargs={"key": key, "order_by": order_by},
            batch_format="pyarrow",
            batch_size=None,
        )
    return _runfold_topk(pre, key, order_by, 1)


# ---------------------------------------------------------------------------
# S1-S3: incremental watermark scans (predicate `updated_at > wm` pushed into
# the source query, e.g. queries/fact_studies.py:30-31) → parquet row-group
# pushdown at the read.
# ---------------------------------------------------------------------------


def watermark_scan(
    path: str,
    ts_col: str,
    watermark,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """read_parquet with ``ts_col > watermark`` pushed to row groups and only
    ``columns`` leaving storage (prune at the read)."""
    expr = pc.field(ts_col) > watermark
    return rd.read_parquet(path, columns=columns, filter=expr)


# ---------------------------------------------------------------------------
# S8/D5 semi-join, S11/D4 anti-join: broadcast the (small) key side and
# filter with a vectorized membership mask — no shuffle. Reference:
# product-access semi-join queries/schema_organizations.py:3-14; validator
# anti-join queries/fact_studies.py:120-126.
# ---------------------------------------------------------------------------


def distinct_values(ds: rd.Dataset, column: str) -> pa.Array:
    """Distinct values of one column, collected driver-side (small side of a
    broadcast join). Distributed partial-distinct per batch, tiny final."""
    parts = ds.select_columns([column]).map_batches(
        lambda t: pa.table({column: t.column(column).combine_chunks().unique()}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tbl = pa.concat_tables(
        b for b in parts.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return tbl.column(column).combine_chunks().unique()


def broadcast_membership_filter(
    ds: rd.Dataset, column: str, keys: pa.Array, negate: bool = False
) -> rd.Dataset:
    """Semi-join (``negate=False``) / anti-join (``negate=True``) of ``ds``
    against a broadcast key set: `ray.put` once, `pc.is_in` per batch."""
    keys_ref = ray.put(keys)

    def _filt(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        mask = pc.is_in(t.column(column), value_set=ks)
        if negate:
            mask = pc.and_kleene(pc.invert(mask), pc.is_valid(t.column(column)))
        return t.filter(mask)

    return ds.map_batches(_filt, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# K2: broadcast dimension lookup — the reference resolves dim keys with 8
# correlated scalar subqueries PER INSERTED ROW (queries/fact_studies.py:86-112);
# here the small dim is broadcast once and resolved with one vectorized
# pc.index_in per batch via a stateful actor pool.
# ---------------------------------------------------------------------------


class BroadcastLookup:
    """Actor-pool stage: LEFT-JOIN ``ds`` to a small dim table.

    The dim is `ray.put` once on the driver; each actor fetches it ONCE in
    ``__init__`` (the reference analog: ``DatabaseBridge`` opened once per
    worker, sync/database_breach.py:8-30).
    """

    def __init__(self, dim_ref, left_on: str, right_on: str,
                 take_columns: list[str], suffix: str = ""):
        dim: pa.Table = ray.get(dim_ref)
        self.right = dim.column(right_on).combine_chunks()
        self.cols = {c + suffix: dim.column(c).combine_chunks() for c in take_columns}
        self.left_on = left_on

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch.column(self.left_on), value_set=self.right)
        for name, col in self.cols.items():
            batch = batch.append_column(name, pc.take(col, idx))
        return batch


def broadcast_left_join(
    ds: rd.Dataset,
    dim: pa.Table,
    left_on: str,
    right_on: str,
    take_columns: list[str],
    suffix: str = "",
    concurrency=None,
) -> rd.Dataset:
    """LEFT-JOIN against a broadcast dim. Default: stateless tasks — the
    `ray.get` per task is a zero-copy plasma read of the one `ray.put` copy,
    so no actor state is needed and parallelism stays elastic. Pass
    ``concurrency`` to switch to the :class:`BroadcastLookup` actor pool
    when per-worker index construction is worth amortizing (e.g. building a
    python dict for non-Arrow lookups)."""
    dim_ref = ray.put(dim)
    if concurrency is not None:
        return ds.map_batches(
            BroadcastLookup,
            fn_constructor_args=(dim_ref, left_on, right_on, take_columns, suffix),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )

    def _join(batch: pa.Table) -> pa.Table:
        dim_t: pa.Table = ray.get(dim_ref)
        idx = pc.index_in(batch.column(left_on), value_set=dim_t.column(right_on).combine_chunks())
        for c in take_columns:
            batch = batch.append_column(
                c + suffix, pc.take(dim_t.column(c).combine_chunks(), idx)
            )
        return batch

    return ds.map_batches(_join, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# A2-A5: grouped counts (reporting views, migrations/20230207_01_53Bud.sql
# et al.) — partial count per batch, then a small groupby-sum shuffle.
# ---------------------------------------------------------------------------


def grouped_count(ds: rd.Dataset, keys: list[str], alias: str = "n",
                  cardinality: str = "low") -> rd.Dataset:
    """Reporting-grade grouped count (reference A2-A5 views): per-batch
    partial counts, then a single tree-reduce combine task (default — the
    key space of a reporting view is bounded). Pass ``cardinality="high"``
    for key-per-document group keys to get the shuffle path."""

    def _partial(t: pa.Table) -> pa.Table:
        g = t.select(keys).group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["__partial_n"])

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    if cardinality == "low":
        def _combine(t: pa.Table) -> pa.Table:
            g = t.group_by(keys).aggregate([("__partial_n", "sum")])
            g = g.rename_columns(keys + [alias])
            return g.set_column(g.column_names.index(alias), alias,
                                g.column(alias).cast(pa.int64()))

        return _single_block(partial).map_batches(
            _combine, batch_format="pyarrow", batch_size=None)
    out = partial.groupby(keys).aggregate(Sum("__partial_n", alias_name=alias))
    return out.map_batches(
        lambda t, a=alias: t.set_column(
            t.column_names.index(a), a, t.column(a).cast(pa.int64())
        ),
        batch_format="pyarrow",
    )


def grouped_agg(
    ds: rd.Dataset,
    keys: list[str],
    sums: dict[str, str] | None = None,
    counts: str | None = None,
    cardinality: str = "low",
) -> rd.Dataset:
    """Partial per-batch sum/count, then a final combine. ``sums`` maps
    source column → output alias; ``counts`` names a count(*) alias.
    Default final is a single tree-reduce task (reporting-grade key spaces);
    ``cardinality="high"`` switches to the groupby shuffle."""
    sums = sums or {}
    src_cols = list(sums)

    def _partial(t: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in src_cols] + [([], "count_all")]
        g = t.select(keys + src_cols).group_by(keys).aggregate(aggs)
        names = keys + [f"__s_{c}" for c in src_cols] + ["__n"]
        return g.rename_columns(names)

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    if cardinality == "low":
        aliases = list(sums.values())

        def _combine(t: pa.Table) -> pa.Table:
            aggs = [(f"__s_{c}", "sum") for c in src_cols]
            if counts:
                aggs.append(("__n", "sum"))
            g = t.group_by(keys).aggregate(aggs)
            names = keys + aliases + ([counts] if counts else [])
            g = g.rename_columns(names)
            if counts:
                g = g.set_column(g.column_names.index(counts), counts,
                                 g.column(counts).cast(pa.int64()))
            return g

        return _single_block(partial).map_batches(
            _combine, batch_format="pyarrow", batch_size=None)

    aggs = [Sum(f"__s_{c}", alias_name=a) for c, a in sums.items()]
    if counts:
        aggs.append(Sum("__n", alias_name=counts))
    out = partial.groupby(keys).aggregate(*aggs)
    if counts:
        out = out.map_batches(
            lambda t, a=counts: t.set_column(
                t.column_names.index(a), a, t.column(a).cast(pa.int64())
            ),
            batch_format="pyarrow",
        )
    return out


# ---------------------------------------------------------------------------
# S6/D7: grouped distinct-sorted string aggregation
# (string_agg(DISTINCT x, ',' ORDER BY x), queries/dim_technicians.py:6).
# ---------------------------------------------------------------------------


def string_agg_distinct(
    ds: rd.Dataset, key: str, value: str, alias: str, sep: str = ",",
    cardinality: str = "low",
) -> rd.Dataset:
    def _partial(t: pa.Table) -> pa.Table:
        g = t.select([key, value]).group_by([key]).aggregate([(value, "distinct")])
        return g.rename_columns([key, "__vals"])

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    if cardinality == "low":
        def _combine(t: pa.Table) -> pa.Table:
            acc: dict = {}
            for k, chunk in zip(t.column(key).to_pylist(), t.column("__vals").to_pylist()):
                acc.setdefault(k, set()).update(v for v in chunk if v is not None)
            ks = sorted(acc)
            return pa.table({key: pa.array(ks, t.column(key).type),
                             alias: [sep.join(sorted(acc[k])) for k in ks]})

        return _single_block(partial).map_batches(
            _combine, batch_format="pyarrow", batch_size=None)

    def _final(g: pa.Table) -> pa.Table:
        vals: set[str] = set()
        for chunk in g.column("__vals").to_pylist():
            vals.update(v for v in chunk if v is not None)
        return pa.table({key: [g.column(key)[0].as_py()], alias: [sep.join(sorted(vals))]})

    return partial.groupby(key).map_groups(_final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# T10: calendar-dimension generation (29,220 derived-date rows,
# migrations/20221214_01_9Jm6L.sql:43-84) — ray.data.range + vectorized
# pandas date kernels.
# ---------------------------------------------------------------------------


def calendar_dim(start: str = "1999-01-01", days: int = 29220) -> rd.Dataset:
    start_ts = pd.Timestamp(start)

    def _gen(batch: dict) -> pd.DataFrame:
        d = start_ts + pd.to_timedelta(batch["id"], unit="D")
        s = pd.Series(d)
        iso = s.dt.isocalendar()
        return pd.DataFrame(
            {
                "date_actual": s.dt.date,
                "epoch": (s.astype("int64") // 10**9).astype("int64"),
                "day_of_week": (s.dt.dayofweek + 1).astype("int64"),  # isodow 1..7
                "day_of_month": s.dt.day.astype("int64"),
                "day_of_year": s.dt.dayofyear.astype("int64"),
                "week_of_year": iso["week"].astype("int64"),
                "month_actual": s.dt.month.astype("int64"),
                "quarter_actual": s.dt.quarter.astype("int64"),
                "year_actual": s.dt.year.astype("int64"),
                "first_day_of_month": s.dt.to_period("M").dt.start_time.dt.date,
                "last_day_of_month": s.dt.to_period("M").dt.end_time.dt.date,
                "weekend_indr": (s.dt.dayofweek >= 5),
            }
        )

    return rd.range(days).map_batches(_gen, batch_format="numpy")


# ---------------------------------------------------------------------------
# Large×large hash join: when NEITHER side fits a broadcast, co-locate by
# key hash — tag each side, union, groupby(bucket), join the two sides of
# each bucket in polars (Arrow-native, no pandas float64 null-coercion).
# One shuffle, B buckets; a bucket is the task-memory unit, so B is derived
# from the byte estimate when one is available (same lever as lake
# num_partitions) and from cluster CPUs otherwise. Salt hot keys by raising B.
# ---------------------------------------------------------------------------


def _auto_buckets(bytes_hint: int | None, target_bucket_bytes: int) -> int:
    """Bucket count: ceil(bytes / target) when the caller can estimate input
    bytes (a `Dataset.size_bytes()` of a materialized input, parquet file
    sizes, or a manifest's byte accounting); else 2× cluster CPUs so bucket
    tasks saturate the cluster. Never below 16 — small-side skew insurance."""
    if bytes_hint is not None and bytes_hint > 0:
        return max(16, -(-bytes_hint // target_bucket_bytes))
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(16, 2 * ncpu)


def _join_out_schema(ls: pa.Schema, rs: pa.Schema, left_on: str, right_on: str) -> pa.Schema:
    """Output schema of :func:`hash_join` / :func:`skew_hash_join`, computed
    STATICALLY from the two input schemas — never by executing the joined
    dataset (an all-hot or empty cold branch can yield no blocks, and
    ``Dataset.schema()`` on it would return None or trigger execution)."""
    out_fields = list(ls) + [f for f in rs if f.name not in ls.names or
                             (left_on == right_on and f.name == left_on)]
    return pa.schema([f for i, f in enumerate(out_fields)
                      if f.name not in [x.name for x in out_fields[:i]]])


def _merge_sides(lt: pa.Table, rt: pa.Table, left_on: str, right_on: str,
                 how: str, out_schema: pa.Schema) -> pa.Table:
    """SQL-semantics merge of two Arrow sides in polars (zero-copy both
    ways): inner/left follow ON semantics (a differently-named right key
    stays visible, null where unmatched); full keeps both unmatched sides
    (USING/coalesce when the key name is shared). Null keys never match."""
    import polars as pl

    l, r = pl.from_arrow(lt), pl.from_arrow(rt)
    if how == "full":
        merged = l.join(r, left_on=left_on, right_on=right_on,
                        how="full", coalesce=(left_on == right_on))
    else:
        if left_on != right_on:
            # polars coalesces away the right key column; keep a copy so a
            # left join surfaces null right-keys for unmatched rows
            # (pandas merge semantics, which the DuckDB oracles follow)
            r = r.with_columns(pl.col(right_on).alias("__rkeep"))
        merged = l.join(r, left_on=left_on, right_on=right_on,
                        how=how, coalesce=True)
        if left_on != right_on:
            merged = merged.rename({"__rkeep": right_on})
    return merged.to_arrow().select(out_schema.names).cast(out_schema)


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    how: str = "inner",
    num_buckets: int | None = None,
    bytes_hint: int | None = None,
    target_bucket_bytes: int = 256 * 1024 * 1024,
) -> rd.Dataset:
    """Explicit partitioned hash join (the portable large×large pattern).
    Columns of both sides are kept (a differently-named right key column is
    preserved, null where unmatched on a left join). ``how`` ∈ {"inner",
    "left", "full"}. Full-outer follows SQL ON semantics when the key
    names differ (each side's key is null on the other side's unmatched
    rows; null keys never match); with IDENTICAL key names the single key
    column is coalesced (SQL ``USING`` shape). Payload columns may be any
    Arrow type incl. lists (the per-bucket join runs in polars, zero-copy
    from Arrow). ``num_buckets`` defaults to :func:`_auto_buckets` (pass
    ``bytes_hint`` = estimated left+right bytes so one bucket ≈
    ``target_bucket_bytes``)."""
    import polars as pl

    from vlm_eden_dataset_etl_ray import schema as sch_mod
    from vlm_eden_dataset_etl_ray.functions.hashing import hash_strings

    if num_buckets is None:
        num_buckets = _auto_buckets(bytes_hint, target_bucket_bytes)

    ls = pa.schema(list(zip(left.schema().names, left.schema().types)))
    rs = pa.schema(list(zip(right.schema().names, right.schema().types)))
    overlap = (set(ls.names) & set(rs.names)) - ({left_on} if left_on == right_on else set())
    if overlap:
        raise ValueError(f"column name collision across join sides: {sorted(overlap)}")
    target = pa.schema(list(ls) + [f for f in rs if f.name not in ls.names])

    def _tag(side: str, key: str):
        def _f(t: pa.Table) -> pa.Table:
            k = t.column(key)
            if not (pa.types.is_string(k.type) or pa.types.is_large_string(k.type)):
                k = k.cast(pa.string())
            b = (hash_strings(k) % np.uint64(num_buckets)).astype(np.int32)
            t = sch_mod.unify_table(t, target)  # null-fill the other side's cols
            t = t.append_column("__bucket", pa.array(b))
            return t.append_column("__side", pa.array(np.full(t.num_rows, side)))
        return _f

    lt = left.map_batches(_tag("l", left_on), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(_tag("r", right_on), batch_format="pyarrow", zero_copy_batch=True)

    left_cols = list(ls.names)
    right_cols = list(rs.names)

    out_schema = _join_out_schema(ls, rs, left_on, right_on)

    if how not in ("inner", "left", "full"):
        raise ValueError(f"hash_join: unsupported how={how!r}")

    def _join_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side")
        l = g.filter(pc.equal(side, "l")).select(left_cols)
        r = g.filter(pc.equal(side, "r")).select(right_cols)
        return _merge_sides(l, r, left_on, right_on, how, out_schema)

    both = lt.union(rt)
    return both.groupby("__bucket").map_groups(_join_bucket, batch_format="pyarrow")


def hash_semi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    anti: bool = False,
    num_buckets: int | None = None,
    bytes_hint: int | None = None,
    target_bucket_bytes: int = 256 * 1024 * 1024,
    flag_col: str | None = None,
    left_top1: list[tuple[str, str]] | None = None,
) -> rd.Dataset:
    """Large×large SEMI (EXISTS) / ANTI (NOT EXISTS) join — the scalable
    complement of :func:`broadcast_membership_filter` (which requires the
    id set to fit the object store as one driver-built payload). Only the
    LEFT rows and the right side's DISTINCT KEYS travel through the
    exchange: the right payload never shuffles, and per-batch dedup
    pre-reduces the key stream before it moves. Per bucket, a vectorized
    ``is_in`` keeps (semi) or drops (anti) left rows.

    ``flag_col``: instead of filtering, return EVERY left row with a
    boolean membership column of that name (false where the key is null).
    One exchange then serves consumers that route matched and unmatched
    rows differently (e.g. MERGE's matched/not-matched split) — ``anti``
    is ignored in this mode.

    ``left_top1``: an ``order_by`` list; before the membership test, the
    left side is reduced to its top-1 row per ``left_on`` (per-batch
    pre-reduce + a vectorized per-bucket final, both inside THIS
    operator's exchange). Fuses "keep-first dedup, then semi/anti-join
    the winners" into one shuffle instead of two back-to-back exchanges
    on the same key.

    SQL null semantics: a null left key matches nothing — excluded from
    the semi result, INCLUDED in the anti result (NOT EXISTS holds)."""
    from vlm_eden_dataset_etl_ray import schema as sch_mod
    from vlm_eden_dataset_etl_ray.functions.hashing import hash_strings

    if num_buckets is None:
        num_buckets = _auto_buckets(bytes_hint, target_bucket_bytes)
    ls = pa.schema(list(zip(left.schema().names, left.schema().types)))
    left_cols = list(ls.names)
    key_marker = "__semi_key"
    if key_marker in left_cols:
        raise ValueError(f"left side may not carry a {key_marker!r} column")
    if flag_col is not None and flag_col in left_cols:
        raise ValueError(f"left side already carries flag_col={flag_col!r}")
    target = pa.schema(list(ls) + [pa.field(key_marker, pa.string())])

    def _bucket_of(k: pa.ChunkedArray) -> pa.Array:
        if not (pa.types.is_string(k.type) or pa.types.is_large_string(k.type)):
            k = k.cast(pa.string())
        return pa.array((hash_strings(k) % np.uint64(num_buckets)).astype(np.int32))

    def _tag_left(t: pa.Table) -> pa.Table:
        if left_top1 is not None:  # skew-proof pre-reduce before the move
            t = _top1_reduce(t, left_on, left_top1)
        b = _bucket_of(t.column(left_on))
        t = sch_mod.unify_table(t, target)
        return t.append_column("__bucket", b)

    def _tag_right(t: pa.Table) -> pa.Table:
        k = t.column(right_on)
        if not (pa.types.is_string(k.type) or pa.types.is_large_string(k.type)):
            k = k.cast(pa.string())
        k = pc.unique(k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k)
        k = k.drop_null()
        out = pa.table({key_marker: k})
        out = sch_mod.unify_table(out, target)
        return out.append_column("__bucket", _bucket_of(out.column(key_marker)))

    lt = left.map_batches(_tag_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.select_columns([right_on]).map_batches(
        _tag_right, batch_format="pyarrow", zero_copy_batch=True)

    def _filter_bucket(g: pa.Table) -> pa.Table:
        keys = g.column(key_marker).drop_null()
        l = g.filter(pc.is_null(g.column(key_marker))).select(left_cols)
        if left_top1 is not None:  # vectorized across the bucket's keys
            l = _top1_reduce(l, left_on, left_top1)
        lk = l.column(left_on)
        if not (pa.types.is_string(lk.type) or pa.types.is_large_string(lk.type)):
            lk = lk.cast(pa.string())
        hit = pc.fill_null(pc.is_in(lk, value_set=keys.combine_chunks()), False)
        if flag_col is not None:
            return l.append_column(flag_col, hit)
        return l.filter(pc.invert(hit) if anti else hit)

    both = lt.union(rt)
    return both.groupby("__bucket").map_groups(
        _filter_bucket, batch_format="pyarrow")


def auto_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    how: str = "inner",
    broadcast_threshold_bytes: int = 64 * 1024 * 1024,
    bytes_hint: int | None = None,
    num_buckets: int | None = None,
    right_bytes_hint: int | None = None,
) -> rd.Dataset:
    """Join planner: measure the RIGHT side (materialized — it is the
    small-side candidate, so this is the work a planner must do anyway);
    if it fits ``broadcast_threshold_bytes``, ship it ONCE via ``ray.put``
    and merge per left batch with no shuffle at all — otherwise fall back
    to the partitioned :func:`hash_join` with the measured bytes folded
    into the bucket hint. The broadcast path handles 1:N matches and SQL
    null semantics identically to the shuffle path (same polars merge
    core), so the choice is invisible to callers. ``how="full"`` always
    shuffles (both sides' unmatched rows must survive — a broadcast of one
    side cannot know which of its rows went unmatched globally).

    ``right_bytes_hint``: a caller who already KNOWS the right side's size
    (e.g. ``lake.total_bytes`` from the manifest, or ``size_bytes()`` of a
    materialized upstream) should pass it — a hint above the threshold
    routes straight to the shuffle join without materializing the right
    side at all."""
    if how == "full":
        return hash_join(left, right, left_on, right_on, how=how,
                         num_buckets=num_buckets, bytes_hint=bytes_hint)
    if right_bytes_hint is not None and right_bytes_hint > broadcast_threshold_bytes:
        return hash_join(left, right, left_on, right_on, how=how,
                         num_buckets=num_buckets,
                         bytes_hint=bytes_hint or (right_bytes_hint * 2))
    right = right.materialize()
    rb = right.size_bytes() or 0
    if rb > broadcast_threshold_bytes:
        return hash_join(left, right, left_on, right_on, how=how,
                         num_buckets=num_buckets,
                         bytes_hint=bytes_hint or (rb * 2))

    ls = pa.schema(list(zip(left.schema().names, left.schema().types)))
    rs = pa.schema(list(zip(right.schema().names, right.schema().types)))
    overlap = (set(ls.names) & set(rs.names)) - ({left_on} if left_on == right_on else set())
    if overlap:
        raise ValueError(f"column name collision across join sides: {sorted(overlap)}")
    out_schema = _join_out_schema(ls, rs, left_on, right_on)
    batches = list(right.iter_batches(batch_format="pyarrow", batch_size=None))
    from vlm_eden_dataset_etl_ray.schema import unify_table
    dim = pa.concat_tables(unify_table(b, rs) for b in batches) if batches \
        else rs.empty_table()
    dim_ref = ray.put(dim)

    def _bj(t: pa.Table) -> pa.Table:
        return _merge_sides(t, ray.get(dim_ref), left_on, right_on, how,
                            out_schema)

    return left.map_batches(_bj, batch_format="pyarrow", zero_copy_batch=True)


def bloom_semi_filter(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
) -> rd.Dataset:
    """Bloom-filter pre-filter for selective joins: drop left rows whose
    key CANNOT appear on the right before the join's shuffle moves them.
    At 100 TB this is the difference between shuffling the corpus and
    shuffling the matching fraction (+ the bloom false positives — the
    surviving superset joins exactly as before, so results are identical).

    The filter is built distributed: each right batch folds its key
    hashes into a ``n_bits`` bitset partial (numpy packbits layout,
    ``n_bits/8`` bytes); partials OR together on the driver — O(blocks ×
    n_bits/8) transfer once, 1 MiB per partial at the default size — then
    broadcast once via ``ray.put``. Probes use double hashing
    (h1 + i·h2) from two seeds of the engine's stable string hash. FPR ≈
    (1 − e^(−kn/m))^k — ~2% at 1M keys with the defaults; size ``n_bits``
    ≈ 10× the expected distinct right keys for ~1%."""
    from vlm_eden_dataset_etl_ray.functions.hashing import hash_strings

    nb = int(n_bits)

    def _indexes(keys) -> np.ndarray:
        if not (pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type)):
            keys = keys.cast(pa.string())
        h1 = hash_strings(keys, seed=11)
        h2 = hash_strings(keys, seed=29) | np.uint64(1)  # odd → full cycle
        idx = np.empty((n_hashes, len(h1)), dtype=np.uint64)
        for i in range(n_hashes):
            idx[i] = (h1 + np.uint64(i) * h2) % np.uint64(nb)
        return idx.reshape(-1)

    def _partial_bits(t: pa.Table) -> pa.Table:
        bits = np.zeros(nb // 8, dtype=np.uint8)
        if t.num_rows:
            idx = _indexes(t.column(right_on).combine_chunks())
            np.bitwise_or.at(bits, (idx // 8).astype(np.int64),
                             np.left_shift(1, (idx % 8).astype(np.uint8)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    parts = right.select_columns([right_on]).map_batches(
        _partial_bits, batch_format="pyarrow")
    acc = np.zeros(nb // 8, dtype=np.uint8)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for buf in b.column("bits").to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint8)
    bits_ref = ray.put(acc)

    def _filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        bits = ray.get(bits_ref)
        idx = _indexes(t.column(left_on).combine_chunks()) \
            .reshape(n_hashes, t.num_rows)
        hit = np.ones(t.num_rows, dtype=bool)
        for i in range(n_hashes):
            hit &= (bits[(idx[i] // 8).astype(np.int64)]
                    >> (idx[i] % 8).astype(np.uint8)) & 1 == 1
        return t.filter(pa.array(hit))

    return left.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)


def histogram_counts(
    ds: rd.Dataset,
    col: str,
    lo: float,
    hi: float,
    n_bins: int,
    bin_col: str = "bin",
    alias: str = "n",
) -> rd.Dataset:
    """Fixed-width histogram: rows with ``lo <= col < hi`` are binned by
    ``floor((col - lo) / width)`` (vectorized per batch), then counted
    with the mergeable partial-combine shuffle of :func:`grouped_count`.
    Out-of-range and null values are excluded — the SQL-matchable
    convention (`where col >= lo and col < hi`)."""
    width = (hi - lo) / n_bins

    def _bin(t: pa.Table) -> pa.Table:
        v = t.column(col)
        keep = pc.and_(pc.greater_equal(v, lo), pc.less(v, hi))
        v = v.filter(pc.fill_null(keep, False))
        b = pc.cast(pc.floor(pc.divide(pc.subtract(v, lo), width)), pa.int64())
        return pa.table({bin_col: b})

    binned = ds.map_batches(_bin, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_count(binned, [bin_col], alias)


def skew_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    how: str = "inner",
    hot_keys: list | None = None,
    sample_rows: int = 100_000,
    hot_frac: float = 0.05,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Skew-safe large×large join. A Zipf-hot key overloads its
    :func:`hash_join` bucket (one task gets a constant fraction of the
    corpus); here hot keys are detected from a driver sample of the left
    side (or passed explicitly), their RIGHT rows — small, because a dim
    key has bounded payload — are broadcast, and hot LEFT rows join per
    batch with no shuffle at all. Cold keys take the normal bucketed path.
    Partitioning assumption: right-side rows of any single hot key fit one
    broadcast object (true for dim-shaped right sides; a hot×hot join
    needs a salted replicate-right strategy instead, which no pipeline in
    scope requires)."""
    import polars as pl

    if how not in ("inner", "left"):
        # a full join cannot split into hot/cold paths: the broadcast hot
        # side-path cannot know which of ITS rows went unmatched globally
        raise ValueError(
            f"skew_hash_join: how={how!r} unsupported; use hash_join for full")

    # both sides feed multiple consumers (sample + hot + cold paths);
    # materialize once so upstream stages run once, not 3×/2×. The Arrow
    # normalization also pins schema().types to Arrow DataTypes (pandas-
    # block inputs report numpy classes, which break pa.schema below)
    left = left.map_batches(lambda t: t, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    right = right.map_batches(lambda t: t, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    if hot_keys is None:
        # RANDOM sample — limit() takes the first blocks, which misses hot
        # keys entirely when the input is clustered/sorted by key
        n_left = left.count()  # metadata-cheap on a materialized dataset
        frac = min(1.0, sample_rows / max(1, n_left))
        sample = left.random_sample(frac, seed=7).select_columns([left_on])
        batches = list(sample.iter_batches(batch_format="pyarrow",
                                           batch_size=None))
        if batches:
            st = pa.concat_tables(batches)
            counts = st.group_by(left_on).aggregate([([], "count_all")])
            mask = pc.greater(counts.column("count_all"),
                              pa.scalar(int(hot_frac * st.num_rows)))
            hot_keys = counts.filter(mask).column(left_on).to_pylist()
        else:
            hot_keys = []
    # both sides are materialized above, so size_bytes() is free metadata:
    # bucket counts track data volume, not cluster shape
    joined_bytes = (left.size_bytes() or 0) + (right.size_bytes() or 0)
    if not hot_keys:
        return hash_join(left, right, left_on, right_on, how=how,
                         num_buckets=num_buckets, bytes_hint=joined_bytes)

    hot_arr = pa.array(hot_keys)

    def _split(col: str, keep_hot: bool):
        def _f(t: pa.Table) -> pa.Table:
            m = pc.is_in(t.column(col), value_set=hot_arr)
            return t.filter(m if keep_hot else pc.invert(m))
        return _f

    # hot right rows: collected once, broadcast via ray.put. A hot key
    # ABSENT from right yields zero batches — broadcast an empty table of
    # the right schema so the per-batch join still runs (left join pads
    # nulls, inner join drops, matching the bucketed path's semantics)
    hot_right = right.map_batches(_split(right_on, True), batch_format="pyarrow",
                                  zero_copy_batch=True)
    hr_batches = list(hot_right.iter_batches(batch_format="pyarrow",
                                             batch_size=None))
    rs = pa.schema(list(zip(right.schema().names, right.schema().types)))
    hr = pa.concat_tables(hr_batches) if hr_batches else rs.empty_table()
    hr_ref = ray.put(hr)

    cold = hash_join(
        left.map_batches(_split(left_on, False), batch_format="pyarrow",
                         zero_copy_batch=True),
        right.map_batches(_split(right_on, False), batch_format="pyarrow",
                          zero_copy_batch=True),
        left_on, right_on, how=how, num_buckets=num_buckets,
        bytes_hint=joined_bytes)
    # static schema from the INPUT schemas — executing cold.schema() crashes
    # when every key is hot (both cold sides empty → schema None)
    ls_static = pa.schema(list(zip(left.schema().names, left.schema().types)))
    cold_schema = _join_out_schema(ls_static, rs, left_on, right_on)

    class _HotJoin:
        def __init__(self):
            self.r = pl.from_arrow(ray.get(hr_ref))
            if left_on != right_on:
                self.r = self.r.with_columns(pl.col(right_on).alias("__rkeep"))

        def __call__(self, t: pa.Table) -> pa.Table:
            merged = pl.from_arrow(t).join(
                self.r, left_on=left_on, right_on=right_on,
                how=("left" if how == "left" else "inner"), coalesce=True)
            if left_on != right_on:
                merged = merged.rename({"__rkeep": right_on})
            return merged.to_arrow().select(cold_schema.names).cast(cold_schema)

    hot = left.map_batches(_split(left_on, True), batch_format="pyarrow",
                           zero_copy_batch=True)
    hot_joined = hot.map_batches(_HotJoin, batch_format="pyarrow",
                                 zero_copy_batch=True, concurrency=(1, 8))
    return cold.union(hot_joined)


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    on_col: str,
    start_col: str,
    end_col: str,
    closed: str = "left",
    num_buckets: int | None = None,
    bytes_hint: int | None = None,
) -> rd.Dataset:
    """Interval (range) join with an equality key — the scalable shape of a
    range join: rows co-partition by hash(key) (ONE shuffle via
    :func:`hash_join`), then the interval predicate
    ``start <= left.on < end`` (``closed='left'``; ``'both'`` makes the end
    inclusive) filters the per-bucket equality matches vectorized. A pure
    interval-overlap join with NO equality key would need an interval-tree
    stage instead; every pipeline in scope keys ranges by an entity id, so
    that variant is intentionally not built. Inner semantics."""
    joined = hash_join(left, right, left_on, right_on, how="inner",
                       num_buckets=num_buckets, bytes_hint=bytes_hint)
    hi_cmp = pc.less if closed == "left" else pc.less_equal

    def _range(t: pa.Table) -> pa.Table:
        on = t.column(on_col)
        lo = pc.greater_equal(on, t.column(start_col))
        hi = hi_cmp(on, t.column(end_col))
        return t.filter(pc.and_kleene(lo, hi))

    return joined.map_batches(_range, batch_format="pyarrow", zero_copy_batch=True)


def unpivot(
    ds: rd.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> rd.Dataset:
    """Wide → long (SQL UNPIVOT / pandas melt): each input row becomes
    ``len(value_cols)`` rows of (id_cols…, variable, value). Pure per-batch
    projection + concat — no shuffle, no driver pass. Value columns are
    cast to one common type, resolved once from the schema driver-side
    (identical types kept; mixed numerics → float64; anything else →
    string)."""
    schema = ds.schema()
    types = [schema.base_schema.field(c).type for c in value_cols]
    if all(t == types[0] for t in types):
        vt = types[0]
    elif all(pa.types.is_integer(t) or pa.types.is_floating(t) for t in types):
        vt = pa.float64()
    else:
        vt = pa.string()

    def _melt(t: pa.Table) -> pa.Table:
        pieces = []
        for c in value_cols:
            cols = {k: t.column(k) for k in id_cols}
            cols[var_name] = pa.array(np.full(t.num_rows, c, dtype=object),
                                      pa.string())
            cols[value_name] = t.column(c).cast(vt)
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces)

    return ds.map_batches(_melt, batch_format="pyarrow", zero_copy_batch=True)


def grouped_min_max_count(
    ds: rd.Dataset,
    keys: list[str],
    value_col: str,
    aliases: tuple[str, str, str] = ("vmin", "vmax", "n"),
) -> rd.Dataset:
    """min/max/count per group — mergeable partials per batch (min of mins,
    max of maxes, sum of counts), final combine in one task (reporting-
    grade key spaces, same contract as :func:`grouped_agg`)."""
    lo, hi, n = aliases

    def _partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(
            [(value_col, "min"), (value_col, "max"), ([], "count_all")])
        return g.rename_columns(keys + [lo, hi, n])

    def _combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([(lo, "min"), (hi, "max"), (n, "sum")])
        return g.rename_columns(keys + [lo, hi, n])

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    return _single_block(parts).map_batches(
        _combine, batch_format="pyarrow", batch_size=None)


def broadcast_interval_join(
    ds: rd.Dataset,
    intervals: pa.Table,
    on_col: str,
    start_col: str = "lo",
    end_col: str = "hi",
    closed: str = "left",
) -> rd.Dataset:
    """KEYLESS interval join against a small broadcast interval table —
    the bucketing shape training pipelines use (length / quality / value
    tiers for curriculum buckets), where :func:`range_join` covers the
    keyed shape. Inner semantics: each left row joins every interval with
    ``start <= v < end`` (``closed='both'`` makes the end inclusive).

    The interval table rides the object store once (``ray.put``); no
    shuffle. Two vectorized per-batch paths: NON-OVERLAPPING intervals
    (checked once, driver-side, after sorting by start) map each value to
    its unique interval via one ``searchsorted`` — O(B log m); overlapping
    intervals fall back to a dense (B × m) membership mask — fine for the
    tens-of-tiers broadcast tables this is for, and guarded so a
    mistakenly-large interval table fails loudly instead of allocating
    gigabytes."""
    if intervals.num_rows == 0:
        raise ValueError("empty interval table")
    if intervals.num_rows > 10_000:
        raise ValueError(
            f"{intervals.num_rows} intervals: broadcast_interval_join is for "
            "small broadcast tier tables; use range_join (keyed) for large sides")
    iv = intervals.sort_by(start_col)
    starts = iv.column(start_col).to_numpy(zero_copy_only=False).astype(np.float64)
    ends = iv.column(end_col).to_numpy(zero_copy_only=False).astype(np.float64)
    if np.any(ends < starts):
        raise ValueError("interval with end < start")
    right_inc = closed == "both"
    # non-overlap ⇔ each start ≥ previous end (> when ends are inclusive)
    if right_inc:
        disjoint = bool(np.all(starts[1:] > ends[:-1]))
    else:
        disjoint = bool(np.all(starts[1:] >= ends[:-1]))
    payload = ray.put(iv)

    def _join(t: pa.Table) -> pa.Table:
        ivt = ray.get(payload)
        v = t.column(on_col).to_numpy(zero_copy_only=False).astype(np.float64)
        if disjoint:
            # candidate = last interval whose start <= v; nulls (NaN) and
            # out-of-range values land outside their candidate's [lo, hi)
            cand = np.searchsorted(starts, v, side="right") - 1
            cc = np.clip(cand, 0, len(starts) - 1)
            inside = ends[cc] >= v if right_inc else ends[cc] > v
            ok = (cand >= 0) & inside & ~np.isnan(v)
            li = np.nonzero(ok)[0]
            ri = cc[li]
        else:
            m = (v[:, None] >= starts[None, :])
            m &= (v[:, None] <= ends[None, :]) if right_inc else (v[:, None] < ends[None, :])
            m &= ~np.isnan(v)[:, None]
            li, ri = np.nonzero(m)
        out = t.take(pa.array(li, pa.int64()))
        rt = ivt.take(pa.array(ri, pa.int64()))
        for name in rt.column_names:
            if name not in out.column_names:
                out = out.append_column(name, rt.column(name))
        return out

    return ds.map_batches(_join, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# As-of join — an operator Ray Data lacks natively. Small right side →
# broadcast + pd.merge_asof per batch (no shuffle). Both-sides-large →
# bucket both sides by hash(key), sort within buckets, merge_asof per
# bucket inside map_groups (partitioning assumption: one bucket's rows fit
# one task — same contract as every other per-partition op here).
# ---------------------------------------------------------------------------


def asof_join_broadcast(
    ds: rd.Dataset,
    right: pa.Table,
    by_left: str,
    by_right: str,
    on_left: str,
    on_right: str,
    take_columns: list[str],
) -> rd.Dataset:
    """For each left row: the latest right row with ``on_right <= on_left``
    for the same key (backward as-of, LEFT join). The right side must be
    tie-free per (key, ts) — dedup it first (e.g. max natural key)."""
    right_df = right.to_pandas().sort_values(on_right, kind="mergesort")
    ref = ray.put(right_df)

    def _asof(t: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811 - worker-side

        rdf = ray.get(ref)
        ldf = t.to_pandas()
        order = np.argsort(ldf[on_left].values, kind="stable")
        merged = pd.merge_asof(
            ldf.iloc[order],
            rdf[[by_right, on_right] + [c for c in take_columns if c != on_right]],
            left_on=on_left, right_on=on_right,
            left_by=by_left, right_by=by_right,
        )
        merged = merged.iloc[np.argsort(order, kind="stable")]
        out = t
        for c in take_columns:
            col = merged[c]
            if pd.api.types.is_float_dtype(col) and c in right.column_names and \
                    pa.types.is_integer(right.schema.field(c).type):
                arr = pa.array(col.astype("Int64"), type=right.schema.field(c).type)
            else:
                arr = pa.Array.from_pandas(col, type=right.schema.field(c).type
                                           if c in right.column_names else None)
            out = out.append_column(c, arr)
        return out

    return ds.map_batches(_asof, batch_format="pyarrow", zero_copy_batch=True)


def asof_join_bucketed(
    left: rd.Dataset,
    right: rd.Dataset,
    by_left: str,
    by_right: str,
    on_left: str,
    on_right: str,
    take_columns: list[str],
    num_buckets: int | None = None,
    bytes_hint: int | None = None,
) -> rd.Dataset:
    """Both-sides-LARGE as-of join: neither side fits a broadcast, so both
    are hash-bucketed on the BY key and each bucket merge_asof's its two
    sides (backward, LEFT join — same semantics as
    :func:`asof_join_broadcast`). One shuffle; the partitioning assumption
    is the usual one: a bucket's rows fit one task (raise ``num_buckets``
    / pass ``bytes_hint`` to hold it). The right side must be tie-free per
    (key, ts)."""
    from vlm_eden_dataset_etl_ray import schema as sch_mod
    from vlm_eden_dataset_etl_ray.functions.hashing import hash_strings

    if num_buckets is None:
        num_buckets = _auto_buckets(bytes_hint, 256 * 1024 * 1024)

    ls = pa.schema(list(zip(left.schema().names, left.schema().types)))
    rs = pa.schema(list(zip(right.schema().names, right.schema().types)))
    overlap = set(ls.names) & set(rs.names)
    if overlap:
        raise ValueError(f"column name collision across join sides: {sorted(overlap)}")
    target = pa.schema(list(ls) + list(rs))
    out_schema = pa.schema(
        list(ls) + [rs.field(c) for c in take_columns if c in rs.names])

    def _tag(side: str, key: str):
        def _f(t: pa.Table) -> pa.Table:
            k = t.column(key)
            if not (pa.types.is_string(k.type) or pa.types.is_large_string(k.type)):
                k = k.cast(pa.string())
            b = (hash_strings(k) % np.uint64(num_buckets)).astype(np.int32)
            t = sch_mod.unify_table(t, target)
            t = t.append_column("__bucket", pa.array(b))
            return t.append_column("__side", pa.array(np.full(t.num_rows, side)))
        return _f

    lt = left.map_batches(_tag("l", by_left), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(_tag("r", by_right), batch_format="pyarrow", zero_copy_batch=True)
    left_cols, right_cols = list(ls.names), list(rs.names)

    def _asof_bucket(g: pa.Table):
        # split in Arrow so each side converts to pandas WITHOUT the other
        # side's all-null padding (null int64 → float64 drift breaks
        # merge_asof's by-key dtype matching when a bucket is one-sided)
        mask = pc.equal(g.column("__side"), "l")
        l = g.filter(mask).select(left_cols).to_pandas()
        r = g.filter(pc.invert(mask)).select(right_cols).to_pandas()
        r = r.sort_values(on_right, kind="mergesort")
        l = l.sort_values(on_left, kind="mergesort")
        r = r[[by_right, on_right] + [c for c in take_columns
                                      if c not in (by_right, on_right)]]
        # merge_asof needs IDENTICAL on-key dtypes; mixed temporal units
        # (timestamp[us] vs date32→[s]) are coerced to a common [us]
        if pd.api.types.is_datetime64_any_dtype(l[on_left]) and \
                pd.api.types.is_datetime64_any_dtype(r[on_right]):
            l = l.assign(**{on_left: l[on_left].astype("datetime64[us]")})
            r = r.assign(**{on_right: r[on_right].astype("datetime64[us]")})
        merged = pd.merge_asof(
            l, r,
            left_on=on_left, right_on=on_right,
            left_by=by_left, right_by=by_right,
        )
        arrays = []
        for f in out_schema:
            col = merged[f.name]
            if pa.types.is_integer(f.type) and str(col.dtype) == "float64":
                arrays.append(pa.array(col.astype("Int64"), type=f.type))
            else:
                arrays.append(pa.Array.from_pandas(col, type=f.type))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    both = lt.union(rt)
    return both.groupby("__bucket").map_groups(_asof_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Windowed/session analysis (streaming-shaped; Ray Data has no event-time
# windows, so sessionization = one sort + vectorized run-boundary folds —
# O(blocks) Python calls, never O(keys)).
# ---------------------------------------------------------------------------


def _ts_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Epoch-microsecond int64 view of a temporal column (s/ms/ns inputs
    bucket identically)."""
    return col.cast(pa.timestamp("us")).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)


def session_counts(
    ds: rd.Dataset, key: str, ts_col: str, gap_seconds: float, alias: str = "n_sessions"
) -> rd.Dataset:
    """Number of sessions per key, a session ending after ``gap_seconds`` of
    inactivity (strict: a new session starts when the gap EXCEEDS it).

    One exchange — a SORT by (key, ts), not a per-group UDF: each sorted
    block counts sessions for every interior key run with one vectorized
    diff + ``reduceat`` pass; only the ≤2 edge runs per block (the ones
    that may continue in a neighboring block) ship their timestamps to a
    grouped merge — O(blocks) Python calls and O(blocks)-sized merge state
    regardless of key cardinality."""
    from . import runfold as rf

    gap_us = gap_seconds * 1_000_000
    key_type = dict(zip(ds.schema().names, ds.schema().types))[key]

    def _fold_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key: pa.array([], key_type),
                             alias: pa.array([], pa.int64()),
                             "__ts": pa.array([], pa.list_(pa.int64())),
                             "__edge": pa.array([], pa.bool_())})
        starts, lengths = rf.run_bounds(t, [key])
        edges = rf.edge_mask(len(starts))
        us = _ts_us(t.column(ts_col))
        new = np.concatenate([[False], np.diff(us) > gap_us])
        new[starts] = False  # run boundaries are key changes, not gaps
        n_sessions = rf.run_sums(new.astype(np.int64), starts) + 1
        return pa.table({
            key: t.column(key).take(pa.array(starts)),
            alias: pa.array(n_sessions, pa.int64(), mask=edges),
            "__ts": rf.edge_values_list(us, starts, lengths, edges,
                                        typ=pa.int64()),
            "__edge": pa.array(edges),
        })

    def _edge_fold(g: pa.Table) -> pa.Table:
        us = np.sort(rf.flat_list_values(g.column("__ts")))
        n = int((np.diff(us) > gap_us).sum()) + 1
        return pa.table({key: g.column(key).slice(0, 1),
                         alias: pa.array([n], pa.int64())})

    return rf.branch_edge_merge(
        ds.select_columns([key, ts_col]).sort([key, ts_col]).map_batches(
            _fold_block, batch_format="pyarrow", batch_size=None),
        [key], [alias], _edge_fold)


def session_ids(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    gap_seconds: float,
    order_cols: list[str] | None = None,
    session_col: str = "session_id",
) -> rd.Dataset:
    """Per-event session assignment (gaps-and-islands): within each key,
    ordered by ``order_cols`` (default ``[ts_col]`` — include a tiebreak
    id for determinism), a new session starts when the gap from the
    previous event EXCEEDS ``gap_seconds``; ``session_col`` is the 1-based
    session ordinal within the key. Timestamps are normalized to
    microseconds before the gap arithmetic (s/ms/ns inputs bucket
    identically).

    Distributed shape (the per-row refinement of :func:`session_counts`):
    one SORT by (key, order_cols), then O(blocks) driver metadata — per
    block (first/last key, first/last ts, session starts in the trailing
    run) — chained into a per-block carry (sessions already started for
    the key continuing across the boundary, and whether the boundary gap
    itself starts one), broadcast back for a vectorized in-block cumsum.
    The driver never sees data rows, and no per-key Python work exists
    anywhere — 10⁶⁺ keys cost the same per row as 10²."""
    import pickle

    order_cols = list(order_cols or [ts_col])
    sort_cols = [key] + [c for c in order_cols if c != key]
    gap_us = gap_seconds * 1_000_000
    sorted_ds = ds.sort(sort_cols).materialize()

    def _first_tuple(t: pa.Table) -> bytes:
        return pickle.dumps(tuple(t.column(c)[0].as_py() for c in sort_cols))

    def _start_flags(t: pa.Table, us: np.ndarray) -> np.ndarray:
        """Provisional per-row new-session flags: row 0 = True (fixed up
        by the driver carry), else key change or gap > gap_us."""
        from vlm_eden_dataset_etl_ray.functions import runfold as rf

        kchg = np.zeros(t.num_rows, dtype=bool)
        kchg[1:] = rf.key_change_array(t.column(key))
        st = np.concatenate([[True], (np.diff(us) > gap_us)]) | kchg
        st[0] = True
        return st

    def _summ(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__first": pa.array([], pa.binary()),
                             "__fk": pa.array([], pa.binary()),
                             "__fts": pa.array([], pa.int64()),
                             "__lk": pa.array([], pa.binary()),
                             "__lts": pa.array([], pa.int64()),
                             "__tail": pa.array([], pa.int64()),
                             "__single": pa.array([], pa.bool_())})
        from vlm_eden_dataset_etl_ray.functions import runfold as rf

        us = _ts_us(t.column(ts_col))
        st = _start_flags(t, us)
        kchg_pos = np.flatnonzero(rf.key_change_array(t.column(key))) + 1
        last_run_start = int(kchg_pos[-1]) if len(kchg_pos) else 0
        return pa.table({
            "__first": pa.array([_first_tuple(t)], pa.binary()),
            "__fk": pa.array([pickle.dumps(t.column(key)[0].as_py())]),
            "__fts": pa.array([int(us[0])], pa.int64()),
            "__lk": pa.array([pickle.dumps(t.column(key)[-1].as_py())]),
            "__lts": pa.array([int(us[-1])], pa.int64()),
            "__tail": pa.array([int(st[last_run_start:].sum())], pa.int64()),
            "__single": pa.array([len(kchg_pos) == 0], pa.bool_()),
        })

    rows = sorted_ds.map_batches(
        _summ, batch_format="pyarrow", batch_size=None).take_all()
    summ = sorted(
        ({"first": r["__first"], "fk": pickle.loads(r["__fk"]),
          "fts": r["__fts"], "lk": pickle.loads(r["__lk"]),
          "lts": r["__lts"], "tail": r["__tail"], "single": r["__single"]}
         for r in rows),
        key=lambda s: (_none_safe(pickle.loads(s["first"])),
                       _none_safe((s["lk"], s["lts"]))))
    carries: dict[bytes, tuple[int, int]] = {}
    pend_key, pend_ts, pend_starts = object(), 0, 0
    for s in summ:
        if s["fk"] == pend_key:
            carry = pend_starts
            st0 = int(s["fts"] - pend_ts > gap_us)
        else:
            carry, st0 = 0, 1
        carries.setdefault(s["first"], (carry, st0))
        if s["single"]:
            pend_starts = carry + s["tail"] - 1 + st0
        else:
            pend_starts = s["tail"]
        pend_key, pend_ts = s["lk"], s["lts"]
    carries_ref = ray.put(carries)

    def _assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(session_col, pa.array([], pa.int64()))
        carry, st0 = ray.get(carries_ref)[_first_tuple(t)]
        us = _ts_us(t.column(ts_col))
        st = _start_flags(t, us).astype(np.int64)
        st[0] = st0
        s = np.cumsum(st)
        # per-key-run cumsum: subtract the running total just before each
        # run's first row; the first run additionally adds the carry
        from vlm_eden_dataset_etl_ray.functions import runfold as rf

        run_starts = np.concatenate(
            [[0], np.flatnonzero(rf.key_change_array(t.column(key))) + 1])
        base_at_start = s[run_starts] - st[run_starts]
        base = np.repeat(base_at_start,
                         np.diff(np.concatenate([run_starts, [t.num_rows]])))
        sid = s - base
        sid[:int(run_starts[1]) if len(run_starts) > 1 else t.num_rows] += carry
        return t.append_column(session_col, pa.array(sid, pa.int64()))

    return sorted_ds.map_batches(_assign, batch_format="pyarrow",
                                 batch_size=None)


def pivot_count(
    ds: rd.Dataset,
    key: str,
    pivot_col: str,
    categories: list[str],
    alias_fmt: str = "n_{}",
) -> rd.Dataset:
    """Pivot-style conditional aggregation: one output row per ``key`` with
    a count column per pivot category (`sum(case when ...)` shape).
    Categories are declared up front so every partial has a fixed schema;
    per-batch partials are wide count vectors, the final combine is a tiny
    per-key Sum — mergeable, so the exchange carries one row per
    (batch, key), never the raw data."""
    import polars as pl
    from ray.data.aggregate import Sum

    aliases = [alias_fmt.format(c.lower().replace(" ", "_").replace("-", "_"))
               for c in categories]
    # normalize to Arrow blocks so the key dtype is known exactly; Ray's
    # sort-shuffle groupby normalizes temporal keys (us→s) — restore below
    ds = ds.map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True)
    key_type = dict(zip(ds.schema().names, ds.schema().types))[key]

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([key, pivot_col]))
        agg = df.group_by(key).agg([
            (pl.col(pivot_col) == c).sum().cast(pl.Int64).alias(a)
            for c, a in zip(categories, aliases)
        ])
        return agg.to_arrow()

    partial = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    out = partial.groupby(key).aggregate(
        *[Sum(a, alias_name=a) for a in aliases])

    def _cast(t: pa.Table) -> pa.Table:
        ki = t.column_names.index(key)
        t = t.set_column(ki, key, t.column(key).cast(key_type))
        for a in aliases:
            i = t.column_names.index(a)
            t = t.set_column(i, a, t.column(a).cast(pa.int64()))
        return t

    return out.map_batches(_cast, batch_format="pyarrow", zero_copy_batch=True)


def distinct_set_op(
    left: rd.Dataset, right: rd.Dataset, op: str,
) -> rd.Dataset:
    """SQL set operations on whole rows: ``op`` ∈ {"intersect", "except"}
    with DISTINCT semantics. Both sides must share column names/types.
    Shape: per-batch distinct partial (rows collapse before the exchange)
    → ONE groupby over all columns → membership decision per group —
    the same tagged-union pattern as the joins, carrying only distinct
    rows plus a 1-byte side tag."""
    if op not in ("intersect", "except"):
        raise ValueError(op)
    cols = list(left.schema().names)

    def _tag(side: int):
        def _f(t: pa.Table) -> pa.Table:
            g = t.group_by(cols).aggregate([])  # local distinct
            return g.append_column("__side", pa.array(
                np.full(g.num_rows, side, dtype=np.int8)))
        return _f

    lt = left.map_batches(_tag(0), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(_tag(1), batch_format="pyarrow", zero_copy_batch=True)

    def _decide(g: pa.Table) -> pa.Table:
        sides = set(g.column("__side").to_pylist())
        keep = ({0, 1} <= sides) if op == "intersect" else (sides == {0})
        return g.slice(0, 1).drop_columns(["__side"]) if keep else \
            g.slice(0, 0).drop_columns(["__side"])

    return lt.union(rt).groupby(cols).map_groups(_decide, batch_format="pyarrow")


def rollup_counts(ds: rd.Dataset, keys: list[str], alias: str = "n") -> rd.Dataset:
    """ROLLUP-style multi-level counts: one output row per group at every
    key-prefix level (finest → … → grand total), dropped keys null-filled.
    The finest level is the only pass over the DATA; every coarser level
    re-aggregates the previous level's (already tiny) counts — the shuffle
    cost decays geometrically with each level."""
    from ray.data.aggregate import Sum

    # normalize to Arrow blocks so the schema carries Arrow types even for
    # pandas-block inputs (from_pandas)
    ds = ds.map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True)
    schema = pa.schema(list(zip(ds.schema().names, ds.schema().types)))
    key_types = {k: schema.field(k).type for k in keys}

    def _with_nulls_and_cast(level_keys: list[str]):
        def _f(t: pa.Table) -> pa.Table:
            for k in keys:
                if k not in level_keys:
                    t = t.append_column(k, pa.nulls(t.num_rows, key_types[k]))
                else:
                    i = t.column_names.index(k)
                    t = t.set_column(i, k, t.column(k).cast(key_types[k]))
            i = t.column_names.index(alias)
            t = t.set_column(i, alias, t.column(alias).cast(pa.int64()))
            return t.select(keys + [alias])
        return _f

    finest = grouped_count(ds, keys, alias)
    levels = [finest.map_batches(_with_nulls_and_cast(keys),
                                 batch_format="pyarrow")]
    cur = finest
    for i in range(len(keys) - 1, 0, -1):
        cur = cur.groupby(keys[:i]).aggregate(Sum(alias, alias_name=alias))
        levels.append(cur.map_batches(_with_nulls_and_cast(keys[:i]),
                                      batch_format="pyarrow"))
    # grand total folds the COARSEST level (one row per first-key value)
    total = cur.map_batches(
        lambda t: pa.table({alias: t.column(alias).cast(pa.int64())}),
        batch_format="pyarrow",
    ).repartition(1).map_batches(
        lambda t: pa.table({alias: pa.array(
            [pc.sum(t.column(alias)).as_py() or 0], pa.int64())}),
        batch_format="pyarrow", batch_size=None,
    ).map_batches(_with_nulls_and_cast([]), batch_format="pyarrow")

    out = levels[0]
    for lv in levels[1:] + [total]:
        out = out.union(lv)
    return out


def grouping_sets_counts(
    ds: rd.Dataset, keys: list[str], sets: list[list[str]], alias: str = "n",
) -> rd.Dataset:
    """GROUPING SETS counts: one output row per group for every requested
    key subset, dropped keys null-filled. Only the FULL key set touches
    the data (one pass + one shuffle); every other set re-aggregates the
    finest level's already-tiny counts — same decay argument as
    :func:`rollup_counts`, generalized to arbitrary subsets (so CUBE =
    the power set). Each ``sets`` entry must be a subset of ``keys``."""
    from ray.data.aggregate import Sum

    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s} not a subset of {keys}")

    ds = ds.map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True)
    schema = pa.schema(list(zip(ds.schema().names, ds.schema().types)))
    key_types = {k: schema.field(k).type for k in keys}

    def _shape(level_keys: list[str]):
        def _f(t: pa.Table) -> pa.Table:
            for k in keys:
                if k not in level_keys:
                    if k in t.column_names:
                        t = t.drop_columns([k])
                    t = t.append_column(k, pa.nulls(t.num_rows, key_types[k]))
                else:
                    i = t.column_names.index(k)
                    t = t.set_column(i, k, t.column(k).cast(key_types[k]))
            i = t.column_names.index(alias)
            t = t.set_column(i, alias, t.column(alias).cast(pa.int64()))
            return t.select(keys + [alias])
        return _f

    finest = grouped_count(ds, keys, alias).materialize()
    levels = []
    for s in sets:
        if list(s) == list(keys) or set(s) == set(keys):
            lv = finest
        elif s:
            lv = finest.groupby(list(s)).aggregate(Sum(alias, alias_name=alias))
        else:
            lv = finest.map_batches(
                lambda t: pa.table({alias: t.column(alias).cast(pa.int64())}),
                batch_format="pyarrow",
            ).repartition(1).map_batches(
                lambda t: pa.table({alias: pa.array(
                    [pc.sum(t.column(alias)).as_py() or 0], pa.int64())}),
                batch_format="pyarrow", batch_size=None)
        levels.append(lv.map_batches(_shape(list(s)), batch_format="pyarrow"))

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def cube_counts(ds: rd.Dataset, keys: list[str], alias: str = "n") -> rd.Dataset:
    """CUBE counts: :func:`grouping_sets_counts` over the power set of
    ``keys`` (finest-first, so only one pass touches the data)."""
    from itertools import combinations

    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_counts(ds, keys, sets, alias)


def with_previous(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    cols: list[str],
    prefix: str = "prev_",
) -> rd.Dataset:
    """lag()-family windowed operator: for each row, attach the PREVIOUS
    row's ``cols`` values within its key partition in ``order_cols`` order
    (null for each partition's first row). One groupby shuffle co-locates
    the key; the in-group sort + shift is vectorized (`take` with offset
    indices). ``order_cols`` should order rows uniquely for determinism."""

    def _per_group(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[(c, "ascending") for c in order_cols])
        g = g.take(idx)
        n = g.num_rows
        prev_idx = pa.array(
            np.arange(-1, n - 1), type=pa.int64(), mask=np.arange(n) == 0)
        for c in cols:
            g = g.append_column(prefix + c, g.column(c).take(prev_idx))
        return g

    return ds.groupby(key).map_groups(_per_group, batch_format="pyarrow")


def running_sum(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    alias: str = "running",
) -> rd.Dataset:
    """Cumulative windowed aggregate: per-key running sum of ``value_col``
    in ``order_cols`` order (the `sum(...) over (partition by key order by
    ...)` shape). One groupby shuffle co-locates each key; the in-group
    sort + cumsum is vectorized. Make ``order_cols`` a unique ordering
    (include a tiebreak id) for a deterministic result. Integer values sum
    exactly; float callers should pre-scale to ints for oracle-exactness."""

    def _per_group(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[(c, "ascending") for c in order_cols])
        g = g.take(idx)
        vals = g.column(value_col).to_numpy(zero_copy_only=False)
        return g.append_column(alias, pa.array(np.cumsum(vals)))

    return ds.groupby(key).map_groups(_per_group, batch_format="pyarrow")


def with_next(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    cols: list[str],
    prefix: str = "next_",
) -> rd.Dataset:
    """lead()-family windowed operator: for each row, attach the NEXT row's
    ``cols`` values within its key partition in ``order_cols`` order (null
    for each partition's last row). Mirror of :func:`with_previous` — same
    one-shuffle shape, vectorized shift."""

    def _per_group(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[(c, "ascending") for c in order_cols])
        g = g.take(idx)
        n = g.num_rows
        nxt_idx = pa.array(
            np.arange(1, n + 1), type=pa.int64(),
            mask=np.arange(n) == n - 1)
        for c in cols:
            g = g.append_column(prefix + c, g.column(c).take(nxt_idx))
        return g

    return ds.groupby(key).map_groups(_per_group, batch_format="pyarrow")


def running_agg(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    value_col: str | None,
    agg: str = "sum",
    alias: str = "running",
) -> rd.Dataset:
    """Cumulative windowed aggregate over a key partition: the
    ``agg(value) OVER (PARTITION BY key ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING)`` family for ``agg`` ∈ {sum, min, max, count, avg}.
    ``value_col=None`` with ``agg="count"`` is ``count(*)``. SQL null
    semantics: nulls are skipped (don't advance sum/min/max/avg, don't
    count), and the running value is null until the first non-null.
    One groupby shuffle; in-group sort + ``np.*.accumulate`` — no Python
    per-row work. Give ``order_cols`` a unique ordering (tiebreak id) so
    the ROWS frame is deterministic and equals the SQL RANGE default."""
    if agg not in ("sum", "min", "max", "count", "avg"):
        raise ValueError(f"unsupported running agg {agg!r}")
    if value_col is None and agg != "count":
        raise ValueError("value_col is required except for count(*)")
    return keyed_window_agg(ds, key, order_cols, [(agg, value_col, alias)])


def _running_array(col: pa.ChunkedArray | pa.Array, agg: str) -> pa.Array:
    """Vectorized cumulative ``agg`` of one sorted column with SQL null
    semantics (shared by :func:`running_agg` / :func:`keyed_window_agg`).
    The output type depends ONLY on (agg, column type) — never on this
    group's data — so every group of a map_groups emits the same schema:
    count→int64, avg→float64, sum→int64 for integer inputs else float64,
    min/max→the input type."""
    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    cnt = np.cumsum(valid.astype(np.int64))
    if agg == "count":
        return pa.array(cnt)
    never = cnt == 0                           # before the first non-null
    mask = never if never.any() else None
    col_t = col.type
    if pa.types.is_integer(col_t) and agg in ("sum", "min", "max"):
        # exact integer path (nulls filled with the identity element in
        # int64 domain; positions before the first non-null are masked)
        ident = {"sum": 0, "min": np.iinfo(np.int64).max,
                 "max": np.iinfo(np.int64).min}[agg]
        iv = pc.fill_null(pc.cast(col, pa.int64()), int(ident)) \
            .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        if agg == "sum":
            out = np.cumsum(iv)
        elif agg == "min":
            out = np.minimum.accumulate(iv)
        else:
            out = np.maximum.accumulate(iv)
        if mask is not None:
            out = out.copy()
            out[never] = 0                     # keep masked slots castable
        arr = pa.array(out, mask=mask)
        return arr if agg == "sum" else arr.cast(col_t)
    vals = col.to_numpy(zero_copy_only=False)
    if vals.dtype.kind not in "iuf":
        vals = np.asarray(
            [0 if v is None else v for v in vals], dtype=np.float64)
    f = vals.astype(np.float64, copy=False)
    if agg == "sum":
        out = np.cumsum(np.where(valid, f, 0.0))
    elif agg == "avg":
        out = np.cumsum(np.where(valid, f, 0.0)) / np.maximum(cnt, 1)
    elif agg == "min":
        out = np.minimum.accumulate(np.where(valid, f, np.inf))
    elif agg == "max":
        out = np.maximum.accumulate(np.where(valid, f, -np.inf))
    else:
        raise ValueError(f"unsupported running agg {agg!r}")
    arr = pa.array(np.where(never, np.nan, out), mask=mask)
    if agg in ("min", "max") and pa.types.is_floating(col_t):
        arr = arr.cast(col_t)
    return arr


def keyed_window_agg(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    specs: list[tuple],
    descending: bool | list[bool] = False,
) -> rd.Dataset:
    """Fused per-key windowed family: compute EVERY ``(agg, value_col,
    alias)`` in ``specs`` — agg ∈ {sum, min, max, count, avg, lag, lead,
    first_value} — in ONE groupby shuffle + one in-group sort, instead of
    one exchange per window call. ``value_col=None`` + "count" is
    ``count(*)``; lag/lead accept an optional 4th element, the shift
    offset (default 1); ``descending`` flips the in-group order (per
    column when a list). At 100 TB this is the difference between k
    all-to-all exchanges and one for a SELECT with k windows over the
    same PARTITION BY / ORDER BY."""
    desc = [descending] * len(order_cols) if isinstance(descending, bool) \
        else list(descending)
    sort_keys = [(c, "descending" if d else "ascending")
                 for c, d in zip(order_cols, desc)]

    def _per_group(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=sort_keys)
        g = g.take(idx)
        n = g.num_rows
        ar = np.arange(n)
        for spec in specs:
            agg, vcol, alias = spec[0], spec[1], spec[2]
            if agg in ("lag", "lead"):
                off = int(spec[3]) if len(spec) > 3 else 1
                if agg == "lag":
                    tk = pa.array(ar - off, type=pa.int64(), mask=ar < off)
                else:
                    tk = pa.array(ar + off, type=pa.int64(),
                                  mask=ar >= n - off)
                g = g.append_column(alias, g.column(vcol).take(tk))
            elif agg == "first_value":
                g = g.append_column(
                    alias,
                    g.column(vcol).take(pa.array(np.zeros(n, np.int64))))
            elif agg == "count" and vcol is None:
                g = g.append_column(
                    alias, pa.array(np.arange(1, n + 1, dtype=np.int64)))
            else:
                g = g.append_column(alias, _running_array(g.column(vcol), agg))
        return g

    return ds.groupby(key).map_groups(_per_group, batch_format="pyarrow")


def keyed_first_value(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    alias: str = "first_value",
) -> rd.Dataset:
    """``first_value(value) OVER (PARTITION BY key ORDER BY order_cols)``:
    every row of a partition carries the partition's first value in order
    (the SQL default frame starts at UNBOUNDED PRECEDING, so the frame end
    never matters for first_value). Same one-shuffle per-key shape."""

    def _per_group(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[(c, "ascending") for c in order_cols])
        g = g.take(idx)
        first = pa.array(
            np.zeros(g.num_rows, dtype=np.int64))
        return g.append_column(alias, g.column(value_col).take(first))

    return ds.groupby(key).map_groups(_per_group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Ordered string aggregation: string_agg(value, sep ORDER BY order_cols).
# ---------------------------------------------------------------------------


def string_agg_ordered(
    ds: rd.Dataset,
    key: str,
    value: str,
    order_by: list[tuple[str, str]],
    alias: str,
    sep: str = ",",
    limit: int | None = None,
) -> rd.Dataset:
    """Per-key ordered concatenation — ``string_agg(value, sep ORDER BY
    ...)``. Unlike :func:`string_agg_distinct` (set semantics, value-sorted)
    this preserves the caller's ordering, so the fold needs the rows
    co-located: when ``limit`` is set, a per-batch partial top-k bounds what
    shuffles (≤limit rows per key per batch); otherwise all key rows move —
    the honest cost of an order-dependent aggregate. The in-group sort +
    join is vectorized (arrow take + polars list join).
    """
    import polars as pl

    cols = [key, value] + [c for c, _ in order_by
                           if c not in (key, value)]
    src = ds.select_columns(cols)
    if limit is not None:
        src = ds.select_columns(cols).map_batches(
            _topk_reduce,
            fn_kwargs={"key": key, "order_by": order_by, "k": limit},
            batch_format="pyarrow", zero_copy_batch=True,
        )

    def _fold(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=order_by)
        g = g.take(idx)
        if limit is not None:
            g = g.slice(0, limit)
        vals = g.column(value).cast(pa.string())
        joined = pl.from_arrow(vals.combine_chunks()).str.join(sep).to_arrow()
        return pa.table({key: g.column(key).slice(0, 1),
                         alias: joined.cast(pa.string())})

    return src.groupby(key).map_groups(_fold, batch_format="pyarrow")


def zscore_normalize(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    alias: str = "zscore",
    bytes_hint: int | None = None,
) -> rd.Dataset:
    """Per-group z-score standardization ((v − mean_g)/stddev_pop_g, the
    feature-normalization step before numeric columns feed a model),
    rounded to 4 decimals to absorb summation-order float noise vs a SQL
    window twin. A constant group (stddev 0) yields null, matching
    ``nullif(stddev_pop(...), 0)``.

    Scale shape: TWO passes of mergeable partials (means, then centered
    squares) — the centered second pass is what keeps the variance
    numerically exact when |mean| >> stddev, where the one-pass
    ``E[x²]−mean²`` shortcut cancels catastrophically and silently nulls
    out non-constant groups. Each pass collapses the payload to one stats
    row per group before any exchange; stats join back through the
    :func:`auto_join` planner (broadcast while group count is small,
    partitioned hash join when it is not)."""

    def _v(t: pa.Table) -> pa.Table:
        return pa.table({key: t.column(key),
                         "__v": t.column(value_col).cast(pa.float64())})

    means = grouped_agg(
        ds.map_batches(_v, batch_format="pyarrow", zero_copy_batch=True),
        [key], sums={"__v": "__s"}, counts="__n", cardinality="high",
    )
    with_mean = auto_join(ds, means, key, key, bytes_hint=bytes_hint)

    def _centered_sq(t: pa.Table) -> pa.Table:
        v = t.column(value_col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        s = t.column("__s").to_numpy(zero_copy_only=False)
        n = t.column("__n").to_numpy(zero_copy_only=False).astype(np.float64)
        d = v - s / n
        return pa.table({key: t.column(key),
                         "__d2": pa.array(d * d, pa.float64())})

    var = grouped_agg(
        with_mean.map_batches(_centered_sq, batch_format="pyarrow",
                              zero_copy_batch=True),
        [key], sums={"__d2": "__ss"}, cardinality="high",
    )
    joined = auto_join(with_mean, var, key, key, bytes_hint=bytes_hint)

    def _z(t: pa.Table) -> pa.Table:
        v = t.column(value_col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        s = t.column("__s").to_numpy(zero_copy_only=False)
        ss = t.column("__ss").to_numpy(zero_copy_only=False)
        n = t.column("__n").to_numpy(zero_copy_only=False).astype(np.float64)
        mean = s / n
        std = np.sqrt(ss / n)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.round((v - mean) / std, 4)
        out = t.drop_columns(["__s", "__ss", "__n"])
        return out.append_column(
            alias, pa.array(np.where(std == 0, np.nan, z), pa.float64(),
                            mask=(std == 0)))

    return joined.map_batches(_z, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_cross_join(
    ds: rd.Dataset,
    right: pa.Table,
    max_right_rows: int = 65_536,
) -> rd.Dataset:
    """CROSS JOIN with a small broadcast side (scaffold joins: calendar ×
    categories, parameter grids). The right table ships once via
    ``ray.put``; each left batch expands vectorized (repeat/tile index
    takes, no Python row loop). Output volume is |left| × |right| — the
    ``max_right_rows`` cap keeps the expansion factor explicit, and column
    name collisions raise rather than silently overwrite."""
    right = right.combine_chunks()
    if right.num_rows > max_right_rows:
        raise ValueError(
            f"cross-join right side has {right.num_rows} rows > "
            f"max_right_rows={max_right_rows}; a large×large cross join "
            "is almost always a bug — use hash_join on a key")
    ref = ray.put(right)

    def _cross(t: pa.Table) -> pa.Table:
        r = ray.get(ref)
        clash = set(t.column_names) & set(r.column_names)
        if clash:
            raise ValueError(f"cross-join column collision: {sorted(clash)}")
        n, m = t.num_rows, r.num_rows
        lt = t.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), m)))
        rt = r.take(pa.array(np.tile(np.arange(m, dtype=np.int64), n)))
        out = lt
        for c in rt.column_names:
            out = out.append_column(c, rt.column(c))
        return out

    return ds.map_batches(_cross, batch_format="pyarrow",
                          zero_copy_batch=True)
