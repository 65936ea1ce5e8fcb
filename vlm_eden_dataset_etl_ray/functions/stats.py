"""Statistical aggregates and profiling operators.

Reference parity: the reference's reporting views compute grouped averages
and counts in SQL (e.g. queries/fact_studies.py aggregates); this module
carries the *statistical* aggregate family a training-data pipeline needs on
top of that — streaming variance/covariance/correlation, mode, entropy,
share-of-total, range-frame moving averages, and a whole-table profiler.

Every aggregate here is expressed as a MERGEABLE per-batch partial followed
by one combine, so nothing materializes the input and group count — not row
count — bounds the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .relational import _single_block, grouped_count, top1_per_key

# ---------------------------------------------------------------------------
# Grouped moments: var/stddev (sample), covariance, Pearson correlation.
# ---------------------------------------------------------------------------


def grouped_moments(
    ds: rd.Dataset,
    keys: list[str],
    x: str,
    y: str | None = None,
    cardinality: str = "low",
) -> rd.Dataset:
    """Grouped second-moment statistics: ``n, mean_x, var_x, std_x`` (sample
    variance / stddev) and, when ``y`` is given, ``covar_xy, corr_xy``
    (sample covariance / Pearson correlation).

    Shape: one pass computes per-batch raw-moment partials (n, Σx, Σx²
    [, Σy, Σy², Σxy]) — six doubles per (batch, group) — which combine by
    plain addition, then a tiny final derives the statistics. ``cardinality``
    follows :func:`grouped_count`: "low" tree-reduces partials in one task
    (reporting-grade key spaces), "high" shuffles via groupby. Raw moments
    trade a little precision for mergeability; callers comparing against SQL
    engines should round (4 decimals is safely inside double error for
    TPC-H-magnitude data).
    """
    cols = [x] + ([y] if y else [])

    def _partial(t: pa.Table) -> pa.Table:
        xt = t.column(x).to_numpy(zero_copy_only=False).astype(np.float64)
        data = {"__x": xt, "__x2": xt * xt}
        if y:
            yt = t.column(y).to_numpy(zero_copy_only=False).astype(np.float64)
            data.update({"__y": yt, "__y2": yt * yt, "__xy": xt * yt})
        g = (
            pa.table({**{k: t.column(k) for k in keys}, **data})
            .group_by(keys)
            .aggregate([(c, "sum") for c in data] + [([], "count_all")])
        )
        return g.rename_columns(keys + [f"__s{c}" for c in data] + ["__n"])

    moment_cols = ["__s__x", "__s__x2"] + (["__s__y", "__s__y2", "__s__xy"] if y else [])

    def _combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(
            [(c, "sum") for c in moment_cols] + [("__n", "sum")]
        )
        g = g.rename_columns(keys + moment_cols + ["__n"])
        n = g.column("__n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = g.column("__s__x").to_numpy(zero_copy_only=False)
        sx2 = g.column("__s__x2").to_numpy(zero_copy_only=False)
        mean = sx / n
        with np.errstate(invalid="ignore", divide="ignore"):
            var = np.where(n > 1, (sx2 - sx * sx / n) / (n - 1), np.nan)
            var = np.maximum(var, 0.0)  # clamp negative float residue
            std = np.sqrt(var)
        out = {k: g.column(k) for k in keys}
        out["n"] = pa.array(n.astype(np.int64), pa.int64())
        out["mean_x"] = pa.array(mean, pa.float64())
        out["var_x"] = pa.array(var, pa.float64())
        out["std_x"] = pa.array(std, pa.float64())
        if y:
            sy = g.column("__s__y").to_numpy(zero_copy_only=False)
            sy2 = g.column("__s__y2").to_numpy(zero_copy_only=False)
            sxy = g.column("__s__xy").to_numpy(zero_copy_only=False)
            with np.errstate(invalid="ignore", divide="ignore"):
                cov = np.where(n > 1, (sxy - sx * sy / n) / (n - 1), np.nan)
                vary = np.where(n > 1, (sy2 - sy * sy / n) / (n - 1), np.nan)
                corr = cov / np.sqrt(var * np.maximum(vary, 0.0))
            out["covar_xy"] = pa.array(cov, pa.float64())
            out["corr_xy"] = pa.array(corr, pa.float64())
        return pa.table(out)

    partial = ds.select_columns(keys + cols).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    if cardinality == "low":
        return _single_block(partial).map_batches(
            _combine, batch_format="pyarrow", batch_size=None
        )
    # high-cardinality: shuffle-combine the partials, then derive per block
    from ray.data.aggregate import Sum

    agg = partial.groupby(keys).aggregate(
        *[Sum(c, alias_name=c) for c in moment_cols + ["__n"]]
    )
    return agg.map_batches(
        lambda t: _combine(t), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Mode (most frequent value) per key, deterministic tie-break.
# ---------------------------------------------------------------------------


def mode_per_key(
    ds: rd.Dataset,
    key: str,
    value: str,
    alias: str = "mode_value",
    count_alias: str = "mode_n",
    cardinality: str = "high",
) -> rd.Dataset:
    """Most frequent ``value`` per ``key`` (SQL ``mode()``), ties broken by
    the smallest value for determinism. Two composed shuffles, both on
    collapsed data: grouped counts over (key, value) — per-batch partials,
    so a hot pair leaves each batch once — then top-1 per key ordered by
    (count desc, value asc). Nothing wider than the distinct pair set moves.
    """
    counts = grouped_count(ds, [key, value], alias="__n", cardinality=cardinality)
    best = top1_per_key(
        ds=counts,
        key=key,
        order_by=[("__n", "descending"), (value, "ascending")],
        cardinality=cardinality,
    )

    def _shape(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t.column(key),
            alias: t.column(value),
            count_alias: t.column("__n").cast(pa.int64()),
        })

    return best.map_batches(_shape, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Shannon entropy of a value distribution per key (DuckDB entropy(): log2).
# ---------------------------------------------------------------------------


def grouped_entropy(
    ds: rd.Dataset,
    keys: list[str],
    value: str,
    alias: str = "entropy",
    cardinality: str = "low",
) -> rd.Dataset:
    """Shannon entropy (bits, log2 — SQL ``entropy()``) of the ``value``
    distribution within each key group. One pass collapses the data to
    distinct (keys, value) counts via mergeable partials; the entropy fold
    then runs over that tiny table grouped by ``keys``.
    """
    counts = grouped_count(ds, keys + [value], alias="__n", cardinality=cardinality)

    def _fold(g: pa.Table) -> pa.Table:
        n = g.column("__n").to_numpy(zero_copy_only=False).astype(np.float64)
        p = n / n.sum()
        h = float(-(p * np.log2(p)).sum())
        out = {k: g.column(k).slice(0, 1) for k in keys}
        out[alias] = pa.array([h], pa.float64())
        return pa.table(out)

    return counts.groupby(keys[0] if len(keys) == 1 else keys).map_groups(
        _fold, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Ratio-to-report: share of each group in the grand total.
# ---------------------------------------------------------------------------


def with_share_of_total(
    ds: rd.Dataset,
    value_col: str,
    alias: str = "share",
) -> rd.Dataset:
    """Append ``value / sum(value) over ()`` to an (already aggregated,
    reporting-grade) dataset. The input is a post-aggregate result — group
    count rows, not data rows — so a single-block fold is the honest plan;
    do NOT point this at raw data (aggregate first).
    """

    def _fold(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column(alias, pa.array(v / v.sum(), pa.float64()))

    return _single_block(ds).map_batches(
        _fold, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# Range-frame moving aggregate (SQL RANGE BETWEEN ... PRECEDING AND CURRENT
# ROW) — peers of the current row are IN the frame, per SQL range semantics.
# ---------------------------------------------------------------------------


def moving_avg_range(
    ds: rd.Dataset,
    key: str,
    order_col: str,
    value_col: str,
    window: int,
    alias: str | None = "moving_avg",
    sum_alias: str | None = None,
    count_alias: str | None = None,
) -> rd.Dataset:
    """Per-key moving average over a RANGE frame: for each row, the mean of
    ``value_col`` across all rows of the same key whose ``order_col`` lies
    in ``[cur - window, cur]`` — including the current row's order-value
    peers, matching SQL ``RANGE BETWEEN window PRECEDING AND CURRENT ROW``.

    ``window`` is expressed in the order column's PHYSICAL integer unit
    (days for date32, the timestamp's unit otherwise). One groupby shuffle
    co-locates each key; inside the group a prefix sum + two binary searches
    per row make the fold O(n log n), vectorized — no per-row Python loop.

    ``sum_alias``/``count_alias`` additionally emit the frame's sum and row
    count; with an integer ``value_col`` the sum is computed exactly in
    int64 (the oracle-stable path — a float average can land exactly on a
    rounding tie, where engines legitimately differ by one ULP).
    """

    def _per_group(g: pa.Table) -> pa.Table:
        order_arr = g.column(order_col)
        if pa.types.is_date32(order_arr.type):
            ints = order_arr.cast(pa.int32()).cast(pa.int64())
        else:
            ints = order_arr.cast(pa.int64())
        o = ints.to_numpy(zero_copy_only=False)
        idx = np.argsort(o, kind="stable")
        g = g.take(pa.array(idx))
        o = o[idx]
        v = g.column(value_col).to_numpy(zero_copy_only=False)
        exact_int = np.issubdtype(v.dtype, np.integer)
        acc = v if exact_int else v.astype(np.float64)
        prefix = np.concatenate([
            np.zeros(1, dtype=np.int64 if exact_int else np.float64),
            np.cumsum(acc),
        ])
        lo = np.searchsorted(o, o - window, side="left")
        hi = np.searchsorted(o, o, side="right")  # include peers
        cnt = hi - lo
        wsum = prefix[hi] - prefix[lo]
        if alias is not None:
            avg = wsum.astype(np.float64) / cnt
            g = g.append_column(alias, pa.array(avg, pa.float64()))
        if sum_alias is not None:
            g = g.append_column(
                sum_alias,
                pa.array(wsum, pa.int64() if exact_int else pa.float64()))
        if count_alias is not None:
            g = g.append_column(count_alias,
                                pa.array(cnt.astype(np.int64), pa.int64()))
        return g

    return ds.groupby(key).map_groups(_per_group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Grouped interpolated quantiles (SQL percentile_cont / quantile_cont).
# ---------------------------------------------------------------------------


def grouped_quantiles(
    ds: rd.Dataset,
    keys: list[str],
    value: str,
    qs: list[float],
    aliases: list[str] | None = None,
) -> rd.Dataset:
    """Exact interpolated quantiles per group (``percentile_cont`` — linear
    interpolation, numpy's and DuckDB's shared formula). Quantiles are not
    mergeable, so this is the honest one-shuffle plan: groupby co-locates
    each key, the in-group fold is a vectorized sort + ``np.quantile``.
    Use the sketch path (:mod:`.sketches` centroid quantiles) when groups
    outgrow a worker.
    """
    aliases = aliases or [f"q{int(q * 100)}" for q in qs]
    if len(aliases) != len(qs):
        raise ValueError("aliases must parallel qs")

    def _fold(g: pa.Table) -> pa.Table:
        v = np.sort(g.column(value).to_numpy(zero_copy_only=False)
                    .astype(np.float64))
        out = {k: g.column(k).slice(0, 1) for k in keys}
        quants = np.quantile(v, qs)
        for a, qv in zip(aliases, quants):
            out[a] = pa.array([float(qv)], pa.float64())
        return pa.table(out)

    return ds.select_columns(keys + [value]).groupby(
        keys[0] if len(keys) == 1 else keys
    ).map_groups(_fold, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Robust dispersion: median absolute deviation + outlier count per group.
# ---------------------------------------------------------------------------


def grouped_mad(
    ds: rd.Dataset,
    keys: list[str],
    value: str,
    z: float = 3.0,
    ndigits: int = 4,
) -> rd.Dataset:
    """Per-group robust dispersion: exact median, MAD
    (``median(abs(v - median))``), and the count of robust outliers —
    rows with ``abs(v - median) > z * 1.4826 * MAD`` (1.4826 scales MAD
    to the stddev of a normal). The training-data QC primitive for
    flagging corrupt numeric features that a mean/stddev z-score misses
    when the corruption itself inflates the stddev.

    Shape: one groupby shuffle co-locates each key; the in-group fold is
    two vectorized ``np.median`` passes plus one comparison — no second
    exchange for the deviation median because the group is already in
    hand. Medians are not mergeable, so this is the honest one-shuffle
    plan (group size, not row count, bounds a worker); use the centroid
    quantile sketch when groups outgrow a worker.
    """
    scale = z * 1.4826

    def _fold(g: pa.Table) -> pa.Table:
        v = g.column(value).to_numpy(zero_copy_only=False).astype(np.float64)
        med = float(np.median(v))
        dev = np.abs(v - med)
        mad = float(np.median(dev))
        n_out = int((dev > scale * mad).sum())
        out = {k: g.column(k).slice(0, 1) for k in keys}
        out["med"] = pa.array([round(med, ndigits)], pa.float64())
        out["mad"] = pa.array([round(mad, ndigits)], pa.float64())
        out["n_outliers"] = pa.array([n_out], pa.int64())
        return pa.table(out)

    return ds.select_columns(keys + [value]).groupby(
        keys[0] if len(keys) == 1 else keys
    ).map_groups(_fold, batch_format="pyarrow")


def grouped_trend(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    value: str,
    ndigits: int = 6,
) -> rd.Dataset:
    """Per-key linear trend: least-squares slope and intercept of ``value``
    against the row's 1-based CHRONOLOGICAL RANK within the key (``x =
    row_number() over (partition by key order by ...)``) — the drift
    detector for a metric series ("is this user's value trending up?").
    Regressing on rank rather than raw epoch keeps x small, so the
    centered-moment formula below is numerically exact where raw-moment
    sums over epoch-microsecond x would cancel catastrophically.

    One groupby shuffle; the in-group fold is the closed form
    ``slope = Σ(x−x̄)(y−ȳ) / Σ(x−x̄)²`` — vectorized, stable, matching
    SQL ``regr_slope``/``regr_intercept``. A single-row group (zero x
    variance) yields null slope/intercept, matching SQL."""

    def _fold(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(c, "ascending") for c in order_cols])
        y = g.take(idx).column(value).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = len(y)
        x = np.arange(1, n + 1, dtype=np.float64)
        if n < 2:
            slope = intercept = None
        else:
            xc = x - x.mean()
            yc = y - y.mean()
            slope = float(np.dot(xc, yc) / np.dot(xc, xc))
            intercept = float(y.mean() - slope * x.mean())
            slope = round(slope, ndigits)
            intercept = round(intercept, ndigits)
        return pa.table({
            key: g.column(key).slice(0, 1),
            "n": pa.array([n], pa.int64()),
            "slope": pa.array([slope], pa.float64()),
            "intercept": pa.array([intercept], pa.float64()),
        })

    return ds.select_columns(
        [key, value] + [c for c in order_cols if c not in (key, value)]
    ).groupby(key).map_groups(_fold, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Table profiler: per-column nulls / exact distinct / min / max.
# ---------------------------------------------------------------------------


def profile_columns(ds: rd.Dataset, cols: list[str]) -> pa.Table:
    """ANALYZE-style column profile: for each named column, its null count,
    exact distinct count (nulls excluded, SQL count(distinct) semantics) and
    min/max rendered as strings (int/date/string columns render identically
    across engines; avoid floats here).

    Scale shape — exactly TWO dataset executions regardless of column count:
    (1) one shuffle-free pass folding per-batch (nulls, typed min, typed max)
    partials for every column at once (min/max stay in the column's original
    type through the combine — string-typed partials would compare
    lexicographically, '9377' beating '14999'); (2) one tall shuffle for all
    exact distinct counts: per-batch local distincts per column emit
    (column, value-as-string) pairs — already collapsed to batch-distinct —
    then a global distinct + per-column count. String rendering is 1:1 for
    the supported types, so it preserves distinctness. Output is a tiny
    driver-side table (one row per profiled column).
    """

    def _fmt(v) -> str | None:
        return None if v is None else str(v)

    src = ds.select_columns(cols)

    def _partial(t: pa.Table) -> pa.Table:
        out: dict[str, object] = {}
        for c in cols:
            arr = t.column(c)
            typ = t.schema.field(c).type
            out[f"__nulls_{c}"] = pa.array([arr.null_count], pa.int64())
            out[f"__min_{c}"] = pa.array([pc.min(arr).as_py()], typ)
            out[f"__max_{c}"] = pa.array([pc.max(arr).as_py()], typ)
        return pa.table(out)

    def _combine(t: pa.Table) -> pa.Table:
        out: dict[str, object] = {}
        for c in cols:
            out[f"__nulls_{c}"] = pa.array(
                [pc.sum(t.column(f"__nulls_{c}")).as_py() or 0], pa.int64())
            for agg, fn in (("min", pc.min), ("max", pc.max)):
                col = t.column(f"__{agg}_{c}")
                out[f"__{agg}_{c}"] = pa.array([fn(col).as_py()], col.type)
        return pa.table(out)

    folded = list(
        _single_block(
            src.map_batches(_partial, batch_format="pyarrow",
                            zero_copy_batch=True))
        .map_batches(_combine, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )[0]

    def _tall_distinct(t: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            vals = t.column(c).combine_chunks()
            uniq = pc.drop_null(vals.unique()).cast(pa.string())
            parts.append(pa.table({
                "column": pa.array([c] * len(uniq), pa.string()),
                "v": uniq,
            }))
        return pa.concat_tables(parts)

    pairs = src.map_batches(_tall_distinct, batch_format="pyarrow",
                            zero_copy_batch=True)
    # global distinct via groupby + slice-1 map_groups: measured ~2x faster
    # than the Count() native aggregate on this Ray version (the slice is a
    # zero-copy C call per group, so group count is not the bottleneck).
    uniq_pairs = pairs.groupby(["column", "v"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")
    distinct_counts = {
        r["column"]: r["nd"]
        for r in grouped_count(
            uniq_pairs.select_columns(["column"]), ["column"], alias="nd",
        ).iter_rows()
    }

    rows = [{
        "column": c,
        "n_nulls": folded.column(f"__nulls_{c}")[0].as_py(),
        "n_distinct": int(distinct_counts.get(c, 0)),
        "min_str": _fmt(folded.column(f"__min_{c}")[0].as_py()),
        "max_str": _fmt(folded.column(f"__max_{c}")[0].as_py()),
    } for c in cols]

    return pa.table({
        "column": pa.array([r["column"] for r in rows], pa.string()),
        "n_nulls": pa.array([r["n_nulls"] for r in rows], pa.int64()),
        "n_distinct": pa.array([r["n_distinct"] for r in rows], pa.int64()),
        "min_str": pa.array([r["min_str"] for r in rows], pa.string()),
        "max_str": pa.array([r["max_str"] for r in rows], pa.string()),
    })
