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
    then runs over that collapsed table — as a sort + vectorized
    run-boundary fold (O(blocks) Python calls), not a per-group UDF, so
    10⁶⁺ distinct keys cost no more per row than 10².
    """
    from . import runfold as rf

    counts = grouped_count(ds, keys + [value], alias="__n", cardinality=cardinality)
    key_types = {k: t for k, t in zip(ds.schema().names, ds.schema().types)
                 if k in keys}

    def _entropy(n: np.ndarray, starts, lengths) -> np.ndarray:
        rid = rf.run_ids(lengths)
        tot = rf.run_sums(n, starts)
        p = n / tot[rid]
        return -rf.run_sums(p * np.log2(p), starts)

    def _fold_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], key_types[k]) for k in keys},
                 alias: pa.array([], pa.float64()),
                 "__ns": pa.array([], pa.list_(pa.float64())),
                 "__edge": pa.array([], pa.bool_())})
        starts, lengths = rf.run_bounds(t, keys)
        edges = rf.edge_mask(len(starts))
        n = t.column("__n").to_numpy(zero_copy_only=False).astype(np.float64)
        cols = {k: t.column(k).take(pa.array(starts)) for k in keys}
        cols[alias] = pa.array(_entropy(n, starts, lengths), pa.float64(),
                               mask=edges)
        cols["__ns"] = rf.edge_values_list(n, starts, lengths, edges)
        cols["__edge"] = pa.array(edges)
        return pa.table(cols)

    def _edge_fold(g: pa.Table) -> pa.Table:
        n = rf.flat_list_values(g.column("__ns"))
        h = _entropy(n, np.zeros(1, np.int64),
                     np.array([len(n)], np.int64))
        out = {k: g.column(k).slice(0, 1) for k in keys}
        out[alias] = pa.array([float(h[0])], pa.float64())
        return pa.table(out)

    return rf.branch_edge_merge(
        counts.sort(keys).map_batches(
            _fold_block, batch_format="pyarrow", batch_size=None),
        keys, [alias], _edge_fold)


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
    mergeable, so one exchange is honest — but it is a SORT by (keys,
    value), not a per-group UDF: each sorted block finalizes every interior
    key run with one vectorized :func:`~.runfold.run_quantile` call
    (bit-exact with ``np.quantile``), and only the ≤2 edge runs per block
    route through a grouped fold — O(blocks) Python calls total, so 10⁶⁺
    distinct keys cost the same per row as 10². Use the sketch path
    (:mod:`.sketches` centroid quantiles) when single groups outgrow a
    worker.
    """
    from . import runfold as rf

    aliases = aliases or [f"q{int(q * 100)}" for q in qs]
    if len(aliases) != len(qs):
        raise ValueError("aliases must parallel qs")
    key_types = {k: t for k, t in zip(ds.schema().names, ds.schema().types)
                 if k in keys}

    def _fold_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], key_types[k]) for k in keys},
                 **{a: pa.array([], pa.float64()) for a in aliases},
                 "__vals": pa.array([], pa.list_(pa.float64())),
                 "__edge": pa.array([], pa.bool_())})
        starts, lengths = rf.run_bounds(t, keys)
        edges = rf.edge_mask(len(starts))
        v = t.column(value).to_numpy(zero_copy_only=False).astype(np.float64)
        take = pa.array(starts)
        cols = {k: t.column(k).take(take) for k in keys}
        for a, q in zip(aliases, qs):
            cols[a] = pa.array(rf.run_quantile(v, starts, lengths, q),
                               pa.float64(), mask=edges)
        cols["__vals"] = rf.edge_values_list(v, starts, lengths, edges)
        cols["__edge"] = pa.array(edges)
        return pa.table(cols)

    def _edge_fold(g: pa.Table) -> pa.Table:
        v = np.sort(rf.flat_list_values(g.column("__vals")))
        out = {k: g.column(k).slice(0, 1) for k in keys}
        for a, qv in zip(aliases, np.quantile(v, qs)):
            out[a] = pa.array([float(qv)], pa.float64())
        return pa.table(out)

    parts = ds.select_columns(keys + [value]) \
        .sort(keys + [value]) \
        .map_batches(_fold_block, batch_format="pyarrow", batch_size=None)
    return rf.branch_edge_merge(parts, keys, aliases, _edge_fold)


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

    Shape: one exchange — a SORT by (keys, value), not a per-group UDF.
    Each sorted block finalizes every interior key run vectorized: the
    median is :func:`~.runfold.run_quantile` over the already-sorted run,
    the deviation median re-sorts deviations within runs with ONE
    ``np.lexsort`` across the whole block, and outlier counts are a
    per-run ``reduceat``. Only the ≤2 edge runs per block pay a grouped
    fold — O(blocks) Python calls regardless of key cardinality. Medians
    are not mergeable, so one exchange is the honest plan (group size,
    not row count, bounds a worker); use the centroid quantile sketch
    when groups outgrow a worker.
    """
    from . import runfold as rf

    scale = z * 1.4826
    key_types = {k: t for k, t in zip(ds.schema().names, ds.schema().types)
                 if k in keys}
    out_cols = ["med", "mad", "n_outliers"]

    def _finalize(v_sorted, dev_sorted, starts, lengths):
        """(med, mad, n_out) arrays per run; v/dev each sorted within run."""
        med = rf.run_quantile(v_sorted, starts, lengths, 0.5)
        mad = rf.run_quantile(dev_sorted, starts, lengths, 0.5)
        # dev_sorted ascending per run → outliers form each run's tail
        thresh = scale * mad
        rid = rf.run_ids(lengths)
        n_out = rf.run_sums(
            (dev_sorted > thresh[rid]).astype(np.int64), starts)
        return np.round(med, ndigits), np.round(mad, ndigits), n_out

    def _fold_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {**{k: pa.array([], key_types[k]) for k in keys},
                 "med": pa.array([], pa.float64()),
                 "mad": pa.array([], pa.float64()),
                 "n_outliers": pa.array([], pa.int64()),
                 "__vals": pa.array([], pa.list_(pa.float64())),
                 "__edge": pa.array([], pa.bool_())})
        starts, lengths = rf.run_bounds(t, keys)
        edges = rf.edge_mask(len(starts))
        v = t.column(value).to_numpy(zero_copy_only=False).astype(np.float64)
        rid = rf.run_ids(lengths)
        med_raw = rf.run_quantile(v, starts, lengths, 0.5)
        dev = np.abs(v - med_raw[rid])
        dev_sorted = dev[np.lexsort((dev, rid))]
        med, mad, n_out = _finalize(v, dev_sorted, starts, lengths)
        cols = {k: t.column(k).take(pa.array(starts)) for k in keys}
        cols["med"] = pa.array(med, pa.float64(), mask=edges)
        cols["mad"] = pa.array(mad, pa.float64(), mask=edges)
        cols["n_outliers"] = pa.array(n_out, pa.int64(), mask=edges)
        cols["__vals"] = rf.edge_values_list(v, starts, lengths, edges)
        cols["__edge"] = pa.array(edges)
        return pa.table(cols)

    def _edge_fold(g: pa.Table) -> pa.Table:
        v = np.sort(rf.flat_list_values(g.column("__vals")))
        n = len(v)
        starts_ = np.zeros(1, np.int64)
        lengths_ = np.array([n], np.int64)
        med_raw = rf.run_quantile(v, starts_, lengths_, 0.5)
        dev_sorted = np.sort(np.abs(v - med_raw[0]))
        med, mad, n_out = _finalize(v, dev_sorted, starts_, lengths_)
        out = {k: g.column(k).slice(0, 1) for k in keys}
        out["med"] = pa.array([float(med[0])], pa.float64())
        out["mad"] = pa.array([float(mad[0])], pa.float64())
        out["n_outliers"] = pa.array([int(n_out[0])], pa.int64())
        return pa.table(out)

    parts = ds.select_columns(keys + [value]) \
        .sort(keys + [value]) \
        .map_batches(_fold_block, batch_format="pyarrow", batch_size=None)
    return rf.branch_edge_merge(parts, keys, out_cols, _edge_fold)


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

    One exchange — a SORT by (key, order_cols), not a per-group UDF. Each
    sorted block finalizes every interior key run with the closed form
    ``slope = Σ(x−x̄)(y−ȳ) / Σ(x−x̄)²`` evaluated as per-run ``reduceat``
    sums (``Σ(x−x̄)² = n(n²−1)/12`` exactly, since x is the 1..n rank);
    only the ≤2 edge runs per block pay a grouped fold — their partials
    carry the run's (order-tuple, y) pairs so the fold re-establishes
    chronological order before regressing. O(blocks) Python calls
    regardless of key cardinality. A single-row group (zero x variance)
    yields null slope/intercept, matching SQL
    ``regr_slope``/``regr_intercept``."""
    from . import runfold as rf

    sch = dict(zip(ds.schema().names, ds.schema().types))
    out_cols = ["n", "slope", "intercept"]

    def _regress(y: np.ndarray, starts, lengths):
        """(slope, intercept) float64 arrays per run over chronologically
        ordered y; runs of length < 2 yield NaN (masked to null later)."""
        n = lengths.astype(np.float64)
        rid = rf.run_ids(lengths)
        pos = np.arange(len(y), dtype=np.float64)
        x = pos - starts[rid] + 1.0
        ybar = rf.run_sums(y, starts) / n
        xbar = (n + 1.0) / 2.0
        sxy = rf.run_sums((x - xbar[rid]) * (y - ybar[rid]), starts)
        sxx = n * (n * n - 1.0) / 12.0
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = sxy / sxx
            intercept = ybar - slope * xbar
        return np.round(slope, ndigits), np.round(intercept, ndigits)

    def _fold_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols0 = {key: pa.array([], sch[key]),
                     "n": pa.array([], pa.int64()),
                     "slope": pa.array([], pa.float64()),
                     "intercept": pa.array([], pa.float64()),
                     "__y": pa.array([], pa.list_(pa.float64()))}
            for i in range(len(order_cols)):
                cols0[f"__ord{i}"] = pa.array([], pa.list_(pa.float64()))
            cols0["__edge"] = pa.array([], pa.bool_())
            return pa.table(cols0)
        starts, lengths = rf.run_bounds(t, [key])
        edges = rf.edge_mask(len(starts))
        y = t.column(value).to_numpy(zero_copy_only=False).astype(np.float64)
        slope, intercept = _regress(y, starts, lengths)
        null_mask = edges | (lengths < 2)
        # edge partials carry (FULL order tuple, y) pairs; the merge
        # lexsorts by every order column, so chronological order is
        # recovered exactly even when blocks tie on the primary value
        # (same-timestamp runs tiebroken by a secondary column)
        cols = {key: t.column(key).take(pa.array(starts))}
        cols["n"] = pa.array(lengths, pa.int64(), mask=edges)
        cols["slope"] = pa.array(np.where(lengths < 2, np.nan, slope),
                                 pa.float64(), mask=null_mask)
        cols["intercept"] = pa.array(np.where(lengths < 2, np.nan, intercept),
                                     pa.float64(), mask=null_mask)
        cols["__y"] = rf.edge_values_list(y, starts, lengths, edges)
        for i, c in enumerate(order_cols):
            oc = t.column(c)
            if pa.types.is_temporal(oc.type):
                oc = oc.cast(pa.timestamp("us")).cast(pa.int64())
            o = oc.to_numpy(zero_copy_only=False).astype(np.float64)
            cols[f"__ord{i}"] = rf.edge_values_list(o, starts, lengths, edges)
        cols["__edge"] = pa.array(edges)
        return pa.table(cols)

    def _edge_fold(g: pa.Table) -> pa.Table:
        # Groupby does not preserve block order; the partials carry the
        # full order tuple per row, so one lexsort re-establishes the
        # exact chronological order regardless of arrival order.
        lists_y = g.column("__y").to_pylist()
        y = np.concatenate([np.asarray(v, np.float64) for v in lists_y])
        ords = [np.concatenate([np.asarray(v, np.float64) for v in
                                g.column(f"__ord{i}").to_pylist()])
                for i in range(len(order_cols))]
        # full lexsort by (order_cols...) — exact whatever the partials'
        # arrival order; rows tied on EVERY order column are genuinely
        # unordered (same as any sort-based evaluation)
        y = y[np.lexsort(tuple(reversed(ords)))]
        n = len(y)
        starts_ = np.zeros(1, np.int64)
        lengths_ = np.array([n], np.int64)
        slope, intercept = _regress(y, starts_, lengths_)
        out = {key: g.column(key).slice(0, 1)}
        out["n"] = pa.array([n], pa.int64())
        if n < 2:
            out["slope"] = pa.array([None], pa.float64())
            out["intercept"] = pa.array([None], pa.float64())
        else:
            out["slope"] = pa.array([float(slope[0])], pa.float64())
            out["intercept"] = pa.array([float(intercept[0])], pa.float64())
        return pa.table(out)

    return rf.branch_edge_merge(
        ds.select_columns(
            [key, value] + [c for c in order_cols if c not in (key, value)])
        .sort([key] + list(order_cols))
        .map_batches(_fold_block, batch_format="pyarrow", batch_size=None),
        [key], out_cols, _edge_fold)


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
