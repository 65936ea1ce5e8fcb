"""User-behavior analytics over event streams: funnel conversion and
cohort retention.

The reference materializes per-fact event views and leaves sequence
analytics to SQL consumers (queries/fact_studies.py reporting tail); a
warehouse fed by the same CDC events always grows these two shapes next.
Both follow the standard cluster plan: prune columns/rows at the read,
one groupby shuffle to co-locate each user, a vectorized per-user fold,
then a tiny bounded aggregate — raw events cross the exchange once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.relational import grouped_count


def funnel_conversion(
    ds: rd.Dataset,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> rd.Dataset:
    """Ordered funnel: ``n_users`` who reached each step, where a user
    reaches step *i* iff an event of type ``steps[i]`` occurs STRICTLY
    after the user's (earliest-path) step *i−1* time — the classic
    ``t_i = min(ts where type = step_i and ts > t_{i-1})`` greedy-first
    semantics every funnel SQL uses. Output: one row per step —
    ``(step 1-based, step_name, n_users)``.

    Shape: filter to funnel event types before the shuffle (the only
    rows that matter), groupby(user) → per-user vectorized scan (one
    masked min per step, no sort), then per-batch partial step counts
    tree-reduce into the ≤len(steps)-row result.
    """
    if not steps:
        raise ValueError("steps must be non-empty")

    step_set = pa.array(steps, pa.string())

    def _prune(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(type_col), value_set=step_set))

    src = ds.select_columns([user_col, type_col, ts_col]).map_batches(
        _prune, batch_format="pyarrow", zero_copy_batch=True)

    def _per_user(g: pa.Table) -> pa.Table:
        ts = (g.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        typ = g.column(type_col).to_numpy(zero_copy_only=False)
        prev = -np.inf
        reached = 0
        for s in steps:
            cand = ts[(typ == s) & (ts > prev)]
            if cand.size == 0:
                break
            prev = cand.min()
            reached += 1
        return pa.table({
            user_col: g.column(user_col).slice(0, 1),
            "__reached": pa.array([reached], pa.int64()),
        })

    per_user = src.groupby(user_col).map_groups(
        _per_user, batch_format="pyarrow")

    # bounded final: histogram of reached-step per batch, tree-reduce,
    # then suffix-sum so step i counts every user who reached >= i
    k = len(steps)

    def _partial(t: pa.Table) -> pa.Table:
        r = t.column("__reached").to_numpy(zero_copy_only=False)
        h = np.bincount(r, minlength=k + 1)[: k + 1]
        return pa.table({"__r": np.arange(k + 1, dtype=np.int64),
                         "__n": h.astype(np.int64)})

    def _final(t: pa.Table) -> pa.Table:
        g = t.group_by("__r").aggregate([("__n", "sum")])
        h = np.zeros(k + 1, dtype=np.int64)
        h[g.column("__r").to_numpy(zero_copy_only=False)] = (
            g.column("__n_sum").to_numpy(zero_copy_only=False))
        ge = np.cumsum(h[::-1])[::-1]  # ge[i] = users with reached >= i
        return pa.table({
            "step": pa.array(np.arange(1, k + 1, dtype=np.int64)),
            "step_name": pa.array(steps, pa.string()),
            "n_users": pa.array(ge[1:], pa.int64()),
        })

    parts = per_user.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.repartition(1).map_batches(
        _final, batch_format="pyarrow", batch_size=None)


def cohort_retention(
    ds: rd.Dataset,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
) -> rd.Dataset:
    """Cohort retention grid: users bucket into a cohort by their FIRST
    active calendar day; for every later activity the offset is
    ``(active_day − cohort_day) // period_days`` periods; the output
    counts distinct users per ``(cohort_day, period_offset)`` — the
    retention-curve input. Offset 0 row = cohort size.

    Shape: project to (user, day) and pre-distinct per batch, groupby
    (user) → per-user vectorized unique-offset emit, then a grouped
    count over the bounded (cohort, offset) grid.
    """

    def _days(t: pa.Table) -> pa.Table:
        d = t.column(ts_col).cast(pa.timestamp("us")).cast(pa.date32())
        return (pa.table({user_col: t.column(user_col), "__d": d})
                .group_by([user_col, "__d"]).aggregate([]))

    pairs = ds.select_columns([user_col, ts_col]).map_batches(
        _days, batch_format="pyarrow", zero_copy_batch=True)

    def _per_user(g: pa.Table) -> pa.Table:
        d = g.column("__d").cast(pa.int32()).to_numpy(zero_copy_only=False)
        cohort = d.min()
        offs = np.unique((d - cohort) // period_days)
        n = offs.size
        return pa.table({
            "cohort_day": pa.array(
                np.full(n, cohort, dtype=np.int32), pa.date32()),
            "period_offset": pa.array(offs.astype(np.int64)),
        })

    grid = pairs.groupby(user_col).map_groups(
        _per_user, batch_format="pyarrow")
    return grouped_count(
        grid, ["cohort_day", "period_offset"], alias="n_users")
