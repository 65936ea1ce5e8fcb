"""Declarative data-quality expectations (dbt-tests / Delta-constraints
shape): validate a Dataset against a rule list and report per-rule
violation counts, or enforce row-local rules fail-fast on a write path.

The reference relies on Postgres constraints and its validator cron for
data quality (``/root/reference/sync/sync_validator.py``); a file lake has
no database to refuse bad rows, so the engine provides the check as an
operator. Two modes:

- :func:`expectation_report` — one streaming pass computes per-batch
  partial violation counts for every row-local rule (vectorized, mergeable,
  no shuffle); ``unique`` rules add one two-stage distinct count over the
  key columns only (excess rows = total − distinct). Output is a tiny
  (rule, violations, checked) table — SQL-twin checkable.
- :func:`enforce` — wraps a Dataset so any batch violating a ROW-LOCAL rule
  raises :class:`ExpectationError` before it reaches a sink; under the
  lake's 2PC apply this aborts the epoch pre-commit, which is exactly the
  "constraint rejects the write" contract. ``unique`` needs global state
  and is report-only by design (documented, loud).

Rules (all plain hashable tuples):
  ("not_null", col)
  ("in_range", col, lo, hi)            # inclusive; NULL passes (SQL CHECK)
  ("accepted_values", col, (v, ...))   # NULL passes
  ("matches_regex", col, pattern)      # NULL passes, RE2 via Arrow
  ("unique", col) / ("unique", (c1, c2, ...))
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


class ExpectationError(ValueError):
    """A batch violated an enforced expectation."""


def rule_name(rule: tuple) -> str:
    kind, col = rule[0], rule[1]
    cols = ",".join(col) if isinstance(col, (tuple, list)) else col
    if kind == "in_range":
        return f"in_range({cols},{rule[2]},{rule[3]})"
    if kind == "accepted_values":
        return f"accepted_values({cols})"
    if kind == "matches_regex":
        return f"matches_regex({cols})"
    return f"{kind}({cols})"


def _violation_mask(t: pa.Table, rule: tuple):
    """BooleanArray: True where the row VIOLATES the rule. NULL passes
    every rule except not_null — the SQL CHECK-constraint convention."""
    kind = rule[0]
    if kind == "not_null":
        return pc.is_null(t.column(rule[1]))
    if kind == "in_range":
        c = t.column(rule[1])
        ok = pc.and_(pc.greater_equal(c, pa.scalar(rule[2])),
                     pc.less_equal(c, pa.scalar(rule[3])))
        return pc.fill_null(pc.invert(ok), False)
    if kind == "accepted_values":
        ok = pc.is_in(t.column(rule[1]),
                      value_set=pa.array(list(rule[2])))
        return pc.fill_null(pc.invert(ok), False)
    if kind == "matches_regex":
        ok = pc.match_substring_regex(t.column(rule[1]), rule[2])
        return pc.fill_null(pc.invert(ok), False)
    raise ValueError(f"unknown expectation kind {kind!r}")


_KINDS = ("not_null", "in_range", "accepted_values", "matches_regex",
          "unique")


def _split(rules):
    for r in rules:
        if r[0] not in _KINDS:
            raise ValueError(f"unknown expectation kind {r[0]!r} "
                             f"(expected one of {_KINDS})")
    local = [r for r in rules if r[0] != "unique"]
    uniq = [r for r in rules if r[0] == "unique"]
    return local, uniq


def expectation_report(ds: rd.Dataset, rules: list[tuple]) -> pa.Table:
    """One (rule, violations, checked) row per rule, in ``rules`` order.

    Row-local rules: per-batch vectorized masks → one partial-count row per
    batch → tree-reduced sum (no shuffle; the exchange carries
    O(batches × rules) ints). ``unique``: excess rows = COUNT(*) −
    COUNT(DISTINCT key), the distinct via a two-stage groupby over the key
    columns only (payload never shuffles).
    """
    local, uniq = _split(rules)
    names = [rule_name(r) for r in rules]
    counts: dict[str, tuple[int, int]] = {}
    n_total: int | None = None

    if local:
        def partials(t: pa.Table, *, rs=tuple(local)) -> pa.Table:
            return pa.table({
                "rule": pa.array([rule_name(r) for r in rs], pa.string()),
                "violations": pa.array(
                    [pc.sum(_violation_mask(t, r).cast(pa.int64())).as_py()
                     or 0 for r in rs], pa.int64()),
                "checked": pa.array([t.num_rows] * len(rs), pa.int64()),
            })

        part = ds.map_batches(partials, batch_format="pyarrow",
                              zero_copy_batch=True)
        agg = part.groupby("rule").sum(["violations", "checked"])
        for row in agg.take_all():
            counts[row["rule"]] = (int(row["sum(violations)"]),
                                   int(row["sum(checked)"]))
        if counts:
            n_total = next(iter(counts.values()))[1]

    for r in uniq:
        cols = list(r[1]) if isinstance(r[1], (tuple, list)) else [r[1]]
        # excess rows = COUNT(*) − COUNT(DISTINCT cols); the exchange sees
        # only per-batch-deduped key columns, never the payload
        dedup = ds.map_batches(
            lambda t, cs=tuple(cols): t.select(list(cs)).group_by(
                list(cs)).aggregate([]),
            batch_format="pyarrow", zero_copy_batch=True,
        ).groupby(cols if len(cols) > 1 else cols[0]).count()
        n_distinct = sum(
            b.num_rows
            for b in dedup.iter_batches(batch_format="pyarrow",
                                        batch_size=None))
        if n_total is None:
            n_total = ds.count()
        counts[rule_name(r)] = (int(n_total - n_distinct), int(n_total))

    return pa.table({
        "rule": pa.array(names, pa.string()),
        "violations": pa.array([counts.get(n, (0, 0))[0] for n in names],
                               pa.int64()),
        "checked": pa.array([counts.get(n, (0, 0))[1] for n in names],
                            pa.int64()),
    })


def enforce(ds: rd.Dataset, rules: list[tuple],
            max_examples: int = 3) -> rd.Dataset:
    """Fail-fast write constraint: the returned Dataset raises
    :class:`ExpectationError` (with up to ``max_examples`` offending key
    values per rule) from the first violating batch. Row-local rules only —
    ``unique`` needs global state and must go through
    :func:`expectation_report`."""
    local, uniq = _split(rules)
    if uniq:
        raise ValueError("enforce() supports row-local rules only; check "
                         "uniqueness with expectation_report()")

    def check(t: pa.Table, *, rs=tuple(local), k=max_examples) -> pa.Table:
        for r in rs:
            m = _violation_mask(t, r)
            n = pc.sum(m.cast(pa.int64())).as_py() or 0
            if n:
                bad = t.filter(m).slice(0, k)
                col = r[1] if isinstance(r[1], str) else r[1][0]
                ex = bad.column(col).to_pylist() if col in bad.column_names \
                    else []
                raise ExpectationError(
                    f"expectation {rule_name(r)} violated by {n} row(s) in "
                    f"a batch; examples ({col}): {ex}")
        return t

    return ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)
