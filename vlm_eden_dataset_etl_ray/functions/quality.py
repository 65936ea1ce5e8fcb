"""Declarative data-quality expectations (dbt-tests / Delta-constraints
shape): validate a Dataset against a rule list and report per-rule
violation counts, or enforce row-local rules fail-fast on a write path.

The reference relies on Postgres constraints and its validator cron for
data quality (``/root/reference/sync/sync_validator.py``); a file lake has
no database to refuse bad rows, so the engine provides the check as an
operator. Two modes:

- :func:`expectation_report` — ONE streaming pass and ONE exchange for
  the whole rule list: per-batch vectorized violation partials for every
  row-local rule, plus per-batch-deduped injectively-encoded keys for
  every ``unique`` rule, all tagged into a single (rule, key) groupby
  (excess rows = total − distinct). Output is a tiny (rule, violations,
  checked) table — SQL-twin checkable.
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


class AuditError(ExpectationError):
    """A write-audit-publish gate failed: the candidate snapshot violated
    an expectation, so the epoch's manifest was NOT published (Iceberg-WAP
    shape; see ``apply.apply_epoch(audit=...)``). ``report`` carries the
    full per-rule (rule, violations, checked) table."""

    def __init__(self, msg: str, report: pa.Table):
        super().__init__(msg)
        self.report = report


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


def _encode_key(t: pa.Table, cols: list[str]) -> pa.Array:
    """Injective string encoding of a key tuple: each field rendered as
    ``<byte-length>:<string form>`` (null → ``n:``), fields concatenated.
    Netstring-style length prefixes self-delimit, so distinct tuples can
    never collide — this keeps multi-rule COUNT(DISTINCT) sharing EXACT,
    where a fixed-width hash would only be probably-exact."""
    fields = []
    for c in cols:
        s = pc.cast(t.column(c), pa.string())
        ln = pc.cast(pc.binary_length(s), pa.string())
        fields.append(pc.fill_null(
            pc.binary_join_element_wise(ln, s, ":"), "n:"))
    if len(fields) == 1:
        return fields[0].combine_chunks() \
            if isinstance(fields[0], pa.ChunkedArray) else fields[0]
    return pc.binary_join_element_wise(*fields, "")


_TOTAL = "__total__"


def expectation_report(ds: rd.Dataset, rules: list[tuple]) -> pa.Table:
    """One (rule, violations, checked) row per rule, in ``rules`` order.

    ONE pass over the data and ONE exchange regardless of rule count: each
    batch emits its row-local violation partials (one int row per rule), a
    row-count row, and — per ``unique`` rule — the batch's DEDUPED,
    injectively-encoded key strings tagged with the rule name. A single
    ``groupby (rule, key)`` then collapses duplicates across batches
    (local partials share the ``key=\"\"`` sentinel and sum), and a tiny
    per-batch count fold turns each unique rule's surviving group count
    into ``excess = COUNT(*) − COUNT(DISTINCT key)``. The exchange carries
    per-batch-deduped keys only — the payload never shuffles, and adding a
    second or tenth ``unique`` rule adds key traffic but no extra pass.
    """
    local, uniq = _split(rules)
    names = [rule_name(r) for r in rules]
    uniq_names = {rule_name(r) for r in uniq}
    out_schema = pa.schema([("rule", pa.string()), ("key", pa.string()),
                            ("violations", pa.int64()),
                            ("checked", pa.int64())])

    def partials(t: pa.Table, *, loc=tuple(local), un=tuple(uniq)) -> pa.Table:
        rules_, viol = [], []
        for r in loc:
            rules_.append(rule_name(r))
            viol.append(pc.sum(_violation_mask(t, r).cast(pa.int64()))
                        .as_py() or 0)
        rules_.append(_TOTAL)
        viol.append(0)
        outs = [pa.table({
            "rule": pa.array(rules_, pa.string()),
            "key": pa.array([""] * len(rules_), pa.string()),
            "violations": pa.array(viol, pa.int64()),
            "checked": pa.array([t.num_rows] * len(rules_), pa.int64()),
        }, schema=out_schema)]
        for r in un:
            cols = list(r[1]) if isinstance(r[1], (tuple, list)) else [r[1]]
            keys = pc.unique(_encode_key(t, cols))
            outs.append(pa.table({
                "rule": pa.array([rule_name(r)] * len(keys), pa.string()),
                "key": keys,
                "violations": pa.array(np.zeros(len(keys), np.int64)),
                "checked": pa.array(np.zeros(len(keys), np.int64)),
            }, schema=out_schema))
        return pa.concat_tables(outs)

    from ray.data.aggregate import Sum

    grouped = ds.map_batches(partials, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(["rule", "key"]) \
        .aggregate(Sum("violations", alias_name="v"),
                   Sum("checked", alias_name="c"))

    # O(distinct keys) rows remain; fold them to O(rules) per batch, then
    # combine the per-batch partials on the driver
    def per_rule(t: pa.Table) -> pa.Table:
        import polars as pl

        agg = pl.from_arrow(t).group_by("rule").agg(
            pl.len().alias("n"), pl.col("v").sum(), pl.col("c").sum())
        return agg.to_arrow()

    totals: dict[str, list[int]] = {}
    for row in grouped.map_batches(
            per_rule, batch_format="pyarrow").take_all():
        acc = totals.setdefault(row["rule"], [0, 0, 0])
        acc[0] += int(row["n"])
        acc[1] += int(row["v"] or 0)
        acc[2] += int(row["c"] or 0)
    n_total = totals.get(_TOTAL, [0, 0, 0])[2]

    viol_out, checked_out = [], []
    for n in names:
        nkeys, v, c = totals.get(n, [0, 0, 0])
        if n in uniq_names:
            viol_out.append(n_total - nkeys)
            checked_out.append(n_total)
        else:
            viol_out.append(v)
            checked_out.append(c)
    return pa.table({
        "rule": pa.array(names, pa.string()),
        "violations": pa.array(viol_out, pa.int64()),
        "checked": pa.array(checked_out, pa.int64()),
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
