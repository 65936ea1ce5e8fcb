"""Deterministic sampling operators for training-data pipelines.

Sampling decisions are pure functions of the row KEY (not of partitioning,
batch boundaries, or execution order), so a sample is reproducible across
re-runs, reshards and cluster sizes — the property a data pipeline needs to
make "the same 1% sample" land in every downstream experiment. Same design
as ``text.deterministic_split`` (key-hash thresholding), generalized to
per-stratum rates."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.hashing import hash_strings


def _key_hashes(t: pa.Table, key_col: str, seed: int) -> np.ndarray:
    col = t.column(key_col)
    if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
        col = col.cast(pa.string())
    return hash_strings(col, seed=seed)


def _threshold(frac: float) -> int:
    """uint64 keep-threshold for a fraction (frac=1.0 keeps everything —
    clamped below 2^64 so it fits the dtype)."""
    return min(int(min(max(frac, 0.0), 1.0) * float(2**64)), 2**64 - 1)


def hash_sample(ds: rd.Dataset, key_col: str, frac: float, seed: int = 0) -> rd.Dataset:
    """Keep ~``frac`` of rows, chosen by key hash — deterministic,
    reshard-stable, no shuffle. ``frac >= 1`` keeps every row exactly."""
    if frac >= 1.0:
        return ds
    thr = np.uint64(_threshold(frac))

    def _f(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(_key_hashes(t, key_col, seed) < thr))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(2**32)


def _int_priority(t: pa.Table, id_col: str, seed: int) -> np.ndarray:
    """Knuth multiplicative hash of an INTEGER id, mod 2^32 — deliberately
    simple enough to be reproduced exactly in ANSI SQL
    (``((id + seed) * 2654435761) % 4294967296``), so quota/temperature
    sampling decisions stay oracle-checkable end to end. The seed is added
    BEFORE the multiply so it scrambles the ordering rather than shifting
    every priority by the same constant."""
    ids = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    with np.errstate(over="ignore"):
        return ((ids.astype(np.uint64) + np.uint64(seed)) * _KNUTH) % _MOD32


def quota_sample(
    ds: rd.Dataset,
    group_col: str,
    id_col: str,
    cap: int,
    seed: int = 0,
    cardinality: str = "low",
) -> rd.Dataset:
    """Keep at most ``cap`` rows per group, chosen by deterministic
    hash-priority — the per-source/per-language document quota used to
    bound any one group's contribution to a training mix. Selection is a
    pure function of the row id, so the same quota lands on every re-run
    and resharding.

    Scale shape: rides :func:`relational.topk_per_key` — per-batch partial
    top-``cap`` (≤ cap rows per group leave each batch, skew-proof), then a
    tree or shuffle reduce by ``cardinality``. Raw rows beyond cap-per-group
    never cross the exchange."""
    from vlm_eden_dataset_etl_ray.functions.relational import topk_per_key

    def _prio(t: pa.Table) -> pa.Table:
        pr = _int_priority(t, id_col, seed).astype(np.int64)
        return t.append_column("__prio", pa.array(pr))

    with_p = ds.map_batches(_prio, batch_format="pyarrow", zero_copy_batch=True)
    out = topk_per_key(
        with_p, group_col,
        [("__prio", "ascending"), (id_col, "ascending")], cap,
        cardinality=cardinality,
    )
    return out.map_batches(
        lambda t: t.drop_columns(["__prio"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def temperature_rates(
    counts: dict[str, int], alpha: float,
) -> dict[str, float]:
    """Per-group keep rates for temperature-based mixture resampling
    (multilingual-corpus balancing: sample group g proportional to
    ``n_g^alpha``, ``alpha<1`` flattens the distribution). The largest
    effective rate is scaled to 1.0 so the pipeline only ever *down*samples;
    rates are floored to 9 decimals so a SQL oracle computing the same
    formula lands on bit-identical thresholds."""
    if not counts:
        return {}
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    w = {g: float(n) ** (alpha - 1.0) for g, n in counts.items() if n > 0}
    mx = max(w.values())
    return {g: np.floor(v / mx * 1e9) / 1e9 for g, v in w.items()}


def temperature_resample(
    ds: rd.Dataset,
    group_col: str,
    id_col: str,
    alpha: float,
    seed: int = 0,
) -> rd.Dataset:
    """Temperature-sample a corpus so group shares follow ``n_g^alpha``:
    two passes — a mergeable grouped count (tiny result to the driver; the
    group space is languages/sources, bounded), then a streamed hash-
    threshold filter with the per-group rate table broadcast into every
    task. No shuffle touches the payload."""
    from vlm_eden_dataset_etl_ray.functions.relational import grouped_count

    cnt_rows = grouped_count(
        ds.select_columns([group_col]), [group_col], alias="n",
    ).take_all()  # bounded: one row per group
    rates = temperature_rates(
        {r[group_col]: int(r["n"]) for r in cnt_rows}, alpha)

    groups = pa.array(list(rates.keys()))
    # hash values are < 2^32, so a full-rate threshold of exactly 2^32
    # (which uint64 holds) keeps every row — matching SQL's
    # `hash < floor(1.0 * 4294967296)` without an off-by-one clamp
    thr = np.array(
        [int(np.floor(r * float(2**32))) for r in rates.values()] + [0],
        dtype=np.uint64,
    )

    def _keep(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column(group_col), value_set=groups)
        idx_np = pc.fill_null(idx, len(thr) - 1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = _int_priority(t, id_col, seed) < thr[idx_np]
        return t.filter(pa.array(keep))

    return ds.map_batches(_keep, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds: rd.Dataset,
    strata_col: str,
    fracs: dict[str, float],
    key_col: str,
    default_frac: float = 0.0,
    seed: int = 0,
) -> rd.Dataset:
    """Per-stratum sampling rates (e.g. downsample dominant languages,
    keep 100% of rare ones — the classic corpus-balancing move). The
    stratum→rate table rides into each task as a tiny broadcast; the
    keep decision is one vectorized hash + threshold lookup per batch."""
    strata = pa.array(list(fracs.keys()))
    thr_np = np.array(
        [_threshold(f) for f in fracs.values()] + [_threshold(default_frac)],
        dtype=np.uint64,
    )

    full_np = np.array(
        [f >= 1.0 for f in fracs.values()] + [default_frac >= 1.0])

    def _f(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column(strata_col), value_set=strata)
        idx_np = pc.fill_null(idx, len(thr_np) - 1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = (_key_hashes(t, key_col, seed) < thr_np[idx_np]) | full_np[idx_np]
        return t.filter(pa.array(keep))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(
    ds: rd.Dataset,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> rd.Dataset:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-Res,
    "Weighted random sampling with a reservoir", IPL 2006): each row draws
    ``key = ln(u) / w`` with ``u`` derived from the same SQL-replicable
    integer hash the other samplers use, and the global top-``k`` keys win
    — inclusion probability proportional to weight, deterministic across
    re-runs and resharding. The mixture-weighting step when documents
    carry per-row importance (length, quality, domain weight).

    Keys are floored to 12 decimals on both sides of the oracle so libm
    last-ulp differences cannot flip a boundary selection; ties break by
    id. Scale shape: per-batch local top-k (≤k rows leave each batch) →
    one tiny final reduce; the payload never shuffles.
    """

    def _key(t: pa.Table) -> pa.Table:
        p = _int_priority(t, id_col, seed).astype(np.float64)
        u = (p + 0.5) / 4294967296.0
        w = t.column(weight_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        if np.any(~(w > 0)):
            raise ValueError(f"{weight_col} must be strictly positive")
        key = np.floor(np.log(u) / w * 1e12) / 1e12
        return t.append_column("__k", pa.array(key, pa.float64()))

    def _topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[
            ("__k", "descending"), (id_col, "ascending")])
        return t.take(idx.slice(0, k))

    pre = (ds.map_batches(_key, batch_format="pyarrow", zero_copy_batch=True)
             .map_batches(_topk, batch_format="pyarrow", zero_copy_batch=True))
    return (pre.repartition(1)
            .map_batches(_topk, batch_format="pyarrow", batch_size=None)
            .map_batches(lambda t: t.drop_columns(["__k"]),
                         batch_format="pyarrow"))


def k_anonymize(
    ds: rd.Dataset,
    quasi_cols: list[str],
    k: int,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """k-anonymity suppression: drop every row whose quasi-identifier
    combination occurs fewer than ``k`` times in the dataset — the
    pre-release privacy gate for telemetry/log corpora (a combo shared by
    < k users re-identifies them; Sweeney 2002). Rows are suppressed, not
    generalized — compose with bucketing transforms upstream to coarsen
    the quasi-identifiers instead of losing rows.

    Scale shape: the quasi-tuple hashes to 8 bytes per row; a two-stage
    grouped count over the HASH (skew-proof, payload never in the
    exchange) finds qualifying combos, then one semi-join keeps qualifying
    rows. A 64-bit hash collision could retain a row it shouldn't
    (~2⁻⁶⁴ per pair) — acceptable for suppression, noted for auditors.
    """
    from vlm_eden_dataset_etl_ray.functions.hashing import content_hash
    from vlm_eden_dataset_etl_ray.functions.relational import (
        grouped_count,
        hash_semi_join,
    )

    def _h(t: pa.Table) -> pa.Table:
        h = content_hash(t, quasi_cols)
        return t.append_column("__qh", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(_h, batch_format="pyarrow", zero_copy_batch=True)
    counts = grouped_count(hashed.select_columns(["__qh"]), ["__qh"],
                           alias="__n", cardinality="high")

    def _ok(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("__n"),
                                         pa.scalar(k))).select(["__qh"])

    ok = counts.map_batches(_ok, batch_format="pyarrow", zero_copy_batch=True)
    out = hash_semi_join(hashed, ok, "__qh", "__qh",
                         num_buckets=num_buckets)
    return out.map_batches(lambda t: t.drop_columns(["__qh"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def budget_sample(
    ds: rd.Dataset,
    id_col: str,
    cost_col: str,
    budget: int,
    seed: int = 0,
) -> rd.Dataset:
    """Budget-bounded subsampling: keep rows in hash-priority order until
    their cumulative ``cost_col`` reaches ``budget`` — the "cut exactly
    ~1B tokens from this corpus" primitive. Deterministic and
    reshard-stable (the priority is the SQL-replicable integer hash, so
    the selection is oracle-checkable as
    ``qualify sum(cost) over (order by pri, id) <= budget``).

    Scale shape: only slim (priority, id, cost) rows sort; the global
    prefix sum needs one O(blocks) driver pass over per-block cost
    totals; the kept-id set then semi-joins the payload, which crosses
    the exchange exactly once. ``cost_col`` must be integer — the prefix
    sum stays exact under any block layout (float cumsums would be
    order-dependent)."""
    import pickle

    from vlm_eden_dataset_etl_ray.functions.relational import hash_semi_join
    from vlm_eden_dataset_etl_ray.functions.windows import _first_tuple

    keys = ["__pri", id_col]

    def _slim(t: pa.Table) -> pa.Table:
        cost = t.column(cost_col)
        if not pa.types.is_integer(cost.type):
            raise ValueError(f"{cost_col} must be an integer column")
        return pa.table({
            "__pri": pa.array(_int_priority(t, id_col, seed).astype(np.int64)),
            id_col: t.column(id_col),
            "__cost": cost.cast(pa.int64()),
        })

    sorted_ds = (ds.map_batches(_slim, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .sort(keys).materialize())

    def _summ(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__first": pa.array([], pa.binary()),
                             "__sum": pa.array([], pa.int64())})
        return pa.table({
            "__first": pa.array([pickle.dumps(_first_tuple(t, keys))],
                                pa.binary()),
            "__sum": pa.array([pc.sum(t.column("__cost")).as_py() or 0],
                              pa.int64())})

    rows = sorted_ds.map_batches(_summ, batch_format="pyarrow",
                                 batch_size=None).take_all()
    summ = sorted(((pickle.loads(r["__first"]), r["__sum"]) for r in rows),
                  key=lambda fn: fn[0])
    offsets: dict[tuple, int] = {}
    acc = 0
    for first, s in summ:
        if first in offsets:
            raise ValueError("(priority, id) does not uniquely order rows "
                             f"(duplicate {first}); ids must be unique")
        offsets[first] = acc
        acc += s
    off_ref = ray.put(offsets)

    def _keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([id_col])
        base = ray.get(off_ref)[_first_tuple(t, keys)]
        cum = base + np.cumsum(
            t.column("__cost").to_numpy(zero_copy_only=False))
        return t.filter(pa.array(cum <= budget)).select([id_col])

    kept = sorted_ds.map_batches(_keep, batch_format="pyarrow",
                                 batch_size=None)
    return hash_semi_join(ds, kept, id_col, id_col)
