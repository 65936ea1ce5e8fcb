"""HLL sketch accuracy: approximate distinct counts within the standard
error bound of exact, both globally and per group, including merges."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.sketches import (
    CentroidSketch, CountMin, HyperLogLog, approx_distinct,
    approx_heavy_hitters, approx_quantiles)
from vlm_eden_dataset_etl_ray.functions.hashing import hash_strings


def test_hll_core_accuracy_and_merge():
    rng = np.random.default_rng(7)
    for true_n in (100, 5_000, 100_000):
        vals = np.array([f"v{i}" for i in rng.choice(true_n * 3, true_n, replace=False)],
                        dtype=object)
        h = hash_strings(vals)
        # split into 8 partials and merge — must equal the single-shot sketch
        whole = HyperLogLog().add_hashes(h)
        merged = HyperLogLog()
        for part in np.array_split(h, 8):
            merged.merge(HyperLogLog().add_hashes(part))
        assert np.array_equal(whole.registers, merged.registers)
        est = merged.estimate()
        rel_err = abs(est - true_n) / true_n
        assert rel_err < 0.05, (true_n, est)


def test_approx_distinct_vs_exact_on_events():
    sf = "/root/testdata/sf0.01"
    ds = rd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "event_type"])
    approx = approx_distinct(ds, "user_id", group_by="event_type")
    import duckdb

    exact = duckdb.sql(
        f"select event_type, count(distinct user_id) n from '{sf}/events.parquet' group by 1"
    ).arrow()
    ex = dict(zip(exact.column("event_type").to_pylist(), exact.column("n").to_pylist()))
    for g, est in zip(approx.column("event_type").to_pylist(),
                      approx.column("approx_distinct").to_pylist()):
        assert abs(est - ex[g]) / ex[g] < 0.05, (g, est, ex[g])


def test_countmin_merge_and_never_undercounts():
    rng = np.random.default_rng(11)
    vals = np.array([f"k{int(z)}" for z in rng.zipf(1.3, 20_000)], dtype=object)
    h = hash_strings(vals)
    whole = CountMin().add_hashes(h)
    merged = CountMin()
    for part in np.array_split(h, 6):
        merged.merge(CountMin().add_hashes(part))
    assert np.array_equal(whole.table, merged.table)
    uniq, true_counts = np.unique(vals, return_counts=True)
    est = whole.estimate_hashes(hash_strings(uniq))
    assert (est >= true_counts).all()  # CM error is one-sided
    # heavy keys estimated tightly (error bound ~ 2N/w = ~20 here)
    heavy = true_counts > 100
    assert (est[heavy] - true_counts[heavy]).max() <= 2 * len(vals) / 2048 + 1


def test_centroid_sketch_accuracy_and_merge():
    rng = np.random.default_rng(5)
    vals = rng.lognormal(0, 1.5, 200_000)
    whole = CentroidSketch.from_values(vals)
    merged = CentroidSketch.from_values(np.empty(0))
    for part in np.array_split(vals, 16):
        merged.merge(CentroidSketch.from_values(part))
    for q in (0.1, 0.5, 0.9, 0.99):
        exact = np.quantile(vals, q)
        for sk in (whole, merged):
            # rank error O(1/k) → value error small on a smooth CDF
            assert abs(sk.quantile(q) - exact) / exact < 0.05, (q, sk.quantile(q), exact)


def test_approx_quantiles_per_group_vs_exact():
    sf = "/root/testdata/sf0.01"
    ds = rd.read_parquet(f"{sf}/events.parquet", columns=["event_type", "value"])
    got = approx_quantiles(ds, "value", qs=(0.5, 0.9), group_by="event_type")
    import duckdb

    exact = duckdb.sql(
        f"select event_type, quantile_cont(value, 0.5) q50, "
        f"quantile_cont(value, 0.9) q90 from '{sf}/events.parquet' group by 1"
    ).arrow()
    ex = {g: (a, b) for g, a, b in zip(exact.column("event_type").to_pylist(),
                                       exact.column("q50").to_pylist(),
                                       exact.column("q90").to_pylist())}
    for g, q50, q90 in zip(got.column("event_type").to_pylist(),
                           got.column("q50").to_pylist(),
                           got.column("q90").to_pylist()):
        e50, e90 = ex[g]
        spread = abs(e90) + abs(e50) + 1e-9
        assert abs(q50 - e50) / spread < 0.05, (g, q50, e50)
        assert abs(q90 - e90) / spread < 0.05, (g, q90, e90)


def test_approx_heavy_hitters_match_exact_topk():
    sf = "/root/testdata/sf0.01"
    ds = rd.read_parquet(f"{sf}/events.parquet", columns=["event_type"])
    got = approx_heavy_hitters(ds, "event_type", k=5)
    import duckdb

    exact = duckdb.sql(
        f"select event_type, count(*) n from '{sf}/events.parquet' "
        "group by 1 order by n desc, event_type limit 5").arrow()
    assert got.column("event_type").to_pylist() == exact.column("event_type").to_pylist()
    est = np.array(got.column("approx_count").to_pylist())
    true = np.array(exact.column("n").to_pylist())
    assert (est >= true).all() and (est - true).max() / true.min() < 0.05


def test_grouped_hll_daily_accuracy():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vlm_eden_dataset_etl_ray.functions.sketches import approx_distinct

    rng = np.random.default_rng(9)
    days = np.array(["d1", "d2", "d3"])[rng.integers(0, 3, 20000)]
    users = rng.integers(0, 2000, 20000)
    t = pa.table({"day": pa.array(days), "u": pa.array(users)})
    got = approx_distinct(rd.from_arrow(t).repartition(8), "u",
                          group_by="day")
    import collections
    exact = collections.defaultdict(set)
    for d, u in zip(days, users):
        exact[d].add(u)
    for d, est in zip(got.column("day").to_pylist(),
                      got.column("approx_distinct").to_pylist()):
        assert abs(est - len(exact[d])) / len(exact[d]) < 0.05, (d, est)


def test_approx_overlap_accuracy_and_disjoint():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vlm_eden_dataset_etl_ray.functions.sketches import approx_overlap

    n, shared = 20_000, 8_000
    a_keys = [f"k{i}" for i in range(n)]
    b_keys = [f"k{i}" for i in range(n - shared, 2 * n - shared)]
    a = rd.from_arrow(pa.table({"k": pa.array(a_keys)})).repartition(4)
    b = rd.from_arrow(pa.table({"k": pa.array(b_keys)})).repartition(4)
    t = approx_overlap(a, b, "k")
    r = {c: t.column(c)[0].as_py() for c in t.column_names}
    assert abs(r["approx_a"] - n) / n < 0.05
    assert abs(r["approx_b"] - n) / n < 0.05
    assert abs(r["approx_union"] - (2 * n - shared)) / (2 * n - shared) < 0.05
    assert abs(r["approx_intersection"] - shared) / shared < 0.25
    true_j = shared / (2 * n - shared)
    assert abs(r["approx_jaccard"] - true_j) < 0.1

    # disjoint sets: intersection collapses toward zero
    c = rd.from_arrow(pa.table({"k": pa.array([f"x{i}" for i in range(5000)])}))
    d = rd.from_arrow(pa.table({"k": pa.array([f"y{i}" for i in range(5000)])}))
    t2 = approx_overlap(c, d, "k")
    assert t2.column("approx_intersection")[0].as_py() < 1000
    assert t2.column("approx_jaccard")[0].as_py() < 0.1
