"""Distributed PageRank vs a dense numpy power-iteration reference."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.graph import pagerank


def _reference(n, edge_list, iters, d=0.85):
    out_deg = np.zeros(n)
    for s, _ in edge_list:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edge_list:
            contrib[t] += r[s] / out_deg[s]
        dangling = r[out_deg == 0].sum()
        r = (1 - d) / n + d * (dangling / n + contrib)
    return r


def test_pagerank_matches_dense_reference():
    rng = np.random.default_rng(2)
    n = 60
    edge_list = list({(int(a), int(b))
                      for a, b in rng.integers(0, n, (400, 2)) if a != b})
    edges = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edge_list], pa.int64()),
        "dst": pa.array([e[1] for e in edge_list], pa.int64()),
    })).repartition(4)
    got = pa.concat_tables(
        pagerank(edges, iters=5, num_buckets=2).iter_batches(
            batch_format="pyarrow", batch_size=None))
    ranks = dict(zip(got.column("node").to_pylist(),
                     got.column("rank").to_pylist()))
    ref = _reference(n, edge_list, iters=5)
    # dangling-free comparison needs every reachable node present
    touched = {x for e in edge_list for x in e}
    assert set(ranks) == touched
    for node in touched:
        assert abs(ranks[node] - ref[node]) < 1e-9, node
    # probability mass is conserved (all 60 nodes are edge-touched here)
    assert len(touched) == n
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
