"""Aggregation merge engine fuzz: random event streams split into random
epochs (out-of-order LSNs), random nulls, rehash/compaction interleaved —
the converged lake must equal a serial per-key reference aggregation for
every declared function."""

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray.spec import TableSpec

N_CASES = int(os.environ.get("AFUZZ_CASES", "25"))
SEED_START = int(os.environ.get("AFUZZ_SEED_START", "2000"))

AGGS = (("s", "sum"), ("c", "count"), ("mn", "min"), ("mx", "max"),
        ("b", "bool_or"), ("ln", "last_non_null"), ("fn", "first_non_null"))

FIELDS = [("s", pa.float64()), ("c", pa.int64()), ("mn", pa.int64()),
          ("mx", pa.int64()), ("b", pa.bool_()), ("ln", pa.string()),
          ("fn", pa.string())]


def _serial(rows):
    out: dict = {}
    for doc, lsn, vals in sorted(rows, key=lambda r: r[1]):
        a = out.setdefault(doc, {"s": None, "c": 0, "mn": None, "mx": None,
                                 "b": None, "ln": None, "fn": None})
        if vals["s"] is not None:
            a["s"] = (a["s"] or 0.0) + vals["s"]
        if vals["c"] is not None:
            a["c"] += 1
        if vals["mn"] is not None:
            a["mn"] = vals["mn"] if a["mn"] is None else min(a["mn"], vals["mn"])
        if vals["mx"] is not None:
            a["mx"] = vals["mx"] if a["mx"] is None else max(a["mx"], vals["mx"])
        if vals["b"] is not None:
            a["b"] = bool(a["b"]) or vals["b"]
        if vals["ln"] is not None:
            a["ln"] = vals["ln"]
        if vals["fn"] is not None and a["fn"] is None:
            a["fn"] = vals["fn"]
    return {k: (v["s"], v["c"], v["mn"], v["mx"], v["b"], v["ln"], v["fn"])
            for k, v in out.items()}


def _run_case(tmp_path, seed):
    rng = np.random.default_rng(seed)
    spec = TableSpec(name="afz", key="doc_id", order="lsn", envelope=(),
                     num_partitions=2, merge_engine="aggregate",
                     on_delete="ignore", aggregations=AGGS)
    lake_dir = str(tmp_path / f"lake{seed}")
    n = int(rng.integers(20, 60))
    lsns = rng.permutation(np.arange(1, n + 1))
    docs = [f"d{int(i)}" for i in rng.integers(0, 7, size=n)]
    all_rows = []
    for i in range(n):
        def maybe(v):
            return None if rng.random() < 0.3 else v
        vals = {"s": maybe(round(float(rng.normal(0, 10)), 3)),
                "c": maybe(int(rng.integers(0, 5))),
                "mn": maybe(int(rng.integers(-100, 100))),
                "mx": maybe(int(rng.integers(-100, 100))),
                "b": maybe(bool(rng.random() < 0.5)),
                "ln": maybe(f"v{int(lsns[i])}"),
                "fn": maybe(f"v{int(lsns[i])}")}
        all_rows.append((docs[i], int(lsns[i]), vals))
    # random epoch split (2-4 epochs)
    k = int(rng.integers(2, 5))
    for e in range(k):
        chunk = all_rows[e::k]
        if not chunk:
            continue
        cols = {"doc_id": pa.array([r[0] for r in chunk]),
                "lsn": pa.array([r[1] for r in chunk], pa.int64()),
                "op": pa.array(["upsert"] * len(chunk))}
        for name, typ in FIELDS:
            cols[name] = pa.array([r[2][name] for r in chunk], typ)
        p = str(tmp_path / f"a{seed}_{e}.parquet")
        pq.write_table(pa.table(cols), p)
        apply.apply_epoch(lake_dir, [p], spec=spec)
        if e == 1 and rng.random() < 0.5:
            lake.rehash(lake_dir, int(rng.choice([2, 4])), spec=spec,
                        tombstone_watermark=0)
        if e == 1 and rng.random() < 0.5:
            lake.compact(lake_dir, spec=spec, tombstone_watermark=0)
    got_rows = lake.scan(lake_dir, spec=spec).take_all()
    got = {r["doc_id"]: (r["s"], r["c"], r["mn"], r["mx"], r["b"],
                         r["ln"], r["fn"]) for r in got_rows}
    exp = _serial(all_rows)
    assert set(got) == set(exp), f"seed {seed}: keys {set(got) ^ set(exp)}"
    for kk in exp:
        ge, ee = got[kk], exp[kk]
        for gi, ei, (name, _) in zip(ge, ee, FIELDS):
            if isinstance(ei, float) and gi is not None:
                assert math.isclose(gi, ei, rel_tol=1e-9, abs_tol=1e-9), \
                    (seed, kk, name, gi, ei)
            else:
                assert gi == ei, (seed, kk, name, gi, ei)


def test_aggregate_fuzz(ray_session, tmp_path):
    for seed in range(SEED_START, SEED_START + N_CASES):
        _run_case(tmp_path, seed)
