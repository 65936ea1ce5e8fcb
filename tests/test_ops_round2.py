"""Round-2 operator tests: range join, running sum, PII redaction,
decontamination (planted-overlap), heavy hitters."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.contamination import (
    benchmark_ngram_set, decontaminate, flag_contaminated)
from vlm_eden_dataset_etl_ray.functions.relational import (
    range_join, running_sum, skew_hash_join)
from vlm_eden_dataset_etl_ray.functions.text import redact_patterns


def _to_pandas(ds):
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables(batches).to_pandas() if batches else pd.DataFrame()


def test_range_join_matches_pandas():
    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": rng.integers(0, 20, 300),
        "x": rng.integers(0, 1000, 300),
    })
    right = pd.DataFrame({
        "k2": rng.integers(0, 20, 60),
        "lo": rng.integers(0, 900, 60),
    })
    right["hi"] = right["lo"] + rng.integers(1, 200, 60)
    out = _to_pandas(range_join(
        rd.from_pandas(left), rd.from_pandas(right),
        "k", "k2", "x", "lo", "hi", num_buckets=16))
    exp = left.merge(right, left_on="k", right_on="k2")
    exp = exp[(exp.x >= exp.lo) & (exp.x < exp.hi)]
    key = ["k", "x", "k2", "lo", "hi"]
    got = out[key].sort_values(key).reset_index(drop=True)
    want = exp[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # inclusive-end variant picks up boundary rows
    out_b = _to_pandas(range_join(
        rd.from_pandas(left), rd.from_pandas(right),
        "k", "k2", "x", "lo", "hi", closed="both", num_buckets=16))
    assert len(out_b) >= len(out)


def test_running_sum_matches_pandas():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": rng.integers(0, 10, 500),
        "o": rng.permutation(500),
        "v": rng.integers(-50, 100, 500),
    })
    out = _to_pandas(running_sum(rd.from_pandas(df), "k", ["o"], "v", alias="r"))
    exp = df.sort_values(["k", "o"]).reset_index(drop=True)
    exp["r"] = exp.groupby("k")["v"].cumsum()
    got = out.sort_values(["k", "o"]).reset_index(drop=True)[["k", "o", "v", "r"]]
    pd.testing.assert_frame_equal(got, exp)


def test_skew_hash_join_matches_plain_join():
    rng = np.random.default_rng(13)
    # Zipf-hot left: key 0 carries ~60% of rows
    k = np.where(rng.random(4000) < 0.6, 0, rng.integers(1, 50, 4000))
    left = pd.DataFrame({"k": k, "x": np.arange(4000)})
    right = pd.DataFrame({"k2": np.arange(50), "name": [f"n{i}" for i in range(50)]})
    for how in ("inner", "left"):
        out = _to_pandas(skew_hash_join(
            rd.from_pandas(left), rd.from_pandas(right),
            "k", "k2", how=how, sample_rows=1000, hot_frac=0.2, num_buckets=16))
        exp = left.merge(right, left_on="k", right_on="k2", how=how)
        cols = ["k", "x", "k2", "name"]
        got = out[cols].sort_values(["k", "x"]).reset_index(drop=True)
        want = exp[cols].sort_values(["k", "x"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # explicit hot key list short-circuits detection
    out2 = _to_pandas(skew_hash_join(
        rd.from_pandas(left), rd.from_pandas(right),
        "k", "k2", hot_keys=[0], num_buckets=16))
    assert len(out2) == len(left.merge(right, left_on="k", right_on="k2"))


def test_redact_patterns():
    ds = rd.from_items([
        {"t": "mail me at jo.doe+x@corp.example.com or call 555-123-4567"},
        {"t": "ssn 123-45-6789 stays private"},
        {"t": "nothing sensitive here"},
    ])
    out = _to_pandas(redact_patterns(ds, "t", "clean"))["clean"].tolist()
    assert out[0] == "mail me at <EMAIL> or call <PHONE>"
    assert out[1] == "ssn <SSN> stays private"
    assert out[2] == "nothing sensitive here"


def test_decontamination_planted_overlap():
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    clean = "one two three four five six seven eight nine ten"
    # contains the benchmark's first 8-gram verbatim, shifted into context
    dirty = "xx alpha beta gamma delta epsilon zeta eta theta yy"
    short = "alpha beta"  # shares words but no complete 8-gram
    bench = benchmark_ngram_set([bench_text], n=8)
    ds = rd.from_items([{"doc": "c", "text": clean},
                        {"doc": "d", "text": dirty},
                        {"doc": "s", "text": short}])
    flags = _to_pandas(flag_contaminated(ds, bench, "text", n=8))
    got = dict(zip(flags["doc"], flags["contaminated"]))
    assert got == {"c": False, "d": True, "s": False}
    kept = _to_pandas(decontaminate(ds, bench, "text", n=8))
    assert sorted(kept["doc"]) == ["c", "s"]
