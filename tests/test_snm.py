"""sorted_neighborhood_pairs: merge/purge windowed blocking — each
≤-window pair must be generated exactly once (home-block anchoring), and
the verified output must equal a serial reference."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.dedup import sorted_neighborhood_pairs

NAMES = ["navy blue small", "navy blue smol", "mint green large",
         "mint green larg", "rose red tiny", "rose red tin",
         "amber gold mid", "amber gold mids", "ivory white big",
         "ivory white bigg"]


def _table(n=90, seed=3):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    names = [NAMES[i % len(NAMES)] + f" v{rng.integers(0, 4)}"
             for i in range(n)]
    return pa.table({"pid": pa.array(ids), "name": pa.array(names)})


def _serial(t: pa.Table, window: int, threshold: float):
    rows = sorted(zip(t.column("name").to_pylist(),
                      t.column("pid").to_pylist()))
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, min(i + 1 + window, len(rows))):
            a, b = set(rows[i][0].split(" ")), set(rows[j][0].split(" "))
            jac = len(a & b) / len(a | b)
            if jac >= threshold:
                out.add((rows[i][1], rows[j][1], round(jac, 9)))
    return out


@pytest.mark.parametrize("window", [1, 3, 10])
def test_matches_serial_reference(window):
    t = _table()
    got = pa.concat_tables(sorted_neighborhood_pairs(
        rd.from_arrow(t), "pid", ["name"], window, "name", 0.5,
    ).iter_batches(batch_format="pyarrow", batch_size=None))
    pairs = set(zip(got.column("doc_a").to_pylist(),
                    got.column("doc_b").to_pylist(),
                    [round(j, 9) for j in got.column("jaccard").to_pylist()]))
    assert pairs == _serial(t, window, 0.5)
    assert len(pairs) > 0
    # exactly-once generation: no duplicate (a, b) rows
    ab = list(zip(got.column("doc_a").to_pylist(),
                  got.column("doc_b").to_pylist()))
    assert len(ab) == len(set(ab))


def test_window_validation():
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(rd.from_arrow(_table()), "pid", ["name"],
                                  0, "name", 0.5)
