"""Round-3 tail operators: vectorized Levenshtein / fuzzy value pairs,
grouped MAD, inverted-index postings."""

import duckdb
import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.fuzzy import (
    fuzzy_value_pairs, levenshtein_batch)
from vlm_eden_dataset_etl_ray.functions.stats import grouped_mad
from vlm_eden_dataset_etl_ray.functions.text import inverted_postings


def _collect(ds):
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None))


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j - 1] + (ca != cb), prev[j] + 1,
                           cur[j - 1] + 1))
        prev = cur
    return prev[len(b)]


def test_levenshtein_batch_matches_scalar_dp():
    rng = np.random.default_rng(11)
    alpha = list("abcde")
    pairs = []
    for _ in range(200):
        la, lb = rng.integers(0, 12, 2)
        pairs.append(("".join(rng.choice(alpha, la)),
                      "".join(rng.choice(alpha, lb))))
    pairs += [("", ""), ("", "abc"), ("abc", ""), ("same", "same"),
              ("kitten", "sitting"), ("flaw", "lawn"), ("é∂ü", "e∂u")]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = levenshtein_batch(a, b)
    exp = np.array([_lev_ref(x, y) for x, y in pairs])
    assert np.array_equal(got, exp)


def test_fuzzy_value_pairs_blocked_and_deduped():
    t = pa.table({
        "blk": pa.array(["x", "x", "x", "x", "y", "y"]),
        "name": pa.array(["red widget", "red widgit", "red widget",
                          "blue thing", "red widgit", "red widget"]),
    })
    out = _collect(fuzzy_value_pairs(
        rd.from_arrow(t).repartition(3), ["blk"], "name", max_dist=2,
        left_alias="a", right_alias="b"))
    rows = sorted(zip(out.column("blk").to_pylist(),
                      out.column("a").to_pylist(),
                      out.column("b").to_pylist(),
                      out.column("dist").to_pylist()))
    # each block reports the distinct near pair exactly once, a < b
    assert rows == [("x", "red widget", "red widgit", 1),
                    ("y", "red widget", "red widgit", 1)]


def test_grouped_mad_medians_and_outliers():
    # group a: median 3, MAD 1; 100 is an outlier (97 > 3*1.4826*1)
    t = pa.table({
        "g": pa.array(["a"] * 5 + ["b"] * 2),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 100.0, 7.0, 7.0]),
    })
    out = _collect(grouped_mad(rd.from_arrow(t).repartition(2), ["g"], "v"))
    d = {g: (m, md, n) for g, m, md, n in zip(
        out.column("g").to_pylist(), out.column("med").to_pylist(),
        out.column("mad").to_pylist(), out.column("n_outliers").to_pylist())}
    assert d["a"] == (3.0, 1.0, 1)
    # constant group: MAD 0, nothing exceeds 0-width band
    assert d["b"] == (7.0, 0.0, 0)


def test_inverted_postings_cap_min_df_and_cross_batch_dedup():
    # "hot" appears in every doc (df 5, capped at 3 ids); "rare" in one
    docs = pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "text": pa.array(["hot rare", "hot hot", "hot", "hot", "hot"]),
    })
    out = _collect(inverted_postings(
        rd.from_arrow(docs).repartition(3), min_df=2, cap=3))
    d = {t: (df, p) for t, df, p in zip(out.column("term").to_pylist(),
                                        out.column("df").to_pylist(),
                                        out.column("postings").to_pylist())}
    assert d == {"hot": (5, "0,1,2")}  # df counts DISTINCT docs; cap trims

    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute("""
        with td as (select distinct doc_id,
                           unnest(string_split(text, ' ')) as term
                    from documents)
        select term, count(*) as df,
               array_to_string((array_agg(doc_id order by doc_id))[1:3],
                               ',') as postings
        from td group by term having count(*) >= 2
    """).fetchall()
    assert {r[0]: (r[1], r[2]) for r in exp} == d


def test_fuzzy_and_postings_tolerate_nulls():
    t = pa.table({
        "blk": pa.array(["x", "x", "x"]),
        "name": pa.array(["abc", None, "abd"]),
    })
    out = _collect(fuzzy_value_pairs(rd.from_arrow(t), ["blk"], "name", 1,
                                     left_alias="a", right_alias="b"))
    assert out.num_rows == 1  # (abc, abd); the null row is ignored

    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": pa.array(["w w", None])})
    p = _collect(inverted_postings(rd.from_arrow(docs), min_df=1, cap=5))
    assert p.column("term").to_pylist() == ["w"]
    assert p.column("df").to_pylist() == [1]


def test_chunk_documents_windows_and_edges():
    from vlm_eden_dataset_etl_ray.functions.text import chunk_documents

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c d e f g", "x", None]),
    })
    out = _collect(chunk_documents(rd.from_arrow(docs), chunk_tokens=4,
                                   overlap=2)).sort_by(
        [("doc_id", "ascending"), ("chunk_id", "ascending")])
    rows = list(zip(out.column("doc_id").to_pylist(),
                    out.column("chunk_id").to_pylist(),
                    out.column("chunk_text").to_pylist()))
    # doc 1: n=7, step=2, starts 0,2,4 -> windows of 4 (last is short)
    assert rows == [(1, 0, "a b c d"), (1, 1, "c d e f"), (1, 2, "e f g"),
                    (2, 0, "x")]  # short doc -> exactly one chunk
    # null text -> no chunks (doc 3 absent)

    import pytest
    with pytest.raises(ValueError):
        chunk_documents(rd.from_arrow(docs), chunk_tokens=4, overlap=4)


def test_zscore_stable_under_large_mean():
    from vlm_eden_dataset_etl_ray.functions.relational import zscore_normalize
    # mean 1e8, stddev_pop ~0.816: the one-pass E[x^2]-mean^2 shortcut
    # cancels to 0 here and silently nulls the group; two-pass must not
    base = 1e8
    t = pa.table({"k": pa.array([1] * 6, pa.int64()),
                  "v": pa.array([base, base + 1, base + 2] * 2)})
    out = _collect(zscore_normalize(rd.from_arrow(t).repartition(2),
                                    "k", "v")).sort_by("v")
    z = out.column("zscore").to_pylist()
    assert None not in z
    assert abs(z[0] - round(-1 / (2 / 3) ** 0.5, 4)) < 1e-9
    assert abs(z[5] - round(1 / (2 / 3) ** 0.5, 4)) < 1e-9


def test_orc_duplicate_content_blocks_all_land(tmp_path):
    import os

    from vlm_eden_dataset_etl_ray.sources.orc import (
        read_orc_table, write_orc_table)

    out = str(tmp_path / "orc")
    t = pa.table({"k": pa.array([7] * 100, pa.int64())})
    n = write_orc_table(rd.from_arrow(t).repartition(4), out)
    assert n == len([f for f in os.listdir(out) if f.endswith(".orc")]) == 4
    assert _collect(read_orc_table(out)).num_rows == 100


def test_inverted_postings_string_ids():
    docs = pa.table({"doc_id": pa.array(["u-b", "u-a"]),
                     "text": pa.array(["w", "w"])})
    out = _collect(inverted_postings(rd.from_arrow(docs), min_df=1, cap=5))
    assert out.column("postings").to_pylist() == ["u-a,u-b"]  # lexicographic


def test_tfidf_rejects_duplicate_doc_ids():
    import pytest

    from vlm_eden_dataset_etl_ray.functions.text import tfidf

    docs = pa.table({"doc_id": pa.array([1, 1], pa.int64()),
                     "text": pa.array(["a", "b"])})
    with pytest.raises(Exception, match="one row per document"):
        _collect(tfidf(rd.from_arrow(docs)))
