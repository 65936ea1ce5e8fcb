"""Driver-contract regression tests: a representative subset of
``__ray_entry__.queries()`` checked against their DuckDB oracles at
sf0.001 (the full sweep runs via tools/check_contract.py at sf0.01)."""

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import __ray_entry__ as entry_mod
from check_contract import TABLES, compare, to_table

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "cdc_replay_events",
    "pricing_summary",
    "latest_event_per_user",
    "latest_event_with_customer",
    "event_types_per_user",
    "customers_without_recent_orders",
    "brand_revenue",
    "daily_event_counts",
    "monthly_order_priority_counts",
    "tz_local_daily_counts",
    "append_event_types",
    "tenant_slug_schemas",
    "normalized_documents",
    "calendar_dim",
    "dedup_exact_documents",
    "ngram_jaccard_dupes",
    "knn_cosine_topk",
    "token_stats_docs",
    "quality_scores_docs",
    "multimodal_decode_meta",
    "user_sessions",
    "top10_orders",
    "asof_latest_order",
    "embedding_centroids",
    # round-3 continuation additions
    "span_dedup_documents",
    "debounced_events",
    "funnel_conversion",
    "cohort_retention",
    "weighted_sample_docs",
    "k_anonymous_events",
    "forecast_revenue",
    "rolling_median_value",
    "event_type_transitions",
    # round-3 tail 7/8 additions
    "dml_delete_update",
    "expectation_report_events",
    "fuzzy_part_names_global",
    "user_first_last_events",
    "cont_price_quantiles",
    "nation_region_grid",
    "order_price_buckets",
    "cheapest_item_per_order",
    # this session's additions
    "cdc_merge_into",
    "prefix_jaccard_dupes",
    "snm_part_names",
    "join_view_orders",
    "cdc_rehash_replay",
    "cdc_wap_audit",
    "cdc_dead_letter",
    "cdc_point_lookup",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, duck):
    ray_t = to_table(entry_mod.queries()[name](SF_DIR))
    ora_t = duck.sql(entry_mod.oracle_sql()[name]).arrow()
    problems = compare(name, ray_t, ora_t)
    assert not problems, problems


def test_entry_smoke():
    ds = entry_mod.entry()
    t = to_table(ds)
    assert t.num_rows > 0
    assert set(t.column_names) == {"doc_id", "lsn", "n_tok", "source", "tokens"}


def test_rows_only_queries_run():
    for name in ["minhash_near_dupes", "minhash_dedup_docs", "simhash_near_dupes",
                 "lang_id_docs", "knn_ivf_topk", "tokens_replay_synthetic"]:
        t = to_table(entry_mod.queries()[name](SF_DIR))
        assert t.num_rows >= 0


def test_every_oracle_has_a_query():
    qs = entry_mod.queries()
    for name in entry_mod.oracle_sql():
        assert name in qs, f"oracle {name} has no query"


def test_minhash_recall_vs_exact():
    """LSH with 128 perms / 32 bands at t=0.97 should recover ~all exact
    pairs on this corpus (sanity of the scale path vs the oracle baseline)."""
    exact = to_table(entry_mod.queries()["ngram_jaccard_dupes"](SF_DIR))
    lsh = to_table(entry_mod.queries()["minhash_near_dupes"](SF_DIR))
    exact_pairs = set(zip(exact.column("doc_a").to_pylist(), exact.column("doc_b").to_pylist()))
    lsh_pairs = set(zip(lsh.column("doc_a").to_pylist(), lsh.column("doc_b").to_pylist()))
    assert lsh_pairs <= exact_pairs  # verification step guarantees precision
    recall = len(lsh_pairs & exact_pairs) / max(1, len(exact_pairs))
    assert recall >= 0.9, recall


def test_minhash_dedup_clusters_cover_exact_pairs():
    """Cluster version: every exact near-dup pair must land in one cluster,
    and cluster reps are the minimum member (keep-first policy)."""
    exact = to_table(entry_mod.queries()["ngram_jaccard_dupes"](SF_DIR))
    clusters = to_table(entry_mod.queries()["minhash_dedup_docs"](SF_DIR))
    rep = dict(zip(clusters.column("doc_id").to_pylist(),
                   clusters.column("cluster_rep").to_pylist()))
    pairs = list(zip(exact.column("doc_a").to_pylist(), exact.column("doc_b").to_pylist()))
    same = sum(1 for a, b in pairs if rep[a] == rep[b])
    assert same / max(1, len(pairs)) >= 0.9
    kept = clusters.filter(clusters.column("is_kept")).column("doc_id").to_pylist()
    assert len(kept) < clusters.num_rows  # some dups were actually collapsed
    for d, r in rep.items():
        assert r <= d


def test_train_test_split_deterministic_and_disjoint():
    t1 = to_table(entry_mod.queries()["train_test_split"](SF_DIR))
    t2 = to_table(entry_mod.queries()["train_test_split"](SF_DIR))
    assert t1.sort_by("doc_id").equals(t2.sort_by("doc_id"))  # rerun-stable
    splits = dict(zip(t1.column("doc_id").to_pylist(), t1.column("split").to_pylist()))
    assert set(splits.values()) <= {"train", "test"}
    frac = sum(1 for v in splits.values() if v == "test") / len(splits)
    assert 0.02 <= frac <= 0.25  # ~10% at n=500


def test_ngram_shingles_window_correctly(duck):
    """ngram>1 shingling: n-word docs yield n-k+1 shingles (incomplete tail
    windows dropped), and bigram Jaccard pairs match a DuckDB oracle."""
    import pyarrow as pa
    import ray.data as rd

    from vlm_eden_dataset_etl_ray.functions.dedup import (_term_hash_sets,
                                                          ngram_jaccard_pairs)

    ds = rd.from_arrow(pa.table({"doc_id": [1], "text": ["a b c d"]}))
    for n, expected in ((2, 3), (3, 2)):
        out = to_table(_term_hash_sets(ds, "doc_id", "text", ngram=n))
        assert len(out.column("__terms")[0].as_py()) == expected

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    got = ngram_jaccard_pairs(docs, "doc_id", "text", 0.6, ngram=2)
    exp = duck.sql("""
        with t as (select doc_id,
                   list_distinct(list_transform(range(len(string_split(text,' '))-1),
                       i -> string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) w
                   from documents)
        select count(*) n from (
            select cast(len(list_intersect(a.w,b.w)) as double)
                   / len(list_distinct(list_concat(a.w,b.w))) j
            from t a join t b on a.doc_id < b.doc_id) where j >= 0.6
    """).fetchone()[0]
    assert got.num_rows == exp


def test_knn_lsh_recall_vs_brute_force():
    """Random-hyperplane LSH ANN should recover most brute-force neighbors
    at 8 bits / 3 probe bits on this corpus."""
    brute = to_table(entry_mod.queries()["knn_cosine_topk"](SF_DIR))
    lsh = to_table(entry_mod.queries()["knn_lsh_topk"](SF_DIR))
    b = set(zip(brute.column("query_id").to_pylist(),
                brute.column("neighbor_id").to_pylist()))
    l = set(zip(lsh.column("query_id").to_pylist(),
                lsh.column("neighbor_id").to_pylist()))
    assert len(l & b) / max(1, len(b)) >= 0.6, (len(l & b), len(b))
