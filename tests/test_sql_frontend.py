"""SQL front-end (vlm_eden_dataset_etl_ray.sql) vs DuckDB on the same
parquet, plus parser/compiler error behavior and plan-shape checks.

The reference's user surface is SQL strings (reference
queries/fact_studies.py:3-35); this suite proves the engine's declarative
layer executes the documented subset with DuckDB-identical semantics."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray.sql import SqlError, sql, sql_table

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_matches(con, query: str, cardinality: str = "low",
                    expect_rows: int | None = None):
    mine = _canon(sql_table(query, SF_DIR, cardinality=cardinality).to_pandas())
    oracle = _canon(con.execute(query).fetchdf())
    assert list(mine.columns) == list(oracle.columns), \
        (list(mine.columns), list(oracle.columns))
    assert len(mine) == len(oracle)
    if expect_rows is not None:
        assert len(mine) == expect_rows
    for c in mine.columns:
        a, b = mine[c], oracle[c]
        if a.dtype != b.dtype:
            try:
                a = a.astype("float64").round(6)
                b = b.astype("float64").round(6)
            except (TypeError, ValueError):
                a, b = a.astype(str), b.astype(str)
        pd.testing.assert_series_equal(a, b, check_names=False)


QUERIES = {
    "proj_filter": "SELECT o_orderkey, o_totalprice * 1.1 AS gross FROM orders "
                   "WHERE o_orderstatus = 'F' AND o_totalprice > 1000",
    "tpch_q1ish": "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
                  "sum(l_extendedprice) AS sum_base, "
                  "sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price, "
                  "avg(l_discount) AS avg_disc, count(*) AS count_order "
                  "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
                  "GROUP BY l_returnflag, l_linestatus "
                  "ORDER BY l_returnflag, l_linestatus",
    "join_group": "SELECT n_name, count(*) AS n_cust, "
                  "round(sum(c_acctbal), 2) AS total_bal "
                  "FROM customer JOIN nation ON c_nationkey = n_nationkey "
                  "GROUP BY n_name ORDER BY n_cust DESC, n_name LIMIT 5",
    "left_antijoin_empty": "SELECT c_custkey, c_name FROM customer "
                           "LEFT JOIN orders ON c_custkey = o_custkey "
                           "WHERE o_orderkey IS NULL ORDER BY c_custkey",
    "case_like_in": "SELECT p_partkey, CASE WHEN p_size < 10 THEN 'small' "
                    "WHEN p_size < 30 THEN 'mid' ELSE 'big' END AS bucket "
                    "FROM part WHERE p_name LIKE '%a%' "
                    "AND p_brand IN ('Brand#11', 'Brand#12', 'Brand#13')",
    "distinct_pair": "SELECT DISTINCT lang, source FROM documents",
    "count_distinct": "SELECT lang, count(DISTINCT source) AS n_src, "
                      "count(*) AS n FROM documents GROUP BY lang ORDER BY lang",
    "global_agg": "SELECT count(*) AS n, sum(value) AS total, avg(value) AS mean, "
                  "min(ts) AS first_ts, max(ts) AS last_ts FROM events",
    "derived_table": "SELECT bucket, count(*) AS n FROM "
                     "(SELECT o_orderkey, CASE WHEN o_totalprice > 5000 "
                     "THEN 'hi' ELSE 'lo' END AS bucket FROM orders) x "
                     "GROUP BY bucket ORDER BY bucket",
    "union_all": "SELECT c_name AS name, c_acctbal AS bal FROM customer "
                 "WHERE c_acctbal > 9000 UNION ALL "
                 "SELECT s_name AS name, s_acctbal AS bal FROM supplier "
                 "WHERE s_acctbal > 5500 ORDER BY bal DESC, name",
    "having": "SELECT user_id, count(*) AS n FROM events GROUP BY user_id "
              "HAVING count(*) > 5 ORDER BY n DESC, user_id LIMIT 10",
    "scalar_exprs": "SELECT e.event_id, upper(e.event_type) AS et, "
                    "length(e.props) AS lp, "
                    "coalesce(nullif(e.event_type, 'click'), 'CLICKED') AS nn, "
                    "year(e.ts) AS y, month(e.ts) AS m, "
                    "cast(e.value AS BIGINT) AS vi, e.event_id % 7 AS m7, "
                    "substr(e.event_type, 2, 3) AS s3, "
                    "e.event_type || '!' AS bang, -e.value AS neg, "
                    "abs(e.value - 50) AS dist, floor(e.value) AS fl "
                    "FROM events e WHERE e.value BETWEEN 10 AND 90 "
                    "AND NOT e.event_type = 'view' ORDER BY e.event_id LIMIT 50",
    "between_ts": "SELECT count(*) AS n FROM orders WHERE o_orderdate BETWEEN "
                  "TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'",
    "three_way_join": "SELECT r_name, n_name, count(*) AS n_supp FROM supplier "
                      "JOIN nation ON s_nationkey = n_nationkey "
                      "JOIN region ON n_regionkey = r_regionkey "
                      "GROUP BY r_name, n_name ORDER BY r_name, n_name",
    "group_by_expr": "SELECT year(o_orderdate) AS y, o_orderpriority, "
                     "count(*) AS n, max(o_totalprice) AS mx FROM orders "
                     "GROUP BY year(o_orderdate), o_orderpriority "
                     "ORDER BY y, o_orderpriority",
    "order_by_ordinal": "SELECT o_orderpriority, count(*) AS n FROM orders "
                        "GROUP BY o_orderpriority ORDER BY 2 DESC, 1",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_matches_duckdb(ddb, name):
    _assert_matches(ddb, QUERIES[name])


@pytest.mark.parametrize("name", ["tpch_q1ish", "count_distinct", "having",
                                  "distinct_pair"])
def test_matches_duckdb_shuffle_path(ddb, name):
    """cardinality='high' routes the combine through the Ray groupby
    shuffle — same results, different physical plan."""
    _assert_matches(ddb, QUERIES[name], cardinality="high")


def test_empty_result_keeps_schema():
    t = sql_table(QUERIES["left_antijoin_empty"], SF_DIR)
    assert t.num_rows == 0
    assert t.column_names == ["c_custkey", "c_name"]
    assert t.schema.field("c_custkey").type == pa.int64()


def test_select_star(ddb):
    _assert_matches(ddb, "SELECT * FROM nation ORDER BY n_nationkey")


def test_tables_binding():
    """Names can be pre-bound to existing Datasets (a lake scan, an
    upstream stage) instead of sf_dir parquet."""
    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3], "lang": ["en", "de", "en"]}))
    t = sql_table("SELECT lang, count(*) AS n FROM documents GROUP BY lang "
                  "ORDER BY lang", tables={"documents": docs})
    assert t.to_pydict() == {"lang": ["de", "en"], "n": [1, 2]}


def test_null_semantics():
    tbl = pa.table({"k": ["a", "a", "b", None], "v": [1, None, 3, 4]})
    t = sql_table("SELECT k, count(*) AS n, count(v) AS nv, sum(v) AS s "
                  "FROM t GROUP BY k ORDER BY k",
                  tables={"t": rd.from_arrow(tbl)})
    d = t.to_pydict()
    # arrow sorts nulls last by default; duckdb NULLS LAST for ASC matches
    assert d["n"] == [2, 1, 1]
    assert d["nv"] == [1, 1, 1]
    assert d["s"] == [1, 3, 4]
    # WHERE drops rows whose predicate is null (SQL three-valued logic)
    t2 = sql_table("SELECT k FROM t WHERE v > 1", tables={"t": rd.from_arrow(tbl)})
    assert t2.num_rows == 2  # v=3 and v=4 rows; the null-v row is dropped
    assert set(t2.column("k").to_pylist()) == {"b", None}


def test_parser_errors():
    with pytest.raises(SqlError):
        sql("SELECT FROM orders", SF_DIR)
    with pytest.raises(SqlError, match="unsupported function"):
        sql("SELECT regexp_replace(o_orderstatus, 'a', 'b') FROM orders", SF_DIR)
    with pytest.raises(SqlError, match="unknown column"):
        sql("SELECT nope FROM orders", SF_DIR)
    with pytest.raises(SqlError, match="unknown table"):
        sql("SELECT x FROM not_a_table", SF_DIR)
    with pytest.raises(SqlError, match="GROUP BY"):
        sql("SELECT o_orderstatus, count(*) AS n FROM orders "
            "GROUP BY o_orderpriority", SF_DIR)
    with pytest.raises(SqlError, match="column equality"):
        sql("SELECT 1 AS one FROM orders JOIN customer "
            "ON o_custkey > c_custkey", SF_DIR)
    with pytest.raises(SqlError, match="ambiguous"):
        sql("SELECT value FROM events e1 JOIN events e2 "
            "ON event_id = event_id", SF_DIR)


def test_compile_time_type_errors_surface_on_driver():
    """The zero-row schema twin runs every expression driver-side at
    compile time, so a type error raises from sql() itself — not from
    inside a Ray task mid-execution."""
    with pytest.raises(Exception) as ei:
        sql("SELECT lower(o_totalprice) AS x FROM orders", SF_DIR)
    assert "Ray" not in type(ei.value).__name__


def test_scan_projection_pruned():
    """The compiled scan reads only referenced columns."""
    ds = sql("SELECT o_orderkey FROM orders WHERE o_totalprice > 100", SF_DIR)
    # the read stage's projection is visible in the plan's input files/
    # schema twin; cheapest check: the result has exactly one column and
    # the pre-projection batch schema (first map stage input) excludes
    # unused columns — assert via the twin on a direct scan
    t = sql_table("SELECT o_orderkey FROM orders WHERE o_totalprice > 100 "
                  "LIMIT 5", SF_DIR)
    assert t.column_names == ["o_orderkey"]
    assert ds.count() > 0


def test_pushdown_filter_matches(ddb):
    """A fully-pushable conjunction (pushed to parquet row groups) returns
    identical results to DuckDB."""
    _assert_matches(
        ddb,
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 5000 AND o_orderstatus = 'O' "
        "AND o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "ORDER BY o_orderkey")


def test_like_not_like(ddb):
    _assert_matches(ddb, "SELECT count(*) AS n FROM part "
                         "WHERE p_name LIKE 'a%' OR p_name NOT LIKE '%z%'")


def test_division_promotes_to_double():
    t = sql_table("SELECT 7 / 2 AS q FROM region LIMIT 1", SF_DIR)
    assert t.column("q").to_pylist() == [3.5]


def test_order_by_expression(ddb):
    _assert_matches(ddb, "SELECT n_name FROM nation "
                         "ORDER BY length(n_name) DESC, n_name LIMIT 5")


# -- subqueries ---------------------------------------------------------------

SUBQ = {
    "in_subq": "SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey IN "
               "(SELECT c_custkey FROM customer WHERE c_acctbal > 9000) "
               "ORDER BY o_orderkey",
    "not_in_subq": "SELECT count(*) AS n FROM orders WHERE o_custkey NOT IN "
                   "(SELECT c_custkey FROM customer WHERE c_acctbal > 9000)",
    "scalar_sub_where": "SELECT count(*) AS n FROM orders WHERE o_totalprice > "
                        "(SELECT avg(o_totalprice) FROM orders)",
    "scalar_sub_select": "SELECT max(o_totalprice) - "
                         "(SELECT min(o_totalprice) FROM orders) "
                         "AS price_range FROM orders",
    "in_subq_expr_probe": "SELECT count(*) AS n FROM events WHERE user_id + 0 "
                          "IN (SELECT user_id FROM events "
                          "WHERE event_type = 'purchase')",
    "in_subq_before_join": "SELECT n_name, count(*) AS n FROM customer "
                           "JOIN nation ON c_nationkey = n_nationkey "
                           "WHERE c_custkey IN (SELECT o_custkey FROM orders "
                           "WHERE o_totalprice > 8000) "
                           "GROUP BY n_name ORDER BY n_name",
}


@pytest.mark.parametrize("name", sorted(SUBQ))
def test_subqueries_match_duckdb(ddb, name):
    _assert_matches(ddb, SUBQ[name])


def test_in_subquery_shuffle_path(ddb, monkeypatch):
    """Force the key set over the broadcast budget so the partitioned
    hash_semi_join path runs — results identical to the broadcast path."""
    import vlm_eden_dataset_etl_ray.sql as sqlmod
    monkeypatch.setattr(sqlmod, "IN_SUBQUERY_BROADCAST_BYTES", 1)
    _assert_matches(ddb, SUBQ["in_subq"])
    _assert_matches(ddb, SUBQ["not_in_subq"])


def test_not_in_null_semantics():
    """SQL: x NOT IN (set containing NULL) is never TRUE; a null probe
    matches neither IN nor NOT IN."""
    t = rd.from_arrow(pa.table({"k": [1, 2, 3, None]}))
    s_null = rd.from_arrow(pa.table({"v": [1, None]}))
    s_clean = rd.from_arrow(pa.table({"v": [1]}))
    r = sql_table("SELECT k FROM t WHERE k NOT IN (SELECT v FROM s)",
                  tables={"t": t, "s": s_null})
    assert r.num_rows == 0
    r2 = sql_table("SELECT k FROM t WHERE k IN (SELECT v FROM s)",
                   tables={"t": t, "s": s_null})
    assert r2.column("k").to_pylist() == [1]
    r3 = sql_table("SELECT k FROM t WHERE k NOT IN (SELECT v FROM s)",
                   tables={"t": t, "s": s_clean})
    assert sorted(r3.column("k").to_pylist()) == [2, 3]  # null probe dropped


def test_scalar_subquery_errors():
    with pytest.raises(SqlError, match="exactly one column"):
        sql("SELECT 1 AS x FROM orders WHERE o_totalprice > "
            "(SELECT o_orderkey, o_custkey FROM orders)", SF_DIR)
    with pytest.raises(SqlError, match="returned"):
        sql("SELECT 1 AS x FROM orders WHERE o_totalprice > "
            "(SELECT o_totalprice FROM orders LIMIT 2)", SF_DIR)


def test_in_subquery_only_in_where():
    with pytest.raises(SqlError, match="WHERE conjunct"):
        sql_table("SELECT CASE WHEN o_custkey IN (SELECT c_custkey FROM "
                  "customer) THEN 1 ELSE 0 END AS f FROM orders", SF_DIR)


def test_group_by_ordinal_and_alias(ddb):
    _assert_matches(ddb, "SELECT o_orderpriority, o_orderstatus, count(*) AS n "
                         "FROM orders GROUP BY 1, 2 ORDER BY 1, 2")
    _assert_matches(ddb, "SELECT year(o_orderdate) AS y, count(*) AS n "
                         "FROM orders GROUP BY y ORDER BY y")
    _assert_matches(ddb, "SELECT CASE WHEN o_totalprice > 5000 THEN 'hi' "
                         "ELSE 'lo' END AS tier, count(*) AS n "
                         "FROM orders GROUP BY tier HAVING n > 10 ORDER BY tier")


# ---------------------------------------------------------------------------
# window functions (OVER ...) — each form vs DuckDB on the same parquet
# ---------------------------------------------------------------------------


def test_window_partitioned_ranks(ddb):
    _assert_matches(ddb, "SELECT o_orderkey, row_number() OVER "
                         "(PARTITION BY o_custkey ORDER BY o_totalprice, "
                         "o_orderkey) AS rn FROM orders ORDER BY o_orderkey")
    _assert_matches(ddb, "SELECT o_orderkey, rank() OVER "
                         "(PARTITION BY o_orderpriority ORDER BY "
                         "o_orderstatus) AS r FROM orders "
                         "ORDER BY o_orderkey")
    _assert_matches(ddb, "SELECT o_orderkey, dense_rank() OVER "
                         "(PARTITION BY o_orderstatus ORDER BY "
                         "o_orderpriority DESC) AS dr FROM orders "
                         "ORDER BY o_orderkey")


def test_window_global_forms(ddb):
    _assert_matches(ddb, "SELECT c_custkey, row_number() OVER "
                         "(ORDER BY c_acctbal DESC, c_custkey) AS rn "
                         "FROM customer ORDER BY c_custkey")
    _assert_matches(ddb, "SELECT c_custkey, ntile(4) OVER "
                         "(ORDER BY c_acctbal, c_custkey) AS q "
                         "FROM customer ORDER BY c_custkey")
    _assert_matches(ddb, "SELECT c_custkey, cume_dist() OVER "
                         "(ORDER BY c_acctbal) AS cd, percent_rank() OVER "
                         "(ORDER BY c_acctbal) AS pr "
                         "FROM customer ORDER BY c_custkey")


def test_window_running_sum_and_lag(ddb):
    _assert_matches(ddb, "SELECT o_orderkey, sum(o_totalprice) OVER "
                         "(PARTITION BY o_custkey ORDER BY o_orderdate, "
                         "o_orderkey) AS run FROM orders ORDER BY o_orderkey")
    _assert_matches(ddb, "SELECT o_orderkey, lag(o_totalprice) OVER "
                         "(PARTITION BY o_custkey ORDER BY o_orderdate, "
                         "o_orderkey) AS prev FROM orders "
                         "ORDER BY o_orderkey")


def test_window_filter_under_window(ddb):
    # WHERE applies before the window (SQL semantics) — verify numbering
    # is computed over the filtered relation
    _assert_matches(ddb, "SELECT o_orderkey, row_number() OVER "
                         "(PARTITION BY o_custkey ORDER BY o_totalprice "
                         "DESC, o_orderkey) AS rn FROM orders "
                         "WHERE o_orderstatus = 'F' ORDER BY o_orderkey")


def test_window_errors():
    with pytest.raises(SqlError, match="GROUP BY"):
        sql_table("SELECT o_custkey, row_number() OVER (ORDER BY "
                  "count(*)) AS rn FROM orders GROUP BY o_custkey", SF_DIR)
    with pytest.raises(SqlError, match="requires ORDER BY"):
        sql_table("SELECT row_number() OVER () AS rn FROM orders", SF_DIR)
    with pytest.raises(SqlError, match="unsupported window function"):
        sql_table("SELECT nth_value(o_orderkey, 2) OVER (ORDER BY "
                  "o_orderkey) AS f FROM orders", SF_DIR)
    with pytest.raises(SqlError, match="PARTITION BY"):
        sql_table("SELECT first_value(o_orderkey) OVER (ORDER BY "
                  "o_orderkey) AS f FROM orders", SF_DIR)


def test_window_running_aggregates(ddb):
    _assert_matches(ddb, "SELECT o_orderkey, min(o_totalprice) OVER "
                         "(PARTITION BY o_custkey ORDER BY o_orderdate, "
                         "o_orderkey) AS lo, max(o_totalprice) OVER "
                         "(PARTITION BY o_custkey ORDER BY o_orderdate, "
                         "o_orderkey) AS hi FROM orders ORDER BY o_orderkey")
    _assert_matches(ddb, "SELECT o_orderkey, count(*) OVER (PARTITION BY "
                         "o_custkey ORDER BY o_orderdate, o_orderkey) AS "
                         "nth, round(avg(o_totalprice) OVER (PARTITION BY "
                         "o_custkey ORDER BY o_orderdate, o_orderkey), 4) "
                         "AS run_avg FROM orders ORDER BY o_orderkey")


def test_window_lead_and_first_value(ddb):
    _assert_matches(ddb, "SELECT o_orderkey, lead(o_totalprice) OVER "
                         "(PARTITION BY o_custkey ORDER BY o_orderdate, "
                         "o_orderkey) AS nxt, first_value(o_totalprice) "
                         "OVER (PARTITION BY o_custkey ORDER BY "
                         "o_orderdate, o_orderkey) AS fst "
                         "FROM orders ORDER BY o_orderkey")


def test_window_fusion_single_exchange(monkeypatch, ddb):
    # windows sharing (PARTITION BY, ORDER BY) must compile to ONE fused
    # keyed_window_agg call (one groupby exchange), not one per window
    import vlm_eden_dataset_etl_ray.functions.relational as R

    calls = []
    orig = R.keyed_window_agg

    def spy(ds, key, order_cols, specs, **kw):
        calls.append(sorted(s[0] for s in specs))
        return orig(ds, key, order_cols, specs, **kw)

    monkeypatch.setattr(R, "keyed_window_agg", spy)
    q = ("SELECT o_orderkey, sum(o_totalprice) OVER (PARTITION BY o_custkey "
         "ORDER BY o_orderdate, o_orderkey) AS s, lag(o_totalprice) OVER "
         "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS p, "
         "count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, "
         "o_orderkey) AS n FROM orders ORDER BY o_orderkey")
    _assert_matches(ddb, q)
    assert calls == [["count", "lag", "sum"]]


def test_qualify_top_n_per_group(ddb):
    # the declarative top-N-per-group idiom
    _assert_matches(ddb, "SELECT o_orderkey, o_custkey, o_totalprice "
                         "FROM orders QUALIFY row_number() OVER "
                         "(PARTITION BY o_custkey ORDER BY o_totalprice "
                         "DESC, o_orderkey) <= 3 ORDER BY o_orderkey")
    # alias reference: the select-list window column filters itself
    _assert_matches(ddb, "SELECT o_orderkey, row_number() OVER "
                         "(PARTITION BY o_custkey ORDER BY o_orderdate, "
                         "o_orderkey) AS rn FROM orders "
                         "QUALIFY rn = 1 ORDER BY o_orderkey")
    # identical OVER spec in select + QUALIFY computes once (hoist dedup)
    _assert_matches(ddb, "SELECT o_orderkey, rank() OVER (PARTITION BY "
                         "o_orderstatus ORDER BY o_orderpriority) AS r "
                         "FROM orders QUALIFY rank() OVER (PARTITION BY "
                         "o_orderstatus ORDER BY o_orderpriority) <= 2 "
                         "ORDER BY o_orderkey")


def test_qualify_requires_window():
    with pytest.raises(SqlError, match="QUALIFY requires a window"):
        sql_table("SELECT o_orderkey FROM orders QUALIFY o_orderkey > 5",
                  SF_DIR)


def test_qualify_topn_physical_rewrite(monkeypatch, ddb):
    # `QUALIFY row_number() OVER (…) <= n` with the rank referenced nowhere
    # else must compile to the skew-proof topk_per_key pre-reduce — no
    # global rank assignment
    import vlm_eden_dataset_etl_ray.functions.relational as R
    import vlm_eden_dataset_etl_ray.functions.windows as W

    topk_calls, rank_calls = [], []
    orig = R.topk_per_key
    monkeypatch.setattr(R, "topk_per_key",
                        lambda *a, **k: (topk_calls.append(a[2:]),
                                         orig(*a, **k))[1])
    monkeypatch.setattr(W, "keyed_rank_ids",
                        lambda *a, **k: rank_calls.append(1))
    _assert_matches(ddb, "SELECT o_orderkey, o_custkey FROM orders "
                         "QUALIFY row_number() OVER (PARTITION BY o_custkey "
                         "ORDER BY o_totalprice DESC, o_orderkey) <= 2 "
                         "ORDER BY o_orderkey")
    assert len(topk_calls) == 1 and topk_calls[0][1] == 2
    assert not rank_calls
    # literal-first, strict <, and = 1 forms also rewrite
    _assert_matches(ddb, "SELECT o_orderkey FROM orders QUALIFY 3 > "
                         "row_number() OVER (PARTITION BY o_orderstatus "
                         "ORDER BY o_totalprice, o_orderkey) "
                         "ORDER BY o_orderkey")
    _assert_matches(ddb, "SELECT o_orderkey FROM orders QUALIFY "
                         "row_number() OVER (PARTITION BY o_custkey "
                         "ORDER BY o_orderdate, o_orderkey) = 1 "
                         "ORDER BY o_orderkey")
    assert len(topk_calls) == 3 and not rank_calls
    # but when the select list needs the rank column, no rewrite applies
    monkeypatch.undo()
    _assert_matches(ddb, "SELECT o_orderkey, row_number() OVER (PARTITION "
                         "BY o_custkey ORDER BY o_totalprice DESC, "
                         "o_orderkey) AS rn FROM orders QUALIFY rn <= 2 "
                         "ORDER BY o_orderkey")


def test_window_lag_lead_offsets(ddb):
    _assert_matches(ddb, "SELECT o_orderkey, lag(o_totalprice, 2) OVER "
                         "(PARTITION BY o_custkey ORDER BY o_orderdate, "
                         "o_orderkey) AS p2, lead(o_totalprice, 3) OVER "
                         "(PARTITION BY o_custkey ORDER BY o_orderdate, "
                         "o_orderkey) AS n3 FROM orders ORDER BY o_orderkey")
    with pytest.raises(SqlError, match="literal integer offset"):
        sql_table("SELECT lag(o_totalprice, o_orderkey) OVER (PARTITION BY "
                  "o_custkey ORDER BY o_orderkey) AS x FROM orders", SF_DIR)


def test_window_keyed_desc_ordering(ddb):
    # DESC in the keyed family: reverse-cumulative sum, lag in desc order
    _assert_matches(ddb, "SELECT o_orderkey, sum(o_totalprice) OVER "
                         "(PARTITION BY o_custkey ORDER BY o_orderdate "
                         "DESC, o_orderkey DESC) AS rev_run, "
                         "lag(o_totalprice) OVER (PARTITION BY o_custkey "
                         "ORDER BY o_orderdate DESC, o_orderkey DESC) AS "
                         "nxt_price FROM orders ORDER BY o_orderkey")
    _assert_matches(ddb, "SELECT o_orderkey, first_value(o_totalprice) "
                         "OVER (PARTITION BY o_custkey ORDER BY "
                         "o_totalprice DESC, o_orderkey) AS max_price "
                         "FROM orders ORDER BY o_orderkey")
