"""Declared-query catalog (SURVEY.md §2, DQ-*).

Every entry pairs a Spark implementation (``fn(spark, sf_dir) ->
DataFrame``) with a DuckDB oracle SQL string over the same parquet
fixtures. The driver hash-compares both at sf0.01; this module is the
single source of truth for ``__spark_entry__.queries()`` /
``oracle_sql()``.

Hash-stability discipline (SURVEY.md §2 preamble):
- deterministic ORDER BY over enough columns,
- floats rounded via ROUND(x, 4) at the output boundary,
- every computed column aliased identically on both sides,
- explicit CASTs wherever the two engines' natural result types differ
  (Spark ``row_number``/``length``/``year`` return INT where DuckDB
  returns BIGINT; DuckDB ``SUM(int)`` returns HUGEINT; DuckDB
  ``floor``/``ceil`` return DOUBLE where Spark returns BIGINT).

Scale notes are attached per query family: these run at sf0.01 for the
gate but are written for the 100 TB plan shape — filters/projections
push into the parquet scan, dimension joins broadcast, aggregations use
partial (map-side) combine, top-k is TakeOrderedAndProject.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from dust_spark.tables import register_views


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple = field(default_factory=tuple)


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: tuple = ()):
    """Decorator registering a DataFrame-API query implementation."""

    def deco(fn):
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def sql_query(name: str, spark_sql: str, oracle: str | None = None, tags: tuple = ()) -> None:
    """Register a query whose Spark side is a SQL statement (Catalyst
    plans it identically to the DataFrame API). ``oracle`` defaults to
    the same SQL when the dialects agree."""

    def fn(spark: SparkSession, sf_dir: str, _sql=spark_sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle or spark_sql, tags=tags)


# ---------------------------------------------------------------------------
# B1 — scans / projections (pushdown + pruning verified: parquet scan shows
# PushedFilters and a pruned ReadSchema)
# ---------------------------------------------------------------------------

sql_query(
    "b1a_full_scan",
    "SELECT * FROM region ORDER BY r_regionkey",
    tags=("scan",),
)

sql_query(
    "b1b_dup_projection",
    # duplicate-column projection semantics (reference db/src/db.rs:441-446),
    # aliased distinctly for hash stability
    "SELECT r_name AS r_name1, r_name AS r_name2, r_regionkey FROM region ORDER BY r_regionkey",
    tags=("scan",),
)

sql_query(
    "b1c_expr_projection",
    "SELECT n_nationkey + 100 AS k, upper(n_name) AS un FROM nation ORDER BY n_nationkey",
    tags=("scan",),
)

# ---------------------------------------------------------------------------
# B2 — filters / predicates
# ---------------------------------------------------------------------------

sql_query(
    "b2a_eq_filter",
    "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey",
    tags=("filter",),
)

sql_query(
    "b2b_empty_result",
    "SELECT c_custkey FROM customer WHERE c_name = 'no_such' ORDER BY c_custkey",
    tags=("filter",),
)

sql_query(
    "b2c_range_in_ts",
    "SELECT l_orderkey, l_linenumber FROM lineitem "
    "WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A','R') "
    "AND l_shipdate >= TIMESTAMP '1995-01-01' "
    "ORDER BY l_orderkey, l_linenumber",
    tags=("filter",),
)

sql_query(
    "b2d_like_or_not",
    "SELECT p_partkey FROM part WHERE p_name LIKE '%green%' OR NOT (p_size > 10) ORDER BY p_partkey",
    tags=("filter",),
)

sql_query(
    "b2e_null_pred",
    "SELECT o_orderkey FROM orders WHERE o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL "
    "ORDER BY o_orderkey",
    tags=("filter",),
)

# ---------------------------------------------------------------------------
# B3 — joins. Dimension sides (region/nation/supplier) broadcast under the
# default 10 MB threshold at any scale; fact-fact joins shuffle on the key.
# ---------------------------------------------------------------------------

sql_query(
    "b3a_inner_join",
    "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_name",
    tags=("join",),
)

sql_query(
    "b3b_left_join",
    "SELECT c_custkey, o_orderkey FROM customer LEFT JOIN orders ON o_custkey = c_custkey "
    "ORDER BY c_custkey, o_orderkey",
    tags=("join",),
)

sql_query(
    "b3c_full_join",
    "SELECT c_custkey, o_orderkey FROM orders FULL JOIN customer ON o_custkey = c_custkey "
    "ORDER BY c_custkey, o_orderkey",
    tags=("join",),
)

sql_query(
    "b3d_cross_join",
    "SELECT r1.r_name AS name1, r2.r_name AS name2 FROM region r1 CROSS JOIN region r2 ORDER BY 1, 2",
    tags=("join",),
)

sql_query(
    "b3e_semi_join",
    "SELECT c_custkey FROM customer WHERE EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey",
    tags=("join",),
)

sql_query(
    "b3f_anti_join",
    "SELECT c_custkey FROM customer WHERE NOT EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey",
    tags=("join",),
)

sql_query(
    "b3g_theta_join",
    "SELECT s_suppkey, c_custkey FROM supplier JOIN customer "
    "ON s_acctbal < c_acctbal AND s_nationkey = c_nationkey ORDER BY s_suppkey, c_custkey",
    tags=("join",),
)

sql_query(
    "b3h_self_join",
    "SELECT a.o_orderkey AS k1, b.o_orderkey AS k2 FROM orders a JOIN orders b "
    "ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey ORDER BY 1, 2 LIMIT 100",
    tags=("join",),
)


@register(
    "b3i_star_join",
    oracle=(
        "SELECT r_name, count(*) AS c FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name ORDER BY r_name"
    ),
    tags=("join", "agg", "flagship"),
)
def star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-way star join + aggregate, DataFrame API.

    Scale shape: lineitem⋈orders shuffles on the orderkey; every
    dimension hop (customer→nation→region) broadcasts — at 100 TB the
    only wide exchange is the single fact-fact shuffle, and AQE
    coalesces the post-agg partitions.
    """
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    lineitem = spark.table("lineitem")
    orders = spark.table("orders")
    customer = spark.table("customer")
    nation = spark.table("nation")
    region = spark.table("region")

    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("c"))
        .orderBy("r_name")
    )


sql_query(
    "b3j_using_join",
    "WITH n AS (SELECT n_name, n_regionkey AS rk FROM nation), "
    "r AS (SELECT r_name, r_regionkey AS rk FROM region) "
    "SELECT n_name, r_name FROM n JOIN r USING (rk) ORDER BY n_name",
    tags=("join",),
)

# ---------------------------------------------------------------------------
# B4 — aggregations (hash-agg, partial+final combine automatic)
# ---------------------------------------------------------------------------

sql_query(
    "b4a_groupby_aggs",
    "SELECT l_returnflag, l_linestatus, count(*) AS n, ROUND(SUM(l_quantity),4) AS sq, "
    "ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS ap, "
    "MIN(l_shipdate) AS d1, MAX(l_shipdate) AS d2 "
    "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    tags=("agg",),
)

sql_query(
    "b4b_count_distinct",
    "SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS u FROM orders "
    "GROUP BY o_orderpriority ORDER BY o_orderpriority",
    tags=("agg",),
)

sql_query(
    "b4c_having",
    "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey "
    "HAVING count(*) > 1 ORDER BY o_custkey",
    tags=("agg",),
)

sql_query(
    "b4d_global_agg",
    "SELECT count(*) AS n, ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),4) AS s FROM orders",
    tags=("agg",),
)

sql_query(
    "b4e_rollup",
    "SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem "
    "GROUP BY ROLLUP (l_returnflag, l_linestatus) "
    "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST",
    tags=("agg",),
)

sql_query(
    "b4f_conditional_agg",
    # COUNT(CASE ...) returns BIGINT in both engines (SUM(int) would be
    # HUGEINT in DuckDB)
    "SELECT COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_cnt, "
    "COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_cnt FROM orders",
    tags=("agg",),
)

sql_query(
    "b4g_distinct",
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    tags=("agg",),
)

sql_query(
    "b4h_cube",
    "SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders "
    "GROUP BY CUBE (o_orderstatus, o_orderpriority) "
    "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    tags=("agg",),
)

sql_query(
    "b4j_grouping_sets",
    "SELECT o_orderstatus, o_orderpriority, count(*) AS n, "
    "ROUND(SUM(o_totalprice), 2) AS tp "
    "FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ()) "
    "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    tags=("agg",),
)

# ---------------------------------------------------------------------------
# B5 — window functions. Spark's rank family returns INT, DuckDB's BIGINT —
# Spark side casts.
# ---------------------------------------------------------------------------

@register(
    "b5a_row_number_rank",
    oracle=(
        "SELECT o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn, "
        "RANK() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk "
        "FROM orders ORDER BY o_orderkey"
    ),
    tags=("window",),
)
def b5a_row_number_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key ROW_NUMBER (partitioned window — scale-safe as-is) +
    GLOBAL RANK decomposed through global_row_number (r12 — the b5e
    treatment applied to b5a's no-PARTITION-BY rank; the (price DESC,
    orderkey) order is tie-free so rank == row_number). Plan-asserted
    free of a data-sized Exchange SinglePartition."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from dust_spark.operators.skew import global_row_number

    register_views(spark, sf_dir)
    o = spark.table("orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    ranked, _ = global_row_number(
        o, [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    )
    ranked = ranked.withColumnRenamed("rn", "rk")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        ranked.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .select("o_orderkey", "rn", F.col("rk").cast("bigint").alias("rk"))
        .orderBy("o_orderkey")
    )


sql_query(
    "b5b_lag_lead",
    "SELECT o_orderkey, LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev, "
    "LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS nxt "
    "FROM orders ORDER BY o_orderkey",
    tags=("window",),
)

sql_query(
    "b5c_first_value",
    # (l_orderkey, l_linenumber) is NOT unique in the fixtures — the
    # window order needs the quantity tiebreak for a deterministic frame
    "SELECT l_orderkey, l_linenumber, "
    "FIRST_VALUE(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) AS fq "
    "FROM lineitem ORDER BY l_orderkey, l_linenumber, fq",
    tags=("window",),
)

sql_query(
    "b5d_running_sum",
    "SELECT o_orderkey, ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey "
    "ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE),4) AS run "
    "FROM orders ORDER BY o_orderkey",
    tags=("window",),
)

@register(
    "b5e_ntile_dense_rank",
    oracle=(
        "SELECT o_orderkey, NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS q4, "
        "DENSE_RANK() OVER (ORDER BY o_orderpriority) AS dr "
        "FROM orders ORDER BY o_orderkey"
    ),
    tags=("window",),
)
def b5e_ntile_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-order ranking windows WITHOUT the single-task sort (r12,
    verdict #4). ``NTILE(4) OVER (ORDER BY ...)`` with no PARTITION BY
    plans ``Exchange SinglePartition`` — one task sorts the whole table
    at 100 TB. Scale-safe decomposition, value-identical to the window
    forms (oracled against DuckDB's native NTILE/DENSE_RANK):

    - NTILE: :func:`global_row_number` (range-partition + per-slice
      row_number + broadcast prefix offsets; the (price, orderkey)
      order is tie-free) then :func:`ntile_from_rn` pure arithmetic —
      the first n%4 buckets carry one extra row, integer-exact.
    - DENSE_RANK over a low-cardinality key depends only on the
      distinct values: :func:`broadcast_dense_rank` ranks the ~5
      priorities driver-side and broadcast-joins them back.
    """
    from pyspark.sql import functions as F

    from dust_spark.operators.skew import (
        broadcast_dense_rank,
        global_row_number,
        ntile_from_rn,
    )

    register_views(spark, sf_dir)
    o = spark.table("orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    numbered, n = global_row_number(o, ["o_totalprice", "o_orderkey"])
    return (
        broadcast_dense_rank(numbered, "o_orderpriority", out="dr")
        .select(
            "o_orderkey",
            ntile_from_rn(F.col("rn"), n, 4).alias("q4"),
            "dr",
        )
        .orderBy("o_orderkey")
    )

sql_query(
    "b5f_range_frame",
    # RANGE frame over a numeric order key + distribution functions;
    # rank-family INT vs BIGINT handled by the CAST discipline
    "SELECT o_orderkey, "
    "ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice "
    "RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW), 2) AS near_sum, "
    "ROUND(percent_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice), 4) AS pr, "
    "ROUND(cume_dist() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice), 4) AS cd "
    "FROM orders ORDER BY o_orderkey",
    tags=("window",),
)

sql_query(
    "b5g_window_filter",
    # FILTER (WHERE ...) on window aggregates: Spark lacks the clause,
    # so the Spark side carries the exact CASE folding the engine's
    # dialect layer emits (dialect._rewrite_window_filter); the DuckDB
    # oracle uses the native FILTER syntax — value-identical
    "SELECT o_orderkey, "
    "ROUND(CAST(SUM(CASE WHEN (o_orderstatus = 'F') THEN "
    "CAST(o_totalprice AS DECIMAL(18,2)) END) OVER "
    "(PARTITION BY o_custkey ORDER BY o_orderkey) AS DOUBLE), 2) AS f_run, "
    "COUNT(CASE WHEN (o_totalprice > 100000) THEN 1 END) OVER "
    "(PARTITION BY o_custkey ORDER BY o_orderkey) AS big_cnt "
    "FROM orders ORDER BY o_orderkey",
    oracle=(
        "SELECT o_orderkey, "
        "ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) "
        "FILTER (WHERE o_orderstatus = 'F') OVER "
        "(PARTITION BY o_custkey ORDER BY o_orderkey) AS DOUBLE), 2) AS f_run, "
        "COUNT(*) FILTER (WHERE o_totalprice > 100000) OVER "
        "(PARTITION BY o_custkey ORDER BY o_orderkey) AS big_cnt "
        "FROM orders ORDER BY o_orderkey"
    ),
    tags=("window",),
)

sql_query(
    "b5h_exclude_frames",
    # window EXCLUDE semantics (r7): the Spark side carries the exact
    # decompositions the engine's dialect layer emits — EXCLUDE GROUP
    # by frame-minus-peer-group subtraction (NULL when the frame was
    # the peer group alone), EXCLUDE TIES keeping the current row, and
    # min EXCLUDE CURRENT ROW over the full partition via the
    # group-extreme / multiplicity / second-distinct helper columns.
    # The DuckDB oracle uses native RANGE ... EXCLUDE — value-identical.
    "SELECT o_orderkey, "
    "CASE WHEN cf = cg THEN NULL ELSE ROUND(CAST(sf - sg AS DOUBLE), 2) END AS sum_excl_group, "
    "cf - cg + 1 AS cnt_excl_ties, "
    "ROUND(CAST(CASE WHEN p > pmin THEN pmin WHEN pcnt >= 2 THEN pmin ELSE p2 END AS DOUBLE), 2) AS min_excl_self "
    "FROM (SELECT o_orderkey, p, sf, sg, cf, cg, pmin, "
    "SUM(CASE WHEN p = pmin THEN 1 ELSE 0 END) OVER (PARTITION BY s) AS pcnt, "
    "MIN(CASE WHEN p > pmin THEN p END) OVER (PARTITION BY s) AS p2 "
    "FROM (SELECT o_orderkey, o_orderstatus AS s, "
    "CAST(o_totalprice AS DECIMAL(18,2)) AS p, "
    "SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER "
    "(PARTITION BY o_orderstatus ORDER BY o_orderdate) AS sf, "
    "SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER "
    "(PARTITION BY o_orderstatus, o_orderdate) AS sg, "
    "COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate) AS cf, "
    "COUNT(*) OVER (PARTITION BY o_orderstatus, o_orderdate) AS cg, "
    "MIN(CAST(o_totalprice AS DECIMAL(18,2))) OVER "
    "(PARTITION BY o_orderstatus) AS pmin "
    "FROM orders) l1) l2 ORDER BY o_orderkey",
    oracle=(
        "SELECT o_orderkey, "
        "ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER "
        "(PARTITION BY o_orderstatus ORDER BY o_orderdate "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP) "
        "AS DOUBLE), 2) AS sum_excl_group, "
        "COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES) AS cnt_excl_ties, "
        "ROUND(CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) OVER "
        "(PARTITION BY o_orderstatus ORDER BY o_orderdate "
        "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING "
        "EXCLUDE CURRENT ROW) AS DOUBLE), 2) AS min_excl_self "
        "FROM orders ORDER BY o_orderkey"
    ),
    tags=("window",),
)

# ---------------------------------------------------------------------------
# B6 — sorts / limits / top-k (ORDER BY+LIMIT plans as TakeOrderedAndProject:
# per-partition top-k then driver merge — no total sort at scale)
# ---------------------------------------------------------------------------

sql_query(
    "b6a_order_by",
    "SELECT c_custkey FROM customer ORDER BY c_name, c_custkey",
    tags=("sort",),
)

sql_query(
    "b6b_multi_key_order",
    "SELECT o_orderkey FROM orders ORDER BY o_orderstatus DESC, o_totalprice ASC, o_orderkey",
    tags=("sort",),
)

sql_query(
    "b6c_top_k",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    tags=("sort",),
)

sql_query(
    "b6d_limit_offset",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5",
    tags=("sort",),
)

# ---------------------------------------------------------------------------
# B7 — set operations
# ---------------------------------------------------------------------------

sql_query(
    "b7a_union_all",
    "SELECT r_name AS name FROM region UNION ALL SELECT n_name FROM nation ORDER BY name",
    tags=("setop",),
)

sql_query(
    "b7b_union_distinct",
    "SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY k",
    tags=("setop",),
)

sql_query(
    "b7c_intersect",
    "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k",
    tags=("setop",),
)

sql_query(
    "b7d_except",
    "SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY k",
    tags=("setop",),
)

# ---------------------------------------------------------------------------
# B8 — subqueries / CTEs
# ---------------------------------------------------------------------------

sql_query(
    "b8a_scalar_subquery",
    "SELECT o_orderkey FROM orders WHERE o_totalprice > "
    "(SELECT AVG(o_totalprice) FROM orders) ORDER BY o_orderkey",
    tags=("subquery",),
)

sql_query(
    "b8b_in_subquery",
    "SELECT p_partkey FROM part WHERE p_partkey IN "
    "(SELECT l_partkey FROM lineitem WHERE l_quantity > 45) ORDER BY p_partkey",
    tags=("subquery",),
)

sql_query(
    "b8c_derived_table",
    "SELECT k, n FROM (SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY o_custkey) t "
    "WHERE n >= 2 ORDER BY k",
    tags=("subquery",),
)

sql_query(
    "b8d_cte",
    "WITH big AS (SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 100000) "
    "SELECT c_custkey, count(*) AS n FROM big JOIN customer ON o_custkey = c_custkey "
    "GROUP BY c_custkey ORDER BY c_custkey",
    tags=("subquery",),
)

sql_query(
    "b8f_recursive_cte",
    # SQLite has recursive CTEs; Spark gained them in 4.0 — full parity
    "WITH RECURSIVE seq(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM seq WHERE n < 10) "
    "SELECT s.n, count(o.o_orderkey) AS cnt FROM seq s "
    "LEFT JOIN orders o ON o.o_orderkey % 10 = s.n - 1 GROUP BY s.n ORDER BY s.n",
    tags=("subquery", "recursive"),
)

sql_query(
    "b8e_correlated_scalar",
    "SELECT c_custkey, (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders "
    "FROM customer ORDER BY c_custkey",
    tags=("subquery",),
)

# ---------------------------------------------------------------------------
# B9 — scalar function families. Spark length/year/month/day return INT
# (DuckDB BIGINT) — Spark side casts; DuckDB floor/ceil return DOUBLE
# (Spark BIGINT) — oracle side casts; DuckDB regexp_replace needs the 'g'
# flag for global replace.
# ---------------------------------------------------------------------------

sql_query(
    "b9a_string_funcs",
    "SELECT c_custkey, upper(c_name) AS u, CAST(length(c_name) AS BIGINT) AS l, "
    "substr(c_name, 1, 8) AS s8, replace(c_mktsegment, 'ING', '_') AS r, "
    "CAST(c_custkey AS STRING) || '_bar' AS cat "
    "FROM customer ORDER BY c_custkey",
    oracle=(
        "SELECT c_custkey, upper(c_name) AS u, length(c_name) AS l, "
        "substr(c_name, 1, 8) AS s8, replace(c_mktsegment, 'ING', '_') AS r, "
        "CAST(c_custkey AS STRING) || '_bar' AS cat "
        "FROM customer ORDER BY c_custkey"
    ),
    tags=("functions",),
)

sql_query(
    "b9b_math_funcs",
    "SELECT l_orderkey, l_linenumber, ABS(l_discount - 0.05) > 0.001 AS f, "
    "ROUND(l_extendedprice * (1 - l_discount), 4) AS net, "
    "FLOOR(l_quantity) AS fq, CEIL(l_tax * 100) AS ct, MOD(l_orderkey, 7) AS m "
    "FROM lineitem ORDER BY l_orderkey, l_linenumber",
    oracle=(
        "SELECT l_orderkey, l_linenumber, ABS(l_discount - 0.05) > 0.001 AS f, "
        "ROUND(l_extendedprice * (1 - l_discount), 4) AS net, "
        "CAST(FLOOR(l_quantity) AS BIGINT) AS fq, CAST(CEIL(l_tax * 100) AS BIGINT) AS ct, "
        "MOD(l_orderkey, 7) AS m "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("functions",),
)

sql_query(
    "b9c_date_extract",
    "SELECT o_orderkey, CAST(YEAR(o_orderdate) AS BIGINT) AS y, "
    "CAST(MONTH(o_orderdate) AS BIGINT) AS m, CAST(DAY(o_orderdate) AS BIGINT) AS d "
    "FROM orders ORDER BY o_orderkey",
    oracle=(
        "SELECT o_orderkey, YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m, DAY(o_orderdate) AS d "
        "FROM orders ORDER BY o_orderkey"
    ),
    tags=("functions",),
)

sql_query(
    "b9d_date_trunc",
    "SELECT DATE_TRUNC('month', o_orderdate) AS mo, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1",
    oracle=(
        "SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS mo, count(*) AS n "
        "FROM orders GROUP BY 1 ORDER BY 1"
    ),
    tags=("functions",),
)

sql_query(
    "b9e_case_coalesce",
    "SELECT o_orderkey, CASE WHEN o_totalprice > 150000 THEN 'hi' "
    "WHEN o_totalprice > 50000 THEN 'mid' ELSE 'lo' END AS bucket, "
    "COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st FROM orders ORDER BY o_orderkey",
    tags=("functions",),
)

sql_query(
    "b9f_cast",
    # FLOOR keeps double→int conversion identical across engines (Spark
    # CAST truncates, DuckDB CAST rounds)
    "SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS ip, CAST(o_orderkey AS STRING) AS s "
    "FROM orders ORDER BY o_orderkey",
    tags=("functions",),
)

sql_query(
    "b9g_json",
    "SELECT event_id, get_json_object(props, '$.k') AS k FROM events ORDER BY event_id",
    oracle="SELECT event_id, json_extract_string(props, '$.k') AS k FROM events ORDER BY event_id",
    tags=("functions", "json"),
)

# ---------------------------------------------------------------------------
# B11 — streaming operators, batch-equivalent form (the streaming execution
# of the same logic lives in dust_spark.streaming; batch mode is the oracle)
# ---------------------------------------------------------------------------


@register(
    "b11a_tumbling_window",
    oracle=(
        "SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS ws, "
        "count(*) AS n, ROUND(SUM(value),4) AS sv FROM events GROUP BY 1 ORDER BY 1"
    ),
    tags=("streaming", "agg"),
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — same groupBy(window(...)) works
    unchanged under readStream + watermark (dust_spark.streaming.windows)."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    return (
        spark.table("events")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sv"))
        .select(F.col("window.start").alias("ws"), "n", "sv")
        .orderBy("ws")
    )


sql_query(
    "b11b_distinct_events",
    "SELECT count(DISTINCT event_id) AS n FROM events",
    tags=("streaming", "agg"),
)


@register(
    "b11c_sliding_window",
    oracle=(
        # 1h window sliding by 30m ⇒ each event lands in exactly two windows:
        # the 30m bucket it falls in and the one before it
        "SELECT ws, event_type, count(*) AS n FROM ("
        "  SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) AS TIMESTAMP) AS ws, event_type FROM events"
        "  UNION ALL"
        "  SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) AS TIMESTAMP) - INTERVAL 30 MINUTE, event_type FROM events"
        ") GROUP BY ws, event_type ORDER BY ws, event_type"
    ),
    tags=("streaming", "agg"),
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour/30-minute window counts per event type — the same
    groupBy(window(ts, w, slide)) runs unchanged under readStream +
    watermark (dust_spark.streaming.windows.sliding_window_agg)."""
    from dust_spark.streaming.windows import sliding_window_agg

    register_views(spark, sf_dir)
    return sliding_window_agg(spark.table("events")).orderBy("ws", "event_type")


@register(
    "b11d_session_window",
    oracle=(
        # gap-based sessionization replayed with lag + cumulative-sum;
        # boundary verified empirically: session_window MERGES an event
        # at exactly prev_ts + gap (split requires gap strictly greater)
        "WITH marked AS ("
        "  SELECT user_id, ts,"
        "         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL"
        "               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE"
        "              THEN 1 ELSE 0 END AS new_s"
        "  FROM events"
        "), sess AS ("
        "  SELECT user_id, ts,"
        "         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid"
        "  FROM marked"
        ")"
        "SELECT CAST(MIN(ts) AS TIMESTAMP) AS ss,"
        "       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS se,"
        "       user_id, count(*) AS n_events "
        "FROM sess GROUP BY user_id, sid ORDER BY user_id, ss"
    ),
    tags=("streaming", "agg"),
)
def session_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-minute-gap session windows (session_window groupBy;
    streaming parity in dust_spark.streaming.windows.session_window_agg)."""
    from dust_spark.streaming.windows import session_window_agg

    register_views(spark, sf_dir)
    return session_window_agg(spark.table("events")).orderBy("user_id", "ss")


@register(
    "b11e_stream_stream_join",
    oracle=(
        "SELECT v.user_id, v.event_id AS l_id, p.event_id AS r_id "
        "FROM events v JOIN events p ON p.user_id = v.user_id "
        "AND v.event_type = 'view' AND p.event_type = 'purchase' "
        "AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE "
        "ORDER BY v.user_id, l_id, r_id"
    ),
    tags=("streaming", "join"),
)
def stream_stream_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→purchase attribution within 30 minutes — the batch form of
    the watermarked stream-stream join (streaming parity in
    tests/test_streaming.py::test_stream_stream_join_parity)."""
    from pyspark.sql import functions as F

    from dust_spark.streaming.windows import stream_stream_join

    register_views(spark, sf_dir)
    ev = spark.table("events")
    out = stream_stream_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    return out.select("user_id", "l_id", "r_id").orderBy("user_id", "l_id", "r_id")


sql_query(
    "b9k_string_funcs2",
    # second string-family sweep: pad/translate/case/repeat/reverse/locate
    "SELECT c_custkey, lpad(c_name, 25, '.') AS lp, rpad(c_mktsegment, 12, '-') AS rp, "
    "translate(c_name, '#', '_') AS tr, initcap(c_mktsegment) AS ic, "
    "repeat(c_mktsegment, 0) AS z, reverse(c_name) AS rv, "
    "CAST(instr(c_name, '1') AS BIGINT) AS ix "
    "FROM customer ORDER BY c_custkey",
    oracle=(
        "SELECT c_custkey, lpad(c_name, 25, '.') AS lp, rpad(c_mktsegment, 12, '-') AS rp, "
        "translate(c_name, '#', '_') AS tr, "
        "list_aggr(list_transform(string_split(lower(c_mktsegment), ' '), x -> upper(x[1]) || x[2:]), 'string_agg', ' ') AS ic, "
        "repeat(c_mktsegment, 0) AS z, reverse(c_name) AS rv, "
        "CAST(instr(c_name, '1') AS BIGINT) AS ix "
        "FROM customer ORDER BY c_custkey"
    ),
    tags=("functions",),
)


# ---------------------------------------------------------------------------
# B13 — TPC-H-shaped composite queries (join + agg + sort + limit in one
# plan; the fixtures are TPC-H-ish so the classic public shapes apply).
# Money sums accumulate in DECIMAL(18,4) (parallel double summation is
# order-dependent; decimals are exact on both engines), then emit as
# ROUND(double) — decimal literal rendering differs across engines.
# ---------------------------------------------------------------------------

sql_query(
    "b13a_tpch_q3_shape",
    "SELECT l_orderkey, "
    "ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue, "
    "o_orderdate, o_orderpriority "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE c_mktsegment = 'BUILDING' "
    "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
    "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10",
    tags=("join", "agg", "composite"),
)

sql_query(
    "b13b_tpch_q5_shape",
    "SELECT n_name, "
    "ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "WHERE r_name = 'ASIA' "
    "GROUP BY n_name ORDER BY revenue DESC, n_name",
    tags=("join", "agg", "composite"),
)

sql_query(
    "b13c_tpch_q10_shape",
    "SELECT c_custkey, c_name, "
    "ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue, "
    "n_name "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "WHERE l_returnflag = 'R' "
    "GROUP BY c_custkey, c_name, n_name "
    "ORDER BY revenue DESC, c_custkey LIMIT 20",
    tags=("join", "agg", "composite"),
)


def all_queries() -> dict[str, QueryDef]:
    """Full catalog, Tier B + Tier C (importing operators registers the
    Tier C entries)."""
    import dust_spark.queries_tierc  # noqa: F401  (registration side effect)

    return QUERIES


# ---------------------------------------------------------------------------
# late additions: exact percentiles, array functions, date arithmetic
# ---------------------------------------------------------------------------

sql_query(
    "b4i_percentile",
    # exact interpolated percentile — Spark percentile() ≡ DuckDB quantile_cont()
    "SELECT o_orderstatus, ROUND(percentile(o_totalprice, 0.5), 4) AS med, "
    "ROUND(percentile(o_totalprice, 0.9), 4) AS p90 "
    "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    oracle=(
        "SELECT o_orderstatus, ROUND(quantile_cont(o_totalprice, 0.5), 4) AS med, "
        "ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90 "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
    ),
    tags=("agg",),
)

sql_query(
    "b9h_array_funcs",
    "SELECT vec_id, CAST(size(embedding) AS BIGINT) AS dim, "
    "ROUND(aggregate(embedding, 0D, (s, x) -> s + CAST(x AS DOUBLE)), 4) AS vsum, "
    "ROUND(CAST(element_at(embedding, 1) AS DOUBLE), 4) AS first_c "
    "FROM embeddings WHERE vec_id < 20 ORDER BY vec_id",
    oracle=(
        "SELECT vec_id, len(embedding) AS dim, "
        "ROUND(list_sum(CAST(embedding AS DOUBLE[])), 4) AS vsum, "
        "ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_c "
        "FROM embeddings WHERE vec_id < 20 ORDER BY vec_id"
    ),
    tags=("functions", "array"),
)

sql_query(
    "b9i_date_arith",
    "SELECT o_orderkey, timestampadd(DAY, 30, o_orderdate) AS due, "
    "CAST(datediff(TIMESTAMP '1996-01-01', o_orderdate) AS BIGINT) AS age_days "
    "FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey",
    oracle=(
        "SELECT o_orderkey, o_orderdate + INTERVAL 30 DAY AS due, "
        "datediff('day', CAST(o_orderdate AS DATE), DATE '1996-01-01') AS age_days "
        "FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey"
    ),
    tags=("functions", "datetime"),
)

sql_query(
    "b9j_regexp_funcs",
    "SELECT event_id, regexp_extract(props, '\"k\": ?(-?\\\\d+)', 1) AS kstr, "
    "split_part(event_type, 'i', 1) AS sp, "
    "concat_ws('-', event_type, CAST(user_id AS STRING)) AS cw "
    "FROM events ORDER BY event_id",
    oracle=(
        "SELECT event_id, regexp_extract(props, '\"k\": ?(-?\\d+)', 1) AS kstr, "
        "split_part(event_type, 'i', 1) AS sp, "
        "concat_ws('-', event_type, CAST(user_id AS STRING)) AS cw "
        "FROM events ORDER BY event_id"
    ),
    tags=("functions", "regexp"),
)
