"""Physical-plan audits: the scale properties SURVEY.md §4.2 promises —
pushdown, pruning, broadcast dimension joins, no row-at-a-time Python —
asserted on real plans over the fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from dust_spark import plans
from dust_spark.queries import all_queries
from dust_spark.tables import load_table
from tests.conftest import SF_DIR

QUERIES = all_queries()


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["b2a_eq_filter"].fn(spark, SF_DIR)
    plans.assert_filter_pushed(df, "c_mktsegment")


def test_column_pruning(spark):
    # two-column projection over lineitem must not read the other 9 cols
    li = load_table(spark, SF_DIR, "lineitem")
    df = li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 10)
    plans.assert_columns_pruned(df, ["l_extendedprice", "l_comment", "l_shipdate", "l_partkey"])
    plans.assert_filter_pushed(df, "l_quantity")


def test_star_join_broadcasts_dimensions(spark):
    df = QUERIES["b3i_star_join"].fn(spark, SF_DIR)
    plans.assert_broadcast_join(df)


def test_no_row_python_in_catalog(spark):
    """No declared query may use row-at-a-time Python UDFs; Arrow-batched
    stages are allowed only where declared (multimodal decode)."""
    for name, q in QUERIES.items():
        df = q.fn(spark, SF_DIR)
        assert not plans.python_in_hot_path(df), f"{name} uses BatchEvalPython"


def test_topk_plans_as_take_ordered(spark):
    df = QUERIES["b6c_top_k"].fn(spark, SF_DIR)
    assert "TakeOrderedAndProject" in plans.formatted_plan(df)


def test_asof_is_single_shuffle(spark):
    """The as-of join must cost exactly one exchange for the union (plus
    none for the window that reuses its partitioning)."""
    from dust_spark.operators import asof_aggregate

    events = load_table(spark, SF_DIR, "events").filter(F.col("event_id") <= 50)
    orders = load_table(spark, SF_DIR, "orders")
    df = asof_aggregate(events, orders, "ts", "o_orderdate", "user_id", "o_custkey", "o_orderkey")
    n = plans.count_shuffles(df)
    assert n <= 1, f"as-of join should shuffle once, got {n} exchanges:\n{plans.formatted_plan(df)[:2000]}"


def test_explain_summary_shape(spark):
    s = plans.explain_summary(QUERIES["b4a_groupby_aggs"].fn(spark, SF_DIR))
    # codegen_stages is only populated on AQE final plans (post-execution);
    # pre-execution we assert the shuffle budget + no row-Python
    assert s["shuffles"] >= 1
    assert not s["python_row_udfs"]
