"""Scale-layout tests: bucketing removes the join shuffle; partitioned
writes enable partition pruning (SURVEY.md §4.2 / §7 M7 — the levers a
100 TB deployment pulls first)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dust_spark import plans
from dust_spark.sources import write_bucketed_table, write_parquet
from dust_spark.tables import load_table
from tests.conftest import SF_DIR


def test_bucketed_join_skips_shuffle(spark, tmp_path_factory):
    """Both sides bucketed by the join key → SortMergeJoin with zero
    Exchange operators."""
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    write_bucketed_table(li, "b_lineitem", ["l_orderkey"], num_buckets=8, sort_by=["l_orderkey"])
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], num_buckets=8, sort_by=["o_orderkey"])
    try:
        # disable broadcast so the join strategy decision is about buckets
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        n_shuffles = plans.count_shuffles(joined)
        assert n_shuffles == 0, f"bucketed join must not shuffle, got {n_shuffles}"
        assert joined.count() == li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_partitioned_write_prunes(spark, tmp_path):
    """Date-partitioned layout → a month filter reads only that month's
    directory (partition pruning, visible as partitionFilters/fewer files)."""
    out = str(tmp_path / "orders_by_month")
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    write_parquet(orders, out, partition_by=["o_month"])

    df = spark.read.parquet(out).filter(F.col("o_month") == "1995-03")
    plan = plans.formatted_plan(df)
    assert "PartitionFilters" in plan and "o_month" in plan
    want = orders.filter(F.col("o_month") == "1995-03").count()
    assert df.count() == want > 0


def test_store_abstraction(spark):
    from dust_spark.model import Request, Statement
    from dust_spark.session import DustSession
    from dust_spark.store import Database, SparkStore

    s = DustSession(spark)
    store = SparkStore(s)
    assert isinstance(store, Database)
    store.execute(Request.single("CREATE TABLE st (id INTEGER NOT NULL PRIMARY KEY, v INT)"))
    store.execute(Request.single("INSERT INTO st(v) VALUES(3)"))
    rows = store.query(Request.single("SELECT v FROM st"))
    assert rows[0].values == [[3]]
    store.join(2, "node2:7000")
    assert store.leader_id() == 1 and 2 in store.members
    store.remove(2)
    assert 2 not in store.members
    s.close()
