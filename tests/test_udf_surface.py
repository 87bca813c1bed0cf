"""UDF/UDAF/UDTF surface (SURVEY.md §2 B12). The reference exposes no
UDF mechanism at all (rusqlite create_scalar_function never called);
this is our engine's Python extension surface — every flavor
demonstrated and verified, with the Arrow-vectorized forms preferred."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dust_spark.tables import load_table
from tests.conftest import SF_DIR


def test_scalar_pandas_udf(spark):
    @F.pandas_udf(T.DoubleType())
    def taxed(price: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1.0 + tax)

    li = load_table(spark, SF_DIR, "lineitem").limit(100)
    rows = li.select("l_extendedprice", "l_tax", taxed("l_extendedprice", "l_tax").alias("t")).collect()
    for r in rows:
        assert abs(r.t - r.l_extendedprice * (1 + r.l_tax)) < 1e-9


def test_grouped_agg_pandas_udf(spark):
    @F.pandas_udf(T.DoubleType())
    def mean_sq(v: pd.Series) -> float:
        return float((v**2).mean())

    orders = load_table(spark, SF_DIR, "orders")
    got = {
        r.o_orderstatus: r.ms
        for r in orders.groupBy("o_orderstatus").agg(mean_sq("o_totalprice").alias("ms")).collect()
    }
    pdf = orders.select("o_orderstatus", "o_totalprice").toPandas()
    for status, grp in pdf.groupby("o_orderstatus"):
        assert abs(got[status] - (grp.o_totalprice**2).mean()) / got[status] < 1e-12


def test_grouped_map_applyInPandas(spark):
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["o_totalprice"].std(ddof=1)
        pdf["z"] = (pdf["o_totalprice"] - pdf["o_totalprice"].mean()) / (s if s else 1.0)
        return pdf[["o_orderkey", "o_orderstatus", "z"]]

    orders = load_table(spark, SF_DIR, "orders")
    out = orders.groupBy("o_orderstatus").applyInPandas(
        zscore, schema="o_orderkey long, o_orderstatus string, z double"
    )
    assert out.count() == orders.count()
    # per-group mean(z) ≈ 0
    means = out.groupBy("o_orderstatus").agg(F.avg("z").alias("m")).collect()
    assert all(abs(r.m) < 1e-9 for r in means)


def test_mapInPandas(spark):
    def batches(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["cumqty"] = pdf["l_quantity"].cumsum()
            yield pdf[["l_orderkey", "cumqty"]]

    li = load_table(spark, SF_DIR, "lineitem").limit(500)
    out = li.mapInPandas(batches, schema="l_orderkey long, cumqty double")
    assert out.count() == 500


def test_python_udtf(spark):
    """Python UDTF (Spark >= 3.5): table function splitting text to rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield (w, i)

    spark.udtf.register("split_words", SplitWords)
    rows = spark.sql("SELECT word, pos FROM split_words('a b c')").collect()
    assert [(r.word, r.pos) for r in rows] == [("a", 0), ("b", 1), ("c", 2)]


def test_sql_explode_family(spark):
    rows = spark.sql(
        "SELECT x, i FROM (SELECT posexplode(array('p', 'q')) AS (i, x))"
    ).collect()
    assert {(r.x, r.i) for r in rows} == {("p", 0), ("q", 1)}
    rows = spark.sql("SELECT inline(array(struct(1 AS a, 'x' AS b), struct(2 AS a, 'y' AS b)))").collect()
    assert [(r.a, r.b) for r in rows] == [(1, "x"), (2, "y")]


def test_row_udf_works_but_flagged(spark):
    """Row-at-a-time Python UDFs function correctly but are detected by
    the plan audit as the anti-pattern they are."""
    from dust_spark import plans

    bad = F.udf(lambda x: x + 1, T.LongType())
    df = load_table(spark, SF_DIR, "orders").select(bad("o_orderkey").alias("k"))
    assert plans.python_in_hot_path(df)
    assert df.limit(3).count() == 3
