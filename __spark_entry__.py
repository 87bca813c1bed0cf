"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every declared query from SURVEY.md §2 (Tier B SQL
surface + Tier C pipeline operators), (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — matching DuckDB SQL for the hash-checked subset;
sketch-based ops (MinHash/SimHash/RP-LSH) are deterministic but not
DuckDB-expressible and are omitted (rows-only check), their semantics
are verified against exact ground truth in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 5-way star join + aggregate over sf0.001 (DQ-B3i)."""
    from dust_spark.queries import all_queries

    return all_queries()["b3i_star_join"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dust_spark.queries import all_queries

    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from dust_spark.queries import all_queries

    return {name: q.oracle for name, q in all_queries().items() if q.oracle}
