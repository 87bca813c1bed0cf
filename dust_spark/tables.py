"""Fixture-table registry: register the driver's parquet tables
(TESTDATA.md) as temp views on a SparkSession.

Scale posture: views are plain parquet scans, so Catalyst pushes filters
and prunes columns into the scan (verified via .explain — PushedFilters /
ReadSchema). At cluster scale the same entry point works on a directory
of many files; nothing here assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: safe (and desirable) to broadcast in joins.
DIM_TABLES = ("region", "nation", "supplier")

_registered: set[tuple[int, str]] = set()


def spread(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Repartition a narrow scan across the cluster when the source has
    too few input splits to use it (locally: one small parquet file =
    one partition = one core; on a cluster: a handful of huge files).
    Cheap for small dims, essential before explode-heavy operators that
    multiply per-row work."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, target // min_factor):
        return df.repartition(target)
    return df


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _read_fixture(spark, sf_dir, name)


def _read_fixture(spark: SparkSession, sf_dir: str, name: str):
    """Read one fixture table, normalizing types Spark can't scan
    natively: the events table carries TIMESTAMP(NANOS) which the
    vectorized parquet reader rejects — read nanos as long
    (spark.sql.legacy.parquet.nanosAsLong) and truncate to microsecond
    timestamps (same truncation DuckDB applies on CAST(ts_ns AS
    TIMESTAMP), keeping oracle comparisons exact)."""
    df = spark.read.parquet(table_path(sf_dir, name))
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for f in df.schema.fields:
        if name == "events" and f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif name == "events" and f.name == "ts" and isinstance(f.dataType, T.TimestampNTZType):
            # fixture generations vary: TIMESTAMP(MICROS, isAdjustedToUTC=false)
            # reads as NTZ — cast to LTZ for type consistency with the
            # nanos-long generation above and for DuckDB oracle parity;
            # with the session clock pinned to UTC the cast is
            # value-preserving
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def register_views(spark: SparkSession, sf_dir: str, force: bool = False) -> None:
    """Register every fixture table as a temp view named after the table.

    Idempotent per (session, sf_dir): re-registration is skipped unless
    the sf_dir changed or ``force`` is set.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # DuckDB timestamps are UTC-naive; every date/window extraction in the
    # catalog assumes the session clock is UTC — pin it here so the gate
    # holds in ANY host session (the driver builds its own SparkSession)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (id(spark), os.path.abspath(sf_dir))
    stale = [k for k in _registered if k[0] == id(spark) and k[1] != key[1]]
    if key in _registered and not force and not stale:
        return
    for k in stale:
        _registered.discard(k)
    for name in TABLES:
        p = table_path(sf_dir, name)
        if os.path.exists(p):
            _read_fixture(spark, sf_dir, name).createOrReplaceTempView(name)
    _registered.add(key)
