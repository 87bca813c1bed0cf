"""Sources & sinks.

The reference's only storage is SQLite (RAM or a single file,
DOC/DESIGN.md:51-52) and its only result sink is the
``{columns,types,values}`` JSON over HTTP (http/src/service.rs:162-172).
Our engine's primary format is Parquet (columnar, pushdown-friendly);
this module adds the rest of the practical surface: CSV / JSON / ORC /
text readers with explicit schemas, partitioned+bucketed writers, the
wire-contract JSON result sink, and import-gated stubs for connectors
whose jars aren't in this container (JDBC works out of the box via
Spark; Delta/Iceberg/Hudi are stubbed).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# readers — always explicit-schema in pipelines (inference = an extra
# full scan at 100 TB); inference allowed only when schema=None is
# passed explicitly.
# ---------------------------------------------------------------------------


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Parquet scan; optional projection applied immediately so column
    pruning reaches the reader even before any downstream select."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    reader = spark.read.option("header", header).option("delimiter", delimiter)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")  # dev convenience only
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | str | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Native XML source (Spark 4 built-in, the former spark-xml
    package): one row per ``row_tag`` element, attributes as
    ``_attr`` columns, schema inferred unless given."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    df.write.format("xml").option("rowTag", row_tag).mode(mode).save(path)


def read_text(spark: SparkSession, path: str, whole_file: bool = False) -> DataFrame:
    return spark.read.option("wholetext", whole_file).text(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw-file ingestion (images/audio/any blob) via Spark's binaryFile
    source: (path, modificationTime, length, content BINARY) — the
    ingest side of the multimodal operators (operators.multimodal
    consumes the content column). ``glob`` filters by pattern, e.g.
    ``*.png``; the filter is applied at file listing, not post-scan."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound=None,
    upper_bound=None,
    **options,
) -> DataFrame:
    """JDBC source. For parallel reads supply partition_column+bounds —
    otherwise the whole table arrives through one connection (the classic
    single-partition JDBC trap)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet writer. ``partition_by`` on a low-cardinality
    column (date, lang, source) enables partition pruning downstream —
    the first lever for 100 TB layouts."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_by: list[str],
    num_buckets: int = 64,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on the bucket key skip
    the shuffle entirely (SURVEY.md §4.2). Requires a warehouse-backed
    session catalog."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(name)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def result_json(df: DataFrame) -> str:
    """The reference's wire-contract result sink: one Rows object
    (reference command/src/lib.rs:43-50) serialized compactly."""
    from dust_spark.model import rows_from_dataframe, rows_to_json

    return rows_to_json([rows_from_dataframe(df)])


# ---------------------------------------------------------------------------
# import-gated connector stubs (jars not in this container)
# ---------------------------------------------------------------------------


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.format("delta").load(path)
    except Exception as e:  # pragma: no cover - jar not present in v1 image
        raise NotImplementedError(
            "Delta Lake requires the delta-spark jars on the classpath; not in this image"
        ) from e


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    try:
        return spark.read.format("iceberg").load(table)
    except Exception as e:  # pragma: no cover
        raise NotImplementedError(
            "Iceberg requires the iceberg-spark-runtime jar; not in this image"
        ) from e


def streaming_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-based streaming source (directory of files). Kafka would be
    ``spark.readStream.format('kafka')`` with the kafka-sql jar — not in
    this image, same import-gate policy."""
    if not os.path.isdir(path):
        raise ValueError(f"streaming file source requires a directory, got {path}")
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .format(fmt)
        .load(path)
    )
