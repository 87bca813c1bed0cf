"""Multi-resolution time-bucket rollups (the TimescaleDB
continuous-aggregate / hypertable shape) over an event stream.

Scale shape: ONE scan of the events table, the resolution list explodes
each row into len(resolutions) bucket rows (bounded constant fan-out),
then a single hash-aggregation shuffling on (resolution, bucket, keys)
with map-side partial combine. Equivalent to maintaining N materialized
rollup views with one pass — at 100 TB/day this is the only shape that
doesn't re-scan the raw hypertable per resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hypertable_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: tuple = ("event_type",),
    value_col: str = "value",
    resolutions_s: tuple = (3600, 21600, 86400),
) -> DataFrame:
    """count + sum(value) per (resolution, time bucket, keys).

    Buckets are epoch-second floors (``floor(epoch/res)*res`` as BIGINT)
    rather than timestamps: integer bucket keys are timezone-proof and
    hash-identical across engines, and 6h/1d floors need no date_trunc
    special cases.
    """
    base = events.select(
        F.col(ts_col),
        *[F.col(k) for k in key_cols],
        F.col(value_col),
        F.explode(
            F.array(*[F.lit(int(r)).cast("long") for r in resolutions_s])
        ).alias("res_s"),
    )
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.col("res_s")) * F.col("res_s")
    ).cast("long")
    return (
        base.withColumn("bucket_s", bucket)
        .groupBy("res_s", "bucket_s", *key_cols)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
    )
