"""As-of (point-in-time) join — SURVEY.md §2.C C6.

Spark has no native as-of join; this implements the scalable
union-and-window construction:

  1. Tag left rows L and right rows R, union on (by-keys, time).
  2. One shuffle partitioned by the by-keys, sorted by (time, tag).
  3. ``last(right_payload, ignorenulls)`` over the preceding frame gives
     every left row its most recent right match.

Cost: exactly one shuffle of |L|+|R| rows — no range-join blowup, no
per-group driver loops. Skewed by-keys are handled by AQE skew-join
settings; a per-key salt would only be needed if a single entity
exceeded an executor's sort spill capacity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    by_left: str,
    by_right: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row
    with ``right_time <= left_time`` (direction='backward') or the
    earliest with ``>=`` ('forward'), matching on the by-key.

    Returns all left columns plus the as-of matched value columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    lcols = left.columns
    l_tag = left.select(
        F.col(by_left).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(by_right).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    both = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right rows sort before left rows at equal time (<= semantics)
        w = (
            W.partitionBy("__k")
            .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
    else:
        w = (
            W.partitionBy("__k")
            .orderBy(F.col("__t").desc(), F.col("__is_left").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )

    matched = both.select(
        "__is_left",
        "__l",
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    out = matched.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *value_cols,
    )
    return out


def asof_aggregate(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    by_left: str,
    by_right: str,
    agg_col: str,
    agg: str = "max",
    out_col: str = "agg_value",
) -> DataFrame:
    """Aggregate over ALL right rows at-or-before each left row's time
    (DQ-C4b shape: latest order key per event = MAX over the history,
    not just the most recent row).

    Implemented as a running aggregate over the same union-window shuffle
    as :func:`asof_join` — still a single shuffle.
    """
    agg_fn = {"max": F.max, "min": F.min, "sum": F.sum, "count": F.count}[agg]
    lcols = left.columns
    l_tag = left.select(
        F.col(by_left).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(right.schema[agg_col].dataType).alias("__v"),
    )
    r_tag = right.select(
        F.col(by_right).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        F.col(agg_col).alias("__v"),
    )
    both = l_tag.unionByName(r_tag)
    w = (
        W.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        both.select("__is_left", "__l", agg_fn("__v").over(w).alias(out_col))
        .filter(F.col("__is_left") == 1)
        .select(*[F.col(f"__l.{c}").alias(c) for c in lcols], out_col)
    )
