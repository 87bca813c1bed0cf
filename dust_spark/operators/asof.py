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


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    by_left: str,
    by_right: str,
    right_id: str,
    direction_tie: str = "backward",
) -> DataFrame:
    """For each left row, the NEAREST right row on the by-key by
    absolute time distance — the both-directions variant of
    :func:`asof_join` (kdb's ``aj`` nearest / pandas merge_asof
    direction='nearest').

    Deterministic tie rules (mirrored exactly by the c6c oracle):
    within the backward side equal times pick the LARGEST right id
    (latest-in-order), within the forward side the SMALLEST; an exact
    cross-side distance tie goes to ``direction_tie``.

    Single shuffle: union-tag both inputs, partition once on the key,
    and resolve both directions with two window passes over the same
    partitioning (backward = running last-non-null ascending, forward =
    first-non-null over the following frame) — never an all-pairs join,
    so a hot key costs O(rows log rows) locally, not O(rows²).

    Returns all left columns + (nearest right id, signed delta
    ``right_time - left_time`` in the time column's own unit).
    """
    lcols = left.columns
    l_tag = left.select(
        F.col(by_left).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(right.schema[right_id].dataType).alias("__rid"),
    )
    r_tag = right.select(
        F.col(by_right).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        F.col(right_id).alias("__rid"),
    )
    both = l_tag.unionByName(r_tag)
    cand = F.when(
        F.col("__is_left") == 0, F.struct(F.col("__t").alias("t"), F.col("__rid").alias("i"))
    )
    w_back = (
        W.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__rid").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_fwd = (
        W.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").desc(), F.col("__rid").asc())
        .rowsBetween(0, W.unboundedFollowing)
    )
    scored = both.select(
        "__is_left",
        "__l",
        F.col("__t").alias("__lt"),
        F.last(cand, ignorenulls=True).over(w_back).alias("__b"),
        F.first(cand, ignorenulls=True).over(w_fwd).alias("__f"),
    ).filter(F.col("__is_left") == 1)
    d_b = F.col("__lt") - F.col("__b.t")
    d_f = F.col("__f.t") - F.col("__lt")
    back_wins = F.col("__b").isNotNull() & (
        F.col("__f").isNull()
        | (d_b < d_f)
        | ((d_b == d_f) & F.lit(direction_tie == "backward"))
    )
    pick = F.when(back_wins, F.col("__b")).otherwise(F.col("__f"))
    return scored.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        pick["i"].alias(right_id),
        (pick["t"] - F.col("__lt")).alias("delta"),
    )
