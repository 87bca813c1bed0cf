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
    max_gap=None,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row
    with ``right_time <= left_time`` (direction='backward') or the
    earliest with ``>=`` ('forward'), matching on the by-key.

    ``max_gap`` (r8): optional tolerance predicate ``(left_time_col,
    matched_right_time_col) -> Column[bool]`` — a match farther than
    the tolerance nulls the value columns (kdb/pandas ``merge_asof
    tolerance`` semantics). The nearest match is tested, never an
    earlier one: as-of keeps only the closest row per side, so
    tolerance-filtering it is equivalent to bounding the search window.

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

    gap_cols = [F.last("__t2", ignorenulls=True).over(w).alias("__rt")] if max_gap is not None else []
    if max_gap is not None:
        both = both.withColumn(
            "__t2", F.when(F.col("__is_left") == 0, F.col("__t"))
        )
    matched = both.select(
        "__is_left",
        "__l",
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c) for c in value_cols],
        *gap_cols,
    )
    lefts = matched.filter(F.col("__is_left") == 1)
    if max_gap is not None:
        keep = F.col("__rt").isNotNull() & max_gap(
            F.col(f"__l.{left_time}"), F.col("__rt")
        )
        return lefts.select(
            *[F.col(f"__l.{c}").alias(c) for c in lcols],
            *[F.when(keep, F.col(c)).alias(c) for c in value_cols],
        )
    out = lefts.select(
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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by_left: str,
    by_right: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """Interval-overlap (range) join: all (left, right) pairs on the
    by-key whose closed intervals overlap — ``ls <= re AND rs <= le``.

    Spark has no range-join operator; a naive theta join degenerates to
    a per-key nested loop (BroadcastNestedLoopJoin or a cartesian
    blow-up on hot keys). This is the standard binning construction
    used by genomics/spatial engines:

      1. Explode each interval into the fixed-width buckets it spans
         (``sequence(floor(start/w), floor(end/w))`` — narrow, no
         shuffle).
      2. Equi-join on ``(key, bucket)`` — a plain shuffled hash join,
         AQE-skew-splittable, never a nested loop.
      3. Post-filter the true overlap predicate.
      4. Emit each pair exactly once WITHOUT a distinct shuffle: keep
         only the match in the bucket containing the overlap's start
         (``bucket == floor(greatest(ls, rs)/w)``) — that bucket is
         shared by both sides of every overlapping pair by
         construction.

    ``bucket_width`` trades replication for join selectivity: each row
    is replicated ``span/width + 1`` times, so pick width around the
    typical interval length. Both inputs keep all their columns in the
    output — pre-rename collisions on the caller side.

    floor(x/w) goes through double division — monotone, and exact for
    |x| < 2^53, so bucket membership always covers the overlap bucket
    even at epoch-microsecond magnitudes.
    """
    w = F.lit(bucket_width)
    lb = left.select(
        F.col(by_left).alias("__k"),
        F.struct(*left.columns).alias("__l"),
        F.col(left_start).alias("__ls"),
        F.col(left_end).alias("__le"),
    ).withColumn(
        "__b", F.explode(F.sequence(F.floor(F.col("__ls") / w), F.floor(F.col("__le") / w)))
    )
    rb = right.select(
        F.col(by_right).alias("__rk"),
        F.struct(*right.columns).alias("__r"),
        F.col(right_start).alias("__rs"),
        F.col(right_end).alias("__re"),
    ).withColumn(
        "__rb", F.explode(F.sequence(F.floor(F.col("__rs") / w), F.floor(F.col("__re") / w)))
    )
    joined = lb.join(
        rb,
        (lb["__k"] == rb["__rk"])
        & (lb["__b"] == rb["__rb"])
        & (F.col("__ls") <= F.col("__re"))
        & (F.col("__rs") <= F.col("__le"))
        & (F.col("__b") == F.floor(F.greatest(F.col("__ls"), F.col("__rs")) / w)),
        "inner",
    )
    return joined.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__r.{c}").alias(c) for c in right.columns],
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
