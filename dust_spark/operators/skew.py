"""Skew-resistant aggregation via key salting (SURVEY.md §7 M7).

AQE's skew-join handling covers joins; a skewed *aggregation* key (one
giant group) still bottlenecks a single reducer in the first shuffle.
Salting splits each group across ``num_salts`` reducers and re-combines:

  phase 1: groupBy(keys + salt) with the partial aggregate
  phase 2: groupBy(keys) combining the partials

Only algebraic aggregates (count/sum/min/max + avg via sum&count)
decompose this way — exactly the ones that matter for skewed counts.

The salt must be deterministic (statement-replay discipline,
reference README.md:30-33): we hash a high-cardinality discriminator
column rather than calling rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PHASE2 = {
    "count": F.sum,  # counts combine by summing
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}
_PHASE1 = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_on: str | Column,
    num_salts: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: output_name → (function, column) with function in
    count|sum|min|max. ``salt_on``: a high-cardinality column (or
    expression) whose hash spreads each hot key across reducers.

    Example::

        salted_agg(events, ["user_id"], {"n": ("count", "event_id"),
                   "sv": ("sum", "value")}, salt_on="event_id")
    """
    unknown = [f for f, _ in aggs.values() if f not in _PHASE1]
    if unknown:
        raise ValueError(f"non-algebraic aggregate(s) {unknown}; salting needs count/sum/min/max")

    salt_col = F.pmod(F.xxhash64(F.col(salt_on) if isinstance(salt_on, str) else salt_on), F.lit(num_salts))
    phase1 = (
        df.withColumn("__salt", salt_col)
        .groupBy(*keys, "__salt")
        .agg(*[_PHASE1[fn](col).alias(f"__p_{name}") for name, (fn, col) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[_PHASE2[fn](f"__p_{name}").alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_avg(
    df: DataFrame, keys: list[str], value_col: str, salt_on: str, num_salts: int = 32, out_col: str = "avg"
) -> DataFrame:
    """AVG decomposed to salted sum/count."""
    partial = salted_agg(
        df, keys, {"__s": ("sum", value_col), "__c": ("count", value_col)}, salt_on, num_salts
    )
    return partial.select(*keys, (F.col("__s") / F.col("__c")).alias(out_col))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    num_salts: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Skew-resistant equi-join by salting the hot side and replicating
    the other: ``left`` rows get a deterministic salt in [0, num_salts),
    ``right`` rows are replicated once per salt value, and the join key
    becomes (keys..., salt) — a single hot key spreads across
    ``num_salts`` reducers instead of one.

    Use when AQE's skew-join split can't help (e.g. the skew is in a
    shuffle feeding a later stage, or AQE is disabled); cost is
    ``num_salts``× replication of the right side, so put the smaller
    input on the right. The salt hashes a high-cardinality ``salt_on``
    discriminator (default: the whole left row via ``monotonically``-free
    xxhash of all non-key columns is NOT deterministic across retries —
    so pass a stable unique column when exact replay matters; default
    uses the key columns plus every left column deterministically).

    Semantics equal ``left.join(right, on, how)`` for 'inner' and
    'left' joins (each left row keeps exactly one salt; every right row
    exists under every salt).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    disc = (
        (F.col(salt_on) if isinstance(salt_on, str) else salt_on)
        if salt_on is not None
        else F.struct(*[F.col(c) for c in left.columns])
    )
    salted_l = left.withColumn("__salt", F.pmod(F.xxhash64(disc), F.lit(num_salts)))
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    salted_r = right.withColumn("__salt", salts)
    out = salted_l.join(salted_r, [*on, "__salt"], how)
    return out.drop("__salt")


def salted_topk(
    df: DataFrame,
    keys: list[str],
    order_by: list,
    k: int,
    salt_on: str | Column,
    num_salts: int = 32,
) -> DataFrame:
    """Two-phase skew-resistant top-k per key: top-k decomposes like
    the algebraic aggregates (the global top-k of a group is contained
    in the union of per-salt top-ks), so a hot key never funnels all
    its rows through one reducer's sort.

      phase 1: row_number over (keys + salt) keeps k rows per salt
      phase 2: row_number over keys on the ≤ k·num_salts survivors

    ``order_by``: list of (column, 'asc'|'desc') pairs; include a
    unique tiebreaker as the last pair for deterministic output.
    ``salt_on``: deterministic high-cardinality discriminator (never
    rand() — statement-replay discipline)."""
    from pyspark.sql import Window as W

    cols = []
    for c, d in order_by:
        cc = F.col(c) if isinstance(c, str) else c
        cols.append(cc.desc() if str(d).lower() == "desc" else cc.asc())
    salt_col = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_col), F.lit(num_salts)))
    w1 = W.partitionBy(*keys, "__salt").orderBy(*cols)
    survivors = (
        salted.withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= k)
        .drop("__rk", "__salt")
    )
    w2 = W.partitionBy(*keys).orderBy(*cols)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def distributed_rank(
    df: DataFrame,
    part_col: str,
    order_col: str,
    n_slices: int | None = None,
) -> DataFrame:
    """rank / percent_rank / cume_dist over a LOW-CARDINALITY window
    partition without single-tasking it (r9, verdict task #7).

    ``PARTITION BY status ORDER BY price`` with 3 distinct statuses
    sorts a third of the table in ONE task at scale — the b5f/b5h
    shape. This is the scale-safe two-phase construction (the
    pack_sequences recipe):

      1. ``repartitionByRange(n_slices, part, order)`` — the range
         partitioner gives each task a contiguous (part, order) slice
         of ~n/n_slices rows; identical keys never straddle slices, so
         tie groups stay intact.
      2. per-slice local rank via a window on (slice id, part) — each
         task sorts only its own slice.
      3. collect the per-(slice, part) COUNTS only (n_slices × K tiny
         rows), turn them into broadcast prefix offsets, and add:
         global rank = prefix + local rank.

    percent_rank = (rank-1)/(n-1) and cume_dist = (rank-1+ties)/n
    derive from the same offsets (ties counted per (slice, part,
    order) — safe because equal keys share a slice). The slice tagging
    is pinned with a localCheckpoint: the counts job and the output
    would otherwise re-evaluate the range partitioning with a fresh
    sample RNG and disagree on slice ids (the _with_insertion_index
    lesson). The checkpoint is LAZY and the counts job is its
    materializing action (it aggregates every partition, so the
    checkpoint is fully pinned before the output job runs) — one full
    pass over the shuffled data instead of two (r13 opt).

    Output: input columns + ``rk`` (long), ``pr``, ``cd`` (double).
    NULL order keys follow Spark's NULLS FIRST ascending default —
    pass a pre-filtered frame if NULL semantics matter. NULL PARTITION
    keys rank as their own group, exactly like a plain window (r10:
    the offsets join is null-safe — a plain inner join silently
    dropped the NULL partition)."""
    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    spark = df.sparkSession
    if n_slices is None:
        n_slices = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    tagged = (
        df.repartitionByRange(n_slices, F.col(part_col), F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # the materializing action: computes (and pins) every partition
    counts = tagged.groupBy("__pid", part_col).count().collect()
    totals: dict = {}
    for r in sorted(counts, key=lambda r: (r["__pid"],)):
        totals.setdefault(r[part_col], []).append((r["__pid"], int(r["count"])))
    offs = []
    part_field = next(f for f in df.schema.fields if f.name == part_col)
    for part, lst in totals.items():
        n_part = sum(c for _, c in lst)
        acc = 0
        for pid, c in lst:
            offs.append((int(pid), part, acc, n_part))
            acc += c
    schema = T.StructType(
        [
            T.StructField("__pid", T.IntegerType()),
            T.StructField(part_col, part_field.dataType),
            T.StructField("__off", T.LongType()),
            T.StructField("__n", T.LongType()),
        ]
    )
    offs_df = (
        spark.createDataFrame(offs, schema)
        .withColumnRenamed("__pid", "__opid")
        .withColumnRenamed(part_col, "__opart")
    )
    lw = W.partitionBy("__pid", part_col).orderBy(order_col)
    tw = W.partitionBy("__pid", part_col, order_col)
    local = tagged.withColumn("__lrk", F.rank().over(lw)).withColumn(
        "__ties", F.count("*").over(tw)
    )
    rk = (F.col("__off") + F.col("__lrk")).cast("long")
    pr = F.when(
        F.col("__n") > 1, (rk - F.lit(1)) / (F.col("__n") - F.lit(1))
    ).otherwise(F.lit(0.0))
    cd = (rk - F.lit(1) + F.col("__ties")) / F.col("__n")
    # eqNullSafe on the partition key: a NULL partition must pick up its
    # offsets like any other group (plain window semantics)
    on = (F.col("__pid") == F.col("__opid")) & F.col(part_col).eqNullSafe(
        F.col("__opart")
    )
    return (
        local.join(F.broadcast(offs_df), on)
        .withColumn("rk", rk)
        .withColumn("pr", pr.cast("double"))
        .withColumn("cd", cd.cast("double"))
        .drop("__pid", "__opid", "__opart", "__lrk", "__ties", "__off", "__n")
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    n_slices: int | None = None,
) -> tuple[DataFrame, int]:
    """``ROW_NUMBER() OVER (ORDER BY ...)`` — a GLOBAL order — without
    the single-task sort (r12; the b5e de-weak).

    A no-PARTITION-BY ranking window plans ``Exchange SinglePartition``:
    ONE task sorts the whole table at 100 TB. Decomposition (the
    :func:`distributed_rank` recipe minus the partition key):

      1. ``repartitionByRange`` over the order columns — each task owns
         a contiguous global slice of ~n/n_slices rows,
      2. per-slice local ``row_number`` (task-local sort),
      3. per-slice COUNTS only (n_slices tiny rows) collected into
         broadcast prefix offsets; global rn = prefix + local rn.

    The caller must pass a TIE-FREE order (append a unique key):
    duplicate keys may straddle a slice boundary and would receive
    sampler-dependent numbers. The slice tagging is pinned with a lazy
    localCheckpoint materialized BY the counts job (every partition
    aggregated — the distributed_rank discipline), so the counts job
    and the output agree on slice ids in one pass. Returns
    ``(df + rn [long], total_count)`` — the total rides along free
    from the counts pass.
    """
    from pyspark.sql import Window as W

    spark = df.sparkSession
    if n_slices is None:
        n_slices = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # strings or Column sort specs (F.col(c).desc() for descending
    # global orders — the b5a RANK() OVER (ORDER BY price DESC) shape)
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    tagged = (
        df.repartitionByRange(n_slices, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # the materializing action: computes (and pins) every partition
    counts = sorted(
        tagged.groupBy("__pid").count().collect(), key=lambda r: r["__pid"]
    )
    offs, acc = [], 0
    for r in counts:
        offs.append((int(r["__pid"]), acc))
        acc += int(r["count"])
    offs_df = spark.createDataFrame(offs, "__opid INT, __off BIGINT")
    lw = W.partitionBy("__pid").orderBy(*cols)
    out = (
        tagged.withColumn("__lrn", F.row_number().over(lw))
        .join(F.broadcast(offs_df), F.col("__pid") == F.col("__opid"))
        .withColumn("rn", (F.col("__off") + F.col("__lrn")).cast("long"))
        .drop("__pid", "__opid", "__off", "__lrn")
    )
    return out, acc


def ntile_from_rn(rn: Column, n_total: int, k: int) -> Column:
    """``NTILE(k)`` from a global row number: the first ``n % k``
    buckets carry ``n // k + 1`` rows (SQL standard / SQLite
    ntileValueFunc). Pure integer arithmetic over the
    :func:`global_row_number` output — no window, no shuffle. The
    ``div`` operator keeps it integer-exact at any n (no double
    rounding near bucket boundaries)."""
    base, rem = divmod(n_total, k)
    cut = rem * (base + 1)
    r0 = rn - F.lit(1)

    # integer-exact floor division: (a - a % d) / d — a - a%d is an
    # exact multiple, so the IEEE division is exact
    def _idiv(a: Column, d: int) -> Column:
        return ((a - F.pmod(a, F.lit(d))) / F.lit(d)).cast("bigint")

    if base == 0:
        return rn.cast("bigint")
    return (
        F.when(rn <= F.lit(cut), _idiv(r0, base + 1) + F.lit(1))
        .otherwise(F.lit(rem) + _idiv(r0 - F.lit(cut), base) + F.lit(1))
        .cast("bigint")
    )


def broadcast_dense_rank(df: DataFrame, col: str, out: str = "dr") -> DataFrame:
    """``DENSE_RANK() OVER (ORDER BY col)`` for a LOW-CARDINALITY key
    without any window: dense rank depends only on the key's distinct
    values, so collect them (bounded by the low-cardinality contract —
    the distributed_rank posture), rank them driver-side, and
    broadcast-join the tiny rank table back. NULLs rank first (Spark
    ASC default); callers with NULL keys get the plain-window
    semantics via the null-safe join."""
    spark = df.sparkSession
    vals = [r[0] for r in df.select(col).distinct().collect()]
    vals.sort(key=lambda v: (v is not None, v))
    field = next(f for f in df.schema.fields if f.name == col)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("__dval", field.dataType),
            T.StructField(out, T.LongType()),
        ]
    )
    ranks = spark.createDataFrame(
        [(v, i + 1) for i, v in enumerate(vals)], schema
    )
    return df.join(
        F.broadcast(ranks), F.col(col).eqNullSafe(F.col("__dval"))
    ).drop("__dval")
