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


def gap_fill_locf(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: tuple = ("event_type",),
    value_col: str = "value",
    resolution_s: int = 3600,
) -> DataFrame:
    """Gap-filled per-key time buckets with last-observation-carried-
    forward — TimescaleDB's ``time_bucket_gapfill`` + ``locf()`` shape.

    Builds the dense bucket spine from the GLOBAL [min, max] bucket
    range (one tiny agg, metadata-sized: span/resolution rows) crossed
    with the distinct key set, left-joins the observed per-bucket
    averages, then carries each key's last observed average forward
    with an IGNORE NULLS running last_value. Leading gaps (before a
    key's first observation) stay NULL, matching locf(). ``filled`` = 1
    marks carried rows.

    Hash stability: bucket keys are epoch-second BIGINT floors; the
    average is an exact DECIMAL(25,6) sum cast to DOUBLE, divided by
    the count and rounded to 4 — order-independent and engine-exact
    (the c3i/c10c decimal recipe).

    Scale: the spine never materializes the corpus — span/res × |keys|
    rows; the observed aggregation is one shuffle with map-side
    combine; the LOCF window partitions by key (one more shuffle on
    the SPINE, not the events)."""
    from pyspark.sql import Window as W

    res = F.lit(int(resolution_s)).cast("long")
    keyed = events.select(
        *[F.col(k) for k in key_cols],
        (F.floor(F.unix_timestamp(F.col(ts_col)) / res) * res)
        .cast("long")
        .alias("bucket_s"),
        F.col(value_col).alias("__v"),
    )
    observed = keyed.groupBy(*key_cols, "bucket_s").agg(
        F.round(
            F.sum(F.col("__v").cast("decimal(25,6)")).cast("double") / F.count("*"),
            4,
        ).alias("avg_value")
    )
    rng = keyed.agg(F.min("bucket_s").alias("lo"), F.max("bucket_s").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), res)).alias("bucket_s")
    ).crossJoin(keyed.select(*key_cols).distinct())
    w = (
        W.partitionBy(*key_cols)
        .orderBy("bucket_s")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(observed, [*key_cols, "bucket_s"], "left")
        .withColumn("filled", F.col("avg_value").isNull().cast("long"))
        .withColumn("avg_value", F.last("avg_value", ignorenulls=True).over(w))
    )


def funnel_counts(
    events: DataFrame,
    steps: tuple = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-sequence funnel: per user, the earliest time each step
    completes STRICTLY AFTER the previous step's completion (classic
    product-analytics funnel; SQL-standard chained-min construction, so
    any engine replays it exactly). Output: one row per funnel stage
    (1-based) with the number of users whose furthest completion is >=
    that stage.

    Scale shape: len(steps) chained aggregations, every one shuffling
    on the SAME user key — Spark reuses the hash partitioning, so the
    chain costs one real exchange of (user, ts) pairs, never event
    payloads. No window over a global ordering anywhere. Each stage's
    per-user frame is persisted (r10, scale-smoke finding): stage i
    feeds BOTH stage i+1 and its own count branch, and without the
    cache the chain re-evaluated earlier stages once per consumer —
    O(steps²/2) re-scans of the event source (measured 24× CPU for 16×
    rows; linear with the cache). The cached frames are per-USER
    aggregates — orders of magnitude smaller than the events.
    """
    t = F.unix_micros(F.col(ts_col))
    # persist the steps-filtered (u, t, e) projection: every stage
    # filtered `base` separately, re-scanning the event source once per
    # step (r14; len(steps) scans → 1 — the c4u persisted-base shape).
    # Funnel-relevant events ≪ events, and the projection is 3 narrow
    # columns.
    base = (
        events.select(
            F.col(user_col).alias("u"), t.alias("t"), F.col(type_col).alias("e")
        )
        .filter(F.col("e").isin(*steps))
        .persist()
    )
    cur = base.filter(F.col("e") == steps[0]).groupBy("u").agg(F.min("t").alias("t1"))
    reached = [cur.persist()]
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            base.filter(F.col("e") == step)
            .join(reached[-1].select("u", F.col(f"t{i-1}")), "u")
            .filter(F.col("t") > F.col(f"t{i-1}"))
            .groupBy("u")
            .agg(F.min("t").alias(f"t{i}"))
        )
        reached.append(nxt.persist())
    rows = None
    for i, r in enumerate(reached, start=1):
        row = r.agg(
            F.lit(i).cast("long").alias("stage"),
            F.count("*").alias("users"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


def window_funnel(
    events: DataFrame,
    steps: tuple = ("signup", "click", "purchase"),
    window_us: int = 7 * 86400 * 1_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Timeout funnel (r13; the ClickHouse ``windowFunnel`` shape): per
    user, the chain completes stage k only when step k's earliest
    eligible event falls STRICTLY AFTER stage k-1's completion AND
    within ``window_us`` of stage 1's completion — the deterministic
    earliest-chain discipline (t1 = min step-1 time; each later stage
    the chained min under both constraints), so any engine replays it
    exactly. Output: one row per stage with the user count reaching ≥
    that stage.

    Scale shape inherits :func:`funnel_counts`: len(steps) chained
    per-user aggregations on the SAME user key (one real exchange of
    (user, ts) pairs), each stage's per-user frame persisted — stage i
    feeds stage i+1 and its own count branch (the r10 O(steps²)
    scale-smoke lesson). The window constraint rides along as the t1
    column; no global window anywhere.
    """
    t = F.unix_micros(F.col(ts_col))
    # one persisted steps-filtered projection instead of a scan per
    # stage (r14 — see funnel_counts)
    base = (
        events.select(
            F.col(user_col).alias("u"), t.alias("t"), F.col(type_col).alias("e")
        )
        .filter(F.col("e").isin(*steps))
        .persist()
    )
    cur = (
        base.filter(F.col("e") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t1"))
        .withColumn("tprev", F.col("t1"))
    )
    reached = [cur.persist()]
    for step in steps[1:]:
        nxt = (
            base.filter(F.col("e") == step)
            .join(reached[-1].select("u", "t1", "tprev"), "u")
            .filter(
                (F.col("t") > F.col("tprev"))
                & (F.col("t") <= F.col("t1") + F.lit(window_us))
            )
            .groupBy("u", "t1")
            .agg(F.min("t").alias("tnext"))
            .select("u", "t1", F.col("tnext").alias("tprev"))
        )
        reached.append(nxt.persist())
    rows = None
    for i, r in enumerate(reached, start=1):
        row = r.agg(
            F.lit(i).cast("long").alias("stage"),
            F.count("*").cast("long").alias("n_users"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows.orderBy("stage")


def ewma_smooth(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket_s: int = 3600,
    lags: int = 8,
) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 1/2) over hourly
    bucket averages, truncated at ``lags`` observations and renormalized
    over the lags actually present.

    Hash-stable across engines by construction (the c3i decimal
    recipe): bucket averages are DECIMAL sums with one double division,
    and the EWMA weights 2^-(k+1) are EXACT binary fractions — the
    weighted numerator/denominator are sums of exactly-representable
    doubles in a FIXED lag order (not a data-order-dependent float
    reduction), so Spark and DuckDB produce identical bits before the
    final ROUND. Lag semantics: previous OBSERVED buckets per key, not
    previous wall-clock hours (compose with gap_fill_locf for a dense
    spine).
    """
    from pyspark.sql import Window as W

    keyed = events.select(
        F.col(key_col).alias("k"),
        (F.floor(F.unix_micros(F.col(ts_col)) / (bucket_s * 1_000_000)) * bucket_s)
        .cast("long")
        .alias("bucket_s"),
        F.col(value_col).cast("decimal(25,6)").alias("v"),
    )
    avgs = keyed.groupBy("k", "bucket_s").agg(
        (F.sum("v").cast("double") / F.count("*")).alias("avg_v")
    )
    w = W.partitionBy("k").orderBy("bucket_s")
    # r13 opt: materialize each lag ONCE as an attribute column before
    # the weighted fold — Column expression trees are copied per textual
    # reference, so folding F.lag(...).over(w) directly instantiated 3
    # window frames per lag (24 total; plan-visible as _we0.._we23).
    # One projection of 8 lag attributes leaves the Window node exactly
    # 8 frames; the fold itself is a cheap scalar chain over attributes.
    lagged = avgs.select(
        "k",
        "bucket_s",
        "avg_v",
        *[F.lag("avg_v", kk).over(w).alias(f"__l{kk}") for kk in range(lags)],
    )
    num = F.lit(0.0)
    den = F.lit(0.0)
    for kk in range(lags):
        wt = 2.0 ** -(kk + 1)  # exact binary fraction
        lv = F.col(f"__l{kk}")
        num = num + F.when(lv.isNotNull(), lv * F.lit(wt)).otherwise(F.lit(0.0))
        den = den + F.when(lv.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return lagged.select(
        F.col("k"),
        "bucket_s",
        F.round(F.col("avg_v"), 4).alias("avg_v"),
        F.round(num / den, 4).alias("ewma"),
    )


def resample_ohlc(
    events: DataFrame,
    bucket_s: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-series downsampling to OHLC candles: per (key, bucket) the
    first value (open), max (high), min (low), last value (close) and
    the observation count — the classic hypertable/financial resample.

    Hash-stable across engines by construction: open/close are PICKED
    values (row_number over the total order (ts, id) — the id tiebreak
    makes duplicate timestamps deterministic), high/low are exact
    comparisons, and no float accumulation happens anywhere.

    Scale shape: the two row_number windows and the groupBy all
    partition on the SAME (key, bucket) pair, so the whole resample
    costs ONE hash exchange of (key, bucket, ts, value, id) tuples;
    partition count is per (key, bucket), never a global sort.
    """
    from pyspark.sql import Window as W

    t = F.unix_micros(F.col(ts_col))
    base = events.select(
        F.col(key_col).alias("k"),
        (F.floor(t / (bucket_s * 1_000_000)) * bucket_s).cast("long").alias("bucket_s"),
        t.alias("__t"),
        F.col(value_col).alias("v"),
        F.col(id_col).alias("__eid"),
    )
    wa = W.partitionBy("k", "bucket_s").orderBy("__t", "__eid")
    wd = W.partitionBy("k", "bucket_s").orderBy(F.col("__t").desc(), F.col("__eid").desc())
    rr = base.withColumn("__ra", F.row_number().over(wa)).withColumn(
        "__rd", F.row_number().over(wd)
    )
    return rr.groupBy("k", "bucket_s").agg(
        F.max(F.when(F.col("__ra") == 1, F.col("v"))).alias("open"),
        F.max("v").alias("high"),
        F.min("v").alias("low"),
        F.max(F.when(F.col("__rd") == 1, F.col("v"))).alias("close"),
        F.count("*").alias("n"),
    )


def rolling_zscore(
    events: DataFrame,
    bucket_s: int = 3600,
    lags: int = 8,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Rolling z-score anomaly signal over hourly bucket averages: each
    observed bucket scores against the mean/std of its trailing ``lags``
    OBSERVED buckets (itself included; emitted only when >= 3 lags are
    present and the std is positive).

    Hash-stable across engines by the c7d EWMA recipe: bucket averages
    are DECIMAL sums with one double division; the rolling mean and
    sum-of-squares fold over an EXPLICIT lag chain in fixed order (not
    a data-order float window reduction), so both engines produce
    identical bits into the final ROUND. Std uses the textbook
    (sumsq/n - mean^2) form computed from those fixed folds; sqrt is
    IEEE-correctly-rounded in both engines.
    """
    from pyspark.sql import Window as W

    keyed = events.select(
        F.col(key_col).alias("k"),
        (F.floor(F.unix_micros(F.col(ts_col)) / (bucket_s * 1_000_000)) * bucket_s)
        .cast("long")
        .alias("bucket_s"),
        F.col(value_col).cast("decimal(25,6)").alias("v"),
    )
    avgs = keyed.groupBy("k", "bucket_s").agg(
        (F.sum("v").cast("double") / F.count("*")).alias("avg_v")
    )
    w = W.partitionBy("k").orderBy("bucket_s")
    # r13 opt: materialize each lag ONCE as an attribute column, then
    # fold the moments from a SECOND projection of attribute columns
    # (mirrors the oracle's lagged/folded CTEs). The direct fold
    # instantiated every F.lag().over(w) per textual reference — the
    # mean/var/z chains expanded to ~200 window frames (plan-visible as
    # _we0.._we199, 25x the 8 needed) and the Window stage dominated
    # the query (measured ~15s cold / 2.4s warm at sf0.1 on one task).
    lagged = avgs.select(
        "k",
        "bucket_s",
        "avg_v",
        *[F.lag("avg_v", kk).over(w).alias(f"__l{kk}") for kk in range(lags)],
    )
    s1 = F.lit(0.0)
    s2 = F.lit(0.0)
    n = F.lit(0).cast("long")
    for kk in range(lags):
        lv = F.col(f"__l{kk}")
        s1 = s1 + F.when(lv.isNotNull(), lv).otherwise(F.lit(0.0))
        s2 = s2 + F.when(lv.isNotNull(), lv * lv).otherwise(F.lit(0.0))
        n = n + F.when(lv.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    folded = lagged.select(
        "k",
        "bucket_s",
        "avg_v",
        s1.alias("__s1"),
        s2.alias("__s2"),
        n.alias("__n"),
    )
    s1, s2, n = F.col("__s1"), F.col("__s2"), F.col("__n")
    mean = s1 / n
    # float cancellation on (sumsq/n - mean^2) can land EITHER side of
    # zero for a constant series: slightly negative makes sqrt() NaN
    # (which Spark/DuckDB order ABOVE 0 — the r10 ADVICE find), while
    # slightly positive makes a spurious huge-denominator z. ROUND the
    # variance at 12 dp before the gate (the fixed-resolution recipe):
    # true constants land exactly 0 → NULL; any real variance of
    # bucket-scale values is orders of magnitude above 1e-12.
    var = F.round(s2 / n - mean * mean, 12)
    std = F.sqrt(var)
    z = F.when(
        (n >= 3) & (var > 0), F.round((F.col("avg_v") - mean) / std, 4)
    ).otherwise(F.lit(None).cast("double"))
    return folded.select(
        "k",
        "bucket_s",
        F.round("avg_v", 4).alias("avg_v"),
        n.alias("n_obs"),
        z.alias("z"),
    )


def mad_anomalies(
    events: DataFrame,
    bucket_s: int = 3600,
    n_mads: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Median-absolute-deviation anomaly flags over hourly bucket
    averages (r13): a bucket is anomalous when its average sits more
    than ``n_mads`` MADs from the key's median — the robust-statistics
    complement of the c7f z-score (outliers can't poison their own
    threshold).

    INTEGER-EXACT recipe (the hash-stability discipline for nested
    medians): the bucket average rounds once to ten-thousandths and
    scales to int64 (x); the median carries as med4 = 4·median (even
    frames keep lo+hi doubled instead of halving), deviations as
    d_q = |4x − med4| = 4·|x − med|, and the MAD as M2 = 8·MAD — so
    the flag test |x−med| > n·MAD becomes the pure-int64 comparison
    2·d_q > n·M2 and every halving a float could smear is deferred to
    the exact display divisions (x/1e4, med4/4e4, M2/8e4 — int64 →
    double is correctly rounded in both engines).

    Scale shape: one hash exchange on the key for the bucket agg, then
    two per-key aggregations + joins all riding the SAME key
    partitioning; the per-key arrays are BUCKET counts (span/bucket_s),
    never events.
    """
    keyed = events.select(
        F.col(key_col).alias("k"),
        (F.floor(F.unix_micros(F.col(ts_col)) / (bucket_s * 1_000_000)) * bucket_s)
        .cast("long")
        .alias("bucket_s"),
        F.col(value_col).cast("decimal(25,6)").alias("v"),
    )
    # persist the bucket table (rows = distinct (key, bucket) ≪ events):
    # it feeds the median agg, the deviation join, the MAD agg and the
    # final projection — without it the plan duplicates the
    # scan+bucket-agg subtree 8× and leans on runtime ReuseExchange to
    # dedupe it (r14; the c4u persisted-base shape). Same values: the
    # cache replays one deterministic aggregation.
    avgs = keyed.groupBy("k", "bucket_s").agg(
        F.round((F.sum("v").cast("double") / F.count("*")) * 10000, 0)
        .cast("long")
        .alias("x")
    ).persist()

    def _med4(col_list):
        arr = F.array_sort(col_list)
        n = F.size(arr)
        lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
        hi = F.element_at(arr, (n / 2 + 1).cast("int"))
        return F.when(n % 2 == 1, 4 * lo).otherwise(2 * (lo + hi))

    med_tab = avgs.groupBy("k").agg(_med4(F.collect_list("x")).alias("med4"))
    devs = avgs.join(med_tab, "k").withColumn(
        "d_q", F.abs(4 * F.col("x") - F.col("med4"))
    )
    mad_tab = devs.groupBy("k").agg(
        (_med4(F.collect_list("d_q")) / 2).cast("long").alias("m2")
    )
    return (
        devs.join(mad_tab, "k")
        .select(
            "k",
            "bucket_s",
            (F.col("x") / 10000.0).alias("avg_v"),
            (F.col("med4") / 40000.0).alias("med_v"),
            (F.col("m2") / 80000.0).alias("mad_v"),
            F.when(2 * F.col("d_q") > n_mads * F.col("m2"), 1)
            .otherwise(0)
            .cast("long")
            .alias("is_anomaly"),
        )
        .orderBy("k", "bucket_s")
    )


def rolling_median(
    events: DataFrame,
    window_rows: int = 10,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Exact rolling median over the trailing ``window_rows + 1``
    observations per key (r12) — the robust-center complement of the
    c7f rolling z-score (MAD-style anomaly pipelines start here).

    Exactness contract: the frame is a ROWS window over the
    deterministic (ts, value) order — the value tiebreak makes frames
    with duplicate timestamps well-defined (equal-key ties swap only
    equal values, so the frame MULTISET, and with it the median, is
    unique). The even-count median interpolates (a+b)/2 — one IEEE add
    and halving, bit-identical in Spark and DuckDB, so the exposed
    ROUND(6) is belt-and-braces rather than load-bearing.

    100 TB posture: ONE hash exchange on the high-cardinality key;
    each partition sorts locally (not the b5f global-window smell);
    the median is a bounded O(frame log frame) JVM-side sort per row.
    """
    from pyspark.sql import Window as W

    base = events.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(value_col).cast("double").alias("v"),
    )
    w = W.partitionBy("k").orderBy("ts_us", "v").rowsBetween(-window_rows, 0)
    # Spark's median/percentile aggregates reject window FRAMES
    # (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the frame median
    # is the exact array form: sort the bounded frame, pick/interpolate
    # the middle — O(frame log frame) JVM-side, frame ≤ window_rows+1.
    # r13 opt: materialize the sorted frame ONCE as an attribute column
    # — Column trees are copied per textual reference, so picking
    # lo/hi/n straight off the window expression instantiated SEVEN
    # collect_list frames (7x the per-row frame buffer + sort).
    witharr = base.withColumn("__arr", F.array_sort(F.collect_list("v").over(w)))
    arr = F.col("__arr")
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = F.when(n % 2 == 1, lo).otherwise((lo + hi) / 2.0)
    return (
        witharr.withColumn("med", F.round(med, 6))
        .drop("__arr")
        .orderBy("k", "ts_us", "v")
    )
