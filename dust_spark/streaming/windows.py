"""Structured Streaming operators (SURVEY.md §2 B11): windowed
aggregation (tumbling/sliding/session), watermarked late-data handling,
stateful dedup, stream-static joins.

Each operator is transformation-only: it takes a (possibly streaming)
DataFrame and returns one, so identical logic runs in batch mode — the
batch run IS the correctness oracle (tests/test_streaming.py asserts
stream == batch on the same inputs, reference-free since dust has no
streaming surface at all).

Scale posture: state stores are keyed by (window/key) — the same hash
partitioning as a batch groupBy; watermarks bound state size, which is
the only thing that matters at 100 TB/day ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dust_spark.tables import load_table, table_path


_stream_dirs: dict[str, str] = {}


def _as_stream_dir(sf_dir: str, name: str) -> str:
    """Streaming file sources require a directory; the fixtures are
    single files — expose each through a symlinked temp directory."""
    import os
    import tempfile

    src = table_path(sf_dir, name)
    key = os.path.abspath(src)
    if key not in _stream_dirs:
        d = tempfile.mkdtemp(prefix=f"dust_stream_{name}_")
        os.symlink(src, os.path.join(d, f"{name}.parquet"))
        _stream_dirs[key] = d
    return _stream_dirs[key]


def stream_events(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """The events fixture as a file-source stream (schema pinned from the
    batch read; ns→µs ts normalization identical to the batch path)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(table_path(sf_dir, "events"))
    reader = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(_as_stream_dir(sf_dir, "events"))
    )
    from pyspark.sql import types as T

    if isinstance(reader.schema["ts"].dataType, T.LongType):
        reader = reader.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(reader.schema["ts"].dataType, T.TimestampNTZType):
        # mirror tables._read_fixture: the NTZ fixture generation must
        # stream with the same LTZ type the batch path produces, or the
        # stream==batch parity invariant breaks on non-UTC hosts
        reader = reader.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return reader


def tumbling_window_agg(events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """count + sum(value) per tumbling event-time window."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sv"))
        .select(F.col("window.start").alias("ws"), "n", "sv")
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Per-user session windows with a fixed inactivity gap."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("ss"),
            F.col("session_window.end").alias("se"),
            "user_id",
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exactly-once dedup on event_id within the watermark
    horizon (batch mode: plain dropDuplicates)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


def stream_static_join(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Enrich the event stream with the customer dimension — the static
    side broadcasts; no state store involved."""
    return events.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        events.user_id == F.col("c_custkey"),
        "left",
    ).drop("c_custkey")


def stream_documents(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """The documents fixture as a file-source stream (schema pinned
    from the batch read — same symlink-dir trick as the events
    stream)."""
    batch = spark.read.parquet(table_path(sf_dir, "documents"))
    return (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(_as_stream_dir(sf_dir, "documents"))
    )


def stream_ingest_dedup(docs: DataFrame, corpus: DataFrame) -> DataFrame:
    """The streaming half of the incremental ingest gate
    (``operators.dedup_against_corpus``): drop arriving documents whose
    content hash already exists in the static deduplicated corpus —
    a stream-static LEFT ANTI join on sha2-256, stateless (no
    watermark/state store; the corpus side broadcasts when small, and
    at 100 TB the same plan shuffles the stream side against a
    bucketed corpus hash table). Batch mode is the identical
    expression, so stream==batch parity is testable directly. Near-dup
    banding stays a batch/micro-batch compaction step by design: band
    verification needs the corpus shingle sets, not a stream state
    machine."""
    hashes = corpus.select(F.sha2(F.col("text"), 256).alias("__h")).distinct()
    return docs.withColumn("__h", F.sha2(F.col("text"), 256)).join(
        hashes, "__h", "left_anti"
    ).drop("__h")


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: correlate a right-side event to each
    left-side event of the same ``key`` within ``(l_ts, l_ts + within]``
    — click→purchase-style attribution.

    Streaming semantics (Spark requirement, and what bounds state at
    100 TB/day): BOTH sides carry watermarks and the join condition
    includes the time range, so each side's state store evicts rows
    older than watermark + interval. Batch mode is the same join minus
    watermarks — the parity oracle."""
    lsrc = left.withWatermark("ts", watermark) if left.isStreaming else left
    rsrc = right.withWatermark("ts", watermark) if right.isStreaming else right
    la = lsrc.select(
        F.col(key).alias("k"), F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
    )
    ra = rsrc.select(
        F.col(key).alias("rk"), F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id")
    )
    cond = (
        (la["k"] == ra["rk"])
        & (ra["r_ts"] > la["l_ts"])
        & (ra["r_ts"] <= la["l_ts"] + F.expr(f"INTERVAL {within}"))
    )
    return la.join(ra, cond).select(
        F.col("k").alias(key), "l_id", "r_id", "l_ts", "r_ts"
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming DataFrame to completion against the current
    file set (test/dev harness): memory sink + processAllAvailable."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q


def load_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer")


def stream_orders(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """The orders fixture as a file-source stream (r13, for the
    attribution twin's stream-stream join)."""
    batch = spark.read.parquet(table_path(sf_dir, "orders"))
    return (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(_as_stream_dir(sf_dir, "orders"))
    )


def bucket_median_stream(
    events: DataFrame, bucket_s: int = 3600, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming half of the c7g rolling-median twin (r13): exact
    per-(key, time-bucket) sorted value state via a stateful
    ``collect_list`` aggregation (complete mode, integer bucket keys —
    the hypertable-rollup discipline). A per-ROW trailing frame is NOT
    streamable: a frame over event order would re-open already-emitted
    rows on out-of-order arrival (contrast ohlc_stream, whose
    min_by/max_by picks are arrival-order-free), so the streamable
    formulation keeps per-bucket exact state and composes the trailing
    window across COMPLETED buckets downstream
    (:func:`rolling_bucket_median` — bounded per-key bucket
    cardinality, usable on the sink table or in batch). State per
    (key, bucket) is the bucket's value multiset, bounded by bucket
    width."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    t = F.unix_micros(F.col("ts"))
    base = src.select(
        F.col("user_id").alias("k"),
        (F.floor(t / (bucket_s * 1_000_000)) * bucket_s).cast("long").alias("bucket_s"),
        F.col("value").cast("double").alias("v"),
    )
    return base.groupBy("k", "bucket_s").agg(
        F.array_sort(F.collect_list("v")).alias("vals"),
        F.count("*").alias("n"),
    )


def rolling_bucket_median(buckets: DataFrame, k_buckets: int = 3) -> DataFrame:
    """Trailing-``k_buckets`` exact median over the per-bucket sorted
    arrays of :func:`bucket_median_stream` — the batch composition that
    turns completed bucket state into the rolling robust center. The
    window is a bounded ROWS frame over per-key BUCKET rows (low
    cardinality: span/bucket_s per key), so the sort is cheap and the
    exchange is one hash partition on the key. Even-count frames
    interpolate (a+b)/2 exactly like operators.rolling_median."""
    from pyspark.sql import Window as W

    w = W.partitionBy("k").orderBy("bucket_s").rowsBetween(-(k_buckets - 1), 0)
    arr = F.array_sort(F.flatten(F.collect_list("vals").over(w)))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = F.when(n % 2 == 1, lo).otherwise((lo + hi) / 2.0)
    return buckets.select(
        "k", "bucket_s", F.round(med, 6).alias("med"), n.alias("n_frame")
    )


def attribution_pairs_stream(
    events: DataFrame,
    conversions: DataFrame,
    lookback: str = "30 days",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming half of the c6h touch-attribution twin (r13): a
    stream-stream INTERVAL self-join over the event stream — per user,
    every click whose timestamp falls in [conversion_ts - lookback,
    conversion_ts] pairs with that purchase conversion. The lookback
    bound is what makes the join state finite (real attribution windows
    are bounded; c6h's unbounded as-of against the orders table is the
    batch-only luxury — and the TPC-H order dates predate the event
    fixture entirely, so the LIVE attribution surface is
    click→purchase). First/last picks compose downstream
    (:func:`attribution_from_pairs`) — min_by/max_by are
    arrival-order-free, the ohlc lesson. INNER join scope: conversions
    with zero clicks in the window surface only in the batch twin
    (outer stream-stream rows emit on watermark close, which a bounded
    fixture never crosses — documented)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("eid"),
    )
    convs = conversions.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("ck"),
        F.col("ts").alias("conv_ts"),
        F.col("event_id").alias("conv_id"),
    )
    if clicks.isStreaming:
        clicks = clicks.withWatermark("c_ts", watermark)
    if convs.isStreaming:
        convs = convs.withWatermark("conv_ts", watermark)
    cond = (
        (F.col("k") == F.col("ck"))
        & (F.col("c_ts") <= F.col("conv_ts"))
        & (F.col("c_ts") >= F.col("conv_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return clicks.join(convs, cond, "inner").select(
        "conv_id", "eid", F.unix_micros("c_ts").alias("t")
    )


def attribution_from_pairs(pairs: DataFrame) -> DataFrame:
    """First/last-touch picks over the (conv_id, eid, t) pair stream —
    min_by/max_by on the (t, eid) struct resolve equal-time clicks by
    the id tiebreak exactly like c6h's window plan."""
    return pairs.groupBy("conv_id").agg(
        F.min_by("eid", F.struct("t", "eid")).alias("first_click"),
        F.max_by("eid", F.struct("t", "eid")).alias("last_click"),
    )


def ohlc_stream(events: DataFrame, bucket_s: int = 3600, watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of :func:`dust_spark.operators.resample_ohlc`
    (r10): the batch operator picks open/close via row_number over the
    (ts, event_id) total order — not streamable — but ``min_by`` /
    ``max_by`` on the same (ts, id) struct key pick the IDENTICAL
    values inside a stateful groupBy, so stream == batch row-for-row.
    Integer group keys (complete-mode aggregation, like the hypertable
    rollup twin); state per (key, bucket) is one candle, not events.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    t = F.unix_micros(F.col("ts"))
    base = src.select(
        F.col("user_id").alias("k"),
        (F.floor(t / (bucket_s * 1_000_000)) * bucket_s).cast("long").alias("bucket_s"),
        t.alias("__t"),
        F.col("value").alias("v"),
        F.col("event_id").alias("__eid"),
    )
    return base.groupBy("k", "bucket_s").agg(
        F.min_by("v", F.struct("__t", "__eid")).alias("open"),
        F.max("v").alias("high"),
        F.min("v").alias("low"),
        F.max_by("v", F.struct("__t", "__eid")).alias("close"),
        F.count("*").alias("n"),
    )
