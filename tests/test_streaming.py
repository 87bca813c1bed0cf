"""Streaming tests: every streaming operator's output must equal its
batch-mode execution on the same files (SURVEY.md §5.2 'streaming ops
tested with file sources + processAllAvailable against their batch-mode
results'), plus a watermark late-data scenario on a controlled
two-batch source."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dust_spark.streaming import (
    dedup_stream,
    run_stream_to_memory,
    running_user_counters,
    session_window_agg,
    sliding_window_agg,
    stream_documents,
    stream_events,
    stream_ingest_dedup,
    stream_static_join,
    tumbling_window_agg,
)
from dust_spark.tables import load_table
from tests.conftest import SF_DIR


def _assert_same(spark, stream_df, batch_df, name, sort_cols):
    q = run_stream_to_memory(stream_df, name)
    try:
        got = spark.table(name).orderBy(*sort_cols).collect()
        want = batch_df.orderBy(*sort_cols).collect()
        assert got == want, f"{name}: stream != batch ({len(got)} vs {len(want)} rows)"
        assert len(got) > 0
    finally:
        q.stop()


def test_tumbling_window_parity(spark):
    events_s = stream_events(spark, SF_DIR)
    events_b = load_table(spark, SF_DIR, "events")
    # complete mode: emit all windows regardless of watermark progress
    q = (
        tumbling_window_agg(events_s)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumble")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("tumble").orderBy("ws").collect()
        want = tumbling_window_agg(events_b).orderBy("ws").collect()
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_sliding_window_parity(spark):
    events_s = stream_events(spark, SF_DIR)
    events_b = load_table(spark, SF_DIR, "events")
    q = (
        sliding_window_agg(events_s)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("slide")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("slide").orderBy("ws", "event_type").collect()
        want = sliding_window_agg(events_b).orderBy("ws", "event_type").collect()
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_session_window_parity(spark):
    events_s = stream_events(spark, SF_DIR)
    events_b = load_table(spark, SF_DIR, "events")
    q = (
        session_window_agg(events_s)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("sess").orderBy("user_id", "ss").collect()
        want = session_window_agg(events_b).orderBy("user_id", "ss").collect()
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_dedup_stream_parity(spark):
    events_s = stream_events(spark, SF_DIR)
    events_b = load_table(spark, SF_DIR, "events")
    q = run_stream_to_memory(dedup_stream(events_s).select("event_id"), "dedup")
    try:
        q.processAllAvailable()
        got = spark.table("dedup").count()
        want = dedup_stream(events_b).count()
        assert got == want > 0
    finally:
        q.stop()


def test_stream_static_join(spark):
    events_s = stream_events(spark, SF_DIR)
    events_b = load_table(spark, SF_DIR, "events")
    cust = load_table(spark, SF_DIR, "customer")
    agg_cols = [F.count("*").alias("n"), F.count("c_mktsegment").alias("matched")]
    q = run_stream_to_memory(stream_static_join(events_s, cust), "enrich")
    try:
        got = spark.table("enrich").agg(*agg_cols).collect()
        want = stream_static_join(events_b, cust).agg(*agg_cols).collect()
        assert got == want
        assert got[0]["matched"] > 0
    finally:
        q.stop()


def test_stream_ingest_dedup_parity(spark):
    """The streaming ingest gate (stream-static anti-join on content
    hash) must equal its batch execution: arriving docs whose text
    already exists in the even-doc_id 'corpus' are dropped; parity on
    surviving ids and on the drop actually firing (the fixture contains
    cross-parity exact dups — if not, the corpus gets one planted)."""
    docs_b = load_table(spark, SF_DIR, "documents")
    corpus = docs_b.filter(F.col("doc_id") % 2 == 0)
    docs_s = stream_documents(spark, SF_DIR)
    q = run_stream_to_memory(stream_ingest_dedup(docs_s, corpus), "ingest")
    try:
        got = {r.doc_id for r in spark.table("ingest").select("doc_id").collect()}
        want = {
            r.doc_id
            for r in stream_ingest_dedup(docs_b, corpus).select("doc_id").collect()
        }
        assert got == want
        assert len(want) < docs_b.count()  # corpus members drop themselves
    finally:
        q.stop()


def test_stateful_counters_parity(spark):
    events_s = stream_events(spark, SF_DIR)
    events_b = load_table(spark, SF_DIR, "events")
    q = (
        running_user_counters(events_s)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("counters")
        .start()
    )
    try:
        q.processAllAvailable()
        # update mode emits one row per key per batch; the LAST emission
        # per user must equal the batch aggregate
        from pyspark.sql import Window as W

        got = spark.table("counters")
        # memory sink appends update rows in batch order; the max n_events
        # per user is the final state (counters only grow)
        final = got.groupBy("user_id").agg(
            F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value")
        )
        want = running_user_counters(events_b)
        assert final.orderBy("user_id").collect() == want.orderBy("user_id").collect()
    finally:
        q.stop()


def test_watermark_drops_late_rows(spark, tmp_path):
    """Two controlled micro-batches: batch 2 carries an event far older
    than the watermark advanced by batch 1 → append-mode windowed agg
    never includes it."""
    src = str(tmp_path / "wm_src")
    os.makedirs(src)
    from pyspark.sql import Row
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "ts timestamp, value double"
    batch1 = spark.createDataFrame(
        [
            Row(ts=t0 + dt.timedelta(minutes=m), value=1.0)
            for m in (5, 10, 55)  # windows 00:00 and 00:50 (10-min tumble)
        ]
        + [Row(ts=t0 + dt.timedelta(hours=3), value=1.0)],  # advances watermark to ~02:50
        schema,
    )
    batch1.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    q = stream.writeStream.outputMode("append").format("memory").queryName("wm").start()
    try:
        q.processAllAvailable()
        # late row: inside the already-finalized 00:00 window
        late = spark.createDataFrame([Row(ts=t0 + dt.timedelta(minutes=7), value=1.0)], schema)
        late.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = {r["ws"]: r["n"] for r in spark.table("wm").collect()}
        # window 00:00 held exactly one on-time event (minute 5); the late
        # minute-7 event arrived after the watermark passed and was dropped
        assert rows.get(t0) == 1, f"late row must be dropped, got {rows}"
    finally:
        q.stop()
        shutil.rmtree(src, ignore_errors=True)


def test_foreach_batch_exactly_once_sink(spark, tmp_path):
    """foreachBatch + checkpoint: the sink sees each micro-batch once
    with its epoch id; restarting from the checkpoint does not re-emit
    processed batches (the exactly-once recipe for arbitrary sinks)."""
    import json
    import os

    src = str(tmp_path / "fb_src")
    sink = str(tmp_path / "fb_sink.jsonl")
    ckpt = str(tmp_path / "fb_ckpt")
    os.makedirs(src)

    from pyspark.sql import Row
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    schema = "ts timestamp, value double"
    spark.createDataFrame([Row(ts=t0, value=1.0)], schema).coalesce(1).write.mode("append").parquet(src)

    def emit(df, epoch_id):
        rows = df.count()
        with open(sink, "a") as f:
            f.write(json.dumps({"epoch": epoch_id, "rows": rows}) + "\n")

    def run_once():
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(emit)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    first = [json.loads(x) for x in open(sink)]
    assert sum(e["rows"] for e in first) == 1

    # add data, restart from checkpoint: only the NEW rows are emitted
    spark.createDataFrame([Row(ts=t0 + dt.timedelta(minutes=1), value=2.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    second = [json.loads(x) for x in open(sink)]
    assert sum(e["rows"] for e in second) == 2  # 1 old (already emitted) + 1 new
    assert len({e["epoch"] for e in second}) == len(second)  # distinct epochs only


def test_stream_stream_join_parity(spark):
    """view→purchase attribution: stream-stream inner join with
    watermarks on both sides must equal the batch join."""
    from dust_spark.streaming import stream_stream_join

    batch = load_table(spark, SF_DIR, "events")
    views_b = batch.filter(F.col("event_type") == "view")
    buys_b = batch.filter(F.col("event_type") == "purchase")
    want_df = stream_stream_join(views_b, buys_b)

    stream = stream_events(spark, SF_DIR)
    views_s = stream.filter(F.col("event_type") == "view")
    buys_s = stream.filter(F.col("event_type") == "purchase")
    got_df = stream_stream_join(views_s, buys_s)
    _assert_same(spark, got_df, want_df, "ss_join", ["user_id", "l_id", "r_id"])


def test_ntz_fixture_generation_parity(spark, tmp_path):
    """Fixture generations vary: some write ts as TIMESTAMP_NTZ instead
    of nanos-long. Both load_table and stream_events must normalize NTZ
    to TimestampType so stream == batch holds (and values match the
    nanos generation) on any host timezone."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    base = dt.datetime(2024, 3, 1, 0, 10, 0)
    rows = [(i, base + dt.timedelta(minutes=7 * i), i % 3, f"e{i % 2}", float(i)) for i in range(40)]
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "raw")
    )
    import glob as g
    import shutil

    part = g.glob(str(tmp_path / "raw" / "part-*.parquet"))[0]
    shutil.copy(part, str(sf_dir / "events.parquet"))

    batch = load_table(spark, str(sf_dir), "events")
    assert isinstance(batch.schema["ts"].dataType, T.TimestampType)

    events_s = stream_events(spark, str(sf_dir))
    assert isinstance(events_s.schema["ts"].dataType, T.TimestampType)

    q = (
        tumbling_window_agg(events_s)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ntz_tumble")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("ntz_tumble").orderBy("ws").collect()
        want = tumbling_window_agg(batch).orderBy("ws").collect()
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_hypertable_rollup_stream_parity(spark):
    """The multi-resolution rollup groups on integer bucket keys, so the
    identical operator runs as a streaming aggregation (complete mode)
    — stream == batch on the events fixture."""
    from dust_spark.operators import hypertable_rollup

    events_s = stream_events(spark, SF_DIR)
    events_b = load_table(spark, SF_DIR, "events")
    q = (
        hypertable_rollup(events_s.withWatermark("ts", "10 minutes"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("rollup_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("rollup_stream").orderBy("res_s", "bucket_s", "event_type").collect()
        want = hypertable_rollup(events_b).orderBy("res_s", "bucket_s", "event_type").collect()
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_bucket_median_stream_parity(spark):
    """r13 (c7g twin): per-(key, bucket) sorted-value state streams in
    complete mode and equals the batch formulation exactly; the
    trailing-K rolling median composed over the completed buckets
    equals (a) the same composition in batch and (b) a direct raw-event
    computation of the same frame definition."""
    from dust_spark.streaming.windows import (
        bucket_median_stream,
        rolling_bucket_median,
    )

    events_s = stream_events(spark, SF_DIR)
    events_b = load_table(spark, SF_DIR, "events")
    q = (
        bucket_median_stream(events_s)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("med_buckets")
        .start()
    )
    try:
        q.processAllAvailable()
        got_b = spark.table("med_buckets")
        want_b = bucket_median_stream(events_b)
        g = got_b.orderBy("k", "bucket_s").collect()
        w = want_b.orderBy("k", "bucket_s").collect()
        assert g == w and len(g) > 0
        # rolling composition parity (streamed buckets vs batch buckets)
        got_r = rolling_bucket_median(got_b).orderBy("k", "bucket_s").collect()
        want_r = rolling_bucket_median(want_b).orderBy("k", "bucket_s").collect()
        assert got_r == want_r and len(got_r) > 0
        # direct raw-event oracle for one frame: the trailing-3-bucket
        # frame of the LAST bucket of the first key equals the median
        # of those buckets' raw values
        import statistics

        k0, b0 = got_r[-1]["k"], got_r[-1]["bucket_s"]
        vals = (
            events_b.select(
                F.col("user_id").alias("k"),
                (F.floor(F.unix_micros("ts") / 3_600_000_000) * 3600)
                .cast("long")
                .alias("b"),
                F.col("value").cast("double").alias("v"),
            )
            .filter((F.col("k") == k0) & (F.col("b") <= b0))
        )
        last3 = sorted(
            r["b"] for r in vals.select("b").distinct().orderBy("b").collect()
        )[-3:]
        raw = sorted(
            r["v"] for r in vals.filter(F.col("b").isin(last3)).collect()
        )
        want_med = round(statistics.median(raw), 6)
        assert got_r[-1]["med"] == want_med
    finally:
        q.stop()


def test_attribution_stream_parity(spark):
    """r13 (c6h twin): the stream-stream interval self-join (clicks ×
    purchase conversions per user within the lookback) + min_by/max_by
    picks equal the batch run of the same formulation, and agree with
    an independent all-pairs batch oracle on every matched
    conversion."""
    from dust_spark.streaming.windows import (
        attribution_from_pairs,
        attribution_pairs_stream,
    )

    events_s1 = stream_events(spark, SF_DIR)
    events_s2 = stream_events(spark, SF_DIR)
    events_b = load_table(spark, SF_DIR, "events")
    pairs_s = attribution_pairs_stream(events_s1, events_s2)
    q = (
        pairs_s.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_pairs")
        .start()
    )
    try:
        q.processAllAvailable()
        got = (
            attribution_from_pairs(spark.table("attr_pairs"))
            .orderBy("conv_id")
            .collect()
        )
        want = (
            attribution_from_pairs(attribution_pairs_stream(events_b, events_b))
            .orderBy("conv_id")
            .collect()
        )
        assert got == want and len(got) > 0
        # independent all-pairs oracle (fine at test scale): for each
        # purchase, the first/last click of the same user in
        # [conv_ts - 30 days, conv_ts], (t, eid)-tiebroken
        clicks = [
            (r["user_id"], r["ts"], r["event_id"])
            for r in events_b.filter(F.col("event_type") == "click").collect()
        ]
        convs = [
            (r["user_id"], r["ts"], r["event_id"])
            for r in events_b.filter(F.col("event_type") == "purchase").collect()
        ]
        import datetime

        lb = datetime.timedelta(days=30)
        oracle = {}
        for uk, cts, cid in convs:
            hits = sorted(
                (ts, eid)
                for (k2, ts, eid) in clicks
                if k2 == uk and cts - lb <= ts <= cts
            )
            if hits:
                oracle[cid] = (hits[0][1], hits[-1][1])
        got_map = {r["conv_id"]: (r["first_click"], r["last_click"]) for r in got}
        assert got_map == oracle and len(oracle) > 0
    finally:
        q.stop()


def test_ohlc_stream_parity(spark):
    """r10: the streaming OHLC twin (min_by/max_by picks on the
    (ts, event_id) struct) must equal the batch resample_ohlc
    (row_number picks) row-for-row — same candles, both pick
    disciplines resolve equal timestamps by the id tiebreak."""
    from dust_spark.operators import resample_ohlc
    from dust_spark.streaming.windows import ohlc_stream

    events_s = stream_events(spark, SF_DIR)
    events_b = load_table(spark, SF_DIR, "events")
    q = (
        ohlc_stream(events_s)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ohlc_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("ohlc_stream").orderBy("k", "bucket_s").collect()
        want = resample_ohlc(events_b).orderBy("k", "bucket_s").collect()
        assert got == want and len(got) > 0
        # batch-mode evaluation of the streaming formulation agrees too
        got_b = ohlc_stream(events_b).orderBy("k", "bucket_s").collect()
        assert got_b == want
    finally:
        q.stop()
