#!/usr/bin/env python
"""Scaling smoke: run the headline corpus operators at 1x / 4x / 16x the
sf0.1 documents corpus and report wall-clock growth.

The scaled corpora are derived from the driver fixture (never replaces
it — correctness still runs on the pristine tables): replica r applies a
per-replica character rotation to the text (`translate`), so replicas
share NO shingles with each other and the near-dup structure within each
replica is preserved exactly. A replicated corpus with identical text
would instead manufacture O(K^2) cross-replica duplicate pairs — a
pathological workload no real pipeline has.

An operator with the right 100 TB shape should scale ~linearly in rows
here (constant overheads shrink, never grow). Output: one JSON line per
(operator, scale) plus a summary table for SCALE.md.

Usage: python tools/scale_smoke.py [--scales=1,4,16] [--ops=a,b,...]
       (--ops filters to a subset — used for the 256x near-linear-grower
       follow-up, where only decontaminate/span_dup_fraction matter)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHA = "abcdefghijklmnopqrstuvwxyz"


# multipliers coprime to 26 — the affine ciphers x -> a*x + b mod 26
# give 12*26 = 312 DISTINCT alphabet permutations, so the no-shared-
# shingles guarantee holds through 312 replicas. (The original plain
# rotation repeated every 26 replicas: beyond that, same-rotation
# replicas were exact text duplicates, which manufactured skewed
# gram-hash keys — 64x was measurably PATHOLOGICAL (consistently slower
# than 256x!) because the medium-skew partitions sat under AQE's
# skew-split threshold and ran as serial stragglers.)
_COPRIME = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]


def scaled_docs(spark, sf_dir: str, k: int):
    from pyspark.sql import functions as F

    from dust_spark.tables import load_table

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = base.count()
    reps = []
    for r in range(k):
        a, b = _COPRIME[(r // 26) % 12], r % 26
        rot = "".join(ALPHA[(a * x + b) % 26] for x in range(26))
        reps.append(
            base.select(
                (F.col("doc_id") + F.lit(r * n)).alias("doc_id"),
                F.translate(F.col("text"), ALPHA, rot).alias("text"),
            )
        )
    out = reps[0]
    for rep in reps[1:]:
        out = out.unionAll(rep)
    return out.repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))


def scaled_emb(spark, sf_dir: str, k: int, dim: int = 64):
    """Scaled embeddings: replica r applies a deterministic per-replica
    SIGN-FLIP pattern to each dimension. Within a replica every pairwise
    cosine is preserved exactly (both vectors flip the same dims), so
    the near-dup/ANN structure replicates; across replicas the patterns
    differ, so no manufactured cross-replica near-dups — the embedding
    analogue of the alphabet-rotation trick for documents."""
    from pyspark.sql import functions as F

    from dust_spark.tables import load_table

    base = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = base.count()
    reps = []
    for r in range(k):
        signs = F.array(
            *[
                F.lit(1.0 if ((r * dim + t) * 2654435761) % 2 == 0 else -1.0)
                for t in range(dim)
            ]
        )
        reps.append(
            base.select(
                (F.col("vec_id") + F.lit(r * n)).alias("vec_id"),
                F.zip_with("embedding", signs, lambda x, s: x * s).alias("embedding"),
            )
        )
    out = reps[0]
    for rep in reps[1:]:
        out = out.unionAll(rep)
    return out.repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))


def scaled_events(spark, sf_dir: str, k: int):
    """Replicate events with per-replica user_id/event_id shifts: the
    per-user interval density stays constant, so an interval join with
    the right shape grows ~linearly in rows (cross-replica users never
    join)."""
    from pyspark.sql import functions as F

    from dust_spark.tables import load_table

    base = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    n = base.count()
    reps = [
        base.select(
            (F.col("event_id") + F.lit(r * n)).alias("event_id"),
            (F.col("user_id") + F.lit(r * 10_000_000)).alias("user_id"),
            "event_type",
            "ts",
            "value",
        )
        for r in range(k)
    ]
    out = reps[0]
    for rdf in reps[1:]:
        out = out.unionByName(rdf)
    return out


def interval_join_case(ops, F, evs):
    """The c6d shape: error windows x click windows per user via the
    bucketed-explode equi-join (operators/asof.py:interval_join)."""
    err = evs.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("l_id"),
        "user_id",
        F.unix_micros("ts").alias("ls"),
        (F.unix_micros("ts") + (F.col("event_id") % 7 + 1) * 3600000000).alias("le"),
    )
    clk = evs.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("r_id"),
        F.col("user_id").alias("r_user"),
        F.unix_micros("ts").alias("rs"),
        (F.unix_micros("ts") + (F.col("event_id") % 5 + 1) * 7200000000).alias("re"),
    )
    return ops.interval_join(
        err, clk, "user_id", "r_user", "ls", "le", "rs", "re",
        bucket_width=4 * 3600 * 1_000_000,
    )


def prep_pipeline_case(ops, F, docs):
    """The c9k shape: clean → quality → exact-dedup → decontaminate →
    chunk as one lazy DAG (no final global sort — the smoke measures the
    pipeline's scale shape, one shuffle per stage that needs one)."""
    cleaned = ops.clean_text(docs).select("doc_id", "clean")
    q = ops.quality_filter(cleaned, text_col="clean")
    kept = cleaned.join(q.filter(F.col("keep") == 1).select("doc_id"), "doc_id")
    deduped = ops.exact_dedup(kept, text_col="clean")
    bench = cleaned.filter(F.col("doc_id") % 50 == 0)
    final = ops.decontaminate(
        deduped, bench, text_col="clean", benchmark_text_col="clean"
    )
    chunks = ops.chunk_documents(final, chunk_tokens=128, stride=96, text_col="clean")
    return chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"), F.sum("n_chunk_tokens").alias("total_tokens")
    )


def contamination_report_case(ops, F, docs):
    """The c9m shape: containment scoring + per-source rollup (source
    synthesized as doc_id % 20 — the real column doesn't survive the
    replica transform)."""
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    scored = ops.containment_scores(docs.filter(F.col("doc_id") % 50 != 0), bench)
    flagged = scored.select(
        "doc_id", (F.col("matched") > 0).cast("long").alias("contaminated")
    )
    src = docs.select("doc_id", (F.col("doc_id") % 20).alias("source"))
    return (
        flagged.join(src, "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("contaminated").alias("n_contaminated"))
    )


def modality_budget_case(ops, F, docs):
    """The c5d shape: bytes group on the content hash, two hash-aggs."""
    m = docs.select(
        (F.col("doc_id") % 20).alias("source"),
        (F.col("doc_id") % 3).alias("media_type"),
        F.length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
        F.sha2(F.col("text").cast("binary"), 256).alias("h"),
    )
    per_hash = m.groupBy("media_type", "source", "h").agg(
        F.min("n_bytes").alias("hb"), F.count("*").alias("dup_n")
    )
    return per_hash.groupBy("media_type", "source").agg(
        F.sum("dup_n").alias("n_items"),
        F.sum(F.col("hb") * F.col("dup_n")).alias("total_bytes"),
        F.count("*").alias("distinct_content"),
    )


def corpus_card_case(ops, F, docs):
    """The c9l shape: token_count + quality_filter + distinct-count,
    every aggregate keyed on the synthesized source."""
    toks = ops.token_count(docs)
    qual = ops.quality_filter(docs).select("doc_id", "keep")
    base = toks.join(qual, "doc_id").select(
        (F.col("doc_id") % 20).alias("source"), "text", "n_tokens", "keep"
    )
    return base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("keep").alias("n_keep"),
        (F.count("*") - F.countDistinct("text")).alias("n_dup_rows"),
    )


def fertility_case(ops, F, docs):
    """The c4r shape: one hash-agg of byte/ws-token/bpe-token sums."""
    d = ops.bpe_ish_token_count(ops.token_count(docs))
    return d.groupBy((F.col("doc_id") % 20).alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.octet_length("text")).alias("n_bytes"),
        F.sum("n_tokens").alias("n_ws"),
        F.sum("n_bpe_tokens").alias("n_bpe"),
    )


def heavy_hitters_case(F, evs):
    """The c8e shape: hash agg + broadcast scalar total + TakeOrdered."""
    counts = evs.groupBy(F.col("user_id").alias("kk")).agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select("kk", "n", (F.col("n").cast("double") / F.col("__total")).alias("share"))
        .orderBy(F.col("n").desc(), "kk")
        .limit(20)
    )




def split_leakage_case(ops, F, docs):
    # r12 c9s shape: split labels + 8-gram hashes; train grams
    # semi-join the held-out gram stream — one explode + one
    # 8-byte-key shuffle, text never rides a shuffle
    from dust_spark.functions import tokens, word_shingles

    lab = ops.train_val_test_split(docs, hash_fn="xxhash64")
    grams = (
        lab.select("doc_id", "split", tokens("text").alias("__tok"))
        .select("doc_id", "split", F.explode(word_shingles(F.col("__tok"), 8)).alias("g"))
        .select("doc_id", "split", F.xxhash64("g").alias("gh"))
    )
    tr = grams.filter(F.col("split") == "train").select("gh").distinct()
    leaked = (
        grams.filter(F.col("split") != "train")
        .join(tr, "gh", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__l", F.lit(1))
    )
    return (
        lab.filter(F.col("split") != "train")
        .join(leaked, "doc_id", "left")
        .groupBy("split")
        .agg(F.count("*").alias("n"), F.sum(F.coalesce(F.col("__l"), F.lit(0))).alias("k"))
    )


def oov_case(ops, F, docs):
    # r12 c4v shape: vocab agg (map-side combine) + TakeOrdered 500 +
    # broadcast back over the token stream
    from dust_spark.functions import tokens

    tok = (
        docs.select((F.col("doc_id") % 20).alias("source"), tokens("text").alias("t"))
        .select("source", F.explode("t").alias("w"))
    )
    vocab = (
        tok.groupBy("w").count().orderBy(F.col("count").desc(), "w").limit(500)
        .select("w", F.lit(1).alias("iv"))
    )
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("iv").isNull(), 1).otherwise(0)).alias("oov"),
        )
    )


def split_kl_case(ops, F, docs):
    # r12 c9t shape: split labels + two token hash-aggs over a 200-word
    # broadcast vocab grid; the KL fold itself is a 3-row tail
    from dust_spark.functions import tokens

    lab = ops.train_val_test_split(docs, hash_fn="xxhash64")
    tok = lab.select("split", tokens("text").alias("t")).select(
        "split", F.explode("t").alias("w")
    )
    vocab = (
        tok.groupBy("w").count().orderBy(F.col("count").desc(), "w").limit(200)
        .select("w")
    )
    cnts = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("split", "w")
        .agg(F.count("*").alias("c"))
    )
    tr = cnts.filter(F.col("split") == "train").select("w", F.col("c").alias("ct"))
    return (
        cnts.filter(F.col("split") != "train")
        .join(tr, "w")
        .groupBy("split")
        .agg(
            F.sum(
                (F.col("c") + 1)
                * (F.log(F.col("c") + 1) - F.log(F.col("ct") + 1))
            ).alias("s")
        )
    )


def attribution_case(F, evs):
    # r12 c6h shape: clicks + conversions ride ONE hash exchange on the
    # user key, two unbounded-preceding windows pick first/last touch
    from pyspark.sql import Window as W

    clicks = evs.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("k"), F.unix_micros("ts").alias("t"),
        F.col("event_id").alias("eid"), F.lit(0).alias("tag"),
    )
    convs = evs.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"), F.unix_micros("ts").alias("t"),
        F.col("event_id").alias("eid"), F.lit(1).alias("tag"),
    )
    un = clicks.unionByName(convs)
    w = (
        W.partitionBy("k").orderBy("t", "tag", "eid")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    last_click = F.last(
        F.when(F.col("tag") == 0, F.col("eid")), ignorenulls=True
    ).over(w)
    first_struct = F.min(F.when(F.col("tag") == 0, F.struct("t", "eid"))).over(w)
    return (
        un.withColumn("lc", last_click)
        .withColumn("fc", first_struct["eid"])
        .filter(F.col("tag") == 1)
    )


def zipf_case(F, docs):
    # r13 c4w shape: (source, word) hash-agg with map-side combine, a
    # bounded per-source top-100 window over the COUNT table, int64 OLS
    from dust_spark.functions import tokens
    from pyspark.sql import Window as W

    cnt = (
        docs.select((F.col("doc_id") % 20).alias("source"), tokens("text").alias("t"))
        .select("source", F.explode("t").alias("w"))
        .groupBy("source", "w")
        .count()
        .withColumnRenamed("count", "c")
    )
    w = W.partitionBy("source").orderBy(F.col("c").desc(), "w")
    pts = (
        cnt.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 100)
        .select(
            "source",
            F.round(F.log("r") * 1e6, 0).cast("long").alias("x"),
            F.round(F.log("c") * 1e6, 0).cast("long").alias("y"),
        )
    )
    return pts.groupBy("source").agg(
        F.count("*").alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )


def chunk_dup_case(F, docs):
    # r13 c5e shape: 64-char chunk md5 postings (distinct per doc) +
    # hash self-join — only 16-byte hashes shuffle, never payloads;
    # frequent-chunk prune (df <= 32) kills the quadratic dup-family
    # pair growth the uncapped 256× smoke measured (~8× per 4×)
    from pyspark.sql import Window as W

    d = docs.select("doc_id", F.trim(F.col("text")).alias("t")).filter(
        F.length("t") >= 128
    )
    ch = (
        d.select(
            "doc_id", "t",
            F.explode(F.sequence(F.lit(1), (F.length("t") / 64).cast("long"))).alias("g"),
        )
        .select(
            "doc_id",
            F.md5(F.encode(F.expr("substring(t, (g-1)*64 + 1, 64)"), "UTF-8")).alias("h"),
        )
        .distinct()
        .withColumn("df", F.count("*").over(W.partitionBy("h")))
        .filter(F.col("df") <= 32)
        .drop("df")
    )
    a, b = ch.alias("a"), ch.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("ia"), F.col("b.doc_id").alias("ib"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 2)
    )


def char_entropy_case(F, docs):
    # r13 c4x shape: one char explode with map-side combine; per-doc
    # histograms are alphabet-sized
    d = docs.select("doc_id", F.trim(F.col("text")).alias("t")).filter(
        F.length("t") > 0
    )
    cnt = (
        d.select("doc_id", "t", F.explode(F.sequence(F.lit(1), F.length("t"))).alias("g"))
        .select("doc_id", F.expr("substring(t, g, 1)").alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    return cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))


def sign_ann_case(F, emb):
    # r13 c3o shape: 16-byte sign codes shuffle; FIXED query set vs a
    # growing corpus (flat Hamming scan is O(n·q) by design, the mips
    # convention) — the linear-in-n term is what to verify
    from pyspark.sql import Window as W

    e = emb.select("vec_id", F.col("embedding").alias("__e"))

    def word(off):
        return F.expr(
            "aggregate(transform(sequence(0, 31), t -> "
            f"IF(element_at(__e, t + {off + 1}) > CAST(0 AS FLOAT), "
            "shiftleft(CAST(1 AS BIGINT), t), CAST(0 AS BIGINT))), "
            "CAST(0 AS BIGINT), (s, x) -> s + x)"
        )

    codes = e.select("vec_id", word(0).alias("lo"), word(32).alias("hi"))
    q = codes.filter(F.col("vec_id") < 5000).filter(
        F.col("vec_id") % 100 == 0
    ).select(
        F.col("vec_id").alias("qid"), F.col("lo").alias("qlo"), F.col("hi").alias("qhi")
    )
    ham = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", F.col("vec_id").alias("nid"),
            (F.bit_count(F.col("qlo").bitwiseXOR(F.col("lo")))
             + F.bit_count(F.col("qhi").bitwiseXOR(F.col("hi")))).alias("hd"),
        )
    )
    wh = W.partitionBy("qid").orderBy("hd", "nid")
    return ham.withColumn("rn", F.row_number().over(wh)).filter(F.col("rn") <= 50)


def global_rank_case(F, evs):
    # r12 b5a/b5e shape: range partition + per-slice row_number +
    # broadcast prefix offsets — the no-single-task global rank
    from dust_spark.operators.skew import global_row_number

    out, _ = global_row_number(
        evs.select("event_id", "value"), [F.col("value").desc(), F.col("event_id")]
    )
    return out


def main() -> None:
    scales = [1, 4, 16]
    only_ops: list[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--ops"):
            only_ops = a.split("=", 1)[1].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dust_spark_scale_smoke")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dust_spark import operators as ops

    def stage_totals():
        """(shuffle write records, executor run time ms) summed over all
        completed stages — the load-insensitive scale metrics (SCALE.md:
        wall-clock at ≥64× working sets is GC/page-cache noise; shuffle
        ROWS and task CPU time are properties of the plan+data). The
        AppStatusStore ingests listener events asynchronously, so drain
        the bus first."""
        sc = spark.sparkContext
        try:
            sc._jsc.sc().listenerBus().waitUntilEmpty()
        except Exception:
            time.sleep(1.0)
        store = sc._jsc.sc().statusStore()
        gw = sc._gateway
        stages = store.stageList(
            gw.jvm.java.util.ArrayList(), False, False,
            gw.new_array(gw.jvm.double, 0), gw.jvm.java.util.ArrayList(),
        )
        recs = ms = 0
        for i in range(stages.size()):
            s = stages.apply(i)
            recs += s.shuffleWriteRecords()
            ms += s.executorRunTime()
        return recs, ms

    def run(name, fn):
        r0, m0 = stage_totals()
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        r1, m1 = stage_totals()
        print(
            json.dumps(
                {
                    "op": name,
                    "scale": k,
                    "rows": rows,
                    "sec": round(dt, 2),
                    "shuffle_rows": r1 - r0,
                    "cpu_ms": m1 - m0,
                }
            ),
            flush=True,
        )
        return (dt, r1 - r0, m1 - m0)

    # warm JVM + python workers once
    spark.range(0, int(cpus) * 2, 1, int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[int, float]] = {}
    for k in scales:
        docs = scaled_docs(spark, sf_dir, k).persist()
        emb = scaled_emb(spark, sf_dir, k).persist()
        evs = scaled_events(spark, sf_dir, k).persist()
        evs.count()
        emb.count()
        rows = docs.count()
        bench = docs.filter(F.col("doc_id") % 50 == 0)
        for name, fn in [
            ("exact_dedup_count", lambda: ops.exact_dedup_count(docs)),
            ("minhash_estimate", lambda: ops.minhash_lsh_pairs(docs, threshold=0.2, verify="estimate")),
            ("simhash_table", lambda: ops.simhash_table(docs)),
            ("decontaminate", lambda: ops.decontaminate(docs, bench, ngram_words=8)),
            ("span_dup_fraction", lambda: ops.span_dup_fraction(docs)),
            ("token_count_agg", lambda: ops.token_count(docs).agg(F.sum("n_tokens"))),
            # ingest gate: CORPUS grows with k, the incoming batch stays
            # fixed-size — the cost should grow with the corpus band
            # table build (one pass) and stay far below pairwise work
            (
                "dedup_against_corpus",
                lambda: ops.dedup_against_corpus(
                    docs.filter(F.col("doc_id") % 97 == 0), docs, mode="flags"
                ),
            ),
            # r5/r6 portable-oracle additions (VERDICT r5 item 7)
            (
                "minhash_portable_pairs",
                lambda: ops.minhash_lsh_pairs_portable(docs, threshold=0.2),
            ),
            (
                "ann_portable",
                lambda: ops.rp_lsh_topk_portable(
                    emb.filter(F.col("vec_id") % 100 == 0), emb, k=10
                ),
            ),
            (
                "embedding_near_dup_portable",
                lambda: ops.embedding_near_dup_portable(emb, threshold=0.3),
            ),
            ("ann_ivf", lambda: ops.ivf_topk(emb.filter(F.col("vec_id") % 100 == 0), emb, k=5, n_lists=8, n_probe=3, iterations=2)),
            # r7: SemDeDup — the cluster count grows WITH the corpus
            # (k ∝ n, SemDeDup practice) so per-cluster occupancy and
            # the quadratic within-cluster verify stay constant-sized
            (
                "semantic_dedup",
                lambda: ops.semantic_dedup_pairs(
                    emb, k=16 * k, iterations=2, threshold=0.3
                ),
            ),
            # r7: interval join — per-user density constant across
            # replicas, so output pairs (and cost) grow ~linearly
            ("interval_join", lambda: interval_join_case(ops, F, evs)),
            # r7: PQ ANN — training + encode are O(iterations) narrow
            # passes; the ADC scan is O(n·q) BY DESIGN (flat PQ), so the
            # query set stays FIXED (base replica only) to measure the
            # linear-in-corpus term; q also growing would show the n·q
            # product, not a flaw
            (
                "pq_ann",
                lambda: ops.pq_topk_portable(
                    emb.filter((F.col("vec_id") < 5000) & (F.col("vec_id") % 100 == 0)),
                    emb,
                    k=10,
                ),
            ),
            # r8: IVF-PQ — same fixed query set and PQ codebooks, but the
            # ADC scan is gated to n_probe of n_lists ∝ √n inverted
            # lists (FAISS practice: holds candidates/query constant),
            # so the per-query term should grow ~√n instead of n
            # r10: the c9k end-to-end prep pipeline (clean → quality →
            # dedup → decontaminate → chunk): benchmark set grows with
            # the corpus like the query does; stages are narrow or
            # one-shuffle, so the chain should grow ~linearly
            ("prep_pipeline", lambda: prep_pipeline_case(ops, F, docs)),
            # r10: the c6f funnel — len(steps) chained aggs all shuffling
            # on the SAME user key (one real exchange); linear in events
            ("event_funnel", lambda: ops.funnel_counts(evs)),
            # r9: containment scoring — reference fixed (every 50th base
            # doc), corpus grows; cost should track the doc gram explode
            # ~linearly
            (
                "containment",
                lambda: ops.containment_scores(
                    docs, docs.filter(F.col("doc_id") % 50 == 0)
                ),
            ),
            # r9: the DISTRIBUTED connected-components path (pointer
            # jumping), forced past the local union-find gate with a
            # synthetic chain graph (chains of 100 nodes → ~7 jump
            # rounds regardless of n — shuffle rows should grow
            # ~linearly in edges with a constant round factor)
            (
                "cc_pointer_jumping",
                lambda: ops.connected_components(
                    spark.range(k * 25_000)
                    .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
                    .filter((F.col("id_a") + 1) % 100 != 0),
                    local_threshold=0,
                ),
            ),
            (
                "ivfpq_ann",
                lambda: ops.ivfpq_topk_portable(
                    emb.filter((F.col("vec_id") < 5000) & (F.col("vec_id") % 100 == 0)),
                    emb,
                    k=10,
                    n_lists=max(4, int(8 * k ** 0.5)),
                    n_probe=2,
                ),
            ),
            # r11 sweep of the r10-new operators (VERDICT r10 task #2):
            # c7e/c7f — one hash exchange on (user, bucket) then
            # windows on a high-cardinality key: should be ~linear
            ("resample_ohlc", lambda: ops.resample_ohlc(evs)),
            ("rolling_zscore", lambda: ops.rolling_zscore(evs)),
            # c4q — first-seen join on 8-byte gram hashes; the map and
            # the score join both ~linear in gram volume
            ("ngram_novelty", lambda: ops.ngram_novelty(docs)),
            # c3n — fixed query set vs a growing corpus, like pq_ann:
            # flat MIPS scoring is O(n·q) by design, so the linear-in-n
            # term is the thing to verify (plus the corpus-max norm agg)
            (
                "mips_topk",
                lambda: ops.mips_topk_portable(
                    emb.filter((F.col("vec_id") < 5000) & (F.col("vec_id") % 100 == 0)),
                    emb,
                    k=10,
                ),
            ),
            ("heavy_hitters", lambda: heavy_hitters_case(F, evs)),
            ("contamination_report", lambda: contamination_report_case(ops, F, docs)),
            ("modality_budget", lambda: modality_budget_case(ops, F, docs)),
            ("corpus_card", lambda: corpus_card_case(ops, F, docs)),
            ("tokenizer_fertility", lambda: fertility_case(ops, F, docs)),
            # r11: DSIR — gram hashing collapses to a persisted
            # per-(doc,bucket) frame; the ratio table broadcasts, so
            # cost should track the gram volume ~linearly
            (
                "dsir_resample",
                lambda: ops.dsir_resample(docs, F.col("doc_id") % 10 == 0, k=100),
            ),
            # r11 second wave: BM25 (tf/df aggs + broadcast query
            # terms), length-bucket batching (distributed rank inside),
            # model quality (hashed-bag dot on a broadcast weight
            # table), diversity keep (k ∝ n like semantic_dedup), and
            # the NULL-partition distributed rank
            ("bm25_topk", lambda: ops.bm25_topk(docs, k=20)),
            ("length_buckets", lambda: ops.length_bucket_batches(docs)),
            ("model_quality", lambda: ops.model_quality_score(docs)),
            # r12 additions: leakage/oov/global-rank/rolling-median
            ("split_leakage", lambda: split_leakage_case(ops, F, docs)),
            ("oov_rate", lambda: oov_case(ops, F, docs)),
            ("rolling_median", lambda: ops.rolling_median(evs)),
            ("global_rank", lambda: global_rank_case(F, evs)),
            # r13: the r12 verdict's 256×-tail asks (c9t/c6h shapes)
            # plus the three r13-new operators
            ("split_kl", lambda: split_kl_case(ops, F, docs)),
            ("attribution", lambda: attribution_case(F, evs)),
            ("window_funnel", lambda: ops.window_funnel(evs)),
            ("zipf_slope", lambda: zipf_case(F, docs)),
            ("payload_chunk_dup", lambda: chunk_dup_case(F, docs)),
            ("char_entropy", lambda: char_entropy_case(F, docs)),
            ("sign_ann", lambda: sign_ann_case(F, emb)),
            # flat assignment pinned (coarse_gate=None): the documented
            # O(n·k) = O(n²) curve the r12 gate exists to fix
            (
                "diversity_keep",
                lambda: ops.diversity_keep(
                    emb, k_clusters=8 * k, iterations=2, coarse_gate=None
                ),
            ),
            # r12 scale gate, k ∝ n: hierarchical assignment through √k
            # coarse lists (per-row cost √k·(1+probes) instead of k →
            # n^1.5 total) + bounded training sample (training ∝ n, not
            # n²). The verdict-#3 fix, measured against the flat curve.
            (
                "diversity_keep_gated",
                lambda: ops.diversity_keep(
                    emb,
                    k_clusters=8 * k,
                    iterations=2,
                    coarse_gate=0,
                    train_sample=4096,
                ),
            ),
            # the cap-k alternative: cluster count FIXED, keep budget
            # scaled instead — strictly linear CPU in n (the ≤linear
            # smoke the verdict asks for)
            (
                "diversity_keep_capk",
                lambda: ops.diversity_keep(
                    emb,
                    k_clusters=64,
                    iterations=2,
                    keep_per_cluster=10 * k,
                    coarse_gate=None,
                    train_sample=4096,
                ),
            ),
            # r11 third wave: bigram LM (two hash joins on 8-byte gram
            # keys) and temperature mixing (count agg + broadcast
            # targets + per-source window)
            ("bigram_logprob", lambda: ops.bigram_logprob(docs)),
            (
                "temperature_mix",
                lambda: ops.temperature_mix(
                    docs.select("doc_id", (F.col("doc_id") % 20).alias("source")),
                    budget_permille=200,
                ),
            ),
            (
                "rank_null_partition",
                lambda: ops.distributed_rank(
                    evs.select(
                        "event_id",
                        "value",
                        F.when(F.col("user_id") % 3 == 0, None)
                        .otherwise(F.col("user_id") % 3)
                        .alias("st"),
                    ),
                    "st",
                    "value",
                ),
            ),
        ]:
            if only_ops is not None and name not in only_ops:
                continue
            results.setdefault(name, {})[k] = run(name, fn)
        docs.unpersist()
        emb.unpersist()
        evs.unpersist()

    print(
        "\n| operator | "
        + " | ".join(f"{k}x ({k*5000} rows)" for k in scales)
        + " | growth vs rows (time / shuffle rows / cpu) |"
    )
    print("|---|" + "---|" * (len(scales) + 1))
    rows_ratio = scales[-1] / scales[0]
    for name, per in results.items():
        lo, hi = per[scales[0]], per[scales[-1]]
        tr = hi[0] / lo[0] if lo[0] else float("nan")
        sr = hi[1] / lo[1] if lo[1] else float("nan")
        cr = hi[2] / lo[2] if lo[2] else float("nan")
        print(
            f"| {name} | "
            + " | ".join(
                f"{per[k][0]:.2f}s / {per[k][1]:,}sr / {per[k][2]/1000:.1f}cpu-s"
                for k in scales
            )
            + f" | {tr:.1f}x / {sr:.1f}x / {cr:.1f}x for {rows_ratio:.0f}x rows |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
