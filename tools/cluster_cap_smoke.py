#!/usr/bin/env python
"""Bucket-cap scale smoke on a CLUSTERED embedding corpus (r9, verdict
task #1 'done' evidence).

The driver fixture's embeddings are uniform — LSH buckets stay small and
the B² candidate join never shows its failure mode. Real embedding
corpora are CLUSTERED (near-duplicate web text, templated docs), which
concentrates whole clusters into shared sign-buckets: candidate volume
grows ~n²/K while rows grow n. This smoke builds a mixture-of-Gaussians
corpus (K tight clusters), then reports, at each scale:

  - uncapped candidate volume  = Σ_buckets C(B, 2) over the EXACT
    (t, bucket) index the operator uses (portable_bucket_index) —
    computed from the bucket histogram, so the quadratic join itself
    never has to run;
  - capped candidate volume    = the same sum over buckets with
    B <= max_bucket (what embedding_near_dup_portable now generates);
  - a real end-to-end capped run (wall / shuffle rows / cpu) of
    embedding_near_dup_portable(max_bucket=...).

Expected shape: uncapped grows ~(scale)² (quadratic — the r8 'weak'
finding), capped stays bounded by n·max_bucket (hot buckets drop out
entirely, the documented MinHash-family trade, dedup.py:223).

Usage: python tools/cluster_cap_smoke.py [--scales=1,2,4] [--cap=2000]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
K_CLUSTERS = 20
BASE_N = 20_000
SIGMA = 0.08  # tight clusters: intra-cluster cosine ~0.97+


def clustered_embeddings(spark, n: int, seed: int = 7):
    """Mixture of K_CLUSTERS unit-norm Gaussians, deterministic."""
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((K_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, K_CLUSTERS, size=n)
    vecs = centers[assign] + SIGMA * rng.standard_normal((n, DIM))
    import pandas as pd

    pdf = pd.DataFrame(
        {"id": np.arange(n, dtype=np.int64), "v": list(vecs.astype(np.float64))}
    )
    return spark.createDataFrame(pdf)


def main() -> None:
    scales = [1, 2, 4]
    cap = 2_000
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--cap"):
            cap = int(a.split("=", 1)[1])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dust_spark_cluster_cap_smoke")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dust_spark import operators as ops

    rows = []
    for k in scales:
        n = BASE_N * k
        emb = clustered_embeddings(spark, n).repartition(int(cpus)).persist()
        emb.count()
        # candidate-volume accounting from the operator's OWN index
        hist = (
            ops.portable_bucket_index(emb, DIM, n_tables=4, bits_per_table=10)
            .groupBy("t", "bucket")
            .count()
            .persist()
        )
        agg = hist.agg(
            F.sum(F.expr("count * (count - 1) / 2")).alias("uncapped"),
            F.sum(
                F.when(F.col("count") <= cap, F.expr("count * (count - 1) / 2"))
            ).alias("capped"),
            F.max("count").alias("max_bucket_pop"),
        ).first()
        # real end-to-end capped run
        t0 = time.perf_counter()
        ops.embedding_near_dup_portable(
            emb, threshold=0.9, id_col="id", vec_col="v", max_bucket=cap
        ).write.format("noop").mode("overwrite").save()
        capped_sec = round(time.perf_counter() - t0, 2)
        rec = {
            "scale": k,
            "rows": n,
            "cap": cap,
            "uncapped_candidates": int(agg["uncapped"]),
            "capped_candidates": int(agg["capped"] or 0),
            "max_bucket_pop": int(agg["max_bucket_pop"]),
            "capped_run_sec": capped_sec,
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)
        hist.unpersist()
        emb.unpersist()

    lo, hi = rows[0], rows[-1]
    print(
        f"\nrows x{hi['rows'] / lo['rows']:.0f}: uncapped candidates "
        f"x{hi['uncapped_candidates'] / max(1, lo['uncapped_candidates']):.1f} "
        f"(quadratic), capped x"
        f"{hi['capped_candidates'] / max(1, lo['capped_candidates']):.1f} (bounded)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
