#!/usr/bin/env python
"""Time individual catalog queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) with the same session config + noop-sink discipline as bench.py.

Usage: python tools/bench_one.py c10a_decontaminate c2a_minhash_lsh_pairs
       python tools/bench_one.py --repeat 2 c9d_pack_sequences
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeat = 1
    for a in sys.argv[1:]:
        if a.startswith("--repeat"):
            repeat = int(a.split("=")[1]) if "=" in a else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dust_spark_bench_one")
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

    from dust_spark.queries import all_queries
    from dust_spark.tables import register_views

    register_views(spark, sf_dir)
    qs = all_queries()
    qs["b3i_star_join"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(0, int(cpus) * 2, 1, int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    import bench as B

    # INTERLEAVED repeats (round-robin over the query list) — per-query
    # timings at sf0.1 bounce 2-3x run-to-run (box noise, JIT, cache
    # order); interleaving spreads that noise evenly across queries so
    # a real regression shows up in EVERY round, not one hot run
    times: dict[str, list[float]] = {n: [] for n in args}
    for i in range(repeat):
        for name in args:
            use_codegen = not B.interpret_small_input(qs[name], sf_dir)
            spark.conf.set("spark.sql.codegen.wholeStage", str(use_codegen).lower())
            t0 = time.perf_counter()
            qs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"round{i + 1} {name}: {dt:.2f}s", flush=True)
    import statistics

    for name in args:
        v = times[name]
        print(
            f"{name}: median {statistics.median(v):.2f}s "
            f"min {min(v):.2f}s max {max(v):.2f}s over {len(v)} interleaved runs",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
