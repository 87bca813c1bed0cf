#!/usr/bin/env python
"""Per-stage profile of one (or more) catalog queries: run with the
bench session config + noop sink, then dump every completed stage's
task count, wall, executor run/CPU time and shuffle volumes. The
load-insensitive columns (CPU ms, shuffle records) are the trustworthy
ones on a busy box.

Usage: python tools/profile_one.py c7f_rolling_zscore [more ...]
       PROFILE_REPEAT=2 python tools/profile_one.py c7f_rolling_zscore
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeat = int(os.environ.get("PROFILE_REPEAT", "1"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dust_spark_profile_one")
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

    sc = spark.sparkContext
    gw = sc._gateway

    def stages():
        try:
            sc._jsc.sc().listenerBus().waitUntilEmpty()
        except Exception:
            time.sleep(1.0)
        store = sc._jsc.sc().statusStore()
        lst = store.stageList(
            gw.jvm.java.util.ArrayList(), False, False,
            gw.new_array(gw.jvm.double, 0), gw.jvm.java.util.ArrayList(),
        )
        out = {}
        for i in range(lst.size()):
            s = lst.apply(i)
            out[(s.stageId(), s.attemptId())] = s
        return out

    for name in names:
        for r in range(repeat):
            use_codegen = not B.interpret_small_input(qs[name], sf_dir)
            spark.conf.set("spark.sql.codegen.wholeStage", str(use_codegen).lower())
            before = stages()
            t0 = time.perf_counter()
            tb = time.perf_counter()
            df = qs[name].fn(spark, sf_dir)
            build_s = time.perf_counter() - tb
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            after = stages()
            new = [s for k, s in after.items() if k not in before]
            new.sort(key=lambda s: -s.executorRunTime())
            print(f"\n=== {name} run{r + 1}: wall {dt:.2f}s (build {build_s:.2f}s), "
                  f"{len(new)} stages ===", flush=True)
            tot_run = sum(s.executorRunTime() for s in new)
            tot_cpu = sum(s.executorCpuTime() for s in new) / 1e6
            print(f"    total executorRun {tot_run} ms, cpu {tot_cpu:.0f} ms")
            for s in new[:14]:
                try:
                    nm = s.name().splitlines()[0][:70]
                except Exception:
                    nm = "?"
                print(
                    f"  stage {s.stageId()}: run {s.executorRunTime()} ms "
                    f"cpu {s.executorCpuTime() / 1e6:.0f} ms "
                    f"tasks {s.numCompleteTasks()} "
                    f"shw {s.shuffleWriteRecords()} shr {s.shuffleReadRecords()} "
                    f"| {nm}"
                )
    spark.stop()


if __name__ == "__main__":
    main()
