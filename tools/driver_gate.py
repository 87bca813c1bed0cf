"""Replicate the grading driver's correctness gate locally.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares
against ``oracle_sql()`` in DuckDB with the driver's semantics:
sorted-by-name columns, order-insensitive rows, exact values (hash
proxy: pandas equality after canonical sort). Queries without an
oracle get a rows-only check (must run, rows >= 0).

Usage:  python tools/driver_gate.py [name ...]
        (no args = all queries; args = only those names)
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd

import os

SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Canonical cell form mirroring a value-hash: stringified, floats
    # repr'd after float64 coercion so 1.0 == 1.00.
    def cell(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "<null>"
        if isinstance(v, (np.floating, float)):
            return repr(float(np.float64(v)))
        if isinstance(v, (np.integer, int)):
            return str(int(v))
        if isinstance(v, (list, np.ndarray)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def main(only: list[str]) -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    qs, orc = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    names = [n for n in qs if not only or n in only]
    results, fails = {}, 0
    for name in names:
        t0 = time.time()
        try:
            spdf = qs[name](spark, SF_DIR).toPandas()
            if name in orc:
                dpdf = con.execute(orc[name]).df()
                a, b = canon(spdf), canon(dpdf)
                ok = (
                    list(a.columns) == list(b.columns)
                    and len(a) == len(b)
                    and a.equals(b)
                )
                results[name] = {
                    "ok": bool(ok),
                    "rows": len(spdf),
                    "oracle_rows": len(dpdf),
                    "sec": round(time.time() - t0, 2),
                }
                if not ok:
                    fails += 1
                    if list(a.columns) != list(b.columns):
                        results[name]["why"] = f"cols {list(a.columns)} vs {list(b.columns)}"
                    elif len(a) != len(b):
                        results[name]["why"] = f"rows {len(a)} vs {len(b)}"
                    else:
                        diff = (a != b).any(axis=1)
                        i = int(np.argmax(diff.values))
                        results[name]["why"] = (
                            f"first diff row {i}: {a.iloc[i].to_dict()} vs {b.iloc[i].to_dict()}"
                        )
            else:
                results[name] = {
                    "ok": True,
                    "rows": len(spdf),
                    "rows_only": True,
                    "sec": round(time.time() - t0, 2),
                }
        except Exception as e:  # noqa: BLE001
            fails += 1
            results[name] = {"ok": False, "err": f"{type(e).__name__}: {e}"[:300]}
        status = "ok " if results[name]["ok"] else "FAIL"
        print(f"{status} {name} {json.dumps(results[name])}", flush=True)

    total = sum(r.get("sec", 0) for r in results.values())
    print(json.dumps({"n": len(results), "fails": fails, "total_sec": round(total, 1)}))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
