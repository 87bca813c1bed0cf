"""The local correctness gate: every declared query with an oracle runs
on Spark AND DuckDB at sf0.001; results must match exactly (row count,
column names, dtype families, sorted values) — the same discipline as
the driver's hash compare at sf0.01, but strict enough to localize a
mismatch to a column."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from dust_spark.queries import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()
ORACLED = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if not q.oracle)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name sort + row sort + dtype normalization, mirroring the
    driver's order-insensitive compare."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s) or s.dtype == object and s.map(lambda x: isinstance(x, int) or x is None).all() and not s.isna().all():
            s = s.astype("Int64") if not pd.api.types.is_float_dtype(s) else s
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        out[c] = s
    ndf = pd.DataFrame(out)
    if len(ndf):
        ndf = ndf.sort_values(by=list(ndf.columns), kind="mergesort", na_position="first").reset_index(drop=True)
    return ndf


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert list(sorted(spark_pdf.columns)) == list(sorted(duck_pdf.columns)), (
        f"{name}: column names differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), f"{name}: row counts differ: {len(spark_pdf)} vs {len(duck_pdf)}"
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        sa, sb = a[c], b[c]
        if pd.api.types.is_float_dtype(sa) or pd.api.types.is_float_dtype(sb):
            va, vb = sa.astype(float).to_numpy(), sb.astype(float).to_numpy()
            both_nan = np.isnan(va) & np.isnan(vb)
            exact = (va == vb) | both_nan
            if not exact.all():
                close = np.isclose(va, vb, rtol=0, atol=1e-9) | both_nan
                bad = np.where(~exact)[0][:5]
                detail = [(int(i), float(va[i]), float(vb[i])) for i in bad]
                assert close.all(), f"{name}.{c}: float mismatch beyond 1e-9 at {detail}"
                pytest.fail(f"{name}.{c}: values equal only approximately (hash would differ): {detail}")
        else:
            eq = (sa == sb) | (sa.isna() & sb.isna())
            if not eq.all():
                bad = np.where(~eq.to_numpy())[0][:5]
                detail = [(int(i), sa.iloc[i], sb.iloc[i]) for i in bad]
                raise AssertionError(f"{name}.{c}: value mismatch at {detail}")


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(spark, duck, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    duck_pdf = duck.execute(q.oracle).df()
    _compare(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    """No oracle → at least: runs, stable schema, deterministic output
    across two executions."""
    q = QUERIES[name]
    df1 = q.fn(spark, SF_DIR)
    p1 = df1.toPandas()
    p2 = q.fn(spark, SF_DIR).toPandas()
    assert list(p1.columns) == list(p2.columns)
    assert len(p1) == len(p2)
