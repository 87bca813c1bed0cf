"""Property-based differential testing: hypothesis generates random
predicate/aggregation queries over the orders fixture; Spark and DuckDB
must agree exactly. This probes the dialect surface *between* the
hand-written declared queries."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, assume, given, settings

from tests._budget import examples
from hypothesis import strategies as st

from dust_spark.tables import register_views, table_path
from tests.conftest import SF_DIR

NUM_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]
STR_VALS = ["F", "O", "P", "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
CMP = ["<", "<=", ">", ">=", "=", "<>"]


@st.composite
def predicates(draw, depth: int = 2):
    kind = draw(st.integers(0, 3 if depth > 0 else 2))
    if kind == 0:
        col = draw(st.sampled_from(NUM_COLS))
        op = draw(st.sampled_from(CMP))
        val = draw(st.integers(0, 200_000))
        return f"({col} {op} {val})"
    if kind == 1:
        col = draw(st.sampled_from(STR_COLS))
        op = draw(st.sampled_from(["=", "<>"]))
        val = draw(st.sampled_from(STR_VALS))
        return f"({col} {op} '{val}')"
    if kind == 2:
        col = draw(st.sampled_from(NUM_COLS))
        lo = draw(st.integers(0, 100_000))
        hi = lo + draw(st.integers(0, 100_000))
        neg = "NOT " if draw(st.booleans()) else ""
        return f"({neg}{col} BETWEEN {lo} AND {hi})"
    a = draw(predicates(depth=depth - 1))
    b = draw(predicates(depth=depth - 1))
    conj = draw(st.sampled_from(["AND", "OR"]))
    return f"({a} {conj} {b})"


def _connect(tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')")
    return con


class _DuckHolder:
    """DuckDB connection wrapper that survives ORACLE-side crashes:
    duckdb 1.0.0 has optimizer bugs (e.g. duplicated OR branches over a
    degenerate BETWEEN dereference a NULL unique_ptr) that invalidate
    the whole connection. A crashed example is DISCARDED via assume()
    (it says nothing about the engine) and the connection reopens."""

    def __init__(self, tables):
        self.tables = tables
        self.con = _connect(tables)

    def run(self, sql, many):
        try:
            cur = self.con.execute(sql)
            return cur.fetchall() if many else cur.fetchone()
        except duckdb.Error:
            try:
                self.con.close()
            except duckdb.Error:
                pass
            self.con = _connect(self.tables)
            assume(False)


@pytest.fixture(scope="module")
def duck_orders():
    return _DuckHolder(("orders",))


@settings(max_examples=examples(25), deadline=None, suppress_health_check=list(HealthCheck))
@given(pred=predicates())
def test_random_filter_agg_matches_duckdb(spark, duck_orders, pred):
    register_views(spark, SF_DIR)
    sql = (
        f"SELECT count(*) AS n, COALESCE(SUM(o_orderkey), 0) AS sk, "
        f"COALESCE(MIN(o_custkey), -1) AS mn, COALESCE(MAX(o_custkey), -1) AS mx "
        f"FROM orders WHERE {pred}"
    )
    got = spark.sql(sql).collect()[0]
    want = duck_orders.run(sql, many=False)
    assert (got.n, got.sk, got.mn, got.mx) == want, f"predicate: {pred}"


@settings(max_examples=examples(10), deadline=None, suppress_health_check=list(HealthCheck))
@given(pred=predicates(), key=st.sampled_from(STR_COLS))
def test_random_groupby_matches_duckdb(spark, duck_orders, pred, key):
    register_views(spark, SF_DIR)
    sql = f"SELECT {key} AS k, count(*) AS n FROM orders WHERE {pred} GROUP BY {key} ORDER BY k"
    got = [(r.k, r.n) for r in spark.sql(sql).collect()]
    want = duck_orders.run(sql, many=True)
    assert got == want, f"predicate: {pred}"


@settings(max_examples=examples(10), deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pred=predicates(depth=1),
    join_type=st.sampled_from(["JOIN", "LEFT JOIN"]),
)
def test_random_join_matches_duckdb(spark, duck_all, pred, join_type):
    register_views(spark, SF_DIR)
    sql = (
        f"SELECT count(*) AS n, COALESCE(SUM(c_nationkey), 0) AS sk "
        f"FROM orders {join_type} customer ON o_custkey = c_custkey WHERE {pred}"
    )
    got = spark.sql(sql).collect()[0]
    want = duck_all.run(sql, many=False)
    assert (got.n, got.sk) == want, f"{join_type} with {pred}"


@pytest.fixture(scope="module")
def duck_all():
    return _DuckHolder(("orders", "customer"))
