"""Engine tests for SQL-surface features excluded from the DQ oracle set
(SURVEY.md §2 rows marked 'engine test'): blob round-trips, string_agg
ordering, approx distinct, RANGE BETWEEN frames, pivot, SQLite dialect
functions, recursive CTE through the engine session."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dust_spark import DustSession
from dust_spark.model import rows_to_json
from dust_spark.tables import load_table, register_views
from tests.conftest import SF_DIR


@pytest.fixture()
def db(spark):
    s = DustSession(spark)
    yield s
    s.close()


def test_static_compound_selects_sqlite_differential(db):
    """r11 (verdict task #5): all-literal compound SELECTs evaluate
    statically with SQLite's per-row dynamic typing — closing the one
    row-count-level dialect divergence (SELECT 1 UNION SELECT '1' is
    TWO rows: integer 1 and text '1' have different storage classes).
    Values, ordering (NULL < numeric < text < blob), dedup
    representative (last wins; INTERSECT keeps the left side's),
    ORDER BY ordinal/alias, LIMIT/OFFSET, and the exact error strings
    all match an in-memory sqlite3."""
    import sqlite3

    from dust_spark.session import DustError

    ref = sqlite3.connect(":memory:")
    cases = [
        "SELECT 1 UNION SELECT '1'",
        "SELECT '1' UNION SELECT 1",
        "SELECT 1 UNION SELECT 1.0",
        "SELECT 1.0 UNION SELECT 1",
        "SELECT 1 UNION ALL SELECT '1'",
        "SELECT 1 UNION ALL SELECT 1.0 UNION SELECT 2",
        "SELECT 'a' UNION SELECT 1 UNION SELECT NULL UNION SELECT X'00'",
        "SELECT 1, 'x' UNION SELECT '1', 'x'",
        "SELECT 1 AS a UNION SELECT '1'",
        "SELECT 1 EXCEPT SELECT '1'",
        "SELECT 1 INTERSECT SELECT '1'",
        "SELECT 1 UNION SELECT '1' ORDER BY 1 DESC",
        "SELECT 1.5 UNION SELECT 'abc' UNION SELECT -2",
        "SELECT NULL UNION SELECT NULL",
        "SELECT 'A' UNION SELECT 'a'",
        "SELECT 9223372036854775807 UNION SELECT 9223372036854775807.0",
        "SELECT 2 UNION SELECT 1 UNION ALL SELECT 0",
        "SELECT 1 UNION ALL SELECT 1.0 INTERSECT SELECT 1",
        "SELECT 1.0 UNION ALL SELECT 1 INTERSECT SELECT 1",
        "SELECT 5 INTERSECT SELECT 5 UNION ALL SELECT 7",
        "SELECT 1 UNION SELECT '1' LIMIT 10 OFFSET 5",
        "SELECT -0x10 UNION SELECT 1",
        "SELECT 1e2 UNION SELECT 100",
        "SELECT '' UNION SELECT X'' UNION SELECT 0",
        "SELECT 1 AS a UNION SELECT '1' ORDER BY a DESC",
        "SELECT 1 UNION SELECT 2 UNION SELECT 3 LIMIT 2 OFFSET 1",
        "SELECT 1 UNION SELECT 2 LIMIT 1, 1",
        "SELECT true UNION SELECT 1",
        "SELECT 1 AS x, 2 AS y UNION SELECT '1', 2 ORDER BY y, x",
        "SELECT 1 UNION SELECT '1' LIMIT -1",
        "SELECT 'b' UNION SELECT 'B' UNION ALL SELECT 'a' ORDER BY 1 DESC LIMIT 2",
        # r11 machine find: ORDER BY compounds take SQLite's MERGE plan
        # with DIFFERENT representatives than the b-tree plan (first-of-
        # equal-run in a drained stream survives; B's copy survives an
        # A==B skip; INTERSECT emits A's copy) — all probed
        "SELECT 1e2 UNION ALL SELECT 100 UNION SELECT 1 UNION SELECT 1 ORDER BY 1",
        "SELECT 1e2 UNION ALL SELECT 100 UNION SELECT 1 ORDER BY 1",
        "SELECT 1e2 UNION ALL SELECT 100 UNION SELECT 1 ORDER BY 1 DESC",
        "SELECT 1.0 UNION ALL SELECT 1 INTERSECT SELECT 1 ORDER BY 1",
        "SELECT 1.0 INTERSECT SELECT 1 ORDER BY 1",
        "SELECT 1 EXCEPT SELECT 1.0 ORDER BY 1",
        "SELECT 1.0 UNION ALL SELECT 1 EXCEPT SELECT 2 ORDER BY 1",
        "SELECT 2 UNION ALL SELECT 1 UNION ALL SELECT 1.0 UNION SELECT 3 ORDER BY 1",
        "SELECT 1, 'b' UNION ALL SELECT 1, 'a' UNION SELECT 2, 'c' ORDER BY 1",
        "SELECT 1, 'b' UNION ALL SELECT 1, 'a' ORDER BY 1",
        "SELECT 1, 'b' UNION ALL SELECT 1, 'a' UNION ALL SELECT 2, 'c' ORDER BY 1",
        "SELECT 1.0, 'b' UNION ALL SELECT 1, 'a' UNION SELECT 1, 'b' ORDER BY 1",
        "SELECT 2, 'x' UNION SELECT 1, 'y' UNION ALL SELECT 1, 'k' ORDER BY 1",
        # r11: constant-expression arms fold through the chain compiler
        # before the literal parse, so per-row typing covers them too
        "SELECT 1+1 UNION SELECT '2'",
        "SELECT 2/2 UNION SELECT 1.0",
        "SELECT '3'+0 UNION SELECT 3",
        "SELECT '9e1' % 2 UNION SELECT 9 ORDER BY 1",
        "SELECT 1+1 AS a UNION SELECT '2' ORDER BY a",
        "SELECT 2*3, 'x' UNION SELECT 6, 'x'",
    ]

    def norm(rows):
        # typed compare: 1 == 1.0 in Python, but the representative's
        # FORM is part of the contract here. Blobs ride the wire as
        # base16 TEXT (the engine's documented blob encoding), so
        # sqlite3 bytes normalize to ('str', hex).
        return [
            [
                ("str", v.hex()) if isinstance(v, bytes) else (type(v).__name__, v)
                for v in r
            ]
            for r in rows
        ]

    for q in cases:
        want = norm(ref.execute(q).fetchall())
        got = norm(db.query_string_stmt(q)[0].values)
        assert got == want, (q, got, want)
    for q in [
        "SELECT 1, 2 UNION SELECT 3",
        "SELECT 1, 2 UNION ALL SELECT 3",
        "SELECT 1, 2 INTERSECT SELECT 3",
        "SELECT 1 UNION SELECT '1' ORDER BY 2",
        "SELECT 1 UNION SELECT 2 ORDER BY '1'",
    ]:
        try:
            ref.execute(q)
            raise AssertionError(f"sqlite accepted {q}")
        except sqlite3.OperationalError as e:
            want_err = str(e)
        with pytest.raises(DustError) as ei:
            db.query_string_stmt(q)
        assert str(ei.value) == want_err, q
    ref.close()


def test_blob_roundtrip(db):
    """BinaryType round-trip — fixes the reference's Blob→Null TODO
    (db/src/db.rs:268-269): blobs come back as base16 text."""
    db.execute_string_stmt("CREATE TABLE b (id INTEGER NOT NULL PRIMARY KEY, payload BLOB)")
    db.execute_string_stmt("INSERT INTO b(payload) VALUES(?)", [b"\x01\x02\xff"])
    out = rows_to_json(db.query_string_stmt("SELECT payload FROM b"))
    assert out == '[{"columns":["payload"],"types":["blob"],"values":[["0102ff"]]}]'


def test_hex_unhex(db):
    out = db.query_string_stmt("SELECT hex('ab') AS h, unhex('6162') AS u")
    assert out[0].values == [["6162", "6162"]]
    assert out[0].types == ["text", "blob"]


def test_string_agg_ordered(spark):
    register_views(spark, SF_DIR)
    r = spark.sql(
        "SELECT string_agg(r_name, ',') WITHIN GROUP (ORDER BY r_name) AS names FROM region"
    ).collect()[0]
    parts = r.names.split(",")
    assert parts == sorted(parts) and len(parts) == 5


def test_group_concat_dialect(db):
    db.execute_string_stmt("CREATE TABLE g (id INTEGER NOT NULL PRIMARY KEY, v TEXT)")
    for v in ("a", "b"):
        db.execute_string_stmt(f"INSERT INTO g(v) VALUES('{v}')")
    out = db.query_string_stmt("SELECT group_concat(v, ',') AS c FROM g")
    assert out[0].values == [["a,b"]]


def test_iif_dialect(db):
    out = db.query_string_stmt("SELECT iif(1 = 1, 'yes', 'no') AS a, iif(1 = 2, 'yes', 'no') AS b")
    assert out[0].values == [["yes", "no"]]


def test_sqlite_datetime_fns(db):
    out = db.query_string_stmt(
        "SELECT julianday(TIMESTAMP '2024-01-01 00:00:00') AS jd, "
        "strftime('%Y/%m/%d %H:%M:%S', TIMESTAMP '2024-03-05 07:08:09') AS s, "
        "hex(zeroblob(3)) AS z"
    )
    assert out[0].values == [[2460310.5, "2024/03/05 07:08:09", "000000"]]


def test_approx_count_distinct(spark):
    orders = load_table(spark, SF_DIR, "orders")
    exact = orders.select(F.countDistinct("o_custkey")).collect()[0][0]
    approx = orders.select(F.approx_count_distinct("o_custkey", 0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05


def test_range_between_frame(spark):
    orders = load_table(spark, SF_DIR, "orders")
    # float range frames need the SQL form (the API overload is int-only)
    df = orders.selectExpr(
        "o_orderkey",
        "o_totalprice",
        "count(*) OVER (ORDER BY o_totalprice RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS peers",
    )
    rows = df.orderBy("o_orderkey").limit(50).collect()
    # verify one row by brute force
    allp = [r.o_totalprice for r in orders.collect()]
    probe = rows[0]
    want = sum(1 for p in allp if probe.o_totalprice - 1000.0 <= p <= probe.o_totalprice)
    assert probe.peers == want


def test_pivot(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
        .orderBy("l_returnflag")
    )
    rows = p.collect()
    assert {r.l_returnflag for r in rows} == {"A", "N", "R"}
    flat = li.groupBy("l_returnflag", "l_linestatus").count().collect()
    lookup = {(r.l_returnflag, r.l_linestatus): r["count"] for r in flat}
    for r in rows:
        assert (r["O"] or 0) == lookup.get((r.l_returnflag, "O"), 0)
        assert (r["F"] or 0) == lookup.get((r.l_returnflag, "F"), 0)


def test_unpivot_stack(spark):
    li = load_table(spark, SF_DIR, "lineitem").limit(10)
    st = li.selectExpr(
        "l_orderkey",
        "stack(2, 'qty', l_quantity, 'price', l_extendedprice) AS (metric, val)",
    )
    assert st.count() == 20
    assert {r.metric for r in st.collect()} == {"qty", "price"}


def test_recursive_cte_engine(db):
    out = db.query_string_stmt(
        "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 4) "
        "SELECT n FROM r ORDER BY n"
    )
    assert out[0].values == [[1], [2], [3], [4]]


def test_typeof_like(db):
    # typeof() maps Spark's static type to the SQLite storage class
    # (dialect._SQLITE_TYPEOF_MAP); per-value NULLs report 'null' like
    # SQLite's dynamic typing
    out = db.query_string_stmt(
        "SELECT typeof(1) AS t1, typeof('x') AS t2, typeof(CAST(1.5 AS DOUBLE)) AS t3, "
        "typeof(NULL) AS t4"
    )
    assert out[0].values == [["integer", "text", "real", "null"]]


def test_explain_through_engine(db):
    db.execute_string_stmt("CREATE TABLE e (id INTEGER NOT NULL PRIMARY KEY, v INT)")
    out = db.query_string_stmt("EXPLAIN SELECT v FROM e WHERE id = 1")
    assert out[0].columns == ["plan"]
    assert "Scan" in out[0].values[0][0] or "Physical" in out[0].values[0][0]
    # SQLite's EXPLAIN QUERY PLAN prefix is accepted too (plan text is
    # engine-specific by nature in both systems)
    out = db.query_string_stmt("EXPLAIN QUERY PLAN SELECT v FROM e WHERE id = 1")
    assert out[0].columns == ["plan"] and out[0].values


def test_maintenance_statements_are_noops(db):
    db.execute_string_stmt("CREATE TABLE m (id INTEGER NOT NULL PRIMARY KEY)")
    r = db.execute_string_stmt("VACUUM")
    assert r[0].error == ""
    r = db.execute_string_stmt("ANALYZE")
    assert r[0].error == ""


def test_negative_limit_is_unlimited(db):
    # SQLite treats a negative LIMIT as "no limit"
    db.execute_string_stmt("CREATE TABLE neglim (id INTEGER NOT NULL PRIMARY KEY, v INT)")
    db.execute_string_stmt("INSERT INTO neglim(v) VALUES (1), (2), (3)")
    out = db.query_string_stmt("SELECT v FROM neglim ORDER BY v LIMIT -1")
    assert [r[0] for r in out[0].values] == [1, 2, 3]


def test_rowid_alias(db):
    """SQLite rowid semantics: bare rowid/_rowid_/oid alias the INTEGER
    PRIMARY KEY column; a real column named rowid shadows the alias;
    last_insert_rowid() reflects connection state."""
    db.execute_string_stmt("CREATE TABLE rt (id INTEGER NOT NULL PRIMARY KEY, v INT)")
    db.execute_string_stmt("INSERT INTO rt(v) VALUES (10), (20), (30)")
    out = db.query_string_stmt("SELECT rowid, v FROM rt ORDER BY rowid")
    assert out[0].values == [[1, 10], [2, 20], [3, 30]]
    out = db.query_string_stmt("SELECT v FROM rt WHERE rowid = last_insert_rowid()")
    assert out[0].values == [[30]]
    db.execute_string_stmt("UPDATE rt SET v = rowid * 100 WHERE rowid <= 2")
    db.execute_string_stmt("DELETE FROM rt WHERE _rowid_ = 1")
    out = db.query_string_stmt("SELECT oid, v FROM rt ORDER BY oid")
    assert out[0].values == [[2, 200], [3, 30]]
    # shadowing: a real column named rowid wins over the alias
    db.execute_string_stmt("CREATE TABLE rs (id INTEGER NOT NULL PRIMARY KEY, rowid INT)")
    db.execute_string_stmt("INSERT INTO rs(rowid) VALUES (99)")
    assert db.query_string_stmt("SELECT rowid FROM rs")[0].values == [[99]]


def test_rowid_result_column_names(db):
    """SQLite's probed wire naming for bare rowid select items: the PK
    column name on an INTEGER-PRIMARY-KEY alias table (cur.description
    for 'SELECT rowid FROM rn' is ['id']), literally 'rowid' on an
    implicit-rowid table (even for oid/_rowid_). Differential against
    in-process sqlite3 on both table forms."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    for s in (
        "CREATE TABLE rn (id INTEGER NOT NULL PRIMARY KEY, v INT)",
        "INSERT INTO rn(v) VALUES (7), (8)",
        "CREATE TABLE ri (v INT)",
        "INSERT INTO ri(v) VALUES (7), (8)",
    ):
        ref.execute(s)
        db.execute_string_stmt(s)
    for q in (
        "SELECT rowid, v FROM rn ORDER BY rowid",
        "SELECT oid, _rowid_ FROM rn",
        "SELECT DISTINCT rowid FROM rn",
        "SELECT rn.rowid FROM rn",
        "SELECT rowid AS r FROM rn",
        "SELECT coalesce(v, rowid, 0) AS c FROM rn ORDER BY c",
        "SELECT rowid, v FROM ri ORDER BY rowid",
        "SELECT oid, _rowid_ FROM ri",
        "SELECT ri.rowid FROM ri ORDER BY 1",
        "SELECT *, rowid FROM ri ORDER BY rowid",
        "SELECT rowid AS r FROM ri ORDER BY r",
        "SELECT count(*) AS n FROM ri WHERE rowid > 1",
    ):
        cur = ref.execute(q)
        want_cols = [d[0] for d in cur.description]
        want_vals = [list(r) for r in cur.fetchall()]
        got = db.query_string_stmt(q)[0]
        assert got.columns == want_cols, (q, got.columns, want_cols)
        assert sorted(map(tuple, got.values)) == sorted(map(tuple, want_vals)), q


def test_implicit_rowid_dml_sqlite_differential(db):
    """Implicit-rowid tables (no INTEGER PRIMARY KEY — SQLite's default
    table form): hidden rowid assignment, max(rowid)+1 reuse after
    deleting the max row (AUTOINCREMENT stays monotone), rowid UPDATE
    moving the sequence both directions, explicit-rowid INSERT with
    UNIQUE enforcement, last_insert_rowid, and table_info hiding —
    statement-by-statement differential against in-process sqlite3."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    stmts = [
        "CREATE TABLE imp (v TEXT)",
        "INSERT INTO imp VALUES ('a')",
        "INSERT INTO imp VALUES ('b'), ('c')",
        "DELETE FROM imp WHERE rowid = 3",
        "INSERT INTO imp VALUES ('d')",  # reuses rowid 3
        "UPDATE imp SET rowid = 1000 WHERE rowid = 3",
        "UPDATE imp SET rowid = 5 WHERE rowid = 1000",  # lowers the max
        "INSERT INTO imp VALUES ('e')",  # takes 6, not 1001
        "INSERT INTO imp(rowid, v) VALUES (50, 'f')",
        "INSERT INTO imp VALUES ('g')",  # 51
        "UPDATE imp SET v = v || rowid WHERE rowid <= 2",
        "INSERT INTO imp(rowid, v) VALUES (50, 'dup')",  # UNIQUE error
        # ON CONFLICT(rowid) is legal SQLite on implicit tables
        "INSERT INTO imp(rowid, v) VALUES (50, 'up') "
        "ON CONFLICT(rowid) DO UPDATE SET v = excluded.v",
        "INSERT INTO imp(rowid, v) VALUES (50, 'no') ON CONFLICT DO NOTHING",
        "REPLACE INTO imp(rowid, v) VALUES (50, 'rep')",
        "DELETE FROM imp",  # empty -> sequence restarts at 1
        "INSERT INTO imp VALUES ('h')",
    ]
    for s in stmts:
        try:
            ref.execute(s)
            ref_err = None
        except sqlite3.Error as e:
            ref_err = str(e)
        got = db.execute_string_stmt(s)[0]
        got_err = got.error or None
        assert (ref_err is None) == (got_err is None), (s, ref_err, got_err)
        if ref_err is not None:
            assert got_err == ref_err, (s, ref_err, got_err)
    q = "SELECT rowid, v FROM imp ORDER BY rowid"
    assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
        list(r) for r in ref.execute(q).fetchall()
    ]
    assert db.query_string_stmt("SELECT last_insert_rowid() AS r")[0].values == [
        [ref.execute("SELECT last_insert_rowid()").fetchone()[0]]
    ]
    # PRAGMA table_info never shows the hidden rowid
    assert [r[1] for r in db.query_string_stmt("PRAGMA table_info(imp)")[0].values] == ["v"]
    # CTAS results are rowid tables too (row order of the unordered
    # source SELECT is engine-specific, so order the source)
    db.execute_string_stmt("CREATE TABLE imp2 AS SELECT v FROM imp ORDER BY v")
    assert db.query_string_stmt("SELECT rowid, v FROM imp2")[0].values == [[1, "h"]]


def test_staged_rowid_in_tx_sqlite_differential(db):
    """ADVICE r5: inside an explicit transaction, an INSERT...SELECT
    whose source is an implicit-rowid table MODIFIED earlier in the
    same tx must see the STAGED rows (not committed state), and the
    rowid-view restore must re-register the staged projection so later
    statements in the tx still see staged data. Differential against
    sqlite3."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ref.isolation_level = None
    stmts = [
        "CREATE TABLE src (a INT, b TEXT)",  # implicit rowid
        "CREATE TABLE dst (r INT, a INT)",
        "INSERT INTO src VALUES (10, 'pre')",
        "BEGIN",
        "INSERT INTO src VALUES (1, 'x')",
        "INSERT INTO src VALUES (2, 'y')",
        "DELETE FROM src WHERE a = 10",
        # source read with rowid, mid-tx, against staged src
        "INSERT INTO dst SELECT rowid, a FROM src",
        # later statement must still see staged src (restore must not
        # clobber the staged view with committed state)
        "INSERT INTO dst SELECT rowid + 100, a FROM src WHERE a = 2",
        "COMMIT",
    ]
    for s in stmts:
        ref.execute(s)
        r = db.execute_string_stmt(s)[0]
        assert r.error == "", (s, r.error)
    for q in (
        "SELECT r, a FROM dst ORDER BY r, a",
        "SELECT rowid, a, b FROM src ORDER BY rowid",
    ):
        assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
            list(r) for r in ref.execute(q).fetchall()
        ], q
    # same shape through a single atomic batch (non-explicit overlay)
    ref.execute("CREATE TABLE dst2 (r INT)")
    ref.execute("BEGIN")
    ref.execute("INSERT INTO src VALUES (3, 'z')")
    ref.execute("INSERT INTO dst2 SELECT rowid FROM src WHERE a = 3")
    ref.execute("COMMIT")
    from dust_spark.model import Request, Statement

    rs = db.execute(
        Request(
            transaction=True,
            statements=[
                Statement("CREATE TABLE dst2 (r INT)", []),
                Statement("INSERT INTO src VALUES (3, 'z')", []),
                Statement("INSERT INTO dst2 SELECT rowid FROM src WHERE a = 3", []),
            ],
        )
    )
    assert all(r.error == "" for r in rs), [r.error for r in rs]
    q = "SELECT r FROM dst2 ORDER BY r"
    assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
        list(r) for r in ref.execute(q).fetchall()
    ]


def test_sqlite_sequence_and_window_frames(db):
    """sqlite_sequence mirrors sqlite3: one (name, seq) row per
    AUTOINCREMENT table once inserted, seq survives DELETE, and the
    table appears in sqlite_master after the first AUTOINCREMENT
    table. EXCLUDE NO OTHERS (the no-op default) is stripped; real
    GROUPS/EXCLUDE frames reject loudly instead of surfacing a Spark
    parse error."""
    db.execute_string_stmt("CREATE TABLE sqa (id INTEGER PRIMARY KEY AUTOINCREMENT, v INT)")
    assert db.query_string_stmt("SELECT * FROM sqlite_sequence")[0].values == []
    db.execute_string_stmt("INSERT INTO sqa(v) VALUES (1), (2)")
    assert db.query_string_stmt("SELECT name, seq FROM sqlite_sequence")[0].values == [
        ["sqa", 2]
    ]
    db.execute_string_stmt("DELETE FROM sqa")
    assert db.query_string_stmt("SELECT seq FROM sqlite_sequence WHERE name='sqa'")[0].values == [[2]]
    assert db.query_string_stmt(
        "SELECT count(*) AS n FROM sqlite_master WHERE name='sqlite_sequence'"
    )[0].values == [[1]]
    # EXCLUDE NO OTHERS is a no-op (sqlite3-verified equal output)
    db.execute_string_stmt("INSERT INTO sqa(v) VALUES (10), (20), (30)")
    out = db.query_string_stmt(
        "SELECT SUM(v) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING AND CURRENT ROW "
        "EXCLUDE NO OTHERS) AS s FROM sqa ORDER BY id"
    )[0]
    assert [r[0] for r in out.values] == [10, 30, 50]
    # GROUPS frames and invertible-aggregate EXCLUDE clauses REWRITE
    # (r6) — sqlite3-differential in their own tests; min/max under
    # EXCLUDE on unbounded RANGE frames rewrites too as of r7
    # (test_exclude_minmax_range_sqlite_differential) — only
    # value-offset RANGE bounds still reject
    out = db.query_string_stmt(
        "SELECT MAX(v) OVER (ORDER BY id RANGE BETWEEN UNBOUNDED PRECEDING "
        "AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS m FROM sqa ORDER BY id"
    )[0]
    assert [r[0] for r in out.values] == [30, 30, 20]


def test_exclude_frames_sqlite_differential(db):
    """EXCLUDE window-frame clauses for invertible aggregates (r6):
    CURRENT ROW / GROUP / TIES by frame-aggregate subtraction, with the
    empty-after-exclusion NULL guard; total() in window position (its
    never-NULL coalesce must wrap the whole windowed aggregate); min/max
    EXCLUDE stays loud-rejected."""
    import sqlite3

    from dust_spark.session import DustError

    ref = sqlite3.connect(":memory:")
    ref.execute("CREATE TABLE ex (p TEXT, o INT, v INT)")
    db.execute_string_stmt("CREATE TABLE ex (p TEXT, o INT, v INT)")
    for r in [("a", 1, 10), ("a", 1, 20), ("a", 2, 30), ("a", 3, 40), ("b", 1, 5), ("b", 2, 6), ("b", 2, None)]:
        ref.execute("INSERT INTO ex VALUES (?,?,?)", r)
        db.execute_string_stmt("INSERT INTO ex VALUES (?,?,?)", list(r))
    for q in (
        "SELECT p,o,v, sum(v) OVER (PARTITION BY p ORDER BY o ROWS BETWEEN 1 "
        "PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS s FROM ex ORDER BY p,o,v",
        "SELECT p,o,v, sum(v) OVER (PARTITION BY p ORDER BY o RANGE BETWEEN "
        "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS s "
        "FROM ex ORDER BY p,o,v",
        "SELECT p,o,v, sum(v) OVER (PARTITION BY p ORDER BY o RANGE BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES) AS s FROM ex ORDER BY p,o,v",
        "SELECT p,o, count(*) OVER (PARTITION BY p ORDER BY o ROWS BETWEEN 2 "
        "PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) AS c FROM ex ORDER BY p,o,c",
        "SELECT p,o, count(v) OVER (PARTITION BY p ORDER BY o RANGE BETWEEN "
        "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS c "
        "FROM ex ORDER BY p,o,c",
        "SELECT p,o,v, avg(v) OVER (PARTITION BY p ORDER BY o ROWS BETWEEN 1 "
        "PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS a FROM ex ORDER BY p,o,v",
        "SELECT p,o,v, total(v) OVER (PARTITION BY p ORDER BY o RANGE BETWEEN "
        "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS t "
        "FROM ex ORDER BY p,o,v",
        "SELECT o, total(v) OVER (ORDER BY o) AS t FROM ex WHERE p='b' ORDER BY o, t",
        "SELECT p,o,v, sum(v) OVER (ORDER BY o ROWS 1 PRECEDING EXCLUDE "
        "CURRENT ROW) AS s FROM ex WHERE p='a' ORDER BY o,v",
    ):
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(r) for r in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)
    # min/max EXCLUDE CURRENT ROW on ROWS frames: split-window form
    for q in (
        "SELECT p,o, min(v) OVER (PARTITION BY p ORDER BY o ROWS BETWEEN 1 "
        "PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS m FROM ex ORDER BY p,o",
        "SELECT p,o, max(v) OVER (PARTITION BY p ORDER BY o ROWS BETWEEN "
        "UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) AS m "
        "FROM ex ORDER BY p,o",
        "SELECT p,o, min(v) OVER (PARTITION BY p ORDER BY o ROWS BETWEEN "
        "CURRENT ROW AND CURRENT ROW EXCLUDE CURRENT ROW) AS m FROM ex ORDER BY p,o",
    ):
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(r) for r in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)
    # RANGE min/max under EXCLUDE with a VALUE-OFFSET bound stays
    # rejected (value offsets don't translate to rank offsets; r7
    # closed the UNBOUNDED/CURRENT-ROW-bound cases — see
    # test_exclude_minmax_range_sqlite_differential)
    with pytest.raises(DustError, match="unsupported: window frame"):
        db.query_string_stmt(
            "SELECT min(v) OVER (ORDER BY o RANGE BETWEEN 1 PRECEDING "
            "AND 1 FOLLOWING EXCLUDE CURRENT ROW) FROM ex"
        )


def test_exclude_minmax_range_sqlite_differential(db):
    """min/max + EXCLUDE on RANGE frames (r7,
    dialect.rewrite_exclude_minmax_range): flanking peer groups become
    integer offsets in the DENSE_RANK domain; EXCLUDE CURRENT ROW adds
    the peer-group-minus-this-row term from per-group helper columns
    (group extreme, multiplicity, second-distinct value).  Duplicate
    peers, NULLs, single-row groups, unpartitioned windows and a mixed
    min+sum statement all sqlite3-differential."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ddl = "CREATE TABLE xmr (g TEXT, y INTEGER, x INTEGER)"
    ref.execute(ddl)
    db.execute_string_stmt(ddl)
    for r in [
        ("a", 1, 5), ("a", 1, 3), ("a", 2, 9), ("a", 2, 1), ("a", 3, 7),
        ("b", 1, 4), ("b", 1, 4), ("b", 2, None), ("b", 3, 2),
        ("a", 1, 3), ("a", 4, None),
    ]:
        ref.execute("INSERT INTO xmr VALUES (?,?,?)", r)
        db.execute_string_stmt("INSERT INTO xmr VALUES (?,?,?)", list(r))
    base = "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    full = "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
    after = "RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
    for q in (
        f"SELECT g,y,x, min(x) OVER (PARTITION BY g ORDER BY y {base} EXCLUDE GROUP) AS m FROM xmr ORDER BY g,y,x",
        f"SELECT g,y,x, max(x) OVER (PARTITION BY g ORDER BY y {base} EXCLUDE GROUP) AS m FROM xmr ORDER BY g,y,x",
        f"SELECT g,y,x, min(x) OVER (PARTITION BY g ORDER BY y {full} EXCLUDE GROUP) AS m FROM xmr ORDER BY g,y,x",
        f"SELECT g,y,x, min(x) OVER (PARTITION BY g ORDER BY y {base} EXCLUDE TIES) AS m FROM xmr ORDER BY g,y,x",
        f"SELECT g,y,x, max(x) OVER (PARTITION BY g ORDER BY y {after} EXCLUDE TIES) AS m FROM xmr ORDER BY g,y,x",
        f"SELECT g,y,x, min(x) OVER (PARTITION BY g ORDER BY y {base} EXCLUDE CURRENT ROW) AS m FROM xmr ORDER BY g,y,x",
        f"SELECT g,y,x, max(x) OVER (PARTITION BY g ORDER BY y {full} EXCLUDE CURRENT ROW) AS m FROM xmr ORDER BY g,y,x",
        "SELECT g,y,x, min(x) OVER (PARTITION BY g ORDER BY y RANGE BETWEEN CURRENT ROW AND CURRENT ROW EXCLUDE GROUP) AS m FROM xmr ORDER BY g,y,x",
        "SELECT g,y,x, min(x) OVER (PARTITION BY g ORDER BY y RANGE BETWEEN CURRENT ROW AND CURRENT ROW EXCLUDE CURRENT ROW) AS m FROM xmr ORDER BY g,y,x",
        f"SELECT g,y,x, max(x) OVER (ORDER BY y {base} EXCLUDE GROUP) AS m FROM xmr ORDER BY g,y,x",
        "SELECT g,y,x, min(x) OVER (PARTITION BY g ORDER BY y RANGE UNBOUNDED PRECEDING EXCLUDE CURRENT ROW) AS m FROM xmr ORDER BY g,y,x",
        f"SELECT g,y, min(x) OVER (PARTITION BY g ORDER BY y {base} EXCLUDE GROUP) AS m, "
        f"sum(x) OVER (PARTITION BY g ORDER BY y {base} EXCLUDE CURRENT ROW) AS s FROM xmr ORDER BY g,y,m,s",
        # r7 second wave: GROUPS + EXCLUDE composes (GROUPS rewrites to
        # RANGE over DENSE_RANK first; numeric offsets in that domain
        # ARE group offsets, so finite flanks translate directly)
        "SELECT g,y,x, min(x) OVER (PARTITION BY g ORDER BY y GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS m FROM xmr ORDER BY g,y,x",
        "SELECT g,y,x, max(x) OVER (PARTITION BY g ORDER BY y GROUPS BETWEEN 2 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS m FROM xmr ORDER BY g,y,x",
        "SELECT g,y,x, min(x) OVER (PARTITION BY g ORDER BY y GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE TIES) AS m FROM xmr ORDER BY g,y,x",
        "SELECT g,y,x, min(x) OVER (PARTITION BY g ORDER BY y GROUPS 1 PRECEDING EXCLUDE CURRENT ROW) AS m FROM xmr ORDER BY g,y,x",
        "SELECT g,y,x, max(x) OVER (ORDER BY y GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS m FROM xmr ORDER BY g,y,x",
        "SELECT g,y,x, sum(x) OVER (PARTITION BY g ORDER BY y GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) AS s FROM xmr ORDER BY g,y,x",
        "SELECT g,y,x, count(*) OVER (PARTITION BY g ORDER BY y GROUPS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS c FROM xmr ORDER BY g,y,x",
        "SELECT g,y,x, avg(x) OVER (PARTITION BY g ORDER BY y GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS a FROM xmr ORDER BY g,y,x",
        # non-straddling RANGE/GROUPS frames: EXCLUDE is a provable
        # no-op (the current group lies outside the frame) and strips
        "SELECT g,y,x, min(x) OVER (PARTITION BY g ORDER BY y GROUPS BETWEEN 2 PRECEDING AND 1 PRECEDING EXCLUDE GROUP) AS m FROM xmr ORDER BY g,y,x",
        "SELECT g,y,x, sum(x) OVER (PARTITION BY g ORDER BY y RANGE BETWEEN 1 FOLLOWING AND 2 FOLLOWING EXCLUDE TIES) AS s FROM xmr ORDER BY g,y,x",
        "SELECT g,y,x, max(x) OVER (ORDER BY y GROUPS BETWEEN 3 FOLLOWING AND 5 FOLLOWING EXCLUDE CURRENT ROW) AS m FROM xmr ORDER BY g,y,x",
    ):
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(r) for r in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)


def test_groups_frames_sqlite_differential(db):
    """GROUPS window frames (r6): peer-group counting frames rewrite to
    RANGE over DENSE_RANK — differential vs sqlite3 on mixed frame
    bounds, multiple windows, WHERE interaction, and the short form."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ref.execute("CREATE TABLE gf (p TEXT, o INT, v INT)")
    db.execute_string_stmt("CREATE TABLE gf (p TEXT, o INT, v INT)")
    for r in [("a", 1, 10), ("a", 1, 20), ("a", 2, 30), ("a", 3, 40), ("b", 1, 5), ("b", 2, 6), ("b", 2, 7)]:
        ref.execute("INSERT INTO gf VALUES (?,?,?)", r)
        db.execute_string_stmt("INSERT INTO gf VALUES (?,?,?)", list(r))
    for q in (
        "SELECT p, o, v, sum(v) OVER (PARTITION BY p ORDER BY o GROUPS "
        "BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM gf ORDER BY p, o, v",
        "SELECT p, o, v, sum(v) OVER (PARTITION BY p ORDER BY o GROUPS "
        "BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) AS s FROM gf ORDER BY p, o, v",
        "SELECT o, count(*) OVER (ORDER BY o GROUPS BETWEEN CURRENT ROW AND "
        "1 FOLLOWING) AS c FROM gf ORDER BY o, c",
        "SELECT p, o, min(v) OVER (PARTITION BY p ORDER BY o GROUPS 1 PRECEDING) "
        "AS mn FROM gf WHERE v > 5 ORDER BY p, o, mn",
        "SELECT o, sum(v) OVER (ORDER BY o GROUPS BETWEEN 1 PRECEDING AND 1 "
        "FOLLOWING) AS s, avg(v) OVER (ORDER BY o GROUPS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS a FROM gf ORDER BY o, s",
    ):
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(r) for r in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)
    # r7: GROUPS frames inside CTE bodies, derived tables and next to
    # correlated scalar subqueries (rewrite_groups_frames recursion; the
    # single-table wrap keeps the original alias so w.g still resolves)
    for q in (
        "WITH s AS (SELECT p, o, sum(v) OVER (PARTITION BY p ORDER BY o "
        "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS r FROM gf) "
        "SELECT p, o, r FROM s ORDER BY p, o, r",
        "SELECT p, mx FROM (SELECT p, max(v) OVER (PARTITION BY p ORDER BY o "
        "GROUPS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS mx FROM gf) t "
        "WHERE mx > 6 ORDER BY p, mx",
        "WITH s AS (SELECT p, o, v, count(*) OVER (PARTITION BY p ORDER BY o "
        "GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM gf) "
        "SELECT p, o, c, sum(v) OVER (PARTITION BY p ORDER BY o GROUPS "
        "BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s2 FROM s ORDER BY p, o, c, s2",
        "SELECT p, o, (SELECT count(*) FROM gf g2 WHERE g2.p = gf.p) AS n, "
        "sum(v) OVER (PARTITION BY p ORDER BY o GROUPS BETWEEN 1 PRECEDING "
        "AND CURRENT ROW) AS s FROM gf ORDER BY p, o, n, s",
        "WITH a AS (SELECT * FROM gf WHERE p = 'a'), b AS (SELECT o, min(v) "
        "OVER (ORDER BY o GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS m "
        "FROM a) SELECT o, m FROM b ORDER BY o, m",
    ):
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(r) for r in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)


def test_implicit_rowid_subqueries_sqlite_differential(db):
    """rowid inside DML subqueries and INSERT/CTAS sources on implicit
    tables: the classic keep-first dedup idiom (DELETE ... WHERE rowid
    NOT IN (SELECT MIN(rowid) ... GROUP BY ...)), a correlated rowid
    rank in UPDATE, and copying rowids out via INSERT ... SELECT — all
    need the hidden column exposed through the table view for the one
    statement (sqlite3 differential)."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    stmts = [
        "CREATE TABLE sq (v TEXT)",
        "INSERT INTO sq VALUES ('a'),('b'),('a'),('c'),('b'),('a')",
        "DELETE FROM sq WHERE rowid NOT IN (SELECT MIN(rowid) FROM sq GROUP BY v)",
        "UPDATE sq SET v = v || (SELECT COUNT(*) FROM sq s2 WHERE s2.rowid <= sq.rowid)",
        "CREATE TABLE sqc (id INT, v TEXT)",
        "INSERT INTO sqc SELECT rowid, v FROM sq",
    ]
    for s in stmts:
        ref.execute(s)
        r = db.execute_string_stmt(s)[0]
        assert r.error == "", (s, r.error)
    for q in (
        "SELECT rowid, v FROM sq ORDER BY rowid",
        "SELECT id, v FROM sqc ORDER BY id",
    ):
        assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
            list(r) for r in ref.execute(q).fetchall()
        ], q
    # CTAS keeps a rowid-derived real column; its own fresh rowid starts at 1
    db.execute_string_stmt(
        "CREATE TABLE sq2 AS SELECT rowid AS rid, v FROM sq ORDER BY rowid"
    )
    assert db.query_string_stmt("SELECT rowid, rid FROM sq2 ORDER BY rowid")[0].values == [
        [1, 1], [2, 2], [3, 4]
    ]


def test_collate_nocase(db):
    """SQLite NOCASE collation: expression-level (COLLATE NOCASE →
    Spark UTF8_LCASE) and column-level (collated string type — equality,
    ORDER BY and GROUP BY all case-insensitive engine-wide)."""
    out = db.query_string_stmt("SELECT 'Abc' = 'abc' COLLATE NOCASE")
    assert out[0].values == [[1]]
    db.execute_string_stmt(
        "CREATE TABLE nc (id INTEGER NOT NULL PRIMARY KEY, s TEXT COLLATE NOCASE)"
    )
    db.execute_string_stmt("INSERT INTO nc(s) VALUES('Apple'), ('BANANA'), ('apple')")
    assert db.query_string_stmt("SELECT count(*) FROM nc WHERE s = 'apple'")[0].values == [[2]]
    assert db.query_string_stmt("SELECT s FROM nc ORDER BY s, id")[0].values == [
        ["Apple"], ["apple"], ["BANANA"]
    ]
    assert db.query_string_stmt(
        "SELECT count(*) AS n FROM nc GROUP BY s ORDER BY n DESC"
    )[0].values == [[2], [1]]


def test_window_filter_and_decimal_wire(db):
    """r6 differential findings: FILTER (WHERE ...) on WINDOW functions
    (Spark lacks it — rewritten to the exact CASE folding), and decimal
    expression results riding the REAL wire (Spark parses 7.0 as
    DECIMAL; str(Decimal) leaked '3.500000'-style text)."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    for s in (
        "CREATE TABLE wf (a INT, b TEXT)",
        "INSERT INTO wf VALUES (1,'x'),(2,'y'),(3,'x'),(4,'y'),(5,'x')",
    ):
        ref.execute(s)
        assert db.execute_string_stmt(s)[0].error == ""
    for q in (
        "SELECT a, sum(a) FILTER (WHERE a > 1) OVER (ORDER BY a) FROM wf ORDER BY a",
        "SELECT a, count(*) FILTER (WHERE b = 'x') OVER (ORDER BY a) FROM wf ORDER BY a",
        "SELECT a, avg(a) FILTER (WHERE a >= 2) OVER (PARTITION BY b ORDER BY a) FROM wf ORDER BY a",
        "SELECT count(*) FILTER (WHERE a > 1) FROM wf",  # aggregate form: Spark-native
        "SELECT b, sum(a) FILTER (WHERE a >= 2) FROM wf GROUP BY b ORDER BY b",
        "SELECT 7.0/2, 1.5 + 2.25, abs(-5.5)",
    ):
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(r) for r in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)
    # the wire TYPE for decimal expressions is 'real', like sqlite3
    rows = db.query_string_stmt("SELECT 7.0/2 AS h")[0]
    assert rows.types == ["real"], rows.types


def test_conflict_target_validation_sqlite_differential(db):
    """ON CONFLICT target validation (r6): the explicit column list
    must name an actual PK/UNIQUE constraint (order-insensitive) —
    'ON CONFLICT(x)' on a (x,y) composite PK is SQLite's 'does not
    match any PRIMARY KEY or UNIQUE constraint' error; WITHOUT ROWID
    and composite-PK upserts/REPLACE behave identically."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    stmts = [
        "CREATE TABLE w2 (k TEXT PRIMARY KEY, n INT) WITHOUT ROWID",
        "INSERT INTO w2 VALUES ('a', 1), ('b', 2)",
        "INSERT INTO w2 VALUES ('a', 10) ON CONFLICT(k) DO UPDATE SET n = n + excluded.n",
        "REPLACE INTO w2 VALUES ('b', 99)",
        "CREATE TABLE cpt (x INT, y INT, v TEXT, PRIMARY KEY (x, y))",
        "INSERT INTO cpt VALUES (1,1,'a'), (1,2,'b')",
        "INSERT INTO cpt VALUES (1,1,'z') ON CONFLICT(x, y) DO UPDATE SET v = excluded.v || '!'",
        "INSERT INTO cpt VALUES (9,9,'m') ON CONFLICT(y, x) DO NOTHING",
        "INSERT INTO cpt VALUES (2,2,'q') ON CONFLICT(x) DO NOTHING",  # error
        "CREATE TABLE iu (a INT UNIQUE, b INT UNIQUE)",
        "INSERT INTO iu VALUES (1, 2)",
        "INSERT INTO iu VALUES (4, 2) ON CONFLICT(a, b) DO NOTHING",  # error
        "DELETE FROM cpt WHERE (x, y) = (1, 2)",
    ]
    for s in stmts:
        try:
            ref.execute(s)
            werr = None
        except sqlite3.Error as e:
            werr = str(e)
        got = db.execute_string_stmt(s)[0]
        gerr = got.error or None
        assert (werr is None) == (gerr is None), (s, werr, gerr)
        if werr is not None:
            assert gerr == werr, (s, werr, gerr)
    for q in (
        "SELECT k, n FROM w2 ORDER BY k",
        "SELECT x, y, v FROM cpt ORDER BY x, y",
        "SELECT a, b FROM iu ORDER BY a",
    ):
        assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
            list(r) for r in ref.execute(q).fetchall()
        ], q


def test_drop_column_revalidation_sqlite_differential(db):
    """DROP COLUMN post-drop schema revalidation (r6-probed): checks
    carried by the dropped column vanish silently, any OTHER check /
    generated column / view still referencing it fails the drop with
    SQLite's 'error in <kind> <name> after drop column' string; the
    last visible column refuses. (Statements are ordered to dodge a
    sqlite 3.40 quirk where an unrelated INSERT flips a later ALTER's
    behavior — canonical semantics verified in isolation.)"""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    stmts = [
        "CREATE TABLE t1 (a INT CHECK (a < b), b INT, c INT)",
        "ALTER TABLE t1 DROP COLUMN b",  # other-column check xref: error
        "ALTER TABLE t1 DROP COLUMN a",  # own-column check drops silently
        "CREATE TABLE t2 (a INT, b INT CHECK (b > a))",
        "ALTER TABLE t2 DROP COLUMN b",
        "ALTER TABLE t2 DROP COLUMN a",  # last column: error
        "CREATE TABLE t3 (a INT, b INT, CHECK (a < b))",
        "ALTER TABLE t3 DROP COLUMN b",  # table-level check xref: error
        "CREATE TABLE g (p INT, r INT, q INT GENERATED ALWAYS AS (p*2) VIRTUAL)",
        "ALTER TABLE g DROP COLUMN p",  # generated xref: error
        "ALTER TABLE g DROP COLUMN r",
        "CREATE TABLE u (x INT, y INT)",
        "CREATE VIEW uv AS SELECT x FROM u",
        "ALTER TABLE u DROP COLUMN x",  # view xref: error
        "CREATE TABLE pk2 (m INT PRIMARY KEY, n INT UNIQUE, o INT)",
        "ALTER TABLE pk2 DROP COLUMN m",
        "ALTER TABLE pk2 DROP COLUMN n",
    ]
    for s in stmts:
        try:
            ref.execute(s)
            werr = None
        except sqlite3.Error as e:
            werr = str(e)
        got = db.execute_string_stmt(s)[0]
        gerr = got.error or None
        assert (werr is None) == (gerr is None), (s, werr, gerr)
        if werr is not None:
            assert gerr == werr, (s, werr, gerr)
    # t2's own-column check really vanished: the once-invalid row inserts
    ref.execute("INSERT INTO t2 VALUES (5)")
    assert db.execute_string_stmt("INSERT INTO t2 VALUES (5)")[0].error == ""
    for q in ("SELECT * FROM t1", "SELECT * FROM t2", "SELECT x FROM u"):
        assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
            list(r) for r in ref.execute(q).fetchall()
        ], q


def test_collated_constraints_sqlite_differential(db):
    """Column collations flow through CONSTRAINTS (r6 probe): NOCASE /
    RTRIM UNIQUE and PRIMARY KEY conflict case/trailing-space
    insensitively, and upserts fire on collated conflicts — free from
    the collated Spark string types, verified against sqlite3."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    stmts = [
        "CREATE TABLE cu (v TEXT COLLATE NOCASE UNIQUE)",
        "INSERT INTO cu VALUES ('abc')",
        "INSERT INTO cu VALUES ('ABC')",
        "CREATE TABLE cr (v TEXT COLLATE RTRIM UNIQUE)",
        "INSERT INTO cr VALUES ('x  ')",
        "INSERT INTO cr VALUES ('x')",
        "CREATE TABLE cp (v TEXT COLLATE NOCASE PRIMARY KEY, n INT)",
        "INSERT INTO cp VALUES ('Key', 1)",
        "INSERT INTO cp VALUES ('KEY', 2)",
        "INSERT INTO cp VALUES ('other', 3) ON CONFLICT(v) DO UPDATE SET n = 9",
        "INSERT INTO cp VALUES ('kEy', 7) ON CONFLICT(v) DO UPDATE SET n = 99",
    ]
    for s in stmts:
        try:
            ref.execute(s)
            werr = None
        except sqlite3.Error as e:
            werr = str(e)
        got = db.execute_string_stmt(s)[0]
        gerr = got.error or None
        assert (werr is None) == (gerr is None), (s, werr, gerr)
        if werr is not None:
            assert gerr == werr, (s, werr, gerr)
    for q in ("SELECT v FROM cu", "SELECT v FROM cr", "SELECT v, n FROM cp ORDER BY n"):
        assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
            list(r) for r in ref.execute(q).fetchall()
        ], q


def test_error_strings_sqlite_differential(db):
    """r6 error-string parity: unknown functions, syntax errors (near-X
    and incomplete input), and keyword-as-column shapes surface SQLite's
    exact messages."""
    import sqlite3

    from dust_spark.session import DustError

    ref = sqlite3.connect(":memory:")
    ref.execute("CREATE TABLE et (a INT)")
    db.execute_string_stmt("CREATE TABLE et (a INT)")
    for q in (
        "SELECT nosuchfn(1)",
        "SELCT 1",
        "SELECT 1 +",
        "SELECT FROM et",
        "SELECT nosuch_col FROM et",
        "SELECT * FROM missing_table",
        # r7: RAISE outside a trigger program has its own message
        "SELECT RAISE(ABORT, 'boom')",
    ):
        try:
            ref.execute(q)
            werr = None
        except sqlite3.Error as e:
            werr = str(e)
        try:
            db.query_string_stmt(q)
            gerr = None
        except DustError as e:
            gerr = str(e)
        assert gerr == werr, (q, werr, gerr)


def test_upsert_qualifier_and_values_naming(db):
    """r6: table-qualified target refs in DO UPDATE SET (SET n = t.n*10),
    SQLite's column1..N names for FROM (VALUES ...), and expression
    naming through a WITH prefix — differential vs sqlite3."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    for s in (
        "CREATE TABLE uq (id INTEGER PRIMARY KEY, k TEXT UNIQUE, n INT DEFAULT 0)",
        "INSERT INTO uq(k, n) VALUES ('a', 1), ('b', 2)",
        "INSERT INTO uq(k, n) VALUES ('a', 10) ON CONFLICT(k) DO UPDATE SET n = n + excluded.n",
        "INSERT INTO uq(k, n) VALUES ('b', 5) ON CONFLICT(k) "
        "DO UPDATE SET n = uq.n * 10 WHERE uq.n < 100",
    ):
        ref.execute(s)
        r = db.execute_string_stmt(s)[0]
        assert r.error == "", (s, r.error)
    for q in (
        "SELECT id, k, n FROM uq ORDER BY id",
        "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) ORDER BY 1",
        "WITH x(a) AS (VALUES (1),(2)) SELECT a*2 FROM x ORDER BY 1",
    ):
        cur = ref.execute(q)
        want_cols = [d[0] for d in cur.description]
        want = [list(r) for r in cur.fetchall()]
        rows = db.query_string_stmt(q)[0]
        assert rows.columns == want_cols, (q, rows.columns, want_cols)
        assert [list(r) for r in rows.values] == want, q


def test_ddl_edges_sqlite_differential(db):
    """r6 DDL/ident findings vs sqlite3: double-quoted identifiers
    (keyword table/column names), INTEGER PRIMARY KEY DESC is NOT a
    rowid alias (but table-level PRIMARY KEY(x DESC) IS), NULL is legal
    in ordinary-table PKs (the legacy quirk) but not in WITHOUT
    ROWID/STRICT, CURRENT_TIMESTAMP/DATE defaults in SQLite's text
    formats, function-call DEFAULTs captured balanced, and the
    table-form values-count error string."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    stmts = [
        "CREATE TABLE de1 (a INT, b TEXT, c REAL)",
        "INSERT INTO de1 VALUES (1,2,3,4)",  # table-form error string
        'CREATE TABLE "select" ("order" INT)',
        'INSERT INTO "select"("order") VALUES (7)',
        "CREATE TABLE de3 (id INTEGER PRIMARY KEY DESC, v TEXT)",
        "INSERT INTO de3(v) VALUES ('a')",  # id stays NULL
        "INSERT INTO de3 VALUES (NULL, 'b')",
        "CREATE TABLE de3b (x INTEGER, PRIMARY KEY (x DESC))",
        "INSERT INTO de3b(x) VALUES (NULL)",  # alias: auto-assigns 1
        "CREATE TABLE dep (k INT PRIMARY KEY, v TEXT)",
        "INSERT INTO dep VALUES (NULL, 'a')",
        "INSERT INTO dep VALUES (NULL, 'b')",  # two NULL PKs legal
        "CREATE TABLE dew (k INT PRIMARY KEY, v TEXT) WITHOUT ROWID",
        "INSERT INTO dew VALUES (NULL, 'x')",  # NOT NULL error
        "CREATE TABLE dest (k INT PRIMARY KEY, v TEXT) STRICT",
        "INSERT INTO dest VALUES (NULL, 'x')",  # NOT NULL error
        "CREATE TABLE de6 (t TEXT DEFAULT CURRENT_TIMESTAMP, "
        "d TEXT DEFAULT CURRENT_DATE, n INT)",
        "INSERT INTO de6(n) VALUES (1)",
    ]
    for s in stmts:
        try:
            ref.execute(s)
            werr = None
        except sqlite3.Error as e:
            werr = str(e)
        got = db.execute_string_stmt(s)[0]
        gerr = got.error or None
        assert (werr is None) == (gerr is None), (s, werr, gerr)
        if werr is not None:
            assert gerr == werr, (s, werr, gerr)
    for q in (
        'SELECT "order" FROM "select"',
        "SELECT id, v FROM de3 ORDER BY v",
        "SELECT x FROM de3b",
        "SELECT k, v FROM dep ORDER BY v",
        "SELECT n, length(t) = 19, length(d) = 10 FROM de6",
    ):
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(r) for r in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)


def test_truthiness_sqlite_differential(db):
    """SQLite truthiness of non-boolean conditions (r6): WHERE/HAVING
    accept any value (numeric-prefix string coercion, three-valued NOT),
    AND/OR/NOT operands coerce individually, searched-CASE WHEN
    conditions too. Implemented as a DATATYPE_MISMATCH retry that wraps
    the boolean structure — SQL Spark already accepts never pays it."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ref.execute("CREATE TABLE tr2 (a INT, b TEXT)")
    db.execute_string_stmt("CREATE TABLE tr2 (a INT, b TEXT)")
    for v in [(0, "x"), (1, "y"), (2, "1z"), (None, "abc")]:
        ref.execute("INSERT INTO tr2 VALUES (?,?)", v)
        db.execute_string_stmt("INSERT INTO tr2 VALUES (?,?)", list(v))
    for q in (
        "SELECT 1 WHERE 2",
        "SELECT 1 WHERE 'abc'",
        "SELECT 1 WHERE '0.5'",
        "SELECT 1 WHERE NULL",
        "SELECT a FROM tr2 WHERE a ORDER BY a",
        "SELECT a FROM tr2 WHERE b ORDER BY a",
        "SELECT a FROM tr2 WHERE NOT a ORDER BY a",
        "SELECT a FROM tr2 WHERE NOT b ORDER BY a",
        "SELECT a FROM tr2 WHERE a AND 1 ORDER BY a",
        "SELECT a FROM tr2 WHERE a OR 0 ORDER BY a",
        "SELECT a FROM tr2 WHERE a BETWEEN 1 AND 2 AND b ORDER BY a",
        "SELECT a FROM tr2 WHERE (a OR b) AND 1 ORDER BY a",
        "SELECT a FROM tr2 WHERE CASE WHEN a THEN 1 ELSE 0 END AND 1 ORDER BY a",
        "SELECT CASE WHEN 2 THEN 'y' ELSE 'n' END",
        "SELECT CASE b WHEN 'x' THEN 1 ELSE 0 END FROM tr2 ORDER BY a",
        "SELECT a, CASE WHEN a THEN CASE WHEN b THEN 'bb' ELSE 'nb' END "
        "ELSE 'na' END FROM tr2 ORDER BY a",
        "SELECT b, count(*) FROM tr2 GROUP BY b HAVING count(*) ORDER BY b",
    ):
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(r) for r in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)


def test_row_value_comparisons_sqlite_differential(db):
    """SQLite row values (rowvalue.html): (a,b) OP (c,d) member-wise =
    and lexicographic </<=/>/>= — expanded textually because Spark's
    struct compare refuses member-type coercion (r6 finding). Function
    calls, IN lists and 1-tuples stay untouched."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ref.execute("CREATE TABLE rv (a INT, b TEXT, c INT)")
    db.execute_string_stmt("CREATE TABLE rv (a INT, b TEXT, c INT)")
    for v in [(1, "x", 10), (2, "y", 20), (1, "y", 30), (2, "x", 40), (None, "z", 50)]:
        ref.execute("INSERT INTO rv VALUES (?,?,?)", v)
        db.execute_string_stmt("INSERT INTO rv VALUES (?,?,?)", list(v))
    for q in (
        "SELECT c FROM rv WHERE (a, b) = (1, 'x')",
        "SELECT c FROM rv WHERE (a, b) <> (1, 'x') ORDER BY c",
        "SELECT c FROM rv WHERE (a, b) > (1, 'x') ORDER BY c",
        "SELECT c FROM rv WHERE (a, b) >= (2, 'x') ORDER BY c",
        "SELECT c FROM rv WHERE (a, b) < (2, 'y') ORDER BY c",
        "SELECT c FROM rv WHERE (a, b) <= (1, 'y') ORDER BY c",
        "SELECT (1, 2) = (1, 2), (1, 2) = (1, 3), (1, 'a') < (1, 'b')",
        "SELECT c FROM rv WHERE ((a, b) = (1, 'x') OR (a, b) = (2, 'y')) ORDER BY c",
        "SELECT c FROM rv WHERE (a) = (1) ORDER BY c",
        "SELECT max(1, 2)",
        "SELECT c FROM rv WHERE a IN (1, 2) ORDER BY c",
        "SELECT (a, b) = (1, 'x') FROM rv ORDER BY c",
    ):
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(r) for r in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)


def test_bare_group_columns_sqlite_differential(db):
    """SQLite's bare-columns-in-aggregate-query feature (r6): ungrouped
    non-aggregate select items are legal; with exactly one 1-arg
    min()/max() they take values from the min/max row (→ min_by/max_by),
    otherwise an arbitrary group row (→ any_value). Deterministic cases
    differential vs sqlite3; arbitrary-row cases check membership."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ref.execute("CREATE TABLE bg (a INT, b TEXT, g TEXT)")
    db.execute_string_stmt("CREATE TABLE bg (a INT, b TEXT, g TEXT)")
    for v in [(1, "p", "x"), (5, "q", "x"), (3, "r", "x"), (2, "s", "y"), (9, "u", "y")]:
        ref.execute("INSERT INTO bg VALUES (?,?,?)", v)
        db.execute_string_stmt("INSERT INTO bg VALUES (?,?,?)", list(v))
    for q in (
        "SELECT g, b, max(a) FROM bg GROUP BY g ORDER BY g",
        "SELECT g, b, min(a) FROM bg GROUP BY g ORDER BY g",
        "SELECT g, a+1, max(a) FROM bg GROUP BY g ORDER BY g",
        "SELECT g, max(a) AS m, b FROM bg GROUP BY g ORDER BY g",
        "SELECT bg.b, max(bg.a) FROM bg GROUP BY bg.g ORDER BY 1",
    ):
        cur = ref.execute(q)
        want_cols = [d[0] for d in cur.description]
        want = [list(r) for r in cur.fetchall()]
        rows = db.query_string_stmt(q)[0]
        assert rows.columns == want_cols, (q, rows.columns, want_cols)
        assert [list(r) for r in rows.values] == want, q
    # arbitrary-row semantics: any member of the group is legal
    rows = db.query_string_stmt("SELECT g, b, count(*) FROM bg GROUP BY g ORDER BY g")[0]
    got = {(r[0], r[2]) for r in rows.values}
    assert got == {("x", 3), ("y", 2)}
    members = {"x": {"p", "q", "r"}, "y": {"s", "u"}}
    for r in rows.values:
        assert r[1] in members[r[0]], r


def test_collate_rtrim_sqlite_differential(db):
    """SQLite RTRIM collation (trailing-space-insensitive compare,
    stored text untouched) → Spark's UTF8_BINARY_RTRIM trim-modifier
    collation — expression- and column-level, differential vs sqlite3."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    for s in (
        "CREATE TABLE rt (id INTEGER NOT NULL PRIMARY KEY, v TEXT COLLATE RTRIM)",
        "INSERT INTO rt(v) VALUES ('x '), ('x'), ('y  '), ('  z')",
    ):
        ref.execute(s)
        r = db.execute_string_stmt(s)[0]
        assert r.error == "", (s, r.error)
    for q in (
        "SELECT 'abc  ' = 'abc' COLLATE RTRIM",
        "SELECT '  abc' = 'abc' COLLATE RTRIM",
        "SELECT 'a b ' = 'a b' COLLATE RTRIM",
        "SELECT count(*) FROM rt WHERE v = 'x'",
        "SELECT count(*) FROM rt WHERE v = 'z'",  # leading spaces still differ
        "SELECT v, count(*) FROM rt GROUP BY v ORDER BY count(*) DESC, v",
        "SELECT v FROM rt ORDER BY v, id",
    ):
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(r) for r in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)


def test_with_cte_dml(db):
    """SQLite CTEs on DML: WITH ... INSERT folds the CTEs into the
    source select (incl. RECURSIVE); WITH ... UPDATE/DELETE and
    UPDATE ... FROM are first-class (golden + sqlite3-differential
    coverage in test_session.py)."""
    db.execute_string_stmt("CREATE TABLE wd (id INTEGER NOT NULL PRIMARY KEY, v INT)")
    db.execute_string_stmt("INSERT INTO wd(id, v) VALUES (1, 10)")
    r = db.execute_string_stmt(
        "WITH src AS (SELECT 2 AS id, 20 AS v) INSERT INTO wd SELECT id, v FROM src"
    )
    assert r[0].error == "" and r[0].rows_affected == 1
    r = db.execute_string_stmt(
        "WITH RECURSIVE c(n) AS (SELECT 5 UNION ALL SELECT n+1 FROM c WHERE n < 7) "
        "INSERT INTO wd SELECT n, n FROM c"
    )
    assert r[0].error == "" and r[0].rows_affected == 3
    out = db.query_string_stmt("SELECT id FROM wd ORDER BY id")
    assert [r0[0] for r0 in out[0].values] == [1, 2, 5, 6, 7]
    r = db.execute_string_stmt("WITH c AS (SELECT 5 AS n) UPDATE wd SET v = 1 WHERE id IN (SELECT n FROM c)")
    assert r[0].error == "" and r[0].rows_affected == 1
    # self-join update through FROM with an alias
    r = db.execute_string_stmt("UPDATE wd SET v = w2.id FROM wd w2 WHERE wd.id = w2.id")
    assert r[0].error == "" and r[0].rows_affected == 5


def test_randomblob_entropy_and_clamp(db):
    """randomblob(n): n independent pseudo-random bytes — a blob longer
    than one md5 block must not tile the same 16 bytes; n < 1 clamps to
    a 1-byte blob like SQLite (ADVICE r4)."""
    out = db.query_string_stmt(
        "SELECT length(randomblob(40)) AS l40, length(randomblob(0)) AS l0, "
        "length(randomblob(-5)) AS ln, hex(randomblob(32)) AS h"
    )[0]
    l40, l0, ln, h = out.values[0]
    assert (l40, l0, ln) == (40, 1, 1)
    assert h[:32] != h[32:64], "randomblob tiles the same 16-byte block"


def test_random_is_int64(db):
    """SQLite random() returns a signed 64-bit INTEGER (typeof
    'integer'), not Spark's [0,1) double — abs(random() % N) idioms
    depend on it."""
    out = db.query_string_stmt(
        "SELECT typeof(random()) AS t, abs(random() % 100) AS m"
    )[0]
    t, m = out.values[0]
    assert t == "integer" and 0 <= m < 100
    vals = {db.query_string_stmt("SELECT random()")[0].values[0][0] for _ in range(4)}
    assert all(isinstance(v, int) for v in vals) and len(vals) > 1


def test_last_insert_rowid_in_string_literal(db):
    """The last_insert_rowid() inline must be string-literal aware: an
    occurrence inside a quoted string is data, not connection state."""
    db.execute_string_stmt("CREATE TABLE lir (id INTEGER NOT NULL PRIMARY KEY, v INT)")
    db.execute_string_stmt("INSERT INTO lir(v) VALUES (1)")
    out = db.query_string_stmt(
        "SELECT 'last_insert_rowid()' AS s, last_insert_rowid() AS r"
    )[0]
    assert out.values == [["last_insert_rowid()", 1]]


def test_nested_with_insert(db):
    """WITH a AS (...) INSERT INTO t WITH b AS (...) SELECT — legal
    SQLite; the two CTE lists merge into one WITH (a naive prefix
    would emit 'WITH ... WITH ...' and fail at Spark parse)."""
    db.execute_string_stmt("CREATE TABLE nw (v INT)")
    r = db.execute_string_stmt(
        "WITH a AS (SELECT 3 AS v) INSERT INTO nw "
        "WITH b AS (SELECT 4 AS v) SELECT v FROM a UNION ALL SELECT v FROM b"
    )
    assert r[0].error == "" and r[0].rows_affected == 2
    assert db.query_string_stmt("SELECT v FROM nw ORDER BY v")[0].values == [[3], [4]]


def test_with_insert_values_sqlite_differential(db):
    """WITH ... INSERT ... VALUES (r7 — former loud rejection): legal
    SQLite, and the CTEs ARE visible to scalar subqueries inside the
    rows (sqlite3-probed).  Rows rewrite to a CTE-scoped SELECT union.
    WITH + DEFAULT VALUES is legal too (CTEs unreferencable)."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    stmts = [
        "CREATE TABLE wv (id INTEGER PRIMARY KEY, v INT DEFAULT 3)",
        "WITH c AS (SELECT 42 AS v) INSERT INTO wv VALUES (1, (SELECT v FROM c))",
        "WITH c AS (SELECT 7 AS v) INSERT INTO wv(v) VALUES ((SELECT v FROM c)), (9)",
        "WITH x AS (SELECT 1) INSERT INTO wv DEFAULT VALUES",
    ]
    for s in stmts:
        ref.execute(s)
        r = db.execute_string_stmt(s)[0]
        assert r.error == "", (s, r.error)
    q = "SELECT id, v FROM wv ORDER BY id"
    assert db.query_string_stmt(q)[0].values == [list(r) for r in ref.execute(q)]


def test_multirow_upsert_sequential_groups_sqlite_differential(db):
    """Multi-row upserts with same-key conflict groups (r8): SQLite
    applies the DO UPDATE arm per batch row with EVOLVING target values
    and counts each arm in changes() — the engine now runs the exact
    sequential replay for those statements (was: one-fold with
    excluded = last row, documented). WHERE-gated arms evaluate per row
    against the evolving image."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    stmts = [
        "CREATE TABLE t (id INTEGER PRIMARY KEY, v INT)",
        "INSERT INTO t VALUES (1, 10)",
        # existing-key group: both arms apply sequentially (10+1+2)
        "INSERT INTO t(id,v) VALUES (1,1),(1,2),(5,9) "
        "ON CONFLICT(id) DO UPDATE SET v=v+excluded.v",
        # fresh-key group: insert first row then two arms (1+2+3)
        "INSERT INTO t(id,v) VALUES (6,1),(6,2),(6,3) "
        "ON CONFLICT(id) DO UPDATE SET v=v+excluded.v",
        # WHERE gates each arm against the evolving image
        "INSERT INTO t(id,v) VALUES (1,1),(1,2) "
        "ON CONFLICT(id) DO UPDATE SET v=v+excluded.v WHERE excluded.v > 1",
    ]
    for s in stmts:
        ref.execute(s)
        r = db.execute_string_stmt(s)[0]
        assert r.error == "", (s, r.error)
        for q in ("SELECT id, v FROM t ORDER BY id", "SELECT changes()"):
            want = [list(x) for x in ref.execute(q).fetchall()]
            have = [list(x) for x in db.query_string_stmt(q)[0].values]
            assert have == want, (s, q, have, want)


def test_upsert_replay_blob_literal_substitution(db):
    """r8 ADVICE (high) regression: _subst_upsert_expr spliced literals
    in place, so the bare-column pass saw the X prefix of an injected
    X'..' blob literal as a column named 'x' and corrupted it
    (INVALID_TYPED_LITERAL, all rows lost). Spliced literals now enter
    as opaque placeholders restored in one final pass. Typeless columns
    store as blob here, so only rows_affected/shape is compared (the
    wire hex representation is a documented engine convention)."""
    db.execute_string_stmt("CREATE TABLE bl (id INTEGER PRIMARY KEY, u UNIQUE, x)")
    r = db.execute_string_stmt(
        "INSERT INTO bl(u,x) VALUES ('c',1),('c',2),('d',3) "
        "ON CONFLICT(u) DO UPDATE SET x=excluded.x"
    )
    assert r[0].error == "" and r[0].rows_affected == 3
    rows = db.query_string_stmt("SELECT id FROM bl ORDER BY id")[0].values
    assert rows == [[1], [2]]
    # source-text blob literal in the arm + bare/table-qualified refs
    # splicing blob OLD values, with a string literal full of column
    # names that must stay untouched
    for s in (
        "INSERT INTO bl(u,x) VALUES ('c',5),('c',6) ON CONFLICT(u) DO UPDATE SET x=X'ab'",
        "INSERT INTO bl(u,x) VALUES ('c',7),('c',8) "
        "ON CONFLICT(u) DO UPDATE SET x = x WHERE 'x u id' <> ''",
        "INSERT INTO bl(u,x) VALUES ('d',9),('d',10) ON CONFLICT(u) DO UPDATE SET x = bl.x",
    ):
        r = db.execute_string_stmt(s)
        assert r[0].error == "", (s, r[0].error)


def test_upsert_auto_id_burn_sqlite_differential(db):
    """r8 ADVICE (low): sqlite allocates an auto rowid only on
    SUCCESSFUL insert — a conflicting DO UPDATE/DO NOTHING row must not
    burn one (probe: after (7,'c') exists, ('c',1),('c',2),('d',3)
    gives d id=8, not 10), while excluded.rowid still SEES the would-be
    id (excluded.id reads max+1 and the next insert gets the same id).
    Explicit ids raise the max only when the row actually lands."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    stmts = [
        "CREATE TABLE ab (id INTEGER PRIMARY KEY, u TEXT UNIQUE, x INT)",
        "INSERT INTO ab(id,u,x) VALUES (7,'c',0)",
        "INSERT INTO ab(u,x) VALUES ('c',1),('c',2),('d',3) "
        "ON CONFLICT(u) DO UPDATE SET x=excluded.x",
        "INSERT INTO ab(u,x) VALUES ('c',1) ON CONFLICT(u) DO UPDATE SET x=excluded.id",
        "INSERT INTO ab(u,x) VALUES ('e',0)",
        "INSERT INTO ab(u,x) VALUES ('c',9),('f',1) ON CONFLICT(u) DO NOTHING",
        "INSERT INTO ab(id,u,x) VALUES (99,'c',5) ON CONFLICT(u) DO UPDATE SET x=excluded.x",
        "INSERT INTO ab(u,x) VALUES ('g',0)",
    ]
    for s in stmts:
        ref.execute(s)
        r = db.execute_string_stmt(s)[0]
        assert r.error == "", (s, r.error)
        for q in (
            "SELECT id,u,x FROM ab ORDER BY id",
            "SELECT changes()",
            "SELECT last_insert_rowid()",
        ):
            want = [list(x) for x in ref.execute(q).fetchall()]
            have = [list(x) for x in db.query_string_stmt(q)[0].values]
            assert have == want, (s, q, have, want)


def test_upsert_auto_id_burn_select_source_sqlite_differential(db):
    """r10 (verdict #5): the exact no-burn auto-rowid semantics extend
    from VALUES batches to INSERT...SELECT sources below the
    _SEQ_EXACT_ROWS gate — conflicting upsert rows drawn FROM a table
    must not burn ids either, and the whole per-row sequence (changes,
    last_insert_rowid, evolving DO UPDATE images, in-batch same-key
    groups) matches sqlite3. Bulk sources above the gate keep the
    documented monotone approximation."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    stmts = [
        "CREATE TABLE sab (id INTEGER PRIMARY KEY, u TEXT UNIQUE, x INT)",
        "CREATE TABLE ssrc (u TEXT, x INT)",
        "INSERT INTO sab(id,u,x) VALUES (7,'c',0)",
        "INSERT INTO ssrc VALUES ('c',1),('c',2),('d',3)",
        # conflicting rows from a SELECT source: 'd' must get id 8
        # (WHERE true: SQLite's upsert-after-SELECT parser ambiguity)
        "INSERT INTO sab(u,x) SELECT u,x FROM ssrc WHERE true "
        "ON CONFLICT(u) DO UPDATE SET x=excluded.x",
        "INSERT INTO sab(u,x) VALUES ('e',0)",
        # DO NOTHING from a SELECT source with an ORDER BY
        "DELETE FROM ssrc",
        "INSERT INTO ssrc VALUES ('c',9),('f',1)",
        "INSERT INTO sab(u,x) SELECT u,x FROM ssrc ORDER BY x "
        "ON CONFLICT(u) DO NOTHING",
        "INSERT INTO sab(u,x) VALUES ('g',0)",
        # excluded.id still sees the would-be id through a SELECT source
        "INSERT INTO sab(u,x) SELECT 'c', 1 WHERE true "
        "ON CONFLICT(u) DO UPDATE SET x=excluded.id",
        "INSERT INTO sab(u,x) VALUES ('h',0)",
    ]
    for s in stmts:
        ref.execute(s)
        r = db.execute_string_stmt(s)[0]
        assert r.error == "", (s, r.error)
        for q in (
            "SELECT id,u,x FROM sab ORDER BY id",
            "SELECT changes()",
            "SELECT last_insert_rowid()",
        ):
            want = [list(x) for x in ref.execute(q).fetchall()]
            have = [list(x) for x in db.query_string_stmt(q)[0].values]
            assert have == want, (s, q, have, want)
    db.execute_string_stmt("DROP TABLE sab")
    db.execute_string_stmt("DROP TABLE ssrc")
    ref.close()


def test_upsert_conflict_key_move_sqlite_differential(db):
    """r8's last documented upsert divergence, closed in r9: a DO
    UPDATE arm that MOVES the conflict-target key VACATES the old slot
    (a later same-key batch row inserts fresh); moving onto an occupied
    key is 'UNIQUE constraint failed: t.u' with full statement
    rollback. The replay tracks per-image origins and the merge builds
    the fresh frame from the replay's exact insert set."""
    import sqlite3

    def run(stmts):
        ref = sqlite3.connect(":memory:")
        for s in stmts:
            try:
                ref.execute(s)
                werr = None
            except sqlite3.Error as e:
                werr = str(e)
            gerr = db.execute_string_stmt(s)[0].error or None
            assert (gerr is None) == (werr is None), (s, werr, gerr)
            if werr is not None:
                assert gerr == werr, (s, werr, gerr)
            qs = ["SELECT id,u,v FROM t ORDER BY id"]
            if werr is None and s.upper().startswith("INSERT"):
                qs += ["SELECT changes()", "SELECT last_insert_rowid()"]
            for q in qs:
                want = [list(r) for r in ref.execute(q).fetchall()]
                have = [list(r) for r in db.query_string_stmt(q)[0].values]
                assert have == want, (s, q, have, want)
        db.execute_string_stmt("DROP TABLE t")

    mk = "CREATE TABLE t (id INTEGER PRIMARY KEY, u TEXT UNIQUE, v INT)"
    # vacate: later same-key row inserts fresh
    run([mk, "INSERT INTO t VALUES (1,'a',10)",
         "INSERT INTO t(u,v) VALUES ('a',1),('a',2) "
         "ON CONFLICT(u) DO UPDATE SET u=u||'x', v=excluded.v"])
    # collision: arm moves key onto an occupied one -> UNIQUE + rollback
    run([mk, "INSERT INTO t VALUES (1,'a',10),(2,'b',20)",
         "INSERT INTO t(u,v) VALUES ('a',1),('z',5) "
         "ON CONFLICT(u) DO UPDATE SET u='b'"])
    # 3-row chain: second inserts fresh at the vacated key, third's arm
    # then collides with the first move -> error
    run([mk, "INSERT INTO t VALUES (1,'a',10)",
         "INSERT INTO t(u,v) VALUES ('a',1),('a',2),('a',3) "
         "ON CONFLICT(u) DO UPDATE SET u=u||'x', v=excluded.v"])
    # vacate within a FRESH in-batch group (no pre-existing row)
    run([mk,
         "INSERT INTO t(u,v) VALUES ('q',1),('q',2),('q',3) "
         "ON CONFLICT(u) DO UPDATE SET u=u||'y', v=excluded.v"])


def test_with_cte_upsert_do_update_arm_sqlite_differential(db):
    """WITH CTEs are visible to upsert DO UPDATE SET/WHERE arms too
    (sqlite3-probed — r7's documented micro-gap, closed in r8), on both
    the set-based merge path and the trigger-replay path (the AFTER
    UPDATE log must see the CTE-derived NEW image)."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    stmts = [
        "CREATE TABLE t (id INTEGER PRIMARY KEY, v INT)",
        "INSERT INTO t VALUES (1, 10), (2, 20)",
        "WITH m AS (SELECT 100 AS bonus) "
        "INSERT INTO t(id, v) VALUES (1, 5), (3, 7) "
        "ON CONFLICT(id) DO UPDATE SET v = v + excluded.v + (SELECT bonus FROM m) "
        "WHERE (SELECT bonus FROM m) > 0",
        "CREATE TABLE log (m TEXT)",
        "CREATE TRIGGER au AFTER UPDATE ON t BEGIN "
        "INSERT INTO log VALUES ('au-'||OLD.v||'-'||NEW.v); END",
        "WITH m AS (SELECT 7 AS b) "
        "INSERT INTO t(id, v) VALUES (2, 1) "
        "ON CONFLICT(id) DO UPDATE SET v = excluded.v + (SELECT b FROM m)",
        # CTE gated OFF by the WHERE arm: row untouched
        "WITH m AS (SELECT 0 AS b) "
        "INSERT INTO t(id, v) VALUES (3, 9) "
        "ON CONFLICT(id) DO UPDATE SET v = 999 WHERE (SELECT b FROM m) > 0",
    ]
    for s in stmts:
        ref.execute(s)
        r = db.execute_string_stmt(s)[0]
        assert r.error == "", (s, r.error)
    for q in ("SELECT id, v FROM t ORDER BY id", "SELECT m FROM log ORDER BY rowid"):
        assert db.query_string_stmt(q)[0].values == [list(r) for r in ref.execute(q)], q


def test_triggers_supported_instead_of_rejected(db):
    """CREATE TRIGGER was a documented exclusion through r6; r7
    implemented it (tests/test_triggers.py is the sqlite3-differential
    battery), including RAISE(IGNORE) in the r7 fourth wave — the full
    trigger grammar now parses and fires."""
    db.execute_string_stmt("CREATE TABLE tr (id INTEGER NOT NULL PRIMARY KEY, v INT)")
    r = db.execute_string_stmt(
        "CREATE TRIGGER t1 AFTER INSERT ON tr BEGIN UPDATE tr SET v = 1 WHERE id = NEW.id; END"
    )
    assert not r[0].error
    db.execute_string_stmt("INSERT INTO tr(v) VALUES (7)")
    assert db.query_string_stmt("SELECT v FROM tr")[0].values == [[1]]
    db.execute_string_stmt("DROP TRIGGER t1")
    r = db.execute_string_stmt(
        "CREATE TRIGGER t2 BEFORE INSERT ON tr BEGIN "
        "SELECT RAISE(IGNORE) WHERE NEW.v < 0; END"
    )
    assert not r[0].error
    db.execute_string_stmt("INSERT INTO tr(v) VALUES (-1), (5)")
    assert db.query_string_stmt("SELECT v FROM tr ORDER BY id")[0].values == [[1], [5]]


def test_savepoints_sqlite_differential(db):
    """SAVEPOINT / RELEASE / ROLLBACK TO (r5 VERDICT item 6):
    statement-by-statement differential against sqlite3 — SAVEPOINT in
    autocommit opens a transaction, RELEASE of that savepoint commits,
    ROLLBACK TO restores state but keeps the savepoint and transaction
    alive, names match case-insensitively and most-recent-first, and
    SQLite's exact error strings surface for misuse."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ref.isolation_level = None
    stmts = [
        "CREATE TABLE sv (a INT)",
        # -- savepoint-started transaction, committed by RELEASE
        "SAVEPOINT sp",
        "INSERT INTO sv VALUES (1)",
        "RELEASE sp",
        "COMMIT",  # err: release already committed
        # -- ROLLBACK TO keeps the savepoint alive for repeated rollbacks
        "BEGIN",
        "INSERT INTO sv VALUES (2)",
        "SAVEPOINT w",
        "INSERT INTO sv VALUES (3)",
        "ROLLBACK TO w",
        "INSERT INTO sv VALUES (4)",
        "ROLLBACK TO SAVEPOINT w",
        "INSERT INTO sv VALUES (5)",
        "RELEASE SAVEPOINT w",
        "RELEASE w",  # err: already released
        "COMMIT",
        # -- nested savepoints: releasing a lower one pops those above
        "SAVEPOINT a",
        "INSERT INTO sv VALUES (6)",
        "SAVEPOINT b",
        "INSERT INTO sv VALUES (7)",
        "RELEASE a",  # pops b too, commits (a started the tx)
        "RELEASE b",  # err: no such savepoint
        "ROLLBACK TO a",  # err: no such savepoint
        # -- case-insensitive matching; quoted names
        "SAVEPOINT Alpha",
        "INSERT INTO sv VALUES (8)",
        'ROLLBACK TO "ALPHA"',
        "RELEASE alpha",
        # -- full ROLLBACK closes a savepoint-started tx and its stack
        "SAVEPOINT z",
        "INSERT INTO sv VALUES (9)",
        "ROLLBACK",
        "RELEASE z",  # err: stack cleared by the rollback
        "BEGIN",  # works: previous tx fully closed
        "INSERT INTO sv VALUES (10)",
        "COMMIT",
        "RELEASE nope",  # err outside any tx too
    ]
    for s in stmts:
        try:
            ref.execute(s)
            ref_err = None
        except sqlite3.Error as e:
            ref_err = str(e)
        got = db.execute_string_stmt(s)[0]
        got_err = got.error or None
        assert (ref_err is None) == (got_err is None), (s, ref_err, got_err)
        if ref_err is not None:
            assert got_err == ref_err, (s, ref_err, got_err)
    q = "SELECT a FROM sv ORDER BY a"
    assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
        list(r) for r in ref.execute(q).fetchall()
    ]
    # savepoint rolled-back work never reaches the journal: a reopened
    # disk-mode session replays to the same committed state (covered for
    # explicit tx by test_explicit_tx_journal_replay; memory mode here
    # just re-checks the visible state is consistent post-stack-clear)
    assert db.query_string_stmt("SELECT count(*) AS n FROM sv")[0].values == [
        [ref.execute("SELECT count(*) FROM sv").fetchone()[0]]
    ]


def test_without_rowid_table(db):
    db.execute_string_stmt("CREATE TABLE worow (k TEXT NOT NULL PRIMARY KEY, v INT) WITHOUT ROWID")
    db.execute_string_stmt("INSERT INTO worow VALUES ('x', 1), ('y', 2)")
    out = db.query_string_stmt("SELECT k, v FROM worow ORDER BY k")
    assert out[0].values == [["x", 1], ["y", 2]]
    # PK still enforced
    r = db.execute_string_stmt("INSERT INTO worow VALUES ('x', 9)")
    assert "UNIQUE constraint failed" in r[0].error


def test_sqlite_master(db):
    """sqlite_master / sqlite_schema mirror SQLite's catalog rows
    (differential vs in-process sqlite3 on the same DDL; user CREATE
    INDEX rows excluded — indexes are accepted-and-ignored engine-wide,
    consistent with PRAGMA index_list)."""
    import sqlite3

    ddl = [
        "CREATE TABLE t1 (id INTEGER NOT NULL PRIMARY KEY, v INT UNIQUE)",
        "CREATE TABLE t2 (a TEXT NOT NULL, b INT, UNIQUE(a, b))",
        "CREATE VIEW v1 AS SELECT id FROM t1",
    ]
    ref = sqlite3.connect(":memory:")
    for s in ddl:
        ref.execute(s)
        db.execute_string_stmt(s)
    want = ref.execute("SELECT * FROM sqlite_master").fetchall()
    got = db.query_string_stmt("SELECT * FROM sqlite_master")[0]
    assert got.columns == ["type", "name", "tbl_name", "rootpage", "sql"]
    assert [tuple(r) for r in got.values] == want
    # sqlite_schema alias + filtered introspection queries
    assert db.query_string_stmt(
        "SELECT name FROM sqlite_schema WHERE type = 'table' ORDER BY name"
    )[0].values == [["t1"], ["t2"]]
    # RENAME rewrites the stored sql with the quoted new name (SQLite)
    db.execute_string_stmt("ALTER TABLE t1 RENAME TO t9")
    ref.execute("ALTER TABLE t1 RENAME TO t9")
    want_sql = ref.execute("SELECT sql FROM sqlite_master WHERE name='t9'").fetchone()[0]
    assert db.query_string_stmt(
        "SELECT sql FROM sqlite_master WHERE name = 't9'"
    )[0].values == [[want_sql]]


def test_metadata_pragmas(db):
    """database_list / foreign_key_list / index_list mirror SQLite's
    rows (incl. the INTEGER-PRIMARY-KEY-is-the-rowid no-index rule)."""
    db.execute_string_stmt(
        "CREATE TABLE mp (id INTEGER NOT NULL PRIMARY KEY, v INT NOT NULL UNIQUE, w TEXT, "
        "FOREIGN KEY (v) REFERENCES q(id))"
    )
    assert db.query_string_stmt("PRAGMA database_list")[0].values == [[0, "main", ""]]
    # schema cookies: user_version settable, schema_version bumped by DDL
    assert db.query_string_stmt("PRAGMA user_version")[0].values == [[0]]
    db.execute_string_stmt("PRAGMA user_version = 7")
    assert db.query_string_stmt("PRAGMA user_version")[0].values == [[7]]
    sv0 = db.query_string_stmt("PRAGMA schema_version")[0].values[0][0]
    db.execute_string_stmt("CREATE TABLE svbump (x INT)")
    sv1 = db.query_string_stmt("PRAGMA schema_version")[0].values[0][0]
    assert sv1 == sv0 + 1
    assert db.query_string_stmt("PRAGMA foreign_key_list(mp)")[0].values == [
        [0, 0, "q", "v", "id", "NO ACTION", "NO ACTION", "NONE"]
    ]
    assert db.query_string_stmt("PRAGMA index_list(mp)")[0].values == [
        [0, "sqlite_autoindex_mp_1", 1, "u", 0]
    ]
    # non-integer PK: the pk autoindex IS emitted (no rowid alias)
    db.execute_string_stmt("CREATE TABLE mp2 (k TEXT NOT NULL PRIMARY KEY)")
    assert db.query_string_stmt("PRAGMA index_list(mp2)")[0].values == [
        [0, "sqlite_autoindex_mp2_1", 1, "pk", 0]
    ]


def test_pragma_tvfs_and_exact_integer_alias(db):
    """Pragma table-valued functions (SELECT ... FROM
    pragma_table_info('t') with WHERE/aliases/joins) and the EXACT
    'INTEGER' rowid-alias rule: 'x INT PRIMARY KEY' keeps an
    independent rowid and its pk autoindex (sqlite3-probed), only
    'INTEGER' aliases — both column-level and table-level PK forms."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    for s in (
        "CREATE TABLE pt (a INT PRIMARY KEY, b TEXT NOT NULL)",
        "CREATE TABLE pu (x integer PRIMARY KEY)",
        "CREATE TABLE pv (x INT, PRIMARY KEY(x))",
        "INSERT INTO pt VALUES (5, 'q')",
        "INSERT INTO pu VALUES (5)",
        "INSERT INTO pv VALUES (5)",
    ):
        ref.execute(s)
        assert db.execute_string_stmt(s)[0].error == "", s
    for q in (
        "SELECT name, type FROM pragma_table_info('pt') ORDER BY cid",
        "SELECT p.name FROM pragma_table_info('pt') AS p WHERE p.pk = 1",
        "SELECT name FROM pragma_index_list('pt')",  # INT pk HAS an autoindex
        "SELECT name FROM pragma_index_list('pu')",  # INTEGER alias: none
        "SELECT name FROM pragma_index_list('pv')",  # table-level INT: autoindex
        "SELECT rowid, a FROM pt",  # independent rowid restarts at 1
        "SELECT rowid, x FROM pu",  # alias: rowid == x == 5
    ):
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(r) for r in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)


def test_numbered_parameters_sqlite_differential(db):
    """?NNN numbered placeholders (bind the NNNth parameter, set the
    running index; bare ? takes the next index) on both the write and
    read paths — value parity with sqlite3."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ref.execute("CREATE TABLE np (a INT, b TEXT)")
    db.execute_string_stmt("CREATE TABLE np (a INT, b TEXT)")
    for q, p in (
        ("INSERT INTO np VALUES (?1, ?2)", (5, "x")),
        ("INSERT INTO np VALUES (?2, ?1)", ("y", 7)),  # swapped refs
        ("INSERT INTO np VALUES (?1, ?)", (9, "z")),  # bare ? follows ?1
        # bare ? after out-of-order refs: takes max-assigned+1 (=?3),
        # NOT previous-placeholder+1 (=?2) — lang_expr.html#varparam
        ("INSERT INTO np VALUES (?2, ?)", (11, 13, "w")),
    ):
        ref.execute(q, p)
        r = db.execute_string_stmt(q, list(p))[0]
        assert r.error == "", (q, r.error)
    q = "SELECT a, b FROM np WHERE a = ?1 OR b = ?2 ORDER BY a"
    assert [list(r) for r in db.query_string_stmt(q, [5, "y"])[0].values] == [
        list(r) for r in ref.execute(q, (5, "y")).fetchall()
    ]
    # the probe from ADVICE r5: ?2, ?1, ? must bind (20, 10, 30)
    q = "SELECT ?2 AS x, ?1 AS y, ? AS z"
    assert [list(r) for r in db.query_string_stmt(q, [10, 20, 30])[0].values] == [
        list(r) for r in ref.execute(q, (10, 20, 30)).fetchall()
    ]


def test_changes_total_changes(db):
    """changes()/total_changes() connection state mirrors sqlite3: the
    most recent DML's row count vs the cumulative count; DDL leaves
    both untouched."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    for s in (
        "CREATE TABLE cht (a INT)",
        "INSERT INTO cht VALUES (1),(2),(3)",
        "DELETE FROM cht WHERE a < 3",
        "UPDATE cht SET a = 9",
        "CREATE TABLE chu (b INT)",
    ):
        ref.execute(s)
        db.execute_string_stmt(s)
        q = "SELECT changes() AS c, total_changes() AS t"
        assert list(db.query_string_stmt(q)[0].values[0]) == list(
            ref.execute(q).fetchone()
        ), s
    # inside a string literal the tokens are data, not connection state
    assert db.query_string_stmt("SELECT 'changes()' AS s")[0].values == [["changes()"]]


def test_explicit_transactions_sqlite_differential(db):
    """Explicit BEGIN/COMMIT(END)/ROLLBACK as statements: connection-
    level transactions spanning requests, staged rows visible inside
    the open tx, SQLite's exact misuse error strings."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ref.isolation_level = None
    stmts = [
        "CREATE TABLE xt (a INT)",
        "BEGIN",
        "INSERT INTO xt VALUES (1)",
        "INSERT INTO xt VALUES (2)",
        "COMMIT",
        "COMMIT",  # no tx active
        "BEGIN TRANSACTION",
        "BEGIN",  # nested
        "INSERT INTO xt VALUES (3)",
        "ROLLBACK",
        "ROLLBACK",  # no tx active
        "BEGIN",
        "INSERT INTO xt VALUES (4)",
        "VACUUM",  # cannot VACUUM from within a transaction
        "END",  # COMMIT alias
        "VACUUM",  # fine outside
        # OR ROLLBACK: the failed statement rolls back AND closes the tx
        "CREATE TABLE xr (id INTEGER PRIMARY KEY)",
        "INSERT INTO xr VALUES (1)",
        "BEGIN",
        "INSERT INTO xr VALUES (2)",
        "INSERT OR ROLLBACK INTO xr VALUES (1)",  # conflict
        "COMMIT",  # no tx active anymore
    ]
    for s in stmts:
        try:
            ref.execute(s)
            ref_err = None
        except sqlite3.Error as e:
            ref_err = str(e)
        got_err = db.execute_string_stmt(s)[0].error or None
        assert got_err == ref_err, (s, ref_err, got_err)
    q = "SELECT a FROM xt ORDER BY a"
    assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
        list(r) for r in ref.execute(q).fetchall()
    ]


def test_explicit_tx_journal_replay(spark, tmp_path):
    """COMMIT journals the transaction's statements atomically; an
    ABANDONED open transaction journals nothing — replay reproduces
    exactly the committed state."""
    import os

    from dust_spark import DustSession
    from dust_spark.model import rows_to_json

    wh = str(tmp_path / "wh_tx")
    db = DustSession(spark, warehouse=wh)
    db.execute_string_stmt("CREATE TABLE t (a INT)")
    db.execute_string_stmt("BEGIN")
    db.execute_string_stmt("INSERT INTO t VALUES (1)")
    db.execute_string_stmt("COMMIT")
    db.execute_string_stmt("BEGIN")
    db.execute_string_stmt("INSERT INTO t VALUES (99)")  # never committed
    want = '[{"columns":["a"],"types":["integer"],"values":[[1]]}]'
    db.close()

    replayed = DustSession.replay(os.path.join(wh, "journal.jsonl"), spark)
    assert rows_to_json(replayed.query_string_stmt("SELECT a FROM t ORDER BY a")) == want
    replayed.close()


def test_collation_survives_disk_reopen(spark, tmp_path):
    """RTRIM/NOCASE column collations round-trip through the manifest:
    a reopened disk-mode session still enforces collated UNIQUE and
    compares collation-insensitively (r6)."""
    from dust_spark import DustSession

    wh = str(tmp_path / "wh_coll")
    db = DustSession(spark, warehouse=wh)
    db.execute_string_stmt("CREATE TABLE rc (v TEXT COLLATE RTRIM UNIQUE, n TEXT COLLATE NOCASE)")
    db.execute_string_stmt("INSERT INTO rc VALUES ('x  ', 'Apple')")
    db.close()
    db2 = DustSession(spark, warehouse=wh)
    try:
        r = db2.execute_string_stmt("INSERT INTO rc VALUES ('x', 'b')")[0]
        assert r.error == "UNIQUE constraint failed: rc.v"
        assert db2.query_string_stmt("SELECT count(*) FROM rc WHERE n = 'APPLE'")[0].values == [[1]]
    finally:
        db2.close()


def test_savepoint_across_attached_sqlite_differential(spark, tmp_path):
    """Savepoints span ATTACHed databases atomically (the overlay
    snapshot covers the whole sibling family): ROLLBACK TO reverts
    staged work in BOTH catalogs — differential vs sqlite3 with a real
    attached file."""
    import os
    import sqlite3

    from dust_spark import DustSession

    ref = sqlite3.connect(str(tmp_path / "main.db"))
    ref.isolation_level = None
    ref.execute(f"ATTACH '{tmp_path / 'aux.db'}' AS aux")
    db = DustSession(spark)
    try:
        assert db.execute_string_stmt(f"ATTACH '{tmp_path / 'aux_wh'}' AS aux")[0].error == ""
        for s in (
            "CREATE TABLE m (a INT)",
            "CREATE TABLE aux.x (b INT)",
            "BEGIN",
            "INSERT INTO m VALUES (1)",
            "INSERT INTO aux.x VALUES (10)",
            "SAVEPOINT sp",
            "INSERT INTO m VALUES (2)",
            "INSERT INTO aux.x VALUES (20)",
            "ROLLBACK TO sp",
            "INSERT INTO aux.x VALUES (30)",
            "COMMIT",
        ):
            ref.execute(s)
            r = db.execute_string_stmt(s)[0]
            assert r.error == "", (s, r.error)
        for q in ("SELECT a FROM m ORDER BY a", "SELECT b FROM aux.x ORDER BY b"):
            want = [r0[0] for r0 in ref.execute(q).fetchall()]
            got = [r0[0] for r0 in db.query_string_stmt(q)[0].values]
            assert got == want, (q, got, want)
    finally:
        db.close()
        ref.close()


def test_savepoint_journal_replay(spark, tmp_path):
    """Work rolled back via ROLLBACK TO never reaches the journal: the
    tx journal checkpoint recorded at SAVEPOINT truncates on rollback,
    so replay reproduces exactly the surviving statements."""
    import os

    from dust_spark import DustSession
    from dust_spark.model import rows_to_json

    wh = str(tmp_path / "wh_sp")
    db = DustSession(spark, warehouse=wh)
    db.execute_string_stmt("CREATE TABLE t (a INT)")
    db.execute_string_stmt("BEGIN")
    db.execute_string_stmt("INSERT INTO t VALUES (1)")
    db.execute_string_stmt("SAVEPOINT s")
    db.execute_string_stmt("INSERT INTO t VALUES (2)")
    db.execute_string_stmt("ROLLBACK TO s")
    db.execute_string_stmt("INSERT INTO t VALUES (3)")
    db.execute_string_stmt("RELEASE s")
    db.execute_string_stmt("COMMIT")
    # savepoint-started tx committed by RELEASE journals too
    db.execute_string_stmt("SAVEPOINT outer_sp")
    db.execute_string_stmt("INSERT INTO t VALUES (4)")
    db.execute_string_stmt("RELEASE outer_sp")
    # abandoned savepoint-started tx journals nothing
    db.execute_string_stmt("SAVEPOINT gone")
    db.execute_string_stmt("INSERT INTO t VALUES (99)")
    want = '[{"columns":["a"],"types":["integer"],"values":[[1],[3],[4]]}]'
    db.close()

    replayed = DustSession.replay(os.path.join(wh, "journal.jsonl"), spark)
    assert rows_to_json(replayed.query_string_stmt("SELECT a FROM t ORDER BY a")) == want
    replayed.close()


def test_view_ddl_sqlite_differential(db):
    """View DDL parity: IF NOT EXISTS, duplicate-name errors (both
    directions, table vs view), explicit view column lists renaming the
    select positionally, and DML on a view erroring with SQLite's
    'cannot modify v because it is a view'."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    stmts = [
        "CREATE TABLE vt (a INT, b INT)",
        "INSERT INTO vt VALUES (1, 2)",
        "CREATE VIEW vw1 AS SELECT a FROM vt",
        "CREATE VIEW IF NOT EXISTS vw1 AS SELECT b FROM vt",
        "CREATE VIEW vw1 AS SELECT b FROM vt",  # view vw1 already exists
        "CREATE VIEW vt AS SELECT 1",  # table vt already exists
        "CREATE TABLE vw1 (x INT)",  # view vw1 already exists
        "CREATE VIEW vw2(x, y) AS SELECT a, b FROM vt",
        "INSERT INTO vw1 VALUES (9)",
        "UPDATE vw1 SET a = 1",
        "DELETE FROM vw1",
    ]
    for s in stmts:
        try:
            ref.execute(s)
            ref_err = None
        except sqlite3.Error as e:
            ref_err = str(e)
        got_err = db.execute_string_stmt(s)[0].error or None
        assert got_err == ref_err, (s, ref_err, got_err)
    q = "SELECT x, y FROM vw2"
    assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
        list(r) for r in ref.execute(q).fetchall()
    ]


def test_drop_view_index_sqlite_differential(db):
    """DROP VIEW / DROP INDEX and the kind cross-checks ('use DROP
    VIEW to delete view v' and vice versa) — error strings vs sqlite3.
    Indexes are accepted-and-ignored engine-wide, so DROP INDEX
    succeeds (documented no-op posture). ALTER ADD COLUMN with a
    non-default ON UPDATE action rejects like CREATE."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    stmts = [
        "CREATE TABLE dvt (v INT)",
        "CREATE VIEW dvv AS SELECT * FROM dvt",
        "CREATE INDEX dvi ON dvt(v)",
        "DROP VIEW nope",
        "DROP TABLE dvv",
        "DROP VIEW dvt",
        "DROP INDEX dvi",
        "DROP VIEW IF EXISTS nope",
        "DROP VIEW dvv",
        "DROP TABLE IF EXISTS ghost",
    ]
    for s in stmts:
        try:
            ref.execute(s)
            ref_err = None
        except sqlite3.Error as e:
            ref_err = str(e)
        got_err = db.execute_string_stmt(s)[0].error or None
        assert got_err == ref_err, (s, ref_err, got_err)
    # ADD COLUMN with an FK action clause is legal SQLite (probed) and
    # supported since the r7 action-matrix work
    assert (
        db.execute_string_stmt(
            "ALTER TABLE dvt ADD COLUMN fk INT REFERENCES dvt ON UPDATE CASCADE"
        )[0].error
        == ""
    )


def test_strict_tables_sqlite_differential(db):
    """CREATE TABLE ... STRICT (SQLite >= 3.37): datatype whitelist at
    CREATE (exact 'unknown datatype' / 'missing datatype' strings),
    the probed write-path storage-class matrix (INTEGER takes integral
    REAL/TEXT values only, REAL takes numeric text, TEXT takes
    everything but blobs, BLOB only blobs) on INSERT and UPDATE, and
    comma-separated table options in either order."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    stmts = [
        "CREATE TABLE sst (i INTEGER, r REAL, t TEXT, b BLOB) STRICT",
        "INSERT INTO sst(i) VALUES (1.5)",  # REAL err
        "INSERT INTO sst(i) VALUES (2.0)",  # integral ok
        "INSERT INTO sst(i) VALUES ('3')",
        "INSERT INTO sst(i) VALUES ('3.7')",  # REAL err
        "INSERT INTO sst(i) VALUES ('abc')",  # TEXT err
        "INSERT INTO sst(r) VALUES (5)",
        "INSERT INTO sst(r) VALUES ('nope')",  # TEXT err
        "INSERT INTO sst(t) VALUES (5)",  # numbers stringify
        "INSERT INTO sst(b) VALUES ('text')",  # BLOB err
        "UPDATE sst SET i = 'bad' WHERE i IS NOT NULL",  # TEXT err
        "UPDATE sst SET i = i + 1 WHERE i IS NOT NULL",
        'CREATE TABLE sst2 (x FLOAT) STRICT',  # unknown datatype
        "CREATE TABLE snt (x) STRICT",  # missing datatype
        "CREATE TABLE sco (k TEXT NOT NULL PRIMARY KEY) WITHOUT ROWID, STRICT",
        "CREATE TABLE sco2 (k TEXT NOT NULL PRIMARY KEY) STRICT, WITHOUT ROWID",
    ]
    for s in stmts:
        try:
            ref.execute(s)
            ref_err = None
        except sqlite3.Error as e:
            ref_err = str(e)
        got_err = db.execute_string_stmt(s)[0].error or None
        assert got_err == ref_err, (s, ref_err, got_err)
    q = "SELECT i FROM sst WHERE i IS NOT NULL ORDER BY i"
    assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
        list(r) for r in ref.execute(q).fetchall()
    ]


def test_fk_on_delete_actions_sqlite_differential(db):
    """ON DELETE CASCADE (recursive through grandchildren and
    self-reference chains) and ON DELETE SET NULL, plus REFERENCES with
    no column list resolving to the parent PK (foreign_key_list reports
    to=NULL) — statement-by-statement vs sqlite3. ON UPDATE actions and
    SET DEFAULT are covered in
    test_fk_on_update_actions_sqlite_differential."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ref.execute("PRAGMA foreign_keys = ON")
    db.execute_string_stmt("PRAGMA foreign_keys = ON")
    stmts = [
        "CREATE TABLE ap (pk INTEGER PRIMARY KEY, v TEXT)",
        "CREATE TABLE ach (id INTEGER PRIMARY KEY, fk INT REFERENCES ap ON DELETE CASCADE)",
        "CREATE TABLE agr (id INTEGER PRIMARY KEY, cfk INT REFERENCES ach(id) ON DELETE CASCADE)",
        "CREATE TABLE asn (id INTEGER PRIMARY KEY, fk INT REFERENCES ap ON DELETE SET NULL)",
        "INSERT INTO ap VALUES (1,'v1'), (2,'v2')",
        "INSERT INTO ach VALUES (10, 1), (11, 2)",
        "INSERT INTO agr VALUES (100, 10)",
        "INSERT INTO asn VALUES (20, 1)",
        "DELETE FROM ap WHERE pk = 1",  # cascades ach(10) -> agr(100); asn nulls
        "INSERT INTO ach VALUES (12, 99)",  # dangling via implicit-PK target
        "CREATE TABLE atree (id INTEGER PRIMARY KEY, parent INT REFERENCES atree ON DELETE CASCADE)",
        "INSERT INTO atree VALUES (1, NULL), (2, 1), (3, 2), (4, 3), (5, NULL)",
        "DELETE FROM atree WHERE id = 1",  # chain 2,3,4 cascades away
    ]
    for s in stmts:
        try:
            ref.execute(s)
            ref_err = None
        except sqlite3.Error as e:
            ref_err = str(e)
        got_err = db.execute_string_stmt(s)[0].error or None
        assert (ref_err is None) == (got_err is None), (s, ref_err, got_err)
    for q in (
        "SELECT * FROM ap ORDER BY pk",
        "SELECT * FROM ach ORDER BY id",
        "SELECT * FROM agr ORDER BY id",
        "SELECT * FROM asn ORDER BY id",
        "SELECT * FROM atree ORDER BY id",
        "PRAGMA foreign_key_list(ach)",
    ):
        assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
            list(r) for r in ref.execute(q).fetchall()
        ], q
    db.execute_string_stmt("PRAGMA foreign_keys = OFF")


def test_fk_on_update_actions_sqlite_differential(db):
    """The full FK action matrix on parent-key UPDATEs (and ON DELETE
    SET DEFAULT), sqlite3-differential: CASCADE rewrites child keys to
    the new parent key (only for rows whose referenced key actually
    changed), SET NULL nulls them, SET DEFAULT rewrites to the column
    default and then re-verifies the defaulted key against the parent
    ('FOREIGN KEY constraint failed' when the default has no parent
    row), NOT NULL on the child key rejects SET NULL, actions ripple
    recursively (grandchildren via the child's own ON UPDATE FKs),
    self-referencing ON UPDATE CASCADE fixes the statement's own
    post-image, composite keys cascade member-wise, UPDATE...FROM
    drives the same actions, and cascaded child updates fire the
    child's BEFORE/AFTER UPDATE triggers with the FK columns as the
    assigned set (UPDATE OF other-columns does not fire) — all probed
    against sqlite3 3.40 (lang_foreignkeys.html; reference pass-through
    db/src/db.rs:350-376)."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ref.execute("PRAGMA foreign_keys = ON")
    db.execute_string_stmt("PRAGMA foreign_keys = ON")
    stmts = [
        "CREATE TABLE fup (id INTEGER PRIMARY KEY, v TEXT)",
        "CREATE TABLE fuc (x INT REFERENCES fup(id) ON UPDATE CASCADE "
        "ON DELETE SET DEFAULT DEFAULT 99, note TEXT)",
        "INSERT INTO fup VALUES (1,'a'), (2,'b'), (99,'z')",
        "INSERT INTO fuc VALUES (1,'c1'), (2,'c2'), (NULL,'c3')",
        "UPDATE fup SET id = 10 WHERE id = 1",  # cascades fuc c1
        "CREATE TABLE fulog (m TEXT)",
        "CREATE TRIGGER fuau AFTER UPDATE ON fuc BEGIN "
        "INSERT INTO fulog VALUES ('AU '||coalesce(old.x,'N')||'->'||coalesce(new.x,'N')); END",
        "CREATE TRIGGER fubu BEFORE UPDATE ON fuc BEGIN "
        "INSERT INTO fulog VALUES ('BU '||coalesce(old.x,'N')||'->'||coalesce(new.x,'N')); END",
        "CREATE TRIGGER fuof AFTER UPDATE OF note ON fuc BEGIN "
        "INSERT INTO fulog VALUES ('OF'); END",
        "UPDATE fup SET id = 11 WHERE id = 10",  # BU/AU fire, OF does not
        "DELETE FROM fup WHERE id = 2",  # SET DEFAULT -> 99 (exists)
        "CREATE TABLE fuc2 (x INT REFERENCES fup(id) ON DELETE SET DEFAULT DEFAULT 777)",
        "INSERT INTO fuc2 VALUES (11)",
        "DELETE FROM fup WHERE id = 11",  # default 777 has no parent -> error
        # ON UPDATE SET NULL + NOT NULL rejection
        "CREATE TABLE fsp (id INTEGER PRIMARY KEY)",
        "CREATE TABLE fsn (x INT REFERENCES fsp(id) ON UPDATE SET NULL)",
        "CREATE TABLE fsnn (x INT NOT NULL REFERENCES fsp(id) ON UPDATE SET NULL)",
        "INSERT INTO fsp VALUES (1), (2), (3)",
        "INSERT INTO fsn VALUES (1), (2)",
        "UPDATE fsp SET id = 5 WHERE id = 1",  # fsn(1) -> NULL
        "INSERT INTO fsnn VALUES (2)",
        "UPDATE fsp SET id = 6 WHERE id = 2",  # NOT NULL constraint failed
        # self-referencing ON UPDATE CASCADE
        "CREATE TABLE ftree (id INTEGER PRIMARY KEY, par INT REFERENCES ftree(id) ON UPDATE CASCADE)",
        "INSERT INTO ftree VALUES (1,NULL), (2,1), (3,2)",
        "UPDATE ftree SET id = 10 WHERE id = 1",  # (2,1) follows to (2,10)
        # two-level ripple through a UNIQUE middle table
        "CREATE TABLE fgp (g INTEGER PRIMARY KEY)",
        "CREATE TABLE fmid (pid INTEGER UNIQUE REFERENCES fgp(g) ON UPDATE CASCADE, tag TEXT)",
        "CREATE TABLE fleaf (y INT REFERENCES fmid(pid) ON UPDATE CASCADE)",
        "INSERT INTO fgp VALUES (1), (2)",
        "INSERT INTO fmid VALUES (1,'a'), (2,'b')",
        "INSERT INTO fleaf VALUES (1), (1), (2)",
        "UPDATE fgp SET g = 100 WHERE g = 1",  # fmid then fleaf follow
        # composite ON UPDATE CASCADE, member-wise
        "CREATE TABLE fcp (a INT, b INT, v TEXT, PRIMARY KEY (a, b))",
        "CREATE TABLE fcc (x INT, y INT, FOREIGN KEY (x, y) REFERENCES fcp(a, b) ON UPDATE CASCADE)",
        "INSERT INTO fcp VALUES (1,10,'r1'), (2,20,'r2')",
        "INSERT INTO fcc VALUES (1,10), (2,20), (1,NULL)",
        "UPDATE fcp SET a = 5, b = 50 WHERE a = 1",  # (1,10)->(5,50); (1,NULL) exempt
        # UPDATE ... FROM driving a cascade
        "CREATE TABLE fusrc (src INT, dst INT)",
        "CREATE TABLE fuf (id INTEGER PRIMARY KEY)",
        "CREATE TABLE fufc (z INT REFERENCES fuf(id) ON UPDATE CASCADE)",
        "INSERT INTO fuf VALUES (1), (2)",
        "INSERT INTO fusrc VALUES (1, 7)",
        "INSERT INTO fufc VALUES (1), (2)",
        "UPDATE fuf SET id = fusrc.dst FROM fusrc WHERE fuf.id = fusrc.src",
    ]
    for s in stmts:
        try:
            ref.execute(s)
            ref_err = None
        except sqlite3.Error as e:
            ref_err = str(e)
        got_err = db.execute_string_stmt(s)[0].error or None
        assert got_err == ref_err or (
            ref_err is not None and got_err is not None
        ), (s, ref_err, got_err)
    for q in (
        "SELECT * FROM fuc ORDER BY note",
        "SELECT m FROM fulog ORDER BY m",
        "SELECT * FROM fuc2",
        "SELECT * FROM fup ORDER BY id",
        "SELECT * FROM fsn ORDER BY x",
        "SELECT * FROM fsnn",
        "SELECT id, par FROM ftree ORDER BY id",
        "SELECT * FROM fmid ORDER BY tag",
        "SELECT * FROM fleaf ORDER BY y",
        "SELECT * FROM fcc ORDER BY x, y",
        "SELECT * FROM fufc ORDER BY z",
        "PRAGMA foreign_key_list(fuc)",
    ):
        assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
            list(r) for r in ref.execute(q).fetchall()
        ], q
    db.execute_string_stmt("PRAGMA foreign_keys = OFF")


def test_composite_foreign_key_sqlite_differential(db):
    """Composite FOREIGN KEY (x, y) REFERENCES p(a, b): insert-side and
    parent-delete enforcement over the full key, the match-NONE
    any-NULL exemption, and foreign_key_list's per-column rows with a
    shared id — statement-by-statement vs in-process sqlite3 (the old
    parser silently mangled the column list into one name, breaking
    every insert)."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ref.execute("PRAGMA foreign_keys = ON")
    db.execute_string_stmt("PRAGMA foreign_keys = ON")
    stmts = [
        "CREATE TABLE cfp (a INT, b INT, PRIMARY KEY (a, b))",
        "CREATE TABLE cfc (x INT, y INT, z TEXT, FOREIGN KEY (x, y) REFERENCES cfp(a, b))",
        "INSERT INTO cfp VALUES (1, 2), (3, 4)",
        "INSERT INTO cfc VALUES (1, 2, 'ok')",
        "INSERT INTO cfc VALUES (9, 9, 'dangling')",  # error both
        "INSERT INTO cfc VALUES (NULL, 5, 'nullkey')",  # match NONE: ok
        "INSERT INTO cfc VALUES (1, 4, 'crossed')",  # (1,4) not a parent key
        "DELETE FROM cfp WHERE a = 1",  # child (1,2) exists -> error
        "DELETE FROM cfp WHERE a = 3",  # no child -> ok
    ]
    for s in stmts:
        try:
            ref.execute(s)
            ref_err = None
        except sqlite3.Error as e:
            ref_err = str(e)
        got_err = db.execute_string_stmt(s)[0].error or None
        assert (ref_err is None) == (got_err is None), (s, ref_err, got_err)
        if ref_err is not None:
            assert got_err == ref_err, (s, ref_err, got_err)
    assert [list(r) for r in db.query_string_stmt("PRAGMA foreign_key_list(cfc)")[0].values] == [
        list(r) for r in ref.execute("PRAGMA foreign_key_list(cfc)").fetchall()
    ]
    db.execute_string_stmt("PRAGMA foreign_keys = OFF")


def test_multi_table_rowid_sqlite_differential(db):
    """Joins over more than one rowid table: qualified rowid resolves
    per FROM alias (wire naming sqlite3-probed: 'rowid' on implicit
    tables, the PK name on alias tables), x.* stays hidden-free, and a
    BARE rowid token errors with SQLite's exact 'no such column: rowid'
    (two rowid tables in scope make it unresolvable)."""
    import sqlite3

    from dust_spark.session import DustError

    ref = sqlite3.connect(":memory:")
    for s in (
        "CREATE TABLE ja (v TEXT)",
        "CREATE TABLE jb (w TEXT)",
        "INSERT INTO ja VALUES ('x'),('y')",
        "INSERT INTO jb VALUES ('p'),('q')",
        "CREATE TABLE jp (id INTEGER PRIMARY KEY, z TEXT)",
        "INSERT INTO jp(z) VALUES ('m'),('n')",
    ):
        ref.execute(s)
        db.execute_string_stmt(s)
    for q in (
        "SELECT ja.rowid, jb.rowid FROM ja, jb",
        "SELECT ja.rowid AS ra, jb.w FROM ja JOIN jb ON ja.rowid = jb.rowid",
        "SELECT ja.*, jb.rowid FROM ja, jb",
        "SELECT x.rowid, jp.id FROM ja AS x JOIN jp ON x.rowid = jp.rowid",
        "SELECT ja.rowid FROM ja, jb WHERE ja.rowid > jb.rowid",
    ):
        cur = ref.execute(q)
        want_cols = [d[0] for d in cur.description]
        want = sorted(map(tuple, cur.fetchall()))
        got = db.query_string_stmt(q)[0]
        assert got.columns == want_cols, (q, got.columns, want_cols)
        assert sorted(map(tuple, got.values)) == want, q
    with pytest.raises(DustError, match="no such column: rowid"):
        db.query_string_stmt("SELECT rowid FROM ja, jb")
    # ADVICE r5: an alias HIDES the base table name — 'ja.rowid' with
    # ja aliased is 'no such column: ja.rowid' in SQLite
    q = "SELECT ja.rowid FROM ja AS x, jb"
    with pytest.raises(sqlite3.OperationalError, match="no such column: ja.rowid"):
        ref.execute(q)
    with pytest.raises(DustError, match=r"no such column: ja\.rowid"):
        db.query_string_stmt(q)


def test_or_rollback_with_cte_prefix(db):
    """ADVICE r5: 'WITH ... INSERT OR ROLLBACK' (CTE-prefixed DML) must
    close the open explicit transaction on conflict, like bare INSERT
    OR ROLLBACK — differential against sqlite3."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ref.isolation_level = None
    for s in (
        "CREATE TABLE orb (id INTEGER PRIMARY KEY, v TEXT)",
        "INSERT INTO orb VALUES (1, 'a')",
        "BEGIN",
        "INSERT INTO orb VALUES (2, 'b')",
    ):
        ref.execute(s)
        r = db.execute_string_stmt(s)[0]
        assert r.error == "", (s, r.error)
    fail = "WITH src(i, w) AS (SELECT 1, 'dup') INSERT OR ROLLBACK INTO orb SELECT i, w FROM src"
    try:
        ref.execute(fail)
        ref_err = None
    except sqlite3.Error as e:
        ref_err = str(e)
    assert ref_err is not None
    got = db.execute_string_stmt(fail)[0]
    assert got.error != ""
    # the tx is CLOSED: the staged (2,'b') rolled back with it, and a
    # COMMIT now errors 'no transaction is active' on both engines
    try:
        ref.execute("COMMIT")
        ref_commit_err = None
    except sqlite3.Error as e:
        ref_commit_err = str(e)
    got_commit = db.execute_string_stmt("COMMIT")[0]
    assert (ref_commit_err is None) == (got_commit.error == "")
    q = "SELECT id, v FROM orb ORDER BY id"
    assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
        list(r) for r in ref.execute(q).fetchall()
    ]


def test_fk_cascade_partial_effects_rollback_in_tx(db):
    """ADVICE r5 statement-journal semantics: a DELETE whose FK CASCADE
    stages child-table work before a later NO ACTION constraint raises
    must leave the open explicit tx exactly as before the statement —
    differential against sqlite3 with PRAGMA foreign_keys=ON."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ref.isolation_level = None
    ref.execute("PRAGMA foreign_keys = ON")
    db.execute_string_stmt("PRAGMA foreign_keys = ON")
    stmts = [
        "CREATE TABLE par (id INTEGER PRIMARY KEY)",
        "CREATE TABLE kid_cas (id INTEGER PRIMARY KEY, pid INT "
        "REFERENCES par(id) ON DELETE CASCADE)",
        "CREATE TABLE kid_res (id INTEGER PRIMARY KEY, pid INT REFERENCES par(id))",
        "INSERT INTO par VALUES (1), (2)",
        "INSERT INTO kid_cas VALUES (10, 1), (11, 2)",
        "INSERT INTO kid_res VALUES (20, 1)",
        "BEGIN",
        "DELETE FROM par WHERE id = 2",  # cascades kid_cas(11) cleanly
    ]
    for s in stmts:
        ref.execute(s)
        r = db.execute_string_stmt(s)[0]
        assert r.error == "", (s, r.error)
    # this DELETE cascades kid_cas(10) but kid_res(20) blocks it —
    # the whole statement must roll back, keeping kid_cas(10)
    fail = "DELETE FROM par WHERE id = 1"
    try:
        ref.execute(fail)
        ref_err = None
    except sqlite3.Error as e:
        ref_err = str(e)
    got = db.execute_string_stmt(fail)[0]
    assert (ref_err is None) == (got.error == ""), (ref_err, got.error)
    ref.execute("COMMIT")
    assert db.execute_string_stmt("COMMIT")[0].error == ""
    for q in (
        "SELECT id FROM par ORDER BY id",
        "SELECT id, pid FROM kid_cas ORDER BY id",
        "SELECT id, pid FROM kid_res ORDER BY id",
    ):
        assert [list(r) for r in db.query_string_stmt(q)[0].values] == [
            list(r) for r in ref.execute(q).fetchall()
        ], q


def test_standalone_values_statement(db):
    """SQLite accepts a bare VALUES row constructor as a query and
    names the result columns column1..columnN (sqlite3-probed)."""
    out = db.query_string_stmt("VALUES (1, 'a'), (2, 'b')")[0]
    assert out.columns == ["column1", "column2"]
    assert out.values == [[1, "a"], [2, "b"]]


def test_table_xinfo_index_info_sqlite_differential(db):
    """PRAGMA table_xinfo (generated columns with hidden flag 2=VIRTUAL
    / 3=STORED; the implicit hidden rowid is not a column) and PRAGMA
    index_info (seqno/cid/name per indexed column) — row-exact against
    in-process sqlite3."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    for ddl in (
        "CREATE TABLE xt (id INTEGER PRIMARY KEY, v TEXT NOT NULL DEFAULT 'x', "
        "g INT GENERATED ALWAYS AS (id*2) VIRTUAL, "
        "s INT GENERATED ALWAYS AS (id+1) STORED, UNIQUE(v))",
        "CREATE TABLE ximp (a TEXT, b INT, UNIQUE(b, a))",
    ):
        ref.execute(ddl)
        db.execute_string_stmt(ddl)
    for q in (
        "PRAGMA table_xinfo(xt)",
        "PRAGMA table_xinfo(ximp)",
        "PRAGMA index_info(sqlite_autoindex_xt_1)",
        "PRAGMA index_info(sqlite_autoindex_ximp_1)",
        "PRAGMA index_info(no_such_index)",
        # index_xinfo: aux rowid row on rowid tables, remaining table
        # columns on WITHOUT ROWID; coll tracks declared collation
        "PRAGMA index_xinfo(sqlite_autoindex_xt_1)",
        "PRAGMA index_xinfo(sqlite_autoindex_ximp_1)",
        "PRAGMA index_xinfo(no_such_index)",
    ):
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(r) for r in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)


def test_conn_state_pragmas_sqlite_differential(db):
    """r10: informational / connection-state pragmas — get, set and
    set-form ECHO behavior (busy_timeout/locking_mode/secure_delete echo
    the new value; cache_size/synchronous/temp_store/application_id set
    silently; integrity_check is 'ok'; journal_mode pinned 'memory';
    page_size/encoding/auto_vacuum pinned post-init) all match an
    in-memory sqlite3. page_count matches on schema-only databases (the
    minimal layout; data-page growth is storage-engine-specific)."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    seq = [
        "PRAGMA integrity_check",
        "PRAGMA quick_check",
        "PRAGMA integrity_check(5)",
        "PRAGMA journal_mode",
        "PRAGMA journal_mode = WAL",
        "PRAGMA cache_size",
        "PRAGMA cache_size = 100",
        "PRAGMA cache_size",
        "PRAGMA busy_timeout",
        "PRAGMA busy_timeout = 123",
        "PRAGMA busy_timeout",
        "PRAGMA synchronous",
        "PRAGMA synchronous = 1",
        "PRAGMA synchronous",
        "PRAGMA synchronous = FULL",
        "PRAGMA synchronous",
        "PRAGMA temp_store = MEMORY",
        "PRAGMA temp_store",
        "PRAGMA application_id = 42",
        "PRAGMA application_id",
        "PRAGMA locking_mode",
        "PRAGMA locking_mode = exclusive",
        "PRAGMA locking_mode",
        "PRAGMA secure_delete",
        "PRAGMA secure_delete = 0",
        "PRAGMA secure_delete",
        "PRAGMA page_size",
        "PRAGMA page_size = 8192",
        "PRAGMA page_size",
        "PRAGMA encoding",
        "PRAGMA auto_vacuum = 1",
        "PRAGMA auto_vacuum",
        "PRAGMA freelist_count",
        "PRAGMA wal_checkpoint",
        "PRAGMA wal_checkpoint(TRUNCATE)",
        # r11 (ADVICE): call-form sets == assignment; quoted values
        # accepted; integer values parse by the no-whitespace-skip
        # sign+digit prefix; invalid journal/locking modes echo the
        # stored mode; synchronous follows getSafetyLevel's
        # ((v+1)&7 or 1) mask; temp_store keys off the first char;
        # secure_delete knows 'fast'; busy_timeout clamps negatives
        "PRAGMA busy_timeout(456)",
        "PRAGMA busy_timeout",
        "PRAGMA cache_size(250)",
        "PRAGMA cache_size",
        "PRAGMA cache_size='500'",
        "PRAGMA cache_size",
        "PRAGMA cache_size='abc'",
        "PRAGMA cache_size",
        "PRAGMA cache_size=12.7",
        "PRAGMA cache_size",
        "PRAGMA busy_timeout='9x'",
        "PRAGMA busy_timeout",
        "PRAGMA busy_timeout=-5",
        "PRAGMA busy_timeout",
        "PRAGMA journal_mode=bogus",
        "PRAGMA journal_mode",
        "PRAGMA locking_mode=bogus",
        "PRAGMA locking_mode",
        "PRAGMA locking_mode(normal)",
        "PRAGMA locking_mode",
        "PRAGMA locking_mode=bogus",
        "PRAGMA synchronous(2)",
        "PRAGMA synchronous",
        "PRAGMA synchronous='extra'",
        "PRAGMA synchronous",
        "PRAGMA synchronous=99",
        "PRAGMA synchronous",
        "PRAGMA synchronous=7",
        "PRAGMA synchronous",
        "PRAGMA synchronous=5",
        "PRAGMA synchronous",
        "PRAGMA synchronous=-1",
        "PRAGMA synchronous",
        "PRAGMA synchronous='2x'",
        "PRAGMA synchronous",
        "PRAGMA temp_store(1)",
        "PRAGMA temp_store",
        "PRAGMA temp_store=2.9",
        "PRAGMA temp_store",
        "PRAGMA temp_store=9",
        "PRAGMA temp_store",
        "PRAGMA temp_store='junk'",
        "PRAGMA temp_store",
        "PRAGMA application_id(7)",
        "PRAGMA application_id",
        "PRAGMA application_id='abc'",
        "PRAGMA application_id",
        "PRAGMA application_id=4.9",
        "PRAGMA application_id",
        "PRAGMA secure_delete(1)",
        "PRAGMA secure_delete",
        "PRAGMA secure_delete='fast'",
        "PRAGMA secure_delete",
        "PRAGMA secure_delete='abc'",
        "PRAGMA secure_delete",
        "PRAGMA user_version(5)",
        "PRAGMA user_version",
        "PRAGMA user_version='7y'",
        "PRAGMA user_version",
        "PRAGMA user_version='abc'",
        "PRAGMA user_version",
        "PRAGMA user_version=-3",
        "PRAGMA user_version",
        "PRAGMA foreign_keys(ON)",
        "PRAGMA foreign_keys",
        "PRAGMA foreign_keys='2'",
        "PRAGMA foreign_keys",
        "PRAGMA foreign_keys=0",
        "PRAGMA foreign_keys",
        "PRAGMA recursive_triggers(1)",
        "PRAGMA recursive_triggers",
        "PRAGMA recursive_triggers=off",
        "PRAGMA recursive_triggers",
    ]
    for q in seq:
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(v) for v in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)
    # page_count reports the minimal layout (1 schema page + 1 per
    # table; 0 before any schema) — self-consistent check only: the
    # absolute number is state-dependent in SQLite (any header write
    # initializes page 1) and data growth is storage-engine-specific
    n0 = db.query_string_stmt("PRAGMA page_count")[0].values[0][0]
    db.execute_string_stmt("CREATE TABLE pct1 (a INT)")
    n1 = db.query_string_stmt("PRAGMA page_count")[0].values[0][0]
    assert n1 == (n0 + 1 if n0 else 2)
    db.execute_string_stmt("DROP TABLE pct1")
    ref.close()


def test_static_fold_in_order_by_not_positional(db):
    """r11 order-by machine find: Spark resolves integer literals in
    ORDER BY/GROUP BY positionally EVEN THROUGH PARENS, so a chain that
    folds statically there (2/2 -> 1) must render as bigint(N), never
    (N) — SQLite treats only a BARE integer as an ordinal, an
    expression is a constant sort key."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ddl = "CREATE TABLE obp (id INTEGER PRIMARY KEY, v INTEGER)"
    ref.execute(ddl)
    db.execute_string_stmt(ddl)
    for i, v in [(1, 5), (2, 3), (3, 9)]:
        ref.execute(f"INSERT INTO obp VALUES ({i}, {v})")
        db.execute_string_stmt(f"INSERT INTO obp VALUES ({i}, {v})")
    for q in [
        "SELECT id FROM obp ORDER BY 2 / 2 DESC, id",
        "SELECT id FROM obp ORDER BY 1 + 1 DESC, id",
        "SELECT id, v FROM obp ORDER BY (2 / 2), v",
        "SELECT v, count(*) AS n FROM obp GROUP BY v, 1 + 1 ORDER BY v",
        "SELECT v, id FROM obp ORDER BY 2, v",  # bare ordinal stays positional
    ]:
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(r) for r in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)
    db.execute_string_stmt("DROP TABLE obp")
    ref.close()


def test_having_truthiness_sqlite_differential(db):
    """r11 HAVING battery: HAVING bodies wrap PROACTIVELY (Spark
    silently CAST-coerces a string having-condition to boolean instead
    of raising, so the FILTER_NOT_BOOLEAN retry can never fire), and
    aggregate calls carry their argument's storage class (min/max of a
    TEXT column is TEXT, sum of INT/REAL follows the arg, avg/total
    are REAL) so chains and cross-type compares over aggregates take
    the dialect rewrites."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    ddl = "CREATE TABLE hv (id INTEGER PRIMARY KEY, g INTEGER, tx TEXT, v REAL)"
    rows = [(1, 1, "7", 2.5), (2, 1, "7abc", 0.5), (3, 2, "", 7.5),
            (4, 2, "9e1", -2.5), (5, 3, "  -3.5x", 100.0), (6, 3, None, None),
            (7, 1, "0x11", 3.0), (8, 2, "12.", 0.0)]
    ref.execute(ddl)
    ref.executemany("INSERT INTO hv VALUES (?,?,?,?)", rows)
    db.execute_string_stmt(ddl)
    for rw in rows:
        vals = ",".join(
            "NULL" if x is None else (f"'{x}'" if isinstance(x, str) else repr(x))
            for x in rw
        )
        db.execute_string_stmt(f"INSERT INTO hv VALUES ({vals})")
    for q in [
        "SELECT g, count(*) AS n FROM hv GROUP BY g HAVING count(*) ORDER BY g",
        "SELECT g, count(*) AS n FROM hv GROUP BY g HAVING count(*) - 3 ORDER BY g",
        "SELECT g, count(*) AS n FROM hv GROUP BY g HAVING n - 2 ORDER BY g",
        "SELECT g FROM hv GROUP BY g HAVING max(tx) ORDER BY g",
        "SELECT g FROM hv GROUP BY g HAVING sum(v) > '2' ORDER BY g",
        "SELECT g FROM hv GROUP BY g HAVING min(tx) / 2 ORDER BY g",
        "SELECT g FROM hv GROUP BY g HAVING 2 / 2 ORDER BY g",
        "SELECT g FROM hv GROUP BY g HAVING count(*) % 2 ORDER BY g",
        "SELECT g, group_concat(tx) AS t FROM hv GROUP BY g HAVING t LIKE '%7%' ORDER BY g",
        "SELECT g FROM hv GROUP BY g HAVING avg(v) ORDER BY g",
        "SELECT g FROM hv GROUP BY g HAVING max(tx) + 1 ORDER BY g",
        "SELECT g FROM hv GROUP BY g HAVING NOT (count(*) - 3) ORDER BY g",
        "SELECT g FROM hv GROUP BY g HAVING count(*) > 2 AND max(tx) ORDER BY g",
        "SELECT g FROM hv GROUP BY g HAVING count(*) = 3 ORDER BY g",
        "SELECT g, max(tx) / 2 AS d FROM hv GROUP BY g ORDER BY g",
        "SELECT g, sum(v) % 2 AS m FROM hv GROUP BY g ORDER BY g",
        "SELECT min(tx) + 1 AS s FROM hv",
    ]:
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(r) for r in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)
    db.execute_string_stmt("DROP TABLE hv")
    ref.close()


def test_mixed_union_table_columns_sqlite_differential(spark):
    """r12 (verdict #6): the mixed_unions flag routes compounds over
    TABLE columns with disagreeing arm types through the per-row
    combination machinery — per-row storage classes, (class, value)
    dedup keys, TEXT∪BLOB arms, ORDER BY merge plan — all compared
    against sqlite3. Flag OFF keeps the Spark path (documented
    divergence unchanged)."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    s = DustSession(spark, mixed_unions=True)
    try:
        for ddl in (
            "CREATE TABLE ma (v INTEGER)",
            "CREATE TABLE mb (v TEXT)",
            "CREATE TABLE mc (v REAL)",
            "CREATE TABLE md (v BLOB)",
        ):
            ref.execute(ddl)
            s.execute_string_stmt(ddl)
        for stmt in (
            "INSERT INTO ma VALUES (1), (2), (3)",
            "INSERT INTO mb VALUES ('1'), ('x'), ('2')",
            "INSERT INTO mc VALUES (1.0), (2.5)",
            "INSERT INTO md VALUES (X'31'), (X'FF')",
        ):
            ref.execute(stmt)
            s.execute_string_stmt(stmt)
        cases = [
            # row-count-level divergence class: int arm ∪ text arm
            "SELECT v FROM ma UNION SELECT v FROM mb",
            "SELECT v FROM ma UNION ALL SELECT v FROM mb",
            "SELECT v FROM ma INTERSECT SELECT v FROM mb",
            "SELECT v FROM ma EXCEPT SELECT v FROM mc",
            "SELECT v FROM ma UNION SELECT v FROM mc",
            # TEXT ∪ BLOB: Spark has no common type at all
            "SELECT v FROM mb UNION SELECT v FROM md",
            "SELECT v FROM ma UNION SELECT v FROM md ORDER BY v",
            "SELECT v FROM ma UNION SELECT v FROM mb ORDER BY v DESC LIMIT 3",
            "SELECT v FROM ma UNION SELECT v FROM mb ORDER BY 1 LIMIT 2 OFFSET 1",
            "SELECT v FROM mc UNION SELECT v FROM ma UNION ALL SELECT v FROM mb",
            "SELECT v AS w FROM ma UNION SELECT v FROM mb ORDER BY w",
        ]
        for q in cases:
            # blob cells wire as base16 text (the repo's fix for the
            # reference's Blob→Null TODO) — render sqlite's bytes the
            # same way; classes/order are compared via position
            want = [
                v.hex() if isinstance(v, bytes) else v
                for v in (r[0] for r in ref.execute(q).fetchall())
            ]
            got = [r[0] for r in s.query_string_stmt(q)[0].values]
            assert got == want, f"{q}: spark={got!r} sqlite={want!r}"
        # same-type arms stay on the Spark path (the fallback contract)
        q = "SELECT v FROM ma UNION SELECT v+10 FROM ma ORDER BY v"
        want = [r[0] for r in ref.execute(q).fetchall()]
        got = [r[0] for r in s.query_string_stmt(q)[0].values]
        assert got == want
    finally:
        s.close()
        ref.close()


def test_mixed_union_default_on_with_size_gate(spark):
    """r13: mixed_unions is default-ON behind a per-arm row-count gate
    (_SEQ_EXACT_ROWS): small heterogeneous compounds get SQLite's
    per-row typing through a plain DustSession(), an arm past the gate
    falls back to the Spark-native unified-type path (limit-pushed
    probe, no error)."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    s = DustSession(spark)
    try:
        assert s.mixed_unions
        for ddl in ("CREATE TABLE ga (v INTEGER)", "CREATE TABLE gb (v TEXT)"):
            ref.execute(ddl)
            s.execute_string_stmt(ddl)
        for stmt in (
            "INSERT INTO ga VALUES (1), (2), (3)",
            "INSERT INTO gb VALUES ('1'), ('x')",
        ):
            ref.execute(stmt)
            s.execute_string_stmt(stmt)
        q = "SELECT v FROM ga UNION SELECT v FROM gb"
        want = sorted(str(r[0]) for r in ref.execute(q).fetchall())
        got = sorted(str(r[0]) for r in s.query_string_stmt(q)[0].values)
        assert got == want == ["1", "1", "2", "3", "x"], got
        # shrink the gate: the 3-row arm now exceeds it → Spark-native
        # unified typing ('1' int and '1' text merge), no error
        s._SEQ_EXACT_ROWS = 2
        got2 = sorted(str(r[0]) for r in s.query_string_stmt(q)[0].values)
        assert got2 == ["1", "2", "3", "x"], got2
    finally:
        s.close()
        ref.close()


def test_dml_where_affinity_sqlite_differential(spark):
    """r12: UPDATE/DELETE WHERE strings take the same IN/BETWEEN
    expansions and column-affinity sweep as the read path
    (session._dml_condition) — probed divergences E2/E5: BETWEEN over
    a TEXT column and IN-member affinity silently kept Spark coercions
    in the DML path."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    s = DustSession(spark)
    try:
        def fresh():
            for ex in (ref.execute, s.execute_string_stmt):
                try:
                    ex("DROP TABLE dw")
                except Exception:
                    pass
                ex("CREATE TABLE dw (id INTEGER PRIMARY KEY, tx TEXT, r REAL, i INTEGER)")
                for vals in (
                    "(1,'7',2.5,9)", "(2,'7abc',0.5,-7)", "(3,'',7.5,4)",
                    "(4,'9e1',-2.5,0)", "(6,NULL,NULL,NULL)",
                ):
                    ex(f"INSERT INTO dw VALUES {vals}")

        for q in (
            "UPDATE dw SET r = 1.5 WHERE i NOT IN ('9e1')",
            "UPDATE dw SET r = 2.5 WHERE tx BETWEEN 0 AND 99",
            "DELETE FROM dw WHERE tx+1 = '1'",
            "UPDATE dw SET i = 5 WHERE tx IN (7, '9e1')",
            "DELETE FROM dw WHERE i IN ('9', 0.0)",
            "UPDATE dw SET r = 9 WHERE tx NOT BETWEEN '0' AND X'00'",
            "DELETE FROM dw WHERE i+1 BETWEEN '1' AND '10'",
            "UPDATE dw SET i = 1 WHERE tx IN (7) AND r BETWEEN 0 AND 3",
            "DELETE FROM dw WHERE id IN (1.0, '2', 3.5)",
            "UPDATE dw SET r = 0 WHERE i NOT BETWEEN -7 AND '4'",
        ):
            fresh()
            ref.execute(q)
            want = [list(rw) for rw in ref.execute("SELECT * FROM dw ORDER BY id").fetchall()]
            s.execute_string_stmt(q)
            got = [list(v) for v in s.query_string_stmt("SELECT * FROM dw ORDER BY id")[0].values]
            assert got == want, f"{q}: spark={got!r} sqlite={want!r}"
        ref.execute("DROP TABLE dw")
        s.execute_string_stmt("DROP TABLE dw")
    finally:
        s.close()
        ref.close()


def test_check_affinity_truthiness_sqlite_differential(spark):
    """r12: CHECK expressions take the DML-condition sweep (IN/BETWEEN
    affinity) AND SQLite truthiness (numeric-prefix — CHECK('abc')
    always fails; the old try_cast-to-BOOLEAN silently passed junk
    text). NULL still passes."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    s = DustSession(spark)
    try:
        cases = [
            ("CREATE TABLE k1 (i INTEGER CHECK (i IN ('1','2')))",
             ["INSERT INTO k1 VALUES (1)", "INSERT INTO k1 VALUES (3)"]),
            ("CREATE TABLE k2 (tx TEXT CHECK (tx BETWEEN 0 AND 99))",
             ["INSERT INTO k2 VALUES ('7abc')", "INSERT INTO k2 VALUES ('zz')"]),
            ("CREATE TABLE k3 (x INTEGER CHECK ('abc'))", ["INSERT INTO k3 VALUES (1)"]),
            ("CREATE TABLE k4 (x INTEGER CHECK ('1x'))", ["INSERT INTO k4 VALUES (1)"]),
            ("CREATE TABLE k5 (tx TEXT CHECK (tx IN (7, '9e1')))",
             ["INSERT INTO k5 VALUES ('7')", "INSERT INTO k5 VALUES ('90')"]),
            ("CREATE TABLE k6 (i INTEGER CHECK (i NOT IN ('9e1')))",
             ["INSERT INTO k6 VALUES (9)", "INSERT INTO k6 VALUES (90)"]),
            ("CREATE TABLE k8 (i INTEGER CHECK (i+1 IN ('1', 10)))",
             ["INSERT INTO k8 VALUES (0)", "INSERT INTO k8 VALUES (9)"]),
            ("CREATE TABLE k9 (i INTEGER CHECK (i < 5 AND 'x'))", ["INSERT INTO k9 VALUES (1)"]),
            ("CREATE TABLE k10 (i INTEGER CHECK (i < 5 OR '2x'))", ["INSERT INTO k10 VALUES (9)"]),
            ("CREATE TABLE k11 (i INTEGER CHECK (NULL))", ["INSERT INTO k11 VALUES (1)"]),
            ("CREATE TABLE k12 (i INTEGER, CHECK (i BETWEEN '1' AND '9'))",
             ["INSERT INTO k12 VALUES (5)", "INSERT INTO k12 VALUES (10)"]),
        ]
        for ddl, inserts in cases:
            ref.execute(ddl)
            s.execute_string_stmt(ddl)
            for ins in inserts:
                try:
                    ref.execute(ins)
                    want_ok = True
                except Exception:
                    want_ok = False
                resp = s.execute_string_stmt(ins)
                got_ok = not resp[0].error
                assert got_ok == want_ok, f"{ins}: engine_ok={got_ok} sqlite_ok={want_ok} err={resp[0].error}"
    finally:
        s.close()
        ref.close()


def test_write_affinity_sqlite_differential(spark):
    """r12: INSERT write affinity — numeric TEXT converts through REAL
    and stores INTEGER when lossless ('9e1' → 90; plain cast NULLed
    it); non-lossless values store NULL rather than a silently
    truncated integer (SQLite keeps them REAL under flexible typing —
    the documented typed-storage divergence); int64 values stay exact
    (no double round-trip); bare 0x hex literals parse with two's
    complement. DEFAULT expressions take the same conversion."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    s = DustSession(spark)
    try:
        ddl = "CREATE TABLE wa (i INTEGER, r REAL, t TEXT)"
        ref.execute(ddl)
        s.execute_string_stmt(ddl)
        sel = "SELECT i, typeof(i), r, typeof(r), t, typeof(t) FROM wa"
        for ins in (
            "INSERT INTO wa VALUES ('9e1', '2.5', 42)",
            "INSERT INTO wa VALUES ('90', ' 3 ', 0x11)",
            "INSERT INTO wa VALUES (2.0, 5, 2.5)",
            "INSERT INTO wa VALUES ('12.', '1e2', 99)",
            "INSERT INTO wa VALUES (9007199254740993, 1, 'a')",
            "INSERT INTO wa VALUES (9223372036854775807, 1, 'b')",
            # r13 ADVICE: integer-formed TEXT must take the exact-int64
            # branch (the double detour stored …992 / NULL here)
            "INSERT INTO wa VALUES ('9007199254740993', 1, 'c')",
            "INSERT INTO wa VALUES ('9223372036854775807', 1, 'd')",
            "INSERT INTO wa VALUES ('-9223372036854775808', 1, 'e')",
            "INSERT INTO wa VALUES (' +9007199254740993 ', 1, 'f')",
            "INSERT INTO wa VALUES ('009007199254740993', 1, 'g')",
            "INSERT INTO wa(i) VALUES (NULL)",
        ):
            ref.execute("DELETE FROM wa")
            s.execute_string_stmt("DELETE FROM wa")
            ref.execute(ins)
            want = [list(rw) for rw in ref.execute(sel).fetchall()]
            resp = s.execute_string_stmt(ins)
            assert not resp[0].error, f"{ins}: {resp[0].error}"
            got = [list(v) for v in s.query_string_stmt(sel)[0].values]
            assert got == want, f"{ins}: spark={got!r} sqlite={want!r}"
        for ddl2, ins2, sel2 in (
            ("CREATE TABLE wd (i INTEGER DEFAULT '9e1', j INTEGER)",
             "INSERT INTO wd(j) VALUES (1)", "SELECT i, typeof(i) FROM wd"),
            ("CREATE TABLE wg (i INTEGER, v INTEGER AS (i * 2))",
             "INSERT INTO wg(i) VALUES (3)", "SELECT i, v FROM wg"),
            ("CREATE TABLE wg2 (t TEXT, u TEXT AS (upper(t)))",
             "INSERT INTO wg2(t) VALUES ('ab')", "SELECT t, u FROM wg2"),
            # typed generated column with an affinity-needing expression
            # (used to DATATYPE_MISMATCH at insert — r12)
            ("CREATE TABLE wg3 (tx TEXT, flag INTEGER AS (tx IN (7, '9e1')))",
             "INSERT INTO wg3(tx) VALUES ('7'), ('90'), ('x')",
             "SELECT tx, flag FROM wg3 ORDER BY tx"),
            ("CREATE TABLE wg4 (i INTEGER, v INTEGER AS (i + '1x'))",
             "INSERT INTO wg4(i) VALUES (1), (5)", "SELECT i, v FROM wg4 ORDER BY i"),
        ):
            ref.execute(ddl2)
            s.execute_string_stmt(ddl2)
            ref.execute(ins2)
            resp = s.execute_string_stmt(ins2)
            assert not resp[0].error, f"{ins2}: {resp[0].error}"
            want = [list(rw) for rw in ref.execute(sel2).fetchall()]
            got = [list(v) for v in s.query_string_stmt(sel2)[0].values]
            assert got == want, f"{sel2}: spark={got!r} sqlite={want!r}"
    finally:
        s.close()
        ref.close()


def test_update_set_write_affinity_sqlite_differential(spark):
    """r12: UPDATE SET values take the write-affinity conversion via
    _affine_cast_sql — '9e1' stores 90; the conversion wraps the SET
    expression INSIDE the update CASE branch (wrapping the whole CASE
    let Spark unify string+bigint to DOUBLE and corrupted int64 values
    on UNassigned rows — the probe's nastiest find)."""
    import sqlite3

    ref = sqlite3.connect(":memory:")
    s = DustSession(spark)
    try:
        ddl = "CREATE TABLE us (k INTEGER PRIMARY KEY, i INTEGER, t TEXT)"
        ref.execute(ddl)
        s.execute_string_stmt(ddl)
        seed = "INSERT INTO us VALUES (1, 5, 'x'), (2, 9007199254740993, 'y')"
        ref.execute(seed)
        s.execute_string_stmt(seed)
        sel = "SELECT k, i, typeof(i), t FROM us ORDER BY k"
        for q in (
            "UPDATE us SET i = '9e1' WHERE k = 1",
            "UPDATE us SET i = 2.0 WHERE k = 1",
            "UPDATE us SET t = 77 WHERE k = 1",
            "UPDATE us SET i = t WHERE k = 1",
            "UPDATE us SET i = i + 1 WHERE k = 2",
            "UPDATE us SET i = 9223372036854775807 WHERE k = 1",
            "UPDATE us SET i = '9007199254740993' WHERE k = 1",
            "UPDATE us SET i = ' +9223372036854775807 ' WHERE k = 1",
            "UPDATE us SET i = ' 42 ' WHERE k = 1",
            "UPDATE us SET i = NULL WHERE k = 1",
        ):
            ref.execute(q)
            want = [list(rw) for rw in ref.execute(sel).fetchall()]
            r = s.execute_string_stmt(q)
            assert not r[0].error, f"{q}: {r[0].error}"
            got = [list(v) for v in s.query_string_stmt(sel)[0].values]
            assert got == want, f"{q}: spark={got!r} sqlite={want!r}"
    finally:
        s.close()
        ref.close()
