"""CREATE TRIGGER — sqlite3-differential (r7; closes the documented
exclusion from rounds 1–6).  The reference delegates its whole SQL
surface to SQLite (db/src/db.rs:176,278), so sqlite3's own behavior is
the oracle: firing order (REVERSE creation — probed), per-row bodies in
statement order, WHEN clauses, UPDATE OF column lists, NEW./OLD.
references incl. rowid, RAISE(ABORT) statement atomicity, DROP TABLE
cascade, sqlite_master rows, total_changes accounting, and disk-mode
persistence of the trigger catalog.

Documented scope limits (COVERAGE.md): INSTEAD OF view triggers and
RAISE(IGNORE) reject loudly; upsert (ON CONFLICT DO) and UPDATE...FROM
do not fire triggers; a trigger body that READS its own table during a
multi-row statement sees the batch-applied state (SQLite interleaves
row-at-a-time) — single-row statements match exactly.
"""

from __future__ import annotations

import sqlite3

import pytest

from dust_spark import DustSession
from dust_spark.session import DustError


@pytest.fixture()
def pair(spark):
    db = DustSession(spark)
    ref = sqlite3.connect(":memory:")
    yield db, ref
    db.close()
    ref.close()


def run_both(db, ref, *stmts):
    for s in stmts:
        ref.execute(s)
        db.execute_string_stmt(s)


def q_both(db, ref, sql):
    want = [list(r) for r in ref.execute(sql).fetchall()]
    got = [list(r) for r in db.query_string_stmt(sql)[0].values]
    assert got == want, (sql, got, want)


def test_trigger_audit_trail_differential(pair):
    db, ref = pair
    run_both(
        db,
        ref,
        "CREATE TABLE t (id INTEGER PRIMARY KEY, v INTEGER, s TEXT)",
        "CREATE TABLE audit (op TEXT, rid INTEGER, oldv INTEGER, newv INTEGER)",
        "CREATE TRIGGER t_ai AFTER INSERT ON t BEGIN "
        "INSERT INTO audit VALUES ('I', NEW.id, NULL, NEW.v); END",
        "CREATE TRIGGER t_au AFTER UPDATE OF v ON t WHEN OLD.v <> NEW.v BEGIN "
        "INSERT INTO audit VALUES ('U', NEW.id, OLD.v, NEW.v); END",
        "CREATE TRIGGER t_ad BEFORE DELETE ON t BEGIN "
        "INSERT INTO audit VALUES ('D', OLD.id, OLD.v, NULL); END",
        "INSERT INTO t(v, s) VALUES (10, 'a'), (20, 'b'), (30, 'c')",
        "UPDATE t SET v = v + 1 WHERE v >= 20",
        "UPDATE t SET s = 'zz' WHERE id = 1",  # OF v: must not fire
        "UPDATE t SET v = v WHERE id = 1",  # WHEN OLD<>NEW: must not fire
        "DELETE FROM t WHERE id = 2",
    )
    q_both(db, ref, "SELECT op, rid, oldv, newv FROM audit ORDER BY rowid")
    q_both(db, ref, "SELECT id, v, s FROM t ORDER BY id")
    q_both(db, ref, "SELECT name, tbl_name FROM sqlite_master WHERE type='trigger' ORDER BY name")


def test_trigger_firing_order_reverse_creation(pair):
    db, ref = pair
    run_both(
        db,
        ref,
        "CREATE TABLE t (a INTEGER)",
        "CREATE TABLE log (m TEXT)",
        "CREATE TRIGGER z1 AFTER INSERT ON t BEGIN INSERT INTO log VALUES ('z1'); END",
        "CREATE TRIGGER a1 AFTER INSERT ON t BEGIN INSERT INTO log VALUES ('a1'); END",
        "INSERT INTO t VALUES (9), (10)",
    )
    # probed: a1 fires first (reverse creation), per row
    q_both(db, ref, "SELECT rowid, m FROM log ORDER BY rowid")


def test_trigger_raise_abort_statement_atomicity(pair):
    db, ref = pair
    run_both(
        db,
        ref,
        "CREATE TABLE t (id INTEGER PRIMARY KEY, v INTEGER)",
        "CREATE TABLE side (x INTEGER)",
        "CREATE TRIGGER guard BEFORE INSERT ON t WHEN NEW.v < 0 BEGIN "
        "INSERT INTO side VALUES (NEW.v); "
        "SELECT RAISE(ABORT, 'negative v'); END",
        "INSERT INTO t(v) VALUES (5)",
    )
    with pytest.raises(sqlite3.IntegrityError, match="negative v"):
        ref.execute("INSERT INTO t(v) VALUES (1), (-2), (3)")
    rs = db.execute_string_stmt("INSERT INTO t(v) VALUES (1), (-2), (3)")
    assert rs[0].error == "negative v"
    # the aborted statement left NOTHING behind — not even the side
    # insert its own body staged before raising
    q_both(db, ref, "SELECT count(*) FROM t")
    q_both(db, ref, "SELECT count(*) FROM side")


def test_trigger_new_old_reference_errors(pair):
    db, ref = pair
    run_both(
        db,
        ref,
        "CREATE TABLE t (a INTEGER)",
        # both accepted at CREATE time (SQLite validates lazily, probed)
        "CREATE TRIGGER bad AFTER INSERT ON t BEGIN SELECT NEW.nope; END",
    )
    with pytest.raises(sqlite3.OperationalError, match="no such column: NEW.nope"):
        ref.execute("INSERT INTO t VALUES (1)")
    rs = db.execute_string_stmt("INSERT INTO t VALUES (1)")
    assert rs[0].error == "no such column: NEW.nope"
    run_both(db, ref, "DROP TRIGGER bad",
             "CREATE TRIGGER bad2 AFTER DELETE ON t BEGIN SELECT NEW.a; END",
             "INSERT INTO t VALUES (1)")
    with pytest.raises(sqlite3.OperationalError, match="no such column: NEW.a"):
        ref.execute("DELETE FROM t")
    rs = db.execute_string_stmt("DELETE FROM t")
    assert rs[0].error == "no such column: NEW.a"


def test_trigger_rowid_refs_on_implicit_table(pair):
    db, ref = pair
    run_both(
        db,
        ref,
        "CREATE TABLE t (v TEXT)",  # implicit rowid
        "CREATE TABLE log (rid INTEGER, v TEXT)",
        "CREATE TRIGGER tr AFTER INSERT ON t BEGIN "
        "INSERT INTO log VALUES (NEW.rowid, NEW.v); END",
        "INSERT INTO t VALUES ('x'), ('y')",
        "INSERT INTO t VALUES ('z')",
    )
    q_both(db, ref, "SELECT rid, v FROM log ORDER BY rid")


def test_trigger_ddl_errors_differential(pair):
    db, ref = pair
    run_both(db, ref, "CREATE TABLE t (a INTEGER)",
             "CREATE VIEW vw AS SELECT * FROM t",
             "CREATE TRIGGER tr AFTER INSERT ON t BEGIN SELECT 1; END")
    cases = [
        "CREATE TRIGGER tr AFTER INSERT ON t BEGIN SELECT 1; END",
        "CREATE TRIGGER t2 AFTER INSERT ON missing BEGIN SELECT 1; END",
        "CREATE TRIGGER t3 AFTER INSERT ON vw BEGIN SELECT 1; END",
        "CREATE TRIGGER t4 INSTEAD OF INSERT ON t BEGIN SELECT 1; END",
        "DROP TRIGGER missing_trig",
    ]
    for sql in cases:
        try:
            ref.execute(sql)
            want = None
        except Exception as e:  # noqa: BLE001
            want = str(e)
        try:
            db.execute_string_stmt(sql)
            # execute_string_stmt surfaces errors in the response
            got_resp = db.execute_string_stmt("SELECT 1") and None
        except DustError as e:
            got_resp = str(e)
        rs = db.execute_string_stmt(sql)
        got = rs[0].error
        assert got == want, (sql, got, want)
    # IF NOT EXISTS duplicate is a no-op in both
    run_both(db, ref, "CREATE TRIGGER IF NOT EXISTS tr AFTER INSERT ON t BEGIN SELECT 2; END")
    # DROP TRIGGER IF EXISTS missing is fine
    run_both(db, ref, "DROP TRIGGER IF EXISTS missing_trig")


def test_drop_table_cascades_triggers(pair):
    db, ref = pair
    run_both(
        db,
        ref,
        "CREATE TABLE t (a INTEGER)",
        "CREATE TRIGGER tr AFTER INSERT ON t BEGIN SELECT 1; END",
        "DROP TABLE t",
    )
    q_both(db, ref, "SELECT count(*) FROM sqlite_master WHERE type='trigger'")
    # recreating the table does NOT resurrect the trigger; the name is free
    run_both(db, ref, "CREATE TABLE t (a INTEGER)",
             "CREATE TRIGGER tr AFTER INSERT ON t BEGIN SELECT 1; END")
    q_both(db, ref, "SELECT name FROM sqlite_master WHERE type='trigger'")


def test_trigger_total_changes_accounting(pair):
    db, ref = pair
    run_both(
        db,
        ref,
        "CREATE TABLE t (a INTEGER)",
        "CREATE TABLE log (m TEXT)",
        "CREATE TRIGGER tr AFTER INSERT ON t BEGIN "
        "INSERT INTO log VALUES ('x'); INSERT INTO log VALUES ('y'); END",
        "INSERT INTO t VALUES (1), (2)",
    )
    # outer changes() = 2; total_changes = 2 outer + 4 trigger rows
    q_both(db, ref, "SELECT changes(), total_changes()")


def test_trigger_in_transaction_rollback(pair):
    db, ref = pair
    run_both(
        db,
        ref,
        "CREATE TABLE t (a INTEGER)",
        "CREATE TABLE log (m TEXT)",
        "CREATE TRIGGER tr AFTER INSERT ON t BEGIN INSERT INTO log VALUES ('x'); END",
        "BEGIN",
        "INSERT INTO t VALUES (1)",
        "ROLLBACK",
    )
    q_both(db, ref, "SELECT count(*) FROM t")
    q_both(db, ref, "SELECT count(*) FROM log")
    run_both(db, ref, "BEGIN", "INSERT INTO t VALUES (2)", "COMMIT")
    q_both(db, ref, "SELECT count(*) FROM t")
    q_both(db, ref, "SELECT count(*) FROM log")


def test_trigger_cascading_other_table_updates(pair):
    db, ref = pair
    run_both(
        db,
        ref,
        "CREATE TABLE orders_t (id INTEGER PRIMARY KEY, qty INTEGER)",
        "CREATE TABLE stock (n INTEGER)",
        "INSERT INTO stock VALUES (100)",
        "CREATE TRIGGER dec_stock AFTER INSERT ON orders_t BEGIN "
        "UPDATE stock SET n = n - NEW.qty; END",
        "CREATE TRIGGER inc_stock AFTER DELETE ON orders_t BEGIN "
        "UPDATE stock SET n = n + OLD.qty; END",
        "INSERT INTO orders_t(qty) VALUES (3), (5), (7)",
        "DELETE FROM orders_t WHERE qty = 5",
    )
    q_both(db, ref, "SELECT n FROM stock")


def test_trigger_persists_across_disk_reopen(spark, tmp_path):
    wh = str(tmp_path / "wh")
    db = DustSession(spark, warehouse=wh)
    db.execute_string_stmt("CREATE TABLE t (a INTEGER)")
    db.execute_string_stmt("CREATE TABLE log (m TEXT)")
    db.execute_string_stmt(
        "CREATE TRIGGER tr AFTER INSERT ON t BEGIN INSERT INTO log VALUES ('hit'); END"
    )
    db.execute_string_stmt("INSERT INTO t VALUES (1)")
    db.close()
    db2 = DustSession(spark, warehouse=wh)
    rows = db2.query_string_stmt("SELECT name FROM sqlite_master WHERE type='trigger'")[0].values
    assert rows == [["tr"]]
    db2.execute_string_stmt("INSERT INTO t VALUES (2)")
    n = db2.query_string_stmt("SELECT count(*) FROM log")[0].values[0][0]
    assert n == 2  # one pre-reopen hit + one post-reopen hit
    db2.close()


def test_trigger_raise_ignore_rejected_loudly(pair):
    db, ref = pair
    run_both(db, ref, "CREATE TABLE t (a INTEGER)")
    rs = db.execute_string_stmt(
        "CREATE TRIGGER tr AFTER INSERT ON t BEGIN SELECT RAISE(IGNORE); END"
    )
    assert "RAISE(IGNORE)" in (rs[0].error or "")
