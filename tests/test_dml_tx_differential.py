"""Combined DML x transaction differential machine: hypothesis drives
random sequences mixing implicit-rowid inserts, explicit-rowid inserts,
REPLACE, ON CONFLICT upserts, UPDATE/DELETE, and the full transaction
alphabet (BEGIN/COMMIT/ROLLBACK/SAVEPOINT/RELEASE/ROLLBACK TO) against
DustSession AND in-process sqlite3. After every statement both engines
must agree on error presence/text and the full visible state including
rowids — probing the INTERACTIONS (rowid reuse across savepoint
rollbacks, upserts on staged state, REPLACE inside nested savepoints)
that the per-feature differential tests cover only pairwise."""

from __future__ import annotations

import sqlite3

from hypothesis import HealthCheck, given, settings

from tests._budget import examples
from hypothesis import strategies as st

from dust_spark import DustSession

_V = st.integers(0, 9)
_ID = st.integers(1, 6)

_OPS = st.one_of(
    st.just("BEGIN"),
    st.just("COMMIT"),
    st.just("ROLLBACK"),
    st.just("SAVEPOINT sp"),
    st.just("RELEASE sp"),
    st.just("ROLLBACK TO sp"),
    _V.map(lambda v: f"INSERT INTO t(v) VALUES ({v})"),
    st.tuples(_ID, _V).map(lambda x: f"INSERT INTO t(id, v) VALUES ({x[0]}, {x[1]})"),
    st.tuples(_ID, _V).map(lambda x: f"REPLACE INTO t(id, v) VALUES ({x[0]}, {x[1]})"),
    st.tuples(_ID, _V).map(
        lambda x: f"INSERT INTO t(id, v) VALUES ({x[0]}, {x[1]}) "
        f"ON CONFLICT(id) DO UPDATE SET v = v + excluded.v"
    ),
    st.tuples(_ID, _V).map(
        lambda x: f"INSERT INTO t(id, v) VALUES ({x[0]}, {x[1]}) ON CONFLICT DO NOTHING"
    ),
    _V.map(lambda v: f"UPDATE t SET v = v + 1 WHERE v < {v}"),
    _V.map(lambda v: f"DELETE FROM t WHERE v = {v}"),
    _ID.map(lambda i: f"DELETE FROM t WHERE id = {i}"),
)


@settings(
    max_examples=examples(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_OPS, min_size=5, max_size=16))
def test_dml_tx_machine_matches_sqlite(spark, ops):
    ref = sqlite3.connect(":memory:")
    ref.isolation_level = None
    db = DustSession(spark)
    try:
        ddl = "CREATE TABLE t (id INTEGER PRIMARY KEY, v INT)"
        ref.execute(ddl)
        assert db.execute_string_stmt(ddl)[0].error == ""
        for op in ops:
            try:
                ref.execute(op)
                werr = None
            except sqlite3.Error as e:
                werr = str(e)
            got = db.execute_string_stmt(op)[0]
            gerr = got.error or None
            assert (werr is None) == (gerr is None), (ops, op, werr, gerr)
            if werr is not None:
                assert gerr == werr, (ops, op, werr, gerr)
            q = "SELECT id, v FROM t ORDER BY id"
            want = [list(r) for r in ref.execute(q).fetchall()]
            have = [list(r) for r in db.query_string_stmt(q)[0].values]
            assert have == want, (ops, op, have, want)
        # rowid continuation after the whole sequence: one more
        # auto-assigned insert must pick the same id on both engines
        try:
            ref.execute("INSERT INTO t(v) VALUES (99)")
            db.execute_string_stmt("INSERT INTO t(v) VALUES (99)")
            q = "SELECT id, v FROM t ORDER BY id"
            want = [list(r) for r in ref.execute(q).fetchall()]
            have = [list(r) for r in db.query_string_stmt(q)[0].values]
            assert have == want, (ops, "final insert", have, want)
        except sqlite3.Error:
            pass
    finally:
        db.close()
        ref.close()
