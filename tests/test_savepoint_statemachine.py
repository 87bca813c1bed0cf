"""Differential transaction state machine: hypothesis drives random
sequences of BEGIN / COMMIT / ROLLBACK / SAVEPOINT / RELEASE /
ROLLBACK TO interleaved with DML against DustSession AND in-process
sqlite3 (the live model). After every statement both engines must agree
on error-presence, error text, and the full visible table state —
including reads inside open transactions (staged rows) and after
savepoint rollbacks. This probes the r6 savepoint machinery (overlay
snapshot stack, RELEASE-of-opener commits, journal checkpoints)
between the hand-written differential tests."""

from __future__ import annotations

import sqlite3

from hypothesis import HealthCheck, given, settings

from tests._budget import examples
from hypothesis import strategies as st

from dust_spark import DustSession

_OPS = st.one_of(
    st.just("BEGIN"),
    st.just("COMMIT"),
    st.just("ROLLBACK"),
    st.sampled_from(["SAVEPOINT s0", "SAVEPOINT s1"]),
    st.sampled_from(["RELEASE s0", "RELEASE s1"]),
    st.sampled_from(["ROLLBACK TO s0", "ROLLBACK TO s1"]),
    st.integers(0, 30).map(lambda v: f"INSERT INTO t VALUES ({v})"),
    st.integers(0, 30).map(lambda v: f"DELETE FROM t WHERE a = {v}"),
    st.integers(0, 30).map(lambda v: f"UPDATE t SET a = a + 1 WHERE a < {v}"),
)


@settings(
    max_examples=examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_OPS, min_size=4, max_size=18))
def test_tx_statemachine_matches_sqlite(spark, ops):
    ref = sqlite3.connect(":memory:")
    ref.isolation_level = None
    db = DustSession(spark)
    try:
        ref.execute("CREATE TABLE t (a INT)")
        assert db.execute_string_stmt("CREATE TABLE t (a INT)")[0].error == ""
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
            want = [r[0] for r in ref.execute("SELECT a FROM t ORDER BY a")]
            have = [r[0] for r in db.query_string_stmt("SELECT a FROM t ORDER BY a")[0].values]
            assert have == want, (ops, op, have, want)
    finally:
        db.close()
        ref.close()
