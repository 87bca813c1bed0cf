"""Property-based differential testing of the engine's SQLite scalar
dialect: hypothesis composes random nested expressions from the
rewritten function families (dialect.rewrite_sqlite_fns) and DustSession
must agree with an in-process sqlite3 byte-for-byte.

The generator stays inside the documented parity envelope (see
test_sqlite_fn_parity): no cross-type comparisons, no empty replace()
search strings. r9 ADDED literal division incl. TEXT operands (the
NUMERIC-prefix conversion is statically folded, so the result types
match exactly); r10 widened that to 2–4-member mixed-precedence chains
with optional parenthesized prefixes (the frag compiler). The r6
parity wave WIDENED the
envelope: month/year date steps (overflow now normalizes like SQLite),
zero/negative substr offsets and negative lengths, astral-plane char()
codepoints, decimal-literal REAL arithmetic, printf argument coercion,
row-value comparisons, and non-boolean CASE WHEN conditions are all
generated now.
"""

from __future__ import annotations

import sqlite3

import pytest
from hypothesis import HealthCheck, given, settings

from tests._budget import examples
from hypothesis import strategies as st

from dust_spark import DustSession

WORDS = ["alpha", "bravo charlie", "delta42", "Echo Foxtrot", "golf  hotel", "x"]
TRIMSETS = ["x", "ab", " ", "z"]


@st.composite
def str_exprs(draw, depth: int = 2):
    if depth == 0:
        return "'" + draw(st.sampled_from(WORDS)) + "'"
    kind = draw(st.integers(0, 7))
    if kind == 0:
        return "'" + draw(st.sampled_from(WORDS)) + "'"
    if kind == 1:
        codes = draw(
            st.lists(
                st.one_of(st.integers(65, 122), st.sampled_from([8364, 955, 128512])),
                min_size=1,
                max_size=3,
            )
        )
        return "char(" + ", ".join(map(str, codes)) + ")"
    if kind == 2:
        fn = draw(st.sampled_from(["trim", "ltrim", "rtrim"]))
        inner = draw(str_exprs(depth=depth - 1))
        if draw(st.booleans()):
            return f"{fn}({inner}, '{draw(st.sampled_from(TRIMSETS))}')"
        return f"{fn}({inner})"
    if kind == 3:
        inner = draw(str_exprs(depth=depth - 1))
        a = draw(st.sampled_from(["a", "o", "l", "x"]))
        b = draw(st.sampled_from(["", "_", "QQ"]))
        return f"replace({inner}, '{a}', '{b}')"
    if kind == 4:
        return f"quote({draw(str_exprs(depth=depth - 1))})"
    if kind == 5:
        fn = draw(st.sampled_from(["lower", "upper"]))
        return f"{fn}({draw(str_exprs(depth=depth - 1))})"
    if kind == 6:
        inner = draw(str_exprs(depth=depth - 1))
        # full func.c envelope: zero/negative starts, negative lengths
        start = draw(st.integers(-7, 7))
        n = draw(st.integers(-5, 6))
        return f"substr({inner}, {start}, {n})"
    base = draw(st.sampled_from(["'2024-01-15'", "'2023-11-30'", "'2024-02-29'", "'2024-01-31'"]))
    step = draw(st.integers(-400, 400))
    unit = draw(
        st.sampled_from(["days", "hours", "minutes", "seconds", "months", "years"])
    )
    mod = draw(st.sampled_from([f"'{step:+d} {unit}'", "'start of month'", "'start of year'"]))
    kindfn = draw(st.sampled_from(["date", "datetime"]))
    return f"{kindfn}({base}, {mod})"


@st.composite
def int_exprs(draw, depth: int = 1):
    if depth == 0:
        return str(draw(st.integers(-1000, 1000)))
    kind = draw(st.integers(0, 4))
    if kind == 0:
        return str(draw(st.integers(-1000, 1000)))
    if kind == 1:
        args = draw(st.lists(int_exprs(depth=depth - 1), min_size=2, max_size=3))
        fn = draw(st.sampled_from(["max", "min"]))
        return f"{fn}(" + ", ".join(args) + ")"
    if kind == 2:
        return f"sign({draw(int_exprs(depth=depth - 1))})"
    if kind == 3:
        return f"length({draw(str_exprs(depth=1))})"
    return f"unicode({draw(str_exprs(depth=1))})"


@st.composite
def json_exprs(draw, depth: int = 1):
    """json builders composed per SQLite's subtype rule."""
    kind = draw(st.integers(0, 2 if depth > 0 else 1))
    if kind == 0:
        vals = draw(
            st.lists(
                st.one_of(int_exprs(depth=0), str_exprs(depth=0), st.just("NULL")),
                min_size=0,
                max_size=3,
            )
        )
        return "json_array(" + ", ".join(vals) + ")"
    if kind == 1:
        n = draw(st.integers(1, 2))
        pairs = []
        for i in range(n):
            k = draw(st.sampled_from(["'a'", "'b'", "'k2'"]))
            v = draw(st.one_of(int_exprs(depth=0), str_exprs(depth=0)))
            pairs += [k, v]
        return "json_object(" + ", ".join(pairs) + ")"
    inner = draw(json_exprs(depth=depth - 1))
    return f"json_array({inner}, {draw(int_exprs(depth=0))})"


@st.composite
def scalar_exprs(draw):
    kind = draw(st.integers(0, 10))
    if kind == 10:
        # TEXT-operand arithmetic (r9 pairs, r10 CHAINS): SQLite's
        # NUMERIC-prefix conversion, statically folded for literals by
        # the dialect frag compiler — type-exact (the composed
        # int-formed condition stays a static bool for pure literals),
        # so the str() compare below holds for both int and real paths.
        # 2–4 members, mixed precedence, optional parenthesized prefix.
        pool = st.sampled_from([
            "'7'", "'007'", "' 8 '", "'7abc'", "'7.5x'", "''", "'abc'",
            "'-3'", "'+5'", "'9e1'", "'.5'", "'5.'", "'0x11'", "'inf'",
            "2", "3", "-2", "0", "'4'", "'2.0'", "2.5", "7.5",
        ])
        members = draw(st.lists(pool, min_size=2, max_size=4))
        ops = [
            draw(st.sampled_from(["/", "%", "+", "-", "*"]))
            for _ in range(len(members) - 1)
        ]
        if len(members) >= 3 and draw(st.booleans()):
            expr = f"({members[0]} {ops[0]} {members[1]})"
            rest = zip(ops[1:], members[2:])
        else:
            expr = members[0]
            rest = zip(ops, members[1:])
        for op, m in rest:
            expr += f" {op} {m}"
        return expr
    if kind == 0:
        return draw(str_exprs())
    if kind == 1:
        return draw(int_exprs())
    if kind == 2:
        pat = "".join(
            draw(st.lists(st.sampled_from(list("abcxyz*?") + ["[ab]"]), min_size=1, max_size=4))
        )
        return f"glob('{pat}', {draw(str_exprs(depth=1))})"
    if kind == 3:
        return f"typeof({draw(st.one_of(str_exprs(depth=1), int_exprs(depth=1)))})"
    if kind == 4:
        j = draw(json_exprs())
        return draw(
            st.sampled_from(
                [j, f"json_type({j})", f"json_valid({j})", f"json_array_length(json_array({j}))"]
            )
        )
    if kind == 5:
        x = draw(st.sampled_from(["2.5", "3.49", "-7.5", "0.0", "123.456"]))
        fn = draw(st.sampled_from(["round", "floor", "ceil", "trunc"]))
        return f"{fn}({x})"
    if kind == 6:
        # ASCII-only LIKE operands BY DESIGN: SQLite LIKE folds case for
        # ASCII only while the engine's ILIKE rewrite folds full Unicode
        # — a documented divergence (test_sqlite_fn_parity docstring);
        # non-ASCII operands here would flag it as a false regression
        return f"{draw(str_exprs(depth=1))} LIKE '{draw(st.sampled_from(['%A%', 'a%', '%42%', '_']))}'"
    if kind == 7:
        # printf coercion (r6): any arg type against any numeric spec
        spec = draw(st.sampled_from(["%d", "%i", "%x", "%f", "%e", "%s", "%05d", "%.2f"]))
        arg = draw(
            st.one_of(
                int_exprs(depth=1),
                str_exprs(depth=1),
                st.sampled_from(["3.7", "-2.25", "0.0"]),
            )
        )
        return f"printf('[{spec}]', {arg})"
    if kind == 8:
        # row-value comparisons (r6): member-wise/lexicographic
        op = draw(st.sampled_from(["=", "<>", "<", "<=", ">", ">="]))
        a1, a2 = draw(int_exprs(depth=0)), draw(int_exprs(depth=0))
        s1, s2 = draw(str_exprs(depth=0)), draw(str_exprs(depth=0))
        return f"({a1}, {s1}) {op} ({a2}, {s2})"
    # truthiness (r6): non-boolean searched-CASE conditions
    cond = draw(st.one_of(int_exprs(depth=1), st.sampled_from(["0", "2", "'0.5'", "'abc'"])))
    return f"CASE WHEN {cond} THEN 'y' ELSE 'n' END"


@pytest.fixture(scope="module")
def db(spark):
    s = DustSession(spark)
    yield s
    s.close()


@pytest.fixture(scope="module")
def ref():
    con = sqlite3.connect(":memory:")
    yield con
    con.close()


@settings(
    max_examples=examples(120),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(expr=scalar_exprs())
def test_scalar_expr_matches_sqlite(db, ref, expr):
    q = f"SELECT {expr} AS v"
    want = ref.execute(q).fetchone()[0]
    rs = db.query_string_stmt(q)
    got = rs[0].values[0][0] if rs and rs[0].values else None
    assert str(got) == str(want), f"{q}: spark={got!r} sqlite={want!r}"


# ---------------------------------------------------------------------------
# r10: COLUMN arithmetic chains — the frag compiler's runtime paths.
# The scalar machine above only generates literals (static folds); this
# one drives random 2–4-member chains over TEXT/REAL/INTEGER COLUMNS
# (plus literals and a parenthesized prefix) through a fixture table and
# compares every row against sqlite3. Python == makes 3.0 equal 3, so
# the documented per-cell int-FORM divergence doesn't trip it while any
# VALUE divergence does.
# ---------------------------------------------------------------------------

_CHAIN_ROWS = [
    (1, "7", 2.5, 9), (2, "7abc", 0.5, -7), (3, "", 7.5, 4),
    (4, "9e1", -2.5, 0), (5, "  -3.5x", 100.0, 15), (6, None, None, None),
    (7, "0x11", 3.0, 2), (8, "12.", 0.0, 1),
    # >int64 digit prefix: %-operand parse saturates to INT64_MAX/MIN
    # (r11 ADVICE fix — runtime modi expression must saturate too)
    (9, "99999999999999999999", 1.0, 3),
    (10, "-99999999999999999999z", -1.0, 5),
]


@pytest.fixture(scope="module")
def chain_tables(db, ref):
    ddl = "CREATE TABLE ch (id INTEGER PRIMARY KEY, tx TEXT, r REAL, i INTEGER)"
    ref.execute(ddl)
    ref.executemany("INSERT INTO ch VALUES (?,?,?,?)", _CHAIN_ROWS)
    db.execute_string_stmt(ddl)
    for rw in _CHAIN_ROWS:
        vals = ",".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else repr(v))
            for v in rw
        )
        db.execute_string_stmt(f"INSERT INTO ch VALUES ({vals})")
    yield
    db.execute_string_stmt("DROP TABLE ch")


@st.composite
def column_chain_exprs(draw):
    pool = st.sampled_from(
        ["tx", "r", "i", "2", "3", "-2", "0", "'4'", "2.5", "'7x'", "''", "'9e1'",
         "X'37'", "X'FF'", "X'3137'", "NULL", "'9223372036854775808'"]
    )
    # 2-4 members cover precedence/sign shapes densely; the tail up to
    # 8 exercises the raised chain-member cap (r11: was 6, now 10)
    n = draw(st.integers(2, 8))
    members = [draw(pool) for _ in range(n)]
    ops_ = [draw(st.sampled_from(["/", "%", "+", "-", "*"])) for _ in range(n - 1)]
    if n >= 3 and draw(st.booleans()):
        expr = f"({members[0]} {ops_[0]} {members[1]})"
        rest = zip(ops_[1:], members[2:])
    else:
        expr = members[0]
        rest = zip(ops_, members[1:])
    for op, m in rest:
        expr += f" {op} {m}"
    return expr


@settings(
    max_examples=examples(120),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(expr=column_chain_exprs())
def test_column_chain_matches_sqlite(db, ref, chain_tables, expr):
    q = f"SELECT id, {expr} AS v FROM ch ORDER BY id"
    want = [list(rw) for rw in ref.execute(q).fetchall()]
    got = [list(v) for v in db.query_string_stmt(q)[0].values]
    assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


@settings(
    max_examples=examples(60),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(expr=column_chain_exprs())
def test_column_chain_truthiness_matches_sqlite(db, ref, chain_tables, expr):
    """The same chains as WHERE predicates — SQLite's integer
    truthiness over the chain VALUE (nonzero keeps the row, NULL
    drops it) composed with the wrap_where_truthy retry layer."""
    q = f"SELECT id FROM ch WHERE {expr} ORDER BY id"
    want = [r[0] for r in ref.execute(q).fetchall()]
    got = [v[0] for v in db.query_string_stmt(q)[0].values]
    assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


# ---------------------------------------------------------------------------
# r11: the same chains in ORDER BY and GROUP BY position — the rewrite
# machinery must behave identically when the expression shapes a sort
# key or a grouping key (folded integers must keep their parens so they
# never turn positional; cross-type group keys compare numerically in
# both engines). id is always the final tiebreak so row order is
# deterministic on both sides.
# ---------------------------------------------------------------------------


@settings(
    max_examples=examples(80),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(expr=column_chain_exprs(), desc=st.booleans())
def test_chain_in_order_by_matches_sqlite(db, ref, chain_tables, expr, desc):
    d = " DESC" if desc else ""
    q = f"SELECT id FROM ch ORDER BY {expr}{d}, id"
    want = [r[0] for r in ref.execute(q).fetchall()]
    got = [v[0] for v in db.query_string_stmt(q)[0].values]
    assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


@settings(
    max_examples=examples(80),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(expr=column_chain_exprs())
def test_chain_in_group_by_matches_sqlite(db, ref, chain_tables, expr):
    """GROUP BY the chain VALUE: SQLite groups int/real numerically
    (1 and 1.0 share a group) and our chains emit numeric-or-NULL in
    both engines, so group counts must agree. Python == makes 3.0
    equal 3 in the key compare, mirroring the documented int-FORM
    allowance."""
    q = f"SELECT {expr} AS g, count(*) AS n FROM ch GROUP BY g ORDER BY g, n"
    want = [list(rw) for rw in ref.execute(q).fetchall()]
    got = [list(v) for v in db.query_string_stmt(q)[0].values]
    assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


# ---------------------------------------------------------------------------
# r11: all-literal compound SELECTs — the static evaluator
# (dialect.try_static_compound) against sqlite3. Pure Python, no Spark:
# random arms × ops × ORDER BY × LIMIT/OFFSET, typed row compare
# (1 vs 1.0 vs '1' forms all distinct).
# ---------------------------------------------------------------------------

_COMPOUND_LITS = [
    "1", "'1'", "1.0", "NULL", "X'00'", "'a'", "2", "-3", "0x10",
    "1e2", "''", "9223372036854775807", "100", "true", "X'61'", "+2",
    # constant-expression arms fold through the chain compiler (r11)
    "1+1", "2/2", "'3'+0", "2*3", "1e2-1", "'9e1' % 2", "X'37' / 2",
    "5%3",
]


@st.composite
def compound_stmts(draw):
    ncols = draw(st.integers(1, 2))
    narms = draw(st.integers(2, 4))
    arms = [
        "SELECT " + ", ".join(draw(st.sampled_from(_COMPOUND_LITS)) for _ in range(ncols))
        for _ in range(narms)
    ]
    ops_ = [
        draw(st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]))
        for _ in range(narms - 1)
    ]
    out = arms[0]
    for op, arm in zip(ops_, arms[1:]):
        out += f" {op} {arm}"
    if draw(st.booleans()):
        terms = []
        for _ in range(draw(st.integers(1, 2))):
            t = str(draw(st.integers(1, ncols)))
            sfx = draw(st.sampled_from(["", " ASC", " DESC"]))
            terms.append(t + sfx)
        out += " ORDER BY " + ", ".join(terms)
    if draw(st.booleans()):
        out += f" LIMIT {draw(st.integers(-1, 4))}"
        if draw(st.booleans()):
            out += f" OFFSET {draw(st.integers(0, 3))}"
    return out


@settings(max_examples=examples(300), deadline=None)
@given(stmt=compound_stmts())
def test_static_compound_matches_sqlite(stmt):
    import sqlite3

    from dust_spark.dialect import try_static_compound

    ref = sqlite3.connect(":memory:")
    want = [tuple(r) for r in ref.execute(stmt).fetchall()]
    got = try_static_compound(stmt)
    assert got is not None, stmt
    typed = lambda rows: [[(type(v).__name__, v) for v in r] for r in rows]
    assert typed(got[1]) == typed(want), f"{stmt}: got={got[1]!r} want={want!r}"
    ref.close()


# ---------------------------------------------------------------------------
# r12: LIMIT/OFFSET expression position + IN-list member affinity — the
# two clause positions the r11 verdict asked to probe next. LIMIT
# applies OP_MustBeInt (full numeric text conversion, integral REAL
# converts, everything else 'datatype mismatch'); IN applies the LHS's
# comparison affinity to EVERY member, exactly like '='.
# ---------------------------------------------------------------------------

_LIMIT_CASES = [
    "SELECT id FROM ch ORDER BY id LIMIT '2'",
    "SELECT id FROM ch ORDER BY id LIMIT 2.0",
    "SELECT id FROM ch ORDER BY id LIMIT 2.5",
    "SELECT id FROM ch ORDER BY id LIMIT '2abc'",
    "SELECT id FROM ch ORDER BY id LIMIT NULL",
    "SELECT id FROM ch ORDER BY id LIMIT '9e1' % 4",
    "SELECT id FROM ch ORDER BY id LIMIT 1+1",
    "SELECT id FROM ch ORDER BY id LIMIT ' 2 '",
    "SELECT id FROM ch ORDER BY id LIMIT '2e1'",
    "SELECT id FROM ch ORDER BY id LIMIT '+2'",
    "SELECT id FROM ch ORDER BY id LIMIT '-0'",
    "SELECT id FROM ch ORDER BY id LIMIT X'32'",
    "SELECT id FROM ch ORDER BY id LIMIT '0x2'",
    "SELECT id FROM ch ORDER BY id LIMIT 9e99",
    "SELECT id FROM ch ORDER BY id LIMIT '9223372036854775808'",
    "SELECT id FROM ch ORDER BY id LIMIT 9223372036854775807",
    "SELECT id FROM ch ORDER BY id LIMIT 2 OFFSET '1'",
    "SELECT id FROM ch ORDER BY id LIMIT 2 OFFSET 1.5",
    "SELECT id FROM ch ORDER BY id LIMIT 2 OFFSET -3",
    "SELECT id FROM ch ORDER BY id LIMIT -1 OFFSET 2",
    "SELECT id FROM ch ORDER BY id LIMIT '1', '2'",
    "SELECT id FROM ch ORDER BY id LIMIT 2 OFFSET '2.0'",
]


def test_limit_offset_matches_sqlite(db, ref, chain_tables):
    for q in _LIMIT_CASES:
        try:
            want = [list(rw) for rw in ref.execute(q).fetchall()]
        except Exception as e:
            want = f"ERR {e}"
        try:
            got = [list(v) for v in db.query_string_stmt(q)[0].values]
        except Exception as e:
            got = f"ERR {e}"
        if isinstance(want, str):
            assert isinstance(got, str) and "datatype mismatch" in got, (
                f"{q}: spark={got!r} sqlite={want!r}"
            )
        else:
            assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


_IN_CASES = [
    "SELECT id FROM ch WHERE i IN ('9', 0.0, '15') ORDER BY id",
    "SELECT id FROM ch WHERE tx IN (7, '9e1') ORDER BY id",
    "SELECT id FROM ch WHERE r IN ('2.5', 3, '1e2') ORDER BY id",
    "SELECT id FROM ch WHERE tx+1 IN (8, '1') ORDER BY id",
    "SELECT id FROM ch WHERE id IN (1.0, '2', 3.5, X'33') ORDER BY id",
    "SELECT id FROM ch WHERE tx NOT IN (7, '9e1') ORDER BY id",
    "SELECT id FROM ch WHERE -i IN (7, '-15') ORDER BY id",
    "SELECT id FROM ch WHERE i % 2 IN (1, '0') ORDER BY id",
    "SELECT id FROM ch WHERE tx || 'z' IN ('7z', 7) ORDER BY id",
    "SELECT id, CASE WHEN i IN (9, '4') THEN 'y' ELSE 'n' END AS c FROM ch ORDER BY id",
    "SELECT id FROM ch WHERE i IN (9) AND tx IN ('7', 12) ORDER BY id",
    "SELECT id FROM ch WHERE (i IN (9, 4)) IN (1) ORDER BY id",
    "SELECT id FROM ch WHERE i IN (4+5, 16-1) ORDER BY id",
    "SELECT count(*) AS n FROM ch WHERE NULL IN (1, 2)",
    "SELECT id FROM ch WHERE CASE WHEN tx IN ('') THEN 1 ELSE 0 END = 1 ORDER BY id",
    "SELECT id FROM ch WHERE id NOT IN (2, '3', 5.0) ORDER BY id",
    # CASE base-operand position (affinity of the base applies to the
    # WHEN exprs — was already green, pinned so it stays that way)
    "SELECT id, CASE tx WHEN 7 THEN 'm7' WHEN '' THEN 'me' ELSE 'x' END AS c FROM ch ORDER BY id",
    "SELECT id, CASE i WHEN '9' THEN 'm9' WHEN 0.0 THEN 'm0' ELSE 'x' END AS c FROM ch ORDER BY id",
    "SELECT id, CASE r WHEN 3 THEN 'm3' WHEN '0.5' THEN 'mh' ELSE 'x' END AS c FROM ch ORDER BY id",
    "SELECT id, CASE tx/2 WHEN 3 THEN 'a' WHEN '3' THEN 'b' ELSE 'x' END AS c FROM ch ORDER BY id",
    # r12 chain-vs-literal storage folds (the E2/E3 finds): a mixed
    # arithmetic chain is numeric-or-NULL, so vs a TEXT literal it
    # compares by storage class with MEMBER-level NULL propagation
    "SELECT id FROM ch WHERE tx+1 = '1' ORDER BY id",
    "SELECT id FROM ch WHERE tx*2 >= 'a' ORDER BY id",
    "SELECT id FROM ch WHERE tx/2 = '3' ORDER BY id",
    "SELECT id FROM ch WHERE tx+1 = X'33' ORDER BY id",
    # r13: COLUMN members take the LHS-affinity-only rule (datatype3
    # §4.1 — the ephemeral RHS index converts member values with the
    # LHS affinity only; tx IN (i) must NOT numeric-convert tx)
    "SELECT id FROM ch WHERE tx IN (i) ORDER BY id",
    "SELECT id FROM ch WHERE i IN (tx) ORDER BY id",
    "SELECT id FROM ch WHERE r IN (i) ORDER BY id",
    "SELECT id FROM ch WHERE r IN (tx) ORDER BY id",
    "SELECT id FROM ch WHERE id IN (i) ORDER BY id",
    "SELECT id FROM ch WHERE i IN (tx, '9', 4) ORDER BY id",
    "SELECT id FROM ch WHERE tx NOT IN (i) ORDER BY id",
    "SELECT id FROM ch WHERE i NOT IN (tx, 9) ORDER BY id",
    "SELECT id FROM ch WHERE ch.i IN (ch.tx) ORDER BY id",
    "SELECT id FROM ch WHERE tx IN (i, '7') ORDER BY id",
    "SELECT count(*) AS n FROM ch WHERE i IN (r, tx)",
    # NULL members must classify as literals, not unknown columns (the
    # r13 machine find: a NULL member bailed the whole list to Spark's
    # IN, which type-errors on mixed STRING/VOID/BINARY members)
    "SELECT id FROM ch WHERE tx IN (NULL, X'37', '7x') ORDER BY id",
    "SELECT id FROM ch WHERE i IN (NULL, tx, 4) ORDER BY id",
]


def test_in_list_affinity_matches_sqlite(db, ref, chain_tables):
    for q in _IN_CASES:
        want = [list(rw) for rw in ref.execute(q).fetchall()]
        got = [list(v) for v in db.query_string_stmt(q)[0].values]
        assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


@st.composite
def in_member_exprs(draw):
    pool = st.sampled_from(
        ["2", "-2", "0.0", "'4'", "2.5", "'7x'", "''", "'9e1'", "X'37'",
         "NULL", "'  -3.5x'", "9", "'0x11'", "1.0", "'12.'"]
    )
    return [draw(pool) for _ in range(draw(st.integers(1, 4)))]


@settings(
    max_examples=examples(80),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    lhs=st.sampled_from(["tx", "r", "i", "id", "tx+1", "i%3", "-i", "r*2", "i+r"]),
    members=in_member_exprs(),
    neg=st.booleans(),
)
def test_in_list_machine_matches_sqlite(db, ref, chain_tables, lhs, members, neg):
    """Random LHS (typed columns + arithmetic chains) × random literal
    members × [NOT] IN — every row compared against sqlite3."""
    op = "NOT IN" if neg else "IN"
    q = f"SELECT id FROM ch WHERE {lhs} {op} ({', '.join(members)}) ORDER BY id"
    want = [r[0] for r in ref.execute(q).fetchall()]
    got = [v[0] for v in db.query_string_stmt(q)[0].values]
    assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


@settings(
    max_examples=examples(80),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    lhs=st.sampled_from(["tx", "r", "i", "id", "ch.tx", "ch.i"]),
    members=st.lists(
        st.sampled_from(
            ["i", "tx", "id", "r", "ch.i", "2", "'4'", "0.0", "'9e1'",
             "NULL", "'7x'", "9", "''"]
        ),
        min_size=1,
        max_size=3,
    ),
    neg=st.booleans(),
)
def test_in_column_member_machine_matches_sqlite(
    db, ref, chain_tables, lhs, members, neg
):
    """r13: column members mixed with literals under the
    LHS-affinity-only IN rule, every row vs sqlite3. The one
    deliberately-excluded pair — TEXT lhs with a REAL column member,
    which needs a runtime %!.15g REAL→TEXT rendering — stays on the
    Spark path and is skipped here (documented edge)."""
    if lhs.endswith("tx") and "r" in members:
        return
    op = "NOT IN" if neg else "IN"
    q = f"SELECT id FROM ch WHERE {lhs} {op} ({', '.join(members)}) ORDER BY id"
    want = [r[0] for r in ref.execute(q).fetchall()]
    got = [v[0] for v in db.query_string_stmt(q)[0].values]
    assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


@settings(
    max_examples=examples(60),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    lim=st.sampled_from(
        ["'2'", "2.0", "2.5", "'2abc'", "NULL", "1+1", "'9e1' % 4", "3", "-2",
         "' 3 '", "'2e1'", "X'32'", "2.0 + 1", "'1' * 3", "0", "'-1'"]
    ),
    off=st.one_of(
        st.none(),
        st.sampled_from(["'1'", "1.0", "2", "-1", "'abc'", "0", "1.5"]),
    ),
)
def test_limit_machine_matches_sqlite(db, ref, chain_tables, lim, off):
    """Random static LIMIT/OFFSET expressions — result rows or the
    'datatype mismatch' error must match sqlite3."""
    q = f"SELECT id FROM ch ORDER BY id LIMIT {lim}"
    if off is not None:
        q += f" OFFSET {off}"
    try:
        want = [r[0] for r in ref.execute(q).fetchall()]
    except Exception as e:
        want = f"ERR {e}"
    try:
        got = [v[0] for v in db.query_string_stmt(q)[0].values]
    except Exception as e:
        got = f"ERR {e}"
    if isinstance(want, str):
        assert isinstance(got, str) and "datatype mismatch" in got, (
            f"{q}: spark={got!r} sqlite={want!r}"
        )
    else:
        assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


@settings(max_examples=examples(250), deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(v=st.floats(allow_nan=False, allow_infinity=False))
def test_real_text_rendering_matches_sqlite(ref, v):
    """_sqlite_real_to_text == SQLite's CAST(real AS TEXT) bit-for-bit
    (the %!.15g emulation the TEXT-affinity REAL-literal rewrite rides
    on)."""
    from dust_spark.dialect import _sqlite_real_to_text

    want = ref.execute("SELECT CAST(? AS TEXT)", (v,)).fetchone()[0]
    assert _sqlite_real_to_text(v) == want, repr(v)


# ---------------------------------------------------------------------------
# r12 second wave: BETWEEN operand position — SQLite defines
# x BETWEEN a AND b as x>=a AND x<=b INCLUDING the comparison-affinity
# rules per bound; window-frame BETWEEN must pass through untouched.
# ---------------------------------------------------------------------------

_BETWEEN_CASES = [
    "SELECT id FROM ch WHERE i BETWEEN '0' AND '9' ORDER BY id",
    "SELECT id FROM ch WHERE tx BETWEEN 0 AND 99 ORDER BY id",
    "SELECT id FROM ch WHERE r BETWEEN '0.4' AND 3 ORDER BY id",
    "SELECT id FROM ch WHERE i NOT BETWEEN '0' AND '9e1' ORDER BY id",
    "SELECT id FROM ch WHERE tx BETWEEN '0' AND X'00' ORDER BY id",
    "SELECT id FROM ch WHERE i+1 BETWEEN '1' AND '10' ORDER BY id",
    "SELECT id FROM ch WHERE tx BETWEEN 12 AND 13 ORDER BY id",
    "SELECT id, i BETWEEN 0.5 AND '9e1' AS b FROM ch ORDER BY id",
    "SELECT id FROM ch WHERE i BETWEEN 1 AND 2+7 AND tx = '7' ORDER BY id",
    "SELECT id FROM ch WHERE CASE WHEN i BETWEEN 0 AND 9 THEN 1 ELSE 0 END = 1 ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    "SELECT id, sum(r) OVER (PARTITION BY i ORDER BY r RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    "SELECT id FROM ch WHERE -i BETWEEN '1' AND 8 ORDER BY id",
    "SELECT id FROM ch WHERE i BETWEEN -7 AND abs(-4) ORDER BY id",
    # r13 ADVICE: an unparenthesized CASE lower bound carries its own
    # ANDs — the scan must skip CASE...END spans, not grab the first
    # depth-0 AND (this exact statement used to rewrite to malformed
    # SQL and error)
    "SELECT 1 AS x WHERE 5 BETWEEN CASE WHEN 1 AND 1 THEN 0 ELSE 9 END AND 10",
    "SELECT id FROM ch WHERE i BETWEEN CASE WHEN i > -100 AND i < 100 "
    "THEN '0' ELSE -1 END AND '9' ORDER BY id",
    "SELECT id FROM ch WHERE i BETWEEN CASE WHEN CASE WHEN 1 AND 1 THEN 1 "
    "ELSE 0 END AND 1 THEN 0 ELSE 5 END AND 9 ORDER BY id",
    # CASE upper bound: the operand-extent scan bails (stop word), the
    # BETWEEN stays on the Spark path — result must still match for
    # same-typed operands
    "SELECT id FROM ch WHERE i BETWEEN 0 AND CASE WHEN 1 AND 1 THEN 9 "
    "ELSE 0 END ORDER BY id",
]


def test_in_list_expansion_caps_large_lists():
    """r13 ADVICE: literal IN lists past _IN_EXPAND_MEMBER_CAP stay on
    the Spark IN path (InSet + datasource pushdown) instead of
    expanding into a giant OR chain."""
    from dust_spark.dialect import _IN_EXPAND_MEMBER_CAP, _expand_in_lists

    big = ", ".join(str(i) for i in range(_IN_EXPAND_MEMBER_CAP + 10))
    q = f"SELECT 1 WHERE 5 IN ({big})"
    assert _expand_in_lists(q) == q
    small = "SELECT 1 WHERE 5 IN (1, 2)"
    assert _expand_in_lists(small) != small


def test_between_affinity_matches_sqlite(db, ref, chain_tables):
    for q in _BETWEEN_CASES:
        want = [list(rw) for rw in ref.execute(q).fetchall()]
        got = [list(v) for v in db.query_string_stmt(q)[0].values]
        assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


@settings(
    max_examples=examples(70),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    lhs=st.sampled_from(["tx", "r", "i", "id", "tx+1", "i%3", "-i", "r*2"]),
    lo_=st.sampled_from(["0", "'0'", "-2", "0.5", "''", "'1'", "X'30'", "NULL", "'0.4'"]),
    hi_=st.sampled_from(["9", "'9'", "99", "'9e1'", "2.5", "'zz'", "X'39'", "NULL", "8+1"]),
    neg=st.booleans(),
)
def test_between_machine_matches_sqlite(db, ref, chain_tables, lhs, lo_, hi_, neg):
    op = "NOT BETWEEN" if neg else "BETWEEN"
    q = f"SELECT id FROM ch WHERE {lhs} {op} {lo_} AND {hi_} ORDER BY id"
    want = [r[0] for r in ref.execute(q).fetchall()]
    got = [v[0] for v in db.query_string_stmt(q)[0].values]
    assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


# ---------------------------------------------------------------------------
# r13: CASE-operand position — SQLite defines the simple CASE as
# successive base = w comparisons INCLUDING §4.2 affinity, so
# rewrite_simple_case desugars to searched CASE and the '=' machinery
# applies (CASE i+1 WHEN '10' must NOT match — the probe find).
# ---------------------------------------------------------------------------

_CASE_OPERAND_CASES = [
    "SELECT id, CASE i+1 WHEN '10' THEN 'y' ELSE 'n' END AS c FROM ch ORDER BY id",
    "SELECT id, CASE tx WHEN i THEN 'y' ELSE 'n' END AS c FROM ch ORDER BY id",
    "SELECT id, CASE i WHEN tx THEN 'y' ELSE 'n' END AS c FROM ch ORDER BY id",
    "SELECT id, CASE r WHEN i THEN 'y' ELSE 'n' END AS c FROM ch ORDER BY id",
    "SELECT id, CASE tx WHEN '7' THEN 'a' WHEN 12 THEN 'b' ELSE 'n' END AS c FROM ch ORDER BY id",
    "SELECT id, CASE i%3 WHEN '1' THEN 'y' ELSE 'n' END AS c FROM ch ORDER BY id",
    "SELECT id, CASE tx WHEN NULL THEN 'y' ELSE 'n' END AS c FROM ch ORDER BY id",
    "SELECT id, CASE -i WHEN '-9' THEN 'y' ELSE 'n' END AS c FROM ch ORDER BY id",
    "SELECT id, CASE tx WHEN i THEN CASE r WHEN 0.5 THEN 'in' ELSE 'out' END ELSE 'n' END AS c FROM ch ORDER BY id",
    "SELECT id, CASE tx||'' WHEN 7 THEN 'y' ELSE 'n' END AS c FROM ch ORDER BY id",
    "SELECT count(*) AS n FROM ch WHERE CASE i WHEN '9' THEN 1 ELSE 0 END = 1",
]


def test_case_operand_affinity_matches_sqlite(db, ref, chain_tables):
    for q in _CASE_OPERAND_CASES:
        want = [list(rw) for rw in ref.execute(q).fetchall()]
        got = [list(v) for v in db.query_string_stmt(q)[0].values]
        assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


@settings(
    max_examples=examples(70),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    base=st.sampled_from(["tx", "i", "r", "id", "i+1", "i%3", "-i", "tx||''"]),
    w1=st.sampled_from(["'7'", "7", "i", "tx", "0.0", "'9e1'", "NULL", "''", "'-9'", "4"]),
    w2=st.one_of(st.none(), st.sampled_from(["9", "'0'", "i", "2.5", "'x'"])),
)
def test_case_operand_machine_matches_sqlite(db, ref, chain_tables, base, w1, w2):
    # TEXT base with a REAL column member needs runtime %!.15g — the
    # '=' path handles col-vs-col via the NUMERIC-affinity CASE, so no
    # exclusions needed here
    arms = f"WHEN {w1} THEN 'a'" + (f" WHEN {w2} THEN 'b'" if w2 else "")
    q = f"SELECT id, CASE {base} {arms} ELSE 'n' END AS c FROM ch ORDER BY id"
    want = [list(rw) for rw in ref.execute(q).fetchall()]
    got = [list(v) for v in db.query_string_stmt(q)[0].values]
    assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


# ---------------------------------------------------------------------------
# r13: window-frame bound position (the clause-position sweep's next
# stop after WHERE/SELECT/ORDER/GROUP/HAVING/LIMIT/IN/BETWEEN/ON/DML/
# CHECK). SQLite statically converts ROWS/GROUPS offsets with the
# OP_MustBeInt family plus non-negativity ('2.0' → 2, abs(-2) REJECTED)
# and RANGE offsets as non-negative numbers; starting validates first.
# ---------------------------------------------------------------------------

_FRAME_CASES = [
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN '1' PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN 2.0 PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN ' 2 ' PRECEDING AND '1' FOLLOWING) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN 1+1 PRECEDING AND '1'+1 FOLLOWING) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN '9e1' PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS '2' PRECEDING) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN CURRENT ROW AND '2' FOLLOWING) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY r RANGE BETWEEN '2.5' PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY r RANGE BETWEEN '1e1' PRECEDING AND 2.5 FOLLOWING) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY i GROUPS BETWEEN '1' PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    # error shapes — starting offset validates first
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN 'abc' PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN NULL PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN -1 PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN 2.5 PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING AND 'x' FOLLOWING) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN 'x' PRECEDING AND 'y' FOLLOWING) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN X'31' PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS 2.5 PRECEDING) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN 9223372036854775808 PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY r RANGE BETWEEN 'abc' PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY r RANGE BETWEEN -0.5 PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
    "SELECT id, sum(i) OVER (ORDER BY id ROWS BETWEEN abs(2) PRECEDING AND CURRENT ROW) AS s FROM ch ORDER BY id",
]


def test_frame_bounds_match_sqlite(db, ref, chain_tables):
    for q in _FRAME_CASES:
        try:
            want = [list(rw) for rw in ref.execute(q).fetchall()]
        except Exception as e:
            want = f"ERR {e}"
        try:
            got = [list(v) for v in db.query_string_stmt(q)[0].values]
        except Exception as e:
            got = f"ERR {e}"
        if isinstance(want, str):
            assert isinstance(got, str) and "offset must be a non-negative" in got, (
                f"{q}: spark={got!r} sqlite={want!r}"
            )
            assert want.split("ERR ")[1] in got, f"{q}: spark={got!r} sqlite={want!r}"
        else:
            assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


@settings(
    max_examples=examples(70),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    mode=st.sampled_from(["ROWS", "GROUPS", "RANGE"]),
    lo_=st.sampled_from(
        ["UNBOUNDED", "'1'", "2.0", "1+1", "' 2 '", "0", "'abc'", "NULL",
         "-1", "2.5", "'2.5'", "X'31'", "'9e1'", "1", "3"]
    ),
    hi_=st.sampled_from(
        ["CURRENT ROW", "'1'", "1.0", "'0'", "2", "'y'", "-2", "1.5", "'2e1'"]
    ),
)
def test_frame_bound_machine_matches_sqlite(db, ref, chain_tables, mode, lo_, hi_):
    key = "r" if mode == "RANGE" else "id"
    lo_txt = "UNBOUNDED PRECEDING" if lo_ == "UNBOUNDED" else f"{lo_} PRECEDING"
    hi_txt = hi_ if hi_ == "CURRENT ROW" else f"{hi_} FOLLOWING"
    q = (
        f"SELECT id, sum(i) OVER (ORDER BY {key} {mode} BETWEEN {lo_txt} "
        f"AND {hi_txt}) AS s FROM ch ORDER BY id"
    )
    try:
        want = [list(rw) for rw in ref.execute(q).fetchall()]
    except Exception as e:
        want = f"ERR {e}"
    try:
        got = [list(v) for v in db.query_string_stmt(q)[0].values]
    except Exception as e:
        got = f"ERR {e}"
    if isinstance(want, str):
        assert isinstance(got, str) and want.split("ERR ")[1] in got, (
            f"{q}: spark={got!r} sqlite={want!r}"
        )
    else:
        assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


_AGG_ARG_CASES = [
    # r13 aggregate-argument position: sum/total over TEXT columns
    # apply SQLite's per-value numeric-PREFIX conversion ('7abc' → 7,
    # '  -3.5x' → -3.5, junk → 0) — plain CAST-AS-DOUBLE NULLed the
    # prefix forms and silently dropped them from the sum
    "SELECT sum(tx) AS s FROM ch",
    "SELECT total(tx) AS t FROM ch",
    "SELECT sum(ch.tx) AS s FROM ch",
    "SELECT sum(i) AS s FROM ch",
    "SELECT sum(r) AS s FROM ch",
    "SELECT sum(tx) AS s FROM ch WHERE i > 0",
    "SELECT id % 2 AS b, sum(tx) AS s FROM ch GROUP BY id % 2 ORDER BY b",
    "SELECT sum(tx) OVER () AS s FROM ch LIMIT 1",
    "SELECT sum(DISTINCT i) AS s FROM ch",
    "SELECT avg(tx) AS a FROM ch",
    "SELECT sum(tx) + 1 AS s FROM ch",
    "SELECT sum(tx)/2 AS s FROM ch",
    "SELECT min(tx) AS m, max(tx) AS x FROM ch",
    "SELECT id, total(tx) OVER (ORDER BY id) AS t FROM ch ORDER BY id",
    "SELECT total(tx) AS t FROM ch WHERE id > 99",
]


def test_real_text_contexts_match_sqlite(db, ref, spark):
    """r13: RUNTIME REAL column values render with SQLite's %!.15g in
    every text-conversion context (CAST-to-TEXT incl. the one-paren
    canonical form every rewrite funnels through, || members,
    group_concat, upper/lower via translate, the substr edge
    algorithm, replace/instr/trim/printf) — via the x87-gated
    __sqlite_real_text pandas UDF. '1e20' must read '1.0e+20', not
    Java's '1.0E20'."""
    import sqlite3

    ref2 = sqlite3.connect(":memory:")
    s = DustSession(spark)
    try:
        for c in (
            "CREATE TABLE rt (id INTEGER PRIMARY KEY, tx TEXT, r REAL, i INTEGER)",
            "INSERT INTO rt VALUES (1,'7',2.5,9),(2,'a',1e20,3),(3,'b',0.1,4),"
            "(4,'c',-1.5e-8,5),(5,'d',90.0,6),(6,'e',7.290279102206975e159,7),"
            "(7,'f',NULL,8)",
        ):
            ref2.execute(c)
            s.execute_string_stmt(c)
        for q in (
            "SELECT id, CAST(r AS TEXT) AS t FROM rt ORDER BY id",
            "SELECT id, r || '' AS t FROM rt ORDER BY id",
            "SELECT id, tx || r AS t FROM rt ORDER BY id",
            "SELECT id, r || r AS t FROM rt ORDER BY id",
            "SELECT group_concat(r) AS g FROM rt",
            "SELECT id, upper(r) AS t FROM rt ORDER BY id",
            "SELECT id, lower(r) AS t FROM rt ORDER BY id",
            "SELECT id, substr(r, 2, 3) AS t FROM rt ORDER BY id",
            "SELECT id, replace(r, '.', '_') AS t FROM rt ORDER BY id",
            "SELECT id, instr(r, '.') AS t FROM rt ORDER BY id",
            "SELECT id, length(r) AS t FROM rt ORDER BY id",
            "SELECT id, trim(r) AS t FROM rt ORDER BY id",
            "SELECT id, printf('%s', r) AS t FROM rt ORDER BY id",
            "SELECT id FROM rt WHERE r LIKE '%+%' ORDER BY id",
            "SELECT id, hex(CAST(r AS TEXT)) AS t FROM rt WHERE id = 2",
            "SELECT rt.r || '' AS t FROM rt WHERE id = 2",
            # integer/text columns keep their native paths
            "SELECT id, CAST(i AS TEXT) AS t FROM rt ORDER BY id",
            "SELECT id, tx || tx AS t FROM rt ORDER BY id",
        ):
            want = [list(rw) for rw in ref2.execute(q).fetchall()]
            got = [list(v) for v in s.query_string_stmt(q)[0].values]
            assert got == want, f"{q}: spark={got!r} sqlite={want!r}"
        # DML altitude (r13): SET expressions and VALUES literals take
        # the same rendering — UPDATE SET tx = r||'' stores '1.0e+20',
        # VALUES (1e19 || 'x') stores '1.0e+19x' (static fold)
        for dml in (
            "UPDATE rt SET tx = r || '' WHERE id = 2",
            "UPDATE rt SET tx = CAST(r AS TEXT) WHERE id = 4",
            "INSERT INTO rt VALUES (8, 1e19 || 'x', 0, 1)",
            "INSERT INTO rt VALUES (9, CAST(-2.5e-9 AS TEXT), 1, 2)",
        ):
            ref2.execute(dml)
            s.execute_string_stmt(dml)
        q = "SELECT id, tx FROM rt ORDER BY id"
        want = [list(rw) for rw in ref2.execute(q).fetchall()]
        got = [list(v) for v in s.query_string_stmt(q)[0].values]
        assert got == want, f"{q}: spark={got!r} sqlite={want!r}"
    finally:
        s.close()
        ref2.close()


def test_aggregate_argument_affinity_matches_sqlite(db, ref, chain_tables):
    for q in _AGG_ARG_CASES:
        want = [list(rw) for rw in ref.execute(q).fetchall()]
        got = [list(v) for v in db.query_string_stmt(q)[0].values]
        assert got == want, f"{q}: spark={got!r} sqlite={want!r}"


def test_on_clause_affinity_matches_sqlite(db, ref, spark):
    """r12 probe pinned: JOIN ON conditions route through the same
    comparison-affinity machinery (two-typed-column CASE, chain
    operands, BETWEEN expansion). IN with a COLUMN member stays on the
    Spark path — SQLite applies ONLY the LHS affinity there (probed:
    tx IN (i) does not numeric-convert, tx = i does), which the
    OR-expansion would get wrong; the literal-member gate keeps it
    out (documented edge in COVERAGE.md B9)."""
    for ddl in (
        "CREATE TABLE oa (a INTEGER PRIMARY KEY, tx TEXT)",
        "CREATE TABLE ob (b INTEGER PRIMARY KEY, i INTEGER, r REAL)",
    ):
        ref.execute(ddl)
        db.execute_string_stmt(ddl)
    try:
        for s in (
            "INSERT INTO oa VALUES (1,'7'),(2,'9e1'),(3,''),(4,'0x11'),(5,'90')",
            "INSERT INTO ob VALUES (1,7,7.0),(2,90,90.0),(3,0,0.0),(4,17,2.5)",
        ):
            ref.execute(s)
            db.execute_string_stmt(s)
        for q in (
            "SELECT a, b FROM oa JOIN ob ON oa.tx = ob.i ORDER BY a, b",
            "SELECT a, b FROM oa JOIN ob ON tx = r ORDER BY a, b",
            "SELECT a, b FROM oa LEFT JOIN ob ON tx = i ORDER BY a, b",
            "SELECT a, b FROM oa JOIN ob ON tx+0 = i ORDER BY a, b",
            "SELECT a, b FROM oa JOIN ob ON oa.a = ob.r ORDER BY a, b",
            "SELECT a, b FROM oa JOIN ob ON tx BETWEEN i AND i+10 ORDER BY a, b",
            "SELECT a, b FROM oa JOIN ob ON tx IN (90, '90') ORDER BY a, b",
        ):
            want = [list(rw) for rw in ref.execute(q).fetchall()]
            got = [list(v) for v in db.query_string_stmt(q)[0].values]
            assert got == want, f"{q}: spark={got!r} sqlite={want!r}"
    finally:
        for t in ("oa", "ob"):
            ref.execute(f"DROP TABLE {t}")
            db.execute_string_stmt(f"DROP TABLE {t}")
