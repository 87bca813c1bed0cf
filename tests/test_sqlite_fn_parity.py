"""Differential scalar-function parity: DustSession vs an in-process
sqlite3 — the reference delegates 100% of query processing to SQLite
(db/src/db.rs:176,278), so SQLite's own answers are the golden oracle
for the function dialect (dialect.rewrite_sqlite_fns + SQLITE_FN_DDL).

Known, documented divergences (not asserted — all stem from SQLite's
dynamic typing, which no static-typed engine can reproduce textually):
integer division with a TEXT operand is VALUE-asserted as of r9
(dialect._try_text_division: SQLite's arithmetic NUMERIC-prefix
conversion — '7'/2=3, '7abc'/2=3, ''/2=0, '7.5x'/2=3.75 — folds
statically for literals and becomes a runtime CASE for TEXT-affinity
columns; the runtime path's mixed branches coerce to DOUBLE, so the
remaining divergence is per-cell result TYPING only: typeof via a
column is 'double'-shaped, and wire formatting shows 3.0 — numeric
equality holds; the r9 second wave extends the same machinery to %
— BOTH operands int64-truncate, TEXT by the INTEGER-prefix parse,
REAL toward zero, never fmod — and to + - * TEXT prefix conversion;
r10 extends the machinery to 3+-member CHAINS with full precedence,
left-assoc int-formedness propagation and parenthesized sub-chains —
test_text_arith_chains; chains longer than 6 members stay untouched,
expression-size cap);
cross-type comparison where an operand's class is only known at runtime
(two typed columns of different affinities, or an UNTYPED/BLOB/ANY
column: SQLite applies comparison affinity per row; literal vs literal
IS asserted — folded by storage-class ordering — and r8 extends the
asserted set to declared-affinity COLUMN vs literal:
numeric column vs non-numeric text folds NULL-propagating, TEXT column
vs INTEGER literal rewrites the literal to its canonical TEXT form,
any typed column vs BLOB literal folds —
test_comparison_affinity_typed_columns);
abs() of a non-literal text expression (literal text/blob IS asserted:
numeric-prefix fold); 1e999-style overflow literals now parse to REAL +Inf and compare/typeof correctly (r8) — raw Inf CELLS ride the JSON wire as NULL, faithful to the reference's serde_json serialization (no Infinity in JSON); int64-overflow promotion is ASSERTED for static chains as of r10 (pure-literal arithmetic folds to SQLite's exact value — overflow computes the REAL of the original operands, out-of-range literals parse REAL, hex is two's complement); RUNTIME column overflow still wraps (Spark BIGINT, no per-cell check — documented); integer truthiness in
boolean contexts (NOT 0, 1 AND 0, CASE WHEN 1); backslashes in string
literals (SQLite literal, Spark escape); printf('%f', <decimal
literal>); quote(<number>) quotes the text form; glob patterns with a
literal '^' outside a character class; floor/ceil of INTEGER inputs
(SQLite keeps INTEGER, our REAL wrapper returns 2.0); log10(1000)
(SQLite's own ln-ratio artifact 2.999…96 vs our exact 3.0);
json_extract composed INTO other
json builders re-serializes scalars as text (get_json_object is
string-typed where SQLite's json_extract returns dynamic values);
LIKE case folding — SQLite LIKE is case-insensitive for ASCII only,
while the blanket LIKE→ILIKE rewrite applies full Unicode folding, so
non-ASCII operands ('Ä' LIKE 'ä': SQLite 0, engine 1) diverge (the
property generator below excludes non-ASCII LIKE operands for this
reason); ``->>`` of a json NUMBER returns TEXT
('1') where SQLite returns INTEGER/REAL (dynamic result typing);
a few transcendentals differ in the LAST ULP between the JVM's
StrictMath and C libm (probed: exp(1), cosh(1)) — the battery carries
the bit-exact majority and skips those two inputs.

(Historical note: an earlier revision listed "SELECT rowid wire-names
the PK column" as a divergence — probing cur.description showed SQLite
itself names bare-rowid items after the PK on alias tables, so the
engine's behavior was already correct and is now asserted in
test_rowid_result_column_names.)
"""

from __future__ import annotations

import sqlite3

import pytest

from dust_spark import DustSession

CASES = [
    # glob translation (incl. char classes — SQLite negates with [^..])
    "SELECT glob('a*c', 'abc')",
    "SELECT glob('a?c', 'axc')",
    "SELECT glob('a[^xy]c', 'azc')",
    "SELECT glob('a[xy]c', 'ayc')",
    "SELECT glob('a.c', 'abc')",
    "SELECT glob('*.txt', 'note.txt')",
    "SELECT glob('x+y', 'x+y')",
    "SELECT glob('a*', NULL)",
    # variadic scalar forms
    "SELECT char(72, 105)",
    "SELECT char(65)",
    # char() takes Unicode CODEPOINTS (r6: Spark's char wraps mod 256)
    "SELECT char(8364)",
    "SELECT char(72, 105, 8364)",
    "SELECT unicode('€')",
    # SQLite lower/upper fold ASCII ONLY (r6 differential finding)
    "SELECT lower('ÄBC')",
    "SELECT upper('äbc')",
    "SELECT lower('MiXeD 123 ÖÜ')",
    # quote() renders by storage class: numerics bare, booleans as 1/0,
    # text quoted, blob literals X'..' (r6)
    "SELECT quote(3)",
    "SELECT quote(3.5)",
    "SELECT quote(X'ff00')",
    "SELECT quote('it''s')",
    "SELECT quote(NULL)",
    "SELECT quote(1 = 1)",
    # substr edge semantics (func.c algorithm — r6): start 0 consumes a
    # length unit, negative length takes chars BEFORE the start
    "SELECT substr('hello', 0, 3)",
    "SELECT substr('hello', 2, -1)",
    "SELECT substr('hello', -7, 3)",
    "SELECT substr('hello', -1, -2)",
    "SELECT substr('hello', 6, -3)",
    "SELECT substr('hello', 3, 0)",
    "SELECT substr(NULL, 1, 2)",
    # decimal literals are REAL (double) like SQLite, not exact DECIMAL
    "SELECT 0.1 + 0.2",
    "SELECT typeof(0.5)",
    "SELECT 7.0/2",
    # integer-overflow promotion (r10): int64 overflow computes the REAL
    # of the original operands; an out-of-range integral literal parses
    # REAL; INT_MIN / -1 promotes, INT_MIN % -1 is 0 INTEGER
    "SELECT 9223372036854775807 + 1",
    "SELECT typeof(9223372036854775807 + 1)",
    "SELECT 3037000500 * 3037000500",
    "SELECT 9223372036854775807 * 2",
    "SELECT -9223372036854775807 - 5",
    "SELECT (-9223372036854775807 - 1) / -1",
    "SELECT (-9223372036854775807 - 1) % -1",
    "SELECT 9223372036854775808",
    "SELECT typeof(9223372036854775808)",
    "SELECT '9223372036854775807' + 1",
    "SELECT 9223372036854775806 + 1",
    "SELECT 4611686018427387904 * 2",
    "SELECT 9223372036854775807 + 1 - 1",
    "SELECT 0xFFFFFFFFFFFFFFFF + 0",
    "SELECT 1e999 % 3",
    # %-operand INTEGER-prefix parse SATURATES past int64 (r11 ADVICE):
    # '99999999999999999999' reads INT64_MAX (divisible by 7 → 0.0 REAL)
    "SELECT '99999999999999999999' % 7",
    "SELECT typeof('99999999999999999999' % 7)",
    "SELECT '-99999999999999999999' % 7",
    "SELECT '9223372036854775808' % 10",
    "SELECT '-9223372036854775809' % 10",
    "SELECT 7 % '99999999999999999999'",
    "SELECT X'39393939393939393939393939393939393939393939' % 7",
    "SELECT '  +99999999999999999999xyz' % 7",
    # blob literals convert like TEXT of their raw bytes (r10)
    "SELECT X'37' / 2",
    "SELECT X'3137' % 5",
    "SELECT X'FF' + 1",
    "SELECT X'FF' + 1.5",
    # 'julianday' first-modifier + localtime/utc no-ops on a UTC host
    "SELECT datetime(2460325.0, 'julianday')",
    "SELECT date(2460310.5, 'julianday', '+1 month')",
    "SELECT datetime('2024-01-15 12:00:00', 'localtime')",
    "SELECT datetime('2024-01-15 12:00:00', 'utc')",
    # month/year modifiers NORMALIZE overflow (lang_datefunc)
    "SELECT date('2024-01-31', '+1 month')",
    "SELECT date('2024-02-29', '+1 year')",
    "SELECT date('2024-03-31', '-1 month')",
    "SELECT datetime('2024-05-31 23:59:59', '+25 months')",
    "SELECT date('2023-01-29', '+1 month', 'start of month', '+3 days')",
    # printf arg coercion per conversion spec (r6): %d truncates reals
    # and prefix-parses strings, %f accepts ints, %q escapes quotes
    "SELECT printf('%d', 3.7)",
    "SELECT printf('%d', '42abc')",
    "SELECT printf('%f', 3)",
    "SELECT printf('%x', 255.9)",
    "SELECT printf('%s', 3.5)",
    "SELECT printf('%5.2f|%03d|%x', 3.14159, 7, 255)",
    "SELECT printf('%q', 'it''s')",
    "SELECT printf('%%d')",
    "SELECT printf('%i', 9.99)",
    "SELECT format('%.2f', 7)",
    "SELECT printf('%e', 12345)",
    # raw string literals: backslash is an ORDINARY character (r6)
    "SELECT 'a\\b'",
    "SELECT length('a\\b')",
    "SELECT 'ab%cd' LIKE 'ab\\%cd' ESCAPE '\\'",
    "SELECT 'ab_cd' LIKE 'ab\\_cd' ESCAPE '\\'",
    "SELECT replace('a\\b\\c', '\\', '/')",
    "SELECT max(1,2,3)",
    "SELECT min(4,2,9)",
    # strings
    "SELECT unicode('A')",
    "SELECT quote('it''s')",
    "SELECT quote(NULL)",
    "SELECT ltrim('xxay', 'x')",
    "SELECT rtrim('ayxx', 'x')",
    "SELECT trim('xayx', 'x')",
    "SELECT ltrim('  a ')",
    "SELECT replace('aXbXc', 'X', '-')",
    "SELECT instr('hello world', 'wor')",
    "SELECT format('%d-%s', 7, 'x')",
    "SELECT printf('%d|%s', 9, 'y')",
    # typeof mapping (static Spark type -> SQLite storage class)
    "SELECT typeof(42)",
    "SELECT typeof('x')",
    "SELECT typeof(4.2)",
    "SELECT typeof(NULL)",
    "SELECT typeof(x'41')",
    # numeric
    "SELECT sign(-42)",
    "SELECT sign(3.7)",
    "SELECT hex('ab')",
    # date/time/datetime modifier family
    "SELECT time('2024-03-05 10:20:30')",
    "SELECT time('10:20:30')",
    "SELECT datetime(1700000000, 'unixepoch')",
    "SELECT date('2024-03-05', '+1 day')",
    "SELECT date('2024-03-05', '-2 months')",
    "SELECT date('2024-03-05', '+1 year')",
    "SELECT date('2024-03-17', 'start of month')",
    "SELECT datetime('2024-03-05 10:20:30', '+90 minutes')",
    "SELECT datetime('2024-03-05 10:20:30', '+1 day', 'start of day')",
    "SELECT strftime('%Y|%m|%d', '2024-03-05')",
    "SELECT julianday('2024-01-01')",
    # composition through the rewriter (nested calls, renames)
    "SELECT iif(max(1,2) = 2, quote('q'), 'n')",
    "SELECT trim(char(32, 97, 32), ' ')",
    # operator semantics: null-safe IS / IS NOT, case-insensitive LIKE
    "SELECT 1 IS 1",
    "SELECT 1 IS 2",
    "SELECT NULL IS 5",
    "SELECT 1 IS NOT 2",
    "SELECT NULL IS NULL",
    "SELECT 1 IS NOT NULL",
    "SELECT 'abc' LIKE 'AB%'",
    "SELECT 'abc' NOT LIKE 'z%'",
    "SELECT 'a%c' LIKE 'a/%c' ESCAPE '/'",
    "SELECT 'A' LIKE 'a'",
    # CAST affinity: SQLite prefix-parse + type-name mapping
    "SELECT CAST('3.7' AS INTEGER)",
    "SELECT CAST(3.7 AS INTEGER)",
    "SELECT CAST(-3.7 AS INTEGER)",
    "SELECT CAST('12abc' AS INTEGER)",
    "SELECT CAST('abc' AS INTEGER)",
    "SELECT CAST('' AS INTEGER)",
    "SELECT CAST('  42' AS INTEGER)",
    "SELECT CAST(NULL AS INTEGER)",
    "SELECT CAST(1 AS TEXT)",
    "SELECT CAST(2.5 AS TEXT)",
    "SELECT CAST('7.5e2xy' AS REAL)",
    "SELECT CAST('junk' AS REAL)",
    "SELECT CAST('3.25' AS REAL)",
    "SELECT CAST(CAST('12abc' AS INTEGER) AS TEXT)",
    "SELECT typeof(CAST('abc' AS INTEGER))",
    "SELECT typeof(CAST(1 AS TEXT))",
    # aggregates + REAL round + strftime single-specifier fast paths
    "SELECT round(2.5)",
    "SELECT round(3.5)",
    "SELECT round(-2.5)",
    "SELECT round(2.567, 2)",
    "SELECT typeof(round(1.1))",
    "SELECT strftime('%s', '2024-03-05 10:20:30')",
    "SELECT strftime('%w', '2024-03-05')",
    "SELECT strftime('%w', '2024-03-03')",
    "SELECT strftime('%W', '2024-03-05')",
    "SELECT strftime('%W', '2024-01-01')",
    "SELECT strftime('%W', '2023-01-01')",
    "SELECT strftime('%H:%M:%f', '2024-03-05 10:20:30.125')",
    # math functions: SQLite's log(X) is base-10 and math fns return REAL
    "SELECT log(100)",
    "SELECT log(2, 8)",
    "SELECT ln(1)",
    "SELECT floor(2.7)",
    "SELECT ceil(2.1)",
    "SELECT ceiling(2.1)",
    "SELECT mod(7, 3)",
    "SELECT trunc(2.7)",
    "SELECT trunc(-2.7)",
    "SELECT sqrt(9.0)",
    "SELECT pow(2, 10)",
    "SELECT exp(0)",
    "SELECT atan2(0, 1)",
    "SELECT degrees(0)",
    # full trig/hyperbolic sweep — bit-exact between JVM and C libm on
    # these inputs. exp(1)/cosh(1) are deliberately ABSENT: they differ
    # in the last ULP (JVM StrictMath vs libm), the documented
    # floating-point divergence class (module docstring).
    # domain errors return NULL, not NaN (r6); scalar min/max NULL rule
    "SELECT sqrt(-1) IS NULL",
    "SELECT power(-8, 0.333) IS NULL",
    "SELECT acos(2) IS NULL",
    "SELECT asin(-2) IS NULL",
    "SELECT acosh(0.5) IS NULL",
    "SELECT atanh(2) IS NULL",
    "SELECT min(NULL, 3) IS NULL",
    "SELECT max(NULL, 'x') IS NULL",
    "SELECT sqrt(2)",
    "SELECT power(2, 0.5)",
    "SELECT pi()",
    "SELECT sin(0.5)",
    "SELECT cos(0.5)",
    "SELECT tan(0.5)",
    "SELECT asin(0.5)",
    "SELECT acos(0.5)",
    "SELECT atan(1)",
    "SELECT atan2(1, 1)",
    "SELECT mod(7.5, 2)",
    "SELECT degrees(pi())",
    "SELECT radians(180)",
    "SELECT sinh(1)",
    "SELECT tanh(1)",
    "SELECT log2(8)",
    "SELECT ln(10)",
    # infix GLOB / NOT GLOB operator form (≡ glob(pattern, expr))
    "SELECT 'abc' GLOB 'a*'",
    "SELECT 'abc' GLOB 'b*'",
    "SELECT 'abc' NOT GLOB 'b*'",
    "SELECT 'Apple' GLOB 'a*'",  # GLOB is case-SENSITIVE unlike LIKE
    # like(PATTERN, STRING[, ESCAPE]) — reversed args, case-insensitive
    "SELECT like('a%', 'Abc')",
    "SELECT like('b%', 'abc')",
    "SELECT like('a!_c', 'a_c', '!')",
    "SELECT 'a_c' LIKE 'a!_c' ESCAPE '!'",
    "SELECT 'a%b' LIKE 'a!%b' ESCAPE '!'",
    # 'weekday N' modifier (advance-or-stay) and unixepoch()
    "SELECT date('2024-03-05', 'weekday 0')",
    "SELECT date('2024-03-03', 'weekday 0')",
    "SELECT date('2024-03-05', 'weekday 2')",
    "SELECT datetime('2024-03-05 08:30:00', 'weekday 1', '+1 hour')",
    "SELECT unixepoch('2024-03-05 00:00:00')",
    "SELECT unixepoch('2024-03-05')",
    "SELECT julianday('2024-03-05', '+1 day') - julianday('2024-03-05')",
    "SELECT julianday('2024-03-05', 'start of month')",
    # r7 typed-ops rewrites (dialect.rewrite_typed_ops): integer
    # division where both operands are provably INTEGER — truncation
    # toward zero, matching Spark's div exactly (negatives included)
    "SELECT 7/2",
    "SELECT -7/2",
    "SELECT 7/-2",
    "SELECT 7/2/2",
    "SELECT 3*7/2",
    "SELECT 7/2*3",
    "SELECT (8/2)/2",
    "SELECT (1+3)/2",
    "SELECT 1/0",
    "SELECT 7.0/2",  # any REAL operand keeps real division
    "SELECT 7/2.0",
    "SELECT length('abcde')/2",
    "SELECT CAST('7' AS INTEGER)/2",
    # literal cross-type comparisons fold to the storage-class ordering
    # (NUMERIC < TEXT < BLOB; literals never affinity-convert)
    "SELECT 1 < '1'",
    "SELECT 1 = '1'",
    "SELECT 1 > '1'",
    "SELECT 1 <= '1'",
    "SELECT 1 != '1'",
    "SELECT 1.5 < 'a'",
    "SELECT '' > 9e99",
    "SELECT x'00' > 'zzz'",
    "SELECT 'a' < x'00'",
    # string/blob-affinity abs(): numeric-prefix conversion, always REAL
    "SELECT abs('12')",
    "SELECT abs('-5x')",
    "SELECT abs('abc')",
    "SELECT abs(x'3132')",
    "SELECT abs('1.2.3')",
    "SELECT abs('')",
    "SELECT abs(' 12')",
    "SELECT abs('1e2')",
    "SELECT abs('-')",  # signed zero survives SQLite's x<0 test
    # overflow exponent literals parse to REAL +Inf like SQLite (r8;
    # Spark's parser rejects 1e999 → rewritten to double('Infinity')).
    # Raw Inf CELLS ride the JSON wire as NULL — reference-faithful:
    # serde_json has no Infinity (db.rs serializes f64 through
    # serde_json) — so the asserted cases keep Inf out of the output.
    "SELECT 1e999 = 1e999",
    "SELECT typeof(1e999)",
    "SELECT typeof(-1E999)",
    "SELECT 1e999 > 1e308",
    "SELECT -1e999 < 0",
    "SELECT CASE WHEN 1e999 > 0 THEN 'p' ELSE 'n' END",
    "SELECT 1.0 / 1e999",
]


def test_int_affinity_column_division(spark):
    """Column-aware integer division: INTEGER-affinity columns store
    LongType, so x/y between them is SQLite integer division (the
    session feeds the in-scope INTEGER column names to
    dialect.rewrite_typed_ops). sqlite3-differential."""
    db = DustSession(spark)
    ref = sqlite3.connect(":memory:")
    ddl = "CREATE TABLE dv (a INTEGER, b INTEGER, r REAL, s TEXT)"
    rows = "INSERT INTO dv VALUES (7,2,2.5,'x'), (-9,4,0.5,'3'), (5,0,1.0,'y')"
    for c in (db.execute_string_stmt, lambda q: ref.execute(q)):
        c(ddl)
        c(rows)
    for q in [
        "SELECT a/b FROM dv ORDER BY a",
        "SELECT a/2 FROM dv ORDER BY a",
        "SELECT a/r FROM dv ORDER BY a",  # real operand: real division
        "SELECT a*b/2 FROM dv ORDER BY a",
        "SELECT (a+b)/2 FROM dv ORDER BY a",
        "SELECT dv.a/dv.b FROM dv ORDER BY a",
        "SELECT a FROM dv WHERE a/2 = 3 ORDER BY a",
        "SELECT sum(a)/count(*) FROM dv",
        "SELECT count(*) FROM dv WHERE 1 < '1'",
    ]:
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(v) for v in db.query_string_stmt(q)[0].values]
        assert got == want, f"{q}: spark={got!r} sqlite={want!r}"
    db.close()
    ref.close()


def test_text_operand_division(spark):
    """r9: SQLite arithmetic applies NUMERIC affinity to TEXT operands
    per cell — longest numeric prefix; an integer-formed prefix (or no
    prefix = 0) keeps INTEGER and both-int operands divide integrally.
    Literals fold statically; TEXT-affinity columns take the runtime
    prefix CASE (values compare numerically equal — the remaining
    per-cell result-TYPING divergence is documented in the module
    docstring). All sqlite3-differential."""
    db = DustSession(spark)
    ref = sqlite3.connect(":memory:")
    ddl = "CREATE TABLE td (s TEXT, a INTEGER, r REAL)"
    rows = (
        "INSERT INTO td VALUES ('7',2,2.0), ('7.5x',4,0.5), ('abc',3,1.0), "
        "(NULL,5,2.5), ('  12 ',6,4.0), ('9e1',7,3.0), ('-8',9,1.5)"
    )
    for c in (db.execute_string_stmt, lambda q: ref.execute(q)):
        c(ddl)
        c(rows)
    for q in [
        # literal folds (first rewrite pass, no column classes needed)
        "SELECT '7'/2",
        "SELECT '7abc'/2",
        "SELECT ' 8 '/2",
        "SELECT '7.5xyz'/2",
        "SELECT ''/2",
        "SELECT '7e1'/2",
        "SELECT '.5'/2",
        "SELECT 2/'4'",
        "SELECT '-7'/2",
        "SELECT '0x11'/2",
        "SELECT 'abc'/2",
        "SELECT '9'/'2'",
        "SELECT 'inf'/2",
        "SELECT '5.'/2",
        "SELECT '7'/0",
        "SELECT -'7'/2",
        # runtime TEXT-column cases (session's affinity-aware sweep)
        "SELECT s/2 FROM td ORDER BY a",
        "SELECT a/s FROM td ORDER BY a",
        "SELECT s/s FROM td ORDER BY a",
        "SELECT s/r FROM td ORDER BY a",
        "SELECT 1 + s/2 FROM td ORDER BY a",
        "SELECT a - s/2 FROM td ORDER BY a",
        "SELECT a FROM td WHERE s/a > 1 ORDER BY a",
    ]:
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(v) for v in db.query_string_stmt(q)[0].values]
        assert got == want, f"{q}: spark={got!r} sqlite={want!r}"
    # r9 second wave — the other arithmetic operators under the same
    # dynamic rules: % truncates BOTH operands to int64 (TEXT by the
    # INTEGER-prefix parse — '9e1' reads 9 not 90; REAL toward zero;
    # NOT fmod), + - * prefix-convert TEXT members (values coincide
    # between int and double paths)
    for q in [
        "SELECT '7'%'2.5'",
        "SELECT 7.5 % 2",
        "SELECT '9e1'%2",
        "SELECT '12x'%5",
        "SELECT '7'%0",
        "SELECT '7abc'+1",
        "SELECT ''-1",
        "SELECT '2.5x'*2",
        "SELECT s % 2 FROM td ORDER BY a",
        "SELECT r % a FROM td ORDER BY a",
        "SELECT a % 2.5 FROM td ORDER BY a",
        "SELECT s + 1 FROM td ORDER BY a",
        "SELECT s * a FROM td ORDER BY a",
        "SELECT a - s FROM td ORDER BY a",
        "SELECT s % s FROM td ORDER BY a",
        "SELECT a FROM td WHERE s + 1 > 8 ORDER BY a",
    ]:
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(v) for v in db.query_string_stmt(q)[0].values]
        assert got == want, f"{q}: spark={got!r} sqlite={want!r}"
    # fragment re-runs: the rewrite must be idempotent through stored
    # CHECK expressions and trigger bodies (both re-rewrite at eval/fire)
    frag_stmts = [
        "CREATE TABLE td2 (s TEXT, n INT, CHECK (n > '1'/2))",
        "CREATE TABLE lg (m INT)",
        "CREATE TRIGGER tr2 AFTER INSERT ON td2 BEGIN INSERT INTO lg VALUES (NEW.s/2); END",
        "INSERT INTO td2 VALUES ('7',1),('9x',2),('abc',3)",
        "INSERT INTO td2 VALUES ('5',0)",  # CHECK 0 > 0 fails
    ]
    for s2 in frag_stmts:
        try:
            ref.execute(s2)
            werr = None
        except sqlite3.Error as e:
            werr = str(e)
        gerr = db.execute_string_stmt(s2)[0].error or None
        assert (gerr is None) == (werr is None), (s2, werr, gerr)
    for q in ["SELECT s, n FROM td2 ORDER BY n", "SELECT m FROM lg ORDER BY rowid"]:
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(v) for v in db.query_string_stmt(q)[0].values]
        assert got == want, (q, got, want)
    db.close()
    ref.close()


def test_text_arith_chains(spark):
    """r10 (verdict #1): 3+-member arithmetic chains with runtime TEXT
    column members — the frag compiler (_compile_add/_compile_mul)
    propagates int-formedness left-associatively, so '9x'/2/2 = 2 via
    two integer divisions (not 4.0/2), parenthesized sub-chains keep
    their interior int-formedness ((tx+1)/2 integer-divides when tx+1
    is int-formed), and mixed precedence binds like SQLite
    (tx + 1/2 adds the integer 0). All sqlite3-differential; values
    asserted numerically (int-FORM stays the documented per-cell
    typing divergence)."""
    db = DustSession(spark)
    ref = sqlite3.connect(":memory:")
    ddl = "CREATE TABLE tc (id INTEGER PRIMARY KEY, tx TEXT, r REAL, i INTEGER)"
    ins = (
        "INSERT INTO tc VALUES (1,'7',2.5,9), (2,'7abc',0.5,-7), "
        "(3,'',7.5,4), (4,'9e1',-2.5,0), (5,'  -3.5x',100.0,15), "
        "(6,NULL,NULL,NULL), (7,'0x11',3.0,2), (8,'12.',0.0,1)"
    )
    for c in (db.execute_string_stmt, lambda q: ref.execute(q)):
        c(ddl)
        c(ins)
    for e in [
        "tx/2/2", "tx+1+1", "tx*2*2", "tx-1-1", "tx%3%2",
        "tx/2+1", "tx+1/2", "tx*2+tx", "tx/2/2/2",
        "r%2/2", "tx%r%2", "i/tx/2", "1+tx+1", "tx/i/2",
        "tx*2-1+3", "2*tx/4", "tx/2*3", "i%tx+1", "r/tx+i",
        "tx+tx+tx", "tx/2 - tx/3", "tx + i/2", "tx + i%2*3",
        "i + tx/2 - 1", "tx % 2 + r", "-tx/2/2", "- tx / 2 + 1",
        "(tx+1)/2", "(tx||'2')/2/2", "i/2/tx", "(tx*2)%(i+1)",
        "((tx+1)/2)/2", "(tx+1)*(tx-1)", "(r+tx)/2", "3*(tx+1)/2",
        "(tx)/(2)", "tx/(1+1)",
    ]:
        q = f"SELECT id, {e} AS v FROM tc ORDER BY id"
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(v) for v in db.query_string_stmt(q)[0].values]
        assert got == want, f"{q}: spark={got!r} sqlite={want!r}"
    db.close()
    ref.close()


def test_comparison_affinity_typed_columns(spark):
    """Comparison affinity on declared-affinity columns (r8,
    datatype3.html §4.2): a numeric column vs a NON-numeric text
    literal folds to the storage-class constant (NULL-propagating);
    TEXT column vs INTEGER literal text-compares against the literal's
    canonical TEXT form ('0x11' → '17'); any typed column vs a BLOB
    literal folds (blob outranks all). Convertible numeric text
    ('7', ' 5 ', '1e1') keeps the engine's numeric compare.
    Second wave: two typed COLUMNS get the per-row NUMERIC-affinity
    CASE (numeric text compares numerically, junk by storage class);
    no-affinity INTEGER expressions (length(x), -a) compare by storage
    class against literals and get TEXT affinity applied against a
    TEXT column (rendered-int text compare). Chain operands (t > a+1)
    remain documented. sqlite3-differential."""
    db = DustSession(spark)
    ref = sqlite3.connect(":memory:")
    ddl = "CREATE TABLE cx (a INT, t TEXT, r REAL)"
    rows = (
        "INSERT INTO cx VALUES (7, '7', 7.5), (NULL, NULL, NULL), "
        "(3, 'abc', 2.0), (-5, '05', -1.5)"
    )
    for c in (db.execute_string_stmt, lambda q: ref.execute(q)):
        c(ddl)
        c(rows)
    for q in [
        "SELECT a, a > 'abc' FROM cx",
        "SELECT a, a < 'abc' FROM cx",
        "SELECT a, a = '7' FROM cx",  # converts: numeric compare
        "SELECT a, a >= ' 5 ' FROM cx",  # whitespace-padded converts
        "SELECT t, t > 5 FROM cx",  # literal text-compared as '5'
        "SELECT t, t = 7 FROM cx",
        "SELECT t, t = 0x11 FROM cx",  # hex literal → '17'
        "SELECT t, t >= -5 FROM cx",
        "SELECT r, r < 'x9' FROM cx",
        "SELECT a, a < x'00' FROM cx",
        "SELECT t, t < x'00' FROM cx",
        "SELECT a FROM cx WHERE a > 'abc'",
        "SELECT a FROM cx WHERE a < 'abc' ORDER BY a",
        "SELECT t FROM cx WHERE t > 5 ORDER BY t",
        "SELECT a, 'abc' < a FROM cx",  # literal on the left
        "SELECT count(*) FROM cx WHERE t <> 99",
        # two typed COLUMNS: per-row NUMERIC affinity on the text side
        "SELECT a, t, a > t FROM cx",
        "SELECT a, t, a = t FROM cx",
        "SELECT r, t, r >= t FROM cx",
        "SELECT a FROM cx WHERE t < a ORDER BY a",
        # no-affinity INT expressions: storage order vs text literal,
        # TEXT affinity applied against a TEXT column
        "SELECT length(t), length(t) > '5' FROM cx",
        "SELECT a, -a < t FROM cx",
        "SELECT t, t > length(t) FROM cx",
    ]:
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(v) for v in db.query_string_stmt(q)[0].values]
        assert got == want, f"{q}: spark={got!r} sqlite={want!r}"
    db.close()
    ref.close()


AGG_CASES = [
    # r6: DISTINCT group_concat first-occurrence order; avg REAL
    # affinity counts junk text as 0.0 in the denominator
    "SELECT group_concat(DISTINCT s) FROM (SELECT s FROM t ORDER BY id)",
    "SELECT ROUND(avg(s), 4) FROM t",
    "SELECT avg(v) FROM t",
    "SELECT total(v) FROM t",
    "SELECT total(v) FROM t WHERE v > 99",
    "SELECT sum(v) FROM t WHERE v > 99",
    "SELECT group_concat(s) FROM t",
    "SELECT group_concat(s, '|') FROM t",
    "SELECT count(*) - count(v) FROM t",
    # json1 aggregates: typed element serialization, NULL kept as JSON
    # null, empty group -> '[]' / '{}', subtype composition embeds raw
    "SELECT json_group_array(v) FROM t",
    "SELECT json_group_array(s) FROM t",
    "SELECT json_group_array(v) FROM t WHERE v > 99",
    "SELECT json_group_object(s, v) FROM t",
    "SELECT json_group_object(s, v) FROM t WHERE v > 99",
    "SELECT json_group_array(json_object('k', v)) FROM t",
]


@pytest.fixture(scope="module")
def agg_tables(db, ref):
    db.execute_string_stmt("CREATE TABLE t (id INTEGER NOT NULL PRIMARY KEY, v INT, s TEXT)")
    db.execute_string_stmt("INSERT INTO t(v, s) VALUES (3,'c'), (1,'a'), (2,'b'), (NULL,'d')")
    ref.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v INT, s TEXT)")
    ref.execute("INSERT INTO t(v, s) VALUES (3,'c'), (1,'a'), (2,'b'), (NULL,'d')")
    return db, ref


@pytest.mark.parametrize("q", AGG_CASES)
def test_aggregate_matches_sqlite(agg_tables, q):
    db, ref = agg_tables
    want = ref.execute(q).fetchone()[0]
    rs = db.query_string_stmt(q)
    got = rs[0].values[0][0] if rs and rs[0].values else None
    assert str(got) == str(want), f"{q}: spark={got!r} sqlite={want!r}"


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


@pytest.mark.parametrize("q", CASES)
def test_scalar_fn_matches_sqlite(db, ref, q):
    want = ref.execute(q).fetchone()[0]
    rs = db.query_string_stmt(q)
    got = rs[0].values[0][0] if rs and rs[0].values else None
    assert str(got) == str(want), f"{q}: spark={got!r} sqlite={want!r}"


JSON_CASES = [
    # typed extraction over VARIANT (r6): json ints come back INTEGER,
    # strings raw text, containers as json text, json null → SQL NULL
    "SELECT json_extract('{\"a\":[1,2,{\"b\":3}]}', '$.a[2].b')",
    "SELECT json_extract('{\"a\":1,\"b\":2}', '$.a', '$.b')",
    "SELECT json_extract('{\"a\":\"tx\"}', '$.a')",
    "SELECT json_extract('{\"a\":{\"b\":1}}', '$.a')",
    "SELECT json_extract('{\"a\":true}', '$.a'), json_extract('{\"a\":false}', '$.a')",
    "SELECT json_extract('{\"a\":null}', '$.a') IS NULL",
    "SELECT json_extract('{\"a\":3.5}', '$.a')",
    "SELECT json_extract('{\"a\":1}', '$.zz') IS NULL",
    "SELECT '{\"a\":5}' ->> 'a', '{\"a\":\"s\"}' ->> 'a', '{\"a\":[1]}' ->> 'a'",
    "SELECT json_array_length('{\"a\":1}'), json_array_length('3')",
    "SELECT json_array_length('{\"a\":[5,6]}', '$.a')",
    "SELECT json_array_length('{\"a\":[5,6]}', '$.b') IS NULL",
    "SELECT json_type('{\"a\":null}', '$.a'), json_type('{\"a\":3}', '$.a')",
    "SELECT json_type('{\"a\":\"t\"}', '$.a'), json_type('{\"a\":true}', '$.a')",
    "SELECT json_type('{\"a\":[1]}', '$.a'), json_type('{\"a\":{}}', '$.a')",
    "SELECT json_type('[3]', '$[9]') IS NULL",
    'SELECT json_extract(\'{"a": 1, "b": {"c": [5,6]}}\', \'$.a\')',
    'SELECT json_extract(\'{"a": 1, "b": {"c": [5,6]}}\', \'$.b.c[1]\')',
    'SELECT json_extract(\'{"a": "txt"}\', \'$.a\')',
    'SELECT json_extract(\'{"a": 1}\', \'$.missing\')',
    'SELECT json_extract(\'{"b": {"c": 1}}\', \'$.b\')',
    "SELECT json_array(1, 2, 'x')",
    "SELECT json_array()",
    "SELECT json_array(NULL, 2.5, 'he\"llo')",
    "SELECT json_object('a', 1, 'b', 'two')",
    "SELECT json_object()",
    "SELECT json_array_length('[1,2,3]')",
    "SELECT json_valid('{\"a\":1}')",
    "SELECT json_valid('nope{')",
    "SELECT json_valid(NULL)",
    "SELECT json_type('{\"a\":1}')",
    "SELECT json_type('[1]')",
    "SELECT json_type('\"x\"')",
    "SELECT json_type('3')",
    "SELECT json_type('3.5')",
    "SELECT json_type('true')",
    "SELECT json_type('null')",
    "SELECT json('{\"a\":  1}')",
    "SELECT json_quote('hi')",
    "SELECT json_quote(7)",
    # duplicate object keys: legal in SQLite (json_valid=1, kept by
    # json() minification) but rejected by Spark's VARIANT parser —
    # covered by the Jackson get_json_object fallback in the dialect
    "SELECT json_valid('{\"a\":0,\"a\":0}')",
    "SELECT json_type('{\"a\":0,\"a\":0}')",
    "SELECT json('{\"a\":0, \"a\":1}')",
    "SELECT json('[1, {\"a\":0,\"a\":1}]')",
    "SELECT json_type(json_object('a', 0, 'a', 0))",
]


@pytest.mark.parametrize("q", JSON_CASES)
def test_json1_matches_sqlite(db, ref, q):
    want = ref.execute(q).fetchone()[0]
    rs = db.query_string_stmt(q)
    got = rs[0].values[0][0] if rs and rs[0].values else None
    assert str(got) == str(want), f"{q}: spark={got!r} sqlite={want!r}"


JSON_MUTATE_CASES = [
    'SELECT json_set(\'{"a":1}\', \'$.b\', 5)',
    "SELECT json_set('{\"a\":1}', '$.a', 'x')",
    "SELECT json_set('{\"a\":1}', '$.a', '\"x\"')",
    'SELECT json_insert(\'{"a":1}\', \'$.a\', 9, \'$.c\', 3)',
    'SELECT json_replace(\'{"a":1}\', \'$.a\', 9, \'$.c\', 3)',
    'SELECT json_remove(\'{"a":1,"b":2}\', \'$.b\')',
    "SELECT json_remove('[1,2,3]', '$[1]')",
    "SELECT json_set('{}', '$.a.b', 1)",
    "SELECT json_set('[1,2]', '$[2]', 9)",
    "SELECT json_set('{\"a\": true}', '$.a', false)",
    "SELECT json_remove('[1,2,3]', '$[0]', '$[1]')",
    "SELECT json_set('{\"a\":1}', '$.b', json_array(1, 'x'))",
    # r7: '$[#-N]' from-end paths (former documented divergence) —
    # extraction via the Python json1 navigator re-parsed to VARIANT,
    # mutations via the shared parse_path step grammar
    "SELECT json_extract('[1,2,3,4]', '$[#-1]')",
    "SELECT json_extract('[1,2,3,4]', '$[#-2]')",
    "SELECT json_extract('{\"a\":[5,6]}', '$.a[#-1]')",
    "SELECT json_extract('[[1,2],[3,4,5]]', '$[#-1][#-1]')",
    "SELECT json_extract('[1,2]', '$[#]')",
    "SELECT json_extract('[1,2]', '$[#-0]')",
    "SELECT json_extract('[1,2]', '$[#-5]')",
    "SELECT json_extract('[\"x\",\"y\"]', '$[#-1]')",
    "SELECT '[1,2]' -> '$[#-1]'",
    "SELECT '[1,2]' ->> '$[#-1]'",
    "SELECT json_set('[1,2]', '$[#]', 9)",
    "SELECT json_insert('[1,2]', '$[#]', 9)",
    "SELECT json_replace('[1,2]', '$[#]', 9)",
    "SELECT json_set('[1,2,3]', '$[#-1]', 'z')",
    "SELECT json_remove('[1,2,3]', '$[#-1]')",
    "SELECT json_type('[1,2]', '$[#-1]')",
    "SELECT json_array_length('[[1],[2,3]]', '$[#-1]')",
    # hex(NULL) is '' (r7, found via the trigger-body differential)
    "SELECT hex(NULL)",
    "SELECT 'a'||hex(NULL)||'b'",
    "SELECT json_array(json_array(1,2), 3)",
    "SELECT json_object('a', json_object('b', 1))",
    "SELECT json_array(json_quote('x'))",
    "SELECT json_array(1, 'plain')",
    "SELECT json_insert('[1,2]', '$[2]', json_object('k', 'v'))",
    # RFC-7386 merge patch: null deletes, nested objects recurse,
    # non-object patch replaces wholesale
    # -> / ->> JSON operators (json1, SQLite 3.38+); ->> of a json
    # NUMBER flattens to TEXT here where SQLite returns INTEGER/REAL —
    # the documented dynamic-typing divergence (module docstring)
    "SELECT '{\"a\":{\"b\":2}}' -> 'a'",
    "SELECT '{\"a\":\"txt\"}' -> 'a'",
    "SELECT '{\"a\":\"txt\"}' ->> 'a'",
    "SELECT '[1,2,3]' -> 1",
    "SELECT '{\"a\":{\"b\":2}}' -> '$.a.b'",
    "SELECT '{\"a\":1}' -> 'zz'",
    "SELECT '{\"a\":null}' -> 'a'",
    "SELECT '{\"a\":1}' -> 'a'",
    'SELECT json_patch(\'{"a":1,"b":2}\', \'{"b":null,"c":3}\')',
    'SELECT json_patch(\'{"a":{"x":1,"y":2}}\', \'{"a":{"y":null,"z":9}}\')',
    'SELECT json_patch(\'{"a":1}\', \'[5]\')',
    "SELECT json_patch('{\"a\":1}', json_object('b', 2))",
    "SELECT sqlite_version()",
    # hex() hexes the TEXT bytes (numbers convert to text first; blobs
    # hex raw bytes; letters uppercase)
    "SELECT hex(3)",
    "SELECT hex('z')",
    "SELECT hex('ab')",
    "SELECT hex(-12)",
    "SELECT hex(zeroblob(2))",
]


# JSON arrow composed with arithmetic (r10, the ADVICE-flagged shape):
# the r9 TEXT-arithmetic folds treated a path literal on the RHS of
# -> / ->> as an arithmetic operand and folded it to its numeric prefix
# ("SELECT data ->> 'price' * 2" became data ->> (0 * 2)).  Fixed by
# _TypedPass._after_arrow guards + arrow-postfix primaries: the arrow
# chain now classes as one TEXT member, so SQLite's numeric-prefix
# conversion applies to the EXTRACTED value.  Values are asserted
# numerically — the int-FORM (10 vs 10.0) is the documented per-cell
# dynamic-typing divergence (module docstring).
ARROW_ARITH_CASES = [
    "SELECT '{\"price\":5}' ->> 'price' * 2",
    "SELECT '{\"price\":5}' -> 'price' * 2",
    "SELECT '{\"a\":2.5}' ->> 'a' + 1",
    "SELECT '{\"a\":7}' ->> 'a' / 2",
    "SELECT '{\"a\":7}' ->> 'a' % 3",
    "SELECT '[10,20]' -> 1 / 2",
    "SELECT '[10,20]' ->> 1 - 5",
    "SELECT '{\"p\":\"x\"}' ->> 'p' || 'y' * 2",
    "SELECT 2 * '{\"price\":5}' ->> 'price'",
    "SELECT '{\"a\":{\"b\":3}}' -> 'a' ->> 'b' * 4",
    "SELECT '{\"a\":\"7abc\"}' ->> 'a' * 3",
    "SELECT '{\"a\":\"\"}' ->> 'a' + 1",
    "SELECT '{\"a\":[1,2]}' -> 'a' ->> 0 * 6",
]


@pytest.mark.parametrize("q", ARROW_ARITH_CASES)
def test_json_arrow_arithmetic_matches_sqlite(db, ref, q):
    want = ref.execute(q).fetchone()[0]
    rs = db.query_string_stmt(q)
    got = rs[0].values[0][0] if rs and rs[0].values else None
    if want is None:
        assert got is None, f"{q}: spark={got!r} sqlite=None"
    else:
        assert got is not None and float(got) == float(want), (
            f"{q}: spark={got!r} sqlite={want!r}"
        )


@pytest.mark.parametrize("q", JSON_MUTATE_CASES)
def test_json_mutation_matches_sqlite(db, ref, q):
    want = ref.execute(q).fetchone()[0]
    rs = db.query_string_stmt(q)
    got = rs[0].values[0][0] if rs and rs[0].values else None
    assert str(got) == str(want), f"{q}: spark={got!r} sqlite={want!r}"


def test_json_each_table_function(db, ref):
    """json_each as a FROM-clause table function (Python UDTF). The key
    and value columns are string-typed on our wire (SQLite returns
    dynamic values) — the rendered content matches."""
    q = "SELECT key, value, type FROM json_each('[1, \"x\", null]')"
    got = db.query_string_stmt(q)[0].values
    want = [[str(k) if k is not None else None, None if v is None else str(v), t]
            for k, v, t in ref.execute(q).fetchall()]
    assert got == want
    q2 = 'SELECT key, value, type FROM json_each(\'{"a": 1, "b": [2,3]}\')'
    got2 = db.query_string_stmt(q2)[0].values
    want2 = [[str(k), None if v is None else str(v), t] for k, v, t in ref.execute(q2).fetchall()]
    assert got2 == want2
    # 2-arg form roots iteration at a path; fullkey/path prefix with it
    q3 = "SELECT key, value, fullkey, path FROM json_each('{\"a\":{\"b\":[1,2]}}', '$.a.b')"
    got3 = db.query_string_stmt(q3)[0].values
    want3 = [[str(k), str(v), fk, p] for k, v, fk, p in ref.execute(q3).fetchall()]
    assert got3 == want3
    # missing path -> zero rows (both engines)
    q4 = "SELECT count(*) AS n FROM json_each('{\"a\":1}', '$.zz')"
    assert db.query_string_stmt(q4)[0].values == [[r for r in ref.execute(q4).fetchone()]]


_TREE_DOC = '{"a":[1,2,{"x":true}],"b":{"c":null,"d":"s"},"e":2.5}'


def test_json_tree_table_function(db, ref):
    """json_tree (r7): full recursive walk in SQLite's 8-column shape,
    including the JSONB-derived id/parent numbering (preorder token
    count; object keys consume a slot — sqlite3-probed).  key/value/
    atom are string-typed on our wire, so the comparison CASTs the
    SQLite side to TEXT (bit-identical rendering)."""
    q = (
        "SELECT CAST(key AS TEXT) AS k, CAST(value AS TEXT) AS v, type, "
        "CAST(atom AS TEXT) AS a, id, parent, fullkey, path "
        f"FROM json_tree('{_TREE_DOC}')"
    )
    got = db.query_string_stmt(q)[0].values
    want = [list(r) for r in ref.execute(q).fetchall()]
    assert got == want
    # rooted: subtree root keeps its key, parent NULL, ids still global
    q2 = (
        "SELECT CAST(key AS TEXT) AS k, id, parent, fullkey, path "
        f"FROM json_tree('{_TREE_DOC}', '$.a')"
    )
    assert db.query_string_stmt(q2)[0].values == [
        list(r) for r in ref.execute(q2).fetchall()
    ]
    # scalar root: path is the PARENT's fullkey in tree mode (vs the
    # node's own fullkey in each mode — both probed)
    for fn in ("json_tree", "json_each"):
        q3 = (
            "SELECT CAST(key AS TEXT) AS k, CAST(value AS TEXT) AS v, "
            "CAST(atom AS TEXT) AS a, id, parent, fullkey, path "
            f"FROM {fn}('{{\"a\":{{\"b\":7}}}}', '$.a.b')"
        )
        assert db.query_string_stmt(q3)[0].values == [
            list(r) for r in ref.execute(q3).fetchall()
        ], fn
    # missing path -> zero rows
    q4 = f"SELECT count(*) AS n FROM json_tree('{_TREE_DOC}', '$.zz')"
    assert db.query_string_stmt(q4)[0].values == [
        list(ref.execute(q4).fetchone())
    ]


def test_json_tree_fullkey_quoting(db, ref):
    """fullkey quoting rule (probed): bare only for [A-Za-z][A-Za-z0-9]*
    — underscores, dots, spaces, quotes, unicode and the empty key all
    JSON-escape inside double quotes.  (SQLite echoes the key's RAW
    source escaping — a doc written with '\\u00e4' keeps the escape in
    fullkey where we re-serialize the decoded char; documented, so the
    test uses the literal char.)"""
    doc = '{"a b":1,"c.d":2,"e\\"f":3,"":4,"_x":5,"ok1":6,"ä":7}'
    q = (
        "SELECT fullkey, id, parent FROM "
        f"json_tree('{doc}') WHERE key IS NOT NULL ORDER BY id"
    )
    assert db.query_string_stmt(q)[0].values == [
        list(r) for r in ref.execute(q).fetchall()
    ]


def test_json_each_full_schema(db, ref):
    """json_each's atom/id/parent columns (r7: the 5-column wire grew to
    SQLite's full 8): parent is ALWAYS NULL for json_each (probed), ids
    match json_tree's global numbering."""
    q = (
        "SELECT CAST(key AS TEXT) AS k, CAST(atom AS TEXT) AS a, "
        f"id, parent FROM json_each('{_TREE_DOC}')"
    )
    assert db.query_string_stmt(q)[0].values == [
        list(r) for r in ref.execute(q).fetchall()
    ]


WINDOW_CASES = [
    "SELECT s, row_number() OVER (ORDER BY v, s) FROM wt ORDER BY s",
    "SELECT s, rank() OVER (ORDER BY v) FROM wt ORDER BY s",
    "SELECT s, dense_rank() OVER (ORDER BY v) FROM wt ORDER BY s",
    "SELECT s, lag(s) OVER (ORDER BY v, s) FROM wt ORDER BY s",
    "SELECT s, lead(s, 1, 'zz') OVER (ORDER BY v, s) FROM wt ORDER BY s",
    "SELECT s, sum(v) OVER (ORDER BY v, s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM wt ORDER BY s",
    "SELECT s, ntile(2) OVER (ORDER BY v, s) FROM wt ORDER BY s",
    "SELECT s, first_value(s) OVER (ORDER BY v, s) FROM wt ORDER BY s",
    "SELECT s, sum(v) OVER (PARTITION BY v % 2 ORDER BY s) FROM wt ORDER BY s",
    "SELECT s, avg(v) OVER (ORDER BY v, s ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) FROM wt ORDER BY s",
    "SELECT s, nth_value(s, 2) OVER (ORDER BY v, s ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM wt ORDER BY s",
    "SELECT s, last_value(s) OVER (ORDER BY v, s ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) FROM wt ORDER BY s",
    "SELECT s, cume_dist() OVER (ORDER BY v) FROM wt ORDER BY s",
    "SELECT s, percent_rank() OVER (ORDER BY v) FROM wt ORDER BY s",
    "SELECT s, group_concat(s, '+') OVER (ORDER BY v, s) FROM wt ORDER BY s",
    "SELECT sum(v) FILTER (WHERE v > 1) FROM wt",
    "SELECT count(*) FILTER (WHERE s < 'c') FROM wt",
]


@pytest.fixture(scope="module")
def window_tables(db, ref):
    db.execute_string_stmt("CREATE TABLE wt (id INTEGER NOT NULL PRIMARY KEY, v INT, s TEXT)")
    db.execute_string_stmt("INSERT INTO wt(v, s) VALUES (3,'c'), (1,'a'), (2,'b'), (2,'d')")
    ref.execute("CREATE TABLE wt (id INTEGER PRIMARY KEY, v INT, s TEXT)")
    ref.execute("INSERT INTO wt(v, s) VALUES (3,'c'), (1,'a'), (2,'b'), (2,'d')")
    return db, ref


@pytest.mark.parametrize("q", WINDOW_CASES)
def test_window_fn_matches_sqlite(window_tables, q):
    """SQLite >=3.25 window functions through the engine (SURVEY B5) —
    incl. aggregate FILTER clauses and windowed group_concat."""
    db, ref = window_tables
    want = [list(r) for r in ref.execute(q).fetchall()]
    got = [list(r) for r in db.query_string_stmt(q)[0].values]
    assert str(got) == str(want), f"{q}: spark={got!r} sqlite={want!r}"


def test_comparison_affinity_chain_operands(spark):
    """r9 third wave: comparison operands may be provably-typed
    ARITHMETIC CHAINS (+ - * over INT/REAL members) — a chain carries
    NO affinity (sqlite3-probed), so a TEXT column renders the INT
    chain to text (t > a+1 compares strings) and a TEXT literal folds
    by storage class against any numeric chain (a*2 = '2x' is 0, not
    NULL). / % div chains stay conservative (dynamic result class)."""
    db = DustSession(spark)
    ref = sqlite3.connect(":memory:")
    for s in (
        "CREATE TABLE z (t TEXT, a INT, r REAL)",
        "INSERT INTO z VALUES ('5',9,1.5),('abc',1,2.5),('100',50,0.5),"
        "(NULL,3,1.0),('42',-7,2.0)",
    ):
        ref.execute(s)
        assert db.execute_string_stmt(s)[0].error == ""
    for q in [
        "SELECT t, a, t > a+1 FROM z ORDER BY a",
        "SELECT a+1 > '5x' FROM z ORDER BY a",
        "SELECT a+1 < 'x' FROM z ORDER BY a",
        "SELECT a*2 = '2x' FROM z ORDER BY a",
        "SELECT t > a*2+1 FROM z ORDER BY a",
        "SELECT 1+2 < '0'",
        "SELECT r+1 > 'x' FROM z ORDER BY a",
        "SELECT a FROM z WHERE t >= a+1 ORDER BY a",
        "SELECT a*2-1 <> 'q' FROM z ORDER BY a",
        "SELECT CASE WHEN t > a+1 THEN 'y' ELSE 'n' END FROM z ORDER BY a",
        # / and % chains class too (typeof probed: a/2 INTEGER, r/2 REAL)
        "SELECT 99/3 = '33'",
        "SELECT a/2 = '3' FROM z ORDER BY a",
        "SELECT t > a/2 FROM z ORDER BY a",
        "SELECT a%2 < 'x' FROM z ORDER BY a",
        "SELECT '7'/2 = '3x'",
        "SELECT a FROM z WHERE t < a/2 ORDER BY a",
        # || binds tighter than arithmetic in SQLite (r9 fourth wave:
        # ||-chains adjacent to arithmetic get parenthesized AND the
        # concat result, classed TEXT, takes the prefix conversion)
        "SELECT 'a' || '7' * 2",
        "SELECT 'a' || '7' + 2",
        "SELECT 2 + 'a' || '7'",
        "SELECT t || 'x' || '1' * 2 FROM z ORDER BY a",
        "SELECT ('12'||'0') / 2",
        "SELECT CAST('9' AS TEXT) + 1",
        # static 3+-member chains: literals convert independently
        "SELECT '7'/2/2",
        "SELECT 1+'2'+'3'",
        "SELECT '10'%'4'%'3'",
        "SELECT '7.5x'*2*2",
        "SELECT -'7'",
        "SELECT -'abc'",
        "SELECT +'7' < 2",
    ]:
        want = [list(r) for r in ref.execute(q).fetchall()]
        got = [list(v) for v in db.query_string_stmt(q)[0].values]
        assert got == want, f"{q}: spark={got!r} sqlite={want!r}"
    db.close()
    ref.close()
