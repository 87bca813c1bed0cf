"""json1 mutation + table-valued surface: json_set / json_insert /
json_replace / json_remove and the json_each UDTF.

The reference delegates these to SQLite's json1 extension; here the
mutators run as one registered scalar UDF (``__json_mutate``) whose
(path, value) pairs arrive PRE-SERIALIZED to JSON text by the dialect
rewriter's per-argument ``_JV`` trick — that reproduces SQLite's rule
that SQL text values insert as JSON strings (json_set(j,'$.a','x') →
"x"), while numbers/booleans/nulls keep their types. Small-data,
row-at-a-time by design: these are engine (DustSession) functions, not
catalog operators — the no-BatchEvalPython plan rule covers the
analytics catalog only.
"""

from __future__ import annotations

import json
import re

_STEP_RE = re.compile(r"\.([^.\[\]]+)|\[(\d+)\]|\[#(?:-(\d+))?\]")


def parse_path(path: str) -> list:
    """'$.a.b[2]' → [('key','a'), ('key','b'), ('idx',2)]; raises on
    malformed paths (mirrors SQLite's 'JSON path error')."""
    if not path.startswith("$"):
        raise ValueError(f"JSON path error near {path!r}")
    steps, pos = [], 1
    while pos < len(path):
        m = _STEP_RE.match(path, pos)
        if not m:
            raise ValueError(f"JSON path error near {path[pos:]!r}")
        if m.group(1) is not None:
            steps.append(("key", m.group(1)))
        elif m.group(2) is not None:
            steps.append(("idx", int(m.group(2))))
        else:
            # '$[#-n]' = n-from-end; bare '$[#]' = one-past-end (the
            # append position for set/insert, out of range to read)
            steps.append(("end", int(m.group(3) or 0)))
        pos = m.end()
    return steps


def _navigate(doc, steps, create: bool):
    """Walk to the parent of the final step; returns (parent, last_step)
    or (None, None) when the path can't resolve (and create is False)."""
    cur = doc
    for kind, key in steps[:-1]:
        if kind == "key":
            if not isinstance(cur, dict):
                return None, None
            if key not in cur:
                if not create:
                    return None, None
                cur[key] = {}
            cur = cur[key]
        else:
            if not isinstance(cur, list):
                return None, None
            i = key if kind == "idx" else len(cur) - key
            if not (0 <= i < len(cur)):
                return None, None
            cur = cur[i]
    return cur, steps[-1]


def mutate(j: str, mode: str, pairs_json: str) -> str | None:
    """Apply (path, value) pairs to JSON text ``j``.

    mode: 'set' (create or overwrite), 'insert' (create only),
    'replace' (overwrite only), 'remove' (values ignored).
    """
    if j is None:
        return None
    doc = json.loads(j)
    for path, value in json.loads(pairs_json):
        if isinstance(value, bool):
            value = int(value)  # SQLite has no bool: SQL TRUE/FALSE → 1/0
        steps = parse_path(path)
        if not steps:  # '$' root
            if mode in ("set", "replace"):
                doc = value
            continue
        parent, last = _navigate(doc, steps, create=mode in ("set", "insert"))
        if parent is None:
            continue
        kind, key = last
        if kind == "key":
            if not isinstance(parent, dict):
                continue
            exists = key in parent
            if mode == "remove":
                if exists:
                    del parent[key]
            elif (
                mode == "set"
                or (mode == "insert" and not exists)
                or (mode == "replace" and exists)
            ):
                parent[key] = value
        else:
            if not isinstance(parent, list):
                continue
            i = key if kind == "idx" else len(parent) - key
            exists = 0 <= i < len(parent)
            if mode == "remove":
                if exists:
                    del parent[i]
            elif exists and mode in ("set", "replace"):
                parent[i] = value
            elif not exists and mode in ("set", "insert") and i == len(parent):
                parent.append(value)
    return json.dumps(doc, separators=(",", ":"), ensure_ascii=False)


def extract_json_text(j: str, path: str) -> str | None:
    """Single-path json_extract for path forms Spark's variant_get
    cannot express ('$[#-N]' from-end indexing, sqlite json1 docs):
    returns the extracted value re-serialized as JSON text (None when
    the path doesn't resolve), for re-parsing to VARIANT on the SQL
    side so the typed-extraction contract is identical to the
    variant_get fast path."""
    if j is None:
        return None
    steps = parse_path(path)  # malformed path raises, like SQLite
    try:
        cur = json.loads(j)
    except Exception:
        return None
    for kind, key in steps:
        if kind == "key":
            if not isinstance(cur, dict) or key not in cur:
                return None
            cur = cur[key]
        else:
            if not isinstance(cur, list):
                return None
            i = key if kind == "idx" else len(cur) - key
            if not (0 <= i < len(cur)):
                return None
            cur = cur[i]
    return json.dumps(cur, separators=(",", ":"), ensure_ascii=False)


def _json_type(v) -> str:
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "real"
    if isinstance(v, str):
        return "text"
    return "object" if isinstance(v, dict) else "array"


_KEYID_RE = re.compile(r"^[A-Za-z][A-Za-z0-9]*$")


def _fullkey_step(prefix: str, key) -> str:
    """Append one step to a fullkey the way SQLite renders it
    (sqlite3-probed): array index `[i]`; object keys bare ONLY when
    they match [A-Za-z][A-Za-z0-9]* (underscores quote!), otherwise
    JSON-escaped inside double quotes ($."a b", $."e\\"f", $."")."""
    if isinstance(key, int):
        return f"{prefix}[{key}]"
    if _KEYID_RE.match(key):
        return f"{prefix}.{key}"
    return f'{prefix}."' + json.dumps(key, ensure_ascii=False)[1:-1] + '"'


def _render(v):
    """SQLite's json_each/json_tree value/atom rendering, string-typed
    on our wire (SQLite returns dynamic values — CAST(x AS TEXT) on the
    SQLite side matches bit-for-bit; documented divergence)."""
    if v is None:
        return None
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"), ensure_ascii=False)
    if v is True:
        return "1"
    if v is False:
        return "0"
    return str(v)


def _resolve_steps(doc, path: str):
    """User root path → absolute (str key | int index) tuple against
    ``doc``; None when the path doesn't resolve (→ zero rows, probed)."""
    out: list = []
    cur = doc
    try:
        steps = parse_path(path)
    except Exception:
        return None
    for kind, v in steps:
        if kind == "key" and isinstance(cur, dict) and v in cur:
            cur = cur[v]
            out.append(str(v))
        elif kind == "idx" and isinstance(cur, list) and 0 <= v < len(cur):
            cur = cur[v]
            out.append(v)
        elif kind == "end" and isinstance(cur, list) and 0 <= len(cur) - v < len(cur):
            i = len(cur) - v  # '$[#-n]' (same rule as _navigate)
            cur = cur[i]
            out.append(i)
        else:
            return None
    return tuple(out)


def tree_rows(j: str, path: str | None = None, each: bool = False):
    """json_tree (and, with ``each=True``, json_each) rows in SQLite's
    8-column shape: (key, value, type, atom, id, parent, fullkey,
    path).  All sqlite3-probed:

    - ``id`` is a preorder token count over the WHOLE document (even
      when rooted at a path): every container/scalar node takes one
      slot at entry and every object KEY takes one slot before its
      value's subtree — reproduces the ids SQLite derives from its
      JSONB encoding.
    - json_tree emits the (sub)tree root row with parent NULL and
      recurses; json_each emits only the root's immediate children
      (or the root itself when it is a scalar) with parent always
      NULL and key NULL on the scalar-self row.
    - ``path`` is the parent's fullkey ('$' for the document root);
      json_each's scalar-self row uses its own fullkey instead.
    - a root path that doesn't resolve yields no rows; malformed JSON
      raises (SQLite: 'malformed JSON')."""
    if j is None:
        return
    doc = json.loads(j)
    target: tuple = ()
    if path is not None:
        t = _resolve_steps(doc, path)
        if t is None:
            return
        target = t
    rows: list = []
    counter = [0]

    def visit(node, key, parent_id, fullkey, parent_fullkey, cur):
        nid = counter[0]
        counter[0] += 1
        depth = len(cur)
        if depth >= len(target) and cur[: len(target)] == target:
            is_root = depth == len(target)
            scalar = not isinstance(node, (dict, list))
            emit = (
                (depth == len(target) + 1 or (is_root and scalar))
                if each
                else True
            )
            if emit:
                if is_root and (
                    each or key is None or scalar or isinstance(key, int)
                ):
                    # probed: the subtree-root row keeps its key ONLY
                    # when it is a container reached via an object key;
                    # scalars, nulls and array elements read key NULL
                    k = None
                else:
                    k = str(key)
                p = (
                    fullkey
                    if each and is_root
                    else (parent_fullkey if parent_fullkey is not None else "$")
                )
                rows.append(
                    (
                        k,
                        _render(node),
                        _json_type(node),
                        _render(node) if scalar else None,
                        nid,
                        None if (each or is_root) else parent_id,
                        fullkey,
                        p,
                    )
                )
        if isinstance(node, dict):
            for kk, vv in node.items():
                counter[0] += 1  # the object key's token slot
                visit(vv, str(kk), nid, _fullkey_step(fullkey, str(kk)), fullkey, cur + (str(kk),))
        elif isinstance(node, list):
            for i, vv in enumerate(node):
                visit(vv, i, nid, _fullkey_step(fullkey, i), fullkey, cur + (i,))

    visit(doc, None, None, "$", None, ())
    yield from rows


def each_rows(j: str, path: str | None = None):
    """json_each rows — the non-recursive view of :func:`tree_rows`."""
    yield from tree_rows(j, path, each=True)


def merge_patch(a: str | None, b: str | None) -> str | None:
    """RFC-7386 JSON merge patch — SQLite's json_patch(T, P): a
    non-object P replaces T entirely; object keys with null values
    delete, nested objects recurse. Output minified like SQLite
    (sqlite3-probed: json_patch('{"a":1,"b":2}','{"b":null,"c":3}')
    = '{"a":1,"c":3}')."""
    if a is None or b is None:
        return None
    try:
        t, p = json.loads(a), json.loads(b)
    except (ValueError, TypeError):
        return None  # malformed JSON raises in SQLite; NULL is the lenient map
    def merge(t, p):
        if not isinstance(p, dict):
            return p
        out = dict(t) if isinstance(t, dict) else {}
        for k, v in p.items():
            if v is None:
                out.pop(k, None)
            else:
                out[k] = merge(out.get(k), v)
        return out
    return json.dumps(merge(t, p), separators=(",", ":"))


def register(spark) -> None:
    """Register __json_mutate / __json_patch (scalars) and the
    json_each / json_tree UDTFs (SQLite's 8-column table-function
    shape) on a SparkSession — called from DustSession init."""
    spark.udf.register("__json_mutate", mutate, "string")
    spark.udf.register("__json_patch", merge_patch, "string")
    spark.udf.register("__json_extract_path", extract_json_text, "string")

    from pyspark.sql.functions import udtf

    _SCHEMA = (
        "key string, value string, type string, atom string, "
        "id bigint, parent bigint, fullkey string, path string"
    )

    @udtf(returnType=_SCHEMA)
    class JsonEach:
        def eval(self, j: str, path: str = None):
            yield from each_rows(j, path)

    @udtf(returnType=_SCHEMA)
    class JsonTree:
        def eval(self, j: str, path: str = None):
            yield from tree_rows(j, path)

    spark.udtf.register("json_each", JsonEach)
    spark.udtf.register("json_tree", JsonTree)
