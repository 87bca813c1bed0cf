"""Column-level helper functions (all JVM-side Catalyst expressions —
no Python UDFs in any hot path).

These are the building blocks for the Tier C operators (SURVEY.md §2.C):
tokenization, shingling, MinHash/SimHash signatures, vector math over
``array<float/double>`` columns. Everything composes from
``pyspark.sql.functions`` higher-order functions, so whole-stage codegen
applies and the operators scale with zero Python serialization cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# text primitives
# --------------------------------------------------------------------------


def tokens(col: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization → array<string>. Empty input → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    t = F.split(F.trim(c), r"\s+")
    return F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")).otherwise(t)


def word_shingles(tok: Column, n: int = 3) -> Column:
    """n-word shingles from a token array (distinct, order-free set).

    1-based ``element_at`` indexing so the same expression shape is
    mirrorable in DuckDB list functions for oracle queries.
    """
    idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    parts = lambda i: [F.element_at(tok, i + j) for j in range(n)]  # noqa: E731
    sh = F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))
    return F.array_distinct(F.when(F.size(tok) >= n, sh).otherwise(F.array().cast("array<string>")))


def shingle_hashes(tok: Column, n: int = 3) -> Column:
    """xxhash64 of each n-word shingle, emitted directly from the token
    array in a SINGLE-level ``transform`` → array<long> (with
    duplicates; min/majority sketches are duplicate-insensitive).

    Deliberately not ``transform(word_shingles(...), xxhash64)``: that
    nests higher-order lambdas, and Catalyst inlines the inner array
    expression per outer element — O(shingles²) re-evaluation per row.
    """
    idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    parts = lambda i: [F.element_at(tok, i + j) for j in range(n)]  # noqa: E731
    sh = F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", *parts(i))))
    return F.when(F.size(tok) >= n, sh).otherwise(F.array().cast("array<long>"))


#: modulus for :func:`portable_char_hash` — 2^31-1 keeps every
#: intermediate (acc*31 + char) below 2^36, exactly representable in the
#: int64 arithmetic of any SQL engine (no unsigned/overflow divergence).
PORTABLE_HASH_MOD = 2_147_483_647


def portable_char_hash(col: Column | str, seed: int = 0) -> Column:
    """Deterministic cross-engine string hash: Horner fold of the byte
    values, ``acc = (acc*31 + ascii(char)) % (2^31-1)`` starting from
    ``seed``. Unlike xxhash64 this is expressible verbatim in DuckDB
    (``list_reduce(list_prepend(seed, chars), ...)``), so operators built
    on it get hard driver oracles instead of rows-only checks.
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.ascii(F.substring(c, i, F.lit(1))).cast("long"),
    )
    return F.when(F.length(c) == 0, F.lit(seed).cast("long")).otherwise(
        F.aggregate(
            chars,
            F.lit(seed).cast("long"),
            lambda acc, ch: (acc * 31 + ch) % PORTABLE_HASH_MOD,
        )
    )


def char_shingles(col: Column | str, n: int = 5) -> Column:
    """Character n-gram shingles (distinct)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.when(
            F.length(c) >= n,
            F.transform(F.sequence(F.lit(1), F.length(c) - (n - 1)), lambda i: c.substr(i, F.lit(n))),
        ).otherwise(F.array().cast("array<string>"))
    )


# --------------------------------------------------------------------------
# hashing / sketching primitives
# --------------------------------------------------------------------------


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature (array<bigint>, length ``num_hashes``) of a
    shingle-set column.

    Seeded family via ``xxhash64(shingle, seed)`` (multi-arg xxhash64 ≈
    seeded hash). O(num_hashes × |shingles|) work per row, all inside
    codegen — no explode, no shuffle. Empty set → signature of
    Long.MaxValue so empty docs never collide with real ones.
    """
    empty_sig = F.array_repeat(F.lit(0x7FFFFFFFFFFFFFFF).cast("long"), num_hashes)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, i))),
    )
    return F.when(F.size(shingles) == 0, empty_sig).otherwise(sig)


def lsh_band_hashes(signature: Column, bands: int, num_hashes: int) -> Column:
    """Split a MinHash signature into ``bands`` equal slices and hash each
    → array<bigint> of band keys. Two docs are LSH candidates iff they
    share any (band_index, band_hash) pair."""
    rows = num_hashes // bands
    return F.array(
        *[
            F.xxhash64(F.lit(b), *[F.element_at(signature, b * rows + r + 1) for r in range(rows)])
            for b in range(bands)
        ]
    )


def simhash64(tok: Column) -> Column:
    """64-bit SimHash of a token array → bigint.

    Classic construction: per-token 64-bit hash; for each bit position,
    sum +1/−1 across tokens; final bit = sign. Expressed as a single
    Catalyst expression tree (transform + aggregate), fully codegen'd.
    """
    hashes = F.transform(tok, lambda t: F.xxhash64(t))
    one = F.lit(1).cast("long")
    bit = lambda j: F.when(  # noqa: E731
        F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(F.shiftright(h, j).bitwiseAND(one) != 0, 1).otherwise(-1),
        )
        > 0,
        F.shiftleft(one, j),
    ).otherwise(F.lit(0).cast("long"))
    out = F.lit(0).cast("long")
    for j in range(64):
        out = out.bitwiseOR(bit(j))
    return out


def simhash_bits(hashes: Column, bits: int = 31) -> Column:
    """SimHash over a pre-computed token-hash array column: per-bit
    majority vote (+1/−1 per token, ties → 0), empty array → 0.

    ``hashes`` MUST be a real attribute column (not an inline
    expression): it is referenced ``bits`` + 1 times, and a non-attribute
    input would be re-evaluated per reference (the lambda re-eval trap).
    Pure Catalyst — exact integers, replayable verbatim in any engine.
    """
    one = F.lit(1).cast("long")

    def bit(j: int) -> Column:
        maj = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j).bitwiseAND(one) != 0, one).otherwise(
                F.lit(-1).cast("long")
            ),
        )
        return F.when(maj > 0, F.shiftleft(one, j)).otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out.bitwiseOR(bit(j))
    return F.when(F.size(hashes) == 0, F.lit(0).cast("long")).otherwise(out)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHashes."""
    return F.bit_count(a.bitwiseXOR(b))


# --------------------------------------------------------------------------
# vector primitives over array<float|double>
# --------------------------------------------------------------------------


def vec_dot(a: Column, b: Column) -> Column:
    """Dot product accumulated in DOUBLE (hash-stable across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def vec_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array-set columns."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)
