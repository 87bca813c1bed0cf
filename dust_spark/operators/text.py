"""Text-analysis operators (SURVEY.md §2.C C4): language ID, quality
scoring, token counting, document fingerprinting.

Everything is a Catalyst expression pipeline over built-in functions —
designed so each operator is a narrow map over the documents scan (zero
shuffles until an explicit aggregation), which is the only shape that
survives a 100 TB corpus.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf signatures must resolve
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dust_spark.functions import tokens

# Tiny per-language stopword marker sets for the n-gram/stopword-ratio
# heuristic. Deliberately small and fixed: the point is a deterministic,
# cheap, SQL-expressible language scorer (mirrorable in the DuckDB
# oracle), not a production langid model.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "ich", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une"),
    "es": ("el", "la", "que", "de", "los", "se", "un", "es"),
}


def _stopword_hits(text: Column, words: tuple) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0)))


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: _stopword_hits(text, words) for lang, words in STOPWORDS.items()}


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Predict language by stopword-hit argmax; ties resolve in the fixed
    order en > de > fr > es; zero hits everywhere → 'und' (undetermined).
    """
    s = lang_scores(F.col(text_col))
    best = F.greatest(*s.values())
    pred = (
        F.when(best == 0, F.lit("und"))
        .when(s["en"] == best, F.lit("en"))
        .when(s["de"] == best, F.lit("de"))
        .when(s["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return df.withColumn(out_col, pred)


def token_count(df: DataFrame, text_col: str = "text", out_col: str = "n_tokens") -> DataFrame:
    """Whitespace token count (BIGINT for cross-engine hash parity)."""
    return df.withColumn(out_col, F.size(tokens(text_col, lowercase=False)).cast("long"))


def bpe_ish_token_count(df: DataFrame, text_col: str = "text", out_col: str = "n_bpe_tokens") -> DataFrame:
    """BPE-ish token estimate: count word pieces + digits + punctuation
    via a GPT-style pre-tokenizer regex (contractions, letter runs,
    digit runs, punctuation runs)."""
    pat = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
    return df.withColumn(
        out_col, F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).cast("long")
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uppercase heuristics — the
    standard cheap quality filters of a pretraining pipeline.

    Adds: n_chars_q, n_tokens, avg_token_len, punct_ratio, upper_ratio,
    stopword_ratio, quality_score (all DOUBLE, rounded 4dp).
    """
    text = F.col(text_col)
    tok = tokens(text_col, lowercase=False)
    n_chars = F.length(text).cast("double")
    n_tok = F.size(tok).cast("double")
    safe_chars = F.when(n_chars == 0, F.lit(1.0)).otherwise(n_chars)
    safe_tok = F.when(n_tok == 0, F.lit(1.0)).otherwise(n_tok)

    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"]", "")).cast("double")
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", "")).cast("double")
    stop_hits = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(r"\b(the|and|of|to|in|is|that|it)\b"), F.lit(0))
    ).cast("double")

    avg_token_len = (n_chars - (n_tok - 1)) / safe_tok
    punct_ratio = punct / safe_chars
    upper_ratio = upper / safe_chars
    stop_ratio = stop_hits / safe_tok

    # simple monotone blend: long-enough docs with natural punctuation,
    # some stopwords, and mostly-lowercase text score high
    quality = (
        F.least(n_tok / 100.0, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(upper_ratio * 5.0, F.lit(1.0))) * 0.15
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.15
    )
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn("avg_token_len", F.round(avg_token_len, 4))
        .withColumn("punct_ratio", F.round(punct_ratio, 4))
        .withColumn("upper_ratio", F.round(upper_ratio, 4))
        .withColumn("stopword_ratio", F.round(stop_ratio, 4))
        .withColumn("quality_score", F.round(quality, 4))
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Content fingerprint: md5 hex of the whitespace-normalized,
    lowercased text (stable under formatting noise)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out_col, F.md5(norm))


#: token-level Horner base for the rolling window hash; with token
#: hashes < 2^31 every intermediate stays under 2^62 (int64-safe in any
#: engine). _ROLL_PW = _ROLL_P^(window-1) mod M removes the departing
#: token when the window slides.
_ROLL_P = 1_000_003


def rolling_hash_fingerprint(
    df: DataFrame, text_col: str = "text", window: int = 8, out_col: str = "rfp"
) -> DataFrame:
    """Winnowing-style rolling fingerprint (Schleimer et al., SIGMOD'03
    shape): min over all ``window``-token Rabin-Karp hashes — robust to
    local edits; equal fingerprints are strong near-dup candidates.

    The hash is the portable polynomial family (:func:`portable_char_hash`
    per token, base-P Horner per window, everything mod 2^31-1), so a
    DuckDB oracle can replay it exactly — xxhash64 would be rows-only.

    Shape: narrow single pass. Token hashes come from one ``transform``
    (per-char work bound to lambda variables — no re-evaluated outer
    expression), and the rolling minimum is ONE ``aggregate`` fold with a
    (last-w-hashes buffer, rolling hash, min) accumulator — the classic
    Rabin-Karp slide. The O(n·w) ``transform(idx, j -> hash(slice(...)))``
    form is deliberately avoided: Catalyst inlines the token-hash array
    per window (the nested-lambda re-evaluation trap).
    """
    from dust_spark.functions import PORTABLE_HASH_MOD as M
    from dust_spark.functions import portable_char_hash

    pw = pow(_ROLL_P, window - 1, M)
    tok = tokens(text_col)
    th = F.transform(tok, lambda w: portable_char_hash(w))

    # accumulator: buf = last `window` token hashes, rh = current window
    # hash, mn = min over all full windows (M sentinel = "none yet")
    init = F.struct(
        F.array().cast("array<long>").alias("buf"),
        F.lit(0).cast("long").alias("rh"),
        F.lit(M).cast("long").alias("mn"),
    )

    def step(acc, h):
        full = F.size(acc["buf"]) >= window
        # slide: remove the oldest token's P^(w-1) term before adding h
        rh_kept = F.when(
            full, F.pmod(acc["rh"] - F.element_at(acc["buf"], 1) * pw, F.lit(M))
        ).otherwise(acc["rh"])
        rh = F.pmod(rh_kept * _ROLL_P + h, F.lit(M))
        buf = F.when(full, F.slice(F.concat(acc["buf"], F.array(h)), 2, window)).otherwise(
            F.concat(acc["buf"], F.array(h))
        )
        mn = F.when(F.size(buf) >= window, F.least(acc["mn"], rh)).otherwise(acc["mn"])
        return F.struct(buf.alias("buf"), rh.alias("rh"), mn.alias("mn"))

    # finish: min over full windows; a doc shorter than `window` has one
    # (short) window whose hash is the final rh
    fp = F.aggregate(
        th,
        init,
        step,
        lambda acc: F.when(acc["mn"] < M, acc["mn"]).otherwise(acc["rh"]),
    )
    return df.withColumn(
        out_col, F.when(F.size(tok) == 0, F.lit(None).cast("long")).otherwise(fp)
    )


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """TF-IDF per (document, term): tf × (ln((N+1)/(df+1)) + 1) with
    smoothed IDF (sklearn convention).

    Shape: explode terms → two hash-aggregations (term frequency by
    (doc, term); document frequency by term) → joined with the scalar
    corpus size. Both aggregations get map-side partial combine; the
    doc-frequency table is term-keyed (vocabulary-sized, ≪ corpus), so
    AQE broadcasts it when it fits and falls back to a shuffle join for
    web-scale vocabularies (10⁸+ terms) that would OOM a forced
    broadcast at any corpus scale.
    """
    tok = df.select(F.col(id_col).alias("doc_id_"), F.explode(tokens(text_col)).alias("term"))
    # r13 opt: ONE tokenize+explode pass — the (doc, term) tf table is
    # persisted and the doc-frequency table derives from it (df = the
    # number of tf rows per term == countDistinct(doc)), where
    # previously tf and dfreq each re-ran the corpus explode.
    tf = tok.groupBy("doc_id_", "term").agg(F.count("*").alias("tf")).persist()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.count()  # scalar; folded into the expression as a literal
    return (
        tf.join(dfreq, "term")
        .select(
            F.col("doc_id_").alias(id_col),
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0), round_to
            ).alias("tfidf"),
        )
    )


#: PII patterns (applied in order; counts are taken on the ORIGINAL
#: text). Regex syntax restricted to the Java-regex ∩ RE2 subset —
#: char classes, bounded repeats, \b — so a DuckDB oracle replays the
#: redaction verbatim.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("number", r"\d[\d \-]{6,}\d", "<NUM>"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Mask emails, IPv4 addresses, and long digit runs (phone/card
    shaped) — the standard PII scrub before pretraining. Adds
    ``out_col`` plus per-category match counts (n_email, n_ip,
    n_number, counted on the unredacted text).

    Narrow Catalyst map — a handful of regexp passes per row, no
    shuffle, no UDF; scales as a pure map stage over any corpus size.
    """
    c = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    red = c
    for _name, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return df.select("*", red.alias(out_col), *counts)


def top_domains(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Most-referenced URL domains across the corpus: extract
    ``https?://host`` references, lowercase the host, count referencing
    documents and total references — the standard source-mix audit for
    a web-scraped training set.

    Shape: regexp_extract_all → explode → one hash-aggregation on the
    domain (map-side combine; domain cardinality ≪ corpus), then a
    TakeOrdered top-k — no full sort at scale.
    """
    pat = r"https?://([A-Za-z0-9.-]+)"
    doms = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(1))).alias("d"),
    ).select("__id", F.lower(F.col("d")).alias("domain"))
    return (
        doms.groupBy("domain")
        .agg(
            F.countDistinct("__id").alias("n_docs"),
            F.count("*").alias("n_refs"),
        )
        .orderBy(F.col("n_refs").desc(), "domain")
        .limit(k)
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 30,
    max_words: int = 80,
    min_mean_wlen: float = 3.5,
    max_mean_wlen: float = 5.5,
    min_distinct_ratio: float = 0.5,
    min_stopwords: int = 2,
    stopwords: tuple = ("a", "the", "and", "of", "to"),
) -> DataFrame:
    """Gopher/FineWeb-style heuristic quality rules as a single narrow
    pass: word-count bounds, mean word length bounds, lexical diversity
    (distinct-token ratio — the cheap stand-in for Gopher's repetition
    rules), and stopword presence. Output: per-doc metrics, a ``keep``
    flag and the ordered ``fail_reasons`` list, so the filter doubles
    as a corpus-quality audit.

    Shape: pure Catalyst, fully NARROW — no shuffle, no Python. Token
    and length arrays materialize as attribute columns before any
    lambda touches them (the Catalyst per-element re-evaluation trap).
    """
    toks = df.select(
        F.col(id_col), F.col(text_col), tokens(text_col).alias("__tok")
    ).withColumn("__lens", F.transform("__tok", lambda t: F.length(t)))
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    m = toks.select(
        F.col(id_col),
        F.size("__tok").alias("n_words"),
        F.round(
            F.aggregate("__lens", F.lit(0).cast("long"), lambda a, x: a + x)
            / F.greatest(F.size("__tok"), F.lit(1)),
            4,
        ).alias("mean_wlen"),
        F.round(
            F.size(F.array_distinct("__tok")) / F.greatest(F.size("__tok"), F.lit(1)), 4
        ).alias("distinct_ratio"),
        F.size(F.filter("__tok", lambda t: F.array_contains(stop_arr, t))).alias(
            "n_stop"
        ),
    )
    reasons = F.array_compact(
        F.array(
            F.when(F.col("n_words") < min_words, F.lit("too_short")),
            F.when(F.col("n_words") > max_words, F.lit("too_long")),
            F.when(F.col("mean_wlen") < min_mean_wlen, F.lit("short_words")),
            F.when(F.col("mean_wlen") > max_mean_wlen, F.lit("long_words")),
            F.when(
                F.col("distinct_ratio") < min_distinct_ratio, F.lit("low_diversity")
            ),
            F.when(F.col("n_stop") < min_stopwords, F.lit("few_stopwords")),
        )
    )
    return m.withColumn("fail_reasons", F.concat_ws(",", reasons)).withColumn(
        "keep", (F.col("fail_reasons") == "").cast("long")
    )


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    form: str = "NFC",
) -> DataFrame:
    """Unicode normalization (NFC/NFD/NFKC/NFKD) — the canonicalization
    pass a dedup/fingerprint pipeline needs before hashing: 'é' as one
    codepoint and 'e' + U+0301 must hash identically, so normalization
    must run before ``exact_dedup``/``minhash``/``simhash`` see the
    bytes.

    Shape: one Arrow-batched pandas UDF (CPython's unicodedata is a C
    quick-check that short-circuits on already-normalized text — the
    common case for clean corpora), fully NARROW — no shuffle, linear
    in bytes, safe at any scale."""
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda t: None if t is None else unicodedata.normalize(form, t))

    return df.withColumn(out_col, _norm(F.col(text_col)))


def clean_text(df: DataFrame, text_col: str = "text", out_col: str = "clean") -> DataFrame:
    """Standard pretraining text normalization, pure Catalyst:
    control chars stripped, URLs and e-mail addresses masked, whitespace
    collapsed, edges trimmed."""
    c = F.col(text_col)
    c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "")
    c = F.regexp_replace(c, r"https?://\S+", "<URL>")
    c = F.regexp_replace(c, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out_col, c)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    standard context-window prep for training/embedding pipelines.

    Output: id, chunk_idx (0-based), chunk_text, n_chunk_tokens.
    Chunks start every ``stride`` tokens (overlap = chunk_tokens −
    stride); every document emits at least one chunk (empty docs emit an
    empty chunk 0). Pure Catalyst: tokenize → slice windows via
    transform → posexplode. Narrow until the explode, which multiplies
    rows by ~n_tokens/stride — exactly the fan-out the downstream
    pipeline wants partitioned, so no extra shuffle is introduced here.
    """
    if stride <= 0 or chunk_tokens <= 0 or stride > chunk_tokens:
        raise ValueError("need 0 < stride <= chunk_tokens")
    # tokens materialize as an attribute before the window-slice lambda:
    # a split() expression inside transform is re-evaluated per chunk
    # (O(tokens²/stride) per doc — the Catalyst lambda re-eval trap)
    base = df.select(F.col(id_col), tokens(text_col, lowercase=False).alias("__tok"))
    tok = F.col("__tok")
    n = F.size(tok)
    n_chunks = F.greatest(F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)) + 1, F.lit(1)).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(tok, i * stride + 1, chunk_tokens)))
    out = base.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )
    return out.withColumn(
        "n_chunk_tokens",
        F.when(F.length("chunk_text") == 0, F.lit(0)).otherwise(F.size(F.split("chunk_text", " "))).cast("long"),
    )


def pack_sequences(
    df: DataFrame,
    block_tokens: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style pretraining packing: conceptually concatenate every
    document's token stream in ``id_col`` order and split it into
    fixed ``block_tokens`` training sequences. Returns one row per doc:
    its token count, the global token offset where it starts, and the
    first/last sequence ids it lands in.

    Scale shape: the global ordered cumulative sum is two-phase — an
    intra-partition window over ``repartitionByRange(id)`` plus
    collected per-partition totals (numPartitions tiny rows) — the same
    zipWithIndex construction as the bulk-insert row ids; NO
    single-partition global window. Output values are independent of
    the partitioning, so range-sampling nondeterminism can't leak in.
    """
    from pyspark.sql import Window as W

    spark = df.sparkSession
    n_tok = F.size(tokens(text_col, lowercase=False)).cast("long")
    base = (
        df.select(F.col(id_col), n_tok.alias("n_tokens"))
        .repartitionByRange(F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    # explicit ROWS frame: the default RANGE frame would hand duplicate
    # ids an identical cumulative sum (overlapping offsets); ids are
    # expected unique, the ROWS frame keeps contiguity regardless
    w = (
        W.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # the narrow (id, n_tokens, pid, cum) projection is computed for the
    # offsets collect AND the returned plan — cache it (16 bytes/row;
    # the caller's corpus text never enters this table)
    # localCheckpoint: computed once for both consumers, lineage
    # truncated, and blocks are released by the ContextCleaner when the
    # returned plan is garbage-collected (a bare persist would pin them
    # for the session's lifetime). LAZY, with the offsets collect below
    # as the materializing action (it aggregates every partition, so
    # the checkpoint is fully pinned before the returned plan runs) —
    # one full pass instead of two (r13 opt, the distributed_rank
    # discipline)
    base = base.withColumn("__cum_in", F.sum("n_tokens").over(w)).localCheckpoint(eager=False)
    counts = sorted(
        (r["__pid"], r["s"])
        for r in base.groupBy("__pid").agg(F.sum("n_tokens").alias("s")).collect()
    )
    offsets, acc = [], 0
    for pid, tot in counts:
        offsets.append((pid, acc))
        acc += int(tot or 0)
    from pyspark.sql import types as T

    off_schema = T.StructType(
        [T.StructField("__pid", T.IntegerType()), T.StructField("__off", T.LongType())]
    )
    off_df = spark.createDataFrame(offsets or [(0, 0)], off_schema)
    out = (
        base.join(F.broadcast(off_df), "__pid")
        .withColumn("token_offset", (F.col("__off") + F.col("__cum_in") - F.col("n_tokens")))
        .withColumn("first_seq", F.floor(F.col("token_offset") / block_tokens))
        .withColumn(
            "last_seq",
            F.when(
                F.col("n_tokens") == 0, F.col("first_seq")
            ).otherwise(F.floor((F.col("token_offset") + F.col("n_tokens") - 1) / block_tokens)),
        )
    )
    return out.select(id_col, "n_tokens", "token_offset", "first_seq", "last_seq")


def repetition_score(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    out_col: str = "dup_ngram_frac",
) -> DataFrame:
    """Within-document repetition: fraction of duplicated word n-grams
    (1 − distinct/total) — the standard self-repetition quality filter
    for generated/boilerplate text. Narrow map; docs with < n tokens
    score 0.0."""
    # tokens materialize as an attribute before the gram lambda (the
    # per-element re-evaluation trap, see chunk_documents)
    base = df.withColumn("__tok", tokens(text_col))
    tok = F.col("__tok")
    idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    parts = lambda i: [F.element_at(tok, i + j) for j in range(n)]  # noqa: E731
    grams = F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))
    total = F.size(tok) - (n - 1)
    distinct = F.size(F.array_distinct(grams))
    score = F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(1.0 - distinct / total.cast("double"), 4)
    )
    return base.withColumn(out_col, score).drop("__tok")


def token_rarity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document corpus-frequency rarity profile — the integer-exact
    perplexity proxy of a unigram LM scored on its own corpus.

    For each token t with corpus count c(t) and corpus size T, the
    information content -log2(c/T) = log2(T) - log2(c) is approximated
    at 1-bit resolution by bitlength(T) - bitlength(c), where
    bitlength(x) = length(bin(x)) is EXACT integer arithmetic in any
    engine — no libm log2, whose last-ulp differences would break
    bit-exact cross-engine replay. Output per doc:

    - n_tokens
    - rare_frac: fraction of tokens with corpus count <= 2 (the classic
      hapax/dis-legomena ratio quality signal)
    - avg_bits: mean approximate information content per token,
      ROUND((n·bitlength(T) − Σ bitlength(c)) / n, 4) — an integer
      numerator and one exact division

    Scale: explode → one hash-agg for the counts (map-side combine),
    broadcast-sized (1-row) corpus total, count-table join back on the
    token key, final per-doc agg. Empty docs are excluded (n = 0).
    """
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("t")
    )
    # r13 opt: ONE tokenize+explode pass — aggregate to per-(doc, token)
    # occurrence counts once and persist; the corpus count table derives
    # from it and the per-doc profile re-weights by the occurrence count
    # (Σk, Σk·[c≤2], Σk·bitlen(c) are the same integers the token-level
    # rows summed to), so every output value is bit-identical.
    pt = tok.groupBy("id", "t").agg(F.count("*").alias("k")).persist()
    ct = pt.groupBy("t").agg(F.sum("k").alias("c"))
    tot = ct.agg(F.length(F.bin(F.sum("c"))).alias("blt"))
    j = pt.join(ct, "t").crossJoin(F.broadcast(tot))
    n = F.sum("k").cast("long")
    return (
        j.groupBy(F.col("id").alias(id_col))
        .agg(
            n.alias("n_tokens"),
            F.round(
                F.sum(F.col("k") * (F.col("c") <= 2).cast("long")).cast("double") / n,
                4,
            ).alias("rare_frac"),
            F.round(
                (
                    n * F.first("blt")
                    - F.sum(F.col("k") * F.length(F.bin(F.col("c"))).cast("long"))
                ).cast("double")
                / n,
                4,
            ).alias("avg_bits"),
        )
    )


def bpe_pair_counts(
    df: DataFrame, top_n: int = 50, text_col: str = "text"
) -> DataFrame:
    """Top merge candidates for one BPE training iteration (Sennrich et
    al. 2016): adjacent character-pair frequencies over the corpus,
    weighted by word frequency — the inner loop of byte-pair-encoding
    tokenizer training, run at corpus scale.

    Shape: tokenize → word hash-agg (the corpus collapses to its
    vocabulary — at 100 TB the word table is millions of rows, not
    trillions), then each vocabulary word explodes to its len-1
    character pairs via substring (no char-array lambdas — see the
    CLAUDE.md higher-order-function trap) and a second hash-agg with
    map-side combine sums the weighted counts. Deterministic top-n by
    (count DESC, pair) through TakeOrderedAndProject.
    """
    from dust_spark.functions import tokens

    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
        .filter(F.length("w") >= 2)
    )
    return (
        words.select(
            "w", "wc", F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i")
        )
        .select(F.expr("substring(w, i, 2)").alias("pair"), "wc")
        .groupBy("pair")
        .agg(F.sum("wc").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(top_n)
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    skip_top: int = 20,
    n_query_terms: int = 5,
) -> DataFrame:
    """BM25 top-k retrieval (Robertson/Sparck Jones, public): score every
    document against a query term set with the Okapi BM25 formula
    idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) and keep the
    top ``k``. When ``query_terms`` is None the query derives
    deterministically from the corpus itself: the ``n_query_terms``
    terms ranked ``skip_top+1 .. skip_top+n`` by document frequency
    (ties alphabetical) — mid-frequency terms, past the stopword head.

    Hash-stable across engines: the only transcendental (the idf ln) is
    ROUNDed to 6 decimals and cast DECIMAL immediately; the tf/length
    normalization is pure IEEE arithmetic on integers and one exact
    bigint/bigint double (avgdl), identical bits in Spark and DuckDB;
    per-doc accumulation over query terms is exact DECIMAL; one final
    ROUND(4).

    Scale shape: explode -> two hash-aggs (doc-term tf; term df) like
    tf_idf; the query-term table is <= n_query_terms rows (TakeOrdered
    over the vocabulary, never a global sort of the corpus) and
    BROADCASTS into the scoring join; doc stats ride a one-row
    broadcast; the final top-k is TakeOrdered.
    """
    from pyspark.sql import Window as W

    tok = df.select(
        F.col(id_col).alias("doc_id_"), F.explode(tokens(text_col)).alias("term")
    )
    # r13 opt: ONE tokenize+explode pass — tf persists; document length
    # (dl = sum of tf per doc) and document frequency (df = tf rows per
    # term == countDistinct(doc)) both derive from it, where previously
    # tf/dl/dfreq each re-ran the corpus explode.
    tf = tok.groupBy("doc_id_", "term").agg(F.count("*").alias("tf")).persist()
    dl = tf.groupBy("doc_id_").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    if query_terms is None:
        head = dfreq.orderBy(F.col("df").desc(), "term").limit(skip_top + n_query_terms)
        qt = (
            head.withColumn(
                "__rn", F.row_number().over(W.orderBy(F.col("df").desc(), "term"))
            )
            .filter(F.col("__rn") > skip_top)
            .select("term", "df")
        )
    else:
        qt = dfreq.filter(F.col("term").isin(list(query_terms)))
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(dl, "doc_id_")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ),
        6,
    ).cast("decimal(18,6)")
    norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    contrib = F.round(idf.cast("double") * norm, 6).cast("decimal(18,6)")
    per_doc = (
        scored.select(F.col("doc_id_").alias(id_col), contrib.alias("c"))
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_hit"), F.sum("c").alias("s"))
    )
    return (
        per_doc.select(
            id_col, "n_hit", F.round(F.col("s").cast("double"), 4).alias("score")
        )
        .orderBy(F.col("score").desc(), id_col)
        .limit(k)
    )


def model_quality_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """fasttext-style model-based quality scoring (Joulin et al. 2016
    bag-of-hashed-ngrams linear classifier — the filter stage most LLM
    pipelines run between heuristic rules and training): each doc's
    hashed unigram-bucket counts dot a weight vector, the logit maps
    through a sigmoid, and keep = logit >= 0. Weights here are the
    deterministic portable pseudo-family
    w_b = ((b+1)*2654435761 mod (2^31-1)) / (2^31-1) - 0.5) / 16 —
    a real deployment swaps in trained weights as a broadcast table;
    the Spark-side plumbing (hash → count → broadcast dot → sigmoid)
    is exactly what trained weights would ride.

    Hash-stable: bucket counts are integers on the portable char-Horner
    hash; each weight ROUNDs to 9 dp DECIMAL (the only inexact step is
    one division chain of exact doubles, identical bits cross-engine);
    the logit accumulates count x weight in exact DECIMAL; keep tests
    the exact DECIMAL logit sign; only the display probability touches
    exp(), ROUNDed at 4 dp.

    Scale shape: tokenize/hash narrow; one hash-agg to (doc, bucket)
    counts; the <= n_buckets weight table broadcasts; one hash-agg to
    the doc logit. No shuffle carries text.
    """
    from dust_spark.functions import PORTABLE_HASH_MOD, portable_char_hash, tokens

    base = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__tok")
    )
    grams = base.select("id", F.explode("__tok").alias("g"))
    hb = grams.select(
        "id", F.pmod(portable_char_hash(F.col("g")), F.lit(n_buckets)).alias("b")
    )
    per = hb.groupBy("id", "b").agg(F.count("*").alias("c"))
    spark = docs.sparkSession
    wdf = spark.range(n_buckets).select(
        F.col("id").alias("b"),
        F.round(
            (
                F.pmod((F.col("id") + 1) * F.lit(2654435761), F.lit(PORTABLE_HASH_MOD))
                / F.lit(float(PORTABLE_HASH_MOD))
                - F.lit(0.5)
            )
            / F.lit(16.0),
            9,
        )
        .cast("decimal(12,9)")
        .alias("w"),
    )
    logits = (
        per.join(F.broadcast(wdf), "b")
        .groupBy("id")
        .agg(F.sum(F.col("c") * F.col("w")).alias("z"))
    )
    zd = F.col("z").cast("double")
    return logits.select(
        F.col("id").alias(id_col),
        F.round(zd, 6).alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-zd)), 4).alias("prob"),
        (F.col("z") >= 0).cast("long").alias("keep"),
    ).orderBy(id_col)


def bigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_smooth: float = 0.5,
) -> DataFrame:
    """Bigram language-model scoring (the KenLM-style perplexity filter
    of an LLM pipeline, self-trained on the corpus): per doc the mean
    add-k-smoothed bigram log-probability
    ln((c(w1,w2)+k) / (c(w1)+k*V)) — low scores flag gibberish /
    boilerplate / wrong-language text. A real deployment swaps the
    self-trained count tables for a reference model's; the plumbing
    (count, join by hash, DECIMAL-fold) is identical.

    Hash-stable: bigrams key on the portable char-Horner hash in BOTH
    engines (hash collisions merge identically); the only
    transcendental (ln) ROUNDs to 6 dp DECIMAL once per DISTINCT
    bigram; per-doc accumulation is count x rounded-logprob in exact
    DECIMAL with one final ROUND(4).

    Scale shape: ONE tokenize + explode pass over the corpus (r13 opt:
    the bigram and unigram streams previously re-tokenized the corpus
    three times — bi was evaluated under two different aggregations and
    uni once). Each token position emits a (bigram-string, first-word)
    struct — the LAST position a (NULL, word) marker — so unigram
    counts fall out of the same exploded stream: every token is the
    first word of exactly one emitted row. The per-(doc, bh, uh) count
    table is persisted and every downstream table (unigram counts,
    vocab size, bigram counts, per-doc scores) derives from it;
    bigram/unigram counts stay hash-aggs on 8-byte keys (raw text never
    shuffles past the first projection); V rides a one-row broadcast.
    """
    from dust_spark.functions import portable_char_hash, tokens

    base = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__tok")
    )
    n = F.size("__tok")
    ents = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            F.when(
                i < n,
                F.concat_ws(
                    " ",
                    F.element_at(F.col("__tok"), i),
                    F.element_at(F.col("__tok"), i + 1),
                ),
            ).alias("bg"),
            F.element_at(F.col("__tok"), i).alias("w"),
        ),
    )
    # materialize the exploded strings as attribute columns BEFORE the
    # char-Horner hash touches them (the HOF re-evaluation trap)
    rows = (
        base.select("id", F.explode(ents).alias("e"))
        .select("id", F.col("e.bg").alias("bg"), F.col("e.w").alias("w"))
        .select(
            "id",
            # portable_char_hash(NULL) is NULL, so last-position marker
            # rows keep bh NULL through the hash
            portable_char_hash(F.col("bg")).alias("bh"),
            portable_char_hash(F.col("w")).alias("uh"),
        )
    )
    cnt = rows.groupBy("id", "bh", "uh").agg(F.count("*").alias("c")).persist()
    uni_cnt = cnt.groupBy("uh").agg(F.sum("c").alias("c1"))
    vocab = uni_cnt.agg(F.count("*").alias("v"))
    # join on BOTH hash components: a bh collision across pairs with
    # different first words would otherwise fan the lp join out
    per = cnt.filter(F.col("bh").isNotNull())
    bi_cnt = per.groupBy("bh", "uh").agg(F.sum("c").alias("c12"))
    lp = (
        bi_cnt.join(uni_cnt, "uh")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bh",
            "uh",
            F.round(
                F.log(
                    (F.col("c12") + F.lit(k_smooth))
                    / (F.col("c1") + F.lit(k_smooth) * F.col("v"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    scored = (
        per.join(lp, ["bh", "uh"])
        .groupBy("id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("lp")).alias("s"),
        )
    )
    return scored.select(
        F.col("id").alias(id_col),
        "n_bigrams",
        F.round(F.col("s").cast("double") / F.col("n_bigrams"), 4).alias("avg_logprob"),
    ).orderBy(id_col)
