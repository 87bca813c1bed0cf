"""Deduplication operators for large-scale training-data pipelines.

Five dedup families (SURVEY.md §2.C C1/C2), each a DataFrame-in /
DataFrame-out operator designed shuffle-aware for 100 TB:

- :func:`exact_dedup` — hash-groupBy exact dedup (one shuffle on a
  256-bit content hash, never on the full text).
- :func:`minhash_lsh_pairs` / :func:`minhash_dedup` — MinHash+LSH
  near-dup (shingle → signature → band-bucket join → verified Jaccard);
  candidate generation is O(n·bands), never O(n²).
- :func:`simhash_pairs` — 64-bit SimHash with banded candidate
  generation + Hamming verification.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard via shingle
  inverted index (explode + equi-join on shingle).
- :func:`embedding_near_dup` — cosine near-dup over embeddings via
  random-hyperplane bucketing (delegates to operators.similarity).

All signature/sketch computation is pure Catalyst expressions
(dust_spark.functions) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dust_spark.functions import (
    hamming64,
    jaccard,
    lsh_band_hashes,
    tokens,
    word_shingles,
)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (minimum id) per distinct ``text_col``.

    Scale shape: shuffle on ``sha2(text, 256)`` — a fixed-width 64-char
    key — instead of the raw document bytes, so shuffle volume is
    O(rows·(row minus text)) not O(corpus bytes). A 256-bit hash makes
    accidental collisions (~2^-128 at trillions of docs) a non-issue;
    semantics equal GROUP BY text.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count of surviving documents after exact dedup (DQ-C1a shape)."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("__h"))
        .agg(F.count("*").alias("__c"))
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


_EMPTY_MIN = 0x7FFFFFFFFFFFFFFF  # sentinel for empty shingle sets


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_words: int = 3,
    include_shingles: bool = True,
) -> DataFrame:
    """id, shingles (distinct set), MinHash signature per document.
    With ``include_shingles=False`` the shingle sets are dropped from
    the aggregate — the signature-only form is what estimate-mode
    verification consumes at scale.

    Shape: explode shingles once → one hash-aggregate computing all
    ``num_hashes`` mins (plus collect_set for later verification) — one
    shuffle on the doc id with map-side partial combine. This beats the
    per-row nested-lambda formulation (functions.minhash_signature)
    decisively: Catalyst inlines nested higher-order lambdas, turning
    O(shingles × hashes) into O(shingles² × hashes) re-evaluation; the
    explode+agg form is linear and scales to arbitrarily long documents.
    """
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(word_shingles(tokens(text_col), shingle_words)).alias("shingle"),
    )
    # NOTE: first execution pays a multi-second one-time codegen compile
    # for the 64-buffer aggregate — a fixed cost, irrelevant at scale
    # (and why the bench shows c2a as the slowest query at toy SFs).
    # xxhash64 skips NULL args, so guard explicitly: empty docs must get
    # NULL mins, then a per-doc sentinel signature (empty docs must never
    # collide with each other — exact dedup owns the empty-doc case)
    aggs = [
        F.min(F.when(F.col("shingle").isNotNull(), F.xxhash64("shingle", F.lit(i)))).alias(f"__h{i}")
        for i in range(num_hashes)
    ]
    if include_shingles:
        aggs.append(F.collect_set("shingle").alias("shingles"))
    sigs = exploded.groupBy("id").agg(*aggs)
    return sigs.select(
        "id",
        *(["shingles"] if include_shingles else []),
        F.array(
            *[
                F.coalesce(F.col(f"__h{i}"), F.xxhash64(F.col("id"), F.lit(i + num_hashes)))
                for i in range(num_hashes)
            ]
        ).alias("sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 10_000,
    verify: str = "exact",
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Pipeline: signature (narrow) → explode band keys → self-join on
    (band, hash) → distinct candidate pairs → verify Jaccard. With b=16
    bands of r=4 rows the S-curve threshold is (1/16)^(1/4) ≈ 0.5, so
    recall at 0.7 is high.

    ``verify`` selects the verification payload:

    - ``"exact"`` (default, right at test SF): join the full shingle
      sets back by id and compute exact Jaccard.
    - ``"estimate"``: join only the num_hashes-long signatures and use
      the standard MinHash estimator Ĵ = (# matching components)/k —
      unbiased, stderr ≈ sqrt(J(1−J)/k) (~0.06 at k=64). At 100 TB the
      exact mode's collect_set(shingles) shuffle is ≈ corpus size;
      estimate mode ships 8·k bytes per doc instead.

    100 TB posture: candidates come from equi-joins on 8-byte band
    hashes (shuffle keys are tiny); ``max_bucket`` drops degenerate
    buckets (e.g. empty/boilerplate docs) that would otherwise create
    quadratic blowup inside a single hot key — the classic LSH skew
    guard. Verification joins signatures back by id, so the payload
    (shingle sets or signatures) travels through exactly one shuffle.
    """
    if verify not in ("exact", "estimate"):
        raise ValueError(f"verify must be 'exact' or 'estimate', got {verify!r}")
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_words,
        include_shingles=(verify == "exact"),
    )
    sigs = sigs.persist()

    bands_df = sigs.select(
        "id",
        F.posexplode(lsh_band_hashes(F.col("sig"), bands, num_hashes)).alias("band", "bh"),
    )
    # skew guard: drop buckets that would explode quadratically
    bucket_sizes = bands_df.groupBy("band", "bh").agg(F.count("*").alias("bc"))
    bands_df = bands_df.join(
        bucket_sizes.filter(F.col("bc") <= max_bucket).select("band", "bh"),
        ["band", "bh"],
    )

    a = bands_df.alias("a")
    b = bands_df.alias("b")
    candidates = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    if verify == "exact":
        sa = sigs.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
        sb = sigs.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
        jac = F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4)
    else:
        sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sh_a"))
        sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sh_b"))
        matches = F.size(
            F.filter(F.zip_with("sh_a", "sh_b", lambda x, y: x == y), lambda m: m)
        )
        jac = F.round(matches / F.lit(num_hashes), 4)
    verified = (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # Scope the big signature cache to this call: materialize the (small)
    # verified-pair output, then release the signatures — long-lived
    # sessions running many dedups must not accumulate signature blocks
    # in executor memory. The persisted result is pairs-only (tiny); a
    # lost block recomputes through full lineage.
    verified = verified.persist()
    verified.count()
    sigs.unpersist()
    return verified


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Drop near-duplicates: for each verified pair keep the lower id.

    Connected-component-lite: a doc is dropped if it is the larger id of
    any verified pair (single pass — standard MinHash-dedup keep rule).
    For full transitive-closure clusters use
    ``operators.graph.cluster_dedup`` with these pairs.
    """
    pairs = minhash_lsh_pairs(df, text_col, id_col, **kwargs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """id + 64-bit simhash.

    Same explode+aggregate shape as :func:`minhash_signatures` (one
    shuffle, 64 conditional sums with map-side combine), then the bit
    fold happens on one row per doc. Empty docs → simhash 0."""
    tok_hashes = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(tokens(text_col)).alias("__tok"),
    ).select(
        "id",
        F.when(F.col("__tok").isNotNull(), F.xxhash64("__tok")).alias("h"),
    )
    one = F.lit(1).cast("long")
    bit_sums = tok_hashes.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.col("h").isNull(), 0)
                .when(F.shiftright(F.col("h"), j).bitwiseAND(one) != 0, 1)
                .otherwise(-1)
            ).alias(f"__b{j}")
            for j in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for j in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"__b{j}") > 0, F.shiftleft(one, j)).otherwise(F.lit(0).cast("long"))
        )
    return bit_sums.select("id", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: id_a < id_b with hamming <= max_hamming.

    Candidate generation via the pigeonhole trick: split the 64-bit hash
    into ``chunks`` 16-bit pieces; any pair within hamming ≤ chunks-1
    shares at least one exact piece → equi-join per piece (shuffle on
    2-byte keys), then verify the full Hamming distance. Never O(n²).
    """
    sims = simhash_table(df, text_col, id_col)
    width = 64 // chunks
    mask = (1 << width) - 1
    pieces = sims.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
                    for i in range(chunks)
                ]
            )
        ).alias("chunk", "piece"),
    )
    a, b = pieces.alias("a"), pieces.alias("b")
    return (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.piece") == F.col("b.piece")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard via inverted index
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
    threshold: float = 0.5,
    max_postings: int = 100_000,
) -> DataFrame:
    """Exact Jaccard-similar pairs through a shingle inverted index.

    explode(shingles) → self-equi-join on shingle → count intersections
    per pair → join set sizes → jaccard = inter/(|a|+|b|-inter).
    ``max_postings`` prunes stop-shingles (appearing in more docs than
    the cap) — they add candidates but almost no signal, and they are
    exactly the skewed keys that hurt at scale.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(tokens(text_col), shingle_words)).alias("shingle"),
    ).persist()  # read 3× below (postings filter, both join sides, sizes)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))

    postings = sh.groupBy("shingle").agg(F.count("*").alias("df_"))
    sh = sh.join(postings.filter(F.col("df_") <= max_postings).select("shingle"), "shingle")

    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    result = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # same cache-scoping discipline as minhash_lsh_pairs: keep only the
    # small pair output cached, release the exploded shingle table
    result = result.persist()
    result.count()
    sh.unpersist()
    return result


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    benchmark_text_col: str = "text",
    ngram_words: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove training documents that contain any ``ngram_words``-gram
    from the benchmark corpus — the standard eval-contamination filter.

    Shape: benchmark n-grams hash to a small key set (benchmarks are
    ~10³-10⁶ rows, training corpora 10⁹+), so the contaminated-doc
    detection is a broadcast-able semi-join from exploded training
    (id, gram-hash) pairs to benchmark n-gram hashes; the final
    anti-join keys on ``id_col`` alone. The document payload is never
    shuffled, and an id-key anti-join (unlike the full-row form) cannot
    null-reject rows that carry NULLs in other columns.
    Exact-match n-gram policy (lowercased, whitespace-normalized).
    """
    bench_grams = benchmark.select(
        F.explode(word_shingles(tokens(benchmark_text_col), ngram_words)).alias("__g")
    ).select(F.xxhash64("__g").alias("__gh")).distinct()

    doc_grams = df.select(
        F.col(id_col),
        F.explode(word_shingles(tokens(text_col), ngram_words)).alias("__g"),
    ).select(id_col, F.xxhash64("__g").alias("__gh"))

    contaminated_ids = (
        doc_grams.join(F.broadcast(bench_grams), "__gh", "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(contaminated_ids, id_col, "left_anti")
