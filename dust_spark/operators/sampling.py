"""Deterministic sampling & dataset-split operators.

Training pipelines need *reproducible* sampling — rand()-based sampling
changes run to run and is exactly what statement-replay determinism
forbids (reference README.md:30-33). Everything here derives from
``xxhash64(key, seed)``, so results are stable across runs, executors,
and engines:

- :func:`hash_sample` — keep a deterministic fraction of rows.
- :func:`train_val_test_split` — disjoint, exhaustive splits by weight.
- :func:`stratified_hash_sample` — per-stratum fractions.
- :func:`weighted_interleave` — mix datasets by target proportions.

All are narrow (filter on a hash of the key — no shuffle) and push the
hash predicate into the scan where the key is a stored column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _bucket(key: Column, seed: int, hash_fn: str = "xxhash64") -> Column:
    """Deterministic bucket in [0, _BUCKETS). ``hash_fn='xxhash64'``
    (default) is the strongest mixer; ``'portable'`` uses the
    cross-engine char-Horner hash over CAST(key AS STRING) — weaker
    mixing but exactly replayable in DuckDB SQL, which upgrades split
    queries from rows-only to hard hash oracles."""
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(_BUCKETS))
    if hash_fn == "portable":
        from dust_spark.functions import PORTABLE_HASH_MOD, portable_char_hash

        # multiplicative scramble (Knuth 2654435761): short sequential
        # keys Horner-hash to near-contiguous values, which would land
        # whole id ranges in one split; one multiply mod 2^31-1 spreads
        # them (product < 2^63, int64-safe in Spark and DuckDB alike)
        h = portable_char_hash(key.cast("string"), seed=seed)
        return F.pmod(F.pmod(h * F.lit(2654435761), F.lit(PORTABLE_HASH_MOD)), F.lit(_BUCKETS))
    raise ValueError(f"hash_fn must be 'xxhash64' or 'portable', got {hash_fn!r}")


def hash_sample(df: DataFrame, fraction: float, key: str = "doc_id", seed: int = 42) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``key``. Same key +
    seed always lands on the same side — stable under reprocessing and
    incremental ingestion (a re-run never resamples old rows)."""
    return df.filter(_bucket(F.col(key), seed) < int(fraction * _BUCKETS))


def train_val_test_split(
    df: DataFrame,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    key: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Label every row train/val/test — disjoint and exhaustive, stable
    across runs. One narrow projection; downstream filters prune."""
    w_train, w_val, _ = weights
    b = _bucket(F.col(key), seed, hash_fn)
    t1 = int(w_train * _BUCKETS)
    t2 = int((w_train + w_val) * _BUCKETS)
    return df.withColumn(
        out_col,
        F.when(b < t1, F.lit("train")).when(b < t2, F.lit("val")).otherwise(F.lit("test")),
    )


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str,
    key: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language-balanced
    downsampling: {'en': 0.1, 'de': 1.0, ...})."""
    b = _bucket(F.col(key), seed, hash_fn)
    thresh = F.lit(int(default_fraction * _BUCKETS))
    for value, frac in fractions.items():
        thresh = F.when(F.col(stratum_col) == value, F.lit(int(frac * _BUCKETS))).otherwise(thresh)
    return df.filter(b < thresh)


def shard_assign(
    df: DataFrame,
    num_shards: int = 1024,
    key: str = "doc_id",
    seed: int = 42,
    hash_fn: str = "xxhash64",
    out_col: str = "shard",
    pos_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic global training-order shuffle, sharded: every row
    gets a shard id (hash-bucket mod ``num_shards``) and its position
    within the shard (rank of (bucket, key) — the hash randomizes order,
    the key breaks ties). Reading shards round-robin reproduces one
    fixed corpus-wide shuffle without any global sort.

    100 TB posture: the ONLY shuffle is the window's hash partition on
    the shard id — num_shards-way, each shard sorts independently. A
    single global row_number would funnel the corpus through one task;
    this is the standard shard-then-rank layout for training-data
    shuffles. With ``hash_fn='portable'`` the whole assignment replays
    in any SQL engine (hard DuckDB oracle)."""
    from pyspark.sql import Window as W

    df2 = df.withColumn("__b", _bucket(F.col(key), seed, hash_fn)).withColumn(
        out_col, F.pmod(F.col("__b"), F.lit(num_shards))
    )
    w = W.partitionBy(out_col).orderBy("__b", key)
    return df2.withColumn(pos_col, F.row_number().over(w)).drop("__b")


def cap_per_stratum(
    df: DataFrame,
    n: int,
    stratum_col: str,
    key: str = "doc_id",
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep at most ``n`` rows per stratum (per-domain / per-source
    caps — the standard head-chopping move against over-represented
    hosts in a crawl corpus). Selection priority is the deterministic
    hash bucket (then the key): which n survive is stable across runs
    and independent of input order.

    100 TB posture: one hash partition on the stratum; each stratum
    ranks independently. Heavy-hitter strata are exactly the rows the
    cap discards, and rank computation within one partition is a heap
    of size ~stratum; for pathological single-stratum skew compose with
    :func:`hash_sample` as a pre-filter. With ``hash_fn='portable'``
    the whole selection replays in DuckDB (hard oracle)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(stratum_col).orderBy("__b", key)
    return (
        df.withColumn("__b", _bucket(F.col(key), seed, hash_fn))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__b", "__rn")
    )


def token_budget_mix(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    cost_col: str = "n_chars",
    key: str = "doc_id",
    seed: int = 42,
    hash_fn: str = "xxhash64",
    default_budget: int = 0,
) -> DataFrame:
    """Fill each source's token/char budget with a deterministic,
    hash-ordered prefix: rows are ranked per source by (bucket, key)
    and kept while the cumulative ``cost_col`` stays within the
    source's budget (the first row that crosses the line is the last
    one kept — budgets are met, not undershot). This is the standard
    'mix sources to a token recipe' step of a training-data pipeline,
    stable under reprocessing.

    One shuffle (hash partition on source); the running sum is a
    window cumsum per source, never a driver loop."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(source_col)
        .orderBy("__b", key)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    budget = F.lit(int(default_budget))
    for s, b in budgets.items():
        budget = F.when(F.col(source_col) == s, F.lit(int(b))).otherwise(budget)
    return (
        df.withColumn("__b", _bucket(F.col(key), seed, hash_fn))
        .withColumn("__cum", F.sum(F.col(cost_col)).over(w))
        .filter(F.col("__cum") - F.col(cost_col) < budget)
        .drop("__b", "__cum")
    )


def weighted_interleave(
    sources: list[tuple[DataFrame, float]],
    key: str = "doc_id",
    seed: int = 42,
    source_col: str = "source_idx",
) -> DataFrame:
    """Mix datasets to target proportions: downsample each source by
    weight/max(weight) (the largest weight keeps everything), tag the
    provenance, and union. Deterministic; no shuffle beyond the unions.
    """
    if not sources:
        raise ValueError("at least one source required")
    max_w = max(w for _, w in sources)
    out = None
    for i, (df, w) in enumerate(sources):
        part = hash_sample(df, w / max_w, key=key, seed=seed + i).withColumn(
            source_col, F.lit(i)
        )
        out = part if out is None else out.unionByName(part)
    return out


def dsir_resample(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    k: int = 100,
) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling" — public): hashed n-gram (unigram + bigram) feature
    counts estimate a target-vs-raw bucket log-ratio; each raw doc's
    importance weight is the sum of its gram buckets' ratios; the keep
    decision is deterministic Gumbel-top-k on a portable per-doc
    uniform. The standard selection pass between quality filtering
    (c4m) and mixing (c9i/c9g).

    Hash-stable across engines by the established recipes:
    - gram buckets use the portable char-Horner hash (replayable in
      DuckDB), so both engines agree on every count;
    - the only transcendental outputs (the per-bucket ln ratio and the
      per-doc Gumbel term) are ROUNDed to 6 decimals the moment they
      are computed, then all accumulation is exact DECIMAL in any
      order — the c3i/c7d discipline;
    - the Gumbel uniform is ((id+1)*2654435761 mod (2^31-1) + 1)/2^31,
      an exact power-of-two division strictly inside (0, 1).

    Scale shape: tokenize/gram/hash is fully narrow; one hash-agg on
    bucket (<= n_buckets rows out); the ratio table broadcasts to the
    gram stream (never the reverse); one hash-agg on doc id; top-k is
    TakeOrdered — no global sort, no all-pairs anything.
    """
    from dust_spark.functions import PORTABLE_HASH_MOD, portable_char_hash, tokens

    base = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("id"),
        target_pred.alias("is_t"),
        tokens(text_col).alias("__tok"),
    )
    # __tok is a materialized attribute before any lambda touches it
    # (the CollapseProject rule — an inlined tokens() re-runs the regex
    # split per element inside the bigram transform)
    bigrams = F.when(
        F.size("__tok") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__tok") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("__tok"), i), F.element_at(F.col("__tok"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = base.select(
        "id", "is_t", F.explode(F.concat(F.col("__tok"), bigrams)).alias("g")
    )
    hb = grams.select(
        "id",
        "is_t",
        F.pmod(portable_char_hash(F.col("g")), F.lit(n_buckets)).alias("b"),
    )
    # collapse occurrences to per-(doc, bucket) counts ONCE and persist:
    # both consumers (the bucket profile and the per-doc weights) read
    # this small frame (<= n_docs x n_buckets rows), so the expensive
    # narrow gram-hash pipeline runs a single time
    per = hb.groupBy("id", "is_t", "b").agg(F.count("*").alias("c")).persist()
    cnt = per.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), F.col("c")).otherwise(F.lit(0))).alias("t"),
        F.sum(F.when(F.col("is_t"), F.lit(0)).otherwise(F.col("c"))).alias("r"),
    )
    tot = cnt.agg(F.sum("t").alias("tt"), F.sum("r").alias("rr"))
    nb = F.lit(float(n_buckets))
    lam = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log((F.col("t") + F.lit(1.0)) / (F.col("tt") + nb))
            - F.log((F.col("r") + F.lit(1.0)) / (F.col("rr") + nb)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("lam"),
    )
    wts = (
        per.filter(~F.col("is_t"))
        .join(F.broadcast(lam), "b")
        .groupBy("id")
        .agg(F.sum(F.col("lam") * F.col("c")).alias("w"))
    )
    h = F.pmod((F.col("id") + F.lit(1)) * F.lit(2654435761), F.lit(PORTABLE_HASH_MOD))
    u = (h + F.lit(1)) / F.lit(2147483648.0)
    gum = F.round(-F.log(-F.log(u)), 6).cast("decimal(18,6)")
    sc = wts.select("id", "w", (F.col("w") + gum).alias("score"))
    return (
        sc.orderBy(F.col("score").desc(), "id")
        .limit(k)
        .select(
            F.col("id").alias(id_col),
            F.col("w").cast("double").alias("weight"),
            F.col("score").cast("double").alias("score"),
        )
        .orderBy(F.col("score").desc(), id_col)
    )


def length_bucket_batches(
    docs: DataFrame,
    tokens_per_batch: int = 4096,
    bucket_edges: tuple[int, ...] = (64, 128, 256, 512, 1_000_000),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batch packing audit for training prep: each doc
    lands in the smallest length bucket that fits it, docs within a
    bucket batch up in deterministic id order at the bucket's fixed
    rows-per-batch (tokens_per_batch div edge — every row pads to the
    bucket edge), and the output reports per-batch padding efficiency
    (real tokens / padded tokens). The standard fixed-shape batching
    scheme for sequence models; the efficiency table is what a pipeline
    tunes bucket edges against.

    Scale shape: the within-bucket ordering uses the two-phase
    distributed rank (skew.distributed_rank) — a plain window on the
    handful of bucket keys would single-task ~n/len(edges) rows at
    scale (the b5f smell); the final per-batch rollup keys on
    (bucket, batch) — high cardinality, one hash exchange.
    """
    from dust_spark.operators.skew import distributed_rank
    from dust_spark.functions import tokens

    edges = sorted(bucket_edges)
    toks = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("id"),
        F.size(tokens(text_col, lowercase=False)).cast("long").alias("n_tok"),
    )
    edge = F.lit(edges[-1]).cast("long")
    for e in reversed(edges[:-1]):
        edge = F.when(F.col("n_tok") <= e, F.lit(e).cast("long")).otherwise(edge)
    bucketed = toks.withColumn("edge", edge)
    ranked = distributed_rank(bucketed, "edge", "id")
    rows_per = F.greatest(
        F.lit(1).cast("long"), (F.lit(tokens_per_batch) / F.col("edge")).cast("long")
    )
    per_batch = (
        ranked.withColumn("batch_id", ((F.col("rk") - 1) / rows_per).cast("long"))
        .groupBy("edge", "batch_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("real_tokens"),
        )
    )
    padded = F.col("n_docs") * F.col("edge")
    return per_batch.select(
        "edge",
        "batch_id",
        "n_docs",
        "real_tokens",
        padded.alias("padded_tokens"),
        F.round(F.col("real_tokens").cast("double") / padded, 4).alias("efficiency"),
    ).orderBy("edge", "batch_id")


def temperature_mix(
    df: DataFrame,
    budget_permille: int = 200,
    source_col: str = "source",
    key: str = "doc_id",
    seed: int = 42,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Temperature-scaled source mixing at alpha = 0.5: each source's
    target share of the kept budget is proportional to sqrt(n_s) — the
    standard multinomial-with-temperature flattening (the mBERT/XLM-R
    alpha-sampling recipe, public) that upweights small sources without
    letting crawl giants dominate. ``budget_permille`` is the overall
    keep budget in 1/1000ths of the corpus.

    Fully deterministic and cross-engine exact: sqrt is IEEE
    correctly-rounded in both engines, ROUND(sqrt(n)*1e6) pins it to an
    int64, and every sum/division after that is exact integer
    arithmetic (budget B = (N*permille) div 1000, per-source target =
    (B*ss) div S). The kept rows are each source's hash-priority head
    (the c9h portable-bucket machinery), so reprocessing never
    reshuffles the selection.

    Scale shape: one count agg (sources ≪ corpus), a broadcast target
    table, one window partitioned by source — per-source occupancy is
    whatever the corpus has; compose with hash_sample for pathological
    single-source skew, like cap_per_stratum documents.

    ``counts`` optionally supplies a precomputed (ideally persisted)
    ``groupBy(source).count()`` frame with columns (source, n) so an
    auditing caller that also needs the per-source counts shares one
    aggregation instead of re-running it (r13 opt: c9q planned the
    corpus count agg SIX times — ReuseExchange does not dedupe across
    the operator/query boundary once AQE rewrites the subtrees).
    """
    if counts is None:
        counts = df.groupBy(source_col).agg(F.count("*").alias("n"))
    ss = counts.select(
        source_col,
        "n",
        F.round(F.sqrt(F.col("n")) * F.lit(1000000.0), 0).cast("long").alias("ss"),
    )
    tot = ss.agg(F.sum("ss").alias("s_tot"), F.sum("n").alias("n_tot"))
    tgt = (
        ss.crossJoin(F.broadcast(tot))
        .withColumn(
            "tgt",
            F.expr(f"((n_tot * {int(budget_permille)}) div 1000) * ss div s_tot"),
        )
        .select(source_col, "tgt")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(source_col).orderBy("__b", key)
    return (
        df.join(F.broadcast(tgt), source_col)
        .withColumn("__b", _bucket(F.col(key), seed, "portable"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("tgt"))
        .drop("__b", "__rn", "tgt")
    )
