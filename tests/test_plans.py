"""Physical-plan audits: the scale properties SURVEY.md §4.2 promises —
pushdown, pruning, broadcast dimension joins, no row-at-a-time Python —
asserted on real plans over the fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from dust_spark import plans
from dust_spark.queries import all_queries
from dust_spark.tables import load_table
from tests.conftest import SF_DIR

QUERIES = all_queries()


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["b2a_eq_filter"].fn(spark, SF_DIR)
    plans.assert_filter_pushed(df, "c_mktsegment")


def test_column_pruning(spark):
    # two-column projection over lineitem must not read the other 9 cols
    li = load_table(spark, SF_DIR, "lineitem")
    df = li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 10)
    plans.assert_columns_pruned(df, ["l_extendedprice", "l_comment", "l_shipdate", "l_partkey"])
    plans.assert_filter_pushed(df, "l_quantity")


def test_star_join_broadcasts_dimensions(spark):
    df = QUERIES["b3i_star_join"].fn(spark, SF_DIR)
    plans.assert_broadcast_join(df)


def test_no_row_python_in_catalog(spark):
    """No declared query may use row-at-a-time Python UDFs; Arrow-batched
    stages are allowed only where declared (multimodal decode)."""
    for name, q in QUERIES.items():
        df = q.fn(spark, SF_DIR)
        assert not plans.python_in_hot_path(df), f"{name} uses BatchEvalPython"


def test_no_cartesian_in_heavy_tierc(spark):
    """The newest heavy Tier C operators (r7/r8) must never plan a
    CartesianProduct or broadcast nested loop over DATA-sized inputs —
    every candidate generator is bucketed (coarse lists, conflict keys,
    interval buckets). The dense-spine crossJoin in c7c is
    metadata-sized by construction (bucket range × key dims) and c2k's
    Lloyd broadcast joins are k-row broadcasts — both allowed as
    BroadcastNestedLoopJoin ONLY when one side is a broadcast."""
    for name in ("c3l_ivfpq_ann", "c2k_semantic_dedup", "c6d_interval_join",
                 "c3j_pq_ann", "c1e_boilerplate_lines", "c4p_bpe_pair_counts"):
        p = plans.formatted_plan(QUERIES[name].fn(spark, SF_DIR))
        assert "CartesianProduct" not in p, f"{name} plans a CartesianProduct"


def test_topk_plans_as_take_ordered(spark):
    df = QUERIES["b6c_top_k"].fn(spark, SF_DIR)
    assert "TakeOrderedAndProject" in plans.formatted_plan(df)


def test_asof_is_single_shuffle(spark):
    """The as-of join must cost exactly one exchange for the union (plus
    none for the window that reuses its partitioning)."""
    from dust_spark.operators import asof_aggregate

    events = load_table(spark, SF_DIR, "events").filter(F.col("event_id") <= 50)
    orders = load_table(spark, SF_DIR, "orders")
    df = asof_aggregate(events, orders, "ts", "o_orderdate", "user_id", "o_custkey", "o_orderkey")
    n = plans.count_shuffles(df)
    assert n <= 1, f"as-of join should shuffle once, got {n} exchanges:\n{plans.formatted_plan(df)[:2000]}"


def test_explain_summary_shape(spark):
    s = plans.explain_summary(QUERIES["b4a_groupby_aggs"].fn(spark, SF_DIR))
    # codegen_stages is only populated on AQE final plans (post-execution);
    # pre-execution we assert the shuffle budget + no row-Python
    assert s["shuffles"] >= 1
    assert not s["python_row_udfs"]


def test_minhash_signatures_fully_narrow(spark):
    """The signature stage must not shuffle at all: base hashing is a
    single-level JVM transform, the k-minima kernel a per-row Arrow
    batch — signatures for a 100 TB corpus are a pure map."""
    from dust_spark.operators import minhash_signatures

    docs = load_table(spark, SF_DIR, "documents")
    df = minhash_signatures(docs)
    n = plans.count_shuffles(df)
    assert n == 0, f"signature stage should be narrow, got {n} exchanges"


def test_simhash_fully_narrow(spark):
    from dust_spark.operators import simhash_table

    docs = load_table(spark, SF_DIR, "documents")
    assert plans.count_shuffles(simhash_table(docs)) == 0


def test_simhash_portable_udf_extracted_above_sort(spark, monkeypatch):
    """The portable-simhash majority vote is an Arrow kernel (above the
    r14 input-size gate) whose projection must sit ABOVE the id sort:
    with a Sort above the UDF-over-HOF projection, ExtractPythonUDFs
    fails to pull the UDF out over this fixture shape and
    range-partitioner sampling dies with INTERNAL_ERROR (see
    simhash_table_portable docstring). Pin (a) the UDF lands in an
    ArrowEvalPython node, (b) that node is above the Sort, (c) no raw
    PythonUDF is left inside a Project. Below the gate the operator is
    pure Catalyst — no Python node at all (also pinned)."""
    from dust_spark.operators import dedup, simhash_table_portable

    docs = load_table(spark, SF_DIR, "documents")
    # small input (test SF is far below the threshold): pure Catalyst
    small = simhash_table_portable(docs)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in small and "BatchEvalPython" not in small

    monkeypatch.setattr(dedup, "_ARROW_KERNEL_MIN_INPUT_BYTES", 0)
    plan = simhash_table_portable(docs)._jdf.queryExecution().executedPlan().toString()
    arrow = plan.find("ArrowEvalPython")
    sort = plan.find("Sort [id")
    assert arrow != -1, f"simhash_bits_udf not extracted:\n{plan[:1500]}"
    assert sort != -1 and arrow < sort, (
        f"Sort must sit below the ArrowEvalPython node:\n{plan[:1500]}"
    )
    assert "BatchEvalPython" not in plan
    # the UDF name appears exactly once — in the ArrowEvalPython node,
    # never as an unextracted expression inside a Project
    assert plan.count("simhash_bits_udf") == 1, plan[:1500]


def test_lsh_exchanges_never_carry_vectors(spark):
    """Candidate generation / dedup must shuffle ids and bucket keys
    only — never the embedding arrays (the round-1 anti-pattern)."""
    import re

    from dust_spark.operators import embedding_near_dup, rp_lsh_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    for df in (
        rp_lsh_topk(emb.filter(F.col("vec_id") <= 20), emb, k=5, bits_per_table=6),
        embedding_near_dup(emb, threshold=0.3),
    ):
        plan = plans.formatted_plan(df)
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
            keys = m.group(1)
            assert "embedding" not in keys and "qv" not in keys and "nv" not in keys \
                and "va" not in keys and "vb" not in keys, f"vector in shuffle key: {keys}"


def test_decontaminate_shuffles_ids_not_documents(spark):
    """The anti-join must key on doc_id; document text never enters an
    exchange (hash key or payload)."""
    import re

    from dust_spark.operators import decontaminate

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    plan = plans.formatted_plan(decontaminate(docs, bench, ngram_words=8))
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), f"text in shuffle key: {m.group(1)}"


def test_ngram_postings_join_on_hashes(spark):
    """The inverted-index self-join keys on the 8-byte shingle hash, not
    the shingle string."""
    import re

    from dust_spark.operators import ngram_jaccard_pairs

    docs = load_table(spark, SF_DIR, "documents")
    plan = plans.formatted_plan(ngram_jaccard_pairs(docs, threshold=0.2))
    joins = re.findall(r"SortMergeJoin.*|ShuffledHashJoin.*|BroadcastHashJoin.*", plan)
    assert joins, "expected joins in the pair plan"
    assert any("gh" in j for j in joins), f"no hash-keyed join found:\n{plan[:1500]}"


def test_tpch_q3_shape_single_shuffle_topk(spark):
    """The Q3-shaped composite must plan as: broadcast dimension hops,
    ONE fact-fact exchange (plus AQE's post-agg coalesce), and a
    TakeOrderedAndProject cap — the 100 TB shape."""
    df = QUERIES["b13a_tpch_q3_shape"].fn(spark, SF_DIR)
    plan = plans.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    n = plans.count_shuffles(df)
    assert n <= 2, f"expected <=2 exchanges, got {n}"


def test_broadcast_size_gates(spark):
    """cosine_topk / decontaminate hint a broadcast only when the small
    side is under the row limit; an oversized side must drop the hint so
    the planner (not an unconditional F.broadcast) owns the strategy.
    Auto-broadcast is disabled here so a surviving hint is the only way
    a Broadcast* join could appear."""
    from dust_spark.operators import cosine_topk, decontaminate

    emb = load_table(spark, SF_DIR, "embeddings")
    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # hint survives under the limit (forces broadcast past the conf)
        small = plans.formatted_plan(cosine_topk(emb.filter(F.col("vec_id") <= 5), emb, k=3))
        assert "BroadcastNestedLoopJoin" in small or "BroadcastHashJoin" in small
        # limit below the query-side size -> hint must be dropped
        big = plans.formatted_plan(
            cosine_topk(emb.filter(F.col("vec_id") <= 5), emb, k=3, broadcast_limit=3)
        )
        assert "BroadcastNestedLoopJoin" not in big, f"oversized side still broadcast:\n{big[:1500]}"

        gated = plans.formatted_plan(decontaminate(docs, bench, ngram_words=8, broadcast_limit=1))
        semi = [ln for ln in gated.splitlines() if "LeftSemi" in ln]
        assert semi and all("Broadcast" not in ln for ln in semi), (
            f"oversized benchmark still broadcast in semi-join:\n{gated[:1500]}"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_distributed_rank_no_low_card_sort(spark):
    """c8d (r9): the whole point is that NO window partitions on the
    3-value status key alone — every Window in the plan includes the
    slice id, and the offsets join is a broadcast."""
    df = QUERIES["c8d_distributed_rank"].fn(spark, SF_DIR)
    p = plans.formatted_plan(df)
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
        assert "__pid" in spec, f"window partitions without the slice id: {spec}"
    assert "BroadcastExchange" in p  # the prefix-offsets join


def test_new_r9_tierc_no_cartesian(spark):
    """r9 additions keep the no-CartesianProduct discipline: c2l joins
    gram hashes, c6f chains user-key aggs, c9j rides the c2c pair
    fixture, c7d is one bucket agg + lag windows."""
    for name in (
        "c2l_containment_scores",
        "c6f_event_funnel",
        "c7d_ewma_smooth",
        "c9j_keep_k_per_cluster",
    ):
        p = plans.formatted_plan(QUERIES[name].fn(spark, SF_DIR))
        assert "CartesianProduct" not in p, f"{name} plans a CartesianProduct"


def test_new_r10_tierc_plan_shapes(spark):
    """r10 additions keep the catalog plan discipline: no
    CartesianProduct or row-at-a-time Python anywhere; BNLJ only as
    the ONE-ROW broadcast planes frame (the c7c/c2k metadata-broadcast
    allowance — c3n crossJoins the single planes row); c8e top-k plans
    as TakeOrderedAndProject (never a global sort of the count table);
    c7e's windows and groupBy all partition on the (key, bucket) pair."""
    import re

    for name in (
        "c7e_resample_ohlc",
        "c7f_rolling_zscore",
        "c4q_ngram_novelty",
        "c3n_mips_topk",
        "c9l_corpus_card",
        "c9m_contamination_report",
        "c8e_heavy_hitters",
        "c5d_modality_budget",
    ):
        p = plans.formatted_plan(QUERIES[name].fn(spark, SF_DIR))
        assert "CartesianProduct" not in p, f"{name} plans a CartesianProduct"
        # one-row broadcast BNLJs allowed: c3n crossJoins the planes
        # row, c8e the scalar total
        if name not in ("c3n_mips_topk", "c8e_heavy_hitters"):
            assert "BroadcastNestedLoopJoin" not in p, f"{name} plans a BNLJ"
        assert "BatchEvalPython" not in p, f"{name} has row-at-a-time Python"
    p = plans.formatted_plan(QUERIES["c8e_heavy_hitters"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    p = plans.formatted_plan(QUERIES["c7e_resample_ohlc"].fn(spark, SF_DIR))
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
        assert "k#" in spec and "bucket_s#" in spec, spec


def test_new_r11_tierc_plan_shapes(spark):
    """r11 additions keep the catalog plan discipline: no
    CartesianProduct or row-at-a-time Python; BNLJ only as a one-row
    metadata broadcast (c9n's totals row, c4s's corpus-stats row);
    c4s/c9n's small side tables (query terms, bucket ratios) ride
    BroadcastExchange into the scoring joins; the c4s/c8f/c9o top-k or
    rank machinery never global-sorts the corpus."""
    for name in (
        "c8f_distributed_rank_nulls",
        "c9n_dsir_resample",
        "c4r_tokenizer_fertility",
        "c4s_bm25_topk",
        "c9o_length_bucket_batches",
        "c4t_model_quality",
        "c9p_diversity_keep",
        "c4u_bigram_logprob",
        "c9q_temperature_mix",
    ):
        p = plans.formatted_plan(QUERIES[name].fn(spark, SF_DIR))
        assert "CartesianProduct" not in p, f"{name} plans a CartesianProduct"
        # one-row / k-row metadata broadcasts allowed: c9n's totals row,
        # c4s's corpus-stats row, c9p's centroid frame, c4u's vocab row
        if name not in (
            "c9n_dsir_resample", "c4s_bm25_topk", "c9p_diversity_keep",
            "c4u_bigram_logprob", "c9q_temperature_mix",
        ):
            assert "BroadcastNestedLoopJoin" not in p, f"{name} plans a BNLJ"
        assert "BatchEvalPython" not in p, f"{name} has row-at-a-time Python"
    p = plans.formatted_plan(QUERIES["c4s_bm25_topk"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p  # final top-k, no global sort
    assert "BroadcastExchange" in p  # query-term table broadcasts
    p = plans.formatted_plan(QUERIES["c9n_dsir_resample"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert "BroadcastExchange" in p  # lambda ratio table broadcasts


def test_b5e_no_single_partition_window(spark):
    """r12 (verdict #4): the global-order ranking query must NOT plan
    the single-task window sort — NTILE decomposes through
    global_row_number (range partition + broadcast prefix offsets) and
    DENSE_RANK through the broadcast rank table. The only remaining
    global exchange is the final presentation ORDER BY, which is range
    partitioning, not SinglePartition."""
    df = QUERIES["b5e_ntile_dense_rank"].fn(spark, SF_DIR)
    p = plans.formatted_plan(df)
    assert "Exchange SinglePartition" not in p, p
    assert "BroadcastExchange" in p  # offsets + dense-rank tables


def test_b5a_no_single_partition_window(spark):
    """r12: b5a's global RANK decomposes like b5e — no data-sized
    single-partition window sort remains."""
    df = QUERIES["b5a_row_number_rank"].fn(spark, SF_DIR)
    p = plans.formatted_plan(df)
    assert "Exchange SinglePartition" not in p, p
