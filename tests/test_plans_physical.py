"""Physical-plan regression tests: the plans we shipped are the plans
we meant — broadcasts for dims, pushdown/pruning into the parquet
scan, whole-stage codegen on the hot paths. These lock the 100 TB
posture against silent regressions."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.catalog import load_table

plans.load_all()

SF = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_flagship_broadcasts_all_dims(spark):
    df = plans.QUERIES["flagship_q5_revenue_by_nation"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # four dimension joins, all broadcast — zero shuffled joins
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan
    # one data Exchange total: the final aggregation
    assert plan.count("Exchange hashpartitioning") <= 1


def test_filter_pushdown_reaches_scan(spark):
    df = load_table(spark, SF, "orders").filter("o_totalprice > 400000").select(
        "o_orderkey", "o_totalprice"
    )
    plan = _formatted(df)
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,400000.0)]" in plan


def test_column_pruning_reaches_scan(spark):
    df = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    plan = _formatted(df)
    read = [line for line in plan.splitlines() if "ReadSchema" in line][0]
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read  # untouched columns not read


def test_q1_uses_whole_stage_codegen_and_partial_agg(spark):
    df = plans.QUERIES["q1_pricing_summary"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partial (map-side) + final aggregation around one exchange
    assert plan.count("HashAggregate") == 2
    assert "partial_sum" in plan
    # codegen ids only materialize in the AQE final plan → execute first
    df.collect()
    assert "codegen id :" in _formatted(df)


def test_wine_pipeline_has_no_python_udf(spark):
    plan = _formatted(plans.QUERIES["wine_pipeline"](spark, SF))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


@pytest.mark.parametrize(
    "name",
    ["dedup_minhash_lsh", "sim_topk_lsh", "text_token_stats", "func_json_pack"],
)
def test_extension_paths_stay_jvm_side(spark, name):
    plan = _formatted(plans.QUERIES[name](spark, SF))
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere


def test_tfidf_doc_freq_join_not_hinted_broadcast(spark):
    """The tf↔doc_freq join must carry NO broadcast hint — doc_freq is
    vocabulary-sized (unbounded at 100 TB). With the auto-broadcast
    threshold disabled, a lingering hint would still plan a
    BroadcastHashJoin; hint-free, the term join sort-merges and the only
    broadcast left is the 1-row n_docs scalar (BroadcastNestedLoopJoin)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plans.QUERIES["text_tfidf_top_terms"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1  # the n_docs scalar only


def test_events_scan_prunes_props_when_unused(spark):
    df = load_table(spark, SF, "events").select("user_id", "value")
    read = [line for line in _formatted(df).splitlines() if "ReadSchema" in line][0]
    assert "props" not in read


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Join-driven pruning: a partitioned fact joined to a filtered dim
    must plan a dynamicpruning partition filter, so at scale only the
    partitions the dim selects are scanned at all."""
    fact_path = str(tmp_path / "orders_by_priority")
    orders = load_table(spark, SF, "orders")
    orders.write.partitionBy("o_orderpriority").mode("overwrite").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    # the dim filter is on a DIFFERENT column than the join key, so the
    # partition values to keep are only known at runtime — a filter on
    # the key itself would be constant-propagated into a static
    # PartitionFilters entry and DPP would never need to fire
    dim = (
        orders.select("o_orderpriority", "o_orderstatus")
        .distinct()
        .filter(F.col("o_orderstatus") == "P")
        .select("o_orderpriority")
        .distinct()
    )
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try:
        j = fact.join(dim, "o_orderpriority").groupBy("o_orderpriority").count()
        plan = _formatted(j)
    finally:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", prev)
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_q6_all_predicates_push_to_scan(spark):
    """Q6 is the canonical pushdown query: every predicate (date range,
    discount band, quantity cap) must reach the parquet scan, and the
    scan must read only the four columns the query touches."""
    plan = _formatted(plans.QUERIES["q6_revenue_forecast"](spark, SF))
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, col
    read = [line for line in plan.splitlines() if "ReadSchema" in line][0]
    assert "l_extendedprice" in read
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_q22_anti_join_and_scalar_broadcast(spark):
    plan = (
        plans.QUERIES["q22_idle_customers"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row avg-balance cutoff


def test_aqe_splits_skewed_join_partitions(spark):
    """100 TB posture: a skewed fact-fact join must not serialize into
    one giant task — AQE's skew-join handling splits oversized
    partitions at runtime. Thresholds are lowered so the synthetic hot
    key (95% of rows) crosses them at test scale; the assertion is the
    `skew=true` marker in the final adaptive plan."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 2_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        df = left.join(right, "k")
        df.collect()  # the skew split only exists in the FINAL adaptive plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_q8_snowflake_broadcasts_via_stats_not_hints(spark):
    """Q8 hints ONLY the constant-size tables (2× nation + region).
    part/customer/supplier scale with SF in this corpus, so their
    joins must carry NO broadcast hint: at test SF the planner still
    broadcasts every dim edge from parquet size stats (first block),
    and with auto-broadcast disabled the SF-scaled joins must degrade
    to shuffle joins (second block) — a lingering hint would keep
    them broadcast at threshold=-1, the exact design that OOMs at
    100 TB."""
    df = plans.QUERIES["q8_market_share"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # stats-driven at this SF: all dim edges broadcast, zero SMJ
    assert plan.count("BroadcastHashJoin") >= 6
    assert "SortMergeJoin" not in plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan2 = (
            plans.QUERIES["q8_market_share"](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # only the hinted constant tables survive: 2× nation + region
    assert plan2.count("BroadcastHashJoin") == 3
    # part/customer/supplier/orders now shuffle — proof they're unhinted
    assert plan2.count("SortMergeJoin") >= 4


def test_q21_decorrelates_to_semi_and_anti(spark):
    """Q21's EXISTS/NOT-EXISTS pair must compile to one LeftSemi and
    one LeftAnti join — no correlated re-scan, no cartesian."""
    df = plans.QUERIES["q21_waiting_suppliers"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_salted_join_spreads_key_and_matches_plain_join(spark):
    """The explicit salted fact-fact join (operators/agg.py
    salted_join, registered as q8_market_share_skew_safe): the join
    key must include the salt columns (so a hot key spreads across
    salt_buckets reducers), the right side must replicate via ONE
    explode, and the result must be exactly the plain join's."""
    from whisky_wine_etl_spark.operators.agg import salted_join

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = salted_join(li, o, "l_orderkey", "o_orderkey", salt_buckets=4)
        plan = salted._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "__lsalt" in plan and "__rsalt" in plan  # salt in the join key
    assert plan.count("Generate explode") == 1  # right side replicated once
    # salts never leak into the output schema
    assert set(salted.columns) == {"l_orderkey", "l_quantity", "o_orderkey", "o_orderpriority"}
    # result-invariance vs the plain inner join
    plain = li.join(o, li.l_orderkey == o.o_orderkey)
    assert salted.count() == plain.count()
    key = lambda r: (r.l_orderkey, r.l_quantity, r.o_orderpriority)  # noqa: E731
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """100 TB posture: when a selective filter sits on one side of a
    fact-fact shuffle join, Spark's runtime bloom filter (on by
    default in Spark 4) should be injected on the probe side so most
    rows die at the scan instead of crossing the shuffle. At test
    scale broadcast joins normally pre-empt this — the test forces the
    shuffle-join path and drops the application-side size floor to
    observe the injection itself."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders").filter("o_totalprice > 400000")
        df = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("l_returnflag").count()
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized  # bloom probe injected on lineitem side
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_join_strategy_hints_are_honored(spark):
    """Join-strategy control for 100 TB tuning: when the planner's
    default is wrong for a specific join (e.g. SMJ on data where one
    side hashes cheaply), hints must still steer the physical pick —
    shuffle_hash → ShuffledHashJoin, merge → SortMergeJoin."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders")
        hashed = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        merged = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        assert "ShuffledHashJoin" in hashed._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in merged._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q9_supply_snowflake_broadcasts_via_stats_not_hints(spark):
    """Q9 hints ONLY nation (25 rows, constant). part, supplier and
    the derived partsupp all scale with SF, so at test SF they must
    broadcast via parquet stats (first block), and with
    auto-broadcast disabled all of them must degrade to shuffle
    joins, leaving exactly the one hinted nation broadcast (second
    block)."""
    df = plans.QUERIES["q9_product_profit"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan2 = (
            plans.QUERIES["q9_product_profit"](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert plan2.count("BroadcastHashJoin") == 1  # the hinted nation only
    assert plan2.count("SortMergeJoin") >= 4


# ---------------------------------------------------------------------------
# Round-3 plan posture
# ---------------------------------------------------------------------------


def test_dedup_incremental_pushes_batch_filters_no_hints(spark):
    """Both the ledger and batch filters must reach the parquet scan
    (each side reads only its slice), and no side carries a broadcast
    hint — at 100 TB the ledger outgrows any executor, AQE decides."""
    df = plans.QUERIES["dedup_incremental"](spark, SF)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in opt and "broadcast" not in opt.lower()
    plan = _formatted(df)
    # the modulo filters are partial-function pushdowns; the scans must
    # at least prune to the two used columns
    reads = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert reads and all("text" in r or "doc_id" in r for r in reads)


def test_histogram_broadcasts_only_the_scalar_params(spark):
    """The 1-row min/max frame is the ONE legitimate broadcast in the
    histogram; the fact side must not shuffle for the cross join."""
    df = plans.QUERIES["agg_histogram_value"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_perplexity_vocab_is_broadcast_scalar(spark):
    """The vocabulary count (1 row) joins by broadcast; the bigram
    stream must never shuffle for it."""
    df = plans.QUERIES["corpus_perplexity_score"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan


def test_bitmap_distinct_has_partial_aggregation(spark):
    """bitmap_construct_agg must run partial+final (map-side combine)
    like any algebraic aggregate — the mergeability that makes it the
    exact rollup currency."""
    df = plans.QUERIES["agg_bitmap_distinct"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_bitmap_construct_agg" in plan
    assert "partial_bitmap_or_agg" in plan


def test_vocab_topk_partial_agg_before_takeordered(spark):
    """text_vocab_topk: partial aggregation below the exchange, then
    TakeOrderedAndProject — never a global sort of the vocabulary."""
    df = plans.QUERIES["text_vocab_topk"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan
    assert plan.count("Sort ") == 0  # no standalone global sort operator


def test_failure_cases_is_map_only_after_pipeline(spark):
    """The per-row failure frames must add ZERO work beyond the scan
    they ride on: no Python eval anywhere, and the explode is a
    Generate directly over the projected input — the only exchanges
    in wine_v2 are the wine pipeline's own (median impute), and the
    contract frame's row-local branch shuffles only for the FK
    anti-join and the final union's sink."""
    wine = plans.QUERIES["wine_v2_failure_cases"](spark, SF)
    plan = wine._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate explode" in plan
    base = plans.QUERIES["wine_pipeline"](spark, SF)
    base_ex = base._jdf.queryExecution().executedPlan().toString().count("Exchange")
    assert plan.count("Exchange") <= base_ex  # no NEW shuffles added

    contract = plans.QUERIES["contract_failures_orders"](spark, SF)
    cplan = contract._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in cplan
    assert "Generate explode" in cplan


def test_interpolate_single_window_pass(spark):
    """All four gap-fill window functions (prev/next value and
    timestamp) must evaluate in ONE Window operator over one keyed
    sort — four separate window passes would be 4x the in-partition
    work."""
    df = plans.QUERIES["ts_interpolate_linear"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1
    assert "BatchEvalPython" not in plan


def test_capped_dedup_prunes_before_self_join(spark):
    """The stop-shingle cap must filter the posting lists BEFORE the
    pair self-join (candidate generation), not after — pruning after
    would leave the quadratic hot-shingle work in place."""
    df = plans.QUERIES["dedup_ngram_capped"](spark, SF)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # the frequency filter (count <= cap) appears as a join against the
    # kept-shingle set feeding the pair join: two shingle derivations
    # joined on shingle, with the aggregate filter between them
    assert "count" in opt.lower()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_null_safe_join_stays_hash_join(spark):
    """EqualNullSafe must plan as a hash-joinable key (broadcast or
    shuffled hash/SMJ) — a fallback to BroadcastNestedLoopJoin would
    make the null-safe form quadratic at scale."""
    df = plans.QUERIES["join_null_safe_eq"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan)


def test_repetition_signals_is_map_only(spark):
    """Every Gopher signal is an array-local expression — the plan
    must contain NO Exchange (the whole point of running this gate
    first at 100 TB) and no Python evaluation."""
    df = plans.QUERIES["text_repetition_signals"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_gaps_islands_two_exchanges_rollup_reuses_window_partitioning(spark):
    """distinct (user,day) is one exchange, the user_id window the
    second; the (user_id, grp) rollup must NOT add a third — hash
    partitioning on user_id already clusters the grouping keys."""
    df = plans.QUERIES["window_gaps_islands"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2
    assert "BatchEvalPython" not in plan


def test_partition_prune_reads_one_directory(spark):
    """The event_type predicate must resolve as a PartitionFilter
    against the hive layout (planning-time pruning), not a data
    filter over a full scan."""
    df = plans.QUERIES["source_partition_prune"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate appears inside PartitionFilters: [...]
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf and "purchase" in pf
    assert "BatchEvalPython" not in plan


def test_markov_normalization_window_runs_over_aggregate(spark):
    """The row-normalization window must sit ABOVE the (from,to)
    rollup (TYPE²-sized input), never over the raw event stream; the
    rollup itself partial-aggregates."""
    df = plans.QUERIES["events_markov_transitions"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partial agg before shuffle for the rollup
    assert "partial_count" in plan or "Partial" in plan
    # exactly one window over the raw events (the lead()); the
    # normalization window input is the aggregate's output
    assert plan.index("Window") < len(plan)
    assert "BatchEvalPython" not in plan


def test_anomaly_zscore_single_keyed_window_pass(spark):
    """All three frame aggregates (mean, stddev, count) must evaluate
    in ONE window operator over one user_id exchange — three separate
    passes would triple the sort cost."""
    df = plans.QUERIES["events_anomaly_zscore"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1
    assert "BatchEvalPython" not in plan


def test_skyline_aggregates_then_broadcasts_back(spark):
    """The Pareto frontier never compares part pairs: the plan is one
    partial-agg'd groupBy to the size-cardinality aggregate, a window
    over that tiny frame, and a BROADCAST join back to the fact scan
    (with price/size null-filters pushed into parquet)."""
    df = plans.QUERIES["skyline_pareto_parts"](spark, SF)
    plan = _formatted(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_min" in plan
    assert "PushedFilters: [IsNotNull(p_retailprice), IsNotNull(p_size)]" in plan
    assert "BatchEvalPython" not in plan


def test_bm25_broadcasts_stats_and_stays_jvm(spark):
    """BM25's doc-frequency (≤ |terms| rows) and (N, avgdl) scalars
    join as broadcasts; the top-k is TakeOrderedAndProject, not a
    global sort; no Python evaluation anywhere."""
    df = plans.QUERIES["text_bm25_search"](spark, SF)
    plan = _formatted(df)
    assert plan.count("BroadcastNestedLoopJoin") + plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan


def test_assoc_rules_single_fact_shuffle_for_pairs(spark):
    """Basket pair generation folds the per-order dedup into the
    collect_set aggregate: exactly ONE exchange keyed on l_orderkey
    touches fact-table-scale data; item counts and the order count
    are broadcast; top-k is TakeOrderedAndProject."""
    df = plans.QUERIES["assoc_rules_lift"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(l_orderkey") == 0  # pre-checkpointed
    assert "Scan ExistingRDD" in plan  # consumers read the materialized baskets
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_ewma_single_keyed_window_pass(spark):
    """The EWMA closed form is one user-keyed sort: row_number,
    first_value, and the running prefix sum all share the same
    (user_id) window partitioning — exactly one exchange."""
    df = plans.QUERIES["ts_ewma_user"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan


def test_welch_ttest_single_pass_partial_agg(spark):
    """All six statistics come from ONE conditional-aggregation scan
    with map-side partials — no self-join of per-group aggregates."""
    df = plans.QUERIES["stat_ab_welch_ttest"](spark, SF)
    plan = _formatted(df)
    assert "partial_count" in plan or "partial_avg" in plan
    assert "Join" not in plan
    # the IN-list predicate reaches the parquet scan
    assert "PushedFilters" in plan and "In(event_type" in plan


def test_kmeans_assignment_is_arrow_tier_only(spark):
    """The k-means assignment runs in the Arrow-vectorized tier (the
    interpreted HOF fold measured ~10x slower at sf0.1) and never the
    row-at-a-time Python path."""
    from whisky_wine_etl_spark.operators.clustering import kmeans_assign

    emb = load_table(spark, SF, "embeddings")
    centroids = [[0.0] * 64, [1.0] * 64]
    df = kmeans_assign(emb, "embedding", centroids)
    plan = _formatted(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_ohlc_single_partial_agg_no_window(spark):
    """OHLC bars are ONE partial-aggregatable groupBy: min_by/max_by
    carry open/close, so no per-bucket window sort exists and the
    only data exchange is the aggregation shuffle."""
    df = plans.QUERIES["ts_resample_ohlc"](spark, SF)
    plan = _formatted(df)
    assert "Window" not in plan
    assert "partial_min_by" in plan  # map-side combine carries open/close
    assert "BatchEvalPython" not in plan
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert simple.count("Exchange hashpartitioning") == 1


def test_geo_harmonic_single_scan_partial_agg(spark):
    df = plans.QUERIES["agg_geo_harmonic_means"](spark, SF)
    plan = _formatted(df)
    assert "Join" not in plan
    assert "partial_count" in plan or "partial_avg" in plan
    assert "PushedFilters" in plan and "GreaterThan(l_extendedprice" in plan


def test_mutual_information_scans_orders_once(spark):
    """Marginals and entropies derive from the checkpointed
    contingency table — the orders parquet is scanned exactly once
    (at checkpoint build), never by the returned plan."""
    df = plans.QUERIES["stat_mutual_information"](spark, SF)
    plan = _formatted(df)
    assert "orders.parquet" not in plan  # all inputs are the tiny checkpoint
    assert "BatchEvalPython" not in plan


def test_er_blocking_no_cartesian(spark):
    """Both ER passes join on the block key — the planner must pick a
    hash join with the < predicate as a post-join filter, never a
    cartesian/nested-loop over the segment."""
    df = plans.QUERIES["er_blocked_fuzzy_pairs"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rolling_distinct_single_keyed_window(spark):
    """One exchange on user_id; the frame is a RANGE spec over
    unix_micros, evaluated without Python."""
    df = plans.QUERIES["window_rolling_distinct"](spark, SF)
    plan = _formatted(df)
    assert "RangeFrame, -86400000000" in plan  # microsecond frame bound
    assert "BatchEvalPython" not in plan
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert simple.count("Exchange hashpartitioning") == 1


def test_mann_whitney_no_global_window(spark):
    """The rank reconstruction windows over __pid partitions (range
    partitioning), never a single-partition global sort; the only
    SinglePartition exchange is the final scalar aggregate."""
    df = plans.QUERIES["stat_mann_whitney_u"](spark, SF)
    plan = _formatted(df)
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange SinglePartition") <= 1


def test_mad_outliers_broadcasts_median_maps(spark):
    """Both median maps are 5-row frames joined back by broadcast
    (the dev frame is rebuilt in the MAD branch — a cheap map-side
    join beats caching the fact); everything stays JVM-side with
    partial aggregation."""
    df = plans.QUERIES["stat_mad_outliers"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_cusum_windows_over_hourly_aggregate_only(spark):
    """The running totals window over the range-partitioned hourly
    aggregate (≤ #hours rows) — no SinglePartition exchange anywhere
    and no window over raw events."""
    df = plans.QUERIES["ts_cusum_rate_drift"](spark, SF)
    plan = _formatted(df)
    assert "Exchange SinglePartition" not in plan
    assert "BatchEvalPython" not in plan


def test_decay_score_single_shuffle_partial_agg(spark):
    """One hash exchange (user_id) with map-side partial aggregation;
    the max-timestamp scalar arrives by broadcast, not collect."""
    df = plans.QUERIES["events_decay_score"](spark, SF)
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert simple.count("Exchange hashpartitioning") == 1
    plan = _formatted(df)
    assert "partial_count" in plan or "partial_sum" in plan
    assert "BatchEvalPython" not in plan


def test_k_anonymity_rollup_expands_with_partial_agg(spark):
    """The ROLLUP runs as one Expand + aggregate with partial
    combine; the per-class frame re-aggregates without re-reading
    the customer scan."""
    df = plans.QUERIES["privacy_k_anonymity"](spark, SF)
    plan = _formatted(df)
    assert "Expand" in plan
    assert plan.count("customer.parquet") == 1
    assert "BatchEvalPython" not in plan


def test_clustering_coeff_reuses_materialized_edges(spark):
    """Degrees, triangles, and per-node counts all read the ONE
    localCheckpointed edge list — five ExistingRDD scans (deg×2,
    tri×3), so the quadratic edge build runs exactly once, and the
    parquet source appears nowhere in the executed plan. (Was
    persist()-based until round 5 — localCheckpoint blocks free on GC
    instead of leaking per call, ADVICE r4.)"""
    df = plans.QUERIES["graph_clustering_coeff"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") >= 5
    assert "lineitem.parquet" not in plan


def test_centroid_affinity_single_corpus_pass(spark):
    """The embeddings parquet feeds exactly one explode+aggregate
    (the localCheckpointed centroid frame); pair join and norms run
    on the 640-row materialization with the norm maps broadcast."""
    df = plans.QUERIES["sim_centroid_affinity"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") >= 3  # x, y, and the norm build
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in plan
    assert "embeddings.parquet" not in plan


def test_funnel_latency_pushes_type_filters_to_scan(spark):
    """Both event-type filters reach the parquet scan as pushed
    predicates; the user join is a co-partitioned hash join, not a
    broadcast of an SF-scaled side."""
    df = plans.QUERIES["events_funnel_latency"](spark, SF)
    plan = _formatted(df)
    assert "EqualTo(event_type,view)" in plan
    assert "EqualTo(event_type,purchase)" in plan
    assert "BatchEvalPython" not in plan


def test_heavy_hitters_candidate_pass_is_map_only(spark):
    """Pass 1 (MapInPandas) runs with NO exchange beneath it — the MG
    candidate generation never shuffles the fact; the recount joins
    the candidate set by broadcast."""
    df = plans.QUERIES["agg_heavy_hitters_mg"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    # candidate pass reads the scan directly — no exchange below it
    below_map = plan[plan.index("MapInPandas"):]
    first_scan = below_map.index("FileScan")
    assert "Exchange" not in below_map[:first_scan]
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan
    # only the candidate distinct + the recount groupBy shuffle (tiny
    # candidate set / counted candidates), never the fact
    assert plan.count("Exchange hashpartitioning") == 2


def test_bfs_rounds_join_frontier_not_visited(spark):
    """The returned BFS frame is a union of localCheckpointed
    per-round RDD scans — lineage truncated, no parquet rescan, no
    Python, and every per-round driver exchange is just the O(1)
    count."""
    df = plans.QUERIES["graph_bfs_distance"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    assert "FileScan" not in plan
    assert "BatchEvalPython" not in plan
    spark.catalog.clearCache()


def test_zipf_ranks_without_global_sort(spark):
    """Ranking windows over __pid range partitions (two-pass running
    count); the only SinglePartition exchange is the final 1-row
    regression aggregate."""
    df = plans.QUERIES["text_zipf_fit"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") <= 1
    assert "BatchEvalPython" not in plan


def test_ols_two_scans_all_partial_agg(spark):
    """Means pass + moments pass: the lineitem scan appears exactly
    twice, both aggregates have map-side partials, the means arrive
    by broadcast — no window, no Python, no data-sized join."""
    df = plans.QUERIES["ml_ols_normal_eq"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 2
    assert "partial_avg" in plan or "partial_sum" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row means
    assert "BatchEvalPython" not in plan


def test_capped_sessions_single_user_exchange(spark):
    """All three windows and the final aggregate run off ONE user_id
    hash exchange — refining the partition key to (user, gap_no)
    must not re-shuffle."""
    df = plans.QUERIES["events_sessionize_capped"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan


def test_dynamic_pivot_compiles_to_single_pass_agg(spark):
    """After value discovery, the pivot compiles to the two-stage
    aggregate (pre-agg on (key, pivot-col), then pivotfirst on the
    key) — both with map-side partials, and no join anywhere."""
    df = plans.QUERIES["pivot_dynamic_priority"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan
    assert "pivotfirst" in plan and "partial_pivotfirst" in plan


def test_anova_two_fact_passes_broadcast_means(spark):
    """The checkpointed 5-row mean map broadcasts back into the SSW
    pass — the returned plan scans the fact exactly once (SSW); gm
    and ssb run off the checkpoint RDD."""
    df = plans.QUERIES["stat_anova_oneway"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_cuped_single_fact_scan_three_aggregates(spark):
    """The per-user frame is checkpointed once; θ and the per-arm
    readout both consume the checkpoint, so the returned plan never
    re-reads the events parquet."""
    df = plans.QUERIES["stat_ab_cuped"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 0
    assert "Scan ExistingRDD" in plan
    assert "BatchEvalPython" not in plan


def test_phash_pairs_banded_join_no_cartesian(spark):
    """Candidate generation joins on (band, value) buckets — a hash
    join over the checkpointed hash frame; no cartesian/nested-loop
    pair enumeration anywhere, and the exact verify is JVM bitwise
    work (no Python beyond the decode stage)."""
    df = plans.QUERIES["mm_image_phash_dedup"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" not in plan  # hashes pre-checkpointed; pairs pure JVM
    assert "BatchEvalPython" not in plan


def test_logistic_newton_broadcasts_betas_each_step(spark):
    """Each Newton step consumes the previous betas as a 1-row
    broadcast (BroadcastNestedLoopJoin); nothing Python-side anywhere
    and no sort-merge join of the fact table against a scalar."""
    df = plans.QUERIES["ml_logistic_newton"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_bootstrap_poisson_no_shuffle_before_replicate_agg(spark):
    """The replicate weights are generated inline (explode of a
    sequence literal) — the only exchange in the plan is the 64-key
    hash aggregation, and the LCG draw stays whole-stage codegen."""
    df = plans.QUERIES["stat_bootstrap_poisson"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # partial→final of the 64-key agg
    assert "Generate explode" in plan


def test_jaccard_neighbors_topk_no_global_sort(spark):
    """The top-50 cut is TakeOrderedAndProject (per-partition top-k +
    driver merge), never a single-partition global Sort."""
    df = plans.QUERIES["graph_jaccard_neighbors"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_named_window_single_window_operator(spark):
    """Ranking, lag, and the running frame share one named-window
    sort: exactly one Window operator, one user_id exchange."""
    df = plans.QUERIES["sql_named_window"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1
    assert "BatchEvalPython" not in plan


def test_int8_topk_scoring_stays_jvm(spark):
    """Quantization, the integer dot product, and the ranking are all
    JVM higher-order functions — no Python evaluation tier at all."""
    df = plans.QUERIES["sim_topk_int8"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_decision_stump_single_fact_exchange(spark):
    """The fact table is collapsed to the value histogram by one
    hash aggregation; the split-pricing windows run over the bounded
    histogram only (single-partition exchange AFTER the aggregate,
    never of raw rows)."""
    df = plans.QUERIES["ml_decision_stump"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # partial+final of the histogram agg, then the 1-partition window
    assert plan.count("Exchange hashpartitioning") <= 2


def test_bucketed_join_has_no_exchange(spark):
    """Both sides are bucketed 8 ways by the join key, so the
    SortMergeJoin's distribution requirement is satisfied by the
    storage layout: ZERO Exchange operators anywhere before the final
    aggregation's own shuffle."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = plans.QUERIES["layout_bucketed_join_roundtrip"](spark, SF)
        # inspect the JOIN subplan (pre-aggregation): re-derive it
        import hashlib

        tag = (
            hashlib.md5(SF.encode()).hexdigest()[:8]
            + "_"
            + hashlib.md5(
                spark.sparkContext.applicationId.encode()
            ).hexdigest()[:8]
        )
        c = spark.table(f"sg_bucket_{tag}.customer_b")
        o = spark.table(f"sg_bucket_{tag}.orders_b")
        j = c.join(o, c.c_custkey == o.o_custkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# round-4v..4z surface
# ---------------------------------------------------------------------------


def test_bloom_prefilter_broadcasts_position_sets(spark):
    """The three bloom position semi-joins and the exact confirm all
    broadcast (build side is bounded by m and by the filtered dim);
    the probe never shuffles, and nothing drops to Python."""
    df = plans.QUERIES["join_bloom_prefilter"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_cms_sketch_single_scan_partial_agg(spark):
    """Sketch build explodes one scan to d rows and partial-aggs;
    the read-back joins the 15-row probe frame against the broadcast
    sketch — no shuffled join anywhere."""
    df = plans.QUERIES["sketch_cms_topk_err"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_hits_rounds_shuffle_only_on_group_keys(spark):
    """Two HITS rounds = aggregations over edges; the 1-row max
    normalizer must arrive via broadcast nested loop, never a sort."""
    df = plans.QUERIES["graph_hits_authorities"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("TakeOrderedAndProject") == 1  # top-15, no global sort


def test_trend_per_key_no_window_no_python(spark):
    """Grouped closed-form OLS is two groupBys and a projection —
    no window operator, no Python, partial aggregation on."""
    df = plans.QUERIES["ts_trend_per_key"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan
    assert "partial_" in plan
    assert plan.count("TakeOrderedAndProject") == 1


def test_ridge_cv_two_data_passes(spark):
    """Total-minus-fold CV: the fact join feeds per-fold stats once
    and held-out scoring once — exactly two joins of orders×lineitem,
    model arrives broadcast."""
    df = plans.QUERIES["ml_ridge_kfold_cv"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the 5-row model frame joins back via broadcast
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_next_higher_single_exchange_then_pandas(spark):
    """Secondary-sort contract: ONE hash exchange on user_id, sort
    within partitions, one MapInPandas — and nothing else Python."""
    df = plans.QUERIES["ts_next_higher_value"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "ApplyInPandas" not in plan
    # exchanges: the repartition + the final orderBy's range exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_fastss_join_is_equi_on_keys(spark):
    """Deletion-neighborhood candidates come from a string equi-join
    (hashable), not a theta join; verification stays JVM-side."""
    df = plans.QUERIES["er_deletion_neighborhood_join"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_equidepth_boundaries_broadcast_once(spark):
    """Decile boundaries come from the histogram+rank-refine pass
    (never nine sort-aggregates): every join is broadcast, the only
    row-sort is the per-bin rank over the ≤9 refined bins, and the
    final binning predicate stays JVM-side."""
    df = plans.QUERIES["sketch_equidepth_hist"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
    # no full-column sort aggregate: percentile_disc must not appear
    assert "percentile_disc" not in plan


def test_huber_refits_broadcast_model_rows(spark):
    """Each IRLS refit recomputes weights against a broadcast 1-row
    model — no per-iteration shuffle of the data frame beyond the
    initial fact join aggregations."""
    df = plans.QUERIES["ml_huber_irls2"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# round-4aa..4ad surface
# ---------------------------------------------------------------------------


def test_twa_single_user_window_then_groupby(spark):
    """Time-weighted average: one user-partitioned window, one
    groupBy — no global window, no Python."""
    df = plans.QUERIES["ts_time_weighted_avg"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1
    assert "BatchEvalPython" not in plan


def test_rolling_slope_range_frame_partitioned_by_user(spark):
    """All five OLS moments come from ONE partitioned window operator
    (RANGE frame); no unpartitioned window anywhere."""
    df = plans.QUERIES["window_rolling_slope"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1
    assert "RangeFrame, -6, currentrow" in plan


def test_weighted_median_refine_joins_broadcast(spark):
    """Two-pass selection: the midpoint-bin descriptor reaches pass 2
    via broadcast; no sort-merge join, no Python."""
    df = plans.QUERIES["agg_weighted_median_2pass"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_dau_wau_mau_no_window_operator(spark):
    """Trailing distincts come from explode + distinct + groupBy —
    pinning the absence of any window operator (a rolling-distinct
    window would be the non-scalable formulation)."""
    df = plans.QUERIES["events_dau_wau_mau"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Generate explode" in plan
    assert "BatchEvalPython" not in plan


def test_skew_profile_gini_on_count_of_counts(spark):
    """The Gini windows run over the count-of-counts frame: the only
    exchanges hash on o_custkey (key counts) and c (count values) —
    both aggregations partial-agg'd."""
    df = plans.QUERIES["diag_key_skew_profile"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan


def test_retention_fit_regression_over_aggregate_points(spark):
    """The OLS runs over ≤7 pooled points; the only fact-sized work
    is two groupBys (first-seen, activity offsets) — no window at
    all."""
    df = plans.QUERIES["events_retention_decay_fit"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_period_over_period_lags_over_month_frame(spark):
    """MoM/YoY lags run over the month aggregate, after a
    partial-agg'd rollup of the fact table."""
    df = plans.QUERIES["window_period_over_period"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1
    assert "partial_" in plan


# ---------------------------------------------------------------------------
# round-4ae..4aj surface
# ---------------------------------------------------------------------------


def test_negative_samples_int_equi_join(spark):
    """Negatives resolve through hash equi-joins on the surrogate
    index — no nested loop over the corpus, no Python."""
    df = plans.QUERIES["corpus_negative_samples"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_markov_eval_model_joins_broadcast(spark):
    """The |types|²-row model reaches the eval stream via broadcast;
    bigram extraction is the only window (user-partitioned)."""
    df = plans.QUERIES["ml_markov_next_event_eval"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_bpe_apply_encode_is_hash_join_on_word(spark):
    """Encoding joins occurrences to the encoded vocabulary — a word
    hash join, never a per-occurrence merge loop; no Python."""
    df = plans.QUERIES["corpus_bpe_apply"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_geo_grid_join_no_cross_join(spark):
    """The radius join must plan as an equi-join on the cell key —
    the whole point vs the oracle's CROSS JOIN."""
    df = plans.QUERIES["geo_grid_radius_join"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_mips_reuses_lsh_candidate_distinct(spark):
    """MIPS rides the shared LSH path: bucketed candidates are
    distinct'ed before exact scoring (HashAggregate over the
    candidate keys), and the only Python is the Arrow bucket UDF."""
    df = plans.QUERIES["sim_topk_mips"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # Arrow tier only
    assert "ArrowEvalPython" in plan


# ---------------------------------------------------------------------------
# round-4ak..4am surface
# ---------------------------------------------------------------------------


def test_parameterized_query_pushes_bound_filter(spark):
    """Named binds resolve to literals at analysis time, so the
    price/status predicates still push down to the parquet scan."""
    df = plans.QUERIES["sql_parameterized_query"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThan(o_totalprice" in plan
    assert "BatchEvalPython" not in plan


def test_values_inline_dim_broadcasts_local_relation(spark):
    """The 3-row VALUES dimension is a LocalRelation — Catalyst must
    broadcast it, never shuffle the fact side for the join."""
    df = plans.QUERIES["sql_values_inline_dim"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lambda_pack_is_pure_catalyst_map(spark):
    """filter/exists/forall/zip_with are Catalyst expressions: no
    Python eval, no join, no aggregate exchange — one scan, one
    projection, the final presentation sort."""
    df = plans.QUERIES["func_lambda_pack"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Join" not in plan


def test_collation_group_single_exchange(spark):
    """Collated grouping is still a partial→final hash aggregate with
    ONE shuffle — collation changes the comparison, not the plan."""
    df = plans.QUERIES["func_collation_group"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_" in plan
    assert "BatchEvalPython" not in plan


def test_collapse_adjacent_one_window_no_join(spark):
    """Compaction is one user-partitioned window + filter: a single
    hash exchange on user_id, no self-join."""
    df = plans.QUERIES["events_collapse_adjacent"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_identifier_clause_resolves_to_scan_agg(spark):
    """IDENTIFIER(:tbl) resolves at analysis time — the plan is the
    same scan + two-phase aggregate a literal table name produces."""
    df = plans.QUERIES["sql_identifier_clause"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "partial_" in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# round-4an surface
# ---------------------------------------------------------------------------


def test_effect_sizes_single_fact_aggregation(spark):
    """The orders scan partial-aggregates once; marginals/total are
    broadcast-size derivations of the cell table."""
    df = plans.QUERIES["stat_effect_sizes"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_running_argmax_one_window_no_join(spark):
    df = plans.QUERIES["window_running_argmax"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_rake_topk_no_global_sort_no_python(spark):
    """Top-15 must plan as TakeOrderedAndProject; word scores reach
    phrase words via broadcast."""
    df = plans.QUERIES["text_keyword_rake"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# round-4ao surface
# ---------------------------------------------------------------------------


def test_pipe_syntax_plans_like_classic_query(spark):
    """Pipe syntax is parser sugar: pushdown reaches the scan and the
    customer side broadcasts exactly as in the classic form."""
    df = plans.QUERIES["sql_pipe_segment_revenue"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(o_orderdate)" in plan
    assert "BatchEvalPython" not in plan


def test_kmv_partial_topk_bounds_final_window(spark):
    """The bottom-k must run as salted partial rank → final rank: two
    Window stages per sketch, no global sort of the distinct hashes,
    all aggregates two-phase."""
    df = plans.QUERIES["sketch_kmv_distinct"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the estimator is pure expression work: no Python, no UDF
    assert "ArrowEvalPython" not in plan


def test_incremental_state_merges_without_python(spark):
    """Base/delta partials and the merge are all hash aggregates on
    o_custkey; decimal sums stay JVM-side."""
    df = plans.QUERIES["etl_incremental_agg_state"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "partial_" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_pq_adc_scan_is_codegen_over_codes(spark):
    """PQ: the only Python is the Arrow code/table UDFs; the ADC
    scoring join broadcasts the tiny query side and the score itself
    is element_at arithmetic (no Python in the scoring stage)."""
    df = plans.QUERIES["sim_topk_pq"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# round-4ap surface
# ---------------------------------------------------------------------------


def test_session_variables_fold_to_pushed_filters(spark):
    """Variable references fold to literals at analysis time, so the
    price predicate reaches the parquet scan."""
    df = plans.QUERIES["sql_session_variables"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThan(o_totalprice,150000.0)" in plan
    assert "BatchEvalPython" not in plan


def test_temperature_mixture_single_fact_aggregation(spark):
    """One partial-agg'd groupBy over documents; the policy math runs
    on the broadcast 1-row totals frame."""
    df = plans.QUERIES["corpus_mixture_temperature"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# round-4aq surface
# ---------------------------------------------------------------------------


def test_pandas_api_report_lowers_to_broadcast_join(spark):
    """The pandas merge/groupby surface must lower to the same
    physical plan as the hand-written query: broadcast join on the
    customer side, two-phase aggregate, no Python eval."""
    df = plans.QUERIES["pandas_api_orders_report"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "partial_" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_approx_top_k_single_sketch_aggregate(spark):
    """One partial-aggregable sketch: no shuffle of raw values, no
    Python, a single two-phase aggregate."""
    df = plans.QUERIES["agg_approx_top_k"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_approx_top_k" in plan or "partial_" in plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# round-4ar surface
# ---------------------------------------------------------------------------


def test_cdc_chunker_uses_arrow_tier_only(spark):
    """The chunker must run in the Arrow-vectorized tier (the
    interpreted HOF form measured ~100x slower) and never the
    row-at-a-time Python path."""
    df = plans.QUERIES["text_cdc_chunks"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_chunk_overlap_hot_hash_prefilter(spark):
    """Posting lists are df-capped BEFORE the pair self-join, and the
    join is an equi-join on the chunk hash."""
    df = plans.QUERIES["dedup_chunk_overlap"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_sized_shards_no_global_window(spark):
    """The prefix sum must be the two-pass range-partition form: any
    Window in the plan is partitioned (no single-task global sort)."""
    df = plans.QUERIES["layout_sized_shards"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    for m in re.finditer(r"Window \[", plan):
        frag = plan[m.start():m.start() + 400]
        assert "__pid" in frag or "partitionBy" in frag or ", [__pid" in frag, frag
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# round-4as surface
# ---------------------------------------------------------------------------


def test_fs_linkage_blocks_never_cross_joins(spark):
    """Candidate generation must be the nation-block equi-join; the
    score is literal arithmetic (no Python, no ln() at query time)."""
    df = plans.QUERIES["er_fellegi_sunter"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "LOG" not in plan.upper().replace("LOGICAL", "")


def test_arrow_dim_broadcasts_against_fact(spark):
    """The re-imported Arrow dimension must broadcast; the customer
    side never shuffles for the join."""
    df = plans.QUERIES["source_arrow_interchange"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# round-4av surface
# ---------------------------------------------------------------------------


def test_kmv_intersection_no_python_no_cartesian(spark):
    """Union sketch + membership joins stay JVM-side equi-joins; the
    only crossJoins are 1-row scalar frames."""
    df = plans.QUERIES["sketch_kmv_intersection"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_vault_aggregates_over_tokens_only(spark):
    """The aggregate runs on the tokenized frame: c_name must appear
    only after the final vault join, never in the aggregate keys."""
    df = plans.QUERIES["privacy_tokenization_vault"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    aggs = [m.start() for m in re.finditer(r"HashAggregate", plan)]
    # the aggregate groups on tok, not on the name column
    for pos in aggs:
        frag = plan[pos:pos + 200]
        assert "keys=[tok" in frag or "keys=[]" in frag or "c_name" not in frag
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# round-4aw surface
# ---------------------------------------------------------------------------


def test_cogroup_asof_single_shuffle_per_side(spark):
    """The cogroup must plan as FlatMapCoGroupsInPandas with one hash
    exchange per side on user_id — no extra sort-merge join."""
    df = plans.QUERIES["join_asof_cogroup"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_isotonic_bins_aggregate_before_driver(spark):
    """The only driver-bound data is the <=50-bin aggregate; scoring
    and the calibrated join stay distributed."""
    df = plans.QUERIES["ml_isotonic_calibration"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_bitemporal_pushes_valid_time_into_scan(spark):
    """join_bitemporal_asof: the valid-time bound must reach the
    parquet scan as a data filter (at 100 TB this is the difference
    between reading the ledger tail and the whole ledger); the txn cap
    arrives via a 1-row broadcast; no Python in the plan."""
    df = plans.QUERIES["join_bitemporal_asof"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "2024-01-15" in plan  # pushed into DataFilters
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row cap crossJoin
    assert "BatchEvalPython" not in plan


def test_sorted_neighborhood_scales_without_segment_sort(spark):
    """er_sorted_neighborhood: the rank must NOT come from a window
    partitioned only by segment (n/|segments| rows in one sort task at
    100 TB) — it comes from the two-pass range-partitioned surrogate
    key (materialized: Scan ExistingRDD), and pair adjacency is a hash
    equi-join on the dense unique sk. Every Window node in the plan is
    partitioned by __pid (the parallel per-partition numbering), never
    unpartitioned or segment-partitioned."""
    df = plans.QUERIES["er_sorted_neighborhood"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan  # materialized ranged frame
    assert "HashJoin" in plan or "SortMergeJoin" in plan  # sk equi-join
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan, bad
    for line in plan.splitlines():
        if line.strip().startswith("Window") or " Window " in line:
            assert "__pid" in line, f"non-pid window: {line.strip()[:120]}"
    assert "BatchEvalPython" not in plan


def test_silhouette_centroid_join_broadcasts(spark):
    """ml_silhouette_labeled: the k·d centroid frame must broadcast
    into the distance join (the corpus side never reshuffles on dim),
    and the whole plan stays JVM-side."""
    df = plans.QUERIES["ml_silhouette_labeled"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_ewma_time_decay_two_shuffles_of_partials(spark):
    """ts_ewma_time_decay: the groupBy-(user,day) exchange and the
    window-(user) exchange — both carry DAILY-GRAIN partials, never
    raw events (map-side partial agg first; collapsing to one shuffle
    would require shuffling raw rows by user, strictly worse at
    scale). The round-6 horizon guard adds a 1-ROW global max(day)
    aggregate + its broadcast back into the plan (ADVICE r5 fail-loud
    bound): two more Exchange nodes whose traffic is one row."""
    df = plans.QUERIES["ts_ewma_time_decay"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 6
    assert "BroadcastExchange" in plan  # the 1-row guard, not a reshuffle
    assert "partial_sum" in plan or "HashAggregate" in plan
    assert "BatchEvalPython" not in plan
