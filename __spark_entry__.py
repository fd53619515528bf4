"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``whisky_wine_etl_spark`` package; this
module only adapts the package's query registry to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from whisky_wine_etl_spark import plans  # noqa: E402
from whisky_wine_etl_spark.session import tune_session  # noqa: E402

plans.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return plans.QUERIES["flagship_q5_revenue_by_nation"](spark, "/root/testdata/sf0.001")


def _verified_names() -> set[str]:
    """Query names that already have a green row in any committed
    CORRECTNESS_r*.json (hash-match, or ran under the rows-only
    carve-out). Used only to ORDER the registry: the round-1 driver
    stopped after the first 50 registered queries, so queries still
    missing a verification row must be yielded first."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    green: set[str] = set()
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True or row.get("err") == "no_oracle":
                green.add(name)
    return green


# Verified queries whose Spark code or oracle changed AFTER their last
# green CORRECTNESS row — hand-maintained at each change; validated by
# tests/test_entry_ordering.py. Remove names once a NEW green row lands.
_RECHECK_FIRST: frozenset[str] = frozenset({
    # pinned-rounding (on-half) migrations
    "text_token_stats",
    "text_quality_score",
    "text_readability_flesch",
    "text_cdc_chunks",
    "ts_time_weighted_avg",
    # ts_holt_linear is NOT here: it is still in the r8 slate, which
    # verifies its migrated code this round (recheck is only for names
    # whose green row predates a change)
    "q15_top_supplier",
    # DECIMAL-arithmetic elimination (the diag-red class): every
    # integer-context `x * 1.0 /` and `COUNT(*) + 1.0` bridge
    # rewritten to CAST(x AS DOUBLE) on the oracle side
    "assoc_rules_lift",
    "corpus_bpe_apply",
    "corpus_mixture_temperature",
    "corpus_source_drift",
    "dedup_canonical_summary",
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_containment",
    "dedup_containment_capped",
    "dedup_incremental_neardup",
    "dedup_ngram_capped",
    "dedup_ngram_jaccard",
    "diag_observe_ingest",
    "events_dau_wau_mau",
    "events_markov_transitions",
    "events_retention_decay_fit",
    "graph_pagerank_copurchase",
    "ml_markov_next_event_eval",
    "ml_naive_bayes_lang",
    "sim_sparse_cosine_join",
    "stat_benford_digits",
    "stat_gini_revenue",
    "stat_psi_value_drift",
    "text_keyword_rake",
    "text_repetition_signals",
    "text_tfidf_top_terms",
    # r9: residual integer-context DECIMAL-literal purge (VERDICT r8
    # "what's wrong" item 1) — the four confirmed class-A forms plus
    # the five borderline CASE-literal forms, all migrated to
    # CAST(x AS DOUBLE) / integer counting
    "stat_chi2_independence",
    "stat_effect_sizes",
    "stat_jackknife_ratio",
    "corpus_perplexity_score",
    "ml_logistic_newton",
    "ml_calibration_bins",
    "stat_kendall_tau_daily",
    "stat_mann_kendall",
    "events_multitouch_attribution",
    # r9: second purge wave — the new AST-typed gate
    # (tools/oracle_typing, tests/test_oracle_discipline) found 12
    # more live class-A forms the regex audit's by-hand adjudication
    # had passed; all migrated the same way. NOTE: the recheck tier
    # now exceeds the round's spare slots by a few names — the
    # overflow simply stays in this tier and drains next round.
    "corpus_line_dedup",
    "events_funnel_latency",
    "events_pareto_share",
    "geo_grid_radius_join",
    "geo_haversine_nearest",
    "graph_pagerank_copurchase",
    "ml_roc_auc",
    "stat_mann_whitney_u",
    "stat_multiple_testing_bh",
    "stat_spearman_corr",
    "text_bm25_search",
    "text_repetition_signals",
    # r9: git-derived changed-since-green audit
    # (tests/test_recheck_derivation.py, ADVICE r8 item 3) — these 13
    # changed semantically AFTER their latest green row in earlier
    # rounds and were never hand-tiered (e.g. q1's rounding scale
    # 4/6->2, equidepth's r8 quantile_disc->rank migration). All are
    # locally parity-green; the driver re-verify is the contract.
    "dedup_incremental",
    "events_attribution_models",
    "flagship_q5_revenue_by_nation",
    "graph_triangle_count",
    "q11_important_stock",
    "q1_pricing_summary",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    "sim_topk_bruteforce",
    "sim_topk_pandas_udf",
    "sketch_equidepth_hist",
    "stat_rfm_segments",
    "stream_left_outer_attribution",
    # r9: graduated from the rows-only carve-out to an EXACT minimax
    # oracle (+ pinned rounding on both sides) — its r8 green row was
    # the weaker rows-only check, so the driver must re-verify under
    # the hash gate
    "ml_isotonic_calibration",
})

# Within the recheck tier, these names sort FIRST (in this order).
# The tier exceeds one round's 50-slot budget, and plain registration
# order would push the HIGHEST-risk rechecks into the spill by
# accident: these four are the ones whose check class or computation
# changed in kind (a brand-new exact oracle; a quantile_disc->rank
# semantic rewrite; two on-half floor-pins whose data provably sits
# where engine rounding rules split). The remaining spill is pure
# CAST-AS-DOUBLE migrations whose values are bit-identical today by
# construction — the lowest-risk class in the tier.
_RECHECK_PRIORITY: tuple[str, ...] = (
    "ml_isotonic_calibration",
    "sketch_equidepth_hist",
    "ts_time_weighted_avg",
    "text_cdc_chunks",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so a budget-capped driver verifies the highest-value
    queries first: reference Part-A (wine_*) before everything else,
    queries with no green CORRECTNESS row yet before ones already
    verified in an earlier round, and — within the already-verified
    tail — queries whose code changed SINCE their green row before
    untouched ones (_RECHECK_FIRST), so the driver's spare
    slots re-verify exactly what moved. Ties keep registration
    order."""
    green = _verified_names()
    names = list(plans.QUERIES)
    recheck = _RECHECK_FIRST
    prio = {n: i for i, n in enumerate(_RECHECK_PRIORITY)}
    # Stable sort: ties keep registration order without an index key.
    # The recheck tier applies ONLY inside the verified block — an
    # unverified name is already in the slate's front block, and
    # letting recheck membership reorder it there would perturb the
    # crafted registration order (ts_holt_linear is such a name: in
    # the r8 slate AND code-changed). Within the tier, the explicit
    # _RECHECK_PRIORITY names lead; everything else keeps
    # registration order.
    names.sort(
        key=lambda n: (
            n in green,
            n in green and n not in recheck,
            prio.get(n, len(prio)) if (n in green and n in recheck) else 0,
            not n.startswith("wine_"),
        )
    )
    return {n: plans.QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; names not present
    here get the driver's weaker rows-only check."""
    return dict(plans.ORACLES)
