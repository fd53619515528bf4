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


def _green_rounds() -> dict[str, int]:
    """name -> LATEST round with a green row in any committed
    CORRECTNESS_r*.json (hash-match, or ran under the rows-only
    carve-out). Used only to ORDER the registry: the driver verifies
    the first 50 registered queries, so names still missing a
    verification row must be yielded first, and — within the verified
    non-recheck tail — the OLDEST green rows lead so spare slate slots
    continuously refresh the registry's stalest evidence (every green
    row stays a bounded number of rounds old instead of r1-era rows
    never being re-verified)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        r = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True or row.get("err") == "no_oracle":
                if r > rounds.get(name, -1):
                    rounds[name] = r
    return rounds


def _verified_names() -> set[str]:
    """Query names with any green CORRECTNESS row (see _green_rounds)."""
    return set(_green_rounds())


# Verified queries whose Spark code or oracle changed AFTER their last
# green CORRECTNESS row — hand-maintained at each change; validated by
# tests/test_entry_ordering.py and derived independently from git by
# tests/test_recheck_derivation.py. Remove names once a NEW green row
# lands (the derivation test flags stale entries at the next round's
# open, once the driver's CORRECTNESS file is committed).
_RECHECK_FIRST: frozenset[str] = frozenset({
    # (The r12 pins all re-greened in CORRECTNESS_r12 and were pruned
    # at r13 open, per the tier's drain rule.)
    #
    # r13 (ADVICE r12 item 1): dedup_clusters_star is the SEVENTH
    # jaccard_pairs caller (plans/round3.py:567) — green since
    # CORRECTNESS_r09, i.e. BEFORE the r12 operators/dedup.py
    # localCheckpoint change, and invisible to the plans-module
    # fingerprint just like its six siblings were. Pin it so its stale
    # green row re-verifies; prune once a new row lands.
    "dedup_clusters_star",
    # r13 (ADVICE r12 item 2): the fused Lloyd's-update kernel
    # (operators/clustering.py:_kmeans_update_cells_quantized) gained
    # the element-null legacy mask AFTER these names' r12 green rows.
    # Results are identical on the shipped data (no vector carries
    # null elements — pinned by tests/test_kmeans_update_fused.py and
    # the r13 parity sweep), but the change lives in the OPERATOR
    # module the plans fingerprint cannot see, so the dependents are
    # force-pinned below; prune once CORRECTNESS_r13 re-greens them.
    "sim_kmeans_lloyd",
    "sim_kmeans_pll_refined",
    "sim_topk_ivf",
    "dedup_semantic",
    "stream_kmeans_assign",
    # r13 job-folding + materialization-policy edits (eager=False
    # localCheckpoints / materialize() tier, results identical —
    # 404/404 r13 parity sweep): plan-module edits the gate sees
    # directly…
    "corpus_bpe_train_rounds",
    "corpus_duplicate_spans",
    "dedup_chunk_overlap",
    "events_dau_wau_mau",
    "graph_bfs_distance",
    "graph_hits_authorities",
    "graph_jaccard_brand",
    "graph_jaccard_skew_capped",
    "graph_kcore",
    "graph_pagerank_copurchase",
    "graph_sssp_weighted",
    "rec_item_item_cosine",
    "sim_dbscan_embedding",
    "sim_kcenter_greedy",
    "sim_mmr_rerank",
    "sketch_kmv_distinct",
    "source_format_fidelity_matrix",
    # …the donor-mapped LSH trio the gate flags via operators/dedup.py…
    "dedup_minhash_lsh",
    "dedup_clusters_lsh",
    "dedup_canonical_summary_lsh",
    # …and the operator-invisible jaccard/containment/CC callers of
    # the same operators/dedup.py edits, force-pinned below.
    "dedup_ngram_jaccard",
    "dedup_ngram_capped",
    "dedup_clusters",
    "dedup_canonical_summary",
    "dedup_containment",
    "dedup_containment_capped",
})

# Tier members whose change the git-derived gate CANNOT see (their
# effective oracle text depends on another module's helper — the
# documented cross-module fingerprint limitation), hand-pinned with
# the reason in the _RECHECK_FIRST comment. tests/
# test_recheck_derivation.py excludes these from its stale-entry
# assertion (it would otherwise demand deletion of exactly the names
# its own blind spot requires adding by hand); tests/
# test_entry_ordering.py still checks they are live, verified,
# oracled tier members. Remove together with the tier entry once the
# driver re-greens them.
_RECHECK_FORCE: frozenset[str] = frozenset({
    # r13: the quantized-kmeans update kernel changed again in
    # operators/clustering.py (element-null legacy mask, ADVICE r12
    # item 2; results identical) — a change the plans-module
    # fingerprint cannot see, so the dependents are force-pinned
    # (same pattern as the r12 fused-pass pins). stream_kmeans_assign
    # is included: its donor map covers round4c.py (the shared oracle
    # text), not the operator module its fit loop executes.
    "sim_kmeans_lloyd",
    "sim_kmeans_pll_refined",
    "sim_topk_ivf",
    "dedup_semantic",
    "stream_kmeans_assign",
    # r13: the seventh jaccard_pairs caller (see _RECHECK_FIRST note).
    "dedup_clusters_star",
    # r13: jaccard_pairs/containment_pairs/connected_components gained
    # the materialize() policy + eager=False folding in
    # operators/dedup.py — invisible to the plans fingerprint for
    # these six callers (the LSH trio is donor-mapped instead):
    "dedup_ngram_jaccard",
    "dedup_ngram_capped",
    "dedup_clusters",
    "dedup_canonical_summary",
    "dedup_containment",
    "dedup_containment_capped",
})

# Mechanical cross-module oracle pins (ADVICE r11 item 2). The
# git-derived recheck gate fingerprints a query's registration site in
# its DEFINING plans module; an oracle whose TEXT is built from another
# module's helpers/constants changes with no textual change at the
# registration site. Previously that blind spot was covered by comments
# asking a future editor to hand-pin the dependent name (er_golden_record
# slipped through exactly that way in r10). This map makes it
# mechanical: tests/test_recheck_derivation.py folds each donor
# module's docstring-stripped AST dump into the dependent name's
# fingerprint, so ANY semantic change to the donor flags the dependent
# into _RECHECK_FIRST automatically — no reviewer memory involved.
# Keys must be registered query names; values are repo-relative donor
# module paths OUTSIDE the name's own defining module (hygiene-tested).
_CROSS_MODULE_ORACLE_DEPS: dict[str, tuple[str, ...]] = {
    # shares round4c's _KMEANS_QUANT_ORACLE verbatim (SURVEY §25.8)
    "stream_kmeans_assign": ("whisky_wine_etl_spark/plans/round4c.py",),
    # interpolates round4as._fs_score_sql/_FS_B_SQL/_FS_THRESHOLD
    "er_golden_record": ("whisky_wine_etl_spark/plans/round4as.py",),
    # _minhash_oracle bakes dd.MERSENNE31/PRIME31B/HORNER_B1/B2 and
    # dd._hash_family(seed) into literal VALUES rows (plans/dedup.py)
    "dedup_minhash_lsh": ("whisky_wine_etl_spark/operators/dedup.py",),
    "dedup_clusters_lsh": ("whisky_wine_etl_spark/operators/dedup.py",),
    "dedup_canonical_summary_lsh": (
        "whisky_wine_etl_spark/operators/dedup.py",
    ),
}

# Within the recheck tier, these names sort FIRST (in this order).
# Empty when the tier fits one round's slate and no member's check
# class changed in kind; all four r9 priority names (isotonic's new
# exact oracle, equidepth's rank rewrite, the two on-half pins)
# re-greened in CORRECTNESS_r09 and were pruned with the tier.
_RECHECK_PRIORITY: tuple[str, ...] = ()


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
    rounds = _green_rounds()
    green = set(rounds)
    names = list(plans.QUERIES)
    recheck = _RECHECK_FIRST
    prio = {n: i for i, n in enumerate(_RECHECK_PRIORITY)}
    # Stable sort: ties keep registration order without an index key.
    # The recheck tier applies ONLY inside the verified block — an
    # unverified name is already in the slate's front block, and
    # letting recheck membership reorder it there would perturb the
    # crafted registration order (ts_holt_linear was such a name: in
    # the r8 slate AND code-changed). Within the tier, the explicit
    # _RECHECK_PRIORITY names lead; the verified NON-recheck tail
    # sorts oldest-green-round first (age refresh: spare slate slots
    # re-verify the registry's stalest rows); remaining ties keep
    # registration order.
    names.sort(
        key=lambda n: (
            n in green,
            n in green and n not in recheck,
            prio.get(n, len(prio)) if (n in green and n in recheck) else 0,
            rounds.get(n, 0) if (n in green and n not in recheck) else 0,
            not n.startswith("wine_"),
        )
    )
    return {n: plans.QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; names not present
    here get the driver's weaker rows-only check."""
    return dict(plans.ORACLES)
