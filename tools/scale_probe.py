"""Scale-linearity probe: time representative operators at 1x vs Kx.

Round 5's 10x probe was an ad-hoc session measurement (SURVEY §14);
this makes it a committed, rerunnable tool. It materializes a Kx
blow-up of the fact-side tables as K DISJOINT key-shifted copies —
orders, parts and docs from copy i get keys offset by i*max_key — so
graph node/edge counts, dedup candidate sets and per-key groups all
grow ~Kx (a plain row-duplication blowup would leave DISTINCT edge
sets and dedup candidates unchanged and flatter every curve). The
dimension tables are symlinked unscaled, so any registered query runs
against the probe dir unmodified.

For each probed query it reports t_Kx / t_1x (median of R warm runs).
An operator whose plan is scale-honest lands well under K (partial
aggregation, bounded state, broadcast dims); a super-K ratio is a
cliff worth a VERDICT line.

Usage: python tools/scale_probe.py [sf_dir] [K]
Writes tools/logs/scale_probe_<sf>_x<K>.log via tee by the caller.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisky_wine_etl_spark import plans  # noqa: E402
from whisky_wine_etl_spark.session import get_spark  # noqa: E402

# (query, why this one) — one per major cost shape
PROBES = [
    ("q1_pricing_summary", "wide scan + groupBy agg (map-side combine)"),
    ("topk_per_group", "keyed window top-k"),
    ("dedup_exact", "hash-groupBy dedup over documents"),
    ("text_cdc_chunks", "Arrow mapInPandas chunker"),
    ("join_inner_equi", "fact-fact shuffle join"),
    ("graph_jaccard_brand", "brand-bounded pair join (round 6)"),
    ("graph_jaccard_skew_capped", "capped hub-graph pair join (round 6)"),
    ("agg_weighted_median_2pass", "distributed selection"),
    ("corpus_duplicate_spans", "shingle index + semi-join spans (round 7: unhinted)"),
    ("sample_stratified_quota", "two-phase stratified top-k under a global budget (round 7)"),
    ("source_format_fidelity_matrix", "3-format full-table write + read-back fidelity join (round 8)"),
    ("join_salted_skew", "salt-and-replicate skew join, 57% of rows on one key (r9 staged)"),
    ("stream_full_outer_attribution", "stream-stream full outer, two-sided state eviction (r9 staged)"),
    ("dedup_minhash_lsh", "md5+Horner engine-portable MinHash bands + verify (r10 graduation)"),
    ("dedup_simhash", "md5 token hash, weighted-bit fingerprint, chunk banding (r10 graduation)"),
    ("sim_kmeans_lloyd", "distributed quantized Lloyd's fit + assign over embeddings (r10 graduation)"),
    # r10 cliff-hunt extension: shapes with plausible bucket/block
    # saturation or pair-growth risks, probed after the SimHash x116
    # catch proved the probe finds real ones
    ("er_fellegi_sunter", "blocked record linkage — blocking-key saturation risk"),
    ("er_deletion_neighborhood_join", "FastSS deletion-variant equi-join"),
    ("er_sorted_neighborhood", "rank-window blocking"),
    ("dedup_chunk_overlap", "chunk-hash posting-list dedup"),
    ("dedup_url_canonical", "URL canonicalize + hash dedup"),
    ("rec_item_item_cosine", "basket item-item CF — per-basket pair growth"),
    ("assoc_rules_lift", "basket rules on one fact shuffle"),
    ("corpus_decontaminate", "train/eval n-gram overlap removal"),
    ("text_inverted_index", "posting-list build (term-partitioned)"),
    ("events_pattern_match", "ordered-seq funnel pattern count"),
    ("privacy_tokenization_vault", "tokenize -> agg -> reidentify round-trip"),
    ("corpus_pack_sequences", "two-pass distributed sequence packing"),
    # r11 additions: the second streaming heavy (left-outer twin of the
    # probed full-outer) and the new exact-distinct anchor (two-phase
    # dedup shuffle must stay ∝ unique triples)
    ("stream_left_outer_attribution", "stream-stream left outer, watermark state eviction (r11)"),
    ("agg_hll_exact_anchor", "two-phase exact distinct at (day,type,user) grain (r11)"),
    ("sim_kmeans_parallel_init", "k-means|| seeding — per-round map-only assignment (r11)"),
    ("stream_kmeans_assign", "fit-batch/serve-stream scoring over micro-batches (r11)"),
    ("sim_kmeans_pll_refined", "k-means|| seeds + Lloyd's refinement end-to-end (r11)"),
    # r11: the #3 bench heavy, eps-grid candidate join — per-cell pair
    # growth under 20x embedding density is the classic saturation risk
    ("sim_dbscan_embedding", "DBSCAN eps-grid candidate join + star CC (r11)"),
    # r11: the last unprobed bench heavies — HITS (the one iterative
    # graph query the r10 ad-hoc batch skipped), Cox PH (risk-set
    # prefix sums), k-center (k broadcast argmax rounds), cogroup
    # as-of (applyInPandas per-key merge, skew-sensitive)
    ("graph_hits_authorities", "HITS hub/authority power iteration (r11)"),
    ("ml_cox_ph", "Cox proportional hazards via risk-set prefix sums (r11)"),
    ("sim_kcenter_greedy", "Gonzalez farthest-first k-center (r11)"),
    ("join_asof_cogroup", "cogroup applyInPandas as-of merge (r11)"),
    # r11: the iterative graph family joins the COMMITTED roster (r10
    # probed it ad-hoc only); sssp is the #1 bench heavy
    ("graph_sssp_weighted", "improved-frontier Bellman-Ford, per-round shuffle join (r11)"),
    ("graph_pagerank_copurchase", "damped PageRank, 3 fixed iterations (r11)"),
    # r11: the geo family's grid-cell saturation risk (fixed 4-degree
    # cells + growing point density — the same shape class as r10's
    # SimHash bucket catch; stations are an unscaled dim, so candidate
    # growth should track the scaled customer side linearly)
    ("geo_grid_radius_join", "grid-cell equi-join radius search (r11)"),
    ("geo_haversine_nearest", "broadcast nearest-station argmin (r11)"),
    # r12 (VERDICT r11 item 5): the streaming multibatch matrix — each
    # shape replays a 3-file landing sequence through a real
    # micro-batch stream; state (window/session store) must stay
    # bounded by watermark eviction while input grows Kx
    ("stream_tumbling_multibatch", "3-batch tumbling replay, watermark eviction (r12)"),
    ("stream_sliding_multibatch", "3-batch sliding windows, overlapping state (r12)"),
    ("stream_session_multibatch", "3-batch session windows, merge-on-gap state (r12)"),
    ("stream_rocksdb_tumbling", "RocksDB state-store tumbling twin (r12)"),
    ("stream_sink_exactly_once_chaos", "manifest sink under retry debris (r12)"),
    # r12 (VERDICT r11 item 5): the remaining corpus-shaping shapes —
    # scan-level hash filters, running prefix caps, explode upsample,
    # iterative BPE agg, and the end-to-end chain
    ("corpus_quality_gate", "scan-level quality gates, no shuffle (r12)"),
    ("corpus_mixture_sample", "per-source hash-threshold sampling (r12)"),
    ("corpus_token_budget", "running prefix-sum token cap (r12)"),
    ("corpus_global_shuffle", "deterministic keyed global shuffle (r12)"),
    ("corpus_repeat_upsample", "weight-driven explode upsample (r12)"),
    ("corpus_bpe_train_rounds", "3-round vocab-bounded BPE trainer (r12)"),
    ("corpus_bpe_apply", "merge-applied vocabulary encode join (r12)"),
    ("corpus_pipeline", "end-to-end corpus shaping chain (r12)"),
]

SCALED = {
    "lineitem",
    "orders",
    "part",
    "documents",
    "events",
    "embeddings",
    # customer copies carry shifted c_custkey but orders.o_custkey is
    # NOT re-pointed at them: the copies are order-less. That is fine
    # for what customer scaling exists to probe — the ER self-linkage
    # family (blocking saturation) — and deliberately leaves
    # customer⋈orders queries alone (originals already see 20x orders
    # via the o_orderkey-shifted copies).
    "customer",
}


def build_scaled_dir(spark, sf_dir: str, k: int) -> str:
    from pyspark.sql import functions as F

    from whisky_wine_etl_spark.catalog import TABLES, load_table

    dest = os.path.join(
        tempfile.gettempdir(), f"sg_scaleprobe_{os.path.basename(sf_dir)}_x{k}"
    )
    if os.path.isdir(dest) and os.path.exists(os.path.join(dest, "_PROBE_READY")):
        return dest
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    # Key-domain shifts are computed ONCE from the domain-owning table
    # so fact-fact joins keep their selectivity: copy i of lineitem
    # references copy i of orders and copy i of part.
    ord_shift = (
        load_table(spark, sf_dir, "orders").agg(F.max("o_orderkey")).collect()[0][0]
        + 1
    )
    part_shift = (
        load_table(spark, sf_dir, "part").agg(F.max("p_partkey")).collect()[0][0] + 1
    )
    keys = {
        "lineitem": [("l_orderkey", ord_shift), ("l_partkey", part_shift)],
        "orders": [("o_orderkey", ord_shift)],
        "part": [("p_partkey", part_shift)],
        "documents": [("doc_id", None)],
        "events": [("event_id", None), ("user_id", None)],
        # embeddings copies carry identical vectors under shifted ids:
        # the k-means family sees 20x points from the same
        # distribution (assignment/update must stay linear); ANN
        # probes see 20x corpus per list. (dedup_semantic is NOT
        # probed: its per-list quadratic at fixed n_lists is the
        # documented trade — raise n_lists with corpus growth.)
        "embeddings": [("vec_id", None)],
        "customer": [("c_custkey", None)],
    }
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if t not in SCALED:
            os.symlink(src, os.path.join(dest, f"{t}.parquet"))
            continue
        df = load_table(spark, sf_dir, t)
        shifts = []
        for col, s in keys[t]:
            if s is None:
                s = df.agg(F.max(col)).collect()[0][0] + 1
            shifts.append((col, s))
        parts = []
        for i in range(k):
            c = df
            for col, s in shifts:
                c = c.withColumn(col, F.col(col) + F.lit(i * s))
            if t == "customer" and i > 0:
                # c_name is key-derived in TPC-H ('Customer#%09d'); a
                # copy that kept the ORIGINAL name would make every
                # name-keyed block/bucket artificially 20x hot and
                # read as a fake quadratic (this bit the first r10
                # er_deletion probe). Regenerate from the shifted key.
                c = c.withColumn(
                    "c_name",
                    F.format_string("Customer#%09d", F.col("c_custkey")),
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(dest, f"{t}.parquet"))
    with open(os.path.join(dest, "_PROBE_READY"), "w") as f:
        f.write("ok")
    return dest


def _median_time(spark, name: str, d: str, runs: int) -> float:
    xs = []
    for _ in range(runs):
        t0 = time.perf_counter()
        plans.QUERIES[name](spark, d).collect()
        xs.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        import gc

        gc.collect()
    xs.sort()
    return xs[len(xs) // 2]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # optional 3rd arg: comma-separated probe names (subset runs reuse
    # the cached scaled dir, so a targeted re-probe is cheap)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))
    plans.load_all()
    # staged-but-unregistered candidates are probed too (tools are not
    # driver surface, so registering here never touches the slate)
    from whisky_wine_etl_spark.plans import round9a  # noqa: E402

    round9a.register()
    # A typo'd subset must not read as "no saturation" (ADVICE r11):
    # unknown names or an empty filtered list exit non-zero BEFORE any
    # Spark work, instead of reporting worst=0.0 over zero probes.
    if only is not None:
        unknown = only - {n for n, _ in PROBES}
        if unknown:
            print(f"ERROR: unknown probe names: {sorted(unknown)}; "
                  f"known: {sorted(n for n, _ in PROBES)}", file=sys.stderr)
            return 2
        if not only:
            print("ERROR: empty probe-name filter", file=sys.stderr)
            return 2
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    scaled = build_scaled_dir(spark, sf_dir, k)
    print(f"scaled dir: {scaled} (K={k})", flush=True)
    plans.QUERIES[PROBES[0][0]](spark, sf_dir).collect()  # warm session
    worst = 0.0
    probes = [(n, w) for n, w in PROBES if only is None or n in only]
    for name, why in probes:
        t1 = _median_time(spark, name, sf_dir, runs)
        tk = _median_time(spark, name, scaled, runs)
        ratio = tk / t1
        worst = max(worst, ratio)
        print(
            f"{name:<28} {t1:6.2f}s -> {tk:6.2f}s  x{ratio:4.1f}"
            f"  (K={k}) — {why}",
            flush=True,
        )
    print(f"worst ratio x{worst:.1f} vs K={k}: "
          + ("SUB-LINEAR everywhere" if worst < k else "CHECK super-linear entries"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
