"""100x output-bound confirmation probe (VERDICT r11 item 6).

The two worst 50x tails in the probe roster — dedup_minhash_lsh
(x16.4) and er_fellegi_sunter (x10.3) — were adjudicated OUTPUT-BOUND
SEMANTICS, not plan cliffs: the K-copy probe corpus genuinely contains
C(K,2) true duplicate pairs per document, so the result set itself
grows ~quadratically in K. This tool confirms that argument holds one
more order of magnitude, with the two pins VERDICT r11 asked for:

1. A CANDIDATE/OUTPUT-COUNT-vs-K assertion, exact where the semantics
   allow it:
   - MinHash: output pairs at Kx must equal
     N_docs * C(K,2) + P1 * K^2 EXACTLY, where P1 is the 1x pair
     count. Copies carry the original text, so every same-original
     copy pair is an identical-text true dup (term 1) and every 1x
     near-dup pair (d,e) fans out to all K x K copy combinations
     (term 2). Signatures are text-derived, so no NEW collisions can
     appear and none can vanish — any deviation means the banding or
     the exact-Jaccard verify changed behavior, not the corpus.
   - Fellegi-Sunter: the candidate set is the (nation, name16)
     blocked a x b join; its size is computed EXACTLY from the two
     sides' blocking-key histograms (sum over keys of cnt_a * cnt_b —
     a cheap pair of aggs, no pair materialization) at 1x and Kx.
2. The wall-time pass bar: t_K / t_1 must stay AT OR UNDER the
   output/candidate growth ratio — time tracking the result set is
   the definition of output-bound; time outgrowing it would be a real
   cliff.

Timing materializes via count() rather than collect(): at K=100 the
MinHash result is ~25M pairs and shipping them through the driver
socket would measure pickling, not the engine (same rationale as
bench.py's noop-sink exception). count() still executes the full
banding + verify plan.

Usage: python tools/probe_output_bound_x100.py [sf_dir] [K]
  (defaults /root/testdata/sf0.1, K=100; SPARK_GRAFT_DRIVER_MEM=48g
   recommended — the x50 graph probes already established the 8g
   default heap is undersized for >=50x working sets.)
Writes a receipt to stdout; tee into tools/logs/ like the other probes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisky_wine_etl_spark import plans  # noqa: E402
from whisky_wine_etl_spark.session import get_spark  # noqa: E402


def _timed_count(spark, name: str, d: str, runs: int = 2) -> tuple[float, int]:
    """Median wall time + row count of a registered query, fully
    executed through count()."""
    xs, n = [], -1
    for _ in range(runs):
        t0 = time.perf_counter()
        n = plans.QUERIES[name](spark, d).count()
        xs.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        import gc

        gc.collect()
    xs.sort()
    return xs[len(xs) // 2], n


def _fs_candidate_count(spark, d: str) -> int:
    """Exact blocked-candidate count for er_fellegi_sunter at dir `d`:
    sum over (nation, name16) keys of cnt_a * cnt_b, computed from the
    two sides' key histograms — no pair ever materializes. Mirrors the
    join keys in plans/round4as.py:er_fellegi_sunter verbatim."""
    from pyspark.sql import functions as F

    from whisky_wine_etl_spark.catalog import load_table
    from whisky_wine_etl_spark.plans.round4as import _FS_B_SQL

    cust = load_table(spark, d, "customer")
    a_hist = (
        cust.groupBy(
            F.col("c_nationkey").alias("nat"),
            F.expr("substr(c_name, 1, 16)").alias("name16"),
        ).agg(F.count("*").alias("cnt_a"))
    )
    b = spark.sql(
        f"SELECT * FROM ({_FS_B_SQL.replace('customer', '{c}')})", c=cust
    )
    b_hist = (
        b.groupBy(
            F.col("b_nat").alias("nat"),
            F.expr("substr(b_name, 1, 16)").alias("name16"),
        ).agg(F.count("*").alias("cnt_b"))
    )
    row = (
        a_hist.join(b_hist, ["nat", "name16"])
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("cands"))
        .collect()[0]
    )
    return int(row["cands"] or 0)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    plans.load_all()
    from tools.scale_probe import build_scaled_dir

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    scaled = build_scaled_dir(spark, sf_dir, k)
    print(f"scaled dir: {scaled} (K={k})", flush=True)
    failures: list[str] = []

    # ---- dedup_minhash_lsh: exact output-count pin -------------------
    from whisky_wine_etl_spark.catalog import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    t1, p1 = _timed_count(spark, "dedup_minhash_lsh", sf_dir)
    tk, pk = _timed_count(spark, "dedup_minhash_lsh", scaled)
    expected = n_docs * k * (k - 1) // 2 + p1 * k * k
    out_ratio = pk / max(p1, 1)
    time_ratio = tk / t1
    print(
        f"dedup_minhash_lsh  1x: {t1:6.2f}s {p1} pairs | {k}x: {tk:7.2f}s "
        f"{pk} pairs | expected {expected} "
        f"({'EXACT MATCH' if pk == expected else 'MISMATCH'}) | "
        f"time x{time_ratio:.1f} vs output x{out_ratio:.1f}",
        flush=True,
    )
    if pk != expected:
        failures.append(
            f"minhash pair count {pk} != N*C(K,2)+P1*K^2 = {expected}"
        )
    if time_ratio > out_ratio:
        failures.append(
            f"minhash wall ratio x{time_ratio:.1f} EXCEEDS output growth "
            f"x{out_ratio:.1f} — not output-bound"
        )

    # ---- er_fellegi_sunter: exact candidate-count pin ----------------
    c1 = _fs_candidate_count(spark, sf_dir)
    ck = _fs_candidate_count(spark, scaled)
    t1f, l1 = _timed_count(spark, "er_fellegi_sunter", sf_dir)
    tkf, lk = _timed_count(spark, "er_fellegi_sunter", scaled)
    cand_ratio = ck / max(c1, 1)
    time_ratio_f = tkf / t1f
    print(
        f"er_fellegi_sunter  1x: {t1f:6.2f}s {l1} links, {c1} candidates | "
        f"{k}x: {tkf:7.2f}s {lk} links, {ck} candidates | "
        f"time x{time_ratio_f:.1f} vs candidates x{cand_ratio:.1f}",
        flush=True,
    )
    if time_ratio_f > cand_ratio:
        failures.append(
            f"fellegi-sunter wall ratio x{time_ratio_f:.1f} EXCEEDS "
            f"candidate growth x{cand_ratio:.1f} — not output-bound"
        )
    if lk > ck:
        failures.append(f"links {lk} exceed candidates {ck} — impossible")

    if failures:
        print("FAIL: " + "; ".join(failures))
        return 1
    print(
        f"PASS: both tails output-bound at K={k} — wall time tracks the "
        "result/candidate set, no plan cliff"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
