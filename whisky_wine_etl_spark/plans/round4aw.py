"""Round-4aw: co-grouped pandas as-of join and isotonic calibration.

Registered AFTER round4av so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

import pandas as pd  # top-level so applyInPandas closures resolve
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.functions.rounding import pinned
from whisky_wine_etl_spark.plans.registry import query


@query(
    "join_asof_cogroup",
    """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
r0 AS (SELECT user_id, ts, event_id, value FROM events
       WHERE event_type = 'purchase'),
r AS (
  SELECT user_id, ts,
         max_by(event_id, event_id) AS purchase_event_id,
         max_by(value, event_id) AS purchase_value
  FROM r0 GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id, l.ts,
       r.purchase_event_id, r.ts AS purchase_ts, r.purchase_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def join_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of semantics as join_asof_last_purchase, computed
    through the OTHER distributed mechanism Spark offers:
    groupby().cogroup().applyInPandas with pd.merge_asof — both sides
    shuffle once on a 64-way user salt bucket, each co-group meets in
    one Arrow batch, and merge_asof(by='user_id') does the per-user
    split VECTORIZED inside pandas (cogrouping per raw user instead
    pays per-group Python overhead: measured 11.5 s vs ~1 s at sf0.1
    for identical semantics). This is the right tool when the per-key
    logic outgrows window algebra (multi-column tolerances,
    nearest-by-custom-metric); here it pins the cogroup API against
    the native-SQL oracle. Right side is pre-deduped per (user, ts)
    keeping the max event_id so tie behavior is engine-independent.
    Scale: one shuffle per side, per-bucket memory = that bucket's
    rows, bucket count tracks the cluster's task budget."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    # the timestamp is renamed BEFORE the cogroup: FlatMapCoGroups
    # deduplicates attributes by NAME across the two sides, so a
    # right-side column shadowed by a left-side 'ts' silently vanishes
    # from the pandas frame (found by the cross-operator parity test)
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.expr("max_by(event_id, event_id)").alias("purchase_event_id"),
            F.expr("max_by(value, event_id)").alias("purchase_value"),
        )
        .select(
            # EVERY right-side column gets a left-disjoint name: the
            # sides share lineage (one events scan), and FlatMapCo-
            # Groups' attribute dedup silently drops right columns
            # that collide with left ones by name/exprId
            F.col("user_id").alias("r_user_id"),
            F.col("ts").alias("purchase_ts"),
            "purchase_event_id",
            "purchase_value",
        )
    )

    out_cols = [
        "event_id", "user_id", "ts", "purchase_event_id",
        "purchase_ts", "purchase_value",
    ]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            # a bucket with purchases but no errors contributes
            # nothing; empty co-group frames can arrive column-less,
            # so return a typed frame without touching lpdf's columns
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "ts": pd.Series(dtype="datetime64[us]"),
                    "purchase_event_id": pd.Series(dtype="float64"),
                    "purchase_ts": pd.Series(dtype="datetime64[us]"),
                    "purchase_value": pd.Series(dtype="float64"),
                }
            )
        lpdf = lpdf.sort_values("ts", kind="mergesort")
        if rpdf.empty:
            out = lpdf.copy()
            out["purchase_event_id"] = pd.Series(dtype="float64")
            out["purchase_ts"] = pd.Series(dtype="datetime64[us]")
            out["purchase_value"] = pd.Series(dtype="float64")
            return out[out_cols]
        rpdf = rpdf.rename(columns={"r_user_id": "user_id"}).sort_values(
            "purchase_ts", kind="mergesort"
        )
        out = pd.merge_asof(
            lpdf,
            rpdf,
            left_on="ts",
            right_on="purchase_ts",
            by="user_id",
            direction="backward",
        )
        return out[out_cols]

    # cogroup on a SALT BUCKET of users, not per user: applyInPandas
    # pays per-GROUP overhead (frame build + one Python call), so 10k
    # single-user groups cost ~10 s at sf0.1 while 64 bucketed groups
    # with merge_asof(by="user_id") doing the per-user split
    # vectorized inside pandas run the same semantics in ~1 s. At any
    # scale the bucket count just tracks the cluster's task budget.
    lb = left.groupBy(F.pmod("user_id", F.lit(64)).alias("b"))
    rb = right.groupBy(F.pmod("r_user_id", F.lit(64)).alias("b"))
    return lb.cogroup(rb).applyInPandas(
        merge,
        schema=(
            "event_id long, user_id long, ts timestamp, "
            "purchase_event_id long, purchase_ts timestamp, "
            "purchase_value double"
        ),
    )


@query(
    "ml_isotonic_calibration",
    """
WITH big AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000.0
),
scored AS (
  SELECT LEAST(49, GREATEST(0,
           CAST(FLOOR(((c_acctbal + 1000.0) / 12000.0) * 50) AS INT))) AS bin,
         CASE WHEN b.o_custkey IS NULL THEN 0 ELSE 1 END AS label
  FROM customer c LEFT JOIN big b ON b.o_custkey = c.c_custkey
),
bins AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(label) AS BIGINT) AS pos
  FROM scored GROUP BY bin
),
pre AS (
  SELECT bin, n, pos,
         SUM(n) OVER (ORDER BY bin) AS cn,
         SUM(pos) OVER (ORDER BY bin) AS cp,
         ROW_NUMBER() OVER (ORDER BY bin) AS i
  FROM bins
),
seg AS (
  SELECT a.i AS j, b.i AS k,
         CAST(b.cp - a.cp + a.pos AS DOUBLE) / (b.cn - a.cn + a.n) AS r
  FROM pre a JOIN pre b ON a.i <= b.i
),
mins AS (
  SELECT s.j, p.i, MIN(s.r) AS minr
  FROM seg s JOIN pre p ON s.j <= p.i AND p.i <= s.k
  GROUP BY s.j, p.i
),
iso AS (SELECT i, MAX(minr) AS iso_raw FROM mins GROUP BY i)
SELECT p.bin, p.n,
       FLOOR(CAST(p.pos AS DOUBLE) / p.n * 1000000 + 0.5) / 1000000 AS raw_rate,
       FLOOR(iso.iso_raw * 1000000 + 0.5) / 1000000 AS iso_rate
FROM pre p JOIN iso ON iso.i = p.i
""",
)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration by pool-adjacent-violators: a raw score
    (scaled account balance) predicts whether a customer has a
    >150k order; scores bucket into 50 fixed bins (one distributed
    aggregate), PAVA runs over the ≤50 collected bins on the driver
    (bounded O(bins) work, the same discipline as IVF training), and
    the monotone calibrated rate broadcasts back onto the bins. The
    classic post-hoc calibrator when Platt scaling's sigmoid shape is
    wrong. Properties pinned in tests: output monotone nondecreasing
    in score, pool rates = weighted means of their members, global
    weighted mean preserved.

    EXACT oracle since r9 (formerly a rows-only carve-out): PAVA's
    merge ORDER is irrelevant because weighted-L2 isotonic regression
    has a unique solution with the minimax characterization
    iso(i) = max_{j<=i} min_{k>=i} mean(j..k); the oracle computes it
    from integer prefix sums over the <=50-bin frame (O(bins^3) pair
    joins on a 50-row CTE — free). Bit-identity holds because
    correctly-rounded IEEE division is MONOTONE on exact-integer
    operands: min_k nearest(P/N) = nearest(min_k P/N), so the SQL
    max-of-min equals nearest(pool rational) — the very double the
    driver-side PAVA emits from its pool division. Both sides pin
    rounding (floor(x*1e6+0.5)/1e6) since calibration rates are
    small-denominator rationals that can sit ON rounding halves."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = (
        o.filter(F.col("o_totalprice") > 150000.0)
        .select("o_custkey")
        .distinct()
        .withColumn("label", F.lit(1))
    )
    scored = (
        c.join(big, c.c_custkey == big.o_custkey, "left")
        .select(
            ((F.col("c_acctbal") + 1000.0) / 12000.0).alias("score"),
            F.coalesce("label", F.lit(0)).alias("label"),
        )
        .withColumn(
            "bin",
            F.least(F.lit(49), F.greatest(F.lit(0), (F.col("score") * 50).cast("int"))),
        )
    )
    bins = (
        scored.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("label").cast("bigint").alias("pos"),
        )
        .orderBy("bin")
        .collect()  # <= 50 rows: bounded driver-side PAVA input
    )
    # pool-adjacent-violators over (rate, weight)
    pools: list[list[float]] = []  # [sum_pos, sum_n, first_bin]
    for r in bins:
        pools.append([float(r.pos), float(r.n), r.bin])
        while len(pools) > 1 and (
            pools[-2][0] * pools[-1][1] > pools[-1][0] * pools[-2][1]
        ):  # rate[-2] > rate[-1] in exact cross-multiplied integers
            a = pools.pop()
            pools[-1][0] += a[0]
            pools[-1][1] += a[1]
    iso = {}
    for pi, (p_pos, p_n, first_bin) in enumerate(pools):
        last_bin = pools[pi + 1][2] - 1 if pi + 1 < len(pools) else 49
        for bn in range(int(first_bin), int(last_bin) + 1):
            iso[bn] = p_pos / p_n
    iso_df = spark.createDataFrame(
        [(bn, rate) for bn, rate in sorted(iso.items())], "bin int, iso_rate double"
    )
    per_bin = (
        scored.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.sum("label") / F.count(F.lit(1))).alias("raw_rate"),
        )
    )
    return (
        per_bin.join(F.broadcast(iso_df), "bin")
        .select(
            "bin",
            "n",
            pinned(F.col("raw_rate"), 6).alias("raw_rate"),
            pinned(F.col("iso_rate"), 6).alias("iso_rate"),
        )
        .orderBy("bin")
    )
