"""Round-4x: per-key model fitting and order-dependent scans —
per-user OLS trend (grouped closed-form regression), k-fold
cross-validated ridge via the total-minus-fold sufficient-statistic
trick (no per-fold rescan), and a monotone-stack "next greater
element" operator on the applyInPandas path with a LATERAL-join
oracle.

Registered AFTER round4w so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Per-key OLS trend: one closed-form regression PER USER over their
# daily event counts. x = epoch day (integer), y = daily count
# (integer): every sufficient statistic is an exact integer, so slope
# and r² are bit-identical across engines before the final rounding.
# ---------------------------------------------------------------------------


@query(
    "ts_trend_per_key",
    """
WITH daily AS (
  SELECT user_id,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
         SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM daily GROUP BY user_id HAVING COUNT(*) >= 5
)
SELECT user_id, n_days,
       ROUND((n_days * sxy - sx * sy) / (n_days * sxx - sx * sx), 6) AS slope,
       ROUND((n_days * sxy - sx * sy) * (n_days * sxy - sx * sy)
             / ((n_days * sxx - sx * sx) * (n_days * syy - sy * sy)), 6) AS r2
FROM s
WHERE (n_days * syy - sy * sy) > 0
ORDER BY slope DESC, user_id LIMIT 25
""",
)
def ts_trend_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped closed-form OLS: the 25 users whose daily activity
    trends up fastest. ONE shuffle builds the daily frame, one more
    folds it to per-user sufficient statistics (both partial-agg'd);
    the regression algebra is a projection. This is the scale shape
    for millions of keys — never a per-key solver loop, no window.
    Constant-activity users (zero y-variance) are excluded — r² is
    undefined for them."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    s = (
        daily.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
        .filter(F.col("n_days") >= 5)
    )
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        s.filter(deny > 0)
        .select(
            "user_id",
            "n_days",
            F.round(num / denx, 6).alias("slope"),
            F.round(num * num / (denx * deny), 6).alias("r2"),
        )
        .orderBy(F.desc("slope"), "user_id")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# k-fold cross-validated ridge regression WITHOUT per-fold rescans:
# each fold's training statistics are total-minus-fold — sufficient
# statistics are mergeable, so they're also subtractable. Two passes
# over the data total (one for stats, one for held-out scoring),
# independent of k.
# ---------------------------------------------------------------------------

_LAMBDA = 10.0
_K = 5


@query(
    "ml_ridge_kfold_cv",
    f"""
WITH d AS (
  SELECT o.o_orderkey, ((o.o_orderkey % 2147483647) * 2654435761) % 2147483647 % {_K} AS fold,
         o.o_totalprice / 1000 AS x, CAST(COUNT(*) AS DOUBLE) AS y
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_totalprice
),
fs AS (
  SELECT fold, CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM d GROUP BY fold
),
tot AS (
  SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
         SUM(sxx) AS sxx, SUM(sxy) AS sxy
  FROM fs
),
model AS (
  SELECT fs.fold,
         (tot.n - fs.n) AS n_train,
         ((tot.sxy - fs.sxy) - (tot.sx - fs.sx) * (tot.sy - fs.sy) / (tot.n - fs.n))
         / (((tot.sxx - fs.sxx) - (tot.sx - fs.sx) * (tot.sx - fs.sx) / (tot.n - fs.n)) + {_LAMBDA}) AS slope,
         (tot.sy - fs.sy) / (tot.n - fs.n) AS ybar,
         (tot.sx - fs.sx) / (tot.n - fs.n) AS xbar
  FROM fs, tot
)
SELECT m.fold, CAST(m.n_train AS BIGINT) AS n_train,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       ROUND(m.slope, 6) AS slope,
       ROUND(m.ybar - m.slope * m.xbar, 6) AS intercept,
       ROUND(SQRT(AVG((d.y - (m.ybar + m.slope * (d.x - m.xbar)))
                      * (d.y - (m.ybar + m.slope * (d.x - m.xbar))))), 6) AS rmse
FROM d JOIN model m ON m.fold = d.fold
GROUP BY m.fold, m.n_train, m.slope, m.ybar, m.xbar
ORDER BY m.fold
""",
)
def ml_ridge_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold CV of a 1-feature ridge (predict item count from order
    price) in two data passes regardless of k.

    Fold assignment is the engine-portable multiplicative hash (rerun
    stable). Pass 1: per-fold sufficient statistics (one partial-agg'd
    groupBy to 5 rows). Each fold's TRAINING stats are total − fold —
    subtractability is the whole point of sufficient statistics, and
    it's what makes CV free at 100 TB where k rescans would not be.
    Pass 2 scores each row against its own fold's model (broadcast
    5-row join) for held-out RMSE."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    d = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .select(
            (((F.col("o_orderkey") % 2147483647) * 2654435761) % 2147483647 % _K)
            .alias("fold"),
            (F.col("o_totalprice") / 1000).alias("x"),
            "y",
        )
    )
    fs = d.groupBy("fold").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    tot = fs.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("sxy").alias("tsxy"),
    )
    ntr = F.col("tn") - F.col("n")
    sxc = (F.col("tsxy") - F.col("sxy")) - (F.col("tsx") - F.col("sx")) * (
        F.col("tsy") - F.col("sy")
    ) / ntr
    sxxc = (F.col("tsxx") - F.col("sxx")) - (F.col("tsx") - F.col("sx")) * (
        F.col("tsx") - F.col("sx")
    ) / ntr
    model = fs.crossJoin(F.broadcast(tot)).select(
        "fold",
        ntr.alias("n_train"),
        (sxc / (sxxc + _LAMBDA)).alias("slope"),
        ((F.col("tsy") - F.col("sy")) / ntr).alias("ybar"),
        ((F.col("tsx") - F.col("sx")) / ntr).alias("xbar"),
    )
    resid = F.col("y") - (
        F.col("ybar") + F.col("slope") * (F.col("x") - F.col("xbar"))
    )
    return (
        d.join(F.broadcast(model), "fold")
        .groupBy("fold", "n_train", "slope", "ybar", "xbar")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.round(F.sqrt(F.avg(resid * resid)), 6).alias("rmse"),
        )
        .select(
            "fold",
            F.col("n_train").cast("bigint").alias("n_train"),
            "n_test",
            F.round("slope", 6).alias("slope"),
            F.round(F.col("ybar") - F.col("slope") * F.col("xbar"), 6).alias(
                "intercept"
            ),
            "rmse",
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# Next-greater-element per user: for each event, how long until this
# user next produces a strictly higher value? Inherently sequential
# per key (a monotone stack), so it runs as applyInPandas — the
# sanctioned Python path — partitioned by user. The oracle is a
# LATERAL join. Output is the per-user reduction, keeping the result
# frame key-sized.
# ---------------------------------------------------------------------------


@query(
    "ts_next_higher_value",
    """
WITH nxt AS (
  SELECT e.user_id, e.event_id, j.wait_s
  FROM events e LEFT JOIN LATERAL (
    SELECT (epoch_us(f.ts) - epoch_us(e.ts)) / 1e6 AS wait_s
    FROM events f
    WHERE f.user_id = e.user_id AND f.value > e.value
      AND (f.ts > e.ts OR (f.ts = e.ts AND f.event_id > e.event_id))
    ORDER BY f.ts, f.event_id LIMIT 1
  ) j ON TRUE
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(wait_s) AS BIGINT) AS n_with_next,
       ROUND(AVG(wait_s), 2) AS avg_wait_s
FROM nxt GROUP BY user_id
ORDER BY user_id
""",
)
def ts_next_higher_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone-stack next-greater scan per user (O(n) per key vs the
    oracle LATERAL's O(n²)) on the secondary-sort mapInPandas path.

    The scan is genuinely order-dependent state — the case where
    built-in operators stop and grouped pandas is the right tool.
    Instead of applyInPandas (one Python call per key — per-call
    overhead dominates when keys are small), the stream is
    repartitioned by user and sorted (user, ts, id) WITHIN each
    partition, and ONE mapInPandas pass walks each Arrow batch,
    carrying the trailing (possibly split) user over to the next
    batch. That amortizes Python dispatch over thousands of keys per
    batch and keeps memory bounded by batch size — the classic
    secondary-sort contract, which is exactly what survives 100 TB.
    Timestamps are reduced to int64 nanoseconds once per batch; the
    stack loop touches plain scalars only."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    schema = "user_id long, n_events long, n_with_next long, avg_wait_s double"
    cols = ["user_id", "n_events", "n_with_next", "avg_wait_s"]

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, g in pdf.groupby("user_id", sort=False):
            vals = g["value"].to_numpy().tolist()
            tns = (
                g["ts"].to_numpy(dtype="datetime64[ns]").astype("int64").tolist()
            )
            n = len(vals)
            stack: list[int] = []
            total_ns = 0
            cnt = 0
            for i in range(n):
                v = vals[i]
                while stack and vals[stack[-1]] < v:
                    j = stack.pop()
                    total_ns += tns[i] - tns[j]
                    cnt += 1
                stack.append(i)
            out.append(
                (
                    uid,
                    n,
                    cnt,
                    round(total_ns / 1e9 / cnt, 2) if cnt else None,
                )
            )
        return pd.DataFrame(out, columns=cols)

    def nge_partition(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_uid = pdf["user_id"].iloc[-1]
            head = pdf[pdf["user_id"] != last_uid]
            carry = pdf[pdf["user_id"] == last_uid]
            if len(head):
                yield process(head)
        if carry is not None and len(carry):
            yield process(carry)

    out = (
        ev.repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(nge_partition, schema)
    )
    return out.orderBy("user_id")
