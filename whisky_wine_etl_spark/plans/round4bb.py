"""Round-4bb: URL canonicalization dedup and difference-in-differences.

Registered AFTER round4ba so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.

- ``dedup_url_canonical`` is the web-corpus ingestion gate the other
  dedup ops assume already happened: collapse scheme/host case,
  default ports, tracking parameters, parameter order, fragments and
  trailing slashes BEFORE content hashing (a crawl stores the same
  page under dozens of URL spellings). Deterministic messy variants
  are derived per event (same device as func_url_pack, round4*.py);
  the engine canonicalizes with parse_url + array functions, the
  oracle with an independent regex/list pipeline — exact string
  agreement on every group.
- ``events_did_estimate`` is the 2×2 difference-in-differences
  estimator with per-cell means and the pooled standard error — the
  workhorse quasi-experimental readout next to the randomized-tests
  family (stat_ab_welch_ttest / stat_ab_cuped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "dedup_url_canonical",
    """
WITH base AS (
  SELECT user_id % 8 AS u, event_type AS et,
         CAST(props::JSON ->> 'k' AS BIGINT) AS k
  FROM events
),
raw AS (
  SELECT 'HTTPS://Shard' || CAST(u AS VARCHAR) || '.EXAMPLE.com:443/app/'
         || et || '/?b=' || CAST(k AS VARCHAR)
         || '&a=' || CAST(k % 7 AS VARCHAR)
         || '&utm_source=mail#frag' AS url
  FROM base
  UNION ALL
  SELECT 'https://shard' || CAST(u AS VARCHAR) || '.example.com/app/'
         || et || '?utm_campaign=x&a=' || CAST(k % 7 AS VARCHAR)
         || '&b=' || CAST(k AS VARCHAR) AS url
  FROM base
),
canon AS (
  SELECT 'https://'
    || lower(regexp_extract(url, '^[a-zA-Z]+://([^/:?#]+)', 1))
    || regexp_replace(
         COALESCE(regexp_extract(url, '^[a-zA-Z]+://[^/?#]+(/[^?#]*)', 1),
                  ''),
         '/$', '')
    || CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS canonical_url
  FROM (
    SELECT url,
           array_to_string(
             list_sort(
               list_filter(string_split(
                   COALESCE(regexp_extract(url, '[?]([^#]*)', 1), ''), '&'),
                 p -> p <> '' AND NOT starts_with(p, 'utm_'))),
             '&') AS cq
    FROM raw
  ) q
)
SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_variants
FROM canon GROUP BY canonical_url
""",
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize-then-dedup over deterministic messy URL variants
    (two spellings per event: upper-cased scheme/host + explicit
    :443 + tracking param + fragment + trailing slash vs the plain
    form with shuffled parameter order).

    Canonical form: lowercase scheme/host, default port dropped,
    fragment dropped, utm_* parameters dropped, remaining query
    parameters sorted, trailing path slash stripped. The engine path
    is parse_url (JVM) + split/filter/sort_array — whole-stage
    codegen, no Python; the oracle rebuilds the same form from raw
    regex + list functions, so agreement is two independent
    canonicalizers producing identical strings. Scale: map-only
    string work then one hash groupBy on the canonical key — the
    same shuffle profile as dedup_exact."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        (F.col("user_id") % 8).alias("u"),
        F.col("event_type").alias("et"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    messy = base.select(
        F.concat(
            F.lit("HTTPS://Shard"),
            F.col("u").cast("string"),
            F.lit(".EXAMPLE.com:443/app/"),
            F.col("et"),
            F.lit("/?b="),
            F.col("k").cast("string"),
            F.lit("&a="),
            (F.col("k") % 7).cast("string"),
            F.lit("&utm_source=mail#frag"),
        ).alias("url")
    ).unionAll(
        base.select(
            F.concat(
                F.lit("https://shard"),
                F.col("u").cast("string"),
                F.lit(".example.com/app/"),
                F.col("et"),
                F.lit("?utm_campaign=x&a="),
                (F.col("k") % 7).cast("string"),
                F.lit("&b="),
                F.col("k").cast("string"),
            ).alias("url")
        )
    )
    # parse_url(HOST) keeps the port out but preserves case; QUERY
    # excludes the fragment already
    host = F.lower(F.parse_url("url", F.lit("HOST")))
    path = F.regexp_replace(
        F.coalesce(F.parse_url("url", F.lit("PATH")), F.lit("")), "/$", ""
    )
    q = F.coalesce(F.parse_url("url", F.lit("QUERY")), F.lit(""))
    params = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    cq = F.array_join(F.sort_array(params), "&")
    canon = messy.select(
        F.concat(
            F.lit("https://"),
            host,
            path,
            F.when(cq == "", F.lit("")).otherwise(F.concat(F.lit("?"), cq)),
        ).alias("canonical_url")
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_variants")
    )


@query(
    "events_did_estimate",
    """
WITH m AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treat,
         CASE WHEN EXTRACT(day FROM ts) > 15 THEN 1 ELSE 0 END AS post,
         value
  FROM events WHERE event_type = 'purchase'
),
cells AS (
  SELECT treat, post,
         AVG(value) AS mean_v,
         VAR_SAMP(value) AS var_v,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM m GROUP BY treat, post
)
SELECT
  ROUND(MAX(CASE WHEN treat = 1 AND post = 0 THEN mean_v END), 6)
    AS treat_pre,
  ROUND(MAX(CASE WHEN treat = 1 AND post = 1 THEN mean_v END), 6)
    AS treat_post,
  ROUND(MAX(CASE WHEN treat = 0 AND post = 0 THEN mean_v END), 6)
    AS ctrl_pre,
  ROUND(MAX(CASE WHEN treat = 0 AND post = 1 THEN mean_v END), 6)
    AS ctrl_post,
  ROUND((MAX(CASE WHEN treat = 1 AND post = 1 THEN mean_v END)
       - MAX(CASE WHEN treat = 1 AND post = 0 THEN mean_v END))
      - (MAX(CASE WHEN treat = 0 AND post = 1 THEN mean_v END)
       - MAX(CASE WHEN treat = 0 AND post = 0 THEN mean_v END)), 6)
    AS did,
  ROUND(sqrt(SUM(var_v / n)), 6) AS se
FROM cells
""",
)
def events_did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on purchase value: treatment = even
    user ids, post-period = day of month > 15; DiD = (treat_post −
    treat_pre) − (ctrl_post − ctrl_pre) with the pooled standard
    error √Σ(s²_cell/n_cell) (independent-cells normal
    approximation).

    One pass builds the 2×2 cell aggregate (partial-agg'd groupBy,
    four cells regardless of SF); the estimator pivots those four
    rows inside a single 1-row aggregate — no joins, no driver math.
    The quasi-experimental sibling of the randomized stat_ab_*
    family."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    m = e.select(
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("treat"),
        F.when(F.dayofmonth("ts") > 15, 1).otherwise(0).alias("post"),
        "value",
    )
    cells = m.groupBy("treat", "post").agg(
        F.avg("value").alias("mean_v"),
        F.var_samp("value").alias("var_v"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )

    def cell(t: int, p: int):
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), F.col("mean_v"))
        )

    return cells.agg(
        F.round(cell(1, 0), 6).alias("treat_pre"),
        F.round(cell(1, 1), 6).alias("treat_post"),
        F.round(cell(0, 0), 6).alias("ctrl_pre"),
        F.round(cell(0, 1), 6).alias("ctrl_post"),
        F.round(
            (cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0)), 6
        ).alias("did"),
        F.round(
            F.sqrt(F.sum(F.col("var_v") / F.col("n"))), 6
        ).alias("se"),
    )
