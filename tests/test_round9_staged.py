"""Round-9 staged candidates (plans/round9a.py) — verified NOW so the
round-9 registration flip is no-risk.

The module is deliberately NOT imported by plans.load_all this round
(SURVEY §20 item 1: registry held at 398 so CORRECTNESS_r08's 50-slot
slate reaches 100% driver verification). These tests cover:

- exact DuckDB parity for both staged queries at sf0.001,
- the salted join's LEVER, not just its result: the physical plan
  joins on (key, salt), and salting provably flattens the hot key's
  reducer placement,
- the full-outer-specific semantics the left twin can't show:
  NULL-padded rows from BOTH sides, each appearing exactly once,
- staging hygiene: nothing registered until register() runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.parity import compare, duckdb_connection
from whisky_wine_etl_spark.plans import round9a

plans.load_all()

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duckdb_connection(SF)


def test_staged_now_registered():
    """Round-9 flip: load_all() calls round9a.register(), so both
    names are live registry entries with exact oracles."""
    assert set(round9a.STAGED) <= set(plans.QUERIES)
    assert set(round9a.STAGED) <= set(plans.ORACLES)


@pytest.mark.parametrize("name", sorted(round9a.STAGED))
def test_staged_parity(spark, con, name):
    fn, sql = round9a.STAGED[name]
    ok, msg = compare(fn(spark, SF), con, sql)
    assert ok, f"{name}: {msg}"


def test_salted_join_plan_joins_on_salt(spark):
    """The lever itself: the executed join's keys must include the
    salt columns (so a hot key spreads over salt_buckets reducers),
    and the result must equal the PLAIN Spark join exactly."""
    from whisky_wine_etl_spark.operators.agg import salted_join

    lt = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            F.when(F.col("l_linenumber") >= 4, F.lit(0))
            .otherwise(F.col("l_partkey"))
            .alias("k"),
            F.col("l_orderkey"),
        )
    )
    pt = spark.read.parquet(f"{SF}/part.parquet").select("p_partkey", "p_brand")
    salted = salted_join(lt, pt, "k", "p_partkey", salt_buckets=8)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__lsalt" in plan and "__rsalt" in plan
    got = sorted(
        tuple(r)
        for r in salted.groupBy("p_brand").count().collect()
    )
    want = sorted(
        tuple(r)
        for r in lt.join(pt, lt["k"] == pt["p_partkey"]).groupBy("p_brand").count().collect()
    )
    assert got == want


def test_salting_flattens_hot_key_placement(spark):
    """Partition-placement proof at the shuffle layer: hashing the
    skewed frame by (k) puts every hot-key row in ONE partition;
    hashing by (k, salt) spreads it across ~salt_buckets partitions."""
    lt = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            F.when(F.col("l_linenumber") >= 4, F.lit(0))
            .otherwise(F.col("l_partkey"))
            .alias("k")
        )
    )
    hot = lt.filter(F.col("k") == 0)
    n_parts = 8
    plain = (
        hot.repartition(n_parts, "k")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
    )
    assert plain.count() == 1  # the straggler: one reducer owns it all
    # Deterministic salt (ADVICE r8): F.rand(seed)'s realized values
    # depend on the scan's split layout / partition indices, so
    # asserting distribution properties on it can flake across Spark
    # versions or parallelism. Hashing a distinct-per-row id spreads
    # identically for placement purposes and is layout-robust.
    salted = (
        hot.withColumn(
            "s", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(8))
        )
        .repartition(n_parts, "k", "s")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
    )
    counts = [r["count"] for r in salted.collect()]
    total = sum(counts)
    assert len(counts) >= 4  # spread over several reducers
    assert max(counts) < total * 0.5  # no reducer owns even half


def test_full_outer_emits_both_null_sides(spark, con):
    """The semantics that make FULL distinct from LEFT: unmatched rows
    from BOTH inputs, each exactly once, matching the batch oracle's
    per-side NULL counts."""
    fn, _ = round9a.STAGED["stream_full_outer_attribution"]
    out = fn(spark, SF)
    got = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("purchase_event_id").isNull(), 1)).alias(
            "unmatched_signups"
        ),
        F.count(F.when(F.col("signup_event_id").isNull(), 1)).alias(
            "unmatched_purchases"
        ),
    ).collect()[0]
    want = con.execute(
        """
        WITH s AS (SELECT event_id AS sid, user_id AS su, ts AS sts
                   FROM events WHERE event_type = 'signup'),
             p AS (SELECT event_id AS pid, user_id AS pu, ts AS pts
                   FROM events WHERE event_type = 'purchase')
        SELECT COUNT(*),
               COUNT(*) FILTER (WHERE pid IS NULL),
               COUNT(*) FILTER (WHERE sid IS NULL)
        FROM s FULL JOIN p
          ON pu = su AND pts >= sts AND pts < sts + INTERVAL 1 HOUR
        """
    ).fetchone()
    assert (got["n"], got["unmatched_signups"], got["unmatched_purchases"]) == want
    assert want[1] > 0 and want[2] > 0  # the fixture exercises both sides
    # every source event appears at least once, and the per-side
    # multiplicity equals the batch join's (a purchase CAN legally
    # appear twice if two same-user signups opened overlapping
    # horizons — so expected counts come from the oracle, never from
    # an assumed data shape)
    sids = out.filter(F.col("signup_event_id").isNotNull()).select(
        "signup_event_id"
    )
    assert sids.distinct().count() == con.execute(
        "SELECT COUNT(*) FROM events WHERE event_type='signup'"
    ).fetchone()[0]
    pids = out.filter(F.col("purchase_event_id").isNotNull()).select(
        "purchase_event_id"
    )
    want_pid_rows, want_pid_distinct = con.execute(
        """
        WITH s AS (SELECT user_id AS su, ts AS sts
                   FROM events WHERE event_type = 'signup'),
             p AS (SELECT event_id AS pid, user_id AS pu, ts AS pts
                   FROM events WHERE event_type = 'purchase')
        SELECT COUNT(pid), COUNT(DISTINCT pid)
        FROM p LEFT JOIN s
          ON pu = su AND pts >= sts AND pts < sts + INTERVAL 1 HOUR
        """
    ).fetchone()
    assert (pids.count(), pids.distinct().count()) == (
        want_pid_rows,
        want_pid_distinct,
    )


def test_full_outer_horizon_edges(spark, tmp_path):
    """Hand-built adversarial fixture through a REAL two-batch stream:
    horizon boundary inclusion (dt=0 and dt=3599 match; dt=3600 is
    strictly excluded and must surface as an unmatched purchase),
    purchase-before-signup (both sides unmatched), purchase with no
    signup, signup with no purchase, and one purchase legally matched
    by TWO same-user signups with overlapping horizons."""
    import glob
    import os
    import shutil

    from whisky_wine_etl_spark.streaming import pipelines as sp

    t0 = "2024-01-01 00:00:00"

    def ts(off: int) -> str:
        return f"2024-01-01 {off // 3600:02d}:{(off % 3600) // 60:02d}:{off % 60:02d}"

    rows = [
        (1, t0, 1, "signup", 0.0),
        (2, t0, 1, "purchase", 10.0),          # dt=0: included
        (3, ts(3599), 1, "purchase", 20.0),    # dt=3599: included
        (4, ts(3600), 1, "purchase", 30.0),    # dt=3600: excluded
        (5, t0, 2, "signup", 0.0),             # never converts
        (6, t0, 3, "purchase", 40.0),          # no signup at all
        (7, ts(100), 4, "purchase", 50.0),     # precedes its signup
        (8, ts(200), 4, "signup", 0.0),
        (9, t0, 5, "signup", 0.0),             # two signups, one purchase
        (10, ts(30), 5, "signup", 0.0),
        (11, ts(60), 5, "purchase", 60.0),     # matches BOTH 9 and 10
        (-1, "2099-01-01 00:00:00", -1, "signup", 0.0),
        (-2, "2099-01-01 00:00:01", -1, "purchase", 0.0),
    ]
    schema = "event_id long, ts_s string, user_id long, event_type string, value double"
    df = spark.createDataFrame(rows, schema).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, (tag, frame) in enumerate(
        [
            ("real", df.filter(F.col("user_id") >= 0)),
            ("sentinel", df.filter(F.col("user_id") < 0)),
        ]
    ):
        stage = str(tmp_path / f"stage_{tag}")
        frame.coalesce(1).write.mode("overwrite").parquet(stage)
        [part] = glob.glob(os.path.join(stage, "part-*.parquet"))
        dest = os.path.join(landing, f"part-{i}-{tag}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    stream = sp.file_events_stream(spark, landing, max_files_per_trigger=1)
    out = sp.run_to_memory(spark, sp.stream_stream_full_outer(stream), "append")
    got = [
        (r["signup_event_id"], r["purchase_event_id"], r["dt_sec"], r["value_4dp"])
        for r in out.filter(F.col("user_id") >= 0).collect()
    ]
    want = sorted(
        [
            (1, 2, 0, 100000),
            (1, 3, 3599, 200000),
            (None, 4, None, 300000),
            (5, None, None, None),
            (None, 6, None, 400000),
            (None, 7, None, 500000),
            (8, None, None, None),
            (9, 11, 60, 600000),
            (10, 11, 30, 600000),
        ],
        key=lambda r: tuple((x is None, x if x is not None else 0) for x in r),
    )
    got = sorted(
        got, key=lambda r: tuple((x is None, x if x is not None else 0) for x in r)
    )
    assert got == want


_HYP = None


def _hyp():
    global _HYP
    if _HYP is None:
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        _HYP = (given, settings, HealthCheck, st)
    return _HYP


def test_salted_join_property(spark):
    """salted_join == plain inner join on ANY keyed data: hypothesis
    drives key collisions, null keys (never match, like the plain
    join), keys absent from one side, and duplicate right-side keys
    (fan-out must replicate identically)."""
    given, settings, HealthCheck, st = _hyp()

    from whisky_wine_etl_spark.operators.agg import salted_join

    left_rows = st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5)),  # tiny domain: hot keys
            st.integers(0, 99),
        ),
        max_size=14,
    )
    right_rows = st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 7)), st.integers(0, 99)),
        max_size=10,
    )

    @given(lt=left_rows, rt=right_rows, buckets=st.sampled_from([1, 3, 8]))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(lt, rt, buckets):
        ldf = spark.createDataFrame(lt, "k int, lv int") if lt else (
            spark.createDataFrame([], "k int, lv int")
        )
        rdf = spark.createDataFrame(rt, "rk int, rv int") if rt else (
            spark.createDataFrame([], "rk int, rv int")
        )
        got = sorted(
            tuple(r)
            for r in salted_join(ldf, rdf, "k", "rk", salt_buckets=buckets)
            .select("k", "lv", "rk", "rv")
            .collect()
        )
        want = sorted(
            tuple(r)
            for r in ldf.join(rdf, ldf["k"] == rdf["rk"])
            .select("k", "lv", "rk", "rv")
            .collect()
        )
        assert got == want

    check()


def test_register_flip_is_idempotent():
    """load_all() calls register() on every invocation (module imports
    are cached but the call is not); re-running it — or any test
    importing after the flip — must be a no-op, not a duplicate-name
    ValueError or a re-registration that changes registry size."""
    before_q = dict(plans.QUERIES)
    before_o = dict(plans.ORACLES)
    round9a.register()  # second+ call: no-op
    assert dict(plans.QUERIES) == before_q
    assert dict(plans.ORACLES) == before_o
    assert set(round9a.STAGED) <= set(plans.QUERIES)
