"""Behavior tests for round-4aj: grid-cell radius join."""

from __future__ import annotations

from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def _patch(monkeypatch, su, cu):
    import whisky_wine_etl_spark.plans.round4aj as r4aj

    tables = {"supplier": su, "customer": cu}
    monkeypatch.setattr(r4aj, "load_table", lambda s, sf, n: tables[n])


def test_grid_join_finds_cross_cell_and_wrap_pairs(spark, monkeypatch):
    """Keys are chosen so the derived coordinates produce: a pair
    straddling a cell boundary (~111 km apart), an antimeridian pair
    (lon −179 vs +179, ~度2° apart), and a far pair — the first two
    must appear, the far one must not."""
    # derived coords: slat=((k*41)%120)-60, slon=((k*97)%360)-180
    # pick raw coordinate stand-ins by solving small keys by brute force
    import math

    def scoord(k):
        return ((k * 41) % 840) / 7.0 - 60.0, ((k * 97) % 2520) / 7.0 - 180.0

    def ccoord(k):
        return ((k * 13) % 840) / 7.0 - 60.0, ((k * 29) % 2520) / 7.0 - 180.0

    def hav(a, b):
        la1, lo1 = a
        la2, lo2 = b
        h = (
            math.sin(math.radians(la1 - la2) / 2) ** 2
            + math.cos(math.radians(la1))
            * math.cos(math.radians(la2))
            * math.sin(math.radians(lo1 - lo2) / 2) ** 2
        )
        return 2 * 6371 * math.asin(math.sqrt(h))

    # search key pairs: one within 200km crossing a 4° boundary, one wrap
    cross_pair = None
    wrap = None
    for sk in range(1, 2000):
        for ck in range(1, 2000):
            s, c = scoord(sk), ccoord(ck)
            d = hav(s, c)
            if d == 0 or d > 200:
                continue
            crosses = int((s[0] + 60) // 4) != int((c[0] + 60) // 4) or int(
                (s[1] + 180) // 4
            ) != int((c[1] + 180) // 4)
            wraps = abs(s[1] - c[1]) > 300
            if wraps and wrap is None:
                wrap = (sk, ck)
            if crosses and not wraps and cross_pair is None:
                cross_pair = (sk, ck)
        if cross_pair and wrap:
            break
    assert cross_pair, "no cross-cell pair found in key space"
    su_keys = [cross_pair[0]] + ([wrap[0]] if wrap else []) + [5]
    cu_keys = [cross_pair[1]] + ([wrap[1]] if wrap else []) + [300]
    su = spark.createDataFrame([Row(s_suppkey=k) for k in set(su_keys)])
    cu = spark.createDataFrame([Row(c_custkey=k) for k in set(cu_keys)])
    _patch(monkeypatch, su, cu)
    rows = {(r.c_custkey, r.station_id) for r in plans.QUERIES["geo_grid_radius_join"](spark, SF).collect()}
    assert (cross_pair[1], cross_pair[0]) in rows
    if wrap:
        assert (wrap[1], wrap[0]) in rows
    # every returned pair is genuinely within R
    for c, s in rows:
        assert hav(scoord(s), ccoord(c)) <= 200.001


def test_grid_join_no_duplicate_pairs(spark):
    df = plans.QUERIES["geo_grid_radius_join"](spark, SF)
    n = df.count()
    nd = df.select("c_custkey", "station_id").distinct().count()
    assert n == nd
