"""Local replica of the driver's DuckDB-oracle correctness check.

Runs a registered Spark query and its oracle SQL over the same
parquet tables, then compares row count, sorted column names, and
order-insensitive canonicalized values. Used by tests/ and by
``python -m whisky_wine_etl_spark.parity [sf_dir]`` for a full sweep.

Canonicalization predicts the driver's value-hash: if values compare
EQUAL here (exact, no tolerance), identical hashes are expected there.
That is why every plan rounds doubles in-query on both sides.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
import sys

import duckdb

from whisky_wine_etl_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # normalize -0.0
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs, cd = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"


def run_suite(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, str]:
    from whisky_wine_etl_spark import plans

    import time

    plans.load_all()
    con = duckdb_connection(sf_dir)
    results: dict[str, str] = {}
    for name in names or sorted(plans.QUERIES):
        fn = plans.QUERIES[name]
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            if name in plans.ORACLES:
                ok, msg = compare(df, con, plans.ORACLES[name])
                results[name] = ("PASS " if ok else "FAIL ") + msg
            else:
                n = df.count()
                results[name] = f"PASS rows-only ({n} rows)"
        except Exception as e:  # noqa: BLE001
            results[name] = f"ERROR {type(e).__name__}: {str(e).splitlines()[0][:200]}"
        results[name] += f" [{time.monotonic() - t0:.2f}s]"
        # cache policy (registry.py docstring): queries materialize
        # multi-referenced intermediates via localCheckpoint, whose
        # blocks free on RDD GC — so force the Python GC to drop py4j
        # refs promptly, and clearCache() for the few operator-scoped
        # persists, so a full-registry session never accumulates
        # unbounded executor storage
        spark.catalog.clearCache()
        import gc

        gc.collect()
    return results


def main() -> int:
    from whisky_wine_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    results = run_suite(spark, sf_dir, names)
    width = max(len(n) for n in results)
    failed = 0
    for name, msg in sorted(results.items()):
        print(f"{name:<{width}}  {msg}")
        if not msg.startswith("PASS"):
            failed += 1
    print(f"\n{len(results) - failed}/{len(results)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
