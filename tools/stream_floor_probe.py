#!/usr/bin/env python
"""Streaming micro-batch floor probe (r13, VERDICT r12 item 3).

For the two slowest bench queries (stream_left/full_outer_attribution)
this measures, per configuration, bench-style wall time AND the
per-micro-batch receipts the floor adjudication needs:

- n_batches and per-batch durationMs (addBatch, stateStore commit) from
  StreamingQuery.recentProgress;
- state-store provider: default (HDFSBackedStateStore) vs RocksDB;
- state partitions: SPARK_GRAFT_STREAM_SHUFFLE in {2, 4, 8}.

Usage: python tools/stream_floor_probe.py [--runs 3]
Prints one JSON document; run it in a fresh process per A/B arm when
used as an accept gate (box noise discipline, SURVEY §8).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisky_wine_etl_spark import plans  # noqa: E402
from whisky_wine_etl_spark.session import get_spark  # noqa: E402

ROCKS = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def run_attrib(spark, sf_dir: str, kind: str) -> dict:
    """One instrumented run of the left/full outer attribution stream:
    same landing, stream shape, trigger and sink as the registered
    query, but keeps the query handle to read progress receipts."""
    from pyspark.sql import functions as F

    from whisky_wine_etl_spark.streaming import pipelines as sp

    landing = sp.multibatch_landing_with_sentinel(spark, sf_dir, n_files=3)
    stream = sp.file_events_stream(spark, landing, max_files_per_trigger=3)
    out = (
        sp.stream_stream_left_outer(stream)
        if kind == "left"
        else sp.stream_stream_full_outer(stream)
    )
    sink = f"probe_{kind}_{int(time.time_ns())}"
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions", "200")
    state_parts = int(os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8"))
    if int(prev_shuffle) > state_parts:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_parts))
    chk = sp._ephemeral_checkpoint_dir(spark, sink)
    t0 = time.perf_counter()
    try:
        writer = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
        )
        if chk is not None:
            writer = writer.option("checkpointLocation", chk)
        q = writer.start()
        q.awaitTermination()
        progress = [json.loads(p) for p in q.recentProgress]
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        if chk is not None:
            import shutil

            shutil.rmtree(chk, ignore_errors=True)
    wall = time.perf_counter() - t0
    n_rows = spark.table(sink).filter(F.col("user_id") >= 0).count()
    batches = []
    for p in progress:
        dur = p.get("durationMs", {})
        ss = [
            {
                "commitMs": so.get("commitTimeMs"),
                "stateMs": None,
                "rows": so.get("numRowsTotal"),
                "stores": so.get("numPartitions") if "numPartitions" in so else None,
            }
            for so in p.get("stateOperators", [])
        ]
        batches.append(
            {
                "batchId": p.get("batchId"),
                "rows_in": p.get("numInputRows"),
                "addBatch_ms": dur.get("addBatch"),
                "commitOffsets_ms": dur.get("commitOffsets"),
                "walCommit_ms": dur.get("walCommit"),
                "triggerExecution_ms": dur.get("triggerExecution"),
                "state": ss,
            }
        )
    return {"wall_s": round(wall, 3), "n_rows": n_rows, "batches": batches}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--provider", choices=["hdfs", "rocksdb"], default="hdfs")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    plans.load_all()
    spark = get_spark(cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    plans.QUERIES["flagship_q5_revenue_by_nation"](spark, sf_dir).collect()
    from whisky_wine_etl_spark.streaming import pipelines as sp

    sp.multibatch_landing(spark, sf_dir, n_files=3)
    sp.multibatch_landing_with_sentinel(spark, sf_dir, n_files=3)

    prev = spark.conf.get(PROVIDER_CONF, None)
    if args.provider == "rocksdb":
        spark.conf.set(PROVIDER_CONF, ROCKS)
    try:
        result: dict = {
            "provider": args.provider,
            "state_parts": os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8"),
            "runs": {},
        }
        for kind in ("left", "full"):
            result["runs"][kind] = [
                run_attrib(spark, sf_dir, kind) for _ in range(args.runs)
            ]
    finally:
        if args.provider == "rocksdb":
            if prev is None:
                spark.conf.unset(PROVIDER_CONF)
            else:
                spark.conf.set(PROVIDER_CONF, prev)
    doc = json.dumps(result, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(doc)
    print(doc)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
