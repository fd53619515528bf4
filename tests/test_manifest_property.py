"""Property test for the manifest-commit protocol (sources/pyds.py):
under ANY interleaving of committed writes, zombie attempts (part file
on disk, commit message lost — what a task retry leaves behind),
aborted attempts, and overwrites, the reader must return EXACTLY the
committed rows — the protocol-level generalization of
stream_sink_exactly_once_chaos's fixed scenario."""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from whisky_wine_etl_spark.sources.pyds import (
    ManifestJsonlDataSource,
    ManifestJsonlWriter,
)

_rows = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=4
)
_op = st.tuples(st.sampled_from(["commit", "zombie", "abort", "overwrite"]), _rows)


@given(ops=st.lists(_op, min_size=1, max_size=7))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_manifest_protocol_exactly_once(spark, ops):
    spark.dataSource.register(ManifestJsonlDataSource)
    path = tempfile.mkdtemp(prefix="sg_mjprop_")
    try:
        _check_manifest_protocol(spark, ops, path)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _check_manifest_protocol(spark, ops, path):
    expected: list[int] = []
    seq = 0
    for kind, vals in ops:
        seq += 1
        # tag rows so identical payloads from different ops stay
        # distinguishable in the multiset comparison
        rows = [Row(a=v, b=f"op{seq}") for v in vals]
        w = ManifestJsonlWriter({"path": path}, overwrite=(kind == "overwrite"))
        msg = w.write(iter(rows))
        if kind == "commit":
            w.commit([msg])
            expected.extend((r.a, r.b) for r in rows)
        elif kind == "overwrite":
            w.commit([msg])
            expected = [(r.a, r.b) for r in rows]
        elif kind == "zombie":
            pass  # file stays on disk, message lost
        else:  # abort
            w.abort([msg])
            assert not os.path.exists(msg.path)
    if not os.path.exists(os.path.join(path, "_MANIFEST")):
        # nothing ever committed: the reader has no table to trust
        assert expected == []
        return
    back = (
        spark.read.format("manifest_jsonl")
        .schema("a int, b string")
        .option("path", path)
        .load()
    )
    got = sorted((r.a, r.b) for r in back.collect())
    assert got == sorted(expected)
