"""sf0.1 recall assertions for the rows-only / quantized ANN paths
(VERDICT r4 item 7).

The small-sf recall tests prove the algorithms; these prove the
INDEX QUALITY doesn't silently degrade at the driver's bench scale
(sf0.1: 2000 vectors — 4x the training corpus of the small fixtures,
so codebook/centroid coverage is genuinely different). Ground truth is
one numpy pass over the parquet (2000×64 — trivial on the test box,
and the point is the comparison, not the truth computation).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators import similarity as sim

plans.load_all()

SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def truth():
    """Exact cosine top-5 (and ip top-5) per probe id from numpy."""
    t = pq.read_table(SF01 + "/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist())
    x = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    order = np.argsort(ids)
    ids, x, xn = ids[order], x[order], xn[order]

    def topk(mat, probe_mask, k=5):
        out = {}
        for qi in np.nonzero(probe_mask)[0]:
            s = mat[qi] @ (mat.T if mat is xn else mat.T)
            # exclude self, rank by (-score, cand_id)
            cand = [
                (float(-s[j]), int(ids[j]))
                for j in range(len(ids))
                if j != qi
            ]
            cand.sort()
            out[int(ids[qi])] = [c for _, c in cand[:k]]
        return out

    cos_probes = ids % 50 == 0
    ip_probes = np.zeros(len(ids), dtype=bool)
    ip_probes[np.argsort(ids)[:5]] = True
    return {
        "cos": topk(xn, cos_probes),
        "ip": topk(x, ip_probes),
    }


def _recall(got: dict[int, list[int]], want: dict[int, list[int]]) -> float:
    hits = total = 0
    for q, cands in want.items():
        total += len(cands)
        hits += len(set(got.get(q, [])) & set(cands))
    return hits / total


def test_pq_topk_recall_sf01(spark, truth):
    emb = load_table(spark, SF01, "embeddings")
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got: dict[int, list[int]] = {}
    for r in sim.pq_topk(emb, queries, k=5).collect():
        got.setdefault(r.query_id, []).append(r.cand_id)
    r = _recall(got, truth["cos"])
    assert r >= 0.5, f"PQ recall@5 degraded at sf0.1: {r:.2f}"
    assert set(got) == set(truth["cos"])  # every probe answered


def test_mips_recall_sf01(spark, truth):
    rows = plans.QUERIES["sim_topk_mips"](spark, SF01).collect()
    got: dict[int, list[int]] = {}
    for r in rows:
        got.setdefault(r.query_id, []).append(r.cand_id)
    r = _recall(got, truth["ip"])
    assert r >= 0.5, f"MIPS recall@5 degraded at sf0.1: {r:.2f}"
    assert set(got) == set(truth["ip"])


def test_int8_recall_sf01(spark, truth):
    """int8 quantization is exact arithmetic, not candidate pruning —
    its only loss is the 8-bit rounding, so the bar is higher."""
    rows = plans.QUERIES["sim_topk_int8"](spark, SF01).collect()
    got: dict[int, list[int]] = {}
    for r in rows:
        got.setdefault(r.query_id, []).append(r.cand_id)
    r = _recall(got, truth["cos"])
    assert r >= 0.8, f"int8 recall@5 degraded at sf0.1: {r:.2f}"
    assert set(got) == set(truth["cos"])
