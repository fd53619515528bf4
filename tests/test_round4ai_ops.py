"""Behavior tests for round-4ai: MIPS via augmented-cosine LSH."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def _exact_ip_topk(k: int = 5, n_queries: int = 5):
    t = pq.read_table(SF + "/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist())
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    out = {}
    for qi in range(n_queries):
        ips = vecs @ vecs[qi]
        ips[qi] = -np.inf  # exclude self
        top = sorted(range(len(ids)), key=lambda j: (-ips[j], ids[j]))[:k]
        out[int(ids[qi])] = [int(ids[j]) for j in top]
    return out


def test_mips_recall_against_exact_ip(spark):
    """The augmented-cosine LSH path must recover most of the true
    inner-product top-5 (recall ≥ 0.6 across the 5 queries — the
    same bar the cosine LSH recall tests use), and every returned ip
    must equal the exact inner product."""
    rows = plans.QUERIES["sim_topk_mips"](spark, SF).collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r.query_id, []).append((r.cand_id, r.ip))
    exact = _exact_ip_topk()
    assert set(got) == set(exact)

    t = pq.read_table(SF + "/embeddings.parquet")
    ids = list(t["vec_id"].to_pylist())
    vecs = {i: np.array(v, dtype=np.float64) for i, v in
            zip(ids, t["embedding"].to_pylist())}
    hits = total = 0
    for q, cands in got.items():
        returned = [c for c, _ in cands]
        assert len(returned) == len(set(returned))
        total += len(exact[q])
        hits += len(set(returned) & set(exact[q]))
        for c, ip in cands:
            true_ip = float(vecs[q] @ vecs[c])
            assert abs(ip - round(true_ip, 6)) < 1e-9
    assert hits / total >= 0.6, f"MIPS recall too low: {hits}/{total}"


def test_mips_ranking_descends_by_ip(spark):
    rows = plans.QUERIES["sim_topk_mips"](spark, SF).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rk, r.ip))
    for q, pairs in by_q.items():
        pairs.sort()
        ips = [ip for _, ip in pairs]
        # augmented-cosine ordering must agree with ip ordering
        assert ips == sorted(ips, reverse=True), (q, ips)
