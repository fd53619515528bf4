"""Invariant tests for sim_dbscan_embedding (plans/round5c.py): full
Python union-find replay at sf0.001 plus structural properties."""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow.parquet as pq

from whisky_wine_etl_spark import plans

plans.load_all()

SF = "/root/testdata/sf0.001"
MINPTS = 10
C = 1.07


def _python_dbscan():
    t = pq.read_table(SF + "/embeddings.parquet")
    ids = t["vec_id"].to_pylist()
    emb = t["embedding"].to_pylist()
    pts = {i: (float(e[0]), float(e[1])) for i, e in zip(ids, emb)}
    n = len(pts)
    eps2 = C / n
    nbrs: dict = defaultdict(set)
    items = sorted(pts.items())
    for i, (ia, (xa, ya)) in enumerate(items):
        for ib, (xb, yb) in items[i + 1 :]:
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= eps2:
                nbrs[ia].add(ib)
                nbrs[ib].add(ia)
    core = {i for i in pts if len(nbrs[i]) >= MINPTS}
    par = {c: c for c in core}

    def find(x):
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    for a in core:
        for b in nbrs[a]:
            if b in core:
                ra, rb = find(a), find(b)
                if ra != rb:
                    par[ra] = rb
    comp: dict = defaultdict(list)
    for c in core:
        comp[find(c)].append(c)
    label = {}
    for members in comp.values():
        m = min(members)
        for c in members:
            label[c] = m
    out = {}
    for i in pts:
        if i in core:
            out[i] = ("core", label[i])
        else:
            core_nb = [label[b] for b in nbrs[i] if b in core]
            if core_nb:
                out[i] = ("border", min(core_nb))
            else:
                out[i] = ("noise", None)
    return out


def test_dbscan_matches_python_replay_exactly(spark):
    want = _python_dbscan()
    rows = plans.QUERIES["sim_dbscan_embedding"](spark, SF).collect()
    got = {r.vec_id: (r.role, r.cluster_id) for r in rows}
    assert got == want


def test_dbscan_structural_properties(spark):
    rows = plans.QUERIES["sim_dbscan_embedding"](spark, SF).collect()
    roles = Counter(r.role for r in rows)
    # non-degenerate at this SF: all three roles present
    assert roles["core"] > 0 and roles["noise"] > 0
    for r in rows:
        if r.role == "noise":
            assert r.cluster_id is None
        else:
            assert r.cluster_id is not None
    # cluster ids are ids of CORE members (min-reachable-core rule)
    core_ids = {r.vec_id for r in rows if r.role == "core"}
    assert {r.cluster_id for r in rows if r.cluster_id is not None} <= core_ids
