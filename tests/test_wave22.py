"""Wave-22 pins: LPA re-derived by a pure-Python synchronous implementation
over the full sf0.001 near-dup graph, plus the structural invariants."""

from __future__ import annotations

from sparkstreaming_quickstart_spark.queries.wave22 import (
    _LPA_ROUNDS,
    q319_lpa_communities,
)
from sparkstreaming_quickstart_spark.sources.catalog import load_table


def _exact_pairs(rows, threshold=0.7):
    sh = {}
    for r in rows:
        t = r["text"].split(" ")
        sh[r["doc_id"]] = {" ".join(t[i : i + 3]) for i in range(max(len(t) - 2, 1))}
    ids = sorted(sh)
    pairs = []
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            inter = len(sh[d1] & sh[d2])
            if inter and inter / (len(sh[d1]) + len(sh[d2]) - inter) >= threshold:
                pairs.append((d1, d2))
    return pairs


def _scalar_lpa(pairs, rounds):
    nbrs: dict[int, list[int]] = {}
    for u, v in pairs:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    labels = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n, ns in nbrs.items():
            counts: dict[int, int] = {}
            for m in ns:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            new[n] = min(counts, key=lambda lb: (-counts[lb], lb))
        labels = new
    return labels


def test_q319_matches_scalar_lpa(spark, sf_dir):
    rows = [
        r
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
        if r["text"]
    ]
    pairs = _exact_pairs(rows)
    expected = _scalar_lpa(pairs, _LPA_ROUNDS)
    got = {r["doc_id"]: r["community"] for r in q319_lpa_communities(spark, sf_dir).collect()}
    assert got == expected
    assert expected, "fixture near-dup graph is non-empty"


def test_q319_communities_refine_connected_components(spark, sf_dir):
    """Every LPA community lives inside one connected component: two nodes
    sharing a community label must be reachable from each other (LPA labels
    only ever travel along edges)."""
    rows = [
        r
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
        if r["text"]
    ]
    pairs = _exact_pairs(rows)
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        parent[find(u)] = find(v)
    got = {r["doc_id"]: r["community"] for r in q319_lpa_communities(spark, sf_dir).collect()}
    by_community: dict[int, set] = {}
    for node, c in got.items():
        by_community.setdefault(c, set()).add(find(node))
    for c, comps in by_community.items():
        assert len(comps) == 1, f"community {c} spans {len(comps)} components"


def test_q320_matches_scalar_modularity(spark, sf_dir):
    """Modularity re-derived scalar-side from the exact graph + scalar LPA."""
    rows = [
        r
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
        if r["text"]
    ]
    pairs = _exact_pairs(rows)
    labels = _scalar_lpa(pairs, _LPA_ROUNDS)
    m = len(pairs)
    l_c: dict[int, int] = {}
    d_c: dict[int, int] = {}
    for u, v in pairs:
        if labels[u] == labels[v]:
            l_c[labels[u]] = l_c.get(labels[u], 0) + 1
        d_c[labels[u]] = d_c.get(labels[u], 0) + 1
        d_c[labels[v]] = d_c.get(labels[v], 0) + 1
    communities = set(labels.values())
    q = sum(
        l_c.get(c, 0) / m - (d_c.get(c, 0) ** 2) / (4.0 * m * m) for c in communities
    )
    from sparkstreaming_quickstart_spark.queries.wave22 import q320_lpa_modularity

    got = q320_lpa_modularity(spark, sf_dir).collect()
    assert len(got) == 1
    g = got[0]
    assert g["n_edges"] == m
    assert g["n_communities"] == len(communities)
    assert abs(g["modularity"] - round(q, 6)) <= 2e-6
    # a partition of real dup clusters should beat random
    assert g["modularity"] > 0


def test_q321_matches_scalar_peel_and_converges(spark, sf_dir):
    """2-core re-derived by scalar peeling; also assert the fixture graph
    CONVERGES within the unrolled round budget (round R == round R-1), so
    the fixed-round output IS the true 2-core here, and every survivor has
    core degree >= 2."""
    from sparkstreaming_quickstart_spark.queries.wave22 import (
        _PEEL_ROUNDS,
        q321_dup_graph_2core,
    )

    rows = [
        r
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
        if r["text"]
    ]
    pairs = _exact_pairs(rows)
    edges = set()
    for u, v in pairs:
        edges.add((u, v))
        edges.add((v, u))
    prev_nodes = None
    for rnd in range(_PEEL_ROUNDS):
        deg: dict[int, int] = {}
        for u, _ in edges:
            deg[u] = deg.get(u, 0) + 1
        keep = {u for u, d in deg.items() if d >= 2}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
        nodes = {u for u, _ in edges}
        if prev_nodes == nodes and rnd < _PEEL_ROUNDS - 1:
            pass  # already converged; remaining rounds are no-ops
        prev_nodes = nodes
    # convergence within budget: one more peel changes nothing
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    assert all(d >= 2 for d in deg.values()), "fixture converges within budget"
    got = {r["doc_id"]: r["core_degree"] for r in q321_dup_graph_2core(spark, sf_dir).collect()}
    assert got == deg
    assert all(v >= 2 for v in got.values())
