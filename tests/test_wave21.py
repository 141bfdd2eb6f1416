"""Wave-21 pins: scalar/numpy re-derivations over the full sf0.001 corpus.

- q313: truncation loss re-derived from python token counts at each budget.
- q314: centroid cosine matrix re-derived with numpy (round-6 agreement,
  the q295 float-tolerance convention).
- q315: the source matrix re-derived from EXACT all-pairs 3-shingle Jaccard
  (the LSH path must aggregate to the same cells as the exact formulation
  at threshold 0.7 -- the q52 banding-knee equality, at source granularity).
- q316: coverage re-derived from the raw id sets.
"""

from __future__ import annotations

import numpy as np

from sparkstreaming_quickstart_spark.queries.wave21 import (
    q313_truncation_loss,
    q314_source_semantic_matrix,
    q315_neardup_source_matrix,
    q316_embedding_coverage,
)
from sparkstreaming_quickstart_spark.sources.catalog import load_table


def test_q313_matches_scalar_counts(spark, sf_dir):
    toks = [
        len(r["text"].split(" "))
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
        if r["text"]
    ]
    got = {r["ctx"]: r for r in q313_truncation_loss(spark, sf_dir).collect()}
    assert set(got) == {128, 512, 2048}
    total = sum(toks)
    for ctx, g in got.items():
        kept = sum(min(t, ctx) for t in toks)
        assert g["n_docs"] == len(toks)
        assert g["n_truncated"] == sum(1 for t in toks if t > ctx)
        assert g["kept_tokens"] == kept
        assert g["loss_ppm"] == (total - kept) * 1000000 // total
    # monotone: a larger context never loses more
    assert got[128]["loss_ppm"] >= got[512]["loss_ppm"] >= got[2048]["loss_ppm"]


def test_q314_matches_numpy_centroids(spark, sf_dir):
    docs = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    }
    per_source: dict[str, list] = {}
    for r in load_table(spark, sf_dir, "embeddings").collect():
        s = docs.get(r["vec_id"])
        if s is not None:
            per_source.setdefault(s, []).append(np.asarray(r["embedding"], dtype=np.float64))
    cents = {s: np.mean(np.stack(v), axis=0) for s, v in per_source.items()}
    got = {(r["s1"], r["s2"]): r["cosine"] for r in q314_source_semantic_matrix(spark, sf_dir).collect()}
    srcs = sorted(cents)
    expected_pairs = {(a, b) for a in srcs for b in srcs if a <= b}
    assert set(got) == expected_pairs
    for (a, b), cos in got.items():
        ca, cb = cents[a], cents[b]
        ref = float(ca @ cb / np.sqrt((ca @ ca) * (cb @ cb)))
        assert abs(cos - round(ref, 6)) <= 2e-6, (a, b, cos, ref)
    for s in srcs:
        assert abs(got[(s, s)] - 1.0) <= 2e-6


def test_q315_matches_exact_jaccard_aggregation(spark, sf_dir):
    rows = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source").collect()
    sh = {}
    src = {}
    for r in rows:
        t = r["text"].split(" ")
        sh[r["doc_id"]] = {" ".join(t[i : i + 3]) for i in range(max(len(t) - 2, 1))}
        src[r["doc_id"]] = r["source"]
    ids = sorted(sh)
    cells: dict[tuple, list] = {}
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            inter = len(sh[d1] & sh[d2])
            if not inter:
                continue
            j = inter / (len(sh[d1]) + len(sh[d2]) - inter)
            if j >= 0.7:
                key = tuple(sorted((src[d1], src[d2])))
                cells.setdefault(key, []).append(j)
    got = {(r["s1"], r["s2"]): r for r in q315_neardup_source_matrix(spark, sf_dir).collect()}
    assert set(got) == set(cells)
    for key, js in cells.items():
        assert got[key]["n_pairs"] == len(js)
        assert abs(got[key]["max_jaccard"] - round(max(js), 6)) <= 2e-6


def test_q316_matches_raw_id_sets(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    vec_ids = {
        r["vec_id"] for r in load_table(spark, sf_dir, "embeddings").select("vec_id").collect()
    }
    per_source: dict[str, list] = {}
    for r in docs:
        per_source.setdefault(r["source"], []).append(r["doc_id"] in vec_ids)
    got = {r["source"]: r for r in q316_embedding_coverage(spark, sf_dir).collect()}
    assert set(got) == set(per_source)
    for s, flags in per_source.items():
        g = got[s]
        assert g["n_docs"] == len(flags)
        assert g["n_embedded"] == sum(flags)
        assert g["coverage_ppm"] == sum(flags) * 1000000 // len(flags)


def test_q317_matches_naive_dominance_scan(spark, sf_dir):
    """Skyline re-derived by the O(n^2) definition: doc i is on the front
    iff no doc j has ppm_j >= ppm_i AND tok_j >= tok_i with one strict."""
    from sparkstreaming_quickstart_spark.queries.wave21 import q317_pareto_front

    rows = [
        r
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
        if r["text"]
    ]
    stats = []
    for r in rows:
        t = r["text"].split(" ")
        stats.append((r["doc_id"], len(set(t)) * 1000000 // len(t), len(t)))
    front = set()
    for i, (di, pi, ti) in enumerate(stats):
        dominated = any(
            (pj >= pi and tj >= ti and (pj > pi or tj > ti))
            for j, (dj, pj, tj) in enumerate(stats)
            if j != i
        )
        if not dominated:
            front.add((di, pi, ti))
    got = {(r["doc_id"], r["ppm"], r["tok"]) for r in q317_pareto_front(spark, sf_dir).collect()}
    assert got == front
    assert front, "fixture has a non-empty skyline"


def test_q318_matches_scalar_vocab_cut(spark, sf_dir):
    """OOV re-derived scalar-side: top-10 vocabulary by (count desc, token
    asc) over the corpus, then per-source instance counts outside it."""
    from collections import Counter

    from sparkstreaming_quickstart_spark.queries.wave21 import q318_oov_rate

    rows = [
        r
        for r in load_table(spark, sf_dir, "documents").select("source", "text").collect()
        if r["text"]
    ]
    corpus = Counter()
    per_source: dict[str, Counter] = {}
    for r in rows:
        toks = r["text"].split(" ")
        corpus.update(toks)
        per_source.setdefault(r["source"], Counter()).update(toks)
    vocab = {t for t, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:10]}
    got = {r["source"]: r for r in q318_oov_rate(spark, sf_dir).collect()}
    assert set(got) == set(per_source)
    for s, cnts in per_source.items():
        n = sum(cnts.values())
        oov = sum(c for t, c in cnts.items() if t not in vocab)
        g = got[s]
        assert g["n_tokens"] == n
        assert g["n_oov"] == oov
        assert g["oov_ppm"] == oov * 1000000 // n
        assert 0 < g["oov_ppm"] < 1000000, "fixture OOV is non-degenerate"
