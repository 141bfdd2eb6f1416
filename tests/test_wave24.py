"""Wave-24 reference tests: independent pure-Python recomputation of the
cross-language near-dup matrix, vocabulary overlap, RRF fusion,
Brown-Forsythe and Kruskal-Wallis statistics, and the greedy MMR
trajectory."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from test_wave23 import _exact_dup_pairs


def test_cross_lang_neardups_matches_python_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave24 import (
        q331_cross_lang_neardups,
    )

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    lang = dict(zip(d["doc_id"], d["lang"]))
    expected: dict[tuple[str, str], int] = {}
    for a, b in _exact_dup_pairs(sf_dir):
        key = tuple(sorted((lang[a], lang[b])))
        expected[key] = expected.get(key, 0) + 1
    rows = q331_cross_lang_neardups(spark, sf_dir).collect()
    got = {(r["lang_a"], r["lang_b"]): r["n_pairs"] for r in rows}
    assert got == expected
    for r in rows:
        assert r["is_cross_lang"] == (r["lang_a"] != r["lang_b"])
    assert any(r["is_cross_lang"] for r in rows), "fixture has cross-lang dups"


def test_vocab_overlap_matches_python_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave24 import (
        _VOCAB_K,
        q332_vocab_overlap_matrix,
    )

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    d = d[d["text"].str.len() > 0]
    tops: dict[str, set[str]] = {}
    for src, grp in d.groupby("source"):
        counts: dict[str, int] = {}
        for t in grp["text"]:
            for tok in t.split(" "):
                counts[tok] = counts.get(tok, 0) + 1
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        tops[src] = {tok for tok, _ in ranked[:_VOCAB_K]}
    rows = q332_vocab_overlap_matrix(spark, sf_dir).collect()
    srcs = sorted(tops)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        a, b = tops[r["s1"]], tops[r["s2"]]
        common = len(a & b)
        assert r["n_common"] == common
        assert r["vocab_jaccard"] == pytest.approx(
            round(common / len(a | b), 6), abs=1e-9
        )


def test_rrf_matches_python_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave24 import (
        _RRF_C,
        _RRF_TERMS,
        _RRF_TOPN,
        q333_reciprocal_rank_fusion,
    )
    from sparkstreaming_quickstart_spark.queries.wave7 import _BM25_B, _BM25_K1

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    d = d[d["text"].str.len() > 0]
    toks = {r.doc_id: r.text.split(" ") for r in d.itertuples()}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    tf: dict[int, dict[str, int]] = {}
    for did, ts in toks.items():
        c = {t: ts.count(t) for t in _RRF_TERMS if t in ts}
        if c:
            tf[did] = c
    df = {t: sum(1 for c in tf.values() if t in c) for t in _RRF_TERMS}
    bm = {}
    for did, c in tf.items():
        dl = len(toks[did])
        bm[did] = sum(
            math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            * n_t
            * (_BM25_K1 + 1.0)
            / (n_t + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl))
            for t, n_t in c.items()
        )
    bm_rank = {
        did: i + 1
        for i, (did, _) in enumerate(
            sorted(bm.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:_RRF_TOPN]
        )
    }
    dens = {did: sum(c.values()) / len(toks[did]) for did, c in tf.items()}
    dens_rank = {
        did: i + 1
        for i, (did, _) in enumerate(
            sorted(dens.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:_RRF_TOPN]
        )
    }
    fused = {
        did: (1.0 / (_RRF_C + bm_rank[did]) if did in bm_rank else 0.0)
        + (1.0 / (_RRF_C + dens_rank[did]) if did in dens_rank else 0.0)
        for did in set(bm_rank) | set(dens_rank)
    }
    top10 = sorted(fused.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:10]
    rows = q333_reciprocal_rank_fusion(spark, sf_dir).collect()
    assert [(r["doc_id"]) for r in rows] == [did for did, _ in top10]
    for r, (did, score) in zip(rows, top10):
        assert r["rrf_score"] == pytest.approx(round(score, 9), abs=1e-12)
        assert r["rank_bm25"] == bm_rank.get(did)
        assert r["rank_density"] == dens_rank.get(did)


def test_brown_forsythe_matches_numpy(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave24 import q334_brown_forsythe

    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    groups = [g["value"].to_numpy() for _, g in e.groupby("event_type")]
    k = len(groups)
    nn = sum(len(g) for g in groups)
    # percentile_disc median: smallest value with cumulative fraction >= 0.5
    zs = []
    for g in groups:
        s = np.sort(g)
        med = s[math.ceil(0.5 * len(s)) - 1]
        zs.append(np.abs(g - med))
    zbar = [z.mean() for z in zs]
    zgrand = sum(z.sum() for z in zs) / nn
    ssb = sum(len(z) * (m - zgrand) ** 2 for z, m in zip(zs, zbar))
    ssw = sum(((z - m) ** 2).sum() for z, m in zip(zs, zbar))
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    r = q334_brown_forsythe(spark, sf_dir).collect()[0]
    assert (r["n"], r["k"]) == (nn, k)
    assert r["f_stat"] == pytest.approx(f, abs=2e-5)


def test_kruskal_wallis_matches_python_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave24 import q335_kruskal_wallis

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    vals = d["n_chars"].to_numpy()
    langs = d["lang"].to_numpy()
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(len(vals), dtype=np.float64)
    sv = vals[order]
    i = 0
    tie_sum = 0.0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        avg = (i + 1 + j) / 2.0  # average of ranks i+1 .. j
        ranks[order[i:j]] = avg
        t = j - i
        tie_sum += t**3 - t
        i = j
    nn = len(vals)
    h = 0.0
    for lang in np.unique(langs):
        rl = ranks[langs == lang]
        h += rl.sum() ** 2 / len(rl)
    h = 12.0 / (nn * (nn + 1.0)) * h - 3.0 * (nn + 1.0)
    hc = h / (1.0 - tie_sum / (nn**3 - nn))
    r = q335_kruskal_wallis(spark, sf_dir).collect()[0]
    assert (r["n"], r["k"]) == (nn, len(np.unique(langs)))
    assert r["h"] == pytest.approx(h, abs=2e-5)
    assert r["h_tie_corrected"] == pytest.approx(hc, abs=2e-5)


def test_mmr_matches_numpy_greedy(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave24 import (
        _MMR_CANDS,
        _MMR_K,
        _MMR_LAMBDA,
        _MMR_QUERY_ID,
        q336_mmr_rerank,
    )

    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = e["vec_id"].to_numpy()
    mat = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    keep = nrm > 0
    ids, mat, nrm = ids[keep], mat[keep], nrm[keep]
    qi = int(np.where(ids == _MMR_QUERY_ID)[0][0])
    rel = np.round(
        (mat @ mat[qi]) / (nrm * nrm[qi]), 9
    )
    cand_idx = sorted(
        (i for i in range(len(ids)) if ids[i] != _MMR_QUERY_ID),
        key=lambda i: (-rel[i], ids[i]),
    )[:_MMR_CANDS]
    sims = {
        (int(ids[i]), int(ids[j])): round(
            float(mat[i] @ mat[j] / (nrm[i] * nrm[j])), 9
        )
        for i in cand_idx
        for j in cand_idx
        if i != j
    }
    cands = {int(ids[i]): float(rel[i]) for i in cand_idx}
    lam, om = _MMR_LAMBDA, round(1.0 - _MMR_LAMBDA, 12)
    selected: list[int] = []
    expected = []
    for rnk in range(1, _MMR_K + 1):
        best = None
        for v, rl in cands.items():
            if v in selected:
                continue
            ms = max((sims[(v, s)] for s in selected), default=0.0)
            score = round(lam * rl - om * ms, 9)
            if best is None or (-score, v) < (-best[1], best[0]):
                best = (v, score, rl)
        expected.append((rnk, best[0], best[2], best[1]))
        selected.append(best[0])
    rows = q336_mmr_rerank(spark, sf_dir).collect()
    got = [(r["rank"], r["vec_id"], r["relevance"], r["mmr_score"]) for r in rows]
    for g, x in zip(got, expected):
        assert g[:2] == x[:2]
        assert g[2] == pytest.approx(x[2], abs=1e-9)
        assert g[3] == pytest.approx(x[3], abs=1e-9)
