"""Wave-23 reference tests: pure-Python / numpy recomputation of the
dup-graph micro-structure (clustering coefficient, degree assortativity),
the effect-size and inequality statistics, hash-replayed subsample CI and
weighted reservoir sampling, and the brute-force mutual-kNN histogram.

Each reference is computed independently of both engines (hashlib for the
md5-derived uniforms, python sets for the Jaccard graph, python sorting for
the kNN ranking) so a shared-spelling bug cannot self-confirm."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest


# ---------------------------------------------------------------------------
# exact near-dup graph reference (3-shingle Jaccard >= 0.7, d1 < d2)
# ---------------------------------------------------------------------------


def _exact_dup_pairs(sf_dir: str) -> list[tuple[int, int]]:
    df = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sh: dict[int, set[str]] = {}
    for r in df.itertuples():
        toks = r.text.split(" ")
        s = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        if s:
            sh[r.doc_id] = s
    inv: dict[str, list[int]] = {}
    for d, s in sh.items():
        for g in s:
            inv.setdefault(g, []).append(d)
    cand = set()
    for docs in inv.values():
        docs = sorted(docs)
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                cand.add((docs[i], docs[j]))
    return sorted(
        (a, b)
        for (a, b) in cand
        if len(sh[a] & sh[b]) / len(sh[a] | sh[b]) >= 0.7
    )


def test_dup_graph_clustering_matches_python_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave23 import (
        q322_dup_graph_clustering,
    )

    pairs = _exact_dup_pairs(sf_dir)
    assert pairs, "fixture must contain near-dup pairs"
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {}
    for n, nb in adj.items():
        d = len(nb)
        t = sum(1 for u in nb for v in nb if u < v and v in adj.get(u, ()))
        c = round(2.0 * t / (d * (d - 1)), 6) if d >= 2 else 0.0
        expected[n] = (d, t, c + 0.0)
    rows = q322_dup_graph_clustering(spark, sf_dir).collect()
    got = {r["doc_id"]: (r["degree"], r["n_triangles"], r["clustering"]) for r in rows}
    assert got == expected


def test_degree_assortativity_matches_python_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave23 import (
        q323_degree_assortativity,
    )

    pairs = _exact_dup_pairs(sf_dir)
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in pairs:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    x, y = np.array(xs, dtype=np.int64), np.array(ys, dtype=np.int64)
    nn = len(x)
    num = nn * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    den = math.sqrt(nn * int((x * x).sum()) - int(x.sum()) ** 2) * math.sqrt(
        nn * int((y * y).sum()) - int(y.sum()) ** 2
    )
    r = q323_degree_assortativity(spark, sf_dir).collect()[0]
    assert r["n_edges"] == len(pairs)
    assert r["n_nodes"] == len(deg)
    if den == 0:
        assert r["assortativity"] is None
    else:
        assert r["assortativity"] == pytest.approx(num / den, abs=2e-6)


# ---------------------------------------------------------------------------
# statistics references
# ---------------------------------------------------------------------------


def test_cramers_v_matches_numpy(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave23 import q324_cramers_v

    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    band = np.minimum(np.floor(e["value"].to_numpy() / 50.0).astype(np.int64), 3)
    ct = pd.crosstab(e["event_type"], band)
    o = ct.to_numpy().astype(np.float64)
    exp = np.outer(o.sum(axis=1), o.sum(axis=0)) / o.sum()
    mask = exp > 0
    chi2 = (((o - exp) ** 2)[mask] / exp[mask]).sum()
    n = o.sum()
    v = math.sqrt(chi2 / (n * min(o.shape[0] - 1, o.shape[1] - 1)))
    r = q324_cramers_v(spark, sf_dir).collect()[0]
    assert r["n"] == int(n)
    assert r["n_types"] == o.shape[0]
    assert r["n_bands"] == o.shape[1]
    assert r["chi2"] == pytest.approx(chi2, abs=2e-5)
    assert r["cramers_v"] == pytest.approx(v, abs=2e-6)


def test_cohens_d_matches_numpy(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave23 import q325_cohens_d

    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    a = e[e["event_type"] == "purchase"]["value"].to_numpy()
    b = e[e["event_type"] == "view"]["value"].to_numpy()
    diff = a.mean() - b.mean()
    sp = math.sqrt(
        (a.var(ddof=0) * len(a) + b.var(ddof=0) * len(b)) / (len(a) + len(b) - 2)
    )
    j = 1.0 - 3.0 / (4.0 * (len(a) + len(b)) - 9.0)
    r = q325_cohens_d(spark, sf_dir).collect()[0]
    assert (r["n1"], r["n2"]) == (len(a), len(b))
    assert r["mean_diff"] == pytest.approx(diff, abs=2e-6)
    assert r["pooled_sd"] == pytest.approx(sp, abs=2e-6)
    assert r["cohens_d"] == pytest.approx(diff / sp, abs=2e-6)
    assert r["hedges_g"] == pytest.approx(j * diff / sp, abs=2e-6)


def test_theil_index_matches_numpy(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave23 import q326_theil_index

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    d = d[d["text"].str.len() > 0]
    d["x"] = d["text"].str.split(" ").str.len().astype(float)
    rows = q326_theil_index(spark, sf_dir).collect()
    assert len(rows) == d["source"].nunique()
    for r in rows:
        x = d[d["source"] == r["source"]]["x"].to_numpy()
        mu = x.mean()
        t = ((x / mu) * np.log(x / mu)).mean()
        assert r["n_docs"] == len(x)
        assert r["mean_tokens"] == pytest.approx(mu, abs=2e-6)
        assert r["theil"] == pytest.approx(t, abs=2e-6)
        assert r["theil"] >= 0.0  # Theil is non-negative


def test_perplexity_tertiles_invariants(spark, sf_dir):
    """Tertile sizes within each lang differ by at most one (NTILE
    contract), every >=2-token doc lands in exactly one bucket, and token
    mass is conserved."""
    from sparkstreaming_quickstart_spark.queries.wave23 import (
        q327_perplexity_tertiles,
    )

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = d["text"].str.split(" ").str.len()
    eligible = d[toks >= 2].assign(n=toks[toks >= 2])
    rows = q327_perplexity_tertiles(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == set(eligible["lang"].unique())
    for lang, rs in by_lang.items():
        sizes = [r["n_docs"] for r in rs]
        assert max(sizes) - min(sizes) <= 1
        assert sum(sizes) == (eligible["lang"] == lang).sum()
        assert sum(r["tokens"] for r in rs) == int(
            eligible[eligible["lang"] == lang]["n"].sum()
        )
        # head tertile must not have higher mean entropy than the tail
        ce = {r["tertile"]: r["avg_cross_entropy"] for r in rs}
        assert ce[1] <= ce[max(ce)]


# ---------------------------------------------------------------------------
# hash-replay references
# ---------------------------------------------------------------------------


def _md5_number_lower(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def test_subsample_ci_matches_hashlib_replay(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave23 import (
        _CI_REPS,
        _CI_SALT,
        q328_subsample_ci,
    )

    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    reps = []
    for b in range(_CI_REPS):
        keep = e["event_id"].map(
            lambda i: _md5_number_lower(f"{_CI_SALT}{b}|{i}") % 2 == 0
        )
        reps.append(round(float(e[keep]["value"].mean()), 9))
    rm = np.array(reps)
    sd = math.sqrt(
        (float((rm * rm).sum()) - _CI_REPS * rm.mean() ** 2) / (_CI_REPS - 1)
    )
    r = q328_subsample_ci(spark, sf_dir).collect()[0]
    assert r["n_reps"] == _CI_REPS
    assert r["full_mean"] == pytest.approx(float(e["value"].mean()), abs=2e-6)
    assert r["rep_mean_avg"] == pytest.approx(rm.mean(), abs=2e-6)
    assert r["rep_mean_sd"] == pytest.approx(sd, abs=2e-6)
    assert r["ci_lo"] == pytest.approx(rm.min(), abs=2e-6)
    assert r["ci_hi"] == pytest.approx(rm.max(), abs=2e-6)
    assert r["ci_lo"] <= r["rep_mean_avg"] <= r["ci_hi"]


def test_weighted_reservoir_matches_hashlib_replay(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave23 import (
        _WRS_K,
        _WRS_SALT,
        q330_weighted_reservoir_sample,
    )

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    d = d[d["text"].str.len() > 0]
    expected: dict[str, list[int]] = {}
    for src, grp in d.groupby("source"):
        keyed = []
        for r in grp.itertuples():
            u = (
                int(hashlib.md5(f"{_WRS_SALT}{r.doc_id}".encode()).hexdigest()[:8], 16)
                + 0.5
            ) / 2**32
            wt = len(r.text.split(" "))
            keyed.append((round(math.log(u) / wt, 9), r.doc_id, wt))
        keyed.sort(key=lambda t: (-t[0], t[1]))
        expected[src] = [(doc, wt, k) for k, doc, wt in keyed[:_WRS_K]]
    rows = q330_weighted_reservoir_sample(spark, sf_dir).collect()
    got: dict[str, list] = {}
    for r in rows:
        got.setdefault(r["source"], []).append((r["doc_id"], r["weight"], r["key"]))
        assert r["rank"] == len(got[r["source"]])
    assert got == expected


# ---------------------------------------------------------------------------
# mutual-kNN brute-force reference
# ---------------------------------------------------------------------------


def test_mutual_knn_matches_bruteforce(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave23 import (
        _KNN_K,
        q329_mutual_knn_graph,
    )

    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = e["vec_id"].to_numpy()
    mat = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    keep = nrm > 0
    ids, mat, nrm = ids[keep], mat[keep], nrm[keep]
    # dot/(na*nb) on raw vectors -- the oracle's association order, which
    # the Spark kernel now matches (round-9 advice fix)
    sims = np.round((mat @ mat.T) / (nrm[:, None] * nrm[None, :]), 9)
    knn: dict[int, set[int]] = {}
    for a, qid in enumerate(ids):
        ranked = sorted(
            ((float(-sims[a, b]), int(ids[b])) for b in range(len(ids)) if b != a)
        )
        knn[int(qid)] = {j for _, j in ranked[:_KNN_K]}
    hist: dict[int, int] = {}
    for i, nb in knn.items():
        md = sum(1 for j in nb if i in knn[j])
        hist[md] = hist.get(md, 0) + 1
    rows = q329_mutual_knn_graph(spark, sf_dir).collect()
    assert {r["mutual_degree"]: r["n_nodes"] for r in rows} == hist
    assert sum(hist.values()) == len(ids)
