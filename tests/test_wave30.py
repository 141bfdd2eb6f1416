"""Wave-30 reference tests: Adamic-Adar scores against a scalar wedge
enumeration, and embedding outlier counts against numpy."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from test_wave23 import _exact_dup_pairs


def test_adamic_adar_matches_python_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave30 import q349_adamic_adar

    pairs = set(_exact_dup_pairs(sf_dir))
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {}
    nodes = sorted(adj)
    for z, nb in adj.items():
        if len(adj[z]) < 2:
            continue
        for a in nb:
            for b in nb:
                if a < b:
                    key = (a, b)
                    cn, s = expected.get(key, (0, 0.0))
                    expected[key] = (cn + 1, s + 1.0 / math.log(len(adj[z])))
    rows = q349_adamic_adar(spark, sf_dir).collect()
    got = {(r["d1"], r["d2"]): r for r in rows}
    assert set(got) == set(expected)
    for key, (cn, s) in expected.items():
        r = got[key]
        assert r["common_neighbors"] == cn
        assert r["adamic_adar"] == pytest.approx(round(s, 6), abs=1e-9)
        assert r["already_linked"] == (key in pairs)
    # the audit queue (unlinked high scorers) is the point -- it must exist
    # or every scored pair is already linked, either is fine; just exercise
    assert rows


def test_embedding_outliers_matches_numpy(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave30 import (
        _OUT_Z,
        q350_embedding_outliers,
    )

    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    rows = {r["label"]: r for r in q350_embedding_outliers(spark, sf_dir).collect()}
    assert set(rows) == set(e["label"].unique())
    for label, grp in e.groupby("label"):
        m = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
        c = m.mean(axis=0)
        dist = np.round(np.sqrt(((m - c) ** 2).sum(axis=1)), 9)
        mu = dist.mean()
        sd = dist.std(ddof=1)
        z = np.round((dist - mu) / sd, 9) if sd else np.zeros_like(dist)
        r = rows[label]
        assert r["n_vectors"] == len(m)
        assert r["n_outliers"] == int((z > _OUT_Z).sum())
        assert r["max_dist"] == pytest.approx(dist.max(), abs=2e-6)
        assert r["mean_dist"] == pytest.approx(mu, abs=2e-6)


def test_minhash_union_matches_hashlib_replay(spark, sf_dir):
    """Signatures, estimates, and exact Jaccards recomputed independently
    via hashlib + python sets; also pins the MERGE law the query is about:
    the signature of a union equals the elementwise min of signatures."""
    import hashlib

    from sparkstreaming_quickstart_spark.queries.wave31 import (
        _MH_K,
        _MH_SALT,
        q351_minhash_union_estimate,
    )

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    d = d[d["text"].str.len() > 0]
    vocab: dict[str, set[str]] = {}
    for r in d.itertuples():
        vocab.setdefault(r.source, set()).update(r.text.split(" "))

    def h(i, token):
        return int(hashlib.md5(f"{_MH_SALT}{i}|{token}".encode()).hexdigest()[:15], 16)

    sig = {
        s: [min(h(i, t) for t in toks) for i in range(_MH_K)]
        for s, toks in vocab.items()
    }
    rows = q351_minhash_union_estimate(spark, sf_dir).collect()
    srcs = sorted(vocab)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        a, b = vocab[r["s1"]], vocab[r["s2"]]
        exact = len(a & b) / len(a | b)
        est = sum(
            1 for x, y in zip(sig[r["s1"]], sig[r["s2"]]) if x == y
        ) / _MH_K
        assert r["jaccard_exact"] == pytest.approx(round(exact, 6), abs=1e-9)
        assert r["jaccard_est"] == pytest.approx(round(est, 6), abs=1e-9)
        assert r["abs_error"] == pytest.approx(
            round(abs(round(est, 6) - exact), 6), abs=1e-9
        )
    # merge law: sig(A | B) == elementwise min(sig(A), sig(B))
    s1, s2 = srcs[0], srcs[1]
    union_sig = [
        min(h(i, t) for t in (vocab[s1] | vocab[s2])) for i in range(_MH_K)
    ]
    assert union_sig == [min(x, y) for x, y in zip(sig[s1], sig[s2])]


def test_dup_cluster_purity_matches_python_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave32 import (
        q352_dup_cluster_purity,
    )

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    src = dict(zip(d["doc_id"], d["source"]))
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in _exact_dup_pairs(sf_dir):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[int, list[int]] = {}
    for n in parent:
        clusters.setdefault(find(n), []).append(n)
    rows = {r["cluster_id"]: r for r in q352_dup_cluster_purity(spark, sf_dir).collect()}
    assert set(rows) == {min(m) for m in clusters.values()}
    for members in clusters.values():
        counts: dict[str, int] = {}
        for m in members:
            counts[src[m]] = counts.get(src[m], 0) + 1
        n = len(members)
        purity = max(counts.values()) / n
        ent = sum(-(c / n) * math.log(c / n) for c in counts.values())
        r = rows[min(members)]
        assert r["n_members"] == n
        assert r["n_sources"] == len(counts)
        assert r["purity"] == pytest.approx(round(purity, 6), abs=1e-9)
        assert r["source_entropy"] == pytest.approx(round(ent, 6) + 0.0, abs=1e-9)
