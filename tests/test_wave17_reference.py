"""Independent reference implementations for the wave-17 statistics.

The DuckDB oracles replay the same formulas the Spark plans compute, so a
formula bug shared by both sides would pass the value-hash gate.  These
tests recompute each statistic from the raw parquet with numpy/pandas --
a third, structurally different implementation -- and compare.  (The same
defense that caught the q259 quantile-normalization bug in round 3.)
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


def _read(table: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/{table}.parquet")


def test_bh_fdr_matches_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave17 import q286_fdr_bh_correction

    rows = q286_fdr_bh_correction(spark, sf_dir).collect()
    ev = _read("events")
    cents = ev["value"].mul(100).round().astype("int64")
    ev = ev.assign(c=cents)
    g = ev.groupby("event_type")["c"].agg(["count", "sum", lambda s: (s * s).sum()])
    g.columns = ["n", "s", "ss"]
    tn, ts, tss, m = g["n"].sum(), g["s"].sum(), g["ss"].sum(), len(g)
    ref = {}
    for et, r in g.iterrows():
        n, s_, ss = int(r["n"]), int(r["s"]), int(r["ss"])
        rn = tn - n
        mg, mr = s_ / n, (ts - s_) / rn
        vg = (ss - float(s_) * s_ / n) / (n - 1)
        vr = ((tss - ss) - float(ts - s_) * (ts - s_) / rn) / (rn - 1)
        z = (mg - mr) / math.sqrt(vg / n + vr / rn)
        p = min(1.0, 2.0 * math.exp(-0.717 * abs(z) - 0.416 * z * z))
        ref[et] = (z, p)
    # reference BH step-up
    order = sorted(ref, key=lambda e: (ref[e][1], e))
    raw = [ref[e][1] * m / (i + 1) for i, e in enumerate(order)]
    adj = list(raw)
    for i in range(len(adj) - 2, -1, -1):
        adj[i] = min(adj[i], adj[i + 1])
    qref = {e: min(1.0, a) for e, a in zip(order, adj)}
    for r in rows:
        z, p = ref[r["event_type"]]
        assert abs(r["z_stat"] - z) < 1e-5
        assert abs(r["p_value"] - p) < 1e-5
        assert abs(r["q_bh"] - qref[r["event_type"]]) < 1e-5


def test_cluster_quality_matches_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave17 import q287_cluster_quality

    rows = {r["label"]: r for r in q287_cluster_quality(spark, sf_dir).collect()}
    emb = _read("embeddings")
    X = np.stack(emb["embedding"].to_numpy()).astype("float64")
    labels = emb["label"].to_numpy()
    uniq = np.unique(labels)
    cent = {l: X[labels == l].mean(axis=0) for l in uniq}
    C = np.stack([cent[l] for l in uniq])
    D = np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))  # N x k
    own_idx = np.searchsorted(uniq, labels)
    a = D[np.arange(len(X)), own_idx]
    Dm = D.copy()
    Dm[np.arange(len(X)), own_idx] = np.inf
    b = Dm.min(axis=1)
    sil = (b - a) / np.maximum(a, b)
    for li, l in enumerate(uniq):
        mask = labels == l
        assert abs(rows[l]["avg_silhouette"] - sil[mask].mean()) < 1e-5
        assert abs(rows[l]["scatter"] - a[mask].mean()) < 1e-5
        S = {m: a[labels == m].mean() for m in uniq}
        M = np.sqrt(((C[li] - C) ** 2).sum(axis=1))
        db = max(
            (S[l] + S[m]) / M[mi] for mi, m in enumerate(uniq) if m != l
        )
        assert abs(rows[l]["db_component"] - db) < 1e-5


def test_acf_matches_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave17 import q290_acf_lags

    rows = q290_acf_lags(spark, sf_dir).collect()
    ev = _read("events")
    ev = ev.assign(
        c=ev["value"].mul(100).round().astype("int64"),
        minute=ev["ts"].dt.floor("min"),
    )
    got = {(r["event_type"], r["lag"]): r for r in rows}
    for et, grp in ev.groupby("event_type"):
        series = grp.groupby("minute")["c"].mean().sort_index().to_numpy()
        for lag in (1, 2, 3):
            x, y = series[lag:], series[:-lag]
            r = got[(et, lag)]
            assert r["n_pairs"] == len(x)
            ref = np.corrcoef(x, y)[0, 1]
            assert abs(r["acf"] - ref) < 1e-5, (et, lag)


def test_dsir_matches_reference(spark, sf_dir):
    import hashlib

    from sparkstreaming_quickstart_spark.queries.wave17 import (
        _DSIR_B,
        q292_dsir_importance,
    )

    rows = {(r["lang"], r["source"]): r for r in q292_dsir_importance(spark, sf_dir).collect()}
    docs = _read("documents")
    docs = docs[docs["n_chars"] > 0]

    def bucket(gram: str) -> int:
        h = hashlib.md5(gram.encode()).digest()
        return int.from_bytes(h[8:16], "little") % _DSIR_B

    cs = np.zeros(_DSIR_B, dtype="int64")
    ct = np.zeros(_DSIR_B, dtype="int64")
    per_doc = []
    for _, d in docs.iterrows():
        toks = d["text"].split(" ")
        bs = [bucket(f"{a} {b}") for a, b in zip(toks, toks[1:])]
        if not bs:
            continue
        np.add.at(cs, bs, 1)
        if d["lang"] == "en":
            np.add.at(ct, bs, 1)
        per_doc.append((d["lang"], d["source"], bs))
    lr = np.log((ct + 1) / (ct.sum() + _DSIR_B)) - np.log((cs + 1) / (cs.sum() + _DSIR_B))
    agg: dict[tuple, list] = {}
    for lang, src, bs in per_doc:
        lw = lr[bs].sum() / len(bs)
        agg.setdefault((lang, src), []).append(lw)
    assert set(agg) == set(rows)
    for key, lws in agg.items():
        r = rows[key]
        assert r["n_docs"] == len(lws)
        assert abs(r["avg_lw_per_gram"] - np.mean(lws)) < 1e-5, key


def test_kcenter_matches_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave17 import (
        _KCENTER_K,
        q293_kcenter_coreset,
    )

    rows = q293_kcenter_coreset(spark, sf_dir).orderBy("step").collect()
    emb = _read("embeddings").sort_values("vec_id")
    X = np.stack(emb["embedding"].to_numpy()).astype("float64")
    ids = emb["vec_id"].to_numpy()
    sel = [int(ids.min())]
    steps = [(0, sel[0], None)]
    for r in range(1, _KCENTER_K):
        C = X[np.isin(ids, sel)]
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).min(axis=1)
        # argmax with lowest-id tie-break: ids are sorted ascending, so the
        # first argmax occurrence is the lowest id
        best = int(np.argmax(d2))
        steps.append((r, int(ids[best]), math.sqrt(d2[best])))
        sel.append(int(ids[best]))
    for got, ref in zip(rows, steps):
        assert got["step"] == ref[0]
        assert got["vec_id"] == ref[1], f"step {ref[0]} picked a different center"
        if ref[2] is not None:
            assert abs(got["radius"] - ref[2]) < 1e-5


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])
