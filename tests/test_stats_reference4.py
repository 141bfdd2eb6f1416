"""Naive reference implementations, batch 4: the closed-form JSD residual,
the IR evaluation harness, and the as-of join directions vs pandas
merge_asof (the library whose semantics the operators document parity
with).  Each recomputed the straightforward way from raw parquet.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR


def test_jsd_residual_matches_full_vocabulary_sum(spark, sf_dir):
    """q254 folds the absent-token mass into a closed-form residual; the
    reference computes the COMPLETE Jensen-Shannon sum over every corpus
    token (p=0 terms included) per source."""
    from sparkstreaming_quickstart_spark.queries.wave10 import q254_js_divergence

    rows = {r["source"]: r["jsd"] for r in q254_js_divergence(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    d = d[d["text"].str.len() > 0]
    toks = d.assign(t=d["text"].str.split(" ")).explode("t")
    corpus = toks["t"].value_counts()
    ntot = int(corpus.sum())
    for src, grp in toks.groupby("source"):
        sc = grp["t"].value_counts()
        nsrc = int(sc.sum())
        jsd = 0.0
        for t, ccnt in corpus.items():
            p = sc.get(t, 0) / nsrc
            c = ccnt / ntot
            m = (p + c) / 2
            if p > 0:
                jsd += 0.5 * p * math.log2(p / m)
            if c > 0:
                jsd += 0.5 * c * math.log2(c / m)
        assert abs(rows[src] - jsd) < 1e-5, src


def test_ir_eval_matches_pure_python_ranking(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave11 import (
        _IR_K,
        _IR_TERMS,
        q265_ir_eval,
    )

    rows = {r["term"]: r for r in q265_ir_eval(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    d = d[d["text"].str.len() > 0]
    for term in _IR_TERMS:
        tf = d["text"].str.split(" ").apply(lambda ts: ts.count(term))
        hits = pd.DataFrame({"doc_id": d["doc_id"], "tf": tf})
        hits = hits[hits["tf"] >= 1].sort_values(
            ["tf", "doc_id"], ascending=[False, True]
        )
        hits["rnk"] = range(1, len(hits) + 1)
        rel = hits["tf"] >= 2
        n_rel = int(rel.sum())
        r = rows[term]
        assert r["n_retrieved"] == len(hits)
        assert r["n_relevant"] == n_rel
        topk = hits["rnk"] <= _IR_K
        assert abs(r["p_at_k"] - int((rel & topk).sum()) / _IR_K) < 1e-6
        first = int(hits.loc[rel, "rnk"].min())
        assert abs(r["reciprocal_rank"] - 1.0 / first) < 1e-6
        dcg = sum(
            1.0 / math.log2(rk + 1.0)
            for rk, is_rel in zip(hits["rnk"], rel)
            if is_rel and rk <= _IR_K
        )
        idcg = sum(1.0 / math.log2(i + 1.0) for i in range(1, min(n_rel, _IR_K) + 1))
        assert abs(r["ndcg_at_k"] - dcg / idcg) < 1e-5


def _errors_clicks():
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    errors = (
        ev[ev["event_type"] == "error"][["event_id", "user_id", "ts"]]
        .sort_values("ts", kind="mergesort")
        .reset_index(drop=True)
    )
    clicks = (
        ev[ev["event_type"] == "click"][["event_id", "user_id", "ts"]]
        .rename(columns={"event_id": "click_id"})
        .sort_values("ts", kind="mergesort")
        .reset_index(drop=True)
    )
    return errors, clicks


def test_asof_forward_matches_pandas_merge_asof(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave16 import q284_asof_forward

    rows = {
        r["event_id"]: r["next_click_event_id"]
        for r in q284_asof_forward(spark, sf_dir).collect()
    }
    errors, clicks = _errors_clicks()
    ref = pd.merge_asof(
        errors, clicks, on="ts", by="user_id", direction="forward"
    )
    assert len(rows) == len(ref)
    for _, r in ref.iterrows():
        want = None if pd.isna(r["click_id"]) else int(r["click_id"])
        assert rows[r["event_id"]] == want, r["event_id"]


def test_asof_nearest_matches_pandas_merge_asof(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave16 import q285_asof_nearest

    rows = {
        r["event_id"]: r["nearest_click_event_id"]
        for r in q285_asof_nearest(spark, sf_dir).collect()
    }
    errors, clicks = _errors_clicks()
    ref = pd.merge_asof(
        errors, clicks, on="ts", by="user_id", direction="nearest"
    )
    assert len(rows) == len(ref)
    for _, r in ref.iterrows():
        want = None if pd.isna(r["click_id"]) else int(r["click_id"])
        assert rows[r["event_id"]] == want, r["event_id"]


if __name__ == "__main__":  # pragma: no cover
    import pytest

    pytest.main([__file__, "-q"])
