"""Wave-27 reference tests: AUC from the O(n^2) pairwise definition (the
probabilistic reading, computed literally), PR-AUC/best-F1 from a scalar
sweep, and the Simpson-reversal audit against numpy correlations."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


def test_auc_matches_pairwise_definition(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave27 import q342_auc_roc

    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    pos = np.sort(e[e["event_type"] == "purchase"]["value"].to_numpy())
    neg = np.sort(e[e["event_type"] != "purchase"]["value"].to_numpy())
    # P(pos > neg) + 0.5 P(pos == neg), counted via searchsorted
    wins = np.searchsorted(neg, pos, side="left").sum()
    ties = (
        np.searchsorted(neg, pos, side="right")
        - np.searchsorted(neg, pos, side="left")
    ).sum()
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    r = q342_auc_roc(spark, sf_dir).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    assert r["auc"] == pytest.approx(auc, abs=2e-6)


def test_pr_curve_matches_scalar_sweep(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave27 import (
        q343_precision_recall_curve,
    )

    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    df = (
        e.assign(y=(e["event_type"] == "purchase").astype(int))
        .groupby("value")
        .agg(cp=("y", "sum"), m=("y", "count"))
        .sort_index(ascending=False)
    )
    np_pos = int(df["cp"].sum())
    tp = df["cp"].cumsum().to_numpy()
    pp = df["m"].cumsum().to_numpy()
    prec = tp / pp
    rec = tp / np_pos
    rec_prev = np.concatenate([[0.0], rec[:-1]])
    pr_auc = float(((rec - rec_prev) * prec).sum())
    f1 = np.round(
        np.divide(
            2 * prec * rec,
            prec + rec,
            out=np.full_like(prec, np.nan),
            where=(prec + rec) != 0,
        ),
        9,
    )
    best = np.nanmax(f1)
    thresholds = df.index.to_numpy()
    best_threshold = float(thresholds[f1 == best].min())
    r = q343_precision_recall_curve(spark, sf_dir).collect()[0]
    assert r["n_pos"] == np_pos
    assert r["pr_auc"] == pytest.approx(pr_auc, abs=2e-6)
    assert r["best_f1_r9"] == pytest.approx(best, abs=1e-9)
    assert r["best_f1_threshold"] == best_threshold
    assert 0.0 <= r["pr_auc"] <= 1.0


def test_aggregation_reversal_matches_numpy(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave27 import (
        q344_aggregation_reversal,
    )

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    d = d[d["text"].str.len() > 0]
    toks = d["text"].str.split(" ")
    d = d.assign(
        x=toks.str.len().astype(float),
        y=toks.map(lambda t: len(set(t)) / len(t)),
    )

    def corr(sub):
        n = len(sub)
        x, y = sub["x"].to_numpy(), sub["y"].to_numpy()
        num = n * (x * y).sum() - x.sum() * y.sum()
        den = math.sqrt(
            (n * (x * x).sum() - x.sum() ** 2) * (n * (y * y).sum() - y.sum() ** 2)
        )
        return round(num / den, 6) if den else None

    pooled = corr(d)
    rows = {r["grp"]: r for r in q344_aggregation_reversal(spark, sf_dir).collect()}
    assert rows["ALL"]["corr"] == pytest.approx(pooled, abs=2e-6)
    assert rows["ALL"]["sign_reversed"] is False
    for lang, sub in d.groupby("lang"):
        c = corr(sub)
        r = rows[lang]
        assert r["n"] == len(sub)
        assert r["corr"] == pytest.approx(c, abs=2e-6)
        assert r["sign_reversed"] == (np.sign(r["corr"]) != np.sign(rows["ALL"]["corr"]))


def test_forecast_mase_matches_pandas_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave27 import q345_forecast_mase

    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e["day"] = e["ts"].dt.normalize()
    rows = {r["event_type"]: r for r in q345_forecast_mase(spark, sf_dir).collect()}
    for et, grp in e.groupby("event_type"):
        c = grp.groupby("day").size().sort_index()
        d1 = (c - c.shift(1)).abs().dropna()
        d7 = (c - c.shift(7)).abs().dropna()
        r = rows[et]
        assert r["n_days"] == len(c)
        assert r["mae_naive1"] == pytest.approx(d1.mean(), abs=2e-6)
        assert r["mae_naive7"] == pytest.approx(d7.mean(), abs=2e-6)
        assert r["mase_7v1"] == pytest.approx(d7.mean() / d1.mean(), abs=2e-6)
