"""Independent reference implementations for the histogram-derived rank
statistics and the survival estimator (extends the wave-17 reference suite
backward to the most intricate pre-existing queries).

q279/q280 never rank or pair rows -- concordance and average ranks derive
from 2D/marginal histograms; q237 computes the product-limit estimator as
exp(cumsum(ln)).  These tests recompute each from raw parquet the naive way
(explicit pairs, pandas midranks, sequential product) and compare, so a
histogram-algebra bug shared with the mirrored DuckDB oracle can't hide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR


def _docs_xy() -> pd.DataFrame:
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    d = d[d["text"].str.len() > 0]
    return pd.DataFrame(
        {"x": d["n_chars"].to_numpy(), "y": d["text"].str.split(" ").str.len()}
    )


def test_kendall_tau_matches_brute_force(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave15 import q279_kendall_tau

    row = q279_kendall_tau(spark, sf_dir).collect()[0]
    b = _docs_xy()
    x, y = b["x"].to_numpy(), b["y"].to_numpy()
    n = len(x)
    sx = np.sign(x[:, None] - x[None, :])
    sy = np.sign(y[:, None] - y[None, :])
    iu = np.triu_indices(n, 1)
    prod = sx[iu] * sy[iu]
    c, d = int((prod > 0).sum()), int((prod < 0).sum())
    assert row["n"] == n
    assert row["concordant"] == c
    assert row["discordant"] == d
    n0 = n * (n - 1) / 2
    tx = sum(m * (m - 1) / 2 for m in pd.Series(x).value_counts())
    ty = sum(m * (m - 1) / 2 for m in pd.Series(y).value_counts())
    ref = (c - d) / np.sqrt((n0 - tx) * (n0 - ty))
    assert abs(row["tau_b"] - ref) < 1e-5


def test_spearman_rho_matches_pandas_midranks(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave15 import q280_spearman_rho

    row = q280_spearman_rho(spark, sf_dir).collect()[0]
    b = _docs_xy()
    rx = b["x"].rank(method="average").to_numpy()
    ry = b["y"].rank(method="average").to_numpy()
    ref = np.corrcoef(rx, ry)[0, 1]
    assert abs(row["rho"] - ref) < 1e-5


def test_kaplan_meier_matches_sequential_product(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave9 import q237_kaplan_meier

    rows = q237_kaplan_meier(spark, sf_dir).orderBy("t").collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    per_user = ev.groupby("user_id").agg(
        t0=("ts", "min"),
        t_last=("ts", "max"),
    )
    purch = ev[ev["event_type"] == "purchase"].groupby("user_id")["ts"].min()
    per_user = per_user.join(purch.rename("t_purchase"))
    conv = per_user["t_purchase"].notna()
    end = per_user["t_purchase"].where(conv, per_user["t_last"])
    dur_days = (end - per_user["t0"]).dt.total_seconds() / 86400.0
    t = np.ceil(dur_days).astype("int64")
    # event table: d = conversions at t; n = all (converted or censored) with
    # bin >= t still at risk
    s = 1.0
    ref = {}
    for ti in sorted(t[conv].unique()):
        d = int(((t == ti) & conv).sum())
        n = int((t >= ti).sum())
        s = 0.0 if d == n else s * (1.0 - d / n)
        ref[ti] = (d, n, s)
    assert len(rows) == len(ref)
    for r in rows:
        d, n, s = ref[r["t"]]
        assert r["n_events"] == d
        assert r["n_at_risk"] == n
        assert abs(r["survival"] - s) < 1e-5, r["t"]
