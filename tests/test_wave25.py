"""Wave-25 reference tests: numpy/pandas recomputation of the 1-D
Wasserstein distance, RFM segmentation (with explicit NTILE bucket-size
semantics), and the cumulative-gains table."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _ntile(keys: list, k: int) -> dict:
    """NTILE(k) over rows pre-sorted by their ranking key: the first
    (n mod k) buckets get ceil(n/k) rows.  Returns key -> bucket."""
    n = len(keys)
    out = {}
    i = 0
    for b in range(1, k + 1):
        size = n // k + (1 if b <= n % k else 0)
        for key in keys[i : i + size]:
            out[key] = b
        i += size
    return out


def test_wasserstein_matches_numpy(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave25 import q337_wasserstein_1d

    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    a = np.sort(e[e["event_type"] == "purchase"]["value"].to_numpy())
    b = np.sort(e[e["event_type"] == "view"]["value"].to_numpy())
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    w1 = float((np.abs(fa - fb)[:-1] * np.diff(grid)).sum())
    r = q337_wasserstein_1d(spark, sf_dir).collect()[0]
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    assert r["wasserstein"] == pytest.approx(w1, abs=2e-6)
    assert r["wasserstein"] >= 0.0


def test_rfm_matches_pandas_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave25 import q338_rfm_segmentation

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    mx = o["o_orderdate"].max()
    base = o.groupby("o_custkey").agg(
        last=("o_orderdate", "max"),
        frequency=("o_orderkey", "count"),
        monetary=("o_totalprice", "sum"),
    )
    base["recency_days"] = (mx - base["last"]).dt.days
    custs = base.index.to_list()
    r_b = _ntile(
        sorted(custs, key=lambda c: (base.loc[c, "recency_days"], c)), 4
    )
    f_b = _ntile(sorted(custs, key=lambda c: (-base.loc[c, "frequency"], c)), 4)
    m_b = _ntile(
        sorted(custs, key=lambda c: (-round(base.loc[c, "monetary"], 6), c)), 4
    )
    seg: dict[tuple, list] = {}
    for c in custs:
        seg.setdefault((r_b[c], f_b[c], m_b[c]), []).append(c)
    rows = q338_rfm_segmentation(spark, sf_dir).collect()
    assert len(rows) == len(seg)
    for r in rows:
        members = seg[(r["r"], r["f"], r["m"])]
        sub = base.loc[members]
        assert r["n_customers"] == len(members)
        assert r["avg_recency_days"] == pytest.approx(
            sub["recency_days"].mean(), abs=2e-6
        )
        assert r["avg_frequency"] == pytest.approx(sub["frequency"].mean(), abs=2e-6)
        assert r["avg_monetary"] == pytest.approx(sub["monetary"].mean(), abs=2e-5)


def test_cumulative_gains_matches_pandas_reference(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave25 import q339_cumulative_gains

    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    u = e.groupby("user_id").agg(
        activity=("event_id", "count"),
        converted=("event_type", lambda s: int((s == "purchase").any())),
    )
    users = u.index.to_list()
    dec = _ntile(sorted(users, key=lambda x: (-u.loc[x, "activity"], x)), 10)
    nu, nc = len(users), int(u["converted"].sum())
    per = {b: [0, 0] for b in range(1, 11)}
    for x in users:
        per[dec[x]][0] += 1
        per[dec[x]][1] += int(u.loc[x, "converted"])
    rows = q339_cumulative_gains(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    cum = 0
    base_rate = nc / nu
    for r in rows:
        n_users, n_conv = per[r["decile"]]
        cum += n_conv
        assert (r["n_users"], r["n_converted"]) == (n_users, n_conv)
        assert r["cum_capture"] == pytest.approx(round(cum / nc, 6), abs=1e-9)
        assert r["lift"] == pytest.approx(
            round((n_conv / n_users) / base_rate, 6), abs=1e-9
        )
    assert rows[-1]["cum_capture"] == pytest.approx(1.0, abs=1e-12)
    # gains must be monotone in capture and the top decile at least base rate
    assert rows[0]["lift"] >= 1.0 or nc == 0
