"""Wave-28 reference tests: the greedy mixture budget against a scalar
knapsack fill, and the SRM check against a hashlib replay of the
assignment."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest


def test_greedy_mixture_matches_scalar_fill(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave28 import (
        _MIX_BUDGET_PPM,
        q346_greedy_mixture_budget,
    )

    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    d = d[d["text"].str.len() > 0]
    toks = d["text"].str.split(" ")
    d = d.assign(n=toks.str.len(), q=toks.map(lambda t: len(set(t)) / len(t)))
    s = d.groupby("source").agg(tokens=("n", "sum"), quality=("q", "mean"))
    s["quality"] = s["quality"].round(9)
    total = int(s["tokens"].sum())
    budget = total * _MIX_BUDGET_PPM // 1_000_000
    order = sorted(s.index, key=lambda src: (-s.loc[src, "quality"], src))
    rows = q346_greedy_mixture_budget(spark, sf_dir).collect()
    assert [r["source"] for r in rows] == order
    cum = 0
    filled = 0.0
    for r, src in zip(rows, order):
        tk = int(s.loc[src, "tokens"])
        cum += tk
        assert r["tokens"] == tk
        assert r["cum_tokens"] == cum
        assert r["quality"] == pytest.approx(s.loc[src, "quality"], abs=1e-9)
        if cum <= budget:
            expect = 1.0
        elif cum - tk >= budget:
            expect = 0.0
        else:
            expect = round((budget - (cum - tk)) / tk, 6)
        assert r["take_fraction"] == pytest.approx(expect, abs=1e-9)
        filled += r["take_fraction"] * tk
    # the greedy fill consumes the budget exactly (up to marginal rounding)
    assert filled == pytest.approx(budget, abs=s["tokens"].max() * 1e-6 + 1)


def test_srm_check_matches_hashlib_replay(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave28 import (
        _SRM_SALT,
        q347_srm_check,
    )

    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    users = e["user_id"].unique()
    arms = [
        int.from_bytes(
            hashlib.md5(f"{_SRM_SALT}{u}".encode()).digest()[8:16], "little"
        )
        % 2
        for u in users
    ]
    na = sum(1 for a in arms if a == 0)
    nb = len(arms) - na
    r = q347_srm_check(spark, sf_dir).collect()[0]
    assert (r["n_a"], r["n_b"]) == (na, nb)
    z = (na - nb) / (na + nb) ** 0.5
    assert r["z"] == pytest.approx(z, abs=2e-6)
    assert r["chi2"] == pytest.approx(2 * (na - (na + nb) / 2) ** 2 / ((na + nb) / 2), abs=2e-5)
    assert r["srm_alarm"] == (abs(z) > 3.0)


def test_mergeable_moments_identity_and_numpy(spark, sf_dir):
    """The MERGED row (Chan combine of per-group summaries) must equal the
    DIRECT row, and both must equal numpy's single-pass moments."""
    import numpy as np

    from sparkstreaming_quickstart_spark.queries.wave29 import (
        q348_mergeable_moments,
    )

    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    rows = {r["grp"]: r for r in q348_mergeable_moments(spark, sf_dir).collect()}
    v = e["value"].to_numpy()
    for grp in ("MERGED", "DIRECT"):
        r = rows[grp]
        assert r["n"] == len(v)
        assert r["mean"] == pytest.approx(v.mean(), abs=2e-6)
        assert r["variance"] == pytest.approx(v.var(ddof=1), abs=2e-5)
    assert rows["MERGED"]["mean"] == rows["DIRECT"]["mean"]
    assert rows["MERGED"]["variance"] == pytest.approx(
        rows["DIRECT"]["variance"], abs=2e-6
    )
    for et, grp in e.groupby("event_type"):
        g = grp["value"].to_numpy()
        r = rows[et]
        assert r["n"] == len(g)
        assert r["mean"] == pytest.approx(g.mean(), abs=2e-6)
        assert r["variance"] == pytest.approx(g.var(ddof=1), abs=2e-5)
