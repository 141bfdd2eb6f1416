"""Naive reference implementations, batch 5: the bucket-stitched
distributed lag (q262), the two-phase prefix-max (q275), sequential CUSUM
(q256), and diagonal Mahalanobis (q267).  Each recomputed sequentially /
vectorized in Python from raw parquet, so the distributed re-formulations
(day-stitching, bucket prefix maxima) are checked against the single-stream
spelling they claim to equal.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    return ev.assign(us=ev["ts"].astype("datetime64[us]").astype("int64"))


def test_exponential_gof_matches_single_stream_lag(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave11 import (
        _GOF_BINS,
        q262_exponential_gof,
    )

    rows = {r["event_type"]: r for r in q262_exponential_gof(spark, sf_dir).collect()}
    ev = _events()
    for et, grp in ev.groupby("event_type"):
        g = grp.sort_values(["us", "event_id"], kind="mergesort")["us"].to_numpy()
        gaps = np.diff(g)
        n = len(gaps)
        lam = n / gaps.sum()
        bins = np.minimum(
            _GOF_BINS - 1, np.floor(_GOF_BINS * (1 - np.exp(-lam * gaps))).astype(int)
        )
        exp = n / _GOF_BINS
        chi2 = sum(
            (np.count_nonzero(bins == b) - exp) ** 2 / exp for b in np.unique(bins)
        )
        r = rows[et]
        assert r["n_gaps"] == n
        assert abs(r["chi2"] - chi2) < 1e-4, et


def test_lateness_profile_matches_sequential_running_max(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave13 import q275_lateness_profile

    rows = {r["lateness_hours"]: r["n"] for r in q275_lateness_profile(spark, sf_dir).collect()}
    ev = _events().sort_values("event_id", kind="mergesort")
    us = ev["us"].to_numpy()
    run_max = np.maximum.accumulate(us)
    hours = np.floor((run_max - us) / 3600000000.0).astype(int)
    ref = pd.Series(hours).value_counts().to_dict()
    assert rows == ref


def test_cusum_matches_sequential_accumulation(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave10 import q256_cusum_changepoint

    rows = {r["user_id"]: r for r in q256_cusum_changepoint(spark, sf_dir).collect()}
    ev = _events()
    mu = round(float(ev["value"].mean()), 6)
    for uid, grp in ev.groupby("user_id"):
        g = grp.sort_values(["us", "event_id"], kind="mergesort")
        cusum = (g["value"] - mu).cumsum().to_numpy()
        r = rows[uid]
        assert r["n"] == len(g)
        assert abs(r["drift"] - (cusum.max() - cusum.min())) < 1e-5
        peaks = np.round(np.abs(cusum), 9)
        at_peak = g["event_id"].to_numpy()[peaks == peaks.max()]
        assert r["changepoint_event"] == int(at_peak.min()), uid


def test_mahalanobis_matches_numpy(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave11 import (
        q267_mahalanobis_outliers,
    )

    rows = {r["vec_id"]: r["m2"] for r in q267_mahalanobis_outliers(spark, sf_dir).collect()}
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype("float64")
    mean = X.mean(axis=0)
    var = X.var(axis=0, ddof=1)
    m2 = (((X - mean) ** 2) / var).sum(axis=1)
    for vid, ref in zip(emb["vec_id"], m2):
        assert abs(rows[vid] - ref) < 1e-5, vid


if __name__ == "__main__":  # pragma: no cover
    import pytest

    pytest.main([__file__, "-q"])
