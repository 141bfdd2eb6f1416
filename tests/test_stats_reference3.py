"""Naive reference implementations, batch 3: the operators whose Spark
plans replace a global sort/window with algebra (Zipf rank runs, the Gini
two-phase rank, MAD via histogram cumsums) and the seeded MinHash-LSH
near-dup pipeline.  Each is recomputed the straightforward way (actually
sort, actually rank, actually hash in Python) from raw parquet or a micro
corpus, so an algebra bug mirrored into the DuckDB oracle can't hide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR


def test_zipf_fit_matches_sorted_ols(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave9 import q238_zipf_fit

    row = q238_zipf_fit(spark, sf_dir).collect()[0]
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    d = d[d["text"].str.len() > 0]
    freq = d["text"].str.split(" ").explode().value_counts().to_numpy()
    f = np.sort(freq)[::-1].astype("float64")  # actually sort the vocabulary
    r = np.arange(1, len(f) + 1, dtype="float64")
    lx, ly = np.log(r), np.log(f)
    slope, intercept = np.polyfit(lx, ly, 1)
    pred = slope * lx + intercept
    ss_res = ((ly - pred) ** 2).sum()
    ss_tot = ((ly - ly.mean()) ** 2).sum()
    assert row["vocab_size"] == len(f)
    assert abs(row["zipf_slope"] - slope) < 1e-5
    assert abs(row["log_c"] - intercept) < 1e-5
    assert abs(row["r2"] - (1 - ss_res / ss_tot)) < 1e-5


def test_gini_matches_sorted_rank_formula(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave9 import q230_gini_concentration

    rows = q230_gini_concentration(spark, sf_dir).orderBy("decile").collect()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    rev = (
        o.groupby("o_custkey")["o_totalprice"]
        .apply(lambda s: float(round(s.sum(), 2)))
        .sort_values(kind="mergesort")
        .to_numpy()
    )
    n = len(rev)
    i = np.arange(1, n + 1, dtype="float64")
    gini = 2.0 * (i * rev).sum() / (n * rev.sum()) - (n + 1.0) / n
    dec = np.ceil(i * 10.0 / n).astype(int)
    shares = {
        d: rev[dec == d].sum() / rev.sum() for d in np.unique(dec)
    }
    assert len(rows) == len(shares)
    for r in rows:
        assert abs(r["gini"] - gini) < 1e-5
        assert abs(r["rev_share"] - shares[r["decile"]]) < 1e-5


def test_mad_matches_numpy_medians(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave14 import q278_mad_robust_scale

    rows = q278_mad_robust_scale(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    cents = ev["value"].mul(100).round().astype("int64")
    got = {r["event_type"]: r for r in rows}
    for et, grp in cents.groupby(ev["event_type"]):
        x = np.sort(grp.to_numpy())
        med = float(np.median(x))  # numpy median = lower/upper midpoint
        mad = float(np.median(np.abs(x - med)))
        r = got[et]
        assert r["n"] == len(x)
        assert abs(r["median_value"] - med / 100.0) < 1e-6
        assert abs(r["mad"] - mad / 100.0) < 1e-6


def test_minhash_lsh_matches_python_shingle_jaccard(spark):
    """Third implementation of the q52 contract on a micro corpus: pure-
    Python 3-word-shingle sets -> exact Jaccard -> threshold.  The operator's
    hashed-shingle representation is injective (Jaccard-preserving) and its
    24x4 banding recalls j>=0.7 pairs with P>=0.9986, so the surviving pairs
    and their verified Jaccard values must equal the naive set computation
    exactly."""
    from sparkstreaming_quickstart_spark.operators.dedup import minhash_lsh_pairs

    texts = {
        0: "the quick brown fox jumps over the lazy dog today",
        1: "the quick brown fox jumps over the lazy dog tonight",  # near-dup of 0
        2: "completely different words appear in this document body",
        3: "completely different words appear in this document text",  # near-dup of 2
        4: "an unrelated singleton about spark physical plan shapes",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    pairs = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in minhash_lsh_pairs(df, "text", "doc_id", n=3, threshold=0.5).collect()
    }

    def shingles(text: str) -> set:
        toks = text.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sh = {d: shingles(t) for d, t in texts.items()}
    ref = {}
    for a in texts:
        for b in texts:
            if a < b:
                j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
                if j >= 0.5:
                    ref[(a, b)] = j
    assert set(pairs) == set(ref), (pairs, ref)
    for k, j in ref.items():
        assert abs(pairs[k] - j) < 1e-9
