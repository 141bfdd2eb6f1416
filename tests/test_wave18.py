"""Wave-18 (embedding spectral analytics) semantic pins.

q295's value correctness is oracle-gated; these tests pin what the oracle
cannot reach: the kernel's sufficient-statistic encoding survives
re-partitioning, and q296's eigendecomposition (rows-only -- no SQL
eigensolver exists) satisfies the spectral invariants that uniquely
characterize it: trace preservation, descending order,
positive-semidefiniteness, correct variance normalization, and recovery of
a planted dominant direction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def _write_embeddings(tmp_path, vecs):
    pdf = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [np.asarray(v, dtype="float32") for v in vecs],
            "label": [0] * len(vecs),
        }
    )
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    return str(tmp_path)


def _planted_corpus(tmp_path_factory, n=300, d=64, seed=7):
    """Embeddings = strong variance along axis 0, weak noise elsewhere."""
    rng = np.random.default_rng(seed)
    X = rng.normal(0.0, 0.01, size=(n, d))
    X[:, 0] += rng.normal(0.0, 2.0, size=n)
    return _write_embeddings(tmp_path_factory.mktemp("emb"), list(X)), X


def test_covariance_matches_numpy_and_partitioning_invariant(spark, tmp_path_factory):
    from sparkstreaming_quickstart_spark.queries.wave18 import (
        q295_embedding_covariance,
    )

    sf, X = _planted_corpus(tmp_path_factory)
    rows = q295_embedding_covariance(spark, sf).collect()
    assert len(rows) == 64 * 65 // 2
    C = np.cov(X.astype(np.float64).T, bias=False)
    for r in rows:
        assert abs(r["cov"] - round(float(C[r["i"], r["j"]]), 6)) <= 1e-6, (
            r["i"],
            r["j"],
        )
    # negative-zero normalization: the string form the driver hashes must
    # never be '-0'
    assert all(f"{r['cov']:.12g}" != "-0" for r in rows)


def test_gram_kernel_partials_are_partition_invariant(spark, tmp_path_factory):
    """The (i, j, v) partial encoding must sum to the same totals however
    Spark batches the scan: 1 partition vs 7 partitions, same statistics."""
    from sparkstreaming_quickstart_spark.queries.wave18 import _gram_partials

    sf, X = _planted_corpus(tmp_path_factory, n=101)
    e = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        F.col("embedding").cast("array<double>").alias("x")
    )
    totals = {}
    for parts in (1, 7):
        t = (
            e.repartition(parts)
            .mapInPandas(_gram_partials(64), "i int, j int, v double")
            .groupBy("i", "j")
            .agg(F.round(F.sum("v"), 6).alias("v"))
            .collect()
        )
        totals[parts] = {(r["i"], r["j"]): r["v"] for r in t}
    assert totals[1] == totals[7]
    assert totals[1][(-1, -1)] == 101.0


def test_pca_scree_spectral_invariants(spark, sf_dir):
    from sparkstreaming_quickstart_spark.queries.wave18 import (
        pca_scree_components,
        q295_embedding_covariance,
        q296_pca_scree,
    )

    scree = pca_scree_components(spark, sf_dir).collect()
    assert [r["component"] for r in scree] == list(range(64))
    evs = [r["eigenvalue"] for r in scree]
    # descending and PSD (to rounding)
    assert evs == sorted(evs, reverse=True)
    assert evs[-1] >= -1e-6
    # trace preservation: sum of eigenvalues == sum of variances (diagonal)
    diag = sum(
        r["cov"]
        for r in q295_embedding_covariance(spark, sf_dir).collect()
        if r["i"] == r["j"]
    )
    assert abs(sum(evs) - diag) <= 1e-3
    # variance fractions normalize and accumulate monotonically to 1
    assert abs(scree[-1]["cum_var_explained"] - 1.0) <= 1e-6
    cums = [r["cum_var_explained"] for r in scree]
    assert cums == sorted(cums)
    # the q296 moment summary must be consistent with the per-component
    # eigenvalues it summarizes (same eigh call, two views)
    s = q296_pca_scree(spark, sf_dir).collect()[0]
    assert s["n_components"] == 64
    assert abs(s["trace"] - sum(evs)) <= 1e-3
    assert abs(s["frobenius_sq"] - sum(e * e for e in evs)) <= 1e-4
    assert abs(s["spectral_moment3"] - sum(e**3 for e in evs)) <= 1e-6
    assert abs(s["effective_rank"] - sum(evs) ** 2 / sum(e * e for e in evs)) <= 1e-2


def test_pca_scree_recovers_planted_direction(spark, tmp_path_factory):
    from sparkstreaming_quickstart_spark.queries.wave18 import (
        pca_scree_components,
        q296_pca_scree,
    )

    sf, X = _planted_corpus(tmp_path_factory)
    scree = pca_scree_components(spark, sf).collect()
    # one planted high-variance axis: the top component must dominate
    assert scree[0]["var_explained"] > 0.99
    lam0 = float(np.linalg.eigvalsh(np.cov(X.astype(np.float64).T))[-1])
    assert abs(scree[0]["eigenvalue"] - lam0) <= 1e-3
    # ... and the q296 summary sees it: effective rank collapses toward 1
    s = q296_pca_scree(spark, sf).collect()[0]
    assert s["effective_rank"] < 1.1


# ---------------------------------------------------------------------------
# q297-q301 (round-7 additions): ANN eval, extraction, classifier inference,
# hard negatives, whitening
# ---------------------------------------------------------------------------


def _np_buckets(X, n=None, target=256, floor_bits=8):
    """Independent numpy replay of the ADAPTIVE LSH bucket assignment
    (round 13: the q55/q297/q300 family derives its bit count from COUNT(*)
    and its planes from the Lehmer-squared formula -- this reference replays
    both rules inline rather than importing the engine's helpers, so a
    regression in either cannot hide)."""
    n = len(X) if n is None else n
    m = max(1, -(-n // target))
    nbits = max(floor_bits, min(30, (m - 1).bit_length()))
    dim = X.shape[1]
    # Lehmer-squared formula planes on the hyperplane stream (offset 1e6)
    t = np.arange(nbits * dim, dtype=np.int64) + 1_000_000
    M = 2147483647
    x1 = (48271 * (t + 1)) % M
    x2 = (x1 * x1) % M
    x3 = (48271 * x2 + 12345) % M
    planes = (x3 / 2147483647.0 * 2.0 - 1.0).reshape(nbits, dim)
    signs = (X @ planes.T) > 0
    return (signs * (1 << np.arange(nbits))).sum(axis=1)


def test_ann_recall_eval_matches_numpy_reference(spark, tmp_path_factory):
    from sparkstreaming_quickstart_spark.queries.wave18 import q297_ann_recall_eval

    rng = np.random.default_rng(11)
    X = rng.normal(size=(200, 64))
    sf = _write_embeddings(tmp_path_factory.mktemp("emb"), list(X))
    rows = q297_ann_recall_eval(spark, sf).collect()
    assert len(rows) == 4  # vec_ids 0, 50, 100, 150
    Xd = X.astype(np.float64)
    nrm = np.linalg.norm(Xd, axis=1)
    cos = np.round((Xd @ Xd.T) / np.outer(nrm, nrm), 9)
    buckets = _np_buckets(Xd)
    for r in rows:
        qi = r["query_id"]
        order = sorted(
            (i for i in range(200) if i != qi), key=lambda i: (-cos[qi, i], i)
        )
        exact5 = set(order[:5])
        cand = [i for i in order if buckets[i] == buckets[qi]]
        ann5 = set(cand[:5])
        assert r["n_exact"] == 5
        assert r["n_hits"] == len(exact5 & ann5)
        assert abs(r["recall_at_5"] - round(len(exact5 & ann5) / 5, 6)) < 1e-9


def test_boilerplate_segments_planted_doc(spark, tmp_path):
    from sparkstreaming_quickstart_spark.queries.wave18 import (
        q298_boilerplate_segments,
    )

    # 23 tokens -> segments of 10/10/3.  Segment 1 has stopword evidence
    # ('the'); segment 2 has none; segment 3 is below the length floor.
    seg1 = "the " + " ".join(["data"] * 9)
    seg2 = " ".join(["scan"] * 10)
    seg3 = "a b c"  # 3 tokens: has 'a' but too short -> boilerplate
    text = f"{seg1} {seg2} {seg3}"
    pd.DataFrame(
        {
            "doc_id": [0],
            "text": [text],
            "lang": ["en"],
            "source": ["s0"],
            "n_chars": [len(text)],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = q298_boilerplate_segments(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 1
    assert r["n_segments"] == 3
    assert r["n_content_segments"] == 1
    assert abs(r["retained_token_share"] - round(10 / 23, 6)) < 1e-9


def test_quality_classifier_score_matches_hashlib(spark, tmp_path):
    import hashlib

    from sparkstreaming_quickstart_spark.queries.wave18 import (
        _QCLS_BUCKETS,
        _qcls_weights,
        q299_quality_classifier_inference,
    )

    # Single-token docs: the doc score IS the bucket weight, replayed here
    # independently via hashlib (little-endian low bytes of the md5 second
    # half == DuckDB md5_number_lower % 256).
    toks = ["scan", "the", "merge"]
    texts = [t for t in toks]
    pd.DataFrame(
        {
            "doc_id": range(3),
            "text": texts,
            "lang": ["en"] * 3,
            "source": ["s0", "s1", "s2"],
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    w = _qcls_weights()
    rows = q299_quality_classifier_inference(spark, str(tmp_path)).collect()
    assert len(rows) == 3  # one (source, bin) row per single-doc source
    by_source = {r["source"]: r for r in rows}
    for t, src in zip(toks, ["s0", "s1", "s2"]):
        h = hashlib.md5(t.encode()).hexdigest()
        bucket = int.from_bytes(bytes.fromhex(h[16:32]), "little") % _QCLS_BUCKETS
        expected = round(w[bucket], 6)
        r = by_source[src]
        assert r["n_docs"] == 1
        assert abs(r["avg_score"] - expected) < 1e-9
        assert r["score_bin"] == min(int((expected + 1.0) // 0.2), 9)


def test_hard_negatives_are_same_bucket_non_topk(spark, tmp_path_factory):
    from sparkstreaming_quickstart_spark.queries.wave18 import q300_hard_negative_mining

    rng = np.random.default_rng(23)
    X = rng.normal(size=(200, 64))
    sf = _write_embeddings(tmp_path_factory.mktemp("emb"), list(X))
    rows = q300_hard_negative_mining(spark, sf).collect()
    assert rows, "expected at least one mined negative on a 200-vector corpus"
    Xd = X.astype(np.float64)
    nrm = np.linalg.norm(Xd, axis=1)
    cos = np.round((Xd @ Xd.T) / np.outer(nrm, nrm), 9)
    buckets = _np_buckets(Xd)
    for r in rows:
        qi, ni = r["query_id"], r["hard_negative_id"]
        assert buckets[qi] == buckets[ni]
        order = sorted(
            (i for i in range(200) if i != qi), key=lambda i: (-cos[qi, i], i)
        )
        exact5 = set(order[:5])
        assert ni not in exact5
        # hardest survivor: no same-bucket non-top-5 candidate scores higher
        # Strictly-better only: sub-ulp dot-product reassociation between the
        # numpy replay and Spark's fold can flip the 9th rounded digit, so a
        # candidate within one rounding unit is a legal tie, not a violation.
        better = [
            i
            for i in range(200)
            if i not in (qi, ni)
            and buckets[i] == buckets[qi]
            and i not in exact5
            and cos[qi, i] > cos[qi, ni] + 2e-9
        ]
        assert not better
        assert abs(r["cos_sim"] - cos[qi, ni]) < 1e-8


def test_whitening_produces_identity_covariance(spark, sf_dir):
    """Round-9 exact contract: W inverts the UNROUNDED covariance, so the
    re-measured whitened covariance is identity to float precision and the
    round-6 output is EXACTLY 1.0/0.0 -- the same statement the SQL oracle
    makes.  A numpy replay pins the sub-rounding residual at 1e-9."""
    from sparkstreaming_quickstart_spark.queries.wave18 import q301_embedding_whitening

    rows = q301_embedding_whitening(spark, sf_dir).collect()
    assert len(rows) == 64 * 65 // 2
    for r in rows:
        target = 1.0 if r["i"] == r["j"] else 0.0
        assert r["identity_target"] == target
        assert r["whitened_cov"] == target, (r["i"], r["j"])
    # independent numpy replay of the whole pipeline: residual << rounding
    import pandas as pd

    X = np.stack(
        pd.read_parquet(f"{sf_dir}/embeddings.parquet")["embedding"].to_numpy()
    ).astype(np.float64)
    C = np.cov(X.T, bias=False)
    lam, V = np.linalg.eigh(C)
    W = V @ np.diag(1.0 / np.sqrt(np.maximum(lam, 1e-6))) @ V.T
    R = np.cov((X @ W.T).T, bias=False) - np.eye(64)
    assert np.abs(R).max() <= 1e-9
