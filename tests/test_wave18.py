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
        q295_embedding_covariance,
        q296_pca_scree,
    )

    scree = q296_pca_scree(spark, sf_dir).collect()
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


def test_pca_scree_recovers_planted_direction(spark, tmp_path_factory):
    from sparkstreaming_quickstart_spark.queries.wave18 import q296_pca_scree

    sf, X = _planted_corpus(tmp_path_factory)
    scree = q296_pca_scree(spark, sf).collect()
    # one planted high-variance axis: the top component must dominate
    assert scree[0]["var_explained"] > 0.99
    lam0 = float(np.linalg.eigvalsh(np.cov(X.astype(np.float64).T))[-1])
    assert abs(scree[0]["eigenvalue"] - lam0) <= 1e-3
