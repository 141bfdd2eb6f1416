"""Wave-18 operators (round 7): embedding-space spectral analytics -- the
one-pass distributed covariance/Gram matrix and the PCA scree derived from
it.  Closes the remaining gap in the embedding-pipeline family: SemDeDup
(q186), ANN (q55/q64/q137/q161/q178), outliers (q267) and cluster quality
(q287) all consume embedding geometry, but nothing measured its SPECTRUM --
the intrinsic-dimensionality / variance-concentration facts that decide PQ
code sizes, IVF cell counts, and whitening before cosine dedup.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md section-2.B
training-data-pipeline family.

Scale design (the whole point at 100 TB): the covariance needs exactly the
d(d+1)/2 + d + 1 sufficient statistics (Gram upper triangle, per-dim sums,
count).  One Arrow mapInPandas kernel computes each batch's partial X'X as a
single numpy matmul and emits the ~2k-row triangle per batch; ONE hash-agg
sums the partials (map-side combinable, commutative float adds rounded at
output).  The corpus never shuffles -- only d^2-sized partials move.  The
eigendecomposition then runs driver-side on the collected 64x64 matrix
(bounded driver state, the q270/q293 scripting pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

_DIMS = 64


def _gram_partials(dims: int):
    """Arrow-batch kernel: (x: array<double>) batches -> partial sufficient
    statistics as (i, j, v) rows.

    Encoding (one kernel, ONE downstream hash-agg for every statistic):
      i >= 0, j >= i : partial sum of x_i * x_j  (Gram upper triangle)
      i >= 0, j = -1 : partial sum of x_i        (per-dim sums)
      i = -1, j = -1 : partial row count

    Per batch the Gram block is one numpy matmul (X'X), so the Python cost
    is O(rows * d^2) vectorized flops and the output is O(d^2) ROWS PER
    BATCH regardless of batch size -- the corpus itself never crosses the
    Python boundary back.
    """
    import numpy as np
    import pandas as pd

    iu, ju = np.triu_indices(dims)

    def gen(batches):
        for pdf in batches:
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["x"]])
            g = X.T @ X
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(dims), [-1]]),
                    "j": np.concatenate([ju, np.full(dims, -1), [-1]]),
                    "v": np.concatenate([g[iu, ju], X.sum(axis=0), [float(len(pdf))]]),
                }
            )

    return gen


def covariance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, sxy, si, sj, n) for every 0 <= i <= j < d: the sufficient
    statistics of the embedding covariance matrix, from one corpus scan."""
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("x")
    )
    parts = e.mapInPandas(_gram_partials(_DIMS), "i int, j int, v double")
    tot = parts.groupBy("i", "j").agg(F.sum("v").alias("v"))
    gram = tot.filter((F.col("i") >= 0) & (F.col("j") >= 0)).select(
        "i", "j", F.col("v").alias("sxy")
    )
    sums = tot.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("d"), F.col("v").alias("s")
    )
    n = tot.filter(F.col("i") == -1).select(F.col("v").cast("bigint").alias("n"))
    si = sums.select(F.col("d").alias("i"), F.col("s").alias("si"))
    sj = sums.select(F.col("d").alias("j"), F.col("s").alias("sj"))
    return (
        gram.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n))
    )


_COV_ORACLE = """
    WITH dims AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings)
    SELECT a.pos AS i, b.pos AS j,
           ROUND((SUM(a.x * b.x) - SUM(a.x) * SUM(b.x) / COUNT(*))
                 / (COUNT(*) - 1), 6) + 0.0 AS cov
    FROM dims a JOIN dims b ON a.vec_id = b.vec_id AND a.pos <= b.pos
    GROUP BY 1, 2
    ORDER BY i, j
"""


@register(
    "q295_embedding_covariance",
    sql=_COV_ORACLE,
    doc="Distributed embedding covariance matrix (upper triangle, d(d+1)/2 "
    "rows): the sufficient statistics -- Gram partials X'X, per-dim sums, "
    "count -- come from ONE Arrow mapInPandas scan (a numpy matmul per "
    "batch, emitting d^2-sized partials regardless of batch size) and ONE "
    "map-side-combinable hash-agg; cov = (sxy - si*sj/n)/(n-1), the same "
    "sufficient-statistic formula the oracle spells, with the established "
    "ROUND(,6) reduce-order tolerance on the float sums.  The matrix that "
    "sizes PQ codebooks, picks IVF cell counts, and feeds whitening -- at "
    "100 TB the corpus never shuffles; only 64x64 partials move.",
)
def q295_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cs = covariance_stats(spark, sf_dir)
    cov = (F.col("sxy") - F.col("si") * F.col("sj") / F.col("n")) / (F.col("n") - 1)
    # `+ 0.0` after the round, mirrored in the oracle: a tiny negative
    # covariance rounds to NEGATIVE ZERO in one engine and positive zero in
    # the other, and the driver's "%.12g" normalization prints them as '-0'
    # vs '0'.  IEEE -0.0 + 0.0 = +0.0 in both engines; nonzero values are
    # unchanged exactly.
    return cs.select("i", "j", (F.round(cov, 6) + F.lit(0.0)).alias("cov")).orderBy(
        "i", "j"
    )


@register(
    "q296_pca_scree",
    sql=None,  # iterative eigendecomposition: not SQL-expressible; rows-only
    # driver check + the spectral property tests in test_wave18.py
    # (eigenvalue sum == covariance trace, descending order, PSD, projection
    # variance == eigenvalue) carry the correctness weight.
    doc="PCA scree over the embedding corpus: eigenvalues of the covariance "
    "matrix with per-component and cumulative variance-explained -- the "
    "intrinsic-dimensionality report that decides how many PQ/IVF/whitening "
    "components an embedding pipeline keeps.  Plan: the q295 one-scan "
    "sufficient statistics, then numpy eigh on the collected 64x64 matrix "
    "(bounded driver state, the q270/q293 scripting pattern -- the "
    "decomposition cost is O(d^3), independent of corpus size).  Not "
    "SQL-expressible (iterative eigensolver), so registered rows-only; "
    "spectral invariants are pinned by property tests instead.",
)
def q296_pca_scree(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    rows = q295_embedding_covariance(spark, sf_dir).collect()
    C = np.zeros((_DIMS, _DIMS))
    for r in rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    evals = np.linalg.eigh(C)[0][::-1]  # descending
    total = float(evals.sum())
    out, cum = [], 0.0
    for k, lam in enumerate(evals):
        cum += float(lam)
        out.append(
            (
                k,
                round(float(lam), 6),
                round(float(lam) / total, 6),
                round(cum / total, 6),
            )
        )
    return spark.createDataFrame(
        out, "component int, eigenvalue double, var_explained double, cum_var_explained double"
    ).orderBy("component")
