"""Wave-35 operators (round 9, continued): representation-similarity and
shrinkage statistics over the embedding corpus, and weighted systematic
sampling -- the remaining spectral/sampling surface.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md
section-2.B embedding/sampling families.

Engine-exactness notes:
- q363 (linear CKA) needs NO eigensolver at all: the statistic is a
  rational function of the d^2 sufficient-statistic matrices, so unlike
  q296/q355 the whole computation stays declarative on both sides and the
  oracle replays it exactly (float-reduce jitter ~9 digits under the
  output rounding).
- q364's Ledoit-Wolf intensity likewise derives from moments (no
  eigensolver); the only data-dependent float is the centered fourth
  moment, computed against the broadcast mean in a second scan.
- q365's selection arithmetic compares floor((cum - 0.5*step)/step) with
  cum/weights exact BIGINTs and step the identical IEEE division in both
  engines -- same doubles, same floors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

_DIMS = 64

# ---------------------------------------------------------------------------
# q363: linear CKA between the even- and odd-id embedding spaces
# ---------------------------------------------------------------------------


@register(
    "q363_linear_cka",
    sql="""
    WITH ev AS (
        SELECT CAST(vec_id // 2 AS BIGINT) AS k, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 2 = 0),
    od AS (
        SELECT CAST(vec_id // 2 AS BIGINT) AS k, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 2 = 1),
    pr AS (SELECT ev.k, ev.v AS x, od.v AS y FROM ev JOIN od USING (k)),
    n AS (SELECT COUNT(*) AS n FROM pr),
    xd AS (SELECT k, generate_subscripts(x, 1) AS i, unnest(x) AS xi FROM pr),
    yd AS (SELECT k, generate_subscripts(y, 1) AS j, unnest(y) AS yj FROM pr),
    sx AS (SELECT i, SUM(xi) AS s FROM xd GROUP BY i),
    sy AS (SELECT j, SUM(yj) AS s FROM yd GROUP BY j),
    cxy AS (
        SELECT a.i, b.j,
               SUM(a.xi * b.yj) - sx.s * sy.s / n.n AS c
        FROM xd a JOIN yd b ON a.k = b.k
        JOIN sx ON sx.i = a.i JOIN sy ON sy.j = b.j, n
        GROUP BY a.i, b.j, sx.s, sy.s, n.n),
    cxx AS (
        SELECT a.i, b.i AS j,
               SUM(a.xi * b.xi) - s1.s * s2.s / n.n AS c
        FROM xd a JOIN xd b ON a.k = b.k
        JOIN sx s1 ON s1.i = a.i JOIN sx s2 ON s2.i = b.i, n
        GROUP BY a.i, b.i, s1.s, s2.s, n.n),
    cyy AS (
        SELECT a.j AS i, b.j,
               SUM(a.yj * b.yj) - s1.s * s2.s / n.n AS c
        FROM yd a JOIN yd b ON a.k = b.k
        JOIN sy s1 ON s1.j = a.j JOIN sy s2 ON s2.j = b.j, n
        GROUP BY a.j, b.j, s1.s, s2.s, n.n),
    h AS (SELECT SUM(c * c) AS hsic FROM cxy),
    nx AS (SELECT sqrt(SUM(c * c)) AS nrm FROM cxx),
    ny AS (SELECT sqrt(SUM(c * c)) AS nrm FROM cyy)
    SELECT CAST(n.n AS BIGINT) AS n_pairs,
           ROUND(h.hsic, 6) AS hsic_xy,
           ROUND(nx.nrm, 6) AS norm_x,
           ROUND(ny.nrm, 6) AS norm_y,
           ROUND(h.hsic / NULLIF(nx.nrm * ny.nrm, 0), 6) AS linear_cka
    FROM n, h, nx, ny
    """,
    doc="Linear CKA (centered kernel alignment, Kornblith et al. 2019) "
    "between the even- and odd-id embedding spaces (the q355 pairing): "
    "CKA = ||Ybar'Xbar||_F^2 / (||Xbar'Xbar||_F ||Ybar'Ybar||_F) over "
    "mean-centered matrices -- THE standard representation-similarity "
    "score for comparing encoder versions, and the rotation-invariant "
    "complement to q355's Procrustes residual (CKA answers 'how similar "
    "are the geometries', Procrustes gives the map).  Unlike q296/q355 "
    "no eigensolver appears: the statistic is rational in the three "
    "d^2-sized centered Gram matrices, so BOTH sides stay fully "
    "declarative and the oracle replays the whole computation -- no "
    "driver-side linear algebra anywhere.  Plan: one pairing shuffle, "
    "one Arrow kernel emitting Sxy/Sxx/Syy/sums partials per batch "
    "(three numpy matmuls), one d^2-bounded hash-agg, centered-cell "
    "algebra over the 3x4096-row frames; at 100 TB only d^2 partials "
    "move.",
)
def q363_linear_cka(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ev = e.filter(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") / 2).cast("bigint").alias("k"), F.col("v").alias("x")
    )
    od = e.filter(F.col("vec_id") % 2 == 1).select(
        (F.col("vec_id") / 2).cast("bigint").alias("k"), F.col("v").alias("y")
    )
    pairs = ev.join(od, "k")
    d = _DIMS
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    fi, fj = ii.ravel(), jj.ravel()

    # One kernel, one downstream hash-agg.  Encoding in (m, i, j, v):
    #   m=0: partial X'Y cell sums    m=1: X'X    m=2: Y'Y
    #   m=3, j=-1: per-dim x sums     m=4, j=-1: per-dim y sums
    #   m=5, i=j=-1: pair count
    def cka_partials(batches):
        for pdf in batches:
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["x"]])
            Y = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["y"]])
            sxy = (X.T @ Y).ravel()
            sxx = (X.T @ X).ravel()
            syy = (Y.T @ Y).ravel()
            yield pd.DataFrame(
                {
                    "m": np.concatenate(
                        [
                            np.full(d * d, 0), np.full(d * d, 1),
                            np.full(d * d, 2), np.full(d, 3), np.full(d, 4),
                            [5],
                        ]
                    ),
                    "i": np.concatenate(
                        [fi, fi, fi, np.arange(d), np.arange(d), [-1]]
                    ),
                    "j": np.concatenate(
                        [fj, fj, fj, np.full(d, -1), np.full(d, -1), [-1]]
                    ),
                    "v": np.concatenate(
                        [sxy, sxx, syy, X.sum(axis=0), Y.sum(axis=0),
                         [float(len(pdf))]]
                    ),
                }
            )

    tot = (
        pairs.mapInPandas(cka_partials, "m int, i int, j int, v double")
        .groupBy("m", "i", "j")
        .agg(F.sum("v").alias("v"))
        .localCheckpoint(eager=True)  # six consumers below (rule 9)
    )
    n = tot.filter(F.col("m") == 5).select(F.col("v").alias("n"))
    sx = tot.filter(F.col("m") == 3).select(F.col("i"), F.col("v").alias("sxi"))
    sy = tot.filter(F.col("m") == 4).select(
        F.col("i").alias("j"), F.col("v").alias("syj")
    )
    sx2 = sx.select(F.col("i").alias("j"), F.col("sxi").alias("sxj"))
    sy2 = sy.select(F.col("j").alias("i"), F.col("syj").alias("syi"))

    def centered_sq_sum(m, left, right, lc, rc):
        cells = tot.filter(F.col("m") == m).select("i", "j", "v")
        c = (
            cells.join(F.broadcast(left), "i")
            .join(F.broadcast(right), "j")
            .crossJoin(F.broadcast(n))
            .select(
                (F.col("v") - F.col(lc) * F.col(rc) / F.col("n")).alias("c")
            )
        )
        return c.agg(F.sum(F.col("c") * F.col("c")).alias("ss"))

    hs = centered_sq_sum(0, sx, sy, "sxi", "syj").select(F.col("ss").alias("hsic"))
    nx = centered_sq_sum(1, sx, sx2, "sxi", "sxj").select(
        F.sqrt("ss").alias("norm_x")
    )
    ny = centered_sq_sum(2, sy2, sy, "syi", "syj").select(
        F.sqrt("ss").alias("norm_y")
    )
    return (
        n.crossJoin(F.broadcast(hs))
        .crossJoin(F.broadcast(nx))
        .crossJoin(F.broadcast(ny))
        .select(
            F.col("n").cast("bigint").alias("n_pairs"),
            F.round("hsic", 6).alias("hsic_xy"),
            F.round("norm_x", 6).alias("norm_x"),
            F.round("norm_y", 6).alias("norm_y"),
            F.round(
                F.col("hsic")
                / F.nullif(F.col("norm_x") * F.col("norm_y"), F.lit(0.0)),
                6,
            ).alias("linear_cka"),
        )
    )


# ---------------------------------------------------------------------------
# q364: Ledoit-Wolf covariance shrinkage intensity
# ---------------------------------------------------------------------------


@register(
    "q364_ledoit_wolf",
    sql="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dims AS (
        SELECT vec_id, generate_subscripts(v, 1) - 1 AS i, unnest(v) AS x FROM e),
    mu AS (SELECT i, AVG(x) AS m FROM dims GROUP BY i),
    n AS (SELECT COUNT(*) AS n FROM e),
    d AS (SELECT COUNT(*) AS d FROM mu),
    s AS (
        SELECT a.i, b.i AS j,
               SUM((a.x - ma.m) * (b.x - mb.m)) / n.n AS s
        FROM dims a JOIN dims b ON a.vec_id = b.vec_id
        JOIN mu ma ON ma.i = a.i JOIN mu mb ON mb.i = b.i, n
        GROUP BY a.i, b.i, n.n),
    m2 AS (
        SELECT SUM(CASE WHEN i = j THEN s ELSE 0 END) AS tr,
               SUM(s * s) AS frob2
        FROM s),
    q4 AS (
        SELECT SUM(POW(cs, 2)) AS sum4 FROM (
            SELECT SUM(POW(dims.x - mu.m, 2)) AS cs
            FROM dims JOIN mu ON mu.i = dims.i
            GROUP BY dims.vec_id)),
    terms AS (
        SELECT m2.tr / d.d AS mu_hat,
               m2.frob2 - POW(m2.tr, 2) / d.d AS d2,
               (q4.sum4 / n.n - m2.frob2) / n.n AS b2_raw
        FROM m2, q4, n, d)
    SELECT CAST(n.n AS BIGINT) AS n_vectors,
           CAST(d.d AS BIGINT) AS n_dims,
           ROUND(terms.mu_hat, 6) AS mu_hat,
           ROUND(terms.d2, 6) AS dispersion_sq,
           ROUND(LEAST(terms.b2_raw, terms.d2), 9) AS beta_sq,
           ROUND(LEAST(terms.b2_raw, terms.d2) / NULLIF(terms.d2, 0), 6)
               AS shrinkage_lambda
    FROM terms, n, d
    """,
    doc="Ledoit-Wolf covariance shrinkage intensity: for S the MLE "
    "covariance and target mu*I, lambda* = min(b^2, d^2)/d^2 with "
    "d^2 = ||S - mu I||_F^2 and b^2 = (1/n) avg_k ||x_k x_k' - S||_F^2 "
    "-- the well-conditioned-covariance recipe every downstream "
    "whitening (q301), Mahalanobis gate (q267) or PQ codebook (q161) "
    "should use when n/d is small.  NO eigensolver: the intensity is a "
    "pure moment functional -- the fourth-moment term reduces to "
    "sum_k ||x_k - xbar||^4 (computed against the broadcast mean in a "
    "second scan), everything else comes from the q295 sufficient "
    "statistics; both engines spell the same algebra, so the oracle "
    "replays it fully.  beta_sq rounds at 9 (it is ~1/n-sized).  Plan: "
    "two corpus scans (stats, then centered fourth moments), d^2-"
    "bounded shuffles, single-row combine.",
)
def q364_ledoit_wolf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .wave18 import covariance_stats

    # Scan 1: sufficient statistics -> MLE covariance moments + mean.
    cs = covariance_stats(spark, sf_dir).localCheckpoint(eager=True)
    # S_ij (MLE, /n) from sxy/si/sj/n; upper triangle -> count off-diagonals
    # twice in the Frobenius sum.
    s_cell = (F.col("sxy") - F.col("si") * F.col("sj") / F.col("n")) / F.col("n")
    m2 = cs.agg(
        F.sum(F.when(F.col("i") == F.col("j"), s_cell).otherwise(0.0)).alias("tr"),
        F.sum(
            F.when(F.col("i") == F.col("j"), s_cell * s_cell).otherwise(
                2.0 * s_cell * s_cell
            )
        ).alias("frob2"),
        F.max("n").alias("n"),
    )
    mean_row = (
        cs.filter(F.col("i") == F.col("j"))
        .select("i", (F.col("si") / F.col("n")).alias("m"))
        .orderBy("i")
        .collect()
    )
    mean = [float(r["m"]) for r in mean_row]
    d = len(mean)
    mean_lit = F.array(*[F.lit(v) for v in mean])
    # Scan 2: sum over rows of ||x - xbar||^4.
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    csq = F.aggregate(
        F.zip_with("v", mean_lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    q4 = e.agg(F.sum(F.pow(csq, 2)).alias("sum4"))
    j = m2.crossJoin(F.broadcast(q4))
    mu_hat = F.col("tr") / d
    d2 = F.col("frob2") - F.pow(F.col("tr"), 2) / d
    b2_raw = (F.col("sum4") / F.col("n") - F.col("frob2")) / F.col("n")
    beta = F.least(b2_raw, d2)
    return j.select(
        F.col("n").cast("bigint").alias("n_vectors"),
        F.lit(d).cast("bigint").alias("n_dims"),
        F.round(mu_hat, 6).alias("mu_hat"),
        F.round(d2, 6).alias("dispersion_sq"),
        F.round(beta, 9).alias("beta_sq"),
        F.round(beta / F.nullif(d2, F.lit(0.0)), 6).alias("shrinkage_lambda"),
    )


# ---------------------------------------------------------------------------
# q365: systematic PPS (probability-proportional-to-size) sampling
# ---------------------------------------------------------------------------

_PPS_K = 100  # selection points
_PPS_BUCKETS = 256


@register(
    "q365_pps_systematic",
    sql=f"""
    WITH d AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS w FROM documents),
    tot AS (SELECT SUM(w) AS t FROM d),
    c AS (
        SELECT doc_id, w,
               SUM(w) OVER (ORDER BY doc_id) AS cum
        FROM d),
    sel AS (
        SELECT c.doc_id, c.w, c.cum,
               CAST(floor((c.cum - 0.5 * (tot.t / {_PPS_K}.0)) / (tot.t / {_PPS_K}.0))
                    AS BIGINT)
               - CAST(floor((c.cum - c.w - 0.5 * (tot.t / {_PPS_K}.0))
                            / (tot.t / {_PPS_K}.0)) AS BIGINT) AS hits
        FROM c, tot)
    SELECT doc_id, w AS weight, CAST(cum AS BIGINT) AS cum_weight,
           CAST(hits AS BIGINT) AS n_hits
    FROM sel WHERE hits > 0
    ORDER BY doc_id
    """,
    doc=f"Systematic PPS sampling (probability proportional to size, "
    f"size = n_chars, {_PPS_K} equally spaced selection points at "
    "(j+0.5)*step over the cumulative weight axis): a doc is selected "
    "once per selection point inside its cumulative interval, so "
    "inclusion probability is exactly proportional to weight and "
    "oversize docs surface as n_hits > 1 (certainty units) -- the "
    "survey-sampling workhorse complementing q209's Bernoulli weighted "
    "sample and q330's reservoir (systematic PPS has ZERO variance in "
    "the sample's total-weight coverage).  Selection compares "
    "floor((cum - 0.5*step)/step) across interval ends with cum/w "
    "exact BIGINTs and step the same IEEE division in both engines -- "
    "identical doubles, identical floors.  The registered form uses "
    "the single-partition cumulative window for oracle parity; the "
    "100 TB spelling is the q230/q193 two-phase pattern (per-bucket "
    "cumsum + broadcast bucket offsets over doc_id ranges), which is "
    "plan-shape-tested in test_plans and yields the identical cum "
    "column.  One corpus scan either way.",
)
def q365_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("w")
    )
    # Two-phase distributed cumulative sum (the q230/q193 pattern): bucket
    # by doc_id range, per-bucket ordered cumsum (partitioned, parallel),
    # plus broadcast per-bucket offsets -- no corpus-wide single-partition
    # window.
    rng = d.agg(
        F.min("doc_id").alias("lo"), (F.max("doc_id") + 1).alias("hi")
    )
    b = d.crossJoin(F.broadcast(rng)).select(
        "doc_id",
        "w",
        F.width_bucket(F.col("doc_id").cast("double"), F.col("lo").cast("double"), F.col("hi").cast("double"), F.lit(_PPS_BUCKETS)).alias("b"),
    )
    b = b.localCheckpoint(eager=True)  # feeds offsets, totals and the cumsum
    offsets = (
        b.groupBy("b")
        .agg(F.sum("w").alias("bw"))
        .select(
            "b",
            F.coalesce(
                F.sum("bw").over(
                    Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("off"),
        )
    )
    tot = b.agg(F.sum("w").cast("double").alias("t"))
    wcum = Window.partitionBy("b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    step = F.col("t") / float(_PPS_K)
    c = (
        b.withColumn("pcum", F.sum("w").over(wcum))
        .join(F.broadcast(offsets), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "w",
            (F.col("off") + F.col("pcum")).alias("cum"),
            step.alias("step"),
        )
    )
    hits = F.floor(
        (F.col("cum") - 0.5 * F.col("step")) / F.col("step")
    ).cast("bigint") - F.floor(
        (F.col("cum") - F.col("w") - 0.5 * F.col("step")) / F.col("step")
    ).cast("bigint")
    return (
        c.select(
            "doc_id",
            F.col("w").alias("weight"),
            F.col("cum").cast("bigint").alias("cum_weight"),
            hits.alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q366: linear-time MMD^2 between two label groups' embeddings
# ---------------------------------------------------------------------------

_MMD_GAMMA = 0.5
_MMD_A = 0
_MMD_B = 1


@register(
    "q366_linear_mmd",
    sql=f"""
    WITH xa AS (
        SELECT CAST(embedding AS DOUBLE[]) AS v,
               ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS r
        FROM embeddings WHERE label = {_MMD_A}),
    xb AS (
        SELECT CAST(embedding AS DOUBLE[]) AS v,
               ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS r
        FROM embeddings WHERE label = {_MMD_B}),
    px AS (
        SELECT a.r // 2 AS g,
               MAX(CASE WHEN a.r % 2 = 0 THEN a.v END) AS x1,
               MAX(CASE WHEN a.r % 2 = 1 THEN a.v END) AS x2
        FROM xa a GROUP BY a.r // 2),
    py AS (
        SELECT b.r // 2 AS g,
               MAX(CASE WHEN b.r % 2 = 0 THEN b.v END) AS y1,
               MAX(CASE WHEN b.r % 2 = 1 THEN b.v END) AS y2
        FROM xb b GROUP BY b.r // 2),
    quads AS (
        SELECT px.x1, px.x2, py.y1, py.y2
        FROM px JOIN py ON px.g = py.g
        WHERE px.x2 IS NOT NULL AND py.y2 IS NOT NULL),
    h AS (
        SELECT exp(-{_MMD_GAMMA} * list_sum(list_transform(
                   generate_series(1, len(x1)), i -> POW(x1[i] - x2[i], 2))))
             + exp(-{_MMD_GAMMA} * list_sum(list_transform(
                   generate_series(1, len(y1)), i -> POW(y1[i] - y2[i], 2))))
             - exp(-{_MMD_GAMMA} * list_sum(list_transform(
                   generate_series(1, len(x1)), i -> POW(x1[i] - y2[i], 2))))
             - exp(-{_MMD_GAMMA} * list_sum(list_transform(
                   generate_series(1, len(x2)), i -> POW(x2[i] - y1[i], 2))))
               AS hval
        FROM quads)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_quads,
           ROUND(AVG(hval), 9) + 0.0 AS mmd2_linear,
           ROUND(stddev_samp(hval) / sqrt(COUNT(*)), 9) + 0.0 AS se
    FROM h
    """,
    doc=f"Linear-time MMD^2 (Gretton et al. 2012, lemma 14) between label-"
    f"{_MMD_A} and label-{_MMD_B} embeddings under an RBF kernel "
    f"(gamma={_MMD_GAMMA}): consecutive same-label vectors (by vec_id "
    "rank) pair into quads (x1,x2,y1,y2) and h = k(x1,x2) + k(y1,y2) - "
    "k(x1,y2) - k(x2,y1) averages to an unbiased MMD^2 estimate with a "
    "sample standard error -- the embedding-space two-sample shift test "
    "(does source/model A produce a different embedding DISTRIBUTION "
    "than B?), complementing q254's histogram JS divergence and q232's "
    "PSI.  The QUADRATIC MMD is an n^2 kernel sum -- a scale-killer; "
    "the linear estimator is one scan with a deterministic rank "
    "pairing, trading statistical efficiency for O(n), which is the "
    "100 TB tradeoff this engine makes everywhere (q52 vs q51).  "
    "Kernel values are identical IEEE exp/pow compositions in both "
    "engines; the only reduce-order float is the final average, "
    "rounded at 9.  Plan: two two-phase global ranks (q230's bucketed "
    "row_number + broadcast offsets -- no single-partition window over "
    "a label group), one rank-pair equi-join, one aggregate.",
)
def q366_linear_mmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )

    def ranked(label, out):
        # Two-phase global rank (the q230/q193 pattern): bucket by vec_id
        # range, per-bucket row_number (partitioned, parallel) + broadcast
        # bucket-count offsets -- the label frame never funnels through a
        # single-partition window.
        g = e.filter(F.col("label") == label).select("vec_id", "v")
        rng = g.agg(
            F.min("vec_id").cast("double").alias("lo"),
            (F.max("vec_id") + 1).cast("double").alias("hi"),
        )
        b = g.crossJoin(F.broadcast(rng)).select(
            "vec_id",
            "v",
            F.width_bucket(
                F.col("vec_id").cast("double"), "lo", "hi", F.lit(256)
            ).alias("b"),
        )
        b = b.localCheckpoint(eager=True)  # feeds offsets AND the rank
        offsets = (
            b.groupBy("b")
            .agg(F.count("*").alias("m"))
            .select(
                "b",
                F.coalesce(
                    F.sum("m").over(
                        Window.orderBy("b").rowsBetween(
                            Window.unboundedPreceding, -1
                        )
                    ),
                    F.lit(0),
                ).alias("off"),
            )
        )
        w = Window.partitionBy("b").orderBy("vec_id")
        return (
            b.withColumn("pr", F.row_number().over(w))
            .join(F.broadcast(offsets), "b")
            .select(
                F.col("v").alias(out),
                (F.col("off") + F.col("pr") - 1).alias("r"),
            )
        )

    def paired(df, c, c1, c2):
        return (
            df.groupBy(F.floor(F.col("r") / 2).alias("g"))
            .agg(
                F.max(F.when(F.col("r") % 2 == 0, F.col(c))).alias(c1),
                F.max(F.when(F.col("r") % 2 == 1, F.col(c))).alias(c2),
            )
        )

    px = paired(ranked(_MMD_A, "x"), "x", "x1", "x2")
    py = paired(ranked(_MMD_B, "y"), "y", "y1", "y2")
    quads = (
        px.join(py, "g")
        .filter(F.col("x2").isNotNull() & F.col("y2").isNotNull())
    )

    def k(a, b):
        sq = F.aggregate(
            F.zip_with(a, b, lambda p, q: (p - q) * (p - q)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.exp(-_MMD_GAMMA * sq)

    h = quads.select(
        (
            k("x1", "x2") + k("y1", "y2") - k("x1", "y2") - k("x2", "y1")
        ).alias("hval")
    )
    return h.agg(
        F.count("*").cast("bigint").alias("n_quads"),
        (F.round(F.avg("hval"), 9) + F.lit(0.0)).alias("mmd2_linear"),
        (
            F.round(F.stddev_samp("hval") / F.sqrt(F.count("*")), 9) + F.lit(0.0)
        ).alias("se"),
    )


# ---------------------------------------------------------------------------
# q367: STREAMING KMV distinct-user sketch (bottom-k set state)
# ---------------------------------------------------------------------------

_SKMV_K = 32
_SKMV_SALT = "skmv9|"
_SKMV_SCALE = float(1 << 60)


def _skmv_schemas():
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("sketch_size", LongType()),
            StructField("kth_u", DoubleType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("us", ArrayType(DoubleType())),
            StructField("n_events", LongType()),
        ]
    )
    return out_schema, state_schema


def _skmv_update(k: int):
    """Bottom-k SET state kernel: merge = k smallest of the set union.
    Hashes arrive as JVM expressions (salted md5 / 2^60); the kernel only
    unions, sorts and truncates -- set union is associative, commutative
    AND idempotent, so the final state is independent of the micro-batch
    split and of duplicate arrivals: streaming == batch, hence the full
    value oracle."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    def update(key, pdfs, state: GroupState):
        if state.exists:
            us, n_events = state.get
            pool = set(us)
        else:
            pool, n_events = set(), 0
        for pdf in pdfs:
            n_events += len(pdf)
            pool.update(float(u) for u in pdf["u"])
        sk = sorted(pool)[:k]
        state.update(([float(u) for u in sk], n_events))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "sketch_size": [len(sk)],
                "kth_u": [float(sk[-1]) if len(sk) == k else None],
                "n_events": [n_events],
            }
        )

    return update


@register(
    "q367_stream_kmv_distinct",
    sql=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(CAST('0x' || substr(md5('{_SKMV_SALT}' || user_id), 1, 15)
                    AS BIGINT) AS DOUBLE) / {_SKMV_SCALE} AS u
        FROM events),
    ranked AS (
        SELECT event_type, u,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS nd
        FROM h),
    sk AS (
        SELECT event_type,
               CAST(LEAST(MAX(nd), {_SKMV_K}) AS BIGINT) AS sketch_size,
               MAX(CASE WHEN rn = {_SKMV_K} THEN u END) AS kth_u
        FROM ranked WHERE rn <= {_SKMV_K}
        GROUP BY event_type),
    cnt AS (SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY 1)
    SELECT sk.event_type, sk.sketch_size,
           CAST(cnt.n_events AS BIGINT) AS n_events,
           ROUND(CASE WHEN sk.sketch_size < {_SKMV_K}
                      THEN CAST(sk.sketch_size AS DOUBLE)
                      ELSE ({_SKMV_K} - 1) / sk.kth_u END, 6) AS distinct_users_est
    FROM sk JOIN cnt ON sk.event_type = cnt.event_type
    ORDER BY sk.event_type
    """,
    doc=f"STREAMING distinct-user cardinality per event_type via a KMV "
    f"bottom-{_SKMV_K} sketch in applyInPandasWithState -- q356's sketch "
    "as a stateful streaming operator.  The state is the k smallest "
    "salted-md5 user hashes (a SET): bottom-k set union is associative, "
    "commutative and idempotent, so the final state equals the batch "
    "computation under ANY micro-batch split and under duplicate "
    "arrivals -- which upgrades this STREAMING query to a FULL batch "
    "value oracle (the q340 associativity argument; HLL-class sketches "
    "q24/q128 only get invariant bands).  Hashes are computed as JVM "
    "expressions before the kernel (the q340 discipline: Python only "
    "unions/sorts/truncates); the estimator (k-1)/u_(k) replays "
    "bit-identically in DuckDB.  Plan: file-replay stream -> stateful "
    "per-key kernel with O(k) state per event_type; the drain keeps "
    "each key's final emission (max n_events).",
)
def q367_stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..streaming.pipeline import run_to_memory
    from ..streaming.source import events_stream

    out_schema, state_schema = _skmv_schemas()
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(_SKMV_SALT), F.col("user_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    stream = events_stream(spark, sf_dir).select(
        "event_type", (h.cast("double") / F.lit(_SKMV_SCALE)).alias("u")
    )
    res = stream.groupBy("event_type").applyInPandasWithState(
        _skmv_update(_SKMV_K),
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    table = run_to_memory(res, output_mode="update")
    final = (
        spark.table(table)
        .withColumn(
            "mx", F.max("n_events").over(Window.partitionBy("event_type"))
        )
        .filter(F.col("n_events") == F.col("mx"))
    )
    est = F.when(
        F.col("sketch_size") < _SKMV_K, F.col("sketch_size").cast("double")
    ).otherwise((_SKMV_K - 1) / F.col("kth_u"))
    return final.select(
        "event_type",
        "sketch_size",
        "n_events",
        F.round(est, 6).alias("distinct_users_est"),
    ).orderBy("event_type")
