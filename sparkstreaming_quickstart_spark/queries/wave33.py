"""Wave-33 operators (round 9): calibration, causal matching, spectral
alignment, mergeable distinct sketches and robust trend estimation -- the
remaining evaluation/experimentation surface a training-data platform runs
next to its curation pipeline.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md
section-2.B statistics/experimentation/sketch families.

Engine-exactness notes (the round-2+ disciplines):
- q353's PAV fit uses the minimax identity fitted_k = max_{i<=k} min_{j>=k}
  avg(i..j); every avg is one IEEE division of exact BIGINT prefix-sum
  differences, so both engines compare IDENTICAL doubles -- the fit needs
  no rounding tolerance at all.
- q354/q357/q358 aggregate money as exact integer cents (the q283
  pattern) and only divide at the final projection.
- q355 verifies a driver-side SVD through its even spectral moments
  (sum sigma^2 = ||M||_F^2, sum sigma^4 = tr((M'M)^2)) -- the q296
  moment-matching trick, which a SQL oracle CAN compute from the matrix
  cells without an eigensolver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q353: isotonic calibration (pool-adjacent-violators via the minimax form)
# ---------------------------------------------------------------------------

_ISO_BAND = 25.0
_ISO_MAX_BAND = 19


@register(
    "q353_isotonic_calibration",
    sql=f"""
    WITH e AS (
        SELECT LEAST(CAST(floor(value / {_ISO_BAND}) AS BIGINT), {_ISO_MAX_BAND}) AS band,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events),
    b AS (SELECT band, COUNT(*) AS n, SUM(y) AS s FROM e GROUP BY band),
    p AS (
        SELECT band, n, s,
               SUM(n) OVER (ORDER BY band) AS cn,
               SUM(s) OVER (ORDER BY band) AS cs
        FROM b),
    pr AS (
        SELECT a.band AS i, c.band AS j,
               CAST(c.cs - (a.cs - a.s) AS DOUBLE) / (c.cn - (a.cn - a.n)) AS avg_ij
        FROM p a JOIN p c ON a.band <= c.band),
    lo AS (
        SELECT pr.i, k.band AS k, MIN(pr.avg_ij) AS m
        FROM pr JOIN p k ON pr.i <= k.band AND k.band <= pr.j
        GROUP BY pr.i, k.band),
    fit AS (SELECT k, MAX(m) AS fitted FROM lo GROUP BY k)
    SELECT p.band, CAST(p.n AS BIGINT) AS n, CAST(p.s AS BIGINT) AS n_pos,
           ROUND(CAST(p.s AS DOUBLE) / p.n, 6) AS raw_rate,
           ROUND(fit.fitted, 6) AS fitted_rate
    FROM p JOIN fit ON p.band = fit.k
    ORDER BY p.band
    """,
    doc="Isotonic calibration by pool-adjacent-violators, spelled as the "
    "PAV minimax identity: fitted_k = max over i<=k of min over j>=k of "
    "the pooled rate of bins i..j -- the calibration step between a "
    "quality-classifier score (q299) and a usable keep-probability, and "
    "the standard monotone regressor behind reliability diagrams "
    f"(q247).  Events band at floor(value/{_ISO_BAND}) capped at "
    f"{_ISO_MAX_BAND}; y = is-purchase.  Every pooled rate is ONE IEEE "
    "division of exact BIGINT prefix-sum differences, so the min/max "
    "lattice compares bit-identical doubles in both engines and the fit "
    "is engine-exact before any display rounding.  Plan: one corpus "
    "scan to the ~20-row band table; the O(B^3) minimax lattice runs on "
    "that bounded frame (B<=20 -> 1.5k rows), never on data -- at "
    "100 TB the cost is the same 20-band hash-agg.",
)
def q353_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    b = (
        e.select(
            F.least(
                F.floor(F.col("value") / _ISO_BAND).cast("bigint"),
                F.lit(_ISO_MAX_BAND),
            ).alias("band"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n"), F.sum("y").alias("s"))
    )
    # Bounded band frame feeds the pair lattice three times (rule 9).
    p = b.select(
        "band",
        "n",
        "s",
        F.sum("n").over(Window.orderBy("band")).alias("cn"),
        F.sum("s").over(Window.orderBy("band")).alias("cs"),
    ).localCheckpoint(eager=True)
    a = p.select(
        F.col("band").alias("i"),
        (F.col("cs") - F.col("s")).alias("cs0"),
        (F.col("cn") - F.col("n")).alias("cn0"),
    )
    c = p.select(F.col("band").alias("j"), "cs", "cn")
    pr = (
        a.crossJoin(F.broadcast(c))
        .filter(F.col("i") <= F.col("j"))
        .select(
            "i",
            "j",
            (
                (F.col("cs") - F.col("cs0")).cast("double")
                / (F.col("cn") - F.col("cn0"))
            ).alias("avg_ij"),
        )
    )
    k = p.select(F.col("band").alias("k"))
    lo = (
        pr.crossJoin(F.broadcast(k))
        .filter((F.col("i") <= F.col("k")) & (F.col("k") <= F.col("j")))
        .groupBy("i", "k")
        .agg(F.min("avg_ij").alias("m"))
    )
    fit = lo.groupBy("k").agg(F.max("m").alias("fitted"))
    return (
        p.join(fit, p["band"] == fit["k"])
        .select(
            "band",
            F.col("n").cast("bigint").alias("n"),
            F.col("s").cast("bigint").alias("n_pos"),
            F.round(F.col("s").cast("double") / F.col("n"), 6).alias("raw_rate"),
            F.round("fitted", 6).alias("fitted_rate"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# q354: coarsened exact matching (CEM) -> ATT estimate
# ---------------------------------------------------------------------------


@register(
    "q354_cem_att",
    sql="""
    WITH u AS (
        SELECT user_id,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y_cents,
               MIN_BY(event_type, ts) AS first_type
        FROM events GROUP BY user_id),
    cov AS (
        SELECT user_id, y_cents,
               CASE WHEN first_type = 'error' THEN 1 ELSE 0 END AS treated,
               LEAST(n_events // 25, 3) AS act_band,
               LEAST(cents // (n_events * 2500), 3) AS val_band
        FROM u),
    strata AS (
        SELECT act_band, val_band,
               CAST(SUM(treated) AS BIGINT) AS n_t,
               CAST(COUNT(*) - SUM(treated) AS BIGINT) AS n_c,
               SUM(CASE WHEN treated = 1 THEN y_cents ELSE 0 END) AS sy_t,
               SUM(CASE WHEN treated = 0 THEN y_cents ELSE 0 END) AS sy_c
        FROM cov GROUP BY 1, 2),
    matched AS (SELECT * FROM strata WHERE n_t > 0 AND n_c > 0),
    att AS (
        SELECT SUM(CAST(n_t AS DOUBLE)
                   * (CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c))
               / SUM(n_t) AS att_cents,
               CAST(SUM(n_t) AS BIGINT) AS n_t_matched
        FROM matched)
    SELECT m.act_band, m.val_band, m.n_t AS n_treated, m.n_c AS n_control,
           ROUND(CAST(m.sy_t AS DOUBLE) / m.n_t, 4) AS mean_y_treated_cents,
           ROUND(CAST(m.sy_c AS DOUBLE) / m.n_c, 4) AS mean_y_control_cents,
           ROUND(CAST(m.sy_t AS DOUBLE) / m.n_t
                 - CAST(m.sy_c AS DOUBLE) / m.n_c, 4) + 0.0 AS stratum_diff_cents,
           att.n_t_matched,
           ROUND(att.att_cents, 4) + 0.0 AS att_cents
    FROM matched m, att
    ORDER BY m.act_band, m.val_band
    """,
    doc="Coarsened exact matching (CEM, Iacus-King-Porro) with an ATT "
    "estimate: units are users, 'treatment' is a deterministic exposure "
    "proxy (first observed event is an error), covariates coarsen to "
    "exact bands (activity quartile-ish bins n_events//25, spend-rate "
    "bins on integer cents -- all integer arithmetic, no float "
    "boundaries), and only strata containing BOTH arms match.  "
    "ATT = sum_s (t_s/T)(ybar_t,s - ybar_c,s) over matched strata -- "
    "the experimentation companion to q276's diff-in-diff and q277's "
    "power analysis for when assignment was NOT randomized.  Outcome "
    "sums are exact BIGINT cents; the only floats are the final per-"
    "stratum means.  Plan: one events scan -> per-user hash-agg -> "
    "strata hash-agg (bounded 4x4 frame) -> broadcast 1-row ATT attach; "
    "at 100 TB the strata frame is still 16 rows.",
)
def q354_cem_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    u = e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(cents).alias("cents"),
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0)).alias(
            "y_cents"
        ),
        F.min_by("event_type", "ts").alias("first_type"),
    )
    cov = u.select(
        "y_cents",
        F.when(F.col("first_type") == "error", 1).otherwise(0).alias("treated"),
        F.least(F.floor(F.col("n_events") / 25).cast("bigint"), F.lit(3)).alias(
            "act_band"
        ),
        F.least(
            F.floor(F.col("cents") / (F.col("n_events") * 2500)).cast("bigint"),
            F.lit(3),
        ).alias("val_band"),
    )
    strata = cov.groupBy("act_band", "val_band").agg(
        F.sum("treated").cast("bigint").alias("n_t"),
        (F.count("*") - F.sum("treated")).cast("bigint").alias("n_c"),
        F.sum(F.when(F.col("treated") == 1, F.col("y_cents")).otherwise(0)).alias(
            "sy_t"
        ),
        F.sum(F.when(F.col("treated") == 0, F.col("y_cents")).otherwise(0)).alias(
            "sy_c"
        ),
    )
    matched = strata.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    matched = matched.localCheckpoint(eager=True)  # feeds ATT and the rollup
    mean_t = F.col("sy_t").cast("double") / F.col("n_t")
    mean_c = F.col("sy_c").cast("double") / F.col("n_c")
    att = matched.agg(
        (
            F.sum(F.col("n_t").cast("double") * (mean_t - mean_c)) / F.sum("n_t")
        ).alias("att_cents"),
        F.sum("n_t").cast("bigint").alias("n_t_matched"),
    )
    return (
        matched.crossJoin(F.broadcast(att))
        .select(
            "act_band",
            "val_band",
            F.col("n_t").alias("n_treated"),
            F.col("n_c").alias("n_control"),
            F.round(mean_t, 4).alias("mean_y_treated_cents"),
            F.round(mean_c, 4).alias("mean_y_control_cents"),
            (F.round(mean_t - mean_c, 4) + F.lit(0.0)).alias("stratum_diff_cents"),
            "n_t_matched",
            (F.round(F.col("att_cents"), 4) + F.lit(0.0)).alias("att_cents"),
        )
        .orderBy("act_band", "val_band")
    )


# ---------------------------------------------------------------------------
# q355: orthogonal Procrustes alignment (SVD via moment-matched oracle)
# ---------------------------------------------------------------------------

_PRO_DIMS = 64


@register(
    "q355_procrustes_alignment",
    sql="""
    WITH ev AS (
        SELECT CAST(vec_id // 2 AS BIGINT) AS k, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 2 = 0),
    od AS (
        SELECT CAST(vec_id // 2 AS BIGINT) AS k, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 2 = 1),
    xd AS (
        SELECT ev.k, generate_subscripts(ev.v, 1) AS i, unnest(ev.v) AS x
        FROM ev JOIN od USING (k)),
    yd AS (
        SELECT od.k, generate_subscripts(od.v, 1) AS j, unnest(od.v) AS y
        FROM ev JOIN od USING (k)),
    m AS (
        SELECT xd.i, yd.j, SUM(xd.x * yd.y) AS mij
        FROM xd JOIN yd ON xd.k = yd.k
        GROUP BY xd.i, yd.j),
    np AS (SELECT COUNT(*) AS n_pairs FROM ev JOIN od USING (k)),
    m2 AS (SELECT SUM(mij * mij) AS frob FROM m),
    mtm AS (
        SELECT a.j AS r, b.j AS c, SUM(a.mij * b.mij) AS v
        FROM m a JOIN m b ON a.i = b.i
        GROUP BY a.j, b.j),
    m4 AS (SELECT SUM(v * v) AS quart FROM mtm)
    SELECT CAST(np.n_pairs AS BIGINT) AS n_pairs,
           ROUND(m2.frob, 6) + 0.0 AS sv_sq_sum,
           ROUND(m4.quart, 6) + 0.0 AS sv_quad_sum,
           ROUND(m2.frob * m2.frob / NULLIF(m4.quart, 0), 6) + 0.0
               AS spectral_eff_rank
    FROM np, m2, m4
    """,
    doc="Orthogonal Procrustes alignment between two embedding spaces "
    "(even vec_ids vs odd vec_ids paired by vec_id//2 -- the standard "
    "probe shape for aligning two encoder versions or two modality "
    "towers): the optimal rotation is W = UV' from the SVD of the cross-"
    "covariance M = X'Y, computed driver-side on the collected 64x64 M "
    "(the q296 bounded-driver-state discipline).  The registered output "
    "verifies the SVD through its even spectral moments, computed FROM "
    "THE SINGULAR VALUES on the Spark side -- sum sigma^2, sum sigma^4, "
    "and the spectral effective rank (sum s^2)^2 / sum s^4 -- while the "
    "oracle computes the SAME invariants from the matrix cells without "
    "any SVD (||M||_F^2 and tr((M'M)^2) via joins over the d^2 cell "
    "table): a wrong spectrum hash-mismatches.  The alignment residual "
    "||XW - Y||_F^2 = ||X||^2 + ||Y||^2 - 2*sum sigma needs the odd "
    "moment, so it stays a library/test concern (procrustes_rotation + "
    "the wave-33 test pins W'W = I and the residual identity).  Plan: "
    "ONE shuffle to pair even/odd rows, one Arrow kernel emitting d^2 "
    "partials per batch (numpy outer-product matmul), one d^2-bounded "
    "hash-agg -- the corpus never moves; at 100 TB only 4096-row "
    "partials shuffle.",
)
def q355_procrustes_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    M, n_pairs = _cross_covariance(spark, sf_dir)
    sv = np.linalg.svd(M, compute_uv=False)
    frob = float((sv * sv).sum())
    quart = float((sv**4).sum())
    eff = round(frob * frob / quart, 6) + 0.0 if quart != 0 else None
    return spark.createDataFrame(
        [(n_pairs, round(frob, 6) + 0.0, round(quart, 6) + 0.0, eff)],
        "n_pairs bigint, sv_sq_sum double, sv_quad_sum double, "
        "spectral_eff_rank double",
    )


def _cross_covariance(spark: SparkSession, sf_dir: str):
    """Collect (M = X'Y, n_pairs) for the even/odd embedding pairing via
    one Arrow kernel emitting d^2-sized partials per batch."""
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
    d = _PRO_DIMS
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")

    def cross_partials(batches):
        for pdf in batches:
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["x"]])
            Y = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["y"]])
            g = X.T @ Y
            yield pd.DataFrame(
                {
                    "i": np.concatenate([ii.ravel(), [-1]]),
                    "j": np.concatenate([jj.ravel(), [-1]]),
                    "v": np.concatenate([g.ravel(), [float(len(pdf))]]),
                }
            )

    tot = (
        pairs.mapInPandas(cross_partials, "i int, j int, v double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    M = np.zeros((d, d))
    n_pairs = 0
    for r in tot:
        if r["i"] < 0:
            n_pairs = int(r["v"])
        else:
            M[r["i"], r["j"]] = r["v"]
    return M, n_pairs


def procrustes_rotation(spark: SparkSession, sf_dir: str):
    """The user-facing artifact: the optimal orthogonal map W = UV' (numpy
    array) aligning the even-id space onto the odd-id space.  Shares
    _cross_covariance with q355, whose value oracle moment-checks the same
    SVD."""
    import numpy as np

    M, _ = _cross_covariance(spark, sf_dir)
    U, _, Vt = np.linalg.svd(M)
    return U @ Vt


# ---------------------------------------------------------------------------
# q356: KMV (k-minimum-values) distinct sketch with union merge
# ---------------------------------------------------------------------------

_KMV_K = 32
_KMV_SALT = "kmv9|"
_KMV_SCALE = float(1 << 60)


@register(
    "q356_kmv_distinct",
    sql=f"""
    WITH docs AS (
        SELECT doc_id, source,
               list_distinct([array_to_string(toks[i:i+2], ' ')
                              FOR i IN range(1, len(toks)-1)]) AS sh
        FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
              FROM documents WHERE length(text) > 0)),
    vocab AS (
        SELECT DISTINCT source, unnest(sh) AS shingle FROM docs),
    hashed AS (
        SELECT source, shingle,
               CAST(CAST('0x' || substr(md5('{_KMV_SALT}' || shingle), 1, 15)
                    AS BIGINT) AS DOUBLE) / {_KMV_SCALE} AS u
        FROM vocab),
    ranked AS (
        SELECT source, u,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY u) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n_exact
        FROM hashed),
    per_source AS (
        SELECT source, CAST(MAX(n_exact) AS BIGINT) AS n_exact,
               CASE WHEN MAX(n_exact) < {_KMV_K}
                    THEN CAST(MAX(n_exact) AS DOUBLE)
                    ELSE ({_KMV_K} - 1) / MAX(CASE WHEN rn = {_KMV_K} THEN u END)
               END AS est
        FROM ranked WHERE rn <= {_KMV_K}
        GROUP BY source),
    pooled AS (
        SELECT DISTINCT u FROM ranked WHERE rn <= {_KMV_K}),
    pooled_rank AS (
        SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS rn FROM pooled),
    union_exact AS (
        SELECT COUNT(DISTINCT shingle) AS n FROM hashed),
    union_row AS (
        SELECT '__union__' AS source,
               CAST(ue.n AS BIGINT) AS n_exact,
               ({_KMV_K} - 1) / MAX(CASE WHEN pr.rn = {_KMV_K} THEN pr.u END) AS est
        FROM pooled_rank pr, union_exact ue
        GROUP BY ue.n),
    allrows AS (
        SELECT source, n_exact, est FROM per_source
        UNION ALL SELECT source, n_exact, est FROM union_row)
    SELECT source, n_exact,
           ROUND(est, 6) AS kmv_estimate,
           ROUND(abs(est - n_exact) / n_exact, 6) AS rel_error
    FROM allrows
    ORDER BY source
    """,
    doc=f"KMV (k-minimum-values, k={_KMV_K}) distinct-count sketch over "
    "each source's 3-shingle vocabulary, with the union-merge law "
    "exercised: the pooled '__union__' row is estimated FROM THE "
    "PER-SOURCE SKETCHES ONLY (bottom-k of the union of bottom-k sets "
    "-- the classic KMV merge: every one of the union's k smallest "
    "hashes is inside some source's k smallest), never from the pooled "
    "vocabulary.  Estimator (k-1)/u_(k) on salted-md5 hashes normalized "
    "to (0,1) by an exact power-of-two division -- fully deterministic, "
    "so unlike HLL (q24/q128's invariant oracles) the sketch replays "
    "bit-identically in DuckDB and carries a FULL value oracle; exact "
    "counts and relative errors ride along as the calibration twin "
    "(q351's minhash-union pattern, for distinct counts instead of "
    "Jaccard).  Sub-k sources fall back to their exact count (the "
    "sketch IS the set).  Plan: shingle explode -> (source, shingle) "
    "distinct -> per-source windowed bottom-k (source-partitioned, "
    "parallel); the merge works on k-sized sketches only -- at 100 TB "
    "per-shard sketches merge on the driver in O(shards * k).",
)
def q356_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_shingles

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    # Round-13 optimization (guide §2.4): the distinct (source, shingle)
    # vocabulary is checkpointed -- it previously fed only the hashing
    # chain, while the union-exact count below RE-EXPLODED the whole corpus
    # a second time; union_exact is now a countDistinct over this
    # materialized vocabulary (identical by definition: distinct shingles
    # overall == distinct shingle values among the distinct (source,
    # shingle) pairs).
    vocab = (
        d.select("source", F.explode(word_shingles("text", 3)).alias("shingle"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # 60-bit salted md5 normalized to (0,1) by an exact power-of-two
    # division -- the wave-31 minhash spelling, DuckDB-identical.
    h60 = F.conv(
        F.substring(F.md5(F.concat(F.lit(_KMV_SALT), F.col("shingle"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    hashed = vocab.select(
        "source",
        "shingle",
        (h60.cast("double") / F.lit(_KMV_SCALE)).alias("u"),
    )
    w = Window.partitionBy("source").orderBy("u")
    ranked = hashed.select(
        "source",
        "u",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n_exact"),
    ).filter(F.col("rn") <= _KMV_K)
    ranked = ranked.localCheckpoint(eager=True)  # feeds per-source AND merge
    per_source = ranked.groupBy("source").agg(
        F.max("n_exact").cast("bigint").alias("n_exact"),
        F.when(
            F.max("n_exact") < _KMV_K, F.max("n_exact").cast("double")
        )
        .otherwise(
            (_KMV_K - 1) / F.max(F.when(F.col("rn") == _KMV_K, F.col("u")))
        )
        .alias("est"),
    )
    pooled = ranked.select("u").distinct()
    pooled_rank = pooled.select(
        "u", F.row_number().over(Window.orderBy("u")).alias("rn")
    )
    union_exact = vocab.agg(F.countDistinct("shingle").alias("n"))
    union_row = (
        pooled_rank.crossJoin(F.broadcast(union_exact))
        .groupBy("n")
        .agg(
            ((_KMV_K - 1) / F.max(F.when(F.col("rn") == _KMV_K, F.col("u")))).alias(
                "est"
            )
        )
        .select(
            F.lit("__union__").alias("source"),
            F.col("n").cast("bigint").alias("n_exact"),
            "est",
        )
    )
    allrows = per_source.unionByName(union_row)
    return allrows.select(
        "source",
        "n_exact",
        F.round("est", 6).alias("kmv_estimate"),
        F.round(F.abs(F.col("est") - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "rel_error"
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q357: Theil-Sen robust trend (median of pairwise slopes)
# ---------------------------------------------------------------------------


@register(
    "q357_theil_sen",
    sql="""
    WITH daily AS (
        SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               SUM(CAST(round(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1),
    slopes AS (
        SELECT CAST(b.y - a.y AS DOUBLE) / (b.d - a.d) AS s
        FROM daily a JOIN daily b ON a.d < b.d),
    sr AS (
        SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn, COUNT(*) OVER () AS cnt
        FROM slopes),
    sen AS (
        SELECT AVG(s) AS slope, MAX(cnt) AS n_pairs FROM sr
        WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)),
    resid AS (
        SELECT daily.d, daily.y - sen.slope * daily.d AS r, sen.slope, sen.n_pairs
        FROM daily, sen),
    rr AS (
        SELECT r, slope, n_pairs,
               ROW_NUMBER() OVER (ORDER BY r) AS rn, COUNT(*) OVER () AS cnt
        FROM resid)
    SELECT CAST(MAX(cnt) AS BIGINT) AS n_days,
           CAST(MAX(n_pairs) AS BIGINT) AS n_pairs,
           ROUND(MAX(slope), 4) AS sen_slope_cents_per_day,
           ROUND(AVG(r), 4) AS sen_intercept_cents
    FROM rr
    WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
    """,
    doc="Theil-Sen robust trend estimator over daily revenue: slope = "
    "median of all pairwise slopes (y_j - y_i)/(j - i), intercept = "
    "median of y_d - slope*d -- the outlier-resistant alternative to "
    "OLS (q153's regr_* family) with a 29.3% breakdown point: a burst "
    "day that would drag the OLS line barely moves the pairwise-slope "
    "median.  Daily revenue aggregates as exact BIGINT cents, every "
    "slope is one IEEE division of exact integers, and both medians use "
    "the explicit middle-rows spelling (AVG of ranks (n+1)//2 and "
    "(n+2)//2 -- identical rows, hence identical doubles, in both "
    "engines; no interpolation formula to disagree on).  Plan: one "
    "corpus scan -> 30-row daily frame; the O(D^2) pair frame (435 "
    "rows) and both rank windows live on that bounded frame -- at "
    "100 TB this is still a 30-row problem after the first hash-agg.",
)
def q357_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
                "d"
            ),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("y"))
        .localCheckpoint(eager=True)  # feeds slopes AND residuals
    )
    a = daily.select(F.col("d").alias("d1"), F.col("y").alias("y1"))
    b = daily.select(F.col("d").alias("d2"), F.col("y").alias("y2"))
    slopes = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("d1") < F.col("d2"))
        .select(
            ((F.col("y2") - F.col("y1")).cast("double") / (F.col("d2") - F.col("d1"))).alias(
                "s"
            )
        )
    )
    sr = slopes.select(
        "s",
        F.row_number().over(Window.orderBy("s")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("cnt"),
    )
    mid = sr.filter(
        (F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("cnt") + 2) / 2))
    )
    sen = mid.agg(F.avg("s").alias("slope"), F.max("cnt").alias("n_pairs"))
    resid = daily.crossJoin(F.broadcast(sen)).select(
        (F.col("y").cast("double") - F.col("slope") * F.col("d")).alias("r"),
        "slope",
        "n_pairs",
    )
    rr = resid.select(
        "r",
        "slope",
        "n_pairs",
        F.row_number().over(Window.orderBy("r")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("cnt"),
    )
    return (
        rr.filter(
            (F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("cnt") + 2) / 2))
        )
        .agg(
            F.max("cnt").cast("bigint").alias("n_days"),
            F.max("n_pairs").cast("bigint").alias("n_pairs"),
            F.round(F.max("slope"), 4).alias("sen_slope_cents_per_day"),
            F.round(F.avg("r"), 4).alias("sen_intercept_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q358: CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------

_CUPED_SALT = "cuped42|"
_CUPED_SPLIT = "2024-01-16"


@register(
    "q358_cuped",
    sql=f"""
    WITH u AS (
        SELECT user_id,
               CAST(CAST('0x' || substr(md5('{_CUPED_SALT}' || user_id), 1, 8)
                    AS BIGINT) % 2 AS INT) AS arm,
               SUM(CASE WHEN CAST(ts AS DATE) < DATE '{_CUPED_SPLIT}'
                        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x,
               SUM(CASE WHEN CAST(ts AS DATE) >= DATE '{_CUPED_SPLIT}'
                        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y
        FROM events GROUP BY user_id),
    mom AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(x AS DOUBLE)) AS sx, SUM(CAST(y AS DOUBLE)) AS sy,
               SUM(CAST(x AS DOUBLE) * y) AS sxy,
               SUM(CAST(x AS DOUBLE) * x) AS sxx,
               SUM(CAST(y AS DOUBLE) * y) AS syy
        FROM u),
    th AS (
        SELECT n, sx / n AS mx,
               (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) AS theta,
               1.0 - (n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0)
                   AS var_ratio
        FROM mom),
    arms AS (
        SELECT arm, COUNT(*) AS na,
               SUM(CAST(y AS DOUBLE)) / COUNT(*) AS my,
               SUM(CAST(x AS DOUBLE)) / COUNT(*) AS mx_a
        FROM u GROUP BY arm),
    w AS (
        SELECT MAX(CASE WHEN arm = 1 THEN my END)
                 - MAX(CASE WHEN arm = 0 THEN my END) AS raw,
               MAX(CASE WHEN arm = 1 THEN mx_a END)
                 - MAX(CASE WHEN arm = 0 THEN mx_a END) AS xdiff,
               CAST(SUM(na) AS BIGINT) AS n_users,
               CAST(MAX(CASE WHEN arm = 1 THEN na END) AS BIGINT) AS n_treat
        FROM arms)
    SELECT w.n_users, w.n_treat,
           ROUND(th.theta, 6) AS theta,
           ROUND(w.raw, 4) + 0.0 AS uplift_raw_cents,
           ROUND(w.raw - th.theta * w.xdiff, 4) + 0.0 AS uplift_cuped_cents,
           ROUND(th.var_ratio, 6) AS var_ratio
    FROM w, th
    """,
    doc="CUPED variance-reduced A/B readout (Deng et al. 2013): arm = "
    "salted-md5 split of user_id (the q208 stable-bucketing contract), "
    "pre-period covariate X = first-15-day cents, outcome Y = last-15-"
    "day cents, theta = cov(X,Y)/var(X) from pooled moments, adjusted "
    "uplift = raw uplift - theta * (pre-period imbalance); var_ratio = "
    "1 - rho^2 is the analytic variance-reduction factor.  Per-user "
    "sums are exact BIGINT cents promoted to double only at the moment "
    "products (the q323 overflow discipline; at 100 TB the bigint "
    "products would overflow, the double sums do not); both engines "
    "spell the single-row algebra identically and the float-reduce "
    "jitter sits ~9 digits under the output rounding.  Plan: one "
    "events scan -> per-user hash-agg -> two 1-row aggregates; the "
    "experiment readout costs one shuffle at any scale.",
)
def q358_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_bucket

    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    split = F.lit(_CUPED_SPLIT).cast("date")
    u = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts").cast("date") < split, cents).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("ts").cast("date") >= split, cents).otherwise(0)).alias("y"),
    ).select(
        md5_bucket(F.col("user_id"), _CUPED_SALT, 2).cast("int").alias("arm"),
        "x",
        "y",
    )
    u = u.localCheckpoint(eager=True)  # feeds pooled moments AND arm means
    xd = F.col("x").cast("double")
    yd = F.col("y").cast("double")
    mom = u.agg(
        F.count("*").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * F.col("y")).alias("sxy"),
        F.sum(xd * F.col("x")).alias("sxx"),
        F.sum(yd * F.col("y")).alias("syy"),
    )
    th = mom.select(
        (F.col("sx") / F.col("n")).alias("mx"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.nullif(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0))
        ).alias("theta"),
        (
            1.0
            - (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.nullif(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
                F.lit(0.0),
            )
        ).alias("var_ratio"),
    )
    arms = u.groupBy("arm").agg(
        F.count("*").alias("na"),
        (F.sum(yd) / F.count("*")).alias("my"),
        (F.sum(xd) / F.count("*")).alias("mx_a"),
    )
    w = arms.agg(
        (
            F.max(F.when(F.col("arm") == 1, F.col("my")))
            - F.max(F.when(F.col("arm") == 0, F.col("my")))
        ).alias("raw"),
        (
            F.max(F.when(F.col("arm") == 1, F.col("mx_a")))
            - F.max(F.when(F.col("arm") == 0, F.col("mx_a")))
        ).alias("xdiff"),
        F.sum("na").cast("bigint").alias("n_users"),
        F.max(F.when(F.col("arm") == 1, F.col("na"))).cast("bigint").alias("n_treat"),
    )
    return w.crossJoin(F.broadcast(th)).select(
        "n_users",
        "n_treat",
        F.round("theta", 6).alias("theta"),
        (F.round("raw", 4) + F.lit(0.0)).alias("uplift_raw_cents"),
        (
            F.round(F.col("raw") - F.col("theta") * F.col("xdiff"), 4)
            + F.lit(0.0)
        ).alias("uplift_cuped_cents"),
        F.round("var_ratio", 6).alias("var_ratio"),
    )


# ---------------------------------------------------------------------------
# q359: adjusted Rand index (dup clusters vs language labels)
# ---------------------------------------------------------------------------


def _ari_oracle() -> str:
    from .llm import _jaccard_oracle

    pairs = _jaccard_oracle(0.7, order_by=False).strip()
    return f"""
    WITH RECURSIVE
    prs AS MATERIALIZED (SELECT d1, d2 FROM ({pairs})),
    edges AS MATERIALIZED (
        SELECT d1 AS u, d2 AS v FROM prs UNION ALL SELECT d2, d1 FROM prs),
    cc(node, label) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.v, cc.label FROM cc JOIN edges e ON cc.node = e.u),
    lab AS (SELECT node AS doc_id, MIN(label) AS cid FROM cc GROUP BY node),
    units AS (
        SELECT d.doc_id, COALESCE(lab.cid, d.doc_id) AS cluster_id, d.lang
        FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id),
    cells AS (
        SELECT cluster_id, lang, COUNT(*) AS nij FROM units GROUP BY 1, 2),
    terms AS (
        SELECT SUM(nij * (nij - 1) // 2) AS idx FROM cells),
    amarg AS (
        SELECT SUM(a * (a - 1) // 2) AS ea
        FROM (SELECT SUM(nij) AS a FROM cells GROUP BY cluster_id)),
    bmarg AS (
        SELECT SUM(b * (b - 1) // 2) AS eb
        FROM (SELECT SUM(nij) AS b FROM cells GROUP BY lang)),
    tot AS (SELECT COUNT(*) AS n FROM units)
    SELECT CAST(tot.n AS BIGINT) AS n_docs,
           CAST(terms.idx AS BIGINT) AS pair_agreements,
           ROUND(
             (CAST(terms.idx AS DOUBLE)
              - CAST(amarg.ea AS DOUBLE) * bmarg.eb / (tot.n * (tot.n - 1) // 2))
             / NULLIF((CAST(amarg.ea AS DOUBLE) + bmarg.eb) / 2.0
                      - CAST(amarg.ea AS DOUBLE) * bmarg.eb
                        / (tot.n * (tot.n - 1) // 2), 0),
             6) + 0.0 AS adjusted_rand
    FROM terms, amarg, bmarg, tot
    """


@register(
    "q359_adjusted_rand",
    sql=_ari_oracle(),
    doc="Adjusted Rand index between the duplicate-cluster partition "
    "(q89's connected components over the Jaccard>=0.7 LSH graph; "
    "singletons are their own cluster) and the language partition -- "
    "the chance-corrected agreement score that answers 'do dup clusters "
    "just mirror language?' (ARI ~ 0 = independent, the healthy state; "
    "high ARI = the dedup graph is recovering lang structure, i.e. "
    "template families are language-bound).  Complements q352's per-"
    "cluster purity with ONE corpus-level number, and the standard "
    "external-validation metric for any clustering eval.  All "
    "contingency terms are exact BIGINT pair counts C(n,2); promotion "
    "to double happens only at the ea*eb product (q323 overflow "
    "discipline) and the final ratio rounds at 6 with -0.0 normalized "
    "(independent partitions fluctuate around zero).  Plan: CC over "
    "the graph-sized LSH pair stream, one (cluster, lang) hash-agg, "
    "marginal re-aggregations of the cell table (q282's partial-reuse "
    "shape) -- the corpus is touched once for the lang column.",
)
def q359_adjusted_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components, minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", n=3, threshold=0.7)
    lab = connected_components(pairs)
    units = (
        d.select("doc_id", "lang")
        .join(lab, "doc_id", "left")
        .select(
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
            "lang",
        )
    )
    cells = (
        units.groupBy("cluster_id", "lang")
        .agg(F.count("*").alias("nij"))
        .localCheckpoint(eager=True)  # feeds idx + both marginals (rule 9)
    )
    # Exact BIGINT pair counts end to end: '/' is double division, exact
    # only while x*(x-1) <= 2^53 (~9.5e7 rows per cell), but the DuckDB
    # oracle computes exact integers (round-9 advisor note).  x*(x-1) is
    # always even, so shiftright(...,1) IS integer division by 2.
    c2 = lambda x: F.shiftright(x.cast("bigint") * (x - 1), 1)  # noqa: E731
    terms = cells.agg(F.sum(c2(F.col("nij"))).alias("idx"))
    amarg = (
        cells.groupBy("cluster_id")
        .agg(F.sum("nij").alias("a"))
        .agg(F.sum(c2(F.col("a"))).alias("ea"))
    )
    bmarg = (
        cells.groupBy("lang")
        .agg(F.sum("nij").alias("b"))
        .agg(F.sum(c2(F.col("b"))).alias("eb"))
    )
    tot = cells.agg(F.sum("nij").alias("n"))
    j = (
        terms.crossJoin(F.broadcast(amarg))
        .crossJoin(F.broadcast(bmarg))
        .crossJoin(F.broadcast(tot))
    )
    c2n = F.shiftright(F.col("n").cast("bigint") * (F.col("n") - 1), 1)
    expv = F.col("ea").cast("double") * F.col("eb") / c2n
    return j.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("idx").cast("bigint").alias("pair_agreements"),
        (
            F.round(
                (F.col("idx").cast("double") - expv)
                / F.nullif(
                    (F.col("ea").cast("double") + F.col("eb")) / 2.0 - expv,
                    F.lit(0.0),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("adjusted_rand"),
    )
