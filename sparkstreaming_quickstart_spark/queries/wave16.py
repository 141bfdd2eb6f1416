"""Wave-16 operators (round 3): information-theoretic feature screening,
distribution-matching reweighting for dataset mixing, and split-conformal
prediction intervals -- the model-adjacent data ops a training platform
runs between corpus prep and evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q281: mutual information between two categorical columns
# ---------------------------------------------------------------------------


@register(
    "q281_mutual_information",
    sql="""
    WITH j AS (SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY 1, 2),
    n AS (SELECT SUM(c) AS n FROM j),
    mx AS (SELECT lang, SUM(c) AS cl FROM j GROUP BY lang),
    my AS (SELECT source, SUM(c) AS cs FROM j GROUP BY source)
    SELECT CAST(n.n AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(SUM((j.c / CAST(n.n AS DOUBLE))
                     * log2((CAST(j.c AS DOUBLE) * n.n)
                            / (CAST(mx.cl AS DOUBLE) * my.cs))), 6) AS mi_bits
    FROM j
    JOIN mx ON j.lang = mx.lang
    JOIN my ON j.source = my.source
    CROSS JOIN n
    GROUP BY n.n
    """,
    doc="Mutual information (bits) between document language and source -- "
    "the feature-screening statistic behind 'does source predict "
    "language' (the information-theoretic complement of q231's "
    "chi-square on the same contingency table).  One joint-count "
    "hash-agg; marginals and MI derive on the |langs|x|sources| cell "
    "frame with exact integer counts inside the log.",
)
def q281_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    j = d.groupBy("lang", "source").agg(F.count("*").alias("c"))
    n = j.agg(F.sum("c").alias("n"))
    mx = j.groupBy("lang").agg(F.sum("c").alias("cl"))
    my = j.groupBy("source").agg(F.sum("c").alias("cs"))
    joined = (
        j.join(F.broadcast(mx), "lang")
        .join(F.broadcast(my), "source")
        .crossJoin(F.broadcast(n))
    )
    term = (F.col("c") / F.col("n").cast("double")) * F.log2(
        (F.col("c").cast("double") * F.col("n"))
        / (F.col("cl").cast("double") * F.col("cs"))
    )
    return joined.groupBy("n").agg(
        F.count("*").alias("n_cells"), F.round(F.sum(term), 6).alias("mi_bits")
    ).select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_cells").cast("bigint").alias("n_cells"),
        "mi_bits",
    )


# ---------------------------------------------------------------------------
# q282: distribution-matching reweighting for dataset mixing
# ---------------------------------------------------------------------------

_REWEIGHT_BINS = 8


@register(
    "q282_distribution_reweight",
    sql=f"""
    WITH b AS (
        SELECT source,
               least({_REWEIGHT_BINS - 1},
                     CAST(((n_chars - mn) * {_REWEIGHT_BINS})
                          // (mx - mn + 1) AS INT)) AS bin
        FROM documents,
             (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents)),
    act AS (SELECT source, bin, COUNT(*) AS a FROM b GROUP BY 1, 2),
    st AS (SELECT source, SUM(a) AS ns FROM act GROUP BY 1),
    tgt AS (SELECT bin, COUNT(*) AS t FROM b GROUP BY bin),
    tn AS (SELECT SUM(t) AS nt FROM tgt)
    SELECT act.source, act.bin,
           CAST(act.a AS BIGINT) AS n_docs,
           ROUND((CAST(tgt.t AS DOUBLE) / tn.nt)
                 / (CAST(act.a AS DOUBLE) / st.ns), 6) AS weight
    FROM act
    JOIN st ON act.source = st.source
    JOIN tgt ON act.bin = tgt.bin
    CROSS JOIN tn
    ORDER BY act.source, act.bin
    """,
    doc="Distribution-matching reweighting: per (source, length-bin), the "
    "importance weight target_share / source_share that makes every "
    "source's length distribution match the corpus blend -- the "
    "reweighting table a dataset-mixing pipeline (q143) multiplies into "
    "its sampling rates so no source skews the length profile.  Integer "
    "bin edges from the global min/max (engine-identical), two bounded "
    "hash-aggs, weights on the |sources|x|bins| frame.",
)
def q282_distribution_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    rng = d.agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    b = d.crossJoin(F.broadcast(rng)).select(
        "source",
        # integer floor division both sides (DuckDB CAST(double AS INT)
        # rounds, Spark truncates -- // and floor agree exactly)
        F.least(
            F.lit(_REWEIGHT_BINS - 1),
            F.floor(
                (F.col("n_chars") - F.col("mn"))
                * _REWEIGHT_BINS
                / (F.col("mx") - F.col("mn") + 1)
            ).cast("int"),
        ).alias("bin"),
    )
    # README rule 9 (round-9 fix): act is the shared aggregate -- st, tgt
    # and tn are all PARTIAL re-aggregations of the (source, bin) cell
    # counts, so derive them from the checkpointed cells instead of
    # re-scanning documents per consumer (audit showed 8 scans before).
    act = (
        b.groupBy("source", "bin")
        .agg(F.count("*").alias("a"))
        .localCheckpoint(eager=True)
    )
    st = act.groupBy("source").agg(F.sum("a").alias("ns"))
    tgt = act.groupBy("bin").agg(F.sum("a").alias("t"))
    tn = tgt.agg(F.sum("t").alias("nt"))
    return (
        act.join(F.broadcast(st), "source")
        .join(F.broadcast(tgt), "bin")
        .crossJoin(F.broadcast(tn))
        .select(
            "source",
            "bin",
            F.col("a").cast("bigint").alias("n_docs"),
            F.round(
                (F.col("t").cast("double") / F.col("nt"))
                / (F.col("a").cast("double") / F.col("ns")),
                6,
            ).alias("weight"),
        )
        .orderBy("source", "bin")
    )


# ---------------------------------------------------------------------------
# q283: split-conformal prediction interval per event_type
# ---------------------------------------------------------------------------

_CONFORMAL_Q = 0.9


@register(
    "q283_conformal_interval",
    sql=f"""
    WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
    m AS (
        SELECT event_type, COUNT(*) AS n, SUM(cents) AS s
        FROM c GROUP BY event_type),
    res AS (
        SELECT c.event_type, m.n, m.s,
               ABS(c.cents * m.n - m.s) AS r
        FROM c JOIN m ON c.event_type = m.event_type),
    h AS (
        SELECT event_type, n, r, COUNT(*) AS cnt
        FROM res GROUP BY 1, 2, 3),
    cum AS (
        SELECT event_type, n, r,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY r
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        FROM h),
    q AS (
        SELECT event_type, n,
               MIN(CASE WHEN cm >= ceil({_CONFORMAL_Q} * (n + 1)) THEN r END) AS rq
        FROM cum GROUP BY event_type, n)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND(CAST(s AS DOUBLE) / (100.0 * n), 6) AS center,
           ROUND(CAST(rq AS DOUBLE) / (100.0 * n), 6) AS half_width
    FROM q JOIN m USING (event_type, n)
    ORDER BY event_type
    """,
    doc="Split-conformal prediction interval per event_type (90% "
    "coverage): the interval half-width is the ceil(q*(n+1))-th "
    "smallest absolute residual from the group mean -- the "
    "distribution-free uncertainty band conformal prediction attaches "
    "to any point predictor.  The residual |x - mean| is scaled by n "
    "(|n*x - sum|) so it stays INTEGER, the quantile comes off the "
    "residual histogram by cumulative rank (never a per-row sort), and "
    "the two divisions happen once at the end -- exact and "
    "engine-identical.",
)
def q283_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = e.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    m = c.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    res = c.join(F.broadcast(m), "event_type").select(
        "event_type",
        "n",
        "s",
        F.abs(F.col("cents") * F.col("n") - F.col("s")).alias("r"),
    )
    h = res.groupBy("event_type", "n", "r").agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = h.select(
        "event_type", "n", "r", F.sum("cnt").over(w).alias("cm")
    )
    q = cum.groupBy("event_type", "n").agg(
        F.min(
            F.when(
                F.col("cm") >= F.ceil(F.lit(_CONFORMAL_Q) * (F.col("n") + 1)),
                F.col("r"),
            )
        ).alias("rq")
    )
    return (
        q.join(m, ["event_type", "n"])
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("s").cast("double") / (100.0 * F.col("n")), 6).alias("center"),
            F.round(F.col("rq").cast("double") / (100.0 * F.col("n")), 6).alias("half_width"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q284/q285: forward and nearest as-of joins (completing the family)
# ---------------------------------------------------------------------------


@register(
    "q284_asof_forward",
    sql="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT min_by(c.event_id, c.ts)
              FROM events c
             WHERE c.user_id = e.user_id AND c.event_type = 'click' AND c.ts >= e.ts
           ) AS next_click_event_id
    FROM events e
    WHERE e.event_type = 'error'
    ORDER BY e.event_id
    """,
    doc="Forward as-of join: the EARLIEST subsequent click per user for "
    "each error event -- the 'what did the user do next' direction, "
    "completing q18 (backward) and q206 (tolerance).  Same "
    "union-and-carry shape with the window mirrored (time descending), "
    "still ONE shuffle on the key; see operators/asof.py.",
)
def q284_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("next_click_event_id")
    )
    joined = asof_join(
        errors,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        value_cols=["next_click_event_id"],
        tiebreak="next_click_event_id",
        direction="forward",
    )
    return joined.select(
        "event_id", "user_id", "ts",
        F.col("asof_next_click_event_id").alias("next_click_event_id"),
    ).orderBy("event_id")


@register(
    "q285_asof_nearest",
    sql="""
    WITH e AS (
        SELECT e.event_id, e.user_id, e.ts,
               (SELECT max_by(c.event_id, c.ts) FROM events c
                 WHERE c.user_id = e.user_id AND c.event_type = 'click'
                   AND c.ts <= e.ts) AS bid,
               (SELECT max(c.ts) FROM events c
                 WHERE c.user_id = e.user_id AND c.event_type = 'click'
                   AND c.ts <= e.ts) AS bts,
               (SELECT min_by(c.event_id, c.ts) FROM events c
                 WHERE c.user_id = e.user_id AND c.event_type = 'click'
                   AND c.ts >= e.ts) AS fid,
               (SELECT min(c.ts) FROM events c
                 WHERE c.user_id = e.user_id AND c.event_type = 'click'
                   AND c.ts >= e.ts) AS fts
        FROM events e WHERE e.event_type = 'error')
    SELECT event_id, user_id, ts,
           CASE WHEN bts IS NULL THEN fid
                WHEN fts IS NULL THEN bid
                WHEN epoch_us(ts) - epoch_us(bts)
                     <= epoch_us(fts) - epoch_us(ts) THEN bid
                ELSE fid END AS nearest_click_event_id
    FROM e
    ORDER BY event_id
    """,
    doc="Nearest as-of join: whichever click (prior or subsequent) is "
    "closer in time per user, ties resolving backward -- pandas "
    "merge_asof(direction='nearest') semantics.  Both carries compute "
    "over the SAME unioned key-partitioned frame (one exchange, two "
    "sorts) and the pick is a per-row projection; see operators/asof.py.",
)
def q285_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("nearest_click_event_id")
    )
    joined = asof_join(
        errors,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        value_cols=["nearest_click_event_id"],
        tiebreak="nearest_click_event_id",
        direction="nearest",
    )
    return joined.select(
        "event_id", "user_id", "ts",
        F.col("asof_nearest_click_event_id").alias("nearest_click_event_id"),
    ).orderBy("event_id")
