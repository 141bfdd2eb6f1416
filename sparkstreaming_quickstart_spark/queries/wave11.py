"""Wave-11 operators (round 3): corpus tails and time-series finance-style
rollups -- per-source hapax share, exponential goodness-of-fit on
inter-arrival gaps, time-weighted averages (TWAP), OHLC/daily bars with
deterministic open/close, IR ranking evaluation (P@k, MRR, nDCG), a
streaming PSI drift monitor, and diagonal-Mahalanobis embedding outliers.

Float discipline (the round-3 rule from SCALING.md): wherever a mean or
weighted mean is exposed, both engines sum EXACT integers (micros, cents,
counts) and divide once; analytic bin boundaries derive from those same
integer sums so bin assignment is engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q261: hapax legomenon share per source
# ---------------------------------------------------------------------------


@register(
    "q261_hapax_share",
    sql="""
    WITH sc AS (
        SELECT source, unnest(string_split(text, ' ')) AS t
        FROM documents WHERE length(text) > 0),
    cnt AS (SELECT source, t, COUNT(*) AS c FROM sc GROUP BY 1, 2)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(count_if(c = 1) AS BIGINT) AS hapax,
           ROUND(CAST(count_if(c = 1) AS DOUBLE) / COUNT(*), 6) AS hapax_share
    FROM cnt GROUP BY source ORDER BY source
    """,
    doc="Hapax legomenon share per source: the fraction of a source's "
    "vocabulary that occurs exactly once -- organic text sits near "
    "40-60%, templated/generated text collapses toward 0, and a spike "
    "flags OCR noise or encoding damage.  One (source, token) hash-agg "
    "then a per-source rollup; the count=1 predicate folds into the "
    "second aggregate, no joins.",
)
def q261_hapax_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    cnt = (
        d.select("source", F.explode(tokens("text")).alias("t"))
        .groupBy("source", "t")
        .agg(F.count("*").alias("c"))
    )
    return (
        cnt.groupBy("source")
        .agg(
            F.count("*").alias("vocab"),
            F.count_if(F.col("c") == 1).alias("hapax"),
            F.round(
                F.count_if(F.col("c") == 1).cast("double") / F.count("*"), 6
            ).alias("hapax_share"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q262: chi-square goodness-of-fit of inter-arrival exponentiality
# ---------------------------------------------------------------------------

_GOF_BINS = 10


@register(
    "q262_exponential_gof",
    sql=f"""
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
        FROM events),
    g AS (SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL),
    lam AS (
        SELECT event_type, COUNT(*) AS n,
               COUNT(*) / NULLIF(CAST(SUM(gap_us) AS DOUBLE), 0) AS lambda_us
        FROM g GROUP BY event_type),
    binned AS (
        SELECT g.event_type, l.n,
               least({_GOF_BINS - 1},
                     CAST(floor(round({_GOF_BINS} * (1 - exp(-l.lambda_us * g.gap_us)), 9))
                          AS INT)) AS bin
        FROM g JOIN lam l ON g.event_type = l.event_type),
    obs AS (
        SELECT event_type, n, bin, COUNT(*) AS o
        FROM binned GROUP BY 1, 2, 3)
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
           ROUND(SUM(pow(o - n / {_GOF_BINS}.0, 2) / (n / {_GOF_BINS}.0)), 6)
               AS chi2
    FROM obs GROUP BY event_type, n ORDER BY event_type
    """,
    doc="Chi-square goodness-of-fit of inter-arrival exponentiality per "
    "event_type: the MLE rate (exact integer-microsecond sums, so both "
    "engines derive the identical lambda) defines 10 equal-probability "
    "analytic bins via the exponential CDF; observed counts against the "
    "uniform expectation n/10 close the statistic -- the Poissonness "
    "test behind 'is this event stream organic or scheduled'.  Gaps use "
    "the bucket-stitched distributed lag ((type, day) windows + carried "
    "boundary timestamps over the tiny types x days frame), so "
    "parallelism is types x days, not |types|; binning is a stateless "
    "projection against broadcast per-type rates.",
)
def q262_exponential_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Distributed lag via bucket stitching: a plain per-type window would
    # partition the whole stream into |event_types| partitions (5 here) --
    # a hard parallelism ceiling at 100 TB.  Instead the lag runs within
    # (type, day) buckets, and each day's FIRST gap stitches against the
    # carried last-timestamp of the latest previous non-empty day, computed
    # on the tiny types x days frame.  Identical output to the
    # single-window spelling (us is monotone in ts, ties share a day).
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = e.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        us.alias("us"),
        "event_id",
    )
    wb = Window.partitionBy("event_type", "day").orderBy("us", "event_id")
    intra = b.select(
        "event_type", "day", "us", F.lag("us").over(wb).alias("prev_us")
    )
    lasts = b.groupBy("event_type", "day").agg(F.max("us").alias("last_us"))
    wd = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prevb = lasts.select(
        "event_type", "day", F.max("last_us").over(wd).alias("carry_us")
    )
    g = (
        intra.join(F.broadcast(prevb), ["event_type", "day"])
        .select(
            "event_type",
            (F.col("us") - F.coalesce("prev_us", "carry_us")).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    lam = g.groupBy("event_type").agg(
        F.count("*").alias("n"),
        # all-equal timestamps give zero total gap: rate undefined, NULL both sides
        (F.count("*") / F.nullif(F.sum("gap_us").cast("double"), F.lit(0.0))).alias("lambda_us"),
    )
    binned = g.join(F.broadcast(lam), "event_type").select(
        "event_type",
        "n",
        # ROUND(.., 9) before the bin floor: lambda and the exp argument are
        # engine-identical doubles, but exp() itself is only ~1-ulp accurate
        # in each engine, so an unrounded CDF value sitting within an ulp of
        # a bin edge could floor differently across engines (the q286
        # exp-exposure class, round-7 float-boundary audit).
        F.least(
            F.lit(_GOF_BINS - 1),
            F.floor(
                F.round(
                    _GOF_BINS * (1 - F.exp(-F.col("lambda_us") * F.col("gap_us"))), 9
                )
            ).cast("int"),
        ).alias("bin"),
    )
    obs = binned.groupBy("event_type", "n", "bin").agg(F.count("*").alias("o"))
    exp_n = F.col("n") / float(_GOF_BINS)
    return (
        obs.groupBy("event_type", "n")
        .agg(F.round(F.sum(F.pow(F.col("o") - exp_n, 2) / exp_n), 6).alias("chi2"))
        .select(
            "event_type", F.col("n").cast("bigint").alias("n_gaps"), "chi2"
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q263: time-weighted average value (TWAP) per user
# ---------------------------------------------------------------------------


@register(
    "q263_twap",
    sql="""
    WITH seg AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   - epoch_us(ts) AS dt_us
        FROM events),
    s AS (
        SELECT user_id,
               SUM(CAST(cents * dt_us AS DECIMAL(38,0))) AS num,
               SUM(dt_us) AS den,
               COUNT(*) AS n_segments
        FROM seg WHERE dt_us IS NOT NULL GROUP BY user_id)
    SELECT user_id, CAST(n_segments AS BIGINT) AS n_segments,
           ROUND(CAST(num AS DOUBLE) / NULLIF(100.0 * den, 0), 6) AS twap
    FROM s ORDER BY user_id
    """,
    doc="Time-weighted average value (TWAP) per user: each observation is "
    "held until the next event, so the average weights by holding "
    "duration -- the standard fix for irregularly-sampled series where a "
    "plain mean over-counts bursts.  Cents x integer-microsecond "
    "products accumulate in DECIMAL(38,0) (exact, order-insensitive, "
    "partial-aggregatable) with ONE float division at the end; one "
    "window shuffle on user_id.",
)
def q263_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (F.lead(us).over(w) - us).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    s = seg.groupBy("user_id").agg(
        # Cast BEFORE the multiply: cents x a multi-year microsecond gap
        # exceeds BIGINT (~3e21 for $1e6 held a year), so the product must
        # already be decimal (round-7 int-overflow audit).
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("dt_us")).alias("num"),
        F.sum("dt_us").alias("den"),
        F.count("*").alias("n_segments"),
    )
    return s.select(
        "user_id",
        F.col("n_segments").cast("bigint").alias("n_segments"),
        # zero total holding time (all events at one instant): NULL both sides
        F.round(
            F.col("num").cast("double") / F.nullif(100.0 * F.col("den"), F.lit(0.0)), 6
        ).alias("twap"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# q264: daily OHLC bars per event_type with deterministic open/close
# ---------------------------------------------------------------------------


@register(
    "q264_ohlc_bars",
    sql="""
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(arg_min(value, printf('%020d%012d', epoch_us(ts), event_id)), 2) AS open,
           ROUND(MAX(value), 2) AS high,
           ROUND(MIN(value), 2) AS low,
           ROUND(arg_max(value, printf('%020d%012d', epoch_us(ts), event_id)), 2) AS close,
           ROUND(SUM(CAST(round(value * 100) AS BIGINT)) / (100.0 * COUNT(*)), 6)
               AS mean_value
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, day
    """,
    doc="Daily OHLC bars per event_type: open/close resolve by min_by/"
    "max_by over the total order (ts, event_id) -- deterministic even "
    "with timestamp ties, unlike first()/last() -- plus high/low and an "
    "exact-cents mean.  ONE partial-aggregatable hash-agg (min_by/max_by "
    "carry a single candidate per partition), no window, no sort except "
    "the final presentation orderBy: the canonical downsample-to-bars "
    "rollup at any scale.",
)
def q264_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min_by("value", key), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", key), 2).alias("close"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                / (100.0 * F.count("*")),
                6,
            ).alias("mean_value"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# q265: IR ranking evaluation (P@5, reciprocal rank, nDCG@5)
# ---------------------------------------------------------------------------

_IR_TERMS = ("spark", "query", "fast")
_IR_K = 5


@register(
    "q265_ir_eval",
    sql=f"""
    WITH terms AS (SELECT unnest(['spark', 'query', 'fast']) AS term),
    tf AS (
        SELECT t.term, d.doc_id,
               len(list_filter(string_split(d.text, ' '), x -> x = t.term)) AS tf
        FROM documents d CROSS JOIN terms t
        WHERE length(d.text) > 0),
    hits AS (
        SELECT term, doc_id, tf, (tf >= 2) AS rel,
               ROW_NUMBER() OVER (PARTITION BY term
                                  ORDER BY tf DESC, doc_id ASC) AS rnk
        FROM tf WHERE tf >= 1),
    ideal AS (
        SELECT term, count_if(rel) AS n_rel FROM hits GROUP BY term),
    dcg AS (
        SELECT h.term,
               COUNT(*) AS n_retrieved,
               i.n_rel,
               count_if(h.rel AND h.rnk <= {_IR_K}) AS rel_at_k,
               MIN(CASE WHEN h.rel THEN h.rnk END) AS first_rel,
               SUM(CASE WHEN h.rel AND h.rnk <= {_IR_K}
                        THEN 1.0 / log2(h.rnk + 1.0) ELSE 0 END) AS dcg_at_k
        FROM hits h JOIN ideal i ON h.term = i.term
        GROUP BY h.term, i.n_rel),
    idcg AS (
        SELECT term, SUM(1.0 / log2(r + 1.0)) AS idcg_at_k
        FROM (SELECT term,
                     unnest(generate_series(1, CAST(least(n_rel, {_IR_K}) AS BIGINT))) AS r
              FROM ideal)
        GROUP BY term)
    SELECT d.term,
           CAST(d.n_retrieved AS BIGINT) AS n_retrieved,
           CAST(d.n_rel AS BIGINT) AS n_relevant,
           ROUND(d.rel_at_k / {_IR_K}.0, 6) AS p_at_k,
           ROUND(1.0 / d.first_rel, 6) AS reciprocal_rank,
           ROUND(d.dcg_at_k / i.idcg_at_k, 6) AS ndcg_at_k
    FROM dcg d JOIN idcg i ON d.term = i.term
    ORDER BY d.term
    """,
    doc="IR ranking evaluation for a term-frequency retriever: per query "
    "term, documents rank by (tf DESC, doc_id) and relevance is tf >= 2; "
    "the metrics are precision@5, reciprocal rank of the first relevant "
    "hit, and nDCG@5 against the analytic ideal -- the offline eval "
    "harness every retrieval/RAG pipeline (q191, q226) needs beside it.  "
    "The per-term rank window partitions by term over only the matching "
    "docs; at 100 TB the tf >= 1 prefilter is what keeps that frame "
    "posting-list-sized, and a top-k threshold would bound it further.",
)
def q265_ir_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    terms = spark.createDataFrame([(t,) for t in _IR_TERMS], ["term"])
    tf = (
        d.crossJoin(F.broadcast(terms))
        .select(
            "term",
            "doc_id",
            F.size(
                F.filter(tokens("text"), lambda x: x == F.col("term"))
            ).alias("tf"),
        )
        .filter(F.col("tf") >= 1)
    )
    w = Window.partitionBy("term").orderBy(F.col("tf").desc(), F.col("doc_id").asc())
    hits = tf.select(
        "term", "doc_id", "tf", (F.col("tf") >= 2).alias("rel"),
        F.row_number().over(w).alias("rnk"),
    )
    ideal = hits.groupBy("term").agg(F.count_if("rel").alias("n_rel"))
    dcg = (
        hits.join(F.broadcast(ideal), "term")
        .groupBy("term", "n_rel")
        .agg(
            F.count("*").alias("n_retrieved"),
            F.count_if(F.col("rel") & (F.col("rnk") <= _IR_K)).alias("rel_at_k"),
            F.min(F.when(F.col("rel"), F.col("rnk"))).alias("first_rel"),
            F.sum(
                F.when(
                    F.col("rel") & (F.col("rnk") <= _IR_K),
                    1.0 / F.log2(F.col("rnk") + 1.0),
                ).otherwise(0.0)
            ).alias("dcg_at_k"),
        )
    )
    idcg = ideal.select(
        "term",
        F.explode(F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(_IR_K)))).alias("r"),
    ).groupBy("term").agg(F.sum(1.0 / F.log2(F.col("r") + 1.0)).alias("idcg_at_k"))
    return (
        dcg.join(F.broadcast(idcg), "term")
        .select(
            "term",
            F.col("n_retrieved").cast("bigint").alias("n_retrieved"),
            F.col("n_rel").cast("bigint").alias("n_relevant"),
            F.round(F.col("rel_at_k") / float(_IR_K), 6).alias("p_at_k"),
            F.round(1.0 / F.col("first_rel"), 6).alias("reciprocal_rank"),
            F.round(F.col("dcg_at_k") / F.col("idcg_at_k"), 6).alias("ndcg_at_k"),
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# q266: streaming PSI drift monitor (per event_type vs static global)
# ---------------------------------------------------------------------------


@register(
    "q266_stream_psi_drift",
    sql="""
    WITH binned AS (
        SELECT event_type,
               least(9, CAST(floor(value / 50.0) AS INT)) AS bin
        FROM events),
    act AS (
        SELECT event_type, bin, COUNT(*) AS a FROM binned GROUP BY 1, 2),
    atot AS (SELECT event_type, SUM(a) AS na FROM act GROUP BY 1),
    exp_ AS (SELECT bin, COUNT(*) AS e FROM binned GROUP BY bin),
    etot AS (SELECT SUM(e) AS ne FROM exp_)
    SELECT act.event_type,
           ROUND(SUM((act.a / CAST(atot.na AS DOUBLE) - exp_.e / CAST(etot.ne AS DOUBLE))
                     * ln((act.a / CAST(atot.na AS DOUBLE))
                          / (exp_.e / CAST(etot.ne AS DOUBLE)))), 6) AS psi
    FROM act
    JOIN atot ON act.event_type = atot.event_type
    JOIN exp_ ON act.bin = exp_.bin
    CROSS JOIN etot
    GROUP BY act.event_type
    ORDER BY act.event_type
    """,
    doc="Streaming PSI drift monitor: per-event-type value histograms "
    "accumulate IN-STREAM (static 50-wide bins, stateless binning + "
    "streaming groupBy in complete mode, drained via availableNow), then "
    "compare against the static all-events baseline by Population "
    "Stability Index -- q232's batch PSI turned into the production "
    "shape: tiny bounded state (types x 10 bins), the PSI join runs on "
    "the drained histogram, and the oracle is the batch twin by prefix "
    "consistency.",
)
def q266_stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import run_to_memory
    from ..streaming.source import events_stream

    stream = events_stream(spark, sf_dir)
    bin_col = F.least(F.lit(9), F.floor(F.col("value") / 50.0).cast("int")).alias("bin")
    act_stream = (
        stream.select("event_type", bin_col)
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("a"))
    )
    table = run_to_memory(act_stream, output_mode="complete")
    # Per-type totals via a window over the drained types x bins frame (~50
    # rows) -- a self-join of the memory view would collide attribute ids.
    act = spark.table(table).withColumn(
        "na", F.sum("a").over(Window.partitionBy("event_type"))
    )
    e = load_table(spark, sf_dir, "events").select("event_type", bin_col)
    exp_ = e.groupBy("bin").agg(F.count("*").alias("e"))
    etot = exp_.agg(F.sum("e").alias("ne"))
    pa = F.col("a") / F.col("na").cast("double")
    pe = F.col("e") / F.col("ne").cast("double")
    return (
        act.join(F.broadcast(exp_), "bin")
        .crossJoin(F.broadcast(etot))
        .groupBy("event_type")
        .agg(F.round(F.sum((pa - pe) * F.log(pa / pe)), 6).alias("psi"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q267: diagonal-Mahalanobis embedding outlier scores
# ---------------------------------------------------------------------------


@register(
    "q267_mahalanobis_outliers",
    sql="""
    WITH dims AS (
        SELECT vec_id,
               unnest(CAST(embedding AS DOUBLE[])) AS x,
               generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS pos
        FROM embeddings),
    stats AS (
        SELECT pos, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
        FROM dims GROUP BY pos),
    scored AS (
        SELECT d.vec_id,
               pow(d.x - s.sx / s.n, 2)
                   / ((s.sxx - s.sx * s.sx / s.n) / (s.n - 1)) AS z2
        FROM dims d JOIN stats s ON d.pos = s.pos)
    SELECT vec_id, ROUND(SUM(z2), 6) AS m2
    FROM scored GROUP BY vec_id ORDER BY vec_id
    """,
    doc="Diagonal-Mahalanobis outlier score per embedding: sum over "
    "dimensions of the squared z-score, with per-dimension mean/variance "
    "from sufficient statistics (identical formula both engines).  The "
    "embedding-space outlier filter that catches corrupted/degenerate "
    "vectors before they poison ANN indexes or SemDeDup.  Per-dim stats "
    "are one 64-row aggregate (partial, map-side); scores attach via a "
    "broadcast join on dimension index -- no shuffle of the vector frame "
    "beyond the posexplode projection's own aggregation.",
)
def q267_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dims = emb.select("vec_id", F.posexplode("v").alias("pos0", "x")).select(
        "vec_id", (F.col("pos0") + 1).alias("pos"), "x"
    )
    stats = dims.groupBy("pos").agg(
        F.count("*").alias("n"), F.sum("x").alias("sx"), F.sum(F.col("x") * F.col("x")).alias("sxx")
    )
    mean = F.col("sx") / F.col("n")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    scored = dims.join(F.broadcast(stats), "pos").select(
        "vec_id", (F.pow(F.col("x") - mean, 2) / var).alias("z2")
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.round(F.sum("z2"), 6).alias("m2"))
        .orderBy("vec_id")
    )
