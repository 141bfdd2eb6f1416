"""Wave-13 operators (round 3): pipeline operations tooling -- join
cardinality auditing before the join runs, blocking-recall evaluation for
record linkage, and a watermark-lateness profile built on a two-phase
distributed prefix-max.

These are the "measure before you run it at 100 TB" layer: each one is the
cheap pre-flight a production pipeline runs to decide whether the expensive
step (a fact-fact join, a linkage pass, a watermark setting) is safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q273: join cardinality audit (exact pre-join output-size prediction)
# ---------------------------------------------------------------------------


@register(
    "q273_join_cardinality_audit",
    sql="""
    WITH ok AS (SELECT o_orderkey AS k, COUNT(*) AS no FROM orders GROUP BY 1),
    lk AS (SELECT l_orderkey AS k, COUNT(*) AS nl FROM lineitem GROUP BY 1),
    pred AS (
        SELECT SUM(no * nl) AS predicted,
               MAX(no * nl) AS max_key_contrib,
               COUNT(*) AS n_join_keys
        FROM ok JOIN lk USING (k)),
    act AS (
        SELECT COUNT(*) AS actual
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
    SELECT CAST(predicted AS BIGINT) AS predicted,
           CAST(actual AS BIGINT) AS actual,
           (predicted = actual) AS audit_ok,
           CAST(n_join_keys AS BIGINT) AS n_join_keys,
           CAST(max_key_contrib AS BIGINT) AS max_key_contrib
    FROM pred, act
    """,
    doc="Join cardinality audit: the exact output size of orders x lineitem "
    "predicted BEFORE the join from per-key counts (sum over shared keys "
    "of n_left * n_right), plus the single worst key's contribution -- "
    "the pre-flight that catches key-explosion joins (and the skew key "
    "to salt, q147) before a 100 TB shuffle runs.  Two key-count "
    "hash-aggs and a count-frame join, orders of magnitude cheaper than "
    "the join it predicts; the actual join runs here only to prove the "
    "prediction exact.",
)
def q273_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ok = o.groupBy(F.col("o_orderkey").alias("k")).agg(F.count("*").alias("no"))
    lk = li.groupBy(F.col("l_orderkey").alias("k")).agg(F.count("*").alias("nl"))
    # Per-key contribution in DECIMAL(38,0): the pathological key this audit
    # exists to catch (two ~1e10-row sides) would ANSI-abort the BIGINT
    # product -- the audit must survive exactly the input it flags
    # (round-7 int-overflow audit).
    contrib = F.col("no").cast("decimal(38,0)") * F.col("nl")
    pred = ok.join(lk, "k").agg(
        F.sum(contrib).alias("predicted"),
        F.max(contrib).alias("max_key_contrib"),
        F.count("*").alias("n_join_keys"),
    )
    act = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .agg(F.count("*").alias("actual"))
    )
    return pred.crossJoin(F.broadcast(act)).select(
        F.col("predicted").cast("bigint").alias("predicted"),
        F.col("actual").cast("bigint").alias("actual"),
        (F.col("predicted") == F.col("actual")).alias("audit_ok"),
        F.col("n_join_keys").cast("bigint").alias("n_join_keys"),
        F.col("max_key_contrib").cast("bigint").alias("max_key_contrib"),
    )


# ---------------------------------------------------------------------------
# q274: blocking-recall evaluation for record linkage (labeled sample)
# ---------------------------------------------------------------------------

_LINKAGE_SAMPLE_KEYS = 200


@register(
    "q274_blocking_recall_eval",
    sql=f"""
    WITH s AS (
        SELECT c_custkey, c_name,
               substr(c_name, 1, length(c_name) - 2) AS block
        FROM customer WHERE c_custkey < {_LINKAGE_SAMPLE_KEYS}),
    truth AS (
        SELECT a.c_custkey AS id1, b.c_custkey AS id2,
               (a.block = b.block) AS blocked
        FROM s a JOIN s b ON a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS true_matches,
           CAST(count_if(blocked) AS BIGINT) AS captured,
           ROUND(count_if(blocked) / CAST(COUNT(*) AS DOUBLE), 6)
               AS pairs_completeness
    FROM truth
    """,
    doc="Blocking-recall (pairs completeness) evaluation for q224's record "
    "linkage: on a fixed labeled sample (custkey < "
    f"{_LINKAGE_SAMPLE_KEYS}, so the exhaustive truth set stays "
    "constant-sized at ANY corpus scale -- the standard labeled-eval "
    "protocol), enumerate all true fuzzy matches (levenshtein <= 2) and "
    "measure what fraction the production blocking key would have "
    "captured.  The all-pairs scan is quadratic only in the sample; the "
    "blocking strategy under test never runs on the full data here.",
)
def q274_blocking_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < _LINKAGE_SAMPLE_KEYS)
        .select(
            "c_custkey",
            "c_name",
            F.expr("substring(c_name, 1, length(c_name) - 2)").alias("block"),
        )
    )
    a, b = c.alias("a"), c.alias("b")
    truth = (
        a.join(b, F.col("a.c_custkey") < F.col("b.c_custkey"))
        .filter(F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 2)
        .select((F.col("a.block") == F.col("b.block")).alias("blocked"))
    )
    return truth.agg(
        F.count("*").alias("true_matches"),
        F.count_if("blocked").alias("captured"),
        F.round(
            F.count_if("blocked") / F.count("*").cast("double"), 6
        ).alias("pairs_completeness"),
    )


# ---------------------------------------------------------------------------
# q275: watermark-lateness profile via two-phase distributed prefix-max
# ---------------------------------------------------------------------------

_LATENESS_BUCKETS = 1024


@register(
    "q275_lateness_profile",
    sql="""
    WITH m AS (
        SELECT event_id, epoch_us(ts) AS us,
               MAX(epoch_us(ts)) OVER (ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
        FROM events)
    SELECT CAST(floor((run_max - us) / 3600000000.0) AS INT) AS lateness_hours,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM m
    GROUP BY 1
    ORDER BY lateness_hours
    """,
    doc="Watermark-lateness profile: for each event, how far behind the "
    "maximum event-time seen so far (arrival order = event_id) it "
    "arrived, bucketed into hours -- the histogram that picks the "
    "withWatermark() delay (the bucket covering ~99.9% of mass IS the "
    "watermark).  The running maximum is a TWO-PHASE distributed "
    "prefix-scan (max is associative, the q193/q230 argument applied to "
    "a scan instead of a rank): per-bucket maxima, broadcast "
    "prefix-of-bucket maxima over the 1024-row bucket frame, and a "
    "bucket-partitioned running max -- the arrival stream never funnels "
    "through one partition.  Integer-microsecond lateness, exact both "
    "engines.",
)
def q275_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    rng = e.agg(
        F.min("event_id").alias("lo"), (F.max("event_id") + 1).alias("hi")
    )
    bucketed = e.crossJoin(F.broadcast(rng)).select(
        "event_id",
        us.alias("us"),
        F.width_bucket("event_id", "lo", "hi", F.lit(_LATENESS_BUCKETS)).alias("b"),
    )
    # phase 1: per-bucket max; prefix (exclusive) max over the bucket frame
    bmax = bucketed.groupBy("b").agg(F.max("us").alias("bmax"))
    prefix = bmax.select(
        "b",
        F.max("bmax")
        .over(Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1))
        .alias("pmax"),
    )
    # phase 2: within-bucket running max, combined with the bucket prefix
    w = (
        Window.partitionBy("b")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = (
        bucketed.join(F.broadcast(prefix), "b")
        .select(
            "us",
            F.greatest(
                F.max("us").over(w), F.coalesce("pmax", F.lit(0))
            ).alias("run_max"),
        )
    )
    return (
        run.groupBy(
            F.floor((F.col("run_max") - F.col("us")) / 3600000000.0)
            .cast("int")
            .alias("lateness_hours")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("lateness_hours")
    )
