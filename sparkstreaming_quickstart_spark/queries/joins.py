"""Join queries: inner/outer/semi/anti/theta/range/as-of + broadcast strategy.

Reference parity: the reference has no joins at all (SURVEY.md section 2.A
"explicitly absent"); this is charter surface.

Scale strategy (100 TB): dimension tables (region/nation/supplier/part,
customer at small SF) are explicitly `broadcast()` so the fact-table scan
never shuffles for them; fact-fact joins (lineitem-orders) shuffle on the join
key and rely on AQE for skew splitting.  The range join builds its bucket dim
as a literal DataFrame (broadcast nested-loop stays tiny); the as-of join uses
the single-shuffle window formulation in operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import dec, dsum
from ..operators.asof import asof_join
from ..sources.catalog import load_table
from . import register


@register(
    "q10_join_inner",
    sql="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="Fact-fact inner equi-join (shuffle on orderkey, AQE-coalesced).",
)
def q10_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), dsum("l_extendedprice").alias("revenue"))
        .orderBy("o_orderpriority")
    )


@register(
    "q11_join_multiway",
    sql="""
    SELECT n.n_name,
           r.r_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    ORDER BY n.n_name, r.r_name
    """,
    doc="Star join: fact + 3 broadcast dims (zero shuffle until the agg).",
)
def q11_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
        .orderBy("n_name", "r_name")
    )


@register(
    "q12_join_left_outer",
    sql="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    ORDER BY c.c_custkey
    """,
    doc="Left outer join preserving customers without orders.",
)
def q12_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q13_join_semi",
    sql="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    ORDER BY c_custkey
    """,
    doc="Left-semi join (EXISTS): customers with at least one open order.",
)
def q13_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "q14_join_anti",
    sql="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders.",
)
def q14_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name").orderBy("c_custkey")


@register(
    "q15_join_theta",
    sql="""
    SELECT n.n_name,
           COUNT(*) AS n_pairs
    FROM supplier s
    JOIN customer c ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="Theta join: equi key + non-equi residual (supplier richer than customer).",
)
def q15_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("n_name")
    )


@register(
    "q16_join_range",
    sql="""
    SELECT b.band, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1e9)) AS b(band, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    ORDER BY b.band
    """,
    doc="Range/interval join against a broadcast literal bucket dim.",
)
def q16_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1e9)], ["band", "lo", "hi"]
    )
    return (
        e.join(F.broadcast(bands), (e.value >= bands.lo) & (e.value < bands.hi))
        .groupBy("band")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .orderBy("band")
    )


@register(
    "q17_join_cross",
    sql="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    ORDER BY from_region, to_region
    """,
    doc="Cross join (broadcast nested loop) over tiny dims.",
)
def q17_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r1 = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region")
    )
    r2 = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region")
    )
    return (
        r1.crossJoin(F.broadcast(r2))
        .filter(F.col("k1") != F.col("k2"))
        .select("from_region", "to_region")
        .orderBy("from_region", "to_region")
    )


@register(
    "q18_join_asof",
    sql="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT max_by(c.event_id, c.ts)
              FROM events c
             WHERE c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts
           ) AS asof_click_event_id
    FROM events e
    WHERE e.event_type = 'error'
    ORDER BY e.event_id
    """,
    doc="As-of join: latest prior click per user for each error event "
    "(window carry-forward, one shuffle; see operators/asof.py).",
)
def q18_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("asof_click_event_id")
    )
    joined = asof_join(
        errors,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        value_cols=["asof_click_event_id"],
        tiebreak="asof_click_event_id",
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("asof_asof_click_event_id").alias("asof_click_event_id")
    ).orderBy("event_id")


@register(
    "q147_salted_skew_join",
    sql="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="Skew-hardened fact-fact join via explicit key salting "
    "(operators/skew.salted_join, 8-way): the probe side scatters each "
    "key across 8 salt values (deterministic hash, not rand) and the "
    "build side replicates 8x, so one hot key spreads over 8 tasks "
    "instead of overwhelming one executor.  Semantics are identical to "
    "the plain inner join -- the oracle IS the plain join -- and the "
    "plan-shape test pins that AQE's skew handling stays on.  The tool "
    "for the 100 TB null-key/hot-user join that AQE's split still cannot "
    "balance.",
)
def q147_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, o, "l_orderkey", salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q160_null_safe_join",
    sql="""
    WITH e AS (
        SELECT CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) % 7 = 0
                    THEN NULL
                    ELSE CAST(json_extract_string(props, '$.k') AS INTEGER) % 7 END AS join_key
        FROM events),
    d AS (
        SELECT CASE WHEN n_nationkey % 7 = 0 THEN NULL ELSE n_nationkey % 7 END AS join_key,
               n_name
        FROM nation)
    SELECT e.join_key, COUNT(*) AS n_pairs
    FROM e JOIN d ON e.join_key IS NOT DISTINCT FROM d.join_key
    GROUP BY e.join_key
    ORDER BY e.join_key NULLS FIRST
    """,
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match "
    "each other instead of silently dropping -- the semantics a sessionizer "
    "needs when 'unattributed' is itself a join key.  Planner note: Spark "
    "compiles <=> to a HASHED join key (EqualNullSafe is a valid equi-join "
    "key), so this stays a broadcast-hash join, NOT a nested-loop -- "
    "null-safety costs nothing at 100 TB.  The NULL group is the classic "
    "skew key; at scale the q147 salting path applies to it verbatim.",
)
def q160_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("integer") % 7
    e = ev.select(F.when(k == 0, F.lit(None)).otherwise(k).alias("join_key"))
    nk = F.col("n_nationkey") % 7
    d = load_table(spark, sf_dir, "nation").select(
        F.when(nk == 0, F.lit(None)).otherwise(nk).alias("join_key"), "n_name"
    )
    return (
        e.join(F.broadcast(d), e["join_key"].eqNullSafe(d["join_key"]))
        .groupBy(e["join_key"])
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.asc_nulls_first("join_key"))
    )
