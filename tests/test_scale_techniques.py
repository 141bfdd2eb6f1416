"""Scale techniques: salted skew join preserves semantics; bucketed tables
join without a shuffle (the co-location strategy for repeated fact-fact joins
at 100 TB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_quickstart_spark.operators.skew import salted_join
from sparkstreaming_quickstart_spark.plans.inspect import explain_str
from sparkstreaming_quickstart_spark.sources.catalog import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = (
        li.join(o, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
        .collect()
    )
    salted = (
        salted_join(li, o, "l_orderkey", salt=8)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
        .collect()
    )
    assert [tuple(r) for r in plain] == [tuple(r) for r in salted]


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """Pre-bucketing both sides on the join key removes the exchange -- the
    physical plan must contain a SortMergeJoin with no shuffle above scans."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("o_bucketed")
    # disable broadcast + AQE coalescing so the bucket optimization is visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("o_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = explain_str(joined, "simple")
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
