"""Reference-parity CLI (A7) + streaming parquet sink + partition pruning."""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import tempfile

from pyspark.sql import functions as F

from sparkstreaming_quickstart_spark.plans.inspect import explain_str
from sparkstreaming_quickstart_spark.sources.catalog import load_table
from sparkstreaming_quickstart_spark.streaming.source import events_stream


def test_cli_replay_drain(sf_dir):
    """The reference's main() path: CLI -> pipeline -> console sink, drained.
    Runs as a subprocess (fresh session like a real spark-submit)."""
    ckpt = tempfile.mkdtemp(prefix="ssq-cli-")
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "sparkstreaming_quickstart_spark",
            "--replay-dir",
            sf_dir,
            "--drain",
            "--checkpoint-folder",
            ckpt,
            "--name",
            "cli-test",
        ],
        cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "event_type" in out.stdout  # console sink printed records


def test_cli_query_mode_runs_registered_query(sf_dir):
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "sparkstreaming_quickstart_spark",
            "--query",
            "q01_pricing_summary",
            "--sf-dir",
            sf_dir,
            "--limit",
            "3",
        ],
        cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "l_returnflag" in out.stdout and "sum_qty" in out.stdout


def test_cli_requires_kafka_args():
    out = subprocess.run(
        [sys.executable, "-m", "sparkstreaming_quickstart_spark"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode != 0
    assert "--zookeeper" in out.stderr


def test_streaming_parquet_sink(spark, sf_dir):
    """Stream -> parquet files + checkpoint; batch read-back equals input."""
    outdir = tempfile.mkdtemp(prefix="ssq-parquet-sink-")
    ckpt = tempfile.mkdtemp(prefix="ssq-parquet-ckpt-")
    q = (
        events_stream(spark, sf_dir)
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    written = spark.read.parquet(outdir)
    assert written.count() == load_table(spark, sf_dir, "events").count()
    assert glob.glob(os.path.join(ckpt, "offsets", "*")), "offset WAL missing"


def test_partitioned_write_prunes(spark, sf_dir):
    """partitionBy write -> filtered read hits only one partition directory."""
    outdir = tempfile.mkdtemp(prefix="ssq-part-")
    e = load_table(spark, sf_dir, "events")
    e.write.partitionBy("event_type").mode("overwrite").parquet(outdir)
    back = spark.read.parquet(outdir).filter(F.col("event_type") == "click")
    plan = explain_str(back, "formatted")
    assert "PartitionFilters" in plan
    assert back.count() == e.filter(F.col("event_type") == "click").count()


def test_csv_and_json_source_roundtrip(spark, sf_dir, tmp_path):
    """CSV and JSON line formats read back losslessly under an explicit
    schema (the generic-source surface beyond parquet; a reference user's
    first non-Kafka input is usually one of these).  Timestamps pinned to a
    format so the roundtrip is exact."""
    from pyspark.sql import functions as F

    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").limit(500)
    csv_path, json_path = str(tmp_path / "li_csv"), str(tmp_path / "li_json")
    li.write.option("header", True).option("timestampFormat", "yyyy-MM-dd HH:mm:ss").csv(csv_path)
    li.write.option("timestampFormat", "yyyy-MM-dd HH:mm:ss").json(json_path)
    back_csv = (
        spark.read.schema(li.schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(csv_path)
    )
    back_json = (
        spark.read.schema(li.schema)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .json(json_path)
    )
    key = [r["l_orderkey"] for r in li.select("l_orderkey").orderBy("l_orderkey", "l_linenumber").collect()]
    for back in (back_csv, back_json):
        assert back.schema == li.schema
        assert back.count() == 500
        got = [r["l_orderkey"] for r in back.select("l_orderkey", "l_linenumber").orderBy("l_orderkey", "l_linenumber").collect()]
        assert got == key
    # value fidelity: exact decimal checksum matches across all three forms
    def chk(df):
        return df.agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        ).collect()[0]

    assert chk(back_csv) == chk(li)
    assert chk(back_json) == chk(li)


def test_observation_metrics_single_pass(spark, sf_dir):
    """df.observe collects operational metrics (row counts, sums) during the
    one real pass over the data -- at 100 TB a second count() scan is not an
    option, so pipelines attach observations instead."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    obs = Observation("ingest_stats")
    li = load_table(spark, sf_dir, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_total"),
    )
    kept = li.filter(F.col("l_returnflag") == "R").count()
    stats = obs.get
    assert stats["rows_seen"] == load_table(spark, sf_dir, "lineitem").count()
    assert kept < stats["rows_seen"]
    assert stats["qty_total"] is not None


def test_ground_truth_tags_and_cli_surfacing(sf_dir):
    """Scale-class fence (round 9, extended rounds 10-11): the seven exact/
    all-pairs parity entries carry scale_class='ground-truth',
    --list-queries marks them, and --query warns before running one.  No
    untagged registry entry may have a cartesian product in the committed
    plan audit."""
    import json

    from sparkstreaming_quickstart_spark.queries import all_queries

    qs = all_queries()
    tagged = {n for n, q in qs.items() if q.scale_class == "ground-truth"}
    assert tagged == {
        "q51_dedup_jaccard_exact",
        "q54_similarity_topk",
        "q114_dedup_embedding_exact",
        "q178_brp_lsh_euclidean",
        # round 10: the exact inverted-index TF-IDF join is Sum C(df,2) --
        # measured quadratic-class on a Zipf vocab even with the df>50%
        # stop-word prune (wave8.py docstring; SCALING.md round-10 note)
        "q222_tfidf_cosine_pairs",
        # round 11 (round-10 verdict #1): the GLOBAL-exact mutual-kNN
        # broadcasts + collect()s the corpus by construction; q386's
        # per-IVF-cell form is the registered scale primary
        "q329_mutual_knn_graph",
        # round 11: the recall eval NEEDS the exact side (it scores q386
        # against q329's kernel), so it inherits the fence
        "q389_knn_cell_recall",
    }
    assert {q.scale_class for q in qs.values()} <= {"scale", "ground-truth"}
    with open("/root/repo/tools/plan_audit.json") as fh:
        audit = json.load(fh)
    for name, m in audit.items():
        if m.get("cartesian_products", 0) > 0:
            assert name in tagged, f"{name} has a cartesian product but no tag"
    # --list-queries marks the tagged entries
    out = subprocess.run(
        [sys.executable, "-m", "sparkstreaming_quickstart_spark", "--list-queries"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    listed = {
        line.split("\t")[0].removesuffix(" [ground-truth]")
        for line in out.stdout.splitlines()
        if " [ground-truth]\t" in line
    }
    assert listed == tagged
    # --query on a tagged entry warns on stderr but still runs
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "sparkstreaming_quickstart_spark",
            "--query",
            "q114_dedup_embedding_exact",
            "--sf-dir",
            sf_dir,
            "--limit",
            "3",
        ],
        cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ground-truth/all-pairs parity query" in out.stderr
