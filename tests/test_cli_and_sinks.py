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
