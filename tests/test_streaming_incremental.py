"""Multi-batch streaming fidelity: maxFilesPerTrigger paces the replay into
several micro-batches (the reference's batch-period discretization, A4), and
incremental aggregation still converges to the batch answer."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from sparkstreaming_quickstart_spark.sources.catalog import load_table
from sparkstreaming_quickstart_spark.streaming.pipeline import run_foreach_batch
from sparkstreaming_quickstart_spark.streaming.source import EVENTS_SCHEMA


def test_multi_batch_replay_incremental_agg(spark, sf_dir):
    # Split events into 4 files so availableNow + maxFilesPerTrigger=1 yields
    # 4 micro-batches.
    splitdir = tempfile.mkdtemp(prefix="ssq-split-")
    src = load_table(spark, sf_dir, "events")
    src.repartition(4).write.mode("overwrite").parquet(splitdir)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(splitdir)
    )
    batches: list[int] = []
    totals: dict[str, float] = {}

    def sink(df, epoch_id):
        batches.append(df.count())
        for row in df.groupBy("event_type").agg(F.count("*").alias("n")).collect():
            totals[row.event_type] = totals.get(row.event_type, 0) + row.n

    q = run_foreach_batch(stream, sink)
    q.awaitTermination()

    assert len(batches) >= 4, f"expected >=4 micro-batches, got {len(batches)}"
    assert sum(batches) == src.count()
    expected = {r.event_type: r.n for r in src.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert totals == expected
