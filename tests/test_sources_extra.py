"""Source-format coverage beyond parquet/CSV/JSON: ORC roundtrip, the
binaryFile source feeding the multimodal pipeline, and a custom Python
DataSource (Spark 4 extension point) -- the ingestion surfaces a
training-data pipeline uses for raw media drops and bespoke feeds."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_quickstart_spark.sources.catalog import load_table


def test_orc_roundtrip_exact(spark, sf_dir, tmp_path):
    """ORC writes and reads back losslessly (schema + decimal checksum).
    ORC is Spark-native columnar like parquet: pushdown and pruning apply,
    so it is a drop-in at 100 TB where the lake standard is ORC."""
    li = load_table(spark, sf_dir, "lineitem").limit(400)
    path = str(tmp_path / "li_orc")
    li.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == li.schema
    assert back.count() == 400
    chk = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s")
    ).collect()[0].s
    assert chk(back) == chk(li)


def test_orc_predicate_pushdown(spark, sf_dir, tmp_path):
    """The ORC scan carries the filter to the reader (same PushedFilters
    discipline the parquet plan tests pin)."""
    li = load_table(spark, sf_dir, "lineitem").limit(400)
    path = str(tmp_path / "li_orc_pd")
    li.write.orc(path)
    plan = (
        spark.read.orc(path)
        .filter(F.col("l_quantity") > 25)
        .select("l_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "l_quantity" in plan


def test_binaryfile_source_feeds_multimodal(spark, tmp_path):
    """format('binaryFile') lists raw files as (path, length, content binary)
    rows -- the ingestion step for image/audio drops.  The content column
    feeds the same Arrow-batched metadata extractor the multimodal queries
    use, proving the plumbing end-to-end from files on disk."""
    from sparkstreaming_quickstart_spark.operators.multimodal import extract_media_meta

    blobs = {f"m{i}.bin": bytes([i]) * (10 + i) for i in range(5)}
    for name, payload in blobs.items():
        (tmp_path / name).write_bytes(payload)

    df = spark.read.format("binaryFile").load(str(tmp_path))
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 5
    by_name = {r.path.rsplit("/", 1)[-1]: r for r in rows}
    for name, payload in blobs.items():
        assert by_name[name].length == len(payload)
        assert bytes(by_name[name].content) == payload

    media = df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("payload"),
    )
    meta = extract_media_meta(media)
    got = {r.n_bytes for r in meta.collect()}
    assert got == {len(p) for p in blobs.values()}


def test_python_datasource_custom_reader(spark):
    """Custom Python DataSource (Spark 4): a deterministic synthetic feed
    registered under a short name and read like any built-in format, with
    one reader task per InputPartition -- the extension point for bespoke
    feeds (tar shards, WARC dumps, proprietary stores) without a JVM
    connector.  Registration is per-session; the source emits rows from
    its partition value deterministically so the test is exact."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class SyntheticEventsSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_events"

        def schema(self):
            return "part int, seq int, val double"

        def reader(self, schema):
            return _Reader(self.options)

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.n_parts = int(options.get("parts", "4"))
            self.rows_per_part = int(options.get("rowsperpart", "25"))

        def partitions(self):
            return [InputPartition(i) for i in range(self.n_parts)]

        def read(self, partition):
            p = partition.value
            for i in range(self.rows_per_part):
                yield (p, i, float(p * 1000 + i) / 8.0)

    spark.dataSource.register(SyntheticEventsSource)
    df = spark.read.format("synthetic_events").option("parts", 4).option("rowsPerPart", 25).load()
    assert df.count() == 100
    assert df.select(F.countDistinct("part")).collect()[0][0] == 4
    got = df.agg(F.sum("val").alias("s")).collect()[0].s
    expect = sum(float(p * 1000 + i) / 8.0 for p in range(4) for i in range(25))
    assert abs(got - expect) < 1e-9


def test_python_datasource_streaming_reader(spark, tmp_path):
    """STREAMING custom Python DataSource (Spark 4 SimpleDataSourceStreamReader):
    a deterministic offset-ranged feed read with spark.readStream and drained
    into a memory sink.  This is the extension point for bespoke streaming
    feeds (queue tails, HTTP cursors, change feeds) without a JVM connector:
    the reader owns its offset contract (initialOffset / read -> next offset /
    readBetweenOffsets for replay), and exactly-once falls out of the same
    checkpoint mechanics as the built-in sources."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    BATCH = 10
    LIMIT = 30  # source exhausts after 3 micro-batches

    class CounterStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "counter_stream"

        def schema(self):
            return "seq int, val double"

        def simpleStreamReader(self, schema):
            return _StreamReader()

    class _StreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = start["pos"]
            end = min(pos + BATCH, LIMIT)
            rows = [(i, i / 4.0) for i in range(pos, end)]
            return iter(rows), {"pos": end}

        def readBetweenOffsets(self, start, end):
            return iter([(i, i / 4.0) for i in range(start["pos"], end["pos"])])

    spark.dataSource.register(CounterStreamSource)
    table = "counter_stream_sink"
    q = (
        spark.readStream.format("counter_stream")
        .load()
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time as _time

    deadline = _time.time() + 60
    while _time.time() < deadline:
        rows = spark.table(table).count()
        if rows >= LIMIT:
            break
        _time.sleep(0.5)
    q.stop()
    got = sorted((r.seq, r.val) for r in spark.table(table).collect())
    assert got[:LIMIT] == [(i, i / 4.0) for i in range(LIMIT)]


def test_python_datasource_custom_writer_two_phase_commit(spark, sf_dir, tmp_path):
    """Python DataSource WRITE path (Spark 4): a custom sink with the
    two-phase commit protocol -- tasks write to staging and return commit
    messages, commit() atomically publishes, abort() would discard.  The
    other half of the extension point next to the custom readers above."""
    import json
    import os
    import uuid as _uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)

    class _Msg(WriterCommitMessage):
        def __init__(self, staged):
            self.staged = staged

    class _Writer(DataSourceWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, iterator):
            staged = os.path.join(self.path, f".staged-{_uuid.uuid4().hex}")
            with open(staged, "w") as fh:
                for row in iterator:
                    fh.write(json.dumps(row.asDict(), default=str) + "\n")
            return _Msg(staged)

        def commit(self, messages):
            for i, m in enumerate(messages):
                os.rename(m.staged, os.path.join(self.path, f"part-{i:05d}.jsonl"))

        def abort(self, messages):
            for m in messages:
                if os.path.exists(m.staged):
                    os.remove(m.staged)

    class JsonlSink(DataSource):
        @classmethod
        def name(cls):
            return "jsonlsink"

        def writer(self, schema, overwrite):
            return _Writer(self.options)

    spark.dataSource.register(JsonlSink)
    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id").limit(200)
    e.write.format("jsonlsink").option("path", out_dir).mode("append").save()

    published = [f for f in os.listdir(out_dir) if f.startswith("part-")]
    staged_left = [f for f in os.listdir(out_dir) if f.startswith(".staged-")]
    assert published and not staged_left
    got = sorted(
        json.loads(line)["event_id"]
        for f in published
        for line in open(os.path.join(out_dir, f))
    )
    assert got == sorted(r.event_id for r in e.collect())


def test_xml_source_roundtrip_exact(spark, sf_dir, tmp_path):
    """Spark 4 native XML file source (no spark-xml jar): write a typed
    slice of `orders` as XML, read it back under rowTag, and compare values
    exactly.  XML is the one self-describing text format whose reader must
    re-infer types; pinning the roundtrip catches schema-inference drift
    (long vs int, timestamp parsing) that parquet/ORC never exercise."""
    src = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .orderBy("o_orderkey")
        .limit(50)
    )
    path = str(tmp_path / "orders_xml")
    src.write.format("xml").option("rowTag", "order").mode("overwrite").save(path)
    back = spark.read.format("xml").option("rowTag", "order").load(path)
    a = sorted(src.collect(), key=lambda r: r["o_orderkey"])
    b = sorted(back.collect(), key=lambda r: r["o_orderkey"])
    assert len(a) == len(b) == 50
    for ra, rb in zip(a, b):
        assert ra["o_orderkey"] == rb["o_orderkey"]
        assert ra["o_custkey"] == rb["o_custkey"]
        assert abs(ra["o_totalprice"] - rb["o_totalprice"]) < 1e-9
        assert ra["o_orderstatus"] == rb["o_orderstatus"]
