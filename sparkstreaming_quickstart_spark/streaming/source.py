"""Streaming sources.

Production path mirrors the reference's Kafka ingest (A1/A2,
Processor.java:118-139): `readStream.format("kafka")` + Avro decode, including
the Confluent wire-format header strip (magic byte + 4-byte schema id) that
`from_avro` does not understand.  Offsets/group management move into the
checkpoint WAL, superseding the reference's `enable.auto.commit=false` +
never-implemented manual commit (Processor.java:132-135).

Test/driver path replays the `events` parquet table through the file stream
source -- same unbounded-DataFrame surface, no broker needed.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from ..session import tune


def _events_ts_type(sf_dir: str) -> DataType:
    """Pick the stream-schema type for events.ts from the parquet footer.

    The fixture generator has shipped both TIMESTAMP(NANOS) (which Spark's
    reader surfaces as long under `nanosAsLong`) and TIMESTAMP(MICROS)
    (naive -> TIMESTAMP_NTZ).  Deriving the type from the file keeps the
    stream source in lockstep with whatever the batch reader sees instead of
    baking in one generator's choice.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
    if pa.types.is_timestamp(t) and t.unit != "ns":
        return TimestampType() if t.tz else TimestampNTZType()
    return LongType()  # nanos read as long; converted to micros below


def events_schema(sf_dir: str) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", _events_ts_type(sf_dir)),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def _stage_table_dir(sf_dir: str, table: str) -> str:
    """File stream sources need a *directory*; stage the single
    <table>.parquet into a per-sf temp dir (hard-link when possible, copy
    otherwise).

    The staging key includes the source file's (mtime, size), so regenerating
    the testdata in place invalidates the staged copy instead of silently
    replaying stale data for the life of the machine."""
    src = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{sf_dir}|{table}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    staged = os.path.join(tempfile.gettempdir(), f"ssq-{table}-{key}")
    target = os.path.join(staged, f"{table}.parquet")
    if not os.path.exists(target):
        os.makedirs(staged, exist_ok=True)
        try:
            os.link(src, target)
        except OSError:
            shutil.copyfile(src, target)
    return staged


def _stage_events_dir(sf_dir: str) -> str:
    return _stage_table_dir(sf_dir, "events")


def documents_schema() -> StructType:
    return StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )


def documents_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Replay documents.parquet as a file-source stream -- the corpus-ingest
    sibling of events_stream for the streaming curation operators (q372):
    at 100 TB this surface is the Kafka/object-store document firehose; the
    file replay is the same unbounded-DataFrame contract without a broker."""
    tune(spark)
    reader = spark.readStream.schema(documents_schema())
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(_stage_table_dir(sf_dir, "documents"))


def events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Replay events.parquet as a file-source stream (ts as a timestamp)."""
    tune(spark)
    schema = events_schema(sf_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(_stage_events_dir(sf_dir))
    if isinstance(schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif isinstance(schema["ts"].dataType, TimestampNTZType):
        # Watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on
        # NTZ).  tune() pins the session timezone to UTC, so this cast is a
        # value-preserving reinterpretation, not a shift.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def strip_confluent_header(value: Column | str) -> Column:
    """Drop the Confluent wire-format prefix from an Avro message value.

    The reference's KafkaAvroDeserializer resolves the writer schema from a
    5-byte prefix -- magic byte 0 + big-endian 4-byte schema id
    (Processor.java:51, registry lookup); Spark's `from_avro` expects a bare
    Avro body under a pinned reader schema, so the prefix must go.
    """
    col = F.col(value) if isinstance(value, str) else value
    return F.substr(col, F.lit(6), F.length(col) - F.lit(5))


def _require_avro(spark: SparkSession) -> None:
    """Fail fast with guidance if the spark-avro connector is absent.

    The Python wrapper always imports; the jar-missing failure otherwise
    surfaces only at analysis time as AVRO_NOT_LOADED -- probe analysis
    eagerly so callers get one clear error at build time.
    """
    try:
        from pyspark.sql.avro.functions import from_avro

        probe = spark.range(1).select(from_avro(F.lit(bytes([0])), '"bytes"'))
        probe._jdf.queryExecution().analyzed()
    except Exception as exc:
        raise NotImplementedError(
            "spark-avro connector required for Avro decode: submit with "
            "--packages org.apache.spark:spark-avro_2.13:<spark version>"
        ) from exc


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str],
    avro_schema_json: str | None = None,
    starting_offsets: str = "earliest",
    confluent_wire_format: bool = True,
    schema_id_map: dict[int, str] | None = None,
    reader_schema=None,
    registry_url: str | None = None,
    registry_schema_ids: list[int] | None = None,
    registry_http_get=None,
) -> DataFrame:
    """Kafka source with (Confluent-)Avro value decode.

    Reference parity (Processor.java:124-138): subscribe to topics, string
    key, Avro GenericRecord value, earliest/latest start.  The Kafka source
    itself requires the spark-sql-kafka package on the classpath; raises a
    clear error otherwise (it does not ship in this container).

    Two decode routes:
      * `avro_schema_json`: single pinned reader schema via the spark-avro
        connector's `from_avro` (JVM decode; jar required).
      * `schema_id_map` (+ `reader_schema` StructType): per-record writer
        schema resolved from the Confluent wire header id -- the reference's
        registry behavior (Processor.java:128-130), with the id->schema map
        resolved once at query build (SURVEY.md 1.2).  Pure-Python
        Arrow-batched decode (streaming/avro_wire.py); no extra jar.

    Instead of a pre-dumped `schema_id_map`, pass `registry_url` (+
    `registry_schema_ids`, and `reader_schema` as above) to resolve the
    map from a live Confluent Schema Registry at query build --
    driver-side, stdlib HTTP, transport injectable via
    `registry_http_get` (streaming/schema_registry.py; the reference's
    schema.registry.url behavior, Processor.java:128-130).
    """
    if schema_id_map is None and registry_url is not None:
        if not registry_schema_ids:
            raise ValueError("registry_url requires registry_schema_ids")
        from .schema_registry import _stdlib_http_get, fetch_schema_map

        schema_id_map = fetch_schema_map(
            registry_url,
            registry_schema_ids,
            registry_http_get or _stdlib_http_get,
        )
    df = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting_offsets)
        .load()
    )
    out = df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )
    if schema_id_map is not None:
        if reader_schema is None:
            raise ValueError("schema_id_map requires reader_schema (StructType)")
        from .avro_wire import decode_confluent_avro

        return decode_confluent_avro(out, reader_schema, schema_id_map)
    if avro_schema_json is not None:
        _require_avro(spark)
        from pyspark.sql.avro.functions import from_avro

        payload = strip_confluent_header("value") if confluent_wire_format else F.col("value")
        out = out.withColumn("record", from_avro(payload, avro_schema_json))
    return out


def rate_stream(spark: SparkSession, rows_per_second: int = 100, synthetic_events: bool = True) -> DataFrame:
    """Built-in rate source, optionally shaped like the events table.

    The rate source is the brokerless stand-in for load/soak testing the
    streaming pipeline (SURVEY.md section 2.B "File/rate stream source"):
    unbounded (timestamp, value) rows at a controlled rate, mapped here onto
    the events schema so every downstream operator (windows, dedup, stateful)
    accepts it unchanged.
    """
    tune(spark)
    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    if not synthetic_events:
        return df
    return df.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 100).alias("user_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("purchase"), F.lit("error")),
            (F.col("value") % 4 + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("value") * 7919, F.lit(10000)) / 100.0).alias("value"),
        F.to_json(F.struct((F.col("value") % 97).alias("k"))).alias("props"),
    )
