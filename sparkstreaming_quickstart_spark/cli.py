"""Reference-parity CLI entry point (A7, Processor.java:87-116 / main at
165-171), upgraded to Structured Streaming.

Same surface as the reference's argparse4j parser -- --name, --zookeeper
(which the reference actually uses as the Kafka bootstrap servers, see
Processor.java:124-126), --registry, --earliest, --checkpoint-folder,
--batch-period, --source-topic -- plus --replay-dir to run the pipeline off
the file-replay source when no broker exists (the driver/test environment).

Fixes inherited reference bugs by construction (SURVEY.md section 7 risks):
the checkpoint always has the sink attached (per-query checkpointLocation),
batch-period is honored on every code path, and a missing --earliest simply
defaults instead of NPE-ing (Processor.java:77).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from .session import get_spark
from .streaming.source import events_stream, kafka_stream


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sparkstreaming-quickstart-spark",
        description="Kafka/replay -> transform -> console streaming pipeline",
    )
    p.add_argument("--name", default="sparkstreaming-quickstart-spark")
    p.add_argument("--zookeeper", help="Kafka bootstrap servers (reference arg name kept for parity)")
    p.add_argument("--registry", help="Schema-registry URL (Confluent wire format assumed when set)")
    p.add_argument("--earliest", action="store_true", help="start from earliest offsets")
    p.add_argument("--checkpoint-folder", default=None)
    p.add_argument("--batch-period", type=int, default=1000, help="micro-batch trigger in ms")
    p.add_argument("--source-topic", action="append", default=[], help="repeatable")
    p.add_argument("--avro-schema", default=None, help="reader Avro schema JSON (value decode)")
    p.add_argument("--replay-dir", default=None, help="run off the events.parquet replay instead of Kafka")
    p.add_argument("--drain", action="store_true", help="availableNow: process everything then stop")
    p.add_argument(
        "--query",
        default=None,
        metavar="NAME",
        help="run a registered analytics query (see --list-queries) against "
        "--sf-dir and print the result instead of starting the pipeline",
    )
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="table directory for --query")
    p.add_argument("--limit", type=int, default=20, help="rows to show for --query")
    p.add_argument("--explain", action="store_true", help="with --query: print the physical plan too")
    p.add_argument("--list-queries", action="store_true", help="list registered query names and exit")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.list_queries:
        from .queries import all_queries

        for name, q in all_queries().items():
            tag = " [ground-truth]" if q.scale_class == "ground-truth" else ""
            print(f"{name}{tag}\t{(q.doc or '').strip().splitlines()[0] if q.doc else ''}")
        return 0
    spark = get_spark(args.name)
    if args.query:
        from .queries import all_queries

        registry = all_queries()
        if args.query not in registry:
            raise SystemExit(f"unknown query {args.query!r}; see --list-queries")
        if registry[args.query].scale_class == "ground-truth":
            print(
                f"WARNING: {args.query} is a ground-truth/all-pairs parity query "
                "kept for oracle and recall evaluation; it does not scale to "
                "production data sizes. Use its bucketed sibling for real runs "
                "(see the query doc / COVERAGE.md).",
                file=sys.stderr,
            )
        df = registry[args.query].fn(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
        return 0
    if args.replay_dir:
        stream = events_stream(spark, args.replay_dir).select(
            F.col("event_id").cast("string").alias("key"),
            F.to_json(F.struct("ts", "user_id", "event_type", "value")).alias("value"),
        )
    else:
        if not args.zookeeper or not args.source_topic:
            raise SystemExit("--zookeeper and --source-topic required without --replay-dir")
        stream = kafka_stream(
            spark,
            bootstrap_servers=args.zookeeper,
            topics=args.source_topic,
            avro_schema_json=args.avro_schema,
            starting_offsets="earliest" if args.earliest else "latest",
            confluent_wire_format=args.registry is not None,
        )
    # Reference sink semantics (A3): print key/value per record.
    writer = (
        stream.writeStream.format("console")
        .option("truncate", "false")
        .option("checkpointLocation", args.checkpoint_folder or "/tmp/ssq-cli-checkpoint")
    )
    if args.drain:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{args.batch_period} milliseconds")
    q = writer.start()
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
