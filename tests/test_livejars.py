"""Live-jar contingency (queries/livejars.py): the A1/A2 gates must flip to
auto-registered oracle-checked entries the moment the connector jars land,
and stay silent (no broken registry entries) while they are absent."""

from __future__ import annotations

import os

from sparkstreaming_quickstart_spark.queries import all_queries
from sparkstreaming_quickstart_spark.queries.livejars import has_jar


def test_has_jar_detects_fragment(tmp_path):
    (tmp_path / "spark-avro_2.13-4.1.2.jar").write_bytes(b"")
    assert has_jar("spark-avro", dirs=[str(tmp_path)])
    assert not has_jar("spark-sql-kafka", dirs=[str(tmp_path)])
    assert not has_jar("spark-avro", dirs=[str(tmp_path / "nope")])


def test_registry_matches_jar_presence():
    # Whichever state the container is in, the registry must agree with it:
    # jar present -> live entry registered; jar absent -> entry absent (so
    # the driver never runs a query that cannot resolve its source).
    names = set(all_queries())
    assert has_jar("spark-avro") == ("q248_avro_jvm_wire_roundtrip" in names)
    assert has_jar("spark-sql-kafka") == ("q249_kafka_source_live" in names)


def test_live_entries_run_when_jars_present(spark, sf_dir):
    # Self-activating: a no-op today, the real end-to-end test the moment
    # the container gains the jars.
    qs = all_queries()
    for name in ("q248_avro_jvm_wire_roundtrip", "q249_kafka_source_live"):
        if name in qs:
            assert qs[name].fn(spark, sf_dir).count() > 0
