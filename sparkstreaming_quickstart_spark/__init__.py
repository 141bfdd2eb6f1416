"""PySpark-native analytics engine with the capability surface of
pilillo/sparkstreaming-quickstart, rebuilt Spark-first.

The reference (`/root/reference/`, Java 8 / Spark 2.4 DStreams) implements one
Kafka->Avro->console pipeline (Processor.java:118-163).  This package
re-expresses that streaming capability on Structured Streaming and adds the
full relational / LLM-data-pipeline operator surface documented in SURVEY.md
section 2, designed for 100 TB scale (AQE, broadcast joins, decimal-exact
aggregation, LSH instead of brute force).

Layout:
    session      -- SparkSession tuning helpers (runtime-settable confs only)
    sources      -- batch parquet catalog + streaming sources (file replay, Kafka/Avro)
    functions    -- portable expression helpers (exact money aggregation, vectors, text)
    operators    -- composed operators Spark lacks as built-ins (as-of join, dedup, ANN)
    queries      -- the oracle-checked query registry (driver contract)
    streaming    -- Structured Streaming pipelines (reference parity, upgraded)
"""

__version__ = "0.1.0"
