"""Stage-level timing for q306_corpus_pipeline_v3 (round-14 item 3).

Re-builds the pipeline stage by stage at $SPARK_GRAFT_SF_DIR and times each
materialization boundary separately (noop sink / the stage's own action), so
the 40.9 s sf1 wall can be attributed before any rewrite (guide §1).

Usage: SPARK_GRAFT_SF_DIR=/tmp/sfgen/sf1 python tools/profile_q306_stages.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from pyspark.sql import functions as F

    from sparkstreaming_quickstart_spark.functions.text import word_shingles
    from sparkstreaming_quickstart_spark.operators.dedup import md5_mod, minhash_lsh_pairs
    from sparkstreaming_quickstart_spark.queries.wave18 import _QCLS_BUCKETS, _qcls_weights
    from sparkstreaming_quickstart_spark.queries.wave19 import (
        _V3_JACCARD_T,
        _bloom_build,
        _bloom_probe_kernel,
    )
    from sparkstreaming_quickstart_spark.session import get_spark
    from sparkstreaming_quickstart_spark.sources.catalog import load_table

    spark = get_spark("q306-stages")
    spark.range(1000).selectExpr("sum(id)").collect()
    t_all0 = time.time()

    def mark(label, t0):
        print(f"  {label:<38} {time.time() - t0:6.2f}s", flush=True)

    d = load_table(spark, SF_DIR, "documents").filter(F.length("text") > 0)
    base = d.select("doc_id", "source", "text")

    # Stage 1: classifier gate
    t0 = time.time()
    wts = _qcls_weights()
    weights = spark.createDataFrame(
        [(b, wts[b]) for b in range(_QCLS_BUCKETS)], "bucket long, w double"
    )
    scored = (
        base.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .select("doc_id", md5_mod(F.col("token"), _QCLS_BUCKETS).alias("bucket"))
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.avg("w").alias("score"))
    )
    qual = (
        base.join(scored, "doc_id")
        .filter((F.round(F.col("score"), 9) >= 0) & (F.col("doc_id") % 97 != 0))
        .select("doc_id", "source", "text")
        .localCheckpoint(eager=True)
    )
    mark("stage1 classifier gate (checkpoint)", t0)

    # Stage 2a: eval-gram collect + bloom build
    t0 = time.time()
    grams4 = word_shingles("text", 4)
    ev_hashes = [
        r["h"]
        for r in d.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(grams4).alias("gram"))
        .distinct()
        .select(F.xxhash64("gram").alias("h"))
        .collect()
    ]
    bits = _bloom_build(ev_hashes)
    mark(f"stage2a eval hashes collect ({len(ev_hashes)})", t0)

    # Stage 2b: bloom probe
    t0 = time.time()
    hashed = qual.select("doc_id", F.transform(grams4, lambda g: F.xxhash64(g)).alias("ghs"))
    flagged = hashed.mapInPandas(_bloom_probe_kernel(bits), "doc_id long")
    n_flagged = flagged.count()
    mark(f"stage2b bloom probe ({n_flagged} flagged)", t0)

    # Stage 2c: exact verify + clean checkpoint
    t0 = time.time()
    flagged = hashed.mapInPandas(_bloom_probe_kernel(bits), "doc_id long")
    ev_grams = (
        d.filter(F.col("doc_id") % 97 == 0).select(F.explode(grams4).alias("gram")).distinct()
    )
    confirmed = (
        qual.join(F.broadcast(flagged), "doc_id")
        .select("doc_id", F.explode(grams4).alias("gram"))
        .join(F.broadcast(ev_grams), "gram")
        .select("doc_id")
        .distinct()
    )
    clean = qual.join(confirmed, "doc_id", "anti").localCheckpoint(eager=True)
    mark("stage2c exact verify + clean ckpt", t0)

    # Stage 3: LSH pairs + anti join
    t0 = time.time()
    pairs = minhash_lsh_pairs(clean, "text", "doc_id", n=3, threshold=_V3_JACCARD_T)
    dropped = pairs.select(F.col("d2").alias("doc_id")).distinct()
    final = clean.join(dropped, "doc_id", "anti")
    final.write.format("noop").mode("overwrite").save()
    mark("stage3 LSH + anti (noop)", t0)

    # Stage 4: funnel rollup (whole query end-to-end for reference)
    t0 = time.time()
    from sparkstreaming_quickstart_spark.queries.wave19 import q306_corpus_pipeline_v3

    q306_corpus_pipeline_v3(spark, SF_DIR).collect()
    mark("FULL q306 end-to-end", t0)
    print(f"  total harness wall {time.time() - t_all0:6.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
