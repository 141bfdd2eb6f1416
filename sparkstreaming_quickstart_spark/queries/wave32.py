"""Wave-32 operator (round 8, final): duplicate-cluster source purity --
the cluster-level complement of the q315/q331 pair matrices.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; this is a charter extension in the SURVEY.md
section-2.B dedup/graph family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register


def _purity_oracle() -> str:
    from .llm import _jaccard_oracle

    pairs = _jaccard_oracle(0.7, order_by=False).strip()
    return f"""
    WITH RECURSIVE
    prs AS MATERIALIZED (SELECT d1, d2 FROM ({pairs})),
    edges AS MATERIALIZED (
        SELECT d1 AS u, d2 AS v FROM prs UNION ALL SELECT d2, d1 FROM prs),
    cc(node, label) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.v, cc.label FROM cc JOIN edges e ON cc.node = e.u),
    lab AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM cc GROUP BY node),
    m AS (
        SELECT lab.cluster_id, d.source, COUNT(*) AS c
        FROM lab JOIN documents d ON lab.doc_id = d.doc_id
        GROUP BY lab.cluster_id, d.source),
    tot AS (SELECT cluster_id, SUM(c) AS n FROM m GROUP BY cluster_id)
    SELECT m.cluster_id,
           CAST(MAX(tot.n) AS BIGINT) AS n_members,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           ROUND(MAX(m.c) / CAST(MAX(tot.n) AS DOUBLE), 6) AS purity,
           ROUND(SUM(-(m.c / CAST(tot.n AS DOUBLE))
                     * ln(m.c / CAST(tot.n AS DOUBLE))), 6) + 0.0
               AS source_entropy
    FROM m JOIN tot ON m.cluster_id = tot.cluster_id
    GROUP BY m.cluster_id
    ORDER BY m.cluster_id
    """


@register(
    "q352_dup_cluster_purity",
    sql=_purity_oracle(),
    doc="Duplicate-cluster source purity: per connected dup cluster (q89's "
    "components over the Jaccard>=0.7 graph), the dominant-source share "
    "and the source entropy of its members -- purity 1.0 / entropy 0 "
    "means an intra-source template family (dedup locally), low purity "
    "means cross-source syndication or scraping overlap (dedup must run "
    "globally BEFORE source-level curation decisions; the q315/q331 pair "
    "matrices give the corpus-level view, this names the specific "
    "clusters).  Member counts are exact; purity and entropy are final "
    "rounded floats (entropy sums -p ln p over the per-cluster source "
    "histogram; + 0.0 normalizes the pure-cluster zero).  Plan: CC over "
    "the bucketed LSH pair stream (q233's checkpointed propagation), one "
    "(cluster, source) hash-agg over the graph-sized label frame, "
    "cluster-bounded rollup -- corpus touched once for the source "
    "column.",
)
def q352_dup_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components, minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", n=3, threshold=0.7)
    lab = connected_components(pairs)
    m = (
        lab.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("cluster_id", "source")
        .agg(F.count("*").alias("c"))
    )
    m = m.localCheckpoint(eager=True)  # consumed by totals and the rollup
    tot = m.groupBy("cluster_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    return (
        m.join(F.broadcast(tot), "cluster_id")
        .groupBy("cluster_id")
        .agg(
            F.max("n").cast("bigint").alias("n_members"),
            F.count("*").cast("bigint").alias("n_sources"),
            F.round(F.max("c") / F.max("n").cast("double"), 6).alias("purity"),
            (F.round(F.sum(-p * F.log(p)), 6) + F.lit(0.0)).alias("source_entropy"),
        )
        .orderBy("cluster_id")
    )
