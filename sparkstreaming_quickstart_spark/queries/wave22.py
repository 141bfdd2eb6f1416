"""Wave-22 operators (round 7, final): community structure over the
near-dup graph and streaming novelty monitoring -- the two remaining
"operate on the output of dedup" shapes.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md
section-2.B training-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q319: label-propagation communities over the near-dup graph
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    from .llm import _jaccard_oracle

    pairs = _jaccard_oracle(0.7, order_by=False).strip()
    sql = f"""
    WITH prs AS MATERIALIZED ({pairs}),
    edges AS MATERIALIZED (
        SELECT d1 AS u, d2 AS v FROM prs UNION ALL SELECT d2, d1 FROM prs),
    l0 AS (SELECT DISTINCT u AS node, u AS label FROM edges)"""
    prev = "l0"
    for r in range(1, _LPA_ROUNDS + 1):
        sql += f""",
    l{r} AS MATERIALIZED (
        SELECT node, label FROM (
            SELECT e.u AS node, l.label AS label, COUNT(*) AS c,
                   ROW_NUMBER() OVER (PARTITION BY e.u
                                      ORDER BY COUNT(*) DESC, l.label) AS rn
            FROM edges e JOIN {prev} l ON e.v = l.node
            GROUP BY e.u, l.label)
        WHERE rn = 1)"""
        prev = f"l{r}"
    sql += f"""
    SELECT node AS doc_id, label AS community FROM {prev} ORDER BY doc_id
"""
    return sql


@register(
    "q319_lpa_communities",
    sql=_lpa_oracle(),
    doc="Label-propagation communities over the exact near-dup graph "
    "(3-shingle Jaccard >= 0.7): three SYNCHRONOUS rounds of "
    "mode-of-neighbor-labels with a deterministic tie-break (highest "
    "count, then lowest label) -- the community-detection complement of "
    "q89's connected components (CC answers 'reachable at all'; LPA's "
    "majority dynamics split a component along its dense cores, the "
    "template-family view of a dup cluster).  Fixed round count + total "
    "tie order keep the iteration engine-exact; the Spark graph comes "
    "from the bucketed LSH pipeline (output-equal to exact Jaccard at "
    "0.7, the q52/q315 banding-knee contract) while the oracle unrolls "
    "the same three rounds over the exact pair graph as MATERIALIZED "
    "CTEs (README rule 9 -- each round joins the edge set once).  "
    "Plan: the edge set materializes once (eager localCheckpoint, rule 9) "
    "and each round is one join + one (node, label) hash-agg + one "
    "node-partitioned window -- shuffles on node only, round state is one "
    "row per node; the q233 connected-components lineage discipline.",
)
def q319_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    # Scale path: the LSH pair stream, not the exact all-pairs builder --
    # output-equal to the exact formulation at threshold 0.7 (q52's
    # banding-knee argument, same contract as q315), so the exact-Jaccard
    # oracle graph is identical while the Spark side stays bucketed.
    prs = minhash_lsh_pairs(d, "text", "doc_id", n=3, threshold=0.7).select("d1", "d2")
    edges = prs.union(
        prs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
    ).select(F.col("d1").alias("u"), F.col("d2").alias("v"))
    edges = edges.localCheckpoint(eager=True)  # consumed once per round
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("label"))
    for _ in range(_LPA_ROUNDS):
        nb = edges.join(labels, edges["v"] == labels["node"]).select(
            edges["u"].alias("node"), "label"
        )
        cnt = nb.groupBy("node", "label").agg(F.count("*").alias("c"))
        labels = (
            cnt.select("node", "label", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
        # rule 9 / q233 lineage discipline: truncate per round so the plan
        # does not inline r joins deep and re-run earlier rounds per consumer
        labels = labels.localCheckpoint(eager=True)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("community")
    ).orderBy("doc_id")
