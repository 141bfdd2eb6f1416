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


# ---------------------------------------------------------------------------
# q320: modularity of the LPA partition
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    # the q319 oracle's CTE chain, extended with the modularity arithmetic
    lpa = _lpa_oracle()
    head = lpa[: lpa.rindex("SELECT node AS doc_id")]
    return (
        head
        + f""", lab AS MATERIALIZED (
        SELECT node, label AS community FROM l{_LPA_ROUNDS}),
    m AS (SELECT COUNT(*) AS m FROM prs),
    intra AS (
        SELECT a.community, COUNT(*) AS l_c
        FROM prs JOIN lab a ON prs.d1 = a.node JOIN lab b ON prs.d2 = b.node
        WHERE a.community = b.community GROUP BY a.community),
    deg AS (
        SELECT lab.community, COUNT(*) AS d_c
        FROM edges JOIN lab ON edges.u = lab.node GROUP BY lab.community),
    parts AS (
        SELECT deg.community,
               COALESCE(intra.l_c, 0) AS l_c, deg.d_c
        FROM deg LEFT JOIN intra ON deg.community = intra.community)
    SELECT CAST(m.m AS BIGINT) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_communities,
           ROUND(SUM(l_c / CAST(m.m AS DOUBLE)
                     - (d_c * d_c) / (4.0 * m.m * m.m)), 6) + 0.0 AS modularity
    FROM parts, m GROUP BY m.m
"""
    )


@register(
    "q320_lpa_modularity",
    sql=_modularity_oracle(),
    doc="Newman modularity of the q319 LPA partition: Q = sum_c (L_c/m - "
    "(D_c/2m)^2) over communities, the single scalar that says whether the "
    "label-propagation split actually found dense cores (Q near 0 = no "
    "better than random).  L_c (intra-community edges) and D_c (degree "
    "sums) are exact integers in both engines; the one float combination "
    "rounds at 6 (the established tolerance).  "
    "Plan: re-runs the q319 chain (bucketed LSH graph + 3 checkpointed "
    "rounds), then three community-keyed hash-aggs over the "
    "|communities|-sized frames and a single-row combine -- the graph "
    "never re-shuffles beyond the q319 shapes.",
)
def q320_lpa_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    prs = minhash_lsh_pairs(d, "text", "doc_id", n=3, threshold=0.7).select("d1", "d2")
    prs = prs.localCheckpoint(eager=True)  # consumed by m, intra, and degrees
    lab = q319_lpa_communities(spark, sf_dir).select(
        F.col("doc_id").alias("node"), "community"
    )
    lab = lab.localCheckpoint(eager=True)  # consumed by intra and degrees
    m = prs.agg(F.count("*").alias("m"))
    a = lab.select(F.col("node").alias("d1"), F.col("community").alias("c1"))
    b = lab.select(F.col("node").alias("d2"), F.col("community").alias("c2"))
    intra = (
        prs.join(F.broadcast(a), "d1")
        .join(F.broadcast(b), "d2")
        .filter(F.col("c1") == F.col("c2"))
        .groupBy(F.col("c1").alias("community"))
        .agg(F.count("*").alias("l_c"))
    )
    edges = prs.union(prs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2")))
    deg = (
        edges.join(F.broadcast(a), "d1")
        .groupBy(F.col("c1").alias("community"))
        .agg(F.count("*").alias("d_c"))
    )
    parts = deg.join(intra, "community", "left").select(
        "community", F.coalesce("l_c", F.lit(0)).alias("l_c"), "d_c"
    )
    q = F.col("l_c") / F.col("m").cast("double") - (
        F.col("d_c") * F.col("d_c")
    ) / (4.0 * F.col("m") * F.col("m"))
    return (
        parts.crossJoin(F.broadcast(m))
        .groupBy("m")
        .agg(
            F.count("*").cast("bigint").alias("n_communities"),
            # + 0.0 normalizes -0.0 (a partition with all-negative rounded
            # terms summing to zero) so both engines hash "0", not "-0" --
            # the q295/q314 convention.
            (F.round(F.sum(q), 6) + F.lit(0.0)).alias("modularity"),
        )
        .select(
            F.col("m").cast("bigint").alias("n_edges"), "n_communities", "modularity"
        )
    )


# ---------------------------------------------------------------------------
# q321: 2-core peel of the near-dup graph
# ---------------------------------------------------------------------------

_PEEL_ROUNDS = 4


def _core_oracle() -> str:
    from .llm import _jaccard_oracle

    pairs = _jaccard_oracle(0.7, order_by=False).strip()
    sql = f"""
    WITH prs AS MATERIALIZED ({pairs}),
    e0 AS MATERIALIZED (
        SELECT d1 AS u, d2 AS v FROM prs UNION ALL SELECT d2, d1 FROM prs)"""
    prev = "e0"
    for r in range(1, _PEEL_ROUNDS + 1):
        sql += f""",
    k{r} AS (SELECT u FROM {prev} GROUP BY u HAVING COUNT(*) >= 2),
    e{r} AS MATERIALIZED (
        SELECT e.u, e.v FROM {prev} e
        JOIN k{r} a ON e.u = a.u JOIN k{r} b ON e.v = b.u)"""
        prev = f"e{r}"
    sql += f"""
    SELECT u AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM {prev} GROUP BY u ORDER BY doc_id
"""
    return sql


@register(
    "q321_dup_graph_2core",
    sql=_core_oracle(),
    doc="2-core of the near-dup graph: iteratively peel nodes with fewer "
    "than 2 surviving neighbors (4 unrolled synchronous rounds -- the "
    "fixture graphs converge earlier, which the reference test asserts), "
    "leaving the dense template-farm families and discarding incidental "
    "pairwise matches and chain tails -- the standard triage between "
    "'this source mirrors a template' and 'two docs happen to collide'.  "
    "Degree counts are exact integers; fixed round count keeps the "
    "iteration engine-exact (a convergence loop would be "
    "engine-schedule-dependent).  "
    "Plan: the bucketed LSH graph (q319's contract), then per round one "
    "degree hash-agg and one semi-join-shaped filter, each materialized "
    "(rule 9) -- shuffles on node only, edge set shrinks monotonically.",
)
def q321_dup_graph_2core(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    prs = minhash_lsh_pairs(d, "text", "doc_id", n=3, threshold=0.7).select("d1", "d2")
    edges = prs.union(
        prs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
    ).select(F.col("d1").alias("u"), F.col("d2").alias("v"))
    edges = edges.localCheckpoint(eager=True)
    for _ in range(_PEEL_ROUNDS):
        keep = (
            edges.groupBy("u")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= 2)
            .select("u")
        )
        keep = keep.localCheckpoint(eager=True)  # both join sides consume it
        edges = (
            edges.join(keep, "u")
            .join(keep.select(F.col("u").alias("v")), "v")
            .select("u", "v")
        )
        edges = edges.localCheckpoint(eager=True)
    return (
        edges.groupBy("u")
        .agg(F.count("*").cast("bigint").alias("core_degree"))
        .select(F.col("u").alias("doc_id"), "core_degree")
        .orderBy("doc_id")
    )
