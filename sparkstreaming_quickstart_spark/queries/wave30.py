"""Wave-30 operators (round 8, final): link-prediction scoring over the
near-dup graph and per-cluster embedding outlier quarantine.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md
section-2.B graph/embedding families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register
from .wave23 import _dup_graph_oracle_head, _dup_pairs

# ---------------------------------------------------------------------------
# q349: Adamic-Adar link prediction over the near-dup graph
# ---------------------------------------------------------------------------


@register(
    "q349_adamic_adar",
    sql=_dup_graph_oracle_head()
    + """,
    deg AS (SELECT u AS n, COUNT(*) AS d FROM edges GROUP BY u),
    wedges AS (
        SELECT e1.u AS a, e2.v AS b, e1.v AS z
        FROM edges e1 JOIN edges e2 ON e1.v = e2.u
        WHERE e1.u < e2.v),
    scored AS (
        SELECT a, b,
               CAST(COUNT(*) AS BIGINT) AS common_neighbors,
               ROUND(SUM(1.0 / ln(dz.d)), 6) AS adamic_adar
        FROM wedges JOIN deg dz ON wedges.z = dz.n
        WHERE dz.d >= 2
        GROUP BY a, b),
    existing AS (SELECT d1 AS a, d2 AS b FROM prs)
    SELECT s.a AS d1, s.b AS d2, s.common_neighbors, s.adamic_adar,
           (e.a IS NOT NULL) AS already_linked
    FROM scored s LEFT JOIN existing e ON s.a = e.a AND s.b = e.b
    ORDER BY d1, d2
    """,
    doc="Adamic-Adar link prediction over the near-dup graph: for every "
    "node pair sharing at least one neighbor of degree >= 2, score "
    "sum(1/ln(deg(z))) over common neighbors z -- the classic 'these two "
    "docs are probably dups we MISSED' signal (a shared rare neighbor is "
    "strong evidence; a shared hub is weak), flagged against pairs the "
    "LSH stage already linked so the unlinked high scorers are the audit "
    "queue.  Common-neighbor counts are exact; only the 1/ln(deg) sum is "
    "a float (rounded 6; degree-1 hubs are excluded since ln(1)=0 -- "
    "they carry no wedge anyway on a simple graph... they do as "
    "endpoints, never as the shared z with d>=2 filter making the "
    "division total).  Plan: one wedge self-join of the symmetric edge "
    "list (graph-sized, the q322 triangle shape), one degree broadcast, "
    "one (a, b) hash-agg -- the corpus is never touched after the LSH "
    "stage.",
)
def q349_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    prs = _dup_pairs(spark, sf_dir).localCheckpoint(eager=True)
    edges = prs.unionAll(
        prs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
    ).select(F.col("d1").alias("u"), F.col("d2").alias("v"))
    edges = edges.localCheckpoint(eager=True)  # wedges (twice) + degrees
    deg = edges.groupBy(F.col("u").alias("n")).agg(F.count("*").alias("d"))
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("z"))
    e2 = edges.select(F.col("u").alias("z"), F.col("v").alias("b"))
    wedges = e1.join(e2, "z").filter(F.col("a") < F.col("b"))
    scored = (
        wedges.join(
            F.broadcast(deg.select(F.col("n").alias("z"), F.col("d").alias("dz"))),
            "z",
        )
        .filter(F.col("dz") >= 2)
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("bigint").alias("common_neighbors"),
            F.round(F.sum(1.0 / F.log(F.col("dz"))), 6).alias("adamic_adar"),
        )
    )
    existing = prs.select(
        F.col("d1").alias("a"), F.col("d2").alias("b"), F.lit(1).alias("lk")
    )
    return (
        scored.join(F.broadcast(existing), ["a", "b"], "left")
        .select(
            F.col("a").alias("d1"),
            F.col("b").alias("d2"),
            "common_neighbors",
            "adamic_adar",
            F.col("lk").isNotNull().alias("already_linked"),
        )
        .orderBy("d1", "d2")
    )


# ---------------------------------------------------------------------------
# q350: per-label embedding outlier quarantine
# ---------------------------------------------------------------------------

_OUT_Z = 2.0


@register(
    "q350_embedding_outliers",
    sql=f"""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dims AS (
        SELECT label, i, AVG(v[i]) AS c
        FROM e, UNNEST(generate_series(1, len(v))) AS t(i)
        GROUP BY label, i),
    dist AS (
        SELECT e.vec_id, e.label,
               ROUND(sqrt(SUM(POW(e.v[d.i] - d.c, 2))), 9) AS dist
        FROM e JOIN dims d ON e.label = d.label
        GROUP BY e.vec_id, e.label),
    stats AS (
        SELECT label, COUNT(*) AS n, AVG(dist) AS mu,
               sqrt((SUM(dist * dist) - COUNT(*) * AVG(dist) * AVG(dist))
                    / (COUNT(*) - 1)) AS sd
        FROM dist GROUP BY label)
    SELECT d.label, CAST(s.n AS BIGINT) AS n_vectors,
           CAST(count_if(ROUND((d.dist - s.mu) / NULLIF(s.sd, 0), 9)
                         > {_OUT_Z}) AS BIGINT) AS n_outliers,
           ROUND(MAX(d.dist), 6) AS max_dist,
           ROUND(s.mu, 6) AS mean_dist
    FROM dist d JOIN stats s ON d.label = s.label
    GROUP BY d.label, s.n, s.mu
    ORDER BY d.label
    """,
    doc="Per-label embedding outlier quarantine: distance of every vector "
    f"to its label centroid, z-scored within the label; z > {_OUT_Z} is "
    "quarantined -- the embedding-space QA gate that catches mislabeled "
    "or corrupted vectors before they poison a SemDeDup (q186) or "
    "k-means (q124) stage.  Distances round at 9 BEFORE the z threshold "
    "and the z itself rounds at 9 before comparing (rank-before-round "
    "discipline; NULLIF guards a zero-variance cluster).  Plan: centroid "
    "= one (label, dim) hash-agg; the distance pass joins the "
    "dimension-sized centroid frame back (broadcast at real scale); "
    "per-label moment stats and the rollup are label-bounded.  Float "
    "note: the oracle's per-dim grouped sums and Spark's array fold "
    "differ in reduce order; both sides round the distance at 9 "
    "(SCALING precedent).",
)
def q350_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    dim = F.size("v")
    cent = (
        e.select("label", F.posexplode("v").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("cs"))
        .select("label", F.transform("cs", lambda s: s["c"]).alias("centroid"))
    )
    dist = (
        e.join(F.broadcast(cent), "label")
        .select(
            "vec_id",
            "label",
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.zip_with("v", "centroid", lambda a, b: (a - b) * (a - b)),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                ),
                9,
            ).alias("dist"),
        )
    )
    dist = dist.localCheckpoint(eager=True)  # consumed by stats and the rollup
    stats = dist.groupBy("label").agg(
        F.count("*").alias("n"),
        F.avg("dist").alias("mu"),
        F.sqrt(
            (
                F.sum(F.col("dist") * F.col("dist"))
                - F.count("*") * F.avg("dist") * F.avg("dist")
            )
            / (F.count("*") - 1)
        ).alias("sd"),
    )
    z = F.round(
        (F.col("dist") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0)), 9
    )
    return (
        dist.join(F.broadcast(stats), "label")
        .groupBy("label", "n", "mu")
        .agg(
            F.count_if(z > _OUT_Z).cast("bigint").alias("n_outliers"),
            F.round(F.max("dist"), 6).alias("max_dist"),
        )
        .select(
            "label",
            F.col("n").cast("bigint").alias("n_vectors"),
            "n_outliers",
            "max_dist",
            F.round("mu", 6).alias("mean_dist"),
        )
        .orderBy("label")
    )
