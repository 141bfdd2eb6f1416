"""Wave-15 operators (round 3): rank correlation without ranking rows --
Kendall tau-b and Spearman rho between document length and token count,
both derived entirely from the (bounded) distinct-value histogram, so the
raw rows are never sorted, ranked, or windowed.

The scale story: naive rank correlation needs two global per-row ranks
(two total sorts).  Both statistics here reduce to integer sums over the
2D value histogram (|V| cells, V bounded by the value domains, not the row
count): tau-b from concordant/discordant cell-pair products, rho from
average ranks reconstructed arithmetically off the marginal histograms
(2*rank = 2*before + m + 1 stays integer).  One hash-agg over the data,
then everything runs on the histogram frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q279: Kendall tau-b from the 2D histogram
# ---------------------------------------------------------------------------


@register(
    "q279_kendall_tau",
    sql="""
    WITH base AS (
        SELECT n_chars AS x, len(string_split(text, ' ')) AS y
        FROM documents WHERE length(text) > 0),
    h AS (SELECT x, y, COUNT(*) AS m FROM base GROUP BY 1, 2),
    n AS (SELECT SUM(m) AS n FROM h),
    cd AS (
        SELECT
            SUM(CASE WHEN b.y > a.y THEN a.m * b.m ELSE 0 END) AS c,
            SUM(CASE WHEN b.y < a.y THEN a.m * b.m ELSE 0 END) AS d
        FROM h a JOIN h b ON b.x > a.x),
    tx AS (SELECT SUM(mx * (mx - 1) / 2) AS n1
           FROM (SELECT SUM(m) AS mx FROM h GROUP BY x)),
    ty AS (SELECT SUM(my * (my - 1) / 2) AS n2
           FROM (SELECT SUM(m) AS my FROM h GROUP BY y))
    SELECT CAST(n.n AS BIGINT) AS n,
           CAST(cd.c AS BIGINT) AS concordant,
           CAST(cd.d AS BIGINT) AS discordant,
           ROUND((cd.c - cd.d)
                 / sqrt((CAST(n.n AS DOUBLE) * (n.n - 1) / 2 - tx.n1)
                        * (CAST(n.n AS DOUBLE) * (n.n - 1) / 2 - ty.n2)),
                 6) AS tau_b
    FROM n, cd, tx, ty
    """,
    doc="Kendall tau-b rank correlation between document length and token "
    "count, tie-corrected -- computed WITHOUT ranking or pairing rows: "
    "concordant/discordant counts are cell-pair products over the 2D "
    "distinct-value histogram (|V|^2 cell pairs, V bounded by the value "
    "domains; the naive spelling is n^2 ROW pairs), and the tie terms "
    "come from the marginal histograms.  All counts integer; one float "
    "sqrt at the end.",
)
def q279_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    base = d.select(
        F.col("n_chars").alias("x"), F.size(tokens("text")).alias("y")
    )
    h = base.groupBy("x", "y").agg(F.count("*").alias("m"))
    n = h.agg(F.sum("m").alias("n"))
    a = h.select(F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("m").alias("am"))
    b = h.select(F.col("x").alias("bx"), F.col("y").alias("by"), F.col("m").alias("bm"))
    cd = (
        a.join(b, F.col("bx") > F.col("ax"))
        .agg(
            F.sum(
                F.when(F.col("by") > F.col("ay"), F.col("am") * F.col("bm")).otherwise(0)
            ).alias("c"),
            F.sum(
                F.when(F.col("by") < F.col("ay"), F.col("am") * F.col("bm")).otherwise(0)
            ).alias("d"),
        )
    )
    tx = (
        h.groupBy("x").agg(F.sum("m").alias("mx"))
        .agg(F.sum(F.col("mx") * (F.col("mx") - 1) / 2).alias("n1"))
    )
    ty = (
        h.groupBy("y").agg(F.sum("m").alias("my"))
        .agg(F.sum(F.col("my") * (F.col("my") - 1) / 2).alias("n2"))
    )
    j = (
        n.crossJoin(F.broadcast(cd))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    n0 = F.col("n").cast("double") * (F.col("n") - 1) / 2
    return j.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("c").cast("bigint").alias("concordant"),
        F.col("d").cast("bigint").alias("discordant"),
        F.round(
            (F.col("c") - F.col("d"))
            / F.sqrt((n0 - F.col("n1")) * (n0 - F.col("n2"))),
            6,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# q280: Spearman rho from marginal-histogram average ranks
# ---------------------------------------------------------------------------


@register(
    "q280_spearman_rho",
    sql="""
    WITH base AS (
        SELECT n_chars AS x, len(string_split(text, ' ')) AS y
        FROM documents WHERE length(text) > 0),
    h AS (SELECT x, y, COUNT(*) AS m FROM base GROUP BY 1, 2),
    rx AS (
        SELECT x,
               2 * (SUM(mx) OVER (ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - mx)
                 + mx + 1 AS rx2
        FROM (SELECT x, SUM(m) AS mx FROM h GROUP BY x)),
    ry AS (
        SELECT y,
               2 * (SUM(my) OVER (ORDER BY y
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - my)
                 + my + 1 AS ry2
        FROM (SELECT y, SUM(m) AS my FROM h GROUP BY y)),
    s AS (
        SELECT SUM(h.m) AS n,
               SUM(CAST(h.m * rx.rx2 AS DECIMAL(38,0))) AS sx,
               SUM(CAST(h.m * ry.ry2 AS DECIMAL(38,0))) AS sy,
               SUM(CAST(h.m * rx.rx2 * rx.rx2 AS DECIMAL(38,0))) AS sxx,
               SUM(CAST(h.m * ry.ry2 * ry.ry2 AS DECIMAL(38,0))) AS syy,
               SUM(CAST(h.m * rx.rx2 * ry.ry2 AS DECIMAL(38,0))) AS sxy
        FROM h JOIN rx ON h.x = rx.x JOIN ry ON h.y = ry.y)
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho
    FROM s
    """,
    doc="Spearman rank correlation (tie-aware, average ranks) between "
    "document length and token count -- WITHOUT ranking any rows: the "
    "doubled average rank of a value is 2*before + m + 1 off the "
    "marginal histogram (integer, the q251 device), the doubling cancels "
    "in the Pearson-of-ranks formula, and the moment sums accumulate in "
    "DECIMAL(38,0) so both engines derive identical floats from "
    "identical integers.  One hash-agg over the data; everything after "
    "runs on the histogram frames.",
)
def q280_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    base = d.select(
        F.col("n_chars").alias("x"), F.size(tokens("text")).alias("y")
    )
    h = base.groupBy("x", "y").agg(F.count("*").alias("m"))

    def doubled_ranks(col: str) -> DataFrame:
        marg = h.groupBy(col).agg(F.sum("m").alias("mm"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return marg.select(
            col,
            (2 * (F.sum("mm").over(w) - F.col("mm")) + F.col("mm") + 1).alias(f"r{col}2"),
        )

    rx, ry = doubled_ranks("x"), doubled_ranks("y")
    dec = lambda c: c.cast("decimal(38,0)")
    s = (
        h.join(F.broadcast(rx), "x")
        .join(F.broadcast(ry), "y")
        .agg(
            F.sum("m").alias("n"),
            F.sum(dec(F.col("m") * F.col("rx2"))).alias("sx"),
            F.sum(dec(F.col("m") * F.col("ry2"))).alias("sy"),
            F.sum(dec(F.col("m") * F.col("rx2") * F.col("rx2"))).alias("sxx"),
            F.sum(dec(F.col("m") * F.col("ry2") * F.col("ry2"))).alias("syy"),
            F.sum(dec(F.col("m") * F.col("rx2") * F.col("ry2"))).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    dbl = lambda name: F.col(name).cast("double")
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(
            (nd * dbl("sxy") - dbl("sx") * dbl("sy"))
            / F.sqrt(
                (nd * dbl("sxx") - dbl("sx") * dbl("sx"))
                * (nd * dbl("syy") - dbl("sy") * dbl("sy"))
            ),
            6,
        ).alias("rho"),
    )
