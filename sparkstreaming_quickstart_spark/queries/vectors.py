"""Vector-sketching operators (round 2, wave 4): Johnson-Lindenstrauss
random projection and product-quantization (PQ) approximate nearest
neighbor.

These complete the embedding tool chest next to q54 (exact top-k), q55
(LSH-ANN), q64 (IVF-ANN), q122 (scalar int8 quantization) and q137 (int8
MIPS): q156 is the dimensionality-reduction sketch (shrink 64-d vectors to
8-d before any distance work -- the standard pre-filter when the embedding
table itself is the I/O bottleneck), and q161 is the memory-compression
path (vectors live as 8 one-byte codes; distances are computed against a
tiny per-query lookup table, never the raw corpus vectors).

Both are pure JVM expression pipelines -- signs and codebooks are
plan-time literals or bounded (16-row) builds, the corpus side is a single
narrow projection, and nothing leaves whole-stage codegen.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

_DIM = 64
_K = 8  # JL target dimensionality


def _jl_sign(i: int, j: int) -> int:
    """Deterministic Rademacher sign for input dim i / output dim j: low bit
    of md5(f"{i}:{j}").  No RNG, so Spark and the oracle share the matrix
    by construction (Achlioptas 2001: +-1 entries satisfy the JL lemma)."""
    return 1 if hashlib.md5(f"{i}:{j}".encode()).digest()[0] & 1 else -1


def _jl_term(j: int, elem: str) -> str:
    """The j-th projection as '+x1 -x2 ...' over 1-based element accesses.

    `elem` is the engine's element accessor format string; addition is
    left-associative in the identical order in both engines, and every
    operand is an exactly-cast float32->double, so the two results are
    bit-identical (the ROUND is belt-and-braces)."""
    parts = [
        ("+" if _jl_sign(i, j) > 0 else "-") + f"CAST({elem.format(i=i + 1)} AS DOUBLE)"
        for i in range(_DIM)
    ]
    return "".join(parts)


def _jl_sql(elem: str, table: str) -> str:
    cols = ",\n           ".join(
        f"ROUND({_jl_term(j, elem)}, 4) AS p{j}" for j in range(_K)
    )
    return f"SELECT vec_id, label,\n           {cols}\n    FROM {table}\n    ORDER BY vec_id"


@register(
    "q156_random_projection",
    sql=_jl_sql("embedding[{i}]", "embeddings"),
    doc="Johnson-Lindenstrauss sketch: project 64-d embeddings to 8-d with a "
    "deterministic md5-seeded Rademacher (+-1) matrix.  Sign-only entries "
    "mean the projection is 64 additions per output dim -- no multiplies, "
    "no shuffle, one narrow codegen projection over the corpus; the 8-d "
    "sketch then feeds any distance-based op at 1/8th the I/O.  The matrix "
    "is a plan-time constant: on a 1000-executor cluster nothing is "
    "broadcast at all.",
)
def q156_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        *[
            F.expr(f"ROUND({_jl_term(j, 'element_at(embedding, {i})')}, 4)").alias(f"p{j}")
            for j in range(_K)
        ],
    ).orderBy("vec_id")


_PQ_M = 8  # subspaces
_PQ_SUB = 8  # dims per subspace
_PQ_C = 16  # codewords per subspace
_PQ_QUERIES = 3
_PQ_K = 10


def _pq_sq_terms(a: str, b: str) -> str:
    """Squared L2 distance between two 8-d subvectors as an explicit
    '+ (A-B)*(A-B) ...' chain; {d} is the 0-based within-subspace dim."""
    terms = []
    for d in range(_PQ_SUB):
        x = a.format(d=d)
        y = b.format(d=d)
        terms.append(f"(({x}) - ({y})) * (({x}) - ({y}))")
    return " + ".join(terms)


_PQ_ORACLE = f"""
    WITH cb AS (SELECT vec_id AS c, embedding AS cv FROM embeddings WHERE vec_id < {_PQ_C}),
    v AS (SELECT vec_id, embedding AS vv FROM embeddings),
    ms AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m),
    dists AS (
        SELECT v.vec_id, ms.m, cb.c,
               {_pq_sq_terms("CAST(vv[ms.m * {sub} + {{d}} + 1] AS DOUBLE)".format(sub=_PQ_SUB),
                             "CAST(cv[ms.m * {sub} + {{d}} + 1] AS DOUBLE)".format(sub=_PQ_SUB))} AS dist
        FROM v, ms, cb),
    codes AS (
        SELECT vec_id, m, first(c ORDER BY dist, c) AS code
        FROM dists GROUP BY vec_id, m),
    est AS (
        SELECT l.vec_id AS query_id, cd.vec_id AS neighbor_id,
               ROUND(SUM(l.dist), 6) AS adc_dist
        FROM codes cd
        JOIN dists l ON l.m = cd.m AND l.c = cd.code AND l.vec_id < {_PQ_QUERIES}
        WHERE cd.vec_id != l.vec_id
        GROUP BY 1, 2)
    SELECT query_id, neighbor_id, adc_dist, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS INT) AS rank
        FROM est)
    WHERE rank <= {_PQ_K}
    ORDER BY query_id, rank
"""


@register(
    "q161_pq_topk",
    sql=_PQ_ORACLE,
    doc="Product-quantization ANN (Jegou et al., TPAMI 2011): 64-d vectors "
    "compress to 8 one-byte codes (8 subspaces x 16 codewords); each query "
    "builds an 8x16 distance lookup table against the codebook and scores "
    "candidates by asymmetric-distance (ADC) table lookups -- the corpus "
    "vectors themselves are never touched at query time.  Codewords here "
    "are the first 16 corpus vectors (deterministic seeding, same "
    "convention as q64's IVF centroids; production k-means them via q124). "
    "Scale shape: code assignment is one narrow projection over a "
    "plan-time-literal codebook (no shuffle, no broadcast); queries "
    "broadcast with their LUTs; the only wide op is the final per-query "
    "top-k window.  The 16-row codebook collect is bounded by LIMIT, not "
    "data size.",
)
def q161_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Implementation note: code assignment is 8 subspaces x 16 codewords x
    # 8 dims = 1024 arithmetic terms per row.  Spelling that as Column
    # expressions blows the janino 64KB method limit -- codegen FAILS, Spark
    # silently falls back to interpreted projection, and the query runs ~20x
    # slower (measured).  Same lesson as the MinHash signature kernel: when
    # per-row math outgrows codegen, an Arrow-batched numpy kernel is the
    # fast path.  The kernel moves (vec_id, 8 codes) per row -- narrow.
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    cb_rows = (
        emb.filter(F.col("vec_id") < _PQ_C)
        .select("vec_id", "embedding")
        .limit(_PQ_C)
        .collect()
    )
    cb = np.array(
        [r["embedding"] for r in sorted(cb_rows, key=lambda r: r["vec_id"])],
        dtype=np.float64,
    )  # (C, DIM)
    cbt = cb.reshape(_PQ_C, _PQ_M, _PQ_SUB).transpose(1, 0, 2)  # (M, C, SUB)

    def assign_codes(batches):
        for pdf in batches:
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            v = v.reshape(len(pdf), _PQ_M, _PQ_SUB)
            # (N, M, C): squared L2 per subspace against every codeword
            diff = v[:, :, None, :] - cbt[None, :, :, :]
            dist = np.einsum("nmcd,nmcd->nmc", diff, diff)
            codes = dist.argmin(axis=2)  # first-min == lowest c, the oracle's tie-break
            out = {"neighbor_id": pdf["vec_id"].to_numpy()}
            for m in range(_PQ_M):
                out[f"code_{m}"] = codes[:, m].astype("int32")
            yield pd.DataFrame(out)

    codes_schema = "neighbor_id long, " + ", ".join(
        f"code_{m} int" for m in range(_PQ_M)
    )
    corpus = emb.select("vec_id", "embedding").mapInPandas(assign_codes, codes_schema)

    # Per-query LUTs: _PQ_QUERIES is a plan-time constant, so this collect is
    # bounded like the codebook's (the q87 strata rule: no unbounded
    # driver-side materialization).
    q_rows = (
        emb.filter(F.col("vec_id") < _PQ_QUERIES)
        .select("vec_id", "embedding")
        .limit(_PQ_QUERIES)
        .collect()
    )
    lut_rows = []
    for r in sorted(q_rows, key=lambda r: r["vec_id"]):
        qv = np.asarray(r["embedding"], dtype=np.float64).reshape(_PQ_M, _PQ_SUB)
        diff = qv[:, None, :] - cbt  # (M, C, SUB)
        lut = np.einsum("mcd,mcd->mc", diff, diff)  # (M, C)
        lut_rows.append((int(r["vec_id"]), *[[float(x) for x in lut[m]] for m in range(_PQ_M)]))
    lut_schema = "query_id long, " + ", ".join(
        f"lut_{m} array<double>" for m in range(_PQ_M)
    )
    queries = spark.createDataFrame(lut_rows, lut_schema)

    adc = None
    for m in range(_PQ_M):
        term = F.element_at(F.col(f"lut_{m}"), F.col(f"code_{m}") + 1)
        adc = term if adc is None else adc + term
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(adc, 6).alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PQ_K)
        .orderBy("query_id", "rank")
    )
