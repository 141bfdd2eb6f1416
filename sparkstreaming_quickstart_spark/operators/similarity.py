"""Embedding similarity search: exact top-k cosine + LSH-bucketed ANN.

Exact path (`topk_cosine`): normalize-free cosine via higher-order array
functions -- dot and norms are sequential double folds (zip_with + aggregate),
JVM-side, bitwise-reproducible.  The query set joins against the full corpus;
with a small query set Catalyst broadcasts it, so the corpus scan is
shuffle-free and the only shuffle is the per-query top-k (row_number window
over query_id).

ANN path (`ann_lsh_topk`): random-hyperplane LSH.  Hyperplanes come from a
seeded numpy RandomState and are shipped as literal arrays (they're tiny:
nbits x dim doubles).  Bucket = sign-bit string of hyperplane dots; candidates
only join within a bucket -- at 100 TB this turns the O(Q x N) cross join into
O(Q x N / 2^nbits) per-bucket work, trading recall for throughput.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """sqrt(|a|^2), for precomputing one norm per vector before a pair join.

    Pair scoring then costs one fold (the cross dot) instead of three;
    `dot(a,b) / (norm(a) * norm(b))` must be mirrored exactly (same float
    association: sqrt each side, then multiply) in any oracle SQL.
    """
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, null on a zero-norm side (same float association as
    the pair-join form: sqrt each side, then multiply).  Inside the operators
    the norms are precomputed per side instead of re-folded per pair."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def _pair_cosine(dot_col: Column, n1: Column, n2: Column, digits: int) -> Column:
    """Scoring expression shared by every pair join: try_divide nulls out
    zero-norm vectors (a padded/failed-encode embedding is legal input) where
    plain division would abort the query under Spark 4's ANSI mode; null
    scores then fail threshold filters and sort last in top-k rankings."""
    return F.round(F.try_divide(dot_col, n1 * n2), digits)


def topk_cosine(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int = 5,
    round_digits: int = 9,
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors per query (self excluded).

    Returns (query_id, neighbor_id, cos_sim, rank); cosine rounded so the
    value is float-discrepancy-proof against the oracle.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("qv"),
        norm(F.col(query_vec)).alias("qn"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("cv"),
        norm(F.col(corpus_vec)).alias("cn"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _pair_cosine(dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn"), round_digits).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    seed: int = 7,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize vectors to their nearest centroid cell,
    then rank exactly within the query's cell.

    Centroids here are seeded random unit-ish vectors (deterministic without
    a training pass); a production deployment would k-means them.  The plan
    shape is the important part: cell assignment is a per-row argmax over a
    broadcast centroid array (no shuffle), and the candidate join is
    equi-join on cell_id -- at 100 TB each query touches 1/n_cells of the
    corpus instead of all of it.
    """
    from pyspark.sql import Window

    planes = ivf_centroids(dim, n_cells, seed)
    cents = [F.array(*[F.lit(float(v)) for v in row]) for row in planes]

    def cell(vec: Column) -> Column:
        # argmax over centroid dot products, deterministic tie-break by index
        scores = F.array(*[dot(vec, c) for c in cents])
        return F.array_position(scores, F.array_max(scores)).cast("int")

    q = (
        queries.select(
            F.col(query_id).alias("query_id"), F.col(query_vec).alias("qv"), norm(F.col(query_vec)).alias("qn")
        )
        .withColumn("cell", cell(F.col("qv")))
    )
    c = (
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("cv"), norm(F.col(corpus_vec)).alias("cn")
        )
        .withColumn("cell", cell(F.col("cv")))
    )
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _pair_cosine(dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn"), 9).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_cosine_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    round_digits: int = 9,
    prefilter_bits: int = 0,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity (id1 < id2).

    The filter runs on the *rounded* cosine so Spark/oracle float noise at the
    threshold boundary cannot flip membership.  With ``prefilter_bits == 0``
    this is the exact all-pairs formulation (O(n^2) candidate space -- fine at
    test scale, and the oracle-checkable ground truth).  With
    ``prefilter_bits > 0`` candidates are restricted to pairs sharing a
    random-hyperplane LSH bucket before the exact cosine verify -- the 100 TB
    path: the self-join becomes an equi-join on bucket, so each vector is
    compared against ~n/2^bits others instead of all n, at the cost of recall
    for pairs straddling a hyperplane.
    """
    c = corpus.select(
        F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"), norm(F.col(vec_col)).alias("n1")
    )
    d = corpus.select(
        F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"), norm(F.col(vec_col)).alias("n2")
    )
    if prefilter_bits > 0:
        if dim is None:
            raise ValueError("dim is required when prefilter_bits > 0")
        c = bucketize(c, "v1", dim, prefilter_bits, seed)
        d = bucketize(d, "v2", dim, prefilter_bits, seed)
        cand = c.join(d, "bucket").filter(F.col("id1") < F.col("id2"))
    else:
        cand = c.join(d, F.col("id1") < F.col("id2"))
    return (
        cand.select(
            "id1",
            "id2",
            _pair_cosine(dot(F.col("v1"), F.col("v2")), F.col("n1"), F.col("n2"), round_digits).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def knn_edges_exact(q_ids, q_mat, b_ids, b_mat, b_nrm, k: int):
    """Exact top-k cosine kNN edges from each query row to a candidate block
    -- the shared dense kernel behind q329 (queries vs broadcast corpus) and
    q386 (cell vs same cell): cosine = dot / (na * nb) on RAW vectors (the
    DuckDB-oracle float association order), ROUND to 9 BEFORE ranking,
    self-match masked, tie-break on candidate id (rank-before-round
    discipline).  Top-k per row via an O(n) argpartition preselect WIDENED to
    every candidate tied with the k-th value (9-digit rounding makes ties
    real), then an exact lexsort over that small set -- bit-identical to a
    full lexsort, ~5x cheaper per row at n=20k.  Returns (i_list, j_list).
    """
    qn = np.sqrt((q_mat * q_mat).sum(axis=1))[:, None]
    sims = np.round((q_mat @ b_mat.T) / (qn * b_nrm[None, :]), 9)
    out_i: list[int] = []
    out_j: list[int] = []
    n = sims.shape[1]
    kk = min(k, max(n - 1, 1))
    for row, qid in zip(sims, q_ids):
        self_mask = b_ids == qid
        row = row.copy()
        row[self_mask] = -np.inf
        if n > kk:
            kth = np.partition(row, n - kk)[n - kk]
            cand = np.flatnonzero(row >= kth)
        else:
            cand = np.arange(n)
        order = np.lexsort((b_ids[cand], -row[cand]))[:k]
        idx = cand[order]
        out_i.extend([int(qid)] * len(idx))
        out_j.extend(b_ids[idx].tolist())
    return out_i, out_j


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((nbits, dim))


def ivf_centroids(dim: int, n_cells: int, seed: int = 7) -> np.ndarray:
    """The seeded centroid matrix `ivf_topk` quantizes against (shared with
    the oracle-SQL generators so both engines see identical literals)."""
    return np.random.RandomState(seed).standard_normal((n_cells, dim))


def sql_vec(row) -> str:
    """A numpy row as a DuckDB DOUBLE[] literal.  repr() emits the shortest
    round-trip decimal, which DuckDB parses back to the identical double, so
    Spark (literal via py4j) and DuckDB (literal via SQL text) compute on
    bitwise-equal constants -- probed: cell/bucket assignments match exactly
    at sf0.01."""
    return "[" + ", ".join(repr(float(x)) for x in row) + "]"


def sql_cell_expr(planes: np.ndarray, vec: str = "v") -> str:
    """DuckDB mirror of `ivf_topk`'s argmax cell assignment (first max wins
    in both list_position and array_position)."""
    scores = ", ".join(f"list_dot_product({vec}, {sql_vec(r)})" for r in planes)
    return f"CAST(list_position([{scores}], list_max([{scores}])) AS INT)"


def sql_bucket_expr(planes: np.ndarray, vec: str = "v") -> str:
    """DuckDB mirror of `bucketize`'s sign-bit bucket id."""
    return (
        "CAST("
        + " + ".join(
            f"(CASE WHEN list_dot_product({vec}, {sql_vec(r)}) > 0 THEN {1 << i} ELSE 0 END)"
            for i, r in enumerate(planes)
        )
        + " AS INT)"
    )


def bucketize(df: DataFrame, vec: str, dim: int, nbits: int = 8, seed: int = 42) -> DataFrame:
    """Append an LSH bucket id: sign bits of `nbits` hyperplane projections."""
    planes = _hyperplanes(dim, nbits, seed)
    plane_cols = [F.array(*[F.lit(float(v)) for v in row]) for row in planes]
    bucket = sum(
        [
            F.when(dot(F.col(vec), p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i, p in enumerate(plane_cols)
        ],
        F.lit(0),
    )
    return df.withColumn("bucket", bucket.cast("int"))


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    dim: int,
    k: int = 5,
    nbits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to same-LSH-bucket
    candidates.  Deterministic (seeded hyperplanes); recall < 1 by design."""
    from pyspark.sql import Window

    q = bucketize(
        queries.select(
            F.col(query_id).alias("query_id"), F.col(query_vec).alias("qv"), norm(F.col(query_vec)).alias("qn")
        ),
        "qv",
        dim,
        nbits,
        seed,
    )
    c = bucketize(
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("cv"), norm(F.col(corpus_vec)).alias("cn")
        ),
        "cv",
        dim,
        nbits,
        seed,
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _pair_cosine(dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn"), 9).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
