"""Wave-18 operators (round 7): embedding-space spectral analytics -- the
one-pass distributed covariance/Gram matrix and the PCA scree derived from
it.  Closes the remaining gap in the embedding-pipeline family: SemDeDup
(q186), ANN (q55/q64/q137/q161/q178), outliers (q267) and cluster quality
(q287) all consume embedding geometry, but nothing measured its SPECTRUM --
the intrinsic-dimensionality / variance-concentration facts that decide PQ
code sizes, IVF cell counts, and whitening before cosine dedup.

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md section-2.B
training-data-pipeline family.

Scale design (the whole point at 100 TB): the covariance needs exactly the
d(d+1)/2 + d + 1 sufficient statistics (Gram upper triangle, per-dim sums,
count).  One Arrow mapInPandas kernel computes each batch's partial X'X as a
single numpy matmul and emits the ~2k-row triangle per batch; ONE hash-agg
sums the partials (map-side combinable, commutative float adds rounded at
output).  The corpus never shuffles -- only d^2-sized partials move.  The
eigendecomposition then runs driver-side on the collected 64x64 matrix
(bounded driver state, the q270/q293 scripting pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import token_chunks, token_count
from ..sources.catalog import load_table
from . import register

_DIMS = 64


def _gram_partials(dims: int):
    """Arrow-batch kernel: (x: array<double>) batches -> partial sufficient
    statistics as (i, j, v) rows.

    Encoding (one kernel, ONE downstream hash-agg for every statistic):
      i >= 0, j >= i : partial sum of x_i * x_j  (Gram upper triangle)
      i >= 0, j = -1 : partial sum of x_i        (per-dim sums)
      i = -1, j = -1 : partial row count

    Per batch the Gram block is one numpy matmul (X'X), so the Python cost
    is O(rows * d^2) vectorized flops and the output is O(d^2) ROWS PER
    BATCH regardless of batch size -- the corpus itself never crosses the
    Python boundary back.
    """
    import numpy as np
    import pandas as pd

    iu, ju = np.triu_indices(dims)

    def gen(batches):
        for pdf in batches:
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["x"]])
            g = X.T @ X
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(dims), [-1]]),
                    "j": np.concatenate([ju, np.full(dims, -1), [-1]]),
                    "v": np.concatenate([g[iu, ju], X.sum(axis=0), [float(len(pdf))]]),
                }
            )

    return gen


def covariance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, sxy, si, sj, n) for every 0 <= i <= j < d: the sufficient
    statistics of the embedding covariance matrix, from one corpus scan."""
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("x")
    )
    parts = e.mapInPandas(_gram_partials(_DIMS), "i int, j int, v double")
    # Materialize the d^2-sized totals ONCE: gram / si / sj / n are four
    # consumers, and the broadcast builds would otherwise each re-run the
    # corpus scan + kernel (the plan audit showed 4 scans where the design
    # promises one).  The checkpointed frame is ~d^2/2 + d + 1 rows.
    tot = (
        parts.groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .localCheckpoint(eager=True)
    )
    gram = tot.filter((F.col("i") >= 0) & (F.col("j") >= 0)).select(
        "i", "j", F.col("v").alias("sxy")
    )
    sums = tot.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("d"), F.col("v").alias("s")
    )
    n = tot.filter(F.col("i") == -1).select(F.col("v").cast("bigint").alias("n"))
    si = sums.select(F.col("d").alias("i"), F.col("s").alias("si"))
    sj = sums.select(F.col("d").alias("j"), F.col("s").alias("sj"))
    return (
        gram.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n))
    )


_COV_ORACLE = """
    WITH dims AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings)
    SELECT a.pos AS i, b.pos AS j,
           ROUND((SUM(a.x * b.x) - SUM(a.x) * SUM(b.x) / COUNT(*))
                 / (COUNT(*) - 1), 6) + 0.0 AS cov
    FROM dims a JOIN dims b ON a.vec_id = b.vec_id AND a.pos <= b.pos
    GROUP BY 1, 2
    ORDER BY i, j
"""


@register(
    "q295_embedding_covariance",
    sql=_COV_ORACLE,
    doc="Distributed embedding covariance matrix (upper triangle, d(d+1)/2 "
    "rows): the sufficient statistics -- Gram partials X'X, per-dim sums, "
    "count -- come from ONE Arrow mapInPandas scan (a numpy matmul per "
    "batch, emitting d^2-sized partials regardless of batch size) and ONE "
    "map-side-combinable hash-agg; cov = (sxy - si*sj/n)/(n-1), the same "
    "sufficient-statistic formula the oracle spells, with the established "
    "ROUND(,6) reduce-order tolerance on the float sums.  The matrix that "
    "sizes PQ codebooks, picks IVF cell counts, and feeds whitening -- at "
    "100 TB the corpus never shuffles; only 64x64 partials move.",
)
def q295_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cs = covariance_stats(spark, sf_dir)
    cov = (F.col("sxy") - F.col("si") * F.col("sj") / F.col("n")) / (F.col("n") - 1)
    # `+ 0.0` after the round, mirrored in the oracle: a tiny negative
    # covariance rounds to NEGATIVE ZERO in one engine and positive zero in
    # the other, and the driver's "%.12g" normalization prints them as '-0'
    # vs '0'.  IEEE -0.0 + 0.0 = +0.0 in both engines; nonzero values are
    # unchanged exactly.
    return cs.select("i", "j", (F.round(cov, 6) + F.lit(0.0)).alias("cov")).orderBy(
        "i", "j"
    )


def pca_scree_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full per-component PCA scree (eigenvalue, variance-explained,
    cumulative) -- the user-facing report q296 summarizes.  Kept as a
    library function because per-component eigenvalues are not
    SQL-expressible; its correctness rides on the same eigh call q296's
    value oracle moment-checks, plus the spectral property tests."""
    import numpy as np

    rows = q295_embedding_covariance(spark, sf_dir).collect()
    C = np.zeros((_DIMS, _DIMS))
    for r in rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    evals = np.linalg.eigh(C)[0][::-1]  # descending
    total = float(evals.sum())
    out, cum = [], 0.0
    for k, lam in enumerate(evals):
        cum += float(lam)
        out.append(
            (
                k,
                round(float(lam), 6),
                round(float(lam) / total, 6),
                round(cum / total, 6),
            )
        )
    return spark.createDataFrame(
        out, "component int, eigenvalue double, var_explained double, cum_var_explained double"
    ).orderBy("component")


_SCREE_ORACLE = """
    WITH dims AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
    cells AS (
        SELECT a.pos AS i, b.pos AS j,
               ROUND((SUM(a.x * b.x) - SUM(a.x) * SUM(b.x) / COUNT(*))
                     / (COUNT(*) - 1), 6) + 0.0 AS cov
        FROM dims a JOIN dims b ON a.vec_id = b.vec_id AND a.pos <= b.pos
        GROUP BY 1, 2),
    full_m AS (
        SELECT i, j, cov FROM cells
        UNION ALL SELECT j, i, cov FROM cells WHERE i < j),
    m2 AS (
        SELECT COUNT(*) FILTER (WHERE i = j) AS d,
               SUM(CASE WHEN i = j THEN cov ELSE 0 END) AS tr,
               SUM(cov * cov) AS frob
        FROM full_m),
    m3 AS (
        SELECT SUM(a.cov * b.cov * c.cov) AS m3
        FROM full_m a JOIN full_m b ON a.j = b.i
        JOIN full_m c ON b.j = c.i AND c.j = a.i)
    SELECT CAST(d AS BIGINT) AS n_components,
           ROUND(tr, 6) + 0.0 AS trace,
           ROUND(frob, 6) + 0.0 AS frobenius_sq,
           ROUND(m3, 9) + 0.0 AS spectral_moment3,
           ROUND(tr * tr / NULLIF(frob, 0), 6) + 0.0 AS effective_rank
    FROM m2, m3
"""


@register(
    "q296_pca_scree",
    sql=_SCREE_ORACLE,
    doc="PCA spectrum summary with a full VALUE oracle (round-9 upgrade "
    "from rows-only): the Spark side eigendecomposes the q295 covariance "
    "(numpy eigh on the collected 64x64 matrix -- bounded driver state, "
    "O(d^3) independent of corpus size) and reports the spectrum through "
    "its first three moments computed FROM THE EIGENVALUES -- trace "
    "= sum(lambda), frobenius_sq = sum(lambda^2), spectral_moment3 = "
    "sum(lambda^3) -- plus the effective rank (sum l)^2 / sum l^2 "
    "(participation ratio, the intrinsic-dimensionality scalar).  The "
    "oracle computes the SAME invariants from the covariance matrix "
    "itself without any eigensolver (trace(C), sum C_ij^2, trace(C^3) "
    "via a three-way join over the d^2 cells), so a wrong spectrum "
    "hash-mismatches: matching three moments pins the eigensolver "
    "output, and the per-component scree (pca_scree_components) shares "
    "the same eigh call.  Descending order / PSD / projection-variance "
    "stay pinned by the test_wave18 property tests.  Plan: one corpus "
    "scan (q295 sufficient statistics); everything after is d^2-sized.",
)
def q296_pca_scree(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    rows = q295_embedding_covariance(spark, sf_dir).collect()
    d = _DIMS
    C = np.zeros((d, d))
    for r in rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    lam = np.linalg.eigh(C)[0]
    tr = float(lam.sum())
    frob = float((lam * lam).sum())
    m3 = float((lam * lam * lam).sum())
    eff = round(tr * tr / frob, 6) + 0.0 if frob != 0 else None
    return spark.createDataFrame(
        [
            (
                d,
                round(tr, 6) + 0.0,
                round(frob, 6) + 0.0,
                round(m3, 9) + 0.0,
                eff,
            )
        ],
        "n_components bigint, trace double, frobenius_sq double, "
        "spectral_moment3 double, effective_rank double",
    )


# ---------------------------------------------------------------------------
# q297: ANN recall@k evaluation (LSH buckets vs exact ground truth)
# ---------------------------------------------------------------------------


def _q297_oracle_sql() -> str:
    from .llm import _ann_bucket_ctes

    return f"""
    WITH {_ann_bucket_ctes()},
    q AS (SELECT * FROM b WHERE vec_id % 50 = 0),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(q.v, e.v) / (q.nrm * e.nrm), 9) DESC,
                                e.vec_id ASC) AS rank
            FROM q JOIN b e ON e.vec_id <> q.vec_id)
        WHERE rank <= 5),
    ann AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 9) DESC,
                                c.vec_id ASC) AS rank
            FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id)
        WHERE rank <= 5)
    SELECT e.query_id,
           CAST(COUNT(a.neighbor_id) AS INT) AS n_hits,
           CAST(COUNT(*) AS INT) AS n_exact,
           ROUND(COUNT(a.neighbor_id) * 1.0 / COUNT(*), 6) AS recall_at_5
    FROM exact e LEFT JOIN ann a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    ORDER BY e.query_id
    """


@register(
    "q297_ann_recall_eval",
    sql=_q297_oracle_sql(),
    doc="Recall@5 of the q55 random-hyperplane LSH index against the q54 "
    "exact ground truth, per query: the eval harness every ANN deployment "
    "needs before trusting an index at scale.  Ground truth is computed on "
    "the SAMPLED query set only (every 50th vector) -- the standard "
    "ANN-benchmark discipline, so the exact side costs |sample| x corpus "
    "with the sample broadcast, never corpus x corpus; the ANN side is the "
    "same bucket-equi-join the index itself runs.  Round-13: the exact "
    "side is the panel_exact_topk Arrow kernel (one matmul per corpus "
    "batch, rank-only consumer -- only IDS survive into the recall join) "
    "replacing the per-pair JVM fold (80.8 s sf1 Spark side), and the LSH "
    "bit count is adaptive from COUNT(*), oracle-replayed via the formula-"
    "plane CTEs.",
)
def q297_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ann_lsh_topk, panel_exact_topk

    from .llm import ann_planes

    e = load_table(spark, sf_dir, "embeddings")
    ev = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = e.filter(F.col("vec_id") % 50 == 0)
    exact = panel_exact_topk(
        ev, "vec_id", "v", ev.filter(F.col("vec_id") % 50 == 0), "vec_id", "v", k=5
    )
    ann = ann_lsh_topk(
        q, e, "vec_id", "embedding", "vec_id", "embedding",
        dim=_DIMS, k=5, planes=ann_planes(e),
    )
    hits = exact.select("query_id", "neighbor_id").join(
        ann.select("query_id", "neighbor_id", F.lit(1).alias("hit")),
        ["query_id", "neighbor_id"],
        "left",
    )
    return (
        hits.groupBy("query_id")
        .agg(
            F.count("hit").cast("int").alias("n_hits"),
            F.count("*").cast("int").alias("n_exact"),
            F.round(F.count("hit") / F.count("*"), 6).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# q298: segment-level content extraction (jusText-lite boilerplate removal)
# ---------------------------------------------------------------------------

_SEG_LEN = 10  # tokens per segment
_SEG_MIN_TOKENS = 5
_SEG_STOPS = ("the", "a")


@register(
    "q298_boilerplate_segments",
    sql=f"""
    WITH t AS (
        SELECT lang, string_split(text, ' ') AS toks FROM documents
        WHERE length(text) > 0),
    segs AS (
        SELECT lang, len(toks) AS n_tokens,
               list_transform(
                   range(0, CAST(ceil(len(toks) / {_SEG_LEN}.0) AS INT)),
                   i -> list_slice(toks, i * {_SEG_LEN} + 1, i * {_SEG_LEN} + {_SEG_LEN}))
                   AS segments
        FROM t),
    cls AS (
        SELECT lang, n_tokens, len(segments) AS n_segments,
               list_filter(segments,
                   s -> len(s) >= {_SEG_MIN_TOKENS}
                        AND len(list_filter(s, x -> x = 'the' OR x = 'a')) >= 1)
                   AS content
        FROM segs)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_segments) AS BIGINT) AS n_segments,
           CAST(SUM(len(content)) AS BIGINT) AS n_content_segments,
           ROUND(SUM(CAST(list_sum(list_transform(content, s -> len(s))) AS DOUBLE))
                 / SUM(n_tokens), 6) AS retained_token_share
    FROM cls
    GROUP BY lang
    ORDER BY lang
    """,
    doc="jusText-lite content extraction restated for the fixture corpus: "
    "split every document into fixed-width token segments, classify each "
    "segment content-vs-boilerplate by the classic local evidence rules "
    "(minimum segment length, minimum stop-word evidence), and report the "
    "per-language retention profile -- the text-EXTRACTION stage that runs "
    "before doc-level quality filters (q184) in a web-corpus pipeline.  "
    "Plan: segmentation and classification are ONE narrow projection of "
    "higher-order expressions (token_chunks + filter) -- no explode, no "
    "Python, no shuffle before the final 5-row language rollup, so the "
    "stage is scan-speed at 100 TB.",
)
def q298_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    segs = F.transform(
        token_chunks("text", window=_SEG_LEN, stride=_SEG_LEN),
        lambda c: F.split(c["chunk_text"], " "),
    )
    content = F.filter(
        segs,
        lambda s: (F.size(s) >= _SEG_MIN_TOKENS)
        & (F.size(F.filter(s, lambda x: x.isin(*_SEG_STOPS))) >= 1),
    )
    per_doc = d.select(
        "lang",
        token_count("text").alias("n_tokens"),
        F.size(segs).alias("n_segments"),
        F.size(content).alias("n_content_segments"),
        F.aggregate(
            content, F.lit(0), lambda acc, s: acc + F.size(s)
        ).alias("content_tokens"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_segments").alias("n_segments"),
            F.sum("n_content_segments").alias("n_content_segments"),
            F.round(
                F.sum(F.col("content_tokens").cast("double")) / F.sum("n_tokens"), 6
            ).alias("retained_token_share"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q299: model-based quality scoring (hashed linear classifier inference)
# ---------------------------------------------------------------------------

_QCLS_BUCKETS = 256
_QCLS_SALT = "qw1|"


def _qcls_weights() -> list[float]:
    """Deterministic per-bucket weights derived from md5 of the salted bucket
    index: w_b = (first-8-hex-digits mod 2001 - 1000) / 1000 in [-1, 1].
    Computed once driver-side (256 values) and embedded as LITERALS in both
    engines -- the model is data, not code, exactly as a production scorer
    broadcasts trained weights."""
    import hashlib

    out = []
    for b in range(_QCLS_BUCKETS):
        h = int(hashlib.md5(f"{_QCLS_SALT}{b}".encode()).hexdigest()[:8], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return out


def _q299_oracle_sql() -> str:
    w = _qcls_weights()
    values = ", ".join(f"({b}, {w[b]!r})" for b in range(_QCLS_BUCKETS))
    return f"""
    WITH weights(bucket, w) AS (VALUES {values}),
    tok AS (
        SELECT doc_id, source,
               CAST(md5_number_lower(unnest(string_split(text, ' '))) % {_QCLS_BUCKETS}
                    AS BIGINT) AS bucket
        FROM documents WHERE length(text) > 0),
    scored AS (
        SELECT t.doc_id, t.source, ROUND(AVG(w.w), 9) AS score
        FROM tok t JOIN weights w ON t.bucket = w.bucket
        GROUP BY t.doc_id, t.source),
    binned AS (
        SELECT source,
               CAST(LEAST(FLOOR((score + 1.0) / 0.2), 9) AS INT) AS score_bin,
               score
        FROM scored)
    SELECT source, score_bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(score), 6) AS avg_score
    FROM binned
    GROUP BY source, score_bin
    ORDER BY source, score_bin
    """


@register(
    "q299_quality_classifier_inference",
    sql=_q299_oracle_sql(),
    doc="Model-based quality scoring (the fastText-classifier stage of a "
    "web-corpus pipeline, e.g. CCNet/LLaMA data prep): each document's "
    "score is the mean weight of its tokens under a 256-bucket hashing-"
    "trick linear model; output is the per-source score-decile histogram "
    "that drives filter-threshold selection.  The 256 weights are "
    "deterministic md5-derived literals shared with the oracle (a stand-in "
    "for trained weights -- the PLUMBING is the operator: broadcast-join "
    "inference, not the model).  Plan: explode -> md5_mod power-of-two "
    "fast path -> broadcast join against the 256-row weight table -> "
    "doc-level hash-agg with map-side partial aggregation -> bounded "
    "source x decile rollup.  Everything whole-stage codegen; the only "
    "shuffle is the per-doc agg, map-side-combined to one row per doc "
    "per partition.",
)
def q299_quality_classifier_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_mod

    w = _qcls_weights()
    weights = spark.createDataFrame(
        [(b, w[b]) for b in range(_QCLS_BUCKETS)], "bucket long, w double"
    )
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    tok = d.select(
        "doc_id",
        "source",
        F.explode(F.split("text", " ")).alias("token"),
    ).select("doc_id", "source", md5_mod(F.col("token"), _QCLS_BUCKETS).alias("bucket"))
    scored = (
        tok.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "source")
        .agg(F.round(F.avg("w"), 9).alias("score"))
    )
    score_bin = F.least(F.floor((F.col("score") + 1.0) / 0.2), F.lit(9)).cast("int")
    return (
        scored.select("source", score_bin.alias("score_bin"), "score")
        .groupBy("source", "score_bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("score"), 6).alias("avg_score"),
        )
        .orderBy("source", "score_bin")
    )


# ---------------------------------------------------------------------------
# q300: hard-negative mining for contrastive training pairs
# ---------------------------------------------------------------------------


def _q300_oracle_sql() -> str:
    from .llm import _ann_bucket_ctes

    return f"""
    WITH {_ann_bucket_ctes()},
    q AS (SELECT * FROM b WHERE vec_id % 50 = 0),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(q.v, e.v) / (q.nrm * e.nrm), 9) DESC,
                                e.vec_id ASC) AS rank
            FROM q JOIN b e ON e.vec_id <> q.vec_id)
        WHERE rank <= 5),
    cand AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 9) AS cos_sim
        FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
    negs AS (
        SELECT c.query_id, c.neighbor_id, c.cos_sim,
               ROW_NUMBER() OVER (PARTITION BY c.query_id
                   ORDER BY c.cos_sim DESC, c.neighbor_id ASC) AS rank
        FROM cand c LEFT JOIN exact e
          ON e.query_id = c.query_id AND e.neighbor_id = c.neighbor_id
        WHERE e.neighbor_id IS NULL)
    SELECT query_id, neighbor_id AS hard_negative_id, cos_sim
    FROM negs WHERE rank = 1
    ORDER BY query_id
    """


@register(
    "q300_hard_negative_mining",
    sql=_q300_oracle_sql(),
    doc="Hard-negative mining for contrastive embedding training: for each "
    "anchor (every 50th vector) pick the most-similar same-LSH-bucket "
    "candidate that is NOT in the anchor's exact top-5 -- near enough to "
    "be informative, far enough to be a true negative (the standard "
    "in-batch/ANCE-style mining step).  Plan: candidate generation is the "
    "q55 bucket equi-join (never all-pairs); the exact top-5 exclusion "
    "list is computed only for the anchor sample and anti-joined; one "
    "window rank picks the hardest survivor.  Anchors with no same-bucket "
    "non-top-5 candidate yield no row in both engines.  Round-13: the "
    "exclusion list comes from the panel_exact_topk Arrow kernel (rank-"
    "only -- the anti-join consumes IDS; the EMITTED cos_sim still comes "
    "from the JVM fold on the bucket-bounded candidate join, so values "
    "keep the fold association), and the LSH bit count is adaptive from "
    "COUNT(*), formula-plane-replayed in DuckDB.",
)
def q300_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.similarity import ann_lsh_topk, panel_exact_topk

    from .llm import ann_planes

    e = load_table(spark, sf_dir, "embeddings")
    ev = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = e.filter(F.col("vec_id") % 50 == 0)
    exact = panel_exact_topk(
        ev, "vec_id", "v", ev.filter(F.col("vec_id") % 50 == 0), "vec_id", "v", k=5
    )
    # All same-bucket candidates with scores: k large enough to keep every
    # candidate (bucket sizes at any sf are far below corpus size; rank is
    # recomputed below after the exclusion anyway).
    cand = ann_lsh_topk(
        q, e, "vec_id", "embedding", "vec_id", "embedding",
        dim=_DIMS, k=1 << 30, planes=ann_planes(e),
    ).select("query_id", "neighbor_id", "cos_sim")
    negs = cand.join(
        exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "anti"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        negs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select("query_id", F.col("neighbor_id").alias("hard_negative_id"), "cos_sim")
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# q301: embedding whitening (ZCA) -- spectrum applied back to the corpus
# ---------------------------------------------------------------------------

_WHITEN_EPS = 1e-6


_WHITEN_ORACLE = """
    WITH d AS (
        SELECT MAX(len(CAST(embedding AS DOUBLE[]))) AS d FROM embeddings),
    idx AS (
        SELECT unnest(generate_series(0, d - 1)) AS i FROM d),
    grid AS (
        SELECT a.i, b.i AS j FROM idx a JOIN idx b ON a.i <= b.i)
    SELECT i, j,
           CASE WHEN i = j THEN 1.0 ELSE 0.0 END AS whitened_cov,
           CASE WHEN i = j THEN 1.0 ELSE 0.0 END AS identity_target
    FROM grid ORDER BY i, j
"""


@register(
    "q301_embedding_whitening",
    sql=_WHITEN_ORACLE,
    doc="ZCA whitening of the embedding corpus with a full VALUE oracle "
    "(round-9 upgrade from rows-only): W = V diag(1/sqrt(l)) V' from the "
    "UNROUNDED covariance sufficient statistics (eigenvalues clipped at "
    f"{_WHITEN_EPS} only as a degenerate-spectrum guard; the fixture "
    "spectrum bottoms out ~7e-3, so the clip is inert and the whitening "
    "is exact), applied back to every vector, verified by re-measuring "
    "the whitened covariance -- the decorrelation step that makes cosine "
    "thresholds isotropic before SemDeDup-style pruning (q186) and "
    "stabilizes PQ codebook training (q161).  Because W inverts the "
    "exact covariance, cov(XW') == I to float precision (~1e-12 "
    "residual), so ROUND(,6) lands EXACTLY on the identity -- which a "
    "static SQL oracle CAN state: the oracle emits the d x d upper-"
    "triangle identity grid (d derived from the data).  Any eigh / "
    "kernel / aggregation error >= 5e-7 in any cell hash-mismatches; "
    "sub-rounding residuals stay pinned by the test_wave18 property "
    "test at 1e-9.  Plan: two corpus scans total -- scan 1 is the q295 "
    "one-scan sufficient statistics (only d^2 partials move), the 64x64 "
    "eigh runs driver-side (O(d^3), corpus-independent), and scan 2 "
    "applies the broadcast W inside the same Arrow Gram kernel (numpy "
    "matmul per batch) to emit the whitened upper triangle.",
)
def q301_embedding_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    # UNROUNDED sufficient statistics: W must invert the true covariance,
    # not the display-rounded q295 output -- whitening against the rounded
    # matrix leaves a W*(C_true - C_rounded)*W' residual up to ~7e-4 that
    # would straddle any output rounding (round-9 redesign note).
    stats = covariance_stats(spark, sf_dir).collect()
    C = np.zeros((_DIMS, _DIMS))
    for r in stats:
        c = (r["sxy"] - r["si"] * r["sj"] / r["n"]) / (r["n"] - 1)
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = c
    lam, V = np.linalg.eigh(C)
    W = V @ np.diag(1.0 / np.sqrt(np.maximum(lam, _WHITEN_EPS))) @ V.T

    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("x")
    )

    iu, ju = np.triu_indices(_DIMS)

    def _whitened_gram(batches, W=W):
        for pdf in batches:
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["x"]])
            Z = X @ W.T
            g = Z.T @ Z
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(_DIMS), [-1]]),
                    "j": np.concatenate([ju, np.full(_DIMS, -1), [-1]]),
                    "v": np.concatenate([g[iu, ju], Z.sum(axis=0), [float(len(pdf))]]),
                }
            )

    parts = e.mapInPandas(_whitened_gram, "i int, j int, v double")
    # Same one-scan materialization as covariance_stats: the four consumers
    # below must read the d^2-sized totals, not re-run the whitened scan.
    tot = (
        parts.groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .localCheckpoint(eager=True)
    )
    gram = tot.filter((F.col("i") >= 0) & (F.col("j") >= 0)).select(
        "i", "j", F.col("v").alias("szz")
    )
    sums = tot.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("d"), F.col("v").alias("s")
    )
    n = tot.filter(F.col("i") == -1).select(F.col("v").cast("bigint").alias("n"))
    si = sums.select(F.col("d").alias("i"), F.col("s").alias("si"))
    sj = sums.select(F.col("d").alias("j"), F.col("s").alias("sj"))
    cov = (F.col("szz") - F.col("si") * F.col("sj") / F.col("n")) / (F.col("n") - 1)
    return (
        gram.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (F.round(cov, 6) + F.lit(0.0)).alias("whitened_cov"),
            F.when(F.col("i") == F.col("j"), 1.0).otherwise(0.0).alias("identity_target"),
        )
        .orderBy("i", "j")
    )
