"""LLM-data-pipeline queries: dedup, similarity search, text analysis,
multimodal plumbing (SURVEY.md section 2.B extensions; charter first-class).

Oracles: every query here carries a full DuckDB value oracle.  Exact dedup /
jaccard / text stats / multimodal metadata are directly SQL-expressible.
MinHash-LSH (hand-rolled and MLlib) shares the exact-Jaccard oracle at
threshold 0.7, above the banding knee (miss probability <=5e-8 at the
planted-pair similarities).  SimHash replays its fingerprints in DuckDB via
the cross-engine md5_lower64 hash.  LSH-ANN / bucketed-cosine embed their
seeded hyperplanes as SQL literals so DuckDB replays the exact bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import avg_token_len, token_count
from ..operators.dedup import exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs, simhash_pairs
from ..operators.multimodal import extract_media_meta, with_binary_payload
from ..operators.similarity import ann_lsh_topk, embedding_cosine_pairs, topk_cosine
from ..sources.catalog import load_table
from . import register

# Shared oracle for the exact and LSH near-dup formulations (DuckDB list
# comprehension builds the same 3-word shingles as functions/text.py).
def _jaccard_oracle(threshold: float, order_by: bool = True) -> str:
    """Exact 3-shingle Jaccard pair SQL.  order_by=False omits the trailing
    sort for callers that embed this as a CTE and aggregate it (q315) --
    an explicit flag, not string surgery on the returned SQL."""
    tail = "ORDER BY d1, d2" if order_by else ""
    return f"""
    WITH docs AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
    tok AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
    sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
    pairs AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
        FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT d1, d2, CAST(common AS DOUBLE) / (s1.n + s2.n - common) AS jaccard
    FROM pairs JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
    WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {threshold}
    {tail}
"""


_JACCARD_ORACLE = _jaccard_oracle(0.5)


@register(
    "q50_dedup_exact",
    sql="""
    SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    ORDER BY text_hash
    """,
    doc="Exact dedup: hash-group text, keep lowest id (one shuffle).",
)
def q50_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d, "text", "doc_id").orderBy("text_hash")


@register(
    "q51_dedup_jaccard_exact",
    sql=_JACCARD_ORACLE,
    doc="Exact 3-word-shingle Jaccard near-dup pairs (inverted-index join).  "
    "Ground-truth twin of q52's MinHash-LSH scale path.",
    scale_class="ground-truth",
)
def q51_dedup_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.5).orderBy("d1", "d2")


@register(
    "q52_dedup_minhash_lsh",
    sql=_jaccard_oracle(0.7),
    doc="MinHash(96)+LSH(24 bands) near-dup with exact verify -- the 100 TB "
    "path.  Threshold 0.7 sits above the 24x4 banding knee: candidate "
    "capture is 0.9986 at j=0.7 and >=1-3.2e-6 at j>=0.8 (every planted "
    "fixture pair is >=0.8), so the output deterministically equals the "
    "exact formulation q51 restricted to the same threshold; at the old 0.5 "
    "the capture probability at-threshold (~0.87) would have made the shared "
    "exact oracle flaky on a near-threshold fixture.",
)
def q52_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "text", "doc_id", n=3, threshold=0.7).orderBy("d1", "d2")


def _q53_oracle_sql() -> str:
    # DuckDB replays the full SimHash: md5_number_lower == the query's
    # md5_lower64 token hash (probed byte-for-byte), the fingerprint is the
    # same 64 sign-sums bit-packed, and the all-pairs Hamming filter equals
    # the pigeonhole-banded candidate set because the banding cover is
    # exhaustive, not probabilistic.
    # DuckDB's << overflows at bit 63; spell that weight as a literal.
    bits = " + ".join(
        "(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)) > 0"
        " THEN {w} ELSE 0::UBIGINT END)".format(
            b=b, w=f"CAST({1 << b} AS UBIGINT)" if b == 63 else f"(1::UBIGINT << {b})"
        )
        for b in range(64)
    )
    return f"""
    WITH th AS (
        SELECT doc_id,
               list_transform(list_distinct(string_split(text, ' ')), t -> md5_number_lower(t)) AS hs
        FROM documents),
    fp AS (SELECT doc_id, ({bits}) AS fp FROM th)
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 3
    ORDER BY d1, d2
    """


@register(
    "q53_dedup_simhash",
    sql=_q53_oracle_sql(),
    doc="SimHash-64 near-dup pairs within Hamming distance 3 (pigeonhole "
    "banding -- exhaustive, so output provably equals all-pairs).  Uses the "
    "cross-engine md5_lower64 token hash so the DuckDB oracle replays the "
    "fingerprints exactly; hash_fn='xxhash64' is the cheaper production "
    "default with an identical plan.",
)
def q53_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash_pairs(d, "text", "doc_id", max_hamming=3, hash_fn="md5").orderBy("d1", "d2")


_EMBED_EXACT_PAIRS_ORACLE = """
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 9) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                   * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 9) >= 0.42
    ORDER BY id1, id2
    """


# adaptive hyperplane bits (round 13): expected bucket size pinned at
# _Q65_TARGET vectors, floored at the historical 4 bits -- bits derived from
# COUNT(*) on BOTH sides, so the candidate stream stays Theta(n * target)
# instead of Theta(n^2 / 16) (the round-12 fixed-nlist critique applied to
# the hyperplane family).
_Q65_TARGET = 1024
_Q65_FLOOR = 4


def _q65_oracle_sql() -> str:
    # Mirror the LSH prefilter: formula hyperplanes + a COUNT(*)-derived bit
    # count, both evaluated from scratch by DuckDB (no plane literals).
    from ..operators.similarity import (
        sql_adaptive_bucket_cte,
        sql_adaptive_hyperplane_ctes,
    )

    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    {sql_adaptive_hyperplane_ctes(64, src="e", target_bucket=_Q65_TARGET, floor_bits=_Q65_FLOOR)},
    {sql_adaptive_bucket_cte("e")},
    b AS (
        SELECT e.vec_id, e.v, k.bucket, sqrt(list_dot_product(e.v, e.v)) AS nrm
        FROM e JOIN bkt k USING (vec_id))
    SELECT x.vec_id AS id1, y.vec_id AS id2,
           ROUND(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 9) AS cos_sim
    FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE ROUND(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 9) >= 0.42
    ORDER BY id1, id2
    """


@register(
    "q65_dedup_embedding_cosine",
    sql=_q65_oracle_sql(),
    doc="Embedding-cosine near-dup pairs, LSH-bucketed (the 100 TB path): "
    "candidates restricted to pairs sharing a random-hyperplane bucket, "
    "exact cosine verify on candidates only.  The bit count is ADAPTIVE "
    f"(ceil(log2(n/{_Q65_TARGET})), floor {_Q65_FLOOR} bits), derived from "
    "COUNT(*) on both engine and oracle sides, so the expected bucket size "
    "-- and with it the per-bucket Arrow slab -- stays constant as the "
    "corpus grows; the formula planes are replayed from scratch in DuckDB "
    "(no literals).  The unrestricted exact twin is q114.",
)
def q65_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import adaptive_hyperplanes, nbits_for

    e = load_table(spark, sf_dir, "embeddings")
    bits = nbits_for(e.count(), _Q65_TARGET, _Q65_FLOOR)
    return embedding_cosine_pairs(
        e, "vec_id", "embedding", threshold=0.42, dim=64,
        planes=adaptive_hyperplanes(64, bits),
    ).orderBy("id1", "id2")


@register(
    "q114_dedup_embedding_exact",
    sql=_EMBED_EXACT_PAIRS_ORACLE,
    doc="Exact all-pairs embedding-cosine near-dup (prefilter_bits=0): the "
    "O(n^2) ground-truth twin of q65's LSH-bucketed scale path -- kept as a "
    "registered oracle query, not the form a user would run at 100 TB.",
    scale_class="ground-truth",
)
def q114_dedup_embedding_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs(e, "vec_id", "embedding", threshold=0.42).orderBy("id1", "id2")


@register(
    "q54_similarity_topk",
    sql="""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
    scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))), 9) AS cos_sim
        FROM q JOIN embeddings e ON e.vec_id <> q.vec_id)
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored)
    WHERE rank <= 5
    ORDER BY query_id, rank
    """,
    doc="Exact top-5 cosine neighbors for every 50th vector (broadcast "
    "brute-force baseline; see q55 for the ANN scale path).  The per-query "
    "scan is sample x corpus -- the documented ANN ground truth, not the "
    "production path.",
    scale_class="ground-truth",
)
def q54_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    return topk_cosine(q, e, "vec_id", "embedding", "vec_id", "embedding", k=5)


# adaptive bits for the ANN/top-k family (q55/q297/q300): expected bucket
# size _ANN_TARGET, floored at the historical 8 bits.  At the small sfs the
# floor holds (values unchanged from the fixed-bit era); at sf10's 200k
# vectors the rule yields 10 bits -- the adaptivity the fixed constant
# lacked.
_ANN_TARGET = 256
_ANN_FLOOR = 8


def _ann_bucket_ctes() -> str:
    """Shared oracle preamble for the adaptive-bits ANN family: e (vectors),
    hb/planes (COUNT(*)-derived formula hyperplanes), bkt (bucket ids), b
    (vectors + bucket + norm)."""
    from ..operators.similarity import (
        sql_adaptive_bucket_cte,
        sql_adaptive_hyperplane_ctes,
    )

    return f"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    {sql_adaptive_hyperplane_ctes(64, src="e", target_bucket=_ANN_TARGET, floor_bits=_ANN_FLOOR)},
    {sql_adaptive_bucket_cte("e")},
    b AS (
        SELECT e.vec_id, e.v, k.bucket, sqrt(list_dot_product(e.v, e.v)) AS nrm
        FROM e JOIN bkt k USING (vec_id))"""


def ann_planes(e) -> "np.ndarray":
    """Engine-side mirror of _ann_bucket_ctes' plane set for a loaded
    embeddings DataFrame."""
    from ..operators.similarity import adaptive_hyperplanes, nbits_for

    return adaptive_hyperplanes(64, nbits_for(e.count(), _ANN_TARGET, _ANN_FLOOR))


def _q55_oracle_sql() -> str:
    return f"""
    WITH {_ann_bucket_ctes()},
    q AS (SELECT * FROM b WHERE vec_id % 50 = 0),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 9) AS cos_sim
        FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id)
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored)
    WHERE rank <= 5
    ORDER BY query_id, rank
    """


@register(
    "q55_similarity_ann_lsh",
    sql=_q55_oracle_sql(),
    doc="ANN top-5 via random-hyperplane LSH buckets -- restricts candidate "
    "generation to same-bucket pairs.  The bit count is ADAPTIVE "
    f"(ceil(log2(n/{_ANN_TARGET})), floor {_ANN_FLOOR} bits) from COUNT(*) "
    "on both sides, keeping the expected per-bucket candidate list "
    "constant as the corpus grows; the formula hyperplanes are replayed "
    "from scratch in the DuckDB oracle (no literals).",
)
def q55_similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    return ann_lsh_topk(
        q, e, "vec_id", "embedding", "vec_id", "embedding",
        dim=64, k=5, planes=ann_planes(e),
    )


@register(
    "q56_text_stats",
    sql="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Per-language corpus statistics (token counting via whitespace split).",
)
def q56_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
            (F.sum(token_count("text")).cast("double") / F.count("*")).alias("avg_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


@register(
    "q57_text_quality",
    sql="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
               / len(string_split(text, ' ')) AS avg_token_len,
           len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS ttr,
           CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 200 THEN 1 ELSE 0 END AS len_ok
    FROM documents
    ORDER BY doc_id
    """,
    doc="Per-doc quality signals: token count, mean token length, type-token "
    "ratio, length gate.",
)
def q57_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    nt = token_count("text")
    uniq = F.size(F.array_distinct(F.split(F.col("text"), " "))).cast("bigint")
    return d.select(
        "doc_id",
        nt.alias("n_tokens"),
        avg_token_len("text").alias("avg_token_len"),
        uniq.alias("n_unique_tokens"),
        (uniq.cast("double") / nt).alias("ttr"),
        F.when(nt.between(20, 200), 1).otherwise(0).alias("len_ok"),
    ).orderBy("doc_id")


@register(
    "q58_text_langid",
    sql="""
    WITH scored AS (
        SELECT doc_id, lang AS true_lang,
               len(list_intersect(string_split(text, ' '), ['the', 'fast', 'key', 'order'])) AS s_en,
               len(list_intersect(string_split(text, ' '), ['data', 'stream', 'batch', 'row'])) AS s_x
        FROM documents)
    SELECT doc_id, true_lang,
           CASE WHEN s_en >= s_x THEN 'markers_a' ELSE 'markers_b' END AS predicted_family,
           CAST(s_en AS BIGINT) AS score_a, CAST(s_x AS BIGINT) AS score_b
    FROM scored
    ORDER BY doc_id
    """,
    doc="Language-ID heuristic skeleton: marker-token intersection scoring "
    "(deterministic; synthetic text so markers are engine words).",
)
def q58_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    markers_a = F.array(*[F.lit(w) for w in ["the", "fast", "key", "order"]])
    markers_b = F.array(*[F.lit(w) for w in ["data", "stream", "batch", "row"]])
    s_en = F.size(F.array_intersect(toks, markers_a)).cast("bigint")
    s_x = F.size(F.array_intersect(toks, markers_b)).cast("bigint")
    return d.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.when(s_en >= s_x, "markers_a").otherwise("markers_b").alias("predicted_family"),
        s_en.alias("score_a"),
        s_x.alias("score_b"),
    ).orderBy("doc_id")


@register(
    "q59_text_fingerprint",
    sql="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
           length(text) AS n_chars_raw
    FROM documents
    ORDER BY doc_id
    """,
    doc="Document fingerprinting: md5 over whitespace-normalized lowercase text.",
)
def q59_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))).alias("fingerprint"),
        F.length("text").cast("bigint").alias("n_chars_raw"),
    ).orderBy("doc_id")


@register(
    "q60_multimodal_meta",
    sql="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS fake_width,
           CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS fake_height
    FROM documents
    ORDER BY doc_id
    """,
    doc="Multimodal plumbing: binary payload column -> Arrow-batched "
    "mapInPandas metadata extraction (decode step stubbed; see "
    "operators/multimodal.py).",
)
def q60_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_binary_payload(load_table(spark, sf_dir, "documents"), "text")
    meta = extract_media_meta(d, "doc_id")
    return meta.select("doc_id", "n_bytes", "fake_width", "fake_height").orderBy("doc_id")


@register(
    "q61_tokens_regex",
    sql="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\s]')) AS n_bpe_ish_tokens,
           len(regexp_extract_all(text, '[0-9]+')) AS n_number_tokens
    FROM documents
    ORDER BY doc_id
    """,
    doc="BPE-ish regex token counting (word pieces + punctuation singletons).",
)
def q61_tokens_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), F.lit(0)))
        .cast("bigint")
        .alias("n_bpe_ish_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]+"), F.lit(0)))
        .cast("bigint")
        .alias("n_number_tokens"),
    ).orderBy("doc_id")


@register(
    "q78_multimodal_frames",
    sql="""
    WITH f AS (
        SELECT doc_id, text,
               unnest(range(0, CAST(floor((length(text) - 1) / 64) AS BIGINT) + 1)) AS frame_idx
        FROM documents)
    SELECT doc_id, frame_idx,
           substring(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64) AS frame_str,
           CAST(length(substring(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64)) AS BIGINT) AS frame_bytes
    FROM f
    WHERE frame_idx % 2 = 0
    ORDER BY doc_id, frame_idx
    """,
    doc="Multimodal frame sampling: binary payload chunked into 64-byte "
    "frames, every 2nd kept -- JVM-side explode, no Python in the expansion "
    "(operators/multimodal.py:sample_frames).  The frame slices stay binary "
    "inside the plan and decode to string only at the output boundary so the "
    "oracle compare is engine-neutral (documents are ASCII: char offsets == "
    "byte offsets).",
)
def q78_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames

    d = with_binary_payload(load_table(spark, sf_dir, "documents"), "text")
    frames = sample_frames(d, "doc_id", frame_bytes=64, every=2)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.decode(F.col("frame"), "UTF-8").alias("frame_str"),
        "frame_bytes",
    ).orderBy("doc_id", "frame_idx")


@register(
    "q85_dedup_minhash_mllib",
    sql=_jaccard_oracle(0.7),
    doc="Near-dup via the MLlib route (SURVEY 2.B: HashingTF -> MinHashLSH, "
    "seeded): 3-word shingles hashed into a sparse vector space, "
    "OR-amplified LSH candidates (8 tables: capture >=1-2.6e-6 at j>=0.8, "
    "where every fixture pair sits), then an exact raw-shingle Jaccard "
    "verify on the candidates at threshold 0.7 -- the same "
    "verify-on-candidates shape as q52, so the output shares the exact "
    "oracle.  Round-13 spelling: the SAME MLlib model's transform() feeds a "
    "groupBy over (table, min-hash) buckets -- approxSimilarityJoin's exact "
    "candidate semantics (a pair is a candidate iff it shares >=1 bucket) "
    "without its explode-BOTH-SIDES self-join, which shuffled the full "
    "struct (2^20-dim feature vector + 8 hash vectors) twice and "
    "re-evaluated the shingling upstream once per side.  Its hashed-feature "
    "distance gate (<=0.5) is dropped as provably redundant: the output "
    "filter is exact jaccard >= 0.7 on the SAME candidate set, and the gate "
    "could only ever remove a candidate with exact j >= 0.7 but hashed "
    "j < 0.5 -- a pair the pre-round-13 spelling would have wrongly dropped "
    "and thereby failed the exact oracle it has always passed.  The exact "
    "verify is q52's shared exact_jaccard_verify (hashed shingle sets; "
    "counts -- and the emitted int-ratio doubles -- equal the string-"
    "shingle spelling, the q51/q52 equivalence).",
)
def q85_dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import HashingTF, MinHashLSH
    from pyspark.ml.functions import vector_to_array

    from ..functions.text import word_shingles
    from ..operators.dedup import bucket_member_pairs, exact_jaccard_verify

    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", word_shingles("text", 3).alias("shingles"))
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 20).transform(sh)
    model = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42).fit(tf)
    # Candidate generation: one narrow shuffle of (doc_id, table, min-hash)
    # longs into per-bucket member lists, upper-triangle pair expansion,
    # distinct across tables -- identical candidate set to
    # approxSimilarityJoin(tf, tf, ...) by its join-on-any-shared-bucket
    # definition, with the signature pipeline evaluated ONCE (the
    # minhash_lsh_pairs plan-shape rule).
    buckets = (
        model.transform(tf)
        .select(
            "doc_id",
            F.posexplode(
                F.transform("hashes", lambda h: vector_to_array(h)[0])
            ).alias("tbl", "h"),
        )
        .groupBy("tbl", "h")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = bucket_member_pairs(buckets)
    return exact_jaccard_verify(cand, d, "text", "doc_id", 3, 0.7).orderBy("d1", "d2")


@register(
    "q86_training_data_pipeline",
    sql="""
    WITH quality AS (
        SELECT doc_id, text, lang, len(string_split(text, ' ')) AS n_tokens
        FROM documents
        WHERE len(string_split(text, ' ')) BETWEEN 20 AND 200),
    exact_kept AS (
        SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
    kept AS (
        SELECT q.* FROM quality q JOIN exact_kept USING (doc_id)),
    docs AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM kept)),
    tok AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
    sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
    near AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
        FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    near_drop AS (
        SELECT DISTINCT d2 AS doc_id
        FROM near JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= 0.7),
    final AS (SELECT * FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM near_drop))
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM final
    GROUP BY lang
    ORDER BY lang
    """,
    doc="End-to-end training-data prep composed from the engine's own "
    "operators: token-length quality gate -> exact dedup (keep lowest id) -> "
    "near-dup removal (MinHash-LSH candidates, exact-verified, higher id "
    "dropped) -> per-language corpus stats.  One oracle checks the whole "
    "chain.",
)
def q86_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tokens = token_count("text")
    quality = d.filter(n_tokens.between(20, 200)).select(
        "doc_id", "text", "lang", n_tokens.alias("n_tokens")
    )
    keepers = exact_dedup(quality, "text", "doc_id").select(F.col("keeper_id").alias("doc_id"))
    kept = quality.join(keepers, "doc_id", "left_semi")
    near_drop = (
        minhash_lsh_pairs(kept, "text", "doc_id", n=3, threshold=0.7)
        .select(F.col("d2").alias("doc_id"))
        .distinct()
    )
    final = kept.join(near_drop, "doc_id", "left_anti")
    return (
        final.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").cast("bigint").alias("total_tokens"))
        .orderBy("lang")
    )


@register(
    "q89_dedup_clusters",
    sql="""
    WITH RECURSIVE
    docs AS MATERIALIZED (
        -- MATERIALIZED (README rule 9, oracle-side): the recursive cc step
        -- joins edges once per iteration; inlined, DuckDB re-runs the whole
        -- shingle self-join each step -- measured 7.6s -> 1.2s at sf0.1.
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
    tok AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
    sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
    pairs AS (
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= 0.7),
    edges AS MATERIALIZED (SELECT d1 AS u, d2 AS v FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
    cc(node, label) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.v, cc.label FROM cc JOIN edges e ON cc.node = e.u)
    SELECT node AS doc_id, MIN(label) AS cluster_id FROM cc GROUP BY node
    ORDER BY doc_id
    """,
    doc="Dedup clustering: connected components over near-dup pairs "
    "(iterative min-label propagation, the DataFrame form of union-find; "
    "operators/dedup.py:connected_components).  cluster_id = min doc_id "
    "reachable; keep-one-per-cluster follows by filtering doc_id = "
    "cluster_id.  Oracle = DuckDB recursive CTE over the exact pair graph.",
)
def q89_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", n=3, threshold=0.7)
    return connected_components(pairs).orderBy("doc_id")


@register(
    "q109_doc_chunking",
    sql="""
    SELECT doc_id,
           CAST(st AS INT) AS chunk_start,
           array_to_string(toks[st : st + 31], ' ') AS chunk_text,
           CAST(len(toks[st : st + 31]) AS INT) AS n_chunk_tokens
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 120),
         UNNEST(generate_series(1, greatest(len(toks), 1), 24)) AS t(st)
    ORDER BY doc_id, chunk_start
    """,
    doc="Document chunking: overlapping 32-token windows at stride 24 "
    "(functions/text.py:token_chunks) — the context-window split step of a "
    "training-data pipeline.  One narrow projection + one explode; no "
    "shuffle, no Python.",
)
def q109_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_chunks

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    return (
        d.select("doc_id", F.explode(token_chunks("text", 32, 24)).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_start").alias("chunk_start"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
        )
        .orderBy("doc_id", "chunk_start")
    )


@register(
    "q110_text_normalize",
    sql="""
    SELECT doc_id,
           lower(trim(regexp_replace(text, ' +', ' ', 'g'))) AS norm_text,
           regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS masked_text,
           len(text) - len(replace(text, ' ', '')) AS n_spaces,
           CAST(len(regexp_extract_all(text, '[^\\x00-\\x7F]')) AS INT) AS n_non_ascii
    FROM documents
    WHERE doc_id < 120
    ORDER BY doc_id
    """,
    doc="Text normalization / scrubbing: whitespace collapse + case fold, "
    "digit masking (the PII-redaction pattern: swap the regex for "
    "email/phone/SSN classes in production), and non-ASCII audit counts. "
    "All single-pass regexp_replace inside codegen — the cheapest possible "
    "form of the first cleaning pass over a 100 TB corpus.",
)
def q110_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    return d.select(
        "doc_id",
        F.lower(F.trim(F.regexp_replace("text", " +", " "))).alias("norm_text"),
        F.regexp_replace("text", "[0-9]+", "<NUM>").alias("masked_text"),
        (F.length("text") - F.length(F.regexp_replace("text", " ", ""))).alias("n_spaces"),
        F.regexp_count("text", F.lit("[^\\x00-\\x7F]")).alias("n_non_ascii"),
    ).orderBy("doc_id")


@register(
    "q111_label_centroids",
    sql="""
    SELECT label, CAST(pos AS INT) AS pos, AVG(CAST(v AS DOUBLE)) AS centroid_val
    FROM (SELECT label, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings)
    GROUP BY label, pos
    ORDER BY label, pos
    """,
    doc="Per-label elementwise centroid of the embedding column — the "
    "k-means/IVF training step (operators/similarity.py uses these cells). "
    "posexplode -> (label, dim) hash-agg: one shuffle keyed on "
    "(label, dim), partial aggregation map-side, scales as labels x dims "
    "regardless of corpus size.",
)
def q111_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(F.avg(F.col("v").cast("double")).alias("centroid_val"))
        .orderBy("label", "pos")
    )
