"""Wave-19 operators (round 7, continued): corpus-curation mechanisms that
only matter at scale -- a Bloom-prefiltered decontamination pass (the
ship-a-static-filter-to-executors shape) and the BPE ENCODE pass that
applies learned merge rules back to the corpus (the other half of q270's
merge training: tokenizer inference, the single hottest loop of an LLM data
pipeline).

Reference parity note: the reference (Processor.java, 172 lines) has no
analytics surface; these are charter extensions in the SURVEY.md section-2.B
training-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import token_count, word_shingles
from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q302: Bloom-prefiltered benchmark decontamination
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1 << 20  # 128 KiB bitarray
_BLOOM_K = 4


def _bloom_build(hashes, m: int = _BLOOM_BITS, k: int = _BLOOM_K):
    """Bitarray Bloom filter over int64 hash values (numpy, double hashing:
    probe_j = (h % m + j * ((h >> 32) | 1)) % m)."""
    import numpy as np

    bits = np.zeros(m // 8, dtype=np.uint8)
    u = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
    h1 = u % m
    delta = (u >> np.uint64(32)) | np.uint64(1)
    for j in range(k):
        pos = (h1 + np.uint64(j) * delta) % m
        np.bitwise_or.at(bits, (pos // 8).astype(np.int64), (1 << (pos % 8)).astype(np.uint8))
    return bits


def _bloom_probe_kernel(bits, m: int = _BLOOM_BITS, k: int = _BLOOM_K):
    """Arrow-batch kernel: (doc_id, ghs: array<long>) -> flagged doc_ids.
    Membership test is fully vectorized numpy over the concatenated batch;
    per-doc reduction via add.reduceat on the ragged boundaries."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            lens = pdf["ghs"].map(len).to_numpy()
            if lens.sum() == 0:
                continue
            flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in pdf["ghs"]])
            u = flat.astype(np.uint64)
            h1 = u % m
            delta = (u >> np.uint64(32)) | np.uint64(1)
            member = np.ones(len(flat), dtype=bool)
            for j in range(k):
                pos = (h1 + np.uint64(j) * delta) % m
                member &= (bits[(pos // 8).astype(np.int64)] >> (pos % 8).astype(np.uint8)) & 1 > 0
            starts = np.zeros(len(pdf), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            nonempty = lens > 0
            hits = np.zeros(len(pdf), dtype=np.int64)
            hits[nonempty] = np.add.reduceat(member.astype(np.int64), starts[nonempty])
            flagged = pdf["doc_id"].to_numpy()[hits > 0]
            yield pd.DataFrame({"doc_id": flagged})

    return gen


@register(
    "q302_bloom_decontaminate",
    sql="""
    WITH g AS (
        SELECT doc_id,
               unnest(list_distinct(
                   [array_to_string(toks[i:i+3], ' ')
                    FOR i IN range(1, greatest(len(toks)-3, 1) + 1)])) AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
    ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
    ng AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id)
    SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared,
           CAST(ANY_VALUE(ng.n_grams) AS BIGINT) AS n_grams,
           ROUND(COUNT(*) * 1.0 / ANY_VALUE(ng.n_grams), 6) AS contamination_share
    FROM g JOIN ev USING (gram) JOIN ng ON ng.doc_id = g.doc_id
    WHERE g.doc_id % 97 <> 0
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
    doc="Benchmark decontamination with a Bloom PREFILTER (q139's semantics, "
    "the 100 TB mechanism): the eval set's 4-word shingles are xxhash64-ed "
    "JVM-side, collected (benchmarks are small by construction), and packed "
    "into a 128 KiB bitarray Bloom filter (m=2^20, k=4, double hashing) "
    "that ships to every executor inside an Arrow kernel closure -- the "
    "static-filter shape production pipelines use when even a broadcast "
    "hash set is too large.  Scan 1 tests every document's gram hashes "
    "against the bitarray in vectorized numpy (no shuffle, no join; output "
    "is just flagged doc_ids).  Scan 2 runs the EXACT q139 overlap join on "
    "flagged documents only, so Bloom false positives are eliminated and "
    "the result is exactly the true contamination report (no false "
    "negatives by Bloom construction; both sides hash with the same JVM "
    "xxhash64).  Output adds per-doc gram counts and the contamination "
    "share that drives drop-vs-keep policy.",
)
def q302_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
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

    corpus = d.filter(F.col("doc_id") % 97 != 0)
    hashed = corpus.select(
        "doc_id", F.transform(grams4, lambda g: F.xxhash64(g)).alias("ghs")
    )
    flagged = hashed.mapInPandas(_bloom_probe_kernel(bits), "doc_id long")

    ev_grams = (
        d.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(grams4).alias("gram"))
        .distinct()
    )
    # Broadcast the flagged ids: contamination is rare by construction
    # (benchmarks are tiny next to the corpus), so the candidate set is
    # bounded and the corpus side never shuffles.  If a corpus were
    # pathologically contaminated, the plain q139 join is the fallback.
    #
    # n_shared AND n_grams both come from ONE exploded pass via a LEFT join
    # with a hit marker -- NOT a separate size(word_shingles) column next to
    # the explode: CollapseProject duplicates the shingle expression above
    # the generate, re-evaluating it per exploded ROW (measured 22.5s vs
    # 3.9s at sf0.1 for this one column).
    cand = corpus.join(F.broadcast(flagged), "doc_id").select(
        "doc_id", F.explode(grams4).alias("gram")
    )
    marked = cand.join(
        F.broadcast(ev_grams.withColumn("hit", F.lit(1))), "gram", "left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("hit").alias("n_shared"),
            F.count("*").alias("n_grams"),
            F.round(F.count("hit") / F.count("*"), 6).alias("contamination_share"),
        )
        .filter(F.col("n_shared") > 0)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q303: BPE encode -- apply learned merge rules back to the corpus
# ---------------------------------------------------------------------------

_BPE_LEVELS = 4


def _bpe_encode_oracle(levels: int) -> str:
    """Unrolled DuckDB twin: train the q270 greedy merges, then measure the
    encoded corpus per source."""
    parts = [
        """WITH t0 AS (
        SELECT source, ' ' || text || ' ' AS x,
               len(string_split(text, ' ')) AS n_before
        FROM documents WHERE length(text) > 0)"""
    ]
    for k in range(levels):
        parts.append(
            f""",
    pairs{k} AS (
        SELECT u.p[1] || ' ' || u.p[2] AS pair, COUNT(*) AS c
        FROM (SELECT unnest(list_zip(tk, tk[2:])) AS p
              FROM (SELECT string_split(trim(x), ' ') AS tk FROM t{k})) u
        WHERE u.p[2] IS NOT NULL
        GROUP BY 1),
    best{k} AS (
        SELECT pair FROM pairs{k} ORDER BY c DESC, pair ASC LIMIT 1),
    t{k + 1} AS (
        SELECT source, n_before,
               CASE WHEN (SELECT COUNT(*) FROM best{k}) = 0 THEN x
                    ELSE replace(x, ' ' || (SELECT pair FROM best{k}) || ' ',
                            ' ' || replace((SELECT pair FROM best{k}), ' ', '+') || ' ')
               END AS x
        FROM t{k})"""
        )
    parts.append(
        f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_before) AS BIGINT) AS tokens_before,
           CAST(SUM(len(string_split(trim(x), ' '))) AS BIGINT) AS tokens_after,
           ROUND(SUM(len(string_split(trim(x), ' '))) * 1.0 / SUM(n_before), 6)
               AS compression
    FROM t{levels}
    GROUP BY source
    ORDER BY source"""
    )
    return "".join(parts)


@register(
    "q303_bpe_encode",
    sql=_bpe_encode_oracle(_BPE_LEVELS),
    doc=f"BPE ENCODE: train {_BPE_LEVELS} greedy merge rules (the q270 loop "
    "-- per round one pair-count hash-agg and a 1-row argmax collect; the "
    "rules are the only driver state) and then APPLY them to the corpus, "
    "reporting per-source token counts before/after and the compression "
    "ratio -- tokenizer inference, the pass that actually runs over all "
    "100 TB on every training run.  The encode itself is a chain of "
    f"{_BPE_LEVELS} stateless whole-token string replaces -- pure "
    "whole-stage-codegen projections, no shuffle, no Python; the only "
    "shuffle in the query is the final per-source rollup (bounded by the "
    "source vocabulary).  The "
    "oracle unrolls the identical train-then-encode chain as CTEs.",
)
def q303_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    enc = d.select(
        "source",
        F.concat(F.lit(" "), F.col("text"), F.lit(" ")).alias("x"),
        token_count("text").alias("n_before"),
    )
    for _ in range(_BPE_LEVELS):
        tk = enc.select(F.split(F.trim("x"), " ").alias("tk"))
        pairs = (
            tk.select(
                F.explode(
                    F.expr(
                        "transform(slice(tk, 1, size(tk) - 1),"
                        " (t, i) -> concat(t, ' ', element_at(tk, i + 2)))"
                    )
                ).alias("pair")
            )
            .groupBy("pair")
            .agg(F.count("*").alias("c"))
        )
        rows = pairs.orderBy(F.col("c").desc(), F.col("pair").asc()).limit(1).collect()
        if not rows:
            # Degenerate corpus: every non-empty doc is a single token, so
            # no adjacent pair exists and no merge can ever apply -- the
            # encode is the identity from this level on (later levels can't
            # create pairs either).  The oracle's CASE guard on an empty
            # best{k} encodes the same rule, so both engines agree.
            break
        best = rows[0]
        enc = enc.select(
            "source",
            F.replace(
                "x",
                F.lit(f" {best.pair} "),
                F.lit(" " + best.pair.replace(" ", "+") + " "),
            ).alias("x"),
            "n_before",
        )
    return (
        enc.select(
            "source", "n_before", F.size(F.split(F.trim("x"), " ")).alias("n_after")
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_before").alias("tokens_before"),
            F.sum(F.col("n_after").cast("bigint")).alias("tokens_after"),
            F.round(F.sum("n_after") / F.sum("n_before"), 6).alias("compression"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q304: differentially-private histogram release (seeded Laplace mechanism)
# ---------------------------------------------------------------------------

_DP_EPS = 0.5
_DP_SALT = "dp1|"


@register(
    "q304_dp_histogram",
    sql=f"""
    WITH c AS (
        SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source),
    u AS (
        SELECT lang, source, n,
               (CAST(CAST('0x' || substr(md5('{_DP_SALT}' || lang || '|' || source), 1, 8)
                     AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0 AS u
        FROM c)
    SELECT lang, source, CAST(n AS BIGINT) AS n_true,
           ROUND(n + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                     * (1.0 / {_DP_EPS}) * ln(1.0 - 2.0 * abs(u - 0.5)), 6)
               AS n_noisy,
           {_DP_EPS} AS epsilon
    FROM u
    ORDER BY lang, source
    """,
    doc=f"Differentially-private histogram release (Laplace mechanism, "
    f"eps={_DP_EPS}, count sensitivity 1): per-(lang, source) counts plus "
    "inverse-CDF Laplace noise drawn from a DETERMINISTIC per-cell uniform "
    "(salted md5 -> (bucket+0.5)/2^32, the q209 convention), so the "
    "release is reproducible, auditable, and value-oracle-checkable while "
    "keeping the mechanism's exact shape -- swap the salt per release "
    "epoch for fresh noise.  The privacy-critical property (noise "
    "distribution) is carried by the uniform->Laplace transform; "
    "determinism-by-salt is the standard replayable-pipeline compromise "
    "(a production release would tie the salt to a secret).  Plan: one "
    "hash-agg to the cell frame, then pure projection arithmetic on "
    "|cells| rows; ROUND(,6) absorbs the last-ulp ln() difference "
    "between JVM and libm (the q286 discipline).  Complements q294's "
    "k-anonymity audit as the statistical-release half of the privacy "
    "toolkit.",
)
def q304_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count("*").alias("n"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_DP_SALT), F.col("lang"), F.lit("|"), F.col("source"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    sign = F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    lap = sign * F.lit(1.0 / _DP_EPS) * F.log(F.lit(1.0) - 2.0 * F.abs(u - 0.5))
    return c.select(
        "lang",
        "source",
        F.col("n").alias("n_true"),
        F.round(F.col("n") + lap, 6).alias("n_noisy"),
        F.lit(_DP_EPS).alias("epsilon"),
    ).orderBy("lang", "source")


# ---------------------------------------------------------------------------
# q305: consistent-hash ring rebalance audit (elastic re-sharding)
# ---------------------------------------------------------------------------

_RING_VNODES = 16
_RING_SALT = "ring|"


def _ring_points(n_nodes: int):
    """(position, node) ring points: md5 first-8-hex of 'ring|node|vnode',
    sorted by position.  Driver-side literals shared with the oracle."""
    import hashlib

    pts = []
    for i in range(n_nodes):
        for v in range(_RING_VNODES):
            h = int(
                hashlib.md5(f"{_RING_SALT}n{i}|{v}".encode()).hexdigest()[:8], 16
            )
            pts.append((h, f"n{i}"))
    pts.sort()
    return pts


def _q305_oracle_sql() -> str:
    r8, r9 = _ring_points(8), _ring_points(9)

    def lits(pts):
        pos = "[" + ", ".join(str(p) for p, _ in pts) + "]"
        nodes = "[" + ", ".join(f"'{n}'" for _, n in pts) + "]"
        return pos, nodes

    p8, n8 = lits(r8)
    p9, n9 = lits(r9)
    return f"""
    WITH h AS (
        SELECT doc_id,
               CAST('0x' || substr(md5('doc|' || doc_id), 1, 8) AS BIGINT) AS hv
        FROM documents),
    a AS (
        SELECT doc_id,
               {n8}[(len(list_filter({p8}, p -> p < hv)) % 128) + 1] AS shard_before,
               {n9}[(len(list_filter({p9}, p -> p < hv)) % 144) + 1] AS shard_after
        FROM h)
    SELECT shard_before, shard_after,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           (shard_before <> shard_after) AS moved
    FROM a
    GROUP BY shard_before, shard_after
    ORDER BY shard_before, shard_after
    """


@register(
    "q305_consistent_hash_ring",
    sql=_q305_oracle_sql(),
    doc=f"Consistent-hash ring rebalance audit: assign every document to a "
    f"shard on an 8-node x {_RING_VNODES}-vnode md5 ring (successor of the "
    "doc hash, wrapping), re-assign on the 9-node ring, and report the "
    "movement matrix -- the elastic re-sharding contract (only ~1/9 of "
    "keys move, all TO the new node) that naive mod-N bucketing (q141/"
    "q208's stable-within-epoch scheme) cannot give when the shard count "
    "changes.  Ring points are driver-computed literals shared with the "
    "oracle.  Plan: successor lookup is a bounded 128/144-element filter-"
    "count per row over the broadcast literal arrays (O(vnodes) constant "
    "work inside one codegen-free projection, no shuffle); the rollup is "
    "the only exchange.  At 100 TB the same literals ship in the task "
    "binary -- assignment stays scan-local however many executors run.",
)
def q305_consistent_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    r8, r9 = _ring_points(8), _ring_points(9)
    d = load_table(spark, sf_dir, "documents")
    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit("doc|"), F.col("doc_id"))), 1, 8), 16, 10
    ).cast("long")

    def assign(pts, hcol):
        pos = F.array(*[F.lit(p) for p, _ in pts])
        nodes = F.array(*[F.lit(n) for _, n in pts])
        idx = F.size(F.filter(pos, lambda p: p < hcol)) % F.lit(len(pts))
        return F.element_at(nodes, idx + 1)

    a = d.select(
        "doc_id",
        assign(r8, hv).alias("shard_before"),
        assign(r9, hv).alias("shard_after"),
    )
    return (
        a.groupBy("shard_before", "shard_after")
        .agg(F.count("*").alias("n_docs"))
        .select(
            "shard_before",
            "shard_after",
            "n_docs",
            (F.col("shard_before") != F.col("shard_after")).alias("moved"),
        )
        .orderBy("shard_before", "shard_after")
    )


# ---------------------------------------------------------------------------
# q306: corpus pipeline v3 -- the round-7 stages composed in production order
# ---------------------------------------------------------------------------

_V3_JACCARD_T = 0.7


def _q306_oracle_sql() -> str:
    from .wave18 import _QCLS_BUCKETS, _qcls_weights

    w = _qcls_weights()
    values = ", ".join(f"({b}, {w[b]!r})" for b in range(_QCLS_BUCKETS))
    return f"""
    WITH weights(bucket, w) AS (VALUES {values}),
    base AS (
        SELECT doc_id, source, text FROM documents WHERE length(text) > 0),
    scored AS (
        SELECT t.doc_id, AVG(w.w) AS score
        FROM (SELECT doc_id,
                     CAST(md5_number_lower(unnest(string_split(text, ' ')))
                          % {_QCLS_BUCKETS} AS BIGINT) AS bucket
              FROM base) t
        JOIN weights w ON t.bucket = w.bucket
        GROUP BY t.doc_id),
    qual AS (
        SELECT b.doc_id, b.source, b.text FROM base b
        JOIN scored s ON s.doc_id = b.doc_id
        WHERE round(s.score, 9) >= 0 AND b.doc_id % 97 <> 0),
    evg AS (
        SELECT DISTINCT unnest(list_distinct(
                   [array_to_string(toks[i:i+3], ' ')
                    FOR i IN range(1, greatest(len(toks)-3, 1) + 1)])) AS gram
        FROM (SELECT string_split(text, ' ') AS toks FROM documents
              WHERE doc_id % 97 = 0)),
    contaminated AS (
        SELECT DISTINCT g.doc_id FROM (
            SELECT doc_id,
                   unnest(list_distinct(
                       [array_to_string(toks[i:i+3], ' ')
                        FOR i IN range(1, greatest(len(toks)-3, 1) + 1)])) AS gram
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM qual)) g
        JOIN evg USING (gram)),
    clean AS (
        SELECT q.* FROM qual q ANTI JOIN contaminated c ON q.doc_id = c.doc_id),
    sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ')
                              FOR i IN range(1, len(toks)-1)]) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM clean)),
    tok AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
    sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
    pairs AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
        FROM tok a JOIN tok b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    dropped AS (
        SELECT DISTINCT d2 AS doc_id
        FROM pairs JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_V3_JACCARD_T}),
    final AS (SELECT c.* FROM clean c ANTI JOIN dropped d ON c.doc_id = d.doc_id)
    SELECT b.source,
           CAST(COUNT(*) AS BIGINT) AS n_input,
           CAST(COUNT(q.doc_id) AS BIGINT) AS n_quality,
           CAST(COUNT(c.doc_id) AS BIGINT) AS n_decontaminated,
           CAST(COUNT(f.doc_id) AS BIGINT) AS n_final,
           CAST(COALESCE(SUM(CASE WHEN f.doc_id IS NOT NULL
                    THEN len(string_split(b.text, ' ')) END), 0) AS BIGINT)
               AS tokens_final
    FROM base b
    LEFT JOIN qual q ON q.doc_id = b.doc_id
    LEFT JOIN clean c ON c.doc_id = b.doc_id
    LEFT JOIN final f ON f.doc_id = b.doc_id
    GROUP BY b.source
    ORDER BY b.source
    """


@register(
    "q306_corpus_pipeline_v3",
    sql=_q306_oracle_sql(),
    doc="Corpus-preparation pipeline v3 (capstone composing the ROUND-7 "
    "stages in production order): hashing-trick classifier gate (q299, "
    "keep score >= 0) -> Bloom-prefiltered benchmark decontamination "
    "(q302, drop any eval 4-gram overlap; eval docs themselves excluded) "
    "-> MinHash-LSH near-dup dedup at exact-Jaccard >= 0.7 dropping the "
    "higher-id member of each pair (q52's verify-on-candidates) -> "
    "per-source funnel with surviving token mass.  One oracle over the "
    "whole chain proves the COMPOSITION, not just the stages (the q200 "
    "discipline, rebuilt from this round's operators).  Stage order is "
    "the scale optimization: the cheap codegen classifier gate runs "
    "first, the Bloom probe touches only quality survivors, and the "
    "LSH shuffle sees only clean docs.  Funnel counts come from ONE "
    "left-join rollup so every stage's survivor set is observable -- "
    "the per-stage accounting a 100 TB curation run reports.",
)
def q306_corpus_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import md5_mod, minhash_lsh_pairs
    from .wave18 import _QCLS_BUCKETS, _qcls_weights

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    base = d.select("doc_id", "source", "text")

    # Stage 1: classifier gate (q299's broadcast-weights inference).
    wts = _qcls_weights()
    weights = spark.createDataFrame(
        [(b, wts[b]) for b in range(_QCLS_BUCKETS)], "bucket long, w double"
    )
    scored = (
        base.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .select("doc_id", md5_mod(F.col("token"), _QCLS_BUCKETS).alias("bucket"))
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.avg("w").alias("score"))
    )
    # Each stage's survivor frame feeds multiple downstream consumers (the
    # next stage, the funnel rollup, and -- for clean -- the LSH's two
    # scans).  EAGER localCheckpoint, not lazy persist: lazy caches race
    # parallel broadcast builds (the q169 lesson) and leave the full
    # classifier lineage inlined per consumer in the plan; a production
    # curation run checkpoints between stages for exactly this reason.
    # Round BEFORE the gate threshold (the q299/_pair_cosine discipline):
    # Spark partial aggregation and DuckDB sum the token weights in
    # different orders, so an unrounded `score >= 0` can flip membership
    # for a doc whose weight sum sits exactly at the zero boundary.
    qual = (
        base.join(scored, "doc_id")
        .filter((F.round(F.col("score"), 9) >= 0) & (F.col("doc_id") % 97 != 0))
        .select("doc_id", "source", "text")
        .localCheckpoint(eager=True)
    )

    # Stage 2: Bloom-prefiltered decontamination (q302's kernel + exact
    # verify), dropping any doc sharing a 4-gram with the eval set.
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
    hashed = qual.select(
        "doc_id", F.transform(grams4, lambda g: F.xxhash64(g)).alias("ghs")
    )
    flagged = hashed.mapInPandas(_bloom_probe_kernel(bits), "doc_id long")
    ev_grams = (
        d.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(grams4).alias("gram"))
        .distinct()
    )
    confirmed = (
        qual.join(F.broadcast(flagged), "doc_id")
        .select("doc_id", F.explode(grams4).alias("gram"))
        .join(F.broadcast(ev_grams), "gram")
        .select("doc_id")
        .distinct()
    )
    clean = qual.join(confirmed, "doc_id", "anti").localCheckpoint(eager=True)

    # Stage 3: near-dup dedup among clean docs (keep-lowest-id).
    pairs = minhash_lsh_pairs(
        clean, "text", "doc_id", n=3, threshold=_V3_JACCARD_T
    )
    dropped = pairs.select(F.col("d2").alias("doc_id")).distinct()
    final = clean.join(dropped, "doc_id", "anti")

    # Funnel rollup: one left-join accounting pass per stage survivor set.
    q_ids = qual.select("doc_id", F.lit(1).alias("in_q"))
    c_ids = clean.select("doc_id", F.lit(1).alias("in_c"))
    f_ids = final.select("doc_id", F.lit(1).alias("in_f"))
    acct = (
        base.join(q_ids, "doc_id", "left")
        .join(c_ids, "doc_id", "left")
        .join(f_ids, "doc_id", "left")
    )
    return (
        acct.groupBy("source")
        .agg(
            F.count("*").alias("n_input"),
            F.count("in_q").alias("n_quality"),
            F.count("in_c").alias("n_decontaminated"),
            F.count("in_f").alias("n_final"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("in_f").isNotNull(), F.size(F.split("text", " "))
                    ).cast("bigint")
                ),
                F.lit(0),
            ).alias("tokens_final"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q307: Matryoshka truncation evaluation (cosine fidelity vs kept dims)
# ---------------------------------------------------------------------------

_MRL_DIMS = (8, 16, 32, 64)


def _q307_oracle_sql() -> str:
    per_dim = []
    for nd in _MRL_DIMS:
        per_dim.append(
            f"""
    SELECT {nd} AS kept_dims, s.query_id, s.neighbor_id, s.cos_full,
           ROUND(list_dot_product(q.v[1:{nd}], c.v[1:{nd}])
                 / (sqrt(list_dot_product(q.v[1:{nd}], q.v[1:{nd}]))
                    * sqrt(list_dot_product(c.v[1:{nd}], c.v[1:{nd}]))), 9)
               AS cos_trunc
    FROM s JOIN e q ON q.vec_id = s.query_id
           JOIN e c ON c.vec_id = s.neighbor_id"""
        )
    union = "\n    UNION ALL\n".join(per_dim)
    return f"""
    WITH e AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS MATERIALIZED (
        SELECT query_id, neighbor_id, cos_sim AS cos_full, rank FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND(list_dot_product(q.v, c.v)
                         / (sqrt(list_dot_product(q.v, q.v))
                            * sqrt(list_dot_product(c.v, c.v))), 9) AS cos_sim,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(q.v, c.v)
                                / (sqrt(list_dot_product(q.v, q.v))
                                   * sqrt(list_dot_product(c.v, c.v))), 9) DESC,
                                c.vec_id ASC) AS rank
            FROM (SELECT * FROM e WHERE vec_id % 50 = 0) q
            JOIN e c ON c.vec_id <> q.vec_id)
        WHERE rank <= 5)
    SELECT kept_dims,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(ABS(cos_trunc - cos_full)), 6) AS mean_abs_delta,
           ROUND(AVG(cos_trunc), 6) AS mean_cos_trunc,
           ROUND(AVG(cos_full), 6) AS mean_cos_full
    FROM ({union})
    GROUP BY kept_dims
    ORDER BY kept_dims
    """


@register(
    "q307_matryoshka_eval",
    sql=_q307_oracle_sql(),
    doc="Matryoshka/truncation evaluation: for the exact top-5 neighbor "
    "pairs of the sampled query set (q54's ground truth), re-score cosine "
    "keeping only the first 8/16/32/64 dimensions and report the fidelity "
    "profile (mean |delta| vs the full-dim score) -- the measurement that "
    "decides how many dims a cheap ANN prefilter or a truncated index "
    "keeps (MRL-style deployments).  Plan: ground truth is the broadcast-"
    "sample brute-force pass (bounded by the sample, not the corpus); the "
    "truncated re-scores touch only the sample-sized top-5 pair list "
    "joined back to the two vector rows -- per pair the four truncations "
    "are one projection of array slices, no extra scan, no shuffle beyond "
    "the 4-row rollup.  At 100 TB the eval cost is the ground-truth "
    "sample pass, identical to q297's.",
)
def q307_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import dot, panel_exact_topk

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") % 50 == 0)
    # fold_values=True: cos_full is EMITTED (averaged into the report), so
    # the kernel scores with fold-association ops + half-away rounding --
    # bit-identical to the topk_cosine JVM spelling it replaces (89.9 s
    # sf1 Spark side was the per-pair fold).
    top = panel_exact_topk(
        e, "vec_id", "v", q, "vec_id", "v", k=5, fold_values=True
    ).select("query_id", "neighbor_id", F.col("cos_sim").alias("cos_full"))
    qv = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    cv = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    # Broadcast the sample-sized pair list; the corpus vector frames stream.
    # Eager checkpoint: the four truncation branches below would otherwise
    # each inline the whole ground-truth + join subtree (4x the corpus
    # scans); the materialized frame is sample-sized (top-5 rows x two
    # 64-dim vectors).
    pairs = (
        F.broadcast(top)
        .join(qv, "query_id")
        .join(cv, "neighbor_id")
        .localCheckpoint(eager=True)
    )

    def trunc_cos(nd: int):
        a, b = F.slice("qv", 1, nd), F.slice("cv", 1, nd)
        return F.round(
            F.try_divide(dot(a, b), F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))), 9
        )

    per_dim = None
    for nd in _MRL_DIMS:
        part = pairs.select(
            F.lit(nd).alias("kept_dims"),
            "cos_full",
            trunc_cos(nd).alias("cos_trunc"),
        )
        per_dim = part if per_dim is None else per_dim.unionByName(part)
    return (
        per_dim.groupBy("kept_dims")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg(F.abs(F.col("cos_trunc") - F.col("cos_full"))), 6).alias(
                "mean_abs_delta"
            ),
            F.round(F.avg("cos_trunc"), 6).alias("mean_cos_trunc"),
            F.round(F.avg("cos_full"), 6).alias("mean_cos_full"),
        )
        .orderBy("kept_dims")
    )
