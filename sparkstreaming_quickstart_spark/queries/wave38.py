"""Wave 38 (round 10, session 2): winnowing fingerprints, dictionary
tagging, and perceptual image hashing.

- q379 winnowing fingerprint near-dup (Schleimer-Wilkerson-Aiken / MOSS):
  the rolling-hash window-min fingerprinting scheme the dedup family lacked
  -- q59 hashes whole documents, q52/q53 hash token shingles, q183/q308 take
  exact spans; winnowing gives POSITION-ROBUST local fingerprints with the
  guarantee that any >= w+k-1-char substring match shares a fingerprint.
- q380 dictionary tagging: broadcast multi-phrase dictionary scan (the
  blocklist / safety-filter / topic-tagging primitive) with exact
  non-overlapping occurrence counts, pure JVM string kernels.
- q381 image dHash near-dup: perceptual difference-hash over binary media
  payloads (decode stubbed behind fake_resize, the multimodal honesty gate),
  Hamming-banded exactly like SimHash -- the image sibling of q53.
- q382 near-dup-cluster-aware train/val/test split: q288's leakage-free
  split discipline lifted from exact-dup groups to MinHash-LSH connected
  components, with the leaked-pair count value-pinned to zero.
- q383 Aho-Corasick automaton scan: q380's promised large-dictionary scale
  path, one pass per doc through a failure-link automaton (operators/
  text_scan.py), value-locked to q380's output through the same oracle.
- q384 quality-filter attribution: per-rule kill counts with UNIQUE-failure
  attribution and the union row -- the rule-redundancy report a curation
  team reads before dropping a filter.
- q385 partition-pruned IVF probe: embeddings written once as cell=<c>/
  hive partitions (seeded-centroid cells); a probe batch's top-nprobe cell
  list becomes a PartitionFilter, completing the storage-layout family's
  vector-index-as-table member.

Reference parity note: the reference computes none of this (its single
pipeline is Kafka->println, Processor.java:118-139); these are engine-surface
operators in the charter's LLM-data-pipeline families, value-oracled like the
rest of the registry.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q379: winnowing fingerprint near-dup (MOSS)
# ---------------------------------------------------------------------------

_WIN_K = 8  # k-gram length (chars, normalized text)
_WIN_W = 16  # window width (grams); guarantee threshold = w + k - 1 = 23
_WIN_CAP = 64  # posting-list cap: fingerprints in more docs carry no signal
_WIN_MIN_SHARED = 8  # pair report threshold (shared distinct fingerprints)
_WIN_POS_BITS = 20

_WINNOW_ORACLE = f"""
    WITH nrm AS (
        SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
        FROM documents),
    g AS (
        SELECT doc_id, u.i AS pos,
               CAST('0x' || substr(md5(substr(t, u.i, {_WIN_K})), 1, 10) AS BIGINT) AS h,
               length(t) - {_WIN_K - 1} AS ng
        FROM nrm, UNNEST(range(1, length(t) - {_WIN_K - 2})) AS u(i)
        WHERE length(t) >= {_WIN_K + _WIN_W - 1}),
    k AS (
        SELECT doc_id, pos, ng,
               MIN((h << {_WIN_POS_BITS}) + ({(1 << _WIN_POS_BITS) - 1} - pos)) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS sk
        FROM g),
    fp AS (
        SELECT DISTINCT doc_id, sk >> {_WIN_POS_BITS} AS h
        FROM k WHERE pos <= ng - {_WIN_W - 1}),
    nf AS (SELECT doc_id, COUNT(*) AS nf FROM fp GROUP BY 1),
    kept AS (SELECT h FROM fp GROUP BY h HAVING COUNT(*) BETWEEN 2 AND {_WIN_CAP}),
    pairs AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_shared
        FROM fp a JOIN kept USING (h) JOIN fp b USING (h)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT d1, d2, CAST(n_shared AS BIGINT) AS n_shared,
           ROUND(CAST(n_shared AS DOUBLE) / LEAST(x.nf, y.nf), 6) AS overlap
    FROM pairs JOIN nf x ON d1 = x.doc_id JOIN nf y ON d2 = y.doc_id
    WHERE n_shared >= {_WIN_MIN_SHARED}
    ORDER BY d1, d2
    """


@register(
    "q379_winnowing_neardup",
    sql=_WINNOW_ORACLE,
    doc=f"Winnowing fingerprint near-dup pairs (Schleimer-Wilkerson-Aiken, "
    f"the MOSS scheme): {_WIN_K}-char gram rolling hashes, window of "
    f"{_WIN_W} grams, per window the RIGHTMOST MINIMAL hash is selected "
    "(robust winnowing) -- the theorem guarantees any substring match of "
    f">= w+k-1 = {_WIN_K + _WIN_W - 1} chars shares a fingerprint while "
    "keeping only ~2/(w+1) of grams, which is why it is the standard "
    "plagiarism / code-corpus dedup fingerprint (the family member q59 "
    "whole-doc hashes, q52 token-shingle MinHash and q183 exact spans "
    "don't cover: position-robust LOCAL fingerprints with a detection "
    "guarantee).  The argmin-with-rightmost-tiebreak is ONE windowed MIN "
    f"over the packed key h << {_WIN_POS_BITS} | (2^{_WIN_POS_BITS}-1 - "
    "pos) -- identical integer arithmetic in both engines, no second "
    "pass.  Matching mirrors q52's bucket discipline: posting lists "
    f"capped at {_WIN_CAP} docs (ubiquitous fingerprints carry no dedup "
    f"signal -- the df-prune argument), pairs sharing >= {_WIN_MIN_SHARED} "
    "distinct fingerprints reported with overlap = n_shared / "
    "min(|fp(d1)|, |fp(d2)|).  Plan: gram explode is linear "
    "partition-preserving (q183's span class), the window is "
    "per-document, the pair join is posting-list-bounded (<= C(cap,2) "
    "rows per fingerprint) -- no all-pairs step anywhere, scales like "
    "q52.  On the driver fixture the top pairs are exactly the planted "
    "near-copies (3-shingle Jaccard ~0.99).",
)
def q379_winnowing_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import winnow_fingerprints

    d = load_table(spark, sf_dir, "documents")
    # Round-13 optimization (guide §2.4/§2.3): the old spelling consumed the
    # fingerprint subtree (gram explode + rolling window + distinct) FOUR
    # times -- nf, the df-filter, and both sides of the posting self-join --
    # and Spark re-executes a non-materialized subtree per consumer.  The
    # fingerprint set is the small decide-with table (≈2/(w+1) of grams),
    # so it is eagerly checkpointed once; the pair count then comes from ONE
    # posting-list groupBy (the q51 hashed-posting discipline) instead of a
    # self-join: each kept fingerprint's sorted member list expands its
    # (d1 < d2) triangle in place, and n_shared = pairs per (d1, d2) --
    # identical to the join+filter+count (fp is distinct per (doc, h), so
    # each h contributes each pair at most once).  Old-vs-new value pin in
    # tests/test_wave44.py.
    fp = (
        winnow_fingerprints(d, "text", "doc_id", _WIN_K, _WIN_W)
        .select(F.col("id").alias("doc_id"), "h")
        .distinct()
        .localCheckpoint(eager=True)
    )
    nf = fp.groupBy("doc_id").agg(F.count("*").alias("nf"))
    posts = (
        fp.groupBy("h")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= _WIN_CAP))
    )
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + F.lit(2), F.size("ids")),
                lambda y: F.struct(x.alias("d1"), y.alias("d2")),
            ),
        )
    )
    pairs = (
        posts.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.d1").alias("d1"), F.col("p.d2").alias("d2"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= _WIN_MIN_SHARED)
    )
    n1 = nf.select(F.col("doc_id").alias("d1"), F.col("nf").alias("nf1"))
    n2 = nf.select(F.col("doc_id").alias("d2"), F.col("nf").alias("nf2"))
    return (
        pairs.join(n1, "d1")
        .join(n2, "d2")
        .select(
            "d1",
            "d2",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double") / F.least("nf1", "nf2"), 6
            ).alias("overlap"),
        )
        .orderBy("d1", "d2")
    )


# ---------------------------------------------------------------------------
# q380: dictionary tagging (broadcast multi-phrase scan)
# ---------------------------------------------------------------------------

# (term, category): mixed single-word / multi-word phrases, two deliberately
# absent from the fixture vocabulary so zero-hit terms stay in the output.
_DICT: list[tuple[str, str]] = [
    ("window", "ops"),
    ("table scan", "ops"),
    ("hash join", "ops"),
    ("merge sort", "ops"),
    ("stream", "ops"),
    ("slow query", "flag"),
    ("gpu kernel", "absent"),
    ("tensor core", "absent"),
]

_DICT_VALUES = ", ".join(f"('{t}', '{c}')" for t, c in _DICT)


@register(
    "q380_dictionary_tagging",
    sql=f"""
    WITH dict(term, category) AS (VALUES {_DICT_VALUES}),
    m AS (
        SELECT d.term, d.category,
               (length(doc.text) - length(replace(doc.text, d.term, '')))
                 // length(d.term) AS occ
        FROM documents doc CROSS JOIN dict d)
    SELECT term, category,
           CAST(COUNT(*) FILTER (WHERE occ > 0) AS BIGINT) AS n_docs,
           CAST(SUM(occ) AS BIGINT) AS total_occ,
           CAST(MAX(occ) AS BIGINT) AS max_occ
    FROM m GROUP BY 1, 2 ORDER BY term
    """,
    doc=f"Dictionary tagging / blocklist scan: every document is scanned for "
    f"a broadcast {len(_DICT)}-phrase dictionary (single- and multi-word "
    "terms, two deliberately vocabulary-absent so zero-hit terms are "
    "value-checked too), reporting per term the documents matched, total "
    "occurrences and the hottest document -- the safety-filter / "
    "topic-tag / contamination-phrase primitive every curation pipeline "
    "runs.  Occurrence counting is the exact non-overlapping "
    "left-to-right count (str.count semantics) via the replace-diff "
    "identity (length(text) - length(replace(text, term))) / "
    "length(term) -- a pure JVM codegen expression, no regex engine and "
    "no Python.  Plan: docs CROSS JOIN broadcast(dict) is map-side only "
    "(|dict| rows per doc, zero shuffle until the |dict|-group agg); at "
    "100 TB with dictionaries beyond a few hundred terms the same scan "
    "becomes one pass per doc through a broadcast Aho-Corasick automaton "
    "in an Arrow kernel -- the per-term replace-diff is the "
    "codegen-friendly spelling for bounded dictionaries.",
)
def q380_dictionary_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    dict_df = spark.createDataFrame(_DICT, "term string, category string")
    occ = F.expr("(length(text) - length(replace(text, term, ''))) DIV length(term)")
    return (
        d.crossJoin(F.broadcast(dict_df))
        .select("term", "category", occ.alias("occ"))
        .groupBy("term", "category")
        .agg(
            F.count_if(F.col("occ") > 0).alias("n_docs"),
            F.sum("occ").cast("bigint").alias("total_occ"),
            F.max("occ").cast("bigint").alias("max_occ"),
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# q381: perceptual image dHash near-dup (Hamming-banded)
# ---------------------------------------------------------------------------

_DH_CAP = 256  # hot-bucket cap, q52's rule
_DH_MAX_HAM = 3  # report pairs within Hamming distance 3 (of 64 bits)


@register(
    "q381_image_dhash_neardup",
    sql=f"""
    WITH px AS (
        SELECT doc_id,
               list_transform(range(0, 72),
                 j -> CASE WHEN j < length(text)
                           THEN ascii(substr(text, j + 1, 1)) ELSE 0 END) AS p
        FROM documents),
    bits AS (
        SELECT doc_id,
               list_transform(range(0, 64),
                 k -> CASE WHEN p[(k // 8) * 9 + (k % 8) + 1]
                              < p[(k // 8) * 9 + (k % 8) + 2]
                           THEN 1 ELSE 0 END) AS b
        FROM px),
    bands AS (
        SELECT doc_id,
               list_transform(range(0, 4),
                 bb -> list_sum(list_transform(range(0, 16),
                        r -> b[bb * 16 + r + 1] * (1 << r)))) AS bd
        FROM bits),
    bexp AS (
        SELECT doc_id, u.band, bd[u.band + 1] AS key
        FROM bands, UNNEST(range(0, 4)) AS u(band)),
    hot AS (SELECT band, key FROM bexp GROUP BY 1, 2
            HAVING COUNT(*) BETWEEN 2 AND {_DH_CAP}),
    cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM bexp a JOIN hot USING (band, key)
        JOIN bexp b ON b.band = a.band AND b.key = a.key
                   AND a.doc_id < b.doc_id),
    ham AS (
        SELECT d1, d2,
               list_sum(list_transform(range(0, 4),
                 i -> bit_count(xor(x.bd[i + 1], y.bd[i + 1])))) AS hd
        FROM cand JOIN bands x ON x.doc_id = d1 JOIN bands y ON y.doc_id = d2)
    SELECT d1, d2, CAST(hd AS INT) AS hamming
    FROM ham WHERE hd <= {_DH_MAX_HAM}
    ORDER BY d1, d2
    """,
    doc="Perceptual image near-dup via dHash (difference hash): 64 "
    "horizontal-gradient sign bits over a 9x8 grayscale grid, packed as "
    "four 16-bit bands, band-equality bucket join for candidates "
    "(pigeonhole: Hamming <= 3 over 4 bands forces >= 1 equal band -- "
    "SimHash q53's argument, here on media), exact Hamming verify via "
    "bit_count(xor), hot buckets capped at "
    f"{_DH_CAP} (q52's rule, mirrored by the oracle).  The decode+"
    "resample step is the multimodal family's honest stub (fake_resize: "
    "first 72 payload bytes -- a real codec replaces ONLY that function; "
    "operators/multimodal.py:27), so 'pixels' here are text bytes and "
    "the oracle replays them with ascii() -- exact because the fixture "
    "corpus is pure ASCII (verified: 0 non-ASCII chars at every SF).  "
    "The hash kernel is one vectorized numpy pass per Arrow batch "
    "(mapInPandas, payloads never leave the executor); everything after "
    "the 4-int hash rows is plain relational -- at 100 TB the binary "
    "corpus collapses to 32 bytes/image before any shuffle, the exact "
    "reason dHash is the standard first-pass image dedup.",
)
def q381_image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import dhash_bands, with_binary_payload

    d = load_table(spark, sf_dir, "documents")
    bands = dhash_bands(with_binary_payload(d, "text")).persist()
    bexp = bands.select(
        "doc_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band", "key"),
    )
    hot = (
        bexp.groupBy("band", "key")
        .agg(F.count("*").alias("c"))
        .filter((F.col("c") >= 2) & (F.col("c") <= _DH_CAP))
        .select("band", "key")
    )
    bk = bexp.join(hot, ["band", "key"])
    cand = (
        bk.select(F.col("doc_id").alias("d1"), "band", "key")
        .join(bk.select(F.col("doc_id").alias("d2"), "band", "key"), ["band", "key"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    x = bands.select(
        F.col("doc_id").alias("d1"),
        *[F.col(f"b{i}").alias(f"x{i}") for i in range(4)],
    )
    y = bands.select(
        F.col("doc_id").alias("d2"),
        *[F.col(f"b{i}").alias(f"y{i}") for i in range(4)],
    )
    hd = sum(
        F.bit_count(F.col(f"x{i}").bitwiseXOR(F.col(f"y{i}"))) for i in range(4)
    )
    return (
        cand.join(x, "d1")
        .join(y, "d2")
        .select("d1", "d2", hd.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= _DH_MAX_HAM)
        .orderBy("d1", "d2")
    )


# ---------------------------------------------------------------------------
# q382: near-dup-cluster-aware train/val/test split (leakage-free by design)
# ---------------------------------------------------------------------------

_NDS_T = 0.7  # near-dup threshold (q52's parameters throughout)
_NDS_SALT = "ndsplit|"

_NDS_BUCKET = "CAST('0x' || substr(md5('" + _NDS_SALT + "' || {key}), 1, 8) AS BIGINT) % 100"


def _nds_split_case(key: str) -> str:
    b = _NDS_BUCKET.format(key=key)
    return (
        f"CASE WHEN {b} < 90 THEN 'train' WHEN {b} < 95 THEN 'val' "
        "ELSE 'test' END"
    )


_NDS_ORACLE = f"""
    WITH RECURSIVE
    docs AS MATERIALIZED (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks)-1)]) AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
    tok AS MATERIALIZED (SELECT doc_id, unnest(sh) AS shingle FROM docs),
    sizes AS MATERIALIZED (SELECT doc_id, len(sh) AS n FROM docs),
    -- BLOCKED exact-Jaccard pair stream (q329's remedy): each UNION ALL
    -- branch joins the full token index against ONE mod-class of d2 and
    -- applies the threshold INSIDE the branch, so DuckDB's peak is one
    -- block's pair hash table instead of the corpus-quadratic
    -- shared-a-shingle pair set (the monolithic form grew past ~96 GB RSS
    -- at sf10 and was stopped; SCALING.md).  The union is exactly the
    -- all-pairs result: blocks partition pairs by d2 % 16.
    cpairs AS (
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 0
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 1
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 2
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 3
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 4
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 5
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 6
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 7
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 8
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 9
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 10
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 11
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 12
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 13
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 14
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}
        UNION ALL
        SELECT d1, d2 FROM (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
            FROM tok a JOIN tok b ON a.shingle = b.shingle
                 AND a.doc_id < b.doc_id AND b.doc_id % 16 = 15
            GROUP BY 1, 2) p
        JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) >= {_NDS_T}),
    edges AS MATERIALIZED (
        SELECT d1 AS u, d2 AS v FROM cpairs UNION ALL SELECT d2, d1 FROM cpairs),
    cc(node, label) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.v, cc.label FROM cc JOIN edges e ON cc.node = e.u),
    clusters AS (SELECT node AS doc_id, MIN(label) AS cid FROM cc GROUP BY node),
    assigned AS (
        SELECT d.doc_id,
               COALESCE(c.cid, d.doc_id) AS cluster_id,
               {_nds_split_case("d.doc_id")} AS naive_split,
               {_nds_split_case("COALESCE(c.cid, d.doc_id)")} AS safe_split
        FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id),
    schemes AS (
        SELECT 'naive' AS scheme, doc_id, cluster_id, naive_split AS split
        FROM assigned
        UNION ALL
        SELECT 'cluster_safe', doc_id, cluster_id, safe_split FROM assigned),
    leaks AS (
        SELECT s1.scheme, COUNT(*) AS leaked_pairs
        FROM cpairs p
        JOIN schemes s1 ON s1.doc_id = p.d1
        JOIN schemes s2 ON s2.doc_id = p.d2 AND s2.scheme = s1.scheme
        WHERE s1.split <> s2.split
        GROUP BY 1)
    SELECT s.scheme,
           CAST(COUNT(*) FILTER (WHERE split = 'train') AS BIGINT) AS n_train,
           CAST(COUNT(*) FILTER (WHERE split = 'val') AS BIGINT) AS n_val,
           CAST(COUNT(*) FILTER (WHERE split = 'test') AS BIGINT) AS n_test,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           CAST(COALESCE(MAX(l.leaked_pairs), 0) AS BIGINT) AS leaked_pairs
    FROM schemes s LEFT JOIN leaks l ON l.scheme = s.scheme
    GROUP BY s.scheme
    ORDER BY s.scheme
    """


@register(
    "q382_neardup_safe_split",
    sql=_NDS_ORACLE,
    doc="NEAR-dup-cluster-aware train/val/test split -- the decontaminated-"
    "split primitive: q288 proved the discipline for EXACT-dup groups; "
    "real leakage rides on near-duplicates, so here the grouping is "
    "connected components over the MinHash-LSH pair graph (q52's "
    "parameters, q89's clustering).  Each doc is assigned train/val/test "
    "(90/5/5) two ways: hashing its own id (naive) vs hashing its "
    "cluster representative (min reachable doc_id; singletons hash "
    "themselves -- identical buckets to naive, so the schemes differ "
    "ONLY on near-dup members).  The report counts docs per split, "
    "clusters touched, and LEAKED PAIRS: near-dup pairs straddling two "
    "splits.  cluster_safe is leakage-free BY CONSTRUCTION (both "
    "endpoints hash the same representative), and the oracle value-"
    "proves that 0 -- while the naive row quantifies the contamination "
    "a per-doc split ships (nonzero on the fixture's planted dups).  "
    "Assignment is the q208 stable-bucket contract (md5(salt || key) % "
    "100): pure function of (salt, key) -- stable under reruns, "
    "repartitioning and corpus growth.  Plan: the pair stream and CC "
    "iterations are q52/q89's (bucketed LSH, min-label propagation); "
    "assignment is one broadcast-free projection; leak audit joins the "
    "pair stream to the assignment twice on doc_id.  At 100 TB every "
    "stage is the already-proven scale path plus hash-partitioned "
    "equi-joins -- no new shuffle class.  AMPLIFICATION CAVEAT (round-10 "
    "advice): the Spark side's candidate pairs are MinHash-LSH "
    "(probabilistic recall; bucket_cap drops hot buckets) while the "
    "oracle computes exact all-pairs Jaccard, and here a single missed "
    "pair does not stay local -- it can merge/split a connected "
    "component, relabel every member's representative, and move whole "
    "clusters across splits, so q52's accepted 'negligible miss' "
    "assumption is amplified cluster-wide.  The fixtures' planted dup "
    "families are well inside the 24x4 banding's recall plateau (proven "
    "by ten rounds of green value hashes at sf0.001-sf1); a parameter "
    "change that weakens recall (fewer bands, smaller cap) would surface "
    "here FIRST, as a value mismatch rather than a silent quality drop "
    "-- which is the desired failure mode for a verification harness.",
)
def q382_neardup_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components, md5_bucket, minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", n=3, threshold=_NDS_T).select(
        "d1", "d2"
    )
    clusters = connected_components(pairs)
    assigned = (
        d.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    )

    def split_of(col):
        b = md5_bucket(col, _NDS_SALT, 100)
        return (
            F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
        )

    schemes = assigned.select(
        "doc_id",
        "cluster_id",
        F.lit("naive").alias("scheme"),
        split_of(F.col("doc_id")).alias("split"),
    ).unionByName(
        assigned.select(
            "doc_id",
            "cluster_id",
            F.lit("cluster_safe").alias("scheme"),
            split_of(F.col("cluster_id")).alias("split"),
        )
    )
    s1 = schemes.select(
        F.col("doc_id").alias("d1"), "scheme", F.col("split").alias("split1")
    )
    s2 = schemes.select(
        F.col("doc_id").alias("d2"), "scheme", F.col("split").alias("split2")
    )
    leaks = (
        pairs.join(s1, "d1")
        .join(s2, ["d2", "scheme"])
        .filter(F.col("split1") != F.col("split2"))
        .groupBy("scheme")
        .agg(F.count("*").alias("leaked_pairs"))
    )
    return (
        schemes.groupBy("scheme")
        .agg(
            F.count_if(F.col("split") == "train").alias("n_train"),
            F.count_if(F.col("split") == "val").alias("n_val"),
            F.count_if(F.col("split") == "test").alias("n_test"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
        .join(leaks, "scheme", "left")
        .select(
            "scheme",
            "n_train",
            "n_val",
            "n_test",
            "n_clusters",
            F.coalesce(F.col("leaked_pairs"), F.lit(0)).cast("bigint").alias(
                "leaked_pairs"
            ),
        )
        .orderBy("scheme")
    )


# ---------------------------------------------------------------------------
# q383: dictionary scan via Aho-Corasick automaton (q380's promised scale path)
# ---------------------------------------------------------------------------


@register(
    "q383_dictionary_scan_automaton",
    sql=f"""
    WITH dict(term, category) AS (VALUES {_DICT_VALUES}),
    m AS (
        SELECT d.term, d.category,
               (length(doc.text) - length(replace(doc.text, d.term, '')))
                 // length(d.term) AS occ
        FROM documents doc CROSS JOIN dict d)
    SELECT term, category,
           CAST(COUNT(*) FILTER (WHERE occ > 0) AS BIGINT) AS n_docs,
           CAST(SUM(occ) AS BIGINT) AS total_occ,
           CAST(MAX(occ) AS BIGINT) AS max_occ
    FROM m GROUP BY 1, 2 ORDER BY term
    """,
    doc="Dictionary scan via a failure-link AHO-CORASICK automaton -- the "
    "scale path q380's docstring promises, implemented and value-proven "
    "against the SAME oracle (the two queries' outputs are required "
    "identical): ONE pass per document finds all occurrences of every "
    "term simultaneously, O(n_chars + matches) per doc REGARDLESS of "
    "dictionary size, where the codegen replace-diff spelling re-scans "
    "the corpus once per term.  The automaton is built once on the "
    "driver (dictionaries are small metadata) and ships to executors in "
    "the mapInPandas closure; match streams are greedily filtered to "
    "non-overlapping left-to-right occurrences per term so counts equal "
    "str.count exactly (operators/text_scan.py, fuzz-pinned vs "
    "str.count).  Long-form (doc, term, occ>0) rows aggregate per term; "
    "zero-hit terms re-enter via a broadcast right-join with the "
    "dictionary.  Crossover economics, MEASURED round 11 "
    "(tools/bench_textscan.py, SCALING.md): the JVM/per-term path wins "
    "below ~35 terms; beyond that the one-pass automaton wins and is "
    "the only shape that doesn't multiply corpus scans (real "
    "blocklists: 10k+ phrases).  Throughput is Python-compute-bound at "
    "2.4-12.3 MB/s/core depending on match density -- ~20 min for "
    "100 TB on a 1000x32-core fleet at the worst measured rate; a C "
    "automaton buys ~50x where available.  A vectorized lockstep-batch "
    "variant (AhoCorasickDense) was built, pinned, and measured: it "
    "wins only for sparse-match cache-resident dictionaries and is "
    "kept as a library alternative -- this pair registers both "
    "spellings, value-locked to each other.",
)
def q383_dictionary_scan_automaton(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_scan import dictionary_scan

    d = load_table(spark, sf_dir, "documents")
    terms = [t for t, _ in _DICT]
    scanned = dictionary_scan(d, "text", terms)
    meta = spark.createDataFrame(
        [(i, t, c) for i, (t, c) in enumerate(_DICT)],
        "term_idx int, term string, category string",
    )
    agg = scanned.groupBy("term_idx").agg(
        F.count("*").alias("n_docs"),
        F.sum("occ").alias("total_occ"),
        F.max("occ").alias("max_occ"),
    )
    return (
        F.broadcast(meta)
        .join(agg, "term_idx", "left")
        .select(
            "term",
            "category",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce(F.col("total_occ"), F.lit(0)).cast("bigint").alias("total_occ"),
            F.coalesce(F.col("max_occ"), F.lit(0)).cast("bigint").alias("max_occ"),
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# q384: quality-filter attribution (which rule kills what, uniquely or not)
# ---------------------------------------------------------------------------

# thresholds calibrated to fire differentially on the driver fixture
# (n_tok 10-99, distinct_ratio 0.28-1.0, mean word length 3.7-5.3)
_FA_SHORT_TOK = 20
_FA_DISTINCT = 0.35
_FA_WLEN = 5.0
_FA_FLAG = "slow query"


@register(
    "q384_filter_attribution",
    sql=f"""
    WITH t AS (
        SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
    r AS (
        SELECT doc_id,
               CAST(len(toks) < {_FA_SHORT_TOK} AS INT) AS r_short,
               CAST(len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
                    < {_FA_DISTINCT} AS INT) AS r_repetitive,
               CAST(list_sum(list_transform(toks, x -> length(x)))
                    / CAST(len(toks) AS DOUBLE) > {_FA_WLEN} AS INT) AS r_long_words,
               CAST(text LIKE '%{_FA_FLAG}%' AS INT) AS r_flagged
        FROM t),
    f AS (
        SELECT doc_id, r_short, r_repetitive, r_long_words, r_flagged,
               r_short + r_repetitive + r_long_words + r_flagged AS n_rules
        FROM r),
    long AS (
        SELECT 'r_short' AS rule, r_short AS failed, n_rules FROM f
        UNION ALL SELECT 'r_repetitive', r_repetitive, n_rules FROM f
        UNION ALL SELECT 'r_long_words', r_long_words, n_rules FROM f
        UNION ALL SELECT 'r_flagged', r_flagged, n_rules FROM f)
    SELECT rule,
           CAST(SUM(failed) AS BIGINT) AS n_failed,
           CAST(SUM(CASE WHEN failed = 1 AND n_rules = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unique
    FROM long GROUP BY rule
    UNION ALL
    SELECT '__any__',
           CAST(SUM(CASE WHEN n_rules > 0 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN n_rules = 1 THEN 1 ELSE 0 END) AS BIGINT)
    FROM f
    ORDER BY rule
    """,
    doc="Quality-filter ATTRIBUTION report -- not whether docs fail (q184's "
    "Gopher rules do that) but WHICH rule kills what and whether rules "
    "are redundant: per rule, total failures and UNIQUE failures (docs no "
    "other rule catches), plus an __any__ row (union kill count; docs "
    "killed by exactly one rule).  This is the report a curation team "
    "reads before dropping a rule: a rule with n_unique = 0 is fully "
    "shadowed; the gap between SUM(n_failed) and __any__.n_failed is the "
    "overlap.  Four rules fire differentially on the fixture: token "
    f"count < {_FA_SHORT_TOK}, distinct-token ratio < {_FA_DISTINCT} "
    f"(repetition), mean word length > {_FA_WLEN} (computed as exact "
    "integer char-sum / count so both engines divide the same integers), "
    f"and the '{_FA_FLAG}' blocklist phrase (q380's flag term).  Plan: "
    "one projection computes all rule booleans in a single pass "
    "(no shuffle), the attribution is a 4-way stack + one small agg -- "
    "at 100 TB this is a scan-bound single pass exactly like the "
    "filters themselves, so the audit is free relative to the filtering "
    "run it instruments.",
)
def q384_filter_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    char_sum = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    n_tok = F.size(toks)
    r = d.select(
        (n_tok < _FA_SHORT_TOK).cast("int").alias("r_short"),
        (
            F.size(F.array_distinct(toks)) / n_tok.cast("double") < _FA_DISTINCT
        )
        .cast("int")
        .alias("r_repetitive"),
        (char_sum / n_tok.cast("double") > _FA_WLEN).cast("int").alias("r_long_words"),
        F.col("text").contains(_FA_FLAG).cast("int").alias("r_flagged"),
    ).withColumn(
        "n_rules",
        F.col("r_short") + F.col("r_repetitive") + F.col("r_long_words") + F.col("r_flagged"),
    )
    long = r.select(
        F.explode(
            F.map_from_arrays(
                F.array(
                    F.lit("r_short"),
                    F.lit("r_repetitive"),
                    F.lit("r_long_words"),
                    F.lit("r_flagged"),
                ),
                F.array("r_short", "r_repetitive", "r_long_words", "r_flagged"),
            )
        ).alias("rule", "failed"),
        "n_rules",
    )
    per_rule = long.groupBy("rule").agg(
        F.sum("failed").cast("bigint").alias("n_failed"),
        F.sum(
            F.when((F.col("failed") == 1) & (F.col("n_rules") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_unique"),
    )
    any_row = r.agg(
        F.count_if(F.col("n_rules") > 0).alias("n_failed"),
        F.count_if(F.col("n_rules") == 1).alias("n_unique"),
    ).select(F.lit("__any__").alias("rule"), "n_failed", "n_unique")
    return per_rule.unionByName(any_row).orderBy("rule")


# ---------------------------------------------------------------------------
# q385: partition-pruned IVF probe (the vector-index-as-table layout)
# ---------------------------------------------------------------------------

_IVF_DIM = 64
_IVF_NPROBE = 2
_IVF_K = 3
_IVF_QMOD = 199  # probe queries: vec_id % 199 == 0


def _ivf_layout(spark: SparkSession, sf_dir: str):
    """(layout_dir, nlist, centroid_matrix) for the ADAPTIVE IVF index over
    this corpus: nlist = max(16, 2^floor(log2(n)/2)) ~ sqrt(n) (round-12 --
    a fixed 16 meant one cell grew linearly with the corpus) and the
    formula centroids of operators.similarity.adaptive_centroids, so the
    same layout family runs 16 cells at n=500 and 256 at n=200k."""
    from ..operators.similarity import adaptive_centroids, nlist_for

    n = load_table(spark, sf_dir, "embeddings").count()
    nlist = nlist_for(n)
    return _ivf_partitioned_dir(spark, sf_dir), nlist, adaptive_centroids(
        _IVF_DIM, nlist
    )


def _ivf_partitioned_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write embeddings once as cell=<c>/ hive partitions (cell = the shared
    adaptive-quantizer argmax), content-keyed like q374's staging."""
    import hashlib as _h
    import tempfile

    from ..operators.similarity import (
        adaptive_centroids,
        assign_cells_arrow,
        nlist_for,
    )

    nlist = nlist_for(load_table(spark, sf_dir, "embeddings").count())
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    key = _h.md5(
        f"{sf_dir}|ivfa{nlist}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"ssq-emb-ivf-{key}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        W = adaptive_centroids(_IVF_DIM, nlist)
        # Write to a unique staging dir, then atomically rename into place
        # (round-10 advice: mode='overwrite' straight onto `out` deletes the
        # directory first, so a concurrent process mid-scan would read a
        # half-written layout).  The key is content-derived, so whichever
        # process wins the rename produced identical bytes; the loser just
        # discards its staging copy.
        e = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
        )
        stage = f"{out}.stage-{os.getpid()}"
        assign_cells_arrow(e, "v", W).write.partitionBy("cell").mode(
            "overwrite"
        ).parquet(stage)
        try:
            os.rename(stage, out)
        except OSError:
            import shutil

            shutil.rmtree(stage, ignore_errors=True)
            # rename also fails when `out` exists as a STALE layout without
            # _SUCCESS (e.g. an interrupted pre-staging overwrite run), not
            # only when a concurrent winner installed an identical copy --
            # returning that broken directory unverified would feed a
            # half-written index to the caller (round-11 advice).
            if not os.path.exists(os.path.join(out, "_SUCCESS")):
                raise RuntimeError(
                    f"IVF layout install failed and {out} has no _SUCCESS "
                    "marker: remove the stale directory and retry"
                )
    return out


def _sql_ivf_probe_ctes() -> str:
    """Shared q385/q387 oracle CTEs: adaptive quantizer (nl + cents), the
    corpus cell assignment, the probe batch, and its top-nprobe cell
    ranking (round-9 score, smallest-j tie-break -- the exact mirror of
    probe_cells_arrow)."""
    from ..operators.similarity import (
        sql_adaptive_cell_cte,
        sql_adaptive_quantizer_ctes,
    )

    cells = sql_adaptive_cell_cte(
        "e", "vec_id, v", dim=_IVF_DIM, materialized=True
    ).replace("cells AS", "corpus AS", 1)
    return f"""{sql_adaptive_quantizer_ctes(_IVF_DIM, src="e")},
    {cells},
    q AS (SELECT vec_id AS query_id, v AS qv
          FROM e WHERE vec_id % {_IVF_QMOD} = 0),
    probes AS (
        SELECT query_id, qv, cell FROM (
            SELECT q.query_id, q.qv, c.j AS cell,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                       ORDER BY ROUND(array_inner_product(q.qv,
                           CAST(c.w AS DOUBLE[{_IVF_DIM}])), 9)
                                DESC, c.j) AS rk
            FROM q CROSS JOIN cents c) WHERE rk <= {_IVF_NPROBE})"""


def _q385_oracle() -> str:
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[64]) AS v FROM embeddings),
    {_sql_ivf_probe_ctes()},
    cand AS (
        SELECT p.query_id, c.vec_id AS neighbor_id,
               array_inner_product(p.qv, c.v)
                 / (sqrt(array_inner_product(p.qv, p.qv))
                    * sqrt(array_inner_product(c.v, c.v))) AS cos
        FROM probes p JOIN corpus c ON c.cell = p.cell
        WHERE c.vec_id <> p.query_id),
    ranked AS (
        SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY ROUND(cos, 9) DESC, neighbor_id) AS rank
        FROM cand)
    SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
           ROUND(cos, 6) AS cos_sim
    FROM ranked WHERE rank <= {_IVF_K}
    ORDER BY query_id, rank
    """


@register(
    "q385_ivf_partition_pruned_probe",
    sql=_q385_oracle(),
    doc=f"Partition-pruned IVF probe -- the VECTOR-INDEX-AS-TABLE layout "
    "that completes the storage family (q373 bucketed join, q374 "
    "partitioned scan, now the ANN shard): embeddings are written ONCE "
    "as cell=<c>/ hive partitions (ADAPTIVE nlist ~ sqrt(n) cells, "
    "round-12: the count rule + formula centroids shared with q386, so "
    "the layout holds ~sqrt(n)-row shards at every decade instead of "
    "corpus/16), and a probe batch "
    f"(vec_id % {_IVF_QMOD} = 0) reads ONLY its top-{_IVF_NPROBE} "
    "centroid cells: the probed-cell set (bounded driver state, <= "
    "nlist ints -- the probe list a FAISS-style index hands the "
    "scanner) becomes a PartitionFilter, so the scan never lists the "
    "other shards -- at 100 TB with thousands of cells this is the "
    "difference between touching 1/nprobe-th of the corpus and all of "
    "it, decided by directory listing alone.  Exact cosine within the "
    "probed cells, per-query top-"
    f"{_IVF_K} under the q329 rank-before-round discipline (rank on "
    "ROUND(cos,9) with neighbor tie-break, output ROUND 6).  The oracle "
    "replays centroid literals, probe ranking, and the cell-restricted "
    "exact search -- the seeded-restriction contract with the "
    "restriction value-proven.  Plan-pinned: the layout scan's "
    "PartitionFilters carry the cell IN (...) predicate with no data "
    "filter on the partition column.",
)
def q385_ivf_partition_pruned_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.similarity import dot, probe_cells_arrow

    part_dir, _nlist, W = _ivf_layout(spark, sf_dir)

    q = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % _IVF_QMOD == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
        )
    )
    probes = probe_cells_arrow(q, "qv", W, _IVF_NPROBE)
    # the probe list is bounded driver state (<= n_cells ints), exactly what
    # an ANN index hands the storage layer; it becomes a static partition
    # filter so pruning happens at directory-listing time.
    probed_cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    corpus = spark.read.parquet(part_dir).filter(F.col("cell").isin(probed_cells))
    cand = (
        probes.join(corpus, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot(F.col("qv"), F.col("v"))
                / (
                    F.sqrt(dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(dot(F.col("v"), F.col("v")))
                )
            ).alias("cos"),
        )
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos"), 9).desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= _IVF_K)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            F.round("cos", 6).alias("cos_sim"),
        )
        .orderBy("query_id", "rank")
    )
