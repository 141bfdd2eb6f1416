"""Deduplication operators for training-data pipelines.

Four tiers, all pure DataFrame compositions (no Python in the hot path):

  * exact_dedup        -- md5(normalized text) group-pick-one.  One shuffle.
  * ngram_jaccard_pairs -- exact n-word-shingle Jaccard via inverted-index
                          self-join.  Quadratic in the worst case; used as the
                          verifier on LSH candidates and as the oracle-exact
                          formulation at test scale.
  * minhash_lsh_pairs  -- MinHash signatures + banded LSH join.  The 100 TB
                          path: candidate generation cost is O(docs x bands),
                          the exact-Jaccard verify runs only on candidates.
  * simhash_pairs      -- 64-bit SimHash fingerprints + block banding for
                          Hamming-distance<=k pairs.

Determinism: hash family is (a_j * xxhash64(shingle) + b_j) mod p with
constants derived from a fixed seed, so results are stable across runs,
partitionings, and cluster sizes.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles

# Mersenne prime 2^31-1: a*x + b stays well within signed-64 range (no
# overflow), keeping the multiply-mod family well-defined.
_P = (1 << 31) - 1


def _hash_family(num: int, seed: int = 42) -> list[tuple[int, int]]:
    rnd = random.Random(seed)
    return [(rnd.randrange(1, _P), rnd.randrange(0, _P)) for _ in range(num)]


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per distinct text hash; count the duplicates."""
    return (
        df.withColumn("text_hash", F.md5(F.col(text_col)))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def shingle_docs(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, shingles array, n_shingles) per document."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(text_col, n).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard over n-word shingles: inverted index self-join.

    At scale, prefilter with minhash_lsh_pairs and verify only candidates;
    this exact form is the verifier / test-scale oracle.
    """
    docs = shingle_docs(df, text_col, id_col, n)
    inv = docs.select("doc_id", "n_sh", F.explode("shingles").alias("shingle"))
    a = inv.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1"), "shingle")
    b = inv.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2"), "shingle")
    common = (
        a.join(b, ["shingle"])
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2", "n1", "n2")
        .agg(F.count("*").alias("common"))
    )
    jac = common.withColumn(
        "jaccard", F.col("common").cast("double") / (F.col("n1") + F.col("n2") - F.col("common"))
    )
    return jac.filter(F.col("jaccard") >= threshold).select("d1", "d2", "jaccard")


def minhash_signatures(docs: DataFrame, num_hashes: int = 128, seed: int = 42, spread: bool = True) -> DataFrame:
    """Compute the minhash signature as one array column `mh` per doc_id.

    For each hash j: min over shingles of (a_j * h(s) + b_j) mod p, where
    h(s) = xxhash64(s) mapped to [0, p).  Shape: a single
    `transform(families, f -> aggregate(hashed_shingles, min...))` expression
    -- no explode, no shuffle, one compact expression tree.  (Two rejected
    formulations, both measured ~5x slower at bench scale: 128 separate
    aggregate() columns duplicate the fold tree 128x; explode + groupBy with
    128 MIN aggregates exceeds spark.sql.codegen.maxFields=100 and drops the
    whole aggregate out of codegen.)

    `spread=True` round-robin-repartitions first, but only when the input has
    fewer splits than the cluster has slots (a small file read as one split
    would otherwise compute every signature on one core).  At 100 TB the
    input arrives as thousands of splits and this pre-shuffle never happens.

    The result always ends in a repartition-by-doc_id Exchange: LSH consumers
    self-join the signatures, and without a shuffle boundary on top of the
    signature plan Spark would recompute the (expensive) signature expression
    once per join side; with it, ReuseExchange materializes signatures
    exactly once.  The shuffled payload is one ~1 KB row per doc -- the same
    traffic the groupBy formulation paid anyway.
    """
    fam = _hash_family(num_hashes, seed)
    par = docs.sparkSession.sparkContext.defaultParallelism
    if spread and docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    xs = F.transform("shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(_P)))
    fams = F.array(*[F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in fam])
    mh = F.transform(
        fams,
        lambda p: F.aggregate(
            xs,
            F.lit(_P).cast("long"),
            lambda acc, x: F.least(acc, (p["a"] * x + p["b"]) % F.lit(_P)),
        ),
    )
    return docs.select("doc_id", mh.alias("mh")).repartition(par, "doc_id")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 128,
    bands: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH + exact-Jaccard verification.

    bands=32 x rows=4 over 128 hashes: P(candidate) = 1-(1-j^4)^32, i.e.
    ~1 at j>=0.8, ~0.03 at j=0.2 -- candidates are tiny vs the n^2 space.
    Output equals the exact formulation (same threshold) up to the negligible
    LSH miss probability, so it shares the exact oracle.
    """
    rows = num_hashes // bands
    # Shared repartition barrier: the shingled docs feed both the signature
    # computation and the exact-verify joins below; the Exchange makes Spark
    # compute (and shuffle) the shingle arrays exactly once (ReuseExchange)
    # instead of re-deriving them per consumer.  The verify joins need docs
    # hash-distributed by doc_id anyway, so this shuffle is not extra work.
    par = df.sparkSession.sparkContext.defaultParallelism
    docs = shingle_docs(df, text_col, id_col, n).repartition(par, "doc_id")
    sigs = minhash_signatures(docs, num_hashes, seed, spread=False)
    # One row per (doc, band); band key = hash of that band's signature slice.
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.concat_ws(",", *[F.col("mh")[b * rows + r] for r in range(rows)]))
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "band_key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .distinct()
    )
    # Exact verify on candidates only (broadcast-friendly: candidates << docs).
    sized = docs.select("doc_id", "shingles", "n_sh")
    verified = (
        cand.join(sized.select(F.col("doc_id").alias("d1"), F.col("shingles").alias("sh1"), F.col("n_sh").alias("n1")), "d1")
        .join(sized.select(F.col("doc_id").alias("d2"), F.col("shingles").alias("sh2"), F.col("n_sh").alias("n2")), "d2")
        .withColumn("common", F.size(F.array_intersect("sh1", "sh2")))
        .withColumn("jaccard", F.col("common").cast("double") / (F.col("n1") + F.col("n2") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("d1", "d2", "jaccard")


def simhash_pairs(df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash within `max_hamming` bits.

    Fingerprint: sign-sum over token hashes per bit.  Candidate generation
    uses the pigeonhole trick -- split the fingerprint into max_hamming+1
    blocks; any pair within the distance budget shares at least one exact
    block, so we join on (block_index, block_value).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("toks"),
    )
    hashed = toks.withColumn("th", F.transform("toks", lambda t: F.xxhash64(t)))
    # bit b of fingerprint = 1 if sum over tokens of (+1 if hash bit set else -1) > 0
    bit = lambda b: (
        F.aggregate(
            "th",
            F.lit(0),
            lambda acc, x: acc + F.when(F.shiftright(x, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        > 0
    ).cast("long")
    fp = hashed.select(
        "doc_id",
        sum([F.shiftleft(bit(b), b) for b in range(64)], F.lit(0).cast("long")).alias("fp"),
    )
    nblocks = max_hamming + 1
    width = 64 // nblocks
    blocks = fp.select(
        "doc_id",
        "fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("fp"), i * width).bitwiseAND(F.lit((1 << width) - 1) if i < nblocks - 1 else F.lit(-1))
                    for i in range(nblocks)
                ]
            )
        ).alias("block", "block_val"),
    )
    cand = (
        blocks.alias("x")
        .join(blocks.alias("y"), ["block", "block_val"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("d1"),
            F.col("y.doc_id").alias("d2"),
            F.col("x.fp").alias("fp1"),
            F.col("y.fp").alias("fp2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fp1").bitwiseXOR(F.col("fp2")))
    return cand.withColumn("hamming", hamming.cast("int")).filter(F.col("hamming") <= max_hamming).select(
        "d1", "d2", "hamming"
    )
