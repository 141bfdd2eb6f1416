"""Wave-12 operators (round 3): sequence mining and subword-vocabulary
training -- MLlib PrefixSpan sequential patterns, higher-order behavior
n-grams, and distributed BPE merge discovery with a fully unrolled SQL
oracle.

Reference parity note: the reference has no mining surface; these are
charter extensions (SURVEY.md section 2.B), continuing wave 10/11's float
discipline (binary-exact support thresholds, integer counts everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q268: sequential pattern mining via MLlib PrefixSpan
# ---------------------------------------------------------------------------

# 1/2 is binary-exact, so PrefixSpan's ceil(minSupport * n) equals the
# oracle's (n + 1) // 2 for every n (the q260 argument).
_PS_MIN_SUPPORT = 0.5


@register(
    "q268_prefixspan_sequences",
    sql="""
    WITH u AS (SELECT COUNT(DISTINCT user_id) AS nu FROM events),
    singles AS (
        SELECT event_type AS pattern, COUNT(DISTINCT user_id) AS freq
        FROM events GROUP BY event_type),
    pairs AS (
        SELECT e1.event_type || '->' || e2.event_type AS pattern,
               COUNT(DISTINCT e1.user_id) AS freq
        FROM events e1
        JOIN events e2
          ON e1.user_id = e2.user_id
         AND (e1.ts < e2.ts OR (e1.ts = e2.ts AND e1.event_id < e2.event_id))
        GROUP BY 1)
    SELECT pattern, CAST(freq AS BIGINT) AS freq
    FROM (SELECT * FROM singles UNION ALL SELECT * FROM pairs), u
    WHERE freq >= (u.nu + 1) // 2
    ORDER BY pattern
    """,
    doc="Sequential pattern mining via MLlib PrefixSpan (length <= 2, "
    "support >= 1/2 of users): which event-type orderings recur across "
    "user journeys -- the sequence-aware upgrade of q217/q260's "
    "itemsets and the input to funnel design (q149).  Per-user "
    "sequences build with ONE sorted collect (total order ts, "
    "event_id); PrefixSpan distributes by prefix projection, so no "
    "pair shuffle touches the event frame -- the oracle's quadratic "
    "self-join is the spelling, not the plan.  Support 1/2 is "
    "binary-exact so ceil(minSupport*n) matches the integer ceiling "
    "both sides.",
)
def q268_prefixspan_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.fpm import PrefixSpan

    e = load_table(spark, sf_dir, "events")
    seqs = (
        e.groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: F.array(x.event_type),
            ).alias("sequence")
        )
    )
    ps = PrefixSpan(
        minSupport=_PS_MIN_SUPPORT, maxPatternLength=2, sequenceCol="sequence"
    )
    pat = ps.findFrequentSequentialPatterns(seqs)
    return (
        pat.select(
            F.concat_ws(
                "->", F.transform("sequence", lambda s: s.getItem(0))
            ).alias("pattern"),
            F.col("freq").cast("bigint").alias("freq"),
        )
        .orderBy("pattern")
    )


# ---------------------------------------------------------------------------
# q269: higher-order behavior n-grams (event-type trigrams per user step)
# ---------------------------------------------------------------------------


@register(
    "q269_behavior_trigrams",
    sql="""
    WITH s AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS t2,
               LEAD(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    tri AS (
        SELECT event_type || '->' || t2 || '->' || t3 AS trigram
        FROM s WHERE t3 IS NOT NULL),
    tot AS (SELECT COUNT(*) AS n FROM tri)
    SELECT trigram,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) / CAST(tot.n AS DOUBLE), 6) AS share
    FROM tri, tot
    GROUP BY trigram, tot.n
    ORDER BY trigram
    """,
    doc="Higher-order behavior n-grams: consecutive event-type trigrams "
    "per user (total order ts, event_id) with corpus shares -- the "
    "order-2 Markov upgrade of q218's transition matrix, the feature "
    "space for session-intent models.  One window shuffle on user_id "
    "(both leads share the window spec) then a hash-agg over the "
    "bounded |types|^3 trigram domain.",
)
def q269_behavior_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    tri = s.select(
        F.concat_ws("->", "event_type", "t2", "t3").alias("trigram")
    )
    tot = tri.agg(F.count("*").alias("n_total"))
    return (
        tri.groupBy("trigram")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "trigram",
            "n",
            F.round(F.col("n") / F.col("n_total").cast("double"), 6).alias("share"),
        )
        .orderBy("trigram")
    )


# ---------------------------------------------------------------------------
# q270: BPE merge-rule training (greedy, corpus-global, 4 merges)
# ---------------------------------------------------------------------------

_BPE_MERGES = 4


def _bpe_oracle(levels: int) -> str:
    """Unrolled DuckDB twin of the greedy merge loop.

    Level k: count adjacent token pairs of the level-k corpus, pick the
    (count DESC, pair ASC) argmax, splice it (space -> '+') into the text
    via single-pass left-to-right replace -- the same order both engines
    use.  Space-padding makes ' a b ' match only whole-token adjacency.
    """
    parts = [
        "WITH t0 AS (SELECT ' ' || text || ' ' AS x FROM documents WHERE length(text) > 0)"
    ]
    for k in range(levels):
        parts.append(
            f""",
    tk{k} AS (SELECT string_split(trim(x), ' ') AS tk FROM t{k}),
    pairs{k} AS (
        SELECT u.p[1] || ' ' || u.p[2] AS pair, COUNT(*) AS c
        FROM (SELECT unnest(list_zip(tk, tk[2:])) AS p FROM tk{k}) u
        WHERE u.p[2] IS NOT NULL
        GROUP BY 1),
    best{k} AS (
        SELECT pair FROM pairs{k} ORDER BY c DESC, pair ASC LIMIT 1),
    t{k + 1} AS (
        SELECT replace(x, ' ' || (SELECT pair FROM best{k}) || ' ',
                       ' ' || replace((SELECT pair FROM best{k}), ' ', '+') || ' ') AS x
        FROM t{k})"""
        )
    merges = "\n    UNION ALL\n    ".join(
        f"SELECT {k} AS step, (SELECT pair FROM best{k}) AS merge_rule,"
        f" (SELECT c FROM pairs{k} WHERE pair = (SELECT pair FROM best{k})) AS pair_count"
        for k in range(levels)
    )
    parts.append(
        f"""
    SELECT step, merge_rule, CAST(pair_count AS BIGINT) AS pair_count
    FROM ({merges})
    ORDER BY step"""
    )
    return "".join(parts)


@register(
    "q270_bpe_merges",
    sql=_bpe_oracle(_BPE_MERGES),
    doc=f"BPE merge-rule training, {_BPE_MERGES} greedy iterations at word "
    "granularity: each round counts adjacent token pairs across the "
    "corpus, promotes the most frequent pair (deterministic count DESC, "
    "pair ASC tie-break) to a single token, and splices it back with a "
    "single-pass left-to-right replace -- the exact loop behind every "
    "subword tokenizer's vocabulary, run distributed.  Per round: one "
    "narrow pair-explode projection, one map-side-combinable hash-agg "
    "over the pair vocabulary, and a 1-row argmax collected to the "
    "driver (the merge RULE is the only driver state, the q166/q124 "
    "scripting pattern); the splice is a stateless scan.  The oracle "
    "unrolls the identical loop as chained CTEs with scalar subqueries.",
)
def q270_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    corpus = d.select(F.concat(F.lit(" "), F.col("text"), F.lit(" ")).alias("x"))
    rows = []
    for step in range(_BPE_MERGES):
        tk = corpus.select(F.split(F.trim("x"), " ").alias("tk"))
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
        best = pairs.orderBy(F.col("c").desc(), F.col("pair").asc()).limit(1).collect()[0]
        rows.append((step, best.pair, int(best.c)))
        corpus = corpus.select(
            F.replace(
                "x",
                F.lit(f" {best.pair} "),
                F.lit(" " + best.pair.replace(" ", "+") + " "),
            ).alias("x")
        )
    return spark.createDataFrame(
        rows, "step int, merge_rule string, pair_count bigint"
    ).orderBy("step")


# ---------------------------------------------------------------------------
# q271: streaming per-key top-k via custom state (applyInPandasWithState)
# ---------------------------------------------------------------------------

_TOPK_PER_USER = 3


@register(
    "q271_stream_user_topk",
    sql=f"""
    WITH ranked AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY round(value * 100) DESC, event_id ASC) AS r
        FROM events)
    SELECT user_id, CAST(r AS INT) AS r, ROUND(cents / 100.0, 2) AS value
    FROM ranked WHERE r <= {_TOPK_PER_USER}
    ORDER BY user_id, r
    """,
    doc=f"Streaming per-key top-{_TOPK_PER_USER} via a custom stateful "
    "operator (applyInPandasWithState): state per user is just the "
    f"current top-{_TOPK_PER_USER} (value-cents, event_id) pairs -- O(k) "
    "bounded, and the merge is commutative/associative, so the result is "
    "EXACT under any micro-batch split or arrival order (unlike an "
    "order-sensitive recurrence).  The per-key complement of q152's "
    "global streaming top-k; ties break by lowest event_id.  Oracle = "
    "batch row_number over the same total order.",
)
def q271_stream_user_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from ..streaming.pipeline import run_to_memory
    from ..streaming.source import events_stream

    k = _TOPK_PER_USER
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("r", IntegerType()),
            StructField("cents", LongType()),
            StructField("n_seen", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("cents", ArrayType(LongType())),
            StructField("ids", ArrayType(LongType())),
            StructField("n_seen", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            cents, ids, n_seen = state.get
            heap = list(zip(cents, ids))
        else:
            heap, n_seen = [], 0
        for pdf in pdfs:
            n_seen += len(pdf)
            batch_cents = pdf["value"].mul(100).round().astype("int64")
            heap.extend(zip(batch_cents, pdf["event_id"].astype("int64")))
        # keep best k: highest cents first, lowest event_id on ties
        heap.sort(key=lambda t: (-t[0], t[1]))
        heap = heap[:k]
        state.update(([int(c) for c, _ in heap], [int(i) for _, i in heap], n_seen))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(heap),
                "r": list(range(1, len(heap) + 1)),
                "cents": [int(c) for c, _ in heap],
                "n_seen": [n_seen] * len(heap),
            }
        )

    stream = events_stream(spark, sf_dir).select("user_id", "event_id", "value")
    topk = stream.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    table = run_to_memory(topk, output_mode="update")
    # Update mode re-emits the running top-k each micro-batch; keep each
    # user's FINAL emission (highest n_seen) so the result is correct under
    # any batch split (the q74 reduction argument).
    final = (
        spark.table(table)
        .withColumn(
            "mx", F.max("n_seen").over(Window.partitionBy("user_id"))
        )
        .filter(F.col("n_seen") == F.col("mx"))
    )
    return final.select(
        "user_id",
        "r",
        F.round(F.col("cents") / 100.0, 2).alias("value"),
    ).orderBy("user_id", "r")


# ---------------------------------------------------------------------------
# q272: multimodal audio-style frame-energy extraction (numpy over Arrow)
# ---------------------------------------------------------------------------

_FRAME_BYTES = 256


@register(
    "q272_multimodal_audio_energy",
    sql=f"""
    WITH chars AS (
        SELECT doc_id,
               unnest(string_split(text, '')) AS ch,
               generate_subscripts(string_split(text, ''), 1) AS i
        FROM documents WHERE length(text) > 0)
    SELECT doc_id,
           CAST((i - 1) // {_FRAME_BYTES} AS INT) AS frame_no,
           CAST(COUNT(*) AS BIGINT) AS n_bytes,
           CAST(SUM(ascii(ch)) AS BIGINT) AS energy,
           CAST(MAX(ascii(ch)) AS INT) AS peak,
           ROUND(sqrt(SUM(ascii(ch) * ascii(ch)) / CAST(COUNT(*) AS DOUBLE)), 6) AS rms
    FROM chars
    GROUP BY doc_id, frame_no
    ORDER BY doc_id, frame_no
    """,
    doc=f"Audio-style frame feature extraction over opaque binary payloads: "
    f"{_FRAME_BYTES}-byte frames, per-frame energy (sum), peak, and RMS "
    "computed by a single numpy kernel inside mapInPandas (one "
    "np.frombuffer + reshape-free add.reduceat per Arrow batch -- the "
    "shape a real PCM pipeline uses, with the codec swapped for the "
    "identity since this container ships no audio libs; the payload IS "
    "the UTF-8 bytes, so the DuckDB oracle reproduces every frame "
    "statistic exactly from per-char ASCII codes).  No shuffle: frames "
    "stay on their input's executor, integer sums exact, one float sqrt "
    "at the end.",
)
def q272_multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..operators.multimodal import with_binary_payload

    fb = _FRAME_BYTES

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, ns, energies, peaks, rmss = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                if buf.size == 0:
                    continue
                starts = np.arange(0, buf.size, fb)
                b64 = buf.astype(np.int64)
                e = np.add.reduceat(b64, starts)
                sq = np.add.reduceat(b64 * b64, starts)
                pk = np.maximum.reduceat(buf, starts)
                n = np.diff(np.append(starts, buf.size))
                ids.extend([doc_id] * len(starts))
                fnos.extend(range(len(starts)))
                ns.extend(n.tolist())
                energies.extend(e.tolist())
                peaks.extend(pk.tolist())
                rmss.extend(np.round(np.sqrt(sq / n), 6).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(fnos, dtype="int32"),
                    "n_bytes": pd.Series(ns, dtype="int64"),
                    "energy": pd.Series(energies, dtype="int64"),
                    "peak": pd.Series(peaks, dtype="int32"),
                    "rms": pd.Series(rmss, dtype="float64"),
                }
            )

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    payloads = with_binary_payload(d.select("doc_id", "text"), "text")
    out = payloads.select("doc_id", "payload").mapInPandas(
        frames,
        schema="doc_id bigint, frame_no int, n_bytes bigint, energy bigint, peak int, rms double",
    )
    return out.orderBy("doc_id", "frame_no")
