"""Wave 40 (round 12): measured-policy dispatch and time-based streaming
emission.

- q393 dictionary tagging with AUTO-DISPATCH (round-11 verdict #3): q380
  (JVM replace-diff) and q383 (Aho-Corasick automaton) are value-locked
  twins whose crossover was MEASURED in round 11 (~35 terms,
  tools/textscan_r11.json) -- but a caller had to pick by hand, and at
  100 TB the wrong pick costs ~10x.  `tag_dictionary` applies the policy
  table inside the operator; this entry registers it with a dictionary
  large enough to select the automaton branch, value-locked to the same
  replace-diff oracle as the twins.
- q394 session windows in APPEND mode (round-11 verdict #7): q84 drains
  the merging-session operator in complete mode, where the watermark
  never withholds output; this entry replays the APPEND emission rule
  exactly -- a session emits iff the final watermark passed its end --
  extending the split-independence evidence (q340/q367/q372/q392 prove it
  for commutative-merge state) to TIME-based state, q146/q159's oracle
  discipline applied to session windows.

Reference parity note: the reference computes none of this (its single
pipeline is Kafka->println, Processor.java:118-139); these are engine-surface
operators in the charter's LLM-data-pipeline / streaming families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from . import register

# ---------------------------------------------------------------------------
# q393: dictionary tagging with measured auto-dispatch
# ---------------------------------------------------------------------------

# A production-shaped dictionary: every fixture vocabulary word, a band of
# multi-word phrases, and four vocabulary-absent terms (zero-hit rows must
# survive to the output).  56 terms > the measured ~35-term crossover, so
# the dispatcher must pick the automaton branch (plan-pinned in tests).
_TAG_WORDS = [
    "join", "hash", "row", "batch", "scan", "customer", "column", "filter",
    "small", "slow", "merge", "order", "vector", "line", "data", "table",
    "agg", "value", "key", "stream", "window", "spark", "group", "part",
    "big", "sort", "query", "fast", "dup",
]
_TAG_PHRASES = [
    "hash join", "table scan", "merge sort", "slow query", "fast scan",
    "row group", "key value", "big table", "data line", "sort order",
    "window agg", "stream batch", "query filter", "vector column",
    "small part", "spark table", "dup row", "slow scan", "fast join",
    "batch window", "customer line", "order data", "agg join",
]
_TAG_ABSENT = ["gpu kernel", "tensor core", "quantum leap", "neural net"]
_TAG_DICT: list[tuple[str, str]] = (
    [(t, "word") for t in _TAG_WORDS]
    + [(t, "phrase") for t in _TAG_PHRASES]
    + [(t, "absent") for t in _TAG_ABSENT]
)

_TAG_VALUES = ", ".join(f"('{t}', '{c}')" for t, c in _TAG_DICT)


@register(
    "q393_tag_dictionary_auto",
    sql=f"""
    WITH dict(term, category) AS (VALUES {_TAG_VALUES}),
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
    doc=f"Dictionary tagging with MEASURED AUTO-DISPATCH (round-11 verdict "
    f"#3): tag_dictionary(df, dict) picks q380's JVM replace-diff "
    "spelling below the ~35-term crossover and q383's one-pass "
    "Aho-Corasick Arrow kernel at or above it -- the policy constant is "
    "round 11's committed measurement (tools/textscan_r11.json, "
    "SCALING.md: per-term rescans win only while the dictionary is "
    "small; the automaton is flat in dictionary size), so the 10x "
    "wrong-branch cost at 100 TB is an operator decision, not a caller "
    f"guess.  This entry runs a {len(_TAG_DICT)}-term dictionary (every "
    "fixture vocabulary word, 23 phrases, 4 vocabulary-absent terms) -> "
    "the AUTOMATON branch, value-locked to the exact replace-diff "
    "oracle the q380/q383 twins share; a plan test pins that the small-"
    "dict call compiles to pure codegen (no Arrow node) and the large-"
    "dict call to the Arrow kernel.  Counts are exact non-overlapping "
    "str.count occurrences in both branches (operators/text_scan.py, "
    "fuzz-pinned).",
)
def q393_tag_dictionary_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_scan import tag_dictionary

    d = load_table(spark, sf_dir, "documents")
    return tag_dictionary(d, "text", _TAG_DICT)


# ---------------------------------------------------------------------------
# q394: streaming session windows, APPEND mode (exact emission replay)
# ---------------------------------------------------------------------------


def _q394_oracle(cmp: str) -> str:
    return f"""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts ASC) > 1800000000
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC)
                       IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS sid
        FROM flagged),
    s AS (
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, sid),
    wm AS (
        SELECT date_trunc('milliseconds', MAX(ts)) - INTERVAL 2 HOUR AS w
        FROM events)
    SELECT user_id, session_start, session_end, n_events
    FROM s, wm WHERE session_end {cmp} w
    ORDER BY user_id, session_start
    """


@register(
    "q394_stream_session_append",
    sql=_q394_oracle("<"),
    doc="STREAMING session windows drained in APPEND mode with the emission "
    "rule replayed EXACTLY (round-11 verdict #7 -- time-based state "
    "joins the split-independence evidence): q84 drains the same "
    "30-min-gap merging-session aggregation in complete mode, where the "
    "watermark withholds nothing; in append mode a session row may only "
    "emit once the event-time watermark has passed its end, so the "
    "drained output is the CLOSED sessions only and still-open sessions "
    "are withheld -- correct streaming semantics, not missing data.  The "
    "oracle replays the rule against the batch gaps-and-islands "
    "sessionization (q35/q84's oracle): final watermark = max event "
    "time (ms truncation, Spark's internal watermark precision) - the "
    "2h delay, and a session emits iff session_end < watermark -- the "
    "q146/q159 stream-stream-join oracle discipline applied to session "
    "state.  A forced multi-split replay test (time-sliced files, "
    "pinned mtimes) proves the emitted set is batch-boundary-"
    "independent; at 100 TB this operator is RocksDB-backed session "
    "state keyed by user, one shuffle on the grouping key.",
)
def q394_stream_session_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import run_to_memory
    from ..streaming.source import events_stream

    stream = events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    agg = (
        stream.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    table = run_to_memory(agg, output_mode="append")
    return spark.table(table).orderBy("user_id", "session_start")
