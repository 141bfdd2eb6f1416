"""As-of join (nearest prior event), Spark-first.

Spark has no built-in ASOF JOIN (SURVEY.md section 7 "what's hard").  The
scalable formulation is the union-and-carry-forward window trick:

    1. Tag left rows (probes) and right rows (quotes), union them by key+time.
    2. One window per key ordered by (time, tag, tiebreak); `last(value,
       ignorenulls=True)` carries the most recent right-side value forward.
    3. Keep only left rows.

Cost: ONE shuffle on the key (window partitioning), no join blowup, no range
explosion -- at 100 TB this beats the naive `join + filter + max_by` (which
shuffles both sides AND materializes every (probe, earlier-quote) pair).
Skewed keys can be salted by appending a time-bucket to the partition key;
not needed at driver scale.

Tie semantics: a right row at exactly t == left.t IS visible (inclusive);
among right rows with identical timestamps the one with the highest tiebreak
column wins.  The DuckDB oracle expresses the same thing with max_by over a
correlated range.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# A safe INTERVAL literal: "<number> <unit>" pairs, e.g. "2 hours" or
# "1 day 30 minutes".  Anything else (including SQL injection via the
# f-string interpolation below) is rejected up front with a clear error.
_INTERVAL_RE = re.compile(
    r"^\s*\d+\s+(year|month|week|day|hour|minute|second|millisecond|microsecond)s?"
    r"(\s+\d+\s+(year|month|week|day|hour|minute|second|millisecond|microsecond)s?)*\s*$",
    re.IGNORECASE,
)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tiebreak: str,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach `value_cols` of the matching right row for
    the same `on` key (None if no such row), where the match is:

      * direction="backward" (default): the LATEST right row with
        right_time <= left_time (pandas merge_asof default);
      * direction="forward": the EARLIEST right row with
        right_time >= left_time;
      * direction="nearest": whichever of those two is closer in time
        (ties resolve backward).

    All directions remain ONE shuffle on the key: forward mirrors the
    backward union-and-carry window with time descending; nearest computes
    both carries over the SAME unioned/partitioned frame (one exchange,
    two sorts) and picks per row.  In every direction a right row at
    exactly t == left.t matches (inclusive), and among equal-time right
    rows the highest tiebreak wins.

    `tolerance` (an INTERVAL literal like "2 hours") bounds the match age
    (backward), the lookahead (forward), or both (nearest): a carried
    match farther than tolerance resolves to None, the pandas
    merge_asof(tolerance=...) semantics.  Implemented by carrying the
    matched quote's OWN time alongside its values and nulling stale
    matches -- still one shuffle, no join blowup.

    Requirements: `value_cols` must be disjoint from `left`'s columns (rename
    on the right side first), and `tiebreak` must be one of `value_cols`.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    assert tiebreak in value_cols, "tiebreak must be one of value_cols"
    overlap = set(value_cols) & set(left.columns)
    assert not overlap, f"rename right-side value cols colliding with left: {overlap}"
    if tolerance is not None:
        if not _INTERVAL_RE.match(tolerance):
            raise ValueError(
                f"tolerance must be an interval literal like '2 hours', got {tolerance!r}"
            )
        # The freshness comparison subtracts an INTERVAL from the time
        # column, which Spark only defines for timestamp/date types; the
        # base (tolerance=None) join also supports numeric time columns,
        # so fail early with a clear message instead of an opaque
        # analysis-time error.
        ltype = left.schema[left_time].dataType.typeName()
        if ltype not in ("timestamp", "timestamp_ntz", "date"):
            raise TypeError(
                f"tolerance requires a timestamp-typed left time column; "
                f"{left_time!r} is {ltype}"
            )
    lcols = left.columns
    probe = left.withColumn("__t", F.col(left_time)).withColumn("__is_left", F.lit(1))
    for v in value_cols:
        if v not in probe.columns:
            probe = probe.withColumn(v, F.lit(None))
    build = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(v) for v in value_cols],
    )
    for c in lcols:
        if c not in build.columns:
            build = build.withColumn(c, F.lit(None))
    unioned = probe.select(*lcols, "__t", "__is_left", *value_cols).unionByName(
        build.select(*lcols, "__t", "__is_left", *value_cols)
    )
    # Right rows sort before left rows at equal time (inclusive semantics);
    # among equal-time right rows the highest tiebreak lands last -> wins.
    # Backward carries over time ascending; forward is the mirror (time
    # descending, so `last` picks the EARLIEST future right row).
    def carry_window(time_desc: bool) -> Window:
        t = F.col("__t").desc() if time_desc else F.col("__t").asc()
        return (
            Window.partitionBy(on)
            .orderBy(t, F.col("__is_left").asc(), F.col(tiebreak).asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    def carried_cols(w: Window, prefix: str):
        return [
            F.last(F.when(F.col("__is_left") == 0, F.col(v)), ignorenulls=True)
            .over(w)
            .alias(f"{prefix}{v}")
            for v in value_cols
        ] + [
            F.last(F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True)
            .over(w)
            .alias(f"{prefix}t")
        ]

    if direction == "nearest":
        carried = unioned.select(
            *lcols,
            "__t",
            "__is_left",
            *carried_cols(carry_window(False), "__b_"),
            *carried_cols(carry_window(True), "__f_"),
        )
        # gaps compare as raw differences; timestamps (incl. NTZ) go through
        # unix_micros, numeric time columns subtract directly
        ttype = left.schema[left_time].dataType.typeName()
        if ttype in ("timestamp", "timestamp_ntz", "date"):
            tval = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
        else:
            tval = lambda c: F.col(c)
        back_gap = tval("__t") - tval("__b_t")
        fwd_gap = tval("__f_t") - tval("__t")
        use_back = F.col("__f_t").isNull() | (
            F.col("__b_t").isNotNull() & (back_gap <= fwd_gap)
        )
        carried = carried.select(
            *lcols,
            "__t",
            "__is_left",
            *[
                F.when(use_back, F.col(f"__b_{v}"))
                .otherwise(F.col(f"__f_{v}"))
                .alias(f"asof_{v}")
                for v in value_cols
            ],
            F.when(use_back, F.col("__b_t")).otherwise(F.col("__f_t")).alias("__matched_t"),
        )
    else:
        w = carry_window(time_desc=(direction == "forward"))
        carried = unioned.select(
            *lcols,
            "__t",
            "__is_left",
            *[
                F.last(F.when(F.col("__is_left") == 0, F.col(v)), ignorenulls=True)
                .over(w)
                .alias(f"asof_{v}")
                for v in value_cols
            ],
            F.last(F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True)
            .over(w)
            .alias("__matched_t"),
        )
    out = carried.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        interval = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            fresh = F.col("__matched_t") >= F.col("__t") - interval
        elif direction == "forward":
            fresh = F.col("__matched_t") <= F.col("__t") + interval
        else:
            fresh = (F.col("__matched_t") >= F.col("__t") - interval) & (
                F.col("__matched_t") <= F.col("__t") + interval
            )
        out = out.select(
            *lcols,
            *[
                F.when(fresh, F.col(f"asof_{v}")).alias(f"asof_{v}")
                for v in value_cols
            ],
        )
    return out.drop("__t", "__is_left", "__matched_t")
