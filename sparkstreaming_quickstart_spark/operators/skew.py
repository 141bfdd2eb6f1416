"""Skew-aware join: key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when one hot key dominates a
shuffle-hash join so badly that even split partitions overwhelm an executor
(e.g. the null-key or "unknown user" row at 100 TB).

`salted_join` replicates the build side R times and scatters the probe side
across the R salt values, so the hot key's rows spread over R tasks.  Join
semantics are preserved exactly for inner equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(probe: DataFrame, build: DataFrame, on: str, salt: int = 8) -> DataFrame:
    """Inner equi-join on `on` with `salt`-way key salting.

    probe gets a deterministic per-row salt (hash-derived, not rand(), so
    results are reproducible); build is replicated across all salt values.
    """
    p = probe.withColumn("__salt", F.pmod(F.xxhash64(*probe.columns), F.lit(salt)))
    b = build.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = p.join(b, [on, "__salt"])
    return out.drop("__salt")
