"""Physical-plan inspection helpers (the ".explain and iterate" loop).

Used by tests to assert scale-critical plan properties: filters reach the
parquet scan, small dims broadcast, shuffle counts stay bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the physical plan (lower bound on shuffles)."""
    return explain_str(df, "simple").count("Exchange")


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Assert a filter fragment was pushed into the scan (PushedFilters)."""
    plan = explain_str(df, "formatted")
    assert "PushedFilters" in plan, "no scan with pushed filters in plan"
    assert fragment in plan, f"{fragment!r} not pushed; plan:\n{plan}"


def broadcast_join_count(df: DataFrame) -> int:
    return explain_str(df, "simple").count("BroadcastHashJoin")
