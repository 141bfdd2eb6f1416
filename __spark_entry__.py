"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(`sparkstreaming_quickstart_spark.queries`): every implemented operator from
SURVEY.md section 2 has a named (spark, sf_dir) -> DataFrame builder and,
where SQL-expressible, a DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkstreaming_quickstart_spark import queries as _registry  # noqa: E402
from sparkstreaming_quickstart_spark.queries.relational import q01_pricing_summary  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q01_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return _registry.oracle_sql()
