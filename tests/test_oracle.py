"""Driver-contract replica: every registered query vs its DuckDB oracle.

This is the same comparison the driver's CORRECTNESS gate runs (row count +
column names + order-insensitive values), executed at sf0.001 for speed.
Queries without an oracle get a rows-only sanity check.
"""

from __future__ import annotations

import pytest

from sparkstreaming_quickstart_spark.oracle import compare
from sparkstreaming_quickstart_spark.queries import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    q = QUERIES[name]
    if q.sql is None:
        n = q.fn(spark, sf_dir).count()
        assert n >= 0
        return
    res = compare(spark, sf_dir, q.fn, q.sql)
    assert res["ok"], res


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
