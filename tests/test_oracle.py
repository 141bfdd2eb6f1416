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


# ---------------------------------------------------------------------------
# Negative controls: the comparator itself must FAIL on planted defects.
# A registry of green oracles proves nothing if compare() rots into always-pass, so
# each failure mode the driver gate relies on is exercised with a
# deliberately wrong "query" against a known oracle.
# ---------------------------------------------------------------------------


def _const_query(*cols):
    """A (spark, sf_dir) -> DataFrame builder returning literal rows."""

    def fn(spark, sf_dir):
        names = [c[0] for c in cols]
        rows = list(zip(*[c[1] for c in cols]))
        return spark.createDataFrame(rows, names)

    return fn


def test_compare_passes_on_identical_results(spark, sf_dir):
    res = compare(
        spark, sf_dir, _const_query(("x", [1, 2]), ("y", ["a", "b"])),
        "SELECT 1 AS x, 'a' AS y UNION ALL SELECT 2, 'b'",
    )
    assert res["ok"], res


def test_compare_fails_on_value_mismatch(spark, sf_dir):
    res = compare(
        spark, sf_dir, _const_query(("x", [1, 2])),
        "SELECT 1 AS x UNION ALL SELECT 3",
    )
    assert not res["ok"]
    assert "value mismatch" in res["why"]


def test_compare_fails_on_row_count_mismatch(spark, sf_dir):
    res = compare(
        spark, sf_dir, _const_query(("x", [1, 2])), "SELECT 1 AS x"
    )
    assert not res["ok"]
    assert res["why"] == "row count mismatch"


def test_compare_fails_on_column_rename(spark, sf_dir):
    """The README rule-1 failure mode: same values, different alias."""
    res = compare(
        spark, sf_dir, _const_query(("sum_qty", [7])), "SELECT 7 AS total_qty"
    )
    assert not res["ok"]
    assert res["why"] == "column mismatch"


def test_compare_is_order_insensitive_but_multiset_exact(spark, sf_dir):
    """Row order must not matter; duplicate multiplicity must."""
    ok = compare(
        spark, sf_dir, _const_query(("x", [2, 1])),
        "SELECT 1 AS x UNION ALL SELECT 2",
    )
    assert ok["ok"], ok
    dup = compare(
        spark, sf_dir, _const_query(("x", [1, 2, 2])),
        "SELECT 1 AS x UNION ALL SELECT 1 UNION ALL SELECT 2",
    )
    assert not dup["ok"]


def test_compare_float_normalization_catches_real_drift(spark, sf_dir):
    """12-significant-digit normalization: sub-ulp noise passes, a real
    value difference fails."""
    ok = compare(
        spark, sf_dir,
        _const_query(("v", [0.1 + 0.2])),
        "SELECT 0.30000000000000004 AS v",  # same double after 12g rounding
    )
    assert ok["ok"], ok
    bad = compare(
        spark, sf_dir, _const_query(("v", [0.3000001])), "SELECT 0.3 AS v"
    )
    assert not bad["ok"]


def test_duckdb_connection_fails_fast_on_empty_dir(tmp_path):
    """A mistyped or empty sf_dir must raise at connect time, not as a
    confusing 'Table does not exist' inside the first oracle query
    (round-9 advice fix).  Partial fixture dirs (>=1 known table) still
    bind leniently."""
    import pytest as _pytest

    from sparkstreaming_quickstart_spark.oracle import duckdb_connection

    with _pytest.raises(FileNotFoundError, match="no known table parquet"):
        duckdb_connection(str(tmp_path))
    # partial dir with one real table still connects
    import pandas as _pd

    _pd.DataFrame({"doc_id": [1], "text": ["x"]}).to_parquet(
        tmp_path / "documents.parquet"
    )
    con = duckdb_connection(str(tmp_path))
    assert con.execute("SELECT COUNT(*) FROM documents").fetchone()[0] == 1
    con.close()
