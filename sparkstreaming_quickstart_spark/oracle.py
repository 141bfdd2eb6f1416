"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its DuckDB oracle SQL side by side and
compares row count, column names, and order-insensitive values -- the same
contract the driver's CORRECTNESS gate applies.  Used by tests and the
tools/check_oracle.py iteration loop so correctness failures surface locally
before a driver round.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from .sources.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    registered = 0
    for t in TABLES:
        # Tests point compare() at partial fixture dirs (e.g. a tmp_path with
        # only documents.parquet); register views only for tables present so
        # an oracle over the planted table still binds.
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
            registered += 1
    if registered == 0:
        # A mistyped or empty sf_dir must fail fast here, not as a confusing
        # 'Table does not exist' deep inside the first oracle query.
        con.close()
        raise FileNotFoundError(
            f"no known table parquet found in {sf_dir!r}: expected at least one "
            f"of {[f'{t}.parquet' for t in TABLES]}"
        )
    return con


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits absorbs sub-ulp engine differences while
        # still catching real value bugs.
        return f"{v:.12g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare(spark: SparkSession, sf_dir: str, fn, sql: str) -> dict:
    """Run query + oracle; return a result dict (ok, counts, first diff)."""
    sdf = fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    ddf = con.sql(sql).df()
    con.close()
    res: dict[str, Any] = {
        "spark_rows": len(sdf),
        "duckdb_rows": len(ddf),
        "spark_cols": sorted(sdf.columns),
        "duckdb_cols": sorted(ddf.columns),
    }
    if sorted(sdf.columns) != sorted(ddf.columns):
        res["ok"] = False
        res["why"] = "column mismatch"
        return res
    if len(sdf) != len(ddf):
        res["ok"] = False
        res["why"] = "row count mismatch"
        return res
    a, b = _normalize(sdf), _normalize(ddf)
    if a != b:
        diff = next((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y)
        res["ok"] = False
        res["why"] = f"value mismatch at sorted row {diff[0]}: spark={diff[1]} duckdb={diff[2]}"
        return res
    res["ok"] = True
    return res
