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
import tempfile
from typing import Any

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from .sources.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Cap the oracle's memory and give it a spill directory: DuckDB's
    # default memory_limit is ~80% of RAM, which on this 128 GB container
    # let corpus-quadratic oracle intermediates (exact-Jaccard pair hash
    # tables at sf10) grow past ~96 GB RSS and threaten the whole machine
    # before ever spilling.  With an explicit cap the same oracles spill
    # to disk and complete -- slower but bounded, which is what a
    # verification harness wants.  Override via SPARK_GRAFT_DUCKDB_MEM.
    # The default is min(48GB, 60% of physical RAM): a flat 48GB would
    # RAISE DuckDB's own adaptive 80%-of-RAM bound on hosts smaller than
    # ~60 GB, inverting the cap into an OOM invitation (round-10 advice).
    mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM")
    if not mem:
        try:
            ram = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
            mem = f"{min(48, max(1, int(ram * 0.6 / 2**30)))}GB"
        except (ValueError, OSError):
            mem = "48GB"
    spill = os.path.join(tempfile.gettempdir(), "ssq-duckdb-spill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{spill}'")
    # Optional thread cap: blocked (UNION ALL mod-class) oracles rely on
    # branches NOT all being in flight at once for their peak-state bound;
    # DuckDB parallelizes across branches by default, which multiplies the
    # in-flight aggregate state by the branch count.
    threads = os.environ.get("SPARK_GRAFT_DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
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
        if v == 0.0:
            # IEEE negative zero: '%.12g' renders -0.0 as '-0', and engines
            # legitimately differ on the sign of a zero result (round-11 sf1
            # finding: q136's z-score rounds to -0.0 in DuckDB, +0.0 in
            # Spark).  -0.0 == 0.0, so normalize the rendering.
            return "0"
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


# Row counts above which compare() switches to the columnar hash fast path.
# The pure-Python normalize+sort is O(rows) Python objects and dominated the
# sf1/sf10 sweep outliers (q34: 194.5 s of 197 at sf1 was harness) -- the
# round-9 verdict asked for a columnar compare so scale sweeps measure
# engines, not the harness.
_FAST_COMPARE_MIN_ROWS = 200_000

_SEP = "chr(31)"
_NULL = "chr(1) || 'N'"


def _fast_col_class(df: pd.DataFrame, c: str) -> str | None:
    """Classify a column for the SQL normalization; None = not fast-safe."""
    dt = df[c].dtype
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_integer_dtype(dt) or pd.api.types.is_bool_dtype(dt):
        return "int"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "ts"
    if dt == object:
        sample = df[c].dropna()
        if len(sample) == 0 or isinstance(sample.iloc[0], str):
            return "str"
    return None


def _fast_norm_expr(c: str, cls: str) -> str:
    q = '"' + c.replace('"', '""') + '"'
    if cls == "float":
        # %.12g mirrors the slow path's 12-significant-digit absorption of
        # sub-ulp engine differences (same C printf semantics); +0.0 added
        # first so IEEE -0.0 renders '0' like the slow path (q136's sf1
        # negative-zero finding).
        e = f"printf('%.12g', CAST({q} AS DOUBLE) + 0.0)"
    elif cls == "ts":
        e = f"strftime(CAST({q} AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%f')"
    else:
        e = f"CAST({q} AS VARCHAR)"
    return f"coalesce({e}, {_NULL})"


def _fast_multiset_hash(df: pd.DataFrame, exprs: list[str]) -> tuple[int, int]:
    """(rows, order-insensitive 128-bit-safe hash) via DuckDB: every row is
    normalized IDENTICALLY for both engines' frames by the same vectorized
    SQL, hashed, and SUMmed (HUGEINT -- exact), so multiset equality of the
    normalized rows is compared without building Python objects."""
    con = duckdb.connect()
    try:
        con.register("t", df)
        row = con.execute(
            f"SELECT COUNT(*), SUM(CAST(hash(concat_ws({_SEP}, "
            f"{', '.join(exprs)})) AS HUGEINT)) FROM t"
        ).fetchone()
        return int(row[0]), int(row[1]) if row[1] is not None else 0
    finally:
        con.close()


def _try_fast_compare(sdf: pd.DataFrame, ddf: pd.DataFrame, cols: list[str]) -> bool | None:
    """Columnar multiset compare; None = dtypes not fast-safe, fall back."""
    exprs = []
    for c in cols:
        cls_s, cls_d = _fast_col_class(sdf, c), _fast_col_class(ddf, c)
        if cls_s is None or cls_s != cls_d:
            return None
        exprs.append(_fast_norm_expr(c, cls_s))
    return _fast_multiset_hash(sdf, exprs) == _fast_multiset_hash(ddf, exprs)


def compare(spark: SparkSession, sf_dir: str, fn, sql: str) -> dict:
    """Run query + oracle; return a result dict (ok, counts, first diff).

    Per-engine wall times are reported (spark_sec / duckdb_sec) so sweep
    outliers attribute to the right side -- a 469 s q151 line at sf1 read
    as "engine problem" until the split showed where the time went
    (round-11 note)."""
    import time as _time

    t0 = _time.time()
    sdf = fn(spark, sf_dir).toPandas()
    t1 = _time.time()
    con = duckdb_connection(sf_dir)
    ddf = con.sql(sql).df()
    con.close()
    t2 = _time.time()
    res: dict[str, Any] = {
        "spark_rows": len(sdf),
        "duckdb_rows": len(ddf),
        "spark_cols": sorted(sdf.columns),
        "duckdb_cols": sorted(ddf.columns),
        "spark_sec": round(t1 - t0, 1),
        "duckdb_sec": round(t2 - t1, 1),
    }
    if sorted(sdf.columns) != sorted(ddf.columns):
        res["ok"] = False
        res["why"] = "column mismatch"
        return res
    if len(sdf) != len(ddf):
        res["ok"] = False
        res["why"] = "row count mismatch"
        return res
    cols = sorted(sdf.columns)
    if len(sdf) >= _FAST_COMPARE_MIN_ROWS:
        fast = _try_fast_compare(sdf, ddf, cols)
        if fast is True:
            res["ok"] = True
            res["fast_path"] = True
            return res
        # fast is False -> provably different, but fall through to the slow
        # path anyway so `why` reports the first differing row; fast is None
        # -> dtypes not fast-safe (arrays/decimals), slow path is the check.
    a, b = _normalize(sdf), _normalize(ddf)
    if a != b:
        diff = next((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y)
        res["ok"] = False
        res["why"] = f"value mismatch at sorted row {diff[0]}: spark={diff[1]} duckdb={diff[2]}"
        return res
    res["ok"] = True
    return res
