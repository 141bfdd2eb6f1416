"""Oracle-checked query registry (the driver contract).

Every implemented operator from SURVEY.md section 2 registers here as a named
query: a `(spark, sf_dir) -> DataFrame` builder plus (when SQL-expressible) a
DuckDB oracle SQL string over the same tables.  `__spark_entry__.py` exposes
this registry verbatim.

Registration is import-driven: importing this package pulls in every query
module, each of which calls `register(...)` at import time.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None = None, doc: str = ""):
    """Decorator: register a query builder under `name`."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(name=name, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def all_queries() -> dict[str, Query]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {n: q.fn for n, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {n: q.sql for n, q in _REGISTRY.items() if q.sql is not None}


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import every query module for its registration side effects.
    from . import relational  # noqa: F401
    from . import tpch  # noqa: F401
    from . import tpch_more  # noqa: F401
    from . import joins  # noqa: F401
    from . import aggregates  # noqa: F401
    from . import advanced  # noqa: F401
    from . import extras  # noqa: F401
    from . import windows  # noqa: F401
    from . import scalar  # noqa: F401
    from . import scalar2  # noqa: F401
    from . import llm  # noqa: F401
    from . import streaming  # noqa: F401

    _LOADED = True
