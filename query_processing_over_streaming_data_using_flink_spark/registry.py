"""Central registry mapping query names → (Spark callable, DuckDB oracle SQL).

This is the driver contract surface: every operator from SURVEY.md §2
(plus the LLM-data extensions) registers here and is verified against
its oracle at sf0.01. Oracle = None marks genuinely non-SQL-expressible
ops (driver falls back to a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (query_fn, oracle_sql_or_None)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    _REGISTRY[name] = (fn, oracle)


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


_LOADED = False


def _load() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are for their registration side effects.
    from query_processing_over_streaming_data_using_flink_spark.plans import (  # noqa: F401
        suite_relational,
        suite_llm_data,
        suite_streaming,
        tpch,
    )

    _LOADED = True
