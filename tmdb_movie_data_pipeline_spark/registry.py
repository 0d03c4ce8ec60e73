"""Query registry — the single source of truth behind ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus (whenever SQL-expressible) a DuckDB
oracle SQL string computing the identical result on the identical tables.
The driver's correctness harness compares the two by row count + schema +
order-insensitive value hash, so registered pairs MUST:

* alias every computed column identically on both sides;
* round floating-point outputs identically on both sides (summation order
  differs between engines — see ``round`` helpers in functions/);
* break every ranking/limit tie with a unique key (order-insensitive hashing
  still needs a deterministic row SET).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a driver-facing query, optionally with its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every operator module exactly once so registrations run."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregates,
        dedup,
        events,
        joins,
        llm_prep,
        merge,
        multimodal,
        normalize,
        scalars,
        setops,
        similarity,
        skew,
        subqueries,
        text,
        tpch_extra,
        udfs,
        windows,
    )
    from .streaming import queries as streaming_queries  # noqa: F401

    _LOADED = True


def run_query(spark: SparkSession, name: str, sf_dir: str) -> Any:
    _ensure_loaded()
    return _QUERIES[name](spark, sf_dir)
