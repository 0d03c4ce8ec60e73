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


# The driver's correctness harness verified exactly the FIRST 50 registry
# entries in round 1 (CORRECTNESS_r01.json), leaving 43 registered queries
# without a row. Coverage is therefore ROTATED: names listed here surface
# first (in this order) so every query the driver has not yet verified —
# plus any whose semantics changed this round — gets a row next run.
# Remaining queries keep registration order behind them.
_VERIFY_FIRST: list[str] = [
    # Never driver-verified, ordered so that if the driver caps the run
    # (~50 rows in round 1), the environment-SENSITIVE categories get rows
    # first: streaming drives real micro-batch execution on the driver's
    # default session, UDFs cross the Arrow boundary, delta/format queries
    # write real files, iterative ops run driver-sequenced jobs. Pure-SQL
    # TPC-H shapes (locally verified side-by-side, lowest env risk) go last.
    # -- streaming (7)
    "stream_tumbling_hourly",
    "stream_dedup_within_watermark",
    "stream_sliding_windows",
    "stream_session_windows",
    "stream_stream_join",
    "stream_static_join",
    "stream_stateful_user_stats",
    # -- UDF/UDTF over Arrow (4)
    "udf_pandas_scalar",
    "udf_grouped_agg",
    "udf_apply_in_pandas",
    "udtf_explode_buckets",
    # -- windows (7)
    "window_topk_per_segment",
    "window_running_totals",
    "window_rank_ntile",
    "window_frame_moving_avg",
    "window_range_frame",
    "window_value_functions",
    "dedup_keepfirst_events",
    # -- set ops (3)
    "setop_union_distinct",
    "setop_intersect",
    "setop_except",
    # -- similarity / vector (6)
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "pq_encode_codes",
    "ann_pq_adc_topk",
    # -- transactional / file-writing (4)
    "delta_merge_upsert_read",
    "delta_time_travel_stats",
    "sink_csv_roundtrip",
    "sink_json_roundtrip",
    # -- iterative, driver-sequenced (3)
    "dedup_cluster_components",
    "dedup_cluster_stats",
    "kmeans_lloyd_centroids",
    # -- skew (2)
    "skew_salted_agg",
    "skew_salted_join",
    # -- subqueries / misc relational (6)
    "subq_correlated_scalar",
    "subq_in_filter",
    "agg_percentiles",
    "sort_global_topn",
    "unpivot_measures",
    "join_events_enrichment",
    # -- new data-management ops (5)
    "sample_stratified_hash",
    "cap_docs_per_source",
    "profile_table_stats",
    "layout_zorder_stats",
    "join_range_banded",
    # -- changed since the round-1 row (2)
    "array_map_battery",
    "join_anti_not_exists",
    # -- TPC-H shapes, never verified but pure SQL (14)
    "q4_order_priority",
    "q9_product_profit",
    "q11_important_stock",
    "q21_suppliers_kept_waiting",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q18_large_volume_orders",
    "q19_disjunctive_predicates",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier_counts",
    "q20_part_supply_chain",
    "q22_global_sales_opportunity",
]


def _ordered(d: dict[str, Any]) -> dict[str, Any]:
    first = {n: d[n] for n in _VERIFY_FIRST if n in d}
    rest = {n: v for n, v in d.items() if n not in first}
    return {**first, **rest}


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return _ordered(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every operator module exactly once so registrations run."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregates,
        clustering,
        dedup,
        events,
        formats,
        graph,
        joins,
        llm_prep,
        merge,
        multimodal,
        normalize,
        pq,
        profiling,
        sampling,
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
