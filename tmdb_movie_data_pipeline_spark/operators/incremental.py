"""Incremental aggregate maintenance: materialized-view upkeep without
rescanning history.

The batch analogue of a streaming stateful aggregation: persist the
ALGEBRAIC state of an aggregate (counts and quantized sums — everything
partial-aggregable), then fold each new batch into the state by summing
partials. The refreshed result is provably identical to re-aggregating the
full input — which is exactly what the registered oracle checks.

At 100 TB this is the difference between an O(delta) nightly refresh and an
O(history) one: the state relation is |groups| rows regardless of input
size, the new batch is scanned once, and the merge is a groupBy over
|groups| + |batch groups| rows. Only algebraic aggregates qualify (sum,
count, min, max — avg as sum/count at the end); holistic ones (median)
don't decompose, the same constraint Spark's own partial aggregation has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, scratch_dir
from ..registry import register

_SPLIT = "1996-01-01"  # history < split; the "new batch" is >= split


def _cents(col: str):
    return F.round(F.col(col) * 100, 0).cast("long")


def _partial(df: DataFrame) -> DataFrame:
    """The algebraic state: per-priority count + exact total cents."""
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_cents("o_totalprice")).cast("long").alias("total_cents"),
    )


@register(
    "incremental_agg_maintenance",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY 1
    """,
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a per-priority order rollup incrementally: aggregate the
    history ONCE into a persisted state table, then refresh by merging the
    new batch's partials into the state — and return the refreshed rollup,
    which the oracle checks against a from-scratch aggregation of all rows.

    The returned DataFrame's lineage reads the state PARQUET plus the
    new-batch scan only — the history rows are not re-read at refresh time
    (that is the point; tests/test_plans.py pins it)."""
    orders = load_table(spark, sf_dir, "orders")
    history = orders.filter(F.col("o_orderdate") < F.lit(_SPLIT).cast("date"))
    batch = orders.filter(F.col("o_orderdate") >= F.lit(_SPLIT).cast("date"))

    state_path = scratch_dir("aggstate_")
    _partial(history).write.mode("overwrite").parquet(state_path)

    state = spark.read.parquet(state_path)
    merged = state.unionByName(_partial(batch))
    return merged.groupBy("o_orderpriority").agg(
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.sum("total_cents").cast("long").alias("total_cents"),
    )
