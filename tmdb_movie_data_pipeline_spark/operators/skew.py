"""Skew-mitigation utilities (SURVEY.md §4 R8; the 100 TB contract).

AQE's skew-join splitting handles most hot keys at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py). These utilities are
the *static* complement for the cases AQE can't fix:

* ``salted_agg`` — two-phase aggregation for high-cardinality-per-key
  reducers: rows are spread over ``salt`` sub-keys, partially aggregated,
  then re-aggregated per real key. The hot key's rows hit ``salt``
  reducers instead of one. Works for any algebraic aggregate
  (sum/count/min/max).
* ``salted_broadcast_left`` — replicate the small side ``salt`` times and
  salt the big side's key so a broadcast join's *output* partitioning
  doesn't concentrate hot keys downstream.

The registered query pins the semantics: salted and unsalted sums must be
identical (quantized-int sums are order-independent, so this is exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

__all__ = ["salted_agg"]


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``agg_exprs`` maps output name → aggregate over the *input* (phase 1);
    phase 2 re-aggregates phase-1 partials with the matching combiner
    (sum→sum, count→sum, min→min, max→max — caller supplies phase-1 exprs,
    this helper re-combines sums/counts by summing and mins/maxes by
    min/max based on the expression's aggregate function name).
    """
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[expr.alias(f"_p1_{name}") for name, expr in agg_exprs.items()]
    )
    combiners = []
    for name, expr in agg_exprs.items():
        fn = expr._jc.toString().split("(")[0].lower()  # noqa: SLF001
        col = F.col(f"_p1_{name}")
        if fn.startswith("min"):
            combiners.append(F.min(col).alias(name))
        elif fn.startswith("max"):
            combiners.append(F.max(col).alias(name))
        else:  # sum / count partials combine by summing
            combiners.append(F.sum(col).alias(name))
    return phase1.groupBy(*key_cols).agg(*combiners)


@register(
    "skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
           CAST(COUNT(*) AS BIGINT)  AS n,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_key
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-key aggregation (maximally skewed: 600k rows / 3 keys) computed via
    16-way salting — results must equal the direct plan exactly, which the
    oracle (direct SQL) checks."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty_cents": F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")),
            "n": F.count(F.lit(1)),
            "min_key": F.min("l_orderkey"),
            "max_key": F.max("l_orderkey"),
        },
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty_cents").cast("long").alias("sum_qty_cents"),
        F.col("n").cast("long").alias("n"),
        F.col("min_key").cast("long").alias("min_key"),
        F.col("max_key").cast("long").alias("max_key"),
    )
