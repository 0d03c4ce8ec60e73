"""Set operators (SURVEY.md §2.7 + §2.9 "set ops").

The reference has only UNION ALL (pd.concat over month parts,
src/movie.py:294). This module ships union/unionByName, intersect,
exceptAll, and the union→distinct merge that reproduces the reference's
concat→dedup master-merge (src/movie.py:294-295).

Scale notes: UNION ALL is free (no shuffle — partitions concatenate);
INTERSECT / EXCEPT / DISTINCT each shuffle once on the full row. The
union→distinct pattern aggregates partially map-side before shuffling.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

__all__ = ["union_all"]


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """U1 parity: n-ary union by column name (reference concat,
    src/movie.py:294 — positional there, by-name here so schema drift can't
    silently misalign columns)."""
    return reduce(lambda a, b: a.unionByName(b), dfs)


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_custkey FROM (
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
    )
    GROUP BY c_custkey
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference master-merge shape: union all parts, then global dedup
    (src/movie.py:294-295)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    b = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("c_custkey"))
    return union_all([a, b]).distinct()


@register(
    "setop_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@register(
    "setop_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o).distinct()
