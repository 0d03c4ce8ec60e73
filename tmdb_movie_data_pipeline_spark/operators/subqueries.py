"""Subquery & advanced relational operators (SURVEY.md §2.9 breadth).

Correlated scalar subqueries, IN-subqueries, exact percentiles, global
top-k, unpivot, and a fact-enrichment join — the second ring of relational
coverage around the §2 core.

Scale notes: Catalyst de-correlates the scalar subquery into an aggregate +
join (no per-row re-execution); the IN-subquery plans as a left-semi join;
global top-k is TakeOrderedAndProject (per-partition heads + driver merge,
never a full sort). Percentiles here are exact (single shuffle per group);
at 100 TB switch callers to approx_percentile — same call site, sketch-based.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import MONEY_SCALE, PRICE_SCALE, qsum, qsum_sql, round2
from ..io import load_table
from ..registry import register


# TPC-H Q17 shape: lineitems under 40% of their part's average quantity.
# The correlated avg is computed as an exact quantized-integer average in
# BOTH engines — a raw double AVG would be summation-order-dependent and the
# `< 0.4·avg` predicate can sit exactly on a representable tie (integer
# quantities make 0.4·avg hit integers), so the exact form is load-bearing.
_Q17_AVG = (
    "(CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)"
    " / CAST(COUNT(l_quantity) AS DOUBLE)) / CAST(100 AS DOUBLE)"
)


@register(
    "subq_correlated_scalar",
    oracle=f"""
    SELECT l_partkey AS partkey,
           {qsum_sql("l_extendedprice", MONEY_SCALE)} AS lost_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l1
    WHERE l_quantity < 0.4 * (
        SELECT {_Q17_AVG.replace("ROUND(l_quantity * 100, 0)", "ROUND(l_quantity * 100)")}
        FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
    )
    GROUP BY l_partkey
    """,
)
def correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst de-correlates it into an
    aggregate + join (no per-row re-execution)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("t_li_q17")
    return spark.sql(
        f"""
        SELECT l_partkey AS partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * {MONEY_SCALE}, 0) AS BIGINT)) AS DOUBLE)
                   / CAST({MONEY_SCALE} AS DOUBLE) AS lost_revenue,
               COUNT(*) AS n_lines
        FROM t_li_q17 l1
        WHERE l_quantity < 0.4 * (
            SELECT {_Q17_AVG}
            FROM t_li_q17 l2 WHERE l2.l_partkey = l1.l_partkey
        )
        GROUP BY l_partkey
        """
    )


@register(
    "subq_in_filter",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
    GROUP BY c_mktsegment
    """,
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("t_cust_in")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("t_ord_in")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n
        FROM t_cust_in
        WHERE c_custkey IN (SELECT o_custkey FROM t_ord_in WHERE o_totalprice > 150000)
        GROUP BY c_mktsegment
        """
    )


@register(
    "agg_percentiles",
    # exact percentiles over quantized ints at binary-exact fractions
    # (0.25/0.5/0.75): interpolation a+(b-a)·f is exact in both engines
    oracle=f"""
    SELECT l_returnflag,
           quantile_cont(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.25) / 100.0 AS p25,
           quantile_cont(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.5)  / 100.0 AS p50,
           quantile_cont(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.75) / 100.0 AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return li.groupBy("l_returnflag").agg(
        (F.percentile(q, F.lit(0.25)) / 100.0).alias("p25"),
        (F.percentile(q, F.lit(0.5)) / 100.0).alias("p50"),
        (F.percentile(q, F.lit(0.75)) / 100.0).alias("p75"),
    )


@register(
    "sort_global_topn",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def global_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2 parity (reference: popularity-desc order + page cap → top-10k,
    src/movie.py:153,161-168): ORDER BY + LIMIT plans as
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select(
            "o_orderkey",
            round2(F.col("o_totalprice")).alias("totalprice"),
            "o_orderpriority",
        )
    )


@register(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, ROUND(val, 2) AS val
    FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
        FROM lineitem WHERE l_orderkey % 1000 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount
        FROM lineitem WHERE l_orderkey % 1000 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax
        FROM lineitem WHERE l_orderkey % 1000 = 0
    )
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide measures → (measure, val) rows via stack() —
    single scan, no shuffle (vs the UNION ALL triple-scan oracle form)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 1000 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax)"
            " AS (measure, raw_val)"
        ),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "measure",
        round2(F.col("raw_val")).alias("val"),
    )


@register(
    "join_events_enrichment",
    oracle=f"""
    SELECT c_mktsegment, event_type,
           CAST(COUNT(*) AS BIGINT)        AS n_events,
           {qsum_sql("value", 1_000_000)}  AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    """,
)
def events_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-fact × dimension enrichment: events joined to customer on the
    user key (broadcast — the dimension is small), then segment rollup."""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            qsum(F.col("value"), 1_000_000).alias("sum_value"),
        )
    )
