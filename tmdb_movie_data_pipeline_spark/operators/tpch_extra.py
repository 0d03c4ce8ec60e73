"""Additional TPC-H-shaped relational coverage (SURVEY.md §2.9 breadth).

Classic analytic shapes beyond q1/q3/q5/q6: conditional aggregation over a
join (q12), left-join distribution (q13), having-on-aggregate with IN (q18),
and disjunctive multi-column predicates (q19). Each exercises a distinct
optimizer path: CASE pushdown, outer-join + two-level aggregation,
aggregate-filtered semi-join, and OR-predicate pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import PRICE_SCALE, qsum, qsum_sql
from ..io import load_table
from ..registry import register


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: join + CASE-bucketed counts (conditional aggregation
    crossing a join boundary)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: left join (zero-order customers survive) + two-level
    aggregation — count per customer, then the distribution of counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q18_large_volume_orders",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           {qsum_sql("l_quantity", 100)} AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 150 * 100
    )
    GROUP BY o_orderkey, o_custkey
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: IN over a HAVING-filtered aggregate (aggregate → semi-join)
    — the 'large volume order' pattern. The HAVING threshold compares exact
    integer sums, so the qualifying set is engine-independent."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")).alias("sq"))
        .filter(F.col("sq") > 150 * 100)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(qsum(F.col("l_quantity"), 100).alias("total_qty"))
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {qsum_sql("l_extendedprice * (1 - l_discount)", PRICE_SCALE)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20)
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of conjunctions across both join sides —
    exercises OR-predicate handling and join-condition placement."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 20))
    )
    return joined.filter(cond).agg(
        qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), PRICE_SCALE).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH target AS (SELECT p_partkey, p_type FROM part WHERE p_size = 10)
    SELECT p_partkey, s_suppkey, ROUND(s_acctbal, 2) AS s_acctbal
    FROM target, lineitem, supplier
    WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
      AND s_acctbal = (
          SELECT MAX(s2.s_acctbal)
          FROM lineitem l2 JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
          WHERE l2.l_partkey = p_partkey
      )
    GROUP BY p_partkey, s_suppkey, s_acctbal
    """,
)
def q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated aggregate subquery selecting the extreme-value
    partner per key (here: the richest supplier that ships each size-10
    part). Equality against MAX picks identical doubles — engine-safe."""
    spark_tables = {
        "t_part_q2": load_table(spark, sf_dir, "part"),
        "t_li_q2": load_table(spark, sf_dir, "lineitem"),
        "t_supp_q2": load_table(spark, sf_dir, "supplier"),
    }
    for name, df in spark_tables.items():
        df.createOrReplaceTempView(name)
    return spark.sql(
        """
        WITH target AS (SELECT p_partkey, p_type FROM t_part_q2 WHERE p_size = 10)
        SELECT p_partkey, s_suppkey, ROUND(s_acctbal, 2) AS s_acctbal
        FROM target, t_li_q2, t_supp_q2
        WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
          AND s_acctbal = (
              SELECT MAX(s2.s_acctbal)
              FROM t_li_q2 l2 JOIN t_supp_q2 s2 ON l2.l_suppkey = s2.s_suppkey
              WHERE l2.l_partkey = p_partkey
          )
        GROUP BY p_partkey, s_suppkey, s_acctbal
        """
    )
