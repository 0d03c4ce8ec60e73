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

from ..functions import MONEY_SCALE, PRICE_SCALE, qsum, qsum_sql
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


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           {qsum_sql("l_extendedprice * (1 - l_discount)", PRICE_SCALE)} AS revenue
    FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                  JOIN orders   ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN nation n1 ON s_nationkey = n1.n_nationkey
                  JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bidirectional nation-pair trade volume — OR of symmetric
    predicates over two broadcast dimension joins + year rollup."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(
            qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), PRICE_SCALE).alias(
                "revenue"
            )
        )
    )


@register(
    "q8_market_share",
    # market share = target nation's revenue / all revenue per year — a
    # ratio of two exact quantized sums (one IEEE division)
    oracle="""
    WITH flows AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS vol,
               n_name
        FROM lineitem JOIN orders   ON o_orderkey = l_orderkey
                      JOIN supplier ON s_suppkey = l_suppkey
                      JOIN nation   ON s_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN vol ELSE 0 END) AS DOUBLE)
               / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM flows
    GROUP BY o_year
    """,
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    vol = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0).cast("long")
    flows = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.year("o_orderdate").cast("int").alias("o_year"), vol.alias("vol"), "n_name")
    )
    return flows.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("n_name") == "NATION_3", F.col("vol")).otherwise(0)).cast("double")
            / F.sum("vol").cast("double")
        ).alias("mkt_share")
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {qsum_sql("l_extendedprice * (1 - l_discount)", PRICE_SCALE)} AS revenue,
           n_name
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by returned-item revenue (join + agg +
    TakeOrderedAndProject; deterministic tie-break on custkey)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            qsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), PRICE_SCALE).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p_type LIKE 'TYPE_1%'
                    THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                    ELSE 0 END) AS DOUBLE) * 100.0
           / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                  AS DOUBLE) AS promo_pct,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share — LIKE-classified conditional sum over
    a broadcast join, emitted as an exact ratio × 100."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    vol = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0).cast("long")
    joined = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    return joined.agg(
        (
            F.sum(F.when(F.col("p_type").like("TYPE_1%"), vol).otherwise(0)).cast("double")
            * 100.0
            / F.sum(vol).cast("double")
        ).alias("promo_pct"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS suppkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                    AS BIGINT) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the maximum quarterly revenue —
    aggregate view + equality against its own MAX (exact ints: the winner
    set is engine-independent even under ties)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    vol = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0).cast("long")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(F.sum(vol).alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("m"))
    return (
        s.join(rev, s.s_suppkey == rev.suppkey)
        .join(F.broadcast(mx), F.col("total_rev") == F.col("m"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q16_parts_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 7, 10, 13)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts with a NOT IN exclusion list
    (anti-join against a filtered dimension)."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 7, 10, 13)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_part_supply_chain",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
        GROUP BY l_suppkey
        HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 50 * 100
    )
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested IN chains (suppliers shipping enough of the matching
    parts) — two semi-join levels above an exact-int HAVING."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("t_supp_q20")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("t_li_q20")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("t_part_q20")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM t_supp_q20
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM t_li_q20
            WHERE l_partkey IN (SELECT p_partkey FROM t_part_q20 WHERE p_name LIKE '%bolt%')
            GROUP BY l_suppkey
            HAVING SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) > 50 * 100
        )
        """
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH positive AS (
        SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avg_bal_cents
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_bal_cents
    FROM customer, positive
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > avg_bal_cents
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 480000)
    GROUP BY c_nationkey
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no very large (>480k)
    order — scalar-average subquery (exact cents) + NOT EXISTS anti-join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(cents).cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "avg_bal_cents"
            )
        )
    )
    return (
        c.withColumn("bal_cents", cents)
        .join(F.broadcast(avg_bal), F.col("bal_cents").cast("double") > F.col("avg_bal_cents"))
        .join(
            o.filter(F.col("o_totalprice") > 480000),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum("bal_cents").cast("long").alias("total_bal_cents"),
        )
    )


# -- round-2 additions: the four remaining canonical TPC-H shapes ------------
# Testdata lacks partsupp / l_commitdate / l_receiptdate, so (as with
# q2/q16/q20) each shape is re-keyed onto the columns that exist while
# preserving the optimizer path the canonical query exercises:
#   q4  EXISTS with a correlation-crossing date predicate -> "late" means
#       l_shipdate > o_orderdate + 60 days (the commit/receipt comparison)
#   q9  profit rollup over a 5-way join -> supply cost proxied by
#       p_retailprice * 0.5
#   q11 value-concentration HAVING against an uncorrelated scalar subquery
#       -> lineitem is the part-supplier bridge
#   q21 multi-EXISTS anti pattern, unchanged shape


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS whose predicate compares columns across the
    correlation boundary (a late line vs its order's date). Catalyst plans
    the correlated EXISTS as a left-semi hash join on l_orderkey with the
    date comparison as a join-side condition — no subquery re-execution."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {qsum_sql("l_extendedprice * (1 - l_discount) - p_retailprice * 0.5 * l_quantity", MONEY_SCALE)} AS profit
    FROM lineitem JOIN part     ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN orders   ON o_orderkey = l_orderkey
                  JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit rollup over a 5-way join (lineitem at the center,
    part filtered by name, supplier -> nation, orders for the year). part /
    supplier / nation broadcast; the only shuffle is the final (nation,
    year) aggregate, entered already partially combined. Supply cost is
    proxied as p_retailprice * 0.5 (no partsupp in testdata); the profit
    expression is written in the identical operation order in both engines
    and quantized per-row before summing."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.lit(0.5) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(qsum(profit, MONEY_SCALE).alias("profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH supplied AS (
        SELECT l_partkey,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS val_cents
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        WHERE s_nationkey < 5
    ),
    total AS (SELECT CAST(SUM(val_cents) AS DOUBLE) AS total_cents FROM supplied)
    SELECT l_partkey AS partkey,
           CAST(SUM(val_cents) AS BIGINT) AS value_cents
    FROM supplied, total
    GROUP BY l_partkey, total_cents
    HAVING CAST(SUM(val_cents) AS DOUBLE) > total_cents * 0.002
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: value concentration — per-part value share vs a global
    threshold computed by an uncorrelated scalar subquery. The global total
    is a 1-row broadcast; both the per-part and global sums are exact
    integer (cent) aggregates, compared in DOUBLE with one IEEE multiply so
    the HAVING cut is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    supplied = li.join(
        F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey")
    ).select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("val_cents"),
    )
    total = supplied.agg(F.sum("val_cents").cast("double").alias("total_cents"))
    per_part = supplied.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum("val_cents").cast("long").alias("value_cents")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents").cast("double") > F.col("total_cents") * 0.002)
        .select("partkey", "value_cents")
    )


@register(
    "q21_suppliers_kept_waiting",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the multi-EXISTS anti pattern — for each finalized order,
    the sole supplier whose lines shipped late while every co-supplier
    shipped on time. One semi join (another supplier participated) and one
    anti join (no other supplier was late) over the same (orderkey,
    suppkey-differs) key; both plan as hash joins keyed on l_orderkey, so
    the correlation never re-executes."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    base = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    l1 = base.filter(F.col("is_late"))
    others = base.select(
        F.col("l_orderkey").alias("ok2"),
        F.col("l_suppkey").alias("sk2"),
        F.col("is_late").alias("late2"),
    )
    co_supplied = (F.col("l_orderkey") == F.col("ok2")) & (
        F.col("l_suppkey") != F.col("sk2")
    )
    sole_late = (
        l1.join(others, co_supplied, "left_semi")
        .join(others.filter(F.col("late2")), co_supplied, "left_anti")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        sole_late.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
