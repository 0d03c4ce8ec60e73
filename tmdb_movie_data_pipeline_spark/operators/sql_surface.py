"""Spark 4 SQL-surface battery (SURVEY.md §2.9 extensions).

The modern SQL entry points a Spark 4 user reaches for — pipe syntax,
named-parameter queries, EXECUTE IMMEDIATE, SQL scripting blocks, and
collation-aware semantics — each registered as an oracle-checked query so
the SURFACE itself (parsing, binding, execution) sits under the
correctness gate, not just the relational algebra underneath. DuckDB
speaks none of these dialects; every oracle states the equivalent ANSI
SQL, which is exactly the point: the pair pins that the sugar lowers to
the same relation.

The reference drives everything through hand-built pandas calls
(reference src/movie.py throughout); these are the query-language front
doors its users gain by switching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

# -- SQL pipe syntax -------------------------------------------------------------


@register(
    "sql_pipe_syntax_report",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY l_returnflag
    ORDER BY sum_qty DESC, l_returnflag
    LIMIT 2
    """,
)
def pipe_syntax_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0, `|>`): the linear FROM-first dialect —
    scan |> filter |> aggregate |> order |> limit — executed VERBATIM
    through spark.sql and hash-checked against the classic nested form.
    A green row pins that the pipe operators lower to the identical
    relation (same filter pushdown, same partial aggregate), i.e. the
    sugar costs nothing; plans confirm the parquet filter still pushes.

    Shape: whatever q1-style scan+agg costs — the dialect adds no
    operator. The pipe text is the artifact under test."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "li_pipe_v"
    )
    return spark.sql(
        """
        FROM li_pipe_v
        |> WHERE l_shipdate >= DATE '1995-01-01'
        |> AGGREGATE COUNT(*) AS n_items,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
           GROUP BY l_returnflag
        |> SELECT l_returnflag, CAST(n_items AS BIGINT) AS n_items, sum_qty
        |> ORDER BY sum_qty DESC, l_returnflag
        |> LIMIT 2
        """
    )


# -- named-parameter SQL ----------------------------------------------------------


@register(
    "sql_parameterized_query",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT)
               AS total_units
    FROM orders
    WHERE o_orderdate >= DATE '1995-06-01'
      AND o_totalprice > 1000
    GROUP BY o_orderpriority
    """,
)
def parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (spark.sql(..., args={...})): the injection-safe
    binding API — `:cutoff` and `:floor` are bound server-side as typed
    literals, never string-spliced. The oracle inlines the same constants,
    so the hash pins that parameter markers bind to exactly the literal
    semantics (date coercion included), and the plan keeps the pushed
    filter a spliced string would also get — safety without a plan tax.

    Shape: plain scan+agg; the BINDING path is the artifact under test."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_param_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS total_units
        FROM ord_param_v
        WHERE o_orderdate >= :cutoff AND o_totalprice > :floor
        GROUP BY o_orderpriority
        """,
        args={"cutoff": "1995-06-01", "floor": 1000},
    ).withColumn("n_orders", F.col("n_orders").cast("long"))


# -- EXECUTE IMMEDIATE ------------------------------------------------------------


@register(
    "sql_execute_immediate",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    HAVING COUNT(*) >= 3
    """,
)
def execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE with USING parameters (Spark 4.0): SQL that
    builds and runs SQL — the dynamic-dispatch primitive migration
    tooling and catalog automation scripts rely on. The query text lives
    in a session variable, the threshold binds positionally via USING,
    and the result must hash-match the static form — pinning that the
    dynamic path neither re-parses differently nor loses the parameter's
    type.

    Shape: the inner query is a broadcast dim join + small agg; the
    DYNAMIC EXECUTION path is the artifact under test."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("sup_ei_v")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nat_ei_v")
    spark.sql("DECLARE OR REPLACE VARIABLE ei_sql STRING")
    spark.sql(
        """SET VAR ei_sql =
        'SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers
         FROM sup_ei_v JOIN nat_ei_v ON s_nationkey = n_nationkey
         GROUP BY n_name HAVING COUNT(*) >= ?'"""
    )
    return spark.sql("EXECUTE IMMEDIATE ei_sql USING 3")


# -- SQL scripting block ------------------------------------------------------------


@register(
    "sql_scripting_block",
    oracle="""
    WITH RECURSIVE it(i, total) AS (
        SELECT 1, CAST((SELECT COUNT(*) FROM orders WHERE o_orderdate
                        BETWEEN DATE '1995-01-01' AND DATE '1995-01-31')
                       AS BIGINT)
        UNION ALL
        SELECT i + 1,
               total + (SELECT COUNT(*) FROM orders
                        WHERE o_orderdate BETWEEN
                              DATE '1995-01-01' + INTERVAL (i) MONTH
                          AND (DATE '1995-01-01' + INTERVAL (i + 1) MONTH)
                              - INTERVAL 1 DAY)
        FROM it WHERE i < 6
    )
    SELECT CAST(6 AS BIGINT) AS n_months,
           CAST(total AS BIGINT) AS orders_h1
    FROM it WHERE i = 6
    """,
)
def scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4.0 BEGIN…END): a procedural block with
    DECLARE'd variables and a WHILE loop accumulating six month-window
    counts — the reference's month-loop backfill driver
    (reference src/movie.py:208-222) expressed INSIDE the engine's SQL
    dialect instead of Python. The oracle computes the same total with a
    recursive CTE, pinning loop bounds and window-edge arithmetic
    (inclusive month ends) exactly.

    Shape: six pruned scans of a month each — the loop is control flow,
    not a data operator; each iteration's filter still pushes to
    parquet. Production would replace the loop body with the partitioned
    writer, as pipeline_month_backfill_e2e does."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_script_v")
    return spark.sql(
        """
        BEGIN
          DECLARE i INT DEFAULT 0;
          DECLARE total BIGINT DEFAULT 0;
          WHILE i < 6 DO
            SET total = total + (
                SELECT COUNT(*) FROM ord_script_v
                WHERE o_orderdate >= DATE'1995-01-01' + MAKE_INTERVAL(0, i)
                  AND o_orderdate <  DATE'1995-01-01' + MAKE_INTERVAL(0, i + 1)
            );
            SET i = i + 1;
          END WHILE;
          SELECT CAST(i AS BIGINT) AS n_months, total AS orders_h1;
        END
        """
    )


# -- collation-aware grouping --------------------------------------------------------


@register(
    "string_collation_groupby",
    oracle="""
    WITH mixed AS (
        SELECT CASE WHEN event_id % 2 = 0 THEN UPPER(event_type)
                    ELSE event_type END AS label
        FROM events
    )
    SELECT LOWER(label) AS label_key,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT label) AS BIGINT) AS n_spellings
    FROM mixed GROUP BY 1
    """,
)
def collation_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4.0 COLLATE UTF8_LCASE): half the
    event-type labels are upper-cased, then grouped under a
    case-insensitive collation — binary grouping would split every type
    in two; the collation merges them while COUNT(DISTINCT) on the BINARY
    value still sees both spellings. This is the engine-level answer to
    the lower()-everywhere idiom: the normalization lives in the type,
    comparisons/joins/aggregations inherit it, and expressions stay
    sargable. The oracle lowers explicitly — same relation, which is the
    contract.

    Shape: map-side case flip, one partial-aggregable groupBy whose key
    carries the collation; the distinct-spellings count rides the same
    exchange."""
    ev = load_table(spark, sf_dir, "events")
    mixed = ev.select(
        F.when(
            F.col("event_id") % 2 == 0, F.upper(F.col("event_type"))
        )
        .otherwise(F.col("event_type"))
        .alias("label")
    )
    mixed.createOrReplaceTempView("ev_coll_v")
    return spark.sql(
        """
        SELECT LOWER(MIN(label COLLATE UTF8_LCASE)) AS label_key,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT label) AS BIGINT) AS n_spellings
        FROM ev_coll_v
        GROUP BY label COLLATE UTF8_LCASE
        """
    )


# -- GROUP BY ALL / ORDER BY ALL -----------------------------------------------------


@register(
    "sql_group_by_all_report",
    oracle="""
    SELECT o_orderpriority,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    GROUP BY o_orderpriority, EXTRACT(YEAR FROM o_orderdate)
    ORDER BY o_orderpriority, order_year, n_orders, total_cents
    """,
)
def group_by_all_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL (Spark 3.4/4.0 sugar): the analyst
    dialect where the engine infers the grouping set (every non-aggregate
    select item) and the sort (every select item) — the fix for the
    classic drift where a column added to SELECT is forgotten in GROUP
    BY and the query errors, or worse, silently double-groups. The
    oracle spells both lists explicitly (DuckDB shares the ALL dialect,
    but pinning against ANSI is the point: the sugar must lower to the
    identical relation with the identical partial-aggregable plan).

    Shape: plain scan + partial/final hash aggregate over ~10 groups;
    the INFERENCE path is the artifact under test."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "ord_gba_v"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM ord_gba_v
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# -- SQL scalar UDFs (CREATE FUNCTION ... RETURN) --------------------------------------


@register(
    "sql_scalar_udf_battery",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(SUM(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bulk
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY l_returnflag
    """,
)
def scalar_udf_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDFs (Spark 4.0 ``CREATE FUNCTION ... RETURNS ... RETURN
    expr``): business logic named INSIDE the catalog — the engine inlines
    the body into the calling plan, so unlike Python UDFs these cost
    nothing (stay in codegen, keep pushdown) and unlike views they
    compose as expressions. Two functions — a money-quantizing
    discounted-price and a CASE-based bulk-flag that CALLS the first
    kind of boundary (UDF-inside-aggregate, UDF-inside-predicate) — are
    exercised through one aggregate; the oracle inlines both bodies,
    pinning that the catalog indirection changes nothing.

    Shape: identical to the plain q1-style scan+agg — the plan must show
    the inlined expressions with the shipdate filter still pushed; the
    CATALOG path is the artifact under test."""
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION gj_disc_cents(
               p DOUBLE, d DOUBLE) RETURNS BIGINT
           RETURN CAST(ROUND(p * (1 - d) * 100) AS BIGINT)"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION gj_is_bulk(q DOUBLE)
           RETURNS INT RETURN CASE WHEN q >= 30 THEN 1 ELSE 0 END"""
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "li_udf_v"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(gj_disc_cents(l_extendedprice, l_discount))
                    AS BIGINT) AS revenue_cents,
               CAST(SUM(gj_is_bulk(l_quantity)) AS BIGINT) AS n_bulk
        FROM li_udf_v
        WHERE l_shipdate >= DATE '1995-01-01'
        GROUP BY l_returnflag
        """
    )


# -- SQL UNPIVOT clause -----------------------------------------------------------------


@register(
    "sql_unpivot_syntax",
    oracle="""
    WITH base AS (
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        FROM lineitem WHERE l_orderkey % 1000 = 0
    )
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
           CAST(ROUND(l_quantity * 100) AS BIGINT) AS val_centi
    FROM base
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount',
           CAST(ROUND(l_discount * 100) AS BIGINT) FROM base
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax',
           CAST(ROUND(l_tax * 100) AS BIGINT) FROM base
    """,
)
def unpivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL UNPIVOT clause (Spark 3.4+; the ANSI-flavored front door
    over the same relational melt `unpivot_measures` expresses with
    stack()): three wide measures become (measure, value) rows in ONE
    single-scan operator, against the UNION ALL triple-scan oracle form.
    A green row pins the clause's column naming, ordering, and
    null-exclusion defaults (all three measures are non-null here, so
    INCLUDE/EXCLUDE NULLS agree — the default is EXCLUDE).

    Shape: one pruned scan, a Generate-style expand, no shuffle — vs the
    oracle's three scans; the 3x fan-out is map-side."""
    load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 1000 == 0
    ).createOrReplaceTempView("li_unpivot_v")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, measure,
               CAST(ROUND(raw_val * 100) AS BIGINT) AS val_centi
        FROM (
            SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
            FROM li_unpivot_v
        ) UNPIVOT (
            raw_val FOR measure IN (
                l_quantity AS `quantity`,
                l_discount AS `discount`,
                l_tax AS `tax`
            )
        )
        """
    )
