"""Grouped aggregation operators (SURVEY.md §2.5, §2.9 "grouped aggregations").

The reference's only aggregations are dedup + count (src/movie.py:275,295,296);
this module supplies the full grouped-aggregation menu the harness checks:
multi-agg groupBy, filtered aggregates, count(distinct), rollup, cube,
grouping sets, and a manual pivot.

Scale notes: every query here is a partial+final HashAggregate — map-side
combine happens before the shuffle, so network traffic is O(groups), not
O(rows). Double-typed aggregates use quantized-integer summation
(functions/numeric.py) so results are order-independent: correct under AQE
re-planning, speculative execution, and any partitioning — and bit-equal to
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import (
    MONEY_SCALE,
    bucket_offsets,
    PRICE_SCALE,
    UNIT_SCALE,
    qavg,
    qavg_sql,
    qsum,
    qsum_sql,
    quantize,
    round2,
)
from ..io import load_table
from ..registry import register
from .clustering import _CAL_POS_LANG as _CAL_POS_LANG_REF

__all__ = ["pricing_summary"]


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter → groupBy → 8 aggregates.

    The flagship query (SURVEY.md §7.1) — same dataflow shape as the
    reference's core loop (pushed-down filter scan → transform → aggregate,
    src/movie.py:260-282), expressed declaratively so Catalyst plans a
    Parquet scan with predicate pushdown + column pruning feeding a
    partial/final hash aggregate inside whole-stage codegen.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            qsum(F.col("l_quantity"), MONEY_SCALE).alias("sum_qty"),
            qsum(F.col("l_extendedprice"), MONEY_SCALE).alias("sum_base_price"),
            qsum(disc_price, PRICE_SCALE).alias("sum_disc_price"),
            qsum(charge, PRICE_SCALE).alias("sum_charge"),
            qavg(F.col("l_quantity"), MONEY_SCALE).alias("avg_qty"),
            qavg(F.col("l_extendedprice"), MONEY_SCALE).alias("avg_price"),
            qavg(F.col("l_discount"), UNIT_SCALE).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {qsum_sql("l_quantity", MONEY_SCALE)}                                AS sum_qty,
           {qsum_sql("l_extendedprice", MONEY_SCALE)}                           AS sum_base_price,
           {qsum_sql("l_extendedprice * (1 - l_discount)", PRICE_SCALE)}        AS sum_disc_price,
           {qsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", PRICE_SCALE)} AS sum_charge,
           {qavg_sql("l_quantity", MONEY_SCALE)}                                AS avg_qty,
           {qavg_sql("l_extendedprice", MONEY_SCALE)}                           AS avg_price,
           {qavg_sql("l_discount", UNIT_SCALE)}                                 AS avg_disc,
           COUNT(*)                                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pricing_summary(load_table(spark, sf_dir, "lineitem"))


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {qsum_sql("l_extendedprice * l_discount", PRICE_SCALE)} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter+sum: exercises conjunctive predicate pushdown (F1/F2
    semantics, reference src/movie.py:148-156) and a single global agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            qsum(F.col("l_extendedprice") * F.col("l_discount"), PRICE_SCALE).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "agg_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey)                 AS n_orders,
           COUNT(DISTINCT l_partkey)                  AS n_parts,
           CAST(SUM(l_linenumber) AS BIGINT)          AS sum_lines,
           ROUND(MIN(l_extendedprice), 2)             AS min_price,
           ROUND(MAX(l_extendedprice), 2)             AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) ×2 + min/max — Catalyst plans multi-distinct via
    expand, still one shuffle keyed on the group column. min/max pick single
    values, identical doubles in any engine — plain rounding is safe."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.sum("l_linenumber").cast("long").alias("sum_lines"),
        round2(F.min("l_extendedprice")).alias("min_price"),
        round2(F.max("l_extendedprice")).alias("max_price"),
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT)                AS n,
           {qsum_sql("l_quantity", MONEY_SCALE)}   AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        qsum(F.col("l_quantity"), MONEY_SCALE).alias("sum_qty"),
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT)                 AS n,
           {qsum_sql("o_totalprice", MONEY_SCALE)}  AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        qsum(F.col("o_totalprice"), MONEY_SCALE).alias("sum_price"),
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT)                 AS n,
           {qavg_sql("o_totalprice", MONEY_SCALE)}  AS avg_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("t_orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               (CAST(SUM(CAST(ROUND(o_totalprice * {MONEY_SCALE}, 0) AS BIGINT)) AS DOUBLE)
                / CAST(COUNT(o_totalprice) AS DOUBLE)) / CAST({MONEY_SCALE} AS DOUBLE)
                        AS avg_price
        FROM t_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "agg_pivot_status",
    oracle=f"""
    SELECT l_returnflag,
           {qsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END", MONEY_SCALE)}
                                                                               AS qty_open,
           {qsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END", MONEY_SCALE)}
                                                                               AS qty_filled,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot expressed as conditional aggregation (portable column names;
    `.pivot()` produces the same plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    is_o = F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(F.lit(0.0))
    is_f = F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(F.lit(0.0))
    return li.groupBy("l_returnflag").agg(
        qsum(is_o, MONEY_SCALE).alias("qty_open"),
        qsum(is_f, MONEY_SCALE).alias("qty_filled"),
        F.sum(F.when(F.col("l_linestatus") == "O", 1).otherwise(0)).cast("long").alias("n_open"),
        F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0)).cast("long").alias("n_filled"),
    )


@register(
    "agg_approx_distinct",
    # approx_count_distinct is engine-specific (HLL++ in Spark), so the
    # hash-checked oracle covers the exact counts; the approximate column is
    # asserted within 5% of exact by the unit tests instead.
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS exact_custs,
           CAST(COUNT(*) AS BIGINT)  AS n_orders
    FROM orders
    """,
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("exact_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_stats_exact",
    # variance/stddev/corr derived from exact integer power sums:
    # every input to the final float arithmetic is an exact int64, and the
    # float steps are written in the identical order on both sides — so the
    # statistics are bit-equal without touching builtin stddev/corr (whose
    # accumulation order is engine-internal).
    oracle="""
    WITH sums AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT)                                   AS n,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)  AS sx,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)
                        * CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sxx,
               CAST(SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) AS BIGINT) AS sy,
               CAST(SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)
                        * CAST(ROUND(l_discount * 10000) AS BIGINT)) AS BIGINT) AS syy,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)
                        * CAST(ROUND(l_discount * 10000) AS BIGINT)) AS BIGINT) AS sxy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) / 10000.0   AS var_qty,
           SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) / 100.0    AS stddev_qty,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))     AS corr_qty_disc
    FROM sums
    """,
)
def stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / correlation from exact integer power sums
    (n, Σx, Σx², Σy, Σy², Σxy). Builtin stddev/corr stream floats in
    engine-specific order; the power-sum form is order-independent and its
    final float expression is evaluated identically by both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    qx = F.round(F.col("l_quantity") * 100, 0).cast("long")
    qy = F.round(F.col("l_discount") * 10000, 0).cast("long")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qx).alias("sx"),
        F.sum(qx * qx).alias("sxx"),
        F.sum(qy).alias("sy"),
        F.sum(qy * qy).alias("syy"),
        F.sum(qx * qy).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_num = n * sxx - sx * sx
    var_den = n * (F.col("n") - 1).cast("double")
    return sums.select(
        "l_returnflag",
        "n",
        (var_num / var_den / F.lit(10000.0)).alias("var_qty"),
        (F.sqrt(var_num / var_den) / F.lit(100.0)).alias("stddev_qty"),
        ((n * sxy - sx * sy) / F.sqrt(var_num * (n * syy - sy * sy))).alias("corr_qty_disc"),
    )


# -- exact distinct via bitmap words (mergeable, ClickHouse/Doris pattern) ----

#: bits per bitmap word. 63, NOT 64: the high bit would need shiftleft(1, 63),
#: which overflows signed BIGINT — DuckDB raises on it (checked shifts) while
#: Spark wraps, so the 64-bit form can't be bit-identical cross-engine.
#: Capacity cost is 1/64 ≈ 1.6% more words; correctness cost is zero.
_BM_WORD = 63


@register(
    "agg_bitmap_distinct",
    oracle=f"""
    WITH w AS (
        SELECT event_type, user_id // {_BM_WORD} AS word_idx,
               bit_or(1::BIGINT << CAST(user_id % {_BM_WORD} AS INT)) AS wv
        FROM events GROUP BY 1, 2
    ),
    b AS (
        SELECT event_type,
               CAST(SUM(bit_count(wv)) AS BIGINT) AS n_distinct_bitmap,
               CAST(COUNT(*) AS BIGINT) AS n_words
        FROM w GROUP BY 1
    ),
    x AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_exact
        FROM events GROUP BY 1
    )
    SELECT b.event_type, n_distinct_bitmap, n_distinct_exact, n_words
    FROM b JOIN x ON x.event_type = b.event_type
    """,
)
def bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type via bitmap words — the
    groupBitmap pattern ClickHouse/Doris use when approximate (HLL) isn't
    acceptable but a raw COUNT(DISTINCT) shuffle is too heavy.

    Scale shape: the first aggregate keys on (group, id div {_BM_WORD}) and
    bit_or's single-bit words, so the map-side combiner collapses EVERY
    occurrence of a user in a partition into one bit before the exchange —
    the shuffle carries at most one word per (group, occupied word index),
    i.e. O(id_range / {_BM_WORD}) rows per group regardless of event count,
    where COUNT(DISTINCT) expands to one row per (group, user) pair. The
    word states are mergeable by OR exactly like HLL registers are by MAX
    (sketch_hll_union), but lossless — sum(bit_count(word)) is the exact
    cardinality, and the result row carries n_distinct_bitmap NEXT TO
    n_distinct_exact so the equality contract is hash-checked, not assumed.

    The pattern wants DENSE ids (testdata user ids are). For sparse/skewed
    id spaces, dictionary-encode first (dense_rank over the id dimension) —
    the word relation then scales with |distinct ids|, the same compaction
    roaring bitmaps buy. 63-bit words keep the shift inside signed BIGINT
    for engines with checked shifts (see _BM_WORD note)."""
    ev = load_table(spark, sf_dir, "events")
    words = ev.groupBy(
        "event_type", F.expr(f"user_id div {_BM_WORD}").alias("word_idx")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(1L, cast(user_id % {_BM_WORD} as int)))"
        ).alias("wv")
    )
    bm = words.groupBy("event_type").agg(
        F.sum(F.bit_count("wv")).cast("long").alias("n_distinct_bitmap"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_distinct_exact")
    )
    return bm.join(exact, "event_type").select(
        "event_type", "n_distinct_bitmap", "n_distinct_exact", "n_words"
    )


# -- RFM segmentation with DISTRIBUTED exact NTILE ----------------------------

_RFM_K = 5  # quintile scores
_RFM_M_BUCKET = 100_000  # monetary histogram bucket: $1000 in cents


def _dist_ntile(
    df: DataFrame, metric: str, bucket: F.Column, k: int, n: int | None = None
) -> DataFrame:
    """Exact global NTILE(k) ordered by (metric, c_custkey) WITHOUT a
    single-partition window: per-bucket counts (tiny) -> cumulative offsets
    (window over the bucket HISTOGRAM, |buckets| rows) -> global rank =
    offset + bucket-local row_number (window partitioned by bucket, fully
    distributed) -> standard NTILE arithmetic from (rank, n). This is the
    distributed-order-statistics trick the quantile sketch uses, applied to
    ranking: the only non-partitioned state is the histogram.

    ``n`` (the relation's row count) may be passed by callers that already
    know it — r21: chained calls each re-counted ``df``, and because every
    level's plan nests the previous levels, the 2nd/3rd builder counts
    re-executed the whole growing chain at plan-build time (~13 s of the
    15.5 s agg_rfm plan build at sf0.1; the row count is level-invariant,
    so one count on the BASE relation serves all levels). The timed plan
    is unchanged — n is the same integer either way."""
    b = df.withColumn("_b", bucket)
    hist = b.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    off = hist.select(
        "_b",
        (
            F.sum("_c").over(
                W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
            )
        ).alias("_off"),
    ).fillna({"_off": 0})
    wl = W.partitionBy("_b").orderBy(F.asc(metric), F.asc("c_custkey"))
    ranked = (
        b.join(F.broadcast(off), "_b")
        .withColumn("_rank", F.col("_off") + F.row_number().over(wl))
    )
    if n is None:
        n = df.count()  # scalar: |customers|, the same 1-row-probe pattern
    q, r = n // k, n % k
    cut = r * (q + 1)
    score = F.expr(
        f"CASE WHEN _rank <= {cut} THEN 1 + (_rank - 1) div {q + 1} "
        f"ELSE {r} + 1 + (_rank - 1 - {cut}) div {max(q, 1)} END"
    )
    return ranked.withColumn(f"{metric}_score", score.cast("long")).drop(
        "_b", "_off", "_rank"
    )


@register(
    "agg_rfm_segmentation",
    oracle=f"""
    WITH cust AS (
        SELECT o_custkey AS c_custkey,
               CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                    (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
                    AS BIGINT) AS r_days,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
        FROM orders GROUP BY 1
    ),
    scored AS (
        SELECT c_custkey, r_days, n_orders, monetary_cents,
               CAST(NTILE({_RFM_K}) OVER (ORDER BY r_days, c_custkey)
                    AS BIGINT) AS r_score,
               CAST(NTILE({_RFM_K}) OVER (ORDER BY n_orders, c_custkey)
                    AS BIGINT) AS f_score,
               CAST(NTILE({_RFM_K}) OVER (ORDER BY monetary_cents, c_custkey)
                    AS BIGINT) AS m_score
        FROM cust
    )
    SELECT *, CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
              || CAST(m_score AS VARCHAR) AS segment
    FROM scored
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation — the
    classic CRM scoring query — with every NTILE computed by the
    DISTRIBUTED exact-rank construction instead of a global window.

    The oracle uses native NTILE(5) over a total order; the Spark side
    NEVER materializes that order: rank = cumulative-histogram offset +
    row_number WITHIN a histogram bucket (window partitioned by bucket),
    and the quintile comes from the standard NTILE arithmetic
    q = n div k, r = n mod k, first r buckets sized q+1 — so the gate
    proves the distributed formula reproduces NTILE bit-exactly, ties
    broken by c_custkey. The only non-partitioned state is each metric's
    bucket histogram (|distinct days|, |distinct counts|, |$1000 buckets|
    rows); the customer relation itself only ever shuffles by bucket — at
    100 TB no task sees more than one bucket's rows, where NTILE-over-all
    collapses onto ONE task (the anti-pattern this query exists to
    retire). Integer metrics end to end (days, counts, cents)."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("_anchor")
    )
    cust = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("_last"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "c_custkey",
            F.datediff("_anchor", "_last").cast("long").alias("r_days"),
            "n_orders",
            "monetary_cents",
        )
    )
    n = cust.count()  # level-invariant: one count on the base serves all 3
    # r21 session 2 (guide §2.4 — remove duplicated subtree executions):
    # each NTILE level consumes its input TWICE (bucket histogram + rank
    # join) and the next level nests the whole previous tree, so the
    # executed chain ran 44 exchanges / 16 orders scans with zero runtime
    # exchange reuse — the base aggregate executed ~2^3 times. Lazy
    # localCheckpoints on the base and between levels materialize each
    # subtree once INSIDE the first action (the count above stays on the
    # un-checkpointed frame, so plan-build still executes nothing of the
    # timed tree). Interleaved A/B at sf0.1, results asserted identical:
    # cold first-run 0.851 → 0.206 s, steady-state 0.942 → 0.116 s. At
    # 100 TB the same holds: each level's input is |customers| rows that
    # would otherwise re-aggregate the orders relation 2^level times.
    # (§7's rejected alternative restructured the chain itself; this
    # keeps the chain and removes only the re-execution.)
    cust = cust.localCheckpoint(eager=False)
    cust = _dist_ntile(cust, "r_days", F.col("r_days"), _RFM_K, n=n)
    cust = cust.localCheckpoint(eager=False)
    cust = _dist_ntile(cust, "n_orders", F.col("n_orders"), _RFM_K, n=n)
    cust = cust.localCheckpoint(eager=False)
    cust = _dist_ntile(
        cust,
        "monetary_cents",
        F.expr(f"monetary_cents div {_RFM_M_BUCKET}"),
        _RFM_K,
        n=n,
    )
    return cust.select(
        "c_custkey",
        "r_days",
        "n_orders",
        "monetary_cents",
        F.col("r_days_score").alias("r_score"),
        F.col("n_orders_score").alias("f_score"),
        F.col("monetary_cents_score").alias("m_score"),
        F.concat(
            F.col("r_days_score").cast("string"),
            F.col("n_orders_score").cast("string"),
            F.col("monetary_cents_score").cast("string"),
        ).alias("segment"),
    )


# -- Welch A/B t-test from exact integer moments ------------------------------

#: the t statistic's full expression tree over the six integer moments.
#: Division, multiplication, subtraction and sqrt are all IEEE-exact-rounded
#: (sqrt is REQUIRED correctly-rounded by IEEE 754 — unlike ln/exp/pow,
#: which are libm-specific), so evaluating this identical text on exact
#: integer inputs yields bit-identical doubles in both engines.
_TT_STEPS = {
    "ma": "CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)",
    "mb": "CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)",
    "va": "((CAST(qa AS DOUBLE) - (CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))"
    " / CAST(na AS DOUBLE)) / CAST(na - 1 AS DOUBLE))",
    "vb": "((CAST(qb AS DOUBLE) - (CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))"
    " / CAST(nb AS DOUBLE)) / CAST(nb - 1 AS DOUBLE))",
    "sea": "va / CAST(na AS DOUBLE)",
    "seb": "vb / CAST(nb AS DOUBLE)",
    "t_stat": "(ma - mb) / sqrt(sea + seb)",
    "dof": "((sea + seb) * (sea + seb)) / ((sea * sea) / CAST(na - 1 AS DOUBLE)"
    " + (seb * seb) / CAST(nb - 1 AS DOUBLE))",
}


@register(
    "stats_ab_ttest",
    oracle=f"""
    WITH m AS (
        SELECT event_type,
               CAST(COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS BIGINT) AS na,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                    THEN CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT) AS sa,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                    THEN CAST(ROUND(value * 100) AS BIGINT)
                         * CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT) AS qa,
               CAST(COUNT(CASE WHEN user_id % 2 = 1 THEN 1 END) AS BIGINT) AS nb,
               CAST(SUM(CASE WHEN user_id % 2 = 1
                    THEN CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT) AS sb,
               CAST(SUM(CASE WHEN user_id % 2 = 1
                    THEN CAST(ROUND(value * 100) AS BIGINT)
                         * CAST(ROUND(value * 100) AS BIGINT) END) AS BIGINT) AS qb
        FROM events GROUP BY 1
    ),
    d AS (SELECT *, {_TT_STEPS["ma"]} AS ma, {_TT_STEPS["mb"]} AS mb,
                 {_TT_STEPS["va"]} AS va, {_TT_STEPS["vb"]} AS vb FROM m),
    e AS (SELECT *, {_TT_STEPS["sea"]} AS sea, {_TT_STEPS["seb"]} AS seb FROM d)
    SELECT event_type, na AS n_a, nb AS n_b,
           {_TT_STEPS["t_stat"]} AS t_stat, {_TT_STEPS["dof"]} AS dof
    FROM e
    """,
)
def ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test per event type (cohort A = even user ids,
    B = odd — the deterministic stand-in for an experiment assignment):
    t statistic and Welch–Satterthwaite degrees of freedom, the A/B
    readout an experimentation platform computes per metric.

    One conditional-aggregation scan produces the six integer moments per
    group (n, Σx, Σx² per cohort — partial-aggregable, the stats_exact
    recipe); the statistic is then a fixed expression tree over those
    integers, bit-identical cross-engine because every operation in it is
    IEEE-exact-rounded — including sqrt, which 754 requires correctly
    rounded, in contrast to the libm transcendentals the sketch family
    refuses (see _TT_STEPS note). No p-value on purpose: erf/gamma ARE
    transcendental — the t and dof pair is the engine-checkable part, and
    the caller's lookup table is the right home for the tail probability.

    Scale: the moments shuffle is |event_types| rows; nothing else moves."""
    ev = load_table(spark, sf_dir, "events")
    qc = F.round(F.col("value") * 100, 0).cast("long")
    even = F.col("user_id") % 2 == 0
    m = ev.groupBy("event_type").agg(
        F.count(F.when(even, 1)).cast("long").alias("na"),
        F.sum(F.when(even, qc)).cast("long").alias("sa"),
        F.sum(F.when(even, qc * qc)).cast("long").alias("qa"),
        F.count(F.when(~even, 1)).cast("long").alias("nb"),
        F.sum(F.when(~even, qc)).cast("long").alias("sb"),
        F.sum(F.when(~even, qc * qc)).cast("long").alias("qb"),
    )
    d = m.select(
        "*",
        F.expr(_TT_STEPS["ma"]).alias("ma"),
        F.expr(_TT_STEPS["mb"]).alias("mb"),
        F.expr(_TT_STEPS["va"]).alias("va"),
        F.expr(_TT_STEPS["vb"]).alias("vb"),
    )
    e = d.select(
        "*",
        F.expr(_TT_STEPS["sea"]).alias("sea"),
        F.expr(_TT_STEPS["seb"]).alias("seb"),
    )
    return e.select(
        "event_type",
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.expr(_TT_STEPS["t_stat"]).alias("t_stat"),
        F.expr(_TT_STEPS["dof"]).alias("dof"),
    )


# -- chi-square independence (event type x day of week) -----------------------


_CHI2_ORACLE = """
    WITH obs AS (
        SELECT event_type, CAST(strftime(ts, '%w') AS INTEGER) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT *, SUM(n_obs) OVER (PARTITION BY event_type) AS row_tot,
               SUM(n_obs) OVER (PARTITION BY dow) AS col_tot,
               SUM(n_obs) OVER () AS grand
        FROM obs
    ),
    c AS (
        SELECT event_type, dow, n_obs,
               CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                   / CAST(grand AS DOUBLE) AS expected
        FROM tot
    ),
    k AS (
        SELECT *, (CAST(n_obs AS DOUBLE) - expected)
                  * (CAST(n_obs AS DOUBLE) - expected) / expected AS contrib
        FROM c
    )
    SELECT event_type, dow, n_obs, expected, contrib,
           CAST(SUM(CAST(ROUND(contrib * 1000000) AS BIGINT)) OVER ()
                AS BIGINT) AS chi2_micro
    FROM k
    """


@register("stats_chi_square", oracle=_CHI2_ORACLE)
def chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event type x day-of-week — "is
    activity mix stable across the week". Per-cell observed counts,
    expected counts, and contributions, plus the total statistic.

    Determinism: each cell's expected value and contribution is a fixed
    arithmetic tree over integers (deterministic doubles); the TOTAL would
    be a float sum in engine-specific order, so it is summed as QUANTIZED
    micro-unit integers instead (order-free — the qsum recipe applied to a
    derived statistic). The marginals come from windows over the |types| x
    7 CELL relation, never over events. Scale: one conditional-agg scan to
    35 cells; everything after is O(cells)."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    tot = obs.select(
        "*",
        F.sum("n_obs").over(W.partitionBy("event_type")).alias("row_tot"),
        F.sum("n_obs").over(W.partitionBy("dow")).alias("col_tot"),
        F.sum("n_obs").over(W.partitionBy()).alias("grand"),
    )
    c = tot.select(
        "event_type",
        "dow",
        "n_obs",
        F.expr(
            "CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)"
            " / CAST(grand AS DOUBLE)"
        ).alias("expected"),
    )
    k = c.select(
        "*",
        F.expr(
            "(CAST(n_obs AS DOUBLE) - expected)"
            " * (CAST(n_obs AS DOUBLE) - expected) / expected"
        ).alias("contrib"),
    )
    return k.select(
        "*",
        F.sum(F.round(F.col("contrib") * 1000000, 0).cast("long"))
        .over(W.partitionBy())
        .cast("long")
        .alias("chi2_micro"),
    )


# -- Cramer's V effect size (rides the chi-square contingency machinery) ------


@register(
    "stats_cramers_v",
    oracle=f"""
    WITH cells AS ({_CHI2_ORACLE})
    SELECT CAST(COUNT(*) AS BIGINT)                    AS n_cells,
           CAST(COUNT(DISTINCT event_type) AS BIGINT)  AS n_rows_dim,
           CAST(COUNT(DISTINCT dow) AS BIGINT)         AS n_cols_dim,
           CAST(SUM(n_obs) AS BIGINT)                  AS grand_n,
           CAST(MAX(chi2_micro) AS BIGINT)             AS chi2_micro,
           CAST(MAX(chi2_micro)
                // (SUM(n_obs) *
                    (LEAST(COUNT(DISTINCT event_type),
                           COUNT(DISTINCT dow)) - 1)) AS BIGINT) AS v2_ppm
    FROM cells
    """,
)
def cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V effect size for the type x day-of-week contingency —
    the NORMALIZED companion the chi-square statistic needs before anyone
    reads it: chi2 grows with n, so "significant" says nothing about
    strength; V^2 = chi2 / (n * (min(r,c) - 1)) lands in [0, 1] regardless
    of table size. Reported as V^2 in exact integer ppm (sqrt-free — the
    repo's standard: monotone transforms are the consumer's one cheap
    step, cross-engine bit-equality is the gate's job).

    Shape: one aggregate over the |types| x 7 CELL relation the
    chi-square query already produces (chi2_micro is constant across
    cells, so MAX reads it); dimensions come from distinct-counts over
    the same tiny frame. Evaluation rides the existing machinery — no new
    scan of events."""
    cells = chi_square(spark, sf_dir)
    return cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.countDistinct("event_type").cast("long").alias("n_rows_dim"),
        F.countDistinct("dow").cast("long").alias("n_cols_dim"),
        F.sum("n_obs").cast("long").alias("grand_n"),
        F.max("chi2_micro").cast("long").alias("chi2_micro"),
        F.expr(
            "CAST(MAX(chi2_micro) div (SUM(n_obs) *"
            " (LEAST(COUNT(DISTINCT event_type), COUNT(DISTINCT dow)) - 1))"
            " AS BIGINT)"
        ).alias("v2_ppm"),
    )


# -- year-over-year growth ----------------------------------------------------


@register(
    "agg_yoy_growth",
    oracle="""
    WITH monthly AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM orders GROUP BY 1
    )
    SELECT month, rev_cents,
           LAG(rev_cents, 12) OVER (ORDER BY month) AS prev_year_cents,
           CAST(rev_cents - LAG(rev_cents, 12) OVER (ORDER BY month) AS DOUBLE)
               / CAST(LAG(rev_cents, 12) OVER (ORDER BY month) AS DOUBLE)
               AS yoy_growth
    FROM monthly
    """,
)
def yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year growth — lag(12) over the MONTH
    relation (80 rows), so the unpartitioned window is over an aggregate
    the size of the calendar, never over orders; the first year's months
    carry NULL growth honestly. Revenue is cent-quantized (order-free
    integer sums); the growth ratio is one deterministic IEEE division.
    At 100 TB the only data-sized stage is the monthly groupBy (partial
    agg before shuffle); the window input is O(months)."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        )
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("rev_cents")
    )
    w = W.orderBy("month")
    prev = F.lag("rev_cents", 12).over(w)
    return monthly.select(
        "month",
        "rev_cents",
        prev.alias("prev_year_cents"),
        (
            (F.col("rev_cents") - prev).cast("double") / prev.cast("double")
        ).alias("yoy_growth"),
    )


# -- Pareto (80/20) contribution analysis with distributed cumulative sum -----

_PARETO_PCT = 80  # head = customers covering the first 80% of revenue
_PARETO_BUCKET = 500_000  # $5k revenue histogram bucket, in cents


@register(
    "agg_pareto_contribution",
    oracle=f"""
    WITH rev AS (
        SELECT o_custkey AS c_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM orders GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(revenue_cents) AS BIGINT) AS total_cents FROM rev
    ), ranked AS (
        SELECT c_custkey, revenue_cents,
               CAST(SUM(revenue_cents) OVER (
                   ORDER BY revenue_cents DESC, c_custkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY revenue_cents DESC, c_custkey) AS BIGINT) AS rk
        FROM rev
    )
    SELECT c_custkey, revenue_cents, cum_cents, rk
    FROM ranked CROSS JOIN tot
    WHERE (cum_cents - revenue_cents) * 100 < total_cents * {_PARETO_PCT}
    """,
)
def pareto_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto head: the customers whose cumulative revenue (descending)
    first covers {_PARETO_PCT}% of total — rank and running total included.

    The running total is computed WITHOUT a single-partition window, via the
    same distributed-order-statistics trick as agg_rfm_segmentation's NTILE:
    bucket revenues into a histogram (cents div bucket), take per-bucket
    (sum, count) — a tiny frame — window THAT for cross-bucket offsets, then
    add a bucket-partitioned local cumsum/rank. The only non-distributed
    state is the |buckets|-row histogram; the per-customer frames never
    leave their hash partition. The head test is exact integer arithmetic:
    (cum_before)·100 < total·{_PARETO_PCT} (cents · 100 stays far under
    2^63 at any realistic revenue).
    """
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(quantize(F.col("o_totalprice"), MONEY_SCALE)).alias("revenue_cents")
    )
    total = rev.agg(F.sum("revenue_cents").alias("total_cents"))
    b = rev.withColumn("_b", F.expr(f"revenue_cents div {_PARETO_BUCKET}"))
    # offsets over the tiny histogram, in DESCENDING bucket order
    off = bucket_offsets(
        b, "_b", {"sum": F.col("revenue_cents"), "cnt": F.lit(1)}, descending=True
    )
    w_loc = W.partitionBy("_b").orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
    ranked = (
        b.join(F.broadcast(off), "_b")
        .withColumn(
            "cum_cents",
            (
                F.col("_off_sum")
                + F.sum("revenue_cents").over(
                    w_loc.rowsBetween(W.unboundedPreceding, 0)
                )
            ).cast("long"),
        )
        .withColumn("rk", (F.col("_off_cnt") + F.row_number().over(w_loc)).cast("long"))
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .filter(
            (F.col("cum_cents") - F.col("revenue_cents")) * 100
            < F.col("total_cents") * _PARETO_PCT
        )
        .select("c_custkey", "revenue_cents", "cum_cents", "rk")
    )


# -- Mann–Whitney U rank-sum test (integer-exact, distributed ranks) ----------

_MW_G1, _MW_G2 = "purchase", "view"
_MW_BUCKET = 1000  # cents histogram bucket for the distributed rank offsets


@register(
    "stats_mann_whitney",
    oracle=f"""
    WITH s AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type IN ('{_MW_G1}', '{_MW_G2}')
    ), r AS (
        SELECT event_type,
               2 * RANK() OVER (ORDER BY v)
                 + COUNT(*) OVER (PARTITION BY v) - 1 AS ar2
        FROM s
    ), agg AS (
        SELECT CAST(SUM(CASE WHEN event_type = '{_MW_G1}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN event_type = '{_MW_G2}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN event_type = '{_MW_G1}' THEN ar2 ELSE 0 END)
                    AS BIGINT) AS two_r1
        FROM r
    )
    SELECT n1, n2, two_r1,
           two_r1 - n1 * (n1 + 1) AS two_u1,
           n1 * n2                AS two_u_mean
    FROM agg
    """,
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test ({_MW_G1} vs {_MW_G2} event values),
    the nonparametric sibling of stats_ab_ttest — all statistics exact
    integers (doubled to absorb the tie-averaged half-ranks): 2·R1, 2·U1,
    and 2·E[U] = n1·n2; a consumer compares two_u1 against two_u_mean.

    The textbook form ranks the pooled sample with a single total-order
    window. Here ranks come from value-histogram arithmetic instead:
    group by quantized value -> (cnt, n1_v), then rows-below via the same
    histogram-offset cumsum as agg_pareto_contribution (the only
    unpartitioned window is over the tiny bucket histogram), and each tied
    block contributes n1_v · (2·cum_below + cnt + 1) = n1_v · 2·avg_rank.
    No pooled sort of the raw rows exists in the plan — rank statistics at
    any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin(_MW_G1, _MW_G2)).select(
        "event_type", quantize(F.col("value"), MONEY_SCALE).alias("v")
    )
    per = s.groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("event_type") == _MW_G1, 1).otherwise(0)).alias("n1_v"),
    )
    # the offsets build and the ranked join both consume the per-value
    # aggregate; checkpoint it so the scan + groupBy run once per action
    # (|distinct quantized values| rows — value-domain-bounded).
    b = per.withColumn("_b", F.expr(f"v div {_MW_BUCKET}")).localCheckpoint(
        eager=False
    )
    off = bucket_offsets(b, "_b", {"c": F.col("cnt")})
    w_loc = W.partitionBy("_b").orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    ranked = (
        b.join(F.broadcast(off), "_b")
        .withColumn(
            "cum_below",
            F.col("_off_c") + F.coalesce(F.sum("cnt").over(w_loc), F.lit(0)),
        )
        .withColumn("ar2", 2 * F.col("cum_below") + F.col("cnt") + 1)
    )
    return (
        ranked.agg(
            F.sum("n1_v").cast("long").alias("n1"),
            (F.sum("cnt") - F.sum("n1_v")).cast("long").alias("n2"),
            F.sum(F.col("n1_v") * F.col("ar2")).cast("long").alias("two_r1"),
        )
        .select(
            "n1",
            "n2",
            "two_r1",
            (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)).alias("two_u1"),
            (F.col("n1") * F.col("n2")).alias("two_u_mean"),
        )
    )


# -- Kolmogorov–Smirnov two-sample test (integer-exact CDF gap) ---------------


@register(
    "stats_ks_test",
    oracle=f"""
    WITH s AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type IN ('{_MW_G1}', '{_MW_G2}')
    ), per AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CASE WHEN event_type = '{_MW_G1}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1_v
        FROM s GROUP BY 1
    ), c AS (
        SELECT CAST(SUM(n1_v) OVER w AS BIGINT)       AS cum1,
               CAST(SUM(cnt - n1_v) OVER w AS BIGINT) AS cum2
        FROM per
        WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
    ), tot AS (
        SELECT CAST(SUM(n1_v) AS BIGINT)       AS n1,
               CAST(SUM(cnt - n1_v) AS BIGINT) AS n2
        FROM per
    )
    SELECT n1, n2,
           CAST(MAX(ABS(n2 * cum1 - n1 * cum2)) AS BIGINT) AS d_num
    FROM c CROSS JOIN tot
    GROUP BY n1, n2
    """,
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov two-sample statistic ({_MW_G1} vs {_MW_G2}),
    integer-exact: D = max_x |F1(x) − F2(x)| is reported as its numerator
    d_num = max |n2·cum1(x) − n1·cum2(x)| over the common denominator
    n1·n2 — no division ever happens, so the statistic reproduces
    bit-for-bit (a consumer divides d_num by n1·n2 at the edge).

    Distributed shape shared with stats_mann_whitney: collapse to per-value
    counts (partial agg), histogram-offset cumulative counts (the only
    unpartitioned window runs over the tiny bucket histogram), then a
    plain max — empirical-CDF statistics without ever sorting the raw
    pooled sample.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin(_MW_G1, _MW_G2)).select(
        "event_type", quantize(F.col("value"), MONEY_SCALE).alias("v")
    )
    per = s.groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("event_type") == _MW_G1, 1).otherwise(0)).alias("n1_v"),
    )
    # the offsets build and the ranked join both consume the per-value
    # aggregate; checkpoint it so the scan + groupBy run once per action
    # (|distinct quantized values| rows — value-domain-bounded).
    b = per.withColumn("_b", F.expr(f"v div {_MW_BUCKET}")).localCheckpoint(
        eager=False
    )
    off = bucket_offsets(
        b,
        "_b",
        {"c1": F.col("n1_v"), "c2": F.col("cnt") - F.col("n1_v")},
    )
    w_loc = W.partitionBy("_b").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    c = (
        b.join(F.broadcast(off), "_b")
        .select(
            (F.col("_off_c1") + F.sum("n1_v").over(w_loc)).alias("cum1"),
            (
                F.col("_off_c2") + F.sum(F.col("cnt") - F.col("n1_v")).over(w_loc)
            ).alias("cum2"),
        )
    )
    tot = per.agg(
        F.sum("n1_v").cast("long").alias("n1"),
        F.sum(F.col("cnt") - F.col("n1_v")).cast("long").alias("n2"),
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.max(
                F.abs(F.col("n2") * F.col("cum1") - F.col("n1") * F.col("cum2"))
            )
            .cast("long")
            .alias("d_num")
        )
    )


# -- deferred r7 queue: grouped median, MAD outlier scale, grouped mode -------


@register(
    "agg_grouped_median",
    oracle=f"""
    WITH s AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v FROM events
    ), ranked AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM s
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           v AS median_cents
    FROM ranked WHERE rk = (n + 1) // 2
    """
)
def grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group (lower) median — the GROUPED order statistic. With
    ``bucket_offsets(partition_by=[group])`` the offsets window itself is
    partitioned, so unlike the global median there is NO unpartitioned
    window anywhere in the plan: per-(group, bucket) histogram, per-group
    offset prefix sums, bucket-local ranks. The oracle sorts within each
    partition; the engine never materializes a per-group sort of the raw
    rows — medians over billions of rows per group at a shuffle of
    histogram size.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "event_type", quantize(F.col("value"), MONEY_SCALE).alias("v")
    )
    b = s.withColumn("_b", F.expr(f"v div {_MW_BUCKET}"))
    off = bucket_offsets(
        b, "_b", {"c": F.lit(1)}, partition_by=["event_type"]
    )
    tot = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    w_loc = W.partitionBy("event_type", "_b").orderBy("v")
    ranked = b.join(F.broadcast(off), ["event_type", "_b"]).withColumn(
        "_rk", F.col("_off_c") + F.row_number().over(w_loc)
    )
    return (
        ranked.join(F.broadcast(tot), "event_type")
        .filter(F.col("_rk") == F.expr("(n + 1) div 2"))
        .select("event_type", "n", F.col("v").alias("median_cents"))
    )


@register(
    "agg_median_abs_deviation",
    oracle="""
    WITH s AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS v FROM events
    ), med AS (
        SELECT v AS m FROM s ORDER BY v
        LIMIT 1 OFFSET ((SELECT (COUNT(*) + 1) // 2 FROM s) - 1)
    ), dev AS (
        SELECT ABS(v - m) AS d FROM s CROSS JOIN med
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s)  AS n,
           (SELECT m FROM med)                       AS median_cents,
           (SELECT d FROM dev ORDER BY d
            LIMIT 1 OFFSET ((SELECT (COUNT(*) + 1) // 2 FROM dev) - 1))
                                                     AS mad_cents
    """
)
def median_abs_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation — the robust scale estimate behind
    outlier fences that survive the heavy tails a stddev fence doesn't
    (one whale order shifts a z-score cutoff; it moves the MAD barely).
    Two chained exact order statistics: median of v, then median of
    |v − median|, both via the histogram-offset recipe (bucket_offsets),
    the second after broadcasting the 1-row first — no sort of the
    population at either stage. All integer cents.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(quantize(F.col("value"), MONEY_SCALE).alias("v"))

    def order_stat(frame: DataFrame, col: str):
        """(value at rank (n+1) div 2, n) as a 1-row broadcastable frame."""
        b = frame.withColumn("_b", F.expr(f"{col} div {_MW_BUCKET}"))
        off = bucket_offsets(b, "_b", {"c": F.lit(1)})
        n1 = frame.agg(F.count(F.lit(1)).alias("_n"))
        w_loc = W.partitionBy("_b").orderBy(col)
        return (
            b.join(F.broadcast(off), "_b")
            .withColumn("_rk", F.col("_off_c") + F.row_number().over(w_loc))
            .crossJoin(F.broadcast(n1))
            .filter(F.col("_rk") == F.expr("(_n + 1) div 2"))
            .select(F.col(col).alias("_stat"), F.col("_n"))
        )

    med = order_stat(s, "v").select(
        F.col("_stat").alias("median_cents"), F.col("_n").alias("n")
    )
    dev = s.crossJoin(F.broadcast(med.select("median_cents"))).select(
        F.abs(F.col("v") - F.col("median_cents")).alias("d")
    )
    mad = order_stat(dev, "d").select(F.col("_stat").alias("mad_cents"))
    return med.crossJoin(F.broadcast(mad)).select("n", "median_cents", "mad_cents")


@register(
    "agg_mode_per_group",
    oracle="""
    WITH j AS (
        SELECT c.c_mktsegment, o.o_orderpriority
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cnt AS (
        SELECT c_mktsegment, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        FROM j GROUP BY 1, 2
    )
    SELECT c_mktsegment, o_orderpriority AS mode_priority, n
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY c_mktsegment ORDER BY n DESC, o_orderpriority) AS rk
        FROM cnt
    ) WHERE rk = 1
    """,
)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode (most frequent order priority per market
    segment, tie -> lexicographically smallest) — the categorical
    counterpart of the grouped median. Counting collapses the join output
    to |segments|·|priorities| rows before the argmax window, so the
    window runs over a frame the size of the category product, never the
    data. The dimension join broadcasts the customer side's two columns.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cnt = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("n"), F.asc("o_orderpriority"))
    return (
        cnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "c_mktsegment", F.col("o_orderpriority").alias("mode_priority"), "n"
        )
    )


_QUARTILE_PCTS = (25, 50, 75)


@register(
    "agg_grouped_quartiles",
    oracle=f"""
    WITH s AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v FROM events
    ), ranked AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM s
    ), pcts AS (SELECT UNNEST([{", ".join(map(str, _QUARTILE_PCTS))}]) AS pct)
    SELECT event_type, CAST(pct AS BIGINT) AS pct,
           CAST(n AS BIGINT) AS n, v AS value_cents
    FROM ranked CROSS JOIN pcts
    WHERE rk = (pct * n + 99) // 100
    """
)
def grouped_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75 per group in ONE pass: the ranked frame is built
    once (per-group histogram offsets + bucket-local row_number, zero
    unpartitioned windows — bucket_offsets with partition_by) and all
    three rank targets k = ceil(p·n/100) = (p·n+99) div 100 (the quantile
    sketch's convention) filter against it. Adding percentiles costs one
    more predicate, not another shuffle — the multi-quantile contract a
    profiler wants. Targets for distinct p can collide only when n < 4;
    each emitted row carries its own pct label either way.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.select("event_type", quantize(F.col("value"), MONEY_SCALE).alias("v"))
    # three consumers (offsets, totals, the ranked join) and zero runtime
    # exchange reuse (r21 survey) meant three events scans per action; one
    # bounded checkpoint of the 3-narrow-column quantized relation feeds
    # all of them (totals now count b — _b is derived, so the count is
    # identical by construction).
    b = s.withColumn("_b", F.expr(f"v div {_MW_BUCKET}")).localCheckpoint(
        eager=False
    )
    off = bucket_offsets(b, "_b", {"c": F.lit(1)}, partition_by=["event_type"])
    tot = b.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    w_loc = W.partitionBy("event_type", "_b").orderBy("v")
    ranked = (
        b.join(F.broadcast(off), ["event_type", "_b"])
        .withColumn("_rk", F.col("_off_c") + F.row_number().over(w_loc))
        .join(F.broadcast(tot), "event_type")
    )
    pcts = F.explode(
        F.array(*[F.lit(p) for p in _QUARTILE_PCTS])
    ).alias("pct")
    return (
        ranked.select("event_type", "v", "_rk", "n", pcts)
        .filter(F.col("_rk") == F.expr("(pct * n + 99) div 100"))
        .select(
            "event_type",
            F.col("pct").cast("long").alias("pct"),
            "n",
            F.col("v").alias("value_cents"),
        )
    )


# -- revenue concentration (HHI) — deferred r7 queue --------------------------


@register(
    "agg_hhi_concentration",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) // 100000
                    AS BIGINT) AS rev_k
        FROM orders GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(rev_k) AS BIGINT) AS total_k,
               CAST(COUNT(*) AS BIGINT)   AS n_cust,
               CAST(SUM(rev_k * rev_k) AS BIGINT) AS sum_sq
        FROM rev
    )
    SELECT n_cust, total_k,
           CAST(CASE WHEN sum_sq < 900000000000000
                     THEN (10000 * sum_sq) // (total_k * total_k)
                     ELSE sum_sq // ((total_k * total_k) // 10000)
                END AS BIGINT) AS hhi_bp
    FROM tot
    """
)
def hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of customer revenue: HHI =
    Σ share² in exact basis points — the antitrust-style "is revenue
    concentrated in a few whales" scalar that complements the Pareto head
    list (agg_pareto_contribution names the whales; this scores the
    whole distribution in one number, 10000 = monopoly, →0 = atomized).

    Integer discipline: shares are never materialized — HHI_bp =
    (10000·Σ rev²) div total², computed on $1000-quantized revenue
    (div 100000 of cents BEFORE the square, identically on both engines)
    because squared money overflows int64 fast: cents-scale squares blew
    up ANSI Spark at fixture scale while DuckDB's 128-bit SUM sailed on —
    exactly the silent cross-engine divergence the quantize-first rule
    prevents. The basis-point scaling divides the DENOMINATOR
    (sum_sq div (total² div 10^4)) instead of multiplying sum_sq by 10^4:
    sum_sq ≤ total² by Cauchy–Schwarz, so the whole expression is exact
    while total_k² < 2^63 — total revenue < ~$3T — where the multiplied
    form would wrap at ~$30B of concentrated revenue.

    Shape: per-customer partial agg, then one 1-row total — the whole
    statistic is two map-side-combinable aggregates.
    """
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.expr(
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000"
            " AS BIGINT)"
        ).alias("rev_k")
    )
    return rev.agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("rev_k").cast("long").alias("total_k"),
        F.sum(F.col("rev_k") * F.col("rev_k")).alias("_sum_sq"),
    ).select(
        "n_cust",
        "total_k",
        F.expr(
            "CAST(CASE WHEN _sum_sq < 900000000000000"
            " THEN (10000 * _sum_sq) div (total_k * total_k)"
            " ELSE _sum_sq div ((total_k * total_k) div 10000)"
            " END AS BIGINT)"
        ).alias("hhi_bp"),
    )


# -- Wald–Wolfowitz runs test — deferred r7 queue -----------------------------


@register(
    "stats_runs_test",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ), tot AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT)   AS total
        FROM daily GROUP BY 1
    ), signed AS (
        SELECT d.event_type, d.day,
               CASE WHEN d.v * t.n > t.total THEN 1 ELSE 0 END AS above
        FROM daily d JOIN tot t USING (event_type)
    ), runs AS (
        SELECT event_type, above,
               CASE WHEN LAG(above) OVER (
                        PARTITION BY event_type ORDER BY day) IS NULL
                         OR LAG(above) OVER (
                        PARTITION BY event_type ORDER BY day) <> above
                    THEN 1 ELSE 0 END AS is_new_run
        FROM signed
    )
    SELECT event_type,
           CAST(SUM(is_new_run) AS BIGINT) AS n_runs,
           CAST(SUM(above) AS BIGINT)      AS n_above,
           CAST(COUNT(*) - SUM(above) AS BIGINT) AS n_below
    FROM runs GROUP BY 1
    """,
)
def runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test per event type: how many RUNS of
    above-/below-mean days the daily revenue series has — too few runs
    means trending/sticky (autocorrelated), too many means oscillating;
    under randomness E[runs] = 2·n_above·n_below/n + 1, which the consumer
    compares against the emitted exact counts. The nonparametric
    randomness check that pairs with events_cusum_change_point (CUSUM
    finds WHERE a shift is; the runs count says WHETHER the series even
    behaves randomly).

    Integer discipline: "above the mean" is v·n > total — the mean is
    never materialized (same multiply-through trick as CUSUM). One
    per-(type, day) partial agg, per-type totals broadcast back, and a lag
    window inside the type partition. All keyed shuffles.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(quantize(F.col("value"), MONEY_SCALE)).alias("v"))
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
    )
    signed = daily.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "day",
        F.when(F.col("v") * F.col("n") > F.col("total"), 1).otherwise(0).alias(
            "above"
        ),
    )
    w = W.partitionBy("event_type").orderBy("day")
    runs = signed.withColumn(
        "is_new_run",
        F.when(
            F.lag("above").over(w).isNull()
            | (F.lag("above").over(w) != F.col("above")),
            1,
        ).otherwise(0),
    )
    return runs.groupBy("event_type").agg(
        F.sum("is_new_run").cast("long").alias("n_runs"),
        F.sum("above").cast("long").alias("n_above"),
        (F.count(F.lit(1)) - F.sum("above")).cast("long").alias("n_below"),
    )


# -- Gini coefficient of customer revenue — deferred r7 queue -----------------


_GINI_BUCKET_K = 500  # $500k histogram blocks, in $1000 units


@register(
    "agg_gini_coefficient",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) // 100000
                    AS BIGINT) AS x
        FROM orders GROUP BY 1
    ), ranked AS (
        SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS BIGINT)
                      AS i
        FROM rev
    ), agg AS (
        SELECT CAST(COUNT(*) AS BIGINT)   AS n,
               CAST(SUM(x) AS BIGINT)     AS sx,
               CAST(SUM(i * x) AS BIGINT) AS six
        FROM ranked
    )
    SELECT n, sx,
           CAST(CASE WHEN 2 * six - (n + 1) * sx < 900000000000000
                     THEN (10000 * (2 * six - (n + 1) * sx)) // (n * sx)
                     ELSE (2 * six - (n + 1) * sx) // ((n * sx) // 10000)
                END AS BIGINT) AS gini_bp
    FROM agg
    """
)
def gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue in exact basis points —
    the Lorenz-curve inequality scalar completing the concentration kit
    (Pareto names the head, HHI scores market power, Gini scores
    dispersion): G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over ascending
    ranks i.

    The rank-weighted sum Σ i·x_i is the scale problem — the textbook
    form sorts the population. Here ranks come from bucket_offsets
    (histogram prefix counts + bucket-local row_number, customer key as
    the total-order tie-break), so Σ i·x_i is a plain aggregate over the
    ranked frame with no global sort. Revenue is $1000-quantized BEFORE
    the products (the HHI lesson); exact while n·Σx < 2^63 — about a
    billion customers averaging $10k.
    """
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.expr(
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000"
            " AS BIGINT)"
        ).alias("x")
    )
    b = rev.withColumn("_b", F.expr(f"x div {_GINI_BUCKET_K}"))
    off = bucket_offsets(b, "_b", {"c": F.lit(1)})
    w_loc = W.partitionBy("_b").orderBy("x", "o_custkey")
    ranked = b.join(F.broadcast(off), "_b").withColumn(
        "i", F.col("_off_c") + F.row_number().over(w_loc)
    )
    return (
        ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum(F.col("i") * F.col("x")).cast("long").alias("_six"),
        )
        .select(
            "n",
            "sx",
            F.expr(
                "CAST(CASE WHEN 2 * _six - (n + 1) * sx < 900000000000000"
                " THEN (10000 * (2 * _six - (n + 1) * sx)) div (n * sx)"
                " ELSE (2 * _six - (n + 1) * sx) div ((n * sx) div 10000)"
                " END AS BIGINT)"
            ).alias("gini_bp"),
        )
    )


# (the clustering import lives at the top of the file)


# -- exact AUC-ROC via the rank-sum identity — deferred r7 queue --------------


@register(
    "ml_auc_roc",
    oracle=f"""
    WITH s AS (
        SELECT n_chars AS score,
               CASE WHEN lang = '{_CAL_POS_LANG_REF}' THEN 1 ELSE 0 END AS pos
        FROM documents
    ), r AS (
        SELECT pos,
               2 * RANK() OVER (ORDER BY score)
                 + COUNT(*) OVER (PARTITION BY score) - 1 AS ar2
        FROM s
    ), agg AS (
        SELECT CAST(SUM(pos) AS BIGINT)                          AS n_pos,
               CAST(SUM(1 - pos) AS BIGINT)                      AS n_neg,
               CAST(SUM(CASE WHEN pos = 1 THEN ar2 ELSE 0 END)
                    AS BIGINT)                                    AS two_r1
        FROM r
    )
    SELECT n_pos, n_neg,
           two_r1 - n_pos * (n_pos + 1) AS two_u,
           (500000 * (two_r1 - n_pos * (n_pos + 1))) // (n_pos * n_neg)
               AS auc_ppm
    FROM agg
    """
)
def auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC-ROC of a score (n_chars) against a binary outcome
    (lang == 'en') via the rank-sum identity AUC = U/(n⁺·n⁻) — ties
    counted half, which the doubled-rank arithmetic absorbs without a
    single float: auc_ppm = (5e5·2U) div (n⁺·n⁻). Completes the ML-eval
    trio (confusion matrix = thresholded, calibration = binned, AUC =
    threshold-free), and shows the MW machinery IS the AUC machinery —
    same histogram-offset ranks, zero pooled sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        F.col("n_chars").alias("v"),
        F.when(F.col("lang") == _CAL_POS_LANG_REF, 1).otherwise(0).alias("pos"),
    )
    per = s.groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("n1_v")
    )
    # the offsets build and the ranked join both consume the per-value
    # aggregate; checkpoint it so the scan + groupBy run once per action
    # (|distinct quantized values| rows — value-domain-bounded).
    b = per.withColumn("_b", F.expr(f"v div {_MW_BUCKET}")).localCheckpoint(
        eager=False
    )
    off = bucket_offsets(b, "_b", {"c": F.col("cnt")})
    w_loc = W.partitionBy("_b").orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    ranked = (
        b.join(F.broadcast(off), "_b")
        .withColumn(
            "cum_below",
            F.col("_off_c") + F.coalesce(F.sum("cnt").over(w_loc), F.lit(0)),
        )
        .withColumn("ar2", 2 * F.col("cum_below") + F.col("cnt") + 1)
    )
    return (
        ranked.agg(
            F.sum("n1_v").cast("long").alias("n_pos"),
            (F.sum("cnt") - F.sum("n1_v")).cast("long").alias("n_neg"),
            F.sum(F.col("n1_v") * F.col("ar2")).cast("long").alias("two_r1"),
        )
        .select(
            "n_pos",
            "n_neg",
            (F.col("two_r1") - F.col("n_pos") * (F.col("n_pos") + 1)).alias(
                "two_u"
            ),
            F.expr(
                "(500000 * (two_r1 - n_pos * (n_pos + 1))) div (n_pos * n_neg)"
            ).alias("auc_ppm"),
        )
    )


# -- Benford first-digit audit — deferred r7 queue ----------------------------

#: exact-integer ppm of log10(1 + 1/d) — Benford's expected first-digit
#: frequencies, as literals so no engine computes a logarithm
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


@register(
    "stats_benford_digits",
    oracle=f"""
    WITH v AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ), d AS (
        SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM v WHERE cents > 0
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM d),
    exp AS (
        SELECT * FROM (VALUES
            {", ".join(f"({d}, {p})" for d, p in _BENFORD_PPM.items())}
        ) AS t(digit, expected_ppm)
    )
    SELECT e.digit,
           CAST(COALESCE(c.n, 0) AS BIGINT)               AS n,
           (1000000 * CAST(COALESCE(c.n, 0) AS BIGINT)) // t.n_total
                                                          AS observed_ppm,
           CAST(e.expected_ppm AS BIGINT)                 AS expected_ppm,
           ABS((1000000 * CAST(COALESCE(c.n, 0) AS BIGINT)) // t.n_total
               - e.expected_ppm)                          AS abs_diff_ppm
    FROM exp e
    LEFT JOIN (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1) c
           ON c.digit = e.digit
    CROSS JOIN tot t
    """,
)
def benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed vs
    expected leading-digit frequency in exact ppm — the forensic
    data-quality check (fabricated or truncated monetary data drifts off
    the log-curve; TPC-H's uniform-ish totalprice visibly does too, which
    is itself the finding). Expected frequencies are exact integer
    LITERALS of log10(1+1/d) — no engine evaluates a logarithm, so the
    cross-engine contract stays purely integral.

    Shape: leading digit via string head of the integer cents (identical
    BIGINT→VARCHAR rendering both engines, no float log10 to disagree);
    one 9-group count, a 1-row total broadcast, and the 9-row expected
    table joined in. All 9 digits emitted even at zero count.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        quantize(F.col("o_totalprice"), MONEY_SCALE).alias("cents")
    ).filter(F.col("cents") > 0).select(
        F.substring(F.col("cents").cast("string"), 1, 1).cast("long").alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = d.agg(F.count(F.lit(1)).alias("n_total"))
    exp = spark.createDataFrame(
        [(k, v) for k, v in _BENFORD_PPM.items()], "digit long, expected_ppm long"
    )
    return (
        exp.join(counts, "digit", "left")
        .fillna({"n": 0})
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.expr("(1000000 * n) div n_total").alias("observed_ppm"),
            "expected_ppm",
            F.expr("abs((1000000 * n) div n_total - expected_ppm)").alias(
                "abs_diff_ppm"
            ),
        )
    )


# -- weighted median — deferred r7 queue --------------------------------------


@register(
    "agg_weighted_median",
    oracle="""
    WITH s AS (
        SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(w) AS BIGINT)   AS total_w
        FROM s
    ), c AS (
        SELECT v, w,
               CAST(SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cumw
        FROM s
    )
    SELECT t.n_rows, t.total_w, c.v AS weighted_median_cents
    FROM c CROSS JOIN tot t
    WHERE c.cumw >= (t.total_w + 1) // 2
      AND c.cumw - c.w < (t.total_w + 1) // 2
    """
)
def weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median of line-item price, weighted by quantity — the
    order statistic where each row counts w times (the "median price a
    unit actually sold at"). The crossing row is the unique row whose
    cumulative weight first reaches (W+1) div 2: cumw − w < target ≤
    cumw. Within a block of tied values the crossing ROW depends on tie
    order, but its VALUE cannot — the output is order-insensitive even
    though cumw itself is not, which is what lets both engines agree
    without a total order on rows.

    Shape: the same histogram-offset machinery as the unweighted median
    (bucket_offsets carrying WEIGHT sums instead of counts), with the
    same fine-grained _MW_BUCKET width so bucket-local frames stay small
    at any row count; the only unpartitioned window is the tiny bucket
    prefix-sum. Integer cents × integer quantities end to end.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        quantize(F.col("l_extendedprice"), MONEY_SCALE).alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    tot = s.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("w").cast("long").alias("total_w")
    )
    b = s.withColumn("_b", F.expr(f"v div {_MW_BUCKET}"))
    off = bucket_offsets(b, "_b", {"w": F.col("w")})
    w_loc = W.partitionBy("_b").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    c = b.join(F.broadcast(off), "_b").withColumn(
        "cumw", F.col("_off_w") + F.sum("w").over(w_loc)
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("cumw") >= F.expr("(total_w + 1) div 2"))
            & (F.col("cumw") - F.col("w") < F.expr("(total_w + 1) div 2"))
        )
        .select("n_rows", "total_w", F.col("v").alias("weighted_median_cents"))
    )


# -- power-of-two histogram — deferred r7 queue -------------------------------


@register(
    "agg_pow2_histogram",
    oracle="""
    WITH v AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    )
    SELECT CAST(length(bin(cents)) AS BIGINT) AS bits,
           CAST(COUNT(*) AS BIGINT)           AS n,
           CAST(MIN(cents) AS BIGINT)         AS lo,
           CAST(MAX(cents) AS BIGINT)         AS hi
    FROM v WHERE cents > 0
    GROUP BY 1
    """,
)
def pow2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two (HdrHistogram-style) value histogram of order totals:
    bucket = bit length of the integer cents — exponentially sized
    buckets with CONSTANT relative error, the layout latency and money
    distributions are always recorded in, computed WITHOUT any logarithm:
    ``length(bin(v))`` is exact integer bit arithmetic on both engines,
    where floor(log2(v)) via floating log would flip at boundary values
    whenever the two libms round differently. min/max per bucket pin the
    bucket boundaries themselves.

    Shape: a map-only bucket expression + one ~40-group partial agg.
    """
    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        quantize(F.col("o_totalprice"), MONEY_SCALE).alias("cents")
    ).filter(F.col("cents") > 0)
    return v.groupBy(
        F.length(F.bin(F.col("cents"))).cast("long").alias("bits")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
    )


# -- winsorized mean — deferred queue -----------------------------------------

_WINS_LO_PCT, _WINS_HI_PCT = 5, 95


@register(
    "agg_winsorized_mean",
    oracle=f"""
    WITH s AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS v FROM events
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
    lo AS (
        SELECT v AS lo_v FROM s ORDER BY v
        LIMIT 1 OFFSET ((SELECT ({_WINS_LO_PCT} * n + 99) // 100 FROM n) - 1)
    ), hi AS (
        SELECT v AS hi_v FROM s ORDER BY v
        LIMIT 1 OFFSET ((SELECT ({_WINS_HI_PCT} * n + 99) // 100 FROM n) - 1)
    )
    SELECT n.n,
           lo.lo_v AS p05_cents,
           hi.hi_v AS p95_cents,
           CAST(SUM(GREATEST(LEAST(s.v, hi.hi_v), lo.lo_v)) // n.n AS BIGINT)
               AS winsorized_mean_cents
    FROM s CROSS JOIN n CROSS JOIN lo CROSS JOIN hi
    GROUP BY n.n, lo.lo_v, hi.hi_v
    """,
)
def winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean: clamp every value into the exact [p05, p95]
    order-statistic band, then take the integer mean — the robust center
    that keeps sample size (unlike trimming) while capping tail leverage;
    pairs with the MAD as the robust-statistics kit. Fence values come
    from the same histogram-offset exact rank machinery (k = (p·n+99)
    div 100, the quantile sketch's convention), broadcast as one row;
    the clamp is map-only and the mean one integer division.

    Shape: two rank lookups over bucket offsets + one partial-aggregable
    clamped sum — no sort of the population anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(quantize(F.col("value"), MONEY_SCALE).alias("v"))
    n1 = s.agg(F.count(F.lit(1)).alias("n"))
    b = s.withColumn("_b", F.expr(f"v div {_MW_BUCKET}"))
    off = bucket_offsets(b, "_b", {"c": F.lit(1)})
    w_loc = W.partitionBy("_b").orderBy("v")
    ranked = (
        b.join(F.broadcast(off), "_b")
        .withColumn("_rk", F.col("_off_c") + F.row_number().over(w_loc))
        .crossJoin(F.broadcast(n1))
    )
    fences = (
        ranked.filter(
            (F.col("_rk") == F.expr(f"({_WINS_LO_PCT} * n + 99) div 100"))
            | (F.col("_rk") == F.expr(f"({_WINS_HI_PCT} * n + 99) div 100"))
        )
        .groupBy()
        .agg(F.min("v").alias("lo_v"), F.max("v").alias("hi_v"))
    )
    return (
        s.crossJoin(F.broadcast(fences))
        .crossJoin(F.broadcast(n1))
        .groupBy("n", "lo_v", "hi_v")
        .agg(
            F.expr(
                "CAST(sum(greatest(least(v, hi_v), lo_v)) div n AS BIGINT)"
            ).alias("winsorized_mean_cents")
        )
        .select(
            "n",
            F.col("lo_v").alias("p05_cents"),
            F.col("hi_v").alias("p95_cents"),
            "winsorized_mean_cents",
        )
    )


# -- autocorrelation function — deferred queue --------------------------------

_ACF_MAX_LAG = 7


@register(
    "stats_autocorrelation",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1
    ), lags AS (
        SELECT UNNEST(generate_series(1, {_ACF_MAX_LAG})) AS k
    ), pairs AS (
        SELECT l.k, a.x AS xt, b.x AS xl
        FROM lags l
        JOIN daily a ON TRUE
        JOIN daily b ON b.d = a.d - l.k
    ), per_lag AS (
        SELECT k,
               CAST(COUNT(*) AS BIGINT)      AS n,
               CAST(SUM(xt) AS BIGINT)       AS st,
               CAST(SUM(xl) AS BIGINT)       AS sl,
               CAST(SUM(xt * xl) AS BIGINT)  AS stl,
               CAST(SUM(xt * xt) AS BIGINT)  AS stt,
               CAST(SUM(xl * xl) AS BIGINT)  AS sll
        FROM pairs GROUP BY 1
    )
    SELECT CAST(k AS BIGINT) AS lag, n,
           n * stl - st * sl AS cov_num,
           n * stt - st * st AS var_t_num,
           n * sll - sl * sl AS var_l_num
    FROM per_lag
    """,
)
def autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation ingredients at lags 1..{_ACF_MAX_LAG} over the
    daily revenue series — the diagnostic that quantifies what the runs
    test flags and CUSUM localizes: per lag, the n-scaled covariance and
    variance NUMERATORS (n·Σxy − ΣxΣy etc.), all exact int64, so
    r_k = cov/√(var_t·var_l) is one consumer-side division of pinned
    integers and no square root ever enters the gated row (the Welch
    t-test's moment discipline applied to serial dependence).

    Shape: the daily series is calendar-sized; each lag is a self-join on
    d = d−k — |lags|·|days| rows, trivially bounded. Overflow bound,
    honestly: the n-scaled form carries n·Σx² ≈ days²·x̄², which at the
    fixture's ~2e5 daily cents stays in int64 to ≈ 41 YEARS of history —
    generous for a diagnostic window, but not "centuries"; longer spans
    (or ~1000× larger dailies) must center the series per lag first
    (Σ(x−x̄)(y−ȳ) keeps operands near the variance scale), trading one
    extra pass for unbounded span.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(F.sum(quantize(F.col("value"), MONEY_SCALE)).alias("x"))
    lags = spark.range(1, _ACF_MAX_LAG + 1).withColumnRenamed("id", "k")
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xt"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xl"))
    pairs = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("db") == F.col("da") - F.col("k"))
    )
    return (
        pairs.groupBy(F.col("k").alias("lag"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xt").alias("st"),
            F.sum("xl").alias("sl"),
            F.sum(F.col("xt") * F.col("xl")).alias("stl"),
            F.sum(F.col("xt") * F.col("xt")).alias("stt"),
            F.sum(F.col("xl") * F.col("xl")).alias("sll"),
        )
        .select(
            "lag",
            "n",
            (F.col("n") * F.col("stl") - F.col("st") * F.col("sl")).alias("cov_num"),
            (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).alias(
                "var_t_num"
            ),
            (F.col("n") * F.col("sll") - F.col("sl") * F.col("sl")).alias(
                "var_l_num"
            ),
        )
    )
autocorrelation.__doc__ = autocorrelation.__doc__.format(_ACF_MAX_LAG=_ACF_MAX_LAG)  # real docstring (ADVICE r7)


# -- Mann–Kendall trend test — deferred queue ----------------------------------


@register(
    "stats_mann_kendall",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN b.x > a.x THEN 1
                         WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND b.d > a.d
    GROUP BY 1
    """,
)
def mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend statistic per event type: S = Σ_{i<j}
    sign(x_j − x_i) over the daily series — the nonparametric
    monotonic-trend test (S near +max = rising, −max = falling, 0 = no
    trend), completing the time-series kit: runs test (randomness), CUSUM
    (level shift), ACF (serial dependence), Mann–Kendall (monotonic
    trend). Pure integer sign counting — nothing to round, ever.

    Shape: pairwise over the DAILY relation, which is calendar-sized —
    the raw events collapse first (partial agg), so the O(days²) join is
    a |types|·~450-row frame at a month's span and stays trivial at any
    event volume; decades of data would switch to the O(n log n)
    rank-variance form via bucket_offsets.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.sum(quantize(F.col("value"), MONEY_SCALE)).alias("x"))
    a = daily.select(
        F.col("event_type").alias("et"), F.col("d").alias("da"), F.col("x").alias("xa")
    )
    b = daily.select(
        F.col("event_type").alias("et"), F.col("d").alias("db"), F.col("x").alias("xb")
    )
    pairs = a.join(b, ["et"]).filter(F.col("db") > F.col("da"))
    sign = (
        F.when(F.col("xb") > F.col("xa"), 1)
        .when(F.col("xb") < F.col("xa"), -1)
        .otherwise(0)
    )
    return pairs.groupBy(F.col("et").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(sign).cast("long").alias("s_stat"),
    )


# -- stratified uplift — deferred queue ---------------------------------------


@register(
    "stats_uplift_stratified",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d
        FROM events
    ), conv AS (
        SELECT DISTINCT user_id,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d
        FROM events WHERE event_type = 'purchase'
    ), flagged AS (
        SELECT ud.dow,
               CASE WHEN ud.user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
               CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END AS converted
        FROM ud LEFT JOIN conv
          ON conv.user_id = ud.user_id AND conv.d = ud.d
    ), strata AS (
        SELECT dow,
               CAST(SUM(treated) AS BIGINT)                       AS n_t,
               CAST(SUM(1 - treated) AS BIGINT)                   AS n_c,
               CAST(SUM(treated * converted) AS BIGINT)           AS conv_t,
               CAST(SUM((1 - treated) * converted) AS BIGINT)     AS conv_c
        FROM flagged GROUP BY 1
    )
    SELECT dow, n_t, n_c, conv_t, conv_c,
           (1000000 * conv_t) // n_t - (1000000 * conv_c) // n_c
               AS uplift_ppm
    FROM strata
    """,
)
def uplift_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified uplift: per-weekday difference in daily conversion rate
    between a treatment proxy (even user ids) and control — the
    experiment readout that survives imbalanced strata where a pooled
    rate difference is Simpson's-paradox bait (a consumer
    sample-weights uplift_ppm across strata for the pooled effect). The
    unit is a USER-DAY; conversion = made a purchase that day. All
    counts and the ppm difference exact integers — the categorical
    counterpart of stats_ab_ttest's continuous comparison.

    Shape: dedupe to user-days (partial agg), one key-colocated LEFT
    join against purchase-days, then a |strata|-bounded conditional
    aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    ud = ev.select(
        "user_id",
        F.dayofweek(F.col("ts").cast("date")).cast("long").alias("dow"),
        day.alias("d"),
    ).distinct()
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", day.alias("d"))
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    flagged = ud.join(conv, ["user_id", "d"], "left").select(
        "dow",
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("treated"),
        F.coalesce(F.col("converted"), F.lit(0)).alias("converted"),
    )
    strata = flagged.groupBy("dow").agg(
        F.sum("treated").cast("long").alias("n_t"),
        F.sum(1 - F.col("treated")).cast("long").alias("n_c"),
        F.sum(F.col("treated") * F.col("converted")).cast("long").alias("conv_t"),
        F.sum((1 - F.col("treated")) * F.col("converted"))
        .cast("long")
        .alias("conv_c"),
    )
    return strata.select(
        "dow",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.expr(
            "(1000000 * conv_t) div n_t - (1000000 * conv_c) div n_c"
        ).alias("uplift_ppm"),
    )


# -- percent-of-parent hierarchy report — deferred queue ----------------------


@register(
    "agg_percent_of_parent",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    ), reg AS (
        SELECT region, CAST(SUM(cents) AS BIGINT) AS region_cents
        FROM rev GROUP BY 1
    ), grand AS (
        SELECT CAST(SUM(cents) AS BIGINT) AS total_cents FROM rev
    )
    SELECT rev.region, rev.nation, rev.cents,
           (1000000 * rev.cents) // reg.region_cents  AS pct_of_region_ppm,
           (1000000 * reg.region_cents) // g.total_cents
               AS region_pct_of_total_ppm
    FROM rev JOIN reg USING (region) CROSS JOIN grand g
    """,
)
def percent_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent down the region→nation hierarchy: each nation's
    exact-ppm share of its region and each region's share of the grand
    total, in one report — the drill-down contribution view every BI
    hierarchy renders, and the relative companion to the absolute rollup
    (agg_rollup gives the level totals; this gives each node's weight
    within its parent).

    Shape: one fact aggregation to the leaf grain, then two broadcast
    joins against the |regions|-row parent totals and the 1-row grand —
    shares never re-scan the fact.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(quantize(F.col("o_totalprice"), MONEY_SCALE)).alias("cents"))
    )
    reg = rev.groupBy("region").agg(F.sum("cents").alias("region_cents"))
    grand = rev.agg(F.sum("cents").alias("total_cents"))
    return (
        rev.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(grand))
        .select(
            "region",
            "nation",
            "cents",
            F.expr("(1000000 * cents) div region_cents").alias(
                "pct_of_region_ppm"
            ),
            F.expr("(1000000 * region_cents) div total_cents").alias(
                "region_pct_of_total_ppm"
            ),
        )
    )


# -- grouping_id disambiguation — deferred queue ------------------------------


@register(
    "agg_grouping_id_report",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_id_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping_id: the marker that tells a NULL that
    MEANS "all values" apart from a NULL that IS a value — without it any
    rollup over nullable dimensions is ambiguous (agg_grouping_sets pins
    the totals; this pins the disambiguation contract: gid bit k set ⇔
    dimension k rolled up, identical bit layout on both engines).

    Shape: one pass, |sets| partial aggregates — grouping sets expand
    map-side, never re-scan.
    """
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("t_gid_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
                    AS BIGINT) AS gid,
               COUNT(*) AS n
        FROM t_gid_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
        """
    )


# -- amount-collision audit — deferred queue ----------------------------------


@register(
    "agg_amount_collision_audit",
    oracle="""
    WITH t AS (
        SELECT event_id, user_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d
        FROM events
    )
    SELECT cents,
           CAST(COUNT(*) AS BIGINT)                 AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT)  AS n_users,
           CAST(MAX(d) - MIN(d) AS BIGINT)          AS day_span,
           CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS n_pairs
    FROM t
    GROUP BY cents
    HAVING COUNT(*) > 1
    """,
)
def amount_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-amount collision audit: every cent value occurring more than
    once, with its event count, distinct users, day span and implied pair
    count — the profile that sizes duplicate-payment candidate sets
    BEFORE running the pair join (n_pairs is exactly what the equi-join
    on the amount would emit per value), and the blocking-key quality
    report every entity-resolution pipeline tunes against. Formulated as
    a GROUP BY rather than a self-join: at any scale the audit costs one
    partial-aggregable pass, and a pathological value (the skew every
    blocking key fears) shows up as one big-n_pairs row instead of an
    exploding join. A first duplicate-detection attempt gated the PAIR
    join per user and matched an EMPTY set at both SFs — this audit is
    the query that would have said so up front.

    Integer discipline: cents, epoch days, and the n·(n−1)/2 pair count
    (exact: consecutive integers, one even) — nothing to round.
    """
    t = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        quantize(F.col("value"), MONEY_SCALE).alias("cents"),
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("d"),
    )
    return (
        t.groupBy("cents")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            (F.max("d") - F.min("d")).alias("day_span"),
        )
        .filter(F.col("n_events") > 1)
        .select(
            "cents",
            "n_events",
            "n_users",
            "day_span",
            F.expr("CAST(n_events * (n_events - 1) / 2 AS BIGINT)").alias(
                "n_pairs"
            ),
        )
    )


# -- collision probability: the log-free concentration statistic --------------


@register(
    "agg_collision_probability",
    oracle="""
    WITH per_user AS (
        SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_u
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(SUM(n_u) AS BIGINT)                       AS n_events,
           CAST(COUNT(*) AS BIGINT)                       AS n_users,
           CAST((1000000 * SUM(CAST(n_u AS HUGEINT) * (n_u - 1)))
                // (CAST(SUM(n_u) AS HUGEINT) * (SUM(n_u) - 1))
                AS BIGINT) AS collision_ppm,
           CAST((1000000 * CAST(SUM(n_u) AS HUGEINT) * SUM(n_u))
                // (SUM(CAST(n_u AS HUGEINT) * n_u) * COUNT(*))
                AS BIGINT) AS eff_user_share_ppm
    FROM per_user GROUP BY 1
    """,
)
def collision_probability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collision probability per event type — P(two random events of the
    type belong to the SAME user), the unbiased Simpson / Renyi-2
    concentration statistic: sum n_u(n_u-1) / (N(N-1)) in exact integer
    ppm. This is the log-free stand-in for entropy the repo's discipline
    prefers (exp(H2) = 1/sum p^2 — monotone in the same quantity), and
    the activity-concentration dual of the revenue HHI: "is this event
    type driven by a few heavy users or spread across many". The second
    column reports the EFFECTIVE user count (inverse Simpson of the
    per-user activity shares, N^2 / sum n_u^2) as a share of the actual
    user count in exact ppm: a perfectly uniform type reads 1e6, heavy
    concentration reads lower — the "how many users does this type
    really have" number, log-free.

    Arithmetic runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — the
    chi2_feature_selection recipe (ADVICE r7): the all-BIGINT form wrapped
    silently in non-ANSI Spark once 1e6·N² passed ~9.2e18 (N ≈ 3e6 events
    per type) while DuckDB's 128-bit SUM sailed on — a latent cross-engine
    divergence, now exact to N ≈ 7e15 and LOUDLY NULL (decimal overflow)
    past that instead of wrong. Shape: one partial-aggregable groupBy to
    the (type, user) relation, one to the type — two bounded exchanges,
    no window, no sort."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_u")
    )
    return per_user.groupBy("event_type").agg(
        F.sum("n_u").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * SUM(CAST(n_u AS DECIMAL(19,0)) * (n_u - 1)))"
            " div (CAST(SUM(n_u) AS DECIMAL(19,0)) * (SUM(n_u) - 1))"
            " AS BIGINT)"
        ).alias("collision_ppm"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * CAST(SUM(n_u) AS DECIMAL(19,0)) * SUM(n_u))"
            " div (SUM(CAST(n_u AS DECIMAL(19,0)) * n_u) * COUNT(*))"
            " AS BIGINT)"
        ).alias("eff_user_share_ppm"),
    )


# -- Theil-Sen slope: the robust trend estimate -------------------------------


@register(
    "stats_theil_sen",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ), slopes AS (
        SELECT a.event_type,
               b.v - a.v AS dv, b.d - a.d AS dd,
               CAST(b.v - a.v AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type AND b.d > a.d
    ), ranked AS (
        SELECT event_type, dv, dd, slope,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY slope, dv, dd) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS np
        FROM slopes
    )
    SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
           CAST(dv AS BIGINT) AS med_dv, CAST(dd AS BIGINT) AS med_dd,
           slope AS med_slope_cents_per_day
    FROM ranked WHERE rk = (np + 1) // 2
    """,
)
def theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen trend per event type: the LOWER MEDIAN of all pairwise
    daily-revenue slopes — the robust alternative to least squares (up to
    ~29% contamination before it budges; the estimator Mann-Kendall's
    sign test says "there IS a trend" about, this one says how steep).

    Exactness: each slope is ONE correctly-rounded IEEE division of two
    int64s (cents over day distance), so both engines compute identical
    doubles; the median is an ORDER STATISTIC over them (no averaging —
    lower median, same convention as the grouped medians), tie-broken by
    the exact integer pair (dv, dd) so equal-slope pairs rank
    identically. The chosen pair's integers ride along as the
    fraction-exact answer.

    Scale shape: the pair join is over the per-type DAILY relation — a
    calendar-bounded O(days^2) = O(465)-row relation per type, same
    discipline as Mann-Kendall; the raw scan collapses first. Never a
    pair join over events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.sum(quantize(F.col("value"), MONEY_SCALE)).alias("v"))
    # both sides of the pair self-join consume the daily rollup: without a
    # checkpoint the events scan + groupBy executed twice per action (zero
    # runtime exchange reuse). |types|×|days| rows — calendar-bounded.
    daily = daily.localCheckpoint(eager=False)
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.d") > F.col("a.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("b.v") - F.col("a.v")).alias("dv"),
        (F.col("b.d") - F.col("a.d")).alias("dd"),
        (
            (F.col("b.v") - F.col("a.v")).cast("double")
            / (F.col("b.d") - F.col("a.d")).cast("double")
        ).alias("slope"),
    )
    ranked = slopes.select(
        "*",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("slope", "dv", "dd"))
        .alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("np"),
    )
    return ranked.filter(F.col("rk") == F.expr("(np + 1) div 2")).select(
        "event_type",
        F.col("np").cast("long").alias("n_pairs"),
        F.col("dv").cast("long").alias("med_dv"),
        F.col("dd").cast("long").alias("med_dd"),
        F.col("slope").alias("med_slope_cents_per_day"),
    )


# -- Poisson bootstrap: distributed-exact resampling uncertainty --------------

_BOOT_B = 32  # bootstrap replicates
#: cumulative Poisson(1) thresholds scaled to 1e6 — exact shared literals;
#: the inverse-CDF of a hash-uniform against these gives each (row,
#: replicate) its resample weight with no RNG state anywhere.
_BOOT_CDF = (367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990)


def _boot_weight_case(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_BOOT_CDF)
    )
    return f"CASE {cases} ELSE {len(_BOOT_CDF)} END"


@register(
    "stats_poisson_bootstrap",
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS v,
               md5(user_id || '|' || CAST(ts AS VARCHAR) || '|'
                   || CAST(ROUND(value * 100) AS BIGINT)) AS rk
        FROM events WHERE event_type = 'purchase'
    ), weighted AS (
        SELECT b.i AS replicate, v,
               ({_boot_weight_case(
                   "('0x' || substr(md5(rk || '#' || b.i), 1, 12))::BIGINT"
                   " % 1000000")}) AS w
        FROM base, UNNEST(generate_series(0, {_BOOT_B - 1})) AS b(i)
    ), reps AS (
        SELECT replicate,
               CAST(SUM(w * v) // NULLIF(SUM(w), 0) AS BIGINT) AS m_cents
        FROM weighted GROUP BY 1
    )
    SELECT CAST({_BOOT_B} AS BIGINT)              AS n_replicates,
           CAST(SUM(m_cents) AS BIGINT)           AS boot_mean_sum_cents,
           CAST({_BOOT_B} * SUM(m_cents * m_cents)
                - SUM(m_cents) * SUM(m_cents) AS BIGINT) AS var_scaled,
           CAST(({_BOOT_B} * SUM(m_cents * m_cents)
                 - SUM(m_cents) * SUM(m_cents))
                // ({_BOOT_B} * ({_BOOT_B} - 1)) AS BIGINT) AS se2_cents2
    FROM reps
    """,
)
def poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap uncertainty of the mean purchase value via the POISSON
    bootstrap — the resampling scheme that actually works on distributed
    data: classical bootstrap needs a global n-out-of-n multinomial draw
    (coordination across every partition), Poisson(1) weights are
    per-row-independent, so each (row, replicate) weight is computed
    map-side with zero coordination — the formulation Spark/MapReduce
    bootstrap literature settled on (e.g. the "bag of little bootstraps"
    family). Weights are DETERMINISTIC: a hash-uniform from
    md5(row-content # replicate) inverted through exact Poisson(1) CDF
    literals (shared constants, scaled 1e6), so both engines draw the
    identical resample and the gate hash-matches — no RNG state exists.

    Per replicate the weighted mean lands as an integer (cents,
    truncating div); the across-replicate variance uses the n-scaled
    identity B*sum(m^2) - (sum m)^2 so no replicate mean is ever a
    float; se2_cents2 is the squared standard error in cents^2 (the
    consumer's sqrt away from an SE, per the repo's sqrt-free gate
    discipline). Row identity for the weight hash is CONTENT-derived
    (user|ts|cents) — byte-identical rows would share a weight;
    acceptable for this fixture and documented, production adds a source
    row id. Shape: the B-fold explode is map-only (the standard B-times
    cost of bootstrap, embarrassingly parallel), then one partial-
    aggregable groupBy per replicate and one {_BOOT_B}-row final
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type") == "purchase").select(
        quantize(F.col("value"), MONEY_SCALE).alias("v"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("user_id"),
                F.col("ts").cast("string"),
                quantize(F.col("value"), MONEY_SCALE).cast("string"),
            )
        ).alias("rk"),
    )
    weighted = base.select(
        "v",
        "rk",
        F.explode(F.expr(f"sequence(0, {_BOOT_B - 1})")).alias("replicate"),
    ).withColumn(
        "w",
        F.expr(
            _boot_weight_case(
                "CAST(conv(substring(md5(concat(rk, '#', CAST(replicate"
                " AS STRING))), 1, 12), 16, 10) AS BIGINT) % 1000000"
            )
        ),
    )
    reps = weighted.groupBy("replicate").agg(
        F.expr("CAST(SUM(w * v) div NULLIF(SUM(w), 0) AS BIGINT)").alias(
            "m_cents"
        )
    )
    return reps.agg(
        F.lit(_BOOT_B).cast("long").alias("n_replicates"),
        F.sum("m_cents").cast("long").alias("boot_mean_sum_cents"),
        F.expr(
            f"CAST({_BOOT_B} * SUM(m_cents * m_cents)"
            " - SUM(m_cents) * SUM(m_cents) AS BIGINT)"
        ).alias("var_scaled"),
        F.expr(
            f"CAST(({_BOOT_B} * SUM(m_cents * m_cents)"
            " - SUM(m_cents) * SUM(m_cents))"
            f" div ({_BOOT_B} * ({_BOOT_B} - 1)) AS BIGINT)"
        ).alias("se2_cents2"),
    )
poisson_bootstrap.__doc__ = poisson_bootstrap.__doc__.format(_BOOT_B=_BOOT_B)  # real docstring (ADVICE r7)


# -- two-sample distribution tests: KS + Mann-Whitney -------------------------
#
# Both read one densified ECDF grid: per (event_type, quantized cent value)
# the ≤x and <x cumulative counts, evaluated at EVERY distinct pooled value
# (a LEFT-join densification against the distinct-value spine, so each
# type's step function is comparable point-for-point). Grid size is
# |types| × |distinct cents| — bounded by the metric's quantized DOMAIN,
# not the event volume, so the windows and the pair join stay calendar/
# domain-sized at any scale (the daily-relation argument, applied to the
# value axis).

_ECDF_GRID_SQL = """
    vals AS (
        SELECT event_type AS et, CAST(ROUND(value * 100) AS BIGINT) AS x
        FROM events
    ), cnt AS (
        SELECT et, x, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY 1, 2
    ), ets AS (
        SELECT et, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1
    ), xs AS (
        SELECT DISTINCT x FROM vals
    ), grid AS (
        SELECT e.et, e.n, xs.x, COALESCE(c.c, 0) AS c
        FROM ets e CROSS JOIN xs
        LEFT JOIN cnt c ON c.et = e.et AND c.x = xs.x
    ), cum AS (
        SELECT et, n, x, c,
               SUM(c) OVER (PARTITION BY et ORDER BY x) AS cum_le,
               SUM(c) OVER (PARTITION BY et ORDER BY x) - c AS cum_lt
        FROM grid
    )"""


def _ecdf_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(et, n, x, c, cum_le, cum_lt): the densified per-type ECDF grid the
    SQL CTE above describes, as a DataFrame."""
    ev = load_table(spark, sf_dir, "events")
    vals = ev.select(
        F.col("event_type").alias("et"),
        quantize(F.col("value"), MONEY_SCALE).alias("x"),
    )
    cnt = vals.groupBy("et", "x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ets = cnt.groupBy("et").agg(F.sum("c").cast("long").alias("n"))
    xs = vals.select("x").distinct()
    grid = (
        F.broadcast(ets)
        .crossJoin(xs)
        .join(cnt, ["et", "x"], "left")
        .select("et", "n", "x", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    )
    w = W.partitionBy("et").orderBy("x")
    return grid.select(
        "et",
        "n",
        "x",
        "c",
        F.sum("c").over(w).alias("cum_le"),
        (F.sum("c").over(w) - F.col("c")).alias("cum_lt"),
    )


@register(
    "stats_ks_two_sample",
    oracle=f"""
    WITH {_ECDF_GRID_SQL}
    SELECT a.et AS type_a, b.et AS type_b,
           CAST(MAX(a.n) AS BIGINT) AS n_a,
           CAST(MAX(b.n) AS BIGINT) AS n_b,
           CAST(MAX(ABS(CAST(a.cum_le AS HUGEINT) * b.n
                        - CAST(b.cum_le AS HUGEINT) * a.n)) AS BIGINT) AS ks_num,
           CAST((1000000 * MAX(ABS(CAST(a.cum_le AS HUGEINT) * b.n
                                   - CAST(b.cum_le AS HUGEINT) * a.n)))
                // (CAST(MAX(a.n) AS HUGEINT) * MAX(b.n)) AS BIGINT) AS ks_ppm
    FROM cum a JOIN cum b ON a.x = b.x AND a.et < b.et
    GROUP BY 1, 2
    """,
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic for every event-type pair:
    D = max_x |F_a(x) - F_b(x)| over the pooled quantized values — the
    distribution-shift gate ("did the value distribution of clicks drift
    away from views") data-quality monitoring runs between snapshots.

    Exact rational arithmetic over the common denominator n_a*n_b: the
    max runs over integer |cum_a*n_b - cum_b*n_a| and only the final ppm
    report divides (DECIMAL(38,0)/HUGEINT intermediates, loud-overflow
    per the chi2 recipe — exact past any int64 sample-size bound). The
    supremum over ALL reals equals the max over pooled sample points
    because both ECDFs are constant between them and right-continuous at
    them, so the densified grid IS the complete candidate set.
    """
    cum = _ecdf_grid(spark, sf_dir)
    a = cum.select(
        F.col("et").alias("type_a"), F.col("x"),
        F.col("n").alias("na"), F.col("cum_le").alias("ca"),
    )
    b = cum.select(
        F.col("et").alias("type_b"), F.col("x"),
        F.col("n").alias("nb"), F.col("cum_le").alias("cb"),
    )
    diff = F.expr(
        "ABS(CAST(ca AS DECIMAL(19,0)) * nb - CAST(cb AS DECIMAL(19,0)) * na)"
    )
    return (
        a.join(b, "x")
        .filter(F.col("type_a") < F.col("type_b"))
        .withColumn("d", diff)
        .groupBy("type_a", "type_b")
        .agg(
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
            F.max("d").cast("long").alias("ks_num"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * MAX(d))"
                " div (CAST(MAX(na) AS DECIMAL(19,0)) * MAX(nb)) AS BIGINT)"
            ).alias("ks_ppm"),
        )
    )


@register(
    "stats_mann_whitney_u",
    oracle=f"""
    WITH {_ECDF_GRID_SQL}
    SELECT a.et AS type_a, b.et AS type_b,
           CAST(MAX(a.n) AS BIGINT) AS n_a,
           CAST(MAX(b.n) AS BIGINT) AS n_b,
           CAST(SUM(CAST(a.c AS HUGEINT)
                    * (2 * (a.cum_lt + b.cum_lt) + a.c + b.c + 1))
                - CAST(MAX(a.n) AS HUGEINT) * (MAX(a.n) + 1)
                AS BIGINT) AS u_a_doubled,
           CAST((1000000 * (SUM(CAST(a.c AS HUGEINT)
                                * (2 * (a.cum_lt + b.cum_lt) + a.c + b.c + 1))
                            - CAST(MAX(a.n) AS HUGEINT) * (MAX(a.n) + 1)))
                // (2 * CAST(MAX(a.n) AS HUGEINT) * MAX(b.n))
                AS BIGINT) AS auc_ppm
    FROM cum a JOIN cum b ON a.x = b.x AND a.et < b.et
    GROUP BY 1, 2
    """,
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) statistic for every event-type pair, with
    its common-language effect size U/(n_a*n_b) = P(X_a > X_b) + P(X_a =
    X_b)/2 in exact ppm — the nonparametric "are a's values stochastically
    larger" companion to the KS shape test (KS asks IF the distributions
    differ; U says in WHICH DIRECTION).

    Tie handling is the textbook average-rank rule, kept integral by
    doubling: an element of a at value x has doubled pooled rank
    2*(pooled count < x) + (pooled ties at x) + 1, so R_a_doubled sums
    c_a(x) * that over the shared ECDF grid and U_a_doubled = R_a_doubled
    - n_a*(n_a+1). U is bounded by [0, 2*n_a*n_b] so the ppm division's
    operands are non-negative — truncation equals floor cross-engine.
    DECIMAL(38,0)/HUGEINT intermediates, loud on overflow.
    """
    cum = _ecdf_grid(spark, sf_dir)
    a = cum.select(
        F.col("et").alias("type_a"), F.col("x"),
        F.col("n").alias("na"), F.col("c").alias("ca"),
        F.col("cum_lt").alias("lta"),
    )
    b = cum.select(
        F.col("et").alias("type_b"), F.col("x"),
        F.col("n").alias("nb"), F.col("c").alias("cb"),
        F.col("cum_lt").alias("ltb"),
    )
    r_term = F.expr(
        "CAST(ca AS DECIMAL(19,0)) * (2 * (lta + ltb) + ca + cb + 1)"
    )
    return (
        a.join(b, "x")
        .filter(F.col("type_a") < F.col("type_b"))
        .withColumn("rt", r_term)
        .groupBy("type_a", "type_b")
        .agg(
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
            F.expr(
                "CAST(SUM(rt) - CAST(MAX(na) AS DECIMAL(19,0)) * (MAX(na) + 1)"
                " AS BIGINT)"
            ).alias("u_a_doubled"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0))"
                " * (SUM(rt) - CAST(MAX(na) AS DECIMAL(19,0)) * (MAX(na) + 1)))"
                " div (2 * CAST(MAX(na) AS DECIMAL(19,0)) * MAX(nb)) AS BIGINT)"
            ).alias("auc_ppm"),
        )
    )

# -- Spearman rank correlation (integer-exact, series-sized) ------------------


@register(
    "stats_spearman_rho",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ), r AS (
        SELECT 2 * RANK() OVER (ORDER BY n_events)
                 + COUNT(*) OVER (PARTITION BY n_events) - 1 AS arx2,
               2 * RANK() OVER (ORDER BY rev_cents)
                 + COUNT(*) OVER (PARTITION BY rev_cents) - 1 AS ary2
        FROM daily
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM((arx2 - ary2) * (arx2 - ary2)) AS BIGINT) AS sum_d2_x4,
           CAST(1000000
                - (1500000 * SUM((arx2 - ary2) * (arx2 - ary2)))
                  // (COUNT(*) * (COUNT(*) * COUNT(*) - 1))
                AS BIGINT) AS rho_ppm
    FROM r
    """,
)
def spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily purchase VOLUME and daily
    purchase REVENUE — the monotone-association test that completes the
    correlation kit (Pearson assumes linearity, Mann–Kendall tests trend
    against time; Spearman tests any monotone coupling between two
    series). Tie-averaged ranks are kept integral by doubling (the
    stats_mann_whitney device: 2·avg_rank = 2·RANK + ties − 1), so
    Σd² arrives ×4 and ρ = 1 − 6Σd²/(n(n²−1)) becomes the exact integer
    rho_ppm = 1e6 − ⌊1.5e6·sum_d2_x4 / (n(n²−1))⌋ — no float ever exists.

    Shape: the raw scan collapses to the DAILY series first (partial+final
    agg), so the ranking windows run over a bounded value-DOMAIN relation
    (days), never over events — same discipline as the KS/ECDF battery.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(quantize(F.col("value"), MONEY_SCALE))
            .cast("long")
            .alias("rev_cents"),
        )
    )
    arx2 = (
        2 * F.rank().over(W.orderBy("n_events"))
        + F.count(F.lit(1)).over(W.partitionBy("n_events"))
        - 1
    )
    ary2 = (
        2 * F.rank().over(W.orderBy("rev_cents"))
        + F.count(F.lit(1)).over(W.partitionBy("rev_cents"))
        - 1
    )
    r = daily.select(arx2.alias("arx2"), ary2.alias("ary2"))
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum((F.col("arx2") - F.col("ary2")) * (F.col("arx2") - F.col("ary2")))
        .cast("long")
        .alias("sum_d2_x4"),
    ).select(
        "n_days",
        "sum_d2_x4",
        F.expr(
            "CAST(1000000 - (1500000 * sum_d2_x4)"
            " div (n_days * (n_days * n_days - 1)) AS BIGINT)"
        ).alias("rho_ppm"),
    )


# -- Welch's t-squared (exact rational, DECIMAL(38) cross-multiplied) ---------


@register(
    "stats_welch_t2",
    oracle="""
    WITH s AS (
        SELECT event_type, CAST(ROUND(value) AS BIGINT) AS v
        FROM events WHERE event_type IN ('purchase', 'view')
    ), m AS (
        SELECT
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
          CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS HUGEINT)     AS n2,
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN v ELSE 0 END) AS HUGEINT) AS s1,
          CAST(SUM(CASE WHEN event_type = 'view' THEN v ELSE 0 END) AS HUGEINT)     AS s2,
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN v * v ELSE 0 END) AS HUGEINT) AS q1,
          CAST(SUM(CASE WHEN event_type = 'view' THEN v * v ELSE 0 END) AS HUGEINT)     AS q2
        FROM s
    )
    SELECT CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2,
           CAST(s1 * n2 - s2 * n1 AS BIGINT) AS mean_diff_num,
           CAST((1000000 * ((s1 * n2 - s2 * n1) * (s1 * n2 - s2 * n1))
                 * ((n1 - 1) * (n2 - 1)))
                // ((n1 * q1 - s1 * s1) * (n2 * n2 * (n2 - 1))
                    + (n2 * q2 - s2 * s2) * (n1 * n1 * (n1 - 1)))
                AS BIGINT) AS t2_ppm
    FROM m
    """,
)
def welch_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic (purchase vs view values),
    reported as t² in exact ppm — the parametric counterpart of
    stats_mann_whitney on the same two samples. Cross-multiplying the
    textbook form t² = (m̄1−m̄2)² / (s1²/n1 + s2²/n2) into one integer
    rational removes every division and square root:

        t² = (S1·n2 − S2·n1)²·(n1−1)(n2−1)
             / [ (n1·Q1 − S1²)·n2²(n2−1) + (n2·Q2 − S2²)·n1²(n1−1) ]

    over the integer sums S=Σv, Q=Σv² of UNIT-quantized values (whole
    units, not cents: the exact rational grows as n⁴·v², and whole units
    keep the 128-bit digit budget safe to ~10⁶ samples per group; past
    that, recenter v by a first-pass integer mean or drop to the float
    path — documented, not silent). Both engines compute in 128-bit
    integer types (Spark DECIMAL(38,0), DuckDB HUGEINT) — exact,
    order-free, and bit-identical; mean_diff_num carries the sign the
    squared statistic discards.

    Shape: one scan, one 1-row partial+final aggregate (six sums); the
    rational arithmetic happens once on the driver-side single row."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("purchase", "view")).select(
        "event_type", quantize(F.col("value"), 1).alias("v")
    )
    m = s.agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("n1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("n2"),
        F.sum(F.when(F.col("event_type") == "purchase", F.col("v")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("s1"),
        F.sum(F.when(F.col("event_type") == "view", F.col("v")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("s2"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("v") * F.col("v")).otherwise(0)
        )
        .cast("decimal(38,0)")
        .alias("q1"),
        F.sum(
            F.when(F.col("event_type") == "view", F.col("v") * F.col("v")).otherwise(0)
        )
        .cast("decimal(38,0)")
        .alias("q2"),
    )
    return m.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        (F.col("s1") * F.col("n2") - F.col("s2") * F.col("n1"))
        .cast("long")
        .alias("mean_diff_num"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * ((s1 * n2 - s2 * n1) * (s1 * n2 - s2 * n1))"
            " * ((n1 - 1) * (n2 - 1)))"
            " div ((n1 * q1 - s1 * s1) * (n2 * n2 * (n2 - 1))"
            "      + (n2 * q2 - s2 * s2) * (n1 * n1 * (n1 - 1)))"
            " AS BIGINT)"
        ).alias("t2_ppm"),
    )


# -- difference-in-differences (deferred: r10 activation) -------------------------


@register(
    "stats_diff_in_diff",
    oracle="""
    WITH b AS (
        SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
        FROM events
    ),
    pop AS (
        SELECT DISTINCT user_id,
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated
        FROM events
    ),
    rev AS (
        SELECT user_id,
               CASE WHEN CAST(ts AS DATE) <= d0 + CAST(
                    date_diff('day', d0, d1) // 2 AS INT) THEN 0 ELSE 1 END
                   AS period,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events, b WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    cells AS (
        SELECT pop.treated, p.period,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(COALESCE(rev.cents, 0)) AS BIGINT) AS sum_cents
        FROM pop CROSS JOIN (VALUES (0), (1)) p(period)
        LEFT JOIN rev ON rev.user_id = pop.user_id AND rev.period = p.period
        GROUP BY 1, 2
    ),
    m AS (
        SELECT
          MAX(CASE WHEN treated = 1 AND period = 0 THEN sum_cents END) AS st0,
          MAX(CASE WHEN treated = 1 AND period = 1 THEN sum_cents END) AS st1,
          MAX(CASE WHEN treated = 0 AND period = 0 THEN sum_cents END) AS sc0,
          MAX(CASE WHEN treated = 0 AND period = 1 THEN sum_cents END) AS sc1,
          MAX(CASE WHEN treated = 1 THEN n_users END) AS nt,
          MAX(CASE WHEN treated = 0 THEN n_users END) AS nc
        FROM cells
    )
    SELECT CAST(nt AS BIGINT) AS n_treat, CAST(nc AS BIGINT) AS n_ctrl,
           CAST(st0 AS BIGINT) AS treat_pre_cents,
           CAST(st1 AS BIGINT) AS treat_post_cents,
           CAST(sc0 AS BIGINT) AS ctrl_pre_cents,
           CAST(sc1 AS BIGINT) AS ctrl_post_cents,
           CAST(CASE WHEN (1000 * (st1 - st0) * nc
                           - 1000 * (sc1 - sc0) * nt) >= 0
                THEN (1000 * (st1 - st0) * nc - 1000 * (sc1 - sc0) * nt)
                     // (nt * nc)
                ELSE -((-(1000 * (st1 - st0) * nc
                          - 1000 * (sc1 - sc0) * nt)) // (nt * nc)) END
                AS BIGINT) AS did_milli_cents
    FROM m
    """,
)
def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the canonical quasi-experimental
    estimate: per-user purchase revenue, split pre/post at the time-range
    midpoint and treated/control by deterministic id parity, with the
    effect (Δtreated − Δcontrol) in sign-safe exact milli-cents per user.
    The population is ALL users observed in events (a user with no
    purchases in a period contributes an explicit 0 — dropping them is
    the classic DiD composition bug, avoided here by the population ×
    period grid), so per-group denominators are period-invariant and the
    estimate reduces to one exact integer rational. Completes the causal
    kit beside stats_uplift_stratified (conversion uplift, no time
    axis) and events_backtest_* (forecast counterfactuals).

    Shape: events collapse to (user, period) revenue; the grid is
    |users|×2 via a 2-row cross join; four cells and the estimate are a
    1-row conditional aggregate. Nothing bigger than the user relation
    ever shuffles.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    pop = ev.select(
        "user_id", (F.col("user_id") % 2 == 0).cast("long").alias("treated")
    ).distinct()
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(b))
        .groupBy(
            "user_id",
            F.when(
                F.to_date("ts")
                <= F.expr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))"),
                0,
            )
            .otherwise(1)
            .alias("period"),
        )
        .agg(F.sum(quantize(F.col("value"), 100)).cast("long").alias("cents"))
    )
    periods = ev.sparkSession.createDataFrame([(0,), (1,)], "period long")
    cells = (
        pop.crossJoin(F.broadcast(periods))
        .join(rev, ["user_id", "period"], "left")
        .groupBy("treated", "period")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(F.coalesce(F.col("cents"), F.lit(0)))
            .cast("long")
            .alias("sum_cents"),
        )
    )
    cell = lambda t, p: F.max(  # noqa: E731
        F.when((F.col("treated") == t) & (F.col("period") == p),
               F.col("sum_cents"))
    )
    grp = lambda t: F.max(  # noqa: E731
        F.when(F.col("treated") == t, F.col("n_users"))
    )
    m = cells.agg(
        cell(1, 0).alias("st0"),
        cell(1, 1).alias("st1"),
        cell(0, 0).alias("sc0"),
        cell(0, 1).alias("sc1"),
        grp(1).alias("nt"),
        grp(0).alias("nc"),
    )
    return m.selectExpr(
        "CAST(nt AS BIGINT) AS n_treat",
        "CAST(nc AS BIGINT) AS n_ctrl",
        "CAST(st0 AS BIGINT) AS treat_pre_cents",
        "CAST(st1 AS BIGINT) AS treat_post_cents",
        "CAST(sc0 AS BIGINT) AS ctrl_pre_cents",
        "CAST(sc1 AS BIGINT) AS ctrl_post_cents",
        "CAST(CASE WHEN (1000 * (st1 - st0) * nc - 1000 * (sc1 - sc0) * nt)"
        " >= 0"
        " THEN (1000 * (st1 - st0) * nc - 1000 * (sc1 - sc0) * nt)"
        "      div (nt * nc)"
        " ELSE -((-(1000 * (st1 - st0) * nc - 1000 * (sc1 - sc0) * nt))"
        "      div (nt * nc)) END AS BIGINT) AS did_milli_cents",
    )


# -- equi-depth histogram (optimizer statistics form; deferred) -------------------

_EQD_BUCKETS = 8


@register(
    "agg_equi_depth_histogram",
    oracle=f"""
    WITH s AS (
        SELECT CAST(ROUND(o_totalprice) AS BIGINT) AS v FROM orders
    ),
    h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM s GROUP BY 1),
    c AS (
        SELECT v, cnt,
               SUM(cnt) OVER (ORDER BY v) AS cum,
               SUM(cnt) OVER () AS n
        FROM h
    ),
    b AS (
        SELECT t.j,
               MIN(CASE WHEN {_EQD_BUCKETS} * (cum - cnt) < t.j * n
                         AND {_EQD_BUCKETS} * cum > (t.j - 1) * n
                    THEN v END) AS lo,
               MAX(CASE WHEN {_EQD_BUCKETS} * (cum - cnt) < t.j * n
                         AND {_EQD_BUCKETS} * cum > (t.j - 1) * n
                    THEN v END) AS hi,
               SUM(CASE WHEN {_EQD_BUCKETS} * (cum - cnt) < t.j * n
                         AND {_EQD_BUCKETS} * cum > (t.j - 1) * n
                    THEN cnt ELSE 0 END) AS gross_rows,
               COUNT(CASE WHEN {_EQD_BUCKETS} * (cum - cnt) < t.j * n
                           AND {_EQD_BUCKETS} * cum > (t.j - 1) * n
                      THEN 1 END) AS n_distinct
        FROM c CROSS JOIN generate_series(1, {_EQD_BUCKETS}) t(j)
        GROUP BY 1
    )
    SELECT CAST(j AS INT) AS bucket,
           CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi,
           CAST(gross_rows AS BIGINT) AS gross_rows,
           CAST(n_distinct AS BIGINT) AS n_distinct
    FROM b
    """,
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order totals in {_EQD_BUCKETS} buckets —
    the optimizer statistic ANALYZE TABLE builds (equi-depth bounds give
    selectivity estimates a constant relative error where the existing
    equi-width sketch_quantile_histogram degrades on skewed tails). A
    distinct value v belongs to bucket j when its rank span
    (cum−cnt, cum] overlaps ((j−1)·n/k, j·n/k] — written with
    cross-multiplied integers so no division exists; heavy values
    spanning multiple depth boundaries appear in EACH bucket they
    overlap (gross_rows can exceed n/k — exactly how per-bucket
    ndv/rowcount stats handle heavy hitters, and why the per-bucket
    distinct count rides along).

    Shape: the scan collapses to the whole-unit value histogram; the
    cumulative window runs over that value-domain relation, and the
    bucket assignment is a constant ×{_EQD_BUCKETS} fan-out over it.
    Nothing order-sized is ever sorted.
    """
    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(quantize(F.col("o_totalprice"), 1).alias("v"))
    h = s.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wc = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    wn = W.partitionBy()
    c = h.select(
        "v",
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    k = _EQD_BUCKETS
    hit = (k * (F.col("cum") - F.col("cnt")) < F.col("j") * F.col("n")) & (
        k * F.col("cum") > (F.col("j") - 1) * F.col("n")
    )
    return (
        c.select(
            "v",
            "cnt",
            "cum",
            "n",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"),
        )
        .groupBy(F.col("j").cast("int").alias("bucket"))
        .agg(
            F.min(F.when(hit, F.col("v"))).cast("long").alias("lo"),
            F.max(F.when(hit, F.col("v"))).cast("long").alias("hi"),
            F.sum(F.when(hit, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("gross_rows"),
            F.count(F.when(hit, F.lit(1))).cast("long").alias("n_distinct"),
        )
    )


# -- Wilcoxon signed-rank (paired, integer-exact) --------------------------------


@register(
    "stats_wilcoxon_signed_rank",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    diffs AS (
        SELECT x - LAG(x) OVER (ORDER BY d) AS dx FROM daily
    ),
    nz AS (SELECT dx, ABS(dx) AS adx FROM diffs WHERE dx IS NOT NULL AND dx <> 0),
    h AS (SELECT adx, CAST(COUNT(*) AS BIGINT) AS cnt FROM nz GROUP BY 1),
    r AS (
        SELECT adx,
               2 * (SUM(cnt) OVER (ORDER BY adx) - cnt) + cnt + 1 AS ar2
        FROM h
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN dx > 0 THEN ar2 ELSE 0 END) AS BIGINT) AS w2_plus,
           CAST(SUM(CASE WHEN dx < 0 THEN ar2 ELSE 0 END) AS BIGINT) AS w2_minus,
           CAST(COUNT(*) * (COUNT(*) + 1) // 2 AS BIGINT) AS e_w2,
           CAST(SUM(CASE WHEN dx > 0 THEN ar2 ELSE 0 END)
                - COUNT(*) * (COUNT(*) + 1) // 2 AS BIGINT) AS dev
    FROM nz JOIN r USING (adx)
    """,
)
def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on consecutive-day revenue changes — the
    PAIRED counterpart of stats_mann_whitney_u (is tomorrow systematically
    different from today, robust to outliers?). Zero differences drop per
    the textbook procedure; tie-averaged ranks of |Δ| stay integral via
    the doubling device, so W⁺ (doubled), its exact null expectation
    n(n+1)/2, and the signed deviation are all exact integers — the
    deviation is a SUBTRACTION, never a signed division.

    Shape: corpus → daily series (one scan); the lag runs over the
    calendar-bounded series, the rank window over the |Δ| value-domain
    histogram; nothing event-sized is ever sorted.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum(quantize(F.col("value"), 100)).cast("long").alias("x"))
    )
    wd = W.orderBy("d")
    nz = (
        daily.select((F.col("x") - F.lag("x").over(wd)).alias("dx"))
        .filter(F.col("dx").isNotNull() & (F.col("dx") != 0))
        .select("dx", F.abs(F.col("dx")).alias("adx"))
        .localCheckpoint(eager=False)  # feeds the histogram AND the probe join
    )
    h = nz.groupBy("adx").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wr = W.orderBy("adx").rowsBetween(W.unboundedPreceding, 0)
    r = h.select(
        "adx",
        (2 * (F.sum("cnt").over(wr) - F.col("cnt")) + F.col("cnt") + 1).alias(
            "ar2"
        ),
    )
    return nz.join(F.broadcast(r), "adx").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("dx") > 0, F.col("ar2")).otherwise(0))
        .cast("long")
        .alias("w2_plus"),
        F.sum(F.when(F.col("dx") < 0, F.col("ar2")).otherwise(0))
        .cast("long")
        .alias("w2_minus"),
        F.expr("CAST(COUNT(*) * (COUNT(*) + 1) div 2 AS BIGINT)").alias("e_w2"),
        F.expr(
            "CAST(SUM(CASE WHEN dx > 0 THEN ar2 ELSE 0 END)"
            " - COUNT(*) * (COUNT(*) + 1) div 2 AS BIGINT)"
        ).alias("dev"),
    )


# -- Kendall rank correlation (tau-a, integer-exact) ----------------------------


@register(
    "stats_kendall_tau",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    p AS (
        SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS con,
               CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS dis
        FROM daily a JOIN daily b ON a.d < b.d
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
    SELECT n_days,
           CAST(SUM(con) AS BIGINT) AS concordant,
           CAST(SUM(dis) AS BIGINT) AS discordant,
           CAST(COUNT(*) - SUM(con) - SUM(dis) AS BIGINT) AS tied,
           CAST(CASE WHEN SUM(con) >= SUM(dis)
                     THEN (2000000 * (SUM(con) - SUM(dis)))
                          // (n_days * (n_days - 1))
                     ELSE -((2000000 * (SUM(dis) - SUM(con)))
                          // (n_days * (n_days - 1))) END
                AS BIGINT) AS tau_a_ppm
    FROM p, t GROUP BY n_days
    """,
)
def kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a between daily purchase volume and daily revenue —
    the pair-concordance view of monotone association that completes the
    correlation kit beside Pearson (linear) and Spearman (rank): tau
    counts, over every day pair, whether the two series move the same way.
    tau_a = (C − D) / (n(n−1)/2), emitted in exact signed ppm with the
    division sign-split so truncation is engine-identical; concordant /
    discordant / tied pair counts ride along as exact integers.

    Shape: the corpus collapses to the DAILY series first, so the pair
    join is day²-bounded — it grows with the calendar, never with event
    volume (a year is ~66 k pairs; the inversion-counting merge-sort form
    is only worth its complexity at decade×minute granularity). Same
    staging discipline as stats_spearman_rho on the same series: one scan,
    and the pair product never sees raw events.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum(quantize(F.col("value"), 100)).cast("long").alias("y"),
        )
        # feeds both self-join sides and the n_days total: one corpus scan
        .localCheckpoint(eager=False)
    )
    a, b = daily.alias("a"), daily.alias("b")
    prod = (F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))
    p = a.join(b, F.col("a.d") < F.col("b.d")).select(
        F.when(prod > 0, 1).otherwise(0).alias("con"),
        F.when(prod < 0, 1).otherwise(0).alias("dis"),
    )
    t = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (
        p.crossJoin(F.broadcast(t))
        .groupBy("n_days")
        .agg(
            F.sum("con").cast("long").alias("concordant"),
            F.sum("dis").cast("long").alias("discordant"),
            (F.count(F.lit(1)) - F.sum("con") - F.sum("dis"))
            .cast("long")
            .alias("tied"),
            F.expr(
                "CAST(CASE WHEN SUM(con) >= SUM(dis)"
                " THEN (2000000 * (SUM(con) - SUM(dis)))"
                "      div (n_days * (n_days - 1))"
                " ELSE -((2000000 * (SUM(dis) - SUM(con)))"
                "      div (n_days * (n_days - 1))) END AS BIGINT)"
            ).alias("tau_a_ppm"),
        )
    )


# -- Kruskal-style k-sample mean ranks -----------------------------------------


@register(
    "stats_kruskal_mean_ranks",
    oracle="""
    WITH s AS (
        SELECT o_orderpriority AS grp,
               CAST(ROUND(o_totalprice) AS BIGINT) AS v
        FROM orders
    ),
    h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM s GROUP BY 1),
    r AS (
        SELECT v,
               2 * (SUM(cnt) OVER (ORDER BY v) - cnt) + cnt + 1 AS ar2
        FROM h
    ),
    g AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ar2) AS BIGINT) AS rank_sum_x2
        FROM s JOIN r USING (v) GROUP BY 1
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM s)
    SELECT grp, n, rank_sum_x2,
           CAST((1000 * rank_sum_x2) // (2 * n) AS BIGINT) AS mean_rank_milli,
           CAST(500 * (n_total + 1) AS BIGINT) AS expected_milli,
           CAST((1000 * rank_sum_x2) // (2 * n) - 500 * (n_total + 1)
                AS BIGINT) AS dev_milli
    FROM g, t
    """,
)
def kruskal_mean_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis-style k-sample rank comparison: per-group mean rank of
    order totals across the five order priorities, against the global
    expected mid-rank (N+1)/2. This is the k-group extension of
    stats_mann_whitney — under the null every group's mean rank sits at
    the mid-rank; dev_milli is the signed exact-milli displacement that
    feeds the H statistic. Tie-averaged ranks stay integral via the
    doubling device (2·avgrank = 2·n_below + ties + 1), values are
    quantized to whole units, and every emitted number is an exact
    integer — mean_rank_milli divides two positive integers, dev_milli is
    a DIFFERENCE of exact integers (so its sign never meets an engine-
    specific division convention).

    Shape: the order scan collapses to a value-domain histogram (distinct
    whole-unit totals); the only window runs over that histogram, and the
    doubled-rank lookup joins back to the (grp, v) relation — broadcast-
    sized right side, no pooled sort over orders at any scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    # collapse the scan ONCE to the (grp, value) contingency relation —
    # |groups| × |distinct whole-unit totals|, value-domain-bounded — and
    # derive the histogram, the per-group sums, and the grand total from
    # it, so the orders scan is single-pass
    sv = (
        orders.groupBy(
            F.col("o_orderpriority").alias("grp"),
            quantize(F.col("o_totalprice"), 1).alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
        .localCheckpoint(eager=False)
    )
    h = sv.groupBy("v").agg(F.sum("m").cast("long").alias("cnt"))
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    r = h.select(
        "v",
        (
            2 * (F.sum("cnt").over(w) - F.col("cnt")) + F.col("cnt") + 1
        ).alias("ar2"),
    )
    g = (
        sv.join(F.broadcast(r), "v")
        .groupBy("grp")
        .agg(
            F.sum("m").cast("long").alias("n"),
            F.sum(F.col("m") * F.col("ar2")).cast("long").alias("rank_sum_x2"),
        )
    )
    t = sv.agg(F.sum("m").cast("long").alias("n_total"))
    return g.crossJoin(F.broadcast(t)).select(
        "grp",
        "n",
        "rank_sum_x2",
        F.expr("CAST((1000 * rank_sum_x2) div (2 * n) AS BIGINT)").alias(
            "mean_rank_milli"
        ),
        F.expr("CAST(500 * (n_total + 1) AS BIGINT)").alias("expected_milli"),
        F.expr(
            "CAST((1000 * rank_sum_x2) div (2 * n) - 500 * (n_total + 1)"
            " AS BIGINT)"
        ).alias("dev_milli"),
    )


# -- McNemar's paired test (integer-exact) ------------------------------------


@register(
    "stats_mcnemar_test",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view'
                         AND EXTRACT(DAY FROM ts) <= 15 THEN 1 ELSE 0 END) AS x,
               MAX(CASE WHEN event_type = 'view'
                         AND EXTRACT(DAY FROM ts) > 15 THEN 1 ELSE 0 END)  AS y
        FROM events GROUP BY user_id
    ), t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b_disc,
               CAST(SUM(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_disc
        FROM u
    )
    SELECT n_users, b_disc, c_disc,
           CAST((1000000 * (b_disc - c_disc) * (b_disc - c_disc))
                // NULLIF(b_disc + c_disc, 0) AS BIGINT) AS chi2_ppm
    FROM t
    """,
)
def mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for paired binary outcomes — did each user view in the
    first half of the month vs the second half? Only the DISCORDANT pairs
    carry signal: b = (yes, no), c = (no, yes), χ² = (b−c)²/(b+c). The
    whole statistic is one integer rational, reported in exact ppm — no
    float exists anywhere (same discipline as stats_welch_t2).

    Shape: one scan → per-user partial+final MAX aggregate (pairing is a
    groupBy, never a self-join) → one 1-row count aggregate. At 100 TB the
    per-user relation shuffles once on user_id and the final row is a
    map-side-combined count — nothing grows with events except the first
    scan."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "view") & (F.dayofmonth("ts") <= 15), 1
            ).otherwise(0)
        ).alias("x"),
        F.max(
            F.when(
                (F.col("event_type") == "view") & (F.dayofmonth("ts") > 15), 1
            ).otherwise(0)
        ).alias("y"),
    )
    t = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when((F.col("x") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b_disc"),
        F.sum(F.when((F.col("x") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c_disc"),
    )
    return t.select(
        "n_users",
        "b_disc",
        "c_disc",
        F.expr(
            "CAST((1000000 * (b_disc - c_disc) * (b_disc - c_disc))"
            " div NULLIF(b_disc + c_disc, 0) AS BIGINT)"
        ).alias("chi2_ppm"),
    )


# -- one-way ANOVA (fixed-order IEEE over exact integer moments) --------------

#: the five event types, pinned in a FIXED order: the F statistic is computed
#: by one literal arithmetic expression over per-type exact integer moments,
#: so both engines execute the identical IEEE operation sequence — the only
#: way a k-group sum of double terms can be order-free across engines.
_ANOVA_TYPES = ("click", "error", "purchase", "signup", "view")


def _anova_f_sql() -> str:
    """The shared Spark/DuckDB arithmetic over columns n1..n5, s1..s5, q:
    SSB = Σ s_g²/n_g − S²/N, SSW = Q − Σ s_g²/n_g, F = (SSB/(k−1))/(SSW/(N−k)).
    Every operand is CAST to DOUBLE first (the exact integer moments), and
    the expression text is byte-identical on both sides."""
    sg = " + ".join(
        f"(CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE) / CAST(n{i} AS DOUBLE))"
        for i in range(1, 6)
    )
    s = " + ".join(f"CAST(s{i} AS DOUBLE)" for i in range(1, 6))
    n = " + ".join(f"CAST(n{i} AS DOUBLE)" for i in range(1, 6))
    return (
        f"ROUND((((({sg}) - ({s}) * ({s}) / ({n})) / 4.0)"
        f" / ((CAST(q AS DOUBLE) - ({sg})) / (({n}) - 5.0))), 6)"
    )


@register(
    "stats_anova_oneway",
    oracle=f"""
    WITH m AS (
        SELECT
          {", ".join(
            f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n{i+1}, "
            f"CAST(SUM(CASE WHEN event_type = '{t}' THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS s{i+1}"
            for i, t in enumerate(_ANOVA_TYPES)
          )},
          CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                   * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS q
        FROM events
    )
    SELECT (n1 + n2 + n3 + n4 + n5) AS n_total,
           {_anova_f_sql()} AS f_stat
    FROM m
    """,
)
def anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F over event values by type (k=5 groups) — the
    parametric k-sample generalization of stats_welch_t2, companion to the
    rank-based stats_kruskal_mean_ranks on the same grouping.

    Cross-engine determinism: the integer moments (per-type count, cent-sum,
    global Σv²) are exact, order-free partial+final aggregates; the final F
    is ONE literal expression over those integers with the five group terms
    written in a pinned order, so Spark and DuckDB execute the identical
    IEEE sequence — bit-equal without any integer-rational blowup (the exact
    rational form needs Π n_g ~ n⁵ digits and overflows DECIMAL(38) past
    sf0.1; the fixed-order double form scales to any n).

    Shape: one scan, one 1-row aggregate (11 sums), constant-size output."""
    ev = load_table(spark, sf_dir, "events")
    aggs = []
    for i, t in enumerate(_ANOVA_TYPES, start=1):
        aggs.append(
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"n{i}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("event_type") == t, quantize(F.col("value"), MONEY_SCALE)).otherwise(
                    F.lit(0).cast("long")
                )
            )
            .cast("long")
            .alias(f"s{i}")
        )
    v = quantize(F.col("value"), MONEY_SCALE)
    aggs.append(F.sum(v * v).cast("long").alias("q"))
    m = ev.agg(*aggs)
    return m.select(
        F.expr("n1 + n2 + n3 + n4 + n5").alias("n_total"),
        F.expr(_anova_f_sql()).alias("f_stat"),
    )


# -- Benjamini-Hochberg step-up FDR control (integer-exact) -------------------

#: deterministic pseudo p-values in ppm (Knuth multiplicative hash of the
#: hypothesis id) — the OPERATOR under test is the step-up procedure, which
#: is exactly checkable because every comparison is integer: reject rank i
#: iff i <= k* where k* = max{ i : p_(i) * m <= i * alpha_scaled }.
_BH_ALPHA_PPM = 50_000  # alpha = 0.05


@register(
    "stats_benjamini_hochberg",
    oracle=f"""
    WITH p AS (
        SELECT doc_id,
               CAST(CASE WHEN doc_id % 10 = 0
                         THEN 2501 + (doc_id * 2654435761) % 500
                         ELSE 1 + (doc_id * 2654435761) % 1000000
                    END AS BIGINT) AS p_ppm,
               (SELECT COUNT(*) FROM documents) AS m
        FROM documents
    ), r AS (
        SELECT doc_id, p_ppm, m,
               CAST(ROW_NUMBER() OVER (ORDER BY p_ppm, doc_id) AS BIGINT) AS rnk
        FROM p
    ), k AS (
        SELECT r.*,
               MAX(CASE WHEN p_ppm * m <= rnk * {_BH_ALPHA_PPM}
                        THEN rnk END) OVER () AS k_star
        FROM r
    )
    SELECT doc_id, p_ppm, rnk, k_star
    FROM k WHERE rnk <= k_star
    """,
)
def benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control at alpha=0.05 over one
    deterministic p-value per document: sort p ascending, find the LARGEST
    rank k* with p_(k*) <= k*·alpha/m, reject every hypothesis ranked <= k*
    (including ones whose own inequality fails — the step-up property naive
    per-row thresholding gets wrong). All comparisons are cross-multiplied
    integers (p_ppm·m vs rank·alpha_ppm), so the rejection set is exact.

    Shape: the ranking runs over the HYPOTHESIS relation (one row per test,
    never per observation), which is small by construction — a global sort
    of m rows plus one whole-relation MAX window. At 100 TB the p-values
    arrive from per-hypothesis aggregates; m stays in the thousands and the
    single-partition window is a deliberate, bounded choice."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.count()  # hypothesis count: bounded, one job over footers
    # a 10% planted-signal fraction clustered at 2501-3000 ppm: k* lands at
    # the top of the signal block, and the ~27 low-rank signals whose OWN
    # inequality fails (p_(i) > i*alpha/m) are rejected only via step-up —
    # a naive per-row threshold provably diverges from this oracle
    p = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            2501 + (F.col("doc_id") * F.lit(2654435761)) % F.lit(500),
        )
        .otherwise(1 + (F.col("doc_id") * F.lit(2654435761)) % F.lit(1000000))
        .cast("long")
        .alias("p_ppm"),
    )
    r = p.withColumn(
        "rnk",
        F.row_number().over(W.orderBy("p_ppm", "doc_id")).cast("long"),
    )
    k = r.withColumn(
        "k_star",
        F.max(
            F.when(
                F.col("p_ppm") * m <= F.col("rnk") * _BH_ALPHA_PPM,
                F.col("rnk"),
            )
        ).over(W.partitionBy()),
    )
    return k.filter(F.col("rnk") <= F.col("k_star")).select(
        "doc_id", "p_ppm", "rnk", "k_star"
    )


# -- Holm-Bonferroni step-down FWER control (r11 queue) --------------------------


@register(
    "stats_holm_bonferroni",
    oracle=f"""
    WITH p AS (
        SELECT doc_id,
               CAST(CASE WHEN doc_id % 10 = 5
                         THEN 1 + (doc_id * 2654435761) % 90
                         WHEN doc_id % 10 = 0
                         THEN 2501 + (doc_id * 2654435761) % 500
                         ELSE 1 + (doc_id * 2654435761) % 1000000
                    END AS BIGINT) AS p_ppm,
               (SELECT COUNT(*) FROM documents) AS m
        FROM documents
    ), r AS (
        SELECT doc_id, p_ppm, m,
               CAST(ROW_NUMBER() OVER (ORDER BY p_ppm, doc_id) AS BIGINT) AS rnk
        FROM p
    ), k AS (
        SELECT r.*,
               COALESCE(MIN(CASE WHEN p_ppm * (m - rnk + 1) > {_BH_ALPHA_PPM}
                                 THEN rnk END) OVER (),
                        m + 1) AS k_stop
        FROM r
    )
    SELECT doc_id, p_ppm, rnk, k_stop
    FROM k WHERE rnk < k_stop
    """,
)
def holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm-Bonferroni step-DOWN FWER control at alpha=0.05 over the same
    deterministic p-value generator family as stats_benjamini_hochberg,
    extended with a STRONG-signal tier (p < 100 ppm, doc_id % 10 = 5) —
    the other half of the multiple-testing shelf: walk ranks ascending,
    STOP at the first rank whose p_(k) > alpha/(m−k+1), reject everything
    strictly before it. Family-wise error is stricter than BH's FDR: Holm
    rejects only the strong tier, while BH's step-up bar would also
    absorb the marginal 2501-3000 ppm tier — the load-bearing distinction
    this query pins. All comparisons are
    cross-multiplied integers (p_ppm·(m−rank+1) vs alpha_ppm·1e6/1e6), so
    the rejection set is exact; a no-failure family rejects all m
    (k_stop = m+1).

    Shape: identical to the BH query — ranking over the HYPOTHESIS
    relation (one row per test, small by construction), one global sort
    plus one whole-relation MIN window, both deliberate and bounded."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.count()  # hypothesis count: bounded, one job over footers
    p = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 5,
            1 + (F.col("doc_id") * F.lit(2654435761)) % F.lit(90),
        )
        .when(
            F.col("doc_id") % 10 == 0,
            2501 + (F.col("doc_id") * F.lit(2654435761)) % F.lit(500),
        )
        .otherwise(1 + (F.col("doc_id") * F.lit(2654435761)) % F.lit(1000000))
        .cast("long")
        .alias("p_ppm"),
    )
    r = p.withColumn(
        "rnk",
        F.row_number().over(W.orderBy("p_ppm", "doc_id")).cast("long"),
    )
    k = r.withColumn(
        "k_stop",
        F.coalesce(
            F.min(
                F.when(
                    F.col("p_ppm") * (m - F.col("rnk") + 1) > _BH_ALPHA_PPM,
                    F.col("rnk"),
                )
            ).over(W.partitionBy()),
            F.lit(m + 1),
        ).cast("long"),
    )
    return k.filter(F.col("rnk") < F.col("k_stop")).select(
        "doc_id", "p_ppm", "rnk", "k_stop"
    )


# -- mean-excess (peaks-over-threshold) profile (r11 queue) -------------------------

_ME_THRESHOLDS = (100, 150, 200, 250)  # value units


@register(
    "stats_mean_excess_profile",
    oracle=f"""
    WITH g AS (
        SELECT UNNEST([{", ".join(str(u) for u in _ME_THRESHOLDS)}]) AS u
    )
    SELECT CAST(g.u AS BIGINT) AS u,
           CAST(SUM(CASE WHEN value > g.u THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exceed,
           CAST(SUM(CASE WHEN value > g.u
                         THEN CAST(ROUND(value * 100) AS BIGINT) - 100 * g.u
                         ELSE 0 END) AS BIGINT) AS excess_cents,
           CAST(SUM(CASE WHEN value > g.u
                         THEN CAST(ROUND(value * 100) AS BIGINT) - 100 * g.u
                         ELSE 0 END)
                // GREATEST(SUM(CASE WHEN value > g.u THEN 1 ELSE 0 END), 1)
                AS BIGINT) AS mean_excess_cents
    FROM events, g GROUP BY 1
    """,
)
def mean_excess_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-excess (peaks-over-threshold) profile — extreme-value
    theory's model-selection diagnostic, log-free: E[X − u | X > u]
    across a rising threshold grid. A generalized-Pareto tail makes this
    LINEAR in u (slope ξ/(1−ξ) reads the shape parameter); exponential
    tails go flat, bounded tails slope down — the plot risk teams draw
    before fitting any EVT model, complementing stats_tail_ratio_profile
    (tail INDEX) with tail SHAPE. Exceedance counts and cent-exact excess
    sums are pure integers; the mean is one integer division.

    Shape: a {len(_ME_THRESHOLDS)}-row broadcast grid crossed into the
    scan, one conditional groupBy over {len(_ME_THRESHOLDS)} groups — one
    pass, no sort, nothing scales but the scan."""
    ev = load_table(spark, sf_dir, "events")
    grid = spark.createDataFrame([(u,) for u in _ME_THRESHOLDS], "u long")
    exceed = F.when(F.col("value") > F.col("u"), 1).otherwise(0)
    excess = F.when(
        F.col("value") > F.col("u"),
        quantize(F.col("value"), MONEY_SCALE) - 100 * F.col("u"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        ev.crossJoin(F.broadcast(grid))
        .groupBy("u")
        .agg(
            F.sum(exceed).cast("long").alias("n_exceed"),
            F.sum(excess).cast("long").alias("excess_cents"),
        )
        .select(
            "u",
            "n_exceed",
            "excess_cents",
            F.expr("excess_cents div GREATEST(n_exceed, 1)")
            .cast("long")
            .alias("mean_excess_cents"),
        )
    )


# -- Jonckheere-Terpstra ordered-alternative test (r11 queue) -----------------------

_JT_GROUPS = 7  # ordered groups: weekday index 0..6


def _jt_pair_terms(prefix_c: str, prefix_cum: str) -> str:
    """Σ_{i<j} (2·c_j·cum_i + c_j·c_i) over the k=7 ordered groups —
    the doubled pairwise-exceedance contribution of one value row."""
    terms = []
    for i in range(_JT_GROUPS):
        for j in range(i + 1, _JT_GROUPS):
            terms.append(
                f"(2 * {prefix_c}{j} * {prefix_cum}{i}"
                f" + {prefix_c}{j} * {prefix_c}{i})"
            )
    return " + ".join(terms)


@register(
    "stats_jonckheere_terpstra",
    oracle=f"""
    WITH s AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS g,
               CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ), h AS (
        SELECT v,
               {", ".join(
                 f"CAST(SUM(CASE WHEN g = {g} THEN 1 ELSE 0 END) AS BIGINT) AS c{g}"
                 for g in range(_JT_GROUPS))}
        FROM s GROUP BY 1
    ), w AS (
        SELECT v,
               {", ".join(f"c{g}" for g in range(_JT_GROUPS))},
               {", ".join(
                 f"CAST(COALESCE(SUM(c{g}) OVER (ORDER BY v"
                 f" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
                 f" AS BIGINT) AS m{g}"
                 for g in range(_JT_GROUPS))}
        FROM h
    ), t AS (
        SELECT {", ".join(
            f"CAST(SUM(c{g}) AS BIGINT) AS n{g}" for g in range(_JT_GROUPS))}
        FROM h
    )
    SELECT ({" + ".join(f"n{g}" for g in range(_JT_GROUPS))}) AS n_total,
           CAST((SELECT SUM({_jt_pair_terms("c", "m")}) FROM w) AS BIGINT)
               AS jt_x2,
           CAST(({" + ".join(f"n{g}" for g in range(_JT_GROUPS))})
                * ({" + ".join(f"n{g}" for g in range(_JT_GROUPS))})
                - ({" + ".join(f"n{g} * n{g}" for g in range(_JT_GROUPS))})
                AS BIGINT) AS e_jt_x4
    FROM t
    """,
)
def jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative — "does
    purchase value trend monotonically across the week?" — the
    order-aware k-sample test stats_kruskal_mean_ranks (unordered
    alternatives) cannot express: JT = Σ_{{i<j}} U_ij counts pairwise
    exceedances between every earlier/later weekday pair, with ties at
    half weight. Reported doubled (jt_x2) so ties stay integer, next to
    the exact null mean ×4 (N² − Σn_g²) for the consumer's z — all
    integers, zero floats.

    Shape: the corpus collapses to the VALUE HISTOGRAM with per-group
    counts (one partial-aggregable groupBy over distinct cent values);
    the below-cumulative per group is one window pass over that domain
    (the Mann-Whitney discipline, k-column); the 21 pair terms are one
    map-side expression per histogram row. Never a pair join — work is
    O(distinct values × k²)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    s = ev.select(
        (F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")) % 7).alias(
            "g"
        ),
        quantize(F.col("value"), MONEY_SCALE).alias("v"),
    )
    h = s.groupBy("v").agg(
        *[
            F.sum(F.when(F.col("g") == g, 1).otherwise(0))
            .cast("long")
            .alias(f"c{g}")
            for g in range(_JT_GROUPS)
        ]
    )
    wv = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    w = h.select(
        "v",
        *[F.col(f"c{g}") for g in range(_JT_GROUPS)],
        *[
            F.coalesce(F.sum(f"c{g}").over(wv), F.lit(0))
            .cast("long")
            .alias(f"m{g}")
            for g in range(_JT_GROUPS)
        ],
    )
    jt = w.agg(
        F.sum(F.expr(_jt_pair_terms("c", "m"))).cast("long").alias("jt_x2")
    )
    t = h.agg(
        *[F.sum(f"c{g}").cast("long").alias(f"n{g}") for g in range(_JT_GROUPS)]
    )
    n_sum = " + ".join(f"n{g}" for g in range(_JT_GROUPS))
    n_sq = " + ".join(f"n{g} * n{g}" for g in range(_JT_GROUPS))
    return t.crossJoin(F.broadcast(jt)).select(
        F.expr(n_sum).cast("long").alias("n_total"),
        "jt_x2",
        F.expr(f"CAST(({n_sum}) * ({n_sum}) - ({n_sq}) AS BIGINT)").alias(
            "e_jt_x4"
        ),
    )


# -- rescaled-range (R/S) profile (r11 queue) --------------------------------------

_RS_WINDOWS = (8, 16, 32)  # dyadic window sizes over the daily series


@register(
    "stats_rescaled_range",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), g AS (
        SELECT UNNEST([{", ".join(str(w) for w in _RS_WINDOWS)}]) AS w
    ), seg AS (
        SELECT g.w, d.day // g.w AS seg_id, d.day, d.x
        FROM daily d, g
    ), stats AS (
        SELECT w, seg_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM seg GROUP BY 1, 2
    ), dev AS (
        -- cumulative deviation from the segment mean, scaled by n so it
        -- stays integer: D_k = n*Σ_{{i<=k}}x_i − k_count*Σx
        SELECT s.w, s.seg_id, s.n, s.sx, s.sxx,
               MAX(cum.d_scaled) - MIN(cum.d_scaled) AS range_scaled
        FROM stats s JOIN (
            SELECT w, seg_id,
                   n * SUM(x) OVER (PARTITION BY w, seg_id ORDER BY day)
                     - CAST(ROW_NUMBER() OVER (PARTITION BY w, seg_id
                                               ORDER BY day) AS BIGINT) * sxt
                       AS d_scaled
            FROM (SELECT seg.*, st.n, st.sx AS sxt FROM seg
                  JOIN stats st USING (w, seg_id))
        ) cum USING (w, seg_id)
        GROUP BY 1, 2, 3, 4, 5
    )
    SELECT CAST(w AS BIGINT) AS w,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN n * sxx - sx * sx > 0 THEN
               CAST(FLOOR(1000000.0 * (CAST(range_scaled AS DOUBLE) / CAST(n AS DOUBLE))
                    / SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                            * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                           / CAST(n AS DOUBLE))) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS rs_ppm_sum
    FROM dev WHERE n = w
    GROUP BY 1
    """,
)
def rescaled_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (R/S) profile of daily purchase revenue across
    dyadic window sizes — Hurst's long-memory diagnostic with the libm
    log-log fit REMOVED: the profile reports Σ R/S per window size in ppm
    (a consumer fits H offline; the engine's job is the exact R and S).
    R is the spread of cumulative deviations from the segment mean, kept
    INTEGER by scaling with n (D_k·n = n·ΣX_{{≤k}} − k·ΣX); S is the
    population-σ from exact moments via one pinned IEEE expression per
    segment, floor-quantized to ppm BEFORE the cross-segment sum (order-free).
    Ragged tail segments (n < w) are excluded so every segment's R/S is
    comparable.

    Shape: the corpus collapses to the daily relation; the window grid
    explodes it |grid|× (3 rows per day); per-segment moments are one
    partial-aggregable rollup and the cumulative-deviation window is
    partitioned per (w, segment) — nothing global, nothing pairwise."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01"))
            .cast("long")
            .alias("day")
        )
        .agg(F.sum(quantize(F.col("value"), MONEY_SCALE)).cast("long").alias("x"))
    )
    grid = spark.createDataFrame([(w,) for w in _RS_WINDOWS], "w long")
    seg = daily.crossJoin(F.broadcast(grid)).withColumn(
        "seg_id", F.expr("day div w")
    )
    stats = seg.groupBy("w", "seg_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    wseg = W.partitionBy("w", "seg_id").orderBy("day")
    cum = (
        seg.join(stats.select("w", "seg_id", "n", F.col("sx").alias("sxt")),
                 ["w", "seg_id"])
        .withColumn(
            "d_scaled",
            F.col("n") * F.sum("x").over(wseg)
            - F.row_number().over(wseg).cast("long") * F.col("sxt"),
        )
        .groupBy("w", "seg_id")
        .agg(
            (F.max("d_scaled") - F.min("d_scaled")).alias("range_scaled")
        )
    )
    dev = stats.join(cum, ["w", "seg_id"])
    rs = F.expr(
        "CASE WHEN n * sxx - sx * sx > 0 THEN"
        " CAST(FLOOR(1000000.0 * (CAST(range_scaled AS DOUBLE) / CAST(n AS DOUBLE))"
        " / SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)"
        " * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
        " / CAST(n AS DOUBLE))) AS BIGINT)"
        " ELSE 0 END"
    )
    return (
        dev.filter(F.col("n") == F.col("w"))
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum(rs).cast("long").alias("rs_ppm_sum"),
        )
    )


# -- delta-method CI for a ratio metric (r11 queue) -------------------------------


def _ratio_ci_sql() -> str:
    """Shared arithmetic over (n, sx, sy, sxx, syy, sxy): R = Σy/Σx and
    the delta-method standard error
    se = sqrt((Syy − 2R·Sxy + R²·Sxx) / n) / x̄ with S the sample
    (co)variances — one pinned-order IEEE expression per output."""

    def d(x: str) -> str:
        return f"CAST({x} AS DOUBLE)"

    n, sx, sy = d("n"), d("sx"), d("sy")
    r = f"({sy} / {sx})"
    # sample covariance building blocks: S_ab = (Σab − ΣaΣb/n)/(n−1)
    syy = f"(({d('syy')} - {sy} * {sy} / {n}) / ({n} - 1.0))"
    sxx = f"(({d('sxx')} - {sx} * {sx} / {n}) / ({n} - 1.0))"
    sxy = f"(({d('sxy')} - {sx} * {sy} / {n}) / ({n} - 1.0))"
    xbar = f"({sx} / {n})"
    se = (
        f"(SQRT((({syy}) - 2.0 * {r} * ({sxy}) + {r} * {r} * ({sxx}))"
        f" / {n}) / {xbar})"
    )
    return [
        f"ROUND({r}, 6) AS ratio",
        f"ROUND({se}, 6) AS se",
        f"ROUND({r} - 1.96 * {se}, 6) AS ci_lo",
        f"ROUND({r} + 1.96 * {se}, 6) AS ci_hi",
    ]


@register(
    "stats_ratio_metric_delta_ci",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS cohort,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(ROUND(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ), m AS (
        SELECT cohort,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM u GROUP BY 1
    )
    SELECT cohort, n, sx, sy, {", ".join(_ratio_ci_sql())}
    FROM m
    """,
)
def ratio_metric_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (revenue per
    event, per cohort) — the experimentation-platform workhorse: a ratio
    of sums is NOT a mean of independent units, so a naive t-interval on
    per-event values is wrong; the delta method linearizes R = Σy/Σx
    around the user-level (x, y) moments and the interval comes out of
    six exact integer sums (Deng et al. '18 is the standard A/B
    treatment). Per-user aggregation is the variance-correct unit of
    analysis — the same reason stats_ab_ttest clusters by user.

    Determinism: moments are exact order-free integer aggregates; ratio,
    se and the ±1.96 bounds are single pinned-order IEEE expressions
    (sqrt/div correctly rounded — the anova discipline).

    Shape: one scan → per-user conditional rollup (partial-aggregable,
    user-keyed, no skew) → 2-group moment rollup → constant output."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy(
        "user_id",
        F.when(F.col("user_id") % 2 == 0, "even")
        .otherwise("odd")
        .alias("cohort"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                quantize(F.col("value"), MONEY_SCALE),
            ).otherwise(F.lit(0).cast("long"))
        )
        .cast("long")
        .alias("y"),
    )
    m = u.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    return m.selectExpr("cohort", "n", "sx", "sy", *_ratio_ci_sql())


# -- Cochran-Mantel-Haenszel stratified 2x2 test (r11 queue) ---------------------

_CMH_STRATA = 7  # day-of-week strata


def _cmh_sql() -> str:
    """Shared Spark/DuckDB arithmetic over n1_s,k1_s,n2_s,k2_s (exact
    integer moments, s in 0..6): CMH = (Σ(k1_s − n1_s·K_s/N_s))² /
    Σ(n1_s·n2_s·K_s·(N_s−K_s) / (N_s²·(N_s−1))), strata in pinned order —
    the same fixed-order IEEE discipline as stats_anova_oneway."""

    def d(x: str) -> str:
        return f"CAST({x} AS DOUBLE)"

    devs, vars_ = [], []
    for s in range(_CMH_STRATA):
        n1, k1, n2, k2 = f"n1_{s}", f"k1_{s}", f"n2_{s}", f"k2_{s}"
        ns = f"({d(n1)} + {d(n2)})"
        ks = f"({d(k1)} + {d(k2)})"
        devs.append(f"({d(k1)} - {d(n1)} * {ks} / {ns})")
        vars_.append(
            f"({d(n1)} * {d(n2)} * {ks} * ({ns} - {ks})"
            f" / ({ns} * {ns} * ({ns} - 1.0)))"
        )
    dev = " + ".join(devs)
    var = " + ".join(vars_)
    return f"ROUND((({dev}) * ({dev})) / ({var}), 6)"


@register(
    "stats_cmh_stratified",
    oracle=f"""
    WITH s AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
                   AS stratum,
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS grp1,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS success
        FROM events
    ), m AS (
        SELECT
          {", ".join(
            f"CAST(SUM(CASE WHEN stratum = {s} AND grp1 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_{s}, "
            f"CAST(SUM(CASE WHEN stratum = {s} AND grp1 = 1 THEN success ELSE 0 END) AS BIGINT) AS k1_{s}, "
            f"CAST(SUM(CASE WHEN stratum = {s} AND grp1 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2_{s}, "
            f"CAST(SUM(CASE WHEN stratum = {s} AND grp1 = 0 THEN success ELSE 0 END) AS BIGINT) AS k2_{s}"
            for s in range(_CMH_STRATA)
          )}
        FROM s
    )
    SELECT ({" + ".join(f"n1_{s} + n2_{s}" for s in range(_CMH_STRATA))})
               AS n_total,
           {{CMH}} AS cmh_stat
    FROM m
    """.replace("{CMH}", _cmh_sql()),
)
def cmh_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel test of the cohort→purchase association
    ACROSS day-of-week strata — the stratified 2×2 method that answers
    "is the conversion lift real once you control for the day mix?",
    closing the Simpson's-paradox hole a pooled two-proportion z-test
    (stats_ztest_two_proportions) leaves open. Strata are the 7 weekdays
    (day offset mod 7, engine-neutral); each contributes its exact
    2×2 integer moments, and the statistic is ONE fixed-order IEEE
    expression over the 28 integers (same determinism discipline as
    stats_anova_oneway — the exact rational form would carry Π N_s²
    denominators far past DECIMAL(38)).

    Shape: one scan, one 1-row conditional aggregate (28 sums, all
    partial-aggregable), constant output."""
    ev = load_table(spark, sf_dir, "events")
    stratum = (
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")) % 7
    ).alias("stratum")
    s = ev.select(
        stratum,
        F.when(F.col("user_id") % 2 == 0, 1).otherwise(0).alias("grp1"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "success"
        ),
    )
    aggs = []
    for st in range(_CMH_STRATA):
        in_s = F.col("stratum") == st
        aggs.append(
            F.sum(F.when(in_s & (F.col("grp1") == 1), 1).otherwise(0))
            .cast("long")
            .alias(f"n1_{st}")
        )
        aggs.append(
            F.sum(
                F.when(in_s & (F.col("grp1") == 1), F.col("success")).otherwise(0)
            )
            .cast("long")
            .alias(f"k1_{st}")
        )
        aggs.append(
            F.sum(F.when(in_s & (F.col("grp1") == 0), 1).otherwise(0))
            .cast("long")
            .alias(f"n2_{st}")
        )
        aggs.append(
            F.sum(
                F.when(in_s & (F.col("grp1") == 0), F.col("success")).otherwise(0)
            )
            .cast("long")
            .alias(f"k2_{st}")
        )
    m = s.agg(*aggs)
    n_total = " + ".join(f"n1_{st} + n2_{st}" for st in range(_CMH_STRATA))
    return m.select(
        F.expr(n_total).alias("n_total"),
        F.expr(_cmh_sql()).alias("cmh_stat"),
    )


# -- Hellinger distance between two behavioural distributions ------------------


@register(
    "stats_hellinger_distance",
    oracle="""
    WITH c AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c2
        FROM events GROUP BY 1
    ),
    t AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS t1, CAST(SUM(c2) AS BIGINT) AS t2
        FROM c
    ),
    terms AS (
        SELECT event_type, c1, c2,
               CAST(FLOOR(1000000 * SQRT(
                        CAST(c1 * c2 AS DOUBLE) / CAST(t1 * t2 AS DOUBLE)))
                    AS BIGINT) AS term_ppm
        FROM c, t
    )
    SELECT event_type, c1, c2, term_ppm,
           CAST(SUM(term_ppm) OVER () AS BIGINT) AS bc_ppm,
           CAST(1000000 - SUM(term_ppm) OVER () AS BIGINT) AS h2_ppm
    FROM terms
    """,
)
def hellinger_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hellinger distance between the event-type distributions of two user
    cohorts (even vs odd user ids) — the bounded, symmetric
    distribution-shift metric that completes the drift shelf beside total
    variation (profile_drift_tvd) and the KS statistic: H² = 1 − Σ√(p·q),
    reported as the Bhattacharyya coefficient and H² in ppm, with the
    per-type √(p·q) term riding along.

    Determinism: ln is libm-dependent (banned house-wide), but IEEE 754
    REQUIRES correctly-rounded sqrt, division and multiplication — so the
    fixed expression floor(1e6·sqrt((c1·c2)/(t1·t2))) over exact integer
    counts is bit-identical on both engines, and each term is quantized
    to an integer BEFORE the cross-term sum, making the total immune to
    summation order. Counts stay under 2⁵³ (exact as doubles) through
    sf1000.

    Shape: one partial-aggregable conditional groupBy over the scan (the
    two cohorts share it — no second pass), a 1-row total broadcast, and
    an O(|types|) window. Nothing scales with anything but the scan.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    t = c.agg(
        F.sum("c1").cast("long").alias("t1"),
        F.sum("c2").cast("long").alias("t2"),
    )
    terms = c.crossJoin(F.broadcast(t)).select(
        "event_type",
        "c1",
        "c2",
        F.expr(
            "CAST(FLOOR(1000000 * SQRT("
            " CAST(c1 * c2 AS DOUBLE) / CAST(t1 * t2 AS DOUBLE)))"
            " AS BIGINT)"
        ).alias("term_ppm"),
    )
    w = W.partitionBy()
    return terms.select(
        "event_type",
        "c1",
        "c2",
        "term_ppm",
        F.sum("term_ppm").over(w).cast("long").alias("bc_ppm"),
        (F.lit(1000000) - F.sum("term_ppm").over(w)).cast("long").alias("h2_ppm"),
    )


# -- Cohen's d effect size (r11 queue) -----------------------------------------


def _cohens_d_sql() -> str:
    """Shared Spark/DuckDB arithmetic over n1,s1,q1,n2,s2,q2 (exact integer
    moments): d = (m1−m2)/s_pooled, one byte-identical fixed-order IEEE
    expression (same discipline as stats_anova_oneway)."""
    ssw = (
        "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
        " / CAST(n1 AS DOUBLE))"
        " + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)"
        " / CAST(n2 AS DOUBLE)))"
    )
    return (
        "ROUND(((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
        " - (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))"
        f" / SQRT({ssw}"
        " / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)), 6)"
    )


@register(
    "stats_cohens_d",
    oracle=f"""
    WITH m AS (
        SELECT
          CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          CAST(SUM(CASE WHEN user_id % 2 = 0
                        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS s1,
          CAST(SUM(CASE WHEN user_id % 2 = 0
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                             * CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS q1,
          CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
          CAST(SUM(CASE WHEN user_id % 2 = 1
                        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS s2,
          CAST(SUM(CASE WHEN user_id % 2 = 1
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                             * CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS q2
        FROM events WHERE event_type = 'purchase'
    )
    SELECT n1, n2, {_cohens_d_sql()} AS cohens_d
    FROM m
    """,
)
def cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d effect size between the purchase-value distributions of
    the two user cohorts (even vs odd ids) — the standardized mean
    difference that turns stats_ab_ttest's significance into MAGNITUDE
    (the number a power analysis or an experiment readout actually
    reports).

    Determinism: the six moments (per-cohort count, cent-sum, cent-Σv²)
    are exact order-free integers; d is ONE literal expression over them
    with every operand cast to double in a pinned order — IEEE sqrt and
    division are correctly rounded, so both engines produce the identical
    double (same discipline as stats_anova_oneway).

    Shape: one scan, one 1-row conditional aggregate, constant output."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    v = quantize(F.col("value"), MONEY_SCALE)
    even = F.col("user_id") % 2 == 0
    m = ev.agg(
        F.sum(F.when(even, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(even, v).otherwise(F.lit(0).cast("long")))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(even, v * v).otherwise(F.lit(0).cast("long")))
        .cast("long")
        .alias("q1"),
        F.sum(F.when(~even, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(~even, v).otherwise(F.lit(0).cast("long")))
        .cast("long")
        .alias("s2"),
        F.sum(F.when(~even, v * v).otherwise(F.lit(0).cast("long")))
        .cast("long")
        .alias("q2"),
    )
    return m.select("n1", "n2", F.expr(_cohens_d_sql()).alias("cohens_d"))


# -- two-proportion z-test (r11 queue) ------------------------------------------


@register(
    "stats_ztest_two_proportions",
    oracle="""
    WITH m AS (
        SELECT
          CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
          CAST(SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS HUGEINT) AS k1,
          CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n2,
          CAST(SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS HUGEINT) AS k2
        FROM events
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(k1 AS BIGINT) AS k1,
           CAST(n2 AS BIGINT) AS n2, CAST(k2 AS BIGINT) AS k2,
           CAST((1000000 * (k1 * n2 - k2 * n1) * (k1 * n2 - k2 * n1)
                 * (n1 + n2))
                // (n1 * n2 * (k1 + k2) * (n1 + n2 - k1 - k2))
                AS BIGINT) AS z2_ppm
    FROM m
    """,
)
def ztest_two_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test between the purchase RATES of the two
    user cohorts — the conversion-rate A/B readout (stats_ab_ttest compares
    means; this compares binomial proportions). Reported as z² in exact
    integer ppm: the whole statistic collapses to ONE rational,
    z² = (k1·n2 − k2·n1)²·N / (n1·n2·K·(N−K)), cross-multiplied so no
    float ever exists — the intermediate products exceed 2⁶³ at sf0.1, so
    both engines compute in their exact wide-integer type (DECIMAL(38) /
    HUGEINT) and integer-divide down to a BIGINT ppm.

    Shape: one scan, one 1-row conditional aggregate, constant output."""
    ev = load_table(spark, sf_dir, "events")
    even = F.col("user_id") % 2 == 0
    is_p = F.col("event_type") == "purchase"
    m = ev.agg(
        F.sum(F.when(even, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("n1"),
        F.sum(F.when(even & is_p, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("k1"),
        F.sum(F.when(~even, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("n2"),
        F.sum(F.when(~even & is_p, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("k2"),
    )
    return m.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("k1").cast("long").alias("k1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("k2").cast("long").alias("k2"),
        F.expr(
            "CAST((1000000 * (k1 * n2 - k2 * n1) * (k1 * n2 - k2 * n1)"
            " * (n1 + n2))"
            " div (n1 * n2 * (k1 + k2) * (n1 + n2 - k1 - k2))"
            " AS BIGINT)"
        ).alias("z2_ppm"),
    )


# -- heavy-tail ratio profile (r11 queue) ---------------------------------------

_TAIL_THRESHOLDS = (10, 20, 40, 80)


@register(
    "stats_tail_ratio_profile",
    oracle=f"""
    WITH g AS (
        SELECT UNNEST([{", ".join(str(t) for t in _TAIL_THRESHOLDS)}]) AS x
    )
    SELECT CAST(g.x AS BIGINT) AS x,
           CAST(SUM(CASE WHEN value > g.x THEN 1 ELSE 0 END) AS BIGINT)
               AS n_gt_x,
           CAST(SUM(CASE WHEN value > 2 * g.x THEN 1 ELSE 0 END) AS BIGINT)
               AS n_gt_2x,
           CAST((1000000 * SUM(CASE WHEN value > 2 * g.x THEN 1 ELSE 0 END))
                // SUM(CASE WHEN value > g.x THEN 1 ELSE 0 END)
                AS BIGINT) AS tail_ratio_ppm
    FROM events, g GROUP BY 1
    """,
)
def tail_ratio_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-free heavy-tail diagnostic: P(X > 2x)/P(X > x) across a doubling
    threshold grid — for a Pareto(α) tail this ratio is the constant 2^−α,
    so the profile reads the tail index directly without the libm-banned
    log-log regression (Hill estimator) and flags where the power-law
    regime starts (ratios stabilizing across the grid). Exact integer
    counts, ratio in integer ppm.

    Shape: the grid is a {len(_TAIL_THRESHOLDS)}-row broadcast crossed into
    the scan (each event evaluates {len(_TAIL_THRESHOLDS)} comparisons
    map-side), then one partial-aggregable groupBy over
    {len(_TAIL_THRESHOLDS)} groups. One pass, no sort, nothing scales with
    anything but the scan."""
    ev = load_table(spark, sf_dir, "events")
    grid = spark.createDataFrame(
        [(t,) for t in _TAIL_THRESHOLDS], "x long"
    )
    return (
        ev.crossJoin(F.broadcast(grid))
        .groupBy("x")
        .agg(
            F.sum(F.when(F.col("value") > F.col("x"), 1).otherwise(0))
            .cast("long")
            .alias("n_gt_x"),
            F.sum(F.when(F.col("value") > 2 * F.col("x"), 1).otherwise(0))
            .cast("long")
            .alias("n_gt_2x"),
        )
        .select(
            "x",
            "n_gt_x",
            "n_gt_2x",
            F.expr("(1000000 * n_gt_2x) div n_gt_x").alias("tail_ratio_ppm"),
        )
    )


# -- Brown-Forsythe variance homogeneity (r11 queue) ----------------------------


@register(
    "stats_brown_forsythe",
    oracle=f"""
    WITH s AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v FROM events
    ), ranked AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM s
    ), med AS (
        SELECT event_type, v AS med FROM ranked WHERE rk = (n + 1) // 2
    ), z AS (
        SELECT s.event_type, ABS(s.v - med.med) AS z
        FROM s JOIN med USING (event_type)
    ), m AS (
        SELECT
          {", ".join(
            f"CAST(SUM(CASE WHEN event_type = '{{t}}' THEN 1 ELSE 0 END) AS BIGINT) AS n{{i}}, "
            f"CAST(SUM(CASE WHEN event_type = '{{t}}' THEN z ELSE 0 END) AS BIGINT) AS s{{i}}"
            .format(t=t, i=i + 1)
            for i, t in enumerate(_ANOVA_TYPES)
          )},
          CAST(SUM(z * z) AS BIGINT) AS q
        FROM z
    )
    SELECT (n1 + n2 + n3 + n4 + n5) AS n_total,
           {{F_SQL}} AS f_stat
    FROM m
    """.replace("{F_SQL}", _anova_f_sql()),
)
def brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test across the k=5 event
    types: one-way ANOVA on the absolute deviations from each group's
    MEDIAN — the robust Levene variant that checks the equal-variance
    assumption stats_anova_oneway itself rests on. The location estimate
    is the exact lower median (rank ⌈n/2⌉), so every deviation is an
    exact integer and the only float is the final fixed-order F
    expression shared verbatim with the ANOVA (identical IEEE sequence on
    both engines).

    Shape: per-group medians come from the same histogram-offset rank
    discipline as agg_grouped_median (no per-group sort of raw rows); the
    5-row median relation broadcasts back onto the scan for the deviation
    map, then one 1-row conditional aggregate — two passes total, both
    partial-aggregable."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "event_type", quantize(F.col("value"), MONEY_SCALE).alias("v")
    )
    b = s.withColumn("_b", F.expr(f"v div {_MW_BUCKET}"))
    off = bucket_offsets(b, "_b", {"c": F.lit(1)}, partition_by=["event_type"])
    tot = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    w_loc = W.partitionBy("event_type", "_b").orderBy("v")
    med = (
        b.join(F.broadcast(off), ["event_type", "_b"])
        .withColumn("_rk", F.col("_off_c") + F.row_number().over(w_loc))
        .join(F.broadcast(tot), "event_type")
        .filter(F.col("_rk") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("v").alias("med"))
    )
    z = s.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("v") - F.col("med")).alias("z")
    )
    aggs = []
    for i, t in enumerate(_ANOVA_TYPES, start=1):
        aggs.append(
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"n{i}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("event_type") == t, F.col("z")).otherwise(
                    F.lit(0).cast("long")
                )
            )
            .cast("long")
            .alias(f"s{i}")
        )
    aggs.append(F.sum(F.col("z") * F.col("z")).cast("long").alias("q"))
    m = z.agg(*aggs)
    return m.select(
        F.expr("n1 + n2 + n3 + n4 + n5").alias("n_total"),
        F.expr(_anova_f_sql()).alias("f_stat"),
    )


# -- seeded permutation test (r12 queue) ------------------------------------------

#: permutations; p-value resolution is 1/(B+1) = 0.5 %
_PERM_B = 199
#: Knuth multiplicative constant (shared with sampling.py's hash splits)
_PERM_KNUTH = 2654435761
#: per-permutation offset multiplier (any odd constant != KNUTH)
_PERM_STEP = 7919
#: group bit taken from the hash's MIDDLE bits: with an odd multiplier,
#: bit 0 of event_id * K is just the parity of event_id (constant across
#: permutations); div 2^20 reaches bits the multiply actually mixed.
#: Same integer sequence in both engines; only the integer-division
#: spelling differs (Spark ``div``, DuckDB ``//``) — and the hash product
#: is computed in DECIMAL(38,0)/HUGEINT (ADVICE r11): in plain BIGINT,
#: event_id above ~2^63/K ≈ 3.4e9 silently wraps in Spark but ERRORS in
#: DuckDB, a cross-engine divergence. Widened operands make the product
#: exact in both engines at any realistic id scale (~2.6e21 ≪ 10^38),
#: and at current fixture ids (< 2^63/K) the widened hash is value-
#: identical to the old BIGINT one.
_PERM_GROUP_T = (
    f"((((CAST(event_id AS {{WIDE}}) + b * {_PERM_STEP})"
    f" * {_PERM_KNUTH}) {{DIV}} 1048576) % 2)"
)
_PERM_GROUP = _PERM_GROUP_T.format(DIV="div", WIDE="DECIMAL(38,0)")
_PERM_GROUP_DUCK = _PERM_GROUP_T.format(DIV="//", WIDE="HUGEINT")


@register(
    "stats_permutation_diff_test",
    oracle=f"""
    WITH s AS (
        SELECT event_id, user_id, CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ), obs AS (
        SELECT
          CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
          CAST(SUM(CASE WHEN user_id % 2 = 0 THEN v ELSE 0 END) AS HUGEINT) AS s1,
          CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n2,
          CAST(SUM(CASE WHEN user_id % 2 = 1 THEN v ELSE 0 END) AS HUGEINT) AS s2
        FROM s
    ), perms AS (
        SELECT b,
          CAST(SUM(CASE WHEN {_PERM_GROUP_DUCK} = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n1b,
          CAST(SUM(CASE WHEN {_PERM_GROUP_DUCK} = 0 THEN v ELSE 0 END) AS HUGEINT) AS s1b,
          CAST(SUM(CASE WHEN {_PERM_GROUP_DUCK} = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n2b,
          CAST(SUM(CASE WHEN {_PERM_GROUP_DUCK} = 1 THEN v ELSE 0 END) AS HUGEINT) AS s2b
        FROM s CROSS JOIN (SELECT UNNEST(range(1, {_PERM_B} + 1)) AS b)
        GROUP BY b
    )
    SELECT CAST({_PERM_B} AS BIGINT) AS n_perms,
           CAST(SUM(CASE WHEN ABS(s1b * n2b - s2b * n1b) * (obs.n1 * obs.n2)
                          >= ABS(obs.s1 * obs.n2 - obs.s2 * obs.n1)
                             * (n1b * n2b)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           CAST((1000000 * (1 + SUM(CASE WHEN
                    ABS(s1b * n2b - s2b * n1b) * (obs.n1 * obs.n2)
                    >= ABS(obs.s1 * obs.n2 - obs.s2 * obs.n1) * (n1b * n2b)
                    THEN 1 ELSE 0 END))) // ({_PERM_B} + 1) AS BIGINT)
               AS p_value_ppm
    FROM perms CROSS JOIN obs
    """,
)
def permutation_diff_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded permutation test for the even-vs-odd cohort difference in
    purchase-value MEANS — the assumption-free companion to
    stats_ab_ttest/stats_cohens_d: under H0 the labels are exchangeable,
    so the observed |mean gap| is ranked against {_PERM_B} deterministic
    relabelings and p = (1 + #extreme) / (B + 1).

    Determinism: permutation b assigns each row via the integer hash
    (middle bits of (event_id + b·{_PERM_STEP}) · Knuth — bit 0 of an
    odd-multiplier product is just the row's parity, constant across b,
    so the group bit comes from div 2^20). BOTH the hash product and the
    mean comparison run in DECIMAL(38)/HUGEINT: the comparison's triple
    products pass 2^63 at sf0.1, and the hash would wrap-vs-error
    divergently between engines for event_id beyond ~2^63/K ≈ 3.4e9
    (ADVICE r11). The mean comparison never divides: |s1·n2 − s2·n1|
    cross-multiplied by the other side's n1·n2. No float exists anywhere.

    Shape: the filtered scan explodes x{_PERM_B} (map-only lit array), one
    partial-aggregable groupBy(b) producing a {_PERM_B}-row relation, the
    1-row observed aggregate broadcast-joined on. At 100 TB the explode is
    the cost knob: B scales the map output linearly, nothing shuffles more
    than B rows of moments."""
    s = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            quantize(F.col("value"), MONEY_SCALE).alias("v"),
        )
    )
    obs = s.agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("n1"),
        F.sum(F.when(F.col("user_id") % 2 == 0, F.col("v")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("s1"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("n2"),
        F.sum(F.when(F.col("user_id") % 2 == 1, F.col("v")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    g = F.expr(_PERM_GROUP)
    perms = (
        s.withColumn(
            "b", F.explode(F.array(*[F.lit(i) for i in range(1, _PERM_B + 1)]))
        )
        .groupBy("b")
        .agg(
            F.sum(F.when(g == 0, 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("n1b"),
            F.sum(F.when(g == 0, F.col("v")).otherwise(0))
            .cast("decimal(38,0)")
            .alias("s1b"),
            F.sum(F.when(g == 1, 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("n2b"),
            F.sum(F.when(g == 1, F.col("v")).otherwise(0))
            .cast("decimal(38,0)")
            .alias("s2b"),
        )
    )
    extreme = F.expr(
        "CASE WHEN ABS(s1b * n2b - s2b * n1b) * (n1 * n2)"
        " >= ABS(s1 * n2 - s2 * n1) * (n1b * n2b) THEN 1 ELSE 0 END"
    )
    return (
        perms.crossJoin(F.broadcast(obs))
        .agg(F.sum(extreme).cast("long").alias("_ne"))
        .select(
            F.lit(_PERM_B).cast("long").alias("n_perms"),
            F.col("_ne").alias("n_extreme"),
            F.expr(f"CAST((1000000 * (1 + _ne)) div ({_PERM_B} + 1) AS BIGINT)")
            .alias("p_value_ppm"),
        )
    )


# -- Friedman rank test (r12 queue) ------------------------------------------------

_FRIED_BLOCKS = 12  # complete blocks: user_id % 12 x the 5 event types


@register(
    "stats_friedman_test",
    oracle=f"""
    WITH cells AS (
        SELECT user_id % {_FRIED_BLOCKS} AS blk, event_type,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cv
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT blk, event_type, cv,
               CAST(2 * RANK() OVER (PARTITION BY blk ORDER BY cv)
                    + COUNT(*) OVER (PARTITION BY blk, cv) - 1 AS BIGINT)
                   AS rank2
        FROM cells
    ), coltot AS (
        SELECT event_type, CAST(SUM(rank2) AS BIGINT) AS r2j,
               CAST(COUNT(*) AS BIGINT) AS n_blocks
        FROM ranked GROUP BY 1
    ), k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM coltot)
    SELECT event_type, n_blocks, r2j,
           CAST((1000000 * (3 * (SELECT SUM(r2j * r2j) FROM coltot)
                 - 3 * n_blocks * n_blocks * k.k * (k.k + 1) * (k.k + 1)))
                // (n_blocks * k.k * (k.k + 1)) AS BIGINT) AS chi2_ppm
    FROM coltot CROSS JOIN k
    """,
)
def friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test across the k=5 event types over
    {_FRIED_BLOCKS} complete user-bucket blocks: each block ranks its
    per-type value totals, and χ²_F asks whether any treatment
    consistently out-ranks the others — the non-parametric repeated-
    measures ANOVA (pairs with stats_jonckheere_terpstra, which needs an
    ORDERED alternative; Friedman does not).

    Determinism: cell values are exact cent sums, so ranks are exact;
    ties carry the average rank kept INTEGER by doubling (2·avg =
    2·min_rank + ties − 1). With doubled column totals R2_j, χ²_F =
    [3·ΣR2_j² − 3n²k(k+1)²] / (n·k·(k+1)) — one integer rational per
    output row, ppm-floored identically in both engines. (No tie
    correction term, as with the classic statistic; the oracle computes
    the same definition.)

    Shape: one partial-aggregable groupBy to the {_FRIED_BLOCKS}x5 cell
    relation, ranks inside 12-row partitions, then a 5-row rollup — after
    the first aggregate everything is constant-size regardless of SF."""
    cells = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            (F.col("user_id") % _FRIED_BLOCKS).alias("blk"), "event_type"
        )
        .agg(F.sum(quantize(F.col("value"), MONEY_SCALE)).alias("cv"))
    )
    w_rk = W.partitionBy("blk").orderBy("cv")
    w_tie = W.partitionBy("blk", "cv")
    ranked = cells.withColumn(
        "rank2",
        (
            2 * F.rank().over(w_rk)
            + F.count(F.lit(1)).over(w_tie)
            - 1
        ).cast("long"),
    )
    coltot = ranked.groupBy("event_type").agg(
        F.sum("rank2").cast("long").alias("r2j"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
    )
    k = coltot.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("r2j") * F.col("r2j")).cast("long").alias("sum_r2j_sq"),
    )
    return coltot.crossJoin(F.broadcast(k)).select(
        "event_type",
        "n_blocks",
        "r2j",
        F.expr(
            "CAST((1000000 * (3 * sum_r2j_sq"
            " - 3 * n_blocks * n_blocks * k * (k + 1) * (k + 1)))"
            " div (n_blocks * k * (k + 1)) AS BIGINT)"
        ).alias("chi2_ppm"),
    )


# -- Cochran's Q (r12 queue) --------------------------------------------------------

_COCHRAN_BLOCKS = 16


@register(
    "stats_cochran_q",
    oracle=f"""
    WITH cells AS (
        SELECT user_id % {_COCHRAN_BLOCKS} AS blk, event_type,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), mean_cell AS (
        SELECT CAST(SUM(cnt) // ({_COCHRAN_BLOCKS} * COUNT(DISTINCT event_type))
                    AS BIGINT) AS mc
        FROM cells
    ), x AS (
        SELECT blk, event_type,
               CASE WHEN cnt > (SELECT mc FROM mean_cell) THEN 1 ELSE 0 END AS xij
        FROM cells
    ), rows_ AS (
        SELECT blk, CAST(SUM(xij) AS BIGINT) AS ri FROM x GROUP BY 1
    ), cols AS (
        SELECT event_type, CAST(SUM(xij) AS BIGINT) AS cj FROM x GROUP BY 1
    ), m AS (
        SELECT (SELECT COUNT(*) FROM cols) AS k,
               (SELECT SUM(cj) FROM cols) AS n_tot,
               (SELECT SUM(cj * cj) FROM cols) AS sum_cj_sq,
               (SELECT SUM(ri) FROM rows_) AS sum_ri,
               (SELECT SUM(ri * ri) FROM rows_) AS sum_ri_sq
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(n_tot AS BIGINT) AS n_successes,
           CAST(CASE WHEN k * sum_ri = sum_ri_sq THEN 0
                     ELSE (1000000 * (k - 1) * (k * sum_cj_sq - n_tot * n_tot))
                          // (k * sum_ri - sum_ri_sq) END
                AS BIGINT) AS q_ppm
    FROM m
    """,
)
def cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over a {_COCHRAN_BLOCKS}x5 binary design: block i
    "succeeds" on treatment j iff its event count for type j exceeds the
    global mean cell count — did any event type light up across user
    buckets more consistently than chance? Q = (k−1)[kΣC_j² − N²] /
    [kΣR_i − ΣR_i²], the k>2 generalization of McNemar (stats_mcnemar
    is the k=2 special case; Friedman generalizes further to ordinal).

    Determinism: cell counts, the floored mean-cell threshold, and both
    marginal sums are exact integers; Q is one integer rational floored
    to ppm identically in both engines. The denominator kΣR_i − ΣR_i² is
    zero exactly when every block row is all-0 or all-1 (all R_i in
    {0, k} — where the numerator is also identically 0), and Spark
    ``div`` returns NULL there while DuckDB ``//`` RAISES; both engines
    CASE the degenerate design to Q = 0 (ADVICE r11, mirroring the
    ml_scalar_quantization_error constant-dimension guard).

    Shape: one partial-aggregable groupBy to the 80-cell relation; every
    later step is constant-size. The binarization threshold is a 1-row
    broadcast."""
    cells = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            (F.col("user_id") % _COCHRAN_BLOCKS).alias("blk"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    mc = cells.agg(
        F.expr(
            f"CAST(SUM(cnt) div ({_COCHRAN_BLOCKS}"
            " * COUNT(DISTINCT event_type)) AS BIGINT)"
        ).alias("mc")
    )
    x = cells.crossJoin(F.broadcast(mc)).select(
        "blk",
        "event_type",
        F.when(F.col("cnt") > F.col("mc"), 1).otherwise(0).alias("xij"),
    )
    rows_ = x.groupBy("blk").agg(F.sum("xij").cast("long").alias("ri"))
    cols = x.groupBy("event_type").agg(F.sum("xij").cast("long").alias("cj"))
    m = cols.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("cj").cast("long").alias("n_tot"),
        F.sum(F.col("cj") * F.col("cj")).cast("long").alias("sum_cj_sq"),
    ).crossJoin(
        F.broadcast(
            rows_.agg(
                F.sum("ri").cast("long").alias("sum_ri"),
                F.sum(F.col("ri") * F.col("ri")).cast("long").alias("sum_ri_sq"),
            )
        )
    )
    return m.select(
        "k",
        F.col("n_tot").alias("n_successes"),
        F.expr(
            "CAST(CASE WHEN k * sum_ri = sum_ri_sq THEN 0"
            " ELSE (1000000 * (k - 1) * (k * sum_cj_sq - n_tot * n_tot))"
            " div (k * sum_ri - sum_ri_sq) END AS BIGINT)"
        ).alias("q_ppm"),
    )


# -- event-study leads/lags (r12 queue) ----------------------------------------------

_ES_T0 = "2024-01-16"  # treatment date (fixture events span 2024-01)
_ES_WEEKS = 2  # periods -2..+1 around T0 (7-day windows)


@register(
    "stats_event_study_leads_lags",
    oracle=f"""
    WITH s AS (
        SELECT CAST(((date_diff('day', DATE '{_ES_T0}', CAST(ts AS DATE))
                      + {_ES_WEEKS * 7}) // 7) - {_ES_WEEKS} AS BIGINT)
                   AS period,
               user_id % 2 = 0 AS treated,
               CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events
        WHERE event_type = 'purchase'
          AND CAST(ts AS DATE) >= DATE '{_ES_T0}' - INTERVAL {_ES_WEEKS * 7} DAY
          AND CAST(ts AS DATE) <  DATE '{_ES_T0}' + INTERVAL {_ES_WEEKS * 7} DAY
    ), m AS (
        SELECT period,
          CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
          CAST(SUM(CASE WHEN treated THEN v ELSE 0 END) AS BIGINT) AS s_t,
          CAST(SUM(CASE WHEN treated THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
          CAST(SUM(CASE WHEN treated THEN 0 ELSE v END) AS BIGINT) AS s_c
        FROM s GROUP BY 1
    )
    SELECT period, n_t, n_c,
           CAST(CASE WHEN s_t * n_c - s_c * n_t >= 0
                THEN (1000 * (s_t * n_c - s_c * n_t)) // (n_t * n_c)
                ELSE -((1000 * (s_c * n_t - s_t * n_c)) // (n_t * n_c))
                END AS BIGINT) AS gap_millicents
    FROM m
    """,
)
def event_study_leads_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study leads and lags around a treatment date: the
    treated-vs-control purchase-value gap per 7-day relative period
    (k = −{_ES_WEEKS}..{_ES_WEEKS}−1) — the parallel-trends DIAGNOSTIC
    under stats_diff_in_diff's single number (pre-period gaps ≈ constant
    is the identifying assumption; a sloping lead is the red flag every
    referee looks for first).

    Determinism: the relative period is pure nonnegative integer
    division ((dd + {_ES_WEEKS}·7) div 7 − {_ES_WEEKS}, so truncation
    and floor agree); the per-period gap is one cross-multiplied integer
    rational with the SIGN-SPLIT division device: both engines' integer
    division truncates toward zero (measured r11: DuckDB (-5)//2 = -2,
    same as Spark div), but running the division on the absolute value
    with the sign re-applied makes the result floor-free AND
    truncation-free — well-defined regardless of either engine's
    convention, which is the robust form for a negative numerator.

    Shape: one pruned scan (date predicate pushes to parquet), one
    partial-aggregable groupBy to 2·{_ES_WEEKS} period rows; constant
    beyond the scan."""
    lo = F.expr(f"DATE'{_ES_T0}' - INTERVAL {_ES_WEEKS * 7} DAY")
    hi = F.expr(f"DATE'{_ES_T0}' + INTERVAL {_ES_WEEKS * 7} DAY")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .filter((F.col("ts").cast("date") >= lo) & (F.col("ts").cast("date") < hi))
        .select(
            F.expr(
                f"CAST(((datediff(CAST(ts AS DATE), DATE'{_ES_T0}')"
                f" + {_ES_WEEKS * 7}) div 7) - {_ES_WEEKS} AS BIGINT)"
            ).alias("period"),
            (F.col("user_id") % 2 == 0).alias("treated"),
            quantize(F.col("value"), MONEY_SCALE).alias("v"),
        )
    )
    m = ev.groupBy("period").agg(
        F.sum(F.when(F.col("treated"), 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
        F.sum(F.when(F.col("treated"), F.col("v")).otherwise(F.lit(0)))
        .cast("long")
        .alias("s_t"),
        F.sum(F.when(F.col("treated"), 0).otherwise(1))
        .cast("long")
        .alias("n_c"),
        F.sum(F.when(F.col("treated"), F.lit(0)).otherwise(F.col("v")))
        .cast("long")
        .alias("s_c"),
    )
    return m.select(
        "period",
        "n_t",
        "n_c",
        F.expr(
            "CAST(CASE WHEN s_t * n_c - s_c * n_t >= 0"
            " THEN (1000 * (s_t * n_c - s_c * n_t)) div (n_t * n_c)"
            " ELSE -((1000 * (s_c * n_t - s_t * n_c)) div (n_t * n_c))"
            " END AS BIGINT)"
        ).alias("gap_millicents"),
    )



# -- distribution-free median CI (r12 queue) ---------------------------------------------

#: z_{alpha/2} for the 95% order-statistic interval
_MCI_Z = 1.96


@register(
    "stats_median_ci_distribution_free",
    oracle=f"""
    WITH s AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ), hist AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY 1
    ), cum AS (
        SELECT v, c,
               SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cc,
               SUM(c) OVER () AS n
        FROM hist
    ), ranks AS (
        SELECT n,
               CAST(FLOOR((CAST(n AS DOUBLE)
                    - {_MCI_Z!r} * sqrt(CAST(n AS DOUBLE))) / 2.0)
                    AS BIGINT) AS lo_rank,
               n + 1 - CAST(FLOOR((CAST(n AS DOUBLE)
                    - {_MCI_Z!r} * sqrt(CAST(n AS DOUBLE))) / 2.0)
                    AS BIGINT) AS hi_rank,
               (n + 1) // 2 AS med_rank
        FROM (SELECT MAX(n) AS n FROM cum)
    )
    SELECT CAST(r.n AS BIGINT) AS n,
           CAST(r.lo_rank AS BIGINT) AS lo_rank,
           CAST(r.hi_rank AS BIGINT) AS hi_rank,
           CAST(MIN(CASE WHEN cum.cc >= r.med_rank THEN cum.v END)
                AS BIGINT) AS median_cents,
           CAST(MIN(CASE WHEN cum.cc >= r.lo_rank THEN cum.v END)
                AS BIGINT) AS ci_lo_cents,
           CAST(MIN(CASE WHEN cum.cc >= r.hi_rank THEN cum.v END)
                AS BIGINT) AS ci_hi_cents
    FROM cum CROSS JOIN ranks r
    GROUP BY 1, 2, 3
    """,
)
def median_ci_distribution_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95 % confidence interval for the median of
    purchase values — the order-statistic interval (ranks
    (n ± z·√n)/2, the binomial sign-count bound) that needs NO normality
    or bootstrap resampling: the answer is two exact order statistics,
    which is what makes it both assumption-free and engine-exact. Pairs
    with stats_poisson_bootstrap (mean CI, resampled) and
    agg_weighted_median.

    Determinism: values are exact cents; ranks come from one
    FLOOR((n − z√n)/2) whose sqrt/multiply/divide are correctly-rounded
    IEEE on identical integers, and the rank→value lookups walk the
    VALUE-HISTOGRAM cumulative counts (the module's standard
    order-statistic discipline — no raw-row sort).

    Shape: one scan to the value histogram (partial-aggregable), windows
    over the histogram only, a 1-row rank relation broadcast back.
    State is O(distinct values) at any corpus size."""
    s = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(quantize(F.col("value"), MONEY_SCALE).alias("v"))
    )
    hist = s.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_cum = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.select(
        "v",
        F.sum("c").over(w_cum).alias("cc"),
        F.sum("c").over(W.partitionBy()).alias("n"),
    )
    ranks = cum.agg(F.max("n").alias("n")).select(
        "n",
        F.expr(
            f"CAST(FLOOR((CAST(n AS DOUBLE)"
            f" - {_MCI_Z!r} * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)"
        ).alias("lo_rank"),
        F.expr(
            f"n + 1 - CAST(FLOOR((CAST(n AS DOUBLE)"
            f" - {_MCI_Z!r} * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)"
        ).alias("hi_rank"),
        F.expr("(n + 1) div 2").alias("med_rank"),
    )
    return (
        cum.select("v", "cc")  # drop cum's n: ranks carries the canonical one
        .crossJoin(F.broadcast(ranks))
        .groupBy("n", "lo_rank", "hi_rank")
        .agg(
            F.min(
                F.when(F.col("cc") >= F.col("med_rank"), F.col("v"))
            ).alias("median_cents"),
            F.min(F.when(F.col("cc") >= F.col("lo_rank"), F.col("v"))).alias(
                "ci_lo_cents"
            ),
            F.min(F.when(F.col("cc") >= F.col("hi_rank"), F.col("v"))).alias(
                "ci_hi_cents"
            ),
        )
        .select(
            "n", "lo_rank", "hi_rank",
            "median_cents", "ci_lo_cents", "ci_hi_cents",
        )
    )

# -- Benjamini-Yekutieli FDR under dependence (r12 queue) --------------------------------


@register(
    "stats_benjamini_yekutieli",
    oracle=f"""
    WITH p AS (
        SELECT doc_id,
               CAST(CASE WHEN doc_id % 10 = 5
                         THEN 1 + (doc_id * 2654435761) % 90
                         WHEN doc_id % 10 = 0
                         THEN 2501 + (doc_id * 2654435761) % 500
                         ELSE 1 + (doc_id * 2654435761) % 1000000
                    END AS BIGINT) AS p_ppm,
               (SELECT COUNT(*) FROM documents) AS m
        FROM documents
    ), r AS (
        SELECT doc_id, p_ppm, CAST(m AS BIGINT) AS m,
               CAST(ROW_NUMBER() OVER (ORDER BY p_ppm, doc_id) AS BIGINT) AS rnk
        FROM p
    ), cm AS (
        SELECT CAST(SUM(1000000 // rnk) AS BIGINT) AS c_micro FROM r
    ), k AS (
        SELECT r.*, cm.c_micro,
               MAX(CASE WHEN p_ppm * m * cm.c_micro
                         <= rnk * {_BH_ALPHA_PPM} * 1000000
                        THEN rnk END) OVER () AS k_star
        FROM r CROSS JOIN cm
    )
    SELECT doc_id, p_ppm, rnk, CAST(k_star AS BIGINT) AS k_star,
           c_micro
    FROM k WHERE rnk <= k_star
    """,
)
def benjamini_yekutieli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Yekutieli step-up FDR control — BH's guarantee under
    ARBITRARY dependence between the tests (BH assumes independence or
    PRDS; correlated hypotheses — the common case when tests share
    users/days — need the harmonic penalty c(m) = Σ 1/i). Same planted
    p-value generator as stats_holm_bonferroni (three tiers: the strong
    doc_id % 10 = 5 block at 1..90 ppm, the marginal % 10 = 0 block, and
    the uniform null — NOT stats_benjamini_hochberg's two-tier family,
    which lacks the strong tier; ADVICE r11), same step-up rule,
    threshold k·α/(m·c(m)): under the harmonic penalty BY keeps only the
    strong tier while BH's independence threshold on ITS OWN landscape
    admits the marginal block — the price of dropping the independence
    assumption, visible row by row.

    Determinism: c(m) is quantized PER TERM to integer micro-units
    (Σ 1000000 div i over ranks 1..m) — a defined integer surrogate both
    engines compute identically from the live m, within m/1e6 of the
    true 1e6·H_m (documented bias: floor makes c marginally small, the
    anti-conservative direction, bounded by 5e-4 relative at m = 500);
    the step-up comparison is then fully cross-multiplied BIGINT
    (p·m·c_micro vs k·α_ppm·1e6, ≈3.5e15 max — inside int64).

    Shape: identical to BH — the ranking runs over the m-row HYPOTHESIS
    relation, plus one m-row fold for c_micro broadcast back. Bounded by
    construction at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.count()  # hypothesis count: bounded, one job over footers
    p = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 5,
            1 + (F.col("doc_id") * F.lit(2654435761)) % F.lit(90),
        )
        .when(
            F.col("doc_id") % 10 == 0,
            2501 + (F.col("doc_id") * F.lit(2654435761)) % F.lit(500),
        )
        .otherwise(1 + (F.col("doc_id") * F.lit(2654435761)) % F.lit(1000000))
        .cast("long")
        .alias("p_ppm"),
    )
    r = p.withColumn(
        "rnk",
        F.row_number().over(W.orderBy("p_ppm", "doc_id")).cast("long"),
    )
    cm = r.agg(
        F.sum(F.expr("1000000 div rnk")).cast("long").alias("c_micro")
    )
    k = r.crossJoin(F.broadcast(cm)).withColumn(
        "k_star",
        F.max(
            F.when(
                F.col("p_ppm") * F.lit(m) * F.col("c_micro")
                <= F.col("rnk") * F.lit(_BH_ALPHA_PPM) * F.lit(1_000_000),
                F.col("rnk"),
            )
        )
        .over(W.partitionBy())
        .cast("long"),
    )
    return k.filter(F.col("rnk") <= F.col("k_star")).select(
        "doc_id", "p_ppm", "rnk", "k_star", "c_micro"
    )


# -- Kruskal-Wallis rank ANOVA (r12 queue) -----------------------------------------------


@register(
    "stats_kruskal_wallis",
    oracle="""
    WITH s AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v FROM events
    ), hist AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY 1
    ), rk AS (
        SELECT v,
               SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c + 1
                   + SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                   AS rank2
        FROM hist
    ), g AS (
        SELECT s.event_type,
               CAST(COUNT(*) AS HUGEINT) AS n_j,
               CAST(SUM(rk.rank2) AS HUGEINT) AS r2_j,
               CAST((SELECT COUNT(*) FROM s) AS HUGEINT) AS n
        FROM s JOIN rk USING (v) GROUP BY 1
    )
    SELECT event_type,
           CAST(n_j AS BIGINT) AS n_j,
           CAST(r2_j AS BIGINT) AS r2_j,
           CAST(SUM((3000000 * r2_j * r2_j)
                    // (n_j * n * (n + 1))) OVER ()
                - 3000000 * (n + 1) AS BIGINT) AS h_ppm
    FROM g
    """,
)
def kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank ANOVA across the k=5 event types — the
    INDEPENDENT-samples member completing the rank-test shelf (Friedman
    handles blocked/repeated measures; Jonckheere-Terpstra needs an
    ordered alternative; Mann-Whitney is the k=2 case): H =
    12/(N(N+1))·Σ R_j²/n_j − 3(N+1) over globally tie-averaged ranks.

    Determinism: doubled tie-averaged ranks come straight off the value
    HISTOGRAM (rank2 = prev_cum + 1 + cum for each distinct cent value —
    min+max of the tied run, exact integers, no raw-row sort); with
    doubled rank sums the identity becomes H = Σ 3·R2_j²/(n_j·N(N+1))
    − 3(N+1) (the 12 and the rank-doubling 4 fold to 3), evaluated as PER-GROUP ppm floors summed — a defined
    quantization both engines compute identically (bias ≤ k ppm,
    documented), with DECIMAL(38)/HUGEINT intermediates since R2²·3e6
    passes 2^63 at sf0.1. No tie-correction divisor, as with the classic
    uncorrected H; the oracle computes the same definition.

    Shape: one scan to the value histogram, one window over the
    histogram, one broadcast join of rank2 back onto the (type, value)
    relation — partial-aggregable throughout; the k-row output carries
    the shared H in every row."""
    s = load_table(spark, sf_dir, "events").select(
        "event_type", quantize(F.col("value"), MONEY_SCALE).alias("v")
    )
    hist = s.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_cum = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    rk = hist.select(
        "v",
        (
            F.sum("c").over(w_cum) - F.col("c") + 1 + F.sum("c").over(w_cum)
        ).alias("rank2"),
    )
    g = (
        s.join(F.broadcast(rk), "v")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n_j"),
            F.sum("rank2").cast("decimal(38,0)").alias("r2_j"),
        )
        .crossJoin(
            F.broadcast(
                s.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"))
            )
        )
    )
    return g.select(
        "event_type",
        F.col("n_j").cast("long").alias("n_j"),
        F.col("r2_j").cast("long").alias("r2_j"),
        F.expr(
            "CAST(SUM((3000000 * r2_j * r2_j)"
            " div (n_j * n * (n + 1))) OVER ()"
            " - 3000000 * (n + 1) AS BIGINT)"
        ).alias("h_ppm"),
    )


# -- Nemenyi post-hoc after Friedman (r12 queue) -------------------------------------------

#: q_{0.05, k=5, inf} from the studentized-range/sqrt(2) table (Demšar 2006)
_NEMENYI_Q = 2.728
#: the whole critical-difference comparison folds to ONE exact integer:
#: |R2_i - R2_j| > 2n·q·sqrt(k(k+1)/(6n))  ⇔  diff² · 10^5 > (20·q²·10^5)·n
#: and 2728² · 20 div 10 = 14_883_968 — exact decimal algebra; the IEEE
#: double 2.728² is 4e-9 away, which is why the rule stays integer.
_NEMENYI_THR = 14_883_968


@register(
    "stats_nemenyi_posthoc",
    oracle=f"""
    WITH cells AS (
        SELECT user_id % {_FRIED_BLOCKS} AS blk, event_type,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cv
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT blk, event_type,
               CAST(2 * RANK() OVER (PARTITION BY blk ORDER BY cv)
                    + COUNT(*) OVER (PARTITION BY blk, cv) - 1 AS BIGINT)
                   AS rank2
        FROM cells
    ), coltot AS (
        SELECT event_type, CAST(SUM(rank2) AS BIGINT) AS r2j,
               CAST(COUNT(*) AS BIGINT) AS n_blocks
        FROM ranked GROUP BY 1
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(ABS(a.r2j - b.r2j) AS BIGINT) AS r2_diff_abs,
           a.n_blocks AS n_blocks,
           CAST(CASE WHEN ABS(a.r2j - b.r2j) * ABS(a.r2j - b.r2j) * 100000
                      > {_NEMENYI_THR} * a.n_blocks
                     THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM coltot a JOIN coltot b ON a.event_type < b.event_type
    """,
)
def nemenyi_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nemenyi post-hoc after stats_friedman_test: WHICH event-type pairs
    differ, once the omnibus Friedman rejects — pairwise mean-rank gaps
    against the critical difference CD = q·√(k(k+1)/(6n)) with the
    standard q_(0.05, k=5) = {_NEMENYI_Q} (Demšar 2006, the ML-benchmark
    comparison recipe). The entire CD comparison folds to ONE exact
    integer inequality: with doubled rank sums, |R2_i−R2_j|² · 10⁵ >
    {_NEMENYI_THR}·n — the constant is the exact DECIMAL algebra
    2728²·20/10 (IEEE q² sits 4e-9 off, which is exactly why neither
    engine ever evaluates q as a float).

    Fixture honesty: stats_friedman_test's omnibus χ² ≈ 4.9 (df = 4)
    does not reject at either gate scale, and the post-hoc consistently
    finds zero significant pairs — the two answers AGREE, which is the
    property worth gating (a post-hoc that "finds" pairs under a
    non-rejecting omnibus is the classic misuse).

    Shape: the same {_FRIED_BLOCKS}-block rank relation Friedman builds,
    then a self-join of the k-row column-total relation — 10 output pairs
    regardless of scale."""
    cells = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            (F.col("user_id") % _FRIED_BLOCKS).alias("blk"), "event_type"
        )
        .agg(F.sum(quantize(F.col("value"), MONEY_SCALE)).alias("cv"))
    )
    w_rk = W.partitionBy("blk").orderBy("cv")
    w_tie = W.partitionBy("blk", "cv")
    ranked = cells.withColumn(
        "rank2",
        (2 * F.rank().over(w_rk) + F.count(F.lit(1)).over(w_tie) - 1).cast(
            "long"
        ),
    )
    coltot = ranked.groupBy("event_type").agg(
        F.sum("rank2").cast("long").alias("r2j"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
    )
    a = coltot.select(
        F.col("event_type").alias("type_a"),
        F.col("r2j").alias("r2a"),
        "n_blocks",
    )
    b = coltot.select(
        F.col("event_type").alias("type_b"), F.col("r2j").alias("r2b")
    )
    return (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.abs(F.col("r2a") - F.col("r2b")).cast("long").alias(
                "r2_diff_abs"
            ),
            "n_blocks",
            F.expr(
                "CAST(CASE WHEN ABS(r2a - r2b) * ABS(r2a - r2b) * 100000"
                f" > {_NEMENYI_THR} * n_blocks"
                " THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("significant"),
        )
    )


# -- Cochran-Armitage trend test (r13 queue) ---------------------------------------------


@register(
    "stats_cochran_armitage_trend",
    oracle="""
    WITH g AS (
        SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS dose,
               CAST(COUNT(*) AS HUGEINT) AS n_i,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS HUGEINT) AS s_i
        FROM orders GROUP BY 1
    ), m AS (
        SELECT SUM(n_i) AS n, SUM(s_i) AS s,
               SUM(dose * s_i) AS t,
               SUM(dose * n_i) AS w1,
               SUM(dose * dose * n_i) AS w2
        FROM g
    )
    SELECT g.dose,
           CAST(g.n_i AS BIGINT) AS n,
           CAST(g.s_i AS BIGINT) AS successes,
           CAST((1000000 * g.s_i) // g.n_i AS BIGINT) AS success_ppm,
           CAST(CASE WHEN s = 0 OR s = n OR n * w2 = w1 * w1 THEN 0
                     ELSE (1000000 * n * (n * t - s * w1) * (n * t - s * w1))
                          // (s * (n - s) * (n * w2 - w1 * w1)) END
                AS BIGINT) AS z2_ppm
    FROM g CROSS JOIN m
    """,
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend-in-proportions across ORDERED dose groups —
    the binary-outcome member of the ordered-alternative shelf (it is to
    stats_chi_square what stats_jonckheere_terpstra is to
    stats_kruskal_wallis): does the fulfilled rate (o_orderstatus = 'F')
    rise or fall monotonically with order priority 1-URGENT .. 5-LOW?
    Scores w = the priority's leading digit; z² = N·(N·T − S·W1)² /
    [S(N−S)(N·W2 − W1²)] with T = Σw·s_i, W1 = Σw·n_i, W2 = Σw²·n_i.

    Determinism: a 5-row contingency relation of exact integer counts;
    z² is ONE integer rational floored to ppm identically in both
    engines, in DECIMAL(38)/HUGEINT (N·num²·10⁶ ≈ 10²⁹ at sf0.1).
    Degenerate guards mirror stats_cochran_q: S ∈ {0, N} or constant
    dose (N·W2 = W1²) cases to z² = 0.

    Shape: one partial-aggregable groupBy to 5 rows; the trend fold is a
    broadcast of a 1-row moment aggregate — constant past the first
    aggregate at any corpus size."""
    g = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.substring("o_orderpriority", 1, 1).cast("long").alias("dose")
        )
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n_i"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("s_i"),
        )
    )
    m = g.agg(
        F.sum("n_i").cast("decimal(38,0)").alias("n"),
        F.sum("s_i").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("dose") * F.col("s_i")).cast("decimal(38,0)").alias("t"),
        F.sum(F.col("dose") * F.col("n_i")).cast("decimal(38,0)").alias("w1"),
        F.sum(F.col("dose") * F.col("dose") * F.col("n_i"))
        .cast("decimal(38,0)")
        .alias("w2"),
    )
    return g.crossJoin(F.broadcast(m)).select(
        "dose",
        F.col("n_i").cast("long").alias("n"),
        F.col("s_i").cast("long").alias("successes"),
        F.expr("CAST((1000000 * s_i) div n_i AS BIGINT)").alias("success_ppm"),
        F.expr(
            "CAST(CASE WHEN s = 0 OR s = n OR n * w2 = w1 * w1 THEN 0"
            " ELSE (1000000 * n * (n * t - s * w1) * (n * t - s * w1))"
            " div (s * (n - s) * (n * w2 - w1 * w1)) END AS BIGINT)"
        ).alias("z2_ppm"),
    )


# -- Page's L trend test (r13 queue) -----------------------------------------------------


@register(
    "stats_page_trend_test",
    oracle=f"""
    WITH cells AS (
        SELECT user_id % {_FRIED_BLOCKS} AS blk, event_type,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cv
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT blk, event_type,
               CAST(2 * RANK() OVER (PARTITION BY blk ORDER BY cv)
                    + COUNT(*) OVER (PARTITION BY blk, cv) - 1 AS BIGINT)
                   AS rank2
        FROM cells
    ), ord AS (
        SELECT event_type,
               CAST(DENSE_RANK() OVER (ORDER BY event_type) AS BIGINT) AS j,
               CAST(SUM(rank2) AS BIGINT) AS r2j,
               CAST(COUNT(*) AS BIGINT) AS b
        FROM ranked GROUP BY 1
    ), m AS (
        SELECT SUM(j * r2j) AS l2, MAX(b) AS b,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM ord
    )
    SELECT ord.event_type, ord.j, ord.r2j,
           CAST(m.l2 AS BIGINT) AS l2,
           CAST(CASE WHEN m.l2 >= m.b * m.k * (m.k + 1) * (m.k + 1) // 2
                     THEN (1000000 * (m.l2 - m.b * m.k * (m.k + 1) * (m.k + 1) // 2)
                           * (m.l2 - m.b * m.k * (m.k + 1) * (m.k + 1) // 2))
                          // ((m.b * (m.k * m.k * m.k - m.k)
                              * (m.k * m.k * m.k - m.k)) // (36 * (m.k - 1)))
                     ELSE -((1000000 * (m.b * m.k * (m.k + 1) * (m.k + 1) // 2 - m.l2)
                             * (m.b * m.k * (m.k + 1) * (m.k + 1) // 2 - m.l2))
                            // ((m.b * (m.k * m.k * m.k - m.k)
                                * (m.k * m.k * m.k - m.k)) // (36 * (m.k - 1)))) END
                AS BIGINT) AS signed_z2_ppm
    FROM ord CROSS JOIN m
    """,
)
def page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L trend test (Page 1963) — the ORDERED alternative after
    Friedman, completing the rank-test matrix: Kruskal-Wallis (unordered
    independent) / Jonckheere-Terpstra (ordered independent) / Friedman
    (unordered blocked) / Page (ordered blocked). Same
    {_FRIED_BLOCKS}x5 block design and doubled tie-averaged ranks as
    stats_friedman_test; hypothesized order = alphabetical event_type
    (fixture-honest: an arbitrary but fixed order, so the signed
    statistic reads as "no planted monotone trend" unless the data
    disagrees). L = Σ j·R_j; with doubled ranks L2 = 2L, E[L2] =
    b·k(k+1)²/2 (exact integer for k = 5), Var(L) = b(k³−k)²/(144(k−1))
    so 4·Var = b(k³−k)²/(36(k−1)) = 100·b exactly at k = 5 — making
    z² = (L2 − E[L2])²/(4·Var) one integer rational.

    Determinism: doubled ranks are exact integers off 12-row partitions;
    the z² fold divides integers whose divisors (2, 36(k−1)) divide
    exactly at k = 5 — asserted by the oracle's own algebra. The SIGN of
    L2 − E[L2] is carried on z² (positive = rank mass increasing along
    the hypothesized order) with the same magnitude in both branches,
    so no engine division-convention difference can appear.

    Shape: identical to stats_friedman_test — one partial-aggregable
    groupBy to the 60-cell relation, ranks inside 12-row partitions, a
    5-row rollup, then constant-size algebra."""
    cells = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            (F.col("user_id") % _FRIED_BLOCKS).alias("blk"), "event_type"
        )
        .agg(F.sum(quantize(F.col("value"), MONEY_SCALE)).alias("cv"))
    )
    w_rk = W.partitionBy("blk").orderBy("cv")
    w_tie = W.partitionBy("blk", "cv")
    ranked = cells.withColumn(
        "rank2",
        (2 * F.rank().over(w_rk) + F.count(F.lit(1)).over(w_tie) - 1).cast(
            "long"
        ),
    )
    ordn = ranked.groupBy("event_type").agg(
        F.sum("rank2").cast("long").alias("r2j"),
        F.count(F.lit(1)).cast("long").alias("b"),
    )
    ordn = ordn.withColumn(
        "j", F.dense_rank().over(W.orderBy("event_type")).cast("long")
    )
    m = ordn.agg(
        F.sum(F.col("j") * F.col("r2j")).cast("long").alias("l2"),
        F.max("b").cast("long").alias("nb"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    e_l2 = "nb * k * (k + 1) * (k + 1) div 2"
    var4 = "(nb * (k * k * k - k) * (k * k * k - k)) div (36 * (k - 1))"
    return ordn.crossJoin(F.broadcast(m)).select(
        "event_type",
        "j",
        "r2j",
        F.col("l2").alias("l2"),
        F.expr(
            f"CAST(CASE WHEN l2 >= {e_l2}"
            f" THEN (1000000 * (l2 - {e_l2}) * (l2 - {e_l2})) div ({var4})"
            f" ELSE -((1000000 * ({e_l2} - l2) * ({e_l2} - l2)) div ({var4}))"
            " END AS BIGINT)"
        ).alias("signed_z2_ppm"),
    )


from ..docfmt import format_docstrings  # noqa: E402
format_docstrings(globals())  # substitute {CONST} docstring placeholders (ADVICE r8)
