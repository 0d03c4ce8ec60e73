"""Window-function operators (SURVEY.md §2.9 "window functions" + §2.6 top-k).

The reference's only order-sensitive ops are a server-side sort + page cap
(top-10k per month, src/movie.py:153,161-168) and keep-first dedup
(src/movie.py:275). Both are window patterns; this module ships the full
analytic-function menu: ranking (row_number/rank/dense_rank/ntile), offsets
(lag/lead), and running/frame aggregates.

Scale notes: a window partitioned by a key is one shuffle on that key plus a
per-partition sort — fine when partitions are bounded (per-customer,
per-user). An UNPARTITIONED ordered window is a single-task bottleneck and
never appears here. Every ordering carries a unique tie-break key so results
are deterministic across engines and across re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import MONEY_SCALE, qavg_over, qsum_over, quantize, round2
from ..io import load_table
from ..registry import register

__all__ = ["topk_per_group", "keep_first"]


def topk_per_group(df: DataFrame, group_cols: list[str], order_cols: list, k: int) -> DataFrame:
    """Top-k rows per group: row_number over (group, order) ≤ k. Plans as a
    single shuffle + partial sort; with AQE no global sort ever happens."""
    w = W.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def keep_first(df: DataFrame, key_cols: list[str], order_cols: list) -> DataFrame:
    """Deterministic keep-first dedup (reference A1/A2, src/movie.py:275,295).

    The reference keeps the first row in *file order* (popularity-desc API
    order within a month); file order is not a thing in a distributed scan,
    so the survivor is pinned by an explicit ordering instead — the
    documented fix for the reference's hidden nondeterminism (SURVEY.md §7.3).
    """
    w = W.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


@register(
    "window_topk_per_segment",
    oracle="""
    SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS acctbal, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rk
        FROM customer
    )
    WHERE rk <= 3
    """,
)
def topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    out = topk_per_group(
        c, ["c_mktsegment"], [F.desc("c_acctbal"), F.asc("c_custkey")], 3
    )
    return out.select(
        "c_mktsegment",
        "c_custkey",
        round2(F.col("c_acctbal")).alias("acctbal"),
        F.col("rk").cast("long").alias("rk"),
    )


@register(
    "window_running_totals",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice * {MONEY_SCALE}) AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / CAST({MONEY_SCALE} AS DOUBLE)                                  AS running_spend,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq,
           ROUND(LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey), 2)  AS prev_price,
           ROUND(LEAD(o_totalprice) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey), 2) AS next_price
    FROM orders
    WHERE o_custkey % 10 = 0
    """,
)
def running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag/lead in one window spec (single shuffle on the
    partition key, shared by all four functions). The running sum is a
    quantized-integer window aggregate — order-independent and bit-exact."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        qsum_over(
            F.col("o_totalprice"), MONEY_SCALE, w.rowsBetween(W.unboundedPreceding, 0)
        ).alias("running_spend"),
        F.row_number().over(w).cast("long").alias("order_seq"),
        round2(F.lag("o_totalprice").over(w)).alias("prev_price"),
        round2(F.lead("o_totalprice").over(w)).alias("next_price"),
    )


@register(
    "window_rank_ntile",
    oracle="""
    SELECT s_suppkey, s_name,
           CAST(RANK()       OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS bal_rank,
           CAST(DENSE_RANK() OVER (ORDER BY s_nationkey, s_suppkey)    AS BIGINT) AS nation_seq,
           CAST(NTILE(4)     OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS quartile
    FROM supplier
    """,
)
def rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ranking over the 100-row supplier dim — the one place an
    unpartitioned window is fine (dimension-sized input, documented)."""
    s = load_table(spark, sf_dir, "supplier")
    w_bal = W.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    w_nat = W.orderBy(F.asc("s_nationkey"), F.asc("s_suppkey"))
    return s.select(
        "s_suppkey",
        "s_name",
        F.rank().over(w_bal).cast("long").alias("bal_rank"),
        F.dense_rank().over(w_nat).cast("long").alias("nation_seq"),
        F.ntile(4).over(w_bal).cast("long").alias("quartile"),
    )


@register(
    "window_frame_moving_avg",
    oracle=f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           (CAST(SUM(CAST(ROUND(l_extendedprice * {MONEY_SCALE}) AS BIGINT)) OVER w AS DOUBLE)
            / CAST(COUNT(l_extendedprice) OVER w AS DOUBLE))
               / CAST({MONEY_SCALE} AS DOUBLE) AS moving_avg_price
    FROM lineitem
    WHERE l_suppkey <= 5
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def frame_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy(F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .rowsBetween(-2, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        qavg_over(F.col("l_extendedprice"), MONEY_SCALE, w).alias("moving_avg_price"),
    )


@register(
    "dedup_keepfirst_events",
    oracle="""
    SELECT user_id, event_id AS first_event_id, epoch_us(ts) AS first_ts_us, event_type
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def dedup_keepfirst_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 parity: keep-first-per-key with an explicit deterministic order
    (earliest event per user, event_id tie-break)."""
    ev = load_table(spark, sf_dir, "events")
    out = keep_first(ev, ["user_id"], [F.asc("ts"), F.asc("event_id")])
    return out.select(
        "user_id",
        F.col("event_id").alias("first_event_id"),
        F.unix_micros("ts").alias("first_ts_us"),
        "event_type",
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT s_suppkey,
           ROUND(s_acctbal, 2) AS acctbal,
           CAST(COUNT(*) OVER (ORDER BY s_acctbal
                               RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
                AS BIGINT) AS peers_within_500
    FROM supplier
    """,
)
def range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window): peers whose balance is within ±500
    — distinct from ROWS frames (which count physical neighbors)."""
    s = load_table(spark, sf_dir, "supplier")
    w = W.orderBy(F.col("s_acctbal")).rangeBetween(-500, 500)
    return s.select(
        "s_suppkey",
        round2(F.col("s_acctbal")).alias("acctbal"),
        F.count(F.lit(1)).over(w).cast("long").alias("peers_within_500"),
    )


@register(
    "window_value_functions",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           ROUND(FIRST_VALUE(c_acctbal) OVER w, 2)              AS seg_richest,
           ROUND(LAST_VALUE(c_acctbal) OVER
                 (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
                                                                AS seg_poorest,
           ROUND(NTH_VALUE(c_acctbal, 2) OVER
                 (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
                                                                AS seg_second,
           ROUND(PERCENT_RANK() OVER w, 9)                      AS pct_rank,
           ROUND(CUME_DIST() OVER w, 9)                         AS cume
    FROM customer
    WHERE c_custkey % 10 = 0
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value + percent_rank/cume_dist. percent_rank is
    (rank-1)/(n-1) of exact ints — one IEEE division, rounded identically
    on both sides only as belt-and-braces (values are already bit-equal)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_mktsegment",
        "c_custkey",
        round2(F.first("c_acctbal").over(w)).alias("seg_richest"),
        round2(F.last("c_acctbal").over(w_full)).alias("seg_poorest"),
        round2(F.nth_value("c_acctbal", 2).over(w_full)).alias("seg_second"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


# -- time-interval RANGE frame — deferred r7 queue ----------------------------


@register(
    "window_time_range_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_1h_cents
    FROM events
    """
)
def time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour running revenue per user via a TIME-valued RANGE
    frame: the frame boundary is 3.6e9 MICROSECONDS of event time, not a
    row count — the window semantics rate-limiting, rolling-spend and
    velocity checks actually need (a ROWS frame silently changes meaning
    with event density; window_range_frame pins the numeric-range cousin,
    this pins the temporal one on integer epoch micros, which both
    engines order and subtract identically — no interval-type arithmetic
    to diverge).

    Shape: one user-keyed Exchange; the range frame advances two pointers
    over the sorted partition — O(n) per user, state bounded by the 1h
    span. Identical event-time ties share a frame (RANGE, not ROWS), so
    the output is tie-order independent and needs no extra tiebreak.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(quantize(F.col("value"), MONEY_SCALE)).over(w).alias("trailing_1h_cents"),
    )


# -- rolling exact median (order statistics over a moving frame) ---------------


@register(
    "window_rolling_median",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ), w AS (
        SELECT day, rev_cents,
               list_sort(list(rev_cents) OVER
                   (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
        FROM daily
    )
    SELECT day, rev_cents,
           CAST(len(win) AS BIGINT) AS n_in_window,
           CAST(win[(len(win) + 1) // 2] + win[len(win) // 2 + 1] AS BIGINT)
               AS median_x2_cents
    FROM w
    """,
)
def rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of daily purchase revenue over a trailing
    7-day RANGE frame — the order statistic neither engine offers as a
    window aggregate, built from first principles: collect the frame,
    sort, and take lower+upper middle. Reported as median×2 (lo + hi) so
    the even-count case stays an exact integer — no IEEE average exists.
    Ramp-up days use their true shorter frame (RANGE, not ROWS, so gap
    days shrink the window rather than silently widening the horizon).

    Shape: the raw scan collapses to the DAILY relation first, so the
    collect_list window holds at most 7 integers per row regardless of
    event volume — O(days × 7) state, one exchange. At 100 TB with a
    high-cardinality frame (trailing 90 days × per-user) the same query
    swaps collect+sort for the two-pass histogram-offset rank the
    percentile battery uses; for calendar-bounded frames this form is
    both exact and cheaper."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01"))
            .cast("long")
            .alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    w = W.orderBy("day").rangeBetween(-6, 0)
    return (
        daily.withColumn("win", F.array_sort(F.collect_list("rev_cents").over(w)))
        .select(
            "day",
            "rev_cents",
            F.size("win").cast("long").alias("n_in_window"),
            (
                F.element_at("win", ((F.size("win") + 1) / 2).cast("int"))
                + F.element_at("win", (F.size("win") / 2).cast("int") + 1)
            )
            .cast("long")
            .alias("median_x2_cents"),
        )
    )


# -- Hampel filter (rolling median/MAD outlier flags) ---------------------------


@register(
    "window_hampel_outliers",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ), w AS (
        SELECT day, rev_cents,
               list_sort(list(rev_cents) OVER
                   (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
                   AS win
        FROM daily
    ), m AS (
        SELECT day, rev_cents, win,
               win[(len(win) + 1) // 2] + win[len(win) // 2 + 1] AS med2
        FROM w
    ), d AS (
        SELECT day, rev_cents, med2,
               CAST(len(win) AS BIGINT) AS n_in_window,
               list_sort(list_transform(win,
                   v -> abs(2 * v - med2))) AS devs
        FROM m
    )
    SELECT day, rev_cents, n_in_window,
           CAST(med2 AS BIGINT) AS med2_cents,
           CAST(devs[(len(devs) + 1) // 2] + devs[len(devs) // 2 + 1]
                AS BIGINT) AS mad4_cents,
           2 * abs(2 * rev_cents - med2)
               > 3 * (devs[(len(devs) + 1) // 2] + devs[len(devs) // 2 + 1])
               AS is_outlier
    FROM d
    """,
)
def hampel_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter over daily purchase revenue: flag days whose value
    sits more than 3 robust sigmas (MAD) from the trailing 7-day rolling
    MEDIAN — the outlier detector monitoring pipelines prefer over
    z-scores because one spike can't drag its own threshold (the mean AND
    the stdev both chase the spike; the median and MAD ignore it).

    Exactness: medians are reported as lo+hi doubled values (med×2, and
    MAD×4 = lo+hi over |2v − med2|, which is exactly 2·|v − med| per
    member), so the 3-sigma test |x − med| > 3·MAD becomes the pure
    integer comparison 2·|2x − med2| > 3·mad4 — no IEEE anywhere.

    Shape: same staging as window_rolling_median — the corpus collapses
    to the daily relation first, so the collected frame holds ≤ 7
    integers per row and the deviation re-sort is O(7 log 7) per row,
    calendar-bounded. At a 90-day × per-user horizon the same test runs
    on the two-pass histogram-offset rank form instead."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01"))
            .cast("long")
            .alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    w = W.orderBy("day").rangeBetween(-6, 0)
    m = daily.withColumn(
        "win", F.array_sort(F.collect_list("rev_cents").over(w))
    ).withColumn(
        "med2",
        F.element_at("win", ((F.size("win") + 1) / 2).cast("int"))
        + F.element_at("win", (F.size("win") / 2).cast("int") + 1),
    )
    d = m.withColumn(
        "devs",
        F.array_sort(
            F.transform("win", lambda v: F.abs(2 * v - F.col("med2")))
        ),
    ).withColumn(
        "mad4",
        F.element_at("devs", ((F.size("devs") + 1) / 2).cast("int"))
        + F.element_at("devs", (F.size("devs") / 2).cast("int") + 1),
    )
    return d.select(
        "day",
        "rev_cents",
        F.size("win").cast("long").alias("n_in_window"),
        F.col("med2").cast("long").alias("med2_cents"),
        F.col("mad4").cast("long").alias("mad4_cents"),
        (
            2 * F.abs(2 * F.col("rev_cents") - F.col("med2"))
            > 3 * F.col("mad4")
        ).alias("is_outlier"),
    )


# -- rolling OLS slope (trailing regression per key) ---------------------------

_ROLS_DAYS = 14  # trailing RANGE horizon (days, inclusive of current)


@register(
    "window_rolling_ols_slope",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(value) AS BIGINT)) AS BIGINT) AS rev
        FROM events GROUP BY 1, 2
    ), s AS (
        SELECT event_type, day, rev,
               CAST(COUNT(*)        OVER w AS BIGINT) AS n,
               CAST(SUM(day)        OVER w AS BIGINT) AS sx,
               CAST(SUM(rev)        OVER w AS BIGINT) AS sy,
               CAST(SUM(day * rev)  OVER w AS BIGINT) AS sxy,
               CAST(SUM(day * day)  OVER w AS BIGINT) AS sxx
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     RANGE BETWEEN {_ROLS_DAYS - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, rev, n,
           CAST(CASE WHEN n < 2 THEN NULL
                     WHEN n * sxy - sx * sy >= 0
                     THEN (1000000 * (n * sxy - sx * sy))
                          // (n * sxx - sx * sx)
                     ELSE -((1000000 * (sx * sy - n * sxy))
                          // (n * sxx - sx * sx)) END
                AS BIGINT) AS slope_ppm
    FROM s
    """,
)
def rolling_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {_ROLS_DAYS}-day OLS trend slope of daily revenue, per
    event type — the rolling-regression window every monitoring stack
    derives "trend" from, joining the moving-average/median members of
    the rolling family with an actual least-squares fit:
    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), emitted as exact signed ppm
    with the division sign-split so truncation is engine-identical.
    Ramp-up days regress over their true shorter frame (RANGE, not ROWS);
    single-point frames emit NULL (slope undefined, den = 0).

    x is the day offset from a fixed epoch (slope is shift-invariant, and
    the small ordinate keeps every moment far inside BIGINT: at daily
    revenue ≤ ~1e8 units the worst term 1e6·n·Σxy is ~1e19/2⁶³-safe by
    three orders; a deployment with larger ordinates re-centers x per
    window start or widens to DECIMAL(38)).

    Shape: identical staging to window_rolling_median — the corpus
    collapses to the (type, day) relation first, so the five frame sums
    hold O({_ROLS_DAYS}) integers per row regardless of event volume; one
    exchange on event_type, one sort, five running sums in one window
    pass (Catalyst shares the frame buffer across same-frame aggregates).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01"))
        .cast("long")
        .alias("day"),
    ).agg(F.sum(F.round(F.col("value")).cast("long")).cast("long").alias("rev"))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(-(_ROLS_DAYS - 1), 0)
    )
    s = daily.select(
        "event_type",
        "day",
        "rev",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("day").over(w).cast("long").alias("sx"),
        F.sum("rev").over(w).cast("long").alias("sy"),
        F.sum(F.col("day") * F.col("rev")).over(w).cast("long").alias("sxy"),
        F.sum(F.col("day") * F.col("day")).over(w).cast("long").alias("sxx"),
    )
    return s.select(
        "event_type",
        "day",
        "rev",
        "n",
        F.expr(
            "CAST(CASE WHEN n < 2 THEN NULL"
            " WHEN n * sxy - sx * sy >= 0"
            " THEN (1000000 * (n * sxy - sx * sy))"
            "      div (n * sxx - sx * sx)"
            " ELSE -((1000000 * (sx * sy - n * sxy))"
            "      div (n * sxx - sx * sx)) END AS BIGINT)"
        ).alias("slope_ppm"),
    )


# -- distribution window functions (r12 queue) ------------------------------------------


@register(
    "window_dist_functions",
    oracle="""
    SELECT s_suppkey,
           CAST(s_nationkey AS BIGINT) AS nation,
           CAST(ROUND(1000000 * PERCENT_RANK() OVER w) AS BIGINT)
               AS pct_rank_ppm,
           CAST(ROUND(1000000 * CUME_DIST() OVER w) AS BIGINT)
               AS cume_dist_ppm
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey
                 ORDER BY ROUND(s_acctbal * 100) DESC, s_suppkey)
    """,
)
def dist_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK and CUME_DIST — the distribution members completing
    the ranking-window family (window_rank_ntile covers rank/dense_rank/
    ntile): each supplier's within-nation balance percentile, the
    SQL-standard normalization feature stores ship as-is. Both functions
    are ratios of exact integers ((rank−1)/(n−1), cum/n) evaluated as one
    correctly-rounded IEEE division, so ROUND(1e6·x) is bit-identical
    across engines; the order fully tie-breaks on (cent-balance, key).

    Shape: one shuffle on the partition key, in-partition sort —
    the canonical window plan; nothing global. (ADVICE r11: a dead
    WindowSpec built with F.expr("... DESC") was removed here — inside
    expr() that DESC parses as a column ALIAS, silently ascending; the
    inline OVER() SQL below is the correct form.)"""
    return load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_nationkey").cast("long").alias("nation"),
        F.expr(
            "CAST(ROUND(1000000 * PERCENT_RANK() OVER"
            " (PARTITION BY s_nationkey"
            "  ORDER BY ROUND(s_acctbal * 100) DESC, s_suppkey))"
            " AS BIGINT)"
        ).alias("pct_rank_ppm"),
        F.expr(
            "CAST(ROUND(1000000 * CUME_DIST() OVER"
            " (PARTITION BY s_nationkey"
            "  ORDER BY ROUND(s_acctbal * 100) DESC, s_suppkey))"
            " AS BIGINT)"
        ).alias("cume_dist_ppm"),
    )

from ..docfmt import format_docstrings  # noqa: E402
format_docstrings(globals())  # substitute {CONST} docstring placeholders (ADVICE r8)
