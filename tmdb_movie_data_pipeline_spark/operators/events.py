"""Event-table analytics: time bucketing, sessionization, latest-per-key.

Batch counterparts of the streaming queries in streaming/ — same logical
results, so they double as oracles for the streaming path (the driver's
DuckDB oracle checks the batch form; tests assert batch == streaming).

Scale notes: tumbling-window aggregation is a plain groupBy on the truncated
timestamp (partial agg before shuffle). Sessionization is one shuffle on
user_id + an ordered scan — the standard lag/cumsum pattern; per-user state
never leaves its partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import (
    MONEY_SCALE,
    UNIT_SCALE,
    bucket_offsets,
    qavg,
    qavg_sql,
    qsum,
    qsum_sql,
    quantize,
    round4,
)
from ..io import load_table
from ..registry import register

__all__ = ["sessionize", "SESSION_GAP_MIN"]

SESSION_GAP_MIN = 30


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Assign gap-based session ids per user: a session breaks when the gap
    to the previous event exceeds ``gap_minutes``. Returns the input plus
    ``session_seq`` (1-based per user)."""
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap_us = gap_minutes * 60 * 1_000_000
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    is_new = F.when(
        prev_us.isNull() | ((F.unix_micros("ts") - prev_us) > gap_us), 1
    ).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )


@register(
    "events_tumbling_hourly",
    oracle=f"""
    SELECT epoch_us(date_trunc('hour', ts))  AS window_start_us,
           event_type,
           CAST(COUNT(*) AS BIGINT)          AS n_events,
           {qsum_sql("value", UNIT_SCALE)}   AS sum_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type — the batch twin of the
    streaming tumbling-window query (streaming/queries.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("window_start_us"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            qsum(F.col("value"), UNIT_SCALE).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "events_sliding_windows",
    oracle=f"""
    WITH offsets AS (SELECT UNNEST([0, 30]) AS off_min)
    SELECT epoch_us(date_trunc('hour', ts - to_minutes(off_min))
                    + to_minutes(off_min))                    AS window_start_us,
           CAST(COUNT(*) AS BIGINT)                           AS n_events,
           {qavg_sql("value", UNIT_SCALE)}                    AS avg_value
    FROM events, offsets
    GROUP BY 1
    """,
)
def sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h windows every 30min: each event lands in 2 windows —
    expressed as the explicit window-replication Spark's F.window performs
    under the hood (portable to the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    offs = F.explode(F.array(F.lit(0), F.lit(30))).alias("off_min")
    with_off = ev.select("ts", "value", offs)
    shifted = F.date_trunc(
        "hour", F.col("ts") - F.make_interval(mins=F.col("off_min"))
    ) + F.make_interval(mins=F.col("off_min"))
    return with_off.groupBy(F.unix_micros(shifted).alias("window_start_us")).agg(
        F.count(F.lit(1)).alias("n_events"),
        qavg(F.col("value"), UNIT_SCALE).alias("avg_value"),
    )


@register(
    "events_sessionize",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                            > {SESSION_GAP_MIN} * 60 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, event_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM seq
    )
    SELECT user_id, session_seq,
           CAST(COUNT(*) AS BIGINT)            AS n_events,
           epoch_us(MIN(ts))                   AS session_start_us,
           epoch_us(MAX(ts))                   AS session_end_us
    FROM sess
    GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) + per-session rollup — the batch
    twin of streaming session_window."""
    ev = load_table(spark, sf_dir, "events")
    return (
        sessionize(ev)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
        )
    )


@register(
    "events_latest_per_user",
    oracle="""
    SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS last_ts_us,
           event_type, ROUND(value, 4) AS value
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-event-per-key — the CDC/upsert compaction primitive."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.unix_micros("ts").alias("last_ts_us"),
            "event_type",
            F.round("value", 4).alias("value"),
        )
    )


@register(
    "events_cdc_tombstones",
    oracle="""
    SELECT user_id, event_id AS last_event_id, epoch_us(ts) AS last_ts_us,
           event_type AS last_type, ROUND(value, 4) AS value
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction WITH tombstones: latest row per key wins, and a key
    whose latest row is a delete marker (here the synthetic mapping
    ``event_type = 'error'``) is dropped from the compacted state entirely
    — the missing half of upsert compaction (``events_latest_per_user``
    keeps every key). Same single-Exchange window shape; the tombstone
    filter rides the rn=1 filter for free. At scale this is exactly how a
    log-compacted changefeed (Kafka compaction, Delta CDF) materializes."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.unix_micros("ts").alias("last_ts_us"),
            F.col("event_type").alias("last_type"),
            F.round("value", 4).alias("value"),
        )
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    ),
    f AS (SELECT user_id, MIN(w) AS cohort_w FROM uw GROUP BY 1)
    SELECT epoch_us(cohort_w)                                    AS cohort_week_us,
           CAST(datediff('day', cohort_w, w) / 7 AS BIGINT)      AS weeks_since,
           CAST(COUNT(*) AS BIGINT)                              AS n_users
    FROM uw JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-active week, counted
    in every later week they return — the standard growth-analytics rollup.
    (Weekly, not monthly: both engines truncate weeks to Monday, and the
    offset is day-diff/7 on week-truncated values — exact integers with no
    engine-specific week-counting semantics.)

    Scale shape: distinct (user, week) first (partial-agg dedup before the
    shuffle), then the per-user MIN rides a user_id aggregation whose output
    is joined back and re-aggregated by (cohort, offset). Because a user's
    active weeks are bounded (≤ weeks in the data's lifetime), every
    intermediate is strictly smaller than the raw events table — nothing
    here scans events twice. After the (user, week) dedup the join back to
    per-user minima colocates on user_id. COUNT(*) on the joined set IS
    count-distinct-users because (user, week) rows are unique by
    construction — no expensive distinct aggregate at the end."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("w").alias("cohort_w"))
    return (
        uw.join(first, "user_id")
        .groupBy(
            F.unix_micros("cohort_w").alias("cohort_week_us"),
            (F.datediff(F.col("w"), F.col("cohort_w")) / 7)
            .cast("long")
            .alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "events_user_streaks",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    g AS (
        SELECT user_id, d,
               datediff('day', DATE '1970-01-01', d)
                 - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
        FROM ud
    ),
    isl AS (
        SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS streak_len
        FROM g GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT)        AS n_streaks,
           CAST(SUM(streak_len) AS BIGINT) AS active_days
    FROM isl GROUP BY 1
    """,
)
def user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user runs of consecutive active DAYS (daily
    streaks). The classic trick — day_number minus row_number is constant
    within a consecutive run — turns streak detection into two plain
    aggregations, no iterative logic.

    Scale shape: after the (user, day) dedup, ONE hash partitioning on
    user_id serves everything downstream — the row_number window, the
    (user, grp) island aggregation, and the final per-user rollup all
    cluster on user_id subsets, so Catalyst reuses the same Exchange (the
    plan has exactly two shuffles total, dedup + window, regardless of data
    size; pinned in tests/test_plans.py)."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = W.partitionBy("user_id").orderBy(F.asc("d"))
    g = ud.withColumn(
        "grp",
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w),
    )
    isl = g.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return isl.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("streak_len").cast("long").alias("active_days"),
    )


@register(
    "events_cooccurrence_pairs",
    oracle="""
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    ),
    tc AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_type FROM ut GROUP BY 1
    ),
    p AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_both,
           CAST(p.n_both AS DOUBLE)
             / CAST(ta.n_type + tb.n_type - p.n_both AS DOUBLE) AS jaccard
    FROM p
    JOIN tc ta ON ta.event_type = p.type_a
    JOIN tc tb ON tb.event_type = p.type_b
    """,
)
def cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavior co-occurrence matrix: for every unordered pair of event
    types, how many users did both, plus the Jaccard overlap of the two
    user sets — market-basket affinity over the event log.

    Scale shape: the self-join runs on the DEDUPED (user, type) relation —
    |types| per user is tiny and bounded, so the triangular join (`<` on
    type) emits at most C(T,2) rows per user, never a quadratic blowup in
    users. Both join sides cluster on user_id (one shuffle each from the
    same dedup); the per-type totals are a tiny aggregate joined in by
    broadcast at the end. Jaccard is an int/int IEEE division — bit-equal
    cross-engine with no rounding."""
    ev = load_table(spark, sf_dir, "events")
    # three consumers (type totals + both self-join sides): dedupe the
    # events scan + distinct to one execution per action (r22; narrow
    # user-type rows, bounded by |users|x|types|).
    ut = (
        ev.select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    tc = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_type"))
    a = ut.alias("a")
    b = ut.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = tc.select(
        F.col("event_type").alias("type_a"), F.col("n_type").alias("na")
    )
    tb = tc.select(
        F.col("event_type").alias("type_b"), F.col("n_type").alias("nb")
    )
    return (
        p.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            (
                F.col("n_both").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_both")).cast("double")
            ).alias("jaccard"),
        )
    )


@register(
    "events_funnel_steps",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view'     THEN epoch_us(ts) END) AS t1,
               MIN(CASE WHEN event_type = 'click'    THEN epoch_us(ts) END) AS t2,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t3
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN t1 IS NOT NULL AND t2 > t1
                             THEN 1 ELSE 0 END) AS BIGINT)                     AS n2,
               CAST(SUM(CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2
                             THEN 1 ELSE 0 END) AS BIGINT)                     AS n3
        FROM u
    )
    SELECT 1 AS step, 'view' AS step_type, n1 AS n_users,
           CAST(n1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS conv_from_first
    FROM s
    UNION ALL
    SELECT 2, 'click', n2, CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) FROM s
    UNION ALL
    SELECT 3, 'purchase', n3, CAST(n3 AS DOUBLE) / CAST(n1 AS DOUBLE) FROM s
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): a user counts at
    step k if their FIRST occurrence of each step is strictly later than the
    first occurrence of the previous step (min-time ordering — the standard
    single-scan funnel; strict ``>`` is the tie rule on both engines).

    Scale shape: ONE scan and ONE user_id aggregation produce the three
    conditional minima (all partial-aggregable); the step counts are a
    second aggregation over one row per user; the 3-row presentation fans
    out from a single-row aggregate — at 100 TB this is a map-side-combined
    groupBy and nothing else. Conversion is an int/int IEEE division."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")

    def first_of(t: str):
        return F.min(F.when(F.col("event_type") == t, us))

    u = ev.groupBy("user_id").agg(
        first_of("view").alias("t1"),
        first_of("click").alias("t2"),
        first_of("purchase").alias("t3"),
    )
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    s1 = F.col("t1").isNotNull()
    s2 = s1 & (F.col("t2") > F.col("t1"))
    s3 = s2 & (F.col("t3") > F.col("t2"))
    s = u.agg(flag(s1).alias("n1"), flag(s2).alias("n2"), flag(s3).alias("n3"))
    rows = [
        (1, "view", "n1"),
        (2, "click", "n2"),
        (3, "purchase", "n3"),
    ]
    out = None
    for step, name, col in rows:
        one = s.select(
            F.lit(step).alias("step"),
            F.lit(name).alias("step_type"),
            F.col(col).alias("n_users"),
            (F.col(col).cast("double") / F.col("n1").cast("double")).alias(
                "conv_from_first"
            ),
        )
        out = one if out is None else out.unionByName(one)
    return out


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    p AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_trans,
           CAST(n_trans AS DOUBLE)
             / CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS DOUBLE)
             AS prob
    FROM p
    """,
)
def transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream: for every
    (from, to) pair of consecutive events within a user's timeline, the
    count and the row-normalized transition probability — the clickstream
    model behind next-action prediction and anomaly scoring.

    Scale shape: one user_id shuffle for the LEAD window, then a tiny
    (|types|² upper-bounded) aggregate; the row normalization is a window
    over that tiny relation, not over events. Probability is an int/int
    IEEE division — bit-equal cross-engine. The per-user ordered scan never
    leaves its partition, exactly like sessionize above."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    p = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    wt = W.partitionBy("from_type")
    return p.select(
        "from_type",
        "to_type",
        "n_trans",
        (
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(wt).cast("double")
        ).alias("prob"),
    )


@register(
    "events_gap_fill_ffill",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
               {qsum_sql("value", UNIT_SCALE)} AS day_value
        FROM events WHERE user_id % 50 = 0
        GROUP BY 1, 2
    ),
    spine AS (
        SELECT user_id, UNNEST(generate_series(MIN(d), MAX(d), INTERVAL 1 DAY))
                   AS d
        FROM daily GROUP BY user_id
    ),
    joined AS (
        SELECT s.user_id, CAST(s.d AS DATE) AS d, daily.day_value
        FROM spine s LEFT JOIN daily
          ON daily.user_id = s.user_id AND daily.d = CAST(s.d AS DATE)
    )
    SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
           CASE WHEN day_value IS NULL THEN 1 ELSE 0 END AS filled,
           LAST_VALUE(day_value IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS value_ffill
    FROM joined
    """,
)
def gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: per-user daily rollup, re-gridded onto a
    dense day spine (sequence + explode between each user's min and max
    day — no calendar table, no driver loop) with gaps FORWARD-FILLED via
    last(ignoreNulls) over an unbounded-preceding frame; `filled` marks
    synthesized days. Day values are quantized integer sums, so the filled
    series is bit-identical cross-engine.

    Scale shape: the spine explode emits O(active span) rows per user and
    the fill is one window over (user, day) — both partition cleanly by
    user; nothing global. The %50 user sample keeps the gate's output
    small; at 100 TB drop the sample and the plan is unchanged."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(qsum(F.col("value"), UNIT_SCALE).alias("day_value"))
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias(
                "d"
            ),
        )
    )
    joined = spine.join(daily, ["user_id", "d"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.when(F.col("day_value").isNull(), 1).otherwise(0).alias("filled"),
        F.last("day_value", ignorenulls=True).over(w).alias("value_ffill"),
    )


# -- integer-exact outlier detection (3-sigma without a float sigma) ----------

_Z_SCALE = 100  # cents quantization for event values
_Z_K = 3  # flag beyond K population-sigma


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH q AS (
        SELECT event_id, event_type,
               strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
               CAST(ROUND(value * {_Z_SCALE}) AS BIGINT) AS qc
        FROM events
    ),
    g AS (
        SELECT event_id, event_type, day, qc,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(qc) OVER w AS BIGINT) AS s,
               CAST(SUM(qc * qc) OVER w AS BIGINT) AS qq
        FROM q WINDOW w AS (PARTITION BY event_type, day)
    )
    SELECT event_id, event_type, day, qc AS value_cents, n AS n_group
    FROM g
    WHERE (n * qc - s) * (n * qc - s) > {_Z_K * _Z_K} * (n * qq - s * s)
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) {_Z_K}-sigma outliers WITHOUT computing a
    float sigma: |x - mean| > K*stddev is squared into the equivalent
    integer inequality

        (n*x - S)^2 > K^2 * (n*Q - S^2),   S = sum(x), Q = sum(x^2)

    over cent-quantized values — every operand is a BIGINT, so the flag set
    is bit-identical cross-engine (stddev via sqrt would hand each engine
    its own libm rounding at the decision boundary; the sketch family's
    integer-contract recipe applied to anomaly detection).

    Scale shape: ONE window over (event_type, day) — a single Exchange
    keyed by group; moments are computed by the same windowed partial
    aggregation as the ranking battery, and the filter is stateless per
    row. Overflow bound (documented, same discipline as the resample
    threshold fix): |n*x - S| <= n * max|x|, so the squared term needs
    n_group * max_cents < 3.0e9 — at 5e4-cent values that is ~6e4 rows per
    (type, day), holding through sf10; beyond that, tighten the bucket to
    (type, hour) — same plan, smaller n — rather than widening to floats."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_id",
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        quantize(F.col("value"), _Z_SCALE).alias("qc"),
    )
    w = W.partitionBy("event_type", "day")
    g = q.select(
        "*",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("qc").over(w).alias("s"),
        F.sum(F.col("qc") * F.col("qc")).over(w).alias("qq"),
    )
    dev = F.col("n") * F.col("qc") - F.col("s")
    thresh = F.lit(_Z_K * _Z_K) * (
        F.col("n") * F.col("qq") - F.col("s") * F.col("s")
    )
    return g.filter(dev * dev > thresh).select(
        "event_id",
        "event_type",
        "day",
        F.col("qc").alias("value_cents"),
        F.col("n").alias("n_group"),
    )


# -- gap fill by LINEAR INTERPOLATION (integer-exact rational form) -----------


@register(
    "events_gap_fill_interpolate",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(SUM(CAST(ROUND(value * {_Z_SCALE}) AS BIGINT)) AS BIGINT)
                   AS day_q
        FROM events WHERE user_id % 50 = 0
        GROUP BY 1, 2
    ),
    spine AS (
        SELECT user_id, UNNEST(generate_series(MIN(d), MAX(d), INTERVAL 1 DAY))
                   AS d
        FROM daily GROUP BY user_id
    ),
    joined AS (
        SELECT s.user_id, CAST(s.d AS DATE) AS d, daily.day_q
        FROM spine s LEFT JOIN daily
          ON daily.user_id = s.user_id AND daily.d = CAST(s.d AS DATE)
    ),
    ctx AS (
        SELECT user_id, d, day_q,
            LAST_VALUE(day_q IGNORE NULLS) OVER wp AS prev_q,
            MAX(CASE WHEN day_q IS NOT NULL THEN d END) OVER wp AS prev_d,
            FIRST_VALUE(day_q IGNORE NULLS) OVER wn AS next_q,
            MIN(CASE WHEN day_q IS NOT NULL THEN d END) OVER wn AS next_d
        FROM joined
        WINDOW wp AS (PARTITION BY user_id ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY user_id ORDER BY d
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
           CASE WHEN day_q IS NULL THEN 1 ELSE 0 END AS filled,
           CAST(CASE WHEN day_q IS NOT NULL THEN day_q
                ELSE (prev_q * (date_diff('day', d, next_d))
                      + next_q * (date_diff('day', prev_d, d)))
                     // date_diff('day', prev_d, next_d)
           END AS DOUBLE) / {float(_Z_SCALE)} AS value_interp
    FROM ctx
    """,
)
def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill by LINEAR INTERPOLATION between the bracketing observed
    days — the companion to events_gap_fill_ffill for series where a gap
    means "missed reading", not "value persisted".

    The interpolated value is computed as the single-division rational

        (prev*(g-k) + next*k) div g,   k = days since prev, g = gap width,

    in integer cents: the numerator is a sum of NON-NEGATIVE products, so
    integer division agrees between Spark (`div`, truncates toward zero)
    and DuckDB (`//`, floors) — the naive prev + (next-prev)*k/g form has a
    sign-dependent numerator and silently diverges between the two on
    falling segments. One IEEE division de-quantizes at the end (qsum's
    recipe). Both bracketing values always exist: the spine spans exactly
    [min observed day, max observed day] per user, so every gap is
    interior.

    Scale shape: identical to ffill — spine explode is O(active span) per
    user; prev/next context comes from two frames over ONE (user, day)
    sort, no self-join; everything partitions by user."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.sum(quantize(F.col("value"), _Z_SCALE)).alias("day_q"))
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias(
                "d"
            ),
        )
    )
    joined = spine.join(daily, ["user_id", "d"], "left")
    wp = (
        W.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    known_d = F.when(F.col("day_q").isNotNull(), F.col("d"))
    ctx = joined.select(
        "user_id",
        "d",
        "day_q",
        F.last("day_q", ignorenulls=True).over(wp).alias("prev_q"),
        F.max(known_d).over(wp).alias("prev_d"),
        F.first("day_q", ignorenulls=True).over(wn).alias("next_q"),
        F.min(known_d).over(wn).alias("next_d"),
    )
    k = F.datediff(F.col("d"), F.col("prev_d"))
    gk = F.datediff(F.col("next_d"), F.col("d"))
    g = F.datediff(F.col("next_d"), F.col("prev_d"))
    interp_q = F.expr(
        "(prev_q * gk_c + next_q * k_c) div g_c"
    )
    return (
        ctx.withColumn("k_c", k.cast("long"))
        .withColumn("gk_c", gk.cast("long"))
        .withColumn("g_c", g.cast("long"))
        .select(
            "user_id",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.when(F.col("day_q").isNull(), 1).otherwise(0).alias("filled"),
            (
                F.when(F.col("day_q").isNotNull(), F.col("day_q"))
                .otherwise(interp_q)
                .cast("double")
                / F.lit(float(_Z_SCALE))
            ).alias("value_interp"),
        )
    )


# -- marketing attribution (last touch within a lookback window) --------------

_ATTR_LOOKBACK_DAYS = 7
_ATTR_CHANNELS = ("view", "click")  # attributable touch events


@register(
    "events_attribution_last_touch",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(ROUND(value * {_Z_SCALE}) AS BIGINT) AS qc,
               LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                               THEN event_type END IGNORE NULLS) OVER w
                   AS touch_type,
               LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                               THEN ts END IGNORE NULLS) OVER w AS touch_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT COALESCE(CASE WHEN touch_ts >= ts - INTERVAL {_ATTR_LOOKBACK_DAYS} DAY
                         THEN touch_type END, 'none') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(qc) AS BIGINT) AS revenue_cents
    FROM ordered
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH attribution: each purchase is credited to the user's most
    recent view/click STRICTLY BEFORE it (frame ends at 1 PRECEDING) and no
    older than {_ATTR_LOOKBACK_DAYS} days; purchases with no in-window
    touch fall into the 'none' bucket. Revenue is cent-quantized so the
    per-channel totals are order-free integers.

    The touch (type, ts) pair is carried by TWO last_value(ignoreNulls)
    expressions over the SAME frame of the same CASE-filtered rows — both
    resolve to the same source row (they are NULL on exactly the same
    rows), so no struct comparison is needed and the pair stays consistent
    by construction.

    Scale shape: one window keyed by user (the sessionize shuffle), then a
    filter + tiny groupBy — per-user state never leaves its partition and
    the output relation is |channels|+1 rows. Ties inside a user timeline
    break on (ts, event_id), the repo-wide total-order convention."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*_ATTR_CHANNELS)
    ordered = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        quantize(F.col("value"), _Z_SCALE).alias("qc"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    in_window = F.col("touch_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {_ATTR_LOOKBACK_DAYS} DAY"
    )
    return (
        ordered.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(
                F.when(in_window, F.col("touch_type")), F.lit("none")
            ).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("qc").cast("long").alias("revenue_cents"),
        )
    )


# -- interval merge (gaps-and-islands over derived intervals) -----------------

_IVL_DUR_CHOICES = 50  # synthetic duration: 1..50 minutes, keyed by event_id


@register(
    "events_interval_merge",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS start_us,
               epoch_us(ts) + (1 + event_id % {_IVL_DUR_CHOICES})
                              * 60 * 1000000 AS end_us
        FROM events
    ), flagged AS (
        SELECT user_id, start_us, end_us,
               CASE WHEN MAX(end_us) OVER (
                        PARTITION BY user_id ORDER BY start_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR start_us > MAX(end_us) OVER (
                        PARTITION BY user_id ORDER BY start_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    )
                    THEN 1 ELSE 0 END AS is_new,
               event_id
        FROM iv
    ), grp AS (
        SELECT user_id, start_us, end_us,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY start_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS interval_seq
        FROM flagged
    )
    SELECT user_id, interval_seq,
           MIN(start_us)            AS merged_start_us,
           MAX(end_us)              AS merged_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_merged
    FROM grp
    GROUP BY user_id, interval_seq
    """,
)
def interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping/touching intervals per user (gaps-and-islands).

    Each event spawns a deterministic interval [ts, ts + (1 + event_id % 50)
    minutes]; intervals whose start does not exceed the running maximum end
    of all earlier intervals coalesce into one. The running-max guard (not
    lag(end)) is what makes this correct when an early long interval fully
    covers later short ones — the classic subtlety of interval merging.

    Scale: ONE shuffle on user_id; both windows and the final rollup share
    that partitioning, so per-user state never crosses executors. Identical
    shape to sessionization but over 2-sided spans — covers SURVEY §2.9's
    range/temporal family from the coalescing side.
    """
    ev = load_table(spark, sf_dir, "events")
    dur_us = (1 + F.col("event_id") % _IVL_DUR_CHOICES) * 60 * 1_000_000
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("start_us"),
        (F.unix_micros("ts") + dur_us).alias("end_us"),
    )
    w_ord = W.partitionBy("user_id").orderBy("start_us", "event_id")
    prev_max = F.max("end_us").over(w_ord.rowsBetween(W.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "is_new",
        F.when(prev_max.isNull() | (F.col("start_us") > prev_max), 1).otherwise(0),
    )
    grp = flagged.withColumn(
        "interval_seq",
        F.sum("is_new").over(w_ord.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )
    return grp.groupBy("user_id", "interval_seq").agg(
        F.min("start_us").alias("merged_start_us"),
        F.max("end_us").alias("merged_end_us"),
        F.count(F.lit(1)).alias("n_merged"),
    )


# -- association rules over per-user event-type baskets -----------------------

_AR_MINSUP = 2  # minimum co-occurring users for a rule


@register(
    "events_association_rules",
    oracle=f"""
    WITH baskets AS (
        SELECT DISTINCT user_id, event_type FROM events
    ), tc AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
        FROM baskets GROUP BY 1
    ), tot AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM baskets
    ), pairs AS (
        SELECT a.event_type AS ant, b.event_type AS cons,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM baskets a JOIN baskets b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT ant, cons, n_both,
           ta.n_t AS n_ant, tb.n_t AS n_cons,
           (1000000 * n_both) // ta.n_t AS conf_ppm,
           (((1000000 * n_both) // ta.n_t) * n_users) // tb.n_t AS lift_ppm
    FROM pairs
    JOIN tc ta ON ta.event_type = pairs.ant
    JOIN tc tb ON tb.event_type = pairs.cons
    CROSS JOIN tot
    WHERE n_both >= {_AR_MINSUP}
    """,
)
def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over per-user event-type baskets:
    support / confidence / lift for every co-occurring type pair, as exact
    scaled integers (ppm) so any engine reproduces the values bit-for-bit.

    lift = conf(A→B) / P(B) is computed in two bounded integer steps
    (conf_ppm ≤ 1e6, then conf_ppm · n_users // n_cons), so no operand
    exceeds 1e6 · n_users — overflow-safe to ~9e12 users, unlike the naive
    1e6·n_both·n_users product which wraps at ~2^31 users (same fix shape
    as llm_domain_mix_resample's r6 threshold rearrangement).

    Scale: baskets = distinct(user,type) is a partial-agg shuffle; the
    pair join is per-user and bounded by the TYPE DOMAIN (tiny), never an
    all-pairs blowup; type counts and the 1-row total broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    # four consumers (type counts, the user total, both self-join sides):
    # dedupe the events scan + distinct to one execution per action (r22).
    baskets = (
        ev.select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    tc = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    tot = baskets.agg(F.countDistinct("user_id").alias("n_users"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ant"),
            F.col("b.event_type").alias("cons"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= _AR_MINSUP)
    )
    ta = tc.select(F.col("event_type").alias("ant"), F.col("n_t").alias("n_ant"))
    tb = tc.select(F.col("event_type").alias("cons"), F.col("n_t").alias("n_cons"))
    conf_sql = "(1000000 * n_both) div n_ant"  # single source for both stats
    return (
        pairs.join(F.broadcast(ta), "ant")
        .join(F.broadcast(tb), "cons")
        .crossJoin(F.broadcast(tot))
        .select(
            "ant",
            "cons",
            "n_both",
            "n_ant",
            "n_cons",
            F.expr(conf_sql).alias("conf_ppm"),
            F.expr(f"(({conf_sql}) * n_users) div n_cons").alias("lift_ppm"),
        )
    )


# -- sequence mining: most frequent event-type trigrams -----------------------

_SEQ_TOPN = 20


@register(
    "events_sequence_trigrams",
    oracle=f"""
    WITH seq AS (
        SELECT event_type AS t1,
               LEAD(event_type, 1) OVER w AS t2,
               LEAD(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, t1, t2, t3
    LIMIT {_SEQ_TOPN}
    """,
)
def sequence_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type trigrams across user timelines — sequential-pattern
    mining's workhorse count. LEAD stays inside the per-user partition
    (one shuffle on user_id), the trigram count is a partial-aggregable
    groupBy over a domain bounded by |types|^3, and the top-N collapses to
    TakeOrderedAndProject. Ties break on the full trigram so the row SET
    is deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        seq.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(_SEQ_TOPN)
    )


# -- cumulative distinct count over time --------------------------------------


@register(
    "events_cumulative_distinct",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_so_far
    FROM flagged
    """,
)
def cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT event_type) per user over time — the window
    SQL forbids (no DISTINCT in a running frame), decomposed exactly:
    first-occurrence flag (row_number over (user,type)) -> running sum of
    flags (window over user). Two hash Exchanges — (user,type) then (user)
    — each holding O(1) window state; no per-row set state exists anywhere,
    the trick that makes "cumulative distinct" feasible at billions of rows
    where a HashSet-per-user UDF (or a collect_list-over-window form, which
    would shuffle once but materialize the running history per row) OOMs.
    """
    ev = load_table(spark, sf_dir, "events")
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_cum).cast("long").alias("n_types_so_far"),
    )


# -- CUSUM change-point detection over daily series ---------------------------


@register(
    "events_cusum_change_point",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ), seq AS (
        SELECT event_type, day, v,
               CAST(ROW_NUMBER() OVER w AS BIGINT)              AS i,
               CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
               CAST(SUM(v) OVER (PARTITION BY event_type) AS BIGINT)   AS tot
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), scored AS (
        SELECT event_type, day, n AS n_days,
               n * cum - i * tot AS s_scaled,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY ABS(n * cum - i * tot) DESC, day
               ) AS rk
        FROM seq
    )
    SELECT event_type,
           CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT)
               AS change_epoch_day,
           s_scaled, n_days
    FROM scored WHERE rk = 1
    """,
)
def cusum_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point per event type: the day where the cumulative
    deviation from the series mean peaks — the standard single-change
    estimator (argmax_i |Σ_{j<=i} (v_j - mean)|).

    Integer-exact trick: multiply through by n so no mean is ever
    materialized — S'_i = n·cum_i − i·total is the deviation CUSUM scaled
    by n, an int64 expression with the same argmax. Daily cents times day
    index keeps every operand far under 2^63 for centuries of data.

    Shape: raw events collapse to a per-(type, day) partial agg first; all
    four windows share the event_type partitioning, so scoring runs inside
    one Exchange over the tiny daily series.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(quantize(F.col("value"), MONEY_SCALE)).alias("v"))
    w_ord = W.partitionBy("event_type").orderBy("day")
    w_all = W.partitionBy("event_type")
    seq = daily.select(
        "event_type",
        "day",
        F.row_number().over(w_ord).cast("long").alias("i"),
        F.sum("v").over(w_ord.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("v").over(w_all).alias("tot"),
    )
    scored = seq.select(
        "event_type",
        "day",
        F.col("n").alias("n_days"),
        (F.col("n") * F.col("cum") - F.col("i") * F.col("tot")).alias("s_scaled"),
    ).withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.abs("s_scaled").desc(), "day")
        ),
    )
    return scored.filter(F.col("rk") == 1).select(
        "event_type",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("change_epoch_day"),
        "s_scaled",
        "n_days",
    )


# -- funnel conversion time: exact median latency without a global sort -------

_CVT_BUCKET_US = 3_600 * 1_000_000  # hourly histogram buckets


@register(
    "events_funnel_conversion_time",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup'
                        THEN epoch_us(ts) END)   AS t_signup,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END)   AS t_purchase
        FROM events GROUP BY 1
    ), deltas AS (
        SELECT t_purchase - t_signup AS delta_us
        FROM firsts
        WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL
          AND t_purchase >= t_signup
    ), agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(MIN(delta_us) AS BIGINT) AS min_us,
               CAST(MAX(delta_us) AS BIGINT) AS max_us
        FROM deltas
    )
    SELECT n_users, min_us, max_us,
           (SELECT delta_us FROM deltas ORDER BY delta_us
            LIMIT 1 OFFSET ((SELECT (n_users + 1) // 2 FROM agg) - 1))
               AS median_us
    FROM agg
    """,
)
def funnel_conversion_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion latency: population size, min/max, and
    the EXACT median (lower median, the k=(n+1) div 2-th order statistic)
    of per-user first-signup→first-purchase deltas.

    The oracle finds the median by sorting; the Spark side never sorts the
    population — deltas land in hourly histogram buckets, cross-bucket
    offsets come from a window over the tiny histogram, and the k-th order
    statistic is the row whose (offset + bucket-local rank) equals k (the
    sketch_quantile_histogram recipe applied to a funnel metric). Integer
    microseconds end to end.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.unix_micros("ts"))
        ).alias("t_signup"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("t_purchase"),
    )
    deltas = firsts.filter(
        F.col("t_signup").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_signup"))
    ).select((F.col("t_purchase") - F.col("t_signup")).alias("delta_us"))
    agg = deltas.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("delta_us").alias("min_us"),
        F.max("delta_us").alias("max_us"),
    )
    b = deltas.withColumn("_b", F.expr(f"delta_us div {_CVT_BUCKET_US}"))
    off = bucket_offsets(b, "_b", {"c": F.lit(1)})
    w_loc = W.partitionBy("_b").orderBy("delta_us")
    ranked = b.join(F.broadcast(off), "_b").withColumn(
        "_rank", F.col("_off_c") + F.row_number().over(w_loc)
    )
    median = (
        ranked.crossJoin(F.broadcast(agg.select("n_users")))
        .filter(F.col("_rank") == F.expr("(n_users + 1) div 2"))
        .select(F.col("delta_us").alias("median_us"))
    )
    # LEFT join (not crossJoin): with zero conversions `median` is empty and
    # a cross join would drop the summary row, while the oracle keeps one
    # row with NULLs — the left join preserves that contract
    return agg.join(F.broadcast(median), F.lit(True), "left").select(
        "n_users", "min_us", "max_us", "median_us"
    )


# -- maximum drawdown of per-user cumulative value — deferred r7 queue --------


@register(
    "events_max_drawdown",
    oracle="""
    WITH s AS (
        SELECT user_id, ts, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ), cums AS (
        SELECT user_id, ts, event_id,
               SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM s
    ), series AS (
        SELECT user_id, cum,
               MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS peak
        FROM cums
    )
    SELECT user_id,
           CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown_cents,
           CAST(MAX(peak) AS BIGINT)       AS peak_cents,
           CAST(COUNT(*) AS BIGINT)        AS n_points
    FROM series GROUP BY user_id
    """
)
def max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user: the largest peak-to-trough drop of the
    cumulative purchase-value series — the canonical "how bad did it get"
    statistic of any running total (portfolio value, credit balance,
    inventory level). Composition of three windows — running sum, running
    max of it, max of the gap — ALL sharing the user_id partitioning, so
    the whole statistic costs one Exchange; a naive argmax-over-pairs
    formulation (max over i<j of cum_i - cum_j) is O(n^2) per user and
    never needed. Integer cents end to end.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", quantize(F.col("value"), MONEY_SCALE).alias("v")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    series = s.withColumn("cum", F.sum("v").over(w)).withColumn(
        "peak", F.max("cum").over(w)
    )
    return series.groupBy("user_id").agg(
        F.max(F.col("peak") - F.col("cum")).cast("long").alias("max_drawdown_cents"),
        F.max("peak").cast("long").alias("peak_cents"),
        F.count(F.lit(1)).alias("n_points"),
    )


# -- day-of-week seasonality index — deferred r7 queue ------------------------


@register(
    "events_seasonality_index",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ), dows AS (
        SELECT event_type,
               CAST(dayofweek(day) + 1 AS BIGINT) AS dow,
               CAST(SUM(v) AS BIGINT)         AS sum_dow,
               CAST(COUNT(*) AS BIGINT)       AS n_dow
        FROM daily GROUP BY 1, 2
    ), tot AS (
        SELECT event_type,
               CAST(SUM(sum_dow) AS BIGINT) AS total,
               CAST(SUM(n_dow) AS BIGINT)   AS n_all
        FROM dows GROUP BY 1
    )
    SELECT d.event_type, d.dow, d.n_dow, d.sum_dow,
           (((1000000 * d.sum_dow) // d.n_dow) * t.n_all) // t.total
               AS index_ppm
    FROM dows d JOIN tot t USING (event_type)
    """,
)
def seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: mean daily revenue on
    each weekday relative to the type's overall daily mean, 1e6 = average
    day — the classic seasonal profile a forecaster divides out before
    trend fitting (and the structure the runs test flags as non-random).

    Integer discipline: index = (mean_dow / mean_all) in exact ppm via
    the two-step bounded form ((1e6·sum_dow) div n_dow · n_all) div
    total — same overflow rearrangement as events_association_rules'
    lift: the first div caps the intermediate at 1e6·max-daily-cents, so
    the second product is bounded by day COUNTS, not money. Weekday
    numbering is the classic cross-engine trap made explicit: Spark's
    dayofweek is 1-based Sunday, DuckDB's 0-based Sunday — the oracle
    carries the +1 shift, and the hash gate pins it (it failed loudly
    without it).

    Shape: two nested partial-aggregable groupBys (day, then dow) and a
    broadcast of the |types|-row totals.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(quantize(F.col("value"), MONEY_SCALE)).alias("v"))
    dows = daily.groupBy(
        "event_type", F.dayofweek("day").cast("long").alias("dow")
    ).agg(
        F.sum("v").alias("sum_dow"), F.count(F.lit(1)).alias("n_dow")
    )
    tot = dows.groupBy("event_type").agg(
        F.sum("sum_dow").alias("total"), F.sum("n_dow").alias("n_all")
    )
    return dows.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "dow",
        "n_dow",
        "sum_dow",
        F.expr(
            "(((1000000 * sum_dow) div n_dow) * n_all) div total"
        ).alias("index_ppm"),
    )


# -- cohort lifetime value curves — deferred r7 queue -------------------------


@register(
    "events_cohort_ltv",
    oracle="""
    WITH p AS (
        SELECT user_id,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
                    AS BIGINT) AS ym,
               CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ), cohorts AS (
        SELECT user_id, MIN(ym) AS cym FROM p GROUP BY 1
    ), csize AS (
        SELECT cym, CAST(COUNT(*) AS BIGINT) AS cohort_users
        FROM cohorts GROUP BY 1
    ), monthly AS (
        SELECT c.cym, p.ym, CAST(SUM(p.v) AS BIGINT) AS rev
        FROM p JOIN cohorts c USING (user_id)
        GROUP BY 1, 2
    ), maxym AS (SELECT MAX(ym) AS mx FROM p),
    grid AS (
        SELECT s.cym, g.ym
        FROM csize s CROSS JOIN maxym, UNNEST(generate_series(s.cym, mx)) AS g(ym)
    ), filled AS (
        SELECT g.cym, g.ym, COALESCE(m.rev, 0) AS rev
        FROM grid g LEFT JOIN monthly m ON m.cym = g.cym AND m.ym = g.ym
    ), cum AS (
        SELECT cym, ym,
               CAST(SUM(rev) OVER (PARTITION BY cym ORDER BY ym
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_cents
        FROM filled
    )
    SELECT c.cym AS cohort_week,
           CAST(c.ym - c.cym AS BIGINT) AS weeks_since,
           s.cohort_users,
           c.cum_cents,
           c.cum_cents // s.cohort_users AS ltv_cents
    FROM cum c JOIN csize s USING (cym)
    """,
)
def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: for each signup cohort (epoch WEEK
    of first purchase — the fixture spans one calendar month, so monthly
    cohorts would collapse to a single degenerate row; weekly matches
    events_cohort_retention's choice) and every week since, the cohort's
    cumulative revenue and per-user LTV in exact integer cents — the
    curve a growth team reads "week-3 LTV by cohort" off; the
    revenue-weighted sibling of cohort retention (which counts heads).

    Dense week grid (cohort → global max, sequence+explode like the gap
    fill) so weeks without purchases still carry the running value — LTV
    curves must be flat through quiet weeks, not absent. Cumsum per
    cohort is a |cohorts·weeks|-scale window, partitioned by cohort;
    per-user data collapses to (cohort, week) partials before any
    window. LTV division is integer: cum div cohort_users.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') div 7"
            " AS BIGINT)"
        ).alias("ym"),
        quantize(F.col("value"), MONEY_SCALE).alias("v"),
        # r21 session 2 (guide §2.4): p feeds cohorts, monthly and maxym
        # (3 scans of events before), cohorts feeds csize and monthly —
        # all re-executed with zero runtime exchange reuse. Lazy
        # checkpoints materialize each once inside the first action
        # (|purchases| and |users| rows). Interleaved A/B at sf0.1,
        # results asserted identical: steady 0.373 → 0.153 s, cold
        # 0.426 → 0.148 s.
    ).localCheckpoint(eager=False)
    cohorts = (
        p.groupBy("user_id").agg(F.min("ym").alias("cym"))
        .localCheckpoint(eager=False)
    )
    csize = cohorts.groupBy("cym").agg(F.count(F.lit(1)).alias("cohort_users"))
    monthly = (
        p.join(cohorts, "user_id")
        .groupBy("cym", "ym")
        .agg(F.sum("v").alias("rev"))
    )
    maxym = p.agg(F.max("ym").alias("mx"))
    grid = (
        csize.select("cym")
        .crossJoin(F.broadcast(maxym))
        .select("cym", F.explode(F.sequence("cym", "mx")).alias("ym"))
    )
    filled = grid.join(monthly, ["cym", "ym"], "left").fillna({"rev": 0})
    w = (
        W.partitionBy("cym")
        .orderBy("ym")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = filled.select(
        "cym", "ym", F.sum("rev").over(w).cast("long").alias("cum_cents")
    )
    return cum.join(F.broadcast(csize), "cym").select(
        F.col("cym").alias("cohort_week"),
        (F.col("ym") - F.col("cym")).cast("long").alias("weeks_since"),
        "cohort_users",
        "cum_cents",
        F.expr("cum_cents div cohort_users").alias("ltv_cents"),
    )


# -- peak concurrency (sweep line) — deferred r7 queue ------------------------


@register(
    "events_peak_concurrency",
    oracle=f"""
    WITH iv AS (
        SELECT event_type, event_id,
               epoch_us(ts) AS s,
               epoch_us(ts) + (1 + event_id % {_IVL_DUR_CHOICES})
                              * 60 * 1000000 AS e
        FROM events
    ), bounds AS (
        SELECT event_type, s AS t, 1 AS delta, event_id FROM iv
        UNION ALL
        SELECT event_type, e AS t, -1 AS delta, event_id FROM iv
    ), swept AS (
        SELECT event_type, t,
               CAST(SUM(delta) OVER (
                   PARTITION BY event_type ORDER BY t, delta, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        FROM bounds
    ), peaks AS (
        SELECT event_type, CAST(MAX(run) AS BIGINT) AS peak
        FROM swept GROUP BY 1
    )
    SELECT p.event_type, p.peak,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM iv
            WHERE iv.event_type = p.event_type)      AS n_intervals,
           (SELECT MIN(t) FROM swept
            WHERE swept.event_type = p.event_type
              AND swept.run = p.peak)                AS first_peak_us
    FROM peaks p
    """
)
def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type: the sweep-line maximum of
    simultaneously-open intervals (the synthetic [ts, ts + 1..50 min)
    spans shared with events_interval_merge) plus WHEN it first happens —
    the capacity-planning number ("how many sessions were open at the
    worst moment") that interval merging cannot answer.

    Sweep line relationally: every interval contributes a +1 at its start
    and a −1 at its end; a running sum over boundaries ordered by
    (t, delta, event_id) — ends sort before starts at the same instant,
    so half-open [s, e) semantics hold and touching intervals never
    double-count — peaks exactly at the answer. One type-keyed Exchange
    carries the window, the peak, and the argmin of the first peak
    moment. Integer microseconds throughout.
    """
    ev = load_table(spark, sf_dir, "events")
    dur_us = (1 + F.col("event_id") % _IVL_DUR_CHOICES) * 60 * 1_000_000
    iv = ev.select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + dur_us).alias("e"),
    )
    bounds = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionByName(
        iv.select(
            "event_type",
            F.col("e").alias("t"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    swept = bounds.select(
        "event_type", "t", F.sum("delta").over(w).cast("long").alias("run")
    )
    peaks = swept.groupBy("event_type").agg(F.max("run").alias("peak"))
    n_iv = iv.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_intervals"))
    first = (
        swept.join(F.broadcast(peaks), "event_type")
        .filter(F.col("run") == F.col("peak"))
        .groupBy("event_type")
        .agg(F.min("t").alias("first_peak_us"))
    )
    return (
        peaks.join(F.broadcast(n_iv), "event_type")
        .join(F.broadcast(first), "event_type")
        .select("event_type", "peak", "n_intervals", "first_peak_us")
    )


# -- Markov stationary distribution — deferred r7 queue -----------------------

_MK_SCALE = 1_000_000
_MK_ITERS = 8


def _markov_oracle() -> str:
    """Unrolled power iteration over the transition counts (aggregation in
    a recursive leg is restricted — same constraint as PageRank)."""
    parts = [
        """
    WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ), trans AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
    ), rt AS (
        SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total
        FROM trans GROUP BY 1
    ),"""
        + f"""
    pi0 AS (
        SELECT from_type AS t, CAST({_MK_SCALE} AS BIGINT) AS p FROM rt
    )"""
    ]
    for k in range(_MK_ITERS):
        parts.append(
            f""",
    pi{k + 1} AS (
        SELECT tr.to_type AS t,
               CAST(SUM((p.p * tr.n) // r.row_total) AS BIGINT) AS p
        FROM trans tr
        JOIN pi{k} p ON p.t = tr.from_type
        JOIN rt r ON r.from_type = tr.from_type
        GROUP BY tr.to_type
    )"""
        )
    parts.append(f"""
    SELECT t AS event_type, p AS stationary_u FROM pi{_MK_ITERS}""")
    return "".join(parts)


@register("events_markov_stationary", oracle=_markov_oracle())
def markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the clickstream Markov chain — where the
    transition matrix (events_transition_matrix) says a random session
    spends its time in the long run: {_MK_ITERS} unrolled power-iteration
    rounds π_(k+1)(j) = Σ_i (π_k(i)·n_ij) div rowtotal_i in fixed-point
    BIGINT (scale {_MK_SCALE}), the PageRank recipe applied to the event
    chain (PageRank is this plus teleport). Truncation loses <|types|
    units of mass per round — deterministic and identical on both engines,
    which is the point: no IEEE summation order exists to diverge.

    Shape: the chain lives on the tiny |types|² transition relation —
    after ONE user-keyed LEAD shuffle, every round is a keyed join +
    grouped sum over at most |types|² rows.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    rt = trans.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    contrib = trans.join(rt, "from_type").localCheckpoint(eager=True)
    pi = rt.select(
        F.col("from_type").alias("t"), F.lit(_MK_SCALE).cast("long").alias("p")
    )
    for _ in range(_MK_ITERS):
        pi = (
            contrib.join(pi, contrib["from_type"] == pi["t"])
            .groupBy("to_type")
            .agg(F.expr("CAST(sum((p * n) div row_total) AS BIGINT)").alias("p"))
            .withColumnRenamed("to_type", "t")
            .localCheckpoint(eager=True)
        )
    return pi.select(F.col("t").alias("event_type"), F.col("p").alias("stationary_u"))


# -- seasonal-naive forecast backtest — deferred r7 queue ---------------------

_BT_TRAIN_DAYS = 23  # first 23 days train, remaining days test


@register(
    "events_backtest_seasonal_naive",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d,
               CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2, 3
    ), cut AS (
        SELECT MIN(d) + {_BT_TRAIN_DAYS} AS split_d FROM daily
    ), model AS (
        SELECT event_type, dow,
               CAST(SUM(v) // COUNT(*) AS BIGINT) AS forecast_cents
        FROM daily CROSS JOIN cut WHERE d < split_d
        GROUP BY 1, 2
    )
    SELECT t.event_type, t.d AS epoch_day,
           t.v AS actual_cents,
           m.forecast_cents,
           ABS(t.v - m.forecast_cents) AS abs_err_cents
    FROM daily t
    CROSS JOIN cut
    JOIN model m ON m.event_type = t.event_type AND m.dow = t.dow
    WHERE t.d >= cut.split_d
    """,
)
def backtest_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest with a temporal train/test split: the
    seasonal-naive model (per-(type, weekday) mean of the TRAIN days
    only) scored against the held-out final week, per test day —
    the honest-evaluation shape every forecasting pipeline needs, where
    a random split would leak the future into the model (the temporal
    discipline join_scd2_point_in_time applies to lookups, applied to
    model fitting). Consumes the seasonality the index query
    (events_seasonality_index) measures.

    Integer discipline: the model is an integer mean (sum div count of
    train cents); errors are exact |actual − forecast|. The split day is
    min(day)+{_BT_TRAIN_DAYS}, a 1-row broadcast. Shape: per-(type, day)
    partial agg, a |types·7|-row model broadcast-joined to the test days.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
        F.dayofweek(F.col("ts").cast("date")).cast("long").alias("dow"),
    ).agg(F.sum(quantize(F.col("value"), MONEY_SCALE)).alias("v"))
    cut = daily.agg((F.min("d") + _BT_TRAIN_DAYS).alias("split_d"))
    with_cut = daily.crossJoin(F.broadcast(cut))
    model = (
        with_cut.filter(F.col("d") < F.col("split_d"))
        .groupBy("event_type", "dow")
        .agg(F.expr("CAST(sum(v) div count(*) AS BIGINT)").alias("forecast_cents"))
    )
    return (
        with_cut.filter(F.col("d") >= F.col("split_d"))
        .join(F.broadcast(model), ["event_type", "dow"])
        .select(
            "event_type",
            F.col("d").alias("epoch_day"),
            F.col("v").alias("actual_cents"),
            "forecast_cents",
            F.abs(F.col("v") - F.col("forecast_cents")).alias("abs_err_cents"),
        )
    )


# -- DAU/WAU stickiness — deferred r7 queue -----------------------------------


@register(
    "events_dau_wau_stickiness",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d
        FROM events
    ), days AS (SELECT DISTINCT d FROM ud),
    dau AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1
    ),
    wau AS (
        SELECT days.d, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
        FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
        GROUP BY 1
    )
    SELECT dau.d AS epoch_day, dau.dau, wau.wau,
           (1000000 * dau.dau) // wau.wau AS stickiness_ppm
    FROM dau JOIN wau ON wau.d = dau.d
    """
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — daily actives over trailing-7-day
    actives, the growth metric every product dashboard leads with, as
    exact integer ppm. The subtlety is that WAU is a DISTINCT count over
    a SLIDING window, which no window frame can express (distinct doesn't
    decompose over frames): the standard exact form is the one here —
    dedupe to (user, day), then a 7-day band join from each day to its
    trailing user-days and a distinct count per day.

    Scale shape: the band join's left side is |days| (tiny) and the right
    side is user-days (already deduped), so the join fans each user-day
    into at most 7 day-buckets — linear with constant 7, shuffled on the
    day key; the distinct count is partial-aggregable. For month windows
    at extreme scale the bitmap-word or HLL forms (agg_bitmap_distinct,
    stream_windowed_hll_distinct) are the documented swaps.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("d"),
        )
        .distinct()
        # three consumers (days, dau, the WAU band join) × zero runtime
        # exchange reuse = the events scan + distinct executed three times
        # per action; the user-day relation is deduped narrow metadata.
        .localCheckpoint(eager=False)
    )
    days = ud.select("d").distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        days.alias("days")
        .join(
            ud.alias("ud"),
            F.col("ud.d").between(F.col("days.d") - 6, F.col("days.d")),
        )
        .groupBy(F.col("days.d").alias("d"))
        .agg(F.countDistinct("ud.user_id").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.col("d").alias("epoch_day"),
            "dau",
            "wau",
            F.expr("(1000000 * dau) div wau").alias("stickiness_ppm"),
        )
    )


# -- Kaplan–Meier ingredients table — deferred queue --------------------------


@register(
    "events_survival_table",
    oracle="""
    WITH lifespans AS (
        SELECT user_id,
               CAST(MAX(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)))
                    AS BIGINT) AS last_day
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM lifespans
    ), deaths AS (
        SELECT last_day AS d, CAST(COUNT(*) AS BIGINT) AS d_events
        FROM lifespans GROUP BY 1
    ), risk AS (
        SELECT d, d_events,
               CAST(SUM(d_events) OVER (ORDER BY d DESC
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS n_at_risk
        FROM deaths
    )
    SELECT r.d AS epoch_day, r.n_at_risk, r.d_events,
           (1000000 * (r.n_at_risk - r.d_events)) // r.n_at_risk
               AS step_survival_ppm
    FROM risk r
    """
)
def survival_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier ingredients per event day: users "die" on their last
    observed activity day; each distinct death day carries the at-risk
    count (everyone surviving INTO the day — a DESCENDING cumulative sum
    of deaths), the deaths, and the per-step survival factor
    (n−d)/n in exact ppm. The cumulative product S(t) = Π steps is a
    sequential recurrence no window expresses — deliberately left to the
    consumer (multiply the handful of emitted steps), which is also how
    survival tables are published; everything DISTRIBUTED here is exact
    relational algebra.

    Shape: per-user max (partial agg) → per-day death counts (|days|
    rows) → one descending cumsum over that tiny frame. Churn/retention
    analysis at any scale collapses to the same |days|-sized table.
    """
    ev = load_table(spark, sf_dir, "events")
    lifespans = ev.groupBy("user_id").agg(
        F.max(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        )
        .cast("long")
        .alias("last_day")
    )
    deaths = lifespans.groupBy(F.col("last_day").alias("d")).agg(
        F.count(F.lit(1)).alias("d_events")
    )
    w = W.orderBy(F.desc("d")).rowsBetween(W.unboundedPreceding, 0)
    risk = deaths.withColumn(
        "n_at_risk", F.sum("d_events").over(w).cast("long")
    )
    return risk.select(
        F.col("d").alias("epoch_day"),
        "n_at_risk",
        "d_events",
        F.expr("(1000000 * (n_at_risk - d_events)) div n_at_risk").alias(
            "step_survival_ppm"
        ),
    )


# -- top conversion paths — deferred queue ------------------------------------

_PATH_MAX_STEPS = 5
_PATH_TOPN = 15


@register(
    "events_conversion_paths",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ), first_conv AS (
        SELECT user_id, MIN(rn) AS conv_rn
        FROM seq WHERE event_type = 'purchase' GROUP BY 1
    ), prefix AS (
        SELECT s.user_id, s.event_type, s.rn
        FROM seq s JOIN first_conv f
          ON f.user_id = s.user_id AND s.rn <= f.conv_rn
        WHERE s.rn > f.conv_rn - {_PATH_MAX_STEPS}
    ), paths AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM prefix GROUP BY 1
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths GROUP BY 1
    ORDER BY n_users DESC, path
    LIMIT {_PATH_TOPN}
    """,
)
def conversion_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top paths to conversion: for every converting user, the ordered
    event-type sequence of the last {_PATH_MAX_STEPS} steps ENDING at the
    first purchase, counted across users — the "which journeys convert"
    view funnels flatten away (a funnel fixes the step order; paths
    discover it). The window cap bounds the path string, so no per-user
    state grows with history — the same bounded-prefix discipline as the
    inverted index's postings.

    Shape: one user-keyed rank window, a self-bounded prefix join,
    ordered string aggregation inside the user partition, then a
    path-keyed count and heap top-N.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    first_conv = (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("conv_rn"))
    )
    prefix = seq.join(first_conv, "user_id").filter(
        (F.col("rn") <= F.col("conv_rn"))
        & (F.col("rn") > F.col("conv_rn") - _PATH_MAX_STEPS)
    )
    paths = prefix.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(_PATH_TOPN)
    )
conversion_paths.__doc__ = conversion_paths.__doc__.format(_PATH_MAX_STEPS=_PATH_MAX_STEPS)  # real docstring (ADVICE r7)


# -- burst detection: rate spikes vs the trailing baseline --------------------

_BURST_W = 7  # trailing baseline length in observed days
_BURST_NUM, _BURST_DEN = 5, 4  # burst when rate > 1.25x the trailing mean
# (the fixture's Poisson-flat day counts top out ~1.42x at sf0.01, so a 2x
# gate would pass vacuously there; 1.25x sits inside the upper tail at
# BOTH fixture SFs — real deployments tune this like any alert threshold)


@register(
    "events_burst_detection",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), base AS (
        SELECT event_type, day, n,
               CAST(COALESCE(SUM(n) OVER w, 0) AS BIGINT) AS trailing_sum,
               CAST(COUNT(*) OVER w AS BIGINT)            AS prior_days
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN {_BURST_W} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT)
               AS epoch_day,
           n, trailing_sum, prior_days,
           CAST(prior_days > 0 AND
                n * prior_days * {_BURST_DEN} > {_BURST_NUM} * trailing_sum
                AS BOOLEAN) AS is_burst
    FROM base
    """,
)
def burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-burst detection: a (type, day) is a burst when its event count
    exceeds {_BURST_NUM}/{_BURST_DEN}x the mean of the trailing {_BURST_W} observed
    days — the alerting primitive behind ops dashboards and abuse
    detection, in the integer-exact form: the mean is never materialized
    (n > k * trailing_sum / prior_days becomes
    n * prior_days > k * trailing_sum, all int64). Days 1..{_BURST_W}
    compare against however many prior days exist; day 1 (no baseline)
    can never be a burst — the honest cold-start convention, identical in
    both engines because the trailing frame is over OBSERVED rows.

    Shape: raw events collapse to the per-(type, day) partial agg first;
    the trailing frame is one in-partition window over that tiny series —
    at 100 TB this is one scan plus O(types x days) window work, the same
    discipline as the CUSUM/z-score detectors beside it."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_BURST_W, -1)
    )
    base = daily.select(
        "event_type",
        "day",
        "n",
        F.coalesce(F.sum("n").over(w), F.lit(0))
        .cast("long")
        .alias("trailing_sum"),
        F.count(F.lit(1)).over(w).cast("long").alias("prior_days"),
    )
    return base.select(
        "event_type",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("epoch_day"),
        "n",
        "trailing_sum",
        "prior_days",
        (
            (F.col("prior_days") > 0)
            & (
                F.col("n") * F.col("prior_days") * _BURST_DEN
                > _BURST_NUM * F.col("trailing_sum")
            )
        ).alias("is_burst"),
    )
burst_detection.__doc__ = burst_detection.__doc__.format(_BURST_NUM=_BURST_NUM, _BURST_DEN=_BURST_DEN, _BURST_W=_BURST_W)  # real docstring (ADVICE r7)


# -- robust anomaly detection: MAD fences instead of moments ------------------

_RA_K = 3  # flag days beyond 3 MADs from the median


@register(
    "events_anomaly_robust",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ), med AS (
        SELECT event_type, v AS med_v FROM (
            SELECT event_type, v,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM daily
        ) WHERE rk = (n + 1) // 2
    ), dev AS (
        SELECT d.event_type, d.day, d.v, m.med_v,
               ABS(d.v - m.med_v) AS ad
        FROM daily d JOIN med m ON m.event_type = d.event_type
    ), mad AS (
        SELECT event_type, ad AS mad_v FROM (
            SELECT event_type, ad,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM dev
        ) WHERE rk = (n + 1) // 2
    )
    SELECT d.event_type,
           CAST(datediff('day', DATE '1970-01-01', d.day) AS BIGINT)
               AS epoch_day,
           d.v AS v_cents, d.med_v AS med_cents,
           CAST(m.mad_v AS BIGINT) AS mad_cents,
           CAST(d.ad > {_RA_K} * m.mad_v AS BOOLEAN) AS is_anomaly
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    """,
)
def anomaly_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly flags over daily revenue: |v - median| > {_RA_K} *
    MAD per event type — the breakdown-resistant twin of
    events_anomaly_zscore: ONE wild day inflates a z-score's mean AND its
    sigma (masking itself and flagging normal days); the median/MAD
    fences move only when half the days move, which is why monitoring
    playbooks pair both detectors. Entirely integer: daily cents, lower
    medians as order statistics, and the fence compare ad > k*MAD — no
    moment, no sqrt, no float anywhere.

    Shape: the raw scan collapses to the per-(type, day) relation first
    (calendar-bounded: |types| x |days| rows); medians are rank picks
    inside type partitions of that tiny frame — the windows never touch
    event-sized data. The same two-chained-order-statistics recipe as
    agg_median_abs_deviation, applied per group and joined back."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(quantize(F.col("value"), MONEY_SCALE)).alias("v"))
    w_rk = W.partitionBy("event_type").orderBy("v")
    w_n = W.partitionBy("event_type")
    med = (
        daily.select(
            "event_type",
            "v",
            F.row_number().over(w_rk).alias("rk"),
            F.count(F.lit(1)).over(w_n).alias("n"),
        )
        .filter(F.col("rk") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("v").alias("med_v"))
    )
    dev = daily.join(med, "event_type").select(
        "event_type",
        "day",
        "v",
        "med_v",
        F.abs(F.col("v") - F.col("med_v")).alias("ad"),
    )
    w_rk2 = W.partitionBy("event_type").orderBy("ad")
    mad = (
        dev.select(
            "event_type",
            "ad",
            F.row_number().over(w_rk2).alias("rk"),
            F.count(F.lit(1)).over(w_n).alias("n"),
        )
        .filter(F.col("rk") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("ad").alias("mad_v"))
    )
    return dev.join(mad, "event_type").select(
        "event_type",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("epoch_day"),
        F.col("v").alias("v_cents"),
        F.col("med_v").alias("med_cents"),
        F.col("mad_v").cast("long").alias("mad_cents"),
        (F.col("ad") > _RA_K * F.col("mad_v")).alias("is_anomaly"),
    )
anomaly_robust.__doc__ = anomaly_robust.__doc__.format(_RA_K=_RA_K)  # real docstring (ADVICE r7)


# -- recency-decayed engagement: the log-free half-life score -----------------

_DE_HALF_LIFE_DAYS = 7
_DE_SCALE = 1_048_576  # 2^20: weights are SCALE >> halvings, exact powers of 2


@register(
    "events_decayed_engagement",
    oracle=f"""
    WITH mx AS (
        SELECT MAX(CAST(ts AS DATE)) AS as_of FROM events
    ), scored AS (
        SELECT user_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               datediff('day', CAST(ts AS DATE), (SELECT as_of FROM mx))
                   // {_DE_HALF_LIFE_DAYS} AS halvings
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS raw_cents,
           CAST(SUM(cents * ({_DE_SCALE}::BIGINT >> LEAST(halvings, 62)))
                // {_DE_SCALE} AS BIGINT) AS decayed_cents
    FROM scored GROUP BY user_id
    """,
)
def decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed engagement score with a 7-day
    half-life — the ranking signal behind "active customer" lists, made
    EXACTLY computable: instead of the float pow(2, -age/h) that no hash
    gate could pin, age quantizes to whole half-lives and the weight is a
    RIGHT SHIFT of a power-of-two scale (2^20 >> halvings) — exact
    integers end to end, one final integer division, and the decay
    semantics every scoring consumer actually wants (stepwise half-life
    decay is how production decay scores are usually bucketed anyway,
    because smooth decay re-scores every row every day). The as-of
    instant is the data's max date, so the fixture stays deterministic;
    shifts clamp at 62 so ancient events weight to zero without
    undefined-shift hazards.

    Shape: one scan, map-side weight, one partial-aggregable groupBy —
    the raw and decayed totals ride the same aggregate, so the
    comparison column costs nothing extra."""
    ev = load_table(spark, sf_dir, "events")
    as_of = ev.agg(F.max(F.col("ts").cast("date")).alias("as_of"))
    scored = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(as_of))
        .select(
            "user_id",
            quantize(F.col("value"), MONEY_SCALE).alias("cents"),
            F.expr(
                "datediff(as_of, CAST(ts AS DATE))"
                f" div {_DE_HALF_LIFE_DAYS}"
            ).alias("halvings"),
        )
    )
    return scored.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum("cents").cast("long").alias("raw_cents"),
        # shiftright needs an explicitly-BIGINT base: an INT literal masks
        # the shift count mod 32 (Java semantics), so halvings in [32, 62]
        # would yield large bogus weights instead of 0 (review r7 #2 —
        # latent until the fixture spans > ~224 days)
        F.expr(
            f"CAST(SUM(cents * shiftright(CAST({_DE_SCALE} AS BIGINT),"
            " CAST(LEAST(halvings, 62) AS INT)))"
            f" div {_DE_SCALE} AS BIGINT)"
        ).alias("decayed_cents"),
    )


# -- inter-arrival histogram: the sessionization-threshold evidence -----------


@register(
    "events_interarrival_histogram",
    oracle="""
    WITH seq AS (
        SELECT event_type, user_id, ts,
               LAG(ts) OVER (PARTITION BY event_type, user_id
                             ORDER BY ts, value) AS prev_ts
        FROM events
    ), gaps AS (
        SELECT event_type,
               epoch_us(ts) // 1000000 - epoch_us(prev_ts) // 1000000 AS gap_s
        FROM seq WHERE prev_ts IS NOT NULL
    )
    SELECT event_type,
           CAST(CASE WHEN gap_s <= 0 THEN 0
                     ELSE length(bin(gap_s)) END AS BIGINT) AS gap_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_gaps
    FROM gaps GROUP BY 1, 2
    """,
)
def interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival gap histogram on power-of-two second
    buckets — the EVIDENCE behind a sessionization threshold: the
    session-gap constant every pipeline hardcodes (events_sessionize's
    30 min) should come from the valley of exactly this bimodal
    distribution (within-session seconds vs between-session hours).
    Buckets via length(bin(gap)) = floor(log2)+1 — the pow2-histogram
    trick, zero floats (float log2 flips at boundaries); the LAG
    tie-break on (ts, value) makes same-instant event order
    deterministic, so gap values are engine-identical.

    Shape: one user-keyed window for LAG (the sessionize Exchange), then
    a partial-aggregable count on the ~60-bucket domain — the histogram
    adds nothing to sessionization's own cost."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type", "user_id").orderBy("ts", "value")
    seq = ev.select(
        "event_type", "ts", F.lag("ts").over(w).alias("prev_ts")
    ).filter(F.col("prev_ts").isNotNull())
    gaps = seq.select(
        "event_type",
        (
            F.expr("unix_micros(ts) div 1000000")
            - F.expr("unix_micros(prev_ts) div 1000000")
        ).alias("gap_s"),
    )
    return gaps.groupBy(
        "event_type",
        F.expr(
            "CAST(CASE WHEN gap_s <= 0 THEN 0"
            " ELSE length(bin(gap_s)) END AS BIGINT)"
        ).alias("gap_bucket"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_gaps"))


# -- weekly cohort retention + growth accounting ------------------------------
#
# Both read the distinct (user, week) activity relation: week = epoch-day
# div 7 (a pure integer truncation, identical cross-engine — no ISO-week
# locale semantics to disagree on). The relation is |users| x |weeks
# active| — the per-user collapse happens FIRST (partial agg), so the
# window/lag machinery below runs on user-week grain, never event grain.

_UW_SQL = """
    uw AS (
        SELECT DISTINCT user_id,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) // 7 AS w
        FROM events
    )"""


def _user_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)"
            " div 7"
        ).alias("w"),
    ).distinct()


@register(
    "events_retention_triangle",
    oracle=f"""
    WITH {_UW_SQL},
    cohort AS (
        SELECT user_id, MIN(w) AS cw FROM uw GROUP BY 1
    ), sizes AS (
        SELECT cw, CAST(COUNT(*) AS BIGINT) AS n_cohort FROM cohort GROUP BY 1
    )
    SELECT c.cw AS cohort_week,
           CAST(u.w - c.cw AS BIGINT) AS offset_weeks,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(MAX(s.n_cohort) AS BIGINT) AS n_cohort,
           CAST((1000000 * COUNT(*)) // MAX(s.n_cohort) AS BIGINT)
               AS retention_ppm
    FROM uw u
    JOIN cohort c ON c.user_id = u.user_id
    JOIN sizes s ON s.cw = c.cw
    GROUP BY 1, 2
    """,
)
def retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekly cohort retention triangle: users grouped by their FIRST
    active week, each later week's active share of that cohort in exact
    ppm — the canonical "are newer cohorts stickier" product-analytics
    table (read along a row: one cohort's decay curve; down a diagonal:
    one calendar week across cohorts).

    Shape: cohort assignment is a per-user MIN (partial-aggregable), the
    cohort-size relation is |cohorts|-sized and broadcastable, and the
    triangle itself is one groupBy over the user-week relation — no
    window, no self-join, three bounded exchanges at any event volume.
    """
    # uw feeds the cohort build AND the triangle join, cohort feeds the
    # size rollup AND the same join — with zero runtime exchange reuse
    # (r21 survey) the events scan + distinct executed twice and the
    # cohort aggregate twice per action. Both relations are narrow
    # metadata (user-week pairs; one row per user).
    uw = _user_weeks(spark, sf_dir).localCheckpoint(eager=False)
    cohort = (
        uw.groupBy("user_id")
        .agg(F.min("w").alias("cw"))
        .localCheckpoint(eager=False)
    )
    sizes = cohort.groupBy("cw").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    return (
        uw.join(cohort, "user_id")
        .join(F.broadcast(sizes), "cw")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.col("w") - F.col("cw")).cast("long").alias("offset_weeks"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.max("n_cohort").cast("long").alias("n_cohort"),
            F.expr("CAST((1000000 * COUNT(*)) div MAX(n_cohort) AS BIGINT)")
            .alias("retention_ppm"),
        )
    )


@register(
    "events_growth_accounting",
    oracle=f"""
    WITH {_UW_SQL},
    flagged AS (
        SELECT user_id, w,
               LAG(w)  OVER (PARTITION BY user_id ORDER BY w) AS pw,
               LEAD(w) OVER (PARTITION BY user_id ORDER BY w) AS nw,
               MIN(w)  OVER (PARTITION BY user_id) AS fw
        FROM uw
    ), active_side AS (
        SELECT w AS week,
               CAST(SUM(CASE WHEN w = fw THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_new,
               CAST(SUM(CASE WHEN pw = w - 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_retained,
               CAST(SUM(CASE WHEN pw IS NOT NULL AND pw < w - 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        FROM flagged GROUP BY 1
    ), churn_side AS (
        SELECT w + 1 AS week, CAST(COUNT(*) AS BIGINT) AS n_churned
        FROM flagged WHERE nw IS NULL OR nw > w + 1
        GROUP BY 1
    )
    SELECT COALESCE(a.week, c.week) AS week,
           COALESCE(a.n_new, 0) AS n_new,
           COALESCE(a.n_retained, 0) AS n_retained,
           COALESCE(a.n_resurrected, 0) AS n_resurrected,
           COALESCE(c.n_churned, 0) AS n_churned
    FROM active_side a FULL OUTER JOIN churn_side c ON a.week = c.week
    """,
)
def growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: every active user classified as NEW
    (first-ever week), RETAINED (also active the week before) or
    RESURRECTED (returning after a gap), plus the week's CHURN (users
    active at w-1 with no activity at w) — the active(w) = new +
    retained + resurrected and active(w) = active(w-1) - churned(w) +
    new + resurrected identities growth dashboards are built on.

    Churn attribution is relational and window-end-honest: a user churns
    at w+1 exactly when their activity-week sequence has no w+1 entry
    (LEAD gap or sequence end), so the final observed week's actives
    produce a churn row one week past the data window — consumers trim
    it, the identity above still holds for every interior week.

    Shape: LAG/LEAD/MIN windows over the user-week relation partitioned
    by user (one shuffle, per-user state stays in its partition), then
    two week-grain aggregates joined on the |weeks|-sized spine.
    """
    uw = _user_weeks(spark, sf_dir)
    wu = W.partitionBy("user_id").orderBy("w")
    flagged = uw.select(
        "user_id",
        "w",
        F.lag("w").over(wu).alias("pw"),
        F.lead("w").over(wu).alias("nw"),
        F.min("w").over(W.partitionBy("user_id")).alias("fw"),
    )
    active_side = flagged.groupBy(F.col("w").alias("week")).agg(
        F.sum(F.when(F.col("w") == F.col("fw"), 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("pw") == F.col("w") - 1, 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("pw").isNotNull() & (F.col("pw") < F.col("w") - 1), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_resurrected"),
    )
    churn_side = (
        flagged.filter(F.col("nw").isNull() | (F.col("nw") > F.col("w") + 1))
        .groupBy((F.col("w") + 1).alias("week"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    return (
        active_side.join(churn_side, "week", "full_outer")
        .select(
            "week",
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).cast("long").alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0))
            .cast("long")
            .alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
        )
    )

# -- power-user concentration (Lorenz curve) ----------------------------------


@register(
    "events_lorenz_curve",
    oracle="""
    WITH per_user AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
        FROM events GROUP BY 1
    ), hist AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM per_user GROUP BY 1
    ), cum AS (
        SELECT k, n_users,
               CAST(SUM(n_users) OVER w AS BIGINT)     AS cum_users,
               CAST(SUM(k * n_users) OVER w AS BIGINT) AS cum_events
        FROM hist
        WINDOW w AS (ORDER BY k ROWS UNBOUNDED PRECEDING)
    ), tot AS (
        SELECT CAST(SUM(n_users) AS BIGINT)     AS tot_users,
               CAST(SUM(k * n_users) AS BIGINT) AS tot_events
        FROM hist
    )
    SELECT k AS events_per_user, n_users, cum_users, cum_events,
           CAST((1000000 * cum_users) // tot_users AS BIGINT)
               AS cum_users_ppm,
           CAST((1000000 * cum_events) // tot_events AS BIGINT)
               AS cum_events_ppm
    FROM cum CROSS JOIN tot
    """,
)
def lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-concentration (Lorenz) curve over per-user event counts —
    the full curve behind agg_gini_coefficient's scalar: each row is one
    activity level k with the cumulative share of users at ≤ k activity
    vs the cumulative share of events they generate, both in exact ppm.
    Reading (cum_users_ppm, cum_events_ppm) pairs off the curve answers
    the power-user questions product teams actually ask ("the bottom 50%
    of users produce what share of events?") without fixing decile
    boundaries in advance.

    Shape: per-user counts are one partial+final hash-agg; the curve then
    lives on the COUNT-VALUE HISTOGRAM (distinct activity levels — tiny,
    bounded by max per-user activity, not by users), so the only window
    runs over that histogram and no per-user ranking exists in the plan.
    Totals ride along via one broadcastable 1-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    hist = per_user.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    w = W.orderBy("k").rowsBetween(W.unboundedPreceding, 0)
    # totals via an unbounded window over the SAME histogram relation — a
    # separate aggregate + crossJoin would re-derive `hist` from the raw
    # events (DataFrame reuse is recomputation), doubling the corpus scan
    w_all = W.partitionBy()
    cum = hist.select(
        F.col("k").alias("events_per_user"),
        "n_users",
        F.sum("n_users").over(w).cast("long").alias("cum_users"),
        F.sum(F.col("k") * F.col("n_users")).over(w).cast("long").alias("cum_events"),
        F.sum("n_users").over(w_all).cast("long").alias("tot_users"),
        F.sum(F.col("k") * F.col("n_users")).over(w_all).cast("long").alias("tot_events"),
    )
    return cum.select(
        "events_per_user",
        "n_users",
        "cum_users",
        "cum_events",
        F.expr("CAST((1000000 * cum_users) div tot_users AS BIGINT)").alias(
            "cum_users_ppm"
        ),
        F.expr("CAST((1000000 * cum_events) div tot_events AS BIGINT)").alias(
            "cum_events_ppm"
        ),
    )


# -- session-scoped funnel (deferred: r10 activation) -----------------------------


@register(
    "events_session_funnel",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                            > {SESSION_GAP_MIN} * 60 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_type, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_seq
        FROM seq
    ),
    s AS (
        SELECT user_id, session_seq,
               MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t1,
               MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t2,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                   AS t3
        FROM sess GROUP BY 1, 2
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS s1,
               CAST(SUM(CASE WHEN t1 IS NOT NULL AND t2 > t1
                        THEN 1 ELSE 0 END) AS BIGINT) AS s2,
               CAST(SUM(CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2
                        THEN 1 ELSE 0 END) AS BIGINT) AS s3
        FROM s
    )
    SELECT 1 AS step, 'view' AS step_type, n_sessions, s1 AS n_reached,
           CAST(1000000 AS BIGINT) AS conv_ppm FROM agg
    UNION ALL
    SELECT 2, 'click', n_sessions, s2,
           CAST((1000000 * s2) // s1 AS BIGINT) FROM agg
    UNION ALL
    SELECT 3, 'purchase', n_sessions, s3,
           CAST((1000000 * s3) // s1 AS BIGINT) FROM agg
    """,
)
def session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The view→click→purchase funnel at SESSION grain: a step counts only
    when it happens later than the previous step INSIDE the same
    {SESSION_GAP_MIN}-minute-gap session — the intent-completion question
    ("did this visit convert?") that the user-grain funnel
    (events_funnel_steps) answers too optimistically, since a click next
    week still counts there. Conversion per step in exact ppm of
    step-1-reaching sessions.

    Shape: sessionization's one user-keyed Exchange and ordered scan (the
    shared ``sessionize`` helper — the oracle replicates its exact
    gap/tie rule), then a (user, session) rollup of three MIN-per-type
    timestamps and a 1-row funnel aggregate; the step logic never leaves
    the session row.
    """
    ev = load_table(spark, sf_dir, "events")
    s = (
        sessionize(ev)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", F.unix_micros("ts"))
            ).alias("t1"),
            F.min(
                F.when(F.col("event_type") == "click", F.unix_micros("ts"))
            ).alias("t2"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
            ).alias("t3"),
        )
    )
    agg = s.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.col("t1").isNotNull().cast("long")).cast("long").alias("s1"),
        F.sum(
            (F.col("t1").isNotNull() & (F.col("t2") > F.col("t1"))).cast("long")
        )
        .cast("long")
        .alias("s2"),
        F.sum(
            (
                F.col("t1").isNotNull()
                & (F.col("t2") > F.col("t1"))
                & (F.col("t3") > F.col("t2"))
            ).cast("long")
        )
        .cast("long")
        .alias("s3"),
    ).localCheckpoint(eager=False)  # three step rows read the 1-row agg
    steps = []
    for step, name, col, prev in (
        (1, "view", "s1", None),
        (2, "click", "s2", "s1"),
        (3, "purchase", "s3", "s1"),
    ):
        conv = (
            F.lit(1000000).cast("long")
            if prev is None
            else F.expr(f"CAST((1000000 * {col}) div {prev} AS BIGINT)")
        )
        steps.append(
            agg.select(
                F.lit(step).alias("step"),
                F.lit(name).alias("step_type"),
                "n_sessions",
                F.col(col).alias("n_reached"),
                conv.alias("conv_ppm"),
            )
        )
    out = steps[0]
    for p in steps[1:]:
        out = out.unionByName(p)
    return out


# -- velocity fraud flags (deferred: r10 activation) -----------------------------

_VEL_WINDOW_SEC = 86400  #: trailing window for the velocity rule (24 h)
_VEL_MIN_COUNT = 3  #: purchases within the window (self included) that flag


@register(
    "events_velocity_flags",
    oracle=f"""
    WITH p AS (
        SELECT event_id, user_id, ts,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    w AS (
        SELECT event_id, user_id, ts, cents,
               CAST(COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN {_VEL_WINDOW_SEC} PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_window
        FROM p
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_time,
           cents, n_window
    FROM w WHERE n_window >= {_VEL_MIN_COUNT}
    """,
)
def velocity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity fraud rule: flag every purchase that is the
    {_VEL_MIN_COUNT}rd-or-later purchase by the same user within a
    trailing {_VEL_WINDOW_SEC}-second window — the burst-of-activity
    detector every payments pipeline runs inline (production tightens the
    window to minutes; the fixture's purchase density makes 24 h the
    smallest window where the rule FIRES at both gate scales — a rule
    that never fires gates nothing, the amount-collision-audit lesson). A RANGE frame over
    epoch seconds (not a ROWS frame) so simultaneous events count each
    other symmetrically, and the rule is self-inclusive, matching the
    'N swipes in M minutes' phrasing auditors use.

    Shape: one shuffle on user_id, per-user ordered frames — identical
    physical shape to sessionization; per-user state never leaves its
    partition. Epochs are floored to whole seconds on both engines
    (truncation = floor for positive epochs) so frame boundaries are
    bit-identical.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts").cast("long").alias("sec"),
        quantize(F.col("value"), 100).alias("cents"),
    )
    wv = (
        W.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-_VEL_WINDOW_SEC, 0)
    )
    w = p.select(
        "event_id",
        "user_id",
        "ts",
        "cents",
        F.count(F.lit(1)).over(wv).cast("long").alias("n_window"),
    )
    return w.filter(F.col("n_window") >= _VEL_MIN_COUNT).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_time"),
        "cents",
        "n_window",
    )


# -- additive seasonal decomposition (deferred: r10 activation) -------------------


@register(
    "events_seasonal_decompose",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    tr AS (
        SELECT d, dow, x,
               CAST(SUM(x) OVER w AS BIGINT) AS s7,
               CAST(COUNT(*) OVER w AS BIGINT) AS n7
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
        SELECT d, dow, x, x - s7 // 7 AS det_c, s7 // 7 AS trend_cents
        FROM tr WHERE n7 = 7
    ),
    seas AS (
        SELECT dow,
               CAST(CASE WHEN SUM(det_c) >= 0
                    THEN SUM(det_c) // COUNT(*)
                    ELSE -((-SUM(det_c)) // COUNT(*)) END AS BIGINT)
                   AS seasonal_cents
        FROM det GROUP BY 1
    )
    SELECT strftime(det.d, '%Y-%m-%d') AS day,
           det.x AS rev_cents,
           CAST(det.trend_cents AS BIGINT) AS trend_cents,
           seas.seasonal_cents,
           CAST(det.x - det.trend_cents - seas.seasonal_cents AS BIGINT)
               AS residual_cents
    FROM det JOIN seas USING (dow)
    """,
)
def seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily purchase revenue — the
    classical STL-lite: trend = centered 7-day moving average (only days
    with a FULL window qualify, so the series edges never fake a trend),
    seasonal = per-day-of-week mean of the detrended series (sign-safe
    integer division), residual = the exact integer remainder. The three
    components sum back to the observation by construction — the
    decomposition identity is auditable row by row, which a float STL
    cannot offer a hash gate.

    Shape: corpus → daily series; the only windows run over the
    calendar-bounded series (one ordered 7-row frame) and the seasonal
    means over the 7-row dow relation; nothing event-sized shuffles
    twice.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.to_date("ts").alias("d"),
            F.dayofweek(F.to_date("ts")).cast("long").alias("dow"),
        )
        .agg(F.sum(quantize(F.col("value"), 100)).cast("long").alias("x"))
    )
    w7 = W.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "dow",
        "x",
        F.sum("x").over(w7).cast("long").alias("s7"),
        F.count(F.lit(1)).over(w7).cast("long").alias("n7"),
    )
    det = (
        tr.filter(F.col("n7") == 7)
        .select(
            "d",
            "dow",
            "x",
            (F.col("x") - F.expr("s7 div 7")).alias("det_c"),
            F.expr("s7 div 7").alias("trend_cents"),
        )
        .localCheckpoint(eager=False)  # feeds the dow means AND the readback
    )
    seas = det.groupBy("dow").agg(
        F.expr(
            "CAST(CASE WHEN SUM(det_c) >= 0 THEN SUM(det_c) div COUNT(*)"
            " ELSE -((-SUM(det_c)) div COUNT(*)) END AS BIGINT)"
        ).alias("seasonal_cents")
    )
    return det.join(F.broadcast(seas), "dow").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("x").alias("rev_cents"),
        F.col("trend_cents").cast("long").alias("trend_cents"),
        "seasonal_cents",
        (F.col("x") - F.col("trend_cents") - F.col("seasonal_cents"))
        .cast("long")
        .alias("residual_cents"),
    )


# -- rolling 28-day distinct actives --------------------------------------------

#: rolling window length in days (the "monthly active" convention)
_MAU_WINDOW = 28


@register(
    "events_rolling_mau",
    oracle=f"""
    WITH active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    bounds AS (SELECT MAX(d) AS max_d FROM active),
    c AS (
        SELECT d + CAST(off AS INT) AS wday, user_id, off
        FROM active CROSS JOIN generate_series(0, {_MAU_WINDOW} - 1) t(off)
    )
    SELECT strftime(wday, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau28,
           CAST(COUNT(DISTINCT CASE WHEN off = 0 THEN user_id END) AS BIGINT)
               AS dau
    FROM c, bounds WHERE wday <= max_d
    GROUP BY 1
    """,
)
def rolling_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {_MAU_WINDOW}-day distinct active users for every day of the
    observed range (trailing window), with same-day DAU alongside — the
    MAU/DAU pair product dashboards report. Distinct-over-overlapping-
    windows cannot partial-aggregate directly; the scalable form is the
    CONTRIBUTION EXPLODE: each (user, active-day) row claims the
    {_MAU_WINDOW} window-days it makes that user active in, then one
    two-level distinct count per window-day. Fan-out is a fixed constant
    on the already-collapsed (user, day) relation — never on raw events —
    and the double-counting a per-event explode would need to dedup
    disappears up front.

    Shape: one scan → distinct (user, day) → ×{_MAU_WINDOW} explode →
    (window-day, user) dedup agg → per-day count; the max-date bound rides
    a 1-row broadcast. All counts exact integers.
    """
    ev = load_table(spark, sf_dir, "events")
    active = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    bounds = active.agg(F.max("d").alias("max_d"))
    c = active.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(_MAU_WINDOW - 1))).alias("off"),
        "d",
    ).select("user_id", "off", F.date_add("d", F.col("off")).alias("wday"))
    return (
        c.crossJoin(F.broadcast(bounds))
        .filter(F.col("wday") <= F.col("max_d"))
        .groupBy(F.date_format("wday", "yyyy-MM-dd").alias("day"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("mau28"),
            F.countDistinct(
                F.when(F.col("off") == 0, F.col("user_id"))
            )
            .cast("long")
            .alias("dau"),
        )
    )


# -- EWMA one-step-ahead backtest (deferred: r10 activation) ---------------------

#: EWMA decay: alpha = 1/4, so the lag-k weight is (3/4)^k; scaling by 4^L
#: makes every weight the exact integer 3^k * 4^(L-k). Shared by the
#: smoother below and the walk-forward backtest here.
_EWMA_LAGS = 20


@register(
    "events_backtest_ewma",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    c AS (
        SELECT d + CAST(lag AS INT) AS anchor, x,
               CAST(POWER(3, lag - 1) AS HUGEINT)
                 * CAST(POWER(4, {_EWMA_LAGS} - lag + 1) AS HUGEINT) AS w
        FROM daily CROSS JOIN generate_series(1, {_EWMA_LAGS} + 1) t(lag)
    ),
    f AS (
        SELECT anchor,
               CAST(SUM(CAST(x AS HUGEINT) * w) AS HUGEINT) AS num,
               CAST(SUM(w) AS HUGEINT) AS den,
               CAST(COUNT(*) AS BIGINT) AS n_hist
        FROM c GROUP BY 1
    )
    SELECT strftime(daily.d, '%Y-%m-%d') AS day,
           daily.x AS actual_cents,
           CAST(num // den AS BIGINT) AS forecast_cents,
           CAST(ABS(daily.x - num // den) AS BIGINT) AS abs_err_cents,
           CAST((1000000 * ABS(daily.x - num // den))
                // GREATEST(daily.x, 1) AS BIGINT) AS ape_ppm,
           n_hist
    FROM daily JOIN f ON f.anchor = daily.d
    """,
)
def backtest_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead EWMA forecast backtest: for each day, forecast
    today's purchase revenue from STRICTLY PRIOR days only (the lag range
    shifts to 1..{_EWMA_LAGS}+1, so the weight on yesterday is the alpha
    mass and today never leaks into its own forecast), then score the
    absolute error and APE in exact integer cents/ppm. This is the
    walk-forward evaluation loop every forecasting pipeline runs —
    events_backtest_seasonal_naive with the EWMA forecaster instead of
    the seasonal-naive one, sharing its integer-exact error discipline.

    Shape: identical to events_ewma_smoothing — daily collapse, bounded
    explode to (anchor, weight) contributions, equi-join on the anchor —
    because the shifted-window closed form IS the recurrence-free EWMA;
    no sequential state, no window operator.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum(quantize(F.col("value"), 100)).cast("long").alias("x"))
        .localCheckpoint(eager=False)  # contributions + readback join
    )
    weights = spark.createDataFrame(
        [
            (k, 3 ** (k - 1) * 4 ** (_EWMA_LAGS - k + 1))
            for k in range(1, _EWMA_LAGS + 2)
        ],
        "lag int, w long",
    )
    contrib = (
        daily.select(
            "d",
            "x",
            F.explode(F.sequence(F.lit(1), F.lit(_EWMA_LAGS + 1))).alias("lag"),
        )
        .join(F.broadcast(weights), "lag")
        .select(
            F.date_add("d", F.col("lag")).alias("anchor"),
            (F.col("x").cast("decimal(38,0)") * F.col("w").cast("decimal(38,0)"))
            .alias("xw"),
            F.col("w").cast("decimal(38,0)").alias("wd"),
        )
    )
    f = contrib.groupBy("anchor").agg(
        F.sum("xw").alias("num"),
        F.sum("wd").alias("den"),
        F.count(F.lit(1)).cast("long").alias("n_hist"),
    )
    return daily.join(f, daily["d"] == f["anchor"]).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("x").alias("actual_cents"),
        F.expr("CAST(num div den AS BIGINT)").alias("forecast_cents"),
        F.expr("CAST(ABS(x - num div den) AS BIGINT)").alias("abs_err_cents"),
        F.expr(
            "CAST((1000000 * ABS(x - num div den)) div GREATEST(x, 1)"
            " AS BIGINT)"
        ).alias("ape_ppm"),
        "n_hist",
    )


# -- EWMA smoothing (closed-form, integer-exact) --------------------------------


@register(
    "events_ewma_smoothing",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    c AS (
        SELECT d + CAST(lag AS INT) AS anchor, x,
               CAST(POWER(3, lag) AS HUGEINT)
                 * CAST(POWER(4, {_EWMA_LAGS} - lag) AS HUGEINT) AS w
        FROM daily CROSS JOIN generate_series(0, {_EWMA_LAGS}) t(lag)
    ),
    a AS (
        SELECT anchor,
               CAST(SUM(CAST(x AS HUGEINT) * w) AS HUGEINT) AS num,
               CAST(SUM(w) AS HUGEINT) AS den,
               CAST(COUNT(*) AS BIGINT) AS n_lags
        FROM c GROUP BY 1
    )
    SELECT strftime(daily.d, '%Y-%m-%d') AS day, daily.x AS rev_cents,
           CAST(num // den AS BIGINT) AS ewma_cents, n_lags
    FROM daily JOIN a ON a.anchor = daily.d
    """,
)
def ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily purchase revenue,
    closed-form and integer-exact: with alpha = 1/4 the lag-k weight
    (3/4)^k scaled by 4^{_EWMA_LAGS} is the exact integer
    3^k * 4^({_EWMA_LAGS}-k), truncated at {_EWMA_LAGS} lags (the dropped
    tail mass is (3/4)^21 < 0.3 %). ewma_cents = floor(sum(w_k * x_(t-k)) /
    sum(w_k)) over the days PRESENT in the window, so gaps in the series
    renormalize instead of decaying toward zero. No recursion, no float:
    the usual sequential-recurrence form is unparallelizable, this
    windowed-rational form is one equi-join.

    Shape: the corpus collapses to the daily series first; each day then
    emits {_EWMA_LAGS}+1 (anchor, weight) contributions via an explode —
    bounded fan-out, equi-joined and hash-aggregated on the anchor day.
    Weights arrive as an exact integer literal table (broadcast); products
    run in DECIMAL(38,0)/HUGEINT so a 100-TB daily total cannot overflow.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum(quantize(F.col("value"), 100)).cast("long").alias("x"))
        # feeds both the contribution explode and the final readback join;
        # staging the day-sized series keeps the corpus scan single-pass
        .localCheckpoint(eager=False)
    )
    weights = spark.createDataFrame(
        [(k, 3**k * 4 ** (_EWMA_LAGS - k)) for k in range(_EWMA_LAGS + 1)],
        "lag int, w long",
    )
    contrib = (
        daily.select(
            "d", "x", F.explode(F.sequence(F.lit(0), F.lit(_EWMA_LAGS))).alias("lag")
        )
        .join(F.broadcast(weights), "lag")
        .select(
            F.date_add("d", F.col("lag")).alias("anchor"),
            (F.col("x").cast("decimal(38,0)") * F.col("w").cast("decimal(38,0)"))
            .alias("xw"),
            F.col("w").cast("decimal(38,0)").alias("wd"),
        )
    )
    agg = contrib.groupBy("anchor").agg(
        F.sum("xw").alias("num"),
        F.sum("wd").alias("den"),
        F.count(F.lit(1)).cast("long").alias("n_lags"),
    )
    return daily.join(agg, daily["d"] == agg["anchor"]).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("x").alias("rev_cents"),
        F.expr("CAST(num div den AS BIGINT)").alias("ewma_cents"),
        "n_lags",
    )


# -- exact Shapley-value channel attribution (r11 queue) --------------------------

#: fixed channel -> bit mapping (alphabetical; 'purchase' is the conversion)
_SHAP_CHANNELS = (("click", 1), ("error", 2), ("signup", 4), ("view", 8))
_SHAP_N = 4
#: |S|!·(n−|S|−1)! for n=4, scaled by n!=24: index = |S|
_SHAP_W24 = (6, 2, 2, 6)


@register(
    "events_shapley_attribution",
    oracle=f"""
    WITH conv AS (
        SELECT user_id, MIN(ts) AS first_purchase
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), touch AS (
        SELECT e.user_id,
               CAST(COALESCE(SUM(DISTINCT
                   CASE e.event_type
                        {" ".join(f"WHEN '{c}' THEN {b}" for c, b in _SHAP_CHANNELS)}
                   END), 0) AS BIGINT) AS mask
        FROM events e JOIN conv c USING (user_id)
        WHERE e.ts < c.first_purchase AND e.event_type <> 'purchase'
        GROUP BY 1
    ), allconv AS (
        SELECT c.user_id, CAST(COALESCE(t.mask, 0) AS BIGINT) AS mask
        FROM conv c LEFT JOIN touch t USING (user_id)
    ), em AS (
        SELECT mask, CAST(COUNT(*) AS BIGINT) AS e FROM allconv GROUP BY 1
    ), subsets AS (
        SELECT UNNEST(range(0, {1 << _SHAP_N})) AS s
    ), v AS (
        SELECT s, CAST(COALESCE(SUM(CASE WHEN (em.mask & s) = em.mask
                                         THEN em.e END), 0) AS BIGINT) AS v
        FROM subsets LEFT JOIN em ON (em.mask & s) = em.mask
        GROUP BY 1
    ), ch AS (
        SELECT UNNEST(['{_SHAP_CHANNELS[0][0]}', '{_SHAP_CHANNELS[1][0]}',
                       '{_SHAP_CHANNELS[2][0]}', '{_SHAP_CHANNELS[3][0]}'])
                   AS channel,
               UNNEST([{_SHAP_CHANNELS[0][1]}, {_SHAP_CHANNELS[1][1]},
                       {_SHAP_CHANNELS[2][1]}, {_SHAP_CHANNELS[3][1]}]) AS b
    )
    SELECT ch.channel,
           CAST(SUM(CASE bit_count(va.s)
                    {" ".join(f"WHEN {k} THEN {w}" for k, w in enumerate(_SHAP_W24))}
                    END * (vb.v - va.v)) AS BIGINT) AS phi_x24
    FROM ch
    JOIN v va ON (va.s & ch.b) = 0
    JOIN v vb ON vb.s = (va.s | ch.b)
    GROUP BY 1
    """,
)
def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value conversion attribution across the four
    non-purchase channels — the game-theoretic credit split (data-driven
    attribution in ads platforms) that last-touch
    (events_attribution_last_touch) approximates: channel i's credit is
    its average marginal contribution over every coalition ordering,
    φ_i = Σ_{{S∌i}} |S|!(n−|S|−1)!/n! · (v(S∪i) − v(S)) with coalition
    value v(S) = converters reachable touching only channels in S.
    n = {_SHAP_N} keeps the lattice exact — 2^{_SHAP_N} subsets, factorial
    weights scaled by 4! so every output is an INTEGER (φ×24); the
    efficiency identity Σφ_i = v(full) − v(∅) holds exactly in these
    units.

    Shape: the corpus collapses to one mask per CONVERTER (first-purchase
    anti-window via a min-ts join, then a distinct-channel bit sum — two
    partial-aggregable rollups); everything after runs on the 16-row
    subset lattice (subset-sum via a bit-containment join, marginal pairs
    via the (S, S∪i) equi-join). At any corpus size the lattice stays 16
    rows — attribution cost is one scan plus constants. More channels
    grow the lattice 2^n: the exact form is for marketing-sized n; past
    ~20 channels production samples permutations instead.
    """
    ev = load_table(spark, sf_dir, "events")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    bit = None
    for c, b in _SHAP_CHANNELS:
        expr = F.when(F.col("event_type") == c, b)
        bit = expr if bit is None else bit.when(F.col("event_type") == c, b)
    touch = (
        ev.join(conv, "user_id")
        .filter(
            (F.col("ts") < F.col("first_purchase"))
            & (F.col("event_type") != "purchase")
        )
        .select("user_id", bit.alias("b"))
        .groupBy("user_id")
        .agg(F.sum_distinct(F.col("b")).cast("long").alias("mask"))
    )
    allconv = conv.join(touch, "user_id", "left").select(
        "user_id", F.coalesce(F.col("mask"), F.lit(0)).alias("mask")
    )
    em = allconv.groupBy("mask").agg(F.count(F.lit(1)).cast("long").alias("e"))
    subsets = spark.range(1 << _SHAP_N).select(F.col("id").alias("s"))
    v = (
        subsets.join(
            F.broadcast(em),
            (F.col("mask").bitwiseAND(F.col("s"))) == F.col("mask"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("e"), F.lit(0)).cast("long").alias("v"))
        # feeds both sides of the marginal pair join: 16 rows, stage once
        .localCheckpoint(eager=False)
    )
    ch = spark.createDataFrame(
        list(_SHAP_CHANNELS), "channel string, b long"
    )
    w24 = F.when(F.expr("bit_count(va.s)") == 0, _SHAP_W24[0])
    for k in range(1, _SHAP_N):
        w24 = w24.when(F.expr("bit_count(va.s)") == k, _SHAP_W24[k])
    va, vb = v.alias("va"), v.alias("vb")
    return (
        ch.join(va, F.expr("(va.s & b) = 0"))
        .join(vb, F.expr("vb.s = (va.s | b)"))
        .groupBy("channel")
        .agg(
            F.sum(w24 * (F.col("vb.v") - F.col("va.v")))
            .cast("long")
            .alias("phi_x24")
        )
    )


# -- engagement-tier migration matrix (r11 queue) -------------------------------

_MIG_SPLIT = "2024-01-16"  # fixed period boundary (fixture spans Jan 2024)
#: purchase-count tier edges: 0 -> absent, 1-2 -> low, 3-5 -> mid, 6+ -> high
_MIG_TIER_SQL = (
    "CASE WHEN {c} IS NULL OR {c} = 0 THEN 'absent'"
    " WHEN {c} <= 2 THEN 'low'"
    " WHEN {c} <= 5 THEN 'mid'"
    " ELSE 'high' END"
)


@register(
    "events_rfm_migration_matrix",
    oracle=f"""
    WITH p AS (
        SELECT user_id,
               CASE WHEN ts < TIMESTAMP '{_MIG_SPLIT}' THEN 1 ELSE 2 END AS half
        FROM events WHERE event_type = 'purchase'
    ), c AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM p GROUP BY 1
    )
    SELECT {_MIG_TIER_SQL.format(c="c1")} AS tier_from,
           {_MIG_TIER_SQL.format(c="c2")} AS tier_to,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(c2 - c1) AS BIGINT) AS net_purchase_delta
    FROM c GROUP BY 1, 2
    """,
)
def rfm_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-tier migration matrix: each purchasing user is tiered by
    purchase count in the first and second half of the period (absent /
    low / mid / high on fixed edges) and the matrix counts users per
    (from, to) cell with the net purchase delta riding along — the
    lifecycle view growth teams act on (who upgraded, who lapsed),
    complementing events_growth_accounting (presence only, no intensity
    tiers) and events_transition_matrix (event-type Markov chain, not
    users). Fixed tier edges keep every cell an exact integer — no
    quantile coupling between the two halves.

    Shape: one scan with the half tag computed map-side; ONE
    partial-aggregable per-user conditional rollup (both halves share it
    — never two scans + a full-outer join, the naive form); the 4×4-max
    matrix is a second tiny groupBy. User-count scale-out is the
    groupBy's hash partitioning — no window, no skew key (user_id is the
    key, purchases per user are bounded)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    c = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("ts") < F.lit(_MIG_SPLIT).cast("timestamp"), 1).otherwise(0)
        )
        .cast("long")
        .alias("c1"),
        F.sum(
            F.when(F.col("ts") >= F.lit(_MIG_SPLIT).cast("timestamp"), 1).otherwise(0)
        )
        .cast("long")
        .alias("c2"),
    )
    return (
        c.select(
            F.expr(_MIG_TIER_SQL.format(c="c1")).alias("tier_from"),
            F.expr(_MIG_TIER_SQL.format(c="c2")).alias("tier_to"),
            (F.col("c2") - F.col("c1")).alias("delta"),
        )
        .groupBy("tier_from", "tier_to")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("delta").cast("long").alias("net_purchase_delta"),
        )
    )



# -- A/B sample-size (power) calculator (r12 queue) --------------------------------------

#: (z_{alpha/2} + z_beta)^2 for alpha=0.05 two-sided, power=0.80 — folded
#: to one double literal in Python so both engines parse the identical
#: constant (1.96 + 0.8416)^2.
_POWER_Z2 = (1.96 + 0.8416) ** 2
_POWER_MDE_BP = (100, 200, 500, 1000)  # minimum detectable effects, basis points

#: shared IEEE expression text over columns (n, s, q, mde_bp) — fixed
#: operand order, every integer cast to double explicitly, so both
#: engines compile the identical correctly-rounded sequence.
_POWER_N_EXPR = (
    f"CAST(CEIL((2.0 * {_POWER_Z2!r}"
    " * ((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
    "     / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)))"
    " / ((CAST(mde_bp AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
    "     / 10000.0)"
    "    * (CAST(mde_bp AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
    "       / 10000.0))) AS BIGINT)"
)


@register(
    "events_power_analysis",
    oracle=f"""
    WITH m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                        * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS q
        FROM events WHERE event_type = 'purchase' AND user_id % 2 = 1
    ), grid AS (
        SELECT UNNEST([{", ".join(map(str, _POWER_MDE_BP))}]) AS mde_bp
    )
    SELECT CAST(mde_bp AS BIGINT) AS mde_bp, n AS n_control_observed,
           {_POWER_N_EXPR} AS n_required_per_arm
    FROM grid CROSS JOIN m
    """,
)
def power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size calculator from the CONTROL cohort's observed
    variance: for each minimum-detectable-effect on the grid
    (100/200/500/1000 basis points of the control mean), the required n
    per arm at alpha=0.05 (two-sided) and 80 % power — n = 2(z_a+z_b)^2.var/
    delta^2, the planning readout that belongs BEFORE
    stats_ab_ttest/stats_cohens_d judge the experiment after the fact
    (and beside stats_ratio_metric_delta_ci's post-hoc interval).

    Determinism: the three moments are exact cent integers; the z
    constant folds to ONE Python double literal both engines parse
    identically; the n formula is a single fixed-order IEEE expression
    (every division and multiply sequenced by shared text), and CEIL of
    an identical double is identical — so the BIGINT answer matches
    bit-for-bit with no rational arithmetic needed.

    Shape: one scan to one 1-row moment aggregate, broadcast against a
    4-row literal grid; constant output."""
    v = quantize(F.col("value"), MONEY_SCALE)
    m = (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") % 2 == 1))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(v).cast("long").alias("s"),
            F.sum(v * v).cast("long").alias("q"),
        )
    )
    grid = spark.createDataFrame(
        [(int(b),) for b in _POWER_MDE_BP], "mde_bp long"
    )
    return (
        grid.crossJoin(F.broadcast(m))
        .select(
            "mde_bp",
            F.col("n").alias("n_control_observed"),
            F.expr(_POWER_N_EXPR).alias("n_required_per_arm"),
        )
    )

# -- CUPED variance reduction (r13 queue) ------------------------------------------

#: pre-period / post-period boundary (fixture events span 2024-01-01..30)
_CUPED_SPLIT = "2024-01-16"


@register(
    "events_cuped_variance_reduction",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    per AS (
        SELECT u.user_id,
               u.user_id % 2 = 0 AS treated,
               COALESCE(SUM(CASE WHEN e.ts < TIMESTAMP '{_CUPED_SPLIT}'
                    THEN CAST(ROUND(e.value) AS BIGINT) END), 0) AS x,
               COALESCE(SUM(CASE WHEN e.ts >= TIMESTAMP '{_CUPED_SPLIT}'
                    THEN CAST(ROUND(e.value) AS BIGINT) END), 0) AS y
        FROM u LEFT JOIN events e
          ON e.user_id = u.user_id AND e.event_type = 'purchase'
        GROUP BY 1, 2
    ),
    m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(x * x) AS HUGEINT) AS sxx,
               CAST(SUM(x * y) AS HUGEINT) AS sxy,
               CAST(SUM(y * y) AS HUGEINT) AS syy,
               CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS HUGEINT) AS nt,
               CAST(SUM(CASE WHEN treated THEN x ELSE 0 END) AS HUGEINT) AS sxt,
               CAST(SUM(CASE WHEN treated THEN y ELSE 0 END) AS HUGEINT) AS syt
        FROM per
    )
    SELECT CAST(nt AS BIGINT) AS n_treat,
           CAST(n - nt AS BIGINT) AS n_ctrl,
           CAST(CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
                     THEN 0
                     ELSE (1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))
                          // ((n * sxx - sx * sx) * (n * syy - sy * sy)) END
                AS BIGINT) AS rho2_ppm,
           CAST(CASE WHEN nt = 0 OR nt = n THEN 0
                     ELSE (1000000 * (syt * (n - nt) - (sy - syt) * nt))
                          // (nt * (n - nt)) END
                AS BIGINT) AS delta_raw_micro,
           CAST(CASE WHEN nt = 0 OR nt = n THEN 0
                     WHEN (n * sxx - sx * sx) = 0
                     THEN (1000000 * (syt * (n - nt) - (sy - syt) * nt))
                          // (nt * (n - nt))
                     ELSE (1000000 * ((syt * (n - nt) - (sy - syt) * nt)
                                          * (n * sxx - sx * sx)
                                      - (n * sxy - sx * sy)
                                          * (sxt * (n - nt) - (sx - sxt) * nt)))
                          // (nt * (n - nt) * (n * sxx - sx * sx)) END
                AS BIGINT) AS delta_cuped_micro
    FROM m
    """,
)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al. 2013, "Improving the sensitivity of online
    controlled experiments"): adjust the experiment metric Y by the
    pre-period covariate X, Ŷ = Y − θ(X − E[X]) with θ = cov(X,Y)/var(X)
    — the industry-standard variance-reduction companion to
    events_power_analysis (fewer users for the same MDE) and the
    pre/post member of the A/B shelf beside stats_diff_in_diff. X is a
    user's whole-unit purchase spend before {_CUPED_SPLIT}, Y after;
    arms are even/odd user_id over the FULL distinct-user universe
    (zero-purchase users legitimately carry x = y = 0).

    Determinism: every moment (n, Σx, Σy, Σx², Σxy, Σy², per-arm
    splits) is an exact integer; no division ever produces θ. The three
    outputs are single integer rationals: ρ²_xy in ppm — the variance
    reduction CUPED delivers, 1 − var(Ŷ)/var(Y) = ρ² — as
    (10⁶·cov²) div (varX·varY) with the n² factors cancelling; the raw
    arm gap cross-multiplied over nt·nc; and the CUPED-adjusted gap
    ΔY − θ·ΔX = (ΔY·varX − cov·ΔX)/varX folded into ONE division over
    nt·nc·varX. Exact magnitudes MEASURED at sf0.1 (unbounded-int
    recomputation of every numerator/denominator): max ≈ 10²³·⁹
    (the CUPED numerator), 14 orders inside DECIMAL(38)/HUGEINT —
    whole-unit quantization keeps it there; cents would eat 10¹⁰ of
    that margin. Both engines' integer division truncates toward zero
    (the multimodal_pcm_decimate measurement). SF CEILING (ADVICE
    r12): the numerators scale ~n⁴ in the user count, i.e. ~10⁴× per
    10× SF, so the 38-digit ceiling lands near sf≈300 (~5M users) —
    beyond that Spark's non-ANSI decimal silently NULLs while DuckDB
    HUGEINT raises, surfacing as a cross-engine divergence rather than
    a loud failure.
    tests/test_engine_ops.py::test_cuped_decimal_headroom_at_largest_sf
    recomputes the exact products in unbounded Python ints at the
    largest shipped SF (sf0.1) and fails loudly if a data regen erodes
    the measured margin below 10 orders. Degenerate guards mirror
    stats_cochran_q: varX = 0 or varY = 0 cases to ρ² = 0 / unadjusted
    Δ, and an EMPTY ARM (nt = 0 or nt = n, where nt·nc = 0) cases both
    arm gaps to 0 in BOTH engines — Spark div would yield NULL but
    DuckDB // RAISES on zero, the wrap-vs-error divergence class
    (ADVICE r12).

    Shape: one events scan → per-user conditional aggregate (partial-
    aggregable groupBy(user_id)), then ONE 1-row moment aggregate; the
    output is constant-size. At 100 TB the per-user relation shards on
    user_id and the moment rollup is a map-side combine — nothing about
    the statistic needs a second pass."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.when(
            F.col("ts") < F.lit(_CUPED_SPLIT).cast("timestamp"),
            quantize(F.col("value"), 1),
        ).alias("xv"),
        F.when(
            F.col("ts") >= F.lit(_CUPED_SPLIT).cast("timestamp"),
            quantize(F.col("value"), 1),
        ).alias("yv"),
    )
    # pre-aggregate BEFORE the user-universe join: the per-user (x, y)
    # relation is partial-aggregable and |users|-sized, so the left join
    # moves aggregates, never raw purchase rows
    pxy = p.groupBy("user_id").agg(
        F.sum("xv").cast("long").alias("x"),
        F.sum("yv").cast("long").alias("y"),
    )
    per = (
        users.join(pxy, "user_id", "left")
        .select(
            "user_id",
            F.coalesce(F.col("x"), F.lit(0)).alias("x"),
            F.coalesce(F.col("y"), F.lit(0)).alias("y"),
        )
        .withColumn("treated", F.col("user_id") % 2 == 0)
    )
    d38 = "decimal(38,0)"
    m = per.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast(d38).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast(d38).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast(d38).alias("syy"),
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).cast(d38).alias("nt"),
        F.sum(F.when(F.col("treated"), F.col("x")).otherwise(0))
        .cast(d38)
        .alias("sxt"),
        F.sum(F.when(F.col("treated"), F.col("y")).otherwise(0))
        .cast(d38)
        .alias("syt"),
    )
    return m.select(
        F.col("nt").cast("long").alias("n_treat"),
        (F.col("n") - F.col("nt")).cast("long").alias("n_ctrl"),
        F.expr(
            "CAST(CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0"
            " THEN 0"
            " ELSE (1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))"
            " div ((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS BIGINT)"
        ).alias("rho2_ppm"),
        F.expr(
            "CAST(CASE WHEN nt = 0 OR nt = n THEN 0"
            " ELSE (1000000 * (syt * (n - nt) - (sy - syt) * nt))"
            " div (nt * (n - nt)) END AS BIGINT)"
        ).alias("delta_raw_micro"),
        F.expr(
            "CAST(CASE WHEN nt = 0 OR nt = n THEN 0"
            " WHEN (n * sxx - sx * sx) = 0"
            " THEN (1000000 * (syt * (n - nt) - (sy - syt) * nt))"
            " div (nt * (n - nt))"
            " ELSE (1000000 * ((syt * (n - nt) - (sy - syt) * nt)"
            " * (n * sxx - sx * sx)"
            " - (n * sxy - sx * sy) * (sxt * (n - nt) - (sx - sxt) * nt)))"
            " div (nt * (n - nt) * (n * sxx - sx * sx)) END AS BIGINT)"
        ).alias("delta_cuped_micro"),
    )


# -- SPRT sequential A/B early stopping (r14 queue) --------------------------------

#: Wald SPRT design constants, folded to integer ppm literals so BOTH
#: engines add identical integers (no libm at query time). Derivation
#: (float math done ONCE, here, not in the query): H0 p0 = 0.18 vs
#: H1 p1 = 0.22 (the fixture purchase share straddles them),
#: alpha = beta = 0.05.
_SPRT_C1 = 200671  # round(1e6 * ln(p1/p0))         = ln(0.22/0.18)
_SPRT_C2 = -50010  # round(1e6 * ln((1-p1)/(1-p0))) = ln(0.78/0.82)
_SPRT_A = 2944439  # round(1e6 * ln((1-beta)/alpha)) = ln(19): reject H0 at/above
_SPRT_B = -2944439  # round(1e6 * ln(beta/(1-alpha))): accept H0 at/below


@register(
    "events_sprt_sequential",
    # r14: activated first-thing from the r13-built queue (VERDICT r13 #1)
    oracle=f"""
    WITH daily AS (
        SELECT user_id % 2 AS arm, CAST(ts AS DATE) AS day,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS s_day,
               CAST(COUNT(*) AS BIGINT) AS n_day
        FROM events GROUP BY 1, 2
    ), cum AS (
        SELECT arm, day,
               ROW_NUMBER() OVER w AS step,
               SUM(s_day) OVER w AS cs,
               SUM(n_day) OVER w AS cn,
               {_SPRT_C1} * SUM(s_day) OVER w
                   + {_SPRT_C2} * (SUM(n_day) OVER w - SUM(s_day) OVER w)
                   AS llr_ppm
        FROM daily
        WINDOW w AS (PARTITION BY arm ORDER BY day
                     ROWS UNBOUNDED PRECEDING)
    ), agg AS (
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(MAX(cn) AS BIGINT) AS total_trials,
               CAST(MAX(cs) AS BIGINT) AS total_successes,
               CAST(MAX_BY(llr_ppm, step) AS BIGINT) AS llr_final_ppm,
               MIN(CASE WHEN llr_ppm >= {_SPRT_A}
                          OR llr_ppm <= {_SPRT_B} THEN step END)
                   AS cross_step
        FROM cum GROUP BY arm
    )
    SELECT CAST(a.arm AS BIGINT) AS arm, a.n_days, a.total_trials,
           a.total_successes, a.llr_final_ppm,
           CAST(COALESCE(a.cross_step, 0) AS BIGINT) AS first_cross_step,
           CAST(COALESCE(c.llr_ppm, 0) AS BIGINT) AS llr_at_cross_ppm,
           CASE WHEN a.cross_step IS NULL THEN 'continue'
                WHEN c.llr_ppm >= {_SPRT_A} THEN 'reject_h0'
                ELSE 'accept_h0' END AS decision
    FROM agg a LEFT JOIN cum c
      ON c.arm = a.arm AND c.step = a.cross_step
    """,
)
def sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test (Wald 1945) with daily
    peeking — the early-stopping companion to events_power_analysis
    (fixed-horizon sizing) and events_cuped_variance_reduction
    (variance reduction): each arm's cumulative Bernoulli log-likelihood
    ratio is monitored day by day and the experiment stops the first day
    it leaves (B, A). Trials are events, successes are purchases, arms
    are even/odd user_id, the peeking cadence is the calendar day —
    the granularity real experimentation platforms monitor at.

    Determinism: the per-trial log-LR increments and both Wald
    boundaries are FOLDED to integer ppm literals at design time
    ({_SPRT_C1}/{_SPRT_C2}/±{_SPRT_A}) — the query itself is pure
    integer arithmetic, no libm, so llr_ppm = C1·s + C2·f is exact in
    both engines; the first crossing is a MIN over integer steps and
    the boundary comparison is an integer inequality. Arms that never
    cross report decision 'continue' with step/llr 0 (COALESCE on both
    sides, never NULL in the hash).

    Overflow headroom (ADVICE r13 — the CUPED wrap-vs-raise class:
    Spark's non-ANSI BIGINT arithmetic wraps silently where DuckDB
    raises): |llr_ppm| ≤ max(|C1|, |C2|)·cn ≈ 2.007×10⁵·cn, so the
    2⁶³−1 BIGINT ceiling binds at ~4.6×10¹³ trials PER ARM — about
    10⁹× the sf0.1 fixture (~3×10⁴ events/arm, measured max
    |llr_ppm| ≈ 10⁹·³) and comfortably past any per-experiment event
    volume (46 trillion exposures per arm). The measured margin is
    pinned by tests/test_engine_ops.py::
    test_sprt_bigint_headroom_at_largest_sf, which recomputes the fold
    in unbounded Python ints at the largest shipped SF and reds if a
    data regen erodes the margin below 4 orders.

    Shape (100 TB): the corpus-scale stage is ONE partial-aggregable
    groupBy(arm, day) — raw events never reach the window; the
    cumulative scan runs over the |arms|·|days| daily relation
    (constant-bounded by the calendar), so the per-arm ordered window
    is a 2-partition exchange of ~60 rows, and the crossing join is a
    self-join on that same tiny relation. Sequential monitoring at
    scale is exactly this shape: pre-aggregate to the peeking cadence,
    then scan the bounded decision series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        (F.col("user_id") % 2).alias("arm"),
        F.col("ts").cast("date").alias("day"),
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("s_day"),
        F.count(F.lit(1)).cast("long").alias("n_day"),
    )
    w = W.partitionBy("arm").orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = daily.select(
        "arm",
        "day",
        F.row_number().over(W.partitionBy("arm").orderBy("day")).alias(
            "step"
        ),
        F.sum("s_day").over(w).alias("cs"),
        F.sum("n_day").over(w).alias("cn"),
    ).withColumn(
        "llr_ppm",
        F.lit(_SPRT_C1) * F.col("cs")
        + F.lit(_SPRT_C2) * (F.col("cn") - F.col("cs")),
    )
    agg = cum.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("cn").cast("long").alias("total_trials"),
        F.max("cs").cast("long").alias("total_successes"),
        F.expr("CAST(MAX_BY(llr_ppm, step) AS BIGINT)").alias(
            "llr_final_ppm"
        ),
        F.min(
            F.when(
                (F.col("llr_ppm") >= _SPRT_A) | (F.col("llr_ppm") <= _SPRT_B),
                F.col("step"),
            )
        ).alias("cross_step"),
    )
    c = cum.select(
        F.col("arm").alias("c_arm"),
        F.col("step").alias("c_step"),
        F.col("llr_ppm").alias("c_llr"),
    )
    return (
        agg.join(
            F.broadcast(c),
            (F.col("c_arm") == F.col("arm"))
            & (F.col("c_step") == F.col("cross_step")),
            "left",
        )
        .select(
            F.col("arm").cast("long").alias("arm"),
            "n_days",
            "total_trials",
            "total_successes",
            "llr_final_ppm",
            F.coalesce(F.col("cross_step"), F.lit(0))
            .cast("long")
            .alias("first_cross_step"),
            F.coalesce(F.col("c_llr"), F.lit(0))
            .cast("long")
            .alias("llr_at_cross_ppm"),
            F.when(F.col("cross_step").isNull(), F.lit("continue"))
            .when(F.col("c_llr") >= _SPRT_A, F.lit("reject_h0"))
            .otherwise(F.lit("accept_h0"))
            .alias("decision"),
        )
    )


from ..docfmt import format_docstrings  # noqa: E402
format_docstrings(globals())  # substitute {CONST} docstring placeholders (ADVICE r8)
