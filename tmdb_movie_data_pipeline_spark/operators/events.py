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

from ..functions import UNIT_SCALE, qavg, qavg_sql, qsum, qsum_sql, round4
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
