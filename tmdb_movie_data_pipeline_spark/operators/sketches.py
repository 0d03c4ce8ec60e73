"""Mergeable distinct-count sketching: K-Minimum-Values (KMV).

Why KMV and not HLL here: Spark's ``approx_count_distinct`` (HLL++) and
DuckDB's HLL give *different* estimates by construction, so they can never
hash-match in a cross-engine gate. KMV (Bar-Yossef et al., "Counting
distinct elements in a data stream", RANDOM 2002) is the other classic
mergeable distinct sketch — keep the K smallest hash values of the set; the
K-th smallest, normalized, estimates the density of distinct hashes — and
because both engines can compute the identical md5-derived hash and the
identical order statistic, the ESTIMATE itself is deterministic and
bit-identical across engines. That makes it the one distinct-sketch whose
accuracy contract a correctness gate can actually pin.

Scale shape: the sketch is algebraic — per-partition "K smallest hashes"
partials merge by union-then-K-smallest, which is exactly what Spark's
partial aggregation does for the dedup + window pipeline below (the
row_number never sees more than the group's distinct hashes, and at 100 TB
one would swap the window for a per-partition top-K partial; the estimate
depends only on the global K-th order statistic, which any merge order
reproduces identically). Estimated error is ~1/sqrt(K-2) ≈ 12.7% at K=64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io import load_table
from ..registry import register

# K smallest hashes kept per group; 2^60 is the hash range (15 hex digits).
KMV_K = 64
_HASH_RANGE = float(1 << 60)


@register(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        FROM events
    ),
    r AS (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        FROM h
    ),
    a AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_exact,
               MAX(CASE WHEN rn = {KMV_K} THEN hv END) AS hk
        FROM r GROUP BY 1
    )
    SELECT event_type, n_exact,
           CASE WHEN hk IS NULL THEN CAST(n_exact AS DOUBLE)
                ELSE CAST({KMV_K - 1} AS DOUBLE)
                       / (CAST(hk AS DOUBLE) / {_HASH_RANGE!r})
           END AS est_distinct
    FROM a
    """,
)
def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimate from a K-Minimum-Values sketch,
    with the exact count alongside so the error contract is visible in the
    gate itself.

    A group with fewer than K distinct members has no K-th order statistic;
    the KMV convention (and this query) returns the exact count there —
    the sketch is only ever approximate beyond its own capacity.

    Hash: first 15 hex digits of md5 of the decimal key string → uniform
    int in [0, 2^60), identical in Spark (``conv(substring(md5(..)..)``)
    and DuckDB (``('0x'||substr(md5(..)..))::BIGINT``); estimate is
    (K-1) / (hk / 2^60) — two IEEE divisions over exactly-represented
    integers, bit-equal cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.select(
            "event_type",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            )
            .cast("long")
            .alias("hv"),
        )
        .distinct()
    )
    w = W.partitionBy("event_type").orderBy(F.asc("hv"))
    r = h.withColumn("rn", F.row_number().over(w))
    a = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("hv"))).alias("hk"),
    )
    est = F.when(
        F.col("hk").isNull(), F.col("n_exact").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1))
        / (F.col("hk").cast("double") / F.lit(_HASH_RANGE))
    )
    return a.select("event_type", "n_exact", est.alias("est_distinct"))
