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


@register(
    "sketch_kmv_union",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT source,
               ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
        FROM documents
    ),
    per AS (
        SELECT source, hv,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rn
        FROM h
    ),
    states AS (SELECT source, hv FROM per WHERE rn <= {KMV_K}),
    merged AS (
        SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
        FROM (SELECT DISTINCT hv FROM states)
    ),
    per_agg AS (
        SELECT source AS scope,
               CAST(COUNT(*) AS BIGINT) AS n_exact,
               MAX(CASE WHEN rn = {KMV_K} THEN hv END) AS hk
        FROM per GROUP BY 1
    ),
    all_agg AS (
        SELECT '__all__' AS scope,
               (SELECT CAST(COUNT(DISTINCT hv) AS BIGINT) FROM h) AS n_exact,
               MAX(CASE WHEN rn = {KMV_K} THEN hv END) AS hk
        FROM merged
    ),
    u AS (SELECT * FROM per_agg UNION ALL SELECT * FROM all_agg)
    SELECT scope, n_exact,
           CASE WHEN hk IS NULL THEN CAST(n_exact AS DOUBLE)
                ELSE CAST({KMV_K - 1} AS DOUBLE)
                       / (CAST(hk AS DOUBLE) / {_HASH_RANGE!r})
           END AS est_distinct
    FROM u
    """,
)
def kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch MERGE: per-source sketch states (each source's K smallest
    text hashes) are unioned and re-trimmed to K — and the resulting
    ``__all__`` estimate is computed FROM THE STATES ALONE, never from the
    raw rows. That is the defining property of a mergeable sketch (K
    smallest of a union == K smallest of the union of per-part K-smallest),
    and because it's an exact set identity, both engines land on the
    bit-identical estimate — the gate checks mergeability itself.

    Scale shape: per-source states are |sources|×K rows; the merge is a
    window over that tiny relation. At 100 TB each source's state comes out
    of its own partial aggregation; states are what you'd persist in a
    metadata store and fold per ingest batch (same lifecycle as
    incremental_agg_maintenance's state table)."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "source",
        F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10)
        .cast("long")
        .alias("hv"),
    ).distinct()
    per = h.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("source").orderBy(F.asc("hv"))),
    )
    states = per.filter(F.col("rn") <= KMV_K).select("source", "hv")
    merged = (
        states.select("hv")
        .distinct()
        .withColumn("rn", F.row_number().over(W.orderBy(F.asc("hv"))))
    )
    per_agg = per.groupBy(F.col("source").alias("scope")).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("hv"))).alias("hk"),
    )
    n_all = h.select("hv").distinct().count()
    all_agg = merged.agg(
        F.lit("__all__").alias("scope"),
        F.lit(n_all).cast("long").alias("n_exact"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("hv"))).alias("hk"),
    )
    u = per_agg.unionByName(all_agg)
    est = F.when(
        F.col("hk").isNull(), F.col("n_exact").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1))
        / (F.col("hk").cast("double") / F.lit(_HASH_RANGE))
    )
    return u.select("scope", "n_exact", est.alias("est_distinct"))
