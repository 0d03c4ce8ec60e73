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


# -- HyperLogLog (deterministic cross-engine formulation) ---------------------
#
# Same design constraint as KMV above: Spark's approx_count_distinct (HLL++)
# and DuckDB's HLL can never hash-match, so the registered HLL is built from
# first principles (Flajolet et al., "HyperLogLog: the analysis of a
# near-optimal cardinality estimation algorithm", AofA 2007) on the shared
# md5-derived 60-bit hash:
#
# * register index  = hv % HLL_M           (low 6 bits)
# * remaining word  w = hv div HLL_M       (54 bits)
# * rho(w)          = leading zeros in the 54-bit word + 1
#                   = 55 - length(bin(w)), with w = 0 -> 55
#   (both engines' ``bin`` prints minimal binary digits, so length(bin(w))
#   is the bit length — verified identical including w = 0)
# * estimate        = alpha_m * m^2 / sum_j 2^(-M_j)
#
# The harmonic sum is kept INTEGER: sum_j 2^(55 - M_j) <= 64 * 2^55 = 2^61
# fits a BIGINT exactly, making the sum order-free (a raw double 2^(-M_j)
# sum would need 61 significand bits and would depend on add order). The
# one float expression is alpha_m*m^2 * 2^55 / S — a shared decimal literal
# times an exactly-representable power of two, divided once: bit-identical
# IEEE in both engines.
#
# DELIBERATE OMISSION: the small-range linear-counting correction
# m*ln(m/V) is NOT applied — ln() differs by 1 ulp between the JVM and
# DuckDB's libm on 6 of the 64 possible m/V inputs (measured), which would
# poison the hash gate. Instead the zero-register count V is emitted so a
# consumer (or a test) can apply the correction; the registered estimator
# is the raw HLL curve, with the exact count alongside to keep the error
# contract visible.

HLL_B = 6
HLL_M = 1 << HLL_B  # 64 registers
_HLL_ALPHA_M2 = "2904.064"  # alpha_64 (0.709) * 64^2, as a SHARED literal
_HLL_WMAX = 55  # 54-bit word -> rho in [1, 55]


@register(
    "sketch_hll_distinct",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        FROM events
    ),
    rr AS (
        SELECT event_type, hv % {HLL_M} AS reg,
               CASE WHEN hv // {HLL_M} = 0 THEN {_HLL_WMAX}
                    ELSE {_HLL_WMAX} - length(bin(hv // {HLL_M})) END AS rho
        FROM h
    ),
    regs AS (
        SELECT event_type, reg, MAX(rho) AS mj
        FROM rr GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type,
               SUM((1::BIGINT) << ({_HLL_WMAX} - mj)) AS s_present,
               COUNT(*) AS n_regs
        FROM regs GROUP BY 1
    ),
    x AS (
        SELECT event_type,
               s_present + ({HLL_M} - n_regs) * ((1::BIGINT) << {_HLL_WMAX}) AS s_int,
               CAST({HLL_M} - n_regs AS BIGINT) AS v_zero
        FROM s
    ),
    ex AS (
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM events GROUP BY 1
    )
    SELECT x.event_type, ex.n_exact, x.v_zero,
           {_HLL_ALPHA_M2} * pow(2.0, {_HLL_WMAX}) / CAST(x.s_int AS DOUBLE)
               AS est_distinct
    FROM x JOIN ex ON ex.event_type = x.event_type
    """,
)
def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimate from a deterministic 64-register
    HyperLogLog, with the exact count and the zero-register count alongside.

    Scale shape: one narrow scan -> (group, reg) max-agg (fully partial-
    aggregable, at most |groups|*64 rows cross the exchange regardless of
    corpus size) -> per-group fold. The DISTINCT on (event_type, hv) before
    register extraction is an optimization local to the gate's exact-count
    companion; the sketch itself needs only max(rho), which is insensitive
    to duplicates — at 100 TB drop the distinct and the exact column and
    the exchange still carries O(groups * 64)."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("hv"),
    ).distinct()
    w = F.shiftright(F.col("hv"), HLL_B)  # exact integer hv div 64: `/` is
    # IEEE double division, and 60-bit hv values round on long->double,
    # flipping the truncated quotient (and rho) vs the oracle's exact `//`
    rr = h.select(
        "event_type",
        (F.col("hv") % HLL_M).alias("reg"),
        F.when(w == 0, F.lit(_HLL_WMAX))
        .otherwise(F.lit(_HLL_WMAX) - F.length(F.bin(w)))
        .alias("rho"),
    )
    regs = rr.groupBy("event_type", "reg").agg(F.max("rho").alias("mj"))
    s = regs.groupBy("event_type").agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_WMAX} - mj)"))
        .alias("s_present"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    x = s.select(
        "event_type",
        (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("n_regs"))
            * F.shiftleft(F.lit(1).cast("long"), _HLL_WMAX)
        ).alias("s_int"),
        (F.lit(HLL_M) - F.col("n_regs")).cast("long").alias("v_zero"),
    )
    ex = ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_exact")
    )
    est = (
        F.expr(f"{_HLL_ALPHA_M2} * pow(2.0, {_HLL_WMAX})")
        / F.col("s_int").cast("double")
    ).alias("est_distinct")
    return x.join(ex, "event_type").select(
        "event_type", "n_exact", "v_zero", est
    )


@register(
    "sketch_hll_union",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT source,
               ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
        FROM documents
    ),
    rr AS (
        SELECT source, hv % {HLL_M} AS reg,
               CASE WHEN hv // {HLL_M} = 0 THEN {_HLL_WMAX}
                    ELSE {_HLL_WMAX} - length(bin(hv // {HLL_M})) END AS rho
        FROM h
    ),
    states AS (
        SELECT source, reg, MAX(rho) AS mj FROM rr GROUP BY 1, 2
    ),
    merged AS (
        SELECT reg, MAX(mj) AS mj FROM states GROUP BY 1
    ),
    scoped AS (
        SELECT source AS scope, reg, mj FROM states
        UNION ALL
        SELECT '__all__', reg, mj FROM merged
    ),
    s AS (
        SELECT scope,
               SUM((1::BIGINT) << ({_HLL_WMAX} - mj)) AS s_present,
               COUNT(*) AS n_regs
        FROM scoped GROUP BY 1
    )
    SELECT scope,
           CAST({HLL_M} - n_regs AS BIGINT) AS v_zero,
           {_HLL_ALPHA_M2} * pow(2.0, {_HLL_WMAX})
               / CAST(s_present + ({HLL_M} - n_regs) * ((1::BIGINT) << {_HLL_WMAX})
                      AS DOUBLE) AS est_distinct
    FROM s
    """,
)
def hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGE: per-source register vectors (the sketch STATE) are folded
    into an ``__all__`` estimate by register-wise MAX — computed from the
    states alone, never from the raw rows. max(max(a), max(b)) ==
    max(a ∪ b) is an exact set identity, so the gate pins HLL's defining
    mergeability property bit-exactly, the same contract sketch_kmv_union
    pins for KMV.

    Scale shape: states are |sources| * 64 rows — what an ingest pipeline
    would persist per batch and fold on read; the merge exchange carries
    O(sources * 64) regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "source",
        F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10)
        .cast("long")
        .alias("hv"),
    ).distinct()
    w = F.shiftright(F.col("hv"), HLL_B)  # exact hv div 64 (see hll_distinct)
    rr = h.select(
        "source",
        (F.col("hv") % HLL_M).alias("reg"),
        F.when(w == 0, F.lit(_HLL_WMAX))
        .otherwise(F.lit(_HLL_WMAX) - F.length(F.bin(w)))
        .alias("rho"),
    )
    # ONE explode(scope ∈ {source, '__all__'}) aggregation instead of
    # states ∪ merged-FROM-states (the r21 sketch_quantile_histogram
    # §11 shape): per-reg MAX over the doubled rows ≡ the register-wise
    # max-merge of the per-source states — the exact mergeability the
    # gate pins — and the md5+distinct subtree executes once, not twice
    # (the union's two legs each re-ran it; zero runtime exchange reuse).
    scoped = (
        rr.withColumn(
            "scope", F.explode(F.array(F.col("source"), F.lit("__all__")))
        )
        .groupBy("scope", "reg")
        .agg(F.max("rho").alias("mj"))
    )
    s = scoped.groupBy("scope").agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_WMAX} - mj)"))
        .alias("s_present"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    est = (
        F.expr(f"{_HLL_ALPHA_M2} * pow(2.0, {_HLL_WMAX})")
        / (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("n_regs"))
            * F.shiftleft(F.lit(1).cast("long"), _HLL_WMAX)
        ).cast("double")
    ).alias("est_distinct")
    return s.select(
        "scope",
        (F.lit(HLL_M) - F.col("n_regs")).cast("long").alias("v_zero"),
        est,
    )


# -- Count-Min sketch (heavy hitters) -----------------------------------------
#
# Cormode & Muthukrishnan, "An improved data stream summary: the count-min
# sketch and its applications", J. Algorithms 2005. d independent hash rows,
# w counters each; point estimate = min over rows of the hashed counter —
# always an OVERestimate (collisions only add), never under. All counters
# are integers and the row hashes are the shared md5 construction, so the
# sketch, the estimates, and the (est - exact) overcount are bit-identical
# cross-engine — like KMV/HLL above, a sketch whose accuracy contract the
# gate itself pins.

CMS_D = 4  # hash rows
CMS_W = 64  # counters per row — deliberately small so collisions are VISIBLE
CMS_TOPN = 20


def _cms_pos_duck(i: int, key: str) -> str:
    return (
        f"('0x' || substr(md5('{i}_' || {key}), 1, 15))::BIGINT % {CMS_W}"
    )


def _cms_pos_spark(i: int, key: str) -> str:
    return (
        f"CAST(conv(substring(md5(concat('{i}_', {key})), 1, 15), 16, 10)"
        f" AS BIGINT) % {CMS_W}"
    )


@register(
    "sketch_cms_heavy_hitters",
    oracle=f"""
    WITH keyed AS (
        SELECT CAST(user_id AS VARCHAR) AS k FROM events
    ),
    cells AS (
        {" UNION ALL ".join(
            f"SELECT {i} AS row_i, {_cms_pos_duck(i, 'k')} AS col_j, k FROM keyed"
            for i in range(CMS_D)
        )}
    ),
    sketch AS (
        SELECT row_i, col_j, CAST(COUNT(*) AS BIGINT) AS c
        FROM cells GROUP BY 1, 2
    ),
    exact AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS n_exact FROM keyed GROUP BY 1
    ),
    probes AS (
        {" UNION ALL ".join(
            f"SELECT k, {i} AS row_i, {_cms_pos_duck(i, 'k')} AS col_j FROM exact"
            for i in range(CMS_D)
        )}
    ),
    est AS (
        SELECT p.k, MIN(s.c) AS n_est
        FROM probes p JOIN sketch s
          ON s.row_i = p.row_i AND s.col_j = p.col_j
        GROUP BY 1
    ),
    ranked AS (
        SELECT e.k AS user_key, x.n_exact, e.n_est,
               ROW_NUMBER() OVER (ORDER BY x.n_exact DESC, e.k) AS rn
        FROM est e JOIN exact x ON x.k = e.k
    )
    SELECT user_key, n_exact, n_est FROM ranked WHERE rn <= {CMS_TOPN}
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{CMS_TOPN} users by exact event count, with the Count-Min
    estimate alongside: n_est >= n_exact always (one-sided error), and with
    w = 64 << |users| the overcounts are non-trivial — the gate pins the
    exact collision pattern of the shared hash family.

    Scale shape: the sketch build is one explode-by-d scan folded by
    (row, col) — partial-aggregable, and the exchange carries at most
    d * w = {CMS_D * CMS_W} counter rows REGARDLESS of stream size; that is
    the entire point of a CMS at 100 TB (the heavy-hitter candidate set
    would come from a per-partition top-k partial, not the full key list
    used here to make the gate's exact column checkable)."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(F.col("user_id").cast("string").alias("k"))
    cells = keyed.select(
        "k",
        F.posexplode(
            F.array(*[F.expr(_cms_pos_spark(i, "k")) for i in range(CMS_D)])
        ).alias("row_i", "col_j"),
    )
    sketch = cells.groupBy("row_i", "col_j").agg(
        F.count(F.lit(1)).alias("c")
    )
    exact = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("n_exact"))
    probes = exact.select(
        "k",
        F.posexplode(
            F.array(*[F.expr(_cms_pos_spark(i, "k")) for i in range(CMS_D)])
        ).alias("row_i", "col_j"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["row_i", "col_j"])
        .groupBy("k")
        .agg(F.min("c").alias("n_est"))
    )
    # top-n via sort+limit => TakeOrderedAndProject (per-partition top-n
    # partials, no single-partition window) — the deterministic total order
    # (count desc, key asc) makes it row-identical to the oracle's
    # row_number formulation.
    return (
        est.join(exact, "k")
        .select(F.col("k").alias("user_key"), "n_exact", "n_est")
        .orderBy(F.desc("n_exact"), F.asc("user_key"))
        .limit(CMS_TOPN)
    )


@register(
    "sketch_kmv_intersection",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    pairs(t_a, t_b) AS (
        VALUES ('click', 'purchase'), ('click', 'view'), ('purchase', 'view')
    ),
    uni AS (
        SELECT p.t_a, p.t_b, h.hv,
               ROW_NUMBER() OVER (PARTITION BY p.t_a, p.t_b ORDER BY h.hv) AS rn
        FROM pairs p JOIN (SELECT DISTINCT event_type, hv FROM h) h
          ON h.event_type IN (p.t_a, p.t_b)
        GROUP BY p.t_a, p.t_b, h.hv
    ),
    unionk AS (SELECT t_a, t_b, hv FROM uni WHERE rn <= {KMV_K}),
    uk AS (
        SELECT t_a, t_b, MAX(hv) AS hk, COUNT(*) AS k_eff FROM unionk
        GROUP BY 1, 2
    ),
    shared AS (
        SELECT u.t_a, u.t_b, COUNT(*) AS n_shared
        FROM unionk u
        JOIN h a ON a.event_type = u.t_a AND a.hv = u.hv
        JOIN h b ON b.event_type = u.t_b AND b.hv = u.hv
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT p.t_a, p.t_b, COUNT(*) AS n_exact
        FROM pairs p
        JOIN h a ON a.event_type = p.t_a
        JOIN h b ON b.event_type = p.t_b AND b.hv = a.hv
        GROUP BY 1, 2
    )
    SELECT uk.t_a, uk.t_b,
           CAST(exact.n_exact AS BIGINT) AS n_exact,
           CAST(COALESCE(shared.n_shared, 0) AS DOUBLE) / CAST(uk.k_eff AS DOUBLE)
             * (CAST(uk.k_eff - 1 AS DOUBLE) / (CAST(uk.hk AS DOUBLE) / {_HASH_RANGE!r}))
             AS est_intersection
    FROM uk
    LEFT JOIN shared ON shared.t_a = uk.t_a AND shared.t_b = uk.t_b
    JOIN exact ON exact.t_a = uk.t_a AND exact.t_b = uk.t_b
    """,
)
def kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-INTERSECTION estimate — the sketch-algebra operation Theta
    sketches exist for, from the same KMV states as sketch_kmv_distinct/
    union: for each event-type pair, take the K smallest hashes of the
    UNION of the two user sets, count how many of those belong to both
    sets (an exact membership test against the per-set hash sets), and
    scale the Jaccard fraction by the union-KMV cardinality estimate:
    |A∩B| ≈ (shared/K) · (K−1)/(h_K / 2^60). Every input to the final
    expression is an integer (shared count, K, the K-th order statistic),
    so the two IEEE divisions and one multiply are bit-identical
    cross-engine — the exact intersection count sits alongside, keeping
    the error contract visible.

    Scale shape: per-set states are K hashes (mergeable partials); the
    membership probe joins the K-row union sketch back to the per-set
    hash relations on the hash value — K·|pairs| probe rows, never a
    corpus-sized set operation."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    h = ev.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("hv"),
    ).distinct()
    pairs = spark.createDataFrame(
        [("click", "purchase"), ("click", "view"), ("purchase", "view")],
        "t_a string, t_b string",
    )
    uni = (
        F.broadcast(pairs)
        .join(h, h["event_type"].isin(F.col("t_a"), F.col("t_b")))
        .select("t_a", "t_b", "hv")
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("t_a", "t_b").orderBy(F.asc("hv"))
            ),
        )
    )
    unionk = uni.filter(F.col("rn") <= KMV_K).select("t_a", "t_b", "hv")
    uk = unionk.groupBy("t_a", "t_b").agg(
        F.max("hv").alias("hk"), F.count(F.lit(1)).alias("k_eff")
    )
    ha = h.select(F.col("event_type").alias("e_a"), F.col("hv").alias("hv_a"))
    hb = h.select(F.col("event_type").alias("e_b"), F.col("hv").alias("hv_b"))
    shared = (
        unionk.join(
            ha, (F.col("e_a") == F.col("t_a")) & (F.col("hv_a") == F.col("hv"))
        )
        .join(hb, (F.col("e_b") == F.col("t_b")) & (F.col("hv_b") == F.col("hv")))
        .groupBy("t_a", "t_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    exact = (
        F.broadcast(pairs)
        .join(ha, F.col("e_a") == F.col("t_a"))
        .join(
            hb,
            (F.col("e_b") == F.col("t_b")) & (F.col("hv_b") == F.col("hv_a")),
        )
        .groupBy("t_a", "t_b")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    est = (
        F.coalesce(F.col("n_shared"), F.lit(0)).cast("double")
        / F.col("k_eff").cast("double")
        * (
            (F.col("k_eff") - 1).cast("double")
            / (F.col("hk").cast("double") / F.lit(_HASH_RANGE))
        )
    ).alias("est_intersection")
    return (
        uk.join(shared, ["t_a", "t_b"], "left")
        .join(exact, ["t_a", "t_b"])
        .select("t_a", "t_b", F.col("n_exact").cast("long").alias("n_exact"), est)
    )


# -- fixed-grid histogram quantiles (deterministic, mergeable) ----------------

_QH_WIDTH = 512  # bin width; a power of two, so v/512 is exact IEEE scaling
_QH_PS = [25, 50, 90, 99]  # integer percentiles: rank k = ceil(p*n/100)


@register(
    "sketch_quantile_histogram",
    oracle=f"""
    WITH li AS (
        SELECT l_returnflag AS scope, CAST(l_extendedprice AS DOUBLE) AS v
        FROM lineitem
    ),
    states AS (
        SELECT scope, CAST(FLOOR(v / {_QH_WIDTH}) AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM li GROUP BY 1, 2
    ),
    merged AS (
        SELECT '__all__' AS scope, bin, CAST(SUM(cnt) AS BIGINT) AS cnt
        FROM states GROUP BY 2
    ),
    scoped AS (
        SELECT * FROM states UNION ALL SELECT * FROM merged
    ),
    ks AS (
        SELECT t.scope, t.n, u.p, (u.p * t.n + 99) // 100 AS k
        FROM (SELECT scope, CAST(SUM(cnt) AS BIGINT) AS n
              FROM scoped GROUP BY 1) t,
             UNNEST({_QH_PS}) AS u(p)
    ),
    cum AS (
        SELECT scope, bin,
               CAST(SUM(cnt) OVER (PARTITION BY scope ORDER BY bin) AS BIGINT)
                   AS cum
        FROM scoped
    ),
    hit AS (
        SELECT c.scope, k.p, k.n, k.k, MIN(c.bin) AS qbin
        FROM cum c JOIN ks k ON k.scope = c.scope
        WHERE c.cum >= k.k
        GROUP BY 1, 2, 3, 4
    ),
    rows_ AS (
        SELECT scope, v FROM li UNION ALL SELECT '__all__', v FROM li
    ),
    rn AS (
        SELECT scope, v, ROW_NUMBER() OVER (PARTITION BY scope ORDER BY v)
                   AS rn
        FROM rows_
    ),
    exact AS (
        SELECT r.scope, k.p, r.v AS exact_q
        FROM rn r JOIN ks k ON k.scope = r.scope AND r.rn = k.k
    )
    SELECT h.scope, CAST(h.p AS INTEGER) AS p,
           CAST(h.n AS BIGINT) AS n, CAST(h.k AS BIGINT) AS k,
           CAST((h.qbin + 1) * {_QH_WIDTH} AS DOUBLE) AS est_q,
           e.exact_q,
           (e.exact_q >= h.qbin * {_QH_WIDTH}
                AND e.exact_q < (h.qbin + 1) * {_QH_WIDTH}) AS within_bin
    FROM hit h JOIN exact e ON e.scope = h.scope AND e.p = h.p
    """,
)
def quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-grid histogram quantiles — the deterministic, MERGEABLE
    quantile sketch completing the sketch shelf (KMV distincts, HLL, CMS;
    VERDICT r5 item #4), paired with agg_percentiles the way HLL pairs
    with approx_count_distinct.

    Sketch state is ``(scope, bin, cnt)`` with ``bin = floor(v / 512)`` —
    512 is a power of two, so the division is exact IEEE scaling and the
    bin id is engine-exact by construction (no ln/log, no CAST rounding).
    The ``__all__`` scope is folded FROM THE PER-GROUP STATES alone by
    bin-wise count sum — sum(cnt_a, cnt_b) == cnt_{{a∪b}} is exact, which
    pins the histogram's defining mergeability the same way
    sketch_hll_union pins register-wise max. Rank targets are pure
    integers: k = ceil(p·n/100) = (p·n + 99) div 100.

    The estimate for percentile p is the upper edge of the first bin whose
    cumulative count reaches k; the gate also carries the EXACT k-th order
    statistic and pins the accuracy contract ``exact_q ∈ [qbin·512,
    (qbin+1)·512)`` — true by construction of the hit bin, so any binning
    or merge defect flips a hash-checked boolean.

    Scale shape: the sketch path exchanges O(scopes × bins) rows (≤ ~206
    bins here) regardless of corpus size, fully partial-aggregable; bin
    width tunes accuracy vs state like HLL's register count. The exact-
    rank companion is gate scaffolding, and even it is bin-local: the
    k-th value is ranked only among the hit bin's rows (located by the
    histogram itself, joined via broadcast), so no window partition ever
    exceeds one bin's population — there is no global per-scope sort
    anywhere in the plan. At 100 TB you ship only the states, exactly as
    the HLL/KMV gates do with their exact-count columns.

    r21 session 2 (guide §2.4 — remove duplicated subtree executions;
    results bit-identical, A/B-asserted): the executed plan ran 38
    exchanges / 14 lineitem scans with ZERO runtime exchange reuse,
    because (a) ``scoped`` was states ∪ merged-FROM-states (the states
    subtree executed once per leg) and (b) the final ``hit ⋈ exact`` join
    re-executed the whole hit tree a second time. Now (a) ``scoped``
    aggregates ONE explode(array(scope, '__all__')) pass — bin-wise
    count over the doubled rows ≡ the bin-wise count sum, exactly the
    mergeability the gate pins, one scan + the same partial agg instead
    of two subtree executions; (b) the broadcast to the exact-rank pass
    carries ALL of hit's columns, so the exact row IS the output row and
    the second hit execution disappears. 14 scans → 5, 38 exchanges →
    15, 1 SMJ → 0; interleaved min-of-5 at sf0.1: 1.308 → 0.871 s
    (0.67×). At scale the explode trades a second full scan for one
    extra map-side pass over already-read batches — strictly cheaper."""
    from pyspark.sql.window import Window as W

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("scope"),
        F.col("l_extendedprice").cast("double").alias("v"),
    )
    # each value contributes to its own scope AND '__all__': one scan, one
    # partial-aggregable groupBy — replaces states ∪ merged(states)
    rows = li.select(
        F.explode(F.array(F.col("scope"), F.lit("__all__"))).alias("scope"),
        "v",
    )
    scoped = (
        rows.select("scope", F.floor(F.col("v") / _QH_WIDTH).alias("bin"))
        .groupBy("scope", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # the rank targets (ks) and the cumulative walk (cum) both consume
        # the sketch state: one lineitem pass builds it, not two (r22).
        # O(scopes x bins) rows — the mergeable state itself.
        .localCheckpoint(eager=False)
    )
    ks = (
        scoped.groupBy("scope")
        .agg(F.sum("cnt").alias("n"))
        .select(
            "scope",
            F.col("n").cast("long").alias("n"),
            F.explode(F.array(*[F.lit(p) for p in _QH_PS])).alias("p"),
        )
        .withColumn("k", F.expr("CAST((p * n + 99) DIV 100 AS BIGINT)"))
    )
    cum = scoped.withColumn(
        "cum",
        F.sum("cnt")
        .over(
            W.partitionBy("scope")
            .orderBy("bin")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .cast("long"),
    )
    hit = (
        cum.join(ks, "scope")
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("scope", "p", "n", "k")
        # min-struct: the hit bin AND its cumulative in one deterministic
        # pick (bin is unique per scope, so the struct order is total)
        .agg(F.min(F.struct("bin", "cum", "cnt")).alias("s"))
        .select(
            "scope",
            "p",
            "n",
            "k",
            F.col("s.bin").alias("qbin"),
            (F.col("s.cum") - F.col("s.cnt")).alias("cum_before"),
        )
    )
    # exact k-th order statistic, ranked WITHIN the hit bin only: the k-th
    # smallest overall is the (k - cum_before)-th smallest inside the bin
    # the histogram already located — a bin-local sort (O(bin) rows per
    # window partition), never a global per-scope sort. The broadcast
    # carries every hit column, so the surviving rank row IS the output
    # row — no join back to hit (which would re-execute its whole tree).
    in_bin = rows.join(
        F.broadcast(
            hit.select(
                F.col("scope").alias("h_scope"),
                "p",
                "n",
                "k",
                "qbin",
                "cum_before",
            )
        ),
        (F.col("scope") == F.col("h_scope"))
        & (F.floor(F.col("v") / _QH_WIDTH) == F.col("qbin")),
    )
    return (
        in_bin.withColumn(
            "rn_in",
            F.row_number().over(W.partitionBy("scope", "p").orderBy("v")),
        )
        .filter(F.col("rn_in") == F.col("k") - F.col("cum_before"))
        .select(
            "scope",
            F.col("p").cast("int").alias("p"),
            "n",
            "k",
            ((F.col("qbin") + 1) * _QH_WIDTH).cast("double").alias("est_q"),
            F.col("v").alias("exact_q"),
            (
                (F.col("v") >= F.col("qbin") * _QH_WIDTH)
                & (F.col("v") < (F.col("qbin") + 1) * _QH_WIDTH)
            ).alias("within_bin"),
        )
    )


@register(
    "sketch_cms_union",
    oracle=f"""
    WITH keyed AS (
        SELECT event_type AS t, CAST(user_id AS VARCHAR) AS k FROM events
    ),
    cells AS (
        {" UNION ALL ".join(
            f"SELECT t, {i} AS row_i, {_cms_pos_duck(i, 'k')} AS col_j, k "
            "FROM keyed"
            for i in range(CMS_D)
        )}
    ),
    states AS (
        SELECT t, row_i, col_j, CAST(COUNT(*) AS BIGINT) AS c
        FROM cells GROUP BY 1, 2, 3
    ),
    merged AS (
        SELECT row_i, col_j, CAST(SUM(c) AS BIGINT) AS c
        FROM states GROUP BY 1, 2
    ),
    exact AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS n_exact FROM keyed GROUP BY 1
    ),
    probes AS (
        {" UNION ALL ".join(
            f"SELECT k, {i} AS row_i, {_cms_pos_duck(i, 'k')} AS col_j "
            "FROM exact"
            for i in range(CMS_D)
        )}
    ),
    est AS (
        SELECT p.k, MIN(m.c) AS n_est
        FROM probes p JOIN merged m
          ON m.row_i = p.row_i AND m.col_j = p.col_j
        GROUP BY 1
    ),
    ranked AS (
        SELECT e.k AS user_key, x.n_exact, e.n_est,
               (e.n_est >= x.n_exact) AS one_sided,
               ROW_NUMBER() OVER (ORDER BY x.n_exact DESC, e.k) AS rn
        FROM est e JOIN exact x ON x.k = e.k
    )
    SELECT user_key, n_exact, n_est, one_sided FROM ranked
    WHERE rn <= {CMS_TOPN}
    """,
)
def cms_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS MERGE: per-event-type Count-Min STATES are folded into a
    whole-stream sketch by CELL-WISE SUM, and the merged sketch — never
    the raw union stream — answers the global heavy-hitter probes. The
    fold is exact, not approximate: a CMS is linear in its input
    multiset, so sum of states == state of the multiset union, the
    counting-sketch analogue of hll_union's register-wise max and
    kmv_union's merged order statistics. ``one_sided`` pins CMS's
    defining n_est >= n_exact guarantee THROUGH the merge — any fold
    defect (double count, dropped cell) flips a hash-checked boolean or
    the estimates themselves.

    Scale shape: per-stream states are what an ingest pipeline persists
    per batch/source; the merge exchange carries O(streams * d * w) =
    O(streams * {CMS_D * CMS_W}) counter rows regardless of stream
    size, and probing stays O(d) lookups per candidate against a
    broadcast sketch."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.col("event_type").alias("t"),
        F.col("user_id").cast("string").alias("k"),
    )
    cells = keyed.select(
        "t",
        "k",
        F.posexplode(
            F.array(*[F.expr(_cms_pos_spark(i, "k")) for i in range(CMS_D)])
        ).alias("row_i", "col_j"),
    )
    states = cells.groupBy("t", "row_i", "col_j").agg(
        F.count(F.lit(1)).alias("c")
    )
    merged = states.groupBy("row_i", "col_j").agg(F.sum("c").alias("c"))
    exact = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("n_exact"))
    probes = exact.select(
        "k",
        F.posexplode(
            F.array(*[F.expr(_cms_pos_spark(i, "k")) for i in range(CMS_D)])
        ).alias("row_i", "col_j"),
    )
    est = (
        probes.join(F.broadcast(merged), ["row_i", "col_j"])
        .groupBy("k")
        .agg(F.min("c").alias("n_est"))
    )
    return (
        est.join(exact, "k")
        .select(
            F.col("k").alias("user_key"),
            "n_exact",
            F.col("n_est").cast("long").alias("n_est"),
            (F.col("n_est") >= F.col("n_exact")).alias("one_sided"),
        )
        .orderBy(F.desc("n_exact"), F.asc("user_key"))
        .limit(CMS_TOPN)
    )



@register(
    "sketch_kmv_difference",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CASE WHEN CAST(strftime(ts, '%d') AS INTEGER) <= 3
                    THEN 1 ELSE 2 END AS period,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        FROM events
        WHERE CAST(strftime(ts, '%d') AS INTEGER) <= 6
    ),
    uni AS (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        FROM (SELECT DISTINCT event_type, hv FROM h)
        GROUP BY event_type, hv
    ),
    unionk AS (SELECT event_type, hv FROM uni WHERE rn <= {KMV_K}),
    uk AS (
        SELECT event_type, MAX(hv) AS hk, COUNT(*) AS k_eff FROM unionk
        GROUP BY 1
    ),
    probe AS (
        SELECT u.event_type,
               COUNT(CASE WHEN b.hv IS NULL THEN 1 END) AS n_only_a
        FROM unionk u
        JOIN h a ON a.event_type = u.event_type AND a.period = 1
               AND a.hv = u.hv
        LEFT JOIN h b ON b.event_type = u.event_type AND b.period = 2
               AND b.hv = u.hv
        GROUP BY 1
    ),
    exact AS (
        SELECT a.event_type,
               COUNT(CASE WHEN b.hv IS NULL THEN 1 END) AS n_exact
        FROM h a
        LEFT JOIN h b ON b.event_type = a.event_type AND b.period = 2
               AND b.hv = a.hv
        WHERE a.period = 1
        GROUP BY 1
    )
    SELECT uk.event_type,
           CAST(exact.n_exact AS BIGINT) AS n_exact,
           CAST(COALESCE(probe.n_only_a, 0) AS DOUBLE) / CAST(uk.k_eff AS DOUBLE)
             * (CAST(uk.k_eff - 1 AS DOUBLE) / (CAST(uk.hk AS DOUBLE) / {_HASH_RANGE!r}))
             AS est_difference
    FROM uk
    LEFT JOIN probe ON probe.event_type = uk.event_type
    JOIN exact ON exact.event_type = uk.event_type
    """,
)
def kmv_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-DIFFERENCE estimate — the third Theta-sketch algebra
    operation, closing the family over the same mergeable KMV states as
    distinct/union/intersection. The question is CHURN: per event type,
    how many users active in days 1-3 never returned in days 4-6
    (A = early actives, B = following-window actives, estimate
    |A \\ B|). Within the union-KMV sample, count members of A absent from
    B — an anti-membership probe, the intersection estimator with the
    predicate negated — and scale by the union cardinality estimate. The
    zero-surviving-probe case yields an HONEST 0-estimate ROW (conditional
    count over a left join, never a filter that can empty the group; the
    first cut of this query silently dropped A⊆B pairs — structurally
    empty gates prove nothing). All-integer inputs into two IEEE
    divisions; exact |A \\ B| alongside as the error contract.

    Scale shape: K-row sketch per set, hash-keyed probe joins — no
    corpus-sized set operation anywhere."""
    ev = load_table(spark, sf_dir, "events").filter(F.dayofmonth("ts") <= 6)
    h = ev.select(
        "event_type",
        F.when(F.dayofmonth("ts") <= 3, 1).otherwise(2).alias("period"),
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("hv"),
    ).distinct()
    uni = (
        h.select("event_type", "hv")
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("event_type").orderBy(F.asc("hv"))),
        )
    )
    unionk = uni.filter(F.col("rn") <= KMV_K).select("event_type", "hv")
    uk = unionk.groupBy("event_type").agg(
        F.max("hv").alias("hk"), F.count(F.lit(1)).alias("k_eff")
    )
    ha = h.filter(F.col("period") == 1).select(
        F.col("event_type").alias("e_a"), F.col("hv").alias("hv_a")
    )
    hb = h.filter(F.col("period") == 2).select(
        F.col("event_type").alias("e_b"), F.col("hv").alias("hv_b")
    )
    probe = (
        unionk.join(
            ha,
            (F.col("e_a") == F.col("event_type")) & (F.col("hv_a") == F.col("hv")),
        )
        .join(
            hb,
            (F.col("e_b") == F.col("event_type")) & (F.col("hv_b") == F.col("hv")),
            "left",
        )
        .groupBy("event_type")
        .agg(F.count(F.when(F.col("hv_b").isNull(), 1)).alias("n_only_a"))
    )
    exact = (
        ha.join(
            hb,
            (F.col("e_b") == F.col("e_a")) & (F.col("hv_b") == F.col("hv_a")),
            "left",
        )
        .groupBy(F.col("e_a").alias("event_type"))
        .agg(
            F.count(F.when(F.col("hv_b").isNull(), 1))
            .cast("long")
            .alias("n_exact")
        )
    )
    est = (
        F.coalesce(F.col("n_only_a"), F.lit(0)).cast("double")
        / F.col("k_eff").cast("double")
        * (
            (F.col("k_eff") - 1).cast("double")
            / (F.col("hk").cast("double") / F.lit(_HASH_RANGE))
        )
    )
    return (
        uk.join(probe, ["event_type"], "left")
        .join(exact, ["event_type"])
        .select("event_type", "n_exact", est.alias("est_difference"))
    )


# -- join cardinality estimation via coordinated key sampling -----------------

_JC_SHIFT = 4  # sample keys where hv < 2^60 / 2^4  ->  1/16 of the key domain
_JC_CUT = (1 << 60) >> _JC_SHIFT
_JC_SCALE = 1 << _JC_SHIFT


@register(
    "sketch_join_cardinality",
    oracle=f"""
    WITH co AS (
        SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS ca
        FROM orders GROUP BY 1
    ), cl AS (
        SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cb
        FROM lineitem GROUP BY 1
    ), exact AS (
        SELECT CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS exact_pairs
        FROM co JOIN cl USING (k)
    ), sampled AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS sampled_keys,
               CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS sampled_pairs
        FROM co JOIN cl USING (k)
        WHERE ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT
              < {_JC_CUT}
    )
    SELECT exact_pairs, sampled_keys,
           sampled_pairs * {_JC_SCALE} AS est_pairs,
           ((sampled_pairs * {_JC_SCALE} - exact_pairs) * 10000)
               // NULLIF(exact_pairs, 0) AS err_bp
    FROM exact CROSS JOIN sampled
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation by COORDINATED key sampling — the optimizer
    statistic behind join reordering, as a first-class sketch: both sides
    keep only keys whose shared md5 hash falls under 2^60/{_JC_SCALE}
    (the same key survives on both sides or neither — that coordination is
    what makes the estimator unbiased: E[Σ_sampled ca·cb · {_JC_SCALE}] =
    |A ⋈ B|), then the sampled per-key count products are summed and scaled
    by the exact integer inverse rate. The fixture also computes the true
    join size so the gate pins estimate AND error together.

    Scale: per-side counts are partial-aggregable; the hash filter cuts the
    key domain 16× BEFORE any shuffle, so the estimation join moves 1/16th
    of the key stats regardless of row count — this is how you size a
    100 TB join without running it. All integer: estimate, scale, and
    basis-point error reproduce bit-for-bit on any engine.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    co = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    cl = lineitem.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    hv = F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    exact = (
        co.join(cl, "k")
        .agg(F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0)).alias("exact_pairs"))
    )
    sampled = (
        co.filter(hv < _JC_CUT)
        .join(cl.filter(hv < _JC_CUT), "k")
        .agg(
            F.count(F.lit(1)).alias("sampled_keys"),
            F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0)).alias(
                "sampled_pairs"
            ),
        )
    )
    return (
        exact.crossJoin(F.broadcast(sampled))
        .select(
            "exact_pairs",
            "sampled_keys",
            (F.col("sampled_pairs") * _JC_SCALE).alias("est_pairs"),
            # NULLIF on both sides: an empty join must yield a NULL error,
            # not an ANSI DIVIDE_BY_ZERO (Spark 4 default) vs NULL (DuckDB)
            # divergence
            F.expr(
                f"((sampled_pairs * {_JC_SCALE} - exact_pairs) * 10000)"
                " div nullif(exact_pairs, 0)"
            ).alias("err_bp"),
        )
    )


# -- Bloom filter membership sketch: measured false-positive rate --------------

_BF_WORDS = 16  # bitmap words
_BF_BITS = _BF_WORDS * 63  # 63 usable bits/word keeps shifts in signed int64
_BF_K = 3  # hash functions
_BF_PROBE_BASE = 1_000_000  # probe keys live far outside the user-id domain
_BF_PROBES = 1_000


def _bf_pos_sql(key: str, i: int, engine: str) -> str:
    """Bit position i for a key: an md5 slice per hash function, identical
    in both engines (disjoint 10-hex-digit slices, far below 2^63)."""
    start = 1 + 10 * i
    if engine == "spark":
        h = (
            f"CAST(conv(substring(md5(CAST({key} AS STRING)),"
            f" {start}, 10), 16, 10) AS BIGINT)"
        )
    else:
        h = f"('0x' || substr(md5(CAST({key} AS VARCHAR)), {start}, 10))::BIGINT"
    return f"({h} % {_BF_BITS})"


@register(
    "sketch_bloom_membership",
    oracle=f"""
    WITH members AS (
        SELECT DISTINCT user_id FROM events
    ), probes AS (
        SELECT range AS probe_key
        FROM range({_BF_PROBE_BASE}, {_BF_PROBE_BASE + _BF_PROBES})
    ), member_bits AS (
        SELECT DISTINCT pos FROM members, UNNEST([
            {", ".join(_bf_pos_sql("user_id", i, "duck") for i in range(_BF_K))}
        ]) AS t(pos)
    ), bitmap AS (
        SELECT pos // 63 AS w, bit_or(1::BIGINT << (pos % 63)) AS bits
        FROM member_bits GROUP BY 1
    ), probe_bits AS (
        SELECT p.probe_key, t.pos
        FROM probes p, UNNEST([
            {", ".join(_bf_pos_sql("probe_key", i, "duck") for i in range(_BF_K))}
        ]) AS t(pos)
    ), probe_hits AS (
        SELECT p.probe_key,
               CAST(COUNT(*) FILTER (
                   b.w IS NOT NULL
                   AND (b.bits & (1::BIGINT << (p.pos % 63))) <> 0
               ) AS BIGINT) AS n_hit
        FROM probe_bits p LEFT JOIN bitmap b ON b.w = p.pos // 63
        GROUP BY 1
    )
    SELECT CAST((SELECT COUNT(*) FROM members) AS BIGINT)    AS n_members,
           CAST(COUNT(*) AS BIGINT)                          AS n_probes,
           CAST(COUNT(*) FILTER (n_hit = {_BF_K}) AS BIGINT) AS n_false_pos,
           CAST((1000000 * COUNT(*) FILTER (n_hit = {_BF_K}))
                // COUNT(*) AS BIGINT)                       AS fpr_ppm
    FROM probe_hits
    """,
)
def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter as a RELATIONAL sketch with its own measured error —
    the membership member of the sketch family (HLL: cardinality, CMS:
    frequency, KMV: set algebra; this: "have we seen this key"). The
    distinct-user set folds into a {_BF_WORDS}-word bitmap ({_BF_K}
    md5-slice hash functions, 63 usable bits per word so shifts stay in
    signed int64 — the agg_bitmap_distinct convention); {_BF_PROBES}
    DISJOINT synthetic keys (offset far outside the user-id domain) probe
    it, and a probe hitting all {_BF_K} bits is a certain false
    positive — measured FPR in exact ppm, the estimator-vs-truth contract
    every sketch here ships. The filter is deliberately small so the
    driver-scale fixture measures a LIVE error (~5% at sf0.01); at the
    tiny SF the honest measurement may be 0 of {_BF_PROBES} (expected
    ~1e-4) — the parameters, not the probe, decide that.

    Mergeability is the scale story: the bitmap is a bit_or aggregate, so
    per-partition bitmaps combine map-side and the whole filter is
    {_BF_WORDS} BIGINTs riding a broadcast — the shape behind
    join_bloom_prefilter, here as a first-class gate-checked artifact.
    All arithmetic is integer; both engines build bit-identical bitmaps.
    """
    ev = load_table(spark, sf_dir, "events")
    members = ev.select("user_id").distinct()
    probes = spark.range(_BF_PROBE_BASE, _BF_PROBE_BASE + _BF_PROBES).select(
        F.col("id").alias("probe_key")
    )
    member_pos = ", ".join(
        _bf_pos_sql("user_id", i, "spark") for i in range(_BF_K)
    )
    probe_pos = ", ".join(
        _bf_pos_sql("probe_key", i, "spark") for i in range(_BF_K)
    )
    member_bits = members.selectExpr(
        f"explode(array({member_pos})) AS pos"
    ).distinct()
    bitmap = member_bits.groupBy(F.expr("pos div 63").alias("w")).agg(
        F.expr("bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT))").alias(
            "bits"
        )
    )
    probe_bits = probes.selectExpr(
        "probe_key", f"explode(array({probe_pos})) AS pos"
    )
    probe_hits = (
        probe_bits.join(F.broadcast(bitmap), F.expr("w = pos div 63"), "left")
        .groupBy("probe_key")
        .agg(
            F.sum(
                F.when(
                    F.expr(
                        "w IS NOT NULL AND"
                        " (bits & (CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)))"
                        " != 0"
                    ),
                    1,
                ).otherwise(0)
            ).alias("n_hit")
        )
    )
    n_members = members.agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    return (
        probe_hits.agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.sum(F.when(F.col("n_hit") == _BF_K, 1).otherwise(0))
            .cast("long")
            .alias("n_false_pos"),
        )
        .crossJoin(F.broadcast(n_members))
        .select(
            "n_members",
            "n_probes",
            "n_false_pos",
            F.expr("(1000000 * n_false_pos) div n_probes")
            .cast("long")
            .alias("fpr_ppm"),
        )
    )
bloom_membership.__doc__ = bloom_membership.__doc__.format(_BF_WORDS=_BF_WORDS, _BF_K=_BF_K, _BF_PROBES=_BF_PROBES)  # real docstring (ADVICE r7)

# -- AMS second-moment sketch (deferred: r10 activation) -------------------------

#: independent ±1 hash rows; the AMS estimator averages (or medians) X_j²
_AMS_ROWS = 8


@register(
    "sketch_ams_f2",
    oracle=f"""
    WITH c AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1
    ),
    f2 AS (SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS exact_f2 FROM c),
    rows_ AS (
        SELECT j,
               CAST(SUM(CASE WHEN ('0x' || substr(md5(j || '_' ||
                              CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
                         THEN cnt ELSE -cnt END) AS BIGINT) AS sketch_sum
        FROM c CROSS JOIN generate_series(0, {_AMS_ROWS - 1}) t(j)
        GROUP BY 1
    )
    SELECT CAST(j AS INT) AS j, sketch_sum,
           CAST(sketch_sum * sketch_sum AS BIGINT) AS est_f2,
           exact_f2,
           CAST((1000000 * ABS(sketch_sum * sketch_sum - exact_f2))
                // exact_f2 AS BIGINT) AS err_ppm
    FROM rows_, f2
    """,
)
def ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment (F₂) sketch of the per-user event frequency vector
    (Alon–Matias–Szegedy '96): each of {_AMS_ROWS} rows keeps ONE integer
    X_j = Σ s_j(u)·c_u under a ±1 hash; E[X_j²] = F₂ = Σ c_u², the
    self-join size / repeat-rate moment behind join-size estimation and
    skew detection. Like the KMV battery, the hash is md5-derived and
    engine-identical, so the ESTIMATE (not just the exact answer) is
    bit-reproducible cross-engine and its per-row error is part of the
    gated result. F₂ completes the frequency-moment kit: F₀ = KMV/HLL,
    F₁ = COUNT, F₂ = AMS.

    Shape: the per-user count relation fans out ×{_AMS_ROWS} and partial-
    aggregates to {_AMS_ROWS} integers — the sketch state is mergeable by
    addition (any partition order), which is exactly what makes AMS a
    one-pass distributed sketch at 100 TB. Exact F₂ rides the same scan
    for the error gate.
    """
    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # feeds the sketch fan-out AND the exact-F2 gate: one corpus scan
        .localCheckpoint(eager=False)
    )
    f2 = c.agg(F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("exact_f2"))
    sign_even = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("j").cast("string"),
                        F.lit("_"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    )
    rows = (
        c.select(
            "user_id",
            "cnt",
            F.explode(F.sequence(F.lit(0), F.lit(_AMS_ROWS - 1))).alias("j"),
        )
        .groupBy("j")
        .agg(
            F.sum(F.when(sign_even, F.col("cnt")).otherwise(-F.col("cnt")))
            .cast("long")
            .alias("sketch_sum")
        )
    )
    return rows.crossJoin(F.broadcast(f2)).select(
        F.col("j").cast("int").alias("j"),
        "sketch_sum",
        (F.col("sketch_sum") * F.col("sketch_sum")).cast("long").alias("est_f2"),
        "exact_f2",
        F.expr(
            "CAST((1000000 * ABS(sketch_sum * sketch_sum - exact_f2))"
            " div exact_f2 AS BIGINT)"
        ).alias("err_ppm"),
    )


from ..docfmt import format_docstrings  # noqa: E402
format_docstrings(globals())  # substitute {CONST} docstring placeholders (ADVICE r8)
