"""Table profiling & Z-order layout keys (SURVEY.md §2.9, data management).

* **profile** — per-column null counts, exact distinct counts, min/max for a
  declared column set, unpivoted to one row per column. One pass over the
  table (all aggregates in a single partial+final HashAggregate), then a
  constant-sized unpivot — the shape data-quality gates run before every
  100 TB ingest promotion.
* **Z-order key** — bit-interleaving of two bounded dimension keys into one
  space-filling-curve value, in pure int64 arithmetic (bit-identical in
  DuckDB). Sorting/range-partitioning by ``z`` co-locates rows that are
  close in BOTH dimensions, so min/max parquet footer stats prune
  two-predicate scans — the standard lakehouse data-skipping layout
  (:func:`write_zordered`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io import load_table
from ..registry import register

__all__ = ["profile_columns", "zorder_key_expr", "write_zordered"]

# -- one-pass profile ---------------------------------------------------------

#: (name, SQL expression yielding a canonical STRING value) — values are
#: stringified CANONICALLY (integers, dates) so both engines render alike;
#: raw doubles are quantized before profiling for the same reason.
_PROFILE_COLS = [
    ("l_orderkey", "CAST(l_orderkey AS BIGINT)"),
    ("l_quantity", "CAST(l_quantity AS BIGINT)"),
    ("l_returnflag", "l_returnflag"),
    ("l_shipdate", "CAST(l_shipdate AS DATE)"),
]


def profile_columns(df: DataFrame) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, expr in _PROFILE_COLS:
        aggs += [
            F.sum(F.expr(f"CASE WHEN ({expr}) IS NULL THEN 1 ELSE 0 END"))
            .cast("long")
            .alias(f"null_{name}"),
            F.countDistinct(F.expr(expr)).alias(f"dist_{name}"),
            F.expr(f"CAST(MIN({expr}) AS STRING)").alias(f"min_{name}"),
            F.expr(f"CAST(MAX({expr}) AS STRING)").alias(f"max_{name}"),
        ]
    wide = df.agg(*aggs)
    stats = F.array(
        *[
            F.struct(
                F.lit(name).alias("column"),
                F.col(f"null_{name}").alias("n_null"),
                F.col(f"dist_{name}").alias("n_distinct"),
                F.col(f"min_{name}").alias("min_value"),
                F.col(f"max_{name}").alias("max_value"),
            )
            for name, _ in _PROFILE_COLS
        ]
    )
    return wide.select("n_rows", F.explode(stats).alias("s")).select(
        F.col("s.column").alias("column"),
        F.col("n_rows").cast("long").alias("n_rows"),
        "s.n_null",
        "s.n_distinct",
        "s.min_value",
        "s.max_value",
    )


def _profile_oracle() -> str:
    branches = " UNION ALL ".join(
        f"""SELECT '{name}' AS column,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN ({expr}) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT ({expr})) AS BIGINT) AS n_distinct,
               CAST(MIN({expr}) AS VARCHAR) AS min_value,
               CAST(MAX({expr}) AS VARCHAR) AS max_value
        FROM lineitem"""
        for name, expr in _PROFILE_COLS
    )
    return branches


@register("profile_table_stats", oracle=_profile_oracle())
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of lineitem: one row per audited column."""
    return profile_columns(load_table(spark, sf_dir, "lineitem"))


# -- Z-order ------------------------------------------------------------------

_Z_BITS = 16


def zorder_key_expr(x: str, y: str, bits: int = _Z_BITS) -> str:
    """Interleave the low ``bits`` of two non-negative int expressions into
    a Morton key — plain int64 arithmetic, identical text on both engines:
    bit i of x lands at 2i, bit i of y at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({y}) // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def write_zordered(df: DataFrame, path: str, x: str, y: str, files: int) -> None:
    """Materialize ``df`` range-partitioned + sorted by the Morton key of
    (x, y): each output file covers a compact 2-D region, so parquet
    min/max stats on x AND y prune two-predicate scans."""
    z = zorder_key_expr(x, y).replace("//", "div")
    (
        df.withColumn("_z", F.expr(z))
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


_Z_BUCKETS = 16


#: the registered stats query folds keys into 8 bits so the z space (2^16)
#: is fully exercised at every test SF (raw suppkey tops out ~100 at
#: sf0.01 — under 16-bit interleave everything lands in bucket 0).
_Z_STAT_BITS = 8


@register(
    "layout_zorder_stats",
    oracle=f"""
    WITH z AS (
        SELECT {zorder_key_expr("l_partkey % 256", "l_suppkey % 256", _Z_STAT_BITS)} AS zval
        FROM lineitem
    )
    SELECT CAST(zval // {(1 << (2 * _Z_STAT_BITS)) // _Z_BUCKETS} AS BIGINT) AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(zval) AS BIGINT) AS z_min,
           CAST(MAX(zval) AS BIGINT) AS z_max
    FROM z GROUP BY 1
    """,
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-key distribution of lineitem over (partkey, suppkey): the
    range-bucket histogram a Z-ordered writer would use to place files."""
    li = load_table(spark, sf_dir, "lineitem")
    z = zorder_key_expr("l_partkey % 256", "l_suppkey % 256", _Z_STAT_BITS).replace(
        "//", "div"
    )
    return (
        li.select(F.expr(z).alias("zval"))
        .groupBy(
            F.expr(
                f"CAST(zval div {(1 << (2 * _Z_STAT_BITS)) // _Z_BUCKETS} AS BIGINT)"
            ).alias("z_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
    )


@register(
    "quality_constraint_audit",
    oracle="""
    WITH base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50)
                             THEN 1 ELSE 0 END) AS BIGINT) AS qty,
               CAST(SUM(CASE WHEN l_extendedprice <= 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS price,
               CAST(SUM(CASE WHEN NOT (l_discount BETWEEN 0 AND 1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS disc,
               CAST(SUM(CASE WHEN l_shipdate IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS ship
        FROM lineitem
    ),
    dup AS (
        SELECT CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
                   AS n_violations,
               CAST(SUM(c) AS BIGINT) AS n_rows
        FROM (SELECT COUNT(*) AS c FROM lineitem
              GROUP BY l_orderkey, l_linenumber)
    )
    SELECT 'quantity_in_1_50' AS rule, qty AS n_violations, n_rows FROM base
    UNION ALL SELECT 'price_positive', price, n_rows FROM base
    UNION ALL SELECT 'discount_in_0_1', disc, n_rows FROM base
    UNION ALL SELECT 'shipdate_not_null', ship, n_rows FROM base
    UNION ALL SELECT 'pk_unique', n_violations, n_rows FROM dup
    """,
)
def quality_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ/DLT-expectations-style constraint audit: one row per declared
    rule with its violation count — range, positivity, not-null, and
    primary-key-uniqueness checks over lineitem.

    Scale shape: all row-level rules evaluate in ONE conditional-aggregate
    scan (a single partial+final agg, no per-rule passes); only the
    uniqueness rule needs its own keyed aggregation. `stack` unpivots the
    wide audit row map-side. This is the audit you bolt onto every ingest:
    adding a rule adds a column to the same scan, not a new job.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(~F.col("l_quantity").between(1, 50), 1).otherwise(0))
        .cast("long")
        .alias("qty"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("price"),
        F.sum(F.when(~F.col("l_discount").between(0, 1), 1).otherwise(0))
        .cast("long")
        .alias("disc"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("ship"),
    )
    row_rules = wide.selectExpr(
        "stack(4, 'quantity_in_1_50', qty, 'price_positive', price, "
        "'discount_in_0_1', disc, 'shipdate_not_null', ship) "
        "AS (rule, n_violations)",
        "n_rows",
    )
    pk = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.lit("pk_unique").alias("rule"),
            F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0))
            .cast("long")
            .alias("n_violations"),
            F.sum("c").cast("long").alias("n_rows"),
        )
    )
    return row_rules.unionByName(pk)


# -- distribution drift (total variation distance) — deferred r7 queue --------

_TVD_BIN = 100  # n_chars bin width


@register(
    "profile_drift_tvd",
    oracle=f"""
    WITH s AS (
        SELECT n_chars // {_TVD_BIN} AS bin,
               CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS is_a
        FROM documents
    ), tot AS (
        SELECT CAST(SUM(is_a) AS BIGINT)     AS n_a,
               CAST(SUM(1 - is_a) AS BIGINT) AS n_b
        FROM s
    ), bins AS (
        SELECT bin,
               CAST(SUM(is_a) AS BIGINT)     AS a_cnt,
               CAST(SUM(1 - is_a) AS BIGINT) AS b_cnt
        FROM s GROUP BY 1
    )
    SELECT CAST(b.bin AS BIGINT) AS bin, b.a_cnt, b.b_cnt,
           (1000000 * b.a_cnt) // t.n_a AS a_ppm,
           (1000000 * b.b_cnt) // t.n_b AS b_ppm,
           ABS((1000000 * b.a_cnt) // t.n_a
             - (1000000 * b.b_cnt) // t.n_b) AS abs_diff_ppm
    FROM bins b CROSS JOIN tot t
    """
)
def drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit: the per-bin ingredients of the total
    variation distance between two samples (even vs odd doc_ids standing
    in for reference vs candidate batches) over binned document length —
    TVD = Σ abs_diff_ppm / 2, the log-free drift metric (PSI needs a
    logarithm; TVD is a plain L1 gap, so it stays exact integer ppm and
    cross-engine). A pipeline gate reads this to refuse a batch whose
    length profile shifted.

    Shape: one map-only bin+flag projection, one |bins|-bounded groupBy,
    a 1-row totals broadcast. Emits per-bin rows so the consumer sees
    WHERE the mass moved, not just that it did.
    """
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        F.expr(f"n_chars div {_TVD_BIN}").alias("bin"),
        F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0).alias("is_a"),
    )
    tot = s.agg(
        F.sum("is_a").cast("long").alias("n_a"),
        F.sum(1 - F.col("is_a")).cast("long").alias("n_b"),
    )
    bins = s.groupBy("bin").agg(
        F.sum("is_a").cast("long").alias("a_cnt"),
        F.sum(1 - F.col("is_a")).cast("long").alias("b_cnt"),
    )
    return bins.crossJoin(F.broadcast(tot)).select(
        "bin",
        "a_cnt",
        "b_cnt",
        F.expr("(1000000 * a_cnt) div n_a").alias("a_ppm"),
        F.expr("(1000000 * b_cnt) div n_b").alias("b_ppm"),
        F.expr(
            "abs((1000000 * a_cnt) div n_a - (1000000 * b_cnt) div n_b)"
        ).alias("abs_diff_ppm"),
    )


# -- k-anonymity audit — deferred r7 queue ------------------------------------

_KANON_K = 5
_KANON_LEN_BUCKET = 200  # n_chars quasi-identifier coarsening


@register(
    "profile_k_anonymity",
    oracle=f"""
    WITH q AS (
        SELECT lang, source, n_chars // {_KANON_LEN_BUCKET} AS len_b
        FROM documents
    ), groups AS (
        SELECT lang, source, len_b, CAST(COUNT(*) AS BIGINT) AS group_size
        FROM q GROUP BY 1, 2, 3
    )
    SELECT lang, source, CAST(len_b AS BIGINT) AS len_b, group_size,
           CAST(group_size < {_KANON_K} AS BOOLEAN) AS violates_k
    FROM groups
    """
)
def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (lang, source,
    coarsened length): every equivalence class with its size and a
    violates-k={_KANON_K} flag — the privacy gate a release pipeline runs
    BEFORE publishing (classes smaller than k re-identify their members;
    the flagged rows are what suppression/generalization must fix, and
    the class list doubles as the generalization worksheet). Complements
    llm_pii_scrub: scrubbing removes direct identifiers, k-anonymity
    bounds what the quasi-identifiers still leak.

    Shape: ONE partial-aggregable groupBy over the quasi-identifier
    domain; the flag is a map-side comparison. Nothing scales with
    anything but the scan — auditing 100 TB costs one pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    groups = docs.groupBy(
        "lang", "source", F.expr(f"n_chars div {_KANON_LEN_BUCKET}").alias("len_b")
    ).agg(F.count(F.lit(1)).alias("group_size"))
    return groups.select(
        "lang",
        "source",
        "len_b",
        "group_size",
        (F.col("group_size") < _KANON_K).alias("violates_k"),
    )
k_anonymity.__doc__ = k_anonymity.__doc__.format(_KANON_K=_KANON_K)  # real docstring (ADVICE r7)


# -- l-diversity audit — deferred r7 queue ------------------------------------

_LDIV_L = 2  # each quasi-identifier class needs >= 2 distinct sensitive values


@register(
    "profile_l_diversity",
    oracle=f"""
    WITH q AS (
        SELECT source, n_chars // {_KANON_LEN_BUCKET} AS len_b,
               lang AS sensitive
        FROM documents
    ), groups AS (
        SELECT source, len_b,
               CAST(COUNT(*) AS BIGINT)                 AS group_size,
               CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS n_sensitive
        FROM q GROUP BY 1, 2
    )
    SELECT source, CAST(len_b AS BIGINT) AS len_b, group_size, n_sensitive,
           CAST(n_sensitive < {_LDIV_L} AS BOOLEAN) AS violates_l
    FROM groups
    """
)
def l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the attack k-anonymity misses: a class can be
    large yet have ONE sensitive value (here: lang as the sensitive
    attribute, (source, coarsened length) as the quasi-identifiers), so
    membership alone discloses it. Every class is emitted with its size,
    distinct-sensitive count, and a violates-l={_LDIV_L} flag; release
    gating requires BOTH audits green (profile_k_anonymity bounds
    re-identification, this bounds attribute disclosure).

    Shape: one partial-aggregable groupBy carrying COUNT plus
    COUNT(DISTINCT) over the class domain — still a single pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    groups = docs.groupBy(
        "source", F.expr(f"n_chars div {_KANON_LEN_BUCKET}").alias("len_b")
    ).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct("lang").alias("n_sensitive"),
    )
    return groups.select(
        "source",
        "len_b",
        "group_size",
        "n_sensitive",
        (F.col("n_sensitive") < _LDIV_L).alias("violates_l"),
    )
l_diversity.__doc__ = l_diversity.__doc__.format(_LDIV_L=_LDIV_L)  # real docstring (ADVICE r7)


# -- t-closeness audit — the distributional member of the privacy kit ---------

_TCLOSE_T_PPM = 300_000  # classes with TVD > 0.30 from the global mix violate


@register(
    "profile_t_closeness",
    oracle=f"""
    WITH q AS (
        SELECT source, n_chars // {_KANON_LEN_BUCKET} AS len_b,
               lang AS sensitive
        FROM documents
    ), classes AS (
        SELECT source, len_b, CAST(COUNT(*) AS BIGINT) AS n_c
        FROM q GROUP BY 1, 2
    ), cells AS (
        SELECT source, len_b, sensitive, CAST(COUNT(*) AS BIGINT) AS n_cv
        FROM q GROUP BY 1, 2, 3
    ), gdist AS (
        SELECT sensitive, CAST(COUNT(*) AS BIGINT) AS n_v,
               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_total
        FROM q GROUP BY 1
    ), dense AS (
        SELECT c.source, c.len_b, c.n_c, g.sensitive, g.n_v, g.n_total,
               COALESCE(x.n_cv, 0) AS n_cv
        FROM classes c CROSS JOIN gdist g
        LEFT JOIN cells x
          ON x.source = c.source AND x.len_b = c.len_b
         AND x.sensitive = g.sensitive
    )
    SELECT source, CAST(len_b AS BIGINT) AS len_b,
           CAST(MAX(n_c) AS BIGINT) AS group_size,
           CAST((1000000 * SUM(ABS(CAST(n_cv AS HUGEINT) * n_total
                                   - CAST(n_v AS HUGEINT) * n_c)))
                // (2 * CAST(MAX(n_c) AS HUGEINT) * MAX(n_total))
                AS BIGINT) AS tvd_ppm,
           CAST((1000000 * SUM(ABS(CAST(n_cv AS HUGEINT) * n_total
                                   - CAST(n_v AS HUGEINT) * n_c)))
                // (2 * CAST(MAX(n_c) AS HUGEINT) * MAX(n_total))
                > {_TCLOSE_T_PPM}
                AS BOOLEAN) AS violates_t
    FROM dense GROUP BY 1, 2
    """,
)
def t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the disclosure k-anonymity AND l-diversity both
    miss: a class can be large and diverse yet have a sensitive-value MIX
    wildly different from the table's (90% of one lang in a class that is
    5% globally still discloses), so the release kit's third gate bounds
    each class's distributional distance from the global mix. Distance is
    total variation (the equal-ground-distance Earth Mover's Distance for
    categorical attributes — the t-closeness paper's own choice), computed
    EXACTLY: per value, |n_cv/n_c - N_v/N| = |n_cv*N - N_v*n_c|/(n_c*N),
    so summing the integer numerators over the common denominator makes
    tvd_ppm = 1e6 * sum // (2*n_c*N) one integer division per class — no
    float ever. Intermediates run in DECIMAL(38,0) (Spark) / HUGEINT
    (DuckDB), the chi2_feature_selection recipe (ADVICE r7): exact to
    N ≈ 2e15 rows and loudly NULL (decimal overflow) past that, instead
    of the old int64 silent wrap at N ≈ 2.1e6.

    Shape: three partial-aggregable aggregates over the scan, then a
    CROSS JOIN of the (tiny) class relation against the (tiny) sensitive
    domain so missing (class, value) cells contribute their full
    |0 - N_v*n_c| mass — a LEFT-join densification, never a scan of
    anything data-sized. The release gate is all three audits green:
    k-anonymity (re-identification), l-diversity (attribute presence),
    t-closeness (attribute distribution)."""
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "source",
        F.expr(f"n_chars div {_KANON_LEN_BUCKET}").alias("len_b"),
        F.col("lang").alias("sensitive"),
    )
    classes = q.groupBy("source", "len_b").agg(
        F.count(F.lit(1)).alias("n_c")
    )
    cells = q.groupBy("source", "len_b", "sensitive").agg(
        F.count(F.lit(1)).alias("n_cv")
    )
    glob = q.groupBy("sensitive").agg(F.count(F.lit(1)).alias("n_v"))
    glob = glob.select(
        "sensitive", "n_v", F.sum("n_v").over(W.partitionBy()).alias("n_total")
    )
    dense = (
        classes.crossJoin(F.broadcast(glob))
        .join(cells, ["source", "len_b", "sensitive"], "left")
        .select(
            "source",
            "len_b",
            "n_c",
            "n_v",
            "n_total",
            F.coalesce("n_cv", F.lit(0)).alias("n_cv"),
        )
    )
    # DECIMAL(38,0)/HUGEINT intermediates (ADVICE r7, the chi2 recipe):
    # the BIGINT form wrapped silently past 1e6·2N² ≈ 9.2e18 (N ≈ 2.1e6
    # rows) in non-ANSI Spark while DuckDB's 128-bit SUM did not — now
    # exact to N ≈ 2e15 and LOUDLY NULL (decimal overflow) past that.
    tvd = F.expr(
        "(CAST(1000000 AS DECIMAL(38,0))"
        " * SUM(ABS(CAST(n_cv AS DECIMAL(19,0)) * n_total"
        "           - CAST(n_v AS DECIMAL(19,0)) * n_c)))"
        " div (2 * CAST(MAX(n_c) AS DECIMAL(19,0)) * MAX(n_total))"
    )
    return dense.groupBy("source", "len_b").agg(
        F.max("n_c").cast("long").alias("group_size"),
        tvd.cast("long").alias("tvd_ppm"),
        (tvd > _TCLOSE_T_PPM).alias("violates_t"),
    )


# -- mode imputation with ground-truth evaluation — deferred r7 queue ---------

_IMP_MISS_MOD = 11  # docs with doc_id % 11 == 0 have their lang "lost"


@register(
    "profile_mode_imputation",
    oracle=f"""
    WITH masked AS (
        SELECT doc_id, source, lang AS true_lang,
               CASE WHEN doc_id % {_IMP_MISS_MOD} = 0 THEN NULL
                    ELSE lang END AS lang
        FROM documents
    ), modes AS (
        SELECT source, lang AS mode_lang FROM (
            SELECT source, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY COUNT(*) DESC, lang) AS rk
            FROM masked WHERE lang IS NOT NULL
            GROUP BY source, lang
        ) WHERE rk = 1
    )
    SELECT m.doc_id, m.source, mo.mode_lang AS imputed_lang, m.true_lang,
           CASE WHEN mo.mode_lang = m.true_lang THEN 1 ELSE 0 END AS correct
    FROM masked m JOIN modes mo ON mo.source = m.source
    WHERE m.lang IS NULL
    """
)
def mode_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value repair with a built-in honesty check: every 11th
    doc's lang is masked, imputed with its source's mode (computed over
    the OBSERVED rows only — computing it over the truth would leak), and
    each imputed row carries the held-back true value and a correctness
    flag — imputation and its evaluation as ONE auditable artifact, the
    way a data-repair step should ship (a fill-rate without an accuracy
    number is marketing).

    Shape: the mode is |sources·langs| argmax rows broadcast back; the
    masked scan is map-only. Tie-break on the label keeps the mode
    deterministic cross-engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    masked = docs.select(
        "doc_id",
        "source",
        F.col("lang").alias("true_lang"),
        F.when(F.col("doc_id") % _IMP_MISS_MOD == 0, None)
        .otherwise(F.col("lang"))
        .alias("lang"),
    )
    modes = (
        masked.filter(F.col("lang").isNotNull())
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.desc("c"), F.asc("lang"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("source", F.col("lang").alias("mode_lang"))
    )
    return (
        masked.filter(F.col("lang").isNull())
        .join(F.broadcast(modes), "source")
        .select(
            "doc_id",
            "source",
            F.col("mode_lang").alias("imputed_lang"),
            "true_lang",
            F.when(F.col("mode_lang") == F.col("true_lang"), 1)
            .otherwise(0)
            .alias("correct"),
        )
    )


# -- one-pass column profiling: the data-quality dashboard's first screen -----

#: (profile label, Spark string-projection, DuckDB string-projection) —
#: every value is profiled THROUGH a canonical string form both engines
#: render identically (BIGINT/date/varchar casts; money quantized to cents
#: first — raw DOUBLE formatting differs between engines and is excluded).
_PROF_COLS = [
    ("o_orderkey", "CAST(o_orderkey AS STRING)", "CAST(o_orderkey AS VARCHAR)"),
    ("o_custkey", "CAST(o_custkey AS STRING)", "CAST(o_custkey AS VARCHAR)"),
    ("o_orderstatus", "o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority", "o_orderpriority"),
    (
        "o_orderdate",
        "CAST(CAST(o_orderdate AS DATE) AS STRING)",
        "CAST(CAST(o_orderdate AS DATE) AS VARCHAR)",
    ),
    (
        "o_totalprice_cents",
        "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS STRING)",
        "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)",
    ),
]


@register(
    "profile_column_stats",
    oracle="""
    WITH vals AS (
        """
    + "\n        UNION ALL\n        ".join(
        f"SELECT '{name}' AS col, {duck} AS val FROM orders"
        for name, _, duck in _PROF_COLS
    )
    + """
    )
    SELECT col,
           CAST(COUNT(*) AS BIGINT)            AS n_rows,
           CAST(COUNT(*) - COUNT(val) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
           MIN(val) AS min_val, MAX(val) AS max_val
    FROM vals GROUP BY col
    """,
)
def column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling of the orders table — per column: row
    count, null count, exact distinct count, lexicographic min/max — the
    first screen of every data-quality dashboard and the input to schema-
    drift monitoring (profile_drift_tvd is the value-level follow-up).
    Values are profiled through a CANONICAL STRING projection both engines
    render identically (integer/date/varchar casts; money quantized to
    cents first, because raw DOUBLE-to-string formatting is engine-
    specific), so min/max are lexicographic over that canonical form —
    the documented convention, deterministic everywhere.

    Shape: one map-side stack (unpivot) fans each row into |cols| (col,
    val) pairs, then ONE hash aggregate per column group carries count /
    null-count / exact distinct / extremes — a single scan of the table
    no matter how many columns are profiled; at 100 TB swap the exact
    distinct for the HLL sketch the repo already ships and the plan is
    unchanged."""
    orders = load_table(spark, sf_dir, "orders")
    n = len(_PROF_COLS)
    stack_args = ", ".join(
        f"'{name}', {spark_expr}" for name, spark_expr, _ in _PROF_COLS
    )
    vals = orders.selectExpr(f"stack({n}, {stack_args}) AS (col, val)")
    return vals.groupBy("col").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("val")).cast("long").alias("n_null"),
        F.countDistinct("val").cast("long").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


# -- referential-integrity audit: the cross-table constraint ------------------

#: (edge label, child table, child key, parent table, parent key, parent
#: predicate or None). The conditional edge is the business-rule variant —
#: "orders must reference customers in good standing" — and on this fixture
#: it has REAL violations at both SFs, so the audit's anti-join is proven
#: live rather than green-on-clean-data (the structural edges all pass,
#: which is itself the correct answer for this referentially-clean corpus).
_FK_EDGES = [
    ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey", None),
    ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey", None),
    ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey", None),
    ("supplier.s_nationkey -> nation", "supplier", "s_nationkey", "nation", "n_nationkey", None),
    ("lineitem.l_partkey -> part", "lineitem", "l_partkey", "part", "p_partkey", None),
    ("orders.o_custkey -> customer[c_acctbal >= 0]", "orders", "o_custkey",
     "customer", "c_custkey", "c_acctbal >= 0"),
]


@register(
    "profile_fk_integrity",
    oracle="""
    """
    + "\n    UNION ALL\n    ".join(
        f"""SELECT '{label}' AS fk_edge,
           CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child_rows,
           CAST((SELECT COUNT(*) FROM {child}
                 WHERE {ckey} NOT IN (SELECT {pkey} FROM {parent}
                                      WHERE {pkey} IS NOT NULL
                                        AND ({pred or "TRUE"}))
                   AND {ckey} IS NOT NULL) AS BIGINT)     AS n_orphans,
           CAST((SELECT COUNT(*) FILTER ({ckey} IS NULL) FROM {child})
                AS BIGINT)                                AS n_null_keys"""
        for label, child, ckey, parent, pkey, pred in _FK_EDGES
    ),
)
def fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — the CROSS-TABLE constraint the
    single-table audit (quality_constraint_audit) cannot see: every
    declared foreign-key edge reports its child row count, orphan count
    (non-null child keys with no parent), and null-key count. Lakehouse
    tables don't enforce FKs at write time, so this audit IS the
    enforcement — run after ingest, gate the downstream joins on zero
    orphans (an orphaned fact row silently vanishes from every inner
    join that should have carried it).

    Shape: one LEFT ANTI equi-join per edge (broadcast when the parent is
    a dim, shuffle-partitioned fact-fact otherwise) plus O(1)-state
    counts; edges evaluate independently and union at the end, so the
    audit parallelizes across edges and scans each child exactly once per
    edge it participates in."""
    out = None
    for label, child, ckey, parent, pkey, pred in _FK_EDGES:
        c = load_table(spark, sf_dir, child)
        par_tbl = load_table(spark, sf_dir, parent)
        if pred is not None:
            par_tbl = par_tbl.filter(F.expr(pred))
        par = par_tbl.select(
            F.col(pkey).alias("_pk")
        ).filter(F.col("_pk").isNotNull()).distinct()
        orphans = (
            c.filter(F.col(ckey).isNotNull())
            .join(par, F.col(ckey) == F.col("_pk"), "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        )
        totals = c.agg(
            F.count(F.lit(1)).cast("long").alias("n_child_rows"),
            F.sum(F.when(F.col(ckey).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null_keys"),
        )
        row = (
            totals.crossJoin(F.broadcast(orphans))
            .select(
                F.lit(label).alias("fk_edge"),
                "n_child_rows",
                "n_orphans",
                "n_null_keys",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# -- join-key skew advisor: measure before you salt ---------------------------

_SKEWP_RATIO = 10  # flag when the top key exceeds 10x the mean group size

#: (label, table, key expression) — ONE list feeds both the Spark builder
#: and the oracle (the expressions are valid in both engines), so the two
#: sides cannot drift apart. The third relation reuses the skew exhibit's
#: hot-key mapping (operators/skew.py — its dimension count imported, the
#: %7 hot-row rule mirrored), so the advisor provably FLAGS a genuinely
#: skewed key while the organic keys pass.
from .skew import _SKEW_DIM_N as _SKEWP_DIM_N  # noqa: E402

_SKEWP_SOURCES = [
    ("lineitem.l_orderkey", "lineitem", "CAST(l_orderkey AS BIGINT)"),
    ("events.user_id", "events", "CAST(user_id AS BIGINT)"),
    (
        "skew_exhibit.k",
        "lineitem",
        "CAST(CASE WHEN l_linenumber % 7 != 0 THEN 0"
        f" ELSE l_orderkey % {_SKEWP_DIM_N} END AS BIGINT)",
    ),
]


@register(
    "profile_join_key_skew",
    oracle=f"""
    WITH keys AS (
        {" UNION ALL ".join(f"SELECT '{label}' AS src, {expr} AS k FROM {table}" for label, table, expr in _SKEWP_SOURCES)}
    ), groups AS (
        SELECT src, k, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM keys GROUP BY 1, 2
    ), hist AS (
        SELECT src, cnt, CAST(COUNT(*) AS BIGINT) AS nk
        FROM groups GROUP BY 1, 2
    ), cum AS (
        SELECT src, cnt, nk,
               CAST(SUM(nk) OVER (PARTITION BY src ORDER BY cnt) AS BIGINT)
                   AS cum_nk,
               CAST(SUM(nk) OVER (PARTITION BY src) AS BIGINT) AS n_keys,
               CAST(SUM(cnt * nk) OVER (PARTITION BY src) AS BIGINT)
                   AS n_rows,
               CAST(MAX(cnt) OVER (PARTITION BY src) AS BIGINT) AS max_group
        FROM hist
    )
    SELECT src,
           MAX(n_rows)                                   AS n_rows,
           MAX(n_keys)                                   AS n_keys,
           MAX(max_group)                                AS max_group,
           CAST(MIN(CASE WHEN 2 * cum_nk >= n_keys
                         THEN cnt END) AS BIGINT)        AS p50_group,
           CAST(MIN(CASE WHEN 100 * cum_nk >= 99 * n_keys
                         THEN cnt END) AS BIGINT)        AS p99_group,
           CAST((1000000 * MAX(max_group)) // MAX(n_rows)
                AS BIGINT)                               AS top_share_ppm,
           CAST(MAX(max_group) * MAX(n_keys)
                > {_SKEWP_RATIO} * MAX(n_rows) AS BOOLEAN) AS salt_recommended
    FROM cum GROUP BY src
    """,
)
def join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew advisor — MEASURE before you salt: per candidate key,
    the group-size distribution every shuffle-planning decision needs
    (rows, keys, max group, exact p50/p99 group sizes, top-key share in
    ppm) plus the recommendation bit: salt when the hottest key exceeds
    10x the mean group size (max_group * n_keys > 10 * n_rows — the
    integer cross-multiplied form, _SKEWP_RATIO). The
    skew exhibit's hot-key mapping (operators/skew.py: ~6/7 of rows on
    one key) is profiled alongside the organic keys, so the advisor
    demonstrably FLAGS real skew while healthy keys pass — the
    quantitative front end to salted_agg / skew_join_salted / AQE's
    runtime splitting.

    Shape: per-key counts (one partial-aggregable shuffle per source),
    then all statistics come from the SIZE HISTOGRAM — (group size, #keys
    at that size), a relation bounded by the distinct sizes — so the
    exact percentiles are cumulative-sum picks over a tiny frame, never a
    sort of the key population (the bucket_offsets discipline applied to
    group cardinalities)."""
    keyed = None
    for label, table, expr in _SKEWP_SOURCES:
        part = load_table(spark, sf_dir, table).select(
            F.lit(label).alias("src"), F.expr(expr).alias("k")
        )
        keyed = part if keyed is None else keyed.unionByName(part)
    groups = keyed.groupBy("src", "k").agg(F.count(F.lit(1)).alias("cnt"))
    hist = groups.groupBy("src", "cnt").agg(F.count(F.lit(1)).alias("nk"))
    w_cum = W.partitionBy("src").orderBy("cnt")
    w_all = W.partitionBy("src")
    cum = hist.select(
        "src",
        "cnt",
        F.sum("nk").over(w_cum).alias("cum_nk"),
        F.sum("nk").over(w_all).alias("n_keys"),
        F.sum(F.col("cnt") * F.col("nk")).over(w_all).alias("n_rows"),
        F.max("cnt").over(w_all).alias("max_group"),
    )
    return cum.groupBy("src").agg(
        F.max("n_rows").cast("long").alias("n_rows"),
        F.max("n_keys").cast("long").alias("n_keys"),
        F.max("max_group").cast("long").alias("max_group"),
        F.min(F.when(2 * F.col("cum_nk") >= F.col("n_keys"), F.col("cnt")))
        .cast("long")
        .alias("p50_group"),
        F.min(F.when(100 * F.col("cum_nk") >= 99 * F.col("n_keys"), F.col("cnt")))
        .cast("long")
        .alias("p99_group"),
        F.expr("CAST((1000000 * MAX(max_group)) div MAX(n_rows) AS BIGINT)")
        .alias("top_share_ppm"),
        F.expr(
            f"MAX(max_group) * MAX(n_keys) > {_SKEWP_RATIO} * MAX(n_rows)"
        ).alias("salt_recommended"),
    )

# -- functional-dependency discovery -------------------------------------------

#: candidate FDs to check: (table, lhs column, rhs column). A mix of true
#: key-based dependencies (which must HOLD) and plausible-but-false ones
#: (which must report their violation rate), the Metanome-style profiling
#: shape: the candidate list is config-bounded, the check itself is data-scale.
_FD_CANDIDATES = [
    ("customer", "c_custkey", "c_mktsegment"),
    ("documents", "doc_id", "lang"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("events", "user_id", "event_type"),
]


def _fd_sql(table: str, lhs: str, rhs: str) -> str:
    return f"""
    SELECT '{table}' AS tbl, '{lhs}' AS lhs, '{rhs}' AS rhs,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS violating_keys,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS BOOLEAN)
               AS holds,
           CAST((1000000 * SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS violation_ppm
    FROM (
        SELECT {lhs}, COUNT(DISTINCT {rhs}) AS n_rhs
        FROM {table} GROUP BY 1
    )"""


@register(
    "profile_fd_discovery",
    oracle=" UNION ALL ".join(_fd_sql(t, a, b) for t, a, b in _FD_CANDIDATES),
)
def fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency check over a configured candidate list — the
    Metanome-style profiling primitive behind key discovery, normalization
    advice, and silent-corruption alerts (a violated ``doc_id -> lang``
    means the ingest wrote conflicting rows for one key). Each candidate
    ``lhs -> rhs`` reports how many lhs keys map to more than one distinct
    rhs value, whether the FD holds exactly, and the violation rate in
    exact ppm.

    Shape: per candidate, one partial+final agg to (lhs, distinct-rhs
    count) then a 1-row rollup — COUNT(DISTINCT) over the grouped pair
    relation, the same two-level-agg discipline as the dedup counts. The
    candidate list is config-bounded so the union is a fixed small number
    of independent scans; at cluster scale each scan prunes to exactly two
    columns (checked in tests/test_plans.py).
    """
    parts = []
    for table, lhs, rhs in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, table)
        keyed = t.groupBy(F.col(lhs).alias("k")).agg(
            F.countDistinct(rhs).alias("n_rhs")
        )
        parts.append(
            keyed.agg(
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum((F.col("n_rhs") > 1).cast("long"))
                .cast("long")
                .alias("violating_keys"),
            ).select(
                F.lit(table).alias("tbl"),
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_keys",
                "violating_keys",
                (F.col("violating_keys") == 0).alias("holds"),
                F.expr(
                    "CAST((1000000 * violating_keys) div n_keys AS BIGINT)"
                ).alias("violation_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# -- numeric quantile drift (deferred: r10 activation) ---------------------------


@register(
    "profile_quantile_drift",
    oracle="""
    WITH b AS (
        SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
        FROM events
    ),
    s AS (
        SELECT event_type,
               CASE WHEN CAST(ts AS DATE) <= d0 + CAST(
                    date_diff('day', d0, d1) // 2 AS INT) THEN 0 ELSE 1 END
                   AS half,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events, b
    ),
    h AS (
        SELECT event_type, half, cents, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM s GROUP BY 1, 2, 3
    ),
    c AS (
        SELECT event_type, half, cents,
               SUM(cnt) OVER (PARTITION BY event_type, half
                              ORDER BY cents) AS cum,
               SUM(cnt) OVER (PARTITION BY event_type, half) AS n
        FROM h
    ),
    q AS (
        SELECT event_type, half,
               MAX(n) AS n,
               MIN(CASE WHEN 2 * cum >= n THEN cents END) AS p50,
               MIN(CASE WHEN 10 * cum >= 9 * n THEN cents END) AS p90
        FROM c GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(MAX(CASE WHEN half = 0 THEN n END) AS BIGINT) AS n_a,
           CAST(MAX(CASE WHEN half = 1 THEN n END) AS BIGINT) AS n_b,
           CAST(MAX(CASE WHEN half = 0 THEN p50 END) AS BIGINT) AS p50_a,
           CAST(MAX(CASE WHEN half = 1 THEN p50 END) AS BIGINT) AS p50_b,
           CAST(MAX(CASE WHEN half = 0 THEN p90 END) AS BIGINT) AS p90_a,
           CAST(MAX(CASE WHEN half = 1 THEN p90 END) AS BIGINT) AS p90_b,
           CAST(ABS(MAX(CASE WHEN half = 1 THEN p50 END)
                  - MAX(CASE WHEN half = 0 THEN p50 END)) AS BIGINT)
               AS p50_shift_cents,
           CAST(ABS(MAX(CASE WHEN half = 1 THEN p90 END)
                  - MAX(CASE WHEN half = 0 THEN p90 END)) AS BIGINT)
               AS p90_shift_cents
    FROM q GROUP BY 1
    """,
)
def quantile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-distribution drift per event type between the first and
    second half of the observed time range: exact p50/p90 on each side
    and the absolute quantile shifts in cents — the NUMERIC sibling of
    profile_drift_tvd's categorical gate and the check a feature-quality
    monitor runs before every model refresh (median drift = payments
    shifted; p90 drift = the tail moved, watch fraud/outliers). Exact
    order statistics, no interpolation: p_q = the smallest value whose
    cumulative count reaches ⌈q·n⌉, written q_den·cum ≥ q_num·n so no
    float exists on either engine.

    Shape: one scan to the (type, half, value) histogram — value-DOMAIN-
    sized — then cumulative windows over that histogram partitioned by
    (type, half); the time midpoint rides a 1-row broadcast. The two
    halves pivot back together with conditional aggregation, not a join.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    s = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.when(
            F.to_date("ts")
            <= F.expr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))"),
            0,
        )
        .otherwise(1)
        .alias("half"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    h = s.groupBy("event_type", "half", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wc = (
        W.partitionBy("event_type", "half")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wn = W.partitionBy("event_type", "half")
    c = h.select(
        "event_type",
        "half",
        "cents",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    q = c.groupBy("event_type", "half").agg(
        F.max("n").alias("n"),
        F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("cents"))).alias(
            "p50"
        ),
        F.min(
            F.when(10 * F.col("cum") >= 9 * F.col("n"), F.col("cents"))
        ).alias("p90"),
    )
    half = lambda col, hv: F.max(  # noqa: E731
        F.when(F.col("half") == hv, F.col(col))
    )
    return q.groupBy("event_type").agg(
        half("n", 0).cast("long").alias("n_a"),
        half("n", 1).cast("long").alias("n_b"),
        half("p50", 0).cast("long").alias("p50_a"),
        half("p50", 1).cast("long").alias("p50_b"),
        half("p90", 0).cast("long").alias("p90_a"),
        half("p90", 1).cast("long").alias("p90_b"),
        F.abs(half("p50", 1) - half("p50", 0)).cast("long").alias(
            "p50_shift_cents"
        ),
        F.abs(half("p90", 1) - half("p90", 0)).cast("long").alias(
            "p90_shift_cents"
        ),
    )


# -- sequential-id integrity audit (r12 queue) -------------------------------------------


@register(
    "profile_sequential_id_gaps",
    oracle="""
    WITH ids AS (SELECT DISTINCT event_id AS id FROM events),
    gaps AS (
        SELECT id, id - LAG(id) OVER (ORDER BY id) AS step
        FROM ids
    ), dup AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
        FROM events
    )
    SELECT dup.n_rows, dup.n_distinct,
           CAST(MIN(g.id) AS BIGINT) AS min_id,
           CAST(MAX(g.id) AS BIGINT) AS max_id,
           CAST(SUM(CASE WHEN g.step > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_gaps,
           CAST(MAX(g.id) - MIN(g.id) + 1 - dup.n_distinct AS BIGINT)
               AS missing_total,
           CAST(COALESCE(MAX(CASE WHEN g.step > 1 THEN g.step - 1 END), 0)
                AS BIGINT) AS max_gap
    FROM gaps g CROSS JOIN dup
    GROUP BY 1, 2
    """,
)
def sequential_id_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-id integrity audit over ``event_id`` — the ingestion
    data-quality primitive behind "did we drop events?": row vs distinct
    counts (duplicate detection), the id span, how many GAPS interrupt
    the sequence, the total missing ids (span − distinct, exact whatever
    the gap structure), and the largest single hole. A surrogate-keyed
    feed that suddenly grows gaps indicates upstream loss or filtered
    replays; duplicates indicate at-least-once delivery leaking through
    (complements profile_fk_integrity, which audits references rather
    than the key sequence itself).

    Determinism: pure integer counting over exact ids.

    Shape: one distinct (partial-aggregable) to the id relation, one
    ordered window over it for gap steps, and a 1-row rollup. The window
    sorts ids once — at 100 TB this is the same budget as any ordered
    integrity scan, and the distinct relation is the audit's irreducible
    input."""
    ev = load_table(spark, sf_dir, "events")
    ids = ev.select(F.col("event_id").alias("id")).distinct()
    gaps = ids.withColumn(
        "step", F.col("id") - F.lag("id").over(W.orderBy("id"))
    )
    dup = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("event_id").cast("long").alias("n_distinct"),
    )
    return (
        gaps.crossJoin(F.broadcast(dup))
        .groupBy("n_rows", "n_distinct")
        .agg(
            F.min("id").cast("long").alias("min_id"),
            F.max("id").cast("long").alias("max_id"),
            F.sum(F.when(F.col("step") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_gaps"),
            (
                F.max("id") - F.min("id") + 1 - F.first("n_distinct")
            )
            .cast("long")
            .alias("missing_total"),
            F.coalesce(
                F.max(F.when(F.col("step") > 1, F.col("step") - 1)),
                F.lit(0),
            )
            .cast("long")
            .alias("max_gap"),
        )
    )


from ..docfmt import format_docstrings  # noqa: E402
format_docstrings(globals())  # substitute {CONST} docstring placeholders (ADVICE r8)
