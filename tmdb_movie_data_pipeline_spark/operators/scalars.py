"""Scalar-function operators (SURVEY.md §2.2 P1-P15 + §2.9 "string/math fns").

The reference's scalar surface is string concat/join/substring, date
month-math, and JSON serde, all in Python row loops (src/movie.py:185-205,
228-238). Here every one is a Catalyst expression inside whole-stage codegen
— no Python executes per row anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import MONEY_SCALE, qavg, qavg_sql, round4
from ..io import load_table
from ..registry import register

__all__ = ["month_ranges"]


def month_ranges(spark: SparkSession, start_ts_col_df: DataFrame, ts_col: str) -> DataFrame:
    """Calendar-month windows spanning a timestamp column's range —
    the reference's partition planner (``month_ranges``,
    src/movie.py:228-238: truncate to month (P11), add a month (P12),
    last day = next month minus a day (P13), clamp to range end (P14)).

    Returns (month_start DATE, month_end DATE) rows. Driver-side in the
    reference; a 2-row agg + sequence explode here, so it stays distributed.
    """
    bounds = start_ts_col_df.agg(
        F.date_trunc("month", F.min(ts_col)).cast("date").alias("lo"),
        F.max(ts_col).cast("date").alias("hi"),
    )
    months = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 month"))).alias(
            "month_start"
        ),
        F.col("hi"),
    )
    return months.select(
        F.col("month_start"),
        F.least(F.date_sub(F.add_months("month_start", 1), 1), F.col("hi")).alias("month_end"),
    )


@register(
    "date_month_ranges",
    oracle="""
    WITH bounds AS (
        SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
               CAST(MAX(o_orderdate) AS DATE)                      AS hi
        FROM orders
    )
    , series AS (
        SELECT UNNEST(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
                                      INTERVAL 1 MONTH)) AS gs, hi
        FROM bounds
    )
    SELECT strftime(gs, '%Y-%m-%d') AS month_start,
           strftime(LEAST(CAST(gs AS DATE) + INTERVAL 1 MONTH - INTERVAL 1 DAY,
                          CAST(hi AS TIMESTAMP)), '%Y-%m-%d') AS month_end
    FROM series
    """,
)
def date_month_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = month_ranges(spark, load_table(spark, sf_dir, "orders"), "o_orderdate")
    # ISO strings, not DATE-typed output: temporal types round-trip to pandas
    # differently per engine; strings hash identically everywhere.
    return out.select(
        F.date_format("month_start", "yyyy-MM-dd").alias("month_start"),
        F.date_format("month_end", "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "date_battery",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d')                     AS order_date,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(date_trunc('month', o_orderdate)
                    + INTERVAL 1 MONTH, '%Y-%m-%d')              AS next_month,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(year(o_orderdate) AS INTEGER)                    AS order_year,
           CAST(month(o_orderdate) AS INTEGER)                   AS order_month,
           CAST(datediff('day', DATE '1995-01-01',
                         CAST(o_orderdate AS DATE)) AS INTEGER)  AS days_since_epoch_start,
           strftime(o_orderdate, '%Y-%m-%d')                     AS iso_date
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10-P15 date kit: parse/truncate/add-month/last-day/format — the
    reference's month math (src/movie.py:228-238) as columnar expressions."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    d = F.col("o_orderdate")
    iso = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    return o.select(
        "o_orderkey",
        iso(d).alias("order_date"),
        iso(F.trunc(d.cast("date"), "month")).alias("month_start"),
        iso(F.add_months(F.trunc(d.cast("date"), "month"), 1)).alias("next_month"),
        iso(F.last_day(d.cast("date"))).alias("month_end"),
        F.year(d).cast("int").alias("order_year"),
        F.month(d).cast("int").alias("order_month"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_date"),
    )


@register(
    "string_battery",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                                         AS name_upper,
           LOWER(p_brand)                                        AS brand_lower,
           TRIM(p_type)                                          AS type_trim,
           SUBSTRING(p_name, 1, 5)                               AS name_prefix,
           CAST(LENGTH(p_name) AS INTEGER)                       AS name_len,
           REPLACE(p_type, ' ', '_')                             AS type_snake,
           CONCAT(p_brand, '#', CAST(p_size AS VARCHAR))         AS brand_size,
           regexp_extract(p_name, '([a-z]+)', 1)                 AS first_word,
           regexp_replace(p_name, '[aeiou]', '', 'g')            AS name_novowels,
           CAST(strpos(p_name, 'a') AS INTEGER)                  AS first_a,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0')              AS padded_key,
           reverse(p_brand)                                      AS brand_rev,
           CAST(levenshtein(p_brand, 'Brand#1') AS INTEGER)      AS brand_dist
    FROM part
    WHERE p_partkey % 20 = 0
    """,
)
def string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function menu over `part` (SURVEY §2.9): case, trim, substring,
    regexp extract/replace, position, padding — all codegen'd expressions."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim("p_type").alias("type_trim"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        F.instr(F.col("p_name"), "a").cast("int").alias("first_a"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.reverse("p_brand").alias("brand_rev"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#1")).cast("int").alias("brand_dist"),
    )


@register(
    "math_battery",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_extendedprice - 30000), 2)          AS abs_dev,
           CAST(CEIL(l_quantity) AS BIGINT)                AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT)               AS qty_floor,
           ROUND(SQRT(l_extendedprice), 4)                 AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 4)               AS price_ln,
           ROUND(LOG10(l_extendedprice + 1), 4)            AS price_log10,
           ROUND(POW(1 + l_discount, 2), 6)                AS disc_sq,
           CAST(l_orderkey % 7 AS BIGINT)                  AS key_mod7,
           ROUND(GREATEST(l_discount, l_tax), 2)           AS max_rate,
           ROUND(LEAST(l_discount, l_tax), 2)              AS min_rate,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE)         AS disc_sign
    FROM lineitem
    WHERE l_orderkey % 500 = 0
    """,
)
def math_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000), 2).alias("abs_dev"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        round4(F.sqrt("l_extendedprice")).alias("price_sqrt"),
        round4(F.log(F.col("l_extendedprice") + 1)).alias("price_ln"),
        round4(F.log10(F.col("l_extendedprice") + 1)).alias("price_log10"),
        F.round(F.pow(F.lit(1) + F.col("l_discount"), 2), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
        F.round(F.greatest("l_discount", "l_tax"), 2).alias("max_rate"),
        F.round(F.least("l_discount", "l_tax"), 2).alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar kit (reference checkpoint serde, src/movie.py:211,218 →
    from_json/get_json_object): extract a typed field and aggregate it."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "conditional_bucketing",
    oracle=f"""
    SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 9000 THEN 'mid'
                ELSE 'high' END                                    AS bal_bucket,
           CASE WHEN c_nationkey IS NOT NULL
                THEN CONCAT('nation/', CAST(c_nationkey AS VARCHAR))
                ELSE NULL END                                      AS nation_path,
           CAST(COUNT(*) AS BIGINT)                                AS n,
           {qavg_sql("c_acctbal", MONEY_SCALE)}                    AS avg_bal
    FROM customer
    GROUP BY 1, 2
    """,
)
def conditional_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 parity: conditional concat (NULL propagating, like the poster-URL
    build, src/movie.py:190-191) + CASE bucketing."""
    c = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 9000, "mid")
        .otherwise("high")
        .alias("bal_bucket")
    )
    path = F.when(
        F.col("c_nationkey").isNotNull(),
        F.concat(F.lit("nation/"), F.col("c_nationkey").cast("string")),
    ).alias("nation_path")
    return c.groupBy(bucket, path).agg(
        F.count(F.lit(1)).alias("n"),
        qavg(F.col("c_acctbal"), MONEY_SCALE).alias("avg_bal"),
    )


@register(
    "array_map_battery",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_sort(list_distinct(string_split(lower(trim(
                   regexp_replace(text, '\\s+', ' ', 'g'))), ' '))) AS vocab
        FROM documents
        WHERE doc_id % 25 = 0
    )
    SELECT doc_id,
           CAST(len(vocab) AS INTEGER)                             AS vocab_size,
           vocab[1]                                                AS first_term,
           vocab[len(vocab)]                                       AS last_term,
           array_to_string(vocab[1:3], ',')                        AS first3,
           CAST(list_contains(vocab, 'data') AS BOOLEAN)           AS has_data,
           COALESCE(array_to_string(  -- DuckDB: '' list → NULL; Spark: ''
               list_sort(list_filter(vocab, w -> length(w) > 5)), '|'), '')
                                                                   AS long_terms,
           CAST(len(list_intersect(vocab, ['data','table','row','fast']))
                AS INTEGER)                                        AS marker_hits
    FROM t
    """,
)
def array_map_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function menu (SURVEY §2.9 / P2-P3 generalization): distinct,
    sort, index, slice, join, contains, filter lambda, intersect — all
    Catalyst higher-order functions, zero Python."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    vocab = F.array_sort(
        F.array_distinct(
            F.split(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), " ")
        )
    )
    t = docs.select("doc_id", vocab.alias("vocab"))
    return t.select(
        "doc_id",
        F.size("vocab").cast("int").alias("vocab_size"),
        F.col("vocab").getItem(0).alias("first_term"),
        F.element_at("vocab", -1).alias("last_term"),
        F.array_join(F.slice("vocab", 1, 3), ",").alias("first3"),
        F.array_contains("vocab", "data").alias("has_data"),
        # flattened to a '|'-joined string: the driver's canonicalizer sorts
        # result rows with pandas, which cannot hash list-typed cells
        # (CORRECTNESS_r01 err; VERDICT "What's wrong" #1)
        F.array_join(
            F.array_sort(F.filter("vocab", lambda w: F.length(w) > 5)), "|"
        ).alias("long_terms"),
        F.size(
            F.array_intersect(
                "vocab", F.array(F.lit("data"), F.lit("table"), F.lit("row"), F.lit("fast"))
            )
        )
        .cast("int")
        .alias("marker_hits"),
    )


@register(
    "map_functions_battery",
    oracle="""
    SELECT event_type,
           CAST(map_extract(stats, 'n')[1] AS BIGINT)   AS n,
           CAST(map_extract(stats, 'users')[1] AS BIGINT) AS users,
           CAST(len(map_keys(stats)) AS INTEGER)        AS n_keys
    FROM (
        SELECT event_type,
               MAP {'n': COUNT(*), 'users': COUNT(DISTINCT user_id)} AS stats
        FROM events
        GROUP BY event_type
    )
    """,
)
def map_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction + probing (the genre id→name dict as a native
    Spark type, reference movie.py:140-142): create_map, element_at,
    map_keys."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.create_map(
            F.lit("n"), F.count(F.lit(1)),
            F.lit("users"), F.countDistinct("user_id"),
        ).alias("stats")
    )
    return agg.select(
        "event_type",
        F.element_at("stats", "n").alias("n"),
        F.element_at("stats", "users").alias("users"),
        F.size(F.map_keys("stats")).cast("int").alias("n_keys"),
    )


@register(
    "array_posexplode",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
        FROM documents WHERE doc_id % 100 = 0
    )
    SELECT doc_id,
           CAST(UNNEST(range(1, len(toks) + 1)) AS INTEGER) AS pos,
           UNNEST(toks)                                     AS token
    FROM t
    """,
)
def array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode / LATERAL VIEW with ordinality: element + 1-based position
    (token order is meaningful downstream — n-grams, positional features)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    toked = docs.select(
        "doc_id",
        F.split(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), " ").alias("toks"),
    )
    return toked.select(
        "doc_id", F.posexplode("toks").alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "token")


@register(
    "json_variant_shred",
    oracle="""
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def json_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType shredding (Spark 4): ``parse_json`` builds the binary
    variant encoding once, ``variant_get`` does typed path access — the
    engine-native semi-structured path (no per-row string re-parse per
    field, unlike chained get_json_object). Same extraction semantics as
    the JSON-string kit, exercised through the variant engine."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        ev.select("event_type", (k % 10).alias("k_mod"))
        .groupBy("event_type", "k_mod")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "recursive_month_spine",
    oracle="""
    WITH RECURSIVE months(m) AS (
        SELECT TIMESTAMP '1995-01-01'
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM months
        WHERE m < TIMESTAMP '2002-03-01'
    )
    SELECT strftime(months.m, '%Y-%m') AS ym,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
    FROM months LEFT JOIN orders o
      ON date_trunc('month', o.o_orderdate) = months.m
    GROUP BY 1
    """,
)
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): generate the month spine
    the reference iterates imperatively (src/movie.py month windows) as a
    recursive union INSIDE the engine, then left-join order counts onto it
    — months past the data edge surface with zero, proving the spine drives
    the join rather than the data. The recursion depth is the number of
    months (bounded metadata), not a data-sized loop."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("t_orders_spine")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT TIMESTAMP '1995-01-01'
            UNION ALL
            SELECT m + INTERVAL '1' MONTH FROM months
            WHERE m < TIMESTAMP '2002-03-01'
        )
        SELECT date_format(months.m, 'yyyy-MM') AS ym,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
        FROM months LEFT JOIN t_orders_spine o
          ON date_trunc('MONTH', o.o_orderdate) = months.m
        GROUP BY 1
        """
    )


# -- bitwise battery — deferred queue -----------------------------------------


@register(
    "bitwise_battery",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT)            AS and_mask,
           CAST(o_orderkey | 4096 AS BIGINT)           AS or_flag,
           CAST(xor(o_orderkey, 21845) AS BIGINT)      AS xor_pat,
           CAST(o_orderkey << 3 AS BIGINT)             AS shl3,
           CAST(o_orderkey >> 2 AS BIGINT)             AS shr2,
           CAST(bit_count(o_orderkey) AS BIGINT)       AS popcount
    FROM orders WHERE o_orderkey % 50 = 0
    """
)
def bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar battery — AND/OR/XOR masks, shifts, popcount — the
    last scalar family without a gate (string/math/date/JSON/array/map
    batteries exist): flag fields, bitmap membership and hash mixing all
    reduce to these, and the engines' integer semantics must agree
    bit-for-bit (they do; the gate makes it a contract rather than an
    assumption). Keys are non-negative, so shift semantics can't diverge
    on sign extension.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").cast("long").alias("and_mask"),
        F.expr("o_orderkey | 4096").cast("long").alias("or_flag"),
        F.expr("o_orderkey ^ 21845").cast("long").alias("xor_pat"),
        F.expr("shiftleft(o_orderkey, 3)").cast("long").alias("shl3"),
        F.expr("shiftright(o_orderkey, 2)").cast("long").alias("shr2"),
        F.expr("bit_count(o_orderkey)").cast("long").alias("popcount"),
    )


# -- VARIANT battery: Spark 4's semi-structured type --------------------------

#: Spark's inferred variant schema for the constructed shape — a CONSTANT
#: for this battery, pinned as part of the contract (the oracle emits the
#: same literal; a Spark behavior change here should fail the gate loudly).
_VARIANT_SCHEMA = (
    "OBJECT<meta: OBJECT<cents: BIGINT>, ok: BIGINT,"
    " status: STRING, tags: ARRAY<STRING>>"
)


@register(
    "scalar_variant_battery",
    oracle=f"""
    WITH js AS (
        SELECT o_orderkey,
               to_json(struct_pack(
                   meta := struct_pack(
                       cents := CAST(ROUND(o_totalprice * 100) AS BIGINT)),
                   ok := o_orderkey,
                   status := o_orderstatus,
                   tags := [o_orderpriority, o_orderstatus]
               )) AS j
        FROM orders WHERE o_orderkey % 40 = 0
    )
    SELECT o_orderkey,
           CAST(json_extract(j, '$.ok') AS BIGINT)            AS ok,
           json_extract_string(j, '$.status')                 AS status,
           json_extract_string(j, '$.tags[0]')                AS tag0,
           json_extract_string(j, '$.tags[1]')                AS tag1,
           CAST(json_extract(j, '$.meta.cents') AS BIGINT)    AS cents,
           CAST(json_extract(j, '$.missing') IS NULL
                AS BOOLEAN)                                   AS missing_is_null,
           '{_VARIANT_SCHEMA}'                                AS variant_schema
    FROM js
    """,
)
def variant_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT scalar battery — Spark 4's semi-structured type: JSON rows
    parse ONCE into the binary variant encoding (parse_json), then typed
    path extraction (variant_get with target types, array indexing, nested
    fields), missing-path null semantics, and schema_of_variant's inferred
    shape. This is the open-table-format answer to schemaless columns —
    shredding on read without a string re-parse per access — and the gate
    pins its SEMANTICS against plain-JSON extraction in the oracle: every
    typed path through the variant must equal the same path pulled from
    the equivalent JSON text (DuckDB never sees a variant; agreement IS
    the contract). The inferred variant schema string is constant for the
    constructed shape and pinned as a literal, so a Spark inference change
    fails loudly.

    Shape: map-only — construct, parse, extract, zero shuffles
    (filter pushdown on the key modulus reaches the scan as with
    every scalar battery). At scale, variant columns are stored
    pre-parsed, and this battery is exactly the read path."""
    orders = load_table(spark, sf_dir, "orders")
    js = orders.filter(F.col("o_orderkey") % 40 == 0).selectExpr(
        "o_orderkey",
        "to_json(named_struct("
        " 'meta', named_struct('cents', CAST(ROUND(o_totalprice * 100) AS BIGINT)),"
        " 'ok', o_orderkey,"
        " 'status', o_orderstatus,"
        " 'tags', array(o_orderpriority, o_orderstatus)"
        ")) AS j",
    )
    return js.selectExpr("o_orderkey", "parse_json(j) AS var").selectExpr(
        "o_orderkey",
        "CAST(variant_get(var, '$.ok', 'bigint') AS BIGINT) AS ok",
        "variant_get(var, '$.status', 'string') AS status",
        "variant_get(var, '$.tags[0]', 'string') AS tag0",
        "variant_get(var, '$.tags[1]', 'string') AS tag1",
        "CAST(variant_get(var, '$.meta.cents', 'bigint') AS BIGINT) AS cents",
        "CAST(variant_get(var, '$.missing', 'string') IS NULL AS BOOLEAN)"
        " AS missing_is_null",
        "schema_of_variant(var) AS variant_schema",
    )
