"""CSV / JSON-lines source+sink round-trips (SURVEY.md §2.1/§2.8).

The reference writes CSV (src/movie.py:309, single-file master export) and
consumes JSON (REST pages). Here both formats are exercised end-to-end as
Spark sources AND sinks: a lineitem slice is physically written to the
format, read back with an EXPLICIT schema (schema inference is a full extra
scan — never at 100 TB), and aggregated; the oracle computes the same
aggregate straight from parquet, so the round-trip proves the format codecs
preserve content, not just that a write succeeded.

Scale notes: both formats write/read splittable multi-file directories —
the read parallelizes per file (and per block for uncompressed CSV).
Doubles are quantized to integer cents BEFORE the write: float → text →
float round-trips are where CSV pipelines silently diverge, and integer
columns round-trip exactly in both formats.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table, scratch_dir
from ..registry import register

__all__ = ["csv_roundtrip_agg", "json_roundtrip_agg"]

_SLICE_SQL = """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
           CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem
    WHERE l_linenumber <= 2
"""

_AGG_SQL = """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(price_cents) AS BIGINT) AS sum_price_cents,
           CAST(SUM(qty) AS BIGINT) AS sum_qty
    FROM slice
    GROUP BY l_returnflag
"""


def _slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("price_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )


_SLICE_SCHEMA = (
    "l_orderkey BIGINT, l_linenumber BIGINT, l_returnflag STRING, "
    "price_cents BIGINT, qty BIGINT"
)


def _agg(df: DataFrame) -> DataFrame:
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("price_cents").cast("long").alias("sum_price_cents"),
        F.sum("qty").cast("long").alias("sum_qty"),
    )


_ORACLE = f"WITH slice AS ({_SLICE_SQL}) {_AGG_SQL}"


@register("sink_csv_roundtrip", oracle=_ORACLE)
def csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the slice as headered CSV, read it back with an explicit
    schema, aggregate — values must round-trip exactly (integer columns)."""
    path = os.path.join(scratch_dir("fmt_csv_"), "slice")
    _slice(spark, sf_dir).write.mode("overwrite").option("header", "true").csv(path)
    back = spark.read.schema(_SLICE_SCHEMA).option("header", "true").csv(path)
    return _agg(back)


@register("sink_json_roundtrip", oracle=_ORACLE)
def json_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the slice as JSON lines, read it back with an explicit schema,
    aggregate — mirrors the reference's JSON-page ingest direction
    (src/movie.py:171-177) with Spark's splittable json source."""
    path = os.path.join(scratch_dir("fmt_json_"), "slice")
    _slice(spark, sf_dir).write.mode("overwrite").json(path)
    back = spark.read.schema(_SLICE_SCHEMA).json(path)
    return _agg(back)


@register(
    "source_schema_evolution_scan",
    oracle="""
    WITH merged AS (
        SELECT doc_id, n_chars, NULL AS lang FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id, n_chars, lang FROM documents WHERE doc_id % 2 = 1
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)    AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM merged GROUP BY lang
    """,
)
def schema_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: an old batch written WITHOUT ``lang`` and a
    new batch written with it are read together via ``mergeSchema`` — the
    missing column surfaces as NULL for old files, the standard
    append-only-lake evolution path.

    Scale note: ``mergeSchema`` reconciles footers at planning time (one
    footer read per file, no data scan); production tables evolve the same
    way — writers add columns, readers merge, old files are never
    rewritten. The aggregate proves values AND nulls land correctly, not
    just that the read planned.
    """
    base = scratch_dir("fmt_evo_")
    docs = load_table(spark, sf_dir, "documents")
    old = os.path.join(base, "batch1")
    new = os.path.join(base, "batch2")
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "n_chars").write.mode(
        "overwrite"
    ).parquet(old)
    docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "n_chars", "lang").write.mode(
        "overwrite"
    ).parquet(new)
    merged = spark.read.option("mergeSchema", "true").parquet(old, new)
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


@register("sink_orc_roundtrip", oracle=_ORACLE)
def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the slice as ORC, read it back, aggregate — completes the
    sink-format matrix (parquet/CSV/JSON/ORC). ORC is the other columnar
    container warehouses hand over; the roundtrip pins that Spark's ORC
    writer/reader preserve the integer slice exactly, with predicate
    pushdown and column pruning available on re-read just like parquet."""
    path = os.path.join(scratch_dir("fmt_orc_"), "slice")
    _slice(spark, sf_dir).write.mode("overwrite").orc(path)
    back = spark.read.schema(_SLICE_SCHEMA).orc(path)
    return _agg(back)


@register("sink_parquet_codec_matrix", oracle=_ORACLE)
def parquet_codec_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-codec matrix: the same slice written as zstd AND
    snappy parquet, read back through one multi-path scan, aggregated —
    pins that codec choice changes bytes on disk but NEVER values (the
    invariance a 100 TB lake relies on when it re-encodes cold data from
    snappy to zstd for the ~30 % footprint cut; a reader must not care
    which codec a file carries, including MIXED codecs in one dataset,
    which the single read here exercises). The aggregate divides each
    metric by two writes via the modulo split, so a dropped or doubled
    file surfaces as a value mismatch, not just a row-count change.

    Scale note: codec is per-file metadata — mixing codecs in one
    dataset is exactly how incremental re-encoding rolls through a
    table without a stop-the-world rewrite.
    """
    base = scratch_dir("fmt_codec_")
    half_a = os.path.join(base, "zstd")
    half_b = os.path.join(base, "snappy")
    s = _slice(spark, sf_dir)
    s.filter(F.col("l_orderkey") % 2 == 0).write.mode("overwrite").option(
        "compression", "zstd"
    ).parquet(half_a)
    s.filter(F.col("l_orderkey") % 2 == 1).write.mode("overwrite").option(
        "compression", "snappy"
    ).parquet(half_b)
    back = spark.read.schema(_SLICE_SCHEMA).parquet(half_a, half_b)
    return _agg(back)


@register("sink_xml_roundtrip", oracle=_ORACLE)
def xml_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the slice as XML (Spark 4.0's built-in XML source — no
    spark-xml package), read it back with an explicit schema and rowTag,
    aggregate — extends the sink-format matrix (parquet/CSV/JSON/ORC) to
    the one interchange format enterprise feeds still mandate. The
    roundtrip pins element naming, type coercion on re-read, and that
    the hierarchical container preserves the integer slice exactly.

    Scale note: XML is a row-major text format like CSV/JSON — splittable
    by row tag, no pushdown or pruning; the matrix documents it as the
    interchange tier, never the analytics tier."""
    path = os.path.join(scratch_dir("fmt_xml_"), "slice")
    _slice(spark, sf_dir).write.mode("overwrite").option(
        "rowTag", "item"
    ).format("xml").save(path)
    back = (
        spark.read.schema(_SLICE_SCHEMA)
        .option("rowTag", "item")
        .format("xml")
        .load(path)
    )
    return _agg(back)
