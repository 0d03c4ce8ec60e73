"""Composite LLM training-data preparation pipeline.

The individual operators (quality scoring, exact/near dedup, token
counting) compose into the standard corpus-cleaning funnel:

    raw documents
      → quality gate      (length / stopword-ratio heuristics)
      → exact dedup       (normalized-content hash, keep lowest doc_id)
      → near-dup drop     (MinHash-LSH candidate pairs → drop the higher id)
      → token accounting  (per-language corpus statistics)

Registered as ONE query so the full funnel is hash-checked end-to-end — the
pipeline a user would actually run, not just its pieces. Every stage is a
shuffle-bounded relational op (no stage is O(n²)); at 100 TB the funnel is
exactly this plan with more partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import minhash_lsh_pairs
from .text import quality_score, tokens_col

__all__ = ["prepare_corpus"]


def prepare_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel, returning the surviving documents (doc_id, lang,
    ws_tokens)."""
    from ..io import load_table

    docs = load_table(spark, sf_dir, "documents")
    quality = quality_score(spark, sf_dir).filter(F.col("passes_quality"))
    kept = docs.join(quality.select("doc_id"), "doc_id", "left_semi")

    # exact dedup: keep the lowest doc_id per normalized content
    from .text import norm_text_col

    w_min = (
        kept.select("doc_id", F.md5(norm_text_col()).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    kept = kept.join(
        w_min.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )

    # near-dup drop: for each MinHash-LSH candidate pair, drop the higher id
    pairs = minhash_lsh_pairs(spark, sf_dir)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    kept = kept.join(losers, "doc_id", "left_anti")
    return kept.select(
        "doc_id", "lang", F.size(tokens_col()).cast("int").alias("ws_tokens")
    )


# the oracle re-states the funnel in SQL over the same building blocks the
# per-operator oracles already pin down (quality predicate, md5 dedup,
# minhash bands — see text.py / dedup.py for the shared fragments)
from .dedup import _MINHASH_ORACLE  # noqa: E402
from .text import _NORM_SQL, _TOKENS_SQL  # noqa: E402

_QUALITY_PRED = f"""
    (len({_TOKENS_SQL}) BETWEEN 20 AND 1000)
    AND CAST(len(list_filter({_TOKENS_SQL},
         t -> t IN ('the','a','and','of','is','to','in'))) AS DOUBLE)
         / CAST(NULLIF(len({_TOKENS_SQL}), 0) AS DOUBLE) >= 0.01
"""

_PREP_ORACLE = f"""
WITH quality AS (
    SELECT * FROM documents WHERE {_QUALITY_PRED}
),
exact_kept AS (
    SELECT * FROM quality WHERE doc_id IN (
        SELECT MIN(doc_id) FROM quality GROUP BY md5({_NORM_SQL})
    )
),
near_losers AS (
    SELECT DISTINCT doc_b AS doc_id FROM ({_MINHASH_ORACLE.strip()})
)
SELECT doc_id, lang, CAST(len({_TOKENS_SQL}) AS INTEGER) AS ws_tokens
FROM exact_kept
WHERE doc_id NOT IN (SELECT doc_id FROM near_losers)
"""


@register("llm_prepare_corpus", oracle=_PREP_ORACLE)
def llm_prepare_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prepare_corpus(spark, sf_dir)


@register(
    "llm_corpus_stats",
    oracle=f"""
    WITH quality AS (
        SELECT * FROM documents WHERE {_QUALITY_PRED}
    ),
    exact_kept AS (
        SELECT * FROM quality WHERE doc_id IN (
            SELECT MIN(doc_id) FROM quality GROUP BY md5({_NORM_SQL})
        )
    ),
    near_losers AS (
        SELECT DISTINCT doc_b AS doc_id FROM ({_MINHASH_ORACLE.strip()})
    ),
    corpus AS (
        SELECT doc_id, lang, len({_TOKENS_SQL}) AS ws_tokens
        FROM exact_kept
        WHERE doc_id NOT IN (SELECT doc_id FROM near_losers)
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)          AS n_docs,
           CAST(SUM(ws_tokens) AS BIGINT)    AS total_tokens,
           CAST(MIN(ws_tokens) AS INTEGER)   AS min_tokens,
           CAST(MAX(ws_tokens) AS INTEGER)   AS max_tokens
    FROM corpus
    GROUP BY lang
    """,
)
def llm_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language accounting of the cleaned corpus — the token-budget
    report a training run starts from."""
    corpus = prepare_corpus(spark, sf_dir)
    return corpus.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").cast("long").alias("total_tokens"),
        F.min("ws_tokens").cast("int").alias("min_tokens"),
        F.max("ws_tokens").cast("int").alias("max_tokens"),
    )
