"""Deterministic sampling & per-group capping (SURVEY.md §2.9, LLM prep).

Training-data pipelines sample and rebalance corpora constantly; both ops
here are expressed so the SAME rows are selected on any engine and any
cluster size — no RNG state, no partition-order dependence:

* **stratified hash sampling** — keep a row iff a multiplicative integer
  hash of its key falls under the stratum's cut. Knuth's 2654435761
  (⌊2³²/φ⌋) multiplier over pure int64 arithmetic reproduces bit-for-bit in
  DuckDB, scales embarrassingly (a map-only filter — pushes down, no
  shuffle), and is stable under resumes/retries, unlike ``df.sample``.
* **per-group capping** — at most N documents per source, preferring the
  longest: one window over (source) with a unique tie-break. At scale this
  is the partial-topK-per-key shape: Spark runs rank inside one Exchange
  keyed by the group column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io import load_table
from ..registry import register

__all__ = ["stratified_hash_sample", "cap_per_group"]

_KNUTH = 2654435761  # ⌊2^32 / golden ratio⌋, Fibonacci hashing multiplier
_MOD = 1 << 32
#: mask the key into [0, 2^31) before multiplying so the int64 product
#: (< 2^31 · 2^32 < 2^63) can never overflow — unmasked, doc_id ≥ ~3.47e9
#: overflows BIGINT, where Spark and DuckDB disagree (wrap vs raise).
_KEY_MASK = 1 << 31

#: per-language keep rates, in hash-space units (out of 2^32).
_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25}
_DEFAULT_RATE = 0.10


def _cut(rate: float) -> int:
    return int(rate * _MOD)


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {_cut(rate)}" for lang, rate in _RATES.items()
    )
    return f"CASE lang {whens} ELSE {_cut(_DEFAULT_RATE)} END"


def stratified_hash_sample(docs: DataFrame) -> DataFrame:
    """Keep each document iff hash(doc_id) < cut(lang) — deterministic,
    map-only, stratum rates independent of data order."""
    return (
        docs.withColumn(
            "_h", F.expr(f"((doc_id % {_KEY_MASK}) * {_KNUTH}) % {_MOD}")
        )
        .filter(F.col("_h") < F.expr(_rate_case_sql()))
        .select("doc_id", "lang", F.col("_h").cast("long").alias("sample_key"))
    )


@register(
    "sample_stratified_hash",
    oracle=f"""
    SELECT doc_id, lang, CAST(h AS BIGINT) AS sample_key
    FROM (
        SELECT doc_id, lang, ((doc_id % {_KEY_MASK}) * {_KNUTH}) % {_MOD} AS h
        FROM documents
    )
    WHERE h < ({_rate_case_sql()})
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_hash_sample(load_table(spark, sf_dir, "documents"))


_CAP_N = 3


def cap_per_group(docs: DataFrame, group_col: str, n: int) -> DataFrame:
    """At most ``n`` docs per group, longest-first, doc_id tie-break."""
    w = W.partitionBy(group_col).orderBy(
        F.desc(F.length("text")), F.asc("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= n)
        .select(group_col, "doc_id", F.length("text").cast("long").alias("text_len"), "rk")
    )


@register(
    "cap_docs_per_source",
    oracle=f"""
    SELECT source, doc_id, CAST(LENGTH(text) AS BIGINT) AS text_len,
           CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT source, doc_id, text,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY LENGTH(text) DESC, doc_id
               ) AS rk
        FROM documents
    )
    WHERE rk <= {_CAP_N}
    """,
)
def cap_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalancing cap: keep the {_CAP_N} longest documents per source."""
    return cap_per_group(load_table(spark, sf_dir, "documents"), "source", _CAP_N)


# -- weighted priority sampling (Duffield–Lund–Thorup) ------------------------

_PRI_K = 4  # keep the K highest-priority docs per source


@register(
    "sample_weighted_priority",
    oracle=f"""
    SELECT source, doc_id, weight, pri, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT source, doc_id, weight, pri,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY pri, doc_id
               ) AS rk
        FROM (
            SELECT source, doc_id,
                   CAST(GREATEST(n_chars, 1) AS BIGINT) AS weight,
                   CAST(1 + ((doc_id % {_KEY_MASK}) * {_KNUTH}) % {_MOD}
                        AS DOUBLE)
                   / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS pri
            FROM documents
        )
    )
    WHERE rk <= {_PRI_K}
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup): weighted sampling without
    replacement for subset-sum estimation, fully deterministic.

    Each item gets priority ``u / w`` where ``u`` is a Fibonacci integer
    hash of its key (1..2^32) and ``w`` its weight (here ``n_chars``); the
    K items with the SMALLEST priority per stratum form the sample (small
    priority = large u-normalized weight). The priority is ONE IEEE-754
    division of identical operands on any engine — division is correctly
    rounded, so the double is bit-identical in Spark and DuckDB and the
    selected SET is reproducible anywhere, unlike rand()-based weighted
    sampling.

    Scale: hash + divide are map-only; per-stratum top-K runs as
    rank-inside-one-Exchange keyed by the stratum (same shape as
    cap_docs_per_source). No global sort, no driver state; worker memory
    O(K) with Spark's TopK window optimization.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("long")
    u = 1 + (F.col("doc_id") % _KEY_MASK) * _KNUTH % _MOD
    pri = u.cast("double") / w.cast("double")
    win = W.partitionBy("source").orderBy(F.asc("pri"), F.asc("doc_id"))
    return (
        docs.select("source", "doc_id", w.alias("weight"), pri.alias("pri"))
        .withColumn("rk", F.row_number().over(win).cast("long"))
        .filter(F.col("rk") <= _PRI_K)
    )

# -- join-consistent (correlated) sampling (deferred: r10 activation) ------------

#: keep a user when md5(user) mod DEN < NUM — a ~25% universe sample
_JC_NUM, _JC_DEN = 1, 4


@register(
    "sample_join_consistent",
    oracle=f"""
    WITH keep AS (
        SELECT DISTINCT user_id FROM events
        WHERE ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
              % {_JC_DEN} < {_JC_NUM}
    ),
    se AS (
        SELECT e.user_id, e.event_type,
               CAST(ROUND(e.value * 100) AS BIGINT) AS cents
        FROM events e JOIN keep USING (user_id)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(SUM(cents) * {_JC_DEN} AS BIGINT) AS cents_scaled_up
    FROM se GROUP BY 1
    """,
)
def join_consistent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-consistent (correlated / universe) sampling: keep a user iff
    md5(user) mod {_JC_DEN} < {_JC_NUM}, so EVERY table sampled with the
    same predicate keeps the SAME users and join/sessionization structure
    survives intact — independent Bernoulli samples of two tables keep
    only rate² of their join pairs, which is why per-table sampling
    silently destroys funnel and LTV estimates. This is the universe
    sampling of Vengerov et al. / the correlated sampling join-synopsis
    literature, and the 100 TB debugging workflow: develop on the 25%
    slice, scale estimates by the known inverse rate (cents_scaled_up),
    ship the same query against the full data.

    The hash is the engine-pinned md5 family, so the kept-user SET — not
    just its size — is deterministic and cross-engine identical; no RNG,
    no seed drift between runs or engines.

    Shape: the keep-set is a semi-join on the hash predicate — at scale a
    map-side filter (the predicate needs no shuffle at all; the DISTINCT
    here only serves the oracle's set form), then ordinary partial+final
    aggregation on the surviving quarter of the corpus.
    """
    ev = load_table(spark, sf_dir, "events")
    hashed = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % _JC_DEN
        < _JC_NUM
    )
    se = ev.filter(hashed).select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return se.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum("cents").cast("long").alias("cents"),
        (F.sum("cents") * _JC_DEN).cast("long").alias("cents_scaled_up"),
    )


from ..docfmt import format_docstrings  # noqa: E402
format_docstrings(globals())  # substitute {CONST} docstring placeholders (ADVICE r8)
