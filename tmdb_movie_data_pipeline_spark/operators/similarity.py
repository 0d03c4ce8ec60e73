"""Similarity search over the `embeddings` table (SURVEY.md §2.9).

Two paths, mirroring a production ANN stack:

* **brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set against the corpus, evaluate cosine with array expressions
  (JVM-side, no Python), window-rank per query. Cost O(|Q|·N) — right answer
  whenever |Q| is small or as the verifier behind an index;
* **LSH-bucketed ANN** — sign-random-projection buckets (deterministic ±1
  hyperplanes derived from md5 parity), equi-join on the bucket, exact
  cosine only within buckets. The candidate join is O(bucket collisions),
  the 100 TB path: buckets partition the corpus, so the per-query work no
  longer scans N rows.

All arithmetic is promoted to double *before* any sum so the DuckDB oracle
(same promotion, same rounding) is bit-stable against summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io import load_table
from ..registry import register

__all__ = ["cosine_topk", "DIM", "N_PLANES"]

DIM = 64
N_PLANES = 8
TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors in registered queries

# -- shared expression builders ----------------------------------------------


def _dot_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm_spark(a: str) -> str:
    return f"sqrt({_dot_spark(a, a)})"


def _dot_duck(a: str, b: str) -> str:
    # list_reduce folds left-to-right like Spark's aggregate(): the per-pair
    # products and every partial sum are computed in the same order, so the
    # dot product is bit-identical across engines (no rounding needed).
    return (
        f"list_reduce([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)"
        f" for i in range(1, {DIM + 1})], (acc, v) -> acc + v)"
    )


def _norm_duck(a: str) -> str:
    return f"sqrt({_dot_duck(a, a)})"


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int) -> DataFrame:
    """Exact top-k cosine neighbors: broadcast queries × corpus, rank per
    query. ``queries``/``corpus`` need (vec_id, embedding) columns."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.expr(_dot_spark("q_emb", "c_emb"))
            / (F.expr(_norm_spark("q_emb")) * F.expr(_norm_spark("c_emb"))),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
               WHERE vec_id < {N_QUERIES}),
         c AS (SELECT vec_id AS neighbor_id, embedding AS c_emb FROM embeddings),
         scored AS (
           SELECT query_id, neighbor_id,
                  {_dot_duck("q_emb", "c_emb")}
                      / ({_norm_duck("q_emb")} * {_norm_duck("c_emb")}) AS cosine
           FROM q, c WHERE query_id <> neighbor_id
         ),
         ranked AS (
           SELECT query_id, neighbor_id, cosine,
                  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
           FROM scored
         )
    SELECT * FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb.filter(F.col("vec_id") < N_QUERIES), emb, TOP_K)


# -- sign-random-projection LSH ----------------------------------------------
#
# Hyperplane p ∈ [0, N_PLANES), dimension i ∈ [0, DIM): the component is
# +1 when the first hex digit of md5('p_i') is even, else -1 — a fixed
# pseudo-random ±1 matrix both engines derive identically.


def _plane_terms(vec: str, p: int, engine: str) -> str:
    terms = []
    for i in range(DIM):
        import hashlib

        h = hashlib.md5(f"{p}_{i}".encode()).hexdigest()
        sign = "+" if int(h[0], 16) % 2 == 0 else "-"
        if engine == "spark":
            terms.append(f"{sign} CAST({vec}[{i}] AS DOUBLE)")
        else:
            terms.append(f"{sign} CAST({vec}[{i + 1}] AS DOUBLE)")
    return " ".join(terms)


def _bucket_expr(vec: str, engine: str) -> str:
    bits = []
    for p in range(N_PLANES):
        dot = _plane_terms(vec, p, engine)
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits) if engine == "duck" else f"concat({', '.join(bits)})"


@register(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding, {_bucket_expr("embedding", "duck")} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket FROM b
          WHERE vec_id < {N_QUERIES}),
    cand AS (
        SELECT q.query_id, b.vec_id AS neighbor_id, q.q_emb, b.embedding AS c_emb
        FROM q JOIN b ON q.bucket = b.bucket AND b.vec_id <> q.query_id
    ),
    scored AS (
        SELECT query_id, neighbor_id,
               {_dot_duck("q_emb", "c_emb")}
                   / ({_norm_duck("q_emb")} * {_norm_duck("c_emb")}) AS cosine
        FROM cand
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cosine,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored
    )
    SELECT * FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via sign-random-projection buckets: exact cosine only within the
    query's bucket. Recall is tunable by planes/probes; the plan is one
    equi-join on the bucket key instead of a full cross product."""
    emb = load_table(spark, sf_dir, "embeddings")
    b = emb.select(
        "vec_id",
        "embedding",
        F.expr(_bucket_expr("embedding", "spark")).alias("bucket"),
    )
    q = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = F.broadcast(q).join(
        b.withColumnRenamed("embedding", "c_emb"),
        (F.col("q_bucket") == F.col("bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            F.expr(_dot_spark("q_emb", "c_emb"))
            / (F.expr(_norm_spark("q_emb")) * F.expr(_norm_spark("c_emb")))
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


DUP_COSINE_THRESHOLD = 0.35


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_dot_duck("a.embedding", "b.embedding")}
                   / ({_norm_duck("a.embedding")} * {_norm_duck("b.embedding")}) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= {DUP_COSINE_THRESHOLD}
    """,
)
def embedding_cosine_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level near-duplicate pairs: all (a, b) with cosine above a
    threshold. Brute-force O(n²) pair scan here (verification tier); at
    corpus scale the identical scoring runs AFTER the LSH bucket join
    (ann_lsh_bucketed) so candidates are O(bucket collisions), not n² —
    same operator contract, two physical tiers."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("q_emb"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("c_emb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = F.expr(_dot_spark("q_emb", "c_emb")) / (
        F.expr(_norm_spark("q_emb")) * F.expr(_norm_spark("c_emb"))
    )
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= DUP_COSINE_THRESHOLD)
        .select("vec_a", "vec_b", "cosine")
    )
