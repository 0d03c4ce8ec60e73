"""Text-analysis operators over the `documents` table (SURVEY.md §2.9).

The reference carries free text opaquely (`overview`, src/movie.py:202);
a training-data pipeline needs to *analyze* it. Everything here is pure
Catalyst expressions over arrays — tokenization, language ID, quality
scoring, token counting, fingerprinting — zero Python per row, so the ops
run inside whole-stage codegen and scale linearly with no shuffle at all
(per-document computations are embarrassingly parallel).

Determinism contract: each op has a DuckDB oracle computing the identical
expression tree, so tokenizer edge cases (empty strings, trailing
whitespace) are pinned by the correctness gate, not by convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..io import load_table
from ..registry import register

__all__ = ["tokens_col", "norm_text_col", "LANG_MARKERS"]


def norm_text_col(c: str = "text") -> Column:
    """Canonical normalization: lowercase, collapse whitespace, trim."""
    return F.lower(F.trim(F.regexp_replace(F.col(c), r"\s+", " ")))


def tokens_col(c: str = "text") -> Column:
    """Whitespace tokens of the normalized text (no empty tokens)."""
    return F.split(norm_text_col(c), " ")


#: tiny marker-word sets for the n-gram/stopword language heuristic.
#: (Real corpora would use char-trigram profiles; the *shape* — per-language
#: marker scoring + argmax — is the operator under test.)
LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "das", "und", "ist"],
}

_NORM_SQL = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
_TOKENS_SQL = f"string_split({_NORM_SQL}, ' ')"


def _marker_count(tokens: Column, markers: list[str]) -> Column:
    lit_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(lit_arr, t)))


def _marker_count_sql(markers: list[str]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({_TOKENS_SQL}, t -> t IN ({inlist})))"


@register(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang AS labeled_lang,
               {_marker_count_sql(LANG_MARKERS["en"])} AS s_en,
               {_marker_count_sql(LANG_MARKERS["es"])} AS s_es,
               {_marker_count_sql(LANG_MARKERS["de"])} AS s_de
        FROM documents
    )
    SELECT doc_id, labeled_lang,
           CAST(s_en AS INTEGER) AS s_en,
           CAST(s_es AS INTEGER) AS s_es,
           CAST(s_de AS INTEGER) AS s_de,
           CASE WHEN s_en = 0 AND s_es = 0 AND s_de = 0 THEN 'unknown'
                WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
                WHEN s_es >= s_de THEN 'es'
                ELSE 'de' END AS predicted_lang
    FROM scored
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: per-language token scoring + deterministic
    argmax (ties broken en > es > de)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        _marker_count(toks, LANG_MARKERS["en"]).cast("int").alias("s_en"),
        _marker_count(toks, LANG_MARKERS["es"]).cast("int").alias("s_es"),
        _marker_count(toks, LANG_MARKERS["de"]).cast("int").alias("s_de"),
    )
    pred = (
        F.when((F.col("s_en") == 0) & (F.col("s_es") == 0) & (F.col("s_de") == 0), "unknown")
        .when((F.col("s_en") >= F.col("s_es")) & (F.col("s_en") >= F.col("s_de")), "en")
        .when(F.col("s_es") >= F.col("s_de"), "es")
        .otherwise("de")
    )
    return scored.withColumn("predicted_lang", pred)


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               {_TOKENS_SQL} AS toks,
               {_NORM_SQL}   AS norm,
               text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INTEGER)                                   AS n_tokens,
           CAST(length(norm) AS INTEGER)                                AS n_chars,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                 / CAST(NULLIF(len(toks), 0) AS DOUBLE)                 AS avg_token_len,
           CAST(len(list_filter(toks,
                 t -> t IN ('the','a','and','of','is','to','in'))) AS DOUBLE)
                 / CAST(NULLIF(len(toks), 0) AS DOUBLE)                 AS stopword_ratio,
           CAST(length(text)
                 - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                 / CAST(NULLIF(length(text), 0) AS DOUBLE)              AS punct_ratio,
           CAST((len(toks) BETWEEN 20 AND 1000)
                AND CAST(len(list_filter(toks,
                     t -> t IN ('the','a','and','of','is','to','in'))) AS DOUBLE)
                     / CAST(NULLIF(len(toks), 0) AS DOUBLE) >= 0.01 AS BOOLEAN) AS passes_quality
    FROM t
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality features (Gopher/C4-style length, stopword
    and punctuation ratios) + a pass/fail gate."""
    docs = load_table(spark, sf_dir, "documents")
    stop = ["the", "a", "and", "of", "is", "to", "in"]
    t = docs.select(
        "doc_id",
        tokens_col().alias("toks"),
        norm_text_col().alias("norm"),
        "text",
    )
    n_tokens = F.size("toks")
    tok_chars = F.aggregate(
        F.transform("toks", lambda x: F.length(x)), F.lit(0), lambda a, b: a + b
    )
    stop_cnt = _marker_count(F.col("toks"), stop)
    punct_cnt = F.length("text") - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))
    # raw int/int IEEE divisions: both engines divide identical integers, so
    # the doubles are bit-equal — no rounding (rounding near ties is what
    # breaks cross-engine equality, see functions/numeric.py).
    denom = F.nullif(n_tokens, F.lit(0)).cast("double")
    stop_ratio = stop_cnt.cast("double") / denom
    return t.select(
        "doc_id",
        n_tokens.cast("int").alias("n_tokens"),
        F.length("norm").cast("int").alias("n_chars"),
        (tok_chars.cast("double") / denom).alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        (punct_cnt.cast("double") / F.nullif(F.length("text"), F.lit(0)).cast("double")).alias(
            "punct_ratio"
        ),
        (n_tokens.between(20, 1000) & (stop_ratio >= 0.01)).alias("passes_quality"),
    )


@register(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKENS_SQL}) AS INTEGER)                          AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS INTEGER)
                                                                        AS word_tokens,
           CAST(CEIL(length(text) / 4.0) AS INTEGER)                    AS approx_bpe_tokens
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, word-regex extraction
    (a BPE-ish pre-tokenizer), and the chars/4 BPE-budget estimate."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens_col()).cast("int").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+|[0-9]+"), F.lit(0)))
        .cast("int")
        .alias("word_tokens"),
        F.ceil(F.length("text") / 4.0).cast("int").alias("approx_bpe_tokens"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5({_NORM_SQL}) AS content_md5,
           list_min([md5(substr({_NORM_SQL}, i, 16))
                     for i in range(1, GREATEST(length({_NORM_SQL}) - 14, 2))])
                            AS min_shingle_hash
    FROM documents
    """,
)
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-content hash + min-hash over rolling
    16-char shingles (winnowing-style; the min over a rolling window of
    hashes is the classic local fingerprint)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = norm_text_col()
    shingle_min = F.expr(
        "array_min(transform(sequence(1, greatest(length(lower(trim(regexp_replace(text,"
        " '\\\\s+', ' ')))) - 15, 1)),"
        " i -> md5(substring(lower(trim(regexp_replace(text, '\\\\s+', ' '))), i, 16))))"
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("content_md5"),
        shingle_min.alias("min_shingle_hash"),
    )


# -- TF-IDF ------------------------------------------------------------------

TFIDF_TOP_K = 3

_TFIDF_ORACLE = f"""
WITH toked AS (
    SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
), tf AS (
    SELECT doc_id, term, COUNT(*) AS tf, ANY_VALUE(n_toks) AS n_toks
    FROM (SELECT doc_id, UNNEST(toks) AS term, len(toks) AS n_toks FROM toked)
    GROUP BY doc_id, term
), df AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
), n AS (
    SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
    SELECT tf.doc_id, tf.term,
           (CAST(tf.tf AS DOUBLE) / CAST(tf.n_toks AS DOUBLE))
             * (CAST(n.n_docs + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE)) AS tfidf
    FROM tf JOIN df USING (term), n
), ranked AS (
    SELECT doc_id, term, tfidf,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS BIGINT) AS rk
    FROM scored
)
SELECT doc_id, term, tfidf, rk FROM ranked WHERE rk <= {TFIDF_TOP_K}
"""


@register("text_tfidf_top_terms", oracle=_TFIDF_ORACLE)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-k terms by TF-IDF.

    The IDF factor is the log-free rational (N+1)/(df+1): same ranking
    monotonicity as log-IDF, but every score is a product of exact-integer
    ratios — bit-identical across engines (ln() is libm-dependent and would
    poison the hash). Dataflow: explode → per-(doc,term) counts → term df →
    broadcast-join scores → window top-k; the explode shuffles once on
    (doc_id, term), df is a tiny broadcast side.
    """
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokens_col().alias("toks"))
    terms = toked.select(
        "doc_id",
        F.explode("toks").alias("term"),
        F.size("toks").alias("n_toks"),
    )
    tf = (
        terms.groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.any_value(F.col("n_toks")).alias("n_toks"),
        )
        # r21 session 2 (guide §2.4): tf feeds the df build AND the scoring
        # join, and the token explode + groupBy re-executed under both with
        # zero runtime exchange reuse. Lazy checkpoint: materialized once
        # inside the first action. Interleaved A/B at sf0.1, results
        # asserted identical: steady 0.989 → 0.486 s, cold 0.961 → 0.598 s.
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # scalar dimension; fine to evaluate eagerly
    scored = tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        (
            (F.col("tf").cast("double") / F.col("n_toks").cast("double"))
            * (F.lit(float(n_docs + 1)) / (F.col("df") + 1).cast("double"))
        ).alias("tfidf"),
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tfidf", "rk")
    )


# -- Gopher-style repetition filter -------------------------------------------

#: gate thresholds (Rae et al. 2021 "Gopher" §A1.1 uses the same family of
#: duplicate-n-gram / top-token-fraction rules; thresholds here are tuned to
#: the synthetic corpus so both branches of the gate are exercised).
REP_MAX_DUP_UNIGRAM = 0.6
REP_MAX_TOP_TOKEN = 0.2
REP_MAX_DUP_TRIGRAM = 0.1


@register(
    "text_repetition_filter",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
    ft AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
    uni AS (SELECT doc_id, UNNEST(toks) AS w FROM ft),
    per_tok AS (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY 1, 2
    ),
    uni_stats AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT)   AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
               CAST(MAX(c) AS BIGINT)   AS top_cnt
        FROM per_tok GROUP BY 1
    ),
    tri AS (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
        FROM ft
    ),
    tri_stats AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT)          AS n_trigrams,
               CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct_trigrams
        FROM tri GROUP BY 1
    )
    SELECT u.doc_id, n_tokens, n_distinct_tokens,
           1.0 - CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               AS dup_unigram_ratio,
           CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_frac,
           n_trigrams, n_distinct_trigrams,
           1.0 - CAST(n_distinct_trigrams AS DOUBLE) / CAST(n_trigrams AS DOUBLE)
               AS dup_trigram_ratio,
           (1.0 - CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE))
               <= {REP_MAX_DUP_UNIGRAM}
           AND CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               <= {REP_MAX_TOP_TOKEN}
           AND (1.0 - CAST(n_distinct_trigrams AS DOUBLE) / CAST(n_trigrams AS DOUBLE))
               <= {REP_MAX_DUP_TRIGRAM} AS passes_repetition
    FROM uni_stats u JOIN tri_stats tr ON tr.doc_id = u.doc_id
    """,
)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate over the corpus table — see
    :func:`repetition_stats` for the semantics and scale shape."""
    return repetition_stats(load_table(spark, sf_dir, "documents"))


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Duplicate-unigram ratio, top-token fraction, and duplicate-word-
    trigram ratio per document, plus a pass/fail flag (Gopher §A1.1-style
    repetition rules).

    Scale shape: two aggregation trees (unigram counts, trigram counts),
    each an explode → partial+final hash agg shuffled on ``doc_id``; the
    final join is co-partitioned on the same key, so no extra exchange
    beyond the two aggregations. Trigrams are built map-side with an array
    ``transform`` over index ``sequence`` (no window, no second shuffle) —
    the tokenizer is shared with the rest of the text battery. Ratios are
    raw int/int IEEE divisions (bit-equal cross-engine); filtering to
    ``size >= 3`` happens BEFORE the sequence so no descending-sequence or
    out-of-bounds element_at can occur under ANSI mode.
    """
    docs = (
        documents.select("doc_id", tokens_col().alias("toks"))
        .filter(F.size("toks") >= 3)
        # the unigram tree and the trigram tree both consume this relation
        # and executed plans get zero runtime exchange reuse (r21 survey),
        # so the regexp tokenizer ran twice per action; tokenize once.
        .localCheckpoint(eager=False)
    )
    uni = docs.select("doc_id", F.explode("toks").alias("w"))
    per_tok = uni.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    uni_stats = per_tok.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
        F.max("c").cast("long").alias("top_cnt"),
    )
    # 1-indexed to mirror the oracle's DuckDB list indexing exactly
    trigram = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("toks"), i),
            F.element_at(F.col("toks"), i + F.lit(1)),
            F.element_at(F.col("toks"), i + F.lit(2)),
        ),
    )
    tri = docs.select("doc_id", F.explode(trigram).alias("g"))
    tri_stats = tri.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.countDistinct("g").cast("long").alias("n_distinct_trigrams"),
    )
    dup_uni = F.lit(1.0) - F.col("n_distinct_tokens").cast("double") / F.col(
        "n_tokens"
    ).cast("double")
    top_frac = F.col("top_cnt").cast("double") / F.col("n_tokens").cast("double")
    dup_tri = F.lit(1.0) - F.col("n_distinct_trigrams").cast("double") / F.col(
        "n_trigrams"
    ).cast("double")
    return uni_stats.join(tri_stats, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        dup_uni.alias("dup_unigram_ratio"),
        top_frac.alias("top_token_frac"),
        "n_trigrams",
        "n_distinct_trigrams",
        dup_tri.alias("dup_trigram_ratio"),
        (
            (dup_uni <= REP_MAX_DUP_UNIGRAM)
            & (top_frac <= REP_MAX_TOP_TOKEN)
            & (dup_tri <= REP_MAX_DUP_TRIGRAM)
        ).alias("passes_repetition"),
    )


# -- BM25-family ranked retrieval (engine-exact variant) ----------------------

_BM25_TERMS = ("spark", "join", "dup")  # fixed query: common, common, rare
_BM25_TOPK = 20
# k1 = 1.2, b = 0.75 pre-folded into decimal literals (identical doubles in
# both parsers): 2.2 = k1+1, 0.3 = k1*(1-b), 0.9 = k1*b
_BM25_NUM, _BM25_C0, _BM25_C1 = "2.2", "0.3", "0.9"


def _bm25_score_expr(div_op: str) -> str:
    """The BM25 score as ONE explicit expression string, textually
    identical on both engines except the integer-division token (`div` vs
    `//`). Each term's contribution is exact-rounded basic IEEE arithmetic
    over integer inputs, and terms fold LEFT-ASSOC in fixed order, so the
    summed double is bit-identical cross-engine — the _dist_sql recipe.
    IDF is the integer floor-log2 (length(bin(q))) of the smoothed ratio
    (N+1) div (df+1): ln-IDF would hand each engine its own libm (the
    1-ulp divergence the HLL work measured), while bin() is exact in both;
    same monotone shape, deterministic everywhere."""
    avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    parts = []
    for i in range(len(_BM25_TERMS)):
        idf = f"CAST(length(bin((n_docs + 1) {div_op} (df{i} + 1))) AS DOUBLE)"
        tf = (
            f"((CAST(f{i} AS DOUBLE) * {_BM25_NUM}) / "
            f"(CAST(f{i} AS DOUBLE) + {_BM25_C0} + "
            f"{_BM25_C1} * CAST(dl AS DOUBLE) / {avgdl}))"
        )
        parts.append(f"({idf} * {tf})")
    return " + ".join(parts)


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
    feat AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
               {", ".join(f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS f{i}" for i, t in enumerate(_BM25_TERMS))}
        FROM d
    ),
    st AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS sum_dl,
               {", ".join(f"CAST(SUM(CASE WHEN f{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}" for i in range(len(_BM25_TERMS)))}
        FROM feat
    )
    SELECT doc_id, dl, {_bm25_score_expr("//")} AS score
    FROM feat, st
    ORDER BY score DESC, doc_id
    LIMIT {_BM25_TOPK}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_BM25_TOPK} documents for a fixed conjunctive query under
    BM25 scoring (k1=1.2, b=0.75) — ranked retrieval over the corpus, the
    query a search/RAG layer runs per request.

    Scale shape: term frequencies and doc length are per-row Catalyst HOFs
    (one corpus scan, no explode); the collection statistics (N, Σdl, per-
    term df) are ONE 1-row conditional aggregate broadcast back over the
    corpus; the top-k is (score, doc_id)-ordered with a LIMIT, which
    Catalyst executes as TakeOrderedAndProject — per-partition heaps, no
    global sort (the llm_quality_percentile_gate pin). At 100 TB an
    inverted index beats a scan per query, but the SCORING and statistics
    pipeline is exactly this; the scan form is also what index-building
    itself runs. Determinism: see _bm25_score_expr — integer inputs,
    exact-rounded arithmetic, fixed fold order, floor-log2 IDF."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()

    def _tf(term: str) -> Column:
        # NB: the lambda must be single-arg — a second parameter would be
        # interpreted by F.filter as the element INDEX
        return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("long")

    feat = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[_tf(t).alias(f"f{i}") for i, t in enumerate(_BM25_TERMS)],
    )
    st = feat.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"f{i}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    return (
        feat.crossJoin(F.broadcast(st))
        .select("doc_id", "dl", F.expr(_bm25_score_expr("div")).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_BM25_TOPK)
    )


# -- inverted index: capped posting lists per term ----------------------------

_IDX_MIN_DF = 5  # drop near-hapax terms
_IDX_MAX_DF_NUM, _IDX_MAX_DF_DEN = 4, 5  # RELATIVE ceiling: df <= 4n/5 drops universal terms
_IDX_CAP = 10  # postings kept per term (smallest doc_ids)


@register(
    "text_inverted_index",
    oracle=f"""
    WITH pairs AS (
        SELECT DISTINCT doc_id, t.term
        FROM documents, UNNEST({_TOKENS_SQL}) AS t(term)
        WHERE length(t.term) >= 3
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list_sort(list(doc_id))[1:{_IDX_CAP}], ',') AS postings
    FROM pairs
    GROUP BY term
    HAVING COUNT(*) BETWEEN {_IDX_MIN_DF}
       AND ({_IDX_MAX_DF_NUM} * (SELECT COUNT(*) FROM documents))
           // {_IDX_MAX_DF_DEN}
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build — term -> (document frequency, capped sorted
    posting list), the retrieval-side dual of text_bm25_topk's scoring.

    Shape: explode to (doc, term), distinct (the partial-aggregable dedup
    of within-doc repeats); df is a plain count (O(1) agg state). The
    posting list is emitted as a comma-joined STRING, not an array — the
    driver's result canonicalizer sorts the output frame with pandas
    ``sort_values``, which raises ``unhashable type: 'list'`` on array
    cells (the r6 defect on this exact query), so every registered
    query's top-level columns must stay atomic (CI-pinned in
    tests/test_oracle.py). The postings are built only from rows
    surviving a per-term
    row_number <= {_IDX_CAP} pre-rank — the rank window runs a spill-safe
    streamed sort, so the collect_set downstream of it holds at most
    {_IDX_CAP} ids per term and NO aggregation buffer is ever
    stop-word-sized (a bare collect_set-then-slice would materialize the
    full posting set per term before capping — the exact skew OOM this
    avoids). The RELATIVE df ceiling (4·n_docs/5, a 1-row broadcast) then
    drops near-universal terms. Tokenization is the module's shared
    normalized-whitespace contract, so the oracle pins edge cases.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        docs.select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .filter(F.length("term") >= 3)
        .distinct()
    )
    max_df = docs.agg(
        F.expr(
            f"({_IDX_MAX_DF_NUM} * count(*)) div {_IDX_MAX_DF_DEN}"
        ).alias("_max_df")
    )
    df_tbl = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w_cap = W.partitionBy("term").orderBy("doc_id")
    capped = pairs.withColumn("_rk", F.row_number().over(w_cap)).filter(
        F.col("_rk") <= _IDX_CAP
    )
    postings = capped.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_set("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings")
    )
    return (
        df_tbl.join(postings, "term")
        .crossJoin(F.broadcast(max_df))
        .filter(F.col("df").between(_IDX_MIN_DF, F.col("_max_df")))
        .select("term", "df", "postings")
    )


# -- bigram language model: conditional next-token distribution ---------------

_LM_TOPN = 3  # next-token candidates kept per context token
_LM_MIN_CTX = 20  # contexts must occur at least this often


@register(
    "text_bigram_lm",
    oracle=f"""
    WITH toks AS (
        SELECT {_TOKENS_SQL} AS tl FROM documents
    ), bi AS (
        SELECT tl[g.i] AS w1, tl[g.i + 1] AS w2
        FROM toks, UNNEST(generate_series(1, len(tl) - 1)) AS g(i)
    ), cnt AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n
        FROM bi GROUP BY 1, 2
    ), ctx AS (
        SELECT w1, w2, n,
               CAST(SUM(n) OVER (PARTITION BY w1) AS BIGINT) AS n_ctx,
               ROW_NUMBER() OVER (
                   PARTITION BY w1 ORDER BY n DESC, w2) AS rk
        FROM cnt
    )
    SELECT w1, w2, n, n_ctx,
           (1000000 * n) // n_ctx AS cond_ppm,
           CAST(rk AS BIGINT)     AS rk
    FROM ctx
    WHERE rk <= {_LM_TOPN} AND n_ctx >= {_LM_MIN_CTX}
    """,
)
def bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language model estimation: for every context token seen at
    least {_LM_MIN_CTX} times, the top-{_LM_TOPN} next tokens with exact
    integer-ppm conditional probability n(w1,w2)·1e6 div n(w1) — the
    count-based LM that quality filters and domain classifiers bootstrap
    from (and the n-gram side of perplexity-style scoring, kept
    division-exact so any engine reproduces it).

    Shape: bigram extraction is MAP-ONLY — adjacent tokens come from
    zipping the token array against itself shifted by one (slice+zip, no
    posexplode/LEAD, so no doc-keyed shuffle exists at all); bigram
    counting is partial-aggregable on a vocabulary-bounded domain; context
    totals and ranking share ONE Exchange keyed on w1. No corpus-sized
    state anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens_col("text").alias("tl"))
    bi = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("tl"), 1, F.greatest(F.size("tl") - 1, F.lit(0))),
                    F.expr("slice(tl, 2, greatest(size(tl) - 1, 0))"),
                )
            ).alias("z")
        )
        .select(F.col("z.0").alias("w1"), F.col("z.1").alias("w2"))
    )
    cnt = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    w_ctx = W.partitionBy("w1")
    ctx = cnt.select(
        "w1",
        "w2",
        "n",
        F.sum("n").over(w_ctx).cast("long").alias("n_ctx"),
        F.row_number()
        .over(W.partitionBy("w1").orderBy(F.desc("n"), "w2"))
        .cast("long")
        .alias("rk"),
    )
    return ctx.filter(
        (F.col("rk") <= _LM_TOPN) & (F.col("n_ctx") >= _LM_MIN_CTX)
    ).select(
        "w1",
        "w2",
        "n",
        "n_ctx",
        F.expr("(1000000 * n) div n_ctx").alias("cond_ppm"),
        "rk",
    )


# -- OOV-bigram rate: log-free LM novelty scoring ------------------------------


@register(
    "text_oov_bigram_rate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKENS_SQL} AS tl FROM documents
    ), bi AS (
        SELECT doc_id, tl[g.i] AS w1, tl[g.i + 1] AS w2
        FROM toks, UNNEST(generate_series(1, len(tl) - 1)) AS g(i)
    ), cnt AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n
        FROM bi GROUP BY 1, 2
    ), lm AS (
        SELECT w1, w2 FROM (
            SELECT w1, w2, n,
                   CAST(SUM(n) OVER (PARTITION BY w1) AS BIGINT) AS n_ctx,
                   ROW_NUMBER() OVER (PARTITION BY w1
                                      ORDER BY n DESC, w2) AS rk
            FROM cnt
        ) WHERE rk <= {_LM_TOPN} AND n_ctx >= {_LM_MIN_CTX}
    ), scored AS (
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(COUNT(l.w1) AS BIGINT) AS n_in_lm
        FROM bi b LEFT JOIN lm l ON l.w1 = b.w1 AND l.w2 = b.w2
        GROUP BY 1
    )
    SELECT doc_id, n_bigrams, n_in_lm,
           CAST((1000000 * (n_bigrams - n_in_lm)) // n_bigrams AS BIGINT)
               AS oov_ppm
    FROM scored WHERE n_bigrams > 0
    """,
)
def oov_bigram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-model bigram rate — the LOG-FREE perplexity
    stand-in: score each document by the fraction of its adjacent token
    pairs that fall OUTSIDE the corpus bigram LM (text_bigram_lm's table:
    contexts seen >= {_LM_MIN_CTX} times, top-{_LM_TOPN} continuations).
    High oov_ppm marks documents whose local token statistics diverge
    from the corpus — the cheap novelty/garbage signal quality funnels
    threshold where true perplexity would need per-token logs (and a
    float sum the hash gate could never pin). Self-scoring against the
    corpus's own LM is the bootstrap form; production scores new batches
    against a FROZEN LM table, same join.

    Shape: bigram extraction is the same map-only zip-against-shift as
    the LM build (here keeping doc_id); the LM relation is vocabulary-
    bounded and the membership probe is one equi-join on (w1, w2) —
    broadcastable at any corpus size because the LM's row count is capped
    by |vocab| x {_LM_TOPN}. One doc-keyed aggregate closes it out."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col("text").alias("tl"))
    bi = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("tl"), 1, F.greatest(F.size("tl") - 1, F.lit(0))),
                F.expr("slice(tl, 2, greatest(size(tl) - 1, 0))"),
            )
        ).alias("z"),
    ).select("doc_id", F.col("z.0").alias("w1"), F.col("z.1").alias("w2"))
    lm = bigram_lm(spark, sf_dir).select("w1", "w2", F.lit(1).alias("_hit"))
    scored = (
        bi.join(F.broadcast(lm), ["w1", "w2"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.count("_hit").cast("long").alias("n_in_lm"),
        )
    )
    return scored.filter(F.col("n_bigrams") > 0).select(
        "doc_id",
        "n_bigrams",
        "n_in_lm",
        F.expr("(1000000 * (n_bigrams - n_in_lm)) div n_bigrams")
        .cast("long")
        .alias("oov_ppm"),
    )
oov_bigram_rate.__doc__ = oov_bigram_rate.__doc__.format(_LM_MIN_CTX=_LM_MIN_CTX, _LM_TOPN=_LM_TOPN)  # real docstring (ADVICE r7)


# -- Cohen's kappa: classifier-vs-label agreement ------------------------------

_KAPPA_SCORED_SQL = f"""
    scored AS (
        SELECT lang AS lab,
               CASE WHEN s_en = 0 AND s_es = 0 AND s_de = 0 THEN 'unknown'
                    WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
                    WHEN s_es >= s_de THEN 'es'
                    ELSE 'de' END AS pred
        FROM (
            SELECT lang,
                   {_marker_count_sql(LANG_MARKERS["en"])} AS s_en,
                   {_marker_count_sql(LANG_MARKERS["es"])} AS s_es,
                   {_marker_count_sql(LANG_MARKERS["de"])} AS s_de
            FROM documents
        )
    )"""


@register(
    "ml_cohen_kappa",
    oracle=f"""
    WITH {_KAPPA_SCORED_SQL},
    cm AS (
        SELECT lab, pred, CAST(COUNT(*) AS BIGINT) AS c
        FROM scored GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN lab = pred THEN c ELSE 0 END) AS BIGINT)
                   AS diag
        FROM cm
    ), pe AS (
        SELECT CAST(COALESCE(SUM(CAST(r.rc AS HUGEINT) * c.cc), 0) AS HUGEINT)
                   AS pe_num
        FROM (SELECT lab AS k, SUM(c) AS rc FROM cm GROUP BY 1) r
        JOIN (SELECT pred AS k, SUM(c) AS cc FROM cm GROUP BY 1) c
          ON c.k = r.k
    )
    SELECT t.n, t.diag AS n_agree, CAST(p.pe_num AS BIGINT) AS pe_num,
           CAST(CASE WHEN CAST(t.n AS HUGEINT) * t.diag >= p.pe_num
                     THEN (1000000 * (CAST(t.n AS HUGEINT) * t.diag - p.pe_num))
                          // (CAST(t.n AS HUGEINT) * t.n - p.pe_num)
                     ELSE -((1000000 * (p.pe_num - CAST(t.n AS HUGEINT) * t.diag))
                            // (CAST(t.n AS HUGEINT) * t.n - p.pe_num))
                END AS BIGINT) AS kappa_ppm
    FROM tot t CROSS JOIN pe p
    """,
)
def cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the marker-word language classifier
    (text_lang_id's exact decision rule) and the stored lang label —
    chance-corrected agreement, the honest upgrade over raw accuracy
    when classes are imbalanced (a classifier that always answers the
    majority language scores high accuracy but kappa ~= 0).

    kappa = (p_o - p_e)/(1 - p_e) computed as one exact integer rational:
    1e6*(n*diag - sum_k row_k*col_k) over (n^2 - sum_k row_k*col_k),
    marginals joined on the category union (one-sided categories
    contribute zero expected mass). The numerator CAN be negative
    (worse-than-chance); both engines' integer division in fact truncates
    toward zero (measured r11: DuckDB (-5)//2 = -2, same as Spark div),
    but the division still runs on the absolute value with the sign
    re-applied — the convention-independent form, bit-identical on
    either side of zero whatever an engine's negative-division rule. DECIMAL(38,0)/HUGEINT intermediates per the chi2 recipe.

    Shape: the confusion matrix is a |labels| x |predictions| aggregate
    of one scan; everything after is driver-tiny.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    scored = docs.select(
        F.col("lang").alias("lab"),
        _marker_count(toks, LANG_MARKERS["en"]).alias("s_en"),
        _marker_count(toks, LANG_MARKERS["es"]).alias("s_es"),
        _marker_count(toks, LANG_MARKERS["de"]).alias("s_de"),
    ).select(
        "lab",
        F.when(
            (F.col("s_en") == 0) & (F.col("s_es") == 0) & (F.col("s_de") == 0),
            "unknown",
        )
        .when(
            (F.col("s_en") >= F.col("s_es")) & (F.col("s_en") >= F.col("s_de")),
            "en",
        )
        .when(F.col("s_es") >= F.col("s_de"), "es")
        .otherwise("de")
        .alias("pred"),
    )
    cm = scored.groupBy("lab", "pred").agg(F.count(F.lit(1)).alias("c"))
    tot = cm.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("lab") == F.col("pred"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("diag"),
    )
    rows_m = cm.groupBy(F.col("lab").alias("k")).agg(F.sum("c").alias("rc"))
    cols_m = cm.groupBy(F.col("pred").alias("k")).agg(F.sum("c").alias("cc"))
    pe = rows_m.join(cols_m, "k").agg(
        F.expr(
            "CAST(COALESCE(SUM(CAST(rc AS DECIMAL(19,0)) * cc), 0)"
            " AS DECIMAL(38,0))"
        ).alias("pe_num")
    )
    return (
        tot.crossJoin(pe)
        .select(
            "n",
            F.col("diag").alias("n_agree"),
            F.col("pe_num").cast("long").alias("pe_num"),
            F.expr(
                "CAST(CASE WHEN CAST(n AS DECIMAL(19,0)) * diag >= pe_num"
                " THEN (CAST(1000000 AS DECIMAL(38,0))"
                "       * (CAST(n AS DECIMAL(19,0)) * diag - pe_num))"
                "      div (CAST(n AS DECIMAL(19,0)) * n - pe_num)"
                " ELSE -((CAST(1000000 AS DECIMAL(38,0))"
                "         * (pe_num - CAST(n AS DECIMAL(19,0)) * diag))"
                "        div (CAST(n AS DECIMAL(19,0)) * n - pe_num))"
                " END AS BIGINT)"
            ).alias("kappa_ppm"),
        )
    )


# -- tokenizer fertility per language ------------------------------------------


@register(
    "llm_tokenizer_fertility",
    oracle=f"""
    WITH per_doc AS (
        SELECT lang,
               CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+'))
                    AS BIGINT) AS n_subwords,
               CAST(CEIL(length(text) / 4.0) AS BIGINT) AS n_bpe_est
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_subwords) AS BIGINT) AS n_subwords,
           CAST((1000000 * SUM(n_subwords)) // SUM(n_words) AS BIGINT)
               AS fertility_ppm,
           CAST((1000000 * SUM(n_bpe_est)) // SUM(n_words) AS BIGINT)
               AS bpe_fertility_ppm
    FROM per_doc GROUP BY 1
    """,
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword tokens per word in exact
    ppm — the per-language cost metric training-data budgets are priced
    in (a language whose tokenizer emits 2.1 tokens/word consumes 2.1×
    the context of one at 1.0; fertility imbalance is how multilingual
    models end up undertrained on high-fertility languages). Reported for
    both the word-regex pre-tokenizer and the chars/4 BPE budget
    estimate, over text_token_count's exact same token definitions so the
    per-doc and per-language views can never disagree.

    Shape: one scan, one |langs|-sized partial+final aggregate; the ppm
    divisions happen per GROUP, never per row.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.size(tokens_col()).cast("long").alias("n_words"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+|[0-9]+"), F.lit(0))
        )
        .cast("long")
        .alias("n_subwords"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("n_bpe_est"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_subwords").cast("long").alias("n_subwords"),
        F.expr("CAST((1000000 * SUM(n_subwords)) div SUM(n_words) AS BIGINT)")
        .alias("fertility_ppm"),
        F.expr("CAST((1000000 * SUM(n_bpe_est)) div SUM(n_words) AS BIGINT)")
        .alias("bpe_fertility_ppm"),
    )

# -- Zipf rank-frequency profile ----------------------------------------------

_ZIPF_MAX_RANK = 4096  # profile sampled at powers of two up to this rank


@register(
    "text_zipf_profile",
    oracle=f"""
    WITH tf AS (
        SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT UNNEST({_TOKENS_SQL}) AS t FROM documents)
        WHERE t <> '' GROUP BY 1
    ), ranked AS (
        SELECT term, freq,
               CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS BIGINT)
                   AS rank
        FROM tf
    )
    SELECT rank, term, freq,
           CAST(rank * freq AS BIGINT) AS rank_freq_product
    FROM ranked
    WHERE rank IN (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
    """,
)
def zipf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency profile of the corpus vocabulary, sampled at
    power-of-two ranks up to {_ZIPF_MAX_RANK}: under Zipf's law
    rank × freq is ~constant, so the emitted ``rank_freq_product`` column
    IS the law's diagnostic — a corpus whose product collapses at high
    ranks is template-heavy (low tail diversity), one whose product grows
    is scrape-noise-heavy. Exact integers end to end: no log-log fit, so
    nothing floats and the profile reproduces bit-for-bit cross-engine.

    Shape: term frequencies are one partial+final hash-agg over the token
    explosion. The global ordering that defines ``rank`` is computed the
    distributed way — a frequency-HISTOGRAM offset (how many terms have
    strictly higher freq, a Zipf-tiny relation since distinct freq values
    ≪ vocab) plus a per-frequency-class window ordered by term — so no
    single-partition sort over the vocabulary exists in the plan; the
    only unpartitioned window runs over the distinct-frequency histogram.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens_col()).alias("t"))
        .filter(F.col("t") != "")
        .groupBy(F.col("t").alias("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        # the tf relation feeds BOTH the frequency histogram and the rank
        # probe; without materialization each branch would re-run the
        # corpus explode+agg (DataFrame reuse is recomputation). The
        # vocabulary is explode-output collapsed to distinct terms —
        # orders of magnitude smaller than the corpus — so staging it is
        # the graph.py edge-list pattern, not a corpus cache.
        .localCheckpoint(eager=False)
    )
    # terms with strictly higher frequency: cumulative counts over the
    # descending distinct-frequency histogram (value-domain-sized)
    hist = tf.groupBy("freq").agg(F.count(F.lit(1)).alias("n_terms"))
    w_hist = W.orderBy(F.desc("freq")).rowsBetween(W.unboundedPreceding, -1)
    above = hist.withColumn(
        "n_above", F.coalesce(F.sum("n_terms").over(w_hist), F.lit(0))
    ).select("freq", "n_above")
    w_tie = W.partitionBy("freq").orderBy("term")
    ranked = (
        tf.join(F.broadcast(above), "freq")
        .withColumn(
            "rank", (F.col("n_above") + F.row_number().over(w_tie)).cast("long")
        )
        .filter(F.col("rank") <= _ZIPF_MAX_RANK)
    )
    pows = [1 << i for i in range(13)]  # 1 .. 4096
    return ranked.filter(F.col("rank").isin(pows)).select(
        "rank",
        "term",
        "freq",
        (F.col("rank") * F.col("freq")).cast("long").alias("rank_freq_product"),
    )


# -- hapax legomena / vocabulary richness -------------------------------------


@register(
    "text_hapax_ratio",
    oracle=f"""
    WITH tf AS (
        SELECT lang, t AS term, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT lang, UNNEST({_TOKENS_SQL}) AS t FROM documents)
        WHERE t <> '' GROUP BY 1, 2
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(freq) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST((1000000 * SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS hapax_vocab_ppm,
           CAST((1000000 * SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END))
                // SUM(freq) AS BIGINT) AS hapax_token_ppm
    FROM tf GROUP BY 1
    """,
)
def hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena share per language — the classic vocabulary-richness
    signal (Baayen): hapax/vocab near 0.5 is typical for natural text;
    far below marks boilerplate/template corpora, far above marks OCR
    noise or tokenizer damage. Both normalizations reported (share of
    VOCAB and share of TOKENS) in exact ppm.

    Shape: one token explosion → (lang, term) partial+final count →
    |langs|-sized final agg. The hapax indicator is a per-group integer
    flag; nothing floats and no window exists at all."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("lang", F.explode(tokens_col()).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("lang", F.col("t").alias("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return tf.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("freq").cast("long").alias("n_tokens"),
        F.sum((F.col("freq") == 1).cast("long")).cast("long").alias("hapax"),
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END))"
            " div COUNT(*) AS BIGINT)"
        ).alias("hapax_vocab_ppm"),
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END))"
            " div SUM(freq) AS BIGINT)"
        ).alias("hapax_token_ppm"),
    )


# -- readability (Flesch-shaped, integer-exact) -------------------------------


@register(
    "text_readability",
    oracle=f"""
    WITH per_doc AS (
        SELECT doc_id,
               GREATEST(len(list_filter(
                   regexp_split_to_array(text, '[.!?]+'),
                   s -> length(trim(s)) > 0)), 1) AS n_sents,
               GREATEST(CAST(len({_TOKENS_SQL}) AS BIGINT), 1) AS n_words,
               CAST(len(regexp_split_to_array({_NORM_SQL}, '[aeiouy]+')) - 1
                    AS BIGINT) AS n_syll
        FROM documents
    )
    SELECT doc_id,
           CAST(n_sents AS BIGINT) AS n_sents,
           n_words, n_syll,
           CAST(206835
                - (1015 * n_words) // n_sents
                - (84600 * n_syll) // n_words AS BIGINT) AS fre_milli
    FROM per_doc
    """,
)
def readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-reading-ease-shaped readability per document, integer-exact:
    fre_milli = 206835 − ⌊1015·W/S⌋ − ⌊84600·Y/W⌋ over sentence count S
    (non-empty [.!?]-delimited segments, floored at 1), word count W
    (whitespace tokens of the normalized text) and the vowel-RUN count Y
    (maximal [aeiouy]+ groups — the standard cheap syllable proxy). The
    two floor divisions replace the textbook's real-valued ratios, so the
    score is deterministic and bit-identical cross-engine while ranking
    documents the same way — this is the length/complexity quality gate
    corpus filters run beside stopword/punctuation ratios
    (text_quality_score), not beside them redundantly: readability reacts
    to sentence LENGTH and word SHAPE, which the ratio battery is blind
    to.

    Shape: one scan, one projection, zero joins/windows/Python — pure
    whole-stage-codegen at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    sents = F.greatest(
        F.size(
            F.filter(
                F.split(F.col("text"), r"[.!?]+"),
                lambda s: F.length(F.trim(s)) > 0,
            )
        ),
        F.lit(1),
    )
    words = F.greatest(F.size(tokens_col()), F.lit(1)).cast("long")
    syll = (F.size(F.split(norm_text_col(), "[aeiouy]+")) - 1).cast("long")
    per_doc = docs.select(
        "doc_id",
        sents.cast("long").alias("n_sents"),
        words.alias("n_words"),
        syll.alias("n_syll"),
    )
    return per_doc.withColumn(
        "fre_milli",
        F.expr(
            "CAST(206835 - (1015 * n_words) div n_sents"
            " - (84600 * n_syll) div n_words AS BIGINT)"
        ),
    )


# -- character diversity (Simpson / Rényi-2, integer-exact) --------------------

#: chars of normalized text examined per document — a fixed prefix, the way
#: production quality classifiers sample documents instead of scanning 100 MB
#: outliers end to end
_DIVERSITY_PREFIX = 256


@register(
    "text_char_diversity",
    oracle=f"""
    WITH ch AS (
        SELECT doc_id,
               UNNEST(string_split(substr({_NORM_SQL}, 1, {_DIVERSITY_PREFIX}),
                                   '')) AS ch
        FROM documents
    ),
    c AS (
        SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
        FROM ch WHERE ch <> '' GROUP BY 1, 2
    ),
    d AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_chars_pfx,
               CAST(COUNT(*) AS BIGINT) AS distinct_chars,
               CAST(SUM(c * (c - 1)) AS BIGINT) AS coll
        FROM c GROUP BY 1
    )
    SELECT doc_id, n_chars_pfx, distinct_chars,
           CAST((1000000 * coll) // (n_chars_pfx * (n_chars_pfx - 1))
                AS BIGINT) AS simpson_ppm
    FROM d WHERE n_chars_pfx >= 2
    """,
)
def char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Simpson collision index per document over the first
    {_DIVERSITY_PREFIX} normalized chars: simpson_ppm = 1e6 · Σc(c−1) /
    n(n−1), the probability two sampled character positions collide. This
    is the integer-exact Rényi-2 cousin of Shannon character entropy (which
    is transcendental and therefore not bit-stable cross-engine): near the
    uniform floor marks encrypted/binary junk, near 1e6 marks degenerate
    repeated-char documents — both ends are corpus-quality kill rules.

    Shape: per-doc char explosion over a FIXED prefix (bounded fan-out per
    row regardless of document size), (doc, char) partial+final count, then
    a per-doc rollup — no window, no join, nothing floats.
    """
    docs = load_table(spark, sf_dir, "documents")
    ch = docs.select(
        "doc_id",
        F.explode(
            F.split(F.substring(norm_text_col(), 1, _DIVERSITY_PREFIX), "")
        ).alias("ch"),
    ).filter(F.col("ch") != "")
    c = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).cast("long").alias("c"))
    d = c.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars_pfx"),
        F.count(F.lit(1)).cast("long").alias("distinct_chars"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("coll"),
    )
    return d.filter(F.col("n_chars_pfx") >= 2).select(
        "doc_id",
        "n_chars_pfx",
        "distinct_chars",
        F.expr(
            "CAST((1000000 * coll) div (n_chars_pfx * (n_chars_pfx - 1))"
            " AS BIGINT)"
        ).alias("simpson_ppm"),
    )


# -- term burstiness (Church–Gale variance-to-mean, integer-exact) --------------

#: how many top-frequency terms the burstiness profile reports
_BURST_TOPN = 50


@register(
    "text_term_burstiness",
    oracle=f"""
    WITH tf AS (
        SELECT t AS term, doc_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT doc_id, UNNEST({_TOKENS_SQL}) AS t FROM documents)
        WHERE t <> '' GROUP BY 1, 2
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    per_term AS (
        SELECT term,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(c) AS BIGINT) AS tf,
               CAST(SUM(c * c) AS BIGINT) AS sum_c2
        FROM tf GROUP BY 1
    )
    SELECT term, df, tf,
           CAST((1000 * (CAST(n_docs AS HUGEINT) * sum_c2
                         - CAST(tf AS HUGEINT) * tf))
                // (CAST(n_docs AS HUGEINT) * tf) AS BIGINT) AS vmr_milli
    FROM per_term, n
    ORDER BY tf DESC, term LIMIT {_BURST_TOPN}
    """,
)
def term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church–Gale burstiness of the {_BURST_TOPN} most frequent terms:
    the variance-to-mean ratio of per-document counts WITH zero-docs
    included — VMR = (N·Σc² − T²) / (N·T) in exact milli. A Poisson
    (content-free) term sits at 1000; function words hover near it while
    topical terms run far above (they arrive in bursts, many mentions in
    few documents) — the classic signal separating keywords from glue
    words without any stopword list. Zero-count documents enter through N
    alone, so only (term, doc) pairs that OCCUR are ever materialized;
    the numerator N·Σc² − T² is a population variance scaled by N²·T,
    hence provably nonnegative and safe for unsigned floor division.

    Shape: one token explosion → (term, doc) partial+final count → a
    vocab-sized per-term rollup; the top-{_BURST_TOPN} selection is
    orderBy().limit() which Spark plans as TakeOrderedAndProject (per-
    partition heaps, no global sort). The doc total is a 1-row broadcast;
    cross-products run in DECIMAL(38,0)/HUGEINT.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens_col()).alias("t"))
        .filter(F.col("t") != "")
        .groupBy(F.col("t").alias("term"), "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    per_term = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("tf"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
    )
    return (
        per_term.crossJoin(F.broadcast(n))
        .select(
            "term",
            "df",
            "tf",
            F.expr(
                "CAST((1000 * (CAST(n_docs AS DECIMAL(38,0)) * sum_c2"
                " - CAST(tf AS DECIMAL(38,0)) * tf))"
                " div (CAST(n_docs AS DECIMAL(38,0)) * tf) AS BIGINT)"
            ).alias("vmr_milli"),
        )
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(_BURST_TOPN)
    )


# -- source-pair total-variation drift ------------------------------------------


@register(
    "text_source_tvd",
    oracle=f"""
    WITH tf AS (
        SELECT source, t AS term, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT source, UNNEST({_TOKENS_SQL}) AS t FROM documents)
        WHERE t <> '' GROUP BY 1, 2
    ),
    tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM tf GROUP BY 1),
    shared AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS shared_terms,
               CAST(SUM(a.c) AS BIGINT) AS ca_shared,
               CAST(SUM(b.c) AS BIGINT) AS cb_shared,
               CAST(SUM(ABS(CAST(a.c AS HUGEINT) * tb.n
                            - CAST(b.c AS HUGEINT) * ta.n)) AS HUGEINT)
                   AS shared_abs
        FROM tf a
        JOIN tf b ON a.term = b.term AND a.source < b.source
        JOIN tot ta ON ta.source = a.source
        JOIN tot tb ON tb.source = b.source
        GROUP BY 1, 2
    )
    SELECT source_a, source_b, shared_terms,
           CAST((1000000 * (shared_abs
                            + CAST(ta.n - ca_shared AS HUGEINT) * tb.n
                            + CAST(tb.n - cb_shared AS HUGEINT) * ta.n))
                // (2 * CAST(ta.n AS HUGEINT) * tb.n) AS BIGINT) AS tvd_ppm
    FROM shared
    JOIN tot ta ON ta.source = source_a
    JOIN tot tb ON tb.source = source_b
    """,
)
def source_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between the unigram term distributions of
    every SOURCE pair, in exact ppm — the pairwise corpus-drift matrix
    (which scrape sources write like each other, which one went off the
    rails after a crawler change). TVD = ½ Σ_t |p_a(t) − p_b(t)| over the
    VOCABULARY UNION, kept integer by cross-multiplying with the corpus
    totals: ½ Σ |c_a·N_b − c_b·N_a| / (N_a·N_b). Terms present in only one
    source contribute without being enumerated: their lump sum is
    (N_a − Σ_shared c_a)·N_b (+ symmetric), so the pair join touches only
    SHARED terms and the union semantics still hold exactly. Pairs sharing
    zero terms are out of scope (every real source pair shares stopwords).

    Shape: one token explosion → (source, term) partial+final count; the
    pair relation is a term-keyed equi self-join whose per-term fan-out is
    bounded by #sources² (source count is a config-scale constant, never
    data-scale), then a |pairs|-sized agg. Products run in
    DECIMAL(38,0)/HUGEINT so corpus-scale token totals cannot overflow.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("source", F.explode(tokens_col()).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("source", F.col("t").alias("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # feeds both self-join sides and the totals — staging the
        # (source, term) relation (vocab-scaled, ≪ corpus) keeps the
        # token explosion single-pass (measured: 6 scans without it)
        .localCheckpoint(eager=False)
    )
    # four consumers (ta/tb inside the pair agg, xa/xb on the final
    # projection) each re-aggregated the staged tf; |sources| rows.
    tot = (
        tf.groupBy("source")
        .agg(F.sum("c").cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    a = tf.alias("a")
    b = tf.alias("b")
    ta = tot.alias("ta")
    tb = tot.alias("tb")
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    shared = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .join(F.broadcast(ta), F.col("ta.source") == F.col("a.source"))
        .join(F.broadcast(tb), F.col("tb.source") == F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared_terms"),
            F.sum("a.c").cast("long").alias("ca_shared"),
            F.sum("b.c").cast("long").alias("cb_shared"),
            F.sum(
                F.abs(dec("a.c") * dec("tb.n") - dec("b.c") * dec("ta.n"))
            ).alias("shared_abs"),
        )
    )
    return (
        shared.join(
            F.broadcast(tot.alias("xa")), F.col("xa.source") == F.col("source_a")
        )
        .join(F.broadcast(tot.alias("xb")), F.col("xb.source") == F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            "shared_terms",
            F.expr(
                "CAST((1000000 * (shared_abs"
                " + CAST(xa.n - ca_shared AS DECIMAL(38,0)) * xb.n"
                " + CAST(xb.n - cb_shared AS DECIMAL(38,0)) * xa.n))"
                " div (2 * CAST(xa.n AS DECIMAL(38,0)) * xb.n) AS BIGINT)"
            ).alias("tvd_ppm"),
        )
    )


# -- char-trigram language ID (deferred: r10 activation) -------------------------

_TRI_PROFILE = 40  #: trigrams per language profile (Cavnar–Trenkle keep the
# top few hundred; 40 separates the fixture's five languages cleanly)


#: minimum per-language gram count before a gram may enter a profile — a
#: rare gram's lift is noise
_TRI_MIN_COUNT = 5


@register(
    "text_char_trigram_langid",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id, lang,
               substr(t, g.i, 3) AS gram
        FROM (SELECT doc_id, lang, {_NORM_SQL} AS t FROM documents),
             UNNEST(generate_series(1, GREATEST(length(t) - 2, 0))) AS g(i)
    ),
    lg AS (SELECT lang, gram, CAST(COUNT(*) AS HUGEINT) AS c
           FROM grams GROUP BY 1, 2),
    tot AS (SELECT gram, CAST(SUM(c) AS HUGEINT) AS ct FROM lg GROUP BY 1),
    ltot AS (SELECT lang, CAST(SUM(c) AS HUGEINT) AS cl FROM lg GROUP BY 1),
    nn AS (SELECT CAST(SUM(c) AS HUGEINT) AS n FROM lg),
    prof AS (
        SELECT lang AS p_lang, gram
        FROM (
            SELECT lg.lang, lg.gram,
                   ROW_NUMBER() OVER (PARTITION BY lg.lang
                       ORDER BY (1000000 * lg.c * n) // (ct * cl) DESC,
                                lg.gram) AS rk
            FROM lg JOIN tot USING (gram) JOIN ltot USING (lang), nn
            WHERE lg.c >= {_TRI_MIN_COUNT}
        ) WHERE rk <= {_TRI_PROFILE}
    ),
    hits AS (
        SELECT g.doc_id, g.lang AS actual, p.p_lang,
               CAST(COUNT(*) AS BIGINT) AS score
        FROM grams g JOIN prof p ON p.gram = g.gram
        GROUP BY 1, 2, 3
    ),
    best AS (
        SELECT doc_id, actual, p_lang AS predicted
        FROM (
            SELECT doc_id, actual, p_lang,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, p_lang) AS rk
            FROM hits
        ) WHERE rk = 1
    ),
    labeled AS (
        SELECT * FROM best
        UNION ALL
        SELECT doc_id, lang AS actual, 'und' AS predicted
        FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM best)
    )
    SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM labeled GROUP BY 1, 2
    """,
)
def char_trigram_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language identification with DISCRIMINATIVE
    profiles: each language keeps its top-{_TRI_PROFILE} trigrams by
    LIFT — p(gram|lang)/p(gram), ranked as the exact integer
    ⌊1e6·c·N/(ct·cl)⌋ — rather than raw frequency (the five fixture
    languages share most running text, so frequency profiles collapse
    into one; lift isolates what is CHARACTERISTIC, which is the n-gram
    form of the TF-IDF insight). Documents score by occurrence-weighted
    profile hits, predict the argmax (language tie-break), and the
    confusion matrix vs the labeled truth is the gated result — a full
    train-score-evaluate loop in pure Catalyst beside text_lang_id's
    marker heuristic. Honesty note: the synthetic corpus separates only
    through its marker-word density, so fixture accuracy sits near 43 %
    (vs 20 % chance) — the operator under test is the loop, and the
    confusion matrix SHOWS the fixture's separability rather than
    hiding it. Docs matching no profile surface as 'und'.

    Shape: one gram explosion feeds the per-(lang, gram) counts, the
    gram totals, and the scoring join; profiles are |langs|×{_TRI_PROFILE}
    rows and broadcast; the only unpartitioned relations are gram-
    vocabulary-bounded; the argmax window runs per document over
    ≤ |langs| rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", "lang", norm_text_col().alias("t"))
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(t) - 2, 0)),"
                    " i -> substring(t, i, 3))"
                )
            ).alias("gram"),
        )
        # feeds the profile build AND the scoring join: one explosion
        .localCheckpoint(eager=False)
    )
    # r21 (guide §2.3 narrower types): the gram counts aggregate as LONGs —
    # decimal(38,0) sum/count buffers are markedly slower than long partial
    # aggregation (A/B on the lg groupBy alone: 0.683 s vs 0.436 s at
    # sf0.1), and long is exact here (counts are bounded by corpus tokens,
    # ≪ 2^63 even at 100 TB). The lift arithmetic below promotes to
    # DECIMAL(38,0) BEFORE multiplying, so the integer products/division
    # stay overflow-free and bit-identical to the oracle's HUGEINT chain.
    lg = (
        grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("c"))
        # r21 session 2 (guide §2.4 — share one aggregation): lg feeds FOUR
        # consumers (the profile filter, tot, ltot, nn) and the executed
        # plan re-ran the corpus-wide groupBy under each one with zero
        # runtime exchange reuse (30 exchanges; the groupBy alone reads
        # 0.43 s at sf0.1). Lazily checkpointing the (lang, gram) counts —
        # a vocabulary-bounded relation, ~|langs|×|grams| rows at ANY
        # corpus size — materializes it once inside the first action, the
        # same lineage-truncation grams itself already uses. Interleaved
        # A/B at sf0.1 (results asserted identical): steady-state 2.755 →
        # 1.841 s (0.67×), cold first-run 2.983 → 1.791 s.
        .localCheckpoint(eager=False)
    )
    tot = lg.groupBy("gram").agg(F.sum("c").alias("ct"))
    ltot = lg.groupBy("lang").agg(F.sum("c").alias("cl"))
    nn = lg.agg(F.sum("c").alias("n"))
    wp = W.partitionBy("lang").orderBy(F.desc("lift"), F.asc("gram"))
    prof = (
        lg.filter(F.col("c") >= _TRI_MIN_COUNT)
        .join(tot, "gram")
        .join(F.broadcast(ltot), "lang")
        .crossJoin(F.broadcast(nn))
        .withColumn(
            "lift",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * c * n)"
                " div (CAST(ct AS DECIMAL(38,0)) * cl) AS DECIMAL(38,0))"
            ),
        )
        .withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= _TRI_PROFILE)
        .select(F.col("lang").alias("p_lang"), "gram")
    )
    hits = (
        grams.join(F.broadcast(prof), "gram")
        .groupBy("doc_id", F.col("lang").alias("actual"), "p_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("score"))
    )
    wb = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("p_lang"))
    best = (
        hits.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") == 1)
        .select("doc_id", "actual", F.col("p_lang").alias("predicted"))
        # consumed by the final union AND the unmatched anti-join: without
        # this the whole profile-scoring subtree (gram join + score agg +
        # argmax window) executed twice per action (r22; one narrow row
        # per classified document).
        .localCheckpoint(eager=False)
    )
    unmatched = (
        docs.join(best.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.col("lang").alias("actual"),
            F.lit("und").alias("predicted"),
        )
    )
    return (
        best.unionByName(unmatched)
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


# -- Kneser–Ney continuation statistics (deferred: r10 activation) ---------------

_KN_TOPN = 30


@register(
    "text_kn_continuation",
    oracle=f"""
    WITH toks AS (
        SELECT {_TOKENS_SQL} AS tl FROM documents
    ), bi AS (
        SELECT tl[g.i] AS w1, tl[g.i + 1] AS w2
        FROM toks, UNNEST(generate_series(1, len(tl) - 1)) AS g(i)
    ), bc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bi GROUP BY 1, 2
    ),
    cc AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS bigram_types,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        FROM bc
    ),
    w AS (
        SELECT w2 AS word,
               CAST(COUNT(*) AS BIGINT) AS cont_count,
               CAST(SUM(c) AS BIGINT) AS freq
        FROM bc GROUP BY 1
    ),
    r AS (SELECT w1 AS word, CAST(COUNT(*) AS BIGINT) AS right_div
          FROM bc GROUP BY 1)
    SELECT w.word, cont_count, freq,
           CAST(COALESCE(right_div, 0) AS BIGINT) AS right_div,
           bigram_types, n1, n2,
           CAST((1000 * n1) // (n1 + 2 * n2) AS BIGINT) AS discount_milli
    FROM w LEFT JOIN r ON r.word = w.word, cc
    ORDER BY cont_count DESC, w.word LIMIT {_KN_TOPN}
    """,
)
def kn_continuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser–Ney smoothing statistics — the integer SUFFICIENT STATISTICS
    of the best count-based LM smoother, which is exactly the part a
    distributed engine should compute (the smoothed probabilities are
    driver-side arithmetic over these): per word, its CONTINUATION count
    (distinct left contexts — KN's insight that 'Francisco' is frequent
    but predictable) vs its raw frequency, its right-diversity, and the
    global count-of-counts n1/n2 with the absolute discount
    D = n1/(n1+2n2) in exact milli. Top {_KN_TOPN} words by continuation
    count; the cont/freq contrast ranks glue words above burst words —
    the opposite ranking from text_term_burstiness, by design.

    Shape: bigrams come from the same map-only zip as text_bigram_lm; the
    (w1, w2) type relation is vocabulary²-bounded (far below corpus) and
    every downstream relation is one partial+final agg over it; top-N is
    a heap, count-of-counts a 1-row broadcast.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens_col("text").alias("tl"))
    bi = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("tl"), 1, F.greatest(F.size("tl") - 1, F.lit(0))),
                F.expr("slice(tl, 2, greatest(size(tl) - 1, 0))"),
            )
        ).alias("z")
    ).select(F.col("z.0").alias("w1"), F.col("z.1").alias("w2"))
    bc = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # feeds count-of-counts, continuation counts, and right-diversity:
        # one bigram extraction, three vocabulary-bounded consumers
        .localCheckpoint(eager=False)
    )
    cc = bc.agg(
        F.count(F.lit(1)).cast("long").alias("bigram_types"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("n1"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("n2"),
    )
    w = bc.groupBy(F.col("w2").alias("word")).agg(
        F.count(F.lit(1)).cast("long").alias("cont_count"),
        F.sum("c").cast("long").alias("freq"),
    )
    r = bc.groupBy(F.col("w1").alias("word")).agg(
        F.count(F.lit(1)).cast("long").alias("right_div")
    )
    return (
        w.join(r, "word", "left")
        .fillna(0, ["right_div"])
        .crossJoin(F.broadcast(cc))
        .select(
            "word",
            "cont_count",
            "freq",
            F.col("right_div").cast("long").alias("right_div"),
            "bigram_types",
            "n1",
            "n2",
            F.expr("CAST((1000 * n1) div (n1 + 2 * n2) AS BIGINT)").alias(
                "discount_milli"
            ),
        )
        .orderBy(F.desc("cont_count"), F.asc("word"))
        .limit(_KN_TOPN)
    )


# -- RAKE word scores (deferred: r10 activation) --------------------------------

#: RAKE stopword delimiter set (the en marker set + connectives — the point
#: is the PHRASE-SEGMENTATION shape, not stopword completeness)
_RAKE_STOPS = ("the", "a", "and", "of", "is", "to", "in")
_RAKE_STOPS_SQL = "(" + ", ".join(f"'{s}'" for s in _RAKE_STOPS) + ")"
_RAKE_TOPN = 50


@register(
    "text_rake_word_scores",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, tok, pos FROM (
            SELECT doc_id,
                   UNNEST(l) AS tok,
                   UNNEST(range(1, len(l) + 1)) AS pos
            FROM (SELECT doc_id, {_TOKENS_SQL} AS l FROM documents)
        ) WHERE tok <> ''
    ),
    marked AS (
        SELECT doc_id, tok, pos,
               SUM(CASE WHEN tok IN {_RAKE_STOPS_SQL} THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id,
               tok IN {_RAKE_STOPS_SQL} AS is_stop
        FROM toks
    ),
    phrases AS (
        SELECT doc_id, phrase_id, tok,
               CAST(COUNT(*) OVER (PARTITION BY doc_id, phrase_id) AS BIGINT)
                   AS phrase_len
        FROM marked WHERE NOT is_stop
    )
    SELECT tok AS word,
           CAST(COUNT(*) AS BIGINT) AS freq,
           CAST(SUM(phrase_len) AS BIGINT) AS degree,
           CAST((1000 * SUM(phrase_len)) // COUNT(*) AS BIGINT) AS rake_milli
    FROM phrases GROUP BY 1
    ORDER BY freq DESC, word LIMIT {_RAKE_TOPN}
    """,
)
def rake_word_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword word scores (Rose et al.): segment each document into
    candidate phrases at stopword boundaries, then score every content
    word by degree/frequency — freq counts occurrences, degree sums the
    length of each containing phrase (self included), and deg/freq > 1
    marks words that live inside multi-word keyphrases rather than alone.
    rake_milli is the exact integer ratio; top {_RAKE_TOPN} by frequency
    with a word tie-break.

    Shape: one token explosion with positions; phrase ids are a cumulative
    stopword count PER DOCUMENT (windows partitioned by doc over its own
    token positions — bounded by document length, embarrassingly
    parallel), phrase lengths a per-(doc, phrase) count window, then one
    vocabulary-sized agg and a TakeOrderedAndProject. No joins at all.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(tokens_col()).alias("pos", "tok")
    ).filter(F.col("tok") != "")
    stops = list(_RAKE_STOPS)
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    marked = toks.select(
        "doc_id",
        "tok",
        F.sum(F.col("tok").isin(stops).cast("int"))
        .over(wdoc)
        .alias("phrase_id"),
        F.col("tok").isin(stops).alias("is_stop"),
    )
    wphrase = W.partitionBy("doc_id", "phrase_id")
    phrases = marked.filter(~F.col("is_stop")).select(
        "tok",
        F.count(F.lit(1)).over(wphrase).cast("long").alias("phrase_len"),
    )
    return (
        phrases.groupBy(F.col("tok").alias("word"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("phrase_len").cast("long").alias("degree"),
        )
        .select(
            "word",
            "freq",
            "degree",
            F.expr("CAST((1000 * degree) div freq AS BIGINT)").alias(
                "rake_milli"
            ),
        )
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(_RAKE_TOPN)
    )


# -- segment-level (paragraph-level) dedup with document reassembly -----------

_SEG_TOKENS = 8  # tokens per segment (stands in for a paragraph boundary)
#: static ceiling on segments/doc so the ORACLE can cross-join a fixed
#: series (DuckDB generate_series rejects lateral column bounds); pinned
#: with margin over the corpus max (text <= ~3000 chars -> < 512 tokens)
_SEG_MAX = 64


@register(
    "text_segment_dedup",
    oracle=f"""
    WITH segs AS (
        SELECT doc_id, t.j,
               array_to_string(
                   list_slice(string_split(text, ' '),
                              t.j * {_SEG_TOKENS} + 1,
                              t.j * {_SEG_TOKENS} + {_SEG_TOKENS}), ' ') AS seg
        FROM documents, generate_series(0, {_SEG_MAX - 1}) t(j)
        WHERE t.j * {_SEG_TOKENS} < len(string_split(text, ' '))
    ), kept AS (
        SELECT doc_id, j, seg,
               ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, j) AS occ
        FROM segs
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(COALESCE(string_agg(CASE WHEN occ = 1 THEN seg END, ' '
                                   ORDER BY j), '')) AS kept_md5
    FROM kept GROUP BY doc_id
    """,
)
def segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup with document REASSEMBLY (the
    RefinedWeb/C4 preprocessing step document-level dedup can't express):
    split every document into fixed {_SEG_TOKENS}-token segments (the
    deterministic stand-in for paragraph boundaries — the testdata corpus
    has no newlines), keep only each distinct segment's FIRST corpus-wide
    occurrence (ordered by doc_id, then position), and re-emit per document
    the surviving-segment count plus the md5 of the reassembled text — so
    the oracle checks the reconstruction order, not just the counts.

    Shape: explode to the segment relation (rows x ~len/{_SEG_TOKENS}),
    ONE shuffle on the segment hash for the keep-first window, one shuffle
    back on doc_id for ordered reassembly. No self-join: dedup is a window
    over the segment partitioning, so the worst key (a segment repeated
    millions of times) is a single partition's sort, which AQE skew-split
    handles. At 100 TB this is exactly suffix-array-free paragraph dedup as
    deployed: hash-partition segments, keep-first, reassemble."""
    docs = load_table(spark, sf_dir, "documents")
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size(F.split(F.col("text"), " ")) / _SEG_TOKENS)
                    .cast("int")
                    - 1,
                ),
                lambda j: F.array_join(
                    F.slice(
                        F.split(F.col("text"), " "),
                        j * _SEG_TOKENS + 1,
                        _SEG_TOKENS,
                    ),
                    " ",
                ),
            )
        ).alias("j", "seg"),
    )
    kept = segs.withColumn(
        "occ",
        F.row_number().over(W.partitionBy("seg").orderBy("doc_id", "j")),
    )
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum(F.when(F.col("occ") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.md5(
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("occ") == 1,
                                    F.struct(F.col("j"), F.col("seg")),
                                )
                            )
                        ),
                        lambda s: s.getField("seg"),
                    ),
                    " ",
                ),
                F.lit(""),
            )
        ).alias("kept_md5"),
    )


# -- windowed co-occurrence lift (PMI-ranked collocations) ---------------------

_PMI_WINDOW = 4  # co-occurrence horizon: each token pairs with <= 4 followers
_PMI_MIN_PAIR = 20  # support floor (drops singleton noise pairs)
_PMI_MIN_LIFT_PPM = 4_000_000  # keep pairs >= 4x independence


@register(
    "text_pmi_lift_pairs",
    oracle=f"""
    WITH toked AS (
        SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ), pos AS (
        SELECT doc_id, unnest(toks) AS term,
               generate_subscripts(toks, 1) AS pos
        FROM toked
    ), pr AS (
        SELECT LEAST(a.term, b.term) AS w1, GREATEST(a.term, b.term) AS w2
        FROM pos a JOIN pos b
          ON a.doc_id = b.doc_id
         AND b.pos BETWEEN a.pos + 1 AND a.pos + {_PMI_WINDOW}
    ), pc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_pair
        FROM pr GROUP BY 1, 2
    ), uni AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM pos GROUP BY 1
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM pos)
    SELECT w1, w2, c_pair,
           u1.c AS c_w1, u2.c AS c_w2,
           CAST((1000000 * c_pair * t) // (u1.c * u2.c) AS BIGINT)
               AS lift_ppm
    FROM pc
    JOIN uni u1 ON u1.term = pc.w1
    JOIN uni u2 ON u2.term = pc.w2, tot
    WHERE c_pair >= {_PMI_MIN_PAIR}
      AND (1000000 * c_pair * t) // (u1.c * u2.c) >= {_PMI_MIN_LIFT_PPM}
    """,
)
def pmi_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: word pairs co-occurring within a
    {_PMI_WINDOW}-token window far more often than independence predicts —
    the PMI-style association score phrase detectors (word2vec's phrase
    pass, Gensim Phrases) gate on. Ranking/thresholding uses the log-free
    lift c(x,y)·T / (c(x)·c(y)) in exact integer ppm: identical ordering
    to windowed PMI up to a pair-constant factor, with no libm ln to
    poison the cross-engine hash. Support ({_PMI_MIN_PAIR}+) and lift
    ({_PMI_MIN_LIFT_PPM} ppm) floors bound the output to real signal.

    Shape: pair generation is MAP-SIDE — each document's token array
    expands to at most {_PMI_WINDOW}·len(toks) (w1,w2) structs via a
    nested array transform, linear in document length (never the
    quadratic all-within-doc-pairs explode), then one partial-aggregable
    groupBy per relation. The unigram side is vocabulary-sized; its join
    onto pair counts is the classic small-dim pattern (AQE broadcasts it
    when it fits). Worst BIGINT term 1e6·c_pair·T stays under 2⁶³ through
    sf0.1 by >10³; a petabyte corpus lifts the same expression to
    DECIMAL(38,0) unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokens_col().alias("toks"))
    pairs = toked.select(
        F.explode(
            F.flatten(
                F.expr(
                    f"transform(sequence(1, greatest(size(toks) - 1, 1)), i ->"
                    f" transform(slice(toks, i + 1, {_PMI_WINDOW}), y ->"
                    f" struct(least(toks[i-1], y) AS w1,"
                    f" greatest(toks[i-1], y) AS w2)))"
                )
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    pc = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_pair")
    )
    pos = toked.select(F.explode("toks").alias("term"))
    uni = (
        pos.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # feeds the w1 probe, the w2 probe AND the total below: stage the
        # vocabulary-sized relation once instead of re-scanning the corpus
        # per reference
        .localCheckpoint(eager=False)
    )
    tot = uni.agg(F.sum("c").cast("long").alias("t"))
    return (
        pc.filter(F.col("c_pair") >= _PMI_MIN_PAIR)
        .join(
            F.broadcast(uni.select(F.col("term").alias("w1"), F.col("c").alias("c_w1"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("term").alias("w2"), F.col("c").alias("c_w2"))),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "lift_ppm",
            F.expr("(1000000 * c_pair * t) div (c_w1 * c_w2)").cast("long"),
        )
        .filter(F.col("lift_ppm") >= _PMI_MIN_LIFT_PPM)
        .select("w1", "w2", "c_pair", "c_w1", "c_w2", "lift_ppm")
    )


# -- bigram-LM surprisal gate (CCNet-style perplexity filter, log-free) --------

_SURP_TAU_PPM = 24_000  # a bigram is "surprising" if p(w2|w1) < 2.4%
_SURP_KEEP_MAX_PPM = 90_000  # keep docs with <= 9% surprising bigrams


@register(
    "text_lm_surprisal_gate",
    oracle=f"""
    WITH toked AS (
        SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ), bg AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM toked, UNNEST(range(1, len(toks))) AS r(i)
    ), c12 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM bg GROUP BY 1, 2
    ), c1 AS (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1
    ), scored AS (
        SELECT bg.doc_id,
               CASE WHEN (1000000 * c12.c12) // c1.c1 < {_SURP_TAU_PPM}
                    THEN 1 ELSE 0 END AS surprising
        FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(surprising) AS BIGINT) AS n_surprising,
           CAST((1000000 * SUM(surprising)) // COUNT(*) AS BIGINT)
               AS surprisal_ppm,
           (1000000 * SUM(surprising)) // COUNT(*) <= {_SURP_KEEP_MAX_PPM}
               AS keep
    FROM scored GROUP BY 1
    """,
)
def lm_surprisal_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality gate, log-free: score every
    document by the fraction of its bigrams that the corpus's own bigram
    LM finds surprising (conditional probability p(w2|w1) below
    {_SURP_TAU_PPM} ppm), and keep documents under {_SURP_KEEP_MAX_PPM}
    ppm surprising mass. This is the perplexity-filter step of the CCNet /
    RefinedWeb pipelines with the monotone substitution that makes it
    hash-pinnable: instead of mean log-prob (libm ln, engine-dependent),
    the gate counts probability-threshold exceedances — each comparison is
    one exact integer division, and a threshold-count gate separates the
    same junk tail (every surprising bigram is surprising under both
    formulations; only the aggregation differs).

    Shape: bigrams expand map-side (one struct per adjacent pair, linear);
    the model IS the (w1,w2) count relation derived from the same explode —
    one groupBy for c12, a second vocabulary-sized rollup for the c1
    marginal; scoring re-joins the model onto the bigram stream by its
    natural key, then one per-doc rollup. Train and apply are the same
    scan, as in production (the LM table would be a broadcast-able side
    artifact at 100 TB — vocabulary², not corpus, sized).
    """
    docs = load_table(spark, sf_dir, "documents")
    bg = (
        docs.select("doc_id", tokens_col().alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(toks) - 1, 1)), i ->"
                    " CASE WHEN i < size(toks)"
                    " THEN struct(toks[i-1] AS w1, toks[i] AS w2) END)"
                )
            ).alias("p"),
        )
        .filter(F.col("p").isNotNull())
        .select("doc_id", "p.w1", "p.w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    scored = (
        bg.join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .select(
            "doc_id",
            F.when(
                F.expr("(1000000 * c12) div c1") < _SURP_TAU_PPM, 1
            )
            .otherwise(0)
            .alias("surprising"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("surprising").cast("long").alias("n_surprising"),
        F.expr("(1000000 * SUM(surprising)) div COUNT(*)")
        .cast("long")
        .alias("surprisal_ppm"),
        (
            F.expr("(1000000 * SUM(surprising)) div COUNT(*)")
            <= _SURP_KEEP_MAX_PPM
        ).alias("keep"),
    )


# -- repeated-n-gram truncation (generation degeneration guard) — r11 queue -----

_TRUNC_N = 4  # n-gram order watched for repetition


@register(
    "text_repeated_ngram_truncation",
    oracle=f"""
    WITH toked AS (
        SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ), grams AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_toks,
               t.i AS pos,
               toks[t.i] || ' ' || toks[t.i + 1] || ' ' || toks[t.i + 2]
                   || ' ' || toks[t.i + 3] AS gram
        FROM toked, UNNEST(range(1, len(toks) - {_TRUNC_N - 2})) AS t(i)
    ), dup AS (
        SELECT doc_id, gram, pos,
               ROW_NUMBER() OVER (PARTITION BY doc_id, gram ORDER BY pos)
                   AS occ
        FROM grams
    )
    SELECT g.doc_id,
           CAST(MAX(g.n_toks) AS BIGINT) AS n_toks,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(MIN(CASE WHEN d.occ >= 2 THEN d.pos END) AS BIGINT)
               AS truncate_at,
           CAST((1000000 * COALESCE(
                     MIN(CASE WHEN d.occ >= 2 THEN d.pos END) - 1
                         + {_TRUNC_N - 1},
                     MAX(g.n_toks))) // MAX(g.n_toks) AS BIGINT)
               AS kept_ppm
    FROM grams g JOIN dup d ON d.doc_id = g.doc_id AND d.pos = g.pos
                           AND d.gram = g.gram
    GROUP BY 1
    """,
)
def repeated_ngram_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation-degeneration guard: find the first position where a
    {_TRUNC_N}-gram the document already produced REPEATS, and report
    where a repetition-aware consumer would truncate plus the fraction of
    tokens kept — the cut LLM serving stacks and synthetic-data filters
    apply to looping outputs (text_repetition_filter scores repetition
    density; this finds the exact first loop point). Documents whose
    grams never repeat keep 100%.

    Truncation keeps everything BEFORE the repeat plus the n−1 tokens the
    repeated gram shares with its prefix; all arithmetic exact integers.

    Shape: map-side n-gram expansion (linear in doc length), one window
    partitioned by (doc, gram) to mark second occurrences — per-key
    cardinality is occurrences-of-one-gram-in-one-doc, so no skew key
    exists — then one per-doc rollup. Two exchanges total, both on keys
    that shard with the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", tokens_col().alias("toks"))
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_toks"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(size(toks) - {_TRUNC_N - 1}, 1)),"
                    f" i -> CASE WHEN i <= size(toks) - {_TRUNC_N - 1}"
                    " THEN struct(i AS pos,"
                    " concat_ws(' ', toks[i-1], toks[i], toks[i+1], toks[i+2])"
                    " AS gram) END)"
                )
            ).alias("g"),
        )
        .filter(F.col("g").isNotNull())
        .select("doc_id", "n_toks", "g.pos", "g.gram")
    )
    occ = grams.withColumn(
        "occ",
        F.row_number().over(
            W.partitionBy("doc_id", "gram").orderBy("pos")
        ),
    )
    return occ.groupBy("doc_id").agg(
        F.max("n_toks").cast("long").alias("n_toks"),
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.min(F.when(F.col("occ") >= 2, F.col("pos")))
        .cast("long")
        .alias("truncate_at"),
        F.expr(
            f"CAST((1000000 * COALESCE("
            f" MIN(CASE WHEN occ >= 2 THEN pos END) - 1 + {_TRUNC_N - 1},"
            " MAX(n_toks))) div MAX(n_toks) AS BIGINT)"
        ).alias("kept_ppm"),
    )


# -- feature hashing (the hashing trick) (r12 queue) -----------------------------------

_FH_BUCKETS = 256  # 2^8 hashed feature dimensions


@register(
    "ml_feature_hashing_stats",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, UNNEST({_TOKENS_SQL}) AS t FROM documents
    ), hashed AS (
        SELECT doc_id, t,
               ('0x' || substr(md5(t), 1, 15))::BIGINT % {_FH_BUCKETS}
                   AS bucket,
               CASE WHEN ('0x' || substr(md5(t), 17, 1))::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM tok
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(DISTINCT t) AS BIGINT) AS n_terms,
           CAST(COUNT(*) AS BIGINT) AS total_tf,
           CAST(SUM(sgn) AS BIGINT) AS net_signed,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM hashed GROUP BY 1
    """,
)
def feature_hashing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009), audited: every token
    maps to one of {_FH_BUCKETS} feature buckets via md5 with a ±1 sign
    bit from a disjoint hash slice — the fixed-width featurizer
    (fastText/Vowpal-style) that needs NO vocabulary build, broadcast, or
    shuffle at 100 TB. Per bucket: distinct terms landing there (the
    collision audit — E[n_terms] = vocab/{_FH_BUCKETS}), raw tf, the
    signed net (collisions cancel in expectation under the sign bit —
    that is the trick's unbiasedness device), and document frequency.

    Determinism: bucket and sign derive from disjoint md5 substring
    slices through the module's established conv/0x cross-engine idiom;
    everything after is exact integer counting.

    Shape: one token explode, one md5 per token, one partial-aggregable
    groupBy to {_FH_BUCKETS} rows. The vocabulary never materializes —
    exactly why the trick scales where dictionary featurizers need a
    broadcast."""
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens_col()).alias("t")
    )
    hashed = tok.selectExpr(
        "doc_id",
        "t",
        f"CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)"
        f" % {_FH_BUCKETS} AS bucket",
        "CASE WHEN CAST(conv(substring(md5(t), 17, 1), 16, 10) AS BIGINT)"
        " % 2 = 0 THEN 1 ELSE -1 END AS sgn",
    )
    return hashed.groupBy("bucket").agg(
        F.countDistinct("t").cast("long").alias("n_terms"),
        F.count(F.lit(1)).cast("long").alias("total_tf"),
        F.sum("sgn").cast("long").alias("net_signed"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )


from ..docfmt import format_docstrings  # noqa: E402
format_docstrings(globals())  # substitute {CONST} docstring placeholders (ADVICE r8)
