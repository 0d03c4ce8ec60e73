"""Incremental corpus dedup at ingest time (streaming + MinHash state).

Batch dedup re-scans the whole corpus; at 100 TB you dedup *incrementally*:
each arriving micro-batch is checked against the accumulated corpus state
(exact hashes + MinHash band buckets) and only survivors are admitted. The
state lives in parquet tables keyed for equi-join — the same banding that
makes batch LSH scale makes the incremental probe cheap:

    new docs ──┬─ exact hash  ANTI JOIN  seen_hashes
               └─ band bucket ANTI JOIN  seen_bands     → admitted docs
    admitted docs' hashes/bands APPEND → state

Implemented as a ``foreachBatch`` sink so it runs identically on a file
stream today and a Kafka stream in production; the checkpointLocation WAL
makes each batch exactly-once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import BANDS, ROWS_PER_BAND, minhash_signatures

__all__ = ["IncrementalDeduper"]


class IncrementalDeduper:
    """State-backed dedup: admit only documents that are neither exact nor
    near duplicates of anything previously admitted."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        self.hashes_path = os.path.join(state_dir, "seen_hashes")
        self.bands_path = os.path.join(state_dir, "seen_bands")
        self.docs_path = os.path.join(state_dir, "admitted_docs")

    def _state(self, path: str, schema: str) -> DataFrame:
        try:
            return self.spark.read.parquet(path)
        except Exception:
            return self.spark.createDataFrame([], schema)

    def _bands(self, docs: DataFrame) -> DataFrame:
        sigs = minhash_signatures(docs)
        band_exprs = []
        for b in range(BANDS):
            parts = [f"sig_{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
            band_exprs.append(
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.expr(f"md5(concat_ws('|', {', '.join(parts)}))").alias("bucket"),
                )
            )
        return sigs.select("doc_id", F.explode(F.array(*band_exprs)).alias("b")).select(
            "doc_id", F.col("b.band_idx").alias("band_idx"), F.col("b.bucket").alias("bucket")
        )

    def process_batch(self, batch: DataFrame, epoch_id: int = 0) -> None:
        """foreachBatch body: admit non-duplicate docs, extend the state."""
        spark = self.spark
        batch = batch.select("doc_id", "text").persist()
        norm_hash = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
        hashed = batch.withColumn("h", norm_hash)

        seen_h = self._state(self.hashes_path, "h string")
        seen_b = self._state(self.bands_path, "band_idx int, bucket string")

        # exact dedup vs state AND within the batch (keep lowest doc_id)
        from ..operators.windows import keep_first

        in_batch = keep_first(hashed, ["h"], [F.asc("doc_id")])
        fresh = in_batch.join(seen_h, "h", "left_anti")

        # near-dup: any band bucket collision with the state drops the doc
        bands = self._bands(fresh.select("doc_id", "text"))
        dup_ids = (
            bands.join(seen_b, ["band_idx", "bucket"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        # Sever lineage BEFORE touching the state: appending to a path
        # invalidates every cached plan that reads it (CacheManager recaches
        # by path), so a lazily-evaluated `admitted` would re-read the state
        # it just extended and exclude itself. localCheckpoint materializes
        # the decision against the pre-batch state.
        admitted = fresh.join(dup_ids, "doc_id", "left_anti").localCheckpoint()

        # extend state (append-only; bands of admitted docs only)
        admitted.select("h").write.mode("append").parquet(self.hashes_path)
        self._bands(admitted.select("doc_id", "text")).select(
            "band_idx", "bucket"
        ).write.mode("append").parquet(self.bands_path)
        admitted.select("doc_id", "text").write.mode("append").parquet(self.docs_path)
        batch.unpersist()

    def admitted(self) -> DataFrame:
        return self._state(self.docs_path, "doc_id long, text string")

    def attach(self, stream: DataFrame, checkpoint: str):
        """Attach to a streaming DataFrame of (doc_id, text)."""
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .start()
        )


# --- driver-facing registered query ----------------------------------------
#
# The documents table is split into N_INGEST_BATCHES micro-batch files (by
# doc_id % N, mtimes staggered so the file source processes them in batch
# order), streamed through the deduper, and the admitted set returned. The
# oracle replays the identical state machine as chained CTEs: per batch,
# exact keep-first within the batch, hash anti-join vs previously ADMITTED
# docs, band-bucket anti-join vs previously admitted docs' bands. Batch-1
# semantics quirks are intentional and mirrored on both sides: near-dups
# WITHIN one batch are both admitted (the band probe only checks state), and
# dropped docs extend no state.

N_INGEST_BATCHES = 3


def _inc_dedup_oracle() -> str:
    from ..operators.dedup import (
        BANDS,
        NUM_HASHES,
        ROWS_PER_BAND,
        _NORM_SQL,
        _SHINGLES_SQL,
        _sig_sql,
        _TOKENS_SQL,
    )

    sig_cols = ", ".join(f"{_sig_sql(i)} AS sig_{i}" for i in range(NUM_HASHES))
    band_case = " ".join(
        f"WHEN {b} THEN md5("
        + " || '|' || ".join(f"sig_{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        + ")"
        for b in range(BANDS)
    )

    def adm_batch(b: int, prev: str) -> str:
        return f"""
    SELECT k.doc_id, k.h FROM kf k
    WHERE k.b = {b}
      AND NOT EXISTS (SELECT 1 FROM {prev} a WHERE a.h = k.h)
      AND NOT EXISTS (
          SELECT 1 FROM bands x JOIN bands y
            ON x.band_idx = y.band_idx AND x.bucket = y.bucket
          WHERE x.doc_id = k.doc_id
            AND y.doc_id IN (SELECT doc_id FROM {prev}))
    """

    return f"""
    WITH base AS (
        SELECT doc_id, text, doc_id % {N_INGEST_BATCHES} AS b,
               md5({_NORM_SQL}) AS h
        FROM documents
    ),
    kf AS (
        SELECT doc_id, text, b, h
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY b, h ORDER BY doc_id) AS rn
              FROM base)
        WHERE rn = 1
    ),
    sigs AS (
        SELECT doc_id, {sig_cols}
        FROM (SELECT doc_id, list_transform(shingles, s -> md5(s)) AS md5s
              FROM (SELECT doc_id, {_SHINGLES_SQL} AS shingles
                    FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM kf)))
    ),
    bands AS (
        SELECT doc_id, band_idx,
               CASE band_idx {band_case} END AS bucket
        FROM sigs, (SELECT UNNEST(range(0, {BANDS})) AS band_idx)
    ),
    adm0 AS (SELECT doc_id, h FROM kf WHERE b = 0),
    adm1 AS ({adm_batch(1, "adm0")}),
    adm01 AS (SELECT * FROM adm0 UNION ALL SELECT * FROM adm1),
    adm2 AS ({adm_batch(2, "adm01")})
    SELECT CAST(doc_id AS BIGINT) AS doc_id, h AS content_hash FROM adm01
    UNION ALL
    SELECT CAST(doc_id AS BIGINT), h FROM adm2
    """


def _register_query() -> None:
    from ..registry import register

    @register("stream_incremental_corpus_dedup", oracle=_inc_dedup_oracle())
    def stream_incremental_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Ingest-time incremental dedup driven end to end: the documents
        table arrives as {N} ordered micro-batches through a real file-source
        stream with a foreachBatch sink; returns every admitted (doc_id,
        content_hash). Cited semantics: checkpointed incremental ingest is
        the reference's backfill loop (src/movie.py:247-299) upgraded with
        content-level dedup state."""
        import glob
        import shutil
        import time

        from ..io import load_table, scratch_dir
        from ..operators.dedup import _NORM_SPARK

        root = scratch_dir("incdedup_")
        in_dir = os.path.join(root, "in")
        os.makedirs(in_dir, exist_ok=True)
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        t0 = time.time() - 600
        for b in range(N_INGEST_BATCHES):
            stage = os.path.join(root, f"stage_{b}")
            docs.filter(F.col("doc_id") % N_INGEST_BATCHES == b).coalesce(1).write.mode(
                "overwrite"
            ).parquet(stage)
            [src] = glob.glob(os.path.join(stage, "*.parquet"))
            dst = os.path.join(in_dir, f"batch_{b}.parquet")
            shutil.copyfile(src, dst)
            # the file source orders batches by mtime — stagger far apart so
            # batch b is always micro-batch b
            os.utime(dst, (t0 + b * 60, t0 + b * 60))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        ded = IncrementalDeduper(spark, os.path.join(root, "state"))
        q = ded.attach(stream, os.path.join(root, "ckpt"))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return ded.admitted().select(
            "doc_id", F.expr(f"md5({_NORM_SPARK})").alias("content_hash")
        )


_register_query()

from ..docfmt import format_docstrings  # noqa: E402
format_docstrings(globals())  # substitute {CONST} docstring placeholders (ADVICE r8)
