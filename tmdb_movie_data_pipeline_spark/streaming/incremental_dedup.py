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
