"""Ingest-time content-addressed chunk store (streaming + CDC).

The batch CDC queries (multimodal_cdc_chunk_dedup, _snapshot_diff) answer
"how much would a chunk store save"; this module IS the store's ingest
path: each arriving micro-batch is chunked with the fixed-window Buzhash
rule, probed against the accumulated manifest, and only never-seen chunk
hashes are appended — the same anti-join-against-state shape as
IncrementalDeduper, one level below documents.

    new docs ── chunk (mapInPandas, vectorized) ── distinct chunk_md5
              ── ANTI JOIN manifest ── APPEND (chunk_md5, len, first_batch)

Implemented as a ``foreachBatch`` sink so it runs identically on a file
stream today and a Kafka stream in production; the checkpointLocation WAL
makes each batch exactly-once. At 100 TB the manifest is a bucketed table
keyed by chunk_md5 (uniform by construction), and the probe is an
equi-join on that key — never a scan of payload bytes already stored.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import _cdc_chunks_sql, _cdc_stats_batches

__all__ = ["ChunkStoreIngest"]

N_INGEST_BATCHES = 3


class ChunkStoreIngest:
    """Manifest-backed chunk store: admit only chunk hashes the store has
    never seen, stamping each with the micro-batch that first shipped it."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.manifest_path = os.path.join(state_dir, "manifest")

    def manifest(self) -> DataFrame:
        if not os.path.isdir(self.manifest_path):  # first batch: empty store
            return self.spark.createDataFrame(
                [], "chunk_md5 string, chunk_len long, first_batch long"
            )
        return self.spark.read.parquet(self.manifest_path)

    def process_batch(self, batch: DataFrame, epoch_id: int = 0) -> None:
        chunks = batch.select(
            F.encode("text", "utf-8").alias("payload")
        ).mapInPandas(_cdc_stats_batches, "chunk_md5 string, chunk_len long")
        fresh = (
            chunks.groupBy("chunk_md5")
            # chunk_len is determined by the hash (same content); min() is
            # just a deterministic pick of the duplicate rows
            .agg(F.min("chunk_len").alias("chunk_len"))
            .join(self.manifest().select("chunk_md5"), "chunk_md5", "left_anti")
            .withColumn("first_batch", F.lit(int(epoch_id)).cast("long"))
        )
        fresh.write.mode("append").parquet(self.manifest_path)

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .start()
        )


def _register_query() -> None:
    from ..registry import register

    @register(
        "stream_cdc_chunk_store",
        # batch twin: a chunk's first_batch is the smallest batch containing
        # it — batches are processed in doc_id % N order, so MIN over the
        # batch index reproduces "first micro-batch that appended the hash".
        oracle=f"""
        WITH c AS (
            SELECT doc_id, chunk_md5, chunk_len
            FROM {_cdc_chunks_sql("SELECT doc_id, text FROM documents")} cc
        ),
        fs AS (
            SELECT chunk_md5,
                   MIN(doc_id % {N_INGEST_BATCHES}) AS batch,
                   MIN(chunk_len) AS chunk_len
            FROM c GROUP BY 1
        )
        SELECT CAST(batch AS BIGINT) AS batch,
               CAST(COUNT(*) AS BIGINT) AS chunks_added,
               CAST(SUM(chunk_len) AS BIGINT) AS bytes_added
        FROM fs GROUP BY 1
        """,
    )
    def stream_cdc_chunk_store(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Chunk-store ingest driven end to end: the documents table
        arrives as {N} ordered micro-batches through a real file-source
        stream; each batch appends only never-seen chunk hashes to the
        manifest. Returns per-batch admission stats — later batches add
        visibly fewer bytes than they carry, because cross-document
        redundancy is already stored (the CDC payoff, measured at ingest
        time rather than after the fact).

        The oracle reconstructs the final manifest without replaying the
        stream: first_batch == min batch index containing the hash."""
        import glob
        import shutil
        import time

        from ..io import load_table, scratch_dir

        root = scratch_dir("chunkstore_")
        in_dir = os.path.join(root, "in")
        os.makedirs(in_dir, exist_ok=True)
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        t0 = time.time() - 600
        for b in range(N_INGEST_BATCHES):
            stage = os.path.join(root, f"stage_{b}")
            docs.filter(
                F.col("doc_id") % N_INGEST_BATCHES == b
            ).coalesce(1).write.mode("overwrite").parquet(stage)
            [src] = glob.glob(os.path.join(stage, "*.parquet"))
            dst = os.path.join(in_dir, f"batch_{b}.parquet")
            shutil.copyfile(src, dst)
            # the file source orders batches by mtime — stagger far apart
            # so batch b is always micro-batch b
            os.utime(dst, (t0 + b * 60, t0 + b * 60))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        store = ChunkStoreIngest(spark, os.path.join(root, "state"))
        q = store.attach(stream, os.path.join(root, "ckpt"))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return store.manifest().groupBy(
            F.col("first_batch").alias("batch")
        ).agg(
            F.count(F.lit(1)).alias("chunks_added"),
            F.sum("chunk_len").alias("bytes_added"),
        )


_register_query()

from ..docfmt import format_docstrings  # noqa: E402
format_docstrings(globals())  # substitute {CONST} docstring placeholders (ADVICE r8)
