"""Exactly-once streaming appends into a TxTable (idempotent sink).

``foreachBatch`` is at-least-once: after a crash between "wrote the data"
and "advanced the checkpoint", the same epoch is redelivered and a naive
sink appends it twice. Log-based formats solve this by recording the
(application, epoch) watermark IN the transaction log — Delta's
txnAppId/txnVersion — so a redelivered epoch is recognized and skipped:
the data write and the dedup marker commit atomically, because they are
the same manifest.

``TxTableSink.process_batch``:

1. scan the table history for ``txn_epoch == epoch`` — if present, this
   delivery is a replay: return without writing (idempotent);
2. otherwise commit ``version+1`` with the batch's staged files PLUS a
   carry of every file of the previous version (append = new files + old
   files, no rewrite), stamping ``txn_epoch`` into the manifest.

Crash safety holds because the epoch marker rides the SAME atomic
put-if-absent commit as the data: there is no state of the world where
the rows are visible but the marker is missing or vice versa.

At scale the history probe is a lookup of the last few manifests (epochs
are monotone, so only the tail can match), and the carry list is the
manifest's file array — no data movement besides the batch itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.acid import TxTable

__all__ = ["TxTableSink"]


class TxTableSink:
    """Idempotent micro-batch appender for a TxTable."""

    def __init__(self, spark: SparkSession, table: TxTable):
        self.spark = spark
        self.table = table

    def max_committed_epoch(self) -> int | None:
        """Largest epoch in the log, probed from the TAIL: epochs are
        monotone, so the newest manifest carrying a marker holds the max —
        O(non-stream commits since the last append), not O(history)."""
        for v in reversed(self.table.versions()):
            m = self.table.manifest(v)
            if "txn_epoch" in m:
                return int(m["txn_epoch"])
        return None

    def committed_epochs(self) -> set[int]:
        """Full-history scan — diagnostics only; the hot path uses the
        monotone tail probe."""
        return {
            m["txn_epoch"]
            for m in self.table.history()
            if "txn_epoch" in m
        }

    def process_batch(self, batch: DataFrame, epoch_id: int = 0) -> None:
        epoch = int(epoch_id)
        latest = self.max_committed_epoch()
        if latest is not None and epoch <= latest:
            return  # replayed delivery: the log already carries this epoch
        # REFUSE to commit past an in-flight group prepare: appending above
        # the pending slot would shadow this member's version — a later
        # group commit would then apply to the other members but not here,
        # breaking cross-table atomicity one table at a time. Failing the
        # batch is safe: foreachBatch retries it, and the epoch marker
        # makes the retry exact-once once the transaction resolves. Only
        # truly-PENDING slots block: an aborted group's tombstoned slot is
        # dead and must not wedge the stream forever (ADVICE r6).
        pending = self.table.pending_slots()
        if pending:
            raise RuntimeError(
                f"in-flight group transaction on {self.table.path} holds "
                f"slot(s) {pending}: streaming append deferred until it "
                "commits or aborts"
            )
        prev = self.table.manifest(self.table.latest_visible_version())
        stats = prev.get("stats", {})
        carry = [(rel, stats.get(rel)) for rel in prev["files"]]
        self.table._commit(  # noqa: SLF001 — sink is package-internal
            batch,
            self.table.latest_version() + 1,
            "STREAM_APPEND",
            # preserve the table's stats contract: dropping stats_key for
            # one append would disable file-pruned MERGE/DELETE forever
            stats_key=prev.get("stats_key"),
            carry=carry,
            extra={"txn_epoch": epoch},
        )

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .start()
        )


def _register_query() -> None:
    from pyspark.sql import functions as F

    from ..registry import register

    @register(
        "stream_txtable_append",
        # batch twin over the raw events: per-10-day-block purchase stats —
        # the streamed, transactionally-appended table must reproduce them
        oracle="""
        SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 10
                    AS BIGINT) AS block,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1
        """
    )
    def stream_txtable_append(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Purchase events streamed through a file source and appended to
        a TxTable exactly once per micro-batch (10-day blocks, the same
        staging as stream_scd2_apply): each batch is one transactional
        commit stamped with its epoch, so the final table equals the
        batch aggregate — and tests replay an epoch to prove the log
        marker makes redelivery a no-op (the Delta txnAppId/txnVersion
        contract, reproduced on the filesystem log)."""
        import glob
        import os
        import shutil
        import time

        from ..io import load_table, scratch_dir

        root = scratch_dir("txsink_")
        in_dir = os.path.join(root, "in")
        os.makedirs(in_dir, exist_ok=True)
        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_type") == "purchase")
            .select(
                "user_id",
                "ts",
                F.expr(
                    "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') div 10"
                    " AS BIGINT)"
                ).alias("block"),
                F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
            )
        )
        blocks = [
            r.b for r in ev.select(F.col("block").alias("b")).distinct().orderBy("b").collect()
        ]  # fixture staging only
        t0 = time.time() - 600
        for i, blk in enumerate(blocks):
            stage = os.path.join(root, f"stage_{i}")
            ev.filter(F.col("block") == blk).coalesce(1).write.mode(
                "overwrite"
            ).parquet(stage)
            [src] = glob.glob(os.path.join(stage, "*.parquet"))
            dst = os.path.join(in_dir, f"batch_{i}.parquet")
            shutil.copyfile(src, dst)
            os.utime(dst, (t0 + i * 60, t0 + i * 60))
        schema = "user_id long, ts timestamp, block long, cents long"
        empty = spark.createDataFrame([], schema)
        table = TxTable.create(spark, os.path.join(root, "table"), empty)
        sink = TxTableSink(spark, table)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        q = sink.attach(stream, os.path.join(root, "ckpt"))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return (
            table.read()
            .groupBy("block")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("cents").cast("long").alias("total_cents"),
            )
        )


_register_query()
