"""Incremental SCD2 maintenance via ``foreachBatch`` (streaming CDC apply).

The batch operator (merge.scd2_history) rebuilds the whole dimension from
scratch; a warehouse ingesting change events cannot — it must APPLY each
arriving batch to the standing history: close the currently-open row of
every user that changed (its ``valid_to`` becomes the batch's first
timestamp for that user), then append the batch's own validity intervals.
This module is that apply loop, run over a real file-source stream whose
micro-batches are the change stream in 10-day-block order (CDC feeds are
time-ordered per key; the time-block partition is the arrival unit —
the fixture data spans a single month, so calendar months would collapse
to one batch and exercise nothing).

Invariant the oracle pins: after the final batch, the maintained state is
ROW-IDENTICAL to the from-scratch batch SCD2 over the same events — the
incremental path may never drift from the rebuild.

Scale: each apply touches only (open rows of changed users) + (the batch);
both sides join on user_id. State is rewritten copy-on-write per batch
here (version dirs, like the TxTable); a production table would MERGE on
user_id into a bucketed state table instead — same join, no rewrite of
untouched partitions. Nothing ever re-reads closed history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import scd2_intervals

__all__ = ["Scd2Apply"]


class Scd2Apply:
    """Copy-on-write SCD2 state maintained across micro-batches."""

    _SCHEMA = (
        "user_id long, value double, valid_from timestamp, "
        "valid_to timestamp, is_current boolean"
    )

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir

    def _versions(self) -> list[int]:
        """Committed state versions, recovered from disk — NOT an in-memory
        counter: on query restart the checkpointed file source skips
        already-processed batches, and the state must still be there."""
        if not os.path.isdir(self.state_dir):
            return []
        return sorted(
            int(d[1:])
            for d in os.listdir(self.state_dir)
            if d.startswith("v") and d[1:].isdigit()
        )

    def state(self, before: int | None = None) -> DataFrame:
        vs = self._versions()
        if before is not None:
            vs = [v for v in vs if v < before]
        if not vs:
            return self.spark.createDataFrame([], self._SCHEMA)
        return self.spark.read.parquet(
            os.path.join(self.state_dir, f"v{vs[-1]}")
        )

    def process_batch(self, batch: DataFrame, epoch_id: int = 0) -> None:
        # Idempotent under foreachBatch's at-least-once contract: the
        # output dir is keyed by epoch_id, and the base state is the
        # latest version STRICTLY BELOW this epoch — a redelivered batch
        # recomputes from the same base and overwrites the same dir,
        # instead of applying itself twice on top of its own output.
        epoch = int(epoch_id)
        inc = scd2_intervals(batch, "user_id", "ts", ["value"]).select(
            "user_id", "value", "valid_from", "valid_to", "is_current"
        )
        first_inc = inc.groupBy("user_id").agg(
            F.min("valid_from").alias("_t_first")
        )
        state = self.state(before=epoch)
        closed_or_kept = (
            state.filter(F.col("is_current"))
            .join(first_inc, "user_id", "left")
            .select(
                "user_id",
                "value",
                "valid_from",
                # a changed user's open row closes at the batch's first ts
                F.coalesce("_t_first", "valid_to").alias("valid_to"),
                F.col("_t_first").isNull().alias("is_current"),
            )
        )
        new_state = (
            state.filter(~F.col("is_current"))
            .unionByName(closed_or_kept)
            .unionByName(inc)
        )
        new_state.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"v{epoch}")
        )

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .start()
        )


def _register_query() -> None:
    from ..registry import register

    @register(
        "stream_scd2_apply",
        # the from-scratch batch SCD2 — the incremental apply must equal it
        oracle="""
        WITH hist AS (
            SELECT user_id, ROUND(value, 4) AS value,
                   epoch_us(ts) AS valid_from_us,
                   epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, value))
                       AS valid_to_us
            FROM events
            WHERE event_type = 'purchase'
        )
        SELECT user_id, value, valid_from_us, valid_to_us,
               CAST(valid_to_us IS NULL AS BOOLEAN) AS is_current
        FROM hist
        """,
    )
    def stream_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
        """SCD2 incrementally maintained over a real stream: the purchase
        change events arrive as 10-day-block micro-batches (3+ real
        apply steps on the fixture's single-month span) through a file
        source; each batch closes open rows and appends its own
        intervals. The returned history must be row-identical to the
        batch rebuild (the oracle) — the no-drift contract of every
        incremental dimension pipeline."""
        import glob
        import shutil
        import time

        from ..io import load_table, scratch_dir

        root = scratch_dir("scd2apply_")
        in_dir = os.path.join(root, "in")
        os.makedirs(in_dir, exist_ok=True)
        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_type") == "purchase")
            .select("user_id", "ts", "value")
        )
        block = F.expr("datediff(CAST(ts AS DATE), DATE '1970-01-01') div 10")
        blocks = [
            r.b
            for r in ev.select(block.alias("b")).distinct().orderBy("b").collect()
        ]  # fixture staging only: |blocks| rows, never data-scale
        t0 = time.time() - 600
        for b, blk in enumerate(blocks):
            stage = os.path.join(root, f"stage_{b}")
            ev.filter(block == blk).coalesce(1).write.mode(
                "overwrite"
            ).parquet(stage)
            [src] = glob.glob(os.path.join(stage, "*.parquet"))
            dst = os.path.join(in_dir, f"batch_{b}.parquet")
            shutil.copyfile(src, dst)
            os.utime(dst, (t0 + b * 60, t0 + b * 60))
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        store = Scd2Apply(spark, os.path.join(root, "state"))
        q = store.attach(stream, os.path.join(root, "ckpt"))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return store.state().select(
            "user_id",
            F.round("value", 4).alias("value"),
            F.unix_micros("valid_from").alias("valid_from_us"),
            F.unix_micros("valid_to").alias("valid_to_us"),
            "is_current",
        )


_register_query()
