"""``transformWithStateInPandas`` — Spark 4's successor arbitrary-state API
(SURVEY.md §2.9 streaming; VERDICT r2 stretch item).

``stream_stateful_user_stats`` (queries.py) exercises the 3.x-era
``applyInPandasWithState``; this module ships the same per-key running
aggregate on the successor API: a ``StatefulProcessor`` with an explicit
``ValueState``, per-key timers available, RocksDB-backed state.

CAPABILITY-GATED, not version-gated: the API exists in this PySpark (4.1),
but its state-server protocol speaks protobuf and ``google.protobuf`` is not
installed in this image (verified: the driver worker crashes inside
``StateMessage_pb2``). No pip installs are allowed, so — exactly like
``operators/multimodal.decode_image`` — the operator raises a clear
NotImplementedError when the dependency is missing and registers its
driver query only when it is present, so on a fully-provisioned cluster it
becomes an oracle-checked row with zero code change. The processor logic
mirrors the green ``applyInPandasWithState`` twin line for line (pure int64
state transitions → engine-exact), and the batch-twin oracle is identical
in shape to that query's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import UNIT_SCALE, quantize
from ..registry import register

__all__ = ["tws_available", "transform_with_state_event_stats"]

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def tws_available() -> bool:
    """True iff the transformWithState Python protocol can run here."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False
    return True


def transform_with_state_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type running (count, quantized value sum, last-seen) kept in
    an explicit ValueState across micro-batches — emitted in update mode;
    the final update per key equals the batch aggregate."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf, which this "
            "image does not ship (and installs are not permitted); run on a "
            "cluster with protobuf provisioned"
        )
    import pandas as pd  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from .queries import _run_to_completion, read_events_stream

    class RunningStats(StatefulProcessor):
        def init(self, handle):
            self._st = handle.getValueState("agg", "n long, s long, last long")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            cur = self._st.get() if self._st.exists() else None
            n, s, last = cur if cur is not None else (0, 0, None)
            for pdf in rows:
                n += len(pdf)
                s += int(pdf["value_q"].sum())
                mx = int(pdf["ts_us"].max())
                last = mx if last is None else max(last, mx)
            self._st.update((n, s, last))
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "n_events": [n],
                    "sum_value": [s],
                    "last_seen_us": [last],
                }
            )

        def close(self):
            pass

    ev = read_events_stream(spark, sf_dir).select(
        "event_type",
        quantize(F.col("value"), UNIT_SCALE).alias("value_q"),
        F.unix_micros("ts").alias("ts_us"),
    )
    # transformWithState requires the RocksDB provider; scope the conf to
    # this query's run and restore afterwards (shared-session hygiene).
    try:
        prev = spark.conf.get(_PROVIDER_CONF)
    except Exception:
        prev = None
    spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    try:
        updates = ev.groupBy("event_type").transformWithStateInPandas(
            statefulProcessor=RunningStats(),
            outputStructType="event_type string, n_events long, sum_value long,"
            " last_seen_us long",
            outputMode="update",
            timeMode="none",
        )
        sink = _run_to_completion(updates, "update")
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prev)
    from pyspark.sql.window import Window as W

    w = W.partitionBy("event_type").orderBy(F.desc("n_events"))
    return (
        sink.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


if tws_available():  # pragma: no cover - absent dependency in this image
    register(
        "stream_transform_with_state",
        oracle=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value * {UNIT_SCALE}) AS BIGINT)) AS BIGINT)
                   AS sum_value,
               epoch_us(MAX(ts)) AS last_seen_us
        FROM events
        GROUP BY event_type
        """,
    )(transform_with_state_event_stats)
