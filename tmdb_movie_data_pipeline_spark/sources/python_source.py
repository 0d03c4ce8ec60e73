"""Custom source via the Spark 4 Python DataSource API (SPIP SPARK-44076).

The reference's only source is a hand-rolled paged HTTP loop
(`/root/reference/src/movie.py:98-129` — requests.get per page, month
windows, page caps). `sources/rest.py` re-expresses those SEMANTICS; this
module exercises the ENGINE surface a production connector would actually
be built on: a ``pyspark.sql.datasource.DataSource`` subclass whose reader
declares one ``InputPartition`` per page, so Spark schedules page fetches
as distributed tasks (the reference fetches serially) and the whole scan
participates in the DataFrame planner like any built-in format.

The payload is a deterministic md5 chain derived from the row id, so the
DuckDB oracle regenerates the identical corpus from ``range()`` — the gate
proves rows produced inside Python reader tasks arrive byte-identical
through Spark's Arrow batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register

PAGES = 8
PAGE_SIZE = 125


def _make_datasource():
    """Build the DataSource class lazily so importing this module never
    fails on runtimes predating the Python DataSource API (the registered
    query is then the only thing that raises, with a clear message)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class PagedSyntheticReader(DataSourceReader):
        def __init__(self, options):
            self.n_pages = int(options.get("npages", PAGES))
            self.page_size = int(options.get("pagesize", PAGE_SIZE))

        def partitions(self):
            # one InputPartition per page: Spark runs one task per page,
            # exactly how a real paged-API connector parallelizes
            return [InputPartition(p) for p in range(self.n_pages)]

        def read(self, partition):
            import hashlib

            page = partition.value
            for i in range(self.page_size):
                rid = page * self.page_size + i
                yield (
                    rid,
                    page,
                    hashlib.md5(str(rid).encode()).hexdigest(),
                )

    class PagedSyntheticDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "paged_synthetic"

        def schema(self) -> str:
            return "id BIGINT, page INT, payload STRING"

        def reader(self, schema):
            return PagedSyntheticReader(self.options)

    return PagedSyntheticDataSource


@register(
    "source_python_datasource",
    oracle=f"""
    SELECT range AS id,
           CAST(range // {PAGE_SIZE} AS INT) AS page,
           md5(CAST(range AS VARCHAR)) AS payload
    FROM range({PAGES * PAGE_SIZE})
    """,
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the custom Python DataSource: {PAGES} pages × {PAGE_SIZE} rows
    served by per-page reader tasks. ``sf_dir`` is unused — the source IS
    the data (deterministic generator), which is what lets the oracle
    reconstruct it relationally."""
    spark.dataSource.register(_make_datasource())
    return (
        spark.read.format("paged_synthetic")
        .option("npages", PAGES)
        .option("pagesize", PAGE_SIZE)
        .load()
    )


# -- streaming Python DataSource: the readStream half of the API --------------

STREAM_PAGES = 4
STREAM_PAGE_SIZE = 50


def _make_stream_datasource():
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class PagedStreamReader(SimpleDataSourceStreamReader):
        """Bounded paged stream: each micro-batch serves one page; once the
        last page is served, read() returns an empty batch with an
        unchanged offset, so processAllAvailable() terminates — the
        bounded-backfill shape (a REST cursor, a changelog tail) expressed
        through Spark's streaming offset contract. readBetweenOffsets is
        the REPLAY path: after a crash, Spark re-asks for committed offset
        ranges, and determinism of that replay is exactly what the oracle
        hash-checks."""

        def __init__(self, options):
            self.n_pages = int(options.get("npages", STREAM_PAGES))
            self.page_size = int(options.get("pagesize", STREAM_PAGE_SIZE))

        def initialOffset(self):
            return {"page": 0}

        def _page_rows(self, page):
            # a concrete LIST, not a generator: the engine's prefetch cache
            # shallow-copies the returned iterator for replay, and
            # generators are not copyable (TypeError at planPartitions)
            import hashlib

            base = page * self.page_size
            return [
                (rid, page, hashlib.md5(str(rid).encode()).hexdigest())
                for rid in range(base, base + self.page_size)
            ]

        def read(self, start):
            page = start["page"]
            if page >= self.n_pages:
                return iter([]), start
            return iter(self._page_rows(page)), {"page": page + 1}

        def readBetweenOffsets(self, start, end):
            out = []
            for page in range(start["page"], end["page"]):
                out.extend(self._page_rows(page))
            return iter(out)

    class PagedStreamDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "paged_synthetic_stream"

        def schema(self) -> str:
            return "id BIGINT, page INT, payload STRING"

        def simpleStreamReader(self, schema):
            return PagedStreamReader(self.options)

    return PagedStreamDataSource


@register(
    "source_python_stream_scan",
    oracle=f"""
    SELECT range AS id,
           CAST(range // {STREAM_PAGE_SIZE} AS INT) AS page,
           md5(CAST(range AS VARCHAR)) AS payload
    FROM range({STREAM_PAGES * STREAM_PAGE_SIZE})
    """,
)
def python_stream_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream through a custom Python streaming source
    (SimpleDataSourceStreamReader, the streaming half of the Spark 4
    Python DataSource API the batch scan already exercises):
    {STREAM_PAGES} micro-batches of {STREAM_PAGE_SIZE} rows each, driven
    to completion into a memory sink. The reference's paged ingest loop
    (/root/reference/src/movie.py:98-129) is exactly this shape — a
    cursor over pages with resume — but here the OFFSET LOG is Spark's:
    the source declares its position, micro-batch planning and replay
    come from the engine, and the oracle regenerating the corpus
    relationally proves rows arrive byte-identical through the streaming
    Arrow path (including across the empty-batch termination).
    ``sf_dir`` is unused — the source is the data."""
    import tempfile
    import uuid as _uuid

    spark.dataSource.register(_make_stream_datasource())
    df = (
        spark.readStream.format("paged_synthetic_stream")
        .option("npages", STREAM_PAGES)
        .option("pagesize", STREAM_PAGE_SIZE)
        .load()
    )
    name = "snk_pystream_" + _uuid.uuid4().hex[:8]
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="pystream_ckpt_"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
python_stream_scan.__doc__ = python_stream_scan.__doc__.format(STREAM_PAGES=STREAM_PAGES, STREAM_PAGE_SIZE=STREAM_PAGE_SIZE)  # real docstring (ADVICE r7)

# -- Python DataSource WRITER half (deferred: r10 activation) --------------------


def _make_write_datasource():
    """Custom batch SINK via the same SPIP: per-task jsonl part files with
    tmp-write + rename publication, a typed WriterCommitMessage per task,
    and a driver-side commit() that records the manifest — the
    two-phase task/driver commit shape every real connector sink has."""
    import dataclasses

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    @dataclasses.dataclass
    class PartCommit(WriterCommitMessage):
        path: str
        n_rows: int

    class JsonlBatchWriter(DataSourceWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, iterator):
            import json
            import os
            import uuid

            os.makedirs(self.path, exist_ok=True)
            token = uuid.uuid4().hex
            tmp = os.path.join(self.path, f".tmp-{token}.jsonl")
            n = 0
            with open(tmp, "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                    n += 1
            final = os.path.join(self.path, f"part-{token}.jsonl")
            os.rename(tmp, final)  # publish atomically, like a committer
            return PartCommit(path=final, n_rows=n)

        def commit(self, messages):
            import json
            import os

            manifest = {
                "files": sorted(m.path for m in messages),
                "n_rows": sum(m.n_rows for m in messages),
            }
            with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
                json.dump(manifest, f)

        def abort(self, messages):
            import os

            for m in messages or []:
                try:
                    os.remove(m.path)
                except OSError:
                    pass

    class JsonlBatchSink(DataSource):
        @classmethod
        def name(cls) -> str:
            return "jsonl_batch_sink"

        def writer(self, schema, overwrite):
            return JsonlBatchWriter(self.options)

    return JsonlBatchSink


@register(
    "sink_python_datasource_write",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders GROUP BY 1
    """,
)
def python_datasource_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE half of the Python DataSource API — the engine surface a
    custom POST-batch / message-queue / vendor-API sink is built on,
    completing the module's reader + streaming-reader coverage: each
    Spark task streams its partition through ``DataSourceWriter.write``
    into an atomically-renamed jsonl part file and returns a typed
    commit message; the driver's ``commit()`` writes the manifest (the
    task/driver two-phase shape of every real committer, with ``abort``
    cleaning up failed attempts). The gate writes the orders slice
    through the sink, reads the published parts back, and must reproduce
    the source aggregate exactly — proving rows survive the Python
    writer path byte-identical (integers only; json text round-trips of
    doubles are exactly the hazard the integer discipline avoids).

    Shape: the sink write is map-only (one task per input partition, no
    shuffle); the readback is an ordinary distributed json scan with an
    explicit schema.
    """
    import os

    from pyspark.sql import functions as F

    from ..io import load_table, scratch_dir

    spark.dataSource.register(_make_write_datasource())
    out = scratch_dir("pysink_")
    sl = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    sl.write.format("jsonl_batch_sink").mode("append").option(
        "path", out
    ).save()
    back = spark.read.schema(
        "o_orderkey long, o_orderpriority string, cents long"
    ).json(os.path.join(out, "part-*.jsonl"))
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    )




# -- Python DataSource STREAMING WRITER half (r11 queue) --------------------------


def _make_stream_write_datasource():
    """Streaming jsonl sink through ``DataSourceStreamWriter``: tasks
    stream their micro-batch partition into atomically-renamed part
    files; the driver's per-batch ``commit(messages, batchId)`` publishes
    a batch manifest — the epoch-commit shape of every real streaming
    connector sink (Kafka transactional producer, Delta txn log)."""
    import dataclasses

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        WriterCommitMessage,
    )

    @dataclasses.dataclass
    class PartCommit(WriterCommitMessage):
        path: str
        n_rows: int

    class JsonlStreamWriter(DataSourceStreamWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, iterator):
            import json
            import os
            import uuid

            os.makedirs(self.path, exist_ok=True)
            token = uuid.uuid4().hex
            tmp = os.path.join(self.path, f".tmp-{token}.jsonl")
            n = 0
            with open(tmp, "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                    n += 1
            final = os.path.join(self.path, f"part-{token}.jsonl")
            os.rename(tmp, final)
            return PartCommit(path=final, n_rows=n)

        def commit(self, messages, batchId):
            import json
            import os

            manifest = {
                "batch": batchId,
                "files": sorted(m.path for m in messages if m),
                "n_rows": sum(m.n_rows for m in messages if m),
            }
            with open(
                os.path.join(self.path, f"_batch-{batchId:08d}.json"), "w"
            ) as f:
                json.dump(manifest, f)

        def abort(self, messages, batchId):
            import os

            for m in messages or []:
                if m:
                    try:
                        os.remove(m.path)
                    except OSError:
                        pass

    class JsonlStreamSink(DataSource):
        @classmethod
        def name(cls) -> str:
            return "jsonl_stream_sink"

        def streamWriter(self, schema, overwrite):
            return JsonlStreamWriter(self.options)

    return JsonlStreamSink


@register(
    "sink_python_datasource_streamwrite",
    oracle=f"""
    SELECT CAST(range // {STREAM_PAGE_SIZE} AS INT) AS page,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(range) AS BIGINT) AS sum_id,
           CAST(COUNT(DISTINCT md5(CAST(range AS VARCHAR))) AS BIGINT)
               AS n_payloads
    FROM range({STREAM_PAGES * STREAM_PAGE_SIZE})
    GROUP BY 1
    """,
)
def python_datasource_streamwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Python DataSource LOOP: the module's paged streaming
    SOURCE feeds the streaming SINK half of the API
    (``DataSourceStreamWriter`` — the last uncovered quadrant after batch
    read, stream read, batch write). Every micro-batch's tasks publish
    atomically-renamed jsonl parts and return typed commit messages; the
    driver's ``commit(messages, batchId)`` seals each epoch with a batch
    manifest, and the readback scans ONLY manifest-listed files — so a
    part written by an aborted attempt can never leak into the result
    (the exactly-once publication contract). The aggregate must equal
    the closed-form corpus: rows survived source → Arrow → sink →
    manifest → scan byte-identical. ``sf_dir`` is unused — the source is
    the data.

    Shape: writes are map-only per micro-batch; manifests are tiny
    driver-side json; the readback is a distributed json scan with an
    explicit schema."""
    import json
    import os
    import tempfile

    from pyspark.sql import functions as F

    spark.dataSource.register(_make_stream_datasource())
    spark.dataSource.register(_make_stream_write_datasource())
    out = tempfile.mkdtemp(prefix="pystream_sink_")
    df = (
        spark.readStream.format("paged_synthetic_stream")
        .option("npages", STREAM_PAGES)
        .option("pagesize", STREAM_PAGE_SIZE)
        .load()
    )
    q = (
        df.writeStream.format("jsonl_stream_sink")
        .option("path", out)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="pystream_sink_ckpt_")
        )
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    files = []
    for name in sorted(os.listdir(out)):
        if name.startswith("_batch-"):
            with open(os.path.join(out, name)) as f:
                files.extend(json.load(f)["files"])
    back = spark.read.schema("id BIGINT, page INT, payload STRING").json(files)
    return back.groupBy("page").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("id").cast("long").alias("sum_id"),
        F.countDistinct("payload").cast("long").alias("n_payloads"),
    )


from ..docfmt import format_docstrings  # noqa: E402
format_docstrings(globals())  # substitute {CONST} docstring placeholders (ADVICE r8)
