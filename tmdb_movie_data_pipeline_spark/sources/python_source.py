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
