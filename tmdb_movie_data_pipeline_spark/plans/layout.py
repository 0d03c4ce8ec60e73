"""Data-layout policies: sorted writes for data skipping, small-file
compaction (the write-path half of the 100 TB contract).

Parquet stores per-column min/max per row group; a scan with a filter on a
column the file is SORTED by prunes row groups without reading them. The
reference cannot express any of this (one pandas file per month); at scale
layout is the difference between scanning 100 TB and scanning 100 GB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_sorted", "compact"]


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partition by ``sort_cols`` then sort within partitions before
    writing: every output file covers a disjoint, internally-sorted key
    range, so Parquet min/max row-group statistics prune scans filtered on
    those columns (and merge-joins on them need no sort).
    """
    out = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    out.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Compact a many-small-files dataset into ~target-sized files.

    Streaming sinks and incremental writers accrete small files; scans then
    pay per-file open cost and lose row-group pruning. Returns the output
    file count. (On a real deployment this runs per partition directory and
    swaps atomically; local version keeps the simple shape.)
    """
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, (n + target_rows_per_file - 1) // target_rows_per_file)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
