"""Data-layout policies: sorted writes enable row-group pruning; compaction
reduces file counts without changing data."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tmdb_movie_data_pipeline_spark.plans.layout import compact, write_sorted


def test_write_sorted_layout_and_content(spark, tmp_path):
    df = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    p = str(tmp_path / "sorted")
    write_sorted(df, p, ["k"], n_files=4)
    files = glob.glob(p + "/part-*.parquet")
    assert len(files) == 4
    back = spark.read.parquet(p)
    assert back.count() == 10000
    # each file covers a disjoint k-range (range partitioning): global
    # min/max of any single file must not overlap another's
    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(files):
        md = pq.ParquetFile(f).metadata
        col = md.row_group(0).column(0).statistics
        ranges.append((col.min, pq.ParquetFile(f).metadata.row_group(md.num_row_groups - 1).column(0).statistics.max))
    ranges.sort()
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2


def test_compact_reduces_files(spark, tmp_path):
    src = str(tmp_path / "small")
    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    df.repartition(32).write.parquet(src)  # 32 small files
    assert len(glob.glob(src + "/part-*.parquet")) == 32
    out = str(tmp_path / "compacted")
    n = compact(spark, src, out, target_rows_per_file=10000)
    assert n == 1
    assert len(glob.glob(out + "/part-*.parquet")) == 1
    assert spark.read.parquet(out).count() == 5000
