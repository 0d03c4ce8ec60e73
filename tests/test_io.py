"""IO layer: parquet/CSV/JSON round-trips, partitioned writes (W1-W3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tmdb_movie_data_pipeline_spark import io as eio


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    p = str(tmp_path / "pq")
    eio.write_parquet(df, p)
    back = eio.read_parquet(spark, p)
    assert back.count() == 100
    assert back.agg(F.sum("v")).first()[0] == 9900


def test_partitioned_write_layout_and_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2024-01"), (2, "2024-01"), (3, "2024-02")], "id long, month string"
    )
    p = str(tmp_path / "parts")
    eio.write_partitioned(df, p, ["month"])
    import os

    assert sorted(os.listdir(p))[0].startswith("month=")  # dir-per-partition (W1)
    pruned = eio.read_parquet(spark, p).filter(F.col("month") == "2024-01")
    assert pruned.count() == 2
    # partition filter prunes directories, it never reaches row filtering
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_csv_roundtrip_single_file(spark, tmp_path):
    df = spark.createDataFrame([(1, "a,b"), (2, None)], "id long, s string")
    p = str(tmp_path / "csv")
    eio.write_csv(df, p, single_file=True)
    import glob

    assert len(glob.glob(p + "/part-*.csv")) == 1  # W3 single-file parity
    back = eio.read_csv(spark, p, schema="id long, s string")
    rows = {r.id: r.s for r in back.collect()}
    assert rows == {1: "a,b", 2: None}


def test_json_roundtrip_with_schema(spark, tmp_path):
    df = spark.createDataFrame([(1, {"k": 2})], "id long, m map<string,long>")
    p = str(tmp_path / "js")
    eio.write_json(df, p)
    back = eio.read_json(spark, p, schema="id long, m map<string,long>")
    assert back.first().m == {"k": 2}


def test_register_views(spark, sf_dir):
    eio.register_views(spark, sf_dir)
    assert spark.sql("SELECT count(*) FROM lineitem").first()[0] > 0
    assert spark.sql("SELECT count(*) FROM documents").first()[0] > 0


def test_orc_roundtrip(spark, tmp_path):
    df = spark.range(50).withColumnRenamed("id", "k")
    p = str(tmp_path / "orc")
    df.write.mode("overwrite").orc(p)
    assert spark.read.orc(p).count() == 50
