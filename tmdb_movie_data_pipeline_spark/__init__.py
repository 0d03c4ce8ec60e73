"""tmdb_movie_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query / data-processing capabilities of the
reference pipeline (grknc/tmdb-movie-data-pipeline, a single-threaded
pandas batch-ETL job), re-expressed Spark-first: declarative DataFrame /
SQL plans optimized by Catalyst, columnar Parquet IO, partition-aware
writes, Structured Streaming for incremental data, plus the
LLM-training-data operators (dedup, similarity search, text analysis,
multimodal columns) the reference lacks — all designed for a
1000-executor / 100 TB deployment while remaining testable on local[N].

Layout:
    session    — SparkSession builder tuned for both local tests and clusters
    schemas    — explicit StructTypes (never schema inference in the engine)
    io         — Parquet/CSV/JSON readers & writers, testdata table loader
    operators/ — relational + LLM-pipeline operators (pure DataFrame→DataFrame)
    sources/   — custom PySpark DataSources (paged REST ingest w/ fixture mode)
    functions/ — scalar/aggregate expression helpers
    plans/     — write policies: checkpointed incremental backfill
    streaming/ — Structured Streaming queries over event streams
"""

__version__ = "0.1.0"
