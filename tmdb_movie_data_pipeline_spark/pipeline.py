"""End-to-end movie pipeline: the reference's batch backfill, Spark-native.

Reference lifecycle (src/movie.py:247-299, traced in SURVEY.md §3.1):

    month_ranges → skip done (checkpoint) → per month: discover_all →
    normalize → drop_duplicates → write part → checkpoint →
    final merge: concat parts → dedup → master CSV + Parquet

Engine composition of the same stages:

    sources.rest (partitions = month windows, pushdown, retry)
      → operators.normalize (one Catalyst projection)
      → operators.windows.keep_first (deterministic dedup survivor, A1)
      → partitioned write, dynamic partition overwrite (idempotent months)
      → plans.checkpoint bookkeeping (anti-join skip, J2/R4)
      → master merge = one partitioned-dataset scan + global keep-first (A2)
      → master Parquet + CSV (W2/W3)

Differences by design (each is a documented fix of a reference defect):
* dedup survivor pinned by explicit ordering, not file order (SURVEY §7.3);
* months run in parallel (reference: strictly sequential, movie.py:260);
* the per-window row cap warns loudly instead of silently truncating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.normalize import normalize_movies
from .operators.windows import keep_first
from .plans.checkpoint import load_done_keys, pending_units, save_done_keys

__all__ = ["run_backfill"]


def run_backfill(
    spark: SparkSession,
    *,
    date_from: str,
    date_to: str,
    out_dir: str,
    checkpoint_path: str,
    genre_map: dict[int, str],
    image_base: str,
    poster_size: str,
    source_options: dict[str, str],
) -> dict[str, int]:
    """Run the monthly backfill; returns {"months_run": n, "rows": m}.

    ``source_options`` configures the paged_rest source (fixture_dir for
    offline runs, base_url/bearer_token for live ones).
    """
    from .sources.rest import PagedRestDataSource, month_windows

    spark.dataSource.register(PagedRestDataSource)

    windows = month_windows(date_from, date_to)
    units = spark.createDataFrame(
        [(f"{a}_{b}",) for a, b in windows], "unit_key string"
    )
    done = load_done_keys(spark, checkpoint_path)
    todo_keys = sorted(r.unit_key for r in pending_units(units, done).collect())
    if not todo_keys:
        return {"months_run": 0, "rows": 0}

    # one source read covers all pending windows: each window is an input
    # partition, so months ingest in parallel (reference: sequential loop)
    lo = min(k.split("_")[0] for k in todo_keys)
    hi = max(k.split("_")[1] for k in todo_keys)
    raw = (
        spark.read.format("paged_rest")
        .options(**source_options)
        .option("date_from", lo)
        .option("date_to", hi)
        .load()
    )
    # unit attribution by provenance: every source row carries the window
    # that fetched it (_window_key), so clamped final windows and null
    # release dates land in exactly the checkpointed unit — deriving the
    # key from release_date would silently drop both (ADVICE r1, high)
    movies = normalize_movies(
        raw, image_base, poster_size, genre_map, passthrough=("_window_key",)
    ).withColumnRenamed("_window_key", "unit_key")
    # A1: per-month dedup, survivor = highest popularity then lowest id
    movies = keep_first(
        movies,
        ["unit_key", "tmdb_id"],
        [F.desc("popularity"), F.asc("tmdb_id")],
    )
    movies = movies.filter(F.col("unit_key").isin(todo_keys))
    # one materialization feeds both the count and the write: without it,
    # every TMDB page would be fetched twice per run (ADVICE r1, medium)
    movies = movies.persist()
    try:
        rows = movies.count()
        (
            movies.write.mode("overwrite")
            # per-writer so correctness never depends on session conf:
            # only the pending unit partitions are replaced (ADVICE r1)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("unit_key")
            .parquet(f"{out_dir}/monthly_parts")
        )
    finally:
        movies.unpersist()
    prior = [r.unit_key for r in done.collect()]
    save_done_keys(prior + todo_keys, checkpoint_path)

    # master merge: scan the partitioned dataset (U1), global dedup (A2 —
    # cross-month duplicate keeps the earliest month, like the reference's
    # concat order), master Parquet + single-file CSV (W2/W3)
    parts = spark.read.parquet(f"{out_dir}/monthly_parts")
    master = keep_first(
        parts, ["tmdb_id"], [F.asc("unit_key"), F.desc("popularity")]
    ).drop("unit_key")
    master.write.mode("overwrite").parquet(f"{out_dir}/master_parquet")
    (
        master.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(f"{out_dir}/master_csv")
    )
    return {"months_run": len(todo_keys), "rows": rows}
