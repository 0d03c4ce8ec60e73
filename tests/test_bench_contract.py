"""Contract tests for bench.py's driver-facing output.

The driver records only the LAST 2000 bytes of bench stdout; the r8 bench
line grew past that with 56 per-query timings and the head of the line —
including the headline total — was truncated, leaving BENCH_r08.json
unparseable (VERDICT r8 #3). These tests pin the fix WITHOUT running the
benchmark: the printed line's shape is reconstructed from the same code
path constants, and every benched query name must resolve in the registry
so a rename can't silently drop a timing.
"""

from __future__ import annotations

import json

import bench
from tmdb_movie_data_pipeline_spark import registry


def test_bench_queries_all_registered():
    qs = set(registry.all_queries())
    missing = [n for n in bench.BENCH_QUERIES + bench.STREAMING_BENCH if n not in qs]
    assert not missing, f"benched names not in registry: {missing}"


def test_final_line_fits_driver_tail_capture():
    """Reconstruct a worst-case final line (every float at max typical
    width) and assert it sits under MAX_FINAL_LINE_BYTES, which itself
    must sit under the driver's 2000-byte tail capture with headroom for
    Spark shutdown chatter."""
    assert bench.MAX_FINAL_LINE_BYTES <= 1500
    longest = sorted(bench.BENCH_QUERIES, key=len, reverse=True)[:8]
    line = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": 9999.999,
            "unit": "sec",
            "sf": 0.1,
            "n_queries": len(bench.BENCH_QUERIES) + 2,
            "runs_per_query": bench.RUNS_PER_QUERY,
            "streaming_total_sec": 9999.999,
            "lsh_stage_build_sec": 9999.999,
            "calibration_sec_pre": 99.9999,
            "calibration_sec_post": 99.9999,
            "slowest_sec": {n: 9999.999 for n in longest},
            "detail_file": "BENCH_DETAIL_r99.json",
        },
        separators=(",", ":"),
    )
    assert len(line.encode()) <= bench.MAX_FINAL_LINE_BYTES, (
        f"worst-case bench line is {len(line.encode())} B"
    )


def test_no_duplicate_bench_queries():
    assert len(bench.BENCH_QUERIES) == len(set(bench.BENCH_QUERIES))
