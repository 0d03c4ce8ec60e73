"""Second-scale gate for the DEFERRED queue (ADVICE r6): until a deferred
query has a driver CORRECTNESS row, its only verification is local — so it
must be hash-gated at BOTH fixture scales, including sf0.01, the scale the
driver will actually run it at on activation. Active queries get their
sf0.01 check from the driver itself; this module covers the queue only, so
the extra cost stays bounded by the queue size.
"""

from __future__ import annotations

import pytest

from tmdb_movie_data_pipeline_spark.registry import (
    deferred_oracles,
    deferred_queries,
)

from conftest import SF_MEDIUM  # noqa: E402
from test_oracle import _assert_atomic_schema, _canon_frame, _duck  # noqa: E402

DEFERRED = deferred_queries()
ORACLES = deferred_oracles()


@pytest.mark.parametrize("name", sorted(DEFERRED))
def test_deferred_query_matches_oracle_at_sf01(spark, name):
    out = DEFERRED[name](spark, SF_MEDIUM)
    _assert_atomic_schema(name, out.schema)
    spark_df = out.toPandas()
    con = _duck(SF_MEDIUM)
    try:
        duck_df = con.execute(ORACLES[name]).df()
    finally:
        con.close()
    assert sorted(spark_df.columns) == sorted(duck_df.columns)
    assert len(spark_df) == len(duck_df), (
        f"{name}@sf0.01: rows spark={len(spark_df)} duck={len(duck_df)}"
    )
    assert _canon_frame(spark_df) == _canon_frame(duck_df), (
        f"{name}@sf0.01: value mismatch"
    )
