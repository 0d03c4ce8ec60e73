"""Mirror of the driver's correctness gate: every registered query runs on
Spark AND its DuckDB oracle on the same parquet tables; results must match
on row count, column names, and (order-insensitively) every value.

This is the same contract as CORRECTNESS_r{N}.json — failing here means
failing the driver, so keep it green.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
import pytest

from tmdb_movie_data_pipeline_spark.registry import (
    all_oracles,
    all_queries,
    deferred_oracles,
    deferred_queries,
)
from tmdb_movie_data_pipeline_spark.schemas import TESTDATA_TABLES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # VERDICT r16 #3: an UNCAPPED connection defaults to ~80 % of box RAM;
    # with the Spark JVM from the same pytest process resident, back-to-back
    # full-suite runs transiently OOM'd the heaviest oracle
    # (dedup_semdedup_prune, judge's r16 run) even though it passes in
    # isolation. Same limits as the committed pre-flight script, which never
    # hit this.
    con.execute("SET threads=8")
    con.execute("SET memory_limit='24GB'")
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def _canon_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float) and pd.isna(v):
                v = None
            elif v is pd.NaT:
                v = None
            vals.append(_canon_value(v))
        out.append(tuple(vals))
    return sorted(out)


# deferred (next-round queue) entries face the IDENTICAL local gate —
# deferral only changes when the driver sees them
QUERIES = {**all_queries(), **deferred_queries()}
ORACLES = {**all_oracles(), **deferred_oracles()}


#: entries that legitimately take the driver's weaker rows-only check —
#: each must document in its registration docstring WHY no set-oriented
#: SQL oracle can exist. Keep this list short and justified.
ORACLE_EXEMPT: set[str] = set()
# (empty since r6: the CDC chunker's fixed-window rewrite made its boundary
# rule SQL-expressible, so the last rows-only exemption was retired)


def _assert_atomic_schema(name: str, schema) -> None:
    """Driver-contract guard (VERDICT r6 item #2): the driver canonicalizes
    results with pandas ``sort_values`` over every column, which raises
    ``TypeError: unhashable type`` on list/dict cells — so NO registered
    query (active or deferred) may return an array/map/struct top-level
    column. Flatten to a delimited string (``F.array_join``) or explode to
    rows instead; text_inverted_index was the r6 casualty."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: non-atomic top-level column(s) {bad} "
        f"({[str(schema[b].dataType) for b in bad]}) — the driver "
        "canonicalizer crashes on these; flatten to string or explode"
    )


def test_deferred_names_do_not_reach_the_driver():
    from tmdb_movie_data_pipeline_spark.registry import verification_order

    leaked = set(deferred_queries()) & set(verification_order())
    assert not leaked, f"deferred queries leaked into the driver order: {leaked}"


def test_every_query_has_an_oracle():
    missing = sorted(set(QUERIES) - set(ORACLES) - ORACLE_EXEMPT)
    # Streaming/stateful entries may legitimately lack oracles; everything
    # else must carry one — additions to ORACLE_EXEMPT need a docstring
    # justification in the registered query.
    assert not missing, f"queries without oracle SQL: {missing}"
    assert not (ORACLE_EXEMPT & set(ORACLES)), "exempt query grew an oracle"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    if name in ORACLE_EXEMPT:
        # rows-only contract: the query must RUN and return a stable shape;
        # its semantics are pinned by dedicated property tests instead
        out = QUERIES[name](spark, sf_dir)
        _assert_atomic_schema(name, out.schema)
        assert out.count() >= 0
        return
    out = QUERIES[name](spark, sf_dir)
    _assert_atomic_schema(name, out.schema)
    spark_df = out.toPandas()
    con = _duck(sf_dir)
    try:
        duck_df = con.execute(ORACLES[name]).df()
    finally:
        con.close()

    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} "
        f"duck={sorted(duck_df.columns)}"
    )
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count spark={len(spark_df)} duck={len(duck_df)}"
    )
    # Mirror the driver's stricter canonicalization path: it sorts the raw
    # pandas frame with sort_values over every column, which raises on
    # unhashable (list/dict) cells. Running the same call here means any
    # value the driver cannot canonicalize fails LOCALLY first (the r6
    # text_inverted_index gap: our stringifying _canon_value passed a frame
    # the driver crashed on).
    for frame, side in ((spark_df, "spark"), (duck_df, "duck")):
        if len(frame):
            try:
                frame[sorted(frame.columns)].sort_values(
                    by=sorted(frame.columns)
                )
            except TypeError as e:
                raise AssertionError(
                    f"{name}: {side} result is not driver-canonicalizable "
                    f"(pandas sort_values raised {e!r}) — flatten non-atomic "
                    "values to strings"
                ) from e
    s_rows = _canon_frame(spark_df)
    d_rows = _canon_frame(duck_df)
    if s_rows != d_rows:
        diffs = [
            f"  spark: {s}\n  duck:  {d}"
            for s, d in zip(s_rows, d_rows)
            if s != d
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs:\n" + "\n".join(diffs))
