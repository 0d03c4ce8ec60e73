"""Reference-parity tests for the normalize transform — mirrors the
reference's TestNormalizeToDf suite (tests/test_movie.py:19-81) case by case.
"""

from __future__ import annotations

import pytest

from tmdb_movie_data_pipeline_spark.operators.normalize import normalize_movies
from tmdb_movie_data_pipeline_spark.schemas import (
    MOVIE_COLS,
    RAW_MOVIE_SCHEMA,
    conform,
    empty_movies,
)

GENRES = {28: "Action", 35: "Comedy"}
BASE, SIZE = "https://cdn/", "w500"


def _raw(spark, rows):
    return spark.createDataFrame(rows, schema=RAW_MOVIE_SCHEMA)


FULL_ROW = (
    1, "Test Movie", "Test Movie OT", "2023-06-15", [28, 35],
    7.5, 1000, 120.5, "en", "A test movie.", "/abc123.jpg", False,
)


def test_schema_and_order(spark):
    out = normalize_movies(_raw(spark, [FULL_ROW]), BASE, SIZE, GENRES)
    assert out.columns == MOVIE_COLS  # column order is contract (movie.py:26-30)


def test_values_genre_join_and_poster(spark):
    row = normalize_movies(_raw(spark, [FULL_ROW]), BASE, SIZE, GENRES).first()
    assert row.tmdb_id == 1
    assert row.genres == "Action|Comedy"  # pipe-join (movie.py:197)
    assert row.poster_url == "https://cdn/w500/abc123.jpg"  # concat (movie.py:190-191)
    assert row.vote_average == 7.5 and row.vote_count == 1000


def test_null_poster_propagates(spark):
    r = FULL_ROW[:10] + (None, False)
    row = normalize_movies(_raw(spark, [r]), BASE, SIZE, GENRES).first()
    assert row.poster_url is None  # tests/test_movie.py:54-58


def test_unknown_genre_falls_back_to_id_string(spark):
    r = FULL_ROW[:4] + ([9999],) + FULL_ROW[5:]
    row = normalize_movies(_raw(spark, [r]), BASE, SIZE, GENRES).first()
    assert row.genres == "9999"  # tests/test_movie.py:60-64


def test_empty_genres_is_empty_string(spark):
    r = FULL_ROW[:4] + ([],) + FULL_ROW[5:]
    row = normalize_movies(_raw(spark, [r]), BASE, SIZE, GENRES).first()
    assert row.genres == ""  # tests/test_movie.py:66-70


def test_empty_input_keeps_schema(spark):
    out = normalize_movies(_raw(spark, []), BASE, SIZE, GENRES)
    assert out.columns == MOVIE_COLS
    assert out.count() == 0  # tests/test_movie.py:72-75


def test_multi_row(spark):
    r2 = (2,) + FULL_ROW[1:]
    out = normalize_movies(_raw(spark, [FULL_ROW, r2]), BASE, SIZE, GENRES)
    assert out.count() == 2  # tests/test_movie.py:77-81


def test_missing_fields_become_nulls(spark):
    # .get() defaults (movie.py:193-203): absent fields → NULL, not error
    r = (3, None, None, None, None, None, None, None, None, None, None, None)
    row = normalize_movies(_raw(spark, [r]), BASE, SIZE, GENRES).first()
    assert row.title is None and row.release_date is None
    # null genre_ids → '' — the reference's falsy check (`or []`) treats
    # missing and empty lists alike (src/movie.py:196-197; ADVICE r1)
    assert row.genres == ""


def test_empty_genre_map(spark):
    row = normalize_movies(_raw(spark, [FULL_ROW]), BASE, SIZE, {}).first()
    assert row.genres == "28|35"  # every id falls back to str(id)


def test_conform_reindex_semantics(spark):
    from tmdb_movie_data_pipeline_spark.schemas import MOVIE_SCHEMA

    # extra column dropped, missing columns null-filled, order enforced —
    # reindex(columns=COLS) parity (movie.py:205)
    df = spark.createDataFrame(
        [(7, "t", "x")], "tmdb_id long, title string, extra_junk string"
    )
    out = conform(df, MOVIE_SCHEMA)
    assert out.columns == MOVIE_COLS
    row = out.first()
    assert row.tmdb_id == 7 and row.title == "t" and row.poster_url is None


def test_empty_movies_relation(spark):
    out = empty_movies(spark)
    assert out.columns == MOVIE_COLS and out.count() == 0


@pytest.mark.parametrize(
    "start,end,expected",
    [
        # mirrors TestMonthRanges (reference tests/test_movie.py:87-117)
        ("2023-01-01", "2023-01-31", [("2023-01-01", "2023-01-31")]),
        ("2023-01-01", "2023-01-15", [("2023-01-01", "2023-01-15")]),  # end-clip
        ("2023-03-15", "2023-04-30", [("2023-03-01", "2023-03-31"), ("2023-04-01", "2023-04-30")]),  # start snapped
        ("2022-12-01", "2023-01-31", [("2022-12-01", "2022-12-31"), ("2023-01-01", "2023-01-31")]),  # year boundary
        ("2023-06-10", "2023-06-10", [("2023-06-01", "2023-06-10")]),  # same day
    ],
)
def test_month_windows(start, end, expected):
    from tmdb_movie_data_pipeline_spark.sources.rest import month_windows

    assert month_windows(start, end) == expected
