"""Movie-pipeline normalize transform (SURVEY.md §2.2 P1-P9, reference
src/movie.py:185-205) — the reference's entire transform stage, re-expressed
as one columnar projection.

The reference loops over raw TMDB dicts in Python; here the same semantics
are a single Catalyst `Project` (+ a zero-shuffle map-literal lookup for the
genre join), so the transform runs inside whole-stage codegen and scales to
any corpus: no per-row Python, no shuffle at all.

Registered query: the driver's tables carry no raw-movie data, so the
correctness entry evaluates the transform over the canonical reference
fixture (FIXTURES.md A1/A2, from reference tests/test_movie.py:20-35)
inlined as literal rows — the oracle inlines the identical VALUES. That
pins every golden expectation from the reference test suite (pipe-joined
genres, unknown-id fallback, empty-array → '', NULL poster propagation)
into the hash-checked gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..schemas import MOVIE_COLS

__all__ = ["normalize_movies", "genres_pipe_view"]


def _genre_lookup(genre_map: dict[int, str]) -> Column:
    """genre_ids → names with str(id) fallback (src/movie.py:189): a
    MapType literal probe — the zero-shuffle exact-parity form of the
    broadcast dimension join (J1)."""
    if genre_map:
        pairs: list[Column] = []
        for k, v in genre_map.items():
            pairs.extend([F.lit(int(k)), F.lit(v)])
        m = F.create_map(*pairs)
    else:
        m = F.create_map().cast("map<bigint,string>")
    return F.transform(
        F.col("genre_ids"),
        lambda g: F.coalesce(m[g], g.cast("string")),
    )


def normalize_movies(
    raw: DataFrame,
    image_base: str,
    poster_size: str,
    genre_map: dict[int, str],
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """P1-P7: defensive field extraction, genre lookup+join, pipe-joined
    genre string ('' on empty OR null genre_ids — the reference's falsy
    check, src/movie.py:197), conditional poster URL concat (None on null
    OR empty poster_path — falsy check, src/movie.py:190-191), fixed column
    order (src/movie.py:26-30). ``passthrough`` appends raw columns (e.g.
    the source's provenance ``_window_key``) after the contract columns."""
    names = _genre_lookup(genre_map)
    out = raw.select(
        F.col("id").cast("long").alias("tmdb_id"),
        F.col("title").alias("title"),
        F.col("original_title").alias("original_title"),
        F.col("release_date").alias("release_date"),
        F.coalesce(F.array_join(names, "|"), F.lit("")).alias("genres"),
        F.col("vote_average").cast("double").alias("vote_average"),
        F.col("vote_count").cast("long").alias("vote_count"),
        F.col("popularity").cast("double").alias("popularity"),
        F.col("original_language").alias("original_language"),
        F.col("overview").alias("overview"),
        F.when(
            F.col("poster_path").isNotNull() & (F.col("poster_path") != ""),
            F.concat(F.lit(image_base), F.lit(poster_size), F.col("poster_path")),
        ).alias("poster_url"),
        *[F.col(c) for c in passthrough],
    )
    return out.select(*MOVIE_COLS, *passthrough)


def genres_pipe_view(df: DataFrame, genres_array_col: str = "genres") -> DataFrame:
    """Derive the reference's pipe-delimited genre string from the canonical
    array column (parity view, src/movie.py:197)."""
    return df.withColumn(genres_array_col, F.array_join(F.col(genres_array_col), "|"))


# -- canonical fixture (reference tests/test_movie.py:20-35, FIXTURES.md A1) --

_FIXTURE_ROWS = [
    # (id, title, original_title, release_date, genre_ids, vote_average,
    #  vote_count, popularity, original_language, overview, poster_path)
    (1, "Test Movie", "Test Movie OT", "2023-06-15", [28, 35], 7.5, 1000, 120.5, "en", "A test movie.", "/abc123.jpg"),
    (2, "No Poster", "No Poster OT", "2023-07-01", [28], 6.0, 50, 10.0, "en", "No poster here.", None),
    (3, "Unknown Genre", "Unknown Genre OT", "2023-07-02", [9999], 5.5, 20, 5.0, "fr", "Mystery genre.", "/p3.jpg"),
    (4, "Empty Genres", "Empty Genres OT", "2023-07-03", [], 4.0, 10, 2.0, "de", "Nothing at all.", "/p4.jpg"),
    # edge parity rows (ADVICE r1): null genre_ids → '' genres (falsy check,
    # src/movie.py:197); empty-string poster_path → no URL (src/movie.py:190)
    (5, "Null Genres", "Null Genres OT", "2023-07-04", None, 3.0, 5, 1.0, "it", "No genre list.", "/p5.jpg"),
    (6, "Blank Poster", "Blank Poster OT", "2023-07-05", [35], 2.0, 3, 0.5, "es", "Poster is blank.", ""),
]

_GENRE_MAP = {28: "Action", 35: "Comedy"}
_IMAGE_BASE = "https://cdn/"
_POSTER_SIZE = "w500"


def _fixture_values_sql() -> str:
    rows = []
    for r in _FIXTURE_ROWS:
        genre_arr = (
            "CAST(NULL AS BIGINT[])"
            if r[4] is None
            else "[" + ", ".join(str(g) for g in r[4]) + "]"
        )
        poster = "NULL" if r[10] is None else f"'{r[10]}'"
        rows.append(
            f"({r[0]}, '{r[1]}', '{r[2]}', '{r[3]}', {genre_arr}, {r[5]}, {r[6]},"
            f" {r[7]}, '{r[8]}', '{r[9]}', {poster})"
        )
    return ",\n           ".join(rows)


@register(
    "movie_normalize",
    oracle=f"""
    WITH raw(id, title, original_title, release_date, genre_ids, vote_average,
             vote_count, popularity, original_language, overview, poster_path) AS (
        VALUES {_fixture_values_sql()}
    ),
    looked AS (
        SELECT *,
               list_transform(genre_ids,
                   g -> CASE WHEN g = 28 THEN 'Action'
                             WHEN g = 35 THEN 'Comedy'
                             ELSE CAST(g AS VARCHAR) END) AS genre_names
        FROM raw
    )
    SELECT CAST(id AS BIGINT)                    AS tmdb_id,
           title,
           original_title,
           release_date,
           COALESCE(array_to_string(genre_names, '|'), '') AS genres,
           CAST(vote_average AS DOUBLE)          AS vote_average,
           CAST(vote_count AS BIGINT)            AS vote_count,
           CAST(popularity AS DOUBLE)            AS popularity,
           original_language,
           overview,
           CASE WHEN poster_path IS NOT NULL AND poster_path <> ''
                THEN '{_IMAGE_BASE}' || '{_POSTER_SIZE}' || poster_path
                ELSE NULL END                    AS poster_url
    FROM looked
    """,
)
def movie_normalize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..schemas import RAW_MOVIE_SCHEMA

    raw = spark.createDataFrame(
        [r + (False,) for r in _FIXTURE_ROWS],
        schema=RAW_MOVIE_SCHEMA,
    )
    return normalize_movies(raw, _IMAGE_BASE, _POSTER_SIZE, _GENRE_MAP)
