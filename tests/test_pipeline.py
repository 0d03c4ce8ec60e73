"""End-to-end backfill pipeline: ingest → normalize → dedup → partitioned
write → checkpoint → master merge, offline via the fixture transport."""

from __future__ import annotations

import glob
import json

from tmdb_movie_data_pipeline_spark.pipeline import run_backfill


def _write_fixture(tmp_path, win_start, win_end, movies):
    page = {"total_pages": 1, "results": movies}
    (tmp_path / f"{win_start}_{win_end}_p1.json").write_text(json.dumps(page))


def _movie(mid, date, pop, title=None):
    return {
        "id": mid,
        "title": title or f"Movie {mid}",
        "original_title": f"OT {mid}",
        "release_date": date,
        "genre_ids": [28],
        "vote_average": 7.0,
        "vote_count": 100,
        "popularity": pop,
        "original_language": "en",
        "overview": "x",
        "poster_path": f"/p{mid}.jpg",
        "adult": False,
    }


def test_backfill_end_to_end(spark, tmp_path):
    fixtures = tmp_path / "fx"
    fixtures.mkdir()
    # Jan: movie 1 twice (dup within month, higher popularity survives), movie 2
    _write_fixture(
        fixtures, "2023-01-01", "2023-01-31",
        [_movie(1, "2023-01-10", 50.0, "keep-me"), _movie(1, "2023-01-10", 10.0, "drop-me"),
         _movie(2, "2023-01-20", 30.0)],
    )
    # Feb: movie 2 again (cross-month dup → January survivor wins), movie 3
    _write_fixture(
        fixtures, "2023-02-01", "2023-02-28",
        [_movie(2, "2023-02-05", 99.0), _movie(3, "2023-02-15", 20.0)],
    )

    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt.json")
    args = dict(
        date_from="2023-01-01",
        date_to="2023-02-28",
        out_dir=str(out),
        checkpoint_path=ckpt,
        genre_map={28: "Action"},
        image_base="https://cdn/",
        poster_size="w500",
        source_options={"fixture_dir": str(fixtures)},
    )
    stats = run_backfill(spark, **args)
    assert stats["months_run"] == 2
    assert stats["rows"] == 4  # in-month dup of movie 1 collapsed

    master = spark.read.parquet(str(out / "master_parquet"))
    rows = {r.tmdb_id: r for r in master.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].title == "keep-me"  # A1: popularity-desc survivor
    assert rows[2].release_date == "2023-01-20"  # A2: earliest month wins
    assert rows[1].genres == "Action"
    assert rows[1].poster_url == "https://cdn/w500/p1.jpg"

    # CSV master is a single file with header (W3 parity)
    csvs = glob.glob(str(out / "master_csv" / "part-*.csv"))
    assert len(csvs) == 1

    # resume: everything checkpointed → no work (J2/R4)
    stats2 = run_backfill(spark, **args)
    assert stats2 == {"months_run": 0, "rows": 0}
