"""CLI entry point — reference-parity command surface (src/movie.py:300-319).

    python -m tmdb_movie_data_pipeline_spark --from 2023-01-01 --to 2023-03-31 \
        --out ./tmdb_out --fixture-dir ./fixtures          # offline
    python -m tmdb_movie_data_pipeline_spark --from ... --to ... \
        --base-url https://api.themoviedb.org/3 --bearer-env TMDB_BEARER  # live

Differences from the reference by design: config is passed as arguments
(the reference raises at import if TMDB_BEARER is unset — an anti-pattern
its own tests have to monkeypatch around, SURVEY.md §5); months run in
parallel; the page cap warns instead of silently truncating.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TMDB monthly backfill (Spark-native)")
    p.add_argument("--from", dest="date_from", default=os.getenv("DATE_FROM", "2021-01-01"))
    p.add_argument("--to", dest="date_to", default=os.getenv("DATE_TO", "2023-12-31"))
    p.add_argument("--lang", dest="lang", default=os.getenv("LANGUAGE", "en-US"))
    p.add_argument("--min-votes", dest="min_votes", type=int, default=0)
    p.add_argument("--max-pages", dest="max_pages", type=int, default=None)
    p.add_argument("--out", dest="out_dir", default="./tmdb_out")
    p.add_argument("--checkpoint", dest="checkpoint", default=None,
                   help="bookkeeping JSON path (default: <out>/checkpoint.json)")
    p.add_argument("--fixture-dir", dest="fixture_dir", default=None,
                   help="offline mode: serve pages from JSON fixtures")
    p.add_argument("--base-url", dest="base_url", default=None)
    p.add_argument("--bearer-env", dest="bearer_env", default="TMDB_BEARER",
                   help="env var holding the API bearer token (live mode)")
    p.add_argument("--log-level", dest="log_level", default="INFO",
                   choices=["DEBUG", "INFO", "WARNING", "ERROR"])
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    logging.basicConfig(level=args.log_level, format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("tmdb_pipeline")

    src_opts: dict[str, str] = {"language": args.lang}
    genre_map: dict[int, str] = {}
    if args.fixture_dir:
        src_opts["fixture_dir"] = args.fixture_dir
    elif args.base_url:
        token = os.getenv(args.bearer_env, "")
        if not token:
            log.error("live mode needs a bearer token in $%s", args.bearer_env)
            return 2
        src_opts.update({"base_url": args.base_url, "bearer_token": token})
        # live mode loads the genre dimension before the month windows run,
        # localized like every other request (reference src/movie.py:132-142)
        from .sources.rest import fetch_genre_map

        genre_map = fetch_genre_map(args.base_url, token, args.lang)
    else:
        log.error("pass --fixture-dir (offline) or --base-url (live)")
        return 2
    if args.min_votes:
        src_opts["min_votes"] = str(args.min_votes)
    if args.max_pages:
        src_opts["max_pages"] = str(args.max_pages)

    from .pipeline import run_backfill
    from .session import get_spark

    spark = get_spark(app_name="tmdb_backfill")
    stats = run_backfill(
        spark,
        date_from=args.date_from,
        date_to=args.date_to,
        out_dir=args.out_dir,
        checkpoint_path=args.checkpoint or os.path.join(args.out_dir, "checkpoint.json"),
        genre_map=genre_map,
        image_base="https://image.tmdb.org/t/p/",
        poster_size="w500",
        source_options=src_opts,
    )
    log.info("backfill done: %s", stats)
    print(stats)
    return 0


if __name__ == "__main__":
    sys.exit(main())
