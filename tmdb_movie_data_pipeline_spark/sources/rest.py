"""Paged-REST batch DataSource (SURVEY.md §2.1 S1/S2, §4 R1-R3/R9-R10).

The reference's ingest is a sequential page loop per month window with
retry/backoff/rate-limit (src/movie.py:98-129, 145-182). This re-plans it
for a cluster using the PySpark Python DataSource API (Spark 4.x):

* **partitions = date windows** (one per calendar month): each executor
  task pages through one window — the reference's outer loop, parallelized;
* **pushdown by option** (R1-R3): date range, min_votes, include_adult and
  the page cap travel as reader options into the request parameters — the
  Python DS API has no filter-pushdown hook yet, so predicates are
  forwarded explicitly, exactly like the reference's API params;
* **per-request resilience** (S2/R10): bounded retries with exponential
  backoff, Retry-After honor on 429, fail-fast on other 4xx — implemented
  engine-side per partition; task-level retries are Spark's;
* **rate limit** (R9): polite sleep between pages, per partition;
* **fixture transport**: tests and offline runs inject a deterministic
  page-serving function instead of a network session — no sockets needed.

The page cap (reference: 500 pages → silent 10k-row truncation,
src/movie.py:161-168) is an explicit option here and the reader reports the
truncation loudly via a warning instead of silently dropping data.
"""

from __future__ import annotations

import json
import time
import warnings
from collections.abc import Callable, Iterator
from dataclasses import dataclass
from datetime import date

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from pyspark.sql.types import StringType, StructField

from ..schemas import RAW_MOVIE_SCHEMA

__all__ = [
    "PagedRestDataSource",
    "SOURCE_SCHEMA",
    "month_windows",
    "fetch_window",
    "RetryPolicy",
]

#: What the source emits: the raw API record plus the window that fetched it
#: (the unit/checkpoint key — attribution by provenance, not by value).
SOURCE_SCHEMA = StructType(
    list(RAW_MOVIE_SCHEMA.fields) + [StructField("_window_key", StringType(), False)]
)

PAGE_SIZE = 20
DEFAULT_MAX_PAGES = 500


def month_windows(start: str, end: str) -> list[tuple[str, str]]:
    """Calendar-month (start, end) ISO windows covering [start, end] —
    the partition planner (reference month_ranges, src/movie.py:228-238).

    Exact reference semantics, pinned by its own tests
    (tests/test_movie.py:87-117): the start is snapped to the first of its
    month (a mid-month start still fetches the whole month), the final
    window is clamped to ``end``.
    """
    s = date.fromisoformat(start)
    e = date.fromisoformat(end)
    cur = date(s.year, s.month, 1)
    out: list[tuple[str, str]] = []
    while cur <= e:
        nxt = date(cur.year + (cur.month == 12), cur.month % 12 + 1, 1)
        last = min(date.fromordinal(nxt.toordinal() - 1), e)
        out.append((cur.isoformat(), last.isoformat()))
        cur = nxt
    return out


@dataclass
class RetryPolicy:
    """S2 semantics: bounded retries, exponential backoff, 429 Retry-After."""

    max_retries: int = 6
    backoff_base: float = 1.0
    sleep: Callable[[float], None] = time.sleep

    def call(self, fn: Callable[[], dict]) -> dict:
        last_exc: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                return fn()
            except TransientHttpError as exc:
                last_exc = exc
                wait = (
                    exc.retry_after
                    if exc.retry_after is not None
                    else self.backoff_base * (2**attempt)
                )
                self.sleep(wait)
            except PermanentHttpError:
                raise
        raise RuntimeError(f"retry budget exhausted: {last_exc}")


class TransientHttpError(Exception):
    """5xx / 429 — retryable."""

    def __init__(self, status: int, retry_after: float | None = None):
        super().__init__(f"HTTP {status}")
        self.status = status
        self.retry_after = retry_after


class PermanentHttpError(Exception):
    """Other 4xx — fail fast (reference src/movie.py:123-126)."""


def fetch_window(
    transport: Callable[[dict], dict],
    date_from: str,
    date_to: str,
    *,
    min_votes: int = 0,
    include_adult: bool = False,
    max_pages: int = DEFAULT_MAX_PAGES,
    polite_sleep: float = 0.0,
    retry: RetryPolicy | None = None,
    sleeper: Callable[[float], None] = time.sleep,
    language: str | None = None,
) -> Iterator[dict]:
    """Page through one window via ``transport(params) -> page_dict``.

    ``transport`` is the seam: a real HTTP session adapter in production, a
    fixture function in tests. Pushed-down predicates ride in the params
    (R1), ordering is the source's popularity-desc contract (R2), and the
    page cap stops fetching early (R3) — with a loud warning, never silent.
    """
    retry = retry or RetryPolicy()
    params = {
        "primary_release_date.gte": date_from,
        "primary_release_date.lte": date_to,
        "vote_count.gte": min_votes,
        "include_adult": str(include_adult).lower(),
        "sort_by": "popularity.desc",
        "page": 1,
    }
    if language:  # reference sends it on every request (src/movie.py:151)
        params["language"] = language
    first = retry.call(lambda: transport(dict(params)))
    total_pages = int(first.get("total_pages", 1))
    if total_pages > max_pages:
        warnings.warn(
            f"window {date_from}..{date_to}: {total_pages} pages > cap {max_pages}; "
            f"truncating to {max_pages * PAGE_SIZE} rows",
            stacklevel=2,
        )
    yield from first.get("results", [])
    for page in range(2, min(total_pages, max_pages) + 1):
        if polite_sleep:
            sleeper(polite_sleep)
        p = dict(params, page=page)
        got = retry.call(lambda p=p: transport(p))
        yield from got.get("results", [])


class _WindowPartition(InputPartition):
    def __init__(self, date_from: str, date_to: str):
        self.date_from = date_from
        self.date_to = date_to


class _PagedRestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options

    def partitions(self) -> list[InputPartition]:
        wins = month_windows(self.options["date_from"], self.options["date_to"])
        return [_WindowPartition(a, b) for a, b in wins]

    def read(self, partition: _WindowPartition) -> Iterator[tuple]:
        opts = self.options
        fixture_dir = opts.get("fixture_dir")
        if fixture_dir:
            transport = _fixture_transport(fixture_dir)
        else:  # pragma: no cover - network path, exercised on real clusters
            transport = _http_transport(opts)
        fields = [f.name for f in RAW_MOVIE_SCHEMA.fields]
        rows = fetch_window(
            transport,
            partition.date_from,
            partition.date_to,
            min_votes=int(opts.get("min_votes", 0)),
            include_adult=opts.get("include_adult", "false") == "true",
            max_pages=int(opts.get("max_pages", DEFAULT_MAX_PAGES)),
            polite_sleep=float(opts.get("polite_sleep", 0.0)),
            language=opts.get("language"),
        )
        # every row carries the window that fetched it: downstream unit
        # attribution (checkpointing, partitioned writes) never has to
        # re-derive the window from release_date — which would mis-bin
        # clamped final windows and drop null release dates (ADVICE r1)
        window_key = f"{partition.date_from}_{partition.date_to}"
        for rec in rows:
            yield tuple(rec.get(f) for f in fields) + (window_key,)


def _fixture_transport(fixture_dir: str) -> Callable[[dict], dict]:
    """Deterministic offline transport: pages live as JSON files named
    ``{date_from}_{date_to}_p{page}.json``; missing file → empty page."""

    def transport(params: dict) -> dict:
        path = (
            f"{fixture_dir}/{params['primary_release_date.gte']}_"
            f"{params['primary_release_date.lte']}_p{params['page']}.json"
        )
        try:
            with open(path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"total_pages": 0, "results": []}

    return transport


def _http_transport(opts: dict) -> Callable[[dict], dict]:  # pragma: no cover
    """Real HTTP transport: one session per partition (reference keeps one
    per process, src/movie.py:82-83). Imported lazily — offline images never
    touch it."""
    import urllib.error
    import urllib.parse
    import urllib.request

    base = opts["base_url"].rstrip("/")
    token = opts.get("bearer_token", "")

    def transport(params: dict) -> dict:
        url = f"{base}/discover/movie?{urllib.parse.urlencode(params)}"
        req = urllib.request.Request(url, headers={"Authorization": f"Bearer {token}"})
        try:
            with urllib.request.urlopen(req, timeout=25) as resp:
                return json.load(resp)
        except urllib.error.HTTPError as exc:
            retry_after = exc.headers.get("Retry-After")
            if exc.code == 429:
                raise TransientHttpError(429, float(retry_after) if retry_after else None)
            if exc.code >= 500:
                raise TransientHttpError(exc.code)
            raise PermanentHttpError(f"HTTP {exc.code}")

    return transport


def fetch_genre_map(
    base_url: str, bearer_token: str, language: str = "en-US"
) -> dict[int, str]:  # pragma: no cover - network path
    """Genre dimension fetch (/genre/movie/list) — the reference loads this
    once per run before the month loop (src/movie.py:132-142)."""
    import urllib.parse
    import urllib.request

    url = (
        f"{base_url.rstrip('/')}/genre/movie/list?"
        + urllib.parse.urlencode({"language": language})
    )
    req = urllib.request.Request(
        url, headers={"Authorization": f"Bearer {bearer_token}"}
    )
    with urllib.request.urlopen(req, timeout=25) as resp:
        doc = json.load(resp)
    return {int(g["id"]): g["name"] for g in doc.get("genres", [])}


class PagedRestDataSource(DataSource):
    """``spark.read.format("paged_rest")`` — register with
    ``spark.dataSource.register(PagedRestDataSource)``.

    Options: date_from, date_to (required); min_votes, include_adult,
    max_pages, polite_sleep, fixture_dir | (base_url, bearer_token).
    """

    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self) -> StructType:
        return SOURCE_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _PagedRestReader(schema, dict(self.options))
