"""Paginated REST source, Spark-shaped.

The reference fetches pages sequentially on one thread with retry/backoff
and an inter-page sleep (S1-S3, fetch_articles.py:58-76,112).  The engine
keeps the same *per-call* policy (retries, exponential backoff, rate
limit, abort-page-on-exhaustion) but executes page fetches in parallel on
executors: the driver enumerates page ids, the fetch callable runs inside
``mapInPandas`` partitions, and results come back as raw JSON rows that
parse through the explicit article schema.

At scale this is the standard "side-input ingest" shape: fetch tasks are
pure + idempotent, a failed task re-fetches only its pages
(spark.task.maxFailures), and the per-partition rate limit bounds the
aggregate request rate at ``partitions / rate_limit_s`` req/s.

For tests, the "endpoint" is a directory of ``page_{n}.json`` fixture
files (pretty-printed JSON arrays — the reference's own sink format) with
an optional deterministic failure injector.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.session import ensure_query_session_conf
from azure_func_forem_data_etl_spark.sources.bronze import ARTICLE_SCHEMA

PageFetcher = Callable[[int], list[dict]]


@dataclass(frozen=True)
class FetchPolicy:
    """Mirrors the reference's constants (fetch_articles.py:13-15)."""

    max_retries: int = 3          # MAX_RETRIES
    backoff_base: float = 2.0     # sleep(2**attempt)
    rate_limit_s: float = 0.0     # SLEEP_DELAY (1.0 incremental / 0.5 backfill)


def fetch_pages_raw(
    spark: SparkSession,
    page_ids: list[int],
    fetcher: PageFetcher,
    policy: FetchPolicy = FetchPolicy(),
    parallelism: int | None = None,
) -> DataFrame:
    """(page, raw) rows: one JSON document string per article.

    Retry semantics per page match fetch_articles.py:62-76: up to
    ``max_retries`` attempts with ``backoff_base**attempt`` sleeps; an
    exhausted page yields no rows (the reference returns ``[]``).
    """
    ensure_query_session_conf(spark)
    if not page_ids:
        return spark.createDataFrame([], "page INT, raw STRING")
    n = parallelism or min(len(page_ids), spark.sparkContext.defaultParallelism)
    pages_df = spark.createDataFrame([(int(p),) for p in page_ids], "page INT").repartition(
        n, "page"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_page, out_raw = [], []
            for page in pdf["page"]:
                page = int(page)
                articles: list[dict] = []
                for attempt in range(policy.max_retries):
                    try:
                        articles = fetcher(page)
                        break
                    except Exception:
                        if attempt + 1 >= policy.max_retries:
                            articles = []  # abort page, keep pipeline alive
                        else:
                            time.sleep(policy.backoff_base ** (attempt + 1))
                for a in articles:
                    out_page.append(page)
                    out_raw.append(json.dumps(a))
                if policy.rate_limit_s:
                    time.sleep(policy.rate_limit_s)
            yield pd.DataFrame({"page": out_page, "raw": out_raw})

    return pages_df.mapInPandas(run, schema="page INT, raw STRING")


def parse_raw_articles(raw_df: DataFrame) -> DataFrame:
    """Raw JSON rows -> typed article columns + quarantine flag."""
    parsed = raw_df.withColumn(
        "article",
        F.from_json("raw", ARTICLE_SCHEMA, {"mode": "PERMISSIVE"}),
    )
    return parsed.select(
        "page",
        F.col("article.*"),
        F.col("article").isNull().alias("is_corrupt"),
    )


def http_fetcher(
    base_url: str,
    per_page: int = 300,
    timeout_s: float = 10.0,
    params: dict[str, str] | None = None,
    headers: dict[str, str] | None = None,
) -> PageFetcher:
    """Real paginated-HTTP endpoint fetcher, matching the reference's
    request loop (fetch_articles.py:58-76):

    - GET ``{base_url}?per_page=N&page=P`` (config fetch_articles.py:12-15);
    - 10 s timeout (``requests.get(..., timeout=10)``, :64);
    - HTTP >= 400 raises (``raise_for_status``, :65) so the retry/backoff
      policy in :func:`fetch_pages_raw` kicks in;
    - a body that fails to JSON-decode aborts the page — returns ``[]``
      without retrying (:73-75) — keeping the pipeline alive;
    - a non-list JSON body is treated the same as undecodable.

    stdlib ``urllib`` only — no third-party HTTP dependency.  The callable
    is pickled into executor tasks, so it closes over plain strings/ints.
    """
    import urllib.parse

    base_headers = {"User-Agent": "forem-etl-spark", **(headers or {})}
    extra_params = dict(params or {})

    def fetch(page: int) -> list[dict]:
        import urllib.request

        q = {"per_page": per_page, "page": page, **extra_params}
        url = f"{base_url}?{urllib.parse.urlencode(q)}"
        req = urllib.request.Request(url, headers=base_headers)
        # HTTPError (>=400) and URLError propagate: retried with backoff
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            body = resp.read()
        try:
            data = json.loads(body)
        except json.JSONDecodeError:
            return []  # malformed page payload: abort page, don't retry
        return data if isinstance(data, list) else []

    return fetch


def directory_fetcher(fixture_dir: str) -> PageFetcher:
    """Fixture endpoint: ``{dir}/page_{n}.json`` JSON-array files; a
    missing file is an empty page (end of pagination, F3)."""

    def fetch(page: int) -> list[dict]:
        try:
            with open(f"{fixture_dir}/page_{page}.json") as fh:
                return json.load(fh)
        except FileNotFoundError:
            return []

    return fetch


def flaky_fetcher(
    inner: PageFetcher, fail_first_attempts: int, fail_pages: set[int] | None = None
) -> PageFetcher:
    """Deterministic failure injector: raises on the first N attempts for
    the given pages (worker-local counter — retries happen in-process)."""
    attempts: dict[int, int] = {}

    def fetch(page: int) -> list[dict]:
        if fail_pages is None or page in fail_pages:
            seen = attempts.get(page, 0)
            attempts[page] = seen + 1
            if seen < fail_first_attempts:
                raise ConnectionError(f"injected failure {seen + 1} for page {page}")
        return inner(page)

    return fetch


def fetch_pages_with_dlq(
    spark: SparkSession,
    page_ids: list[int],
    fetcher: PageFetcher,
    policy: FetchPolicy = FetchPolicy(),
    parallelism: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Like :func:`fetch_pages_raw`, but exhausted pages are captured as
    DEAD-LETTER rows instead of vanishing — the operational upgrade over
    the reference's silent ``[]`` (fetch_articles.py:73-76): a nightly
    re-drive job replays the DLQ instead of a full backfill, and page
    loss is observable.

    Returns ``(data, dlq)``: data has (page, raw) as usual; dlq has
    (page, attempts, last_error).  Both derive from ONE fetch pass (the
    split is two filters over the same mapInPandas output, and Spark
    re-executes only the cheap scan, not the fetch, when both sides are
    consumed — callers that persist should checkpoint the combined frame
    first, as plans/incremental.py does with its page results)."""
    ensure_query_session_conf(spark)
    combined_schema = "page INT, raw STRING, attempts INT, last_error STRING"
    if not page_ids:
        empty = spark.createDataFrame([], combined_schema)
        return (
            empty.filter("last_error IS NULL").select("page", "raw"),
            empty.filter("last_error IS NOT NULL").select(
                "page", "attempts", "last_error"
            ),
        )
    n = parallelism or min(len(page_ids), spark.sparkContext.defaultParallelism)
    pages_df = spark.createDataFrame(
        [(int(p),) for p in page_ids], "page INT"
    ).repartition(n, "page")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for page in pdf["page"]:
                page = int(page)
                articles: list[dict] | None = None
                last_err = ""
                for attempt in range(policy.max_retries):
                    try:
                        articles = fetcher(page)
                        break
                    except Exception as ex:  # noqa: BLE001
                        last_err = f"{type(ex).__name__}: {ex}"[:500]
                        if attempt + 1 < policy.max_retries:
                            time.sleep(policy.backoff_base ** (attempt + 1))
                if articles is None:
                    rows.append((page, None, policy.max_retries, last_err))
                else:
                    rows.extend((page, json.dumps(a), None, None) for a in articles)
                if policy.rate_limit_s:
                    time.sleep(policy.rate_limit_s)
            yield pd.DataFrame(
                rows, columns=["page", "raw", "attempts", "last_error"]
            )

    combined = pages_df.mapInPandas(run, schema=combined_schema)
    data = combined.filter(F.col("last_error").isNull()).select("page", "raw")
    dlq = combined.filter(F.col("last_error").isNotNull()).select(
        "page", "attempts", "last_error"
    )
    return data, dlq
