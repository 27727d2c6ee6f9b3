"""Native PySpark Python DataSource for the paginated article endpoint.

``sources/paginated.py`` expresses the reference's REST ingest
(fetch_articles.py:58-76) as an explicit mapInPandas pipeline; this module
re-expresses the same source through Spark 4's Python DataSource API, so a
consumer needs no engine-specific helper at all:

    spark.dataSource.register(ForemRestDataSource)
    df = (spark.read.format("forem_rest")
          .option("path", fixture_dir)          # or .option("url", ...)
          .option("max_pages", 15)
          .load())

Each page is one InputPartition, so Spark schedules fetches across
executors and a failed task re-fetches only its page (task retry on top
of the in-partition HTTP retry policy).  The page list is enumerated up
front — the reference's bounded micro-batch contract (SURVEY.md §2a L3:
15 pages/run); empty pages yield zero rows rather than terminating the
scan, and the incremental plan (plans/incremental.py) remains the place
where empty-page short-circuiting happens, because a DataSource reader
cannot see across partitions.
"""

from __future__ import annotations

import json
import time
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: Reference constants (fetch_articles.py:13-15).
DEFAULT_MAX_PAGES = 15
DEFAULT_MAX_RETRIES = 3
DEFAULT_BACKOFF_BASE = 2.0


class ForemRestDataSource(DataSource):
    """format("forem_rest"): raw paginated article rows (page, raw)."""

    @classmethod
    def name(cls) -> str:
        return "forem_rest"

    def schema(self) -> str:
        return "page int, raw string"

    def reader(self, schema) -> "ForemRestReader":
        return ForemRestReader(self.options)

    def simpleStreamReader(self, schema) -> "ForemRestStreamReader":
        return ForemRestStreamReader(self.options)


class ForemRestReader(DataSourceReader):
    """One InputPartition per page; fetch + retry runs inside the task.

    The reader keeps only picklable plain values (the DataSource contract:
    instances are serialized to executors), and builds its fetcher lazily
    inside ``read`` so no socket/file handle crosses the pickle boundary.
    """

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        self.url = options.get("url")
        if not self.path and not self.url:
            raise ValueError(
                "forem_rest: set .option('path', fixture_dir) or "
                ".option('url', endpoint)"
            )
        self.max_pages = int(options.get("max_pages", DEFAULT_MAX_PAGES))
        self.start_page = int(options.get("start_page", 1))
        self.per_page = int(options.get("per_page", 300))
        self.max_retries = int(options.get("max_retries", DEFAULT_MAX_RETRIES))
        self.backoff_base = float(
            options.get("backoff_base", DEFAULT_BACKOFF_BASE)
        )

    def partitions(self) -> list[InputPartition]:
        return [
            InputPartition(p)
            for p in range(self.start_page, self.start_page + self.max_pages)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        from azure_func_forem_data_etl_spark.sources.paginated import (
            directory_fetcher,
            http_fetcher,
        )

        page = partition.value
        fetcher = (
            directory_fetcher(self.path)
            if self.path
            else http_fetcher(self.url, per_page=self.per_page)
        )
        articles: list[dict] = []
        for attempt in range(self.max_retries):
            try:
                articles = fetcher(page)
                break
            except Exception:
                if attempt + 1 >= self.max_retries:
                    articles = []  # abort page, keep scan alive (S2)
                else:
                    time.sleep(self.backoff_base ** (attempt + 1))
        for a in articles:
            yield (page, json.dumps(a))


class ForemRestStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the source: the reference's page-cursor
    incremental mode (fetch_articles.py:41-55 state read/advance, SURVEY
    §2a S6/S7) with Spark's checkpoint as the cursor store.

    Offsets are ``{"page": next_unread_page}``.  Each micro-batch drains
    at most ``pages_per_batch`` pages (the reference's 15-page run bound,
    L3); a page returning zero rows ends the batch early so the cursor
    never advances past data that does not exist yet — the engine-side
    equivalent of the reference's empty-page break (F3).  Exactly-once
    comes from Spark replaying (start, end) deterministically:
    ``read`` is pure given the fixture/endpoint state at that cursor.
    """

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        self.url = options.get("url")
        if not self.path and not self.url:
            raise ValueError(
                "forem_rest stream: set .option('path', dir) or "
                ".option('url', endpoint)"
            )
        self.per_page = int(options.get("per_page", 300))
        self.pages_per_batch = int(
            options.get("pages_per_batch", DEFAULT_MAX_PAGES)
        )
        self.start_page = int(options.get("start_page", 1))

    def _fetcher(self):
        from azure_func_forem_data_etl_spark.sources.paginated import (
            directory_fetcher,
            http_fetcher,
        )

        if self.path:
            return directory_fetcher(self.path)
        return http_fetcher(self.url, per_page=self.per_page)

    def initialOffset(self) -> dict:
        return {"page": self.start_page}

    def read(self, start: dict):
        fetch = self._fetcher()
        page = int(start["page"])
        rows: list[tuple] = []
        for _ in range(self.pages_per_batch):
            articles = fetch(page)
            if not articles:  # F3: no data at the cursor yet — stop here
                break
            rows.extend((page, json.dumps(a)) for a in articles)
            page += 1
        return iter(rows), {"page": page}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Deterministic replay for recovery: re-fetch exactly [start, end).
        fetch = self._fetcher()
        for page in range(int(start["page"]), int(end["page"])):
            for a in fetch(page):
                yield (page, json.dumps(a))
