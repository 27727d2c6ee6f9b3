"""Ingestion-core tests (SURVEY.md §5.2-5.3): watermark boundary semantics,
malformed-record quarantine, retry/backoff, cursor clamp, bounded backfill,
rerun idempotence, and the at-least-once crash window + silver dedup."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.plans.backfill import run_backfill
from azure_func_forem_data_etl_spark.plans.incremental import (
    compact_silver,
    run_incremental,
)
from azure_func_forem_data_etl_spark.sources.bronze import (
    parse_articles,
    quarantine_split,
    read_bronze_json,
)
from azure_func_forem_data_etl_spark.sources.paginated import (
    FetchPolicy,
    directory_fetcher,
    fetch_pages_raw,
    flaky_fetcher,
    parse_raw_articles,
)
from azure_func_forem_data_etl_spark.sources.state import (
    load_cursor,
    load_watermark,
    save_cursor,
    save_watermark,
)
from tests.fixtures import make_article, ts, write_pages

FAST = FetchPolicy(max_retries=3, backoff_base=0.001)


# --------------------------------------------------------------------------
# bronze reader


def test_bronze_multiline_array_with_quarantine(spark, tmp_path):
    # a reference-format blob: pretty-printed JSON array
    arts = [
        make_article(1, ts(10)),
        make_article(2, None),               # missing published_at
        make_article(3, "not-a-timestamp"),  # malformed
    ]
    p = tmp_path / "2024-03-10"
    p.mkdir()
    (p / "page=1_x.json").write_text(json.dumps(arts, indent=2))
    bronze = read_bronze_json(spark, str(p), multi_line=True)
    clean, bad = quarantine_split(parse_articles(bronze))
    assert {r.id for r in clean.collect()} == {1}
    assert {r.id for r in bad.collect()} == {2, 3}


def test_bronze_z_suffix_parses_utc(spark, tmp_path):
    (tmp_path / "a.json").write_text(json.dumps([make_article(1, "2024-03-10T12:30:00Z")]))
    bronze = read_bronze_json(spark, str(tmp_path / "a.json"), multi_line=True)
    row = parse_articles(bronze).select("published_at_ts").collect()[0]
    assert row.published_at_ts == dt.datetime(2024, 3, 10, 12, 30)


# --------------------------------------------------------------------------
# paginated source


def test_fetch_pages_parallel_and_empty_termination(spark, tmp_path):
    write_pages(tmp_path, [[make_article(i, ts(1)) for i in range(5)], []])
    raw = fetch_pages_raw(spark, [1, 2, 3], directory_fetcher(str(tmp_path)), FAST)
    rows = raw.collect()
    assert len(rows) == 5  # pages 2,3 empty/missing contribute nothing
    parsed = parse_raw_articles(raw)
    assert parsed.filter(~F.col("is_corrupt")).count() == 5


def test_fetch_retry_succeeds_after_backoff(spark, tmp_path):
    write_pages(tmp_path, [[make_article(1, ts(1))]])
    f = flaky_fetcher(directory_fetcher(str(tmp_path)), fail_first_attempts=2)
    raw = fetch_pages_raw(spark, [1], f, FAST, parallelism=1)
    assert raw.count() == 1  # third attempt (max_retries=3) succeeds


def test_fetch_aborts_page_after_max_retries(spark, tmp_path):
    write_pages(tmp_path, [[make_article(1, ts(1))], [make_article(2, ts(1))]])
    f = flaky_fetcher(directory_fetcher(str(tmp_path)), fail_first_attempts=5, fail_pages={1})
    raw = fetch_pages_raw(spark, [1, 2], f, FAST, parallelism=1)
    rows = raw.collect()
    assert len(rows) == 1  # page 1 aborted to [], page 2 delivered
    assert json.loads(rows[0].raw)["id"] == 2


# --------------------------------------------------------------------------
# state


def test_watermark_roundtrip_and_cold_start(spark, tmp_path):
    path = str(tmp_path / "wm")
    assert load_watermark(spark, path) is None          # missing => cold start
    save_watermark(spark, path, None)                   # no-op
    assert load_watermark(spark, path) is None
    wm = dt.datetime(2024, 3, 15, 12, 0)
    save_watermark(spark, path, wm)
    assert load_watermark(spark, path) == wm


def test_cursor_default_and_clamp(spark, tmp_path):
    path = str(tmp_path / "cur")
    assert load_cursor(spark, path) == 1                # missing => 1
    save_cursor(spark, path, 0)                         # falsy => no-op
    assert load_cursor(spark, path) == 1
    save_cursor(spark, path, -5)
    assert load_cursor(spark, path) == 1
    save_cursor(spark, path, 7)
    assert load_cursor(spark, path) == 7


# --------------------------------------------------------------------------
# incremental pipeline


@pytest.fixture()
def incremental_fixture(tmp_path):
    """3 pages newest-first (like /api/articles/latest), 4 articles each."""
    pages = []
    i = 0
    for day in (20, 19, 18):
        pages.append([make_article(100 + i + j, ts(day, hour=12 - j)) for j in range(4)])
        i += 4
    write_pages(tmp_path / "api", pages)
    return tmp_path


def test_incremental_cold_start_ingests_all(spark, incremental_fixture):
    base = incremental_fixture
    res = run_incremental(
        spark,
        directory_fetcher(str(base / "api")),
        str(base / "bronze"),
        str(base / "wm"),
        FAST,
        chunk_pages=2,
    )
    assert res.n_ingested == 12
    assert res.watermark == dt.datetime(2024, 3, 20, 12, 0)
    assert load_watermark(spark, str(base / "wm")) == res.watermark


def test_incremental_second_run_is_noop_and_keeps_watermark(spark, incremental_fixture):
    base = incremental_fixture
    args = (
        spark,
        directory_fetcher(str(base / "api")),
        str(base / "bronze"),
        str(base / "wm"),
        FAST,
    )
    first = run_incremental(*args, chunk_pages=2)
    second = run_incremental(*args, chunk_pages=2)
    assert second.n_ingested == 0
    assert second.watermark == first.watermark  # L2: state untouched
    bronze = spark.read.json(str(base / "bronze"))
    assert bronze.count() == 12  # no duplicate ingestion


def test_incremental_strict_watermark_boundary(spark, tmp_path):
    """Reference uses strict > (fetch_articles.py:102): a row exactly AT
    the watermark must NOT be re-ingested."""
    write_pages(tmp_path / "api", [[make_article(1, ts(15, 12)), make_article(2, ts(15, 11))]])
    wm_path = str(tmp_path / "wm")
    save_watermark(spark, wm_path, dt.datetime(2024, 3, 15, 12, 0))
    res = run_incremental(
        spark,
        directory_fetcher(str(tmp_path / "api")),
        str(tmp_path / "bronze"),
        wm_path,
        FAST,
    )
    assert res.n_ingested == 0


def test_incremental_quarantines_malformed(spark, tmp_path):
    write_pages(
        tmp_path / "api",
        [[make_article(1, ts(10)), make_article(2, None), make_article(3, "garbage")]],
    )
    res = run_incremental(
        spark,
        directory_fetcher(str(tmp_path / "api")),
        str(tmp_path / "bronze"),
        str(tmp_path / "wm"),
        FAST,
    )
    assert res.n_ingested == 1
    assert res.n_quarantined == 2


def test_at_least_once_replay_deduped_in_silver(spark, tmp_path):
    """Crash window §4.3: data written, watermark write lost => next run
    re-ingests; silver dedups by id."""
    write_pages(tmp_path / "api", [[make_article(i, ts(12, 6 - i)) for i in range(3)]])
    fetcher = directory_fetcher(str(tmp_path / "api"))
    bronze, wm = str(tmp_path / "bronze"), str(tmp_path / "wm")
    run_incremental(spark, fetcher, bronze, wm, FAST)
    # simulate the crash: lose the watermark (data already committed)
    import shutil

    shutil.rmtree(wm)
    run_incremental(spark, fetcher, bronze, wm, FAST)
    assert spark.read.json(bronze).count() == 6  # bronze holds the replay
    n = compact_silver(spark, bronze, str(tmp_path / "silver"))
    assert n == 3  # silver is exactly-once by id
    silver = spark.read.parquet(str(tmp_path / "silver"))
    assert silver.select("id").distinct().count() == 3


# --------------------------------------------------------------------------
# backfill pipeline


def test_backfill_bounded_run_and_cursor_advance(spark, tmp_path):
    write_pages(tmp_path / "api", [[make_article(100 * p + j, ts(5)) for j in range(3)] for p in range(20)])
    args = (
        spark,
        directory_fetcher(str(tmp_path / "api")),
        str(tmp_path / "bronze"),
        str(tmp_path / "cur"),
        FAST,
    )
    r1 = run_backfill(*args)
    assert (r1.first_page, r1.next_page, r1.n_ingested) == (1, 16, 45)  # 15 pages x 3
    r2 = run_backfill(*args)
    assert r2.first_page == 16
    assert r2.n_ingested == 15  # pages 16-20 exist (5 x 3), 21+ empty
    assert r2.exhausted
    assert r2.next_page == 21
    assert spark.read.json(str(tmp_path / "bronze")).count() == 60


def test_backfill_discards_pages_after_first_empty(spark, tmp_path):
    """Sequential reference stops at the first empty page; parallel fetch
    must not ingest later pages even if they have data."""
    write_pages(tmp_path / "api", [[make_article(1, ts(5))], []])
    write_pages(tmp_path / "api", [[make_article(99, ts(5))]], start_page=5)  # orphan after gap
    r = run_backfill(
        spark,
        directory_fetcher(str(tmp_path / "api")),
        str(tmp_path / "bronze"),
        str(tmp_path / "cur"),
        FAST,
    )
    assert r.n_ingested == 1
    assert r.next_page == 2
    ids = [json.loads(row.raw)["id"] for row in spark.read.json(str(tmp_path / "bronze")).select("raw").collect()]
    assert ids == [1]


# --------------------------------------------------------------------------
# real HTTP fetcher against a local fixture server (S1-S3 end-to-end)


@pytest.fixture(scope="module")
def http_server():
    """Local paginated-API fixture: /articles?per_page=&page= serves JSON
    pages; page 2 fails with HTTP 500 on its first two hits (retry path);
    page 3 returns malformed JSON (decode-abort path); page >= 4 is 404."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    hits: dict[int, int] = {}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            page = int(q.get("page", ["1"])[0])
            hits[page] = hits.get(page, 0) + 1
            if page == 2 and hits[page] <= 2:
                self.send_response(500)
                self.end_headers()
                return
            if page == 3:
                body = b"{not valid json"
            elif page >= 4:
                self.send_response(404)
                self.end_headers()
                return
            else:
                arts = [make_article(page * 10 + i, ts(page * 10 + i)) for i in range(3)]
                body = json.dumps(arts).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/articles", hits
    srv.shutdown()


def test_http_fetcher_happy_path_and_params(http_server):
    from azure_func_forem_data_etl_spark.sources.paginated import http_fetcher

    url, _ = http_server
    fetch = http_fetcher(url, per_page=3)
    arts = fetch(1)
    assert [a["id"] for a in arts] == [10, 11, 12]


def test_http_fetcher_retries_through_spark_pipeline(spark, http_server):
    """HTTP 500s on page 2 are retried by fetch_pages_raw's policy; the
    malformed page 3 aborts without retry; 404 pages exhaust retries and
    yield no rows — all through the real executor-side code path."""
    from azure_func_forem_data_etl_spark.sources.paginated import http_fetcher

    url, hits = http_server
    hits.clear()
    fetch = http_fetcher(url, per_page=3)
    raw = fetch_pages_raw(spark, [1, 2, 3, 4], fetch, FAST)
    rows = raw.collect()
    pages = {r.page for r in rows}
    assert pages == {1, 2}           # page 3 decode-abort, page 4 404-exhausted
    assert len(rows) == 6            # 3 articles per good page
    assert hits[2] == 3              # two 500s + one success
    assert hits[3] == 1              # decode abort does NOT retry
    assert hits[4] == FAST.max_retries  # 404 retried to exhaustion


def test_http_fetcher_404_returns_no_rows(http_server):
    import urllib.error

    from azure_func_forem_data_etl_spark.sources.paginated import http_fetcher

    url, _ = http_server
    fetch = http_fetcher(url)
    with pytest.raises(urllib.error.HTTPError):
        fetch(99)  # raises so the policy layer can retry/abort


def test_native_datasource_matches_mapinpandas_path(spark, tmp_path):
    """The forem_rest Python DataSource returns the same rows as the
    mapInPandas fetch path, parses through the article schema, and
    tolerates empty/missing pages (zero rows, no failure)."""
    from tests.fixtures import make_article, write_pages

    from azure_func_forem_data_etl_spark.sources.datasource import (
        ForemRestDataSource,
    )
    from azure_func_forem_data_etl_spark.sources.paginated import (
        FetchPolicy,
        directory_fetcher,
        fetch_pages_raw,
        parse_raw_articles,
    )

    write_pages(
        tmp_path,
        [
            [make_article(1, "2024-01-01T00:00:00Z"),
             make_article(2, "2024-01-02T00:00:00Z")],
            [make_article(3, "2024-01-03T00:00:00Z")],
        ],
    )
    spark.dataSource.register(ForemRestDataSource)
    native = (
        spark.read.format("forem_rest")
        .option("path", str(tmp_path))
        .option("max_pages", 5)  # pages 3-5 are missing -> empty, not fatal
        .load()
    )
    classic = fetch_pages_raw(
        spark, [1, 2, 3, 4, 5], directory_fetcher(str(tmp_path)),
        FetchPolicy(max_retries=1, backoff_base=0.0),
    )
    n_rows = native.count()
    assert n_rows == classic.count() == 3
    assert sorted(r["raw"] for r in native.collect()) == sorted(
        r["raw"] for r in classic.collect()
    )
    parsed = parse_raw_articles(native)
    assert parsed.filter("is_corrupt").count() == 0
    assert {r["id"] for r in parsed.select("id").collect()} == {1, 2, 3}


def test_native_datasource_streaming_cursor(spark, tmp_path):
    """The forem_rest streaming reader drains pages as micro-batches with
    the cursor held in checkpoint offsets: a first run reads pages 1-2 and
    stops at the empty page 3; after page 3 appears, a restart from the
    SAME checkpoint reads only page 3 (no re-read, no skip)."""
    from tests.fixtures import make_article, write_pages

    from azure_func_forem_data_etl_spark.sources.datasource import (
        ForemRestDataSource,
    )

    spark.dataSource.register(ForemRestDataSource)
    fixture = tmp_path / "pages"
    fixture.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    write_pages(
        fixture,
        [
            [make_article(1, "2024-01-01T00:00:00Z")],
            [make_article(2, "2024-01-02T00:00:00Z"),
             make_article(3, "2024-01-03T00:00:00Z")],
        ],
    )

    def drain():
        q = (
            spark.readStream.format("forem_rest")
            .option("path", str(fixture))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = spark.read.parquet(out)
    assert first.count() == 3
    assert {r["page"] for r in first.select("page").collect()} == {1, 2}

    write_pages(fixture, [[make_article(4, "2024-01-04T00:00:00Z")]],
                start_page=3)
    drain()
    second = spark.read.parquet(out)
    assert second.count() == 4  # page 3 arrived once, pages 1-2 not re-read
    assert second.filter("page = 3").count() == 1


def test_multiformat_roundtrip_orc_csv_json(spark, tmp_path):
    """Source-format breadth: the same events slice written as ORC, CSV,
    and line-delimited JSON reads back value-identical to the parquet
    original (schemas pinned on read — CSV/JSON would otherwise infer
    lossy types)."""
    from azure_func_forem_data_etl_spark.sources.tables import table

    src = (
        table(spark, "/root/testdata/sf0.001", "events")
        .filter(F.col("event_id") < 200)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    want = {tuple(map(str, r)) for r in src.collect()}
    schema = src.schema

    orc_d, csv_d, json_d = (str(tmp_path / n) for n in ("orc", "csv", "json"))
    src.write.orc(orc_d)
    src.write.option("header", True).option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).csv(csv_d)
    src.write.option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).json(json_d)

    orc_back = spark.read.schema(schema).orc(orc_d)
    csv_back = (
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .csv(csv_d)
    )
    json_back = (
        spark.read.schema(schema)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(json_d)
    )
    for name, df in [("orc", orc_back), ("csv", csv_back), ("json", json_back)]:
        got = {tuple(map(str, r)) for r in df.collect()}
        assert got == want, f"{name} roundtrip diverged"


def test_schema_evolution_mergeschema_read(spark, tmp_path):
    """Schema evolution: a silver dir whose later files carry an extra
    column must read whole under mergeSchema with NULLs backfilled for
    old files — the additive-evolution contract a long-lived ingest
    (reference parity: articles gain fields over time) depends on."""
    d = str(tmp_path / "silver")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(d + "/batch=1")
    spark.createDataFrame(
        [(3, "c", 30.0)], "id long, name string, score double"
    ).write.parquet(d + "/batch=2")
    got = spark.read.option("mergeSchema", True).parquet(d)
    assert set(got.columns) == {"id", "name", "score", "batch"}
    rows = {r.id: r for r in got.collect()}
    assert rows[1].score is None and rows[3].score == 30.0
    # without mergeSchema the first-listed footer wins — document that the
    # explicit option is what makes evolution safe
    narrow = spark.read.parquet(d)
    assert set(narrow.columns) <= {"id", "name", "score", "batch"}


def test_fetch_dlq_captures_exhausted_pages(spark):
    """fetch_pages_with_dlq: good pages land as data rows, a page that
    fails every retry lands in the DLQ with its last error — nothing is
    silently dropped (reference drops it: fetch_articles.py:73-76)."""
    from azure_func_forem_data_etl_spark.sources.paginated import (
        FetchPolicy,
        fetch_pages_with_dlq,
    )

    def fetcher(page: int) -> list[dict]:
        if page == 3:
            raise RuntimeError("boom on page 3")
        return [{"id": page * 10, "title": f"t{page}"}]

    data, dlq = fetch_pages_with_dlq(
        spark,
        [1, 2, 3, 4],
        fetcher,
        FetchPolicy(max_retries=2, backoff_base=0.0),
    )
    got_pages = sorted(r.page for r in data.collect())
    assert got_pages == [1, 2, 4]
    dead = dlq.collect()
    assert len(dead) == 1
    assert dead[0].page == 3 and dead[0].attempts == 2
    assert "boom on page 3" in dead[0].last_error


def test_bronze_compaction_preserves_rows_and_shrinks_files(spark, incremental_fixture):
    """Compaction: run the real incremental ingest (many files per
    partition), compact one partition, and verify byte-identical rows,
    fewer files, and idempotence (a second run is a no-op)."""
    import datetime as dt

    from azure_func_forem_data_etl_spark.plans.compaction import (
        compact_bronze_partition,
    )
    from azure_func_forem_data_etl_spark.sources.bronze import BRONZE_SCHEMA

    base = incremental_fixture
    run_incremental(
        spark,
        directory_fetcher(str(base / "api")),
        str(base / "bronze"),
        str(base / "wm"),
        FAST,
        chunk_pages=1,  # one write per page -> many files
    )
    bronze = str(base / "bronze")
    day = dt.date.today().isoformat()
    part = f"{bronze}/ingest_date={day}"
    before = spark.read.schema(BRONZE_SCHEMA).json(part)
    want = sorted(map(str, before.collect()))

    stats = compact_bronze_partition(spark, bronze, day, target_records_per_file=1000)
    assert stats["compacted"] and stats["files_after"] < stats["files_before"]
    after = spark.read.schema(BRONZE_SCHEMA).json(part)
    assert sorted(map(str, after.collect())) == want

    stats2 = compact_bronze_partition(spark, bronze, day)
    assert not stats2["compacted"]  # single file already: no-op


def test_xml_roundtrip(spark, tmp_path):
    """Spark 4 ships a native XML source: the same events slice written as
    XML reads back value-identical (schema pinned on read; timestamps
    carried in an explicit format so the roundtrip is lossless)."""
    from azure_func_forem_data_etl_spark.sources.tables import table

    src = (
        table(spark, "/root/testdata/sf0.001", "events")
        .filter(F.col("event_id") < 200)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    want = {tuple(map(str, r)) for r in src.collect()}
    xml_d = str(tmp_path / "xml")
    src.write.format("xml").option("rootTag", "events").option(
        "rowTag", "event"
    ).option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").save(xml_d)
    back = (
        spark.read.schema(src.schema)
        .format("xml")
        .option("rowTag", "event")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .load(xml_d)
    )
    got = {tuple(map(str, r)) for r in back.collect()}
    assert got == want


def test_file_provenance_metadata_column(spark, tmp_path):
    """The engine exposes per-row file provenance via the hidden
    `_metadata` struct — the audit column a lakehouse ingest stamps into
    silver so every row can be traced to its source file (the engine-side
    version of the reference logging which page a record came from)."""
    d = str(tmp_path / "multi")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(d + "/p1")
    spark.createDataFrame([(2, "b")], "id long, v string").write.parquet(d + "/p2")
    df = (
        spark.read.parquet(d + "/p1", d + "/p2")
        .select("id", F.col("_metadata.file_name").alias("src_file"))
    )
    rows = {r.id: r.src_file for r in df.collect()}
    assert rows[1] != rows[2]
    assert all(f.endswith(".parquet") for f in rows.values())
    # provenance survives a silver rewrite when materialized as a column
    silver = str(tmp_path / "silver")
    spark.read.parquet(d + "/p1").select(
        "id", "v", F.col("_metadata.file_name").alias("src_file")
    ).write.parquet(silver)
    back = spark.read.parquet(silver)
    assert back.columns == ["id", "v", "src_file"]
    assert back.first().src_file == rows[1]
