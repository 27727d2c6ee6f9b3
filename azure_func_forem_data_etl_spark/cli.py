"""Thin job entry point — the reference's control plane, Spark-shaped.

Reference mapping (SURVEY.md §2a):
- C1 mode dispatch: ``BACKFILL_MODE`` env routing (function_app.py:9,21-26)
  → an explicit ``--mode`` argument selecting the pipeline;
- C2 top-level error barrier: log + HTTP 500 (function_app.py:20-29)
  → log + non-zero exit code;
- C3 eager connection init at import (fetch_articles.py:21-30)
  → the SparkSession (and its storage credentials) is built and validated
  first, before any pipeline logic runs.

Usage::

    python -m azure_func_forem_data_etl_spark.cli --mode incremental \
        --pages DIR --bronze DIR --state PATH
    python -m azure_func_forem_data_etl_spark.cli --mode backfill \
        --pages DIR --bronze DIR --state PATH
    python -m azure_func_forem_data_etl_spark.cli --mode silver \
        --landing DIR --silver DIR --checkpoint DIR
"""

from __future__ import annotations

import argparse
import logging
import sys

log = logging.getLogger("forem_etl")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="forem-etl-spark")
    p.add_argument(
        "--mode",
        required=True,
        choices=["incremental", "backfill", "silver"],
        help="pipeline to run (C1 mode dispatch)",
    )
    p.add_argument("--pages", help="fixture/page source directory")
    p.add_argument("--landing", help="landing dir of article blobs")
    p.add_argument("--bronze", help="bronze output directory")
    p.add_argument("--silver", help="silver output directory")
    p.add_argument("--state", help="state table path (watermark/cursor)")
    p.add_argument("--checkpoint", help="streaming checkpoint directory")
    p.add_argument("--max-pages", type=int, default=64)
    return p


def run(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        # C3: session (and storage credential) validation happens eagerly,
        # before any pipeline logic.
        from azure_func_forem_data_etl_spark.session import get_spark

        spark = get_spark(app_name=f"forem-etl-{args.mode}")

        if args.mode == "incremental":
            from azure_func_forem_data_etl_spark.plans.incremental import (
                run_incremental,
            )
            from azure_func_forem_data_etl_spark.sources.paginated import (
                directory_fetcher,
            )

            res = run_incremental(
                spark,
                directory_fetcher(args.pages),
                args.bronze,
                args.state,
                max_pages=args.max_pages,
            )
            log.info("incremental: %s", res)
        elif args.mode == "backfill":
            from azure_func_forem_data_etl_spark.plans.backfill import run_backfill
            from azure_func_forem_data_etl_spark.sources.paginated import (
                directory_fetcher,
            )

            res = run_backfill(
                spark, directory_fetcher(args.pages), args.bronze, args.state
            )
            log.info("backfill: %s", res)
        else:
            from azure_func_forem_data_etl_spark.streaming.silver import (
                run_streaming_silver,
            )

            n = run_streaming_silver(
                spark, args.landing, args.silver, args.checkpoint
            )
            log.info("silver: upserted %d rows", n)
        return 0
    except Exception:
        # C2: any failure -> logged, non-zero exit (the reference's HTTP 500)
        log.exception("pipeline failed")
        return 1


if __name__ == "__main__":
    sys.exit(run())
