"""spark-submit entry point for the extraction pipeline.

Usage (local example; on a cluster swap --master and the paths):

    cd /root/repo && zip -qr /tmp/htmlparser2_spark.zip htmlparser2_spark
    spark-submit --master local[8] \
        --py-files /tmp/htmlparser2_spark.zip \
        jobs/run_extract.py \
        --input /root/testdata/sf0.001 --output /tmp/extract_out \
        --buckets 16

Reads documents.parquet under --input (or an existing pages parquet via
--pages), synthesizes/loads the pages table, runs the checkpoint-
resumable bucketed extraction, and prints a JSON summary. Rerunning with
the same --output resumes from the bucket manifest.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", help="sf dir containing documents.parquet")
    parser.add_argument("--pages", help="existing pages parquet path")
    parser.add_argument("--output", required=True)
    parser.add_argument("--buckets", type=int, default=16)
    parser.add_argument("--partitions", type=int, default=None)
    parser.add_argument(
        "--jumbo-bytes", type=int, default=None,
        help="isolate documents larger than this into their own partitions",
    )
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument(
        "--sniff-charset", action="store_true",
        help="decode input bytes via BOM + meta-prescan charset "
        "sniffing instead of assumed-UTF-8",
    )
    parser.add_argument(
        "--mode", choices=("text", "main", "markdown"), default="text",
        help="text = full textContent; main = readability-lite "
        "main-content selection (boilerplate strip); markdown = "
        "structure-keeping Markdown rendering",
    )
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    from htmlparser2_spark.plans.extract_job import run_extract
    from htmlparser2_spark.sources.pages import build_pages

    spark = SparkSession.builder.appName("htmlparser2-spark-extract").getOrCreate()
    if args.pages:
        pages = spark.read.parquet(args.pages)
    elif args.input:
        pages = build_pages(spark, args.input)
    else:
        raise SystemExit("one of --input / --pages is required")

    summary = run_extract(
        spark,
        pages,
        args.output,
        n_buckets=args.buckets,
        resume=not args.no_resume,
        n_partitions=args.partitions,
        jumbo_bytes=args.jumbo_bytes,
        mode=args.mode,
        sniff_charset=args.sniff_charset,
    )
    print(json.dumps({k: (v if not hasattr(v, "item") else v.item()) for k, v in summary.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
