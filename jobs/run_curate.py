"""spark-submit entry point for the corpus-curation pipeline.

Usage (local example; on a cluster swap --master and the paths):

    cd /root/repo && zip -qr /tmp/htmlparser2_spark.zip htmlparser2_spark
    spark-submit --master local[8] \
        --py-files /tmp/htmlparser2_spark.zip \
        jobs/run_curate.py \
        --input /root/testdata/sf0.001 --output /tmp/curate_out \
        --quality c4 --line-dedup-min-docs 2 \
        --fractions '{"en": 0.5, "de": 1.0}'

Reads documents.parquet under --input (or any parquet with the same
columns via --docs), runs plans/curate_job.run_curation
(quality gate -> optional line dedup -> exact+LSH dedup ->
optional decontamination -> optional stratified sample), writes the
curated corpus and the stage funnel as parquet under --output, and
prints the funnel as one JSON line.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", help="sf dir containing documents.parquet")
    parser.add_argument("--docs", help="existing documents parquet path")
    parser.add_argument("--output", required=True)
    parser.add_argument(
        "--quality", choices=("gopher", "c4"), default="gopher",
        help="per-document quality gate: Gopher rules or the C4 "
        "line/page rules",
    )
    parser.add_argument(
        "--line-dedup-min-docs", type=int, default=None,
        help="strip lines recurring across >= N documents before "
        "whole-document dedup",
    )
    parser.add_argument("--dedup-threshold", type=float, default=0.7)
    parser.add_argument(
        "--bench", help="benchmark parquet (doc_id, text) to "
        "decontaminate against",
    )
    parser.add_argument(
        "--contam-mode", choices=("exact", "bloom"), default="exact"
    )
    parser.add_argument(
        "--fractions",
        help='JSON strata->fraction map for the final sample, e.g. '
        '\'{"en": 0.5}\'',
    )
    parser.add_argument(
        "--temperature",
        help="ALPHA,TARGET_FRAC — mC4-style temperature rebalancing "
        "instead of --fractions (rare strata upsample as repeated "
        "rows with a copy column)",
    )
    parser.add_argument("--strata-col", default="lang")
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    from htmlparser2_spark.operators.quality import c4_page_pred
    from htmlparser2_spark.plans.curate_job import run_curation

    temperature = None
    if args.temperature:
        parts = args.temperature.split(",")
        if len(parts) != 2:
            raise SystemExit(
                f"--temperature wants ALPHA,TARGET_FRAC, got {args.temperature!r}"
            )
        temperature = (float(parts[0]), float(parts[1]))

    spark = SparkSession.builder.appName("htmlparser2-spark-curate").getOrCreate()
    if args.docs:
        docs = spark.read.parquet(args.docs)
    elif args.input:
        docs = spark.read.parquet(f"{args.input}/documents.parquet")
    else:
        raise SystemExit("one of --input / --docs is required")

    corpus, funnel = run_curation(
        docs,
        bench=spark.read.parquet(args.bench) if args.bench else None,
        quality_pred=c4_page_pred() if args.quality == "c4" else None,
        line_dedup_min_docs=args.line_dedup_min_docs,
        dedup_threshold=args.dedup_threshold,
        contam_mode=args.contam_mode,
        fractions=json.loads(args.fractions) if args.fractions else None,
        temperature=temperature,
        strata_col=args.strata_col,
    )
    corpus.write.mode("overwrite").parquet(f"{args.output}/corpus")
    funnel.write.mode("overwrite").parquet(f"{args.output}/funnel")
    rows = spark.read.parquet(f"{args.output}/funnel").orderBy("stage_idx")
    print(json.dumps({
        "funnel": [
            {"stage": r["stage"], "n_docs": r["n_docs"]}
            for r in rows.collect()
        ],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
