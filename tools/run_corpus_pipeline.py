"""spark-submit entry point for the composed corpus-cleaning pipeline:
filter (quality + language + length + near-dup keeper) -> pack into
token-budget context windows -> parquet shards + lineage summary.

    spark-submit --py-files dist/v2_ocr_spark.zip \
        tools/run_corpus_pipeline.py \
        --input <dir containing documents.parquet> --out <dir> \
        [--budget 2048] [--min-quality 0.5] [--min-chars 100]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--min-chars", type=int, default=100)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from v2_ocr_spark.operators.corpus import run_clean_pipeline

    spark = SparkSession.builder.appName("v2-ocr-corpus-clean").getOrCreate()
    summary = run_clean_pipeline(
        spark, args.input, args.out,
        budget=args.budget,
        min_quality=args.min_quality,
        min_chars=args.min_chars,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
