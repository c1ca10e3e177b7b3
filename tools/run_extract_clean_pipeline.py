"""spark-submit entry point for the composed flagship pipeline:
resumable transcript extraction -> conversation assembly -> corpus
cleaning -> token packing in one job.

    spark-submit --py-files dist/v2_ocr_spark.zip \
        tools/run_extract_clean_pipeline.py \
        --input <transcripts.parquet> --out <dir> \
        [--partitions 32] [--budget 2048] [--min-quality 0.5] \
        [--min-chars 100] [--dedup-threshold 0.5] \
        [--shingle-n 3] [--max-df N] \
        [--dedup-method ngram|minhash] [--incremental]

--max-df is the ngram path's boilerplate-shingle skew cap (the
production knob at scale — shingles shared by more than N docs leave
both the intersection and the union, see ngram_jaccard_pairs_for);
unset means exact Jaccard over the full shingle universe.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--min-chars", type=int, default=100)
    ap.add_argument("--dedup-threshold", type=float, default=0.5)
    ap.add_argument("--shingle-n", type=int, default=3)
    ap.add_argument("--max-df", type=int, default=None)
    ap.add_argument(
        "--dedup-method", choices=["ngram", "minhash"], default="ngram"
    )
    ap.add_argument("--incremental", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from v2_ocr_spark.pipeline.compose import run_extract_clean_pipeline

    spark = SparkSession.builder.appName("v2-ocr-extract-clean").getOrCreate()
    summary = run_extract_clean_pipeline(
        spark, args.input, args.out,
        num_partitions=args.partitions,
        budget=args.budget,
        min_quality=args.min_quality,
        min_chars=args.min_chars,
        dedup_threshold=args.dedup_threshold,
        shingle_n=args.shingle_n,
        max_df=args.max_df,
        dedup_method=args.dedup_method,
        incremental=args.incremental,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
