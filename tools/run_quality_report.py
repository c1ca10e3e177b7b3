"""spark-submit entry point for the composed corpus quality report:
unigram-LM perplexity + duplicate-substring spans + boilerplate lines
as one per-document parquet ledger + summary.json.

    spark-submit --py-files dist/v2_ocr_spark.zip \
        tools/run_quality_report.py \
        --input <sf_dir_with_documents.parquet> --out <dir> \
        [--ref-source SRC] [--span-k 8] [--span-min-count 2] \
        [--boiler-min-docs 3]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ref-source", default=None)
    ap.add_argument("--span-k", type=int, default=8)
    ap.add_argument("--span-min-count", type=int, default=2)
    ap.add_argument("--boiler-min-docs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from v2_ocr_spark.pipeline.quality import corpus_quality_report

    spark = SparkSession.builder.appName("v2-ocr-quality-report").getOrCreate()
    summary = corpus_quality_report(
        spark,
        args.input,
        args.out,
        ref_source=args.ref_source,
        span_k=args.span_k,
        span_min_count=args.span_min_count,
        boiler_min_docs=args.boiler_min_docs,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
