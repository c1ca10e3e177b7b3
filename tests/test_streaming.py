"""Structured Streaming extraction: backlog processed exactly-once,
output equals the batch pipeline's, restart adds nothing new."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from v2_ocr_spark.operators.extract import extract_turns
from v2_ocr_spark.streaming import stream_extract


def test_stream_extract_equals_batch(spark, sf_small, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    shutil.copytree(sf_small, src, ignore=shutil.ignore_patterns(
        "conversations*", "transcripts_expected*"))

    q = stream_extract(spark, src, out, ckpt)
    q.awaitTermination(300)

    got = (
        spark.read.parquet(out)
        .select("conv_id", "turn_idx", "extracted_text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    batch = (
        extract_turns(spark.read.parquet(f"{sf_small}/transcripts.parquet"))
        .select("conv_id", "turn_idx", "extracted_text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert got.equals(batch)

    # restart over the same backlog: the source commit log skips
    # processed files — no duplicates (exactly-once resume)
    q2 = stream_extract(spark, src, out, ckpt)
    q2.awaitTermination(300)
    n = spark.read.parquet(out).count()
    assert n == len(batch)
    dups = (
        spark.read.parquet(out)
        .groupBy("conv_id", "turn_idx")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dups == 0
