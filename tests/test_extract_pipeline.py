"""End-to-end per-turn equality (SURVEY.md §5.2 item 3): the Spark
mapInPandas pipeline must reproduce the pregenerated expected table
byte-for-byte on every turn, never dropping rows (P10)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from v2_ocr_spark.operators.extract import extract_pandas, extract_turns


@pytest.fixture(scope="module")
def extracted(spark, sf_small):
    df = spark.read.parquet(f"{sf_small}/transcripts.parquet")
    out = extract_turns(df).persist()
    out.count()
    yield out
    out.unpersist()


def test_row_count_preserved(spark, sf_small, extracted):
    n_in = spark.read.parquet(f"{sf_small}/transcripts.parquet").count()
    assert extracted.count() == n_in


def test_no_duplicate_keys(extracted):
    dups = (
        extracted.groupBy("conv_id", "turn_idx")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dups == 0


def test_per_turn_byte_equality(spark, sf_small, extracted):
    expected = spark.read.parquet(f"{sf_small}/transcripts_expected.parquet")
    joined = extracted.join(expected, ["conv_id", "turn_idx"], "full_outer")
    mismatches = joined.where(
        F.col("extracted_text").isNull()
        | F.col("expected_text").isNull()
        | (F.col("extracted_text") != F.col("expected_text"))
    )
    bad = mismatches.limit(5).collect()
    assert not bad, f"first mismatches: {bad}"


def test_spans_equality(spark, sf_small, extracted):
    expected = spark.read.parquet(f"{sf_small}/transcripts_expected.parquet")
    joined = extracted.join(expected, ["conv_id", "turn_idx"], "inner")
    mism = joined.where(
        F.to_json(F.col("spans")) != F.to_json(F.col("expected_spans"))
    )
    bad = mism.limit(5).collect()
    assert not bad, f"span mismatches: {bad}"


def test_no_error_rows_on_clean_input(extracted):
    assert extracted.where(F.col("error").isNotNull()).count() == 0


def test_matches_pure_pandas_reference(spark, sf_small, extracted):
    """The Spark run equals a driver-side pandas run of the same kernels."""
    pdf = spark.read.parquet(f"{sf_small}/transcripts.parquet").toPandas()
    ref = extract_pandas(pdf)[["conv_id", "turn_idx", "extracted_text"]]
    got = (
        extracted.select("conv_id", "turn_idx", "extracted_text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    ref = ref.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got.equals(ref)


def test_metrics_columns(spark, sf_small):
    df = spark.read.parquet(f"{sf_small}/transcripts.parquet").limit(500)
    out = extract_turns(df, with_metrics=True)
    row = out.agg(
        F.sum("chars_in").alias("ci"),
        F.sum("chars_out").alias("co"),
        F.min("proc_us").alias("p"),
    ).collect()[0]
    assert row.ci > 0 and row.co > 0 and row.p >= 0


def test_stable_ordering_under_repartition(spark, sf_small):
    """W1: ordering comes from turn_idx, not from physical layout —
    shuffling the input does not change the per-conv ordered output."""
    df = spark.read.parquet(f"{sf_small}/transcripts.parquet")
    a = (
        extract_turns(df)
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "extracted_text")
        .toPandas()
    )
    b = (
        extract_turns(df.repartition(16))
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "extracted_text")
        .toPandas()
    )
    assert a.equals(b)
