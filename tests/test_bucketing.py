"""Bucketed layout: conv_id joins must be exchange-free when both
sides share the bucketing — the storage-co-location contract that keeps
conv-keyed joins shuffle-less at 100 TB."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from v2_ocr_spark.pipeline.bucketing import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small):
    t = spark.read.parquet(f"{sf_small}/transcripts.parquet")
    c = spark.read.parquet(f"{sf_small}/conversations.parquet")
    write_bucketed(t, "test_t_bucketed", buckets=8)
    write_bucketed(c, "test_c_bucketed", buckets=8, sort_by=())
    yield "test_t_bucketed", "test_c_bucketed"
    spark.sql("DROP TABLE IF EXISTS test_t_bucketed")
    spark.sql("DROP TABLE IF EXISTS test_c_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the test observes bucketing, not dim size
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, left, right).select(
            "conv_id", "turn_idx", "status"
        )
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p
        assert p.count("Bucketed: true") == 2
        assert "SelectedBucketsCount: 8 out of 8" in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_small, bucketed_tables):
    left, right = bucketed_tables
    got = (
        colocated_join(spark, left, right)
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .orderBy("status")
        .collect()
    )
    t = spark.read.parquet(f"{sf_small}/transcripts.parquet")
    c = spark.read.parquet(f"{sf_small}/conversations.parquet")
    want = (
        t.join(c, "conv_id")
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .orderBy("status")
        .collect()
    )
    assert got == want


def test_bucket_files_are_turn_sorted(spark, bucketed_tables):
    """sortBy(turn_idx) holds within each (bucket file, conv_id) — W1
    at rest without a sort at read time."""
    left, _ = bucketed_tables
    df = spark.table(left).select(
        "conv_id", "turn_idx", F.input_file_name().alias("f")
    )
    w_bad = (
        df.groupBy("f", "conv_id")
        .agg(
            F.count("*").alias("n"),
            F.size(
                F.filter(
                    F.zip_with(
                        F.sort_array(F.collect_list("turn_idx")),
                        F.collect_list("turn_idx"),
                        lambda a, b: a == b,
                    ),
                    lambda ok: ~ok,
                )
            ).alias("misordered"),
        )
        .where(F.col("misordered") > 0)
        .count()
    )
    assert w_bad == 0
