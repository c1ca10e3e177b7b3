"""Pins for the expected-parquet oracle twins (fixtures/oracle_expected).

The twins are INDEPENDENT pure-Python reimplementations of the three
engine-hash operators (winnowing fingerprints, simhash, dHash) — these
tests prove twin == Spark operator on adversarial micro-corpora, pin
the pure-Python xxHash64 against Spark's JVM implementation across all
tail-length classes, and fail loudly if the driver's testdata ever
drifts from the generated expectations (freshness signature).
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from v2_ocr_spark.fixtures import oracle_expected as oe
from v2_ocr_spark.kernels.xxh import xxh64_str

ORACLE_DIR = os.path.join(
    os.environ.get("V2OCR_DATA_DIR", "/root/repo/data"), "oracle"
)

# every XXH64 code-path class: empty, <4, exactly 4, 4-7, exactly 8,
# 8-31, 31/32/33 boundary, >32, multi-byte UTF-8
XXH_TOKENS = [
    "", "a", "abc", "abcd", "abcdefg", "abcdefgh", "0123456789",
    "x" * 31, "y" * 32, "z" * 33, "w" * 100,
    "naïve", "日本語テスト", "mixed-ascii-日本語-padding-to-exceed-32-bytes",
]


def test_xxh64_matches_spark(spark):
    df = spark.createDataFrame([(t,) for t in XXH_TOKENS], "tok string")
    got = {
        r["tok"]: r["h"]
        for r in df.select("tok", F.xxhash64("tok").alias("h")).collect()
    }
    for t in XXH_TOKENS:
        assert xxh64_str(t) == got[t], f"xxh64 mismatch for {t!r}"


MICRO_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, ""),  # empty text: one empty token (split keeps it)
    (4, "solo"),
    (5, "a b"),  # fewer tokens than a shingle
    (6, "répétition unicode日本語 tokens répétition unicode日本語 tokens x"),
    (7, None),  # NULL text: DROPPED by simhash/dhash, kept by winnowing
    (8, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15"),
]


def _micro_df(spark):
    return spark.createDataFrame(MICRO_DOCS, "doc_id long, text string")


def test_simhash_twin_equals_operator(spark):
    from v2_ocr_spark.operators.dedup import simhash_64

    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash_64(_micro_df(spark)).collect()
    }
    exp = {
        doc_id: oe.simhash64(text)
        for doc_id, text in MICRO_DOCS
        if text is not None
    }
    assert got == exp  # includes the NULL-drop policy (doc 7 absent)


def test_dhash_twin_equals_operator(spark):
    from v2_ocr_spark.operators.multimodal import image_dhash, with_fake_image

    # NULL text would make the fake image NULL (concat of NULL) and the
    # decoder would crash — the fixture documents table has no NULLs,
    # and with_fake_image's contract is non-null text
    docs = _micro_df(spark).where(F.col("text").isNotNull())
    got = {
        r["doc_id"]: r["dhash"]
        for r in image_dhash(with_fake_image(docs)).collect()
    }
    exp = {
        doc_id: h
        for doc_id, text in MICRO_DOCS
        if text is not None and (h := oe.dhash64(text)) is not None
    }
    assert got == exp  # includes the <2-pixel drop (docs 3 absent)


def test_winnow_twin_equals_kernel(spark, tmp_path):
    from v2_ocr_spark.operators.textstats import rolling_fingerprint_set

    p = str(tmp_path / "documents.parquet")
    _micro_df(spark).coalesce(1).write.parquet(p)
    # the operator reads {sf_dir}/documents.parquet
    got = {
        r["doc_id"]: list(r["fingerprint_set"])
        for r in rolling_fingerprint_set(spark, str(tmp_path)).collect()
    }
    exp = {
        doc_id: oe.winnow_fingerprints(text) for doc_id, text in MICRO_DOCS
    }
    assert got == exp


def test_rolling_fingerprint_gate_surface_is_scalar(spark):
    """The r3 driver failure: the gate query must never expose an
    array column (the driver's canonicalizer sorts every column)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from v2_ocr_spark.operators.textstats import rolling_fingerprint

    out = rolling_fingerprint(spark, "/root/testdata/sf0.001")
    for f in out.schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType))
    row = out.where(F.col("doc_id") == 0).collect()
    assert len(row) == 1 and row[0]["n_fps"] >= 1
    assert len(row[0]["fp_digest"]) == 32


def test_expected_parquet_freshness():
    """If the driver's testdata changes, regeneration is REQUIRED —
    fail here instead of letting the gate compare stale expectations."""
    sig_path = os.path.join(ORACLE_DIR, "input_sig.json")
    assert os.path.exists(sig_path), (
        "oracle expected-parquets missing — run "
        "python -m v2_ocr_spark.fixtures.oracle_expected"
    )
    with open(sig_path) as f:
        sig = json.load(f)
    if not os.path.exists(sig["input"]):
        pytest.skip("driver testdata not present on this machine")
    assert oe.file_md5(sig["input"]) == sig["input_md5"], (
        "testdata documents.parquet changed since oracle expectations "
        "were generated — rerun python -m v2_ocr_spark.fixtures.oracle_expected"
    )


def test_fake_codec_dims_are_md5_derived(spark):
    """Pin the Python hash_stable and the JVM _md5_u60 to the SAME
    md5-prefix derivation the DuckDB oracles recompute."""
    import hashlib

    from v2_ocr_spark.operators.multimodal import (
        _md5_u60,
        hash_stable,
        with_fake_image,
    )

    assert hash_stable(42, "v", 8) == (
        int(hashlib.md5(b"42:v").hexdigest()[:15], 16) % 8
    )
    docs = spark.createDataFrame([(42, "some text")], "doc_id long, text string")
    sid = F.col("doc_id").cast("string")
    row = (
        with_fake_image(docs)
        .select(
            (_md5_u60(sid) % 1920 + 1).alias("w"),
            (_md5_u60(F.concat(sid, F.lit(":h"))) % 1080 + 1).alias("h"),
        )
        .collect()[0]
    )
    assert row["w"] == int(hashlib.md5(b"42").hexdigest()[:15], 16) % 1920 + 1
    assert row["h"] == int(hashlib.md5(b"42:h").hexdigest()[:15], 16) % 1080 + 1
