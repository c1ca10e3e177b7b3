"""Degenerate-input and schema-derivation regressions from the round-1
advice pass: all-equal histogram values, non-string normalize keys."""

from __future__ import annotations

import pyspark.sql.functions as F

from v2_ocr_spark.operators.relational import value_histogram_for
from v2_ocr_spark.operators.textstats import normalize_nfc


def test_value_histogram_all_equal_values_bin_zero(spark):
    e = spark.createDataFrame(
        [("click", 7.5)] * 10 + [("view", 7.5)] * 3,
        "event_type string, value double",
    )
    rows = {
        (r.event_type, r.bin): r.n for r in value_histogram_for(e).collect()
    }
    # width 0 must collapse to bin 0, never NaN
    assert rows == {("click", 0): 10, ("view", 0): 3}


def test_value_histogram_normal_path_unchanged(spark):
    e = spark.createDataFrame(
        [("t", 0.0), ("t", 10.0), ("t", 19.99), ("t", 20.0)],
        "event_type string, value double",
    )
    got = {r.bin: r.n for r in value_histogram_for(e, n_bins=20).collect()}
    assert got == {0: 1, 10: 1, 19: 2}


def test_normalize_nfc_derives_key_types_from_schema(spark):
    d = spark.createDataFrame(
        [(17, "café"), (18, None)], "doc_id long, text string"
    )
    out = normalize_nfc(d, ["doc_id"])
    assert dict(out.dtypes)["doc_id"] == "bigint"
    rows = {r.doc_id: r.nfc_text for r in out.collect()}
    assert rows[17] == "café"  # combining accent composed
    assert rows[18] == ""
