"""Composed corpus quality report (pipeline/quality.py) — e2e over the
real sf0.001 documents table: the per-doc ledger must agree row-level
with the three source operators it joins (each already DuckDB- or
pure-Python-twinned in its own suite), and the summary must agree with
the written table.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from v2_ocr_spark.operators.corpus import (
    lm_logloss,
    remove_dup_spans,
    scrub_boilerplate,
)
from v2_ocr_spark.pipeline.quality import corpus_quality_report

SF = "/root/testdata/sf0.001"


def test_quality_report_end_to_end(spark, tmp_path):
    out = str(tmp_path / "report")
    os.makedirs(out)
    summary = corpus_quality_report(spark, SF, out)

    table = spark.read.parquet(f"{out}/doc_quality")
    rows = {r.doc_id: r for r in table.collect()}
    assert len(rows) == 500
    # summary agrees with the table it points at
    assert summary["docs"] == 500
    assert summary["total_tokens"] == sum(r.n_tokens for r in rows.values())
    assert summary["total_dup_tokens"] == sum(
        r.dup_tokens for r in rows.values()
    )
    with open(f"{out}/summary.json") as f:
        assert json.load(f) == summary

    # row-level agreement with each source operator
    lm = {r.doc_id: r for r in lm_logloss(spark, SF).collect()}
    sp = {r.doc_id: r for r in remove_dup_spans(spark, SF).collect()}
    bl = {r.doc_id: r for r in scrub_boilerplate(spark, SF).collect()}
    for d, r in rows.items():
        assert r.n_tokens == lm[d].n_tokens
        assert r.bits_per_token == lm[d].bits_per_token
        assert r.oov_frac == lm[d].oov_frac
        assert r.dup_tokens == sp[d].dup_tokens
        assert r.boiler_lines == bl[d].n_lines - bl[d].kept_lines
    # the fractions are exact per-row derivations, NULL-safe
    sample = next(iter(rows.values()))
    assert sample.dup_token_frac is None or 0 <= sample.dup_token_frac <= 1
    # non-vacuous on the real corpus: dup spans exist (probed in
    # tests/test_dup_spans.py), boilerplate lines do not
    assert summary["total_dup_tokens"] > 0
    assert summary["total_boiler_lines"] == 0
    assert summary["docs_with_oov"] == 0  # self-trained LM
