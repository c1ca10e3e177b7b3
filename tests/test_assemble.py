"""Direct pins for the two-phase chunked assembly (E2/W1) — the
docstring contract `chunked == unchunked at every chunk size` was
previously only covered indirectly through the DuckDB gate at one
chunk size; these tests exercise boundary cases the gate corpus lacks
(NULL-text turns, all-NULL chunks, chunk sizes that split mid-run)."""

from __future__ import annotations

import pyspark.sql.functions as F

from v2_ocr_spark.operators.assemble import assemble, export_documents


def _docs(df, chunk_size):
    return {
        r.conv_id: (r.document_text, r.total_turns)
        for r in assemble(df, chunk_size=chunk_size).collect()
    }


def test_chunked_equals_unchunked_with_null_text_chunks(spark):
    """Review regression (r4): a chunk whose texts are ALL NULL used to
    contribute an '' partial that phase 2 joined (concat_ws over an
    all-NULL array is '', never NULL), diverging from the unchunked
    path where concat_ws skips NULLs entirely. Empty-STRING texts must
    still join (both paths alike)."""
    rows = []
    # c1: turns 1..8, texts 5..8 all NULL -> at chunk_size=4 the whole
    # second chunk is NULL (the divergent case)
    for i in range(1, 5):
        rows.append(("c1", i, f"t{i}"))
    for i in range(5, 9):
        rows.append(("c1", i, None))
    # c2: NULL interleaved WITHIN chunks + a genuine '' element
    rows += [("c2", 1, "a"), ("c2", 2, None), ("c2", 3, ""),
             ("c2", 4, "b"), ("c2", 5, None)]
    # c3: every text NULL -> document_text must be '' on both paths
    rows += [("c3", i, None) for i in range(1, 7)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, extracted_text string"
    )
    expected = _docs(df, None)
    assert expected["c1"][0] == "t1\n\nt2\n\nt3\n\nt4"
    assert expected["c2"][0] == "a\n\n\n\nb"  # '' joins, NULLs skip
    assert expected["c3"][0] == ""
    for cs in (1, 2, 3, 4, 5, 8, 1024):
        assert _docs(df, cs) == expected, f"chunk_size={cs} diverged"


def test_export_null_page_keeps_empty_body_line(spark):
    """Review regression (r4): a NULL page text must render an EMPTY
    body line, not drop the line and shorten the E14 block."""
    df = spark.createDataFrame(
        [("c1", 1, "hello"), ("c1", 2, None)],
        "conv_id string, turn_idx int, extracted_text string",
    )
    conv = spark.createDataFrame(
        [("c1", "Doc.pdf")], "conv_id string, source_name string"
    )
    out = export_documents(df, conv, "2026-01-01").collect()[0].export_text
    blocks = out.split("=" * 80)
    # split on the separators: header text, gap, page-1 title, page-1
    # body, page-2 title, page-2 body -> the bodies are chunks 4 and 6
    page1, page2 = blocks[4], blocks[6]
    # body shape is '\n\n<text>\n\n' (+ the '\n' block joint on page 1)
    assert page1 == "\n\nhello\n\n\n"
    assert page2 == "\n\n\n\n", "NULL body line was dropped"
