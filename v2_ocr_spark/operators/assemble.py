"""E2 / E14 — per-conversation document assembly, entirely JVM-side.

Reference parity:
  * E2: cleaned pages joined "\\n\\n" in page order
    (mistral.ts:219 ``.join("\\n\\n")`` after per-page cleanup).
  * E14: export .txt layout — header + per-page 80-'=' separator blocks,
    pages sorted ascending (app/documents/[id]/page.tsx:629-655).
  * W1: ordering always derives from turn_idx, never from physical row
    order — ``sort_array(collect_list(struct(turn_idx, text)))``; the
    reference re-sorts defensively for the same reason (page.tsx:398,644).

Scale design — the skew problem:
  A conversation with 10k (or 10M) turns makes the naive
  ``groupBy(conv_id).agg(collect_list)`` build one giant group on one
  task (the reference has the same failure shape: one 1000-page doc
  serializes into one job slot, SURVEY.md §4). ``assemble(...,
  chunk_size=N)`` therefore does a two-phase merge:

    phase 1: group by (conv_id, chunk = floor((turn_idx-1)/N))
             -> per-chunk partial string (bounded group size, spreads a
                long conversation over many tasks)
    phase 2: group by conv_id over the (few) chunk partials, ordered by
             chunk id -> final document

  Both phases are hash aggregations with map-side partial aggregation;
  the chunk concat preserves exact "\\n\\n" joints because chunks are
  contiguous turn ranges.

  This IS the salted repartitioning the north rule calls for: the
  chunk id is a salt derived from turn_idx, the phase-1 shuffle
  hash-partitions on the salted key (conv_id, chunk) so the hot
  conversation spreads across tasks, and phase 2 merges the partials.
  Deriving the salt from turn_idx instead of a random/hashed value is
  what lets the merge stay order-exact (random salts would need a
  re-sort per group). Verified by the chunked-vs-unchunked equality
  test in tests/test_assemble.py (several chunk sizes, NULL-text
  chunks included) and the skew fixture ``convskew00`` (10k turns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

SEPARATOR = "=" * 80


def _sorted_texts(text_col: str) -> F.Column:
    # struct sorts lexicographically on (turn_idx, ...) -> stable W1 order
    return F.transform(
        F.sort_array(F.collect_list(F.struct("turn_idx", text_col))),
        lambda s: s[text_col],
    )


def assemble(
    extracted: DataFrame,
    text_col: str = "extracted_text",
    chunk_size: int | None = 1024,
) -> DataFrame:
    """-> (conv_id, document_text, total_turns) — E2 semantics."""
    if chunk_size is None:
        return extracted.groupBy("conv_id").agg(
            F.concat_ws("\n\n", _sorted_texts(text_col)).alias("document_text"),
            F.count("*").cast("int").alias("total_turns"),
        )

    chunked = extracted.withColumn(
        "chunk", ((F.col("turn_idx") - 1) / chunk_size).cast("int")
    )
    # a chunk whose texts are ALL NULL must contribute NO partial:
    # concat_ws over an all-NULL array returns '' (never NULL), and
    # phase 2 would join that '' — diverging from the unchunked path,
    # where concat_ws simply skips the NULLs. count(text_col) counts
    # non-NULL texts, so a chunk holding a genuine '' keeps its ''
    # partial (concat_ws DOES join empty strings, both paths alike).
    partials = chunked.groupBy("conv_id", "chunk").agg(
        F.when(
            F.count(text_col) > 0,
            F.concat_ws("\n\n", _sorted_texts(text_col)),
        ).alias("part"),
        F.count("*").alias("n"),
    )
    return partials.groupBy("conv_id").agg(
        F.concat_ws(
            "\n\n",
            F.transform(
                F.sort_array(F.collect_list(F.struct("chunk", "part"))),
                lambda s: s["part"],
            ),
        ).alias("document_text"),
        F.sum("n").cast("int").alias("total_turns"),
    )


def export_documents(
    extracted: DataFrame,
    conversations: DataFrame,
    exported_at: str,
    text_col: str = "extracted_text",
) -> DataFrame:
    """E14: -> (conv_id, export_text) with the exact reference layout.

    ``exported_at`` replaces ``new Date().toLocaleString()``
    (page.tsx:629) for determinism. The conversations dim supplies the
    document name; it is broadcast when small (Catalyst/AQE decide —
    per-batch conv dimensions are tiny next to the turns fact table).
    """
    n = F.count("*").cast("int")
    pages = extracted.groupBy("conv_id").agg(
        _sorted_texts(text_col).alias("texts"),
        F.sort_array(F.collect_list("turn_idx")).alias("idxs"),
        n.alias("total_turns"),
    )
    # INNER join: an export is always of a known conversation (the
    # reference exports from the document detail page, so the dim row
    # exists by construction) — and the DuckDB oracle joins inner, so a
    # left join would desync the gate on orphan conv_ids
    named = pages.join(
        conversations.select("conv_id", "source_name"), "conv_id"
    )
    header = F.concat_ws(
        "\n",
        F.lit(SEPARATOR),
        F.concat(F.lit("Document: "), F.coalesce("source_name", F.lit(""))),
        F.lit(f"Exported: {exported_at}"),
        F.concat(F.lit("Total Pages: "), F.col("total_turns").cast("string")),
        F.lit(SEPARATOR),
        F.lit("\n"),
    )
    blocks = F.concat_ws(
        "\n",
        F.zip_with(
            "idxs",
            "texts",
            lambda i, t: F.concat_ws(
                "\n",
                F.lit(SEPARATOR),
                F.concat(
                    F.lit("Page "),
                    i.cast("string"),
                    F.lit(" of "),
                    F.col("total_turns").cast("string"),
                ),
                F.lit(SEPARATOR),
                F.lit(""),
                # a NULL page still renders its (empty) body line —
                # concat_ws would otherwise SKIP the element and make
                # the block one line shorter than the E14 layout
                F.coalesce(t, F.lit("")),
                F.lit("\n"),
            ),
        ),
    )
    return named.select(
        "conv_id",
        F.concat(header, blocks).alias("export_text"),
        "total_turns",
    )
