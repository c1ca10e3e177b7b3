"""Round-3 probe (VERDICT item 6): does pruning the PASS-THROUGH id
columns (conv_id, turn_idx) out of the extraction Python worker move
the Arrow floor?

The round-2 packing probe established that ~62% of extraction wall is
the Arrow text round-trip. The ids ride that round trip in BOTH
directions (~16 B/row in + ~16 B/row out vs ~1 KB/row of text at
sf0.1). This probe measures the CEILING of the pruning idea by timing
a variant that ships only (text, payload_kind) in and
(extracted_text, spans, error) out — i.e. it does not even try to
rejoin the keys (any JVM-side rejoin would itself cost a shuffle the
real pipeline doesn't have; the honest production version would need
a zip-by-position contract mapInPandas does not offer).

Usage:  python tools/probe_prune_passthrough.py [sf_dir]
Prints one row per variant, best of 3 in one warm session.
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

from v2_ocr_spark.operators.extract import (
    EXTRACTED_DDL,
    _extract_batch,
    extract_turns,
    with_payload_kind,
)
from v2_ocr_spark.session import get_spark

PRUNED_DDL = (
    "extracted_text string, spans array<struct<start:int,end:int,"
    "kind:string>>, error string"
)


def _pruned_extract(df):
    src = with_payload_kind(df).select("text", "payload_kind")

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.assign(conv_id="", turn_idx=0)
            out = _extract_batch(pdf, with_metrics=False)
            yield out[["extracted_text", "spans", "error"]]

    return src.mapInPandas(run, schema=PRUNED_DDL)


def _time(df, label: str) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        df.select(
            F.sum(F.length("extracted_text")), F.sum(F.size("spans"))
        ).collect()
        best = min(best, time.perf_counter() - t0)
    print(f"| {label} | {best:.3f} |")
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf0.1"
    spark = get_spark(app_name="probe-prune", master="local[32]")
    turns = spark.read.parquet(f"{sf_dir}/transcripts.parquet")
    n = turns.count()
    print(f"input: {sf_dir} ({n} turns)")
    print("| variant | best sec |")
    print("|---|---|")
    full = _time(extract_turns(turns), "full (ids shipped both ways)")
    pruned = _time(_pruned_extract(turns), "pruned (text+kind only)")
    print(
        f"delta: {100 * (full - pruned) / full:.1f}% "
        f"(keep bar: >=20% AND a zero-shuffle rejoin, which does not exist)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
