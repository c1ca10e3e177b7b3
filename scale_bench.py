"""Scaling-efficiency evidence (BASELINE.json north rule): run the same
extraction job on the same input at two parallelism levels — local[8]
vs local[32], the sandbox stand-in for N vs 4N executors — and report
throughput at both plus scaling efficiency (target >= 0.8).

Each level runs in a fresh subprocess (fresh JVM) so executor-thread
count is the only variable. Writes BENCH/BASELINE.md and prints JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SCALE_BENCH_REPEATS", "3"))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
import __spark_entry__ as entry_mod
from v2_ocr_spark.operators.extract import extract_turns
from v2_ocr_spark.session import get_spark

cores = int(sys.argv[1]); sf_dir = sys.argv[2]; repeats = int(sys.argv[3])
spark = get_spark(app_name=f"scale{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
path = entry_mod._data_dir(sf_dir) + "/transcripts.parquet"
t = spark.read.parquet(path)
# split the input into enough tasks to feed all cores at either level
t = t.repartition(128)
n = t.count()
extract_turns(t.limit(4000)).count()  # warm-up
best = None
for _ in range(repeats):
    t0 = time.perf_counter()
    extract_turns(t).agg(F.sum(F.length("extracted_text"))).collect()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({"cores": cores, "n_turns": n, "sec": round(best, 4),
                  "turns_per_sec": round(n / best, 2)}))
spark.stop()
"""


def run_level(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), SF_DIR, str(REPEATS)],
        capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    low = run_level(8)
    high = run_level(32)
    eff = round((high["turns_per_sec"] / low["turns_per_sec"]) / (32 / 8), 4)
    result = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "low": low,
        "high": high,
        "efficiency": eff,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/BASELINE.md", "w", encoding="utf-8") as f:
        f.write(
            "# BENCH/BASELINE — extraction throughput at two parallelism "
            "levels\n\n"
            "Sandbox stand-in for the north rule's N vs 4N executors: the\n"
            "same job + same input at local[8] and local[32] (fresh JVM\n"
            f"each), best of {REPEATS} runs, input {SF_DIR} "
            f"({low['n_turns']} turns).\n\n"
            "| level | cores | wall sec | turns/sec |\n"
            "|---|---|---|---|\n"
            f"| N | 8 | {low['sec']} | {low['turns_per_sec']} |\n"
            f"| 4N | 32 | {high['sec']} | {high['turns_per_sec']} |\n\n"
            f"**Scaling efficiency** = (thr_32/thr_8)/4 = **{eff}** "
            f"(target >= 0.8: {'PASS' if eff >= 0.8 else 'FAIL'})\n"
        )


if __name__ == "__main__":
    main()
