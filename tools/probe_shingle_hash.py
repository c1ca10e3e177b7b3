"""Probe (VERDICT r3 #7): vectorized shingle hashing for the minhash /
winnowing kernels vs the current per-shingle zlib.crc32 generator loop.

Variant A (current, dedup.py minhash_signatures inner loop): build the
set of JOINED shingle strings, crc32 each.
Variant B (candidate): hash each distinct TOKEN once per Arrow batch
(memo dict — vocabulary reuse across docs), then combine 3 consecutive
token hashes with a wrapping-uint64 polynomial, vectorized in numpy;
distinct via np.unique. No shingle strings are ever materialized.

Keep bar (BASELINE.md probe discipline): >= 20% kernel-time win at
sf0.1, measured here WITHOUT Spark (pure kernel timing over the same
text column both kernels see), median of 5 passes. Run in a quiet
window; never conclude from one sample.

    python tools/probe_shingle_hash.py [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time
import zlib

import numpy as np
import pyarrow.parquet as pq

MERSENNE_P = (1 << 31) - 1
K1 = np.uint64(0x9E3779B97F4A7C15)
K2 = np.uint64(0xC2B2AE3D27D4EB4F)
K3 = np.uint64(0x165667B19E3779F9)


def kernel_a(texts: list[str], num_hashes: int, a, b) -> list:
    """Current: shingle strings -> crc32 -> minhash."""
    out = []
    for text in texts:
        toks = (text or "").split(" ")
        m = max(len(toks) - 2, 1)
        shingles = {" ".join(toks[i:i + 3]) for i in range(m)}
        x = np.fromiter(
            (zlib.crc32(s.encode("utf-8")) % MERSENNE_P for s in shingles),
            dtype=np.int64,
            count=len(shingles),
        )
        out.append(((a * x + b) % MERSENNE_P).min(axis=1))
    return out


def kernel_b(texts: list[str], num_hashes: int, a, b) -> list:
    """Candidate: batch token-hash memo + numpy polynomial shingles."""
    memo: dict[str, int] = {}
    out = []
    for text in texts:
        toks = (text or "").split(" ")
        codes = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            h = memo.get(t)
            if h is None:
                h = zlib.crc32(t.encode("utf-8"))
                memo[t] = h
            codes[i] = h
        if len(codes) >= 3:
            hs = codes[:-2] * K1 + codes[1:-1] * K2 + codes[2:] * K3
        elif len(codes) == 2:
            hs = codes[:1] * K1 + codes[1:] * K2
        else:
            hs = codes * K1
        x = (np.unique(hs) % np.uint64(MERSENNE_P)).astype(np.int64)
        out.append(((a * x + b) % MERSENNE_P).min(axis=1))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    texts = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    num_hashes = 128
    rng_a = np.arange(1, num_hashes + 1, dtype=np.int64).reshape(-1, 1) * 2654435761 % MERSENNE_P
    rng_b = np.arange(num_hashes, dtype=np.int64).reshape(-1, 1) * 40503 % MERSENNE_P

    results = {}
    for name, fn in (("crc32_strings", kernel_a), ("token_memo_poly", kernel_b)):
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(texts, num_hashes, rng_a, rng_b)
            times.append(time.perf_counter() - t0)
        results[name] = statistics.median(times)
        print(f"{name:18s} median {results[name]:.4f}s  (all: "
              + ", ".join(f"{t:.4f}" for t in sorted(times)) + ")")
    win = 1 - results["token_memo_poly"] / results["crc32_strings"]
    print(f"win: {win:+.1%}  (keep bar: >= +20%)")


if __name__ == "__main__":
    main()
