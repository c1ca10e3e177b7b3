"""Multimodal column plumbing — image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs (no PIL/ffmpeg), so the DECODE
step is stubbed (deterministic fake header parse / NotImplementedError
for real codecs) — but the Spark-side plumbing is real and tested:
binary column schema, Arrow batch shape through mapInPandas, typed
metadata struct output, and partition behavior.

Fake payload format (deterministic, generated from document text):
  bytes 0-3   magic  b"FIMG"
  bytes 4-7   width  (int32, big-endian)
  bytes 8-11  height (int32, big-endian)
  bytes 12-   payload (utf-8 of the source text)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

MAGIC = b"FIMG"

META_DDL = (
    "doc_id long, byte_len int, magic_ok boolean, width int, height int, "
    "aspect double"
)


def with_fake_image(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary 'image' column: header built from
    JVM-side expressions + the text payload — real binary plumbing,
    fake codec."""
    w = (F.pmod(F.xxhash64("doc_id"), F.lit(1920)) + 1).cast("int")
    h = (F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(1080)) + 1).cast("int")
    header = F.concat(
        F.lit(MAGIC),
        F.to_binary(F.lpad(F.hex(w), 8, "0"), F.lit("hex")),
        F.to_binary(F.lpad(F.hex(h), 8, "0"), F.lit("hex")),
    )
    return docs.withColumn(
        "image", F.concat(header, F.encode(F.col("text"), "utf-8"))
    )


def decode_image_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """The vectorized 'decoder' — parses the fake header per Arrow
    batch. A real deployment swaps this body for PIL/libvips calls;
    the signature, schema, and batching stay identical."""
    metas = []
    for doc_id, buf in zip(pdf["doc_id"], pdf["image"]):
        b = bytes(buf)
        ok = b[:4] == MAGIC and len(b) >= 12
        if ok:
            width, height = struct.unpack(">ii", b[4:12])
        else:
            width = height = 0
        metas.append(
            (
                doc_id,
                len(b),
                ok,
                width,
                height,
                (width / height) if height else 0.0,
            )
        )
    return pd.DataFrame(
        metas,
        columns=["doc_id", "byte_len", "magic_ok", "width", "height", "aspect"],
    )


def image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> typed image metadata via binary mapInPandas pass."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    imgs = with_fake_image(docs).select("doc_id", "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield decode_image_batch(pdf)

    return imgs.mapInPandas(run, schema=META_DDL)


def decode_real_image(_: bytes):
    """Real codec entry point — unavailable in this container."""
    raise NotImplementedError(
        "image codecs (PIL/libvips) are not installed in this environment; "
        "decode_image_batch demonstrates the Spark-side plumbing with the "
        "deterministic FIMG fake format"
    )
