"""Multimodal column plumbing (north-star surface): opaque ``binary``
payload columns + typed metadata, processed with Arrow-batched
``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_media`` raises NotImplementedError; the
pipeline uses a deterministic byte-level feature extractor instead).
The Spark-side plumbing — binary schema, metadata struct, Arrow batch
shapes, partition-preserving mapInPandas — is real and tested, and the
byte-level features are oracle-checkable against the source text.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_media_blob(documents: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.  The
    payload is the UTF-8 bytes of the text (a deterministic stand-in
    for image/audio bytes); metadata mimics decoded-media headers."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("mime"),
            (F.pmod(F.col("doc_id"), F.lit(64)) + 1).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(48)) + 1).cast("int").alias("height"),
            F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str):  # pragma: no cover - stub
    """REAL decode would go here (PIL/av/librosa).  Those codecs are
    not in this container — stubbed per the build contract."""
    raise NotImplementedError(
        "media decode requires image/audio codecs not present in this "
        "environment; use extract_byte_features for the deterministic "
        "byte-level path"
    )


def extract_byte_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: byte
    length, byte-sum checksum, distinct byte count — the deterministic
    stand-in for embedding extraction.  mapInPandas keeps partitioning
    (no shuffle) and streams Arrow batches."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "byte_sum": payloads.map(lambda b: sum(b)).astype("int64"),
                    "n_distinct_bytes": payloads.map(
                        lambda b: len(set(b))
                    ).astype("int64"),
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int64"),
                }
            )

    return blobs.mapInPandas(
        extract,
        "doc_id bigint, byte_len bigint, byte_sum bigint, "
        "n_distinct_bytes bigint, width bigint",
    )


def multimodal_features(documents: DataFrame) -> DataFrame:
    """End-to-end multimodal pipeline: attach blob → byte features."""
    return extract_byte_features(with_media_blob(documents))
