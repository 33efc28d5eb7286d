"""Multimodal-column plumbing (charter extension): treat image/audio/
video payloads as opaque ``binary`` columns with typed metadata, and
run decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.

The actual codec step is STUBBED — image/audio libraries are not
available in this environment — behind ``decode_media`` which raises
``NotImplementedError`` unless the deterministic fake decoder is
selected.  Everything around the stub is real and tested: the binary
schema, the mapInPandas batch shape (iterator of pandas DataFrames with
``bytes`` cells), the output StructType, and the partition-parallel
execution — which is exactly the part that must be right at 100 TB
(decode is per-row CPU; it scales by partition count, and the Arrow
boundary amortizes serialization per batch, not per row).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HASH_MOD = 1_000_000_007

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("source", StringType()),
                    StructField("n_bytes", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("byte_sum_mod", LongType()),
    ]
)


def as_media_table(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents table: UTF-8 bytes of
    the text as the opaque binary payload plus typed metadata.  (In a
    real pipeline this is the parquet/Lance scan of stored blobs; the
    driver corpus has no true binary tables.)"""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/png"))
        .otherwise(F.lit("audio/wav"))
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, media_type: str, fake: bool = False):
    """Decode a binary payload into a media object.

    STUB: real decoding needs PIL/librosa/av, absent here.  ``fake=True``
    selects the deterministic fake decoder used by tests and the oracle
    query: it treats the raw bytes as the "decoded" signal.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio codecs not present in this "
            "environment; pass fake=True for the deterministic test decoder"
        )
    return payload


def extract_features(
    media: DataFrame, decoder: Callable[..., bytes] = decode_media
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Deterministic features of the (fake-)decoded payload: byte length,
    first byte, and a rolling byte-sum mod — stand-ins for embedding /
    spectrogram outputs, chosen so the DuckDB oracle can reproduce them
    from the source text (the payload is ASCII here, bytes ==
    codepoints).
    """

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decoder(payload, mt, fake=True)
                for payload, mt in zip(pdf["content"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(d) for d in decoded],
                    "first_byte": [d[0] if len(d) else -1 for d in decoded],
                    # numpy views the payload buffer in place; the C-speed
                    # sum is the per-row hot loop at scale.
                    "byte_sum_mod": [
                        int(np.frombuffer(d, dtype=np.uint8).sum()) % HASH_MOD
                        for d in decoded
                    ],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB — image resize requires PIL; the Spark-side signature is the
    real contract (binary in, binary out, metadata updated)."""
    raise NotImplementedError("image resize requires PIL (not in this environment)")


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB — video frame sampling requires av/ffmpeg."""
    raise NotImplementedError("frame sampling requires av/ffmpeg (not in this environment)")
