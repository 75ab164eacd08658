"""Multimodal column plumbing (north-star: image/audio/video as opaque
binary columns with typed metadata).

The container has no image/audio libraries, so the DECODE step is stubbed
(clearly marked, import-gated) — but everything Spark-side is real and
tested: the binary column schema, Arrow batch shape through `mapInPandas`,
partition-preserving feature extraction, and frame-sampling explode.

Design for 100 TB of media:
* payloads stay opaque `binary`; metadata (mime, n_bytes, checksum) lives in
  ordinary columns so filters/pruning never touch the blobs;
* feature extraction is `mapInPandas` (Arrow-batched, one Python worker per
  partition) — NEVER a row-at-a-time UDF;
* decoded features are small fixed-width columns, so downstream joins/aggs
  shuffle features, not payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # decode gate: real image decoding would need PIL — not in container
    import PIL  # noqa: F401

    HAS_IMAGE_LIBS = True
except ImportError:
    HAS_IMAGE_LIBS = False

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, header_hex string, fake_width int, fake_height int"
)
FRAME_SCHEMA = "doc_id bigint, frame_index int, frame_checksum string"


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media payload: the UTF-8 bytes of the text column
    standing in for image bytes. Schema shape matches a real media table:
    (id, payload binary, mime string, n_bytes int)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )


def decode_image(payload: bytes):
    """STUB — real decoding requires an image library absent from this
    container. The Spark-side plumbing around it is real and tested."""
    if not HAS_IMAGE_LIBS:
        raise NotImplementedError(
            "image decoding requires PIL/opencv; not available in this environment"
        )
    raise NotImplementedError("wire PIL.Image.open here when libs are present")


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Features are deterministic stand-ins (byte length, header hex, fake
    dimensions from header bytes) so tests — and the DuckDB oracle — can
    verify the batch plumbing end-to-end without real codecs.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "header_hex": payloads.map(lambda b: bytes(b)[:8].hex().upper()),
                    "fake_width": payloads.map(lambda b: 64 + bytes(b)[0] % 192).astype("int32"),
                    "fake_height": payloads.map(lambda b: 64 + bytes(b)[-1] % 192).astype("int32"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(_batches, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, *, n_frames: int = 4) -> DataFrame:
    """Frame-sampling shape for video payloads: each payload explodes into
    `n_frames` evenly spaced 'frames' (here: byte-slice checksums). The
    output cardinality and schema match a real frame sampler."""
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_ck = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                step = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    chunk = raw[i * step : (i + 1) * step]
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_ck.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_index": out_idx, "frame_checksum": out_ck}
            )

    return media.select("doc_id", "payload").mapInPandas(_batches, FRAME_SCHEMA)
