"""Multimodal query: binary payloads through Arrow-batched `mapInPandas`,
differentially checked against a DuckDB oracle.

Three stages ride one driver CORRECTNESS row:

1. *Plumbing features* over fake payloads (UTF-8 bytes of `text`): byte
   length, header hex, header-derived dimensions — the oracle recomputes
   them from the source text (the corpus is pure ASCII, so byte and
   character offsets coincide).
2. *Real codec roundtrip*: a deterministic solid-color image per document
   (even doc_id → 24-bit BMP, odd → P6 PPM; size and color are closed-form
   functions of doc_id) is ENCODED then DECODED by the pure-Python codecs in
   `operators/multimodal.py` — header parse, padded pixel walk, BGR→RGB —
   and the oracle predicts the recovered width/height/channel means
   arithmetically. A decode bug (channel swap, padding miscount, header
   misread) breaks the hash.
3. *Real audio roundtrip*: a deterministic square-wave 16-bit PCM WAV per
   document (amplitude/frames/channels closed-form in doc_id) is encoded
   then decoded by the RIFF/PCM codec — chunk walk, framing, interleave,
   sign — and the oracle predicts sample_rate/channels/frames/peak/rms
   arithmetically (a square wave's peak and rms both equal its amplitude).

This is a registry entry whose Spark side runs Python — by design: the
point is to verify the Pandas-UDF batch path (schema, batching, partition
preservation) that real media decoding rides on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_payload,
    extract_audio_features,
    extract_features,
    extract_image_features,
    synth_audio,
    synth_images,
)
from ..sources.tables import load_table


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    plumbing = extract_features(attach_payload(docs, "doc_id", "text"))
    decoded = extract_image_features(synth_images(docs))
    # audio: deterministic square-wave WAVs encoded then REALLY decoded
    # (RIFF chunk walk + PCM stats); peak and rms of a square wave both
    # equal its amplitude, so the oracle predicts them in closed form
    audio = extract_audio_features(synth_audio(docs)).select(
        "doc_id",
        F.col("fmt").alias("a_fmt"),
        "sample_rate",
        "n_channels",
        "n_frames",
        "peak",
        "rms",
    )
    return plumbing.join(decoded, "doc_id").join(audio, "doc_id").orderBy("doc_id")


ORACLE_MULTIMODAL_FEATURES = """
SELECT
    doc_id,
    CAST(strlen(text) AS INT) AS n_bytes,
    upper(hex(substr(text, 1, 8))) AS header_hex,
    CAST(64 + ascii(substr(text, 1, 1)) % 192 AS INT) AS fake_width,
    CAST(64 + ascii(substr(text, length(text), 1)) % 192 AS INT) AS fake_height,
    CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS fmt,
    CAST(4 + doc_id % 13 AS INT) AS width,
    CAST(4 + doc_id % 11 AS INT) AS height,
    CAST(doc_id * 37 % 256 AS DOUBLE) AS mean_r,
    CAST(doc_id * 59 % 256 AS DOUBLE) AS mean_g,
    CAST(doc_id * 83 % 256 AS DOUBLE) AS mean_b,
    'wav' AS a_fmt,
    CAST(8000 AS INT) AS sample_rate,
    CAST(1 + doc_id % 2 AS INT) AS n_channels,
    CAST(16 + doc_id % 50 AS INT) AS n_frames,
    CAST(doc_id * 13 % 30000 AS INT) AS peak,
    CAST(doc_id * 13 % 30000 AS DOUBLE) AS rms
FROM documents
ORDER BY doc_id
"""


QUERIES = {"multimodal_features": q_multimodal_features}
ORACLE = {"multimodal_features": ORACLE_MULTIMODAL_FEATURES}
