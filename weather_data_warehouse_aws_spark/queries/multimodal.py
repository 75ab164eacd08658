"""Multimodal query: binary payloads through Arrow-batched `mapInPandas`,
differentially checked against a DuckDB oracle.

Two stages ride one driver CORRECTNESS row:

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

This is a registry entry whose Spark side runs Python — by design: the
point is to verify the Pandas-UDF batch path (schema, batching, partition
preservation) that real media decoding rides on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    attach_payload,
    extract_features,
    extract_image_features,
    synth_images,
)
from ..sources.tables import load_table


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    plumbing = extract_features(attach_payload(docs, "doc_id", "text"))
    decoded = extract_image_features(synth_images(docs))
    return plumbing.join(decoded, "doc_id").orderBy("doc_id")


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
    CAST(doc_id * 83 % 256 AS DOUBLE) AS mean_b
FROM documents
ORDER BY doc_id
"""


QUERIES = {"multimodal_features": q_multimodal_features}
ORACLE = {"multimodal_features": ORACLE_MULTIMODAL_FEATURES}
