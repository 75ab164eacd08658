"""Multimodal-plumbing query: binary payload feature extraction through
Arrow-batched `mapInPandas`, differentially checked against a DuckDB oracle
that recomputes the same deterministic features from the source text
(payload = UTF-8 bytes of `text`; the corpus is pure ASCII, so byte and
character offsets coincide in the oracle).

This is the one registry entry whose Spark side runs Python — by design:
the point is to verify the Pandas-UDF batch path (schema, batching,
partition preservation) that real image/audio decoding would ride on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import attach_payload, extract_features
from ..sources.tables import load_table


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs, "doc_id", "text")
    return extract_features(media).orderBy("doc_id")


ORACLE_MULTIMODAL_FEATURES = """
SELECT
    doc_id,
    CAST(strlen(text) AS INT) AS n_bytes,
    upper(hex(substr(text, 1, 8))) AS header_hex,
    CAST(64 + ascii(substr(text, 1, 1)) % 192 AS INT) AS fake_width,
    CAST(64 + ascii(substr(text, length(text), 1)) % 192 AS INT) AS fake_height
FROM documents
ORDER BY doc_id
"""


QUERIES = {"multimodal_features": q_multimodal_features}
ORACLE = {"multimodal_features": ORACLE_MULTIMODAL_FEATURES}
