"""Text-analysis queries over `documents` (north-star: LLM-data pipeline).

Language-ID, quality scoring, token counting, and fingerprinting — each as a
JVM-side column pipeline with a DuckDB oracle built from the SAME constants
(functions/text.py is the single source of truth for stopword lists, marker
vocabularies, and the normalization chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_MARKERS,
    fingerprint,
    fingerprint_sql,
    punct_count,
    punct_count_sql,
    stopword_count_expr,
    stopword_count_sql,
    token_count,
    token_count_sql,
)
from ..sources.tables import load_table


# ---------------------------------------------------------------------------
# q_text_stats — per-document quality metrics
# ---------------------------------------------------------------------------
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/token/punctuation/stopword metrics + a composite quality score.

    All built-ins inside whole-stage codegen — the shape that streams at
    100 TB (one scan, no shuffle; the `documents` scan prunes to 2 columns).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = token_count(F.col("text"))
    sw = stopword_count_expr("text")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tok.alias("n_tokens"),
        punct_count(F.col("text")).alias("n_punct"),
        sw.alias("n_stopwords"),
        F.round(F.length("text") / n_tok, 4).alias("avg_token_len"),
        F.round(sw / n_tok, 4).alias("stopword_ratio"),
        F.round(
            0.5 * (sw / n_tok) + 0.5 * (F.least(n_tok, F.lit(100)) / 100.0), 4
        ).alias("quality_score"),
    )


def _oracle_text_stats() -> str:
    n_tok = token_count_sql("text")
    sw = stopword_count_sql("text")
    return f"""
SELECT
    doc_id,
    CAST(length(text) AS INT) AS n_chars,
    {n_tok} AS n_tokens,
    CAST({punct_count_sql('text')} AS INT) AS n_punct,
    {sw} AS n_stopwords,
    ROUND(length(text) / {n_tok}, 4) AS avg_token_len,
    ROUND({sw} / CAST({n_tok} AS DOUBLE), 4) AS stopword_ratio,
    ROUND(0.5 * ({sw} / CAST({n_tok} AS DOUBLE))
        + 0.5 * (LEAST({n_tok}, 100) / 100.0), 4) AS quality_score
FROM documents
"""


# ---------------------------------------------------------------------------
# q_lang_id — marker-vocabulary language identification
# ---------------------------------------------------------------------------
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic lang-ID: count marker-word hits per language, argmax with
    deterministic tie-break (LANG_MARKERS declaration order)."""
    docs = load_table(spark, sf_dir, "documents")
    langs = list(LANG_MARKERS)
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            stopword_count_expr("text", LANG_MARKERS[lg]).alias(f"s_{lg}")
            for lg in langs
        ],
    )
    # first language whose score >= all later ones wins
    pred = None
    for i, lg in enumerate(langs):
        cond = F.lit(True)
        for other in langs[i + 1 :]:
            cond = cond & (F.col(f"s_{lg}") >= F.col(f"s_{other}"))
        pred = F.when(cond, lg) if pred is None else pred.when(cond, lg)
    scored = scored.withColumn("predicted_lang", pred.otherwise(langs[-1]))
    return scored.select(
        "doc_id",
        "lang",
        "predicted_lang",
        (F.col("predicted_lang") == F.col("lang")).alias("is_match"),
    )


def _oracle_lang_id() -> str:
    langs = list(LANG_MARKERS)
    score_cols = ",\n        ".join(
        f"{stopword_count_sql('text', LANG_MARKERS[lg])} AS s_{lg}" for lg in langs
    )
    branches = []
    for i, lg in enumerate(langs):
        conds = [f"s_{lg} >= s_{other}" for other in langs[i + 1 :]]
        cond = " AND ".join(conds) if conds else "TRUE"
        branches.append(f"WHEN {cond} THEN '{lg}'")
    case = "CASE " + " ".join(branches[:-1]) + f" ELSE '{langs[-1]}' END"
    return f"""
WITH scored AS (
    SELECT doc_id, lang,
        {score_cols}
    FROM documents
)
SELECT doc_id, lang,
       {case} AS predicted_lang,
       ({case}) = lang AS is_match
FROM scored
"""


# ---------------------------------------------------------------------------
# q_token_topk — explode + global token frequencies (X1 on documents)
# ---------------------------------------------------------------------------
def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by frequency (count desc, token asc — total order, so
    LIMIT is deterministic). Explode → partial-agg'd count: one shuffle of
    (token, count) pairs, never raw text."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


ORACLE_TOKEN_TOPK = r"""
SELECT token, COUNT(*) AS n
FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
    FROM documents
)
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
"""


# ---------------------------------------------------------------------------
# q_fingerprint — normalized document fingerprints (rolling-hash analog)
# ---------------------------------------------------------------------------
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fingerprint: md5 of lower/strip-punct/collapse-ws text.
    A full differential check of the normalization chain across engines."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp"),
        (fingerprint(F.col("text")) == F.md5("text")).alias("was_normal_form"),
    )


def _oracle_fingerprint() -> str:
    fp = fingerprint_sql("text")
    return f"""
SELECT doc_id,
       {fp} AS fp,
       {fp} = md5(text) AS was_normal_form
FROM documents
"""


QUERIES = {
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "token_topk": q_token_topk,
    "doc_fingerprint": q_fingerprint,
}

ORACLE = {
    "text_stats": _oracle_text_stats(),
    "lang_id": _oracle_lang_id(),
    "token_topk": ORACLE_TOKEN_TOPK,
    "doc_fingerprint": _oracle_fingerprint(),
}
