"""Registry query for the relevance scorers (operators/relevance.py):
BM25 keyword ranking + per-doc TF-IDF top terms, one tagged relation.

Determinism notes for the cross-engine hash gate:
* ranking happens on FULL-precision doubles on both engines (round only at
  presentation, 4dp) — two mathematically distinct scores differ far above
  ULP noise because tf/df/dl are small integers;
* mathematically EQUAL scores (identical tf/dl profiles) are tie-broken by
  doc_id / term on both sides, so row_number and LIMIT are total-order
  deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash60_sql
from ..operators.relevance import QLR_BUCKETS, QLR_SCALE, bm25, quality_scores, tf_idf
from ..sources.tables import load_table

QUERY_TERMS = ["join", "vector", "spark"]
_K1, _B = 1.2, 0.75
TOPK_DOCS = 15
TOPK_TERMS = 3
SAMPLE_MOD = 50  # tf-idf side: every 50th doc


def q_text_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    ranked = bm25(docs, "doc_id", "text", QUERY_TERMS, k1=_K1, b=_B)
    top_docs = (
        ranked.orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(TOPK_DOCS)
        .select(
            F.lit("bm25").alias("variant"),
            "doc_id",
            F.lit(None).cast("string").alias("term"),
            F.round(F.col("score"), 4).alias("score"),
            F.col("n_hit_terms").cast("long").alias("n"),
        )
    )

    sampled = docs.filter(F.col("doc_id") % SAMPLE_MOD == 0)
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok"))
    top_terms = (
        tf_idf(sampled, "doc_id", "text")
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= TOPK_TERMS)
        .select(
            F.lit("tfidf").alias("variant"),
            "doc_id",
            F.col("tok").alias("term"),
            F.round(F.col("tfidf"), 4).alias("score"),
            F.col("tf").alias("n"),
        )
    )
    quality = quality_scores(docs, "doc_id", "text").select(
        F.lit("quality").alias("variant"),
        "doc_id",
        # keep/drop verdict rides the term slot (schema-aligned union)
        F.when(F.col("keep"), F.lit("keep")).otherwise(F.lit("drop")).alias("term"),
        F.col("margin").alias("score"),
        F.col("n_features").alias("n"),
    )
    return (
        top_docs.unionByName(top_terms)
        .unionByName(quality)
        .orderBy("variant", "doc_id", "term")
    )


_TOKS = r"regexp_split_to_array(trim(text), '\s+')"

ORACLE_TEXT_RELEVANCE = rf"""
WITH toks AS (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
tf AS (
    SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
),
dl AS (
    SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
),
stats AS (
    SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
),
qterms AS (
    SELECT unnest(['join', 'vector', 'spark']) AS tok
),
dfreq_q AS (
    SELECT tok, COUNT(*) AS df FROM tf JOIN qterms USING (tok) GROUP BY tok
),
bm25 AS (
    SELECT tf.doc_id,
           SUM(
               ln(1.0 + (stats.n_docs - dfreq_q.df + 0.5) / (dfreq_q.df + 0.5))
               * tf.tf * ({_K1} + 1)
               / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / stats.avgdl))
           ) AS score,
           COUNT(*) AS n_hit_terms
    FROM tf
    JOIN dfreq_q USING (tok)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
),
top_docs AS (
    SELECT 'bm25' AS variant, doc_id, CAST(NULL AS VARCHAR) AS term,
           ROUND(score, 4) AS score, n_hit_terms AS n
    FROM bm25
    ORDER BY bm25.score DESC, doc_id
    LIMIT {TOPK_DOCS}
),
sampled_tf AS (  -- tf/df/N recomputed over the SAMPLED corpus, as the engine does
    SELECT doc_id, tok, COUNT(*) AS tf
    FROM (
        SELECT doc_id, unnest({_TOKS}) AS tok
        FROM documents WHERE doc_id % {SAMPLE_MOD} = 0
    )
    GROUP BY doc_id, tok
),
sampled_df AS (
    SELECT tok, COUNT(*) AS df FROM sampled_tf GROUP BY tok
),
sampled_n AS (
    SELECT COUNT(*) AS n_docs FROM documents WHERE doc_id % {SAMPLE_MOD} = 0
),
tfidf AS (
    SELECT doc_id, tok, tf,
           tf * ln(CAST(n_docs AS DOUBLE) / df) AS tfidf,
           ROW_NUMBER() OVER (
               PARTITION BY doc_id
               ORDER BY tf * ln(CAST(n_docs AS DOUBLE) / df) DESC, tok
           ) AS r
    FROM sampled_tf JOIN sampled_df USING (tok) CROSS JOIN sampled_n
),
top_terms AS (
    SELECT 'tfidf' AS variant, doc_id, tok AS term,
           ROUND(tfidf, 4) AS score, tf AS n
    FROM tfidf WHERE r <= {TOPK_TERMS}
),
qt AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
    FROM documents
),
qfeat AS (
    SELECT doc_id, f FROM (SELECT doc_id, unnest(tk) AS f FROM qt)
    UNION ALL
    SELECT doc_id, tk[u] || '_' || tk[u + 1] AS f
    FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS u FROM qt)
),
qw AS (
    SELECT doc_id,
           ({portable_hash60_sql("'w|' || CAST(" + portable_hash60_sql("'qlr|' || f") + f" % {QLR_BUCKETS} AS VARCHAR)")})
               % {2 * QLR_SCALE + 1} - {QLR_SCALE} AS w
    FROM qfeat
),
quality AS (
    SELECT 'quality' AS variant, doc_id,
           CASE WHEN SUM(w) > 0 THEN 'keep' ELSE 'drop' END AS term,
           FLOOR(CAST(SUM(w) AS DOUBLE) / ({QLR_SCALE}.0 * COUNT(*)) * 1000000.0)
               / 1000000.0 AS score,
           COUNT(*) AS n
    FROM qw GROUP BY doc_id
)
SELECT variant, doc_id, term, score, n FROM top_docs
UNION ALL
SELECT variant, doc_id, term, score, n FROM top_terms
UNION ALL
SELECT variant, doc_id, term, score, n FROM quality
ORDER BY variant, doc_id, term
"""


QUERIES = {"text_relevance": q_text_relevance}
ORACLE = {"text_relevance": ORACLE_TEXT_RELEVANCE}
