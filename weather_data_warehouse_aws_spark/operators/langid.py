"""Trained hashed-feature language identification — the fastText-style
shape (Joulin et al. 2016: char n-gram features, hashed, linear scores) on
the same machinery as the quality classifier (operators/relevance.py):

* features are character bigrams of lower(trim(text)) — the standard
  lang-id signal (word markers fail on unseen vocabulary and on languages
  without whitespace), hashed into ``LANGID_BUCKETS`` via the md5-portable
  hash so Spark and any SQL engine bucket identically;
* training is ONE distributed pass: count (label, bucket) co-occurrences,
  normalize to integer micro-weights ``w = count·SCALE div total(label)``
  (exact integer arithmetic — no float accumulation anywhere, so scores
  are bit-reproducible cross-engine);
* the model is a (bucket, w_<lang>…) relation of ≤ LANGID_BUCKETS rows —
  KBs — broadcast to score any corpus in one explode + hash-join +
  groupBy(doc) pass;
* prediction is argmax with deterministic first-declared-wins tie-break,
  same convention as the marker heuristic it replaces.

Scale: scoring shuffles only (doc_id, partial integer sums); the corpus
never moves. Training's shuffle is (label, bucket) pairs — bounded by
|langs|·LANGID_BUCKETS after map-side combine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, portable_hash60_sql

LANGID_BUCKETS = 2003  # prime, same dimensionality family as QLR_BUCKETS
LANGID_SCALE = 100_000  # micro-int weight scale ⇒ exact integer sums
LANGID_SALT = "lid"


def char_bigram_buckets(
    df: DataFrame, id_col: str, text_col: str, *, salt: str = LANGID_SALT
) -> DataFrame:
    """(doc_id, bucket): one row per character-bigram occurrence of
    lower(trim(text)), feature-hashed. Texts shorter than 2 chars emit one
    degenerate gram so every document scores."""
    # NULL text folds to '' so it emits the same single degenerate gram as
    # any sub-2-char text — and, critically, the same row the SQL mirror
    # emits (NULL would diverge: Spark's explode drops the row, DuckDB's
    # list comprehension keeps a NULL gram, shifting every trained weight)
    t = df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.lower(F.trim(F.col(text_col))), F.lit("")).alias("__t"),
    )
    grams = F.expr(
        "transform(sequence(1, greatest(length(__t) - 1, 1)), "
        "i -> substring(__t, i, 2))"
    )
    return t.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id",
        F.pmod(
            portable_hash60(F.concat(F.lit(salt + "|"), F.col("g"))),
            F.lit(LANGID_BUCKETS),
        ).alias("bucket"),
    )


def char_bigram_buckets_sql(text_expr: str, *, salt: str = LANGID_SALT) -> tuple[str, str]:
    """DuckDB mirror of `char_bigram_buckets`: returns (grams_list_expr,
    bucket_expr) — embed as SELECT …, {bucket} FROM tbl, UNNEST({grams})
    AS u(g)."""
    low = f"coalesce(lower(trim({text_expr})), '')"
    grams = (
        f"[substring({low}, i, 2) "
        f"FOR i IN range(1, greatest(length({low}) - 1, 1) + 1)]"
    )
    hashed = portable_hash60_sql(f"'{salt}|' || g")
    bucket = f"(({hashed}) % {LANGID_BUCKETS} + {LANGID_BUCKETS}) % {LANGID_BUCKETS}"
    return grams, bucket


def lang_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    langs: Sequence[str],
) -> DataFrame:
    """(bucket, w_<lang>…) integer weight relation learned from labeled
    text: w = occurrences of bucket under label · SCALE div total
    occurrences under label (a frequency model — multinomial scoring with
    linear instead of log weights, kept integer-exact on purpose)."""
    feats = char_bigram_buckets(df, id_col, text_col).join(
        df.select(F.col(id_col).alias("doc_id"), F.col(label_col).alias("__lbl")),
        "doc_id",
    )
    counts = feats.groupBy("__lbl", "bucket").agg(F.count("*").alias("c"))
    totals = feats.groupBy("__lbl").agg(F.count("*").alias("tot"))
    w = counts.join(totals, "__lbl").select(
        "__lbl",
        "bucket",
        F.expr(f"(c * {LANGID_SCALE}L) div tot").alias("w"),
    )
    pivoted = (
        w.groupBy("bucket").pivot("__lbl", list(langs)).agg(F.first("w"))
    )
    return pivoted.select(
        "bucket",
        *[F.coalesce(F.col(lg), F.lit(0)).cast("long").alias(f"w_{lg}") for lg in langs],
    )


def lang_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    langs: Sequence[str],
) -> DataFrame:
    """(doc_id, score_<lang>…, predicted_lang): integer score per language
    plus argmax with first-declared-wins tie-break. Documents with unseen
    buckets score those features 0; every input row gets an output row."""
    feats = char_bigram_buckets(df, id_col, text_col)
    joined = feats.join(F.broadcast(weights), "bucket", "left")
    scores = joined.groupBy("doc_id").agg(
        *[
            F.sum(F.coalesce(F.col(f"w_{lg}"), F.lit(0))).alias(f"score_{lg}")
            for lg in langs
        ]
    )
    # texts always emit ≥1 gram, but keep every id via left join anyway
    out = df.select(F.col(id_col).alias("doc_id")).join(
        scores, "doc_id", "left"
    ).select(
        "doc_id",
        *[F.coalesce(F.col(f"score_{lg}"), F.lit(0)).alias(f"score_{lg}") for lg in langs],
    )
    pred = None
    for i, lg in enumerate(langs):
        cond = F.lit(True)
        for other in langs[i + 1 :]:
            cond = cond & (F.col(f"score_{lg}") >= F.col(f"score_{other}"))
        pred = F.when(cond, lg) if pred is None else pred.when(cond, lg)
    return out.withColumn("predicted_lang", pred.otherwise(langs[-1]))
