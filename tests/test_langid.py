"""Trained hashed-feature lang-id (operators/langid.py): on REAL
multilingual text — which the synthetic corpus can't provide — the
classifier must learn from labeled examples and predict held-out sentences
correctly. Also pins the integer-exactness contract the oracle relies on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.langid import (
    LANGID_SCALE,
    lang_scores,
    lang_train,
)

LANGS = ["en", "de", "es", "fr"]

TRAIN = [
    ("en", "the quick brown fox jumps over the lazy dog in the garden"),
    ("en", "she was reading a book about the history of science and nature"),
    ("en", "they have been working together on this project for many years"),
    ("de", "der schnelle braune fuchs springt über den faulen hund im garten"),
    ("de", "sie las ein buch über die geschichte der wissenschaft und natur"),
    ("de", "wir haben seit vielen jahren gemeinsam an diesem projekt gearbeitet"),
    ("es", "el rápido zorro marrón salta sobre el perro perezoso en el jardín"),
    ("es", "ella estaba leyendo un libro sobre la historia de la ciencia"),
    ("es", "han estado trabajando juntos en este proyecto durante muchos años"),
    ("fr", "le renard brun rapide saute par dessus le chien paresseux au jardin"),
    ("fr", "elle lisait un livre sur l'histoire de la science et la nature"),
    ("fr", "ils travaillent ensemble sur ce projet depuis de nombreuses années"),
]

HELD_OUT = [
    ("en", "the children were playing with the dog near the old house"),
    ("de", "die kinder spielten mit dem hund in der nähe des alten hauses"),
    ("es", "los niños jugaban con el perro cerca de la casa vieja"),
    ("fr", "les enfants jouaient avec le chien près de la vieille maison"),
]


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame(
        [(i, lg, tx) for i, (lg, tx) in enumerate(TRAIN)], "doc_id long, lang string, text string"
    )
    return lang_train(train, "doc_id", "text", "lang", LANGS)


def test_held_out_sentences_classified(spark, model):
    test = spark.createDataFrame(
        [(i, lg, tx) for i, (lg, tx) in enumerate(HELD_OUT)],
        "doc_id long, lang string, text string",
    )
    scored = lang_scores(test, "doc_id", "text", model, LANGS)
    got = {
        r.doc_id: r.predicted_lang
        for r in scored.collect()
    }
    want = {i: lg for i, (lg, _) in enumerate(HELD_OUT)}
    assert got == want


def test_weights_are_bounded_micro_ints(model):
    rows = model.collect()
    assert len(rows) > 0
    for r in rows:
        for lg in LANGS:
            w = r[f"w_{lg}"]
            assert isinstance(w, int) and 0 <= w <= LANGID_SCALE


def test_every_doc_scores_even_degenerate(spark, model):
    """Empty and 1-char texts emit a degenerate gram and still predict."""
    test = spark.createDataFrame(
        [(1, ""), (2, "x"), (3, "   ")], "doc_id long, text string"
    )
    scored = lang_scores(test, "doc_id", "text", model, LANGS)
    assert scored.count() == 3
    assert all(r.predicted_lang in LANGS for r in scored.collect())


def test_scores_are_exact_integers(spark, model):
    test = spark.createDataFrame([(1, "the dog and the fox")], "doc_id long, text string")
    r = lang_scores(test, "doc_id", "text", model, LANGS).collect()[0]
    for lg in LANGS:
        assert isinstance(r[f"score_{lg}"], int)
