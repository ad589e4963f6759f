"""Unit tests for text-analysis operators."""

from pyspark.sql import functions as F

from connect_server_spark.operators.text import (
    alnum_token_count,
    doc_fingerprint,
    language_id,
    punct_ratio,
    quality_score,
    token_count,
)


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], ["t"]).select(
        expr(F.col("t")).alias("out")
    ).collect()[0].out


def test_token_counts(spark):
    assert _one(spark, "The quick brown fox", token_count) == 4
    assert _one(spark, "don't stop-me now", alnum_token_count) == 5


def test_language_id(spark):
    assert _one(spark, "the cat sat on the mat with a hat", language_id) == "en"
    assert _one(spark, "el gato y la casa en un dia", language_id) == "es"
    assert _one(spark, "der hund und die katze ist hier", language_id) == "de"
    assert _one(spark, "lorem ipsum dolor sit amet", language_id) == "und"


def test_punct_ratio(spark):
    assert _one(spark, "abcde!!!!!", punct_ratio) == 0.5


def test_quality_prefers_clean_english(spark):
    good = _one(spark, "the quick brown fox jumps over the lazy dog", quality_score)
    bad = _one(spark, "@@@@ #### $$$$ %%%%", quality_score)
    assert good > bad


def test_fingerprint_order_sensitive(spark):
    a = _one(spark, "alpha beta gamma", doc_fingerprint)
    b = _one(spark, "gamma beta alpha", doc_fingerprint)
    c = _one(spark, "alpha beta gamma", doc_fingerprint)
    assert a == c and a != b
