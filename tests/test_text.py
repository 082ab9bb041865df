from __future__ import annotations

from pyspark.sql import functions as F

from advanced_real_time_data_pipeline_and_analytical_processing_spark.operators import text


def one(spark, t, col):
    df = spark.createDataFrame([(t,)], "text string")
    return df.select(col(F.col("text")).alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert one(spark, "a b  c", text.token_count) == 3
    assert one(spark, "", text.token_count) == 0
    assert one(spark, "   ", text.token_count) == 0
    assert one(spark, "word", text.token_count) == 1


def test_bpe_ish_token_count(spark):
    # "hello, world42" -> hello , world 42
    assert one(spark, "hello, world42", text.bpe_ish_token_count) == 4


def test_punct_ratio(spark):
    assert one(spark, "abcd", text.punct_ratio) == 0.0
    assert one(spark, "a!b!", text.punct_ratio) == 0.5


def test_lang_id_markers(spark):
    assert one(spark, "the cat and the dog of the house", text.lang_id) == "en"
    assert one(spark, "der hund und die katze ist hier", text.lang_id) == "de"
    assert one(spark, "xyz qqq zzz", text.lang_id) == "und"


def test_lang_id_first_wins_on_tie(spark):
    # 'la' is in both es and fr lexicons; es checked first in LANG_MARKERS order
    assert one(spark, "la la", text.lang_id) == "es"


def test_fingerprint_normalization(spark):
    a = one(spark, "Hello   World", text.fingerprint)
    b = one(spark, "  hello world ", text.fingerprint)
    c = one(spark, "hello worlds", text.fingerprint)
    assert a == b
    assert a != c


def test_quality_score_bounds(spark):
    df = spark.createDataFrame([("x" * 600,), ("!!!???!!!",)], "text string")
    vals = [r["q"] for r in df.select(text.quality_score(F.col("text")).alias("q")).collect()]
    assert vals[0] == 1.0  # long clean text maxes out
    assert 0.0 <= vals[1] < 0.5  # punctuation soup penalized


def test_text_profile_schema(spark):
    df = spark.createDataFrame([(1, "the quick fox")], "doc_id bigint, text string")
    row = text.text_profile(df, "doc_id", "text").collect()[0]
    assert row["n_tokens"] == 3
    assert row["lang_pred"] == "en"
    assert len(row["fp"]) == 64
