"""Text-analysis functions: tokens, quality, language ID, fingerprints."""

from pyspark.sql import functions as F

from sissaschool_xmlschema_spark.functions import text as T


def profile(spark, s):
    return (
        spark.createDataFrame([(s,)], "text string")
        .select(T.text_profile(F.col("text")).alias("p"))
        .select("p.*")
        .first()
    )


def test_token_counts(spark):
    p = profile(spark, "hello world  foo")
    assert p["n_tokens"] == 3
    assert p["n_chars"] == 16


def test_bpeish_counts_subwords(spark):
    p = profile(spark, "don't panic, 42!")
    # don | 't | panic | , | 42 | ! → 6 BPE-ish pieces vs 3 whitespace tokens
    assert p["n_bpeish"] == 6
    assert p["n_tokens"] == 3


def test_punct_and_stopword_ratios(spark):
    p = profile(spark, "the cat!!!")
    assert 0.2 < p["punct_ratio"] < 0.4
    assert p["stopword_ratio"] == 0.5


def test_quality_prefers_real_text(spark):
    good = profile(
        spark,
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet forest while the morning sun rises slowly over "
        "the hills and the birds are singing in the trees all around it "
        "today and tomorrow and the day after that as well it seems",
    )
    junk = profile(spark, "!!! ### $$$ %%% ^^^")
    assert good["quality"] > 0.9
    assert junk["quality"] < 0.5


def test_lang_id_markers(spark):
    assert profile(spark, "the cat and the dog of the house")["lang_pred"] == "en"
    assert profile(spark, "el gato y la casa de que")["lang_pred"] == "es"
    assert profile(spark, "le chat est dans les maisons des une")["lang_pred"] == "fr"
    assert profile(spark, "der hund und die katze ist das")["lang_pred"] == "de"
    assert profile(spark, "xyzzy plugh quux")["lang_pred"] == "und"


def test_fingerprint_deterministic_and_edit_robust(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "a b c d e f g h i j"),
            (3, "a b c d e f g h i CHANGED"),
        ],
        "id int, text string",
    )
    exact = df.select("id", T.content_fingerprint(F.col("text")).alias("fp"))
    vals = {r["id"]: r["fp"] for r in exact.collect()}
    assert vals[1] == vals[2] and vals[1] != vals[3]
    # winnowing min-hash over 4-token shingles: a tail edit keeps the minimum
    # with high probability — ids 1 and 3 share 6 of 7 shingles
    rolled = df.select(
        "id", T.content_fingerprint(F.col("text"), window=4).alias("fp")
    )
    rvals = {r["id"]: r["fp"] for r in rolled.collect()}
    assert rvals[1] == rvals[2]
