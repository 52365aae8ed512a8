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


# ---------------------------------------------------------------------------
# n-gram-profile language ID (batched kernel)
# ---------------------------------------------------------------------------

MULTILINGUAL = [
    ("en", "the cat sat on the mat and it was happy that you are here"),
    ("en", "this is the house that they have built for you and it is big"),
    ("es", "el perro está en la casa y los niños juegan con una pelota"),
    ("es", "las flores de la montaña son más bonitas que las del valle"),
    ("fr", "le chat est dans la maison et les enfants jouent dans une cour"),
    ("fr", "nous sommes pour la paix avec vous et cette idée est plus belle"),
    ("de", "der hund ist nicht mit der katze und das kind ist auf dem weg"),
    ("de", "die kinder werden auch mit einer großen freude für sich singen"),
    ("pt", "o cachorro está em casa e as crianças brincam com uma bola"),
    ("pt", "não foi um dia como os outros mas para ele foi o mais feliz"),
    ("ru", "и он не знал что это было на самом деле но из окна было видно"),
    ("ru", "в лесу было тихо и только с реки было слышно как идет вода"),
    ("zh", "这是一个很大的房子我们的孩子在这里玩得很开心"),
    ("zh", "他说的话是对的但是我们不知道为什么会这样"),
]


def test_lang_model_zero_shot_beats_marker_heuristic(spark):
    """The seed-profile kernel must beat the 4-language Column heuristic on
    non-English rows (the heuristic has no zh/ru/pt markers at all) — the
    round-2 verdict's acceptance test."""
    from sissaschool_xmlschema_spark.functions import text as T
    from sissaschool_xmlschema_spark.functions.lang_model import lang_id_model

    df = spark.createDataFrame(MULTILINGUAL, "lang string, text string")
    scored = lang_id_model(df, "text").withColumn(
        "heur", T.lang_id(F.col("text"))
    ).collect()
    non_en = [r for r in scored if r["lang"] != "en"]
    model_acc = sum(r["lang_pred"] == r["lang"] for r in non_en) / len(non_en)
    heur_acc = sum(r["heur"] == r["lang"] for r in non_en) / len(non_en)
    assert model_acc > heur_acc
    assert model_acc >= 0.9
    # English still recognized
    assert all(r["lang_pred"] == "en" for r in scored if r["lang"] == "en")


def test_lang_model_trained_profiles(spark):
    """train_lang_profiles learns from a labeled corpus (one distributed
    explode+groupBy+top-k pass) and classifies held-out text correctly."""
    from sissaschool_xmlschema_spark.functions.lang_model import (
        lang_id_model,
        train_lang_profiles,
    )

    train = spark.createDataFrame(MULTILINGUAL, "lang string, text string")
    profiles = train_lang_profiles(train, "text", "lang", top_k=200)
    assert set(profiles) == {"en", "es", "fr", "de", "pt", "ru", "zh"}
    held_out = spark.createDataFrame(
        [
            ("en", "you said that it was the best and they have it"),
            ("es", "que los perros y las casas están en el campo"),
            ("de", "das ist nicht der weg und die kinder sind mit uns"),
            ("ru", "это было не так и он знал что из этого выйдет"),
            ("zh", "我们的房子是很大的他说这是对的"),
        ],
        "lang string, text string",
    )
    got = lang_id_model(held_out, "text", profiles).collect()
    acc = sum(r["lang_pred"] == r["lang"] for r in got) / len(got)
    assert acc >= 0.8


def test_lang_model_empty_and_unknown(spark):
    from sissaschool_xmlschema_spark.functions.lang_model import (
        lang_id_model,
        profiles_from_seed_words,
        score_text,
    )

    profiles = profiles_from_seed_words(["en", "de"])
    assert score_text("", profiles) == "und"
    df = spark.createDataFrame([("",), ("12345 67890",)], "text string")
    got = [r["lang_pred"] for r in lang_id_model(df, "text", profiles).collect()]
    assert got[0] == "und"


def test_normalize_text(spark):
    from pyspark.sql import functions as F

    from sissaschool_xmlschema_spark.functions.text import normalize_text

    rows = [
        (0, "  a​ b\tc\n\nd  "),
        (1, "x\x00y\x1fz"),
        (2, "Keep Case"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.norm
        for r in df.select(
            "doc_id", normalize_text(F.col("text")).alias("norm")
        ).collect()
    }
    assert out[0] == "a b c d"     # zero-width removed BEFORE collapsing
    assert out[1] == "xyz"          # control chars stripped
    assert out[2] == "Keep Case"    # lowercase off by default
    assert out[3] is None
    low = df.select(
        normalize_text(F.col("text"), lowercase=True).alias("n")
    ).collect()[2].n
    assert low == "keep case"
