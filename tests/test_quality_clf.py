"""Trained quality classifier (functions/quality_clf.py)."""

from pyspark.sql import functions as F

from sissaschool_xmlschema_spark.functions.quality_clf import (
    FEATURE_COLS,
    REFERENCE_MODEL,
    doc_features,
    score_quality_clf,
    standardize_stats,
    train_quality_classifier,
)

GOOD = [
    "the quick brown fox jumps over the lazy dog and runs to the river",
    "this is a well formed sentence with common words and a natural flow",
    "an example of ordinary prose that a quality filter should be happy with",
    "it is that kind of text which reads as plain english for the most part",
]
BAD = [
    "!!! $$$ ### @@@ %%% ^^^ &&&",
    "101010 383838 92929 11111 00000",
    "XXXX YYYY ZZZZ AAAA BBBB CCCC",
    "%%% 123 %%% 456 %%% 789 %%%",
]


def _labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_features_shape_and_ranges(spark):
    feats = doc_features(_labeled(spark), "doc_id", "text")
    assert set(feats.columns) == {"doc_id", *FEATURE_COLS}
    row = feats.filter(F.col("doc_id") == 100).first()  # "!!! $$$ ..." doc
    assert row.f_punct_ratio > 0.5 and row.f_stop_ratio == 0.0


def test_training_separates_planted_labels(spark):
    df = _labeled(spark)
    feats = doc_features(df, "doc_id", "text").join(
        df.select("doc_id", "label"), "doc_id"
    ).persist()
    model = train_quality_classifier(feats, "label", iters=50, lr=0.5)
    scored = score_quality_clf(feats, model)
    good = [r.quality_p for r in scored.filter("label = 1").collect()]
    bad = [r.quality_p for r in scored.filter("label = 0").collect()]
    assert min(good) > max(bad)  # perfect separation on separable data
    assert min(good) > 0.5 and max(bad) < 0.5
    feats.unpersist()


def test_training_is_deterministic_given_data(spark):
    df = _labeled(spark)
    feats = doc_features(df, "doc_id", "text").join(
        df.select("doc_id", "label"), "doc_id"
    ).persist()
    m1 = train_quality_classifier(feats, "label", iters=5)
    m2 = train_quality_classifier(feats, "label", iters=5)
    assert all(abs(a - b) < 1e-12 for a, b in zip(m1["weights"], m2["weights"]))
    feats.unpersist()


def test_constant_feature_std_floor(spark):
    df = spark.createDataFrame(
        [(1, "same same"), (2, "same same")], "doc_id long, text string"
    )
    stats = standardize_stats(doc_features(df, "doc_id", "text"))
    assert all(sd > 0 for _, sd in stats.values())


def test_reference_model_scoring_monotone(spark):
    """REFERENCE_MODEL encodes the Gopher prior: prose beats punctuation
    noise."""
    df = _labeled(spark)
    scored = score_quality_clf(
        doc_features(df, "doc_id", "text"), REFERENCE_MODEL
    ).join(df.select("doc_id", "label"), "doc_id")
    good = [r.quality_p for r in scored.filter("label = 1").collect()]
    bad = [r.quality_p for r in scored.filter("label = 0").collect()]
    assert min(good) > max(bad)
