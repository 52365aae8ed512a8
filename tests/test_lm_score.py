"""Unigram LM quality scoring: smoothing math, OOV handling, determinism."""
import math

import pytest

from sissaschool_xmlschema_spark.functions.lm_score import (
    lm_quality,
    lm_quality_gate,
    train_unigram_lm,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the dog sat"),
            (3, "the the the"),
            (4, "zzz qqq xxx"),
        ],
        "doc_id long, text string",
    )


def test_train_matches_hand_computed(spark):
    # counts: the=5, sat=2, cat=1, dog=1, zzz=1, qqq=1, xxx=1 ; N=12
    vocab, oov = train_unigram_lm(_corpus(spark), "text", vocab_size=3,
                                  alpha=0.5)
    rows = {r["tok"]: r["logp"] for r in vocab.collect()}
    denom = 12 + 0.5 * 4
    # top-3 by (count desc, tok asc): the, sat, cat
    assert set(rows) == {"the", "sat", "cat"}
    assert rows["the"] == pytest.approx(math.log(5.5 / denom))
    assert rows["sat"] == pytest.approx(math.log(2.5 / denom))
    assert rows["cat"] == pytest.approx(math.log(1.5 / denom))
    assert oov == pytest.approx(math.log(0.5 / denom))


def test_scores_and_gate(spark):
    df = _corpus(spark)
    vocab, oov = train_unigram_lm(df, "text", vocab_size=3, alpha=0.5)
    scores = {r["doc_id"]: r for r in
              lm_quality(df, "doc_id", "text", vocab, oov).collect()}
    denom = 12 + 0.5 * 4
    d3 = math.log(5.5 / denom)  # "the the the"
    assert scores[3]["avg_logp"] == pytest.approx(round(d3, 6))
    d4 = math.log(0.5 / denom)  # all OOV
    assert scores[4]["avg_logp"] == pytest.approx(round(d4, 6))
    assert scores[1]["n_tokens"] == 3
    # gate: doc 4 (garbage) scores strictly lowest and is dropped
    kept = lm_quality_gate(
        lm_quality(df, "doc_id", "text", vocab, oov),
        min_avg_logp=(d3 + d4) / 2,
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert 4 not in ids and 3 in ids


def test_vocab_tiebreak_deterministic(spark):
    # all counts equal -> vocab must be the lexicographically first tokens
    df = spark.createDataFrame(
        [(1, "b a d c")], "doc_id long, text string"
    )
    vocab, _ = train_unigram_lm(df, "text", vocab_size=2, alpha=0.5)
    assert sorted(r["tok"] for r in vocab.collect()) == ["a", "b"]


def test_invalid_params(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError):
        train_unigram_lm(df, "text", vocab_size=0)
    with pytest.raises(ValueError):
        train_unigram_lm(df, "text", alpha=0.0)
