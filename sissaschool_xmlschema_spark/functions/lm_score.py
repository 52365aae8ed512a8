"""Unigram language-model quality scoring (KenLM-style quality filter,
reduced to the unigram case so it stays exactly SQL-replicable).

Pretraining pipelines score documents by mean token log-probability under a
corpus LM and gate on thresholds/quantiles.  The distributed shape:

1. ``train_unigram_lm`` — explode whitespace tokens, one map-side-combined
   ``groupBy`` for counts, deterministic top-``vocab_size`` (count desc,
   token asc → ``TakeOrderedAndProject``), add-α smoothing.  The trained
   model is a ≤``vocab_size``-row DataFrame — broadcastable by construction.
2. ``lm_quality`` — explode document tokens, broadcast-join the vocab,
   ``coalesce`` to the OOV log-probability, one ``groupBy(doc)`` average.

Everything is built-in Column algebra (no Python in the hot path); scores
are rounded to 6 dp so the double-summation order can't perturb the oracle
hash.  The reference analogue is facet-style per-value scoring feeding a
verdict (``validators/facets.py`` predicates); the LM score is the
pipeline-side generalization this engine adds.
"""
from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    """Lower-cased single-space tokens — the corpus convention shared with
    the DuckDB oracles (``string_split(lower(text), ' ')``)."""
    return F.split(F.lower(F.col(text_col)), " ")


def train_unigram_lm(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 10_000,
    alpha: float = 0.5,
) -> Tuple[DataFrame, float]:
    """Train the smoothed unigram LM over ``df[text_col]``.

    Returns ``(vocab_df, oov_logp)`` where ``vocab_df`` has columns
    ``(tok, logp)`` (≤ ``vocab_size`` rows, deterministic tie-break by
    token) and ``oov_logp`` is the add-α probability mass for any token
    outside the vocabulary.  ``N`` in the denominator is the TOTAL corpus
    token count (vocab and non-vocab alike), so scores are comparable
    across vocab sizes.
    """
    if vocab_size <= 0:
        raise ValueError("vocab_size must be positive")
    if alpha <= 0:
        raise ValueError("alpha must be positive")

    counts = (
        df.select(F.explode(_tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_total = counts.agg(F.sum("c")).first()[0] or 0
    denom = float(n_total) + alpha * (vocab_size + 1)
    vocab = (
        counts.orderBy(F.desc("c"), F.asc("tok"))
        .limit(vocab_size)
        .select("tok", F.log((F.col("c") + alpha) / F.lit(denom)).alias("logp"))
    )
    import math

    return vocab, math.log(alpha / denom)


def lm_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    oov_logp: float,
) -> DataFrame:
    """Per-document mean token log-probability under a trained unigram LM.

    Returns ``(id_col, n_tokens, avg_logp)`` with ``avg_logp`` rounded to
    6 dp.  The vocab join is an explicit broadcast (≤ vocab_size rows).
    """
    toks = df.select(id_col, F.explode(_tokens(text_col)).alias("tok"))
    scored = toks.join(F.broadcast(vocab), "tok", "left").select(
        id_col, F.coalesce("logp", F.lit(oov_logp)).alias("logp")
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("logp"), 6).alias("avg_logp"),
    )


def lm_quality_gate(
    scores: DataFrame, min_avg_logp: float
) -> DataFrame:
    """Keep-list gate on the LM score: documents whose mean token
    log-probability clears the threshold (higher = more typical of the
    corpus; heavy-OOV / boilerplate-free garbage scores low)."""
    return scores.filter(F.col("avg_logp") >= min_avg_logp)
