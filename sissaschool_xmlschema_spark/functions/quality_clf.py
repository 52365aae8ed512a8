"""Trained quality classifier — logistic regression over Column-only text
features, trained by distributed gradient aggregation.

The heuristic filter (functions/text.py:quality_score) has fixed weights; a
real pretraining pipeline LEARNS the filter from labeled seed data (e.g.
"wiki-like" positives vs "spam-like" negatives, the fastText-classifier
recipe from CCNet/LLaMA data prep).  The distributed shape mirrors the BPE
trainer (functions/bpe.py): the heavy pass over the corpus is a Spark
aggregation, the model state (one weight per feature — a few doubles) lives
on the driver, and iteration count is small and fixed.

* :func:`doc_features` — six Gopher/C4-style signals per document, all
  built-in Column algebra (JVM-side, whole-stage codegen, no Python).
* :func:`train_quality_classifier` — full-batch gradient descent: each
  iteration is ONE ``agg`` computing the exact gradient
  ``Σ (σ(w·x) − y)·x`` via map-side partial sums (the shuffle carries one
  partial vector per partition, never rows).  Features are standardized
  with corpus mean/std from a single stats pass so a fixed learning rate
  works across scales.
* :func:`score_quality_clf` — σ(w·x) as a pure Column expression.  With
  published weights this is SQL-replicable — the driver query
  ``quality_clf_score`` hash-matches a DuckDB oracle using the same
  literal weights, while training itself (iterative, float-sum order
  dependent) is pytest-verified.

At 100 TB: training cost is ``iters`` scans of the (tiny, numeric)
feature frame — persist ``doc_features`` once and each iteration is an
in-memory columnar agg; scoring is a row-local projection.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sissaschool_xmlschema_spark.functions.text import (
    mean_token_length,
    punct_ratio,
    stopword_ratio,
    token_count,
)

#: Feature order is part of the model contract.
FEATURE_COLS: Tuple[str, ...] = (
    "f_log_tokens",
    "f_mean_tok_len",
    "f_punct_ratio",
    "f_stop_ratio",
    "f_digit_ratio",
    "f_caps_ratio",
)


def _digit_ratio(text: Column) -> Column:
    n = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    return F.when(F.length(text) > 0, n / F.length(text)).otherwise(F.lit(0.0))


def _caps_ratio(text: Column) -> Column:
    n = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    return F.when(F.length(text) > 0, n / F.length(text)).otherwise(F.lit(0.0))


def doc_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document feature frame ``(id_col, f_*)`` — one row-local pass."""
    t = F.col(text_col)
    return df.select(
        id_col,
        F.log(token_count(t) + F.lit(1.0)).alias("f_log_tokens"),
        mean_token_length(t).cast("double").alias("f_mean_tok_len"),
        punct_ratio(t).cast("double").alias("f_punct_ratio"),
        stopword_ratio(t).cast("double").alias("f_stop_ratio"),
        _digit_ratio(t).cast("double").alias("f_digit_ratio"),
        _caps_ratio(t).cast("double").alias("f_caps_ratio"),
    )


def standardize_stats(
    feats: DataFrame, cols: Sequence[str] = FEATURE_COLS
) -> Dict[str, Tuple[float, float]]:
    """One agg over the feature frame → {col: (mean, std)} (std floored at
    1e-9 so constant features don't divide by zero)."""
    aggs = []
    for c in cols:
        aggs += [F.avg(c).alias(f"{c}_mu"), F.stddev_pop(c).alias(f"{c}_sd")]
    row = feats.agg(*aggs).first()
    return {
        c: (float(row[f"{c}_mu"] or 0.0), max(float(row[f"{c}_sd"] or 0.0), 1e-9))
        for c in cols
    }


def _z(col: str, stats: Dict[str, Tuple[float, float]]) -> Column:
    mu, sd = stats[col]
    return (F.col(col) - F.lit(mu)) / F.lit(sd)


def train_quality_classifier(
    feats: DataFrame,
    label_col: str,
    cols: Sequence[str] = FEATURE_COLS,
    iters: int = 25,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> Dict[str, object]:
    """Full-batch logistic regression by gradient descent.

    ``feats`` must carry ``label_col`` in {0, 1}.  Returns the model dict
    ``{"stats": {col: (mu, sd)}, "weights": [w...], "bias": b}`` where
    weights apply to STANDARDIZED features.  Each iteration runs one agg:
    the gradient is an exact sum — map-side partials mean the driver sees
    one (n_features+1)-vector per shuffle partition.  The feature frame
    should be persisted by the caller for multi-iteration reuse.
    """
    stats = standardize_stats(feats, cols)
    n = feats.count()
    if n == 0:
        raise ValueError("empty training frame")
    w = [0.0] * len(cols)
    b = 0.0
    y = F.col(label_col).cast("double")
    for _ in range(max(iters, 1)):
        margin = F.lit(b)
        for wi, c in zip(w, cols):
            margin = margin + F.lit(wi) * _z(c, stats)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        err = p - y
        grad_aggs = [F.avg(err).alias("g_b")] + [
            F.avg(err * _z(c, stats)).alias(f"g_{i}")
            for i, c in enumerate(cols)
        ]
        g = feats.agg(*grad_aggs).first()
        b -= lr * float(g["g_b"])
        w = [
            wi - lr * (float(g[f"g_{i}"]) + l2 * wi)
            for i, wi in enumerate(w)
        ]
    return {"stats": stats, "weights": w, "bias": b}


def score_quality_clf(
    feats: DataFrame,
    model: Dict[str, object],
    cols: Sequence[str] = FEATURE_COLS,
    out_col: str = "quality_p",
    digits: int = 6,
) -> DataFrame:
    """σ(w·z(x) + b) as a row-local projection, rounded to ``digits`` so
    summation/codegen order can't perturb a value hash."""
    stats: Dict[str, Tuple[float, float]] = model["stats"]  # type: ignore
    margin = F.lit(float(model["bias"]))
    for wi, c in zip(model["weights"], cols):  # type: ignore
        margin = margin + F.lit(float(wi)) * _z(c, stats)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return feats.withColumn(out_col, F.round(p, digits))


#: Published reference model for the oracle-matched scoring query: weights
#: chosen to encode the Gopher-style prior (longer, stopword-bearing text
#: with moderate punctuation is higher quality).  Standardization is
#: identity (mu=0, sd=1) so the DuckDB oracle is a literal formula.
REFERENCE_MODEL: Dict[str, object] = {
    "stats": {c: (0.0, 1.0) for c in FEATURE_COLS},
    "weights": [0.8, 0.3, -2.0, 1.5, -1.0, -0.5],
    "bias": -1.0,
}
