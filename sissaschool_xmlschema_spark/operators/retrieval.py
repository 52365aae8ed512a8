"""BM25 lexical retrieval over the document corpus.

Curation pipelines retrieve as well as filter: finding the corpus
documents most similar to a probe (contamination auditing, near-match
inspection, hard-negative mining) needs a lexical ranker next to the
embedding ANN tier (operators/similarity.py).  BM25 is the standard.

Distributed shape — everything partial-aggregates before it shuffles:

1. ``bm25_stats`` — one explode over the corpus, one groupBy for document
   frequencies (df) and one tiny agg for (N, avgdl).  The df table is
   pruned to the QUERY's terms before broadcast, so the broadcast is
   O(|query terms|) regardless of vocabulary size.
2. ``bm25_topk`` — per-document score = Σ_t idf(t) · tf·(k1+1) /
   (tf + k1·(1−b+b·dl/avgdl)) over query terms only: the corpus explode
   is semi-joined to the broadcast term list FIRST (everything else never
   leaves the scan), term frequencies partial-aggregate per (doc, term),
   and the final ranking is TakeOrderedAndProject — no global sort.

IDF uses the BM25+-style floor ``ln(1 + (N − df + 0.5)/(df + 0.5))``
(always positive).  Scores round to 6 dp for hash stability; ties break
by doc_id so the top-k is deterministic.  Exactly SQL-replicable →
oracle-able.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _terms(text_col: str):
    """Lowercased whitespace tokens, empties removed — same tokenization as
    :func:`sissaschool_xmlschema_spark.functions.text.whitespace_tokens`, so
    BM25's ``dl`` equals ``text.token_count`` for every document."""
    from ..functions.text import whitespace_tokens

    return whitespace_tokens(F.lower(F.col(text_col)))


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query`` terms: ``(id, score)``.

    One corpus scan: doc lengths ride the same explode that counts term
    frequencies (dl = full token count, computed row-locally before the
    semi-join prunes to query terms).  df/N/avgdl come from corpus aggs
    whose results fold in as broadcast scalars/rows.
    """
    if not query:
        raise ValueError("query must contain at least one term")
    qterms = sorted({t.lower() for t in query})

    toks = df.select(
        id_col,
        F.explode(_terms(text_col)).alias("term"),
        F.size(_terms(text_col)).alias("dl"),
    )
    corpus = df.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(_terms(text_col))).alias("avgdl"),
    )
    matched = toks.filter(F.col("term").isin(qterms))
    # document frequency per query term (distinct docs containing it)
    dfreq = matched.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    tf = matched.groupBy(id_col, "term", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            id_col,
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("contrib"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
