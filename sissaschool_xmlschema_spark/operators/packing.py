"""Training-sequence packing: lay a document corpus out as fixed-length
token sequences.

Part of the LLM-data-pipeline surface this engine adds on top of the
reference's validation semantics (the reference validates documents one at a
time — ``validators/schemas.py:1386-1405`` ``iter_errors`` — and has no
packing analogue; these operators cover what a pretraining pipeline does
*after* validation/dedup has produced a keep-list).

Two tiers, mirroring how real pipelines pack:

``pack_concat_chunks``
    GPT-style concatenate-and-chunk: the corpus is one token stream in a
    deterministic document order, split every ``seq_len`` tokens; documents
    may straddle sequence boundaries.  The global token offset of each
    document is an order-preserving prefix sum, computed scalably as a
    two-phase sum: rows are assigned a *value-derived* bucket (monotone
    ``width_bucket`` over the order column — deterministic across jobs,
    unlike ``spark_partition_id`` after ``repartitionByRange``, whose
    sampled boundaries can differ between the totals action and the window
    action), bucket totals are collected (O(#buckets)) and broadcast back as
    exclusive offsets, and the within-bucket cumsum is a single hash-
    partitioned window — ONE exchange, NO single-partition global window,
    so the plan survives a 100 TB corpus.  Pure prefix-sum math ⇒
    SQL-oracle-able.

``pack_bins_first_fit``
    No-split bin packing (each document lands whole in one sequence,
    remainder is padding): first-fit-decreasing inside each hash partition
    via an Arrow-batched ``applyInPandas`` kernel.  Bins never span
    partitions, so the greedy state is partition-local and the operator is
    embarrassingly parallel; bin ids are globally unique via
    ``(group << 32) | local``.  Stateful greedy ⇒ not SQL-expressible
    (rows-only in the driver gate; pytest verifies capacity, determinism and
    an FFD-beats-next-fit property).
"""
from __future__ import annotations

from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_concat_chunks(
    df: DataFrame,
    id_col: str,
    tok_col: str,
    seq_len: int,
    order_col: Optional[str] = None,
    n_buckets: Optional[int] = None,
) -> DataFrame:
    """Per-document layout under concatenate-and-chunk packing.

    ``order_col`` (default ``id_col``) defines the corpus order; it must be
    numeric, non-null and unique.  Buckets are uniform value slices of its
    [min, max] range (``width_bucket``), so bucket balance tracks key
    uniformity — dense ids and event timestamps are near-uniform; for a
    heavily skewed order key pass a larger ``n_buckets`` (only balance, not
    correctness, depends on it).

    Returns one row per document: ``(id_col, n_tokens, start_tok,
    first_seq, last_seq, n_splits)`` where ``start_tok`` is the document's
    global token offset, ``first_seq``/``last_seq`` the sequence indices it
    touches, and ``n_splits`` how many ``seq_len`` boundaries cut it.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    order_col = order_col or id_col
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # O(1) driver row: the order column's range (scan is pruned to one col).
    rng = df.agg(
        F.min(order_col).alias("mn"), F.max(order_col).alias("mx")
    ).first()
    if rng["mn"] is None:  # empty input
        return spark.createDataFrame(
            [],
            f"{id_col} long, n_tokens long, start_tok long, "
            "first_seq long, last_seq long, n_splits long",
        )

    bucket = F.width_bucket(
        F.col(order_col),
        F.lit(rng["mn"]),
        F.lit(rng["mx"]) + F.lit(1),
        F.lit(n_buckets),
    ).alias("_bkt")
    base = df.select(
        id_col,
        F.col(tok_col).cast("long").alias("n_tokens"),
        order_col,
        bucket,
    )

    # Phase 1: O(#buckets) totals to the driver — the only driver-side data,
    # independent of row count.  The bucket is a pure function of the order
    # value, so this action and the window action below agree by
    # construction (no partitioner-sampling dependence).
    totals = {
        r["_bkt"]: r["_tot"]
        for r in base.groupBy("_bkt")
        .agg(F.sum("n_tokens").alias("_tot"))
        .collect()
    }
    running = 0
    offsets = []
    for bkt in sorted(totals):
        offsets.append((int(bkt), running))
        running += int(totals[bkt] or 0)
    off_df = spark.createDataFrame(offsets, "_bkt long, _off long")

    # Phase 2: within-bucket cumsum (one hash exchange) + broadcast offsets.
    w = Window.partitionBy("_bkt").orderBy(order_col)
    local = base.withColumn("_local_end", F.sum("n_tokens").over(w))
    start = F.col("_off") + F.col("_local_end") - F.col("n_tokens")
    end_m1 = F.greatest(start, start + F.col("n_tokens") - F.lit(1))
    first_seq = F.floor(start / seq_len)
    last_seq = F.floor(end_m1 / seq_len)
    return (
        local.join(F.broadcast(off_df), "_bkt")
        .select(
            id_col,
            F.col("n_tokens"),
            start.alias("start_tok"),
            first_seq.cast("long").alias("first_seq"),
            last_seq.cast("long").alias("last_seq"),
            (last_seq - first_seq).cast("long").alias("n_splits"),
        )
    )


def pack_stats(chunks: DataFrame, seq_len: int) -> DataFrame:
    """One-row summary of a :func:`pack_concat_chunks` layout: total tokens,
    number of ``seq_len`` sequences, documents split across boundaries."""
    return chunks.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.ceil(F.sum("n_tokens") / seq_len).cast("long").alias("n_sequences"),
        F.sum((F.col("n_splits") > 0).cast("long")).alias("n_docs_split"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def pack_bins_first_fit(
    df: DataFrame,
    id_col: str,
    tok_col: str,
    seq_len: int,
    n_groups: int = 64,
) -> DataFrame:
    """First-fit-decreasing no-split packing into ``seq_len``-capacity bins.

    Documents are hash-partitioned into ``n_groups`` independent groups
    (``pmod(xxhash64(id), n_groups)``); FFD runs per group in one
    Arrow-batched pandas kernel.  A document longer than ``seq_len`` gets a
    bin of its own, flagged ``overflow``.  Deterministic: groups are pure
    hash functions of the id and the in-group order is (tokens desc, id asc).

    Scale note: at 10⁹ docs, raise ``n_groups`` so each group fits an Arrow
    batch (~seq count / 500k); packing quality is unaffected because FFD
    waste is a per-group constant factor, and bins never span groups.

    Returns ``(id_col, n_tokens, bin_id, overflow)``.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if n_groups <= 0:
        raise ValueError("n_groups must be positive")

    idc = id_col  # close over strings, not Columns, for the pandas kernel

    def ffd(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(key[0])
        pdf = pdf.sort_values(
            ["n_tokens", idc], ascending=[False, True], kind="mergesort"
        )
        caps: list[int] = []  # remaining capacity per local bin
        bins: list[int] = []
        overflow: list[bool] = []
        for t in pdf["n_tokens"].to_numpy():
            t = int(t)
            if t > seq_len:
                caps.append(0)
                bins.append(len(caps) - 1)
                overflow.append(True)
                continue
            for i, c in enumerate(caps):
                if c >= t:
                    caps[i] = c - t
                    bins.append(i)
                    break
            else:
                caps.append(seq_len - t)
                bins.append(len(caps) - 1)
            overflow.append(False)
        pdf = pdf.assign(
            bin_id=[(gid << 32) | b for b in bins], overflow=overflow
        )
        return pdf[[idc, "n_tokens", "bin_id", "overflow"]]

    prepared = df.select(
        id_col, F.col(tok_col).cast("long").alias("n_tokens")
    ).withColumn(
        "_grp", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)).cast("int")
    )
    return prepared.groupBy("_grp").applyInPandas(
        ffd, schema=f"{id_col} long, n_tokens long, bin_id long, overflow boolean"
    )


def pack_bins_stats(assignments: DataFrame, seq_len: int) -> DataFrame:
    """One-row packing-quality summary for :func:`pack_bins_first_fit`:
    bins used, mean fill ratio over non-overflow bins, padding fraction."""
    per_bin = (
        assignments.filter(~F.col("overflow"))
        .groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("fill"))
    )
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.avg(F.col("fill") / seq_len).alias("mean_fill"),
        (1 - F.sum("fill") / (F.count(F.lit(1)) * seq_len)).alias("padding_frac"),
    )


def chunk_with_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 256,
    stride: int = 192,
) -> DataFrame:
    """Sliding-window chunking for embedding/retrieval corpora.

    Splits each document into whitespace-token windows of ``chunk_tokens``
    advancing by ``stride`` (overlap = chunk_tokens − stride), the standard
    prep for embedding long documents.  Entirely row-local: the window
    starts come from ``sequence()`` and each chunk is a ``slice`` of the
    token array inside the projection — zero shuffle, no Python; a 100 TB
    corpus chunks at scan speed.

    Returns ``(id_col, chunk_idx, start_token, n_chunk_tokens, chunk_text)``
    with one row per window; the final partial window is kept (every token
    lands in at least one chunk).  Documents with NULL text produce no
    rows.  ``stride`` must be in (0, chunk_tokens] — a stride above the
    chunk size would silently drop tokens between windows.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not (0 < stride <= chunk_tokens):
        raise ValueError("stride must be in (0, chunk_tokens]")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # last start: the smallest multiple of stride whose window reaches the
    # final token — stride·ceil((n − chunk)/stride) — so a new window is
    # emitted only when it covers at least one token the previous window
    # missed (n=100, chunk=64, stride=48 → last start 48, not a fully
    # redundant window at 96)
    last_start = (
        F.greatest(
            F.lit(0).cast("long"),
            F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)),
        )
        * F.lit(stride)
    ).cast("int")
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))
    # explicit null filter: Spark's greatest() SKIPS nulls, so a NULL text
    # would otherwise fabricate one empty window instead of zero rows
    tk = df.filter(F.col(text_col).isNotNull()).select(
        id_col, toks.alias("_tk"), starts.alias("_starts")
    )
    exploded = tk.select(
        id_col,
        F.col("_tk"),
        F.posexplode(F.col("_starts")).alias("chunk_idx", "_start"),
    )
    piece = F.slice(F.col("_tk"), F.col("_start") + 1, chunk_tokens)
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("_start").cast("long").alias("start_token"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )
