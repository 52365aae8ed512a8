"""Deduplication operators for large-scale training-data pipelines.

No reference counterpart (xmlschema validates, it doesn't dedup) — these are the
north-star "training-data pipeline" extensions, built Spark-first:

* **exact** — fingerprint groupBy (md5 of raw or normalized text); one shuffle
  of (fingerprint, id) pairs.
* **token Jaccard** — exploded distinct tokens self-joined on token: candidate
  pair generation is an equi-join (shuffle on token), never an O(n²) cross join;
  hot tokens are capped (stopword-style document-frequency cut) to bound skew.
* **MinHash + LSH** — signature = k per-token hash minima (one explode + one
  groupBy agg with k min() columns); banding turns near-dup search into an
  equi-join on (band_id, band_key).  Two hash flavors:
  ``portable=True`` uses md5 hex strings (bit-identical in DuckDB → oracle-able);
  ``portable=False`` uses xxhash64 (JVM-native, ~3× faster) for production.
* **SimHash** — 64-bit signature via per-bit weighted majority in one groupBy
  with 64 conditional sums; near-dups via 4×16-bit band equi-join (Hamming ≤ 3
  by pigeonhole needs ≥1 equal band).
* **embedding near-dup** — brute-force all-pairs cosine within small groups, or
  LSH-bucketed via random hyperplanes for scale (see similarity.py).

All operators are pure Column expressions — no Python row path.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(id, token)`` — whitespace-split distinct tokens per document."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
                    )
                )
            ).alias("token"),
        )
    )


def normalized_fingerprint(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """``(id, fp)`` — md5 of the sorted distinct token set.

    Exact dedup modulo token order/multiplicity; md5 is bit-identical across
    engines so the fingerprints themselves are oracle-checkable.
    """
    tokens = F.array_sort(
        F.array_distinct(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
        )
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(F.concat_ws(" ", tokens)).alias("fp"),
    )


def exact_dup_groups(
    df: DataFrame, id_col: str, text_col: str, normalized: bool = False
) -> DataFrame:
    """``(fp, n)`` with n>1 — exact-duplicate groups by content fingerprint."""
    if normalized:
        fps = normalized_fingerprint(df, id_col, text_col)
    else:
        fps = df.select(
            F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("fp")
        )
    return fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") > 1
    )


def token_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: Optional[str] = None,
    max_doc_freq: Optional[int] = None,
) -> DataFrame:
    """Candidate pairs ``(id_a, id_b, inter, n_a, n_b)`` with id_a < id_b.

    Jaccard = inter / (n_a + n_b − inter); returned as raw integers so callers
    can threshold with exact integer arithmetic (td·inter ≥ tn·(n_a+n_b−inter)
    for a rational threshold tn/td) — no float-boundary ambiguity.

    ``max_doc_freq`` drops tokens appearing in more than that many documents
    before the self-join — the skew guard: a stopword present in every document
    would otherwise create an n² hot key on the token shuffle.
    """
    toks = distinct_tokens(df, id_col, text_col)
    if group_col:
        grp = df.select(
            F.col(id_col).alias("id"), F.col(group_col).alias("grp")
        )
        toks = toks.join(grp, "id")
    if max_doc_freq is not None:
        dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
        toks = (
            toks.join(
                F.broadcast(dfreq.filter(F.col("_df") > max_doc_freq)),
                "token",
                "left_anti",
            )
        )
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n_tok"))

    a = toks.select(
        F.col("id").alias("id_a"),
        "token",
        *(["grp"] if group_col else []),
    )
    b = toks.select(
        F.col("id").alias("id_b"),
        "token",
        *(["grp"] if group_col else []),
    )
    on = ["token"] + (["grp"] if group_col else [])
    pairs = (
        a.join(b, on)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_tok").alias("n_b"))
    return pairs.join(sa, "id_a").join(sb, "id_b").select(
        "id_a", "id_b", "inter", "n_a", "n_b"
    )


def jaccard_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_num: int = 4,
    threshold_den: int = 5,
    group_col: Optional[str] = None,
    max_doc_freq: Optional[int] = None,
) -> DataFrame:
    """Pairs with Jaccard ≥ tn/td, thresholded in exact integer arithmetic."""
    p = token_jaccard_pairs(df, id_col, text_col, group_col, max_doc_freq)
    tn, td = threshold_num, threshold_den
    return p.filter(
        (F.lit(td + tn) * F.col("inter"))
        >= (F.lit(tn) * (F.col("n_a") + F.col("n_b")))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    portable: bool = False,
    seed: int = 42,
) -> DataFrame:
    """``(id, h0..h{k-1})`` — k min-hash values over the distinct token set.

    One explode + one groupBy(id) carrying k ``min()`` partial aggregates —
    map-side combine reduces each partition to one k-wide row per id before the
    shuffle.  ``portable=True`` hashes with md5(seed_i || token) and keeps the
    *hex string* minimum (lexicographic order — identical in any engine);
    ``portable=False`` uses xxhash64 (JVM, no string materialization).
    """
    toks = distinct_tokens(df, id_col, text_col)
    if portable:
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{seed}:{i}:"), F.col("token")))).alias(
                f"h{i}"
            )
            for i in range(k)
        ]
    else:
        aggs = [
            F.min(F.xxhash64(F.col("token"), F.lit(seed + i))).alias(f"h{i}")
            for i in range(k)
        ]
    return toks.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Distinct candidate pairs ``(id_a, id_b)`` sharing ≥1 LSH band.

    Signature split into ``bands`` bands of k/bands rows; band key = the
    concatenated band slice.  Pair generation is an equi-join on
    (band, band_key) — documents only meet if a whole band matches, which is
    the classic S-curve collision probability (Broder; Leskovec MMDS ch.3).
    """
    rows_per_band = k // bands
    assert rows_per_band * bands == k, "k must be divisible by bands"
    band_rows = []
    for b in range(bands):
        cols = [
            F.col(f"h{i}").cast("string")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_rows.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("bkey"),
            )
        )
    buckets = signatures.select(
        "id", F.explode(F.array(*band_rows)).alias("b")
    ).select("id", "b.band", "b.bkey")
    a = buckets.select(F.col("id").alias("id_a"), "band", "bkey")
    b_ = buckets.select(F.col("id").alias("id_b"), "band", "bkey")
    return (
        a.join(b_, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    portable: bool = False,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH near-duplicate candidate pairs ``(id_a, id_b)``."""
    sigs = minhash_signatures(df, id_col, text_col, k, portable, seed)
    return lsh_candidate_pairs(sigs, k, bands)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    seed: int = 42,
) -> DataFrame:
    """``(id, simhash)`` — Charikar's similarity hash over token multiset.

    Per bit b: sum over tokens of (+1 if bit b of xxhash64(token) else −1);
    signature bit b = (sum > 0).  One explode + one groupBy(id) with ``bits``
    conditional-sum partials; the signature is assembled in a final projection.
    Uses token *multiplicity* (no distinct) so repeated tokens weight the hash,
    matching the standard SimHash definition.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
        ).alias("token"),
    ).select("id", F.xxhash64(F.col("token"), F.lit(seed)).alias("h"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    sums = toks.groupBy("id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("id", sig.alias("simhash"))


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs ``(id_a, id_b, hamming)`` with Hamming ≤ max_hamming.

    Candidate generation: split the 64-bit signature into 4 16-bit chunks; by
    pigeonhole any pair within Hamming ≤ 3 shares at least one exact chunk, so
    candidates come from a chunk equi-join, then the true Hamming distance
    (bit_count of XOR) filters.
    """
    sigs = simhash_signatures(df, id_col, text_col, 64, seed)
    chunks = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("ckey"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", "c.chunk", "c.ckey")
    a = chunks.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"),
        "chunk", "ckey",
    )
    b = chunks.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"),
        "chunk", "ckey",
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["chunk", "ckey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    group_col: Optional[str] = None,
) -> DataFrame:
    """Pairs ``(id_a, id_b, cos)`` with cosine ≥ threshold.

    Brute-force within ``group_col`` partitions (or globally — only for small
    n); the scale path buckets by random-hyperplane LSH first, see
    ``similarity.hyperplane_buckets``.  The dot product is
    ``aggregate(zip_with(a, b, *), +)`` — pure JVM, no UDF.
    """
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"),
        *([F.col(group_col).alias("grp")] if group_col else []),
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
        *([F.col(group_col).alias("grp")] if group_col else []),
    )
    joined = (
        a.join(b, "grp") if group_col else a.crossJoin(b)
    ).filter(F.col("id_a") < F.col("id_b"))

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cos = dot(F.col("v_a"), F.col("v_b")) / (
        F.sqrt(dot(F.col("v_a"), F.col("v_a")))
        * F.sqrt(dot(F.col("v_b"), F.col("v_b")))
    )
    return joined.select("id_a", "id_b", cos.alias("cos")).filter(
        F.col("cos") >= threshold
    )


def verified_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_num: int = 1,
    threshold_den: int = 2,
    k: int = 16,
    bands: int = 4,
    portable: bool = False,
    seed: int = 42,
) -> DataFrame:
    """The production near-dup flow: MinHash-LSH candidates, then exact
    Jaccard verification on candidate pairs ONLY.

    ``token_jaccard_pairs`` self-joins on tokens — O(df²) rows per hot token.
    This pipeline bounds the expensive step to LSH survivors: candidate pairs
    join each side's (distinct) token array and verify with
    ``array_intersect`` — per-pair work, JVM-side, no explode.  Thresholding
    stays exact integer arithmetic.  This is the shape that survives 100 TB:
    the only all-pairs structure is within LSH buckets.
    """
    cands = minhash_dup_pairs(df, id_col, text_col, k, bands, portable, seed)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
        ).alias("toks"),
    )
    a = toks.select(F.col("id").alias("id_a"), F.col("toks").alias("t_a"))
    b = toks.select(F.col("id").alias("id_b"), F.col("toks").alias("t_b"))
    joined = cands.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("t_a", "t_b"))
    n_a, n_b = F.size("t_a"), F.size("t_b")
    tn, td = threshold_num, threshold_den
    return (
        joined.select(
            "id_a", "id_b",
            inter.alias("inter"),
            n_a.alias("n_a"),
            n_b.alias("n_b"),
        )
        .filter(
            (F.lit(td + tn) * F.col("inter"))
            >= (F.lit(tn) * (F.col("n_a") + F.col("n_b")))
        )
    )
