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
  with 64 conditional sums; near-dups via a chunk equi-join with the chunk
  count DERIVED from max_hamming (pigeonhole: Hamming ≤ k pairs share a chunk
  only with ≥ k+1 chunks — fewer chunks than that raises).  A portable md5
  bit-string flavor exists for cross-engine oracle checks.
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


def band_buckets(
    signatures: DataFrame,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """``(id, band, bkey)`` — one LSH bucket row per band per document.

    Signature split into ``bands`` bands of k/bands rows; band key = md5 of
    the concatenated band slice.  The classic S-curve threshold is
    (1/bands)^(bands/k) (Broder; Leskovec MMDS ch.3).
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
    return signatures.select(
        "id", F.explode(F.array(*band_rows)).alias("b")
    ).select("id", "b.band", "b.bkey")


def lsh_candidate_pairs(
    signatures: DataFrame,
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Distinct candidate pairs ``(id_a, id_b)`` sharing ≥1 LSH band.

    Pair generation is an equi-join on (band, band_key) — documents only
    meet if a whole band matches.  NOTE: on a duplicate-dense corpus the
    OUTPUT itself is quadratic in cluster size (a clique of m dups is m²/2
    pairs); when the goal is dedup rather than pair analysis, use
    :func:`lsh_dedup_keep`, whose output is O(n).
    """
    buckets = band_buckets(signatures, k, bands)
    a = buckets.select(F.col("id").alias("id_a"), "band", "bkey")
    b_ = buckets.select(F.col("id").alias("id_b"), "band", "bkey")
    return (
        a.join(b_, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_dedup_keep(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 24,
    bands: int = 8,
    portable: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Greedy LSH dedup keep-list ``(id)`` — the production output shape.

    A document is DROPPED iff some band bucket it occupies contains a
    smaller id (its near-dup "predecessor"); kept otherwise.  This is the
    standard greedy MinHash-dedup used on web corpora: output and shuffle
    volume are O(n·bands) regardless of how duplicate-dense the corpus is —
    never the O(cluster²) pair enumeration.  (Chains are possible: a dropped
    doc's predecessor may itself be dropped; exact connected components
    would need iterative min-propagation, deliberately not done here.)
    """
    sigs = minhash_signatures(df, id_col, text_col, k, portable, seed)
    buckets = band_buckets(sigs, k, bands)
    mins = buckets.groupBy("band", "bkey").agg(F.min("id").alias("_min_id"))
    dropped = (
        buckets.join(mins, ["band", "bkey"])
        .filter(F.col("id") > F.col("_min_id"))
        .select("id")
        .distinct()
    )
    return df.select(F.col(id_col).alias("id")).join(dropped, "id", "left_anti")


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


def _chunk_slices(bits: int, n_chunks: int) -> list:
    """Split ``bits`` into ``n_chunks`` contiguous (offset, width) slices,
    distributing the remainder over the leading chunks."""
    base, rem = divmod(bits, n_chunks)
    out, pos = [], 0
    for i in range(n_chunks):
        w = base + (1 if i < rem else 0)
        out.append((pos, w))
        pos += w
    return out


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    seed: int = 42,
    n_chunks: Optional[int] = None,
) -> DataFrame:
    """Near-dup pairs ``(id_a, id_b, hamming)`` with Hamming ≤ max_hamming.

    Candidate generation: split the 64-bit signature into ``n_chunks``
    contiguous chunks — by pigeonhole, any pair within Hamming ≤ n_chunks − 1
    shares at least one exact chunk, so candidates come from a chunk
    equi-join, then the true Hamming distance (bit_count of XOR) filters.

    ``n_chunks`` defaults to ``max_hamming + 1`` (the minimum that makes the
    recall guarantee hold); passing fewer chunks than that raises — a caller
    must never silently get a pair set weaker than its parameters advertise.
    """
    if n_chunks is None:
        n_chunks = max_hamming + 1
    if n_chunks < max_hamming + 1:
        raise ValueError(
            f"n_chunks={n_chunks} cannot guarantee recall at "
            f"max_hamming={max_hamming}; pigeonhole needs >= max_hamming+1 "
            "chunks"
        )
    if n_chunks > 64:
        raise ValueError("n_chunks cannot exceed the 64 signature bits")
    sigs = simhash_signatures(df, id_col, text_col, 64, seed)
    chunks = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), off)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("ckey"),
                    )
                    for ci, (off, w) in enumerate(_chunk_slices(64, n_chunks))
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


def portable_simhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seed: int = 42,
) -> DataFrame:
    """``(id, sig)`` — SimHash as a 64-char '0'/'1' *bit string* built from md5.

    Oracle-portable flavor: per-token bit b is the high bit of the b-th hex
    digit of md5, i.e. ``substr(hex, b+1, 1) >= '8'`` — an expression any SQL
    engine reproduces byte-for-byte (two md5 calls give the 64 digits).  The
    xxhash64/long flavor (:func:`simhash_signatures`) stays the production
    path; this one exists so the pair set is hash-checkable cross-engine.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
        ).alias("token"),
    ).select(
        "id",
        F.concat(
            F.md5(F.concat(F.lit(f"{seed}:a:"), F.col("token"))),
            F.md5(F.concat(F.lit(f"{seed}:b:"), F.col("token"))),
        ).alias("hex"),
    )
    aggs = [
        F.sum(
            F.when(F.substring(F.col("hex"), b + 1, 1) >= "8", 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    sums = toks.groupBy("id").agg(*aggs)
    sig = F.concat(
        *[
            F.when(F.col(f"b{b}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for b in range(64)
        ]
    )
    return sums.select("id", sig.alias("sig"))


def portable_simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    seed: int = 42,
    n_chunks: Optional[int] = None,
) -> DataFrame:
    """Portable (md5 bit-string) SimHash near-dup pairs, same banding contract
    as :func:`simhash_dup_pairs`; Hamming = count of differing bit chars."""
    if n_chunks is None:
        n_chunks = max_hamming + 1
    if n_chunks < max_hamming + 1:
        raise ValueError(
            f"n_chunks={n_chunks} cannot guarantee recall at "
            f"max_hamming={max_hamming}"
        )
    sigs = portable_simhash_signatures(df, id_col, text_col, seed)
    chunks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("chunk"),
                        F.substring(F.col("sig"), off + 1, w).alias("ckey"),
                    )
                    for ci, (off, w) in enumerate(_chunk_slices(64, n_chunks))
                ]
            )
        ).alias("c"),
    ).select("id", "sig", "c.chunk", "c.ckey")
    a = chunks.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "chunk", "ckey"
    )
    b = chunks.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "chunk", "ckey"
    )
    ham = sum(
        F.when(
            F.substring(F.col("sig_a"), bb + 1, 1)
            != F.substring(F.col("sig_b"), bb + 1, 1),
            1,
        ).otherwise(0)
        for bb in range(64)
    ).cast("long")
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


def bucketed_embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    planes: Optional[list] = None,
) -> DataFrame:
    """The scale path for embedding near-dup: random-hyperplane LSH bucket as
    the join key, so the only all-pairs structure is WITHIN buckets
    (~n/2^n_planes rows each) — never a global crossJoin.  Recall is the LSH
    collision probability (raise it by lowering n_planes or multiprobing);
    pass ``planes`` from ``similarity.portable_planes`` for an
    oracle-reproducible bucket assignment.
    """
    from sissaschool_xmlschema_spark.operators.similarity import bucket_expr

    src = df.withColumn(
        "_bucket", bucket_expr(vec_col, n_planes, dim, seed, planes)
    )
    return embedding_dup_pairs(
        src, id_col, vec_col, threshold, group_col="_bucket"
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
    tok_arr = F.array_distinct(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    )
    if not portable:
        # production flavor: verify over 64-bit token hashes — per-pair
        # array_intersect on longs is ~3x cheaper than on strings (no string
        # hashing/compare per element); 64-bit collisions are negligible at
        # any realistic vocabulary.  The portable flavor keeps raw strings
        # so the DuckDB oracle reproduces intersections exactly.
        tok_arr = F.array_distinct(
            F.transform(tok_arr, lambda t: F.xxhash64(t))
        )
    toks = df.select(F.col(id_col).alias("id"), tok_arr.alias("toks"))
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
