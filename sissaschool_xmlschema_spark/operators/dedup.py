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

from itertools import combinations
from typing import Optional, Tuple

from pyspark.sql import Column, DataFrame
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
    exact_components: bool = False,
    max_iterations: int = 50,
) -> DataFrame:
    """LSH dedup keep-list ``(id)`` — the production output shape.

    Greedy mode (default): a document is DROPPED iff some band bucket it
    occupies contains a smaller id (its near-dup "predecessor"); kept
    otherwise.  This is the standard greedy MinHash-dedup used on web
    corpora: output and shuffle volume are O(n·bands) regardless of how
    duplicate-dense the corpus is — never the O(cluster²) pair enumeration.
    Greedy keeps exactly the ids that are minimal in every bucket they
    occupy; docs linked only transitively (a~b and b~c share buckets, a and
    c never do) can BOTH survive when each is its own buckets' minimum, and
    a dropped doc's predecessor may itself be dropped (chains).

    ``exact_components=True`` runs iterative min-id label propagation over
    the bipartite (doc ↔ bucket) graph to a fixpoint — exact connected
    components of the LSH candidate graph, keeping exactly one doc (the min
    id) per component.  Each round is two shuffles over O(n·bands) rows and
    the round count is the component diameter (≤ log n rounds for realistic
    cluster shapes); still no pair enumeration anywhere.
    """
    sigs = minhash_signatures(df, id_col, text_col, k, portable, seed)
    buckets = band_buckets(sigs, k, bands)
    if not exact_components:
        mins = buckets.groupBy("band", "bkey").agg(
            F.min("id").alias("_min_id")
        )
        dropped = (
            buckets.join(mins, ["band", "bkey"])
            .filter(F.col("id") > F.col("_min_id"))
            .select("id")
            .distinct()
        )
        return df.select(F.col(id_col).alias("id")).join(
            dropped, "id", "left_anti"
        )

    edges = buckets.select(
        "id", F.concat_ws("|", F.col("band"), F.col("bkey")).alias("bk")
    ).persist()
    labels = edges.select("id").distinct().withColumn("label", F.col("id"))
    for _ in range(max_iterations):
        labels = labels.persist()
        # bucket label = min member label; new doc label = min over its
        # buckets (can only decrease, so min(old, bucket mins) == bucket min
        # for any doc that has buckets — every doc does, it's its own sig)
        bucket_min = (
            edges.join(labels, "id")
            .groupBy("bk")
            .agg(F.min("label").alias("_bmin"))
        )
        new_labels = (
            edges.join(bucket_min, "bk")
            .groupBy("id")
            .agg(F.min("_bmin").alias("label"))
        )
        new_labels = new_labels.persist()
        n_changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if n_changed == 0:
            break
    else:
        raise RuntimeError(
            f"lsh_dedup_keep components did not converge in "
            f"{max_iterations} rounds"
        )
    keep = labels.filter(F.col("label") == F.col("id")).select("id")
    edges.unpersist()
    return keep


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


def _chunk_bits(sig: Column, off: int, w: int) -> Column:
    """Bits [off, off+w) of a 64-bit signature as a long (w == 64 needs the
    all-ones mask written as -1: ``(1 << 64) - 1`` overflows LongType)."""
    shifted = F.shiftrightunsigned(sig, off)
    if w == 64:
        return shifted
    return shifted.bitwiseAND(F.lit((1 << w) - 1))


def simhash_table_params(
    max_hamming: int,
    n_chunks: Optional[int] = None,
    combine: Optional[int] = None,
    allow_weak_keys: bool = False,
) -> Tuple[int, int]:
    """Resolve + validate the (n_chunks, combine) candidate-table scheme.

    The generalized pigeonhole (the permuted-table construction of Manku,
    Jain & Das Sarma, WWW'07 §3, expressed over contiguous chunks): a pair
    within Hamming ≤ k differs in at most k chunks, so at least
    ``n_chunks − k`` chunks are clean, and any pair shares at least one of
    the C(n_chunks, combine) ``combine``-chunk compound keys whenever
    ``combine ≤ n_chunks − k``.  Recall is exact; economics are governed by
    the compound-key width ``combine · (64 // n_chunks)``: the expected
    RANDOM collision rate per pair is ~ tables / 2^width, so keys below
    ~12 bits turn the candidate join quadratic (the round-2 verdict's
    radius-8 finding: 9 chunks → 7-bit keys → n²·9/128 candidates).

    Defaults: ``combine=1, n_chunks=max_hamming+1`` while that keeps keys
    ≥ 12 bits (max_hamming ≤ 4); then ``combine=2, n_chunks=max_hamming+2``
    (radius ≤ 8); then ``combine=3`` (radius ≤ 13, table count grows as
    C(n_chunks, 3)); beyond that the caller must choose explicitly and
    acknowledge weak keys with ``allow_weak_keys=True``.
    """
    if n_chunks is None and combine is None:
        if max_hamming <= 4:
            n_chunks, combine = max_hamming + 1, 1
        elif max_hamming <= 8:
            n_chunks, combine = max_hamming + 2, 2
        elif max_hamming <= 13:
            n_chunks, combine = max_hamming + 3, 3
        else:
            raise ValueError(
                f"max_hamming={max_hamming} has no default table scheme with "
                ">=12-bit keys over a 64-bit SimHash; pass explicit n_chunks/"
                "combine (and allow_weak_keys=True if the keys are narrow) "
                "or use a wider signature"
            )
    elif combine is None:
        combine = 1
    elif n_chunks is None:
        n_chunks = max_hamming + combine
    if combine < 1:
        raise ValueError("combine must be >= 1")
    if n_chunks - combine < max_hamming:
        raise ValueError(
            f"n_chunks={n_chunks}, combine={combine} cannot guarantee recall "
            f"at max_hamming={max_hamming}; pigeonhole needs "
            "n_chunks - combine >= max_hamming"
        )
    if n_chunks > 64:
        raise ValueError("n_chunks cannot exceed the 64 signature bits")
    width = combine * (64 // n_chunks)
    if width < 12 and not allow_weak_keys:
        raise ValueError(
            f"compound keys of ~{width} bits make the candidate join "
            "quadratic (expected random collisions ~ n^2 * tables / 2^width);"
            " raise combine, lower max_hamming, or pass allow_weak_keys=True "
            "to accept the economics explicitly"
        )
    return n_chunks, combine


def _simhash_tables(
    sigs: DataFrame, n_chunks: int, combine: int
) -> DataFrame:
    """``(id, simhash, tbl, ckey)`` — one bucket row per compound-chunk table.

    C(n_chunks, combine) tables; each key concatenates ``combine`` chunk
    slices.  Bucket rows are O(n · tables) — the structure every candidate /
    keep-list consumer joins on.
    """
    slices = _chunk_slices(64, n_chunks)
    tables = []
    for ti, combo in enumerate(combinations(range(n_chunks), combine)):
        parts = [
            _chunk_bits(F.col("simhash"), *slices[c]).cast("string")
            for c in combo
        ]
        key = parts[0] if len(parts) == 1 else F.concat_ws("|", *parts)
        tables.append(
            F.struct(F.lit(ti).alias("tbl"), key.alias("ckey"))
        )
    return sigs.select(
        "id", "simhash", F.explode(F.array(*tables)).alias("c")
    ).select("id", "simhash", "c.tbl", "c.ckey")


def simhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    seed: int = 42,
    n_chunks: Optional[int] = None,
    combine: Optional[int] = None,
    allow_weak_keys: bool = False,
) -> DataFrame:
    """Distinct PRE-VERIFY candidate pairs ``(id_a, id_b, sig_a, sig_b)``.

    Exposed so tests and capacity planning can measure candidate volume
    directly — the economics quantity the table scheme controls (candidates
    ≈ true near-pairs · tables + n²·tables/2^width random collisions)."""
    n_chunks, combine = simhash_table_params(
        max_hamming, n_chunks, combine, allow_weak_keys
    )
    sigs = simhash_signatures(df, id_col, text_col, 64, seed)
    chunks = _simhash_tables(sigs, n_chunks, combine)
    a = chunks.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"),
        "tbl", "ckey",
    )
    b = chunks.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"),
        "tbl", "ckey",
    )
    return (
        a.join(b, ["tbl", "ckey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    seed: int = 42,
    n_chunks: Optional[int] = None,
    combine: Optional[int] = None,
    allow_weak_keys: bool = False,
) -> DataFrame:
    """Near-dup pairs ``(id_a, id_b, hamming)`` with Hamming ≤ max_hamming.

    Candidate generation via :func:`simhash_table_params`'s compound-chunk
    tables (exact recall by pigeonhole), then the true Hamming distance
    (bit_count of XOR) filters.  NOTE: like all pair enumerations, the
    OUTPUT is quadratic in duplicate-cluster size; at corpus scale use
    :func:`simhash_dedup_keep` (O(n·tables) work and O(n) output).
    """
    cands = simhash_candidate_pairs(
        df, id_col, text_col, max_hamming, seed, n_chunks, combine,
        allow_weak_keys,
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cands.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_dedup_keep(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    seed: int = 42,
    n_chunks: Optional[int] = None,
    combine: Optional[int] = None,
    allow_weak_keys: bool = False,
) -> DataFrame:
    """Greedy SimHash dedup keep-list ``(id)`` — the production radius-8 shape.

    A document is DROPPED iff some compound-chunk bucket it occupies has a
    smaller-id member whose VERIFIED Hamming distance is ≤ max_hamming.
    Verification touches only (row, bucket-min) pairs — O(n·tables) work and
    O(n) output no matter how duplicate-dense the corpus is, unlike the pair
    enumeration (quadratic output by definition).  Greedy like
    :func:`lsh_dedup_keep`: chains are possible, and a doc whose bucket min
    is far but whose non-min bucket-mate is near is conservatively KEPT
    (recall of the drop decision trades against never verifying all pairs).
    """
    n_chunks, combine = simhash_table_params(
        max_hamming, n_chunks, combine, allow_weak_keys
    )
    sigs = simhash_signatures(df, id_col, text_col, 64, seed)
    buckets = _simhash_tables(sigs, n_chunks, combine)
    mins = buckets.groupBy("tbl", "ckey").agg(
        F.min("id").alias("_min_id"),
        F.min_by("simhash", "id").alias("_min_sig"),
    )
    ham = F.bit_count(F.col("simhash").bitwiseXOR(F.col("_min_sig")))
    dropped = (
        buckets.join(mins, ["tbl", "ckey"])
        .filter(F.col("id") > F.col("_min_id"))
        .filter(ham <= max_hamming)
        .select("id")
        .distinct()
    )
    return df.select(F.col(id_col).alias("id")).join(dropped, "id", "left_anti")


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
    if n_chunks > 64:
        # same guard as the non-portable twin: >64 chunks would yield
        # zero-width slices whose empty-string keys bucket EVERY document
        # together — a silent full cross join instead of an error
        raise ValueError("n_chunks cannot exceed the 64 signature bits")
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


def portable_simhash_dedup_keep(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    seed: int = 42,
    n_chunks: Optional[int] = None,
) -> DataFrame:
    """Oracle-portable twin of :func:`simhash_dedup_keep` (md5 bit strings,
    single-chunk keys): drop iff some chunk bucket's smallest-id member is
    within Hamming ≤ max_hamming — reproducible byte-for-byte in any SQL
    engine (arg_min + per-character compares)."""
    if n_chunks is None:
        n_chunks = max_hamming + 1
    if n_chunks < max_hamming + 1:
        raise ValueError(
            f"n_chunks={n_chunks} cannot guarantee recall at "
            f"max_hamming={max_hamming}"
        )
    if n_chunks > 64:
        raise ValueError("n_chunks cannot exceed the 64 signature bits")
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
    mins = chunks.groupBy("chunk", "ckey").agg(
        F.min("id").alias("_min_id"),
        F.min_by("sig", "id").alias("_min_sig"),
    )
    ham = sum(
        F.when(
            F.substring(F.col("sig"), b + 1, 1)
            != F.substring(F.col("_min_sig"), b + 1, 1),
            1,
        ).otherwise(0)
        for b in range(64)
    )
    dropped = (
        chunks.join(mins, ["chunk", "ckey"])
        .filter(F.col("id") > F.col("_min_id"))
        .filter(ham <= max_hamming)
        .select("id")
        .distinct()
    )
    return df.select(F.col(id_col).alias("id")).join(dropped, "id", "left_anti")


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    group_col: Optional[str] = None,
    allow_global: bool = False,
) -> DataFrame:
    """Pairs ``(id_a, id_b, cos)`` with cosine ≥ threshold.

    Brute-force within ``group_col`` partitions; the scale path buckets by
    random-hyperplane LSH first (:func:`bucketed_embedding_dup_pairs`).
    Without ``group_col`` the join is a GLOBAL crossJoin — O(n²), only ever
    correct for small n — so that path REQUIRES ``allow_global=True`` as an
    explicit acknowledgement.  The dot product is
    ``aggregate(zip_with(a, b, *), +)`` — pure JVM, no UDF.
    """
    if group_col is None and not allow_global:
        raise ValueError(
            "embedding_dup_pairs without group_col is a global O(n²) "
            "crossJoin — scale-hostile. Pass allow_global=True only for "
            "small inputs, or use bucketed_embedding_dup_pairs(...) "
            "(hyperplane-LSH bucketed) for the scale path."
        )
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
