"""Distribution-drift checks: PSI and KS against a baseline snapshot.

North-star stage with no reference counterpart: the engine compares the current
table's distributions (``ts`` histograms, turn-count histograms, any numeric
column) against a stored baseline snapshot and emits drift scores.

Everything is Column algebra — histograms are one groupBy over a bucket
expression (map-side combined, so the shuffle carries ≤ n_buckets rows per
partition); PSI is a join of two tiny histograms; KS is a window cumulative sum
over the merged value set.  No Python touches row data, so the same code runs
unchanged at 10^12 rows: the only all-to-one step is over ``n_buckets`` rows.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(df: DataFrame, col: str) -> Column:
    """Numeric view of a column; timestamps map through epoch seconds
    (Spark won't cast timestamp→double directly)."""
    dtype = dict(df.dtypes).get(col, "")
    if dtype.startswith("timestamp"):
        return F.unix_timestamp(F.col(col)).cast("double")
    if dtype == "date":
        return F.unix_date(F.col(col)).cast("double")
    return F.col(col).cast("double")


def bucketize(
    df: DataFrame,
    col: str,
    n_buckets: int = 10,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
) -> DataFrame:
    """Histogram ``(bucket, n)`` of ``col`` with equal-width buckets.

    When ``lo``/``hi`` are omitted they are computed in the same job via a
    scalar-aggregate cross join (Catalyst turns the 1-row side into a broadcast);
    fixed bounds make histograms comparable across runs, so snapshots store them.
    """
    src = df.select(_as_double(df, col).alias("v")).where(
        F.col("v").isNotNull()
    )
    if lo is None or hi is None:
        bounds = src.agg(
            F.min("v").alias("_lo"), F.max("v").alias("_hi")
        )
        src = src.crossJoin(F.broadcast(bounds))
        lo_c, hi_c = F.col("_lo"), F.col("_hi")
    else:
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    # degenerate lo == hi (constant column) → zero width → DIVIDE_BY_ZERO
    # under ANSI mode; clamp so every value lands in bucket 0 instead
    width = F.greatest(
        (hi_c - lo_c) / F.lit(float(n_buckets)), F.lit(1e-300)
    )
    raw = F.floor((F.col("v") - lo_c) / width)
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1))
    return (
        src.select(bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi(
    current_hist: DataFrame,
    baseline_hist: DataFrame,
    n_buckets: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two ``(bucket, n)`` histograms.

    PSI = Σ_b (p_b − q_b) · ln(p_b / q_b), with ε-smoothed proportions so empty
    buckets don't blow up.  Returns a single row ``(psi double)``.
    Rule of thumb: <0.1 stable, 0.1–0.25 moderate, >0.25 major drift.
    """
    cur = current_hist.select("bucket", F.col("n").alias("n_cur"))
    base = baseline_hist.select("bucket", F.col("n").alias("n_base"))
    # full outer join on tiny (≤ n_buckets rows) inputs
    joined = cur.join(base, "bucket", "full_outer").select(
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
    )
    totals = joined.agg(
        F.sum("n_cur").alias("t_cur"), F.sum("n_base").alias("t_base")
    )
    j = joined.crossJoin(F.broadcast(totals))
    p = F.col("n_cur") / F.col("t_cur") + F.lit(eps)
    q = F.col("n_base") / F.col("t_base") + F.lit(eps)
    return j.agg(F.sum((p - q) * F.log(p / q)).alias("psi"))


def ks_statistic(
    current: DataFrame,
    baseline: DataFrame,
    col: str,
    allow_exact: bool = False,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic on ``col``.

    D = max over observed values of |ECDF_cur − ECDF_base|, computed with one
    groupBy on the value (map-side combined) and one ordered window for the
    running sums (the reference's order-dependent automaton analogue: a single
    sort, SURVEY.md §2.5).  Returns a single row ``(ks double)``.

    The window has no partition key — a single-partition sort over one row per
    *distinct* value, which is the scale-hostile shape on continuous columns
    at 10^12 rows.  The call therefore REQUIRES ``allow_exact=True`` as an
    explicit acknowledgement that ``col``'s cardinality is bounded (small
    integers, enum codes); for continuous columns use
    :func:`ks_statistic_binned` (the default everywhere else).
    """
    if not allow_exact:
        raise ValueError(
            "ks_statistic computes the EXACT statistic via a single-partition "
            "sort over all distinct values — scale-hostile on continuous "
            "columns. Pass allow_exact=True only when the column's "
            "cardinality is bounded, or use ks_statistic_binned(...)."
        )
    a = current.select(_as_double(current, col).alias("v")).where(
        F.col("v").isNotNull()
    ).groupBy("v").agg(F.count(F.lit(1)).alias("n_a")).withColumn(
        "n_b", F.lit(0).cast("long")
    )
    b = baseline.select(_as_double(baseline, col).alias("v")).where(
        F.col("v").isNotNull()
    ).groupBy("v").agg(F.count(F.lit(1)).alias("n_b")).withColumn(
        "n_a", F.lit(0).cast("long")
    )
    merged = a.unionByName(b).groupBy("v").agg(
        F.sum("n_a").alias("n_a"), F.sum("n_b").alias("n_b")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    totals = merged.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    cdf = merged.select(
        (F.sum("n_a").over(w)).alias("c_a"),
        (F.sum("n_b").over(w)).alias("c_b"),
    ).crossJoin(F.broadcast(totals))
    return cdf.agg(
        F.max(
            F.abs(
                F.col("c_a") / F.col("t_a") - F.col("c_b") / F.col("t_b")
            )
        ).alias("ks")
    )


def drift_report(
    current: DataFrame,
    baseline: DataFrame,
    col: str,
    n_buckets: int = 10,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    ks_bins: Optional[int] = 10_000,
    allow_exact: bool = False,
) -> DataFrame:
    """One-row ``(column, psi, ks)`` report for a column pair of snapshots.

    When no fixed bounds are given, both histograms share the *baseline's*
    min/max (a 1-row collect) — two independently-bounded histograms would be
    incomparable.

    KS defaults to the BINNED path (``ks_bins`` fine-grained buckets): the
    exact KS runs an ordered window over all distinct values — a
    single-partition sort that is the documented scale-hostile shape on
    continuous columns at 10^12 rows.  ``ks_bins=None`` selects the exact
    statistic and additionally requires ``allow_exact=True`` (the explicit
    bounded-cardinality acknowledgement).
    """
    if lo is None or hi is None:
        row = baseline.agg(
            F.min(_as_double(baseline, col)), F.max(_as_double(baseline, col))
        ).first()
        lo = row[0] if lo is None else lo
        hi = row[1] if hi is None else hi
    cur_h = bucketize(current, col, n_buckets, lo, hi)
    base_h = bucketize(baseline, col, n_buckets, lo, hi)
    p = psi(cur_h, base_h, n_buckets)
    if ks_bins:
        k = ks_statistic_binned(current, baseline, col, ks_bins, lo, hi)
    else:
        k = ks_statistic(current, baseline, col, allow_exact=allow_exact)
    return (
        p.crossJoin(k)
        .select(F.lit(col).alias("column"), "psi", "ks")
    )


def tagged_drift_report(
    df: DataFrame,
    col: str,
    current_when: str,
    n_buckets: int = 10,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    eps: float = 1e-6,
    ks_bins: Optional[int] = 10_000,
    allow_exact: bool = False,
) -> DataFrame:
    """PSI + KS when both snapshots live in ONE table (e.g. split by a time
    predicate): a single scan with conditional counts replaces two scans and a
    union — half the I/O of :func:`drift_report` and the same numbers.

    ``current_when`` is a SQL boolean; rows where it holds are "current", the
    rest are the baseline.  Bounds default to the baseline side's min/max.

    KS is BINNED by default (``ks_bins`` buckets over the same bounds): the
    distinct-value cumulative window would be a single-partition sort over
    |distinct(col)| rows — the scale-hostile path on continuous columns.
    ``ks_bins=None`` restores the exact statistic and requires
    ``allow_exact=True`` (the explicit bounded-cardinality acknowledgement).
    """
    if not ks_bins and not allow_exact:
        raise ValueError(
            "tagged_drift_report with ks_bins=None computes the EXACT KS via "
            "a single-partition sort over all distinct values — scale-hostile "
            "on continuous columns. Pass allow_exact=True only when the "
            "column's cardinality is bounded, or keep ks_bins set."
        )
    side = F.expr(current_when)
    v = _as_double(df, col)
    src = df.select(v.alias("v"), side.alias("_cur")).where(
        F.col("v").isNotNull()
    )
    if lo is None or hi is None:
        row = src.filter(~F.col("_cur")).agg(F.min("v"), F.max("v")).first()
        lo = row[0] if lo is None else lo
        hi = row[1] if hi is None else hi
    # constant-column guard: zero width would divide by zero under ANSI mode
    width = ((float(hi) - float(lo)) / float(n_buckets)) or 1e-300
    bucket = F.least(
        F.greatest(F.floor((F.col("v") - F.lit(float(lo))) / F.lit(width)),
                   F.lit(0)),
        F.lit(n_buckets - 1),
    )
    hist = (
        src.groupBy(bucket.cast("int").alias("bucket"))
        .agg(
            F.sum(F.when(F.col("_cur"), 1).otherwise(0)).alias("n_cur"),
            F.sum(F.when(~F.col("_cur"), 1).otherwise(0)).alias("n_base"),
        )
    )
    totals = hist.agg(
        F.sum("n_cur").alias("t_cur"), F.sum("n_base").alias("t_base")
    )
    j = hist.crossJoin(F.broadcast(totals))
    p = F.col("n_cur") / F.col("t_cur") + F.lit(eps)
    q = F.col("n_base") / F.col("t_base") + F.lit(eps)
    psi_df = j.agg(F.sum((p - q) * F.log(p / q)).alias("psi"))

    # KS: one groupBy with conditional counts, then the ordered cumulative
    # window — over ks_bins buckets (scale path) or distinct values (exact)
    if ks_bins:
        kwidth = ((float(hi) - float(lo)) / float(ks_bins)) or 1e-300
        kbucket = F.least(
            F.greatest(
                F.floor((F.col("v") - F.lit(float(lo))) / F.lit(kwidth)),
                F.lit(0),
            ),
            F.lit(ks_bins - 1),
        )
        vals = src.groupBy(kbucket.cast("int").alias("v")).agg(
            F.sum(F.when(F.col("_cur"), 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(~F.col("_cur"), 1).otherwise(0)).alias("n_b"),
        )
    else:
        vals = src.groupBy("v").agg(
            F.sum(F.when(F.col("_cur"), 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(~F.col("_cur"), 1).otherwise(0)).alias("n_b"),
        )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    t2 = vals.agg(F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b"))
    cdf = vals.select(
        F.sum("n_a").over(w).alias("c_a"),
        F.sum("n_b").over(w).alias("c_b"),
    ).crossJoin(F.broadcast(t2))
    ks_df = cdf.agg(
        F.max(F.abs(F.col("c_a") / F.col("t_a")
                    - F.col("c_b") / F.col("t_b"))).alias("ks")
    )
    return psi_df.crossJoin(ks_df).select(
        F.lit(col).alias("column"), "psi", "ks"
    )


def ks_from_histograms(
    current_hist: DataFrame, baseline_hist: DataFrame
) -> DataFrame:
    """KS over two pre-computed ``(bucket, n)`` histograms — one ordered
    cumulative window over ≤ n_buckets rows (the only all-to-one step)."""
    a = current_hist.select("bucket", F.col("n").alias("n_a"))
    b = baseline_hist.select("bucket", F.col("n").alias("n_b"))
    merged = a.join(b, "bucket", "full_outer").select(
        F.col("bucket"),
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    totals = merged.agg(F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b"))
    cdf = merged.select(
        F.sum("n_a").over(w).alias("c_a"),
        F.sum("n_b").over(w).alias("c_b"),
    ).crossJoin(F.broadcast(totals))
    return cdf.agg(
        F.max(F.abs(F.col("c_a") / F.col("t_a")
                    - F.col("c_b") / F.col("t_b"))).alias("ks")
    )


def ks_statistic_binned(
    current: DataFrame,
    baseline: DataFrame,
    col: str,
    n_buckets: int = 10_000,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
) -> DataFrame:
    """KS on fine-grained histograms — the 10^12-row path.

    The exact KS needs an ordered cumulative sum over all *distinct* values;
    for continuous columns that is O(n) rows through a single-partition window
    — fine at 10^6, hostile at 10^12.  Binning first bounds the window input to
    ``n_buckets`` rows and the answer within one bucket's probability mass
    (error ≤ max bucket width density); 10^4 buckets ≈ 3 decimal digits.
    """
    if lo is None or hi is None:
        row = baseline.agg(
            F.min(_as_double(baseline, col)), F.max(_as_double(baseline, col))
        ).first()
        lo = row[0] if lo is None else lo
        hi = row[1] if hi is None else hi
    a = bucketize(current, col, n_buckets, lo, hi)
    b = bucketize(baseline, col, n_buckets, lo, hi)
    return ks_from_histograms(a, b)


# ---------------------------------------------------------------------------
# baseline snapshot store (the compile-once schema analogue: persist the
# reference distribution once, reuse it across validation runs —
# xsd_globals.py:537-578 builds maps once and every validation reuses them)
# ---------------------------------------------------------------------------


def save_baseline(
    df: DataFrame,
    col: str,
    path: str,
    n_buckets: int = 10,
    ks_bins: int = 10_000,
    lineage: str = "",
) -> None:
    """Persist a drift baseline snapshot for ``col`` under ``path``.

    Layout (all parquet, so the store works on any Hadoop filesystem):

    * ``meta``     — one row: column, lo, hi, n_buckets, ks_bins, n_rows,
      lineage (free-form provenance, e.g. the Iceberg snapshot-id the
      baseline was computed from — same role as the checkpoint manifest's
      ``input_lineage``).
    * ``psi_hist`` — the coarse ``(bucket, n)`` histogram PSI compares on.
    * ``ks_hist``  — the fine histogram the binned KS compares on.

    The bounds are frozen at save time: future runs bucketize their data
    with the SAME lo/hi, which is what makes histograms comparable across
    runs (two independently-bounded histograms are not).
    """
    spark = df.sparkSession
    src = df.select(_as_double(df, col).alias("v")).where(
        F.col("v").isNotNull()
    )
    row = src.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    if row["n"] == 0:
        raise ValueError(f"cannot snapshot {col!r}: no non-null values")
    lo, hi, n_rows = float(row["lo"]), float(row["hi"]), int(row["n"])
    meta = spark.createDataFrame(
        [(col, lo, hi, n_buckets, ks_bins, n_rows, lineage)],
        "column string, lo double, hi double, n_buckets int, ks_bins int, "
        "n_rows long, lineage string",
    )
    bucketize(df, col, n_buckets, lo, hi).write.mode("overwrite").parquet(
        f"{path}/psi_hist"
    )
    bucketize(df, col, ks_bins, lo, hi).write.mode("overwrite").parquet(
        f"{path}/ks_hist"
    )
    # meta last: its presence marks the snapshot complete (a crashed save
    # leaves no meta and load_baseline fails loudly)
    meta.write.mode("overwrite").parquet(f"{path}/meta")


def load_baseline(spark, path: str):
    """Load a snapshot written by :func:`save_baseline`; returns
    ``(meta_row, psi_hist_df, ks_hist_df)``."""
    meta = spark.read.parquet(f"{path}/meta").first()
    psi_hist = spark.read.parquet(f"{path}/psi_hist")
    ks_hist = spark.read.parquet(f"{path}/ks_hist")
    return meta, psi_hist, ks_hist


def drift_report_vs_snapshot(
    current: DataFrame, path: str, col: Optional[str] = None
) -> DataFrame:
    """One-row ``(column, psi, ks)`` of ``current`` against a stored snapshot
    — same numbers as :func:`drift_report` against the original baseline
    DataFrame, without rescanning the baseline data.

    The current table is bucketized with the snapshot's frozen bounds and
    bucket counts; only the current side is scanned (the baseline side is
    the ≤ ks_bins-row stored histogram).
    """
    spark = current.sparkSession
    meta, psi_hist, ks_hist = load_baseline(spark, path)
    col = col or meta["column"]
    cur_psi = bucketize(current, col, meta["n_buckets"], meta["lo"],
                        meta["hi"])
    cur_ks = bucketize(current, col, meta["ks_bins"], meta["lo"], meta["hi"])
    p = psi(cur_psi, psi_hist, meta["n_buckets"])
    k = ks_from_histograms(cur_ks, ks_hist)
    return p.crossJoin(k).select(F.lit(col).alias("column"), "psi", "ks")
