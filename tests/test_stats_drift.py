"""Single-pass stats and drift operators (north-star §2.4 additions)."""

import pytest
from pyspark.sql import functions as F

from sissaschool_xmlschema_spark.operators import drift, stats


def test_column_stats_exact(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, None), (None, "a")], "x int, s string"
    )
    row = stats.column_stats(
        df, numeric_cols=["x"], string_cols=["s"], exact=True, quantiles=(0.5,)
    ).first()
    assert row["n_rows"] == 4
    assert row["x_nulls"] == 1
    assert row["x_distinct"] == 2
    assert row["s_nulls"] == 1
    assert row["s_distinct"] == 2
    assert row["x_min"] == 1 and row["x_max"] == 2
    assert row["x_p50"] == 2.0  # quantiles flatten to scalar columns
    assert row["s_minlen"] == 1 and row["s_maxlen"] == 1


def test_column_stats_grouping_sets(spark):
    df = spark.createDataFrame(
        [("g1", 1), ("g1", 2), ("g2", 3)], "g string, x int"
    )
    out = stats.column_stats(
        df, numeric_cols=["x"], grouping=["g"], exact=True, quantiles=()
    )
    rows = {r["g"]: r["n_rows"] for r in out.collect()}
    # per-group rows plus the global (NULL-key) rollup in one pass
    assert rows == {"g1": 2, "g2": 1, None: 3}


def test_hll_close_to_exact(spark):
    df = spark.range(10000).select(F.col("id").alias("x"))
    row = stats.column_stats(
        df, numeric_cols=["x"], exact=False, quantiles=(), rsd=0.02
    ).first()
    assert abs(row["x_distinct"] - 10000) / 10000 < 0.06


def test_psi_zero_for_identical(spark):
    df = spark.range(1000).select((F.col("id") % 50).alias("v"))
    h = drift.bucketize(df, "v", 10, 0, 50)
    val = drift.psi(h, h).first()["psi"]
    assert abs(val) < 1e-9


def test_psi_detects_shift(spark):
    base = spark.range(1000).select((F.col("id") % 50).alias("v"))
    cur = spark.range(1000).select((F.col("id") % 50 + 30).alias("v"))
    rep = drift.drift_report(cur, base, "v", n_buckets=10, lo=0, hi=80)
    row = rep.first()
    assert row["psi"] > 0.25  # major drift
    assert row["ks"] > 0.3


def test_ks_bounds(spark):
    a = spark.range(500).select((F.col("id") % 10).alias("v"))
    b = spark.range(500).select((F.col("id") % 10).alias("v"))
    assert drift.ks_statistic(a, b, "v", allow_exact=True).first()["ks"] == 0.0
    c = spark.range(500).select((F.col("id") % 10 + 100).alias("v"))
    # disjoint supports → KS = 1
    assert drift.ks_statistic(a, c, "v", allow_exact=True).first()["ks"] == 1.0


def test_drift_on_timestamp_column(spark):
    df = spark.sql(
        "SELECT timestamp_seconds(1704067200 + id * 60) AS ts FROM range(100)"
    )
    rep = drift.drift_report(df, df, "ts", n_buckets=5)
    row = rep.first()
    assert abs(row["psi"]) < 1e-9 and row["ks"] == 0.0


def test_quantile_alias_no_collision(spark):
    """0.999 and 1.0 must not both alias to p100 (round-2 advice): suffixes
    come from the full decimal, and duplicates raise."""
    from sissaschool_xmlschema_spark.operators.stats import (
        _quantile_suffix,
        column_stats,
    )

    assert _quantile_suffix(0.5) == "p50"
    assert _quantile_suffix(0.95) == "p95"
    assert _quantile_suffix(0.999) == "p99_9"
    assert _quantile_suffix(1.0) == "p100"
    df = spark.createDataFrame([(i,) for i in range(100)], "x int")
    out = column_stats(df, numeric_cols=["x"], exact=True,
                       quantiles=(0.95, 0.999, 1.0))
    assert {"x_p95", "x_p99_9", "x_p100"} <= set(out.columns)
    row = out.first()
    assert row["x_p100"] == 99.0
    with pytest.raises(ValueError, match="duplicate"):
        column_stats(df, numeric_cols=["x"], exact=True,
                     quantiles=(0.95, 0.94999999999))


def test_baseline_snapshot_roundtrip(spark, tmp_path):
    """save_baseline → drift_report_vs_snapshot gives the SAME psi/ks as the
    two-DataFrame drift_report, without rescanning the baseline (round-2
    verdict item 2: the compile-once schema analogue for drift)."""
    base = spark.createDataFrame(
        [(float(i % 50),) for i in range(2000)], "x double"
    )
    cur = spark.createDataFrame(
        [(float((i % 50) + 8),) for i in range(1500)], "x double"
    )
    path = str(tmp_path / "snap")
    drift.save_baseline(base, "x", path, n_buckets=10, ks_bins=500,
                        lineage="test-snapshot-v1")
    direct = drift.drift_report(cur, base, "x", n_buckets=10,
                                ks_bins=500).first()
    via_snap = drift.drift_report_vs_snapshot(cur, path).first()
    assert abs(direct["psi"] - via_snap["psi"]) < 1e-9
    assert abs(direct["ks"] - via_snap["ks"]) < 1e-9
    assert via_snap["psi"] > 0.1  # the planted shift is visible

    meta, psi_hist, ks_hist = drift.load_baseline(spark, path)
    assert meta["column"] == "x"
    assert meta["n_rows"] == 2000
    assert meta["lineage"] == "test-snapshot-v1"
    assert psi_hist.count() <= 10 and ks_hist.count() <= 500

    # identical data vs its own snapshot → no drift
    self_rep = drift.drift_report_vs_snapshot(base, path).first()
    assert abs(self_rep["psi"]) < 1e-6 and abs(self_rep["ks"]) < 1e-9


def test_baseline_snapshot_empty_column_refused(spark, tmp_path):
    empty = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError, match="no non-null"):
        drift.save_baseline(empty, "x", str(tmp_path / "s2"))


# ---------------------------------------------------------------------------
# streaming drift monitor vs stored baseline
# ---------------------------------------------------------------------------


def test_drift_monitor_stream_timeline(spark, tmp_path):
    """Two micro-batches against a saved baseline: the stable batch scores
    ~0 PSI, the shifted batch scores large PSI/KS — same numbers as the
    batch-mode drift_report_vs_snapshot on identical data."""
    from sissaschool_xmlschema_spark.operators import drift
    from sissaschool_xmlschema_spark.streaming.drift_stream import (
        drift_monitor_stream,
        drift_timeline,
    )

    base_rows = [(float(i % 100),) for i in range(2000)]
    stable_rows = [(float((i * 7) % 100),) for i in range(1000)]
    shifted_rows = [(float(i % 100) + 500.0,) for i in range(1000)]

    baseline = spark.createDataFrame(base_rows, "value double")
    snap = str(tmp_path / "snap")
    drift.save_baseline(baseline, "value", snap, n_buckets=10, ks_bins=100)

    src = str(tmp_path / "src")
    spark.createDataFrame(stable_rows, "value double").repartition(
        1
    ).write.parquet(src + "/f1.parquet")
    spark.createDataFrame(shifted_rows, "value double").repartition(
        1
    ).write.parquet(src + "/f2.parquet")

    stream = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = str(tmp_path / "timeline")
    q = drift_monitor_stream(
        stream, "value", snap, out, checkpoint_dir=str(tmp_path / "ck")
    )
    q.awaitTermination()

    tl = drift_timeline(spark, out).collect()
    assert [r["batch_id"] for r in tl] == [0, 1]
    assert {r["n_rows"] for r in tl} == {1000}
    by_batch = {r["batch_id"]: r for r in tl}
    # file order = write order: batch 0 is the stable slice
    assert by_batch[0]["psi"] < 0.1
    assert by_batch[1]["psi"] > 0.25
    assert by_batch[1]["ks"] > 0.9  # disjoint supports -> KS ~ 1

    # batch-mode parity: the same shifted data through the non-streaming path
    batch_report = drift.drift_report_vs_snapshot(
        spark.createDataFrame(shifted_rows, "value double"), snap
    ).first()
    assert abs(batch_report["psi"] - by_batch[1]["psi"]) < 1e-12
    assert abs(batch_report["ks"] - by_batch[1]["ks"]) < 1e-12


def test_drift_monitor_rejects_wrong_column(spark, tmp_path):
    from sissaschool_xmlschema_spark.operators import drift
    from sissaschool_xmlschema_spark.streaming.drift_stream import (
        drift_monitor_stream,
    )

    baseline = spark.createDataFrame([(1.0,), (2.0,)], "value double")
    snap = str(tmp_path / "snap2")
    drift.save_baseline(baseline, "value", snap)
    stream = spark.readStream.schema("other double").parquet(
        str(tmp_path / "nosrc") + "/*"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="snapshot at .* is for column"):
        drift_monitor_stream(stream, "other", snap, str(tmp_path / "o"))
