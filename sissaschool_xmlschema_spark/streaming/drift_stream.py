"""Streaming drift monitoring against a persisted baseline snapshot.

Closes the loop between the drift baseline store (operators/drift.py
``save_baseline`` — the compile-once schema analogue, xsd_globals.py:537-578)
and Structured Streaming: a stream of incoming rows is scored per micro-batch
against the frozen baseline histogram, producing an append-only *drift
timeline* ``(batch_id, n_rows, psi, ks)``.

Shape notes for 100 TB / real clusters:

* The baseline side is the stored ≤ ks_bins-row histogram — loaded ONCE on
  the driver and reused for every batch; only the incoming batch is scanned.
* Per batch the engine does one row-local bucketize + one tiny groupBy per
  histogram granularity; the PSI/KS joins are over ≤ ks_bins rows and the
  1-row totals are broadcast (operators/drift.py), so batch cost is a single
  pass over the batch regardless of history length.
* The sink is idempotent the same way incremental.py's state sinks are:
  foreachBatch is at-least-once, so each batch OVERWRITES its own
  ``batch=<id>`` directory instead of appending blindly — a retried batch
  rewrites identical rows.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sissaschool_xmlschema_spark.operators import drift


def batch_drift_row(
    batch: DataFrame,
    col: str,
    meta,
    psi_hist: DataFrame,
    ks_hist: DataFrame,
) -> DataFrame:
    """One ``(n_rows, psi, ks)`` row for a batch vs pre-loaded baseline parts.

    Same numbers as ``drift_report_vs_snapshot`` — refactored so a stream
    loads the snapshot once instead of per batch.
    """
    cur_psi = drift.bucketize(
        batch, col, meta["n_buckets"], meta["lo"], meta["hi"]
    )
    cur_ks = drift.bucketize(
        batch, col, meta["ks_bins"], meta["lo"], meta["hi"]
    )
    p = drift.psi(cur_psi, psi_hist, meta["n_buckets"])
    k = drift.ks_from_histograms(cur_ks, ks_hist)
    n = batch.select(F.count(F.lit(1)).alias("n_rows"))
    return n.crossJoin(p).crossJoin(k)


def drift_monitor_stream(
    stream_df: DataFrame,
    col: str,
    baseline_path: str,
    out_path: str,
    checkpoint_dir: Optional[str] = None,
):
    """Start a foreachBatch drift monitor; returns the StreamingQuery.

    Every micro-batch writes ``(batch_id, n_rows, psi, ks)`` under
    ``out_path/batch=<id>`` (idempotent overwrite).  Callers decide the
    trigger/termination; for a catch-up run use
    ``.trigger(availableNow=True)`` upstream and ``awaitTermination()``.
    """
    spark = stream_df.sparkSession
    meta, psi_hist, ks_hist = drift.load_baseline(spark, baseline_path)
    if meta["column"] != col:
        raise ValueError(
            f"snapshot at {baseline_path!r} is for column "
            f"{meta['column']!r}, not {col!r}"
        )

    def process(batch: DataFrame, batch_id: int) -> None:
        row = batch_drift_row(batch, col, meta, psi_hist, ks_hist)
        row.withColumn("batch_id", F.lit(batch_id)).select(
            "batch_id", "n_rows", "psi", "ks"
        ).write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()


def drift_timeline(spark: SparkSession, out_path: str) -> DataFrame:
    """The accumulated ``(batch_id, n_rows, psi, ks)`` timeline, one row per
    processed micro-batch.  batch_id is stored IN the rows (not only the
    directory name), so a plain multi-directory read suffices — no partition
    discovery needed."""
    return spark.read.parquet(f"{out_path}/batch=*").orderBy("batch_id")
