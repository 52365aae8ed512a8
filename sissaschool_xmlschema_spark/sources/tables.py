"""Table access layer: Iceberg when the runtime has it, parquet otherwise.

The north rule targets Iceberg tables of transcripts.  This sandbox has no
Iceberg runtime jar, so the engine is developed and tested against the two
layouts that carry the same physical properties:

* plain parquet directories (generic scan), and
* Spark bucketed tables — ``CLUSTERED BY (conv_id) SORTED BY (conv_id,
  turn_idx)`` — which stand in for the production Iceberg layout::

      CREATE TABLE transcripts (...)
      USING iceberg
      PARTITIONED BY (days(ts), bucket(64, conv_id))
      TBLPROPERTIES ('write.distribution-mode' = 'hash')
      -- plus a sort order of (conv_id, turn_idx) per file

  With that layout every per-scope stage of the suite (window checks,
  unique/key groupBys, same-table keyrefs) needs ZERO exchanges — see
  PLANS.md — and ``run_checkpointed(partition_expr="days(ts)")`` prunes each
  partition's scan to its own files.

``read_table`` resolves in order: explicit ``format='iceberg'`` → catalog
table name → parquet path.  ``incremental_source`` gives the streaming
reader used by ``run_incremental``; on Iceberg it maps to snapshot-range
micro-batches (``stream-from-timestamp``), on files to the file-source
stream the sandbox tests exercise.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def has_iceberg(spark: SparkSession) -> bool:
    """True iff the Iceberg DataSource is registered in this runtime."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_table(
    spark: SparkSession,
    source: str,
    fmt: Optional[str] = None,
    snapshot_id: Optional[int] = None,
) -> DataFrame:
    """Load the transcripts table from whatever the deployment provides.

    * ``fmt='iceberg'`` (or auto-detected catalog table on an
      Iceberg-enabled runtime): catalog read, optionally time-travel pinned
      to ``snapshot_id`` — pinning the snapshot is what makes a
      checkpointed validation run's lineage reproducible.
    * otherwise: catalog table if the name resolves, else a parquet path.
    """
    if fmt == "iceberg" or (fmt is None and has_iceberg(spark)
                            and not os.path.exists(source)):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(source)
    if snapshot_id is not None:
        raise ValueError("snapshot pinning requires an Iceberg runtime")
    if not os.path.exists(source):
        return spark.table(source)
    return spark.read.parquet(source)


def incremental_source(
    spark: SparkSession,
    source: str,
    schema: Optional[str] = None,
    max_files_per_trigger: Optional[int] = None,
    from_timestamp_ms: Optional[int] = None,
):
    """Streaming reader for :func:`streaming.incremental.run_incremental`.

    Iceberg runtime: ``readStream.format('iceberg')`` with
    ``stream-from-timestamp`` — each micro-batch is a snapshot range, the
    exact lazy-subtree analogue (reference iterparse,
    xml_resource.py:536-579).  File fallback: the parquet file-source stream
    (one micro-batch per new file batch), which is what the sandbox tests
    drive.
    """
    if has_iceberg(spark) and not os.path.exists(source):
        reader = spark.readStream.format("iceberg")
        if from_timestamp_ms is not None:
            reader = reader.option(
                "stream-from-timestamp", str(from_timestamp_ms)
            )
        return reader.load(source)
    reader = spark.readStream
    if schema is None:
        schema = spark.read.parquet(source).schema.simpleString()[7:-1]
    reader = reader.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source)
