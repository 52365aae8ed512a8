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

``read_table`` routes by EXPLICIT format first, then URI shape (never by
driver-local filesystem probing alone: ``os.path.exists`` is false for every
remote URI, which round 2 used as the Iceberg-vs-parquet discriminator and
thereby misrouted ``s3://...`` parquet paths on Iceberg-enabled runtimes).
Resolution order:

* explicit ``fmt`` wins;
* a remote URI (``s3://``, ``hdfs://``, ...) REQUIRES an explicit ``fmt`` —
  the driver cannot see the remote filesystem, so guessing is a silent
  misroute;
* a local path (bare or ``file://``) is parquet;
* a bare table identifier (no slashes) is an Iceberg catalog table when the
  runtime has Iceberg, else a catalog ``spark.table`` read.

``incremental_source`` gives the streaming reader used by
``run_incremental``; on Iceberg it maps to snapshot-range micro-batches
(``stream-from-timestamp``), on files to the file-source stream the sandbox
tests exercise.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession

#: URI schemes that mean "local driver-visible filesystem".
_LOCAL_SCHEMES = ("file",)


def has_iceberg(spark: SparkSession) -> bool:
    """True iff the Iceberg DataSource is registered in this runtime."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def _uri_scheme(source: str) -> Optional[str]:
    """Scheme of a URI-shaped source ('s3', 'hdfs', 'file', ...); None for
    plain paths and table identifiers."""
    if "://" not in source:
        return None
    return source.split("://", 1)[0].lower()


def resolve_format(
    source: str, fmt: Optional[str], iceberg_available: bool
) -> str:
    """Pure routing decision: ``'iceberg'`` | ``'parquet'`` | ``'table'``.

    Separated from the readers so the Iceberg-enabled branches have shape
    coverage in a sandbox without the runtime jar (see
    tests/test_schema_api.py) and so remote URIs are never routed by
    driver-local ``os.path.exists`` (always false remotely).
    """
    if fmt is not None:
        return fmt
    scheme = _uri_scheme(source)
    if scheme in _LOCAL_SCHEMES:
        return "parquet"
    if scheme is not None:
        raise ValueError(
            f"remote URI {source!r} needs an explicit fmt= ('parquet' or "
            "'iceberg'): the driver cannot probe the remote filesystem to "
            "guess"
        )
    if "/" in source or os.path.exists(source):
        # a path-shaped source on the driver-local filesystem
        return "parquet"
    # bare identifier → catalog table
    return "iceberg" if iceberg_available else "table"


def iceberg_read_options(snapshot_id: Optional[int] = None) -> Dict[str, str]:
    """Batch-read options for the Iceberg source (pure, unit-testable).

    Pinning ``snapshot-id`` is what makes a checkpointed validation run's
    lineage reproducible."""
    opts: Dict[str, str] = {}
    if snapshot_id is not None:
        opts["snapshot-id"] = str(snapshot_id)
    return opts


def iceberg_stream_options(
    from_timestamp_ms: Optional[int] = None,
) -> Dict[str, str]:
    """Streaming-read options for the Iceberg source (pure, unit-testable)."""
    opts: Dict[str, str] = {}
    if from_timestamp_ms is not None:
        opts["stream-from-timestamp"] = str(from_timestamp_ms)
    return opts


def read_table(
    spark: SparkSession,
    source: str,
    fmt: Optional[str] = None,
    snapshot_id: Optional[int] = None,
) -> DataFrame:
    """Load the transcripts table from whatever the deployment provides.

    * ``fmt='iceberg'`` (or a bare catalog identifier on an Iceberg-enabled
      runtime): catalog read, optionally time-travel pinned to
      ``snapshot_id``.
    * ``fmt='parquet'`` / local path: parquet scan.
    * ``fmt='xml'``: XML document ingestion (sources/xml_io.py — turn
      schema enforced, PERMISSIVE corrupt-record channel dropped here so
      downstream specs see the canonical columns).
    * bare identifier without Iceberg: catalog ``spark.table``.
    """
    resolved = resolve_format(source, fmt, has_iceberg(spark))
    if resolved == "iceberg":
        reader = spark.read.format("iceberg")
        for key, val in iceberg_read_options(snapshot_id).items():
            reader = reader.option(key, val)
        return reader.load(source)
    if snapshot_id is not None:
        raise ValueError("snapshot pinning requires an Iceberg runtime")
    if resolved == "table":
        return spark.table(source)
    if resolved == "xml":
        from sissaschool_xmlschema_spark.sources.xml_io import read_xml_source

        return read_xml_source(spark, source).drop("_corrupt_record")
    if resolved != "parquet":
        raise ValueError(f"unsupported fmt {resolved!r}")
    return spark.read.parquet(source)


def incremental_source(
    spark: SparkSession,
    source: str,
    schema: Optional[str] = None,
    max_files_per_trigger: Optional[int] = None,
    from_timestamp_ms: Optional[int] = None,
    fmt: Optional[str] = None,
):
    """Streaming reader for :func:`streaming.incremental.run_incremental`.

    Iceberg runtime: ``readStream.format('iceberg')`` with
    ``stream-from-timestamp`` — each micro-batch is a snapshot range, the
    exact lazy-subtree analogue (reference iterparse,
    xml_resource.py:536-579).  File fallback: the parquet file-source stream
    (one micro-batch per new file batch), which is what the sandbox tests
    drive.
    """
    resolved = resolve_format(source, fmt, has_iceberg(spark))
    if resolved == "xml":
        from sissaschool_xmlschema_spark.sources.xml_io import xml_stream_source

        return xml_stream_source(
            spark, source, max_files_per_trigger=max_files_per_trigger
        )
    if resolved == "iceberg":
        reader = spark.readStream.format("iceberg")
        for key, val in iceberg_stream_options(from_timestamp_ms).items():
            reader = reader.option(key, val)
        return reader.load(source)
    if resolved == "table":
        raise ValueError(
            "streaming from a catalog table requires an Iceberg runtime; "
            "point incremental_source at a file directory instead"
        )
    reader = spark.readStream
    if schema is None:
        schema = spark.read.parquet(source).schema.simpleString()[7:-1]
    reader = reader.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source)


def write_production_layout(
    df: DataFrame,
    table_name: str,
    scope_col: str = "conv_id",
    order_col: str = "turn_idx",
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Write the validation-optimized physical layout as a catalog table.

    The single biggest scale lever the engine has (PLANS.md §1-4, BENCH):
    bucketing by the identity scope + write-sorting by (scope, order) makes
    every per-scope stage of the suite — window checks, unique/key
    groupBys, same-table keyrefs — exchange-free: the whole constraint
    suite becomes scan+compute.  This is the Spark-bucketed-table analogue
    of the production Iceberg layout::

        CREATE TABLE ... USING iceberg
        PARTITIONED BY (days(ts), bucket(64, conv_id))
        TBLPROPERTIES ('write.distribution-mode' = 'hash')
        -- + sort order (conv_id, turn_idx)

    Size ``n_buckets`` so one bucket's rows fit an executor's memory at
    the target scale (10^12 turns / 64 buckets is too coarse — production
    uses both the date partition and the bucket, so a bucket is per-day).
    The write itself costs one hash exchange + per-bucket sort; every
    validation run afterwards saves its exchanges — the classic
    write-once, read-many trade.
    """
    (
        df.repartition(n_buckets, scope_col)
        .write.bucketBy(n_buckets, scope_col)
        .sortBy(scope_col, order_col)
        .mode(mode)
        .saveAsTable(table_name)
    )
