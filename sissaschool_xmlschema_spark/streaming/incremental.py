"""Incremental / streaming validation.

The reference's streaming story is lazy iterparse: bounded-memory subtree
iteration with identity counters kept across subtrees and merged at the end
(xmlschema/resources/xml_resource.py:536-579; counter merge
validators/schemas.py:1386-1389; end-of-document reference checks
schemas.py:1391-1405).  The Spark lowering:

* **row-local facet checks** are stateless projections — they run unchanged on
  a streaming DataFrame (one micro-batch = one lazy subtree).
* **identity constraints** need cross-batch state: each micro-batch's partial
  key counts merge into a persistent key-count store (parquet), exactly the
  ``counter.update(counter.counter)`` merge; duplicates are whatever exceeds 1
  after the merge.  End-of-stream keyref checks replay schemas.py:1391-1405.
* **order/contiguity checks** across batches use a custom stateful operator
  (``applyInPandasWithState``): per-conversation state = last seen turn_idx —
  the streaming-only pandas path the SURVEY allows (§2.10).

``run_incremental`` drives a file-source stream with ``availableNow`` — the
batch-incremental mode (one Iceberg snapshot range per run); the same
``foreachBatch`` body works for a continuous trigger.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from sissaschool_xmlschema_spark import spec as S
from sissaschool_xmlschema_spark.plans.compiler import compile_plan
from sissaschool_xmlschema_spark.plans.runner import (
    VIOLATION_SCHEMA,
    row_local_violations,
)


def stream_facet_violations(stream_df: DataFrame, spec: S.TableSpec) -> DataFrame:
    """Row-local violations as a *streaming* DataFrame (stateless projection).

    Compose with ``writeStream`` to land violations continuously; watermarks
    are unnecessary because no aggregation state is involved.
    """
    return row_local_violations(stream_df, compile_plan(spec))


@dataclass
class IncrementalResult:
    n_batches: int
    violations_path: str
    keystate_path: str

    def violations(self, spark: SparkSession) -> DataFrame:
        if not os.path.exists(self.violations_path):
            return spark.createDataFrame([], VIOLATION_SCHEMA)
        return spark.read.parquet(self.violations_path)

    def duplicate_keys(self, spark: SparkSession, c: S.Unique) -> DataFrame:
        """Cross-batch duplicates after the counter merge
        (schemas.py:1386-1389 analogue)."""
        st = spark.read.parquet(self.keystate_path)
        keys = ([c.scope] if c.scope else []) + list(c.fields)
        return (
            st.groupBy(*keys)
            .agg(F.sum("_n").alias("_n"))
            .filter(F.col("_n") > 1)
        )


def run_incremental(
    spark: SparkSession,
    input_path: str,
    spec: S.TableSpec,
    work_dir: str,
    schema: Optional[str] = None,
    max_files_per_trigger: Optional[int] = None,
) -> IncrementalResult:
    """Validate a growing file directory incrementally with availableNow.

    Per micro-batch: facet violations append to the violation sink; per-batch
    partial key counts (map-side shrunk) append to the key-state store.  The
    stream checkpoint makes re-runs resume from unprocessed files only — the
    engine's lazy-iteration memory bound: state grows with *distinct keys*,
    never with rows.
    """
    violations_path = os.path.join(work_dir, "violations")
    keystate_path = os.path.join(work_dir, "keystate")
    ckpt = os.path.join(work_dir, "_stream_checkpoint")

    if schema is None:
        schema = spark.read.parquet(input_path).schema.simpleString()[7:-1]

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    plan = compile_plan(spec)
    uniques = [c for c in spec.identities if isinstance(c, S.Unique)]
    n_batches = 0

    def process(batch: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        v = row_local_violations(batch, plan)
        if v is not None:
            v.write.mode("append").parquet(violations_path)
        for c in uniques:
            keys = ([c.scope] if c.scope else []) + list(c.fields)
            sel = batch.filter(F.expr(c.selector)) if c.selector else batch
            for fcol in c.fields:
                sel = sel.filter(F.col(fcol).isNotNull())
            counts = sel.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
            counts.write.mode("append").parquet(keystate_path)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return IncrementalResult(n_batches, violations_path, keystate_path)


# ---------------------------------------------------------------------------
# custom stateful operator: cross-batch contiguity
# ---------------------------------------------------------------------------

_CONTIG_OUT = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", LongType()),
        StructField("constraint_id", StringType()),
        StructField("reason", StringType()),
    ]
)
_CONTIG_STATE = StructType([StructField("last_idx", LongType())])


def stateful_contiguity_stream(
    stream_df: DataFrame, spec: S.TableSpec
) -> DataFrame:
    """Cross-batch turn-contiguity via ``applyInPandasWithState``.

    Per-conversation state = the last seen ``order_col``; a new batch's rows
    (sorted in pandas — batches are small per group) must continue the 0..n
    sequence across micro-batch boundaries, mirroring how the reference keeps
    identity counters alive across lazy subtrees until the ancestor changes
    (schemas.py:1342-1360).  This is the engine's ONLY streaming Python path
    and state is one long per conversation.
    """
    scope, order = spec.scope_col, spec.order_col

    def fn(
        key: tuple, pdfs: Iterator, state: GroupState
    ) -> Iterator:
        import pandas as pd

        last = state.get[0] if state.exists else None
        out: List[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order)
            for idx in pdf[order]:
                idx = int(idx)
                expected_ok = (last is None and idx == 0) or (
                    last is not None and idx == last + 1
                )
                if not expected_ok:
                    out.append(
                        {
                            "conv_id": str(key[0]),
                            "turn_idx": idx,
                            "constraint_id": "model:turn-contiguity",
                            "reason": (
                                "turn index breaks the 0..n-1 sequence "
                                "across micro-batches"
                            ),
                        }
                    )
                last = idx
        state.update((last if last is not None else -1,))
        yield pd.DataFrame(out, columns=[f.name for f in _CONTIG_OUT.fields])

    return (
        stream_df.groupBy(F.col(scope))
        .applyInPandasWithState(
            fn,
            outputStructType=_CONTIG_OUT,
            stateStructType=_CONTIG_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def session_turn_counts(
    stream_df: DataFrame,
    spec: S.TableSpec,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-conversation session windows over event time (SURVEY §2.9).

    Sessions close after ``gap`` of inactivity; the watermark bounds state and
    admits late turns up to ``watermark`` behind the stream's max event time
    (late-data handling the reference never needed — documents arrive whole).
    Works identically on a batch DataFrame (no watermark applied there).
    """
    src = stream_df
    if stream_df.isStreaming:
        src = stream_df.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.col(spec.scope_col),
            F.session_window(F.col("ts"), gap),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(
                F.when(F.col("role") == "user", 1).otherwise(0)
            ).alias("n_user"),
        )
        .select(
            spec.scope_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_turns",
            "n_user",
        )
    )
