"""Cross-batch near-duplicate state (streaming/dedup_incremental.py)."""

import os

from sissaschool_xmlschema_spark.streaming.dedup_incremental import (
    incremental_dup_flags,
    run_incremental_dedup,
)

DOC_SCHEMA = "doc_id long, text string"

TEXT_A = "the quick brown fox jumps over the lazy dog near the river bank"
TEXT_B = "completely different content about spark shuffle partitions and skew"


def test_cross_batch_near_dup_detected(spark, tmp_path):
    """A near-duplicate arriving in a LATER batch collides with the batch-1
    original through the persisted bucket state; unrelated docs survive."""
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, TEXT_A), (2, TEXT_B)], DOC_SCHEMA
    ).repartition(1).write.parquet(src + "/b1.parquet")
    # batch 2: doc 10 is a near-copy of doc 1 (one word changed); doc 11 new
    near = TEXT_A.replace("river", "canal")
    spark.createDataFrame(
        [(10, near), (11, "unique third topic entirely unrelated words")],
        DOC_SCHEMA,
    ).repartition(1).write.parquet(src + "/b2.parquet")

    work = str(tmp_path / "state")
    state = run_incremental_dedup(
        spark, src + "/*", work, k=24, bands=8,
        schema=DOC_SCHEMA, max_files_per_trigger=1,
    )
    flags = {r.doc_id: r.kept_as for r in
             incremental_dup_flags(spark, state).collect()}
    assert flags == {10: 1}  # later near-copy dropped against the original

    # resume: a THIRD batch with another copy, processed incrementally
    # (stream checkpoint skips b1/b2)
    spark.createDataFrame(
        [(20, TEXT_A)], DOC_SCHEMA
    ).repartition(1).write.parquet(src + "/b3.parquet")
    run_incremental_dedup(
        spark, src + "/*", work, k=24, bands=8,
        schema=DOC_SCHEMA, max_files_per_trigger=1,
    )
    flags2 = {r.doc_id: r.kept_as for r in
              incremental_dup_flags(spark, state).collect()}
    assert flags2 == {10: 1, 20: 1}
    # exactly 3 batch directories — b1/b2 were not reprocessed
    batches = [d for d in os.listdir(state) if d.startswith("batch=")]
    assert len(batches) == 3
