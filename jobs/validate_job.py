"""spark-submit entry point: the full constraint suite as a cluster job.

The north rule's deployment mode — ``spark-submit --py-files <pkg.zip>`` on a
multi-executor cluster (reference analogue: the xmlschema CLI validator,
``xmlschema/cli.py``, run per document; here one job validates the whole
table).  No master is set: spark-submit supplies it, so the same job file
runs on local[N], YARN, or K8s unchanged.

    spark-submit --master local[8] \
        --py-files dist/sissaschool_xmlschema_spark.zip \
        jobs/validate_job.py \
        --input /data/transcripts.parquet --out /tmp/validation_run \
        [--spec spec.json] [--partition-expr "to_date(ts)"] [--mode lax]

Outputs under ``--out``: ``violations/`` (parquet, canonical violation rows),
``verdicts/`` (per-conversation validity), and with ``--partition-expr`` a
resumable per-partition checkpoint manifest (lineage + metrics) instead of a
single monolithic run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet path or catalog table of transcripts")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--spec", default=None,
                    help="JSON spec file (default: built-in transcript spec)")
    ap.add_argument("--partition-expr", default=None,
                    help="SQL expr for checkpointed partition-by-partition "
                         "mode, e.g. \"to_date(ts)\" or "
                         "\"pmod(hash(conv_id), 64)\"")
    ap.add_argument("--mode", default="lax", choices=("lax", "strict"))
    ap.add_argument("--input-format", default=None,
                    choices=("parquet", "iceberg", "xml"),
                    help="explicit source format (REQUIRED for remote URIs; "
                         "'xml' validates raw XML documents directly)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("xmlschema-spark-validate")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from sissaschool_xmlschema_spark.plans.checkpoint import run_checkpointed
    from sissaschool_xmlschema_spark.plans.runner import validate
    from sissaschool_xmlschema_spark.sources.tables import read_table
    from sissaschool_xmlschema_spark.spec import transcript_spec
    from sissaschool_xmlschema_spark.spec_io import load_spec

    spec = load_spec(args.spec) if args.spec else transcript_spec()
    # route by explicit format / URI scheme (sources/tables.py), never by
    # driver-local os.path probing — remote URIs require --input-format
    df = read_table(spark, args.input, fmt=args.input_format)

    if args.partition_expr:
        results = run_checkpointed(
            df, spec, args.partition_expr,
            checkpoint_dir=os.path.join(args.out, "checkpoint"),
            out_dir=os.path.join(args.out, "violations"),
            input_lineage=args.input,
        )
        summary = {
            "partitions": len(results),
            "skipped": sum(1 for r in results if r.skipped),
            "n_rows": sum(r.n_rows for r in results),
            "n_violations": sum(r.n_violations for r in results),
        }
    else:
        res = validate(df, spec, mode=args.mode)
        viol = res.violations.persist()
        viol.write.mode("overwrite").parquet(
            os.path.join(args.out, "violations")
        )
        res.verdicts().write.mode("overwrite").parquet(
            os.path.join(args.out, "verdicts")
        )
        summary = {"n_rows": df.count(), "n_violations": viol.count()}
        viol.unpersist()

    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
