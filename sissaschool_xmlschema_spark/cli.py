"""Command-line entry points — the ``xmlschema-validate`` / ``xmlschema-xml2json``
analogues (reference: xmlschema/cli.py, console scripts in pyproject.toml:60-63),
shaped for ``spark-submit --py-files`` on a multi-executor cluster:

    spark-submit --py-files sissaschool_xmlschema_spark.zip \
        -m sissaschool_xmlschema_spark.cli validate \
        --spec spec.json --input s3://bucket/transcripts \
        --output /out --checkpoint /ckpt --partition-expr "to_date(ts)"

Local smoke form:

    python -m sissaschool_xmlschema_spark.cli validate \
        --spec spec.json --input /path/table.parquet --output /tmp/out
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(app: str):
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    # master comes from spark-submit / env; default local[*] for smoke runs
    return builder.getOrCreate()


def _read(spark, path: str, fmt: str):
    if fmt == "table":
        return spark.table(path)
    return spark.read.format(fmt).load(path)


def cmd_validate(args: argparse.Namespace) -> int:
    from sissaschool_xmlschema_spark.plans.checkpoint import run_checkpointed
    from sissaschool_xmlschema_spark.schema import SparkSchema

    spark = _session("xmlschema-spark-validate")
    schema = SparkSchema(args.spec)
    df = _read(spark, args.input, args.format)

    if args.checkpoint:
        results = run_checkpointed(
            df,
            schema.spec,
            args.partition_expr or "1",
            args.checkpoint,
            args.output,
            resume=not args.no_resume,
            input_lineage=args.input,
        )
        summary = {
            "partitions": len(results),
            "skipped": sum(1 for r in results if r.skipped),
            "rows": sum(r.n_rows for r in results),
            "violations": sum(r.n_violations for r in results),
        }
    else:
        res = schema.run(df)
        if args.output:
            res.violations.write.mode("overwrite").parquet(
                f"{args.output}/violations"
            )
            res.verdicts().write.mode("overwrite").parquet(
                f"{args.output}/verdicts"
            )
        summary = {
            "rows": df.count(),
            "violations": res.violations.count(),
        }
    print(json.dumps(summary))
    return 0 if args.exit_zero or summary["violations"] == 0 else 1


def cmd_decode(args: argparse.Namespace) -> int:
    """xml2json analogue: typed decode to parquet/json with failure channel."""
    from sissaschool_xmlschema_spark.plans.decode import FieldDecode, decode

    spark = _session("xmlschema-spark-decode")
    df = _read(spark, args.input, args.format)
    fields = [
        FieldDecode(name, dtype, fmt or None)
        for name, dtype, fmt in (
            (f.split(":") + [""])[:3] for f in args.field
        )
    ]
    keep = [c for c in df.columns if c not in {f.name for f in fields}]
    typed, failures = decode(df, fields, keep_columns=keep)
    writer = typed.write.mode("overwrite")
    if args.json:
        writer.json(f"{args.output}/decoded")
    else:
        writer.parquet(f"{args.output}/decoded")
    failures.write.mode("overwrite").parquet(f"{args.output}/failures")
    print(json.dumps({"rows": typed.count(), "failures": failures.count()}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sissaschool-xmlschema-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="run the constraint suite")
    v.add_argument("--spec", required=True, help="spec JSON path")
    v.add_argument("--input", required=True)
    v.add_argument("--format", default="parquet",
                   help="parquet|iceberg|table|...")
    v.add_argument("--output", default=None)
    v.add_argument("--checkpoint", default=None,
                   help="checkpoint dir → partitioned resumable run")
    v.add_argument("--partition-expr", default=None,
                   help="SQL expr for the checkpoint partition key")
    v.add_argument("--no-resume", action="store_true")
    v.add_argument("--exit-zero", action="store_true",
                   help="exit 0 even with violations (lax CI mode)")
    v.set_defaults(fn=cmd_validate)

    d = sub.add_parser("decode", help="typed decode (xml2json analogue)")
    d.add_argument("--spec", default=None)
    d.add_argument("--input", required=True)
    d.add_argument("--format", default="parquet")
    d.add_argument("--output", required=True)
    d.add_argument("--field", action="append", default=[],
                   help="name:dtype[:fmt], repeatable")
    d.add_argument("--json", action="store_true", help="write JSON not parquet")
    d.set_defaults(fn=cmd_decode)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
