"""``SparkSchema`` — the user-facing facade mirroring ``xmlschema.XMLSchema``.

A user of the reference writes::

    schema = xmlschema.XMLSchema("doc.xsd")
    schema.is_valid(xml)          # bool
    schema.validate(xml)          # raises on first error
    errors = list(schema.iter_errors(xml))
    data = schema.decode(xml)

The engine's equivalent over DataFrames::

    schema = SparkSchema("spec.json")            # or SparkSchema(table_spec)
    schema.is_valid(df)                          # bool
    schema.validate(df)                          # raises SparkSchemaValidationError
    errors = schema.iter_errors(df)              # violations DataFrame
    typed, failures = schema.decode(raw_df)      # typed projection + side channel

Construction compiles the plan once (the ``schema.build()`` analogue,
xsd_globals.py:537-578); each call then only binds it to a DataFrame.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

from pyspark.sql import DataFrame

from sissaschool_xmlschema_spark import spec as S
from sissaschool_xmlschema_spark.plans.compiler import CompiledPlan, compile_plan
from sissaschool_xmlschema_spark.plans.decode import FieldDecode, decode
from sissaschool_xmlschema_spark.plans.runner import ValidationResult, validate
from sissaschool_xmlschema_spark.spec_io import load_spec


class SparkSchema:
    """Compiled validation schema bound to no particular DataFrame."""

    def __init__(self, source: Union[str, S.TableSpec]) -> None:
        self.spec: S.TableSpec = (
            load_spec(source) if isinstance(source, str) else source
        )
        self.plan: CompiledPlan = compile_plan(self.spec)

    # --- validation (schemas.py:1214-1283 API shape) -----------------------

    def iter_errors(self, df: DataFrame) -> DataFrame:
        """All violation rows, lax accumulation (schemas.py:1285-1391)."""
        return validate(df, self.plan).violations

    def is_valid(self, df: DataFrame) -> bool:
        """True iff the full constraint suite finds nothing."""
        return validate(df, self.plan).is_valid()

    def validate(self, df: DataFrame) -> None:
        """Raise :class:`SparkSchemaValidationError` on the first violation."""
        validate(df, self.plan, mode="strict")

    def run(self, df: DataFrame, cache_input: bool = False) -> ValidationResult:
        """Full result object (violations + verdict/constraint rollups)."""
        return validate(df, self.plan, cache_input=cache_input)

    # --- decoding (documents.py:275-299 API shape) -------------------------

    def decode(
        self,
        df: DataFrame,
        fields: Optional[Sequence[FieldDecode]] = None,
        keep_columns: Sequence[str] = (),
    ) -> Tuple[DataFrame, DataFrame]:
        """Typed decode + cast-failure side channel.

        Without explicit ``fields``, nothing is cast and the call degenerates
        to a passthrough (the engine's specs constrain values, they don't
        declare physical types — tables are already typed in Spark).
        """
        if fields is None:
            return df, df.sparkSession.createDataFrame(
                [], "column string, offending_value string, n bigint"
            )
        return decode(df, fields, keep_columns)
