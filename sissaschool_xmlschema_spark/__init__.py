"""sissaschool_xmlschema_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the semantics of the *xmlschema* XSD processor
(reference: /root/reference, sthagen/sissaschool-xmlschema v4.3.1) as distributed
DataFrame checks over tables of multi-turn transcripts
``(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)``:

* simple-type **facets** (enumeration, pattern, length, bounds, digits, whiteSpace,
  boolean lexical space, explicitTimezone) as pure Column predicates — the analogue of
  ``xmlschema/validators/facets.py``;
* **identity constraints** (xs:unique / xs:key / xs:keyref, xs:ID/IDREF) as salted
  groupBy aggregations and broadcast/hash anti-joins — the analogue of
  ``xmlschema/validators/identities.py``;
* **content-model / occurrence** checks (sequence order, contiguity, min/maxOccurs,
  first/last particle) as window functions — the analogue of
  ``xmlschema/validators/models.py`` + ``particles.py``;
* **lax-mode error collection** (violation rows with path / constraint id /
  offending value / reason) and per-partition pass/fail verdicts — the analogue of
  ``iter_errors`` / ``ValidationContext`` (``xmlschema/validators/validation.py``);
* engine-mandated extensions with no reference counterpart: single-pass column
  stats (HLL approx-distinct, quantile sketches), KS/PSI drift vs a baseline
  snapshot, per-partition checkpoint manifests with lineage, dedup/similarity/
  text-analysis operators for training-data pipelines.

Everything is declared via the DataFrame API so Catalyst handles pushdown, pruning,
partial aggregation, broadcast selection and AQE skew handling; Python never touches
rows except in clearly-marked vectorized pandas-UDF paths.
"""

from sissaschool_xmlschema_spark.spec import (  # noqa: F401
    Assertion,
    Base64Binary,
    BooleanLexical,
    ColumnSpec,
    Contiguity,
    Enumeration,
    ExplicitTimezone,
    FirstTurn,
    FixedValue,
    FractionDigits,
    HexBinary,
    Key,
    Keyref,
    LastTurn,
    Length,
    ListOf,
    MaxExclusive,
    MaxInclusive,
    MaxLength,
    MinExclusive,
    MinInclusive,
    MinLength,
    Monotone,
    Nillable,
    NotInSet,
    Occurs,
    GroupPandasCheck,
    PandasCheck,
    Pattern,
    Prohibited,
    Required,
    RowAssertion,
    TableSpec,
    TotalDigits,
    Transition,
    TypeAlternative,
    Unique,
    UnionOf,
    WhiteSpace,
    XsdError,
)
from sissaschool_xmlschema_spark.plans.compiler import compile_plan  # noqa: F401
from sissaschool_xmlschema_spark.plans.runner import (  # noqa: F401
    ValidationResult,
    validate,
)

__version__ = "0.1.0"
