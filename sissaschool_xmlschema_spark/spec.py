"""Declarative validation specs — the engine's analogue of a compiled XSD.

The reference compiles an XSD document into a component graph with bound validator
closures (``xmlschema/validators/xsd_globals.py:537-578``; facets bind their
``validate`` callables at parse time, ``validators/facets.py`` passim).  This engine
replaces that with plain dataclasses: a :class:`TableSpec` is the "schema", each facet
/ constraint dataclass is the "component".  ``plans.compiler.compile_plan`` lowers a
spec into Column expressions and DataFrame transforms on the driver, once; executors
only ever see the compiled plan.

Validation modes mirror ``xmlschema/validators/arguments.py:41`` (frozen set
``{'strict', 'lax', 'skip'}``): *lax* collects violation rows, *strict* raises on the
first violation, *skip* disables a check.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

VALIDATION_MODES = frozenset(("strict", "lax", "skip"))


# ---------------------------------------------------------------------------
# Simple-type facets (reference: xmlschema/validators/facets.py)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Facet:
    """Base class; ``mode`` mirrors per-check validation_hook overrides
    (``xmlschema/validators/validation.py:499-507``)."""

    mode: str = field(default="lax", init=False)


@dataclass(frozen=True)
class Enumeration(Facet):
    """value ∈ values — ``XsdEnumerationFacets`` (facets.py:596-710).

    NaN membership is special-cased like facets.py:689-698: if the enumeration
    contains NaN, NaN values pass.

    ``canon='hex'`` compares in the hexBinary VALUE space (case-insensitive
    hex digits — issue_222: 'ABCEDF' equals enumeration value 'abcedf').
    """

    values: Sequence[str]
    canon: Optional[str] = None


@dataclass(frozen=True)
class Pattern(Facet):
    """Match **any** of the XSD-dialect regexes (facets.py:713-823; match-any
    semantics facets.py:798-804).  Patterns are implicitly anchored (full match),
    exactly like ``translate_pattern``'s anchoring."""

    patterns: Sequence[str]


@dataclass(frozen=True)
class Length(Facet):
    """len(value) == value — facets.py:161-198."""

    value: int


@dataclass(frozen=True)
class MinLength(Facet):
    """len(value) >= value — facets.py:201-235."""

    value: int


@dataclass(frozen=True)
class MaxLength(Facet):
    """len(value) <= value — facets.py:238-272."""

    value: int


@dataclass(frozen=True)
class MinInclusive(Facet):
    """value >= bound — facets.py:275-313."""

    value: object


@dataclass(frozen=True)
class MinExclusive(Facet):
    """value > bound — facets.py:316-354."""

    value: object


@dataclass(frozen=True)
class MaxInclusive(Facet):
    """value <= bound — facets.py:357-397."""

    value: object


@dataclass(frozen=True)
class MaxExclusive(Facet):
    """value < bound — facets.py:400-438."""

    value: object


@dataclass(frozen=True)
class TotalDigits(Facet):
    """total decimal digits <= value — facets.py:441-497 + utils/decoding.py:32-52."""

    value: int


@dataclass(frozen=True)
class FractionDigits(Facet):
    """fraction digits <= value — facets.py:500-548."""

    value: int


@dataclass(frozen=True)
class WhiteSpace(Facet):
    """'preserve' | 'replace' | 'collapse' — facets.py:114-158.

    As a *check* (not a transform): replace-mode rejects tab/newline/CR;
    collapse-mode additionally rejects leading/trailing/double spaces
    (facets.py:142-158).  preserve is the identity and never fails — the engine's
    per-turn-text-equality invariant relies on `text` being preserve.
    """

    value: str = "preserve"


@dataclass(frozen=True)
class ExplicitTimezone(Facet):
    """'required' | 'prohibited' | 'optional' on the raw lexical form —
    facets.py:551-593 (XSD 1.1)."""

    value: str = "required"


@dataclass(frozen=True)
class BooleanLexical(Facet):
    """lexical space {'true','1','false','0'} — helpers.py:26-29, 268-272."""


@dataclass(frozen=True)
class Required(Facet):
    """Column must be non-null, optionally only where ``when`` (a SQL boolean
    expression over the row) holds — the analogue of a required attribute /
    missing key field (attributes.py:663-664, identities.py:523-531)."""

    when: Optional[str] = None


@dataclass(frozen=True)
class Prohibited(Facet):
    """Column must be null where ``when`` holds — prohibited attribute
    (attributes.py:707-709)."""

    when: Optional[str] = None


@dataclass(frozen=True)
class FixedValue(Facet):
    """Present value must equal ``value`` (value-space equality) —
    elements.py:748-770, attributes.py:241-260.  ``canon='hex'`` compares
    case-insensitively (hexBinary value space, issue_222)."""

    value: object
    canon: Optional[str] = None


@dataclass(frozen=True)
class Assertion(Facet):
    """XSD 1.1 assertion facet with ``$value`` (facets.py:826-884): an arbitrary
    SQL boolean expression over the row where ``value`` refers to the column."""

    expr: str


@dataclass(frozen=True)
class Nillable(Facet):
    """xsi:nil triple condition (elements.py:711-728): the nil-flag column
    must hold a boolean lexical when present; a true nil requires the value
    to be ABSENT; and nil=true is an error outright when the column carries a
    fixed-value constraint (pass it as ``fixed``).  A nil of 'false'/absent
    imposes nothing — the value column's other facets still apply."""

    nil_col: str
    fixed: Optional[object] = None


@dataclass(frozen=True)
class BinaryLength(Facet):
    """length/minLength/maxLength on BINARY types count decoded OCTETS,
    not lexical characters (reference facets.py length on
    hexBinary/base64Binary: 'AABBCCDD' has length 4).  Bounds computed
    row-locally from the lexical form: hex = chars/2; base64 =
    3*chars/4 minus padding."""

    lo: Optional[int] = None
    hi: Optional[int] = None
    codec: str = "hex"  # 'hex' | 'base64'


@dataclass(frozen=True)
class IntRange(Facet):
    """Builtin integer width bounds (xs:byte/short/int/long/unsigned*,
    builtins.py:216-330): value-space comparison after a tolerant decimal
    cast — a non-numeric lexical is BuiltinLexical's violation, not this
    one.  Lowered with Column ops (no SQL string), so it works on plain
    columns, hyphenated XML names, and ListOf item lambdas alike."""

    lo: Optional[int] = None
    hi: Optional[int] = None


@dataclass(frozen=True)
class HexBinary(Facet):
    """Lexical space of xs:hexBinary: even count of hex digits —
    helpers.py:249-257 (hex_binary_validator)."""


@dataclass(frozen=True)
class Base64Binary(Facet):
    """Lexical space of xs:base64Binary — helpers.py:240-246
    (base64_binary_validator); canonical form without inner whitespace."""


@dataclass(frozen=True)
class BuiltinLexical(Facet):
    """Lexical space of an XSD builtin type, by local name — the long tail of
    ``builtins.py:72-183, 365-500``: duration, yearMonth/dayTimeDuration,
    gYear/gYearMonth/gMonth/gMonthDay/gDay, date/time/dateTime/dateTimeStamp,
    Name/NCName/NMTOKEN/language/QName/NOTATION, and the numeric lexicals.
    Lowered to one anchored JVM ``rlike`` from the registry in
    :mod:`~sissaschool_xmlschema_spark.functions.lexical`; unknown names fail
    at compile time on the driver."""

    type_name: str = "string"


@dataclass(frozen=True)
class XsdError(Facet):
    """xs:error — rejects every (present) value; XSD 1.1's empty type
    (helpers.py:260-262, builtins.py:492-499)."""


@dataclass(frozen=True)
class ListOf(Facet):
    """xs:list semantics (simple_types.py:842, decode :990-1018): the value is
    a ``separator``-joined list of atomic items; every item must satisfy every
    item facet, and the list length may be bounded.  Lowered with
    ``split`` + ``forall`` — no explode, stays row-local."""

    item_facets: Sequence[Facet] = ()
    separator: str = " "
    min_items: Optional[int] = None
    max_items: Optional[int] = None


@dataclass(frozen=True)
class UnionOf(Facet):
    """xs:union first-member-that-validates semantics (simple_types.py:1031,
    decode :1177-1210): the value passes if ANY alternative's facet list fully
    accepts it.  Lowered to an OR over the alternatives' AND-ed predicates —
    the ordered-cascade observable behavior without per-member decoding."""

    alternatives: Sequence[Sequence[Facet]] = ()


@dataclass(frozen=True)
class NotInSet(Facet):
    """Wildcard denylist — the ##other / not_namespace side of XSD wildcards
    (wildcards.py:33-164): a present value must NOT be one of ``values``.
    The allowlist side is :class:`Enumeration`; process_contents='skip' is a
    facet with mode='skip' (dropped at compile)."""

    values: Sequence[str] = ()


@dataclass(frozen=True)
class TypeAlternative:
    """One ``xs:alternative`` arm (XSD 1.1 conditional type assignment,
    ``XsdAlternative`` elements.py:1450-1476): a SQL ``test`` predicate over
    the row plus the facet set of the type that arm selects.

    ``test=None`` is the unconditional arm — the reference's
    ``alt.token is None`` case (elements.py:1356-1359), which always
    matches and so shadows every later arm."""

    facets: Sequence["Facet"] = ()
    test: Optional[str] = None
    name: str = ""


@dataclass(frozen=True)
class ColumnSpec:
    """One column's simple-type: facets applied in the reference's decode order
    (normalize → lexical patterns → value-space validators,
    simple_types.py:488-503).

    ``when`` makes the whole column's facets conditional on a row predicate —
    the flat-table analogue of xsi:type dynamic type resolution
    (elements.py:657-682): the effective type of a value depends on other
    columns of the row.

    ``alternatives`` is the full XSD 1.1 conditional-type machinery
    (``get_alternative_type``, elements.py:1338-1361): the FIRST arm whose
    ``test`` matches the row selects that arm's facets; when no arm
    matches, the column's own ``facets`` act as the declared default type
    (the ``return self.type`` fallback).  The compiler lowers the whole
    cascade into predicate-gated Column checks fused into the same
    single row-local pass — no branching at execution time."""

    name: str
    facets: Sequence[Facet] = ()
    when: Optional[str] = None
    alternatives: Sequence[TypeAlternative] = ()


# ---------------------------------------------------------------------------
# Identity constraints (reference: xmlschema/validators/identities.py)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Unique:
    """xs:unique — within ``scope``, the field tuple must not repeat; tuples with
    any null field are skipped (elements.py:912; duplicate detected when the
    counter hits 2, identities.py:385-389)."""

    name: str
    fields: Sequence[str]
    scope: Optional[str] = None  # None → whole table ("document-wide")
    selector: Optional[str] = None  # SQL predicate restricting selected rows


@dataclass(frozen=True)
class Key(Unique):
    """xs:key — like unique, plus every field must be present on every selected
    row (missing field → error, identities.py:523-531)."""


SAME_SCOPE = "<same>"
"""Sentinel for :class:`Keyref.refer_scope`: key side scoped like the refs."""


@dataclass(frozen=True)
class Keyref:
    """xs:keyref — selected field tuples must exist in the referred key's value
    set; misses reported with multiplicity ("... 2 times"), mirroring
    ``KeyrefCounter.iter_errors`` (identities.py:403-418)."""

    name: str
    fields: Sequence[str]
    refer_fields: Sequence[str]
    scope: Optional[str] = None
    selector: Optional[str] = None  # predicate selecting referencing rows
    refer_selector: Optional[str] = None  # predicate selecting key-bearing rows
    # broadcast only when the key side is a genuinely small dimension: a
    # document-scoped keyref has O(rows) keys and broadcasting it is the
    # classic large-broadcast OOM at scale (and 3x slower even on one box)
    broadcast_keys: bool = False
    # Scope column of the KEY side — the flat-table form of the reference's
    # refer_path cross-domain resolution (identities.py:317-334):
    #   SAME_SCOPE (default) — key scoped by the same column as the refs.
    #   None                 — key defined at a BROADER (document) scope: refs
    #                          join on fields only; the keyref's own scope
    #                          still labels the violations.
    #   another column name  — scope-mapping join: refs' ``scope`` column
    #                          equi-joins the key side's ``refer_scope``
    #                          column (e.g. a child table carrying its
    #                          ancestor's id under a different name).
    # A keyref with scope=None against a refer_scope'd key is the upward
    # propagation case from XSD 1.0 par. 3.11.5: per-scope key tables merge
    # at the ancestor, i.e. the join simply ignores the key-side scope.
    refer_scope: Optional[str] = SAME_SCOPE


# ---------------------------------------------------------------------------
# Content model / occurrence (reference: xmlschema/validators/models.py,
# particles.py)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Occurs:
    """minOccurs/maxOccurs of rows matching ``where`` per scope group —
    ``ParticleMixin.is_missing/is_over`` semantics (particles.py:109-126)."""

    name: str
    where: str  # SQL predicate, e.g. "role = 'user'"
    min_occurs: int = 0
    max_occurs: Optional[int] = None  # None = unbounded


@dataclass(frozen=True)
class Contiguity:
    """Sequence-model check: the order column must be 0,1,2,... with no gaps or
    duplicates inside a scope group — the flat-table analogue of the
    ``ModelVisitor`` child-position automaton (models.py:267-366,
    XMLSchemaChildrenValidationError index, exceptions.py:438-533)."""

    name: str = "turn-contiguity"


@dataclass(frozen=True)
class Monotone:
    """A column must be non-decreasing (strict=False) or increasing (strict=True)
    in document order within the scope group."""

    name: str
    column: str
    strict: bool = False


@dataclass(frozen=True)
class FirstTurn:
    """The first row in document order must satisfy ``where`` — the analogue of a
    required leading particle (ModelVisitor._start, models.py:218-232)."""

    name: str
    where: str


@dataclass(frozen=True)
class LastTurn:
    """The last row in document order must satisfy ``where`` (ModelVisitor.stop,
    models.py:243-246)."""

    name: str
    where: str


@dataclass(frozen=True)
class Transition:
    """Allowed (prev → next) pairs on ``column`` in document order — the
    state-machine legality check (models.py advance).  ``allowed`` maps a prev
    value to the set of legal next values; values absent from ``allowed`` are
    unrestricted (open content, models.py:737-817)."""

    name: str
    column: str
    allowed: dict
    start: Optional[Sequence[str]] = None  # legal first values; None = any


# ---------------------------------------------------------------------------
# Table spec — the "schema document"
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RowAssertion:
    """Table-level row check: arbitrary SQL boolean over whole rows — the
    ``extra_validator(elem, xsd_element)`` hook (validation.py:494-498, called
    elements.py:840-849) for checks that cross columns."""

    name: str
    expr: str
    reason: Optional[str] = None


@dataclass(frozen=True)
class PandasCheck:
    """Vectorized pandas extension check — the UDF escape hatch of §2.10.

    ``fn(pdf: pandas.DataFrame) -> pandas.Series`` returns a reason string for
    violating rows and None/NaN for passing rows.  Arrow-batched via
    mapInPandas; keep it for logic Column expressions genuinely can't express
    (the analogue of extra_validator yielding errors)."""

    name: str
    fn: object  # Callable[[pandas.DataFrame], pandas.Series]
    columns: Sequence[str] = ()  # columns the fn needs (pruning hint)


@dataclass(frozen=True)
class GroupPandasCheck:
    """Per-conversation (per-scope-group) custom check — the xs:assert on
    complex types analogue (assertions.py:36-147): an arbitrary predicate over
    the WHOLE conversation subtree, which no row-local expression can state.

    ``fn(pdf: pandas.DataFrame) -> list[str]`` receives one conversation's
    rows (sorted by order_col) and returns violation reason strings (empty =
    valid).  Runs via ``applyInPandas`` over groupBy(scope) — the engine's only
    per-group Python path; keep groups bounded (cap via MAX_GROUP_ROWS)."""

    name: str
    fn: object  # Callable[[pandas.DataFrame], list[str]]
    columns: Sequence[str] = ()  # columns the fn needs (pruning hint)
    max_group_rows: int = 1_000_000  # guard against pathological conversations


@dataclass(frozen=True)
class TableSpec:
    """The compiled-schema analogue of ``XsdGlobals`` for one table.

    ``scope_col`` plays the document / identity-scope role that the ancestor
    element plays in the reference (identity counters reset per scope,
    schemas.py:1342-1360); ``order_col`` is document order.
    """

    name: str
    scope_col: str = "conv_id"
    order_col: str = "turn_idx"
    # extra sort keys after order_col so window checks are deterministic even
    # when corrupted data duplicates the order value (the reference never has
    # this problem: ElementTree children have a total document order)
    tiebreakers: Sequence[str] = ()
    columns: Sequence[ColumnSpec] = ()
    identities: Sequence[object] = ()  # Unique | Key | Keyref
    model: Sequence[object] = ()  # Occurs | Contiguity | Monotone | ...
    row_assertions: Sequence[RowAssertion] = ()  # extra_validator analogues
    pandas_checks: Sequence[PandasCheck] = ()  # vectorized UDF extension point
    group_checks: Sequence[GroupPandasCheck] = ()  # per-conversation asserts
    # resource guard (MAX_XML_ELEMENTS analogue, reference limits.py:58-67):
    # scope groups larger than this are excluded from the ordered window pass
    # (a single 10^8-turn conversation would serialize one sort task) and
    # reported with a limit: violation instead. None = unlimited.
    max_scope_rows: Optional[int] = None
    mode: str = "lax"

    def __post_init__(self) -> None:
        if self.mode not in VALIDATION_MODES:
            raise ValueError(f"mode must be one of {sorted(VALIDATION_MODES)}")


def transcript_spec() -> TableSpec:
    """The canonical spec for the transcripts table from BASELINE.json input_hint —
    the engine's flagship "schema".  Mirrors FIXTURES.md F1."""

    return TableSpec(
        name="transcripts",
        scope_col="conv_id",
        order_col="turn_idx",
        columns=(
            ColumnSpec("conv_id", (Required(), Pattern(("conv-[0-9]{8}",)))),
            ColumnSpec("turn_idx", (Required(), MinInclusive(0))),
            ColumnSpec(
                "role",
                (Required(), Enumeration(("system", "user", "assistant", "tool"))),
            ),
            # text: whiteSpace=preserve (builtins.py:79-84) — NEVER normalized.
            ColumnSpec("text", (Required(), MinLength(1), MaxLength(65536))),
            ColumnSpec(
                "tool",
                (
                    Pattern(("tool-[0-9]{3}",)),
                    Required(when="role = 'tool'"),
                ),
            ),
            ColumnSpec("ts", (Required(),)),
        ),
        identities=(
            Key("turn-key", fields=("turn_idx",), scope="conv_id"),
            Keyref(
                "tool-ref",
                fields=("tool",),
                refer_fields=("tool",),
                scope="conv_id",
                selector="role = 'tool'",
                refer_selector="role = 'assistant' AND tool IS NOT NULL",
            ),
        ),
        model=(
            Contiguity(),
            Monotone("ts-monotone", column="ts", strict=False),
            Occurs("min-one-user", where="role = 'user'", min_occurs=1),
            FirstTurn("first-is-system-or-user", where="role IN ('system','user')"),
            Transition(
                "role-transitions",
                column="role",
                allowed={
                    "system": ("user",),
                    "user": ("assistant",),
                    "assistant": ("user", "assistant", "tool"),
                    "tool": ("assistant", "tool"),
                },
                start=("system", "user"),
            ),
        ),
    )
