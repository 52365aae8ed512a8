"""Declarative --errors=N corpus runner — the engine twin of the reference's
testfiles factory (``xmlschema/testing/_factory.py:11-42``: one line per
case, schema + instance + expected error count, executed by one generated
test).  Here: one CASE per row — (spec-or-XSD, rows, expected violation
count) — executed by a single parametrized pytest, covering EVERY facet
family, every identity kind, and every model check the engine implements.

Counts are asserted EXACTLY, like ``--errors=N`` (not "at least")."""

from dataclasses import dataclass, field as dc_field
from typing import Optional

import pytest

from sissaschool_xmlschema_spark import spec as S
from sissaschool_xmlschema_spark.plans.runner import validate
from sissaschool_xmlschema_spark.xsd_compile import xsd_to_spec


@dataclass
class Case:
    id: str
    errors: int
    rows: list
    ddl: str = "doc string, pos int, v string"
    # exactly one of:
    facets: tuple = ()          # ColumnSpec('v', facets) shorthand
    spec: Optional[S.TableSpec] = None
    xsd: Optional[str] = None   # compiled via xsd_to_spec
    constraint: Optional[str] = None  # assert every violation carries this id
    alternatives: tuple = ()

    def build(self) -> S.TableSpec:
        if self.spec is not None:
            return self.spec
        if self.xsd is not None:
            return xsd_to_spec(self.xsd, scope_col="doc", order_col="pos")
        return S.TableSpec(
            name="case", scope_col="doc", order_col="pos",
            columns=(S.ColumnSpec("v", self.facets,
                                  alternatives=self.alternatives),),
        )


def _spec(**kw) -> S.TableSpec:
    kw.setdefault("name", "case")
    kw.setdefault("scope_col", "doc")
    kw.setdefault("pos", None)
    kw.pop("pos")
    kw.setdefault("order_col", "pos")
    return S.TableSpec(**kw)


CASES = [
    # --- facet families (reference tests/validators/test_facets.py) -------
    Case("enumeration", 2, [("d", 0, "a"), ("d", 1, "x"), ("d", 2, "y"),
                            ("d", 3, None)],
         facets=(S.Enumeration(("a", "b")),),
         constraint="facet:v:Enumeration"),
    Case("pattern", 1, [("d", 0, "ab12"), ("d", 1, "AB")],
         facets=(S.Pattern(("[a-z0-9]+",)),), constraint="facet:v:Pattern"),
    Case("length", 2, [("d", 0, "abc"), ("d", 1, "ab"), ("d", 2, "abcd")],
         facets=(S.Length(3),), constraint="facet:v:Length"),
    Case("min-max-length", 2,
         [("d", 0, "ok"), ("d", 1, "x"), ("d", 2, "toolongvalue")],
         facets=(S.MinLength(2), S.MaxLength(6))),
    Case("bounds-inclusive", 2,
         [("d", 0, 5), ("d", 1, 0), ("d", 2, 11)],
         ddl="doc string, pos int, v int",
         facets=(S.MinInclusive(1), S.MaxInclusive(10))),
    Case("bounds-exclusive", 2,
         [("d", 0, 5), ("d", 1, 1), ("d", 2, 10)],
         ddl="doc string, pos int, v int",
         facets=(S.MinExclusive(1), S.MaxExclusive(10))),
    Case("total-digits", 1, [("d", 0, "123.4"), ("d", 1, "12345")],
         facets=(S.TotalDigits(4),), constraint="facet:v:TotalDigits"),
    Case("fraction-digits", 1, [("d", 0, "1.23"), ("d", 1, "1.234")],
         facets=(S.FractionDigits(2),), constraint="facet:v:FractionDigits"),
    Case("whitespace-replace", 1, [("d", 0, "a b"), ("d", 1, "a\tb")],
         facets=(S.WhiteSpace("replace"),), constraint="facet:v:WhiteSpace"),
    Case("whitespace-collapse", 2,
         [("d", 0, "a b"), ("d", 1, "a  b"), ("d", 2, " a")],
         facets=(S.WhiteSpace("collapse"),)),
    Case("explicit-timezone", 1,
         [("d", 0, "2001-10-26T21:32:52Z"), ("d", 1, "2001-10-26T21:32:52")],
         facets=(S.ExplicitTimezone("required"),)),
    Case("boolean-lexical", 2,
         [("d", 0, "true"), ("d", 1, "1"), ("d", 2, "TRUE"), ("d", 3, "yes")],
         facets=(S.BooleanLexical(),)),
    Case("required", 1, [("d", 0, "x"), ("d", 1, None)],
         facets=(S.Required(),), constraint="facet:v:Required"),
    Case("required-when", 1,
         [("d", 0, "x"), ("d", 1, None), ("d", 2, None)],
         ddl="doc string, pos int, v string",
         spec=_spec(pos=None, columns=(
             S.ColumnSpec("v", (S.Required(when="pos = 1"),)),))),
    Case("prohibited", 1, [("d", 0, None), ("d", 1, "x")],
         facets=(S.Prohibited(),), constraint="facet:v:Prohibited"),
    Case("fixed-value", 1, [("d", 0, "std"), ("d", 1, "odd"), ("d", 2, None)],
         facets=(S.FixedValue("std"),), constraint="facet:v:FixedValue"),
    Case("assertion", 1, [("d", 0, 4), ("d", 1, 5)],
         ddl="doc string, pos int, v int",
         facets=(S.Assertion("$value % 2 = 0"),),
         constraint="facet:v:Assertion"),
    Case("nillable", 1,
         [("d", 0, None, "true"), ("d", 1, "x", "true"), ("d", 2, "x", None)],
         ddl="doc string, pos int, v string, nil string",
         spec=_spec(pos=None, columns=(
             S.ColumnSpec("v", (S.Nillable(nil_col="nil"),)),))),
    Case("hex-binary", 1, [("d", 0, "0fA1"), ("d", 1, "0fA")],
         facets=(S.HexBinary(),), constraint="facet:v:HexBinary"),
    # builtin integer width (xs:byte): out-of-range flagged, in-range and
    # non-castable (BuiltinLexical's job) pass
    Case("int-range", 2, [("d", 0, "127"), ("d", 1, "128"),
                          ("d", 2, "-129"), ("d", 3, "x"), ("d", 4, None)],
         facets=(S.IntRange(-128, 127),), constraint="facet:v:IntRange"),
    # binary lengths count decoded OCTETS: 'AABBCCDD' = 4 octets passes
    # length=4; 'AABB' = 2 fails; malformed hex is HexBinary's violation
    Case("binary-length-hex", 1,
         [("d", 0, "AABBCCDD"), ("d", 1, "AABB"), ("d", 2, "xyz"),
          ("d", 3, None)],
         facets=(S.BinaryLength(4, 4, codec="hex"),),
         constraint="facet:v:BinaryLength"),
    # base64 'YWJjZA==' decodes to 4 octets (in [3,8]); 'YQ==' is 1 (out)
    Case("binary-length-b64", 1,
         [("d", 0, "YWJjZA=="), ("d", 1, "YQ=="), ("d", 2, None)],
         facets=(S.BinaryLength(3, 8, codec="base64"),),
         constraint="facet:v:BinaryLength"),
    Case("base64-binary", 1, [("d", 0, "YWJjZA=="), ("d", 1, "YWJjZA=")],
         facets=(S.Base64Binary(),), constraint="facet:v:Base64Binary"),
    Case("xsd-error", 1, [("d", 0, None), ("d", 1, "anything")],
         facets=(S.XsdError(),), constraint="facet:v:XsdError"),
    Case("list-of", 2,
         [("d", 0, "1 2 3"), ("d", 1, "1 x 3"), ("d", 2, "1 2 3 4 5")],
         facets=(S.ListOf(item_facets=(S.Pattern(("[0-9]+",)),),
                          max_items=4),),
         constraint="facet:v:ListOf"),
    Case("union-of", 1, [("d", 0, "123"), ("d", 1, "abc"), ("d", 2, "a1")],
         facets=(S.UnionOf(alternatives=((S.Pattern(("[0-9]+",)),),
                                         (S.Pattern(("[a-z]+",)),))),),
         constraint="facet:v:UnionOf"),
    Case("not-in-set", 1, [("d", 0, "ok"), ("d", 1, "banned")],
         facets=(S.NotInSet(("banned",)),), constraint="facet:v:NotInSet"),
    Case("builtin-lexical", 2,
         [("d", 0, "P1Y"), ("d", 1, "P"), ("d", 2, "P1S"), ("d", 3, None)],
         facets=(S.BuiltinLexical("duration"),),
         constraint="facet:v:BuiltinLexical"),
    Case("type-alternatives", 2,
         [("d", 0, "call", None), ("d", 1, "call", "t-1"),
          ("d", 2, "other", "t-1"), ("d", 3, "other", None)],
         ddl="doc string, pos int, kind string, v string",
         spec=_spec(pos=None, columns=(
             S.ColumnSpec(
                 "v", facets=(S.Prohibited(),),
                 alternatives=(
                     S.TypeAlternative(test="kind = 'call'",
                                       facets=(S.Required(),), name="c"),
                 ),
             ),))),
    # --- identity constraints (identities.py) -----------------------------
    Case("unique-dup", 1,
         [("d", 0, "k1"), ("d", 1, "k1"), ("d", 2, "k2"), ("d", 3, None),
          ("d", 4, None)],  # null tuples skipped (elements.py:912)
         spec=_spec(pos=None, identities=(
             S.Unique("u", fields=("v",), scope="doc"),)),
         constraint="unique:u"),
    Case("key-dup-and-missing", 2,  # 1 duplicate group + 1 missing-field row
         [("d", 0, "k1"), ("d", 1, "k1"), ("d", 2, None)],
         spec=_spec(pos=None, identities=(
             S.Key("k", fields=("v",), scope="doc"),))),
    Case("keyref-dangling", 1,
         [("d", 0, "a", "a"), ("d", 1, "b", "a"), ("d", 2, "c", "zz")],
         ddl="doc string, pos int, v string, ref string",
         spec=_spec(pos=None, identities=(
             S.Keyref("r", fields=("ref",), refer_fields=("v",),
                      scope="doc"),)),
         constraint="keyref:r"),
    # --- model checks (models.py / particles.py) ---------------------------
    Case("occurs-min-max", 2,
         [("d1", 0, "u"), ("d1", 1, "u"), ("d1", 2, "u"), ("d2", 0, "x")],
         spec=_spec(pos=None, model=(
             S.Occurs("occ", where="v = 'u'", min_occurs=1, max_occurs=2),)),
         constraint="occurs:occ"),
    Case("contiguity", 2,
         [("d", 0, "a"), ("d", 2, "b"),  # gap
          ("e", 1, "a")],                # doesn't start at 0
         spec=_spec(pos=None, model=(S.Contiguity(),))),
    Case("monotone", 1,
         [("d", 0, 5), ("d", 1, 3), ("d", 2, 9)],
         ddl="doc string, pos int, v int",
         spec=_spec(pos=None, model=(
             S.Monotone("mono", column="v", strict=False),)),
         constraint="model:mono"),
    Case("first-last-turn", 2,
         [("d", 0, "mid"), ("d", 1, "start"), ("d", 2, "mid")],
         spec=_spec(pos=None, model=(
             S.FirstTurn("first", where="v = 'start'"),
             S.LastTurn("last", where="v = 'end'"),))),
    Case("transition", 1,
         [("d", 0, "a"), ("d", 1, "b"), ("d", 2, "a")],  # b→a illegal
         spec=_spec(pos=None, model=(
             S.Transition("tr", column="v",
                          allowed={"a": ("b",), "b": ("b",)},
                          start=("a",)),)),
         constraint="model:tr"),
    Case("row-assertion", 1,
         [("d", 0, "abc"), ("d", 1, "abcdef")],
         spec=_spec(pos=None, row_assertions=(
             S.RowAssertion("short", expr="length(v) <= 4"),)),
         constraint="assert:short"),
    # --- XSD-document-driven case (front door in the factory too) ----------
    Case("xsd-driven", 2,
         [("d", 0, "r1", "A"), ("d", 1, "r1", "C")],  # dup rid + bad grade
         ddl="doc string, pos int, rid string, grade string",
         xsd="""<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="docRoot">
    <xs:complexType><xs:sequence>
      <xs:element name="row" maxOccurs="unbounded">
        <xs:complexType>
          <xs:sequence>
            <xs:element name="grade">
              <xs:simpleType>
                <xs:restriction base="xs:string">
                  <xs:enumeration value="A"/><xs:enumeration value="B"/>
                </xs:restriction>
              </xs:simpleType>
            </xs:element>
          </xs:sequence>
          <xs:attribute name="rid" type="xs:ID" use="required"/>
        </xs:complexType>
      </xs:element>
    </xs:sequence></xs:complexType>
  </xs:element>
</xs:schema>"""),
]


@pytest.mark.parametrize("case", CASES, ids=[c.id for c in CASES])
def test_errors_factory(spark, case):
    df = spark.createDataFrame(case.rows, case.ddl)
    res = validate(df, case.build())
    rows = res.violations.collect()
    assert len(rows) == case.errors, (
        f"{case.id}: expected --errors={case.errors}, got {len(rows)}: "
        f"{[(r['constraint_id'], r['offending_value']) for r in rows]}"
    )
    if case.constraint:
        assert all(r["constraint_id"] == case.constraint for r in rows)


def test_factory_covers_every_facet_family():
    """The factory exercises every facet dataclass the spec module defines
    (the analogue of the reference factory covering every validator class)."""
    import dataclasses
    import inspect

    from sissaschool_xmlschema_spark import spec as SM

    facet_classes = {
        name
        for name, cls in inspect.getmembers(SM, inspect.isclass)
        if dataclasses.is_dataclass(cls) and issubclass(cls, SM.Facet)
        and cls is not SM.Facet
    }

    def collect(facets, acc):
        for f in facets:
            acc.add(type(f).__name__)
            if isinstance(f, SM.ListOf):
                collect(f.item_facets, acc)
            if isinstance(f, SM.UnionOf):
                for alt in f.alternatives:
                    collect(alt, acc)

    covered = set()
    for case in CASES:
        sp = case.build()
        for col in sp.columns:
            collect(col.facets, covered)
            for alt in col.alternatives:
                collect(alt.facets, covered)
    missing = facet_classes - covered
    assert not missing, f"facet families with no --errors case: {missing}"
