"""Tabular mirrors of the reference's collection examples (FIXTURES.md F2/F3).

F2 ← tests/test_cases/examples/collection/collection2.xsd: xs:key
`author_key_constraint` on object/author/@dn; collection2.xml --errors 1.
F3 ← collection3.xsd: key `author_dn` + keyref `author_dn_ref`;
collection3.xml --errors 1 (dangling ref reported with multiplicity,
identities.py:413-415).
"""

from sissaschool_xmlschema_spark import spec as S
from sissaschool_xmlschema_spark.operators.identity import keyref_violations
from sissaschool_xmlschema_spark.plans.runner import validate


def test_f2_collection_key_one_duplicate(spark):
    objects = spark.createDataFrame(
        [
            ("col0", "obj1", "Joan Miró", 1, "The Dream", 1925),
            ("col0", "obj2", "Joan Miró", 2, "Head", 1925),  # duplicate dn
            ("col0", "obj3", "Salvador Dalí", 3, "Persistence", 1931),
            ("col1", "obj4", "Joan Miró", 1, "Other", 1930),  # other scope: ok
        ],
        "collection_id string, object_id string, author_dn string, "
        "position int, title string, year int",
    )
    sp = S.TableSpec(
        name="objects",
        scope_col="collection_id",
        order_col="position",
        identities=(
            S.Key("author_key_constraint", fields=("author_dn",),
                  scope="collection_id"),
        ),
    )
    res = validate(objects, sp)
    v = res.violations.collect()
    assert len(v) == 1  # --errors 1
    assert v[0]["constraint_id"] == "key:author_key_constraint"
    assert v[0]["offending_value"] == "Joan Miró"
    assert "(2 times)" in v[0]["reason"]


def test_f3_collection_keyref_dangling_with_multiplicity(spark):
    authors = spark.createDataFrame(
        [
            ("col0", "JM", "Joan Miró"),
            ("col0", "SD", "Salvador Dalí"),
        ],
        "collection_id string, dn string, name string",
    )
    objects = spark.createDataFrame(
        [
            ("col0", "obj1", "JM"),
            ("col0", "obj2", "XX"),  # dangling, referenced twice
            ("col0", "obj3", "XX"),
            ("col0", "obj4", "SD"),
        ],
        "collection_id string, object_id string, author_ref string",
    )
    c = S.Keyref(
        "author_dn_ref",
        fields=("author_ref",),
        refer_fields=("dn",),
        scope="collection_id",
    )
    v = keyref_violations(objects, c, "objects", keys_df=authors).collect()
    assert len(v) == 1  # one missing tuple, counted once
    assert v[0]["offending_value"] == "XX"
    assert "(2 times)" in v[0]["reason"]  # multiplicity like identities.py:413-415


def test_f3_key_missing_field(spark):
    # xs:key demands every field present (identities.py:523-531)
    objects = spark.createDataFrame(
        [("col0", "obj1", None), ("col0", "obj2", "JM")],
        "collection_id string, object_id string, author_dn string",
    )
    sp = S.TableSpec(
        name="objects",
        scope_col="collection_id",
        order_col="object_id",
        identities=(
            S.Key("author_key", fields=("author_dn",), scope="collection_id"),
        ),
    )
    v = validate(objects, sp).violations.collect()
    assert len(v) == 1
    assert v[0]["constraint_id"] == "key:author_key:missing-field"


def test_vehicles_2_errors(spark):
    """Mirrors examples/vehicles/vehicles-2_errors.xml --errors=2: stray
    character data inside element-only content — flat-table form: rows whose
    kind is not a legal child of their parent container (conditional
    enumeration via ColumnSpec.when, the xsi:type-style dispatch)."""
    vehicles = spark.createDataFrame(
        [
            ("v1", 1, "cars", "car", "Porsche", "911"),
            ("v1", 2, "cars", "chardata", None, None),    # error 1
            ("v1", 3, "cars", "car", "Porsche", "911"),
            ("v1", 4, "bikes", "bike", "Harley-Davidson", "WL"),
            ("v1", 5, "bikes", "chardata", None, None),   # error 2
            ("v1", 6, "bikes", "bike", "Yamaha", "XS650"),
        ],
        "doc string, pos int, parent string, kind string, make string, "
        "model string",
    )
    sp = S.TableSpec(
        name="vehicles",
        scope_col="doc",
        order_col="pos",
        columns=(
            S.ColumnSpec(
                "kind", (S.Enumeration(("car",)),), when="parent = 'cars'"
            ),
            S.ColumnSpec(
                "kind", (S.Enumeration(("bike",)),), when="parent = 'bikes'"
            ),
        ),
    )
    v = validate(vehicles, sp).violations.collect()
    assert len(v) == 2  # --errors=2
    assert sorted(r["offending_value"] for r in v) == ["chardata", "chardata"]
