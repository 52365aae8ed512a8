"""End-to-end minimum slice (SURVEY.md §7): role enumeration + (conv_id, turn_idx)
uniqueness over a tiny hand-planted table, asserting exact golden violation rows.

Mirrors the reference's declarative corpus idea: a case with ``--errors=N`` and
known error locations (xmlschema/testing/_factory.py).
"""

import datetime as dt

from sissaschool_xmlschema_spark import spec as S
from sissaschool_xmlschema_spark.plans.runner import validate

TS = dt.datetime(2024, 1, 1, 0, 0, 0)


def mk_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp",
    )


def small_spec():
    return S.TableSpec(
        name="transcripts",
        columns=(
            S.ColumnSpec(
                "role",
                (S.Enumeration(("system", "user", "assistant", "tool")),),
            ),
        ),
        identities=(S.Unique("turn-unique", fields=("turn_idx",), scope="conv_id"),),
    )


def test_clean_table_is_valid(spark):
    df = mk_df(
        spark,
        [
            ("c1", 0, "system", "hi", None, TS),
            ("c1", 1, "user", "hello", None, TS),
            ("c2", 0, "user", "yo", None, TS),
        ],
    )
    res = validate(df, small_spec())
    assert res.is_valid()
    verdicts = {r["conv_id"]: r["validity"] for r in res.verdicts().collect()}
    assert verdicts == {"c1": "valid", "c2": "valid"}


def test_enum_and_unique_violations_exact(spark):
    df = mk_df(
        spark,
        [
            ("c1", 0, "system", "hi", None, TS),
            ("c1", 1, "alien", "??", None, TS),  # enum violation
            ("c1", 2, "user", "a", None, TS),
            ("c1", 2, "assistant", "b", None, TS),  # duplicate turn_idx
            ("c2", 0, "user", "yo", None, TS),
        ],
    )
    res = validate(df, small_spec())
    v = sorted(
        (r["conv_id"], r["constraint_id"], r["offending_value"])
        for r in res.violations.collect()
    )
    assert v == [
        ("c1", "facet:role:Enumeration", "alien"),
        ("c1", "unique:turn-unique", "2"),
    ]
    # duplicate reported once with multiplicity, like identities.py:413-415
    dup = res.violations.filter("constraint_id = 'unique:turn-unique'").collect()[0]
    assert "(2 times)" in dup["reason"]
    verdicts = {r["conv_id"]: r["validity"] for r in res.verdicts().collect()}
    assert verdicts == {"c1": "invalid", "c2": "valid"}


def test_strict_mode_raises(spark):
    from sissaschool_xmlschema_spark.plans.runner import SparkSchemaValidationError

    df = mk_df(spark, [("c1", 0, "alien", "x", None, TS)])
    import pytest

    with pytest.raises(SparkSchemaValidationError):
        validate(df, small_spec(), mode="strict")


def test_null_tuple_skipped_in_unique(spark):
    # elements.py:912 — tuples with a null field are not counted
    df = mk_df(
        spark,
        [
            ("c1", None, "user", "a", None, TS),
            ("c1", None, "user", "b", None, TS),
        ],
    )
    res = validate(df, small_spec())
    assert res.violations.filter("constraint_id like 'unique:%'").count() == 0
