"""Schema composition (spec_compose.py): include / redefine / override."""

import pytest

from sissaschool_xmlschema_spark import spec as S
from sissaschool_xmlschema_spark.spec_compose import (
    SpecCompositionError,
    include,
    override,
    redefine,
)


def base_spec():
    return S.TableSpec(
        name="transcripts",
        columns=(
            S.ColumnSpec("role", (S.Enumeration(("user", "assistant")),)),
            S.ColumnSpec("text", (S.MinLength(1),)),
        ),
        identities=(
            S.Unique("turn-unique", fields=("turn_idx",), scope="conv_id"),
        ),
    )


def test_include_union_and_identical_ok():
    extra = S.TableSpec(
        name="transcripts_ext",
        columns=(
            S.ColumnSpec("text", (S.MinLength(1),)),  # identical -> ok
            S.ColumnSpec("tool", (S.Pattern(("tool-[0-9]{3}",)),)),
        ),
    )
    merged = include(base_spec(), extra)
    assert [c.name for c in merged.columns] == ["role", "text", "tool"]
    assert len(merged.identities) == 1


def test_include_conflict_raises():
    conflicting = S.TableSpec(
        name="x", columns=(S.ColumnSpec("text", (S.MinLength(5),)),)
    )
    with pytest.raises(SpecCompositionError, match="include conflict"):
        include(base_spec(), conflicting)


def test_redefine_replaces_and_requires_existing():
    red = S.TableSpec(
        name="x",
        columns=(
            S.ColumnSpec(
                "role", (S.Enumeration(("user", "assistant", "tool")),)
            ),
        ),
    )
    merged = redefine(base_spec(), red)
    role = next(c for c in merged.columns if c.name == "role")
    assert "tool" in role.facets[0].values
    ghost = S.TableSpec(name="x", columns=(S.ColumnSpec("nope", ()),))
    with pytest.raises(SpecCompositionError, match="can't redefine"):
        redefine(base_spec(), ghost)


def test_override_replaces_or_adds():
    over = S.TableSpec(
        name="x",
        columns=(
            S.ColumnSpec("role", (S.Enumeration(("system",)),)),  # replace
            S.ColumnSpec("tool", (S.Required(),)),  # add
        ),
        identities=(
            S.Unique("turn-unique", fields=("turn_idx", "role"), scope="conv_id"),
        ),
    )
    merged = override(base_spec(), over)
    names = [c.name for c in merged.columns]
    assert names == ["role", "text", "tool"]
    assert merged.identities[0].fields == ("turn_idx", "role")


def test_frame_compat_guard():
    other = S.TableSpec(name="x", scope_col="user_id")
    with pytest.raises(SpecCompositionError, match="scope_col"):
        include(base_spec(), other)


def test_composed_spec_compiles_and_validates(spark):
    """A composed spec lowers through compile_plan like a hand-written one."""
    import datetime as dt

    from sissaschool_xmlschema_spark.plans.runner import validate

    merged = override(
        base_spec(),
        S.TableSpec(
            name="x",
            columns=(S.ColumnSpec("tool", (S.Pattern(("tool-[0-9]{3}",)),)),),
        ),
    )
    df = spark.createDataFrame(
        [("c1", 0, "user", "hi", "BAD", dt.datetime(2024, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp",
    )
    got = {r.constraint_id for r in validate(df, merged).violations.collect()}
    assert got == {"facet:tool:Pattern"}
