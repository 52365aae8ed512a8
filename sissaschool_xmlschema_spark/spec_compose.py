"""Schema composition — xs:include / xs:redefine / xs:override for specs.

The reference assembles one effective schema from many documents before any
validation happens (``SchemaLoader.load_declared_schemas``,
loaders.py:84-167: include/redefine/override dispatch :118-167;
``include_schema`` :261).  The engine's analogue composes ``TableSpec``
objects on the driver at compile time — the merged spec then lowers through
``compile_plan`` exactly like a hand-written one, so composition costs
nothing at execution time.

Semantics follow the XSD composition rules:

* :func:`include` — same-target union: components from both specs; a name
  collision must be IDENTICAL in both (the reference errors on
  conflicting same-name globals in one namespace).
* :func:`redefine` — every component in the redefining spec REPLACES the
  same-named base component, and must actually redefine something
  (xs:redefine requires the redefined component to exist —
  loaders.py:152-153 errors otherwise).
* :func:`override` — replace-if-present, add-if-new (xs:override drops
  the pervasive-restriction requirement; loaders.py:154-167).

Components are keyed the way the reference keys globals: columns by column
name, identities / model constraints by their ``name`` attribute, row
assertions by ``name``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

from sissaschool_xmlschema_spark import spec as S


class SpecCompositionError(ValueError):
    """Illegal composition — the loaders.py:152-155 error analogue."""


def _keyed(items, kind: str) -> Dict[str, object]:
    out: Dict[str, object] = {}
    for it in items:
        key = it.name if hasattr(it, "name") else type(it).__name__
        if key in out:
            raise SpecCompositionError(f"duplicate {kind} {key!r} in one spec")
        out[key] = it
    return out


def _check_frame_compat(base: S.TableSpec, other: S.TableSpec) -> None:
    for attr in ("scope_col", "order_col"):
        if getattr(base, attr) != getattr(other, attr):
            raise SpecCompositionError(
                f"cannot compose specs with different {attr}: "
                f"{getattr(base, attr)!r} vs {getattr(other, attr)!r}"
            )


def _rebuild(
    base: S.TableSpec,
    columns: Dict[str, S.ColumnSpec],
    identities: Dict[str, object],
    model: Dict[str, object],
    assertions: Dict[str, S.RowAssertion],
) -> S.TableSpec:
    return dataclasses.replace(
        base,
        columns=tuple(columns.values()),
        identities=tuple(identities.values()),
        model=tuple(model.values()),
        row_assertions=tuple(assertions.values()),
    )


def _parts(
    spec: S.TableSpec,
) -> Tuple[Dict[str, object], Dict[str, object], Dict[str, object], Dict[str, object]]:
    return (
        _keyed(spec.columns, "column"),
        _keyed(spec.identities, "identity"),
        _keyed(spec.model, "model constraint"),
        _keyed(spec.row_assertions, "row assertion"),
    )


def include(base: S.TableSpec, other: S.TableSpec) -> S.TableSpec:
    """Union of two same-shape specs (xs:include, loaders.py:261).

    A component defined in both must be IDENTICAL (dataclass equality) —
    anything else is the reference's conflicting-global error."""
    _check_frame_compat(base, other)
    merged = []
    for (b, o), kind in zip(
        zip(_parts(base), _parts(other)),
        ("column", "identity", "model constraint", "row assertion"),
    ):
        m = dict(b)
        for key, item in o.items():
            if key in m and m[key] != item:
                raise SpecCompositionError(
                    f"include conflict: {kind} {key!r} differs between specs"
                )
            m[key] = item
        merged.append(m)
    return _rebuild(base, *merged)


def redefine(base: S.TableSpec, redefining: S.TableSpec) -> S.TableSpec:
    """Replace same-named components (xs:redefine).  Every redefining
    component must exist in the base — redefining nothing is the
    loaders.py:152-153 error."""
    _check_frame_compat(base, redefining)
    merged = []
    for (b, o), kind in zip(
        zip(_parts(base), _parts(redefining)),
        ("column", "identity", "model constraint", "row assertion"),
    ):
        m = dict(b)
        for key, item in o.items():
            if key not in m:
                raise SpecCompositionError(
                    f"can't redefine {kind} {key!r}: not defined in base spec"
                )
            m[key] = item
        merged.append(m)
    return _rebuild(base, *merged)


def override(base: S.TableSpec, overriding: S.TableSpec) -> S.TableSpec:
    """Replace-if-present, add-if-new (xs:override, loaders.py:154-167)."""
    _check_frame_compat(base, overriding)
    merged = []
    for b, o in zip(_parts(base), _parts(overriding)):
        m = dict(b)
        m.update(o)
        merged.append(m)
    return _rebuild(base, *merged)
