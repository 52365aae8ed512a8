"""Spec (de)serialization — the ``SchemaLoader`` / schema-document analogue.

The reference loads its schema from XSD documents (xmlschema/loaders.py,
``fetch_schema`` documents.py:46-128); this engine's "schema document" is a
JSON file mapping 1:1 onto the spec dataclasses:

```json
{
  "name": "transcripts",
  "scope_col": "conv_id",
  "order_col": "turn_idx",
  "columns": [
    {"name": "role", "facets": [
      {"kind": "Enumeration", "values": ["system", "user"]}]}
  ],
  "identities": [
    {"kind": "Key", "name": "turn-key", "fields": ["turn_idx"],
     "scope": "conv_id"}
  ],
  "model": [{"kind": "Contiguity"}, {"kind": "Occurs", "name": "min-user",
             "where": "role = 'user'", "min_occurs": 1}]
}
```

``kind`` selects the dataclass; remaining keys are its constructor args.
PandasCheck is code, not data, and intentionally has no serialized form
(register it on the TableSpec programmatically).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Mapping

from sissaschool_xmlschema_spark import spec as S

_FACETS = {
    cls.__name__: cls
    for cls in (
        S.Enumeration, S.Pattern, S.Length, S.MinLength, S.MaxLength,
        S.MinInclusive, S.MinExclusive, S.MaxInclusive, S.MaxExclusive,
        S.TotalDigits, S.FractionDigits, S.WhiteSpace, S.ExplicitTimezone,
        S.BooleanLexical, S.Required, S.Prohibited, S.FixedValue,
        S.Assertion, S.HexBinary, S.Base64Binary, S.XsdError, S.ListOf,
        S.UnionOf, S.NotInSet, S.Nillable, S.BuiltinLexical, S.IntRange,
        S.BinaryLength,
    )
}
_IDENTITIES = {c.__name__: c for c in (S.Unique, S.Key, S.Keyref)}
_MODEL = {
    c.__name__: c
    for c in (
        S.Occurs, S.Contiguity, S.Monotone, S.FirstTurn, S.LastTurn,
        S.Transition,
    )
}


def _detuple(v: Any) -> Any:
    """JSON arrays → tuples recursively, so round-tripped specs compare equal
    to their programmatic originals (dataclass fields use tuples)."""
    if isinstance(v, list):
        return tuple(_detuple(x) for x in v)
    if isinstance(v, dict):
        return {k: _detuple(x) for k, x in v.items()}
    return v


def _facet_from_dict(d: Mapping[str, Any]) -> S.Facet:
    d = {k: _detuple(v) for k, v in d.items()}
    kind = d.pop("kind")
    cls = _FACETS[kind]
    if cls is S.ListOf and "item_facets" in d:
        d["item_facets"] = tuple(_facet_from_dict(f) for f in d["item_facets"])
    if cls is S.UnionOf and "alternatives" in d:
        d["alternatives"] = tuple(
            tuple(_facet_from_dict(f) for f in alt) for alt in d["alternatives"]
        )
    return cls(**d)


def _kinded(obj: object) -> dict:
    d = dataclasses.asdict(obj)
    d.pop("mode", None)  # init=False field
    if isinstance(obj, S.ListOf):
        d["item_facets"] = [_kinded(f) for f in obj.item_facets]
    if isinstance(obj, S.UnionOf):
        d["alternatives"] = [[_kinded(f) for f in alt] for alt in obj.alternatives]
    return {"kind": type(obj).__name__, **d}


def spec_to_dict(spec: S.TableSpec) -> dict:
    return {
        "name": spec.name,
        "scope_col": spec.scope_col,
        "order_col": spec.order_col,
        "tiebreakers": list(spec.tiebreakers),
        "mode": spec.mode,
        "columns": [
            {
                "name": c.name,
                "facets": [_kinded(f) for f in c.facets],
                **({"when": c.when} if c.when else {}),
                **(
                    {
                        "alternatives": [
                            {
                                "test": a.test,
                                "name": a.name,
                                "facets": [_kinded(f) for f in a.facets],
                            }
                            for a in c.alternatives
                        ]
                    }
                    if getattr(c, "alternatives", ())
                    else {}
                ),
            }
            for c in spec.columns
        ],
        "identities": [_kinded(c) for c in spec.identities],
        "model": [_kinded(c) for c in spec.model],
        "row_assertions": [
            dataclasses.asdict(a) for a in spec.row_assertions
        ],
        "max_scope_rows": spec.max_scope_rows,
    }


def spec_from_dict(d: Mapping[str, Any]) -> S.TableSpec:
    def strip(m: Mapping[str, Any]) -> dict:
        out = {k: _detuple(v) for k, v in m.items()}
        out.pop("kind", None)
        return out

    return S.TableSpec(
        name=d["name"],
        scope_col=d.get("scope_col", "conv_id"),
        order_col=d.get("order_col", "turn_idx"),
        tiebreakers=tuple(d.get("tiebreakers", ())),
        mode=d.get("mode", "lax"),
        columns=tuple(
            S.ColumnSpec(
                c["name"],
                tuple(_facet_from_dict(f) for f in c.get("facets", ())),
                when=c.get("when"),
                alternatives=tuple(
                    S.TypeAlternative(
                        facets=tuple(
                            _facet_from_dict(f) for f in a.get("facets", ())
                        ),
                        test=a.get("test"),
                        name=a.get("name", ""),
                    )
                    for a in c.get("alternatives", ())
                ),
            )
            for c in d.get("columns", ())
        ),
        identities=tuple(
            _IDENTITIES[c["kind"]](**{
                **strip(c),
                "fields": tuple(c.get("fields", ())),
                **(
                    {"refer_fields": tuple(c.get("refer_fields", ()))}
                    if c["kind"] == "Keyref" else {}
                ),
            })
            for c in d.get("identities", ())
        ),
        model=tuple(
            _MODEL[c["kind"]](**strip(c)) for c in d.get("model", ())
        ),
        row_assertions=tuple(
            S.RowAssertion(**a) for a in d.get("row_assertions", ())
        ),
        max_scope_rows=d.get("max_scope_rows"),
    )


def load_spec(path: str) -> S.TableSpec:
    with open(path) as f:
        return spec_from_dict(json.load(f))


def save_spec(spec: S.TableSpec, path: str) -> None:
    with open(path, "w") as f:
        json.dump(spec_to_dict(spec), f, indent=2)
