"""A tiny independent pandas re-implementation of the constraint semantics,
used as a property-test oracle (SURVEY §5: cross-check verdicts against an
independent engine).  Deliberately naive — clarity over speed."""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, List

import pandas as pd

from sissaschool_xmlschema_spark import spec as S
from sissaschool_xmlschema_spark.functions.xsd_regex import translate_pattern

ROLE_ENUM = ("system", "user", "assistant", "tool")


def _py_regex(xsd_pattern: str):
    """Compile one XSD pattern for the PYTHON re engine.

    ``translate_pattern`` targets Java (\\p{Nd} for \\d, class subtraction
    ``[..&&[^..]]``, \\p{InXxx} blocks) — Python's re rejects those.  The
    oracle rewrites the one soundly-mappable construct (\\p{Nd} → \\d:
    Python \\d matches Unicode Nd) and otherwise asserts the pattern is in
    the Python-compatible subset, loudly, instead of raising a bare
    re.error mid-property-test."""
    translated = translate_pattern(xsd_pattern)
    for attempt in (translated, translated.replace(r"\p{Nd}", r"\d")):
        try:
            return re.compile(attempt)
        except re.error:
            continue
    raise NotImplementedError(
        f"pattern {xsd_pattern!r} translates to Java-only regex "
        f"{translated!r}; the pandas oracle covers the Python-compatible "
        "subset only — use a simpler pattern in oracle-checked specs"
    )


def count_violations(pdf: pd.DataFrame, spec: S.TableSpec) -> Dict[str, int]:
    """Violation count per constraint id, mirroring validate()'s semantics."""
    out: Counter = Counter()

    for col in spec.columns:
        for facet in col.facets:
            cid = f"facet:{col.name}:{type(facet).__name__}"
            for _, row in pdf.iterrows():
                v = row[col.name]
                if isinstance(facet, S.Required):
                    if facet.when is None or _when(row, facet.when):
                        if v is None or v is pd.NA or (
                            isinstance(v, float) and pd.isna(v)
                        ):
                            out[cid] += 1
                    continue
                if v is None or (not isinstance(v, str) and pd.isna(v)):
                    continue  # facets judge present values only
                if isinstance(facet, S.Enumeration):
                    if v not in facet.values:
                        out[cid] += 1
                elif isinstance(facet, S.Pattern):
                    if not any(
                        _py_regex(p).fullmatch(v) for p in facet.patterns
                    ):
                        out[cid] += 1
                elif isinstance(facet, S.MinLength):
                    if len(v) < facet.value:
                        out[cid] += 1
                elif isinstance(facet, S.MaxLength):
                    if len(v) > facet.value:
                        out[cid] += 1
                elif isinstance(facet, S.MinInclusive):
                    if v < facet.value:
                        out[cid] += 1
                elif isinstance(facet, S.MaxInclusive):
                    if v > facet.value:
                        out[cid] += 1
                else:
                    raise NotImplementedError(type(facet))

    scope, order = spec.scope_col, spec.order_col
    for c in spec.identities:
        if isinstance(c, S.Keyref):
            sel = pdf
            if c.selector:
                sel = pdf[pdf.apply(lambda r: _when(r, c.selector), axis=1)]
            keys = pdf
            if c.refer_selector:
                keys = pdf[
                    pdf.apply(lambda r: _when(r, c.refer_selector), axis=1)
                ]
            key_set = {
                tuple(r[k] for k in ([c.scope] if c.scope else []) + list(c.refer_fields))
                for _, r in keys.iterrows()
            }
            missing = set()
            for _, r in sel.iterrows():
                if any(pd.isna(r[f]) for f in c.fields):
                    continue
                tup = tuple(
                    r[k] for k in ([c.scope] if c.scope else []) + list(c.fields)
                )
                if tup not in key_set:
                    missing.add(tup)
            out[f"keyref:{c.name}"] += len(missing)
        else:  # Unique / Key
            kind = "key" if isinstance(c, S.Key) else "unique"
            counts: Counter = Counter()
            for _, r in pdf.iterrows():
                if any(pd.isna(r[f]) for f in c.fields):
                    if isinstance(c, S.Key):
                        out[f"key:{c.name}:missing-field"] += 1
                    continue
                tup = tuple(
                    r[k] for k in ([c.scope] if c.scope else []) + list(c.fields)
                )
                counts[tup] += 1
            out[f"{kind}:{c.name}"] += sum(1 for n in counts.values() if n > 1)

    for chk in spec.model:
        for conv_id, grp in pdf.groupby(scope):
            g = grp.sort_values(
                [order, *spec.tiebreakers], na_position="first"
            ).reset_index()
            if isinstance(chk, S.Contiguity):
                prev = None
                for idx in g[order]:
                    if idx is None or pd.isna(idx):
                        # NULL order values are the Key missing-field check's
                        # problem; the engine's ok-predicate is NULL → no emit,
                        # and the next row's lag sees NULL
                        prev = None
                        continue
                    ok = (prev is None and idx == 0) or (
                        prev is not None and idx == prev + 1
                    )
                    if not ok:
                        out[f"model:{chk.name}"] += 1
                    prev = idx
            elif isinstance(chk, S.Monotone):
                vals = list(g[chk.column])
                for a, b in zip(vals, vals[1:]):
                    bad = b < a if not chk.strict else b <= a
                    if bad:
                        out[f"model:{chk.name}"] += 1
            elif isinstance(chk, S.FirstTurn):
                if len(g) and not _when(g.iloc[0], chk.where):
                    out[f"model:{chk.name}"] += 1
            elif isinstance(chk, S.Transition):
                vals = list(g[chk.column])
                if vals and chk.start is not None and vals[0] not in chk.start:
                    out[f"model:{chk.name}"] += 1
                for a, b in zip(vals, vals[1:]):
                    if a in chk.allowed and b not in chk.allowed[a]:
                        out[f"model:{chk.name}"] += 1
            elif isinstance(chk, S.Occurs):
                n = sum(1 for _, r in g.iterrows() if _when(r, chk.where))
                bad = n < chk.min_occurs or (
                    chk.max_occurs is not None and n > chk.max_occurs
                )
                if bad:
                    out[f"occurs:{chk.name}"] += 1
            else:
                raise NotImplementedError(type(chk))
    return dict(out)


def _when(row, expr: str) -> bool:
    """Evaluate the tiny SQL-predicate subset the test specs use."""
    m = re.fullmatch(r"(\w+) = '([^']*)'", expr)
    if m:
        return row[m.group(1)] == m.group(2)
    m = re.fullmatch(r"(\w+) IN \(([^)]*)\)", expr)
    if m:
        vals = [v.strip().strip("'") for v in m.group(2).split(",")]
        return row[m.group(1)] in vals
    m = re.fullmatch(r"(\w+) = '([^']*)' AND (\w+) IS NOT NULL", expr)
    if m:
        return row[m.group(1)] == m.group(2) and not pd.isna(row[m.group(3)])
    raise NotImplementedError(expr)
