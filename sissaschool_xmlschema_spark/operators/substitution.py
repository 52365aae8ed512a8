"""Substitution groups as a value-alias normalization transform.

The reference resolves substitution groups at build time: an element may stand
in for its group head everywhere the head is allowed
(xmlschema/validators/xsd_globals.py:567-570, elements.py:611-621).  The flat
engine's analogue: alias values in a column map onto their canonical head
BEFORE checks run, so enumerations / transitions / occurrence bounds written
against heads accept the aliases.

One literal-map projection (``element_at`` on a map literal) — no join, no
shuffle, fully codegen'd; the original value survives in ``<col>__orig`` for
violation reporting.
"""

from __future__ import annotations

from itertools import chain
from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_substitutions(
    df: DataFrame,
    column: str,
    mapping: Mapping[str, str],
    keep_original: bool = True,
) -> DataFrame:
    """Rewrite alias values to their substitution-group head.

    ``mapping`` = {alias: head}; unlisted values pass through unchanged.
    """
    m = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(mapping.items())]
    )
    head = F.coalesce(F.element_at(m, F.col(column)), F.col(column))
    cols = [
        head.alias(c) if c == column else F.col(c) for c in df.columns
    ]
    if keep_original:
        cols.append(F.col(column).alias(f"{column}__orig"))
    return df.select(*cols)
