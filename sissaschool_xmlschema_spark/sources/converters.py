"""JSON converter conventions over the conversation document model.

The reference ships a converter family that renders the same decoded XML
document under different JSON conventions (``xmlschema/converters/``:
``parker.py:22`` ParkerConverter, ``badgerfish.py:24`` BadgerFishConverter,
``jsonml.py`` JsonMLConverter; dispatched by ``to_json``/``decode``
``convention=`` in the top-level API).  This module is the engine's twin for
the flat conversation document (the element-children shape produced by
``xml_io.encode_conversation_xml``: a ``<conversation>`` root holding a
``<conv_id>`` leaf and repeated ``<turn>`` elements of leaf children).

Spark-first shape — everything is ONE groupBy exchange (which vanishes on
the conv_id-bucketed production layout) plus row-local JSON assembly:

* per-turn JSON renders JVM-side (``to_json`` over structs; null columns =
  absent XML elements = absent JSON keys, exactly the reference's decode of
  a missing child);
* per-conversation assembly is string concat over the ordered turn array
  (``sort_array`` on structs whose first field is the order key — the same
  deterministic document order ``encode_conversation_xml`` uses);
* the conventions' data-dependent shapes are honored: Parker and BadgerFish
  collapse a SINGLE repeated child to an object and use a JSON array only
  for 2+ occurrences (parker.py:75-81 ``result_dict[name].append`` /
  KeyError dance), Parker drops the root by default (preserve_root=False,
  parker.py:63-66), JsonML renders the element-tuple array form with all
  leaf text as strings.

Escaping rides ``to_json`` in both engines (Spark Jackson / DuckDB yyjson
agree on the JSON mandatory-escape set), which is what makes these
conventions oracle-able byte-for-byte.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_TURN_COLS = ("turn_idx", "role", "text", "tool")


def _leaf(col: F.Column) -> F.Column:
    """Escaped JSON scalar for one value: ``to_json(array(v))`` minus the
    brackets — the only JVM-native way to JSON-escape a lone scalar."""
    arr = F.to_json(F.array(col))
    return F.substring(arr, F.lit(2), F.length(arr) - 2)


def _ordered_turn_json(
    df: DataFrame, conv_col: str, order_col: str, turn_json: F.Column
) -> DataFrame:
    """``(conv_col, turns: array<string>)`` — per-turn JSON strings in
    document order (order key first in the sort struct; the rendered JSON
    itself is the tiebreaker, so duplicates order deterministically)."""
    pair = F.struct(F.col(order_col), turn_json.alias("j"))
    return df.groupBy(conv_col).agg(
        F.transform(
            F.sort_array(F.collect_list(pair)), lambda s: s["j"]
        ).alias("turns")
    )


def _collapse_single(turns: F.Column) -> F.Column:
    """Parker/BadgerFish repeated-child rule: one occurrence decodes to the
    object itself, 2+ to a JSON array (parker.py:75-88)."""
    return F.when(
        F.size(turns) == 1, F.element_at(turns, 1)
    ).otherwise(F.concat(F.lit("["), F.concat_ws(",", turns), F.lit("]")))


def parker_json(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    turn_cols: Sequence[str] = DEFAULT_TURN_COLS,
    preserve_root: bool = False,
    out_col: str = "json",
) -> DataFrame:
    """Parker-convention JSON per conversation: ``(conv_col, json)``.

    Attributes don't exist in the element-children document shape, so Parker
    (which would drop them, parker.py:39 ``attr_prefix=None``) keeps every
    leaf: ``{"conv_id": v, "turn": {...} | [{...}, ...]}``.  Null columns
    are absent keys (missing child elements).  ``preserve_root`` wraps the
    result under the ``conversation`` root name (parker.py:63-66).
    """
    turn_json = F.to_json(F.struct(*[F.col(c) for c in turn_cols]))
    agg = _ordered_turn_json(df, conv_col, order_col, turn_json)
    body = F.concat(
        F.lit('{"' + conv_col + '":'),
        _leaf(F.col(conv_col)),
        F.lit(',"turn":'),
        _collapse_single(F.col("turns")),
        F.lit("}"),
    )
    if preserve_root:
        body = F.concat(F.lit('{"conversation":'), body, F.lit("}"))
    return agg.select(F.col(conv_col), body.alias(out_col))


def _text_key_json(
    df: DataFrame, conv_col: str, order_col: str,
    turn_cols: Sequence[str], out_col: str, text_key: str,
) -> DataFrame:
    """Shared renderer for the text-key conventions (BadgerFish ``$``,
    GData ``$t``): every leaf's text content nests under ``text_key``, the
    root element is preserved, repeated children collapse like Parker."""
    fields = [
        F.when(
            F.col(c).isNotNull(), F.struct(F.col(c).alias(text_key))
        ).alias(c)
        for c in turn_cols
    ]
    turn_json = F.to_json(F.struct(*fields))
    agg = _ordered_turn_json(df, conv_col, order_col, turn_json)
    return agg.select(
        F.col(conv_col),
        F.concat(
            F.lit('{"conversation":{"' + conv_col + '":{"'
                  + text_key + '":'),
            _leaf(F.col(conv_col)),
            F.lit('},"turn":'),
            _collapse_single(F.col("turns")),
            F.lit("}}"),
        ).alias(out_col),
    )


def badgerfish_json(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    turn_cols: Sequence[str] = DEFAULT_TURN_COLS,
    out_col: str = "json",
) -> DataFrame:
    """BadgerFish-convention JSON per conversation: ``(conv_col, json)``.

    Every leaf's text content lands under ``"$"`` (badgerfish.py:42
    ``text_key='$'``); the root element is preserved:
    ``{"conversation": {"conv_id": {"$": v}, "turn": ...}}``.  A null
    column is an absent element, so its key is absent (the ``when`` guard —
    ``to_json`` would otherwise render ``{}``).
    """
    return _text_key_json(df, conv_col, order_col, turn_cols, out_col, "$")


def gdata_json(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    turn_cols: Sequence[str] = DEFAULT_TURN_COLS,
    out_col: str = "json",
) -> DataFrame:
    """GData-protocol-convention JSON (converters/gdata.py:24): BadgerFish's
    structure with text under ``"$t"`` (gdata.py:43 ``text_key='$t'``).
    Namespace-prefix ``$``-mangling (gdata.py:51-56) does not arise in the
    single-namespace flat document."""
    return _text_key_json(df, conv_col, order_col, turn_cols, out_col, "$t")


def abdera_json(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    turn_cols: Sequence[str] = DEFAULT_TURN_COLS,
    out_col: str = "json",
) -> DataFrame:
    """Abdera-convention JSON (converters/abdera.py:24).

    For ATTRIBUTE-LESS element-children documents — which is exactly the
    engine's conversation shape — Abdera's element_decode degenerates to
    Parker's: no ``attributes``/``children`` wrapper is emitted when
    ``data.attributes`` is empty (abdera.py:78-88 falls through to bare
    ``children``), simple children decode to their text, and repeated
    children collapse single→scalar / 2+→array the same way
    (abdera.py:64-73).  Rendering Parker here is therefore exact, not an
    approximation."""
    return parker_json(df, conv_col, order_col, turn_cols,
                       preserve_root=False, out_col=out_col)


def jsonml_json(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    turn_cols: Sequence[str] = DEFAULT_TURN_COLS,
    out_col: str = "json",
) -> DataFrame:
    """JsonML-convention JSON per conversation: ``(conv_col, json)``.

    The element-tuple array form (converters/jsonml.py): ``["conversation",
    ["conv_id", v], ["turn", ["turn_idx", "0"], ["role", "user"], ...],
    ...]``.  JsonML is a direct XML mapping, so every leaf value is the
    element's TEXT — a string — and absent elements are absent tuples.
    Heterogeneous arrays aren't a Spark SQL type, so the document is
    assembled by concat over ``to_json``-escaped leaves (still one
    projection, zero Python).
    """

    def tuple_frag(name: str) -> F.Column:
        return F.when(
            F.col(name).isNotNull(),
            F.concat(
                F.lit('["' + name + '",'),
                _leaf(F.col(name).cast("string")),
                F.lit("]"),
            ),
        )

    turn_json = F.concat(
        F.lit('["turn",'),
        F.concat_ws(",", F.array_compact(
            F.array(*[tuple_frag(c) for c in turn_cols])
        )),
        F.lit("]"),
    )
    agg = _ordered_turn_json(df, conv_col, order_col, turn_json)
    return agg.select(
        F.col(conv_col),
        F.concat(
            F.lit('["conversation",["' + conv_col + '",'),
            _leaf(F.col(conv_col).cast("string")),
            F.lit("],"),
            F.concat_ws(",", F.col("turns")),
            F.lit("]"),
        ).alias(out_col),
    )
