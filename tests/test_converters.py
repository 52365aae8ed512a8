"""JSON converter conventions (reference xmlschema/converters/: Parker,
BadgerFish, JsonML) — exact rendered strings plus structural equality
against straight-line Python implementations of each convention."""

import json

from sissaschool_xmlschema_spark.sources.converters import (
    badgerfish_json,
    jsonml_json,
    parker_json,
)

DDL = "conv_id string, turn_idx int, role string, text string, tool string"

ROWS = [
    ("c1", 0, "user", 'hi "there"', None),
    ("c1", 1, "assistant", "hello\nback", "search"),
    ("c2", 0, "user", "solo", None),  # single turn: object, not array
]


def _df(spark):
    return spark.createDataFrame(ROWS, DDL)


def _by_conv(df):
    return {r["conv_id"]: r["json"] for r in df.collect()}


def test_parker_convention(spark):
    got = _by_conv(parker_json(_df(spark)))
    # multi-turn conversation: "turn" is an array; null tool key absent
    assert json.loads(got["c1"]) == {
        "conv_id": "c1",
        "turn": [
            {"turn_idx": 0, "role": "user", "text": 'hi "there"'},
            {"turn_idx": 1, "role": "assistant", "text": "hello\nback",
             "tool": "search"},
        ],
    }
    # single-turn conversation collapses to an object (parker.py:75-81)
    assert json.loads(got["c2"]) == {
        "conv_id": "c2",
        "turn": {"turn_idx": 0, "role": "user", "text": "solo"},
    }
    # rendered compactly, keys in element order (byte-stable for oracles)
    assert got["c2"] == (
        '{"conv_id":"c2","turn":{"turn_idx":0,"role":"user","text":"solo"}}'
    )


def test_parker_preserve_root(spark):
    got = _by_conv(parker_json(_df(spark), preserve_root=True))
    assert json.loads(got["c2"])["conversation"]["conv_id"] == "c2"


def test_badgerfish_convention(spark):
    got = _by_conv(badgerfish_json(_df(spark)))
    assert json.loads(got["c1"]) == {
        "conversation": {
            "conv_id": {"$": "c1"},
            "turn": [
                {"turn_idx": {"$": 0}, "role": {"$": "user"},
                 "text": {"$": 'hi "there"'}},
                {"turn_idx": {"$": 1}, "role": {"$": "assistant"},
                 "text": {"$": "hello\nback"}, "tool": {"$": "search"}},
            ],
        }
    }
    assert json.loads(got["c2"])["conversation"]["turn"] == {
        "turn_idx": {"$": 0}, "role": {"$": "user"}, "text": {"$": "solo"}
    }


def test_jsonml_convention(spark):
    got = _by_conv(jsonml_json(_df(spark)))
    # element-tuple array form; ALL leaf values are element text (strings)
    assert json.loads(got["c1"]) == [
        "conversation",
        ["conv_id", "c1"],
        ["turn", ["turn_idx", "0"], ["role", "user"],
         ["text", 'hi "there"']],
        ["turn", ["turn_idx", "1"], ["role", "assistant"],
         ["text", "hello\nback"], ["tool", "search"]],
    ]
    assert json.loads(got["c2"]) == [
        "conversation", ["conv_id", "c2"],
        ["turn", ["turn_idx", "0"], ["role", "user"], ["text", "solo"]],
    ]


def test_escaping_is_valid_json(spark):
    """Control characters, quotes, backslashes and unicode all survive
    to_json escaping into parseable JSON in every convention."""
    rows = [("c1", 0, "user", 'a\\b"c\td\x01eé', None),
            ("c1", 1, "user", "", "t")]
    df = spark.createDataFrame(rows, DDL)
    for fn in (parker_json, badgerfish_json, jsonml_json):
        for _, j in _by_conv(fn(df)).items():
            json.loads(j)  # must parse
    p = json.loads(_by_conv(parker_json(df))["c1"])
    assert p["turn"][0]["text"] == 'a\\b"c\td\x01eé'
    assert p["turn"][1]["text"] == ""


def test_gdata_convention(spark):
    from sissaschool_xmlschema_spark.sources.converters import gdata_json

    got = _by_conv(gdata_json(_df(spark)))
    assert json.loads(got["c2"]) == {
        "conversation": {
            "conv_id": {"$t": "c2"},
            "turn": {"turn_idx": {"$t": 0}, "role": {"$t": "user"},
                     "text": {"$t": "solo"}},
        }
    }


def test_abdera_degenerates_to_parker(spark):
    """Attribute-less element-children documents render identically under
    Abdera and Parker (abdera.py:78-88 emits no attributes/children wrapper
    when data.attributes is empty)."""
    from sissaschool_xmlschema_spark.sources.converters import abdera_json

    assert _by_conv(abdera_json(_df(spark))) == _by_conv(parker_json(_df(spark)))
