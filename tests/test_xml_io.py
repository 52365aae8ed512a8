"""XML encode sink + ingestion source (sources/xml_io.py).

Closes the two SURVEY §2.1 rows previously declared out of scope: the
encode path (reference validators/schemas.py:1660-1795 iter_encode/encode)
and a real XML document source (iter_decode over an XMLResource,
validators/schemas.py:1439).  The north-rule row invariant — per-turn text
equality under stable (conv_id, turn_idx) ordering — is asserted through a
full encode→decode→validate cycle.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sissaschool_xmlschema_spark import spec as S
from sissaschool_xmlschema_spark.plans.runner import validate
from sissaschool_xmlschema_spark.sources.xml_io import (
    TURN_SCHEMA_DDL,
    decode_turn_xml,
    encode_conversation_xml,
    encode_turn_xml,
    oracle_turn_xml_sql,
    read_xml_source,
    write_xml_sink,
)

TS = dt.datetime(2024, 1, 1, 0, 0, 7, 179575)

TRICKY_ROWS = [
    ("c1", 0, "user", '{"k": 69}', None, TS),
    ("c1", 1, "tool", "", "tool-001", dt.datetime(2024, 1, 1, 0, 3, 52, 824425)),
    ("c1", 2, "assistant", "line1\nline2\ttabbed", None, TS),
    ("c2", 0, "assistant", "  padded  ", "TOOL_3", None),
    ("c2", 1, "system", "a&b<c>d\"e'f", None, dt.datetime(2024, 1, 1, 12, 0, 0)),
    ("c2", 2, "user", "unicode: café ☃ \U0001f600", None, TS),
    ("c3", 0, "user", "]]> & <![CDATA[x]]>", "tool-999", TS),
]


def tricky_df(spark):
    return spark.createDataFrame(TRICKY_ROWS, TURN_SCHEMA_DDL)


def test_roundtrip_per_turn_text_equality(spark):
    """encode→decode is the identity on every tricky row — empty strings,
    surrounding whitespace, XML specials, newlines, unicode, microsecond
    timestamps, null tool/ts."""
    df = tricky_df(spark)
    dec = decode_turn_xml(encode_turn_xml(df).select("xml"))
    got = sorted(
        (tuple(r)[:-1] for r in dec.collect()),
        key=lambda t: (t[0], t[1]),
    )
    assert got == sorted(TRICKY_ROWS, key=lambda t: (t[0], t[1]))
    assert dec.filter(F.col("_corrupt_record").isNotNull()).count() == 0


def test_encode_matches_oracle_rendering(spark):
    """Spark's StAX output is byte-identical to the shared DuckDB SQL
    template — what makes the xml_encode driver query hash-matchable."""
    duckdb = pytest.importorskip("duckdb")
    df = tricky_df(spark)
    sdf = (
        encode_turn_xml(df)
        .select("conv_id", "turn_idx", "xml")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df.toPandas())
    odf = (
        con.execute(
            "SELECT conv_id, turn_idx, "
            + oracle_turn_xml_sql()
            + " AS xml FROM t"
        )
        .df()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert list(sdf["xml"]) == list(odf["xml"])


def test_conversation_document_order(spark):
    """Whole-document encoding nests turns as repeated <turn> elements in
    turn_idx order regardless of input row order."""
    df = tricky_df(spark).orderBy(F.col("turn_idx").desc())
    docs = {r.conv_id: r.xml for r in encode_conversation_xml(df).collect()}
    assert set(docs) == {"c1", "c2", "c3"}
    c1 = docs["c1"]
    assert c1.startswith("<conversation>")
    # turns appear in index order
    i0 = c1.index("<turn_idx>0</turn_idx>")
    i1 = c1.index("<turn_idx>1</turn_idx>")
    i2 = c1.index("<turn_idx>2</turn_idx>")
    assert i0 < i1 < i2
    assert c1.count("<turn>") == 3


def test_corrupt_record_channel(spark):
    """Malformed documents land in _corrupt_record (lax-mode accumulation,
    not job failure); well-formed rows still parse in the same batch."""
    enc = encode_turn_xml(tricky_df(spark)).select("conv_id", "turn_idx", "xml")
    broken = enc.withColumn(
        "xml",
        F.when(F.col("turn_idx") == 1, F.expr("substring(xml, 1, 40)")).otherwise(
            F.col("xml")
        ),
    )
    # kept input columns must not collide with decoded field names — the
    # overlap guard raises instead of emitting duplicate columns
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide with decoded"):
        decode_turn_xml(broken, xml_col="xml")
    dec = decode_turn_xml(broken.select("xml"), xml_col="xml")
    bad = dec.filter(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 2  # c1/1 and c2/1 truncated
    # corrupted rows carry no parsed role
    assert bad.filter(F.col("role").isNotNull()).count() == 0
    ok = dec.filter(F.col("_corrupt_record").isNull())
    assert ok.count() == len(TRICKY_ROWS) - 2


def test_file_sink_source_roundtrip(spark, tmp_path):
    """write_xml_sink → read_xml_source preserves every typed value; the
    source never runs schema inference (schema is passed)."""
    df = tricky_df(spark)
    path = str(tmp_path / "turns_xml")
    write_xml_sink(df.repartition(2, "conv_id"), path)
    back = read_xml_source(spark, path)
    rows = back.collect()
    # (raw file scans disallow corrupt-column-only queries, so check the
    # channel on the collected rows)
    assert all(r._corrupt_record is None for r in rows)
    got = sorted((tuple(r)[:-1] for r in rows), key=lambda t: (t[0], t[1]))
    assert got == sorted(TRICKY_ROWS, key=lambda t: (t[0], t[1]))


def test_validate_xml_input_end_to_end(spark, tmp_path):
    """The engine validates XML documents exactly as it validates the same
    rows from parquet: identical violation rows through the full suite."""
    rows = [
        ("c1", 0, "system", "hi", None, TS),
        ("c1", 1, "user", "hello", None, TS),
        ("c1", 1, "alien", "dup turn + bad role", None, TS),
        ("c2", 0, "user", "yo", None, TS),
    ]
    df = spark.createDataFrame(rows, TURN_SCHEMA_DDL)
    spec = S.TableSpec(
        name="transcripts",
        columns=(
            S.ColumnSpec(
                "role", (S.Enumeration(("system", "user", "assistant", "tool")),)
            ),
        ),
        identities=(
            S.Unique("turn-unique", fields=("turn_idx",), scope="conv_id"),
        ),
    )
    path = str(tmp_path / "docs_xml")
    write_xml_sink(df, path)
    xml_df = read_xml_source(spark, path).drop("_corrupt_record")

    res_xml = validate(xml_df, spec)
    res_pq = validate(df, spec)
    key = ["constraint_id", "conv_id", "turn_idx", "offending_value"]
    vx = sorted(map(tuple, res_xml.violations.select(*key).collect()))
    vp = sorted(map(tuple, res_pq.violations.select(*key).collect()))
    assert vx == vp and len(vx) > 0


def test_read_table_xml_route(spark, tmp_path):
    """The table access layer routes fmt='xml' through the XML source and
    drops the corrupt-record channel (canonical columns for specs)."""
    from sissaschool_xmlschema_spark.sources.tables import read_table

    df = tricky_df(spark)
    path = str(tmp_path / "via_table")
    write_xml_sink(df, path)
    back = read_table(spark, path, fmt="xml")
    assert "_corrupt_record" not in back.columns
    assert back.count() == len(TRICKY_ROWS)


def test_xml_stream_validation(spark, tmp_path):
    """Streaming XML ingestion feeds the incremental validator: a bad role
    planted in the second batch of documents surfaces as a streaming facet
    violation (the reference's lazy-iterparse input mode, cluster-shaped)."""
    from sissaschool_xmlschema_spark.sources.xml_io import xml_stream_source
    from sissaschool_xmlschema_spark.streaming.incremental import (
        stream_facet_violations,
    )

    spec = S.TableSpec(
        name="transcripts",
        columns=(
            S.ColumnSpec(
                "role", (S.Enumeration(("system", "user", "assistant", "tool")),)
            ),
        ),
    )
    src = str(tmp_path / "xml_stream")
    b1 = spark.createDataFrame(
        [("c1", 0, "user", "a", None, TS)], TURN_SCHEMA_DDL
    )
    b2 = spark.createDataFrame(
        [("c1", 1, "alien", "b", None, TS), ("c2", 0, "system", "c", None, TS)],
        TURN_SCHEMA_DDL,
    )
    write_xml_sink(b1, src + "/b1", mode="overwrite")
    write_xml_sink(b2, src + "/b2", mode="overwrite")

    stream = xml_stream_source(
        spark, src + "/*/", max_files_per_trigger=1
    ).drop("_corrupt_record")
    out = stream_facet_violations(stream, spec)
    q = (
        out.writeStream.format("memory")
        .queryName("xml_viol")
        .option("checkpointLocation", str(tmp_path / "ckx"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "select conv_id, turn_idx, offending_value from xml_viol"
    ).collect()
    assert [(r.conv_id, r.turn_idx, r.offending_value) for r in rows] == [
        ("c1", 1, "alien")
    ]


def test_roundtrip_property_fuzz(spark):
    """Hypothesis fuzz of the per-turn text-equality invariant: any XML-legal
    text roundtrips encode→decode byte-identically (XML 1.0 forbids most
    control characters and lone surrogates — the generator excludes exactly
    those, which a real ingest pipeline must strip anyway)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    xml_text = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),  # lone surrogates: not XML chars
            blacklist_characters="".join(
                chr(c) for c in range(0x20) if c not in (0x09, 0x0A, 0x0D)
            )
            + "\x7f",
        ),
        max_size=60,
    )

    @given(st.lists(xml_text, min_size=1, max_size=8))
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def run(texts):
        rows = [(f"c", i, "user", t, None, TS) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, TURN_SCHEMA_DDL)
        dec = decode_turn_xml(encode_turn_xml(df).select("xml"))
        got = {r.turn_idx: r.text for r in dec.collect()}
        assert got == {i: t for i, t in enumerate(texts)}

    run()
