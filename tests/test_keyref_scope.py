"""Cross-domain keyref resolution — the flat-table refer_path semantics
(reference: xmlschema/validators/identities.py:317-334, XSD 1.0 par. 3.11.5
note: key tables may live on broader or narrower domains than the keyref and
propagate with the join scoped accordingly).

Four forms, driven by Keyref.refer_scope:
  * SAME_SCOPE (default)           — both sides scoped alike (regression).
  * refer_scope=None, scope set    — key defined at a BROADER (document)
                                     scope: refs join on fields only.
  * scope=None, refer_scope set    — per-scope key tables propagate UP to
                                     the document: union of all scopes' keys.
  * different column + keys_df     — scope-mapping join (child table carries
                                     the ancestor id under another name).
"""

from pyspark.sql import functions as F

from sissaschool_xmlschema_spark import spec as S
from sissaschool_xmlschema_spark.operators.identity import keyref_misses
from sissaschool_xmlschema_spark.spec_io import spec_from_dict, spec_to_dict

DDL = "conv_id string, turn_idx int, role string, tool string"

ROWS = [
    # conv a declares tool "web"; conv b declares "calc"
    ("a", 0, "assistant", "web"),
    ("a", 1, "tool", "web"),        # same-scope hit
    ("a", 2, "tool", "calc"),       # miss same-scope, hit document-wide
    ("a", 3, "tool", "ghost"),      # miss everywhere
    ("b", 0, "assistant", "calc"),
    ("b", 1, "tool", "calc"),
    ("b", 2, "tool", "web"),        # miss same-scope, hit document-wide
]


def _df(spark):
    return spark.createDataFrame(ROWS, DDL)


def _misses(spark, **kw):
    c = S.Keyref(
        "tool-ref",
        fields=("tool",),
        refer_fields=("tool",),
        selector="role = 'tool'",
        refer_selector="role = 'assistant' AND tool IS NOT NULL",
        **kw,
    )
    return {
        (r["conv_id"] if "conv_id" in r.__fields__ else None, r["tool"]): r["_n"]
        for r in keyref_misses(_df(spark), c).collect()
    }


def test_same_scope_regression(spark):
    got = _misses(spark, scope="conv_id")
    assert got == {("a", "calc"): 1, ("a", "ghost"): 1, ("b", "web"): 1}


def test_key_at_broader_scope(spark):
    """Key is document-wide (refer_scope=None): any conversation's declared
    tool satisfies the reference; only 'ghost' remains missing."""
    got = _misses(spark, scope="conv_id", refer_scope=None)
    assert got == {("a", "ghost"): 1}


def test_keys_propagate_upward(spark):
    """Keyref at document scope against per-conversation keys: the per-scope
    key tables union at the ancestor (XSD 1.0 3.11.5 propagation note)."""
    got = _misses(spark, scope=None, refer_scope="conv_id")
    assert got == {(None, "ghost"): 1}


def test_scope_mapping_join(spark):
    """Child table references keys held by a parent table under a different
    scope column name — the scope-mapping join."""
    calls = spark.createDataFrame(
        [("a", "web"), ("a", "calc"), ("b", "calc"), ("b", "web")],
        "parent_conv string, tool string",
    )
    keys = _df(spark)  # assistant rows declare per-conv tools
    c = S.Keyref(
        "call-ref",
        fields=("tool",),
        refer_fields=("tool",),
        scope="parent_conv",
        refer_scope="conv_id",
        refer_selector="role = 'assistant' AND tool IS NOT NULL",
    )
    got = {
        (r["parent_conv"], r["tool"]): r["_n"]
        for r in keyref_misses(calls, c, keys_df=keys).collect()
    }
    assert got == {("a", "calc"): 1, ("b", "web"): 1}


def test_refer_scope_roundtrips(spark):
    sp = S.TableSpec(
        name="t",
        columns=(S.ColumnSpec("tool", ()),),
        identities=(
            S.Keyref("r", fields=("tool",), refer_fields=("tool",),
                     scope="conv_id", refer_scope=None),
            S.Keyref("r2", fields=("tool",), refer_fields=("tool",),
                     scope="parent_conv", refer_scope="conv_id"),
            S.Keyref("r3", fields=("tool",), refer_fields=("tool",),
                     scope="conv_id"),
        ),
    )
    again = spec_from_dict(spec_to_dict(sp))
    assert again == sp
    assert again.identities[0].refer_scope is None
    assert again.identities[2].refer_scope == S.SAME_SCOPE


def test_document_wide_key_multiplicity(spark):
    """Misses still count multiplicity per (scope, tuple)."""
    rows = ROWS + [("a", 4, "tool", "ghost"), ("b", 3, "tool", "ghost")]
    df = spark.createDataFrame(rows, DDL)
    c = S.Keyref(
        "tool-ref", fields=("tool",), refer_fields=("tool",),
        scope="conv_id", refer_scope=None,
        selector="role = 'tool'",
        refer_selector="role = 'assistant' AND tool IS NOT NULL",
    )
    got = {
        (r["conv_id"], r["tool"]): r["_n"]
        for r in keyref_misses(df, c).collect()
    }
    assert got == {("a", "ghost"): 2, ("b", "ghost"): 1}


def test_streaming_epilogue_honors_refer_scope(spark, tmp_path):
    """Incremental run with a document-wide key (refer_scope=None): a tool
    reference in one conversation resolves against a declaration made in a
    DIFFERENT conversation arriving in a later batch."""
    from sissaschool_xmlschema_spark.streaming.incremental import (
        run_incremental,
    )

    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    import datetime as dt
    TS = dt.datetime(2024, 1, 1)
    rows1 = [("a", 0, "tool", "x", "web", TS),
             ("a", 1, "tool", "y", "ghost", TS)]
    rows2 = [("b", 0, "assistant", "z", "web", TS)]  # declares web, conv b
    src = str(tmp_path / "krsrc")
    spark.createDataFrame(rows1, schema).repartition(1).write.parquet(
        src + "/f1.parquet")
    spark.createDataFrame(rows2, schema).repartition(1).write.parquet(
        src + "/f2.parquet")

    c = S.Keyref(
        "tool-ref-doc", fields=("tool",), refer_fields=("tool",),
        scope="conv_id", refer_scope=None,
        selector="role = 'tool'",
        refer_selector="role = 'assistant' AND tool IS NOT NULL",
    )
    sp = S.TableSpec(name="transcripts", identities=(c,))
    res = run_incremental(
        spark, src + "/*", sp, str(tmp_path / "krwork"),
        schema=schema, max_files_per_trigger=1,
    )
    assert res.n_batches == 2
    got = {
        (r["conv_id"], r["tool"]): r["_n"]
        for r in res.keyref_misses(spark, c).collect()
    }
    # 'web' resolved cross-conversation (document-wide key); 'ghost' missed
    assert got == {("a", "ghost"): 1}
