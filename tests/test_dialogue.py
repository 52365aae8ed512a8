"""Conversation-level curation (operators/dialogue.py)."""

import datetime as dt

from sissaschool_xmlschema_spark.operators.dialogue import (
    conversation_gate,
    conversation_metrics,
)

TS = dt.datetime(2024, 1, 1)


def corpus(spark):
    rows = [
        # c_good: system start, clean alternation, tool payload present
        ("c_good", 0, "system", "You are helpful.", None, TS),
        ("c_good", 1, "user", "hi", None, TS),
        ("c_good", 2, "assistant", "hello!", None, TS),
        ("c_good", 3, "tool", "result", "tool-001", TS),
        # c_runs: user double-sends, one empty turn
        ("c_runs", 0, "user", "a", None, TS),
        ("c_runs", 1, "user", "b", None, TS),
        ("c_runs", 2, "user", "", None, TS),
        # c_toolless: a tool turn without payload
        ("c_toolless", 0, "user", "q", None, TS),
        ("c_toolless", 1, "tool", "r", None, TS),
        # c_monologue: assistant only
        ("c_monologue", 0, "assistant", "soliloquy", None, TS),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp",
    )


def test_metrics_hand_worked(spark):
    m = {r.conv_id: r for r in conversation_metrics(corpus(spark)).collect()}
    g = m["c_good"]
    assert (g.n_turns, g.n_user, g.n_assistant, g.n_tool) == (4, 1, 1, 1)
    assert g.starts_system == 1 and g.same_role_runs == 0
    assert g.tool_missing == 0 and g.empty_turns == 0
    r = m["c_runs"]
    assert r.same_role_runs == 2  # u->u, u->u(empty)
    assert r.empty_turns == 1 and r.starts_system == 0
    assert m["c_toolless"].tool_missing == 1


def test_gate_keeps_only_wellformed(spark):
    metrics = conversation_metrics(corpus(spark))
    kept = {r.conv_id for r in conversation_gate(metrics).collect()}
    assert kept == {"c_good"}
    # relaxing the tool + assistant requirements admits the toolless conv
    # (it has no assistant turn either — tool replies stand in)
    kept2 = {
        r.conv_id
        for r in conversation_gate(
            metrics, require_tool_payloads=False, min_assistant=0
        ).collect()
    }
    assert kept2 == {"c_good", "c_toolless"}
