"""Conversation-level curation — quality gates over whole dialogues.

Document-level curation (operators/curation.py) treats each text blob
independently; dialogue training data needs CONVERSATION-level judgment:
a transcript is good training material only if the whole exchange is
well-formed — sensible length, roles that actually alternate, a system
prompt where the format requires one, tool calls that carry their payload.
This is the curation-side mirror of the validation engine's content-model
checks (operators/sequence.py lowers the same signals as hard constraint
VIOLATIONS; here they become soft per-conversation FEATURES feeding a
keep/drop gate — the reference's validity verdict vs. a data-quality
score).

Plan shape: one window over ``partitionBy(conv_id).orderBy(turn_idx)``
for the previous-role signal (offset function only — joins the engine's
existing single-WindowExec stage when run on the bucketed layout, where
the exchange vanishes entirely), then ONE groupBy(conv_id) of conditional
aggregates.  Everything is Column algebra — SQL-replicable, so the driver
queries hash-match DuckDB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversation_metrics(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Per-conversation dialogue-quality features.

    Returns one row per conversation:

    * ``n_turns``, ``n_user``, ``n_assistant``, ``n_tool`` — role mix
    * ``starts_system`` — first turn's role is 'system' (format prior for
      instruction data)
    * ``same_role_runs`` — adjacent turns with the SAME role (a user
      talking to themselves / double-generation artifacts); role
      alternation is the dialogue analogue of the content-model
      transition check (sequence.py Transition)
    * ``avg_chars`` — mean text length (rounded to 6 dp for hash
      stability)
    * ``empty_turns`` — turns with empty/absent text
    * ``tool_missing`` — 'tool' turns without a tool payload (broken
      function-call traces)
    """
    # tiebreakers make the order total when corrupted data duplicates
    # turn_idx (same convention as operators/sequence.py) — without them
    # lag/row_number are nondeterministic across engines
    order = [F.col(order_col).asc_nulls_first()] + [
        F.col(c).asc_nulls_first() for c in tiebreakers
    ]
    w = Window.partitionBy(conv_col).orderBy(*order)
    with_prev = df.select(
        conv_col,
        order_col,
        F.col(role_col).alias("_role"),
        F.col(text_col).alias("_text"),
        F.col(tool_col).alias("_tool"),
        F.lag(F.col(role_col)).over(w).alias("_prev_role"),
        F.row_number().over(w).alias("_rn"),
    )
    one = F.count(F.lit(1))
    return with_prev.groupBy(conv_col).agg(
        one.cast("long").alias("n_turns"),
        F.sum(F.when(F.col("_role") == "user", 1).otherwise(0))
        .cast("long")
        .alias("n_user"),
        F.sum(F.when(F.col("_role") == "assistant", 1).otherwise(0))
        .cast("long")
        .alias("n_assistant"),
        F.sum(F.when(F.col("_role") == "tool", 1).otherwise(0))
        .cast("long")
        .alias("n_tool"),
        F.max(
            F.when((F.col("_rn") == 1) & (F.col("_role") == "system"), 1).otherwise(0)
        )
        .cast("long")
        .alias("starts_system"),
        F.sum(
            F.when(F.col("_role") == F.col("_prev_role"), 1).otherwise(0)
        )
        .cast("long")
        .alias("same_role_runs"),
        F.round(F.avg(F.length(F.col("_text"))), 6).alias("avg_chars"),
        F.sum(
            F.when(
                F.col("_text").isNull() | (F.col("_text") == ""), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("empty_turns"),
        F.sum(
            F.when(
                (F.col("_role") == "tool") & F.col("_tool").isNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("tool_missing"),
    )


def conversation_gate(
    metrics: DataFrame,
    min_turns: int = 2,
    min_user: int = 1,
    min_assistant: int = 1,
    max_same_role_frac: float = 0.5,
    max_empty_frac: float = 0.2,
    require_tool_payloads: bool = True,
) -> DataFrame:
    """Keep-list over :func:`conversation_metrics` — the dialogue analogue
    of the document pipeline's quality gate (pipeline.py): conversations
    worth training on.  Pure filter over the (already tiny) metrics frame.
    """
    cond = (
        (F.col("n_turns") >= min_turns)
        & (F.col("n_user") >= min_user)
        & (F.col("n_assistant") >= min_assistant)
        & (F.col("same_role_runs") <= F.col("n_turns") * max_same_role_frac)
        & (F.col("empty_turns") <= F.col("n_turns") * max_empty_frac)
    )
    if require_tool_payloads:
        cond = cond & (F.col("tool_missing") == 0)
    return metrics.filter(cond)
