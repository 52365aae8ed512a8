"""Deterministic synthetic transcripts + the events-derived transcripts view.

Two sources for the canonical transcript table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` (BASELINE.json input_hint, FIXTURES.md F1):

* :func:`synthetic_transcripts` — generated **inside Spark** (``spark.range`` +
  Column expressions + ``explode(sequence(...))``), so a 10^9-turn bench table never
  materializes on the driver; fully deterministic via ``xxhash64`` keyed by a seed.
  Conversation lengths are skewed (a few hot conversations with 10^4+ turns) to
  exercise AQE skew handling, like the reference corpus exercises deep documents.
* :func:`corrupt_transcripts` — plants a known number of violations of each family
  (the ``--errors=N`` declarative-corpus idea,
  ``xmlschema/testing/_factory.py:36-42``), deterministically, so tests can assert
  exact violation counts.
* :func:`transcripts_from_events` — derives a transcripts-shaped view from the
  driver's ``events`` table with *SQL-expressible* transforms only, so every
  validation query has a DuckDB oracle (same CTE on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLE_CYCLE = ("user", "assistant", "tool", "assistant")


def synthetic_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    hot_convs: int = 3,
    hot_turns: int = 20000,
    partitions: int | None = None,
) -> DataFrame:
    """Clean (violation-free w.r.t. ``spec.transcript_spec``) transcript table.

    Role pattern per conversation: turn 0 = 'system', then the cycle
    user → assistant → tool → assistant, which satisfies the spec's transition
    table, contiguity, ts-monotonicity and min-one-user constraints.  Assistant
    turns preceding a tool turn declare the tool id the tool turn references, so
    the keyref holds.
    """
    conv = spark.range(n_convs, numPartitions=partitions)
    h = F.xxhash64(F.col("id"), F.lit(seed))
    # skewed turn counts: first `hot_convs` conversations get `hot_turns` turns,
    # the rest 5..45 (deterministic via hash)
    n_turns = F.when(F.col("id") < hot_convs, F.lit(hot_turns)).otherwise(
        5 + F.pmod(h, F.lit(41))
    )
    df = conv.select(
        F.col("id").alias("_conv"),
        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
    )
    th = F.xxhash64(F.col("_conv"), F.col("turn_idx"), F.lit(seed))
    cycle = F.pmod(F.col("turn_idx") - 1, F.lit(4))
    role = (
        F.when(F.col("turn_idx") == 0, "system")
        .when(cycle == 0, ROLE_CYCLE[0])
        .when(cycle == 1, ROLE_CYCLE[1])
        .when(cycle == 2, ROLE_CYCLE[2])
        .otherwise(ROLE_CYCLE[3])
    )
    # tool id shared by the declaring assistant turn (cycle==1) and the tool turn
    # that follows it (cycle==2): key the hash to the *declaring* turn index.
    decl_idx = F.when(cycle == 2, F.col("turn_idx") - 1).otherwise(F.col("turn_idx"))
    tool_id = F.pmod(F.xxhash64(F.col("_conv"), decl_idx, F.lit(seed + 1)), F.lit(1000))
    tool = F.when(
        cycle.isin(1, 2) & (F.col("turn_idx") > 0),
        F.concat(F.lit("tool-"), F.lpad(tool_id.cast("string"), 3, "0")),
    ).otherwise(F.lit(None).cast("string"))
    # text: deterministic, whiteSpace=preserve — includes tabs/newlines/double
    # spaces in some rows on purpose (byte-identity must survive the pipeline)
    text = F.concat(
        F.lit("turn "),
        F.col("turn_idx").cast("string"),
        F.when(F.pmod(th, 7) == 0, F.lit("\tkeep\n\nwhitespace  intact")).otherwise(
            F.lit(" lorem ipsum dolor sit amet")
        ),
        F.lit(" #"),
        F.pmod(th, 99991).cast("string"),
    )
    # strictly increasing per conversation: 61*k + jitter(<60) ⇒ delta ∈ [2,120]
    ts = F.timestamp_seconds(
        F.lit(1704067200)  # 2024-01-01T00:00:00Z
        + F.pmod(F.xxhash64(F.col("_conv"), F.lit(seed + 2)), F.lit(86400))
        + F.col("turn_idx") * 61
        + F.pmod(th, F.lit(60))
    )
    return df.select(
        F.concat(F.lit("conv-"), F.lpad(F.col("_conv").cast("string"), 8, "0")).alias(
            "conv_id"
        ),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def corrupt_transcripts(df: DataFrame, every: int = 101, seed: int = 42) -> DataFrame:
    """Plant one violation family per residue class of a deterministic row hash.

    Every ``every``-th row (by hash) is corrupted; the *kind* of corruption cycles
    deterministically so all families occur.  Families (FIXTURES.md F1):

    0. role outside the enumeration           → facet:role:Enumeration
    1. tool pattern broken ('TOOL_x')         → facet:tool:Pattern
    2. text emptied                           → facet:text:MinLength + Required
    3. tool nulled on a tool turn             → Required(when role='tool') +
                                                 keyref skip
    4. turn_idx shifted +1000000              → contiguity break (+ MinInclusive ok)
    5. ts pushed backwards                    → ts-monotone break
    """
    h = F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.lit(seed + 9))
    hit = F.pmod(h, F.lit(every)) == 0
    kind = F.pmod(F.abs(h), F.lit(6))
    return df.select(
        F.when(hit & (kind == 4), F.col("turn_idx") + 1000000)
        .otherwise(F.col("turn_idx"))
        .alias("turn_idx"),
        F.col("conv_id"),
        F.when(hit & (kind == 0), F.lit("alien")).otherwise(F.col("role")).alias(
            "role"
        ),
        F.when(hit & (kind == 2), F.lit(None).cast("string"))
        .otherwise(F.col("text"))
        .alias("text"),
        F.when(hit & (kind == 1), F.lit("TOOL_x"))
        .when(hit & (kind == 3), F.lit(None).cast("string"))
        .otherwise(F.col("tool"))
        .alias("tool"),
        F.when(hit & (kind == 5), F.col("ts") - F.expr("INTERVAL 10 DAYS"))
        .otherwise(F.col("ts"))
        .alias("ts"),
    ).select("conv_id", "turn_idx", "role", "text", "tool", "ts")


# --- events → transcripts derivation (shared, SQL-expressible) ---------------
#
# The driver's DuckDB oracle can only see the pre-registered parquet views, so the
# transcript validation queries derive a transcripts-shaped table FROM `events`
# with transforms both engines express identically.  Planted violations are part
# of the derivation (deterministic modular arithmetic on event_id), mirroring the
# reference's *-2_errors.xml corpus files.

TRANSCRIPTS_FROM_EVENTS_SQL = """
SELECT
  'conv-' || lpad(CAST(user_id AS VARCHAR(30)), 8, '0') AS conv_id,
  CAST(
    CASE WHEN event_id % 211 = 0 THEN rn - 2 ELSE rn - 1 END AS INT
  ) AS turn_idx,
  CASE
    WHEN event_id % 97 = 0 THEN 'alien'
    WHEN event_type = 'click' AND user_id % 31 = 0 THEN 'assistant'
    WHEN event_type = 'signup' THEN 'system'
    WHEN event_type = 'click' THEN 'user'
    WHEN event_type = 'view' THEN 'assistant'
    WHEN event_type = 'error' THEN 'tool'
    ELSE 'assistant'
  END AS role,
  CASE WHEN event_id % 127 = 0 THEN '' ELSE props END AS text,
  CASE
    WHEN event_id % 89 = 0 THEN NULL
    WHEN event_id % 113 = 0 THEN 'TOOL_' || CAST(event_id % 10 AS VARCHAR(30))
    WHEN event_type = 'error'
      THEN 'tool-' || lpad(CAST(event_id % 500 AS VARCHAR(30)), 3, '0')
    WHEN event_type = 'view'
      THEN 'tool-' || lpad(CAST(event_id % 400 AS VARCHAR(30)), 3, '0')
    ELSE NULL
  END AS tool,
  CASE WHEN event_id % 149 = 0 THEN ts - INTERVAL 3 DAY ELSE ts END AS ts,
  value
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts, event_id
  ) AS rn
  FROM {events}
)
"""


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the shared derivation (DuckDB runs the same SQL)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("_events_src")
    return spark.sql(TRANSCRIPTS_FROM_EVENTS_SQL.format(events="_events_src"))


def transcripts_from_events_cte(events_table: str = "events") -> str:
    """The identical derivation as a CTE body for DuckDB oracle SQL."""
    return TRANSCRIPTS_FROM_EVENTS_SQL.format(events=events_table)


def events_transcript_spec():
    """Spec for the events-derived transcripts view — every family is also
    expressible as ANSI SQL so the DuckDB oracle can reproduce the full
    constraint suite (driver correctness gate).

    Mirrors ``spec.transcript_spec`` minus checks that cannot fire on the
    derivation (conv_id pattern, ts Required) and with deterministic window
    tiebreakers because the planted corruption duplicates ``turn_idx``.
    """
    from sissaschool_xmlschema_spark import spec as S

    return S.TableSpec(
        name="transcripts",
        scope_col="conv_id",
        order_col="turn_idx",
        tiebreakers=("ts", "text", "value"),
        columns=(
            S.ColumnSpec("turn_idx", (S.MinInclusive(0),)),
            S.ColumnSpec(
                "role",
                (S.Enumeration(("system", "user", "assistant", "tool")),),
            ),
            S.ColumnSpec("text", (S.MinLength(1),)),
            S.ColumnSpec(
                "tool",
                (S.Pattern(("tool-[0-9]{3}",)), S.Required(when="role = 'tool'")),
            ),
        ),
        identities=(
            S.Key("turn-key", fields=("turn_idx",), scope="conv_id"),
            S.Keyref(
                "tool-ref",
                fields=("tool",),
                refer_fields=("tool",),
                scope="conv_id",
                selector="role = 'tool'",
                refer_selector="role = 'assistant' AND tool IS NOT NULL",
            ),
        ),
        model=(
            S.Contiguity(),
            S.Monotone("ts-monotone", column="ts", strict=False),
            S.Occurs("min-one-user", where="role = 'user'", min_occurs=1),
            S.FirstTurn("first-is-system-or-user", where="role IN ('system','user')"),
            S.Transition(
                "role-transitions",
                column="role",
                allowed={
                    "system": ("user",),
                    "user": ("assistant",),
                    "assistant": ("user", "assistant", "tool"),
                    "tool": ("assistant", "tool"),
                },
                start=("system", "user"),
            ),
        ),
    )
