"""Single-pass column statistics — the engine's profiling stage.

The reference has no stats operator (it is a validator); the north star adds
per-column stats as a first-class stage: count / null-rate / approx-distinct
(HyperLogLog++ via ``approx_count_distinct``) / quantile sketch
(``percentile_approx``, a t-digest-like streaming quantile) — all fused into ONE
``agg`` so a 100 TB table is scanned exactly once.  Map-side partial aggregation
means executors ship tiny sketch partials, not rows.

Two modes:

* ``exact=False`` (production): HLL + approx percentiles — mergeable sketches,
  one shuffle of O(n_partitions) partial states.
* ``exact=True`` (oracle/testing): ``count_distinct`` + exact ``percentile`` so a
  DuckDB oracle can reproduce the numbers bit-for-bit.

``grouping`` adds per-group rows next to the global row via GROUPING SETS —
per-Iceberg-partition stats and the global rollup in the same single pass.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantile_suffix(qv: float) -> str:
    """Collision-free quantile alias: the full decimal, not a rounded percent
    (0.999 → 'p99_9', 0.95 → 'p95'; int(round(qv*100)) mapped 0.999 and 1.0
    both to p100)."""
    pct = format(round(qv * 100, 6), "g")
    return "p" + pct.replace(".", "_").replace("-", "m")


def _stat_aggs(
    df: DataFrame,
    numeric_cols: Sequence[str],
    string_cols: Sequence[str],
    exact: bool,
    quantiles: Sequence[float],
    rsd: float,
) -> list[Column]:
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]

    def distinct(c: str) -> Column:
        if exact:
            return F.count_distinct(F.col(c))
        return F.approx_count_distinct(F.col(c), rsd)

    for c in list(string_cols) + list(numeric_cols):
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"))
        aggs.append(distinct(c).alias(f"{c}_distinct"))
    for c in numeric_cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
        if quantiles:
            qs = list(quantiles)
            if exact:
                q = F.percentile(F.col(c), F.lit(qs))
            else:
                q = F.percentile_approx(F.col(c), F.lit(qs), F.lit(10000))
            # flattened to one scalar column per quantile (p50, p95, p99_9,
            # ...): downstream sinks and canonicalizers expect hashable
            # scalars, not array cells
            suffixes = [_quantile_suffix(qv) for qv in qs]
            if len(set(suffixes)) != len(suffixes):
                raise ValueError(
                    f"quantiles {list(qs)} produce duplicate column aliases "
                    f"{suffixes}"
                )
            for i, suffix in enumerate(suffixes):
                aggs.append(q[i].alias(f"{c}_{suffix}"))
    for c in string_cols:
        aggs.append(F.min(F.length(c)).alias(f"{c}_minlen"))
        aggs.append(F.max(F.length(c)).alias(f"{c}_maxlen"))
    return aggs


def column_stats(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
    grouping: Optional[Sequence[str]] = None,
    exact: bool = False,
    quantiles: Sequence[float] = (0.5, 0.95, 0.99),
    rsd: float = 0.05,
) -> DataFrame:
    """All column stats in one aggregation pass.

    With ``grouping`` the result has one row per group plus the global row
    (GROUPING SETS ((groups), ())); otherwise a single global row.
    """
    aggs = _stat_aggs(df, numeric_cols, string_cols, exact, quantiles, rsd)
    if grouping:
        gsets = df.groupingSets(
            [list(grouping), []], *[F.col(g) for g in grouping]
        )
        return gsets.agg(*aggs)
    return df.agg(*aggs)
