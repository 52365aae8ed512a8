"""Global plan-invariant sweep: every driver-contract query is audited for
the anti-patterns the engine promises to avoid (PLANS.md, SCALE.md):

* NO ``CartesianProduct`` anywhere — unbounded cross joins are the classic
  100 TB killer.  (``BroadcastNestedLoopJoin`` is allowed: it only appears
  where the engine crossJoins an explicitly broadcast one-row/tiny frame.)
* NO row-at-a-time Python (``BatchEvalPython``) anywhere — the hot path is
  Column algebra; Python exists only as Arrow-batched kernels.
* Arrow-batched Python (``MapInPandas`` / ``FlatMapGroupsInPandas`` /
  ``ArrowEvalPython``) ONLY in the sanctioned kernel queries (trained LID,
  BPE encoding, FFD packing, multimodal feature extraction).

One sweep over the whole registry keeps every future operator honest — a
new query that sneaks in a cartesian join or a Python UDF fails here, not
in a 100 TB run."""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

#: queries whose PLANS may contain Arrow-batched Python (documented kernels)
PANDAS_KERNEL_OK = {
    "lang_id_model",
    "bpe_vocab",
    "bpe_tokens",
    "bpe_tokens_fixed",  # same sanctioned mapInPandas encoder as bpe_tokens
    "pack_bins",
    "multimodal_features",
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(entry.queries().keys()))
def test_no_antipatterns_in_plan(spark, name):
    df = entry.queries()[name](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, f"{name}: unbounded cross join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in PANDAS_KERNEL_OK:
        for marker in ("MapInPandas", "FlatMapGroupsInPandas", "ArrowEvalPython"):
            assert marker not in plan, (
                f"{name}: unsanctioned Python stage {marker}"
            )
