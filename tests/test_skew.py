"""Skew diagnostics (operators/skew.py): heavy hitters, summary, salt rule."""

from pyspark.sql import functions as F

from sissaschool_xmlschema_spark.operators.skew import (
    heavy_hitters,
    skew_report,
    suggest_salt,
)


def skewed_df(spark):
    # key 'hot' holds 60 of 100 rows; 'warm' 20; 20 singletons; plus nulls
    rows = (
        [("hot",)] * 60 + [("warm",)] * 20 + [(f"k{i}",) for i in range(20)]
    )
    rows += [(None,)] * 5
    return spark.createDataFrame(rows, "key string").withColumn(
        "payload", F.lit(1)
    )


def test_heavy_hitters_exact(spark):
    df = skewed_df(spark)
    top = heavy_hitters(df, "key", top_n=3).collect()
    assert [(r.key, r.n) for r in top] == [("hot", 60), ("warm", 20), (None, 5)]
    assert abs(top[0].share - 60 / 105) < 1e-9


def test_skew_report_values(spark):
    df = skewed_df(spark)
    row = skew_report(df, "key", top_n=2).first()
    assert row.n_rows == 105 and row.n_keys == 23 and row.max_key_n == 60
    assert abs(row.skew_ratio - 60 / (105 / 23)) < 1e-6
    assert abs(row.top_share - 80 / 105) < 1e-9


def test_suggest_salt_rule(spark):
    row = skew_report(skewed_df(spark), "key").first()
    # 8 partitions → avg partition 13.1 rows; hot key 60 ≫ 2×avg → salt ≈ 5
    assert suggest_salt(row, shuffle_partitions=8) == 5
    # uniform data → no salting
    uniform = spark.range(100).withColumn("key", F.col("id").cast("string"))
    urow = skew_report(uniform, "key").first()
    assert suggest_salt(urow, shuffle_partitions=8) == 1
    # cap at shuffle_partitions: one key holding ~everything
    assert suggest_salt(
        {"n_rows": 1000, "max_key_n": 990}, shuffle_partitions=4
    ) == 4


def test_single_scan_via_exchange_reuse(spark, tmp_path):
    """The share total must reuse the counts exchange: exactly ONE scan of
    the raw table in the FINAL adaptive plan (AQE materializes
    ReusedExchange at runtime, so pre-execution plans mislead)."""
    src = str(tmp_path / "keys")
    spark.range(10000).select(
        (F.col("id") % 13).cast("string").alias("key")
    ).write.parquet(src)
    out = heavy_hitters(spark.read.parquet(src), "key", top_n=3)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1
    assert "ReusedExchange" in final


def test_topn_is_not_a_global_sort(spark):
    """heavy_hitters must plan as TakeOrderedAndProject (bounded top-N),
    never a full Sort+Exchange of all distinct keys."""
    df = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("key")
    )
    plan = (
        heavy_hitters(df, "key")._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
