"""plans/ordering: the range-partitioned global rank/ntile must equal the
single-partition window versions exactly (which are only usable at
inspection scale — the helper exists so 10^10-row sorts never hit one
task)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bitextor_spark.plans.ordering import global_ntile, global_row_number


def _fixture(spark, n=5000):
    return (
        spark.range(n)
        .select(
            (F.xxhash64("id") % 997).alias("a"),
            (F.xxhash64("id", F.lit(2)) % 13).alias("b"),
            F.col("id"),
        )
        .repartition(16)
    )


def test_global_row_number_matches_window(spark):
    df = _fixture(spark)
    keys = [F.col("a"), F.col("b").desc(), F.col("id")]
    got = {
        r["id"]: r["seq"]
        for r in global_row_number(df, keys, seq_col="seq").collect()
    }
    w = Window.orderBy(*keys)
    want = {
        r["id"]: r["seq"]
        for r in df.withColumn("seq", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_ntile_matches_window(spark):
    df = _fixture(spark, n=4001)  # non-divisible: exercises ragged tiles
    keys = [F.col("a"), F.col("id")]
    got = {
        r["id"]: r["batch"]
        for r in global_ntile(df, keys, 8, tile_col="batch").collect()
    }
    w = Window.orderBy(*keys)
    want = {
        r["id"]: r["batch"]
        for r in df.withColumn("batch", F.ntile(8).over(w)).collect()
    }
    assert got == want
