"""Skew-proof per-key top-k (the mega-host prefix selection).

A plain ``row_number().over(partitionBy(key))`` puts ALL rows of a hot key
into one task and sorts them there — exactly the mega-domain skew the north
rule says to kill. Two-stage top-k instead:

  stage 1: rank within (key, physical input partition) — the hot key's rows
           are spread across many input partitions, so each local rank is
           balanced; keep only local top-k.
  stage 2: rank the ≤ k·num_partitions survivors per key — tiny.

Equivalent to the single window for any total order (top-k of a union is
contained in the union of per-part top-ks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_key_topk(
    df: DataFrame, key: str, order_cols: list[Column], k: int
) -> DataFrame:
    local = Window.partitionBy(key, "_inpart").orderBy(*order_cols)
    survivors = (
        df.withColumn("_inpart", F.spark_partition_id())
        .withColumn("_lrn", F.row_number().over(local))
        .filter(F.col("_lrn") <= k)
        .drop("_lrn", "_inpart")
    )
    final = Window.partitionBy(key).orderBy(*order_cols)
    return (
        survivors.withColumn("_rn", F.row_number().over(final))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def per_key_topk_passthrough(
    df: DataFrame,
    key: str,
    order_cols: list[Column],
    k: int,
    passthrough: Column,
) -> DataFrame:
    """Top-k per key among rows where ``passthrough`` is false, plus ALL
    rows where it is true — in ONE consumption of ``df`` (a filter+union
    formulation would evaluate the upstream plan once per branch; Spark
    does not CSE across union branches).

    Ordering trick: ranking by (passthrough asc, *order_cols) places every
    rankable row before every passthrough row within its key, so a
    rankable row's row_number equals its rank among rankable rows alone;
    passthrough rows are kept unconditionally. Same two-stage skew-proof
    shape as per_key_topk."""
    pt = passthrough.alias("_pt")
    local = Window.partitionBy(key, "_inpart").orderBy(
        F.col("_pt").asc(), *order_cols
    )
    survivors = (
        df.withColumn("_pt", pt)
        .withColumn("_inpart", F.spark_partition_id())
        .withColumn("_lrn", F.row_number().over(local))
        .filter(F.col("_pt") | (F.col("_lrn") <= k))
        .drop("_lrn", "_inpart")
    )
    final = Window.partitionBy(key).orderBy(F.col("_pt").asc(), *order_cols)
    return (
        survivors.withColumn("_rn", F.row_number().over(final))
        .filter(F.col("_pt") | (F.col("_rn") <= k))
        .drop("_rn", "_pt")
    )
