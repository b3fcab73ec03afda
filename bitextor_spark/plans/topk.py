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
