"""Scale-safe global total ordering (O1/O3/O4).

``Window.orderBy`` with no partition key collapses to ONE task — fine for
inspection-scale reads, fatal at 10^10 rows. The scalable exact pattern
(same as a distributed sort-rank): range-repartition on the sort key, rank
locally within each range partition, then add cumulative per-partition
offsets (a #partitions-row driver exchange, not a data collect).

Reference semantics: multi-key LC_ALL=C sort pipelines
(bitextor/Snakefile:1543-1608 presort, bitextor_build_TMX.py:222 ordering).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    keys: list[Column],
    seq_col: str = "seq",
    offset: int = 0,
    small_threshold: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Exact 1-based global row_number over `keys` without a single-task sort.

    If `n_rows` is known and below `small_threshold`, uses the plain global
    window (cheapest for tiny inputs). Otherwise: repartitionByRange on the
    keys → per-partition row_number → broadcast cumulative offsets.
    """
    if (
        small_threshold is not None
        and n_rows is not None
        and n_rows < small_threshold
    ):
        w = Window.orderBy(*keys)
        return df.withColumn(seq_col, F.row_number().over(w) + offset)
    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(nparts, *keys).withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint()  # pin the partitioning for both passes
    counts = {
        r["_pid"]: r["count"] for r in ranged.groupBy("_pid").count().collect()
    }
    offsets, acc = {}, offset
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()] or [(0, offset)],
        "_pid int, _off long",
    )
    w_local = Window.partitionBy("_pid").orderBy(*keys)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(seq_col, F.row_number().over(w_local) + F.col("_off"))
        .drop("_pid", "_off")
    )


def global_ntile(
    df: DataFrame, keys: list[Column], n: int, tile_col: str = "batch"
) -> DataFrame:
    """Exact global ntile(n) over `keys`, built on global_row_number.

    Standard ntile semantics (Spark == DuckDB): with T rows, the first
    T mod n tiles get ceil(T/n) rows, the rest floor(T/n).
    """
    ranked = global_row_number(df, keys, seq_col="_gseq")
    total = ranked.count()
    q, r = divmod(total, n)
    big = r * (q + 1)  # rows living in the (q+1)-sized leading tiles
    seq0 = F.col("_gseq") - 1
    if q == 0:
        tile = seq0 + 1
    else:
        tile = F.when(seq0 < big, F.floor(seq0 / (q + 1)) + 1).otherwise(
            r + F.floor((seq0 - big) / q) + 1
        )
    return ranked.withColumn(tile_col, tile.cast("int")).drop("_gseq")
