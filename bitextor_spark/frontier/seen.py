"""Partitioned Bloom URL-seen structure (C5) — the frontier-dedup scale path.

Heritrix's BdbUriUniqFilter (crawler-beans.cxml:430-433) is a disk-backed
exact set. At 10^10 URLs an exact anti-join against the full frontier
shuffles every candidate; the Bloom shards cut that: candidates that are
*definitely new* (any bit clear) skip the exact join entirely, and only the
"maybe seen" residue (true hits + ~1% false positives at 10 bits/key) takes
the exact anti-join — so the engine stays exact while the expensive join
shrinks by the novelty rate. No false negatives by construction.

Sharding is by ``pmod(url_hash, n_shards)`` — uniform by hash, so a
mega-domain cannot hot-spot a shard (this is the salted/sharded layout the
north rule asks for: host-derived keys alone would put a whole mega-host
in one shard; hashing the full URL is the degenerate-salt limit that
provably balances). Each shard is one binary blob row; membership tests
run as a cogrouped-map pandas UDF: per shard, Arrow hands numpy the
candidate hash vector and the blob, and bit tests vectorize.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOOM_SCHEMA = "shard int, bloom binary, n_items long"

_MASK64 = (1 << 64) - 1
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> list[np.ndarray]:
    """k bit positions per key via splitmix64 remixes of the xxhash64 value."""
    h = hashes.astype(np.int64).view(np.uint64)
    out = []
    for i in range(k):
        x = h + np.uint64((0x9E3779B97F4A7C15 * (i + 1)) & _MASK64)
        x = (x ^ (x >> np.uint64(30))) * _MIX2
        x = (x ^ (x >> np.uint64(27))) * _MIX3
        x = x ^ (x >> np.uint64(31))
        out.append((x % np.uint64(m_bits)).astype(np.int64))
    return out


def shard_col(hash_col, n_shards: int):
    return F.pmod(hash_col, F.lit(n_shards)).cast("int")


def empty_blooms(spark: SparkSession, n_shards: int = 0, m_bits: int = 0) -> DataFrame:
    """Zero-row bloom table: shards materialize lazily on first update
    (update_blooms creates a fresh blob for unseen shards; flag_maybe_seen
    treats a missing shard as definitely-new). Avoids shipping n_shards ×
    m_bits/8 bytes of zeros from the driver."""
    return spark.createDataFrame([], BLOOM_SCHEMA)


def update_blooms(
    blooms: DataFrame,
    new_hashes: DataFrame,  # columns: url_hash
    n_shards: int,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Merge newly-admitted url hashes into their shards (cogrouped map)."""
    hashed = new_hashes.select(
        shard_col(F.col("url_hash"), n_shards).alias("shard"), "url_hash"
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left = new hashes for this shard, right = existing bloom row
        if len(right):
            shard = int(right["shard"].iloc[0])
            bits = np.frombuffer(right["bloom"].iloc[0], dtype=np.uint8).copy()
            n = int(right["n_items"].iloc[0])
        else:
            shard = int(left["shard"].iloc[0])
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            n = 0
        if len(left):
            for pos in _positions(left["url_hash"].to_numpy(), m_bits, k):
                np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            n += len(left)
        return pd.DataFrame(
            {"shard": [shard], "bloom": [bits.tobytes()], "n_items": [n]}
        )

    return (
        hashed.groupBy("shard")
        .cogroup(blooms.groupBy("shard"))
        .applyInPandas(merge, BLOOM_SCHEMA)
    )


def flag_maybe_seen(
    candidates: DataFrame,  # must carry url_hash
    blooms: DataFrame,
    n_shards: int,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Adds boolean ``maybe_seen``; False ⇒ definitely never admitted."""
    out_schema = candidates.schema.add("maybe_seen", "boolean")
    with_shard = candidates.withColumn(
        "_shard", shard_col(F.col("url_hash"), n_shards)
    )

    def check(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left):
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        left = left.drop(columns=["_shard"])
        if not len(right):
            left["maybe_seen"] = False
            return left
        bits = np.frombuffer(right["bloom"].iloc[0], dtype=np.uint8)
        maybe = np.ones(len(left), dtype=bool)
        for pos in _positions(left["url_hash"].to_numpy(), m_bits, k):
            maybe &= (bits[pos >> 3] >> (pos & 7) & 1).astype(bool)
        left["maybe_seen"] = maybe
        return left

    return (
        with_shard.groupBy("_shard")
        .cogroup(blooms.groupBy("shard"))
        .applyInPandas(check, out_schema)
    )
