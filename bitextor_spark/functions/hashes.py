"""Oracle-compatible hashing and minhash/simhash primitives.

The engine's production hash is Spark's JVM-side ``xxhash64`` (north_rule).
For queries that must match a DuckDB oracle bit-for-bit, we derive a 60-bit
integer hash from ``md5`` — the one hash both engines implement identically:

    Spark:  conv(substring(md5(x), 1, 15), 16, 10)  cast long
    DuckDB: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)

15 hex digits = 60 bits, always positive, no overflow in either engine.
Minhash permutations avoid multiplication (DuckDB raises on BIGINT
overflow; Spark wraps) by using XOR remixes with fixed salts — deterministic
and identical on both sides.

Reference semantics being re-expressed: murmur content hashes for dedup
(bitextor_warc2preprocess.py mmh3 block → F2), 64-bit n-gram hashes
(document-aligner/src/ngram.cpp:21-48 → F3).
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# fixed 59-bit salts shared by the Spark and SQL implementations
_rng = random.Random(7)
MINHASH_SALTS: list[int] = [_rng.getrandbits(59) for _ in range(16)]


def h64(col: Column) -> Column:
    """60-bit md5-derived hash, identical to the DuckDB expression."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h64_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`h64`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
