"""A/B race: carried-size vs separate-sizes ngram-Jaccard formulation (r5).

``dedup_ngram_jaccard`` is one of the three heaviest headline queries
(~5.2 s at sf0.1 / 32 cores, 7 exchanges in PLANS.md). The shipped v0
(``operators/dedup.py:ngram_jaccard_pairs``) computes per-doc shingle-set
sizes as a SEPARATE ``groupBy(doc)`` branch over the exploded shingles:
the spread exchange below is reused, but the Generate + md5 work above it
runs once PER CONSUMER — the interpreted shingle HOF and the per-shingle
md5 hash are evaluated twice per document (once for the sizes branch, once
for the join side). v0 then pays two more joins to paste sza/szb onto the
pair counts.

v1 carries the size through the explode instead: ``arr =
array_distinct(shingles)`` is projected once (CollapseProject keeps the
multi-referenced non-cheap ``arr`` from inlining), ``sz = size(arr)``
rides the exploded rows as one int, and the pair aggregation picks it up
with ``max()`` — no sizes branch, no paste joins, single evaluation of the
shingle kernel. Cost: +4 bytes/row through the dedup + join exchanges.

Exactness: identical math — sz = |distinct shingle strings| both ways,
intersection counts unchanged; per-variant result checksums
(sum + count of xxhash64 over all columns) are asserted IDENTICAL here and
the registry oracle is unchanged.

MEASURED (sf0.1, local[32], interleaved rounds v0,v1 / v1,v0 / v0,v1;
checksums identical, 590 pairs):

    v0 sizes-branch   walls [2.89, 2.55, 2.51] s   median 2.55 s
    v1 carried-size   walls [9.95, 9.70, 11.12] s  median 9.95 s

v1 LOSES ~4x — the duplicated shingle-HOF work in v0's sizes branch is
NOT the cost center. v0's two branches are independent jobs that both
stay in whole-stage codegen and the sizes paste-joins are AQE-broadcast;
v1's multi-referenced ``arr`` alias under the Generate defeats codegen's
subexpression handling (the non-collapsed Project + Generate evaluate the
array column path interpreted), and the extra ``sz`` column +
``max()`` aggs ride every downstream exchange. Same lesson as the
minhash explode race (operators/dedup.py:minhash_lsh_pairs): formulation
wins must be raced per kernel, never assumed. v0 stays in the registry;
``ngram_jaccard_pairs_carried`` is retained as the raced alternative,
pinned bit-identical by tests/test_dedup_forms.py.

Run: ``python tools/bench_ngram_ab.py [--cpus 32] [--rounds 3]``
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bitextor_spark.functions.text import shingles
    from bitextor_spark.operators import dedup as D

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("ngram-ab")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))

    def v0():
        return D.ngram_jaccard_pairs(
            docs, "doc_id", shingles(F.col("text"), 3), threshold=0.05
        )

    def v1():
        return D.ngram_jaccard_pairs_carried(
            docs, "doc_id", shingles(F.col("text"), 3), threshold=0.05
        )

    def checksum(df):
        row = df.select(
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return (row["s"], row["n"])

    def timed(build):
        t0 = time.monotonic()
        build().write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    sums = {"v0": checksum(v0()), "v1": checksum(v1())}
    print(f"checksums: {sums}", flush=True)
    assert sums["v0"] == sums["v1"], "variants disagree — NOT exact"

    walls: dict[str, list[float]] = {"v0": [], "v1": []}
    order = ["v0", "v1"]
    builds = {"v0": v0, "v1": v1}
    for rnd in range(args.rounds):
        for name in (order if rnd % 2 == 0 else order[::-1]):
            w = timed(builds[name])
            walls[name].append(w)
            print(f"round {rnd} {name}: {w:.2f} s", flush=True)

    for name, ws in walls.items():
        print(
            f"{name}: median {statistics.median(ws):.2f} s  "
            f"walls {[round(w, 2) for w in ws]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
