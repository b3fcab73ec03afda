"""The two simhash forms must be bit-identical: the per-row HOF column
(`simhash_col`, the readable reference form) and the explode→codegen
hash-agg (`simhash_signatures`, the measured-faster form the pair miner
uses — one whole-stage-codegen pass instead of `bits` interpreted
``F.aggregate`` walks per row). Edge rows (empty text, whitespace-only,
NULL, single token) are exactly where the explode re-expression can
silently diverge (explode drops empty arrays; explode_outer + the
null-guard is the fix under test here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bitextor_spark.operators.dedup import simhash_col, simhash_signatures

DOCS = [
    (1, "alpha beta gamma delta"),
    (2, "alpha beta gamma delta epsilon"),
    (3, ""),                     # empty text -> no tokens -> sh must be 0
    (4, "   \t  "),              # whitespace-only -> no tokens -> sh 0
    (5, None),                   # NULL text -> sh 0
    (6, "solo"),                 # single token
    (7, "alpha beta gamma delta"),  # exact dup of doc 1 -> identical sh
]


def test_simhash_forms_identical(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    for bits in (32, 60):
        per_row = {
            r["doc"]: r["sh"]
            for r in df.select(
                F.col("doc_id").alias("doc"),
                simhash_col(F.col("text"), bits).alias("sh"),
            ).collect()
        }
        agg = {
            r["doc"]: r["sh"]
            for r in simhash_signatures(df, "doc_id", "text", bits).collect()
        }
        assert agg == per_row, f"bits={bits}: {agg} != {per_row}"
    # the edge rows land at 0, dup docs collide
    assert agg[3] == agg[4] == agg[5] == 0
    assert agg[1] == agg[7] != 0
