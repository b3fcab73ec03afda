"""TF-IDF similarity join (J5/A2/A3) — the document-alignment core.

Reference: document-aligner/docalign.cpp:264-411 (inverted-index
similarity join), src/document.cpp:23-72 (tfidf = log(tf+1)·log(N/(1+df)),
L2-normalized per doc), DF pruning min 2 / max 1000
(docalign.cpp:240-261), score threshold 0.1 (docalign.cpp:115), top-10
candidates per doc (bitextor_idx2ridx.py:148-149 → W1).

Spark shape: explode tokens → tf per (doc, token) → df per token (partial
agg is automatic) → prune → tfidf + windowed L2 norm → equi-join on token
between the two sides → groupBy(pair).sum(product) — the classic sparse
matrix multiply as a join; never an all-pairs product. At 100 TB the join
key (token/ngram hash) is pruned of hot keys by the max-DF rule, which is
the semantic skew-kill the reference applies for exactly this reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bitextor_spark.functions.text import tokens


def tfidf_vectors(
    docs: DataFrame,  # (doc, text)
    min_df: int = 2,
    max_df: int = 1000,
) -> DataFrame:
    """(doc, token, weight) with L2-normalized tf-idf weights."""
    # N rides as a broadcast 1-row aggregate inside the one plan — no
    # separate count() action per invocation
    n_df = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    tf = (
        docs.select("doc", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("doc", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    pruned = df_counts.filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    weighted = (
        tf.join(pruned, "token")
        .join(F.broadcast(n_df))
        .withColumn(
            "w",
            F.log(F.col("tf") + 1.0) * F.log(F.col("_n") / (F.col("df") + 1.0)),
        )
        .drop("_n")
    )
    norm = Window.partitionBy("doc")
    return weighted.withColumn(
        "weight", F.col("w") / F.sqrt(F.sum(F.col("w") * F.col("w")).over(norm))
    ).select("doc", "token", "weight")


def tfidf_similarity_join(
    left_docs: DataFrame,  # (doc, text)
    right_docs: DataFrame,  # (doc, text)
    threshold: float = 0.1,
    top_k: int = 10,
    min_df: int = 2,
    max_df: int = 1000,
) -> DataFrame:
    """Candidate pairs (src, trg, score) — score = tf-idf cosine (both
    sides L2-normalized over the union corpus, as the reference builds one
    DF table over both collections)."""
    union = left_docs.select(F.col("doc"), F.col("text")).unionByName(
        right_docs.select("doc", "text")
    )
    vecs = tfidf_vectors(union, min_df, max_df)
    lv = vecs.join(left_docs.select("doc"), "doc").select(
        F.col("doc").alias("src"), "token", F.col("weight").alias("lw")
    )
    rv = vecs.join(right_docs.select("doc"), "doc").select(
        F.col("doc").alias("trg"), "token", F.col("weight").alias("rw")
    )
    scores = (
        lv.join(rv, "token")
        .groupBy("src", "trg")
        .agg(F.round(F.sum(F.col("lw") * F.col("rw")), 4).alias("score"))
        .filter(F.col("score") >= threshold)
    )
    w = Window.partitionBy("src").orderBy(F.col("score").desc(), F.col("trg"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("src", "trg", "score", "rank")
    )
