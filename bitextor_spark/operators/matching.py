"""Document matching: greedy 1:1 sweep (W3) and bidirectional
mutually-best converge matching (W4).

Reference: greedy sweep over score-sorted pairs, skipping any pair whose
doc is already matched (document-aligner/docalign.cpp:424-462, with the
deterministic idx-desc tiebreak); bidirectional best-match with converge
iterations (bitextor/docalign/bitextor_align_documents.py:36-365).

W4 is the distributed algorithm: each iteration is two windows + a join +
an anti-join (pure DataFrame ops), converging in O(log) rounds in
practice. W3's global sweep is inherently sequential — it runs as a
single sorted pass (mapPartitions over one sorted partition) and exists as
the exactness oracle for small inputs; at scale the converge matching is
the operator of record, as in the reference (`-i converge`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def greedy_one_to_one(pairs: DataFrame) -> DataFrame:
    """Greedy sweep over (src, trg, score): best score first, deterministic
    (score desc, src, trg) order; a pair is kept iff neither side matched.
    Single-pass sequential semantics — executed on one sorted partition."""
    schema = "src bigint, trg bigint, score double"

    def sweep(rows):
        taken_src, taken_trg = set(), set()
        for r in rows:
            if r.src in taken_src or r.trg in taken_trg:
                continue
            taken_src.add(r.src)
            taken_trg.add(r.trg)
            yield (r.src, r.trg, r.score)

    swept = (
        pairs.select("src", "trg", "score")
        .orderBy(F.col("score").desc(), "src", "trg")
        .coalesce(1)
        .rdd.mapPartitions(sweep)
    )
    return pairs.sparkSession.createDataFrame(swept, schema)


def mutually_best_converge(
    pairs: DataFrame, max_iters: int | None = None, strict: bool = True
) -> DataFrame:
    """Iteratively keep mutually-best (src,trg) pairs, remove matched docs,
    repeat until fixpoint — align_documents' converge mode, distributed.

    Convergence is EXPLICIT: the loop runs until no mutually-best pair
    remains (the fixpoint — every iteration removes at least the globally
    best remaining pair, so it terminates; with deterministic tiebreaks
    each round typically clears a constant fraction, i.e. O(log n) rounds
    in practice). ``max_iters`` is a safety bound only; the default
    (``None``) scales it to the input — one round per pair is a hard upper
    bound on rounds-to-fixpoint, so the strict raise is unreachable unless
    a caller passes an explicit smaller budget. Hitting an explicit bound
    with work remaining raises under ``strict`` (default; since round 4 —
    earlier rounds silently returned a partial matching) instead of
    truncating; ``strict=False`` returns the partial result for callers
    that want best-effort under a round budget.

    Per-round driver cost is TWO jobs: one eager ``localCheckpoint`` of a
    single tagged table (mutual flag + src/trg-taken flags — the anti-join
    re-expressed as two more windows over the partitionings the rank pass
    already shuffles into), and an emptiness count that reads the cached
    partitions. Both ``mutual`` and ``remaining`` are filters over that one
    materialization, so lineage stays bounded without per-branch
    checkpoints."""
    remaining = pairs.select("src", "trg", "score").localCheckpoint()
    if max_iters is None:
        # cheap exact upper bound: every round removes >= 1 mutual pair
        max_iters = max(64, remaining.count())
    matched = None
    converged = False
    for _ in range(max_iters):
        w_src = Window.partitionBy("src").orderBy(F.col("score").desc(), "trg")
        w_trg = Window.partitionBy("trg").orderBy(F.col("score").desc(), "src")
        is_mutual = (F.col("rs") == 1) & (F.col("rt") == 1)
        tagged = (
            remaining.withColumn("rs", F.row_number().over(w_src))
            .withColumn("rt", F.row_number().over(w_trg))
            .withColumn("is_mutual", is_mutual)
            .withColumn(
                "src_taken",
                F.max(is_mutual.cast("int")).over(Window.partitionBy("src")),
            )
            .withColumn(
                "trg_taken",
                F.max(is_mutual.cast("int")).over(Window.partitionBy("trg")),
            )
            .localCheckpoint()
        )
        mutual = tagged.filter("is_mutual").select("src", "trg", "score")
        if mutual.isEmpty():
            converged = True
            break
        matched = mutual if matched is None else matched.unionByName(mutual)
        remaining = tagged.filter(
            ~F.col("is_mutual")
            & (F.col("src_taken") == 0)
            & (F.col("trg_taken") == 0)
        ).select("src", "trg", "score")
    if not converged and remaining.isEmpty():
        converged = True  # last round matched everything
    if not converged and strict:
        raise RuntimeError(
            f"mutually_best_converge: fixpoint not reached within "
            f"{max_iters} iterations ({remaining.count()} pairs unresolved); "
            f"raise max_iters or pass strict=False for a partial matching"
        )
    if matched is None:
        return pairs.select("src", "trg", "score").limit(0)
    return matched
