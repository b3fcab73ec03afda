"""Matching operators vs brute-force Python oracles (W3/W4 semantics,
docalign.cpp:424-462 and bitextor_align_documents.py:36-365)."""

from __future__ import annotations

import pytest

from bitextor_spark.operators.matching import greedy_one_to_one, mutually_best_converge

PAIRS = [
    # (src, trg, score)
    (1, 10, 0.9), (1, 11, 0.8), (2, 10, 0.85), (2, 11, 0.7),
    (3, 12, 0.6), (3, 10, 0.95), (4, 13, 0.5), (4, 12, 0.55),
    (5, 14, 0.4),
]


def _greedy_oracle(pairs):
    out, ts, tt = [], set(), set()
    for s, t, sc in sorted(pairs, key=lambda p: (-p[2], p[0], p[1])):
        if s in ts or t in tt:
            continue
        ts.add(s)
        tt.add(t)
        out.append((s, t, sc))
    return sorted(out)


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(PAIRS, "src bigint, trg bigint, score double")


def test_greedy_matches_oracle(spark, pairs_df):
    got = sorted(
        (r.src, r.trg, r.score) for r in greedy_one_to_one(pairs_df).collect()
    )
    assert got == _greedy_oracle(PAIRS)


def test_greedy_is_one_to_one(spark, pairs_df):
    rows = greedy_one_to_one(pairs_df).collect()
    assert len({r.src for r in rows}) == len(rows)
    assert len({r.trg for r in rows}) == len(rows)


def test_converge_is_one_to_one_and_stable(spark, pairs_df):
    rows = mutually_best_converge(pairs_df).collect()
    assert len({r.src for r in rows}) == len(rows)
    assert len({r.trg for r in rows}) == len(rows)
    # mutually-best first round: (3,10,.95) pairs; then (1,11,.8) after 10
    # is taken; converge must find at least the undisputed pairs
    got = {(r.src, r.trg) for r in rows}
    assert (3, 10) in got
    assert (5, 14) in got


def test_converge_adversarial_chain_explicit_convergence(spark):
    """Adversarial long-chain score matrix: each round's mutual-best set is
    a SINGLE pair ((k,k) unlocks only after (k-1,k-1) is removed), forcing
    n iterations for n matches. The fixpoint must be reached explicitly —
    and an insufficient round budget must raise, not silently truncate."""
    import pytest as _pytest

    from bitextor_spark.operators.matching import mutually_best_converge

    n = 12
    rows = []
    for i in range(1, n + 1):
        rows.append((i, i, 100.0 - 2 * i))            # (i,i)
        if i < n:
            rows.append((i + 1, i, 100.0 - 2 * i - 1))  # (i+1,i) decoy
    pairs = spark.createDataFrame(rows, "src bigint, trg bigint, score double")

    got = mutually_best_converge(pairs, max_iters=n + 2)
    assert sorted((r.src, r.trg) for r in got.collect()) == [
        (i, i) for i in range(1, n + 1)
    ]

    with _pytest.raises(RuntimeError, match="fixpoint not reached"):
        mutually_best_converge(pairs, max_iters=3)

    partial = mutually_best_converge(pairs, max_iters=3, strict=False)
    assert sorted((r.src, r.trg) for r in partial.collect()) == [
        (1, 1), (2, 2), (3, 3)
    ]
