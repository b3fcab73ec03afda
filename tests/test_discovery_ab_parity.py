"""Exactness of the discovery-resolver A/B variants.

tools/bench_discovery_ab.py races two JVM array-HOF re-expressions of the
outlink resolver against the shipped Arrow loop; the PERFORMANCE verdict
(Arrow loop wins) is only valid if all three compute the identical result
multiset. The bench tool asserts link counts at 8M links; this test pins
the full (disc page → resolved struct) SET on a world small enough for an
exact compare, so a semantic drift in any variant fails CI rather than
silently invalidating the measured decision."""

from __future__ import annotations

from pyspark.sql import functions as F


def _resolved_set(df):
    rows = (
        df.select(F.col("url_canon").alias("disc"), F.explode("_r").alias("r"))
        .select("disc", "r.url_canon", "r.host", "r.reg_domain")
        .collect()
    )
    return {tuple(r) for r in rows}, len(rows)


def test_jvm_variants_match_arrow_loop(spark):
    from bitextor_spark.frontier.world import spark_world
    from tools.bench_discovery_ab import (
        arrow_flat_plan,
        jvm_naive_plan,
        jvm_tagged_plan,
        old_plan,
    )

    dfs = spark_world(spark, n_pages=4000, n_hosts=40, mean_outlinks=10,
                      seed=11, n_seeds=50)
    pages = dfs["pages"].select(
        "url_canon", "outlinks", F.col("host").alias("disc_host")
    )
    base_set, base_n = _resolved_set(old_plan(pages))
    assert base_n > 10_000  # the world actually exercises the resolver
    for plan in (jvm_naive_plan, jvm_tagged_plan):
        got_set, got_n = _resolved_set(plan(pages))
        assert got_n == base_n, plan.__name__
        assert got_set == base_set, plan.__name__
    # the ENGINE's shipped flat path (mapInArrow, RE2-veto re-expression of
    # the lookahead regex): identical multiset, flat row form
    flat = arrow_flat_plan(pages).select(
        F.col("disc_url").alias("disc"),
        "cand_canon", "cand_host", "cand_reg_domain",
    ).collect()
    flat_set = {tuple(r) for r in flat}
    assert len(flat) == base_n
    assert flat_set == base_set
