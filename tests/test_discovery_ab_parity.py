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


def test_flat_resolver_adversarial_edges(spark):
    """Edge rows the synthetic worlds never generate, pinned flat-vs-loop:
    control-char whitespace (Python strips \\x1c, RE2's White_Space does
    not — must fall to the slow path, not diverge), null links inside the
    array, empty arrays, NULL/empty base, base containing '%' (clean-rel
    veto), links that need every canonicalization rule, and duplicate
    spellings that collapse within the page."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType, StringType, StructField, StructType,
    )

    from bitextor_spark.functions.urls import (
        make_flat_resolver,
        resolve_outlinks_arr_udf,
    )

    rows = [
        ("http://ex.com/a/base.html", "h.ex.com", 2.0,
         ["p1.html", " p1.html ", "\x1chttp://ex.com/c1.html",
          "HTTP://EX.COM:80/up.html?PHPSESSID=deadbeef#f",
          "http://www3.ex.com/w.html", None, "", "   ",
          "../up/esc.html", "mailto:x@y", "p1.html",
          "http://ex.com/ok/fine.html", "http://ex.com/ok//dup.html"]),
        ("http://pc.ex.com/%20enc/base.html", "pc.ex.com", 1.0,
         ["rel.html", "http://ex.com/abs.html"]),   # % base: rel via slow path
        (None, "null.ex.com", 1.0, ["p1.html"]),    # null base -> no rows
        ("http://empty.ex.com/x.html", "empty.ex.com", 1.0, []),
        ("http://nullarr.ex.com/x.html", "nullarr.ex.com", 1.0, None),
    ]
    pages = spark.createDataFrame(
        rows,
        "url_canon string, disc_host string, parent_priority double, "
        "outlinks array<string>",
    )

    old = (
        pages.select(
            "url_canon", "parent_priority",
            resolve_outlinks_arr_udf(
                "url_canon", F.slice("outlinks", 1, 100)
            ).alias("_r"),
        )
        .withColumn(
            "cash",
            F.when(
                F.size("_r") > 0, F.col("parent_priority") / F.size("_r")
            ).otherwise(F.lit(0.0)),
        )
        .select(F.col("url_canon").alias("disc"), "cash",
                F.explode("_r").alias("r"))
        .select("disc", "cash", "r.url_canon", "r.host", "r.reg_domain")
        .collect()
    )
    old_set = {(r[0], round(r[1], 9), r[2], r[3], r[4]) for r in old}

    in_df = pages.select(
        F.col("url_canon").alias("disc_url"),
        F.slice("outlinks", 1, 100).alias("outlinks"),
        "disc_host", "parent_priority",
    )
    fn = make_flat_resolver(
        "disc_url", "outlinks", "parent_priority", ["disc_url"]
    )
    new = in_df.mapInArrow(
        fn,
        StructType([
            StructField("disc_url", StringType()),
            StructField("cash", DoubleType()),
            StructField("cand_canon", StringType()),
            StructField("cand_host", StringType()),
            StructField("cand_reg_domain", StringType()),
        ]),
    ).collect()
    new_set = {(r[0], round(r[1], 9), r[2], r[3], r[4]) for r in new}

    assert len(old) == len(new)
    assert old_set == new_set
    # the null/empty/None-array pages must emit nothing
    discs = {r[0] for r in new}
    assert not discs & {None, "http://empty.ex.com/x.html",
                        "http://nullarr.ex.com/x.html"}
