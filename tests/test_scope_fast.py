"""Fast-scope parity: the r5 regex path extraction and rule rewrites must
match the parse_url/HOF originals everywhere the originals don't throw.

Spark 4's ``parse_url`` raises INVALID_URL on anything java.net.URI
rejects (a raw space, ``|``, a bad %-escape...), so the reference columns
here are built on ``try_parse_url`` — identical to the old expressions on
every input the old code survived, NULL where it crashed."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bitextor_spark.functions.urls import canonicalize_url
from bitextor_spark.plans.scope import (
    _depth_of_path,
    _has_repeat_run_col,
    apply_scope,
    path_depth_col,
    url_path_col,
)

EDGE_URLS = [
    "http://h", "http://h/", "http://h/p", "http://h/p?q=1", "http://h/p#f",
    "http://h:8080/p", "https://h/a/b/c", "http://h/a b", "http://h/café",
    "http://h/p%20x", "http://h//a//b", "http://h/a?b?c", "ftp://h/p",
    "http://h/p;x=1", "http://h/~u/p", "http://h/a'b", "http://h/p?",
    "http://h/?q", "not a url", "http:///p", "//h/p", "http://h/%zz",
    "http://h/a|b", "http://h/a[b]", "", "http://h/p#a#b",
    "http://h/a/a", "http://h/a/a/a", "http://h/a/a/a/a", "http://h/a/aa",
    "http://h/aa/a", "http://h/a//a//a", "http://h/a/a/", "http://h///",
    "http://h/" + "/".join(f"p{i}" for i in range(25)),
    "http://h/" + "x/" * 30, "http://h/a/b/a/b", "http://h/%2F/a",
    "http://user:pw@h:81/p?a=1&b=2#frag", "https://h./p", "HTTP://H/P",
    "http://h/robots.txt", "http://h/robots.txt?x=1",
    "http://[::1]/p", "http://h/p\tq", None,
]


def _junk_corpus(n=300, seed=7):
    rng = random.Random(seed)
    alphabet = "ab/.%20?#:|[] \té中'~;=&"
    out = []
    for _ in range(n):
        raw = "http://h" + "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 24))
        )
        out.append(raw)
        out.append(canonicalize_url(raw))
    return [u for u in out]


def _df(spark):
    rows = [(u,) for u in EDGE_URLS + _junk_corpus()]
    return spark.createDataFrame(rows, "u string")


def test_url_path_col_matches_try_parse_url(spark):
    df = _df(spark).select(
        "u",
        url_path_col(F.col("u")).alias("fast"),
        F.try_parse_url("u", F.lit("PATH")).alias("ref"),
    )
    bad = df.filter(~(F.col("fast").eqNullSafe(F.col("ref")))).collect()
    assert not bad, [(r.u, r.fast, r.ref) for r in bad[:10]]


def test_depth_and_repeat_run_match_hof_twins(spark):
    ref_path = F.try_parse_url("u", F.lit("PATH"))
    ref_segs = F.filter(F.split(ref_path, "/"), lambda s: s != "")
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, seg):
        nr = F.when(seg == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(seg.alias("prev"), nr.alias("run"),
                        F.greatest(acc["best"], nr).alias("best"))

    ref_maxrun = F.aggregate(ref_segs, init, step, lambda a: a["best"])
    checks = [
        path_depth_col(F.col("u")).eqNullSafe(F.size(ref_segs)).alias("d_ok")
    ]
    for r in (1, 2, 3):
        checks.append(
            _has_repeat_run_col(url_path_col(F.col("u")), r)
            .eqNullSafe(ref_maxrun > r)
            .alias(f"r{r}_ok")
        )
    df = _df(spark).select("u", *checks)
    conds = [f"NOT d_ok"] + [f"NOT r{r}_ok" for r in (1, 2, 3)]
    bad = df.filter(" OR ".join(conds)).collect()
    assert not bad, bad[:10]


def test_depth_of_path_handles_slash_runs(spark):
    rows = [("", 0), ("/", 0), ("/a", 1), ("/a/", 1), ("/a//b", 2),
            ("///", 0), ("a/b/c", 3), ("/a/b/c/", 3)]
    df = spark.createDataFrame(rows, "p string, want int").select(
        "p", "want", _depth_of_path(F.col("p")).alias("got")
    )
    assert all(r.got == r.want for r in df.collect())


def test_apply_scope_survives_urls_parse_url_rejects(spark):
    """Regression: plain parse_url would THROW on these candidate URLs and
    kill the epoch job; the fast scope must classify them instead."""
    from bitextor_spark.config import CrawlConfig

    cfg = CrawlConfig()
    cand = spark.createDataFrame(
        [
            ("http://ok.example.com/a", "ok.example.com", "example.com", 1, 0),
            ("http://ok.example.com/a b", "ok.example.com", "example.com", 1, 0),
            ("http://ok.example.com/a|b", "ok.example.com", "example.com", 1, 0),
            ("http://ok.example.com/café", "ok.example.com",
             "example.com", 1, 0),
            ("http://ok.example.com/%zz", "ok.example.com", "example.com",
             1, 0),
        ],
        "url_canon string, host string, reg_domain string, hop int, "
        "trans_hops int",
    )
    seeds = spark.createDataFrame([("example.com",)], "reg_domain string")
    robots = spark.createDataFrame(
        [("ok.example.com", 0, ["/private/"])],
        "host string, crawl_delay_s int, disallow_prefixes array<string>",
    )
    out = apply_scope(cand, seeds, robots, cfg).collect()
    assert len(out) == 5
    by_url = {r.url_canon: r.in_scope for r in out}
    assert by_url["http://ok.example.com/a"] is True
    # the unicode path parses (URI accepts it) and stays in scope
    assert by_url["http://ok.example.com/café"] is True
