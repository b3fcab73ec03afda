"""Crawl scope rules (C7/C8) as Catalyst column expressions.

The Heritrix decide-rule chain (crawler-beans.cxml:131-186) folds into one
boolean column: hop limit, host blacklist substrings
(bitextor/Snakefile:99-100), seed-domain prefix acceptance, path-depth
limit, pathological-repetition limit, robots disallow prefixes. Everything
except registered-domain extraction runs JVM-side inside whole-stage
codegen (no Python in the hot path); max-run-length of repeated path
segments is a single ``aggregate`` over the split path — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bitextor_spark.config import CrawlConfig


def path_segments(url_col: Column) -> Column:
    return F.filter(
        F.split(F.parse_url(url_col, F.lit("PATH")), "/"), lambda s: s != ""
    )


def path_depth_col(url_col: Column) -> Column:
    return F.size(path_segments(url_col))


def max_run_col(url_col: Column) -> Column:
    """Longest run of identical adjacent path segments, JVM-side.

    aggregate(segments, (prev, run, best), ...) — the 'pathological repeats'
    rule (maxRepetitions, crawler-beans.cxml:168-171) without a UDF.
    """
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, seg):
        new_run = F.when(seg == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            seg.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
        )

    return F.aggregate(path_segments(url_col), init, step, lambda acc: acc["best"])


def blacklist_col(host_col: Column, cfg: CrawlConfig) -> Column:
    """True when the host matches a blacklist substring (C8)."""
    pattern = "|".join(cfg.blacklist_hosts)
    return host_col.rlike(pattern)


def robots_disallowed_col(url_col: Column, prefixes_col: Column) -> Column:
    path = F.coalesce(F.parse_url(url_col, F.lit("PATH")), F.lit("/"))
    return F.when(prefixes_col.isNull(), F.lit(False)).otherwise(
        F.exists(prefixes_col, lambda p: path.startswith(p))
    )


def apply_scope(
    candidates: DataFrame,
    seed_domains: DataFrame,  # single column reg_domain (broadcast)
    robots: DataFrame,  # host, crawl_delay_s, disallow_prefixes (broadcast)
    cfg: CrawlConfig,
    hop_col: str = "hop",
) -> DataFrame:
    """Annotate candidates (url_canon, host, reg_domain, hop) with in_scope.

    Returns the input plus a boolean ``in_scope`` column; the caller splits
    kept/rejected so per-host reject metrics (C17) fall out of one pass.
    """
    df = (
        candidates.join(
            F.broadcast(seed_domains.withColumn("_seed_dom", F.lit(True))),
            "reg_domain",
            "left",
        )
        .join(
            F.broadcast(robots.select("host", "disallow_prefixes")), "host", "left"
        )
    )
    in_scope = (
        (F.col(hop_col) <= cfg.max_hops)
        & ~blacklist_col(F.col("host"), cfg)
        & F.coalesce(F.col("_seed_dom"), F.lit(False))
        & (path_depth_col(F.col("url_canon")) <= cfg.max_path_depth)
        & (max_run_col(F.col("url_canon")) <= cfg.max_repetitions)
        & ~robots_disallowed_col(F.col("url_canon"), F.col("disallow_prefixes"))
    )
    return df.withColumn("in_scope", in_scope).drop("_seed_dom", "disallow_prefixes")
