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


def is_embed_col(url_col: Column, cfg: CrawlConfig) -> Column:
    """Transclusion-kind link: resource extension ⇒ embed hop ('E' in the
    Heritrix hop path; kind derived from the URL, deterministic on both
    engine and simulator)."""
    path = F.lower(F.coalesce(F.parse_url(url_col, F.lit("PATH")), F.lit("")))
    out = F.lit(False)
    for ext in cfg.embed_extensions:
        out = out | path.endswith(ext)
    return out


def regex_reject_col(url_col: Column, cfg: CrawlConfig) -> Column:
    """Custom REJECT regex list (MatchesListRegexDecideRule slot)."""
    out = F.lit(False)
    for pat in cfg.reject_url_regexes:
        out = out | url_col.rlike(pat)
    return out


def prerequisite_col(url_col: Column, cfg: CrawlConfig) -> Column:
    """Prerequisite URIs (robots.txt-style) are always fetchable."""
    path = F.coalesce(F.parse_url(url_col, F.lit("PATH")), F.lit("/"))
    return path.isin(*cfg.prerequisite_paths)


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
    trans_col: str = "trans_hops",
) -> DataFrame:
    """Annotate candidates (url_canon, host, reg_domain, hop, trans_hops)
    with in_scope.

    Full decide-rule chain, last-match-wins order re-expressed as one
    boolean (crawler-beans.cxml:131-186):

      REJECT-all → ACCEPT seed-domain → REJECT hops>max →
      ACCEPT transclusion (1 ≤ trans_hops ≤ max) → REJECT path-depth →
      REJECT pathological-repeat → REJECT blacklist → REJECT custom-regex →
      REJECT robots-disallow → ACCEPT prerequisite

      in_scope = prereq ∨ (¬late_rejects ∧ (trans_ok ∨ (seed ∧ hop_ok)))

    Returns the input plus boolean ``in_scope``; the caller splits kept/
    rejected so per-host reject metrics (C17) fall out of one pass. If the
    input has no ``trans_hops`` column it is treated as 0 (seed scope).
    """
    if trans_col not in candidates.columns:
        candidates = candidates.withColumn(trans_col, F.lit(0))
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
    url = F.col("url_canon")
    seed_ok = (
        F.coalesce(F.col("_seed_dom"), F.lit(False))
        & (F.col(hop_col) <= cfg.max_hops)
    )
    trans_ok = (F.col(trans_col) >= 1) & (F.col(trans_col) <= cfg.max_trans_hops)
    late_reject = (
        (path_depth_col(url) > cfg.max_path_depth)
        | (max_run_col(url) > cfg.max_repetitions)
        | blacklist_col(F.col("host"), cfg)
        | regex_reject_col(url, cfg)
        | robots_disallowed_col(url, F.col("disallow_prefixes"))
    )
    in_scope = prerequisite_col(url, cfg) | (
        ~late_reject & (trans_ok | seed_ok)
    )
    return df.withColumn("in_scope", in_scope).drop("_seed_dom", "disallow_prefixes")
