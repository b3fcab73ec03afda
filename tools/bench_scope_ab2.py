"""In-situ attribution of the discovery stage (engine-shaped, r5).

bench_scope_ab.py showed scope+winner-agg over a PERSISTED candidate set
is ~1 s at 16 cores, yet the engine's fused discovery stage burns ~25 s
wall / 240 CPU-s on the fat epoch.  The difference is everything upstream
of the candidates: the events→pages probe join against the 1 GB cached
pages table (2M rows with outlink arrays) and the in-stage resolver.

This harness builds the exact engine shape — pages cached co-partitioned/
co-sorted by url_canon, a 789k-row events side, probe join, flat Arrow
resolver, scope, winner aggregation — then knocks pieces out:

  full       join → resolver → scope → winner-agg   (engine discovery)
  noscope    join → resolver → cheap scope → winner-agg
  nowinner   join → resolver → scope → count agg
  linkcount  join → sum(size(outlinks))             (no resolver/Python)
  resolve    join → resolver → count                (no scope/agg)

Run: ``python tools/bench_scope_ab2.py [cpus]``.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from bitextor_spark.config import CrawlConfig
    from bitextor_spark.frontier.world import spark_world
    from bitextor_spark.functions.urls import make_flat_resolver
    from bitextor_spark.plans.scope import apply_scope, is_embed_col
    from bitextor_spark.session import get_spark
    from pyspark.sql.types import (
        DoubleType, StringType, StructField, StructType,
    )

    cpus = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_CPUS", "16"
    )
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=32,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    cfg = CrawlConfig()
    dfs = spark_world(spark, n_pages=2_000_000, n_hosts=6000,
                      mean_outlinks=10, seed=42, n_seeds=1_200_000)
    # the engine's pages cache: co-partitioned + co-sorted by url_canon
    pages = (
        dfs["pages"]
        .repartition(32, "url_canon")
        .sortWithinPartitions("url_canon")
        .cache()
    )
    pages.count()
    # the fat epoch's fetched set: ~790k pages (seed hit rate of the bench
    # world), with the event columns discovery reads
    events = (
        dfs["pages"].select("url_canon", "host").sample(0.395, seed=7)
        .select(
            "url_canon",
            F.lit(1).cast("int").alias("hop"),
            F.lit(0).cast("long").alias("seed_id"),
            F.lit(0).cast("long").alias("fetch_start_ms"),
            F.col("host").alias("disc_host"),
            F.lit(0).cast("int").alias("parent_trans"),
            F.lit(1.0).alias("parent_priority"),
        )
        .localCheckpoint()
    )
    n_events = events.count()
    robots = dfs["robots"].cache()
    robots.count()
    seed_domains = (
        pages.select(
            F.regexp_extract("url_canon", r"https?://([^/]+)/", 1).alias("h")
        )
        .select(
            F.concat(
                F.element_at(F.split("h", r"\."), -2), F.lit("."),
                F.element_at(F.split("h", r"\."), -1),
            ).alias("reg_domain")
        )
        .distinct()
        .localCheckpoint()
    )
    seed_domains.count()

    _pass = ["disc_url", "hop", "seed_id", "fetch_start_ms", "disc_host",
             "parent_trans"]

    def joined():
        return (
            events.withColumnRenamed("url_canon", "disc_url")
            .join(
                pages.select(F.col("url_canon").alias("disc_url"), "outlinks"),
                "disc_url",
            )
            .select(
                *_pass, "parent_priority",
                F.slice("outlinks", 1, cfg.max_outlinks).alias("outlinks"),
            )
        )

    def resolved():
        disc_in = joined()
        return disc_in.mapInArrow(
            make_flat_resolver(
                "disc_url", "outlinks", "parent_priority", _pass
            ),
            StructType(
                [disc_in.schema[n] for n in _pass]
                + [StructField("cash", DoubleType()),
                   StructField("cand_canon", StringType()),
                   StructField("cand_host", StringType()),
                   StructField("cand_reg_domain", StringType())]
            ),
        )

    def candidates():
        return resolved().select(
            F.col("cand_canon").alias("url_canon"),
            (F.col("hop") + 1).cast("int").alias("hop"),
            "seed_id", "fetch_start_ms", "disc_host", "disc_url",
            F.col("cand_host").alias("host"),
            F.col("cand_reg_domain").alias("reg_domain"),
            F.when(is_embed_col(F.col("cand_canon"), cfg),
                   F.col("parent_trans") + 1)
            .otherwise(F.lit(0)).cast("int").alias("trans_hops"),
            F.col("cash").alias("priority"),
        )

    def winner_agg(scoped):
        return scoped.groupBy("url_canon").agg(
            F.min(
                F.when(
                    F.col("in_scope"),
                    F.struct("fetch_start_ms", "disc_host", "disc_url",
                             "hop", "seed_id", "host", "trans_hops",
                             "priority"),
                )
            ).alias("w"),
            F.sum(F.when(F.col("in_scope"), 1).otherwise(0)).alias("n_disc"),
            F.sum(F.when(~F.col("in_scope"), 1).otherwise(0)).alias(
                "n_reject"
            ),
            F.max("host").alias("_any_host"),
        )

    def full():
        return winner_agg(apply_scope(candidates(), seed_domains, robots, cfg))

    def noscope():
        c = (
            candidates()
            .join(
                F.broadcast(
                    seed_domains.withColumn("_seed_dom", F.lit(True))
                ),
                "reg_domain", "left",
            )
            .withColumn(
                "in_scope", F.coalesce(F.col("_seed_dom"), F.lit(False))
            )
            .drop("_seed_dom")
        )
        return winner_agg(c)

    def nowinner():
        return (
            apply_scope(candidates(), seed_domains, robots, cfg)
            .groupBy("url_canon")
            .agg(
                F.sum(F.when(F.col("in_scope"), 1).otherwise(0)).alias(
                    "n_disc"
                ),
                F.max("host").alias("_any_host"),
            )
        )

    def linkcount():
        return joined().agg(F.sum(F.size("outlinks")).alias("n"))

    def resolve():
        return resolved().agg(F.count(F.lit(1)).alias("n"))

    variants = {"full": full, "noscope": noscope, "nowinner": nowinner,
                "linkcount": linkcount, "resolve": resolve}

    def force(df):
        t0 = time.time()
        n = df.count()
        return time.time() - t0, n

    def _narrow(df):
        # flatten the winner struct to the fields consumers actually read
        # (the min-ordering fields disc_url/disc_host/fetch_start_ms are
        # dead after the aggregation — don't materialize them in the pin)
        return df.select(
            "url_canon",
            F.col("w").isNotNull().alias("won"),
            F.col("w.host").alias("host"),
            F.col("w.hop").alias("hop"),
            F.col("w.seed_id").alias("seed_id"),
            F.col("w.trans_hops").alias("trans_hops"),
            F.col("w.priority").alias("priority"),
            "n_disc", "n_reject", "_any_host",
        )

    def _timed(make, finish):
        t0 = time.time()
        df = finish(make())
        n = df.count()
        dt = time.time() - t0
        df.unpersist()
        return dt, n

    def force_pin(mode):
        # the engine's actual materialization modes for the aggregate pin
        if mode == "ckpt":
            return _timed(full, lambda d: d.localCheckpoint())
        if mode == "ckpt_narrow":
            return _timed(full, lambda d: _narrow(d).localCheckpoint())
        if mode == "persist_narrow":
            return _timed(full, lambda d: _narrow(d).persist())
        raise ValueError(mode)

    # CAUTION (measured the hard way): forcing these plans with .count()
    # lets Catalyst PRUNE the winner-struct and scope expressions out of
    # the aggregate entirely — count-only timings of an agg measure almost
    # nothing. Honest timings below materialize every column via the
    # engine's own pin op (eager localCheckpoint), then unpersist.
    def cheapscope_ckpt():
        c = (
            candidates()
            .join(
                F.broadcast(
                    seed_domains.withColumn("_seed_dom", F.lit(True))
                ),
                "reg_domain", "left",
            )
            .withColumn(
                "in_scope", F.coalesce(F.col("_seed_dom"), F.lit(False))
            )
            .drop("_seed_dom")
        )
        return winner_agg(c)

    def noembed_ckpt():
        # full scope, but candidates() without the is_embed parse_url
        c = resolved().select(
            F.col("cand_canon").alias("url_canon"),
            (F.col("hop") + 1).cast("int").alias("hop"),
            "seed_id", "fetch_start_ms", "disc_host", "disc_url",
            F.col("cand_host").alias("host"),
            F.col("cand_reg_domain").alias("reg_domain"),
            F.lit(0).cast("int").alias("trans_hops"),
            F.col("cash").alias("priority"),
        )
        return winner_agg(apply_scope(c, seed_domains, robots, cfg))

    def countagg_ckpt():
        return (
            apply_scope(candidates(), seed_domains, robots, cfg)
            .groupBy("url_canon")
            .agg(
                F.sum(F.when(F.col("in_scope"), 1).otherwise(0)).alias(
                    "n_disc"
                ),
                F.max("host").alias("_any_host"),
            )
        )

    def oldscope_ckpt():
        # the pre-r5 scope: 4x parse_url (one java.net.URI each, boxed,
        # CodegenFallback) + interpreted HOF aggregate/filter per row —
        # reconstructed on try_parse_url so invalid URLs don't throw
        url = F.col("url_canon")

        def pth():
            return F.try_parse_url(url, F.lit("PATH"))

        segs = F.filter(F.split(pth(), "/"), lambda s: s != "")
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"), F.lit(0).alias("best"),
        )

        def step(acc, seg):
            nr = F.when(seg == acc["prev"], acc["run"] + 1).otherwise(
                F.lit(1)
            )
            return F.struct(seg.alias("prev"), nr.alias("run"),
                            F.greatest(acc["best"], nr).alias("best"))

        max_run = F.aggregate(segs, init, step, lambda a: a["best"])
        c = (
            candidates()
            .join(
                F.broadcast(
                    seed_domains.withColumn("_seed_dom", F.lit(True))
                ),
                "reg_domain", "left",
            )
            .join(
                F.broadcast(robots.select("host", "disallow_prefixes")),
                "host", "left",
            )
        )
        seed_ok = F.coalesce(F.col("_seed_dom"), F.lit(False)) & (
            F.col("hop") <= cfg.max_hops
        )
        trans_ok = (F.col("trans_hops") >= 1) & (
            F.col("trans_hops") <= cfg.max_trans_hops
        )
        rej = F.lit(False)
        for pat in cfg.reject_url_regexes:
            rej = rej | url.rlike(pat)
        late = (
            (F.size(segs) > cfg.max_path_depth)
            | (max_run > cfg.max_repetitions)
            | F.col("host").rlike("|".join(cfg.blacklist_hosts))
            | rej
            | F.when(
                F.col("disallow_prefixes").isNull(), F.lit(False)
            ).otherwise(
                F.exists(
                    "disallow_prefixes",
                    lambda p: F.coalesce(pth(), F.lit("/")).startswith(p),
                )
            )
        )
        in_scope = F.coalesce(pth(), F.lit("/")).isin(
            *cfg.prerequisite_paths
        ) | (~late & (trans_ok | seed_ok))
        c = c.withColumn("in_scope", in_scope).drop(
            "_seed_dom", "disallow_prefixes"
        )
        return winner_agg(c)

    honest = {
        "full": full,
        "oldscope": oldscope_ckpt,
        "cheapscope": cheapscope_ckpt,
        "noembed": noembed_ckpt,
        "nowinner": countagg_ckpt,
    }

    def force_ckpt(make):
        t0 = time.time()
        df = make().localCheckpoint()
        n = df.count()
        dt = time.time() - t0
        df.unpersist()
        return dt, n

    for v in honest.values():
        force_ckpt(v)  # warm
    print(f"events={n_events}", flush=True)
    for i in range(3):
        parts = []
        for name, v in honest.items():
            t, n = force_ckpt(v)
            parts.append(f"{name} {t:.2f}s")
        t, _ = force(resolve())
        parts.append(f"resolve {t:.2f}s")
        print(f"round {i}: " + "  ".join(parts), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
