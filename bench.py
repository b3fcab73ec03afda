"""Benchmark harness — prints ONE JSON line for the driver.

  value          = total seconds over the headline operator queries
  queries        = per-query seconds at $SPARK_GRAFT_SF_DIR
  crawl          = frontier engine throughput (URLs scheduled+fetched/sec)
                   at N and 4N local cores + scaling efficiency
  dedup          = frontier-dedup (bloom shard) throughput

Scaling evidence per BASELINE.md: the same crawl job runs at local[N] and
local[4N] on the same deterministic world; efficiency =
(thr_4N / thr_N) / 4. Set SPARK_GRAFT_BENCH_SCALING=0 to skip the scaling
section (quick mode). All human-readable detail goes to BENCH/BASELINE.md;
stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DO_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "w1_topk_per_group",
    "o1_multikey_sort",
    "dedup_exact_first",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "text_quality",
    "text_fingerprint",
    "tfidf_similarity",
    "t1_jaccard_overlap",
    "events_windowed_agg",
    "events_sessionize",
    "word_freq",
    "inverted_index",
]


def _materialize(df) -> int:
    """Force full computation without driver-side collect."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_headline(spark) -> dict[str, float]:
    from bitextor_spark.queries import QUERIES

    out = {}
    for name in HEADLINE:
        t0 = time.time()
        _materialize(QUERIES[name](spark, SF_DIR))
        out[name] = round(time.time() - t0, 3)
    return out


def crawl_bench(cpus: int, n_pages: int, n_hosts: int, n_seeds: int,
                max_epochs: int, warmup: bool = True) -> dict:
    """One full crawl of a deterministic spark_world; returns throughput.

    A tiny untimed warmup crawl first exercises every stage shape (python
    workers, codegen, Arrow paths) so the timed run measures steady state.
    """
    import tempfile as _tf

    from bitextor_spark.config import CrawlConfig
    from bitextor_spark.frontier.engine import FrontierEngine
    from bitextor_spark.frontier.world import spark_world
    from bitextor_spark.session import get_spark

    spark = get_spark(
        app_name=f"crawl-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    try:
        if warmup:
            wdfs = spark_world(spark, n_pages=2000, n_hosts=50,
                               mean_outlinks=8, seed=7, n_seeds=500)
            wcfg = CrawlConfig(max_epochs=2, max_retries=1,
                               num_host_shards=8, bloom_bits_per_shard=1 << 20)
            wr = _tf.mkdtemp(prefix="crawl_warm_")
            FrontierEngine(spark, wcfg, wr, wdfs["pages"], wdfs["robots"],
                           wdfs["seeds"]).run(max_epochs=2)
            shutil.rmtree(wr, ignore_errors=True)

        dfs = spark_world(spark, n_pages=n_pages, n_hosts=n_hosts,
                          mean_outlinks=10, seed=42, n_seeds=n_seeds)
        cfg = CrawlConfig(
            max_epochs=max_epochs,
            max_retries=1,
            replenish_per_epoch=300,
            epoch_window_ms=3_600_000,  # wide epochs amortize fixed costs
            num_host_shards=8,
            bloom_bits_per_shard=1 << 23,
        )
        root = tempfile.mkdtemp(prefix=f"crawl_bench_{cpus}_")
        eng = FrontierEngine(spark, cfg, root, dfs["pages"], dfs["robots"],
                             dfs["seeds"], use_bloom=True)
        eng.bootstrap()
        t0 = time.time()
        stats = eng.run(max_epochs=max_epochs)
        wall = time.time() - t0
        attempts = sum(s.attempts for s in stats)
        new_urls = sum(s.new_urls for s in stats)
        shutil.rmtree(root, ignore_errors=True)
        return {
            "cpus": cpus,
            "epochs": len(stats),
            "fetch_attempts": attempts,
            "urls_discovered": new_urls,
            "wall_sec": round(wall, 2),
            "urls_per_sec": round(attempts / wall, 1),
        }
    finally:
        spark.stop()


def crawl_bench_subprocess(cpus: int, **kw) -> dict:
    """Run crawl_bench in a fresh process (fresh JVM — no cross-run JIT or
    page-cache warmth biasing the comparison)."""
    import subprocess

    args = ", ".join(f"{k}={v}" for k, v in kw.items())
    code = (
        "import json; from bench import crawl_bench; "
        f"print(json.dumps(crawl_bench({cpus}, {args})))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)), check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def dedup_bench(spark, n_keys: int = 2_000_000) -> dict:
    """Frontier-dedup throughput: bloom build + membership over n_keys."""
    from pyspark.sql import functions as F

    from bitextor_spark.frontier import seen as seen_mod

    n_shards, m_bits, k = CPUS, 1 << 24, 5
    inserted = spark.range(n_keys).select(F.xxhash64("id").alias("url_hash"))
    t0 = time.time()
    blooms = seen_mod.update_blooms(
        seen_mod.empty_blooms(spark, n_shards, m_bits), inserted,
        n_shards, m_bits, k,
    ).localCheckpoint()
    build_sec = time.time() - t0
    probes = spark.range(n_keys, 2 * n_keys).select(
        F.xxhash64("id").alias("url_hash")
    )
    t0 = time.time()
    n_maybe = (
        seen_mod.flag_maybe_seen(probes, blooms, n_shards, m_bits, k)
        .filter("maybe_seen").count()
    )
    probe_sec = time.time() - t0
    return {
        "n_keys": n_keys,
        "build_sec": round(build_sec, 2),
        "probe_sec": round(probe_sec, 2),
        "build_keys_per_sec": round(n_keys / build_sec, 1),
        "probe_keys_per_sec": round(n_keys / probe_sec, 1),
        "false_positives": n_maybe,
    }


def write_report(result: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    lines = [
        "# BENCH/BASELINE — measured numbers",
        "",
        f"sf dir: `{result['sf']}` · headline cpus: {CPUS}",
        "",
        "## Headline operator queries (seconds, noop-sink materialization)",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    for k, v in sorted(result["queries"].items(), key=lambda kv: -kv[1]):
        lines.append(f"| {k} | {v} |")
    lines += ["", f"**total: {result['value']} s**", ""]
    if "crawl" in result:
        c = result["crawl"]
        lines += [
            "## Crawl engine scaling (same world, two parallelism levels)",
            "",
            "| cores | epochs | fetch attempts | urls discovered | wall s | urls/s |",
            "|---|---|---|---|---|---|",
        ]
        for r in c["runs"]:
            lines.append(
                f"| {r['cpus']} | {r['epochs']} | {r['fetch_attempts']} | "
                f"{r['urls_discovered']} | {r['wall_sec']} | {r['urls_per_sec']} |"
            )
        lines += [
            "",
            f"**scaling efficiency {c['n_low']}→{c['n_high']} cores: "
            f"{c['efficiency']}** (target ≥ 0.8; efficiency = "
            "(thr_4N/thr_N)/(4N/N))",
            "",
        ]
    if "dedup" in result:
        d = result["dedup"]
        lines += [
            "## Frontier-dedup (bloom shard) throughput",
            "",
            f"- build: {d['build_keys_per_sec']:,} keys/s over {d['n_keys']:,} keys",
            f"- probe: {d['probe_keys_per_sec']:,} keys/s "
            f"({d['false_positives']} false positives of {d['n_keys']:,})",
            "",
        ]
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write("\n".join(lines))


def main() -> None:
    from bitextor_spark.session import get_spark

    sf_label = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    queries = run_headline(spark)
    dedup = dedup_bench(spark)
    spark.stop()

    result = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_label,
        "dedup": dedup,
    }

    if DO_SCALING:
        # N→4N pair chosen below the single-box DRAM-bandwidth ceiling
        # (local[32] threads share one memory bus — not a proxy for 4
        # separate executors); plus a peak run at all cores.
        n_low = max(CPUS // 16, 1)
        n_high = n_low * 4
        kw = dict(n_pages=1_000_000, n_hosts=3000, n_seeds=200_000,
                  max_epochs=2)
        runs = [
            crawl_bench_subprocess(n_low, **kw),
            crawl_bench_subprocess(n_high, **kw),
            crawl_bench_subprocess(CPUS, **kw),
        ]
        thr_low, thr_high = runs[0]["urls_per_sec"], runs[1]["urls_per_sec"]
        eff = (thr_high / thr_low) / (n_high / n_low)
        result["crawl"] = {
            "runs": runs,
            "n_low": n_low,
            "n_high": n_high,
            "efficiency": round(eff, 3),
            "peak_urls_per_sec": runs[-1]["urls_per_sec"],
        }

    write_report(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
