"""Deterministic synthetic web worlds (FIXTURES.md §2-§4).

Two generators:

- ``small_world(WorldConfig)`` — driver-side Python objects used by BOTH
  the reference simulator and the Spark engine parity tests. Exercises the
  full semantic surface: messy URLs (canonicalization dedup), a mega-host
  (skew), cross-host links in/out of seed scope, blacklisted platforms,
  mailto/js schemes, >max_path_depth paths, pathological segment repeats,
  robots disallow prefixes + Crawl-delay spread (incl. >300 s clamp),
  5xx pages (retry policy), and per-host BFS fan-out.

- ``spark_world(spark, n_pages, ...)`` — a distributed generator built
  from ``spark.range`` + JVM expressions only (no driver materialization),
  for throughput benchmarks at millions of pages over a 10^10 virtual URL
  space.

No external data; everything derives from the seed.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitextor_spark.config import WorldConfig


@dataclass
class Page:
    url_canon: str
    host: str
    outlinks: list[str]
    image_id: str | None
    fetch_ms: int
    status: int


@dataclass
class World:
    pages: dict[str, Page]  # keyed by url_canon
    robots: dict[str, tuple[int, list[str]]]  # host -> (crawl_delay_s, disallow)
    seeds: list[str]  # messy, non-canonical on purpose
    cfg: WorldConfig = field(default_factory=WorldConfig)
    # mid-crawl robots changes (server side): host -> sorted
    # [(valid_from_ms, crawl_delay_s)]. The server's answer at virtual time
    # t is the last version with valid_from_ms <= t (initial = robots[h]).
    # Only observed by crawlers running with cfg.robots_ttl_ms set.
    robots_updates: dict[str, list[tuple[int, int]]] = field(
        default_factory=dict
    )


def server_crawl_delay(world: "World", host: str, t_ms: int) -> int:
    """What the host's robots.txt serves at virtual time t_ms."""
    delay, _ = world.robots.get(host, (0, []))
    for valid_from, new_delay in world.robots_updates.get(host, ()):
        if valid_from <= t_ms:
            delay = new_delay
    return delay


def _messy(rng: random.Random, canon: str) -> str:
    """Decorate a canonical URL so canonicalization has work to do."""
    scheme, rest = canon.split("://", 1)
    host, _, path = rest.partition("/")
    path = "/" + path
    r = rng.random()
    if r < 0.2:
        host = "www." + host
    elif r < 0.3:
        host = host.upper()
    elif r < 0.4:
        host = host + ":80" if scheme == "http" else host
    if rng.random() < 0.25:
        sep = "&" if "?" in path else "?"
        path += f"{sep}PHPSESSID={rng.randrange(1 << 30):x}"
    if rng.random() < 0.2:
        path += "#frag" + str(rng.randrange(100))
    if rng.random() < 0.15:
        scheme = scheme.upper()
    return f"{scheme}://{host}{path}"


def small_world(cfg: WorldConfig | None = None) -> World:
    cfg = cfg or WorldConfig()
    rng = random.Random(cfg.seed)

    hosts = []
    for i in range(cfg.n_hosts):
        if i == 0:
            hosts.append("mega.ex0.com")
        elif i % 7 == 3:
            hosts.append(f"site{i}.ex{i}.co.uk")
        elif i % 5 == 2:
            hosts.append(f"blog.site{i}.ex{i}.com")  # subdomain, same reg-domain
        else:
            hosts.append(f"site{i}.ex{i}.com")

    # page allocation: mega host gets mega_host_frac of all pages
    n_mega = int(cfg.n_pages * cfg.mega_host_frac)
    alloc: list[tuple[str, int]] = []
    for i, h in enumerate(hosts):
        if i == 0:
            alloc.append((h, n_mega))
        else:
            rest = cfg.n_pages - n_mega
            alloc.append((h, max(2, rest // (cfg.n_hosts - 1))))

    # robots: varied crawl delays incl. 0 and >300s (clamp case); disallow
    robots: dict[str, tuple[int, list[str]]] = {}
    for i, h in enumerate(hosts):
        delay = [0, 0, 1, 2, 5, 400][i % 6]
        disallow = ["/private"] if i % 3 == 0 else []
        robots[h] = (delay, disallow)

    # canonical URL space per host
    host_urls: dict[str, list[str]] = {}
    for h, n in alloc:
        urls = []
        for k in range(n):
            if k % 11 == 7:
                path = f"/a/b/p{k}.html"  # nested
            elif k % 13 == 9:
                path = f"/private/p{k}.html"  # robots-disallowed on some hosts
            else:
                path = f"/p{k}.html"
            urls.append(f"http://{h}{path}")
        host_urls[h] = urls

    all_hosts = list(host_urls)
    pages: dict[str, Page] = {}
    img_counter = 0
    for hi, h in enumerate(all_hosts):
        urls = host_urls[h]
        for k, u in enumerate(urls):
            outlinks: list[str] = []
            # same-host BFS fan-out (relative + messy absolute)
            fan = rng.randint(1, cfg.mean_outlinks)
            for _ in range(fan):
                tgt = urls[rng.randrange(len(urls))]
                if rng.random() < 0.5:
                    outlinks.append(tgt.rsplit("/", 1)[1])  # relative
                else:
                    outlinks.append(_messy(rng, tgt))
            # duplicates of the same target under different spellings
            if rng.random() < 0.3:
                tgt = urls[rng.randrange(len(urls))]
                outlinks.append(_messy(rng, tgt))
                outlinks.append(_messy(rng, tgt))
            # cross-host (some in seed scope, some not)
            if rng.random() < 0.35:
                oh = all_hosts[rng.randrange(len(all_hosts))]
                outlinks.append(_messy(rng, host_urls[oh][rng.randrange(len(host_urls[oh]))]))
            # off-scope noise
            if rng.random() < 0.25:
                outlinks.append(
                    rng.choice(
                        [
                            "mailto:someone@example.com",
                            "javascript:void(0)",
                            "http://www.facebook.com/share?u=1",
                            "http://cool.blogspot.com/post1",
                            "http://x.wordpress.com/p",
                            "ftp://files.ex.com/f.zip",
                            "http://" + h + "/" + "/".join(["d"] * 25) + "/deep.html",
                            "http://" + h + "/x/x/x/rep.html",
                        ]
                    )
                )
            # transclusion: off-seed-domain embed (ACCEPT TransclusionDecideRule)
            if rng.random() < 0.2:
                outlinks.append(f"http://cdn.exnet99.net/img{rng.randrange(20)}.png")
            if rng.random() < 0.08:
                # embed CHAIN head: a css that itself embeds further resources
                outlinks.append(f"http://cdn.exnet99.net/style{rng.randrange(4)}.css")
            # custom REJECT regex list (archives are never crawled)
            if rng.random() < 0.12:
                outlinks.append(f"http://{h}/files/archive{rng.randrange(30)}.zip")
            # prerequisite: robots.txt is fetchable even on blacklisted hosts
            if rng.random() < 0.06:
                outlinks.append(
                    rng.choice(
                        [f"http://{h}/robots.txt",
                         "http://www.facebook.com/robots.txt"]
                    )
                )
            status = 500 if rng.random() < cfg.fail_frac else 200
            image_id = None
            if rng.random() < cfg.image_frac:
                image_id = f"img_{img_counter:08d}"
                img_counter += 1
            pages[u] = Page(
                url_canon=u,
                host=h,
                outlinks=outlinks,
                image_id=image_id,
                fetch_ms=rng.randint(50, 2000),
                status=status,
            )

    # deterministic prerequisite-on-blacklisted-host case: the first page of
    # host 1 (always seeded) links a blacklisted platform's robots.txt —
    # PrerequisiteAcceptDecideRule must admit it despite the blacklist
    if len(all_hosts) > 1:
        pages[host_urls[all_hosts[1]][0]].outlinks.append(
            "http://www.facebook.com/robots.txt"
        )

    # embed-chain pages on the off-seed-domain CDN host: css (trans hop 1)
    # embeds a png (hop 2, still accepted at maxTransHops=2) which embeds a
    # gif (hop 3, rejected) — exercises the transclusion chain boundary.
    for j in range(4):
        pages[f"http://cdn.exnet99.net/style{j}.css"] = Page(
            url_canon=f"http://cdn.exnet99.net/style{j}.css",
            host="cdn.exnet99.net",
            outlinks=[f"http://cdn.exnet99.net/deep{j}.png"],
            image_id=None, fetch_ms=100 + j, status=200,
        )
        pages[f"http://cdn.exnet99.net/deep{j}.png"] = Page(
            url_canon=f"http://cdn.exnet99.net/deep{j}.png",
            host="cdn.exnet99.net",
            outlinks=[f"http://cdn.exnet99.net/toodeep{j}.gif"],
            image_id=None, fetch_ms=100 + j, status=200,
        )

    # https-only host (C2): its pages exist only under https, but the seed
    # list carries the http spelling — the bootstrap must fall back
    sec_host = "secure.exsec.com"
    for k in range(3):
        u = f"https://{sec_host}/p{k}.html"
        pages[u] = Page(
            url_canon=u, host=sec_host,
            outlinks=[f"https://{sec_host}/p{(k + 1) % 3}.html"],
            image_id=None, fetch_ms=120 + k, status=200,
        )
    robots[sec_host] = (0, [])

    # seeds: first page of ~60% of hosts, messy on purpose
    seed_hosts = [h for i, h in enumerate(all_hosts) if i % 5 != 4]
    seeds = [_messy(rng, host_urls[h][0]) for h in seed_hosts]
    seeds.append(f"http://{sec_host}/p0.html")  # dead-http seed (C2)
    return World(pages=pages, robots=robots, seeds=sorted(seeds), cfg=cfg)


# ---------------------------------------------------------------------------
# Spark-side DataFrames of the same world (for the engine).
# ---------------------------------------------------------------------------

def world_to_dfs(
    spark: SparkSession, world: World, with_images: bool = False
) -> dict[str, DataFrame]:
    pages_rows = [
        (p.url_canon, p.host, p.outlinks, p.image_id, p.fetch_ms, p.status)
        for p in world.pages.values()
    ]
    pages = spark.createDataFrame(
        pages_rows,
        "url_canon string, host string, outlinks array<string>, "
        "image_id string, fetch_ms int, status int",
    )
    robots = spark.createDataFrame(
        [(h, d, dis) for h, (d, dis) in world.robots.items()],
        "host string, crawl_delay_s int, disallow_prefixes array<string>",
    )
    seeds = spark.createDataFrame(
        [(u, i) for i, u in enumerate(world.seeds)], "seed_url string, seed_id int"
    )
    out = {"pages": pages, "robots": robots, "seeds": seeds}
    # versioned robots timeline for TTL-mode crawls (valid_from_ms=0 rows
    # are the initial rules; later rows are mid-crawl server-side changes)
    version_rows = [(h, 0, d) for h, (d, _) in world.robots.items()] + [
        (h, vf, d)
        for h, ups in world.robots_updates.items()
        for vf, d in ups
    ]
    out["robots_versions"] = spark.createDataFrame(
        version_rows, "host string, valid_from_ms long, crawl_delay_s int"
    )
    if with_images:
        from bitextor_spark.functions.images import make_image_row

        rows = [
            tuple(make_image_row(p.image_id, salt=world.cfg.seed).values())
            for p in world.pages.values()
            if p.image_id is not None
        ]
        out["images"] = spark.createDataFrame(
            rows,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long",
        )
    return out


def spark_world(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = 1000,
    mega_host_frac: float = 0.3,
    mean_outlinks: int = 12,
    seed: int = 42,
    n_seeds: int | None = None,
    with_images: bool = False,
) -> dict[str, DataFrame]:
    """Distributed synthetic world for benchmarks — pure JVM expressions.

    URL space is virtual: page i lives on a host drawn from a skewed
    distribution (host 0 holds ``mega_host_frac``), links are generated from
    a seeded hash of (i, j) so the graph is deterministic without any
    driver-side materialization. Scales to 10^8+ pages on a cluster; the
    10^10 frontier is this same generator with a wider id range.
    """
    mega = int(1.0 / max(mega_host_frac, 1e-9))

    def host_idx_of(idc):
        # deterministic host assignment; host 0 is the mega-host
        r = F.xxhash64(idc, F.lit(seed))
        return F.when(F.pmod(r, F.lit(mega)) == 0, F.lit(0)).otherwise(
            F.pmod(F.xxhash64(r), F.lit(n_hosts - 1)) + 1
        )

    def url_of(idc):
        # URL derives from the target's own host so outlinks/seeds resolve
        return F.concat(
            F.lit("http://h"), host_idx_of(idc), F.lit(".bench.com/p"),
            idc, F.lit(".html"),
        )

    df = (
        spark.range(n_pages)
        .withColumn("_r", F.xxhash64(F.col("id"), F.lit(seed)))
        .withColumn("host", F.concat(F.lit("h"), host_idx_of(F.col("id")), F.lit(".bench.com")))
        .withColumn("url_canon", url_of(F.col("id")))
        .withColumn(
            "outlinks",
            F.transform(
                F.sequence(F.lit(1), F.lit(mean_outlinks)),
                lambda j: url_of(F.pmod(F.xxhash64(F.col("id"), j), F.lit(n_pages))),
            ),
        )
        .withColumn("image_id", F.concat(F.lit("img_"), F.col("id")))
        .withColumn("fetch_ms", (F.pmod(F.col("_r"), F.lit(1950)) + 50).cast("int"))
        .withColumn(
            "status",
            F.when(F.pmod(F.xxhash64("_r", F.lit(7)), F.lit(25)) == 0, 500)
            .otherwise(200),
        )
        .select("url_canon", "host", "outlinks", "image_id", "fetch_ms", "status")
    )
    robots = (
        spark.range(n_hosts)
        .withColumn("host", F.concat(F.lit("h"), F.col("id"), F.lit(".bench.com")))
        .withColumn("crawl_delay_s", F.pmod("id", F.lit(4)).cast("int"))
        .withColumn("disallow_prefixes", F.array().cast("array<string>"))
        .select("host", "crawl_delay_s", "disallow_prefixes")
    )
    n_seeds = min(n_pages, n_seeds or 1000)
    seeds = (
        spark.range(n_seeds)
        .withColumn("seed_url", url_of(F.col("id")))
        .withColumn("seed_id", F.col("id").cast("int"))
        .select("seed_url", "seed_id")
    )
    out = {"pages": df, "robots": robots, "seeds": seeds}
    if with_images:
        # Distributed image synthesis: one input_hint-shaped row per page,
        # fully determined by (image_id, seed) — the same generator the
        # engine's verify wave regenerates its reference from, so the
        # packaged crawl can exercise the M4 payload gate end to end.
        from bitextor_spark.functions.images import make_image_row

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                yield pd.DataFrame(
                    [make_image_row(i, salt=seed) for i in pdf["image_id"]]
                )

        out["images"] = df.select("image_id").mapInPandas(
            gen,
            "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long",
        )
    return out
