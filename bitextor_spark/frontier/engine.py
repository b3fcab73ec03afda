"""The distributed frontier engine — wave-based crawl as DataFrame plans.

One epoch = one Spark job pipeline:

  queued frontier ──(per-host top-k prefix)──► schedulable candidates
     ⋈ pages (status/duration)  ⋈ robots (broadcast)  ⋈ host_state
     ──repartition(host)+sort, mapInArrow(politeness walk)──► fetch events
     ──window(order by start,host,url)──► fetch_log seq (exact order)
     events ⋈ pages.outlinks ──mapInArrow flat resolver──► raw links
     (RE2-classified in-batch: resolve+canonicalize+explode+page dedup)
     ──scope rules (JVM exprs) + ONE groupBy(url)──► first-discoverer
     winner, in-scope dupe count, per-host reject count (fused pass)
     ──bloom prefilter (broadcast probe under the size gate, cogrouped
     Arrow above it) + base-presence left join + delta anti-join──►
     admitted (pinned once; the commit writes branch off it)
     ──► frontier ∪ admitted ; snapshot commit (atomic manifest);
     per-host metrics written BEHIND the commit (one tagged-union agg,
     staged on a side thread, registered at the next commit)

Parallelism-independence: every nondeterministic boundary is closed by an
explicit total order — per-host queue order (hop, url_canon), global fetch
order (fetch_start_ms, host, url_canon), discoverer rank for lineage
(fetch_start_ms, disc host, disc url). The same crawl therefore produces
byte-identical fetch logs at local[1] and local[32] — evidenced against
the single-threaded simulator in tests/test_frontier_parity.py.

Skew: the per-host top-k prefix bounds any mega-host's contribution to an
epoch at the politeness ceiling (window_ms / min_delay + retries), so the
walk's host segment for the hottest host is O(hundreds) of rows no matter
how many billions of its URLs are queued; the bloom shards are uniform by
url-hash. Frontier state lives in snapshot tables (sources/snapshots.py);
every epoch is resumable (kill → rerun uncommitted epoch, identical by the
virtual clock).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bitextor_spark.config import CrawlConfig
from bitextor_spark.frontier import seen as seen_mod
from bitextor_spark.frontier.politeness import schedule_host_arrays
from bitextor_spark.plans.scope import apply_scope
from bitextor_spark.plans.topk import per_key_topk_passthrough
from bitextor_spark.functions.urls import (
    canonicalize_full_udf,
    make_flat_resolver,
)
from bitextor_spark.sources.snapshots import SnapshotCatalog

FRONTIER_SCHEMA = (
    "url_hash long, url_canon string, host string, hop int, seed_id int, "
    "state string, retry_count int, not_before_ms long, discovered_epoch int, "
    "trans_hops int, priority double, updated_epoch int"
)
EVENT_SCHEMA = (
    "url_hash long, url_canon string, host string, hop int, seed_id int, "
    "retry_count int, fetch_start_ms long, fetch_ms int, status int, "
    "outcome string, new_next_allowed long, trans_hops int, priority double, "
    "not_before_ms long, discovered_epoch int"
)
HOST_STATE_SCHEMA = "host string, next_allowed_ms long"
# max over-k_cap hosts handled via the driver-side isin prefix filter; more
# than this falls back to the full skew-proof per-host rank (bounded driver
# memory, same discipline as the delta broadcast gate)
_HOT_HOST_GATE = 1024
ROBOTS_STATE_SCHEMA = "host string, crawl_delay_s int, fetched_ms long"
METRIC_COLS = ("fetched", "errors", "skipped_seen", "skipped_scope", "queued")


def _host_col(url_col):
    # try_: Spark 4's plain parse_url THROWS on URLs java.net.URI rejects
    return F.try_parse_url(url_col, F.lit("HOST"))


def _parquet_rows(path: str) -> int:
    """Row count of a staged parquet directory from its file footers —
    driver-side metadata reads, no Spark job. (On an object store this
    becomes a manifest/footer listing; same O(files) cost.)"""
    import glob
    import os as _os

    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(_os.path.join(path, "*.parquet"))
    )


@dataclass
class EpochStats:
    epoch: int
    fetched: int
    attempts: int
    new_urls: int
    queued_remaining: int


class FrontierEngine:
    """Drives the crawl loop over snapshot-table state."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: CrawlConfig,
        catalog_root: "str | Any",
        pages: DataFrame,
        robots: DataFrame,
        seeds: DataFrame,
        use_bloom: bool = True,
        images: DataFrame | None = None,
        verify_payloads: bool = False,
        robots_versions: DataFrame | None = None,
    ):
        self.spark = spark
        self.cfg = cfg
        # storage seam: a path gets the filesystem manifest catalog; any
        # object implementing the same interface (TableCatalog /
        # IcebergCatalog in sources/catalogs.py) swaps the backend without
        # touching the engine
        self.catalog = (
            SnapshotCatalog(catalog_root)
            if isinstance(catalog_root, str)
            else catalog_root
        )
        self.robots = robots.cache()
        # versioned robots timeline (host, valid_from_ms, crawl_delay_s)
        # for TTL-mode crawls; per-epoch reads are semi-joined down to the
        # epoch's active hosts, never scanned whole into the driver
        self.robots_versions = (
            robots_versions.cache() if robots_versions is not None else None
        )
        self.seeds = seeds
        self.use_bloom = use_bloom
        # image+caption payload table (input_hint shape); verified per fetch
        # wave in Arrow batches when verify_payloads is on (M4 invariant)
        self.images = images.cache() if images is not None else None
        self.verify_payloads = verify_payloads and images is not None
        # pages is the fetch target: co-partition AND co-sort once by
        # url_canon so the per-epoch fetch/discovery sort-merge joins reuse
        # this cached layout — no exchange and no re-sort of the (static,
        # world-sized) pages side per epoch; only the O(candidates) probe
        # side shuffles.
        self.pages = (
            pages.repartition(
                spark.conf.get("spark.sql.shuffle.partitions", None) and
                int(spark.conf.get("spark.sql.shuffle.partitions")) or 32,
                "url_canon",
            )
            .sortWithinPartitions("url_canon")
            .cache()
        )
        self._is_local = spark.sparkContext.master.startswith("local")
        # Catalyst constraint propagation is superlinear in plan width and
        # the epoch DAG is ~200 operators of driver-side analysis per
        # epoch; disabling it is semantics-neutral (it only ADDS inferred
        # filters) and measured ~7% off the 3-epoch bench-world crawl wall
        # (interleaved 16-core A/B, r5). Session-wide runtime conf — set
        # it back after construction to override.
        try:
            spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
        except Exception:
            pass
        self._epoch_pins: list[DataFrame] = []
        self._bloom_bcast = None  # per-compaction flag broadcast cache
        self._bloom_bcast_future = None  # in-flight post-compaction rebuild
        # (path, future, pins) of a metrics delta written behind its
        # epoch's commit; registered at the next commit or flushed
        self._pending_metrics = None

    def _pin(self, df: DataFrame, columnar: bool = False) -> DataFrame:
        """Eagerly materialize an epoch intermediate, tracked for cleanup.

        local mode: localCheckpoint — eager, cheap, single-JVM-safe —
        unless ``columnar`` asks for a prunable cache (wide tables whose
        consumers read few columns: the InMemoryRelation serves pruned
        batches, an RDD checkpoint always deserializes full rows).
        Cluster mode: persist + count — keeps lineage, so executor loss or
        dynamic-allocation decommission recomputes instead of failing (a
        localCheckpoint block is unreplicated and non-recomputable)."""
        if self._is_local and not columnar:
            out = df.localCheckpoint()
        else:
            out = df.persist()
            out.count()
        self._epoch_pins.append(out)
        return out

    def _release_pins(self) -> None:
        """Free the epoch's materialized blocks immediately after commit
        rather than waiting for GC + ContextCleaner (a 50-epoch crawl would
        otherwise accumulate checkpoint blocks nondeterministically)."""
        for df in self._epoch_pins:
            try:
                df.unpersist()
            except Exception:
                pass
        self._epoch_pins = []

    def _bloom_gate_ok(self) -> bool:
        cfg = self.cfg
        total = cfg.num_host_shards * (cfg.bloom_bits_per_shard // 8)
        return total <= cfg.bloom_broadcast_bytes

    def _bloom_flag_broadcast(self):
        """Broadcast of the folded bloom shard blobs for the narrow flag
        pass, rebuilt once per COMPACTION (the only event that changes the
        base bitmaps — between compactions admissions live in the
        bloom_pending delta, which the admission path anti-joins exactly).
        Returns None when the total bitmap size exceeds
        ``cfg.bloom_broadcast_bytes`` (north-star multi-GB bitmaps): the
        cogrouped-Arrow flag path runs instead.

        The collect+broadcast never lands on the epoch's serial path: it
        prebuilds at bootstrap, and after a compaction a background thread
        rebuilds it while the next epoch's candidate/walk/discovery phases
        run (the flag pass, its only consumer, comes late in the epoch)."""
        if not self._bloom_gate_ok():
            return None
        if self._bloom_bcast is None and self._bloom_bcast_future is not None:
            self._bloom_bcast = self._bloom_bcast_future.result()
            self._bloom_bcast_future = None
        if self._bloom_bcast is None:
            self._bloom_bcast = seen_mod.broadcast_blooms(
                self.spark, self._load("blooms")
            )
        return self._bloom_bcast

    def _rebuild_bloom_broadcast_async(self) -> None:
        """Kick off the post-compaction broadcast rebuild off-thread."""
        if not self._bloom_gate_ok():
            return
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=1)
        self._bloom_bcast_future = pool.submit(
            seen_mod.broadcast_blooms, self.spark, self._load("blooms")
        )
        pool.shutdown(wait=False)

    def _invalidate_bloom_broadcast(self) -> None:
        if self._bloom_bcast_future is not None:
            try:
                self._bloom_bcast_future.result().destroy()
            except Exception:
                pass
            self._bloom_bcast_future = None
        if self._bloom_bcast is not None:
            try:
                self._bloom_bcast.destroy()
            except Exception:
                pass
            self._bloom_bcast = None

    # ------------------------------------------------------------------ #
    # bootstrap / resume                                                  #
    # ------------------------------------------------------------------ #

    def bootstrap(self) -> None:
        """Seed the frontier (epoch 0) unless a snapshot already exists."""
        # materialize the fetch-target cache here, outside the crawl loop:
        # synthesizing/caching the world is setup, not crawl work
        self.pages.count()
        if self.catalog.latest_snapshot_id() is not None:
            if self.use_bloom:
                self._rebuild_bloom_broadcast_async()  # resume: warm off-epoch
            return
        cfg = self.cfg
        # materialize the (tiny) seed pipeline once: every downstream action
        # would otherwise re-run the canonicalize/reg-domain UDF fan-out.
        # One fused Arrow UDF = one python round-trip per task.
        s = (
            self.seeds.withColumn("_c", canonicalize_full_udf("seed_url"))
            .select("seed_id", "seed_url", "_c.url_canon", "_c.host", "_c.reg_domain")
            .filter(F.col("url_canon").isNotNull())
        ).localCheckpoint()
        # C2 https fallback (utils/common.py:155-181): a dead http seed
        # whose https twin resolves bootstraps as https. Two probes against
        # the co-partitioned pages cache; bootstrap-only cost.
        page_urls = self.pages.select("url_canon")
        https_twin = F.concat(
            F.lit("https://"), F.substring("url_canon", len("http://") + 1, 1 << 30)
        )
        s = (
            s.join(
                page_urls.withColumn("_live", F.lit(True)), "url_canon", "left"
            )
            .withColumn(
                "_twin",
                F.when(
                    F.col("url_canon").startswith("http://")
                    & ~F.coalesce("_live", F.lit(False)),
                    https_twin,
                ),
            )
            .join(
                page_urls.select(F.col("url_canon").alias("_twin"))
                .withColumn("_twin_live", F.lit(True)),
                "_twin",
                "left",
            )
            .select(
                "seed_id",
                "seed_url",
                F.when(
                    F.coalesce("_twin_live", F.lit(False)), F.col("_twin")
                ).otherwise(F.col("url_canon")).alias("url_canon"),
                "host",
                "reg_domain",
            )
        ).localCheckpoint()
        seed_domains = s.select("reg_domain").distinct().localCheckpoint()
        scoped = apply_scope(
            s.withColumn("hop", F.lit(0)), seed_domains, self.robots, cfg
        ).filter(F.col("in_scope"))
        w = Window.partitionBy("url_canon").orderBy("seed_id")
        frontier = (
            scoped.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.xxhash64("url_canon").alias("url_hash"),
                "url_canon",
                "host",
                F.lit(0).alias("hop"),
                F.col("seed_id").cast("int"),
                F.lit("QUEUED").alias("state"),
                F.lit(0).alias("retry_count"),
                F.lit(0).cast("long").alias("not_before_ms"),
                F.lit(0).alias("discovered_epoch"),
                F.lit(0).alias("trans_hops"),
                F.lit(1.0).alias("priority"),
                F.lit(0).alias("updated_epoch"),
            )
        ).localCheckpoint()  # reused by host_state, blooms, commit, count
        host_state = frontier.select("host").distinct().withColumn(
            "next_allowed_ms", F.lit(0).cast("long")
        )
        replace = {"frontier": frontier, "host_state": host_state,
                   "seed_domains": seed_domains}
        if self.use_bloom:
            blooms = seen_mod.update_blooms(
                seen_mod.empty_blooms(self.spark),
                frontier.select("url_hash"),
                cfg.num_host_shards, cfg.bloom_bits_per_shard,
                cfg.bloom_num_hashes,
            )
            replace["blooms"] = blooms
        self.catalog.commit(
            replace=replace,
            meta={"epoch": 0, "total_fetched": 0, "seq_offset": 0,
                  "queued": (n_seeds := frontier.count()),
                  "frontier_rows": n_seeds, "done": False},
        )
        if self.use_bloom:
            # prebuild the flag broadcast at setup time so epoch 0 never
            # pays the collect on its serial path
            self._rebuild_bloom_broadcast_async()

    def _with_global_seq(
        self, events: DataFrame, n_events: int, seq_offset: int
    ) -> DataFrame:
        """Exact 0-based global sequence by (fetch_start_ms, host,
        url_canon) via the shared scale-safe ranking (plans/ordering.py:
        range-repartition → local rank → cumulative offsets; plain window
        only below the inspection-scale threshold)."""
        from bitextor_spark.plans.ordering import global_row_number

        keys = [F.col("fetch_start_ms"), F.col("host"), F.col("url_canon")]
        return global_row_number(
            events, keys, seq_col="seq", offset=seq_offset - 1,
            small_threshold=50_000, n_rows=n_events, pin=self._pin,
        )

    def _verify_payloads(self, events: DataFrame) -> DataFrame:
        """Per-row payload invariant (M4): decode image bytes in Arrow
        batches and compare with the regenerated reference — exact pixels
        for png, PSNR ≥ threshold for lossy — plus caption equality.
        (functions/images.py; reference-decode semantics per input_hint)."""
        from bitextor_spark.functions.images import verify_image_batch

        cfg = self.cfg
        salt = cfg.seed
        thr = cfg.psnr_threshold_db
        fetched = events.filter(
            (F.col("outcome") == "FETCHED")
            & (F.col("status") >= 200) & (F.col("status") < 300)
        ).select("url_hash", "url_canon")
        payloads = (
            fetched.join(
                self.pages.select("url_canon", "image_id"), "url_canon"
            )
            .filter(F.col("image_id").isNotNull())
            .join(self.images, "image_id")
            .select("url_hash", "image_id", "bytes", "fmt", "caption")
        )

        def verify(batches):
            for pdf in batches:
                bo, co = verify_image_batch(
                    pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["caption"],
                    salt=salt, psnr_threshold=thr,
                )
                yield pd.DataFrame(
                    {"url_hash": pdf["url_hash"], "bytes_ok": bo,
                     "caption_ok": co}
                )

        return payloads.mapInPandas(
            verify, "url_hash long, bytes_ok boolean, caption_ok boolean"
        )

    # explicit read schemas: every schema-less spark.read.parquet costs a
    # footer-inference job — a per-epoch fixed cost (the epoch reads 5+
    # state tables) that never parallelizes with cores
    _TABLE_SCHEMAS = {
        "frontier": FRONTIER_SCHEMA,
        "frontier_delta": FRONTIER_SCHEMA,
        "host_state": HOST_STATE_SCHEMA,
        "host_state_delta": HOST_STATE_SCHEMA,
        "robots_state": ROBOTS_STATE_SCHEMA,
        "robots_state_delta": ROBOTS_STATE_SCHEMA,
        "seed_domains": "reg_domain string",
        "blooms": seen_mod.BLOOM_SCHEMA,
        "bloom_pending": "url_hash long",
        "fetch_log": EVENT_SCHEMA + ", epoch int",
        "metrics": (
            "epoch int, host string, fetched bigint, errors bigint, "
            "failed bigint, skipped_seen bigint, skipped_scope bigint, "
            "queued bigint"
        ),
    }

    def _load(self, name: str) -> DataFrame:
        df = self.catalog.read(
            self.spark, name, schema=self._TABLE_SCHEMAS.get(name)
        )
        assert df is not None, f"missing state table {name}"
        if name == "frontier":
            # forward migration: snapshots committed before the trans_hops/
            # priority columns existed read them as NULL under the explicit
            # schema — resume with the schema defaults
            df = (
                df.withColumn(
                    "trans_hops",
                    F.coalesce("trans_hops", F.lit(0)).cast("int"),
                )
                .withColumn("priority", F.coalesce("priority", F.lit(1.0)))
                .withColumn(
                    "updated_epoch",
                    F.coalesce("updated_epoch", F.lit(0)).cast("int"),
                )
            )
        return df

    def meta(self) -> dict[str, Any]:
        m = self.catalog.load_manifest()
        return m["meta"] if m else {}

    # ------------------------------------------------------------------ #
    # merge-on-read frontier views (Iceberg MOR model)                    #
    #                                                                     #
    # The frontier is stored as a compacted BASE (replace table) plus     #
    # per-epoch DELTAS (append table) holding only changed+new rows       #
    # stamped with updated_epoch. Nothing ever rewrites O(frontier) per   #
    # epoch; reads resolve latest-wins. State transitions are monotone    #
    # (QUEUED -> terminal, never back), which the views exploit:          #
    #  - presence (the URL-seen anti-join) needs NO merge: any version    #
    #    proves membership;                                               #
    #  - the base is single-version by construction (compaction output),  #
    #    so latest-wins only ever runs over the DELTA LOG — the big side  #
    #    contributes one anti-join against the deltas' key set, which is  #
    #    broadcast while the tracked delta row count stays under          #
    #    cfg.delta_broadcast_rows (no AQE dependence), shuffle beyond;    #
    #  - host politeness cursors only grow, so the host view is a plain   #
    #    max() — a CRDT-style merge, no versioning needed.                #
    # Every cfg.frontier_compact_epochs the base is rewritten and the     #
    # deltas dropped, bounding read amplification.                        #
    # ------------------------------------------------------------------ #

    def _deltas(self, name: str) -> DataFrame | None:
        return self.catalog.read(
            self.spark, name, schema=self._TABLE_SCHEMAS[name]
        )

    @staticmethod
    def _latest_wins(df: DataFrame) -> DataFrame:
        """One row per url_hash: the version with the highest updated_epoch
        (unique per url_hash by construction — a URL changes at most once
        per epoch). groupBy, not a window: partial map-side aggregation."""
        cols = [c for c in df.columns if c != "url_hash"]
        return (
            df.groupBy("url_hash")
            .agg(F.max_by(F.struct(*cols), "updated_epoch").alias("_w"))
            .select("url_hash", "_w.*")
        )

    def _delta_hint(self, df: DataFrame) -> DataFrame:
        """Broadcast hint for delta-derived key sets, gated by the row
        count the commits track in the manifest meta (reset at compaction)
        — explicit, so it holds with AQE off; dropped past the gate so a
        10^10-scale delta backlog becomes a shuffle join, never a
        multi-GB driver broadcast."""
        n = int(self.meta().get("delta_rows", 0))
        if n <= self.cfg.delta_broadcast_rows:
            return F.broadcast(df)
        return df

    # past this many un-compacted appends the anti-join chain's lineage
    # (K-1 stacked broadcast anti-joins) stops paying for itself; the
    # shuffle groupBy is exact at any K
    _DELTA_CHAIN_MAX_PARTS = 8

    def _delta_latest(self) -> DataFrame | None:
        """Latest version per changed url_hash, or None when no delta log
        exists. run_epoch pins this once (it is O(changes since last
        compaction)) and threads it through every view below — it feeds
        two branches of the candidate DAG plus the discovery anti-join and
        the broadcast build, so recomputing it per consumer multiplies the
        latest-wins cost. EACH per-epoch append is single-version per
        url_hash (a URL changes at most once per epoch, and an epoch's
        attempted and admitted sets are disjoint), so:

        - one append: latest-wins is the identity — return the read;
        - few appends under the broadcast gate: latest = newest append,
          plus each older append anti-joined against the KEYS of all
          newer appends (manifest order IS updated_epoch order) — K-1
          broadcast anti-joins, no shuffle, no sort-aggregate (measured
          ~2x cheaper than the groupBy at the bench's 2M-version log);
        - long log or past `delta_broadcast_rows` (compaction-overdue
          backlog): the shuffle groupBy, exact at any size — the same
          regime split as every other delta key-set decision."""
        m = self.catalog.load_manifest()
        if m is None or "frontier_delta" not in m.get("tables", {}):
            return None
        n_parts = len(m["tables"]["frontier_delta"]["paths"])
        if n_parts <= 1:
            return self._deltas("frontier_delta")
        n_rows = int(m["meta"].get("delta_rows", 0))
        if (n_parts > self._DELTA_CHAIN_MAX_PARTS
                or n_rows > self.cfg.delta_broadcast_rows):
            return self._latest_wins(self._deltas("frontier_delta"))
        parts = self.catalog.read_parts(
            self.spark, "frontier_delta",
            schema=self._TABLE_SCHEMAS["frontier_delta"],
        )
        out = parts[-1]
        newer_keys = parts[-1].select("url_hash")
        for older in parts[-2::-1]:
            out = out.unionByName(
                older.join(F.broadcast(newer_keys), "url_hash", "left_anti")
            )
            newer_keys = newer_keys.unionByName(older.select("url_hash"))
        return out

    def _merge_latest(self, base: DataFrame, latest: DataFrame) -> DataFrame:
        """base (single-version) merged with the latest delta versions.
        The wide groupBy already ran on the (small) delta side; the base
        pays one anti-join against the broadcast-gated changed-key set."""
        unchanged = base.join(
            self._delta_hint(latest.select("url_hash")),
            "url_hash", "left_anti",
        )
        return unchanged.unionByName(latest)

    _AUTO = object()  # sentinel: compute _delta_latest() internally

    def _frontier_view(self, latest: DataFrame | None = _AUTO) -> DataFrame:
        if latest is FrontierEngine._AUTO:
            latest = self._delta_latest()
        base = self._load("frontier")
        if latest is None:
            return base
        return self._merge_latest(base, latest)

    def _queued_view(self, latest: DataFrame | None = _AUTO) -> DataFrame:
        """Current QUEUED rows. The state filter pushes into the base scan;
        changed URLs are represented solely by their latest delta version
        (still-QUEUED retry bumps survive, terminal transitions drop out),
        and a terminal-in-base URL never has a delta version (transitions
        are monotone), so base QUEUED rows minus changed keys is exact."""
        if latest is FrontierEngine._AUTO:
            latest = self._delta_latest()
        q = self._queued_base()
        if latest is None:
            return q
        unchanged = q.join(
            self._delta_hint(latest.select("url_hash")),
            "url_hash", "left_anti",
        )
        return unchanged.unionByName(
            latest.filter(F.col("state") == "QUEUED")
        )

    def _queued_base(self) -> DataFrame:
        """Base-frontier QUEUED rows, hash-partitioned + sorted on
        URL_CANON and persisted ACROSS epochs (same invalidation key as
        _base_urls): the base is immutable between compactions, so the
        epoch's candidate DAG must not pay an O(frontier) exchange every
        epoch. The layout key is url_canon — the SAME key the (static,
        cached) pages table is laid out on — so the per-epoch fetch join
        is exchange-free and sort-free on BOTH sides; the delta anti-join
        on url_hash rides the broadcast hint (delta_broadcast_rows gate),
        which preserves this layout. Past the gate (compaction-overdue
        delta backlog) it degrades to one shuffle — the regime compaction
        resets. Recomputable lineage (persist, not checkpoint)."""
        m = self.catalog.load_manifest()
        key = tuple(m["tables"]["frontier"]["paths"]) if m else None
        cached: tuple | None = getattr(self, "_queued_base_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        if cached is not None:
            try:
                cached[1].unpersist()
            except Exception:
                pass
        n = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        df = (
            self._load("frontier")
            .filter(F.col("state") == "QUEUED")
            .repartition(n, "url_canon")
            .sortWithinPartitions("url_canon")
            .persist()
        )
        self._queued_base_cache = (key, df)
        return df

    def _base_host_counts(self) -> DataFrame:
        """Per-host row count of the QUEUED base — the hot-host bound's
        base-side term, aggregated ONCE per compaction (cache keyed on the
        base paths like _queued_base; O(distinct hosts) rows) so the
        per-epoch gate scans only the O(delta) side instead of
        re-aggregating the whole queued base every epoch. The counts
        ignore not_before and changed keys — both only ever INFLATE a
        host's count, preserving the gate's hot ⊇ true-hot upper-bound
        invariant (a false-positive hot host pays one redundant rank; a
        miss stays impossible)."""
        m = self.catalog.load_manifest()
        key = tuple(m["tables"]["frontier"]["paths"]) if m else None
        cached: tuple | None = getattr(self, "_base_host_counts_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        if cached is not None:
            try:
                cached[1].unpersist()
            except Exception:
                pass
        df = (
            self._queued_base()
            .groupBy("host")
            .agg(F.count(F.lit(1)).alias("_n"))
            .persist()
        )
        self._base_host_counts_cache = (key, df)
        return df

    def _base_urls(self) -> DataFrame:
        """url_hash set of the frontier BASE, hash-partitioned + sorted +
        persisted ACROSS epochs — the base is immutable between
        compactions, so the per-epoch maybe-seen anti-join must not pay an
        O(frontier) exchange-and-sort every epoch. The persisted layout
        (HashPartitioning on url_hash, sorted within partitions) is reused
        by the sort-merge anti-join: only the small maybe side shuffles.
        Rebuilt when the manifest's base paths change (compaction or
        resume); recomputable lineage (persist, not checkpoint), so
        executor loss re-reads parquet instead of failing the epoch."""
        m = self.catalog.load_manifest()
        key = tuple(m["tables"]["frontier"]["paths"]) if m else None
        cached: tuple | None = getattr(self, "_base_urls_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        if cached is not None:
            try:
                cached[1].unpersist()
            except Exception:
                pass
        n = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        df = (
            self._load("frontier")
            .select("url_hash")
            .repartition(n, "url_hash")
            .sortWithinPartitions("url_hash")
            .persist()
        )
        self._base_urls_cache = (key, df)
        return df

    def _host_state_view(self) -> DataFrame:
        base = self._load("host_state")
        deltas = self._deltas("host_state_delta")
        if deltas is None:
            return base
        return (
            base.unionByName(deltas)
            .groupBy("host")
            .agg(F.max("next_allowed_ms").alias("next_allowed_ms"))
        )

    def _robots_state_view(self) -> DataFrame | None:
        """Per-host robots cache (crawl_delay_s, fetched_ms) — MOR like
        host_state: fetch timestamps only grow, so latest-wins is a
        max_by over base ∪ deltas. None until the first TTL-mode epoch."""
        base = self.catalog.read(
            self.spark, "robots_state", schema=ROBOTS_STATE_SCHEMA
        )
        deltas = self._deltas("robots_state_delta")
        if base is None and deltas is None:
            return None
        both = (
            base.unionByName(deltas)
            if base is not None and deltas is not None
            else (base if base is not None else deltas)
        )
        return (
            both.groupBy("host")
            .agg(
                F.max_by(
                    F.struct("crawl_delay_s", "fetched_ms"), "fetched_ms"
                ).alias("_w")
            )
            .select("host", "_w.*")
        )

    def _effective_robots(
        self, active_hosts: DataFrame, epoch_start: int
    ) -> DataFrame:
        """TTL-mode effective Crawl-delay per active host, plus the
        refresh decision (robotsValidityDurationSeconds, crawler-beans
        .cxml:239-243, epoch-quantized — the simulator applies the same
        rule). O(hosts with schedulable work), never O(all hosts): the
        versions table is semi-joined down to the epoch's active hosts
        before its latest-version groupBy, and all joins shuffle on host —
        the same key the politeness groupBy clusters on."""
        cfg = self.cfg
        cur = (
            self.robots_versions.join(active_hosts, "host", "left_semi")
            .filter(F.col("valid_from_ms") <= epoch_start)
            .groupBy("host")
            .agg(
                F.max_by("crawl_delay_s", "valid_from_ms").alias("_cur_delay")
            )
        )
        state = self._robots_state_view()
        j = active_hosts.join(cur, "host", "left")
        if state is not None:
            j = j.join(state, "host", "left")
        else:
            j = j.withColumn(
                "crawl_delay_s", F.lit(None).cast("int")
            ).withColumn("fetched_ms", F.lit(None).cast("long"))
        expired = F.col("fetched_ms").isNull() | (
            F.lit(epoch_start) - F.col("fetched_ms")
            >= F.lit(cfg.robots_ttl_ms)
        )
        return j.select(
            "host",
            F.when(expired, F.coalesce("_cur_delay", F.lit(0)))
            .otherwise(F.col("crawl_delay_s"))
            .cast("int")
            .alias("crawl_delay_s"),
            F.when(expired, F.lit(epoch_start))
            .otherwise(F.col("fetched_ms"))
            .cast("long")
            .alias("fetched_ms"),
            expired.alias("_refreshed"),
        )

    # ------------------------------------------------------------------ #
    # one epoch                                                           #
    # ------------------------------------------------------------------ #

    def run_epoch(self) -> EpochStats:
        import time as _time

        _t = {"_start": _time.time()}

        def mark(name: str) -> None:
            now = _time.time()
            _t[name] = round(now - _t["_start"], 2)
            _t["_start"] = now

        cfg = self.cfg
        meta = self.meta()
        epoch = int(meta["epoch"])
        # label the epoch's jobs: the per-epoch Spark-job count (fixed cost,
        # the scaling-efficiency driver) is then measurable by bench
        job_group = f"epoch-{id(self):x}-{epoch}"
        self.spark.sparkContext.setJobGroup(job_group, "crawl epoch")
        seq_offset = int(meta["seq_offset"])
        total_fetched = int(meta["total_fetched"])
        epoch_start = epoch * cfg.epoch_window_ms
        epoch_end = epoch_start + cfg.epoch_window_ms

        host_state = self._host_state_view()
        seed_domains = self._load("seed_domains")

        # one materialization of the delta-latest table per epoch (pinned,
        # O(changes since compaction)); every MOR view this epoch reads it.
        # persist (columnar cache), NOT localCheckpoint: most consumers of
        # this wide table read 1-2 columns (the url_hash key set for the
        # anti-joins/broadcast build, host+not_before for the hot-host
        # bound) and an RDD-backed checkpoint cannot column-prune, while
        # the InMemoryRelation serves pruned batches.
        latest = self._delta_latest()
        if latest is not None:
            latest = self._pin(latest, columnar=True)
        mark('pin_delta')

        # not_before/priority filters run AFTER the latest-wins merge (a
        # retry bump raises not_before; pre-merge filtering could drop the
        # latest version while an older, earlier-scheduled one survives) —
        # here per SIDE of the merge, which is equivalent: base-side rows
        # that survive the anti-join ARE their own latest version, and the
        # delta side filters its latest-wins output. The fetch resolve
        # (pages join) also runs per side, BEFORE the union: the base side
        # shares the pages cache's url_canon layout, so the frontier-sized
        # join side pays NO exchange and NO sort — only the O(delta) side
        # shuffles into the pages layout.
        priority_mode = cfg.queue_order == "priority"

        def prep(side: DataFrame) -> DataFrame:
            side = side.filter(F.col("not_before_ms") < epoch_end)
            if priority_mode:
                # precedence floor (C10): below-floor cash never schedules
                side = side.filter(F.col("priority") >= cfg.priority_floor)
            if "updated_epoch" in side.columns:
                side = side.drop("updated_epoch")
            # state is the constant "QUEUED" on both sides of the merge —
            # dropping it narrows every downstream exchange AND the Arrow
            # transfer into the politeness walk (the walk reads 14 of the
            # frontier's columns; state was the one dead passenger)
            side = side.drop("state")
            return side.join(
                self.pages.select(
                    "url_canon",
                    F.col("status").alias("page_status"),
                    F.col("fetch_ms").alias("page_fetch_ms"),
                ),
                "url_canon",
                "left",
            )

        qb = self._queued_base()
        if latest is not None:
            qb = qb.join(
                self._delta_hint(latest.select("url_hash")),
                "url_hash", "left_anti",
            )
        queued = prep(qb)
        if latest is not None:
            queued = queued.unionByName(
                prep(latest.filter(F.col("state") == "QUEUED"))
            )
        queued = (
            queued.withColumn("status", F.coalesce("page_status", F.lit(404)))
            .withColumn(
                "fetch_ms",
                F.coalesce("page_fetch_ms", F.lit(cfg.default_fetch_ms)),
            )
            .drop("page_status", "page_fetch_ms")
        )

        # --- robots freshness (TTL mode): refresh expired per-host caches
        # for this epoch's active hosts (hosts with schedulable work — the
        # exact set the simulator's by_host loop visits). One pinned
        # O(active-hosts) table feeds both the delay join below and the
        # robots_state delta in the commit pool. Static mode: zero cost.
        ttl_mode = (
            cfg.robots_ttl_ms is not None and self.robots_versions is not None
        )
        robots_eff = None
        if ttl_mode:
            robots_eff = self._pin(
                self._effective_robots(
                    queued.select("host").distinct(), epoch_start
                )
            )

        # --- per-host schedulable prefix (bounds mega-host skew) ---
        k_cap = min(cfg.replenish_per_epoch,
                    cfg.epoch_window_ms // max(cfg.min_delay_ms, 1) + 2)
        order_cols = (
            [F.col("priority").desc(), F.col("hop"), F.col("url_canon")]
            if priority_mode
            else [F.col("hop"), F.col("url_canon")]
        )
        # The k_cap prefix truncates ONLY hosts holding more eligible rows
        # than the cap — at web scale that is the mega-domain tail, not the
        # typical host. Ranking everything costs two full exchanges of the
        # queued set per epoch for a near-no-op, so the rank is gated: a
        # narrow UPPER-BOUND count pass finds possibly-over-cap hosts and
        # only THEIR rows pay the rank shuffle; every other host's rows
        # pass through with no exchange at all. The bound's base-side term
        # is the per-compaction cached host-count table (O(hosts), see
        # _base_host_counts) and its per-epoch work is one groupBy over
        # the pinned delta projection — O(changes), never an O(queued)
        # scan per epoch. Every relaxation (not_before ignored, changed
        # base rows counted on both sides) inflates counts, so
        # hot ⊇ true-hot always holds: a false positive ranks one extra
        # host, a miss is impossible, and walk groups stay ≤ k_cap +
        # blocked. Driver list bounded by _HOT_HOST_GATE (same discipline
        # as delta_broadcast_rows); above it → the full skew-proof rank
        # (correct at any skew shape).
        bound = self._base_host_counts()
        if latest is not None:
            bound = bound.unionByName(
                latest.filter(F.col("state") == "QUEUED")
                .groupBy("host").agg(F.count(F.lit(1)).alias("_n"))
            )
        hot_counts = (
            bound.groupBy("host").agg(F.sum("_n").alias("_n"))
            .filter(F.col("_n") > k_cap)
        )
        hot_df = hot_counts.select("host")
        # one aggregate job answers BOTH gate questions (NOT
        # limit().collect(): CollectLimit executes as incremental
        # scale-up jobs — 5+ jobs for an empty result): how many hosts
        # exceed the cap, and how much over-cap VOLUME they hold. The
        # walk's prefix masks enforce budget + window exactly on a
        # host's whole queue, so the rank is a volume cap, never a
        # correctness step — while the excess stays under
        # cfg.rank_excess_rows the queued set flows to the walk in ONE
        # consumption (no hot/cold split re-evaluating the candidate
        # DAG, no window exchanges); the extra exchange volume is the
        # excess itself, bounded by the gate. Excess is an upper bound
        # (same relaxations as the host counts), so a stale count can
        # only force a redundant rank, never an undersized one.
        gate_row = hot_counts.agg(
            F.count(F.lit(1)).alias("nh"),
            F.sum(F.col("_n") - k_cap).alias("excess"),
        ).collect()[0]
        n_hot = int(gate_row["nh"] or 0)
        excess = int(gate_row["excess"] or 0)
        mark('topk_gate')
        blocked_col = F.col("not_before_ms") > epoch_start
        if n_hot == 0 or excess <= cfg.rank_excess_rows:
            # no host over the cap, or the over-cap volume is cheaper
            # to walk than to rank: the whole queued set flows to the
            # walk in ONE consumption, no rank, no union
            cand = queued
        elif n_hot > _HOT_HOST_GATE:
            cand = per_key_topk_passthrough(
                queued, "host", order_cols, k_cap, blocked_col
            )
        else:
            # hot side first: the isin predicate pushes into the cached
            # base scan, so the second consumption of `queued` touches
            # only the hot hosts' rows
            hot_hosts = [r.host for r in hot_df.collect()]
            # host.isNull() keeps the split partition-complete: isin and
            # ~isin both evaluate NULL for a NULL host, which would silently
            # drop the row from BOTH branches (hosts are non-null today —
            # this guards the invariant, not a live case)
            cand = queued.filter(
                F.col("host").isNull() | ~F.col("host").isin(hot_hosts)
            ).unionByName(
                per_key_topk_passthrough(
                    queued.filter(F.col("host").isin(hot_hosts)),
                    "host", order_cols, k_cap, blocked_col,
                )
            )

        # --- per-host state (fetch resolve already happened per side) ---
        cand = (
            cand
            # per-host state joins carry NO broadcast hint: at bench scale
            # AQE broadcasts them (exact runtime stats, 64 MB gate); at the
            # 10^8-host north-star they become shuffle joins on host — the
            # same key the politeness groupBy below clusters on, so the
            # exchange is reused, never a multi-GB driver broadcast.
            .join(
                robots_eff.select("host", "crawl_delay_s")
                if ttl_mode
                else self.robots.select("host", "crawl_delay_s"),
                "host",
                "left",
            )
            .withColumn("crawl_delay_s", F.coalesce("crawl_delay_s", F.lit(0)))
            .join(host_state, "host", "left")
            .withColumn("next_allowed_ms",
                        F.coalesce("next_allowed_ms", F.lit(0)))
        )

        # --- politeness walk per host (shard-level Arrow stream, numpy scan)
        # Precondition satisfied by the `queued` filter above: every entry
        # has not_before_ms < epoch_end, so the vectorized prefix-mask walk
        # is exactly the reference loop (property-tested equivalence in
        # tests/test_politeness_vec.py).
        _OUTCOMES = np.array(["FETCHED", "RETRY", "FAILED"])

        # mapInArrow over host-partitioned, host-sorted shards — NOT
        # groupBy().applyInArrow: the walk runs once per HOST and an epoch
        # carries thousands of small host groups, so per-group Arrow
        # framing (one Python round trip, one Table build, one C++ sort
        # per group) multiplies into the epoch's fixed cost. The shard
        # form pays the SAME exchange (hash on host) but moves the total
        # order (host, [priority desc,] hop, url) into the JVM partition
        # sort, streams ~10k-row batches through ONE Python pass per
        # shard, and walks each host as a numpy slice view of the batch.
        # A host group split across batch boundaries is carried forward
        # until complete (hosts are contiguous in the sorted stream), so
        # every host is still walked exactly once, whole — the carry is
        # bounded by one host group plus one batch, the same peak as an
        # applyInArrow group. Same schedule_host_arrays core,
        # property-tested against the reference loop.
        import pyarrow as pa
        import pyarrow.compute as pc

        walk_sort = (
            [F.col("host"), F.col("priority").desc(), F.col("hop"),
             F.col("url_canon")]
            if priority_mode
            else [F.col("host"), F.col("hop"), F.col("url_canon")]
        )

        def _walk_hosts(t: "pa.Table") -> "pa.Table | None":
            """Walk every host segment of a sorted table (each segment
            complete by construction); None when nothing is picked."""
            t = t.combine_chunks()
            n = t.num_rows
            host_arr = t.column("host")
            # segment boundaries: dictionary codes are assigned in order
            # of first appearance, so over a host-sorted column they are
            # non-decreasing and change exactly at host boundaries
            codes = pc.dictionary_encode(host_arr).combine_chunks()
            codes_np = codes.indices.to_numpy(zero_copy_only=False)
            bounds = np.flatnonzero(np.diff(codes_np)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [n]))
            nb = t.column("not_before_ms").to_numpy(zero_copy_only=False)
            st = t.column("status").to_numpy(zero_copy_only=False)
            fm = t.column("fetch_ms").to_numpy(zero_copy_only=False)
            rc = t.column("retry_count").to_numpy(zero_copy_only=False)
            na = t.column("next_allowed_ms").to_numpy(zero_copy_only=False)
            cd = t.column("crawl_delay_s").to_numpy(zero_copy_only=False)
            idx_parts, start_parts, out_parts, cur_parts = [], [], [], []
            for s, e in zip(starts, ends):
                picked, fstart, outc, cursor = schedule_host_arrays(
                    np.arange(e - s),  # rows arrive pre-sorted per host
                    nb[s:e], st[s:e], fm[s:e], rc[s:e],
                    int(na[s]), int(cd[s]), epoch_start, epoch_end, cfg,
                    politeness=cfg.politeness_for(host_arr[s].as_py()),
                )
                if picked.size:
                    idx_parts.append(picked + s)
                    start_parts.append(fstart)
                    out_parts.append(outc)
                    cur_parts.append(
                        np.full(picked.size, cursor, dtype=np.int64)
                    )
            if not idx_parts:
                return None
            sub = t.take(pa.array(np.concatenate(idx_parts)))
            return pa.table({
                "url_hash": sub.column("url_hash"),
                "url_canon": sub.column("url_canon"),
                "host": sub.column("host"),
                "hop": sub.column("hop"),
                "seed_id": sub.column("seed_id"),
                "retry_count": sub.column("retry_count"),
                "fetch_start_ms": pa.array(
                    np.concatenate(start_parts), type=pa.int64()
                ),
                "fetch_ms": sub.column("fetch_ms"),
                "status": sub.column("status"),
                "outcome": pa.array(_OUTCOMES[np.concatenate(out_parts)]),
                "new_next_allowed": pa.array(np.concatenate(cur_parts)),
                "trans_hops": sub.column("trans_hops"),
                "priority": sub.column("priority"),
                # passthrough: the frontier-delta row for this attempt is
                # reconstructed from the event alone (MOR commit)
                "not_before_ms": sub.column("not_before_ms"),
                "discovered_epoch": sub.column("discovered_epoch"),
            })

        def walk_stream(batches):
            pending: "pa.Table | None" = None
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                t = pa.Table.from_batches([batch])
                if pending is not None:
                    t = pa.concat_tables([pending, t])
                hosts = t.column("host")
                # first row of the (possibly incomplete) last host group
                cut = pc.index(hosts, hosts[-1]).as_py()
                if cut > 0:
                    out = _walk_hosts(t.slice(0, cut))
                    if out is not None:
                        yield from out.to_batches()
                pending = t.slice(cut)
            if pending is not None and pending.num_rows > 0:
                out = _walk_hosts(pending)
                if out is not None:
                    yield from out.to_batches()

        # eager materialization: every downstream consumer (host_state,
        # frontier transitions, discovery, metrics) reads the walk output
        # exactly once from storage. The materialization IS the fetch_log
        # delta write (Iceberg staging: data files land before the manifest
        # publish; a crash orphans them harmlessly) — one job does double
        # duty, and the commit phase later only records the path.
        n_shuffle = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        raw_events = (
            cand.repartition(n_shuffle, "host")
            .sortWithinPartitions(*walk_sort)
            .mapInArrow(walk_stream, EVENT_SCHEMA)
        )
        events_path = self.catalog.stage_path("fetch_log", kind="append")
        # persist-through-write: the parquet write is still the one
        # materializing action (and the committed fetch_log delta), but it
        # now ALSO populates the cache, so downstream consumers read the
        # InMemoryRelation instead of paying a parquet read-back round
        # trip per epoch. Released with the epoch's other pins post-commit.
        events = raw_events.persist()
        self._epoch_pins.append(events)
        # the epoch's outcome counters ride THIS write as an observation
        # (not the metrics sink: that write now trails the commit — see
        # the metrics block below), so _meta never waits on metrics
        from pyspark.sql import Observation

        obs_ev = Observation()
        events.observe(
            obs_ev,
            F.sum(
                F.when(F.col("outcome") == "FETCHED", 1).otherwise(0)
            ).alias("f"),
            F.sum(
                F.when(F.col("outcome") == "FAILED", 1).otherwise(0)
            ).alias("fl"),
            F.sum(
                F.when(F.col("outcome") != "FETCHED", 1).otherwise(0)
            ).alias("e"),
        ).withColumn("epoch", F.lit(epoch)).write.mode(
            "overwrite"
        ).parquet(events_path)

        mark('plan_candidates')
        # adaptive compaction, decided as soon as the attempt count is
        # known (staged events file's parquet footers — driver-local
        # metadata read, no job): rewrite the base once the pending delta
        # log reaches compact_delta_ratio of the frontier (cheap at small
        # scale where that is every epoch; rare at web scale), with
        # frontier_compact_epochs as a hard interval cap. Decided here,
        # as soon as the staged events file exists, BEFORE the commit pool
        # so every table write runs concurrently. The
        # admission count, unknown until the metrics write finishes, is
        # left out of the trigger — compaction timing is a pure cost knob
        # (any cadence is exact, per the cadence-invariance parity test),
        # and the recorded delta_rows below uses the true value.
        prev_frontier_rows = int(
            meta.get("frontier_rows", meta.get("queued", 0))
        )
        n_attempts_staged = _parquet_rows(events_path)
        compact = (
            int(meta.get("delta_rows", 0)) + n_attempts_staged
            >= cfg.compact_delta_ratio * max(prev_frontier_rows, 1)
            or (epoch + 1) % max(cfg.frontier_compact_epochs, 1) == 0
        )
        # fetch_log stores events only (incl. the politeness cursor as
        # lineage); the exact global sequence is DERIVED at read time from
        # the total order (epoch, fetch_start_ms, host, url_canon) —
        # materializing it per epoch costs jobs, stores nothing the sort
        # key doesn't already encode.
        fetch_log_extra = None
        if self.verify_payloads:
            # verification results append as a side table keyed by url_hash
            # + epoch; fetch_log() joins them at read time
            fetch_log_extra = self._verify_payloads(events).withColumn(
                "epoch", F.lit(epoch)
            )
        # --- host_state delta: this epoch's politeness cursors ---
        # cursors only ever grow, so the delta is just the active hosts'
        # new values; the view merges by max() (hosts without a row default
        # to 0 through the left-join coalesce above). Never O(hosts)/epoch.
        host_state_delta = events.groupBy("host").agg(
            F.max("new_next_allowed").alias("next_allowed_ms")
        )

        # --- frontier delta: attempted rows, reconstructed from events ---
        # MOR: no join against the frontier at all — the event carries the
        # full row (not_before/discovered_epoch passthrough), so the delta
        # is O(attempts) and the big table never shuffles for the update.
        frontier_changed = events.select(
            "url_hash", "url_canon", "host", "hop", "seed_id",
            F.when(F.col("outcome") == "FETCHED", "FETCHED")
            .when(F.col("outcome") == "FAILED", "FAILED")
            .otherwise(F.lit("QUEUED"))
            .alias("state"),
            (
                F.col("retry_count")
                + F.when(F.col("outcome") == "RETRY", 1).otherwise(0)
            ).cast("int").alias("retry_count"),
            F.when(
                F.col("outcome") == "RETRY",
                F.col("fetch_start_ms") + cfg.retry_delay_ms,
            ).otherwise(F.col("not_before_ms")).cast("long")
            .alias("not_before_ms"),
            "discovered_epoch",
            "trans_hops",
            "priority",
            F.lit(epoch + 1).alias("updated_epoch"),
        )

        mark('state_updates')
        # --- discovery: explode outlinks of successful 2xx fetches ---
        fetched_pages = (
            events.filter(
                (F.col("outcome") == "FETCHED")
                & (F.col("status") >= 200) & (F.col("status") < 300)
            )
            .select("url_canon", "hop", "seed_id", "fetch_start_ms",
                    F.col("host").alias("disc_host"),
                    F.col("trans_hops").alias("parent_trans"),
                    F.col("priority").alias("parent_priority"))
            .join(self.pages.select("url_canon", "outlinks"), "url_canon")
        )
        # resolve + canonicalize + within-page dedup happen inside ONE
        # Arrow-NATIVE pass (mapInArrow, functions/urls.make_flat_resolver):
        # a page's links live in one row, so the simulator's page_seen
        # dedup needs no epoch-wide exchange (per-page dedup == the former
        # dropDuplicates([disc_url, cand_canon])), and the explode happens
        # inside the batch, so no JVM Generate node and no per-link Python
        # for the clean majority — the ListArray's flat string buffer is
        # classified by C++ RE2 kernels, clean-relative links are resolved
        # by vectorized concat, and Python touches only the messy-link
        # minority plus one PSL walk per DISTINCT host.
        #
        # MEASURED DECISIONS (r5, tools/bench_discovery_ab.py +
        # tests/test_discovery_ab_parity.py):
        #  - JVM array HOFs (the r4 verdict's directive-#1 sketch, two
        #    variants) are exact but 35-75% SLOWER than the per-link Arrow
        #    loop (HOF lambdas evaluate interpreted, outside codegen);
        #  - this flat Arrow-native pass is exact and ~2.8x FASTER than
        #    that loop (8M links at 16 cores: 3.3-3.8 s -> 1.2-1.4 s,
        #    ~6M links/s) because the clean majority never materializes
        #    Python objects at all.
        # All variants are narrow per-partition ops (zero shuffle, linear
        # in executors), so the fastest constant wins at 100x too.
        # cash = OPIC split (C10): parent cash / resolved unique outlinks.
        disc_in = fetched_pages.select(
            F.col("url_canon").alias("disc_url"),
            "hop", "seed_id", "fetch_start_ms", "disc_host", "parent_trans",
            "parent_priority",
            F.slice("outlinks", 1, cfg.max_outlinks).alias("outlinks"),
        )
        _passthrough = ["disc_url", "hop", "seed_id", "fetch_start_ms",
                        "disc_host", "parent_trans"]
        from pyspark.sql.types import (
            DoubleType, StringType, StructField, StructType,
        )

        raw_links = disc_in.mapInArrow(
            make_flat_resolver(
                "disc_url", "outlinks", "parent_priority", _passthrough,
            ),
            StructType(
                [disc_in.schema[name] for name in _passthrough]
                + [
                    StructField("cash", DoubleType()),
                    StructField("cand_canon", StringType()),
                    StructField("cand_host", StringType()),
                    StructField("cand_reg_domain", StringType()),
                ]
            ),
        )
        from bitextor_spark.plans.scope import is_embed_col

        candidates = raw_links.select(
            F.col("cand_canon").alias("url_canon"),
            (F.col("hop") + 1).cast("int").alias("hop"),
            "seed_id", "fetch_start_ms", "disc_host", "disc_url",
            F.col("cand_host").alias("host"),
            F.col("cand_reg_domain").alias("reg_domain"),
            # transclusion chain: embed hop extends the trailing-E count,
            # a navigational hop resets it (crawler-beans.cxml:131-186)
            F.when(
                is_embed_col(F.col("cand_canon"), cfg),
                F.col("parent_trans") + 1,
            ).otherwise(F.lit(0)).cast("int").alias("trans_hops"),
            F.col("cash").alias("priority"),
        )
        # --- wave dedup + scope metrics: ONE aggregation consumes the
        # resolver output. min(struct) over the in-scope rows picks the
        # first discoverer in global fetch order (identical winner to a
        # window: the (fetch_start_ms, disc_host, disc_url) key is unique
        # per candidate URL) while the same pass counts in-scope
        # discoveries (n_disc, the dupe counter) and out-of-scope rejects
        # (n_reject, the C17 metric) — host is a pure function of
        # url_canon, so the reject counter regroups exactly. Partial
        # map-side aggregation shrinks the shuffle to one row per distinct
        # URL, and the O(discovered-links) resolver output is never
        # checkpointed (it used to be the epoch's largest block-store
        # write, re-scanned again by the metrics write at commit).
        scoped = apply_scope(candidates, seed_domains, self.robots, cfg)
        # pin mode note (r5, interleaved 16-core A/B): a columnar persist
        # of this aggregate (column pruning for its three consumers) ties
        # the RDD localCheckpoint within noise — keep the simpler default.
        grouped_all = self._pin(
            scoped.groupBy("url_canon")
            .agg(
                F.min(
                    F.when(
                        F.col("in_scope"),
                        F.struct("fetch_start_ms", "disc_host", "disc_url",
                                 "hop", "seed_id", "host", "trans_hops",
                                 "priority"),
                    )
                ).alias("w"),
                F.sum(
                    F.when(F.col("in_scope"), 1).otherwise(0)
                ).alias("n_disc"),
                F.sum(
                    F.when(~F.col("in_scope"), 1).otherwise(0)
                ).alias("n_reject"),
                F.max("host").alias("_any_host"),
            )
        )
        mark('discovery_dag')
        grouped = (
            grouped_all.filter(F.col("w").isNotNull())
            .select(
                "url_canon",
                F.col("w.host").alias("host"),
                F.col("w.hop").alias("hop"),
                F.col("w.seed_id").alias("seed_id"),
                F.col("w.trans_hops").alias("trans_hops"),
                F.col("w.priority").alias("priority"),
                "n_disc",
            )
            .withColumn("url_hash", F.xxhash64("url_canon"))
        )
        # --- seen check: bloom prefilter + exact anti-join on the residue ---
        # The flag cogroup reads the pinned aggregate (narrow filter +
        # projection); what pins is the ADMITTED set, because THREE
        # commit-pool writes (frontier_delta, bloom_pending, metrics'
        # queued counter) branch off it — unpinned they would each
        # re-evaluate the flag cogroup and both anti-joins concurrently.
        # The per-host dupe/unique counters need only pre-flag columns, so
        # they read the pinned aggregate directly.
        if self.use_bloom:
            # n_disc drops BEFORE the flag pass: the dupe counter is read
            # from the pinned aggregate, not the flag output, so it must
            # not ride the Arrow transfer through the Python flag pass
            bcast = self._bloom_flag_broadcast()
            if bcast is not None:
                # bitmaps under the size gate: one broadcast per
                # compaction, per-epoch flag is a NARROW mapInArrow — no
                # shard exchange, no cogroup sort in the epoch DAG
                flagged = seen_mod.flag_maybe_seen_via_broadcast(
                    grouped.drop("n_disc"), bcast, cfg.num_host_shards,
                    cfg.bloom_bits_per_shard, cfg.bloom_num_hashes,
                )
            else:
                flagged = seen_mod.flag_maybe_seen(
                    grouped.drop("n_disc"), self._load("blooms"),
                    cfg.num_host_shards,
                    cfg.bloom_bits_per_shard, cfg.bloom_num_hashes,
                )
            # presence = in base OR in delta log. The base check is ONE
            # left join carrying a presence marker (kept rows: bloom-miss
            # OR base-miss) rather than a definitely-new ∪ anti-join(maybe)
            # union — a union would reference the unpinned cogroup from two
            # branches of the pin job and evaluate the Python flag pass
            # twice. A bloom-miss row can't be in the base (that is the
            # bloom's guarantee), so joining it costs nothing semantically;
            # the base side reuses the cross-epoch persisted url_hash
            # layout, the delta side stays a broadcast (gated) — never a
            # fresh O(frontier) exchange per epoch. The delta check covers
            # bloom-miss rows too: blooms are merge-on-read (folded only at
            # compaction), so a bloom miss proves absence from the BASE
            # only — admissions since the last compaction live in the
            # delta log alone.
            admitted = (
                flagged.join(
                    self._base_urls().withColumn("_in_base", F.lit(True)),
                    "url_hash", "left",
                )
                .filter(~F.col("maybe_seen") | F.col("_in_base").isNull())
                .drop("maybe_seen", "_in_base")
            )
            if latest is not None:
                admitted = admitted.join(
                    self._delta_hint(latest.select("url_hash")),
                    "url_hash", "left_anti",
                )
        else:
            admitted = grouped.drop("n_disc").join(
                self._base_urls(), "url_hash", "left_anti"
            )
            if latest is not None:
                admitted = admitted.join(
                    self._delta_hint(latest.select("url_hash")),
                    "url_hash", "left_anti",
                )
        # Pin the admitted set (eager localCheckpoint — measured better
        # than fusing this pin with the bloom_pending delta write: staging
        # that write here serializes it, while in the commit pool it
        # overlaps the other table writes for free).
        # the admission counter rides the pin's materialization (the other
        # half of the former metrics-write observation)
        obs_ad = Observation()
        admitted = self._pin(
            admitted.observe(obs_ad, F.count(F.lit(1)).alias("q"))
        )

        new_rows = admitted.select(
            "url_hash", "url_canon", "host", "hop", "seed_id",
            F.lit("QUEUED").alias("state"),
            F.lit(0).alias("retry_count"),
            F.lit(0).cast("long").alias("not_before_ms"),
            F.lit(epoch + 1).alias("discovered_epoch"),
            "trans_hops",
            "priority",
            F.lit(epoch + 1).alias("updated_epoch"),
        )

        frontier_delta_next = frontier_changed.unionByName(new_rows)

        # --- metrics (C17): per-host counters for this epoch ---
        # ONE aggregation over a tagged union of the four (narrow, already
        # pinned) sources instead of the former five per-host groupBys
        # stitched by four FULL OUTER joins: the join chain executed as
        # four SEQUENTIAL sort-merge stages over tiny per-host tables, and
        # its ~4 stage latencies made the metrics write the commit pool's
        # critical path (measured 3.3 s of the 3.4 s commit at 16 cores —
        # pure fixed cost at any data volume). The union form is depth-2:
        # partial map-side aggregation collapses every branch to per-host
        # rows before ONE exchange, and hosts present in any source
        # survive exactly as with the full joins (absent metrics sum as
        # the union's zero fillers; every counter is already long).
        # seen_dupe (candidates already in the frontier) = unique − admitted
        # per host: arithmetic, not a frontier semi-join — the frontier
        # never shuffles for metrics.
        _z = F.lit(0).cast("long")

        def _mrow(host_col, **vals):
            cols = [F.col(host_col).alias("host") if host_col != "host"
                    else F.col("host")]
            for c in ("fetched", "errors", "failed", "skipped_scope",
                      "dupe_seen", "n_unique", "queued"):
                cols.append(
                    vals[c].cast("long").alias(c) if c in vals
                    else _z.alias(c)
                )
            return cols

        m_events = events.select(*_mrow(
            "host",
            fetched=F.when(F.col("outcome") == "FETCHED", 1).otherwise(0),
            errors=F.when(F.col("outcome") != "FETCHED", 1).otherwise(0),
            failed=F.when(F.col("outcome") == "FAILED", 1).otherwise(0),
        ))
        # one narrow read of the pinned aggregate covers dupes AND uniques
        m_grouped = grouped.select(*_mrow(
            "host", dupe_seen=F.col("n_disc") - 1, n_unique=F.lit(1),
        ))
        m_rejects = grouped_all.filter(F.col("n_reject") > 0).select(*_mrow(
            "_any_host", skipped_scope=F.col("n_reject"),
        ))
        m_queued = new_rows.select(*_mrow("host", queued=F.lit(1)))
        metrics = (
            m_events.unionByName(m_grouped)
            .unionByName(m_rejects)
            .unionByName(m_queued)
            .groupBy("host")
            .agg(*[
                F.sum(c).alias(c)
                for c in ("fetched", "errors", "failed", "skipped_scope",
                          "dupe_seen", "n_unique", "queued")
            ])
            .select(
                F.lit(epoch).alias("epoch"),
                "host",
                "fetched",
                "errors",
                "failed",
                (
                    F.col("dupe_seen") + F.col("n_unique") - F.col("queued")
                ).alias("skipped_seen"),
                "skipped_scope",
                "queued",
            )
        )
        mark('metrics_dag')
        # per-host metrics stay a WRITE-ONLY distributed sink (at 10^8 hosts
        # a driver collect is an OOM) and nothing in the next epoch reads
        # them — so the metrics write runs BEHIND the commit: staged now
        # (under THIS epoch's snapshot id), launched on a side thread that
        # overlaps the commit pool and the next epoch's phases, and
        # registered in the NEXT commit via the (kind, staged_path)
        # pre_written form (the future has a whole epoch to finish; the
        # registration joins it first). The epoch counters moved to
        # observations on the events write and the admitted pin above, so
        # _meta never waits on this write. Crash window: a crash between
        # this epoch's manifest publish and the next registration orphans
        # ONE epoch's metrics rows (recoverable from fetch_log — the
        # frontier state machine itself is untouched); `flush_pending_
        # metrics` closes the window at run end / first metrics read.
        metrics_path = self.catalog.stage_path("metrics", kind="append")
        metrics_pins = [events, grouped_all, admitted]

        def _write_metrics():
            metrics.write.mode("overwrite").parquet(metrics_path)

        from concurrent.futures import ThreadPoolExecutor

        _mpool = ThreadPoolExecutor(max_workers=1)
        metrics_future = _mpool.submit(_write_metrics)
        _mpool.shutdown(wait=False)

        # --- commit: MOR deltas, adaptive compaction (`compact` was
        # decided right after the events write, where the attempt count
        # first became known) ---
        replace: dict[str, DataFrame] = {}
        append: dict[str, DataFrame] = {}
        drop: list[str] = []
        if compact:
            # rewrite the base as the merged view (including this epoch's
            # delta) and drop the delta logs — read amplification resets.
            # `latest` (pinned above) already collapses the old delta log;
            # this epoch's rows all carry a strictly higher updated_epoch,
            # so one more latest-wins over the small union is exact.
            all_d = frontier_delta_next
            if latest is not None:
                all_d = all_d.unionByName(latest)
            replace["frontier"] = self._merge_latest(
                self._load("frontier"), self._latest_wins(all_d)
            )
            old_h = self._deltas("host_state_delta")
            all_h = self._load("host_state").unionByName(host_state_delta)
            if old_h is not None:
                all_h = all_h.unionByName(old_h)
            replace["host_state"] = all_h.groupBy("host").agg(
                F.max("next_allowed_ms").alias("next_allowed_ms")
            )
            drop = ["frontier_delta", "host_state_delta"]
            if ttl_mode:
                # fold the robots cache the same way: base ∪ delta log ∪
                # this epoch's refreshed rows, latest-fetch-wins
                parts = [
                    robots_eff.filter("_refreshed").select(
                        "host", "crawl_delay_s", "fetched_ms"
                    )
                ]
                old_r = self.catalog.read(
                    self.spark, "robots_state", schema=ROBOTS_STATE_SCHEMA
                )
                old_rd = self._deltas("robots_state_delta")
                parts += [p for p in (old_r, old_rd) if p is not None]
                all_r = parts[0]
                for p in parts[1:]:
                    all_r = all_r.unionByName(p)
                replace["robots_state"] = (
                    all_r.groupBy("host")
                    .agg(
                        F.max_by(
                            F.struct("crawl_delay_s", "fetched_ms"),
                            "fetched_ms",
                        ).alias("_w")
                    )
                    .select("host", "_w.*")
                )
                drop.append("robots_state_delta")
        else:
            append["frontier_delta"] = frontier_delta_next
            append["host_state_delta"] = host_state_delta
            if ttl_mode:
                append["robots_state_delta"] = robots_eff.filter(
                    "_refreshed"
                ).select("host", "crawl_delay_s", "fetched_ms")
        if self.use_bloom:
            # merge-on-read blooms: per epoch only the admitted url hashes
            # append (O(admissions) — at the north-star the shard bitmaps
            # are GBs and a per-epoch rewrite is pure non-scaling fixed
            # cost); the bitmaps fold at compaction, the same cadence that
            # resets the delta log. Exactness holds between folds because
            # the admission path anti-joins the delta log for EVERY
            # candidate, bloom-hit or not (see the seen check above).
            if compact:
                pending = self._deltas("bloom_pending")
                new_hashes = admitted.select("url_hash")
                if pending is not None:
                    new_hashes = new_hashes.unionByName(pending)
                replace["blooms"] = seen_mod.update_blooms(
                    self._load("blooms"), new_hashes,
                    cfg.num_host_shards, cfg.bloom_bits_per_shard,
                    cfg.bloom_num_hashes,
                )
                drop.append("bloom_pending")
            else:
                append["bloom_pending"] = admitted.select("url_hash")
        if fetch_log_extra is not None:
            append["fetch_verify"] = fetch_log_extra

        stats_box: dict[str, int] = {}

        def _meta() -> dict[str, Any]:
            # the observations were materialized by the events write and
            # the admitted pin — both long done; .get never blocks here
            ev = obs_ev.get
            n_new = int(obs_ad.get["q"] or 0)
            n_fetched = int(ev["f"] or 0)
            n_failed = int(ev["fl"] or 0)
            n_attempts = n_fetched + int(ev["e"] or 0)
            # queued' = queued − terminal attempts + newly admitted
            n_terminal = n_fetched + n_failed
            prev_queued = meta.get("queued")
            if prev_queued is None:
                prev_queued = self._queued_view(latest).count()
            queued_remaining = int(prev_queued) - n_terminal + n_new
            pending = int(meta.get("delta_rows", 0)) + n_attempts + n_new
            stats_box.update(
                n_new=n_new, n_fetched=n_fetched, n_attempts=n_attempts,
                queued_remaining=queued_remaining,
            )
            return {
                "epoch": epoch + 1,
                "seq_offset": seq_offset + n_attempts,
                "total_fetched": total_fetched + n_fetched,
                "queued": queued_remaining,
                "frontier_rows": prev_frontier_rows + n_new,
                # true delta-log row count (attempts + admissions) —
                # powers the _delta_hint broadcast gate with no count() job
                "delta_rows": 0 if compact else pending,
                "done": queued_remaining == 0
                or total_fetched + n_fetched >= cfg.max_fetches,
            }

        pre_written: dict[str, Any] = {"fetch_log": "append"}
        prev_metrics = self._pending_metrics
        if prev_metrics is not None:
            # register LAST epoch's metrics file (its write had a whole
            # epoch to finish; join it, then its pins can finally go)
            p_path, p_future, p_pins = prev_metrics
            p_future.result()
            pre_written["metrics"] = ("append", p_path)
            self._pending_metrics = None
            for df in p_pins:
                try:
                    df.unpersist()
                except Exception:
                    pass
        self.catalog.commit(
            replace=replace or None,
            append=append or None,
            drop=drop or None,
            pre_written=pre_written,
            meta=_meta,
        )
        n_new = stats_box["n_new"]
        n_fetched = stats_box["n_fetched"]
        n_attempts = stats_box["n_attempts"]
        queued_remaining = stats_box["queued_remaining"]
        mark('commit')
        # this epoch's metrics trail the commit: hold the pins its write
        # reads (events / winner aggregate / admitted) one more epoch and
        # release the rest now
        keep_ids = {id(df) for df in metrics_pins}
        self._epoch_pins = [
            df for df in self._epoch_pins if id(df) not in keep_ids
        ]
        self._release_pins()
        self._pending_metrics = (metrics_path, metrics_future, metrics_pins)
        if compact and self.use_bloom:
            # the commit above replaced the bloom base: next epoch's flag
            # pass must see the folded bitmaps, not the stale broadcast —
            # rebuild in the background while the next epoch's early
            # phases run (the flag pass comes late in the epoch)
            self._invalidate_bloom_broadcast()
            self._rebuild_bloom_broadcast_async()
        self.last_timings = {k: v for k, v in _t.items() if k != '_start'}
        tracker = self.spark.sparkContext.statusTracker()
        try:
            self.last_timings['n_jobs'] = len(
                tracker.getJobIdsForGroup(job_group)
            )
        except Exception:
            pass
        return EpochStats(epoch, n_fetched, n_attempts, n_new, queued_remaining)

    # ------------------------------------------------------------------ #
    # full crawl                                                          #
    # ------------------------------------------------------------------ #

    def run(self, max_epochs: int | None = None) -> list[EpochStats]:
        self.bootstrap()
        stats: list[EpochStats] = []
        limit = max_epochs if max_epochs is not None else self.cfg.max_epochs
        while True:
            meta = self.meta()
            if meta.get("done") or int(meta["epoch"]) >= limit:
                break
            st = self.run_epoch()
            stats.append(st)
            if st.attempts == 0 and st.queued_remaining == 0:
                break
        self.flush_pending_metrics()
        return stats

    # convenience readers -------------------------------------------------

    def fetch_log(self) -> DataFrame:
        """Fetch log with the exact global sequence derived from the total
        order (epoch, fetch_start_ms, host, url_canon). Inspection-scale
        reads use one window; bulk exports should use
        ``_with_global_seq``-style range ranking instead. Payload
        verification results (when enabled) live in the fetch_verify side
        table and join back here by (url_hash, epoch)."""
        df = self._load("fetch_log").drop("new_next_allowed")
        verify = self.catalog.read(
            self.spark, "fetch_verify",
            schema="url_hash long, bytes_ok boolean, caption_ok boolean, epoch int",
        )
        if verify is not None:
            df = df.join(verify, ["url_hash", "epoch"], "left")
        w = Window.orderBy("epoch", "fetch_start_ms", "host", "url_canon")
        return df.withColumn("seq", F.row_number().over(w) - 1).orderBy("seq")

    def frontier(self) -> DataFrame:
        """Current frontier (merged MOR view: base latest-wins deltas)."""
        return self._frontier_view()

    def metrics(self) -> DataFrame:
        self.flush_pending_metrics()
        return self._load("metrics")

    def flush_pending_metrics(self) -> None:
        """Register a metrics delta still trailing its epoch's commit
        (write-behind sink). Called automatically at run() end and on the
        first metrics read; a metrics-only snapshot carries every other
        table (and the run meta) forward unchanged."""
        if self._pending_metrics is None:
            return
        path, future, pins = self._pending_metrics
        future.result()
        self.catalog.commit(
            pre_written={"metrics": ("append", path)}, meta=self.meta()
        )
        for df in pins:
            try:
                df.unpersist()
            except Exception:
                pass
        self._pending_metrics = None
