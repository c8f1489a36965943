"""The crawl round loop (SURVEY.md §3.1) — flagship entry point.

Each round is one batch DAG: frontier → canonicalize/dedupe → seen-filter
(exact anti-join or partitioned bloom) → robots (broadcast rules + window)
→ politeness budget → salted per-host rank → global deterministic top-k →
as-of fetch join against the pages corpus → fused Arrow extraction →
frontier(r+1)/text/metrics/seen writes → atomic round commit. The loop is
driver-side Python (a crawl is iterative — each round feeds the next, which
one streaming query cannot express; SURVEY.md §2.8).

Run on a cluster:  spark-submit --py-files lectura.zip -m lectura.crawl \
    --warehouse <dir> --rounds R [--use-bloom]
"""

from __future__ import annotations

import argparse
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lectura.config import CrawlConfig
from lectura.checkpoint import RoundLog
from lectura.extract import extract_pages, warc_fetch_extract
from lectura.frontier import (dedupe_frontier, rank_per_host, recrawl_due,
                              schedule, with_budget)
from lectura.metrics import fetch_metrics, partition_lineage
from lectura.robots import (apply_robots, build_rule_arrays,
                            build_rule_table, host_delay_table)
from lectura.seen import (
    anti_join_seen, bloom_build, bloom_probe, bloom_upsert, cuckoo_build,
    cuckoo_probe, cuckoo_upsert, shard_stats,
)
from lectura.tables import Warehouse
from lectura.urlnorm import host_bucket, with_url_norm, with_url_parts

STATE_TABLES = ["frontier", "scheduled", "seen", "seen_shards", "host_state",
                "text", "fetch_log", "lineage", "metrics", "bloom_stats"]

from pyspark.sql import types as T  # noqa: E402

BLOOM_STATS_SCHEMA = T.StructType([
    T.StructField("round", T.IntegerType()),
    T.StructField("shard_id", T.IntegerType()),
    T.StructField("n_inserted", T.LongType()),
    T.StructField("capacity", T.LongType()),
    T.StructField("fpp_est", T.DoubleType()),
    T.StructField("saturated", T.BooleanType()),
])


def commit_bloom(wh: Warehouse, spark: SparkSession, cfg, rnd: int,
                 seen: DataFrame, new_seen: DataFrame) -> list:
    """Build this round's seen-filter shards (bloom or cuckoo per
    cfg.seen_filter), merge into `seen_shards`, record per-shard health
    in `bloom_stats`, and resize on saturation.

    Saturation guard (VERDICT r1 #4): sizing is fixed at build time;
    once cumulative inserts exceed it the configured FPP bound (B:6) no
    longer holds (bloom: FPP degrades silently; cuckoo: inserts start
    landing in the overflow stash). On saturation the filter is rebuilt
    from the exact seen set (always maintained alongside it) at ≥2× the
    observed load. The stats scan is n_shards rows. Returns the
    collected stats rows."""
    is_cuckoo = cfg.seen_filter == "cuckoo"
    cap = max(1024, cfg.seen_capacity // cfg.n_shards)
    if wh.exists("seen_shards"):
        merged = (
            cuckoo_upsert(wh.read("seen_shards"), new_seen, cfg.n_shards,
                          cap)
            if is_cuckoo else
            bloom_upsert(wh.read("seen_shards"), new_seen, cfg.n_shards,
                         cap, cfg.fpp)
        )
        wh.overwrite("seen_shards", merged)
    else:
        built = (
            cuckoo_build(new_seen.select("url"), cfg.n_shards, cap)
            if is_cuckoo else
            bloom_build(new_seen.select("url"), cfg.n_shards, cap, cfg.fpp)
        )
        wh.overwrite("seen_shards", built)
    # Stats: ZERO extra jobs — the written shard files already carry the
    # counters, so read everything but the bits column driver-side with
    # pyarrow (n_shards slim rows), evaluate the FPP formula in Python
    # (same (1-e^{-kn/m})^k as seen.shard_stats), and commit the rows as a
    # driver-written parquet append. The former stats job + read-back was
    # per-round serial latency.
    import math

    import pyarrow.parquet as pq

    stats = []
    for f in wh._files("seen_shards"):
        t = pq.read_table(
            f, columns=["shard_id", "n_inserted", "m_bits", "k", "capacity"]
        )
        for r in t.to_pylist():
            n, m, k = (float(r["n_inserted"]), float(r["m_bits"]),
                       float(r["k"]))
            if is_cuckoo:
                # m := bucket count, k := slots (seen.py column
                # reinterpretation); probe compares 2k slots at `load`
                # occupancy of 16-bit fingerprints
                load = min(1.0, n / max(1.0, m * k))
                fpp_est = 1.0 - (1.0 - 1.0 / 65535.0) ** (2 * k * load)
            else:
                fpp_est = (1.0 - math.exp(-k * n / m)) ** k
            stats.append(
                {
                    "round": rnd,
                    "shard_id": r["shard_id"],
                    "n_inserted": r["n_inserted"],
                    "capacity": r["capacity"],
                    "fpp_est": fpp_est,
                    "saturated": r["n_inserted"] > r["capacity"],
                }
            )
    import pyarrow as pa

    wh.append_local(
        "bloom_stats",
        pa.Table.from_pylist(stats, schema=pa.schema(
            [("round", pa.int32()), ("shard_id", pa.int32()),
             ("n_inserted", pa.int64()), ("capacity", pa.int64()),
             ("fpp_est", pa.float64()), ("saturated", pa.bool_())]
        )),
        BLOOM_STATS_SCHEMA.json(),
    )
    if any(r["saturated"] for r in stats):
        new_cap = 2 * max(max(r["n_inserted"] for r in stats), cap)
        all_seen = seen.select("url").unionByName(new_seen.select("url"))
        rebuilt = (
            cuckoo_build(all_seen, cfg.n_shards, new_cap)
            if is_cuckoo else
            bloom_build(all_seen, cfg.n_shards, new_cap, cfg.fpp)
        )
        wh.overwrite("seen_shards", rebuilt)
    return stats


def asof_fetch(pages: DataFrame, scheduled: DataFrame, round_ts, cfg,
               n_scheduled: int, n_extract_parts: int):
    """As-of fetch join (F6/F7), late-materialized. Returns
    ``(fetch_df, is_warc)`` — the pre-extraction DataFrame plus whether it
    carries WARC pointers (ranged-read path) or inline html.

    Plan shape (asserted by tests/test_plans.py): pick each url's winning
    capture on a SLIM scan (url, warc_ts, capture id — a few MB through the
    shuffle), then join the winners back into the wide scan so MB-scale
    html never enters an Exchange — at corpus scale the html shuffle, not
    the join, is the bottleneck. `pages` arrives host_bucket-pruned.

    Broadcast-hint gate (CrawlConfig.broadcast_max_rows): the scheduled /
    winner sets are all ≤ n_scheduled rows; hint only when that is provably
    small, else let the join shuffle and AQE pick the strategy — an
    unconditional hint OOMs the driver on a 10^7-row cluster-scale round.

    Capture identity: two captures of a url may legally share warc_ts;
    without a unique tiebreak in both the window ORDER BY and the join-back
    keys, the join-back would emit BOTH tied captures (duplicate extracted
    rows — ADVICE r1). File path + parquet row index uniquely identify a
    physical row, are stable across the slim and wide scans of the same
    snapshot, and make the pick deterministic: the tied capture latest in
    file order wins (matches the pure oracle's caps[-1] under its
    sorted-file read order — SEMANTICS.md §6)."""
    bc = (F.broadcast if n_scheduled <= cfg.broadcast_max_rows
          else (lambda df: df))
    cap_cols = [
        F.col("_metadata.file_path").alias("_cap_f"),
        F.col("_metadata.row_index").alias("_cap_i"),
    ]
    cap_keys = ["url", "warc_ts", "_cap_f", "_cap_i"]
    sched_slim = scheduled.select("url", "depth", "score")
    # depth/score ride along through the winner pick (they are constant
    # per url, the window's partition key), so the winners row already
    # carries everything the extraction needs — ONE broadcast of the
    # scheduled set and ONE of the winners, no second scheduled join-back
    # (broadcast builds are per-round serial latency; a prior attempt to
    # share one sched_slim broadcast between a semi filter and a final
    # join was defeated by Catalyst column pruning, which specialized the
    # semi side to url-only and produced two distinct exchanges anyway).
    slim = (
        pages.select("url", "warc_ts", *cap_cols)
        .filter(F.col("warc_ts") <= F.lit(round_ts))
        .join(bc(sched_slim), "url")
    )
    w_asof = Window.partitionBy("url").orderBy(
        F.desc("warc_ts"), F.desc("_cap_f"), F.desc("_cap_i")
    )
    winners = (
        slim.withColumn("_rn", F.row_number().over(w_asof))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # Redistribute the ≤max_round_urls fetched rows round-robin before
    # extraction: hosts are contiguous in corpus files, so matched pages
    # cluster in few scan partitions (a mega-host → one straggler
    # extractor) — and slim/WARC-gzipped rows make this shuffle cheap.
    if "warc_file" in pages.columns:
        # WARC corpus (S1b): bodies live in packfiles; fetch+extract is
        # one fused Python pass doing ranged reads — page bytes never
        # enter the JVM (see extract.warc_fetch_extract).
        fetch_meta = pages.select(
            "url", "warc_ts", "warc_file", "warc_offset", "warc_len",
            *cap_cols
        ).join(bc(winners), cap_keys).drop("_cap_f", "_cap_i")
        return fetch_meta.repartition(n_extract_parts), True
    latest = pages.select("url", "warc_ts", "html", *cap_cols).join(
        bc(winners), cap_keys
    ).drop("_cap_f", "_cap_i")
    return latest.repartition(n_extract_parts), False


def revisit_due(fetch_log: DataFrame, text: DataFrame, cfg: CrawlConfig,
                rnd: int) -> DataFrame:
    """Due-for-revisit urls before round `rnd` (SEMANTICS.md §16).

    History = every committed ok fetch (fetch_log, rounds < rnd) joined
    to its extraction fingerprint (the text table's enrichment column),
    with `changed` = fingerprint differs from the previous ok fetch of
    the same url (one url-keyed lag window). recrawl_due keeps keys
    whose estimated change interval has elapsed; `overdue` becomes the
    candidate score, so pages that change often (or are longest-
    unvisited) are revisited first, and children discovered on a
    revisited page inherit freshness-weighted scores through the normal
    child_score path.

    Scale shape: slim columns only (url, host, round, fingerprint —
    text NEVER moves), one (url, round) equi-join, one url-keyed lag
    window, then recrawl_due's single hash agg which REUSES the
    window's url partitioning (grouped by url alone) — no further
    exchange. Epochs use CrawlConfig.epoch's float discipline so
    overdue is bit-identical to the pure oracle's."""
    fl = (
        fetch_log
        .filter((F.col("status") == "ok") & (F.col("round") < rnd))
        .select("url", "host", "round")
    )
    fp = text.select("url", "round", "fingerprint")
    hist = fl.join(fp, ["url", "round"]).withColumn(
        "ts_epoch",
        F.lit(cfg.epoch(0)) + F.lit(float(cfg.round_seconds)) * F.col("round"),
    )
    w = Window.partitionBy("url").orderBy("round")
    hist = hist.withColumn("_prev", F.lag("fingerprint").over(w)).withColumn(
        "changed",
        F.col("_prev").isNotNull() & (F.col("fingerprint") != F.col("_prev")),
    )
    return recrawl_due(hist, cfg.epoch(rnd), cfg.recrawl_min_interval_s,
                       cfg.recrawl_max_interval_s)


class Crawler:
    def __init__(self, spark: SparkSession, wh: Warehouse,
                 cfg: CrawlConfig | None = None):
        self.spark = spark
        self.wh = wh
        self.cfg = cfg or CrawlConfig()
        self.log = RoundLog(wh.root)
        # Deferred tail of the previous round (metrics-only sinks + the
        # round commit) — see run_round's sink section.
        self._pending: "threading.Thread | None" = None
        self._pending_err: list[BaseException] = []
        # Robots-derived tables are static across rounds (rules are
        # written once at init): build + cache them on first use instead
        # of re-reading and re-aggregating the rules parquet every round.
        self._rule_arrays: DataFrame | None = None
        self._host_delay: DataFrame | None = None

    def _robots_tables(self) -> tuple[DataFrame, DataFrame]:
        if self._rule_arrays is None:
            rules = self.wh.read("rules")
            self._rule_arrays = build_rule_arrays(rules).cache()
            self._host_delay = host_delay_table(rules).cache()
        return self._rule_arrays, self._host_delay

    def _join_pending(self) -> None:
        if self._pending is not None:
            self._pending.join()
            self._pending = None
            if self._pending_err:
                err = self._pending_err[0]
                self._pending_err = []
                raise RuntimeError("deferred sink/commit failed") from err

    # -- setup ---------------------------------------------------------------
    def init_tables(self, pages: DataFrame, seeds: DataFrame,
                    robots: DataFrame,
                    pages_files: list[str] | None = None) -> None:
        """Materialize corpus + round-0 state. Pages are partition-keyed by
        host_bucket so per-round fetch joins can prune (S1).

        If the corpus already carries host_bucket the rewrite is skipped;
        with `pages_files` the existing parquet is adopted zero-copy
        (Iceberg add_files equivalent) — at bench/cluster scale rewriting
        a multi-GB corpus just to catalog it is pure waste, and the
        host_bucket shuffle (only 32 distinct keys → hash collisions +
        mega-host straggler) is the worst shuffle in the pipeline."""
        cfg = self.cfg

        def rekey(df: DataFrame) -> DataFrame:
            return df.drop("host_bucket").withColumn(
                "host_bucket",
                host_bucket(F.lower(F.expr("parse_url(url, 'HOST')")),
                            cfg.host_buckets),
            ).repartition(cfg.host_buckets, "host_bucket")

        if pages_files is not None:
            self.wh.register("pages", pages_files)
            if "host_bucket" in pages.columns and not self._buckets_ok():
                # The adopted corpus was bucketed with a different fan-out/
                # hash than cfg.host_buckets: the per-round bucket pruning
                # filter would silently drop scheduled pages (fetches
                # become misses with no error — ADVICE r1). Fall back to
                # the re-keyed rewrite.
                self.wh.overwrite("pages", rekey(self.wh.read("pages")))
        elif "host_bucket" in pages.columns:
            self.wh.overwrite("pages", pages)
        else:
            self.wh.overwrite("pages", rekey(pages))
        self.wh.overwrite("robots", robots)
        rules = build_rule_table(self.wh.read("robots"), cfg.agent)
        self.wh.overwrite("rules", rules)

        frontier0 = self._seedlike_frontier(
            seeds.select(F.col("url"), F.col("score").alias("_s")))
        if cfg.use_sitemaps:
            sm = self._sitemap_frontier()
            if sm is not None:
                frontier0 = frontier0.unionByName(sm)
        self.wh.overwrite("frontier", dedupe_frontier(frontier0))
        empty_seen = self.spark.createDataFrame([], "url string, round int")
        self.wh.overwrite("seen", empty_seen)
        empty_state = self.spark.createDataFrame([], "host string, last_round int")
        self.wh.overwrite("host_state", empty_state)
        self.log.commit(0, self._snapshots(), {"round": 0})

    def _seedlike_frontier(self, raw: DataFrame) -> DataFrame:
        """Canonicalize (url, _s) rows into round-1 frontier rows with
        seed semantics: depth 0, score = base[0] + w2 * _s, no source
        url. Shared by the seed list and the sitemap-discovered URLs so
        both enter scheduling identically (SEMANTICS.md §3, §15)."""
        base0 = self.cfg.depth_base()[0]
        return (
            with_url_norm(raw)
            .withColumn("depth", F.lit(0))
            .withColumn(
                "score",
                F.lit(base0) + F.lit(self.cfg.w2) * F.col("_s").cast("double"),
            )
            .withColumn("discovered_ts", F.lit(self.cfg.round_ts(0)))
            .withColumn("src_url", F.lit(None).cast("string"))
            .withColumn("for_round", F.lit(1))
            .drop("_s")
        )

    def _sitemap_frontier(self) -> DataFrame | None:
        """S11 wired into the crawl (VERDICT r4 #2): robots `Sitemap:`
        directives → canonicalize (U1) → as-of fetch of the sitemap XML
        from the pages corpus at round_ts(0) → JVM regex parse
        (sources.parse_sitemaps), one level of `<sitemapindex>`
        recursion per the protocol → (loc, max priority) seed rows.
        Returns round-1 frontier rows (seed semantics: depth 0, score
        base[0] + w2·priority) or None when no directive resolves.

        The discovered rows then flow the NORMAL path — dedupe_frontier
        merge with the seeds, seen-filter (D3/D5), robots verdicts,
        politeness, ranking — so a sitemap URL is never exempt from any
        gate. Sitemap fetches themselves touch no crawl state (not
        `seen`, no fetch_log rows): sitemaps are a discovery source,
        not crawl targets; a sitemap URL that is ALSO a page link gets
        crawled like any page.

        Scale shape: the robots table is broadcast-scale by
        construction (one row per host with rules); directives and
        level-1 XML rows are a sliver of that; each fetch is one
        broadcast semi-join against the pages scan (host_bucket-prunable
        like the round fetch) + a per-url latest-capture window over
        ONLY matched sitemap captures. Runs once at init — robots (and
        thus directives) are static across rounds.

        Inline-html corpora only: a WARC-pointer corpus would fetch
        sitemap bytes via the ranged-read path — documented seam, not
        wired (bench/cluster corpora run with use_sitemaps off)."""
        from lectura.sources import parse_sitemaps, seeds_from_sitemaps, \
            sitemaps_from_robots
        from lectura.urlnorm import canonicalize_udf

        pages = self.wh.read("pages")
        if "html" not in pages.columns:
            raise ValueError(
                "use_sitemaps requires an inline-html pages corpus "
                "(WARC-pointer corpora: fetch sitemap bytes upstream)")
        cutoff = self.cfg.round_ts(0)
        cand = pages.select("url", "warc_ts", "html").filter(
            F.col("warc_ts") <= F.lit(cutoff))

        def fetch_xml(urls_df: DataFrame) -> DataFrame:
            w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
            return (
                cand.join(F.broadcast(urls_df), "url")
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select(
                    "url",
                    F.expr("parse_url(url, 'HOST')").alias("host"),
                    F.col("html").cast("string").alias("xml"),
                )
            )

        sm = (
            sitemaps_from_robots(self.wh.read("robots"))
            .select(canonicalize_udf("sitemap_url").alias("url"))
            .filter(F.col("url").isNotNull()).distinct()
        )
        parsed1 = parse_sitemaps(fetch_xml(sm), xml_col="xml")
        subs = (
            parsed1.filter(F.col("kind") == "sitemap")
            .select(canonicalize_udf("loc").alias("url"))
            .filter(F.col("url").isNotNull()).distinct()
        )
        parsed2 = parse_sitemaps(fetch_xml(subs), xml_col="xml")
        entries = parsed1.unionByName(parsed2)
        sm_seeds = seeds_from_sitemaps(entries)  # (url=raw loc, score)
        if sm_seeds.isEmpty():
            return None
        return self._seedlike_frontier(
            sm_seeds.select("url", F.col("score").alias("_s")))

    def _buckets_ok(self, sample: int = 2000) -> bool:
        """Verify (on a bounded sample) that the adopted corpus's recorded
        host_bucket matches this config's hash + fan-out. Data-derived —
        no reliance on sidecar metadata being kept in sync."""
        expected = host_bucket(
            F.lower(F.expr("parse_url(url, 'HOST')")), self.cfg.host_buckets
        )
        mismatches = (
            self.wh.read("pages").select("url", "host_bucket").limit(sample)
            .filter(F.col("host_bucket") != expected)
            .count()
        )
        return mismatches == 0

    def _snapshots(self) -> dict[str, int | None]:
        snaps: dict[str, int | None] = {}
        for t in STATE_TABLES + ["pages", "robots", "rules"]:
            snaps[t] = self.wh.snapshot(t) if self.wh.exists(t) else None
        return snaps

    # -- one round -------------------------------------------------------------
    def _revisit_candidates(self, rnd: int) -> DataFrame:
        """C2 wired into the crawl loop (SEMANTICS.md §16): frontier-shaped
        candidates for a REVISIT round, computed from the warehouse's own
        fetch history instead of the frontier table. depth is 0 by
        definition (a revisit is a root-like fetch)."""
        due = revisit_due(self.wh.read("fetch_log"), self.wh.read("text"),
                          self.cfg, rnd)
        return with_url_parts(
            due.select("url", F.lit(0).alias("depth"),
                       F.col("overdue").alias("score"))
        )

    def run_round(self, rnd: int, revisit: bool = False) -> dict:
        cfg, wh, spark = self.cfg, self.wh, self.spark
        round_ts = cfg.round_ts(rnd)
        t0 = time.time()
        trace: list[tuple[str, float]] = []
        _last = [time.time()]

        def mark(label: str) -> None:
            now = time.time()
            trace.append((label, round(now - _last[0], 2)))
            _last[0] = now

        spark.sparkContext.setJobDescription(f"r{rnd}:schedule")
        frontier = wh.read("frontier").filter(F.col("for_round") == rnd)
        seen = wh.read("seen")
        rule_arrays, host_delay = self._robots_tables()
        # host_state is stored as (host, last_round) deltas appended per
        # round (no full-table rewrite); the current state is the max-merge
        # over the delta chain. Footer row count (driver metadata read, no
        # job) upper-bounds its size for the broadcast-hint gate.
        host_state = (
            wh.read("host_state")
            .groupBy("host")
            .agg(F.max("last_round").alias("last_round"))
        )
        hs_small = wh.approx_rows("host_state") <= cfg.broadcast_max_rows

        if revisit:
            # Revisit round (SEMANTICS.md §16): candidates come from the
            # recrawl-due estimator over committed fetch history, NOT the
            # frontier (which passes through untouched below). No seen
            # filter (every candidate is seen by construction) and no
            # robots pass (history contains only fetches that robots
            # allowed, and rules are static within a crawl). The deferred
            # laggard sinks include fetch_log — join them before reading.
            self._join_pending()
            verdict = None
            blocked = None
            allowed = self._revisit_candidates(rnd)
        else:
            # Candidate set: the frontier table is INVARIANTLY written
            # url-deduped (init_tables and next_frontier both pass through
            # dedupe_frontier before the append; resume restores committed
            # snapshots only), so the per-round re-dedupe would be a pure
            # no-op shuffle+sort of the whole frontier — skip it.
            cand = frontier.drop("for_round")
            if cfg.use_bloom and wh.exists("seen_shards"):
                shards = wh.read("seen_shards")
                probe = (cuckoo_probe if cfg.seen_filter == "cuckoo"
                         else bloom_probe)
                cand = (
                    probe(cand, shards, cfg.n_shards)
                    .filter(~F.col("maybe_seen"))
                    .drop("maybe_seen", "shard_id", "url_key")
                )
            else:
                cand = anti_join_seen(cand, seen)

            # robots verdicts (broadcast rules + longest-match window)
            verdict = apply_robots(cand, rule_arrays=rule_arrays).cache()
            allowed = verdict.filter(F.col("allowed")).drop("allowed")
            blocked = verdict.filter(~F.col("allowed")).select("url")

        # politeness + ranking + global deterministic cap
        budgeted = with_budget(allowed, host_delay, host_state,
                               cfg, rnd, broadcast_hint=hs_small)
        ranked = rank_per_host(budgeted, cfg.salt_buckets,
                               max_rank=cfg.max_per_host)
        # Materialize the schedule AS the scheduled-table append (S6-style):
        # one job instead of cache-materialize + a later sink write, and no
        # columnar cache. n_scheduled comes from parquet footers; the
        # host_bucket prune set rides the SAME write job as an Observation
        # (collect_set over ≤ cfg.host_buckets values) — zero extra Spark
        # jobs and O(#buckets), not O(round-size), driver traffic (VERDICT
        # r2: the previous pyarrow full-column read was ~80 MB/round at
        # 10^7-URL cluster rounds). Downstream consumers re-read the
        # written parquet column-pruned.
        from pyspark.sql import Observation

        sched_obs = Observation(f"r{rnd}-sched-buckets")
        sched_snap = wh.append(
            "scheduled",
            schedule(ranked, cfg).select(
                "sched_rank", "url", "host", "hrk", "path_q", "depth", "score"
            ).withColumn("round", F.lit(rnd))
            .withColumn("host_bucket", host_bucket("host", cfg.host_buckets))
            .observe(sched_obs,
                     F.collect_set("host_bucket").alias("buckets"))
            # fan-in derived from the cap (the row-count bound known
            # before the write) — a no-op when the plan already has
            # fewer partitions (the small-cap TakeOrdered path)
            .coalesce(cfg.sink_fan_in(cfg.max_round_urls)),
        )
        sched_files = wh.files_added("scheduled", sched_snap)
        n_scheduled = wh.count_rows(sched_files)
        buckets: set[int] = set(sched_obs.get["buckets"])
        scheduled = (
            wh.read("scheduled").filter(F.col("round") == rnd)
            .drop("round", "host_bucket")
        )
        mark("schedule")

        pages = wh.read("pages")
        if n_scheduled and "host_bucket" in pages.columns:
            pages = pages.filter(F.col("host_bucket").isin(sorted(buckets)))
        n_extract_parts = max(
            64, int(spark.conf.get("spark.sql.shuffle.partitions", "32")) * 4
        )
        fetch_df, is_warc = asof_fetch(
            pages, scheduled, round_ts, cfg, n_scheduled, n_extract_parts
        )
        if is_warc:
            extract_df = warc_fetch_extract(fetch_df)
        else:
            # Fused extraction (X4) — html crosses to Python exactly once.
            extract_df = extract_pages(fetch_df, gzipped=cfg.html_gzip)
        # Materialize the extraction ONCE as the text sink itself (S7) and
        # re-read it (column-pruned parquet, round pruned by row-group
        # stats) for every downstream consumer — text+links never sit in a
        # columnar memory cache (MB-scale strings there mean GC churn that
        # stalls all 32 cores), and the written table doubles as the
        # round's resume artifact (ST8).
        spark.sparkContext.setJobDescription(f"r{rnd}:extract-write")
        text_snap = wh.append("text", extract_df.withColumn("round", F.lit(rnd)))
        spark.sparkContext.setJobDescription(f"r{rnd}:counts")
        extracted = wh.read("text").filter(F.col("round") == rnd).drop("round")

        # Round-cap-sized sets (scheduled / extracted ≤ n_scheduled rows):
        # broadcast only when provably small, else shuffle + AQE (VERDICT
        # r1 #3 — an unconditional hint OOMs the driver at cluster scale).
        bc = (F.broadcast if n_scheduled <= cfg.broadcast_max_rows
              else (lambda df: df))
        ok_log = (
            extracted.join(bc(scheduled.select("url", "host")), "url")
            .select(
                F.lit(rnd).alias("round"), "host", "url",
                F.lit("ok").alias("status"), F.col("bytes"), F.col("n_links"),
            )
        )
        miss_log = (
            scheduled.join(bc(extracted.select("url")), "url", "left_anti")
            .select(
                F.lit(rnd).alias("round"), "host", "url",
                F.lit("miss").alias("status"),
                F.lit(0).cast("long").alias("bytes"),
                F.lit(0).alias("n_links"),
            )
        )
        fetch_log = ok_log.unionByName(miss_log)

        # children: explode canonical outlinks, score via precomputed
        # depth-base literals (bit-identical floats vs the oracle)
        base = cfg.depth_base()
        base_map = F.create_map(
            *[F.lit(x) for kv in base.items() for x in kv]
        )
        children_raw = (
            extracted.filter(F.col("depth") + 1 <= cfg.max_depth)
            .select(
                F.col("url").alias("src_url"),
                (F.col("depth") + 1).alias("depth"),
                F.col("score").alias("_parent_score"),
                F.explode("links").alias("url"),
            )
            .withColumn(
                "score",
                base_map[F.col("depth")] +
                F.lit(cfg.w2) * F.col("_parent_score"),
            )
            .drop("_parent_score")
        )
        # Pre-reduce per RAW link before canonicalization: pages link the
        # same targets repeatedly (nav/listing structure), so the best row
        # per raw string — order (score desc, depth asc, src asc), encoded
        # as a struct-min; discovered_ts is constant within a round — is a
        # partial-aggregating groupBy that shrinks the canonicalize UDF's
        # Arrow traffic and the dedupe window input by the repeat factor.
        # Sound because same-raw ⇒ same-canonical and the kept row
        # dominates the dropped ones under dedupe_frontier's global order
        # (SEMANTICS.md §4); dedupe_frontier still merges across raw
        # variants afterwards. Outlinks are already canonical (X1
        # canonicalizes at resolve time), so with_url_parts only derives
        # host/hrk/path_q — no second canonicalize pass through Python.
        def reduce_children(src: DataFrame) -> DataFrame:
            return with_url_parts(
                src.groupBy("url")
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("score")).alias("_ns"),
                            F.col("depth").alias("depth"),
                            F.col("src_url").alias("src_url"),
                            F.col("score").alias("score"),
                        )
                    ).alias("_b")
                )
                .select(
                    "url",
                    F.col("_b.depth").alias("depth"),
                    F.col("_b.score").alias("score"),
                    F.col("_b.src_url").alias("src_url"),
                )
                .withColumn("discovered_ts", F.lit(round_ts))
            )

        if revisit:
            # Unscheduled-but-due revisits are NOT re-queued: due-ness is
            # recomputed fresh from history next revisit round, so the
            # pending frontier passes through untouched and merges only
            # with the newly-discovered children. Nothing new becomes
            # seen (every revisit is seen by construction).
            leftovers = frontier.drop("for_round")
            new_seen = None
            seen_rows = wh.approx_rows("seen")
            seen_all = seen.select("url")
        else:
            leftovers = allowed.join(
                bc(scheduled.select("url")), "url", "left_anti")
            new_seen = (scheduled.select("url").unionByName(blocked)
                        .distinct().cache())
            # seen grows with the crawl: broadcast the anti-join side only
            # while its footer-counted row bound stays under the gate, else
            # shuffle (same scale rule as host_state).
            seen_rows = wh.approx_rows("seen") + 2 * n_scheduled
            seen_all = seen.select("url").unionByName(new_seen)
        if seen_rows <= cfg.broadcast_max_rows:
            # Seen-filter EARLY, while it is a broadcast-hash anti-join:
            # children link overwhelmingly to just-scheduled pages (nav
            # structure), so filtering before the pre-reduce groupBy and
            # the dedupe window kills most child rows in the scan stage —
            # before either shuffle. Sound because an anti-join on url
            # commutes with per-url best-row selection (dedupe_frontier)
            # and with the same-url pre-reduce: dropping ALL rows of a
            # seen url before or after picking its best row leaves the
            # same survivor set (SEMANTICS.md §4). children_raw is
            # filtered upstream of its groupBy so the partial agg and the
            # parts-UDF see only surviving urls.
            bseen = F.broadcast(seen_all)
            children = reduce_children(
                children_raw.join(bseen, "url", "left_anti")
            )
            next_frontier = dedupe_frontier(
                leftovers.join(bseen, "url", "left_anti")
                .select(*children.columns)
                .unionByName(children)
            ).withColumn("for_round", F.lit(rnd + 1))
        else:
            # seen outgrew the broadcast gate: a shuffled anti-join is
            # cheapest AFTER dedupe (fewer, distinct rows through the
            # join's exchange), so filter late and let AQE pick.
            children = reduce_children(children_raw)
            next_frontier = (
                dedupe_frontier(
                    leftovers.select(*children.columns)
                    .unionByName(children)
                )
                .join(seen_all, "url", "left_anti")
                .withColumn("for_round", F.lit(rnd + 1))
            )

        # ---- writes (all appended, committed atomically via RoundLog) -----
        # Materialize the two shared caches with cheap actions first, then
        # fan the independent sink writes out over driver threads: Spark
        # schedules the jobs concurrently, so the many small sinks
        # (fetch_log, seen, host_state, lineage, metrics) cost one job
        # latency instead of a serial sum — on a real cluster these are
        # separate Iceberg commits and equally independent.
        # extracted row count from parquet footers (no Spark job)
        n_extracted = wh.count_rows(wh.files_added("text", text_snap))
        mark("materialize")

        def w_frontier():
            wh.append("frontier", next_frontier)

        def w_fetch_log():
            # metrics is a rollup OF fetch_log: write the log once, then
            # roll up from the written parquet (slim, round-pruned) instead
            # of recomputing the ok/miss joins a second time in a parallel
            # sink.
            wh.append("fetch_log",
                      fetch_log.coalesce(cfg.sink_fan_in(n_scheduled)))
            wh.append(
                "metrics",
                fetch_metrics(
                    wh.read("fetch_log").filter(F.col("round") == rnd)
                ).coalesce(1),
            )

        def w_seen():
            if revisit:
                return
            wh.append(
                "seen",
                new_seen.select("url", F.lit(rnd).alias("round"))
                .coalesce(cfg.sink_fan_in(2 * n_scheduled)),
            )

        def w_bloom():
            if revisit or not cfg.use_bloom:
                return
            commit_bloom(wh, spark, cfg, rnd, seen, new_seen)

        def w_host_state():
            # Delta append + max-merge on read (see run_round's host_state
            # read): host_state grows with total distinct hosts, so a
            # merged coalesce(1) rewrite per round is a serial single-task
            # full-table write at 10^8 hosts. The delta is bounded by the
            # round's scheduled hosts. Compact the delta chain once it gets
            # long — a distributed hash-partitioned rewrite, no coalesce(1).
            touched = scheduled.select(
                "host", F.lit(rnd).alias("last_round")
            ).distinct()
            wh.append("host_state",
                      touched.coalesce(cfg.sink_fan_in(n_scheduled)))
            if len(wh._files("host_state")) > 64:
                merged = (
                    wh.read("host_state")
                    .groupBy("host").agg(F.max("last_round").alias("last_round"))
                )
                wh.overwrite(
                    "host_state", merged.repartition(cfg.host_buckets, "host")
                )

        def w_lineage():
            wh.append(
                "lineage",
                partition_lineage(scheduled).select(
                    F.lit(rnd).alias("round"),
                    F.lit("scheduled").alias("table"), "*",
                ).coalesce(1),
            )

        # Sink split (latency, not correctness): the CRITICAL sinks feed
        # round r+1's reads (frontier, seen, seen_shards, host_state) and
        # are awaited here; the LAGGARD sinks (fetch_log → metrics,
        # lineage) feed nothing downstream, so they and the round commit
        # run on a deferred thread OVERLAPPED with round r+1's schedule/
        # extract phases — per-round serial latency is the scaling tax at
        # every parallelism level. Correctness: round r+1's own sink phase
        # joins the deferred thread before touching any table (no
        # concurrent same-table manifest commits); the commit's per-table
        # snapshots are captured at this sync point and patched for the
        # laggard tables after their writes, so a crash anywhere in the
        # window restores exactly round r (kill/resume test).
        critical = [w_frontier, w_seen, w_bloom, w_host_state]
        laggard = [w_fetch_log, w_lineage]
        from concurrent.futures import ThreadPoolExecutor

        sink_secs: dict[str, float] = {}

        def _run_sink(fn):
            spark.sparkContext.setJobDescription(f"r{rnd}:{fn.__name__}")
            t = time.time()
            try:
                return fn()
            finally:
                sink_secs[fn.__name__] = round(time.time() - t, 2)

        self._join_pending()
        pool = ThreadPoolExecutor(max_workers=len(critical) + len(laggard))
        crit_futs = {pool.submit(_run_sink, fn): fn.__name__
                     for fn in critical}
        lag_futs = {pool.submit(_run_sink, fn): fn.__name__ for fn in laggard}
        for fut, name in crit_futs.items():
            try:
                fut.result()
            except Exception as e:
                pool.shutdown(wait=True)
                raise RuntimeError(f"sink {name} failed in round {rnd}") from e
        mark("w_sinks")
        snaps = self._snapshots()
        stats = {
            "round": rnd,
            "scheduled": int(n_scheduled),
            "extracted": int(n_extracted),
            "seconds": round(time.time() - t0, 3),
        }
        if verdict is not None:
            verdict.unpersist()
        if new_seen is not None:
            new_seen.unpersist()

        def _finish():
            try:
                for fut, name in lag_futs.items():
                    fut.result()
                for tname in ("fetch_log", "metrics", "lineage"):
                    snaps[tname] = (self.wh.snapshot(tname)
                                    if self.wh.exists(tname) else None)
                if os.environ.get("LECTURA_TRACE"):
                    stats["trace"] = trace
                    stats["sinks"] = sink_secs
                self.log.commit(rnd, snaps, stats)
            except BaseException as e:  # surfaced at the next join point
                self._pending_err.append(e)
            finally:
                pool.shutdown(wait=False)

        import threading

        self._pending = threading.Thread(target=_finish, daemon=True)
        self._pending.start()
        return stats

    # -- loop -----------------------------------------------------------------
    def run(self, rounds: int, resume: bool = True,
            recrawl_rounds: int = 0) -> list[dict]:
        """`rounds` discovery rounds, then `recrawl_rounds` revisit rounds
        (SEMANTICS.md §16) — numbered rounds+1 … rounds+K so checkpoint/
        resume treats them as ordinary rounds."""
        start = 0
        if resume:
            last = self.log.last_committed()
            if last is not None:
                self.log.restore(self.wh, last)
                start = last
        stats = []
        for rnd in range(start + 1, rounds + recrawl_rounds + 1):
            stats.append(self.run_round(rnd, revisit=rnd > rounds))
        # the final round's deferred sinks + commit must land before the
        # crawl is considered done (and before any reader trusts the log)
        self._join_pending()
        return stats

    # -- convenience ------------------------------------------------------------
    def scheduled_df(self, rnd: int) -> DataFrame:
        """Ordered schedule of a committed round (the judged artifact)."""
        return (
            self.wh.read("scheduled")
            .filter(F.col("round") == rnd)
            .drop("round", "host_bucket")
            .orderBy("sched_rank")
        )


def main() -> None:
    ap = argparse.ArgumentParser(description="lectura crawl (spark-submit entry)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--n-urls", type=int, default=100_000)
    ap.add_argument("--n-hosts", type=int, default=200)
    ap.add_argument("--use-bloom", action="store_true")
    ap.add_argument("--seen-filter", default="bloom",
                    choices=["bloom", "cuckoo"],
                    help="approximate seen-set backend (with --use-bloom)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--max-round-urls", type=int, default=10_000)
    ap.add_argument("--recrawl-rounds", type=int, default=0,
                    help="revisit rounds appended after the discovery "
                         "rounds (SEMANTICS.md §16)")
    ap.add_argument("--recrawl-min-s", type=float, default=3600.0,
                    help="recrawl estimator clamp floor (seconds)")
    ap.add_argument("--recrawl-max-s", type=float, default=30.0 * 86400.0,
                    help="recrawl estimator clamp ceiling (seconds)")
    args = ap.parse_args()

    from lectura.session import get_spark
    from lectura.synth_spark import materialize_corpus
    from lectura.synth import SynthParams

    spark = get_spark(master=args.master, app_name="lectura-crawl")
    wh = Warehouse(args.warehouse, spark)
    cfg = CrawlConfig(use_bloom=args.use_bloom,
                      seen_filter=args.seen_filter,
                      max_round_urls=args.max_round_urls,
                      recrawl_min_interval_s=args.recrawl_min_s,
                      recrawl_max_interval_s=args.recrawl_max_s)
    crawler = Crawler(spark, wh, cfg)
    if not wh.exists("pages"):
        p = SynthParams(n_urls=args.n_urls, n_hosts=args.n_hosts)
        pages, seeds, robots = materialize_corpus(spark, p)
        crawler.init_tables(pages, seeds, robots)
    for s in crawler.run(args.rounds, recrawl_rounds=args.recrawl_rounds):
        print(s)


if __name__ == "__main__":
    main()
