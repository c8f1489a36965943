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
from lectura.extract import extract_pages
from lectura.frontier import dedupe_frontier, rank_per_host, schedule, with_budget
from lectura.metrics import fetch_metrics, partition_lineage
from lectura.robots import apply_robots, build_rule_table, host_delay_table
from lectura.seen import anti_join_seen, bloom_build, bloom_merge, bloom_probe
from lectura.tables import Warehouse
from lectura.urlnorm import host_bucket, with_url_norm

STATE_TABLES = ["frontier", "scheduled", "seen", "seen_shards", "host_state",
                "text", "fetch_log", "lineage", "metrics"]


class Crawler:
    def __init__(self, spark: SparkSession, wh: Warehouse,
                 cfg: CrawlConfig | None = None):
        self.spark = spark
        self.wh = wh
        self.cfg = cfg or CrawlConfig()
        self.log = RoundLog(wh.root)

    # -- setup ---------------------------------------------------------------
    def init_tables(self, pages: DataFrame, seeds: DataFrame,
                    robots: DataFrame) -> None:
        """Materialize corpus + round-0 state. Pages are partition-keyed by
        host_bucket so per-round fetch joins can prune (S1)."""
        cfg = self.cfg
        pages_keyed = pages.withColumn(
            "host_bucket",
            host_bucket(F.lower(F.expr("parse_url(url, 'HOST')")),
                        cfg.host_buckets),
        ).repartition(cfg.host_buckets, "host_bucket")
        self.wh.overwrite("pages", pages_keyed)
        self.wh.overwrite("robots", robots)
        rules = build_rule_table(self.wh.read("robots"), cfg.agent)
        self.wh.overwrite("rules", rules)

        base0 = cfg.depth_base()[0]
        frontier0 = (
            with_url_norm(seeds.select(F.col("url"), F.col("score").alias("_s")))
            .withColumn("depth", F.lit(0))
            .withColumn(
                "score", F.lit(base0) + F.lit(cfg.w2) * F.col("_s").cast("double")
            )
            .withColumn("discovered_ts", F.lit(cfg.round_ts(0)))
            .withColumn("src_url", F.lit(None).cast("string"))
            .withColumn("for_round", F.lit(1))
            .drop("_s")
        )
        self.wh.overwrite("frontier", dedupe_frontier(frontier0))
        empty_seen = self.spark.createDataFrame([], "url string, round int")
        self.wh.overwrite("seen", empty_seen)
        empty_state = self.spark.createDataFrame([], "host string, last_round int")
        self.wh.overwrite("host_state", empty_state)
        self.log.commit(0, self._snapshots(), {"round": 0})

    def _snapshots(self) -> dict[str, int | None]:
        snaps: dict[str, int | None] = {}
        for t in STATE_TABLES + ["pages", "robots", "rules"]:
            snaps[t] = self.wh.snapshot(t) if self.wh.exists(t) else None
        return snaps

    # -- one round -------------------------------------------------------------
    def run_round(self, rnd: int) -> dict:
        cfg, wh, spark = self.cfg, self.wh, self.spark
        round_ts = cfg.round_ts(rnd)
        t0 = time.time()
        trace: list[tuple[str, float]] = []
        _last = [time.time()]

        def mark(label: str) -> None:
            now = time.time()
            trace.append((label, round(now - _last[0], 2)))
            _last[0] = now

        frontier = wh.read("frontier").filter(F.col("for_round") == rnd)
        seen = wh.read("seen")
        rules = wh.read("rules")
        host_state = wh.read("host_state")

        # candidate set: dedupe, drop seen
        cand = dedupe_frontier(frontier.drop("for_round"))
        if cfg.use_bloom and wh.exists("seen_shards"):
            shards = wh.read("seen_shards")
            cand = (
                bloom_probe(cand, shards, cfg.n_shards)
                .filter(~F.col("maybe_seen"))
                .drop("maybe_seen", "shard_id", "url_key")
            )
        else:
            cand = anti_join_seen(cand, seen)

        # robots verdicts (broadcast rules + longest-match window)
        verdict = apply_robots(cand, rules).cache()
        allowed = verdict.filter(F.col("allowed")).drop("allowed")
        blocked = verdict.filter(~F.col("allowed")).select("url")

        # politeness + ranking + global deterministic cap
        budgeted = with_budget(allowed, host_delay_table(rules), host_state,
                               cfg, rnd)
        ranked = rank_per_host(budgeted, cfg.salt_buckets)
        scheduled = schedule(ranked, cfg).select(
            "sched_rank", "url", "host", "hrk", "path_q", "depth", "score"
        ).cache()
        n_scheduled = scheduled.count()
        mark("schedule")

        # as-of fetch join (F6/F7): broadcast the ≤max_round_urls schedule
        # into the big pages scan, prune page partitions by host_bucket
        pages = wh.read("pages")
        sched_slim = scheduled.select("url", "depth", "score")
        if n_scheduled and "host_bucket" in pages.columns:
            buckets = [
                r[0]
                for r in scheduled.select(
                    host_bucket("host", cfg.host_buckets).alias("hb")
                ).distinct().collect()
            ]
            pages = pages.filter(F.col("host_bucket").isin(buckets))
        cand_pages = pages.filter(F.col("warc_ts") <= F.lit(round_ts)).join(
            F.broadcast(sched_slim), "url"
        )
        w_asof = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
        latest = (
            cand_pages.withColumn("_rn", F.row_number().over(w_asof))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

        # fused extraction (X4) — html crosses to Python exactly once
        extracted = extract_pages(latest).cache()

        ok_log = (
            extracted.join(scheduled.select("url", "host"), "url")
            .select(
                F.lit(rnd).alias("round"), "host", "url",
                F.lit("ok").alias("status"), F.col("bytes"), F.col("n_links"),
            )
        )
        miss_log = (
            scheduled.join(extracted.select("url"), "url", "left_anti")
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
            .withColumn("discovered_ts", F.lit(round_ts))
            .drop("_parent_score")
        )
        children = with_url_norm(children_raw)  # adds host/hrk/path_q

        leftovers = allowed.join(scheduled.select("url"), "url", "left_anti")
        new_seen = scheduled.select("url").unionByName(blocked).distinct().cache()
        next_frontier = (
            dedupe_frontier(
                leftovers.select(*children.columns)
                .unionByName(children.select(*children.columns))
            )
            .join(seen.select("url").unionByName(new_seen), "url", "left_anti")
            .withColumn("for_round", F.lit(rnd + 1))
        )

        # ---- writes (all appended, committed atomically via RoundLog) -----
        wh.append(
            "scheduled",
            scheduled.withColumn("round", F.lit(rnd)).coalesce(4),
        )
        mark("w_scheduled")
        wh.append(
            "text",
            extracted.select(F.lit(rnd).alias("round"), "url", "text"),
        )
        mark("w_text_extract")
        wh.append("frontier", next_frontier)
        mark("w_frontier")
        wh.append("fetch_log", fetch_log.coalesce(4))
        mark("w_fetch_log")
        wh.append(
            "seen", new_seen.select("url", F.lit(rnd).alias("round")).coalesce(4)
        )
        mark("w_seen")
        if cfg.use_bloom:
            new_shards = bloom_build(
                new_seen, cfg.n_shards,
                max(1024, cfg.seen_capacity // cfg.n_shards), cfg.fpp
            )
            if wh.exists("seen_shards"):
                merged = bloom_merge(
                    wh.read("seen_shards").unionByName(new_shards)
                )
                wh.overwrite("seen_shards", merged)
            else:
                wh.overwrite("seen_shards", new_shards)
        mark("w_bloom")
        touched = scheduled.select(
            "host", F.lit(rnd).alias("last_round")
        ).distinct()
        new_state = (
            wh.read("host_state").unionByName(touched)
            .groupBy("host").agg(F.max("last_round").alias("last_round"))
        )
        wh.overwrite("host_state", new_state.coalesce(1))
        mark("w_host_state")
        wh.append(
            "lineage",
            partition_lineage(scheduled).select(
                F.lit(rnd).alias("round"), F.lit("scheduled").alias("table"),
                "*",
            ).coalesce(1),
        )
        wh.append("metrics", fetch_metrics(fetch_log).coalesce(1))
        mark("w_lineage_metrics")

        n_extracted = extracted.count()
        stats = {
            "round": rnd,
            "scheduled": int(n_scheduled),
            "extracted": int(n_extracted),
            "seconds": round(time.time() - t0, 3),
        }
        if os.environ.get("LECTURA_TRACE"):
            stats["trace"] = trace
        self.log.commit(rnd, self._snapshots(), stats)
        verdict.unpersist()
        scheduled.unpersist()
        extracted.unpersist()
        new_seen.unpersist()
        return stats

    # -- loop -----------------------------------------------------------------
    def run(self, rounds: int, resume: bool = True) -> list[dict]:
        start = 0
        if resume:
            last = self.log.last_committed()
            if last is not None:
                self.log.restore(self.wh, last)
                start = last
        stats = []
        for rnd in range(start + 1, rounds + 1):
            stats.append(self.run_round(rnd))
        return stats

    # -- convenience ------------------------------------------------------------
    def scheduled_df(self, rnd: int) -> DataFrame:
        """Ordered schedule of a committed round (the judged artifact)."""
        return (
            self.wh.read("scheduled")
            .filter(F.col("round") == rnd)
            .orderBy("sched_rank")
        )


def main() -> None:
    ap = argparse.ArgumentParser(description="lectura crawl (spark-submit entry)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--n-urls", type=int, default=100_000)
    ap.add_argument("--n-hosts", type=int, default=200)
    ap.add_argument("--use-bloom", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--max-round-urls", type=int, default=10_000)
    args = ap.parse_args()

    from lectura.session import get_spark
    from lectura.synth_spark import materialize_corpus
    from lectura.synth import SynthParams

    spark = get_spark(master=args.master, app_name="lectura-crawl")
    wh = Warehouse(args.warehouse, spark)
    cfg = CrawlConfig(use_bloom=args.use_bloom,
                      max_round_urls=args.max_round_urls)
    crawler = Crawler(spark, wh, cfg)
    if not wh.exists("pages"):
        p = SynthParams(n_urls=args.n_urls, n_hosts=args.n_hosts)
        pages, seeds, robots = materialize_corpus(spark, p)
        crawler.init_tables(pages, seeds, robots)
    for s in crawler.run(args.rounds):
        print(s)


if __name__ == "__main__":
    main()
