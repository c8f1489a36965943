"""One bench measurement in a fresh JVM: crawl N rounds over a pre-built
pages corpus at a given --master, print one JSON result line.

Invoked by bench.py via subprocess so each parallelism level (local[8] vs
local[32] — the sandbox stand-in for N vs 4N executors, BASELINE.md) gets
an isolated SparkSession/JVM."""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--corpus", required=True, help="dir with pages/seeds/robots parquet")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--max-round-urls", type=int, default=100_000)
    ap.add_argument("--max-per-host", type=int, default=50_000)
    ap.add_argument("--default-delay", type=float, default=0.001)
    ap.add_argument("--use-bloom", action="store_true")
    args = ap.parse_args()

    from lectura.config import CrawlConfig
    from lectura.crawl import Crawler
    from lectura.session import get_spark
    from lectura.tables import Warehouse

    spark = get_spark(master=args.master, app_name=f"lectura-bench-{args.master}")
    cfg = CrawlConfig(
        max_round_urls=args.max_round_urls,
        max_per_host=args.max_per_host,
        default_delay=args.default_delay,
        use_bloom=args.use_bloom,
        seen_capacity=20_000_000,
    )
    shutil.rmtree(args.warehouse, ignore_errors=True)
    wh = Warehouse(args.warehouse, spark)
    crawler = Crawler(spark, wh, cfg)

    pages = spark.read.parquet(f"{args.corpus}/pages")
    seeds = spark.read.parquet(f"{args.corpus}/seeds")
    robots = spark.read.parquet(f"{args.corpus}/robots")

    t0 = time.time()
    crawler.init_tables(pages, seeds, robots)
    init_s = time.time() - t0

    t0 = time.time()
    stats = crawler.run(args.rounds)
    crawl_s = time.time() - t0

    scheduled = sum(s["scheduled"] for s in stats)
    extracted = sum(s["extracted"] for s in stats)
    out = {
        "master": args.master,
        "init_sec": round(init_s, 3),
        "crawl_sec": round(crawl_s, 3),
        "rounds": {f"round{s['round']}": s["seconds"] for s in stats},
        "traces": [s.get("trace") for s in stats],
        "scheduled": scheduled,
        "extracted": extracted,
        "urls_per_sec": round((scheduled + extracted) / crawl_s, 1),
    }
    print("BENCH_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
