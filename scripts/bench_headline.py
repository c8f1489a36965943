"""Quick bench iteration helper: generate the sf0.1 WARC corpus once into
a scratch dir (reused across invocations via --corpus), then run ONE
headline crawl at a given master and print the worker's JSON. Used while
optimizing; the driver-facing artifact remains bench.py."""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gen_corpus(corpus_dir: str, n_urls: int, scratch: str,
               n_seeds: int | None = None) -> None:
    os.environ.setdefault("PYSPARK_SUBMIT_ARGS",
                          ("--driver-memory 16g --driver-java-options "
         '"-XX:+ExplicitGCInvokesConcurrent -XX:+ParallelRefProcEnabled" '
         "pyspark-shell"))
    from pyspark.sql import functions as F

    from lectura.config import CrawlConfig
    from lectura.session import get_spark
    from lectura.synth import SynthParams
    from lectura.synth_spark import materialize_corpus_warc
    from lectura.urlnorm import host_bucket

    gen_local = os.path.join(scratch, "sparklocal-gen")
    os.makedirs(gen_local, exist_ok=True)
    spark = get_spark(master="local[32]", app_name="lectura-bench-gen",
                      extra={"spark.local.dir": gen_local})
    t0 = time.time()
    p = SynthParams(n_urls=n_urls, n_hosts=max(50, n_urls // 100),
                    n_seeds=n_seeds or max(200, n_urls // 20), body_kb=48.0,
                    with_text=False)
    pages, seeds, robots = materialize_corpus_warc(spark, p,
                                                   f"{corpus_dir}/warc")
    pages = pages.withColumn(
        "host_bucket",
        host_bucket(F.lower(F.expr("parse_url(url, 'HOST')")),
                    CrawlConfig().host_buckets),
    )
    pages.write.mode("overwrite").parquet(f"{corpus_dir}/pages")
    seeds.write.mode("overwrite").parquet(f"{corpus_dir}/seeds")
    robots.write.mode("overwrite").parquet(f"{corpus_dir}/robots")
    spark.stop()
    print(f"gen_sec={time.time() - t0:.1f}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/dev/shm/lectura_hb/corpus")
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--n-urls", type=int, default=1_000_000)
    ap.add_argument("--n-seeds", type=int, default=None,
                    help="default n_urls//20; bench.py uses n_urls//5")
    ap.add_argument("--gen", action="store_true", help="(re)generate corpus")
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    scratch = os.path.dirname(args.corpus.rstrip("/")) or "/dev/shm/lectura_hb"
    os.makedirs(scratch, exist_ok=True)
    if args.gen or not os.path.isdir(os.path.join(args.corpus, "pages")):
        gen_corpus(args.corpus, args.n_urls, scratch, n_seeds=args.n_seeds)

    env = dict(os.environ)
    env["PYSPARK_SUBMIT_ARGS"] = ("--driver-memory 16g --driver-java-options "
         '"-XX:+ExplicitGCInvokesConcurrent -XX:+ParallelRefProcEnabled" '
         "pyspark-shell")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["LECTURA_SCRATCH"] = scratch
    if args.trace:
        env["LECTURA_TRACE"] = "1"
    wh = os.path.join(scratch, "wh_headline")
    cmd = [
        sys.executable, "-m", "lectura.bench_worker",
        "--master", args.master, "--corpus", args.corpus,
        "--warehouse", wh, "--rounds", str(args.rounds),
        "--max-round-urls", str(max(2_000, args.n_urls // 5)),
        "--use-bloom", "--html-gzip", "--round-seconds", "300.0",
    ]
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO)
    for line in p.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            r = json.loads(line[len("BENCH_RESULT "):])
            print(json.dumps(r, indent=2))
            print(f"total_sec={time.time() - t0:.1f}")
            return
    sys.stderr.write(p.stdout[-4000:] + "\n" + p.stderr[-4000:] + "\n")
    sys.exit(1)


if __name__ == "__main__":
    main()
