"""Dev harness: Spark crawl vs oracle crawler equivalence (pre-pytest)."""

import shutil
import sys
import time

from lectura.config import CrawlConfig
from lectura.oracle import run_oracle
from lectura.synth import SynthParams, make_corpus
from lectura.session import get_spark
from lectura.tables import Warehouse
from lectura.crawl import Crawler

ROUNDS = 3
USE_BLOOM = "--bloom" in sys.argv

p = SynthParams(n_urls=500, n_hosts=20)
cfg = CrawlConfig(max_round_urls=200, use_bloom=USE_BLOOM)
corpus = make_corpus(p)
oracle = run_oracle(corpus, cfg, ROUNDS)

spark = get_spark(master="local[8]", app_name="dev-e2e")
import pandas as pd

shutil.rmtree("/tmp/wh_dev", ignore_errors=True)
wh = Warehouse("/tmp/wh_dev", spark)
crawler = Crawler(spark, wh, cfg)

pages = spark.createDataFrame(
    pd.DataFrame(corpus["pages"]),
    schema="url string, warc_ts timestamp, html binary, text string, lang string",
)
seeds = spark.createDataFrame(pd.DataFrame(corpus["seeds"]),
                              schema="url string, score double")
robots = spark.createDataFrame(pd.DataFrame(corpus["robots"]),
                               schema="host string, body string")
t0 = time.time()
crawler.init_tables(pages, seeds, robots)
print("init", round(time.time() - t0, 1), "s")
t0 = time.time()
for s in crawler.run(ROUNDS):
    print(s)
print("crawl", round(time.time() - t0, 1), "s")

ok = True
for rnd in range(1, ROUNDS + 1):
    got = [
        (r.url, r.host, r.depth, r.score)
        for r in crawler.scheduled_df(rnd).collect()
    ]
    want = [(r["url"], r["host"], r["depth"], r["score"])
            for r in oracle.scheduled[rnd - 1]]
    if got != want:
        ok = False
        print(f"ROUND {rnd} MISMATCH: got {len(got)} want {len(want)}")
        for i, (g, w) in enumerate(zip(got, want)):
            if g != w:
                print("  first diff at", i, "\n   got ", g, "\n   want", w)
                break
        gs, ws = {g[0] for g in got}, {w[0] for w in want}
        print("  only-got:", list(gs - ws)[:5], " only-want:", list(ws - gs)[:5])
    else:
        print(f"round {rnd}: scheduled order MATCH ({len(got)} rows)")

# text byte-exactness
texts = {r.url: r.text for r in wh.read("text").collect()}
if texts == oracle.text:
    print(f"text MATCH ({len(texts)} urls)")
else:
    ok = False
    print("TEXT MISMATCH", len(texts), len(oracle.text))
    for u in list(oracle.text)[:3]:
        if texts.get(u) != oracle.text[u]:
            print(" diff at", u, repr(texts.get(u))[:80], "!=",
                  repr(oracle.text[u])[:80])

# seen set
seen = {r.url for r in wh.read("seen").collect()}
if USE_BLOOM:
    missing = oracle.seen - seen
    print("seen (bloom mode): spark", len(seen), "oracle", len(oracle.seen),
          "missing-from-spark", len(missing))
else:
    if seen == oracle.seen:
        print(f"seen set MATCH ({len(seen)})")
    else:
        ok = False
        print("SEEN MISMATCH", len(seen), len(oracle.seen),
              list(seen - oracle.seen)[:5], list(oracle.seen - seen)[:5])

# final frontier
from pyspark.sql import functions as F
ff = sorted(
    [(r.url, r.depth, r.score) for r in wh.read("frontier")
     .filter(F.col("for_round") == ROUNDS + 1).collect()],
)
fo = sorted([(r["url"], r["depth"], r["score"]) for r in oracle.frontier_final])
if ff == fo:
    print(f"final frontier MATCH ({len(ff)} rows)")
else:
    ok = False
    print("FRONTIER MISMATCH", len(ff), len(fo))
    sf, so = {x[0] for x in ff}, {x[0] for x in fo}
    print("  only-spark:", list(sf - so)[:5], " only-oracle:", list(so - sf)[:5])
    for a, b in zip(ff, fo):
        if a != b:
            print("  first diff:", a, "!=", b)
            break

print("OVERALL:", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
