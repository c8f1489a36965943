"""Adversarial-skew e2e (VERDICT r3 #4 / SURVEY M3 exit criterion):
one host owns ~50% of all URLs. The default e2e corpus is merely
Zipf-skewed (mega_host_frac 0.35 over 20 hosts) — this one forces the
extreme case and asserts (a) byte-identical oracle equivalence end to
end, (b) the salted rank actually SPREADS the mega host over multiple
salt buckets (the F1/F2 mechanism that keeps the per-host window off a
single task), and (c) the session's AQE skew-join machinery splits an
oversized partition when a join is actually skewed (plan-level
evidence at forced-low thresholds — the 64 MB production threshold is
unreachable at test scale by design)."""

import pytest
from pyspark.sql import functions as F

from lectura.config import CrawlConfig
from lectura.oracle import run_oracle
from lectura.synth import SynthParams, make_corpus
from tests.test_e2e import ROUNDS, assert_equivalent, run_spark_crawl

# mega_host_frac is a pre-normalization floor (synth renormalizes all
# host weights after applying it): 0.8 lands host 0 at ~52% of urls
MEGA = SynthParams(n_urls=700, n_hosts=12, mega_host_frac=0.8, n_seeds=12)


@pytest.fixture(scope="module")
def skew_corpus():
    corpus = make_corpus(MEGA)
    hosts = [r["url"].split("/")[2] for r in corpus["pages"]]
    mega = max(set(hosts), key=hosts.count)
    frac = hosts.count(mega) / len(hosts)
    assert frac >= 0.5, f"fixture must be adversarial, got {frac:.2f}"
    return corpus


@pytest.fixture(scope="module")
def skew_oracle(skew_corpus):
    return run_oracle(skew_corpus, CrawlConfig(max_round_urls=200), ROUNDS)


def test_mega_host_crawl_matches_oracle(spark, skew_corpus, skew_oracle,
                                        tmp_path):
    """50%-mega-host corpus: schedule order, extracted text bytes, seen
    set and final frontier all byte-identical to the pure-Python
    oracle — skew handling is physical only."""
    cfg = CrawlConfig(max_round_urls=200)
    crawler = run_spark_crawl(spark, skew_corpus, cfg,
                              str(tmp_path / "whsk"))
    assert_equivalent(crawler, skew_oracle)
    # the skew reaches the crawl's CANDIDATE stream (the frontier);
    # `scheduled` is politeness-capped per host by design, so the mega
    # host is bounded there — that cap holding under 50% input skew is
    # itself part of the oracle equivalence above
    fr = crawler.wh.read("frontier")
    by_host = {r.host: r.c for r in fr.groupBy("host")
               .agg(F.count("*").alias("c")).collect()}
    assert max(by_host.values()) >= 0.4 * sum(by_host.values())


def test_salt_spreads_mega_host(spark, skew_corpus):
    """F1: the mega host's candidate urls must hash across >1 salt
    bucket (a single bucket would put its whole per-host rank window
    back on one task)."""
    from lectura.urlnorm import salt

    urls = [r["url"] for r in skew_corpus["pages"]]
    hosts = [u.split("/")[2] for u in urls]
    mega = max(set(hosts), key=hosts.count)
    df = spark.createDataFrame(
        [(u,) for u, h in zip(urls, hosts) if h == mega], "url string")
    n_buckets = (df.select(salt("url", CrawlConfig().salt_buckets)
                           .alias("s")).distinct().count())
    assert n_buckets > 1


def test_aqe_skew_join_splits_hot_partition(spark):
    """The session enables AQE skew-join (lectura/session.py); at
    forced-low thresholds a join against a 50%-hot key must execute
    with the skew=true SMJ marker (the runtime split a cluster-scale
    mega-host fetch join relies on)."""
    conf = spark.conf
    saved = {k: conf.get(k) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    )}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16k")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
        big = spark.range(0, 40_000).select(
            F.when(F.col("id") % 2 == 0, F.lit("mega.example"))
            .otherwise(F.concat(F.lit("h"), (F.col("id") % 37)
                                .cast("string"))).alias("host"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.createDataFrame(
            [("mega.example", 1.0)]
            + [(f"h{i}", 2.0) for i in range(37)], "host string, d double")
        j = big.join(dim, "host")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)
