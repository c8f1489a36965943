"""End-to-end Spark-pipeline ≡ oracle-crawler equivalence (the B:14
criterion), bloom-mode equivalence, golden pin, and kill/resume (ST8)."""

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from lectura.config import CrawlConfig
from lectura.crawl import Crawler
from lectura.oracle import run_oracle
from lectura.tables import Warehouse
from tests.conftest import corpus_dfs

ROUNDS = 3
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "oracle_3rounds.json")


def run_spark_crawl(spark, corpus, cfg, root, rounds=ROUNDS):
    wh = Warehouse(root, spark)
    crawler = Crawler(spark, wh, cfg)
    pages, seeds, robots = corpus_dfs(spark, corpus)
    crawler.init_tables(pages, seeds, robots)
    crawler.run(rounds)
    return crawler


def assert_equivalent(crawler, oracle, check_seen_exact=True):
    for rnd in range(1, ROUNDS + 1):
        got = [
            (r.url, r.host, r.depth, r.score)
            for r in crawler.scheduled_df(rnd).collect()
        ]
        want = [
            (r["url"], r["host"], r["depth"], r["score"])
            for r in oracle.scheduled[rnd - 1]
        ]
        assert got == want, f"round {rnd} ordering diverged"
    texts = {r.url: r.text for r in crawler.wh.read("text").collect()}
    assert texts == oracle.text  # byte-identical extracted text (B:15)
    seen = {r.url for r in crawler.wh.read("seen").collect()}
    if check_seen_exact:
        assert seen == oracle.seen
    else:  # bloom mode may only LOSE urls (false positives), never add
        assert seen <= oracle.seen
        assert len(oracle.seen - seen) <= max(2, int(0.01 * len(oracle.seen)))
    ff = sorted(
        (r.url, r.depth, r.score)
        for r in crawler.wh.read("frontier")
        .filter(F.col("for_round") == ROUNDS + 1).collect()
    )
    fo = sorted((r["url"], r["depth"], r["score"]) for r in oracle.frontier_final)
    if check_seen_exact:
        assert ff == fo


@pytest.fixture(scope="module")
def oracle(corpus, cfg):
    return run_oracle(corpus, cfg, ROUNDS)


def test_exact_mode_equivalence(spark, corpus, cfg, oracle, tmp_path):
    crawler = run_spark_crawl(spark, corpus, cfg, str(tmp_path / "wh"))
    assert_equivalent(crawler, oracle)


def test_bloom_mode_equivalence(spark, corpus, oracle, tmp_path):
    cfg = CrawlConfig(max_round_urls=200, use_bloom=True)
    crawler = run_spark_crawl(spark, corpus, cfg, str(tmp_path / "whb"))
    assert_equivalent(crawler, oracle, check_seen_exact=False)


def test_cuckoo_mode_equivalence(spark, corpus, oracle, tmp_path):
    """Same crawl with the cuckoo seen-set backend (B:2 'Bloom/cuckoo').
    FPP ~1.2e-4 ≪ bloom's 1e-3, so at this corpus size the crawl should
    in practice be EXACTLY the oracle — but the contract only requires
    the bloom-mode guarantee (may lose urls, never invent them)."""
    cfg = CrawlConfig(max_round_urls=200, use_bloom=True,
                      seen_filter="cuckoo")
    crawler = run_spark_crawl(spark, corpus, cfg, str(tmp_path / "whc"))
    assert_equivalent(crawler, oracle, check_seen_exact=False)


def test_distributed_rank_mode_equivalence(spark, corpus, oracle,
                                           tmp_path):
    """VERDICT r3 #1/#2 under e2e: forcing the cluster-scale physical
    knobs — prefix-rank scheduling (distributed_rank_min below the
    round cap) and multi-file sink fan-in (tiny sink_rows_per_file) —
    must leave every byte of the crawl identical to the oracle: the
    knobs pick plans, never answers."""
    cfg = CrawlConfig(max_round_urls=200, distributed_rank_min=50,
                      sink_rows_per_file=64)
    crawler = run_spark_crawl(spark, corpus, cfg, str(tmp_path / "whd"))
    assert_equivalent(crawler, oracle)


def test_oracle_matches_frozen_golden(oracle):
    """Guards against silent spec drift: today's oracle == frozen dump."""
    with open(GOLDEN) as f:
        g = json.load(f)
    assert [len(s) for s in g["scheduled"]] == [len(s) for s in oracle.scheduled]
    for rnd, (gs, os_) in enumerate(zip(g["scheduled"], oracle.scheduled), 1):
        assert [r["url"] for r in gs] == [r["url"] for r in os_], rnd
    assert g["seen"] == sorted(oracle.seen)
    got_hash = {
        u: hashlib.sha256(t.encode()).hexdigest() for u, t in oracle.text.items()
    }
    assert g["text_sha256"] == got_hash


def test_kill_resume_identical(spark, corpus, cfg, oracle, tmp_path):
    """Run 2 rounds, simulate a crashed round 3 (uncommitted writes),
    resume → state identical to the uninterrupted oracle run (ST8)."""
    root = str(tmp_path / "whr")
    wh = Warehouse(root, spark)
    crawler = Crawler(spark, wh, cfg)
    pages, seeds, robots = corpus_dfs(spark, corpus)
    crawler.init_tables(pages, seeds, robots)
    crawler.run(2)
    # crash mid-round-3: garbage appended to tables but round never committed
    garbage = spark.createDataFrame(
        [("http://garbage.example/x", 99)], "url string, round int"
    )
    wh.append("seen", garbage)
    wh.append(
        "text",
        spark.createDataFrame(
            [(99, "http://garbage.example/x", "JUNK")],
            "round int, url string, text string",
        ),
    )
    crawler2 = Crawler(spark, wh, cfg)
    crawler2.run(ROUNDS, resume=True)  # restores snapshots, reruns round 3
    assert_equivalent(crawler2, oracle)
    seen = {r.url for r in wh.read("seen").collect()}
    assert "http://garbage.example/x" not in seen


def test_sitemap_seed_ingestion_matches_oracle(spark, corpus, cfg, oracle,
                                               tmp_path):
    """Seeding the crawl from parsed sitemaps instead of a seed list must
    reproduce the oracle crawl exactly: per-host sitemap XML is built
    from the synth seed list (loc + priority-as-score), parsed by S11,
    and fed to init_tables — everything downstream is byte-identical."""
    import pandas as pd
    from urllib.parse import urlsplit

    from lectura.sources import parse_sitemaps, seeds_from_sitemaps

    assert len({s["url"] for s in corpus["seeds"]}) == len(corpus["seeds"])
    by_host = {}
    for s in corpus["seeds"]:
        host = urlsplit(s["url"]).hostname
        by_host.setdefault(host, []).append(
            f"<url><loc>{s['url']}</loc>"
            f"<priority>{s['score']!r}</priority></url>"
        )
    rows = [(h, "<urlset>" + "".join(es) + "</urlset>")
            for h, es in sorted(by_host.items())]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["host", "xml"]),
                                 schema="host string, xml string")
    seeds = seeds_from_sitemaps(parse_sitemaps(docs))

    wh = Warehouse(str(tmp_path / "whsm"), spark)
    crawler = Crawler(spark, wh, cfg)
    pages, _, robots = corpus_dfs(spark, corpus)
    crawler.init_tables(pages, seeds, robots)
    crawler.run(ROUNDS)
    assert_equivalent(crawler, oracle)


def test_maintain_after_crash_discards_dangling_writes(
        spark, corpus, cfg, oracle, tmp_path):
    """Maintenance on a warehouse whose last round CRASHED mid-write
    must roll back to the committed marker before rewriting — otherwise
    the compaction would bake the dangling rows into the 'committed'
    snapshots and the marker repoint would bless them (review finding)."""
    from lectura.maintain import maintain

    root = str(tmp_path / "whmc")
    wh = Warehouse(root, spark)
    crawler = Crawler(spark, wh, cfg)
    pages, seeds, robots = corpus_dfs(spark, corpus)
    crawler.init_tables(pages, seeds, robots)
    crawler.run(2)
    wh.append("seen", spark.createDataFrame(
        [("http://garbage.example/x", 99)], "url string, round int"))

    maintain(wh, target_file_bytes=1 << 30)
    seen = {r.url for r in wh.read("seen").collect()}
    assert "http://garbage.example/x" not in seen  # restore ran first

    crawler2 = Crawler(spark, wh, cfg)
    crawler2.run(ROUNDS)
    assert_equivalent(crawler2, oracle)


def test_maintain_between_sessions_preserves_crawl(
        spark, corpus, cfg, oracle, tmp_path):
    """2 rounds → warehouse maintenance (frontier prune, host_state
    merge, binpack compaction, round-marker repoint) → resume round 3 in
    a fresh Crawler: final state identical to the oracle's uninterrupted
    3-round run, and the maintained tables actually shrank."""
    from lectura.maintain import maintain

    root = str(tmp_path / "whm")
    wh = Warehouse(root, spark)
    # tiny sink_rows_per_file forces a multi-file fan-in per round (the
    # config-derived sink fan-in otherwise writes ONE file at this round
    # size — nothing left for compaction to shrink)
    cfg = CrawlConfig(max_round_urls=cfg.max_round_urls,
                      sink_rows_per_file=50)
    crawler = Crawler(spark, wh, cfg)
    pages, seeds, robots = corpus_dfs(spark, corpus)
    crawler.init_tables(pages, seeds, robots)
    crawler.run(2)

    pre_log_files = len(wh._files("fetch_log"))
    pre_frontier_rows = wh.approx_rows("frontier")
    actions = maintain(wh, target_file_bytes=1 << 30)
    assert "frontier" in actions and "_round_log" in actions
    assert len(wh._files("fetch_log")) < pre_log_files
    assert wh.approx_rows("frontier") < pre_frontier_rows  # spent rounds gone
    assert len(wh._files("host_state")) == 1

    crawler2 = Crawler(spark, wh, cfg)  # fresh-session equivalent
    crawler2.run(ROUNDS)
    assert_equivalent(crawler2, oracle)


def test_maintain_with_expiry_preserves_resume(
        spark, corpus, cfg, oracle, tmp_path):
    """S19: maintain(expire_keep=1) reclaims pre-maintenance history
    (bytes actually freed) while the round marker's snapshots survive —
    resume round 3 in a fresh Crawler still matches the uninterrupted
    oracle byte-for-byte."""
    import os as _os

    from lectura.maintain import maintain

    root = str(tmp_path / "whe")
    wh = Warehouse(root, spark)
    cfg = CrawlConfig(max_round_urls=cfg.max_round_urls,
                      sink_rows_per_file=50)
    crawler = Crawler(spark, wh, cfg)
    pages, seeds, robots = corpus_dfs(spark, corpus)
    crawler.init_tables(pages, seeds, robots)
    crawler.run(2)

    def _disk(t):
        return sum(_os.path.getsize(_os.path.join(dp, f))
                   for dp, _, fs in _os.walk(wh._tdir(t)) for f in fs)

    pre = _disk("seen") + _disk("frontier") + _disk("fetch_log")
    actions = maintain(wh, target_file_bytes=1 << 30, expire_keep=1)
    assert any("expired" in v for v in actions.values())
    post = _disk("seen") + _disk("frontier") + _disk("fetch_log")
    assert post < pre  # history actually reclaimed

    crawler2 = Crawler(spark, wh, cfg)  # fresh-session resume
    crawler2.run(ROUNDS)
    assert_equivalent(crawler2, oracle)


def test_maintain_after_round1_crash_drops_unborn_tables(
        spark, corpus, cfg, oracle, tmp_path):
    """ADVICE r2: a crash during round 1 of a FRESH warehouse leaves
    dangling rows in tables that did not exist at the round-0 marker
    (marker snapshot None, e.g. `text`). RoundLog.restore must DROP
    those tables — skipping them would let maintenance binpack the
    dangling rows and the marker repoint bless them, so the resumed
    round 1 would duplicate every row."""
    from lectura.maintain import maintain

    root = str(tmp_path / "whr1c")
    wh = Warehouse(root, spark)
    crawler = Crawler(spark, wh, cfg)
    pages, seeds, robots = corpus_dfs(spark, corpus)
    crawler.init_tables(pages, seeds, robots)  # commits round-0 marker
    # crash mid-round-1: `text` gets created + written, marker never lands
    wh.append(
        "text",
        spark.createDataFrame(
            [(1, "http://dangling.example/x", "JUNK")],
            "round int, url string, text string",
        ),
    )
    maintain(wh, target_file_bytes=1 << 30)
    # the unborn-at-marker table is gone, not blessed
    assert not wh.exists("text")

    crawler2 = Crawler(spark, wh, cfg)
    crawler2.run(ROUNDS, resume=True)
    assert_equivalent(crawler2, oracle)
    texts = wh.read("text").collect()
    urls = [r.url for r in texts]
    assert "http://dangling.example/x" not in urls
    assert len(urls) == len(set(urls))  # no duplicated round-1 rows
