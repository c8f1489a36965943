"""Sitemap ingestion wired into the crawl (S11 → frontier; VERDICT r4
#2): Spark parser ≡ pure parser on tricky documents, and the
sitemap-enabled crawl ≡ the sitemap-enabled pure oracle crawler e2e —
including a sitemap-only URL (reachable through no seed or link) being
scheduled, fetched and extracted."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lectura.config import CrawlConfig
from lectura.oracle import run_oracle
from lectura.pure.sitemap import parse_sitemap, sitemaps_from_robots_body
from lectura.synth import host_name
from tests.test_e2e import ROUNDS, assert_equivalent, run_spark_crawl

TRICKY_XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>  http://a.example/p1  </loc><priority>0.8</priority></url>
  <url><loc>http://a.example/p2</loc></url>
  <url><loc>http://a.example/p3</loc><priority>not-a-number</priority></url>
  <url><loc></loc><priority>0.4</priority></url>
  <url><priority>0.3</priority></url>
  <url><loc>http://a.example/p4</loc><priority></priority>
       <lastmod>2025-06-01</lastmod></url>
  <url><loc>http://a.example/multi</loc><priority>0.7</priority>
       <priority>0.1</priority></url>
</urlset>"""

INDEX_XML = """<sitemapindex>
  <sitemap><loc>http://a.example/sub1.xml</loc></sitemap>
  <sitemap><loc>
    http://a.example/sub2.xml
  </loc></sitemap>
  <sitemap><loc></loc></sitemap>
</sitemapindex>"""

ROBOTS_BODY = """# comments don't count: Sitemap: http://no.example/x.xml
User-agent: *
Disallow: /private
SITEMAP: http://a.example/sitemap.xml
  sitemap:\thttp://b.example/other.xml
Crawl-delay: 2
"""


def test_pure_parser_spec():
    urls, subs = parse_sitemap(TRICKY_XML)
    assert urls == [
        ("http://a.example/p1", 0.8),
        ("http://a.example/p2", 0.5),
        ("http://a.example/p3", 0.5),   # unparseable priority → default
        ("http://a.example/p4", 0.5),   # empty priority → default
        ("http://a.example/multi", 0.7),  # first match wins
    ]
    assert subs == []
    urls2, subs2 = parse_sitemap(INDEX_XML)
    assert urls2 == []
    assert subs2 == ["http://a.example/sub1.xml",
                     "http://a.example/sub2.xml"]


def test_directive_extraction_spec():
    got = sitemaps_from_robots_body(ROBOTS_BODY)
    # the comment line starts with '#', not 'sitemap:' — no match;
    # key is case-insensitive, leading blanks and tab separators allowed
    assert got == ["http://a.example/sitemap.xml",
                   "http://b.example/other.xml"]


def test_spark_parser_matches_pure(spark):
    """The Spark regex operators and the pure spec must agree entry for
    entry — this is what makes the e2e oracle meaningful."""
    from lectura.sources import parse_sitemaps, sitemaps_from_robots

    df = spark.createDataFrame(
        pd.DataFrame([{"host": "a.example", "xml": TRICKY_XML},
                      {"host": "i.example", "xml": INDEX_XML}]))
    got = parse_sitemaps(df, xml_col="xml").collect()
    g_urls = sorted((r.loc, r.priority) for r in got if r.kind == "url")
    g_subs = sorted(r.loc for r in got if r.kind == "sitemap")
    p_urls, _ = parse_sitemap(TRICKY_XML)
    _, p_subs = parse_sitemap(INDEX_XML)
    assert g_urls == sorted(p_urls)
    assert g_subs == sorted(p_subs)

    rdf = spark.createDataFrame(
        pd.DataFrame([{"host": "h", "body": ROBOTS_BODY}]))
    g_dir = [r.sitemap_url for r in sitemaps_from_robots(rdf).collect()]
    assert g_dir == sitemaps_from_robots_body(ROBOTS_BODY)


# ---------------------------------------------------------------------------
# e2e: planted sitemaps in the synthetic corpus
# ---------------------------------------------------------------------------

SITEMAP_ONLY_A = "http://host0.example/sitemap-only/alpha"
SITEMAP_ONLY_B = "http://host3.example/sitemap-only/beta"
# non-canonical loc variant of A — U1 must fold it into the same row
SITEMAP_ONLY_A_VARIANT = "HTTP://HOST0.example:80/sitemap-only/alpha#frag"


def _with_sitemaps(corpus, base_ts):
    """Plant: a robots `Sitemap:` directive on host0 pointing at a
    urlset that lists two sitemap-only pages (one via a non-canonical
    variant and a second copy with lower priority — max-priority merge)
    plus a `<sitemapindex>` hop to a host3 sub-sitemap; a directive to
    a sitemap url absent from the corpus (skipped by both sides); and
    page records for the sitemap XMLs and the sitemap-only targets."""
    c = {"pages": list(corpus["pages"]), "seeds": list(corpus["seeds"]),
         "robots": []}
    planted = False
    for r in corpus["robots"]:
        body = r["body"]
        if r["host"] == host_name(0):
            body += ("\nSitemap: http://host0.example/sitemap.xml\n"
                     "Sitemap: http://host0.example/missing-sitemap.xml\n")
            planted = True
        c["robots"].append({"host": r["host"], "body": body})
    assert planted, "host0 must have a robots body in the fixture"

    top = f"""<urlset>
      <url><loc>{SITEMAP_ONLY_A}</loc><priority>0.9</priority></url>
      <url><loc>{SITEMAP_ONLY_A_VARIANT}</loc><priority>0.2</priority></url>
      <url><loc>{SITEMAP_ONLY_A}</loc><priority>0.4</priority></url>
    </urlset>
    <sitemapindex>
      <sitemap><loc>http://host3.example/sub.xml</loc></sitemap>
    </sitemapindex>"""
    sub = f"""<urlset>
      <url><loc>{SITEMAP_ONLY_B}</loc></url>
    </urlset>"""

    def page(url, html):
        return {"url": url, "warc_ts": base_ts, "html": html.encode(),
                "text": "", "lang": "en"}

    c["pages"].append(page("http://host0.example/sitemap.xml", top))
    c["pages"].append(page("http://host3.example/sub.xml", sub))
    c["pages"].append(page(
        SITEMAP_ONLY_A,
        "<html><head><title>alpha</title></head>"
        "<body>sitemap only alpha body words here</body></html>"))
    c["pages"].append(page(
        SITEMAP_ONLY_B,
        "<html><head><title>beta</title></head>"
        "<body>sitemap only beta body words here</body></html>"))
    return c


@pytest.fixture(scope="module")
def sm_corpus(corpus, synth_params):
    return _with_sitemaps(corpus, synth_params.base_ts)


@pytest.fixture(scope="module")
def sm_cfg():
    return CrawlConfig(max_round_urls=200, use_sitemaps=True)


def test_sitemap_crawl_matches_oracle(spark, sm_corpus, sm_cfg, tmp_path):
    oracle = run_oracle(sm_corpus, sm_cfg, ROUNDS)
    crawler = run_spark_crawl(spark, sm_corpus, sm_cfg,
                              str(tmp_path / "wh"))
    assert_equivalent(crawler, oracle)
    # the sitemap-only URLs were actually scheduled + extracted: they
    # are reachable through NO seed and NO page link
    scheduled = {u for rnd in oracle.scheduled for u in
                 (r["url"] for r in rnd)}
    assert SITEMAP_ONLY_A in scheduled
    assert SITEMAP_ONLY_B in scheduled
    texts = {r.url: r.text for r in crawler.wh.read("text").collect()}
    assert "sitemap only alpha" in texts[SITEMAP_ONLY_A]
    # the variant loc folded into the canonical row (U1), max priority
    # won: depth-0 score = base0 + w2 * 0.9
    row = next(r for rnd in range(1, ROUNDS + 1)
               for r in crawler.scheduled_df(rnd).collect()
               if r.url == SITEMAP_ONLY_A)
    cfgd = sm_cfg.depth_base()[0] + sm_cfg.w2 * 0.9
    assert row.score == cfgd and row.depth == 0
    # the sitemap XML urls themselves were NOT crawled (discovery
    # source, not crawl target) and left no seen/fetch_log footprint
    assert "http://host0.example/sitemap.xml" not in scheduled
    seen = {r.url for r in crawler.wh.read("seen").collect()}
    assert "http://host0.example/sitemap.xml" not in seen


def test_sitemaps_off_is_unchanged(spark, sm_corpus, cfg, tmp_path):
    """The planted sitemap PAGES exist in the corpus, but with
    use_sitemaps off neither engine may discover the sitemap-only
    URLs — the flag defaults to exactly the r4 behavior."""
    oracle = run_oracle(sm_corpus, cfg, ROUNDS)
    scheduled = {u for rnd in oracle.scheduled for u in
                 (r["url"] for r in rnd)}
    assert SITEMAP_ONLY_A not in scheduled
    crawler = run_spark_crawl(spark, sm_corpus, cfg,
                              str(tmp_path / "wh_off"))
    assert_equivalent(crawler, oracle)


def test_sitemap_warc_corpus_rejected(spark, sm_cfg, tmp_path):
    from lectura.crawl import Crawler
    from lectura.tables import Warehouse

    wh = Warehouse(str(tmp_path / "whw"), spark)
    crawler = Crawler(spark, wh, sm_cfg)
    import datetime as dt

    pages = spark.createDataFrame(
        [("http://h.example/",
          dt.datetime(2025, 12, 1, tzinfo=dt.timezone.utc),
          "seg-0.warc.gz", 0, 10)],
        "url string, warc_ts timestamp, warc_file string, "
        "warc_offset long, warc_len long")
    seeds = spark.createDataFrame([("http://h.example/", 1.0)],
                                  "url string, score double")
    robots = spark.createDataFrame(
        [("h.example", "User-agent: *\nSitemap: http://h.example/s.xml")],
        "host string, body string")
    with pytest.raises(ValueError, match="inline-html"):
        crawler.init_tables(pages, seeds, robots)
