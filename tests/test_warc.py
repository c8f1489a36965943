"""WARC-layout corpus (S1b) must produce the same crawl as the raw-html
corpus: same schedule, same extracted text bytes (B:15)."""

from __future__ import annotations

import pandas as pd
import pytest

from lectura.config import CrawlConfig
from lectura.crawl import Crawler
from lectura.synth_spark import materialize_corpus, materialize_corpus_warc
from lectura.tables import Warehouse


@pytest.mark.parametrize("rounds", [2])
def test_warc_equals_raw_crawl(spark, synth_params, tmp_path, rounds):
    cfg = CrawlConfig(max_round_urls=200)

    raw_pages, seeds, robots = materialize_corpus(spark, synth_params)
    wh_raw = Warehouse(str(tmp_path / "wh_raw"), spark)
    c_raw = Crawler(spark, wh_raw, cfg)
    c_raw.init_tables(raw_pages, seeds, robots)
    c_raw.run(rounds)

    meta, seeds2, robots2 = materialize_corpus_warc(
        spark, synth_params, str(tmp_path / "warc")
    )
    wh_w = Warehouse(str(tmp_path / "wh_warc"), spark)
    c_w = Crawler(spark, wh_w, cfg)
    c_w.init_tables(meta, seeds2, robots2)
    c_w.run(rounds)

    for r in range(1, rounds + 1):
        a = [(x.sched_rank, x.url) for x in c_raw.scheduled_df(r).collect()]
        b = [(x.sched_rank, x.url) for x in c_w.scheduled_df(r).collect()]
        assert a == b and len(a) > 0, f"round {r} schedule differs"

    ta = {(x.round, x.url): x.text for x in wh_raw.read("text").collect()}
    tb = {(x.round, x.url): x.text for x in wh_w.read("text").collect()}
    assert ta == tb and len(ta) > 0
