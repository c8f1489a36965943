"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship 2-round mini-crawl (FIXTURES.md §3) — synthetic
pages derived from documents.parquet text, full pipeline (canonicalize →
seen → robots → politeness → rank → fetch → extract), returns the round-2
scheduled frontier. queries()/oracle_sql(): see lectura/contract.py.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lectura import contract

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    import pandas as pd

    from lectura.config import CrawlConfig
    from lectura.crawl import Crawler
    from lectura.synth import SynthParams, make_corpus
    from lectura.tables import Warehouse

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    doc_texts = tuple(
        r.text for r in docs.select("text").orderBy("doc_id").limit(200).collect()
    )
    corpus = make_corpus(
        SynthParams(n_urls=500, n_hosts=20, doc_texts=doc_texts)
    )
    root = tempfile.mkdtemp(prefix="lectura_entry_")
    try:
        wh = Warehouse(root, spark)
        crawler = Crawler(spark, wh, CrawlConfig(max_round_urls=200))
        pages = spark.createDataFrame(
            pd.DataFrame(corpus["pages"]),
            schema="url string, warc_ts timestamp, html binary, text string, lang string",
        )
        seeds = spark.createDataFrame(
            pd.DataFrame(corpus["seeds"]), schema="url string, score double"
        )
        robots = spark.createDataFrame(
            pd.DataFrame(corpus["robots"]), schema="host string, body string"
        )
        crawler.init_tables(pages, seeds, robots)
        crawler.run(2)
        # materialize before the temp warehouse disappears; the explicit
        # schema makes a zero-row round a clean empty frame instead of a
        # createDataFrame schema-inference crash (VERDICT r4 nit)
        sdf = crawler.scheduled_df(2)
        rows = sdf.collect()
        return spark.createDataFrame(rows, sdf.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data-pipeline operators). Each callable takes (spark, sf_dir)
    and returns a DataFrame with columns aliased to match oracle_sql."""
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per queries() key (omitted for genuinely
    non-SQL-expressible ops → rows-only check; those are verified against
    the pure-Python oracle in tests/ instead)."""
    return contract.oracle_sql()
