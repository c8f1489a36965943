"""Parallel materialization of the deterministic synthetic corpus.

`lectura.synth.page_records(i)` is a pure function of the page index, so
bench-scale corpora (≥10^6 URLs, FIXTURES.md §2.1) generate fully in
parallel with `spark.range(n) → mapInPandas` and are bit-identical to what
the oracle crawler builds in a Python loop at test scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from lectura.synth import SynthParams, make_robots, make_seeds, page_records

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_df(spark: SparkSession, p: SynthParams,
             parallelism: int | None = None) -> DataFrame:
    bounds = p.host_bounds()
    n_parts = parallelism or max(8, p.n_urls // 4000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rows.extend(page_records(int(i), p, bounds))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return (
        spark.range(0, p.n_urls, numPartitions=n_parts)
        .mapInPandas(gen, PAGES_SCHEMA)
    )


def materialize_corpus(
    spark: SparkSession, p: SynthParams
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(pages, seeds, robots) DataFrames for Crawler.init_tables."""
    bounds = p.host_bounds()
    seeds = spark.createDataFrame(
        pd.DataFrame(make_seeds(p, bounds)), schema="url string, score double"
    )
    robots = spark.createDataFrame(
        pd.DataFrame(make_robots(p)), schema="host string, body string"
    )
    return pages_df(spark, p), seeds, robots
