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
             parallelism: int | None = None,
             gzip_html: bool = False) -> DataFrame:
    """gzip_html=True stores bodies WARC-style (one gzip member per page,
    as Common Crawl does) — the bench/cluster corpus layout; `text` is
    still derived from the raw bytes so the X2 byte-exact invariant is
    unchanged."""
    import gzip as _gzip

    bounds = p.host_bounds()
    n_parts = parallelism or max(8, p.n_urls // 4000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                for r in page_records(int(i), p, bounds):
                    if gzip_html:
                        r = dict(r)
                        r["html"] = _gzip.compress(r["html"], compresslevel=1)
                    rows.append(r)
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return (
        spark.range(0, p.n_urls, numPartitions=n_parts)
        .mapInPandas(gen, PAGES_SCHEMA)
    )


def materialize_corpus(
    spark: SparkSession, p: SynthParams, gzip_html: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(pages, seeds, robots) DataFrames for Crawler.init_tables."""
    bounds = p.host_bounds()
    seeds = spark.createDataFrame(
        pd.DataFrame(make_seeds(p, bounds)), schema="url string, score double"
    )
    robots = spark.createDataFrame(
        pd.DataFrame(make_robots(p)), schema="host string, body string"
    )
    return pages_df(spark, p, gzip_html=gzip_html), seeds, robots


WARC_META_SCHEMA = (
    "url string, warc_ts timestamp, lang string, "
    "warc_file string, warc_offset long, warc_len int"
)


def materialize_corpus_warc(
    spark: SparkSession, p: SynthParams, warc_dir: str,
    parallelism: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Common-Crawl-native corpus layout: page bodies as WARC-style
    packfiles of concatenated gzip members + a SLIM parquet index
    (url, warc_ts, lang, warc_file, warc_offset, warc_len). The crawl's
    fetch is then a ranged read of exactly the scheduled bodies
    (lectura/extract.py warc_fetch_extract) instead of a full html-column
    decode per round. Each input partition writes one packfile; content
    is a pure function of the page index so retries rewrite identical
    bytes (idempotent)."""
    import gzip as _gzip
    import os
    from collections.abc import Iterator as _It

    import pandas as _pd

    os.makedirs(warc_dir, exist_ok=True)
    bounds = p.host_bounds()
    n_parts = parallelism or max(8, p.n_urls // 4000)

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(warc_dir, f"seg-{pid:05d}.warc.gz")
        rows = []
        off = 0
        with open(path, "wb") as out:
            for pdf in batches:
                for i in pdf["id"]:
                    for r in page_records(int(i), p, bounds):
                        blob = _gzip.compress(r["html"], compresslevel=1)
                        out.write(blob)
                        rows.append(
                            {
                                "url": r["url"],
                                "warc_ts": r["warc_ts"],
                                "lang": r["lang"],
                                "warc_file": path,
                                "warc_offset": off,
                                "warc_len": len(blob),
                            }
                        )
                        off += len(blob)
        yield _pd.DataFrame(
            rows, columns=["url", "warc_ts", "lang", "warc_file",
                           "warc_offset", "warc_len"]
        )

    meta = (
        spark.range(0, p.n_urls, numPartitions=n_parts)
        .mapInPandas(gen, WARC_META_SCHEMA)
    )
    seeds = spark.createDataFrame(
        pd.DataFrame(make_seeds(p, bounds)), schema="url string, score double"
    )
    robots = spark.createDataFrame(
        pd.DataFrame(make_robots(p)), schema="host string, body string"
    )
    return meta, seeds, robots
