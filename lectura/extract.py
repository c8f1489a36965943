"""Vectorized listing-page extraction (SURVEY.md §2.6, X1–X7; B:15 "no
per-row Python" = Arrow-batched UDFs; the HTML parsing itself is the pure
spec function applied per document inside each batch).

`extract_pages` is the fused X4 pass: one Arrow round-trip produces links +
text + fetch metrics together, so MB-scale html bodies cross the
JVM↔Python boundary exactly once and never again (the html column is
dropped on the way out).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lectura.pure.extract import extract_links, extract_text

EXTRACT_SCHEMA = (
    "url string, depth int, score double, text string, links array<string>, "
    "n_links int, bytes long"
)


def extract_pages(fetched: DataFrame) -> DataFrame:
    """X4: (url, depth, score, html) -> (url, depth, score, text, links,
    n_links, bytes). Fused mapInPandas — html never leaves this stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, links, nbytes = [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                b = bytes(html) if html is not None else b""
                texts.append(extract_text(b))
                links.append(extract_links(b, url))
                nbytes.append(len(b))
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "depth": pdf["depth"],
                    "score": pdf["score"],
                    "text": texts,
                    "links": links,
                    "n_links": [len(x) for x in links],
                    "bytes": nbytes,
                }
            )

    return fetched.select("url", "depth", "score", "html").mapInPandas(
        run, EXTRACT_SCHEMA
    )


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """X2 standalone (golden/byte-exactness tests)."""
    return html.map(lambda b: extract_text(bytes(b)) if b is not None else None)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """X1 standalone."""
    return pd.Series(
        [
            extract_links(bytes(b), u) if b is not None else []
            for b, u in zip(html, base_url)
        ]
    )
