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

from lectura.pure.enrich import ENRICH_COLS, enrich_text
from lectura.pure.extract import extract_links, extract_page, extract_text

EXTRACT_SCHEMA = (
    "url string, depth int, score double, text string, links array<string>, "
    "n_links int, bytes long, " + ENRICH_COLS
)


def _enriched_frame(pdf, texts, links, nbytes, cache):
    """Assemble one output batch: extraction columns + per-page enrichment
    (lang/quality/token stats, fingerprint, simhash — pure.enrich)."""
    import pandas as _pd

    stats = [enrich_text(t, cache) for t in texts]
    out = {
        "url": pdf["url"],
        "depth": pdf["depth"],
        "score": pdf["score"],
        "text": texts,
        "links": links,
        "n_links": [len(x) for x in links],
        "bytes": nbytes,
    }
    for k in ("n_tokens", "mean_token_len", "stopword_ratio", "alpha_ratio",
              "digit_ratio", "quality", "lang_guess", "fingerprint",
              "simhash"):
        out[k] = [s[k] for s in stats]
    return _pd.DataFrame(out)


def extract_pages(fetched: DataFrame, gzipped: bool = False) -> DataFrame:
    """X4: (url, depth, score, html) -> (url, depth, score, text, links,
    n_links, bytes). Fused mapInPandas — html never leaves this stage.

    `gzipped=True` means page bodies are stored WARC-style (gzip member per
    page) and are inflated here, inside the Python worker: at corpus scale
    this cuts parquet scan + broadcast bandwidth ~4× and converts it into
    per-core decompression work that scales with executors. `bytes` always
    reports the DECOMPRESSED body size (fetch-metric semantics)."""
    import gzip as _gzip

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            texts, links, nbytes = [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                b = bytes(html) if html is not None else b""
                if gzipped and b:
                    b = _gzip.decompress(b)
                t, ls = extract_page(b, url)
                texts.append(t)
                links.append(ls)
                nbytes.append(len(b))
            yield _enriched_frame(pdf, texts, links, nbytes, cache)

    return fetched.select("url", "depth", "score", "html").mapInPandas(
        run, EXTRACT_SCHEMA
    )


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """X2 standalone (golden/byte-exactness tests)."""
    return html.map(lambda b: extract_text(bytes(b)) if b is not None else None)


@F.pandas_udf(T.ArrayType(T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("text", T.StringType()),
])))
def extract_anchors_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """(url, anchor_text) occurrence stream per page (pure spec fn
    extract_anchors, Arrow-batched)."""
    from lectura.pure.extract import extract_anchors

    return pd.Series([
        extract_anchors(bytes(b) if isinstance(b, (bytes, bytearray))
                        else b, u) if b is not None else []
        for b, u in zip(html, base_url)
    ])


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """X1 standalone."""
    return pd.Series(
        [
            extract_links(bytes(b), u) if b is not None else []
            for b, u in zip(html, base_url)
        ]
    )


WARC_FETCH_SCHEMA = EXTRACT_SCHEMA


def warc_fetch_extract(fetch_meta: DataFrame, gzipped: bool = True) -> DataFrame:
    """Fused WARC fetch + extract (S1b + X4): input rows carry (url, depth,
    score, warc_file, warc_offset, warc_len); each Python worker preads the
    gzip member for its rows, inflates, and extracts — page bytes NEVER
    enter the JVM. This is the Common-Crawl-native fetch path: at 100 TB
    the corpus is WARC segments + a slim parquet index, and a round reads
    only the ≤max_round_urls scheduled bodies (ranged reads) instead of
    decoding the full html column of every row just to evaluate the fetch
    join — the latter is memory-bandwidth-bound and stops scaling long
    before 32 cores."""
    import gzip as _gzip

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        handles: dict[str, object] = {}
        cache: dict = {}
        try:
            for pdf in batches:
                texts, links, nbytes = [], [], []
                for url, wf, off, ln in zip(
                    pdf["url"], pdf["warc_file"], pdf["warc_offset"],
                    pdf["warc_len"]
                ):
                    fh = handles.get(wf)
                    if fh is None:
                        fh = handles[wf] = open(wf, "rb")
                    fh.seek(int(off))
                    b = fh.read(int(ln))
                    if gzipped:
                        b = _gzip.decompress(b)
                    t, ls = extract_page(b, url)
                    texts.append(t)
                    links.append(ls)
                    nbytes.append(len(b))
                yield _enriched_frame(pdf, texts, links, nbytes, cache)
        finally:
            for fh in handles.values():
                fh.close()

    cols = ["url", "depth", "score", "warc_file", "warc_offset", "warc_len"]
    return fetch_meta.select(*cols).mapInPandas(run, WARC_FETCH_SCHEMA)
