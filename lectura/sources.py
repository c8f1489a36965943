"""S10 generic scans (SURVEY.md §2.1): one entry point for the three
batch source formats the engine reads — parquet (the corpus/warehouse
format), JSON-lines and CSV (seed lists, robots dumps, external host
metadata commonly arrive as these).

Scale discipline: every reader takes an EXPLICIT schema. Schema inference
on json/csv is a full extra pass over the data (a 100 TB read before the
real read); on parquet it is a footer-sampling driver job that serializes
the round loop. Callers always know their schema — pass it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

FORMATS = ("parquet", "json", "csv")


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: StructType | str | None = None, **options) -> DataFrame:
    """Read `path` as a DataFrame. json = JSON-lines; csv defaults to
    header=true with RFC-4180 doubled-quote escaping (what pandas/duckdb/
    excel emit — Spark's own default escape is backslash, which silently
    mis-parses standard CSV)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown source format {fmt!r}; one of {FORMATS}")
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("json", "csv"):
        r = r.option("inferSchema", "true")
    if fmt == "csv":
        opts = {"header": "true", "quote": '"', "escape": '"'}
        opts.update(options)
        return r.options(**opts).csv(path)
    if fmt == "json":
        return r.options(**options).json(path)
    return r.options(**options).parquet(path)


# ---------------------------------------------------------------------------
# S12: bucketed tables — the co-located-join storage layout for the
# big recurring joins (fetch_log ⋈ scheduled by url, host_state ⋈
# frontier by host). Hash-bucketing both sides of a recurring join key
# at WRITE time makes every subsequent join on that key shuffle-free:
# at 100 TB the shuffle is the bottleneck, and a bucketed layout pays
# its one-time write cost back on the first re-join.
# ---------------------------------------------------------------------------

def write_bucketed(df: DataFrame, name: str, key: str, n_buckets: int,
                   path: str, sort_cols: tuple[str, ...] = ()) -> None:
    """Persist `df` as a catalog table hash-bucketed by `key` into
    `n_buckets` files per partition at `path` (external table; the
    session catalog records the bucket spec that lets the planner drop
    the Exchange). `sort_cols` additionally sorts within buckets so a
    sort-merge join also skips the per-task sort."""
    w = (
        df.write.mode("overwrite").format("parquet").option("path", path)
        .bucketBy(n_buckets, key)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


# ---------------------------------------------------------------------------
# S18: Z-order (Morton) clustering — the multi-dimensional file layout
# (Iceberg's `rewrite_data_files(strategy => 'sort', sort_order =>
# zorder(...))`; same construction in Delta OPTIMIZE ZORDER BY). A table
# range-partitioned and sorted on ONE column prunes scans on that column
# only; interleaving the bits of two columns into one sort key bounds
# every file's min/max envelope in BOTH dimensions, so a predicate on
# either column (or a box on both) skips most files at planning time from
# parquet footer stats alone. At 100 TB this is the difference between a
# (host, time)-windowed query reading one cluster's worth of files and a
# full-table scan.
# ---------------------------------------------------------------------------

# shift/mask bit-spreading chain (the standard O(log w) Morton-code
# construction, e.g. Hacker's Delight §7-2): each step doubles the gap
# between occupied bits. Pure 64-bit integer arithmetic — the same five
# steps run verbatim in Spark expressions and in the DuckDB oracle
# (lectura/oracle_sql.py:zorder_sql), so the key is engine-invariant.
_SPREAD_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread31(col: Column) -> Column:
    """Spread a column's low 31 bits into the even bit positions of a
    BIGINT (bit i -> bit 2i). Inputs are masked to 31 bits so the
    interleaved key never touches the sign bit (callers bucket/offset
    wider or negative dimensions first — epoch seconds, host_bucket and
    row ids all fit)."""
    x = col.cast("long").bitwiseAND(F.lit(0x7FFFFFFF))
    for s, m in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, s)).bitwiseAND(F.lit(m))
    return x


def zorder_key(x: Column | str, y: Column | str) -> Column:
    """64-bit Morton key interleaving two 31-bit dimensions: bit i of
    `x` lands at bit 2i, bit i of `y` at bit 2i+1. Locality property:
    rows close in BOTH dimensions are close in key order, so files cut
    from a zkey sort carry tight min/max envelopes on x AND y."""
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    return _spread31(cx).bitwiseOR(F.shiftleft(_spread31(cy), 1))


def write_zordered(df: DataFrame, x: str, y: str, path: str,
                   n_files: int = 32) -> None:
    """Persist `df` Z-order-clustered on (`x`, `y`): range-partition by
    the Morton key (one shuffle — contiguous key ranges per file, the
    property footer-stat pruning needs; a hash repartition would scatter
    every key range across every file) + in-file sort, key dropped
    before write (readers prune on the x/y column stats themselves;
    the key is pure layout)."""
    (df.withColumn("_zkey", zorder_key(x, y))
       .repartitionByRange(n_files, "_zkey")
       .sortWithinPartitions("_zkey")
       .drop("_zkey")
       .write.mode("overwrite").parquet(path))


# ---------------------------------------------------------------------------
# S11: sitemap ingestion. Sitemaps are the crawl's third discovery source
# (after seed lists and extracted outlinks): fetched like any page, parsed
# here into frontier candidates.
# ---------------------------------------------------------------------------

def parse_sitemaps(df: DataFrame, xml_col: str = "xml",
                   host_col: str = "host") -> DataFrame:
    """Parse sitemap XML documents into one row per entry.

    `<urlset>` entries yield kind='url' rows (loc, lastmod, priority —
    lastmod null when absent, priority defaulting to 0.5 per the sitemap
    protocol); `<sitemapindex>` entries yield kind='sitemap' rows whose
    loc is a further sitemap to fetch (the caller loops them through the
    fetch join like any page — sitemap recursion is bounded at one level
    by the protocol).

    Pure JVM regexp extraction (non-greedy, dotall): sitemap files are
    machine-generated, flat, and bounded (50 k URLs / 50 MB each), so
    block-regex parsing is exact on conforming documents and keeps the
    whole operator inside whole-stage codegen — a Python XML parser
    would put every sitemap byte through Arrow for no added fidelity.
    Non-conforming blocks degrade to loc='' and are dropped, never
    errors — at crawl scale malformed sitemaps are data, not exceptions."""
    from pyspark.sql import functions as F

    url_blocks = F.expr(
        f"regexp_extract_all({xml_col}, '(?s)<url>(.*?)</url>', 1)")
    map_blocks = F.expr(
        f"regexp_extract_all({xml_col}, '(?s)<sitemap>(.*?)</sitemap>', 1)")

    def _field(rx: str) -> F.Column:
        return F.nullif(F.regexp_extract("_b", rx, 1), F.lit(""))

    urls = (
        df.select(F.col(host_col).alias("host"),
                  F.explode(url_blocks).alias("_b"))
        .select(
            "host",
            _field(r"(?s)<loc>\s*(.*?)\s*</loc>").alias("loc"),
            F.to_timestamp(
                _field(r"(?s)<lastmod>\s*(.*?)\s*</lastmod>")
            ).alias("lastmod"),
            F.coalesce(
                _field(r"(?s)<priority>\s*(.*?)\s*</priority>")
                .try_cast("double"),
                F.lit(0.5),
            ).alias("priority"),
            F.lit("url").alias("kind"),
        )
    )
    subs = (
        df.select(F.col(host_col).alias("host"),
                  F.explode(map_blocks).alias("_b"))
        .select(
            "host",
            _field(r"(?s)<loc>\s*(.*?)\s*</loc>").alias("loc"),
            F.lit(None).cast("timestamp").alias("lastmod"),
            F.lit(0.5).alias("priority"),
            F.lit("sitemap").alias("kind"),
        )
    )
    return (urls.unionByName(subs)).filter(F.col("loc").isNotNull())


def sitemaps_from_robots(df: DataFrame, host_col: str = "host",
                         body_col: str = "body") -> DataFrame:
    """Sitemap DISCOVERY: extract `Sitemap: <url>` directives from
    robots.txt bodies — the sitemaps.org/RFC 9309 §2.3 extension and the
    place crawlers actually find sitemaps. The directive is
    group-independent and its key case-insensitive; one absolute URL per
    line; commented lines don't count. Returns (host, sitemap_url), one
    row per directive, to be fetched and fed through `parse_sitemaps` →
    `seeds_from_sitemaps`.

    One JVM regexp + explode over the (small) robots table — no Python,
    no re-parse of rule groups."""
    from pyspark.sql import functions as F

    urls = F.regexp_extract_all(
        F.col(body_col),
        F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"), F.lit(1),
    )
    return df.select(F.col(host_col).alias("host"),
                     F.explode(urls).alias("sitemap_url"))


def seeds_from_sitemaps(parsed: DataFrame) -> DataFrame:
    """Turn `parse_sitemaps` output into a crawl seed list compatible
    with `Crawler.init_tables(pages, seeds, robots)`: kind='url' rows
    become (url, score) with the sitemap priority as the seed score
    (weighted by the frontier's score formula like any seed score).
    Index entries are not seeds — the caller fetches and re-parses
    them. Duplicate locs keep the max priority (one hash agg)."""
    from pyspark.sql import functions as F

    return (
        parsed.filter(F.col("kind") == "url")
        .groupBy(F.col("loc").alias("url"))
        .agg(F.max("priority").alias("score"))
    )
