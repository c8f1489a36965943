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

from pyspark.sql import DataFrame, SparkSession
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
