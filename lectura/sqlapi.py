"""SQL-text query surface (SURVEY §1: the engine exposes DataFrame AND
SQL faces): register the corpus parquet tables as temp views and run
ANSI SQL through `spark.sql`. Queries written in the shared dialect
subset (ANSI aggregates, TIMESTAMP literals, round/cast cents sums —
the S12 money discipline) run VERBATIM on both Spark and the DuckDB
oracle, so the contract can check the SQL face with one shared string
(`contract.py:sql_tpch_q19`).

Provenance: /root/reference was empty at survey time (SURVEY.md §0);
the SQL surface derives from BASELINE.json's ANSI-oracle contract and
public Spark SQL docs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> list[str]:
    """Register each `<sf_dir>/<name>.parquet` as a temp view `<name>`
    (skipping absent files). Idempotent; returns the registered names.
    Plans through the views are identical to the direct reads —
    registration is metadata-only, scans stay pushdown-capable."""
    done = []
    for name in tables:
        p = f"{sf_dir}/{name}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(name)
            done.append(name)
    return done


def run_sql(spark: SparkSession, sf_dir: str, sql: str,
            tables: tuple[str, ...] = TABLES) -> DataFrame:
    """Register the views (pass `tables` to register only what the
    query touches — each registration is a driver-side schema read),
    then evaluate one SQL string."""
    register_views(spark, sf_dir, tables)
    return spark.sql(sql)
