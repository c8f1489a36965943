"""Spark-side robots.txt filtering (SURVEY.md §2.4, R1–R4; SEMANTICS.md §6).

R1 parses raw robots bodies into flat rule rows inside an Arrow batch UDF
(pure parser shared with the oracle). Agent-group selection (exact token
beats '*') happens at parse time, so the published rule table is already
agent-resolved: downstream only needs a broadcast join + longest-prefix
window — pure JVM work.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lectura.pure.robots import _pattern_to_regex, parse_robots, select_group

RULE_SCHEMA = (
    "host string, rule_type string, pattern string, regex string, "
    "priority int, crawl_delay double"
)


def build_rule_table(robots_df: DataFrame, agent: str) -> DataFrame:
    """(host, body) -> agent-resolved rule rows (R1). One row per rule of
    the best-matching group; hosts whose group has no path rules still get
    one pattern-less row carrying crawl_delay."""

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                grp = select_group(parse_robots(host, body or ""), agent)
                delay = None
                for r in grp:
                    if r.crawl_delay is not None:
                        delay = r.crawl_delay
                emitted = False
                for r in grp:
                    if not r.pattern:
                        continue
                    rows.append(
                        (host, r.rule_type, r.pattern,
                         _pattern_to_regex(r.pattern), r.priority, delay)
                    )
                    emitted = True
                if not emitted and grp:
                    rows.append((host, "allow", "", "^", 0, delay))
            yield pd.DataFrame(
                rows,
                columns=["host", "rule_type", "pattern", "regex", "priority",
                         "crawl_delay"],
            )

    return robots_df.mapInPandas(parse_batch, RULE_SCHEMA)


def host_delay_table(rules_df: DataFrame) -> DataFrame:
    """R4: per-host crawl delay (max over the group's rows; they all carry
    the same group-level value)."""
    return rules_df.groupBy("host").agg(F.max("crawl_delay").alias("crawl_delay"))


def apply_robots(cand: DataFrame, rules_df: DataFrame) -> DataFrame:
    """R2+R3: annotate candidates (url, host, path_q, …) with `allowed`.

    Broadcast-join rules by host, regex-match each rule against the URL's
    path?query, rank matches by (priority desc, allow-beats-disallow on
    ties), keep the winner; no matching rule (or no rules) => allowed.
    """
    path_rules = rules_df.filter(F.col("pattern") != "").select(
        "host",
        "rule_type",
        "regex",
        "priority",
        (F.col("rule_type") == "allow").cast("int").alias("is_allow"),
    )
    j = cand.join(F.broadcast(path_rules), "host", "left")
    matched = F.col("regex").isNotNull() & F.expr("path_q rlike regex")
    j = j.withColumn(
        "m_priority", F.when(matched, F.col("priority")).otherwise(F.lit(None))
    ).withColumn(
        "m_is_allow", F.when(matched, F.col("is_allow")).otherwise(F.lit(None))
    )
    w = Window.partitionBy("url").orderBy(
        F.desc_nulls_last("m_priority"), F.desc_nulls_last("m_is_allow")
    )
    winner = (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .withColumn(
            "allowed",
            F.col("m_priority").isNull() | (F.col("m_is_allow") == 1),
        )
        .drop("rule_type", "regex", "priority", "is_allow", "m_priority",
              "m_is_allow", "_rn")
    )
    return winner
