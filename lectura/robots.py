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


def build_rule_arrays(rules_df: DataFrame) -> DataFrame:
    """Collapse the flat rule rows into one (host, _rules:array<struct>)
    row per host — the broadcast side of apply_robots. Static across
    crawl rounds, so callers may build it once and cache it."""
    return (
        rules_df.filter(F.col("pattern") != "")
        .groupBy("host")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("priority"),
                    (F.col("rule_type") == "allow").cast("int")
                    .alias("is_allow"),
                    F.col("regex"),
                )
            ).alias("_rules")
        )
    )


def apply_robots(cand: DataFrame, rules_df: DataFrame | None = None, *,
                 rule_arrays: DataFrame | None = None) -> DataFrame:
    """R2+R3: annotate candidates (url, host, path_q, …) with `allowed`.

    Shuffle-free longest-match: each host's path rules are collected into
    ONE array row (a small agg over the tiny static rules table), broadcast
    -joined onto candidates, and the winner is resolved per-row with JVM
    higher-order functions — `filter` keeps the rules whose regex matches
    the URL's path?query, `array_max` picks the best by (priority desc,
    allow-beats-disallow on ties) via struct ordering. No matching rule
    (or no rules for the host) => allowed.

    The previous shape (broadcast-join the FLAT rule rows, then a
    row_number window partitioned by url to keep the winner) fanned every
    candidate out by its host's rule count and then shuffled the fan-out —
    the largest exchange in the schedule phase. Per-row lambda evaluation
    does the same work inside the scan stage."""
    if rule_arrays is None:
        rule_arrays = build_rule_arrays(rules_df)
    j = cand.join(F.broadcast(rule_arrays), "host", "left")
    best = F.array_max(
        F.filter("_rules", lambda r: F.regexp_like(F.col("path_q"), r["regex"]))
    )
    return j.withColumn(
        "allowed",
        F.col("_rules").isNull() | best.isNull() | (best["is_allow"] == 1),
    ).drop("_rules")
