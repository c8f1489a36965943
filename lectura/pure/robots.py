"""RFC 9309 robots.txt parsing + longest-match rule resolution
(SEMANTICS.md §6; B:6 "robots.txt directive filtering").

Pure functions: `parse_robots` turns one robots.txt body into flat rule
rows (the shape broadcast-joined in Spark, SURVEY.md R1–R3); `evaluate`
resolves allow/disallow for one path the way the Spark window-rank does,
so the oracle crawler and the pipeline share one semantics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class Rule:
    host: str
    agent: str  # the group's matched agent token ('*' or specific)
    rule_type: str  # 'allow' | 'disallow'
    pattern: str  # raw path pattern (may contain * and $)
    priority: int  # len(pattern) — RFC 9309 §2.2.2 longest match
    crawl_delay: float | None  # group-level crawl-delay if any


def _pattern_to_regex(pattern: str) -> str:
    """robots path pattern -> anchored regex source ('*' wildcard, '$' end)."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    parts = [re.escape(p) for p in body.split("*")]
    rx = "^" + ".*".join(parts)
    if anchored_end:
        rx += "$"
    return rx


def pattern_matches(pattern: str, path: str) -> bool:
    return re.match(_pattern_to_regex(pattern), path) is not None


def parse_robots(host: str, body: str) -> list[Rule]:
    """Flatten one robots.txt into Rule rows, all groups kept.

    Group = consecutive `user-agent` lines followed by rules (RFC 9309
    §2.1). Rules before any user-agent line are ignored. Unknown fields
    ignored. Empty patterns ignored.
    """
    groups: list[tuple[list[str], list[tuple[str, str]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    cur_delay: float | None = None
    collecting_agents = False

    def flush() -> None:
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not collecting_agents:
                flush()
                collecting_agents = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            collecting_agents = False
            if value:
                cur_rules.append((field, value))
        elif field == "crawl-delay":
            collecting_agents = False
            try:
                d = float(value)
                if d >= 0:
                    cur_delay = d
            except ValueError:
                pass
        else:
            collecting_agents = False
    flush()

    rules: list[Rule] = []
    for agents, rulelist, delay in groups:
        for agent in agents:
            for rule_type, pattern in rulelist:
                rules.append(
                    Rule(host, agent, rule_type, pattern, len(pattern), delay)
                )
            if not rulelist:
                # empty group still carries agent match + crawl-delay
                rules.append(Rule(host, agent, "allow", "", 0, delay))
            elif delay is not None:
                pass  # delay already attached to each rule row
    return rules


def select_group(rules: list[Rule], agent: str) -> list[Rule]:
    """Rules of the best-matching group: exact agent token beats '*'."""
    agent = agent.lower()
    exact = [r for r in rules if r.agent == agent]
    if exact:
        return exact
    return [r for r in rules if r.agent == "*"]


def evaluate(rules: list[Rule], agent: str, path: str) -> tuple[bool, float | None]:
    """(allowed, crawl_delay) for path under the best-matching group.

    Longest matching pattern wins; Allow wins length ties; no matching
    rule (or no rules at all) => allowed.
    """
    grp = select_group(rules, agent)
    delay = None
    for r in grp:
        if r.crawl_delay is not None:
            delay = r.crawl_delay
    best: Rule | None = None
    for r in grp:
        if not r.pattern:
            continue
        if pattern_matches(r.pattern, path):
            if (
                best is None
                or r.priority > best.priority
                or (
                    r.priority == best.priority
                    and r.rule_type == "allow"
                    and best.rule_type == "disallow"
                )
            ):
                best = r
    allowed = best is None or best.rule_type == "allow"
    return allowed, delay
