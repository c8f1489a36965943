"""R1–R4 unit tests (RFC 9309 §2.2 / §5.2 cases; SEMANTICS.md §6)."""

from lectura.pure.robots import (
    evaluate,
    parse_robots,
    pattern_matches,
    select_group,
)

BODY = """\
# comments are stripped
User-agent: *
Disallow: /private
Allow: /private/open
Crawl-delay: 7
Disallow: /*.gif$
Disallow: /tmp/*?session=

User-agent: lectura
User-agent: otherbot
Allow: /private
Crawl-delay: 3
"""


def test_parse_groups_and_agents():
    rules = parse_robots("h.example", BODY)
    agents = {r.agent for r in rules}
    assert agents == {"*", "lectura", "otherbot"}
    star = [r for r in rules if r.agent == "*"]
    assert {(r.rule_type, r.pattern) for r in star} == {
        ("disallow", "/private"),
        ("allow", "/private/open"),
        ("disallow", "/*.gif$"),
        ("disallow", "/tmp/*?session="),
    }
    assert all(r.crawl_delay == 7.0 for r in star)


def test_agent_precedence():
    rules = parse_robots("h.example", BODY)
    assert {r.agent for r in select_group(rules, "LECTURA")} == {"lectura"}
    assert {r.agent for r in select_group(rules, "unknown")} == {"*"}
    # specific group allows what '*' disallows
    assert evaluate(rules, "lectura", "/private/x") == (True, 3.0)
    assert evaluate(rules, "unknown", "/private/x") == (False, 7.0)


def test_longest_match_and_allow_tiebreak():
    rules = parse_robots("h", "User-agent: *\nDisallow: /a\nAllow: /a/b\n")
    assert evaluate(rules, "x", "/a/zzz")[0] is False
    assert evaluate(rules, "x", "/a/b/c")[0] is True  # longer allow wins
    # equal length: allow wins the tie (RFC 9309 §2.2.2)
    rules2 = parse_robots("h", "User-agent: *\nDisallow: /ab\nAllow: /ab\n")
    assert evaluate(rules2, "x", "/ab/c")[0] is True


def test_wildcards_and_anchor():
    assert pattern_matches("/*.gif$", "/pics/cat.gif")
    assert not pattern_matches("/*.gif$", "/pics/cat.gif?x=1")
    assert pattern_matches("/tmp/*?session=", "/tmp/a/b?session=9")
    assert pattern_matches("/a*c", "/abbbc")
    assert not pattern_matches("/a*c", "/ab")
    rules = parse_robots("h", "User-agent: *\nDisallow: /*?p=\n")
    assert evaluate(rules, "x", "/1/2?p=9")[0] is False
    assert evaluate(rules, "x", "/1/2")[0] is True


def test_no_rules_defaults():
    assert evaluate([], "x", "/anything") == (True, None)
    rules = parse_robots("h", "")
    assert evaluate(rules, "x", "/") == (True, None)


def test_rules_before_any_agent_ignored():
    rules = parse_robots("h", "Disallow: /x\nUser-agent: *\nDisallow: /y\n")
    assert evaluate(rules, "a", "/x/1")[0] is True
    assert evaluate(rules, "a", "/y/1")[0] is False


def test_malformed_lines_skipped():
    rules = parse_robots(
        "h",
        "User-agent: *\nDisallow /nope\nCrawl-delay: fast\nDisallow: /ok\n",
    )
    assert evaluate(rules, "a", "/ok")[0] is False
    assert evaluate(rules, "a", "/nope")[0] is True
    assert evaluate(rules, "a", "/")[1] is None  # bad delay ignored


def test_spark_rule_table_matches_pure(spark, corpus, cfg):
    """R1 via mapInPandas == pure parse for every synthetic robots body."""
    import pandas as pd
    from lectura.robots import build_rule_table

    robots = spark.createDataFrame(
        pd.DataFrame(corpus["robots"]), schema="host string, body string"
    )
    got = {
        (r.host, r.rule_type, r.pattern, r.priority, r.crawl_delay)
        for r in build_rule_table(robots, cfg.agent).collect()
        if r.pattern != ""
    }
    want = set()
    for row in corpus["robots"]:
        grp = select_group(parse_robots(row["host"], row["body"]), cfg.agent)
        delay = None
        for r in grp:
            if r.crawl_delay is not None:
                delay = r.crawl_delay
        for r in grp:
            if r.pattern:
                want.add((r.host, r.rule_type, r.pattern, r.priority, delay))
    assert got == want


def test_sitemaps_from_robots_vectors(spark):
    """Sitemap: directive extraction — case-insensitive key, optional
    space before the colon, CRLF bodies, multiple directives per file;
    commented lines and bare mentions mid-line never match."""
    import pandas as pd

    from lectura.sources import sitemaps_from_robots

    bodies = {
        "a.example": ("User-agent: *\nDisallow: /x\n"
                      "Sitemap: https://a.example/s.xml\n"
                      "SITEMAP:https://a.example/t.xml"),
        "b.example": ("  sitemap : https://b.example/s.xml\r\n"
                      "User-agent: bot\r\nAllow: /"),
        "c.example": ("# Sitemap: https://c.example/commented.xml\n"
                      "Disallow: see Sitemap: https://c.example/inline.xml"),
        "d.example": "",
    }
    df = spark.createDataFrame(
        pd.DataFrame([{"host": h, "body": b} for h, b in bodies.items()]))
    got = sorted((r.host, r.sitemap_url)
                 for r in sitemaps_from_robots(df).collect())
    assert got == [
        ("a.example", "https://a.example/s.xml"),
        ("a.example", "https://a.example/t.xml"),
        ("b.example", "https://b.example/s.xml"),
    ]
