"""Corpus export, sitemap ingestion, and recrawl scheduling operators:
edge-case behavior the contract queries' synthetic fixtures can't plant."""

import datetime

import pandas as pd
from pyspark.sql import functions as F

from lectura.frontier import recrawl_schedule
from lectura.sources import parse_sitemaps
from lectura.textops import corpus_export


def test_corpus_export_dedup_and_gates(spark):
    good = ("the quick brown fox jumps over the lazy dog and runs on "
            "with a pace that is good for the morning hunt in the field")
    rows = [
        (1, good, "en", "a"),
        (5, good, "en", "b"),          # exact dup — loses to doc_id 1
        (3, good, "en", "c"),          # exact dup — loses to doc_id 1
        (7, good, "de", "a"),          # language-gated
        (8, "short text", "en", "a"),  # under min_words
        (9, " ".join(["word"] * 50), "en", "a"),  # distinct_ratio-gated
        (10, " ".join(f"w{i}" for i in range(40)), "en", "a"),  # no stopwords
        (11, good + " extra tail words here today", "en", "a"),  # kept
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"]),
        schema="doc_id long, text string, lang string, source string",
    )
    out = corpus_export(docs, min_words=20).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1, 11]
    winner = out[0]
    assert winner.n_copies == 3 and winner.source == "a"
    assert out[1].n_copies == 1
    shas = {r.text_sha for r in out}
    assert len(shas) == 2  # no duplicate content survives


def test_parse_sitemaps_urlset_index_and_malformed(spark):
    xml = (
        "<?xml version='1.0'?>\n<urlset>\n"
        "  <url>\n    <loc>\n      https://h1.example.com/a\n    </loc>\n"
        "    <lastmod>2025-05-04</lastmod>\n"
        "    <priority>0.9</priority>\n  </url>\n"
        "  <url><loc>https://h1.example.com/b</loc></url>\n"
        "  <url><priority>oops</priority></url>\n"  # no loc: dropped
        "  <url><loc>https://h1.example.com/c</loc>"
        "<priority>bogus</priority></url>\n"        # bad priority: default
        "</urlset>\n"
        "<sitemapindex><sitemap>"
        "<loc>https://h1.example.com/sitemap-2.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        pd.DataFrame([("h1.example.com", xml)], columns=["host", "xml"]),
        schema="host string, xml string",
    )
    rows = {r.loc: r for r in parse_sitemaps(df).collect()}
    assert set(rows) == {
        "https://h1.example.com/a", "https://h1.example.com/b",
        "https://h1.example.com/c", "https://h1.example.com/sitemap-2.xml",
    }
    a = rows["https://h1.example.com/a"]
    assert a.kind == "url" and a.priority == 0.9
    assert a.lastmod == datetime.datetime(2025, 5, 4)
    b = rows["https://h1.example.com/b"]
    assert b.lastmod is None and b.priority == 0.5
    assert rows["https://h1.example.com/c"].priority == 0.5
    sub = rows["https://h1.example.com/sitemap-2.xml"]
    assert sub.kind == "sitemap"


def test_recrawl_schedule_estimates_and_clamps(spark):
    day = 86400
    t0 = datetime.datetime(2025, 1, 1)
    rows = []
    # u1: 11 fetches a day apart, 5 changes → est = 10 days / 5 = 2 days
    for i in range(11):
        rows.append(("u1", t0 + datetime.timedelta(days=i), i % 2 == 1))
    # u2: never changes → est clamps to max (30 d)
    for i in range(4):
        rows.append(("u2", t0 + datetime.timedelta(days=i), False))
    # u3: changes every fetch, minutes apart → est clamps to min (1 h)
    for i in range(5):
        rows.append(("u3", t0 + datetime.timedelta(minutes=i), True))
    hist = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "ts", "changed"]),
        schema="url string, ts timestamp, changed boolean",
    )
    now = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp()) + 40 * day
    out = {r.key: r for r in recrawl_schedule(hist, now).collect()}
    assert out["u1"].est_interval_s == 2 * day
    assert out["u1"].n_changes == 5 and out["u1"].n_obs == 11
    assert out["u2"].est_interval_s == 30 * day
    assert out["u3"].est_interval_s == 3600.0
    # u1 last fetch day 10, est 2 d → (40-10-2)/2 = 14 intervals overdue
    assert out["u1"].overdue == 14.0
    # ordering: u3 (minutes-old, hourly interval) is the most overdue
    assert out["u3"].overdue > out["u1"].overdue > out["u2"].overdue


def test_seeds_from_sitemaps(spark):
    from lectura.sources import seeds_from_sitemaps

    xml = ("<urlset>"
           "<url><loc>https://h2.example.com/a</loc>"
           "<priority>0.9</priority></url>"
           "<url><loc>https://h2.example.com/a</loc>"
           "<priority>0.3</priority></url>"
           "<url><loc>https://h2.example.com/b</loc></url>"
           "</urlset>"
           "<sitemapindex><sitemap>"
           "<loc>https://h2.example.com/more.xml</loc>"
           "</sitemap></sitemapindex>")
    df = spark.createDataFrame(
        pd.DataFrame([("h2.example.com", xml)], columns=["host", "xml"]),
        schema="host string, xml string",
    )
    seeds = {r.url: r.score
             for r in seeds_from_sitemaps(parse_sitemaps(df)).collect()}
    # dup loc keeps max priority; index entries are not seeds
    assert seeds == {"https://h2.example.com/a": 0.9,
                     "https://h2.example.com/b": 0.5}


def test_parse_sitemaps_roundtrip_property(spark):
    """Hypothesis round-trip: arbitrary well-formed sitemap entries (any
    field subset, random whitespace/newlines inside tags) parse back to
    exactly the entries serialized."""
    from hypothesis import given, settings, strategies as st

    loc_st = st.from_regex(r"https://h[0-9]\.example\.com/[a-z0-9/_-]{0,30}",
                           fullmatch=True)
    ws = st.sampled_from(["", " ", "\n  ", "\t"])
    entry_st = st.fixed_dictionaries({
        "loc": loc_st,
        "lastmod": st.one_of(st.none(), st.dates(
            min_value=datetime.date(2000, 1, 1),
            max_value=datetime.date(2030, 12, 28)).map(str)),
        "priority": st.one_of(
            st.none(),
            st.floats(min_value=0.0, max_value=1.0,
                      allow_nan=False).map(lambda f: round(f, 2))),
        "w": ws,
    })

    @settings(max_examples=10, deadline=None)
    @given(st.lists(entry_st, min_size=1, max_size=8))
    def check(entries):
        parts = []
        for e in entries:
            w = e["w"]
            s = f"<url><loc>{w}{e['loc']}{w}</loc>"
            if e["lastmod"] is not None:
                s += f"<lastmod>{w}{e['lastmod']}{w}</lastmod>"
            if e["priority"] is not None:
                s += f"<priority>{e['priority']!r}</priority>"
            parts.append(s + "</url>")
        xml = "<urlset>" + "".join(parts) + "</urlset>"
        df = spark.createDataFrame(
            pd.DataFrame([("h.example.com", xml)], columns=["host", "xml"]),
            schema="host string, xml string",
        )
        got = parse_sitemaps(df).collect()
        assert len(got) == len(entries)
        for g, e in zip(got, entries):
            assert g.loc == e["loc"]
            want_lm = (None if e["lastmod"] is None
                       else datetime.datetime.fromisoformat(e["lastmod"]))
            assert g.lastmod == want_lm
            want_p = 0.5 if e["priority"] is None else e["priority"]
            assert g.priority == want_p

    check()


def test_retry_schedule_vectors(spark):
    """Backoff table: consecutive trailing failures k → next = last +
    min(2^(k-1), cap); last-attempt-ok urls absent; same-round ok+miss
    resolves to the success; k > max_retries dropped."""
    import pandas as pd

    from lectura.frontier import retry_schedule

    rows = [
        # u1: ok@1 then misses @2,3 -> k=2, next = 3 + 2
        ("u1", 1, "ok"), ("u1", 2, "miss"), ("u1", 3, "miss"),
        # u2: miss then ok last -> no retry row
        ("u2", 1, "miss"), ("u2", 2, "ok"),
        # u3: never ok, 7 misses -> past max_retries=5, dropped
        *[("u3", r, "miss") for r in range(1, 8)],
        # u4: ok and miss in the SAME round -> failure not after success
        ("u4", 1, "miss"), ("u4", 2, "ok"), ("u4", 2, "miss"),
        # u5: never ok, 6 misses with cap 8: min(2^5, 8) = 8
        *[("u5", r, "miss") for r in range(1, 7)],
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "round", "status"]),
        schema="url string, round int, status string",
    )
    got = {r.key: (r.n_fails, r.last_round, r.next_attempt_round)
           for r in retry_schedule(df, max_retries=6,
                                   max_backoff_rounds=8).collect()}
    assert got == {"u1": (2, 3, 5), "u5": (6, 6, 14)}
    # u3 has 7 trailing fails: included only when max_retries allows
    got7 = {r.key for r in retry_schedule(df, max_retries=7).collect()}
    assert got7 == {"u1", "u3", "u5"}


def test_retry_schedule_no_shift_overflow(spark):
    """k >= 32 trailing failures must hit the cap, not a wrapped 32-bit
    shift (shiftleft(1, 31) is negative as INT; 1<<33 masks to 2)."""
    import pandas as pd

    from lectura.frontier import retry_schedule

    rows = [("u", r, "miss") for r in range(1, 35)]  # 34 straight misses
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "round", "status"]),
        schema="url string, round int, status string",
    )
    r = retry_schedule(df, max_retries=40, max_backoff_rounds=32).head()
    assert (r.n_fails, r.last_round, r.next_attempt_round) == (34, 34, 66)


def test_retry_schedule_single_shuffle_plan(spark):
    import pandas as pd

    from lectura.frontier import retry_schedule

    df = spark.createDataFrame(
        pd.DataFrame([("u", 1, "miss")], columns=["url", "round", "status"]),
        schema="url string, round int, status string",
    )
    plan = (retry_schedule(df)._jdf.queryExecution()
            .executedPlan().toString())
    # the window's hash partitioning is reused by the groupBy — one
    # exchange total
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_trap_templates_matches_pure(spark):
    """Pure-Python reference for crawler-trap template mining: distinct
    urls first (duplicates collapse), digit runs in the PATH fold to
    'N', missing paths template as '', and both thresholds (min_fanout,
    min_frac) must each exclude something in the fixture."""
    import re
    from collections import Counter

    from lectura.frontier import trap_templates

    urls = (
        # calendar trap: one template dominates host a (frac 1.0)
        [f"http://a.example/cal/2026/{m}/{d}" for m in range(1, 6)
         for d in range(1, 9)]
        # duplicates of the first few: must count once
        + [f"http://a.example/cal/2026/1/{d}" for d in range(1, 9)]
        # diverse host: two templates, each frac 0.5 but fanout < min
        + [f"http://b.example/p/{i}" for i in range(6)]
        + [f"http://b.example/q/{i}" for i in range(6)]
        # tiny single-template host: frac 1.0, fanout below min
        + ["http://c.example/only/1", "http://c.example/only/2"]
        # path-less urls (distinct via query): template '' must be
        # OBSERVABLE in the flagged output — 12 distinct >= min_fanout,
        # frac 1.0 — so a parse_url PATH NULL-vs-'' regression cannot
        # ship green
        + [f"http://d.example?x={i}" for i in range(12)]
        + ["http://d.example?x=0"] * 2     # duplicates count once
        # malformed URL must NOT abort the pass under ANSI (try_parse_url:
        # unparseable path templates as ''), uppercase scheme is accepted,
        # and a scheme-less string is dropped as not crawlable
        + ["http://a.example/cal/2026/9/9 trailing junk",
           "HTTP://E.example/cal/2026/1/1", "not a url at all"]
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {(r.host, r.template): (r.n_urls, r.host_urls, r.fanout_frac)
           for r in trap_templates(df, min_fanout=10, min_frac=0.6)
           .collect()}

    seen = sorted(set(urls))
    per = Counter()
    for u in seen:
        m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)(/[^?#]*)?", u)
        if not m:
            continue                      # not crawlable: dropped
        host, path = m.group(1).lower(), m.group(2) or ""
        if " " in u:
            path = ""                     # try_parse_url: malformed -> NULL
        per[(host, re.sub(r"[0-9]+", "N", path))] += 1
    hosts = Counter()
    for (h, _), n in per.items():
        hosts[h] += n
    want = {}
    for (h, tpl), n in per.items():
        frac = n / hosts[h]
        if n >= 10 and frac >= 0.6:
            want[(h, tpl)] = (n, hosts[h], round(frac, 4))
    assert got == want
    # a.example's malformed row templates as '' and joins its host
    # total (41), so the calendar template's frac drops below 1.0 but
    # stays flagged; the uppercase-scheme host has 1 url (not flagged)
    assert got == {("a.example", "/cal/N/N/N"): (40, 41, round(40 / 41, 4)),
                   ("d.example", ""): (12, 12, 1.0)}


def test_blocklist_filter_matches_pure(spark):
    """Pure-Python UT1 blocklist semantics: suffix matching blocks
    subdomains, the most specific entry wins, ports and malformed URLs
    never match, NULL url degrades to host='' / unblocked; the URL
    side must join by broadcast only (no sort-merge join)."""
    from lectura.frontier import blocklist_filter

    bl = spark.createDataFrame(
        [("bad.example",), ("ads.good.example",), ("deep.example",),
         ("bad.example",)],  # duplicate entry must not duplicate rows
        "domain string")
    rows = [
        (1, "http://bad.example/x"),              # exact
        (2, "http://a.bad.example/x"),            # parent suffix
        (3, "HTTPS://B.A.BAD.EXAMPLE/x"),         # case + depth-3 suffix
        (4, "http://good.example/x"),             # subdomain-only entry
        (5, "http://ads.good.example/x"),         # subtree root
        (6, "http://x.ads.good.example/x"),       # inside subtree
        (7, "http://bad.example:8080/x"),         # port = distinct authority
        (8, "not a url"),                         # malformed
        (9, None),                                # NULL url
        (10, "http://v.w.x.y.deep.example/x"),    # level 5 suffix
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = blocklist_filter(df.select("url"), bl, max_depth=6)
    got = {r.url: (r.host, r.matched_domain, r.blocked)
           for r in out.collect()}

    assert got["http://bad.example/x"] == \
        ("bad.example", "bad.example", True)
    assert got["http://a.bad.example/x"] == \
        ("a.bad.example", "bad.example", True)
    assert got["HTTPS://B.A.BAD.EXAMPLE/x"] == \
        ("b.a.bad.example", "bad.example", True)
    assert got["http://good.example/x"] == \
        ("good.example", None, False)
    assert got["http://ads.good.example/x"] == \
        ("ads.good.example", "ads.good.example", True)
    assert got["http://x.ads.good.example/x"] == \
        ("x.ads.good.example", "ads.good.example", True)
    assert got["http://bad.example:8080/x"] == \
        ("bad.example:8080", None, False)
    assert got["not a url"] == ("", None, False)
    assert got[None] == (None, None, False)
    assert got["http://v.w.x.y.deep.example/x"] == \
        ("v.w.x.y.deep.example", "deep.example", True)
    # a max_depth too shallow to reach the suffix leaves it unblocked
    shallow = blocklist_filter(df.select("url"), bl, max_depth=3)
    deep = {r.url: r.blocked for r in shallow.collect()}
    assert deep["http://v.w.x.y.deep.example/x"] is False

    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both
    assert final.count("BroadcastHashJoin") == 6
    assert "SortMergeJoin" not in plan
