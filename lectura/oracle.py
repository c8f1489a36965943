"""Single-node pure-Python oracle crawler (SURVEY.md §0 item 6).

Implements SEMANTICS.md literally with plain loops — no Spark. The Spark
pipeline (lectura/crawl.py) must match this oracle EXACTLY: per-round
scheduled ordering, seen-set membership, and extracted text bytes (B:14,
B:15). Shares the pure functions in lectura/pure/ verbatim with the Spark
UDFs, which is what makes byte-exactness achievable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from lectura.config import CrawlConfig
from lectura.pure.extract import extract_links, extract_text
from lectura.pure.robots import Rule, evaluate, parse_robots
from lectura.pure.urlnorm import (
    canonicalize_url,
    host_reverse_key,
    path_query_of,
    registered_host,
)


@dataclass
class OracleResult:
    scheduled: list[list[dict]] = field(default_factory=list)  # per round, ordered
    text: dict[str, str] = field(default_factory=dict)  # url -> extracted text
    seen: set[str] = field(default_factory=set)
    frontier_final: list[dict] = field(default_factory=list)
    fetch_log: list[dict] = field(default_factory=list)
    blocked: set[str] = field(default_factory=set)


def _best_row(rows: list[dict]) -> dict:
    return min(
        rows,
        key=lambda r: (
            -r["score"],
            r["depth"],
            r["discovered_ts"],
            r["src_url"] or "",
        ),
    )


def dedupe_frontier(rows: list[dict]) -> list[dict]:
    by_url: dict[str, list[dict]] = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    return [_best_row(v) for v in by_url.values()]


def _fetch_one(r: dict, rnd: int, round_ts, cfg: CrawlConfig, base: dict,
               pages_by_url: dict, res: OracleResult,
               fp_hist: dict, host_of: dict, enrich_cache: dict,
               children: list[dict]) -> None:
    """As-of fetch + extract of one scheduled row (shared by discovery and
    revisit rounds — SEMANTICS.md §16 requires the identical fetch path).
    Appends the fetch_log row, updates latest text + fingerprint history,
    and extends `children` with scored outlinks."""
    from lectura.pure.enrich import enrich_text

    caps = [c for c in pages_by_url.get(r["url"], []) if c[0] <= round_ts]
    if not caps:
        res.fetch_log.append(
            {"round": rnd, "url": r["url"], "host": r["host"],
             "status": "miss", "n_links": 0, "bytes": 0}
        )
        return
    ts, html, _ = caps[-1]
    text = extract_text(html)
    res.text[r["url"]] = text
    fp_hist.setdefault(r["url"], []).append(
        (rnd, enrich_text(text, enrich_cache)["fingerprint"])
    )
    host_of[r["url"]] = r["host"]
    links = extract_links(html, r["url"])
    res.fetch_log.append(
        {"round": rnd, "url": r["url"], "host": r["host"],
         "status": "ok", "n_links": len(links), "bytes": len(html)}
    )
    child_depth = r["depth"] + 1
    if child_depth > cfg.max_depth:
        return
    sc = base[child_depth] + cfg.w2 * r["score"]
    for link in links:
        children.append(
            {
                "url": link,
                "host": registered_host(link),
                "depth": child_depth,
                "score": sc,
                "discovered_ts": round_ts,
                "src_url": r["url"],
            }
        )


def run_oracle(corpus: dict, cfg: CrawlConfig, rounds: int,
               recrawl_rounds: int = 0) -> OracleResult:
    # --- static lookups -------------------------------------------------
    pages_by_url: dict[str, list[tuple[datetime, bytes, str]]] = {}
    for p in corpus["pages"]:
        pages_by_url.setdefault(p["url"], []).append(
            (p["warc_ts"], p["html"], p["text"])
        )
    for caps in pages_by_url.values():
        caps.sort(key=lambda c: c[0])

    rules_by_host: dict[str, list[Rule]] = {}
    for r in corpus["robots"]:
        rules_by_host[r["host"]] = parse_robots(r["host"], r["body"])

    delay_by_host: dict[str, float | None] = {}
    allow_cache: dict[tuple[str, str], bool] = {}

    def host_delay(host: str) -> float | None:
        if host not in delay_by_host:
            rules = rules_by_host.get(host, [])
            _, d = evaluate(rules, cfg.agent, "/")
            delay_by_host[host] = d
        return delay_by_host[host]

    def allowed(url: str) -> bool:
        host = registered_host(url)
        pq = path_query_of(url)
        key = (host, pq)
        if key not in allow_cache:
            rules = rules_by_host.get(host, [])
            ok, _ = evaluate(rules, cfg.agent, pq)
            allow_cache[key] = ok
        return allow_cache[key]

    base = cfg.depth_base()
    res = OracleResult()
    host_last_round: dict[str, int] = {}
    # per-url ok-fetch history for revisit rounds (SEMANTICS.md §16):
    # ordered (round, text fingerprint) pairs, fingerprint from the SAME
    # pure enrichment the Spark extraction writes to the text table.
    fp_hist: dict[str, list[tuple[int, int]]] = {}
    host_of: dict[str, str] = {}
    enrich_cache: dict = {}

    # --- round 0 frontier: canonicalized seeds --------------------------
    frontier: list[dict] = []
    for s in corpus["seeds"]:
        u = canonicalize_url(s["url"])
        if u is not None:
            frontier.append(
                {
                    "url": u,
                    "host": registered_host(u),
                    "depth": 0,
                    "score": base[0] + cfg.w2 * float(s["score"]),
                    "discovered_ts": cfg.round_ts(0),
                    "src_url": None,
                }
            )
    # --- sitemap discovery (SEMANTICS.md §15, cfg.use_sitemaps) ---------
    if cfg.use_sitemaps:
        from lectura.pure.sitemap import (parse_sitemap,
                                          sitemaps_from_robots_body)

        t0 = cfg.round_ts(0)

        def sitemap_xml(loc: str) -> str | None:
            u = canonicalize_url(loc)
            if u is None:
                return None
            caps = [c for c in pages_by_url.get(u, []) if c[0] <= t0]
            if not caps:
                return None
            return caps[-1][1].decode("utf-8", errors="replace")

        entries: list[tuple[str, float]] = []
        subs: list[str] = []
        for r in corpus["robots"]:
            for loc in sitemaps_from_robots_body(r["body"]):
                xml = sitemap_xml(loc)
                if xml is not None:
                    us, ss = parse_sitemap(xml)
                    entries.extend(us)
                    subs.extend(ss)
        for loc in subs:  # one level of index recursion (the protocol)
            xml = sitemap_xml(loc)
            if xml is not None:
                us, _ = parse_sitemap(xml)
                entries.extend(us)
        best: dict[str, float] = {}
        for loc, pr in entries:  # max priority per RAW loc (Spark agg)
            best[loc] = max(best.get(loc, float("-inf")), pr)
        for loc in sorted(best):
            u = canonicalize_url(loc)
            if u is not None:
                frontier.append(
                    {
                        "url": u,
                        "host": registered_host(u),
                        "depth": 0,
                        "score": base[0] + cfg.w2 * best[loc],
                        "discovered_ts": cfg.round_ts(0),
                        "src_url": None,
                    }
                )

    frontier = dedupe_frontier(frontier)

    # --- rounds ----------------------------------------------------------
    for rnd in range(1, rounds + 1):
        round_ts = cfg.round_ts(rnd)
        cands = [r for r in dedupe_frontier(frontier) if r["url"] not in res.seen]

        ok_cands: list[dict] = []
        for r in cands:
            if allowed(r["url"]):
                ok_cands.append(r)
            else:
                res.seen.add(r["url"])
                res.blocked.add(r["url"])

        # per-host politeness rank + budget
        by_host: dict[str, list[dict]] = {}
        for r in ok_cands:
            by_host.setdefault(r["host"], []).append(r)
        kept: list[dict] = []
        leftovers: list[dict] = []
        for host, rows in by_host.items():
            b = cfg.budget(host_delay(host), rnd, host_last_round.get(host))
            rows.sort(key=lambda r: (-r["score"], r["depth"], r["url"]))
            kept.extend(rows[:b])
            leftovers.extend(rows[b:])

        # global deterministic order + cap (the judged artifact)
        kept.sort(key=lambda r: (-r["score"], host_reverse_key(r["url"]), r["url"]))
        scheduled = kept[: cfg.max_round_urls]
        leftovers.extend(kept[cfg.max_round_urls :])

        res.scheduled.append(
            [
                {"url": r["url"], "host": r["host"], "depth": r["depth"],
                 "score": r["score"]}
                for r in scheduled
            ]
        )
        for r in scheduled:
            res.seen.add(r["url"])
        for host in {r["host"] for r in scheduled}:
            host_last_round[host] = rnd

        # fetch (as-of) + extract
        children: list[dict] = []
        for r in scheduled:
            _fetch_one(r, rnd, round_ts, cfg, base, pages_by_url, res,
                       fp_hist, host_of, enrich_cache, children)

        frontier = [
            r
            for r in dedupe_frontier(leftovers + children)
            if r["url"] not in res.seen
        ]

    # --- revisit rounds (SEMANTICS.md §16) -------------------------------
    for rnd in range(rounds + 1, rounds + recrawl_rounds + 1):
        now = cfg.epoch(rnd)
        round_ts = cfg.round_ts(rnd)
        cands: list[dict] = []
        for url, obs in fp_hist.items():
            n_changes = sum(
                1 for a, b in zip(obs, obs[1:]) if a[1] != b[1]
            )
            first = cfg.epoch(obs[0][0])
            last = cfg.epoch(obs[-1][0])
            if n_changes > 0:
                est = (last - first) / n_changes
            else:
                est = cfg.recrawl_max_interval_s
            est = min(max(est, cfg.recrawl_min_interval_s),
                      cfg.recrawl_max_interval_s)
            overdue = (now - last - est) / est
            if overdue >= 0.0:
                cands.append({"url": url, "host": host_of[url],
                              "depth": 0, "score": overdue})

        by_host: dict[str, list[dict]] = {}
        for r in cands:
            by_host.setdefault(r["host"], []).append(r)
        kept: list[dict] = []
        for host, rows in by_host.items():
            b = cfg.budget(host_delay(host), rnd, host_last_round.get(host))
            rows.sort(key=lambda r: (-r["score"], r["depth"], r["url"]))
            kept.extend(rows[:b])
        kept.sort(key=lambda r: (-r["score"], host_reverse_key(r["url"]),
                                 r["url"]))
        scheduled = kept[: cfg.max_round_urls]
        # unscheduled-but-due revisits are NOT re-queued (due-ness is
        # recomputed from history next revisit round); nothing new
        # becomes seen.
        res.scheduled.append(
            [
                {"url": r["url"], "host": r["host"], "depth": r["depth"],
                 "score": r["score"]}
                for r in scheduled
            ]
        )
        for host in {r["host"] for r in scheduled}:
            host_last_round[host] = rnd

        children = []
        for r in scheduled:
            _fetch_one(r, rnd, round_ts, cfg, base, pages_by_url, res,
                       fp_hist, host_of, enrich_cache, children)
        frontier = [
            r
            for r in dedupe_frontier(frontier + children)
            if r["url"] not in res.seen
        ]

    res.frontier_final = sorted(
        frontier, key=lambda r: (-r["score"], host_reverse_key(r["url"]), r["url"])
    )
    return res
