"""Pure-Python sitemap parsing spec — the oracle-side mirror of the
Spark operators in lectura/sources.py (`parse_sitemaps`,
`sitemaps_from_robots`). Both sides must agree byte-for-byte on
conforming documents, which is what makes the sitemap-enabled crawl
e2e-checkable against the pure oracle crawler (SEMANTICS.md §15):

* blocks: non-greedy dotall regex over ``<url>``/``<sitemap>`` elements
  (sitemap files are machine-generated, flat, and bounded — 50k URLs /
  50 MB per the protocol — so block-regex parsing is exact on
  conforming documents; malformed blocks degrade to no-loc and are
  dropped, never errors);
* loc: first ``<loc>`` inside the block, surrounding whitespace
  stripped, empty → dropped;
* priority: first ``<priority>``, float-parsed, anything unparseable
  (or absent) → the protocol default 0.5 — mirroring Spark's
  ``try_cast('double')`` + ``coalesce(0.5)``;
* robots discovery: the group-independent, case-insensitive
  ``Sitemap: <url>`` directive (sitemaps.org / RFC 9309 §2.3), one
  absolute URL per line.
"""

from __future__ import annotations

import re

_URL_BLOCK = re.compile(r"(?s)<url>(.*?)</url>")
_MAP_BLOCK = re.compile(r"(?s)<sitemap>(.*?)</sitemap>")
_LOC = re.compile(r"(?s)<loc>\s*(.*?)\s*</loc>")
_PRIORITY = re.compile(r"(?s)<priority>\s*(.*?)\s*</priority>")
_DIRECTIVE = re.compile(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)")


def sitemaps_from_robots_body(body: str) -> list[str]:
    """All `Sitemap:` directive URLs of one robots.txt body, in order."""
    return _DIRECTIVE.findall(body)


def _try_float(s: str) -> float | None:
    try:
        v = float(s)
    except ValueError:
        return None
    # Spark try_cast('double') parses 'nan'/'inf' too; float() agrees
    return v


def parse_sitemap(xml: str) -> tuple[list[tuple[str, float]], list[str]]:
    """One sitemap document -> (url entries [(loc, priority)...],
    sub-sitemap locs [...]). `<urlset>` entries carry the seed priority
    (default 0.5); `<sitemapindex>` entries are further sitemaps to
    fetch (recursion bounded at one level by the protocol)."""
    urls: list[tuple[str, float]] = []
    subs: list[str] = []
    for block in _URL_BLOCK.findall(xml):
        m = _LOC.search(block)
        loc = m.group(1) if m else ""
        if not loc:
            continue
        pm = _PRIORITY.search(block)
        pr = 0.5
        if pm and pm.group(1) != "":
            v = _try_float(pm.group(1))
            if v is not None:
                pr = v
        urls.append((loc, pr))
    for block in _MAP_BLOCK.findall(xml):
        m = _LOC.search(block)
        loc = m.group(1) if m else ""
        if loc:
            subs.append(loc)
    return urls, subs
