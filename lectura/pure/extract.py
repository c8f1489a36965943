"""Listing-page extraction spec (SEMANTICS.md §9; B:15 byte-identical text).

Pure functions over one page; the Spark side batches them through Arrow
(lectura/extract.py). The exact algorithm here IS the byte-exactness spec
— do not "improve" after goldens freeze (SURVEY.md §2.9.3).
"""

from __future__ import annotations

import html as _html
import re

_RE_STRIP = re.compile(
    r"<script\b.*?</script\s*>|<style\b.*?</style\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_RE_TAG = re.compile(r"<[^>]*>")
_RE_HREF = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
_SKIP_SCHEMES = ("mailto:", "javascript:", "tel:", "data:")


def _decode(html: bytes | str) -> str:
    if isinstance(html, bytes):
        return html.decode("utf-8", errors="replace")
    return html


def extract_text(html: bytes | str) -> str:
    """script/style/comments removed -> tags to spaces -> unescape -> ws-normalize."""
    s = _decode(html)
    s = _RE_STRIP.sub(" ", s)
    s = _RE_TAG.sub(" ", s)
    s = _html.unescape(s)
    return " ".join(s.split())


def extract_links(html: bytes | str, base_url: str) -> list[str]:
    """Canonical absolute http(s) outlinks, document order, in-page deduped."""
    from lectura.pure.urlnorm import resolve_url

    s = _decode(html)
    s = _RE_STRIP.sub(" ", s)
    seen: set[str] = set()
    out: list[str] = []
    for m in _RE_HREF.finditer(s):
        href = m.group(1) or m.group(2) or m.group(3) or ""
        href = _html.unescape(href).strip()
        if not href or href.startswith("#"):
            continue
        low = href.lower()
        if any(low.startswith(p) for p in _SKIP_SCHEMES):
            continue
        u = resolve_url(base_url, href)
        if u is None or u == base_url:
            continue
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out
