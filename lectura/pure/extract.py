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


def _text_from_stripped(s: str) -> str:
    s = _RE_TAG.sub(" ", s)
    s = _html.unescape(s)
    return " ".join(s.split())


def extract_text(html: bytes | str) -> str:
    """script/style/comments removed -> tags to spaces -> unescape -> ws-normalize."""
    s = _decode(html)
    s = _RE_STRIP.sub(" ", s)
    return _text_from_stripped(s)


def extract_page(html: bytes | str, base_url: str) -> tuple[str, list[str]]:
    """(text, links) in one pass: decode + script/style/comment strip — the
    two heaviest scans of the page — run ONCE and feed both outputs.
    Byte-identical to extract_text(html), extract_links(html, base_url);
    the fused X4 extraction calls this."""
    s = _decode(html)
    s = _RE_STRIP.sub(" ", s)
    return _text_from_stripped(s), _links_from_stripped(s, base_url)


def extract_links(html: bytes | str, base_url: str) -> list[str]:
    """Canonical absolute http(s) outlinks, document order, in-page deduped."""
    s = _decode(html)
    s = _RE_STRIP.sub(" ", s)
    return _links_from_stripped(s, base_url)


_RE_A_PAIR = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))[^>]*>"""
    r"""(.*?)</a\s*>""",
    re.IGNORECASE | re.DOTALL,
)


def extract_anchors(html: bytes | str, base_url: str) -> list[tuple[str, str]]:
    """(target_url, anchor_text) per <a href=…>…</a> occurrence, document
    order, multiplicity KEPT (anchor-text aggregation needs the raw
    occurrence stream, unlike extract_links' deduped set).

    href handling is identical to extract_links (unescape, skip
    empty/#/mailto:/javascript:/tel:/data:, resolve against base, §1
    canonicalize, http(s) only, skip self-links). Anchor text = the
    body between the opening tag and the nearest </a>, run through the
    same tag-strip → entity-unescape → whitespace-normalize pipeline as
    extract_text; may be ''. Anchors without a closing tag yield no
    row. script/style/comment regions are removed before matching."""
    s = _decode(html)
    s = _RE_STRIP.sub(" ", s)
    out: list[tuple[str, str]] = []
    memo: dict = {}
    for m in _RE_A_PAIR.finditer(s):
        raw = m.group(1) or m.group(2) or m.group(3) or ""
        u = _resolve_href(raw, base_url, memo)
        if u is None or u == base_url:
            continue
        out.append((u, _text_from_stripped(m.group(4))))
    return out


_MISS = object()


def _resolve_href(raw: str, base_url: str, memo: dict) -> str | None:
    """The frozen href pipeline shared by extract_links and
    extract_anchors: unescape → skip empty/#/mailto-class schemes →
    RFC 3986 resolve + §1 canonicalize. `memo` caches per page on the
    raw matched href (listing/nav pages repeat the same href many
    times — pure optimization, outputs identical)."""
    from lectura.pure.urlnorm import resolve_url

    u = memo.get(raw, _MISS)
    if u is _MISS:
        href = _html.unescape(raw).strip()
        if not href or href.startswith("#"):
            u = None
        else:
            low = href.lower()
            if any(low.startswith(p) for p in _SKIP_SCHEMES):
                u = None
            else:
                u = resolve_url(base_url, href)
        memo[raw] = u
    return u


def _links_from_stripped(s: str, base_url: str) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    memo: dict = {}
    for m in _RE_HREF.finditer(s):
        raw = m.group(1) or m.group(2) or m.group(3) or ""
        u = _resolve_href(raw, base_url, memo)
        if u is None or u == base_url:
            continue
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out
