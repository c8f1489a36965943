"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §2).

Every page is a pure function of (params, index): `page_record(i)` needs no
global state, so the oracle crawler builds the corpus in a Python loop and
the bench builds the SAME corpus in parallel with `spark.range(n) →
mapInPandas` (lectura/synth_spark.py). Hosts are Zipf-skewed with host 0 a
mega-host (~30-50% of URLs) to exercise salting + AQE skew (B:6); hrefs
include non-canonical variants to exercise RFC 3986 normalization (U1);
`text` equals `extract_text(html)` by construction (the X2 golden).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from lectura.pure.extract import extract_text

_WORDS = (
    "listing page crawl frontier spark shuffle parquet arrow vector host "
    "politeness budget depth score link anchor index catalog schema table "
    "row column batch stream window agg join broadcast skew salt bloom hash "
    "robots allow disallow delay fetch extract text html body title nav"
).split()


@dataclass(frozen=True)
class SynthParams:
    seed: int = 42
    n_urls: int = 500
    n_hosts: int = 20
    zipf_s: float = 1.1
    mega_host_frac: float = 0.35  # host 0 owns at least this fraction
    min_links: int = 8
    max_links: int = 40
    cross_host_frac: float = 0.05
    query_frac: float = 0.10
    extra_capture_frac: float = 0.20
    no_robots_frac: float = 0.10
    n_seeds: int = 8
    doc_texts: tuple[str, ...] = ()  # optional body sentences (from documents)
    base_ts: datetime = datetime(2025, 12, 1, tzinfo=timezone.utc)
    # Extra filler body to reach ~body_kb KB of html per page (0 = legacy
    # small pages). Bench corpora use 8–16 KB — the realistic
    # Common-Crawl-scale page weight — so extraction is real work; test
    # fixtures/goldens keep the default and are byte-identical to before.
    body_kb: float = 0.0
    # write the text golden column (tests/oracle need it; bench corpora
    # skip it — the pipeline recomputes text from html anyway)
    with_text: bool = True

    def host_bounds(self) -> list[int]:
        """Contiguous index range per host: host h owns [b[h], b[h+1])."""
        w = [1.0 / (h + 1) ** self.zipf_s for h in range(self.n_hosts)]
        total = sum(w)
        w = [x / total for x in w]
        w[0] = max(w[0], self.mega_host_frac)
        total = sum(w)
        w = [x / total for x in w]
        bounds = [0]
        acc = 0.0
        for h in range(self.n_hosts):
            acc += w[h]
            bounds.append(min(self.n_urls, int(round(acc * self.n_urls))))
        bounds[-1] = self.n_urls
        for h in range(1, self.n_hosts + 1):  # monotone under rounding
            bounds[h] = max(bounds[h], bounds[h - 1])
        return bounds


def host_name(h: int) -> str:
    return f"host{h}.example"


def _host_of_index(i: int, bounds: list[int]) -> int:
    lo, hi = 0, len(bounds) - 2
    while lo < hi:  # bisect over ≤ a few hundred hosts
        mid = (lo + hi) // 2
        if bounds[mid + 1] <= i:
            lo = mid + 1
        else:
            hi = mid
    return lo


def url_for(i: int, p: SynthParams, bounds: list[int]) -> str:
    """Canonical URL of page index i: base-8 path tree, depth ≤ 5."""
    h = _host_of_index(i, bounds)
    local = i - bounds[h]
    if local == 0:
        path = "/"
    else:
        digits: list[str] = []
        x = local
        while x:
            digits.append(str(x % 8))
            x //= 8
        digits = digits[:5]
        path = "/" + "/".join(reversed(digits))
    url = f"http://{host_name(h)}{path}"
    rng = random.Random((p.seed << 24) ^ (i * 2654435761))
    if local != 0 and rng.random() < p.query_frac:
        url += f"?p={local}"
    return url


def _noncanon_variant(url: str, rng: random.Random) -> str:
    """Emit a non-canonical form of a canonical URL (exercises U1)."""
    r = rng.random()
    scheme, rest = url.split("://", 1)
    host, slash, tail = rest.partition("/")
    if r < 0.25:
        return f"{scheme}://{host.upper()}{slash}{tail}"
    if r < 0.45:
        port = ":80" if scheme == "http" else ":443"
        return f"{scheme}://{host}{port}{slash}{tail}"
    if r < 0.65:
        return url + "#frag%s" % rng.randrange(10)
    if r < 0.80:
        scheme, rest = url.split("://", 1)
        host, slash, tail = rest.partition("/")
        return f"{scheme}://{host}{slash}x/../{tail}"
    return url


def page_links(i: int, p: SynthParams, bounds: list[int]) -> list[tuple[str, str]]:
    """[(href_as_written, canonical_target)] for page i — pure."""
    rng = random.Random((p.seed << 16) ^ (i * 1000003) ^ 7)
    h = _host_of_index(i, bounds)
    lo, hi = bounds[h], bounds[h + 1]
    n_links = rng.randint(p.min_links, p.max_links)
    out: list[tuple[str, str]] = []
    for _ in range(n_links):
        if rng.random() < p.cross_host_frac or hi - lo <= 1:
            t = rng.randrange(p.n_urls)
        else:
            t = rng.randrange(lo, hi)
        target = url_for(t, p, bounds)
        v = rng.random()
        if v < 0.30 and _host_of_index(t, bounds) == h:
            href = target.split("://", 1)[1]
            href = href[href.find("/"):]  # relative-to-root path
        elif v < 0.55:
            href = _noncanon_variant(target, rng)
        else:
            href = target
        out.append((href, target))
    return out


def _body_sentences(i: int, p: SynthParams, rng: random.Random) -> list[str]:
    if p.doc_texts:
        k = rng.randrange(len(p.doc_texts))
        return [p.doc_texts[k][:400]]
    return [
        " ".join(rng.choice(_WORDS) for _ in range(rng.randint(8, 20))).capitalize() + "."
        for _ in range(rng.randint(2, 6))
    ]


def page_html(i: int, p: SynthParams, bounds: list[int]) -> bytes:
    rng = random.Random((p.seed << 8) ^ (i * 69069) ^ 13)
    url = url_for(i, p, bounds)
    links = page_links(i, p, bounds)
    parts = [
        "<!DOCTYPE html><html><head>",
        f"<title>Listing {i} &amp; friends</title>",
        "<style>body { color: #333; } a > span { font-weight: bold; }</style>",
        "<script>var x = '<a href=\"http://not-a-link.example/\">';</script>",
        "</head><body>",
        "<!-- nav section <a href='http://commented-out.example/'>hidden</a> -->",
        f"<h1>Index of {url}</h1>",
        "<ul class='nav'>",
    ]
    for href, _ in links:
        label = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(1, 3)))
        parts.append(f'<li><a href="{href}">{label}</a></li>')
    parts.append("</ul>")
    for s in _body_sentences(i, p, rng):
        parts.append(f"<p>{s}</p>")
    if p.body_kb > 0:
        # Pad to ~body_kb KB with MARKUP-heavy blocks (~10-15% text yield,
        # like real pages — most html bytes are tags/attrs, not copy).
        # Extraction must chew through all of it; only the small text
        # fraction survives into the output.
        target = int(p.body_kb * 1024)
        size = sum(len(x) for x in parts)
        k = 0
        while size < target:
            w1 = rng.choice(_WORDS)
            w2 = rng.choice(_WORDS)
            tok = "%08x%08x" % (rng.getrandbits(32), rng.getrandbits(32))
            blk = (
                f'<div id="blk-{k}" class="module module--{w1} grid__cell" '
                f'data-track="{tok}" data-pos="{k}" role="presentation" '
                f'style="margin:0;padding:0 .5em;border:none">'
                f'<span class="lbl lbl--{w2}" aria-hidden="false">{w1}</span>'
                f'<em data-ref="{tok[:8]}">{w2}</em></div>'
            )
            parts.append(blk)
            size += len(blk) + 1
            k += 1
    parts.append('<a href="mailto:admin@example.com">contact</a>')
    parts.append('<a href="#top">top</a>')
    parts.append("</body></html>")
    return "\n".join(parts).encode("utf-8")


def page_captures(i: int, p: SynthParams) -> list[datetime]:
    """1–2 capture timestamps; all ≤ base_ts + 20d (crawl START_TS is later)."""
    rng = random.Random((p.seed << 4) ^ (i * 48271) ^ 29)
    first = p.base_ts + timedelta(seconds=rng.randrange(0, 20 * 86400))
    caps = [first]
    if rng.random() < p.extra_capture_frac:
        caps.append(first + timedelta(seconds=rng.randrange(3600, 10 * 86400)))
    return caps


def page_records(i: int, p: SynthParams, bounds: list[int]) -> list[dict]:
    """All capture rows for page i: (url, warc_ts, html, text, lang)."""
    rng = random.Random((p.seed << 2) ^ (i * 16807) ^ 31)
    url = url_for(i, p, bounds)
    lang = "en" if rng.random() < 0.9 else rng.choice(["de", "fr", "es", "it"])
    rows = []
    for c, ts in enumerate(page_captures(i, p)):
        html = page_html(i, p, bounds)
        if c > 0:  # later capture differs (exercises as-of correctness F7)
            html = html.replace(b"<h1>Index of", b"<h1>Updated index of")
        rows.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": html,
                "text": extract_text(html) if p.with_text else "",
                "lang": lang,
            }
        )
    return rows


def make_seeds(p: SynthParams, bounds: list[int]) -> list[dict]:
    """Seed list: root pages of the first hosts, in non-canonical forms.
    When n_seeds > n_hosts, additional passes seed deeper pages spread
    across each host's index range (distinct, deterministic) — lets bench
    corpora start with a full frontier instead of one URL per host."""
    rng = random.Random((p.seed << 30) ^ 0x5EED)
    seeds = []
    seen_idx: set[int] = set()
    j = 0
    while len(seeds) < p.n_seeds:
        h = j % p.n_hosts
        pass_no = j // p.n_hosts
        lo, hi = bounds[h], bounds[h + 1]
        idx = lo if pass_no == 0 else lo + (pass_no * 2654435761) % max(hi - lo, 1)
        parity = j % 2
        j += 1
        if idx in seen_idx:
            if j > p.n_seeds * 4 + p.n_hosts:  # host ranges exhausted
                break
            continue
        seen_idx.add(idx)
        url = url_for(idx, p, bounds)
        seeds.append(
            {
                "url": _noncanon_variant(url, rng) if parity else url,
                "score": round(0.5 + 0.5 * rng.random(), 6),
            }
        )
    return seeds


def make_robots(p: SynthParams) -> list[dict]:
    """(host, body) rows; ~no_robots_frac hosts have none (default-allow)."""
    rows = []
    for h in range(p.n_hosts):
        rng = random.Random((p.seed << 10) ^ (h * 7919) ^ 101)
        if rng.random() < p.no_robots_frac:
            continue
        lines = ["# synthetic robots", "User-agent: *"]
        d1 = rng.randrange(8)
        lines.append(f"Disallow: /{d1}")
        if rng.random() < 0.5:
            lines.append(f"Allow: /{d1}/{rng.randrange(8)}")
        if rng.random() < 0.3:
            lines.append("Disallow: /*?p=")
        delay = rng.choice([1, 1, 2, 2, 3, 5, 5, 10, 120])
        lines.append(f"Crawl-delay: {delay}")
        if rng.random() < 0.25:  # specific-agent group overrides '*'
            lines += ["", "User-agent: lectura", f"Allow: /{d1}",
                      f"Crawl-delay: {max(1, delay // 2)}"]
        rows.append({"host": host_name(h), "body": "\n".join(lines)})
    return rows


def make_corpus(p: SynthParams) -> dict:
    """Whole corpus in memory (oracle/test scale)."""
    bounds = p.host_bounds()
    pages: list[dict] = []
    for i in range(p.n_urls):
        pages.extend(page_records(i, p, bounds))
    return {
        "pages": pages,
        "seeds": make_seeds(p, bounds),
        "robots": make_robots(p),
        "bounds": bounds,
    }
