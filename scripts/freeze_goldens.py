"""Freeze extraction + crawl goldens (run ONCE; re-run only on a deliberate
spec change — see SEMANTICS.md header)."""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lectura.config import CrawlConfig
from lectura.oracle import run_oracle
from lectura.pure.extract import extract_links, extract_text
from lectura.synth import SynthParams, make_corpus, page_html, url_for

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "golden")
os.makedirs(GOLDEN_DIR, exist_ok=True)

HANDCRAFTED = [
    (
        "entities-and-noise",
        "http://hand.example/a/",
        "<html><head><title>x &amp; y</title><style>p{}</style>"
        "<script>let s='<a href=\"http://no.example/\">';</script></head>"
        "<body><!-- <a href='http://no2.example/'>n</a> -->"
        "<a href='b/../c?z=%7E'>l1</a><a href=\"//proto.example/p\">l2</a>"
        "<p>café &copy; &#8212; end</p></body></html>",
    ),
    (
        "relative-forms",
        "http://hand.example/d1/d2/page?q=1",
        "<body><a href='..'>up</a><a href='./x'>x</a><a href='?r=2'>q</a>"
        "<a href='/abs'>abs</a><a href='HTTPS://S.EXAMPLE:443/'>s</a></body>",
    ),
]

p = SynthParams(n_urls=200, n_hosts=10)
bounds = p.host_bounds()
goldens = []
for name, base, html in HANDCRAFTED:
    hb = html.encode("utf-8")
    goldens.append(
        {
            "name": name,
            "base_url": base,
            "html": html,
            "text_sha256": hashlib.sha256(extract_text(hb).encode()).hexdigest(),
            "text": extract_text(hb),
            "links": extract_links(hb, base),
        }
    )
for i in (0, 7, 42, 150):
    url = url_for(i, p, bounds)
    hb = page_html(i, p, bounds)
    goldens.append(
        {
            "name": f"synth-{i}",
            "base_url": url,
            "html": hb.decode("utf-8"),
            "text_sha256": hashlib.sha256(extract_text(hb).encode()).hexdigest(),
            "text": extract_text(hb),
            "links": extract_links(hb, url),
        }
    )
with open(os.path.join(GOLDEN_DIR, "extract_goldens.json"), "w") as f:
    json.dump(goldens, f, indent=1)
print(f"wrote {len(goldens)} extract goldens")

# 3-round oracle frontier dumps (SURVEY.md §5.2: e2e equality reference)
corpus = make_corpus(SynthParams(n_urls=500, n_hosts=20))
cfg = CrawlConfig(max_round_urls=200)
res = run_oracle(corpus, cfg, rounds=3)
dump = {
    "scheduled": res.scheduled,
    "text_sha256": {u: hashlib.sha256(t.encode()).hexdigest()
                    for u, t in sorted(res.text.items())},
    "seen": sorted(res.seen),
    "final_frontier_urls": [r["url"] for r in res.frontier_final],
}
with open(os.path.join(GOLDEN_DIR, "oracle_3rounds.json"), "w") as f:
    json.dump(dump, f, indent=1)
print("wrote oracle_3rounds.json:",
      [len(s) for s in res.scheduled], "scheduled per round")
