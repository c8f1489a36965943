"""maintain --audit: per-host implied inter-fetch-gap quantiles (D9b
sketch over fetch_log) vs the declared crawl-delay. The detector is
SOUND: a flagged host provably undercut its delay; a compliant host is
never flagged (the sketch's lower-edge margin is accounted for)."""

import pandas as pd

from lectura.maintain import audit_politeness
from lectura.tables import Warehouse

ROUND_SECONDS = 60.0


def _mk_wh(spark, tmp_path):
    """Planted fetch_log + rules:
    - polite.example     delay 5s, 12 fetches/round (exactly budget) — OK
    - greedy.example     delay 5s, 40 fetches in one round (1.5s gap) — BAD
    - nodelay.example    no declared delay (default 5s), 3/round — OK
    - slow.example       delay 120s > round; fetched rounds 1,3 (120s) — OK
    - rushed.example     delay 120s; fetched rounds 1,2 (60s gap) — BAD
    """
    fl = []

    def rounds(host, per_round):
        for rnd, n in per_round.items():
            for i in range(n):
                fl.append({"round": rnd, "host": host,
                           "url": f"http://{host}/p{rnd}_{i}",
                           "status": "ok" if i % 3 else "miss",
                           "bytes": 10, "n_links": 0})

    rounds("polite.example", {1: 12, 2: 12, 3: 12})
    rounds("greedy.example", {1: 40})
    rounds("nodelay.example", {1: 3, 2: 3})
    rounds("slow.example", {1: 1, 3: 1})
    rounds("rushed.example", {1: 1, 2: 1})

    rules = [
        {"host": "polite.example", "rule_type": "allow", "pattern": "",
         "regex": "^", "priority": 0, "crawl_delay": 5.0},
        {"host": "greedy.example", "rule_type": "allow", "pattern": "",
         "regex": "^", "priority": 0, "crawl_delay": 5.0},
        {"host": "nodelay.example", "rule_type": "allow", "pattern": "",
         "regex": "^", "priority": 0, "crawl_delay": None},
        {"host": "slow.example", "rule_type": "allow", "pattern": "",
         "regex": "^", "priority": 0, "crawl_delay": 120.0},
        {"host": "rushed.example", "rule_type": "allow", "pattern": "",
         "regex": "^", "priority": 0, "crawl_delay": 120.0},
    ]
    wh = Warehouse(str(tmp_path / "wh"), spark)
    wh.overwrite("fetch_log", spark.createDataFrame(
        pd.DataFrame(fl),
        schema="round int, host string, url string, status string, "
               "bytes long, n_links int"))
    wh.overwrite("rules", spark.createDataFrame(
        pd.DataFrame(rules),
        schema="host string, rule_type string, pattern string, "
               "regex string, priority int, crawl_delay double"))
    return wh


def test_audit_flags_planted_violators(spark, tmp_path):
    wh = _mk_wh(spark, tmp_path)
    rows = {r.host: r for r in
            audit_politeness(wh, round_seconds=ROUND_SECONDS).collect()}
    assert set(rows) == {"polite.example", "greedy.example",
                         "nodelay.example", "slow.example",
                         "rushed.example"}
    assert rows["greedy.example"].violating        # 1.5s gaps vs 5s
    assert rows["rushed.example"].violating        # 60s cross-gap vs 120s
    assert not rows["polite.example"].violating    # exactly at budget
    assert not rows["nodelay.example"].violating   # default delay honored
    assert not rows["slow.example"].violating      # 120s cross-gap ok

    g = rows["greedy.example"]
    assert g.n_fetches == 40 and g.declared_delay_s == 5.0
    # 39 gaps of 1500 ms → every quantile's lower edge is <= 1.5 s
    assert g.p1_gap_s <= 1.5 and g.p99_gap_s <= 1.5
    nd = rows["nodelay.example"]
    assert nd.defaulted and nd.declared_delay_s == 5.0
    # polite: within-round gaps 5 s + cross-round gaps 60 s — p99 sees
    # the cross-round tail, p1 the tight spacing (lower-edge estimates)
    p = rows["polite.example"]
    assert 4.6 <= p.p1_gap_s <= 5.0
    assert p.p99_gap_s >= 55.0


def test_audit_miss_rows_consume_budget(spark, tmp_path):
    """'miss' fetches count as attempts — a host whose budget was spent
    on 404s still shows its true request spacing."""
    wh = _mk_wh(spark, tmp_path)
    got = {r.host: r.n_fetches for r in audit_politeness(
        wh, round_seconds=ROUND_SECONDS).collect()}
    assert got["greedy.example"] == 40  # includes miss rows


def test_audit_cli_exit_code(spark, tmp_path, capsys):
    import json

    from lectura.maintain import main

    wh = _mk_wh(spark, tmp_path)
    rc = main(["--warehouse", wh.root, "--audit",
               "--round-seconds", str(ROUND_SECONDS)])
    assert rc == 1  # violations present
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()
           if l.strip()]
    summary = out[-1]["_summary"]
    assert summary == {"hosts_audited": 5, "violations": 2}
    # violations printed first
    assert out[0]["violating"] and out[1]["violating"]
