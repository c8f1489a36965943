"""Summarize a Spark event log: per-job wall time + executor task time,
grouped by spark.job.description (set per phase/sink by lectura.crawl).
Usage: python scripts/analyze_evlog.py <evlog-file-or-dir>"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    if os.path.isdir(path):
        files = [os.path.join(path, f) for f in os.listdir(path)
                 if not f.startswith(".")]
        path = max(files, key=os.path.getmtime)
    jobs = {}
    stage_task_ms = defaultdict(float)
    stage_names = {}
    stage_to_job = {}
    with open(path) as fh:
        for line in fh:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                desc = (e.get("Properties") or {}).get(
                    "spark.job.description", "?")
                jobs[jid] = {"desc": desc, "t0": e["Submission Time"],
                             "t1": None}
                for sid in e.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["t1"] = e["Completion Time"]
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                ti = e.get("Task Info", {})
                stage_task_ms[sid] += (ti.get("Finish Time", 0)
                                       - ti.get("Launch Time", 0))
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stage_names[si["Stage ID"]] = si["Stage Name"].split("\n")[0]

    by_desc = defaultdict(lambda: [0.0, 0.0, 0])
    print(f"{'job':>4} {'wall_s':>8} {'task_s':>9}  description")
    for jid in sorted(jobs):
        j = jobs[jid]
        if j["t1"] is None:
            continue
        wall = (j["t1"] - j["t0"]) / 1000
        task = sum(v for s, v in stage_task_ms.items()
                   if stage_to_job.get(s) == jid) / 1000
        d = by_desc[j["desc"]]
        d[0] += wall
        d[1] += task
        d[2] += 1
        if wall >= 1.0:
            print(f"{jid:>4} {wall:>8.2f} {task:>9.1f}  {j['desc']}")
    print("\n-- by description --")
    print(f"{'wall_s':>8} {'task_s':>9} {'jobs':>5}  description")
    for desc, (w, t, n) in sorted(by_desc.items(), key=lambda kv: -kv[1][0]):
        print(f"{w:>8.2f} {t:>9.1f} {n:>5}  {desc}")

    print("\n-- heaviest stages (executor task seconds) --")
    for sid, ms in sorted(stage_task_ms.items(), key=lambda kv: -kv[1])[:15]:
        jid = stage_to_job.get(sid)
        desc = jobs.get(jid, {}).get("desc", "?")
        print(f"stage {sid:>4} {ms/1000:>9.1f}s  [{desc}] "
              f"{stage_names.get(sid, '?')[:80]}")


if __name__ == "__main__":
    main()
