"""Round checkpointing: atomic multi-table commit + resume (SURVEY.md S9,
ST8; B:14 "resumable from any checkpoint with per-partition lineage").

A round's writes go to several warehouse tables; the round only *exists*
once its `round-<r>.json` marker (recording every table's snapshot id) is
atomically renamed into place. Resume = read the last marker, roll every
table's HEAD back to the recorded snapshot (discarding any dangling writes
from a crashed round), continue at r+1 — the kill/resume pytest proves the
final state is byte-identical to an uninterrupted run.
"""

from __future__ import annotations

import json
import os
import uuid

from lectura.tables import Warehouse


class RoundLog:
    def __init__(self, root: str):
        self.dir = os.path.join(root, "_round_log")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, rnd: int) -> str:
        return os.path.join(self.dir, f"round-{rnd:06d}.json")

    def commit(self, rnd: int, snapshots: dict[str, int | None],
               stats: dict | None = None) -> None:
        tmp = os.path.join(self.dir, f".round-{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump({"round": rnd, "snapshots": snapshots,
                       "stats": stats or {}}, f)
        os.replace(tmp, self._path(rnd))

    def last_committed(self) -> int | None:
        rounds = [
            int(f[6:12])
            for f in os.listdir(self.dir)
            if f.startswith("round-") and f.endswith(".json")
        ]
        return max(rounds) if rounds else None

    def snapshots(self, rnd: int) -> dict[str, int | None]:
        with open(self._path(rnd)) as f:
            return json.load(f)["snapshots"]

    def stats(self, rnd: int) -> dict:
        with open(self._path(rnd)) as f:
            return json.load(f).get("stats", {})

    def restore(self, wh: Warehouse, rnd: int) -> None:
        """Roll every table back to the state committed at round `rnd`.

        A marker snapshot of None means the table did NOT exist at the
        committed round (e.g. text/scheduled/fetch_log after a crash
        during round 1 of a fresh warehouse): if such a table exists
        now, every row in it is a dangling write from the crashed
        round — drop it, or the re-run of that round would duplicate
        its rows (and maintenance would bake them into a compaction)."""
        for name, snap in self.snapshots(rnd).items():
            if snap is not None:
                if wh.exists(name):
                    wh.rollback(name, snap)
            elif wh.exists(name):
                wh.drop(name)
