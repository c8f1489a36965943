"""Warehouse maintenance between crawl sessions — the Iceberg
maintenance-procedures equivalent (`rewrite_data_files`,
snapshot-metadata repoint) for the long-crawl file-count problem.

A crawl appends a few files per table per round; after 10^3 rounds every
read of `seen`/`fetch_log` plans thousands of splits and the driver's
per-file footer reads become serial round-loop latency. This CLI:

1. **prunes the frontier** — rows with `for_round <= last committed
   round` are spent (each round reads only its own `for_round`; the
   seen-set, not old frontier rows, provides dedup), so they are
   dropped in a rewrite. At the 10^10-URL design point this is the
   difference between a frontier table that grows forever and one
   bounded by the live horizon;
2. **max-merges `host_state`** — collapses the per-round delta chain
   the round loop appends (crawl.py reads it through a groupBy
   max-merge; after merging, that read is a plain scan);
3. **binpacks every other table** to ~target-sized files
   (`Warehouse.compact`; `pages` is skipped — it may be a zero-copy
   registered corpus whose files the warehouse does not own);
4. **re-points the last round marker** at the rewritten snapshots —
   `Crawler.run(resume=True)` restores the marker's snapshots before
   continuing, so without the repoint a resume would roll the
   maintenance back (harmlessly, but pointlessly). Data content is
   identical by construction; old snapshots stay on disk, so a marker
   from BEFORE the maintenance still restores correctly.

Safe to run only between crawl sessions (same single-writer assumption
as the round loop itself).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lectura.checkpoint import RoundLog
from lectura.tables import Warehouse

SKIP = {"pages"}  # possibly zero-copy registered; never rewritten


def list_tables(wh: Warehouse) -> list[str]:
    return sorted(
        d for d in os.listdir(wh.root)
        if os.path.exists(os.path.join(wh.root, d, "HEAD"))
    )


def maintain(wh: Warehouse, *, target_file_bytes: int = 128 << 20,
             prune_frontier: bool = True,
             expire_keep: int | None = None) -> dict:
    """Run all maintenance passes; returns per-table actions taken.

    ``expire_keep``: when set, finish with
    ``Warehouse.expire_snapshots(keep_last=expire_keep)`` per table,
    anchored at the (re-pointed) last round marker's snapshot
    (``keep_from``) so a checkpoint resume stays restorable — history
    OLDER than the marker is dropped and its data files reclaimed.
    Default None keeps every snapshot (the pre-expiry behavior: markers
    from before the maintenance still restore)."""
    log = RoundLog(wh.root)
    last = log.last_committed()
    actions: dict[str, str] = {}

    # A crashed round may have left committed table snapshots with no
    # round marker (the state resume normally discards). Roll back to
    # the last committed marker FIRST — otherwise the rewrites below
    # would bake the dangling writes into the compacted tables and the
    # marker repoint would bless them as round-`last` state.
    if last is not None:
        log.restore(wh, last)
        actions["_restore"] = f"rolled back to round-{last} snapshots"

    if prune_frontier and last is not None and wh.exists("frontier"):
        n_before = wh.approx_rows("frontier")
        live = wh.read("frontier").filter(F.col("for_round") > last)
        wh.overwrite("frontier", live)
        actions["frontier"] = (
            f"pruned rounds <= {last} ({n_before} -> "
            f"{wh.approx_rows('frontier')} rows)"
        )

    if wh.exists("host_state"):
        merged = (
            wh.read("host_state")
            .groupBy("host")
            .agg(F.max("last_round").alias("last_round"))
        )
        wh.overwrite("host_state", merged)
        actions["host_state"] = "delta chain max-merged"

    for name in list_tables(wh):
        if name in SKIP:
            continue
        snap = wh.compact(name, target_file_bytes=target_file_bytes)
        if snap is not None:
            actions[name] = (actions.get(name, "") +
                             f" + binpacked (snap {snap})").lstrip(" +")

    if last is not None:
        snaps = log.snapshots(last)
        for name in snaps:
            if name in actions and wh.exists(name):
                snaps[name] = wh.snapshot(name)
        log.commit(last, snaps, log.stats(last))
        actions["_round_log"] = f"round-{last} marker re-pointed"

    if expire_keep is not None:
        marker = log.snapshots(last) if last is not None else {}
        for name in list_tables(wh):
            if name in SKIP:
                continue
            stats = wh.expire_snapshots(
                name, keep_last=expire_keep,
                keep_from=marker.get(name))
            if stats["expired"] or stats["files_deleted"]:
                actions[name] = (
                    actions.get(name, "")
                    + f" + expired {len(stats['expired'])} snapshots "
                    f"({stats['files_deleted']} files, "
                    f"{stats['bytes_freed']} B)").lstrip(" +")
    return actions


def main(argv: list[str] | None = None) -> int:
    import argparse
    import json

    from lectura.session import get_spark

    ap = argparse.ArgumentParser(
        description="Compact/prune a crawl warehouse between sessions.")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--target-file-mb", type=int, default=128)
    ap.add_argument("--no-prune-frontier", action="store_true")
    ap.add_argument("--expire-keep", type=int, default=None,
                    help="keep only the last N snapshots per table "
                         "(plus the round marker's) and reclaim the "
                         "rest's data files; default keeps all history")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark(master=args.master, app_name="lectura-maintain")
    wh = Warehouse(args.warehouse, spark)
    actions = maintain(
        wh, target_file_bytes=args.target_file_mb << 20,
        prune_frontier=not args.no_prune_frontier,
        expire_keep=args.expire_keep,
    )
    print(json.dumps(actions))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
