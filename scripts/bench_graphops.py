"""Scale evidence for the graph-operator family (SURVEY §2.8b): run
connected components / PageRank / triangles / HITS / label propagation
/ redirect resolution over a deterministic 10^6-node web-style graph
(~4M edges: per-group path chains + planted triangles + hash-random
cross links with hub skew) and report per-operator wall + edges/s as
ONE JSON line.

Planted structure (pure functions of node id — no RNG state):
- nodes partition into groups of 100; i→i+1 path edges inside each
  group ⇒ exactly n/100 components of diameter 99 on the structured
  edge set (the O(log n) star-contraction stress case);
- every 50th node closes a triangle with its two path successors ⇒ an
  exactly countable planted triangle set;
- the structured edges double as redirect chains (next = i−1 inside
  the group) ⇒ every chain resolves to its group base within the cap;
- 3 hash-random out-edges per node plus 10^4 extra in-edges per
  100000th node (hub skew) form the full graph for the centralities.

Correctness oracles live in the contract + pytest; this script
measures throughput at scale and sanity-asserts the planted signals.

Usage: python scripts/bench_graphops.py [--n 1000000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GROUP = 100
TRI_EVERY = 50
HUB_EVERY = 100_000
HUB_DEG = 10_000
RAND_OUT = 3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()
    n = args.n

    from pyspark.sql import functions as F

    from lectura.session import get_spark

    spark = get_spark(master=args.master, shuffle_partitions=64,
                      extra={"spark.ui.showConsoleProgress": "false"})

    scratch = os.environ.get("LECTURA_SCRATCH", "/dev/shm")
    path = os.path.join(scratch, f"lectura_graph_bench_{n}")
    ids = spark.range(0, n, numPartitions=64)
    i = F.col("id")

    t0 = time.time()
    # structured edges: path inside each group + planted triangles
    in_group = i % GROUP < GROUP - 1
    path_e = ids.filter(in_group).select(i.alias("src"),
                                         (i + 1).alias("dst"))
    tri_base = ids.filter((i % TRI_EVERY == 0) & (i % GROUP <= GROUP - 3))
    tri_e = tri_base.select(i.alias("src"), (i + 2).alias("dst"))
    structured = path_e.unionByName(tri_e)
    structured.write.mode("overwrite").parquet(path + "_structured")

    # full graph: + 3 hash-random out-edges per node + hub in-edges
    rand_e = (
        ids.select(
            i.alias("src"),
            F.explode(F.array(*[
                F.pmod(F.xxhash64(i, F.lit(j)), F.lit(n)).alias("d")
                for j in range(RAND_OUT)])).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    hub_e = (
        spark.range(0, (n // HUB_EVERY) * HUB_DEG, numPartitions=32)
        .select(
            F.pmod(F.xxhash64("id", F.lit("hub-src")), F.lit(n))
             .alias("src"),
            ((F.col("id") / HUB_DEG).cast("long") * HUB_EVERY)
             .alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    full = structured.unionByName(rand_e).unionByName(hub_e)
    full.write.mode("overwrite").parquet(path + "_full")
    gen_sec = round(time.time() - t0, 1)

    structured = spark.read.parquet(path + "_structured")
    full = spark.read.parquet(path + "_full")
    n_struct = structured.count()
    n_full = full.count()

    from lectura.graphops import (connected_components, hits,
                                  label_propagation, pagerank,
                                  resolve_chains, triangle_counts)

    out: dict = {"n_nodes": n, "n_edges_structured": n_struct,
                 "n_edges_full": n_full, "gen_sec": gen_sec, "ops": {}}

    def timed(name, fn, sanity, edges):
        t1 = time.time()
        res = fn()
        wall = round(time.time() - t1, 2)
        out["ops"][name] = {"sec": wall,
                            "edges_per_sec": round(edges / wall, 0),
                            "signal": res}
        assert sanity(res), (name, res)

    n_groups = (n + GROUP - 1) // GROUP
    timed("connected_components",
          lambda: connected_components(structured)
          .agg(F.countDistinct("component")).collect()[0][0],
          lambda r: r == n_groups, n_struct)
    # planted triangles: one per tri_base node, disjoint (spacing 50>2)
    n_tri = tri_base.count()
    timed("triangle_counts",
          lambda: triangle_counts(structured)
          .agg(F.sum("n_tri")).collect()[0][0],
          lambda r: r == 3 * n_tri, n_struct)
    timed("pagerank_8it",
          lambda: float(pagerank(full, iters=8)
                        .agg(F.sum("rank")).collect()[0][0]),
          lambda r: abs(r - 1.0) < 1e-6, n_full)
    timed("hits_8it",
          lambda: float(hits(full, iters=8)
                        .agg(F.sum("hub") + F.sum("auth"))
                        .collect()[0][0]),
          lambda r: abs(r - 2.0) < 1e-6, n_full)
    timed("label_propagation_4it",
          lambda: label_propagation(structured, iters=4).count(),
          lambda r: r == n if n % GROUP == 0 else r > 0, n_struct)
    # redirect chains: next = i-1 inside the group; every chain ends at
    # its group base (i % GROUP == 0) within the 128-hop cap
    rev = structured.filter(F.col("dst") == F.col("src") + 1).select(
        F.col("dst").alias("src"), F.col("src").alias("dst"))
    timed("resolve_chains_128",
          lambda: resolve_chains(rev, max_hops=128)
          .filter(F.col("resolved") & (F.col("final") % GROUP == 0))
          .count(),
          lambda r: r == rev.count(), n_struct)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
