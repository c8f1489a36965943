"""Scale demonstration for semantic_dedup (Q4): 10^6 synthetic 64-dim
vectors + 10^5 planted near-duplicates, measured end-to-end at
local[32].

Shows the documented band-geometry dial in the scale direction: at n =
10^6 the contract fixture's 8 bands x 8 bits would put ~n/256 rows in
every bucket (~10^10 candidate pairs); 4 bands x 16 bits spreads the
same 64 sign bits over 65 536 buckets per band (~15 rows each), keeping
candidates at ~n * avg_bucket * bands while planted near-dups (3 of 64
dims zeroed, cosine ~0.97-0.99) are guaranteed to collide when no
bucket cap is set: zeroing 3 dims flips at most 3 sign bits, and 3
flips cannot touch all 4 bands (the simhash pigeonhole). With
max_bucket set, a saturated guaranteed-collision bucket could be
dropped — at this data's ~15-member buckets vs cap 200 that never
happens, so measured recall 1.0 doubles as a correctness check. Reported: index+cluster wall, candidate-pair volume,
cluster count, and planted-pair recall (fraction of the 10^5 planted
(base, dup) pairs that end in the same cluster).

Vectors are deterministic (hash-based, no RNG): dim j of row i =
(pmod(xxhash64(i * 64 + j), 2001) - 1000) / 1000.

Usage: python scripts/bench_semantic.py [--n 1000000] [--dup-mod 10]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dup-mod", type=int, default=10)
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--n-bands", type=int, default=4)
    ap.add_argument("--band-bits", type=int, default=16)
    ap.add_argument("--min-cosine", type=float, default=0.9)
    ap.add_argument("--max-bucket", type=int, default=200)
    args = ap.parse_args()

    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS",
        '--driver-memory 16g --driver-java-options '
        '"-XX:+ExplicitGCInvokesConcurrent -XX:+ParallelRefProcEnabled" '
        "pyspark-shell",
    )
    from pyspark.sql import functions as F

    from lectura.session import get_spark
    from lectura.vectorops import semantic_candidates, semantic_dedup

    scratch = tempfile.mkdtemp(
        prefix="lectura_semb_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    spark = get_spark(master=args.master, app_name="bench-semantic",
                      extra={"spark.local.dir": scratch,
                             "spark.ui.showConsoleProgress": "false"})

    n, dup_mod = args.n, args.dup_mod
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: ((F.pmod(F.xxhash64(F.col("id") * 64 + j), 2001)
                        - 1000) / 1000.0).cast("float"),
        ).alias("embedding"),
    )
    # rotate over the dup INDEX (vec_id // dup_mod), stride 13: slice
    # starts 0/13/26/39/52 touch every 16-dim band of the 4x16 layout
    # (a *3 stride kept all five slices inside band 0, so bands 1-3
    # were never the perturbed one)
    lo = ((F.col("vec_id") / dup_mod).cast("long") % 5) * 13
    dups = base.filter(F.col("vec_id") % dup_mod == 0).select(
        (F.col("vec_id") + n).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when((i >= lo) & (i < lo + 3),
                                F.lit(0.0).cast("float")).otherwise(x),
        ).alias("embedding"),
    )
    path = os.path.join(scratch, "emb")
    base.unionByName(dups).write.mode("overwrite").parquet(path)
    fx = spark.read.parquet(path)
    n_total = fx.count()  # materialized before any timed region

    t0 = time.time()
    n_cand = semantic_candidates(
        fx, n_bands=args.n_bands, band_bits=args.band_bits,
        max_bucket=args.max_bucket).count()
    cand_sec = round(time.time() - t0, 2)

    t0 = time.time()
    out = semantic_dedup(
        fx, min_cosine=args.min_cosine, n_bands=args.n_bands,
        band_bits=args.band_bits, max_bucket=args.max_bucket)
    out.write.mode("overwrite").parquet(os.path.join(scratch, "clusters"))
    dedup_sec = round(time.time() - t0, 2)

    res = spark.read.parquet(os.path.join(scratch, "clusters"))
    n_clustered = res.count()
    n_clusters = res.select("keeper_id").distinct().count()
    # planted-pair recall: base i and dup i+n share a keeper
    k_base = res.select(F.col("vec_id").alias("b"),
                        F.col("keeper_id").alias("kb")).filter(F.col("b") < n)
    k_dup = res.select((F.col("vec_id") - n).alias("b"),
                       F.col("keeper_id").alias("kd")).filter(F.col("b") >= 0)
    n_planted = (n + dup_mod - 1) // dup_mod  # multiples of dup_mod in [0, n)
    n_recovered = (
        k_base.join(k_dup, "b").filter(F.col("kb") == F.col("kd")).count()
    )
    print(json.dumps({
        "n_vectors": n_total, "n_planted_pairs": n_planted,
        "n_bands": args.n_bands, "band_bits": args.band_bits,
        "max_bucket": args.max_bucket, "min_cosine": args.min_cosine,
        "candidate_pairs": n_cand, "candidates_sec": cand_sec,
        "dedup_wall_sec": dedup_sec,
        "vectors_per_sec": round(n_total / dedup_sec, 1),
        "n_clustered_rows": n_clustered, "n_clusters": n_clusters,
        "planted_recall": round(n_recovered / n_planted, 4),
    }))
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
