"""Scale evidence for the text-operator family (SURVEY §2.8c–e): run
the search / normalized-dedup / sketch operators over 10^6 synthetic
documents (~10^8 tokens — 200× the sf0.1 documents table) and report
per-operator wall + docs/s as ONE JSON line.

Deterministic corpus: doc i's words are a pure function of xxhash64-
style mixing of (i, position) over a 512-word vocabulary; every 1000th
doc carries a planted exact phrase and every 977th a normalization-
variant duplicate of doc i-1, so each operator's output has a known
signal to sanity-assert against (counts printed, asserted > 0 — the
correctness oracles live in the contract; this script measures
throughput at scale).

Usage: python scripts/bench_textops.py [--n 1000000] [--words 100]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--words", type=int, default=100)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lectura.session import get_spark

    spark = get_spark(master=args.master, shuffle_partitions=64,
                      extra={"spark.ui.showConsoleProgress": "false"})

    # letter-only vocabulary: ccnet_normalize folds every digit to '0',
    # so digit-bearing words would all collapse to one normalized form
    # and the dedup leg would measure a single giant group
    import string

    letters = string.ascii_lowercase
    vocab = [letters[i // 676] + letters[(i // 26) % 26] + letters[i % 26]
             for i in range(512)]
    varr = F.array(*[F.lit(w) for w in vocab])
    ids = spark.range(0, args.n, numPartitions=64)
    words = F.transform(
        F.sequence(F.lit(0), F.lit(args.words - 1)),
        lambda p: F.element_at(
            varr, (F.pmod(F.xxhash64(F.col("id"), p), 512) + 1)
            .cast("int")),
    )
    text = F.concat_ws(" ", words)
    text = F.when(F.col("id") % 1000 == 0,
                  F.concat(text, F.lit(" planted phrase marker"))
                  ).otherwise(text)
    # normalization-variant dup of the PREVIOUS doc: same words, upper
    # + punctuation noise (id-1's words recomputed, pure function)
    prev_words = F.transform(
        F.sequence(F.lit(0), F.lit(args.words - 1)),
        lambda p: F.element_at(
            varr, (F.pmod(F.xxhash64(F.col("id") - 1, p), 512) + 1)
            .cast("int")),
    )
    text = F.when(F.col("id") % 977 == 3,
                  F.concat(F.upper(F.concat_ws(" ", prev_words)),
                           F.lit(" !!!"))).otherwise(text)

    scratch = os.environ.get("LECTURA_SCRATCH", "/dev/shm")
    path = os.path.join(scratch, f"lectura_textops_bench_{args.n}")
    t0 = time.time()
    (ids.select(F.col("id").alias("doc_id"), text.alias("text"))
     .write.mode("overwrite").parquet(path))
    gen_sec = round(time.time() - t0, 1)
    docs = spark.read.parquet(path)

    from lectura.textops import (bm25_search, cms_heavy_hitters,
                                 hll_estimate, mix_report,
                                 normalized_dedup_groups, phrase_search)

    out: dict = {"n_docs": args.n, "words_per_doc": args.words,
                 "gen_sec": gen_sec, "ops": {}}

    def timed(name, fn, sanity):
        t1 = time.time()
        res = fn()
        wall = round(time.time() - t1, 2)
        out["ops"][name] = {"sec": wall,
                            "docs_per_sec": round(args.n / wall, 0),
                            "signal": res}
        assert sanity(res), (name, res)

    timed("bm25_topk",
          lambda: bm25_search(docs, [vocab[1], vocab[100], vocab[300]], k=20)
          .count(), lambda r: r == 20)
    # the norm-variant branch overwrites a planted-phrase doc wherever
    # id ≡ 0 (mod 1000) ∧ id ≡ 3 (mod 977) — count the survivors
    n_phrase = sum(1 for i in range(0, args.n, 1000) if i % 977 != 3)
    timed("phrase_search",
          lambda: phrase_search(docs, ["planted", "phrase", "marker"])
          .count(), lambda r: r == n_phrase)
    timed("norm_dedup",
          lambda: normalized_dedup_groups(docs).count(),
          lambda r: r >= args.n // 977 - 1)
    timed("cms_heavy_hitters",
          lambda: cms_heavy_hitters(docs, [vocab[1], vocab[255], "zz"], k=3,
                                    d=4, w=4096).count(),
          lambda r: r == 3)
    timed("hll_terms",
          lambda: int(hll_estimate(
              docs.select(F.explode(F.split(F.lower("text"), " "))
                          .alias("t")), "t", p=6)
              .collect()[0].v_used), lambda r: r > 0)
    timed("mix_report",
          lambda: mix_report(docs.withColumn(
              "source", (F.col("doc_id") % 20).cast("string")),
              group_col="source").count(), lambda r: r == 20)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
