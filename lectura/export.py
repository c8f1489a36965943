"""Training-corpus materialization from the crawl warehouse — the bridge
between the crawl half (fetch → extract → enrich) and the training-data
half (quality gates → dedup) of the pipeline.

The fused extraction pass (X4, lectura/extract.py) already computed every
signal this step needs — token/quality/language stats, the rolling
64-bit fingerprint, the simhash — so export is pure JVM work over stored
columns: no text re-tokenization, no Python, no second scan of the page
bodies. At 100 TB that is the difference between an export that reads a
slim stats projection and one that re-processes the whole corpus.

Plan shape (all shuffles keyed and bounded):
  1. quality/language gates — scan-stage filters (predicate pushdown);
  2. exact dedup — one partial-aggregating groupBy on `fingerprint`
     over the SLIM (url, fingerprint, simhash) projection (min(url)
     keeps the lexicographically-smallest url, count(*) records copies
     for lineage; duplicates collapse map-side — no window, so the
     hottest duplicate never sorts inside one task);
  3. near-dup clustering — simhash 4×16-bit pigeonhole banding
     (equi-join, lossless for hamming ≤ 3, hot buckets df-capped) →
     connected components (large-star/small-star, O(log n) rounds) →
     one partial-aggregating groupBy per component keeps the canonical
     doc and records the cluster size (same skew-proof shape as 2);
  4. winner join — the only stage that touches `text`: one hash join by
     url fans the kept-url set against the gated scan and feeds the
     url-partitioned shard write.

Node ids for the component step are xxhash64(url): at the 10^10-doc
design point the expected number of colliding pairs is ~0.003·(n/10^9)²,
and a collision can only merge two clusters (over-dedup by one doc),
never corrupt the table — an acceptable trade for never shuffling url
strings through the graph iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lectura.graphops import connected_components
from lectura.tables import Warehouse
from lectura.textops import simhash_band_pairs, simhash_chunks

EXPORT_COLS = ("url", "text", "n_tokens", "quality", "lang_guess",
               "fingerprint", "simhash")


def export_corpus(wh: Warehouse, *, min_tokens: int = 20,
                  min_quality: float = 0.0,
                  langs: tuple[str, ...] | None = ("en",),
                  max_hamming: int = 3,
                  band_max_df: int | None = 256,
                  bench: DataFrame | None = None,
                  contam_n: int = 8,
                  sample_rates: dict[str, float] | None = None,
                  sample_default_rate: float = 0.0,
                  sample_salt: str = "",
                  shard_tokens: int | None = None,
                  chunk: tuple[int, int] | None = None,
                  out_table: str = "train_docs",
                  n_parts: int = 32) -> dict:
    """Materialize the crawl's extracted text as train-ready shards.

    Returns {"table", "n_docs", "n_hot_buckets_dropped"}; the written
    table carries per-doc lineage (`n_exact_copies`, `cluster_size`) so
    downstream sampling can up/down-weight by duplication. `max_hamming`
    ≤ 3 keeps the banding join lossless (pigeonhole over 4 chunks); raise
    it only accepting recall-heuristic semantics.

    Both dedup stages run over a SLIM projection (url, fingerprint,
    simhash ≈ 40 B/doc): the text column never enters a window or the CC
    iterations, and is shuffled exactly once — by the final winner join
    that also provides the output's hash-partitioning by url. At 10^10
    docs the slim winner table is ~400 GB spread across the cluster while
    the text bytes stay in scan→join→write.

    `band_max_df` (simhash_band_pairs) caps the per-bucket document
    frequency so boilerplate-saturated signatures can't turn the banding
    self-join quadratic; dropped buckets are counted and reported, never
    silent. None disables the cap (exact banding semantics).

    Optional selection stages, run after dedup in pipeline order:
    `bench` (a (url, text) DataFrame of eval/benchmark docs) drops every
    doc sharing a distinct word `contam_n`-gram with it — the benchmark
    side is broadcast, the corpus side never shuffles for the check;
    `sample_rates` applies the deterministic per-`lang_guess` hash
    sample (lectura/sampling.py — scan-stage filter, nested/idempotent);
    `shard_tokens` assigns token-budget `shard_id`s via the exact global
    prefix sum computed on the slim (url, n_tokens) projection — the
    text column stays out of pack_shards' pinned checkpoint — and the
    write hash-clusters by shard_id (every shard wholly in one
    partition; one text shuffle, same as the url layout);
    `chunk=(window, stride)` re-cuts each surviving doc into
    training-context windows (textops.chunk_documents — zero-shuffle
    scan-stage explode, doc metadata inherited per chunk, no join
    back) BEFORE shard packing, which then packs on the unique
    (url, chunk_id) key."""
    import os as _os
    import sys as _sys
    import time as _time
    _trace = bool(_os.environ.get("LECTURA_TRACE"))
    _t0 = _time.time()

    def _mark(label: str) -> None:
        nonlocal _t0
        if _trace:
            now = _time.time()
            print(f"EXPORT_TRACE {label}={now - _t0:.2f}s",
                  file=_sys.stderr, flush=True)
            _t0 = now

    docs = wh.read("text").select(*EXPORT_COLS)
    gated = docs.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("quality") >= min_quality)
    )
    if langs is not None:
        gated = gated.filter(F.col("lang_guess").isin(list(langs)))

    # Exact dedup as a partial-aggregating groupBy, NOT a window: a
    # window over partitionBy(fingerprint) must sort every copy of the
    # hottest duplicate (parked-domain boilerplate — exactly what a web
    # corpus over-represents) inside one task, while min/min_by/count
    # collapse duplicates map-side before the exchange.  Same shuffle
    # key, same output, skew-proof.
    slim = gated.select("url", "fingerprint", "simhash")
    winners = (
        slim.groupBy("fingerprint")
        .agg(
            F.min("url").alias("url"),
            # exact copies share the text, hence the simhash — min() is
            # just a deterministic pick and keeps the agg all-primitive
            # (HashAggregate, not the min_by struct-buffer SortAggregate)
            F.min("simhash").alias("simhash"),
            F.count("*").alias("n_exact_copies"),
        )
        .withColumn("_nid", F.xxhash64("url"))
        .persist()
    )

    sig = winners.select(F.col("_nid").alias("id"),
                         F.col("simhash").alias("sh"))
    # hot-bucket table computed ONCE (persisted — it is both the reported
    # n_hot stat and band_pairs' exclusion list; without the handoff the
    # chunk stream would aggregate twice)
    n_hot, hot = 0, None
    if band_max_df is not None:
        hot = (
            simhash_chunks(sig).groupBy("chunk", "val").count()
            .filter(F.col("count") > band_max_df).select("chunk", "val")
            .persist()
        )
        n_hot = hot.count()
    _mark("winners_hotcount")
    # dedupe=False: connected_components' canonical-edge distinct absorbs
    # multi-chunk agreements, so the pair stream skips its own
    # dropDuplicates shuffle. driver_max_edges: near-dup graphs are a
    # sliver of the corpus — under 2M edges union-find on the driver
    # replaces ~10 star-iteration jobs; past it (the 10^10-doc design
    # point) the distributed path runs unchanged.
    pairs = simhash_band_pairs(sig, max_hamming=max_hamming,
                               max_df=band_max_df, hot_buckets=hot,
                               dedupe=False)
    comp = connected_components(
        pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst")),
        driver_max_edges=2_000_000,
    ).localCheckpoint()
    if hot is not None:
        hot.unpersist()
    _mark("pairs_cc")
    labeled = (
        winners.join(F.broadcast(comp) if _small(comp) else comp,
                     winners["_nid"] == comp["node"], "left")
        .withColumn("_comp", F.coalesce(F.col("component"), F.col("_nid")))
        .drop("node", "component")
    )
    # Cluster-winner pick: same groupBy-not-window shape as the exact
    # dedup above — a giant near-dup cluster partial-aggregates instead
    # of sorting whole inside one task.
    keep = (
        labeled.groupBy("_comp")
        .agg(
            F.min("url").alias("url"),
            F.min_by("n_exact_copies", "url").alias("n_exact_copies"),
            F.count("*").alias("cluster_size"),
        )
        .select("url", "n_exact_copies", "cluster_size")
    )
    _mark("comp_join_gate")
    out = gated.join(keep, "url").select(
        *EXPORT_COLS, "n_exact_copies", "cluster_size"
    )
    cleanup: list[DataFrame] = []

    n_contaminated = 0
    if bench is not None:
        from lectura.textops import contamination_stats

        hits = (
            contamination_stats(out, bench, n=contam_n, id_col="url",
                                text_col="text")
            .select("url")
            .persist()
        )
        # broadcast bound is tighter than _small()'s: that one gates a
        # two-long-column table (~16 B/row); these are variable-width
        # url strings (~100 B/row), so 1M rows ≈ 100 MB build side.
        n_contaminated = hits.count()
        out = out.join(
            F.broadcast(hits) if n_contaminated <= 1_000_000 else hits,
            "url", "left_anti",
        )
        cleanup.append(hits)
    if sample_rates is not None:
        from lectura.sampling import stratified_sample

        out = stratified_sample(out, "url", sample_rates, "lang_guess",
                                default_rate=sample_default_rate,
                                salt=sample_salt)
    if chunk is not None:
        from lectura.textops import chunk_documents

        window, stride = chunk
        meta = tuple(c for c in out.columns
                     if c not in ("url", "text", "n_tokens"))
        out = (
            chunk_documents(out, window=window, stride=stride,
                            id_col="url", text_col="text",
                            keep_cols=meta)
            .withColumnRenamed("chunk", "text")
            # downstream (packing, writes) needs one unique key per
            # row; '#' is safe as separator — U1 canonicalization
            # strips fragments, so no canonical url contains it
            .withColumn("url", F.concat_ws("#", "url",
                                           F.col("chunk_id").cast("string")))
        )
    if shard_tokens:
        from lectura.sampling import pack_shards

        # Pack on the SLIM (url, n_tokens) projection: pack_shards
        # localCheckpoints its input to pin the range partitioning, and
        # checkpointing the full text column would hold a second,
        # non-recomputable copy of the corpus in executor storage (an
        # executor loss then kills the export instead of retrying).
        # The assignment joins back by url and the write hash-clusters
        # by shard_id — every shard's rows land in one partition, the
        # same one-text-shuffle cost as the else-branch's url layout.
        assignment = pack_shards(
            out.select("url", "n_tokens"), "url", "n_tokens",
            budget=shard_tokens, n_parts=n_parts,
        ).select("url", "shard_id")
        snap = wh.overwrite(
            out_table,
            out.join(assignment, "url")
            .repartition(n_parts, "shard_id"),
        )
    else:
        snap = wh.overwrite(out_table, out.repartition(n_parts, "url"))
    _mark("winner_join_write")
    winners.unpersist()
    for df_ in cleanup:
        df_.unpersist()
    n_docs = wh.count_rows(wh._files(out_table))
    _mark("post_stats")
    stats = {"table": out_table, "snapshot": snap, "n_docs": int(n_docs),
             "n_hot_buckets_dropped": n_hot}
    if bench is not None:
        stats["n_contaminated_dropped"] = int(n_contaminated)
    if chunk is not None:
        # n_docs must keep meaning DOCUMENTS whether or not --chunk ran
        # (consumers compare the stats line across runs): rows written
        # move to n_chunks, and the doc count derives from the written
        # composite keys (slim one-column scan — never a pre-write
        # count() re-running the whole gating+dedup lineage)
        stats["chunk"] = list(chunk)
        stats["n_chunks"] = stats["n_docs"]
        stats["n_docs"] = int(
            wh.read(out_table)
            .select(F.substring_index("url", "#", 1).alias("u"))
            .distinct().count())
    if shard_tokens:
        n_shards = wh.read(out_table).agg(
            (F.max("shard_id") + 1).alias("n")).head()["n"]
        stats["n_shards"] = int(n_shards or 0)
    return stats


def _small(df: DataFrame, bound: int = 5_000_000) -> bool:
    """Near-dup components cover only docs that HAVE a near-dup — tiny
    relative to the corpus in practice, but unbounded in principle, so
    the broadcast is gated the same way as the crawl's round joins
    (plan stats can't see through the iterative CC, hence the explicit
    count over the checkpointed component table)."""
    return df.count() <= bound


def main(argv: list[str] | None = None) -> int:
    import argparse
    import json

    from lectura.session import get_spark

    ap = argparse.ArgumentParser(
        description="Materialize train-ready corpus shards from a crawl "
                    "warehouse's text table.")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--out-table", default="train_docs")
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--langs", default="en",
                    help="comma-separated allowlist; 'any' disables")
    ap.add_argument("--max-hamming", type=int, default=3)
    ap.add_argument("--band-max-df", type=int, default=256,
                    help="hot-bucket cap for the simhash banding join; "
                         "0 disables")
    ap.add_argument("--decontaminate", default=None,
                    help="warehouse table or parquet path of benchmark "
                         "docs (url, text); drops overlapping train docs")
    ap.add_argument("--contam-ngram", type=int, default=8)
    ap.add_argument("--sample", default=None,
                    help="per-lang keep rates 'en=0.5,de=0.2[,*=0.05]' "
                         "(deterministic hash sample; '*' = default rate)")
    ap.add_argument("--sample-salt", default="")
    ap.add_argument("--shard-tokens", type=int, default=None,
                    help="pack docs into shards of ~this many tokens")
    def _chunk_arg(v: str) -> tuple[int, int]:
        parts = v.split(":")
        if len(parts) != 2 or not all(p.isdigit() for p in parts):
            raise argparse.ArgumentTypeError(
                f"--chunk wants 'WINDOW:STRIDE' (e.g. 512:384), got {v!r}")
        w, s = int(parts[0]), int(parts[1])
        if not 0 < s <= w:
            raise argparse.ArgumentTypeError(
                f"--chunk needs 0 < STRIDE <= WINDOW, got {v!r}")
        return w, s

    ap.add_argument("--chunk", default=None, type=_chunk_arg,
                    help="re-cut surviving docs into training windows "
                         "'WINDOW:STRIDE' (e.g. 512:384) before packing")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark(master=args.master, app_name="lectura-export")
    wh = Warehouse(args.warehouse, spark)
    langs = None if args.langs == "any" else tuple(args.langs.split(","))
    bench = None
    if args.decontaminate:
        bench = (wh.read(args.decontaminate)
                 if wh.exists(args.decontaminate)
                 else spark.read.parquet(args.decontaminate))
    sample_rates, sample_default = None, 0.0
    if args.sample:
        sample_rates = {}
        for part in args.sample.split(","):
            k, v = part.split("=")
            if k == "*":
                sample_default = float(v)
            else:
                sample_rates[k] = float(v)
    stats = export_corpus(
        wh, min_tokens=args.min_tokens, min_quality=args.min_quality,
        langs=langs, max_hamming=args.max_hamming, out_table=args.out_table,
        band_max_df=args.band_max_df or None,
        bench=bench, contam_n=args.contam_ngram,
        sample_rates=sample_rates, sample_default_rate=sample_default,
        sample_salt=args.sample_salt, shard_tokens=args.shard_tokens,
        chunk=args.chunk,
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
