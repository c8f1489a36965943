"""Deterministic corpus sampling and shard packing — the selection layer
a training-data pipeline runs between dedup/quality gating (export.py)
and tokenization.

Scale design (the 100 TB story):

* ``stratified_sample`` is a pure scan-stage filter: keep a row iff
  ``pmod(xxhash64(key || salt), 1e6) < rate(stratum) * 1e6``. No
  shuffle, no RNG state, no sampling pass — the decision is a pure
  function of the row, so it evaluates inside the scan's codegen stage
  (rows drop before any exchange), re-runs idempotently after
  failures, and composes with partition pruning.
  Changing the salt draws an independent sample; nudging a stratum's
  rate upward keeps every previously-sampled row (nested samples), the
  property curation loops rely on for incremental re-mixes.
* ``pack_shards`` assigns docs to fixed-token-budget shards by EXACT
  global running sum while moving the data exactly once: range-
  partition by the order key, per-partition subtotals to the driver
  (one row per partition — KB-scale), then a NARROW in-partition pass
  (local sort + Arrow iterator carrying the running offset) finishes
  the prefix sum. The range exchange is the only wide operator, and
  the output is physically contiguous by shard_id — already in
  training-shard layout; a 10^10-doc corpus packs with the same two
  jobs.

Reference: /root/reference is empty (SURVEY.md §0); the operators follow
standard web-corpus curation practice (hash-mod sampling, budgeted shard
packing) expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F, types as T

_RES = 1_000_000  # rate resolution: 1e-6


def stratified_sample(df: DataFrame, key: str | Column,
                      rates: dict[str, float], strata_col: str,
                      default_rate: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Deterministic per-stratum sample: a row survives iff the xxhash64
    of its key (salted) falls under its stratum's rate threshold.

    ``rates`` maps stratum value → keep-rate in [0, 1]; strata not listed
    get ``default_rate``. The keyed-hash rule means resampling with the
    same salt is idempotent and a rate increase strictly grows the kept
    set. ``key`` must identify the row (url / doc_id): duplicate keys
    rise or fall together by construction."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.pmod(F.xxhash64(F.concat(k.cast("string"), F.lit("|" + salt))),
               F.lit(_RES))
    thr = F.lit(int(default_rate * _RES))
    for v, r in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == v, F.lit(int(r * _RES))) \
               .otherwise(thr)
    return df.filter(h < thr)


def pack_shards(df: DataFrame, order_col: str, weight_col: str,
                budget: int, n_parts: int | None = None) -> DataFrame:
    """Assign each row a ``shard_id`` so consecutive rows (by
    ``order_col``, which must be unique; ``weight_col`` non-null) fill
    ~``budget`` units of weight per shard: ``shard_id =
    floor(prefix_sum_exclusive / budget)``.

    Exact global prefix sum with ONE movement of the data: range-
    partition on the order key (partition i holds keys below partition
    i+1), collect one subtotal per partition (KB-scale), then finish the
    prefix sum in a NARROW pass — sort within partitions + an Arrow
    iterator that carries the running offset across batches. No window
    at all: a ``Window.partitionBy(_pid)`` here would re-shuffle the
    full data on _pid (Catalyst cannot see that the range layout
    already clusters it), and an empty partitionBy would collapse to a
    single partition. The output is physically contiguous by shard_id
    (monotone in the order key), so it is already in training-shard
    layout. The assignment is a pure function of the global order —
    invariant to ``n_parts`` and to how the ranges were cut.

    The localCheckpoint below holds a full copy of ``df`` in executor
    storage (that is what pins the sampled range bounds across the two
    jobs) — for wide payloads pass the slim (order, weight) projection
    and join the returned shard_id back by the order key instead
    (lectura/export.py does exactly this for the text column)."""
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # pin the partitioning: the offsets collected below must describe
    # the SAME partitions the final narrow pass runs over
    d = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    subtotals = sorted(
        d.groupBy("_pid").agg(F.sum(weight_col).alias("t")).collect()
    )
    offs, run = {}, 0
    for r in subtotals:  # one row per non-empty partition
        offs[int(r._pid)] = run
        run += r.t

    out_fields = [f for f in d.schema.fields if f.name != "_pid"]
    schema = T.StructType(out_fields + [T.StructField("shard_id",
                                                      T.LongType())])
    out_cols = [f.name for f in schema.fields]

    def assign(batches):
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offs.get(int(pdf["_pid"].iloc[0]), 0)
            w = pdf[weight_col]
            excl = w.cumsum() - w + run
            pdf = pdf.assign(shard_id=(excl // budget).astype("int64"))
            run += w.sum()
            yield pdf[out_cols]

    return d.sortWithinPartitions(order_col).mapInPandas(assign, schema)


def prefix_rank(df: DataFrame, order: list[Column], rank_col: str = "rank",
                n_parts: int | None = None,
                limit: int | None = None) -> DataFrame:
    """Global ``row_number() over (order by *order)`` WITHOUT the
    single-task partition-less window (VERDICT r3 #2): the same
    range-partition prefix discipline as ``pack_shards``, specialized
    to weight ≡ 1.

    ``order`` is a list of sort expressions forming a TOTAL order
    (ties would make the rank nondeterministic — same contract as the
    window it replaces). Plan: one range exchange on the order key →
    per-partition row counts to the driver (one row per partition) →
    a NARROW pass (local sort + Arrow iterator carrying the running
    offset) assigns ``rank_col`` = global 1-based position. The rank
    is a pure function of the global order, invariant to ``n_parts``
    and to where the range bounds fall.

    ``limit``: rows ranked beyond it are dropped; partitions whose
    offset already exceeds it are pruned BEFORE the Arrow pass (their
    rows never cross to Python). The localCheckpoint pins the sampled
    range bounds across the count job and the output job — pass a slim
    projection and join wide payloads back by key if the row is heavy
    (the pack_shards note)."""
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        df.repartitionByRange(n_parts, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = sorted(
        d.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offs: dict[int, int] = {}
    run = 0
    for r in counts:  # one row per non-empty partition, pid-ascending
        offs[int(r._pid)] = run
        run += int(r.c)
    if limit is not None:
        keep = [pid for pid, off in offs.items() if off < limit]
        if not keep:
            d = d.filter(F.lit(False))
        else:
            d = d.filter(F.col("_pid") <= max(keep))

    out_fields = [f for f in d.schema.fields if f.name != "_pid"]
    schema = T.StructType(
        out_fields + [T.StructField(rank_col, T.LongType())])
    out_cols = [f.name for f in schema.fields]

    def assign(batches):
        import numpy as np

        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offs.get(int(pdf["_pid"].iloc[0]), 0)
            n = len(pdf)
            pdf = pdf.assign(
                **{rank_col: np.arange(run + 1, run + n + 1,
                                       dtype="int64")})
            run += n
            yield pdf[out_cols]

    ranked = d.sortWithinPartitions(*order).mapInPandas(assign, schema)
    if limit is not None:
        ranked = ranked.filter(F.col(rank_col) <= limit)
    return ranked


def dsir_logratios(corpus: DataFrame, target: DataFrame, n: int = 2,
                   n_buckets: int = 256, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """DSIR-style importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): score
    every corpus doc by the log-likelihood ratio of its hashed word
    n-gram stream under a smoothed target model vs the raw (corpus)
    model — log w(doc) = Σ_grams ln p_target(bucket) − ln p_raw(bucket),
    with add-one smoothing over `n_buckets` hash buckets. The actual
    resampling draw (Gumbel noise) is the caller's RNG; this operator
    is the deterministic scoring pass. Returns (id, n_grams, logratio)
    for every corpus doc with ≥ 1 gram.

    Determinism across engines/partitioning: per-bucket log-ratios are
    rounded to 9dp before the per-doc sum (identical summands on every
    engine), the final sum to 4dp (`+ 0.0` folds IEEE −0.0).

    Scale shape: both models are `n_buckets`-cardinality hash aggs
    (map-side combine collapses each task to ≤ n_buckets rows — the
    gram streams never shuffle raw); smoothing totals derive from the
    model tables via a one-task global window, never from re-derived
    gram-stream lineage; the weight table (≤ n_buckets rows) broadcasts
    into the corpus scan, so the only wide operator over corpus-sized
    data is the final per-doc sum on `id` — slim (id, double) rows.
    A 10^10-doc corpus scores with one shuffle and exactly two corpus
    scans (model pass + scoring pass)."""
    from lectura.textops import _gram_stream

    from pyspark.sql import Window

    occ_c = _gram_stream(corpus, n, id_col, text_col).select(
        "id", F.pmod(F.xxhash64("gram"), F.lit(n_buckets)).alias("b"))
    occ_t = _gram_stream(target, n, id_col, text_col).select(
        F.pmod(F.xxhash64("gram"), F.lit(n_buckets)).alias("b"))
    raw = occ_c.groupBy("b").agg(F.count("*").alias("cr"))
    tgt = occ_t.groupBy("b").agg(F.count("*").alias("ct"))
    # totals come from the <= n_buckets-row model tables themselves (a
    # global window over the full-outer join — one task over <= 2B tiny
    # rows), NOT from fresh aggregations: a separate .agg() re-derives
    # the whole gram-stream lineage, and the first cut of this operator
    # planned FOUR corpus scans because of it (plan-audited)
    win = Window.partitionBy()
    w = (
        raw.join(tgt, "b", "full")
        .select("b",
                F.coalesce("cr", F.lit(0)).alias("cr"),
                F.coalesce("ct", F.lit(0)).alias("ct"))
        .withColumn("tr", F.sum("cr").over(win))
        .withColumn("tt", F.sum("ct").over(win))
        .select(
            "b",
            F.round(
                F.log((F.col("ct") + F.lit(1.0))
                      / (F.col("tt") + F.lit(float(n_buckets))))
                - F.log((F.col("cr") + F.lit(1.0))
                        / (F.col("tr") + F.lit(float(n_buckets)))),
                9,
            ).alias("lw"),
        )
    )
    return (
        occ_c.join(F.broadcast(w), "b")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            (F.round(F.sum("lw"), 4) + F.lit(0.0)).alias("logratio"),
        )
        .select(F.col("id").alias(id_col), "n_grams", "logratio")
    )


def weighted_sample(df: DataFrame, key, weight_col: str, k: int,
                    salt: str = "", m_buckets: int = 1 << 20) -> DataFrame:
    """SEL4 — deterministic weighted sampling without replacement
    (Efraimidis & Spirakis 2006: select the top-k rows by
    u_i^(1/w_i), equivalently by ln(u_i)/w_i): the uniform u_i is a
    keyed hash, u = (pmod(xxhash64(key‖'|'‖salt), m) + 0.5) / m, so
    the draw has NO RNG state — same salt ⇒ idempotent resample,
    different salt ⇒ independent draw (the SEL1 properties carried to
    the weighted case, e.g. quality-weighted corpus selection). The
    rank key es = round(ln(u)/w, 9) orders DESC with the row key as
    tiebreak, so the selected set and ranks are engine- and
    partitioning-invariant — PROVIDED `key` uniquely identifies rows
    (the same contract stratified_sample states: duplicate keys share
    a sort tuple and the limit boundary between them is partition-
    dependent). Rows with NULL, NaN or non-positive weight are never
    selected (filtered — the standard convention; ln(u)/w flips sign
    at w<0, divides by zero at w=0, and NaN would sort above every
    real key under Spark's NaN ordering).

    Scale shape: the es key is a scan-stage expression (hash + ln);
    selection is orderBy+limit — TakeOrderedAndProject, a distributed
    partial top-k, never a full sort; the rank window sees k rows."""
    from pyspark.sql import Window

    kc = F.col(key) if isinstance(key, str) else key
    s = F.concat(kc.cast("string"), F.lit("|" + salt))
    u = (F.pmod(F.xxhash64(s), F.lit(m_buckets)).cast("double") + 0.5) \
        / float(m_buckets)
    es = F.round(F.log(u) / F.col(weight_col), 9)
    keyed = (
        df.filter(F.col(weight_col).isNotNull()
                  & ~F.isnan(F.col(weight_col).cast("double"))
                  & (F.col(weight_col) > 0))
        .withColumn("es", es)
    )
    topk = keyed.orderBy(F.desc("es"), kc.asc()).limit(k)
    w = Window.orderBy(F.desc("es"), kc.asc())
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))
