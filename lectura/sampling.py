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
