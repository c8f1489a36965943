"""Deterministic corpus sampling and shard packing — the selection layer
a training-data pipeline runs between dedup/quality gating (export.py)
and tokenization.

Scale design (the 100 TB story):

* ``stratified_sample`` is a pure scan-stage filter: keep a row iff
  ``pmod(xxhash64(key || salt), 1e6) < rate(stratum) * 1e6``. No
  shuffle, no RNG state, no sampling pass — the decision is a pure
  function of the row, so it pushes into the parquet scan, re-runs
  idempotently after failures, and composes with partition pruning.
  Changing the salt draws an independent sample; nudging a stratum's
  rate upward keeps every previously-sampled row (nested samples), the
  property curation loops rely on for incremental re-mixes.
* ``pack_shards`` assigns docs to fixed-token-budget shards by EXACT
  global running sum without ever collapsing to one partition: range-
  partition by the order key, per-partition subtotals to the driver
  (one row per partition — KB-scale), cumulative offsets broadcast
  back, then a per-partition window finishes the prefix sum. The only
  wide exchange is the range partition; a 10^10-doc corpus packs with
  the same two jobs.

Reference: /root/reference is empty (SURVEY.md §0); the operators follow
standard web-corpus curation practice (hash-mod sampling, budgeted shard
packing) expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

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
    ``order_col``, which must be unique) fill ~``budget`` units of
    ``weight_col`` per shard: ``shard_id = floor(prefix_sum_exclusive /
    budget)``.

    Exact global prefix sum at scale: range-partition on the order key
    (equal keys colocate; partition i holds keys below partition i+1),
    collect one subtotal per partition, broadcast the running offsets
    back, and window within partitions — never a global single-partition
    window. The assignment is a pure function of the global order, so it
    is invariant to ``n_parts`` and to how the ranges were cut."""
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # pin the partitioning: the offsets collected below must describe the
    # SAME partitions the final plan windows over
    d = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    subtotals = sorted(
        d.groupBy("_pid").agg(F.sum(weight_col).alias("t")).collect()
    )
    offs, run = [], 0
    for r in subtotals:  # one row per non-empty partition
        offs.append((r._pid, run))
        run += r.t
    off_df = spark.createDataFrame(offs, schema="_pid int, _off long")
    w = (
        Window.partitionBy("_pid").orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "shard_id",
            F.floor(
                (F.sum(weight_col).over(w) + F.col("_off")
                 - F.col(weight_col)) / budget
            ),
        )
        .drop("_pid", "_off")
    )
