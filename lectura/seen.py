"""Partitioned Bloom URL-seen set (SURVEY.md §2.3, D1–D6; SEMANTICS.md §7).

Shards are disjoint hash ranges: `shard_id = pmod(xxhash64(url), n_shards)`
(JVM-side). Bits are built/merged per shard with numpy inside
`applyInPandas` (one output row per shard) and probed by joining candidates
to their shard blob (broadcast — shards total ≤ a few GB even at the 10^10
design point, and a round only touches shards with candidates) followed by
a vectorized membership UDF. The exact-set path (D4/D5) is a plain
`left_anti` join and doubles as the oracle for the bloom path's FPP bound
(B:14).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lectura.pure import bloomcore

SHARD_SCHEMA = "shard_id int, bits binary, n_inserted long, m_bits long, k int"


def with_shard(df: DataFrame, n_shards: int, url_col: str = "url") -> DataFrame:
    return df.withColumn(
        "shard_id", F.pmod(F.xxhash64(url_col), F.lit(n_shards)).cast("int")
    ).withColumn("url_key", F.xxhash64(url_col))


def bloom_build(urls: DataFrame, n_shards: int, capacity_per_shard: int,
                fpp: float) -> DataFrame:
    """D1: urls df (any cols incl. `url`) -> one (shard_id, bits, …) row per
    shard. m/k sized from configured capacity + FPP (B:6)."""
    m_bits, k = bloomcore.size_for(capacity_per_shard, fpp)

    def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["url_key"].to_numpy(dtype=np.int64)
        bits = bloomcore.build(h, m_bits, k)
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "bits": [bits.tobytes()],
                "n_inserted": [len(h)],
                "m_bits": [m_bits],
                "k": [k],
            }
        )

    keyed = with_shard(urls.select("url"), n_shards)
    return keyed.groupBy("shard_id").applyInPandas(build_shard, SHARD_SCHEMA)


def bloom_merge(shards: DataFrame) -> DataFrame:
    """D2: OR-combine same-shard blobs across rounds."""

    def merge_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        m_bits = int(pdf["m_bits"].iloc[0])
        merged = bloomcore.merge(list(pdf["bits"]), m_bits)
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "bits": [merged.tobytes()],
                "n_inserted": [int(pdf["n_inserted"].sum())],
                "m_bits": [m_bits],
                "k": [int(pdf["k"].iloc[0])],
            }
        )

    return shards.groupBy("shard_id").applyInPandas(merge_shard, SHARD_SCHEMA)


@F.pandas_udf(T.BooleanType())
def _probe_udf(shard_id: pd.Series, url_key: pd.Series, bits: pd.Series,
               m_bits: pd.Series, k: pd.Series) -> pd.Series:
    """Vectorized membership test; groups rows by shard inside the batch so
    each shard blob is touched once per Arrow batch."""
    out = np.zeros(len(url_key), dtype=bool)
    if len(url_key):
        null_mask = bits.isna().to_numpy()
        h = url_key.to_numpy(dtype=np.int64)
        positions = np.arange(len(url_key))
        for _, idx in pd.Series(positions).groupby(shard_id.to_numpy()).groups.items():
            idx = np.asarray(idx)
            first = idx[0]
            if null_mask[first]:
                continue
            out[idx] = bloomcore.probe(
                h[idx], bits.iloc[first], int(m_bits.iloc[first]),
                int(k.iloc[first])
            )
    return pd.Series(out)


def bloom_probe(cand: DataFrame, shards: DataFrame, n_shards: int) -> DataFrame:
    """D3: add `maybe_seen` to candidates. Shard dim is broadcast."""
    keyed = with_shard(cand, n_shards)
    j = keyed.join(F.broadcast(shards), "shard_id", "left")
    return j.withColumn(
        "maybe_seen",
        F.when(F.col("bits").isNull(), F.lit(False)).otherwise(
            _probe_udf("shard_id", "url_key", "bits", "m_bits", "k")
        ),
    ).drop("bits", "n_inserted", "m_bits", "k")


def anti_join_seen(cand: DataFrame, seen: DataFrame) -> DataFrame:
    """D5: exact cross-round dedupe — candidates not in the seen table."""
    return cand.join(seen.select("url"), "url", "left_anti")
