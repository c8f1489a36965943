"""Cross-engine validation of the generated DuckDB oracle SQL
(lectura/oracle_sql.py): the pure-SQL xxhash64 must equal Spark's
`xxhash64()` bit-for-bit, and the FNV-based fingerprint/simhash SQL must
equal the pure-Python spec. These are the oracles behind the
dedup_minhash_lsh / dedup_simhash / fingerprint_rolling / url_hash_u4 /
host_bucket_u5 / salt_u6 contract entries — if an oracle drifts, the
driver's hash gate would silently compare Spark against a wrong target.
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from lectura.oracle_sql import (
    dedup_simhash_sql,
    fingerprint_rolling_sql,
    xxhash64_ctes,
)

# Public XXH64 sanity vectors (xxHash reference implementation), seed 0 —
# pinned here for the pure-Python mirror used by the SQL validation.
_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc, inp):
    return (_rotl((acc + inp * _P2) & _M64, 31) * _P1) & _M64


def _merge(acc, v):
    acc ^= _round(0, v)
    return (acc * _P1 + _P4) & _M64


def xxh64_py(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0

    def r8(o):
        return int.from_bytes(data[o:o + 8], "little")

    def r4(o):
        return int.from_bytes(data[o:o + 4], "little")

    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, r8(i))
            v2 = _round(v2, r8(i + 8))
            v3 = _round(v3, r8(i + 16))
            v4 = _round(v4, r8(i + 24))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h = (_rotl(h ^ _round(0, r8(i)), 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ ((r4(i) * _P1) & _M64), 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def test_xxh64_py_matches_public_vectors():
    vectors = [
        (b"", 0, 0xEF46DB3751D8E999),
        (b"a", 0, 0xD24EC4F1A98C6E5B),
        (b"abc", 0, 0x44BC2CF5AD770999),
        (b"message digest", 0, 0x066ED728FCEEB3BE),
        (b"abcdefghijklmnopqrstuvwxyz", 0, 0xCFE1F278FA89835C),
        (
            b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789",
            0,
            0xAAA46907D3047814,
        ),
    ]
    for data, seed, exp in vectors:
        assert xxh64_py(data, seed) == exp


def _sample_strings() -> list[str]:
    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + ":/.?=&-_%"
    strs = [""]
    # every tail-path combination: lengths 1..70 cover 0-3 trailing bytes,
    # the optional 4-byte chunk, 0-3 8-byte words, and 0-2 32-byte stripes
    for L in list(range(1, 70)) + [100, 200, 333]:
        strs.append("".join(rng.choice(alphabet) for _ in range(L)))
    strs += [
        "http://host42.example/c/1234",
        "http://mega.example/o/999999",
        "host0.example",
    ]
    return strs


def test_sql_xxhash64_matches_python_reference():
    strs = _sample_strings()
    con = duckdb.connect()
    con.execute("CREATE TABLE strs(s VARCHAR)")
    con.executemany("INSERT INTO strs VALUES (?)", [(s,) for s in strs])
    sql = (
        "WITH inputs AS (SELECT * FROM strs),"
        + xxhash64_ctes("inputs", "s")
        + "\nSELECT s, xx FROM x7"
    )
    got = dict(con.execute(sql).fetchall())
    for s in strs:
        assert got[s] == _signed(xxh64_py(s.encode())), repr(s)


@pytest.mark.usefixtures("spark")
def test_sql_xxhash64_matches_spark(spark):
    """The load-bearing cross-engine check: Spark's xxhash64() (seed 42)
    == the DuckDB SQL chain, string by string."""
    strs = _sample_strings()
    sdf = spark.createDataFrame([(s,) for s in strs], "s string")
    spark_vals = {
        r["s"]: r["h"]
        for r in sdf.select("s", F.xxhash64("s").alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE strs(s VARCHAR)")
    con.executemany("INSERT INTO strs VALUES (?)", [(s,) for s in strs])
    sql = (
        "WITH inputs AS (SELECT * FROM strs),"
        + xxhash64_ctes("inputs", "s")
        + "\nSELECT s, xx FROM x7"
    )
    duck_vals = dict(con.execute(sql).fetchall())
    for s in strs:
        assert duck_vals[s] == spark_vals[s], repr(s)


def test_sql_fingerprint_matches_pure(tmp_path):
    from lectura.pure.fingerprint import rolling_fingerprint

    rng = random.Random(3)
    words = ["alpha", "beta", "gamma", "x1", "z-z", "longerword"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randrange(0, 30))))
        for i in range(50)
    ]
    import pandas as pd

    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    got = dict(con.execute(fingerprint_rolling_sql()).fetchall())
    for doc_id, text in rows:
        assert got[doc_id] == rolling_fingerprint(text), doc_id


def test_sql_simhash_pairs_match_pure(tmp_path):
    from lectura.pure.fingerprint import hamming64, simhash64

    rng = random.Random(5)
    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randrange(1, 40))))
        for i in range(60)
    ]
    import pandas as pd

    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    got = set(
        tuple(r)
        for r in con.execute(
            dedup_simhash_sql(max_hamming=8, max_doc_id=60)
        ).fetchall()
    )
    sh = {i: simhash64(t) for i, t in rows}
    exp = set()
    ids = sorted(sh)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            a, b = sh[d1], sh[d2]
            if any(
                ((a >> (16 * c)) & 0xFFFF) == ((b >> (16 * c)) & 0xFFFF)
                for c in range(4)
            ):
                h = hamming64(a, b)
                if h <= 8:
                    exp.add((d1, d2, h))
    assert got == exp
