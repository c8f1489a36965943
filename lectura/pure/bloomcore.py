"""Numpy bloom-filter core for the partitioned URL-seen set
(SEMANTICS.md §7; B:6 "partitioned Bloom/cuckoo URL-seen set sized for a
10^10-URL frontier"; SQL `bloom_filter_agg` is not callable in this build
— SURVEY.md §0.1 — so the bits live in binary blobs built/probed inside
Arrow-batched UDFs).

Inputs are int64 arrays of `xxhash64(canonical_url)` computed JVM-side;
k bit positions derive via double hashing g_i = (h1 + i*h2) mod m with
h1 = low32(h), h2 = high32(h)|1. Everything vectorized; no per-row Python.
"""

from __future__ import annotations

import math

import numpy as np


def size_for(n_capacity: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k) for target capacity and false-positive rate."""
    n = max(1, n_capacity)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, m)
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(hashes), k) uint64 bit positions via double hashing."""
    hu = hashes.astype(np.int64).view(np.uint64)
    h1 = hu & np.uint64(0xFFFFFFFF)
    h2 = (hu >> np.uint64(32)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return (h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)


def empty_bits(m_bits: int) -> np.ndarray:
    return np.zeros((m_bits + 7) // 8, dtype=np.uint8)


def build(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Packed uint8 bloom bits for the given 64-bit hashes."""
    bits = empty_bits(m_bits)
    if len(hashes):
        pos = _positions(np.asarray(hashes), m_bits, k).ravel()
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))
    return bits


def merge(blobs: list[bytes | np.ndarray], m_bits: int) -> np.ndarray:
    """OR-combine same-shard blobs (cross-round seen-set merge, D2)."""
    out = empty_bits(m_bits)
    for b in blobs:
        arr = np.frombuffer(bytes(b), dtype=np.uint8)
        if len(arr) != len(out):
            raise ValueError(f"shard blob size {len(arr)} != expected {len(out)}")
        out |= arr
    return out


def probe(hashes: np.ndarray, bits: bytes | np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Boolean membership array (True = possibly seen; False = definitely new)."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    arr = np.frombuffer(bytes(bits), dtype=np.uint8)
    pos = _positions(np.asarray(hashes), m_bits, k)
    byte_idx = (pos >> np.uint64(3)).astype(np.int64)
    bit_mask = np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
    hit = (arr[byte_idx] & bit_mask) != 0
    return hit.all(axis=1)
