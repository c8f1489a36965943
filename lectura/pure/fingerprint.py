"""Deterministic document fingerprints (pure spec, shared by the Spark
pandas UDFs and the pytest oracles): rolling polynomial hash, word-shingle
minhash, and simhash. Engine-neutral — no xxhash64 dependency, so the same
numbers are computable anywhere."""

from __future__ import annotations

_MOD = (1 << 61) - 1  # Mersenne prime
_BASE = 1_000_003
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3


def fnv1a64(s: str) -> int:
    """FNV-1a 64-bit — trivially portable word hash."""
    h = _FNV_OFFSET
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * _FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


def rolling_fingerprint(text: str) -> int:
    """Order-sensitive polynomial rolling hash over whitespace tokens."""
    h = 0
    for w in text.split():
        h = (h * _BASE + fnv1a64(w)) % _MOD
    return h


def shingles(text: str, n: int = 3) -> set[str]:
    w = text.split()
    if len(w) < n:
        return {" ".join(w)} if w else set()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


# minhash permutation parameters: deterministic, engine-neutral.
# Modulus is the Mersenne prime 2^31-1 so that a*h'+b (h' already reduced
# mod p) stays < 2^62 — no int64 overflow under Spark's ANSI arithmetic.
_MH_P = (1 << 31) - 1


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _MH_P), rng.randrange(0, _MH_P)) for _ in range(k)]


def minhash_signature(text: str, k: int = 32, n: int = 3,
                      params: list[tuple[int, int]] | None = None) -> list[int]:
    params = params or minhash_params(k)
    hs = [fnv1a64(s) % _MH_P for s in shingles(text, n)]
    if not hs:
        return [0] * k
    return [min((a * h + b) % _MH_P for h in hs) for a, b in params]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def simhash64(text: str) -> int:
    """64-bit simhash over whitespace tokens (FNV word hashes)."""
    counts = [0] * 64
    for w in text.split():
        h = fnv1a64(w)
        for i in range(64):
            counts[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(64):
        if counts[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
