"""Numpy cuckoo-filter core — the second URL-seen-set backend beside
bloomcore (SURVEY.md §2.3; B:2 "partitioned Bloom/cuckoo URL-seen set").

Design follows the public cuckoo-filter construction (Fan, Andersen,
Kaminsky, Mitzenmacher, CoNEXT 2014): buckets of SLOTS 16-bit
fingerprints, partial-key cuckoo hashing where an item's two candidate
buckets satisfy i2 = i1 XOR H(fp) — an involution, so either bucket plus
the fingerprint recovers the other and eviction never needs the original
key. n_buckets is a power of two so the XOR stays in range.

vs the Bloom backend: supports DELETE (clear one stored fingerprint) and
a lower FPP (~2*SLOTS/2^16 ≈ 1.2e-4 at full load, under the 1e-3 default
bound) at ~2x the bits (32 bits/key at load 0.84 vs ~14.4). The
no-false-negative guarantee is ABSOLUTE: inserts that lose their
eviction chain land in an overflow stash that probes always consult, so
a saturated filter degrades in space, never in correctness.

Inputs are int64 arrays of `xxhash64(canonical_url)` computed JVM-side
(same convention as bloomcore). Batch inserts are two vectorized
placement passes (bucket 1 then bucket 2) with a short per-key eviction
loop only for the residue; probes/serialization are fully vectorized.

Determinism: `build`/`insert_hashes` dedupe+sort the batch
(np.unique), so the serialized bytes depend only on the SET of keys and
the prior table state — not on Spark's row order within a shard task.
"""

from __future__ import annotations

import numpy as np

SLOTS = 4
FP_MASK = np.uint64(0xFFFF)
MAX_KICKS = 500
TARGET_LOAD = 0.84
_MAGIC = 0x31464B43  # 'CKF1' little-endian
# public MurmurHash2 multiplicative constant — mixes the 16 fingerprint
# bits across the bucket-index range for the XOR displacement
_FP_MIX = np.uint64(0x5BD1E995)


def size_for(n_capacity: int) -> int:
    """Smallest power-of-two bucket count holding n_capacity keys at
    TARGET_LOAD with SLOTS slots per bucket."""
    need = max(8, int(np.ceil(max(1, n_capacity) / (SLOTS * TARGET_LOAD))))
    return 1 << int(np.ceil(np.log2(need)))


def _mix64(hu: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain, Steele et al.) — full-avalanche
    remix of the key hash BEFORE bucket/fingerprint extraction. The shard
    router upstream is pmod(xxhash64(url), n_shards) over the SAME hash,
    so with a power-of-two shard count every key in a shard agrees on its
    low log2(n_shards) bits; taking i1 straight from the low bits then
    collapses it to n_buckets/n_shards distinct buckets per shard —
    measured at 10^8 scale: eviction chains fail into a ~600-entry stash
    and novel-probe FPP inflates ~20x (0.00198 vs 9e-5 uncorrelated).
    One multiply-xor cascade decorrelates bucket bits from shard bits."""
    hu = (hu ^ (hu >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    hu = (hu ^ (hu >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return hu ^ (hu >> np.uint64(31))


def derive(hashes: np.ndarray, n_buckets: int):
    """(fp uint16[n], i1 int64[n], i2 int64[n]) from 64-bit key hashes.
    fp comes from the high 16 bits of the remixed hash (0 remapped to
    1 — 0 is the empty slot sentinel); i1 from its low bits,
    independent of fp."""
    hu = _mix64(np.asarray(hashes, dtype=np.int64).view(np.uint64))
    fp = (hu >> np.uint64(48)) & FP_MASK
    fp = np.where(fp == 0, np.uint64(1), fp)
    mask = np.uint64(n_buckets - 1)
    i1 = hu & mask
    i2 = (i1 ^ (fp * _FP_MIX)) & mask
    return fp.astype(np.uint16), i1.astype(np.int64), i2.astype(np.int64)


def _alt(i: int, fp: int, n_buckets: int) -> int:
    return int((np.uint64(i) ^ (np.uint64(fp) * _FP_MIX))
               & np.uint64(n_buckets - 1))


def empty(n_buckets: int) -> np.ndarray:
    return np.zeros((n_buckets, SLOTS), dtype=np.uint16)


def _place_pass(table: np.ndarray, buckets: np.ndarray,
                fps: np.ndarray) -> np.ndarray:
    """Vectorized placement of one candidate-bucket pass: each item takes
    the next free slot of its bucket, respecting same-batch contention
    (k items aiming at one bucket consume k distinct free slots).
    Returns a placed mask aligned with the input order."""
    n = len(buckets)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.argsort(buckets, kind="stable")
    b = buckets[order]
    first = np.r_[True, b[1:] != b[:-1]]
    run_start = np.flatnonzero(first)
    rank = np.arange(n) - run_start[np.cumsum(first) - 1]
    emp = table[b] == 0  # (n, SLOTS)
    can = rank < emp.sum(axis=1)
    # slot = index of the (rank+1)-th free slot in the row
    pick = emp & (emp.cumsum(axis=1) == (rank + 1)[:, None])
    slot = pick.argmax(axis=1)
    table[b[can], slot[can]] = fps[order][can]
    placed = np.empty(n, dtype=bool)
    placed[order] = can
    return placed


def insert_pairs(table: np.ndarray, stash: list[int], buckets: np.ndarray,
                 fps: np.ndarray) -> None:
    """Insert (bucket, fp) pairs — the primitive shared by key inserts and
    table merges (a stored pair's alternate bucket is recomputable).
    Mutates table/stash in place."""
    n_buckets = table.shape[0]
    fps = fps.astype(np.uint16)
    buckets = buckets.astype(np.int64)
    alt = np.frompyfunc(lambda i, f: _alt(int(i), int(f), n_buckets),
                        2, 1)(buckets, fps).astype(np.int64) \
        if len(buckets) else buckets
    pending = np.arange(len(fps))
    for cand in (buckets, alt):
        if not len(pending):
            return
        placed = _place_pass(table, cand[pending], fps[pending])
        pending = pending[~placed]
    for j in pending:  # eviction chains — the residue of a sized batch
        cur_i, cur_f = int(buckets[j]), int(fps[j])
        for kick in range(MAX_KICKS):
            row = table[cur_i]
            free = np.flatnonzero(row == 0)
            if len(free):
                row[free[0]] = cur_f
                break
            nxt = _alt(cur_i, cur_f, n_buckets)
            row2 = table[nxt]
            free2 = np.flatnonzero(row2 == 0)
            if len(free2):
                row2[free2[0]] = cur_f
                break
            vs = kick % SLOTS
            victim = int(row[vs])
            row[vs] = cur_f
            cur_f = victim
            cur_i = _alt(cur_i, cur_f, n_buckets)
        else:
            # chain exhausted: stash (bucket, fp) — probes consult the
            # stash, so correctness never depends on the chain succeeding
            stash.append((cur_i << 16) | cur_f)


def insert_hashes(table: np.ndarray, stash: list[int],
                  hashes: np.ndarray) -> int:
    """Insert key hashes (deduped within the batch + sorted for
    determinism). Returns the number of stored copies (== batch
    distinct count).

    STORE-ALWAYS semantics, per the public cuckoo-filter construction:
    a key whose (bucket-pair, fingerprint) identity already probes
    positive is STILL stored. Skipping it would be wrong — the existing
    hit may belong to a DIFFERENT key sharing the identity
    (≈ 2·SLOTS/2^16 per occupied pair), and deleting that twin later
    would then remove the only copy, a FALSE NEGATIVE for this key.
    With per-copy storage, identity collisions cost a harmless extra
    slot and delete stays safe. The corollary (also public spec):
    deletes must pair 1:1 with inserts — re-upserting the same key n
    times requires n deletes to fully clear it, and one delete leaves a
    residual (false-positive-only) copy. The crawl never re-upserts (a
    round's new_seen is disjoint from the seen-set by construction);
    forced-recrawl delete callers must not re-add a url before deleting
    it, or must delete once per prior upsert."""
    h = np.unique(np.asarray(hashes, dtype=np.int64))
    if not len(h):
        return 0
    fp, i1, _ = derive(h, table.shape[0])
    insert_pairs(table, stash, i1, fp)
    return len(h)


def build(hashes: np.ndarray, n_buckets: int) -> tuple[np.ndarray, list[int]]:
    table = empty(n_buckets)
    stash: list[int] = []
    insert_hashes(table, stash, hashes)
    return table, stash


def probe(hashes: np.ndarray, table: np.ndarray,
          stash: np.ndarray) -> np.ndarray:
    """Boolean membership (True = possibly seen, False = definitely new).
    A stashed entry matches when its fingerprint AND one of the query's
    two buckets agree — same identity as an in-table entry."""
    h = np.asarray(hashes, dtype=np.int64)
    if not len(h):
        return np.zeros(0, dtype=bool)
    fp, i1, i2 = derive(h, table.shape[0])
    hit = ((table[i1] == fp[:, None]).any(axis=1)
           | (table[i2] == fp[:, None]).any(axis=1))
    if len(stash):
        p1 = (i1.astype(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)
        p2 = (i2.astype(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)
        s = np.asarray(stash, dtype=np.uint64)
        hit |= np.isin(p1, s) | np.isin(p2, s)
    return hit


def delete(table: np.ndarray, stash: list[int],
           hashes: np.ndarray) -> np.ndarray:
    """Remove ONE stored fingerprint per key (cuckoo's defining extra over
    Bloom). Per the public construction, deleting a key that was never
    inserted may evict a distinct key sharing (bucket-pair, fingerprint)
    — callers must only delete previously-inserted keys. Returns a
    removed? mask."""
    h = np.asarray(hashes, dtype=np.int64)
    out = np.zeros(len(h), dtype=bool)
    if not len(h):
        return out
    fp, i1, i2 = derive(h, table.shape[0])
    for j in range(len(h)):
        f = int(fp[j])
        removed = False
        for b in (int(i1[j]), int(i2[j])):
            row = table[b]
            where = np.flatnonzero(row == f)
            if len(where):
                row[where[0]] = 0
                removed = True
                break
        if not removed:
            for b in (int(i1[j]), int(i2[j])):
                packed = (b << 16) | f
                if packed in stash:
                    stash.remove(packed)
                    removed = True
                    break
        out[j] = removed
    return out


def serialize(table: np.ndarray, stash: list[int] | np.ndarray) -> bytes:
    header = np.array([_MAGIC, table.shape[0], SLOTS, len(stash)],
                      dtype=np.uint64)
    return (header.tobytes() + table.tobytes()
            + np.asarray(stash, dtype=np.uint64).tobytes())


def deserialize(blob: bytes | np.ndarray) -> tuple[np.ndarray, list[int]]:
    raw = np.frombuffer(bytes(blob), dtype=np.uint8)
    header = raw[:32].view(np.uint64)
    if int(header[0]) != _MAGIC:
        raise ValueError("not a cuckoo-filter blob")
    n_buckets, slots, stash_len = (int(header[1]), int(header[2]),
                                   int(header[3]))
    if slots != SLOTS:
        raise ValueError(f"slot fan-out {slots} != built-in {SLOTS}")
    tb = n_buckets * SLOTS * 2
    table = (raw[32:32 + tb].view(np.uint16)
             .reshape(n_buckets, SLOTS).copy())
    stash = raw[32 + tb:32 + tb + stash_len * 8].view(np.uint64)
    return table, [int(x) for x in stash]


def merge(blobs: list[bytes]) -> tuple[np.ndarray, list[int]]:
    """Union same-shard filters (D2 parity with bloomcore.merge): keep the
    largest table, re-insert every stored (bucket, fp) pair of the others
    — rescaling pairs from a smaller table keeps i-bits consistent because
    bucket indices are low-bit prefixes only when sizes match, so mixed
    sizes are rejected instead of silently corrupted."""
    parts = [deserialize(b) for b in blobs]
    sizes = {t.shape[0] for t, _ in parts}
    if len(sizes) > 1:
        raise ValueError(f"cannot merge cuckoo tables of sizes {sizes}")
    table, stash = parts[0]
    table = table.copy()
    stash = list(stash)
    for other, other_stash in parts[1:]:
        b_idx, s_idx = np.nonzero(other)
        insert_pairs(table, stash, b_idx, other[b_idx, s_idx])
        for packed in other_stash:
            insert_pairs(table, stash,
                         np.array([packed >> 16], dtype=np.int64),
                         np.array([packed & 0xFFFF], dtype=np.uint16))
    return table, stash


def load_factor(table: np.ndarray) -> float:
    return float((table != 0).mean())


def fpp_est(table: np.ndarray) -> float:
    """Expected false-positive probability at the CURRENT load: a probe
    compares against 2*SLOTS slots of which load*2*SLOTS are occupied by
    (assumed independent) 16-bit fingerprints drawn from 65535 values."""
    occupied = load_factor(table) * 2 * SLOTS
    return float(1.0 - (1.0 - 1.0 / 65535.0) ** occupied)
