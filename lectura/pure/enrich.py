"""Per-page enrichment at extraction time (pure spec, SEMANTICS.md §9b).

A production crawl-extraction pipeline (CCNet / RefinedWeb / FineWeb
lineage) does not stop at tag-stripping: every fetched page also gets
language affinity, quality statistics, token counts, and dedup
fingerprints computed in the same pass, because the page text is already
in memory there and re-reading 100 TB later just to fingerprint it is a
second full scan. These are the training-data-pipeline operators of
lectura/textops.py applied per page inside the fused X4 extraction.

Pure functions of the extracted text — deterministic, engine-neutral
(FNV/simhash from lectura.pure.fingerprint), shared verbatim with the
oracle and unit tests.
"""

from __future__ import annotations

import re

import numpy as np

from lectura.pure.fingerprint import _BASE, _MOD, fnv1a64

# Byte-level character-class tables for the ASCII range: classification of
# an ASCII char equals classification of its single UTF-8 byte, so counting
# over the encoded byte array is exact and numpy-vectorized. Non-ASCII
# chars (multi-byte, all bytes >= 0x80, which the tables score 0) fall back
# to per-char str.isalpha/isdigit — identical semantics, vectorized hot
# path. This loop ran per CHARACTER in Python before (~50 MB of text per
# bench round): it was a top-2 extraction cost.
_ASCII_ALPHA = np.zeros(256, dtype=np.uint8)
_ASCII_DIGIT = np.zeros(256, dtype=np.uint8)
for _b in range(128):
    if chr(_b).isalpha():
        _ASCII_ALPHA[_b] = 1
    elif chr(_b).isdigit():
        _ASCII_DIGIT[_b] = 1
_NON_ASCII = re.compile(r"[^\x00-\x7f]")

# Small closed-class stopword list (quality + language affinity signal).
STOPWORDS_EN = frozenset(
    "the a an and or of to in is are was were be been has have had for on "
    "with as by at it its this that these those from not no but if then "
    "else when while do does did done can could will would should there "
    "here he she they we you i his her their our your my".split()
)

ENRICH_COLS = (
    "n_tokens int, mean_token_len double, stopword_ratio double, "
    "alpha_ratio double, digit_ratio double, quality double, "
    "lang_guess string, fingerprint long, simhash long"
)


def _word_entry(w: str, cache: dict) -> tuple[int, int]:
    """(fnv_hash, is_stopword) for a token, batch-memoized."""
    e = cache.get(w)
    if e is None:
        e = (fnv1a64(w), 1 if w.lower() in STOPWORDS_EN else 0)
        cache[w] = e
    return e


def enrich_text(text: str, cache: dict | None = None) -> dict:
    """All enrichment stats for one page's extracted text.

    `cache` memoizes per-word hashes across the pages of one Arrow batch
    (natural-language word distributions are Zipfian — the hit rate is
    high and the semantics unchanged).
    """
    if cache is None:
        cache = {}
    words = text.split()
    n = len(words)
    if n == 0:
        return {
            "n_tokens": 0, "mean_token_len": 0.0, "stopword_ratio": 0.0,
            "alpha_ratio": 0.0, "digit_ratio": 0.0, "quality": 0.0,
            "lang_guess": "und", "fingerprint": 0, "simhash": 0,
        }

    entries = [_word_entry(w, cache) for w in words]
    total_len = sum(map(len, words))
    n_stop = sum(e[1] for e in entries)
    fp = 0
    for h, _ in entries:  # order-sensitive polynomial — inherently serial
        fp = (fp * _BASE + h) % _MOD
    # simhash: per-bit vote over the word hashes. bit i of the signature is
    # set iff more words have bit i set than clear (ones*2 > n). The
    # little-endian byte view + bitorder='little' makes unpackbits column j
    # equal (h >> j) & 1 — the exact loop this replaces (64 Python ops per
    # word before; one vectorized pass now).
    hs = np.fromiter((e[0] for e in entries), dtype=np.uint64, count=n)
    bit_cols = np.unpackbits(
        hs.astype("<u8").view(np.uint8).reshape(n, 8),
        axis=1, bitorder="little",
    )
    ones = bit_cols.sum(axis=0, dtype=np.int64)
    sim = int.from_bytes(
        np.packbits(2 * ones > n, bitorder="little").tobytes(), "little"
    )

    tb = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n_alpha = int(_ASCII_ALPHA[tb].sum())
    n_digit = int(_ASCII_DIGIT[tb].sum())
    if len(tb) != len(text):  # multi-byte chars present → exact slow path
        for c in _NON_ASCII.findall(text):
            if c.isalpha():
                n_alpha += 1
            elif c.isdigit():
                n_digit += 1
    ln = len(text)
    alpha_ratio = n_alpha / ln
    digit_ratio = n_digit / ln
    stop_ratio = n_stop / n
    mean_wl = total_len / n

    # Quality heuristic (Gopher/C4-style): well-formed prose has plenty of
    # alphabetic chars, a credible mean word length, and some stopwords.
    quality = (
        min(alpha_ratio / 0.7, 1.0)
        * min(stop_ratio / 0.2, 1.0)
        * (1.0 if 3.0 <= mean_wl <= 10.0 else 0.5)
        * min(n / 50.0, 1.0)
    )
    # Language affinity: closed-class-word evidence for English, else
    # scripts/other (corpus langs are Latin-script; a real pipeline swaps
    # in a char-n-gram model here — same shape, same plumbing).
    lang_guess = "en" if stop_ratio >= 0.08 and alpha_ratio >= 0.5 else "und"

    return {
        "n_tokens": n,
        "mean_token_len": round(mean_wl, 4),
        "stopword_ratio": round(stop_ratio, 4),
        "alpha_ratio": round(alpha_ratio, 4),
        "digit_ratio": round(digit_ratio, 4),
        "quality": round(quality, 4),
        "lang_guess": lang_guess,
        "fingerprint": fp,
        "simhash": sim - (1 << 64) if sim >= (1 << 63) else sim,  # int64
    }
