"""Generated DuckDB oracle SQL for hash-based operators (SURVEY.md §5).

These builders turn previously rows-only contract queries into fully
hash-checked ones by re-implementing the engine hash functions in pure
DuckDB SQL — an INDEPENDENT second implementation, not shared code:

- FNV-1a 64 + the rolling polynomial fingerprint and simhash64 (the
  engine-neutral pure spec in lectura/pure/fingerprint.py) as
  HUGEINT folds (`list_reduce`) over per-word codepoints;
- xxHash64 (seed 42 — the exact hash behind Spark's `xxhash64()`,
  validated against the public XXH64 sanity vectors AND against Spark
  in tests/test_oracle_sql.py) as a CTE chain of HUGEINT arithmetic:
  32-byte stripe folds, 8/4/1-byte tails, avalanche. u64 wraparound is
  emulated with `% 2^64`; u64×u64 products overflow INT128, so
  multiplication is split into 32-bit limbs (`_mul`); XOR runs in the
  UBIGINT domain.

ASCII assumption: byte value == codepoint (`unicode(s[i])`). All fixture
inputs are ASCII (checked: documents/url strings at every sf); a
non-ASCII corpus would need a byte-level `encode()` accessor instead.

Only arithmetic-expressible hashes are oracled this way. Engine-internal
or RNG-seeded operators (bloom bit layout, HLL sketches, gaussian LSH
planes, k-means centroids) stay rows-only with pytest invariants.
"""

from __future__ import annotations

M = "18446744073709551616::HUGEINT"  # 2^64
SEED = 42  # Spark's xxhash64 default seed
_P = {
    1: 11400714785074694791,
    2: 14029467366897019727,
    3: 1609587929392839161,
    4: 9650029242287828579,
    5: 2870177450012600261,
}

# FNV-1a 64 constants (lectura/pure/fingerprint.py)
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_ROLL_BASE = 1_000_003
_ROLL_MOD = (1 << 61) - 1
_MH_P = (1 << 31) - 1


def _mul(a: str, const: int) -> str:
    """(a * const) % 2^64 via 32-bit limb split (a < 2^64; the direct
    HUGEINT product of two u64 can exceed INT128)."""
    return (
        f"((( ({a}) % 4294967296::HUGEINT) * {const}::HUGEINT"
        f" + (( ({a}) // 4294967296::HUGEINT) * {const}::HUGEINT"
        f" % 4294967296::HUGEINT) * 4294967296::HUGEINT) % {M})"
    )


def _xor(a: str, b: str) -> str:
    return f"xor(({a})::UBIGINT, ({b})::UBIGINT)::HUGEINT"


def _rotl(x: str, r: int) -> str:
    # disjoint bit ranges, so + is |
    return f"((({x}) * {1 << r}::HUGEINT) % {M} + ({x}) // {1 << (64 - r)}::HUGEINT)"


def _rnd(acc: str, inp: str) -> str:
    t = f"((({acc}) + {_mul(inp, _P[2])}) % {M})"
    return _mul(_rotl(t, 31), _P[1])


def _merge(acc: str, v: str) -> str:
    return f"(({_mul(_xor(acc, _rnd('0::HUGEINT', v)), _P[1])} + {_P[4]}::HUGEINT) % {M})"


def _read(base: str, nbytes: int) -> str:
    """Little-endian read of `nbytes` from 1-based byte list `bs` starting
    after 0-based offset expression `base`."""
    return (
        "("
        + " + ".join(
            f"bs[({base}) + {j + 1}] * {1 << (8 * j)}::HUGEINT"
            for j in range(nbytes)
        )
        + ")"
    )


def xxhash64_ctes(src: str, col: str, out: str = "xx", p: str = "x") -> str:
    """CTE chain `<p>1..<p>7` computing signed xxhash64(col, seed=42) for
    every row of relation `src`; `<p>7` carries all of src's columns plus
    `out`. Prefix `p` lets two chains coexist in one statement."""
    seed = f"{SEED}::HUGEINT"
    v1_0 = f"(({seed} + {_P[1]}::HUGEINT + {_P[2]}::HUGEINT) % {M})"
    v2_0 = f"(({seed} + {_P[2]}::HUGEINT) % {M})"
    v3_0 = seed
    v4_0 = f"(({seed} + {M} - {_P[1]}::HUGEINT) % {M})"
    stripe = f"""list_transform(range(0, n // 32), k -> struct_pack(
        w1 := {_read('k*32', 8)}, w2 := {_read('k*32 + 8', 8)},
        w3 := {_read('k*32 + 16', 8)}, w4 := {_read('k*32 + 24', 8)}))"""
    lanes = f"""list_reduce(list_prepend(
        struct_pack(w1 := {v1_0}, w2 := {v2_0}, w3 := {v3_0}, w4 := {v4_0}),
        {stripe}),
        (a, e) -> struct_pack(
          w1 := {_rnd('a.w1', 'e.w1')}, w2 := {_rnd('a.w2', 'e.w2')},
          w3 := {_rnd('a.w3', 'e.w3')}, w4 := {_rnd('a.w4', 'e.w4')}))"""
    h_big = (
        f"(({_rotl('v.w1', 1)}) + ({_rotl('v.w2', 7)}) + "
        f"({_rotl('v.w3', 12)}) + ({_rotl('v.w4', 18)})) % {M}"
    )
    h_merged = _merge(
        _merge(_merge(_merge(f"({h_big})", "v.w1"), "v.w2"), "v.w3"), "v.w4"
    )
    t8 = f"""list_reduce(list_prepend(h1, list_transform(
        range(0, (n - n // 32 * 32) // 8),
        k -> {_read('n // 32 * 32 + k*8', 8)})),
        (h, e) -> ({_mul(_rotl(_xor('h', _rnd('0::HUGEINT', 'e')), 27), _P[1])} + {_P[4]}::HUGEINT) % {M})"""
    o4 = "(n // 32 * 32 + (n - n // 32 * 32) // 8 * 8)"
    t4 = f"""CASE WHEN n - {o4} >= 4
        THEN ({_mul(_rotl(_xor('h2', _mul(_read(o4, 4), _P[1])), 23), _P[2])} + {_P[3]}::HUGEINT) % {M}
        ELSE h2 END"""
    ob = f"({o4} + CASE WHEN n - {o4} >= 4 THEN 4 ELSE 0 END)"
    tb = f"""list_reduce(list_prepend(h3, list_transform(
        range({ob}, n), i -> bs[i + 1])),
        (h, e) -> {_mul(_rotl(_xor('h', _mul('e', _P[5])), 11), _P[1])})"""
    av1 = _xor("h4", "h4 // 8589934592::HUGEINT")  # >> 33
    av2 = _mul(av1, _P[2])
    av3 = _xor(av2, f"({av2}) // 536870912::HUGEINT")  # >> 29
    av4 = _mul(av3, _P[3])
    av5 = _xor(av4, f"({av4}) // 4294967296::HUGEINT")  # >> 32
    return f"""
{p}1 AS (SELECT *,
        list_transform(range(1, length({col}) + 1),
                       i -> unicode(({col})[i])::HUGEINT) AS bs,
        octet_length(encode({col}))::BIGINT AS n
       FROM {src}),
{p}2 AS (SELECT *, CASE WHEN n >= 32 THEN {lanes} END AS v FROM {p}1),
{p}3 AS (SELECT *,
        (CASE WHEN n >= 32 THEN ({h_merged})
              ELSE ({seed} + {_P[5]}::HUGEINT) % {M} END + n::HUGEINT) % {M} AS h1
       FROM {p}2),
{p}4 AS (SELECT *, {t8} AS h2 FROM {p}3),
{p}5 AS (SELECT *, {t4} AS h3 FROM {p}4),
{p}6 AS (SELECT *, {tb} AS h4 FROM {p}5),
{p}7 AS (SELECT * EXCLUDE (bs, n, v, h1, h2, h3, h4),
        CASE WHEN ({av5}) >= 9223372036854775808::HUGEINT
             THEN (({av5}) - {M})::BIGINT ELSE ({av5})::BIGINT END AS {out}
       FROM {p}6)"""


def pmod(expr: str, m: int) -> str:
    """Non-negative mod of a signed BIGINT expression (Spark F.pmod)."""
    return f"((({expr}) % {m}) + {m}) % {m}"


# ---------------------------------------------------------------------------
# FNV-1a fold pieces (shared by the fingerprint + simhash oracles)
# ---------------------------------------------------------------------------
_FNV_FOLD = f"""list_reduce(
      list_prepend({_FNV_OFFSET}::HUGEINT,
        list_transform(range(1, length(w) + 1), i -> unicode(w[i])::HUGEINT)),
      (h, b) -> ((h - (h % 256) + xor((h % 256)::BIGINT, b::BIGINT)::HUGEINT)
                 * {_FNV_PRIME}::HUGEINT) % {M})"""


def _words_ctes(where: str = "") -> str:
    """words/tok/vocab/fnv CTEs over `documents` (whitespace tokens, FNV
    per distinct word — the fixture vocab is tiny, so hashing per distinct
    word instead of per occurrence keeps the fold count low)."""
    return rf"""words AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '') AS ws
  FROM documents {where}
), tok AS (
  SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w FROM words
), vocab AS (SELECT DISTINCT w FROM tok),
fnv AS (SELECT w, {_FNV_FOLD} AS f FROM vocab)"""


def fingerprint_rolling_sql() -> str:
    """Order-sensitive rolling polynomial fingerprint per document."""
    return f"""
WITH {_words_ctes()},
doc_fps AS (
  SELECT t.doc_id,
    list_reduce(list_prepend(0::HUGEINT, list(fnv.f ORDER BY t.pos)),
      (h, f) -> (h * {_ROLL_BASE}::HUGEINT + f) % {_ROLL_MOD}::HUGEINT) AS fp_c
  FROM tok t JOIN fnv USING (w) GROUP BY t.doc_id
)
SELECT w2.doc_id, coalesce(d.fp_c, 0)::BIGINT AS fp
FROM words w2 LEFT JOIN doc_fps d USING (doc_id)
"""


def dedup_simhash_sql(max_hamming: int = 8, max_doc_id: int = 300,
                      max_df: int | None = None) -> str:
    """SimHash near-dup pairs: per-doc 64-bit signature from the 64
    per-bit majority sums, 4×16-bit pigeonhole banding, exact hamming.
    `max_df` mirrors simhash_band_pairs' hot-bucket document-frequency
    cap: band buckets with more than max_df members are excluded from
    candidate generation."""
    bits = " +\n".join(
        f"    CASE WHEN 2*sum(((f // {1 << i}::HUGEINT) % 2)::BIGINT) > count(*)"
        f" THEN {1 << i}::HUGEINT ELSE 0::HUGEINT END"
        for i in range(64)
    )
    return f"""
WITH {_words_ctes(f"WHERE doc_id < {max_doc_id}")},
sh0 AS (
  SELECT doc_id,
{bits}
  AS u
  FROM tok JOIN fnv USING (w) GROUP BY doc_id
), sh AS (
  SELECT w2.doc_id AS id, coalesce(sh0.u, 0::HUGEINT) AS u,
         (CASE WHEN coalesce(sh0.u, 0::HUGEINT) >= 9223372036854775808::HUGEINT
               THEN coalesce(sh0.u, 0::HUGEINT) - {M}
               ELSE coalesce(sh0.u, 0::HUGEINT) END)::BIGINT AS s
  FROM words w2 LEFT JOIN sh0 USING (doc_id)
), chunks AS (
  SELECT id, u, s, c,
         ((u // (CASE c WHEN 0 THEN 1 WHEN 1 THEN 65536
                        WHEN 2 THEN 4294967296
                        ELSE 281474976710656 END::HUGEINT))
          % 65536)::BIGINT AS val
  FROM sh, (SELECT unnest([0, 1, 2, 3]) AS c)
){_df_cap_cte(max_df)}
SELECT DISTINCT a.id AS d1, b.id AS d2, bit_count(xor(a.s, b.s)) AS hamming
FROM {"chunksf" if max_df is not None else "chunks"} a
JOIN {"chunksf" if max_df is not None else "chunks"} b
  ON a.c = b.c AND a.val = b.val AND a.id < b.id
WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}
"""


def _df_cap_cte(max_df: int | None) -> str:
    if max_df is None:
        return ""
    return f""", cool AS (
  SELECT c, val FROM chunks GROUP BY c, val HAVING count(*) <= {max_df}
), chunksf AS (
  SELECT ch.* FROM chunks ch JOIN cool USING (c, val)
)"""


# ---------------------------------------------------------------------------
# xxhash64-based oracles (U4/U5/U6 + MinHash LSH)
# ---------------------------------------------------------------------------
def url_hash_u4_sql() -> str:
    urls = (
        "SELECT 'http://host' || (c_custkey % 97)::VARCHAR"
        " || '.example/c/' || c_custkey::VARCHAR AS url FROM customer"
    )
    return f"""
WITH inputs AS ({urls}),{xxhash64_ctes("inputs", "url", out="h")}
SELECT count(*) AS n, count(DISTINCT h) AS n_distinct,
       min(h) AS min_h, max(h) AS max_h
FROM x7
"""


def lineage_a6_sql() -> str:
    """Global rollup of the per-partition lineage (A6): the partition
    ids/checksums are runtime artifacts, but the rollup — row total,
    partition count (repartition(8) always yields 8 tasks, empty ones
    included: mapInPandas emits a row per task), and the global
    url_key range (xxhash64 seed 42, same chain as U4) — is exact."""
    urls = (
        "SELECT 'http://host' || (c_custkey % 37)::VARCHAR"
        " || '.example/c/' || c_custkey::VARCHAR AS url FROM customer"
    )
    return f"""
WITH inputs AS ({urls}),{xxhash64_ctes("inputs", "url", out="h")}
SELECT count(*) AS total_rows, CAST(8 AS BIGINT) AS n_parts,
       min(h) AS global_min_key, max(h) AS global_max_key
FROM x7
"""


def host_bucket_u5_sql(buckets: int = 32) -> str:
    hosts = (
        "SELECT 'host' || (c_custkey % 37)::VARCHAR || '.example' AS host"
        " FROM customer"
    )
    return f"""
WITH inputs AS ({hosts}),{xxhash64_ctes("inputs", "host", out="h")}
SELECT ({pmod('h', buckets)})::INT AS bucket,
       count(*) AS n, count(DISTINCT host) AS n_hosts
FROM x7 GROUP BY 1
"""


def salt_u6_sql(buckets: int = 8) -> str:
    urls = (
        "SELECT 'http://mega.example/o/' || o_orderkey::VARCHAR AS url"
        " FROM orders"
    )
    return f"""
WITH inputs AS ({urls}),{xxhash64_ctes("inputs", "url", out="h")},
by_bucket AS (
  SELECT {pmod('h', buckets)} AS s, count(*) AS cnt FROM x7 GROUP BY 1
)
SELECT count(*) AS n_buckets, min(cnt) AS min_n, max(cnt) AS max_n
FROM by_bucket
"""


def sample_stratified_sql(rates: dict[str, float],
                          default_rate: float = 0.0,
                          salt: str = "") -> str:
    """Deterministic stratified sample over `documents`, mirroring
    lectura/sampling.py:stratified_sample — keep iff
    pmod(xxhash64(doc_id || '|' || salt), 1e6) < rate(lang) * 1e6."""
    res = 1_000_000
    cases = " ".join(
        f"WHEN lang = '{v}' THEN {int(r * res)}"
        for v, r in sorted(rates.items())
    )
    inputs = (f"SELECT doc_id, lang, n_chars,"
              f" doc_id::VARCHAR || '|{salt}' AS k FROM documents")
    # `hashed` MUST be MATERIALIZED: filtering directly on x7.h makes
    # DuckDB's optimizer inline the whole hash expression tree into the
    # predicate (exponential planning time); the barrier keeps the hash
    # a plain column.
    return f"""
WITH inputs AS ({inputs}),{xxhash64_ctes("inputs", "k", out="h")},
hashed AS MATERIALIZED (SELECT doc_id, lang, n_chars, h FROM x7)
SELECT doc_id, lang, n_chars
FROM hashed
WHERE {pmod('h', res)} < CASE {cases} ELSE {int(default_rate * res)} END
"""


def shard_pack_sql(budget: int) -> str:
    """Per-shard rollup of the token-budget shard packing over
    `documents` (order by doc_id, weight n_chars), mirroring
    lectura/sampling.py:pack_shards — shard_id = floor(exclusive global
    prefix sum / budget)."""
    return f"""
WITH packed AS (
  SELECT doc_id, n_chars,
         CAST((sum(n_chars) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - n_chars) // {budget} AS BIGINT) AS shard_id
  FROM documents
)
SELECT shard_id, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_weight,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM packed GROUP BY 1
"""


def _shingle_ctes(n: int, distinct: bool = True,
                  where: str = "TRUE") -> str:
    """CTEs `words` → `shr` producing (doc_id, s) word n-grams over
    `documents`, mirroring textops word_ngrams/_gram_stream: slice-of-n
    join, short docs yield their full-word join, empty grams dropped;
    DISTINCT per doc iff `distinct`."""
    d = "DISTINCT " if distinct else ""
    return f"""words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE {where}
), sh_all AS (
  SELECT {d}doc_id,
         unnest([array_to_string(w[i:i+{n - 1}], ' ')
                 for i in generate_series(1, greatest(len(w) - {n - 1}, 1))]) AS s
  FROM words
), shr AS (SELECT doc_id, s FROM sh_all WHERE s <> '')"""


def contamination_sql(n: int = 3, bench_mod: int = 7) -> str:
    """Benchmark-decontamination oracle: corpus = doc_id % bench_mod
    != 0, benchmark = the rest; per contaminated corpus doc, distinct
    shared n-grams and distinct benchmark docs hit (mirrors
    textops.contamination_stats)."""
    return f"""
WITH {_shingle_ctes(n)}
SELECT d.doc_id,
       count(DISTINCT d.s) AS n_hit_shingles,
       count(DISTINCT b.doc_id) AS n_bench_docs
FROM shr d JOIN shr b ON d.s = b.s
WHERE d.doc_id % {bench_mod} <> 0 AND b.doc_id % {bench_mod} = 0
GROUP BY d.doc_id
"""


def dsir_sql(n: int = 2, n_buckets: int = 256, bench_mod: int = 7) -> str:
    """DSIR importance-weight oracle (mirrors sampling.dsir_logratios):
    target = doc_id % bench_mod == 0 (the quality reference), corpus =
    the rest; word n-grams hashed into `n_buckets` via the pure-SQL
    xxhash64 chain (DISTINCT grams hashed once, joined back to the
    occurrence stream); per-bucket add-one-smoothed log-ratios rounded
    to 9dp before the per-doc sum, final sum to 4dp (+0.0 folds
    IEEE −0.0) — the same two-stage rounding the Spark side applies."""
    return f"""
WITH {_shingle_ctes(n, distinct=False)},
dg AS (SELECT DISTINCT s FROM shr),
{xxhash64_ctes('dg', 's', out='xx', p='x')},
hb AS (SELECT s, {pmod('xx', n_buckets)} AS b FROM x7),
occ AS (SELECT doc_id, b FROM shr JOIN hb USING (s)),
occ_c AS (SELECT doc_id, b FROM occ WHERE doc_id % {bench_mod} <> 0),
occ_t AS (SELECT b FROM occ WHERE doc_id % {bench_mod} = 0),
raw AS (SELECT b, count(*) AS cr FROM occ_c GROUP BY b),
tgt AS (SELECT b, count(*) AS ct FROM occ_t GROUP BY b),
tot AS (SELECT (SELECT count(*) FROM occ_c) AS tr,
               (SELECT count(*) FROM occ_t) AS tt),
w AS (
  SELECT r.b,
         round(ln((coalesce(t.ct, 0) + 1.0) / (tot.tt + {n_buckets}))
               - ln((r.cr + 1.0) / (tot.tr + {n_buckets})), 9) AS lw
  FROM raw r LEFT JOIN tgt t USING (b), tot
)
SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       round(sum(lw), 4) + 0.0 AS logratio
FROM occ_c o JOIN w USING (b)
GROUP BY o.doc_id
"""


def dup_span_sql(k: int = 5) -> str:
    """Cross-document duplicated-span oracle (mirrors
    textops.dup_span_stats): k-word windows with multiplicity, distinct
    grams hashed once through the pure-SQL xxhash64 chain, a span is
    duplicated iff it occurs in ≥ 2 distinct documents."""
    return f"""
WITH {_shingle_ctes(k, distinct=False)},
dg AS (SELECT DISTINCT s FROM shr),
{xxhash64_ctes('dg', 's', out='xx', p='x')},
hb AS (SELECT s, xx AS h FROM x7),
occ AS (SELECT doc_id, h FROM shr JOIN hb USING (s)),
sdf AS (SELECT h, count(DISTINCT doc_id) AS d FROM occ GROUP BY h)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       round(CAST(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS dup_span_frac
FROM occ JOIN sdf USING (h)
GROUP BY doc_id
"""


def dup_span_removal_sql(k: int = 5) -> str:
    """Span-removal oracle (mirrors textops.remove_dup_spans): k-word
    windows positioned 1-based, a window is duplicated iff its gram
    occurs in ≥ 2 distinct documents (distinct grams hashed once
    through the pure-SQL xxhash64 chain, same rule as dup_span_sql),
    a token is removed iff any duplicated window covers it, survivors
    re-join on single spaces in position order."""
    return f"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
), posx AS (
  SELECT doc_id, w,
         unnest(generate_series(1, greatest(len(w) - {k - 1}, 1))) AS i
  FROM words
), g AS (
  SELECT doc_id, i, array_to_string(w[i:i+{k - 1}], ' ') AS s
  FROM posx WHERE array_to_string(w[i:i+{k - 1}], ' ') <> ''
), dg AS (SELECT DISTINCT s FROM g),
{xxhash64_ctes('dg', 's', out='xx', p='x')},
occ AS (SELECT doc_id, i, xx AS h FROM g JOIN x7 USING (s)),
sdf AS (
  SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS d FROM occ
                 GROUP BY h) WHERE d >= 2
), cov AS (
  SELECT DISTINCT doc_id, j FROM (
    SELECT o.doc_id, unnest(generate_series(o.i, o.i + {k - 1})) AS j
    FROM occ o JOIN sdf USING (h))
), tok AS (
  SELECT doc_id, unnest(w) AS t,
         unnest(generate_series(1, len(w))) AS j
  FROM words
)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(c.j) AS BIGINT) AS n_removed,
       coalesce(string_agg(CASE WHEN c.j IS NULL THEN t.t END,
                           ' ' ORDER BY t.j), '') AS text_clean
FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.j = c.j
GROUP BY t.doc_id
"""


def repetition_sql(n: int = 2) -> str:
    """Gopher-style repetition signals per doc (mirrors
    textops.repetition_stats): word-level duplicate fraction plus the
    occurrence share of the modal word n-gram and the duplicate-n-gram
    occurrence fraction."""
    return f"""
WITH {_shingle_ctes(n, distinct=False)},
wstats AS (
  SELECT doc_id, len(w) AS n_words,
         1 - len(list_distinct(w)) / len(w) AS dup_word_frac
  FROM words
), cnt AS (
  SELECT doc_id, s, count(*) AS c FROM shr GROUP BY 1, 2
), gstats AS (
  SELECT doc_id, max(c) / sum(c) AS top_ngram_frac,
         1 - count(*) / sum(c) AS dup_ngram_frac
  FROM cnt GROUP BY 1
)
SELECT w.doc_id, n_words, dup_word_frac,
       coalesce(top_ngram_frac, 0.0) AS top_ngram_frac,
       coalesce(dup_ngram_frac, 0.0) AS dup_ngram_frac
FROM wstats w LEFT JOIN gstats USING (doc_id)
"""


def dedup_minhash_lsh_sql(k: int = 32, bands: int = 8, n: int = 3,
                          min_est_jaccard: float = 0.5,
                          max_doc_id: int = 300) -> str:
    """MinHash+LSH pairs, faithfully mirroring textops.minhash_lsh_pairs:
    word n-gram shingles (DISTINCT per doc), shingle hash =
    pmod(xxhash64(shingle), p), K permutation mins, band buckets =
    xxhash64 of the comma-joined row slice, candidate pairs by (band,
    bucket) equi-join, est_jaccard = matching-position fraction."""
    from lectura.pure.fingerprint import minhash_params

    r = k // bands
    params = minhash_params(k)
    mins = ",\n".join(
        f"    min(({a}::BIGINT * sh + {b}) % {_MH_P}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    sig_arr = "[" + ", ".join(f"m{i}" for i in range(k)) + "]"
    band_strs = ",\n".join(
        "    ("
        + " || ',' || ".join(f"m{bi * r + j}::VARCHAR" for j in range(r))
        + f") AS band{bi}"
        for bi in range(bands)
    )
    band_unpivot = " UNION ALL ".join(
        f"SELECT id, sig, {bi} AS band, band{bi} AS bstr FROM sigs"
        for bi in range(bands)
    )
    # shingles: mirror word_ngrams (slice-of-n join; short docs produce
    # their full-word join; empty shingles dropped; DISTINCT per doc)
    return f"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE doc_id < {max_doc_id}
), sh_all AS (
  SELECT DISTINCT doc_id,
         unnest([array_to_string(w[i:i+{n - 1}], ' ')
                 for i in generate_series(1, greatest(len(w) - {n - 1}, 1))]) AS s
  FROM words
), shingle_rows AS (SELECT doc_id, s FROM sh_all WHERE s <> ''),
svocab AS (SELECT DISTINCT s FROM shingle_rows),
{xxhash64_ctes("svocab", "s", out="sxx", p="sx").lstrip()},
shash AS (SELECT s, {pmod('sxx', _MH_P)} AS sh FROM sx7),
mh AS (
  SELECT r.doc_id AS id,
{mins}
  FROM shingle_rows r JOIN shash USING (s) GROUP BY r.doc_id
), sigs AS (
  SELECT id, {sig_arr} AS sig,
{band_strs}
  FROM mh
), band_rows AS ({band_unpivot}),
{xxhash64_ctes("band_rows", "bstr", out="bucket", p="bx").lstrip()},
cand AS (
  SELECT DISTINCT a.id AS d1, b.id AS d2,
         a.sig AS sig1, b.sig AS sig2
  FROM bx7 a JOIN bx7 b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
)
SELECT d1, d2,
       round(length(list_filter(range(1, {k + 1}),
                                i -> sig1[i] = sig2[i])) / {float(k)}, 4)
         AS est_jaccard
FROM cand
WHERE round(length(list_filter(range(1, {k + 1}),
                               i -> sig1[i] = sig2[i])) / {float(k)}, 4)
      >= {min_est_jaccard}
"""


def simhash_clusters_sql(max_hamming: int = 3, max_doc_id: int = 300) -> str:
    """Near-dup clusters = transitive closure over the simhash pair graph
    (pigeonhole banding is lossless at hamming ≤ 3, so closure over the
    banded pairs equals closure over the true ≤-hamming graph), plus
    singletons; one row per cluster (keeper = min doc_id, member count).
    Mirrors lectura/export.py's exact-then-near dedup clustering stage."""
    pairs = dedup_simhash_sql(max_hamming=max_hamming, max_doc_id=max_doc_id)
    return f"""
WITH RECURSIVE edges0 AS ({pairs}),
und AS (SELECT d1 AS u, d2 AS v FROM edges0 UNION SELECT d2, d1 FROM edges0),
reach(a, b) AS (
  SELECT u, v FROM und
  UNION
  SELECT r.a, u2.v FROM reach r JOIN und u2 ON r.b = u2.u
),
labels AS (SELECT a AS node, least(a, min(b)) AS component
           FROM reach GROUP BY a),
alldocs AS (SELECT doc_id FROM documents WHERE doc_id < {max_doc_id}),
lab2 AS (
  SELECT d.doc_id, coalesce(l.component, d.doc_id) AS component
  FROM alldocs d LEFT JOIN labels l ON l.node = d.doc_id
)
SELECT component AS keep_doc_id, count(*) AS n_members
FROM lab2 GROUP BY 1
"""


def lm_ppl_sql(max_vocab: int = 24, bench_mod: int = 7) -> str:
    """CCNet-style unigram-LM quality score oracle (mirrors
    textops.lm_perplexity): reference split = doc_id % bench_mod == 0,
    vocabulary rank-capped at `max_vocab` by (count DESC, term ASC),
    add-one smoothing over (T + V + 1) with a shared OOV probability,
    per-token log-probs rounded 9dp, per-doc mean 4dp, head/middle/tail
    by ntile(3) on (avg_logp DESC, doc_id)."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
           t -> t <> '')) AS term
  FROM documents
), vocab AS (
  SELECT term, count(*) AS c FROM toks
  WHERE doc_id % {bench_mod} = 0 GROUP BY 1
), kept AS (
  SELECT term, c FROM (
    SELECT term, c,
           row_number() OVER (ORDER BY c DESC, term ASC) AS r
    FROM vocab) WHERE r <= {max_vocab}
), tot AS (SELECT sum(c) AS t, count(*) AS v FROM kept),
model AS (
  SELECT term, round(ln((c + 1.0) / (t + v + 1.0)), 9) AS lp
  FROM kept, tot
), oov AS (SELECT round(ln(1.0 / (t + v + 1.0)), 9) AS lp FROM tot),
scored AS (
  SELECT doc_id, count(*) AS n_tokens,
         round(sum(coalesce(m.lp, (SELECT lp FROM oov))) / count(*), 4)
           + 0.0 AS avg_logp
  FROM toks LEFT JOIN model m USING (term)
  WHERE doc_id % {bench_mod} <> 0
  GROUP BY doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, avg_logp,
       CASE ntile(3) OVER (ORDER BY avg_logp DESC, doc_id ASC)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM scored
"""


def c4_rules_sql(min_words: int = 3, min_kept_lines: int = 2) -> str:
    """C4 heuristic-cleaning oracle (mirrors textops.c4_quality_rules)
    over a line-structured doc CONSTRUCTED inside the query (the
    sitemap_parse_s11 pattern — fixture text has no newlines): line 1
    always terminal-punctuated, line 2 punctuated on even doc ids,
    'buy now.' trips the word-count rule, and doc_id % {13,11,17,5}
    plant lorem / brace / javascript / policy lines."""
    return f"""
WITH built AS (
  SELECT doc_id,
    concat_ws(chr(10),
      substr(text, 1, 60) || '.',
      CASE WHEN doc_id % 2 = 0 THEN substr(text, 61, 50) || ' ok?'
           ELSE substr(text, 61, 50) END,
      'buy now.',
      CASE WHEN doc_id % 13 = 0 THEN 'lorem ipsum dolor sit amet.' END,
      CASE WHEN doc_id % 11 = 0 THEN 'var config = {{ x: 1 }};' END,
      CASE WHEN doc_id % 17 = 0
           THEN 'please enable javascript to continue reading.' END,
      CASE WHEN doc_id % 5 = 0
           THEN 'we use cookies and this privacy policy applies here.' END
    ) AS t2
  FROM documents
), kept AS (
  SELECT doc_id, t2, string_split(t2, chr(10)) AS ls,
         list_filter(string_split(t2, chr(10)), l ->
           regexp_matches(trim(l), '[.!?"]$')
           AND len(string_split_regex(trim(l), '\\s+')) >= {min_words}
           AND NOT contains(lower(l), 'javascript')
           AND NOT regexp_matches(lower(l),
                                  'terms of use|privacy policy|cookie')
         ) AS kl
  FROM built
)
SELECT doc_id,
       CAST(len(ls) AS BIGINT) AS n_lines,
       CAST(len(kl) AS BIGINT) AS n_kept_lines,
       contains(lower(t2), 'lorem ipsum') AS has_lorem,
       contains(t2, '{{') AS has_brace,
       (len(kl) >= {min_kept_lines}
        AND NOT contains(lower(t2), 'lorem ipsum')
        AND NOT contains(t2, '{{')) AS keep,
       array_to_string(kl, chr(10)) AS text_clean
FROM kept
"""


def domain_quality_sql(low_q_threshold: float = 0.05,
                       max_low_frac: float = 0.5) -> str:
    """Domain-level quality-aggregation oracle (mirrors
    textops.domain_quality_agg): per-doc stopword ratio pre-rounded to
    4dp (NULL for token-free docs), per-domain means/fractions to 4dp,
    keep = low_q_frac <= threshold with NULL -> false, tertile bucket
    on (mean_stop_ratio DESC NULLS LAST, source)."""
    return f"""
WITH w AS (
  SELECT source,
         CASE WHEN len(string_split_regex(trim(text), '\\s+')) > 0
              THEN round(CAST(len(regexp_extract_all(text,
                     '\\b(the|and|of|to|a|in|is|for|on|with)\\b'))
                     AS DOUBLE)
                   / len(string_split_regex(trim(text), '\\s+')), 4)
         END AS ratio
  FROM documents
), agg AS (
  SELECT source, count(*) AS n_docs, count(ratio) AS n_scored,
         round(avg(ratio), 4) AS mean_stop_ratio,
         CASE WHEN count(ratio) > 0 THEN
           round(CAST(sum(CASE WHEN ratio < {low_q_threshold} THEN 1
                               ELSE 0 END) AS DOUBLE) / count(ratio), 4)
         END AS low_q_frac
  FROM w GROUP BY source
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_scored AS BIGINT) AS n_scored, mean_stop_ratio, low_q_frac,
       coalesce(low_q_frac <= {max_low_frac}, false) AS keep,
       CASE ntile(3) OVER (ORDER BY mean_stop_ratio DESC NULLS LAST,
                           source ASC)
         WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM agg
"""


def gopher_rules_sql(min_words: int = 10, max_words: int = 500,
                     min_mean_len: float = 3.0,
                     max_mean_len: float = 10.0,
                     max_symbol_ratio: float = 0.1,
                     max_bullet_frac: float = 0.9,
                     max_ellipsis_frac: float = 0.3,
                     min_alpha_frac: float = 0.8,
                     min_required_stops: int = 2) -> str:
    """Gopher non-repetition quality-gate oracle (mirrors
    textops.gopher_rules) over planted docs CONSTRUCTED inside the
    query: mutually-exclusive doc_id classes exercise every rule —
    %19 empty, %13 symbol/number spam, %11 too short, %7 ellipsis
    lines, %5 all-bullet lines, %3 missing required stopwords, else
    clean (verified in DuckDB: only the clean class keeps)."""
    req = " + ".join(
        "CASE WHEN regexp_matches(lower(t2), '\\b" + w + "\\b') "
        "THEN 1 ELSE 0 END"
        for w in ["the", "be", "to", "of", "and", "that", "have", "with"]
    )
    return f"""
WITH built AS (
  SELECT doc_id, CASE
    WHEN doc_id % 19 = 0 THEN ''
    WHEN doc_id % 13 = 0 THEN trim(repeat('data11 ### ', 10))
    WHEN doc_id % 11 = 0 THEN substr(text, 1, 30)
    WHEN doc_id % 7 = 0 THEN concat_ws(chr(10),
      substr(text, 1, 100) || ' see more...',
      substr(text, 101, 100) || ' read on...',
      'the data and that batch have with luck to be of use.')
    WHEN doc_id % 5 = 0 THEN concat_ws(chr(10),
      '- ' || substr(text, 1, 80) || '.',
      '- the data and that batch.',
      '- have with luck to be of use.')
    WHEN doc_id % 3 = 0 THEN text
    ELSE text || ' the data and that batch have run with care to be of use.'
    END AS t2
  FROM documents
), sig AS (
  SELECT doc_id, t2,
    list_filter(string_split_regex(trim(t2), '\\s+'), w -> w <> '') AS ws,
    string_split(t2, chr(10)) AS ls
  FROM built
), m AS (
  SELECT doc_id,
    CAST(len(ws) AS BIGINT) AS n_words,
    CASE WHEN len(ws) > 0 THEN
      round(CAST(list_aggregate(list_transform(ws, w -> len(w)), 'sum')
                 AS DOUBLE) / len(ws), 4) END AS mean_word_len,
    CASE WHEN len(ws) > 0 THEN
      round(CAST((len(t2) - len(replace(t2, '#', '')))
                 + (len(t2) - len(replace(t2, '...', ''))) // 3
                 AS DOUBLE) / len(ws), 4) END AS symbol_ratio,
    round(CAST(len(list_filter(ls, l ->
            regexp_matches(trim(l), '^(-|\\*|•) '))) AS DOUBLE)
          / len(ls), 4) AS bullet_frac,
    round(CAST(len(list_filter(ls, l ->
            regexp_matches(trim(l), '(\\.\\.\\.|…)$'))) AS DOUBLE)
          / len(ls), 4) AS ellipsis_frac,
    CASE WHEN len(ws) > 0 THEN
      round(CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))
                 AS DOUBLE) / len(ws), 4) END AS alpha_frac,
    CAST(({req}) AS BIGINT) AS n_required_stops
  FROM sig
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
       ellipsis_frac, alpha_frac, n_required_stops,
       coalesce(n_words >= {min_words} AND n_words <= {max_words}
         AND mean_word_len >= {min_mean_len}
         AND mean_word_len <= {max_mean_len}
         AND symbol_ratio <= {max_symbol_ratio}
         AND bullet_frac <= {max_bullet_frac}
         AND ellipsis_frac <= {max_ellipsis_frac}
         AND alpha_frac >= {min_alpha_frac}
         AND n_required_stops >= {min_required_stops}, false) AS keep
FROM m
"""


def cms_sql(candidates: list[str], k: int = 10, d: int = 4,
            w: int = 1024) -> str:
    """Count-min-sketch oracle (mirrors textops.cms_heavy_hitters):
    DISTINCT corpus terms ∪ candidates hashed once per sketch row via
    the pure-SQL xxhash64 chain on `term || '|' || r`; counters from
    the occurrence stream joined back; estimate = min over rows of the
    candidate's counters (0 when a bucket is empty)."""
    # quote-escape + first-occurrence dedup, matching the Spark side's
    # dedup so a repeated candidate cannot rank twice on one engine only
    seen: list[str] = []
    for t in candidates:
        if t not in seen:
            seen.append(t)
    vals = ", ".join("('" + t.replace("'", "''") + "')" for t in seen)
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(
           string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
           t -> t <> '')) AS term
  FROM documents
), cand AS (SELECT * FROM (VALUES {vals}) c(term)),
dg AS (SELECT DISTINCT term FROM toks UNION SELECT term FROM cand),
reps AS (SELECT term, r, term || '|' || CAST(r AS VARCHAR) AS s
         FROM dg, range(0, {d}) t(r)),
{xxhash64_ctes('reps', 's')},
hb AS (SELECT term, r, {pmod('xx', w)} AS bucket FROM x7),
counters AS (
  SELECT r, bucket, count(*) AS cnt
  FROM toks JOIN hb USING (term) GROUP BY 1, 2
), est AS (
  SELECT c.term, CAST(min(coalesce(k.cnt, 0)) AS BIGINT) AS est
  FROM cand c JOIN hb USING (term)
  LEFT JOIN counters k USING (r, bucket)
  GROUP BY 1
), ranked AS (
  SELECT term, est, row_number() OVER (ORDER BY est DESC, term) AS rank
  FROM est
)
SELECT term, est, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def zorder_sql(src: str, xcol: str, ycol: str, keep: str) -> str:
    """Morton-key oracle (mirrors sources.zorder_key): the identical
    five-step shift/mask bit-spreading chain on 31-bit-masked inputs,
    x in even bit positions, y in odd — pure BIGINT arithmetic, so both
    engines compute the key exactly."""
    steps = ((16, 281470681808895), (8, 71777214294589695),
             (4, 1085102592571150095), (2, 3689348814741910323),
             (1, 6148914691236517205))
    # CAST first: the Spark twin casts to long before masking; without it
    # a 32-bit INTEGER column overflows DuckDB's left shift at step one
    ctes = [f"z0 AS (SELECT {keep}, "
            f"(CAST({xcol} AS BIGINT) & 2147483647) AS sx, "
            f"(CAST({ycol} AS BIGINT) & 2147483647) AS sy FROM {src})"]
    for i, (s, m) in enumerate(steps):
        ctes.append(
            f"z{i + 1} AS (SELECT {keep}, "
            f"((sx | (sx << {s})) & {m}) AS sx, "
            f"((sy | (sy << {s})) & {m}) AS sy FROM z{i})")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT {keep}, (sx | (sy << 1)) AS zkey FROM z{len(steps)}")
