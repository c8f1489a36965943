"""Corpus selection operators (lectura/sampling.py): hash-sample
determinism/nesting, exact-prefix-sum shard packing invariant to the
partition count, both vs pure-Python references."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lectura.sampling import pack_shards, stratified_sample


@pytest.fixture(scope="module")
def docs(spark):
    rows = [{"doc_id": i, "lang": ("en", "de", "fr")[i % 3],
             "w": 10 + (i * 37) % 90} for i in range(400)]
    return spark.createDataFrame(pd.DataFrame(rows),
                                 schema="doc_id long, lang string, w long")


def test_stratified_sample_deterministic_and_stratified(spark, docs):
    rates = {"en": 0.6, "de": 0.2}
    a = {r.doc_id for r in
         stratified_sample(docs, "doc_id", rates, "lang",
                           default_rate=0.1, salt="s1").collect()}
    b = {r.doc_id for r in
         stratified_sample(docs, "doc_id", rates, "lang",
                           default_rate=0.1, salt="s1").collect()}
    assert a == b and a  # deterministic, non-empty
    by_lang = {r.doc_id: r.lang for r in docs.collect()}
    n = {"en": 0, "de": 0, "fr": 0}
    for d in a:
        n[by_lang[d]] += 1
    tot = {"en": 134, "de": 133, "fr": 133}
    # hash-uniformity at n≈134: observed rate within ±0.15 of configured
    assert abs(n["en"] / tot["en"] - 0.6) < 0.15
    assert abs(n["de"] / tot["de"] - 0.2) < 0.15
    assert abs(n["fr"] / tot["fr"] - 0.1) < 0.15


def test_stratified_sample_nested_rates_and_salt_independence(spark, docs):
    lo = {r.doc_id for r in
          stratified_sample(docs, "doc_id", {"en": 0.3}, "lang",
                            salt="s1").collect()}
    hi = {r.doc_id for r in
          stratified_sample(docs, "doc_id", {"en": 0.7}, "lang",
                            salt="s1").collect()}
    assert lo <= hi                      # rate increase only adds rows
    other = {r.doc_id for r in
             stratified_sample(docs, "doc_id", {"en": 0.3}, "lang",
                               salt="s2").collect()}
    assert other != lo                   # new salt = independent draw


def test_pack_shards_exact_prefix_sum_and_partition_invariance(spark, docs):
    rows = sorted((r.doc_id, r.w) for r in docs.collect())
    run, want = 0, {}
    for did, w in rows:
        want[did] = run // 1000
        run += w
    for n_parts in (1, 7, 32):
        got = {r.doc_id: r.shard_id for r in
               pack_shards(docs, "doc_id", "w", budget=1000,
                           n_parts=n_parts).collect()}
        assert got == want, f"n_parts={n_parts}"


def test_pack_shards_single_data_movement(spark, docs):
    plan = (
        pack_shards(docs, "doc_id", "w", budget=1000, n_parts=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the range partition is the ONLY exchange: no empty-partitionBy
    # window (SinglePartition) and no second hash exchange on _pid —
    # the prefix sum finishes in a narrow in-partition Arrow pass
    assert "SinglePartition" not in plan
    assert plan.count("Exchange") == 0  # input is a localCheckpoint RDD
    assert "MapInPandas" in plan and "Window" not in plan


def test_pack_shards_output_contiguous_by_shard(spark, docs):
    """Each output partition holds a contiguous shard_id range — the
    training-shard layout falls out of the pack itself (no extra
    repartition needed before writing)."""
    packed = pack_shards(docs, "doc_id", "w", budget=500, n_parts=8)

    def per_part(it):
        import pandas as pd
        for pdf in it:
            if len(pdf):
                yield pd.DataFrame({"lo": [pdf.shard_id.min()],
                                    "hi": [pdf.shard_id.max()]})

    spans = sorted((r.lo, r.hi) for r in
                   packed.mapInPandas(per_part, "lo long, hi long").collect())
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # ranges ordered and non-interleaved


def test_stratified_sample_nesting_property(spark, docs):
    """Hypothesis-style sweep of the nesting invariant: for ANY rate
    pair r1 <= r2 and any salt, sample(r1) ⊆ sample(r2) — the property
    incremental corpus re-mixes rely on."""
    import itertools

    rates = [0.0, 0.05, 0.17, 0.33, 0.5, 0.81, 1.0]
    salts = ["", "a", "mix-7"]
    sets = {
        (r, s): {row.doc_id for row in
                 stratified_sample(docs, "doc_id", {"en": r, "de": r},
                                   "lang", default_rate=r, salt=s)
                 .collect()}
        for r in rates for s in salts
    }
    for s in salts:
        for r1, r2 in itertools.combinations(rates, 2):  # r1 < r2
            assert sets[(r1, s)] <= sets[(r2, s)], (r1, r2, s)
        assert sets[(0.0, s)] == set()
        assert len(sets[(1.0, s)]) == 400


def test_dsir_logratios_matches_pure(spark):
    """Pure-Python reference for the DSIR scoring pass: hashed-bigram
    occurrence streams (buckets from the same Spark xxhash64 the
    operator uses), add-one-smoothed per-bucket log-ratios rounded to
    9dp, per-doc sums rounded to 4dp. Also checks the semantics: a doc
    of target-favored grams outscores a corpus-only doc."""
    import math

    from lectura.sampling import dsir_logratios

    corpus_rows = [(1, "a b a b c"), (2, "c d c d e"), (3, "x"), (4, "")]
    target_rows = [(10, "a b a b"), (11, "a b c")]
    n_buckets = 16
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    target = spark.createDataFrame(target_rows, "doc_id long, text string")

    got = {r.doc_id: (r.n_grams, r.logratio)
           for r in dsir_logratios(corpus, target, n=2,
                                   n_buckets=n_buckets).collect()}

    # reference gram stream (mirrors _gram_stream slice semantics: a doc
    # shorter than n yields its full-word join; empty grams dropped)
    def grams(text, n=2):
        w = text.split()
        if not w:
            return []
        if len(w) < n:
            return [" ".join(w)]
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    all_grams = sorted({g for _, t in corpus_rows + target_rows
                        for g in grams(t)})
    hdf = spark.createDataFrame([(g,) for g in all_grams], "g string")
    bucket = {r.g: r.b for r in hdf.select(
        "g", F.pmod(F.xxhash64("g"), F.lit(n_buckets)).alias("b")).collect()}

    occ_c = [(d, bucket[g]) for d, t in corpus_rows for g in grams(t)]
    occ_t = [bucket[g] for _, t in target_rows for g in grams(t)]
    cr, ct = {}, {}
    for _, b in occ_c:
        cr[b] = cr.get(b, 0) + 1
    for b in occ_t:
        ct[b] = ct.get(b, 0) + 1
    tr, tt = len(occ_c), len(occ_t)
    lw = {b: round(math.log((ct.get(b, 0) + 1.0) / (tt + n_buckets))
                   - math.log((c + 1.0) / (tr + n_buckets)), 9)
          for b, c in cr.items()}
    want = {}
    for d, t in corpus_rows:
        g = grams(t)
        if g:
            want[d] = (len(g), round(sum(lw[bucket[x]] for x in g), 4) + 0.0)
    assert got == want
    assert 4 not in got                       # empty doc yields no grams
    # doc 1 shares "a b"/"b c" mass with the target; doc 2 has none of it
    assert got[1][1] > got[2][1]


def test_weighted_sample_es_properties(spark):
    """Efraimidis–Spirakis invariants: same salt ⇒ identical draw
    (idempotent, partition-invariant); higher weight at a fixed key ⇒
    rank never worsens; NULL/non-positive weights never selected;
    across many salts the heavy row wins k=1 far more often than a
    light one; plan is a distributed partial top-k."""
    import pyspark.sql.functions as F

    from lectura.sampling import weighted_sample

    rows = [(1, 1000.0), (2, 1.0), (3, 1.0), (4, None), (5, -2.0),
            (6, 0.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    out = weighted_sample(df, "id", "w", k=3, salt="a")
    got = [(r.id, r.rank) for r in out.collect()]
    assert len(got) == 3 and {g[0] for g in got} <= {1, 2, 3}
    again = [(r.id, r.rank) for r in
             weighted_sample(df.repartition(16), "id", "w", k=3,
                             salt="a").collect()]
    assert again == got

    # weight monotonicity at fixed key: raising id 2's weight can only
    # improve (never worsen) its rank position
    df2 = spark.createDataFrame(
        [(1, 1000.0), (2, 500.0), (3, 1.0)], "id long, w double")
    r1 = {r.id: r.rank for r in
          weighted_sample(df, "id", "w", k=3, salt="a").collect()}
    r2 = {r.id: r.rank for r in
          weighted_sample(df2, "id", "w", k=3, salt="a").collect()}
    assert r2.get(2, 99) <= r1.get(2, 99)

    # statistics across salts: the 1000x row takes k=1 almost always
    wins = 0
    for i in range(30):
        top = weighted_sample(df, "id", "w", k=1,
                              salt=f"s{i}").collect()[0].id
        wins += top == 1
    assert wins >= 25, wins

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_prefix_rank_edges_empty_single_and_limit_prune(spark):
    """prefix_rank edge cases the crawl loop can hit: an EMPTY kept set
    (a round that schedules nothing) must return an empty frame with
    the rank column, not crash on the empty offset map; a single row
    ranks 1; the limit prunes partitions whose offset already exceeds
    it while keeping the rank exact."""
    from lectura.sampling import prefix_rank

    order = [F.desc("score"), F.asc("url")]
    empty = spark.createDataFrame([], "url string, score double")
    out = prefix_rank(empty, order, rank_col="r", limit=10)
    assert out.columns == ["url", "score", "r"] and out.count() == 0

    one = spark.createDataFrame([("u", 1.0)], "url string, score double")
    assert [tuple(r) for r in prefix_rank(one, order, rank_col="r")
            .collect()] == [("u", 1.0, 1)]

    rows = [(f"u{i:03d}", float(i % 13)) for i in range(300)]
    df = spark.createDataFrame(rows, "url string, score double")
    got = {(r.url, r.r) for r in
           prefix_rank(df, order, rank_col="r", limit=25).collect()}
    want = {(u, i + 1) for i, (u, s) in enumerate(
        sorted(rows, key=lambda x: (-x[1], x[0]))[:25])}
    assert got == want
