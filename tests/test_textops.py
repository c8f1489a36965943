"""Dedup / similarity / fingerprint operators: planted-duplicate recall,
pure-function parity, ANN recall vs brute force."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lectura.pure.fingerprint import (
    hamming64,
    jaccard,
    minhash_signature,
    rolling_fingerprint,
    shingles,
    simhash64,
)


@pytest.fixture(scope="module")
def planted(spark):
    """60 base docs + near-duplicate copies of the first 10 (one word
    changed) + exact copies of the next 5."""
    import random

    rng = random.Random(7)
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    base = [
        " ".join(rng.choice(vocab) for _ in range(60)) for _ in range(60)
    ]
    rows = [(i, t) for i, t in enumerate(base)]
    for j in range(10):  # near-dups: ids 100+j ~ j
        w = base[j].split()
        w[5] = "CHANGED"
        rows.append((100 + j, " ".join(w)))
    for j in range(10, 15):  # exact dups: ids 200+j ~ j
        rows.append((200 + j, base[j]))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        schema="doc_id long, text string",
    )


def test_exact_dedup_groups(spark, planted):
    groups = (
        planted.groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keep"))
        .filter(F.col("n") > 1)
        .collect()
    )
    assert {(r.keep, r.n) for r in groups} == {(j, 2) for j in range(10, 15)}


def test_minhash_lsh_finds_planted(spark, planted):
    from lectura.textops import minhash_lsh_pairs

    pairs = {
        (r.d1, r.d2)
        for r in minhash_lsh_pairs(planted, k=32, bands=8,
                                   min_est_jaccard=0.5).collect()
    }
    for j in range(10):
        assert (j, 100 + j) in pairs, f"near-dup {j} missed"
    for j in range(10, 15):
        assert (j, 200 + j) in pairs, f"exact dup {j} missed"
    # no wildly-false positives: every reported pair has real jaccard ≥ 0.3
    texts = {r.doc_id: r.text for r in planted.collect()}
    for d1, d2 in pairs:
        assert jaccard(shingles(texts[d1]), shingles(texts[d2])) >= 0.3


def test_simhash_finds_planted_and_matches_pure(spark, planted):
    from lectura.textops import simhash_pairs, simhash_udf

    got = {r.doc_id: r.sh for r in
           planted.select("doc_id", simhash_udf("text").alias("sh")).collect()}
    texts = {r.doc_id: r.text for r in planted.collect()}
    for did, sh in got.items():
        want = simhash64(texts[did])
        want_signed = want - (1 << 64) if want >= (1 << 63) else want
        assert sh == want_signed
    pairs = {(r.d1, r.d2): r.hamming
             for r in simhash_pairs(planted, max_hamming=10).collect()}
    for j in range(10, 15):
        assert pairs.get((j, 200 + j)) == 0
    for j in range(10):
        assert (j, 100 + j) in pairs
        assert pairs[(j, 100 + j)] == hamming64(
            simhash64(texts[j]), simhash64(texts[100 + j])
        )


def test_simhash_band_pairs_hot_bucket_cap(spark):
    """max_df drops saturated band buckets (quadratic-join guard) but
    keeps pairs reachable through a doc's other, cooler chunks; None
    preserves exact banding semantics."""
    from lectura.textops import simhash_band_pairs

    # 40 signatures all sharing chunk0 == 0x00AB (one hot bucket); the
    # first two also share chunks 1-3 (a genuine near-dup pair reachable
    # through cool buckets); the rest differ in every other chunk.
    hot = 0x00AB
    sigs = [(0, (0x1111 << 48) | (0x2222 << 32) | (0x3333 << 16) | hot),
            (1, (0x1111 << 48) | (0x2222 << 32) | (0x3333 << 16) | hot)]
    for i in range(2, 40):
        sigs.append((i, (i << 48) | ((i + 7) << 32) | ((i + 13) << 16) | hot))
    sh = spark.createDataFrame(
        [(i, s - (1 << 64) if s >= (1 << 63) else s) for i, s in sigs],
        schema="id long, sh long",
    )
    uncapped = simhash_band_pairs(sh, max_hamming=64)
    capped = simhash_band_pairs(sh, max_hamming=64, max_df=8)
    assert uncapped.count() == 40 * 39 // 2     # hot bucket → all pairs
    got = {(r.d1, r.d2) for r in capped.collect()}
    assert got == {(0, 1)}                      # only the cool-chunk pair
    # a cap wider than every bucket changes nothing
    wide = {(r.d1, r.d2) for r in
            simhash_band_pairs(sh, max_hamming=64, max_df=40).collect()}
    assert len(wide) == 40 * 39 // 2


def test_ngram_jaccard_pairs_exact_values(spark, planted):
    from lectura.textops import ngram_jaccard_pairs

    texts = {r.doc_id: r.text for r in planted.collect()}
    got = {(r.d1, r.d2): r.jaccard
           for r in ngram_jaccard_pairs(planted, min_inter=2).collect()}
    for j in range(10, 15):
        assert got[(j, 200 + j)] == 1.0
    for j in range(10):
        want = jaccard(shingles(texts[j]), shingles(texts[100 + j]))
        assert abs(got[(j, 100 + j)] - want) < 1e-3


def test_minhash_estimates_jaccard(spark, planted):
    """Signature agreement ≈ true jaccard (±0.25 at k=32)."""
    from lectura.textops import minhash_signatures

    texts = {r.doc_id: r.text for r in planted.collect()}
    sigs = {r.id: list(r.sig)
            for r in minhash_signatures(planted, k=32).collect()}
    for j in range(10):
        est = sum(a == b for a, b in zip(sigs[j], sigs[100 + j])) / 32
        true = jaccard(shingles(texts[j]), shingles(texts[100 + j]))
        assert abs(est - true) < 0.25, (j, est, true)


def test_rolling_fingerprint_parity(spark, planted):
    from lectura.textops import rolling_fingerprint_udf

    got = {r.doc_id: r.fp for r in
           planted.select("doc_id", rolling_fingerprint_udf("text").alias("fp"))
           .collect()}
    texts = {r.doc_id: r.text for r in planted.collect()}
    assert got == {d: rolling_fingerprint(t) for d, t in texts.items()}
    # order sensitivity: same words shuffled -> different fingerprint
    assert rolling_fingerprint("a b c") != rolling_fingerprint("c b a")


def test_pure_minhash_is_deterministic():
    s1 = minhash_signature("the quick brown fox jumps over the lazy dog")
    s2 = minhash_signature("the quick brown fox jumps over the lazy dog")
    assert s1 == s2 and len(s1) == 32


SF = "/root/testdata/sf0.001"


def test_ann_lsh_recall_planted_neighbors(spark):
    """Plant 15 true near-neighbors of vec 0 (tiny noise); multi-table LSH
    must recover ≥80% of the brute-force top-10 on the augmented set."""
    import random

    import numpy as np

    from lectura.vectorops import brute_force_topk, lsh_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = np.asarray(emb.filter(F.col("vec_id") == 0).head()["embedding"])
    rng = random.Random(3)
    planted = []
    for i in range(15):
        noise = np.asarray([rng.gauss(0, 0.02) for _ in qvec], dtype=np.float32)
        planted.append((10_000 + i, (qvec + noise).astype(np.float32).tolist(), -1))
    aug = emb.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>, label int")
    )
    exact = [r.vec_id for r in brute_force_topk(aug, list(qvec), k=10).collect()]
    approx = [r.vec_id for r in
              lsh_topk(aug, list(qvec), k=10, n_planes=6, n_tables=16).collect()]
    assert exact[0] == 0
    assert all(v >= 10_000 for v in exact[1:])  # planted dominate true top-10
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, (recall, exact, approx)


def test_ann_brute_force_matches_numpy(spark):
    import numpy as np

    from lectura.vectorops import brute_force_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].map(np.asarray))
    q = mat[pdf.vec_id.tolist().index(0)]
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(zip(-np.round(cos, 4), pdf["vec_id"]))[:10]
    want = [int(v) for _, v in order]
    got = [r.vec_id for r in brute_force_topk(emb, list(q), k=10).collect()]
    assert got == want


def test_ann_ivf_recall_planted_neighbors(spark):
    """Same planted-neighbor setup as the LSH test: IVF (kmeans cells +
    n_probe nearest cells + exact rerank) must recover ≥80% of the
    brute-force top-10 — the planted cluster lands in one cell."""
    import random

    import numpy as np

    from lectura.vectorops import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = np.asarray(emb.filter(F.col("vec_id") == 0).head()["embedding"])
    rng = random.Random(7)
    planted = []
    for i in range(15):
        noise = np.asarray([rng.gauss(0, 0.02) for _ in qvec], dtype=np.float32)
        planted.append((10_000 + i, (qvec + noise).astype(np.float32).tolist(), -1))
    aug = emb.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>, label int")
    )
    exact = [r.vec_id for r in brute_force_topk(aug, list(qvec), k=10).collect()]
    approx = [r.vec_id for r in
              ivf_topk(aug, list(qvec), k=10, n_centroids=8, n_probe=3).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, (recall, exact, approx)


def test_ann_pq_recall_planted_neighbors(spark):
    """Same planted-neighbor setup as the LSH/IVF tests: PQ codes + ADC
    candidate scan + exact rerank must recover ≥80% of the brute-force
    top-10 — the planted near-duplicates quantize to the query's codes."""
    import random

    import numpy as np

    from lectura.vectorops import brute_force_topk, pq_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = np.asarray(emb.filter(F.col("vec_id") == 0).head()["embedding"])
    rng = random.Random(11)
    planted = []
    for i in range(15):
        noise = np.asarray([rng.gauss(0, 0.02) for _ in qvec], dtype=np.float32)
        planted.append((10_000 + i, (qvec + noise).astype(np.float32).tolist(), -1))
    aug = emb.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>, label int")
    )
    exact = [r.vec_id for r in brute_force_topk(aug, list(qvec), k=10).collect()]
    approx = [r.vec_id for r in
              pq_topk(aug, list(qvec), k=10, m=8, n_centroids=16,
                      rerank=100).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, (recall, exact, approx)


def test_pq_codes_shape_and_parallelism_invariance(spark):
    """Every row gets exactly m code ids, each in [0, n_centroids); the
    code assignment is identical at 1 partition and 16 partitions (the
    determinism contract behind a persisted compressed index)."""
    from lectura.vectorops import pq_codebooks, pq_encode

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = pq_codebooks(emb, m=8, n_centroids=16, n_iters=2)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    codes1 = {r.vec_id: list(r.pq_code)
              for r in pq_encode(emb.coalesce(1), books).collect()}
    codes16 = {r.vec_id: list(r.pq_code)
               for r in pq_encode(emb.repartition(16), books).collect()}
    assert codes1 == codes16
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c)
               for c in codes1.values())


def test_pq_codebooks_deterministic_across_partitioning(spark):
    """Lloyd iterations aggregate via 9dp-rounded means — the trained
    codebooks must not depend on input partitioning."""
    from lectura.vectorops import pq_codebooks

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    b1 = pq_codebooks(emb.coalesce(1), m=4, n_centroids=8, n_iters=2)
    b2 = pq_codebooks(emb.repartition(16), m=4, n_centroids=8, n_iters=2)
    assert b1 == b2


def test_ivf_index_partitions_cover_all_rows(spark):
    """Every vector lands in exactly one inverted list; cells cover the
    set (the persisted-index invariant behind partition-pruned probes)."""
    from lectura.vectorops import ivf_index, kmeans_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = kmeans_centroids(emb, 8, n_iters=2)
    assert len(cents) == 8
    idx = ivf_index(emb, cents)
    assert idx.count() == emb.count()
    cids = [r.cid for r in idx.select("cid").distinct().collect()]
    assert all(0 <= c < 8 for c in cids)


# ---------------------------------------------------------------------------
# Decontamination + repetition signals (textops.contamination_stats /
# repetition_stats) vs in-test pure-Python references.
# ---------------------------------------------------------------------------

def _py_ngrams(text, n, distinct):
    w = text.split()
    grams = [" ".join(w[i:i + n]) for i in range(max(len(w) - n, 0) + 1)]
    grams = [g for g in grams if g]
    return set(grams) if distinct else grams


def test_contamination_stats_matches_pure(spark, planted):
    from lectura.textops import contamination_stats

    rows = {r.doc_id: r.text for r in planted.collect()}
    bench_ids = {i for i in rows if i % 3 == 0}
    corpus = planted.filter(F.col("doc_id") % 3 != 0)
    bench = planted.filter(F.col("doc_id") % 3 == 0)
    bench_sh = {i: _py_ngrams(rows[i], 4, True) for i in bench_ids}
    want = {}
    for i, text in rows.items():
        if i in bench_ids:
            continue
        sh = _py_ngrams(text, 4, True)
        hit = set().union(*(sh & b for b in bench_sh.values()))
        n_docs = sum(1 for b in bench_sh.values() if sh & b)
        if hit:
            want[i] = (len(hit), n_docs)
    got = {r.doc_id: (r.n_hit_shingles, r.n_bench_docs)
           for r in contamination_stats(corpus, bench, n=4).collect()}
    assert got == want and want  # the planted dups guarantee hits


def test_contamination_plan_broadcasts_benchmark(spark, planted):
    from lectura.textops import contamination_stats

    plan = (
        contamination_stats(planted, planted.limit(5), n=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles to join
    # exactly 3 shuffles: bench-side distinct (small) + the two-phase
    # countDistinct over hit rows. A 4th would mean the corpus n-gram
    # stream is being shuffled before the join again (the word_ngrams
    # per-doc distinct regression).
    assert plan.count("Exchange hashpartitioning") == 3, plan


def test_repetition_stats_matches_pure(spark, planted):
    from collections import Counter

    from lectura.textops import repetition_stats

    got = {r.doc_id: r for r in repetition_stats(planted, n=2).collect()}
    for i, text in ((r.doc_id, r.text) for r in planted.collect()):
        w = text.split()
        grams = Counter(_py_ngrams(text, 2, False))
        tot = sum(grams.values())
        r = got[i]
        assert r.n_words == len(w)
        assert abs(r.dup_word_frac - (1 - len(set(w)) / len(w))) < 1e-12
        assert abs(r.top_ngram_frac - max(grams.values()) / tot) < 1e-12
        assert abs(r.dup_ngram_frac - (1 - len(grams) / tot)) < 1e-12


def test_boilerplate_strip_matches_pure(spark):
    """Pure-Python reference over a planted host corpus: header/footer
    (100% host-df) stripped, 1/3-df line kept, small hosts untouched,
    all-boilerplate page degrades to empty text not a dropped row."""
    import pandas as pd

    from lectura.textops import boilerplate_strip

    rows = []
    for h in range(3):
        for p in range(6):
            lines = [f"nav h{h}", f"body {h}-{p}", f"foot h{h}"]
            if p % 3 == 0:
                lines.insert(2, "rare")
            rows.append((f"u{h}-{p}", f"h{h}", "\n".join(lines)))
    rows.append(("solo", "tiny", "nav tiny\nbody solo"))   # 1-page host
    rows.append(("allbp0", "bp", "same\nsame"))            # all-boilerplate
    rows.append(("allbp1", "bp", "same"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "host", "text"]))

    # pure reference
    by_host = {}
    for u, h, t in rows:
        by_host.setdefault(h, []).append((u, t))
    want = {}
    for h, pages in by_host.items():
        df_count = {}
        for _, t in pages:
            for ln in set(t.split("\n")):
                df_count[ln] = df_count.get(ln, 0) + 1
        bp = {ln for ln, c in df_count.items()
              if len(pages) >= 2 and c >= 0.5 * len(pages)}
        for u, t in pages:
            kept = [ln for ln in t.split("\n") if ln not in bp]
            want[u] = ("\n".join(kept),
                       len(t.split("\n")) - len(kept))

    got = {r.url: (r.text_clean, r.n_lines_dropped)
           for r in boilerplate_strip(df).collect()}
    assert got == want
    assert got["solo"] == ("nav tiny\nbody solo", 0)   # untouched
    assert got["allbp0"] == ("", 2) and got["allbp1"] == ("", 1)
    assert got["u0-0"][0] == "body 0-0\nrare"          # order preserved


def test_line_dedup_global_matches_pure(spark):
    """Pure-Python reference for the corpus-global line dedup: a line in
    > max_df distinct docs is dropped everywhere (even on hosts where it
    is rare), within-doc repeats count once toward df, per-article lines
    survive in original order, an all-boilerplate doc degrades to an
    empty text_clean row."""
    import pandas as pd

    from lectura.textops import line_dedup_global

    rows = []
    for h in range(4):                         # template spans 4 hosts
        for p in range(3):
            lines = [f"cookie banner",          # df=12 → hot
                     f"article {h}-{p}",        # df=1 → kept
                     f"share share",            # df=12 → hot
                     f"host line h{h}"]         # df=3 → kept (== max_df)
            rows.append((f"u{h}-{p}", "\n".join(lines)))
    rows.append(("dup-in-doc", "cookie banner\ncookie banner\nunique x"))
    rows.append(("allbp", "cookie banner\nshare share"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "text"]))

    # pure reference
    dfreq = {}
    for _, t in rows:
        for ln in set(t.split("\n")):
            dfreq[ln] = dfreq.get(ln, 0) + 1
    hot = {ln for ln, c in dfreq.items() if c > 3}
    want = {}
    for u, t in rows:
        kept = [ln for ln in t.split("\n") if ln not in hot]
        want[u] = ("\n".join(kept), len(t.split("\n")) - len(kept))

    got = {r.url: (r.text_clean, r.n_lines_dropped)
           for r in line_dedup_global(df, max_df=3).collect()}
    assert got == want
    assert got["u0-0"] == ("article 0-0\nhost line h0", 2)
    assert got["dup-in-doc"] == ("unique x", 2)   # both copies dropped
    assert got["allbp"] == ("", 2)                # row survives, text empty


def test_lang_id_matches_pure(spark):
    """Pure-Python reference for the stopword-profile language ID:
    punctuation/case-folded tokenization, per-language IN-set counts,
    argmax with smallest-code tiebreak, min_hits -> 'und'."""
    import re

    import pandas as pd

    from lectura.textops import LANG_PROFILES, lang_id

    rows = [
        ("en1", "The, OF and? it was! zz filler"),
        ("de1", "der und die nicht ist zz"),
        ("es1", "el los que por con"),
        ("fr1", "le les des est dans"),
        ("tie", "que Que xx"),            # es=2 fr=2 -> es (lexicographic)
        ("und", "zz filler 123 !!!"),     # zero evidence -> und
        ("mix", "the der the zz"),        # en=2 de=1 -> en
        ("one", "la only marker here"),   # fr=1, min_hits=1 -> fr
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    codes = sorted(LANG_PROFILES)
    want = {}
    for i, txt in rows:
        toks = [t for t in re.split(r"[^a-z]+", txt.lower()) if t]
        hits = {c: sum(t in LANG_PROFILES[c] for t in toks) for c in codes}
        best = max(hits.values())
        pred = "und" if best < 1 else min(c for c in codes
                                          if hits[c] == best)
        want[i] = (pred, best, len(toks))

    got = {r.doc_id: (r.lang_pred, r.best_hits, r.n_tokens)
           for r in lang_id(df).collect()}
    assert got == want
    assert got["tie"][0] == "es" and got["und"][0] == "und"
    assert got["en1"][0] == "en" and got["fr1"][0] == "fr"

    # min_hits raises the evidence bar: 1-hit docs degrade to 'und'
    got2 = {r.doc_id: r.lang_pred
            for r in lang_id(df, min_hits=2).collect()}
    assert got2["one"] == "und" and got2["tie"] == "es"


def test_semantic_dedup_matches_pure(spark):
    """Pure-Python reference for the SemDeDup pipeline: sign-band
    buckets -> candidate pairs -> cosine >= tau edges -> union-find
    clusters with min-id keeper. Cosines are well separated from the
    0.8 threshold so float summation order cannot flip an edge."""
    import numpy as np

    from lectura.vectorops import semantic_dedup

    rng = np.random.default_rng(11)
    dim, n_bands, band_bits = 16, 4, 4
    base = rng.standard_normal((12, dim)).astype(np.float32)
    vecs = {i: base[i] for i in range(12)}
    a1 = base[0].copy(); a1[0:2] = 0.0            # ~0.99 cosine to v0
    a2 = base[0].copy(); a2[2:4] = 0.0
    b1 = base[1].copy(); b1[14:16] = 0.0
    vecs[100], vecs[101], vecs[200] = a1, a2, b1

    rows = [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: (r.keeper_id, r.cluster_size, r.is_dup)
           for r in semantic_dedup(df, min_cosine=0.8, n_bands=n_bands,
                                   band_bits=band_bits).collect()}

    # reference: same banding, cosine, transitive closure
    def bands(v):
        return [sum((1 << j) for j in range(band_bits)
                    if v[b * band_bits + j] >= 0) for b in range(n_bands)]

    ids = sorted(vecs)
    cand = set()
    for x in ids:
        for y in ids:
            if x < y and any(kx == ky for kx, ky in
                             zip(bands(vecs[x]), bands(vecs[y]))):
                cand.add((x, y))

    def cos(u, v):
        u64, v64 = u.astype(np.float64), v.astype(np.float64)
        return round(float((u * v).astype(np.float64).sum())
                     / (np.sqrt((u * u).astype(np.float64).sum())
                        * np.sqrt((v * v).astype(np.float64).sum())), 4)

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = [(x, y) for x, y in cand if cos(vecs[x], vecs[y]) >= 0.8]
    for x, y in edges:
        rx, ry = find(x), find(y)
        parent[max(rx, ry)] = min(rx, ry)
    comps = {}
    members = {i for e in edges for i in e}
    for i in members:
        comps.setdefault(min(j for j in members if find(j) == find(i)), set()).add(i)
    want = {}
    for keeper, mem in comps.items():
        for i in mem:
            want[i] = (keeper, len(mem), i != keeper)

    assert got == want
    assert want, "fixture must plant at least one cluster"
    assert got[100] == (0, 3, True) and got[0] == (0, 3, False)
    assert got[200][0] == 1 and got[200][1] == 2


def test_semantic_dedup_hot_bucket_cap(spark):
    """max_bucket drops saturated buckets from candidate generation: a
    10-copy degenerate vector (every band bucket has 10 members) yields
    no cluster under cap 5, while a 2-cluster in other buckets
    survives; without the cap the 10-copy cluster appears in full."""
    import numpy as np

    from lectura.vectorops import semantic_dedup

    dim = 16
    hot = [1.0] * dim                                  # all-positive signs
    rng = np.random.default_rng(5)
    v = rng.standard_normal(dim).astype(np.float32)
    v[0] = -abs(v[0])                                  # sign differs from hot
    pair = [[float(x) for x in v], [float(x) for x in v]]
    rows = [(100 + i, hot) for i in range(10)] + [
        (0, pair[0]), (1, pair[1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    capped = {r.vec_id: r.cluster_size
              for r in semantic_dedup(df, min_cosine=0.8, n_bands=4,
                                      band_bits=4, max_bucket=5).collect()}
    assert capped == {0: 2, 1: 2}

    full = {r.vec_id: r.cluster_size
            for r in semantic_dedup(df, min_cosine=0.8, n_bands=4,
                                    band_bits=4).collect()}
    assert full[100] == 10 and full[0] == 2 and len(full) == 12


def test_semantic_dedup_degenerate_embeddings(spark):
    """ANSI-mode hazards (code-reviewed, reproduced, fixed): zero-norm
    embeddings must not DIVIDE_BY_ZERO the job, NaN cosines must not
    become edges (Spark sorts NaN above every value so a bare >= passes),
    and NULL / too-short embeddings must emit no band rows at all."""
    import math

    import numpy as np

    from lectura.vectorops import semantic_dedup, sign_bands

    rng = np.random.default_rng(3)
    v = [float(x) for x in rng.standard_normal(16).astype(np.float32)]
    nanv = list(v)
    nanv[0] = float("nan")
    rows = [
        (0, v), (1, list(v)),                    # genuine cluster of 2
        (10, [0.0] * 16), (11, [0.0] * 16),      # zero-norm twins
        (20, nanv),                              # NaN-poisoned copy of v
        (30, None), (31, v[:4]),                 # NULL / truncated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {r.vec_id: (r.keeper_id, r.cluster_size)
           for r in semantic_dedup(df, min_cosine=0.8, n_bands=4,
                                   band_bits=4).collect()}
    # only the genuine pair clusters; zero-norm pair shares every bucket
    # but its cosine is NULL; the NaN vector buckets with v but its
    # cosine is NaN; NULL/short rows never reach candidate generation
    assert got == {0: (0, 2), 1: (0, 2)}

    bands = sign_bands(df, n_bands=4, band_bits=4).collect()
    ids_with_bands = {r.id for r in bands}
    assert 30 not in ids_with_bands and 31 not in ids_with_bands
    assert all(not math.isnan(r.key) and r.key is not None for r in bands)


def test_lang_id_null_text_is_und(spark):
    """NULL text must classify as ('und', 0, 0) — under ANSI the
    unguarded size(split(NULL)) is NULL and the argmax would fall
    through to the first language code."""
    import pandas as pd

    from lectura.textops import lang_id

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [None, "the and of"]}))
    got = {r.doc_id: (r.lang_pred, r.best_hits, r.n_tokens)
           for r in lang_id(df).collect()}
    assert got[1] == ("und", 0, 0)
    assert got[2] == ("en", 3, 3)


def test_pii_scrub_matches_pure(spark):
    """Pure-Python re reference for the PII pipeline: stage order
    (emails -> IPs -> phones), counts on each stage's input, NULL text
    -> ('', 0, 0, 0), phone greediness over spaced digit groups.
    ASCII fixtures only: \\b is an ASCII word boundary in Java regex and
    RE2 (the two engines the operator contract spans) but Unicode in
    Python re, so this reference diverges on e.g. 'caf\u00e91.2.3.4' —
    the re parity claim is scoped to ASCII by design."""
    import re

    from lectura.textops import PII_PATTERNS, pii_scrub

    rows = [
        (1, "mail a.b+c@x-y.co or d@e.io, ip 10.0.255.1, +1 (415) 555-0199"),
        (2, "ver 1.2.3.4.5 and 255.255.255.255 end"),   # quad inside quint
        (3, "digits 12 34 nothing"),                     # too short for phone
        (4, None),
        (5, "call 415 555 0199 or 4155550199 x"),
        (6, "plain text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_emails, r.n_ips, r.n_phones, r.text_clean)
           for r in pii_scrub(df).collect()}

    want = {}
    for i, txt in rows:
        cur = txt or ""
        counts = []
        for _, pat, rep in PII_PATTERNS:
            counts.append(len(re.findall(pat, cur)))
            cur = re.sub(pat, rep, cur)
        want[i] = (*counts, cur)
    assert got == want
    assert got[4] == (0, 0, 0, "")
    assert got[1][:3] == (2, 1, 1)
    assert "<PHONE>" in got[5][3] and got[5][2] >= 1


def test_dup_span_stats_matches_pure(spark):
    """Pure-Python reference for cross-document span flagging: a k-word
    window is duplicated iff it occurs in >= 2 distinct docs; within-doc
    repeats add multiplicity to n_spans/n_dup_spans but only once to a
    span's document frequency; short docs yield their full-word join;
    empty docs emit no row."""
    from collections import Counter

    from lectura.textops import dup_span_stats

    rows = [
        (1, "a b c d e f"),          # shares "a b c" with doc 2
        (2, "a b c x y"),
        (3, "a b c a b c z"),        # within-doc repeat of the hot span
        (4, "u v w q r"),            # no shared spans
        (5, "s t"),                  # short doc -> single full-join span
        (6, "s t"),                  # duplicate short doc
        (7, ""),                     # no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_span_frac)
           for r in dup_span_stats(df, k=3).collect()}

    def grams(text, k=3):
        w = text.split()
        if not w:
            return []
        if len(w) < k:
            return [" ".join(w)]
        return [" ".join(w[i:i + k]) for i in range(len(w) - k + 1)]

    docfreq = Counter()
    for _, t in rows:
        for g in set(grams(t)):
            docfreq[g] += 1
    want = {}
    for i, t in rows:
        g = grams(t)
        if not g:
            continue
        nd = sum(docfreq[x] >= 2 for x in g)
        want[i] = (len(g), nd, round(nd / len(g), 4))
    assert got == want
    assert 7 not in got
    assert got[3][1] == 2          # both copies of the hot span count
    assert got[5] == (1, 1, 1.0) and got[4][1] == 0


def test_remove_dup_spans_matches_pure(spark):
    """Pure-Python reference for span REMOVAL: a token goes iff any
    duplicated k-window covers it (overlapping flagged windows merge),
    survivors re-join on single spaces; a doc that is entirely one hot
    span empties; docs with no window emit no row. Cross-checked
    against dup_span_stats: a doc has n_removed > 0 iff it has
    n_dup_spans > 0, and n_tokens - n_removed counts text_clean's
    tokens (conservation)."""
    from collections import Counter

    from lectura.textops import dup_span_stats, remove_dup_spans

    rows = [
        (1, "a b c d e f"),          # "a b c" hot -> tokens 1..3 go
        (2, "a b c x y"),
        (3, "a b c a b c z"),        # overlapping coverage merges
        (4, "u v w q r"),            # untouched
        (5, "s t"),                  # whole doc = one hot short span
        (6, "s t"),
        (7, ""),                     # no row
        (8, None),                   # no row
        (9, "p q a b c d q p"),      # interior span: both ends survive
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
           for r in remove_dup_spans(df, k=3).collect()}

    k = 3

    def wins(text):
        w = text.split() if text else []
        if not w:
            return [], []
        n = max(len(w) - k + 1, 1)
        return w, [(i, " ".join(w[i - 1:i - 1 + k]))
                   for i in range(1, n + 1)]

    docfreq = Counter()
    for _, t in rows:
        _, g = wins(t)
        for s in {s for _, s in g}:
            docfreq[s] += 1
    want = {}
    for i, t in rows:
        w, g = wins(t)
        if not g:
            continue
        cov = set()
        for pos, s in g:
            if docfreq[s] >= 2:
                cov.update(range(pos, pos + k))
        keep = [tok for j, tok in enumerate(w, 1) if j not in cov]
        want[i] = (len(w), len(w) - len(keep), " ".join(keep))
    assert got == want
    assert got[5] == (2, 2, "") and got[4] == (5, 0, "u v w q r")
    assert got[9][2] == "p q q p"  # interior excision, ends survive
    assert 7 not in got and 8 not in got

    stats = {r.doc_id: r.n_dup_spans
             for r in dup_span_stats(df, k=3).collect()}
    for i, (nt, nr, clean) in got.items():
        assert (nr > 0) == (stats[i] > 0)
        assert len(clean.split()) == nt - nr


def test_tfidf_top_terms_matches_pure(spark):
    """Pure-Python TF-IDF reference: [a-z0-9]-run tokenization,
    add-one-smoothed ln idf pre-rounded to 9dp, score to 4dp, rank on
    (rounded score DESC, term ASC); NULL text contributes nothing; the
    ranking must be identical at 1 and 16 partitions."""
    import math
    import re
    from collections import Counter

    from lectura.textops import tfidf_top_terms

    rows = [
        (1, "Spark spark CRAWL frontier frontier frontier"),
        (2, "spark robots; robots, politeness!"),
        (3, "unique-term spark crawl"),
        (4, None),
        (5, "zz zz zz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r.doc_id, r.term, r.score, r.rank)
                 for r in tfidf_top_terms(df, k=3).collect())

    tf = {}
    for i, t in rows:
        toks = [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]
        if toks:
            tf[i] = Counter(toks)
    n = len(tf)
    dfreq = Counter(t for c in tf.values() for t in c)
    want = []
    for i, c in tf.items():
        scored = sorted(
            ((round(cnt * round(math.log((n + 1) / (dfreq[t] + 1)), 9), 4)
              + 0.0, t) for t, cnt in c.items()),
            key=lambda x: (-x[0], x[1]))
        for r, (s, t) in enumerate(scored[:3], 1):
            want.append((i, t, s, r))
    assert got == sorted(want)
    assert 4 not in {g[0] for g in got}

    got16 = sorted((r.doc_id, r.term, r.score, r.rank)
                   for r in tfidf_top_terms(df.repartition(16), k=3)
                   .collect())
    assert got16 == got


def test_lm_perplexity_matches_pure(spark):
    """Pure-Python CCNet-style unigram LM reference: vocabulary
    rank-capped (count DESC, term ASC), add-one smoothing over
    (T + V + 1), shared OOV mass, 9dp per-token / 4dp per-doc rounding,
    ntile tertiles tie-broken on doc id. NULL and token-free docs emit
    no row; result invariant at 1 vs 16 partitions; the model join must
    broadcast."""
    import math
    import re
    from collections import Counter

    from lectura.textops import lm_perplexity

    rows_ref = [(100, "spark crawl crawl frontier"),
                (101, "spark spark robots")]
    rows_c = [
        (1, "spark crawl oovword"),
        (2, None),
        (3, "; , !"),
        (4, "frontier frontier robots spark"),
        (5, "zzz yyy"),
        (6, "spark spark spark spark"),
    ]
    corpus = spark.createDataFrame(rows_c, "doc_id long, text string")
    ref = spark.createDataFrame(rows_ref, "doc_id long, text string")
    out = lm_perplexity(corpus, ref, max_vocab=3)
    got = sorted((r.doc_id, r.n_tokens, r.avg_logp, r.bucket)
                 for r in out.collect())

    toks = lambda t: [x for x in re.split(r"[^a-z0-9]+", (t or "").lower())
                      if x]
    vocab = Counter(t for _, txt in rows_ref for t in toks(txt))
    kept = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    t_tot, v_sz = sum(c for _, c in kept), len(kept)
    lp = {w: round(math.log((c + 1.0) / (t_tot + v_sz + 1.0)), 9)
          for w, c in kept}
    lp_oov = round(math.log(1.0 / (t_tot + v_sz + 1.0)), 9)
    scored = []
    for i, txt in rows_c:
        tk = toks(txt)
        if tk:
            s = sum(lp.get(w, lp_oov) for w in tk)
            scored.append((i, len(tk), round(s / len(tk), 4) + 0.0))
    order = sorted(scored, key=lambda x: (-x[2], x[0]))
    n, b = len(order), 3
    names, want = ["head", "middle", "tail"], []
    pos = 0
    for bi in range(b):
        size = n // b + (1 if bi < n % b else 0)
        for i, nt, avg in order[pos:pos + size]:
            want.append((i, nt, avg, names[bi]))
        pos += size
    assert got == sorted(want)
    assert {2, 3}.isdisjoint({g[0] for g in got})
    # OOV really exercised: doc 5 is all-OOV, its mean IS the OOV logp
    assert dict((g[0], g[2]) for g in got)[5] == round(lp_oov, 4) + 0.0

    got16 = sorted(
        (r.doc_id, r.n_tokens, r.avg_logp, r.bucket)
        for r in lm_perplexity(corpus.repartition(16), ref.repartition(16),
                               max_vocab=3).collect())
    assert got16 == got

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_c4_quality_rules_matches_pure(spark):
    """Pure-Python C4 line/doc rules: terminal punct + word count +
    javascript/policy line drops, lorem/brace doc flags; NULL text is
    one dropped line; the operator must stay scan-stage (no Exchange)."""
    import re

    from lectura.textops import C4_POLICY_RX, c4_quality_rules

    rows = [
        (1, "a good long sentence here.\nshort one.\nno punct line at all"),
        (2, "lorem ipsum dolor sit amet.\nanother fine sentence right here!"),
        (3, 'var x = { a: 1 };\nthis quoted line should survive fine."'),
        (4, "please enable javascript to continue.\nreal content line one."
            "\nreal content line two?"),
        (5, "read our privacy policy for details.\nwe use cookie banners."
            "\ncontent sentence that is kept."),
        (6, None),
        (7, "   trimmed line with trailing spaces.   \nsecond real line."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = c4_quality_rules(df, min_words=3, min_kept_lines=2)
    got = sorted(
        (r.doc_id, r.n_lines, r.n_kept_lines, r.has_lorem, r.has_brace,
         r.keep, r.text_clean) for r in out.collect())

    want = []
    for i, txt in rows:
        text = txt or ""
        lines = text.split("\n")
        kept = [
            l for l in lines
            if re.search(r'[.!?"]$', l.strip())
            and len(re.split(r"\s+", l.strip())) >= 3
            and "javascript" not in l.lower()
            and not re.search(C4_POLICY_RX, l.lower())
        ]
        lorem, brace = "lorem ipsum" in text.lower(), "{" in text
        want.append((i, len(lines), len(kept), lorem, brace,
                     len(kept) >= 2 and not lorem and not brace,
                     "\n".join(kept)))
    assert got == sorted(want)
    # each rule individually exercised by the fixture
    by_id = {g[0]: g for g in got}
    assert by_id[2][3] and not by_id[2][5]          # lorem gate
    assert by_id[3][4] and not by_id[3][5]          # brace gate
    assert by_id[4][2] == 2 and by_id[4][5]         # javascript line dropped
    assert by_id[5][2] == 1 and not by_id[5][5]     # policy lines dropped
    assert by_id[6] == (6, 1, 0, False, False, False, "")

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_domain_quality_agg_matches_pure(spark):
    """Pure-Python domain aggregation: NULL/token-free docs count in
    n_docs only; an all-NULL domain gets NULL means and keep=false;
    ntile ties break on source; partial aggregation must appear in the
    plan (skew-proof groupBy, not a window over docs)."""
    import re

    from lectura.textops import STOPWORDS, domain_quality_agg

    rows = [
        (1, "a", "the cat and the dog in the fog"),      # stopword-rich
        (2, "a", "alpha beta gamma delta"),              # zero stopwords
        (3, "b", "of mice and men for fun"),
        (4, "b", None),                                   # unscored
        (5, "c", "is it for real on the web with a to"),
        (6, "d", None),                                   # domain all-NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = sorted(
        (r.source, r.n_docs, r.n_scored, r.mean_stop_ratio, r.low_q_frac,
         r.keep, r.bucket)
        for r in domain_quality_agg(df, low_q_threshold=0.3,
                                    max_low_frac=0.5).collect())

    stats = {}
    for _, src, txt in rows:
        d = stats.setdefault(src, {"n": 0, "ratios": []})
        d["n"] += 1
        if txt is not None:
            ws = re.split(r"\s+", txt.strip())
            if len(ws) > 0:
                n_stop = len(re.findall(
                    r"\b(" + "|".join(STOPWORDS) + r")\b", txt))
                d["ratios"].append(round(n_stop / len(ws), 4))
    agg = {}
    for src, d in stats.items():
        rs = d["ratios"]
        mean = round(sum(rs) / len(rs), 4) if rs else None
        low = round(sum(1 for r in rs if r < 0.3) / len(rs), 4) if rs else None
        agg[src] = (d["n"], len(rs), mean, low,
                    bool(low is not None and low <= 0.5))
    order = sorted(agg, key=lambda s: (-(agg[s][2] if agg[s][2] is not None
                                         else float("-inf")), s))
    # NULLS LAST under DESC: push None-mean domains to the end
    order = ([s for s in order if agg[s][2] is not None]
             + sorted(s for s in order if agg[s][2] is None))
    names, n, b = ["head", "middle", "tail"], len(order), 3
    bucket, pos = {}, 0
    for bi in range(b):
        size = n // b + (1 if bi < n % b else 0)
        for s in order[pos:pos + size]:
            bucket[s] = names[bi]
        pos += size
    want = sorted((s, *agg[s][:4], agg[s][4], bucket[s]) for s in agg)
    assert got == want
    assert dict((g[0], g[5]) for g in got)["d"] is False  # all-NULL domain

    out = domain_quality_agg(df.repartition(16), low_q_threshold=0.3)
    assert sorted((r.source, r.bucket) for r in out.collect()) == sorted(
        (g[0], g[6]) for g in got)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or "HashAggregate" in plan


def test_gopher_rules_matches_pure(spark):
    """Pure-Python Gopher gates: each rule individually attested by a
    planted doc (short, long-words, symbol spam, bullets, ellipsis
    lines, non-alpha words, missing required stopwords); NULL text
    scores n_words=0 / keep=false; the operator stays scan-stage."""
    import math
    import re

    from lectura.textops import GOPHER_REQUIRED, gopher_rules

    ok = ("the data and that batch have run with care to be of use"
          " for every line here")
    rows = [
        (1, ok + " plus a few more plain words to pass"),       # keep
        (2, "too few words"),                                    # min_words
        (3, " ".join(["extraordinarily"] * 20)),                 # mean len
        (4, ok + " ## # ## # ## # ## # ## # ## #"),              # symbols
        (5, "\n".join(["- " + ok, "- " + ok, "• " + ok])),       # bullets
        (6, "\n".join([ok + "...", ok + "…", ok + "..."])),      # ellipsis
        (7, ok + " " + " ".join(["1234"] * 30)),                 # alpha
        (8, "plain words with no required stopword hits at all"
            " beyond this with clause"),                         # stops < 2
        (9, None),                                               # NULL
        (10, ""),                                                # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = gopher_rules(df, min_words=10, max_words=500)
    got = {r.doc_id: r.asDict() for r in out.collect()}

    for i, txt in rows:
        text = txt or ""
        ws = [w for w in re.split(r"\s+", text.strip()) if w]
        nw = len(ws)
        lines = text.split("\n")
        n_sym = text.count("#") + (len(text)
                                   - len(text.replace("...", ""))) // 3
        want = {
            "doc_id": i,
            "n_words": nw,
            "mean_word_len": round(sum(len(w) for w in ws) / nw, 4)
                             if nw else None,
            "symbol_ratio": round(n_sym / nw, 4) if nw else None,
            "bullet_frac": round(
                sum(1 for l in lines
                    if re.match(r"^(-|\*|•) ", l.strip())) / len(lines), 4),
            "ellipsis_frac": round(
                sum(1 for l in lines
                    if re.search(r"(\.\.\.|…)$", l.strip())) / len(lines),
                4),
            "alpha_frac": round(
                sum(1 for w in ws if re.search("[A-Za-z]", w)) / nw, 4)
                if nw else None,
            "n_required_stops": sum(
                1 for w in GOPHER_REQUIRED
                if re.search(rf"\b{w}\b", text.lower())),
        }
        want["keep"] = bool(
            10 <= nw <= 500
            and want["mean_word_len"] is not None
            and 3.0 <= want["mean_word_len"] <= 10.0
            and want["symbol_ratio"] <= 0.1
            and want["bullet_frac"] <= 0.9
            and want["ellipsis_frac"] <= 0.3
            and want["alpha_frac"] >= 0.8
            and want["n_required_stops"] >= 2)
        g = got[i]
        for k, v in want.items():
            gv = g[k]
            if isinstance(v, float) and gv is not None:
                assert math.isclose(gv, v, abs_tol=1e-9), (i, k, gv, v)
            else:
                assert gv == v, (i, k, gv, v)
    # exactly one keeper, and each failure class fails its own rule
    assert [i for i in got if got[i]["keep"]] == [1]
    assert got[2]["n_words"] < 10
    assert got[3]["mean_word_len"] > 10
    assert got[4]["symbol_ratio"] > 0.1
    assert got[5]["bullet_frac"] > 0.9
    assert got[6]["ellipsis_frac"] > 0.3
    assert got[7]["alpha_frac"] < 0.8
    assert got[8]["n_required_stops"] < 2
    assert got[9]["n_words"] == 0 and got[9]["keep"] is False

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bm25_search_matches_pure(spark):
    """Pure-Python BM25 reference (Robertson & Zaragoza 2009, Lucene
    idf): [a-z0-9]-run tokens, N/avgdl over docs with >=1 token, idf /
    avgdl / per-term contribution pre-rounded to 9dp, score to 4dp,
    rank on (score DESC, id ASC). NULL-text and no-match docs never
    appear; an absent query term contributes nothing; the ranking is
    identical at 1 and 16 partitions."""
    import math
    import re
    from collections import Counter

    from lectura.textops import bm25_search

    k1, b = 1.2, 0.75
    terms = ["spark", "frontier", "robots", "absent"]
    rows = [
        (1, "Spark spark CRAWL frontier frontier frontier"),
        (2, "spark robots; robots, politeness!"),
        (3, "unique-term spark crawl"),
        (4, None),
        (5, "zz zz zz"),
        (6, "frontier"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_search(df, terms, k=4)
    got = [(r.doc_id, r.score, r.rank) for r in out.collect()]

    toks = {}
    for i, t in rows:
        ts = [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]
        if ts:
            toks[i] = ts
    n = len(toks)
    avgdl = round(sum(len(v) for v in toks.values()) / n, 9)
    tf = {i: Counter(t for t in v if t in terms) for i, v in toks.items()}
    dfreq = Counter(t for c in tf.values() for t in c)
    idf = {t: round(math.log(1.0 + (n - d + 0.5) / (d + 0.5)), 9)
           for t, d in dfreq.items()}
    scores = {}
    for i, c in tf.items():
        if not c:
            continue
        dl = len(toks[i])
        s = sum(round(idf[t] * cnt * (k1 + 1.0)
                      / (cnt + k1 * (1.0 - b + b * dl / avgdl)), 9)
                for t, cnt in c.items())
        scores[i] = round(s, 4) + 0.0
    want = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:4]
    assert got == [(i, s, r) for r, (i, s) in enumerate(want, 1)]
    assert {g[0] for g in got}.isdisjoint({4, 5})

    got16 = [(r.doc_id, r.score, r.rank)
             for r in bm25_search(df.repartition(16), terms, k=4).collect()]
    assert got16 == got

    # global top-k must be a distributed partial top-k, not a full sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_phrase_search_matches_pure(spark):
    """Pure-Python positional reference: overlapping matches count
    (phrase 'aa aa' matches 'aa aa aa' at starts 0 and 1), repeated
    phrase terms resolve per-offset, NULL/no-match docs never appear,
    and results are identical at 1 and 16 partitions."""
    import re

    from lectura.textops import phrase_search

    rows = [
        (1, "big hash join fast hash join done"),   # two matches
        (2, "hash only and join only"),              # terms, no phrase
        (3, "HASH  Join!"),                          # case/punct fold
        (4, None),
        (5, "aa aa aa"),                             # overlap fixture
        (6, "join hash"),                            # reversed order
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def pure(phrase):
        out = {}
        for i, t in rows:
            toks = [x for x in re.split(r"[^a-z0-9]+", (t or "").lower())
                    if x]
            p = len(phrase)
            starts = [s for s in range(len(toks) - p + 1)
                      if toks[s:s + p] == phrase]
            if starts:
                out[i] = (len(starts), starts[0])
        return out

    for phrase in (["hash", "join"], ["aa", "aa"]):
        got = {r.doc_id: (r.n_matches, r.first_pos)
               for r in phrase_search(df, phrase).collect()}
        assert got == pure(phrase), phrase
        got16 = {r.doc_id: (r.n_matches, r.first_pos)
                 for r in phrase_search(df.repartition(16), phrase)
                 .collect()}
        assert got16 == got, phrase
    # overlap fixture really overlaps: 'aa aa' in 'aa aa aa' → 2
    assert pure(["aa", "aa"])[5] == (2, 0)

    # the phrase-offsets dim must broadcast — no shuffle on the tiny side
    plan = (phrase_search(df, ["hash", "join"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_ccnet_normalize_and_dedup_groups(spark):
    """Pure-Python reference of the frozen normalization chain; the
    dedup groups must pair normalization-equal docs (case, accents,
    digits, punctuation, whitespace) and never pair distinct content;
    NULL and empty text normalize to the same '' key. Plan: one
    partial-aggregating groupBy, no window."""
    import re

    from lectura.textops import (_ACCENT_FROM, _ACCENT_TO, ccnet_normalize,
                                 normalized_dedup_groups)

    fold = str.maketrans(_ACCENT_FROM, _ACCENT_TO)

    def pure(t):
        x = (t or "").lower().translate(fold)
        x = re.sub(r"[0-9]", "0", x)
        x = re.sub(r"[^a-z0-9 ]+", " ", x)
        return re.sub(r" +", " ", x).strip()

    rows = [
        (1, "Héllo,  Wörld 42!"),
        (2, "hello world 90"),          # digits differ → same key as 1
        (3, "HELLO WORLD\t17\n"),       # case/ws → same key as 1
        (4, "hello worlds 42"),         # distinct content
        (5, None),
        (6, ""),
        (7, "ŁÓDŹ źdźbło"),
        (8, "lodz zdzblo"),             # accent-folded pair with 7
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_norm = {r.doc_id: r.n for r in df.select(
        "doc_id", ccnet_normalize(F.col("text")).alias("n")).collect()}
    assert got_norm == {i: pure(t) for i, t in rows}

    out = normalized_dedup_groups(df)
    got = sorted((r.n_copies, r.keeper) for r in out.collect())
    # {1,2,3} collapse, {5,6} ('' key), {7,8} accent-fold; 4 alone
    assert got == [(2, 5), (2, 7), (3, 1)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan and "Window" not in plan


def test_mm_byte_hist_matches_pure(spark):
    """The multimodal feature-extract stub operates on utf-8 BYTES
    (multi-byte chars land in the high bins 8–15 — the oracle's
    codepoint form only matches on the ASCII fixture, a documented
    assumption); empty payloads emit no rows; the Arrow batch path
    must equal a pure-Python byte histogram."""
    from collections import Counter

    from lectura.contract import mm_byte_hist_q14

    rows = [(1, "abc"), (2, ""), (3, "héllo"), (4, None), (5, "\x00\x7f")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import lectura.contract as C
    orig = C.t
    C.t = lambda spark, sf, name: df
    try:
        got = sorted((r.doc_id, r.bin, r.n)
                     for r in mm_byte_hist_q14(spark, "unused").collect())
    finally:
        C.t = orig

    want = []
    for i, s in rows:
        if s is None:
            continue
        for b, n in sorted(Counter(x >> 4 for x in s.encode()).items()):
            want.append((i, b, n))
    assert got == sorted(want)
    # 'é' is 2 bytes (0xC3 0xA9) → bins 12 and 10 present for doc 3
    assert (3, 12, 1) in got and (3, 10, 1) in got


def test_pmi_collocations_matches_pure(spark):
    """Pure-Python PMI reference with the same frozen arithmetic
    order; min_count prunes, ranks tiebreak on (a, b), NULL/short
    docs contribute nothing, identical at 1 and 16 partitions; plan
    must end in a distributed partial top-k."""
    import math
    import re
    from collections import Counter

    from lectura.textops import pmi_collocations

    rows = [
        (1, "big data big data big data"),
        (2, "big data pipeline"),
        (3, "data big"),
        (4, None),
        (5, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(df, k=10, min_count=2)
    got = [(r.a, r.b, r.n_ab, r.pmi, r.rank) for r in out.collect()]

    uni, bi = Counter(), Counter()
    n_bi = 0
    for _, t in rows:
        toks = [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]
        uni.update(toks)
        prs = list(zip(toks, toks[1:]))
        bi.update(prs)
        n_bi += len(prs)
    n_tok = sum(uni.values())
    scored = sorted(
        ((a, b, c, round(math.log(float(c) * n_tok * n_tok
                                  / (float(n_bi) * uni[a] * uni[b])), 4)
          + 0.0)
         for (a, b), c in bi.items() if c >= 2),
        key=lambda x: (-x[3], x[0], x[1]))
    want = [(a, b, c, p, r) for r, (a, b, c, p) in enumerate(scored[:10], 1)]
    assert got == want
    assert ("big", "data") == (got[0][0], got[0][1])  # the collocation wins

    got16 = [(r.a, r.b, r.n_ab, r.pmi, r.rank)
             for r in pmi_collocations(df.repartition(16), k=10,
                                       min_count=2).collect()]
    assert got16 == got
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_fuzzy_pairs_matches_pure(spark):
    """Pure-Python blocked levenshtein reference: pairs share a 4-char
    block, classic edit distance on 24-char lowered prefixes, the
    blocking blind spot is real (a pair differing in char 1 is NOT
    found), max_block drops saturated blocks, NULL/empty emit
    nothing."""
    from lectura.textops import fuzzy_pairs

    rows = [
        (1, "the quick brown fox jumps over"),
        (2, "the quick brown fox jumps far"),    # dist 0 on 24-prefix
        (3, "the quick brawn fox leaps"),        # small dist, same block
        (4, "xhe quick brown fox jumps over"),   # differs in char 1 → blind
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    keys = {i: t[:24].lower() for i, t in rows if t}
    want = sorted(
        (a, b, lev(keys[a], keys[b]))
        for a in keys for b in keys
        if a < b and keys[a][:4] == keys[b][:4]
        and lev(keys[a], keys[b]) <= 3)
    got = sorted(tuple(r) for r in fuzzy_pairs(df, max_dist=3).collect())
    assert got == want
    assert (1, 2, 0) in got and not any(4 in (p[0], p[1]) for p in got)

    # saturated block dropped under max_block, kept without a cap
    many = df.unionByName(spark.createDataFrame(
        [(100 + i, "the copy %d" % i) for i in range(9)],
        "doc_id long, text string"))
    capped = fuzzy_pairs(many, max_dist=30, max_block=5).collect()
    assert not any(r.d1 >= 100 or r.d2 >= 100 for r in capped)
    uncapped = fuzzy_pairs(many, max_dist=30, max_block=None).count()
    assert uncapped > len(capped)


def test_fuzzy_pairs_two_pass_closes_prefix_blind_spot(spark):
    """Q16b: the suffix-blocked second pass recovers pairs whose edits
    fall inside the first block (pass-1's documented blind spot); the
    two-pass result is a superset of pass 1 and matches a brute-force
    reference with the union blocking predicate; the residual
    both-ends blind spot is real and documented."""
    from lectura.textops import fuzzy_pairs

    rows = [
        (1, "the quick brown fox jumps over"),
        (2, "the quick brown fox jumps far"),    # dist 0 on 24-prefix
        (3, "xhe quick brown fox jumps over"),   # char-1 edit: pass-2 only
        (4, "Ahe quick brown fox jumXs over"),   # edits at BOTH ends: missed
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    keys = {i: t[:24].lower() for i, t in rows if t}
    want = sorted(
        (a, b, lev(keys[a], keys[b]))
        for a in keys for b in keys
        if a < b
        and (keys[a][:4] == keys[b][:4] or keys[a][-4:] == keys[b][-4:])
        and lev(keys[a], keys[b]) <= 3)
    got2 = sorted(tuple(r) for r in
                  fuzzy_pairs(df, max_dist=3, two_pass=True).collect())
    assert got2 == want
    got1 = sorted(tuple(r) for r in fuzzy_pairs(df, max_dist=3).collect())
    assert set(got1) <= set(got2)
    # char-1 edit found by pass 2, invisible to pass 1
    assert any({p[0], p[1]} == {1, 3} for p in got2)
    assert not any({p[0], p[1]} == {1, 3} for p in got1)
    # both-ends edit: neither block matches doc 1's — residual blind
    # spot (documented), even though lev(keys) == 2 <= 3
    assert lev(keys[1], keys[4]) <= 3
    assert not any(4 in (p[0], p[1]) for p in got2)
    # duplicate suppression: a pair caught by BOTH passes appears once
    assert len(got2) == len({(a, b) for a, b, _ in got2})


def test_chunk_documents_matches_pure(spark):
    """Pure-Python chunking reference: overlap (stride < window),
    short tail, short-doc single chunk, NULL/blank drop, coverage (the
    concatenation of stride-prefixes reconstructs the doc), zero
    Exchange in the plan."""
    from lectura.textops import chunk_documents

    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),
        (2, "a b c"),
        (3, None),
        (4, "   "),
        (5, "only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, window=4, stride=3)
    got = sorted((r.doc_id, r.chunk_id, r.n_tokens, r.chunk)
                 for r in out.collect())

    import math

    want = []
    for i, t in rows:
        toks = (t or "").split()
        if not toks:
            continue
        n = 1 if len(toks) <= 4 else math.ceil((len(toks) - 4) / 3) + 1
        for c in range(n):
            part = toks[c * 3:c * 3 + 4]
            want.append((i, c, len(part), " ".join(part)))
    assert got == sorted(want)
    # no emitted window is contained in its predecessor: doc 1 has 10
    # tokens → chunks start at 0, 3, 6 (covering to token 10) and STOP;
    # the naive start-9 tail (tokens 9..9 ⊂ chunk 2's 6..9) never appears
    assert max(c for did, c, _n, _t in got if did == 1) == 2
    # overlap: doc 1 chunk 0 = w0..w3, chunk 1 starts at w3
    d1 = {c: t for did, c, _n, t in got if did == 1}
    assert d1[0].endswith("w3") and d1[1].startswith("w3")
    # doc-level reconstruction from stride-prefixes
    rebuilt = " ".join(" ".join(d1[c].split()[:3]) for c in sorted(d1))
    assert rows[0][1].startswith(rebuilt.rsplit(" ", 1)[0])

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    with __import__("pytest").raises(ValueError):
        chunk_documents(df, window=4, stride=5)


def test_mix_report_matches_pure(spark):
    """Pure-Python mix accounting: NULL source folds to '(none)',
    NULL/blank text counts 0 tokens but the doc counts, shares round
    to 4dp, cumulative share follows (share DESC, group ASC)."""
    from lectura.textops import mix_report

    rows = [
        (1, "a", "one two three"),
        (2, "a", None),
        (3, "b", "one two three four five six"),
        (4, None, "x"),
        (5, "b", "  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = [(r.source, r.n_docs, r.n_tokens, r.token_frac, r.cum_frac)
           for r in mix_report(df).collect()]

    agg = {}
    for _, s, t in rows:
        g = s if s is not None else "(none)"
        d = agg.setdefault(g, [0, 0])
        d[0] += 1
        d[1] += len(t.split()) if t and t.strip() else 0
    total = sum(v[1] for v in agg.values())
    fr = {g: round(v[1] / total, 4) + 0.0 for g, v in agg.items()}
    order = sorted(agg, key=lambda g: (-fr[g], g))
    want, cum = [], 0.0
    for g in order:
        cum = round(cum + fr[g], 4) + 0.0
        want.append((g, agg[g][0], agg[g][1], fr[g], cum))
    assert sorted(got) == sorted(want)
    assert abs(want[-1][4] - 1.0) < 2e-3


def test_mix_report_all_blank_corpus_reports_zero_shares(spark):
    """ADVICE r3: every doc NULL/blank → token total 0; shares must be
    0.0 (not NULL from a 0/0 division), ordering falls back to group."""
    from lectura.textops import mix_report

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", "   "), (3, "a", "")],
        "doc_id long, source string, text string")
    got = sorted((r.source, r.n_docs, r.n_tokens, r.token_frac, r.cum_frac)
                 for r in mix_report(df).collect())
    assert got == [("a", 2, 0, 0.0, 0.0), ("b", 1, 0, 0.0, 0.0)]


def test_cms_heavy_hitters_properties(spark):
    """CMS one-sided error: estimate >= true count for every candidate
    (bit-exact equality when no collision), absent terms estimate >= 0,
    ranking follows (est DESC, term ASC), and the counter table the
    plan builds is bounded by d*w rows regardless of corpus size."""
    from collections import Counter

    from lectura.textops import cms_heavy_hitters, folded_tokens

    rows = [(1, "a a a a b b c d"), (2, "a b x y z"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import re
    true = Counter(t for _, x in rows
                   for t in re.split(r"[^a-z0-9]+", (x or "").lower()) if t)
    cands = ["a", "b", "c", "q"]
    got = {r.term: (r.est, r.rank)
           for r in cms_heavy_hitters(df, cands, k=4, d=4, w=8).collect()}
    assert set(got) == set(cands)
    for t in cands:
        assert got[t][0] >= true.get(t, 0), (t, got[t], true.get(t))
    # wide sketch (no collisions at this vocab): estimates exact
    exact = {r.term: r.est
             for r in cms_heavy_hitters(df, cands, k=4, d=4,
                                        w=4096).collect()}
    assert exact == {t: true.get(t, 0) for t in cands}
    order = sorted(got, key=lambda t: (-got[t][0], t))
    assert [got[t][1] for t in order] == [1, 2, 3, 4]


def test_sentence_udtf_matches_pure(spark):
    """The UDTF yields per-sentence rows identical to the pure-Python
    rule (dialect-safe split, per-piece tail-punct strip + edge trim,
    0-based ids over NON-empty sentences only); NULL yields nothing;
    works through both the SQL LATERAL face and the DataFrame lateralJoin."""
    import re

    from lectura.textops import sentence_udtf

    rows = [
        (1, "Hello world. How are you?  Fine!"),
        (2, None),
        (3, "no terminal punct here"),
        (4, "!!.  ??  "),                # only punct/space → no rows
        (5, "a.b stays one... next"),    # no space after '.' → no split
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("split_sentences", sentence_udtf())
    got = sorted(tuple(r) for r in spark.sql(
        "SELECT d.doc_id, s.* FROM udtf_docs d, "
        "LATERAL split_sentences(d.text) s").collect())

    want = []
    for i, t in rows:
        if t is None:
            continue
        sid = 0
        for raw in re.split(r"[.!?]+\s+", t):
            s = re.sub(r"^\s+|\s+$", "", re.sub(r"[.!?]+$", "", raw))
            if s:
                want.append((i, sid, s, len(s.split())))
                sid += 1
    assert got == sorted(want)
    assert (5, 0, "a.b stays one", 3) in got
    assert not any(r[0] in (2, 4) for r in got)


def test_hll_estimate_accuracy_and_determinism(spark):
    """HLL invariants: estimate within the standard-error envelope of
    the exact distinct count on both branches (raw harmonic at n >> m,
    linear counting at n << m), identical at 1 and 16 partitions,
    duplicates and NULLs don't move registers, and the register build
    is ONE partial-aggregating groupBy."""
    import pyspark.sql.functions as F

    from lectura.textops import hll_estimate

    big = spark.range(0, 2000).select(F.col("id").alias("v"))
    r = hll_estimate(big, "v", p=6).collect()[0]
    assert abs(r.n_est - 2000) / 2000 < 0.4, r  # ~3σ at m=64
    r16 = hll_estimate(big.repartition(16), "v", p=6).collect()[0]
    assert (r16.m, r16.v_used, r16.n_est) == (r.m, r.v_used, r.n_est)

    small = spark.createDataFrame(
        [(i % 10,) for i in range(500)] + [(None,)] * 5, "v long")
    s = hll_estimate(small, "v", p=6).collect()[0]
    assert s.v_used <= 10 and abs(s.n_est - 10) < 4, s
    # duplicates don't move registers: distinct input gives same row
    sd = hll_estimate(small.distinct(), "v", p=6).collect()[0]
    assert (sd.v_used, sd.n_est) == (s.v_used, s.n_est)

    plan = (hll_estimate(big, "v", p=6)
            ._jdf.queryExecution().executedPlan().toString())
    assert "partial_max" in plan or "HashAggregate" in plan


def test_hll_estimate_empty_and_all_null_input_is_zero(spark):
    """ADVICE r3: zero register rows must report n_est = 0.0 (V = m →
    linear counting m·ln(m/m) = 0), not a NULL that poisons the fold."""
    from lectura.textops import hll_estimate

    empty = spark.createDataFrame([], "v long")
    r = hll_estimate(empty, "v", p=6).collect()[0]
    assert (r.m, r.v_used, r.n_est) == (64, 0, 0.0)
    nulls = spark.createDataFrame([(None,)] * 7, "v long")
    rn = hll_estimate(nulls, "v", p=6).collect()[0]
    assert (rn.m, rn.v_used, rn.n_est) == (64, 0, 0.0)


def test_simhash_band_pairs_handoff_params_equivalent(spark):
    """hot_buckets handoff and dedupe=False are PLAN knobs: the pair SET
    (post canonical dedup) matches the default path exactly."""
    import random

    from pyspark.sql import functions as F

    from lectura.textops import simhash_band_pairs, simhash_chunks

    rng = random.Random(7)
    base = [rng.getrandbits(63) for _ in range(40)]
    rows = [(i, base[i % 40] ^ ((1 << rng.randrange(63)) if i >= 40 else 0))
            for i in range(120)]
    sh = spark.createDataFrame(rows, "id long, sh long")
    ref = {(r.d1, r.d2) for r in
           simhash_band_pairs(sh, max_hamming=4, max_df=8).collect()}
    hot = (simhash_chunks(sh).groupBy("chunk", "val").count()
           .filter(F.col("count") > 8).select("chunk", "val"))
    got = {(r.d1, r.d2) for r in
           simhash_band_pairs(sh, max_hamming=4, max_df=8,
                              hot_buckets=hot, dedupe=False)
           .dropDuplicates(["d1", "d2"]).collect()}
    assert got == ref


# ---------------------------------------------------------------------------
# D9 — log-linear histogram quantile sketch
# ---------------------------------------------------------------------------

def _exact_quantile(vals, num, den):
    s = sorted(vals)
    r = -((-num * len(s)) // den)  # ceil(num*n/den), rank 1-based
    return s[max(r, 1) - 1]


def test_quantile_sketch_error_bound(spark):
    """est is the lower edge of the bin holding the exact quantile:
    est <= exact and exact < est * (1 + 1/sub) (+1 slack for the
    integer-floored edge at small values)."""
    from lectura.textops import log_quantile_sketch

    import random
    rng = random.Random(7)
    vals = ([rng.randrange(1, 10**6) for _ in range(3000)]
            + [0, 1, 2, 3, 2**20, 2**20 - 1, 10**9])
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    out = {(r["q_num"], r["q_den"]): (r["n"], r["est"])
           for r in log_quantile_sketch(df, "x").collect()}
    assert len(out) == 3
    for (num, den), (n, est) in out.items():
        assert n == len(vals)
        exact = _exact_quantile(vals, num, den)
        assert est <= exact
        assert exact < est * (1 + 1.0 / 16) + 1


def test_quantile_sketch_merge_associative(spark):
    """sketch(A ∪ B) == sketch over the union — the histogram is the
    state, so splitting the input cannot change any estimate."""
    from lectura.textops import log_quantile_sketch

    a = [(i * i,) for i in range(1, 400)]
    b = [(i * 7 + 3,) for i in range(500)]
    whole = spark.createDataFrame(a + b, "x long")
    split = (spark.createDataFrame(a, "x long")
             .unionByName(spark.createDataFrame(b, "x long"))
             .repartition(7))
    rows = lambda df: sorted(
        map(tuple, log_quantile_sketch(df, "x").collect()))
    assert rows(whole) == rows(split)


def test_quantile_sketch_edges(spark):
    from lectura.textops import log_quantile_sketch

    # empty / all-NULL input -> no rows
    empty = spark.createDataFrame([], "x long")
    assert log_quantile_sketch(empty, "x").count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "x long")
    assert log_quantile_sketch(nulls, "x").count() == 0
    # constant column: every quantile = the constant's bin lower edge
    const = spark.createDataFrame([(40,)] * 10, "x long")
    got = {(r["q_num"], r["q_den"]): r["est"]
           for r in log_quantile_sketch(const, "x").collect()}
    # 40 -> e=5, m=(40-32)*16//32=4, edge=32+4*32//16=40 (exact)
    assert set(got.values()) == {40}
    # zeros and negatives clamp to the v=0 bin with est 0
    z = spark.createDataFrame([(0,), (-5,), (-1,)], "x long")
    gz = {r["est"] for r in log_quantile_sketch(z, "x").collect()}
    assert gz == {0}


# ---------------------------------------------------------------------------
# Q21 — Unicode NFC normalization
# ---------------------------------------------------------------------------

def test_unicode_nfc_parity_and_idempotence(spark):
    import unicodedata

    from lectura.textops import unicode_nfc

    rows = [
        (1, "é"), (2, "é"), (3, "Å pple"),
        (4, "Å"), (5, "ﬁsh"), (6, "각"),
        (7, "ascii only"), (8, ""), (9, "ö́"), (10, None),
    ]
    df = spark.createDataFrame(rows, "id int, s string")
    got = {r["id"]: (r["norm"], r["changed"])
           for r in unicode_nfc(df, "id", "s").collect()}
    for i, s in rows:
        if s is None:
            assert got[i] == (None, False)
        else:
            want = unicodedata.normalize("NFC", s)
            assert got[i] == (want, want != s)
    # idempotence: normalizing the normalized output changes nothing
    once = unicode_nfc(df, "id", "s").select(
        F.col("id"), F.col("norm").alias("s"))
    again = unicode_nfc(once, "id", "s")
    assert again.filter(F.col("changed")).count() == 0


def test_script_profile_fixture(spark):
    from lectura.textops import script_profile

    rows = [
        (1, "abc привет"),   # cyr 6 > lat 3
        (2, "中文中文 ok"),                # cjk 4 > lat 2
        (3, "tieбвг"),                      # 3=3 -> latin
        (4, "123 !!!"),                                    # none
        (5, None),                                         # none
        (6, "가각 م"),                        # hangul 2 > arabic 1
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {r["id"]: r for r in
           script_profile(df, "id", "s").collect()}
    assert got[1]["script"] == "cyrillic"
    assert got[1]["frac_cyrillic"] == pytest.approx(6 / 9, abs=1e-4)
    assert got[2]["script"] == "cjk"
    assert got[3]["script"] == "latin"     # priority-order tie-break
    assert got[4]["script"] == "none"
    assert got[4]["frac_latin"] == 0.0
    assert got[5]["script"] == "none"
    assert got[6]["script"] == "hangul"
    # fractions sum to ~1 wherever letters exist
    for i in (1, 2, 3, 6):
        s = sum(got[i][f"frac_{n}"] for n in
                ("latin", "cyrillic", "greek", "cjk", "arabic", "hangul"))
        assert s == pytest.approx(1.0, abs=5e-4)


def test_containment_pairs_asymmetric_case(spark):
    """The operator's reason to exist: a short doc wholly inside a long
    one must show c(short in long) = 1.0 while Jaccard stays small; and
    containment must match a brute-force shingle computation."""
    from lectura.textops import containment_pairs, ngram_jaccard_pairs

    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(40))
    rows = [(1, short), (2, long_), (3, "unrelated words entirely here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {(r["d1"], r["d2"]): (r["inter"], r["c12"], r["c21"])
           for r in containment_pairs(df, n=3, min_inter=2).collect()}
    def shingles(s):
        w = s.split()
        return {" ".join(w[i:i + 3]) for i in range(max(len(w) - 2, 1))}
    s1, s2 = shingles(short), shingles(long_)
    inter = len(s1 & s2)
    assert got[(1, 2)] == (inter, round(inter / len(s1), 4),
                           round(inter / len(s2), 4))
    assert got[(1, 2)][1] == 1.0          # short fully contained
    assert (3, 2) not in got and (1, 3) not in got
    jac = {(r["d1"], r["d2"]): r["jaccard"]
           for r in ngram_jaccard_pairs(df, n=3, min_inter=2).collect()}
    assert jac[(1, 2)] < 0.05             # Jaccard blind to the quote


def test_containment_pairs_threshold_and_empty(spark):
    from lectura.textops import containment_pairs

    rows = [(1, "a b c d e"), (2, "a b c z y"), (3, "q r s t u")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # shared shingle 'a b c' only -> inter=1 < min_inter=2 -> no rows
    assert containment_pairs(df, n=3, min_inter=2).count() == 0
    got = containment_pairs(df, n=3, min_inter=1,
                            min_containment=0.5).collect()
    assert len(got) == 0  # 1/3 containment below 0.5
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert containment_pairs(empty).count() == 0


def test_quantile_sketch_grouped_matches_ungrouped_per_group(spark):
    """D9b: per-group output must equal running the ungrouped sketch
    on each group's rows separately."""
    import random

    from lectura.textops import log_quantile_sketch

    rng = random.Random(11)
    rows = [(f"g{i % 3}", rng.randrange(0, 10**5)) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, x long")
    grouped = {(r["grp"], r["q_num"], r["q_den"]): (r["n"], r["est"])
               for r in log_quantile_sketch(
                   df, "x", group_col="grp").collect()}
    for gname in ("g0", "g1", "g2"):
        solo = {(gname, r["q_num"], r["q_den"]): (r["n"], r["est"])
                for r in log_quantile_sketch(
                    df.filter(F.col("grp") == gname), "x").collect()}
        for k, v in solo.items():
            assert grouped[k] == v
    assert len(grouped) == 9


def test_ann_ivfpq_recall_planted_neighbors(spark):
    """Composed IVF-PQ (residual codes inside probed lists — the IVFADC
    layout): same planted-neighbor setup as the LSH/IVF/PQ tests, must
    recover >=80% of the brute-force top-10."""
    import random

    import numpy as np

    from lectura.vectorops import brute_force_topk, ivfpq_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = np.asarray(emb.filter(F.col("vec_id") == 0).head()["embedding"])
    rng = random.Random(13)
    planted = []
    for i in range(15):
        noise = np.asarray([rng.gauss(0, 0.02) for _ in qvec], dtype=np.float32)
        planted.append((10_000 + i, (qvec + noise).astype(np.float32).tolist(), -1))
    aug = emb.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>, label int")
    )
    exact = [r.vec_id for r in brute_force_topk(aug, list(qvec), k=10).collect()]
    approx = [r.vec_id for r in
              ivfpq_topk(aug, list(qvec), k=10, n_centroids=8, n_probe=3,
                         m=8, pq_centroids=16, rerank=100).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, (recall, exact, approx)


def test_ann_ivfpq_parallelism_invariant(spark):
    """The persisted-index determinism contract extends to the composed
    index: identical top-k at 1 partition and 16 partitions."""
    from lectura.vectorops import ivfpq_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = list(emb.filter(F.col("vec_id") == 0).head()["embedding"])
    r1 = [(r.vec_id, r.cosine) for r in
          ivfpq_topk(emb.coalesce(1), qvec, k=10, n_centroids=8,
                     n_probe=3, m=8, rerank=50).collect()]
    r16 = [(r.vec_id, r.cosine) for r in
           ivfpq_topk(emb.repartition(16), qvec, k=10, n_centroids=8,
                      n_probe=3, m=8, rerank=50).collect()]
    assert r1 == r16 and len(r1) == 10
