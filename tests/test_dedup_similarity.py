"""Dedup + similarity: planted near-dups must surface; exact maths check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medacy_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_candidates,
)
from medacy_spark.operators.similarity import brute_force_topk, lsh_bucketed_topk


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")  # one-word edit
    far = "completely different words nothing shared here at all everything new"
    rows = [(1, base), (2, base), (3, near), (4, far)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark):
    d = _corpus(spark)
    groups = exact_duplicates(d).collect()
    assert len(groups) == 1
    assert sorted(groups[0]["doc_ids"]) == [1, 2]


def test_minhash_finds_planted_near_dup(spark):
    d = _corpus(spark)
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(d).collect()}
    assert (1, 2) in pairs          # identical: all bands collide
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup: some band collides
    assert all(4 not in p for p in pairs)      # far doc never pairs


def test_simhash_identical_is_zero_hamming(spark):
    from medacy_spark.operators.dedup import simhash64_table

    d = _corpus(spark)
    cands = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_candidates(d).collect()}
    assert cands.get((1, 2)) == 0  # identical docs always collide at distance 0
    # signature-level: near-dup is closer than the unrelated doc
    sig = {r["id"]: r["sh"] for r in simhash64_table(d).collect()}
    ham = lambda a, b: bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")
    assert ham(1, 2) == 0
    assert ham(1, 3) < ham(1, 4)


def test_ngram_jaccard_exact_value(spark):
    a = "w1 w2 w3 w4"   # shingles: {w1 w2 w3, w2 w3 w4}
    b = "w1 w2 w3 w5"   # shingles: {w1 w2 w3, w2 w3 w5}
    d = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    rows = ngram_jaccard_pairs(d, n=3, threshold=0.1).collect()
    assert len(rows) == 1
    assert abs(rows[0]["jaccard"] - 1 / 3) < 1e-12


def test_dedup_and_clean_corpus(spark):
    from medacy_spark.operators.dedup import clean_corpus, dedup_corpus

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away to the old barn where it sleeps all day long")
    rows = [
        (1, base),
        (2, base),                                   # exact dup of 1
        (3, base.replace("barn", "shed")),           # near dup of 1
        (4, "totally different content with no shared shingles at all here"
            " and the words keep being distinct everywhere throughout"),
        (5, "x y"),                                  # low quality (short)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in dedup_corpus(df).collect()}
    assert 1 in kept and 4 in kept and 5 in kept
    assert 2 not in kept        # exact dup removed (same cluster, higher id)
    assert 3 not in kept        # near dup removed

    cleaned = {r["doc_id"] for r in clean_corpus(df, min_quality=0.3).collect()}
    assert cleaned == {1, 4}    # dup cluster collapsed + low-quality dropped


def test_ivf_recall_vs_brute_force(spark):
    from medacy_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 10").select(F.col("vec_id").alias("q_id"), "embedding")
    bf = {(r["q_id"], r["vec_id"]) for r in brute_force_topk(emb, q, k=5).collect()}
    iv = {(r["q_id"], r["vec_id"]) for r in
          ivf_topk(emb, q, n_cells=8, n_probe=4, k=5).collect()}
    recall = len(bf & iv) / len(bf)
    assert recall >= 0.5        # probing half the cells on random vectors
    # self-match must always survive (its cell is probed first)
    assert all((i, i) in iv for i in range(10))


def test_topk_self_match_and_lsh_consistency(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 4").select(F.col("vec_id").alias("q_id"), "embedding")
    bf = brute_force_topk(emb, q, k=5)
    top1 = {r["q_id"]: r["vec_id"] for r in bf.filter("rank = 1").collect()}
    assert top1 == {i: i for i in range(4)}  # each query's best match = itself
    # LSH results are a subset of the corpus with scores matching brute force
    ls = lsh_bucketed_topk(emb, q, dim=64, k=5).select("q_id", "vec_id", "score")
    j = ls.join(
        bf.select("q_id", "vec_id", F.col("score").alias("bf_score")),
        ["q_id", "vec_id"], "left"
    )
    mismatch = j.filter(
        F.col("bf_score").isNotNull() & (F.abs(F.col("score") - F.col("bf_score")) > 1e-9)
    )
    assert mismatch.count() == 0
    # self-match always lands in its own bucket
    assert {r["q_id"] for r in ls.filter("q_id = vec_id").collect()} == {0, 1, 2, 3}


def test_simhash_block_banding_guarantee(spark):
    """Manku block banding: every pair within Hamming distance 3 MUST be a
    candidate (pigeonhole over C(6,3) block-combination keys), verified
    against brute-force Hamming over the signature table."""
    from itertools import combinations

    from medacy_spark.operators.dedup import simhash64_table

    d = _corpus(spark)
    sig = {r["id"]: r["sh"] for r in simhash64_table(d).collect()}
    ham = lambda a, b: bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")
    truth = {
        (a, b) for a, b in combinations(sorted(sig), 2) if ham(a, b) <= 3
    }
    cands = {(r["id_a"], r["id_b"]) for r in simhash_candidates(d).collect()}
    assert truth <= cands
    # reported hamming is exact
    for r in simhash_candidates(d).collect():
        assert r["hamming"] == ham(r["id_a"], r["id_b"])


def test_ngram_jaccard_hot_shingle_cap(spark):
    """max_shingle_df drops boilerplate shingles from the pair join; sizes
    still count them, so jaccard is a lower bound and disjoint-but-for-
    boilerplate docs stop pairing."""
    boiler = "of the and"
    rows = [
        (1, f"{boiler} alpha beta gamma delta"),
        (2, f"{boiler} epsilon zeta eta theta"),
        (3, f"{boiler} alpha beta gamma delta"),   # true dup of 1
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {(r["id_a"], r["id_b"]) for r in
                ngram_jaccard_pairs(d, n=3, threshold=0.05).collect()}
    assert (1, 2) in uncapped          # hot shingle pairs everything
    capped = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
              ngram_jaccard_pairs(d, n=3, threshold=0.05, max_shingle_df=2).collect()}
    assert (1, 2) not in capped        # boilerplate-only pair gone
    assert (1, 3) in capped            # true dup survives (lower-bound score)


def test_exact_duplicates_payload_cap(spark):
    from medacy_spark.operators.dedup import exact_duplicates

    rows = [(i, "same text") for i in range(10)] + [(99, "unique")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    g = exact_duplicates(d, max_ids=3).collect()
    assert len(g) == 1
    assert g[0]["n"] == 10              # true count survives the cap
    assert g[0]["doc_ids"] == [0, 1, 2]  # smallest ids kept


def test_ivf_kmeans_recall_sf001(spark):
    """VERDICT r1 #8 gate: one k-means refinement + 8-of-16 probes reaches
    recall@10 ≥ 0.9 vs brute force on the sf0.01 embeddings (deterministic
    — seeds, assignment and means are all arithmetic)."""
    import os

    from medacy_spark.operators.similarity import brute_force_topk, ivf_topk

    path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("sf0.01 testdata unavailable")
    emb = spark.read.parquet(path)
    q = emb.filter("vec_id < 20").select(F.col("vec_id").alias("q_id"), "embedding")
    bf = {(r["q_id"], r["vec_id"]) for r in brute_force_topk(emb, q, k=10).collect()}
    iv = {(r["q_id"], r["vec_id"]) for r in
          ivf_topk(emb, q, n_cells=16, n_probe=8, k=10, kmeans_iters=1).collect()}
    assert len(bf & iv) / len(bf) >= 0.9


def test_hot_shingle_guard_default_on_boilerplate(spark, caplog):
    """A boilerplate shingle planted across >1000 docs trips the DEFAULT
    guard: the run completes, the drop is logged (never silent), and
    boilerplate-only doc pairs do not flood the output."""
    import logging

    n_docs = 1100
    rows = [(i, f"terms of service apply w{i} x{i} y{i} z{i}") for i in range(n_docs)]
    # one genuine near-dup pair sharing real content beyond the boilerplate
    rows.append((n_docs, "terms of service apply w7 x7 y7 q"))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    with caplog.at_level(logging.WARNING, logger="medacy_spark.operators.dedup"):
        pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in ngram_jaccard_pairs(d, n=3, threshold=0.3).collect()}
    assert any("dropping" in rec.message for rec in caplog.records)
    # the only surviving pair is the genuine near-dup (7, 1100)
    assert set(pairs) == {(7, n_docs)}
    # explicit None still computes the exact quadratic variant on demand
    exact = ngram_jaccard_pairs(
        d.filter(F.col("doc_id") < 5), n=3, threshold=0.05, max_shingle_df=None
    ).count()
    assert exact == 10  # all C(5,2) pairs share the boilerplate shingles


def test_dedup_corpus_verify_threshold(spark):
    """verify_threshold confirms sketch candidates by exact Jaccard before
    clustering: a sketch-level collision below the exact threshold no
    longer deletes a survivor."""
    from medacy_spark.operators.dedup import dedup_corpus

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),
        (1, base),  # true near-dup of 0 (identical shingles)
        (2, "completely different words entirely unrelated content here now"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r["doc_id"]
        for r in dedup_corpus(d, min_bands=1, verify_threshold=0.8).collect()
    )
    assert kept == [0, 2]


def test_hot_bucket_guard_star_topology_small(spark):
    """Topology unit check at a tiny cap: a 5-member identical cluster
    with max_bucket_size=3 emits star edges (hub = bucket min) instead of
    all pairs; max_bucket_size=None restores the exact all-pairs join."""
    text = "alpha beta gamma delta epsilon zeta eta theta"
    d = spark.createDataFrame(
        [(i, text) for i in range(5)], "doc_id long, text string"
    )
    star = {(r["id_a"], r["id_b"])
            for r in minhash_lsh_candidates(d, max_bucket_size=3).collect()}
    assert star == {(0, 1), (0, 2), (0, 3), (0, 4)}
    full = {(r["id_a"], r["id_b"])
            for r in minhash_lsh_candidates(d, max_bucket_size=None).collect()}
    assert len(full) == 10  # C(5,2)
    sh = {(r["id_a"], r["id_b"]): r["hamming"]
          for r in simhash_candidates(d, max_bucket_size=3).collect()}
    assert set(sh) == {(0, 1), (0, 2), (0, 3), (0, 4)}
    assert all(h == 0 for h in sh.values())  # hub sh carried correctly


def test_hot_bucket_guard_megacluster(spark, caplog):
    """A planted near-identical megacluster (1500 members differing by one
    trailing token — survives exact dedup, collides in nearly every
    minhash band) trips the DEFAULT guard: the run completes with O(k)
    star candidates instead of ~k²·bands/2 rows, the switch is logged,
    and dedup_corpus still collapses the cluster to its min id."""
    import logging

    from medacy_spark.operators.dedup import dedup_corpus

    n = 1500
    common = " ".join(f"w{j}" for j in range(60))
    rows = [(i, f"{common} tail{i}") for i in range(n)]
    rows.append((n, "a wholly different document sharing none of those words at all"))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    with caplog.at_level(logging.WARNING, logger="medacy_spark.operators.dedup"):
        n_pairs = minhash_lsh_candidates(d).count()
    assert any("star topology" in rec.message for rec in caplog.records)
    # star caps the blowup: ≲ k pairs (hub→member), never ~k²/2 ≈ 1.1M
    assert n_pairs <= 2 * n
    # default min_bands=2: star edges are EXEMPT from the band filter
    # (n_hot_bands marking) — without the exemption every hub edge counts
    # only its star rows and a threshold filter could silently un-dedup
    # the exact megacluster the guard exists for
    kept2 = sorted(r["doc_id"] for r in dedup_corpus(d).collect())
    kept = sorted(r["doc_id"] for r in dedup_corpus(d, min_bands=1).collect())
    assert kept2 == kept
    # all 1499 duplicate members removed through the star hubs. Under the
    # old linear permutation families (a_i*h + b_i of ONE base hash) a
    # few members escaped with zero candidate edges: a low base-hash draw
    # on a doc's unique tail shingle stayed the min under every linear
    # map — lattice-correlated band outcomes, recall orders of magnitude
    # below theory (see perm_hash's docstring for the measured history).
    # Independent per-permutation hashes restore the theory rate,
    # P(all 8 bands diverge) ≈ (1-(57/58)^4)^8 ≈ 2e-10 per member.
    assert kept == [0, n]
