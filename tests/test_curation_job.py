"""End-to-end curation job (jobs/curation_pipeline.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobs.curation_pipeline import run_curation, synthesize_webtext


def _run(spark, n=1200, **kw):
    stats: dict[str, int] = {}
    out = run_curation(
        spark, synthesize_webtext(spark, n), seq_len=64, stats=stats, **kw
    )
    return out, stats


def test_pipeline_end_to_end(spark):
    out, stats = _run(spark)
    # every gate actually gates: monotone non-increasing survivor counts
    assert stats["input"] == 1200
    assert stats["input"] >= stats["hygiene"] >= stats["fluent"] >= stats["unique"]
    # the planted near-dups (doc_id % 50 == 1 copies % 50 == 0) are removed:
    # of each planted pair at most the min id survives
    ids = {r["doc_id"] for r in out["corpus"].select("doc_id").collect()}
    planted_pairs = [(k, k + 1) for k in range(0, 1200, 50)]
    assert all(not (a in ids and b in ids) for a, b in planted_pairs)
    # PII is scrubbed before anything downstream sees text
    assert out["corpus"].filter(F.col("text").contains("bob@example.com")).count() == 0
    # the perplexity gate keeps ~the quantile
    assert stats["fluent"] <= 0.92 * stats["hygiene"]
    # packing map tiles the surviving corpus exactly
    n_tok = out["corpus"].select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0]["n"]
    packed_tok = out["packed"].agg(F.sum("n_tokens")).collect()[0][0]
    assert packed_tok == n_tok
    st = out["pack_stats"].agg(F.max("fill_frac"), F.min("n_slices")).collect()[0]
    assert st[0] <= 1.0 and st[1] >= 1


def test_pipeline_deterministic(spark):
    out1, s1 = _run(spark, n=600)
    out2, s2 = _run(spark, n=600)
    assert s1 == s2
    a = sorted(map(tuple, out1["packed"].collect()))
    b = sorted(map(tuple, out2["packed"].collect()))
    assert a == b


def test_mixture_stage(spark):
    weights = {f"src{k}": 2.0 if k < 5 else 1.0 for k in range(20)}
    out, stats = _run(spark, n=600, mix_weights=weights)
    src = {
        r["source"]: r["count"]
        for r in out["corpus"].groupBy("source").count().collect()
    }
    base = {
        r["source"]: r["count"]
        for r in _run(spark, n=600)[0]["corpus"].groupBy("source").count().collect()
    }
    for k in range(5):
        assert src.get(f"src{k}", 0) == 2 * base.get(f"src{k}", 0)


def test_decontamination_stage(spark):
    docs = synthesize_webtext(spark, 400)
    # benchmark = exact token windows lifted from two docs → those docs
    # are fully contaminated and must be dropped
    bench = docs.filter("doc_id IN (3, 9)").select(
        F.array_join(
            F.slice(F.split("text", " "), 5, 20), " "
        ).alias("text")
    )
    stats: dict[str, int] = {}
    out = run_curation(
        spark, docs, seq_len=64, benchmark=bench, stats=stats,
        ppl_quantile=1.0,  # isolate the decontamination gate
    )
    ids = {r["doc_id"] for r in out["corpus"].select("doc_id").collect()}
    assert 3 not in ids and 9 not in ids
    assert stats["decontaminated"] < stats["unique"]
    # an untouched doc survives
    assert 5 in ids
