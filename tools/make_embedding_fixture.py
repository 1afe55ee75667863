"""Build a word2vec-text embedding fixture covering the PMC sample
vocabulary (VERDICT r5 carry-forward: the reference's BiLSTM presumes
PRETRAINED word2vec — bilstm_crf_learner.py:39-42 hard-requires an
embeddings file — and without one the from-scratch fit is still early
in-sample at the reference's 40-epoch budget).

No gensim in this container, so the unsupervised pretraining is a
count-based word2vec equivalent (Levy & Goldberg 2014: SGNS factorizes
a shifted PPMI matrix): clinical-tokenize the UNLABELED text of the
reference's sample_dataset_1, count ±5-window co-occurrences, apply
PPMI with context-distribution smoothing (alpha=0.75), factorize with
dense SVD, keep 50 dims scaled by sqrt(singular values), and
L2-normalize. No annotation labels are read — this is the standard
"pretrain on in-domain unlabeled text" setup; like any pretrained
embedding table it covers test-document vocabulary too (the reference's
downloaded word2vec does the same), which is why supervised train/test
splits remain untouched.

The whole computation is `operators/embeddings_train.train_word_vectors`
— the distributed co-occurrence count + the deterministic numpy
PPMI+SVD (sign-fixed; two runs produce byte-identical files, asserted
below). This tool is just the corpus + output-path binding.

    python tools/make_embedding_fixture.py [out_path]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

DATASET = "/root/reference/medacy/tests/sample_data/sample_dataset_1"


def main() -> None:
    from medacy_spark.__main__ import _dataset
    from medacy_spark.operators.embeddings_train import (
        train_word_vectors,
        write_word2vec,
    )
    from medacy_spark.operators.tokenize import tokenize_clinical
    from medacy_spark.session import get_spark

    out = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/pmc_word2vec.txt"
    spark = get_spark(app_name="embedding_fixture", cores=8)
    docs, _gold = _dataset(spark, DATASET)
    toks = tokenize_clinical(docs).localCheckpoint()
    vocab, vecs = train_word_vectors(toks)
    vocab2, vecs2 = train_word_vectors(toks)  # determinism: bit-identical
    assert vocab == vocab2 and np.array_equal(vecs, vecs2), "SVD not deterministic"
    write_word2vec(out, vocab, vecs)
    print(f"wrote {out}: {len(vocab)} words x {vecs.shape[1]} dims")
    # sanity: nearest neighbours of a few clinical anchors
    index = {w: i for i, w in enumerate(vocab)}
    for probe in ("rats", "dose", "exposure", "effects"):
        if probe in index:
            sims = vecs @ vecs[index[probe]]
            top = np.argsort(-sims)[1:5]
            print(probe, "->", [(vocab[t], round(float(sims[t]), 3)) for t in top])
    spark.stop()


if __name__ == "__main__":
    main()
