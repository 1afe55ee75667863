"""Learners behind the X2/X3 broadcast contract.

The reference trains CRF/BiLSTM/BERT learners driver-side, one spaCy Doc
at a time (model.py:88-152; bilstm_crf_learner.py, bert_learner.py —
torch/sklearn_crfsuite are not in this container). This module provides a
non-trivial numpy-only stand-in with the same two-sided contract as
model.FrequencyLearner:

  * fit        — driver-side over collected training sentences (the
                 reference's own X3 shape: training is never distributed
                 there), OR sharded parameter-mixing where each shard
                 trains a local perceptron inside an Arrow batch and the
                 driver averages the sparse weight dicts (McDonald et al.
                 2010, "Distributed training strategies for the
                 structured perceptron" — public).
  * __call__   — (sentences: list[list[str]]) -> list[list[str]] label
                 lists, broadcast to executors and scored in the Arrow
                 batch stage (operators/ner_model.score_sentences).

The model is an averaged structured perceptron (Collins 2002) with
hashed sparse features (stable crc32 — never Python ``hash``, which is
per-process salted) over a ±k word window, plus a previous-label
transition feature decoded EXACTLY with Viterbi (O(L²) per token over a
label set of ≤dozens — negligible next to the emission dot products).
Weights live in a dict keyed (label, feature-hash): vocabulary-scale,
pickles cleanly for broadcast.
"""

from __future__ import annotations

import zlib
from collections import defaultdict
from collections.abc import Iterable, Sequence

D = 1 << 20  # feature-hash space

_START = "<s>"


def _h(s: str) -> int:
    return zlib.crc32(s.encode()) % D


def token_features(words: Sequence[str], i: int, k: int = 2) -> list[int]:
    """Static (emission) hashed feature ids for token i: surface/prefix/
    suffix/shape-lite of the token and lowercased neighbors in ±k. The
    previous-label transition feature is handled separately by Viterbi."""
    w = words[i]
    lw = w.lower()
    feats = [
        _h("bias"),
        _h("w=" + lw),
        _h("suf3=" + lw[-3:]),
        _h("pre1=" + lw[:1]),
        _h("isnum=" + str(w.replace(".", "", 1).isdigit())),
        _h("istitle=" + str(w.istitle())),
    ]
    for off in range(-k, k + 1):
        if off == 0:
            continue
        j = i + off
        nb = words[j].lower() if 0 <= j < len(words) else "<pad>"
        feats.append(_h(f"{off}:w={nb}"))
    return feats


def _trans_feat(prev_label: str) -> int:
    return _h("prev_label=" + prev_label)


class PerceptronLearner:
    """Averaged structured perceptron; plugs into model.Model and the
    operators/ner_model broadcast + Arrow batch contract."""

    def __init__(self, epochs: int = 5, window: int = 2) -> None:
        self.epochs = epochs
        self.window = window
        self.weights: dict[tuple[str, int], float] = {}
        self.labels: list[str] = ["O"]

    def fresh(self) -> "PerceptronLearner":
        return PerceptronLearner(self.epochs, self.window)

    # ------------------------------------------------------------- scoring

    def _score(self, feats: list[int], label: str) -> float:
        w = self.weights
        return sum(w.get((label, f), 0.0) for f in feats)

    def _viterbi(self, words: Sequence[str]) -> list[str]:
        """Exact argmax over label sequences: emission scores from the
        static features, transition score = weight of the prev_label
        feature under the current label. Score ties break toward the
        lexicographically LARGEST label at each step (deterministic)."""
        n = len(words)
        if n == 0:
            return []
        L = self.labels
        w = self.weights
        trans = {
            p: {y: w.get((y, _trans_feat(p)), 0.0) for y in L}
            for p in [_START, *L]
        }
        emit0 = token_features(words, 0, self.window)
        dp = {y: self._score(emit0, y) + trans[_START][y] for y in L}
        back: list[dict[str, str]] = []
        for i in range(1, n):
            emits = token_features(words, i, self.window)
            ndp: dict[str, float] = {}
            bp: dict[str, str] = {}
            for y in L:
                e = self._score(emits, y)
                best_p = max(L, key=lambda p: (dp[p] + trans[p][y], p))
                ndp[y] = dp[best_p] + trans[best_p][y] + e
                bp[y] = best_p
            dp = ndp
            back.append(bp)
        last = max(L, key=lambda y: (dp[y], y))
        path = [last]
        for bp in reversed(back):
            path.append(bp[path[-1]])
        path.reverse()
        return path

    def __call__(self, sentences: list[list[str]]) -> list[list[str]]:
        return [self._viterbi(s) for s in sentences]

    # ----------------------------------------------------------------- fit

    def fit(
        self,
        examples: Iterable[tuple[Sequence[str], Sequence[str]]],
        epochs: int | None = None,
    ) -> "PerceptronLearner":
        """Collins-style structured perceptron: Viterbi-decode the whole
        sentence under current weights, then update emission AND transition
        features along the gold path (+1) and the predicted path (−1)
        wherever they differ; running-average trick (final = w − u/t)."""
        examples = list(examples)
        label_set = {"O"}
        for _, labels in examples:
            label_set.update(labels)
        self.labels = sorted(label_set)
        w: dict[tuple[str, int], float] = defaultdict(float)
        u: dict[tuple[str, int], float] = defaultdict(float)
        t = 1
        self.weights = w
        for _ in range(epochs or self.epochs):
            for words, gold in examples:
                pred = self._viterbi(words)
                if list(pred) != list(gold):
                    gp, pp = _START, _START
                    for i in range(len(words)):
                        feats = token_features(words, i, self.window)
                        g, y = gold[i], pred[i]
                        if g != y:
                            for f in feats:
                                w[(g, f)] += 1.0
                                u[(g, f)] += t
                                w[(y, f)] -= 1.0
                                u[(y, f)] -= t
                        if (g, gp) != (y, pp):
                            w[(g, _trans_feat(gp))] += 1.0
                            u[(g, _trans_feat(gp))] += t
                            w[(y, _trans_feat(pp))] -= 1.0
                            u[(y, _trans_feat(pp))] -= t
                        gp, pp = g, y
                t += 1
        self.weights = {
            k: v - u[k] / t for k, v in w.items() if v - u[k] / t != 0.0
        }
        return self

    # --------------------------------------------------- distributed fit

    def fit_sharded(self, sentence_df, n_shards: int = 32) -> "PerceptronLearner":
        """Parameter-mixing fit: shard sentences deterministically by doc
        key, train one local averaged perceptron per shard inside an Arrow
        batch (applyInPandas — never row-level Python), and average the
        sparse weight dicts on the driver. Only n_shards weight dicts are
        collected — model-scale, not corpus-scale.

        sentence_df columns: doc_id (any orderable), sent_id int,
        words array<string>, labels array<string>.
        """
        import pickle

        import pandas as pd
        from pyspark.sql import functions as F

        epochs, window = self.epochs, self.window
        sh = sentence_df.select(
            F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(n_shards))
            .cast("int").alias("shard"),
            "doc_id", "sent_id", "words", "labels",
        )

        def train(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["doc_id", "sent_id"])  # deterministic order
            local = PerceptronLearner(epochs, window)
            local.fit(list(zip(pdf["words"], pdf["labels"])))
            return pd.DataFrame({
                "shard": [int(pdf["shard"].iloc[0])],
                "blob": [pickle.dumps((local.labels, local.weights))],
            })

        rows = (
            sh.groupBy("shard")
            .applyInPandas(train, "shard int, blob binary")
            .collect()
        )
        merged: dict[tuple[str, int], float] = defaultdict(float)
        label_set = {"O"}
        n = max(len(rows), 1)
        for r in sorted(rows, key=lambda r: r["shard"]):
            labels, weights = pickle.loads(bytes(r["blob"]))
            label_set.update(labels)
            for k, v in weights.items():
                merged[k] += v / n
        self.labels = sorted(label_set)
        self.weights = dict(merged)
        return self
