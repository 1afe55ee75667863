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
        labels: Sequence[str] | None = None,
        init: dict[tuple[str, int], float] | None = None,
        average: bool = True,
    ) -> "PerceptronLearner":
        """Collins-style structured perceptron: Viterbi-decode the whole
        sentence under current weights, then update emission AND transition
        features along the gold path (+1) and the predicted path (−1)
        wherever they differ; running-average trick (final = w − u/t).

        ``labels`` fixes the decode label set (the distributed fit passes
        the GLOBAL set so every shard decodes over the same classes);
        ``init`` warm-starts the weights and ``average=False`` returns the
        raw end-state — the pieces iterative parameter mixing needs.
        """
        examples = list(examples)
        if labels is None:
            label_set = {"O"}
            for _, ls in examples:
                label_set.update(ls)
            self.labels = sorted(label_set)
        else:
            self.labels = sorted(set(labels) | {"O"})
        w: dict[tuple[str, int], float] = defaultdict(float, init or {})
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
        if average:
            self.weights = {
                k: v - u[k] / t for k, v in w.items() if v - u[k] / t != 0.0
            }
        else:
            self.weights = {k: v for k, v in w.items() if v != 0.0}
        return self

    # --------------------------------------------------- distributed fit

    def fit_sharded(
        self, sentence_df, n_shards: int = 32, mix_rounds: int = 3
    ) -> "PerceptronLearner":
        """ITERATIVE parameter mixing (McDonald, Hall & Mann, NAACL 2010):
        shard sentences deterministically by doc key; each round, every
        shard trains a local perceptron inside an Arrow batch
        (applyInPandas — never row-level Python) STARTING FROM the
        previous round's mixed weights, over the GLOBAL label set; the
        driver averages the sparse weight dicts. One-shot mixing washes
        out when shards are few/heterogeneous (measured: 7 vs 82 non-O
        predictions on the reference corpus); re-seeding each round makes
        the shards converge on a shared model. Only n_shards weight dicts
        per round reach the driver — model-scale, not corpus-scale; the
        final round trains with averaging on.

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
        ).localCheckpoint(eager=False)  # rounds re-read it; cut the upstream

        # derive the global label set from the CHECKPOINTED table so this
        # scan shares the materialization with the mixing rounds
        global_labels = sorted(
            {"O"}
            | {r["l"] for r in
               sh.select(F.explode("labels").alias("l")).distinct().collect()}
        )

        def make_train(init_blob: bytes, avg: bool):
            def train(pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values(["doc_id", "sent_id"])  # deterministic
                local = PerceptronLearner(epochs, window)
                local.fit(
                    list(zip(pdf["words"], pdf["labels"])),
                    labels=global_labels,
                    init=pickle.loads(init_blob),
                    average=avg,
                )
                return pd.DataFrame({
                    "shard": [int(pdf["shard"].iloc[0])],
                    "blob": [pickle.dumps(local.weights)],
                })
            return train

        mixed: dict[tuple[str, int], float] = {}
        for rnd in range(mix_rounds):
            rows = (
                sh.groupBy("shard")
                .applyInPandas(
                    make_train(pickle.dumps(mixed), rnd == mix_rounds - 1),
                    "shard int, blob binary",
                )
                .collect()
            )
            merged: dict[tuple[str, int], float] = defaultdict(float)
            n = max(len(rows), 1)
            for r in sorted(rows, key=lambda r: r["shard"]):
                for k, v in pickle.loads(bytes(r["blob"])).items():
                    merged[k] += v / n
            mixed = dict(merged)
        self.labels = global_labels
        self.weights = mixed
        return self
