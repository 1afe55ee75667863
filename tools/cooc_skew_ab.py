"""Mega-document straggler A/B for cooccurrence_pairs(max_segment=...).

Corpus = n normal web-entropy docs (60 words) + ONE planted mega-doc of
`mega` tokens. The co-occurrence window partitions by doc, so the
mega-doc is a single task in the unsegmented plan — the critical path.
The segmented plan cuts it into ≤max_segment-row halo-carrying segments
(bit-identical counts, gated in test_embeddings_train) and spreads them
across the executor.

Prints best-of-N walls for both plans plus the count-table row count
from each (must match). Run alone on an idle host.

Usage: python tools/cooc_skew_ab.py [cores] [n_docs] [mega_tokens] [trials]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

VOCAB = 2048


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    mega = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from pyspark.sql import functions as F

    from medacy_spark.operators.embeddings_train import cooccurrence_pairs
    from medacy_spark.session import get_spark

    spark = get_spark(app_name=f"cooc_skew_{cores}", cores=cores)

    def toks():
        words = F.transform(
            F.sequence(F.lit(1), F.lit(60)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(VOCAB)).cast("string"),
            ),
        )
        normal = spark.range(n_docs, numPartitions=32).select(
            F.col("id").alias("doc_id"), words.alias("ws")
        )
        # the planted mega-doc: one row, `mega` tokens
        mega_words = F.transform(
            F.sequence(F.lit(1), F.lit(mega)),
            lambda i: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(F.lit(-1), i), F.lit(VOCAB)).cast("string")
            ),
        )
        big = spark.range(1).select(
            F.lit(n_docs + 1).cast("long").alias("doc_id"), mega_words.alias("ws")
        )
        return normal.unionByName(big).select(
            "doc_id", F.posexplode("ws").alias("pos", "word")
        )

    def job(max_segment, dense):
        # value checksum over (word, ctx, n), not a row count: a bug
        # that perturbs counts without changing the key set must flip
        # `match` to false
        row = (
            cooccurrence_pairs(
                toks(), window=5, id_cols=("doc_id",), order_col="pos",
                max_segment=max_segment, dense_positions=dense,
            )
            .agg(
                F.count("*").alias("rows"),
                # XOR fold: order-independent and cannot overflow (a
                # sum of 4M xxhash64 longs trips ANSI ARITHMETIC_OVERFLOW)
                F.expr("bit_xor(xxhash64(word, ctx, n))").alias("chk"),
            )
            .first()
        )
        return row["rows"], int(row["chk"])

    out = {"cores": cores, "n_docs": n_docs, "mega_tokens": mega}
    plans = (
        ("unsegmented", None, False),
        ("segmented_general", 100_000, False),
        ("segmented_dense", 100_000, True),  # posexplode positions ARE dense
    )
    for name, seg, dense in plans:
        n_pairs, chk = job(seg, dense)  # warm-up + checksum capture
        walls = []
        for _ in range(trials):
            t0 = time.monotonic()
            job(seg, dense)
            walls.append(round(time.monotonic() - t0, 2))
        out[name] = {
            "n_pairs": n_pairs, "chk": chk,
            "walls_s": walls, "best_s": min(walls),
        }
    out["match"] = (
        out["unsegmented"]["chk"]
        == out["segmented_general"]["chk"]
        == out["segmented_dense"]["chk"]
    ) and (
        out["unsegmented"]["n_pairs"]
        == out["segmented_general"]["n_pairs"]
        == out["segmented_dense"]["n_pairs"]
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
