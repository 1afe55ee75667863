"""Scaling measurement for graph.pagerank (north-rule two-parallelism
evidence): the same synthetic graph at two core counts, reporting wall
seconds and edges/sec. Run each level in its OWN process
(python tools/pagerank_scaling.py <cores> [n_edges] [iters]); never run
Spark work concurrently, and bracket with tools/cpu_calibrate.py per
BENCH.md discipline.

The graph is deterministic hash-derived with a power-law-ish in-degree
skew (dst keys concentrated by a modular square) — the shape a KG edge
table actually has (hub concepts), so the per-iteration groupBy(dst)
sees realistic key imbalance rather than a uniform toy.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    cores = int(sys.argv[1])
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    mat_every = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from medacy_spark.operators.graph import pagerank
    from medacy_spark.session import get_spark

    spark = get_spark(app_name=f"pagerank_scaling_{cores}", cores=cores)
    n_nodes = n_edges // 4
    e = (
        spark.range(n_edges)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
            # square-of-hash concentrates dst mass on small residues:
            # hub-heavy in-degree distribution
            F.pmod(
                F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000))
                * F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)),
                F.lit(n_nodes),
            ).alias("dst"),
        )
        .localCheckpoint()  # exclude synth cost from the measurement
    )
    # warm-up (codegen + shuffle infra) at a tenth of the size
    pagerank(e.limit(n_edges // 10), iterations=2, materialize_every=mat_every)
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        r = pagerank(e, iterations=iters, materialize_every=mat_every)
        r.count()
        best = min(best, time.monotonic() - t0)
    print(json.dumps({
        "cores": cores, "n_edges": n_edges, "iters": iters,
        "materialize_every": mat_every, "wall_sec": round(best, 2),
        "edges_per_sec": round(n_edges * iters / best),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
