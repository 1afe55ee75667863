"""Scaling measurement for graph.connected_components (companion to
tools/pagerank_scaling.py): the same synthetic graph at two core
counts, reporting wall seconds and edges/sec. Run each level in its
OWN process (python tools/cc_scaling.py <cores> [n_edges]); never run
Spark work concurrently, and bracket with tools/cpu_calibrate.py per
BENCH.md discipline.

The graph is a deterministic hash-random sparse graph (nodes =
n_edges/2) — a supercritical Erdos-Renyi-ish shape with one giant
component plus fringe, which is what a same_as linking graph looks
like after dedup banding; min-label propagation needs several rounds
to converge, so the per-iteration plan cost actually shows.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    cores = int(sys.argv[1])
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from medacy_spark.operators.graph import connected_components
    from medacy_spark.session import get_spark

    spark = get_spark(app_name=f"cc_scaling_{cores}", cores=cores)
    n_nodes = n_edges // 2
    e = (
        spark.range(n_edges)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias("dst"),
        )
        .localCheckpoint()  # exclude synth cost from the measurement
    )
    # warm-up (codegen + shuffle infra) at a tenth of the size
    connected_components(e.limit(n_edges // 10)).count()
    best = float("inf")
    iters = None
    for _ in range(3):
        stats: dict = {}
        t0 = time.monotonic()
        r = connected_components(e, stats=stats)
        n_comp = r.select("component").distinct().count()
        best = min(best, time.monotonic() - t0)
        iters = stats["iterations"]
    print(json.dumps({
        "cores": cores, "n_edges": n_edges, "iterations": iters,
        "n_components": n_comp, "wall_sec": round(best, 2),
        "edges_per_sec": round(n_edges / best),
    }))


if __name__ == "__main__":
    main()
