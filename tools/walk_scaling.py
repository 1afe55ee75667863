"""Scaling measurement for graph.random_walks (north-rule two-parallelism
evidence): 2 walks x 8 steps over the hub-skewed 2M-edge synthetic graph
(the pagerank_scaling.py graph) at two core counts. Run each level in
its OWN process (python tools/walk_scaling.py <cores> [n_edges]) and
bracket with tools/cpu_calibrate.py; best-of-3 inside."""
import json, sys, time
sys.path.insert(0, ".")  # run from the repo root
from pyspark.sql import functions as F
from medacy_spark.operators.graph import random_walks
from medacy_spark.session import get_spark
cores = int(sys.argv[1]); n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
spark = get_spark(app_name=f"walk_scaling_{cores}", cores=cores)
n_nodes = n_edges // 4
e = spark.range(n_edges).select(
    F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
    F.pmod(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000))
           * F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)), F.lit(n_nodes)).alias("dst"),
).localCheckpoint()
random_walks(e.limit(n_edges // 10), n_walks=1, walk_len=4).count()  # warm-up
best = float("inf")
for _ in range(3):
    t0 = time.monotonic()
    random_walks(e, n_walks=2, walk_len=8).count()
    best = min(best, time.monotonic() - t0)
print(json.dumps({"cores": cores, "n_edges": n_edges, "wall_sec": round(best, 2),
                  "node_steps_per_sec": round(2 * 8 * n_nodes / best)}))
spark.stop()
