"""Connected components vs a driver-side union-find oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from medacy_spark.operators.graph import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_cc_matches_union_find(spark):
    # deterministic pseudo-random sparse graph incl. a long path (worst case
    # for propagation count) and several cliques
    edges = [(i, i + 1) for i in range(0, 40)]                      # path
    edges += [(100 + i, 100 + (i * 7) % 10) for i in range(10)]     # clique-ish
    edges += [(200, 200)]                                           # self-loop
    edges += [(i * 13 % 300 + 300, i * 29 % 300 + 300) for i in range(50)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    want = _union_find(edges)
    assert got == want


def test_cc_string_ids(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_pointer_jumping_convergence(spark):
    """The O(log diameter) claim, gated on the pathological shape: a
    10,000-node path graph (diameter 9,999 — plain min-propagation would
    need ~10k rounds, i.e. hit max_iter and return garbage) must converge
    in ≤ log2(n) + c rounds thanks to the per-iteration pointer jump, and
    every node must land in the single exact component."""
    import math

    from medacy_spark.operators.graph import connected_components

    n = 10_000
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    stats = {}
    comp = connected_components(edges, max_iter=50, stats=stats)
    assert stats["converged"]
    # propagation + one jump per round: label reach more than doubles per
    # iteration; +4 covers the startup round and the final no-change
    # confirmation round
    assert stats["iterations"] <= math.floor(math.log2(n)) + 4
    rows = comp.groupBy("component").count().collect()
    assert len(rows) == 1
    assert rows[0]["component"] == 0 and rows[0]["count"] == n
