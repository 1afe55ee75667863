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


# ---------------------------------------------------------------- pagerank


def _pagerank_ref(edges, iters, d=0.85):
    """Driver-side reference of the exact formulation graph.pagerank pins:
    weighted contributions, dangling mass NOT redistributed."""
    nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    n = len(nodes)
    wout = {}
    for s, _, w in edges:
        wout[s] = wout.get(s, 0.0) + w
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, t, w in edges:
            contrib[t] += r[s] * (w / wout[s])
        r = {v: (1.0 - d) / n + d * contrib[v] for v in nodes}
    return r


def test_pagerank_matches_reference(spark):
    from medacy_spark.operators.graph import pagerank

    # weighted digraph with a dangling node (3), a hub (0), and a cycle
    edges = [
        (1, 0, 1.0), (2, 0, 2.0), (4, 0, 1.0), (0, 3, 1.0),
        (4, 5, 3.0), (5, 6, 1.0), (6, 4, 1.0), (2, 5, 1.0),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r["node"]: r["pagerank"]
        for r in pagerank(df, weight="w", iterations=8).collect()
    }
    want = _pagerank_ref(edges, iters=8)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])
    # ranking sanity: the hub (three in-edges) beats a pure source
    assert got[0] > got[1]
    # dangling node keeps its floor + inflow; total mass undershoots 1
    assert sum(got.values()) < 1.0 + 1e-9


def test_pagerank_unweighted_star(spark):
    from medacy_spark.operators.graph import pagerank

    # star: every leaf points at the center; center rank strictly largest,
    # all leaves identical by symmetry
    edges = [(i, 0) for i in range(1, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["pagerank"] for r in pagerank(df, iterations=5).collect()}
    leaf_vals = {round(got[i], 15) for i in range(1, 9)}
    assert len(leaf_vals) == 1
    assert got[0] > max(got[i] for i in range(1, 9))


def test_pagerank_empty(spark):
    from medacy_spark.operators.graph import pagerank

    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).count() == 0


def test_degree_stats(spark):
    from medacy_spark.operators.graph import degree_stats

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["out_degree"], r["in_degree"])
        for r in degree_stats(df).collect()
    }
    assert got == {1: (2, 2), 2: (1, 1), 3: (1, 2), 4: (1, 0)}


# ---------------------------------------------------------- triangle_counts


def test_triangle_counts_k4_and_path(spark):
    from medacy_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = {
        r["node"]: r["triangles"]
        for r in triangle_counts(
            spark.createDataFrame(k4, "src long, dst long")
        ).collect()
    }
    # K4: 4 triangles, each node on 3 of them
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    assert triangle_counts(path).count() == 0


def test_triangle_counts_matches_bruteforce(spark):
    """Hash-random graph vs itertools brute force; also exercises
    duplicate edges, reversed duplicates, and self-loops (all ignored)."""
    from itertools import combinations

    from medacy_spark.operators.graph import triangle_counts

    n = 40
    edges = set()
    x = 1469598103934665603
    for i in range(200):
        x = (x ^ i) * 1099511628211 % (1 << 64)
        a, b = x % n, (x >> 17) % n
        if a != b:
            edges.add((min(a, b), max(a, b)))
    rows = [(a, b) for a, b in edges]
    # noise the input: reversed dups and a self-loop must not change counts
    rows += [(b, a) for a, b in list(edges)[:20]] + [(5, 5)]
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for a, b, c in combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    got = {
        r["node"]: r["triangles"]
        for r in triangle_counts(
            spark.createDataFrame(rows, "src long, dst long")
        ).collect()
    }
    assert got == want


def test_triangle_counts_hub_no_fanout(spark):
    """Star + one chord: exactly one triangle; the hub's edges orient
    INTO it (degree orientation), so the wedge relation stays O(m) even
    though the hub's undirected degree is n-1."""
    from pyspark.sql import functions as F

    from medacy_spark.operators.graph import triangle_counts

    star = [(0, i) for i in range(1, 50)] + [(1, 2)]
    df = spark.createDataFrame(star, "src long, dst long")
    stats = {}
    got = {
        r["node"]: r["triangles"]
        for r in triangle_counts(df, stats=stats).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1}
    assert "CartesianProduct" not in stats["plan"]
