"""Canonicalization: connected components + KG materialization (M5/M6).

The reference's canonicalization is per-document union-dedup
(annotations.py:250-264) plus CUI identity from MetaMap. At corpus scale the
north star requires *global* canonicalization: surface forms linked to the
same concept — or chained by same_as edges (shared CUI, alias tables,
high-similarity pairs) — collapse to one node id.

Connected components here is the alternating large-star/small-star
min-label propagation (Kiveris et al., "Connected Components in MapReduce
and Beyond", SOCC'14) expressed purely in DataFrame ops: each iteration is
two self-joins + an aggregation; convergence when no label changes.
localCheckpoint truncates lineage per iteration so plans don't snowball —
standard practice for iterative DataFrame algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Scale-adaptive shuffle sizing for the iterative operators (CC /
# pagerank): they run AQE-off (checkpoint-partitioning preservation), so
# AQE's small-partition coalescing never applies, and a graph of a few
# hundred edges otherwise pays the full configured partition count on
# every one of ~2 shuffles x N iterations — pure scheduling overhead at
# bench scale, and the identical constant would be wrong again on a
# cluster. Partition count is derived from the materialized edge count
# instead (guide §2: derive partitioning from input size); the cap is
# whatever spark.sql.shuffle.partitions is configured to, so production
# clusters keep their tuning.
GRAPH_ROWS_PER_PARTITION = 100_000


def _iter_shuffle_partitions(spark, n_rows: int) -> int:
    cap = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # floor of 2, not 1: a 1-partition hash partitioning normalizes to
    # SinglePartition at checkpoint capture and the preserved-layout
    # join re-inserts an Exchange per iteration (measured via the
    # one-Exchange plan gate)
    want = max(2, -(-n_rows // GRAPH_ROWS_PER_PARTITION))  # ceil div
    return min(cap, want)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """edges(src, dst) -> (node, component) with component = min node id of
    the component (ids must be orderable; strings fine).

    Implementation: repeated min-neighbor propagation over the undirected
    edge set, with the node's own current label included, plus one
    pointer-jumping round per iteration — O(log diameter) rounds on a
    path graph (gate-tested on a 10k-node chain in
    test_graph.test_pointer_jumping_convergence), far fewer on clustered
    linking graphs (alias clusters are near-cliques). Each iteration: one
    shuffle (groupBy node) + one broadcast-eligible join.

    ``stats`` (optional dict) gets ``iterations`` (rounds run, including
    the final no-change confirmation round) and ``converged`` written
    into it — the observability hook the convergence gate reads; this
    function is EAGER (it iterates to convergence when called).
    """
    spark = edges.sparkSession
    # Checkpoints created under AQE report Unknown partitioning to their
    # consumers (AdaptiveSparkPlanExec hides the final layout at
    # LogicalRDD capture), which re-inserts a full edge-relation
    # Exchange+Sort into every propagation round. Plan the whole
    # computation AQE-off so the repartition+sortWithinPartitions layout
    # below survives into the loop — same recipe as pagerank, measured
    # there at 1.8x.
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    part_before = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _connected_components_inner(edges, src, dst, max_iter, stats)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", part_before)


def _connected_components_inner(edges, src, dst, max_iter, stats) -> DataFrame:
    # cut the input lineage BEFORE branching: the undirected union reads
    # `edges` twice and every propagation iteration re-reads the edge set —
    # without this an expensive upstream (e.g. minhash candidate generation
    # over 100k docs) is recomputed once per branch per iteration
    # (measured: 25 s → ~1 s for CC over a 502-edge candidate graph)
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .localCheckpoint()
    )
    # size every iteration shuffle to the (now materialized) edge count —
    # the count is a cached-checkpoint scan, not a recompute
    spark = e.sparkSession
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(_iter_shuffle_partitions(spark, e.count())),
    )
    # the undirected relation is consumed once per iteration and its
    # distinct is a shuffle — materialize it ONCE, laid out for the
    # propagation join (partitioned+sorted by the label-carrying end) so
    # each round's edge-side join plans zero exchange and zero sort
    und = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .repartition("b")
        .sortWithinPartitions("b")
        # lazy: iteration 1's single action materializes it once; eager
        # here would cost a separate barrier job (r8: each extra job is
        # ~100-200 ms of fixed overhead, which dominates small graphs)
        .localCheckpoint(eager=False)
    )
    # initial label = min(self, neighbors)
    labels = (
        und.groupBy("a").agg(F.min("b").alias("nbr_min"))
        .select(
            F.col("a").alias("node"),
            F.least("a", "nbr_min").alias("component"),
        )
    )
    labels = labels.localCheckpoint(eager=False)
    n_iter = 0
    converged = False
    for _ in range(max_iter):
        n_iter += 1
        # (1) neighbor propagation: min over adjacent labels
        nbr = (
            und.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("component").alias("nbr_comp"))
        )
        stepped = (
            labels.join(nbr.withColumnRenamed("a", "node"), "node", "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("nbr_comp", "component")
                ).alias("component"),
            )
        )
        # (2) pointer jumping (path compression): label <- label-of-label.
        # Converts O(diameter) propagation into O(log diameter) rounds —
        # the standard trick for long chains in same_as graphs.
        # Lazy checkpoint before the self-join: without it the
        # propagation join+aggregate above executes TWICE per round
        # (once per branch of the uncached lineage).
        stepped = stepped.localCheckpoint(eager=False)
        parent = stepped.select(
            F.col("node").alias("_p"), F.col("component").alias("_pc")
        )
        new_labels = (
            stepped.join(parent, stepped["component"] == parent["_p"], "left")
            .select(
                "node",
                F.least("component", F.coalesce("_pc", "component")).alias("component"),
            )
        )
        # lazy: the changed-count action below materializes (and
        # persists) new_labels in the SAME job — eager was a second
        # barrier job per iteration for no extra safety
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["iterations"] = n_iter
        stats["converged"] = converged
    return labels


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    stats: dict | None = None,
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph —
    clustering structure for the KG (how interlinked a concept's
    neighborhood is; the corpus-scale generalization of the reference's
    pairwise overlap tallies, ref inter_dataset_agreement.py).

    Algorithm: degree orientation (the compact-forward / node-iterator
    bound): orient every edge from the (degree, id)-smaller endpoint to
    the larger, so each node's FORWARD degree is O(√m) and the wedge
    relation Σ outdeg² — the algorithm's intrinsic cost — is bounded
    O(m^1.5) regardless of hub skew (a hub's edges point INTO it, so it
    never fans out wedges). This is why no hot-key guard is needed here
    while the LSH band join carries one.

    Plan: two edge-scale equi-joins (wedge build + closing-edge
    semi-check) + one explode/groupBy for the per-corner credit. The
    oriented relation is consumed three times — localCheckpointed once
    (the never-branch-an-uncached-lineage rule).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    deg = e.select(F.col("a").alias("n")).union(e.select("b")).groupBy("n").agg(
        F.count("*").alias("d")
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("_da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("_db"))
    fwd = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    o = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
        .localCheckpoint()
    )
    wedges = o.join(
        o.select(F.col("u").alias("v"), F.col("v").alias("w")), "v"
    )
    tri = wedges.join(
        o.select(F.col("u").alias("u"), F.col("v").alias("w")),
        ["u", "w"],
        "leftsemi",
    )
    if stats is not None:
        stats["plan"] = tri._jdf.queryExecution().executedPlan().toString()
    return (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 6,
    damping: float = 0.85,
    stats: dict | None = None,
    materialize_every: int = 8,
    seeds: DataFrame | None = None,
    seed_col: str = "node",
) -> DataFrame:
    """Weighted PageRank over edges(src, dst[, weight]) -> (node, pagerank).

    ``seeds`` switches to PERSONALIZED (topic-sensitive) PageRank: the
    teleport mass (1-d) restarts only at the seed nodes (p_i =
    1/|seeds∩nodes|), init = the teleport vector — "entities related to
    THESE" ranking. Raises if no seed appears in the graph. The uniform
    path is byte-identical to before the option existed (oracle-pinned).

    Fixed-iteration power method — the KG analytics companion to
    materialize_nodes_edges (rank concept nodes by citation mass; the
    reference's count-ordered entities, ref inter_dataset_agreement.py
    entity tallies, generalized to graph centrality). Dangling nodes
    (no out-edges) keep the (1-d)/N floor and their mass is NOT
    redistributed — the classic MapReduce formulation; total rank then
    undershoots 1.0 by the dangling mass, which is fine for *ranking*
    and keeps the per-iteration plan to exactly one join + one
    aggregation, replayable closed-form in SQL.

    Scale shape: the edge relation (with its out-degree normalization
    pre-joined) is localCheckpointed ONCE and re-read per iteration;
    ranks are checkpointed per iteration so plans don't snowball.
    Each iteration is one equi-join on src (rank side is node-scale,
    far smaller than edges) + one map-side-combinable groupBy(dst).
    No collect anywhere — N comes from a count on the checkpointed
    node table.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    spark = edges.sparkSession
    # AQE wraps checkpointed plans in AdaptiveSparkPlanExec, whose
    # outputPartitioning reads as Unknown at LogicalRDD capture — which
    # silently re-inserts a full edge-relation Exchange+Sort into EVERY
    # iteration (measured: the whole win below evaporates). Plan the
    # entire computation with AQE off: all relations here are either
    # checkpoint-partitioned or node-scale, the hub-skewed transpose
    # shuffle is tamed by map-side combine (not by AQE, which doesn't
    # split skewed aggregations anyway).
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    part_before = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _pagerank_inner(
            edges, src, dst, w, iterations, damping, stats,
            materialize_every, seeds, seed_col,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", part_before)


def _pagerank_inner(
    edges, src, dst, w, iterations, damping, stats, materialize_every,
    seeds=None, seed_col="node",
) -> DataFrame:
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"), w.alias("_w"))
        .filter(F.col("_s").isNotNull() & F.col("_d").isNotNull())
        .localCheckpoint()
    )
    # size the per-iteration shuffles to the materialized edge count
    # (cached-checkpoint scan; see _iter_shuffle_partitions)
    spark = e.sparkSession
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(_iter_shuffle_partitions(spark, e.count())),
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select("_d"))
        .distinct()
        .repartition("node")
        .sortWithinPartitions("node")
        # lazy: the count() below materializes it in the same job
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pagerank", F.lit(0.0))
    # pre-normalize: each edge carries its share of the source's out-mass,
    # so the per-iteration join never recomputes out-degrees
    outd = e.groupBy("_s").agg(F.sum("_w").alias("_wout"))
    # Lay the edge relation out for the iterative join ONCE:
    # Dataset.localCheckpoint preserves the physical plan's output
    # partitioning AND ordering in the LogicalRDD, so checkpointing
    # after repartition+sortWithinPartitions on the join key means
    # every iteration's sort-merge join reads this side with zero
    # exchange and zero sort — only the node-scale rank side moves.
    # (Same idea as bucketing, without a table.)
    norm = (
        e.join(outd, "_s")
        .select("_s", "_d", (F.col("_w") / F.col("_wout")).alias("_share"))
        .repartition("_s")
        .sortWithinPartitions("_s")
        # lazy: iteration 1 materializes it once inside the final
        # (pipelined) action — eager was a separate barrier job
        .localCheckpoint(eager=False)
    )
    if seeds is None:
        join_base = nodes
        tele = F.lit((1.0 - damping) / n)
        ranks = nodes.select("node", F.lit(1.0 / n).alias("pagerank"))
    else:
        # personalized (topic-sensitive) teleport: mass restarts only at
        # the seed set — (1-d)·p_i with p_i = 1/|seeds∩nodes|. Broadcast
        # seed marker preserves the node layout; init = the teleport
        # vector itself (the standard PPR start).
        sd = seeds.select(F.col(seed_col).alias("node")).distinct()
        marked = nodes.join(
            F.broadcast(sd.withColumn("_is", F.lit(1))), "node", "left"
        )
        k = marked.filter(F.col("_is") == 1).count()
        if k == 0:
            raise ValueError("pagerank: no seed node appears in the graph")
        join_base = marked.select(
            "node",
            F.when(F.col("_is") == 1, F.lit(1.0 / k))
            .otherwise(F.lit(0.0)).alias("_p"),
        ).localCheckpoint()
        tele = F.lit(1.0 - damping) * F.col("_p")
        ranks = join_base.select("node", F.col("_p").alias("pagerank"))
    for it in range(iterations):
        contrib = (
            norm.join(ranks.withColumnRenamed("node", "_s"), "_s")
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum(F.col("pagerank") * F.col("_share")).alias("_in"))
        )
        step = join_base.join(contrib, "node", "left").select(
            "node",
            (tele + F.lit(damping) * F.coalesce("_in", F.lit(0.0))).alias(
                "pagerank"
            ),
        )
        if stats is not None:
            # the observability hook the plan gate reads: the physical
            # plan of ONE iteration, pre-checkpoint — it must stay
            # constant-size across iterations (no lineage snowball)
            stats["last_iter_plan"] = (
                step._jdf.queryExecution().executedPlan().toString()
            )
        # lazy checkpoint: marks the lineage cut but defers
        # materialization, so a block of up to ``materialize_every``
        # iterations pipelines as ONE Spark action instead of one
        # barrier job per round. The periodic eager count bounds the
        # un-materialized plan depth for long runs.
        ranks = step.localCheckpoint(eager=False)
        if (it + 1) % materialize_every == 0:
            ranks.count()
    if stats is not None:
        stats["n_nodes"] = n
    return ranks


def degree_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node (node, out_degree, in_degree) — one pass per direction,
    full-outer merged; the cheap KG health profile that precedes any
    centrality run."""
    o = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("out_degree")
    )
    i = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        o.join(i, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def random_walks(
    edges: DataFrame,
    *,
    n_walks: int = 2,
    walk_len: int = 4,
    src: str = "src",
    dst: str = "dst",
    salt: str = "",
) -> DataFrame:
    """Deterministic random walks — the DeepWalk/node2vec corpus
    generator: from every node with out-edges, ``n_walks`` walks of up
    to ``walk_len`` steps; the walk table feeds the word2vec pipeline
    (embeddings_train) as sentences, giving node embeddings.

    The step choice at (cur, walk, step) is the out-neighbor minimizing
    ``md5(salt:cur:walk:step:dst)`` — a uniform-ish hash draw that is
    engine-portable (md5 is md5 everywhere), rerun-stable, and
    independent across steps/walks via the key; different ``salt``
    values give independent walk sets.  Dead ends truncate the walk.
    Output: (start, walk_id, step, node), step 0 = the start itself.

    Scale shape (the bfs/pagerank recipe): the edge relation is laid
    out ONCE by the join key under AQE-off and localCheckpointed; each
    step is one frontier-sized equi-join + one map-side-combinable
    argmin aggregation (min of a (hash, dst) struct — no window), with
    the frontier checkpointed per step so plans stay flat.
    """
    spark = edges.sparkSession
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _random_walks_inner(edges, n_walks, walk_len, src, dst, salt)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)


def _random_walks_inner(edges, n_walks, walk_len, src, dst, salt) -> DataFrame:
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .repartition("a")
        .dropDuplicates(["a", "b"])
        .sortWithinPartitions("a")
        .localCheckpoint()
    )
    starts = e.select(F.col("a").alias("start")).distinct()
    frontier = starts.select(
        "start",
        F.explode(F.sequence(F.lit(0), F.lit(int(n_walks) - 1))).alias("walk_id"),
    ).select("start", "walk_id", F.col("start").alias("cur")).localCheckpoint()
    rows = [
        frontier.select(
            "start", "walk_id", F.lit(0).alias("step"), F.col("cur").alias("node")
        )
    ]
    for t in range(1, int(walk_len) + 1):
        key = F.md5(
            F.concat_ws(
                ":",
                F.lit(salt),
                F.col("a").cast("string"),  # the current node (cur, renamed)
                F.col("walk_id").cast("string"),
                F.lit(str(t)),
                F.col("b").cast("string"),
            )
        )
        nxt = (
            frontier.withColumnRenamed("cur", "a")
            .join(e, "a")
            .select("start", "walk_id", key.alias("_h"), "b")
            .groupBy("start", "walk_id")
            .agg(F.min(F.struct("_h", "b")).alias("_m"))
            .select("start", "walk_id", F.col("_m.b").alias("cur"))
            .localCheckpoint(eager=False)
        )
        rows.append(
            nxt.select(
                "start", "walk_id", F.lit(t).alias("step"),
                F.col("cur").alias("node"),
            )
        )
        frontier = nxt
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def node_embeddings(
    edges: DataFrame,
    *,
    dim: int = 16,
    n_walks: int = 8,
    walk_len: int = 16,
    window: int = 4,
    src: str = "src",
    dst: str = "dst",
    salt: str = "",
):
    """DeepWalk node embeddings end to end: :func:`random_walks` as the
    sentence corpus → the word2vec pipeline
    (embeddings_train.train_word_vectors: co-occurrence + PPMI + SVD)
    → (sorted node list, L2-normalized vectors).  Fully deterministic;
    graph-close nodes land close in cosine space (gated in
    test_weblinks).  The walk table is walk-count × walk-len × node
    scale; everything downstream is the measured word2vec path."""
    from pyspark.sql import functions as F  # local: keep module header slim

    from medacy_spark.operators.embeddings_train import train_word_vectors

    walks = random_walks(
        edges, n_walks=n_walks, walk_len=walk_len, src=src, dst=dst, salt=salt
    )
    toks = walks.select(
        F.col("start").alias("doc_id"),
        F.col("walk_id").alias("sent_id"),
        F.col("step").alias("tok_id"),
        F.col("node").cast("string").alias("word"),
    )
    return train_word_vectors(toks, dim=dim, window=window)


def same_as_edges(links: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build same_as edges from the links table: every surface form shares
    an edge with its CUI (term-node <-> concept-node), so all aliases of a
    CUI land in one component. Node ids are prefixed strings."""
    return links.select(
        F.concat(F.lit("t:"), F.lower("text")).alias("src"),
        F.concat(F.lit("c:"), F.col("cui")).alias("dst"),
    ).distinct()


def canonicalize_triples(
    links: DataFrame,
    triples: DataFrame,
    id_col: str = "doc_id",
    broadcast_max_terms: int = 2_000_000,
) -> DataFrame:
    """The canonicalization core of materialize_nodes_edges: every
    triple's subj/obj surface form joined to its component
    representative (src_id/dst_id), surface forms without a component
    falling back to themselves. Exposed separately so the plan gate can
    pin the JOIN STRATEGY on the un-checkpointed lineage.

    ``term_canon`` (surface form -> component) is CORPUS-DERIVED: one row
    per distinct lowercased mention surface form. Unlike the gazetteer /
    CUI dictionaries it is NOT bounded — distinct surface forms grow with
    the corpus (typos, numerics, boilerplate variants), and a forced
    broadcast that outgrows executor memory kills the job. So the
    broadcast hint is applied only below ``broadcast_max_terms`` (counted
    against the already-checkpointed component labels — a cheap scan);
    above it the canonicalization joins stay shuffle equi-joins on
    ``_norm``, which is the natural co-partitioned key for both sides.
    2M rows ≈ low-hundreds of MB broadcast — comfortably inside a
    production executor; the threshold is a parameter, not a constant,
    for clusters that differ.
    """
    comp = connected_components(same_as_edges(links, id_col))
    term_canon = comp.filter(F.col("node").startswith("t:")).select(
        F.expr("substring(node, 3)").alias("_norm"), F.col("component").alias("canon")
    )
    # comp is localCheckpointed by connected_components -> counting the
    # filtered projection is a checkpoint scan, not a recompute
    small_enough = term_canon.count() <= broadcast_max_terms
    canon_rel = F.broadcast(term_canon) if small_enough else term_canon

    def canon_of(text_col):
        return F.coalesce(F.col("canon"), F.concat(F.lit("t:"), F.lower(text_col)))

    s = triples.select(
        id_col, "pred",
        F.lower(F.col("subj.text")).alias("_norm"),
        F.col("subj.text").alias("s_text"),
        F.lower(F.col("obj.text")).alias("_obj_norm"),
        F.col("obj.text").alias("o_text"),
    )
    return (
        s.join(canon_rel, "_norm", "left")
        .withColumn("src_id", canon_of(F.col("s_text")))
        .drop("canon", "_norm")
        .withColumnRenamed("_obj_norm", "_norm")
        .join(canon_rel, "_norm", "left")
        .withColumn("dst_id", canon_of(F.col("o_text")))
        .drop("canon", "_norm")
    )


def materialize_nodes_edges(
    links: DataFrame,
    triples: DataFrame,
    id_col: str = "doc_id",
    broadcast_max_terms: int = 2_000_000,
) -> tuple[DataFrame, DataFrame]:
    """Materialize the KG: nodes(canonical_id, label, names) and
    edges(src, pred, dst, weight) — the north-star node/edge tables.

    Canonical id = component representative from connected_components over
    same_as edges (see canonicalize_triples for the join-strategy
    bounds); mentions without a CUI canonicalize to their surface form.
    Edge weight = support count (number of extracted triples).
    """
    s = canonicalize_triples(links, triples, id_col, broadcast_max_terms)
    # the canonicalized relation feeds edges once and the nodes union
    # TWICE — cut the lineage so the triples scan + both term_canon
    # joins run a single time (the single-pass invariant)
    s = s.localCheckpoint(eager=False)
    edges = s.groupBy("src_id", "pred", "dst_id").agg(
        F.count("*").alias("weight")
    )
    nodes = (
        s.select(F.col("src_id").alias("canonical_id"), F.lower("s_text").alias("name"))
        .union(s.select(F.col("dst_id"), F.lower("o_text")))
        .groupBy("canonical_id")
        .agg(F.sort_array(F.collect_set("name")).alias("names"))
    )
    return nodes, edges


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    max_hops: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """Multi-source BFS: (node, dist) for every node reachable from any
    seed within ``max_hops`` edge traversals, dist = exact minimum hop
    count (0 for the seeds themselves).

    The KG neighborhood query: "every entity within k hops of these seed
    concepts" — the expansion step of subgraph extraction / entity-
    neighborhood sampling. Expansion is along src→dst; pass a doubled
    relation for undirected graphs.

    Scale shape (the pagerank/CC recipe): the edge relation is laid out
    ONCE by the join key under AQE-off and localCheckpointed, so every
    hop's frontier-expansion join plans zero exchange and zero sort on
    the edge side — the only per-hop shuffles move frontier-sized data
    (the expansion's distinct and the visited anti-join). Frontier-level
    sets never concentrate on one reducer beyond the graph's own degree
    skew, which the distinct's partial aggregation absorbs. Eager like
    connected_components (it iterates when called).
    """
    spark = edges.sparkSession
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _bfs_inner(edges, seeds, src, dst, node_col, max_hops, stats)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)


def _bfs_inner(edges, seeds, src, dst, node_col, max_hops, stats) -> DataFrame:
    # one exchange, not two: partitioning by `a` alone already satisfies
    # the (a, b) dedup's clustered distribution, so the dropDuplicates
    # runs in-partition after the layout repartition (distinct-then-
    # repartition would shuffle the edge relation twice)
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .repartition("a")
        .dropDuplicates(["a", "b"])
        .sortWithinPartitions("a")
        .localCheckpoint()
    )
    dist = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .select("node", F.lit(0).alias("dist"))
        .localCheckpoint()
    )
    frontier = dist.select("node")
    hops = 0
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.withColumnRenamed("node", "a")
            .join(e, "a")
            .select(F.col("b").alias("node"))
            .distinct()
        )
        new = (
            nxt.join(dist.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).alias("dist"))
            .localCheckpoint()
        )
        if not new.take(1):
            break
        hops = hop
        dist = dist.union(new).localCheckpoint()
        frontier = new.select("node")
    if stats is not None:
        stats["hops"] = hops
    return dist
