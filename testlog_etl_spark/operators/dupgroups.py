"""Duplicate-group resolution: turn verified near-duplicate PAIRS into
duplicate COMPONENTS and pick one canonical document per component.

This is the stage real dedup pipelines need after MinHash/LSH: pair
output alone can't answer "which docs do I keep?" because duplicates
chain (A~B, B~C but A!~C must still collapse to ONE kept doc). The
answer is connected components over the pair graph, with the component's
minimum doc id as the deterministic group id / canonical survivor.

Scale design (the reason this is iterative DataFrame code, not a
`collect()` + union-find on the driver):

- min-label propagation with POINTER JUMPING: each iteration every node
  takes the min of (its label, its neighbors' labels), then labels are
  contracted through the label table itself (``comp <- label[comp]``).
  Neighbor-min alone needs O(diameter) rounds (a 1M-doc duplicate chain
  would need 1M rounds); pointer jumping halves path lengths every
  round, giving O(log n) convergence -- the Hash-to-Min bound (Rastogi
  et al., "Finding Connected Components in Map-Reduce in Logarithmic
  Rounds", ICDE 2013).
- each round is two key-shuffles (edge join + groupBy min, then the
  label self-join); the shuffled rows are (long, long) pairs only --
  never text or signatures.
- ``localCheckpoint(eager=True)`` after every round truncates the plan:
  without it the lineage doubles per iteration and Catalyst analysis
  time explodes around round ~8. On a real cluster with unreliable
  executors you'd use ``spark.sparkContext.setCheckpointDir`` + reliable
  ``checkpoint()`` instead; local mode has no such dir, so the operator
  uses the executor-storage variant.
- convergence is detected with a ``changed == 0`` probe (a LIMIT 1
  count on the rows whose label shrank): one cheap action per round,
  bounded by ``max_iter`` as a runaway guard.

Duplicate graphs in practice are many tiny cliques plus rare hub
components (boilerplate), so expected rounds ~2-3; the log-n bound is
the worst case, not the common one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """(id, comp) for every node appearing in ``edges``; ``comp`` is the
    smallest node id in the node's connected component.

    Nodes with no edges don't appear -- callers left-join and coalesce
    with the node's own id (see :func:`dup_groups`).
    """
    half = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = half.union(half.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # materialize the edge list ONCE: every iteration joins against sym,
    # and without this the upstream pair-generation pipeline (e.g. the
    # whole LSH band join + verify) re-executes per round -- measured
    # 27 s -> ~4 s on the sf0.1 dup graph
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # 1. neighbor min: smallest label among each node's neighbors
        nbr = (
            sym.join(labels.select(F.col("id").alias("b"), F.col("comp").alias("nb_comp")), "b")
            .groupBy("a")
            .agg(F.min("nb_comp").alias("nb_min"))
            .select(F.col("a").alias("id"), "nb_min")
        )
        stepped = labels.join(nbr, "id", "left").select(
            "id",
            F.col("comp").alias("old"),
            F.least("comp", F.coalesce("nb_min", "comp")).alias("comp"),
        )
        # 2. pointer jump: contract comp through the label table (comp is
        # always some node's id, so the self-join hits). This is what
        # turns O(diameter) into O(log n) rounds.
        jump = stepped.select(F.col("id").alias("comp"), F.col("comp").alias("jmp"))
        new = (
            stepped.join(jump, "comp", "left")
            .select("id", "old", F.least("comp", F.coalesce("jmp", "comp")).alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = new.filter(F.col("comp") < F.col("old")).limit(1).count()
        labels = new.select("id", "comp")
        if changed == 0:
            break
    return labels


def dup_groups(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Attach ``group_id`` (min doc id of the duplicate component; own id
    for docs with no duplicates) and ``is_canonical`` (the one doc per
    group a dedup pass keeps) to every row of ``docs``.

    The join back to ``docs`` is on the doc id -- the component table is
    at most |docs| rows of two longs, so at 100 TB it's still tiny
    relative to the corpus and AQE will broadcast it; no hint needed.
    """
    comp = connected_components(pairs, "id_a", "id_b").withColumnRenamed("id", id_col)
    return (
        docs.join(comp, id_col, "left")
        .withColumn("group_id", F.coalesce("comp", F.col(id_col)))
        .drop("comp")
        .withColumn("is_canonical", (F.col("group_id") == F.col(id_col)).cast("boolean"))
    )


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    weight: str,
    n_iter: int = 5,
    damping: float = 0.85,
    snap_bits: int = 30,
) -> DataFrame:
    """Weighted PageRank as an iterative DataFrame loop: per round,
    contributions rank(src) * weight/out_weight flow along edges, and
    new_rank = (1-d)/N + d * sum(inbound). Dangling mass (nodes without
    out-edges) leaks, the simplest standard variant -- document if a
    graph has sinks.

    Engine-portability uses the kmeans trick: ranks are snapped to the
    2^-snap_bits binary grid after every round (floor(x*2^bits+0.5) --
    exact scaling, half-up floor), so the inbound-sum addition order
    (the only engine-specific quantity) can never accumulate across
    iterations and a sequential replay (the DuckDB twin) lands on
    bit-identical ranks.

    Scale shape: N rides a broadcast 1-row aggregate; each round is
    edges><ranks (ranks and out-weights are |V| rows -- their join
    strategy is deliberately LEFT TO AQE: broadcast while they fit,
    sort-merge beyond; a forced hint here would OOM executors on a
    billion-node graph, the apply_diff lesson) + one sum shuffle keyed
    by dst carrying (node, double) pairs. Driver never sees the rank
    vector; n_iter bounded loops build a static plan chain like
    kmeans_fit.
    """
    g = float(1 << snap_bits)

    def snap(c):
        return F.floor(c * F.lit(g) + F.lit(0.5)) / F.lit(g)

    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n_frame = nodes.agg(F.count(F.lit(1)).alias("_n"))
    out_w = edges.groupBy(F.col(src).alias("_osrc")).agg(F.sum(weight).alias("_ow"))
    e = edges.join(out_w, F.col(src) == F.col("_osrc")).select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), (F.col(weight) / F.col("_ow")).alias("_frac")
    )
    ranks = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node", snap(F.lit(1.0) / F.col("_n")).alias("rank")
    )
    for _ in range(n_iter):
        inbound = (
            e.join(ranks, F.col("_src") == F.col("node"))
            .select(F.col("_dst").alias("node"), (F.col("rank") * F.col("_frac")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(inbound, "node", "left")
            .crossJoin(F.broadcast(n_frame))
            .select(
                "node",
                snap(
                    (1 - damping) / F.col("_n")
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def bfs_levels(edges: DataFrame, seeds: DataFrame, max_iter: int = 12) -> DataFrame:
    """Multi-source BFS: minimum hop count from any seed, as an iterative
    frontier-expansion DataFrame loop (Spark has no recursive CTE; this
    is the standard Pregel-style restatement).

    ``edges`` is directed ``(src, dst)`` -- pass both directions for an
    undirected graph. ``seeds`` has one ``node`` column. Returns
    ``(node, lvl)`` for every node within ``max_iter`` hops; BFS
    first-visit order makes ``lvl`` the exact minimum distance, matching
    a recursive-CTE replay that enumerates all paths and takes
    ``min(lvl)``.

    Scale shape: each round is ONE equi-join of the frontier against the
    edge table (shuffle keyed by node -- AQE broadcasts the frontier
    while it fits) plus an anti-join against the visited set; the driver
    never sees node ids, only the frontier's emptiness bit (limit(1)
    early-stop). ``localCheckpoint`` truncates the per-round lineage so
    a deep graph cannot accumulate a 12-deep union plan.
    """
    visited = seeds.select("node").distinct().withColumn("lvl", F.lit(0).cast("int"))
    visited = visited.localCheckpoint()
    frontier = visited.select("node")
    for i in range(1, max_iter + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("lvl", F.lit(i).cast("int"))
        )
        nxt = nxt.localCheckpoint()
        if not nxt.take(1):
            break
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt.select("node")
    return visited


def kcore_peel(edges: DataFrame, k: int, n_rounds: int) -> DataFrame:
    """Bounded k-core peeling: per round, drop every node whose degree
    among SURVIVING nodes is < k, restrict edges to survivors, repeat.
    Returns (node, deg) for nodes alive after ``n_rounds`` with their
    final-round degree. Fixed round count (not run-to-convergence) so a
    sequential replay -- the chained-CTE oracle -- is exactly this
    computation; callers size n_rounds to the cascade depth they need
    (peeling converges in <= max-degree rounds on any graph).

    Scale shape per round: one degree aggregate keyed by node + two
    semi-joins restricting the edge list; survivors shrink
    monotonically, so round cost falls as the cascade burns out.
    localCheckpoint truncates the per-round plan chain.
    """
    e = edges.select("src", "dst").localCheckpoint()
    deg = None
    for _ in range(n_rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        alive = deg.filter(F.col("deg") >= k).select(F.col("src").alias("node"))
        e = (
            e.join(alive.select(F.col("node").alias("src")), "src", "left_semi")
            .join(alive.select(F.col("node").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint()
        )
    out = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    return out.filter(F.col("deg") >= k).select(F.col("src").alias("node"), "deg")


def sssp_bellman_ford(
    edges: DataFrame, seeds: DataFrame, n_rounds: int
) -> DataFrame:
    """Single-source shortest paths over WEIGHTED edges by bounded
    Bellman-Ford rounds: per round, every edge relaxes
    dist(dst) <- min(dist(dst), dist(src) + w); n_rounds bounds path
    length, so a sequential chained-CTE replay is exactly this
    computation (the kcore/pagerank fixed-rounds playbook on the
    min-plus semiring). ``edges``: (src, dst, w) with integer weights;
    ``seeds``: (node) at distance 0. Returns (node, dist) for nodes
    reached within n_rounds hops -- min is a lattice join, so
    partial-aggregation order can never matter.

    Scale shape per round: ONE equi-join of the frontier-bearing dist
    table against edges (shuffle keyed by node) + a min-combine keyed
    by dst; localCheckpoint truncates the chain.
    """
    dist = seeds.select("node").distinct().withColumn("dist", F.lit(0).cast("long"))
    dist = dist.localCheckpoint()
    for _ in range(n_rounds):
        relaxed = (
            dist.join(edges, dist["node"] == edges["src"])
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist
