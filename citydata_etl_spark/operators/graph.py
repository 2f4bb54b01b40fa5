"""Iterative graph operators over edge DataFrames.

Connected components (the dedup-groups machinery) lives in
operators/dedup.py:dedup_groups; this module holds the rank-propagation
family. Everything follows the same iterative-join discipline proven
there: each iteration is ONE equi-join + ONE aggregate, per-iteration
the frontier goes through util.plan_truncator (scoped persist locally —
re-executions serve every level from cache; reliable checkpoint at
cluster scale), and nothing data-sized ever reaches the driver — the
only driver scalar is the node count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from citydata_etl_spark.caching import scoped_persist
from citydata_etl_spark.util import plan_truncator


def _floor_div(a, b):
    """Exact floor division for NON-NEGATIVE bigint columns with b >= 1:
    subtract the modulus so the double division is exact (numerator
    divides evenly and stays < 2^53 for micro-scaled ranks). The same
    engine-portable idiom as multimodal's duration math — DuckDB's `//`
    states the identical value."""
    return ((a - a % b) / b).cast("bigint")


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
    total_micros: int = 1_000_000,
    damping_pct: int = 85,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """PageRank over an edge list, in EXACT integer micros — `n_iter`
    synchronous power iterations of

        pr'(v) = floor(total*(100-d)/100 / N)
               + floor(d * sum_{u->v} floor(pr(u) / outdeg(u)) / 100)

    All arithmetic is integer floor division, so the result is bit-exact
    under any partitioning AND reproducible by any other engine stating
    the same recurrence (mass lost to flooring is deterministic). Output:
    (node, pr) for every node.

    Shape per iteration: edges x pr equi-join on the source, one hash
    aggregate on the destination, one left join back to the node set —
    the standard distributed PageRank step (no adjacency matrices, no
    driver-side state). Self-loops are dropped and edges deduplicated up
    front; the edge+outdeg relation is persisted once and reused across
    iterations; each iteration's rank relation goes through
    plan_truncator (persisted locally so re-executions hit the cache;
    reliably checkpointed at cluster scale). Dangling nodes (no out-edges) simply contribute
    nothing — their mass falls out of circulation, matching the stated
    recurrence rather than the redistribute-variant.

    The only driver-side value is N (one count). At 100 TB the node and
    edge relations stay fully distributed. Frontier-materialization
    policy is the `checkpoint_dir` knob (util.plan_truncator): None
    persists each iteration (re-executions serve every level from
    cache; see the r17 note there); a fault-tolerant path switches
    every iteration to RELIABLE checkpoint() so the frontier survives
    executor loss — the correct default posture for long iterative
    jobs on a large cluster.
    """
    truncate = plan_truncator(edges.sparkSession, checkpoint_dir)
    e = (
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .filter(F.col("_src") != F.col("_dst"))
        .distinct()
    )
    nodes = scoped_persist(
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("_src").agg(F.count("*").alias("_outdeg"))
    ed = scoped_persist(e.join(deg, "_src"))

    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr", F.lit(0).cast("bigint"))
    base = (total_micros * (100 - damping_pct) // 100) // n
    pr = nodes.select(
        "node", F.lit(total_micros // n).cast("bigint").alias("pr")
    )
    for _ in range(n_iter):
        contrib = ed.join(pr, ed["_src"] == pr["node"]).select(
            F.col("_dst").alias("_to"),
            _floor_div(F.col("pr"), F.col("_outdeg")).alias("_c"),
        )
        sums = contrib.groupBy("_to").agg(F.sum("_c").alias("_s"))
        pr = (
            nodes.join(sums, nodes["node"] == sums["_to"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + _floor_div(
                        F.lit(damping_pct) * F.coalesce(F.col("_s"), F.lit(0)),
                        F.lit(100),
                    )
                )
                .cast("bigint")
                .alias("pr"),
            )
        )
        pr = truncate(pr)
    return pr


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected graph — the classic
    cohesion signal (clustering coefficients, spam-farm detection in
    crawl host graphs) — via the DEGREE-ORIENTED wedge join, never the
    naive triple self-join the oracle states.

    Edges are canonicalized undirected (self-loops dropped, both
    directions collapsed), then each edge orients from its LOWER
    (degree, node) endpoint to the higher — a total order, compared as
    a struct. Wedges form by joining a node's out-edges pairwise
    (u->v, u->w with v before w), and a wedge closes into a triangle
    iff the oriented edge v->w exists — one more equi-join. Every
    triangle is found exactly once (its unique orientation-ordered
    form), so there is no dedup exchange.

    Why orientation matters at 100 TB: out-degree under degree
    orientation is bounded by O(sqrt(|E|)) for any graph, so the wedge
    join's fanout is sum(outdeg^2) <= |E|^(3/2) — a hub with degree
    10^6 contributes NOTHING quadratic because all its edges point
    INTO it. The naive form explodes on exactly those hubs. Output is
    total over nodes: (node, n_triangles), zero included.
    """
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    und = (
        edges.select(a.alias("_a"), b.alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
    )
    both = und.select(F.col("_a").alias("node")).union(
        und.select(F.col("_b").alias("node"))
    )
    deg = both.groupBy("node").agg(F.count("*").alias("_deg"))
    nodes = scoped_persist(deg.select("node"))
    da = deg.select(
        F.col("node").alias("_a"), F.struct("_deg", "node").alias("_ra")
    )
    db = deg.select(
        F.col("node").alias("_b"), F.struct("_deg", "node").alias("_rb")
    )
    oriented = scoped_persist(
        und.join(da, "_a")
        .join(db, "_b")
        .select(
            F.when(F.col("_ra") < F.col("_rb"), F.col("_a"))
            .otherwise(F.col("_b"))
            .alias("lo"),
            F.when(F.col("_ra") < F.col("_rb"), F.col("_b"))
            .otherwise(F.col("_a"))
            .alias("hi"),
            F.when(F.col("_ra") < F.col("_rb"), F.col("_rb"))
            .otherwise(F.col("_ra"))
            .alias("hi_rank"),
        )
    )
    e1 = oriented.select(
        F.col("lo").alias("u"), F.col("hi").alias("v"),
        F.col("hi_rank").alias("rv"),
    )
    e2 = oriented.select(
        F.col("lo").alias("u"), F.col("hi").alias("w"),
        F.col("hi_rank").alias("rw"),
    )
    wedges = e1.join(e2, "u").filter(F.col("rv") < F.col("rw"))
    closing = oriented.select(
        F.col("lo").alias("v"), F.col("hi").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    per_node = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("_c"))
    )
    return nodes.join(per_node, "node", "left").select(
        "node",
        F.coalesce(F.col("_c"), F.lit(0)).cast("bigint").alias("n_triangles"),
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Multi-source BFS hop distance over a directed edge list: for
    every node, the minimum number of edges from ANY seed node, capped
    at `n_iter` frontier expansions; nodes unreached within the cap get
    -1. The crawl-frontier / link-distance primitive (seed-host
    proximity scoring, contamination blast-radius walks).

    Shape per iteration: dist x edges equi-join on the source + one
    min-aggregate — the same iterative-join discipline as pagerank, and
    the same `checkpoint_dir` knob (None = per-iteration persist;
    fault-tolerant path = reliable checkpoint surviving executor loss).
    The frontier relation is never collected; nothing data-sized
    reaches the driver. Monotone convergence: dist only ever shrinks,
    so n_iter beyond the graph diameter is a fixpoint no-op.
    """
    truncate = plan_truncator(edges.sparkSession, checkpoint_dir)
    e = (
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .filter(F.col("_src") != F.col("_dst"))
        .distinct()
    )
    nodes = scoped_persist(
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    ep = scoped_persist(e)
    dist = seeds.select(
        F.col(node_col).alias("node"), F.lit(0).cast("bigint").alias("d")
    ).join(nodes, "node", "semi")
    for _ in range(n_iter):
        stepped = (
            dist.join(ep, dist["node"] == ep["_src"])
            .select(
                F.col("_dst").alias("node"),
                (F.col("d") + 1).alias("d"),
            )
        )
        dist = truncate(
            dist.unionByName(stepped).groupBy("node").agg(
                F.min("d").alias("d")
            )
        )
    return nodes.join(dist, "node", "left").select(
        "node",
        F.coalesce(F.col("d"), F.lit(-1)).cast("bigint").alias("hops"),
    )
