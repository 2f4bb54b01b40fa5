"""Iterative graph operators over edge DataFrames.

Connected components (the dedup-groups machinery) lives in
operators/dedup.py:dedup_groups; this module holds the rank-propagation
family. Everything follows the same iterative-join discipline proven
there: each iteration is ONE equi-join + ONE aggregate, per-iteration
localCheckpoint truncates the logical plan (lineage would otherwise grow
linearly and re-execute every prior iteration), and nothing data-sized
ever reaches the driver — the only driver scalar is the node count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from citydata_etl_spark.caching import scoped_persist


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
    iterations; each iteration's rank relation is localCheckpoint-ed to
    truncate lineage (without it, iteration k's plan re-derives
    iterations 1..k-1). Dangling nodes (no out-edges) simply contribute
    nothing — their mass falls out of circulation, matching the stated
    recurrence rather than the redistribute-variant.

    The only driver-side value is N (one count). At 100 TB the node and
    edge relations stay fully distributed; localCheckpoint is
    executor-local (lost-executor reruns the job) — swap for reliable
    checkpointing where that matters.
    """
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
            .localCheckpoint(eager=True)
        )
    return pr
