"""Composed analytic workload queries (the TPC-H shapes the star-schema
testdata is modeled on) — multi-way join pipelines that exercise the
engine's join planning end-to-end, the way a reporting layer composes the
J/A/F primitives the rest of the catalog tests one at a time (reference
README.md:6-7's scoring objective is exactly this shape: combine several
fact sources per entity, aggregate, rank).

Plan posture: fixed-cardinality dims (region: 5 rows, nation: 25 — fixed
at ANY TPC-H scale factor) are explicitly broadcast; the large-table joins
(customer x orders x lineitem) are left to Catalyst + AQE, which picks
sort-merge with runtime-coalesced partitions and converts to broadcast
when a filtered side turns out small — exactly the decision you want made
at runtime at 100 TB, not hard-coded at author time. Filters are pushed
into the parquet scans (plan-guarded in tests/test_plans.py), and every
money aggregate uses the exact integer-cents convention so results are
partition-order-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citydata_etl_spark.operators.aggregates import dec_sum
from citydata_etl_spark.plans.catalog import register
from citydata_etl_spark.sources.readers import read_testdata

#: Oracle-SQL twin of operators.aggregates.dec_sum over
#: l_extendedprice * (1 - l_discount) — the TPC-H revenue expression.
_REV_SQL = (
    "CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) "
    "AS BIGINT)) AS DOUBLE) / 100.0"
)


def _revenue() -> F.Column:
    return dec_sum(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, {_REV_SQL} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="Q3 shape (shipping priority): customer x orders x lineitem "
    "three-way join with selective filters on BOTH fact sides, grouped "
    "revenue, global top-10. The segment filter prunes customer at the "
    "scan (PushedFilters), AQE decides broadcast-vs-SMJ from the "
    "filtered sizes at runtime, and the top-10 plans as "
    "TakeOrderedAndProject (no global sort materialization). Revenue is "
    "exact integer cents, l_orderkey breaks ordering ties "
    "(plans/catalog.py conventions).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = (
        read_testdata(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = read_testdata(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    li = read_testdata(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue())
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_regional_volume",
    oracle=f"""
    SELECT n_name, {_REV_SQL} AS revenue, count(*) AS n_items
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="Q5 shape (local supplier volume): the six-table star join — "
    "customer x orders x lineitem x supplier x nation x region — with "
    "the correlated c_nationkey = s_nationkey condition that makes join "
    "ORDER matter (supplier must join after customer's nation is in "
    "scope). region/nation broadcast (5/25 rows at ANY scale factor); "
    "the region filter cascades through the broadcast joins to prune "
    "nations before the big joins run. The fact-side join order and "
    "strategies are AQE's call at runtime — the posture that survives a "
    "100x scale-up unchanged.",
)
def q5_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = read_testdata(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    nation = read_testdata(spark, sf_dir, "nation")
    asian_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    cust = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = read_testdata(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = read_testdata(spark, sf_dir, "lineitem")
    supp = read_testdata(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(asian_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(_revenue(), F.count("*").alias("n_items"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {_REV_SQL} AS revenue, c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="Q10 shape (returned-item reporting): identify the customers "
    "behind one quarter's returns — three-way fact join + broadcast "
    "nation dim, grouped per customer, global top-20 by lost revenue. "
    "The returnflag filter is pushed into the lineitem scan and the "
    "date band into orders; grouping keys include the unique c_custkey "
    "so the aggregate is one exchange; top-20 is TakeOrderedAndProject "
    "with the key as tie-break.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_testdata(spark, sf_dir, "customer")
    orders = read_testdata(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = read_testdata(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = read_testdata(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(nation),
            cust.c_nationkey == nation.n_nationkey,
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue())
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "g1_host_pagerank",
    oracle="""
    WITH ev AS (
      SELECT (doc_id * 2654435761) % 2147483648 AS e FROM documents),
    edges AS (
      SELECT DISTINCT e % 40 AS src, (e // 40) % 40 AS dst
      FROM ev WHERE e % 40 <> (e // 40) % 40),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    pr0 AS (SELECT node, 1000000 // n AS pr FROM nodes, nn),
    it1 AS (
      SELECT nd.node, 150000 // nn.n
               + 85 * coalesce(sum(p.pr // d.outdeg), 0) // 100 AS pr
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN edges e ON e.dst = nd.node
      LEFT JOIN pr0 p ON p.node = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY nd.node, nn.n),
    it2 AS (
      SELECT nd.node, 150000 // nn.n
               + 85 * coalesce(sum(p.pr // d.outdeg), 0) // 100 AS pr
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN edges e ON e.dst = nd.node
      LEFT JOIN it1 p ON p.node = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY nd.node, nn.n),
    it3 AS (
      SELECT nd.node, 150000 // nn.n
               + 85 * coalesce(sum(p.pr // d.outdeg), 0) // 100 AS pr
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN edges e ON e.dst = nd.node
      LEFT JOIN it2 p ON p.node = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY nd.node, nn.n)
    SELECT CAST(node AS BIGINT) AS node, CAST(pr AS BIGINT) AS pr FROM it3
    """,
    doc="G1 (iterative graph extension): PageRank over a host link graph "
    "in EXACT integer micros (operators/graph.py:pagerank) — the "
    "authority signal crawl pipelines rank seed hosts with. Edges are "
    "synthesized deterministically from doc_id through an integer LCG "
    "(40 hosts, self-loops dropped, deduplicated), so three unrolled "
    "power iterations are stated verbatim in SQL and the driver checks "
    "the ITERATIVE computation bit-exactly — integer floor division "
    "everywhere means no float accumulation order to disagree about. "
    "Engine shape per iteration: edges x ranks equi-join, one hash "
    "aggregate on the destination, left join back to the node set; the "
    "edge+outdegree relation persists once across iterations and each "
    "iteration localCheckpoints to truncate lineage (the dedup_groups "
    "discipline). Only N (one count) ever reaches the driver.",
)
def g1_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.graph import pagerank

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id")
    ev = (F.col("doc_id") * F.lit(2654435761)) % F.lit(2147483648)
    edges = docs.select(
        (ev % 40).alias("src"),
        ((ev / 40).cast("bigint") % 40).alias("dst"),
    )
    return pagerank(edges, n_iter=3)


@register(
    "g2_triangle_count",
    oracle="""
    WITH ev AS (
      SELECT (doc_id * 2654435761) % 2147483648 AS e FROM documents),
    raw AS (
      SELECT e % 40 AS s, (e // 40) % 40 AS d
      FROM ev WHERE e % 40 <> (e // 40) % 40),
    edges AS (
      SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw),
    nodes AS (SELECT a AS node FROM edges UNION SELECT b FROM edges),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM edges e1
      JOIN edges e2 ON e2.a = e1.b
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
    pern AS (
      SELECT node, count(*) AS c FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri) t GROUP BY node)
    SELECT CAST(n.node AS BIGINT) AS node,
           CAST(coalesce(p.c, 0) AS BIGINT) AS n_triangles
    FROM nodes n LEFT JOIN pern p ON p.node = n.node
    """,
    doc="G2 (graph cohesion): per-node triangle counts over the host "
    "link graph (operators/graph.py:triangle_counts) — the clustering "
    "signal behind link-farm detection in crawl graphs. The oracle "
    "states the naive id-ordered triple self-join; the engine runs the "
    "DEGREE-ORIENTED wedge join instead: each undirected edge points "
    "from its lower (degree, node) endpoint, wedges pair a node's "
    "out-edges, and one closing equi-join finds each triangle exactly "
    "once — no dedup exchange, and under degree orientation the wedge "
    "fanout is bounded by |E|^1.5 REGARDLESS of hub skew (a degree-10^6 "
    "hub contributes nothing quadratic because its edges all point "
    "into it). Both enumerations visit the same triangle set, so "
    "per-node counts match bit-exactly.",
)
def g2_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.graph import triangle_counts

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id")
    ev = (F.col("doc_id") * F.lit(2654435761)) % F.lit(2147483648)
    edges = docs.select(
        (ev % 40).alias("src"),
        ((ev / 40).cast("bigint") % 40).alias("dst"),
    )
    return triangle_counts(edges)


@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) > 300)
    SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
             AS total_cents,
           b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_cents DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="Q18 shape (large-volume orders): the group-filter-join "
    "pipeline — aggregate lineitem per order, HAVING-filter to the "
    "heavy tail (>300 units, ~top 1% at every SF), then join orders "
    "and customer and take the top-100 by value. Engine shape: the "
    "HAVING runs as a partial+final hash aggregate BEFORE either join "
    "touches a wide row, so the joins see ~1% of orders — the "
    "aggregate-pushdown discipline that matters when lineitem is the "
    "100 TB table; AQE converts the post-filter joins to broadcast at "
    "runtime from the observed size. Integer-unit quantities and cents "
    "totals keep the HAVING boundary and the ranking engine-exact; "
    "top-100 is TakeOrderedAndProject (no global sort), tie-broken on "
    "o_orderkey.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem")
    orders = read_testdata(spark, sf_dir, "orders")
    cust = read_testdata(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.floor(F.col("l_quantity") + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("sum_qty")
        )
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("bigint")
            .alias("total_cents"),
            "sum_qty",
        )
        .orderBy(F.col("total_cents").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           {_REV_SQL} AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, ship_year
    """,
    doc="Q7 shape (volume shipping between nation pairs): the six-way "
    "snowflake join — lineitem x orders x customer x supplier x "
    "nation(x2) — with a DISJUNCTIVE cross-dimension predicate that "
    "cannot be pushed to a single scan. Engine shape: both nation dims "
    "(25 fixed rows each) broadcast; the supplier and customer joins "
    "hash on their keys; the pair predicate evaluates after the two "
    "broadcast joins attach names, filtering early enough that the "
    "final aggregate sees only the two nations' rows. Revenue in exact "
    "integer cents; year as BIGINT on both engines. This is the shape "
    "where join ORDER matters at 100 TB — dims attach to the fact "
    "pipeline without ever shuffling the fact on a dim key.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem")
    orders = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = read_testdata(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = read_testdata(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ))
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .withColumn("ship_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(_revenue())
        .select("supp_nation", "cust_nation", "ship_year", "revenue")
    )


@register(
    "g3_bfs_hops",
    oracle="""
    WITH ev AS (
      SELECT (doc_id * 2654435761) % 2147483648 AS e FROM documents),
    edges AS (
      SELECT DISTINCT e % 40 AS src, (e // 40) % 40 AS dst
      FROM ev WHERE e % 40 <> (e // 40) % 40),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    d0 AS (
      SELECT node, CAST(0 AS BIGINT) AS d FROM nodes WHERE node % 7 = 0),
    d1 AS (
      SELECT node, min(d) AS d FROM (
        SELECT node, d FROM d0
        UNION ALL
        SELECT e.dst, d0.d + 1 FROM d0 JOIN edges e ON e.src = d0.node)
      GROUP BY node),
    d2 AS (
      SELECT node, min(d) AS d FROM (
        SELECT node, d FROM d1
        UNION ALL
        SELECT e.dst, d1.d + 1 FROM d1 JOIN edges e ON e.src = d1.node)
      GROUP BY node),
    d3 AS (
      SELECT node, min(d) AS d FROM (
        SELECT node, d FROM d2
        UNION ALL
        SELECT e.dst, d2.d + 1 FROM d2 JOIN edges e ON e.src = d2.node)
      GROUP BY node)
    SELECT CAST(n.node AS BIGINT) AS node,
           CAST(coalesce(d3.d, -1) AS BIGINT) AS hops
    FROM nodes n LEFT JOIN d3 ON d3.node = n.node
    """,
    doc="G3 (multi-source BFS extension): hop distance from a seed set "
    "(node % 7 == 0) over the synthesized host graph, capped at three "
    "frontier expansions — the crawl-frontier / link-distance "
    "primitive (operators/graph.py:bfs_hops); unreached nodes get -1. "
    "The oracle unrolls the three min-relaxation steps verbatim (the "
    "g1 playbook), so the driver checks the ITERATIVE computation "
    "itself. Engine shape per iteration: frontier x edges equi-join + "
    "min-aggregate, lineage truncated via the checkpoint_dir knob "
    "(localCheckpoint locally; reliable checkpoint at cluster scale); "
    "distances only shrink, so the computation is monotone and "
    "partition-order-free — bit-exact under any schedule.",
)
def g3_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.graph import bfs_hops

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id")
    ev = (F.col("doc_id") * F.lit(2654435761)) % F.lit(2147483648)
    edges = docs.select(
        (ev % 40).alias("src"),
        ((ev / 40).cast("bigint") % 40).alias("dst"),
    )
    seeds = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .filter(F.col("node") % 7 == 0)
    )
    return bfs_hops(edges, seeds, n_iter=3)


@register(
    "q14_promo_revenue",
    oracle="""
    WITH c AS (
      SELECT CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                  AS BIGINT) AS cents,
             p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        AND l_shipdate <  TIMESTAMP '1995-10-01')
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
                AS BIGINT) AS promo_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
                * 10000 // sum(cents) AS BIGINT) AS promo_bp
    FROM c
    """,
    doc="Composed workload (TPC-H Q14 shape): promotion revenue share "
    "for one shipping month — lineitem joined to part (part broadcasts: "
    "bounded dimension), conditional exact-cents sums, and the share in "
    "exact basis points via true integer division (the 2^53 rule). One "
    "pushed date-range scan, one broadcast join, one map-side-combined "
    "global aggregate — the whole query is a single stage after the "
    "scan at any scale.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    part = read_testdata(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")
    joined = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select(cents.alias("cents"), "p_type")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("cents")).otherwise(0)
    )
    return joined.agg(
        promo.cast("bigint").alias("promo_cents"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.expr(
            "sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) * 10000"
            " div sum(cents)"
        ).cast("bigint").alias("promo_bp"),
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                 + 0.5) AS BIGINT)) AS BIGINT) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
    doc="Composed workload (TPC-H Q15 shape): the top supplier by "
    "quarterly revenue — the scalar-correlated-subquery pattern "
    "(revenue per supplier, keep rows equal to the global max) stated "
    "as a 1-row broadcast cross join + filter instead of a second "
    "corpus pass: the per-supplier aggregate is computed ONCE "
    "(persisted), its max folds map-side to one row, and the supplier "
    "dimension broadcasts into the winners. Ties return every "
    "tied supplier on both engines (no arbitrary LIMIT). Exact-cents "
    "revenue, so the max comparison can never be a float knife-edge.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.caching import scoped_persist

    li = read_testdata(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")
    rev = scoped_persist(
        li.select(F.col("l_suppkey"), cents.alias("c"))
        .groupBy("l_suppkey")
        .agg(F.sum("c").cast("bigint").alias("total_rev"))
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    supplier = read_testdata(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supplier),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH eu AS (
      SELECT s_suppkey
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    val AS (
      SELECT l_partkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
      FROM lineitem JOIN eu ON l_suppkey = s_suppkey
      GROUP BY l_partkey),
    tot AS (
      SELECT CAST(sum(value_cents) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_parts
      FROM val)
    SELECT l_partkey AS partkey, value_cents
    FROM val, tot
    WHERE value_cents > (total * 3) // (n_parts * 2)
    """,
    doc="Composed workload (TPC-H Q11 shape, adapted: the testdata has "
    "no partsupp, so lineitem revenue from one region's suppliers "
    "stands in for supply value): parts whose European-supplied "
    "revenue exceeds a FRACTION OF THE GLOBAL TOTAL — the "
    "HAVING-against-scalar-subquery pattern. Two engine decisions "
    "worth the entry: (1) the per-part aggregate is computed ONCE "
    "(persisted) and feeds both the global total + part count (folds "
    "map-side to one broadcast row) and the filter — never two corpus "
    "passes; (2) the threshold is SCALE-FREE and integer-exact: keep "
    "parts with value_cents > (total * 3) div (n_parts * 2) (1.5x the mean "
    "part value — a fixed global fraction returns nothing once the "
    "part count outgrows it, which the sf0.1 bench-early run caught), "
    "truncating division on non-negative totals being identical on "
    "both engines, where multiplying the total by a double fraction "
    "would park qualifying parts one ulp from the cut. total*3 stays "
    "far inside int64 at any realistic revenue. The supplier-region "
    "reduction broadcasts (bounded dimension).",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.caching import scoped_persist

    supplier = read_testdata(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = read_testdata(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = read_testdata(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    ).select("r_regionkey")
    eu = (
        supplier.join(
            F.broadcast(nation),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .join(F.broadcast(region),
              nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    li = read_testdata(spark, sf_dir, "lineitem")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")
    val = scoped_persist(
        li.join(
            F.broadcast(eu), li.l_suppkey == F.col("s_suppkey")
        )
        .select(F.col("l_partkey"), cents.alias("c"))
        .groupBy("l_partkey")
        .agg(F.sum("c").cast("bigint").alias("value_cents"))
    )
    tot = val.agg(
        F.sum("value_cents").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_parts"),
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value_cents")
            > F.expr("(total * 3) div (n_parts * 2)")
        )
        .select(F.col("l_partkey").alias("partkey"), "value_cents")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH l1 AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem
      WHERE l_shipdate > DATE '1997-06-30')
    SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
                 AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
                 AND n.n_name = 'NATION_18'
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > DATE '1997-06-30')
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY numwait DESC, suppkey
    LIMIT 100
    """,
    doc="Q21 shape (suppliers who kept orders waiting): the canonical "
    "multi-way EXISTS / NOT EXISTS stressor the q-family lacked — a "
    "late line (l_shipdate past the cutoff; this lineitem carries no "
    "receipt/commit dates, so the lateness predicate is adapted while "
    "the JOIN TOPOLOGY is Q21's exactly) on a finished ('F') order "
    "counts against its supplier only when at least one OTHER "
    "supplier fed the same order (correlated EXISTS -> LEFT SEMI on "
    "l_orderkey with the l_suppkey <> residual) and NO other supplier "
    "was late on it (correlated NOT EXISTS -> LEFT ANTI on the "
    "late-filtered fact). Engine shape, plan-guarded: the semi and "
    "anti joins run directly against the fact table keyed on "
    "l_orderkey — NOT a distinct-then-inner-join rewrite, which would "
    "add a pre-shuffled aggregate and lose the early-out probe "
    "semantics; all three fact passes shuffle on the same l_orderkey "
    "key so AQE lines them up, the 25-row nation dim broadcasts into "
    "supplier before the fact join, and the final top-100 is "
    "TakeOrderedAndProject tie-broken on suppkey. At 100 TB: three "
    "scans of lineitem (one date-filtered twice) co-partitioned on "
    "one key, no cartesian anywhere.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = "1997-06-30"
    li = read_testdata(spark, sf_dir, "lineitem")
    late1 = li.filter(F.col("l_shipdate") > F.lit(cutoff)).select(
        "l_orderkey", "l_suppkey"
    )
    orders = read_testdata(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = read_testdata(spark, sf_dir, "supplier")
    nation = read_testdata(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_18"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_shipdate") > F.lit(cutoff)).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waits = (
        late1
        # EXISTS: some other supplier on the same order
        .join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        # NOT EXISTS: no other supplier was late on it
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp.join(
                F.broadcast(nation),
                supp.s_nationkey == F.col("n_nationkey"),
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    return (
        waits.groupBy(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
        )
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "suppkey")
        .limit(100)
    )
