"""Join queries (SURVEY.md §2.4 J1-J4 + range and as-of extensions).

Physical-plan intent per entry is stated in the doc; tests/test_plans.py
asserts the broadcast ones actually go broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citydata_etl_spark.operators import joins as J
from citydata_etl_spark.operators.aggregates import dec_sum
from citydata_etl_spark.plans.catalog import register
from citydata_etl_spark.sources.readers import read_testdata


@register(
    "j1_broadcast_lookup",
    oracle="""
    SELECT r_name, count(*) AS n_customers,
           CAST(sum(CAST(floor((c_acctbal) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="J1: config/dim lookup join as broadcast hash "
    "(reference lambda/update-control.py:22-26: control x config on site). "
    "nation+region are bounded dims -> broadcast, zero shuffle for the join.",
)
def j1_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_testdata(spark, sf_dir, "customer")
    nation = read_testdata(spark, sf_dir, "nation")
    region = read_testdata(spark, sf_dir, "region")
    dim = J.broadcast_lookup(
        nation, region, nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "r_name")
    joined = J.broadcast_lookup(
        customer, dim, customer.c_nationkey == dim.n_nationkey
    )
    return joined.groupBy("r_name").agg(
        F.count("*").alias("n_customers"),
        dec_sum("c_acctbal", "total_bal"),
    )


@register(
    "j2_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
    doc="J2: EXISTS as left_semi — right columns never materialize "
    "(reference lambda/update-control.py:29-30's id-mask select).",
)
def j2_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_testdata(spark, sf_dir, "customer")
    big = (
        read_testdata(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return J.semi_join(customer, big, "c_custkey").select("c_custkey", "c_name")


@register(
    "j2_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    doc="J2: NOT EXISTS as left_anti — customers with no urgent orders "
    "(the complement side of the update mask; predicate chosen to be "
    "non-empty at every test scale).",
)
def j2_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_testdata(spark, sf_dir, "customer")
    keys = (
        read_testdata(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return J.anti_join(customer, keys, "c_custkey").select("c_custkey", "c_name")


@register(
    "j3_template_join",
    oracle="""
    SELECT c_custkey,
           'https://www.city-data.com/city/' || c_name || '-' || n_name || '.html'
             AS url
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    doc="J3: URL-template join — broadcast dim + format_string interpolation "
    "(reference data/scraper_config.csv:2-3 templates + "
    "lambda/collect-data.py:176).",
)
def j3_template_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.functions.scalar import url_from_template

    customer = read_testdata(spark, sf_dir, "customer")
    nation = read_testdata(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = J.broadcast_lookup(
        customer, nation, customer.c_nationkey == nation.n_nationkey
    )
    return joined.select(
        "c_custkey",
        F.format_string(
            "https://www.city-data.com/city/%s-%s.html", "c_name", "n_name"
        ).alias("url"),
    )


@register(
    "j4_multi_source_join",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_customers FROM customer
               GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers FROM supplier
               GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    doc="J4 [implied]: multi-source per-city combine as a full outer join of "
    "per-source aggregates (reference README.md:4-7 scoring objective). "
    "Shuffles once per side on the key; AQE handles skew.",
)
def j4_multi_source_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        read_testdata(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        read_testdata(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    joined = cust.join(supp, "nk", "full_outer")
    return joined.select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@register(
    "j5_range_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('small', 0.0, 1000.0), ('medium', 1000.0, 5000.0),
             ('large', 5000.0, 100000.0))
    SELECT band, count(*) AS n_parts,
           CAST(sum(CAST(floor((p_retailprice) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
    doc="Range (non-equi band) join: fact x broadcast band dimension. "
    "Broadcast-nested-loop with a bounded inner side — the scalable plan "
    "for banding at any fact size.",
)
def j5_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_testdata(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("small", 0.0, 1000.0), ("medium", 1000.0, 5000.0),
         ("large", 5000.0, 100000.0)],
        "band STRING, lo DOUBLE, hi DOUBLE",
    )
    joined = J.range_join(part, bands, "p_retailprice", "lo", "hi")
    return joined.groupBy("band").agg(
        F.count("*").alias("n_parts"),
        dec_sum("p_retailprice", "total_price"),
    )


@register(
    "j6_asof_join",
    oracle="""
    WITH purch AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
         views AS (SELECT user_id, max(value) AS view_value, ts
                   FROM events WHERE event_type = 'view'
                   GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id, p.ts AS ts,
           v.ts AS right_ts, v.view_value AS right_view_value
    FROM purch p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="As-of join (backward, inclusive): for each purchase, the most "
    "recent view at-or-before it per user. Spark-side: union + window "
    "last-non-null — one shuffle on user_id, linear in input "
    "(operators/joins.py:asof_join); oracle uses DuckDB's native ASOF.",
)
def j6_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_testdata(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # dedupe right side on (user_id, ts) for deterministic as-of semantics
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    return J.asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "view_value"],
    )


@register(
    "j6_asof_forward",
    oracle="""
    WITH purch AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
         views AS (SELECT user_id, max(value) AS view_value, ts
                   FROM events WHERE event_type = 'view'
                   GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id, p.ts AS ts,
           v.ts AS right_ts, v.view_value AS right_view_value
    FROM purch p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts <= v.ts
    """,
    doc="As-of join (forward, inclusive): for each purchase, the EARLIEST "
    "view at-or-after it per user — the direction time-series consumers "
    "reach for next ('next reading after the event'). Same union + "
    "range-frame window as backward, first-non-null over [current, +inf) "
    "(operators/joins.py:asof_join); oracle is DuckDB native ASOF with "
    "the inequality reversed.",
)
def j6_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_testdata(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    return J.asof_join(
        purchases, views, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["ts", "view_value"], direction="forward",
    )


@register(
    "j6_asof_nearest",
    oracle="""
    WITH purch AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
         views AS (SELECT user_id, max(value) AS view_value, ts
                   FROM events WHERE event_type = 'view'
                   GROUP BY user_id, ts),
    b AS (
      SELECT p.event_id, p.user_id, p.ts,
             v.ts AS bts, v.view_value AS bval
      FROM purch p ASOF LEFT JOIN views v
        ON p.user_id = v.user_id AND p.ts >= v.ts),
    f AS (
      SELECT p.event_id, v.ts AS fts, v.view_value AS fval
      FROM purch p ASOF LEFT JOIN views v
        ON p.user_id = v.user_id AND p.ts <= v.ts)
    SELECT b.event_id, b.user_id, b.ts,
           CASE WHEN fts IS NULL THEN bts
                WHEN bts IS NULL THEN fts
                WHEN (b.ts - bts) <= (fts - b.ts) THEN bts ELSE fts
           END AS right_ts,
           CASE WHEN fts IS NULL THEN bval
                WHEN bts IS NULL THEN fval
                WHEN (b.ts - bts) <= (fts - b.ts) THEN bval ELSE fval
           END AS right_view_value
    FROM b JOIN f USING (event_id)
    """,
    doc="As-of join (nearest): for each purchase, whichever adjacent view "
    "is closer in event time, exact ties preferring backward "
    "(pd.merge_asof semantics). One shuffle + ONE sort: both directions "
    "read the same range-framed window ordering "
    "(operators/joins.py:asof_join); oracle composes DuckDB's two ASOF "
    "directions with the same tie rule.",
)
def j6_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_testdata(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    return J.asof_join(
        purchases, views, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["ts", "view_value"], direction="nearest",
    )


@register(
    "j7_salted_skew_join",
    oracle="""
    SELECT s_nationkey, count(*) AS n_items,
           CAST(sum(CAST(floor((l_extendedprice) * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
    doc="J7 (skew extension): fact-to-dim equi-join through the SALTED "
    "path — the skewed probe side gets a deterministic per-row salt, the "
    "build side replicates n_salts times, and each hot key spreads across "
    "n_salts shuffle partitions instead of one straggler. Semantics are "
    "identical to the plain join (this oracle); deployed when AQE skew "
    "handling can't split the partition (operators/joins.py:salted_join).",
)
def j7_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_extendedprice"
    )
    sup = read_testdata(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    joined = J.salted_join(li, sup, "suppkey", n_salts=16)
    return joined.groupBy("s_nationkey").agg(
        F.count("*").alias("n_items"),
        dec_sum("l_extendedprice", "revenue"),
    )


@register(
    "j8_bucketed_join",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_orders,
           CAST(sum(CAST(floor((o_totalprice) * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="J8 (co-located join extension): the fact-to-fact join over "
    "CATALOG-BUCKETED tables — orders and customer are each written once "
    "per session as external tables bucketed 16-ways on custkey "
    "(sources/layout.py:write_bucketed_table), so the join sort-merges "
    "with NO Exchange on either side: the shuffle happened at write time "
    "and is amortized over every subsequent join on the key. This is the "
    "scale tool for repeated big-big joins (at 100 TB, re-shuffling the "
    "fact table per query is the single largest avoidable cost); "
    "tests/test_plans.py::test_bucketed_join_is_shuffle_free pins the "
    "zero-Exchange plan with broadcast disabled.",
)
def j8_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from citydata_etl_spark.sources.layout import write_bucketed_table
    from citydata_etl_spark.util import session_tmpdir

    tag = os.path.basename(os.path.normpath(sf_dir))
    root = session_tmpdir(f"j8_bucketed_{tag}")
    t_orders = f"j8_orders_{tag.replace('.', '_')}"
    t_cust = f"j8_customer_{tag.replace('.', '_')}"
    write_bucketed_table(
        read_testdata(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        t_orders,
        root + "/orders",
        "o_custkey",
        16,
    )
    write_bucketed_table(
        read_testdata(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        ),
        t_cust,
        root + "/customer",
        "c_custkey",
        16,
    )
    joined = spark.table(t_orders).join(
        spark.table(t_cust),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        dec_sum("o_totalprice", "revenue"),
    )


@register(
    "j9_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey AS id,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS s,
             CAST(floor(epoch(o_orderdate)) AS BIGINT)
               + (1 + o_orderkey % 14) * 86400 AS e
      FROM orders WHERE o_orderkey % 50 = 0)
    SELECT a.id AS id_a, b.id AS id_b
    FROM iv a JOIN iv b
      ON a.id < b.id AND a.s <= b.e AND b.s <= a.e
    """,
    doc="J9 (interval overlap extension): all overlapping interval pairs "
    "within one set — the log-correlation / conflict-detection join "
    "(operators/joins.py:interval_overlap_pairs). The naive form is a "
    "theta-only self-join (quadratic, what this oracle states); the "
    "engine bins intervals to week-grid cells, meets candidates through "
    "ONE equi-join on the cell, verifies the overlap predicate in the "
    "join, and dedups multi-cell pairs with zero distinct exchange by "
    "attributing each pair to the canonical cell of its overlap's left "
    "edge (the simhash first-agreeing-chunk trick). Cost: intervals x "
    "(len/cell + 1) rows + true pair density per cell. Plan guard "
    "pins no-cartesian.",
)
def j9_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = (
        read_testdata(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select(
            F.col("o_orderkey").alias("id"),
            F.floor(F.col("o_orderdate").cast("double"))
            .cast("bigint")
            .alias("start"),
        )
        .withColumn(
            "end",
            F.col("start") + (1 + F.col("id") % 14) * 86400,
        )
    )
    return J.interval_overlap_pairs(
        iv, "id", "start", "end", cell_size=7 * 86400
    )


@register(
    "j10_bloom_prefilter_join",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(floor((o_totalprice) * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS revenue
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    """,
    doc="J10 (runtime-filter extension): semi-join behind a BLOOM-FILTER "
    "prefilter (operators/joins.py:bloom_semi_join) — the manual form of "
    "Spark's runtime bloom injection, for plans the optimizer won't "
    "rewrite (cross-job filters, pre-shuffle source pruning). The bloom "
    "builds in ONE map-side-combined bit_or aggregate whose shuffle and "
    "driver traffic are bounded by the BITMAP size (n_bits/64 longs, "
    "32 KiB here) — never by build-side cardinality; the probe is a "
    "zero-shuffle codegen projection ANDing k word lookups in an array "
    "literal. A real left_semi join then kills false positives, so the "
    "result is EXACTLY the semi-join (the oracle's IN form) — the bloom "
    "only prunes the probe side's shuffle, which at 100 TB is the "
    "difference between shuffling every probe row and shuffling the "
    "survivors. Prune effectiveness + exactness pinned in "
    "tests/test_plans.py.",
)
def j10_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = (
        read_testdata(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = read_testdata(spark, sf_dir, "orders")
    matched = J.bloom_semi_join(
        orders, keys, probe_key="o_custkey", build_key="c_custkey"
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dec_sum("o_totalprice", "revenue"),
    )


@register(
    "j14_point_in_polygon",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             ((c_custkey % 2147483648) * 40503 + 7)
               % 2147483648 % 360000 - 180000 AS px,
             ((c_custkey % 2147483648) * 2654435761)
               % 2147483648 % 120000 - 60000 AS py
      FROM customer),
    poly AS (
      SELECT r_name AS fence,
             list_transform([3, 1, -2, -2, 1], o ->
               (r_regionkey * 60 - 120) * 1000
               + 4000 * (1 + r_regionkey % 2) * o) AS xs,
             list_transform([0, 2, 2, -1, -3], o ->
               (r_regionkey * 20 - 40) * 1000
               + 4000 * (1 + r_regionkey % 2) * o) AS ys
      FROM region),
    ks AS (SELECT unnest(range(5)) AS k),
    crossings AS (
      SELECT p.c_custkey, g.fence,
             sum(CASE WHEN
                   ((g.xs[CAST(ks.k + 1 AS INT)] IS NOT NULL) AND
                    ((g.ys[CAST(ks.k + 1 AS INT)] <= p.py)
                     <> (g.ys[CAST((ks.k + 1) % 5 + 1 AS INT)] <= p.py))
                    AND
                    (((g.xs[CAST((ks.k + 1) % 5 + 1 AS INT)]
                       - g.xs[CAST(ks.k + 1 AS INT)])
                      * (p.py - g.ys[CAST(ks.k + 1 AS INT)])
                      - (p.px - g.xs[CAST(ks.k + 1 AS INT)])
                      * (g.ys[CAST((ks.k + 1) % 5 + 1 AS INT)]
                         - g.ys[CAST(ks.k + 1 AS INT)]) > 0)
                     = (g.ys[CAST((ks.k + 1) % 5 + 1 AS INT)]
                        > g.ys[CAST(ks.k + 1 AS INT)])))
                 THEN 1 ELSE 0 END) AS n_cross
      FROM pts p CROSS JOIN poly g CROSS JOIN ks
      GROUP BY p.c_custkey, g.fence)
    SELECT fence, count(*) AS n_inside,
           CAST(sum(c_custkey) AS BIGINT) AS id_sum
    FROM crossings WHERE n_cross % 2 = 1
    GROUP BY fence
    """,
    doc="J14 (spatial containment join): POINT-IN-POLYGON by "
    "integer-exact ray casting — j11's radius join generalized to "
    "real fence SHAPES (operators/joins.py:point_in_polygon_join). "
    "Five irregular pentagon fences synthesized closed-form from the "
    "region table (integer milli-degree vertices), customers placed "
    "by the reduced-LCG coordinate streams; containment is crossing "
    "PARITY of a rightward ray, computed as one aggregate fold over "
    "the vertex arrays — half-open vertex rule, sign-adjusted "
    "left-of-edge test, NO division and NO floats anywhere, so both "
    "engines are bit-identical even for points exactly on an edge "
    "(a double ray-caster is one ulp from flipping those). Physical "
    "shape: polygons broadcast, a bounding-box prefilter cuts "
    "candidates before any edge math (the oracle omits the bbox — "
    "it cannot change results, which is itself part of the claim). "
    "At 100 TB: no shuffle until the per-fence rollup.",
)
def j14_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    OFFX = [3, 1, -2, -2, 1]
    OFFY = [0, 2, 2, -1, -3]
    ck = F.pmod(F.col("c_custkey"), F.lit(2147483648))
    pts = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey",
        ((ck * 40503 + 7) % 2147483648 % 360000 - 180000).alias("px"),
        ((ck * 2654435761) % 2147483648 % 120000 - 60000).alias("py"),
    )
    rk = F.col("r_regionkey")
    cx = (rk * 60 - 120) * 1000
    cy = (rk * 20 - 40) * 1000
    s = 4000 * (1 + rk % 2)
    polys = read_testdata(spark, sf_dir, "region").select(
        F.col("r_name").alias("fence"),
        F.array(*[(cx + s * o).cast("bigint") for o in OFFX]).alias("xs"),
        F.array(*[(cy + s * o).cast("bigint") for o in OFFY]).alias("ys"),
    )
    inside = J.point_in_polygon_join(
        pts, polys, px="px", py="py", poly_id="fence"
    )
    return inside.groupBy(F.col("poly_id").alias("fence")).agg(
        F.count("*").alias("n_inside"),
        F.sum("c_custkey").cast("bigint").alias("id_sum"),
    )


@register(
    "j11_geo_radius_join",
    oracle="""
    WITH c AS (
      SELECT c_custkey,
             CAST(((c_custkey % 2147483648) * 2654435761)
                  % 2147483648 % 120000 - 60000
                  AS DOUBLE) / 1000.0 AS c_lat,
             CAST(((c_custkey % 2147483648) * 40503 + 7)
                  % 2147483648 % 360000 - 180000
                  AS DOUBLE) / 1000.0 AS c_lng
      FROM customer),
    s AS (
      SELECT s_suppkey,
             CAST(((s_suppkey % 2147483648) * 1103515245 + 12345)
                  % 2147483648 % 120000
                  - 60000 AS DOUBLE) / 1000.0 AS s_lat,
             CAST(((s_suppkey % 2147483648) * 69069 + 1)
                  % 2147483648 % 360000 - 180000
                  AS DOUBLE) / 1000.0 AS s_lng
      FROM supplier),
    d AS (
      SELECT c_custkey, c_lat, c_lng, s_suppkey, s_lat, s_lng,
             round(2 * 6371.0 * asin(sqrt(
               pow(sin(radians(s_lat - c_lat) / 2), 2)
               + cos(radians(c_lat)) * cos(radians(s_lat))
                 * pow(sin(radians(s_lng - c_lng) / 2), 2))), 4) AS dist_km
      FROM c, s)
    SELECT * FROM d WHERE dist_km <= 150.0
    """,
    doc="J11 (spatial radius join extension): all (customer, supplier) "
    "point pairs within 150 km great-circle distance "
    "(operators/joins.py:geo_radius_join) — the 2-D analog of j9's "
    "grid-binned interval join. The oracle states the naive cross join "
    "(what a theta-only plan would execute); the engine blocks on a "
    "1.5x3.0-degree grid — build side in ONE cell, probe side fanned "
    "to its 3x3 neighborhood (constant 9x, not data-dependent) — so "
    "candidates meet through one equi-join and verify with the exact "
    "haversine inside it; build-side cell uniqueness means no distinct "
    "exchange. Losslessness is a stated contract: cell spans >= the "
    "radius in both dimensions for points within +-60 deg latitude "
    "(the synthesized band). The radius filter applies to the ROUNDED "
    "distance (4 decimals, the transcendental convention) so JVM/libm "
    "last-ulp differences cannot flip boundary membership. Plan guard "
    "pins no-cartesian.",
)
def j11_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # coordinate-synth LCGs: the key is reduced mod 2^31 BEFORE every
    # multiply (identity for in-range keys, so hashes are unchanged;
    # overflow-proof for ANY key — the unreduced s_suppkey*1103515245
    # form blew its int64 budget past ~8.36e9 keys, the lcg_pick
    # lesson applied to this entry's private streams). Both engines
    # state the identical reduced form.
    ck = F.pmod(F.col("c_custkey"), F.lit(2147483648))
    cust = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey",
        (((ck * 2654435761) % 2147483648 % 120000 - 60000).cast("double")
         / 1000.0).alias("c_lat"),
        (((ck * 40503 + 7) % 2147483648 % 360000 - 180000).cast("double")
         / 1000.0).alias("c_lng"),
    )
    sk = F.pmod(F.col("s_suppkey"), F.lit(2147483648))
    supp = read_testdata(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (((sk * 1103515245 + 12345) % 2147483648 % 120000 - 60000)
         .cast("double") / 1000.0).alias("s_lat"),
        (((sk * 69069 + 1) % 2147483648 % 360000 - 180000).cast("double")
         / 1000.0).alias("s_lng"),
    )
    return J.geo_radius_join(
        cust, supp, radius_km=150.0,
        probe_lat="c_lat", probe_lng="c_lng",
        build_lat="s_lat", build_lng="s_lng",
    )


@register(
    "j12_temporal_join",
    oracle="""
    WITH b AS (
      SELECT c_custkey AS k,
             DATE '1994-01-01' + CAST(c_custkey % 300 AS INTEGER) AS b1,
             DATE '1996-01-01' + CAST(c_custkey % 300 AS INTEGER) AS b2
      FROM customer),
    dim AS (
      SELECT k, DATE '1992-01-01' AS valid_from, b1 AS valid_to,
             'S1-' || CAST(k % 4 AS VARCHAR) AS segment,
             k * 100 + 1 AS credit_cents
      FROM b
      UNION ALL
      SELECT k, b1, b2, 'S2-' || CAST(k % 4 AS VARCHAR), k * 100 + 2
      FROM b WHERE k % 5 <> 0
      UNION ALL
      SELECT k, b2, CAST(NULL AS DATE),
             'S3-' || CAST(k % 4 AS VARCHAR), k * 100 + 3
      FROM b WHERE k % 7 <> 0)
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           d.segment AS dim_segment,
           d.credit_cents AS dim_credit_cents
    FROM orders o
    LEFT JOIN dim d
      ON d.k = o.o_custkey
     AND d.valid_from <= o.o_orderdate
     AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    """,
    doc="J12 (point-in-time SCD2 dimension join): for every order, the "
    "dimension VERSION valid at the order date — valid_from <= ts < "
    "valid_to, NULL valid_to = still current "
    "(operators/joins.py:temporal_join). The dim is a synthesized SCD2 "
    "history over customer (per-key boundaries at 1994/1996 + key%300 "
    "days; every 5th key misses its middle version -> a coverage HOLE, "
    "every 7th misses its open version -> uncovered tail), so the "
    "driver exercises hit, hole-NULL, and tail-NULL paths. The oracle "
    "states it as the validity-predicate join (sound because SCD2 "
    "versions are non-overlapping per key); the ENGINE refuses that "
    "theta-join shape — a BroadcastNestedLoop trap at scale — and "
    "instead runs a backward as-of join (ONE shuffle on the key, one "
    "sort, row-atomic struct carry) plus a codegen validity check: "
    "linear in facts + versions, the leakage-free feature-store "
    "training-join shape at 100 TB.",
)
def j12_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_testdata(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.date_add(
            F.lit("1994-01-01").cast("date"),
            (F.col("c_custkey") % 300).cast("int"),
        ).alias("b1"),
        F.date_add(
            F.lit("1996-01-01").cast("date"),
            (F.col("c_custkey") % 300).cast("int"),
        ).alias("b2"),
    )

    def seg(n: int):
        return F.concat(
            F.lit(f"S{n}-"), (F.col("o_custkey") % 4).cast("string")
        )

    k = F.col("o_custkey")
    v1 = cust.select(
        "o_custkey",
        F.lit("1992-01-01").cast("date").alias("valid_from"),
        F.col("b1").alias("valid_to"),
        seg(1).alias("segment"),
        (k * 100 + 1).alias("credit_cents"),
    )
    v2 = cust.filter(k % 5 != 0).select(
        "o_custkey",
        F.col("b1").alias("valid_from"),
        F.col("b2").alias("valid_to"),
        seg(2).alias("segment"),
        (k * 100 + 2).alias("credit_cents"),
    )
    v3 = cust.filter(k % 7 != 0).select(
        "o_custkey",
        F.col("b2").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        seg(3).alias("segment"),
        (k * 100 + 3).alias("credit_cents"),
    )
    dim = v1.unionByName(v2).unionByName(v3)
    facts = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    return J.temporal_join(
        facts,
        dim,
        key="o_custkey",
        fact_ts="o_orderdate",
        dim_cols=["segment", "credit_cents"],
    )


@register(
    "j13_dpp_join",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    WHERE strftime(o_orderdate, '%Y-%m')
          IN ('1995-04', '1995-05', '1995-06')
    GROUP BY month
    """,
    doc="J13 (dynamic partition pruning): the fact table is stored "
    "month-partitioned (Hive layout, built once), the months dimension "
    "carries a quarter attribute the fact does not, and the query "
    "filters on quarter = '1995Q2' — a predicate NO static pruner can "
    "push into the fact scan because the partition keys it implies are "
    "only known after the dim filter runs. Catalyst's DPP closes that "
    "gap: the broadcast dim's surviving join keys become a runtime "
    "PartitionFilter on the fact scan (plan-guarded: the scan carries "
    "a dynamicpruning expression), so only 3 of ~80 month directories "
    "are ever read. At 100 TB this is THE mechanism that turns "
    "dim-driven reporting queries from full scans into targeted "
    "reads; the oracle states the surviving months in closed form.",
)
def j13_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from citydata_etl_spark.plans.queries_core import _build_once
    from citydata_etl_spark.util import session_tmpdir

    tag = os.path.basename(os.path.normpath(sf_dir))
    root = session_tmpdir(f"j13_dpp_{tag}")
    path = root + "/fact"
    orders = read_testdata(spark, sf_dir, "orders")

    def _build() -> None:
        (
            orders.withColumn(
                "o_month", F.date_format("o_orderdate", "yyyy-MM")
            )
            .write.mode("overwrite")
            .partitionBy("o_month")
            .parquet(path)
        )

    _build_once(root, _build)
    fact = spark.read.parquet(path)
    months = [
        (f"{y}-{m:02d}", f"{y}Q{(m - 1) // 3 + 1}")
        for y in range(1992, 1999)
        for m in range(1, 13)
    ]
    dim = spark.createDataFrame(months, "month STRING, quarter STRING")
    return (
        fact.join(
            F.broadcast(dim.filter(F.col("quarter") == "1995Q2")),
            fact["o_month"] == dim["month"],
        )
        .groupBy("month")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
            )
            .cast("bigint")
            .alias("total_cents"),
        )
    )


@register(
    "j6_asof_tolerance",
    oracle="""
    WITH purch AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
         views AS (SELECT user_id, max(value) AS view_value, ts
                   FROM events WHERE event_type = 'view'
                   GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id, p.ts AS ts,
           CASE WHEN v.ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(v.ts) <= 3600000000
                THEN v.ts END AS right_ts,
           CASE WHEN v.ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(v.ts) <= 3600000000
                THEN v.view_value END AS right_view_value
    FROM purch p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="As-of join with a TOLERANCE horizon (pd.merge_asof's knob, "
    "completing the j6 family): the most recent view at-or-before each "
    "purchase, but a match older than 1 hour is NULLed — a stale quote "
    "past the horizon is worse than no quote (the standard guard in "
    "feature joins and tick enrichment). The gate is a codegen "
    "projection over the already-computed row-atomic carry (exact "
    "integer-micros distance), so it costs nothing beyond the base "
    "as-of: one shuffle, one sort, linear "
    "(operators/joins.py:asof_join tolerance=3_600_000_000).",
)
def j6_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_testdata(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    return J.asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "view_value"],
        tolerance=3_600_000_000,  # 1 hour in micros
    )
