"""Aggregation / window / set-op queries (SURVEY.md §2.5 A1-A7).

a1_pricing_summary is the flagship (entry()) — scan -> filter -> hash agg
-> sort, the TPC-H Q1 shape, with partial aggregation map-side and exact
decimal sums (order-insensitive at any partition count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from citydata_etl_spark.operators import aggregates as A
from citydata_etl_spark.operators.aggregates import dec_avg, dec_sum
from citydata_etl_spark.plans.catalog import register
from citydata_etl_spark.sources.readers import read_testdata


@register(
    "a1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(floor((l_quantity) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
           CAST(sum(CAST(floor((l_extendedprice) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_base_price,
           CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc_price,
           CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_charge,
           CAST(sum(CAST(floor((l_quantity) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
             / count(l_quantity) AS avg_qty,
           CAST(sum(CAST(floor((l_extendedprice) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
             / count(l_extendedprice) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A1 flagship: TPC-H-Q1-shaped pricing summary — scan with pushed "
    "filter, two-phase hash aggregate, exact decimal sums "
    "(reference README.md:6 scoring objective; SURVEY.md §7 phase 0).",
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum("l_quantity", "sum_qty"),
        dec_sum("l_extendedprice", "sum_base_price"),
        dec_sum(disc_price, "sum_disc_price"),
        dec_sum(charge, "sum_charge"),
        dec_avg("l_quantity", "avg_qty"),
        dec_avg("l_extendedprice", "avg_price"),
        F.count("*").alias("count_order"),
    )


@register(
    "a2_count_distinct",
    oracle="""
    SELECT n_name, count(DISTINCT c_custkey) AS n_customers,
           count(DISTINCT c_mktsegment) AS n_segments,
           count(*) AS n_rows
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="A2: exact distinct aggregation per group (cities-per-state analog). "
    "approx_count_distinct is a2_approx_distinct (rows-only: HLL sketches "
    "are engine-specific).",
)
def a2_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_testdata(spark, sf_dir, "customer")
    nation = read_testdata(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "a2_approx_distinct",
    oracle=None,  # HLL estimates are engine-specific; checked rows-only.
    # The oracle-exact twin is a2_kmv_distinct (integer KMV sketch);
    # tests/test_properties.py bounds KMV vs exact and vs a Python model.
    doc="A2: approx_count_distinct (HyperLogLog++) — the at-scale form of "
    "distinct counting. Rows-only BY CONSTRUCTION (the sketch is engine-"
    "internal); a2_kmv_distinct is the SQL-stateable twin the driver "
    "verifies bit-for-bit.",
)
def a2_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.count("*").alias("n_rows"),
    )


@register(
    "a2_kmv_distinct",
    oracle="""
    WITH h AS (
      SELECT DISTINCT l_returnflag,
             (1103515245 * (l_orderkey % 2147483647) + 12345)
             % 2147483647 AS hv
      FROM lineitem),
    r AS (
      SELECT l_returnflag, hv,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY hv) AS rn
      FROM h),
    buf AS (
      SELECT l_returnflag, CAST(max(hv) AS BIGINT) AS kth_hash,
             count(*) AS n_buf
      FROM r WHERE rn <= 256 GROUP BY l_returnflag),
    ex AS (
      SELECT l_returnflag,
             count(DISTINCT l_orderkey) AS n_exact,
             count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag)
    SELECT ex.l_returnflag, n_rows, n_exact, kth_hash,
           CAST(CASE WHEN n_buf < 256 THEN n_buf
                ELSE (CAST(255 AS BIGINT) * 2147483647)
                     // greatest(kth_hash, 1)
           END AS BIGINT) AS kmv_est
    FROM ex JOIN buf ON ex.l_returnflag = buf.l_returnflag
    """,
    doc="A2 (approx distinct, ORACLE-EXACT twin): K-Minimum-Values "
    "sketch (Bar-Yossef et al. 2002) — a2_approx_distinct's HLL "
    "sketches are engine-internal and can never hash-match, but KMV "
    "with a deterministic integer-LCG hash is SQL-stateable with NO "
    "float anywhere: per group keep the k=256 smallest distinct hash "
    "values; estimate = (k-1)*M DIV kth_smallest — exact integer "
    "division, identical in any engine. The exact distinct count "
    "rides along so one row verifies sketch and truth together; the "
    "engine-side error-bound test pins |est/exact - 1| within the "
    "~2/sqrt(k) KMV band. Scale: the distinct-hash set shrinks "
    "map-side, and the k-smallest buffer is a mergeable sketch (at "
    "100 TB a partial top-k per partition merges to the global k; "
    "locally the per-group rank window expresses the same).",
)
def a2_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.caching import scoped_persist

    K, M = 256, 2147483647
    li = read_testdata(spark, sf_dir, "lineitem")
    # ONE corpus scan (r18; guide §2.3-§2.4): the r17 form scanned
    # lineitem twice — a distinct for the sketch side plus a
    # countDistinct+count aggregate whose mixed distinct/non-distinct
    # plan Expands every row — where a single map-side-combined
    # (flag, orderkey) count carries everything: n_exact = its row
    # count per flag, n_rows = sum of its counts, and the sketch
    # hashes derive from its keys (with their own distinct, because
    # the LCG is mod M and two keys MAY collide at scale — the
    # oracle's DISTINCT hv). The per-key table is the only
    # corpus-sized shuffle left, and it combines map-side.
    per_key = scoped_persist(
        li.groupBy("l_returnflag", "l_orderkey").agg(
            F.count("*").alias("cnt")
        )
    )
    hv = (
        F.lit(1103515245) * F.pmod(F.col("l_orderkey"), F.lit(M))
        + F.lit(12345)
    ) % F.lit(M)
    dh = per_key.select("l_returnflag", hv.alias("hv")).distinct()
    rn = F.row_number().over(
        W.partitionBy("l_returnflag").orderBy("hv")
    )
    buf = (
        dh.withColumn("rn", rn)
        .filter(F.col("rn") <= K)
        .groupBy("l_returnflag")
        .agg(
            F.max("hv").cast("bigint").alias("kth_hash"),
            F.count("*").alias("n_buf"),
        )
    )
    ex = per_key.groupBy("l_returnflag").agg(
        F.count("*").alias("n_exact"),
        F.sum("cnt").alias("n_rows"),
    )
    est = F.when(F.col("n_buf") < K, F.col("n_buf")).otherwise(
        F.expr(f"({K - 1} * {M}L) div greatest(kth_hash, 1)")
    )
    return ex.join(buf, "l_returnflag").select(
        "l_returnflag", "n_rows", "n_exact", "kth_hash",
        est.cast("bigint").alias("kmv_est"),
    )


@register(
    "a20_countmin_topk",
    oracle="""
    WITH js AS (SELECT unnest(range(3)) AS j),
    cells AS (
      SELECT js.j AS j,
             (((1103515245 + 2 * js.j) * (user_id % 2147483647))
              % 2147483647 + (12345 + js.j * 40503))
             % 2147483647 % 32 AS cell,
             count(*) AS n
      FROM events CROSS JOIN js
      GROUP BY js.j, cell),
    ex AS (
      SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id),
    cand AS (
      SELECT user_id, exact_n FROM ex
      ORDER BY exact_n DESC, user_id LIMIT 10)
    SELECT c.user_id, CAST(c.exact_n AS BIGINT) AS exact_n,
           CAST(min(s.n) AS BIGINT) AS cms_est
    FROM cand c CROSS JOIN js
    JOIN cells s
      ON s.j = js.j
     AND s.cell = (((1103515245 + 2 * js.j) * (c.user_id % 2147483647))
                   % 2147483647 + (12345 + js.j * 40503))
                  % 2147483647 % 32
    GROUP BY c.user_id, c.exact_n
    """,
    doc="A20 (frequency sketch, ORACLE-EXACT): Count-Min sketch "
    "(Cormode & Muthukrishnan 2005) — the mergeable bounded-memory "
    "frequency structure for heavy-hitter estimation at 100 TB, "
    "stated with deterministic integer row hashes (row j multiplies "
    "by the odd constant 1103515245+2j on the mod-m-reduced key — "
    "row-dependent MULTIPLIER, not a shifted increment, so two keys "
    "colliding in one row are independent in the others; the product "
    "is bounded by (1103515245+4)*(m-1) < int64 max for any key). "
    "Sketch build = one explode(d=3) + map-side-combined groupBy into "
    "d*w = 96 cells; estimate per key = min over rows of its cell "
    "count — >= exact ALWAYS (one-sided error), pinned engine-side by "
    "a property test and verified bit-for-bit here against the top-10 "
    "exact counts riding in the same row. The d*w cell table is the "
    "mergeable sketch: partial cells sum associatively across "
    "partitions, exactly how a 1000-executor fleet merges sketches.",
)
def a20_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    D, WIDTH, M = 3, 32, 2147483647
    ev = read_testdata(spark, sf_dir, "events").select("user_id")

    def cell(j, key):
        return (
            (F.lit(1103515245 + 2 * j) * F.pmod(key, F.lit(M))) % M
            + F.lit(12345 + j * 40503)
        ) % M % WIDTH

    rows = ev.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    cell(j, F.col("user_id")).alias("cell"),
                )
                for j in range(D)
            ])
        ).alias("p")
    )
    cells = rows.groupBy("p.j", "p.cell").agg(F.count("*").alias("n"))
    ex = ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    cand = ex.orderBy(F.desc("exact_n"), "user_id").limit(10)
    probes = cand.select(
        "user_id", "exact_n",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    cell(j, F.col("user_id")).alias("cell"),
                )
                for j in range(D)
            ])
        ).alias("q"),
    )
    return (
        F.broadcast(probes)
        .join(cells, (F.col("q.j") == F.col("j"))
              & (F.col("q.cell") == F.col("cell")))
        .groupBy("user_id", "exact_n")
        .agg(F.min("n").cast("bigint").alias("cms_est"))
        .select(
            "user_id",
            F.col("exact_n").cast("bigint").alias("exact_n"),
            "cms_est",
        )
    )


@register(
    "a21_histogram_quantiles",
    oracle="""
    WITH c AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      FROM orders),
    s AS (SELECT min(c) AS lo, max(c) AS hi, count(*) AS n FROM c),
    b AS (
      SELECT c.c, ((c.c - s.lo) * 128) // (s.hi - s.lo + 1) AS b1
      FROM c, s),
    h1 AS (
      SELECT b1, count(*) AS cnt1, min(c) AS mn1, max(c) AS mx1
      FROM b GROUP BY b1),
    ch1 AS (
      SELECT *, sum(cnt1) OVER (ORDER BY b1) AS cum1 FROM h1),
    qs AS (SELECT unnest([50, 95, 99]) AS q),
    kq AS (SELECT qs.q, (qs.q * s.n + 99) // 100 AS k FROM qs, s),
    loc1 AS (
      SELECT kq.q, kq.k, min(ch1.b1) AS b1
      FROM kq JOIN ch1 ON ch1.cum1 >= kq.k
      GROUP BY kq.q, kq.k),
    t1 AS (
      SELECT l.q, l.b1, h.mn1, h.mx1,
             l.k - (h.cum1 - h.cnt1) AS k2
      FROM loc1 l JOIN ch1 h ON h.b1 = l.b1),
    a_l1 AS (
      SELECT q, b1, mn1 AS exact FROM t1 WHERE mn1 = mx1),
    t1n AS (SELECT * FROM t1 WHERE mn1 <> mx1),
    b2r AS (
      SELECT t.b1, b.c,
             ((b.c - t.mn1) * 128) // (t.mx1 - t.mn1 + 1) AS b2
      FROM b JOIN (SELECT DISTINCT b1, mn1, mx1 FROM t1n) t
        ON b.b1 = t.b1),
    h2 AS (
      SELECT b1, b2, count(*) AS cnt2, min(c) AS mn2, max(c) AS mx2
      FROM b2r GROUP BY b1, b2),
    ch2 AS (
      SELECT *, sum(cnt2) OVER (PARTITION BY b1 ORDER BY b2) AS cum2
      FROM h2),
    loc2 AS (
      SELECT t.q, t.b1, t.k2, min(ch2.b2) AS b2
      FROM t1n t JOIN ch2 ON ch2.b1 = t.b1 AND ch2.cum2 >= t.k2
      GROUP BY t.q, t.b1, t.k2),
    t2 AS (
      SELECT l.q, l.b1, l.b2, h.mn2, h.mx2,
             l.k2 - (h.cum2 - h.cnt2) AS k3
      FROM loc2 l JOIN ch2 h ON h.b1 = l.b1 AND h.b2 = l.b2),
    a_l2 AS (
      SELECT q, b1, mn2 AS exact FROM t2 WHERE mn2 = mx2),
    t2n AS (SELECT * FROM t2 WHERE mn2 <> mx2),
    ranked AS (
      SELECT r.b1, r.b2, r.c,
             row_number() OVER (PARTITION BY r.b1, r.b2 ORDER BY r.c)
               AS rnk
      FROM b2r r JOIN (SELECT DISTINCT b1, b2 FROM t2n) t
        ON r.b1 = t.b1 AND r.b2 = t.b2),
    a_l3 AS (
      SELECT t.q, t.b1, r.c AS exact
      FROM t2n t JOIN ranked r
        ON r.b1 = t.b1 AND r.b2 = t.b2 AND r.rnk = t.k3),
    answers AS (
      SELECT * FROM a_l1 UNION ALL
      SELECT * FROM a_l2 UNION ALL
      SELECT * FROM a_l3)
    SELECT CAST(a.q AS BIGINT) AS q,
           CAST(s.lo + ((a.b1 + 1) * (s.hi - s.lo + 1) + 127) // 128
                - 1 AS BIGINT) AS est_cents,
           CAST(a.exact AS BIGINT) AS exact_cents,
           CAST(s.n AS BIGINT) AS n
    FROM answers a CROSS JOIN s
    """,
    doc="A21 (distributed order statistics): GLOBAL p50/p95/p99 of the "
    "order-value cents WITHOUT a global sort — the multi-phase "
    "selection a 100 TB quantile actually runs, with BOTH histogram "
    "recursion levels unrolled (operators/aggregates.py:"
    "histogram_order_statistics). Level 1: a 128-bucket equi-width "
    "integer histogram carrying per-bucket (cnt, min, max) in one "
    "map-side-combined pass (the mergeable sketch; its bucket CEIL "
    "upper edge rides along as est_cents); the 128-row cumulative "
    "window locates each rank's bucket and residual rank. Level 2: "
    "ONLY the target buckets' rows are re-histogrammed on the "
    "bucket's own [min, max] range, so the final rank window is "
    "bounded ~n/128^2 EVEN WHEN one bucket holds >90% of the data — "
    "the adversarial-skew case where a single level degrades toward "
    "the global sort it exists to avoid (property-tested on exactly "
    "that fixture). Single-value buckets short-circuit at both "
    "levels: their min IS the order statistic for any residual rank, "
    "so the all-rows-one-value worst case never reaches a window. "
    "k = ceil(q*n/100) stated as (q*n+99) div 100 on both engines; "
    "the k-th-smallest VALUE is deterministic under ties.",
)
def a21_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    vals = orders.select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("c")
    )
    out = A.histogram_order_statistics(vals, [50, 95, 99], n_buckets=128)
    return out.select(
        "q",
        F.col("est").alias("est_cents"),
        F.col("exact").alias("exact_cents"),
        "n",
    )


#: ONE statement of the last-touch attribution contract, shared by
#: the batch entry (a22) and its streaming twin (t18, queries_time.py)
#: so the two can never silently check different horizons or tie rules.
ATTRIBUTION_ORACLE = """
    WITH e AS (
      SELECT user_id, event_type, value, epoch_us(ts) AS tus FROM events),
    w AS (
      SELECT user_id, event_type, value, tus,
             max(CASE WHEN event_type = 'click' THEN tus END) OVER
               (PARTITION BY user_id ORDER BY tus
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc,
             max(CASE WHEN event_type = 'view' THEN tus END) OVER
               (PARTITION BY user_id ORDER BY tus
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv
      FROM e),
    p AS (SELECT * FROM w WHERE event_type = 'purchase')
    SELECT CASE WHEN lc IS NOT NULL AND lc >= tus - 3600000000
                     AND (lv IS NULL OR lc >= lv) THEN 'click'
                WHEN lv IS NOT NULL AND lv >= tus - 3600000000
                  THEN 'view'
                ELSE 'organic' END AS attribution,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM p GROUP BY attribution
    """


@register(
    "a22_attribution",
    oracle=ATTRIBUTION_ORACLE,
    doc="A22 (marketing analytics): LAST-TOUCH REVENUE ATTRIBUTION — "
    "each purchase credits the same user's most recent preceding "
    "click or view within a 1-hour horizon (most-recent wins, click "
    "beats view on an exact timestamp tie), else 'organic'. The "
    "carried last-touch timestamps come from running-max windows with "
    "a RANGE frame ordered by epoch-MICROSECONDS — a ROWS frame would "
    "make the answer depend on how each engine happens to order "
    "equal-timestamp peers, the classic nondeterminism this catalog's "
    "tie-break rule exists to kill; RANGE includes all peers on both "
    "engines identically. One shuffle on user_id for the windows, one "
    "on the 3-value attribution key for the rollup; at 100 TB the "
    "window state is two timestamps per user — this is the shape "
    "attribution jobs actually run, not a per-purchase point lookup.",
)
def a22_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    H = 3_600_000_000  # 1 hour in microseconds
    ev = read_testdata(spark, sf_dir, "events").select(
        "user_id", "event_type", "value",
        F.unix_micros("ts").alias("tus"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(W.unboundedPreceding, 0)
    )
    lc = F.max(
        F.when(F.col("event_type") == "click", F.col("tus"))
    ).over(w)
    lv = F.max(
        F.when(F.col("event_type") == "view", F.col("tus"))
    ).over(w)
    pur = (
        ev.withColumn("lc", lc)
        .withColumn("lv", lv)
        .filter(F.col("event_type") == "purchase")
    )
    att = (
        F.when(
            F.col("lc").isNotNull()
            & (F.col("lc") >= F.col("tus") - H)
            & (F.col("lv").isNull() | (F.col("lc") >= F.col("lv"))),
            F.lit("click"),
        )
        .when(
            F.col("lv").isNotNull() & (F.col("lv") >= F.col("tus") - H),
            F.lit("view"),
        )
        .otherwise(F.lit("organic"))
    )
    return pur.groupBy(att.alias("attribution")).agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .cast("bigint").alias("revenue_cents"),
    )


@register(
    "a24_linear_attribution",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             epoch_us(ts) AS tus
      FROM events
      WHERE value >= 0),
    w AS (
      SELECT user_id, event_type, cents, tus,
             count(CASE WHEN event_type = 'click' THEN 1 END) OVER
               (PARTITION BY user_id ORDER BY tus
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS nc,
             count(CASE WHEN event_type = 'view' THEN 1 END) OVER
               (PARTITION BY user_id ORDER BY tus
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS nv,
             max(CASE WHEN event_type = 'click' THEN tus END) OVER
               (PARTITION BY user_id ORDER BY tus
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS lc,
             max(CASE WHEN event_type = 'view' THEN tus END) OVER
               (PARTITION BY user_id ORDER BY tus
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS lv
      FROM e),
    p AS (
      SELECT cents, nc, nv, nc + nv AS n,
             CASE WHEN nc > 0 AND (lv IS NULL OR lc >= lv)
                  THEN 'click' ELSE 'view' END AS latest
      FROM w WHERE event_type = 'purchase'),
    credited AS (
      SELECT
        CASE WHEN n = 0 THEN 0
             ELSE cents * nc // n
                  + CASE WHEN latest = 'click'
                         THEN cents - cents * nc // n - cents * nv // n
                         ELSE 0 END
        END AS click_credit,
        CASE WHEN n = 0 THEN 0
             ELSE cents * nv // n
                  + CASE WHEN latest = 'view'
                         THEN cents - cents * nc // n - cents * nv // n
                         ELSE 0 END
        END AS view_credit,
        CASE WHEN n = 0 THEN cents ELSE 0 END AS organic_credit
      FROM p),
    rows_out AS (
      SELECT 'click' AS attribution, click_credit AS credit
      FROM credited WHERE click_credit > 0
      UNION ALL
      SELECT 'view', view_credit FROM credited WHERE view_credit > 0
      UNION ALL
      SELECT 'organic', organic_credit
      FROM credited WHERE organic_credit > 0)
    SELECT attribution, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(credit) AS BIGINT) AS credit_cents
    FROM rows_out GROUP BY attribution
    """,
    doc="A24 (marketing analytics): LINEAR MULTI-TOUCH attribution — "
    "each purchase's cents split EQUALLY across every click and view "
    "in the 1-hour horizon (a22 credits only the last touch; linear "
    "is the other standard model, and the one that exposes integer "
    "division subtleties). Exactness contract: per-channel credit is "
    "cents*n_channel DIV n_touches (truncating division on "
    "non-negative cents — identical on both engines; the entry "
    "ENFORCES the sign precondition by excluding value < 0 events "
    "[refund semantics, out of attribution scope] on BOTH sides, "
    "because Spark's div truncates toward zero while DuckDB's // "
    "floors and the two diverge on negatives), and the "
    "REMAINDER cents go to the channel of the LATEST touch (click "
    "beats view on a tie — a22's rule), so every purchase's credits "
    "sum to exactly its cents: no basis-point drift, no floating "
    "split. Touch counts and latest-touch timestamps come from "
    "bounded RANGE frames ([-H, 0] microseconds — ROWS would be "
    "peer-order nondeterministic; the bounded frame also keeps "
    "window state at the horizon, not history). Purchases with zero "
    "touches are organic at full cents; a channel counts a purchase "
    "only when it received > 0 credit. One shuffle on user_id, one "
    "on the 3-value channel key.",
)
def a24_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    H = 3_600_000_000
    ev = (
        read_testdata(spark, sf_dir, "events")
        # Sign precondition for the truncating-division contract (see
        # doc): refunds (value < 0) are out of attribution scope.
        .filter(F.col("value") >= 0)
        .select(
            "user_id", "event_type",
            F.floor(F.col("value") * 100 + 0.5)
            .cast("bigint").alias("cents"),
            F.unix_micros("ts").alias("tus"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-H, 0)
    )
    is_c = F.col("event_type") == "click"
    is_v = F.col("event_type") == "view"
    pur = (
        ev.withColumn("nc", F.count(F.when(is_c, 1)).over(w))
        .withColumn("nv", F.count(F.when(is_v, 1)).over(w))
        .withColumn("lc", F.max(F.when(is_c, F.col("tus"))).over(w))
        .withColumn("lv", F.max(F.when(is_v, F.col("tus"))).over(w))
        .filter(F.col("event_type") == "purchase")
        .withColumn("n", F.col("nc") + F.col("nv"))
        .withColumn(
            "latest",
            F.when(
                (F.col("nc") > 0)
                & (F.col("lv").isNull() | (F.col("lc") >= F.col("lv"))),
                F.lit("click"),
            ).otherwise(F.lit("view")),
        )
    )
    base_c = F.expr("cents * nc div n")
    base_v = F.expr("cents * nv div n")
    rem = F.col("cents") - base_c - base_v
    click_credit = F.when(F.col("n") == 0, F.lit(0)).otherwise(
        base_c + F.when(F.col("latest") == "click", rem).otherwise(F.lit(0))
    )
    view_credit = F.when(F.col("n") == 0, F.lit(0)).otherwise(
        base_v + F.when(F.col("latest") == "view", rem).otherwise(F.lit(0))
    )
    organic_credit = F.when(
        F.col("n") == 0, F.col("cents")
    ).otherwise(F.lit(0))
    credited = pur.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("click").alias("attribution"),
                    click_credit.cast("bigint").alias("credit"),
                ),
                F.struct(
                    F.lit("view").alias("attribution"),
                    view_credit.cast("bigint").alias("credit"),
                ),
                F.struct(
                    F.lit("organic").alias("attribution"),
                    organic_credit.cast("bigint").alias("credit"),
                ),
            )
        ).alias("r")
    ).select("r.attribution", "r.credit").filter(F.col("credit") > 0)
    return credited.groupBy("attribution").agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.sum("credit").cast("bigint").alias("credit_cents"),
    )


@register(
    "a23_sliding_distinct",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS slot
      FROM events),
    w AS (
      SELECT user_id, slot - 300 * o.o AS window_start
      FROM e, (SELECT unnest([0, 1]) AS o) o),
    valid AS (SELECT * FROM w WHERE window_start >= 0)
    SELECT window_start, count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM valid GROUP BY window_start
    """,
    doc="A23 (sliding-window DISTINCT): distinct users per 10-minute "
    "window sliding every 5 — the DAU/engagement shape where the "
    "aggregate is NOT algebraic (a distinct cannot be merged from "
    "sub-window partials the way counts can), so each event must fan "
    "out to every window it belongs to BEFORE the distinct: Spark's "
    "window('ts','10 minutes','5 minutes') does that expansion "
    "(2 windows per event at this width/slide), then "
    "count_distinct(user_id) per window plans as the standard "
    "two-phase Expand + partial aggregate. The oracle states the same "
    "expansion arithmetic (slot - 300*o). At 100 TB this is the "
    "textbook case for swapping in the mergeable KMV sketch once "
    "per-window exactness stops paying for its shuffle width — the "
    "swap is SHIPPED as a23_sliding_kmv (per-slot k-min buffers "
    "merged per window, merge == direct pinned by property test), "
    "whose doc states when each half wins.",
)
def a23_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_testdata(spark, sf_dir, "events")
    out = (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "n_users",
            "n_events",
        )
    )
    return out.filter(F.col("window_start") >= 0)


@register(
    "a23_sliding_kmv",
    oracle="""
    WITH e AS (
      SELECT DISTINCT
             CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS slot,
             (1103515245 * (user_id % 2147483647) + 12345)
             % 2147483647 AS hv
      FROM events),
    slot_buf AS (
      SELECT slot, hv FROM (
        SELECT slot, hv,
               row_number() OVER (PARTITION BY slot ORDER BY hv) AS rn
        FROM e) WHERE rn <= 64),
    merged AS (
      SELECT DISTINCT slot - 300 * o.o AS window_start, hv
      FROM slot_buf, (SELECT unnest([0, 1]) AS o) o
      WHERE slot - 300 * o.o >= 0),
    wbuf AS (
      SELECT window_start, CAST(max(hv) AS BIGINT) AS kth_hash,
             count(*) AS n_buf
      FROM (
        SELECT window_start, hv,
               row_number() OVER (PARTITION BY window_start
                                  ORDER BY hv) AS rn
        FROM merged) WHERE rn <= 64
      GROUP BY window_start),
    ex AS (
      SELECT window_start, count(DISTINCT user_id) AS n_exact
      FROM (
        SELECT user_id,
               CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)
               - 300 * o.o AS window_start
        FROM events, (SELECT unnest([0, 1]) AS o) o)
      WHERE window_start >= 0 GROUP BY window_start)
    SELECT ex.window_start, CAST(n_exact AS BIGINT) AS n_exact,
           CAST(n_buf AS BIGINT) AS n_buf, kth_hash,
           CAST(CASE WHEN n_buf < 64 THEN n_buf
                ELSE (CAST(63 AS BIGINT) * 2147483647)
                     // greatest(kth_hash, 1)
           END AS BIGINT) AS kmv_est
    FROM ex JOIN wbuf ON ex.window_start = wbuf.window_start
    """,
    doc="A23 x A2 (the pairing SHIPPED, r10 VERDICT task 4): sliding-"
    "window distinct users via the mergeable integer-KMV sketch — "
    "the 100 TB form a23_sliding_distinct's doc promises. The "
    "composition is the point: each 5-minute SLOT builds one k=64 "
    "KMV buffer (k smallest distinct LCG hashes of user_id), and "
    "each 10-minute window MERGES its two slots' buffers — the k "
    "smallest of a union are always within the union of each side's "
    "k smallest, so slot-merge loses NOTHING vs sketching the window "
    "directly (pinned by the engine-side property test, and by the "
    "oracle computing the merged form). Estimate = 63*M DIV "
    "kth_smallest, exact integer division; the exact distinct count "
    "rides along so one row shows sketch vs truth. WHEN EACH HALF "
    "WINS: a23_sliding_distinct's exact Expand+distinct pays a "
    "shuffle whose width is (events x windows-per-event) and a "
    "per-window distinct state proportional to true cardinality — "
    "right up to ~10^6 users/window; this sketch caps per-window "
    "state at k hashes and merges ACROSS slots (each event hashed "
    "into exactly ONE slot sketch, the window fan-out touching only "
    "k-row buffers), so at 100 TB the shuffle carries sketches, not "
    "users — the win whenever |users| >> k and a ~12%% (2/sqrt(64)) "
    "error band is acceptable. On this fixture windows hold < 64 "
    "users, so n_buf < k and the estimate equals n_exact — the "
    "estimator branch is exercised by the property test's large "
    "synthetic cardinalities.",
)
def a23_sliding_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.aggregates import sliding_kmv_distinct

    events = read_testdata(spark, sf_dir, "events")
    return sliding_kmv_distinct(
        events, slide_s=300, n_slots=2, k=64,
        ts_col="ts", key_col="user_id",
    )


@register(
    "a3_rollup",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_customers,
           CAST(sum(CAST(floor((c_acctbal) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="A3: hierarchical rollup region -> nation (state -> city drilldown "
    "analog, reference README.md:6-7 dashboard objective).",
)
def a3_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_testdata(spark, sf_dir, "customer")
    nation = read_testdata(spark, sf_dir, "nation")
    region = read_testdata(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return A.rollup_agg(
        joined,
        ["r_name", "n_name"],
        [F.count("*").alias("n_customers"), dec_sum("c_acctbal", "total_bal")],
    )


@register(
    "a3_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(floor((l_quantity) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="A3: full cube over the two lineitem flags.",
)
def a3_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem")
    return A.cube_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [F.count("*").alias("n"), dec_sum("l_quantity", "sum_qty")],
    )


@register(
    "a4_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT n_name, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY n_name
                                ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer JOIN nation ON c_nationkey = n_nationkey)
    WHERE rnk <= 3
    """,
    doc="A4: top-k per group (top cities per state analog) — row_number "
    "over a TOTAL order (unique key tie-break) so the cut is deterministic.",
)
def a4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_testdata(spark, sf_dir, "customer")
    nation = read_testdata(spark, sf_dir, "nation")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("n_name", "c_custkey", "c_acctbal")
    return A.topk_per_group(
        joined,
        ["n_name"],
        [F.col("c_acctbal").desc(), F.col("c_custkey")],
        k=3,
    )


@register(
    "a5_window_lag",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_value,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 100.0 AS running_value
    FROM events
    """,
    doc="A5: analytic windows — lag + running sum per user over event time "
    "(population-growth-delta analog, reference README.md:5). Integer-cent "
    "running sum keeps prefix sums exact.",
)
def a5_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_testdata(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return events.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        (F.sum(A.cents("value")).over(wrun).cast("double") / 100.0)
        .alias("running_value"),
    )


@register(
    "a6_global_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    doc="A6: global top-k — TakeOrderedAndProject, no full sort "
    "(each partition keeps k, driver merges).",
)
def a6_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    return A.topk_global(
        orders, [F.col("o_totalprice").desc(), F.col("o_orderkey")], k=100
    )


@register(
    "a7_set_ops",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    EXCEPT ALL
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    doc="A7: multiset EXCEPT ALL (backlog-diff analog over the three "
    "parallel control tables).",
)
def a7_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_testdata(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0).select("c_custkey")
    bld = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return pos.exceptAll(bld)


@register(
    "a7_union_by_name",
    oracle="""
    WITH a AS (SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal,
                      NULL AS segment
               FROM customer WHERE c_nationkey = 1),
         b AS (SELECT c_custkey AS id, c_name AS name, NULL AS bal,
                      c_mktsegment AS segment
               FROM customer WHERE c_nationkey = 2)
    SELECT id, name, CAST(bal AS DOUBLE) AS bal, CAST(segment AS VARCHAR) AS segment
    FROM a
    UNION ALL
    SELECT id, name, CAST(bal AS DOUBLE), CAST(segment AS VARCHAR) FROM b
    """,
    doc="A7: schema-reconciling union — unionByName(allowMissingColumns) "
    "over drifted per-source schemas (the three control tables have three "
    "different schemas, SURVEY.md §1.3).",
)
def a7_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_testdata(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_nationkey") == 1).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    b = cust.filter(F.col("c_nationkey") == 2).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "a4_rank_dense_rank",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC)
             AS price_rank,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC)
             AS price_dense_rank
    FROM part
    """,
    doc="A4: rank/dense_rank — tie-aware ranking within brand (both are "
    "deterministic under ties because equal inputs get equal ranks).",
)
def a4_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_testdata(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return part.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


@register(
    "a8_city_score",
    oracle="""
    WITH cust_m AS (
      SELECT c_nationkey AS nk, count(*) AS n_cust,
             CAST(sum(CAST(floor((c_acctbal) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
               / count(*) AS avg_bal
      FROM customer GROUP BY c_nationkey),
    ord_m AS (
      SELECT c.c_nationkey AS nk,
             CAST(sum(CAST(floor((o.o_totalprice) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
               AS revenue,
             count(*) AS n_orders
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey),
    joined AS (
      SELECT n.n_name AS nation, cm.avg_bal, om.revenue, om.n_orders
      FROM nation n
      JOIN cust_m cm ON cm.nk = n.n_nationkey
      JOIN ord_m om ON om.nk = n.n_nationkey),
    normed AS (
      SELECT nation, revenue, n_orders, avg_bal,
        (revenue - min(revenue) OVER ())
          / (max(revenue) OVER () - min(revenue) OVER ()) AS nr,
        (CAST(n_orders AS DOUBLE) - min(CAST(n_orders AS DOUBLE)) OVER ())
          / (max(CAST(n_orders AS DOUBLE)) OVER ()
             - min(CAST(n_orders AS DOUBLE)) OVER ()) AS no_,
        (avg_bal - min(avg_bal) OVER ())
          / (max(avg_bal) OVER () - min(avg_bal) OVER ()) AS nb
      FROM joined)
    SELECT nation, revenue, n_orders,
           CAST(floor(avg_bal * 100 + 0.5) AS DOUBLE) / 100.0 AS avg_bal,
           round(0.5 * nr + 0.3 * no_ + 0.2 * nb, 6) AS score,
           CAST(row_number() OVER (
             ORDER BY round(0.5 * nr + 0.3 * no_ + 0.2 * nb, 6) DESC, nation
           ) AS BIGINT) AS rnk
    FROM normed
    """,
    doc="A8 [implied by reference README.md:6 'score each city']: the "
    "scoring/analytics layer the reference promises but never built — "
    "per-entity metrics from two fact aggregations (never joined "
    "row-level, so no fan-out double counting), min-max normalization via "
    "unpartitioned windows over the small aggregate, weighted composite "
    "score, total-order ranking. The city:metric -> nation:metric mapping "
    "is structural (testdata has no city column).",
)
def a8_city_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_testdata(spark, sf_dir, "customer")
    orders = read_testdata(spark, sf_dir, "orders")
    nation = read_testdata(spark, sf_dir, "nation")
    cust_m = customer.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("n_cust"),
        (dec_sum("c_acctbal", "s") / F.count("*")).alias("avg_bal"),
    )
    ord_m = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            dec_sum("o_totalprice", "revenue"),
            F.count("*").alias("n_orders"),
        )
    )
    joined = (
        nation.join(cust_m, cust_m.nk == nation.n_nationkey)
        .join(ord_m, ord_m.nk == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"), "avg_bal", "revenue", "n_orders"
        )
    )
    w = W.partitionBy()

    def norm(c):
        lo, hi = F.min(c).over(w), F.max(c).over(w)
        return (c - lo) / (hi - lo)

    nr = norm(F.col("revenue"))
    no_ = norm(F.col("n_orders").cast("double"))
    nb = norm(F.col("avg_bal"))
    score = F.round(0.5 * nr + 0.3 * no_ + 0.2 * nb, 6)
    rw = W.orderBy(F.col("score").desc(), "nation")
    return (
        joined.withColumn("score", score)
        .withColumn(
            "avg_bal",
            F.floor(F.col("avg_bal") * 100 + F.lit(0.5)).cast("double") / 100.0,
        )
        .withColumn("rnk", F.row_number().over(rw).cast("bigint"))
        .select("nation", "revenue", "n_orders", "avg_bal", "score", "rnk")
    )


@register(
    "a5_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(floor((value) * 100 + 0.5) AS BIGINT)) OVER w AS DOUBLE)
             / (100.0 * count(*) OVER w) AS mov_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    doc="A5: 4-row moving average per user over event time — the "
    "population-growth smoothing analog (reference README.md:5). "
    "Frame sums use integer cents so partial order cannot change a bit.",
)
def a5_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_testdata(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return events.select(
        "event_id",
        "user_id",
        (
            F.sum(cents).over(w).cast("double")
            / (F.lit(100.0) * F.count(F.lit(1)).over(w))
        ).alias("mov_avg"),
    )


@register(
    "a2_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY o_orderpriority
    """,
    doc="A2/scoring support: exact continuous percentiles per group "
    "(quartiles of order value) — linear interpolation agrees bit-for-bit "
    "with DuckDB's quantile_cont at round-4. At 100 TB swap for "
    "approx_percentile(col, p, accuracy) — same plan shape, bounded "
    "memory sketch instead of a full sort.",
)
def a2_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
    )


@register(
    "a9_pivot",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (o_orderstatus = 'F') AS st_f,
           count(*) FILTER (o_orderstatus = 'O') AS st_o,
           count(*) FILTER (o_orderstatus = 'P') AS st_p
    FROM orders GROUP BY o_orderpriority
    """,
    doc="A9/pivot: long-to-wide reshaping — groupBy().pivot() with an "
    "EXPLICIT value list (the implicit form runs a separate distinct scan "
    "to discover columns; never do that on a 100 TB fact). Oracle is the "
    "equivalent filtered-count formulation.",
)
def a9_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return wide.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("st_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("st_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("st_p"),
    )


@register(
    "a4_ntile",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INT)
             AS balance_quartile
    FROM customer
    """,
    doc="A4/scoring support: ntile quartile bucketing over a total order "
    "(acctbal desc, custkey tie-break) — identical bucket-size semantics "
    "in Spark and DuckDB (first n%4 buckets take the extra row).",
)
def a4_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_testdata(spark, sf_dir, "customer")
    w = W.orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return customer.select(
        "c_custkey", F.ntile(4).over(w).cast("int").alias("balance_quartile")
    )


@register(
    "a10_table_profile",
    oracle="""
    SELECT 'o_orderstatus' AS col_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nulls,
           count(DISTINCT o_orderstatus) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*),
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           count(DISTINCT o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*),
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           count(DISTINCT o_custkey)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*),
           CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           count(DISTINCT o_orderdate)
    FROM orders
    """,
    doc="A10 (profiling extension): single-aggregate column profiler — "
    "per-column null and exact distinct counts in long format via one "
    "wide agg + stack() unpivot (the multi-distinct Expand strategy; at "
    "extreme cardinality swap in approx_count_distinct for a single-pass "
    "HLL plan). The data-quality gate the reference lacks "
    "(operators/relational.py:profile_table).",
)
def a10_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.relational import profile_table

    return profile_table(
        read_testdata(spark, sf_dir, "orders"),
        ["o_orderstatus", "o_orderpriority", "o_custkey", "o_orderdate"],
    )


@register(
    "a11_heavy_hitters",
    oracle="""
    WITH counts AS (
      SELECT l_suppkey, count(*) AS n_rows FROM lineitem GROUP BY l_suppkey),
    tot AS (
      SELECT sum(n_rows) AS _total, count(*) AS n_keys FROM counts)
    SELECT l_suppkey, n_rows,
           CAST((n_rows * 1000000) // _total AS BIGINT) AS share_ppm,
           CAST((n_rows * n_keys * 100) // _total AS BIGINT) AS x_avg_pct
    FROM counts, tot
    ORDER BY n_rows DESC, l_suppkey
    LIMIT 20
    """,
    doc="A11 (skew diagnostics extension): exact heavy-hitter profile of "
    "the lineitem supplier key — top-20 hottest keys with row count, "
    "exact ppm share, and multiple-of-average "
    "(operators/aggregates.py:key_skew_profile). This is the planning "
    "query behind j7_salted_skew_join: at 100 TB you run it on the join "
    "key FIRST (cost: one map-side-combined aggregate whose shuffle is "
    "one row per distinct key) and read off whether the hot key's "
    "x_avg_pct justifies salting. Exact integer shares keep the result "
    "hash-stable; TakeOrderedAndProject keeps the top-k sort local.",
)
def a11_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.aggregates import key_skew_profile

    return key_skew_profile(
        read_testdata(spark, sf_dir, "lineitem"), "l_suppkey", top_k=20
    )


@register(
    "a3_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
    doc="A3 (grouping sets): arbitrary grouping-set selection — the "
    "general form rollup/cube specialize (exactly the three sets a "
    "reporting layer asks for, no wasted grand-total or unwanted "
    "combinations). Spark expands the sets through the same single-pass "
    "Expand operator as cube: one scan, each row replicated once per "
    "matching set, then one two-phase hash aggregate — at 100 TB that is "
    "one shuffle for all three breakdowns instead of three separate "
    "aggregation jobs. NULL group markers are coalesced to '<all>' on "
    "both sides so the hash compare is total.",
)
def a3_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    gs = orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"],
         ["o_orderstatus", "o_orderpriority"]],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n_orders"),
        dec_sum("o_totalprice", "total"),
    )
    return gs.select(
        F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
        "n_orders",
        "total",
    )


@register(
    "a12_event_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id)
    SELECT v.user_id,
           CAST(floor(epoch(v.t1)) AS BIGINT) AS view_ts,
           CAST(floor(epoch(c.t2)) AS BIGINT) AS click_ts,
           CAST(floor(epoch(p.t3)) AS BIGINT) AS purchase_ts,
           1 + CAST(c.user_id IS NOT NULL AS INT)
             + CAST(p.user_id IS NOT NULL AS INT) AS stage
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
    doc="A12 (ordered funnel): view -> click -> purchase completion per "
    "user, each step strictly after the previous "
    "(operators/aggregates.py:funnel_stages). The Spark side is ONE "
    "shuffle + a codegen fold over each user's time-sorted event structs "
    "— no joins, no windows; the oracle states the same semantics as "
    "cascaded min-aggregates (first click after the first view, first "
    "purchase after that click), which the fold provably equals because "
    "folding a time-ordered sequence takes the minimum qualifying "
    "timestamp at every step. The sequential dependency (step k's "
    "window opens at step k-1's time) is what a pivot cannot express.",
)
def a12_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.aggregates import funnel_stages

    events = read_testdata(spark, sf_dir, "events")
    return funnel_stages(events, ["view", "click", "purchase"])


@register(
    "a5_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_trailing,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
                AS DOUBLE) / 100.0 AS sum_trailing
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="A5 (time-based window frame): per event, the trailing-1-hour "
    "per-user event count and exact value sum through a RANGE frame over "
    "epoch-microseconds — the VALUE-based frame (wall-clock trailing "
    "window), distinct from the ROWS frames a5_moving_avg uses: row "
    "frames count neighbors, range frames measure TIME, and only the "
    "latter says 'the last hour' when event spacing is irregular. "
    "Same one-shuffle window shape (partition by user), exact integer "
    "cents inside the frame; ties at equal timestamps are frame PEERS "
    "(included together) identically in both engines.",
)
def a5_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = read_testdata(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    return events.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        (F.sum(cents).over(w).cast("double") / 100.0).alias("sum_trailing"),
    )


@register(
    "a15_outlier_flags",
    oracle="""
    WITH x AS (
      SELECT o_orderpriority AS grp,
             CAST(year(o_orderdate) AS INT) AS yr,
             CAST(floor(o_totalprice / 100) AS BIGINT) AS v
      FROM orders),
    st AS (
      SELECT grp, yr,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS s1,
             CAST(sum(v * v) AS BIGINT) AS s2
      FROM x GROUP BY grp, yr)
    SELECT x.grp, x.yr, st.n AS n_rows,
           CAST(sum(CASE WHEN (st.n * x.v - st.s1) * (st.n * x.v - st.s1)
                              > 9 * (st.n * st.s2 - st.s1 * st.s1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM x JOIN st ON x.grp = st.grp AND x.yr = st.yr
    GROUP BY x.grp, x.yr, st.n
    """,
    doc="A15 (anomaly extension): per-group 3-sigma outlier counts with "
    "EXACT integer arithmetic — the z-score test |x - mean| > 3*stddev "
    "cross-multiplied to (n*x - S1)^2 > 9*(n*S2 - S1^2), so no float "
    "mean/variance (whose summation ORDER differs by partitioning and "
    "between engines) ever exists: S1/S2 are exact integer sums of "
    "floor-dollar values and the comparison is bigint-vs-bigint "
    "(operators/aggregates.py conventions). Engine shape: one window "
    "over the group computes the per-row flag with no self-join, then "
    "one aggregate — two exchanges on the same key, which AQE reuses. "
    "Values are bucketed to hundreds of dollars BEFORE squaring so the "
    "bigint bound has real headroom: with v <= ~5*10^3, both "
    "(n*v - S1)^2 and 9*(n*S2 - S1^2) stay under 2^63 up to n ~ 10^6 "
    "rows per group (dollar-resolution values left only ~2x headroom "
    "at sf0.1 — measured, not guessed); past that, pre-aggregate per "
    "sub-bucket or move S2 to DECIMAL(38,0).",
)
def a15_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = read_testdata(spark, sf_dir, "orders")
    x = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.year("o_orderdate").alias("yr"),
        F.floor(F.col("o_totalprice") / 100).cast("bigint").alias("v"),
    )
    w = W.partitionBy("grp", "yr")
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum("v").over(w)
    s2 = F.sum(F.col("v") * F.col("v")).over(w)
    dev = n * F.col("v") - s1
    flagged = x.select(
        "grp", "yr",
        n.alias("n"),
        (dev * dev > 9 * (n * s2 - s1 * s1)).alias("is_outlier"),
    )
    return flagged.groupBy("grp", "yr", "n").agg(
        F.sum(F.when(F.col("is_outlier"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_outliers")
    ).select(
        "grp", "yr", F.col("n").alias("n_rows"), "n_outliers"
    )


@register(
    "a16_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CAST(floor(epoch(ts)) AS BIGINT) // 604800) AS cohort_wk
      FROM events GROUP BY user_id),
    act AS (
      SELECT DISTINCT e.user_id, f.cohort_wk,
             CAST(floor(epoch(e.ts)) AS BIGINT) // 604800 - f.cohort_wk
               AS wk_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
           CAST(wk_offset AS BIGINT) AS wk_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM act GROUP BY cohort_wk, wk_offset
    """,
    doc="A16 (product-analytics extension): weekly cohort retention — "
    "users grouped by first-seen epoch week, counted once per "
    "(cohort, week-offset) they return in. The classic retention "
    "triangle every analytics stack ships. Engine shape: ONE window "
    "(min over user partition) replaces the self-join the SQL states — "
    "first-seen derives in the same exchange that the distinct then "
    "reuses (partitioning on user_id), so the whole query is two "
    "exchanges: user_id, then the cohort key. Epoch-week integer "
    "division keeps bucket edges engine-exact.",
)
def a16_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = read_testdata(spark, sf_dir, "events")
    wk = F.floor(F.col("ts").cast("double")).cast("bigint") / 604800
    ev = events.select(
        "user_id", wk.cast("bigint").alias("wk")
    )
    w = W.partitionBy("user_id")
    act = (
        ev.withColumn("cohort_wk", F.min("wk").over(w))
        .select(
            "user_id",
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).alias("wk_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_wk", "wk_offset").agg(
        F.count("*").alias("n_users")
    )


@register(
    "a4_distribution",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(rank() OVER w AS BIGINT) AS rnk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    """,
    doc="A4 (distribution windows): percent_rank / cume_dist / rank over "
    "value order within each priority class — the empirical-CDF windows "
    "reporting layers use for percentile badges. Both are exact "
    "rationals ((rank-1)/(n-1), peers/n) computed from the same "
    "integers in both engines, so the doubles compare bit-exact with "
    "no rounding step; ties on the ordering value are frame peers "
    "identically by SQL window semantics. One exchange on the "
    "partition key.",
)
def a4_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = read_testdata(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.rank().over(w).cast("bigint").alias("rnk"),
    )


@register(
    "a17_time_weighted_avg",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(floor(epoch(ts)) AS BIGINT) AS tsec, event_id,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm
      FROM events),
    w AS (
      SELECT event_type, day, vm, tsec,
             lead(tsec) OVER (PARTITION BY event_type, day
                              ORDER BY tsec, event_id) AS nxt
      FROM e),
    seg AS (
      SELECT event_type, day,
             vm * (nxt - tsec) AS wv, nxt - tsec AS dt
      FROM w WHERE nxt IS NOT NULL)
    SELECT event_type, day,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(dt) AS BIGINT) AS covered_s,
           CASE WHEN sum(dt) > 0 THEN
             CAST(floor(CAST(sum(wv) AS DOUBLE)
                        / CAST(sum(dt) AS BIGINT)) AS BIGINT)
           END AS twa_micros
    FROM seg GROUP BY event_type, day
    """,
    doc="A17 (time-weighted average extension): the irregular-sampling "
    "aggregate TimescaleDB calls time_weight — each observation's "
    "value, LOCF-held, is weighted by the seconds until the next "
    "observation in its (event_type, day) bucket, so a sensor that "
    "reports once an hour is not drowned out by one that reports "
    "every second (a plain avg() is sampling-rate-biased; this is "
    "duration-unbiased). Trailing observations (no successor in the "
    "bucket) contribute no segment — the closed-segment definition, "
    "stated identically in both engines. Exact integer micros x "
    "seconds; the final ratio is floor(double/int) per the catalog's "
    "determinism convention. Engine shape: ONE window (lead over the "
    "bucket sort) + ONE hash aggregate — two exchanges total, both on "
    "the bucket key, nothing driver-side.",
)
def a17_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = read_testdata(spark, sf_dir, "events")
    e = events.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("tsec"),
        "event_id",
        F.floor(F.col("value") * 1000000 + 0.5).cast("bigint").alias("vm"),
    )
    w = W.partitionBy("event_type", "day").orderBy("tsec", "event_id")
    seg = (
        e.withColumn("nxt", F.lead("tsec").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            "event_type",
            "day",
            (F.col("vm") * (F.col("nxt") - F.col("tsec"))).alias("wv"),
            (F.col("nxt") - F.col("tsec")).alias("dt"),
        )
    )
    return seg.groupBy("event_type", "day").agg(
        F.count("*").cast("bigint").alias("n_segments"),
        F.sum("dt").cast("bigint").alias("covered_s"),
        F.when(
            F.sum("dt") > 0,
            F.floor(
                F.sum("wv").cast("double") / F.sum("dt").cast("bigint")
            ).cast("bigint"),
        ).alias("twa_micros"),
    )


@register(
    "a18_ohlc_bars",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bar_ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS tsec, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events),
    w AS (
      SELECT event_type, bar_ts, vc,
             row_number() OVER (PARTITION BY event_type, bar_ts
                                ORDER BY tsec, event_id) AS rf,
             row_number() OVER (PARTITION BY event_type, bar_ts
                                ORDER BY tsec DESC, event_id DESC) AS rl
      FROM e)
    SELECT event_type, bar_ts,
           CAST(max(CASE WHEN rf = 1 THEN vc END) AS BIGINT) AS open_c,
           CAST(max(vc) AS BIGINT) AS high_c,
           CAST(min(vc) AS BIGINT) AS low_c,
           CAST(max(CASE WHEN rl = 1 THEN vc END) AS BIGINT) AS close_c,
           CAST(count(*) AS BIGINT) AS n_events
    FROM w GROUP BY event_type, bar_ts
    """,
    doc="A18 (OHLC bars extension): per (event_type, hour) candlestick "
    "aggregation — open/high/low/close in exact integer cents plus the "
    "event count, the downsampling shape every metrics store "
    "(Timescale candlestick_agg, kdb bar builders) serves dashboards "
    "from. Open/close are first/last by (tsec, event_id) — a TOTAL "
    "order, so the bars are engine-exact (a bare first()/last() over "
    "an unordered aggregate would be partition-order nondeterminism). "
    "Engine shape: both row_number windows share ONE partitioning "
    "(one exchange on the bar key — the second window reuses the "
    "sorted partition with a reversed sort, no new shuffle), then one "
    "hash aggregate; at 100 TB this downsamples in a single pass with "
    "per-bar state only.",
)
def a18_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = read_testdata(spark, sf_dir, "events")
    e = events.select(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
        .cast("bigint")
        .alias("bar_ts"),
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("tsec"),
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
    )
    wf = W.partitionBy("event_type", "bar_ts").orderBy("tsec", "event_id")
    wl = W.partitionBy("event_type", "bar_ts").orderBy(
        F.col("tsec").desc(), F.col("event_id").desc()
    )
    w = e.select(
        "event_type",
        "bar_ts",
        "vc",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
    )
    return w.groupBy("event_type", "bar_ts").agg(
        F.max(F.when(F.col("rf") == 1, F.col("vc")))
        .cast("bigint")
        .alias("open_c"),
        F.max("vc").cast("bigint").alias("high_c"),
        F.min("vc").cast("bigint").alias("low_c"),
        F.max(F.when(F.col("rl") == 1, F.col("vc")))
        .cast("bigint")
        .alias("close_c"),
        F.count("*").cast("bigint").alias("n_events"),
    )


@register(
    "a19_event_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS tsec, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY tsec, event_id) AS prev_type
      FROM events)
    SELECT prev_type AS from_type, event_type AS to_type,
           CAST(count(*) AS BIGINT) AS n_transitions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
    doc="A19 (behavioral transition matrix): per-user event sequences "
    "ordered by (tsec, event_id) — a TOTAL order, so the lag is "
    "engine-exact — folded into the global (from_type -> to_type) "
    "Markov transition counts plus the distinct-user reach of each "
    "edge. The sequence-mining primitive behind funnel discovery and "
    "next-action models, complementing a12's fixed funnel with the "
    "full empirical transition graph. Engine shape: one window "
    "exchange on user_id, one aggregate exchange on the 25-cell "
    "transition key — per-user state never materializes beyond the "
    "lag buffer, which is what keeps it linear on a 100 TB event "
    "log.",
)
def a19_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = read_testdata(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("tsec", "event_id")
    s = events.select(
        "user_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("tsec"),
        "event_id",
    ).withColumn("prev_type", F.lag("event_type").over(w))
    return (
        s.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_transitions"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )
