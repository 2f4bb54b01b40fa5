"""Scalar-function queries (SURVEY.md §2.6 F1-F11), each over testdata with
a DuckDB oracle. Every expression here is a builtin Column expression —
whole-stage codegen, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citydata_etl_spark.functions.scalar import (
    TS_FORMAT_REST,
    TS_FORMAT_WRITE,
    dual_format_ts,
    haversine_km,
)
from citydata_etl_spark.plans.catalog import register
from citydata_etl_spark.sources.readers import read_testdata


@register(
    "f8_html_extract",
    oracle="""
    SELECT doc_id, text AS content
    FROM documents
    """,
    doc="F8/D3: HTML element extraction by id (reference "
    "lambda/collect-data.py:83-89, BeautifulSoup find(id=...)): documents "
    "are wrapped in a synthetic page (title/content/footer divs) and the "
    "content element's text is recovered through the Arrow-batched "
    "HTMLParser pandas_udf (functions/html.py:extract_text_by_id) — the "
    "oracle is the original text, proving the round-trip is lossless.",
)
def f8_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.functions.html import extract_text_by_id

    docs = read_testdata(spark, sf_dir, "documents")
    page = F.concat(
        F.lit('<html><body><h1 id="title">Doc '),
        F.col("doc_id"),
        F.lit('</h1><div id="content">'),
        F.col("text"),
        F.lit('</div><footer id="foot">f</footer></body></html>'),
    )
    return docs.select(
        "doc_id",
        extract_text_by_id(page, "content").alias("content"),
    )


@register(
    "f1_f3_dual_ts_roundtrip",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0
                THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
                ELSE strftime(o_orderdate, '%Y-%m-%dT%H-%M-%S') END AS raw,
           CASE WHEN o_orderkey % 2 = 0
                THEN strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                              '%Y-%m-%d %H:%M:%S')
                ELSE strptime(strftime(o_orderdate, '%Y-%m-%dT%H-%M-%S'),
                              '%Y-%m-%dT%H-%M-%S') END AS parsed
    FROM orders
    """,
    doc="F1+F3: the dual timestamp-format quirk — format each timestamp in "
    "one of the reference's two formats (at-rest vs code-written, "
    "reference lambda/collect-data.py:114 vs data/usa_control.csv:2), then "
    "parse back with the dual-format coalesce. parsed == original proves "
    "both format paths.",
)
def f1_f3_dual_ts_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    raw = F.when(
        F.col("o_orderkey") % 2 == 0,
        F.date_format("o_orderdate", TS_FORMAT_REST),
    ).otherwise(F.date_format("o_orderdate", TS_FORMAT_WRITE))
    return orders.select(
        "o_orderkey",
        raw.alias("raw"),
        dual_format_ts(raw).alias("parsed"),
    )


@register(
    "f2_date_parts",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(hour(o_orderdate) AS INT) AS h,
           count(*) AS n
    FROM orders GROUP BY 1, 2, 3, 4
    """,
    doc="F2: year/month/day/hour partition-value derivation "
    "(reference lambda/process-staging.py:14-18).",
)
def f2_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
            F.hour("o_orderdate").alias("h"),
        )
        .groupBy("y", "m", "d", "h")
        .agg(F.count("*").alias("n"))
    )


@register(
    "f4_f5_split_element",
    oracle="""
    WITH keyed AS (
      SELECT 'staging/' || o_orderpriority || '/' || o_orderstatus || '/'
             || CAST(o_orderkey AS VARCHAR) || '.txt' AS key
      FROM orders)
    SELECT replace(key, 'staging/', '') AS stripped,
           string_split(key, '/')[2] AS priority,
           string_split(key, '/')[3] AS status,
           replace(string_split(key, '/')[4], '.txt', '') AS orderkey
    FROM keyed
    """,
    doc="F4+F5: object-key parsing — strip prefix, split on '/', positional "
    "element extraction (reference lambda/process-staging.py:26,33-44).",
)
def f4_f5_split_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    keyed = orders.select(
        F.concat_ws(
            "/",
            F.lit("staging"),
            "o_orderpriority",
            "o_orderstatus",
            F.concat(F.col("o_orderkey").cast("string"), F.lit(".txt")),
        ).alias("key")
    )
    parts = F.split(F.col("key"), "/")
    return keyed.select(
        F.regexp_replace("key", "^staging/", "").alias("stripped"),
        F.element_at(parts, 2).alias("priority"),
        F.element_at(parts, 3).alias("status"),
        F.regexp_replace(F.element_at(parts, 4), "\\.txt$", "").alias("orderkey"),
    )


@register(
    "f6_key_building",
    oracle="""
    SELECT concat_ws('/', source, schema_name, table_name, load,
                     CAST(y AS VARCHAR), CAST(m AS VARCHAR),
                     CAST(d AS VARCHAR), CAST(h AS VARCHAR)) AS curated_key,
           count(*) AS n
    FROM (
      SELECT 'events' AS source, 'public' AS schema_name,
             event_type AS table_name,
             CASE WHEN event_id % 10 = 0 THEN 'initial' ELSE 'cdc' END AS load,
             year(ts) AS y, month(ts) AS m, day(ts) AS d, hour(ts) AS h
      FROM events)
    GROUP BY curated_key
    """,
    doc="F6: curated-key building by interpolation — the "
    "{source}/{schema}/{table}/{load}/{y}/{m}/{d}/{h} layout "
    "(reference lambda/process-staging.py:38,44) built with concat_ws; "
    "grouped to one row per would-be partition directory.",
)
def f6_key_building(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_testdata(spark, sf_dir, "events")
    derived = events.select(
        F.lit("events").alias("source"),
        F.lit("public").alias("schema_name"),
        F.col("event_type").alias("table_name"),
        F.when(F.col("event_id") % 10 == 0, "initial")
        .otherwise("cdc")
        .alias("load"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
    )
    return derived.select(
        F.concat_ws(
            "/", "source", "schema_name", "table_name", "load", "y", "m", "d", "h"
        ).alias("curated_key")
    ).groupBy("curated_key").agg(F.count("*").alias("n"))


@register(
    "f7_json_extract",
    oracle="""
    SELECT event_type,
           CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
             AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
             AS max_k,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS sum_k
    FROM events GROUP BY event_type
    """,
    doc="F7: JSON field access + typed aggregation "
    "(reference lambda/collect-data.py:61,107).",
)
def f7_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_testdata(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(k).cast("bigint").alias("sum_k"),
    )


@register(
    "f13_variant_json",
    oracle="""
    SELECT event_type,
           CAST(count(CASE WHEN CAST(json_extract_string(props, '$.k')
                     AS INT) > 50 THEN 1 END) AS BIGINT) AS n_high,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT) * 2)
             AS BIGINT) AS sum_2k
    FROM events GROUP BY event_type
    """,
    doc="F13 (extension): semi-structured access via Spark 4's VARIANT "
    "type — parse_json once into a variant column, then typed "
    "variant_get extraction feeding filters and arithmetic. Versus "
    "per-field get_json_object re-parses (F7), the variant encodes the "
    "document once into its binary form and each extraction is an O(log "
    "fields) offset lookup — the engine-native path for schemaless "
    "columns at scale. Oracle: DuckDB json_extract over the same props.",
)
def f13_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_testdata(spark, sf_dir, "events")
    v = events.select(
        "event_type", F.parse_json("props").alias("vp")
    )
    k = F.variant_get("vp", "$.k", "int")
    return v.groupBy("event_type").agg(
        F.count(F.when(k > 50, F.lit(1))).cast("bigint").alias("n_high"),
        F.sum(k * 2).cast("bigint").alias("sum_2k"),
    )


@register(
    "f9_split_explode",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    doc="F9: packed-list fan-out — split + explode (the zips-column "
    "pattern, reference data/greatschools_control.csv col 7 + "
    "config.json:19 per-zip API calls).",
)
def f9_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@register(
    "f10_conditional",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 200000 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS n
    FROM orders GROUP BY bucket
    """,
    doc="F10: conditional expression routing "
    "(reference lambda/collect-data.py:177-187, process-staging.py:35-44).",
)
def f10_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("high")
    )
    return orders.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count("*").alias("n")
    )


@register(
    "f11_haversine",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey % 180 AS DOUBLE) - 90.0 + 0.5 AS lat,
             CAST(c_custkey % 360 AS DOUBLE) - 180.0 + 0.5 AS lng
      FROM customer)
    SELECT c_custkey,
           round(2 * 6371.0 * asin(sqrt(
             pow(sin(radians(40.7128 - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(40.7128))
               * pow(sin(radians(-74.006 - lng) / 2), 2))), 4) AS dist_km
    FROM pts
    """,
    doc="F11: haversine distance composed from builtin trig "
    "(lat/lng grounding: reference data/greatschools_control.csv:1). "
    "Rounded to 4 decimals: JVM vs libm transcendentals can differ in the "
    "last ulp.",
)
def f11_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_testdata(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") % 180).cast("double") - 90.0 + 0.5).alias("lat"),
        ((F.col("c_custkey") % 360).cast("double") - 180.0 + 0.5).alias("lng"),
    )
    dist = haversine_km(
        F.col("lat"), F.col("lng"), F.lit(40.7128), F.lit(-74.006)
    )
    return pts.select("c_custkey", F.round(dist, 4).alias("dist_km"))


@register(
    "f12_url_parse",
    oracle=r"""
    WITH u AS (
      SELECT o_orderkey,
             'https://city-data.example/city/' || o_orderkey
               || '.html?id=' || o_orderkey || '&p='
               || replace(o_orderpriority, ' ', '_') AS url
      FROM orders)
    SELECT o_orderkey,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]id=([^&#]*)', 1) AS query_id
    FROM u
    """,
    doc="F12/F6 inverse: URL parsing with the parse_url builtin — host / "
    "path / single query parameter, the decode side of the reference's URL "
    "template interpolation (reference data/scraper_config.csv:2-3, "
    "lambda/collect-data.py:168,176). Oracle uses equivalent anchored "
    "regexes (verified byte-identical).",
)
def f12_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://city-data.example/city/"),
        F.col("o_orderkey"),
        F.lit(".html?id="),
        F.col("o_orderkey"),
        F.lit("&p="),
        F.translate("o_orderpriority", " ", "_"),
    )
    return orders.select(
        "o_orderkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("query_id"),
    )


@register(
    "f14_entity_extract",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             lower(text || ' contact ' || source || doc_id ||
                   '@example.org visit https://' || source ||
                   '.docs.example/doc/' || doc_id) AS t
      FROM documents),
    pats AS (
      SELECT * FROM (VALUES
        ('email', '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'),
        ('url',   'https?://[a-z0-9./_%-]+')) v(entity_type, pat)),
    found AS (
      SELECT a.doc_id, p.entity_type,
             regexp_extract_all(a.t, p.pat) AS es
      FROM aug a CROSS JOIN pats p)
    SELECT doc_id, entity_type,
           CAST(i - 1 AS BIGINT) AS pos, es[i] AS entity
    FROM found, UNNEST(range(1, len(es) + 1)) AS r(i)
    """,
    doc="F14 (entity extraction extension): the inverse of d4_pii_scrub — "
    "emit one row per found email/URL with its per-type position "
    "(operators/text.py:entity_extract) for linking, contact-graph "
    "building, or quarantine review. regexp_extract_all + posexplode "
    "per type, unioned: all codegen, zero exchanges (the explode fans "
    "out inside the scan partition). The synthetic corpus carries no "
    "entities, so each doc is augmented with a deterministic contact "
    "trailer derived from its own columns — identical on both sides, "
    "same convention as pii_scrub.",
)
def f14_entity_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.operators.text import entity_extract

    docs = read_testdata(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact "), F.col("source"),
            F.col("doc_id"), F.lit("@example.org visit https://"),
            F.col("source"), F.lit(".docs.example/doc/"), F.col("doc_id"),
        ).alias("text"),
    )
    return entity_extract(aug)


def _geo_interleave_sql(qlng: str, qlat: str, bits: int = 15) -> str:
    """The geohash bit-interleave as a closed-form SQL sum — longitude
    first from the MSB down, the exact twin of scalar.geo_cell_bits."""
    terms = []
    for i in range(bits):
        terms.append(
            f"(({qlng} >> {bits - 1 - i}) & 1) * {1 << (2 * bits - 1 - 2 * i)}"
        )
        terms.append(
            f"(({qlat} >> {bits - 1 - i}) & 1) * {1 << (2 * bits - 2 - 2 * i)}"
        )
    return " + ".join(terms)


def _geo_token_sql(cell: str, n_chars: int = 6) -> str:
    parts = [
        "substr('0123456789bcdefghjkmnpqrstuvwxyz', "
        f"CAST((({cell}) >> {5 * (n_chars - 1 - k)}) & 31 AS INT) + 1, 1)"
        for k in range(n_chars)
    ]
    return " || ".join(parts)


@register(
    "f15_geo_cell",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey * 2654435761) % 2147483648 % 120000 - 60000
               AS lat_md,
             (c_custkey * 40503 + 7) % 2147483648 % 360000 - 180000
               AS lng_md
      FROM customer),
    q AS (
      SELECT c_custkey,
             ((lat_md + 90000) * 32768) // 180000 AS qlat,
             ((lng_md + 180000) * 32768) // 360000 AS qlng
      FROM pts),
    g AS (
      SELECT c_custkey, qlat, qlng,
             {_geo_interleave_sql('qlng', 'qlat')} AS cell
      FROM q)
    SELECT c_custkey, CAST(qlat AS BIGINT) AS qlat,
           CAST(qlng AS BIGINT) AS qlng, CAST(cell AS BIGINT) AS cell,
           {_geo_token_sql('cell')} AS token
    FROM g
    """,
    doc="F15 (spatial extension): geohash-style cell id + base-32 token "
    "from integer millidegree coordinates "
    "(functions/scalar.py:geo_cell_bits/geo_cell_token) — the spatial "
    "bucketing primitive: equal cells co-locate nearby points for grid "
    "joins, and the id's PREFIX structure coarsens the cell by "
    "truncating low bits (what range scans and Z-order layouts "
    "exploit). Quantization is PURE INTEGER arithmetic — no doubles "
    "anywhere — so the 30-bit interleave and its 6-char token are "
    "engine-exact by construction (the oracle states all 30 bit terms "
    "in closed form). Codegen only, zero exchanges; coordinates are "
    "LCG-synthesized from c_custkey (the reference's greatschools "
    "control table carries real lat/lng columns, "
    "data/greatschools_control.csv:1).",
)
def f15_geo_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.functions.scalar import (
        geo_cell_bits,
        geo_cell_token,
    )

    cust = read_testdata(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    lat_md = (k * 2654435761) % 2147483648 % 120000 - 60000
    lng_md = (k * 40503 + 7) % 2147483648 % 360000 - 180000
    qlat, qlng, cell = geo_cell_bits(lat_md, lng_md)
    return cust.select(
        "c_custkey",
        qlat.alias("qlat"),
        qlng.alias("qlng"),
        cell.alias("cell"),
        geo_cell_token(cell).alias("token"),
    )


@register(
    "f16_number_normalize",
    oracle=r"""
    WITH cents0 AS (
      SELECT o_orderkey, o_totalprice,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS tc
      FROM orders),
    fmt AS (
      SELECT *, format('{:,}', tc // 100) || '.'
                || lpad(CAST(tc % 100 AS VARCHAR), 2, '0') AS g
      FROM cents0),
    raw AS (
      SELECT o_orderkey, o_totalprice,
             CASE CAST(o_orderkey % 5 AS INT)
               WHEN 0 THEN g
               WHEN 1 THEN '$' || g
               WHEN 2 THEN g || ' USD'
               WHEN 3 THEN '  ' || g || '  '
               ELSE 'N/A'
             END AS raw_value
      FROM fmt),
    cleaned AS (
      SELECT o_orderkey, o_totalprice, raw_value,
             regexp_replace(regexp_replace(trim(raw_value),
               '^\$|\s*USD$', '', 'g'), ',', '', 'g') AS c
      FROM raw)
    SELECT o_orderkey, raw_value,
           CASE WHEN regexp_matches(c, '^[0-9]+(\.[0-9]{2})?$')
                THEN CAST(string_split(c, '.')[1] AS BIGINT) * 100
                     + coalesce(TRY_CAST(string_split(c, '.')[2] AS BIGINT), 0)
           END AS cents,
           CASE WHEN regexp_matches(c, '^[0-9]+(\.[0-9]{2})?$')
                THEN CAST(string_split(c, '.')[1] AS BIGINT) * 100
                     + coalesce(TRY_CAST(string_split(c, '.')[2] AS BIGINT), 0)
                     = CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
           END AS parse_exact
    FROM cleaned
    """,
    doc="F16 (number normalization): formatted money/number strings -> "
    "exact integer cents (functions/scalar.py:parse_money_cents) — the "
    "cleanup the reference's scraped city pages need ('$1,234'-style "
    "populations and home values stored as raw text, "
    "lambda/collect-data.py:186). Five synthesized formats cycle by "
    "key: comma-grouped, $-prefixed, 'USD'-suffixed, "
    "whitespace-padded, and an unparseable 'N/A' that must yield NULL "
    "(quarantine routing), never a job error. Parsing is pure codegen "
    "integer arithmetic — no double round-trip, so every cent is "
    "exact, pinned by the parse_exact column being TRUE on every "
    "parseable row (both engines recompute it independently). The "
    "synthesis itself also runs on exact integer cents — grouping the "
    "integer dollars and appending the 2-digit fraction — because "
    "double->decimal FORMATTERS are an engine divergence surface "
    "(DuckDB's fmt refuses grouped floats outright, and HALF_UP vs "
    "shortest-round-trip can disagree in the last cent).",
)
def f16_number_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.functions.scalar import parse_money_cents

    orders = read_testdata(spark, sf_dir, "orders")
    tc = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    # group the integer-dollar part, append the exact 2-digit fraction:
    # BOTH engines derive the string from the identical integer cents,
    # sidestepping any double->decimal formatter rounding divergence
    grouped = F.concat(
        F.format_number((tc / 100).cast("bigint"), 0),
        F.lit("."),
        F.lpad((tc % 100).cast("string"), 2, "0"),
    )
    raw = (
        F.when(F.col("o_orderkey") % 5 == 0, grouped)
        .when(F.col("o_orderkey") % 5 == 1, F.concat(F.lit("$"), grouped))
        .when(F.col("o_orderkey") % 5 == 2, F.concat(grouped, F.lit(" USD")))
        .when(
            F.col("o_orderkey") % 5 == 3,
            F.concat(F.lit("  "), grouped, F.lit("  ")),
        )
        .otherwise(F.lit("N/A"))
    )
    base = orders.select("o_orderkey", raw.alias("raw_value"), "o_totalprice")
    cents = parse_money_cents("raw_value")
    return base.select(
        "o_orderkey",
        "raw_value",
        cents.alias("cents"),
        F.when(
            cents.isNotNull(),
            cents == F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"),
        ).alias("parse_exact"),
    )


@register(
    "f17_useragent_parse",
    oracle=r"""
    WITH ua AS (
      SELECT event_id,
             CASE CAST(event_id % 5 AS INT)
               WHEN 0 THEN 'Mozilla/5.0 (Windows NT 10.0) Chrome/'
                           || (90 + event_id % 30) || '.0.0 Safari/537.36'
               WHEN 1 THEN 'Mozilla/5.0 (Macintosh) Version/'
                           || (12 + event_id % 6) || '.1 Safari/605.1.15'
               WHEN 2 THEN 'Mozilla/5.0 (compatible; Googlebot/2.1; '
                           || '+http://www.google.com/bot.html)'
               WHEN 3 THEN 'curl/8.' || (event_id % 10)
               ELSE 'python-requests/2.' || (event_id % 32)
             END AS user_agent
      FROM events),
    cls AS (
      SELECT event_id, user_agent,
             CASE
               WHEN user_agent LIKE '%Googlebot%' THEN 'googlebot'
               WHEN user_agent LIKE 'curl/%' THEN 'curl'
               WHEN user_agent LIKE 'python-requests/%' THEN 'requests'
               WHEN user_agent LIKE '%Chrome/%' THEN 'chrome'
               WHEN user_agent LIKE '%Safari/%' THEN 'safari'
               ELSE 'unknown'
             END AS family
      FROM ua)
    SELECT event_id, user_agent, family,
           family IN ('googlebot', 'curl', 'requests') AS is_bot,
           CAST(CASE family
             WHEN 'chrome' THEN regexp_extract(user_agent,
                                               'Chrome/([0-9]+)', 1)
             WHEN 'safari' THEN regexp_extract(user_agent,
                                               'Version/([0-9]+)', 1)
             WHEN 'googlebot' THEN regexp_extract(user_agent,
                                                  'Googlebot/([0-9]+)', 1)
             WHEN 'curl' THEN regexp_extract(user_agent,
                                             'curl/([0-9]+)', 1)
             WHEN 'requests' THEN regexp_extract(
                 user_agent, 'python-requests/([0-9]+)', 1)
           END AS BIGINT) AS major_version
    FROM cls
    """,
    doc="F17 (crawl metadata): user-agent classification — family, "
    "bot-vs-browser, major version — the request-log triage every "
    "crawl pipeline runs before traffic analysis (bot filtering is "
    "the reference's own operating reality: it scrapes with a "
    "headless browser UA, lambda/collect-data.py:66-80). Five "
    "synthesized UA shapes cycle by event_id (Chrome, Safari, "
    "Googlebot, curl, python-requests); classification is pure "
    "codegen LIKE/regexp with RE2-compatible patterns (no lookahead) "
    "so both engines state identical extraction. Zero exchanges — "
    "folds into whatever scan surrounds it.",
)
def f17_useragent_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_testdata(spark, sf_dir, "events").select("event_id")
    k = F.col("event_id")
    ua = (
        F.when(
            k % 5 == 0,
            F.concat(
                F.lit("Mozilla/5.0 (Windows NT 10.0) Chrome/"),
                (90 + k % 30), F.lit(".0.0 Safari/537.36"),
            ),
        )
        .when(
            k % 5 == 1,
            F.concat(
                F.lit("Mozilla/5.0 (Macintosh) Version/"),
                (12 + k % 6), F.lit(".1 Safari/605.1.15"),
            ),
        )
        .when(
            k % 5 == 2,
            F.lit(
                "Mozilla/5.0 (compatible; Googlebot/2.1; "
                "+http://www.google.com/bot.html)"
            ),
        )
        .when(k % 5 == 3, F.concat(F.lit("curl/8."), k % 10))
        .otherwise(F.concat(F.lit("python-requests/2."), k % 32))
    )
    base = ev.select("event_id", ua.alias("user_agent"))
    u = F.col("user_agent")
    family = (
        F.when(u.contains("Googlebot"), F.lit("googlebot"))
        .when(u.startswith("curl/"), F.lit("curl"))
        .when(u.startswith("python-requests/"), F.lit("requests"))
        .when(u.contains("Chrome/"), F.lit("chrome"))
        .when(u.contains("Safari/"), F.lit("safari"))
        .otherwise(F.lit("unknown"))
    )
    pat = {
        "chrome": "Chrome/([0-9]+)",
        "safari": "Version/([0-9]+)",
        "googlebot": "Googlebot/([0-9]+)",
        "curl": "curl/([0-9]+)",
        "requests": "python-requests/([0-9]+)",
    }
    ver = F.lit(None).cast("string")
    for fam, rx in pat.items():
        ver = F.when(
            F.col("family") == fam, F.regexp_extract(u, rx, 1)
        ).otherwise(ver)
    return base.withColumn("family", family).select(
        "event_id",
        "user_agent",
        "family",
        F.col("family")
        .isin("googlebot", "curl", "requests")
        .alias("is_bot"),
        F.nullif(ver, F.lit("")).cast("bigint").alias("major_version"),
    )


@register(
    "f18_ip_cidr",
    oracle="""
    WITH u AS (
      SELECT DISTINCT user_id FROM events),
    mk AS (
      SELECT user_id,
             (user_id * 2654435761 + 7) % 4294967296 AS v
      FROM u),
    ips AS (
      SELECT user_id,
             (CASE WHEN user_id % 17 = 0 THEN '999'
                   ELSE CAST((v // 16777216) % 256 AS VARCHAR) END)
             || '.' || CAST((v // 65536) % 256 AS VARCHAR)
             || '.' || CAST((v // 256) % 256 AS VARCHAR)
             || '.' || CAST(v % 256 AS VARCHAR) AS ip
      FROM mk),
    parsed AS (
      SELECT user_id, ip,
             CASE WHEN regexp_matches(ip,
               '^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}$')
             THEN CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
                + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
                + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
                + CAST(string_split(ip, '.')[4] AS BIGINT)
             END AS ip_num
      FROM ips)
    SELECT user_id, ip, ip_num,
           coalesce(ip_num >= 167772160 AND ip_num <= 184549375, FALSE)
             AS in_private_10,
           coalesce(ip_num >= 2147483648 AND ip_num <= 4294967295, FALSE)
             AS in_upper_half,
           CASE WHEN ip_num IS NOT NULL THEN
             CAST((ip_num // 16777216) % 256 AS VARCHAR)
             || '.' || CAST((ip_num // 65536) % 256 AS VARCHAR)
             || '.' || CAST((ip_num // 256) % 256 AS VARCHAR)
             || '.0/24'
           END AS net24
    FROM parsed
    """,
    doc="F18 (IP parse + CIDR containment): dotted-quad IPv4 -> "
    "unsigned-32 BIGINT with strict validation (octet range 0-255, "
    "exactly four — malformed input yields NULL for quarantine "
    "routing, never a shared garbage key), literal-CIDR membership "
    "resolved to an integer range AT PLAN TIME (two codegen "
    "comparisons — pushable into a scan as a blocklist range), and "
    "the /24 network rollup key (functions/scalar.py:ipv4_to_long, "
    "cidr_contains, long_to_ipv4). Input is a deterministic LCG-"
    "synthesized address per user (every 17th corrupted to octet 999 "
    "to exercise the NULL path), so both engines state identical "
    "rows. Shape: one distinct + pure projections — the per-row cost "
    "profile of access-log geo/abuse enrichment at 100 TB.",
)
def f18_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from citydata_etl_spark.functions.scalar import (
        cidr_contains,
        ipv4_to_long,
        long_to_ipv4,
    )

    u = read_testdata(spark, sf_dir, "events").select("user_id").distinct()
    v = (F.col("user_id") * 2654435761 + 7) % F.lit(4294967296)
    oct0 = F.when(F.col("user_id") % 17 == 0, F.lit("999")).otherwise(
        ((v / 16777216).cast("bigint") % 256).cast("string")
    )
    ip = F.concat_ws(
        ".",
        oct0,
        ((v / 65536).cast("bigint") % 256).cast("string"),
        ((v / 256).cast("bigint") % 256).cast("string"),
        (v % 256).cast("string"),
    )
    ips = u.select("user_id", ip.alias("ip"))
    num = ipv4_to_long("ip")
    return ips.select(
        "user_id",
        "ip",
        num.alias("ip_num"),
    ).select(
        "user_id",
        "ip",
        "ip_num",
        cidr_contains("10.0.0.0/8", F.col("ip_num")).alias("in_private_10"),
        cidr_contains("128.0.0.0/1", F.col("ip_num")).alias("in_upper_half"),
        F.when(
            F.col("ip_num").isNotNull(),
            F.concat(
                long_to_ipv4(F.col("ip_num") - F.col("ip_num") % 256),
                F.lit("/24"),
            ),
        ).alias("net24"),
    )
