"""Relational core: projections, filters, point updates (SURVEY.md §2.2-2.3).

The reference's signature pattern is the keyed point-update of a control row
(whole-CSV rewrite per row, reference lambda/collect-data.py:111-135 — an
O(n^2) anti-pattern). Spark-first, updates are expressed as set-oriented
`when/otherwise` column rewrites over the whole table in ONE pass, batched
per micro-batch; at lake scale the same logic becomes a MERGE against a
transactional table format.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from citydata_etl_spark.functions.scalar import is_pending


def pending_work(df: DataFrame, id_col: str | None = "id") -> DataFrame:
    """P1 — rows still to process: empty/null status (+ non-null id when the
    source schema has one; greatschools does not — SURVEY.md §2.10 bug 4).

    Reference: reference lambda/collect-data.py:166.
    """
    cond = is_pending("status")
    if id_col is not None and id_col in df.columns:
        cond = cond & F.col(id_col).isNotNull()
    return df.filter(cond)


def project(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P2 — column projection (reference lambda/collect-data.py:168-170).
    Catalyst prunes the scan to exactly these columns."""
    return df.select(*cols)


def point_filter(df: DataFrame, col: str, value) -> DataFrame:
    """P3 — single equality predicate
    (reference lambda/update-control.py:22)."""
    return df.filter(F.col(col) == F.lit(value))


def dynamic_filter(df: DataFrame, predicates: Mapping[str, object]) -> DataFrame:
    """P4 — AND-chain of equality predicates over a runtime-chosen column
    list (reference lambda/update-control.py:23-26: filter columns come from
    the config table's `s3_directory` list, values from the event payload).

    Composing `filter` calls keeps every predicate visible to Catalyst, so
    all of them push down to the scan as one conjunction.
    """
    return reduce(
        lambda acc, kv: acc.filter(F.col(kv[0]) == F.lit(kv[1])),
        predicates.items(),
        df,
    )


def first_row(df: DataFrame, order_by: Sequence[Column | str]) -> DataFrame:
    """P6 — deterministic point lookup: the reference's `.iloc[0]`
    (reference lambda/update-control.py:29) needs an explicit order in a
    distributed engine. Spark plans orderBy+limit as TakeOrderedAndProject
    (no full sort)."""
    return df.orderBy(*order_by).limit(1)


def keyed_update(
    df: DataFrame,
    key_col: str,
    key_value,
    updates: Mapping[str, Column],
) -> DataFrame:
    """U1/U2 — set-oriented point update: rewrite matching rows' columns,
    pass everything else through unchanged.

    Reference semantics: replace the row whose id matches and stamp
    status/date_completed (reference lambda/collect-data.py:111-135,
    lambda/update-control.py:29-30) — but as ONE columnar pass, not a
    per-row file rewrite (fixes SURVEY.md §2.10 bug 5).
    """
    match = F.col(key_col) == F.lit(key_value)
    out = df
    for col_name, new_val in updates.items():
        out = out.withColumn(
            col_name, F.when(match, new_val).otherwise(F.col(col_name))
        )
    return out


def masked_update(
    df: DataFrame,
    mask: Column,
    updates: Mapping[str, Column],
) -> DataFrame:
    """U2 generalized — update all rows matching an arbitrary mask
    (the pandas `.loc[mask, cols] = vals` pattern,
    reference lambda/update-control.py:29-30)."""
    out = df
    for col_name, new_val in updates.items():
        out = out.withColumn(
            col_name, F.when(mask, new_val).otherwise(F.col(col_name))
        )
    return out


def route_status(
    df: DataFrame,
    payload_col: str = "payload",
    status_col: str = "status",
) -> DataFrame:
    """U3 — fetch-result routing: null payload -> 'error', else 'completed'
    (reference lambda/collect-data.py:177-187)."""
    return df.withColumn(
        status_col,
        F.when(F.col(payload_col).isNull(), F.lit("error")).otherwise(
            F.lit("completed")
        ),
    )


def scd2_history(
    updates: "DataFrame", key: str = "id", ts: str = "valid_from"
) -> "DataFrame":
    """Type-2 slowly-changing-dimension history from an update log: each
    (key, attribute-version, ts) row becomes a versioned interval
    [valid_from, valid_to) with valid_to = next version's start (NULL =
    current). One window over (key ORDER BY ts) — a single shuffle on the
    key, the set-oriented replacement for the reference's audit columns
    (status/date_completed overwritten in place,
    reference lambda/update-control.py:29-30 — history lost).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy(key).orderBy(ts)
    return (
        updates.withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def profile_table(df: "DataFrame", cols: list[str]) -> "DataFrame":
    """Column profiler — the data-quality audit a control-table pipeline
    runs before trusting an ingest (the reference has no quality gate at
    all; its malformed rows surface as runtime scrape failures,
    reference lambda/collect-data.py:177-187): per column, row count,
    null count, and exact distinct count, in long format
    (col_name, n_rows, n_nulls, n_distinct).

    Shape: ONE wide aggregate over the scan (null counts are plain sums;
    the k exact count-distincts make Catalyst plan an Expand — k copies of
    the input into one shuffle, the standard multi-distinct strategy),
    then a stack() unpivot of the 1-row result. At extreme cardinalities
    swap count_distinct for approx_count_distinct and the Expand
    disappears (single pass, HLL sketches merge map-side).
    """
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.isnull(F.col(c)).cast("bigint")).alias(f"__nulls_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}" for c in cols
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")


def contract_violations(
    df: "DataFrame", rules: list[tuple[str, "Column"]]
) -> "DataFrame":
    """Data-contract gate: evaluate named row-level expectations (each a
    boolean Column that is True when the row VIOLATES the rule) in ONE
    aggregate pass and return (rule, n_violations, n_rows) per rule —
    the dbt-test / Great-Expectations shape as a single codegen
    aggregate, no per-rule scans. A NULL rule result counts as a
    violation (an expectation that cannot be evaluated is not met).

    Uniqueness and other non-row-local expectations don't fit a row
    predicate — check those with a second aggregate (see
    unique_key_violations below); everything row-local (non-null,
    accepted values, ranges, regex shape) belongs here. The gate
    pattern: run before promotion, route `n_violations > 0` to
    quarantine instead of raising mid-pipeline.
    """
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, bad in rules:
        aggs.append(
            F.sum(
                F.coalesce(bad.cast("boolean"), F.lit(True)).cast("bigint")
            ).alias(f"__v_{name}")
        )
    one = df.agg(*aggs)
    pairs = ", ".join(f"'{name}', __v_{name}" for name, _ in rules)
    return one.selectExpr(
        f"stack({len(rules)}, {pairs}) AS (rule, n_violations)", "__n AS n_rows"
    )


def unique_key_violations(
    df: "DataFrame", key_cols: list[str], rule: str = "unique_key"
) -> "DataFrame":
    """The non-row-local expectation: number of rows carrying a
    duplicated key (0 when the key is unique). One groupBy on the key —
    map-side combinable; the shuffle carries one row per distinct key.
    Output matches contract_violations' schema for unionByName.
    """
    from pyspark.sql import functions as F

    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__c"))
    return per_key.agg(
        F.lit(rule).alias("rule"),
        F.coalesce(
            F.sum(F.when(F.col("__c") > 1, F.col("__c"))), F.lit(0)
        ).cast("bigint").alias("n_violations"),
        F.coalesce(F.sum("__c"), F.lit(0)).cast("bigint").alias("n_rows"),
    )


def referential_violations(
    child: "DataFrame",
    parent: "DataFrame",
    fk_col: str,
    pk_col: str,
    rule: str,
) -> "DataFrame":
    """The cross-table expectation: rows whose foreign key has no match
    in the parent table (NULL FKs are orphans too — an unresolvable
    reference is not met). One LEFT ANTI join on the key — the parent
    side reduces to its distinct key projection, so at 100 TB this is a
    key-width join, broadcast when the parent's key set is bounded
    (dimension tables) and shuffle otherwise, AQE's call. Output matches
    contract_violations' schema for unionByName.
    """
    from pyspark.sql import functions as F

    keys = (
        parent.select(F.col(pk_col).alias(fk_col))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = child.select(fk_col).join(keys, fk_col, "left")
    return joined.agg(
        F.lit(rule).alias("rule"),
        F.coalesce(
            F.sum(F.isnull("__hit").cast("bigint")), F.lit(0)
        ).cast("bigint").alias("n_violations"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )


def sniff_csv_dialect(
    lines: DataFrame, file_col: str = "file_id", line_col: str = "line",
    candidates: Sequence[tuple[str, str]] = (
        (",", ","), (";", ";"), ("|", "\\|"), ("\t", "\t"),
    ),
) -> DataFrame:
    """CSV DIALECT DETECTION over raw text lines — the sniff a real
    ingest layer runs before it dares call spark.read.csv on a feed
    whose delimiter nobody documented. Per candidate delimiter the
    per-line field count is computed (one split each, JVM codegen);
    a candidate qualifies if its MODAL field count exceeds 1, and the
    winner per file maximizes (consistency = modal-count lines /
    total lines, THEN modal field count, THEN candidate precedence).
    The second criterion is what defeats the classic European-decimal
    trap: in a semicolon file whose amounts contain ',', the comma
    splits every line perfectly consistently — into FEWER fields; a
    consistency-only sniffer picks ',' and shreds the numbers.
    Header detection: a file whose lines include a digit-free line
    has a header (data lines always carry digits in this contract —
    the positional first-line rule needs a line ordering the raw feed
    may not have).

    `candidates` carries (delimiter, regex-escaped form). Output one
    row per file: (file_id, delimiter, n_fields, consistency_bp,
    has_header) — consistency in basis points, true integer division.
    Scale shape: candidates are a constant fan-out (x4), everything
    else is groupBy/window on file_id."""
    from pyspark.sql import Window as W

    cand = F.explode(
        F.array(*[
            F.struct(F.lit(d).alias("delim"), F.lit(rx).alias("rx"))
            for d, rx in candidates
        ])
    ).alias("c")
    base = lines.select(
        F.col(file_col).alias("file_id"), F.col(line_col).alias("line")
    )
    per_line = base.select("file_id", "line", cand).select(
        "file_id",
        F.col("c.delim").alias("delim"),
        F.size(F.split(F.col("line"), F.col("c.rx"))).alias("fc"),
    )
    counts = per_line.groupBy("file_id", "delim", "fc").agg(
        F.count("*").alias("cnt")
    )
    n_lines = base.groupBy("file_id").agg(
        F.count("*").alias("n_lines")
    )
    mw = W.partitionBy("file_id", "delim").orderBy(
        F.col("cnt").desc(), F.col("fc").desc()
    )
    modal = (
        counts.filter(F.col("fc") > 1)
        .withColumn("rn", F.row_number().over(mw))
        .filter(F.col("rn") == 1)
        .join(n_lines, "file_id")
        .select(
            "file_id", "delim", F.col("fc").alias("n_fields"),
            F.expr("(cnt * 10000) div n_lines")
            .cast("bigint").alias("consistency_bp"),
        )
    )
    prec = F.array(*[F.lit(d) for d, _ in candidates])
    ww = W.partitionBy("file_id").orderBy(
        F.col("consistency_bp").desc(),
        F.col("n_fields").desc(),
        F.array_position(prec, F.col("delim")),
    )
    winner = (
        modal.withColumn("rn", F.row_number().over(ww))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    headers = base.groupBy("file_id").agg(
        F.max((~F.col("line").rlike("[0-9]")).cast("int")).alias("hh")
    ).select("file_id", (F.col("hh") == 1).alias("has_header"))
    return winner.join(headers, "file_id").select(
        "file_id", F.col("delim").alias("delimiter"),
        F.col("n_fields").cast("bigint").alias("n_fields"),
        "consistency_bp", "has_header",
    )
