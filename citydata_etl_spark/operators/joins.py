"""Join operators (SURVEY.md §2.4 J1-J4 + range/as-of extensions).

Scale posture per join class:
  - config/dim lookups (J1/J3): broadcast hash — the build side is bounded
    (config tables, region/nation dims), so no shuffle at any scale.
  - large x large (J4): sort-merge with AQE; both sides shuffle on the key.
  - semi/anti (J2): 'left_semi'/'left_anti' so Spark never materializes
    right-side columns.
  - as-of: union + window "last non-null" — ONE shuffle on (key), no
    per-row lookups, no crossJoin; this is the scalable form of
    pd.merge_asof for time-series at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def broadcast_lookup(
    fact: DataFrame, dim: DataFrame, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """J1/J3 — fact x small-dim lookup as an explicit broadcast hash join
    (reference lambda/update-control.py:22-26 conceptually joins control to
    config on site)."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J2 — EXISTS: left rows with a match; right columns never surface
    (reference lambda/update-control.py:29-30's id-mask select)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J2 — NOT EXISTS: the complement side of the mask."""
    return left.join(right, on, "left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """Non-equi band join: left.val in [right.lo, right.hi).

    The band table is small (a dimension of ranges), so broadcast —
    a broadcast-nested-loop whose inner side is bounded, which is the
    right physical plan for banding at any fact-table scale.
    """
    cond = (F.col(left_col) >= F.col(lo_col)) & (F.col(left_col) < F.col(hi_col))
    return left.join(F.broadcast(right), cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join, per key, inclusive:
      - 'backward': most recent right row with right.ts <= left.ts;
      - 'forward' : earliest    right row with right.ts >= left.ts;
      - 'nearest' : whichever of the two is closer in event time
                    (exact ties prefer backward, pd.merge_asof-style).

    `tolerance` (pd.merge_asof's knob) NULLs the carry when the matched
    row sits further than `tolerance` from the left timestamp — in the
    ts column's EXACT comparison unit: microseconds for timestamps,
    days for dates, native units for numerics. A stale quote past the
    tolerance horizon is worse than no quote; the gate is a codegen
    projection on the already-computed carry, costing nothing extra.

    Implementation: tag + union both sides, then window passes over ONE
    sort per key ordered by ts — RANGE frames ([-inf, current ts] /
    [current ts, +inf]) make equal timestamps inclusive in either
    direction, and both directions share the same window ordering, so
    'nearest' still costs a single shuffle + a single sort. No range
    explosion — this scales linearly where a naive non-equi join is
    quadratic.

    Right-side ties on (key, ts) must be pre-deduplicated by the caller for
    deterministic output (as pd.merge_asof requires sorted unique keys).

    The carry is ROW-ATOMIC: the matched right row travels as one struct,
    so a right row whose attribute is genuinely NULL yields NULL — it is
    never silently backfilled from an older row (per-column ignorenulls
    carries would do exactly that; temporal_join's open-ended valid_to
    depends on this).

    The ts columns must be orderable by a RANGE frame: numeric, timestamp,
    or date (validated up front — a string ts would only fail deep in
    analysis with an opaque frame-type error). 'nearest' compares integral
    ts as exact bigint and timestamps as exact integer micros, so int64
    event times beyond 2^53 cannot lose a tie to double rounding.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction!r}")

    from pyspark.sql.types import (
        DateType,
        NumericType,
        TimestampNTZType,
        TimestampType,
    )

    _RANGE_OK = (NumericType, DateType, TimestampType, TimestampNTZType)
    for side, df_, col_ in (("left", left, left_ts), ("right", right, right_ts)):
        t = df_.schema[col_].dataType
        if not isinstance(t, _RANGE_OK):
            raise TypeError(
                f"asof_join: {side} ts column {col_!r} has type "
                f"{t.simpleString()} — RANGE-frame ordering requires a "
                "numeric, timestamp, or date type (cast string timestamps "
                "with to_timestamp first)"
            )

    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    ts_type = right.schema[right_ts].dataType
    # the matched right row travels as ONE struct (row-atomic carry —
    # see docstring); "__rowts" rides inside it for 'nearest'
    r_row_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in right_cols]
        + [StructField("__rowts", ts_type, True)]
    )
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__left"),
        F.lit(None).cast(r_row_type).alias("__rrow"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            l_tagged.schema["__left"].dataType
        ).alias("__left"),
        F.struct(
            *[F.col(c).alias(c) for c in right_cols],
            F.col(right_ts).alias("__rowts"),
        ).alias("__rrow"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w_back = (
        W.partitionBy("__k")
        .orderBy("__ts")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy("__k")
        .orderBy("__ts")
        .rangeBetween(W.currentRow, W.unboundedFollowing)
    )

    def back(c):
        return F.last(c, ignorenulls=True).over(w_back)

    def fwd(c):
        return F.first(c, ignorenulls=True).over(w_fwd)

    from pyspark.sql.types import IntegralType

    def num(c):
        # exact comparisons where exactness exists: timestamps as
        # integer micros (a double of epoch seconds has only ~0.2 us
        # resolution and could flip a nearest tie), integrals as
        # bigint (double would round past 2^53); only fractional
        # types go through double
        if isinstance(ts_type, (TimestampType, TimestampNTZType)):
            return F.unix_micros(c.cast("timestamp"))
        if isinstance(ts_type, DateType):
            return F.unix_date(c)
        if isinstance(ts_type, IntegralType):
            return c.cast("bigint")
        return c.cast("double")

    if direction == "backward":
        rv = back("__rrow")
    elif direction == "forward":
        rv = fwd("__rrow")
    else:  # nearest: carry both candidate rows, pick the closer one per
        # row (ties and missing-forward fall back to backward,
        # missing-backward falls forward)
        brow, frow = back("__rrow"), fwd("__rrow")
        bts, fts = brow["__rowts"], frow["__rowts"]
        use_back = fts.isNull() | (
            bts.isNotNull()
            & (
                (num(F.col("__ts")) - num(bts))
                <= (num(fts) - num(F.col("__ts")))
            )
        )
        rv = F.when(use_back, brow).otherwise(frow)
    if tolerance is not None:
        # micros/days/native-unit distance gate on the matched row —
        # stale matches past the horizon become no-match, not best-match
        dist = F.abs(num(F.col("__ts")) - num(rv["__rowts"]))
        rv = F.when(rv.isNotNull() & (dist <= tolerance), rv)
    carried = unioned.select("__side", "__left", rv.alias("__rv"))
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col("__left")[c].alias(c) for c in lcols],
        *[F.col("__rv")[c].alias(f"right_{c}") for c in right_cols],
    )
    return out


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the skewed (probe) side gets a random salt
    in [0, n_salts); the other (build) side is replicated n_salts times; the
    join key becomes (key, salt), splitting each hot key's rows across
    n_salts shuffle partitions instead of one straggler task.

    This is the manual fallback for skew AQE cannot fix (e.g. when the
    build side is too large to split, or a deterministic plan is required).
    Replication multiplies the build side by n_salts — use when
    |other| * n_salts << |skewed-hot-key rows|. Salt is derived from a
    per-row hash (stable within the task, no RNG state), and both salt
    columns are dropped from the output.

    Only 'inner' and 'left' are supported: replicating the build side
    n_salts times would emit each UNMATCHED right row once per salt under
    'right'/'full' semantics (matched rows are fine — they join exactly
    one salted probe partition).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join supports how='inner'|'left' only: the build side "
            f"is replicated {n_salts}x, which would duplicate unmatched "
            "right rows under right/full semantics"
        )
    salt_l = (F.abs(F.xxhash64(*skewed.columns)) % n_salts).alias("__salt")
    left = skewed.withColumn("__salt", salt_l)
    right = other.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    out = left.join(right, [on, "__salt"], how)
    return out.drop("__salt")


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_bits: int = 1 << 18,
    n_hashes: int = 5,
    exact: bool = True,
) -> DataFrame:
    """Semi-join with a BLOOM-FILTER runtime prefilter — the manual form of
    the runtime row-group filter Spark injects for shuffle joins
    (spark.sql.optimizer.runtime.bloomFilter), usable where the optimizer
    won't inject one (DataFrame-composed plans, pre-shuffle source pruning,
    feeding the filter into a DIFFERENT job than the one that built it).

    Build phase: each build key sets n_hashes bit positions
    (pmod(xxhash64(key, seed_i), n_bits)); positions aggregate into 64-bit
    words via bit_or, so the build is ONE map-side-combined aggregate whose
    shuffle volume is <= n_bits/64 rows — never proportional to build-side
    cardinality. The collected bitmap (n_bits/64 longs, e.g. 32 KiB at the
    2^18 default) is embedded as a single array literal in the probe plan:
    the probe is a zero-shuffle, zero-join codegen projection that ANDs
    n_hashes word lookups. Driver traffic is bounded by the bitmap size, by
    construction, at any build-side cardinality.

    With exact=True (default) a real left_semi join runs AFTER the bloom
    filter to kill false positives, so results are exactly the semi-join —
    the bloom's only job is to prune the probe side's shuffle (at 100 TB
    that's the difference between shuffling every probe row and shuffling
    the ~|matches| survivors). exact=False returns the raw bloom survivors
    (superset semantics) for pipelines that tolerate the documented false-
    positive rate ~(1 - e^(-k*n/m))^k.

    Scale guidance: size n_bits ~ 10x build cardinality for ~1% fpp. The
    bitmap literal ships with every task closure; keep n_bits <= ~2^24
    (2 MiB) — beyond that, prefer the word-table broadcast-join form.
    """
    if n_bits % 64 != 0 or n_bits <= 0:
        raise ValueError(f"n_bits must be a positive multiple of 64: {n_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1: {n_hashes}")
    n_words = n_bits // 64

    def positions(key_col):
        return [
            F.pmod(F.xxhash64(key_col, F.lit(i)), F.lit(n_bits))
            for i in range(n_hashes)
        ]

    def one_shifted_by(pos):
        # shiftleft with a COLUMN shift amount (the PySpark wrapper's
        # numBits parameter is a Python int only)
        return F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), pos.cast("int") % 64
        )

    bits = build.select(
        F.explode(F.array(*positions(F.col(build_key)))).alias("_pos")
    ).select(
        (F.col("_pos") / 64).cast("int").alias("_word"),
        one_shifted_by(F.col("_pos")).alias("_mask"),
    )
    # ONE aggregate: <= n_words grouped rows cross the shuffle; the collect
    # is bounded by the bitmap size regardless of build-side row count.
    agg = bits.groupBy("_word").agg(F.bit_or("_mask").alias("_bits")).collect()
    words = [0] * n_words
    for row in agg:
        words[row["_word"]] = row["_bits"]

    # ONE foldable literal: F.lit(list) would expand to a CreateArray of
    # n_words literal NODES (4096 expressions at the default size — a
    # measured ~2 s/invocation codegen+analysis tax); from_json over a
    # string literal constant-folds to a single ArrayType Literal instead.
    import json as _json

    bloom = F.from_json(F.lit(_json.dumps(words)), "array<bigint>")
    checks = [
        (
            F.element_at(bloom, (pos / 64).cast("int") + 1)
            .bitwiseAND(one_shifted_by(pos))
        )
        != 0
        for pos in positions(F.col(probe_key))
    ]
    # NULL probe keys can never match a semi-join; dropping them here is
    # lossless for exact mode and keeps the approximate mode's survivors
    # a genuine candidate set (xxhash64 of a NULL degenerates to a
    # seed-only hash that could otherwise sneak through the bloom).
    cond = F.col(probe_key).isNotNull() & checks[0]
    for c in checks[1:]:
        cond = cond & c
    pruned = probe.filter(cond)
    if not exact:
        return pruned
    return pruned.join(
        build.select(F.col(build_key).alias(probe_key)), probe_key, "left_semi"
    )


def geo_radius_join(
    probe: DataFrame,
    build: DataFrame,
    radius_km: float,
    probe_lat: str = "lat",
    probe_lng: str = "lng",
    build_lat: str = "lat",
    build_lng: str = "lng",
    cell_deg_lat: float = 1.5,
    cell_deg_lng: float = 3.0,
) -> DataFrame:
    """All (probe, build) point pairs within `radius_km` great-circle
    distance — via GRID-CELL BLOCKING, never a cross join: the 2-D analog
    of interval_overlap_pairs' binning.

    Each build point lands in ONE (lat_cell, lng_cell) grid cell; each
    probe point fans out to its 3x3 cell NEIGHBORHOOD (a 9x explode —
    constant, not data-dependent); candidates meet through one equi-join
    on the cell pair and verify with the exact haversine predicate inside
    the join. Because the build side appears in exactly one cell, every
    qualifying pair is emitted exactly once — no distinct exchange.

    LOSSLESSNESS CONTRACT (caller-checked): a pair within radius_km must
    differ by less than one cell in each dimension, i.e.
      cell_deg_lat * 111.195 >= radius_km, and
      cell_deg_lng * 111.195 * cos(max |lat|) >= radius_km.
    The defaults (1.5 deg / 3.0 deg) cover radius <= 150 km for points
    within +-60 deg latitude; outside that band, widen cell_deg_lng (at
    the poles, switch to a polar-cap scheme). Longitude cells WRAP at
    the antimeridian (probe neighborhoods are taken modulo the cell
    count), so in-radius pairs straddling lng = +-180 still meet;
    latitude needs no wrap inside the stated band. Cost: 9x probe rows
    + true pair density per cell — linear, and the cells
    shuffle-partition evenly unless the points themselves are
    pathologically clustered (then: finer cells + AQE skew handling).

    Output: every probe column, every build column, `dist_km` rounded to
    4 decimals (transcendental-output convention); the radius filter also
    applies to the ROUNDED value so engine last-ulp differences cannot
    flip boundary membership.
    """
    from citydata_etl_spark.functions.scalar import haversine_km

    overlap = set(probe.columns) & set(build.columns)
    if overlap:
        raise ValueError(
            "geo_radius_join: probe and build column names must be "
            f"disjoint (both sides surface in the output): {sorted(overlap)}"
        )

    import math

    n_lng_cells = int(math.ceil(360.0 / cell_deg_lng))

    def cells(lat, lng):
        return (
            F.floor((lat + 90.0) / cell_deg_lat).cast("int"),
            # pmod folds a point AT lng=180 into cell 0 (same wrap the
            # probe neighborhood uses), keeping the cell id in
            # [0, n_lng_cells) for any in-domain longitude
            F.pmod(
                F.floor((lng + 180.0) / cell_deg_lng).cast("int"),
                F.lit(n_lng_cells),
            ),
        )

    b_lat_cell, b_lng_cell = cells(F.col(build_lat), F.col(build_lng))
    b = build.withColumn("__clat", b_lat_cell).withColumn(
        "__clng", b_lng_cell
    )
    p_lat_cell, p_lng_cell = cells(F.col(probe_lat), F.col(probe_lng))
    p = (
        probe.withColumn(
            "__dlat", F.explode(F.sequence(F.lit(-1), F.lit(1)))
        )
        .withColumn("__dlng", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("__clat", (p_lat_cell + F.col("__dlat")).cast("int"))
        .withColumn(
            "__clng",
            F.pmod(
                p_lng_cell + F.col("__dlng"), F.lit(n_lng_cells)
            ).cast("int"),
        )
        .drop("__dlat", "__dlng")
    )
    dist = F.round(
        haversine_km(
            F.col(f"p.{probe_lat}"), F.col(f"p.{probe_lng}"),
            F.col(f"b.{build_lat}"), F.col(f"b.{build_lng}"),
        ),
        4,
    )
    joined = (
        p.alias("p")
        .join(
            b.alias("b"),
            (F.col("p.__clat") == F.col("b.__clat"))
            & (F.col("p.__clng") == F.col("b.__clng")),
        )
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= radius_km)
    )
    return joined.select(
        *[F.col(f"p.{c}") for c in probe.columns],
        *[F.col(f"b.{c}") for c in build.columns],
        "dist_km",
    )


def interval_overlap_pairs(
    intervals: DataFrame,
    id_col: str = "id",
    start_col: str = "start",
    end_col: str = "end",
    cell_size: int = 86400,
) -> DataFrame:
    """All overlapping interval PAIRS within one set — [s_a, e_a] and
    [s_b, e_b] overlap iff s_a <= e_b AND s_b <= e_a (closed ends) — via
    GRID BINNING, never a cartesian or theta-only join.

    Each interval emits one row per grid cell it touches (cell =
    value div cell_size; an interval of length L touches at most
    L/cell_size + 1 cells), candidates meet through ONE equi-join on the
    cell, and the overlap predicate verifies inside the join. Pair dedup
    costs NO distinct exchange: a pair whose overlap spans several
    shared cells is attributed to the CANONICAL cell — the cell of
    max(s_a, s_b), the overlap's left edge — and emitted only there
    (the first-agreeing-chunk trick from simhash pair mining). Cost is
    linear in intervals x cells-per-interval + true pair density per
    cell; choose cell_size ~ the typical interval length so both factors
    stay small. Start/end are LONGs (callers convert timestamps to
    epoch seconds); requires start <= end.
    """
    cells = intervals.select(
        F.col(id_col).alias("_id"),
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
        F.explode(
            F.sequence(
                (F.col(start_col) / cell_size).cast("bigint"),
                (F.col(end_col) / cell_size).cast("bigint"),
            )
        ).alias("_cell"),
    )
    a = cells.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("s_a"),
        F.col("_e").alias("e_a"), "_cell",
    )
    b = cells.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("s_b"),
        F.col("_e").alias("e_b"), "_cell",
    )
    overlap = (F.col("s_a") <= F.col("e_b")) & (F.col("s_b") <= F.col("e_a"))
    canonical = F.col("_cell") == (
        F.greatest("s_a", "s_b") / cell_size
    ).cast("bigint")
    return (
        a.join(b, "_cell")
        .filter((F.col("id_a") < F.col("id_b")) & overlap & canonical)
        .select("id_a", "id_b")
    )


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str,
    dim_cols: Sequence[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (SCD2) dimension lookup: for every fact row, the
    dimension VERSION that was valid at the fact's event time —
    `valid_from <= fact_ts < valid_to` (NULL valid_to = still current).
    The warehouse pattern behind "price as of the order date" and every
    feature-store training join (leakage-free: a fact can never see a
    dimension version from its future).

    Spark-first shape: a theta-join on the interval condition is a
    BroadcastNestedLoop/cartesian trap; because SCD2 versions are
    non-overlapping per key, the valid version is exactly the LAST one
    with valid_from <= fact_ts — a backward as-of join (asof_join: one
    shuffle on the key, one sort, window carry), followed by a codegen
    validity check that NULLs out matches falling in a coverage hole
    (fact_ts past a closed version's valid_to with no successor yet).
    Scales linearly in facts + dim versions, same as j6.

    Output: every fact column, plus each requested dimension attribute
    as `dim_<col>` (NULL where no version covers the fact).
    """
    j = asof_join(
        facts,
        dim,
        key,
        left_ts=fact_ts,
        right_ts=valid_from,
        right_cols=[*dim_cols, valid_to],
        direction="backward",
    )
    vt = F.col(f"right_{valid_to}")
    covered = vt.isNull() | (F.col(fact_ts) < vt)
    return j.select(
        *[F.col(c) for c in facts.columns],
        *[
            F.when(covered, F.col(f"right_{c}")).alias(f"dim_{c}")
            for c in dim_cols
        ],
    )


def point_in_polygon_join(
    points: DataFrame, polygons: DataFrame,
    px: str = "px", py: str = "py",
    poly_id: str = "poly_id", xs: str = "xs", ys: str = "ys",
) -> DataFrame:
    """Point-in-polygon containment join by INTEGER-EXACT ray casting —
    the spatial predicate behind geofencing with real fence shapes
    (j11's radius join is the circular special case). `polygons`
    carries (poly_id, xs ARRAY<BIGINT>, ys ARRAY<BIGINT>) vertex lists
    in any fixed integer unit (milli-degrees here); `points` carries
    integer (px, py) in the same unit. No floats exist anywhere, so
    the answer is bit-identical on any engine that states the same
    arithmetic — a double ray-caster is one ulp from flipping a
    boundary point.

    MAGNITUDE CONTRACT: the cross product
    (x2-x1)*(py-y1) - (px-x1)*(y2-y1) is evaluated in int64, so every
    coordinate must satisfy |coordinate| < 2^31 (each difference is
    then < 2^32 and each product < 2^63 — no wrap). Milli-degree
    geo coordinates (< 2*10^5) are ~four orders of magnitude inside
    the bound; units finer than ~nano-degrees are NOT safe. This
    mirrors the j11 LCG reduce-before-multiply annotation
    (queries_joins.py): int64 exactness holds only inside a stated
    operand bound.

    Physical shape: (1) the polygon table is parameter-bounded
    (fences, sales territories) — broadcast; (2) a BOUNDING-BOX
    prefilter (array_min/max per polygon) cuts the candidate set
    before any edge math; (3) the exact test is ONE aggregate fold
    over the vertex arrays per surviving (point, polygon) pair —
    crossing parity of a rightward ray, the half-open vertex rule
    ((y1 <= py) != (y2 <= py)) preventing vertex double-counts, the
    left-of-edge comparison sign-adjusted by the edge direction so no
    division (and no rational rounding) ever happens. Points exactly
    ON an edge resolve by that fixed convention — deterministically,
    both engines. At 100 TB: one broadcast, no shuffle until whatever
    aggregation consumes the matches; fan-out bounded by polygons x
    their vertex counts."""
    polys = polygons.select(
        F.col(poly_id).alias("poly_id"),
        F.col(xs).alias("xs"),
        F.col(ys).alias("ys"),
        F.array_min(xs).alias("bx0"),
        F.array_max(xs).alias("bx1"),
        F.array_min(ys).alias("by0"),
        F.array_max(ys).alias("by1"),
    )
    cand = points.join(
        F.broadcast(polys),
        (F.col(px) >= F.col("bx0")) & (F.col(px) <= F.col("bx1"))
        & (F.col(py) >= F.col("by0")) & (F.col(py) <= F.col("by1")),
    )
    n = F.size("xs")
    # fold over edge index k: vertices k and (k+1) mod n
    def edge(k):
        x1 = F.get(F.col("xs"), k)
        y1 = F.get(F.col("ys"), k)
        x2 = F.get(F.col("xs"), (k + 1) % n)
        y2 = F.get(F.col("ys"), (k + 1) % n)
        straddles = (y1 <= F.col(py)) != (y2 <= F.col(py))
        t = (x2 - x1) * (F.col(py) - y1) - (F.col(px) - x1) * (y2 - y1)
        left = (t > 0) == (y2 > y1)
        return F.when(straddles & left, F.lit(1)).otherwise(F.lit(0))

    crossings = F.aggregate(
        F.sequence(F.lit(0), n - 1),
        F.lit(0),
        lambda acc, k: acc + edge(k),
    )
    return cand.withColumn("crossings", crossings).filter(
        F.pmod(F.col("crossings"), F.lit(2)) == 1
    ).drop("xs", "ys", "bx0", "bx1", "by0", "by1", "crossings")
