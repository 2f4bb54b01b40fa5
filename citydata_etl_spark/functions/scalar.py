"""Scalar function library (SURVEY.md §2.6 F1-F11).

All composed from pyspark.sql.functions builtins — JVM-side, inside
whole-stage codegen. No Python UDFs here: every helper returns a Column
expression, so Catalyst can fold/push them like any builtin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The reference's write-side timestamp format, `%Y-%m-%dT%H-%M-%S`
#: (reference lambda/collect-data.py:114,173,201).
TS_FORMAT_WRITE = "yyyy-MM-dd'T'HH-mm-ss"
#: The at-rest format seen in control CSVs (reference data/usa_control.csv:2).
TS_FORMAT_REST = "yyyy-MM-dd HH:mm:ss"


def utc_now_compact() -> Column:
    """F1 — current UTC timestamp in the reference's compact write format."""
    return F.date_format(F.current_timestamp(), TS_FORMAT_WRITE)


def dual_format_ts(col: Column | str) -> Column:
    """F3 — parse `date_completed` strings that appear in either format.

    Data at rest uses `yyyy-MM-dd HH:mm:ss` while code-written rows use
    `yyyy-MM-dd'T'HH-mm-ss` (SURVEY.md §1.2): try both, first hit wins.
    """
    c = F.col(col) if isinstance(col, str) else col
    # try_to_timestamp: ANSI mode (Spark 4 default) makes to_timestamp throw
    # on format mismatch; the dual-format fallback needs null-on-miss.
    return F.coalesce(
        F.try_to_timestamp(c, F.lit(TS_FORMAT_REST)),
        F.try_to_timestamp(c, F.lit(TS_FORMAT_WRITE)),
    )


def partition_cols_from_ts(col: Column | str) -> dict[str, Column]:
    """F2 — year/month/day/hour derivation for the curated layout
    (reference lambda/process-staging.py:14-18)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "year": F.year(c),
        "month": F.month(c),
        "day": F.dayofmonth(c),
        "hour": F.hour(c),
    }


def is_pending(status_col: Column | str = "status") -> Column:
    """P1 predicate — pending means empty-string OR null status.

    The reference encodes pending as '' in CSV (which pandas reads as NaN):
    both spellings must match (reference lambda/collect-data.py:166;
    SURVEY.md §2.10 bug 1).
    """
    c = F.col(status_col) if isinstance(status_col, str) else status_col
    return c.isNull() | (c == F.lit(""))


def hierarchical_key(*cols: Column | str, sep: str = "/") -> Column:
    """F6 — build a hierarchical object key from components
    (reference lambda/collect-data.py:183-186)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws(sep, *cs)


def url_from_template(template: str, *args: Column | str) -> Column:
    """F6/J3 — URL interpolation from a config template
    (reference data/scraper_config.csv:2-3, lambda/collect-data.py:176)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in args]
    return F.format_string(template.replace("{}", "%s"), *cs)


def curated_key(ts: Column | str) -> list[Column]:
    """F2+F5 — the curated partition column list for a given timestamp."""
    parts = partition_cols_from_ts(ts)
    return [parts["year"], parts["month"], parts["day"], parts["hour"]]


def zips_array(col: Column | str = "zips") -> Column:
    """F9 — unpack the space-delimited zips list
    (reference data/greatschools_control.csv col 7) into an array."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def parse_props(col: Column | str = "props", schema: str = "k INT") -> Column:
    """F7 — decode the events JSON props column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)


def haversine_km(
    lat1: Column, lng1: Column, lat2: Column, lng2: Column
) -> Column:
    """F11 — great-circle distance in km, composed from builtin trig.

    Grounded by the lat/lng columns in the greatschools control table
    (reference data/greatschools_control.csv:1); used for geo scoring.
    """
    r = 6371.0
    dlat = F.radians(lat2 - lat1)
    dlng = F.radians(lng2 - lng1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlng / 2) ** 2
    )
    return 2 * r * F.asin(F.sqrt(a))


def canonicalize_url(url: Column | str) -> Column:
    """Crawl-grade URL canonicalization, entirely in codegen — the key
    under which a crawl frontier and the URL-level dedup stage collapse
    re-fetches of the same resource:

      - drop the fragment (never sent to the server);
      - lowercase the scheme and authority, strip a leading ``www.``
        and the scheme's explicit DEFAULT port (``:443`` for https,
        ``:80`` for http; non-default ports are preserved);
      - drop ``utm_*`` tracking parameters and sort the remaining query
        parameters byte-lexicographically (param order is not
        semantic).

    A value with no recognizable ``scheme://authority`` yields NULL —
    quarantine routing — never a shared garbage key (an earlier
    https-anchored form silently collapsed every non-https URL into one
    'https://?query' bucket, which a dedup stage would then "dedup").

    Pure Column expression (regexp + array HOFs), so it folds into the
    scan projection: at 100 TB the canonical key is computed in the same
    codegen stage that reads the URL column — no shuffle, no Python.
    """
    u = F.col(url) if isinstance(url, str) else url
    nofrag = F.regexp_replace(u, "#.*$", "")
    _s = "[A-Za-z][A-Za-z0-9+.-]*"
    scheme = F.lower(F.regexp_extract(nofrag, f"^({_s})://", 1))
    auth = F.lower(F.regexp_extract(nofrag, f"^{_s}://([^/?#]+)", 1))
    auth = F.regexp_replace(auth, r"^www\.", "")
    auth = (
        F.when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .otherwise(auth)
    )
    path = F.regexp_extract(nofrag, f"^{_s}://[^/?#]+([^?#]*)", 1)
    q = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & (F.substring(p, 1, 4) != "utm_"),
        )
    )
    qjoined = F.array_join(params, "&")
    return F.when(
        (scheme != "") & (auth != ""),
        F.concat(
            scheme,
            F.lit("://"),
            auth,
            path,
            F.when(qjoined != "", F.concat(F.lit("?"), qjoined)).otherwise(
                F.lit("")
            ),
        ),
    )


#: Geohash's base-32 alphabet (no a/i/l/o).
GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geo_cell_bits(lat_md: Column, lng_md: Column, bits_per_dim: int = 15):
    """Geohash-style interleaved cell id from INTEGER millidegree
    coordinates — lat_md in [-90000, 90000), lng_md in [-180000, 180000).

    Quantization is pure integer arithmetic (no doubles anywhere, so two
    engines can state the identical value): each dimension maps to a
    2^bits_per_dim grid via (offset * 2^bits) div span, then the 2*bits
    cell id interleaves bits geohash-wise — longitude first, from the
    most significant bit down. 15 bits/dim = the 30-bit prefix behind a
    6-character geohash (~±0.0027 deg cell, ~600 m at the equator).

    This is the spatial bucketing primitive: equal cell ids co-locate
    nearby points for grid joins, and the id's PREFIX structure means
    truncating low bits coarsens the cell — the property range scans and
    Z-order layouts exploit. Codegen only: 4*bits shift/and/or ops.
    """
    span_lat, span_lng = 180_000, 360_000
    n = F.lit(1 << bits_per_dim)
    # widen BEFORE multiplying: with IntegerType millidegree inputs the
    # product reaches ~6e9, past 2^31 — silent wrap (non-ANSI) or a job
    # failure (ANSI) without the cast
    lat_md = lat_md.cast("bigint")
    lng_md = lng_md.cast("bigint")
    qlat = ((lat_md + 90_000) * n - ((lat_md + 90_000) * n) % span_lat) / span_lat
    qlng = ((lng_md + 180_000) * n - ((lng_md + 180_000) * n) % span_lng) / span_lng
    qlat = qlat.cast("bigint")
    qlng = qlng.cast("bigint")
    g = F.lit(0).cast("bigint")
    for i in range(bits_per_dim):
        g = g.bitwiseOR(
            F.shiftleft(
                F.shiftright(qlng, bits_per_dim - 1 - i).bitwiseAND(F.lit(1)),
                2 * bits_per_dim - 1 - 2 * i,
            )
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(qlat, bits_per_dim - 1 - i).bitwiseAND(F.lit(1)),
                2 * bits_per_dim - 2 - 2 * i,
            )
        )
    return qlat, qlng, g


def geo_cell_token(cell: Column, n_chars: int = 6) -> Column:
    """Base-32 token for a 5*n_chars-bit interleaved cell id — the
    geohash string form, for partition directories and human-readable
    bucketing. Character k takes bits (5*n_chars - 5k - 5 ..)."""
    chars = [
        F.substring(
            F.lit(GEOHASH_ALPHABET),
            (
                F.shiftright(cell, 5 * (n_chars - 1 - k)).bitwiseAND(F.lit(31))
                + 1
            ).cast("int"),
            1,
        )
        for k in range(n_chars)
    ]
    return F.concat(*chars)


def parse_money_cents(col: Column | str) -> Column:
    """Normalize a formatted money/number STRING to exact integer cents —
    the cleanup step for scraped numeric fields (the reference's city
    pages carry '$1,234'-style populations and home values;
    lambda/collect-data.py stores them as raw text). Handles currency
    symbols ($ prefix / 'USD' suffix), thousands separators, surrounding
    whitespace, and an optional 2-decimal fraction; anything else -> NULL
    (route to quarantine), never a parse error. Pure codegen: two
    regexps + integer arithmetic — no doubles, so '\\$1,234.56' -> 123456
    exactly (a double round-trip would be off-by-one on some cents).
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(
        F.trim(c), r"^\$|\s*USD$|,", ""
    )
    ok = cleaned.rlike(r"^[0-9]+(\.[0-9]{2})?$")
    dollars = F.split(cleaned, r"\.").getItem(0).cast("bigint")
    frac = F.coalesce(
        F.split(cleaned, r"\.").getItem(1).cast("bigint"), F.lit(0)
    )
    return F.when(ok, dollars * 100 + frac)


def ipv4_to_long(ip: Column | str) -> Column:
    """Dotted-quad IPv4 string -> unsigned-32 value as BIGINT, NULL for
    anything that is not exactly four dot-separated 0-255 integers (no
    leading '+', no empty octets — quarantine routing, never a garbage
    key). Pure codegen: one regexp gate + split + fold, no UDF."""
    c = F.col(ip) if isinstance(ip, str) else ip
    ok = c.rlike(
        r"^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
        r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}$"
    )
    parts = F.split(c, r"\.")
    val = (
        parts.getItem(0).cast("bigint") * 16777216
        + parts.getItem(1).cast("bigint") * 65536
        + parts.getItem(2).cast("bigint") * 256
        + parts.getItem(3).cast("bigint")
    )
    return F.when(ok, val)


def long_to_ipv4(v: Column | str) -> Column:
    """Inverse of ipv4_to_long: BIGINT in [0, 2^32) -> dotted quad."""
    c = F.col(v) if isinstance(v, str) else v
    return F.concat_ws(
        ".",
        ((c / 16777216).cast("bigint") % 256).cast("string"),
        ((c / 65536).cast("bigint") % 256).cast("string"),
        ((c / 256).cast("bigint") % 256).cast("string"),
        (c % 256).cast("string"),
    )


def cidr_contains(cidr: str, ip_long: Column) -> Column:
    """True when `ip_long` (BIGINT from ipv4_to_long) falls inside the
    LITERAL 'a.b.c.d/n' network. The prefix is resolved to an integer
    range AT PLAN TIME (python ints folded into the comparison), so the
    check is two codegen comparisons — the shape that lets Catalyst
    push blocklist ranges into the scan."""
    net, _, bits_s = cidr.partition("/")
    bits = int(bits_s)
    if not 0 <= bits <= 32:
        raise ValueError(f"bad CIDR prefix length in {cidr!r}")
    o = [int(x) for x in net.split(".")]
    if len(o) != 4 or any(not 0 <= x <= 255 for x in o):
        raise ValueError(f"bad CIDR network in {cidr!r}")
    base = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
    mask = ((1 << 32) - 1) ^ ((1 << (32 - bits)) - 1)
    lo = base & mask
    hi = lo + (1 << (32 - bits)) - 1
    return ip_long.isNotNull() & (ip_long >= lo) & (ip_long <= hi)
