"""Control-table update pipeline (SURVEY.md §3.2): the update-control lambda
as one declarative pass.

    event {site, status, date_completed, <filter col values>}
    -> config lookup (J1) -> dynamic filter (P4) -> masked update (U2)
    -> CSV overwrite sink (S8)

Reference: lambda/update-control.py:7-46. The engine generalizes the
single-event point update to a BATCH of events applied in one pass
(fixing the reference's per-event whole-file rewrite + lost-update race,
SURVEY.md §2.10 bugs 5-6): single-writer per control table per batch.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from citydata_etl_spark.operators.relational import (
    dynamic_filter,
    masked_update,
    point_filter,
)


def filter_columns_for_site(config: DataFrame, site: str) -> list[str]:
    """J1/P3/F5: look up the site's config row and split its s3_directory
    column list (reference update-control.py:22-23 — the comma-separated
    list of filter column names)."""
    row = point_filter(config, "site", site).select("s3_directory").first()
    if row is None:
        raise KeyError(f"no config row for site {site!r}")
    return [c.strip() for c in row[0].split(",")]


def apply_control_update(
    control: DataFrame,
    config: DataFrame,
    event: Mapping[str, object],
) -> DataFrame:
    """Apply one update event: dynamic-filter the control table by the
    config-chosen columns, then set status/date_completed on the matched
    rows (reference update-control.py:24-30 as P4 + U2)."""
    cols = filter_columns_for_site(config, str(event["site"]))
    predicates = {c: event[c] for c in cols}
    matched = dynamic_filter(control, predicates)
    # reference semantics: update the single first match by id when an id
    # column exists (update-control.py:29 .iloc[0]); without id, update all
    # matched rows (greatschools has no id — SURVEY.md §2.10 bug 4).
    if "id" in control.columns:
        first_id = matched.orderBy("id").limit(1).select("id")
        mask = F.col("id").isin(
            [r[0] for r in first_id.collect()]
        )
    else:
        mask = F.lit(True)
        for c, v in predicates.items():
            mask = mask & (F.col(c) == F.lit(v))
    return masked_update(
        control,
        mask,
        {
            "status": F.lit(event.get("status", "completed")),
            "date_completed": F.lit(event.get("date_completed")),
        },
    )
