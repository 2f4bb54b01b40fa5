"""Reference-shaped control/config fixtures (FIXTURES.md §B): small
synthetic tables reproducing the reference CSVs' quirks — empty-string AND
null status, dual timestamp formats, packed zips lists, per-source schema
drift, BOM'd config CSVs with comma-space column lists."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from citydata_etl_spark import schemas


def citydata_control(spark: SparkSession) -> DataFrame:
    rows = []
    for i in range(1, 101):
        if i % 20 == 0:
            status, done = "completed", (
                # dual formats: at-rest vs code-written (SURVEY.md §1.2)
                "2021-04-24 17:03:38" if i % 40 == 0 else "2021-04-24T17-03-51"
            )
        elif i % 33 == 0:
            status, done = "error", None
        elif i % 7 == 0:
            status, done = None, None  # pandas-style NaN pending
        else:
            status, done = "", None  # csv-style empty pending
        rows.append(
            (
                i,
                f"State{i % 5}",
                f"City{i}",
                status,
                done,
                f"https://www.city-data.com/city/City{i}-State{i % 5}.html",
            )
        )
    return spark.createDataFrame(rows, schemas.CITYDATA_CONTROL)


def greatschools_control(spark: SparkSession) -> DataFrame:
    rows = [
        (
            f"City{i}",
            f"S{i % 5}",
            f"State{i % 5}",
            f"County{i % 3}",
            30.0 + i * 0.1,
            -100.0 + i * 0.1,
            " ".join(f"{78700 + i * 10 + z}" for z in range(i % 4 + 1)),
            "",
            None,
        )
        for i in range(1, 31)
    ]
    return spark.createDataFrame(rows, schemas.GREATSCHOOLS_CONTROL)


def scraper_config(spark: SparkSession) -> DataFrame:
    rows = [
        ("city-data", "https://www.city-data.com/city/{}.html", "content",
         "state, city"),
        ("usa", "http://www.usa.com/{}.htm", "content", "state, city"),
    ]
    return spark.createDataFrame(rows, schemas.SCRAPER_CONFIG)


def staging_keys(spark: SparkSession) -> DataFrame:
    rows = [
        ("manual/cities.csv",),
        ("manual/schools.csv",),
        ("city-data/public/crime/initial/part-0.txt",),
        ("city-data/public/crime/cdc/part-1.txt",),
        ("usa/public/population/cdc/part-0.txt",),
    ]
    return spark.createDataFrame(rows, "key STRING")
