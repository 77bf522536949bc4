"""Pages-table source: schema validation, multi-segment union, error rows.

≈ the reference's scanner semantics re-keyed to tables
(/root/reference/internal/scanner/scanner.go):

* **error tolerance** (scanner.go:38-52 logs & continues, counting
  ``ErrorCount``): a malformed row (null url / null text) never fails
  the job — it is routed to an error side-channel and counted.
* **overlapping-roots dedup** (``processDirectories`` +
  ``removeSubdirectories``, scanner.go:147-209): reading several crawl
  segments that may overlap unions them and drops duplicate urls,
  keeping the earliest ``warc_ts`` (deterministic).
* **schema validation** ≈ root-dir validation (scanner.go:158-170):
  wrong column set/types fail fast at plan time, not mid-job.

Iceberg note: the north-rule target is ``spark.read.table("pages")`` on
an Iceberg catalog; the Iceberg runtime jars are not in this
environment, so the local source is parquet with the same schema. Every
operator downstream consumes a plain DataFrame — swapping the source to
``spark.read.table`` is a one-line change (see ``read_pages``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_FIELDS: dict[str, T.DataType] = {
    "url": T.StringType(),
    "warc_ts": T.TimestampType(),
    "html": T.BinaryType(),
    "text": T.StringType(),
    "lang": T.StringType(),
}


class PagesSchemaError(ValueError):
    pass


def validate_pages_schema(df: DataFrame, require_all: bool = False) -> None:
    """Fail fast on wrong column types; optionally require every column."""
    have = {f.name: f.dataType for f in df.schema.fields}
    for name, dtype in PAGES_FIELDS.items():
        if name in have and have[name] != dtype:
            raise PagesSchemaError(
                f"column {name!r} has type {have[name]}, expected {dtype}")
        if require_all and name not in have:
            raise PagesSchemaError(f"missing required column {name!r}")
    if "url" not in have or "text" not in have:
        raise PagesSchemaError("pages source needs at least url + text columns")


@dataclass
class PagesSource:
    pages: DataFrame   # clean rows
    errors: DataFrame  # rows with null url/text + an error_reason column

    def error_count(self) -> int:
        """≈ Stats.ErrorCount (/root/reference/internal/model/model.go:62)."""
        return self.errors.count()


def read_pages(
    spark: SparkSession,
    paths: list[str] | str | None = None,
    table: str | None = None,
    dedupe_overlapping: bool = True,
) -> PagesSource:
    """Read one or more page segments into (clean, errors).

    ``table`` takes priority (Iceberg/catalog path); otherwise
    ``paths`` are parquet locations unioned by name.
    """
    if table is not None:
        df = spark.read.table(table)
    else:
        if paths is None:
            raise PagesSchemaError("need paths or table")
        if isinstance(paths, str):
            paths = [paths]
        dfs = [spark.read.parquet(p) for p in paths]
        df = dfs[0]
        for d in dfs[1:]:
            df = df.unionByName(d, allowMissingColumns=False)
    validate_pages_schema(df)

    bad = F.col("url").isNull() | F.col("text").isNull()
    errors = df.filter(bad).withColumn(
        "error_reason",
        F.when(F.col("url").isNull(), F.lit("null_url")).otherwise(F.lit("null_text")),
    )
    clean = df.filter(~bad)
    if dedupe_overlapping and "warc_ts" in df.columns:
        w = Window.partitionBy("url").orderBy(F.col("warc_ts").asc_nulls_last())
        clean = (
            clean.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn")
        )
    elif dedupe_overlapping:
        clean = clean.dropDuplicates(["url"])
    return PagesSource(pages=clean, errors=errors)
