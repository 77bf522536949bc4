"""JSONL pages source — the other standard crawl-derived interchange.

Between raw WARC (sources/warc.py) and the columnar pages table sits
the format most text-pipeline tooling actually exchanges: one JSON
object per line (Dolma, RedPajama, CC-derived dumps all ship this
way). This source reads it with the same contracts as the parquet
source (sources/pages.py):

* **error tolerance** — Spark's PERMISSIVE json mode routes every
  malformed line into a corrupt-record column instead of failing the
  task; those lines land on the error side-channel with the raw line
  preserved (so a re-parse can recover them), mirroring the
  reference's log-and-continue scan (/root/reference/internal/scanner/
  scanner.go:38-52). A row that parses as JSON but misses url/text is
  a semantic error and routes there too.
* **schema pinned at plan time** — an explicit schema, never
  ``inferSchema`` (an inference pass reads the corpus twice and lets
  one odd line flip a column type at 100 TB).
* ``html`` travels base64 in JSON (binary has no JSON encoding);
  decoded JVM-side via ``unbase64``.

Scale notes: json-lines is splittable (newline-delimited), so a 100 TB
dump parallelizes like any text source; gzip members are NOT
splittable — per-file tasks there, exactly the WARC layout. Parsing
happens in Spark's native JacksonParser (JVM, no Python anywhere);
the format's real cost vs parquet — no column pruning, no predicate
pushdown, ~3-5× the scan bytes — is why the funnel lands everything
in a columnar pages table first and this source exists for INGEST,
not for repeated query.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: pinned wire schema: pages fields with html as base64 text, plus the
#: corrupt-record channel (must be nullable string, Spark contract)
JSONL_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html_b64", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("_corrupt", T.StringType()),
])


@dataclass
class JsonlSource:
    """Parsed pages + the error side-channel (≈ PagesSource)."""

    pages: DataFrame
    errors: DataFrame

    def error_count(self) -> int:
        """≈ Stats.ErrorCount (/root/reference/internal/model/model.go:62)."""
        return self.errors.count()


def read_pages_jsonl(
    spark: SparkSession,
    paths: list[str] | str,
) -> JsonlSource:
    """Read JSONL page dumps into the canonical pages shape.

    ``pages``: ``(url, warc_ts, html binary, text, lang)`` — only rows
    that parsed AND carry non-null url + text. ``errors``: one row per
    rejected line, ``(raw, error_reason)`` with the ORIGINAL line text
    for malformed JSON (reason ``corrupt_json``) or the reconstructed
    row for semantic rejects (``missing_url`` / ``missing_text``).
    """
    raw = (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(paths)
    )
    reason = (
        F.when(F.col("_corrupt").isNotNull(), F.lit("corrupt_json"))
        .when(F.col("url").isNull(), F.lit("missing_url"))
        .when(F.col("text").isNull(), F.lit("missing_text"))
    )
    tagged = raw.withColumn("_reason", reason)
    pages = (
        tagged.filter(F.col("_reason").isNull())
        .select("url", "warc_ts",
                F.unbase64(F.coalesce("html_b64", F.lit(""))).alias("html"),
                "text", "lang")
    )
    errors = (
        tagged.filter(F.col("_reason").isNotNull())
        .select(
            F.coalesce(
                F.col("_corrupt"),
                F.to_json(F.struct("url", "warc_ts", "html_b64",
                                   "text", "lang"))).alias("raw"),
            F.col("_reason").alias("error_reason"),
        )
    )
    return JsonlSource(pages=pages, errors=errors)


def write_pages_jsonl(pages: DataFrame, path: str,
                      mode: str = "overwrite") -> None:
    """Inverse writer (fixture/export): pages frame → JSONL with html
    as base64, the exact wire shape :func:`read_pages_jsonl` reads."""
    cols = [F.col("url"), F.col("warc_ts")]
    cols.append((F.base64("html") if "html" in pages.columns
                 else F.lit(None).cast("string")).alias("html_b64"))
    cols += [F.col("text"),
             (F.col("lang") if "lang" in pages.columns
              else F.lit(None).cast("string")).alias("lang")]
    pages.select(*cols).write.mode(mode).json(path)
