"""JSONL pages source (sources/jsonl.py): round-trip, corrupt-line and
semantic-reject side-channel, plan hygiene."""

from __future__ import annotations

import sys
from datetime import datetime, timezone
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from doppel_spark.sources.jsonl import (  # noqa: E402
    read_pages_jsonl,
    write_pages_jsonl,
)


def _pages(spark):
    ts = datetime(2021, 8, 1, 12, 0, 0, tzinfo=timezone.utc)
    rows = [(f"https://h{i}.net/p", ts, f"<b>{i}</b>".encode(),
             f"text number {i} é", "en") for i in range(6)]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string")


def test_jsonl_roundtrip_byte_exact(spark, tmp_path):
    src = _pages(spark)
    path = str(tmp_path / "dump")
    write_pages_jsonl(src, path)
    got = read_pages_jsonl(spark, path)
    assert got.error_count() == 0
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, got.pages.collect()))
    assert a == b  # html binary + multibyte text survive base64+json


def test_jsonl_corrupt_and_semantic_rejects(spark, tmp_path):
    path = tmp_path / "d"
    path.mkdir()
    lines = [
        '{"url":"u:1","warc_ts":"2021-08-01T00:00:00Z","text":"ok","lang":"en"}',
        'THIS IS NOT JSON {{{',
        '{"url":null,"text":"orphan text"}',
        '{"url":"u:2","text":null}',
        '{"url":"u:3","text":"also ok"}',
    ]
    (path / "part.jsonl").write_text("\n".join(lines))
    got = read_pages_jsonl(spark, str(path))
    assert sorted(r["url"] for r in got.pages.collect()) == ["u:1", "u:3"]
    errs = {r["error_reason"]: r["raw"] for r in got.errors.collect()}
    assert set(errs) == {"corrupt_json", "missing_url", "missing_text"}
    # the malformed line survives VERBATIM for re-parse
    assert errs["corrupt_json"] == "THIS IS NOT JSON {{{"
    # html_b64 absent -> empty binary, never a crash
    assert all(r["html"] == bytearray(b"")
               for r in got.pages.collect())


def test_jsonl_plan_is_jvm_native(spark, tmp_path):
    from doppel_spark.plans.inspect import assert_no_row_python

    src = _pages(spark)
    path = str(tmp_path / "dump2")
    write_pages_jsonl(src, path)
    pages = read_pages_jsonl(spark, path).pages
    assert_no_row_python(pages)
    plan = pages._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # JacksonParser + unbase64, all JVM
