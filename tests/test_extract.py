"""html → text extraction: the north-rule byte-identity invariant.

The input_hint's per-row invariant is "byte-identical extracted text
per url" — extraction over the stored ``html:binary`` must reproduce
the stored ``text`` exactly. Pins: greedy capture (internal
``</body>`` in the text), multibyte UTF-8, the in-plan assert gate,
the error side-channel split, and the no-Python plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doppel_spark.corpus import synth_pages
from doppel_spark.functions.extract import (
    assert_extraction_identity,
    extract_pages,
    extraction_matches,
    split_extraction,
)
from doppel_spark.plans.inspect import assert_no_row_python


def _wrap(df):
    """The corpus html construction, in-plan (corpus.py:226-231)."""
    return df.withColumn(
        "html",
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"),
                          F.lit("</body></html>")), "UTF-8"))


def test_roundtrip_on_corpus_pages(spark):
    pages = synth_pages(spark, n_docs=200, num_partitions=4)
    out = extract_pages(pages)
    ok, bad = split_extraction(out)
    assert bad.count() == 0
    assert ok.count() == pages.filter(F.col("text").isNotNull()).count()


@pytest.mark.parametrize("text", [
    "plain ascii text",
    "internal </body> tag must not truncate the capture",
    "ends with the wrapper suffix </body></html>",
    "multibyte é¿あ and NBSP inside",
    "",
])
def test_roundtrip_traps(spark, text):
    df = _wrap(spark.createDataFrame([("u:1", text)], "url string, text string"))
    row = extract_pages(df).select("text", "extracted").first()
    assert row.extracted == row.text


def test_assert_gate_raises_on_divergence(spark):
    # html whose body does NOT match the stored text
    df = spark.createDataFrame(
        [("u:1", "expected text", b"<html><body>other</body></html>")],
        "url string, text string, html binary")
    gated = assert_extraction_identity(extract_pages(df))
    with pytest.raises(Exception, match="byte-identical.*u:1"):
        gated.collect()


def test_assert_gate_passes_clean(spark):
    df = _wrap(spark.createDataFrame([("u:1", "fine")],
                                     "url string, text string"))
    assert assert_extraction_identity(extract_pages(df)).count() == 1


def test_split_routes_mismatch_to_errors(spark):
    df = spark.createDataFrame(
        [("u:ok", "good", b"<html><body>good</body></html>"),
         ("u:bad", "good", b"<html><body>evil</body></html>"),
         ("u:nohtml", "good", b"no body tags at all")],
        "url string, text string, html binary")
    ok, bad = split_extraction(extract_pages(df))
    assert [r.url for r in ok.collect()] == ["u:ok"]
    assert sorted(r.url for r in bad.collect()) == ["u:bad", "u:nohtml"]


def test_null_html_matches_only_null_text(spark):
    df = spark.createDataFrame(
        [("u:nn", None, None), ("u:tn", "text", None)],
        "url string, text string, html binary")
    out = extract_pages(df).withColumn(
        "m", extraction_matches()).orderBy("url")
    # decode(NULL) -> NULL -> regexp_extract NULL -> eqNullSafe
    rows = {r.url: r.m for r in out.collect()}
    assert rows == {"u:nn": True, "u:tn": False}


def test_real_extractor_is_declared_stub(spark):
    df = _wrap(spark.createDataFrame([("u:1", "x")],
                                     "url string, text string"))
    with pytest.raises(NotImplementedError):
        extract_pages(df, extractor="real")
    with pytest.raises(ValueError):
        extract_pages(df, extractor="nope")


def test_extraction_plan_is_pure_catalyst(spark):
    pages = synth_pages(spark, n_docs=50, num_partitions=2)
    gated = assert_extraction_identity(extract_pages(pages))
    assert_no_row_python(gated)
