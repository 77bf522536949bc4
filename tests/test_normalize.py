"""Text normalization (functions/normalize.py): control-char strip
(pure Catalyst) and Unicode NFC/NFKC (Arrow-batched pandas_udf)."""

from __future__ import annotations

import sys
import unicodedata
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from doppel_spark.functions.normalize import (  # noqa: E402
    strip_control_chars,
    unicode_normalize,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("out")).collect()[0]["out"]


def test_strip_control_keeps_structure_whitespace(spark):
    s = "a\x00b\x07c\td\ne\rf\x7fg\x0b\x0c"
    assert _one(spark, s, strip_control_chars("text")) == "abc\td\ne\rfg"


def test_strip_control_identity_on_clean_text(spark):
    s = "plain text, no controls — even non-ASCII: é ✓"
    assert _one(spark, s, strip_control_chars("text")) == s


def test_nfc_composes_decomposed_sequences(spark):
    decomposed = "cafe\u0301 e\u0301tude"  # explicit combining acutes
    import unicodedata as ud
    assert not ud.is_normalized("NFC", decomposed)
    out = _one(spark, decomposed, unicode_normalize("text"))
    assert out == "caf\u00e9 \u00e9tude"
    assert len(out) == len(decomposed) - 2  # both acutes actually composed
    assert ud.is_normalized("NFC", out)


def test_nfc_identity_and_null_passthrough(spark):
    df = spark.createDataFrame([("already NFC: café",), (None,)],
                               "text string")
    got = [r["out"] for r in
           df.select(unicode_normalize("text").alias("out")).collect()]
    assert got == ["already NFC: café", None]


def test_nfkc_folds_compatibility_forms(spark):
    # ligature ﬁ → fi, fullwidth Ａ → A, ① → 1 (NFC leaves all three)
    s = "ﬁ Ａ ①"
    assert _one(spark, s, unicode_normalize("text", "NFKC")) == "fi A 1"
    assert _one(spark, s, unicode_normalize("text", "NFC")) == s


def test_bad_form_raises():
    with pytest.raises(ValueError, match="form must be one of"):
        unicode_normalize("text", "NFX")


def test_normalize_plan_is_arrow_not_row_python(spark):
    from doppel_spark.plans.inspect import assert_no_row_python

    df = spark.createDataFrame([("é",)], "text string") \
        .select(unicode_normalize("text").alias("t"),
                strip_control_chars("text").alias("s"))
    assert_no_row_python(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
