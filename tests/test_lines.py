"""Line-structure operators (C4/Gopher family) + PII redaction columns.

Hand-built corpora with answers known by construction: global
first-occurrence line dedup, intra-doc repetition fractions,
most-frequent-bigram mass, email/IPv4 scrubbing order.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from doppel_spark.functions.redact import (  # noqa: E402
    email_count,
    ipv4_count,
    redact_pii,
)
from doppel_spark.operators.lines import (  # noqa: E402
    dup_line_char_fraction_micros,
    dup_line_fraction_micros,
    line_dedup,
    line_dedup_within_doc,
    split_lines,
    top_ngram_mass,
)


def _line_corpus(spark):
    # doc 1: three lines, one blank in the middle (positions still count)
    # doc 2: repeats doc 1's "shared line" (cross-doc dup) + own line
    # doc 3: ONLY dup lines → must vanish from the dedup output
    rows = [
        (1, "alpha one\n\n  shared line  \nalpha two"),
        (2, "beta one\nshared line\nbeta one"),
        (3, "shared line\nalpha one"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_lines_positions_and_blanks(spark):
    out = {(r["doc_id"], r["line_no"]): r["line"]
           for r in split_lines(_line_corpus(spark)).collect()}
    # blank line at (1,1) dropped but position 2/3 preserved; trimmed
    assert out[(1, 0)] == "alpha one"
    assert (1, 1) not in out
    assert out[(1, 2)] == "shared line"
    assert out[(1, 3)] == "alpha two"


def test_line_dedup_keeps_first_global_occurrence(spark):
    out = {r["doc_id"]: r for r in line_dedup(_line_corpus(spark)).collect()}
    # doc 1 keeps everything (all its lines appear there first)
    assert out[1]["text_clean"] == "alpha one\nshared line\nalpha two"
    assert (out[1]["n_lines_kept"], out[1]["n_lines_dropped"]) == (3, 0)
    # doc 2 loses "shared line" (first seen in doc 1) and its own
    # intra-doc repeat of "beta one"
    assert out[2]["text_clean"] == "beta one"
    assert (out[2]["n_lines_kept"], out[2]["n_lines_dropped"]) == (1, 2)
    # doc 3 is all-duplicate → dropped entirely
    assert 3 not in out


def test_line_dedup_within_doc(spark):
    out = {r["doc_id"]: r
           for r in line_dedup_within_doc(_line_corpus(spark)).collect()}
    # within-doc: cross-document sharing is untouched — docs 1 and 3
    # both keep "shared line" / "alpha one" even though they repeat
    # across documents
    assert out[1]["text_clean"] == "alpha one\nshared line\nalpha two"
    assert (out[1]["n_lines_kept"], out[1]["n_lines_dropped"]) == (3, 0)
    # doc 2 loses only its OWN repeat of "beta one"; first occurrence
    # order is preserved
    assert out[2]["text_clean"] == "beta one\nshared line"
    assert (out[2]["n_lines_kept"], out[2]["n_lines_dropped"]) == (2, 1)
    # doc 3 has no intra-doc repeats → unchanged (trimmed)
    assert out[3]["text_clean"] == "shared line\nalpha one"
    assert (out[3]["n_lines_kept"], out[3]["n_lines_dropped"]) == (2, 0)


def test_line_dedup_within_doc_keeps_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "\n\n  \n"), (3, "x\nx\nx")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup_within_doc(df).collect()}
    # unlike the corpus-wide op, nothing is ever dropped: blank docs
    # come back with empty text_clean and zero counts
    assert set(out) == {1, 2, 3}
    assert out[1]["text_clean"] == "" and out[1]["n_lines_kept"] == 0
    assert out[2]["text_clean"] == "" and out[2]["n_lines_dropped"] == 0
    assert out[3]["text_clean"] == "x"
    assert (out[3]["n_lines_kept"], out[3]["n_lines_dropped"]) == (1, 2)


def test_dup_line_fractions(spark):
    df = spark.createDataFrame(
        [(1, "aa\nbb\naa\ncccc"), (2, "xx\nyy"), (3, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        dup_line_fraction_micros("text"),
        dup_line_char_fraction_micros("text")).collect()}
    # doc 1: 4 lines, 3 distinct → 1/4; chars 2+2+2+4=10, distinct 8 → 2/10
    assert out[1]["dup_line_frac_micros"] == 250_000
    assert out[1]["dup_char_frac_micros"] == 200_000
    assert out[2]["dup_line_frac_micros"] == 0
    assert out[2]["dup_char_frac_micros"] == 0
    assert out[3]["dup_line_frac_micros"] == 0
    assert out[3]["dup_char_frac_micros"] == 0


def test_top_ngram_mass_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "only"), (3, "x y")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in top_ngram_mass(df, n=2).collect()}
    # doc 1: "a b"×3 (len 3) mass 9; "b a"×2 mass 6 → 9; len(text)=11
    assert out[1]["top_gram_mass"] == 9
    assert out[1]["top_gram_frac_micros"] == 9 * 1_000_000 // 11
    # doc 2: < 2 tokens → mass 0, still one output row
    assert out[2]["top_gram_mass"] == 0
    assert out[3]["top_gram_mass"] == 3  # "x y" once, len 3
    assert len(out) == 3


def test_top_ngram_mass_rejects_bad_n(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    try:
        top_ngram_mass(df, n=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_redact_pii_order_and_counts(spark):
    rows = [
        (1, "mail bob.smith+x@site-a.org and 10.0.0.1 end"),
        (2, "addr a@1.2.3.4.com x"),   # dotted quad INSIDE email domain
        (3, "bare a@1.2.3.4 quad"),    # numeric TLD → NOT an email
        (4, "no pii here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", email_count("text"), ipv4_count("text"),
        redact_pii("text")).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_ips"] == 1
    assert out[1]["text_clean"] == "mail <EMAIL> and <IP> end"
    # email pass consumes the embedded quad — no double redaction
    assert out[2]["n_emails"] == 1 and out[2]["n_ips"] == 0
    assert out[2]["text_clean"] == "addr <EMAIL> x"
    # the email pattern requires an alphabetic TLD, so a dotted-quad
    # "domain" is not an email — the IP pass picks up the quad
    assert out[3]["n_emails"] == 0 and out[3]["n_ips"] == 1
    assert out[3]["text_clean"] == "bare a@<IP> quad"
    assert out[4]["text_clean"] == "no pii here"


def test_gopher_filter_rules_and_order(spark):
    from doppel_spark.operators.lines import gopher_quality_filter

    uniq = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(0, "the of and " + uniq),                  # passes everything
         (1, "tiny doc"),                            # too_short
         (2, "the of and " + " ".join(f"v{i}" for i in range(2100))),
         #                                           ^ too_long
         (3, ("the of and " + uniq                   # dup_lines fires
              + ("\nsame line" * 9))),
         (4, uniq + " " + uniq.upper()),             # low_stopword
         (5, "the of " + uniq + " . , ! ? ; : " * 30),  # high_punct
         (6, "the of and " + "rep " * 120)],         # repetitive
        "doc_id long, text string")
    got = {r.doc_id: (r.keep, r.reason)
           for r in gopher_quality_filter(
               docs, min_tokens=20, max_tokens=2000,
               max_dup_line_micros=300_000, max_dup_char_micros=300_000,
               min_stop_hits=2, max_punct_micros=200_000,
               min_distinct_micros=300_000).collect()}
    assert got[0] == (True, "ok")
    assert got[1] == (False, "too_short")
    assert got[2] == (False, "too_long")
    assert got[3] == (False, "dup_lines")
    assert got[4] == (False, "low_stopword")
    assert got[5] == (False, "high_punct")
    assert got[6] == (False, "repetitive")


def test_boilerplate_line_filter_removes_all_occurrences(spark):
    from doppel_spark.operators.lines import boilerplate_line_filter

    rows = [
        (1, "unique one\nCOOKIE BANNER\ncookie banner"),
        (2, "beta\ncookie banner  \nbeta"),
        (3, "cookie banner\ngamma"),
        (4, "cookie banner"),
        (5, "delta\ndelta\ndelta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in boilerplate_line_filter(docs, min_df=3).collect()}
    # 'cookie banner' appears (trimmed) in docs 1,2,3,4 → df=4 ≥ 3:
    # removed EVERYWHERE, including doc 1's first occurrence —
    # the semantic line_dedup deliberately does NOT have
    assert out[1]["text_clean"] == "unique one\nCOOKIE BANNER"
    # case-sensitive: 'COOKIE BANNER' is a different line (df=1), kept
    assert out[2]["text_clean"] == "beta\nbeta"
    assert (out[2]["n_lines_kept"], out[2]["n_lines_dropped"]) == (2, 1)
    assert out[3]["text_clean"] == "gamma"
    # boilerplate-only doc vanishes entirely
    assert 4 not in out
    # intra-doc repetition alone never reaches the df threshold
    assert out[5]["text_clean"] == "delta\ndelta\ndelta"


def test_boilerplate_line_filter_df_counts_docs_not_occurrences(spark):
    from doppel_spark.operators.lines import boilerplate_line_filter

    # 'x' occurs 4 times but in only 2 docs → df=2 < 3 → kept
    rows = [(1, "x\nx\nx"), (2, "x\nother")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in boilerplate_line_filter(docs, min_df=3).collect()}
    assert out[1]["text_clean"] == "x\nx\nx"
    assert out[2]["text_clean"] == "x\nother"


def test_boilerplate_line_filter_rejects_min_df_below_two(spark):
    import pytest

    from doppel_spark.operators.lines import boilerplate_line_filter

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_df"):
        boilerplate_line_filter(docs, min_df=1)


def test_paragraph_dedup_units_and_internal_newlines(spark):
    """Paragraphs are bounded by blank lines; a single newline stays
    INSIDE its paragraph (so two docs sharing a line but not a whole
    paragraph do NOT dedup); reassembly joins with one blank line."""
    from doppel_spark.operators.lines import paragraph_dedup

    shared = "shared para line one\nshared para line two"
    rows = [
        (1, f"intro one\n\n{shared}\n\noutro one"),
        # doc 2 repeats doc 1's whole two-line paragraph -> dropped here
        (2, f"intro two\n\n{shared}\n\noutro two"),
        # doc 3 shares only ONE of the two lines -> different paragraph,
        # must survive untouched
        (3, "intro three\n\nshared para line one\n\noutro three"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[1]["text_clean"] == f"intro one\n\n{shared}\n\noutro one"
    assert out[1]["n_lines_dropped"] == 0
    assert out[2]["text_clean"] == "intro two\n\noutro two"
    assert out[2]["n_lines_kept"] == 2 and out[2]["n_lines_dropped"] == 1
    assert out[3]["text_clean"] == \
        "intro three\n\nshared para line one\n\noutro three"
    assert out[3]["n_lines_dropped"] == 0


def test_paragraph_dedup_multi_blank_separators(spark):
    """3+ consecutive newlines are ONE separator (\\n{2,}), and a doc
    whose every paragraph is dropped disappears."""
    from doppel_spark.operators.lines import paragraph_dedup

    rows = [(1, "alpha\n\n\n\nbeta"), (2, "alpha\n\n\nbeta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[1]["text_clean"] == "alpha\n\nbeta"
    assert 2 not in out  # both its paragraphs lost to doc 1
