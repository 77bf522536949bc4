"""Exact-dup pipeline grouping semantics (≈ finder_test.go + scanner_test.go).

Membership asserted as SETS — the reference's group/file ordering is
map/channel-iteration order and explicitly non-contractual
(/root/reference/internal/finder/finder.go:118,203-207,263-266).
"""

from __future__ import annotations

from doppel_spark.config import FilterConfig
from doppel_spark.operators.exact import exact_dup_pipeline


def _group_sets(result):
    return {frozenset(r["urls"]) for r in result.groups.collect()}


def test_basic_grouping(spark, docs):
    # finder_test.go:86-116 — 3+2+1 docs → exactly 2 groups
    res = exact_dup_pipeline(docs, size_col=None)
    groups = _group_sets(res)
    assert groups == {
        frozenset({"u://a/1", "u://a/2", "u://a/3"}),
        frozenset({"u://b/1", "u://b/2"}),
    }


def test_stats_unique_size_never_hashed(spark, docs):
    # finder_test.go:119-131 — ProcessedFiles excludes the unique-size doc
    res = exact_dup_pipeline(docs, size_col=None)
    m = res.metrics().collect()[0]
    assert m["total_docs"] == 6
    assert m["processed_docs"] == 5  # u://c/1 never reaches the quick hash
    assert m["duplicate_groups"] == 2
    assert m["duplicate_docs"] == 5
    # wasted = len(t1)*(3-1) + len(t2)*(2-1)
    texts = {r["text"] for r in docs.collect()}
    t1 = next(t for t in texts if "one" in t)
    t2 = next(t for t in texts if "two" in t)
    assert m["total_wasted_space"] == len(t1) * 2 + len(t2) * 1


def test_no_duplicates(spark):
    # finder_test.go:133-145
    df = spark.createDataFrame(
        [("u1", "aaa"), ("u2", "bbbb"), ("u3", "ccccc")], "url string, text string")
    res = exact_dup_pipeline(df, size_col=None)
    assert res.groups.count() == 0
    m = res.metrics().collect()[0]
    assert m["processed_docs"] == 0 and m["duplicate_docs"] == 0


def test_all_duplicates_single_group(spark):
    df = spark.createDataFrame([(f"u{i}", "same text") for i in range(4)],
                               "url string, text string")
    res = exact_dup_pipeline(df, size_col=None)
    assert _group_sets(res) == {frozenset({"u0", "u1", "u2", "u3"})}


def test_single_row_and_empty(spark):
    one = spark.createDataFrame([("u1", "solo")], "url string, text string")
    assert exact_dup_pipeline(one, size_col=None).groups.count() == 0
    empty = spark.createDataFrame([], "url string, text string")
    assert exact_dup_pipeline(empty, size_col=None).groups.count() == 0


def test_same_length_different_content_not_grouped(spark):
    # scanner groups by size; same bucket but different digests → no group
    df = spark.createDataFrame(
        [("u1", "abcdefghij"), ("u2", "klmnopqrst")], "url string, text string")
    res = exact_dup_pipeline(df, size_col=None)
    assert res.candidates.count() == 2  # same length bucket
    assert res.groups.count() == 0


def test_group_ids_deterministic_and_sequential_mode(spark, docs):
    res = exact_dup_pipeline(docs, size_col=None, sequential_ids=True)
    rows = res.groups.orderBy("group_id").collect()
    assert [r["group_id"] for r in rows] == [1, 2]
    digests = [r["digest"] for r in rows]
    assert digests == sorted(digests)  # ordered by digest ⇒ reproducible
    # hash-id mode: stable across runs
    a = {r["group_id"] for r in exact_dup_pipeline(docs, size_col=None).groups.collect()}
    b = {r["group_id"] for r in exact_dup_pipeline(docs, size_col=None).groups.collect()}
    assert a == b and len(a) == 2


def test_filter_size_window_and_patterns(spark):
    # ≈ filter.go:176-204 + scanner_test.go exclusion cases
    rows = [
        ("https://x.org/a", "x" * 100, "keep"),
        ("https://x.org/b", "y" * 100, "keep"),
        ("https://x.org/tiny", "z" * 5, "below-min"),
        ("https://x.org/huge", "w" * 1000, "above-max"),
        ("https://x.org/skip.log", "k" * 100, "url-glob"),
        ("https://staging.x.org/c", "m" * 100, "source-pattern"),
    ]
    df = spark.createDataFrame([(u, t) for u, t, _ in rows], "url string, text string")
    fc = FilterConfig(
        exclude_url_globs=("*.log",),
        exclude_url_regexes=(r"^https://staging\.",),
        min_size=50, max_size=500,
    )
    res = exact_dup_pipeline(df, size_col=None, filter_config=fc)
    kept = {r["url"] for r in res.kept.collect()}
    assert kept == {"https://x.org/a", "https://x.org/b"}


def test_filter_exact_size_and_min_gt_max(spark):
    df = spark.createDataFrame(
        [("u1", "a" * 100), ("u2", "b" * 200)], "url string, text string")
    from pyspark.sql import functions as F
    exact = FilterConfig(min_size=100, max_size=100)  # keep-only-exact-size
    kept = df.filter(exact.keep_predicate(size_col=F.length("text"),
                                          source_col=None, lang_col=None))
    assert {r["url"] for r in kept.collect()} == {"u1"}
    # min>max constructed directly excludes everything (filter_test.go:358-367)
    inverted = FilterConfig(min_size=300, max_size=100)
    kept2 = df.filter(inverted.keep_predicate(size_col=F.length("text"),
                                              source_col=None, lang_col=None))
    assert kept2.count() == 0


def test_members_cap_keeps_true_count(spark):
    df = spark.createDataFrame([(f"u{i:02d}", "dup") for i in range(10)],
                               "url string, text string")
    res = exact_dup_pipeline(df, size_col=None, members_cap=3)
    g = res.groups.collect()[0]
    assert g["n_docs"] == 10 and len(g["urls"]) == 3
    assert g["urls"] == ["u00", "u01", "u02"]  # sorted then sliced


def test_charclass_glob_full_string_match(spark):
    # '[ab]x.txt' must match full-string (like filepath.Match), not any
    # suffix — 'zzzax.txt' stays, 'ax.txt' is excluded
    from doppel_spark.config import FilterConfig

    fc = FilterConfig(exclude_url_globs=("[ab]x.txt",))
    df = spark.createDataFrame(
        [("ax.txt", "t", 1), ("bx.txt", "t", 1), ("zzzax.txt", "t", 1)],
        "url string, text string, n_chars long")
    kept = {r[0] for r in df.filter(
        fc.keep_predicate(source_col=None, lang_col=None)).select("url").collect()}
    assert kept == {"zzzax.txt"}


def test_members_cap_truncation_flag(spark):
    # over-cap group carries members_truncated=True; within-cap False —
    # the no-silent-caps rule applied to member-list slicing
    rows = [(f"u{i:02d}", "dup") for i in range(10)]
    rows += [("v0", "pair"), ("v1", "pair")]
    df = spark.createDataFrame(rows, "url string, text string")
    res = exact_dup_pipeline(df, size_col=None, members_cap=3)
    by_n = {r["n_docs"]: r for r in res.groups.collect()}
    assert by_n[10]["members_truncated"] is True
    assert by_n[2]["members_truncated"] is False
    # the flag rides through the flattened members() form too
    m = res.members().filter("n_docs = 10").collect()
    assert all(r["members_truncated"] for r in m) and len(m) == 3
    # without a cap the column does not exist (schema unchanged)
    res2 = exact_dup_pipeline(df, size_col=None)
    assert "members_truncated" not in res2.groups.columns
