"""URL/domain blocklist filtering — list-based curation stage.

Hand-built URLs with known host/suffix/path outcomes; the bare-TLD
guard; subdomain toggle; plan shape (broadcast, no row UDFs).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from doppel_spark.operators.blocklist import (  # noqa: E402
    host_suffixes,
    url_blocklist_filter,
)


def _pages(spark):
    rows = [
        (1, "http://ok.example.com/fine"),
        (2, "https://WWW.Blog.Example.ORG:443/post/1"),
        (3, "http://example.org/x"),
        (4, "http://news.example.com/articles/17?id=1"),
        (5, "http://news.example.com/articles/12"),
        (6, "http://deep.a.b.example.org/y"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def _bl(spark):
    return spark.createDataFrame([("example.org",)], "host string")


def test_host_suffixes_chain(spark):
    from pyspark.sql import functions as F

    out = spark.range(1).select(
        host_suffixes(F.lit("a.b.example.org")).alias("s")).first()["s"]
    assert out == ["a.b.example.org", "b.example.org", "example.org", "org"]


def test_blocklist_host_path_and_ok(spark):
    out = {r["doc_id"]: r for r in url_blocklist_filter(
        _pages(spark), _bl(spark),
        path_patterns=[r"articles/[0-9]*7([/?]|$)"]).collect()}
    assert (out[1]["keep"], out[1]["reason"]) == (True, "ok")
    # www./port/case-normalized subdomain of a blocked host
    assert out[2]["reason"] == "blocked_host"
    # the blocked host itself
    assert out[3]["reason"] == "blocked_host"
    # path pattern, host clean; host rule wins precedence elsewhere
    assert out[4]["reason"] == "blocked_path"
    assert (out[5]["keep"], out[5]["reason"]) == (True, "ok")
    # deep subdomain chain still hits via the suffix explode
    assert out[6]["reason"] == "blocked_host"
    assert all((r["reason"] == "ok") == r["keep"] for r in out.values())


def test_blocklist_exact_host_mode(spark):
    out = {r["doc_id"]: r for r in url_blocklist_filter(
        _pages(spark), _bl(spark), include_subdomains=False).collect()}
    # only the exact registrable host blocks; subdomains pass
    assert out[3]["reason"] == "blocked_host"
    assert out[2]["reason"] == "ok"
    assert out[6]["reason"] == "ok"


def test_blocklist_host_beats_path_precedence(spark):
    out = {r["doc_id"]: r for r in url_blocklist_filter(
        _pages(spark), _bl(spark),
        path_patterns=[r"/post/"]).collect()}
    # doc 2 matches BOTH rules → first rule (host) names the reason
    assert out[2]["reason"] == "blocked_host"


def test_blocklist_bare_tld_guard(spark):
    bad = spark.createDataFrame([("org",)], "host string")
    with pytest.raises(Exception, match="bare TLD"):
        url_blocklist_filter(_pages(spark), bad).collect()


def test_blocklist_plan_is_broadcast_and_udf_free(spark):
    from doppel_spark.plans.inspect import assert_no_row_python

    df = url_blocklist_filter(_pages(spark), _bl(spark),
                              path_patterns=[r"/post/"])
    assert_no_row_python(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_blocklist_size_ceiling_gate_survives_pruning(spark, monkeypatch):
    """The MAX_BLOCKLIST_HOSTS ceiling is an in-plan assert folded into
    the projection of the USED column — a standalone assert column gets
    column-pruned by Catalyst (assert_true is deterministic), which is
    exactly the regression this pins."""
    import doppel_spark.operators.blocklist as B

    monkeypatch.setattr(B, "MAX_BLOCKLIST_HOSTS", 1)
    # at the ceiling: passes
    out = {r["doc_id"]: r["reason"] for r in B.url_blocklist_filter(
        _pages(spark), _bl(spark)).collect()}
    assert out[2] == "blocked_host"
    monkeypatch.setattr(B, "MAX_BLOCKLIST_HOSTS", 0)
    with pytest.raises(Exception, match="MAX_BLOCKLIST_HOSTS"):
        B.url_blocklist_filter(_pages(spark), _bl(spark)).collect()
