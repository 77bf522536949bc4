"""Synthetic corpus invariants: determinism, planted structure, text identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from doppel_spark.corpus import (
    MID_FLIP_OFFSET,
    MID_LEN,
    CorpusLayout,
    planted_pairs,
    synth_pages,
)
from doppel_spark.operators.exact import exact_dup_pipeline

N = 300


def test_deterministic_across_partitionings(spark):
    a = synth_pages(spark, N, num_partitions=2).orderBy("url").collect()
    b = synth_pages(spark, N, num_partitions=7).orderBy("url").collect()
    assert [(r.url, r.text, r.lang) for r in a] == [(r.url, r.text, r.lang) for r in b]
    # byte-identical text per url, html wraps text exactly (input_hint invariant)
    for r in a[:20]:
        assert r.html == b"<html><body>" + r.text.encode() + b"</body></html>"


def test_urls_unique_and_schema(spark):
    df = synth_pages(spark, N)
    assert df.count() == N
    assert df.select("url").distinct().count() == N
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]


def test_planted_exact_groups_found(spark):
    df = synth_pages(spark, N)
    lo = CorpusLayout.plan(N)
    res = exact_dup_pipeline(df, size_col=None)
    groups = res.groups.collect()
    exact_groups = [g for g in groups if all("/exact/" in u for u in g["urls"])]
    assert len(exact_groups) == lo.n_exact_groups
    assert all(g["n_docs"] == 3 for g in exact_groups)
    # mid trios: the two identical members form a group of 2; the flipped
    # member is NOT in it (hasher_test.go:280-316 semantics)
    mid_groups = [g for g in groups if all("/mid/" in u for u in g["urls"])]
    assert len(mid_groups) == lo.n_mid_trios
    assert all(g["n_docs"] == 2 and all(u.endswith(("/0", "/1")) for u in g["urls"])
               for g in mid_groups)


def test_mid_docs_quick_collide(spark):
    from doppel_spark.functions.digests import quick_digest
    df = synth_pages(spark, N).filter(F.col("url").contains("/mid/00000000/"))
    rows = df.select("url", quick_digest("text").alias("q"),
                     F.length("text").alias("n")).collect()
    assert len(rows) == 3
    assert all(r["n"] == MID_LEN for r in rows)
    assert len({r["q"] for r in rows}) == 1  # all three share the quick digest
    texts = {r.url: r.text for r in df.select("url", "text").collect()}
    t = sorted(texts)
    assert texts[t[0]] == texts[t[1]] != texts[t[2]]
    assert texts[t[0]][:MID_FLIP_OFFSET] == texts[t[2]][:MID_FLIP_OFFSET]


def test_planted_pairs_consistent(spark):
    pp = planted_pairs(N)
    lo = CorpusLayout.plan(N)
    assert (pp["kind"] == "exact").sum() == lo.n_exact_groups * 3  # C(3,2)=3 each
    assert (pp["kind"] == "mid").sum() == lo.n_mid_trios
    assert (pp["kind"] == "near").sum() == lo.n_near_clusters * 6  # C(4,2)=6
    urls = set(synth_pages(spark, N).select("url").toPandas()["url"])
    assert set(pp["url_a"]).issubset(urls) and set(pp["url_b"]).issubset(urls)
