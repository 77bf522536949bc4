"""URL / domain blocklist filtering — the list-based curation stage.

Every production web-text cut starts with list-based removal BEFORE
any content model runs: a curated blocklist of hosts (adult, malware,
fraud, link farms — the UT1/Blacklists-style category lists) plus a
small set of URL keyword patterns. It is the cheapest filter in the
funnel — it reads only the ``url`` column — so it belongs first,
where it prunes the scan before text ever moves.

:func:`url_blocklist_filter` mirrors the funnel-friendly contract of
:func:`doppel_spark.operators.lines.gopher_quality_filter`: one row
per input doc, ``(id, keep, reason)`` with ``reason`` the first
matching rule (``'blocked_host'`` before ``'blocked_path'``, ``'ok'``
otherwise), so the per-reason histogram is the curation dashboard and
``keep = (reason = 'ok')``.

Host matching is registrable-host based (:func:`doppel_spark.functions
.urls.host_of` — lowercased, ``www.``/port stripped) and, by default,
subdomain-closed: a blocklist entry ``example.org`` blocks
``example.org`` AND every ``*.example.org``. The scalable shape for
that suffix semantics is NOT a ``LIKE '%.' || host`` theta-join (a
cross product at 10^12 rows) — each corpus host explodes into its
DNS suffix chain (``a.b.example.org`` → 4 suffixes, bounded by the
label count), which turns subdomain matching into a plain equi-join
against the (explicitly broadcast) blocklist. Blocklist entries must
themselves be registrable hosts (no ``www.``, no port, lowercase);
bare TLD entries would block entire TLDs — rejected defensively.

Scale notes (100 TB): the only columns read are ``id`` and ``url``;
the suffix explode multiplies the slim (id, suffix) projection by the
label depth (~3-5×) and the semi-join against the broadcast blocklist
collapses it back to hit ids — text is never touched, and no shuffle
of corpus rows happens at all (the hit set re-joins on id, broadcast
under AQE because block hits are a sliver of the corpus). Real-world
blocklists (UT1 adult ≈ 4M hosts ≈ 100 MB) fit Spark's broadcast
ceiling with room; :data:`MAX_BLOCKLIST_HOSTS` guards the collect-free
explicit broadcast anyway via an in-plan ``assert_true`` count gate
(a config error fails loudly instead of attempting a bigger broadcast).

Reference tie: the reference's name/path exclusion filters
(/root/reference/internal/filter/filter.go:147-204) are this same
stage for a filesystem corpus — list-driven removal before hashing;
the blocklist generalizes the directory-exclusion list to web hosts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from doppel_spark.functions.urls import host_of

#: defensive ceiling for the explicit broadcast of the blocklist side
MAX_BLOCKLIST_HOSTS = 50_000_000


def host_suffixes(host: Column) -> Column:
    """Array of DNS suffixes of ``host``, longest first.

    ``a.b.example.org`` → ``[a.b.example.org, b.example.org,
    example.org, org]`` — pure Catalyst (split / sequence / slice), no
    UDF. The full host is element 1, so exact matching is the
    degenerate read of the same array.
    """
    # let-bind the label array: an inline ``slice(labels, …)`` would
    # re-split the host once per suffix under interpreted HOF
    # evaluation (the r6 per-element re-eval fix — hosts are short, but
    # the binding costs nothing; see contamination.word_ngrams)
    return F.element_at(
        F.transform(
            F.array(F.split(host, r"\.")),
            lambda labels: F.transform(
                F.sequence(F.lit(0), F.size(labels) - 1),
                lambda i: F.array_join(
                    F.slice(labels, i + 1, F.size(labels)), "."),
            ),
        ),
        1)


def url_blocklist_filter(
    df: DataFrame,
    blocked_hosts: DataFrame,
    path_patterns: Sequence[str] = (),
    url_col: str = "url",
    id_col: str = "doc_id",
    host_col: str = "host",
    include_subdomains: bool = True,
) -> DataFrame:
    """Tag every document against a host blocklist + URL patterns.

    Returns one row per input doc: ``(id_col, keep, reason)`` where
    ``reason`` is ``'blocked_host'`` (registrable host or, with
    ``include_subdomains``, any DNS suffix of it appears in
    ``blocked_hosts[host_col]``), else ``'blocked_path'`` (lowercased
    URL matches any of ``path_patterns``, tested in order as one
    alternation), else ``'ok'``; ``keep = (reason = 'ok')``.

    ``blocked_hosts`` rows must be registrable hosts (lowercase, no
    ``www.`` prefix, no port) — single-label entries (bare TLDs) raise
    at plan execution via an in-plan assertion rather than silently
    blocking a TLD.
    """
    # in-plan bare-TLD guard: assert_true evaluates to NULL on pass and
    # fails the job on violation, so the WHEN keeps the row unchanged
    bl = (
        blocked_hosts
        .select(F.lower(F.col(host_col)).alias("_bh"))
        .distinct()
        .select(
            F.when(
                F.assert_true(
                    F.size(F.split(F.col("_bh"), r"\.")) >= F.lit(2),
                    F.concat(F.lit("blocklist entry is a bare TLD: "),
                             F.col("_bh"))).isNull(),
                F.col("_bh")).alias("_bh"))
    )
    # in-plan size ceiling on the broadcast side: a blocklist past
    # MAX_BLOCKLIST_HOSTS is a config error, not a bigger broadcast.
    # The assert must live in the projection of the USED column (_bh) —
    # an assert on a column of its own gets column-pruned away
    # (assert_true is deterministic, so Catalyst drops unused outputs)
    size_gate = bl.agg(F.count(F.lit(1)).alias("_n"))
    bl = (
        bl.join(F.broadcast(size_gate), F.lit(True))
        .select(
            F.when(
                F.assert_true(
                    F.col("_n") <= F.lit(MAX_BLOCKLIST_HOSTS),
                    F.concat(F.lit("blocklist exceeds MAX_BLOCKLIST_HOSTS: "),
                             F.col("_n").cast("string"))).isNull(),
                F.col("_bh")).alias("_bh"))
    )

    slim = df.select(F.col(id_col).alias("_id"),
                     host_of(F.col(url_col)).alias("_host"))
    if include_subdomains:
        probe = slim.select(
            "_id", F.explode(host_suffixes(F.col("_host"))).alias("_bh"))
    else:
        probe = slim.select("_id", F.col("_host").alias("_bh"))
    host_hits = (
        probe.join(F.broadcast(bl), "_bh", "left_semi")
        .select("_id").distinct()
        .withColumn("_host_hit", F.lit(True))
    )

    lurl = F.lower(F.col(url_col))
    if path_patterns:
        path_hit = lurl.rlike("|".join(f"({p})" for p in path_patterns))
    else:
        path_hit = F.lit(False)

    reason = (
        F.when(F.coalesce(F.col("_host_hit"), F.lit(False)),
               F.lit("blocked_host"))
        .when(path_hit, F.lit("blocked_path"))
        .otherwise(F.lit("ok"))
    )
    return (
        df.select(F.col(id_col), F.col(url_col))
        .join(host_hits, F.col(id_col) == F.col("_id"), "left")
        .select(
            F.col(id_col),
            (reason == "ok").alias("keep"),
            reason.alias("reason"),
        )
    )
