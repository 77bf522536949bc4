"""URL canonicalization — the web-native analogue of doppel's
"same content under different names" problem.

The reference dedups *files* whose paths differ but whose bytes match
(/root/reference/internal/scanner/finder.go:114-143). On a web corpus
the first-order version of that problem is URLs: the same page is
crawled under scheme/host case variants, ``www.`` aliases, default
ports, fragments, tracking parameters, and param orderings. Collapsing
those BEFORE content hashing removes refetch duplicates without
touching a single text byte — at 100 TB the cheapest dedup is the one
that never reads the content column.

Every rule here is a pure Catalyst expression (regexp_extract /
higher-order array ops — JVM-side, codegen'd, zero Python), and every
regex is written in the RE2-compatible subset (no backreferences, no
lookaround) so the DuckDB oracle can mirror it literally.

Canonical form produced:

* scheme and host lowercased; a leading ``www.`` stripped
* default port stripped (``:80`` for http, ``:443`` for https)
* fragment dropped
* tracking parameters dropped (``utm_*``, ``ref``, ``fbclid``,
  ``gclid``), remaining parameters **sorted** byte-wise
* trailing slashes stripped from the path

Deliberately NOT done (they need per-registry data or alter semantics):
IDN/punycode folding, %-escape normalization, path dot-segment
resolution, param-value case folding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: dropped query parameters (tracking/attribution — never content-bearing)
TRACKING_PARAM_REGEX = r"^(utm_[A-Za-z0-9_]+|ref|fbclid|gclid)="

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY = r"\?([^#]*)"


def _col(url: Column | str) -> Column:
    return F.col(url) if isinstance(url, str) else url


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL as a single Catalyst expression tree.

    ``regexp_extract`` returns ``''`` on no-match in both Spark and
    DuckDB, so absent components fold away without NULL plumbing.
    """
    u = _col(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT, 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")) \
        .when(scheme == "https", F.regexp_replace(host, ":443$", "")) \
        .otherwise(host)
    path = F.regexp_replace(F.regexp_extract(u, _PATH, 1), "/+$", "")
    params = F.filter(
        F.split(F.regexp_extract(u, _QUERY, 1), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_REGEX),
    )
    qs = F.when(F.size(params) > 0,
                F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&"))
                ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qs)


def url_dup_groups(df, url_col: str = "url", id_col: str = "doc_id"):
    """Groups of rows whose URLs canonicalize to the same page.

    Scale shape: project ``(id, canonical)`` first — the content column
    never enters the shuffle — then one groupBy on the canonical string
    with a ``HAVING n > 1`` cut, exactly the reference's group-then-
    filter funnel (finder.go:47-58) keyed on canonical URL instead of
    file size. Survivor = min id, deterministic under repartitioning.
    """
    slim = df.select(F.col(id_col),
                     canonicalize_url(url_col).alias("canonical_url"))
    return (
        slim.groupBy("canonical_url")
        .agg(F.count(F.lit(1)).alias("n_urls"), F.min(id_col).alias("rep_id"))
        .filter(F.col("n_urls") > 1)
    )


def host_of(url: Column | str) -> Column:
    """Registrable-host key: lowercased, ``www.``-stripped, port-less.

    The grouping key for domain-level curation — spam/SEO-farm cuts,
    per-site crawl quotas, robots policies. Deliberately NOT public-
    suffix-aware (that needs the PSL, a data file, not an algorithm);
    at 100 TB the host string is already the right 99% key.
    """
    u = _col(url)
    host = F.lower(F.regexp_extract(u, _HOSTPORT, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":[0-9]+$", "")


def url_signals(df, url_col: str = "url", id_col: str = "doc_id"):
    """Crawl-frontier URL quality signals — the pre-content filter tier.

    URL shape predicts page value well enough that production crawls
    filter on it BEFORE fetching (and corpus cuts before reading text):
    deep paths and digit-heavy slugs correlate with pagination /
    session-id / calendar traps, parameter count with faceted-search
    churn, index pages with hub (non-content) pages. One row per input:

    * ``url_len`` — total characters
    * ``path_depth`` — non-empty ``/`` segments of the path
    * ``n_params`` — query parameters (before any canonicalization)
    * ``path_digit_micros`` — ⌊10⁶ · digit chars / path chars⌋ (0 for
      an empty path) — integer micros, float-free cross-engine
    * ``is_index`` — path is ``''`` or ``'/'``

    Pure Catalyst over the ``url`` column alone (the same RE2-subset
    component regexes as :func:`canonicalize_url`, mirrored literally
    by the oracle); zero shuffle, composes with scan pushdown.
    """
    u = _col(url_col)
    path = F.regexp_extract(u, _PATH, 1)
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    params = F.filter(F.split(F.regexp_extract(u, _QUERY, 1), "&"),
                      lambda p: p != "")
    digits = F.length(path) - F.length(F.regexp_replace(path, "[0-9]", ""))
    return df.select(
        F.col(id_col),
        F.length(u).cast("long").alias("url_len"),
        F.size(segs).cast("long").alias("path_depth"),
        F.size(params).cast("long").alias("n_params"),
        F.when(F.length(path) == 0, F.lit(0))
        # long cast before the multiply: an int32 digit count × 1e6
        # ARITHMETIC_OVERFLOWs under ANSI for paths ≥ ~2148 digit chars
        # — precisely the digit-spam URLs this signal targets (ADVICE r5)
        .otherwise(F.floor(digits.cast("long") * F.lit(1_000_000)
                           / F.length(path)))
        .cast("long").alias("path_digit_micros"),
        ((path == "") | (path == "/")).alias("is_index"),
    )


def host_profile(df, url_col: str = "url", size_col: str | None = None,
                 id_col: str = "doc_id"):
    """Per-host corpus profile: url count, distinct canonical pages,
    refetch-duplicate count, optional total content size.

    The domain-curation workhorse (docs-per-domain caps, spam-farm
    detection by dup ratio). Scale shape: one projection to
    ``(host, canonical, size)`` — text never moves — then a single
    groupBy(host). Both ``count`` and ``sum`` combine map-side;
    ``count_distinct`` runs as Spark's standard two-level partial
    aggregate. Hosts are the classic skewed key (a handful of giant
    sites); the groupBy is safe because the per-host state is O(1)
    scalars + the distinct-page HLL-sized set — for exact distincts on
    a pathological host, pre-aggregate by (host, canonical) first,
    which :mod:`doppel_spark.operators.salting` generalizes.

    ``n_dup_urls`` = urls over distinct pages in excess, i.e.
    ``n_urls - n_pages`` — the refetch waste the URL-canonical stage
    (url_dup_groups) would reclaim, attributed per host.
    """
    slim = df.select(
        host_of(url_col).alias("host"),
        canonicalize_url(url_col).alias("canonical_url"),
        *( [F.col(size_col)] if size_col else [] ),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_urls"),
        F.count_distinct(F.col("canonical_url")).alias("n_pages"),
        (F.count(F.lit(1))
         - F.count_distinct(F.col("canonical_url"))).alias("n_dup_urls"),
    ]
    if size_col:
        aggs.append(F.sum(size_col).cast("long").alias("total_size"))
    return slim.groupBy("host").agg(*aggs)
