"""Exact-duplicate grouping — the reference's entire core pipeline, Spark-first.

Reference dataflow (/root/reference/internal/finder/finder.go:44-146):

    scan+filter → groupBy(size) → HAVING n>1          (finder.go:47-58)
    → quick-hash candidates → groupBy(quick) → n>1    (finder.go:68-96)
    → full-hash survivors → groupBy(digest) → n>1     (finder.go:106-143)
    → DuplicateGroup list + Stats                     (finder.go:114-145)

The staged funnel is the point: the expensive digest is only computed
inside cheap-key buckets that actually collide, and unique-size docs
are **never hashed at all** (asserted by finder_test.go:119-131 —
``ProcessedFiles`` excludes them; we preserve that semantic in
``processed_docs``).

Spark realization and its scale story:

* **Stage 1 (length prune)** — ``groupBy(size).count()`` is a partial
  (map-side combined) aggregate whose output is tiny (one row per
  distinct length), then a **semi-join back**. With AQE on, that join
  goes broadcast-hash: the 100 TB side is never shuffled — each input
  partition is filtered in place. A window count over ``partitionBy
  (size)`` would instead shuffle every byte of text; we deliberately
  avoid it.
* **Stage 2 (quick digest)** — survivors get the bounded-sample
  ``xxhash64`` (≤16 KiB of text each, JVM-side) and the same
  aggregate+semi-join shape on ``quick_digest``.
* **Stage 3 (full digest)** — only rows that collided twice get
  ``sha2(text, 256)``; ``groupBy(digest)`` with ``HAVING n>1`` builds
  the groups. Group member lists can be capped (``members_cap``) so a
  pathological mega-group (e.g. 10⁸ empty pages) cannot blow an
  executor during ``collect_list``; the true count is always kept.

Group IDs: the reference assigns sequential ints in Go map-iteration
order — explicitly nondeterministic (finder.go:116-121); only
membership is contractual. We make IDs deterministic instead. The
scale-safe default derives ``group_id = xxhash64(digest)`` (pure
map-side). ``sequential_ids=True`` switches to ``row_number() over
(order by digest)`` — a single-partition global sort acceptable only
at test/oracle scale, where the DuckDB oracle can reproduce it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from doppel_spark.config import FilterConfig
from doppel_spark.functions.digests import full_digest, quick_digest


def _size_col(df: DataFrame, text_col: str, size_col: str | None) -> Column:
    """Prefer a stored length column (parquet stats → pushdown-able)."""
    if size_col and size_col in df.columns:
        return F.col(size_col)
    return F.length(F.col(text_col))


def multi_member_keys(df: DataFrame, key: str) -> DataFrame:
    """Keys with ≥2 rows — the reference's ``HAVING count > 1`` step.

    One tiny aggregate output (map-side combined); callers semi-join it
    back so the big side is never shuffled when AQE broadcasts this.
    """
    return df.groupBy(key).count().filter(F.col("count") > 1).select(key)


def length_candidates(
    df: DataFrame, text_col: str = "text", size_col: str | None = "n_chars",
    id_col: str = "url",
) -> DataFrame:
    """Stage 1: keep docs whose text length collides with ≥1 other doc.

    ≈ groupBy-size multimap + candidate selection (scanner.go:35,94 +
    finder.go:47-58). Output columns: ``id_col, text_col, size``.
    """
    base = df.select(F.col(id_col), F.col(text_col),
                     _size_col(df, text_col, size_col).alias("size"))
    hot = multi_member_keys(base, "size")
    return base.join(hot, "size", "left_semi")


def quick_candidates(candidates: DataFrame, text_col: str = "text") -> DataFrame:
    """Stage 2: quick-digest the length candidates, keep colliding digests.

    ≈ quickHash + re-selection (finder.go:68-96). Adds ``quick_digest``.
    """
    qc = candidates.withColumn("quick_digest", quick_digest(text_col))
    hot = multi_member_keys(qc, "quick_digest")
    return qc.join(hot, "quick_digest", "left_semi")


def dup_groups(
    survivors: DataFrame, text_col: str = "text", id_col: str = "url",
    members_cap: int | None = None, sequential_ids: bool = False,
) -> DataFrame:
    """Stage 3: full-digest groupBy → duplicate groups.

    ≈ fullHash + group construction (finder.go:106-143). Output schema
    mirrors ``model.DuplicateGroup``
    (/root/reference/internal/model/model.go:18-33):

        group_id long, digest string, n_docs long, size long,
        wasted_space long, urls array<string>

    ``wasted_space = size × (n_docs − 1)`` (finder.go:127-130). Member
    arrays are sorted (deterministic canonical form; the reference's
    order is channel-arrival order and non-contractual). With
    ``members_cap`` set, a ``members_truncated`` boolean column records
    every group whose ``urls`` list was sliced (no-silent-caps rule —
    same accounting discipline as ``lsh_bucket_stats``); the true
    ``n_docs`` is always kept.
    """
    hashed = survivors.withColumn("digest", full_digest(text_col))
    members = F.sort_array(F.collect_list(id_col))
    if members_cap is not None:
        members = F.slice(members, 1, members_cap)
    grouped = (
        hashed.groupBy("digest")
        .agg(
            F.count("*").alias("n_docs"),
            # min, not first: deterministic and oracle-reproducible (a
            # digest group always shares one size, but quick-digest
            # buckets upstream may not — keep the aggregate order-free)
            F.min("size").alias("size"),
            members.alias("urls"),
        )
        .filter(F.col("n_docs") > 1)
        .withColumn("wasted_space", F.col("size") * (F.col("n_docs") - F.lit(1)))
    )
    if sequential_ids:
        gid = F.row_number().over(Window.orderBy("digest")).cast("long")
    else:
        gid = F.xxhash64("digest")
    cols = [gid.alias("group_id"), "digest", "n_docs", "size",
            "wasted_space", "urls"]
    if members_cap is not None:
        cols.append((F.col("n_docs") > F.lit(members_cap))
                    .alias("members_truncated"))
    return grouped.select(*cols)


@dataclass
class ExactDupResult:
    """All stage outputs + the stats report (≈ model.DuplicateReport)."""

    kept: DataFrame        # post-filter input (id, text, size)
    candidates: DataFrame  # stage-1 survivors
    survivors: DataFrame   # stage-2 survivors (with quick_digest)
    groups: DataFrame      # stage-3 duplicate groups

    def members(self) -> DataFrame:
        """Flat (group_id, url) membership — order-insensitive compare form.

        With ``members_cap`` set on the pipeline, the per-group
        ``members_truncated`` flag rides along so a capped ``urls``
        slice is never mistaken for the full membership."""
        cols = ["group_id", "digest", "n_docs", "size", "wasted_space",
                F.explode("urls").alias("url")]
        if "members_truncated" in self.groups.columns:
            cols.append("members_truncated")
        return self.groups.select(*cols)

    def metrics(self) -> DataFrame:
        """One-row stats report ≈ ``model.Stats``
        (/root/reference/internal/model/model.go:51-78).

        ``processed_docs`` counts only docs that reached the quick-hash
        stage — unique-size docs are never digested
        (finder_test.go:119-131).
        """
        total = self.kept.agg(F.count("*").alias("total_docs"))
        cand = self.candidates.agg(F.count("*").alias("processed_docs"))
        surv = self.survivors.agg(F.count("*").alias("full_hashed_docs"))
        grp = self.groups.agg(
            F.coalesce(F.count("*"), F.lit(0)).alias("duplicate_groups"),
            F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long").alias("duplicate_docs"),
            F.coalesce(F.sum("wasted_space"), F.lit(0)).cast("long").alias("total_wasted_space"),
        )
        return total.crossJoin(cand).crossJoin(surv).crossJoin(grp)


def exact_dup_pipeline(
    pages: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    size_col: str | None = "n_chars",
    filter_config: FilterConfig | None = None,
    source_col: str | None = None,
    lang_col: str | None = None,
    members_cap: int | None = None,
    sequential_ids: bool = False,
) -> ExactDupResult:
    """The flagship query: find all exact-duplicate document groups.

    End-to-end ≈ ``doppel find`` (/root/reference/cmd/find.go:187-229):
    filter-during-scan, three-stage funnel, groups + stats. Lazy: every
    returned DataFrame is an unevaluated plan; Catalyst prunes ``html``
    and other unused columns out of the scan automatically.
    """
    kept = pages
    if filter_config is not None:
        kept = kept.filter(
            filter_config.keep_predicate(
                url_col=id_col,
                size_col=_size_col(pages, text_col, size_col),
                source_col=source_col if source_col in pages.columns else None,
                lang_col=lang_col if lang_col in pages.columns else None,
            )
        )
    kept = kept.select(F.col(id_col), F.col(text_col),
                       _size_col(kept, text_col, size_col).alias("size"))
    candidates = length_candidates(kept, text_col=text_col, size_col="size", id_col=id_col)
    survivors = quick_candidates(candidates, text_col=text_col)
    groups = dup_groups(
        survivors, text_col=text_col, id_col=id_col,
        members_cap=members_cap, sequential_ids=sequential_ids,
    )
    return ExactDupResult(kept=kept, candidates=candidates,
                          survivors=survivors, groups=groups)
