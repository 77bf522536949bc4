"""Connected components over verified-pair edges — iterative DataFrame jobs.

Replaces the reference's implicit in-memory union of hash groups (each
full-digest bucket IS a component, /root/reference/internal/finder/
finder.go:114-143) with the general graph case the near-dup tier needs:
verified pairs form an arbitrary graph whose components are the dup
clusters.

Algorithm: **hash-min label propagation** — every node starts labeled
with itself; each round every node takes the min of its own label and
its neighbors' labels; converged when no label changes. Rounds are
plain shuffled joins, so the work distributes; iteration count is
bounded by the component diameter, and near-dup clusters are dense
(LSH buckets emit stars/cliques), so 2–5 rounds dominate in practice.

Scale hygiene:
* ``localCheckpoint`` every round truncates the lineage — without it
  the plan doubles per iteration and the driver dies on plan
  explosion long before data size matters.
* Convergence test is ``isEmpty()`` on the changed-label frame —
  a cheap early-exit action per round.
* Labels are the node keys themselves (min = lexicographic for string
  urls), so the final cluster representative is deterministic and the
  cluster id is ``xxhash64(representative)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ComponentsNotConverged(RuntimeError):
    """Label propagation still changing at ``max_iter`` — returning the
    partial labels would silently split true clusters (the repo's
    no-silent-caps rule forbids that)."""


def connected_components(
    edges: DataFrame,
    src: str = "url_a",
    dst: str = "url_b",
    max_iter: int = 25,
    strict: bool = True,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns (url string, cluster_rep string, cluster_id long); every
    node appearing in any edge gets a row. Deterministic: the cluster
    representative is the lexicographically smallest member.

    Convergence needs ~diameter rounds (hash-min propagation); long
    near-dup drift chains can exceed ``max_iter``. Non-convergence
    **raises** :class:`ComponentsNotConverged` by default; with
    ``strict=False`` it warns and returns the partial labels instead.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # fused round 1: label(u) = min(u, min(neighbors(u))) straight from
    # the edge list — one aggregation instead of init + propagate
    labels = (
        sym.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("label"))
        .select(F.col("u").alias("node"), "label")
        .localCheckpoint(eager=True)
    )

    def _fingerprint(lab: DataFrame) -> tuple[int, int]:
        row = lab.agg(
            F.count("*").alias("n"),
            # decimal sum: exact and overflow-free under ANSI mode
            F.sum(F.xxhash64("node", "label").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"] or 0)

    fp = _fingerprint(labels)
    converged = False
    for _ in range(max_iter):
        # propagate each node's label to its neighbors, keep the min
        prop = (
            sym.join(labels, sym.v == labels.node)
            .select(sym.u.alias("node"), "label")
        )
        labels = (
            labels.select("node", "label").union(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # labels only ever decrease, so an unchanged (count, hash-sum)
        # fingerprint ⇒ converged — one cheap agg action per round
        # instead of a join + isEmpty
        new_fp = _fingerprint(labels)
        if new_fp == fp:
            converged = True
            break
        fp = new_fp

    if not converged:
        msg = (f"connected_components: labels still changing after "
               f"{max_iter} rounds (component diameter > max_iter); "
               f"returned clusters would be silently split")
        if strict:
            raise ComponentsNotConverged(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)

    return labels.select(
        F.col("node").alias("url"),
        F.col("label").alias("cluster_rep"),
        F.xxhash64("label").alias("cluster_id"),
    )


def clusters_with_singletons(
    components: DataFrame, all_docs: DataFrame, id_col: str = "url",
) -> DataFrame:
    """Left-join components onto the full doc set: docs in no edge become
    singleton clusters of themselves (cluster_rep = own url)."""
    joined = all_docs.select(F.col(id_col).alias("url")).join(
        components, "url", "left"
    )
    return joined.select(
        "url",
        F.coalesce("cluster_rep", F.col("url")).alias("cluster_rep"),
        F.xxhash64(F.coalesce("cluster_rep", F.col("url"))).alias("cluster_id"),
    )
