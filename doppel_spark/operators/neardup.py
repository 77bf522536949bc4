"""End-to-end near-duplicate clustering — the north-rule flagship.

Chain (cheap signal → expensive confirmation, the reference's funnel
generalized):

    pages → MinHash signatures (vectorized pandas UDF)
          → LSH band keys → bucket pair explosion (skew-capped)
          → signature-agreement verification (JVM-only)
          [optional] ∪ SimHash Hamming pairs (short docs / fallback)
          → connected components (hash-min label propagation)
          → clusters + skew/recall metrics

Exact duplicates (Jaccard 1.0) collide in every band, so the exact-dup
tier is a strict subset of this graph; run `exact_dup_pipeline` when
only byte-identity is wanted (it is much cheaper — no signatures).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from doppel_spark.config import NearDupConfig
from doppel_spark.functions.simhash import simhash_near_pairs, simhash_udf
from doppel_spark.operators.components import connected_components
from doppel_spark.operators.lsh import (
    band_keys,
    candidate_pairs,
    lsh_bucket_stats,
    verify_pairs,
    with_signature,
)


@dataclass
class NearDupResult:
    signatures: DataFrame   # (url, signature array<long>)
    pairs: DataFrame        # verified (url_a, url_b, jaccard_est)
    clusters: DataFrame     # (url, cluster_rep, cluster_id) — multi-doc clusters
    bucket_stats: DataFrame  # skew accounting (capped buckets, skipped pairs)

    def cluster_summary(self) -> DataFrame:
        """(cluster_id, n_docs, urls sorted) for multi-doc clusters."""
        return (
            self.clusters.groupBy("cluster_id", "cluster_rep")
            .agg(F.count("*").alias("n_docs"),
                 F.sort_array(F.collect_list("url")).alias("urls"))
            .filter(F.col("n_docs") > 1)
        )


def near_dup_pipeline(
    pages: DataFrame,
    cfg: NearDupConfig | None = None,
    id_col: str = "url",
    text_col: str = "text",
    use_simhash: bool = False,
) -> NearDupResult:
    cfg = cfg or NearDupConfig()
    sigs = with_signature(
        pages.select(F.col(id_col), F.col(text_col)), cfg, text_col=text_col
    ).select(id_col, "signature")

    cand = candidate_pairs(sigs, cfg, id_col=id_col)
    verified = verify_pairs(cand, sigs, cfg, id_col=id_col)

    edges = verified.select("url_a", "url_b")
    if use_simhash:
        sh = pages.select(F.col(id_col), simhash_udf()(F.col(text_col)).alias("simhash"))
        sh_pairs = simhash_near_pairs(sh, id_col=id_col, hamming_t=cfg.simhash_hamming,
                                      bucket_cap=cfg.bucket_cap)
        edges = edges.union(sh_pairs.select("url_a", "url_b")).distinct()

    comps = connected_components(edges)
    stats = lsh_bucket_stats(band_keys(sigs, cfg, id_col=id_col),
                             ["band_id", "band_hash"], bucket_cap=cfg.bucket_cap)
    return NearDupResult(signatures=sigs, pairs=verified,
                         clusters=comps, bucket_stats=stats)
