"""End-to-end near-duplicate clustering — the north-rule flagship.

Chain (cheap signal → expensive confirmation, the reference's funnel
generalized):

    pages → exact-dedup pre-pass (sha256 digest, keep min-id rep)
          → MinHash signatures over REPRESENTATIVES ONLY
          → LSH band keys → bucket pair explosion (skew-capped)
          → signature-agreement verification (JVM-only)
          [optional] ∪ SimHash Hamming pairs (short docs / fallback)
          ∪ exact-group (rep → member) edges
          → connected components (hash-min label propagation)
          → clusters + skew/recall metrics

The exact-dedup pre-pass is the web-scale move: real crawls are
30–60 % byte-identical, and an exact duplicate would otherwise collide
in *every* LSH band (maximal pair-explosion pressure) only to be
confirmed by the far cheaper digest equality. Signatures are computed
once per distinct text; duplicate docs rejoin the graph as
(representative → member) edges with Jaccard 1.0, so cluster
assignments are identical to the naive pipeline.
"""

from __future__ import annotations

import atexit
import time
import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from doppel_spark.config import NearDupConfig
from doppel_spark.functions.digests import full_digest
from doppel_spark.functions.simhash import simhash_near_pairs, simhash_udf
from doppel_spark.operators.components import connected_components
from doppel_spark.operators.lsh import (
    band_keys,
    bucket_membership,
    lsh_bucket_stats,
    pairs_from_membership,
    verify_pairs,
    with_signature,
)


@dataclass
class NearDupResult:
    signatures: DataFrame   # (url, signature array<int>)
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

    def unpersist(self) -> None:
        # materialized stages live in scratch parquet tables (see
        # ``_materialize``), reclaimed at process exit; kept for API
        # compatibility with cache-backed callers
        self.signatures.unpersist()
        self.pairs.unpersist()


def _materialize(df: DataFrame, name: str) -> DataFrame:
    """Materialize an intermediate consumed by several downstream branches
    by spilling it to an uncompressed scratch parquet table and reading
    it back.

    Why a table and not ``persist()``/``localCheckpoint()`` — measured
    on a 300k-doc corpus at local[8]:

    * ``persist(MEMORY_AND_DISK)`` encodes into columnar cache batches;
      that encoder is memory-bandwidth-hungry on wide array columns
      (+22 s over raw compute for the signature stage) and *anti-scales*
      with executor threads — it was cheaper at local[2] than local[8].
    * ``localCheckpoint`` stores cheap raw rows (+5 s) BUT the resulting
      ``LogicalRDD`` carries no size statistics, so the planner loses
      every downstream auto-broadcast (the rep-id semi-join fell back to
      a full-corpus sort-merge shuffle: 60 s → 157 s end to end).
    * A scratch parquet table costs ~+10 s to write, and each consumer
      re-reads it with accurate file statistics (broadcasts preserved),
      column pruning (the slim rid→url consumer never touches the
      1 KB signature column), and truncated lineage. Compression is
      off: the data is transient and local, and codec CPU is exactly
      the contended resource this path exists to avoid.

    This is also the single-session mirror of the durable-table runner
    (:mod:`doppel_spark.checkpoint`) used on a real cluster — the stage
    cut points are identical; only table lifetime differs. Scratch
    tables live under a per-session temp dir reclaimed at process exit.
    """
    spark = df.sparkSession
    root = getattr(spark, "_doppel_spill_dir", None)
    if root is None:
        root = tempfile.mkdtemp(prefix="doppel_spill_")
        spark._doppel_spill_dir = root
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    path = os.path.join(root, f"{name}_{uuid.uuid4().hex[:8]}")
    t0 = time.time()
    df.write.option("compression", "none").parquet(path)
    if os.environ.get("DOPPEL_STAGE_TIMING"):
        print(f"STAGE {name} write_s={time.time() - t0:.2f}", flush=True)
    return spark.read.parquet(path)


def near_dup_pipeline(
    pages: DataFrame,
    cfg: NearDupConfig | None = None,
    id_col: str = "url",
    text_col: str = "text",
    use_simhash: bool = False,
) -> NearDupResult:
    cfg = cfg or NearDupConfig()
    base = pages.select(F.col(id_col), F.col(text_col))

    # exact-dedup pre-pass: one representative (min id) per distinct text.
    # The digest groupBy ships only (id, digest) — the text never
    # shuffles; representatives are fetched back with a semi-join whose
    # build side (the rep-id list) AQE broadcasts.
    # (id, digest) is consumed by three branches (rep_ids groupBy, the
    # exact-edge join, and — via the semi-join — the representatives
    # scan), two of which run as concurrent broadcast jobs: without a
    # materialization each re-scans the corpus and re-hashes every text.
    # The projection is ~40 B/row; at cluster scale the checkpointed
    # runner materializes this stage as a table instead (same idea).
    digests = _materialize(base.select(F.col(id_col), full_digest(text_col)),
                           "digests")
    rep_ids = digests.groupBy("digest").agg(F.min(id_col).alias(id_col))
    exact_edges = (
        digests.join(rep_ids.withColumnRenamed(id_col, "rep"), "digest")
        .filter(F.col(id_col) != F.col("rep"))
        .select(F.col("rep").alias("url_a"), F.col(id_col).alias("url_b"))
    )
    reps = base.join(rep_ids.select(id_col), id_col, "left_semi")

    # Materialize signatures: they feed band-key explosion AND both
    # sides of the verification join — otherwise the (expensive) MinHash
    # UDF re-runs 3×. At cluster scale this becomes a stage checkpoint
    # table (see doppel_spark.checkpoint); the semantics are the same:
    # compute the signal once, reuse it.
    #
    # The LSH path runs on 64-bit surrogate ids (`rid = xxhash64(url)`):
    # the band explosion multiplies row count ×bands, so shuffling a
    # ~45-byte url string there dominates the wire cost — 16-byte
    # (rid, band_hash) rows cut it ~3×. A rid collision only creates a
    # spurious candidate pair that signature verification discards
    # (expected spurious pairs ≈ n²/2⁶⁴ — a handful even at 10¹² docs);
    # true-pair loss requires both members to collide, ~2⁻⁶⁴ per pair.
    sigs = _materialize(
        with_signature(reps, cfg, text_col=text_col)
        .select(id_col, F.xxhash64(id_col).alias("rid"),
                "signature", "band_hashes"), "sigs")

    # Bucket membership is cut as its own scratch table: it has three
    # consumers inside pair generation (combo self-join ×2 + star
    # projection), and materializing only the colliding rows keeps the
    # table ~10× smaller than the exploded band keys.
    memb = _materialize(
        bucket_membership(
            band_keys(sigs.select(F.col("rid"), "band_hashes"), cfg, id_col="rid"),
            ["band_hash"], id_col="rid"), "memb")
    # Materialize the candidate stage too: verification evaluates it
    # three times (two participant-list branches + the pair join) and
    # the CC edge union twice more — recomputing the pair join per
    # evaluation multiplies the most expensive shuffle in the job.
    # (The checkpointed runner materializes this stage as a table for
    # the same reason.)
    cand_rid = _materialize(
        pairs_from_membership(memb, ["band_hash"], id_col="rid",
                              bucket_cap=cfg.bucket_cap), "cand")
    verified_rid = verify_pairs(cand_rid, sigs.select("rid", "signature"),
                                cfg, id_col="rid")
    # map rids back to urls (pairs are small; AQE broadcasts them)
    rid_url = sigs.select("rid", F.col(id_col))
    verified = (
        verified_rid
        .join(rid_url.select(F.col("rid").alias("url_a"),
                             F.col(id_col).alias("_ua")), "url_a")
        .join(rid_url.select(F.col("rid").alias("url_b"),
                             F.col(id_col).alias("_ub")), "url_b")
        .select(F.col("_ua").alias("url_a"), F.col("_ub").alias("url_b"),
                "jaccard_est")
    )

    # duplicate docs rejoin as rep→member edges with Jaccard 1.0.
    # Materialized ONCE before connected components: the CC edge
    # symmetrization references `pairs` twice in a single job, and two
    # concurrent recompute branches would each re-run the full
    # verify + exact-edge lineage (incl. the sha256 corpus scan).
    pairs = _materialize(verified.union(
        exact_edges.withColumn("jaccard_est", F.lit(1.0))), "pairs")
    # everything downstream (CC, bucket stats) reads the sigs/pairs
    # scratch tables; the digest table has no remaining consumer
    edges = pairs.select("url_a", "url_b")
    if use_simhash:
        sh = reps.select(F.col(id_col), simhash_udf()(F.col(text_col)).alias("simhash"))
        sh_pairs = simhash_near_pairs(sh, id_col=id_col, hamming_t=cfg.simhash_hamming,
                                      bucket_cap=cfg.bucket_cap)
        edges = edges.union(sh_pairs.select("url_a", "url_b")).distinct()

    comps = connected_components(edges)
    stats = lsh_bucket_stats(
        band_keys(sigs.select(F.col("rid"), "band_hashes"), cfg, id_col="rid"),
        ["band_hash"], bucket_cap=cfg.bucket_cap)
    return NearDupResult(signatures=sigs, pairs=pairs,
                         clusters=comps, bucket_stats=stats)
