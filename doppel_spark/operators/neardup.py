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

from dataclasses import dataclass, field

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
    signature_stage,
    verify_pairs,
)
from doppel_spark.operators.stage import StageMaterializer


@dataclass
class NearDupResult:
    signatures: DataFrame   # (url, signature array<int>)
    pairs: DataFrame        # verified (url_a, url_b, jaccard_est)
    clusters: DataFrame     # (url, cluster_rep, cluster_id) — multi-doc clusters
    bucket_stats: DataFrame  # skew accounting (capped buckets, skipped pairs)
    materializer: StageMaterializer | None = field(default=None, repr=False)

    def cluster_summary(self) -> DataFrame:
        """(cluster_id, n_docs, urls sorted) for multi-doc clusters."""
        return (
            self.clusters.groupBy("cluster_id", "cluster_rep")
            .agg(F.count("*").alias("n_docs"),
                 F.sort_array(F.collect_list("url")).alias("urls"))
            .filter(F.col("n_docs") > 1)
        )

    def cleanup(self) -> None:
        """Reclaim the run's materialized stages (caches AND scratch
        parquet tables). Call only after the result frames are fully
        consumed: in table mode this DELETES the files backing
        ``signatures``/``pairs``/``clusters``, so later reads raise —
        deliberately not named ``unpersist``, whose Spark contract
        (safe to call anytime, frames recompute) this does not honor."""
        if self.materializer is not None:
            self.materializer.cleanup()


def near_dup_pipeline(
    pages: DataFrame,
    cfg: NearDupConfig | None = None,
    id_col: str = "url",
    text_col: str = "text",
    use_simhash: bool = False,
    small_input: bool | None = None,
) -> NearDupResult:
    """Flagship near-dup clustering. ``small_input`` picks the stage
    materialization strategy (None = auto from the input's size
    estimate): small corpora persist the five cut stages — a scratch
    table's fixed write/read-back cost (~10 s across the run) only pays
    for itself at ≳300 k docs, where the same cuts took local[16] from
    185 s to 44 s. See :class:`~doppel_spark.operators.stage.
    StageMaterializer` for the measured tradeoffs; the cut points mirror
    the durable checkpoint runner (:mod:`doppel_spark.checkpoint`)."""
    cfg = cfg or NearDupConfig()
    base = pages.select(F.col(id_col), F.col(text_col))
    mat = StageMaterializer.for_input(base, prefix="neardup",
                                      small_input=small_input)
    _materialize = mat.cut  # stage cuts below; see class docstring

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
    # force=False (persist mode only): the sigs cut below is the next
    # blocking action and its rep_ids broadcast build scans every
    # digest partition, filling this cache in that job; later
    # concurrent consumers are serialized per-partition by the block
    # manager's write locks, so the eager fill count was pure overhead.
    digests = _materialize(base.select(F.col(id_col), full_digest(text_col)),
                           "digests", force=False)
    rep_ids = digests.groupBy("digest").agg(F.min(id_col).alias(id_col))
    exact_edges = (
        digests.join(rep_ids.withColumnRenamed(id_col, "rep"), "digest")
        .filter(F.col(id_col) != F.col("rep"))
        .select(F.col("rep").alias("url_a"), F.col(id_col).alias("url_b"))
    )
    reps = base.join(rep_ids.select(id_col), id_col, "left_semi")
    # Scale-adaptive width for the signature stage (guide §2.2): a
    # low-partition input (single-row-group parquet cannot be split
    # below one task) would funnel the MinHash kernel through one core.
    # The spread happens HERE — after the exact-dedup pre-pass, on the
    # distinct-text representatives, whose lineage is evaluated exactly
    # once (the sigs cut) — not on the pipeline input: spreading `base`
    # re-pays the shuffle per consumer (digests + sigs; measured +1-4 s
    # at sf1.0). At cluster scale the input has >= parallelism splits
    # and this is a no-op.
    par = base.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < par:
        reps = reps.repartition(par)

    # Materialize signatures: they feed band-key explosion AND both
    # sides of the verification join — otherwise the (expensive) MinHash
    # UDF re-runs 3×. At cluster scale this becomes a stage checkpoint
    # table (see doppel_spark.checkpoint); the semantics are the same:
    # compute the signal once, reuse it.
    #
    # The stage runs via `signature_stage` (mapInArrow): Spark's Arrow
    # string buffer is read in place and the packed-binary signature
    # returns as one buffer — zero per-document Python in either
    # direction (the pandas-UDF transport paid a PyUnicode in and a
    # Python object out per document; round-4 profiling showed that
    # round trip, not the kernel, bounds the stage at 3.6M docs).
    #
    # The LSH path runs on 64-bit surrogate ids (`rid = xxhash64(url)`):
    # the band explosion multiplies row count ×bands, so shuffling a
    # ~45-byte url string there dominates the wire cost — 16-byte
    # (rid, band_hash) rows cut it ~3×. A rid collision only creates a
    # spurious candidate pair that signature verification discards
    # (expected spurious pairs ≈ n²/2⁶⁴ — a handful even at 10¹² docs);
    # true-pair loss requires both members to collide, ~2⁻⁶⁴ per pair.
    sigs = _materialize(
        signature_stage(reps, cfg, id_col=id_col, text_col=text_col)
        .select(id_col, F.xxhash64(id_col).alias("rid"),
                "signature", "band_hashes"), "sigs", force=False)
    # (sigs force=False: the memb cut right below scans every signature
    # partition through band_keys, filling the cache in that job — the
    # signature kernel still runs exactly once; see digests note above.
    # memb/cand/pairs KEEP their forced fills: lazifying the
    # multi-consumer cuts measured strictly worse, 46 jobs / 922
    # executed tasks vs 44 / 827 — OPTIMIZATION_r06.md second pass.)

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

    # CC rounds cut through the SAME materializer — one strategy for
    # the whole run (round-3 verdict: the repo documented
    # localCheckpoint as harmful in stage.py while CC still used it)
    comps = connected_components(edges, mat=mat)
    stats = lsh_bucket_stats(
        band_keys(sigs.select(F.col("rid"), "band_hashes"), cfg, id_col="rid"),
        ["band_hash"], bucket_cap=cfg.bucket_cap)
    return NearDupResult(signatures=sigs, pairs=pairs,
                         clusters=comps, bucket_stats=stats,
                         materializer=mat)
