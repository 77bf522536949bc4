"""IVF ANN variant + streaming windowed aggregation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from doppel_spark.corpus import synth_pages
from doppel_spark.operators.similarity import (
    brute_force_topk,
    ivf_ann_topk,
    ivf_assign,
    ivf_centroids,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_ivf_centroids_deterministic(spark):
    emb = spark.read.parquet(EMB)
    c1 = ivf_centroids(emb, 8)
    c2 = ivf_centroids(emb, 8)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 64)
    norms = np.linalg.norm(c1, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-9)


def test_ivf_assign_matches_numpy(spark):
    emb = spark.read.parquet(EMB).limit(50)
    cent = ivf_centroids(spark.read.parquet(EMB), 8)
    got = {r["vec_id"]: r["ivf_cell"]
           for r in ivf_assign(emb, cent).select("vec_id", "ivf_cell").collect()}
    pdf = emb.toPandas()
    for r in pdf.itertuples():
        v = np.array(r.embedding, dtype=np.float64)
        assert got[r.vec_id] == int((cent @ v).argmax())


def test_ivf_ann_overlaps_exact(spark):
    emb = spark.read.parquet(EMB)
    qids = [0, 1, 2]
    exact = brute_force_topk(emb, qids, k=10).toPandas()
    approx = ivf_ann_topk(emb, qids, k=10, n_centroids=8, n_probe=3).toPandas()
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    assert len(a) > 0
    assert len(e & a) / len(e) >= 0.3  # cell-probed search, sane overlap


def test_windowed_ingest_stats_stream(spark, tmp_path):
    from doppel_spark.streaming.windows import windowed_ingest_stats

    pages = synth_pages(spark, 100)  # warc_ts = epoch + i seconds
    src = str(tmp_path / "seg")
    pages.write.parquet(src)
    stream = spark.readStream.schema(pages.schema).parquet(src)
    agg = windowed_ingest_stats(stream, window="1 minute", watermark="5 minutes")
    q = (agg.writeStream.format("memory").queryName("win_stats")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from win_stats order by window").collect()
        assert sum(r["n_docs"] for r in rows) == 100
        assert len(rows) == 2  # 100 seconds spans two 1-minute windows
        assert all(r["n_distinct_digests"] > 0 for r in rows)
    finally:
        q.stop()
