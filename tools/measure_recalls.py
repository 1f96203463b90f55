"""One-off: measure approximate-family recalls at a given sf_dir.

Usage: PYTHONPATH=. python tools/measure_recalls.py /root/testdata/sf0.01
Prints one line per gate: name measured_recall current_floor.
"""
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.catalog import load


def pair_recall(approx, exact):
    a = {tuple(r) for r in approx.select("id_a", "id_b").collect()}
    e = {tuple(r) for r in exact.select("id_a", "id_b").collect()}
    return len(a & e) / max(len(e), 1), len(a - e)


def topk_recall(approx, exact):
    a = {tuple(r) for r in approx.select("query_id", "neighbor_id").collect()}
    e = {tuple(r) for r in exact.select("query_id", "neighbor_id").collect()}
    return len(a & e) / max(len(e), 1)


def main():
    sf_dir = sys.argv[1]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from clinical_api_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from clinical_api_etl_spark.operators.pq import l2_topk
    from clinical_api_etl_spark.operators.similarity import (
        cosine_topk,
        embedding_near_duplicates,
        ivf_topk,
        lsh_topk,
        semantic_near_duplicates,
    )

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact5 = cosine_topk(queries, emb, k=5)

    r = topk_recall(lsh_topk(queries, emb, k=5), exact5)
    print(f"ann_lsh           recall={r:.3f}  floor=0.5")

    r = topk_recall(ivf_topk(queries, emb, k=5, n_clusters=8, n_probe=2), exact5)
    print(f"ann_ivf           recall={r:.3f}  floor=0.75")

    from clinical_api_etl_spark.operators.hnsw import hnsw_topk

    # measured 1.0/1.0/1.0 at sf0.001/0.01/0.1 on 2026-08-17 with the
    # three-layer corpus-proportional LSH-cell build (M=8, beam=16,
    # ~64-member cells). History: k-means-cell build with M=8/beam=16
    # measured 0.88/0.98/0.88 but its fixed k=8 cells grew linearly and
    # made the 10x build quadratic; M=6/beam=12 measured 0.84/0.86/0.82.
    r = topk_recall(hnsw_topk(queries, emb, k=5), exact5)
    print(f"ann_hnsw          recall={r:.3f}  floor=0.8")

    from clinical_api_etl_spark.plans.extensions import ann_ivfpq_topk

    r = topk_recall(
        ann_ivfpq_topk(spark, sf_dir), l2_topk(queries, emb, k=5)
    )
    print(f"ann_ivfpq (vs l2) recall={r:.3f}  floor=0.7")

    from clinical_api_etl_spark.plans.mlprep import (
        _BQ_K,
        ann_binary_hamming_topk,
        ann_sq8_topk,
    )

    exact_bqk = cosine_topk(queries, emb, k=_BQ_K)
    r = topk_recall(ann_binary_hamming_topk(spark, sf_dir), exact_bqk)
    print(f"ann_binary        recall={r:.3f}  floor=0.5 (test)")

    r = topk_recall(ann_sq8_topk(spark, sf_dir), l2_topk(queries, emb, k=5))
    print(f"ann_sq8 (vs l2)   recall={r:.3f}  floor=0.8 (test)")

    exact_j = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    mh = minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    r, fp = pair_recall(mh, exact_j)
    print(f"dedup_minhash     recall={r:.3f}  false_pos={fp}  floor=0.9")

    exact_c = embedding_near_duplicates(emb, threshold=0.4)
    sem = semantic_near_duplicates(emb, threshold=0.4, n_clusters=4)
    r, fp = pair_recall(sem, exact_c)
    print(f"dedup_semantic    recall={r:.3f}  false_pos={fp}  floor=0.4")

    spark.stop()


if __name__ == "__main__":
    main()
