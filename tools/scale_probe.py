"""Scaling probe: measure selected operators at sf0.1 vs a synthetic 10x.

The bench gate runs at sf0.1; this tool answers the next question — "what
happens at 10x?" — by synthesizing a faithful 10x dataset (disjoint id
ranges per copy, regenerated names so key-derived operators see real new
keys, suffix-perturbed documents) and timing a representative operator
slice at both scales. Ratios near the data ratio (10) mean the operator is
compute-bound and scaling linearly; ratios well BELOW it mean fixed
overheads still dominate at sf0.1 (headroom); ratios far ABOVE it flag
super-linear blowup (the thing to fix).

Usage: python tools/scale_probe.py [factor] [out_json]
Writes scale_probe.json at the repo root by default.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

QUERIES = [
    "sketch_cm_user_counts",
    "audit_table_digest",
    "hist_equidepth_value",
    "stat_pearson_value_time",
    "split_group_holdout",
    "layout_morton_codes",
    "fuzzy_name_matches",
    "mine_association_rules",
    "graph_triangle_count",
    "dedup_ngram_jaccard",
    "seq_user_fingerprint",
    "emb_gram_matrix",
    # round-7 additions: rank-statistic histogram walk, per-user lag
    # window, corpus trigram explode + self-derived context join, and the
    # iterative BPE trainer (driver-sequenced argmax rounds).
    "stat_mannwhitney_pairs",
    "w15_ewma_dyadic",
    "text_trigram_lm",
    "bpe_learn_merges",
    # round-8 additions: posting-list retrieval + greedy MMR rounds, LPA
    # label-histogram rounds, grid-join DBSCAN, wedge-join link
    # prediction, pinned-fold NB scoring, survival risk-set windows.
    "text_sparse_topk",
    "retrieval_mmr_rerank",
    "graph_lpa_communities",
    "graph_linkpred_topk",
    "emb_dbscan_clusters",
    "ml_naive_bayes_lang",
    "stat_kaplan_meier_conversion",
    # round-9 additions (VERDICT r05 task 2): the new iteratives —
    # multi-source BFS relaxation rounds, personalized PageRank restart
    # joins, the SymSpell-blocked entity-resolution pipeline, the
    # vocabulary-graph TextRank loop, and the two-ordering OHLC window.
    "graph_bfs_hops",
    "graph_ppr_suppliers",
    "er_resolve_customers",
    "text_textrank_keywords",
    "ts_ohlc_daily",
    # round-6: corpus-wide repeated-window counting + per-doc span rebuild;
    # per-user sequential-state fold (rate limiter replay).
    "text_substring_dedup",
    "ops_rate_limit_simulation",
    # round-11: integer HITS normalization half-steps and the tagged
    # per-source BFS behind harmonic centrality — both graph-iterative;
    # plus the one-pass 2B-conditional-aggregate bootstrap.
    "graph_hits_scores",
    "graph_harmonic_centrality",
    "stat_bootstrap_ci_mean",
    # round-12: Brandes path counting (12th iterative), the engine-native
    # recursive-CTE BFS (semi-naive evaluator scaling), and DSIR's
    # posting-join scoring pipeline.
    "graph_path_counts",
    "rec_reachability_hops",
    "corpus_dsir_importance",
    # round-12 late: Brandes backward pass (13th) and queue-optimized
    # Bellman-Ford (14th) — the heaviest per-source graph iteratives.
    "graph_betweenness_probe",
    "graph_weighted_shortest_paths",
    # round-8 (driver numbering): FW-BW SCC — trim + fixpoint BFS both
    # directions; the 10x copies each contain their own bowtie, so the
    # giant SCC count grows with copies but per-copy work is the law.
    "graph_scc_components",
    # round-8 late: time-respecting earliest arrival (improved-frontier
    # over timestamped contacts) and the WordPiece trainer (vocabulary-
    # scaled like BPE — expect ~1x).
    "graph_temporal_reachability",
    "wordpiece_learn_merges",
    # round-15: condensation layering (SCC + Kahn peel — two composed
    # iteratives), the rich-club/assortativity edge⋈deg⋈deg family, and
    # the seasonal-MK calendar-bounded pair join.
    "graph_condensation_layers",
    "graph_rich_club",
    "stat_seasonal_mannkendall",
    # bow-tie = SCC + two reachability BFS passes (set-state).
    "graph_bowtie_regions",
    # round-9 (driver numbering): BM25 — posting-join + pinned fold; the
    # vocabulary/doclen sides are deliberately unhinted (AQE decides).
    "retrieval_bm25_topk",
    # round-9: k-truss (25th iterative — triangle-support peel; partkeys
    # shift per copy, so the co-purchase graph gains disjoint nodes).
    "graph_ktruss_edges",
    # round-9 late: LM ranking (probe x doclen grid + product folds),
    # two-pass PRF expansion, and the wedge-join Jaccard top-k.
    "retrieval_query_likelihood",
    "retrieval_prf_expansion",
    "graph_jaccard_similarity_topk",
    # round-10 (driver numbering): two-level Louvain (26th iterative —
    # parity-alternating dQ moves over the co-purchase graph), the
    # coordinate-descent ridge classifier (model size fixed; cost is the
    # feature build + Gram aggregation), and the KLL sketch build (per-
    # (day, shard) Arrow kernel + driver merge of O(k)-byte partials).
    "graph_louvain_communities",
    "ml_ridge_text_classifier",
    "sketch_kll_quantiles",
    # round-11 (driver numbering): sampled Brandes (cost scales with the
    # source sample, not |V| — expect ~flat), AR(2) Yule-Walker (daily
    # pre-aggregate + 2x2 closed solve), Leiden refinement (CC over
    # intra-community edges), HNSW graph ANN (search cost independent of
    # corpus size; build is cell-bounded), dHash image dedup (banded
    # candidates — output-bound on the planted-pair count).
    "graph_betweenness_sampled",
    "ts_ar2_yule_walker",
    "graph_leiden_refine",
    "ann_hnsw_topk",
    "dedup_image_phash",
]


def synthesize(spark, factor: int, dest: str) -> None:
    from pyspark.sql import functions as F

    from clinical_api_etl_spark.sources.catalog import load

    os.makedirs(dest, exist_ok=True)

    ev = load(spark, BASE, "events")
    n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    n_user = ev.agg(F.max("user_id")).collect()[0][0] + 1
    copies = []
    for k in range(factor):
        copies.append(
            ev.select(
                (F.col("event_id") + k * n_ev).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {k} SECONDS")).alias("ts"),
                (F.col("user_id") + k * n_user).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{dest}/events.parquet")

    cust = load(spark, BASE, "customer")
    n_c = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    ccopies = []
    for k in range(factor):
        key = F.col("c_custkey") + k * n_c
        ccopies.append(
            cust.select(
                key.alias("c_custkey"),
                F.concat(F.lit("Customer#"), F.lpad(key.cast("string"), 9, "0")).alias(
                    "c_name"
                ),
                "c_nationkey",
                "c_acctbal",
                "c_mktsegment",
            )
        )
    out = ccopies[0]
    for c in ccopies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{dest}/customer.parquet")

    sup = load(spark, BASE, "supplier")
    n_s = sup.agg(F.max("s_suppkey")).collect()[0][0] + 1
    li = load(spark, BASE, "lineitem")
    n_o = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    n_p = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    lcopies = []
    for k in range(factor):
        lcopies.append(
            li.withColumn("l_orderkey", F.col("l_orderkey") + k * n_o)
            .withColumn("l_partkey", F.col("l_partkey") + k * n_p)
            # shift suppliers too: the interaction GRAPH must gain new
            # nodes at 10x, not 10x the degree on the same suppliers —
            # degree inflation would make graph ops look super-linear by
            # construction, not by algorithm.
            .withColumn("l_suppkey", F.col("l_suppkey") + k * n_s)
        )
    out = lcopies[0]
    for c in lcopies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{dest}/lineitem.parquet")

    # orders + supplier: the round-5 iteratives (BFS / PPR) derive the
    # customer<->supplier graph from lineitem JOIN orders; keys shift by
    # the same per-table strides so every copy is a disjoint subgraph.
    orders = load(spark, BASE, "orders")
    ocopies = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + k * n_o)
        .withColumn("o_custkey", F.col("o_custkey") + k * n_c)
        for k in range(factor)
    ]
    out = ocopies[0]
    for c in ocopies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{dest}/orders.parquet")

    scopies = [
        sup.select(
            (F.col("s_suppkey") + k * n_s).alias("s_suppkey"),
            F.concat(
                F.lit("Supplier#"),
                F.lpad((F.col("s_suppkey") + k * n_s).cast("string"), 9, "0"),
            ).alias("s_name"),
            "s_nationkey",
            "s_acctbal",
        )
        for k in range(factor)
    ]
    out = scopies[0]
    for c in scopies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{dest}/supplier.parquet")

    docs = load(spark, BASE, "documents")
    n_d = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    dcopies = []
    for k in range(factor):
        dcopies.append(
            docs.select(
                (F.col("doc_id") + k * n_d).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" variant{k}")).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + F.lit(len(f" variant{k}"))).alias("n_chars"),
            )
        )
    out = dcopies[0]
    for c in dcopies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{dest}/documents.parquet")

    emb = load(spark, BASE, "embeddings")
    n_v = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    # shift each copy's vectors deterministically (±0.05·k per element):
    # exact duplicates would make density/near-dup operators look
    # quadratic at 10x purely because every point gains 9 clones at
    # distance zero — an artifact, not a scaling law.
    # NB single-arity closure: `lambda x, k=k:` is the ARITY-2 HOF trap
    # (pyspark passes the array INDEX as k — every copy got the SAME
    # index-shifted vector, i.e. exact clones, the artifact this shift
    # exists to avoid; round-8 fix, same bug class as the minhash seeds).
    def _shift(k: int):
        return lambda x: (x + F.lit(0.05 * k)).cast("float")

    ecopies = [
        emb.withColumn("vec_id", F.col("vec_id") + k * n_v).withColumn(
            "embedding", F.transform(F.col("embedding"), _shift(k))
        )
        for k in range(factor)
    ]
    out = ecopies[0]
    for c in ecopies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{dest}/embeddings.parquet")


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scale_probe.json")
    )
    from clinical_api_etl_spark.plans.registry import all_queries
    from clinical_api_etl_spark.session import get_spark

    spark = get_spark("scale-probe")
    qs = all_queries()
    dest = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        t0 = time.time()
        synthesize(spark, factor, dest)
        gen_s = round(time.time() - t0, 1)
        print(f"# synthesized {factor}x under {dest} in {gen_s}s", file=sys.stderr)

        # SCALE_PROBE_ONLY=a,b,c probes just those queries and MERGES
        # into the existing out_path (incremental refresh for new ops
        # without re-running the whole list).
        only = {
            n for n in os.environ.get("SCALE_PROBE_ONLY", "").split(",") if n
        }
        results = {}
        if only and os.path.exists(out_path):
            with open(out_path) as f:
                prior = json.load(f)
            if prior.get("factor") == factor:
                results.update(prior.get("queries", {}))
            else:
                print(
                    f"# WARNING: prior {out_path} was recorded at factor "
                    f"{prior.get('factor')} != {factor}; its entries are "
                    "NOT merged — the output will contain only the "
                    "SCALE_PROBE_ONLY subset.",
                    file=sys.stderr,
                )
        for name in QUERIES:
            if only and name not in only:
                continue
            q = qs[name]
            times = {}
            for label, d in (("base", BASE), (f"x{factor}", dest)):
                best = None
                rows = None
                for _ in range(2):
                    # honesty contract: drop shared-artifact memo entries
                    # (SCC labeling etc.) so every attempt is standalone
                    from clinical_api_etl_spark.functions import memo

                    memo.reset()
                    t0 = time.time()
                    rows = q.builder(spark, d).count()
                    dt = time.time() - t0
                    spark.catalog.clearCache()
                    best = dt if best is None else min(best, dt)
                times[label] = {"sec": round(best, 3), "rows": rows}
            ratio = round(times[f"x{factor}"]["sec"] / max(times["base"]["sec"], 1e-9), 2)
            results[name] = {**times, "time_ratio": ratio}
            print(f"# {name}: {times['base']['sec']}s -> "
                  f"{times[f'x{factor}']['sec']}s (x{ratio})", file=sys.stderr)
        payload = {"factor": factor, "base": BASE, "queries": results}
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
        print(json.dumps({"wrote": out_path, "factor": factor}))
        return 0
    finally:
        shutil.rmtree(dest, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
