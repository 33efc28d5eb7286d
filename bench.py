#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line with per-query wall-clock seconds.

Execution is forced through the noop sink (full computation on executors,
nothing collected to the driver) so timings reflect the distributed plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family (scan+agg, join+topN, star join,
# semi join, window, similarity-match cascade, dedup, ANN — extended as
# milestones land).
#
# MEMBERSHIP RULE (round 6, ending the drift class): every registered
# query belongs here EXCEPT
#   (a) scalar-function demos and point lookups whose cost is session
#       overhead, not plan execution: fn_clean_text, fn_domain_company,
#       fn_abn_checksum, fn_extract_abn_text, fn_contacts,
#       fn_standardize_state, fn_clean_company_name, fn_dates,
#       fn_snippet, order_lookup (fn_jaro_winkler and
#       fn_token_sort_ratio stay as the family's representatives);
#   (b) variants fully dominated by a listed query: orders_page
#       (orders_page_keyset is the listed twin), dedup_clusters
#       (contained in dup_cluster_size_histogram and run by
#       dedup_clusters_star), match_rule_based and match_llm_stub
#       (stages of the listed match_cascade_full).
# When adding a query, add it here unless it falls under (a)/(b) —
# tests/test_cli.py::test_headline_membership_rule enforces the
# reconciliation.  README's headline count is len(HEADLINE).
HEADLINE = [
    "pricing_summary",
    "top_revenue_orders",
    "nation_revenue",
    "order_priority_semi",
    "top1_order_per_customer",
    "running_order_total",
    "fn_token_sort_ratio",
    "match_fuzzy_blocked",
    "text_stats",
    "dedup_ngram_jaccard",
    "dedup_winnow",
    "dedup_incremental_winnow",
    "winnow_match_spans",
    "winnow_match_runs",
    "winnow_pair_report",
    "dedup_blocks",
    "dedup_incremental_blocks",
    "winnow_contamination",
    "dsir_select",
    "dsir_resample",
    "dsir_resample_by_source",
    "decontaminate_corpus",
    "dedup_winnow_keep_best",
    "quality_classifier_score",
    "quality_classifier_eval",
    "quality_classifier_sweep",
    "trigram_lm_score",
    "bpe_train",
    "ann_pq",
    "build_training_corpus",
    "corpus_attrition_card",
    "lm_perplexity_bins",
    "distinct_ngram_diversity",
    "quality_ensemble_topk",
    "ann_ivf_pq_residual",
    "ivf_pq_topk",
    "line_dedup_rewrite",
    "zipf_fit_report",
    "weighted_corpus_sample",
    "nucleus_token_budget",
    "char_entropy_quality",
    "benford_revenue_audit",
    "skyline_suppliers",
    "match_sorted_neighborhood",
    "ks_drift_orders",
    "order_price_outliers_mad",
    "unpivot_part_metrics",
    "ann_mmr_rerank",
    "bloom_filtered_lineitems",
    "kmv_distinct_users",
    "kmv_join_cardinality",
    "part_copurchase_bfs",
    "dedup_bcubed_eval",
    "asof_next_purchase",
    "weighted_median_price",
    # round 13
    "asof_nearest_event",
    "overdue_orders_by_priority",
    "local_supplier_region_revenue",
    "part_revenue_share_screen",
    "dedup_effectiveness_report",
    "training_shuffle_shards",
    "padding_efficiency_report",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "substring_dup_spans",
    "contamination_check",
    "ann_brute_force",
    "ann_lsh_bucketed",
    "ann_quantized",
    "events_session_5m",
    "multimodal_features",
    "match_cascade_full",
    "ann_ivf",
    "jsonld_flatten",
    "clean_abr_pipeline",
    "dq_summary",
    "dim_merge_upsert",
    "column_profile_orders",
    "asof_purchase_attribution",
    "priority_year_pivot",
    "nation_order_quantiles",
    "events_hourly_daily_rollup",
    "doc_top_terms",
    "dedup_incremental_minhash",
    "quality_repetition",
    "train_split_stratified",
    "seq_packing_plan",
    "unigram_surprise_score",
    "semantic_dedup",
    "curate_corpus",
    "chunk_documents",
    "bm25_search",
    "random_projection",
    "dataset_mixing_plan",
    "vocab_pair_counts",
    "funnel_conversion",
    "user_retention_cohorts",
    "quality_prune_per_source",
    "k_anonymity_customers",
    "apply_mixing_plan",
    "vocab_coverage",
    "embedding_norm_histogram",
    "pagerank_neardup",
    "waiting_suppliers",
    "customer_order_histogram",
    "lineitem_correlations",
    "common_event_paths",
    "events_trending",
    "customer_rfm",
    "events_daily_anomalies",
    "events_ewma_daily",
    "part_affinity",
    "hybrid_search_rrf",
    "bigram_surprise_score",
    "salted_user_event_stats",
    "match_phonetic_blocked",
    "small_quantity_revenue",
    "min_cost_supplier",
    "copurchase_triangles",
    "user_value_records",
    "media_phash_dups",
    "media_frame_plan",
    "events_rollup_incremental",
    "bpe_tokenize_stats",
    "incremental_distinct_users",
    "customer_360",
    "events_late_audit",
    "customer_hierarchy_rollup",
    "events_daily_gapfill",
    "part_revenue_pareto",
    "user_week_over_week",
    "fn_jaro_winkler",
    "match_quality_report",
    "promo_revenue_share",
    "disjunctive_predicate_revenue",
    "funnel_time_to_convert",
    "media_resize_checksum",
    "embedding_standardize",
    "order_percentile_ranks",
    "unshipped_order_revenue",
    # round 5
    "forecast_revenue_change",
    "product_type_profit",
    "returned_item_customers",
    "late_shipment_priority_counts",
    "supplier_part_brands",
    "supplier_nation_cube",
    "event_transition_matrix",
    "customer_order_gaps",
    "dup_cluster_size_histogram",
    "cross_source_shingle_overlap",
    "doc_length_deciles",
    "source_lang_confusion",
    "tokenizer_fertility",
    "term_cms_heavy_hitters",
    "cms_contamination_probe",
    # round 6
    "cms_error_contract",
    "dedup_clusters_star",
    # round 6: the membership-rule reconciliation — every remaining
    # registered query that executes a real plan
    "customers_without_orders",
    "distinct_order_dims",
    "events_lag_delta",
    "union_missing_columns",
    "orders_page_keyset",
    "priority_price_stats",
    "events_json_k",
    "priority_status_rollup",
    "nation_trade_volume",
    "market_share",
    "top_supplier_revenue",
    "corpus_profile_by_source",
    "corpus_quality_filter",
    "corpus_sample",
    "dedup_exact",
    "dedup_embedding_cosine",
    "label_centroids",
    "events_tumbling_1h",
    "events_sliding_10m",
    "events_dedup_union",
    "events_click_error_join",
    "events_user_seq",
    "events_variant_stats",
    "large_orders",
    "global_sales_opportunity",
    "excess_suppliers",
    "skew_report_events",
    "order_price_band_stats",
    "approx_distinct_users",
    "approx_median_value",
    "pii_redaction",
    "ann_recall_report",
    "curation_report",
    "funnel_user_stages",
    "l_diversity_customers",
    "dedup_clusters_incremental",
    "dedup_clusters_incremental2",
    "dedup_clusters_incremental_sliver",
    "scd2_point_in_time",
    "corpus_snapshot_diff",
    "boilerplate_screen",
    "corpus_drift_psi",
    "embedding_drift",
    "dedup_keep_best",
    "minhash_recall_report",
    "ann_ivf_incremental",
    "scd2_customer_history",
    "scd2_order_priority_history",
    "fk_integrity_audit",
    "leakage_safe_split",
    "value_quantile_sketch",
]


def clear_cached_state(spark):
    """SQL-cached relations AND RDD-level blocks: clearCache() does not
    release localCheckpoint storage (the iterative CC queries checkpoint
    per round), so drop every persistent RDD too — between queries
    nothing re-reads them (review r6)."""
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def timed_query_run(spark, fn, sf_dir, passes=1):
    """One query's full measurement discipline — warm (untimed, best
    effort), then ``passes``× (clear + GC, timed run with one retry for
    transient binder/AQE flakes), reporting the MINIMUM across passes,
    then clear + GC again so the next query's window is clean.  Returns
    (seconds, None) or (None, error-string).

    Minima-of-N (round 13; verdict r12 #2): a single recorded timing
    sits on whatever JVM/GC/codegen load the sweep window happens to
    carry — two consecutive rounds of BENCH_rN.json cross-round
    comparison produced phantom 2-3.5× "regressions" that only isolated
    re-measurement could dismiss (r12: ann_ivf_incremental recorded
    2.88 s vs 0.83 s real).  The minimum across adjacent passes is the
    load-robust estimator of steady-state plan cost: noise classes are
    strictly additive (GC pauses, compile stalls, CPU contention), so
    min converges on the true floor while mean/median still carry them.
    Warm-up runs ONCE, not per pass — its purpose is whole-stage-codegen
    compilation, and the codegen cache holds across ADJACENT runs of
    the same plan (the per-query-adjacency rationale below).

    Module-level and shared with scripts/scale_probe.py (review r7):
    the probe's ratios are only comparable to bench numbers if both are
    measured under the identical discipline.  The GC hints matter:
    back-to-back heavy executions accumulate old-gen debt (dropped
    broadcasts, codegen classes) faster than G1 reclaims it under load,
    and the eventual collection lands inside SOME later query's timing.
    """
    try:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception:
        pass  # warm-up is best-effort; the timed run surfaces errors
    best, err = None, None
    for _ in range(max(1, passes)):
        clear_cached_state(spark)
        spark.sparkContext._jvm.System.gc()
        for attempt in (1, 2):
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                secs = round(time.time() - t0, 3)
                if best is None or secs < best:
                    best = secs
                err = None
                break
            except Exception as exc:  # transient binder/AQE flakes: retry once
                err = f"attempt {attempt}: {type(exc).__name__}: {str(exc)[:500]}"
                clear_cached_state(spark)
    clear_cached_state(spark)
    spark.sparkContext._jvm.System.gc()
    if best is not None:
        return best, None
    return None, err


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--passes",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")),
        help="timed passes per query; the MINIMUM is recorded (default 3 "
        "— the load-robust artifact the driver records; see "
        "timed_query_run's rationale).  1 restores the single-shot "
        "pre-r13 behavior.",
    )
    ap.add_argument(
        "--raw-out",
        default=os.environ.get(
            "SPARK_GRAFT_BENCH_RAW_OUT",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "plans",
                "bench_raw_latest.json",
            ),
        ),
        help="also write the FULL payload (all per-query seconds) to this "
        "file (verdict r13 #7: the driver keeps only a truncated stdout "
        "tail, which cost round 13 two-thirds of its per-query evidence). "
        "Additions-only: the one-line stdout JSON contract is unchanged. "
        "Set to '' to disable.",
    )
    args = ap.parse_args()
    passes = max(1, args.passes)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    import __spark_entry__ as entrymod
    from firmable_company_data_pipeline_spark import get_spark

    spark = get_spark("firmable-bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm the JVM/session on the smallest table once, and fork the Python
    # UDF workers (pandas/numpy import per worker is a one-time cost that
    # would otherwise land on the first Arrow-boundary query; workers are
    # reused afterwards — spark.python.worker.reuse default).
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Per-query warm-up: one untimed execution of each headline plan at the
    # TARGET SF before the timed pass.  Single-shot timings are dominated
    # by whole-stage-codegen JIT (Janino) compilation of the generated
    # Java — measured 2-8s per expression-heavy plan vs <1s of actual
    # sf0.1 compute.  Warming at a smaller SF is not enough: AQE picks
    # physical operators (broadcast vs sort-merge, coalesced partitions)
    # from runtime statistics, so the small-SF plan compiles DIFFERENT
    # generated code than the target-SF plan and the cache misses.  One
    # warm pass at the target SF compiles exactly the code the timed pass
    # runs; the timed numbers then measure steady-state engine throughput
    # — the quantity that scales to 100 TB (compile cost is a per-plan
    # constant that amortizes to zero).  Warm-up time is NOT included in
    # the reported numbers; the timed run re-executes the full plan (a
    # fresh DataFrame shares no shuffle/cache state — clearCache() below
    # drops every persisted intermediate the warm pass materialized).
    # Known bias, accepted: the warm pass also loads the input parquet
    # into the OS page cache, so timed runs measure warm-read I/O.  At
    # these SFs the inputs (~100 MB) are page-cached after any first
    # touch anyway; numbers are comparable round-over-round but not to
    # an engine benched cold.
    # Warm-up and timing run ADJACENT per query (warm → clear → time),
    # not as two full passes: with a warm-all-then-time-all structure,
    # ~55 other executions' codegen churn sits between a query's warm
    # and timed runs, and the codegen LRU (1000 entries) evicts the
    # compiled classes of codegen-heavy plans — the iterative PageRank
    # measured 5s adjacent vs 13-28s after a full intervening pass.
    # Per-query isolation: one flaky failure must never zero out the whole
    # round's numbers (round-3 lesson: a single transient plan-binding error
    # in one timed query exited the process with rc=1 and NO bench record).
    # Errors are retried once, then recorded per-query in an "errors" field;
    # the JSON line always prints and rc stays 0 while any query succeeded.
    timings = {}
    errors = {}
    # tolerate any SPARK_GRAFT_SF_DIR basename: a malformed numeric-ish
    # string ('1.2.3') must fall back to the raw string, not crash the
    # sweep before any query runs (advice r6); reject non-finite floats
    # ('nan'/'inf') too — json.dumps would emit invalid JSON for them
    # (review r7)
    import math

    try:
        sf_val = float(sf)
        if not math.isfinite(sf_val):
            sf_val = sf
    except ValueError:
        sf_val = sf
    done = 0
    for name in names:
        secs, err = timed_query_run(spark, qs[name], sf_dir, passes=passes)
        if secs is not None:
            timings[name] = secs
        else:
            errors[name] = err
        # Crash insurance (round 6): a ~140-query sweep runs >10 min
        # wall; if the process is killed mid-run the final total line
        # never prints and the round records NOTHING (the round-4
        # failure mode).  Emit a running compact line every 20
        # PROCESSED queries — gating on len(timings) would re-fire
        # after every failure while the count sits on a multiple of 20
        # (review r6) — marked partial=true so it can't be mistaken
        # for a full sweep; the completed-run line still prints last.
        done += 1
        if done % 20 == 0:
            print(
                json.dumps(
                    {
                        "metric": "headline_queries_wall_clock_total",
                        "value": round(sum(timings.values()), 3),
                        "unit": "sec",
                        "n": len(timings),
                        "n_errors": len(errors),
                        "sf": sf_val,
                        "partial": True,
                    }
                ),
                flush=True,
            )
            # Same crash insurance for the per-query map (r14): a sweep
            # killed mid-run used to lose EVERY per-query second; the
            # raw-out file now trails the sweep, marked partial until
            # the final overwrite below.
            if args.raw_out:
                try:
                    os.makedirs(os.path.dirname(args.raw_out), exist_ok=True)
                    with open(args.raw_out, "w") as fh:
                        json.dump(
                            {
                                "metric": "headline_queries_wall_clock",
                                "value": round(sum(timings.values()), 3),
                                "unit": "sec",
                                "queries": timings,
                                "errors": errors,
                                "sf": sf_val,
                                "passes": passes,
                                "partial": True,
                            },
                            fh,
                            indent=1,
                            sort_keys=True,
                        )
                        fh.write("\n")
                except OSError:
                    pass
    total = round(sum(timings.values()), 3)

    payload = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "passes": passes,
    }
    if errors:
        payload["errors"] = errors
    if args.raw_out:
        # Durable full per-query map (best-effort: a read-only checkout
        # must never fail the bench itself).
        try:
            os.makedirs(os.path.dirname(args.raw_out), exist_ok=True)
            with open(args.raw_out, "w") as fh:
                json.dump(payload, fh, indent=1, sort_keys=True)
                fh.write("\n")
        except OSError:
            pass
    print(json.dumps(payload))
    # Second, compact, total-only line printed LAST: the detailed line
    # above grows with the suite (~90 queries) and exceeded the driver's
    # tail capture in round 4, truncating the leading "value" field —
    # whatever the capture window, the headline total survives here.
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock_total",
                "value": total,
                "unit": "sec",
                "n": len(timings),
                "n_errors": len(errors),
                "sf": payload["sf"],
                "passes": passes,
            }
        )
    )
    if not timings:
        sys.exit(1)


if __name__ == "__main__":
    main()
