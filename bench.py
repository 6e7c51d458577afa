"""Benchmark harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints the JSON record:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

followed by a COMPACT suite-total line (same metric/value/unit/sf, no
per-query map) emitted last and alone, so a bounded tail capture of
stdout always ends with a complete, parseable record even when the
per-query line outgrows the capture window (VERDICT r9 #5 — the round-9
artifact lost the head of the 80-query line and parsed as null).

The headline metric is the total wall time of the benchmark suite (lower is
better). Each query is fully executed (collect for small results, count for
large ones) so the timing covers scan→shuffle→result, not plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ddataframeoperation_spark.queries import QUERIES  # noqa: E402
from ddataframeoperation_spark.session import get_spark  # noqa: E402

#: Queries timed by the bench — the heavy/representative slice of the
#: surface: scans, the join family, aggregation, windows, dedup/similarity,
#: text analysis, and the flagship. (Streaming + rows-only stubs are covered
#: by correctness, not timed here.)
BENCH_QUERIES = [
    "b01_scan_project_filter",
    "b05_join_inner",
    "b06_join_left_agg",
    "b08_star_join_broadcast",
    "b09_range_join",
    "b11_agg_pricing_summary",
    "b13_cube",
    "b16_top_k",
    "b17_window_rank",
    "b19_window_running_sum",
    "b20_latest_per_key",
    "b35_sessionize",
    "b23_string_funcs",
    "b25_math_conditional",
    "b26_json_funcs",
    "b27_array_funcs",
    "b30_script_zscore",
    "b31_dedup_fingerprint",
    # The raw banded-LSH candidate operator — identical work to what round 1
    # benched under "b32_minhash_candidates" (that query name now carries the
    # exact-Jaccard recall gate, which is correctness harness, not operator).
    "b32_minhash_raw",
    "b32_jaccard_pairs",
    "b32_simhash_candidates",
    "b33_cosine_topk",
    "b33_embedding_neardup",
    "b34_word_stats",
    "b11_salted_agg",
    "b09_asof_join",
    "b11_time_rollup",
    "b34_tfidf",
    "b28_profile",
    "b10_q7_nation_volume",
    "b10_flagship_q3",
    # Round-3 additions: TPC-H completion + corpus-hygiene/sampling ops.
    "b10_q2_min_cost_supplier",
    "b10_q8_market_share",
    "b10_q21_waiting_suppliers",
    "b34_contamination",
    "b34_bigram_lm",
    "b22_hash_sample",
    "b34_full_pipeline",
    # Round-4 addition: long-doc token-window chunking (row-local).
    "b34_chunking",
    # Round-5 additions: sub-document block dedup, int8-quantized vector
    # search, SCD2 history build (single-shuffle two-window composition).
    "b31_block_dedup",
    "b33_quantized_topk",
    "b18_scd2_history",
    # Round-5b widening — the performance-interesting slice only. The
    # full 187-query surface is covered by the correctness gate; timing
    # every sub-0.5s query would mostly measure per-job overhead (~0.15s
    # floor each) and inflate the suite total without information.
    "b24_ohlc_bars",
    "b19_ewma",
    "b05_lateral_topn",
    "b22_temperature_mix",
    "b34_lexical_diversity",
    "b35_funnel",
    "b33_centroid_confusion",
    "b16_skyline_2d",
    "b18_transition_matrix",
    "b24_twap",
    "b35_cooccurrence",
    # Round-6 addition: token-budgeted mixture sampling (two-level
    # bucketed prefix sums — windows + broadcast joins over documents).
    "b22_token_budget_mix",
    # Round-7 additions: the re-planned bucketed cumulative share (ABC)
    # and batched multi-query dense retrieval (one corpus scan, 3 queries,
    # two-level sharded top-k).
    "b19_abc_classification",
    "b33_multi_topk",
    # Round-7b: the one-call corpus data card — the heaviest row-local
    # text-array scan in the b34 family (tokens + trigrams + distinct per
    # doc) feeding a single map-side-combined aggregate.
    "b34_corpus_datacard",
    # Round-7c: semi-join-reduced fact join (broadcast LEFT SEMI below the
    # main join) and corpus-frequency boilerplate removal (digest-only
    # shuffle + one-row broadcast set + row-local rejoin).
    "b05_semijoin_reduction",
    "b34_boilerplate_removal",
    # Round-7d: the perf-interesting slice of the widening batch —
    # rolling distinct actives (reduced-grid explode + per-day
    # count-distinct), its constant-state HLL twin, the PQ ADC scan +
    # re-rank, skip-gram pair counting (the widest row-local explode in
    # the b34 family), and the bounded-frame next-event pair builder.
    "b24_rolling_actives",
    "b24_rolling_actives_approx",
    "b33_pq_topk",
    "b34_skipgram_pairs",
    "b35_next_event_examples",
    # Round-8: the Gopher-rule scan-stage corpus gate, the all-integer
    # hot-key census, and the basis-point mixture planner.
    "b34_gopher_quality",
    "b28_key_skew_audit",
    "b22_mixture_weights",
    # Round-9 (VERDICT r8 #2): the heaviest previously-UNBENCHED operators,
    # put under floors so regressions can't hide outside the suite. The
    # 100x-probe table (SCALE.md §24) showed rank_sum/ks_test at ~2.2-2.5s
    # warm — heavier than anything then benched; the rest are the
    # multi-stage dedup/similarity/sampling composites.
    "b11_rank_sum_test",
    "b11_ks_test",
    "b33_semantic_join",
    "b32_containment_pairs",
    "b32_triangle_count",
    "b32_near_dedup_e2e",
    "b31_containment_dedup",
    "b22_leakage_safe_split",
    "b22_leakage_safe_kfold",
    "b12_hll_sketch_rollup",
    # Round-9 widening additions worth timing (lsh_power_curve is
    # data-free and packing_efficiency rides the already-benched packing
    # window; streaming stays correctness-gated, not timed).
    "b32_degree_census",
    "b34_bpe_train_step",
    "b28_join_fanout",
    "b28_gain_chart",
    "b28_auc_exact",
    # Round-10 widening additions worth timing (index_planner is a 1-row
    # census + literal expansion; streaming late-drop stays
    # correctness-gated, not timed).
    "b28_pr_auc",
    "b33_matryoshka_recall",
    "b31_dedup_token_savings",
    "b34_vocab_overlap",
    "b35_linear_attribution",
    "b28_operating_points",
    "b11_weighted_percentiles",
    # Round-10 late-session widening — the perf-interesting slice (the
    # audits and bootstrap are sub-0.5s single-aggregate scans; timing
    # them would measure job overhead): iterative PageRank, the LM +
    # ntile perplexity bucketing, the URL canonicalizer + keep-best
    # window, the first-seen novelty joins, and the row-level quarantine
    # scan.
    "b32_pagerank",
    "b34_perplexity_rank",
    "b31_url_dedup",
    "b34_token_novelty",
    "b28_quarantine_split",
    "b34_keyword_pagerank",
    "b33_binary_hamming_topk",
    "b32_common_neighbors",
]

#: Large row-count results are executed through the NOOP SINK, not
#: collected — timing should measure the engine, not driver-side result
#: transfer. Round-12 honesty fix: these used to run ``df.count()``,
#: which lets Catalyst PRUNE any computed column the count doesn't need
#: — b33_semantic_join's entire min(struct(cosine)) aggregate (the
#: operator's actual work) was optimized out of the timed plan, so r10's
#: 9.42s (window form: count couldn't prune past the rank filter) vs
#: r11's 0.64s (aggregate form: count pruned the aggregate functions)
#: overstated that rewrite's win ~5x, and every COUNT_ONLY query with an
#: expensive prunable projection was under-measured.
#: ``write.format("noop")`` executes the COMPLETE plan (no pruning, no
#: transfer) — several r12 timings therefore rise vs their recorded r11
#: floors; those deltas are measurement corrections, not regressions
#: (SCALE.md §53).
COUNT_ONLY = {
    "b32_common_neighbors",
    "b28_quarantine_split",
    "b34_perplexity_rank",
    "b34_token_novelty",
    "b01_scan_project_filter",
    "b05_join_inner",
    "b17_window_rank",
    "b19_window_running_sum",
    "b23_string_funcs",
    "b25_math_conditional",
    "b27_array_funcs",
    "b30_script_zscore",
    "b32_jaccard_pairs",
    "b09_asof_join",
    "b11_time_rollup",
    "b34_tfidf",
    "b10_q2_min_cost_supplier",
    "b34_contamination",
    "b34_bigram_lm",
    "b22_hash_sample",
    "b34_full_pipeline",
    "b34_chunking",
    "b31_block_dedup",
    "b18_scd2_history",
    "b24_ohlc_bars",
    "b05_lateral_topn",
    "b34_lexical_diversity",
    "b22_token_budget_mix",
    "b05_semijoin_reduction",
    "b34_boilerplate_removal",
    "b34_skipgram_pairs",
    "b35_next_event_examples",
    "b34_gopher_quality",
    "b33_semantic_join",
    "b32_containment_pairs",
    "b32_near_dedup_e2e",
    "b31_containment_dedup",
    "b22_leakage_safe_split",
    "b22_leakage_safe_kfold",
}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # --isolate q1 [q2 ...]: time ONLY the named queries in this fresh JVM —
    # the methodology for separating suite-level contention (many queries
    # sharing one session's executors/caches) from genuine per-query
    # regression (VERDICT r5 task 3). Output format is unchanged.
    bench_queries = BENCH_QUERIES
    if len(sys.argv) > 1:
        # Any argument other than a well-formed --isolate is an error —
        # a typo'd flag must NOT silently fall back to the full suite
        # (that would reintroduce the contention the flag exists to
        # eliminate, with no sign anything went wrong).
        if sys.argv[1] != "--isolate":
            print(f"usage: bench.py [--isolate <query ...>]; "
                  f"unrecognized argument {sys.argv[1]!r}", file=sys.stderr)
            return 2
        bench_queries = sys.argv[2:]
        unknown = [n for n in bench_queries if n not in QUERIES]
        if not bench_queries or unknown:
            print(f"usage: bench.py --isolate <query ...>; unknown={unknown}",
                  file=sys.stderr)
            return 2
    spark = get_spark("bench")
    # Warm the JVM + parquet footers with a trivial action so per-query times
    # measure steady-state execution.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # 3 repeats (VERDICT r10 #5): min-of-2 let one co-tenant/GC hiccup
    # survive into the recorded floor — the three r10 "regressions"
    # (b34_skipgram_pairs, b35_funnel, b11_rank_sum_test) all re-measured
    # at or under their r9 floors in isolation. Min-of-3 keeps the floor
    # a property of the engine, not the neighborhood.
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in bench_queries:
        # A single broken query must never zero the whole suite (round 2's
        # BENCH file was empty because one AnalysisException aborted the
        # run) — record the failure and keep timing the rest.
        try:
            fn = QUERIES[name]
            runs: list[float] = []
            for _ in range(repeat):
                t0 = time.time()
                df = fn(spark, sf_dir)
                if name in COUNT_ONLY:
                    df.write.mode("overwrite").format("noop").save()
                else:
                    df.collect()
                runs.append(time.time() - t0)
            # min over repeats: measures the engine, not co-tenant noise/JIT.
            timings[name] = round(min(runs), 3)
            samples[name] = sorted(round(r, 3) for r in runs)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"[bench] {name} FAILED: {errors[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # Per-query spread for the 10 slowest (VERDICT r11 #8): min is the
    # engine floor; median exposes run-to-run variance so the next
    # regression triage can tell drift from noise WITHOUT re-running —
    # a min far below the median says the slot is noisy, not slower.
    import statistics

    spread = {
        n: {
            "min": timings[n],
            "median": round(statistics.median(samples[n]), 3),
        }
        for n in sorted(timings, key=timings.get, reverse=True)[:10]
    }
    payload = {
        "metric": "bench_suite_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread_slowest10": spread,
        "sf": sf_dir,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))
    # Durable full record (VERDICT r10 #8): the driver's BENCH_r{N}
    # artifact captures a bounded TAIL of stdout, which truncated the
    # first ~35 per-query timings in round 10 (the flagship's time was
    # unrecoverable). Write the COMPLETE payload to a file in the repo
    # so every round's full per-query map survives verbatim; --isolate
    # runs skip the write (they'd clobber the suite record).
    if bench_queries is BENCH_QUERIES:
        out = Path(__file__).resolve().parent / "BENCH_FULL.json"
        out.write_text(json.dumps(payload, indent=1) + "\n")
    # Truncation-proofing (VERDICT r9 #5): the full payload line grows
    # with the suite (~80 queries ≈ several KB) and the recording
    # harness captures a bounded TAIL of stdout — in round 9 the line's
    # HEAD (metric/value) fell outside the capture and the artifact
    # recorded "parsed": null. Emit a compact suite-total line LAST and
    # ALONE so the tail always ends with a complete, parseable record.
    # VERDICT r13 #2: the driver's round-over-round PERF comparator reads
    # ONLY this final line, so the per-query map must live INSIDE it —
    # `detail.per_query` (the map alone is ~2.5 KB, well within the tail
    # capture; metric/value/n_queries/n_errors keys unchanged, so the
    # parse contract is additions-only).
    compact = {
        "metric": "bench_suite_total_time",
        "value": total,
        "unit": "sec",
        "sf": sf_dir,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "detail": {"per_query": timings},
    }
    print(json.dumps(compact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
