#!/usr/bin/env python
"""Headline benchmark: runs representative queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
one JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (full plan runs, nothing
collects to the driver), which measures engine time rather than
Arrow-to-pandas transfer.

Identical-code wall time on this box drifts ±20% between runs (42.5 s
vs 59.9 s observed across rounds), so single-pass numbers cannot
separate noise from regression. After one warm pass (JIT/codegen/
file-index caches), $SPARK_GRAFT_BENCH_REPEATS measured passes run
(default 3), INTERLEAVED (each pass covers every query, ambient load1
recorded at each pass boundary in pass_load1). Each query reports its
per-pass MEDIAN in "queries"/"value" (cross-round continuity with
r1-r12) and its per-pass MIN in "min_total"/"legacy35_min" — min is
load-robust, so CROSS-ROUND comparisons should use the min totals; set
SPARK_GRAFT_BENCH_SPREAD=1 to also print a min/median/max table per
query to stderr (stdout stays the single driver-contract JSON line).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tb_scale_spatial_data_pipeline_spark.plans import all_queries
from tb_scale_spatial_data_pipeline_spark.session import get_spark

# The cross-round comparable fields of the stdout contract line: NEVER
# shed, whatever the shedding rung (r15 dropped legacy35_total at the
# centisecond rung and the cross-round trend channel went dark for a
# round — VERDICT r15 item 5). Pinned by tests/test_bench_contract.py.
STABLE_FIELDS = (
    "metric",
    "value",
    "min_total",
    "legacy35_total",
    "legacy35_min",
    "queries",
    "sf",
)


def contract_line(payload: dict, timings: dict) -> str:
    """Shrink the contract JSON line into the driver's ~2000-char stdout
    tail window WITHOUT dropping the per-query map (VERDICT r14 item 2)
    or any STABLE_FIELDS scalar (VERDICT r15 item 5). Sheds precision
    first, then side fields; the full 3-dp spread always lives in
    BENCH_SPREAD.json."""
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1870:
        payload["queries"] = {n: round(t, 2) for n, t in timings.items()}
        payload.pop("repeats", None)
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1870:
        payload.pop("pass_load1", None)
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1870:
        payload["queries"] = {n: round(t, 1) for n, t in timings.items()}
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1870:  # last rung: integer centiseconds, map intact;
        # shed only non-comparable scalars (all live in BENCH_SPREAD.json)
        payload["queries_unit"] = "cs"
        payload["queries"] = {
            n: int(round(t * 100)) for n, t in timings.items()
        }
        for k in ("unit", "load1"):
            payload.pop(k, None)
        line = json.dumps(payload, separators=(",", ":"))
    return line


HEADLINE = [
    "pricing_summary",
    "grouped_median",
    "percentile_stretch",
    "argmax_composite",
    "dual_model_fallback",
    "broadcast_lookup",
    "grid_zip_join",
    "window_rank",
    "pixel_median_composite",
    "max_ndvi_composite",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_signatures",
    "cosine_topk",
    "lsh_ann_buckets",
    "tumbling_window",
    "sessionization",
    "asof_click_before_purchase",
    "ann_top1_in_bucket",
    "combo_model_inference",
    "q3_shipping_priority",
    "q5_local_supplier",
    "salted_skew_agg",
    "window_analytics",
    "exists_semi_priority",
    "correlated_avg_filter",
    "tfidf_topk",
    "dup_cluster_components",
    "clean_corpus_pipeline",
    "interval_join_click_purchase",
    "q9_profit_nation_year",
    "q10_returned_revenue",
    "q19_disjunctive_pred",
    "q22_anti_idle_customers",
    "stats_moments",
    # r10 additions: representatives of the post-r1 tiers (graph, OLAP,
    # raster, sketches, time series, streaming, sparse vectors) so
    # regressions are visible where the registry now lives. The
    # original 35 stay untouched for cross-round continuity.
    "rollup_revenue_margins",
    "ktruss_peeling",
    "betweenness_sampled",
    "raster_slope_aspect",
    "sparse_cosine_pairs",
    "holt_double_smoothing",
    "theta_sketch_intersection",
    "stream_ttl_dedup",
    # r11 additions: representatives of the round-11 tiers (word-graph
    # text analytics, embedding compression, multiple-testing stats).
    "textrank_keywords",
    "scalar_quantization_recall",
    "bh_fdr_nation_tests",
    # r13 additions: representatives of the round-12/13 tiers (spatial
    # statistics, concave geometry, spatial joins, exact-substring
    # dedup) so their scaling fixes stay visible round over round.
    "ripleys_k",
    "polygon_overlay_concave",
    "convex_hull_metrics",
    "nn_join_click_purchase",
    "polyline_simplify_dp",
    "duplicate_span_fraction",
    # r13 second wave: representatives of the DP-fold family, the
    # lockstep-iterative ML tier and the phrase/grams text tier.
    "dtw_profile_distance",
    "em_gaussian_mixture",
    "blocklist_phrase_filter",
    "kendall_tau_b",
    # r14 additions: representatives of the round-14 tiers (lockstep
    # Newton survival regression, Catalyst-fold sequential ratings,
    # iterative-doubling graph SCC, bounded-spine complexity stats,
    # rank statistics).
    "cox_ph_binary",
    "elo_brand_ratings",
    "brand_transition_scc",
    "sample_entropy",
    "wilcoxon_signed_rank",
    # r15 additions: representatives of the round-15 tiers (bounded-
    # spine pairwise statistics, window cross-moment time series,
    # market-share lattice economics, per-weekday seasonal tests).
    "siegel_repeated_median",
    "matrix_profile_motif",
    "herfindahl_concentration",
    "seasonal_mann_kendall",
    # r16 additions: representatives of the round-16 tiers (WL graph
    # refinement, irregular-sampling spectral analysis, exact-integer
    # pairwise drift statistics).
    "weisfeiler_leman_colors",
    "lomb_scargle_periodogram",
    "energy_distance_drift",
]
# cross-round comparisons of the headline total must use this prefix
# (the r1-r9 frozen set); the full list total includes the r10 tier
# additions and is NOT comparable to BENCH_r01..r09 values.
LEGACY_35 = 35


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    spark = get_spark("bench")
    # The driver records only the LAST 2000 chars of merged stdout+stderr;
    # WindowExec WARN spam (BENCH_r14 tail was 100% warnings + the JSON
    # line) competes with the contract line for that window. Silence it.
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    def run(name: str) -> float:
        t0 = time.time()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def load1_now() -> float | None:
        try:
            return round(os.getloadavg()[0], 1)
        except OSError:
            return None

    for name in HEADLINE:  # warm pass: JIT/codegen/file-index caches
        run(name)
    # Interleaved repeats (full pass over every query per repeat, not
    # N back-to-back runs of one query) with ambient load1 recorded at
    # each pass boundary: ambient-load spikes hit whole passes, so the
    # per-query MIN across interleaved passes is load-robust and is the
    # statistic cross-round comparisons should use (r12 verdict: the
    # same-session median band cannot adjudicate cross-round drift).
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    pass_load1: list[float | None] = []
    for _ in range(repeats):
        pass_load1.append(load1_now())
        for name in HEADLINE:
            samples[name].append(run(name))
    pass_load1.append(load1_now())

    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    min_timings = {n: round(min(s), 3) for n, s in samples.items()}
    if os.environ.get("SPARK_GRAFT_BENCH_SPREAD"):
        print(f"| query | min | median | max | spread (n={repeats}) |", file=sys.stderr)
        print("|---|---|---|---|---|", file=sys.stderr)
        for n, s in sorted(samples.items(), key=lambda kv: -statistics.median(kv[1])):
            lo, med, hi = min(s), statistics.median(s), max(s)
            rel = (hi - lo) / med if med else 0.0
            print(
                f"| {n} | {lo:.2f} | {med:.2f} | {hi:.2f} | {rel:.0%} |",
                file=sys.stderr,
            )

    total = round(sum(timings.values()), 3)
    min_total = round(sum(min_timings.values()), 3)
    # r1-r9 BENCH totals covered only the first 35 queries; report that
    # prefix separately so cross-round trend lines stay comparable
    legacy_total = round(sum(timings[n] for n in HEADLINE[:LEGACY_35]), 3)
    legacy_min = round(sum(min_timings[n] for n in HEADLINE[:LEGACY_35]), 3)
    # The driver records only the LAST 2000 chars of stdout (observed:
    # BENCH_r06 tail_len=2000, parsed=null because the r6 line carried
    # a per-query spread block and overflowed the window). The stdout
    # contract line therefore stays compact — timings only, ~1.2 KB for
    # 35 queries — and the {median,min,max} spread detail goes to a
    # side file + stderr instead.
    spread = {
        n: {
            "median": round(statistics.median(s), 3),
            "min": round(min(s), 3),
            "max": round(max(s), 3),
        }
        for n, s in samples.items()
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SPREAD.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "repeats": repeats,
                "sf": sf,
                "pass_load1": pass_load1,
                "query_spread": spread,
            },
            f,
            indent=1,
        )
    # load1 documents contention skew in the artifact itself (r7 ran
    # ~8% slow under a concurrent sweep); cross-round deltas should
    # use the *_min statistics (load-robust) and discount the medians
    # when pass_load1 >> the bench's own 32 cores of work.
    load1 = pass_load1[-1]
    payload = {
        "metric": "headline_query_total",
        "value": total,
        "unit": "sec",
        "min_total": min_total,
        "legacy35_total": legacy_total,
        "legacy35_min": legacy_min,
        "queries": timings,
        "repeats": repeats,
        "sf": sf,
        "load1": load1,
        "pass_load1": pass_load1,
    }
    sys.stdout.flush()
    print(contract_line(payload, timings), flush=True)


if __name__ == "__main__":
    main()
