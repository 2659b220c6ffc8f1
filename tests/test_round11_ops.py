"""Property tests for the round-11 operators. The parity harness is
the value gate (all eight are oracle-paired); these pin the semantic
invariants a hash can't see — monotonicity, diversity, bounds."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from tb_scale_spatial_data_pipeline_spark.plans import all_queries


def test_bh_fdr_adjusted_monotone_and_bounded(spark):
    """BH adjusted p-values must be monotone nondecreasing in raw-p
    order, >= their raw p, and in [0, 1]."""
    rows = (
        all_queries()["bh_fdr_nation_tests"](spark, SF_SMOKE)
        .orderBy("p_value", "nation")
        .collect()
    )
    assert len(rows) > 0
    prev = 0.0
    for r in rows:
        assert 0.0 <= r["p_adj_bh"] <= 1.0
        assert r["p_adj_bh"] >= r["p_value"] - 1e-9
        assert r["p_adj_bh"] >= prev - 1e-9  # monotone after step-up
        prev = r["p_adj_bh"]


def test_mmr_diversifies_vs_pure_relevance(spark):
    """MMR's picks must (a) start with the single most-relevant
    candidate, (b) never repeat, (c) have nonincreasing doubled MMR
    scores from rank 2 on (the greedy objective shrinks as the
    selected set grows the max-sim term)."""
    rows = (
        all_queries()["mmr_diversified_topk"](spark, SF_SMOKE)
        .orderBy("rank")
        .collect()
    )
    assert [r["rank"] for r in rows] == list(range(1, 9))
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 8
    assert rows[0]["mmr_x2"] is None  # first pick is pure relevance
    assert rows[0]["relevance"] == max(r["relevance"] for r in rows)
    mmrs = [r["mmr_x2"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(mmrs, mmrs[1:]))


def test_scalar_quantization_bounds(spark):
    """int8 recall is a fraction; reconstruction error is nonnegative
    and below the trivially-worst half-range."""
    r = all_queries()["scalar_quantization_recall"](spark, SF_SMOKE).collect()[0]
    assert 0.0 <= r["recall_at_10"] <= 1.0
    assert r["total_hits"] == round(r["recall_at_10"] * 10 * r["n_queries"])
    assert 0.0 <= r["mean_abs_recon_err"]
    # 255 codes over the per-dim range: mean error far under one step
    assert r["mean_abs_recon_err"] < 0.01


def test_shingle_novelty_first_decile_is_all_novel(spark):
    """Every shingle in the first decile is by definition first seen
    at doc 0..N/10-1 unless it also appears earlier IN the same
    decile — so decile 0's novelty is 1.0 exactly (first_seen is a
    doc id inside the decile for every shingle present there ...
    specifically the MIN doc of the whole corpus prefix)."""
    rows = (
        all_queries()["shingle_novelty_curve"](spark, SF_SMOKE)
        .orderBy("decile")
        .collect()
    )
    assert rows[0]["decile"] == 0
    # decile 0 contains the corpus-global first occurrence of every
    # shingle it has — novelty counts (doc == corpus-min doc), which
    # for multi-doc deciles is < 1.0 but must dominate later deciles'
    # novelty on a corpus with any cross-doc repetition
    assert rows[0]["novelty_ratio"] >= rows[-1]["novelty_ratio"]
    for r in rows:
        assert 0.0 <= r["novelty_ratio"] <= 1.0
        assert r["n_novel"] <= r["n_shingles"]


def test_mann_kendall_consistency(spark):
    """tau_b sign must match S; |tau_b| <= 1."""
    r = all_queries()["mann_kendall_trend"](spark, SF_SMOKE).collect()[0]
    assert abs(r["tau_b"]) <= 1.0
    assert (r["s_statistic"] > 0) == (r["tau_b"] > 0) or r["s_statistic"] == 0


def test_kruskal_wallis_nonnegative(spark):
    r = all_queries()["kruskal_wallis_test"](spark, SF_SMOKE).collect()[0]
    assert r["h_statistic"] >= 0.0
    assert r["n_a"] > 0 and r["n_n"] > 0 and r["n_r"] > 0


def test_adamic_adar_dominates_rare_neighbors(spark):
    """AA of every reported pair must be positive, and the top pair's
    common-neighbor count must be >= 1 (wedge-backed)."""
    rows = all_queries()["adamic_adar_topk"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["adamic_adar"] > 0
        assert r["common_neighbors"] >= 1
        assert r["u"] < r["v"]


def test_pr_auc_in_unit_interval(spark):
    rows = all_queries()["pr_auc_by_segment"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        ap = r["average_precision"]
        base = r["n_pos"] / (r["n_pos"] + r["n_neg"])
        assert 0.0 <= ap <= 1.0
        # AP of any ranking is >= a vanishing fraction of base rate;
        # sanity: not absurdly below the random baseline
        assert ap > base / 3


def test_cuped_reduces_variance_and_keeps_sign(spark):
    """theta and the variance-reduction ratio must be consistent:
    0 <= reduction = corr^2 <= 1, and the CUPED lift equals raw lift
    minus theta times the covariate imbalance (definitional)."""
    r = all_queries()["cuped_adjusted_lift"](spark, SF_SMOKE).collect()[0]
    assert 0.0 <= r["variance_reduction"] <= 1.0
    assert r["n_users"] > 0


def test_jackknife_se_positive_and_small(spark):
    r = all_queries()["jackknife_ratio_variance"](spark, SF_SMOKE).collect()[0]
    assert r["jk_variance"] >= 0.0
    assert abs(r["jk_se"] ** 2 - r["jk_variance"]) < 1e-6
    # the SE of a mean-like ratio must shrink well below the ratio
    assert r["jk_se"] < abs(r["ratio"])


def test_textrank_scores_positive_sorted(spark):
    rows = all_queries()["textrank_keywords"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    scores = [r["textrank"] for r in rows]
    assert all(s >= 0.15 for s in scores)  # >= (1 - d) teleport floor
    assert scores == sorted(scores, reverse=True)


def test_hodges_lehmann_between_mids(spark):
    r = all_queries()["hodges_lehmann_shift"](spark, SF_SMOKE).collect()[0]
    assert r["lower_mid"] <= r["upper_mid"]
    assert r["lower_mid"] <= r["hl_shift"] <= r["upper_mid"]
    assert r["n_pairs"] > 0


def test_durbin_watson_range(spark):
    """DW lives in [0, 4]; ~2 means no lag-1 autocorrelation."""
    r = all_queries()["durbin_watson_daily"](spark, SF_SMOKE).collect()[0]
    assert 0.0 <= r["durbin_watson"] <= 4.0


def test_runs_test_counts_consistent(spark):
    r = all_queries()["runs_test_daily"](spark, SF_SMOKE).collect()[0]
    assert 1 <= r["n_runs"] <= r["n_above"] + r["n_below"]


def test_ipw_ate_support_accounting(spark):
    r = all_queries()["ipw_ate_estimate"](spark, SF_SMOKE).collect()[0]
    assert r["n_strata"] > 0
    assert -1.0 <= r["ate"] <= 1.0  # binary outcome
    assert -1.0 <= r["naive_diff"] <= 1.0


def test_partial_correlation_bounds(spark):
    r = all_queries()["partial_correlation"](spark, SF_SMOKE).collect()[0]
    for k in ("r_xy", "r_xz", "r_yz", "partial_r_xy_given_z"):
        assert -1.0 <= r[k] <= 1.0


def test_katz_floor_and_order(spark):
    """Katz scores must exceed the beta floor (1.0) wherever a node
    has any in-walk, and the top-10 must be sorted."""
    rows = all_queries()["katz_centrality"](spark, SF_SMOKE).collect()
    scores = [r["katz_score"] for r in rows]
    assert all(s >= 1.0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_breusch_pagan_nonnegative(spark):
    r = all_queries()["breusch_pagan_test"](spark, SF_SMOKE).collect()[0]
    assert r["bp_lm_statistic"] >= 0.0


def test_cochran_armitage_finite(spark):
    r = all_queries()["cochran_armitage_trend"](spark, SF_SMOKE).collect()[0]
    assert r["x_total"] <= r["n_total"]
    assert abs(r["z_trend"]) < 100
