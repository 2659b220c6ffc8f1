"""Independent replays + invariants for the round-9 second-batch
queries (isotonic calibration, rank-statistic AUC, and later
additions in this session). Oracle parity pins cross-engine hashes;
these pin the math against pure-Python reimplementations.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from conftest import SF_SMOKE

from tb_scale_spatial_data_pipeline_spark.plans import all_queries


# ---------------------------------------------------------------------------
# Isotonic PAV calibration


def _minimax_isotonic(n: np.ndarray, sy: np.ndarray) -> np.ndarray:
    """O(B^3) direct minimax fit: fit_i = max_{j<=i} min_{k>=i}
    mean(j..k) — the textbook characterization, independent of the
    stack-based PAV in the query."""
    b = len(n)
    fit = np.zeros(b)
    for i in range(b):
        best = -np.inf
        for j in range(i + 1):
            worst = np.inf
            for k in range(i, b):
                m = sy[j : k + 1].sum() / n[j : k + 1].sum()
                worst = min(worst, m)
            best = max(best, worst)
        fit[i] = best
    return fit


def test_isotonic_pav_matches_minimax(spark):
    rows = sorted(
        all_queries()["isotonic_pav_calibration"](spark, SF_SMOKE).collect(),
        key=lambda r: r["bin"],
    )
    n = np.array([r["n"] for r in rows], dtype=float)
    sy = np.array([round(r["raw_rate"] * r["n"]) for r in rows], dtype=float)
    ref = _minimax_isotonic(n, sy)
    got = np.array([r["iso_rate"] for r in rows])
    assert np.allclose(got, ref, rtol=0, atol=1e-12)


def test_isotonic_fit_monotone_and_mass_preserving(spark):
    rows = sorted(
        all_queries()["isotonic_pav_calibration"](spark, SF_SMOKE).collect(),
        key=lambda r: r["bin"],
    )
    fits = [r["iso_rate"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(fits, fits[1:]))
    # PAV preserves the weighted total: sum n_i * fit_i == sum y
    total_fit = sum(r["n"] * r["iso_rate"] for r in rows)
    total_y = sum(r["n"] * r["raw_rate"] for r in rows)
    assert abs(total_fit - total_y) < 1e-6


# ---------------------------------------------------------------------------
# ROC AUC by segment


def test_roc_auc_pairwise_replay(spark):
    """AUC == P(score_pos > score_neg) + 0.5 P(tie), by brute-force
    pairwise counting per segment."""
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()
    }
    by_seg = defaultdict(lambda: ([], []))  # seg -> (pos scores, neg scores)
    for o in orders:
        seg = cust.get(o["o_custkey"])
        if seg is None:
            continue
        y = o["o_orderpriority"] in ("1-URGENT", "2-HIGH")
        by_seg[seg][0 if y else 1].append(o["o_totalprice"])
    expect = {}
    for seg, (pos, neg) in by_seg.items():
        wins = ties = 0
        for p in pos:
            for q in neg:
                if p > q:
                    wins += 1
                elif p == q:
                    ties += 1
        expect[seg] = (wins + 0.5 * ties) / (len(pos) * len(neg))
    got = {
        r["segment"]: r for r in all_queries()["roc_auc_by_segment"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(got) == set(expect)
    for seg, r in got.items():
        assert abs(r["auc"] - expect[seg]) < 1e-12
        assert r["n_pos"] == len(by_seg[seg][0])
        assert r["n_neg"] == len(by_seg[seg][1])
