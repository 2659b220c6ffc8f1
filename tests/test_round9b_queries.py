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


# ---------------------------------------------------------------------------
# HITS hubs & authorities


def test_hits_numpy_replay(spark):
    """Power-iteration replay with numpy, same rounding discipline."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    edges = sorted({(r["l_suppkey"], r["l_partkey"]) for r in li})
    sups = sorted({s for s, _ in edges})
    parts = sorted({p for _, p in edges})
    h = {s: round(1.0 / len(sups), 12) for s in sups}
    for _ in range(4):
        a_raw = {p: 0.0 for p in parts}
        for s, p in edges:
            a_raw[p] += h[s]
        a_raw = {p: round(v, 12) for p, v in a_raw.items()}
        sa = float(sum(a_raw.values()))
        a = {p: round(v / sa, 12) for p, v in a_raw.items()}
        h_raw = {s: 0.0 for s in sups}
        for s, p in edges:
            h_raw[s] += a[p]
        h_raw = {s: round(v, 12) for s, v in h_raw.items()}
        sh = float(sum(h_raw.values()))
        h = {s: round(v / sh, 12) for s, v in h_raw.items()}
    exp_a = sorted(
        ((round(v, 6), p) for p, v in a.items()), key=lambda t: (-t[0], t[1])
    )[:10]
    got = all_queries()["hits_hubs_authorities"](spark, SF_SMOKE).collect()
    got_a = [
        (r["score"], r["node"]) for r in got if r["kind"] == "authority"
    ]
    assert sorted(got_a, key=lambda t: (-t[0], t[1])) == exp_a
    # normalization: full authority vector sums to ~1
    assert abs(sum(a.values()) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# Temporal reachability


def test_temporal_reachability_replay_and_binding(spark):
    """Python replay of earliest-arrival propagation; the temporal
    constraint must BIND (fewer reached than static reachability)."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    contacts = sorted(
        {
            (
                r["l_suppkey"],
                r["l_partkey"],
                (r["l_shipdate"].date() - __import__("datetime").date(1970, 1, 1)).days,
            )
            for r in li
        }
    )
    seed_day = 10592
    inf = {s: seed_day for s, _, _ in contacts if s % 7 == 3}
    cont: dict = {}
    snaps = []
    for _ in range(3):
        for s, p, d in contacts:
            if s in inf and d >= inf[s]:
                cont[p] = min(cont.get(p, d), d)
        for s, p, d in contacts:
            if p in cont and d >= cont[p]:
                inf[s] = min(inf.get(s, d), d)
        snaps.append(
            (len(inf), len(cont), sum(inf.values()), sum(cont.values()))
        )
    got = sorted(
        all_queries()["temporal_reachability"](spark, SF_SMOKE).collect(),
        key=lambda r: r["round"],
    )
    for r, (ni, np_, si, sp) in zip(got, snaps):
        assert (r["n_infected"], r["n_parts"]) == (ni, np_)
        assert (r["sum_inf_day"], r["sum_part_day"]) == (si, sp)
    # non-vacuous: spread beyond the seeds
    n_seeds = len({s for s, _, _ in contacts if s % 7 == 3})
    assert got[-1]["n_infected"] > n_seeds
    # the temporal constraint binds: static (ignore-time) reachability
    # over shared parts reaches MORE suppliers than time-respecting
    static = {s for s, _, _ in contacts if s % 7 == 3}
    for _ in range(3):
        ps = {p for s, p, _ in contacts if s in static}
        static |= {s for s, p, _ in contacts if p in ps}
    assert got[-1]["n_infected"] < len(static) or len(static) == len(
        {s for s, _, _ in contacts}
    )


# ---------------------------------------------------------------------------
# BOM critical path


def test_bom_critical_path_replay(spark):
    """Pure-Python longest-path replay over the partkey heap DAG."""
    part_max = (
        spark.read.parquet(f"{SF_SMOKE}/part.parquet")
        .agg({"p_partkey": "max"})
        .collect()[0][0]
    )
    got = {
        r["root"]: r
        for r in all_queries()["bom_critical_path"](spark, SF_SMOKE).collect()
    }
    for root in (1, 2, 3, 4):
        best_cost, best_node, max_depth, n_nodes = 0, root, 0, 0
        frontier = [(root, 0, 0)]
        while frontier:
            nxt = []
            for node, cost, depth in frontier:
                n_nodes += 1
                if cost > best_cost or (cost == best_cost and node < best_node):
                    best_cost, best_node = cost, node
                max_depth = max(max_depth, depth)
                for ch in (2 * node, 2 * node + 1):
                    if ch <= part_max:
                        nxt.append((ch, cost + ch % 7 + 1, depth + 1))
            frontier = nxt
        r = got[root]
        assert (r["crit_cost"], r["crit_node"]) == (best_cost, best_node)
        assert (r["max_depth"], r["n_nodes"]) == (max_depth, n_nodes)


# ---------------------------------------------------------------------------
# Morphological opening


def test_morphology_open_properties(spark):
    """Opening is anti-extensive (opened <= v) and the top-hat is the
    exact difference; the disk interior (flat +80 plateau wider than
    the structuring element) must survive opening unchanged."""
    rows = all_queries()["raster_morphology_open"](spark, SF_SMOKE).collect()
    import math

    assert len(rows) == 4096
    for r in rows:
        assert r["tophat"] >= -1e-12
    # plateau center: field at (35, 30) ± structuring element stays in
    # the disk, so erosion then dilation restores the original value
    center = {(r["x"], r["y"]): r for r in rows}[(35, 30)]
    v = round(
        math.sin(35 / 10.0) * 40.0 + math.cos(30 / 12.0) * 40.0 + 100.0 + 80.0,
        6,
    )
    assert abs(center["opened"] - v) < 2e-6 and abs(center["tophat"]) < 1e-9


def test_morphology_open_tile_origin_invariance(spark):
    """Core outputs must not depend on the tile grid (halo contract)."""
    from tb_scale_spatial_data_pipeline_spark.raster.kernels import (
        morphology_open_tiles,
    )
    from tb_scale_spatial_data_pipeline_spark.raster.tiles import (
        halo_duplicate,
        synthetic_raster,
    )

    img = synthetic_raster(spark, 48, 48, bands=1)
    a = {
        (r["x"], r["y"]): (r["opened"], r["tophat"])
        for r in morphology_open_tiles(
            halo_duplicate(img, tile_size=24, halo=2), "b1"
        ).collect()
    }
    b = {
        (r["x"], r["y"]): (r["opened"], r["tophat"])
        for r in morphology_open_tiles(
            halo_duplicate(img, tile_size=16, halo=2), "b1"
        ).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# Matryoshka truncation audit


def test_matryoshka_recall_monotone_and_nonvacuous(spark):
    """More prefix dims can only help (on average over the fixed query
    set this fixture yields strict separation), and the smallest
    prefix must NOT saturate — a flat-1.0 report proves nothing."""
    rows = sorted(
        all_queries()["matryoshka_truncation_audit"](
            spark, SF_SMOKE
        ).collect(),
        key=lambda r: r["prefix_dim"],
    )
    assert [r["prefix_dim"] for r in rows] == [8, 16, 32]
    recalls = [r["recall_at_10"] for r in rows]
    assert recalls[0] < 1.0
    assert all(a <= b + 1e-12 for a, b in zip(recalls, recalls[1:]))
    for r in rows:
        assert 0 <= r["total_hits"] <= 10 * r["n_queries"]


# ---------------------------------------------------------------------------
# Exact Shapley attribution


def test_shapley_permutation_replay(spark):
    """Brute-force Shapley over all 4! channel permutations must equal
    the subset-weighted closed form; efficiency: Σφ = v(full) − v(∅)."""
    from itertools import permutations

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    firstp: dict = {}
    for r in ev:
        if r["event_type"] == "purchase":
            u = r["user_id"]
            if u not in firstp or r["ts"] < firstp[u]:
                firstp[u] = r["ts"]
    chans = sorted({r["event_type"] for r in ev if r["event_type"] != "purchase"})
    assert len(chans) == 4  # the hardcoded n!=24 weights assume this
    bit = {c: i for i, c in enumerate(chans)}
    masks: dict = {u: 0 for u in firstp}
    for r in ev:
        u = r["user_id"]
        if u in firstp and r["ts"] < firstp[u] and r["event_type"] != "purchase":
            masks[u] |= 1 << bit[r["event_type"]]

    def v(S: int) -> int:
        return sum(1 for m in masks.values() if m & S == m)

    phi = {c: 0.0 for c in chans}
    for perm in permutations(range(4)):
        S = 0
        for i in perm:
            phi[chans[i]] += v(S | (1 << i)) - v(S)
            S |= 1 << i
    got = {
        r["channel"]: r
        for r in all_queries()["shapley_attribution"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(chans)
    total = 0.0
    for c in chans:
        # phi accumulated over 24 permutations == phi_num (n!-units)
        assert got[c]["phi_num"] == round(phi[c])
        assert abs(got[c]["shapley_conversions"] - phi[c] / 24.0) < 1e-9
        total += got[c]["shapley_conversions"]
    assert abs(total - (v(15) - v(0))) < 1e-9
    assert any(got[c]["phi_num"] > 0 for c in chans)  # non-vacuous


# ---------------------------------------------------------------------------
# Spectral power iteration


def test_power_iteration_numpy_replay(spark):
    """Replay: same lattice covariance, same round(12) iteration —
    results must agree; the inf-norm eigenvalue estimate must be
    bounded by numpy's true top eigenvalue (Rayleigh bound)."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    X = np.array(
        [[round(float(x) * 1e6) for x in r["embedding"]] for r in emb],
        dtype=object,
    )
    n, d = X.shape
    s1 = X.sum(axis=0)
    cells = (X[:, :, None].astype(float) * X[:, None, :].astype(float)).sum(
        axis=0
    )
    cov = np.round(
        (cells - np.outer(s1.astype(float), s1.astype(float)) / n)
        / (n - 1)
        / 1e12,
        12,
    )
    v = np.full(d, 0.125)
    for _ in range(8):
        w = np.round(cov @ v, 12)
        m = np.abs(w).max()
        v = np.round(w / m, 12)
    order = sorted(range(d), key=lambda i: (-abs(round(v[i], 6)), i))[:10]
    exp = [(i + 1, round(v[i], 6)) for i in order]
    got = all_queries()["spectral_power_iteration"](spark, SF_SMOKE).collect()
    assert [(r["dim"], r["loading"]) for r in got] == exp
    lam1 = float(np.linalg.eigvalsh(cov.astype(float)).max())
    assert 0 < got[0]["eigval_est"] <= lam1 * 1.05


# ---------------------------------------------------------------------------
# FD audit


def test_fd_audit_separates_and_counts(spark):
    rows = {
        (r["tbl"], r["lhs"]): r
        for r in all_queries()["fd_audit"](spark, SF_SMOKE).collect()
    }
    # the genuine FD must hold; at least one candidate must fail
    assert rows[("nation", "n_nationkey")]["fd_holds"]
    assert not all(r["fd_holds"] for r in rows.values())
    for r in rows.values():
        assert r["n_pairs"] >= r["n_lhs"]
        assert r["extra_mappings"] == r["n_pairs"] - r["n_lhs"]
        assert r["fd_holds"] == (r["violating_lhs"] == 0)
    # replay one candidate directly
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()
    seen: dict = {}
    for c in cust:
        seen.setdefault(c["c_nationkey"], set()).add(c["c_mktsegment"])
    r = rows[("customer", "c_nationkey")]
    assert r["n_lhs"] == len(seen)
    assert r["n_pairs"] == sum(len(v) for v in seen.values())
    assert r["violating_lhs"] == sum(1 for v in seen.values() if len(v) > 1)
    # the part arm audits a REAL determinant (brand number → p_type),
    # not the trivial ∅→(brand,type) encoding it had before r10:
    # n_lhs must be the distinct brand-number count, and the FD must
    # genuinely fail (each brand carries many types).
    import re

    parts = spark.read.parquet(f"{SF_SMOKE}/part.parquet").collect()
    bmap: dict = {}
    for p in parts:
        bmap.setdefault(
            int(re.search(r"([0-9]+)", p["p_brand"]).group(1)), set()
        ).add(p["p_type"])
    rp = rows[("part", "p_brand")]
    assert rp["n_lhs"] == len(bmap) > 1
    assert rp["n_pairs"] == sum(len(v) for v in bmap.values())
    assert not rp["fd_holds"]


# ---------------------------------------------------------------------------
# Streaming lateness audit


def test_late_drop_audit_drops_and_seals(spark):
    """The audit must be NON-VACUOUS: the two-batch-late cohort loses
    rows (some n_late_dropped > 0), one-batch-late merges keep other
    windows complete, and the unsealed tail is withheld (fewer
    emitted windows than total windows)."""
    rows = all_queries()["stream_late_drop_audit"](spark, SF_SMOKE).collect()
    assert rows, "no sealed windows emitted"
    dropped = [r for r in rows if r["n_late_dropped"] > 0]
    complete = [r for r in rows if r["n_late_dropped"] == 0]
    assert dropped, "late dropping never happened — audit is vacuous"
    assert complete, "every window lost rows — staging is wrong"
    for r in rows:
        assert 0 <= r["n_admitted"] <= r["n_total"]
    total_windows = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .selectExpr("window(ts, '10 minutes') AS w")
        .distinct()
        .count()
    )
    assert len(rows) < total_windows  # unsealed tail withheld
