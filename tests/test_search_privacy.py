"""Semantic tests for inverted-index conjunctive search and the
Laplace DP release: replay in pandas / check mechanism properties."""

from __future__ import annotations

import math
import re

import pandas as pd

from conftest import SF_SMOKE


def test_inverted_search_replay(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.text_queries import (
        _SEARCH_TERMS,
        QUERIES,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    n = float(len(docs))
    toks = {
        r.doc_id: re.split(r"[^a-z0-9]+", r.text.lower())
        for r in docs.itertuples()
    }
    df = {
        x: sum(1 for ts in toks.values() if x in ts) for x in _SEARCH_TERMS
    }
    scored = []
    for doc_id, ts in toks.items():
        tf = {x: ts.count(x) for x in _SEARCH_TERMS}
        if all(tf[x] > 0 for x in _SEARCH_TERMS):
            s = 0.0
            for x in _SEARCH_TERMS:  # same fixed accumulation order
                s += tf[x] * math.log(n / df[x])
            scored.append((doc_id, round(s, 6)))
    scored.sort(key=lambda p: (-p[1], p[0]))
    expected = scored[:20]

    got = [
        (r.doc_id, r.score)
        for r in QUERIES["inverted_index_search"](spark, SF_SMOKE).collect()
    ]
    assert got == expected
    assert len(got) == 20


def test_dp_noise_properties(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.quality_queries import (
        _DP_B,
        QUERIES,
    )

    rows = QUERIES["dp_noisy_counts"](spark, SF_SMOKE).collect()
    noises = [r.noisy_count - r.true_count for r in rows]
    # noise actually perturbs (not the identity release) ...
    assert sum(1 for z in noises if abs(z) > 1e-9) > len(noises) * 0.9
    # ... is two-sided ...
    assert any(z > 0 for z in noises) and any(z < 0 for z in noises)
    # ... and its spread is in the right ballpark for Laplace(b):
    # mean |noise| = b; allow a generous band for ~100 draws.
    mean_abs = sum(abs(z) for z in noises) / len(noises)
    assert 0.3 * _DP_B < mean_abs < 3.0 * _DP_B
    # determinism: same release on re-run (md5-seeded, not RNG)
    again = QUERIES["dp_noisy_counts"](spark, SF_SMOKE).collect()
    assert rows == again


def test_bpe_merges_match_reference_algorithm(spark):
    """Replay Sennrich-style BPE training in pure Python on the same
    word-type counts and compare the learned merge table."""
    import collections

    from tb_scale_spatial_data_pipeline_spark.plans.lm_queries import (
        _BPE_MERGES,
        QUERIES,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    words = collections.Counter()
    for text in docs.text:
        for w in re.split(r"[^a-z0-9]+", text.lower()):
            if w:
                words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}

    expected = []
    for rnd in range(1, _BPE_MERGES + 1):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        (lft, rgt), pc = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rnd, lft, rgt, pc))
        merged = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lft and syms[i + 1] == rgt:
                    out.append(lft + rgt)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + c
        vocab = merged

    got = [
        (r.merge_round, r.lft, r.rgt, r.pair_count)
        for r in QUERIES["bpe_merge_train"](spark, SF_SMOKE).collect()
    ]
    assert got == expected
    # nonvacuity: a later merge must build on an earlier merged symbol
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _ in got[1:])


def test_hll_merge_equals_direct(spark):
    """The MERGED row must equal an HLL built directly on all events —
    register max is associative, so folding per-type sketches loses
    nothing. Replayed with python md5 registers."""
    import hashlib
    import math

    from tb_scale_spatial_data_pipeline_spark.plans.sketch_queries import (
        _HLL_M,
        QUERIES,
    )

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    regs = [0] * _HLL_M
    for uid in ev.user_id:
        h = hashlib.md5(str(uid).encode()).hexdigest()
        bucket = int(h[:2], 16)
        w = int(h[2:12], 16)
        rho = 41 if w == 0 else 41 - w.bit_length()
        regs[bucket] = max(regs[bucket], rho)
    used = sum(1 for m in regs if m > 0)
    s_used = sum(1 << (41 - m) for m in regs if m > 0)
    two41 = 2199023255552.0
    e_raw = (
        0.7213 / (1.0 + 1.079 / _HLL_M) * _HLL_M * _HLL_M * two41
        / (s_used + (_HLL_M - used) * int(two41))
    )
    if e_raw <= 2.5 * _HLL_M and used < _HLL_M:
        e_raw = _HLL_M * math.log(_HLL_M / (_HLL_M - used))
    expected = round(e_raw, 4)

    rows = {r.event_type: r for r in QUERIES["hll_groupwise_merge"](spark, SF_SMOKE).collect()}
    assert rows["ALL"].hll_estimate == expected
    assert rows["ALL"].exact_distinct == ev.user_id.nunique()


def test_range_planner_invariants(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.maintenance_queries import (
        _PLAN_BINS,
        QUERIES,
    )

    rows = sorted(
        QUERIES["range_partition_planner"](spark, SF_SMOKE).collect(),
        key=lambda r: r.bin,
    )
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    assert len(rows) == _PLAN_BINS
    assert sum(r.n_rows for r in rows) == len(li)
    counts = [r.n_rows for r in rows]
    assert max(counts) - min(counts) <= 1  # ntile balance contract
    for a, b in zip(rows, rows[1:]):
        assert a.range_hi <= b.range_lo  # ranges are ordered, non-overlapping


def test_incremental_dedup_contract(spark):
    import hashlib

    from tb_scale_spatial_data_pipeline_spark.plans.corpus_queries import QUERIES

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    half = (docs.doc_id.max() + 1) // 2
    fp = {
        r.doc_id: hashlib.md5(r.text[:40].encode()).hexdigest()
        for r in docs.itertuples()
    }
    base = {fp[d] for d in fp if d < half}
    survivors = QUERIES["incremental_dedup_ingest"](spark, SF_SMOKE).collect()
    got = {r.doc_id: r.fingerprint for r in survivors}
    # survivors: unique fingerprints, none known to base, all incoming
    assert len(set(got.values())) == len(got)
    assert not (set(got.values()) & base)
    assert all(d >= half for d in got)
    # completeness: an incoming doc is excluded iff base-dup or a
    # smaller incoming doc shares its fingerprint
    seen: dict[str, int] = {}
    expected = {}
    for d in sorted(k for k in fp if k >= half):
        f = fp[d]
        if f not in base and f not in seen:
            expected[d] = f
        seen.setdefault(f, d)
    assert got == expected
    assert len(expected) < len([d for d in fp if d >= half])  # filter fired


def test_dd_sketch_bounds(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.sketch_queries import QUERIES

    rows = QUERIES["dd_quantile_sketch"](spark, SF_SMOKE).collect()
    assert {r.pct for r in rows} == {50, 90, 99}
    for r in rows:
        # one-sided overestimate, bounded by the bucket width:
        # consecutive upper bounds ratio is at most 5/4 (m=0 bucket)
        assert r.sketch_ub >= r.exact_q
        assert 0.0 <= r.rel_slack <= 0.25


def test_theil_sen_replay(spark):
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.plans.stats_queries import QUERIES

    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    orders["midx"] = orders.o_orderdate.dt.year * 12 + orders.o_orderdate.dt.month
    monthly = (
        orders.assign(tp=orders.o_totalprice.round(2))
        .groupby("midx")
        .tp.sum()
        .round(2)
        .sort_index()
    )
    ms, revs = monthly.index.to_numpy(), monthly.to_numpy()
    slopes = [
        (revs[j] - revs[i]) / (ms[j] - ms[i])
        for i in range(len(ms))
        for j in range(i + 1, len(ms))
    ]
    row = QUERIES["theil_sen_trend"](spark, SF_SMOKE).collect()[0]
    assert row.n_months == len(ms)
    assert row.n_pairs == len(slopes)
    assert abs(row.theil_sen_slope - round(float(np.median(slopes)), 6)) < 1e-6


def test_psi_report_properties(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.quality_queries import (
        _PSI_BINS,
        QUERIES,
    )

    rows = QUERIES["psi_drift_report"](spark, SF_SMOKE).collect()
    assert len(rows) == _PSI_BINS
    # each PSI term is non-negative (same-sign product by construction)
    assert all(r.psi_contribution >= 0 for r in rows)
    # reference deciles are balanced; both halves fully assigned
    ref = [r.n_ref for r in rows]
    assert max(ref) - min(ref) <= 1
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    assert sum(r.n_ref + r.n_cur for r in rows) == len(orders)


def test_silhouette_report_bounds(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.mlprep_queries import QUERIES

    rows = QUERIES["cluster_silhouette_report"](spark, SF_SMOKE).collect()
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    assert {r.label for r in rows} == set(emb.label.unique())
    counts = emb.label.value_counts().to_dict()
    for r in rows:
        assert r.n_points == counts[r.label]
        assert -1.0 <= r.mean_silhouette <= 1.0


def test_woe_iv_replay(spark):
    import math

    from tb_scale_spatial_data_pipeline_spark.plans.mlprep_queries import QUERIES

    rows = sorted(
        QUERIES["woe_iv_binning"](spark, SF_SMOKE).collect(), key=lambda r: r.bin
    )
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    assert sum(r.n_good + r.n_bad for r in rows) == len(orders)
    tg = sum(r.n_good for r in rows)
    tb = sum(r.n_bad for r in rows)
    for r in rows:
        gs, bs = r.n_good / tg, r.n_bad / tb
        assert r.woe == round(math.log(gs / bs), 6)
        assert r.iv_term == round((gs - bs) * math.log(gs / bs), 6)
        assert r.iv_term >= 0  # same-sign product


def test_kfold_balance(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.mlprep_queries import (
        _CV_FOLDS,
        QUERIES,
    )

    rows = QUERIES["kfold_assignment_audit"](spark, SF_SMOKE).collect()
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    assert {r.fold for r in rows} == set(range(_CV_FOLDS))
    assert sum(r.n_rows for r in rows) == len(orders)
    ideal = len(orders) / _CV_FOLDS
    for r in rows:
        assert 0.8 * ideal < r.n_rows < 1.2 * ideal


def test_neyman_allocation_replay(spark):
    import math

    from tb_scale_spatial_data_pipeline_spark.plans.sampling_queries import (
        _NEYMAN_BUDGET,
        QUERIES,
    )

    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    g = orders.assign(v=orders.o_totalprice.round(2)).groupby("o_orderpriority").v
    nhsh = {}
    for k, s in g:
        nhsh[k] = len(s) * s.std(ddof=1)
    z = sum(nhsh[k] for k in sorted(nhsh))
    rows = QUERIES["neyman_allocation"](spark, SF_SMOKE).collect()
    for r in rows:
        assert abs(r.alloc_share - nhsh[r.stratum] / z) < 2e-6
    # shares form a distribution; allocation spends ~the budget
    assert abs(sum(r.alloc_share for r in rows) - 1.0) < 1e-5
    assert abs(sum(r.alloc_n for r in rows) - _NEYMAN_BUDGET) <= len(rows)


def test_burstiness_bounds_and_replay(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.event_queries import QUERIES

    rows = QUERIES["interarrival_burstiness"](spark, SF_SMOKE).collect()
    assert rows
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    for r in rows:
        assert -1.0 <= r.burstiness <= 1.0
        g = ev[ev.user_id == r.user_id].sort_values(["ts", "event_id"])
        # parquet timestamps are datetime64[us]: int64 view is µs
        gaps_ms = (g.ts.astype("datetime64[us]").astype("int64") // 10**3).diff().dropna()
        assert r.n_gaps == len(gaps_ms)
        assert abs(r.mean_gap_s - round(gaps_ms.mean() / 1000.0, 6)) < 1e-5


def test_trimmed_winsorized_bracketing(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.stats_queries import QUERIES

    row = QUERIES["trimmed_winsorized_stats"](spark, SF_SMOKE).collect()[0]
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    v = orders.o_totalprice.round(2)
    # ~90% kept
    assert abs(row.n_kept / row.n_total - 0.9) < 0.02
    # right-skewed data: robust centers sit below the raw mean, above
    # the median
    assert row.trimmed_mean < v.mean()
    assert row.winsorized_mean < v.mean()
    assert row.trimmed_mean > v.median() * 0.8


def test_bpe_encode_compresses(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.lm_queries import QUERIES

    rows = QUERIES["bpe_encode_corpus"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # merges can only shrink the symbol stream, chars upper-bound it
        assert r.bpe_tokens <= r.char_tokens
        assert r.compression >= 1.0
        assert r.n_words <= r.bpe_tokens  # a word is >= 1 symbol
    # 8 merges on this corpus must actually fire
    assert any(r.compression > 1.2 for r in rows)


def test_sorted_neighborhood_candidate_bound(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.text_queries import (
        _SNM_MAXDIST,
        _SNM_WINDOW,
        QUERIES,
    )

    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    n = part.p_name.nunique()
    rows = QUERIES["sorted_neighborhood_pairs"](spark, SF_SMOKE).collect()
    # exact candidate bound: n*W pairs scanned, so at most that match
    assert len(rows) <= n * _SNM_WINDOW
    assert all(r.edit_dist <= _SNM_MAXDIST for r in rows)
    # every reported pair really is within W in the sorted order
    names = sorted(part.p_name.unique())
    pos = {nm: i for i, nm in enumerate(names)}
    for r in rows:
        assert 0 < abs(pos[r.name_a] - pos[r.name_b]) <= _SNM_WINDOW


def test_twap_vs_plain_avg(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.event_queries import QUERIES

    rows = QUERIES["time_weighted_average"](spark, SF_SMOKE).collect()
    assert rows
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    for r in rows[:5]:
        g = ev[ev.user_id == r.user_id].sort_values(["ts", "event_id"])
        ms = g.ts.astype("datetime64[us]").astype("int64") // 10**3
        dwell = ms.diff().shift(-1).dropna()
        vals = g.value.round(2).iloc[:-1]
        expect = (vals.to_numpy() * dwell.to_numpy()).sum() / dwell.sum()
        assert abs(r.twap - round(expect, 6)) < 1e-5
        assert r.n_intervals == len(dwell)
    # twap differs from the plain mean somewhere (it corrects for dwell)
    assert any(abs(r.twap - r.plain_avg) > 1e-3 for r in rows)


def test_interval_union_replay(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.event_queries import (
        _COVER_MS,
        QUERIES,
    )

    rows = {r.user_id: r for r in QUERIES["interval_union_coverage"](spark, SF_SMOKE).collect()}
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    for uid, g in ev.groupby("user_id"):
        starts = sorted(g.ts.astype("datetime64[us]").astype("int64") // 10**3)
        islands, cov, cur_s, cur_e = 0, 0, None, None
        for s in starts:
            e = s + _COVER_MS
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    cov += cur_e - cur_s
                islands += 1
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        cov += cur_e - cur_s
        assert rows[uid].n_islands == islands
        assert rows[uid].covered_ms == cov


def test_rfm_scores_consistent(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.analytics_queries import (
        QUERIES,
    )

    rows = QUERIES["rfm_segmentation"](spark, SF_SMOKE).collect()
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    assert len(rows) == orders.o_custkey.nunique()
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.segment == f"{r.r_score}{r.f_score}{r.m_score}"
    # monotonicity spot check: the most recent customer cannot score 1
    best = min(rows, key=lambda r: (r.recency_days, r.custkey))
    assert best.r_score >= 4


def test_jl_distortion_concentrates(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.vector_queries import (
        QUERIES,
    )

    rows = QUERIES["jl_projection_distortion"](spark, SF_SMOKE).collect()
    assert rows
    ds = [r.distortion for r in rows]
    # JL with k=8: distortion concentrates around 1 with heavy-ish
    # tails; the median must land near 1 and nothing collapses to 0
    med = sorted(ds)[len(ds) // 2]
    assert 0.5 < med < 2.0
    assert min(ds) > 0.05


def test_bot_score_components(spark):
    import math

    from tb_scale_spatial_data_pipeline_spark.plans.quality_queries import (
        _BOT_CV_FLOOR,
        _BOT_ENTROPY_FLOOR,
        _BOT_RATE_PER_HR,
        QUERIES,
    )

    rows = QUERIES["bot_detection_score"](spark, SF_SMOKE).collect()
    assert rows
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    for r in rows:
        flags = (
            int(r.events_per_hr > _BOT_RATE_PER_HR)
            + int(r.gap_cv < _BOT_CV_FLOOR)
            + int(r.type_entropy < _BOT_ENTROPY_FLOOR)
        )
        assert r.bot_score == flags
        assert 0 <= r.bot_score <= 3
        # entropy replay for this user
        c = ev[ev.user_id == r.user_id].event_type.value_counts()
        sh = c / c.sum()
        ent = 0.0
        for k in sorted(sh.index):
            ent += -sh[k] * math.log(sh[k])
        assert abs(r.type_entropy - round(ent, 6)) < 1e-6
    # synthetic human traffic: mixed types -> high entropy, no 3-flag bots
    assert all(r.bot_score < 3 for r in rows)


def test_class_balance_downsample_contract(spark):
    import hashlib

    from tb_scale_spatial_data_pipeline_spark.plans.sampling_queries import (
        QUERIES,
    )

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    target = emb.label.value_counts().min()
    rows = QUERIES["class_balance_downsample"](spark, SF_SMOKE).collect()
    assert len(rows) == emb.label.nunique()
    for r in rows:
        assert r.n_kept == target  # balanced by construction
        ids = sorted(
            emb[emb.label == r.label].vec_id,
            key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v),
        )[:target]
        assert r.sum_kept_ids == sum(ids)
        assert r.min_kept_id == min(ids) and r.max_kept_id == max(ids)


def test_freshness_report_shape(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.maintenance_queries import (
        QUERIES,
    )

    rows = QUERIES["freshness_sla_report"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    assert min(r.staleness_ms for r in rows) == 0  # the watermark stream
    assert all(r.staleness_ms >= 0 for r in rows)


def test_embedding_dim_stats_replay(spark):
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.plans.vector_queries import (
        QUERIES,
    )

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    mat = np.round(
        np.stack(emb.embedding.to_numpy()).astype("float64") * 1e6
    ).astype("int64")
    rows = QUERIES["embedding_dimension_stats"](spark, SF_SMOKE).collect()
    assert len(rows) == mat.shape[1]
    for r in rows:
        col = mat[:, r.dim - 1]
        assert r.n == len(col)
        # engines round half away from zero; python round() is
        # banker's — compare within half an ulp of the 6th decimal
        assert abs(r.mean_v - col.sum() / len(col) / 1e6) <= 5.1e-7
        assert r.min_v == round(float(col.min()) / 1e6, 6)
        assert r.max_v == round(float(col.max()) / 1e6, 6)


def test_lift_consistency(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.analytics_queries import (
        QUERIES,
    )

    rows = QUERIES["cooccurrence_lift_significance"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows[:50]:
        assert r.lift > 0 and r.chi2 >= 0
    # lift > 1 somewhere: real co-purchase affinity exists
    assert any(r.lift > 1 for r in rows)


def test_zipf_slope_negative(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.text_queries import (
        QUERIES,
    )

    row = QUERIES["zipf_fit_vocab"](spark, SF_SMOKE).collect()[0]
    # frequency decreases with rank: slope strictly negative; the
    # synthetic corpus is flatter than natural text (slope > -1)
    assert row.zipf_slope < 0
    assert row.n_terms > 20  # synthetic vocab is ~31 types


def test_elasticity_replay(spark):
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.plans.revenue_queries import (
        QUERIES,
    )

    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")[["p_partkey", "p_brand"]]
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    rows = {r.brand: r for r in QUERIES["discount_elasticity_by_brand"](spark, SF_SMOKE).collect()}
    for brand, g in j.groupby("p_brand"):
        x = g.l_discount.round(2).to_numpy()
        y = g.l_quantity.round(2).to_numpy()
        n = len(x)
        slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
            n * (x * x).sum() - x.sum() ** 2
        )
        assert rows[brand].n_lines == n
        assert abs(rows[brand].qty_per_discount_slope - slope) < 1e-4


def test_ship_latency_shape(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.revenue_queries import (
        QUERIES,
    )

    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    rows = QUERIES["ship_latency_percentiles"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    assert sum(r.n_lines for r in rows) == len(li)
    for r in rows:
        assert r.p50_days <= r.p90_days <= r.p99_days


def test_confusion_matrix_consistency(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.mlprep_queries import (
        QUERIES,
    )

    rows = QUERIES["centroid_confusion_matrix"](spark, SF_SMOKE).collect()
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    # every point assigned exactly once
    assert sum(r.n for r in rows) == len(emb)
    # diagonal dominates: a label's own centroid wins more often than
    # any single other centroid (labels are real clusters)
    by_true: dict[int, dict[int, int]] = {}
    for r in rows:
        by_true.setdefault(r.true_label, {})[r.assigned_label] = r.n
    diag_dominant = sum(
        1
        for t, d in by_true.items()
        if d.get(t, 0) == max(d.values())
    )
    assert diag_dominant >= len(by_true) // 2
