"""Kaplan-Meier estimator invariants (r13): step-function shape and
agreement with a from-scratch per-cohort recomputation over the raw
user lifetimes (independent of the engine's window/array machinery)."""

from __future__ import annotations

from collections import defaultdict

from conftest import SF_SMOKE

from tb_scale_spatial_data_pipeline_spark.plans.analytics_queries import (
    QUERIES,
)


def test_kaplan_meier_matches_bruteforce(spark):
    rows = QUERIES["kaplan_meier_survival"](spark, SF_SMOKE).collect()
    assert rows
    # recompute user lifetimes with plain SQL-free logic
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .selectExpr(
            "user_id",
            "cast(ts as timestamp) tss",
            "event_type",
            "cast(floor(unix_micros(cast(ts as timestamp)) / 1000) as long) tms",
        )
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    lifetimes = {}
    for uid, rs in by_user.items():
        last_ms = max(r["tms"] for r in rs)
        t = (
            max(r["tss"] for r in rs).date()
            - min(r["tss"] for r in rs).date()
        ).days
        censored = any(
            r["event_type"] == "purchase" and r["tms"] >= last_ms - 259200000
            for r in rs
        )
        lifetimes[uid] = (uid % 4, t, 0 if censored else 1)

    for cohort in sorted({c for c, _, _ in lifetimes.values()}):
        us = [(t, d) for c, t, d in lifetimes.values() if c == cohort]
        times = sorted({t for t, d in us if d == 1})
        surv = 1.0
        expect = []
        for et in times:
            n_risk = sum(1 for t, _ in us if t >= et)
            d = sum(1 for t, dd in us if t == et and dd == 1)
            surv *= 1.0 - d / n_risk
            expect.append((et, n_risk, d, surv))
        got = sorted(
            (r["t"], r["n_risk"], r["n_events"], r["km"])
            for r in rows
            if r["cohort"] == cohort
        )
        assert len(got) == len(expect)
        for (gt, gn, gd, gkm), (et, en, ed, es) in zip(got, expect):
            assert (gt, gn, gd) == (et, en, ed)
            assert abs(gkm - es) < 1e-9
        # survival is non-increasing and in (0, 1]
        kms = [k for _, _, _, k in got]
        assert all(b <= a for a, b in zip(kms, kms[1:]))
        assert all(0 < k <= 1 for k in kms)
