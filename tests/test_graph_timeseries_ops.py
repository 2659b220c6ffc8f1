"""Independent-replay tests for the round-6 continuation ops:
weighted SSSP (vs a driver-side Dijkstra on the collected fixture
graph) and CUSUM change-points (vs the textbook sequential
recurrence replayed in pure Python)."""

from __future__ import annotations

import heapq

import pandas as pd

from conftest import SF_SMOKE


def test_sssp_matches_driver_dijkstra(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.graph_queries import (
        QUERIES,
        _weighted_edges,
    )

    edges = _weighted_edges(spark, SF_SMOKE).collect()
    adj: dict[int, list[tuple[int, int]]] = {}
    for r in edges:
        adj.setdefault(r.src, []).append((r.dst, r.w))
    seeds = [n for n in adj if n % 20 == 0]
    dist = {s: 0 for s in seeds}
    pq = [(0, s) for s in seeds]
    heapq.heapify(pq)
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 60):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))

    got = {
        r.s_suppkey: r.dist
        for r in QUERIES["sssp_weighted"](spark, SF_SMOKE).collect()
    }
    assert got == dist


def test_sssp_converged_before_round_cap(spark):
    """The fixed-round unrolled oracle is only exact if Bellman-Ford
    reaches its fixpoint within _SSSP_ROUNDS; weighted hop count of the
    longest shortest path must stay strictly under the cap."""
    from tb_scale_spatial_data_pipeline_spark.plans.graph_queries import (
        _SSSP_ROUNDS,
        QUERIES,
    )

    dists = [
        r.dist for r in QUERIES["sssp_weighted"](spark, SF_SMOKE).collect()
    ]
    # weights are >= 1, so weighted distance upper-bounds hop count
    assert max(dists) < _SSSP_ROUNDS


def test_cusum_matches_sequential_recurrence(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.timeseries_queries import (
        _CUSUM_C,
        _CUSUM_H,
        QUERIES,
    )

    ev = (
        pd.read_parquet(f"{SF_SMOKE}/events.parquet")
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    expected = {}
    for uid, grp in ev.groupby("user_id"):
        s = 0.0
        for _, row in grp.iterrows():
            # replay on the cent lattice to mirror the decimal math
            y = round(round(row.value, 2) * 100) - int(_CUSUM_C * 100)
            s = max(0, s + y)
            if s > _CUSUM_H * 100:
                expected[(uid, row.event_id)] = s / 100.0

    got = {
        (r.user_id, r.event_id): r.cusum_stat
        for r in QUERIES["cusum_changepoint"](spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert len(got) > 0  # nonvacuity: the alarm actually fires
