"""Focused pin for the vectorized Douglas-Peucker batch kernel
(functions/geometry.dp_kept_batch): bit-identical kept sets vs an
independent stack-based scalar DP, on (a) the exact y-vectors the
polyline_simplify_dp query synthesizes over the fixture id range and
(b) random integer fuzz that stresses the tie / tolerance branches.
Pure numpy — no Spark session needed."""

from __future__ import annotations

import numpy as np

from tb_scale_spatial_data_pipeline_spark.functions.geometry import dp_kept_batch


def scalar_dp(ys) -> list:
    pts = [(10 * k, int(y)) for k, y in enumerate(ys)]
    keep = set()
    stack = [(0, len(pts) - 1)]
    while stack:
        a, b = stack.pop()
        keep.add(a)
        keep.add(b)
        ax, ay = pts[a]
        bx, by = pts[b]
        len2 = (bx - ax) ** 2 + (by - ay) ** 2
        best = None
        for k in range(a + 1, b):
            px, py = pts[k]
            c = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            if best is None or c * c > best[0]:
                best = (c * c, k)
        if best is not None and 4 * best[0] > 9 * len2:
            stack.append((a, best[1]))
            stack.append((best[1], b))
    return sorted(keep)


def fixture_y(ids: np.ndarray) -> np.ndarray:
    k = np.arange(9, dtype=np.int64)[None, :]
    ids = ids[:, None]
    return ((ids * 7 + k * k * 31 + (ids % 11) * k) % 5) - 2 + 2 * k


def test_fixture_id_range_bit_identical():
    # every (id % 5, id % 11) residue class the query can produce
    ids = np.arange(1, 1 + 5 * 11 * 3, dtype=np.int64)
    Y = fixture_y(ids)
    got = dp_kept_batch(Y)
    for i in range(len(ids)):
        assert list(got[i]) == scalar_dp(Y[i]), ids[i]


def test_random_fuzz_bit_identical():
    rng = np.random.default_rng(7)
    Y = rng.integers(-50, 50, size=(2000, 9)).astype(np.int64)
    got = dp_kept_batch(Y)
    bad = [i for i in range(len(Y)) if list(got[i]) != scalar_dp(Y[i])]
    assert not bad, (bad[:3], Y[bad[0]].tolist() if bad else None)


def test_varied_vertex_count_and_degenerate():
    # collinear line -> endpoints only; V=2 -> endpoints; all-equal y
    got = dp_kept_batch(np.zeros((3, 9), dtype=np.int64))
    for g in got:
        assert list(g) == [0, 8]
    got2 = dp_kept_batch(np.array([[5, 7]], dtype=np.int64))
    assert list(got2[0]) == [0, 1]
