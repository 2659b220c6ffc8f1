"""Bit-exactness of the batch (pair-vectorized) overlay kernels vs the
per-pair scalar ones they replaced (r17, guide §4.2).

The batch kernels must be indistinguishable from running the scalar
kernel per row — including the last ulp, because the overlay queries'
outputs are oracle-hash-checked. The adversarial cases are encoded from
the two failure modes found while vectorizing:

- summation ORDER: `tpar` divisions make crossing coordinates inexact
  even on integer-lattice inputs, so shoelace term order is observable
  (e.g. 42.00000000000006 vs 42.0 on L x L fixture pairs);
- BLAS STRIDE paths: np.dot accumulates differently for unit-stride vs
  stride-2 input, so even "the same dot in a different layout" flips
  low bits.
"""

import numpy as np
import pandas as pd
import pytest

from tb_scale_spatial_data_pipeline_spark.functions.geometry import (
    _intersection_area_general,
    _close_ring,
    _overlay_frame,
    _overlay_general_frame,
    _overlay_metrics,
    _parse_ring,
    _ring_signed_area,
)


def _wkt(pts):
    inner = ", ".join(f"{x} {y}" for x, y in pts)
    return f"POLYGON(({inner}))"


# rect/L-shape generators echoing the fixture lattice geometry
def _rect(x0, y0, x1, y1):
    return _wkt([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)])


def _lshape(x0, y0, x1, y1, xm, ym):
    return _wkt(
        [(x0, y0), (x1, y0), (x1, ym), (xm, ym), (xm, y1), (x0, y1), (x0, y0)]
    )


def _pairs_general():
    rng = np.random.default_rng(7)
    pairs = []
    for _ in range(300):
        x0, y0 = rng.integers(0, 30, 2)
        x1 = x0 + rng.integers(3, 30)
        y1 = y0 + rng.integers(3, 25)
        xm = x0 + rng.integers(1, max(int(x1 - x0), 2))
        ym = y0 + rng.integers(1, max(int(y1 - y0), 2))
        zx0, zy0 = rng.integers(0, 40, 2)
        zx1 = zx0 + rng.integers(5, 28)
        zy1 = zy0 + rng.integers(5, 28)
        zxm = zx0 + rng.integers(1, max(int(zx1 - zx0), 2))
        zym = zy0 + rng.integers(1, max(int(zy1 - zy0), 2))
        pairs.append(
            (_lshape(x0, y0, x1, y1, xm, ym), _lshape(zx0, zy0, zx1, zy1, zxm, zym))
        )
    # the exact pair that exposed the summation-order seam
    pairs.append(
        (
            "POLYGON((26 2, 32 2, 32 6, 29 6, 29 12, 26 12, 26 2))",
            "POLYGON((20 0, 46 0, 46 10, 32 10, 32 26, 20 26, 20 0))",
        )
    )
    # degenerates: unparseable, < 3 distinct vertices, disjoint
    pairs.append(("not a polygon", _rect(0, 0, 4, 4)))
    pairs.append((_rect(0, 0, 4, 4), ""))
    pairs.append((_wkt([(0, 0), (5, 5), (0, 0)]), _rect(0, 0, 4, 4)))
    pairs.append((_rect(0, 0, 2, 2), _rect(50, 50, 60, 60)))
    return pairs


def test_general_batch_bitwise_equals_scalar():
    pairs = _pairs_general()
    wa = pd.Series([a for a, _ in pairs])
    wb = pd.Series([b for _, b in pairs])
    got = _overlay_general_frame(wa, wb)
    for i, (sa, sb) in enumerate(pairs):
        a, b = _parse_ring(sa), _parse_ring(sb)
        if a is None or b is None or len(a) < 3 or len(b) < 3:
            assert np.isnan(got.inter_area[i])
            assert np.isnan(got.area_a[i])
            assert np.isnan(got.area_b[i])
            continue
        inter = _intersection_area_general(a, b)
        area_a = abs(_ring_signed_area(_close_ring(a)))
        area_b = abs(_ring_signed_area(_close_ring(b)))
        # == on floats: bit-for-bit (both quantities are finite)
        assert got.inter_area[i] == inter, (i, sa, sb)
        assert got.area_a[i] == area_a
        assert got.area_b[i] == area_b


def test_convex_batch_bitwise_equals_scalar():
    rng = np.random.default_rng(11)
    pairs = []
    for _ in range(300):
        x0, y0 = rng.integers(0, 40, 2)
        pairs.append(
            (
                _rect(x0, y0, x0 + rng.integers(2, 40), y0 + rng.integers(2, 40)),
                _rect(16, 12, 32, 24),
            )
        )
    # concave subject against convex clip is in-contract for S-H
    pairs.append((_lshape(10, 10, 40, 30, 20, 18), _rect(16, 12, 32, 24)))
    pairs.append(("POLYGON((", _rect(0, 0, 4, 4)))
    pairs.append((_rect(0, 0, 2, 2), _rect(50, 50, 60, 60)))  # iou NaN? union>0
    wa = pd.Series([a for a, _ in pairs])
    wb = pd.Series([b for _, b in pairs])
    got = _overlay_frame(wa, wb)
    for i, (sa, sb) in enumerate(pairs):
        inter, union, iou = _overlay_metrics(sa, sb)
        for name, want in (("inter_area", inter), ("union_area", union), ("iou", iou)):
            have = got[name][i]
            if isinstance(want, float) and np.isnan(want):
                assert np.isnan(have), (i, name)
            else:
                assert have == want, (i, name, sa, sb)


def test_batch_groups_by_clip_wkt_order_independent():
    """Rows interleaving several distinct clip polygons must come back
    in input order with per-row results unchanged (the batch kernel
    groups rows by clip WKT internally)."""
    zones = [_rect(0, 0, 16, 12), _rect(16, 0, 32, 12), _rect(0, 12, 16, 24)]
    subs = [_rect(2 * i, i, 2 * i + 9, i + 7) for i in range(30)]
    wa = pd.Series(subs)
    wb = pd.Series([zones[i % 3] for i in range(30)])
    got = _overlay_frame(wa, wb)
    for i in range(30):
        inter, union, iou = _overlay_metrics(subs[i], zones[i % 3])
        assert got.inter_area[i] == inter
        assert got.union_area[i] == union
        assert got.iou[i] == iou or (np.isnan(got.iou[i]) and np.isnan(iou))


@pytest.mark.parametrize("nsub", [0, 1])
def test_batch_tiny_inputs(nsub):
    wa = pd.Series([_rect(0, 0, 4, 4)][:nsub])
    wb = pd.Series([_rect(2, 2, 6, 6)][:nsub])
    out = _overlay_frame(wa, wb)
    assert len(out) == nsub
    out2 = _overlay_general_frame(wa, wb)
    assert len(out2) == nsub
    if nsub:
        assert out.inter_area[0] == 4.0
        assert out2.inter_area[0] == 4.0
