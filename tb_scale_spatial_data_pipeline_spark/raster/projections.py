"""Named map-projection presets for :func:`raster.kernels.warp_grid_tiles`.

The grid-warp kernel accepts any pair of vectorized coordinate
callables; this module supplies the two projections a reprojection
pipeline reaches for first — spherical Web Mercator (the EPSG:3857
web-tile CRS) and ellipsoidal UTM (transverse Mercator on WGS84) —
implemented from the public formulas in Snyder, *Map Projections — A
Working Manual* (USGS Professional Paper 1395, public domain; Mercator
eqs 7-1/7-4, transverse Mercator eqs 8-9..8-17). The reference repo
warps between real EPSG grids through rasterio
(`0_preprocessing/feature_stacking.py:86-96`); these presets give the
engine the same capability without a native GDAL dependency, to the
accuracy of the standard series (sub-millimeter within a UTM zone).

All functions are numpy-vectorized: arrays in, arrays out — exactly
the contract `warp_grid_tiles` batches through `applyInPandas`.
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid (public constants)
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
_E2 = WGS84_F * (2.0 - WGS84_F)  # first eccentricity squared
_EP2 = _E2 / (1.0 - _E2)  # second eccentricity squared
_K0 = 0.9996  # UTM central scale factor
_FE = 500000.0  # UTM false easting
_FN_S = 10000000.0  # UTM false northing (southern hemisphere)

# Web Mercator sphere radius == WGS84 semi-major axis (EPSG:3857)
_R = WGS84_A
_WEBM_LAT_MAX = 85.051128779806604  # atan(sinh(pi)) in degrees


def web_mercator_forward(lon_deg, lat_deg):
    """(lon, lat) degrees -> EPSG:3857 meters. Spherical formulas
    x = R·λ, y = R·ln tan(π/4 + φ/2), |φ| clipped to the web-tile
    square's ±85.0511°."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(
        np.clip(np.asarray(lat_deg, dtype=np.float64), -_WEBM_LAT_MAX, _WEBM_LAT_MAX)
    )
    return _R * lon, _R * np.log(np.tan(np.pi / 4.0 + lat / 2.0))


def web_mercator_inverse(x, y):
    """EPSG:3857 meters -> (lon, lat) degrees."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = x / _R
    lat = 2.0 * np.arctan(np.exp(y / _R)) - np.pi / 2.0
    return np.degrees(lon), np.degrees(lat)


def utm_zone_lon0(zone: int) -> float:
    """Central meridian (degrees) of a UTM zone (1..60)."""
    if not 1 <= int(zone) <= 60:
        raise ValueError("UTM zone must be in 1..60")
    return float(-183 + 6 * int(zone))


def _meridian_arc(phi: np.ndarray) -> np.ndarray:
    """Meridian arc length M(φ) on the WGS84 ellipsoid (Snyder 3-21)."""
    e2, e4, e6 = _E2, _E2**2, _E2**3
    return WGS84_A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )


def utm_forward(lon_deg, lat_deg, zone: int, north: bool = True):
    """(lon, lat) degrees -> UTM (easting, northing) meters, WGS84,
    Snyder eqs 8-9..8-15 (k0 = 0.9996, FE = 500 km, FN = 0/10 000 km)."""
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lam0 = np.radians(utm_zone_lon0(zone))
    sin_phi, cos_phi, tan_phi = np.sin(phi), np.cos(phi), np.tan(phi)
    N = WGS84_A / np.sqrt(1 - _E2 * sin_phi**2)
    T = tan_phi**2
    C = _EP2 * cos_phi**2
    A = (lam - lam0) * cos_phi
    M = _meridian_arc(phi)
    easting = _FE + _K0 * N * (
        A
        + (1 - T + C) * A**3 / 6
        + (5 - 18 * T + T**2 + 72 * C - 58 * _EP2) * A**5 / 120
    )
    northing = _K0 * (
        M
        + N
        * tan_phi
        * (
            A**2 / 2
            + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * _EP2) * A**6 / 720
        )
    )
    if not north:
        northing = northing + _FN_S
    return easting, northing


def utm_inverse(easting, northing, zone: int, north: bool = True):
    """UTM (easting, northing) meters -> (lon, lat) degrees, WGS84,
    Snyder eqs 8-16..8-25 via the footpoint latitude."""
    x = np.asarray(easting, dtype=np.float64) - _FE
    y = np.asarray(northing, dtype=np.float64)
    if not north:
        y = y - _FN_S
    M = y / _K0
    mu = M / (WGS84_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    e1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    C1 = _EP2 * cos1**2
    T1 = tan1**2
    N1 = WGS84_A / np.sqrt(1 - _E2 * sin1**2)
    R1 = WGS84_A * (1 - _E2) / (1 - _E2 * sin1**2) ** 1.5
    D = x / (N1 * _K0)
    phi = phi1 - (N1 * tan1 / R1) * (
        D**2 / 2
        - (5 + 3 * T1 + 10 * C1 - 4 * C1**2 - 9 * _EP2) * D**4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1**2 - 252 * _EP2 - 3 * C1**2)
        * D**6
        / 720
    )
    lam = np.radians(utm_zone_lon0(zone)) + (
        D
        - (1 + 2 * T1 + C1) * D**3 / 6
        + (5 - 2 * C1 + 28 * T1 - 3 * C1**2 + 8 * _EP2 + 24 * T1**2) * D**5 / 120
    ) / cos1
    return np.degrees(lam), np.degrees(phi)


PROJECTIONS = {
    "geographic": (
        lambda lon, lat: (np.asarray(lon, np.float64), np.asarray(lat, np.float64)),
        lambda x, y: (np.asarray(x, np.float64), np.asarray(y, np.float64)),
    ),
    "web_mercator": (web_mercator_forward, web_mercator_inverse),
}


def _resolve(proj):
    """proj is a preset name, ('utm', zone[, north]) tuple, or a
    (forward, inverse) callable pair."""
    if isinstance(proj, str):
        return PROJECTIONS[proj]
    if isinstance(proj, tuple) and proj and proj[0] == "utm":
        zone = int(proj[1])
        north = bool(proj[2]) if len(proj) > 2 else True
        return (
            lambda lon, lat: utm_forward(lon, lat, zone, north),
            lambda e, n: utm_inverse(e, n, zone, north),
        )
    fwd, inv = proj
    return fwd, inv


def pixel_grid_maps(src_proj, dst_proj, src_gt, dst_gt):
    """Build the (target_to_source, source_to_target) pixel-coordinate
    callables `warp_grid_tiles` consumes, from two named projections
    and two axis-aligned geotransforms gt = (origin_x, pixel_sx,
    origin_y, pixel_sy) mapping pixel (col, row) -> CRS coords
    (origin + pixel·scale). The chain per direction is
    pixel → CRS → lon/lat → other CRS → pixel, all vectorized."""
    src_fwd, src_inv = _resolve(src_proj)
    dst_fwd, dst_inv = _resolve(dst_proj)
    sx0, ssx, sy0, ssy = (float(v) for v in src_gt)
    dx0, dsx, dy0, dsy = (float(v) for v in dst_gt)

    def target_to_source(tx, ty):
        cx = dx0 + np.asarray(tx, np.float64) * dsx
        cy = dy0 + np.asarray(ty, np.float64) * dsy
        lon, lat = dst_inv(cx, cy)
        ex, ey = src_fwd(lon, lat)
        return (ex - sx0) / ssx, (ey - sy0) / ssy

    def source_to_target(sx, sy):
        cx = sx0 + np.asarray(sx, np.float64) * ssx
        cy = sy0 + np.asarray(sy, np.float64) * ssy
        lon, lat = src_inv(cx, cy)
        ex, ey = dst_fwd(lon, lat)
        return (ex - dx0) / dsx, (ey - dy0) / dsy

    return target_to_source, source_to_target
