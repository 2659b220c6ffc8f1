"""Tiled graph-based segmentation + polygon metrics (SURVEY §2.6
R4/R6/R7, P18).

``segment_tiles`` runs a Felzenszwalb–Huttenlocher-style graph
segmentation (public algorithm: sort 4-connectivity edges by feature
distance; union–find merge when the edge weight is below both
components' internal-difference + scale/|C| threshold; then absorb
components below min_size) per tile over the halo-extended window and
crops to the core — the reference's exact tiling strategy
(`2_segmentation/image_segmentation.py:28-29,142-149`, scale=35,
min_size=15).

Global segment ids use the order-free deterministic scheme from
SURVEY §7 P18 — ``(tile_y * 10^6 + tile_x) * 10^7 + local_label`` —
replacing the reference's sequential ``max+1`` offset chain
(`2_segmentation/image_segmentation.py:150,164`), which would force
serial tile execution. Ids differ from the reference's (benign,
declared); the *partition* of pixels into segments is the comparable
output.

``segment_shape_metrics`` computes the object-classifier's 6-feature
geometric set (`3_object_classification/object_classifier.py:43,58-68`)
directly from the label raster: area (pixel count), perimeter
(exposed-edge count), rectangularity (area/bbox area), elongation
(bbox aspect), compactness (4πA/P²), shape_index (P/(4√A)),
num_vertices (corner count of the rasterized boundary via 2×2
odd-parity windows), vertex_density (vertices/perimeter). A bbox WKT
polygon is emitted per segment (R6's polygonization, simplified to
bounding boxes — full boundary tracing is a declared deviation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def _felzenszwalb(img: np.ndarray, scale: float, min_size: int) -> np.ndarray:
    """Classic FH04 segmentation on (H, W, C) float array → int32
    labels (0..n-1), deterministic (stable edge sort)."""
    h, w, _ = img.shape
    n = h * w
    idx = np.arange(n).reshape(h, w)

    # 4-connectivity edges with euclidean feature distance
    def edge_block(a_idx, b_idx, a_px, b_px):
        wgt = np.sqrt(((a_px - b_px) ** 2).sum(axis=-1))
        return a_idx.ravel(), b_idx.ravel(), wgt.ravel()

    ea1, eb1, ew1 = edge_block(idx[:, :-1], idx[:, 1:], img[:, :-1, :], img[:, 1:, :])
    ea2, eb2, ew2 = edge_block(idx[:-1, :], idx[1:, :], img[:-1, :, :], img[1:, :, :])
    ea = np.concatenate([ea1, ea2])
    eb = np.concatenate([eb1, eb2])
    ew = np.concatenate([ew1, ew2])
    order = np.lexsort((eb, ea, ew))  # weight asc, then ids — fully deterministic

    parent = np.arange(n, dtype=np.int64)
    rank = np.zeros(n, dtype=np.int32)
    size = np.ones(n, dtype=np.int64)
    internal = np.zeros(n, dtype=np.float64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a: int, b: int) -> int:
        if rank[a] < rank[b]:
            a, b = b, a
        parent[b] = a
        size[a] += size[b]
        if rank[a] == rank[b]:
            rank[a] += 1
        return a

    for ei in order:
        a, b = find(ea[ei]), find(eb[ei])
        if a == b:
            continue
        wgt = ew[ei]
        if wgt <= min(internal[a] + scale / size[a], internal[b] + scale / size[b]):
            r = union(a, b)
            internal[r] = wgt

    # absorb small components (same edge order, as in the reference impl)
    for ei in order:
        a, b = find(ea[ei]), find(eb[ei])
        if a != b and (size[a] < min_size or size[b] < min_size):
            union(a, b)

    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    _, labels = np.unique(roots, return_inverse=True)
    return labels.reshape(h, w).astype(np.int32)


def segment_tiles(
    tiled: DataFrame,
    value_cols: list[str],
    scale: float = 35.0,
    min_size: int = 15,
) -> DataFrame:
    """R4: per-tile segmentation over halo windows; output core pixels
    with deterministic global segment ids (x, y, seg_id)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tile_x"].iloc[0])
        ty = int(pdf["tile_y"].iloc[0])
        x0, y0 = int(pdf["x"].min()), int(pdf["y"].min())
        w = int(pdf["x"].max()) - x0 + 1
        h = int(pdf["y"].max()) - y0 + 1
        stack = np.zeros((h, w, len(value_cols)), dtype=np.float64)
        core = np.zeros((h, w), dtype=bool)
        xi = pdf["x"].to_numpy() - x0
        yi = pdf["y"].to_numpy() - y0
        for c, col in enumerate(value_cols):
            stack[yi, xi, c] = np.nan_to_num(pdf[col].to_numpy(), nan=0.0)
        core[yi, xi] = pdf["is_core"].to_numpy()
        labels = _felzenszwalb(stack, scale, min_size)
        ys, xs = np.nonzero(core)
        local = labels[ys, xs].astype(np.int64)
        gid = (np.int64(ty) * 1_000_000 + tx) * 10_000_000 + local
        return pd.DataFrame({"x": xs + x0, "y": ys + y0, "seg_id": gid})

    return tiled.groupBy("tile_x", "tile_y").applyInPandas(
        kernel, schema="x int, y int, seg_id long"
    )


def segment_shape_metrics(segments: DataFrame) -> DataFrame:
    """R6/R7: per-segment polygonization (bbox WKT) + the 6 shape
    features, computed distributively: pixels shuffle once on seg_id
    (tile-local by construction of the id scheme, so the shuffle is
    balanced), and each segment's metrics reduce in one pass."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for seg_id, g in pdf.groupby("seg_id"):
            xs = g["x"].to_numpy()
            ys = g["y"].to_numpy()
            x0, x1 = xs.min(), xs.max()
            y0, y1 = ys.min(), ys.max()
            w = int(x1 - x0 + 1)
            h = int(y1 - y0 + 1)
            mask = np.zeros((h + 2, w + 2), dtype=bool)  # 1-px guard ring
            mask[ys - y0 + 1, xs - x0 + 1] = True
            area = int(mask.sum())
            # perimeter: exposed 4-neighbor edges
            per = int(
                (mask & ~np.roll(mask, 1, 0)).sum()
                + (mask & ~np.roll(mask, -1, 0)).sum()
                + (mask & ~np.roll(mask, 1, 1)).sum()
                + (mask & ~np.roll(mask, -1, 1)).sum()
            )
            # vertices: 2x2 windows with odd occupancy = polygon corners
            q = (
                mask[:-1, :-1].astype(np.int8)
                + mask[:-1, 1:]
                + mask[1:, :-1]
                + mask[1:, 1:]
            )
            n_vertices = int(((q == 1) | (q == 3)).sum())
            bbox_area = w * h
            rectangularity = area / bbox_area
            elongation = max(w, h) / min(w, h)
            compactness = 4.0 * np.pi * area / (per * per) if per else 0.0
            shape_index = per / (4.0 * np.sqrt(area)) if area else 0.0
            vertex_density = n_vertices / per if per else 0.0
            wkt = (
                f"POLYGON(({x0} {y0}, {x1 + 1} {y0}, {x1 + 1} {y1 + 1}, "
                f"{x0} {y1 + 1}, {x0} {y0}))"
            )
            out.append(
                (
                    seg_id,
                    wkt,
                    area,
                    per,
                    rectangularity,
                    elongation,
                    compactness,
                    shape_index,
                    n_vertices,
                    vertex_density,
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "seg_id",
                "geometry",
                "area",
                "perimeter",
                "rectangularity",
                "elongation",
                "compactness",
                "shape_index",
                "num_vertices",
                "vertex_density",
            ],
        )

    schema = (
        "seg_id long, geometry string, area long, perimeter long, "
        "rectangularity double, elongation double, compactness double, "
        "shape_index double, num_vertices int, vertex_density double"
    )
    return segments.groupBy("seg_id").applyInPandas(kernel, schema=schema)
