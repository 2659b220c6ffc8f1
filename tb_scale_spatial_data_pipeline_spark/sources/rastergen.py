"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic raster-tile source.

The reference's scan layer opens GeoTIFFs and iterates rectangular
windows — the window is the unit of work (SURVEY §1.1.2, §2.1 S1/S4/
S5: `0_preprocessing/feature_stacking.py:67-70,178,233-235`). The
Spark-native expression of that contract is a DataSource whose
`partitions()` returns one `InputPartition` per tile: every executor
reads only its own tiles, there is no driver-side funnel, and the
scan parallelism equals the tile count — exactly how a 100 TB raster
store should be exposed to Spark.

Pixel values are a pure integer function of (tile, x, y, band), so
the source is reproducible across executors/retries (a Spark task
retry MUST re-produce identical rows) and even replicable in SQL by
the DuckDB oracle via generate_series — giving a hash-checkable
correctness gate for a *custom source*, not just custom operators.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

TILE = 32  # pixels per tile side (small: fixtures, not prod sizing)
BANDS = 3


def pixel_value(gx: int, gy: int, band: int) -> float:
    """Deterministic fake radiance: pure function of global coords."""
    return float((gx * 31 + gy * 17 + band * 7) % 256)


class RasterGenReader(DataSourceReader):
    def __init__(self, options):
        self.tiles_x = int(options.get("tiles_x", 2))
        self.tiles_y = int(options.get("tiles_y", 2))

    def partitions(self):
        # one InputPartition per tile — the scan's parallelism contract
        return [
            InputPartition((tx, ty))
            for ty in range(self.tiles_y)
            for tx in range(self.tiles_x)
        ]

    def read(self, partition):
        # yield ONE Arrow RecordBatch per tile (Spark 4 supports Arrow
        # output from Python DataSource readers): the whole window is
        # generated vectorized and crosses the Python↔JVM boundary as
        # a single columnar batch instead of TILE² pickled tuples —
        # the same batch-per-window contract a real 100 TB raster
        # store adapter would use. Row order (y-major) matches the
        # original per-row loop.
        import numpy as np
        import pyarrow as pa

        tx, ty = partition.value
        gy, gx = np.meshgrid(
            np.arange(ty * TILE, (ty + 1) * TILE),
            np.arange(tx * TILE, (tx + 1) * TILE),
            indexing="ij",
        )
        gx = gx.ravel()
        gy = gy.ravel()
        base = gx * 31 + gy * 17
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.full(len(gx), tx, dtype=np.int32)),
                pa.array(np.full(len(gx), ty, dtype=np.int32)),
                pa.array(gx.astype(np.int32)),
                pa.array(gy.astype(np.int32)),
                pa.array(((base + 7) % 256).astype(np.float64)),
                pa.array(((base + 14) % 256).astype(np.float64)),
                pa.array(((base + 21) % 256).astype(np.float64)),
            ],
            names=["tile_x", "tile_y", "x", "y", "b1", "b2", "b3"],
        )


class RasterGenSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rastergen"

    def schema(self) -> str:
        return (
            "tile_x int, tile_y int, x int, y int, "
            "b1 double, b2 double, b3 double"
        )

    def reader(self, schema) -> RasterGenReader:
        return RasterGenReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(RasterGenSource)
