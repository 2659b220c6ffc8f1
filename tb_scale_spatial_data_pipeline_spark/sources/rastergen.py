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
        tx, ty = partition.value
        for y in range(TILE):
            gy = ty * TILE + y
            for x in range(TILE):
                gx = tx * TILE + x
                yield (
                    tx,
                    ty,
                    gx,
                    gy,
                    pixel_value(gx, gy, 1),
                    pixel_value(gx, gy, 2),
                    pixel_value(gx, gy, 3),
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
