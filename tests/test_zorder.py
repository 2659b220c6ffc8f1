"""Z-order layout: the measurable property — a bbox query over a
z-sorted file layout touches FEWER files than over a row-major-sorted
layout, because interleaved bits make 1-D file ranges behave like 2-D
bounding boxes (the data-skipping mechanism lake formats use; at
100 TB this is the difference between scanning 2% and 50% of files).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tb_scale_spatial_data_pipeline_spark.plans.spatial_queries import (
    morton_sql,
)


def _grid(spark, n=64):
    return (
        spark.range(n * n)
        .select(
            (F.col("id") % n).cast("long").alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
        .withColumn("zval", F.expr(morton_sql("x", "y", "spark")))
    )


def _files_touched(spark, path, n=64):
    df = spark.read.parquet(path)
    hit = df.where(
        (F.col("x") >= 8) & (F.col("x") < 16) & (F.col("y") >= 8) & (F.col("y") < 16)
    )
    # which files actually contain qualifying rows (what row-group
    # min/max stats would let the reader skip down to)
    return hit.select(
        F.input_file_name().alias("f")
    ).distinct().count()


def test_morton_matches_reference_interleave(spark):
    rows = _grid(spark, 8).collect()

    def interleave(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        assert r["zval"] == interleave(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_layout_prunes_more_files(spark, tmp_path):
    n = 64
    g = _grid(spark, n)
    z_path = str(tmp_path / "zsorted")
    r_path = str(tmp_path / "rowmajor")
    # 16 files each, sorted within/across by the respective key
    g.repartitionByRange(16, "zval").sortWithinPartitions("zval").write.parquet(z_path)
    g.repartitionByRange(16, "y", "x").sortWithinPartitions("y", "x").write.parquet(r_path)

    z_files = _files_touched(spark, z_path, n)
    r_files = _files_touched(spark, r_path, n)
    # the 8x8 bbox is 1/64 of the data: z-order confines it to 1-2
    # files; row-major layouts smear the x-range across every y-stripe
    # file that overlaps y in [8,16)
    assert z_files < r_files, (z_files, r_files)
    assert z_files <= 2, z_files
