"""Custom Python DataSource (sources/rastergen.py) and text-format
source round-trips.

The scan contract that matters at scale: one InputPartition per tile
(parallelism = tile count, no driver funnel), deterministic re-read
(task retries must reproduce identical rows), and the declared schema.
CSV/JSON round-trips cover the format breadth of the source layer —
explicit schemas on read (schema inference is a second full scan, an
anti-pattern at 100 TB).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tb_scale_spatial_data_pipeline_spark.sources.rastergen import (
    TILE,
    pixel_value,
    register,
)


def _load(spark, tx=2, ty=3):
    register(spark)
    return (
        spark.read.format("rastergen")
        .option("tiles_x", str(tx))
        .option("tiles_y", str(ty))
        .load()
    )


def test_partition_per_tile(spark):
    df = _load(spark, tx=2, ty=3)
    parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert parts == 6
    # each partition holds exactly one tile
    per = (
        df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.countDistinct("tile_x", "tile_y").alias("nt"))
        .collect()
    )
    assert all(r["nt"] == 1 for r in per)


def test_deterministic_reread_and_values(spark):
    df = _load(spark)
    assert df.count() == 2 * 3 * TILE * TILE
    a = df.agg(F.sum("b1"), F.sum("b2")).collect()[0]
    b = _load(spark).agg(F.sum("b1"), F.sum("b2")).collect()[0]
    assert tuple(a) == tuple(b)
    row = df.where((F.col("x") == 5) & (F.col("y") == 7)).first()
    assert row["b1"] == pixel_value(5, 7, 1)


def test_csv_roundtrip_with_explicit_schema(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    out = str(tmp_path / "nation_csv")
    src.write.option("header", "true").csv(out)
    back = (
        spark.read.schema(src.schema)
        .option("header", "true")
        .csv(out)
    )
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_json_roundtrip_with_explicit_schema(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    out = str(tmp_path / "region_json")
    src.write.json(out)
    back = spark.read.schema(src.schema).json(out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_eventgen_stream_source_drains_and_replays(spark, tmp_path):
    """Custom streaming DataSource contract: availableNow drains the
    bounded tick range through the partitioned reader (one partition
    per (tick, shard), Arrow batches), totals match the pure-function
    spec exactly, and a SECOND run from a fresh checkpoint reproduces
    identical rows — the replay-determinism contract a checkpoint
    restart depends on."""
    import uuid

    import pyspark.sql.functions as F

    from tb_scale_spatial_data_pipeline_spark.sources.eventgen import (
        EVENTS_PER_SHARD_TICK,
        MAX_TICKS,
        N_SHARDS,
        event_row,
        register,
    )

    register(spark)

    def drain():
        name = f"eventgen_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.format("eventgen")
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name)

    out1 = drain()
    rows = out1.collect()
    assert len(rows) == MAX_TICKS * N_SHARDS * EVENTS_PER_SHARD_TICK
    # spot-check values against the pure-function spec
    seen = {(r["tick"], r["shard"], r["user_id"], r["value"]) for r in rows}
    for tick in (0, MAX_TICKS - 1):
        for shard in (0, N_SHARDS - 1):
            for seq in (0, EVENTS_PER_SHARD_TICK - 1):
                assert event_row(tick, shard, seq) in seen
    # replay: a fresh run must produce the identical multiset
    out2 = drain()
    a = sorted(map(tuple, rows))
    b = sorted(map(tuple, out2.collect()))
    assert a == b
    # and the stream composes with ordinary aggregation
    agg = out1.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    assert {r["shard"]: r["n"] for r in agg} == {
        s: MAX_TICKS * EVENTS_PER_SHARD_TICK for s in range(N_SHARDS)
    }
