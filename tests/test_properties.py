"""Hypothesis property tests for operator invariants (SURVEY §5
strategy: self-consistency properties where no oracle applies).
Example counts are small — each example runs real Spark jobs."""

from __future__ import annotations

import math
import sys

import pyspark.sql.functions as F
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from tb_scale_spatial_data_pipeline_spark.operators.skew import salted_agg
from tb_scale_spatial_data_pipeline_spark.sources.sinks import overlay_update

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), finite_floats), min_size=1, max_size=40
    )
)
@_settings
def test_salted_agg_equals_direct_property(spark, rows):
    df = spark.createDataFrame(
        [(f"k{k}", v) for k, v in rows], "k string, v double"
    )
    direct = {
        r["k"]: (r["n"], r["mx"])
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.max("v").alias("mx")).collect()
    }
    salted = {
        r["k"]: (r["n"], r["mx"])
        for r in salted_agg(
            df, ["k"], {"n": (F.lit(1), "count"), "mx": (F.col("v"), "max")}, n_salts=4
        ).collect()
    }
    assert direct == salted


@given(
    existing=st.dictionaries(st.integers(0, 9), finite_floats, max_size=8),
    updates=st.dictionaries(st.integers(0, 9), finite_floats, max_size=8),
)
@_settings
def test_overlay_update_property(spark, existing, updates):
    ex = spark.createDataFrame(
        [(k, v) for k, v in existing.items()] or [(None, None)], "k int, v double"
    ).where("k IS NOT NULL")
    up = spark.createDataFrame(
        [(k, v) for k, v in updates.items()] or [(None, None)], "k int, v double"
    ).where("k IS NOT NULL")
    out = {
        r["k"]: r["v"] for r in overlay_update(ex, up, ["k"], ["v"]).collect()
    }
    expected = dict(existing)
    expected.update(updates)
    assert out.keys() == expected.keys()
    for k in expected:
        assert math.isclose(out[k], expected[k], rel_tol=0, abs_tol=0)


@given(vals=st.lists(finite_floats, min_size=1, max_size=30))
@_settings
def test_sentinel_roundtrip_property(spark, vals):
    from tb_scale_spatial_data_pipeline_spark.functions.sentinels import (
        null_to_sentinel,
        sentinel_to_null,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = [
        r["o"]
        for r in df.select(
            null_to_sentinel(sentinel_to_null(F.col("v"))).alias("o")
        ).collect()
    ]
    for v, o in zip(vals, out):
        if abs(v - (-9999.0)) < 0.01:
            assert o == -9999.0
        else:
            assert o == v


@given(
    xs=st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=25)
)
@_settings
def test_halo_core_partition_property(spark, xs):
    from tb_scale_spatial_data_pipeline_spark.raster.tiles import halo_duplicate

    df = spark.createDataFrame(
        list({(x, y) for x, y in xs}), "x int, y int"
    ).withColumn("v", F.col("x") + F.col("y"))
    tiled = halo_duplicate(df, tile_size=8, halo=3)
    # exactly one core copy per pixel; halo copies carry is_core=false
    core = tiled.where("is_core").groupBy("x", "y").count()
    assert core.where("count != 1").count() == 0
    assert core.count() == df.count()


@given(
    a=st.lists(finite_floats, min_size=2, max_size=8),
    b=st.lists(finite_floats, min_size=2, max_size=8),
)
@example(a=[0.0, 1.0, 82478.0], b=[0.0, 1.0, 82478.0])
@_settings
def test_vector_identities(spark, a, b):
    """dot/norm identities: |dot(a,b)| <= |a||b| (Cauchy-Schwarz) and
    l2_distance² == |a|² + |b|² - 2·dot within fp tolerance.

    Tolerance must scale with the TERM magnitudes (na²+nb²), not the
    possibly-cancelled result: for a == b the identity cancels to ~0
    while sqrt(x)² alone carries ~x·eps absolute error, so a tolerance
    proportional to |rhs| is unsatisfiable under catastrophic
    cancellation (found by Hypothesis at a=b=[0,1,82478])."""
    import math

    from tb_scale_spatial_data_pipeline_spark.functions.vectors import (
        dot,
        l2_distance,
        l2_norm,
    )

    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    r = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        l2_norm(F.col("a")).alias("na"),
        l2_norm(F.col("b")).alias("nb"),
        l2_distance(F.col("a"), F.col("b")).alias("dist"),
    ).first()
    assert abs(r["d"]) <= r["na"] * r["nb"] * (1 + 1e-9) + 1e-9
    lhs = r["dist"] ** 2
    rhs = r["na"] ** 2 + r["nb"] ** 2 - 2 * r["d"]
    # abs_tol scaled by term magnitudes: each of na², nb², 2·dot carries
    # O(eps)·magnitude rounding, which survives even when rhs cancels to 0.
    scale = r["na"] ** 2 + r["nb"] ** 2 + 2 * abs(r["d"])
    abs_tol = max(1e-9, 16 * sys.float_info.epsilon * scale)
    assert math.isclose(lhs, rhs, rel_tol=1e-6, abs_tol=abs_tol)


@given(data=st.binary(min_size=0, max_size=4000))
@settings(max_examples=200, deadline=None)
def test_lzw_roundtrip_property(data):
    """TIFF-variant LZW must be lossless on arbitrary byte streams —
    the property the whole compressed-sink contract rests on."""
    from tb_scale_spatial_data_pipeline_spark.sources.geotiff import (
        _lzw_decode,
        _lzw_encode,
    )

    assert _lzw_decode(_lzw_encode(data)) == data


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    c=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
    compression=st.sampled_from(["none", "lzw"]),
    tiled=st.booleans(),
    bigtiff=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_tiff_roundtrip_property(tmp_path_factory, h, w, c, seed, compression, tiled, bigtiff):
    """Any (H, W, C) float32 raster must round-trip bit-exactly through
    every codec layout combination (strip/tiled × raw/LZW × classic/
    BigTIFF), including non-tile-multiple edges."""
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.sources.geotiff import (
        read_tiff,
        write_tiff,
    )

    rng = np.random.default_rng(seed)
    arr = rng.standard_normal((h, w, c)).astype(np.float32)
    p = str(tmp_path_factory.mktemp("tiffprop") / "t.tif")
    write_tiff(
        p,
        arr,
        compression=compression,
        tile=(16, 16) if tiled else None,
        bigtiff=bigtiff,
    )
    assert np.array_equal(read_tiff(p), arr)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=15
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_equivalence_property(spark, edges):
    """Min-label propagation, star contraction, and a driver-side
    union-find must agree on arbitrary small graphs (self-loops and
    parallel edges included)."""
    from tb_scale_spatial_data_pipeline_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # canonical label = min of each component
    comp = {}
    for n in parent:
        r = find(n)
        comp.setdefault(r, []).append(n)
    expected = {n: min(ns) for r, ns in comp.items() for n in ns}

    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got_min = {
        r["node"]: r["cluster_id"]
        for r in connected_components(df, "id_a", "id_b").collect()
    }
    got_star = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(df, "id_a", "id_b").collect()
    }
    assert got_min == expected
    assert got_star == expected


@given(
    tx=st.floats(-100, 100, allow_nan=False),
    ty=st.floats(-100, 100, allow_nan=False),
    g=st.floats(-1e-3, 1e-3, allow_nan=False),
    h=st.floats(-1e-3, 1e-3, allow_nan=False),
)
@settings(max_examples=100, deadline=None)
def test_projective_transform_inverse_property(tx, ty, g, h):
    """target_to_source and source_to_target must be mutual inverses
    for any well-conditioned homography."""
    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.raster.kernels import (
        projective_transform,
    )

    t2s, s2t = projective_transform(
        ((0.95, 0.08, 1.5), (-0.06, 0.97, 0.8), (g, h, 1.0))
    )
    x = np.array([tx], dtype=np.float64)
    y = np.array([ty], dtype=np.float64)
    sx, sy = t2s(x, y)
    bx, by = s2t(sx, sy)
    assert abs(bx[0] - tx) < 1e-6 * max(1.0, abs(tx))
    assert abs(by[0] - ty) < 1e-6 * max(1.0, abs(ty))


@given(
    n=st.integers(1, 400),
    seed=st.integers(0, 2**31 - 1),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_wav_decode_property(n, seed, rate):
    """Any 16-bit mono PCM WAV must decode to exactly its samples
    through the audio seam (stdlib wave parse, truncated/padded to the
    declared n_samples contract)."""
    import io
    import wave

    import numpy as np

    from tb_scale_spatial_data_pipeline_spark.multimodal.media import _decode_audio

    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32767, size=n, dtype=np.int16).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    out = _decode_audio(buf.getvalue(), n)
    assert len(out) == n
    assert np.array_equal(np.asarray(out[:n], dtype=np.int16), samples)
