"""Unit tests for operator semantics on tiny in-memory frames —
reference-invariant checks from FIXTURES.md §5 (composite idempotence,
argmax dominance, sentinel round-trips, rule ordering)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tb_scale_spatial_data_pipeline_spark.functions.indices import ndvi
from tb_scale_spatial_data_pipeline_spark.functions.sentinels import (
    NODATA_OUT,
    null_to_sentinel,
    sentinel_to_null,
)
from tb_scale_spatial_data_pipeline_spark.functions.signatures import combo_signature
from tb_scale_spatial_data_pipeline_spark.operators.composites import (
    argmax_composite,
    grouped_median,
)
from tb_scale_spatial_data_pipeline_spark.operators.joins import dual_model_fallback
from tb_scale_spatial_data_pipeline_spark.operators.relabel import solar_shadow_rules


def test_grouped_median_ignores_nulls(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (1, 3.0), (1, None), (2, None)], "g int, v double"
    )
    out = {r["g"]: r["median_value"] for r in grouped_median(df, ["g"], "v").collect()}
    assert out[1] == 2.0
    assert out[2] is None


def test_median_composite_idempotence(spark):
    # median of N identical layers equals the layer (FIXTURES.md §5)
    rows = [(x, y, s, float(x * 10 + y)) for x in range(4) for y in range(4) for s in range(5)]
    df = spark.createDataFrame(rows, "x int, y int, scene int, v double")
    out = grouped_median(df, ["x", "y"], "v").collect()
    assert all(r["median_value"] == r["x"] * 10 + r["y"] for r in out)


def test_argmax_dominance(spark):
    # winner payload always comes from the max-metric row; NULL metric never wins
    df = spark.createDataFrame(
        [(1, 5.0, "a"), (1, 9.0, "b"), (1, None, "z"), (2, 1.0, "c")],
        "g int, m double, payload string",
    )
    out = {r["g"]: (r["max_m"], r["payload"]) for r in argmax_composite(df, ["g"], "m", ["payload"]).collect()}
    assert out[1] == (9.0, "b")
    assert out[2] == (1.0, "c")


def test_argmax_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "a"), (1, 5.0, "b")], "g int, m double, payload string"
    )
    out = argmax_composite(df, ["g"], "m", ["payload"]).collect()
    assert out[0]["payload"] == "b"  # struct max → lexicographically larger payload


def test_sentinel_roundtrip(spark):
    df = spark.createDataFrame(
        [(1.0,), (-9999.0,), (float("nan"),), (42.0,)], "v double"
    )
    out = df.select(
        null_to_sentinel(sentinel_to_null(F.col("v"))).alias("v")
    ).collect()
    assert [r["v"] for r in out] == [1.0, NODATA_OUT, NODATA_OUT, 42.0]


def test_ndvi_epsilon_guard(spark):
    # zero denominator stays finite thanks to the reference's +1e-9
    df = spark.createDataFrame([(0.0, 0.0)], "nir double, red double")
    v = df.select(ndvi(F.col("nir"), F.col("red")).alias("v")).first()["v"]
    assert v == 0.0


def test_combo_signature_order_and_nulls(spark):
    df = spark.createDataFrame([(1.0, None, 3.0)], "b1 double, b2 double, b3 double")
    sig = combo_signature([("B1", F.col("b1")), ("B2", F.col("b2")), ("B3", F.col("b3"))])
    assert df.select(sig.alias("s")).first()["s"] == "B1_B3"


def test_solar_shadow_rules(spark):
    df = spark.createDataFrame(
        [(12, 0.5), (12, 0.7), (16, 0.99), (3, 0.1)], "label int, conf double"
    )
    out = [
        r["out"]
        for r in df.select(
            solar_shadow_rules(F.col("label"), F.col("conf")).alias("out")
        ).collect()
    ]
    assert out == [2, 12, 2, 3]


def test_dual_model_fallback_precedence(spark):
    facts = spark.createDataFrame([(1, "x"), (2, "y"), (3, None)], "id int, hint string")
    lookup = spark.createDataFrame([(1, 10)], "id int, main_pred int")
    backup = F.when(F.col("hint") == "y", 20)
    out = {
        r["id"]: r["PredClass"]
        for r in dual_model_fallback(
            facts, lookup, "id", "main_pred", backup
        ).collect()
    }
    assert out == {1: 10, 2: 20, 3: 0}


def test_lang_id_heuristic_full(spark):
    from tb_scale_spatial_data_pipeline_spark.functions.text import lang_id_heuristic

    rows = [
        ("これは日本語のテキストです", "ja"),
        ("Это русский текст", "ru"),
        ("der Hund und die Katze ist hier", "de"),
        ("le chat est dans la maison", "fr"),
        ("el perro es una mascota", "es"),
        ("the quick brown fox jumps", "en"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    out = [r["l"] for r in df.select(lang_id_heuristic(F.col("text")).alias("l")).collect()]
    assert out == [lang for _, lang in rows]


def test_connected_components_shapes(spark):
    """Chain, clique, isolated pair, singleton-free: labels converge to
    the min node id of each component regardless of edge direction."""
    from tb_scale_spatial_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [
            # chain 1-2-3-4 (diameter 3: exercises multiple iterations)
            (2, 1), (2, 3), (4, 3),
            # clique 10,11,12
            (10, 11), (11, 12), (10, 12),
            # isolated pair
            (20, 21),
        ],
        "id_a bigint, id_b bigint",
    )
    out = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edges, "id_a", "id_b").collect()
    }
    assert out == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_connected_components_long_chain_converges(spark):
    """A 12-node directed-high-to-low chain needs ~11 propagation
    rounds — proves the convergence loop isn't capped too early."""
    from tb_scale_spatial_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "id_a bigint, id_b bigint"
    )
    out = connected_components(edges, "id_a", "id_b")
    assert {r["cluster_id"] for r in out.collect()} == {1}

def test_connected_components_string_ids(spark):
    """String node ids: the r1/r2 sum-based convergence check was NULL
    on strings and silently stopped after one round — the changed-label
    count must propagate a diameter-3 chain to the lexicographic min."""
    from tb_scale_spatial_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [("d", "c"), ("c", "b"), ("b", "a"), ("x", "y")],
        "id_a string, id_b string",
    )
    out = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edges, "id_a", "id_b").collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_connected_components_raises_on_max_iter(spark):
    """Exhausting max_iter must raise, never return a partial labelling."""
    import pytest

    from tb_scale_spatial_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "id_a bigint, id_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, "id_a", "id_b", max_iter=2)



def test_cc_star_crossover_on_long_chain(spark):
    """The crossover shape (VERDICT r3 #8): a path graph with diameter
    far above the min-label default cap. Min-label propagation needs
    ~diameter rounds — one shuffle each — and raises at the default
    max_iter=25; star contraction folds the same chain in O(log n)
    rounds. Round counts come from the stats out-param and are recorded
    in PLANS.md (§round-5 notes)."""
    import pytest

    from tb_scale_spatial_data_pipeline_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    # 33-node path 1-2-...-33: diameter 32 > default max_iter 25
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 33)], "id_a bigint, id_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, "id_a", "id_b")

    star_stats: dict = {}
    out = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(
            edges, "id_a", "id_b", stats=star_stats
        ).collect()
    }
    assert out == {i: 1 for i in range(1, 34)}
    assert star_stats["rounds"] <= 8  # O(log n), not O(diameter)

    # min-label does converge when the cap admits the diameter — in
    # ~diameter rounds, the measured crossover against star's O(log n)
    minlbl_stats: dict = {}
    out2 = {
        r["node"]: r["cluster_id"]
        for r in connected_components(
            edges, "id_a", "id_b", max_iter=40, stats=minlbl_stats
        ).collect()
    }
    assert out2 == out
    assert minlbl_stats["rounds"] >= 30
    assert star_stats["rounds"] * 3 < minlbl_stats["rounds"]


def test_connected_components_star_matches_label_propagation(spark):
    """Large-star/small-star contraction must produce the identical
    labelling as min-label propagation on every graph shape: chain,
    clique, isolated pair, plus a seeded random graph."""
    import random

    from tb_scale_spatial_data_pipeline_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(42)
    rand_edges = [(rng.randrange(100, 160), rng.randrange(100, 160)) for _ in range(80)]
    shapes = {
        "chain": [(i, i + 1) for i in range(1, 30)],
        "clique+pair": [(10, 11), (11, 12), (10, 12), (20, 21)],
        "random": [(a, b) for a, b in rand_edges if a != b],
    }
    for name, es in shapes.items():
        edges = spark.createDataFrame(es, "id_a bigint, id_b bigint")
        want = {
            r["node"]: r["cluster_id"]
            for r in connected_components(edges, "id_a", "id_b", max_iter=60).collect()
        }
        got = {
            r["node"]: r["cluster_id"]
            for r in connected_components_star(edges, "id_a", "id_b").collect()
        }
        assert got == want, name


def test_connected_components_star_butterfly(spark):
    """Regression: the 'no target is still a source' check alone is not
    a fixed-point test. On {(1,5),(2,6),(3,5),(3,6)} round one contracts
    to {(3,1),(5,1),(3,2),(6,2)} — chain-free, but node 3 carries TWO
    roots, and exiting there returned a split component with node 3
    labelled twice. Convergence now also requires every source to map
    to exactly one distinct target."""
    from tb_scale_spatial_data_pipeline_spark.operators.dedup import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(1, 5), (2, 6), (3, 5), (3, 6)], "id_a bigint, id_b bigint"
    )
    rows = connected_components_star(edges, "id_a", "id_b").collect()
    out = {r["node"]: r["cluster_id"] for r in rows}
    assert len(rows) == len(out) == 5, "each node labelled exactly once"
    assert out == {1: 1, 2: 1, 3: 1, 5: 1, 6: 1}


def test_connected_components_star_string_ids(spark):
    from tb_scale_spatial_data_pipeline_spark.operators.dedup import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [("d", "c"), ("c", "b"), ("b", "a"), ("x", "y")],
        "id_a string, id_b string",
    )
    out = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(edges, "id_a", "id_b").collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_connected_components_star_self_loops(spark):
    """A node appearing only in self-loop edges is its own component —
    both CC variants must label it rather than drop it."""
    from tb_scale_spatial_data_pipeline_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(5, 5), (1, 2), (2, 2)], "id_a bigint, id_b bigint"
    )
    want = {1: 1, 2: 1, 5: 5}
    got_label = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edges, "id_a", "id_b").collect()
    }
    got_star = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(edges, "id_a", "id_b").collect()
    }
    assert got_label == want
    assert got_star == want


def test_salted_join_equals_direct(spark):
    """salted_join must be a pure physical rewrite: identical rows to
    the direct join for both inner and left, including unmatched
    fact rows under 'left'."""
    from tb_scale_spatial_data_pipeline_spark.operators.skew import salted_join

    # skewed fact: 90% of rows share key 0
    fact = spark.createDataFrame(
        [(0 if i % 10 else i % 7, float(i)) for i in range(2000)],
        "k int, v double",
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(5)], "k int, label string"
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    for how in ("inner", "left"):
        direct = fact.join(dim, ["k"], how)
        salted = salted_join(fact, dim, ["k"], n_salts=8, how=how)
        assert rows(salted) == rows(direct), how
    # the salted plan actually splits the hot key across salts
    from pyspark.sql import functions as SF

    f = fact.withColumn("_salt", SF.floor(SF.rand(seed=42) * 8).cast("int"))
    n_groups = f.where("k = 0").select("_salt").distinct().count()
    assert n_groups > 1


def test_triangle_degree_orientation_bounds_hub_wedges(spark):
    """A hub whose id sits mid-range is the id-orientation worst case:
    half its edges point in, half out, so the path-wedge join
    materializes ~(d/2)^2 candidates at the hub. Degree orientation
    makes the hub a pure sink (leaves have lower degree), so it
    generates ZERO wedges — same triangle count either way."""
    from tb_scale_spatial_data_pipeline_spark.operators.graphs import (
        orient_edges,
        oriented_triangle_count,
        wedge_count,
    )

    n = 40
    hub = n // 2
    edges = [(min(i, hub), max(i, hub)) for i in range(n + 1) if i != hub]
    # one leaf-leaf edge to close a single triangle (1, hub, n-1)
    edges.append((1, n - 1))
    e = spark.createDataFrame(edges, "u long, v long")

    w_id = wedge_count(orient_edges(e, by_degree=False))
    w_deg = wedge_count(orient_edges(e, by_degree=True))
    # id orientation: hub has 20 in- and 21 out-edges -> >=400 wedges
    assert w_id >= (hub - 1) * (n - hub)
    # degree orientation: hub is a sink; only the leaf-leaf edge and
    # degree-2 leaves can open wedges
    assert w_deg <= 4
    r_id = oriented_triangle_count(e, by_degree=False).collect()[0]
    r_deg = oriented_triangle_count(e, by_degree=True).collect()[0]
    assert r_id["n_triangles"] == r_deg["n_triangles"] == 1
    assert r_id["n_edges"] == r_deg["n_edges"] == len(edges)


def test_fuzzy_banding_shrinks_blocks(spark):
    """On a skewed name distribution (one dominant first letter — the
    real-corpus case first-char blocking handles worst) the (first
    char, length band) composite key must cut both the max block size
    and the candidate-pair bound by a large factor; and each name is
    replicated into at most 2 band blocks. The fixture part names are
    too few/uniform to exhibit skew, so the distribution is
    synthesized: 200 names sharing first char, lengths spread 5..44."""
    import pyspark.sql.functions as F

    from tb_scale_spatial_data_pipeline_spark.plans.text_queries import (
        fuzzy_name_bands,
    )

    names = [
        ("p" + chr(ord("a") + i % 26) * (5 + (i % 40)) + str(i),)
        for i in range(200)
    ]
    part = spark.createDataFrame(names, "p_name string")

    char_blocks = (
        part.select("p_name")
        .distinct()
        .groupBy(F.substring("p_name", 1, 1).alias("c1"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    char_pairs = sum(r["n"] * (r["n"] - 1) // 2 for r in char_blocks)
    char_max = max(r["n"] for r in char_blocks)
    assert char_max == 200  # the skew scenario under test

    bands = fuzzy_name_bands(part)
    assert bands.count() <= 2 * 200  # replication ceiling
    band_blocks = (
        bands.groupBy("c1", "band").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    # candidate bound = sum over blocks of C(n,2)
    band_pairs = sum(r["n"] * (r["n"] - 1) // 2 for r in band_blocks)
    band_max = max(r["n"] for r in band_blocks)

    assert band_max <= char_max // 4
    assert band_pairs <= char_pairs // 4
