"""Distributed Lloyd k-means over an embedding column — the iterative
algorithm tier of the similarity stack (SURVEY §7.5: the IVF coarse
quantizer's centroids come from exactly this loop; `ivf_assign` /
`ivf_fine_search` consume them).

Scale design (the part that matters at 100 TB):
- Each iteration is ONE distributed pass: broadcast the k×dim
  centroid table (tiny), assign via min_by over the k candidate
  distances (map-side, no shuffle for the argmin), then recompute
  means with a single posexplode → groupBy(cluster, dim) aggregation
  (one shuffle of k×dim partial sums per partition — constant-size
  map-side state, independent of row count).
- Only k×dim numbers ever reach the driver (the new centroids); the
  corpus never moves. Iteration count is the only driver round-trip.
- Deterministic: init = first k vectors by id (no RNG), and the mean
  recomputation uses decimal-exact partial sums so assignments are
  partition-order-independent across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import l2_distance


def _assign(df: DataFrame, vec_col: str, cents: DataFrame) -> DataFrame:
    """One assignment pass: nearest centroid id per row."""
    cand = df.join(F.broadcast(cents))
    d = F.round(l2_distance(F.col(vec_col), F.col("cvec")), 9)
    # min_by over a (dist, cid) struct: deterministic tiebreak, no sort
    return cand.groupBy(*df.columns).agg(
        F.min_by("cid", F.struct(d.alias("d"), F.col("cid"))).alias("cluster")
    )


def lloyd_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Run `iters` Lloyd iterations; returns (id, cluster) assignments.

    Init is the first k vectors ordered by id — deterministic and
    partition-independent (contrast the reference's order-dependent
    sequential IDs, SURVEY §7 hard-part 3).
    """
    spark = df.sparkSession
    init = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).alias("cvec"))
        .collect()
    )
    cents = spark.createDataFrame(
        [(i, [float(v) for v in r["cvec"]]) for i, r in enumerate(init)],
        "cid int, cvec array<double>",
    )
    data = df.select(id_col, vec_col)
    for _ in range(iters):
        assigned = _assign(data, vec_col, cents)
        # mean per (cluster, dim): one posexplode pass, decimal-exact
        # partial sums → order-independent means
        new_rows = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.col("v").cast("decimal(28,9)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cluster",
                F.transform(F.col("pm"), lambda s: s["m"]).alias("cvec"),
            )
            .collect()
        )
        cents = spark.createDataFrame(
            [(int(r["cluster"]), [float(v) for v in r["cvec"]]) for r in new_rows],
            "cid int, cvec array<double>",
        )
    return _assign(data, vec_col, cents).select(
        id_col, "cluster"
    ), cents


def kmeans_cluster_profile(
    spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 3
) -> DataFrame:
    """Registry query: cluster sizes + within-cluster scatter after
    `iters` Lloyd iterations over the embeddings fixture."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    assigned, cents = lloyd_kmeans(emb, "vec_id", "e", k=k, iters=iters)
    j = assigned.join(emb, "vec_id").join(
        F.broadcast(cents), F.col("cluster") == F.col("cid")
    )
    return (
        j.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal partial sums: the scatter total is identical
            # under any partitioning (double sums are order-dependent)
            F.round(
                F.sum(
                    l2_distance(F.col("e"), F.col("cvec")).cast("decimal(18,6)")
                ).cast("double"),
                4,
            ).alias("scatter_l2"),
        )
        .orderBy("cluster")
    )
