"""Distributed Lloyd k-means over an embedding column — the iterative
algorithm tier of the similarity stack (SURVEY §7.5: the IVF coarse
quantizer's centroids come from exactly this loop; `ivf_assign` /
`ivf_fine_search` consume them).

Scale design (the part that matters at 100 TB):
- Each iteration is ONE distributed pass. The k×dim centroid table is
  tiny, so it is embedded as a LITERAL array-of-structs column and the
  assignment is a pure projection: ``array_min(transform(cents, c ->
  struct(dist, cid)))``. No join, no groupBy — the assign stage
  contains ZERO Exchange (plan-asserted in tests/test_kmeans.py).
- Means are recomputed with a single posexplode → groupBy(cluster, dim)
  aggregation: one shuffle of k×dim partial sums per partition —
  constant-size map-side state, independent of row count.
- Only k×dim numbers ever reach the driver (the new centroids); the
  corpus never moves. Iteration count is the only driver round-trip.
- Deterministic: init = first k vectors by id (no RNG), distances are
  rounded to 9 decimals with cid as tiebreak, and the mean
  recomputation uses decimal-exact partial sums so assignments are
  partition-order-independent across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import l2_distance


def _cent_literal_sql(cent_rows: list[tuple[int, list[float]]]) -> str:
    """k×dim centroids as SQL text for an array<struct<cid,cvec>>
    literal. Exact double literals via string casts; generated as TEXT
    because composing the same tree from Column operators costs one
    py4j round-trip per element (~500 per call — measured dominant
    over execution in the PQ tier, same pathology here)."""
    structs = ", ".join(
        "named_struct('cid', {cid}, 'cvec', array({vs}))".format(
            cid=int(cid),
            vs=", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in vec),
        )
        for cid, vec in cent_rows
    )
    return f"array({structs})"


def _assign(
    df: DataFrame, vec_col: str, cent_rows: list[tuple[int, list[float]]]
) -> DataFrame:
    """One assignment pass: nearest centroid id per row.

    Pure projection — centroids ride along as a literal, the argmin is
    ``array_min`` over (dist, cid) structs (deterministic tiebreak, no
    sort, no shuffle, no join). The distance is the same
    sqrt(aggregate(zip_with)) fold as functions.vectors.l2_distance,
    rounded to 9 with cid tiebreak — expressed as one generated SQL
    string for a single py4j call."""
    dist = (
        f"round(sqrt(aggregate(zip_with({vec_col}, c.cvec, "
        "(x, y) -> (x - y) * (x - y)), 0.0d, (acc, v) -> acc + v)), 9)"
    )
    best = (
        f"array_min(transform({_cent_literal_sql(cent_rows)}, "
        f"c -> named_struct('d', {dist}, 'cid', c.cid)))['cid']"
    )
    return df.withColumn("cluster", F.expr(best))


def lloyd_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Run `iters` Lloyd iterations; returns (assignments, centroids)
    as ((id, cluster) DataFrame, (cid, cvec) DataFrame).

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
    cent_rows = [(i, [float(v) for v in r["cvec"]]) for i, r in enumerate(init)]
    data = df.select(id_col, vec_col)
    for _ in range(iters):
        assigned = _assign(data, vec_col, cent_rows)
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
        cent_rows = [
            (int(r["cluster"]), [float(v) for v in r["cvec"]]) for r in new_rows
        ]
        cent_rows.sort()
    cents = spark.createDataFrame(cent_rows, "cid int, cvec array<double>")
    return _assign(data, vec_col, cent_rows).select(id_col, "cluster"), cents


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
