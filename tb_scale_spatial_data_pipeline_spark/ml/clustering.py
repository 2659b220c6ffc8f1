"""Distributed Lloyd k-means over an embedding column — the iterative
algorithm tier of the similarity stack (SURVEY §7.5: the IVF coarse
quantizer's centroids come from exactly this loop; `ivf_assign` /
`ivf_fine_search` consume the same first-k convention).

Scale design (the part that matters at 100 TB):
- Each iteration is ONE distributed pass. The k×dim centroid table is
  tiny, so it is embedded as a LITERAL array-of-structs column and the
  assignment is a pure projection: ``array_min(transform(cents, c ->
  struct(dist2, cid)))``. No join, no groupBy — the assign stage
  contains ZERO Exchange (plan-asserted in tests/test_kmeans.py).
- Means are recomputed with a single posexplode → groupBy(cluster, dim)
  aggregation: one shuffle of k×dim partial sums per partition —
  constant-size map-side state, independent of row count.
- Only k×dim numbers ever reach the driver (the new centroids); the
  corpus never moves. Iteration count is the only driver round-trip.

EXACT-LATTICE determinism (the r10 upgrade that makes the registry
query hash-checkable against an unrolled-CTE DuckDB twin): vectors
quantize once to round(x·1e6) BIGINT (the engine-wide micro-lattice
convention, PLANS.md), every distance² is an exact BIGINT fold, the
argmin tiebreak is (dist², cid), and each new centroid coordinate is
the lattice point nearest the member mean — round-half-away-from-zero
of Σxᵢ/n computed in EXACT integer arithmetic:
    c' = sign(s) · ((2·|s| + n) div (2·n)).
Rounding the mean back onto the lattice keeps Lloyd's descent
guarantee: c' is a nearest lattice point to the true mean m and the
old centroid c is itself a lattice point, so n·(m−c')² ≤ n·(m−c)²
dim-by-dim and scatter still decreases monotonically (tested).
Clusters that lose all members are DROPPED (both engines derive the
survivor set from the same groupBy). All quantities exact integers ⇒
zero FP seam anywhere in the loop. BIGINT bounds: |x|≤1 ⇒ dist² ≤
dim·4e12 and the per-cluster scatter sum stays exact up to ~2·10⁶
rows per cluster at dim=64; beyond that flip the scatter aggregation
to decimal(38,0) (documented knob, not needed at fixture scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MICRO = 1_000_000


def quantize_micros(vec_col) -> "F.Column":
    """array<float/double> → array<bigint> on the micro-lattice:
    round(x·1e6) half-away-from-zero — the identical expression DuckDB
    evaluates (`CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)`)."""
    return F.transform(
        vec_col, lambda x: F.round(x.cast("double") * MICRO).cast("bigint")
    )


def _cent_literal_sql(cent_rows: list[tuple[int, list[int]]]) -> str:
    """k×dim centroids as SQL text for an array<struct<cid,cvec>>
    literal — exact BIGINT literals; generated as TEXT because
    composing the same tree from Column operators costs one py4j
    round-trip per element (~500 per call — measured dominant over
    execution in the PQ tier, same pathology here)."""
    structs = ", ".join(
        "named_struct('cid', {cid}L, 'cvec', array({vs}))".format(
            cid=int(cid), vs=", ".join(f"{int(v)}L" for v in vec)
        )
        for cid, vec in cent_rows
    )
    return f"array({structs})"


def _assign(
    df: DataFrame, qvec_col: str, cent_rows: list[tuple[int, list[int]]]
) -> DataFrame:
    """One assignment pass: nearest centroid id per row, plus the exact
    integer distance² to it.

    Pure projection — centroids ride along as a literal, the argmin is
    ``array_min`` over (dist², cid) structs (deterministic tiebreak, no
    sort, no shuffle, no join). dist² is an exact BIGINT zip_with fold,
    so there is no rounding seam at all."""
    dist2 = (
        f"aggregate(zip_with({qvec_col}, c.cvec, "
        "(x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"
    )
    best = (
        f"array_min(transform({_cent_literal_sql(cent_rows)}, "
        f"c -> named_struct('d', {dist2}, 'cid', c.cid)))"
    )
    return df.withColumn("_best", F.expr(best)).select(
        "*",
        F.col("_best.cid").alias("cluster"),
        F.col("_best.d").alias("dist2"),
    ).drop("_best")


def round_mean_micros(s: int, n: int) -> int:
    """Nearest lattice point to s/n, half away from zero — exact
    integer arithmetic, the same formula the SQL twin unrolls."""
    s, n = int(s), int(n)
    if s >= 0:
        return (2 * s + n) // (2 * n)
    return -((2 * (-s) + n) // (2 * n))


def lloyd_kmeans(
    df: DataFrame,
    id_col: str,
    qvec_col: str,
    k: int = 8,
    iters: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Run `iters` Lloyd iterations on the micro-lattice; returns
    (assignments, centroids) as ((id, cluster, dist2) DataFrame,
    (cid, cvec array<bigint>) DataFrame). `qvec_col` must already be
    quantized (see `quantize_micros`).

    Init is the first k vectors ordered by id — deterministic and
    partition-independent (contrast the reference's order-dependent
    sequential IDs, SURVEY §7 hard-part 3)."""
    spark = df.sparkSession
    init = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(qvec_col).alias("cvec"))
        .collect()
    )
    cent_rows = [(i, [int(v) for v in r["cvec"]]) for i, r in enumerate(init)]
    data = df.select(id_col, qvec_col)
    for _ in range(iters):
        assigned = _assign(data, qvec_col, cent_rows)
        # per-(cluster, dim) exact integer sums: one posexplode pass;
        # the rounded-mean centroid is computed driver-side from the
        # k×dim (sum, count) pairs — exact ints end to end
        new_rows = (
            assigned.select("cluster", F.posexplode(qvec_col).alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            # bounded: k*dim (sum,count) rows per iteration
            .collect()
        )
        cents: dict[int, dict[int, int]] = {}
        for r in new_rows:
            cents.setdefault(int(r["cluster"]), {})[int(r["pos"])] = (
                round_mean_micros(r["s"], r["n"])
            )
        cent_rows = [
            (cid, [dims[p] for p in sorted(dims)])
            for cid, dims in sorted(cents.items())
        ]
    cents_df = spark.createDataFrame(
        cent_rows, "cid bigint, cvec array<bigint>"
    )
    return (
        _assign(data, qvec_col, cent_rows).select(id_col, "cluster", "dist2"),
        cents_df,
    )


def kmeans_cluster_profile(
    spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 3
) -> DataFrame:
    """Registry query: cluster sizes + within-cluster scatter (exact
    Σ dist² in micros², BIGINT) after `iters` Lloyd iterations over the
    embeddings fixture — hash-checked against the unrolled-CTE DuckDB
    twin in plans/vector_queries.py."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", quantize_micros(F.col("embedding")).alias("qv")
    )
    assigned, _ = lloyd_kmeans(emb, "vec_id", "qv", k=k, iters=iters)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # Accumulate in decimal(38,0): a BIGINT sum wraps silently in
            # non-ANSI Spark, and the per-coordinate micros² bound
            # (dim * 4e12 per row) overflows 2^63 after only ~2.3k rows
            # per cluster at dim=64 for non-unit-norm fixtures. The
            # decimal sum is exact to 38 digits; the final cast fails
            # loudly (ANSI) or NULLs (legacy) instead of wrapping.
            F.sum(F.col("dist2").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("scatter_sq"),
        )
        .orderBy("cluster")
    )
