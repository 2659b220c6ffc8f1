"""Third relational batch: skew salting, analytic window frames,
anti/range joins, grouping sets, and full ANN paths (top-1 within LSH
bucket; IVF centroid assignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.skew import salted_agg
from ..sources.catalog import register_views
from ._util import t, dsum, sql_dsum

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Skew salting: two-stage aggregation must equal the direct aggregate
# (the oracle is the UNsalted query — proving salting is a pure
# physical rewrite).
@_q(
    "salted_skew_agg",
    f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           {sql_dsum('l_quantity')} AS sum_qty,
           max(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "n": (F.lit(1), "count"),
            "_sq": (F.col("l_quantity").cast("decimal(18,2)"), "sum"),
            "max_price": (F.col("l_extendedprice"), "max"),
        },
        n_salts=16,
    )
    return out.select(
        "l_returnflag", "n", F.col("_sq").cast("double").alias("sum_qty"), "max_price"
    )


# ---------------------------------------------------------------------------
# Analytic window frames: lag delta + 3-row moving sum per customer
# (free Spark extension over the reference's W1/W2 surface).
@_q(
    "window_analytics",
    """
    SELECT o_orderkey, o_custkey,
           coalesce(o_totalprice - lag(o_totalprice) OVER w, 0.0) AS delta_prev,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3,
           CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS INT) AS price_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w3 = w.rowsBetween(-2, Window.currentRow)
    wq = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.coalesce(
            F.col("o_totalprice") - F.lag("o_totalprice").over(w), F.lit(0.0)
        ).alias("delta_prev"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w3)
        .cast("double")
        .alias("moving_sum3"),
        F.ntile(4).over(wq).cast("int").alias("price_quartile"),
    )


# ---------------------------------------------------------------------------
# Anti join (left-anti): customers with no URGENT orders.
@_q(
    "anti_join_customers",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    urgent = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(urgent, on="c_custkey", how="left_anti").select(
        "c_custkey", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# Range (interval) join: events bucketed into value bands via a
# non-equi join against a tiny derived band table (broadcast nested
# loop — correct physical choice when one side is rows-of-ranges).
@_q(
    "range_join_bands",
    f"""
    WITH bands AS (
      SELECT i * 50.0 AS lo, (i + 1) * 50.0 AS hi, CAST(i AS INT) AS band
      FROM (SELECT unnest(generate_series(0, 9)) AS i)
    )
    SELECT b.band, COUNT(*) AS n, {sql_dsum('e.value')} AS sum_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    bands = spark.range(0, 10).select(
        (F.col("id") * 50.0).alias("lo"),
        ((F.col("id") + 1) * 50.0).alias("hi"),
        F.col("id").cast("int").alias("band"),
    )
    joined = ev.join(
        F.broadcast(bands), (ev["value"] >= bands["lo"]) & (ev["value"] < bands["hi"])
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_value")
    )


# ---------------------------------------------------------------------------
# GROUPING SETS (beyond rollup/cube): chosen aggregation lattice.
@_q(
    "grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


# ---------------------------------------------------------------------------
# Full ANN path: top-1 neighbor per vector WITHIN its sign-LSH bucket
# (the bucket join is the scale path: candidates per query = bucket
# size, not corpus size).
def _sql_ann_top1() -> str:
    from .vector_queries import _sql_cosine, _sql_lsh_buckets

    return f"""
    WITH b AS ({_sql_lsh_buckets()}),
    pairs AS (
      SELECT qa.vec_id AS query_id, ca.vec_id AS cand_id,
             round({_sql_cosine('qe.embedding', 'ce.embedding')}, 6) AS cos_sim
      FROM b qa
      JOIN b ca ON qa.bucket = ca.bucket AND qa.vec_id <> ca.vec_id
      JOIN embeddings qe ON qe.vec_id = qa.vec_id
      JOIN embeddings ce ON ce.vec_id = ca.vec_id
    )
    SELECT query_id, cand_id AS nn_id, cos_sim
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, cand_id) AS rn
      FROM pairs
    ) WHERE rn = 1
    """


@_q("ann_top1_in_bucket", _sql_ann_top1())
def q_ann_top1_in_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import cosine_similarity
    from ..operators.similarity import as_double_array, lsh_ann_buckets
    from .vector_queries import DIM, N_PLANES

    emb = t(spark, sf_dir, "embeddings")
    buckets = lsh_ann_buckets(emb, "embedding", "vec_id", dim=DIM, n_planes=N_PLANES)
    withb = emb.join(buckets, "vec_id").select("vec_id", "bucket", "embedding")
    a = withb.select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket").alias("b_a"),
        F.col("embedding").alias("qe"),
    )
    b = withb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("bucket").alias("b_b"),
        F.col("embedding").alias("ce"),
    )
    pairs = a.join(b, (a["b_a"] == b["b_b"]) & (a["query_id"] != b["cand_id"]))
    sim = F.round(
        cosine_similarity(as_double_array(F.col("qe")), as_double_array(F.col("ce"))), 6
    )
    scored = pairs.select("query_id", "cand_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("query_id", F.col("cand_id").alias("nn_id"), "cos_sim")
    )


# ---------------------------------------------------------------------------
# IVF-style ANN, assignment pass: nearest of 8 deterministic centroids
# (the first 8 vectors) per corpus vector — the coarse quantizer whose
# cells bound the search space at scale.
def _sql_ivf_assign() -> str:
    from .vector_queries import DIM

    dist = (
        f"sqrt(list_aggregate(list_transform(generate_series(1, {DIM}), "
        f"i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) "
        f"* (CAST(e.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE))), 'sum'))"
    )
    return f"""
    WITH cents AS (SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id < 8)
    SELECT vec_id, centroid_id
    FROM (
      SELECT e.vec_id, c.centroid_id,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY round({dist}, 9), c.centroid_id) AS rn
      FROM embeddings e CROSS JOIN cents c
    ) WHERE rn = 1
    """


@_q("ivf_assign", _sql_ivf_assign())
def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import l2_distance
    from ..operators.similarity import as_double_array

    emb = t(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    pairs = emb.select("vec_id", "embedding").crossJoin(F.broadcast(cents))
    dist = F.round(
        l2_distance(as_double_array(F.col("embedding")), as_double_array(F.col("ce"))), 9
    )
    w = Window.partitionBy("vec_id").orderBy(dist.asc(), F.col("centroid_id").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )
