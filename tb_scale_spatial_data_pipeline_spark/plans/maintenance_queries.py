"""Pipeline-maintenance queries: CDC apply (op-coded last-wins merge
into a base table) and incremental aggregate maintenance (base+delta
partials merged, proven equal to the full recompute).

Scale notes (100 TB):
- CDC apply reduces the change stream to ONE row per key (window
  last-wins on (ts, event_id)) before touching the base — the merge
  is then a key-equi outer join, the MERGE INTO shape. The base never
  re-shuffles beyond that single join; deletes drop, upserts
  override, untouched keys pass through.
- Incremental maintenance aggregates ONLY the delta and folds it into
  the saved base partials — sums/counts are mergeable (decimal-exact
  here), so the maintained result is bit-equal to a full recompute,
  which is exactly what the oracle computes. At 100 TB this is the
  difference between scanning a day and scanning the lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import t

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
# CDC apply: events become an op-coded change stream on the customer
# base (signup/purchase = upsert of `value` as the new balance,
# error = delete, click/view = no-op). Last op per key wins, ordered
# by (ts, event_id).
@_q(
    "cdc_apply_changes",
    """
    WITH changes AS (
      SELECT user_id AS key, ts, event_id,
             CASE WHEN event_type IN ('signup', 'purchase') THEN 'U'
                  ELSE 'D' END AS op,
             round(value, 2) AS new_bal
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
    ), last AS (
      SELECT key, op, new_bal, n_changes FROM (
        SELECT *,
          row_number() OVER (PARTITION BY key
                             ORDER BY ts DESC, event_id DESC) AS rn,
          COUNT(*) OVER (PARTITION BY key) AS n_changes
        FROM changes
      ) WHERE rn = 1
    )
    SELECT c.c_custkey,
           round(CASE WHEN l.key IS NULL THEN c.c_acctbal
                      ELSE l.new_bal END, 2) AS final_bal,
           CASE WHEN l.key IS NULL THEN 'base' ELSE 'cdc' END AS src,
           CAST(COALESCE(l.n_changes, 0) AS BIGINT) AS n_changes
    FROM customer c LEFT JOIN last l ON l.key = c.c_custkey
    WHERE l.key IS NULL OR l.op <> 'D'
    """,
)
def q_cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(
        F.col("event_type").isin("signup", "purchase", "error")
    )
    changes = ev.select(
        F.col("user_id").alias("key"),
        "ts",
        "event_id",
        F.when(F.col("event_type").isin("signup", "purchase"), "U")
        .otherwise("D")
        .alias("op"),
        F.round("value", 2).alias("new_bal"),
    )
    w = Window.partitionBy("key").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("key")
    last = (
        changes.withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") == 1)
        .select("key", "op", "new_bal", "n_changes")
    )
    cust = t(spark, sf_dir, "customer")
    merged = cust.join(last, cust.c_custkey == last.key, "left")
    return merged.where(
        F.col("key").isNull() | (F.col("op") != "D")
    ).select(
        "c_custkey",
        F.round(
            F.when(F.col("key").isNull(), F.col("c_acctbal")).otherwise(
                F.col("new_bal")
            ),
            2,
        ).alias("final_bal"),
        F.when(F.col("key").isNull(), "base").otherwise("cdc").alias("src"),
        F.coalesce(F.col("n_changes"), F.lit(0)).cast("bigint").alias(
            "n_changes"
        ),
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance: per-event-type (count, sum)
# maintained as base partials (ts < cutover) + delta partials
# (ts >= cutover), merged. The oracle recomputes from scratch — the
# hash match IS the incremental-equals-full proof.
_CUTOVER = "2024-01-15 00:00:00"


@_q(
    "incremental_agg_maintenance",
    f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events GROUP BY event_type
    """,
)
def q_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"), F.sum(v).alias("s")
        )

    base = partials(ev.where(F.col("ts") < F.lit(_CUTOVER).cast("timestamp")))
    delta = partials(ev.where(F.col("ts") >= F.lit(_CUTOVER).cast("timestamp")))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    return merged.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("s").cast("double").alias("total"),
    )
