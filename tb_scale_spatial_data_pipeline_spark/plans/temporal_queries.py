"""Temporal data-engineering shapes: SCD2 history construction, the
point-in-time (feature-store-correct) join against it, and
exponential smoothing.

These are the training-data-pipeline temporal primitives: SCD2 turns
a change log into validity intervals (one window pass — lead() over
(key, ts)), and the point-in-time join reads a dimension AS OF each
fact's timestamp — the join that prevents feature leakage when
building training sets. At 100 TB both sides shuffle once on the
entity key; the interval containment predicate evaluates inside the
per-key sort-merge join, never as a cross product (each fact matches
exactly one version per key by construction, so output size == fact
size).
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
# SCD2 (type-2 slowly-changing dimension) build: each user's 'signup'
# events act as the change log of a profile attribute (value); every
# change opens a version valid [ts, next_ts), the current version is
# open-ended. One lead() window per key — O(n log n_group) local sort
# after a single shuffle on user_id. Version numbers give the join
# key for downstream version-level audits.
@_q(
    "scd2_history",
    """
    SELECT user_id,
           CAST(row_number() OVER w AS BIGINT) AS version,
           round(value, 2) AS attr_value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S'),
                    '9999-12-31 00:00:00') AS valid_to
    FROM events
    WHERE event_type = 'signup'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(F.col("event_type") == "signup")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.round("value", 2).alias("attr_value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("ts").over(w), "yyyy-MM-dd HH:mm:ss"),
            F.lit("9999-12-31 00:00:00"),
        ).alias("valid_to"),
    )


# ---------------------------------------------------------------------------
# Point-in-time join: each purchase reads the dimension version that
# was valid AT ITS TIMESTAMP — [valid_from, valid_to) containment, the
# anti-leakage join for training-set construction (a plain latest-
# version join would leak future attribute values into past facts).
# Spark plans the equi-key + range predicate as a sort-merge join on
# user_id with the interval test inside; exactly one version matches
# per fact (intervals partition the timeline), so output == facts
# with coverage. Facts before the first version LEFT-join to NULL —
# kept visible (a silent inner join would drop early facts).
@_q(
    "scd2_point_in_time",
    """
    WITH hist AS (
      SELECT user_id, ts AS valid_from,
             COALESCE(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                      TIMESTAMP '9999-12-31') AS valid_to,
             round(value, 2) AS attr_value
      FROM events WHERE event_type = 'signup'
    ),
    facts AS (
      SELECT event_id, user_id, ts, round(value, 2) AS amount
      FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id,
           strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           f.amount, h.attr_value
    FROM facts f
    LEFT JOIN hist h ON h.user_id = f.user_id
                    AND f.ts >= h.valid_from AND f.ts < h.valid_to
    """,
)
def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = ev.where(F.col("event_type") == "signup").select(
        F.col("user_id").alias("h_user"),
        F.col("ts").alias("valid_from"),
        F.coalesce(
            F.lead("ts").over(w), F.lit("9999-12-31").cast("timestamp")
        ).alias("valid_to"),
        F.round("value", 2).alias("attr_value"),
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 2).alias("amount"),
    )
    j = facts.join(
        hist,
        (F.col("user_id") == F.col("h_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("ts") < F.col("valid_to")),
        "left",
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "amount",
        "attr_value",
    )


# ---------------------------------------------------------------------------
# Exponential moving average via the closed form: with rows numbered
# k = 1..n per key (ts order), EMA_n = α·Σ value_k·(1-α)^(n-k)
# + (1-α)^(n-1)·value_1·... — expressed exactly as a windowed sum of
# value_k·(1-α)^(-k) scaled by (1-α)^n, which overflows for long
# histories; the numerically-stable public form used here computes
# EMA recursively per key inside ONE window pass as
# Σ_{j<=k} w_j·v_j / Σ_{j<=k} w_j with w_j = (1/(1-α))^j — both
# engines evaluate the identical expression tree, and round(6)
# pins the comparison. α = 0.2; per-user over purchase values.
@_q(
    "ewma_user_values",
    """
    WITH p AS (
      SELECT user_id, event_id, ts, value,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS DOUBLE) AS k
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           round(SUM(value * power(1.25, k)) OVER w
                 / SUM(power(1.25, k)) OVER w, 6) AS ewma
    FROM p
    WINDOW w AS (PARTITION BY user_id ORDER BY k
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
)
def q_ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weight ratio 1/(1-α) = 1.25 for α = 0.2; the 20-row window bounds
    # the power term (1.25^20 ≈ 87) so no overflow at any history length
    # — the sliding-window EMA approximation standard in monitoring.
    ev = t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    wk = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.row_number().over(wk).cast("double").alias("k"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("k")
        .rowsBetween(-19, Window.currentRow)
    )
    num = F.sum(F.col("value") * F.pow(F.lit(1.25), F.col("k"))).over(w)
    den = F.sum(F.pow(F.lit(1.25), F.col("k"))).over(w)
    return p.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round(num / den, 6).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# Holt linear trend smoothing via Brown's double-exponential form:
# s1 = EWMA(y), s2 = EWMA(s1), level = 2*s1 - s2, trend =
# (alpha/(1-alpha))*(s1 - s2), one-step forecast = level + trend.
# Brown's form makes the trend recursion expressible as TWO CHAINED
# WINDOW PASSES (the same bounded power-weighted sliding-window EWMA
# as ewma_user_values — no driver iteration, no UDF), where the
# direct Holt (l_t, b_t) recursion is a 2x2 matrix power that no
# window sum expresses. Cross-engine seam: s1 is round(6)-ed BEFORE
# feeding the second window — the per-stage re-synchronization that
# makes the nested float windows hash-exact (same discipline as the
# pagerank per-iteration round). alpha = 0.2 -> weight ratio 1.25,
# 20-row window bounds the power term.
@_q(
    "holt_double_smoothing",
    """
    WITH p AS (
      SELECT user_id, event_id, ts, value,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS DOUBLE) AS k
      FROM events WHERE event_type = 'purchase'
    ),
    s1 AS (
      SELECT user_id, event_id, ts, k,
             round(SUM(value * power(1.25, k)) OVER w
                   / SUM(power(1.25, k)) OVER w, 6) AS s1
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY k
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    s2 AS (
      SELECT user_id, event_id, ts, s1,
             round(SUM(s1 * power(1.25, k)) OVER w
                   / SUM(power(1.25, k)) OVER w, 6) AS s2
      FROM s1
      WINDOW w AS (PARTITION BY user_id ORDER BY k
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ),
    u AS (
      SELECT user_id, event_id, ts,
             CAST(round(s1 * 1000000.0, 0) AS BIGINT) AS u1,
             CAST(round(s2 * 1000000.0, 0) AS BIGINT) AS u2
      FROM s2
    )
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(2 * u1 - u2 AS DOUBLE) / 1000000.0 AS level,
           CAST(u1 - u2 AS DOUBLE) / 4000000.0 AS trend,
           CAST(4 * (2 * u1 - u2) + (u1 - u2) AS DOUBLE) / 4000000.0
             AS forecast
    FROM u
    """,
)
def q_holt_double_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    wk = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.row_number().over(wk).cast("double").alias("k"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("k")
        .rowsBetween(-19, Window.currentRow)
    )
    den = F.sum(F.pow(F.lit(1.25), F.col("k"))).over(w)
    s1df = p.select(
        "user_id",
        "event_id",
        "ts",
        "k",
        F.round(
            F.sum(F.col("value") * F.pow(F.lit(1.25), F.col("k"))).over(w) / den,
            6,
        ).alias("s1"),
    )
    den2 = F.sum(F.pow(F.lit(1.25), F.col("k"))).over(w)
    s2df = s1df.select(
        "user_id",
        "event_id",
        "ts",
        "s1",
        F.round(
            F.sum(F.col("s1") * F.pow(F.lit(1.25), F.col("k"))).over(w) / den2,
            6,
        ).alias("s2"),
    )
    # final combination on the INTEGER micro-lattice: s1/s2 are 6dp
    # doubles, so u1/u2 are exact BIGINTs; level/trend/forecast are
    # then one exact integer expression + ONE final double division —
    # no round() at all, hence no half-boundary ambiguity (the raw
    # 0.25*(s1-s2) form lands exactly on x.5e-6 whenever
    # (u1-u2) % 4 == 2 and 1-ulp engine noise flips the round).
    u = s2df.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("s1") * 1000000.0, 0).cast("bigint").alias("u1"),
        F.round(F.col("s2") * 1000000.0, 0).cast("bigint").alias("u2"),
    )
    return u.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        ((2 * F.col("u1") - F.col("u2")).cast("double") / 1000000.0).alias(
            "level"
        ),
        ((F.col("u1") - F.col("u2")).cast("double") / 4000000.0).alias("trend"),
        (
            (4 * (2 * F.col("u1") - F.col("u2")) + (F.col("u1") - F.col("u2")))
            .cast("double")
            / 4000000.0
        ).alias("forecast"),
    )
