"""Training-data preparation operators: the feature-engineering
passes an ML pipeline runs between raw tables and a trainer.

Every query is pure Catalyst (no Python UDFs) and oracle-paired:
deterministic md5-based hashing replaces RNG wherever randomness
would normally appear (splits, feature hashing), which is exactly how
production pipelines make preprocessing reproducible across runs and
engines anyway.
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
# Leave-one-out target encoding — the standard high-cardinality
# categorical feature: each row's category is encoded by the mean of
# the target over OTHER rows of the same category, (sum − y)/(n − 1),
# which kills the self-leakage a plain group mean has. One grouped
# aggregate broadcast back; decimal-exact sum, the division is the
# only float op (round(6) both engines). Singleton categories → NULL
# (no peers), kept visible rather than imputed.
@_q(
    "loo_target_encoding",
    """
    WITH g AS (
      SELECT o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey, o.o_orderpriority,
           CASE WHEN g.n > 1
                THEN round((g.s - o.o_totalprice) / (g.n - 1), 6)
           END AS loo_mean_price
    FROM orders o JOIN g ON g.o_orderpriority = o.o_orderpriority
    """,
)
def q_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    g = orders.groupBy(F.col("o_orderpriority").alias("cat")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    j = orders.join(F.broadcast(g), F.col("o_orderpriority") == F.col("cat"))
    return j.select(
        "o_orderkey",
        "o_orderpriority",
        F.when(
            F.col("n") > 1,
            F.round((F.col("s") - F.col("o_totalprice")) / (F.col("n") - 1), 6),
        ).alias("loo_mean_price"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified train/valid/test split: assignment is a
# pure function of the row key (md5 bucket 0..99 → 80/10/10), so the
# split is reproducible on any engine/cluster/day with NO stored split
# table — the property that matters when the corpus is 100 TB and
# "remember which rows were test" is itself a big-data problem.
# Output: per (lang, split) counts + label balance check columns.
@_q(
    "train_test_split_hash",
    """
    WITH assigned AS (
      SELECT lang,
             CASE
               WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                         AS INTEGER) % 100 < 80 THEN 'train'
               WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                         AS INTEGER) % 100 < 90 THEN 'valid'
               ELSE 'test' END AS split,
             length(text) AS len
      FROM documents
    )
    SELECT lang, split, COUNT(*) AS n_docs,
           CAST(SUM(len) AS BIGINT) AS total_chars
    FROM assigned GROUP BY lang, split
    """,
)
def q_train_test_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    assigned = docs.select(
        "lang",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
        F.length("text").alias("len"),
    )
    return assigned.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("len").cast("bigint").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Feature hashing (the "hashing trick"): token → md5 % D buckets, per
# (doc, bucket) counts — the fixed-width sparse text featurization
# that needs NO vocabulary pass (the whole point at 100 TB: one scan,
# no global dictionary to build or broadcast). D = 64; output: top
# bucket per doc + collision-aware count, for the first 200 docs.
@_q(
    "feature_hashing_vectors",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
      FROM documents WHERE doc_id < 200
    ),
    hashed AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(tok), 1, 4)) AS INTEGER) % 64
               AS bucket
      FROM toks WHERE tok <> ''
    ),
    counts AS (
      SELECT doc_id, bucket, COUNT(*) AS n
      FROM hashed GROUP BY doc_id, bucket
    )
    SELECT doc_id, bucket AS top_bucket, n AS top_count
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY n DESC, bucket) AS rn
      FROM counts
    ) WHERE rn = 1
    """,
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("tok"),
    ).where(F.col("tok") != "")
    hashed = toks.select(
        "doc_id",
        (F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int") % 64).alias(
            "bucket"
        ),
    )
    counts = hashed.groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("n"), F.asc("bucket"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("bucket").alias("top_bucket"),
            F.col("n").alias("top_count"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram conditional probabilities — the first step of any n-gram LM:
# P(w2 | w1) = count(w1 w2) / count(w1 ·). Adjacency comes from a
# posexplode + window lag within each document (token order is the
# per-doc position — no cross-doc bigrams). Output: top-20 bigrams by
# count with conditional probability, deterministic ties.
@_q(
    "bigram_conditional_prob",
    """
    WITH arrs AS (
      SELECT doc_id,
             string_split_regex(lower(text), '[^a-z0-9]+') AS arr
      FROM documents
    ),
    toks AS (
      SELECT doc_id, i AS pos, arr[i] AS w
      FROM arrs, unnest(range(1, len(arr) + 1)) AS u(i)
      WHERE arr[i] <> ''
    ),
    bi AS (
      SELECT doc_id, w AS w1,
             lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ),
    bc AS (
      SELECT w1, w2, COUNT(*) AS n_bigram
      FROM bi WHERE w2 IS NOT NULL GROUP BY w1, w2
    ),
    uc AS (
      SELECT w1, SUM(n_bigram) AS n_w1 FROM bc GROUP BY w1
    )
    SELECT bc.w1, bc.w2, bc.n_bigram,
           round(CAST(bc.n_bigram AS DOUBLE) / uc.n_w1, 6) AS cond_prob
    FROM bc JOIN uc ON uc.w1 = bc.w1
    ORDER BY bc.n_bigram DESC, bc.w1, bc.w2 LIMIT 20
    """,
)
def q_bigram_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("pos", "w"),
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    bi = toks.select(
        "doc_id", F.col("w").alias("w1"), F.lead("w").over(w_doc).alias("w2")
    ).where(F.col("w2").isNotNull())
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_bigram"))
    uc = bc.groupBy(F.col("w1").alias("u1")).agg(F.sum("n_bigram").alias("n_w1"))
    return (
        bc.join(uc, F.col("w1") == F.col("u1"))
        .select(
            "w1",
            "w2",
            "n_bigram",
            F.round(F.col("n_bigram").cast("double") / F.col("n_w1"), 6).alias(
                "cond_prob"
            ),
        )
        .orderBy(F.desc("n_bigram"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over user event sequences:
# P(next event type | current) from lag pairs per user — the
# behavioral-model fit that funnel/sessionization queries feed. Same
# window discipline as sessionization: one shuffle on user_id.
@_q(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    c AS (
      SELECT cur, nxt, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    m AS (SELECT cur, SUM(n) AS tot FROM c GROUP BY cur)
    SELECT c.cur, c.nxt, c.n,
           round(CAST(c.n AS DOUBLE) / m.tot, 6) AS p
    FROM c JOIN m ON m.cur = c.cur
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    c = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    m = c.groupBy(F.col("cur").alias("mcur")).agg(F.sum("n").alias("tot"))
    return (
        c.join(F.broadcast(m), F.col("cur") == F.col("mcur"))
        .select(
            "cur",
            "nxt",
            "n",
            F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("p"),
        )
    )
