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


# ---------------------------------------------------------------------------
# Centroid-silhouette cluster-quality report on an EXACT integer
# lattice. Per-coordinate values quantize to round(x*1e6) BIGINTs, so
# the per-label centroid is the exact pair (S_c = sum of quantized
# coords, n_c) and the squared distance to a centroid is
# sum_d (x_d * n_c - S_cd)^2 — DECIMAL(38,0)-exact, order-independent,
# engine-identical; only the final sqrt/divide/ratio run in double.
# a = distance to own centroid, b = min over other centroids,
# silhouette = (b-a)/max(a,b), per-point values rounded to the
# DECIMAL(18,6) lattice before the per-label mean (so the mean is an
# exact sum too). Scale: centroids are k x dim rows (broadcast); each
# point expands to dim x k terms map-side and reduces immediately —
# the same bounded shape as the IVF assign step.
@_q(
    "cluster_silhouette_report",
    """
    WITH pts AS (
      SELECT vec_id, label, i AS pos,
             -- DOUBLE first: float32 multiply quantizes off-by-one
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xi
      FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS s(i)
    ), cent AS (
      SELECT label AS clabel, pos,
             CAST(SUM(xi) AS DECIMAL(38,0)) AS s,
             COUNT(DISTINCT vec_id) AS n
      FROM pts GROUP BY label, pos
    ), d2 AS (
      SELECT p.vec_id, p.label, c.clabel,
             SUM(CAST((p.xi * cn.n - c.s) * (p.xi * cn.n - c.s)
                      AS DECIMAL(38,0))) AS dd,
             cn.n AS cn
      FROM pts p
      JOIN (SELECT clabel, max(n) AS n FROM cent GROUP BY clabel) cn ON TRUE
      JOIN cent c ON c.clabel = cn.clabel AND c.pos = p.pos
      GROUP BY p.vec_id, p.label, c.clabel, cn.n
    ), dist AS (
      SELECT vec_id, label, clabel,
             sqrt(CAST(dd AS DOUBLE)) / cn / 1000000.0 AS d
      FROM d2
    ), ab AS (
      SELECT vec_id, label,
             min(CASE WHEN clabel = label THEN d END) AS a,
             min(CASE WHEN clabel <> label THEN d END) AS b
      FROM dist GROUP BY vec_id, label
    ), sil AS (
      SELECT label,
             CAST(round((b - a) / GREATEST(a, b), 6) AS DECIMAL(18,6)) AS s
      FROM ab
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           round(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS mean_silhouette
    FROM sil GROUP BY label ORDER BY label
    """,
)
def q_cluster_silhouette_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "x"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("x") * 1000000).cast("bigint").alias("xi"),
    )
    cent = pts.groupBy(
        F.col("label").alias("clabel"), F.col("pos").alias("cpos")
    ).agg(
        F.sum("xi").cast("decimal(38,0)").alias("s"),
        F.countDistinct("vec_id").alias("n"),
    )
    d2 = (
        pts.join(F.broadcast(cent), F.col("pos") == F.col("cpos"))
        .select(
            "vec_id",
            "label",
            "clabel",
            "n",
            ((F.col("xi") * F.col("n") - F.col("s"))
             * (F.col("xi") * F.col("n") - F.col("s"))).cast("decimal(38,0)").alias("t"),
        )
        .groupBy("vec_id", "label", "clabel", "n")
        .agg(F.sum("t").alias("dd"))
    )
    dist = d2.select(
        "vec_id",
        "label",
        "clabel",
        (F.sqrt(F.col("dd").cast("double")) / F.col("n") / 1000000.0).alias("d"),
    )
    ab = dist.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("clabel") == F.col("label"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d"))).alias("b"),
    )
    sil = ab.select(
        "label",
        F.round(
            (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b")), 6
        )
        .cast("decimal(18,6)")
        .alias("s"),
    )
    return (
        sil.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum("s").cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_silhouette"
            ),
        )
        .select(
            F.col("label").cast("bigint").alias("label"),
            F.col("n_points").cast("bigint").alias("n_points"),
            "mean_silhouette",
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Weight-of-evidence / information-value binning — the credit-scoring
# feature-strength report: deciles of o_totalprice vs the binary
# target "urgent-or-high priority". Counts are exact; WoE =
# ln(good_share/bad_share) and the IV term (gs - bs)*WoE are the only
# floats, emitted PER BIN (the caller sums 10 rows for total IV).
# Decile assignment is tiebroken by o_orderkey so it is a pure
# function of global rank; the Spark side finds the 9 decile
# boundaries by exact distributed selection (operators/quantiles.py —
# no single-partition ntile window over raw orders, round-6 verdict
# item 3) and bins with broadcast literal cut-tuples, which with a
# unique sort key reproduces the oracle's ntile bit-for-bit.
_WOE_BINS = 10


@_q(
    "woe_iv_binning",
    f"""
    WITH base AS (
      SELECT o_totalprice AS v, o_orderkey AS k,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ), binned AS (
      SELECT y, ntile({_WOE_BINS}) OVER (ORDER BY v, k) AS bin FROM base
    ), cells AS (
      SELECT bin, SUM(y) AS n_good, COUNT(*) - SUM(y) AS n_bad
      FROM binned GROUP BY bin
    ), tot AS (
      SELECT SUM(n_good) AS tg, SUM(n_bad) AS tb FROM cells
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(n_good AS BIGINT) AS n_good, CAST(n_bad AS BIGINT) AS n_bad,
           round(ln((n_good / CAST(tg AS DOUBLE))
                    / (n_bad / CAST(tb AS DOUBLE))), 6) AS woe,
           round((n_good / CAST(tg AS DOUBLE) - n_bad / CAST(tb AS DOUBLE))
                 * ln((n_good / CAST(tg AS DOUBLE))
                      / (n_bad / CAST(tb AS DOUBLE))), 6) AS iv_term
    FROM cells CROSS JOIN tot
    ORDER BY bin
    """,
)
def q_woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import ntile_bin_column

    orders = t(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_totalprice").alias("v"),
        F.col("o_orderkey").alias("k"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("y"),
    )
    binned = base.select(
        "y", ntile_bin_column(base, ["v", "k"], _WOE_BINS).alias("bin")
    )
    cells = binned.groupBy("bin").agg(
        F.sum("y").alias("n_good"),
        (F.count(F.lit(1)) - F.sum("y")).alias("n_bad"),
    )
    tot = cells.agg(
        F.sum("n_good").alias("tg"), F.sum("n_bad").alias("tb")
    )
    gs = F.col("n_good") / F.col("tg").cast("double")
    bs = F.col("n_bad") / F.col("tb").cast("double")
    woe = F.log(gs / bs)
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            F.col("n_good").cast("bigint").alias("n_good"),
            F.col("n_bad").cast("bigint").alias("n_bad"),
            F.round(woe, 6).alias("woe"),
            F.round((gs - bs) * woe, 6).alias("iv_term"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# k-fold cross-validation assignment audit: fold = md5(key) % k (the
# same deterministic split family as train_test_split_hash), with the
# report a CV harness needs before training — per-fold size and label
# balance. Pure hash + one aggregation; folds are reproducible on any
# cluster with no assignment table.
_CV_FOLDS = 5


@_q(
    "kfold_assignment_audit",
    f"""
    WITH folds AS (
      SELECT CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {_CV_FOLDS} AS fold,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(y) AS BIGINT) AS n_positive,
           round(SUM(y) / CAST(COUNT(*) AS DOUBLE), 6) AS positive_rate
    FROM folds GROUP BY fold ORDER BY fold
    """,
)
def q_kfold_assignment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    fold = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % _CV_FOLDS
    )
    y = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        orders.select(fold.alias("fold"), y.alias("y"))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("y").cast("bigint").alias("n_positive"),
            F.round(
                F.sum("y") / F.count(F.lit(1)).cast("double"), 6
            ).alias("positive_rate"),
        )
        .select(
            F.col("fold").cast("bigint").alias("fold"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            "n_positive",
            "positive_rate",
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# Nearest-centroid confusion matrix: assign every embedding to its
# nearest per-label centroid (the silhouette query's exact-lattice
# distances — DECIMAL(38,0) squared distances over quantized
# coordinates, deterministic argmin with label tiebreak) and report
# the label×assigned confusion cells plus per-true-label accuracy.
# The companion readout to cluster_silhouette_report: silhouette says
# how separated the clusters are, the confusion matrix says WHERE
# they bleed.
@_q(
    "centroid_confusion_matrix",
    """
    WITH pts AS (
      SELECT vec_id, label, i AS pos,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
               AS xi
      FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS s(i)
    ), cent AS (
      SELECT label AS clabel, pos,
             CAST(SUM(xi) AS DECIMAL(38,0)) AS s,
             COUNT(DISTINCT vec_id) AS n
      FROM pts GROUP BY label, pos
    ), d2 AS (
      SELECT p.vec_id, p.label, c.clabel,
             SUM(CAST((p.xi * c.n - c.s) * (p.xi * c.n - c.s)
                      AS DECIMAL(38,0))) AS dd,
             max(c.n) AS cn
      FROM pts p JOIN cent c ON c.pos = p.pos
      GROUP BY p.vec_id, p.label, c.clabel
    ), scaled AS (
      -- distances are at different scales per centroid (×n_c):
      -- compare as exact rationals dd/(cn²) via cross-multiplication-
      -- free double (safe: values differ by >> ulp except true ties,
      -- which the (d, clabel) order resolves identically)
      SELECT vec_id, label, clabel,
             CAST(dd AS DOUBLE) / cn / cn AS d
      FROM d2
    ), assigned AS (
      -- DuckDB min_by takes scalar keys only: composite (d, clabel)
      -- argmin via the ranked-window idiom
      SELECT vec_id, label, clabel AS assigned FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d, clabel) AS rn
        FROM scaled
      ) WHERE rn = 1
    )
    SELECT CAST(label AS BIGINT) AS true_label,
           CAST(assigned AS BIGINT) AS assigned_label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM assigned GROUP BY label, assigned
    ORDER BY true_label, assigned_label
    """,
)
def q_centroid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("x").cast("double") * 1000000).cast("bigint").alias("xi"),
    )
    cent = pts.groupBy(
        F.col("label").alias("clabel"), F.col("pos").alias("cpos")
    ).agg(
        F.sum("xi").cast("decimal(38,0)").alias("s"),
        F.countDistinct("vec_id").alias("n"),
    )
    d2 = (
        pts.join(F.broadcast(cent), F.col("pos") == F.col("cpos"))
        .select(
            "vec_id",
            "label",
            "clabel",
            "n",
            ((F.col("xi") * F.col("n") - F.col("s"))
             * (F.col("xi") * F.col("n") - F.col("s")))
            .cast("decimal(38,0)")
            .alias("term"),
        )
        .groupBy("vec_id", "label", "clabel", "n")
        .agg(F.sum("term").alias("dd"))
    )
    scaled = d2.select(
        "vec_id",
        "label",
        "clabel",
        (F.col("dd").cast("double") / F.col("n") / F.col("n")).alias("d"),
    )
    assigned = scaled.groupBy("vec_id", "label").agg(
        F.min_by("clabel", F.struct("d", "clabel")).alias("assigned")
    )
    return (
        assigned.groupBy(
            F.col("label").cast("bigint").alias("true_label"),
            F.col("assigned").cast("bigint").alias("assigned_label"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_label", "assigned_label")
    )


# ---------------------------------------------------------------------------
# Prediction calibration report (reliability diagram + Brier terms) —
# the model-monitoring table a scoring pipeline emits next to its
# predictions: decile bins of predicted probability vs observed
# outcome rate. The "model" is a deterministic price-based score
# (o_totalprice / max price), the outcome is the high-priority flag —
# a miscalibrated-by-construction pair, which is exactly what the
# report exists to reveal. FP discipline: scores quantize to the 1e-6
# lattice, so per-bin sums (Σs, Σ(s-y)²) are exact integers
# (DECIMAL(38,0) partials) and the only float math is the final
# per-bin division + round. One corpus pass + a broadcast max.
@_q(
    "prediction_calibration_report",
    """
    WITH mx AS (SELECT MAX(o_totalprice) AS mp FROM orders),
    scored AS (
      SELECT CAST(round(CAST(o_totalprice AS DOUBLE) / (SELECT mp FROM mx)
                        * 1000000) AS BIGINT) AS s6,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ), binned AS (
      SELECT LEAST(s6 // 100000, 9) AS bin, s6, y,
             CAST((s6 - y * 1000000) AS DECIMAL(38,0))
               * (s6 - y * 1000000) AS sq
      FROM scored
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(s6) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
             AS mean_pred,
           round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS obs_rate,
           round(CAST(SUM(sq) AS DOUBLE) / COUNT(*) / 1000000000000.0, 6)
             AS brier_bin
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def q_prediction_calibration_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_totalprice").alias("mp"))
    scored = orders.join(F.broadcast(mx)).select(
        F.round(
            F.col("o_totalprice").cast("double") / F.col("mp") * 1000000
        )
        .cast("bigint")
        .alias("s6"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    sq = (F.col("s6") - F.col("y") * 1000000).cast("decimal(38,0)") * (
        F.col("s6") - F.col("y") * 1000000
    )
    binned = scored.select(
        F.least(F.expr("s6 div 100000"), F.lit(9).cast("bigint")).alias("bin"),
        "s6",
        "y",
        sq.alias("sq"),
    )
    n = F.count(F.lit(1))
    return (
        binned.groupBy("bin")
        .agg(
            n.cast("bigint").alias("n"),
            F.round(F.sum("s6").cast("double") / n / 1000000.0, 6).alias(
                "mean_pred"
            ),
            F.round(F.sum("y").cast("double") / n, 6).alias("obs_rate"),
            F.round(
                F.sum("sq").cast("double") / n / 1000000000000.0, 6
            ).alias("brier_bin"),
        )
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            "n",
            "mean_pred",
            "obs_rate",
            "brier_bin",
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Nucleus (top-p) sampling support sets over the bigram LM — the
# inference-side statistic every sampling implementation needs: for
# each context w1, the smallest prefix of next tokens (by count desc,
# token asc — the deterministic tie rule) whose cumulative mass
# reaches p = 0.9. FULLY INTEGER: the support condition
# cumsum/total >= 0.9 is evaluated as 10*cumsum >= 9*total on exact
# BIGINT counts, so there is no probability float anywhere until the
# final reporting division. Plan: one bigram count pass, one
# per-context ordered window (partitioned by w1 — never global), one
# groupBy. Output per context (top-30 contexts by count): vocab
# breadth vs nucleus size — the fat-head/long-tail audit.
@_q(
    "nucleus_sampling_support",
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
      SELECT w1, w2, COUNT(*) AS c
      FROM bi WHERE w2 IS NOT NULL GROUP BY w1, w2
    ),
    cum AS (
      SELECT w1, w2, c,
             SUM(c) OVER (PARTITION BY w1 ORDER BY c DESC, w2
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cs,
             SUM(c) OVER (PARTITION BY w1) AS total
      FROM bc
    ),
    marked AS (
      SELECT w1, w2, c, cs, total,
             CASE WHEN cs - c = 0 OR 10 * (cs - c) < 9 * total
                  THEN 1 ELSE 0 END AS in_nucleus
      FROM cum
    )
    SELECT w1,
           CAST(MAX(total) AS BIGINT) AS n_continuations,
           COUNT(*) AS vocab_breadth,
           CAST(SUM(in_nucleus) AS BIGINT) AS nucleus_size,
           round(CAST(SUM(CASE WHEN in_nucleus = 1 THEN c ELSE 0 END)
                      AS DOUBLE) / MAX(total), 6) AS nucleus_mass
    FROM marked
    GROUP BY w1
    ORDER BY n_continuations DESC, w1 LIMIT 30
    """,
)
def q_nucleus_sampling_support(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("w1")
        .orderBy(F.desc("c"), F.asc("w2"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("w1")
    cum = bc.select(
        "w1",
        "w2",
        "c",
        F.sum("c").over(w_cum).alias("cs"),
        F.sum("c").over(w_tot).alias("total"),
    )
    # a token is in the nucleus iff the mass BEFORE it is < p (the
    # first token always is) — integer form: 10*(cs-c) < 9*total
    in_nucleus = F.when(
        ((F.col("cs") - F.col("c")) == 0)
        | (10 * (F.col("cs") - F.col("c")) < 9 * F.col("total")),
        1,
    ).otherwise(0)
    marked = cum.withColumn("in_nucleus", in_nucleus)
    return (
        marked.groupBy("w1")
        .agg(
            F.max("total").cast("bigint").alias("n_continuations"),
            F.count(F.lit(1)).alias("vocab_breadth"),
            F.sum("in_nucleus").cast("bigint").alias("nucleus_size"),
            F.round(
                F.sum(
                    F.when(F.col("in_nucleus") == 1, F.col("c")).otherwise(0)
                ).cast("double")
                / F.max("total"),
                6,
            ).alias("nucleus_mass"),
        )
        .orderBy(F.desc("n_continuations"), "w1")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Isotonic (PAV) calibration — the standard post-hoc calibrator
# (Zadrozny & Elkan KDD'02; Barlow et al. 1972): fit a non-decreasing
# step function of observed outcome rate over score bins. The
# distributed part is ONE corpus pass into bounded (bin, n, Σy)
# aggregates; pool-adjacent-violators then runs driver-side on that
# bounded table (the k-means-centroid envelope: B ≤ 20 cells at any
# corpus size) with EXACT integer arithmetic — violation tests are
# cross-multiplied counts, never float means — and the fitted rate is
# emitted as one IEEE division per block. The DuckDB oracle computes
# the SAME fit through the minimax characterization
# fit(i) = max_{j<=i} min_{k>=i} mean(y[j..k]): distinct rationals
# with denominators <= N differ by >= 1/N² ≈ 4e-9 while double
# quotients of exact integers carry ~1e-16 relative error, so the
# double-valued max/min selects exactly the PAV block mean and both
# engines emit the identical double — no rounding seam needed.
@_q(
    "isotonic_pav_calibration",
    """
    WITH mx AS (SELECT MAX(o_totalprice) AS mp FROM orders),
    scored AS (
      SELECT CAST(round(CAST(o_totalprice AS DOUBLE) / (SELECT mp FROM mx)
                        * 1000000) AS BIGINT) AS s6,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    bins AS MATERIALIZED (
      SELECT LEAST(s6 // 50000, 19) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy
      FROM scored GROUP BY 1
    ),
    pre AS MATERIALIZED (
      SELECT bin, n, sy,
             SUM(n) OVER (ORDER BY bin) AS cn,
             SUM(sy) OVER (ORDER BY bin) AS cy
      FROM bins
    ),
    seg AS (
      SELECT a.bin AS j, b.bin AS k,
             CAST(b.cy - (a.cy - a.sy) AS DOUBLE)
               / CAST(b.cn - (a.cn - a.n) AS DOUBLE) AS m
      FROM pre a JOIN pre b ON a.bin <= b.bin
    ),
    inner_min AS (
      SELECT p.bin AS i, s.j, MIN(s.m) AS mn
      FROM pre p JOIN seg s ON s.j <= p.bin AND s.k >= p.bin
      GROUP BY p.bin, s.j
    ),
    fit AS (SELECT i AS bin, MAX(mn) AS iso_rate FROM inner_min GROUP BY i)
    SELECT CAST(b.bin AS BIGINT) AS bin, b.n,
           CAST(b.sy AS DOUBLE) / b.n AS raw_rate,
           f.iso_rate
    FROM bins b JOIN fit f ON f.bin = b.bin
    ORDER BY bin
    """,
)
def q_isotonic_pav_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_totalprice").alias("mp"))
    scored = orders.join(F.broadcast(mx)).select(
        F.round(F.col("o_totalprice").cast("double") / F.col("mp") * 1000000)
        .cast("bigint")
        .alias("s6"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
    )
    binned = (
        scored.groupBy(
            F.least(F.expr("s6 div 50000"), F.lit(19).cast("bigint")).alias(
                "bin"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("sy"),
        )
        .localCheckpoint(eager=True)  # corpus reduced; read twice below
    )
    # Pool-adjacent-violators on the BOUNDED bin table (driver-side by
    # design: B <= 20 rows at any scale; exact-integer violation test
    # sy_prev * n_cur > sy_cur * n_prev, i.e. mean_prev > mean_cur).
    rows = sorted(binned.collect(), key=lambda r: r["bin"])  # bounded: B <= 20 bins
    stack: list[list] = []  # [n, sy, [bins...]]
    for r in rows:
        cur = [int(r["n"]), int(r["sy"]), [int(r["bin"])]]
        while stack and stack[-1][1] * cur[0] > cur[1] * stack[-1][0]:
            prev = stack.pop()
            cur = [prev[0] + cur[0], prev[1] + cur[1], prev[2] + cur[2]]
        stack.append(cur)
    fit_rows = [
        (b, block[1] / block[0]) for block in stack for b in block[2]
    ]
    fit = spark.createDataFrame(fit_rows, "bin bigint, iso_rate double")
    return (
        binned.join(F.broadcast(fit), "bin")
        .select(
            "bin",
            "n",
            (F.col("sy").cast("double") / F.col("n")).alias("raw_rate"),
            "iso_rate",
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# ROC AUC by segment — model evaluation as a rank statistic: AUC of
# "price predicts high order priority" per market segment, computed
# through the Mann-Whitney identity AUC = (R1 - n1(n1+1)/2)/(n1*n0)
# with AVERAGE ranks for ties. Fully integer until one division:
# per-(segment, price) counts first (the window input is distinct
# values, not rows), average tied rank doubled into
# 2R1 = Σ pos*(2*prior + cnt + 1) so .5 ranks never materialize, and
# AUC = (2R1 - n1(n1+1)) / (2 n1 n0) — one quotient of exact BIGINTs,
# bit-identical across engines. One fact-dim join + one groupBy + one
# segment-partitioned window over the distinct-value table.
@_q(
    "roc_auc_by_segment",
    """
    WITH j AS (
      SELECT c.c_mktsegment AS seg, o.o_totalprice AS v,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
      SELECT seg, v, COUNT(*) AS cnt, SUM(y) AS pos
      FROM j GROUP BY seg, v
    ),
    cum AS (
      SELECT seg, cnt, pos,
             SUM(cnt) OVER (PARTITION BY seg ORDER BY v) AS cumn
      FROM g
    ),
    r AS (
      SELECT seg,
             SUM(pos * (2 * (cumn - cnt) + cnt + 1)) AS r2,
             SUM(pos) AS n1, SUM(cnt - pos) AS n0
      FROM cum GROUP BY seg
    )
    SELECT seg AS segment,
           CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
           CASE WHEN n1 = 0 OR n0 = 0 THEN NULL
                ELSE CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
                     / CAST(2 * n1 * n0 AS DOUBLE) END AS auc
    FROM r ORDER BY segment
    """,
)
def q_roc_auc_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    j = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
    )
    g = j.groupBy("seg", "v").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    w = (
        Window.partitionBy("seg")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = g.select(
        "seg", "cnt", "pos", F.sum("cnt").over(w).alias("cumn")
    )
    r = cum.groupBy("seg").agg(
        F.sum(
            F.col("pos") * (2 * (F.col("cumn") - F.col("cnt")) + F.col("cnt") + 1)
        ).alias("r2"),
        F.sum("pos").alias("n1"),
        F.sum(F.col("cnt") - F.col("pos")).alias("n0"),
    )
    return r.select(
        F.col("seg").alias("segment"),
        F.col("n1").cast("bigint").alias("n_pos"),
        F.col("n0").cast("bigint").alias("n_neg"),
        # AUC is undefined for a single-class segment: NULL is the
        # deliberate marker (r9 ADVICE), not an engine-dependent
        # NaN/0-division artifact.
        F.when(
            (F.col("n1") == 0) | (F.col("n0") == 0), F.lit(None)
        )
        .otherwise(
            (F.col("r2") - F.col("n1") * (F.col("n1") + 1)).cast("double")
            / (2 * F.col("n1") * F.col("n0")).cast("double")
        )
        .alias("auc"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# Cumulative gains / lift table (the decile report every propensity
# model ships with): score = o_totalprice quantized to whole dollars
# (a DOMAIN-bounded value spine — the wasserstein/time-spine
# convention), outcome = urgent/high priority. Deciles are assigned
# to whole SCORE-VALUE groups by where their cumulative count ends:
# decile = ⌈10·cum_n/N⌉ as the exact integer (10·cum_n + N − 1)//N —
# no per-row ntile, so no raw global window (a per-row ntile over the
# fact table is the one shape that cannot survive 100×; the auditor
# flags it). Value-group deciles are ragged by at most one score
# value — the price of scale, documented. Per decile: counts,
# positives, cumulative recall (gains) and lift vs the base rate —
# exact integer ratios, divisions only at report time.
@_q(
    "cumulative_gains_lift",
    """
    WITH v AS (
      SELECT CAST(round(o_totalprice / 100) AS BIGINT) AS score,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    g AS (
      SELECT score, COUNT(*) AS n, SUM(y) AS pos
      FROM v GROUP BY score
    ),
    c AS (
      SELECT score, n, pos,
             SUM(n) OVER (ORDER BY score DESC) AS cum_n,
             SUM(n) OVER () AS tot_n
      FROM g
    ),
    d AS (
      SELECT CAST((10 * cum_n + tot_n - 1) // tot_n AS INT) AS decile,
             SUM(n) AS n, SUM(pos) AS pos
      FROM c GROUP BY 1
    ),
    cd AS (
      SELECT decile, n, pos,
             SUM(n) OVER (ORDER BY decile) AS cum_n,
             SUM(pos) OVER (ORDER BY decile) AS cum_pos,
             SUM(n) OVER () AS tot_n, SUM(pos) OVER () AS tot_pos
      FROM d
    )
    SELECT decile,
           CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
           round(CAST(cum_pos AS DOUBLE) / tot_pos, 6) AS cum_gain,
           round(CAST(cum_pos AS DOUBLE) * tot_n
                 / (CAST(cum_n AS DOUBLE) * tot_pos), 6) AS cum_lift
    FROM cd ORDER BY decile
    """,
)
def q_cumulative_gains_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    v = o.select(
        F.round(F.col("o_totalprice") / 100).cast("bigint").alias("score"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
    )
    g = v.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    wdesc = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    c = g.select(
        "n",
        "pos",
        F.sum("n").over(wdesc).alias("cum_n"),
        F.sum("n").over(wall).alias("tot_n"),
    )
    d = c.groupBy(
        F.expr("CAST((10 * cum_n + tot_n - 1) DIV tot_n AS INT)").alias(
            "decile"
        )
    ).agg(F.sum("n").alias("n"), F.sum("pos").alias("pos"))
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()  # 10-row frame: the decile table
    c = d.select(
        "decile",
        "n",
        "pos",
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("pos").over(wc).alias("cum_pos"),
        F.sum("n").over(wt).alias("tot_n"),
        F.sum("pos").over(wt).alias("tot_pos"),
    )
    return c.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n").cast("bigint").alias("n"),
        F.col("pos").cast("bigint").alias("pos"),
        F.round(F.col("cum_pos").cast("double") / F.col("tot_pos"), 6).alias(
            "cum_gain"
        ),
        F.round(
            F.col("cum_pos").cast("double")
            * F.col("tot_n")
            / (F.col("cum_n").cast("double") * F.col("tot_pos")),
            6,
        ).alias("cum_lift"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# Decision-stump split gain (CART's Gini criterion, Breiman et al.
# 1984) — the feature-screening pass a distributed GBDT does per
# boosting round: for each (feature, threshold) candidate, the Gini
# impurity reduction of splitting lineitem on it, label = returned.
# Gini via the 2pq form keeps everything rational: weighted impurity
# = Σ_side (n_s − (pos_s² + neg_s²)/n_s)/N, so the candidates rank by
# exact-integer-derived doubles with two divisions each. Plan: ONE
# scan — candidates ride as an exploded literal array, so the pass is
# (rows × n_candidates) map-side followed by one small groupBy; no
# per-candidate rescan.
_STUMP_CANDS = [
    ("l_quantity", q) for q in (10, 20, 30, 40)
] + [("l_discount", d) for d in (0.02, 0.04, 0.06, 0.08)]


def _sql_stump() -> str:
    cand_rows = ", ".join(f"('{f}', {v})" for f, v in _STUMP_CANDS)
    return f"""
    WITH cand(feature, thr) AS (VALUES {cand_rows}),
    sides AS (
      SELECT c.feature, c.thr,
             CASE WHEN (CASE c.feature WHEN 'l_quantity' THEN l.l_quantity
                        ELSE l.l_discount END) <= c.thr
                  THEN 'L' ELSE 'R' END AS side,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem l CROSS JOIN cand c
    ),
    g AS (
      SELECT feature, thr, side, COUNT(*) AS n, SUM(y) AS pos
      FROM sides GROUP BY feature, thr, side
    ),
    agg AS (
      SELECT feature, thr,
             SUM(n) AS nt, SUM(pos) AS post,
             SUM(CAST(n AS DOUBLE)
                 - (CAST(pos AS HUGEINT) * pos
                    + CAST(n - pos AS HUGEINT) * (n - pos))
                   / CAST(n AS DOUBLE)) AS w_impurity_n
      FROM g GROUP BY feature, thr
    )
    SELECT feature, round(CAST(thr AS DOUBLE), 6) AS threshold,
           round((CAST(nt AS DOUBLE)
                  - (CAST(post AS HUGEINT) * post
                     + CAST(nt - post AS HUGEINT) * (nt - post))
                    / CAST(nt AS DOUBLE)
                  - w_impurity_n) / nt, 6) AS gini_gain
    FROM agg ORDER BY gini_gain DESC, feature, threshold
    """


@_q("stump_split_gain", _sql_stump())
def q_stump_split_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    cand = F.array(
        *[
            F.struct(
                F.lit(f).alias("feature"), F.lit(float(v)).alias("thr")
            )
            for f, v in _STUMP_CANDS
        ]
    )
    sides = li.select(
        F.explode(cand).alias("c"),
        F.col("l_quantity"),
        F.col("l_discount"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    ).select(
        F.col("c.feature").alias("feature"),
        F.col("c.thr").alias("thr"),
        # Reference the struct fields, not the sibling aliases: relying
        # on lateral column alias resolution here would throw an
        # unresolved-column AnalysisException on Spark < 3.4.
        F.when(
            F.when(
                F.col("c.feature") == "l_quantity", F.col("l_quantity")
            ).otherwise(F.col("l_discount"))
            <= F.col("c.thr"),
            "L",
        )
        .otherwise("R")
        .alias("side"),
        "y",
    )
    g = sides.groupBy("feature", "thr", "side").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    imp_n = F.col("n").cast("double") - (
        dec("pos") * F.col("pos")
        + (dec("n") - F.col("pos")) * (F.col("n") - F.col("pos"))
    ).cast("double") / F.col("n").cast("double")
    agg = g.groupBy("feature", "thr").agg(
        F.sum("n").alias("nt"),
        F.sum("pos").alias("post"),
        F.sum(imp_n).alias("w_impurity_n"),
    )
    parent_n = F.col("nt").cast("double") - (
        dec("post") * F.col("post")
        + (dec("nt") - F.col("post")) * (F.col("nt") - F.col("post"))
    ).cast("double") / F.col("nt").cast("double")
    return agg.select(
        "feature",
        F.round(F.col("thr").cast("double"), 6).alias("threshold"),
        F.round(
            (parent_n - F.col("w_impurity_n")) / F.col("nt"), 6
        ).alias("gini_gain"),
    ).orderBy(F.desc("gini_gain"), "feature", "threshold")


# ---------------------------------------------------------------------------
# Mutual-information feature ranking — the filter-method screen for
# categorical features vs a binary target (Cover & Thomas ch.2):
# I(X;Y) = Σ_xy (c_xy/N)·ln(c_xy·N/(c_x·c_y)). Cross-engine float
# discipline (the pagerank seam): each CELL's term is computed as a
# double from exact integer counts, round(9)-ed, and the per-feature
# MI is a DECIMAL(38,9) sum of those identical rounded terms —
# order-free — then round(6). Features unpivot into (feature, x)
# rows so all three screens ride ONE scan + one groupBy chain.
@_q(
    "mutual_information_features",
    """
    WITH base AS (
      SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS y,
             o_orderstatus AS f_status,
             o_orderpriority AS f_priority,
             CAST(year(o_orderdate) AS VARCHAR) AS f_year
      FROM orders
    ),
    long AS (
      SELECT y, 'status' AS feature, f_status AS x FROM base
      UNION ALL SELECT y, 'priority', f_priority FROM base
      UNION ALL SELECT y, 'year', f_year FROM base
    ),
    cxy AS (SELECT feature, x, y, COUNT(*) AS c FROM long
            GROUP BY feature, x, y),
    cx AS (SELECT feature, x, SUM(c) AS cx FROM cxy GROUP BY feature, x),
    cy AS (SELECT feature, y, SUM(c) AS cy FROM cxy GROUP BY feature, y),
    nn AS (SELECT feature, SUM(c) AS n FROM cxy GROUP BY feature)
    SELECT cxy.feature,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           round(CAST(SUM(CAST(round(CAST(cxy.c AS DOUBLE) / nn.n
                     * ln(CAST(cxy.c AS DOUBLE) * nn.n
                          / (CAST(cx.cx AS DOUBLE) * cy.cy)), 9)
                     AS DECIMAL(38,9))) AS DOUBLE), 6) AS mutual_info
    FROM cxy
    JOIN cx ON cx.feature = cxy.feature AND cx.x = cxy.x
    JOIN cy ON cy.feature = cxy.feature AND cy.y = cxy.y
    JOIN nn ON nn.feature = cxy.feature
    GROUP BY cxy.feature ORDER BY mutual_info DESC, cxy.feature
    """,
)
def q_mutual_information_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    base = o.select(
        F.when(F.col("o_totalprice") > 150000, 1).otherwise(0).alias("y"),
        F.col("o_orderstatus").alias("f_status"),
        F.col("o_orderpriority").alias("f_priority"),
        F.year("o_orderdate").cast("string").alias("f_year"),
    )
    long = (
        base.select("y", F.lit("status").alias("feature"), F.col("f_status").alias("x"))
        .unionByName(
            base.select("y", F.lit("priority").alias("feature"), F.col("f_priority").alias("x"))
        )
        .unionByName(
            base.select("y", F.lit("year").alias("feature"), F.col("f_year").alias("x"))
        )
    )
    cxy = long.groupBy("feature", "x", "y").agg(F.count(F.lit(1)).alias("c"))
    cx = cxy.groupBy("feature", "x").agg(F.sum("c").alias("cx"))
    cy = cxy.groupBy("feature", "y").agg(F.sum("c").alias("cy"))
    nn = cxy.groupBy("feature").agg(F.sum("c").alias("n"))
    term = F.round(
        F.col("c").cast("double")
        / F.col("n")
        * F.log(
            F.col("c").cast("double")
            * F.col("n")
            / (F.col("cx").cast("double") * F.col("cy"))
        ),
        9,
    ).cast("decimal(38,9)")
    return (
        cxy.join(cx, ["feature", "x"])
        .join(cy, ["feature", "y"])
        .join(nn, "feature")
        .groupBy("feature")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.round(F.sum(term).cast("double"), 6).alias("mutual_info"),
        )
        .orderBy(F.desc("mutual_info"), "feature")
    )


# ---------------------------------------------------------------------------
# Ridge regression, closed form (Hoerl & Kennard 1970) — 2-feature
# normal equations β = (XᵀX + λI)⁻¹Xᵀy solved by the exact 2×2
# inverse: XᵀX and Xᵀy entries are EXACT integer sums on the lattice
# (quantity units, discount cents, price cents), the determinant and
# adjugate products stay exact in DECIMAL(38,0)/HUGEINT, and the only
# float ops are the two final divisions, round(6). This is the
# "sufficient statistics" pattern a distributed trainer uses at
# 100 TB: ONE aggregation pass moves 5 numbers, the solve costs
# nothing — no gradient iterations, no per-row weights.
@_q(
    "ridge_closed_form",
    """
    WITH x AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1,
             CAST(round(l_discount * 100) AS BIGINT) AS x2,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS yv
      FROM lineitem
    ),
    s AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(x1 AS HUGEINT) * x1) + 1000 AS a,
             SUM(CAST(x1 AS HUGEINT) * x2) AS b,
             SUM(CAST(x2 AS HUGEINT) * x2) + 1000 AS c,
             SUM(CAST(x1 AS HUGEINT) * yv) AS p,
             SUM(CAST(x2 AS HUGEINT) * yv) AS q
      FROM x
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(CAST(c * p - b * q AS DOUBLE)
                 / CAST(a * c - b * b AS DOUBLE), 6) AS beta_quantity,
           round(CAST(a * q - b * p AS DOUBLE)
                 / CAST(a * c - b * b AS DOUBLE), 6) AS beta_discount_cents
    FROM s
    """,
)
def q_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("yv"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    s = x.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(dec("x1") * F.col("x1")) + 1000).alias("a"),
        F.sum(dec("x1") * F.col("x2")).alias("b"),
        (F.sum(dec("x2") * F.col("x2")) + 1000).alias("c"),
        F.sum(dec("x1") * F.col("yv")).alias("p"),
        F.sum(dec("x2") * F.col("yv")).alias("q"),
    )
    det = (F.col("a") * F.col("c") - F.col("b") * F.col("b")).cast("double")
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(
            (F.col("c") * F.col("p") - F.col("b") * F.col("q")).cast("double")
            / det,
            6,
        ).alias("beta_quantity"),
        F.round(
            (F.col("a") * F.col("q") - F.col("b") * F.col("p")).cast("double")
            / det,
            6,
        ).alias("beta_discount_cents"),
    )


# ---------------------------------------------------------------------------
# Split-conformal coverage audit (Vovk et al.; Lei et al. JASA 2018) —
# the distribution-free interval guarantee, done entirely on the
# integer lattice: calibration = even order keys, test = odd;
# nonconformity = |2y − m2| in doubled cents around the calibration
# MEDIAN (the doubled-median trick keeps half-cent medians integer);
# the conformal threshold is the ⌈(n_cal+1)·0.9⌉-th smallest
# calibration score — an ORDER STATISTIC selected by windowed cumsum
# over the BOUNDED distinct-score spine (never a per-row global
# rank) — and the audit reports achieved test coverage, which the
# theorem lower-bounds by 0.9 in expectation. Every number exact
# until the one coverage division.
@_q(
    "conformal_coverage_audit",
    """
    WITH pr AS (
      SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS y,
             o_orderkey % 2 = 0 AS is_cal
      FROM orders
    ),
    calr AS (
      SELECT y, row_number() OVER (ORDER BY y) AS rn,
             COUNT(*) OVER () AS n
      FROM pr WHERE is_cal
    ),
    med AS (
      SELECT CAST(SUM(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2)
                           THEN y END)
                  * MAX(CASE WHEN (n + 1) // 2 = (n + 2) // 2
                             THEN 2 ELSE 1 END) AS BIGINT) AS m2,
             MAX(n) AS n_cal
      FROM calr
    ),
    scores AS (
      SELECT ABS(2 * p.y - m.m2) AS s2, p.is_cal
      FROM pr p CROSS JOIN med m
    ),
    spine AS (
      SELECT s2, COUNT(*) AS cnt FROM scores WHERE is_cal GROUP BY s2
    ),
    thr AS (
      SELECT MIN(s2) AS q FROM (
        SELECT s2, SUM(cnt) OVER (ORDER BY s2) AS cum
        FROM spine
      ) WHERE cum >= (SELECT LEAST(CAST(ceil((n_cal + 1) * 0.9) AS BIGINT),
                                   n_cal)
                      FROM med)
    )
    SELECT CAST(m.n_cal AS BIGINT) AS n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(t.q AS BIGINT) AS q_s2,
           round(CAST(SUM(CASE WHEN s.s2 <= t.q THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS coverage
    FROM scores s CROSS JOIN thr t CROSS JOIN med m
    WHERE NOT s.is_cal
    GROUP BY m.n_cal, t.q
    """,
)
def q_conformal_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    pr = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
        (F.col("o_orderkey") % 2 == 0).alias("is_cal"),
    ).localCheckpoint(eager=True)  # read by median spine + both score sides
    # calibration median on the BOUNDED distinct-value spine (the SQL
    # twin's per-row row_number is fine for DuckDB; at scale Spark must
    # never rank raw rows globally): m_lo/m_hi = first values whose
    # cumulative count reaches the two middle ranks
    yspine = pr.where("is_cal").groupBy("y").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wsp0 = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    ycum = yspine.select(
        "y", F.sum("cnt").over(wsp0).alias("cum")
    ).localCheckpoint(eager=True)  # read for n_cal + both middle ranks
    n_cal = int(ycum.agg(F.max("cum")).collect()[0][0])
    lo_rank, hi_rank = (n_cal + 1) // 2, (n_cal + 2) // 2
    m_lo = ycum.where(F.col("cum") >= lo_rank).agg(F.min("y")).collect()[0][0]
    m_hi = ycum.where(F.col("cum") >= hi_rank).agg(F.min("y")).collect()[0][0]
    m2 = int(m_lo) + int(m_hi)
    scores = pr.select(
        F.abs(2 * F.col("y") - F.lit(m2)).alias("s2"), "is_cal"
    )
    # ceil((n_cal+1)*0.9) exactly, clamped to n_cal so a tiny
    # calibration set yields the max score instead of an empty MIN
    k = min(-(-(n_cal + 1) * 9 // 10), n_cal)
    spine = (
        scores.where("is_cal").groupBy("s2").agg(F.count(F.lit(1)).alias("cnt"))
    )
    wsp = Window.orderBy("s2").rowsBetween(Window.unboundedPreceding, 0)
    q = int(
        spine.select("s2", F.sum("cnt").over(wsp).alias("cum"))
        .where(F.col("cum") >= k)
        .agg(F.min("s2").alias("q"))
        .collect()[0]["q"]
    )
    return (
        scores.where(~F.col("is_cal"))
        .agg(
            F.lit(n_cal).cast("bigint").alias("n_cal"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.lit(q).cast("bigint").alias("q_s2"),
            F.round(
                F.sum(F.when(F.col("s2") <= q, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# Average precision (area under the precision-recall curve, step
# interpolation over DISTINCT score thresholds — the tie-robust form
# scikit-learn's average_precision_score computes): per segment,
# AP = sum over descending distinct scores v of
#      (pos_v / n_pos) * (cum_pos_v / cum_cnt_v).
# Same value-spine + cumulative-window shape as roc_auc_by_segment —
# the fact scan aggregates to (segment, score) counts first, so the
# window runs over a post-agg spine (auditor-clean) and the result is
# invariant to within-tie ordering by construction. Per-term round(12)
# before the sum, round(6) at report (house float discipline).
@_q(
    "pr_auc_by_segment",
    """
    WITH j AS (
      SELECT c.c_mktsegment AS seg, o.o_totalprice AS v,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
      SELECT seg, v, COUNT(*) AS cnt, SUM(y) AS pos
      FROM j GROUP BY seg, v
    ),
    cum AS (
      SELECT seg, cnt, pos,
             SUM(cnt) OVER (PARTITION BY seg ORDER BY v DESC) AS cumn,
             SUM(pos) OVER (PARTITION BY seg ORDER BY v DESC) AS cump,
             SUM(pos) OVER (PARTITION BY seg) AS n1,
             SUM(cnt - pos) OVER (PARTITION BY seg) AS n0
      FROM g
    )
    SELECT seg AS segment,
           CAST(MAX(n1) AS BIGINT) AS n_pos,
           CAST(MAX(n0) AS BIGINT) AS n_neg,
           CASE WHEN MAX(n1) = 0 THEN NULL
                ELSE round(SUM(round(
                       (CAST(pos AS DOUBLE) / n1)
                       * (CAST(cump AS DOUBLE) / cumn), 12)), 6) END
             AS average_precision
    FROM cum GROUP BY seg ORDER BY segment
    """,
)
def q_pr_auc_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
    )
    g = j.groupBy("seg", "v").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    w = (
        Window.partitionBy("seg")
        .orderBy(F.desc("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wseg = Window.partitionBy("seg")
    cum = g.select(
        "seg",
        "cnt",
        "pos",
        F.sum("cnt").over(w).alias("cumn"),
        F.sum("pos").over(w).alias("cump"),
        F.sum("pos").over(wseg).alias("n1"),
        F.sum(F.col("cnt") - F.col("pos")).over(wseg).alias("n0"),
    )
    term = F.round(
        (F.col("pos").cast("double") / F.col("n1"))
        * (F.col("cump").cast("double") / F.col("cumn")),
        12,
    )
    return (
        cum.groupBy(F.col("seg").alias("segment"))
        .agg(
            F.max("n1").cast("bigint").alias("n_pos"),
            F.max("n0").cast("bigint").alias("n_neg"),
            F.when(F.max("n1") == 0, F.lit(None))
            .otherwise(F.round(F.sum(term), 6))
            .alias("average_precision"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Categorical Naive Bayes, EXACT: train Laplace-smoothed class-
# conditional counts on the md5-hash train split of orders (class =
# o_orderstatus; features = o_orderpriority and order year), predict
# the test split, and report the confusion matrix. The trick that
# makes an NB classifier oracle-able at all: scores stay RATIONAL —
# score(c) = n_c * (n_{c,f1}+1)(n_{c,f2}+1) / ((n_c+V1)(n_c+V2)) as a
# (numerator, denominator) pair of decimal(38,0) integers, and argmax
# is decided by integer CROSS-MULTIPLICATION (num_i*den_j vs
# num_j*den_i), never a float division or log. Width bound: with
# n_c <= 1.5e7 the cross product stays < 1e36 < decimal(38,0);
# beyond that, rescale to log-space doubles (documented boundary).
# 100 TB: the model is 3 priors + O(V) count rows (broadcast);
# scoring is a per-row map; the pairwise argmax join fans out 3x3
# rows per test row — linear in the test split.
_NB_SPLIT = (
    "CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))"
    " AS INTEGER) % 100"
)


@_q(
    "naive_bayes_order_status",
    f"""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus AS cls, o_orderpriority AS f1,
             CAST(year(o_orderdate) AS BIGINT) AS f2,
             {_NB_SPLIT} AS bucket
      FROM orders
    ),
    train AS (SELECT * FROM base WHERE bucket < 80),
    test AS (SELECT * FROM base WHERE bucket >= 80),
    prior AS (SELECT cls, CAST(COUNT(*) AS DECIMAL(38,0)) AS n_c
              FROM train GROUP BY cls),
    c1 AS (SELECT cls, f1, CAST(COUNT(*) AS DECIMAL(38,0)) AS n1
           FROM train GROUP BY cls, f1),
    c2 AS (SELECT cls, f2, CAST(COUNT(*) AS DECIMAL(38,0)) AS n2
           FROM train GROUP BY cls, f2),
    v AS (SELECT CAST(COUNT(DISTINCT f1) AS DECIMAL(38,0)) AS v1,
                 CAST(COUNT(DISTINCT f2) AS DECIMAL(38,0)) AS v2
          FROM train),
    scores AS (
      SELECT t.o_orderkey, t.cls AS actual, p.cls AS cand,
             p.n_c * (COALESCE(c1.n1, 0) + 1) * (COALESCE(c2.n2, 0) + 1)
               AS num,
             (p.n_c + v.v1) * (p.n_c + v.v2) AS den
      FROM test t CROSS JOIN prior p CROSS JOIN v
      LEFT JOIN c1 ON c1.cls = p.cls AND c1.f1 = t.f1
      LEFT JOIN c2 ON c2.cls = p.cls AND c2.f2 = t.f2
    ),
    winners AS (
      SELECT a.o_orderkey, a.actual, a.cand AS predicted
      FROM scores a JOIN scores b
        ON b.o_orderkey = a.o_orderkey AND b.cand <> a.cand
      GROUP BY a.o_orderkey, a.actual, a.cand
      HAVING SUM(CASE WHEN a.num * b.den > b.num * a.den
                        OR (a.num * b.den = b.num * a.den
                            AND a.cand < b.cand)
                      THEN 0 ELSE 1 END) = 0
    )
    SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
    FROM winners GROUP BY actual, predicted
    ORDER BY actual, predicted
    """,
)
def q_naive_bayes_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10
        ).cast("int")
        % 100
    )
    base = orders.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("cls"),
        F.col("o_orderpriority").alias("f1"),
        F.year("o_orderdate").cast("bigint").alias("f2"),
        bucket.alias("bucket"),
    )
    train = base.where(F.col("bucket") < 80)
    test = base.where(F.col("bucket") >= 80)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    prior = train.groupBy("cls").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_c")
    )
    c1 = train.groupBy("cls", "f1").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n1")
    )
    c2 = train.groupBy("cls", "f2").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n2")
    )
    v = train.agg(
        F.countDistinct("f1").cast("decimal(38,0)").alias("v1"),
        F.countDistinct("f2").cast("decimal(38,0)").alias("v2"),
    )
    scores = (
        test.crossJoin(F.broadcast(prior.select(F.col("cls").alias("cand"), "n_c")))
        .crossJoin(F.broadcast(v))
        .join(
            F.broadcast(c1.select(F.col("cls").alias("cand"), "f1", "n1")),
            ["cand", "f1"],
            "left",
        )
        .join(
            F.broadcast(c2.select(F.col("cls").alias("cand"), "f2", "n2")),
            ["cand", "f2"],
            "left",
        )
        .select(
            "o_orderkey",
            F.col("cls").alias("actual"),
            "cand",
            (
                F.col("n_c")
                * (F.coalesce(F.col("n1"), F.lit(0)) + 1)
                * (F.coalesce(F.col("n2"), F.lit(0)) + 1)
            )
            .cast("decimal(38,0)")
            .alias("num"),
            ((F.col("n_c") + F.col("v1")) * (F.col("n_c") + F.col("v2")))
            .cast("decimal(38,0)")
            .alias("den"),
        )
    )
    a = scores.select(
        "o_orderkey", "actual", F.col("cand"), F.col("num"), F.col("den")
    )
    b = scores.select(
        F.col("o_orderkey").alias("bk"),
        F.col("cand").alias("bcand"),
        F.col("num").alias("bnum"),
        F.col("den").alias("bden"),
    )
    lost = F.when(
        (F.col("num") * F.col("bden") > F.col("bnum") * F.col("den"))
        | (
            (F.col("num") * F.col("bden") == F.col("bnum") * F.col("den"))
            & (F.col("cand") < F.col("bcand"))
        ),
        0,
    ).otherwise(1)
    winners = (
        a.join(
            b,
            (F.col("bk") == F.col("o_orderkey")) & (F.col("bcand") != F.col("cand")),
        )
        .groupBy("o_orderkey", "actual", "cand")
        .agg(F.sum(lost).alias("losses"))
        .where(F.col("losses") == 0)
    )
    return (
        winners.groupBy("actual", F.col("cand").alias("predicted"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("actual", "predicted")
    )
