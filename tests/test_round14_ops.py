"""Round-14 operator tests.

E2 exact-lattice pixel classification: the oracle SQL twin is the
closed-form generating rule, which is only valid while the RF's votes
are unanimous and correct on the lattice (see plans/pipelines.py
_build_e2 docblock). This test asserts that invariant directly so any
Spark-ML behavioral drift (split binning, probability smoothing)
fails locally before the driver sweep can record a red row.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_e2_rf_unanimous_and_exact(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.pipelines import _build_e2

    out = _build_e2(spark)
    # recompute the generating rule and the relabel closed-form
    rule = out.withColumn(
        "want_pred",
        F.when(F.col("x") % 4 == 3, 12).when(F.col("y") % 4 == 3, 16).otherwise(2),
    ).withColumn(
        "want_final", F.when(F.col("x") % 4 == 3, 12).otherwise(2)
    )
    bad = rule.where(
        (F.col("pred") != F.col("want_pred"))
        | (F.col("final_label") != F.col("want_final"))
    ).count()
    assert bad == 0
    assert out.count() == 4096


def test_e2_rf_confidence_exactly_one(spark):
    """Unanimity, not just correctness: every tree's leaf must be pure,
    so max class probability is exactly 1.0 at every pixel."""
    from tb_scale_spatial_data_pipeline_spark.ml.classify import predict, train_rf

    px = (
        spark.range(4096)
        .select((F.col("id") % 64).alias("x"), F.expr("id div 64").alias("y"))
        .select(
            "x",
            "y",
            ((F.col("x") % 4) * 64).cast("double").alias("b1"),
            ((F.col("y") % 4) * 64).cast("double").alias("b2"),
            (((F.col("x") + F.col("y")) % 4) * 64).cast("double").alias("b3"),
        )
    )
    labeled = px.withColumn(
        "label",
        F.when(F.col("b1") > 150, 12).when(F.col("b2") > 150, 16).otherwise(2).cast("double"),
    )
    train = labeled.where((F.col("x") + F.col("y")) % 3 == 0)
    model = train_rf(
        train, ["b1", "b2", "b3"], "label",
        num_trees=20, max_depth=8, feature_subset_strategy="all",
    )
    scored = predict(model, labeled.drop("label"), out_col="pred")
    assert scored.where(F.col("pred_conf") != 1.0).count() == 0


def test_session_window_late_row_dropped(spark):
    """The late 10:08 row must NOT extend user 1's already-closed
    session: emitted row is [10:00, 10:35) n=2. If Spark's watermark
    filtering regressed (or the batch staging collapsed into one
    micro-batch), the row would read [10:00, 10:38) n=3 instead."""
    from tb_scale_spatial_data_pipeline_spark.streaming.events import (
        stream_session_window_late_data,
    )

    rows = [tuple(r) for r in stream_session_window_late_data(spark).collect()]
    assert rows == [
        (1, "2024-01-01 10:00:00", "2024-01-01 10:35:00", 2),
        (2, "2024-01-01 10:02:00", "2024-01-01 10:32:00", 1),
    ]


def test_knox_time_stage_candidates_are_theta_of_answer(spark):
    """knox_space_time's residual cost is the n_time_close +-1-bucket
    join (PLANS.md r13 scaling table). Its Theta(answer) claim, stated
    structurally and load-independently: candidate pairs enumerated by
    the bucket blocking must be within a constant factor of qualifying
    pairs (measured 1.50x at sf0.01 AND sf0.1; homogeneous arrivals
    give ~3 buckets probed per ~2-bucket qualifying window). A plan
    change that reintroduces density-quadratic enumeration (e.g. AQE
    coalescing to one partition, or losing the bucket join) blows this
    ratio up long before wall-clock tests would notice."""
    sf = "/root/testdata/sf0.001"
    evt = spark.read.parquet(f"{sf}/events.parquet").select("event_id", "ts")
    tms = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1000).cast(
        "bigint"
    )
    tbk = evt.select("event_id", tms.alias("tms")).select(
        "event_id", "tms", F.expr("tms div 3600000").alias("bkt")
    )
    toffs = spark.range(-1, 2).select(F.col("id").alias("dt"))
    tprobe = tbk.crossJoin(F.broadcast(toffs)).select(
        F.col("event_id").alias("ia"),
        F.col("tms").alias("ta"),
        (F.col("bkt") + F.col("dt")).alias("nbkt"),
    )
    tside = tbk.select(
        F.col("event_id").alias("ib"),
        F.col("tms").alias("tb"),
        F.col("bkt").alias("nbkt"),
    )
    j = tprobe.join(tside, "nbkt").where(F.col("ia") < F.col("ib"))
    r = j.agg(
        F.count(F.lit(1)).alias("cand"),
        F.sum(
            F.when(F.abs(F.col("ta") - F.col("tb")) <= 3600000, 1).otherwise(0)
        ).alias("qual"),
    ).first()
    assert r["qual"] > 0
    assert r["cand"] <= 3.0 * r["qual"]


# ---------------------------------------------------------------------------
# Round-14 operator cross-checks: each ground truth recomputed a THIRD
# way (plain Python/NumPy — no Spark, no SQL) so a same-formula DuckDB
# twin cannot hide a correlated bug.

import hashlib
import math

import numpy as np

from conftest import SF_SMOKE

from tb_scale_spatial_data_pipeline_spark.plans.analytics_queries import (
    QUERIES as AN_QUERIES,
)
from tb_scale_spatial_data_pipeline_spark.plans.experiment_queries import (
    QUERIES as EXP_QUERIES,
)
from tb_scale_spatial_data_pipeline_spark.plans.graph_queries import (
    QUERIES as GRAPH_QUERIES,
)
from tb_scale_spatial_data_pipeline_spark.plans.sketch_queries import (
    QUERIES as SK_QUERIES,
)
from tb_scale_spatial_data_pipeline_spark.plans.stats_queries import (
    QUERIES as STATS_QUERIES,
)
from tb_scale_spatial_data_pipeline_spark.plans.temporal_queries import (
    QUERIES as TEMP_QUERIES,
)
from tb_scale_spatial_data_pipeline_spark.plans.timeseries_queries import (
    QUERIES as TS_QUERIES,
)


def _daily_cents(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    o["d"] = o["o_orderdate"].dt.date
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    return (
        o.assign(c=cents).groupby("d")["c"].sum().sort_index().to_numpy()
    )


def test_wilcoxon_matches_manual_ranks(spark):
    row = STATS_QUERIES["wilcoxon_signed_rank"](spark, SF_SMOKE).collect()[0]
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    yrs = o["o_orderdate"].dt.year
    a = o[yrs == 1995].groupby("o_custkey").size()
    b = o[yrs == 1996].groupby("o_custkey").size()
    allc = o["o_custkey"].unique()
    d = np.array(
        [int(a.get(k, 0)) - int(b.get(k, 0)) for k in allc], dtype=int
    )
    d = d[d != 0]
    absd = np.abs(d)
    order = np.argsort(absd, kind="stable")
    ranks = np.empty(len(d), dtype=float)
    sorted_abs = absd[order]
    i = 0
    while i < len(d):
        j = i
        while j < len(d) and sorted_abs[j] == sorted_abs[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    w_plus = ranks[d > 0].sum()
    assert row["n_pairs"] == len(d)
    assert abs(row["w_plus"] - w_plus) < 1e-9
    n = len(d)
    _, counts = np.unique(absd, return_counts=True)
    ties = np.sum(counts.astype(np.int64) ** 3 - counts)
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24 - ties / 48
    )
    assert abs(row["z_stat"] - z) < 1e-5


def test_two_by_two_and_bartlett_and_vif(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    cu = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    j = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    seg = (j["c_mktsegment"] == "BUILDING").to_numpy()
    urg = (j["o_orderpriority"] == "1-URGENT").to_numpy()
    a = int(np.sum(seg & urg))
    b = int(np.sum(seg & ~urg))
    c = int(np.sum(~seg & urg))
    d = int(np.sum(~seg & ~urg))
    row = STATS_QUERIES["two_by_two_tests"](spark, SF_SMOKE).collect()[0]
    assert (row["a"], row["b"], row["c"], row["d"]) == (a, b, c, d)
    assert abs(row["odds_ratio"] - a * d / (b * c)) < 1e-5
    n = a + b + c + d
    p = (a + c) / n
    z = (a / (a + b) - c / (c + d)) / math.sqrt(
        p * (1 - p) * (1 / (a + b) + 1 / (c + d))
    )
    assert abs(row["z_prop"] - z) < 1e-5
    chi = n * (abs(a * d - b * c) - n / 2) ** 2 / (
        (a + b) * (c + d) * (a + c) * (b + d)
    )
    assert abs(row["chi2_yates"] - chi) < 1e-4

    # Bartlett against numpy group variances
    groups = [
        (g["o_totalprice"] * 100).round().astype("int64").to_numpy()
        for _, g in o.groupby("o_orderpriority")
    ]
    k = len(groups)
    ntot = sum(len(g) for g in groups)
    sp2 = sum((len(g) - 1) * np.var(g, ddof=1) for g in groups) / (ntot - k)
    stat = (
        (ntot - k) * math.log(sp2)
        - sum((len(g) - 1) * math.log(np.var(g, ddof=1)) for g in groups)
    ) / (
        1
        + (sum(1 / (len(g) - 1) for g in groups) - 1 / (ntot - k))
        / (3 * (k - 1))
    )
    brow = STATS_QUERIES["bartlett_test"](spark, SF_SMOKE).collect()[0]
    assert brow["n_groups"] == k and brow["n_total"] == ntot
    assert abs(brow["bartlett_stat"] - stat) < 1e-3

    # VIF against numpy correlation-matrix inverse
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    X = np.column_stack(
        [
            li["l_quantity"].to_numpy(dtype=float),
            (li["l_extendedprice"] * 100).round().to_numpy(dtype=float),
            (li["l_discount"] * 100).round().to_numpy(dtype=float),
        ]
    )
    R = np.corrcoef(X, rowvar=False)
    vifs = np.diag(np.linalg.inv(R))
    got = {
        r["regressor"]: r["vif"]
        for r in STATS_QUERIES["vif_multicollinearity"](
            spark, SF_SMOKE
        ).collect()
    }
    for name, v in zip(("quantity", "extendedprice", "discount"), vifs):
        assert abs(got[name] - v) < 1e-4


def test_granger_matches_lstsq_f(spark):
    row = STATS_QUERIES["granger_causality_f"](spark, SF_SMOKE).collect()[0]
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    o["d"] = o["o_orderdate"].dt.date
    g = o.groupby("d")
    y = (
        g["o_totalprice"]
        .apply(lambda s: float((s * 100).round().astype("int64").sum()))
        .sort_index()
        .to_numpy()
    )
    x = g.size().sort_index().to_numpy(dtype=float)
    yy, y1, x1 = y[1:], y[:-1], x[:-1]
    n = len(yy)

    def rss(X, target):
        beta, *_ = np.linalg.lstsq(X, target, rcond=None)
        r = target - X @ beta
        return float(r @ r)

    ones = np.ones(n)
    rss_r = rss(np.column_stack([ones, y1]), yy)
    rss_u = rss(np.column_stack([ones, y1, x1]), yy)
    f = (rss_r - rss_u) / (rss_u / (n - 3))
    assert row["n_obs"] == n
    assert abs(row["f_stat"] - f) < max(1e-3, 1e-4 * abs(f))


def test_negbin_perm_sample_entropy_ph(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    counts = ev.groupby("user_id").size().to_numpy(dtype=float)
    m, v = counts.mean(), counts.var(ddof=1)
    row = STATS_QUERIES["negative_binomial_moments"](
        spark, SF_SMOKE
    ).collect()[0]
    assert row["n_users"] == len(counts)
    assert abs(row["mean_events"] - m) < 1e-5
    assert abs(row["r_hat"] - m * m / (v - m)) < 1e-4
    assert abs(row["p_hat"] - m / v) < 1e-5

    y = _daily_cents(spark)
    # permutation entropy census
    pats = {}
    for i in range(len(y) - 2):
        code = (
            (4 if y[i + 1] >= y[i] else 0)
            + (2 if y[i + 2] >= y[i] else 0)
            + (1 if y[i + 2] >= y[i + 1] else 0)
        )
        pats[code] = pats.get(code, 0) + 1
    total = sum(pats.values())
    ent = -sum(
        (c / total) * math.log(c / total) for c in pats.values()
    ) / math.log(6)
    rows = TS_QUERIES["permutation_entropy"](spark, SF_SMOKE).collect()
    got = {r["pattern"]: r["cnt"] for r in rows}
    assert got == pats
    assert abs(rows[0]["norm_perm_entropy"] - ent) < 1e-5

    # sample entropy brute force
    med2 = int(2 * np.median(y))
    b_cnt = a_cnt = 0
    nn = len(y)
    for i in range(nn - 1):
        for jj in range(i + 1, nn - 1):
            if (
                40 * abs(y[i] - y[jj]) <= med2
                and 40 * abs(y[i + 1] - y[jj + 1]) <= med2
            ):
                b_cnt += 1
                if (
                    i < nn - 2
                    and jj < nn - 2
                    and 40 * abs(y[i + 2] - y[jj + 2]) <= med2
                ):
                    a_cnt += 1
    srow = TS_QUERIES["sample_entropy"](spark, SF_SMOKE).collect()[0]
    assert srow["b_count"] == b_cnt and srow["a_count"] == a_cnt
    assert abs(srow["sampen"] - (-math.log(a_cnt / b_cnt))) < 1e-5

    # Page-Hinkley loop replication (monthly max)
    dser = sorted(
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .toPandas()
        .assign(d=lambda df: df["o_orderdate"].dt.date)
        .groupby("d")["o_totalprice"]
        .apply(lambda s: int((s * 100).round().astype("int64").sum()))
        .items()
    )
    best = {}
    run_sum, cnt, mt, mmin = 0, 0, 0.0, float("inf")
    for d, cents in dser:
        run_sum += cents
        cnt += 1
        dev = round(cents / 100.0 - (run_sum / 100.0) / cnt, 6)
        mt = round(mt + dev, 6)
        mmin = min(mmin, mt)
        ph = mt - min(mmin, mt)
        key = f"{d.year}-{d.month:02d}"
        best[key] = max(best.get(key, 0.0), ph)
    prow = {
        r["month"]: r["max_ph"]
        for r in TS_QUERIES["page_hinkley_drift"](spark, SF_SMOKE).collect()
    }
    assert set(prow) == set(best)
    for kmon in best:
        assert abs(prow[kmon] - best[kmon]) < 1e-4


def _tarjan_scc(nodes, edges):
    adj = {}
    for s, t2 in edges:
        adj.setdefault(s, []).append(t2)
    index, low, onstk, stk, out = {}, {}, set(), [], {}
    counter = [0]

    def strong(v):
        # iterative Tarjan
        work = [(v, 0)]
        while work:
            node, pi = work[-1]
            if pi == 0:
                index[node] = low[node] = counter[0]
                counter[0] += 1
                stk.append(node)
                onstk.add(node)
            recurse = False
            for i in range(pi, len(adj.get(node, []))):
                w = adj[node][i]
                if w not in index:
                    work[-1] = (node, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in onstk:
                    low[node] = min(low[node], index[w])
            if recurse:
                continue
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                cid = min(comp)
                for w in comp:
                    out[w] = (cid, len(comp))
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])

    for v in nodes:
        if v not in index:
            strong(v)
    return out


def test_brand_scc_matches_tarjan(spark):
    rows = GRAPH_QUERIES["brand_transition_scc"](spark, SF_SMOKE).collect()
    # re-extract the edge list independently with pandas
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    pt = spark.read.parquet(f"{SF_SMOKE}/part.parquet").toPandas()
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    rep = (
        li.merge(pt, left_on="l_partkey", right_on="p_partkey")
        .groupby("l_orderkey")["p_brand"]
        .min()
    )
    oo = o.assign(brand=o["o_orderkey"].map(rep)).dropna(subset=["brand"])
    oo = oo.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    edges = set()
    for _, grp in oo.groupby("o_custkey"):
        bs = grp["brand"].tolist()
        for i in range(len(bs) - 1):
            edges.add((bs[i], bs[i + 1]))
    nodes = sorted({s for s, _ in edges} | {t2 for _, t2 in edges})
    want = _tarjan_scc(nodes, edges)
    got = {r["brand"]: (r["scc_id"], r["scc_size"]) for r in rows}
    assert got == want


def test_ams_f2_signs_match_hashlib(spark):
    row = SK_QUERIES["ams_f2_sketch"](spark, SF_SMOKE).collect()[0]
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    freq = o.groupby("o_custkey").size()
    f2 = int((freq.astype("int64") ** 2).sum())
    assert row["true_f2"] == f2
    xs = []
    for j in range(16):
        x = 0
        for k, f in freq.items():
            h16 = int(hashlib.md5(str(int(k)).encode()).hexdigest()[:4], 16)
            x += int(f) * (2 * ((h16 >> j) & 1) - 1)
        xs.append(float(x * x))
    assert abs(row["ams_estimate"] - float(np.median(xs))) < 1e-9


def test_aipw_and_matching(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    cu = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    j = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    j["seg"] = j["c_mktsegment"]
    j["yr"] = j["o_orderdate"].dt.year
    j["tr"] = (j["o_orderstatus"] == "F").astype(int)
    j["y"] = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    mu1 = j[j.tr == 1].groupby("seg")["y"].mean()
    mu0 = j[j.tr == 0].groupby("seg")["y"].mean()
    num = den = 0.0
    nsup = 0
    for (seg, yr), g in j.groupby(["seg", "yr"]):
        n1, n0 = int(g.tr.sum()), int((1 - g.tr).sum())
        if n1 == 0 or n0 == 0:
            continue
        ns = n1 + n0
        nsup += ns
        y1, y0 = int(g[g.tr == 1].y.sum()), int(g[g.tr == 0].y.sum())
        m1, m0 = float(mu1[seg]), float(mu0[seg])
        term = (
            (y1 - n1 * m1) * (ns / n1)
            + ns * m1
            - ((y0 - n0 * m0) * (ns / n0) + ns * m0)
        )
        num += term
        den += ns
    row = AN_QUERIES["aipw_doubly_robust"](spark, SF_SMOKE).collect()[0]
    assert row["n_supported"] == nsup
    assert abs(row["aipw_ate"] - num / den) < 1e-4

    # matching: brute-force nearest control per treated within stratum
    j["cents"] = (j["o_totalprice"] * 100).round().astype("int64")
    tot_d = tot_y = n_m = 0
    for (seg, yr), g in j.groupby(["seg", "yr"]):
        ctl = g[g.tr == 0].sort_values(["cents", "o_orderkey"])
        if len(ctl) == 0:
            continue
        cc = ctl["cents"].to_numpy()
        cy = ctl["y"].to_numpy()
        ck = ctl["o_orderkey"].to_numpy()
        for _, r in g[g.tr == 1].iterrows():
            tc, tk = int(r["cents"]), int(r["o_orderkey"])
            # sorted-neighbor convention: prev = last control strictly
            # before (tc, tk) in (cents, key) order; next = first after
            before = (cc < tc) | ((cc == tc) & (ck < tk))
            prev_i = np.where(before)[0]
            next_i = np.where(~before)[0]
            dp = tc - cc[prev_i[-1]] if len(prev_i) else None
            dn = cc[next_i[0]] - tc if len(next_i) else None
            if dp is not None and (dn is None or dp <= dn):
                my, dist = cy[prev_i[-1]], dp
            else:
                my, dist = cy[next_i[0]], dn
            n_m += 1
            tot_y += int(r["y"]) - int(my)
            tot_d += int(dist)
    mrow = AN_QUERIES["propensity_nn_matching"](spark, SF_SMOKE).collect()[0]
    assert mrow["n_matched"] == n_m
    assert abs(mrow["att"] - tot_y / n_m) < 1e-5
    assert abs(mrow["mean_match_dist"] - tot_d / n_m / 100) < 1e-4


def test_kalman_tracks_float_filter(spark):
    rows = TEMP_QUERIES["kalman_local_level"](spark, SF_SMOKE).collect()
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    o["d"] = o["o_orderdate"].dt.date
    y = (
        o.groupby("d")["o_totalprice"]
        .apply(lambda s: float(round(float(s.astype("float64").sum()))))
        .sort_index()
        .to_numpy()
    )
    r = max(float(np.var(y[:14], ddof=1)), 1.0)
    q = r / 10
    l, p = float(np.mean(y[:7])), r
    hist = {1: l}
    for t_i in range(1, len(y)):
        pp = p + q
        k = pp / (pp + r)
        l = l + k * (y[t_i] - l)
        p = (1 - k) * pp
        hist[t_i + 1] = l
    for row in rows:
        # integer lattice vs float filter: relative agreement
        assert abs(row["level"] - hist[row["t"]]) / abs(hist[row["t"]]) < 0.01


def test_cox_newton_converged_and_matches_numpy(spark):
    row = EXP_QUERIES["cox_ph_binary"](spark, SF_SMOKE).collect()[0]
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    per = ev.groupby("user_id").agg(
        t0=("ts", "min"), t_last=("ts", "max")
    )
    pe = (
        ev[ev.event_type == "purchase"].groupby("user_id")["ts"].min()
    )
    per["t_ev"] = pe
    spells = []
    for uid, r in per.iterrows():
        obs = not (r["t_ev"] is None or r["t_ev"] != r["t_ev"])
        end = r["t_ev"] if obs else r["t_last"]
        spells.append(
            (int((end - r["t0"]).total_seconds()), obs, int(uid) % 2)
        )
    import collections

    times = collections.defaultdict(lambda: [0, 0, 0, 0])  # d d1 lv lv1
    for t_s, obs, grp in spells:
        e = times[t_s]
        e[2] += 1
        e[3] += grp
        if obs:
            e[0] += 1
            e[1] += grp
    ts_sorted = sorted(times)
    n = n1 = 0
    risk = []
    for t_s in reversed(ts_sorted):
        d, d1, lv, lv1 = times[t_s]
        n += lv
        n1 += lv1
        if d > 0:
            risk.append((d, d1, n - n1, n1))
    d1_total = sum(r[1] for r in risk)
    beta = 0.0
    for _ in range(30):
        u = d1_total - sum(
            d * r1 * math.exp(beta) / (r0 + r1 * math.exp(beta))
            for d, _, r0, r1 in risk
        )
        i = sum(
            d * r0 * r1 * math.exp(beta) / (r0 + r1 * math.exp(beta)) ** 2
            for d, _, r0, r1 in risk
        )
        beta += u / i
        if abs(u / i) < 1e-12:
            break
    assert row["d1_total"] == d1_total
    assert abs(row["beta"] - beta) < 1e-4
    assert abs(row["hazard_ratio"] - math.exp(beta)) < 1e-3


def test_readability_recount(spark):
    import re

    rows = {
        r["lang"]: r
        for r in __import__(
            "tb_scale_spatial_data_pipeline_spark.plans.text_queries",
            fromlist=["QUERIES"],
        ).QUERIES["readability_scores"](spark, SF_SMOKE).collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    agg = {}
    for _, r in docs.iterrows():
        words = [
            w
            for w in re.sub(r"\s+", " ", r["text"].lower()).strip().split(" ")
            if w
        ]
        a = agg.setdefault(r["lang"], [0, 0, 0])
        for w in words:
            g = len(re.findall(r"[aeiou]+", w))
            s = max(g - (1 if (w.endswith("e") and g >= 2) else 0), 1)
            a[0] += 1
            a[1] += s
            a[2] += 1 if s >= 3 else 0
    for lang, (nw, ns, nc) in agg.items():
        r = rows[lang]
        assert r["n_words"] == nw and r["n_syllables"] == ns
        assert abs(r["complex_rate"] - nc / nw) < 1e-6


def test_dickey_fuller_gumbel_cooks_taylor(spark):
    y = _daily_cents(spark).astype(float)
    dy, yl = np.diff(y), y[:-1]
    n = len(dy)
    X = np.column_stack([np.ones(n), yl])
    beta, *_ = np.linalg.lstsq(X, dy, rcond=None)
    resid = dy - X @ beta
    s2 = float(resid @ resid) / (n - 2)
    se = math.sqrt(s2 / float(np.sum((yl - yl.mean()) ** 2)))
    row = TS_QUERIES["dickey_fuller_unitroot"](spark, SF_SMOKE).collect()[0]
    assert row["n_obs"] == n
    assert abs(row["rho_minus_1"] - beta[1]) < 1e-5
    assert abs(row["df_stat"] - beta[1] / se) < 1e-3

    # Gumbel block maxima vs numpy moments
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    o["d"] = o["o_orderdate"].dt.date
    dly = (
        o.assign(c=(o["o_totalprice"] * 100).round().astype("int64"))
        .groupby("d")["c"]
        .sum()
        .reset_index()
    )
    dly["mth"] = [f"{d.year}-{d.month:02d}" for d in dly["d"]]
    mx = dly.groupby("mth")["c"].max().to_numpy(dtype=float) / 100
    m, s = mx.mean(), mx.std(ddof=1)
    beta_g = s * math.sqrt(6) / math.pi
    mu_g = m - 0.5772156649015329 * beta_g
    grow = TS_QUERIES["gumbel_block_maxima"](spark, SF_SMOKE).collect()[0]
    assert grow["n_blocks"] == len(mx)
    assert abs(grow["gumbel_beta"] - beta_g) < 1e-4
    assert abs(grow["gumbel_mu"] - mu_g) < 1e-3
    rl = mu_g - beta_g * math.log(-math.log(1 - 1 / 12))
    assert abs(grow["return_level_12"] - rl) < 1e-3

    # Cook's distance top-10 vs numpy hat-matrix formula
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    cnt = li.groupby("l_orderkey").size()
    oo = o.set_index("o_orderkey")
    common = cnt.index.intersection(oo.index)
    x = cnt.loc[common].to_numpy(dtype=float)
    yv = (
        (oo.loc[common, "o_totalprice"] * 100).round().to_numpy(dtype=float)
    )
    nn = len(x)
    Xc = np.column_stack([np.ones(nn), x])
    bet, *_ = np.linalg.lstsq(Xc, yv, rcond=None)
    e = yv - Xc @ bet
    s2c = float(e @ e) / (nn - 2)
    hx = 1 / nn + (x - x.mean()) ** 2 / float(np.sum((x - x.mean()) ** 2))
    D = (e**2 / (2 * s2c)) * (hx / (1 - hx) ** 2)
    order = np.lexsort((common.to_numpy(), -D))[:10]
    want = {int(common[i]): float(D[i]) for i in order}
    rows = STATS_QUERIES["cooks_distance_top"](spark, SF_SMOKE).collect()
    assert {r["o_orderkey"] for r in rows} == set(want)
    for r in rows:
        assert abs(r["cooks_d"] - want[r["o_orderkey"]]) < 1e-4

    # Taylor's law vs numpy log-log regression over brand groups
    pt = spark.read.parquet(f"{SF_SMOKE}/part.parquet").toPandas()
    lj = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    lj["d"] = lj["l_shipdate"].dt.date
    lj["c"] = (lj["l_extendedprice"] * 100).round().astype("int64")
    g = lj.groupby(["p_brand", "d"])["c"].sum().reset_index()
    lm, lv = [], []
    for _, gb in g.groupby("p_brand"):
        v = gb["c"].to_numpy(dtype=float)
        if len(v) >= 2:
            lm.append(math.log(v.mean()))
            lv.append(math.log(v.var(ddof=1)))
    slope, icpt = np.polyfit(lm, lv, 1)
    trow = TS_QUERIES["taylors_law_exponent"](spark, SF_SMOKE).collect()[0]
    assert trow["n_brands"] == len(lm)
    assert abs(trow["taylor_exponent"] - slope) < 1e-4
    assert abs(trow["log_intercept"] - icpt) < 1e-3


def test_elo_and_hampel(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    pt = spark.read.parquet(f"{SF_SMOKE}/part.parquet").toPandas()
    lj = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    lj["d"] = lj["l_shipdate"].dt.date
    lj["c"] = (lj["l_extendedprice"] * 100).round().astype("int64")
    rev = lj.groupby(["d", "p_brand"])["c"].sum().reset_index()
    ratings = {}
    n_duels = 0
    for d, g in rev.groupby("d"):
        g = g.sort_values(["c", "p_brand"], ascending=[False, True])
        if len(g) < 2:
            continue
        wb, lb = g.iloc[0]["p_brand"], g.iloc[1]["p_brand"]
        ra = ratings.get(wb, 1000.0)
        rb = ratings.get(lb, 1000.0)
        e = round(1 / (1 + 10 ** ((rb - ra) / 400)), 9)
        delta = round(32 * (1 - e), 6)
        ratings[wb] = round(ra + delta, 6)
        ratings[lb] = round(rb - delta, 6)
        n_duels += 1
    for b in pt["p_brand"].unique():
        ratings.setdefault(b, 1000.0)
    want = sorted(ratings.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = TS_QUERIES["elo_brand_ratings"](spark, SF_SMOKE).collect()
    assert rows[0]["n_duels"] == n_duels
    got = [(r["brand"], r["rating"]) for r in rows]
    for (gb, gr), (wb, wr) in zip(got, want):
        assert gb == wb and abs(gr - wr) < 1e-5

    # Hampel brute force
    y = _daily_cents(spark)
    n = len(y)
    flagged = []
    for i in range(n):
        wdw = y[max(0, i - 7) : min(n, i + 8)]
        m2 = int(2 * np.median(wdw))
        mad4 = int(2 * np.median(np.abs(2 * wdw - m2)))
        if abs(2 * int(y[i]) - m2) * 20000 > 3 * 14826 * mad4:
            flagged.append(i)
    rows = TS_QUERIES["hampel_outlier_days"](spark, SF_SMOKE).collect()
    assert len(rows) == len(flagged)

    # MCC closed form
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    yv = o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    preds = {
        "price_150k": (o["o_totalprice"] > 150000).astype(int),
        "price_100k_F": (
            (o["o_totalprice"] > 100000) & (o["o_orderstatus"] == "F")
        ).astype(int),
    }
    rows = {
        r["model"]: r
        for r in EXP_QUERIES["matthews_corrcoef_models"](
            spark, SF_SMOKE
        ).collect()
    }
    for mdl, pv in preds.items():
        tp = int(((pv == 1) & (yv == 1)).sum())
        tn = int(((pv == 0) & (yv == 0)).sum())
        fp = int(((pv == 1) & (yv == 0)).sum())
        fn = int(((pv == 0) & (yv == 1)).sum())
        mcc = (tp * tn - fp * fn) / math.sqrt(
            (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
        )
        r = rows[mdl]
        assert (r["tp"], r["tn"], r["fp"], r["fn"]) == (tp, tn, fp, fn)
        assert abs(r["mcc"] - mcc) < 1e-5


def test_spectral_hill_weiszfeld(spark):
    # spectral entropy vs numpy periodogram over the same period bank
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    dmin = o["o_orderdate"].min()
    o["d"] = (o["o_orderdate"] - dmin).dt.days
    dser = (
        o.assign(c=(o["o_totalprice"] * 100))
        .groupby("d")["c"]
        .sum()
        .sort_index()
    )
    d = dser.index.to_numpy(dtype=float)
    x = dser.to_numpy(dtype=float)
    powers = []
    for p in range(2, 31):
        c = float(np.sum(x * np.cos(2 * math.pi * d / p)))
        s = float(np.sum(x * np.sin(2 * math.pi * d / p)))
        powers.append(c * c + s * s)
    powers = np.array(powers)
    prob = powers / powers.sum()
    h = float(-(prob * np.log(prob)).sum() / math.log(29))
    dom = int(np.arange(2, 31)[np.argmax(powers)])
    row = TS_QUERIES["spectral_entropy"](spark, SF_SMOKE).collect()[0]
    assert row["n_periods"] == 29 and row["dominant_period"] == dom
    assert abs(row["spectral_entropy"] - h) < 1e-4

    # Hill estimator vs numpy order statistics
    cents = np.sort(
        (o["o_totalprice"] * 100).round().astype("int64").to_numpy()
    )[::-1]
    k = 100
    xk1 = float(cents[k])
    hh = float(np.mean(np.log(cents[:k].astype(float)) - math.log(xk1)))
    hrow = STATS_QUERIES["hill_tail_index"](spark, SF_SMOKE).collect()[0]
    assert hrow["k"] == k
    assert abs(hrow["threshold"] - xk1 / 100) < 1e-9
    assert abs(hrow["hill_h"] - hh) < 1e-5
    assert abs(hrow["tail_alpha"] - 1 / hh) < 1e-3

    # Weiszfeld vs full-precision numpy iteration (5 sweeps, same init)
    cu = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    px = (cu["c_custkey"] % 40).to_numpy(dtype=float)
    py = (cu["c_custkey"] % 30).to_numpy(dtype=float)
    xx, yy = px.mean(), py.mean()
    for _ in range(5):
        dist = np.sqrt((xx - px) ** 2 + (yy - py) ** 2 + 1e-9)
        w = 1 / dist
        xx, yy = float((px * w).sum() / w.sum()), float(
            (py * w).sum() / w.sum()
        )
    from tb_scale_spatial_data_pipeline_spark.plans.spatial_queries import (
        QUERIES as SP_QUERIES,
    )

    wrow = SP_QUERIES["geometric_median_weiszfeld"](
        spark, SF_SMOKE
    ).collect()[0]
    assert wrow["n_customers"] == len(cu)
    assert abs(wrow["median_x"] - xx) < 1e-4
    assert abs(wrow["median_y"] - yy) < 1e-4


def test_white_pettitt_hullwidth(spark):
    # White LM vs numpy two-stage regression
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").toPandas()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    cnt = li.groupby("l_orderkey").size()
    oo = o.set_index("o_orderkey")
    common = cnt.index.intersection(oo.index)
    x = cnt.loc[common].to_numpy(dtype=float)
    y = (oo.loc[common, "o_totalprice"] * 100).round().to_numpy(dtype=float)
    n = len(x)
    X1 = np.column_stack([np.ones(n), x])
    b1, *_ = np.linalg.lstsq(X1, y, rcond=None)
    g = np.round((y - X1 @ b1) / 100) ** 2
    Z = np.column_stack([np.ones(n), x, x * x])
    bz, *_ = np.linalg.lstsq(Z, g, rcond=None)
    ss_res = float(np.sum((g - Z @ bz) ** 2))
    ss_tot = float(np.sum((g - g.mean()) ** 2))
    r2 = 1 - ss_res / ss_tot
    row = STATS_QUERIES["white_lm_test"](spark, SF_SMOKE).collect()[0]
    assert row["n_obs"] == n
    assert abs(row["r2_aux"] - r2) < 1e-6
    assert abs(row["white_lm"] - n * r2) < 1e-2

    # Pettitt vs brute-force double loop over sign pairs
    yd = _daily_cents(spark)
    nn = len(yd)
    best_k, best_t = -1, None
    for t_i in range(1, nn):  # split after index t_i-1 (1-based t)
        u = int(
            np.sign(
                yd[:t_i, None].astype(np.int64)
                - yd[None, t_i:].astype(np.int64)
            ).sum()
        )
        if abs(u) > best_k:
            best_k, best_t = abs(u), t_i
    prow = STATS_QUERIES["pettitt_change_point"](spark, SF_SMOKE).collect()[0]
    assert prow["n_days"] == nn
    assert prow["k_stat"] == best_k
    p = 2 * math.exp(-6 * best_k**2 / (nn**2 * (nn + 1)))
    assert abs(prow["p_approx"] - p) < 1e-5

    # hull width vs brute force over all edge-direction candidates
    cu = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").toPandas()
    cu["px"] = (cu["c_custkey"] % 40).astype(int)
    cu["py"] = (cu["c_custkey"] % 30).astype(int)
    rows = {
        r["nation"]: r["hull_width"]
        for r in __import__(
            "tb_scale_spatial_data_pipeline_spark.plans.spatial_queries",
            fromlist=["QUERIES"],
        ).QUERIES["hull_width_calipers"](spark, SF_SMOKE).collect()
    }
    from tb_scale_spatial_data_pipeline_spark.functions.geometry import (
        _convex_hull,
    )

    for nat, gdf in cu.groupby("c_nationkey"):
        pts = np.unique(gdf[["px", "py"]].to_numpy(dtype=float), axis=0)
        h = _convex_hull(pts)
        width = float("inf")
        m = len(h)
        for i in range(m):
            a, b = h[i], h[(i + 1) % m]
            e = b - a
            ln = math.hypot(*e)
            mx = max(
                abs(e[0] * (p[1] - a[1]) - e[1] * (p[0] - a[0])) for p in pts
            )
            width = min(width, mx / ln)
        assert abs(rows[int(nat)] - width) < 1e-5
