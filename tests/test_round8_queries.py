"""Independent-implementation replays + invariants for the round-8
query additions. The DuckDB oracles already pin cross-engine hash
equality; these tests pin the MATH against driver-side Python/numpy
reimplementations and the structural guarantees each operator makes
(one-sided sketch bounds, probability normalization, bin partitions).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import numpy as np
import pytest

from conftest import SF_SMOKE

from tb_scale_spatial_data_pipeline_spark.plans import all_queries


@pytest.fixture(scope="module")
def docs_tokens(spark):
    rows = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    out = {}
    for r in rows:
        norm = re.sub(r"\s+", " ", r["text"].lower()).strip()
        out[r["doc_id"]] = [t for t in norm.split(" ") if t]
    return out


def test_kneser_ney_replay_and_normalization(spark, docs_tokens):
    """Top-20 KN probabilities equal a pure-Python replay, and the
    FULL smoothed conditional distribution sums to 1 per context —
    the normalization property that distinguishes Kneser-Ney from an
    ad-hoc discount."""
    bc: Counter = Counter()
    for toks in docs_tokens.values():
        for a, b in zip(toks, toks[1:]):
            bc[(a, b)] += 1
    c1: Counter = Counter()
    n_follow: Counter = Counter()
    n_precede: Counter = Counter()
    for (a, b), c in bc.items():
        c1[a] += c
        n_follow[a] += 1
        n_precede[b] += 1
    n_types = float(len(bc))
    D = 0.75

    def kn(a, b):
        return (
            max(bc[(a, b)] - D, 0.0)
            + D * n_follow[a] * (n_precede[b] / n_types)
        ) / c1[a]

    got = all_queries()["kneser_ney_bigram"](spark, SF_SMOKE).collect()
    assert len(got) == 20
    for r in got:
        assert r["c_bigram"] == bc[(r["w1"], r["w2"])]
        assert abs(r["kn_prob"] - round(kn(r["w1"], r["w2"]), 6)) <= 1e-6

    # normalization: sum over the full continuation vocab for a few
    # contexts. Restricted to observed w2 types the sum is < 1; adding
    # the unobserved-type mass D*n_follow*Pcont(w2) completes it.
    vocab_cont = list(n_precede)
    for a in list(c1)[:5]:
        s = sum(
            (
                max(bc.get((a, b), 0) - D, 0.0)
                + D * n_follow[a] * (n_precede[b] / n_types)
            )
            / c1[a]
            for b in vocab_cont
        )
        assert abs(s - 1.0) < 1e-9, f"context {a}: sum {s}"


def test_bm25_replay(spark, docs_tokens):
    """Top-20 BM25 equals a pure-Python replay (Lucene IDF form)."""
    terms = ("sort", "batch", "vector")
    k1, b = 1.2, 0.75
    # the query tokenizes on [^a-z0-9]+ over the RAW lowercased text
    rows = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    toks = {
        r["doc_id"]: [t for t in re.split(r"[^a-z0-9]+", r["text"].lower()) if t]
        for r in rows
    }
    n_docs = float(len(toks))
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / n_docs
    df = {x: sum(1 for ts in toks.values() if x in ts) for x in terms}

    def bm25(d):
        s = 0.0
        for x in terms:
            tf = toks[d].count(x)
            idf = math.log(1.0 + (n_docs - df[x] + 0.5) / (df[x] + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dl[d] / avgdl)
            )
        return s

    scored = sorted(
        ((d, round(bm25(d), 6)) for d in toks if any(x in toks[d] for x in terms)),
        key=lambda t: (-t[1], t[0]),
    )[:20]
    got = [
        (r["doc_id"], r["bm25"])
        for r in all_queries()["bm25_topk"](spark, SF_SMOKE).collect()
    ]
    assert got == scored


def test_cms_join_size_one_sided_and_exact_truth(spark):
    """CMS inner product NEVER underestimates the true join size
    (Cormode-Muthukrishnan one-sided error), and the exact arm equals
    the real join cardinality."""
    r = all_queries()["cms_join_size_estimate"](spark, SF_SMOKE).collect()[0]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    true_join = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).count()
    assert r["exact_join_rows"] == true_join
    assert r["cms_join_rows"] >= true_join
    assert r["rel_overestimate"] >= 0.0


def test_repeated_substring_spans_replay(spark, docs_tokens):
    """Per-doc span stats equal a pure-Python replay of the
    window-hash/dup-set/island-merge pipeline."""
    W = 8
    owners = defaultdict(set)
    wins = {}
    for d, ts in docs_tokens.items():
        ps = []
        for i in range(len(ts) - W + 1):
            key = " ".join(ts[i : i + W])
            owners[key].add(d)
            ps.append((i + 1, key))
        wins[d] = ps
    expect = {}
    for d, ps in wins.items():
        hits = [p for p, key in ps if len(owners[key]) >= 2]
        if not hits:
            continue
        spans = []
        start = prev = hits[0]
        for p in hits[1:]:
            if p - prev <= W:
                prev = p
            else:
                spans.append((start, prev + W))
                start = prev = p
        spans.append((start, prev + W))
        dup_tokens = sum(e - s for s, e in spans)
        expect[d] = (len(spans), dup_tokens, len(docs_tokens[d]))
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"], r["n_tokens"])
        for r in all_queries()["repeated_substring_spans"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == expect
    for d, (_, dup, n) in got.items():
        assert dup <= n, f"doc {d} coverage exceeds length"


def test_embedding_covariance_replay(spark):
    """Top-10 |covariance| pairs equal a numpy replay over the
    quantized matrix."""
    rows = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "embedding"
    ).collect()
    X = np.array(
        [
            [round(float(x) * 1e6) for x in r["embedding"]]
            for r in rows
        ],
        dtype=np.int64,
    )
    n, d = X.shape
    s1 = X.sum(axis=0).astype(float)
    expect = []
    for i in range(d - 1):
        sp = (X[:, i][:, None] * X[:, i + 1 :]).sum(axis=0).astype(float)
        for off, spv in enumerate(sp):
            j = i + 1 + off
            cov = round((spv - s1[i] * s1[j] / n) / (n - 1) / 1e12, 6)
            expect.append((i + 1, j + 1, cov))
    expect.sort(key=lambda t: (-abs(t[2]), t[0], t[1]))
    got = [
        (r["dim_i"], r["dim_j"], r["cov_v"])
        for r in all_queries()["embedding_covariance_pairs"](
            spark, SF_SMOKE
        ).collect()
    ]
    assert got == expect[:10]


def test_calibration_bins_partition_and_brier(spark):
    """Bins partition the orders table exactly, and the n-weighted
    mean of per-bin Brier terms equals the overall Brier score from a
    numpy replay."""
    out = all_queries()["prediction_calibration_report"](
        spark, SF_SMOKE
    ).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_totalprice", "o_orderpriority"
    ).toPandas()
    assert sum(r["n"] for r in out) == len(orders)
    mp = float(orders["o_totalprice"].max())
    s6 = np.round(
        orders["o_totalprice"].astype(float) / mp * 1e6
    ).astype(np.int64)
    y = orders["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    brier = float(((s6 - y * 1000000) ** 2).sum()) / len(orders) / 1e12
    got = sum(r["brier_bin"] * r["n"] for r in out) / sum(r["n"] for r in out)
    assert abs(got - brier) < 1e-5


def test_minhash_calibration_structure(spark):
    """n_equal stays in 0..8 with est = n/8, and the calibration is
    populated (LSH candidates exist at the smoke SF)."""
    out = all_queries()["minhash_jaccard_calibration"](
        spark, SF_SMOKE
    ).collect()
    assert out, "no LSH candidate pairs at smoke SF"
    for r in out:
        assert 0 <= r["n_equal"] <= 8
        assert abs(r["est_jaccard"] - r["n_equal"] / 8.0) <= 1e-9
        assert 0.0 <= r["mean_exact_jaccard"] <= 1.0
        assert r["n_pairs"] >= 1


def test_corpus_datasheet_totals(spark):
    """Source rows partition the corpus; token totals agree with the
    tokenizer."""
    out = all_queries()["corpus_datasheet"](spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert sum(r["n_docs"] for r in out) == docs.count()
    for r in out:
        assert r["n_exact_dups"] >= 0
        assert 0.0 <= r["dup_frac"] < 1.0
        assert abs(r["avg_tokens"] - round(r["total_tokens"] / r["n_docs"], 6)) <= 1e-6


def test_stream_hll_tracks_exact_distinct(spark):
    """Windowed HLL estimates track the exact per-window distinct-user
    counts within the sketch's error envelope (m=256 linear-counting
    regime at this cardinality)."""
    from pyspark.sql import functions as F

    out = {
        r["wstart"]: r["hll_users"]
        for r in all_queries()["stream_windowed_distinct_hll"](
            spark, SF_SMOKE
        ).collect()
    }
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    from tb_scale_spatial_data_pipeline_spark.sources.catalog import (
        normalize_event_ts,
    )

    exact = {
        r["wstart"]: r["nd"]
        for r in normalize_event_ts(ev)
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.countDistinct("user_id").alias("nd"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "nd",
        )
        .collect()
    }
    assert set(out) == set(exact)
    for w, est in out.items():
        nd = exact[w]
        assert abs(est - nd) <= max(2.0, 0.25 * nd), (w, est, nd)


def test_closeness_centrality_replay(spark):
    """Multi-source BFS centralities equal a deque-BFS replay."""
    from collections import deque

    from tb_scale_spatial_data_pipeline_spark.plans.graph_queries import (
        _undirected_edges,
    )

    eu = _undirected_edges(spark, SF_SMOKE).collect()
    adj = defaultdict(set)
    for r in eu:
        adj[r["u"]].add(r["v"])
        adj[r["v"]].add(r["u"])
    seeds = [n for n in adj if n % 10 == 0]
    expect = {}
    for s in seeds:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            if dist[u] >= 8:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        ds = [d for d in dist.values() if d > 0]
        expect[s] = (
            len(ds),
            sum(ds),
            round(len(ds) / sum(ds), 6),
            round(sum(840 // d for d in ds) / 840.0, 6),
        )
    got = {
        r["s_suppkey"]: (
            r["n_reached"],
            r["sum_hops"],
            r["closeness"],
            r["harmonic"],
        )
        for r in all_queries()["closeness_centrality_sampled"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == expect


def test_ann_recall_report_replay(spark):
    """Recall@10 equals a numpy brute-force + bucket replay."""
    from tb_scale_spatial_data_pipeline_spark.operators.similarity import (
        plane_sign,
    )

    rows = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).collect()
    ids = [r["vec_id"] for r in rows]
    X = np.array([[float(x) for x in r["embedding"]] for r in rows])
    planes = np.array(
        [[float(plane_sign(p, j)) for j in range(64)] for p in range(8)]
    )
    dots = X @ planes.T
    buckets = {
        i: int(sum((1 << p) for p in range(8) if round(dots[k, p], 9) >= 0))
        for k, i in enumerate(ids)
    }
    norms = np.sqrt((X * X).sum(axis=1))
    qids = [i for i in ids if i % 50 == 0]
    idx = {i: k for k, i in enumerate(ids)}

    def topk(qid, cands):
        qv = X[idx[qid]]
        scored = sorted(
            (
                (-round(float(X[idx[c]] @ qv / (norms[idx[c]] * norms[idx[qid]] + 1e-12)), 6), c)
                for c in cands
            ),
        )[:10]
        return {c for _, c in scored}

    hits = 0
    total_c = 0
    for qid in qids:
        exact = topk(qid, [i for i in ids if i != qid])
        cands = [i for i in ids if i != qid and buckets[i] == buckets[qid]]
        total_c += len(cands)
        hits += len(exact & topk(qid, cands)) if cands else 0
    r = all_queries()["ann_recall_report"](spark, SF_SMOKE).collect()[0]
    assert r["n_queries"] == len(qids)
    assert r["total_hits"] == hits
    assert r["recall_at_10"] == round(hits / (10 * len(qids)), 6)
    assert r["mean_bucket_candidates"] == round(total_c / len(qids), 6)


def test_query_likelihood_dirichlet_replay(spark):
    """Top-20 Dirichlet QL scores equal a pure-Python replay, and
    every doc scores (collection-model backoff) unlike BM25's
    matched-only set."""
    terms = ("merge", "filter", "group")
    mu = 100.0
    rows = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    toks = {
        r["doc_id"]: [t for t in re.split(r"[^a-z0-9]+", r["text"].lower()) if t]
        for r in rows
    }
    n_tok = float(sum(len(ts) for ts in toks.values()))
    cf = {x: sum(ts.count(x) for ts in toks.values()) for x in terms}

    def ql(d):
        dl = len(toks[d])
        return sum(
            math.log((toks[d].count(x) + mu * (cf[x] / n_tok)) / (dl + mu))
            for x in terms
        )

    scored = sorted(
        ((d, round(ql(d), 6)) for d in toks), key=lambda t: (-t[1], t[0])
    )[:20]
    got = [
        (r["doc_id"], r["ql_score"])
        for r in all_queries()["query_likelihood_dirichlet"](
            spark, SF_SMOKE
        ).collect()
    ]
    assert got == scored


def test_graph_diameter_sweep_replay(spark):
    """Double-sweep outputs equal a deque-BFS replay, and the second
    eccentricity dominates the first (the sweep's defining
    inequality)."""
    from collections import deque

    from tb_scale_spatial_data_pipeline_spark.plans.graph_queries import (
        _undirected_edges,
    )

    eu = _undirected_edges(spark, SF_SMOKE).collect()
    adj = defaultdict(set)
    for r in eu:
        adj[r["u"]].add(r["v"])
        adj[r["v"]].add(r["u"])

    def bfs(s):
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            if dist[u] >= 12:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        return dist

    start = min(adj)
    d1 = bfs(start)
    ecc1 = max(d1.values())
    far = min(n for n, h in d1.items() if h == ecc1)
    d2 = bfs(far)
    r = all_queries()["graph_diameter_sweep"](spark, SF_SMOKE).collect()[0]
    assert (
        r["start_node"],
        r["ecc_start"],
        r["far_node"],
        r["diameter_lb"],
        r["component_size"],
    ) == (start, ecc1, far, max(d2.values()), len(d1))
    assert r["diameter_lb"] >= r["ecc_start"]


def test_d8_flow_tile_invariance_and_replay(spark):
    """D8 flow is tile-origin invariant (halo contract) and equals a
    direct numpy replay over the whole field, including the
    smallest-code tie-break and the pit/flat zero."""
    from tb_scale_spatial_data_pipeline_spark.raster.kernels import (
        _D8,
        _round_half_away,
        d8_flow_tiles,
    )
    from tb_scale_spatial_data_pipeline_spark.raster.tiles import (
        halo_duplicate,
        synthetic_raster,
    )

    img = synthetic_raster(spark, 48, 48, bands=1)

    def run(tile, halo):
        out = d8_flow_tiles(halo_duplicate(img, tile, halo), "b1")
        return {
            (r["x"], r["y"]): (r["flow_dir"], r["max_drop"])
            for r in out.collect()
        }

    a = run(16, 1)
    b = run(24, 2)
    keys = [k for k in a if 1 <= k[0] <= 46 and 1 <= k[1] <= 46]
    assert keys and all(a[k] == b[k] for k in keys)

    # full-field numpy replay (edge-clamped pad, ascending codes)
    pdf = img.toPandas()
    z = np.full((48, 48), np.nan)
    for _, r in pdf.iterrows():
        z[int(r["y"]), int(r["x"])] = r["b1"]
    zp = np.pad(z, 1, mode="edge")
    best = np.full(z.shape, -np.inf)
    bdir = np.zeros(z.shape, dtype=int)
    for code, dy, dx, dist in _D8:
        zn = zp[1 + dy : 49 + dy, 1 + dx : 49 + dx]
        drop = _round_half_away((z - zn) / dist)
        upd = drop > best
        best = np.where(upd, drop, best)
        bdir = np.where(upd, code, bdir)
    for (x, y), (fd, md) in a.items():
        want_fd = bdir[y, x] if best[y, x] > 0 else 0
        want_md = best[y, x] if best[y, x] > 0 else 0.0
        assert fd == want_fd and md == want_md, (x, y)


def test_spatial_knn_join_replay(spark):
    """Blocked KNN equals a brute-force replay RESTRICTED to the same
    3x3-cell candidate set (the documented envelope), with integer
    distances and (dist2, b_id) tie-break."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey"
    ).collect()
    supp = spark.read.parquet(f"{SF_SMOKE}/supplier.parquet").select(
        "s_suppkey"
    ).collect()
    bs = [
        (r["s_suppkey"], (r["s_suppkey"] * 7) % 40, (r["s_suppkey"] * 11) % 30)
        for r in supp
    ]
    expect = {}
    for r in cust:
        a = r["c_custkey"]
        ax, ay = a % 40, a % 30
        cellx, celly = ax // 10, ay // 10
        cand = [
            (bid, (ax - bx) ** 2 + (ay - by) ** 2)
            for bid, bx, by in bs
            if abs(bx // 10 - cellx) <= 1 and abs(by // 10 - celly) <= 1
        ]
        cand.sort(key=lambda t: (t[1], t[0]))
        for i, (bid, d2) in enumerate(cand[:3], 1):
            expect[(a, i)] = (bid, d2)
    got = {
        (r["a_id"], r["rn"]): (r["b_id"], r["dist2"])
        for r in all_queries()["spatial_knn_join"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_hist_equalization_flattens(spark):
    """Equalized per-tile histograms are near-uniform (that's the
    point of the op): every tile's 16 bins each hold 32x32/16 = 64
    pixels up to CDF-granularity slack, and bins partition the tile."""
    out = all_queries()["raster_hist_equalization"](spark, SF_SMOKE).collect()
    per_tile = defaultdict(dict)
    for r in out:
        per_tile[(r["tile_x"], r["tile_y"])][r["bin"]] = r["n_px"]
    assert len(per_tile) == 4
    for tile, bins in per_tile.items():
        assert sum(bins.values()) == 32 * 32, tile
        # near-uniform: no bin more than 2x the ideal 64 (the field is
        # smooth, so distinct-value granularity is fine-grained)
        assert max(bins.values()) <= 128, (tile, bins)


def test_functional_closure_chain_tree_and_cycle(spark):
    """Pointer-doubling closure on a known chain and a known tree
    equals the brute-force transitive closure; a cycle raises instead
    of silently emitting a partial closure."""
    from tb_scale_spatial_data_pipeline_spark.operators.graphs import (
        functional_closure,
    )

    # chain 0 -> 1 -> ... -> 9 (length 10 needs 4 doubling rounds)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src bigint, dst bigint"
    )
    stats: dict = {}
    got = {
        (r["src"], r["dst"])
        for r in functional_closure(chain, stats=stats).collect()
    }
    want = {(i, j) for i in range(9) for j in range(i + 1, 10)}
    assert got == want
    assert stats["rounds"] <= 4  # log2(9) rounds, not 9

    # tree: 1->0, 2->0, 3->1, 4->1, 5->3  (parent pointers)
    tree = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1), (5, 3)], "src bigint, dst bigint"
    )
    got_t = {
        (r["src"], r["dst"]) for r in functional_closure(tree).collect()
    }
    want_t = {
        (1, 0), (2, 0), (3, 1), (3, 0), (4, 1), (4, 0),
        (5, 3), (5, 1), (5, 0),
    }
    assert got_t == want_t

    cyc = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="cycle"):
        functional_closure(cyc, max_pow=4)


def test_d8_flow_accumulation_replay(spark):
    """Flow accumulation equals a direct per-cell path walk over the
    numpy-replayed flow grid — every cell's count is the number of
    upstream cells whose descent path drains through it — and the
    conservation identity holds: the total accumulation equals the
    sum of all path lengths."""
    from tb_scale_spatial_data_pipeline_spark.plans import all_queries

    out = {
        (r["x"], r["y"]): r["flow_acc"]
        for r in all_queries()["d8_flow_accumulation"](spark, SF_SMOKE).collect()
    }
    assert len(out) == 64 * 64

    from tb_scale_spatial_data_pipeline_spark.raster.kernels import (
        _D8,
        _round_half_away,
    )
    from tb_scale_spatial_data_pipeline_spark.raster.tiles import (
        synthetic_raster,
    )

    pdf = synthetic_raster(spark, 64, 64, bands=1).toPandas()
    z = np.full((64, 64), np.nan)
    for _, r in pdf.iterrows():
        z[int(r["y"]), int(r["x"])] = r["b1"]
    zp = np.pad(z, 1, mode="edge")
    best = np.full(z.shape, -np.inf)
    bdx = np.zeros(z.shape, dtype=int)
    bdy = np.zeros(z.shape, dtype=int)
    for code, dy, dx, dist in _D8:
        zn = zp[1 + dy : 65 + dy, 1 + dx : 65 + dx]
        drop = _round_half_away((z - zn) / dist)
        upd = drop > best
        best = np.where(upd, drop, best)
        bdx = np.where(upd, dx, bdx)
        bdy = np.where(upd, dy, bdy)
    nxt = {}
    for yy in range(64):
        for xx in range(64):
            if best[yy, xx] > 0:
                tx, ty = xx + bdx[yy, xx], yy + bdy[yy, xx]
                if 0 <= tx < 64 and 0 <= ty < 64:
                    nxt[(xx, yy)] = (tx, ty)
    acc: defaultdict = defaultdict(int)
    total_path = 0
    for cell in list(nxt):
        cur = cell
        while cur in nxt:
            cur = nxt[cur]
            acc[cur] += 1
            total_path += 1
    for k, v in out.items():
        assert v == acc.get(k, 0), k
    assert sum(out.values()) == total_path


def test_grid_dbscan_replay(spark):
    """grid_dbscan_clusters equals a brute-force all-pairs DBSCAN
    replay (union-find components, min-label clusters, min-core-label
    borders) — pinning that the x9 cell blocking loses no neighbor
    pair and the deterministic role/label assignment is exact."""
    import hashlib
    import itertools

    out = {
        r["id"]: (r["x"], r["y"], r["role"], r["cluster_id"])
        for r in all_queries()["grid_dbscan_clusters"](spark, SF_SMOKE).collect()
    }
    n = len(out)
    s = 40 if n <= 200 else 125 if n <= 2000 else 400

    pts = {}
    for cid in out:
        hx = hashlib.md5(str(cid).encode()).hexdigest()
        pts[cid] = (int(hx[0:4], 16) % s, int(hx[4:8], 16) % s)
    # the query's coordinates must BE these hash coordinates
    for cid, (x, y, _, _) in out.items():
        assert pts[cid] == (x, y), cid

    nb = {i: [] for i in pts}
    for i, j in itertools.combinations(pts, 2):
        (xi, yi), (xj, yj) = pts[i], pts[j]
        if (xi - xj) ** 2 + (yi - yj) ** 2 <= 13:
            nb[i].append(j)
            nb[j].append(i)
    core = {i for i in pts if 1 + len(nb[i]) >= 5}
    parent = {c: c for c in core}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for c in core:
        for o in nb[c]:
            if o in core:
                ra, rb = find(c), find(o)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    lbl = {}
    for c in core:
        root = find(c)
        lbl[root] = min(lbl.get(root, root), c)
    want = {}
    for i in pts:
        if i in core:
            want[i] = ("core", min(c for c in core if find(c) == find(i)))
        else:
            cn = [find(o) for o in nb[i] if o in core]
            if cn:
                want[i] = (
                    "border",
                    min(
                        min(c for c in core if find(c) == r) for r in cn
                    ),
                )
            else:
                want[i] = ("noise", None)
    roles = {"core": 0, "border": 0, "noise": 0}
    for i, (_, _, role, cl) in out.items():
        assert (role, cl) == want[i], (i, (role, cl), want[i])
        roles[role] += 1
    # nonvacuity: all three roles and more than one cluster
    assert min(roles.values()) > 0
    assert len({cl for _, (_, _, ro, cl) in out.items() if ro == "core"}) > 1


def test_grid_dbscan_blocking_envelope():
    """The x9 neighbor-cell blocking is lossless only while
    cell >= eps — a pair at distance <= eps can then span at most one
    cell boundary per axis, so every eps-neighbor of a point lives in
    its 3x3 cell neighborhood. Guard the constants against refactors
    that would silently drop neighbor pairs."""
    from tb_scale_spatial_data_pipeline_spark.plans.spatial_queries import (
        _DBSCAN_CELL,
        _DBSCAN_EPS2,
        _DBSCAN_MINPTS,
    )

    assert _DBSCAN_CELL * _DBSCAN_CELL >= _DBSCAN_EPS2
    assert _DBSCAN_MINPTS >= 2


def test_grid_dbscan_partition_invariance(spark):
    """The deterministic labelling claim: role and cluster_id per
    point are identical under a different shuffle layout (the classic
    DBSCAN border assignment is scan-order-dependent; the min-label
    variant must not be)."""
    base = {
        (r["id"]): (r["role"], r["cluster_id"])
        for r in all_queries()["grid_dbscan_clusters"](spark, SF_SMOKE).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        alt = {
            (r["id"]): (r["role"], r["cluster_id"])
            for r in all_queries()["grid_dbscan_clusters"](
                spark, SF_SMOKE
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert alt == base
