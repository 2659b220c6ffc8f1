"""Product-Quantization invariants (ml/pq.py): code validity,
partitioning-independence, shuffle-free assign plan, and the training
payoff (trained codebooks quantize no worse than the untrained init).
"""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pyspark.sql.functions as F

from tb_scale_spatial_data_pipeline_spark.ml.pq import (
    pq_adc_search,
    pq_assign_codes,
    pq_codebooks_from_first_k,
    train_pq_codebooks,
)

SF = "/root/testdata/sf0.001"
DIM, M, K = 64, 8, 4


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_codes_in_range_and_deterministic(spark):
    emb = _emb(spark)
    books = pq_codebooks_from_first_k(emb, "vec_id", "embedding", DIM, M, K)
    a = pq_assign_codes(emb, "embedding", books).drop("embedding")
    b = pq_assign_codes(emb.repartition(7), "embedding", books).drop("embedding")
    ra = {r["vec_id"]: tuple(r[f"code{m}"] for m in range(M)) for r in a.collect()}
    rb = {r["vec_id"]: tuple(r[f"code{m}"] for m in range(M)) for r in b.collect()}
    assert ra == rb
    assert all(0 <= c < K for codes in ra.values() for c in codes)
    # the codebook rows themselves quantize to themselves: vec j's
    # sub-vectors ARE codeword j, so its code vector is (j,)*M
    for j in range(K):
        assert ra[j] == (j,) * M


def test_assign_plan_has_no_exchange(spark):
    emb = _emb(spark)
    books = pq_codebooks_from_first_k(emb, "vec_id", "embedding", DIM, M, K)
    out = pq_assign_codes(emb, "embedding", books)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan and "Join" not in plan, plan


def _quantization_error(emb_rows, books):
    sub = DIM // M
    err = 0.0
    for vec_id, vec in emb_rows:
        for m, book in enumerate(books):
            sv = np.array(vec[m * sub : (m + 1) * sub], dtype=np.float64)
            best = min(
                float(((np.array(c, dtype=np.float64) - sv) ** 2).sum())
                for _, c in book
            )
            err += best
    return err


def test_training_reduces_quantization_error(spark):
    from tb_scale_spatial_data_pipeline_spark.ml.clustering import (
        quantize_micros,
    )

    emb = _emb(spark).select(
        "vec_id", quantize_micros(F.col("embedding")).alias("qv")
    )
    rows = [(r["vec_id"], [int(v) for v in r["qv"]]) for r in emb.collect()]
    sub = DIM // M
    by_id = dict(rows)
    init = [
        [(j, by_id[j][mi * sub : (mi + 1) * sub]) for j in range(K)]
        for mi in range(M)
    ]
    trained = train_pq_codebooks(emb, "vec_id", "qv", DIM, M, K, iters=2)
    # lattice training: error measured in exact micros^2; the rounded-
    # mean update keeps the descent guarantee (nearest-lattice-point
    # argument, ml/clustering.py docstring), so no epsilon
    assert _quantization_error(rows, trained) <= _quantization_error(rows, init)


def test_adc_search_is_compressed_domain_brute_force(spark):
    """ADC distances must equal the exact query->reconstruction
    distances computed in NumPy from the same codes."""
    emb = _emb(spark)
    books = pq_codebooks_from_first_k(emb, "vec_id", "embedding", DIM, M, K)
    qv = [
        float(v)
        for v in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    got = pq_adc_search(emb, "vec_id", "embedding", books, qv, top=5).collect()
    codes = {
        r["vec_id"]: [r[f"code{m}"] for m in range(M)]
        for r in pq_assign_codes(emb, "embedding", books).collect()
    }
    sub = DIM // M
    cb = {(m, cid): np.array(sv) for m, book in enumerate(books) for cid, sv in book}
    q = np.array(qv)
    for r in got:
        expect = 0.0
        for m in range(M):
            qm = q[m * sub : (m + 1) * sub]
            expect += float(((qm - cb[(m, codes[r["vec_id"]][m])]) ** 2).sum())
        assert abs(r["adc"] - round(np.sqrt(expect), 6)) < 1e-6


def test_adc_search_with_noncontiguous_trained_cids(spark):
    """Regression: train_pq_codebooks drops empty clusters, so trained
    codebooks can carry NON-contiguous cids (here [0, 2] after cid 1's
    duplicate-of-0 init centroid empties out). pq_adc_search's LUT used
    to be packed by sort order — code 2 then read past the array end
    (NULL/ANSI error). The LUT is now positioned by cid; distances must
    match the NumPy ground truth computed from the same books."""
    dim, m, k = 4, 2, 3
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # duplicate init centroid -> cid 1 empties
        (2, [10.0, 10.0, 10.0, 10.0]),
        (3, [0.5, 0.5, 0.5, 0.5]),
        (4, [9.5, 9.5, 9.5, 9.5]),
    ]
    from tb_scale_spatial_data_pipeline_spark.ml.clustering import (
        quantize_micros,
    )
    from tb_scale_spatial_data_pipeline_spark.ml.pq import pq_assign_codes_int

    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).select("vec_id", quantize_micros(F.col("embedding")).alias("qv"))
    books = train_pq_codebooks(df, "vec_id", "qv", dim, m, k, iters=1)
    cids = {cid for book in books for cid, _ in book}
    assert cids == {0, 2}, f"fixture must yield non-contiguous cids, got {cids}"

    qv = [10.0 * 1_000_000] * 4  # query on the same micros lattice
    got = pq_adc_search(df, "vec_id", "qv", books, qv, top=5).collect()
    assert len(got) == 5 and all(r["adc"] is not None for r in got)

    sub = dim // m
    codes = {
        r["vec_id"]: [r[f"code{mi}"] for mi in range(m)]
        for r in pq_assign_codes_int(df, "qv", books).collect()
    }
    cb = {(mi, cid): np.array(sv) for mi, book in enumerate(books) for cid, sv in book}
    q = np.array(qv)
    for r in got:
        expect = sum(
            float(((q[mi * sub : (mi + 1) * sub] - cb[(mi, codes[r["vec_id"]][mi])]) ** 2).sum())
            for mi in range(m)
        )
        assert abs(r["adc"] - round(np.sqrt(expect), 6)) < 1e-6


def test_adc_search_plans_top_k_heap(spark):
    """ADC top-k must plan as TakeOrderedAndProject (per-partition
    heap + driver merge), never a global sort."""
    emb = _emb(spark)
    books = pq_codebooks_from_first_k(emb, "vec_id", "embedding", DIM, M, K)
    qv = [float(v) for v in emb.take(1)[0]["embedding"]]
    out = pq_adc_search(emb, "vec_id", "embedding", books, qv, top=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[0], plan
