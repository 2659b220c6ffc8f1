"""Product Quantization (IVF-PQ fine tier — the self-identified gap
from PLANS.md): compress dim-D vectors to M sub-space codeword ids and
search by asymmetric distance (ADC), the standard billion-scale ANN
compression (Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

Scale design, mirroring the engine's k-means pattern
(`ml/clustering.py`):
- codebooks are tiny (M × K × dim/M doubles) → embedded as LITERAL
  expressions; code assignment is a pure projection (zero Exchange,
  plan-asserted in tests/test_pq.py);
- ADC search never touches raw corpus vectors: the query builds an
  M × K lookup table of partial distances, embedded as literals, and
  the distance is a sum of M element_at() lookups over the stored
  codes — constant work per corpus row, independent of dim;
- codebook TRAINING is per-sub-space Lloyd k-means over vector slices
  (`train_pq_codebooks`), reusing the shuffle-free assign stage. The
  oracle-checked queries use the deterministic first-K-rows codebook
  (same convention as `ivf_assign`'s first-8 centroids) so DuckDB can
  regenerate it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Codebooks = list[list[tuple[int, list[float]]]]  # [m][j] -> (cid, subvec)


def _subvec(vec: list[float], m: int, sub_dim: int) -> list[float]:
    return [float(v) for v in vec[m * sub_dim : (m + 1) * sub_dim]]


def pq_codebooks_from_first_k(
    df: DataFrame, id_col: str, vec_col: str, dim: int, m: int, k: int
) -> Codebooks:
    """Deterministic codebooks: sub-vectors of the first k rows by id
    (the SQL-regenerable convention; see `train_pq_codebooks` for the
    trained variant)."""
    sub = dim // m
    rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    vecs = [[float(v) for v in r[vec_col]] for r in rows]
    return [[(j, _subvec(vecs[j], mi, sub)) for j in range(len(vecs))] for mi in range(m)]


def train_pq_codebooks(
    df: DataFrame, id_col: str, vec_col: str, dim: int, m: int, k: int, iters: int = 2
) -> Codebooks:
    """Trained codebooks: per-sub-space Lloyd k-means over vector
    slices — one distributed loop per sub-space, each using the
    shuffle-free literal-centroid assign."""
    from .clustering import lloyd_kmeans

    sub = dim // m
    books: Codebooks = []
    for mi in range(m):
        sliced = df.select(
            F.col(id_col).alias("_id"),
            F.slice(F.col(vec_col), mi * sub + 1, sub).alias("_sv"),
        )
        _, cents = lloyd_kmeans(sliced, "_id", "_sv", k=k, iters=iters)
        books.append(
            [(int(r["cid"]), [float(v) for v in r["cvec"]]) for r in cents.collect()]
        )
    return books


def _sub_dist2(vec_col: Column, start0: int, sub: list[float]) -> Column:
    """Squared L2 between vec[start0:start0+len(sub)] and the literal
    sub-vector — sequential fold, same order as the SQL twin."""
    acc = F.lit(0.0)
    for i, s in enumerate(sub):
        d = vec_col.getItem(start0 + i).cast("double") - F.lit(float(s))
        acc = acc + d * d
    return acc


def pq_assign_codes(df: DataFrame, vec_col: str, codebooks: Codebooks) -> DataFrame:
    """Code assignment: per sub-space, the id of the nearest codeword —
    a pure projection over literal codebooks (no join, no shuffle).
    Output adds code0..code{M-1} int columns."""
    sub_dim = len(codebooks[0][0][1])
    out = df
    for mi, book in enumerate(codebooks):
        best = F.array_min(
            F.array(
                *[
                    F.struct(
                        F.round(_sub_dist2(F.col(vec_col), mi * sub_dim, sv), 9).alias("d"),
                        F.lit(int(cid)).alias("cid"),
                    )
                    for cid, sv in book
                ]
            )
        )
        out = out.withColumn(f"code{mi}", best["cid"])
    return out


def pq_adc_search(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: Codebooks,
    query_vec: list[float],
    top: int = 10,
) -> DataFrame:
    """Asymmetric-distance search: ADC(q, x) = sqrt(Σ_m ‖q_m −
    cb_m[code_m(x)]‖²). The per-(m, codeword) partial distances are
    precomputed driver-side (M×K doubles) and embedded as literal
    arrays; per corpus row the distance is M element_at lookups on its
    codes — the compressed corpus is scanned, raw vectors never are."""
    sub_dim = len(codebooks[0][0][1])
    coded = pq_assign_codes(df, vec_col, codebooks)
    adc2 = F.lit(0.0)
    for mi, book in enumerate(codebooks):
        qm = [float(v) for v in query_vec[mi * sub_dim : (mi + 1) * sub_dim]]
        lut = {cid: sum((a - b) ** 2 for a, b in zip(qm, sv)) for cid, sv in book}
        # dense LUT literal indexed by codeword id (+1: element_at is 1-based)
        arr = F.array(*[F.lit(float(lut[cid])) for cid in sorted(lut)])
        adc2 = adc2 + F.element_at(arr, F.col(f"code{mi}") + 1)
    return (
        coded.select(id_col, F.round(F.sqrt(adc2), 6).alias("adc"))
        .orderBy(F.asc("adc"), F.asc(id_col))
        .limit(top)
    )
