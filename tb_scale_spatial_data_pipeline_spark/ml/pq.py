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


IntCodebooks = list[list[tuple[int, list[int]]]]  # [m][j] -> (cid, subvec)


def _sub_dist2_sql_int(vec_col: str, start0: int, sub: list[int]) -> str:
    """EXACT squared L2 between vec[start0:start0+len(sub)] (0-based
    Spark indexing, array<bigint> on the micro-lattice) and the literal
    integer sub-vector — a BIGINT sum, no FP anywhere, so the DuckDB
    twin's SUM over exploded dims is bit-identical regardless of
    evaluation order."""
    terms = " + ".join(
        f"({vec_col}[{start0 + i}] - {int(s)}L)"
        f" * ({vec_col}[{start0 + i}] - {int(s)}L)"
        for i, s in enumerate(sub)
    )
    return f"(0L + {terms})"


def pq_assign_codes_int(
    df: DataFrame, qvec_col: str, codebooks: IntCodebooks
) -> DataFrame:
    """Lattice twin of `pq_assign_codes`: per sub-space nearest
    codeword over array<bigint> vectors and integer codebooks — the
    same zero-shuffle literal projection, with EXACT integer distances
    and (dist², cid) ties (no round() seam at all)."""
    sub_dim = len(codebooks[0][0][1])
    code_cols = []
    for mi, book in enumerate(codebooks):
        structs = ", ".join(
            f"named_struct('d', {_sub_dist2_sql_int(qvec_col, mi * sub_dim, sv)}, "
            f"'cid', {int(cid)})"
            for cid, sv in book
        )
        code_cols.append(
            F.expr(f"array_min(array({structs}))['cid']").alias(f"code{mi}")
        )
    return df.select("*", *code_cols)


def train_pq_codebooks(
    df: DataFrame, id_col: str, qvec_col: str, dim: int, m: int, k: int, iters: int = 2
) -> IntCodebooks:
    """Trained codebooks: Lloyd k-means over ALL sub-spaces jointly on
    the EXACT micro-lattice (array<bigint> input — see
    ml/clustering.quantize_micros). Vectors explode to (sub-space,
    sub-vector) rows once per iteration, every iteration assigns
    against the full (m × k)-centroid literal and recomputes all means
    in ONE exact-integer aggregation; each new codeword coordinate is
    the lattice point nearest the member mean (round-half-away, exact
    integer formula — ml/clustering.round_mean_micros). Two driver
    round-trips per iteration total, independent of M. Empty codewords
    are dropped (both the Spark loop and the unrolled SQL twin derive
    survivors from the same groupBy). Exact integers end to end ⇒ the
    bounded-iteration loop is hash-checkable against an unrolled-CTE
    DuckDB oracle (plans/pq_queries.pq_train_assign)."""
    from .clustering import round_mean_micros

    sub = dim // m
    data = df.select(F.col(id_col).alias("_id"), F.col(qvec_col).alias("_v"))

    init = df.orderBy(id_col).limit(k).select(qvec_col).collect()
    vecs = [[int(v) for v in r[qvec_col]] for r in init]
    books: IntCodebooks = [
        [(j, vecs[j][mi * sub : (mi + 1) * sub]) for j in range(k)]
        for mi in range(m)
    ]

    for _ in range(iters):
        # one static projection assigns ALL sub-space codes (unrolled
        # arithmetic → whole-stage codegen, no higher-order functions),
        # then one explode + aggregation recomputes every (sum, count):
        # two jobs per iteration, independent of M
        coded = pq_assign_codes_int(data, "_v", books)
        pieces = F.array(
            *[
                F.struct(
                    F.lit(mi).alias("m"),
                    F.col(f"code{mi}").alias("cluster"),
                    F.slice(F.col("_v"), mi * sub + 1, sub).alias("sv"),
                )
                for mi in range(m)
            ]
        )
        new_rows = (
            coded.select(F.explode(pieces).alias("s"))
            .select(
                F.col("s.m").alias("m"),
                F.col("s.cluster").alias("cluster"),
                F.posexplode("s.sv").alias("pos", "v"),
            )
            .groupBy("m", "cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: m*k*sub codebook cells
        )
        cents: dict[tuple[int, int], dict[int, int]] = {}
        for r in new_rows:
            cents.setdefault((r["m"], r["cluster"]), {})[int(r["pos"])] = (
                round_mean_micros(r["s"], r["n"])
            )
        books = [
            [
                (j, [cents[(mi, j)][p] for p in sorted(cents[(mi, j)])])
                for j in range(k)
                if (mi, j) in cents
            ]
            for mi in range(m)
        ]
    return books


def _dlit(v: float) -> str:
    """Exact double literal for Spark SQL text (string-cast round-trips
    the full precision regardless of exponent formatting)."""
    return f"CAST('{float(v)!r}' AS DOUBLE)"


def _sub_dist2_sql(vec_col: str, start0: int, sub: list[float]) -> str:
    """Squared L2 between vec[start0:start0+len(sub)] (0-based Spark
    array indexing) and the literal sub-vector — left-associated sum,
    op-for-op the DuckDB oracle's fold."""
    terms = " + ".join(
        f"(CAST({vec_col}[{start0 + i}] AS DOUBLE) - {_dlit(s)})"
        f" * (CAST({vec_col}[{start0 + i}] AS DOUBLE) - {_dlit(s)})"
        for i, s in enumerate(sub)
    )
    return f"(0.0d + {terms})"


def pq_assign_codes(df: DataFrame, vec_col: str, codebooks: Codebooks) -> DataFrame:
    """Code assignment: per sub-space, the id of the nearest codeword —
    a pure projection over literal codebooks (no join, no shuffle).
    Output adds code0..code{M-1} int columns. Each argmin is ONE
    F.expr() built from generated SQL text: composing it from Column
    operators costs ~2000 py4j round-trips of driver time (measured
    3.8 s — 15× the actual execution), string building costs none."""
    sub_dim = len(codebooks[0][0][1])
    code_cols = []
    for mi, book in enumerate(codebooks):
        structs = ", ".join(
            f"named_struct('d', round({_sub_dist2_sql(vec_col, mi * sub_dim, sv)}, 9), "
            f"'cid', {int(cid)})"
            for cid, sv in book
        )
        code_cols.append(
            F.expr(f"array_min(array({structs}))['cid']").alias(f"code{mi}")
        )
    return df.select("*", *code_cols)


def pq_adc_search(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: Codebooks,
    query_vec: list[float],
    top: int = 10,
    exclude_id: int | None = None,
    adc_round: int = 6,
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
        lut = {int(cid): sum((a - b) ** 2 for a, b in zip(qm, sv)) for cid, sv in book}
        # LUT literal positioned by codeword id (+1: element_at is
        # 1-based). Trained codebooks can have NON-contiguous cids
        # (train_pq_codebooks drops empty clusters), so the array spans
        # 0..max_cid with +inf placeholders at dropped ids — those ids
        # are never emitted by pq_assign_codes, so a placeholder read
        # would only surface as an impossible-distance sentinel, never
        # a silent wrong-slot lookup.
        arr = F.array(
            *[F.lit(float(lut.get(i, float("inf")))) for i in range(max(lut) + 1)]
        )
        adc2 = adc2 + F.element_at(arr, F.col(f"code{mi}") + 1)
    out = coded.select(id_col, F.round(F.sqrt(adc2), adc_round).alias("adc"))
    if exclude_id is not None:
        out = out.where(F.col(id_col) != exclude_id)
    return out.orderBy(F.asc("adc"), F.asc(id_col)).limit(top)
