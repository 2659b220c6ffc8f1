"""Distributed graph primitives on edge DataFrames.

Triangle counting via the oriented three-way self-join. The edge set
is undirected, held canonically as (u, v) with u < v; counting
orients each edge and joins path wedges (a→b, b→c) against the
closing edge (a→c), so every triangle is produced exactly once at
its lowest-rank vertex.

Orientation is the scale lever: with ID order, a hub vertex whose id
sits mid-range has both in- and out-edges, generating
indeg·outdeg = O(d²) wedge candidates at the join. Orienting by
(degree, id) — every edge points from its lower-degree endpoint to
its higher-degree endpoint — makes hubs sinks: their out-degree under
this orientation is bounded by O(√m) (a vertex with out-degree k has
k neighbors of degree ≥ its own, each contributing ≥ that many edge
endpoints), so total wedge candidates fall from Σd² to O(m^1.5), the
standard bound (Suri & Vassilvitskii, "Counting Triangles and the
Curse of the Last Reducer", WWW'11 — public literature). The triangle
COUNT is orientation-invariant; only the intermediate size changes.

Reference parity: the reference has no graph engine; this backs the
registry's `triangle_count` query (co-supplier graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vertex_degrees(edges: DataFrame) -> DataFrame:
    """Degree of every vertex of an undirected (u, v) edge set.
    One map-side-combinable aggregation over 2·m endpoint rows."""
    return (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def orient_edges(edges: DataFrame, by_degree: bool = True) -> DataFrame:
    """Orient undirected (u, v) edges into directed (s, d) edges.

    by_degree=True (the scale default) points each edge at its
    higher-(degree, id) endpoint; False keeps id order (s=u, d=v,
    requires u < v canonical form). Output schema: (s, d).
    """
    if not by_degree:
        return edges.select(F.col("u").alias("s"), F.col("v").alias("d"))
    deg = vertex_degrees(edges)
    ed = edges.join(
        deg.select(F.col("x").alias("u"), F.col("deg").alias("du")), "u"
    ).join(deg.select(F.col("x").alias("v"), F.col("deg").alias("dv")), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("d"),
    )


def wedge_count(oriented: DataFrame) -> int:
    """Number of path-wedge candidates (a→b, b→c) the triangle join
    materializes for a given orientation — Σ_b indeg(b)·outdeg(b).
    Diagnostic for tests/planning; computed from two degree aggs,
    never by materializing the wedges."""
    outd = oriented.groupBy(F.col("s").alias("x")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    ind = oriented.groupBy(F.col("d").alias("x")).agg(
        F.count(F.lit(1)).alias("indeg")
    )
    row = (
        ind.join(outd, "x")
        .agg(F.sum(F.col("indeg") * F.col("outdeg")).alias("w"))
        .collect()[0]
    )
    return int(row["w"] or 0)


def oriented_triangle_count(edges: DataFrame, by_degree: bool = True) -> DataFrame:
    """Count triangles of an undirected (u, v) edge set (u < v).
    Returns a 1-row DataFrame (n_edges, n_triangles)."""
    # the oriented edge set feeds all three join branches —
    # materialize once instead of re-running the orientation joins
    o = orient_edges(edges, by_degree=by_degree).localCheckpoint(eager=True)
    e1 = o.select(F.col("s").alias("a1"), F.col("d").alias("b1"))
    e2 = o.select(F.col("s").alias("b2"), F.col("d").alias("c2"))
    e3 = o.select(F.col("s").alias("a3"), F.col("d").alias("c3"))
    tri = (
        e1.join(e2, F.col("b1") == F.col("b2"))
        .join(e3, (F.col("a1") == F.col("a3")) & (F.col("c2") == F.col("c3")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return edges.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(tri)


def oriented_triangles(edges: DataFrame, by_degree: bool = True) -> DataFrame:
    """Materialize each triangle of an undirected (u, v) edge set
    exactly once as its vertex triple (a, b, c). Same oriented wedge
    join as oriented_triangle_count — the orientation bounds the
    intermediate, and the output triple is the triangle's vertex SET
    (order carries no meaning)."""
    o = orient_edges(edges, by_degree=by_degree).localCheckpoint(eager=True)
    e1 = o.select(F.col("s").alias("a1"), F.col("d").alias("b1"))
    e2 = o.select(F.col("s").alias("b2"), F.col("d").alias("c2"))
    e3 = o.select(F.col("s").alias("a3"), F.col("d").alias("c3"))
    return (
        e1.join(e2, F.col("b1") == F.col("b2"))
        .join(e3, (F.col("a1") == F.col("a3")) & (F.col("c2") == F.col("c3")))
        .select(
            F.col("a1").alias("a"), F.col("b1").alias("b"), F.col("c2").alias("c")
        )
    )


def functional_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_pow: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Descendant closure of a FUNCTIONAL graph — out-degree ≤ 1,
    acyclic (a forest of paths/trees pointing at roots, e.g. a D8
    hydrology flow grid, a parent-pointer hierarchy, a next-version
    chain). Output: every ``(src, dst)`` pair with ``dst`` strictly
    downstream of ``src``.

    Pointer doubling, NOT wavefront: ``close`` holds all pairs at
    distance in [1, 2^k] and ``far`` the node at distance exactly 2^k;
    each round composes both with themselves, so a maximum path length
    of L needs ceil(log2 L) rounds — a 53-step flow path closes in 6
    rounds where per-hop propagation (the recursive-CTE shape) takes
    53. Each round is two equi-joins + a union, lineage truncated by
    localCheckpoint; convergence = ``far`` empty (every 2^k-jump ran
    off the end of its path), checked with one driver-side count.

    Unique-decomposition invariant: out-degree ≤ 1 means every
    (ancestor, descendant) pair has exactly ONE distance, and the
    round-k extension emits exactly the pairs at distance in
    (2^k, 2^(k+1)] — so ``close`` never holds duplicates and needs no
    distinct().

    Scale envelope: the closure itself is the output — O(sum of path
    lengths) rows. Right whenever downstream consumers need per-pair
    rows (accumulation counts, ancestry joins) and path lengths are
    bounded (drainage basins, org charts, version chains). For
    million-step chains where only aggregates are needed, the
    contraction family (Euler-tour / tree contraction) replaces the
    closure; documented rather than implemented — no registry caller
    has that shape. Exhausting ``max_pow`` (default depth 2^20) raises:
    a functional graph that deep almost certainly has a cycle, and a
    silent partial closure would corrupt downstream counts.
    """
    close = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    far = close
    rounds = 0
    converged = False
    for _ in range(max_pow):
        if far.isEmpty():
            converged = True
            break
        rounds += 1
        f_u = far.select(F.col("src").alias("_u"), F.col("dst").alias("_m"))
        ext = (
            f_u.join(close, F.col("_m") == F.col("src"))
            .select(F.col("_u").alias("src"), F.col("dst"))
        )
        close = close.unionByName(ext).localCheckpoint(eager=True)
        far = (
            f_u.join(far, F.col("_m") == F.col("src"))
            .select(F.col("_u").alias("src"), F.col("dst"))
            .localCheckpoint(eager=True)
        )
    else:
        # far non-empty after max_pow rounds is NOT by itself failure:
        # when the longest path is exactly 2^max_pow, far still holds
        # those (already-in-close) endpoint pairs. The closure is
        # complete iff extending far one hop through close yields
        # nothing — every far endpoint is a root with no outgoing edge.
        if far.isEmpty():
            converged = True
        else:
            f_u = far.select(F.col("src").alias("_u"), F.col("dst").alias("_m"))
            converged = f_u.join(
                close, F.col("_m") == F.col("src")
            ).isEmpty()
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"functional_closure did not converge within max_pow={max_pow} "
            "doubling rounds (path length > 2^max_pow); the graph likely "
            "has a cycle — a functional closure is only defined on acyclic "
            "out-degree-<=1 graphs"
        )
    return close
