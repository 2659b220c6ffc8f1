"""Query registry: every implemented operator from SURVEY §2 exposed as
a named (spark_fn, oracle_sql) pair for the driver's differential check.

Each module contributes QUERIES (name -> callable(spark, sf_dir) ->
DataFrame) and ORACLES (name -> ANSI SQL for DuckDB over the same
parquet views). Names missing from ORACLES get the driver's weaker
rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from . import (
    event_queries,
    full_pipeline,
    media_queries,
    pipelines,
    pq_queries,
    raster_queries,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    sampling_queries,
    scalar_queries,
    spatial_queries,
    text_queries,
    timeseries_queries,
    udtf_queries,
    vector_queries,
)

_MODULES = (
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    text_queries,
    vector_queries,
    pq_queries,
    raster_queries,
    event_queries,
    pipelines,
    media_queries,
    spatial_queries,
    scalar_queries,
    sampling_queries,
    timeseries_queries,
    udtf_queries,
    full_pipeline,
)


def all_queries():
    """Merged registry, ordered ROUND-ROBIN across modules: position k
    holds the (k // n_modules)-th query of module (k % n_modules). A
    correctness sweep that is budget-bounded to a prefix therefore
    samples every tier (relational, text, vector, raster, streaming,
    pipelines, PQ, ...) instead of exhausting its budget inside the
    first module. Deterministic: module tuple order × each module's
    registration order."""
    per_mod = [list(mod.QUERIES.items()) for mod in _MODULES]
    q = {}
    for i in range(max(len(m) for m in per_mod)):
        for m in per_mod:
            if i < len(m):
                name, fn = m[i]
                q[name] = fn
    return q


def all_oracles():
    o = {}
    for mod in _MODULES:
        o.update(mod.ORACLES)
    return o
