"""Registry integrity: the driver consumes flat dicts built by
dict.update over plans._MODULES — a duplicate query name across
modules would silently shadow an earlier operator, and an oracle
without a query would KeyError in the driver's compare loop.

Also the width gate: the driver's exact value hash distinguishes
integer widths (Spark SUM(INT) = BIGINT, DuckDB SUM(INT) = HUGEINT),
a bug class that recurred three rounds because the local harness
coerced widths away. `test_spark_and_oracle_result_types_agree`
type-checks EVERY oracle pair via planning only (Spark .schema +
DuckDB DESCRIBE), so an unwrapped int aggregate fails the suite
before it can fail the driver.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from tb_scale_spatial_data_pipeline_spark.plans import (
    _MODULES,
    all_oracles,
    all_queries,
)

SF = "/root/testdata/sf0.001"


def _duck_sig(t: str) -> str:
    """DuckDB type string -> width-sensitive signature."""
    t = t.upper()
    if t.startswith(("HUGEINT", "UHUGEINT")):
        return "HUGEINT"  # never acceptable: no Spark twin
    if t.startswith(("STRUCT", "MAP")):
        return "struct"
    if t.endswith("[]") or t.startswith("LIST"):
        return "list"
    for prefix, sig in (
        ("BIGINT", "i64"), ("UBIGINT", "i64"),
        ("INTEGER", "i32"), ("UINTEGER", "i32"), ("INT", "i32"),
        ("SMALLINT", "i16"), ("TINYINT", "i8"),
        ("DOUBLE", "f64"), ("FLOAT", "f32"), ("REAL", "f32"),
        ("DECIMAL", "dec"), ("VARCHAR", "str"), ("BOOLEAN", "bool"),
        ("DATE", "date"), ("TIMESTAMP", "ts"), ("TIME", "ts"),
        ("BLOB", "bin"),
    ):
        if t.startswith(prefix):
            return sig
    return t


def _spark_sig(dt) -> str:
    s = dt.simpleString()
    if s.startswith(("array", "struct", "map")):
        return "list" if s.startswith("array") else "struct"
    return {
        "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
        "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
        "date": "date", "timestamp": "ts", "timestamp_ntz": "ts",
        "binary": "bin",
    }.get(s, "dec" if s.startswith("decimal") else s)


def test_spark_and_oracle_result_types_agree(spark):
    """Plan (never execute) every oracle-paired query on both engines
    and require column-for-column width-identical result types. This is
    the structural fix for the recurring SUM-width bug: the driver's
    exact hash fails on i64-vs-HUGEINT even when values agree."""
    qs, os_ = all_queries(), all_oracles()
    con = duckdb.connect()
    from tb_scale_spatial_data_pipeline_spark.sources.catalog import TABLES

    for tname in TABLES:
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{SF}/{tname}.parquet'")

    # DuckDB DESCRIBE is sub-ms per query on one connection; Spark
    # analysis is ~0.5 s per query serially (634 queries = ~5 min of
    # driver-side planning), so the Spark side fans out over a thread
    # pool — same checks, same coverage, ~6x less wall for the CI
    # window. Queries never mutate session conf (grep-pinned), so
    # concurrent planning on the shared session is safe.
    from concurrent.futures import ThreadPoolExecutor

    names = sorted(os_)

    def _plan_spark(name):
        try:
            return {
                f.name.lower(): _spark_sig(f.dataType)
                for f in qs[name](spark, SF).schema.fields
            }
        except Exception as e:
            return f"planning error {type(e).__name__}: {e}"

    with ThreadPoolExecutor(max_workers=8) as pool:
        spark_sides = dict(zip(names, pool.map(_plan_spark, names)))

    bad: list[str] = []
    for name in names:
        sql = os_[name]
        spark_types = spark_sides[name]
        try:
            duck_types = {
                r[0].lower(): _duck_sig(r[1])
                for r in con.execute(f"DESCRIBE {sql}").fetchall()
            }
        except Exception as e:
            bad.append(f"{name}: oracle planning error {type(e).__name__}: {e}")
            continue
        if isinstance(spark_types, str):  # planning failure is its own failure
            bad.append(f"{name}: {spark_types}")
            continue
        if set(duck_types) != set(spark_types):
            bad.append(
                f"{name}: column sets differ spark={sorted(spark_types)} "
                f"duck={sorted(duck_types)}"
            )
            continue
        for c in sorted(duck_types):
            if duck_types[c] == "HUGEINT":
                bad.append(
                    f"{name}.{c}: oracle yields HUGEINT (unwrapped int "
                    "aggregate?) — CAST(... AS BIGINT) in the oracle SQL"
                )
            elif duck_types[c] != spark_types[c]:
                bad.append(
                    f"{name}.{c}: spark={spark_types[c]} duck={duck_types[c]} "
                    "— cast BOTH engines to the same width"
                )
    assert not bad, "\n".join(bad)


def test_no_duplicate_query_names_across_modules():
    seen = {}
    for mod in _MODULES:
        for name in mod.QUERIES:
            assert name not in seen, (
                f"{name} defined in both {seen[name]} and {mod.__name__}"
            )
            seen[name] = mod.__name__


def test_every_oracle_has_a_query():
    qs, os_ = all_queries(), all_oracles()
    assert not set(os_) - set(qs)


def test_every_query_is_callable_with_two_args():
    import inspect

    for name, fn in all_queries().items():
        params = [
            p
            for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind
            in (
                inspect.Parameter.POSITIONAL_ONLY,
                inspect.Parameter.POSITIONAL_OR_KEYWORD,
            )
        ]
        assert len(params) == 2, (name, params)


def test_no_duplicate_registrations_within_modules():
    """A duplicate @_q name WITHIN one module silently overwrites the
    earlier query in that module's dict before the cross-module guard
    in all_queries() can see it — detect via AST over each module's
    source (the r12 idw_interpolation near-collision motivates this)."""
    import ast
    import collections
    import inspect

    from tb_scale_spatial_data_pipeline_spark import plans

    for mod in plans._MODULES:
        tree = ast.parse(inspect.getsource(mod))
        names = []
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == "_q"
                and node.args
                and isinstance(node.args[0], ast.Constant)
            ):
                names.append(node.args[0].value)
        dupes = [n for n, c in collections.Counter(names).items() if c > 1]
        assert dupes == [], f"{mod.__name__}: duplicate @_q names {dupes}"


def test_no_duplicate_registrations_across_modules():
    import collections

    from tb_scale_spatial_data_pipeline_spark import plans

    names = [n for mod in plans._MODULES for n in mod.QUERIES]
    dupes = [n for n, c in collections.Counter(names).items() if c > 1]
    assert dupes == []
