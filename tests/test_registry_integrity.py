"""Registry integrity: the driver consumes flat dicts built by
dict.update over plans._MODULES — a duplicate query name across
modules would silently shadow an earlier operator, and an oracle
without a query would KeyError in the driver's compare loop.
"""

from __future__ import annotations

from tb_scale_spatial_data_pipeline_spark.plans import (
    _MODULES,
    all_oracles,
    all_queries,
)


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
