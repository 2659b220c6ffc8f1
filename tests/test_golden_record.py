"""Golden-record survivorship invariants: the merge must partition the
part table (every part lands in exactly one entity) and actually merge
name variants (some entity spans multiple names)."""

from __future__ import annotations

import pandas as pd

from conftest import SF_SMOKE


def test_golden_record_partitions_parts(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.maintenance_queries import (
        QUERIES,
    )

    rows = QUERIES["golden_record_survivorship"](spark, SF_SMOKE).collect()
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    assert sum(r.n_parts for r in rows) == len(part)
    assert sum(r.n_names for r in rows) == part.p_name.nunique()
    # ER actually merged variants somewhere
    assert any(r.n_names > 1 for r in rows)
    # survivorship picked real attribute values
    brands = set(part.p_brand)
    assert all(r.canonical_brand in brands for r in rows)
    # latest_type is the p_type of the max-p_partkey member of the entity
    by_name = part.set_index("p_partkey")
    top = part.loc[part.groupby("p_name").p_partkey.idxmax()]
    # singleton entities (entity_id == name not merged): spot-check one
    singles = [r for r in rows if r.n_names == 1]
    assert singles
    r = singles[0]
    member_names = {r.entity_id} if r.entity_id in set(part.p_name) else set()
    if member_names:
        exp = top[top.p_name == r.entity_id].iloc[0]
        assert r.latest_type == exp.p_type
