"""Focused pin for the key-batched stream_ttl_dedup rewrite: the
bucketed state group buffers and globally sorts its chunks, so the
admit set must be invariant to Arrow batch size (multi-chunk groups
exercise the pd.concat + segment-carry path that the per-key form
never hit)."""

from __future__ import annotations

from conftest import SF_SMOKE


def _admit_counts(spark):
    from tb_scale_spatial_data_pipeline_spark.plans import all_queries

    rows = all_queries()["stream_ttl_dedup"](spark, SF_SMOKE).collect()
    return {
        (r["user_id"], r["event_type"]): (r["n_admitted"], r["id_checksum"])
        for r in rows
    }


def test_admit_set_invariant_to_arrow_chunking(spark):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    base = _admit_counts(spark)
    assert base
    try:
        # force every bucket group to arrive as many small chunks
        spark.conf.set(key, "53")
        assert _admit_counts(spark) == base
    finally:
        spark.conf.set(key, prev)
