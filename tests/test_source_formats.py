"""Source-format coverage beyond parquet: ORC (columnar, built into
Spark), CSV with explicit schema, and JSON Lines — each round-trips a
typed slice of the lineitem fixture bit-exactly. The point is the
CONTRACT: schema-carrying formats preserve types end-to-end; schema-
on-read formats (CSV/JSONL) reproduce values exactly when the read
schema is supplied rather than inferred (inference is the documented
anti-pattern at scale — a full extra pass over 100 TB)."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMOKE


def _slice(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_returnflag",
            "l_shipdate",
        )
        .limit(500)
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("l_orderkey", "l_linenumber").collect()]


def test_orc_roundtrip_bit_exact(spark, tmp_path):
    src = _slice(spark)
    path = str(tmp_path / "li.orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema  # ORC carries types
    assert _sorted_rows(back) == _sorted_rows(src)


def test_csv_roundtrip_with_explicit_schema(spark, tmp_path):
    src = _slice(spark)
    path = str(tmp_path / "li.csv")
    src.write.mode("overwrite").option("header", "true").csv(path)
    back = spark.read.schema(src.schema).option("header", "true").csv(path)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_jsonl_roundtrip_with_explicit_schema(spark, tmp_path):
    src = _slice(spark)
    path = str(tmp_path / "li.jsonl")
    src.write.mode("overwrite").json(path)
    back = spark.read.schema(src.schema).json(path)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_csv_malformed_rows_are_observable(spark, tmp_path):
    """PERMISSIVE mode with columnNameOfCorruptRecord: malformed lines
    surface as rows with the corrupt column populated, never silent
    drops — the at-scale ingestion discipline."""
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text("1,2.5,ok\n1,notanumber,bad\n3,4.5,ok\n")
    schema = "a INT, b DOUBLE, c STRING, _corrupt STRING"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(p))
        .cache()
    )
    assert df.count() == 3
    bad = df.where(F.col("_corrupt").isNotNull()).collect()
    assert len(bad) == 1 and "notanumber" in bad[0]["_corrupt"]
