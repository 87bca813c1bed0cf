"""Sources/sinks round-trips (SURVEY §2 B1 source-format extensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dust_spark import sources
from dust_spark.tables import load_table
from tests.conftest import SF_DIR


def test_csv_roundtrip(spark, tmp_path):
    out = str(tmp_path / "region_csv")
    region = load_table(spark, SF_DIR, "region")
    sources.write_csv(region, out)
    back = sources.read_csv(spark, out, schema="r_regionkey int, r_name string")
    assert sorted(r.r_name for r in back.collect()) == sorted(r.r_name for r in region.collect())


def test_json_roundtrip(spark, tmp_path):
    out = str(tmp_path / "nation_json")
    nation = load_table(spark, SF_DIR, "nation")
    sources.write_json(nation, out)
    back = sources.read_json(spark, out, schema="n_nationkey int, n_name string, n_regionkey int")
    assert back.count() == nation.count()
    assert {r.n_name for r in back.collect()} == {r.n_name for r in nation.collect()}


def test_parquet_projection_reader(spark):
    df = sources.read_parquet(spark, f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    assert df.columns == ["l_orderkey", "l_quantity"]


def test_result_json_contract(spark):
    df = spark.sql("SELECT 1 AS a, 'x' AS b")
    assert sources.result_json(df) == '[{"columns":["a","b"],"types":["integer","text"],"values":[[1,"x"]]}]'


def test_connector_stubs_raise(spark):
    import pytest

    with pytest.raises(NotImplementedError):
        sources.read_delta(spark, "/nope")
    with pytest.raises(ValueError):
        sources.streaming_source(spark, "/not-a-dir", "id long")


def test_binary_file_reader(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"\x00\x01payload")
    (tmp_path / "b.txt").write_text("not binary target")
    df = sources.read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["content"] == bytearray(b"\x00\x01payload")
    assert rows[0]["length"] == 9


def test_xml_roundtrip(spark, tmp_path):
    """Native XML source/sink (Spark 4 built-in): write, read back with
    an explicit rowTag, values and schema survive."""
    from dust_spark import sources as src

    df = spark.createDataFrame([(1, "x"), (2, "y<z&")], "a INT, b STRING")
    p = str(tmp_path / "xml_out")
    src.write_xml(df, p, row_tag="rec")
    back = src.read_xml(spark, p, row_tag="rec")
    got = sorted((r.a, r.b) for r in back.collect())
    assert got == [(1, "x"), (2, "y<z&")]  # entity escaping round-trips
