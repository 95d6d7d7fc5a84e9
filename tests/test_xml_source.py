"""XML source/sink (Spark 4's built-in ``xml`` format — the
spark-xml package integrated upstream; round-9 reader/writer
addition): round-trip through the engine's write_xml/read_xml pair,
schema-enforced read, and attribute handling."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_xml_roundtrip(spark, tmp_path):
    from car_insurance_data_pipeline_spark_spark.sources.readers import (
        read_xml,
    )
    from car_insurance_data_pipeline_spark_spark.sources.writers import (
        write_xml,
    )

    df = spark.range(5).select(
        F.col("id").cast("long").alias("policy_id"),
        (F.col("id") * 100).cast("long").alias("premium_cents"),
        F.concat(F.lit("client_"), F.col("id")).alias("client"),
    )
    out = str(tmp_path / "policies_xml")
    write_xml(df, out, row_tag="policy", root_tag="policies")

    back = read_xml(
        spark,
        out,
        row_tag="policy",
        schema="policy_id long, premium_cents long, client string",
    )
    got = sorted(map(tuple, back.collect()))
    want = sorted(map(tuple, df.collect()))
    assert got == want


def test_xml_attributes_and_nested(spark, tmp_path):
    from car_insurance_data_pipeline_spark_spark.sources.readers import (
        read_xml,
    )

    p = tmp_path / "claims.xml"
    p.write_text(
        "<claims>"
        '<claim id="7"><amount>1250</amount>'
        "<vehicle><make>A</make><year>2019</year></vehicle></claim>"
        '<claim id="9"><amount>80</amount>'
        "<vehicle><make>B</make><year>2021</year></vehicle></claim>"
        "</claims>"
    )
    df = read_xml(spark, str(p), row_tag="claim")
    rows = {r["_id"]: r for r in df.collect()}
    assert set(rows) == {7, 9}
    assert rows[7].amount == 1250
    assert rows[7].vehicle.make == "A"
    assert rows[9].vehicle.year == 2021


def test_parse_xml_column(spark):
    from car_insurance_data_pipeline_spark_spark.functions.cleaning import (
        parse_xml_column,
    )

    df = spark.createDataFrame(
        [
            (1, "<c><amount>1250</amount><vehicle><make>A</make>"
                "<year>2019</year></vehicle></c>"),
            (2, "<c><amount>80</amount><vehicle><make>B</make>"
                "<year>2021</year></vehicle></c>"),
            (3, "not xml at all"),
        ],
        "id long, payload string",
    )
    parsed = df.select(
        "id",
        parse_xml_column(
            "payload",
            "amount bigint, vehicle struct<make:string, year:int>",
        ).alias("x"),
    )
    rows = {r.id: r.x for r in parsed.collect()}
    assert rows[1].amount == 1250 and rows[1].vehicle.make == "A"
    assert rows[2].vehicle.year == 2021
    # malformed → NULL struct (or all-NULL fields), never an error
    assert rows[3] is None or rows[3].amount is None
