"""Second live JDBC dialect: Spark's real JDBC write/read path
against DuckDB (org.duckdb:duckdb_jdbc, public Maven artifact found
in the local jar cache — skipped when absent).

Derby (tests/test_jdbc.py) verifies the row-oriented-server shape;
DuckDB exercises a different dialect surface through the very same
Spark code path: an unrecognized JDBC URL falls back to Spark's
default type mapping, so this pins that the engine's JDBC
writer/reader round-trips exactly against a non-Derby columnar
engine — including DECIMAL(18,2) at 16 digits, DATE, NULLs, and
quote/comma text.

Dialect finding (documented, pinned): overwrite into a table that
does NOT yet exist fails against DuckDB — Spark's table-existence
probe misreads DuckDB's error and proceeds to DROP a missing table.
Overwrite onto an EXISTING table and append both work, so the
deployment recipe is DDL-first (as the reference itself does via
create_dw_schema.sql), then overwrite/append freely.

Runs in a subprocess because the jar must be on the driver
classpath at JVM launch — the shared test session is already up
without it.
"""

from __future__ import annotations

import glob
import subprocess
import sys
import textwrap

import pytest

_JARS = sorted(
    glob.glob(
        "/root/.cache/coursier/**/duckdb_jdbc*.jar", recursive=True
    )
)

pytestmark = pytest.mark.skipif(
    not _JARS, reason="duckdb_jdbc jar not present in the local cache"
)


def test_spark_jdbc_roundtrip_duckdb(tmp_path):
    db = tmp_path / "wh.duckdb"
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, "/root/repo")
        from decimal import Decimal
        import datetime as dt
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[2]")
            .appName("jdbc-duckdb")
            .config("spark.jars", "{_JARS[-1]}")
            # extraClassPath too: the DDL below reaches the driver
            # class through py4j's app classloader, which spark.jars
            # alone does not feed
            .config("spark.driver.extraClassPath", "{_JARS[-1]}")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        from car_insurance_data_pipeline_spark_spark.sources.readers import read_jdbc
        from car_insurance_data_pipeline_spark_spark.sources.writers import write_jdbc

        url = "jdbc:duckdb:{db}"
        props = {{"driver": "org.duckdb.DuckDBDriver"}}

        # DDL-first through the SAME driver jar (one engine version
        # owns the database file)
        jvm = spark._sc._jvm
        jvm.java.lang.Class.forName("org.duckdb.DuckDBDriver")
        conn = jvm.java.sql.DriverManager.getConnection(url)
        st = conn.createStatement()
        st.execute(
            "CREATE TABLE dim_test ("
            "k INTEGER, s VARCHAR, amount DECIMAL(18,2), d DATE)"
        )
        st.close(); conn.close()

        rows = [
            (1, "plain", Decimal("12345678901234.56"), dt.date(1999, 12, 31)),
            (2, 'quote " comma ,', Decimal("-0.01"), dt.date(2000, 1, 1)),
            (3, None, None, None),
        ]
        df = spark.createDataFrame(
            rows, "k int, s string, amount decimal(18,2), d date"
        ).coalesce(1)  # single writer connection: duckdb file db
        # overwrite onto the EXISTING table (see module docstring)
        write_jdbc(df, url, "dim_test", mode="overwrite", properties=props)
        back = read_jdbc(spark, url, "dim_test", properties=props)
        got = sorted(
            tuple(r) for r in back.collect()
        )
        want = sorted(rows, key=lambda t: t[0])
        assert got == want, f"mismatch: {{got}} != {{want}}"
        assert dict(back.dtypes)["amount"] == "decimal(18,2)"
        # append: second batch lands without clobbering
        write_jdbc(df, url, "dim_test", mode="append", properties=props)
        assert read_jdbc(spark, url, "dim_test", properties=props).count() == 6
        print("DUCKDB-JDBC-OK")
        spark.stop()
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert "DUCKDB-JDBC-OK" in r.stdout, (
        f"stdout={r.stdout[-500:]}\nstderr={r.stderr[-1500:]}"
    )
