"""Live PostgreSQL warehouse round trip.

The reference loads its star schema into PostgreSQL via JDBC
(scripts/04_load_dimension_tables.py:74-78, config.py:40-49). This
container ships a real PostgreSQL 15 server but no pgjdbc jar (and
no network to fetch one), so Spark's in-JVM JDBC code path stays
verified against embedded Derby (tests/test_jdbc.py) while THIS
suite closes the remaining DIALECT gap against the real server: an
embedded cluster on a unix socket, the warehouse DDL applied with
PostgreSQL types (NUMERIC, DOUBLE PRECISION, DATE, TEXT), and
engine-built dimension rows round-tripped through COPY — pg's type
parsing/formatting, NULL-vs-empty handling, and CSV quoting edges.

Everything runs through the stock `psql` client as the `postgres`
OS user; the whole module skips if the server binaries are absent.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import tempfile

import pytest
from pyspark.sql import functions as F

PG_CTL = "/usr/local/bin/pg_ctl"
INITDB = "/usr/local/bin/initdb"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(PG_CTL) and os.path.exists(INITDB)),
    reason="PostgreSQL server binaries not installed",
)


def _as_postgres(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "postgres", "-c", cmd],
        capture_output=True,
        text=True,
        cwd="/tmp",
    )


@pytest.fixture(scope="module")
def pg_sock():
    """Embedded single-user cluster on a unix socket (no TCP), torn
    down with the module. Directories are chowned to the postgres OS
    user; psql runs as that user with trust auth."""
    if _as_postgres("true").returncode != 0:
        pytest.skip("no postgres OS user to run the server as")
    base = tempfile.mkdtemp(prefix="pg_wh_", dir="/tmp")
    os.chmod(base, 0o755)
    shutil.chown(base, "postgres", "postgres")
    data = f"{base}/data"
    r = _as_postgres(f"{INITDB} -D {data} -A trust")
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"initdb failed: {r.stderr[-200:]}")
    r = _as_postgres(
        f"{PG_CTL} -D {data} -o '-k {base} -c listen_addresses=' "
        f"-l {base}/pg.log -w start"
    )
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"pg_ctl start failed: {r.stderr[-200:]}")
    try:
        yield base
    finally:
        _as_postgres(f"{PG_CTL} -D {data} -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)


def _psql(sock: str, sql: str) -> str:
    """Run SQL, return -At (tuples-only, unaligned) stdout."""
    with tempfile.NamedTemporaryFile(
        "w", suffix=".sql", dir="/tmp", delete=False
    ) as f:
        f.write(sql)
        path = f.name
    os.chmod(path, 0o644)
    try:
        r = _as_postgres(
            f"psql -h {sock} -d postgres -v ON_ERROR_STOP=1 -At -f {path}"
        )
        assert r.returncode == 0, f"psql failed: {r.stderr}"
        return r.stdout
    finally:
        os.unlink(path)


def _world_readable_dir() -> str:
    # 0777: Spark (root) writes exports here AND psql (postgres
    # user) writes \copy-TO output back into it
    d = tempfile.mkdtemp(prefix="pg_io_", dir="/tmp")
    os.chmod(d, 0o777)
    return d


def test_warehouse_dim_roundtrip(spark, tmp_path, pg_sock):
    """The reference's dim_customer shape (create_dw_schema.sql:14-23;
    natural key + demographics + load_date) applied as real
    PostgreSQL DDL, loaded from the engine's build_dim_customer
    output via COPY, and read back: row counts, aggregate checks,
    and an exact value-level comparison after the return trip."""
    import tests.fixtures as fx
    from car_insurance_data_pipeline_spark_spark.plans import insurance as ins

    d = tmp_path / "raw"
    d.mkdir()
    fx.contracts_csv(f"{d}/contracts.csv")
    staged = ins.ingest_raw(
        spark,
        str(d),
        str(tmp_path / "staged"),
        file_map={"contracts.csv": "contracts"},
    )
    dim = ins.build_dim_customer(
        ins.clean_contracts(staged["contracts"])
    ).cache()

    _psql(
        pg_sock,
        """
        DROP TABLE IF EXISTS dim_customer;
        CREATE TABLE dim_customer (
          customer_key TEXT PRIMARY KEY,
          first_name   TEXT,
          last_name    TEXT,
          age          DOUBLE PRECISION,
          gender       TEXT,
          city_postal  TEXT,
          segment      TEXT,
          load_date    DATE
        );
        """,
    )

    out = _world_readable_dir()
    try:
        (
            dim.coalesce(1)
            .write.mode("overwrite")
            .option("nullValue", "\\N")
            .csv(f"{out}/dim", header=False)
        )
        part = glob.glob(f"{out}/dim/part-*.csv")[0]
        os.chmod(part, 0o644)
        os.chmod(f"{out}/dim", 0o755)
        _psql(
            pg_sock,
            f"\\copy dim_customer FROM '{part}' WITH (FORMAT csv, NULL '\\N')",
        )

        n = int(_psql(pg_sock, "SELECT COUNT(*) FROM dim_customer;").strip())
        assert n == dim.count()
        # aggregate fidelity: doubles and dates survived the trip
        pg_age = _psql(
            pg_sock,
            "SELECT COALESCE(SUM(age), 0), COUNT(age), COUNT(load_date) "
            "FROM dim_customer;",
        ).strip()
        s = dim.agg(
            F.coalesce(F.sum("age"), F.lit(0.0)),
            F.count("age"),
            F.count("load_date"),
        ).collect()[0]
        got_sum, got_nage, got_ndate = pg_age.split("|")
        assert float(got_sum) == float(s[0])
        assert (int(got_nage), int(got_ndate)) == (s[1], s[2])

        # full return trip: COPY back out, re-read with the original
        # schema, compare exact row sets
        back = f"{out}/back.csv"
        _psql(
            pg_sock,
            f"\\copy dim_customer TO '{back}' WITH (FORMAT csv, NULL '\\N')",
        )
        os.chmod(back, 0o644)
        rt = spark.read.schema(dim.schema).option("nullValue", "\\N").csv(back)
        key = lambda r: tuple(str(v) for v in r)  # noqa: E731
        assert sorted(map(key, rt.collect())) == sorted(map(key, dim.collect()))
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_pg_dialect_type_fidelity(spark, pg_sock):
    """Dialect-sensitive cases the Derby suite can't speak for:
    NUMERIC(18,2) exactness at 16 digits (incl. negative), DATE
    boundaries, TEXT containing quotes/commas/newlines/unicode, and
    NULL round trips — written by pg, read by Spark's CSV reader
    with an explicit schema."""
    from decimal import Decimal

    _psql(
        pg_sock,
        """
        DROP TABLE IF EXISTS t_fidelity;
        CREATE TABLE t_fidelity (
          k INT, amount NUMERIC(18,2), d DATE, s TEXT
        );
        INSERT INTO t_fidelity VALUES
          (1, 12345678901234.56, '1999-12-31', 'plain'),
          (2, -0.01, '2000-01-01', 'comma, "quoted"'),
          (3, NULL, NULL, NULL),
          (4, 0.10, '1970-01-01', E'line1\\nline2'),
          (5, 99.99, '2038-01-19', 'café — émoji ✓');
        """,
    )
    out = _world_readable_dir()
    try:
        back = f"{out}/fidelity.csv"
        _psql(
            pg_sock,
            f"\\copy t_fidelity TO '{back}' WITH (FORMAT csv, NULL '\\N')",
        )
        os.chmod(back, 0o644)
        df = (
            spark.read.schema("k int, amount decimal(18,2), d date, s string")
            .option("nullValue", "\\N")
            .option("multiLine", "true")
            # pg COPY CSV escapes quotes RFC-4180 style (doubled);
            # Spark's default escape is backslash — must be pinned
            # to the quote char or "" parses literally
            .option("escape", '"')
            .csv(back)
        )
        rows = {r.k: r for r in df.collect()}
        assert rows[1].amount == Decimal("12345678901234.56")
        assert str(rows[1].d) == "1999-12-31"
        assert rows[2].amount == Decimal("-0.01")
        assert rows[2].s == 'comma, "quoted"'
        assert rows[3].amount is None and rows[3].d is None and rows[3].s is None
        assert rows[4].amount == Decimal("0.10")
        assert rows[4].s == "line1\nline2"
        assert rows[5].s == "café — émoji ✓"
        assert str(rows[5].d) == "2038-01-19"
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_spark_export_parses_in_pg(spark, pg_sock):
    """Outbound direction with hostile text: the Spark CSV writer
    must emit quoting PostgreSQL's COPY parses back verbatim. The
    writer's escape must be pinned to the quote char (RFC-4180
    doubled quotes) — Spark's backslash default would corrupt
    embedded quotes on the pg side."""
    rows = [
        (1, "plain"),
        (2, 'comma, "quoted"'),
        (3, None),
        (4, "line1\nline2"),
        (5, "café ✓ \\backslash\\"),
    ]
    df = spark.createDataFrame(rows, "k int, s string")
    _psql(
        pg_sock,
        "DROP TABLE IF EXISTS t_export; CREATE TABLE t_export (k INT, s TEXT);",
    )
    out = _world_readable_dir()
    try:
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("nullValue", "\\N")
            .option("escape", '"')
            .csv(f"{out}/exp", header=False)
        )
        part = glob.glob(f"{out}/exp/part-*.csv")[0]
        os.chmod(part, 0o644)
        os.chmod(f"{out}/exp", 0o755)
        _psql(
            pg_sock,
            f"\\copy t_export FROM '{part}' WITH (FORMAT csv, NULL '\\N')",
        )
        got = _psql(
            pg_sock,
            "SELECT k, md5(coalesce(s, '<NULL>')) FROM t_export ORDER BY k;",
        ).strip().splitlines()
        import hashlib

        want = [
            f"{k}|{hashlib.md5((s if s is not None else '<NULL>').encode()).hexdigest()}"
            for k, s in rows
        ]
        assert got == want
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_full_star_schema_with_enforced_constraints(spark, tmp_path, pg_sock):
    """The reference's whole deliverable — the Kimball star
    (create_dw_schema.sql:14-71) — materialized in REAL PostgreSQL
    with PRIMARY KEY and FOREIGN KEY constraints ENFORCED at load
    time: the engine's run_pipeline output loads cleanly (pg would
    reject dup keys or orphan facts), and a pg-side analytic rollup
    matches the Spark-side aggregate exactly."""
    import tests.fixtures as fx
    from car_insurance_data_pipeline_spark_spark.plans import insurance as ins

    d = tmp_path / "raw"
    d.mkdir()
    fx.contracts_csv(f"{d}/contracts.csv")
    fx.vehicles_csv(f"{d}/vehicles.csv")
    fx.claims_csv(f"{d}/claims.csv")
    fx.telematics_csv(f"{d}/telematics.csv")
    fx.device_mapping_csv(f"{d}/device_mapping.csv")
    out = ins.run_pipeline(spark, str(d), str(tmp_path / "wh"))

    _psql(
        pg_sock,
        """
        DROP TABLE IF EXISTS star_fact_policy;
        DROP TABLE IF EXISTS star_dim_customer;
        DROP TABLE IF EXISTS star_dim_policy;
        CREATE TABLE star_dim_customer (
          customer_key TEXT PRIMARY KEY, first_name TEXT, last_name TEXT,
          age DOUBLE PRECISION, gender TEXT, city_postal TEXT,
          segment TEXT, load_date DATE);
        CREATE TABLE star_dim_policy (
          policy_key BIGINT PRIMARY KEY, contract_id TEXT,
          product_type TEXT, risk_zone TEXT, sales_channel TEXT,
          contract_status TEXT, load_date DATE);
        CREATE TABLE star_fact_policy (
          customer_key TEXT NOT NULL REFERENCES star_dim_customer,
          policy_key BIGINT NOT NULL REFERENCES star_dim_policy,
          load_date_key INT NOT NULL,
          policy_count INT NOT NULL,
          total_premium DOUBLE PRECISION);
        """,
    )

    io = _world_readable_dir()
    try:
        loads = [
            ("star_dim_customer", out["dim_customer"]),
            ("star_dim_policy", out["dim_policy"]),
            ("star_fact_policy", out["fact_policy_snapshot"]),
        ]
        for tname, df in loads:
            sub = f"{io}/{tname}"
            (
                df.coalesce(1)
                .write.mode("overwrite")
                .option("nullValue", "\\N")
                .option("escape", '"')
                .csv(sub, header=False)
            )
            part = glob.glob(f"{sub}/part-*.csv")[0]
            os.chmod(part, 0o644)
            os.chmod(sub, 0o755)
            # the FK/PK constraints make this load itself the test:
            # a dup key or orphan fact aborts the COPY
            _psql(
                pg_sock,
                f"\\copy {tname} FROM '{part}' WITH (FORMAT csv, NULL '\\N')",
            )
            n = int(_psql(pg_sock, f"SELECT COUNT(*) FROM {tname};").strip())
            assert n == df.count()

        pg_roll = _psql(
            pg_sock,
            """
            SELECT COALESCE(d.segment, '<NULL>') AS segment, COUNT(*) AS n,
                   CAST(SUM(CAST(f.total_premium AS NUMERIC(27,6))) AS DOUBLE PRECISION)
            FROM star_fact_policy f
            JOIN star_dim_customer d USING (customer_key)
            GROUP BY 1 ORDER BY 1;
            """,
        ).strip().splitlines()
        sp_roll = sorted(
            (str(r[0]), r[1], float(r[2]))
            for r in out["fact_policy_snapshot"]
            .join(out["dim_customer"].select("customer_key", "segment"), "customer_key")
            .groupBy(F.coalesce(F.col("segment"), F.lit("<NULL>")).alias("segment"))
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("total_premium").cast("decimal(27,6)"))
                .cast("double")
                .alias("s"),
            )
            .collect()
        )
        got = sorted(
            (p.split("|")[0], int(p.split("|")[1]), float(p.split("|")[2]))
            for p in pg_roll
        )
        assert got == sp_roll
    finally:
        shutil.rmtree(io, ignore_errors=True)
